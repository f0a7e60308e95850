"""Quiet-box guard for measurement tools.

Every throughput number in BENCH.md depends on the box being otherwise
idle: a concurrent Spark JVM (pytest, another bench, a driver run) skews
readings badly enough to manufacture fake regressions — round 4's four
"regressed" bench slots and round 5's first sf1 attempt were both this
mechanism (adjudicated in BENCH.md). Calling `assert_quiet()` at tool
start makes the rule structural instead of remembered: the tool aborts
with the offending process list instead of recording a contaminated
number.
"""

from __future__ import annotations

import os
import subprocess
import sys


def other_spark_jvms() -> list[str]:
    """Command lines of Spark JVMs / pyspark daemons not descended from
    this process (best-effort: matches SparkSubmit / pyspark.daemon)."""
    try:
        out = subprocess.run(
            ["ps", "-eo", "pid,ppid,args"], capture_output=True, text=True,
            timeout=10).stdout
    except Exception:
        return []
    me = os.getpid()
    # Collect our own descendant pids so a worker subprocess's JVM does
    # not trip the guard when the orchestrator launched it.
    children: dict[int, list[int]] = {}
    rows = []
    for line in out.splitlines()[1:]:
        parts = line.strip().split(None, 2)
        if len(parts) < 3:
            continue
        try:
            pid, ppid = int(parts[0]), int(parts[1])
        except ValueError:
            continue
        rows.append((pid, ppid, parts[2]))
        children.setdefault(ppid, []).append(pid)
    mine = {me}
    frontier = [me]
    while frontier:
        nxt = []
        for p in frontier:
            for c in children.get(p, []):
                if c not in mine:
                    mine.add(c)
                    nxt.append(c)
        frontier = nxt
    hits = []
    for pid, ppid, args in rows:
        if pid in mine:
            continue
        if ("org.apache.spark.deploy.SparkSubmit" in args
                or "pyspark.daemon" in args):
            hits.append(f"{pid} {args[:160]}")
    return hits


def assert_quiet(tool: str, retries: int = 3, grace_sec: float = 5.0) -> None:
    """Abort if other Spark JVMs are running. Retries over a short grace
    window first: a JVM from the previous tool in a measurement chain can
    take a moment to tear down after spark.stop()."""
    import time

    hits = other_spark_jvms()
    for _ in range(retries):
        if not hits:
            return
        time.sleep(grace_sec)
        hits = other_spark_jvms()
    if hits:
        sys.stderr.write(
            f"{tool}: refusing to measure on a busy box — other Spark "
            "JVMs are running (bench contamination; see BENCH.md "
            "adjudication notes):\n  " + "\n  ".join(hits) + "\n")
        raise SystemExit(3)
