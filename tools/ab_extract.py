#!/usr/bin/env python
"""Headline-drift A/B (round-4 verdict ask #8): interleaved extraction
throughput, HEAD vs a past ref (default: the round-3 close 0ea0366), over
the IDENTICAL pre-materialized sf0.1 transcript corpus.

Why: the full-bench headline slot read 90-92k turns/s in round 3, 83k in
round 4, and 63k in round 5's full run — while the same JVM's scaling
sweep read 100k minutes later. Two consecutive declines trigger the
verdict's drift check: is the extraction kernel getting slower commit by
commit, or is the headline slot just the noisiest seat on a shared box?
This tool answers it the only defensible way — both code versions, same
input files, same measurement code path (`bench.py --extract-only`,
fresh JVM, warm pass + best-of-2), strictly interleaved so a co-tenant
load window cannot penalize one arm.

Method:
  - `git worktree add --detach .ab_<ref> <ref>` gives the past code its
    own tree; each arm's bench.py resolves imports from its own root, so
    no sys.path cross-contamination.
  - 3 interleaved rounds x (ref, HEAD); per arm keep best and all draws.
  - Input is passed absolutely; both arms read the same parquet bytes.

Writes BENCH_ab.json (rendered into BENCH.md by write_bench_md) and
prints one JSON line. NEVER run concurrently with other Spark work.

Usage: python tools/ab_extract.py [--ref 0ea0366] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _run_arm(bench_dir: str, input_path: str) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(bench_dir, "bench.py"),
         "--extract-only", "--master", f"local[{CORES}]",
         "--input", input_path],
        capture_output=True, text=True, cwd=bench_dir, timeout=1800)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise SystemExit(
            f"arm {bench_dir} produced no result:\n{proc.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="0ea0366")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from tools.quietbox import assert_quiet

    assert_quiet("ab_extract")

    input_path = os.path.join(REPO, ".bench", "transcripts_sf0.1_v2")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        raise SystemExit("materialize the sf0.1 corpus first (run bench.py)")

    wt = os.path.join(REPO, f".ab_{args.ref}")
    # a leftover worktree from a killed run (the finally below never ran)
    # must not crash the retry — same guard as ab_minhash
    if not os.path.exists(wt):
        proc = subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.ref],
            cwd=REPO, capture_output=True, text=True)
        if proc.returncode != 0:
            raise SystemExit(
                f"git worktree add failed: {proc.stderr[-1000:]}")
    try:
        draws: dict[str, list[float]] = {"ref": [], "head": []}
        rows = None
        for _ in range(max(1, args.rounds)):
            r = _run_arm(wt, input_path)
            draws["ref"].append(round(r["sec"], 2))
            h = _run_arm(REPO, input_path)
            draws["head"].append(round(h["sec"], 2))
            # a throughput comparison is meaningless unless both kernels
            # did identical work — a row-count drift between versions
            # would make the verdict compare different workloads
            if r["rows"] != h["rows"]:
                raise SystemExit(
                    f"arms extracted different row counts: "
                    f"ref={r['rows']} head={h['rows']} — not comparable")
            rows = h["rows"]
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)

    ref_best, head_best = min(draws["ref"]), min(draws["head"])
    out = {
        "ref": args.ref, "cores": CORES, "rows": rows,
        "draws_sec": draws,
        "ref_best_sec": ref_best, "head_best_sec": head_best,
        "ref_rows_per_sec": round(rows / ref_best, 1),
        "head_rows_per_sec": round(rows / head_best, 1),
        # >1 = HEAD faster; the drift question is "is this << 1?"
        "head_over_ref": round(ref_best / head_best, 3),
    }
    with open(os.path.join(REPO, "BENCH_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
