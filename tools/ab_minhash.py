#!/usr/bin/env python
"""MinHash candidate-generation A/B, two modes over the IDENTICAL
pre-materialized synthetic corpus (.bench/docs_scale0.1_v2, 630k docs):

--mode ref (default): `minhash_lsh_pairs` at HEAD vs the pre-rewrite
  band-key self-join commit (452f527), via a detached git worktree.
  Why: the two sf1 data-scaling runs straddling the one-shuffle rewrite
  (efdc3d8) read dedup cold 42.21 s (old) vs 95.27 s (new) at scale 0.1 —
  but BOTH runs show contamination in their other legs (the old run's
  extract cold read 89.49 s vs 17.2 s on byte-identical code, a 5x
  swing), so neither is evidence. Result 2026-08-17: ref best 23.45 s vs
  HEAD-at-the-time 32.31 s (ratio 1.378) — the rewrite was genuinely
  slower; both shapes now ship as minhash_band_candidates(strategy=).

--mode strategy: strategy="join" vs strategy="group" at HEAD only (no
  worktree) — wall time AND shuffle-write bytes per pass (REST stage
  metrics), so the join-wall-vs-group-bytes tradeoff is measured on both
  axes, not asserted.

Method both modes: fresh JVM per pass (cold = the production number; warm
passes inside one JVM are polluted by cross-pass cache registration),
strictly interleaved so a co-tenant load window cannot penalize one arm,
identical pair counts asserted.

Writes BENCH_ab_minhash.json (ref mode) / BENCH_ab_strategy.json
(strategy mode) and prints one JSON line.
NEVER run concurrently with other Spark work (bench contamination).

Usage:
  python tools/ab_minhash.py [--mode ref] [--ref 452f527] [--rounds 3]
  python tools/ab_minhash.py --mode strategy [--rounds 3]
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
def _data(scale: str) -> str:
    return os.path.join(REPO, ".bench", f"docs_scale{scale}_v2")

WORKER = r"""
import json, os, sys, time
arm, data, cores, strategy, sp = (
    sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4],
    int(sys.argv[5]))
sys.path.insert(0, arm)
scratch = os.path.join(os.path.dirname(data), "sparktmp")
os.makedirs(scratch, exist_ok=True)
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    "--driver-memory 48g --conf spark.local.dir=%s pyspark-shell" % scratch)
from glm_ocr_spark.pipeline import get_spark
from glm_ocr_spark.operators.dedup import minhash_lsh_pairs

spark = get_spark(app="ab-minhash", master="local[%d]" % cores,
                  shuffle_partitions=sp)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
spark.conf.set("spark.sql.files.openCostInBytes", "512k")
docs = spark.read.parquet(data)
kw = {} if strategy == "default" else {"strategy": strategy}
t0 = time.time()
n = minhash_lsh_pairs(docs, threshold=0.5, **kw).count()
sec = round(time.time() - t0, 2)
# the count above is this JVM's only action, so cumulative == this pass
try:
    import bench
    m = bench.shuffle_metrics(spark)
except Exception:
    m = {}
print(json.dumps({"pairs": n, "sec": sec,
                  "shuffle_write_bytes": m.get("shuffle_write_bytes")}))
spark.stop()
"""


def _run_arm(arm_dir: str, data: str, strategy: str = "default",
             shuffle_partitions: int = 64) -> dict:
    # partitions scale with the data (the bench_sf1 lesson: fixed 64 at a
    # 10x data step measures spill, not the operator)
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, arm_dir, data, str(CORES), strategy,
         str(shuffle_partitions)],
        capture_output=True, text=True, cwd=arm_dir, timeout=1800)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise SystemExit(
            f"arm {arm_dir}/{strategy} produced no result:"
            f"\n{proc.stderr[-3000:]}")
    return json.loads(lines[-1])


def _interleave(arms, rounds):
    """arms: list of (name, run_thunk). Returns per-arm draws + pair count,
    asserting all arms produce identical pair counts."""
    draws = {name: [] for name, _ in arms}
    bytes_ = {name: [] for name, _ in arms}
    pairs = {}
    for _ in range(rounds):
        for name, thunk in arms:
            r = thunk()
            draws[name].append(r["sec"])
            if r.get("shuffle_write_bytes") is not None:
                bytes_[name].append(r["shuffle_write_bytes"])
            pairs[name] = r["pairs"]
    vals = set(pairs.values())
    if len(vals) > 1:
        raise SystemExit(
            f"pair-count mismatch {pairs} — arms are not computing the "
            "same thing; no timing verdict")
    return draws, bytes_, next(iter(vals))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("ref", "strategy"), default="ref")
    ap.add_argument("--ref", default="452f527")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--scale", default="0.1",
                    help="which .bench docs corpus (0.1 = 630k docs, "
                         "1.0 = 6.3M) — strategy mode only")
    args = ap.parse_args()

    from tools.quietbox import assert_quiet

    assert_quiet("ab_minhash")
    data = _data(args.scale if args.mode == "strategy" else "0.1")
    if not os.path.exists(os.path.join(data, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {data} (run tools/bench_sf1.py)")

    if args.mode == "strategy":
        sp = max(64, int(640 * float(args.scale)))
        draws, bytes_, pairs = _interleave(
            [("join", lambda: _run_arm(REPO, data, "join", sp)),
             ("group", lambda: _run_arm(REPO, data, "group", sp))],
            args.rounds)
        out = {
            "op": "minhash_lsh_pairs cold by strategy (fresh JVM per pass)",
            "scale": args.scale,
            "corpus": f"docs_scale{args.scale}_v2",
            "cores": CORES, "rounds": args.rounds, "pairs": pairs,
            "join_draws_sec": draws["join"],
            "group_draws_sec": draws["group"],
            "join_best_sec": min(draws["join"]),
            "group_best_sec": min(draws["group"]),
            "join_shuffle_bytes": (min(bytes_["join"])
                                   if bytes_["join"] else None),
            "group_shuffle_bytes": (min(bytes_["group"])
                                    if bytes_["group"] else None),
            "group_over_join_sec": round(
                min(draws["group"]) / min(draws["join"]), 3),
        }
        if bytes_["join"] and bytes_["group"]:
            out["group_over_join_bytes"] = round(
                min(bytes_["group"]) / min(bytes_["join"]), 3)
        dest = ("BENCH_ab_strategy.json" if args.scale == "0.1"
                else f"BENCH_ab_strategy_sf{args.scale}.json")
    else:
        wt = os.path.join(REPO, f".ab_{args.ref}")
        if not os.path.exists(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, args.ref],
                cwd=REPO, check=True, capture_output=True)
        try:
            draws, _, pairs = _interleave(
                [("ref", lambda: _run_arm(wt, data, "default")),
                 ("head", lambda: _run_arm(REPO, data, "default"))],
                args.rounds)
        finally:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, capture_output=True)
        out = {
            "op": "minhash_lsh_pairs cold (fresh JVM per pass)",
            "corpus": "docs_scale0.1_v2 (630k synthetic docs)",
            "cores": CORES, "ref": args.ref, "rounds": args.rounds,
            "pairs": pairs,
            "ref_draws_sec": draws["ref"], "head_draws_sec": draws["head"],
            "ref_best_sec": min(draws["ref"]),
            "head_best_sec": min(draws["head"]),
            "head_over_ref": round(
                min(draws["head"]) / min(draws["ref"]), 3),
        }
        dest = "BENCH_ab_minhash.json"
    with open(os.path.join(REPO, dest), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
