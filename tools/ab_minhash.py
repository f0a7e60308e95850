#!/usr/bin/env python
"""MinHash-rewrite adjudication A/B: `minhash_lsh_pairs` at HEAD (one-shuffle
bucket grouping, efdc3d8 + streamed expansion 6a3075f) vs the pre-rewrite
band-key self-join (452f527), over the IDENTICAL pre-materialized synthetic
corpus (.bench/docs_scale0.1_v2, 630k docs, web-corpus-like entropy).

Why: the two sf1 data-scaling runs straddling the rewrite read dedup cold
42.21 s (old) vs 95.27 s (new) at scale 0.1 and 372.56 vs 652.3 at scale
1.0 — but BOTH runs show contamination in their other legs (the old run's
extract cold read 89.49 s vs 17.2 s in the new run, a 5x swing on byte-
identical code), so neither is evidence. This tool answers the only
defensible way: both code versions, same input bytes, fresh JVM per pass
(cold = the production number; warm passes inside one JVM are polluted by
cross-pass cache registration), strictly interleaved so a co-tenant load
window cannot penalize one arm.

Writes BENCH_ab_minhash.json and prints one JSON line.
NEVER run concurrently with other Spark work (bench contamination).

Usage: python tools/ab_minhash.py [--ref 452f527] [--rounds 3]
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
DATA = os.path.join(REPO, ".bench", "docs_scale0.1_v2")

WORKER = r"""
import json, os, sys, time
arm, data, cores = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, arm)
scratch = os.path.join(os.path.dirname(data), "sparktmp")
os.makedirs(scratch, exist_ok=True)
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    "--driver-memory 48g --conf spark.local.dir=%s pyspark-shell" % scratch)
from glm_ocr_spark.pipeline import get_spark
from glm_ocr_spark.operators.dedup import minhash_lsh_pairs

spark = get_spark(app="ab-minhash", master="local[%d]" % cores,
                  shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
spark.conf.set("spark.sql.files.openCostInBytes", "512k")
docs = spark.read.parquet(data)
t0 = time.time()
n = minhash_lsh_pairs(docs, threshold=0.5).count()
print(json.dumps({"pairs": n, "sec": round(time.time() - t0, 2)}))
spark.stop()
"""


def _run_arm(arm_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", WORKER, arm_dir, DATA, str(CORES)],
        capture_output=True, text=True, cwd=arm_dir, timeout=1800)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise SystemExit(
            f"arm {arm_dir} produced no result:\n{proc.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="452f527")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from tools.quietbox import assert_quiet

    assert_quiet("ab_minhash")
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        raise SystemExit(f"corpus missing: {DATA} (run tools/bench_sf1.py)")

    wt = os.path.join(REPO, f".ab_{args.ref}")
    if not os.path.exists(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, args.ref],
                       cwd=REPO, check=True, capture_output=True)
    try:
        draws: dict[str, list] = {"ref": [], "head": []}
        pairs: dict[str, int] = {}
        for _ in range(args.rounds):
            for name, arm_dir in (("ref", wt), ("head", REPO)):
                r = _run_arm(arm_dir)
                draws[name].append(r["sec"])
                pairs[name] = r["pairs"]
        if pairs["ref"] != pairs["head"]:
            raise SystemExit(
                f"pair-count mismatch ref={pairs['ref']} head={pairs['head']}"
                " — arms are not computing the same thing; no timing verdict")
        out = {
            "op": "minhash_lsh_pairs cold (fresh JVM per pass)",
            "corpus": "docs_scale0.1_v2 (630k synthetic docs)",
            "cores": CORES, "ref": args.ref, "rounds": args.rounds,
            "pairs": pairs["head"],
            "ref_draws_sec": draws["ref"], "head_draws_sec": draws["head"],
            "ref_best_sec": min(draws["ref"]),
            "head_best_sec": min(draws["head"]),
            "head_over_ref": round(min(draws["head"]) / min(draws["ref"]), 3),
        }
        with open(os.path.join(REPO, "BENCH_ab_minhash.json"), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
