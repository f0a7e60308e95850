"""Round-5 verdict ask #5: materialize the minhash signature/band
dataflows as a write-once parquet table for the 10x-data regime and
measure against the MEMORY_AND_DISK persist default.

Arms (fresh JVM subprocess per draw, cold only — the regime where the
201M-row persisted band-entry dataflow was attributed the sf1 cost):
  "persist" — minhash_lsh_pairs default (in-job persist boundary);
  "table"   — materialize_dir= (parquet write + read-back boundary).

Corpus: tools/bench_sf1.py's deterministic synthetic documents at
--scale (default 1.0 = 6.3M docs; cached under .bench). Pair counts
asserted equal across arms. Writes BENCH_ab_bandtable.json.

Usage: python tools/ab_bandtable.py [--scale 1.0] [--rounds 1]
       python tools/ab_bandtable.py --worker <arm> --scale <s>   # internal
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH_DATA = os.path.join(REPO, ".bench")


def worker(arm: str, scale: float) -> None:
    scratch = os.path.join(BENCH_DATA, "sparktmp")
    os.makedirs(scratch, exist_ok=True)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-memory 48g --conf spark.local.dir={scratch} "
        "pyspark-shell")  # same heap the sf1 harness runs with
    from tools.bench_sf1 import ensure_docs
    from glm_ocr_spark.operators.dedup import minhash_lsh_pairs
    from glm_ocr_spark.pipeline import get_spark

    shuffle = int(64 * (scale / 0.1))
    spark = get_spark(app=f"ab-bandtable-{arm}", master="local[32]",
                      shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_docs(spark, scale))
    mat = None
    if arm == "table":
        mat = os.path.join(BENCH_DATA, f"bandtable_scale{scale}")
        shutil.rmtree(mat, ignore_errors=True)
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5,
                              materialize_dir=mat).count()
    cold = time.time() - t0
    spark.stop()
    if mat:
        shutil.rmtree(mat, ignore_errors=True)
    print(json.dumps({"arm": arm, "pairs": pairs,
                      "cold_sec": round(cold, 2)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--worker", default=None)
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.scale)
        return

    from tools.quietbox import assert_quiet

    assert_quiet("ab_bandtable")
    out: dict = {"scale": args.scale, "rounds": args.rounds,
                 "persist_draws_sec": [], "table_draws_sec": []}
    pairs = {}
    for _ in range(args.rounds):  # strictly interleaved cold draws
        for arm in ("persist", "table"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker", arm,
                 "--scale", str(args.scale)],
                capture_output=True, text=True, cwd=REPO, timeout=3600)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            out[f"{arm}_draws_sec"].append(r["cold_sec"])
            pairs[arm] = r["pairs"]
    assert pairs["persist"] == pairs["table"], pairs
    out["pairs"] = pairs["persist"]
    out["table_over_persist"] = round(
        min(out["table_draws_sec"]) / min(out["persist_draws_sec"]), 3)
    with open(os.path.join(REPO, "BENCH_ab_bandtable.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
