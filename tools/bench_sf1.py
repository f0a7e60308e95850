#!/usr/bin/env python
"""Data-scaling bench (round-4 verdict ask #4): hold cores fixed at
local[32] and scale DATA 10x — sf0.1-equivalent vs sf1-equivalent inputs.

All prior scaling evidence varies CORES at fixed sf0.1; this measures the
other axis of the 100x story: does per-row cost stay flat when the same
job sees 10x the rows? Three representative phases, each timed in a fresh
JVM per scale (cold first pass, then best of 2 cache-cleared steady
passes — see _timed):

  extract   — the headline extraction pipeline over gen.py transcripts
              (~630k turns at sf0.1, ~6.3M at sf1)
  dedup     — dedup_minhash_lsh over a synthetic documents corpus of
              matching row counts (630k / 6.3M docs)
  decontam  — decontaminate() over the same corpus against a
              2%-of-sources benchmark set

Why the dedup corpus is NOT derived from the transcripts: the transcript
payload generator draws from a small sentence bank, so turn texts are
template-heavy — at sf0.01 a single LSH band bucket already holds ~3,100
docs even after exact dedup, and candidate pairs go quadratic (measured
2026-08-17; the run OOMs a 48g heap). That is a property of the
generator's entropy, not of the operator: the documents corpus here uses
a 50k-token vocabulary with per-(doc, position) hashed words, which gives
web-corpus-like sparse bucket structure, plus a planted 5% near-dup rate
(every 20th doc is a ~10%-word-mutated copy of its predecessor) so the
verify stage does real work that scales linearly with the corpus.
Everything is a pure function of (doc_id, position) — deterministic at
any scale, no external data.

Writes BENCH_sf1.json at the repo root (picked up by bench.py's
write_bench_md as a persistent BENCH.md section) and prints one JSON line.

Usage:
  python tools/bench_sf1.py                   # orchestrator: both scales
  python tools/bench_sf1.py --worker --scale 1.0   # one scale
NEVER run concurrently with other Spark work (bench contamination).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH_DATA = os.path.join(REPO, ".bench")
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

VOCAB = 50_000
WORDS_PER_DOC = 30
DOCS_AT_SCALE_1 = 6_300_000  # matches the sf1 turn count


def _spark(tag: str, shuffle_partitions: int = 64):
    # local-mode driver heap defaults to 1g; a 6.3M-row shuffle/join
    # workload needs a real executor-sized heap. Must be set before the
    # JVM launches, which PYSPARK_SUBMIT_ARGS guarantees. Shuffle/spill
    # scratch moves off /tmp: this sandbox reaps /tmp entries mid-run
    # (a ~25-min sf1 pass died with its blockmgr dir deleted under it,
    # "No such file or directory" on temp_shuffle renames, 2026-08-17),
    # and a long job must not share fate with a tmp cleaner.
    scratch = os.path.join(BENCH_DATA, "sparktmp")
    os.makedirs(scratch, exist_ok=True)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-memory 48g --conf spark.local.dir={scratch} pyspark-shell")
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(app=f"bench-sf1-{tag}", master=f"local[{CORES}]",
                      shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_transcripts(spark, sf: float) -> str:
    """Materialize once into .bench (same layout rule as bench.py: 256
    files so task granularity never quantizes a comparison)."""
    path = os.path.join(BENCH_DATA, f"transcripts_sf{sf}_v2")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from glm_ocr_spark.data.gen import transcripts_df

        transcripts_df(spark, sf).repartition(256).write.mode(
            "overwrite").parquet(path)
    return path


def synth_docs(spark, n_docs: int):
    """Deterministic high-entropy documents: every word is a pure function
    of (source doc id, position); every 20th doc copies its predecessor
    with ~10% of positions mutated (near-dup pairs at Jaccard ~0.5)."""
    from pyspark.sql import functions as F

    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_copy = F.col("doc_id") % 20 == 19
    src = F.when(is_copy, F.col("doc_id") - 1).otherwise(F.col("doc_id"))

    def word(i):
        mutate = is_copy & (
            F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit("mut")),
                   F.lit(10)) == 0)
        return F.when(
            mutate,
            F.concat(F.lit("m"), F.pmod(
                F.xxhash64(F.col("doc_id"), i), F.lit(VOCAB)).cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(
                F.xxhash64(src, i), F.lit(VOCAB)).cast("string")))

    text = F.concat_ws(" ", *[word(F.lit(i)) for i in range(WORDS_PER_DOC)])
    return d.select(
        "doc_id",
        F.pmod(F.xxhash64("doc_id"), F.lit(100)).cast("string")
         .alias("source"),
        text.alias("text"),
    )


def ensure_docs(spark, scale: float) -> str:
    n = int(DOCS_AT_SCALE_1 * scale)
    path = os.path.join(BENCH_DATA, f"docs_scale{scale}_v2")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_docs(spark, n).repartition(256).write.mode(
            "overwrite").parquet(path)
    return path


def _timed(spark, fn, passes: int = 2):
    """(result, cold_sec, best_steady_sec): the first execution is timed as
    the COLD number — fresh JVM, nothing cached, the cost a production run
    pays once. Each further pass starts from a CLEARED SQL cache: operators
    that persist internal dataflows (minhash shingles) would otherwise
    re-register cache entries per pass, and later passes measure eviction
    churn against earlier passes' leftovers instead of the operator (the
    2026-08-17 sf0.1 run read dedup 'warm' 137 s vs cold 95 s by exactly
    this mechanism). With the cache cleared, every pass does the same
    work; only OS page cache and JIT stay warm — the steady state a
    long-running job sees."""
    t0 = time.time()
    n = fn()
    cold = time.time() - t0
    best = None
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn()
        best = min(best or 1e18, time.time() - t0)
    return n, cold, best


def run_worker(scale: float) -> None:
    from glm_ocr_spark.operators.curation import decontaminate
    from glm_ocr_spark.operators.dedup import minhash_lsh_pairs
    from glm_ocr_spark.pipeline import extract_transcripts

    # Shuffle partitions scale WITH the data (64 at 0.1x -> 640 at 1x):
    # holding them fixed across a 10x data step makes each shuffle
    # partition 10x heavier — sort/merge spill — and the reading measures
    # memory pressure, not the operator. This is exactly how a production
    # job right-sizes: partitions proportional to input so per-partition
    # bytes stay constant (first sf1 attempt with a fixed 64 measured
    # dedup cold ratio 0.64; the knob is the 100 TB lesson).
    shuffle_partitions = max(64, int(640 * scale))
    spark = _spark(str(scale), shuffle_partitions)
    tpath = ensure_transcripts(spark, scale)  # scale IS the transcripts sf
    dpath = ensure_docs(spark, scale)
    out: dict = {"scale": scale, "cores": CORES,
                 "shuffle_partitions": shuffle_partitions}

    # one split per file (bench.py extraction config): CPU-bound pandas UDF
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    tdf = spark.read.parquet(tpath)
    n, cold, sec = _timed(spark, lambda: extract_transcripts(tdf).count())
    out["extract"] = {"rows": n, "cold_sec": round(cold, 2),
                      "sec": round(sec, 2),
                      "rows_per_sec": round(n / sec, 1)}

    # dedup + decontam are shuffle/join ops, not fine-split CPU scans
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "512k")
    docs = spark.read.parquet(dpath)
    n_docs = docs.count()

    pairs, cold, sec = _timed(
        spark, lambda: minhash_lsh_pairs(docs, threshold=0.5).count())
    out["dedup"] = {"docs": n_docs, "pairs": pairs,
                    "cold_sec": round(cold, 2), "sec": round(sec, 2),
                    "rows_per_sec": round(n_docs / sec, 1),
                    "cold_rows_per_sec": round(n_docs / cold, 1)}

    # Phase isolation: dedup's persisted signature/shingle dataflows stay
    # registered in the CacheManager after the phase — left in place they
    # fight decontam's 110M-row explode for storage/execution memory and
    # the decontam reading measures eviction churn (first attempt: warm
    # 51.5s vs cold 18.5s at 0.1x, pure cache interference).
    spark.catalog.clearCache()

    flagged, cold, sec = _timed(
        spark, lambda: decontaminate(docs, ["7", "13"], hash_keys=True).count(),
        passes=2)
    out["decontam"] = {"docs": n_docs, "rows": flagged,
                       "cold_sec": round(cold, 2), "sec": round(sec, 2),
                       "rows_per_sec": round(n_docs / sec, 1)}
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--scale", type=float, default=None)
    args = ap.parse_args()
    if args.worker:
        run_worker(args.scale)
        return

    from tools.quietbox import assert_quiet

    assert_quiet("bench_sf1")  # workers inherit the orchestrator's check
    results = {}
    for scale in (0.1, 1.0):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--scale", str(scale)],
            capture_output=True, text=True, cwd=REPO, timeout=7200)
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
            raise SystemExit(f"worker scale={scale} produced no result")
        results[str(scale)] = json.loads(lines[-1])

    summary = {"cores": CORES, "per_scale": results,
               "rows_per_sec_ratio_10x": {}}
    for phase in ("extract", "dedup", "decontam"):
        a, b = results["0.1"][phase], results["1.0"][phase]
        summary["rows_per_sec_ratio_10x"][phase] = round(
            b["rows_per_sec"] / a["rows_per_sec"], 3)
        # cold ratio: per-row cost of the one-shot production run
        # (rows/cold_sec at 1x over rows/cold_sec at 0.1x)
        rows_key = "rows" if phase == "extract" else "docs"
        summary["rows_per_sec_ratio_10x"][phase + "_cold"] = round(
            (b[rows_key] / b["cold_sec"]) / (a[rows_key] / a["cold_sec"]), 3)
    with open(os.path.join(REPO, "BENCH_sf1.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
