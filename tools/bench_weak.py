#!/usr/bin/env python
"""Weak-scaling bench: grow CORES and DATA together 4x and check wall
time stays flat — the closest single-box analog of the north rule's
"throughput scaling efficiency >= 0.8 between N-executor and 4N-executor
cluster runs", measured the way a cluster actually grows (more data, more
workers, same per-worker share).

The two existing axes are strong scaling (fixed sf0.1, 4 -> 16 cores,
raw 0.979 in bench.py) and data scaling (fixed local[32], 10x rows,
tools/bench_sf1.py). Weak scaling is the composition that the 10^12-turn
claim actually rests on: a 4N cluster given 4x the input should finish in
the SAME wall time (efficiency = t_N / t_4N, ideal 1.0).

Configuration: (4 cores, scale 0.1) vs (16 cores, scale 0.4). 16 is the
top arm because this sandbox exposes ~21-25 effective parallel cores
despite nproc=32 (BENCH.md capacity probe) — a 32-thread arm would
measure oversubscription, not scaling. Shuffle partitions scale with the
data (the bench_sf1 lesson: fixed partitions across a data step measure
spill, not the operator); per-core memory share is held constant by
scaling the driver heap with the arm (12g at 4 cores, 48g at 16 — a
fixed heap would hand the small arm 4x the per-core memory and bias the
efficiency ratio upward).

Phases and corpora are bench_sf1's (extract over gen.py transcripts,
dedup_minhash_lsh + decontaminate over the synthetic high-entropy docs
corpus), timed with the same cold / cache-cleared-steady discipline.

Noise discipline: the first (sequential, single-draw) run of this tool
read dedup cold 186.7 s on the big arm and a standalone redo read 100.2 s
— with decontam swinging the OPPOSITE way (68.9 -> 312.8 s) in the same
JVMs. Single draws of 2.5M-doc shuffle phases on this shared box are not
evidence, so the orchestrator now runs --rounds strictly-interleaved
fresh-JVM draws per arm (the ab_minhash method) and keeps the per-phase
BEST cold/steady per arm; all draws are recorded in the JSON.

Writes BENCH_weak.json at the repo root (picked up by bench.py's
write_bench_md as a persistent BENCH.md section) and prints one JSON line.

Usage:
  python tools/bench_weak.py [--rounds 2]           # orchestrator
  python tools/bench_weak.py --worker --cores 4 --scale 0.1 [--passes 1]
NEVER run concurrently with other Spark work (bench contamination).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH_DATA = os.path.join(REPO, ".bench")

ARMS = [  # (cores, data scale): 4x both between arms
    (4, 0.1),
    (16, 0.4),
]


def _spark(tag: str, cores: int, shuffle_partitions: int):
    # per-core heap share held constant across arms (3g/core); scratch
    # off /tmp for the same tmp-reaper reason as bench_sf1
    scratch = os.path.join(BENCH_DATA, "sparktmp")
    os.makedirs(scratch, exist_ok=True)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-memory {3 * cores}g "
        f"--conf spark.local.dir={scratch} pyspark-shell")
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(app=f"bench-weak-{tag}", master=f"local[{cores}]",
                      shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_worker(cores: int, scale: float, passes: int = 1) -> None:
    # _timed is bench_sf1's cold-then-cache-cleared-steady discipline —
    # imported, not copied, so a fix to the timing method there cannot
    # silently diverge the weak-scaling numbers. passes defaults to 1
    # here (vs bench_sf1's 2): the weak-scaling headline is the COLD
    # number and rounds across JVMs buy more signal than passes within
    # one.
    from tools.bench_sf1 import _timed, ensure_docs, ensure_transcripts

    from glm_ocr_spark.operators.curation import decontaminate
    from glm_ocr_spark.operators.dedup import minhash_lsh_pairs
    from glm_ocr_spark.pipeline import extract_transcripts

    shuffle_partitions = max(64, int(640 * scale))
    spark = _spark(f"{cores}x{scale}", cores, shuffle_partitions)
    tpath = ensure_transcripts(spark, scale)
    dpath = ensure_docs(spark, scale)
    out: dict = {"cores": cores, "scale": scale,
                 "shuffle_partitions": shuffle_partitions}

    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    tdf = spark.read.parquet(tpath)
    n, cold, sec = _timed(spark, lambda: extract_transcripts(tdf).count(),
                          passes=passes)
    out["extract"] = {"rows": n, "cold_sec": round(cold, 2),
                      "sec": round(sec, 2),
                      "rows_per_sec": round(n / sec, 1)}

    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    spark.conf.set("spark.sql.files.openCostInBytes", "512k")
    docs = spark.read.parquet(dpath)
    n_docs = docs.count()

    pairs, cold, sec = _timed(
        spark, lambda: minhash_lsh_pairs(docs, threshold=0.5).count(),
        passes=passes)
    out["dedup"] = {"docs": n_docs, "pairs": pairs,
                    "cold_sec": round(cold, 2), "sec": round(sec, 2)}

    spark.catalog.clearCache()  # phase isolation (bench_sf1 lesson)
    flagged, cold, sec = _timed(
        spark,
        lambda: decontaminate(docs, ["7", "13"], hash_keys=True).count(),
        passes=passes)
    out["decontam"] = {"docs": n_docs, "rows": flagged,
                       "cold_sec": round(cold, 2), "sec": round(sec, 2)}
    spark.stop()
    print(json.dumps(out))


def _run_arm(cores: int, scale: float) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--cores", str(cores), "--scale", str(scale)],
        capture_output=True, text=True, cwd=REPO, timeout=7200)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise SystemExit(
            f"worker cores={cores} scale={scale} produced no result")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--scale", type=float, default=None)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()
    if args.worker:
        run_worker(args.cores, args.scale, args.passes)
        return

    from tools.quietbox import assert_quiet

    assert_quiet("bench_weak")
    draws: dict[str, list[dict]] = {f"{c}c_{s}x": [] for c, s in ARMS}
    for _ in range(max(1, args.rounds)):
        # strictly interleaved: a co-tenant load window hits both arms
        for cores, scale in ARMS:
            draws[f"{cores}c_{scale}x"].append(_run_arm(cores, scale))

    # per-phase BEST cold/steady per arm across rounds (the ab_minhash
    # aggregation: single draws of the 2.5M-doc shuffle phases swing 2-4x
    # on this box — see the module docstring)
    results = {}
    for key, arm_draws in draws.items():
        best = dict(arm_draws[0])
        for phase in ("extract", "dedup", "decontam"):
            best[phase] = dict(arm_draws[0][phase])
            best[phase]["cold_sec"] = min(d[phase]["cold_sec"]
                                          for d in arm_draws)
            best[phase]["sec"] = min(d[phase]["sec"] for d in arm_draws)
            best[phase]["draws_cold_sec"] = [d[phase]["cold_sec"]
                                             for d in arm_draws]
            best[phase]["draws_sec"] = [d[phase]["sec"] for d in arm_draws]
            if "rows_per_sec" in best[phase]:
                best[phase]["rows_per_sec"] = round(
                    best[phase]["rows"] / best[phase]["sec"], 1)
        results[key] = best

    (small_key, _), (big_key, _) = (
        (f"{c}c_{s}x", None) for c, s in ARMS)
    summary = {"rounds": args.rounds, "arms": results,
               "weak_efficiency": {}}
    for phase in ("extract", "dedup", "decontam"):
        a, b = results[small_key][phase], results[big_key][phase]
        # ideal: same wall at 4x data on 4x cores -> ratio 1.0
        summary["weak_efficiency"][phase] = round(a["sec"] / b["sec"], 3)
        summary["weak_efficiency"][phase + "_cold"] = round(
            a["cold_sec"] / b["cold_sec"], 3)
    with open(os.path.join(REPO, "BENCH_weak.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
