"""Round-5 verdict ask #7: quantify the quota-salting premium/payoff as a
2x2 table (strategy x skew).

Arms:
  corpus "bench"  — sf0.1 documents.parquet (60 balanced sources);
  corpus "skewed" — the 90%-one-source shape test_skew.py builds, at 2M
                    rows (the regime the salt insures against).
Strategies:
  "salted" — topk_per_key_salted (two-level window, production default);
  "single" — plain row_number over partitionBy(source) (the straggler
             shape on a hot key).

Method: one local[32] session, per (corpus, strategy) cell warm + 2 timed
passes (best kept), strictly interleaved within each corpus so a noise
window cannot favor one arm; row counts asserted equal across strategies.
Writes BENCH_ab_quota.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 5
SKEW_ROWS = 2_000_000


def main() -> None:
    from tools.quietbox import assert_quiet

    assert_quiet("ab_quota")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from glm_ocr_spark.operators.relational import topk_per_key_salted
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(app="ab-quota", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    bench = (spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
             .select("doc_id", "source", "lang"))
    skewed = spark.range(SKEW_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 != 0, F.lit("megacrawl"))
         .otherwise(F.concat(F.lit("s"), F.col("id") % 100)).alias("source"),
        F.lit("en").alias("lang"),
    )

    def salted(df):
        return topk_per_key_salted(df, ["source"], "doc_id", K,
                                   rank_name="rank_in_source")

    def single(df):
        w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
        return (df.withColumn("rank_in_source", F.row_number().over(w))
                .filter(F.col("rank_in_source") <= K))

    out: dict = {"k": K, "skew_rows": SKEW_ROWS}
    for cname, corpus in (("bench_sf0.1_balanced", bench),
                          ("skewed_90pct_one_source", skewed)):
        counts = {}
        times = {"salted": [], "single": []}
        for strat, fn in (("salted", salted), ("single", single)):
            spark.sparkContext.setJobDescription(f"warm:{cname}:{strat}")
            counts[strat] = fn(corpus).count()
        for _ in range(2):  # interleaved timed passes
            for strat, fn in (("salted", salted), ("single", single)):
                spark.sparkContext.setJobDescription(f"{cname}:{strat}")
                t0 = time.time()
                fn(corpus).count()
                times[strat].append(round(time.time() - t0, 3))
        assert counts["salted"] == counts["single"], counts
        out[cname] = {
            "rows_kept": counts["salted"],
            "salted_draws_sec": times["salted"],
            "single_draws_sec": times["single"],
            "salted_best": min(times["salted"]),
            "single_best": min(times["single"]),
            "salted_over_single": round(
                min(times["salted"]) / min(times["single"]), 3),
        }
    spark.stop()
    with open(os.path.join(REPO, "BENCH_ab_quota.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
