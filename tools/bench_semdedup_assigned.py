"""Round-5 verdict ask #6: demonstrate the zero-Exchange
`semantic_dedup_from_assigned` path at bench scale (it was plan-asserted
in pytest only).

Writes the sf0.1 embeddings as a hive-bucketed `bucketBy(cell)` table
(assign-once: cells from the trained production centroids), then measures
the pair stage over (a) the bucketed assigned table and (b) the
assign-on-read path, recording wall seconds AND shuffle-write bytes
(REST stage metrics, the bench.py shuffle_metrics method). Writes
BENCH_semdedup_assigned.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
BENCH_DATA = os.path.join(REPO, ".bench")


def main() -> None:
    from tools.quietbox import assert_quiet

    assert_quiet("bench_semdedup_assigned")
    from pyspark.sql import functions as F

    from bench import diff_metrics, shuffle_metrics
    from glm_ocr_spark.operators.similarity import (
        ivf_cell_sim_udf,
        semantic_dedup,
        semantic_dedup_from_assigned,
        train_ivf_centroids,
    )
    from glm_ocr_spark.pipeline import get_spark

    wh = os.path.join(BENCH_DATA, "warehouse_semdedup")
    shutil.rmtree(wh, ignore_errors=True)
    spark = get_spark(app="bench-semdedup-assigned", master="local[32]",
                      extra_conf={"spark.sql.warehouse.dir": wh})
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    cents = train_ivf_centroids(emb)

    # assign once, persist bucketed by cell (the deployment layout)
    table = "semdedup_assigned_bench"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    cs = ivf_cell_sim_udf(cents)(F.col("embedding"))
    (emb.select("vec_id",
                F.col("embedding").cast("array<double>").alias("embedding"))
        .withColumn("_cs", cs)
        .select("vec_id", "embedding", F.col("_cs.cell").alias("cell"),
                F.col("_cs.cent_sim").alias("cent_sim"))
        .write.bucketBy(32, "cell").sortBy("cell")
        .mode("overwrite").saveAsTable(table))
    assigned = spark.table(table)

    out: dict = {"rows": assigned.count(), "n_cells": 128}

    def measure(name, fn):
        fn().count()  # warm
        best = None
        bytes_ = None
        for _ in range(2):
            before = shuffle_metrics(spark)
            t0 = time.time()
            n = fn().count()
            dt = time.time() - t0
            d = diff_metrics(before, shuffle_metrics(spark))
            if best is None or dt < best:
                best = dt
                bytes_ = d.get("shuffle_write_bytes")
            spark.catalog.clearCache()
        out[name] = {"survivors": n, "best_sec": round(best, 3),
                     "shuffle_write_bytes": bytes_}

    measure("assigned_bucketed",
            lambda: semantic_dedup_from_assigned(assigned))
    measure("assign_on_read",
            lambda: semantic_dedup(emb, centroids=cents))
    assert (out["assigned_bucketed"]["survivors"]
            == out["assign_on_read"]["survivors"])
    spark.stop()
    with open(os.path.join(REPO, "BENCH_semdedup_assigned.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
