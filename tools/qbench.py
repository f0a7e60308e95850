"""Standalone per-query bench + plan capture (bench.py methodology: one
local[N] session, per-query wall over count()/collect(), clearCache
between queries; explain('formatted') optionally dumped per query).

Usage:
  python tools/qbench.py [--plans plans/r06 --suffix _before]
                         [--passes 1] [--sf-dir /root/testdata/sf0.1]
                         [query ...]        # default: the full bench list

Prints one JSON line {"queries": {name: sec}, ...}. This is auxiliary
tooling (guide §1.4): bench.py itself stays frozen.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_LIST = [
    "extract_docs", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "revenue_by_nation",
    "topk_events_per_user", "sessionize", "moving_value_avg",
    "events_hourly_rollup",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_components", "ann_cosine_topk",
    "ann_lsh_topk", "ann_ivf_topk", "emb_neardup", "emb_neardup_strict",
    "semdedup", "quality_score",
    "fingerprint", "winnow_fingerprint", "token_count_bpe",
    "doc_length_percentiles", "doc_length_percentiles_approx",
    "gopher_quality", "bm25_scores", "quota_per_source",
    "stratified_sample", "passage_dedup", "top_ngrams",
    "pii_scrub", "decontaminate", "c4_filters", "curation_pipeline",
    "rep_ngram_fractions",
    "q10_returned_items", "q4_priority_with_returns",
    "q6_revenue", "q14_promo_revenue", "q19_disjunctive_revenue",
    "cube_events", "pivot_events", "rollup_events",
    "distinct_users_approx_raw",
    "asof_view_before_purchase", "range_join_views_before_purchase",
    "mm_media_meta", "mm_frame_sample",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--suffix", default="",
                    help="plan filename suffix, e.g. _before / _after")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    ap.add_argument("--cpus",
                    default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()
    names = args.names or BENCH_LIST

    from tools.quietbox import other_spark_jvms
    cotenants = other_spark_jvms()

    import __spark_entry__ as entrymod
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(app="qbench", master=f"local[{args.cpus}]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entrymod.bench_only(), **entrymod.queries()}

    if args.plans:
        os.makedirs(os.path.join(REPO, args.plans), exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        best = None
        for _ in range(max(1, args.passes)):
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            if name.startswith("ann_"):
                df.collect()
            else:
                df.count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        if args.plans:
            df = fn(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(REPO, args.plans,
                                   f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        print(f"  {name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"queries": out, "sf_dir": args.sf_dir,
                      "cpus": args.cpus, "passes": args.passes,
                      "cotenant_spark_jvms": cotenants}))


if __name__ == "__main__":
    main()
