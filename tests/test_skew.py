"""Skew handling: a pathologically long conversation must spread across
partitions (north rule: "partitioning / shuffle / skew handled explicitly";
SURVEY.md §7.3.4)."""

from pyspark.sql import functions as F

from glm_ocr_spark.data.gen import transcripts_df
from glm_ocr_spark.pipeline import extract_transcripts, repartition_salted


def test_salted_repartition_spreads_hot_conversation(spark):
    # one conversation with 2000 turns + a few small ones
    hot = spark.range(2000).select(
        F.lit("hot").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("<p>turn "), F.col("id"), F.lit("</p>")).alias("text"),
        F.lit("").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    salted = repartition_salted(hot, num_partitions=8, salt_block=64)
    sizes = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    non_empty = [r["count"] for r in sizes if r["count"] > 0]
    # 2000 turns / salt_block 64 = ~32 salt groups over 8 partitions: the hot
    # conversation must not pin a single partition
    assert len(non_empty) >= 4
    assert max(non_empty) < 2000

    # extraction over the salted layout stays correct and complete
    out = extract_transcripts(salted)
    assert out.count() == 2000
    assert out.filter("extracted_text LIKE 'turn %'").count() == 2000


def test_salted_rollup_on_100k_turn_conversation(spark):
    """A ~10^5-turn conversation must roll up correctly through the
    two-level salted aggregate (round 1's single collect_list per conv_id
    would build the whole 10^5-element array on one reducer). Includes
    null-markdown (skip-task) turns, which must vanish without leaving a
    stray delimiter, exactly like single-level array_join null-skipping."""
    from glm_ocr_spark.pipeline import conversation_rollup

    n = 100_000
    turns = spark.range(n).select(
        F.lit("big").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        # every 7th turn is a skip-task turn: markdown NULL
        F.when(F.col("id") % 7 == 0, F.lit(None))
         .otherwise(F.concat(F.lit("t"), F.col("id"))).alias("markdown"),
        F.lit(1).alias("n_blocks"),
    )
    out = conversation_rollup(turns, salt_block=1024).head()
    assert out["n_turns"] == n
    assert out["n_blocks_total"] == n
    expected = "\n\n".join(f"t{i}" for i in range(n) if i % 7 != 0)
    assert out["conversation_markdown"] == expected


def test_salted_rollup_matches_single_level_on_null_edge(spark):
    """Tiny adversarial cases: blocks made entirely of null markdown, empty
    strings vs nulls, block boundaries."""
    from glm_ocr_spark.pipeline import conversation_rollup

    rows = [
        ("c", 0, "a", 1), ("c", 1, None, 0), ("c", 2, "b", 1),
        ("c", 3, None, 0), ("c", 4, None, 0),  # block of only nulls (blk=1 @2)
        ("c", 5, "", 1),                        # empty string is kept
        ("d", 0, None, 0), ("d", 1, None, 0),   # all-null conversation
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, markdown string, n_blocks int")
    got = {r["conv_id"]: r for r in
           conversation_rollup(df, salt_block=2).collect()}
    assert got["c"]["conversation_markdown"] == "a\n\nb\n\n"
    assert got["c"]["n_turns"] == 6
    assert got["d"]["conversation_markdown"] == ""


def test_generated_corpus_has_heavy_conversations(spark):
    df = transcripts_df(spark, 0.001)
    counts = df.groupBy("conv_id").count()
    stats = counts.agg(F.max("count").alias("mx"),
                       F.expr("percentile(count, 0.5)").alias("med")).head()
    # FIXTURES.md: a few conversations at 10x+ the median turn count
    assert stats["mx"] >= 10 * stats["med"]


def test_generation_partitions_are_uniform(spark):
    # global-ordinal generation: partition sizes within 2x of each other
    df = transcripts_df(spark, 0.001, num_partitions=16)
    sizes = [r["count"] for r in
             df.withColumn("pid", F.spark_partition_id())
               .groupBy("pid").count().collect()]
    assert len(sizes) == 16
    assert max(sizes) <= 2 * min(sizes)


def test_salted_quota_on_90pct_one_source_corpus(spark):
    """Round-3 verdict ask #8: `partitionBy(source)` is a skewed-key
    shuffle when one source dominates. The salted two-level top-k must
    (a) spread the hot source over many reducers in stage 1 — no
    straggler partition holding the whole hot key — and (b) produce
    exactly the single-window answer."""
    from pyspark.sql import Window

    from glm_ocr_spark.operators.relational import (
        QUOTA_SALTS,
        quota_per_source,
        topk_per_key_salted,
    )

    n = 20_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # 90% of the corpus is one source, the rest spread over 100
        F.when(F.col("id") % 10 != 0, F.lit("megacrawl"))
         .otherwise(F.concat(F.lit("s"), F.col("id") % 100)).alias("source"),
        F.lit("en").alias("lang"),
    )
    k = 5
    got = quota_per_source(docs, max_per_source=k)
    w = Window.partitionBy("source").orderBy(F.asc("doc_id"))
    want = (
        docs.select("doc_id", "source", "lang",
                    F.row_number().over(w).alias("rank_in_source"))
        .filter(F.col("rank_in_source") <= k)
    )
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    # stage-1 skew evidence: per (source, salt) group the hot key's rows
    # split into QUOTA_SALTS groups, each ~1/QUOTA_SALTS of the key — the
    # largest sort any reducer does is bounded by the salt fan-out
    salted = docs.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(QUOTA_SALTS)))
    grp = salted.groupBy("source", "_salt").count().collect()
    hot = [r["count"] for r in grp if r["source"] == "megacrawl"]
    assert len(hot) == QUOTA_SALTS
    assert max(hot) < 0.9 * n * 0.25  # no salt group holds the hot key

    # stage-2 input is bounded: <= QUOTA_SALTS * k rows per source
    pruned = topk_per_key_salted(docs, ["source"], "doc_id", k)
    inter = (
        salted.withColumn(
            "_rk", F.row_number().over(
                Window.partitionBy("source", "_salt")
                .orderBy(F.asc("doc_id"))))
        .filter(F.col("_rk") <= k)
    )
    per_src = inter.groupBy("source").count().collect()
    assert max(r["count"] for r in per_src) <= QUOTA_SALTS * k
    assert pruned.count() == got.count()


def test_salted_topk_with_ties_needs_and_honors_tie_cols(spark):
    """ADVICE r4: with duplicate order values a salt boundary can split a
    tie group and stage 1 may drop rows a single window would rank within
    k. `tie_cols` extends the effective ordering to a unique composite —
    the salted result must then equal the single window ordered the same
    way, even on a corpus where every order value is heavily tied."""
    from pyspark.sql import Window

    from glm_ocr_spark.operators.relational import topk_per_key_salted

    docs = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("grp"),
        # only 4 distinct order values -> massive ties within every key
        (F.col("id") % 4).cast("double").alias("score"),
    )
    k = 7
    got = topk_per_key_salted(docs, ["grp"], "score", k,
                              tie_cols=["doc_id"])
    w = Window.partitionBy("grp").orderBy(F.asc("score"), F.asc("doc_id"))
    want = (docs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() == 3 * k


def test_topk_salted_validate_unique_catches_ties(spark):
    """Round-5 advice: the (order_col, *tie_cols) uniqueness contract has
    a debug mode that detects violations instead of silently dropping
    rows; with a proper tie column it passes and matches the single
    window."""
    import pytest

    from glm_ocr_spark.operators.relational import topk_per_key_salted

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 11), ("a", 2, 12), ("b", 1, 13)],
        ["src", "ordv", "uid"])
    with pytest.raises(ValueError, match="uniqueness contract"):
        topk_per_key_salted(df, ["src"], "ordv", 1,
                            validate_unique=True).collect()
    out = topk_per_key_salted(df, ["src"], "ordv", 1, tie_cols=["uid"],
                              validate_unique=True)
    assert {(r["src"], r["uid"]) for r in out.collect()} == \
        {("a", 10), ("b", 13)}
