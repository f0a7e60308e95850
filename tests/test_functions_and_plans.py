"""Column-function T-op parity with the Python kernel, plan-audit helpers,
and source decode (S2)."""

from pyspark.sql import functions as F

from glm_ocr_spark.functions import (
    clean_punct_runs_col,
    enum_normalize_col,
    formula_wrap_col,
    map_label_col,
)
from glm_ocr_spark.kernel.textproc import clean_content, format_content, map_label
from glm_ocr_spark.plans import (
    assert_no_exchange,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
from glm_ocr_spark.sources import decode_payload_col


def _apply(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


class TestColumnFunctionParity:
    def test_punct_runs_match_kernel(self, spark):
        cases = ["contents .......... 42", "x ······ y", "fill ______ in",
                 "a ... b", "plain"]
        got = _apply(spark, clean_punct_runs_col, cases)
        want = [clean_content(c) for c in cases]
        assert got == want

    def test_enum_normalize_matches_kernel(self, spark):
        cases = ["·alpha", "•beta", "* gamma", "(12)wide", "plain"]
        got = _apply(spark, enum_normalize_col, cases)
        want = [format_content(c, "text", "text") for c in cases]
        assert got == want

    def test_formula_wrap_matches_kernel(self, spark):
        cases = ["$$E=mc^2$$", r"\[x+y\]", r"\(a\)", "bare"]
        got = _apply(spark, formula_wrap_col, cases)
        want = [format_content(c, "formula", "display_formula") for c in cases]
        assert got == want

    def test_map_label_matches_kernel(self, spark):
        cases = ["doc_title", "display_formula", "chart", "table", "weird"]
        got = _apply(spark, map_label_col, cases)
        assert got == [map_label(c) for c in cases]


class TestSourceDecode:
    def test_multi_source_decode(self, spark):
        import base64

        blob = base64.b64encode("hello <p>x</p>".encode()).decode()
        rows = _apply(spark, decode_payload_col, [
            f"data:text/html;base64,{blob}",
            f"<|base64|>{blob}",
            "plain text stays",
        ])
        assert rows == ["hello <p>x</p>", "hello <p>x</p>", "plain text stays"]


class TestPlanAudit:
    def test_filter_pushdown_reaches_scan(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        q = df.filter(F.col("n_chars") > 100).select("doc_id")
        pushed = pushed_filters(q)
        assert any("n_chars" in p for p in pushed), pushed

    def test_broadcast_join_detected(self, spark):
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        j = orders.join(F.broadcast(customer),
                        orders["o_custkey"] == customer["c_custkey"])
        assert has_broadcast_join(j)

    def test_codegen_present_for_relational(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        q = df.groupBy("l_returnflag").agg(F.sum("l_quantity"))
        assert wholestage_codegen_spans(q) >= 1

    def test_assert_no_exchange_raises_on_shuffle(self, spark):
        import pytest

        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        q = df.groupBy("l_returnflag").count()
        with pytest.raises(AssertionError):
            assert_no_exchange(q)


def test_percentile_approx_rank_error_bound(spark):
    """percentile_approx in the genuinely approximate regime (n=50000 >>
    accuracy=100): the GK guarantee is rank error <= n/accuracy, so the
    returned value must lie within the exact [q - 2eps, q + 2eps] quantile
    window. This is the bound a 100 TB user sizes against; the driver
    queries run in the exact regime (group n < accuracy)."""
    import numpy as np
    from pyspark.sql import functions as F

    n, accuracy = 50_000, 100
    rng = np.random.RandomState(3)
    vals = rng.lognormal(5.0, 1.0, n)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    eps = 1.0 / accuracy
    for q in (0.25, 0.5, 0.9):
        got = df.agg(
            F.expr(f"percentile_approx(x, {q}, {accuracy})")).first()[0]
        lo = float(np.quantile(vals, max(0.0, q - 2 * eps)))
        hi = float(np.quantile(vals, min(1.0, q + 2 * eps)))
        assert lo <= got <= hi, (q, got, lo, hi)


def test_approx_count_distinct_error_bound(spark):
    """HLL++ twin of distinct_users_per_type: at rsd=0.01 the estimate per
    group must land within ~3 standard errors (3%) of the exact count on
    the sf0.01 events table — the bound a 100 TB user sizes against."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"
    exact = {r["event_type"]: r["n_users"]
             for r in e.bench_only()["distinct_users_per_type"](
                 spark, sf_dir).collect()}
    approx = {r["event_type"]: r["n_users_approx"]
              for r in e.bench_only()["distinct_users_approx_raw"](
                  spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.03 * n), (k, n, approx[k])
    # the advertised verification twin must agree with the exact counts
    # and self-certify the same bound (this is the row the driver oracles)
    verified = e.queries()["distinct_users_per_type_approx"](
        spark, sf_dir).collect()
    assert {r["event_type"]: r["n_users_exact"] for r in verified} == exact
    assert all(r["approx_within_3sd"] == 1 for r in verified)


def test_approx_count_distinct_partial_merges_map_side(spark):
    """The HLL aggregate must show partial_approx_count_distinct below the
    Exchange (sketches merge map-side; only ~KB registers shuffle). The
    production shape is the raw bench_only query; the advertised query
    adds an exact twin for oracle verification but must still carry the
    map-side partial sketch."""
    import __spark_entry__ as e

    df = e.bench_only()["distinct_users_approx_raw"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan

    df2 = e.queries()["distinct_users_per_type_approx"](
        spark, "/root/testdata/sf0.001")
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan2


def test_read_transcripts_jsonl_and_csv_roundtrip(spark, tmp_path):
    """Schema-enforced JSONL/CSV transcript feeds parse to the identical
    rows as the parquet contract (no inference pass, FAILFAST on drift)."""
    from glm_ocr_spark.data.gen import transcripts_df
    from glm_ocr_spark.sources.readers import read_transcripts

    src = transcripts_df(spark, 0.001).limit(200).cache()
    # tool '' -> None: CSV cannot carry the distinction (both read NULL);
    # the extraction path treats them identically (pipeline.py:108), so
    # the contract comparison normalizes it
    want = {(r["conv_id"], r["turn_idx"], r["role"], r["text"],
             r["tool"] or None, r["ts"]) for r in src.collect()}
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    src.write.mode("overwrite").json(jdir)
    # RFC-4180 quoting ("" doubling) — what external CSV feeds produce and
    # what read_transcripts' escape='"' expects
    src.write.mode("overwrite").option("header", "true") \
        .option("escape", '"').csv(cdir)
    for path, fmt in ((jdir, "json"), (cdir, "csv")):
        got_df = read_transcripts(spark, path, fmt=fmt)
        assert [f.name for f in got_df.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        got = {(r["conv_id"], r["turn_idx"], r["role"], r["text"],
                r["tool"] or None, r["ts"]) for r in got_df.collect()}
        assert got == want, fmt
