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
