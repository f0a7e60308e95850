"""Driver-contract tests: entry() smoke + every query vs its DuckDB oracle
at sf0.001 (the full sf0.01 sweep is tests/driver_sim.py, run standalone)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from tests.driver_sim import compare_query  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert {"conv_id", "turn_idx", "extracted_text"} <= set(df.columns)


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        assert callable(fn), name


def test_queries_fit_driver_cap():
    """The driver checks at most 50 queries per round (r02: 45/45, r03:
    first 50 of 65) — the advertised surface must fit so every entry gets
    a CORRECTNESS row in the round it ships (round-3 verdict ask #2)."""
    assert len(entrymod.queries()) <= 50


def test_oracle_sql_keys_subset_of_queries():
    qs = set(entrymod.queries()) | set(entrymod.bench_only())
    sqls = set(entrymod.oracle_sql())
    assert sqls <= qs, sqls - qs


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    r = compare_query(spark, duck, name, fn, sql, SF_DIR)
    assert r["match"], r


@pytest.mark.parametrize("name", sorted(entrymod.bench_only()))
def test_bench_only_query_matches_oracle(spark, duck, name):
    """Demoted queries stay oracle-verified in pytest even though the
    driver no longer checks them (COVERAGE.md has the demotion notes)."""
    fn = entrymod.bench_only()[name]
    sql = entrymod.oracle_sql().get(name)
    r = compare_query(spark, duck, name, fn, sql, SF_DIR)
    assert r["match"], r
