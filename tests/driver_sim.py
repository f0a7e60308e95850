"""Simulate the driver's correctness check: run each __spark_entry__ query
on Spark and its oracle_sql on DuckDB at a given sf dir, compare row count,
sorted column names, and order-insensitive stringified values."""

from __future__ import annotations

import math
import sys


def normalize(rows, columns):
    """Order-insensitive canonical form: per row, sort columns by name and
    stringify values (floats to 6dp to absorb representation noise)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def fmt(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6f}"
        return str(v)

    return sorted(",".join(fmt(row[i]) for i in order) for row in rows)


def compare_query(spark, con, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if sql is None:
        return {"name": name, "mode": "rows_only", "rows": len(spark_rows),
                "match": len(spark_rows) >= 0}

    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    ok_cols = sorted(spark_cols) == sorted(duck_cols)
    ok_count = len(spark_rows) == len(duck_rows)
    ok_vals = False
    if ok_cols and ok_count:
        ok_vals = normalize(spark_rows, spark_cols) == \
                  normalize(duck_rows, duck_cols)
    out = {"name": name, "mode": "oracle", "rows": len(spark_rows),
           "oracle_rows": len(duck_rows), "cols_match": ok_cols,
           "count_match": ok_count, "values_match": ok_vals,
           "match": ok_cols and ok_count and ok_vals}
    if not out["match"]:
        out["spark_cols"] = spark_cols
        out["duck_cols"] = duck_cols
        if ok_cols and ok_count:
            a = normalize(spark_rows, spark_cols)
            b = normalize(duck_rows, duck_cols)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            out["first_diffs"] = diff
    return out


def main(sf_dir="/root/testdata/sf0.01", only=None):
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as entrymod
    from glm_ocr_spark.pipeline import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare_query(spark, con, name, fn, sqls.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            r = {"name": name, "match": False, "error": f"{type(e).__name__}: {e}"}
        status = "OK " if r["match"] else "FAIL"
        print(f"{status} {name}: "
              + ", ".join(f"{k}={v}" for k, v in r.items()
                          if k not in ("name", "match", "first_diffs")))
        if not r["match"]:
            failures += 1
            for d in r.get("first_diffs", []):
                print("   spark:", d[0][:200])
                print("   duck :", d[1][:200])
    spark.stop()
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if argv and "/" in argv[0]:
        sf_dir = argv.pop(0)
    only = set(argv) or None
    sys.exit(1 if main(sf_dir, only=only) else 0)
