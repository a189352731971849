"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Runs each ``__spark_entry__.queries()`` entry against its
``oracle_sql()`` twin on the same parquet dir: row count + schema-width +
order-insensitive value comparison (columns sorted by name, rows sorted,
exact match after string normalization).  Used by tests and by hand
while developing oracles.
"""

from __future__ import annotations

import math
from typing import Any

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def _normalize(rows: list[tuple], cols: list[str]):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def compare(spark_df, con, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_cols, s_vals = _normalize(spark_rows, spark_cols)
    d_cols, d_vals = _normalize(duck_rows, duck_cols)

    out = {
        "rows_spark": len(s_vals),
        "rows_duckdb": len(d_vals),
        "cols_match": s_cols == d_cols,
        "rows_match": len(s_vals) == len(d_vals),
        "values_match": s_vals == d_vals,
    }
    if not out["cols_match"]:
        out["cols"] = (s_cols, d_cols)
    if not out["values_match"] and out["rows_match"] and out["cols_match"]:
        diffs = [(a, b) for a, b in zip(s_vals, d_vals) if a != b]
        out["first_diffs"] = diffs[:3]
    return out


def run_all(sf_dir: str, only: list[str] | None = None, spark=None):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    if spark is None:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "16")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

    con = duckdb_connect(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        if name in oracles:
            results[name] = compare(df, con, oracles[name])
        else:
            results[name] = {"rows_spark": df.count(), "oracle": "rows-only"}
    return results


if __name__ == "__main__":
    import json
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, r in run_all(sf, only).items():
        status = "OK" if r.get("values_match") or "oracle" in r else "FAIL"
        print(f"{status:4} {name}: {json.dumps(r, default=str)[:400]}")
