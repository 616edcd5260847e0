"""Local replica of the driver's t2 correctness gate.

Runs a registry query under Spark and its oracle SQL under DuckDB on the
same parquet tables, then compares row count, column names, and values
order-insensitively (rows sorted by every column). Floats are compared
EXACTLY — the queries themselves round where summation order could
differ, so any residual mismatch is a real semantics bug.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from pos_pipeline_core_etl_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ("null",)
        if pd.isna(v):
            return ("null",)
        if isinstance(v, float):
            return ("f", float(v))
        if isinstance(v, (bool,)):
            return ("b", bool(v))
        if isinstance(v, int):
            return ("i", int(v))
        if hasattr(v, "isoformat"):
            iso = v.isoformat()
            # dates vs midnight timestamps compare equal
            return ("t", iso[:10] if iso.endswith("00:00:00") else iso)
        return ("s", str(v))

    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def compare_query(spark, name: str, fn, sql: str | None, sf_dir: str = SF_DIR) -> None:
    sdf = fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if sql is None:
        assert len(spark_pd) >= 0  # rows-only check
        return
    con = duckdb_connection(sf_dir)
    try:
        duck_pd = con.execute(sql).fetchdf()
    finally:
        con.close()

    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: column mismatch spark={sorted(spark_pd.columns)} "
        f"duck={sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count spark={len(spark_pd)} duck={len(duck_pd)}"
    )
    s_rows = _normalize(spark_pd)
    d_rows = _normalize(duck_pd)
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
