"""Table catalog over the driver-provided parquet star schema.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets column
pruning + predicate pushdown for free; at 100 TB these tables would be
directory-partitioned (e.g. ``orders/o_orderdate=.../``) and the same
reader picks up partition pruning with no code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at ANY scale factor (bounded
# cardinality: 5 regions, 25 nations; supplier/part/customer grow with SF
# and are left to AQE / size-based broadcast decisions).
BROADCAST_SAFE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # must hold even under a caller-built session (e.g. the driver's):
        # the events file stores TIMESTAMP(NANOS), illegal for Spark's
        # reader unless read as raw long
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong → truncate to micros
        # (matches DuckDB's micros TIMESTAMP truncation of the same file)
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
