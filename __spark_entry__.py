"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (payments daily mart) at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full registry
(see ``pos_pipeline_core_etl_spark/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pos_pipeline_core_etl_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pos_pipeline_core_etl_spark.plans.marts import payments_daily_mart

    return payments_daily_mart(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return registry.all_oracles()
