"""Central query registry: name → (spark_callable, oracle_sql | None).

The driver contract (``__spark_entry__.py``) and the local test harness
both read from here, so the set of claimed operators lives in one place.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    registry: dict[str, tuple[QueryFn, str | None]] = {}
    from pos_pipeline_core_etl_spark.plans import marts, relational

    modules = [relational, marts]
    try:
        from pos_pipeline_core_etl_spark.plans import cleaning_queries

        modules.append(cleaning_queries)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import windows

        modules.append(windows)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import qa_queries

        modules.append(qa_queries)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import llm_ops

        modules.append(llm_ops)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import forecast_queries

        modules.append(forecast_queries)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import streaming_queries

        modules.append(streaming_queries)
    except ImportError:
        pass
    try:
        from pos_pipeline_core_etl_spark.plans import analytics

        modules.append(analytics)
    except ImportError:
        pass

    for mod in modules:
        for name, entry in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name {name!r}")
            fn, sql = entry
            registry[name] = (fn, sql)
    return registry


def all_queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _collect().items()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _collect().items() if sql is not None}
