"""pos_pipeline_core_etl_spark — PySpark-native analytics engine.

A from-scratch Spark-first rebuild of the capabilities of the reference
POS analytics pipeline (ToxicFyre/pos-pipeline-core-etl): medallion ETL
over payments / sales / transfers facts, gold-layer marts (daily payments,
sales-by-ticket, sales-by-group, transfers pivot), a data-QA suite,
time-series forecasting with a deposit-schedule calendar — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Everything is expressed as declarative DataFrame / Spark SQL plans so
Catalyst handles pushdown, pruning, and join strategy; Python appears
only at the edges (driver-side parsing, Arrow-vectorized pandas UDFs,
applyInPandas model fitting).
"""

__version__ = "0.1.0"

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: F401
