from pos_pipeline_core_etl_spark.functions.cleaning import (  # noqa: F401
    neutralize,
    normalize_spanish_name,
    remove_accents_col,
    strip_invisibles,
    to_date_multi,
    to_float,
    to_float_expr,
)
from pos_pipeline_core_etl_spark.functions.buckets import (  # noqa: F401
    PAYMENT_BUCKETS,
    bucket_for_payment_method,
)
