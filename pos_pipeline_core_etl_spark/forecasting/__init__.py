from pos_pipeline_core_etl_spark.forecasting.models import (  # noqa: F401
    ForecastModel,
    LogARIMAModel,
    LogLinearSeasonalModel,
    NaiveLastWeekModel,
)
from pos_pipeline_core_etl_spark.forecasting.api import (  # noqa: F401
    ForecastConfig,
    ForecastResult,
    run_payments_forecast,
)
