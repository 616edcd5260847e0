"""Forecast orchestration (reference parity: SURVEY §3.3).

``run_payments_forecast`` re-expresses ``forecasting/api.py:179-362``:
column-contract check → zero-filled daily series per branch × metric →
skip thin series (<30 obs) → model train/forecast per group → long
result + deposit schedule + metadata.

Scale design: the reference loops branches × metrics in Python on one
core. Here the mart is melted to (sucursal, metric, fecha, valor) and
ONE ``groupBy(sucursal, metric).applyInPandas`` trains every model in
parallel across executors; each group is a small daily series, exactly
the shape pandas models want. Everything before/after is DataFrame ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.forecasting.deposit import build_deposit_schedule
from pos_pipeline_core_etl_spark.forecasting.models import (
    MIN_OBSERVATIONS,
    ForecastModel,
    LogLinearSeasonalModel,
)

DEFAULT_METRICS = (
    "ingreso_efectivo",
    "ingreso_credito",
    "ingreso_debito",
    "ingreso_total",
)
REQUIRED_COLS = ("sucursal", "fecha", "ingreso_efectivo", "ingreso_credito", "ingreso_debito")


@dataclass
class ForecastConfig:
    horizon_days: int = 7
    metrics: tuple[str, ...] = DEFAULT_METRICS
    model: ForecastModel = field(default_factory=LogLinearSeasonalModel)


@dataclass
class ForecastResult:
    forecast: DataFrame
    deposit_schedule: DataFrame
    metadata: dict[str, Any]


def _melt_metrics(mart: DataFrame, metrics: tuple[str, ...]) -> DataFrame:
    from functools import reduce
    from operator import add

    base = mart
    if "ingreso_total" in metrics and "ingreso_total" not in mart.columns:
        ingreso_cols = [c for c in mart.columns if c.startswith("ingreso_")]
        base = base.withColumn(
            "ingreso_total", reduce(add, [F.col(c) for c in ingreso_cols])
        )
    pairs = ", ".join(f"'{m}', {m}" for m in metrics)
    return base.selectExpr(
        "sucursal",
        "fecha",
        f"stack({len(metrics)}, {pairs}) AS (metric, valor)",
    )


def run_payments_forecast(
    mart: DataFrame, config: ForecastConfig | None = None
) -> ForecastResult:
    config = config or ForecastConfig()
    missing = [c for c in REQUIRED_COLS if c not in mart.columns]
    if missing:
        raise ValueError(f"mart is missing required columns: {missing}")

    long_df = _melt_metrics(mart, config.metrics)
    model = config.model
    horizon = config.horizon_days

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sucursal = pdf["sucursal"].iloc[0]
        metric = pdf["metric"].iloc[0]
        series = (
            pdf.set_index(pd.to_datetime(pdf["fecha"]))["valor"]
            .sort_index()
            .asfreq("D", fill_value=0.0)
        )
        if (series != 0).sum() < MIN_OBSERVATIONS:
            return pd.DataFrame(
                columns=["sucursal", "metric", "fecha", "valor"]
            ).astype({"valor": "float64"})
        trained = model.train(series)
        pred = model.forecast(trained, horizon)
        return pd.DataFrame(
            {
                "sucursal": sucursal,
                "metric": metric,
                "fecha": pred.index.date,
                "valor": pred.to_numpy(dtype=float),
            }
        )

    forecast = long_df.groupBy("sucursal", "metric").applyInPandas(
        fit_group, schema="sucursal string, metric string, fecha date, valor double"
    )
    deposits = build_deposit_schedule(mart)
    metadata = {
        "horizon_days": horizon,
        "metrics": list(config.metrics),
        "model": type(model).__name__,
        "min_observations": MIN_OBSERVATIONS,
    }
    return ForecastResult(forecast=forecast, deposit_schedule=deposits, metadata=metadata)


# applyInPandas closures ship to executors — serialize by value
from pos_pipeline_core_etl_spark.functions.serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
