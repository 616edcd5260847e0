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
    #: opt-in: surface per-group model debug info (reference
    #: forecasting/api.py:54-74 carries debug[model][branch][metric];
    #: populated only for models implementing the HasDebugInfo protocol,
    #: i.e. exposing ``debug_`` after forecast — types.py:409-421)
    debug: bool = False


@dataclass
class ForecastResult:
    forecast: DataFrame
    deposit_schedule: DataFrame
    metadata: dict[str, Any]
    #: debug[model_name][sucursal][metric] = the model's ``debug_`` map
    #: (e.g. NaiveLastWeek: forecast date → historical source date used,
    #: reference models/naive.py:59-409). Empty unless config.debug.
    debug: dict[str, dict[str, dict[str, Any]]] = field(default_factory=dict)


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
    want_debug = config.debug

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        sucursal = pdf["sucursal"].iloc[0]
        metric = pdf["metric"].iloc[0]
        series = (
            pdf.set_index(pd.to_datetime(pdf["fecha"]))["valor"]
            .sort_index()
            .asfreq("D", fill_value=0.0)
        )
        if (series != 0).sum() < MIN_OBSERVATIONS:
            return pd.DataFrame(
                columns=["sucursal", "metric", "fecha", "valor", "debug_json"]
            ).astype({"valor": "float64"})
        trained = model.train(series)
        pred = model.forecast(trained, horizon)
        # HasDebugInfo protocol (reference types.py:409-421): a model
        # exposing debug_ after forecast ships it out of the executor
        # as one JSON cell on the group's first row
        dbg = None
        if want_debug and getattr(model, "debug_", None):
            dbg = _json.dumps(model.debug_)
        return pd.DataFrame(
            {
                "sucursal": sucursal,
                "metric": metric,
                "fecha": pred.index.date,
                "valor": pred.to_numpy(dtype=float),
                "debug_json": [dbg] + [None] * (len(pred) - 1),
            }
        )

    full = long_df.groupBy("sucursal", "metric").applyInPandas(
        fit_group,
        schema="sucursal string, metric string, fecha date, valor double,"
        " debug_json string",
    )
    debug: dict[str, dict[str, dict[str, Any]]] = {}
    if want_debug:
        import json as _json

        # checkpoint so the training pass is not repeated when the
        # caller consumes the forecast frame; the result is horizon ×
        # branches × metrics rows — small by construction
        full = full.localCheckpoint(eager=True)
        per_model: dict[str, dict[str, Any]] = {}
        for row in (
            full.where(F.col("debug_json").isNotNull())
            .select("sucursal", "metric", "debug_json")
            .collect()
        ):
            per_model.setdefault(row["sucursal"], {})[row["metric"]] = _json.loads(
                row["debug_json"]
            )
        if per_model:
            debug[type(model).__name__] = per_model
    forecast = full.drop("debug_json")
    deposits = build_deposit_schedule(mart)
    metadata = {
        "horizon_days": horizon,
        "metrics": list(config.metrics),
        "model": type(model).__name__,
        "min_observations": MIN_OBSERVATIONS,
    }
    return ForecastResult(
        forecast=forecast, deposit_schedule=deposits, metadata=metadata, debug=debug
    )


# applyInPandas closures ship to executors — serialize by value
from pos_pipeline_core_etl_spark.functions.serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
