"""Forecast model plugins (reference parity: SURVEY §2.13, §2.14).

The reference's one real extension point is the ``ForecastModel`` ABC
(``/root/reference/src/pos_core/forecasting/models/base.py:15-52``):
``train(series) -> model`` / ``forecast(model, steps) -> values``. The
rebuild keeps the same ABC; models run INSIDE ``applyInPandas`` groups
(one group per branch × metric), so training parallelizes across the
cluster with zero driver involvement.

Models:
- ``NaiveLastWeekModel`` (naive.py:19-180): per forecast date walk back
  7 days at a time (≤ 52 weeks) to the first candidate ≤ last_data_date
  that is not a holiday or holiday-adjacent; use its value as-is
  (0.0 when the date is missing from the series).
- ``LogLinearSeasonalModel``: log1p → OLS on [intercept, trend,
  day-of-week dummies] via numpy lstsq → expm1, clipped at 0. The
  in-container stand-in for the reference's SARIMAX grid (statsmodels
  is not available here).
- ``LogARIMAModel`` (arima.py:31-185): the reference's log1p + SARIMAX
  AIC grid search — import-gated on statsmodels; raises a clear error
  when the dependency is missing.
"""

from __future__ import annotations

import datetime
from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd

SEASONAL_PERIOD = 7  # forecasting/config.py:13
MIN_OBSERVATIONS = 30  # forecasting/api.py:296; arima.py:106


class ForecastModel(ABC):
    """train on a daily series (DatetimeIndex → float), forecast steps."""

    @abstractmethod
    def train(self, series: pd.Series, **kwargs: Any) -> Any: ...

    @abstractmethod
    def forecast(self, model: Any, steps: int, **kwargs: Any) -> pd.Series: ...


def is_holiday_or_adjacent(d: pd.Timestamp, holidays: set) -> bool:
    """d, d−1, or d+1 is a holiday (reference deposit_schedule.py:15-28)."""
    dd = d.date() if isinstance(d, pd.Timestamp) else d
    one = datetime.timedelta(days=1)
    return dd in holidays or (dd - one) in holidays or (dd + one) in holidays


def find_equivalent_historical_weekday(
    target: pd.Timestamp,
    last_data_date: pd.Timestamp,
    holidays: set,
    max_weeks_back: int = 52,
) -> pd.Timestamp | None:
    """First same-weekday candidate ≤ last_data_date that is not a holiday
    or holiday-adjacent, walking back ≤ ``max_weeks_back`` weeks
    (reference naive.py:19-57)."""
    candidate = target - pd.Timedelta(days=7)
    for _ in range(max_weeks_back):
        if candidate <= last_data_date and not is_holiday_or_adjacent(
            candidate, holidays
        ):
            return candidate
        candidate = candidate - pd.Timedelta(days=7)
    return None


@dataclass
class NaiveLastWeekModel(ForecastModel):
    """Value = observation at the equivalent historical weekday.

    Reference semantics (naive.py:19-180, ADVICE r1): the equivalent date
    is chosen WITHOUT looking at the data — the first same-weekday
    candidate that is ≤ last_data_date and not holiday/holiday-adjacent,
    walking back ≤ 52 weeks. The series value at that date is used as-is
    (including 0.0); a date missing from the series, or no eligible
    candidate at all, yields 0.0.

    Implements the reference's ``HasDebugInfo`` protocol
    (``forecasting/types.py:409-421``): after ``forecast``, ``debug_``
    maps each forecast date to the historical source date used.
    """

    max_weeks: int = 52

    def __post_init__(self) -> None:
        self.debug_: dict[str, str | None] = {}

    def train(self, series: pd.Series, holidays: set | None = None, **kwargs: Any) -> dict:
        if len(series) < MIN_OBSERVATIONS:
            raise ValueError(f"need >= {MIN_OBSERVATIONS} observations")
        return {"series": series, "holidays": holidays or set()}

    def forecast(self, model: dict, steps: int, **kwargs: Any) -> pd.Series:
        series = model["series"]
        holidays = model["holidays"]
        last = series.index.max()
        out_idx = pd.date_range(last + pd.Timedelta(days=1), periods=steps, freq="D")
        by_date = {
            (i.date() if isinstance(i, pd.Timestamp) else i): v
            for i, v in series.items()
        }
        values = []
        self.debug_ = {}
        for d in out_idx:
            src = find_equivalent_historical_weekday(
                d, last, holidays, max_weeks_back=self.max_weeks
            )
            if src is not None and src.date() in by_date:
                val, src_str = float(by_date[src.date()]), str(src.date())
            else:
                val, src_str = 0.0, None
            values.append(val)
            self.debug_[str(d.date())] = src_str
        return pd.Series(values, index=out_idx)


@dataclass
class LogLinearSeasonalModel(ForecastModel):
    """log1p-OLS with weekly dummies — numpy-only, deterministic."""

    def _design(self, idx: pd.DatetimeIndex, t0: pd.Timestamp) -> np.ndarray:
        t = (idx - t0).days.to_numpy(dtype=float)
        dow = idx.dayofweek.to_numpy()
        X = np.zeros((len(idx), 2 + SEASONAL_PERIOD - 1))
        X[:, 0] = 1.0
        X[:, 1] = t / 365.0
        for j in range(1, SEASONAL_PERIOD):
            X[:, 1 + j] = (dow == j).astype(float)
        return X

    def train(self, series: pd.Series, **kwargs: Any) -> dict:
        if len(series) < MIN_OBSERVATIONS:
            raise ValueError(f"need >= {MIN_OBSERVATIONS} observations")
        y = np.log1p(series.clip(lower=0).to_numpy(dtype=float))
        t0 = series.index.min()
        X = self._design(series.index, t0)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        return {"beta": beta, "t0": t0, "last": series.index.max()}

    def forecast(self, model: dict, steps: int, **kwargs: Any) -> pd.Series:
        idx = pd.date_range(
            model["last"] + pd.Timedelta(days=1), periods=steps, freq="D"
        )
        X = self._design(idx, model["t0"])
        pred = np.expm1(X @ model["beta"]).clip(min=0.0)
        return pd.Series(pred, index=idx)


@dataclass
class LogARIMAModel(ForecastModel):
    """Reference SARIMAX grid (arima.py:40-46): p(0-2) d(0-1) q(0-2) ×
    P,D,Q(0-1), m=7, min-AIC. Requires statsmodels."""

    max_p: int = 2
    max_d: int = 1
    max_q: int = 2

    def _sarimax(self):
        try:
            from statsmodels.tsa.statespace.sarimax import SARIMAX
        except ImportError as e:  # pragma: no cover - dep absent here
            raise ImportError(
                "LogARIMAModel requires statsmodels (not installed in this "
                "environment); use LogLinearSeasonalModel or "
                "NaiveLastWeekModel instead"
            ) from e
        return SARIMAX

    def train(self, series: pd.Series, **kwargs: Any) -> Any:  # pragma: no cover
        SARIMAX = self._sarimax()
        if len(series) < MIN_OBSERVATIONS:
            raise ValueError(f"need >= {MIN_OBSERVATIONS} observations")
        y = np.log1p(series.clip(lower=0))
        best, best_aic = None, np.inf
        for p in range(self.max_p + 1):
            for d in range(self.max_d + 1):
                for q in range(self.max_q + 1):
                    for P in (0, 1):
                        for D in (0, 1):
                            for Q in (0, 1):
                                try:
                                    fit = SARIMAX(
                                        y,
                                        order=(p, d, q),
                                        seasonal_order=(P, D, Q, SEASONAL_PERIOD),
                                    ).fit(disp=False)
                                except Exception:
                                    continue
                                if fit.aic < best_aic:
                                    best, best_aic = fit, fit.aic
        if best is None:
            raise ValueError("no SARIMAX configuration converged")
        return best

    def forecast(self, model: Any, steps: int, **kwargs: Any) -> pd.Series:  # pragma: no cover
        pred = model.forecast(steps)
        return np.expm1(pred).clip(lower=0)


# model fns ship to executors inside applyInPandas — serialize by value
from pos_pipeline_core_etl_spark.functions.serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
