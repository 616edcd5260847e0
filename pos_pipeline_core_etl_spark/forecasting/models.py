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
  AIC grid search.  Backend: statsmodels SARIMAX when installed, else a
  Hannan–Rissanen CSS scan of the grid with an exact Kalman-filter MLE
  refit of the min-AIC winner (``forecasting/kalman.py``).
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


def _difference_chain(
    values: np.ndarray, d: int, D: int, m: int
) -> tuple[np.ndarray, list[float], list[np.ndarray]]:
    """Apply (1-B)^d (1-B^m)^D keeping the histories needed to invert."""
    reg_tails: list[float] = []
    w = values
    for _ in range(d):
        reg_tails.append(w[-1])
        w = np.diff(w)
    seas_histories: list[np.ndarray] = []
    for _ in range(D):
        seas_histories.append(w.copy())
        w = w[m:] - w[:-m]
    return w, reg_tails, seas_histories


def _invert_differencing(
    fut: np.ndarray, reg_tails: list[float], seas_histories: list[np.ndarray], m: int
) -> np.ndarray:
    """Undo :func:`_difference_chain` for a forecast path (innermost first)."""
    for hist in reversed(seas_histories):
        buf = list(hist)
        for v in fut:
            buf.append(v + buf[-m])
        fut = np.array(buf[len(hist):])
    for tail in reversed(reg_tails):
        fut = tail + np.cumsum(fut)
    return fut


class _HannanRissanenFit:
    """Pure-numpy SARIMA estimation via the Hannan–Rissanen two-stage
    method (long-AR residual proxy → OLS with AR/MA/seasonal lags) under
    a conditional-sum-of-squares Gaussian AIC.

    Public-knowledge fallback backend so the reference's 144-point grid
    (arima.py:118-141) is executable where statsmodels is unavailable:
    the grid mechanics — per-order fit, min-AIC pick, log-space forecast
    with expm1-clip — run for real; the per-order coefficients are the
    HR/CSS approximation of the SARIMAX MLE, not numerically identical
    to it.
    """

    def __init__(self, y: pd.Series, order, seasonal_order):
        p, d, q = order
        P, D, Q, m = seasonal_order
        self.order = tuple(order)
        self.seasonal_order = tuple(seasonal_order)
        self._index_last = y.index[-1]
        values = np.asarray(y, dtype=float)

        # differencing chain (1-B)^d (1-B^m)^D, histories kept to invert
        w, self._reg_tails, self._seas_histories = _difference_chain(values, d, D, m)
        self._w_hist = w.copy()
        self._m = m
        self._order = (p, d, q)
        self._seasonal = (P, D, Q)

        ar_lags = list(range(1, p + 1)) + [m * j for j in range(1, P + 1)]
        ma_lags = list(range(1, q + 1)) + [m * j for j in range(1, Q + 1)]
        self._ar_lags, self._ma_lags = ar_lags, ma_lags
        k = len(ar_lags) + len(ma_lags)
        start = max([0, *ar_lags, *ma_lags])
        n_eff = len(w) - start
        if n_eff < k + 5:
            raise ValueError("series too short for this order after differencing")

        # stage 1: long-AR residuals as the innovation proxy
        if ma_lags:
            L = min(max(10, 2 * (p + q + m * (P + Q))), max(1, (len(w) - 1) // 2))
            eps = self._long_ar_residuals(w, L)
        else:
            eps = np.zeros_like(w)

        # stage 2: OLS of w_t on its AR lags and residual MA lags
        if k:
            X = np.empty((n_eff, k))
            for j, lag in enumerate(ar_lags):
                X[:, j] = w[start - lag : len(w) - lag]
            for j, lag in enumerate(ma_lags):
                X[:, len(ar_lags) + j] = eps[start - lag : len(w) - lag]
            target = w[start:]
            beta, *_ = np.linalg.lstsq(X, target, rcond=None)
            resid = target - X @ beta
        else:
            beta = np.zeros(0)
            resid = w[start:]
        self._beta = beta
        rss = float(resid @ resid)
        sigma2 = max(rss / n_eff, 1e-300)
        self.aic = n_eff * np.log(sigma2) + 2 * (k + 1)

        # keep in-sample innovations aligned with w for the MA recursion
        self._eps_hist = np.zeros_like(w)
        self._eps_hist[start:] = resid

    @staticmethod
    def _long_ar_residuals(w: np.ndarray, L: int) -> np.ndarray:
        X = np.empty((len(w) - L, L))
        for j in range(1, L + 1):
            X[:, j - 1] = w[L - j : len(w) - j]
        phi, *_ = np.linalg.lstsq(X, w[L:], rcond=None)
        eps = np.zeros_like(w)
        eps[L:] = w[L:] - X @ phi
        return eps

    def forecast(self, steps: int) -> pd.Series:
        p, d, q = self._order
        P, D, Q = self._seasonal
        m = self._m
        w = list(self._w_hist)
        eps = list(self._eps_hist)
        n_ar = len(self._ar_lags)
        for _ in range(steps):
            t = len(w)
            val = 0.0
            for j, lag in enumerate(self._ar_lags):
                val += self._beta[j] * (w[t - lag] if t - lag >= 0 else 0.0)
            for j, lag in enumerate(self._ma_lags):
                src = t - lag
                val += self._beta[n_ar + j] * (eps[src] if 0 <= src < len(self._eps_hist) else 0.0)
            w.append(val)
            eps.append(0.0)
        fut = np.array(w[len(self._w_hist):])
        fut = _invert_differencing(fut, self._reg_tails, self._seas_histories, m)
        idx = pd.date_range(
            self._index_last + pd.Timedelta(days=1), periods=steps, freq="D"
        )
        return pd.Series(fut, index=idx)


class _KalmanExactMLEFit:
    """Exact Gaussian MLE for one SARIMA order via the Kalman filter.

    The statsmodels-free equivalent of the reference's SARIMAX fit
    (arima.py:118-141): maximize the exact prediction-error-decomposition
    likelihood of the multiplicative SARIMA ARMA component on the
    (simply) differenced series, approximate-diffuse init, scale
    concentrated out (see :mod:`..forecasting.kalman`).  Unlike
    :class:`_HannanRissanenFit` — a two-stage CSS *approximation* used
    to scan the 144-order grid cheaply — this is the genuine MLE, used
    to refit the grid winner (``LogARIMAModel(backend="hr+mle")``).
    """

    def __init__(self, y: pd.Series, order, seasonal_order, start_params=None):
        from pos_pipeline_core_etl_spark.forecasting import kalman as K

        p, d, q = order
        P, D, Q, m = seasonal_order
        self.order = tuple(order)
        self.seasonal_order = tuple(seasonal_order)
        self._index_last = y.index[-1]
        values = np.asarray(y, dtype=float)
        w, self._reg_tails, self._seas_histories = _difference_chain(values, d, D, m)
        self._w = w.astype(float)
        self._m = m
        self._shape = (p, q, P, Q)
        k = p + q + P + Q
        if len(w) < k + 5:
            raise ValueError("series too short for this order after differencing")
        # SARIMAX burn convention (loglikelihood_burn = k_states under
        # approximate-diffuse init): exclude the first state-dim
        # prediction errors (F ≈ kappa) from the concentrated llf, else
        # cross-order AIC comparisons are biased toward low-dimensional
        # orders (ADVICE r4). State dim = max(len(phi_full),
        # len(theta_full)+1, 1) per harvey_matrices.
        burn = max(p + m * P, q + m * Q + 1, 1)
        if len(w) - burn < 5:
            raise ValueError("series too short for this order after burn-in")

        def unpack(x: np.ndarray):
            return (
                x[:p],
                x[p : p + P],
                x[p + P : p + P + q],
                x[p + P + q :],
            )

        def neg_llf(x: np.ndarray) -> float:
            if np.any(np.abs(x) > 50.0):
                return 1e12
            phi_full, theta_full = K.sarima_polys(*unpack(x), m)
            llf, _, _, _ = K.kalman_loglike(w, phi_full, theta_full, burn=burn)
            return 1e12 if not np.isfinite(llf) else -llf

        x0 = np.zeros(k) if start_params is None else np.asarray(start_params, float)
        if len(x0) != k:
            x0 = np.zeros(k)
        x_best, f_best = K.nelder_mead(neg_llf, x0)
        if not np.isfinite(f_best) or f_best >= 1e12:
            raise ValueError("exact-MLE likelihood did not evaluate finitely")
        self.params = x_best
        phi_full, theta_full = K.sarima_polys(*unpack(x_best), m)
        llf, sigma2, a_pred, T = K.kalman_loglike(w, phi_full, theta_full, burn=burn)
        self.llf = llf
        self.sigma2 = sigma2
        self._a_pred, self._T = a_pred, T
        self.aic = -2.0 * llf + 2.0 * (k + 1)

    def forecast(self, steps: int) -> pd.Series:
        from pos_pipeline_core_etl_spark.forecasting import kalman as K

        fut = K.kalman_forecast(self._a_pred, self._T, steps)
        fut = _invert_differencing(fut, self._reg_tails, self._seas_histories, self._m)
        idx = pd.date_range(
            self._index_last + pd.Timedelta(days=1), periods=steps, freq="D"
        )
        return pd.Series(fut, index=idx)


class _KalmanStateDiffFit:
    """Exact SARIMA MLE with differencing carried IN THE STATE.

    The ``SARIMAX(simple_differencing=False)`` representation —
    statsmodels' DEFAULT, hence the reference's effective configuration
    (``/root/reference/src/pos_core/forecasting/models/arima.py:118-141``
    passes no ``simple_differencing``): instead of differencing the data
    and fitting the ARMA component (:class:`_KalmanExactMLEFit`), the
    filter runs on the RAW series with ``d + m*D`` integration states
    augmenting the ARMA block (:func:`kalman.augmented_matrices`).  The
    two representations imply the same Gaussian law for the
    differenced tail; they differ only in how the first ``d + m*D``
    observations enter the likelihood — the one structural delta
    VERDICT r5 #7 asked to close.  Forecasts come straight off the
    augmented state (``Z T^h a_pred``), no inversion chain.

    Burn convention: the whole augmented state is approximate-diffuse,
    so ``loglikelihood_burn`` = full state dim (integration states +
    ARMA companion dim), the same "exclude F ≈ kappa errors" rule the
    simple-differencing twin applies to its ARMA state.
    """

    def __init__(self, y: pd.Series, order, seasonal_order, start_params=None):
        from pos_pipeline_core_etl_spark.forecasting import kalman as K

        p, d, q = order
        P, D, Q, m = seasonal_order
        self.order = tuple(order)
        self.seasonal_order = tuple(seasonal_order)
        self._index_last = y.index[-1]
        yv = np.asarray(y, dtype=float)
        self._m = m
        self._shape = (p, q, P, Q)
        k = p + q + P + Q
        n_diff = d + m * D
        burn = n_diff + max(p + m * P, q + m * Q + 1, 1)
        if len(yv) - burn < 5:
            raise ValueError("series too short for this order after burn-in")

        def unpack(x: np.ndarray):
            return (
                x[:p],
                x[p : p + P],
                x[p + P : p + P + q],
                x[p + P + q :],
            )

        def matrices(x: np.ndarray):
            phi_full, theta_full = K.sarima_polys(*unpack(x), m)
            return K.augmented_matrices(phi_full, theta_full, d, D, m)

        def neg_llf(x: np.ndarray) -> float:
            if np.any(np.abs(x) > 50.0):
                return 1e12
            Z, T, R = matrices(x)
            llf, _, _, _ = K.kalman_loglike_design(yv, Z, T, R, burn=burn)
            return 1e12 if not np.isfinite(llf) else -llf

        x0 = np.zeros(k) if start_params is None else np.asarray(start_params, float)
        if len(x0) != k:
            x0 = np.zeros(k)
        x_best, f_best = K.nelder_mead(neg_llf, x0)
        if not np.isfinite(f_best) or f_best >= 1e12:
            raise ValueError("exact-MLE likelihood did not evaluate finitely")
        self.params = x_best
        Z, T, R = matrices(x_best)
        llf, sigma2, a_pred, _ = K.kalman_loglike_design(yv, Z, T, R, burn=burn)
        self.llf = llf
        self.sigma2 = sigma2
        self._a_pred, self._Z, self._T = a_pred, Z, T
        self.aic = -2.0 * llf + 2.0 * (k + 1)

    def forecast(self, steps: int) -> pd.Series:
        from pos_pipeline_core_etl_spark.forecasting import kalman as K

        fut = K.kalman_forecast_design(self._a_pred, self._Z, self._T, steps)
        idx = pd.date_range(
            self._index_last + pd.Timedelta(days=1), periods=steps, freq="D"
        )
        return pd.Series(fut, index=idx)


def _hr_start_params(hr: _HannanRissanenFit, order, seasonal_order) -> np.ndarray:
    """Reorder an HR beta into the (phi, Phi, theta, Theta) MLE layout."""
    p, _, q = order
    P, _, Q, _ = seasonal_order
    beta = hr._beta
    n_ar = p + P
    start = np.concatenate(
        [beta[:p], beta[p:n_ar], beta[n_ar : n_ar + q], beta[n_ar + q :]]
    )
    return np.clip(start, -0.98, 0.98)


@dataclass
class LogARIMAModel(ForecastModel):
    """Reference SARIMAX grid (arima.py:40-141): p(0-2) d(0-1) q(0-2) ×
    P,D,Q(0-1), m=7, min-AIC pick, log1p/expm1 transform, forecasts
    clipped at 0. Backend: statsmodels SARIMAX
    (``enforce_stationarity=False, enforce_invertibility=False``, as the
    reference) when installed, else the pure-numpy Hannan–Rissanen CSS
    estimator (:class:`_HannanRissanenFit`) so the grid is executable in
    this environment."""

    max_p: int = 2
    max_d: int = 1
    max_q: int = 2
    #: "hr"      — Hannan–Rissanen CSS everywhere (fast scan, round-3 behavior)
    #: "hr+mle"  — HR scans the 144-order grid, the min-AIC winner is refit by
    #:             exact Kalman MLE seeded from the HR coefficients (default)
    #: "mle"     — exact MLE for every grid point (slow; tests/offline only)
    backend: str = "hr+mle"
    #: hr+mle only: when > 1, the top-N orders of the HR scan are EACH
    #: refit by exact Kalman MLE and the order is re-picked by exact
    #: AIC. Closes the order-selection delta on short/noisy series where
    #: the CSS approximation ranks close orders differently from the
    #: full MLE (COVERAGE §2.13), at N× the refit cost. 1 = refit the
    #: HR winner only (default, round-4 behavior).
    rescore_top_n: int = 1
    #: how the numpy MLE backend handles the (d, D) differencing:
    #: "simple" — difference the data, fit the ARMA component
    #:            (SARIMAX simple_differencing=True; round-4 default,
    #:            keeps every pinned fixture bit-stable)
    #: "state"  — carry the d + m*D integration states in the filter
    #:            (SARIMAX simple_differencing=False, the statsmodels
    #:            DEFAULT and hence the reference's effective config;
    #:            closes the first-(d+mD)-observation delta, VERDICT r5
    #:            #7). Where statsmodels IS installed the SARIMAX path
    #:            already uses its own default, so this knob only
    #:            affects the pure-numpy fallback.
    differencing: str = "simple"

    def _mle_cls(self):
        return _KalmanStateDiffFit if self.differencing == "state" else _KalmanExactMLEFit

    @staticmethod
    def _sarimax_cls():
        try:
            from statsmodels.tsa.statespace.sarimax import SARIMAX
        except ImportError:
            return None
        return SARIMAX

    def _fit_one(self, y: pd.Series, order, seasonal_order):
        SARIMAX = self._sarimax_cls()
        if SARIMAX is not None:  # pragma: no cover - statsmodels absent here
            return SARIMAX(
                y,
                order=order,
                seasonal_order=seasonal_order,
                enforce_stationarity=False,
                enforce_invertibility=False,
            ).fit(disp=False)
        if self.backend == "mle":
            return self._mle_cls()(y, order, seasonal_order)
        return _HannanRissanenFit(y, order, seasonal_order)

    def train(self, series: pd.Series, **kwargs: Any) -> Any:
        if len(series) < MIN_OBSERVATIONS:
            raise ValueError(f"need >= {MIN_OBSERVATIONS} observations")
        clean = (
            series.astype(float).replace([np.inf, -np.inf], np.nan).fillna(0.0)
        )
        y = np.log1p(clean.clip(lower=0))
        fits: list[tuple[float, Any, tuple]] = []
        for p in range(self.max_p + 1):
            for d in range(self.max_d + 1):
                for q in range(self.max_q + 1):
                    for P in (0, 1):
                        for D in (0, 1):
                            for Q in (0, 1):
                                try:
                                    fit = self._fit_one(
                                        y, (p, d, q), (P, D, Q, SEASONAL_PERIOD)
                                    )
                                except Exception:
                                    continue
                                fits.append(
                                    (
                                        float(fit.aic),
                                        fit,
                                        ((p, d, q), (P, D, Q, SEASONAL_PERIOD)),
                                    )
                                )
        if not fits:
            raise ValueError("no SARIMA configuration converged")
        fits.sort(key=lambda t: t[0])
        best = fits[0][1]
        if self.backend == "hr+mle" and isinstance(best, _HannanRissanenFit):
            # exact-MLE polish: refit the top-N HR candidates (N =
            # rescore_top_n) seeded from their CSS coefficients and
            # re-pick the order by EXACT AIC; fall back to the scan
            # winner if every refit fails.
            refits = []
            for _aic, hr_fit, orders in fits[: max(1, self.rescore_top_n)]:
                try:
                    refits.append(
                        self._mle_cls()(
                            y,
                            *orders,
                            start_params=_hr_start_params(hr_fit, *orders),
                        )
                    )
                except Exception:
                    continue
            if refits:
                best = min(refits, key=lambda f: f.aic)
        return best

    def forecast(self, model: Any, steps: int, **kwargs: Any) -> pd.Series:
        pred = model.forecast(steps)
        return np.expm1(pred).clip(lower=0)


# model fns ship to executors inside applyInPandas — serialize by value
from pos_pipeline_core_etl_spark.functions.serde import register_self as _register_self  # noqa: E402

_register_self(__name__)
