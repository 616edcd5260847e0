"""Forecasting queries (SURVEY §2.13) with oracles where SQL-expressible.

- ``forecast_naive_lastweek``: the NaiveLastWeek model expressed as a
  pure relational plan (same-weekday lookback join + rank) — fully
  oracle-checked.
- ``forecast_deposit_schedule``: banking-calendar deposit rollup —
  oracle-checked.
- ``forecast_loglinear``: the LogLinearSeasonal OLS fit in closed form
  (Frisch–Waugh decomposition) — hash-oracled; the applyInPandas/numpy
  deployment path is asserted equivalent in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.forecasting.deposit import (
    CARD_DEPOSIT_SQL,
    CASH_DEPOSIT_SQL,
    build_deposit_schedule,
)
from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.operators import qa
from pos_pipeline_core_etl_spark.plans.marts import PAYMENTS_DAILY_MART_SQL, payments_daily_mart

_MART_CTE = f"WITH mart AS ({PAYMENTS_DAILY_MART_SQL})"
_IT = "(" + " + ".join(qa.INGRESO_COLS) + ")"

NAIVE_MAX_WEEKS = 52  # reference naive.py:22 (max_weeks_back)
HORIZON = 7


def forecast_naive_lastweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per branch: next 7 days = value at the *equivalent historical
    weekday* (reference naive.py:19-180): the first same-weekday candidate
    ≤ last observed date that is not a holiday or holiday-adjacent,
    walking back ≤ 52 weeks. The candidate is chosen WITHOUT looking at
    the data; a missing date yields 0.

    Scale shape: candidates/horizon/holidays are dimension-sized (branches
    × 7 × 52 rows) and broadcast; ``daily`` — the only data-sized leg —
    is touched once by an equi-join.
    """
    # day-grain frame (tiny at any corpus scale) persisted: it feeds four
    # different subtrees (daily values, holiday set, last-date agg, value
    # lookup) whose prunings differ, so exchange reuse can't kick in —
    # without the persist the whole mart (fact scans included) recomputes
    # per subtree (same rationale as deposit_cash_flow below)
    base = payments_daily_mart(spark, sf_dir).select(
        "sucursal",
        "fecha",
        hround(qa.ingreso_total_col(), 2).alias("it"),
        "is_national_holiday",
    ).persist()
    daily = base.select("sucursal", "fecha", "it")
    # holiday set → blocked dates (holiday ± 1), reference deposit_schedule.py:15-28
    blocked = (
        base.where(F.col("is_national_holiday"))
        .select(F.col("fecha").alias("h_fecha"))
        .distinct()
        .select(
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"), "h_fecha"
        )
        .select(F.expr("date_add(h_fecha, off)").alias("b_fecha"))
        .distinct()
    )
    last = daily.groupBy("sucursal").agg(F.max("fecha").alias("last_fecha"))
    horizon = last.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "last_fecha",
    ).select(
        "sucursal", "h", "last_fecha", F.expr("date_add(last_fecha, h)").alias("target_fecha")
    )
    cand = horizon.select(
        "sucursal",
        "h",
        "target_fecha",
        "last_fecha",
        F.explode(F.sequence(F.lit(1), F.lit(NAIVE_MAX_WEEKS))).alias("w"),
    ).withColumn("cand_fecha", F.expr("date_sub(target_fecha, 7 * w)"))
    eligible = cand.where(F.col("cand_fecha") <= F.col("last_fecha")).join(
        F.broadcast(blocked), cand.cand_fecha == blocked.b_fecha, "left_anti"
    )
    # min w ⇔ max candidate date (candidates step back 7 days per week)
    eq = eligible.groupBy("sucursal", "h", "target_fecha").agg(
        F.max("cand_fecha").alias("src_fecha")
    )
    return (
        horizon.join(eq, ["sucursal", "h", "target_fecha"], "left")
        .join(
            daily.select(
                F.col("sucursal").alias("d_suc"),
                F.col("fecha").alias("d_fecha"),
                "it",
            ),
            (F.col("sucursal") == F.col("d_suc"))
            & (F.col("src_fecha") == F.col("d_fecha")),
            "left",
        )
        .select(
            "sucursal",
            F.col("h").cast("long").alias("h"),
            "target_fecha",
            F.coalesce(F.col("it"), F.lit(0.0)).alias("valor"),
        )
    )


FORECAST_NAIVE_LASTWEEK_SQL = f"""
{_MART_CTE},
daily AS (SELECT sucursal, fecha, {hround_sql(_IT, 2)} AS it FROM mart),
blocked AS (
  SELECT DISTINCT fecha + CAST(u.off AS INT) AS b_fecha
  FROM (SELECT DISTINCT fecha FROM mart WHERE is_national_holiday) hol,
       LATERAL (SELECT unnest([-1, 0, 1]) AS off) u
),
last AS (SELECT sucursal, MAX(fecha) AS last_fecha FROM daily GROUP BY sucursal),
horizon AS (
  SELECT l.sucursal, u.h, l.last_fecha,
         l.last_fecha + CAST(u.h AS INT) AS target_fecha
  FROM last l, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
eligible AS (
  SELECT hz.sucursal, hz.h, hz.target_fecha,
         hz.target_fecha - CAST(7 * u.w AS INT) AS cand_fecha
  FROM horizon hz, LATERAL (SELECT unnest(generate_series(1, {NAIVE_MAX_WEEKS})) AS w) u
  WHERE hz.target_fecha - CAST(7 * u.w AS INT) <= hz.last_fecha
    AND NOT EXISTS (SELECT 1 FROM blocked b
                    WHERE b.b_fecha = hz.target_fecha - CAST(7 * u.w AS INT))
),
eq AS (
  SELECT sucursal, h, target_fecha, MAX(cand_fecha) AS src_fecha
  FROM eligible GROUP BY sucursal, h, target_fecha
)
SELECT hz.sucursal, hz.h, hz.target_fecha, COALESCE(d.it, 0.0) AS valor
FROM horizon hz
LEFT JOIN eq ON eq.sucursal = hz.sucursal AND eq.h = hz.h
            AND eq.target_fecha = hz.target_fecha
LEFT JOIN daily d ON d.sucursal = hz.sucursal AND d.fecha = eq.src_fecha
"""


def forecast_deposit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_deposit_schedule(payments_daily_mart(spark, sf_dir))


_CASH = CASH_DEPOSIT_SQL.format(d="fecha")
_CARD = CARD_DEPOSIT_SQL.format(d="fecha")

FORECAST_DEPOSIT_SCHEDULE_SQL = f"""
{_MART_CTE},
legs AS (
  SELECT CAST(({_CASH}) AS DATE) AS fecha_deposito,
         ingreso_efectivo AS efectivo, 0.0 AS tarjetas
  FROM mart
  UNION ALL
  SELECT CAST(({_CARD}) AS DATE) AS fecha_deposito,
         0.0 AS efectivo, (ingreso_credito + ingreso_debito) AS tarjetas
  FROM mart
),
agg AS (
  SELECT fecha_deposito,
         {hround_sql("SUM(efectivo)", 2)} AS efectivo,
         {hround_sql("SUM(tarjetas)", 2)} AS tarjetas
  FROM legs GROUP BY fecha_deposito
)
SELECT *, {hround_sql("efectivo + tarjetas", 2)} AS total FROM agg
"""


def deposit_cash_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cash-flow deposits over a historical + forecast blend
    (reference ``forecasting/cash_flow.py:19-85``).

    The forecast leg here is the strict t−7 naive (next 7 days per
    branch = same weekday last week, else 0) so the whole blend stays
    SQL-expressible; ``run_payments_forecast`` output plugs into
    :func:`cash_flow_deposits` identically.

    ``hist`` (day grain — tiny at any corpus scale) is persisted: it is
    referenced three times (last-date agg, forecast join side, blend
    union) with different column prunings, so the subtrees are not
    identical and exchange reuse cannot kick in — without the persist
    the whole mart (fact scans included) is computed three times.
    """
    from pos_pipeline_core_etl_spark.forecasting.deposit import cash_flow_deposits

    mart = payments_daily_mart(spark, sf_dir)
    hist = mart.select(
        "sucursal",
        "fecha",
        F.col("ingreso_efectivo").alias("efectivo"),
        F.col("ingreso_credito").alias("credito"),
        F.col("ingreso_debito").alias("debito"),
    ).persist()
    last = hist.groupBy("sucursal").agg(F.max("fecha").alias("last_fecha"))
    horizon = last.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "last_fecha",
    ).select("sucursal", F.expr("date_add(last_fecha, h)").alias("fecha"))
    fc = horizon.join(
        hist.select(
            F.col("sucursal").alias("s2"),
            F.col("fecha").alias("f2"),
            "efectivo",
            "credito",
            "debito",
        ),
        (F.col("sucursal") == F.col("s2"))
        & (F.col("f2") == F.date_sub(F.col("fecha"), 7)),
        "left",
    ).select(
        "sucursal",
        "fecha",
        F.coalesce("efectivo", F.lit(0.0)).alias("efectivo"),
        F.coalesce("credito", F.lit(0.0)).alias("credito"),
        F.coalesce("debito", F.lit(0.0)).alias("debito"),
    )
    return cash_flow_deposits(hist.unionByName(fc))


DEPOSIT_CASH_FLOW_SQL = f"""
{_MART_CTE},
hist AS (
  SELECT sucursal, fecha, ingreso_efectivo AS efectivo,
         ingreso_credito AS credito, ingreso_debito AS debito
  FROM mart
),
last AS (SELECT sucursal, MAX(fecha) AS last_fecha FROM hist GROUP BY sucursal),
horizon AS (
  SELECT l.sucursal, l.last_fecha + CAST(u.h AS INT) AS fecha
  FROM last l, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
fc AS (
  SELECT h.sucursal, h.fecha,
         COALESCE(d.efectivo, 0.0) AS efectivo,
         COALESCE(d.credito, 0.0) AS credito,
         COALESCE(d.debito, 0.0) AS debito
  FROM horizon h
  LEFT JOIN hist d ON d.sucursal = h.sucursal AND d.fecha = h.fecha - 7
),
blended AS (SELECT * FROM hist UNION ALL SELECT * FROM fc),
legs AS (
  SELECT CAST(({_CASH}) AS DATE) AS fecha_deposito,
         efectivo, 0.0 AS credito, 0.0 AS debito
  FROM blended
  UNION ALL
  SELECT CAST(({_CARD}) AS DATE) AS fecha_deposito,
         0.0 AS efectivo, credito, debito
  FROM blended
),
agg AS (
  SELECT fecha_deposito,
         {hround_sql("SUM(efectivo)", 2)} AS efectivo,
         {hround_sql("SUM(credito)", 2)} AS credito,
         {hround_sql("SUM(debito)", 2)} AS debito
  FROM legs GROUP BY fecha_deposito
)
SELECT *, {hround_sql("efectivo + credito + debito", 2)} AS total FROM agg
"""


def forecast_loglinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogLinearSeasonal fit expressed in closed form (VERDICT r1 item 2).

    The model is OLS of log1p(valor) on [intercept, trend, day-of-week
    dummies]. Because the dummy block saturates per-dow means, the fit
    decomposes exactly (Frisch–Waugh): shared slope β over per-dow
    demeaned (t, y), per-dow intercepts μ_d = ȳ_d − β·t̄_d — plain
    group-bys and sums, identical in SQL. ``applyInPandas`` + numpy
    remains the deployment path (``forecasting/api.py``, exercised in
    tests incl. equivalence to this closed form); this query IS the
    hash-oracle twin.

    Steps mirror ``api.run_payments_forecast``: melt metrics → calendar
    zero-fill per series → skip series with <30 non-zero obs → fit →
    7-day horizon, expm1 clipped at 0.
    """
    return loglinear_forecast_relational(payments_daily_mart(spark, sf_dir))


def loglinear_forecast_relational(mart: DataFrame) -> DataFrame:
    """The closed-form fit over an arbitrary payments mart frame (see
    :func:`forecast_loglinear`); equivalence to the numpy/applyInPandas
    model is asserted in ``tests/test_forecasting.py``."""
    from pos_pipeline_core_etl_spark.forecasting.api import DEFAULT_METRICS, _melt_metrics
    from pos_pipeline_core_etl_spark.forecasting.models import MIN_OBSERVATIONS

    # melted day-grain series (branches × metrics × days — dimension-
    # sized) persisted: referenced by bounds, the calendar join, and the
    # fit subtrees with different prunings (see forecast_naive_lastweek)
    long_df = _melt_metrics(mart, DEFAULT_METRICS).persist()
    bounds = long_df.groupBy("sucursal", "metric").agg(
        F.min("fecha").alias("d0"),
        F.max("fecha").alias("d1"),
        F.sum(F.when(F.col("valor") != 0, 1).otherwise(0)).alias("nz"),
    )
    eligible = bounds.where(F.col("nz") >= MIN_OBSERVATIONS).select(
        "sucursal", "metric", "d0", "d1"
    )
    cal = eligible.select(
        "sucursal", "metric", "d0", "d1",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("fecha"),
    )
    feat = (
        cal.join(long_df, ["sucursal", "metric", "fecha"], "left")
        .select(
            "sucursal", "metric", "d0", "d1", "fecha",
            F.log1p(F.greatest(F.coalesce("valor", F.lit(0.0)), F.lit(0.0))).alias("y"),
            (F.datediff("fecha", "d0") / F.lit(365.0)).alias("t"),
            F.dayofweek("fecha").alias("dw"),
        )
        .persist()  # read twice: per-dow means and the slope numerator
    )
    dowm = feat.groupBy("sucursal", "metric", "dw").agg(
        F.avg("y").alias("ybar"), F.avg("t").alias("tbar")
    )
    slope = (
        feat.join(dowm, ["sucursal", "metric", "dw"])
        .groupBy("sucursal", "metric")
        .agg(
            (
                F.sum((F.col("y") - F.col("ybar")) * (F.col("t") - F.col("tbar")))
                / F.sum((F.col("t") - F.col("tbar")) * (F.col("t") - F.col("tbar")))
            ).alias("beta")
        )
    )
    mu = dowm.join(slope, ["sucursal", "metric"]).select(
        "sucursal", "metric", "dw",
        (F.col("ybar") - F.col("beta") * F.col("tbar")).alias("mu"),
        "beta",
    )
    hz = eligible.select(
        "sucursal", "metric", "d0",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "d1",
    ).select(
        "sucursal", "metric", "d0",
        F.expr("date_add(d1, h)").alias("fecha"),
    ).withColumn("t", F.datediff("fecha", "d0") / F.lit(365.0)).withColumn(
        "dw", F.dayofweek("fecha")
    )
    return hz.join(mu, ["sucursal", "metric", "dw"]).select(
        "sucursal",
        "metric",
        "fecha",
        hround(
            F.greatest(F.expm1(F.col("mu") + F.col("beta") * F.col("t")), F.lit(0.0)),
            4,
        ).alias("valor"),
    )


def _loglinear_oracle() -> str:
    from pos_pipeline_core_etl_spark.forecasting.api import DEFAULT_METRICS
    from pos_pipeline_core_etl_spark.forecasting.models import MIN_OBSERVATIONS

    legs = []
    for m in DEFAULT_METRICS:
        expr = _IT if m == "ingreso_total" else m
        legs.append(
            f"SELECT sucursal, fecha, '{m}' AS metric, {expr} AS valor FROM mart"
        )
    melt = "\n  UNION ALL\n  ".join(legs)
    return f"""
{_MART_CTE},
long AS (
  {melt}
),
bounds AS (
  SELECT sucursal, metric, MIN(fecha) AS d0, MAX(fecha) AS d1,
         COUNT(*) FILTER (WHERE valor != 0) AS nz
  FROM long GROUP BY sucursal, metric
),
eligible AS (SELECT sucursal, metric, d0, d1 FROM bounds WHERE nz >= {MIN_OBSERVATIONS}),
cal AS (
  SELECT e.sucursal, e.metric, e.d0, e.d1, CAST(u.d AS DATE) AS fecha
  FROM eligible e,
       LATERAL (SELECT unnest(generate_series(CAST(e.d0 AS TIMESTAMP),
                                              CAST(e.d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS d) u
),
feat AS (
  SELECT c.sucursal, c.metric, c.d0, c.d1, c.fecha,
         ln(1 + GREATEST(COALESCE(l.valor, 0.0), 0.0)) AS y,
         (c.fecha - c.d0) / 365.0 AS t,
         dayofweek(c.fecha) AS dw
  FROM cal c LEFT JOIN long l
    ON l.sucursal = c.sucursal AND l.metric = c.metric AND l.fecha = c.fecha
),
dowm AS (
  SELECT sucursal, metric, dw, AVG(y) AS ybar, AVG(t) AS tbar
  FROM feat GROUP BY sucursal, metric, dw
),
slope AS (
  SELECT f.sucursal, f.metric,
         SUM((f.y - m.ybar) * (f.t - m.tbar))
           / SUM((f.t - m.tbar) * (f.t - m.tbar)) AS beta
  FROM feat f
  JOIN dowm m ON m.sucursal = f.sucursal AND m.metric = f.metric AND m.dw = f.dw
  GROUP BY f.sucursal, f.metric
),
mu AS (
  SELECT m.sucursal, m.metric, m.dw, m.ybar - s.beta * m.tbar AS mu, s.beta
  FROM dowm m JOIN slope s ON s.sucursal = m.sucursal AND s.metric = m.metric
),
hz AS (
  SELECT e.sucursal, e.metric, e.d0, e.d1 + CAST(u.h AS INT) AS fecha
  FROM eligible e, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
)
SELECT hz.sucursal, hz.metric, hz.fecha,
       {hround_sql("GREATEST(exp(mu.mu + mu.beta * ((hz.fecha - hz.d0) / 365.0)) - 1, 0.0)", 4)} AS valor
FROM hz
JOIN mu ON mu.sucursal = hz.sucursal AND mu.metric = hz.metric
       AND mu.dw = dayofweek(hz.fecha)
"""


FORECAST_LOGLINEAR_SQL = _loglinear_oracle()


QUERIES: dict[str, tuple] = {
    "forecast_naive_lastweek": (forecast_naive_lastweek, FORECAST_NAIVE_LASTWEEK_SQL),
    "forecast_deposit_schedule": (
        forecast_deposit_schedule,
        FORECAST_DEPOSIT_SCHEDULE_SQL,
    ),
    "deposit_cash_flow": (deposit_cash_flow, DEPOSIT_CASH_FLOW_SQL),
    "forecast_loglinear": (forecast_loglinear, FORECAST_LOGLINEAR_SQL),
}


def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the NaiveLastWeek rule: hold out each
    branch's LAST 7 observed days, forecast them from the remaining
    history with the same equivalent-weekday candidate walk (candidates
    ≤ the holdout cutoff), then score per branch — n_eval (days with
    positive actuals), MAPE and MAE. The model-eval loop a forecasting
    deployment runs before promoting a model; same dimension-sized
    plumbing as forecast_naive_lastweek, plus one actuals equi-join and
    a per-branch agg."""
    base = payments_daily_mart(spark, sf_dir).select(
        "sucursal",
        "fecha",
        hround(qa.ingreso_total_col(), 2).alias("it"),
        "is_national_holiday",
    ).persist()
    daily = base.select("sucursal", "fecha", "it")
    blocked = (
        base.where(F.col("is_national_holiday"))
        .select(F.col("fecha").alias("h_fecha"))
        .distinct()
        .select(
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"), "h_fecha"
        )
        .select(F.expr("date_add(h_fecha, off)").alias("b_fecha"))
        .distinct()
    )
    cut = daily.groupBy("sucursal").agg(
        F.expr("date_sub(max(fecha), 7)").alias("cutoff")
    )
    horizon = cut.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "cutoff",
    ).select(
        "sucursal", "h", "cutoff", F.expr("date_add(cutoff, h)").alias("target_fecha")
    )
    cand = horizon.select(
        "sucursal",
        "h",
        "target_fecha",
        "cutoff",
        F.explode(F.sequence(F.lit(1), F.lit(NAIVE_MAX_WEEKS))).alias("w"),
    ).withColumn("cand_fecha", F.expr("date_sub(target_fecha, 7 * w)"))
    eligible = cand.where(F.col("cand_fecha") <= F.col("cutoff")).join(
        F.broadcast(blocked), cand.cand_fecha == blocked.b_fecha, "left_anti"
    )
    eq = eligible.groupBy("sucursal", "h", "target_fecha").agg(
        F.max("cand_fecha").alias("src_fecha")
    )
    fc = (
        horizon.join(eq, ["sucursal", "h", "target_fecha"], "left")
        .join(
            daily.select(
                F.col("sucursal").alias("d_suc"),
                F.col("fecha").alias("d_fecha"),
                F.col("it").alias("f_it"),
            ),
            (F.col("sucursal") == F.col("d_suc"))
            & (F.col("src_fecha") == F.col("d_fecha")),
            "left",
        )
        .select(
            "sucursal",
            "target_fecha",
            F.coalesce(F.col("f_it"), F.lit(0.0)).alias("forecast"),
        )
    )
    actual = daily.select(
        F.col("sucursal").alias("a_suc"),
        F.col("fecha").alias("a_fecha"),
        F.col("it").alias("actual"),
    )
    scored = fc.join(
        actual,
        (F.col("sucursal") == F.col("a_suc"))
        & (F.col("target_fecha") == F.col("a_fecha")),
    ).where(F.col("actual") > 0)
    # order-free aggregation: per-row terms quantized to integers so the
    # group sums are exact regardless of partial-agg order (forecast and
    # actual are hround2 values, identical in both engines; the division
    # and floor are then bit-identical per row)
    diff_cents = F.floor(
        F.abs(F.col("forecast") - F.col("actual")) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    ape_q = F.floor(
        (F.abs(F.col("forecast") - F.col("actual")) / F.col("actual"))
        * F.lit(1.0e9)
        + F.lit(0.5)
    ).cast("long")
    return (
        scored.groupBy("sucursal")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            hround(F.sum(ape_q) / (F.count(F.lit(1)) * F.lit(1.0e9)), 6).alias(
                "mape"
            ),
            hround(
                F.sum(diff_cents) / (F.count(F.lit(1)) * F.lit(100.0)), 2
            ).alias("mae"),
        )
        .orderBy("sucursal")
    )


FORECAST_BACKTEST_NAIVE_SQL = f"""
{_MART_CTE},
daily AS (SELECT sucursal, fecha, {hround_sql(_IT, 2)} AS it FROM mart),
blocked AS (
  SELECT DISTINCT fecha + CAST(u.off AS INT) AS b_fecha
  FROM (SELECT DISTINCT fecha FROM mart WHERE is_national_holiday) hol,
       LATERAL (SELECT unnest([-1, 0, 1]) AS off) u
),
cut AS (SELECT sucursal, MAX(fecha) - 7 AS cutoff FROM daily GROUP BY sucursal),
horizon AS (
  SELECT c.sucursal, u.h, c.cutoff,
         c.cutoff + CAST(u.h AS INT) AS target_fecha
  FROM cut c, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
eligible AS (
  SELECT hz.sucursal, hz.h, hz.target_fecha,
         hz.target_fecha - CAST(7 * u.w AS INT) AS cand_fecha
  FROM horizon hz, LATERAL (SELECT unnest(generate_series(1, {NAIVE_MAX_WEEKS})) AS w) u
  WHERE hz.target_fecha - CAST(7 * u.w AS INT) <= hz.cutoff
    AND NOT EXISTS (SELECT 1 FROM blocked b
                    WHERE b.b_fecha = hz.target_fecha - CAST(7 * u.w AS INT))
),
eq AS (
  SELECT sucursal, h, target_fecha, MAX(cand_fecha) AS src_fecha
  FROM eligible GROUP BY sucursal, h, target_fecha
),
fc AS (
  SELECT hz.sucursal, hz.target_fecha, COALESCE(d.it, 0.0) AS forecast
  FROM horizon hz
  LEFT JOIN eq ON eq.sucursal = hz.sucursal AND eq.h = hz.h
              AND eq.target_fecha = hz.target_fecha
  LEFT JOIN daily d ON d.sucursal = hz.sucursal AND d.fecha = eq.src_fecha
),
scored AS (
  SELECT f.sucursal, f.forecast, a.it AS actual
  FROM fc f JOIN daily a ON a.sucursal = f.sucursal
                         AND a.fecha = f.target_fecha
  WHERE a.it > 0
)
SELECT sucursal,
       CAST(count(*) AS BIGINT) AS n_eval,
       {hround_sql(
           "sum(CAST(floor(abs(forecast - actual) / actual * 1000000000.0"
           " + 0.5) AS BIGINT)) / (count(*) * 1000000000.0)", 6)} AS mape,
       {hround_sql(
           "sum(CAST(floor(abs(forecast - actual) * 100.0 + 0.5) AS BIGINT))"
           " / (count(*) * 100.0)", 2)} AS mae
FROM scored
GROUP BY sucursal
ORDER BY sucursal
"""

QUERIES["forecast_backtest_naive"] = (
    forecast_backtest_naive,
    FORECAST_BACKTEST_NAIVE_SQL,
)
