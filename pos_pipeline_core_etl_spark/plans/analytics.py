"""Order-times-style analytics + remaining small operators.

Covers the reference's order-times domain shape (per-category latency /
value distributions) and the residual SURVEY §2.2/§2.7 items: null-row
dropping, sorted distinct values, bounded samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.sources.tables import load_table


def _epoch_sec(ts):
    """Epoch seconds (fractional) for TIMESTAMP or TIMESTAMP_NTZ columns.

    NTZ cannot be cast straight to double; routing through timestamp_ltz
    is exact because the session timezone is pinned to UTC.
    """
    return ts.cast("timestamp_ltz").cast("double")


def order_times_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event-type value distribution: exact median / p90 / extremes.

    Exact percentiles (``F.percentile``) shuffle once per group like any
    agg; at 100 TB swap to ``approx_percentile`` for one-pass sketches —
    same call shape, documented tradeoff (see :func:`order_times_approx`).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        hround(F.min("value"), 2).alias("v_min"),
        hround(F.percentile("value", 0.5), 4).alias("v_median"),
        hround(F.percentile("value", 0.9), 4).alias("v_p90"),
        hround(F.max("value"), 2).alias("v_max"),
        hround(F.avg("value"), 4).alias("v_avg"),
    )


APPROX_PCT_REL_TOL = 0.02


def order_times_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: one-pass mergeable sketches
    (``percentile_approx``, accuracy 10000) instead of exact per-group
    sorts.

    Spark's Greenwald-Khanna sketch has no DuckDB twin, so the HASH
    oracle checks the tolerance CONTRACT instead (VERDICT r1): the query
    emits the exact percentiles plus booleans asserting the sketch landed
    within 2% relative error; the oracle reproduces the exact values and
    expects the booleans TRUE. The sketch runs inside the executed plan —
    a sketch regression flips the flags and fails the hash."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("value", 0.5).alias("med_exact"),
        F.percentile("value", 0.9).alias("p90_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("med_approx"),
        F.percentile_approx("value", 0.9, 10000).alias("p90_approx"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.lit(APPROX_PCT_REL_TOL) * F.abs(F.col(e))
    )
    return agg.select(
        "event_type",
        "n",
        hround(F.col("med_exact"), 4).alias("v_median_exact"),
        hround(F.col("p90_exact"), 4).alias("v_p90_exact"),
        within("med_approx", "med_exact").alias("median_within_tol"),
        within("p90_approx", "p90_exact").alias("p90_within_tol"),
    )


ORDER_TIMES_APPROX_SQL = f"""
SELECT event_type,
       COUNT(*) AS n,
       {hround_sql("quantile_cont(value, 0.5)", 4)} AS v_median_exact,
       {hround_sql("quantile_cont(value, 0.9)", 4)} AS v_p90_exact,
       TRUE AS median_within_tol,
       TRUE AS p90_within_tol
FROM events
GROUP BY event_type
"""


ORDER_TIMES_SUMMARY_SQL = f"""
SELECT event_type,
       COUNT(*) AS n,
       {hround_sql("MIN(value)", 2)} AS v_min,
       {hround_sql("quantile_cont(value, 0.5)", 4)} AS v_median,
       {hround_sql("quantile_cont(value, 0.9)", 4)} AS v_p90,
       {hround_sql("MAX(value)", 2)} AS v_max,
       {hround_sql("AVG(value)", 4)} AS v_avg
FROM events
GROUP BY event_type
"""


def user_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap stats (order-times latency analog):
    lag window → gap seconds → per-user summary."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.withColumn(
        "gap_sec",
        # ts arrives as TIMESTAMP_NTZ from tz-naive parquet; NTZ has no direct
        # double cast, so go through timestamp_ltz (session tz is UTC, so the
        # epoch value matches DuckDB's epoch(ts) on the naive value).
        _epoch_sec(F.col("ts")) - F.lag(_epoch_sec(F.col("ts")), 1).over(w),
    ).where(F.col("gap_sec").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        hround(F.avg("gap_sec"), 4).alias("avg_gap_sec"),
        hround(F.max("gap_sec"), 4).alias("max_gap_sec"),
    )


USER_ACTIVITY_GAPS_SQL = f"""
WITH g AS (
  SELECT user_id,
         epoch(ts) - LAG(epoch(ts), 1) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS gap_sec
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       {hround_sql("AVG(gap_sec)", 4)} AS avg_gap_sec,
       {hround_sql("MAX(gap_sec)", 4)} AS max_gap_sec
FROM g WHERE gap_sec IS NOT NULL
GROUP BY user_id
"""


def drop_null_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """na.drop semantics (payments_cleaner.py:470): synthesize sparse
    nulls, drop rows where ALL measure columns are null."""
    orders = load_table(spark, sf_dir, "orders")
    sparse = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.col("o_totalprice")).alias("a"),
        F.when(F.col("o_orderkey") % 4 == 1, F.col("o_totalprice")).alias("b"),
    )
    return sparse.na.drop(how="all", subset=["a", "b"])


DROP_NULL_ROWS_SQL = """
WITH sparse AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice END AS a,
         CASE WHEN o_orderkey % 4 = 1 THEN o_totalprice END AS b
  FROM orders
)
SELECT * FROM sparse WHERE a IS NOT NULL OR b IS NOT NULL
"""


def sorted_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sorted unique dates (sales_by_ticket.py:234 analog)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
        .orderBy("d")
    )


SORTED_DISTINCT_DATES_SQL = """
SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders ORDER BY d
"""


def bounded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bounded sample (qa sample_months analog): hash-based
    selection is reproducible across engines, unlike rand(seed)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
            .cast("long") % 100 < 5
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


BOUNDED_SAMPLE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 5
"""


def branch_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive substring matching + exclusion set
    (transfers/core.py:133-140, CEDIS exclusion analog). The original
    pattern ('an', excluding JAPAN/JORDAN) assumed real TPC-H nation
    names; the synthetic tables use NATION_<n>, so it matched nothing
    at every SF — a standing 0-row green (VERDICT r8 #2). The pattern
    now matches the data ('tion_1' → NATION_1, NATION_10..19) with a
    two-name exclusion set, exercising the same contains + NOT IN
    shape non-vacuously (9 rows at every SF — nation is always 25
    rows)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.where(
        F.lower(F.col("n_name")).contains("tion_1")
        & ~F.col("n_name").isin("NATION_1", "NATION_12")
    ).select("n_nationkey", "n_name")


BRANCH_SUBSTRING_FILTER_SQL = """
SELECT n_nationkey, n_name
FROM nation
WHERE lower(n_name) LIKE '%tion\\_1%' ESCAPE '\\'
  AND n_name NOT IN ('NATION_1', 'NATION_12')
"""


def sql_interface_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same engine through the SQL API: temp views + a SQL string —
    Catalyst produces the identical plan either way (the engine is
    dual-surface, DataFrame and SQL)."""
    from pos_pipeline_core_etl_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem", "supplier", "nation"))
    return spark.sql(
        f"""
        SELECT n.n_name AS nation_name,
               {hround_sql("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


SQL_INTERFACE_REVENUE_SQL = f"""
SELECT n.n_name AS nation_name,
       {hround_sql("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


QUERIES: dict[str, tuple] = {
    "sql_interface_revenue": (sql_interface_revenue, SQL_INTERFACE_REVENUE_SQL),
    "order_times_summary": (order_times_summary, ORDER_TIMES_SUMMARY_SQL),
    "order_times_approx": (order_times_approx, ORDER_TIMES_APPROX_SQL),
    "user_activity_gaps": (user_activity_gaps, USER_ACTIVITY_GAPS_SQL),
    "drop_null_rows": (drop_null_rows, DROP_NULL_ROWS_SQL),
    "sorted_distinct_dates": (sorted_distinct_dates, SORTED_DISTINCT_DATES_SQL),
    "bounded_sample": (bounded_sample, BOUNDED_SAMPLE_SQL),
    "branch_substring_filter": (branch_substring_filter, BRANCH_SUBSTRING_FILTER_SQL),
}


def events_cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB cardinality path: HyperLogLog++ sketches
    (``approx_count_distinct``, rsd 1%) instead of exact per-group
    count-distinct. Same oracle pattern as :func:`order_times_approx`:
    the query emits the exact cardinalities plus a boolean asserting the
    sketch landed within 2%; a sketch regression flips the flag and
    fails the hash."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.approx_count_distinct("user_id", 0.01).alias("users_approx"),
    )
    return agg.select(
        "event_type",
        "users_exact",
        (
            F.abs(F.col("users_approx") - F.col("users_exact"))
            <= F.lit(APPROX_PCT_REL_TOL) * F.col("users_exact")
        ).alias("users_within_tol"),
    )


EVENTS_CARDINALITY_SKETCH_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_exact,
       TRUE AS users_within_tol
FROM events
GROUP BY event_type
"""

QUERIES["events_cardinality_sketch"] = (
    events_cardinality_sketch,
    EVENTS_CARDINALITY_SKETCH_SQL,
)


# ---------------------------------------------------------------------------
# event analytics: as-of attribution, funnel, cohort retention (round 3)


def join_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward AS-OF join (operators/asof.py): each purchase matched to
    the same user's most recent view at-or-before it — unbounded
    lookback, unlike the 10-minute stream-stream attribution window.

    Scale shape: ONE shuffle on user_id (union + window), no range-join
    explosion. Oracle: DuckDB's native ASOF LEFT JOIN over the identical
    tie-broken view set — a real cross-engine check of as-of semantics.
    """
    from pos_pipeline_core_etl_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id")
    )
    # dedupe views per (user, ts) keeping max event_id: equal-ts ties
    # would otherwise make BOTH engines' picks sort-order luck
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("v_ts"))
        .agg(F.max("event_id").alias("view_id"))
    )
    joined = asof_join_backward(
        purchases,
        views,
        on="user_id",
        left_ts="p_ts",
        right_ts="v_ts",
        payload_cols=["view_id", "v_ts"],
        tiebreak_col="view_id",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "view_id",
        hround(
            F.when(
                F.col("v_ts").isNotNull(),
                _epoch_sec(F.col("p_ts")) - _epoch_sec(F.col("v_ts")),
            ),
            2,
        ).alias("gap_sec"),
    )


JOIN_ASOF_PURCHASE_VIEW_SQL = f"""
WITH purchases AS (
  SELECT user_id, ts AS p_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts AS v_ts, MAX(event_id) AS view_id
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
)
SELECT p.purchase_id, p.user_id, v.view_id,
       {hround_sql("epoch(p.p_ts) - epoch(v.v_ts)", 2)} AS gap_sec
FROM purchases p
ASOF LEFT JOIN views v
  ON p.user_id = v.user_id AND v.v_ts <= p.p_ts
"""


FUNNEL_STEPS = ("signup", "view", "click", "purchase")


def events_funnel(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step k when the first
    step-k event AT OR AFTER their step-(k-1) time exists (``>=`` —
    an event at the exact same timestamp as the previous step's time
    DOES count; the tie test in tests/test_scale_ops.py pins this
    against the oracle).

    ``steps`` is the funnel definition — any ordered event-type tuple;
    the SQL twin is generated from the same tuple (``funnel_sql``).

    Spark shape: the step times are chained per-user window minima —
    every window partitions by user_id, so Catalyst plans ONE Exchange
    and stacks the window stages on it; the final count is a tiny agg.
    """
    from pyspark.sql import Window

    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy("user_id")
    df = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    prev = None
    for step in steps:
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("ts") >= F.col(prev))
        col = f"t_{step}"
        df = df.withColumn(col, F.min(F.when(cond, F.col("ts"))).over(w))
        prev = col
    per_user = df.groupBy("user_id").agg(
        *[F.max(f"t_{s}").alias(f"t_{s}") for s in steps]
    )
    counts = per_user.agg(
        *[
            F.count(f"t_{s}").cast("long").alias(f"n_{s}")
            for s in steps
        ]
    )
    step_arr = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("long").alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"n_{s}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(step_arr).alias("s"))
        .select("s.step", "s.event_type", "s.n_users")
    )


def funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS) -> str:
    """DuckDB twin of ``events_funnel``, generated from the SAME steps
    tuple so the two definitions cannot drift."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    ctes = []
    src = "(SELECT user_id, ts, event_type FROM events)"
    prev = None
    for i, s in enumerate(steps):
        cond = f"event_type = '{s}'"
        if prev is not None:
            cond += f" AND ts >= t_{prev}"
        ctes.append(
            f"w{i + 1} AS (\n"
            f"  SELECT *, MIN(CASE WHEN {cond} THEN ts END)\n"
            f"    OVER (PARTITION BY user_id) AS t_{s} FROM {src})"
        )
        src = f"w{i + 1}"
        prev = s
    maxes = ", ".join(f"MAX(t_{s}) AS t_{s}" for s in steps)
    counts = ", ".join(f"COUNT(t_{s}) AS n_{s}" for s in steps)
    values = ",\n    ".join(
        f"(CAST({i + 1} AS BIGINT), '{s}', CAST(n_{s} AS BIGINT))"
        for i, s in enumerate(steps)
    )
    cte_block = ",\n".join(ctes)
    return f"""
WITH {cte_block},
per_user AS (
  SELECT user_id, {maxes}
  FROM {src} GROUP BY user_id
),
counts AS (
  SELECT {counts} FROM per_user
)
SELECT s.step, s.event_type, s.n_users FROM counts,
LATERAL (
  SELECT * FROM (VALUES
    {values}
  ) AS t(step, event_type, n_users)
) s
"""


EVENTS_FUNNEL_SQL = funnel_sql()


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    per week offset they return in. One user-window shuffle + one small
    agg — the cohort matrix shape every growth pipeline computes."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .withColumn("cohort_day", F.min("d").over(w))
    )
    return (
        df.select(
            "user_id",
            # floor, not cast-truncate: DuckDB's // floors, and a cohort_day
            # before 1970-01-01 makes datediff negative (ADVICE r3)
            F.floor(F.datediff(F.col("cohort_day"), F.lit("1970-01-01")) / 7)
            .cast("long")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("cohort_day")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


EVENTS_RETENTION_SQL = """
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
)
SELECT CAST(datediff('day', DATE '1970-01-01', cohort_day) // 7 AS BIGINT) AS cohort_week,
       CAST(datediff('day', cohort_day, d) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM base
GROUP BY 1, 2
"""


QUERIES["join_asof_purchase_view"] = (
    join_asof_purchase_view,
    JOIN_ASOF_PURCHASE_VIEW_SQL,
)
QUERIES["events_funnel"] = (events_funnel, EVENTS_FUNNEL_SQL)
QUERIES["events_retention"] = (events_retention, EVENTS_RETENTION_SQL)


def join_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each view matched to the same user's next
    purchase at-or-after it (conversion latency) — pandas
    ``merge_asof(direction='forward')`` semantics, same single-window
    scale shape as the backward form. Oracle: DuckDB ASOF with the
    inequality reversed."""
    from pos_pipeline_core_etl_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    views = events.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("view_id")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    joined = asof_join_backward(
        views,
        purchases,
        on="user_id",
        left_ts="v_ts",
        right_ts="p_ts",
        payload_cols=["purchase_id", "p_ts"],
        tiebreak_col="purchase_id",
        direction="forward",
    )
    return joined.select(
        "view_id",
        "user_id",
        "purchase_id",
        hround(
            F.when(
                F.col("p_ts").isNotNull(),
                _epoch_sec(F.col("p_ts")) - _epoch_sec(F.col("v_ts")),
            ),
            2,
        ).alias("latency_sec"),
    )


JOIN_ASOF_NEXT_PURCHASE_SQL = f"""
WITH views AS (
  SELECT user_id, ts AS v_ts, event_id AS view_id
  FROM events WHERE event_type = 'view'
),
purchases AS (
  SELECT user_id, ts AS p_ts, MAX(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT v.view_id, v.user_id, p.purchase_id,
       {hround_sql("epoch(p.p_ts) - epoch(v.v_ts)", 2)} AS latency_sec
FROM views v
ASOF LEFT JOIN purchases p
  ON v.user_id = p.user_id AND p.p_ts >= v.v_ts
"""


MAD_THRESHOLD = 3.5  # Iglewicz–Hoaglin modified z-score cutoff
MAD_CONSISTENCY = 0.6745  # Φ⁻¹(0.75): MAD→σ consistency constant


def events_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: the modified z-score (median/MAD) —
    the outlier-resistant twin of qa_zscore_anomalies (one extreme value
    inflates a stddev but not a median). Two grouped exact-percentile
    aggs joined back to the fact; at 100 TB swap ``percentile`` for
    ``percentile_approx`` exactly as order_times_approx demonstrates.

    Degenerate case: a group whose MAD is 0 (≥50% of values equal the
    median) reports NO robust-z anomalies — guarded explicitly in both
    twins (Spark non-ANSI division and DuckDB IEEE division disagree on
    x/0, so the unguarded forms hash-diverge; ADVICE r3). Callers who
    need outliers in near-constant groups should fall back to the mean
    absolute deviation or qa_zscore_anomalies."""
    events = load_table(spark, sf_dir, "events")
    # med/mad are one row per event_type — an enum column of the events
    # schema (single-digit domain), so these forced broadcasts are
    # bounded by the data model, not by corpus size (r12 hint audit);
    # a free-form group key would need the hint dropped, as in
    # sketches.hist_quantiles_grouped
    med = events.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    with_med = events.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad")
    )
    scored = with_med.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        hround(F.col("value"), 2).alias("value"),
        hround(
            F.when(
                F.col("mad") != 0,
                F.lit(MAD_CONSISTENCY)
                * (F.col("value") - F.col("med"))
                / F.col("mad"),
            ),
            6,
        ).alias("robust_z"),
    )
    return scored.where(F.abs(F.col("robust_z")) > MAD_THRESHOLD)


EVENTS_MAD_ANOMALIES_SQL = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
),
scored AS (
  SELECT e.event_id, e.event_type,
         {hround_sql("e.value", 2)} AS value,
         {hround_sql(f"{MAD_CONSISTENCY} * (e.value - m.med) / NULLIF(d.mad, 0)", 6)} AS robust_z
  FROM events e
  JOIN med m USING (event_type)
  JOIN mad d ON d.event_type = e.event_type
)
SELECT * FROM scored WHERE abs(robust_z) > {MAD_THRESHOLD}
"""


QUERIES["join_asof_next_purchase"] = (
    join_asof_next_purchase,
    JOIN_ASOF_NEXT_PURCHASE_SQL,
)
QUERIES["events_mad_anomalies"] = (events_mad_anomalies, EVENTS_MAD_ANOMALIES_SQL)


# ---------------------------------------------------------------------------
# data-layout / file-skipping analysis (round 6); the WRITER that ships
# the measured-best layout is operators/layout.py (round 7) — both use
# the same Morton helpers so analysis and artifact can never drift.

from pos_pipeline_core_etl_spark.operators.layout import (  # noqa: E402
    ZORDER_EPOCH as _ZORDER_EPOCH,
)
from pos_pipeline_core_etl_spark.operators.layout import (  # noqa: E402
    interleave4 as _interleave4,
)


def events_layout_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping comparison of three physical layouts for the
    events table, 32 files each: partition by day (`by_day`), by user
    hash-bucket (`by_user`), and by Z-ORDER (Morton interleave of the
    4-bit day and user buckets, files = aligned rectangles of the
    (user, day) grid). For each layout: how many files a user point
    query and a day point query must read on the REAL data
    distribution. Single-dimension layouts ace one query shape and
    read everything for the other; the z-order layout bounds BOTH —
    the data-layout decision a 100 TB table bakes into its writer
    (`repartitionByRange` on the z-value + per-file min/max stats).
    Pure integer bucket math — bit-identical cross-engine; averages
    are integer-sum / count (order-free)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.expr(f"pmod(datediff(CAST(ts AS DATE), {_ZORDER_EPOCH}), 32)").alias(
            "d_bucket"
        ),
        F.expr("pmod(user_id, 32)").alias("u_bucket"),
    )
    z = _interleave4("floor(u_bucket / 2)", "floor(d_bucket / 2)")
    placed = base.select(
        "user_id",
        "d_bucket",
        F.col("d_bucket").alias("file_by_day"),
        F.col("u_bucket").alias("file_by_user"),
        F.expr(f"CAST(floor(({z}) / 8) AS INT)").alias("file_zorder"),
    )
    lay = placed.select(
        "user_id",
        "d_bucket",
        F.expr(
            "explode(array("
            "named_struct('layout', 'by_day', 'file', file_by_day), "
            "named_struct('layout', 'by_user', 'file', file_by_user), "
            "named_struct('layout', 'zorder', 'file', file_zorder)))"
        ).alias("lf"),
    ).select("user_id", "d_bucket", F.col("lf.layout").alias("layout"), F.col("lf.file").alias("file"))
    per_user = lay.groupBy("layout", "user_id").agg(
        F.count_distinct("file").alias("nf")
    )
    per_day = lay.groupBy("layout", "d_bucket").agg(
        F.count_distinct("file").alias("nf")
    )
    au = per_user.groupBy("layout").agg(
        hround(F.sum("nf") / F.count(F.lit(1)), 6).alias("avg_files_user_query")
    )
    ad = per_day.groupBy("layout").agg(
        hround(F.sum("nf") / F.count(F.lit(1)), 6).alias("avg_files_day_query")
    )
    nf = lay.groupBy("layout").agg(F.count_distinct("file").alias("n_files_used"))
    return (
        nf.join(au, "layout").join(ad, "layout").orderBy("layout")
    )


def _layout_skipping_oracle() -> str:
    z = _interleave4("CAST(floor(u_bucket / 2) AS INT)", "CAST(floor(d_bucket / 2) AS INT)")
    return f"""
WITH base AS (
  SELECT user_id,
         ((datediff('day', {_ZORDER_EPOCH}, CAST(ts AS DATE)) % 32) + 32) % 32 AS d_bucket,
         ((user_id % 32) + 32) % 32 AS u_bucket
  FROM events
),
placed AS (
  SELECT user_id, d_bucket,
         d_bucket AS file_by_day,
         u_bucket AS file_by_user,
         CAST(floor(({z}) / 8) AS INT) AS file_zorder
  FROM base
),
lay AS (
  SELECT user_id, d_bucket, 'by_day' AS layout, file_by_day AS file FROM placed
  UNION ALL
  SELECT user_id, d_bucket, 'by_user', file_by_user FROM placed
  UNION ALL
  SELECT user_id, d_bucket, 'zorder', file_zorder FROM placed
),
per_user AS (
  SELECT layout, user_id, count(DISTINCT file) AS nf
  FROM lay GROUP BY layout, user_id
),
per_day AS (
  SELECT layout, d_bucket, count(DISTINCT file) AS nf
  FROM lay GROUP BY layout, d_bucket
),
au AS (
  SELECT layout, {hround_sql("CAST(sum(nf) AS DOUBLE) / count(*)", 6)}
           AS avg_files_user_query
  FROM per_user GROUP BY layout
),
ad AS (
  SELECT layout, {hround_sql("CAST(sum(nf) AS DOUBLE) / count(*)", 6)}
           AS avg_files_day_query
  FROM per_day GROUP BY layout
),
nf AS (
  SELECT layout, CAST(count(DISTINCT file) AS BIGINT) AS n_files_used
  FROM lay GROUP BY layout
)
SELECT nf.layout, nf.n_files_used, au.avg_files_user_query, ad.avg_files_day_query
FROM nf JOIN au USING (layout) JOIN ad USING (layout)
ORDER BY nf.layout
"""


QUERIES["events_layout_skipping"] = (
    events_layout_skipping,
    _layout_skipping_oracle(),
)


# ---------------------------------------------------------------------------
# z-order layout WRITER + read-back pruning stats (round 7 — VERDICT r6 #5)

_ZORDER_OUT = "/tmp/spark_graft_zorder"


def _zorder_path(sf_dir: str) -> str:
    # Keyed by PID so two harness processes verifying the same SF never
    # write into each other's scratch layout (VERDICT r7 #7).  Within a
    # process the path is stable, which the mtime-stability test relies
    # on (incremental maintenance must NOT rewrite untouched z-files).
    import os

    return os.path.join(
        _ZORDER_OUT, f"pid{os.getpid()}", os.path.basename(sf_dir.rstrip("/"))
    )


_ZORDER_PLACED_SQL = """base AS (
  SELECT user_id,
         ((datediff('day', DATE'2024-01-01', CAST(ts AS DATE)) % 32) + 32) % 32
           AS d_bucket,
         ((user_id % 32) + 32) % 32 AS u_bucket
  FROM events
),
placed AS (
  SELECT user_id, d_bucket, u_bucket,
         CAST(floor(({z}) / 8) AS INT) AS zfile
  FROM base
),
stats AS (
  SELECT CAST(zfile AS BIGINT) AS zfile,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(min(u_bucket) AS BIGINT) AS min_u,
         CAST(max(u_bucket) AS BIGINT) AS max_u,
         CAST(min(d_bucket) AS BIGINT) AS min_d,
         CAST(max(d_bucket) AS BIGINT) AS max_d
  FROM placed GROUP BY zfile
)"""


def events_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE the z-ordered events layout (operators/layout.py — one
    parquet file per Morton z-file over the (user, day) bucket grid),
    then READ THE ARTIFACT BACK and report each written file's row
    count and min/max bucket ranges — the footer statistics a pruning
    reader consults. The oracle predicts the same stats straight from
    the data, which is exactly the point: file membership is a pure
    function of the row, so the written layout is verifiable by an
    engine that never saw the files. The analysis twin
    (events_layout_skipping) said z-order is the layout to ship; this
    query ships and audits it."""
    from pos_pipeline_core_etl_spark.operators import layout

    path = _zorder_path(sf_dir)
    layout.write_zorder_layout(load_table(spark, sf_dir, "events"), path)
    return layout.read_zorder_file_stats(spark, path)


def _zorder_files_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.layout import interleave4

    z = interleave4(
        "CAST(floor(u_bucket / 2) AS INT)", "CAST(floor(d_bucket / 2) AS INT)"
    )
    return f"""
WITH {_ZORDER_PLACED_SQL.format(z=z)}
SELECT * FROM stats ORDER BY zfile
"""


QUERIES["events_zorder_files"] = (events_zorder_files, _zorder_files_oracle())


def events_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max-pruning cost of the WRITTEN z-order layout, computed
    from the read-back file stats: per dimension, the average and
    worst-case number of files a point query must read when the reader
    skips files by footer range — the arithmetic parquet file-skipping
    actually performs. Closes the loop events_layout_skipping opened:
    that query predicted the layout's value from exact membership;
    this one measures the shipped artifact under real pruning
    semantics (ranges, not sets — z-order keeps BOTH dimensions'
    ranges tight per file, which is the whole trick)."""
    from pos_pipeline_core_etl_spark.operators import layout

    path = _zorder_path(sf_dir)
    layout.write_zorder_layout(load_table(spark, sf_dir, "events"), path)
    stats = layout.read_zorder_file_stats(spark, path)
    return layout.zorder_pruning_report(stats)


def _zorder_pruning_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.layout import interleave4

    z = interleave4(
        "CAST(floor(u_bucket / 2) AS INT)", "CAST(floor(d_bucket / 2) AS INT)"
    )
    return f"""
WITH {_ZORDER_PLACED_SQL.format(z=z)},
probes AS (SELECT unnest(generate_series(0, 31)) AS probe),
per AS (
  SELECT 'user_bucket' AS dim, p.probe,
         CAST(sum(CASE WHEN p.probe BETWEEN s.min_u AND s.max_u
                       THEN 1 ELSE 0 END) AS BIGINT) AS nf
  FROM probes p, stats s GROUP BY p.probe
  UNION ALL
  SELECT 'day_bucket', p.probe,
         CAST(sum(CASE WHEN p.probe BETWEEN s.min_d AND s.max_d
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM probes p, stats s GROUP BY p.probe
)
SELECT dim,
       CAST(count(*) AS BIGINT) AS n_probes,
       {hround_sql("CAST(sum(nf) AS DOUBLE) / count(*)", 6)} AS avg_files_read,
       CAST(max(nf) AS BIGINT) AS max_files_read
FROM per GROUP BY dim ORDER BY dim
"""


QUERIES["events_zorder_pruning"] = (
    events_zorder_pruning,
    _zorder_pruning_oracle(),
)


def events_zorder_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental z-order layout maintenance, hash-proven equivalent
    to a full rebuild: write the layout from all events EXCEPT the
    newest day, merge that day in via operators/layout.py::
    apply_zorder_increment (dynamic partition overwrite of ONLY the
    z-files the day touches), then report the read-back per-file stats.
    The oracle is the SAME full-layout SQL as events_zorder_files, so
    the driver proves incremental maintenance ≡ full rewrite every
    round — the payments_daily_mart_incremental discipline applied to
    physical data layout."""
    from pos_pipeline_core_etl_spark.operators import layout

    ev = load_table(spark, sf_dir, "events")
    maxd = ev.agg(F.max(F.expr("CAST(ts AS DATE)")).alias("md"))
    base = ev.join(
        F.broadcast(maxd), F.expr("CAST(ts AS DATE) < md")
    ).drop("md")
    late = ev.join(
        F.broadcast(maxd), F.expr("CAST(ts AS DATE) = md")
    ).drop("md")
    path = _zorder_path(sf_dir) + "_incr"
    layout.write_zorder_layout(base, path)
    layout.apply_zorder_increment(spark, late, path)
    return layout.read_zorder_file_stats(spark, path)


QUERIES["events_zorder_incremental"] = (
    events_zorder_incremental,
    _zorder_files_oracle(),  # incremental must equal the FULL layout
)


# ---------------------------------------------------------------------------
# key-skew diagnosis (round 7) — the report that sizes salted_aggregate


def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile of events.event_type (operators/
    skew.py::key_skew_profile): top keys by row count with corpus share
    and the integer suggested-salt factor ceil(share × 32) — the
    pre-flight diagnosis that decides whether a groupBy on this key
    needs the two-phase salted aggregation and with how many salts.
    One keyed count agg; the ranking windows run over |distinct keys|
    rows (bounded by contract), never data rows."""
    from pos_pipeline_core_etl_spark.operators.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, "event_type")


def _skew_profile_oracle(top_k: int = 10, n_partitions: int = 32) -> str:
    return f"""
WITH per_key AS (
  SELECT event_type AS key, CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY event_type
),
totaled AS (
  SELECT key, n_rows, SUM(n_rows) OVER () AS total,
         row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rank
  FROM per_key
)
SELECT CAST(rank AS INTEGER) AS rank, CAST(key AS VARCHAR) AS key, n_rows,
       {hround_sql("CAST(n_rows AS DOUBLE) / total", 6)} AS share,
       CAST((n_rows * {n_partitions} + total - 1) // total AS BIGINT)
         AS suggested_salts
FROM totaled WHERE rank <= {top_k}
ORDER BY rank
"""


QUERIES["skew_profile_events"] = (skew_profile_events, _skew_profile_oracle())


# ---------------------------------------------------------------------------
# data profiling (round 6) — the pre-ingestion column report

_PROFILE_NUM = (
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
)
_PROFILE_STR = ("l_returnflag", "l_linestatus")
_PROFILE_ALL = _PROFILE_NUM + _PROFILE_STR


def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem — per column: row count, null count,
    EXACT distinct count, and numeric min/max (timestamps as epoch
    seconds; string columns carry null min/max — their reprs differ
    across engines while counts do not). The Deequ/profiler-style
    pre-ingestion report.

    Scale shape: one explode to (column, value) long form — a
    deliberate ×n_cols scan amplification that buys exact distincts
    for ALL columns in ONE shuffle with NO Expand (the multi-
    countDistinct agg would plan an Expand of the same size anyway,
    with worse skew); plus one map-side min/max agg row. Distinct
    counting is on the engine's string repr, which is round-trip
    injective on doubles in both engines, so counts match while the
    reprs themselves never need to."""
    li = load_table(spark, sf_dir, "lineitem")
    casts = {
        c: (
            f"(unix_micros(CAST({c} AS TIMESTAMP)) / 1000000.0)"
            if c == "l_shipdate"
            else c
        )
        for c in _PROFILE_ALL
    }
    cells = ", ".join(
        f"named_struct('col', '{c}', 'v', CAST({casts[c]} AS STRING))"
        for c in _PROFILE_ALL
    )
    lf = li.select(F.expr(f"explode(array({cells})) AS s")).select(
        F.col("s.col").alias("column"), F.col("s.v").alias("v")
    )
    stats = lf.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
        F.count_distinct("v").alias("n_distinct"),
    )
    mm = li.agg(
        *[
            hround(F.expr(f"MIN({casts[c]})").cast("double"), 6).alias(f"mn_{c}")
            for c in _PROFILE_NUM
        ],
        *[
            hround(F.expr(f"MAX({casts[c]})").cast("double"), 6).alias(f"mx_{c}")
            for c in _PROFILE_NUM
        ],
    )
    stack_cells = ", ".join(
        f"'{c}', mn_{c}, mx_{c}" for c in _PROFILE_NUM
    )
    ranges = mm.selectExpr(
        f"stack({len(_PROFILE_NUM)}, {stack_cells}) AS (column, min_num, max_num)"
    )
    return (
        stats.join(ranges, "column", "left")
        .select("column", "n_rows", "n_null", "n_distinct", "min_num", "max_num")
        .orderBy("column")
    )


def _profile_oracle() -> str:
    def cast(c: str) -> str:
        return f"epoch({c})" if c == "l_shipdate" else c

    lf = "\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS col, CAST({cast(c)} AS VARCHAR) AS v FROM lineitem"
        for c in _PROFILE_ALL
    )
    mm = "\n  UNION ALL\n  ".join(
        f"SELECT '{c}' AS col, {hround_sql(f'CAST(MIN({cast(c)}) AS DOUBLE)', 6)} AS min_num, "
        f"{hround_sql(f'CAST(MAX({cast(c)}) AS DOUBLE)', 6)} AS max_num FROM lineitem"
        for c in _PROFILE_NUM
    )
    return f"""
WITH lf AS (
  {lf}
),
stats AS (
  SELECT col, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(*) - count(v) AS BIGINT) AS n_null,
         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
  FROM lf GROUP BY col
),
mm AS (
  {mm}
)
SELECT s.col AS "column", s.n_rows, s.n_null, s.n_distinct,
       mm.min_num, mm.max_num
FROM stats s LEFT JOIN mm ON mm.col = s.col
ORDER BY s.col
"""


QUERIES["profile_lineitem"] = (profile_lineitem, _profile_oracle())


# ---------------------------------------------------------------------------
# graph analytics over the co-purchase graph (round 8 — operators/graph.py)

_GRAPH_PART_BOUND = 2000  # keeps both engines' triangle join dim-bounded

# MATERIALIZED: the unrolled pagerank oracles reference these CTEs
# once per iteration level; without the hint DuckDB 1.0 re-inlines the
# lineitem self-join at every reference and the 16-level tol oracle
# goes super-linear (observed: minutes instead of seconds).
_GRAPH_EDGES_SQL = f"""le AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS item
  FROM lineitem WHERE l_partkey < {_GRAPH_PART_BOUND}
),
edges AS MATERIALIZED (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM le a JOIN le b ON a.g = b.g AND a.item < b.item
)"""


# Session-scoped materialize-once edge cache (round 10, VERDICT r9 #5):
# every graph query family member used to rebuild its edge list from
# lineitem, and the support-2 build DOMINATED the consumers at 100×
# (25.99 s kcore / 27.8 s components in LADDER_r9 — the peel/label loops
# themselves are live-set-sized).  At 100 TB you materialize the graph
# once and consume it many times (the z-order/compaction family's
# pattern); within one engine session the equivalent is build-once via
# an eager localCheckpoint keyed by (application, sf_dir, graph kind).
# Values are unchanged — the cache holds exactly what the pure builders
# (_graph_edges_build / _graph_s2_edges_build, which the plan-hygiene
# tests assert against) produce.
_EDGE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _shared_edges(
    spark: SparkSession, sf_dir: str, kind: str, build
) -> DataFrame:
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), kind)
    df = _EDGE_CACHE.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _EDGE_CACHE[key] = df
    return df


def _graph_edges_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure (un-cached) support-1 edge build — the plan the first
    consumer pays; plan-hygiene assertions target this form."""
    from pos_pipeline_core_etl_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") < _GRAPH_PART_BOUND
    )
    return graph.copurchase_edges(li)


def _graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _shared_edges(
        spark, sf_dir, "s1", lambda: _graph_edges_build(spark, sf_dir)
    )


def graph_part_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph (two parts
    are adjacent iff some order contains both; operators/graph.py).
    The clustering-coefficient numerator — how clique-ish each item's
    neighborhood is. Round 9 swapped the plan to the DEGREE-ORDERED
    wedge join (operators/graph.py::triangle_counts_oriented, VERDICT
    r8 #4): identical output by construction — the oracle is unchanged
    and equality to the plain ordered join is test-pinned — but the
    wedge intermediate is bounded at Σ C(outdeg⁺, 2) = O(m^1.5), which
    survives the power-law hub case the plain a<b<c join degenerates
    on. Integer output, so the cross-engine check is exact by
    construction. Bounded to l_partkey < 2000 so the intermediate
    stays dim-sized in both engines at every SF (the filter pushes to
    the parquet scan)."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    return (
        graph.triangle_counts_oriented(edges)
        .select(F.col("node").cast("long").alias("node"), "n_triangles")
        .orderBy("node")
    )


GRAPH_PART_TRIANGLES_SQL = f"""
WITH {_GRAPH_EDGES_SQL},
tris AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (SELECT unnest([a, b, c]) AS node FROM tris)
SELECT CAST(node AS BIGINT) AS node,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node ORDER BY node
"""

QUERIES["graph_part_triangles"] = (graph_part_triangles, GRAPH_PART_TRIANGLES_SQL)


def graph_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the co-purchase graph
    (operators/graph.py::pagerank_fixedpoint): item influence scores
    after 10 synchronous iterations, ranks in integer nano-units.
    Iterative float PageRank cannot be oracle-checked (summation-order
    drift compounds per iteration); the fixed-point form makes every
    iteration exact integer algebra — floor-division contributions,
    order-free integer sums — so both engines compute bit-identical
    ranks (the kmeans integer-quantization determinism contract applied
    to graph iteration). The oracle unrolls the 10 iterations as a
    plain CTE chain (recursive terms cannot aggregate in standard
    SQL)."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    ranks = graph.pagerank_fixedpoint(edges)
    return ranks.select(
        F.col("node").cast("long").alias("node"), "rank_q"
    ).orderBy("node")


def _graph_pagerank_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import (
        PAGERANK_DAMPING_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
    )

    d = PAGERANK_DAMPING_PCT
    ctes = [
        f"""sym AS MATERIALIZED (SELECT src, dst FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS node FROM deg),
basec AS MATERIALIZED (
  SELECT (({100 - d}) * CAST({PAGERANK_SCALE} AS BIGINT)) // (100 * count(*))
           AS b,
         CAST({PAGERANK_SCALE} AS BIGINT) // count(*) AS r_init
  FROM nodes
),
rk0 AS MATERIALIZED (SELECT node, r_init AS rank_q FROM nodes, basec)"""
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""rk{i} AS MATERIALIZED (
  SELECT n.node, bc.b + ({d} * COALESCE(s.s, 0)) // 100 AS rank_q
  FROM nodes n CROSS JOIN basec bc
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_q // dg.outdeg) AS s
    FROM sym e
    JOIN rk{i - 1} r ON r.node = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
WITH {_GRAPH_EDGES_SQL},
{chain}
SELECT CAST(node AS BIGINT) AS node, CAST(rank_q AS BIGINT) AS rank_q
FROM rk{PAGERANK_ITERS} ORDER BY node
"""


QUERIES["graph_part_pagerank"] = (graph_part_pagerank, _graph_pagerank_oracle())


def graph_part_pagerank_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-driven PageRank (VERDICT r8 #3;
    operators/graph.py::pagerank_converged): iterate until the L1
    delta between successive integer iterates is <= PAGERANK_TOL_Q
    rank nano-units (cap PAGERANK_MAX_ITERS) instead of trusting a
    fixed count. Because the whole trajectory is exact integer
    algebra, the stopping iteration is itself bit-exact cross-engine
    and sits in the checked output (stop_iter): measured stops are
    iter 4 at sf0.01 and iter 9 at sf0.1 — the rule adapts to the
    graph. The oracle unrolls all capped iterations, derives the same
    min-iteration-under-tolerance scalar, and selects that iterate's
    ranks — so a Spark-side stopping-rule regression (off-by-one,
    wrong delta metric) hash-fails rather than shifting results
    silently."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    return (
        graph.pagerank_converged(edges)
        .select(F.col("node").cast("long").alias("node"), "rank_q", "stop_iter")
        .orderBy("node")
    )


def _graph_pagerank_tol_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import (
        PAGERANK_DAMPING_PCT,
        PAGERANK_MAX_ITERS,
        PAGERANK_SCALE,
        PAGERANK_TOL_Q,
    )

    d = PAGERANK_DAMPING_PCT
    cap = PAGERANK_MAX_ITERS
    ctes = [
        f"""sym AS MATERIALIZED (SELECT src, dst FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS node FROM deg),
basec AS MATERIALIZED (
  SELECT (({100 - d}) * CAST({PAGERANK_SCALE} AS BIGINT)) // (100 * count(*))
           AS b,
         CAST({PAGERANK_SCALE} AS BIGINT) // count(*) AS r_init
  FROM nodes
),
rk0 AS MATERIALIZED (SELECT node, r_init AS rank_q FROM nodes, basec)"""
    ]
    for i in range(1, cap + 1):
        ctes.append(
            f"""rk{i} AS MATERIALIZED (
  SELECT n.node, bc.b + ({d} * COALESCE(s.s, 0)) // 100 AS rank_q
  FROM nodes n CROSS JOIN basec bc
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_q // dg.outdeg) AS s
    FROM sym e
    JOIN rk{i - 1} r ON r.node = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    deltas = "\nUNION ALL\n".join(
        f"""SELECT {i} AS iter, SUM(ABS(a.rank_q - b.rank_q)) AS d
FROM rk{i} a JOIN rk{i - 1} b ON b.node = a.node"""
        for i in range(1, cap + 1)
    )
    levels = "\nUNION ALL\n".join(
        f"SELECT {i} AS it, node, rank_q FROM rk{i}" for i in range(1, cap + 1)
    )
    ctes.append(f"deltas AS MATERIALIZED (\n{deltas}\n)")
    ctes.append(
        f"""stopc AS (
  SELECT COALESCE(MIN(iter), {cap}) AS si FROM deltas WHERE d <= {PAGERANK_TOL_Q}
)"""
    )
    ctes.append(f"levels AS MATERIALIZED (\n{levels}\n)")
    chain = ",\n".join(ctes)
    return f"""
WITH {_GRAPH_EDGES_SQL},
{chain}
SELECT CAST(l.node AS BIGINT) AS node,
       CAST(l.rank_q AS BIGINT) AS rank_q,
       CAST(st.si AS BIGINT) AS stop_iter
FROM levels l CROSS JOIN stopc st
WHERE l.it = st.si
ORDER BY node
"""


QUERIES["graph_part_pagerank_tol"] = (
    graph_part_pagerank_tol,
    _graph_pagerank_tol_oracle(),
)


def graph_part_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the co-purchase
    graph: triangles(v) / C(deg(v), 2) — how close each item's
    neighborhood is to a clique, the standard local graph statistic
    built from the two exact pieces this engine already ships (triangle
    counts + symmetric degrees). Nodes with degree < 2 have no possible
    wedge and are emitted with coefficient 0 by convention (documented;
    both engines agree). hround(6) on the single final ratio — the
    numerator and denominator are exact integers, so there is no
    accumulated-float risk."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    tris = graph.triangle_counts_oriented(edges).withColumnRenamed("node", "src")
    wedges = (F.col("deg") * (F.col("deg") - 1) / 2).cast("long")
    return (
        deg.join(tris, "src", "left")
        .select(
            F.col("src").cast("long").alias("node"),
            F.col("deg").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            hround(
                F.when(
                    F.col("deg") >= 2,
                    F.coalesce("n_triangles", F.lit(0)) / wedges,
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
        .orderBy("node")
    )


def _graph_clustering_oracle() -> str:
    ratio = hround_sql(
        "CASE WHEN deg >= 2 THEN COALESCE(n_triangles, 0) "
        "/ CAST(deg * (deg - 1) // 2 AS BIGINT) ELSE 0.0 END",
        6,
    )
    return f"""
WITH {_GRAPH_EDGES_SQL},
sym AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
tris AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tcounts AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT unnest([a, b, c]) AS node FROM tris)
  GROUP BY node
)
SELECT CAST(d.src AS BIGINT) AS node,
       CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       {ratio} AS clustering
FROM deg d LEFT JOIN tcounts t ON t.node = d.src
ORDER BY node
"""


QUERIES["graph_part_clustering"] = (graph_part_clustering, _graph_clustering_oracle())


# support-2 co-purchase edges, UNBOUNDED part set (round 9): pairs that
# co-occur in >= 2 distinct orders. Unlike the < 2000-bounded support-1
# graph, this one is naturally sparse and heterogeneous (a pair must
# repeat to count), which is what makes iterative peeling non-trivial:
# measured cascades are 4 rounds -> 1535 survivors at sf0.01 and a
# 6-round peel down to a 3-node core at sf0.1.
_GRAPH_S2_EDGES_SQL = """le AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS item FROM lineitem
),
s2edges AS MATERIALIZED (
  SELECT a.item AS src, b.item AS dst, CAST(count(*) AS BIGINT) AS n_orders
  FROM le a JOIN le b ON a.g = b.g AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 2
)"""


def _graph_s2_edges_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure (un-cached) support-2 edge build, n_orders kept — the plan
    the first consumer pays; plan-hygiene assertions target this form."""
    from pos_pipeline_core_etl_spark.operators.dedup import upper_triangle_pairs

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    grouped = (
        li.groupBy("g")
        .agg(F.sort_array(F.collect_set("item")).alias("items"))
        .where(F.size("items") > 1)
    )
    pairs = upper_triangle_pairs(
        ids_col="items",
        build=lambda x, y: F.struct(x.alias("src"), y.alias("dst")),
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .where(F.col("n_orders") >= 2)
    )


def _graph_s2_edges_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n_orders) — the shared materialized support-2 graph."""
    return _shared_edges(
        spark, sf_dir, "s2", lambda: _graph_s2_edges_build(spark, sf_dir)
    )


def _graph_s2_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _graph_s2_edges_full(spark, sf_dir).select("src", "dst")


def graph_part_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the support-2 co-purchase graph
    (operators/graph.py::kcore_nodes): the maximal subgraph where every
    part has >= 2 repeat-co-purchase partners — the dense-substructure
    extractor an ER/community pipeline runs after entity resolution.
    Iterative peeling with one bounded survivor-count scalar per round;
    everything integer, so the peel SEQUENCE is bit-exact cross-engine
    and stop_round sits in the checked output. The oracle unrolls the
    capped peel; cap-equality makes the unrolled form exact regardless
    of where the fixpoint lands (post-stability rounds are no-ops).
    Measured:
    4 peel rounds / 1535 survivors at sf0.01, 6 rounds / 3 survivors at
    sf0.1."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_s2_edges(spark, sf_dir)
    return (
        graph.kcore_nodes(edges, k=2)
        .select(F.col("node").cast("long").alias("node"), "core_deg", "stop_round")
        .orderBy("node")
    )


def _graph_kcore_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import KCORE_MAX_ROUNDS

    k = 2
    cap = KCORE_MAX_ROUNDS
    ctes = [
        """sym AS MATERIALIZED (SELECT src, dst FROM s2edges
       UNION ALL SELECT dst, src FROM s2edges)""",
        "p0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM sym)",
    ]
    for i in range(1, cap + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT e.src AS node, CAST(count(*) AS BIGINT) AS core_deg
  FROM sym e
  JOIN p{i - 1} a ON a.node = e.src
  JOIN p{i - 1} b ON b.node = e.dst
  GROUP BY e.src HAVING count(*) >= {k}
)"""
        )
    counts = "\nUNION ALL\n".join(
        f"SELECT {i} AS r, count(*) AS c FROM p{i}" for i in range(0, cap + 1)
    )
    ctes.append(f"counts AS MATERIALIZED (\n{counts}\n)")
    ctes.append(
        f"""stopc AS (
  SELECT COALESCE(MIN(a.r), {cap}) AS sr
  FROM counts a JOIN counts b ON b.r = a.r - 1 AND b.c = a.c
  WHERE a.r >= 1
)"""
    )
    chain = ",\n".join(ctes)
    return f"""
WITH {_GRAPH_S2_EDGES_SQL},
{chain}
SELECT CAST(p.node AS BIGINT) AS node, p.core_deg,
       CAST(st.sr AS BIGINT) AS stop_round
FROM p{cap} p CROSS JOIN stopc st
ORDER BY node
"""


QUERIES["graph_part_kcore"] = (graph_part_kcore, _graph_kcore_oracle())


_PPR_SEED_BOUND = 100  # seed set: parts with partkey < 100 in the graph


def graph_part_pagerank_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the co-purchase graph
    (operators/graph.py::pagerank_personalized): the walk restarts only
    at parts with partkey < 100, so ranks measure proximity to that
    seed basket — "what gets co-purchased NEAR these parts", the
    recommendation/expansion primitive. Same integer nano-unit contract
    as the global loop (bit-exact cross-engine); the oracle unrolls the
    iterations with the seed-gated restart term. NOTE: registered after
    the round-9 window filled (the graph_pagerank_convergence
    precedent from round 8) — leads tier 0 in round 10; replica rows
    at both SFs committed meanwhile."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    seeds = edges.sparkSession.range(_PPR_SEED_BOUND).select(
        F.col("id").alias("node")
    )
    return (
        graph.pagerank_personalized(edges, seeds)
        .select(F.col("node").cast("long").alias("node"), "rank_q")
        .orderBy("node")
    )


def _graph_ppr_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import (
        PAGERANK_DAMPING_PCT,
        PAGERANK_ITERS,
        PAGERANK_SCALE,
    )

    d = PAGERANK_DAMPING_PCT
    sb = _PPR_SEED_BOUND
    ctes = [
        f"""sym AS MATERIALIZED (SELECT src, dst FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS node, src < {sb} AS is_seed FROM deg),
basec AS MATERIALIZED (
  SELECT (({100 - d}) * CAST({PAGERANK_SCALE} AS BIGINT))
           // (100 * count(*) FILTER (is_seed)) AS b,
         CAST({PAGERANK_SCALE} AS BIGINT) // count(*) FILTER (is_seed)
           AS r_init
  FROM nodes
),
rk0 AS MATERIALIZED (
  SELECT node, CASE WHEN is_seed THEN r_init ELSE 0 END AS rank_q
  FROM nodes, basec
)"""
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        ctes.append(
            f"""rk{i} AS MATERIALIZED (
  SELECT n.node,
         (CASE WHEN n.is_seed THEN bc.b ELSE 0 END)
           + ({d} * COALESCE(s.s, 0)) // 100 AS rank_q
  FROM nodes n CROSS JOIN basec bc
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank_q // dg.outdeg) AS s
    FROM sym e
    JOIN rk{i - 1} r ON r.node = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) s ON s.node = n.node
)"""
        )
    chain = ",\n".join(ctes)
    return f"""
WITH {_GRAPH_EDGES_SQL},
{chain}
SELECT CAST(node AS BIGINT) AS node, CAST(rank_q AS BIGINT) AS rank_q
FROM rk{PAGERANK_ITERS} ORDER BY node
"""


QUERIES["graph_part_pagerank_seeded"] = (
    graph_part_pagerank_seeded,
    _graph_ppr_oracle(),
)


def graph_part_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the support-2 co-purchase graph
    (operators/dedup.py::connected_components — the pointer-halved
    log-diameter loop): which parts form repeat-co-purchase communities
    at all. Completes the graph family's components member with the
    same recursive-reachability oracle the dedup components use;
    component_id = min member id (the shared canonicalization
    contract)."""
    from pos_pipeline_core_etl_spark.operators.dedup import connected_components

    edges = _graph_s2_edges(spark, sf_dir)
    comps = connected_components(edges, src="src", dst="dst")
    return comps.select(
        F.col("id").cast("long").alias("node"),
        F.col("component_id").cast("long").alias("component_id"),
    ).orderBy("node")


def _graph_components_oracle() -> str:
    return f"""
WITH RECURSIVE {_GRAPH_S2_EDGES_SQL},
sym AS (SELECT src AS a, dst AS b FROM s2edges
        UNION SELECT dst, src FROM s2edges),
reach(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.lbl FROM reach JOIN sym s ON s.a = reach.id
)
SELECT CAST(id AS BIGINT) AS node, CAST(MIN(lbl) AS BIGINT) AS component_id
FROM reach GROUP BY id ORDER BY node
"""


QUERIES["graph_part_components"] = (graph_part_components, _graph_components_oracle())


def graph_part_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood-Jaccard near-duplicates over the co-purchase graph
    (operators/graph.py::neighbor_jaccard_pairs, threshold 0.1):
    structurally interchangeable parts — pairs whose neighbor sets
    overlap even if never co-purchased themselves; the graph-side
    analog of the document near-dup families, and the candidate
    generator is the wedge join (disjoint-neighborhood pairs never
    materialize). Non-vacuous at both driver SFs (88 rows at sf0.01,
    1186 at sf0.1). Exact integer counts, hround(6) on the one final
    ratio."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    return (
        graph.neighbor_jaccard_pairs(edges, threshold=0.1)
        .select(
            F.col("node_a").cast("long").alias("node_a"),
            F.col("node_b").cast("long").alias("node_b"),
            "n_shared",
            "jaccard",
        )
        .orderBy("node_a", "node_b")
    )


def _graph_neighbor_jaccard_oracle() -> str:
    ratio = hround_sql("ns / CAST(da.d + db.d - ns AS DOUBLE)", 6)
    return f"""
WITH {_GRAPH_EDGES_SQL},
sym AS MATERIALIZED (SELECT src, dst FROM edges
       UNION ALL SELECT dst, src FROM edges),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM sym GROUP BY src),
sh AS (
  SELECT a.dst AS node_a, b.dst AS node_b, CAST(count(*) AS BIGINT) AS ns
  FROM sym a JOIN sym b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2
)
SELECT CAST(sh.node_a AS BIGINT) AS node_a,
       CAST(sh.node_b AS BIGINT) AS node_b,
       sh.ns AS n_shared,
       {ratio} AS jaccard
FROM sh
JOIN deg da ON da.src = sh.node_a
JOIN deg db ON db.src = sh.node_b
WHERE {ratio} >= 0.1
ORDER BY node_a, node_b
"""


QUERIES["graph_part_neighbor_jaccard"] = (
    graph_part_neighbor_jaccard,
    _graph_neighbor_jaccard_oracle(),
)


def graph_part_s2_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The support-2 co-purchase edge list ITSELF as a checked artifact
    (round 10, VERDICT r9 #5): (src, dst, n_orders) for every part pair
    co-occurring in >= 2 distinct orders. This is the shared
    materialization every support-2 consumer (kcore, components, the
    capped jaccard family) now reads instead of rebuilding — the
    materialize-then-consume pattern (operators/layout.py family) at
    the query-plan level, and putting the build's VALUES under the
    driver oracle means a cache bug cannot hide behind its consumers."""
    return (
        _graph_s2_edges_full(spark, sf_dir)
        .select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            "n_orders",
        )
        .orderBy("src", "dst")
    )


GRAPH_PART_S2_EDGES_SQL = f"""
WITH {_GRAPH_S2_EDGES_SQL}
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst, n_orders
FROM s2edges ORDER BY src, dst
"""

QUERIES["graph_part_s2_edges"] = (graph_part_s2_edges, GRAPH_PART_S2_EDGES_SQL)


# Threshold for the capped-jaccard family on the support-2 graph,
# measured against BOTH SFs before registering (the SELFREVIEW r9 #8
# discipline): uncapped 144 / capped 30 rows at sf0.01, 1132 / 1122 at
# sf0.1 — non-vacuous at both SFs AND the cap BINDS at both (the capped
# query is not a silent twin of the exact one).
_S2_JACCARD_THRESHOLD = 0.5


def graph_part_neighbor_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge-capped neighborhood-Jaccard over the support-2 co-purchase
    graph (operators/graph.py::neighbor_jaccard_pairs with
    wedge_cap=WEDGE_CAP) — the round-10 close of the one
    stated-but-unbuilt scale leg VERDICT r9 named: shared neighbors of
    degree > 4 are excluded from wedge GENERATION (one power-law hub
    otherwise contributes C(deg, 2) wedges and degenerates the join),
    so the wedge intermediate is bounded at cap² per generator.
    Denominators keep TRUE degrees, so every emitted jaccard is a LOWER
    BOUND of the exact value — precision preserved, recall capped, and
    graph_part_wedge_overflow is the standing audit of exactly what
    the cap skipped.  Capped ≡ exact whenever the cap clears the max
    degree (test-pinned); on this graph the cap binds at both SFs by
    construction (see _S2_JACCARD_THRESHOLD note)."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_s2_edges(spark, sf_dir)
    return (
        graph.neighbor_jaccard_pairs(
            edges, threshold=_S2_JACCARD_THRESHOLD, wedge_cap=graph.WEDGE_CAP
        )
        .select(
            F.col("node_a").cast("long").alias("node_a"),
            F.col("node_b").cast("long").alias("node_b"),
            "n_shared",
            "jaccard",
        )
        .orderBy("node_a", "node_b")
    )


def _graph_neighbor_jaccard_capped_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import WEDGE_CAP

    ratio = hround_sql("ns / CAST(da.d + db.d - ns AS DOUBLE)", 6)
    return f"""
WITH {_GRAPH_S2_EDGES_SQL},
sym AS MATERIALIZED (SELECT src, dst FROM s2edges
       UNION ALL SELECT dst, src FROM s2edges),
deg AS MATERIALIZED (SELECT src, count(*) AS d FROM sym GROUP BY src),
wsrc AS (
  SELECT s.src, s.dst FROM sym s JOIN deg g ON g.src = s.src
  WHERE g.d <= {WEDGE_CAP}
),
sh AS (
  SELECT a.dst AS node_a, b.dst AS node_b, CAST(count(*) AS BIGINT) AS ns
  FROM wsrc a JOIN wsrc b ON a.src = b.src AND a.dst < b.dst
  GROUP BY 1, 2
)
SELECT CAST(sh.node_a AS BIGINT) AS node_a,
       CAST(sh.node_b AS BIGINT) AS node_b,
       sh.ns AS n_shared,
       {ratio} AS jaccard
FROM sh
JOIN deg da ON da.src = sh.node_a
JOIN deg db ON db.src = sh.node_b
WHERE {ratio} >= {_S2_JACCARD_THRESHOLD}
ORDER BY node_a, node_b
"""


QUERIES["graph_part_neighbor_jaccard_capped"] = (
    graph_part_neighbor_jaccard_capped,
    _graph_neighbor_jaccard_capped_oracle(),
)


def graph_part_wedge_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wedge-cap audit (operators/graph.py::wedge_overflow): every
    support-2 node whose degree exceeds WEDGE_CAP — i.e. every hub the
    capped jaccard excluded from wedge generation — with the C(deg, 2)
    wedge count the cap saved.  The observability half of the cap
    contract (fuzzy_phonetic_overflow / dedup_containment_overflow
    template): non-empty at both SFs on this graph (601 hubs at sf0.01,
    1 at sf0.1 — measured before registering), so the audit path is
    exercised by real data, not only by the constructed fixture."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_s2_edges(spark, sf_dir)
    return (
        graph.wedge_overflow(edges, wedge_cap=graph.WEDGE_CAP)
        .select(F.col("node").cast("long").alias("node"), "deg", "wedges_skipped")
        .orderBy("node")
    )


def _graph_wedge_overflow_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import WEDGE_CAP

    return f"""
WITH {_GRAPH_S2_EDGES_SQL},
sym AS (SELECT src, dst FROM s2edges
        UNION ALL SELECT dst, src FROM s2edges),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src)
SELECT CAST(src AS BIGINT) AS node, deg,
       CAST(deg * (deg - 1) / 2 AS BIGINT) AS wedges_skipped
FROM deg WHERE deg > {WEDGE_CAP} ORDER BY node
"""


QUERIES["graph_part_wedge_overflow"] = (
    graph_part_wedge_overflow,
    _graph_wedge_overflow_oracle(),
)


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    estimate): for every (from_type, to_type) pair, the count of
    consecutive same-user transitions and its probability among the
    from-type's outgoing transitions — the session-flow statistic
    behind funnel design and next-action models. One lag window per
    user (ts, event_id tiebreak — same ordering contract as
    user_activity_gaps) + one keyed agg + one from-type window for the
    denominator; probability rounds once at the end (counts are exact
    integers)."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.withColumn(
        "next_type", F.lead("event_type", 1).over(w)
    ).where(F.col("next_type").isNotNull())
    counts = steps.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        hround(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    ).orderBy("from_type", "to_type")


EVENTS_TRANSITION_MATRIX_SQL = f"""
WITH steps AS (
  SELECT event_type AS from_type,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM steps WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       {hround_sql("n / SUM(n) OVER (PARTITION BY from_type)", 6)} AS p
FROM counts
ORDER BY from_type, to_type
"""

QUERIES["events_transition_matrix"] = (
    events_transition_matrix,
    EVENTS_TRANSITION_MATRIX_SQL,
)


def graph_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing convergence audit for the PageRank loop
    (operators/graph.py::pagerank_l1_trajectory): per iteration, the L1
    distance in rank nano-units between successive fixed-point
    iterates. A fixed iteration count without a trajectory is an act of
    faith; here a damped-walk regression (wrong degree join, dropped
    base term, oscillation) shows up as a non-shrinking tail, and since
    every quantity is an integer the oracle comparison is exact. NOTE:
    registered this round but deliberately OUTSIDE the full round-8
    driver window (slots exactly full); it leads tier 0 in round 9 —
    the r7-spillover precedent — and carries REPLICA_r8.json rows at
    both SFs meanwhile."""
    from pos_pipeline_core_etl_spark.operators import graph

    edges = _graph_edges(spark, sf_dir)
    return graph.pagerank_l1_trajectory(edges).orderBy("iter")


def _graph_convergence_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.graph import PAGERANK_ITERS

    pr = _graph_pagerank_oracle()
    # reuse the unrolled rk0..rkN chain from the pagerank oracle: strip
    # its final SELECT and aggregate successive deltas instead
    chain = pr[: pr.rindex("SELECT CAST(node AS BIGINT)")]
    legs = "\nUNION ALL\n".join(
        f"""SELECT CAST({i} AS BIGINT) AS iter,
       CAST(sum(abs(a.rank_q - b.rank_q)) AS BIGINT) AS l1_delta_q
FROM rk{i} a JOIN rk{i - 1} b ON b.node = a.node"""
        for i in range(1, PAGERANK_ITERS + 1)
    )
    return f"""{chain}{legs}
ORDER BY iter
"""


QUERIES["graph_pagerank_convergence"] = (
    graph_pagerank_convergence,
    _graph_convergence_oracle(),
)


# ---------------------------------------------------------------------------
# Hypertable-style cascading rollup (round 12)

ROLLUP_KMV_K = 16


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: day grain computed FROM the hour
    grain FROM the minute grain, never re-scanning raw — the
    TimescaleDB continuous-aggregate / materialized-rollup pattern,
    expressed as three cascaded mergeable aggregations.  The oracle
    computes the day grain DIRECTLY from raw, so the driver's value
    hash is the cross-engine proof that the cascade loses nothing:
    counts and sums re-aggregate exactly (associative), and the
    distinct-user leg rides a KMV sketch (k=16, binding at both SFs)
    merged hour→day by the ``kmv_merge_sketch`` rank argument instead
    of an unmergeable exact COUNT(DISTINCT).

    At 100 TB this is the load-bearing serving shape: the minute grain
    is materialized once per ingest window, coarser grains are
    re-aggregations of ~1440× fewer rows, and the only quantity that
    WOULD force a raw re-scan (distinct users) is carried as
    constant-size mergeable sketch state next to the exact counters.
    ``n_users_exact`` is reported alongside ``users_kmv`` so the
    estimator error is visible per cell, the honesty convention of
    ``sketch_kmv_distinct``."""
    ev = load_table(spark, sf_dir, "events")
    return rollup_cascade_frame(ev, ROLLUP_KMV_K)


def rollup_cascade_frame(ev: DataFrame, k: int = ROLLUP_KMV_K) -> DataFrame:
    """Frame-level cascade (shared by the registered query and the
    streaming maintainer's stream ≡ batch test — one assembly, so the
    two paths cannot drift)."""
    from pyspark.sql import Window

    from pos_pipeline_core_etl_spark.operators.sketches import (
        h60,
        kmv_estimate_col,
    )

    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute"), "event_type"
    ).agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
    hour = minute.groupBy(
        F.date_trunc("hour", "minute").alias("hour"), "event_type"
    ).agg(F.sum("cnt").alias("cnt"), F.sum("sv").alias("sv"))
    day = hour.groupBy(
        F.to_date("hour").alias("day"), "event_type"
    ).agg(F.sum("cnt").alias("n_events"), F.sum("sv").alias("sv"))

    hashed = (
        ev.where(F.col("user_id").isNotNull())
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            h60(F.col("user_id").cast("string")).alias("h"),
        )
        .distinct()
    )
    per_hour = (
        hashed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("day", "event_type", "hour").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= k)
        .drop("rn", "hour")
        .distinct()  # same user may survive in several hour sketches
    )
    merged = per_hour.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("day", "event_type").orderBy("h")),
    ).filter(F.col("rn") <= k)
    sk_day = merged.groupBy("day", "event_type").agg(
        F.count("*").alias("n_vals"), F.max("h").alias("h_k")
    )
    exact_users = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count_distinct("user_id").alias("n_users_exact"))

    return (
        day.join(exact_users, ["day", "event_type"])
        .join(sk_day, ["day", "event_type"])
        .select(
            "day",
            "event_type",
            "n_events",
            hround(F.col("sv"), 2).alias("sum_value"),
            "n_users_exact",
            kmv_estimate_col(
                F.col("n_vals"), F.col("h_k"), k
            ).alias("users_kmv"),
        )
    )


def _rollup_cascade_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.sketches import (
        H60_SQL,
        kmv_estimate_sql,
    )

    k = ROLLUP_KMV_K
    h = H60_SQL.format(s="CAST(user_id AS VARCHAR)")
    return f"""
WITH hashed AS MATERIALIZED (
  SELECT DISTINCT CAST(ts AS DATE) AS day, event_type, {h} AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT day, event_type, h,
         row_number() OVER (PARTITION BY day, event_type ORDER BY h) AS rn
  FROM hashed
),
sk AS (
  SELECT day, event_type, count(*) AS n_vals, max(h) AS h_k
  FROM ranked WHERE rn <= {k} GROUP BY 1, 2
),
agg AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         count(*) AS n_events,
         {hround_sql("SUM(value)", 2)} AS sum_value,
         count(DISTINCT user_id) AS n_users_exact
  FROM events GROUP BY 1, 2
)
SELECT a.day, a.event_type, a.n_events, a.sum_value, a.n_users_exact,
       {kmv_estimate_sql("s.n_vals", "s.h_k", k)} AS users_kmv
FROM agg a JOIN sk s ON s.day = a.day AND s.event_type = a.event_type
ORDER BY 1, 2
"""


QUERIES["events_rollup_cascade"] = (
    events_rollup_cascade,
    _rollup_cascade_oracle(),
)


# ---------------------------------------------------------------------------
# MAD anomalies, histogram-sketch twin (round 12)

MAD_HIST_BUCKETS = 256


def events_mad_anomalies_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale twin ``events_mad_anomalies``'s docstring promised:
    median and MAD from per-group HISTOGRAM SKETCHES instead of exact
    percentiles (round 12).  The exact twin's two grouped ``percentile``
    aggs buffer each group's values; this form's state is
    groups × 256 integer counters — mergeable, bounded, and (unlike the
    ``percentile_approx`` swap the docstring originally named) BIT-EXACT
    cross-engine, so the oracle checks values, not a tolerance envelope.

    Two chained sketches: per-type median of ``value``, then per-type
    median of ``|value − med_est|`` — the composition a 100 TB robust
    scorer runs.  ``med_est``/``mad_est`` are bucket-boundary estimates
    (reported per row, the honesty convention), so the flagged set is
    the sketch's OWN decision, oracle-checked — not an approximation of
    the exact twin's set; both twins stay registered side by side.
    The per-type broadcast hints are bounded by the events data model
    (enum event_type), as in the exact twin; the MAD=0 guard carries
    over unchanged."""
    from pos_pipeline_core_etl_spark.operators.sketches import (
        hist_quantiles_grouped,
    )

    events = load_table(spark, sf_dir, "events")
    med = hist_quantiles_grouped(
        events,
        "event_type",
        "value",
        probs=(0.5,),
        buckets=MAD_HIST_BUCKETS,
        broadcast_bounds=True,
    ).select("event_type", F.col("q_estimate").alias("med"))
    dev = events.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = hist_quantiles_grouped(
        dev,
        "event_type",
        "adev",
        probs=(0.5,),
        buckets=MAD_HIST_BUCKETS,
        broadcast_bounds=True,
    ).select("event_type", F.col("q_estimate").alias("mad"))
    scored = dev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        hround(F.col("value"), 2).alias("value"),
        F.col("med").alias("med_est"),
        F.col("mad").alias("mad_est"),
        hround(
            F.when(
                F.col("mad") != 0,
                F.lit(MAD_CONSISTENCY)
                * (F.col("value") - F.col("med"))
                / F.col("mad"),
            ),
            6,
        ).alias("robust_z"),
    )
    return scored.where(F.abs(F.col("robust_z")) > MAD_THRESHOLD)


def _hist_grouped_median_cte(
    tag: str, src: str, group_expr: str, val_expr: str
) -> str:
    """Per-group histogram-median CTE chain (mirrors
    ``sketches.hist_quantiles_grouped`` at p = 0.5): emits CTE ``{tag}``
    with (g, q) — used twice by the MAD oracle, once per sketch."""
    B = MAD_HIST_BUCKETS
    return f"""{tag}_vals AS (
  SELECT {group_expr} AS g, CAST({val_expr} AS DOUBLE) AS v
  FROM {src} WHERE {val_expr} IS NOT NULL AND {group_expr} IS NOT NULL
),
{tag}_bounds AS (
  SELECT g, min(v) AS mn, max(v) AS mx, count(*) AS n
  FROM {tag}_vals GROUP BY 1
),
{tag}_hist AS MATERIALIZED (
  SELECT {tag}_vals.g AS g,
         CASE WHEN mx = mn THEN 0
              ELSE GREATEST(0, LEAST({B - 1},
                         CAST(floor((v - mn) / (mx - mn)
                                    * {float(B)}) AS BIGINT)))
         END AS b,
         mn, mx, n, count(*) AS cnt
  FROM {tag}_vals JOIN {tag}_bounds ON {tag}_vals.g = {tag}_bounds.g
  GROUP BY 1, 2, 3, 4, 5
),
{tag}_cum AS MATERIALIZED (
  SELECT *, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cum
  FROM {tag}_hist
),
{tag}_cut AS (
  SELECT g, min(b) AS bucket
  FROM {tag}_cum WHERE cum >= CAST(ceil(0.5 * n) AS BIGINT)
  GROUP BY 1
),
{tag} AS (
  SELECT c.g,
         {hround_sql(f"mn + (c.bucket + 1) * (mx - mn) / {float(B)}", 6)} AS q
  FROM {tag}_cut c
  JOIN {tag}_cum m ON c.g = m.g AND c.bucket = m.b
)"""


def _mad_hist_oracle() -> str:
    med = _hist_grouped_median_cte("med", "events", "event_type", "value")
    dev_src = """dev AS (
  SELECT e.event_id, e.event_type, e.value, m.q AS med,
         abs(e.value - m.q) AS adev
  FROM events e JOIN med m ON m.g = e.event_type
  WHERE e.value IS NOT NULL
)"""
    mad = _hist_grouped_median_cte("mad", "dev", "event_type", "adev")
    z = f"{MAD_CONSISTENCY} * (d.value - d.med) / md.q"
    return f"""
WITH {med},
{dev_src},
{mad}
SELECT d.event_id, d.event_type,
       {hround_sql("d.value", 2)} AS value,
       d.med AS med_est,
       md.q AS mad_est,
       {hround_sql(z, 6)} AS robust_z
FROM dev d JOIN mad md ON md.g = d.event_type
WHERE md.q <> 0 AND abs({hround_sql(z, 6)}) > {MAD_THRESHOLD}
"""


QUERIES["events_mad_anomalies_hist"] = (
    events_mad_anomalies_hist,
    _mad_hist_oracle(),
)
