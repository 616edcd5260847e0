"""Core relational operator queries (SURVEY §2.2-§2.8 coverage).

Each entry pairs a Spark DataFrame plan with its ANSI-SQL oracle (run by
the driver under DuckDB on the same parquet). Aliases match on both
sides; money aggregates are rounded with the shared cross-engine helper
(``functions.rounding``) so value-hashes agree bit-for-bit.

Scale notes per query are in the docstrings — the guiding rules:
filters/projections push to the parquet scan, small dims broadcast,
aggregations are single-shuffle with map-side partials, and nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.operators.common import ensure_parallelism
from pos_pipeline_core_etl_spark.operators import dedup as dedup_ops
from pos_pipeline_core_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# scan / filter / project


def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushdown probe: predicate + column pruning reach the parquet scan.

    ``explain("formatted")`` shows PushedFilters for all three predicates
    and a ReadSchema of exactly 6 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 40)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            hround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        )
    )


SCAN_FILTER_PROJECT_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity,
       {hround_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_returnflag IN ('A', 'R')
  AND l_quantity BETWEEN 10 AND 40
"""


# ---------------------------------------------------------------------------
# aggregation (TPC-H Q1 shape — the bench headline)


def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: one shuffle on a 6-group key, all aggs map-side partial."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            hround(F.sum("l_quantity"), 2).alias("sum_qty"),
            hround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            hround(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            hround(F.avg("l_quantity"), 4).alias("avg_qty"),
            hround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            hround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


AGG_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {hround_sql("SUM(l_quantity)", 2)} AS sum_qty,
       {hround_sql("SUM(l_extendedprice)", 2)} AS sum_base_price,
       {hround_sql("SUM(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
       {hround_sql("SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
       {hround_sql("AVG(l_quantity)", 4)} AS avg_qty,
       {hround_sql("AVG(l_extendedprice)", 4)} AS avg_price,
       {hround_sql("AVG(l_discount)", 4)} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# joins


def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by region: fact joins only broadcast-able dims — zero
    shuffle on the fact until the final 5-group aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


JOIN_BROADCAST_DIMS_SQL = f"""
SELECT r.r_name,
       {hround_sql("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


def join_bigbig_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: lineitem ⋈ orders ⋈ customer — the two FACT-sized
    sides co-shuffle on the join key (sort-merge / shuffled-hash chosen
    by AQE from runtime sizes; at this SF orders still broadcasts, at
    100 TB the same plan degrades gracefully to SMJ on l_orderkey).
    Filters push into both scans before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        li.where(F.col("l_shipdate") > F.lit("1995-03-15"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1995-03-15")),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(customer, orders.o_custkey == customer.c_custkey)
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(
            hround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


JOIN_BIGBIG_REVENUE_SQL = f"""
SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
       {hround_sql("SUM(l.l_extendedprice * (1 - l.l_discount))", 2)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_shipdate > TIMESTAMP '1995-03-15'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
"""


def join_left_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + existence flag with null→False coalesce — the
    eliminated-payments join shape (payments_cleaner.py:598-651)."""
    orders = load_table(spark, sf_dir, "orders")
    flagged = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rk"))
        .distinct()
    )
    return (
        orders.join(flagged, orders.o_orderkey == flagged.rk, "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("rk").isNotNull().alias("has_returns"),
        )
    )


JOIN_LEFT_FLAG_SQL = """
SELECT o.o_orderkey, o.o_orderstatus, (r.rk IS NOT NULL) AS has_returns
FROM orders o
LEFT JOIN (SELECT DISTINCT l_orderkey AS rk FROM lineitem WHERE l_returnflag = 'R') r
  ON o.o_orderkey = r.rk
"""


def join_validity_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2-style range join: point-in-interval lookup against a tiny
    validity-windowed dimension (branches.py:60-126 analog). The dim is
    broadcast, so the range predicate never shuffles the fact."""
    orders = load_table(spark, sf_dir, "orders")
    eras = spark.createDataFrame(
        [
            ("ERA1", "1992-01-01", "1994-12-31"),
            ("ERA2", "1995-01-01", "1996-12-31"),
            ("ERA3", "1997-01-01", None),
        ],
        "era string, valid_from string, valid_to string",
    ).select(
        "era",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    d = F.col("o_orderdate").cast("date")
    joined = orders.join(
        F.broadcast(eras),
        (d >= eras.valid_from) & (eras.valid_to.isNull() | (d <= eras.valid_to)),
        "left",
    )
    return joined.groupBy("era").agg(
        F.count(F.lit(1)).alias("n_orders"),
        hround(F.sum("o_totalprice"), 2).alias("total"),
    )


JOIN_VALIDITY_WINDOW_SQL = f"""
WITH eras(era, valid_from, valid_to) AS (
  VALUES ('ERA1', DATE '1992-01-01', DATE '1994-12-31'),
         ('ERA2', DATE '1995-01-01', DATE '1996-12-31'),
         ('ERA3', DATE '1997-01-01', NULL)
)
SELECT e.era, COUNT(*) AS n_orders, {hround_sql("SUM(o.o_totalprice)", 2)} AS total
FROM orders o
LEFT JOIN eras e
  ON CAST(o.o_orderdate AS DATE) >= e.valid_from
 AND (e.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) <= e.valid_to)
GROUP BY e.era
"""


def join_validity_window_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same point-in-interval lookup through the SCALE path: month-bucket
    equi-join (``operators.intervals.bucketed_range_join``) instead of a
    broadcast nested-loop range predicate. Every order date falls inside
    exactly one era, so inner containment equals the left join and the
    oracle is shared with ``join_validity_window``."""
    from pos_pipeline_core_etl_spark.operators.intervals import bucketed_range_join

    orders = load_table(spark, sf_dir, "orders")
    eras = spark.createDataFrame(
        [
            ("ERA1", "1992-01-01", "1994-12-31"),
            ("ERA2", "1995-01-01", "1996-12-31"),
            ("ERA3", "1997-01-01", None),
        ],
        "era string, valid_from string, valid_to string",
    ).select(
        "era",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    joined = bucketed_range_join(orders, "o_orderdate", eras)
    return joined.groupBy("era").agg(
        F.count(F.lit(1)).alias("n_orders"),
        hround(F.sum("o_totalprice"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# count-distinct family


def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain, filtered, and conditional count-distincts per group
    (payments_daily.py:426-451 analog)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct(
            F.when(F.col("o_orderstatus") == "F", F.col("o_custkey"))
        ).alias("n_customers_finished"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_COUNT_DISTINCT_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_customers_finished,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# dedup / duplicate detection


def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: per customer keep the highest-value order
    (tie-break lowest key). The reference's ``drop_duplicates`` is
    order-dependent (SURVEY §7.4.3); a rank window makes it exact."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


DEDUP_KEEP_FIRST_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) = 1
"""


def duplicate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grain-violation probe: keys appearing more than once
    (qa_payments.py:470-505 analog over (custkey, orderdate))."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


DUPLICATE_DETECTION_SQL = """
SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# sorts / limits


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K with a total tie-break → deterministic result set.
    Spark plans this as TakeOrderedAndProject (no full sort shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(20)
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority via rank window (common OLAP pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    )


TOPK_PER_GROUP_SQL = """
SELECT o_orderpriority, ROW_NUMBER() OVER (
         PARTITION BY o_orderpriority
         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
       o_orderkey, o_totalprice
FROM orders
QUALIFY rnk <= 3
"""


# ---------------------------------------------------------------------------
# set operations


def set_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in 1995 but not 1996 — left_anti join (the
    reference's set-minus on keys, sales_by_group.py:540 analog)."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
    y96 = orders.where(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    return y95.join(y96, "o_custkey", "left_anti")


SET_EXCEPT_KEYS_SQL = """
SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
EXCEPT
SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
"""


def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with differing column order + missing-column null fill
    (pandas concat alignment semantics, SURVEY §2.8)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_totalprice", F.lit("closed").alias("bucket")
    )
    b = orders.where(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("bucket"), "o_orderkey"
    )
    return a.unionByName(
        b.withColumn("o_totalprice", F.lit(None).cast("double")),
        allowMissingColumns=True,
    )


UNION_BY_NAME_SQL = """
SELECT o_orderkey, o_totalprice, 'closed' AS bucket
FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, 'open' AS bucket
FROM orders WHERE o_orderstatus = 'O'
"""


# ---------------------------------------------------------------------------
# pivot / unpivot


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() over a FIXED value universe — static schema, so
    Catalyst compiles it to one pass of conditional aggregates (no extra
    distinct-values job, which at 100 TB would be a full scan)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
        .na.fill(0.0, ["F", "O", "P"])
    )
    return piv.select(
        "o_orderpriority",
        hround(F.col("F"), 2).alias("total_f"),
        hround(F.col("O"), 2).alias("total_o"),
        hround(F.col("P"), 2).alias("total_p"),
    )


PIVOT_STATUS_BY_PRIORITY_SQL = f"""
SELECT o_orderpriority,
       {hround_sql("COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0)", 2)} AS total_f,
       {hround_sql("COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0)", 2)} AS total_o,
       {hround_sql("COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0)", 2)} AS total_p
FROM orders
GROUP BY o_orderpriority
"""


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long via stack() (the reference's melt, sales_by_group.py:305-325)."""
    wide = agg_pricing_summary(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price"
    )
    return wide.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "stack(3, 'sum_qty', sum_qty, 'sum_base_price', sum_base_price, "
        "'sum_disc_price', sum_disc_price) AS (measure, value)",
    )


UNPIVOT_MEASURES_SQL = f"""
WITH wide AS (
  SELECT l_returnflag, l_linestatus,
         {hround_sql("SUM(l_quantity)", 2)} AS sum_qty,
         {hround_sql("SUM(l_extendedprice)", 2)} AS sum_base_price,
         {hround_sql("SUM(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, l_linestatus, 'sum_base_price', sum_base_price FROM wide
UNION ALL
SELECT l_returnflag, l_linestatus, 'sum_disc_price', sum_disc_price FROM wide
"""


# ---------------------------------------------------------------------------
# rollups


def monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month truncation + re-aggregation (qa_payments.py:744-774 analog)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_orderpriority",
            F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("year_month"),
        )
        .agg(
            hround(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


MONTHLY_ROLLUP_SQL = f"""
SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS year_month,
       {hround_sql("SUM(o_totalprice)", 2)} AS total, COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2
"""


def grand_totals_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit TOTAL labels (marts/transfers.py:237-239
    TOTAL row/col analog) — one pass instead of agg + union."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority")
        .agg(hround(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("TOTAL")).alias("o_orderpriority"),
            "total",
        )
    )


GRAND_TOTALS_ROLLUP_SQL = f"""
SELECT COALESCE(o_orderpriority, 'TOTAL') AS o_orderpriority,
       {hround_sql("SUM(o_totalprice)", 2)} AS total
FROM orders
GROUP BY ROLLUP (o_orderpriority)
"""


# ---------------------------------------------------------------------------
# horizontal (row-wise) sums


def horizontal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise Σ across measure columns (qa_payments.py:172-185 analog)
    — pure column arithmetic, stays in codegen."""
    piv = pivot_status_by_priority(spark, sf_dir)
    return piv.withColumn(
        "grand_total",
        hround(F.col("total_f") + F.col("total_o") + F.col("total_p"), 2),
    )


HORIZONTAL_SUM_SQL = f"""
WITH piv AS ({PIVOT_STATUS_BY_PRIORITY_SQL})
SELECT *, {hround_sql("total_f + total_o + total_p", 2)} AS grand_total FROM piv
"""


# ---------------------------------------------------------------------------
# value mode (most-frequent with deterministic tie-break)


def value_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent return flag per line status — the sucursal-fallback
    mode computation (payments_cleaner.py:221-249), tie-broken by value
    for determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_linestatus", "l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_linestatus").orderBy(F.col("n").desc(), F.col("l_returnflag").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_linestatus", F.col("l_returnflag").alias("mode_flag"), "n")
    )


VALUE_MODE_SQL = """
SELECT l_linestatus, l_returnflag AS mode_flag, COUNT(*) AS n
FROM lineitem
GROUP BY l_linestatus, l_returnflag
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY l_linestatus ORDER BY COUNT(*) DESC, l_returnflag ASC) = 1
"""


def scd2_orders_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension snapshot derived from a change log — the query
    shape behind ``operators/upsert.py::scd2_apply``, here built in one
    pass from history: treating each customer's orders as versioned
    attribute changes (tracked value: o_totalprice), every version gets
    ``valid_from`` = its own date and ``valid_to`` = the next version's
    date (NULL = current). ``is_current`` marks the open row.

    Scale: ONE shuffle on the dimension key (custkey); the lead() window
    partitions by the same key, so versions-per-key bounds the window —
    never a global sort. This is the standard "rebuild SCD-2 from CDC
    history" plan at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").cast("long").alias("custkey"),
        F.col("o_orderkey").cast("long").alias("orderkey"),
        hround(F.col("o_totalprice"), 2).alias("tracked_value"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.lead("o_orderdate").over(w).isNull().alias("is_current"),
    )


SCD2_ORDERS_SNAPSHOT_SQL = f"""
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(o_orderkey AS BIGINT) AS orderkey,
       {hround_sql("o_totalprice", 2)} AS tracked_value,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER w AS valid_to,
       LEAD(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


QUERIES: dict[str, tuple] = {
    "scan_filter_project": (scan_filter_project, SCAN_FILTER_PROJECT_SQL),
    "agg_pricing_summary": (agg_pricing_summary, AGG_PRICING_SUMMARY_SQL),
    "join_broadcast_dims": (join_broadcast_dims, JOIN_BROADCAST_DIMS_SQL),
    "join_bigbig_revenue": (join_bigbig_revenue, JOIN_BIGBIG_REVENUE_SQL),
    "join_left_flag": (join_left_flag, JOIN_LEFT_FLAG_SQL),
    "join_validity_window": (join_validity_window, JOIN_VALIDITY_WINDOW_SQL),
    "join_validity_window_bucketed": (
        join_validity_window_bucketed,
        JOIN_VALIDITY_WINDOW_SQL,
    ),
    "agg_count_distinct": (agg_count_distinct, AGG_COUNT_DISTINCT_SQL),
    "dedup_keep_first": (dedup_keep_first, DEDUP_KEEP_FIRST_SQL),
    "duplicate_detection": (duplicate_detection, DUPLICATE_DETECTION_SQL),
    "topk_orders": (topk_orders, TOPK_ORDERS_SQL),
    "topk_per_group": (topk_per_group, TOPK_PER_GROUP_SQL),
    "set_except_keys": (set_except_keys, SET_EXCEPT_KEYS_SQL),
    "union_by_name": (union_by_name, UNION_BY_NAME_SQL),
    "pivot_status_by_priority": (pivot_status_by_priority, PIVOT_STATUS_BY_PRIORITY_SQL),
    "unpivot_measures": (unpivot_measures, UNPIVOT_MEASURES_SQL),
    "monthly_rollup": (monthly_rollup, MONTHLY_ROLLUP_SQL),
    "grand_totals_rollup": (grand_totals_rollup, GRAND_TOTALS_ROLLUP_SQL),
    "horizontal_sum": (horizontal_sum, HORIZONTAL_SUM_SQL),
    "value_mode": (value_mode, VALUE_MODE_SQL),
    "scd2_orders_snapshot": (scd2_orders_snapshot, SCD2_ORDERS_SNAPSHOT_SQL),
}


# ---------------------------------------------------------------------------
# fuzzy-key entity resolution (round 6) — deletion-neighborhood blocking


def _fuzzy_variant_cte(where: str = "") -> str:
    """Shared k/v CTE text for the fuzzy oracles: keys + exploded D1
    deletion variants. ONE definition (the Spark twin is
    operators/fuzzy.py::deletion_variants_col) so the three oracles can
    never drift from each other or the operator."""
    return f"""k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer{where}
),
v AS (
  SELECT id, nm, unnest(CASE WHEN length(nm) = 0 THEN [nm]
    ELSE list_distinct(list_prepend(nm,
      list_transform(generate_series(1, length(nm)),
                     i -> substr(nm, 1, i - 1) || substr(nm, i + 1))))
    END) AS variant
  FROM k
)"""


def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within edit distance 1, via FastSS/SymSpell
    deletion-variant blocking + exact levenshtein verify on candidates
    only (operators/fuzzy.py). The synthetic names differ in single
    digits, so the fixture is dense in true typo-pairs."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    # r12 (guide §2.5/§1): the raw single-file customer scan otherwise
    # runs the ~L-per-key variant explode on ONE task (measured: 12
    # tasks / 6.7 executor-seconds on 32 cores); the guard spreads the
    # scan before the explode.  Applied at the query layer, not inside
    # fuzzy_key_pairs — on composed inputs the inserted repartition
    # broke exchange reuse and cost more than it spread (measured on
    # fuzzy_part_entities_final: executor time 7.6 -> 12.9 s).
    cust = ensure_parallelism(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key="c_custkey",
    )
    return fuzzy.fuzzy_key_pairs(cust, "c_custkey", "c_name", max_distance=1)


def _fuzzy_pairs_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH {_fuzzy_variant_cte()},
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS key_a, b.nm AS key_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
FROM cands
WHERE levenshtein(key_a, key_b) <= 1
"""


QUERIES["fuzzy_customer_pairs"] = (fuzzy_customer_pairs, _fuzzy_pairs_oracle())


def fuzzy_customer_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-variant audit for the blocking stage: every deletion variant
    shared by more keys than the bucket cap."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = ensure_parallelism(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key="c_custkey",
    )  # r12: single-file-scan explode guard, see fuzzy_customer_pairs
    df = fuzzy.fuzzy_key_overflow(cust, "c_custkey", "c_name")
    return df.select("variant", F.col("n_keys").cast("long").alias("n_keys"))


def _fuzzy_overflow_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH {_fuzzy_variant_cte()}
SELECT variant, CAST(count(*) AS BIGINT) AS n_keys
FROM v GROUP BY variant
HAVING count(*) > {FUZZY_MAX_BUCKET}
"""


QUERIES["fuzzy_customer_overflow"] = (
    fuzzy_customer_overflow,
    _fuzzy_overflow_oracle(),
)


def fuzzy_customer_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing recall audit for the deletion-variant blocking: on the
    bounded subset (c_custkey < 300), ground-truth distance-≤1 pairs
    from brute-force levenshtein vs pairs the index recovered. The
    FastSS identity guarantees TOTAL recall while no variant bucket
    overflows, so the oracle hard-codes n_matched = n_true per
    distance — any blocking regression hash-fails the driver check
    (the dedup_simhash_recall discipline for the fuzzy family)."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    a = cust.alias("a")
    b = cust.alias("b")
    truth = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .where(F.levenshtein("a.c_name", "b.c_name") <= 1)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein("a.c_name", "b.c_name").cast("long").alias("dist"),
        )
    )
    idx = fuzzy.fuzzy_key_pairs(cust, "c_custkey", "c_name").select(
        F.col("id_a").alias("i_a"), F.col("id_b").alias("i_b")
    )
    joined = truth.join(
        idx,
        (F.col("id_a") == F.col("i_a")) & (F.col("id_b") == F.col("i_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("i_a").isNotNull().cast("long")).alias("n_matched"),
        )
        .orderBy("dist")
    )


FUZZY_CUSTOMER_RECALL_SQL = """
WITH k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer WHERE c_custkey < 300
),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 1
)
SELECT dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(*) AS BIGINT) AS n_matched
FROM truth
GROUP BY dist
ORDER BY dist
"""

QUERIES["fuzzy_customer_recall"] = (fuzzy_customer_recall, FUZZY_CUSTOMER_RECALL_SQL)


def fuzzy_customer_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution survivorship on the bounded audit subset
    (c_custkey < 300): fuzzy distance-1 pairs → connected components →
    every customer labeled with its canonical entity id (min key in
    the cluster; singletons are their own entity). The full
    blocking → verify → cluster → survive pipeline a master-data /
    customer-dedup job ships. Scale shape: the Spark side is the
    iterative min-label propagation (linear work per round,
    localCheckpoint per iteration — operators/dedup.py::
    connected_components); the bound exists because the RECURSIVE
    oracle's reachability set is quadratic in component size and the
    digit-substitution name graph forms one giant component —
    components at corpus scale run through the operator, never a
    recursive CTE."""
    from pos_pipeline_core_etl_spark.operators import dedup as dedup_ops
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    pairs = fuzzy.fuzzy_key_pairs(cust, "c_custkey", "c_name").select(
        "id_a", "id_b"
    )
    comps = dedup_ops.connected_components(pairs, src="id_a", dst="id_b")
    return (
        cust.join(
            comps.select(
                F.col("id").alias("c_custkey"),
                F.col("component_id").alias("entity_id"),
            ),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            F.coalesce(F.col("entity_id"), F.col("c_custkey"))
            .cast("long")
            .alias("entity_id"),
            (
                F.coalesce(F.col("entity_id"), F.col("c_custkey"))
                == F.col("c_custkey")
            ).alias("is_canonical"),
        )
        .orderBy("c_custkey")
    )


def _fuzzy_entities_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH RECURSIVE
{_fuzzy_variant_cte(" WHERE c_custkey < 300")},
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 1
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.lbl FROM reach JOIN sym s ON s.a = reach.id
),
comp AS (SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY id)
SELECT k.id AS c_custkey,
       CAST(COALESCE(c.component_id, k.id) AS BIGINT) AS entity_id,
       COALESCE(c.component_id, k.id) = k.id AS is_canonical
FROM k LEFT JOIN comp c ON c.id = k.id
ORDER BY k.id
"""


QUERIES["fuzzy_customer_entities"] = (
    fuzzy_customer_entities,
    _fuzzy_entities_oracle(),
)


# ---------------------------------------------------------------------------
# delete-2 fuzzy blocking (round 7) — two-character typos, VERDICT r6 #4


# DuckDB list expression for the D≤2 deletion neighborhood of column
# ``nm`` — the SQL twin of operators/fuzzy.py::deletion_variants_col
# (depth=2), shared by every depth-2 oracle so they cannot drift.
_D2_VARIANT_LIST_SQL = """CASE WHEN length(nm) = 0 THEN [nm]
    ELSE list_distinct(list_prepend(nm, list_concat(
      list_transform(generate_series(1, length(nm)),
                     i -> substr(nm, 1, i - 1) || substr(nm, i + 1)),
      flatten(list_transform(generate_series(1, length(nm) - 1),
        i -> list_transform(generate_series(i + 1, length(nm)),
          j -> substr(nm, 1, i - 1) || substr(nm, i + 1, j - i - 1)
               || substr(nm, j + 1)))))))
    END"""


def _fuzzy_variant_d2_cte(where: str = "") -> str:
    """Shared k/v CTE for the depth-2 oracles: keys + exploded D≤2
    deletion variants (SQL twin of
    operators/fuzzy.py::deletion_variants_col(depth=2))."""
    return f"""k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer{where}
),
v AS (
  SELECT id, nm, unnest({_D2_VARIANT_LIST_SQL}) AS variant
  FROM k
)"""


def fuzzy_customer_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within edit distance 2 via depth-2 deletion
    neighborhoods (FastSS at d=2 — catches the two-character typos the
    d=1 pass misses, e.g. a substitution plus a dropped letter; the
    reference's accent-normalized fuzzy name matching —
    cleaning_utils.py:261-313 `remove_accents` /
    `normalize_spanish_name`, "suitable for fuzzy matching" — motivates
    exactly this tolerance). Same candidate-then-verify contract as d=1 with the
    larger FUZZY_D2_MAX_BUCKET cap: equivalence to brute force holds
    whenever no variant bucket overflows, and the overflow twin
    quantifies what was skipped (this digit-substituted fixture is
    deliberately dense, so some boilerplate variants DO overflow —
    honest capped semantics, the production knob). Cost model: explode
    factor 1 + L + L(L-1)/2 ≈ 172 at L=18, one keyed shuffle on the
    variant, JVM levenshtein on candidates only."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = ensure_parallelism(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key="c_custkey",
    )  # r12: single-file-scan explode guard, see fuzzy_customer_pairs
    return fuzzy.fuzzy_key_pairs(
        cust,
        "c_custkey",
        "c_name",
        max_distance=2,
        max_bucket_size=fuzzy.FUZZY_D2_MAX_BUCKET,
    )


def _fuzzy_pairs_d2_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_D2_MAX_BUCKET

    return f"""
WITH {_fuzzy_variant_d2_cte()},
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS key_a, b.nm AS key_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_D2_MAX_BUCKET}
)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
FROM cands
WHERE levenshtein(key_a, key_b) <= 2
"""


QUERIES["fuzzy_customer_pairs_d2"] = (
    fuzzy_customer_pairs_d2,
    _fuzzy_pairs_d2_oracle(),
)


def fuzzy_customer_overflow_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-variant audit for the depth-2 blocking stage: every D≤2
    variant shared by more keys than FUZZY_D2_MAX_BUCKET — exactly the
    buckets fuzzy_customer_pairs_d2 skipped."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = ensure_parallelism(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"),
        key="c_custkey",
    )  # r12: single-file-scan explode guard, see fuzzy_customer_pairs
    df = fuzzy.fuzzy_key_overflow(
        cust,
        "c_custkey",
        "c_name",
        max_bucket_size=fuzzy.FUZZY_D2_MAX_BUCKET,
        depth=2,
    )
    return df.select(
        "variant", F.col("n_keys").cast("long").alias("n_keys")
    ).orderBy("variant")


def _fuzzy_overflow_d2_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_D2_MAX_BUCKET

    return f"""
WITH {_fuzzy_variant_d2_cte()}
SELECT variant, CAST(count(DISTINCT id) AS BIGINT) AS n_keys
FROM v GROUP BY variant
HAVING count(DISTINCT id) > {FUZZY_D2_MAX_BUCKET}
ORDER BY variant
"""


QUERIES["fuzzy_customer_overflow_d2"] = (
    fuzzy_customer_overflow_d2,
    _fuzzy_overflow_d2_oracle(),
)


def fuzzy_customer_recall_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing recall audit for depth-2 blocking on the bounded subset
    (c_custkey < 300): brute-force distance-≤2 ground truth vs pairs the
    capped index recovered. On this subset no bucket the true pairs need
    exceeds FUZZY_D2_MAX_BUCKET (measured: total recall at 150), so the
    oracle hard-codes n_matched = n_true per distance — any regression
    in the depth-2 neighborhood construction or the cap hash-fails the
    driver check."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    a = cust.alias("a")
    b = cust.alias("b")
    truth = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .where(F.levenshtein("a.c_name", "b.c_name") <= 2)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein("a.c_name", "b.c_name").cast("long").alias("dist"),
        )
    )
    idx = fuzzy.fuzzy_key_pairs(
        cust,
        "c_custkey",
        "c_name",
        max_distance=2,
        max_bucket_size=fuzzy.FUZZY_D2_MAX_BUCKET,
    ).select(F.col("id_a").alias("i_a"), F.col("id_b").alias("i_b"))
    joined = truth.join(
        idx,
        (F.col("id_a") == F.col("i_a")) & (F.col("id_b") == F.col("i_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("i_a").isNotNull().cast("long")).alias("n_matched"),
        )
        .orderBy("dist")
    )


FUZZY_CUSTOMER_RECALL_D2_SQL = """
WITH k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer WHERE c_custkey < 300
),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(*) AS BIGINT) AS n_matched
FROM truth
GROUP BY dist
ORDER BY dist
"""

QUERIES["fuzzy_customer_recall_d2"] = (
    fuzzy_customer_recall_d2,
    FUZZY_CUSTOMER_RECALL_D2_SQL,
)


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking (round 7) — the bounded-output ER path


def fuzzy_customer_sorted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking over customer names (Hernández &
    Stolfo 1995; operators/fuzzy.py::sorted_neighborhood_pairs):
    candidates are rows within SN_WINDOW positions of the name sort
    order, exact levenshtein verify, distance ≤ 2 kept. The
    bounded-output complement to the deletion-variant family — its
    candidate count is window·n BY CONSTRUCTION, so the measured
    d2-on-dense-keys degenerate mode (231M output pairs,
    PERFORMANCE.md round-7 ladder) cannot occur; the price is
    sort-locality recall, pinned honestly by fuzzy_customer_sn_recall."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy.sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", max_distance=2
    ).orderBy("id_a", "id_b")


def _sorted_pairs_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import SN_WINDOW

    return f"""
WITH k AS (SELECT c_custkey AS id, c_name AS nm FROM customer),
ranked AS (
  SELECT id, nm, row_number() OVER (ORDER BY nm, id) AS rank FROM k
),
probes AS (
  SELECT a.id AS id_a, a.nm AS key_a, a.rank + u.j AS rank
  FROM ranked a, unnest(generate_series(1, {SN_WINDOW})) AS u(j)
),
joined AS (
  SELECT p.id_a, b.id AS id_b, p.key_a, b.nm AS key_b
  FROM probes p JOIN ranked b ON b.rank = p.rank
)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
FROM joined
WHERE levenshtein(key_a, key_b) <= 2
ORDER BY id_a, id_b
"""


QUERIES["fuzzy_customer_sorted_pairs"] = (
    fuzzy_customer_sorted_pairs,
    _sorted_pairs_oracle(),
)


def fuzzy_customer_sn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standing recall audit for sorted-neighborhood blocking on the
    bounded subset (c_custkey < 300): brute-force distance-≤2 truth vs
    SN-recovered pairs per distance. SN has NO totality guarantee (a
    typo in the first character sorts the key far away), so — like the
    containment audit — the oracle RECOMPUTES both sides and pins the
    measured recall; a window or ranking regression shifts n_matched
    and hash-fails the driver check."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    a = cust.alias("a")
    b = cust.alias("b")
    truth = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .where(F.levenshtein("a.c_name", "b.c_name") <= 2)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein("a.c_name", "b.c_name").cast("long").alias("dist"),
        )
    )
    got = fuzzy.sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", max_distance=2
    ).select(
        F.least("id_a", "id_b").alias("g_a"),
        F.greatest("id_a", "id_b").alias("g_b"),
    )
    joined = truth.join(
        got,
        (F.col("id_a") == F.col("g_a")) & (F.col("id_b") == F.col("g_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("g_a").isNotNull().cast("long")).alias("n_matched"),
        )
        .orderBy("dist")
    )


def _sn_recall_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import SN_WINDOW

    return f"""
WITH k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer WHERE c_custkey < 300
),
ranked AS (
  SELECT id, nm, row_number() OVER (ORDER BY nm, id) AS rank FROM k
),
probes AS (
  SELECT a.id AS id_a, a.nm AS key_a, a.rank + u.j AS rank
  FROM ranked a, unnest(generate_series(1, {SN_WINDOW})) AS u(j)
),
got AS (
  SELECT LEAST(p.id_a, b.id) AS g_a, GREATEST(p.id_a, b.id) AS g_b
  FROM probes p JOIN ranked b ON b.rank = p.rank
  WHERE levenshtein(p.key_a, b.nm) <= 2
),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT t.dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN g.g_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched
FROM truth t
LEFT JOIN (SELECT DISTINCT g_a, g_b FROM got) g
  ON g.g_a = t.id_a AND g.g_b = t.id_b
GROUP BY t.dist
ORDER BY t.dist
"""


QUERIES["fuzzy_customer_sn_recall"] = (
    fuzzy_customer_sn_recall,
    _sn_recall_oracle(),
)


def fuzzy_customer_sn2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pass sorted-neighborhood recall audit: per distance, truth
    count and how many pairs the single-pass (forward) vs two-pass
    (forward + reversed-key) blocking recovered — the measured value of
    the standard multi-pass recall fix, in one standing artifact. Output
    stays bounded at 2·window·n; the recall delta is whatever the data
    says (the oracle recomputes all three legs)."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name")
    )
    a = cust.alias("a")
    b = cust.alias("b")
    truth = (
        a.join(b, F.col("a.c_custkey") < F.col("b.c_custkey"))
        .where(F.levenshtein("a.c_name", "b.c_name") <= 2)
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            F.levenshtein("a.c_name", "b.c_name").cast("long").alias("dist"),
        )
    )
    one = fuzzy.sorted_neighborhood_pairs(
        cust, "c_custkey", "c_name", max_distance=2
    ).select(
        F.least("id_a", "id_b").alias("o_a"),
        F.greatest("id_a", "id_b").alias("o_b"),
    ).distinct()
    two = fuzzy.sorted_neighborhood_pairs_multi(
        cust, "c_custkey", "c_name", max_distance=2
    ).select(F.col("id_a").alias("t_a"), F.col("id_b").alias("t_b"))
    joined = truth.join(
        one,
        (F.col("id_a") == F.col("o_a")) & (F.col("id_b") == F.col("o_b")),
        "left",
    ).join(
        two,
        (F.col("id_a") == F.col("t_a")) & (F.col("id_b") == F.col("t_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("o_a").isNotNull().cast("long")).alias("n_matched_1pass"),
            F.sum(F.col("t_a").isNotNull().cast("long")).alias("n_matched_2pass"),
        )
        .orderBy("dist")
    )


def _sn2_recall_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import SN_WINDOW

    def pass_ctes(prefix: str, key_expr: str) -> str:
        return f"""{prefix}_ranked AS (
  SELECT id, nm, row_number() OVER (ORDER BY {key_expr}, id) AS rank FROM k
),
{prefix}_got AS (
  SELECT DISTINCT LEAST(p.id, b.id) AS g_a, GREATEST(p.id, b.id) AS g_b
  FROM (SELECT a.id, a.nm, a.rank + u.j AS rank
        FROM {prefix}_ranked a,
             unnest(generate_series(1, {SN_WINDOW})) AS u(j)) p
  JOIN {prefix}_ranked b ON b.rank = p.rank
  WHERE levenshtein(p.nm, b.nm) <= 2
)"""

    return f"""
WITH k AS (
  SELECT c_custkey AS id, c_name AS nm FROM customer WHERE c_custkey < 300
),
{pass_ctes("f", "nm")},
{pass_ctes("r", "reverse(nm)")},
two AS (SELECT g_a, g_b FROM f_got UNION SELECT g_a, g_b FROM r_got),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT t.dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN o.g_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched_1pass,
       CAST(sum(CASE WHEN w.g_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matched_2pass
FROM truth t
LEFT JOIN f_got o ON o.g_a = t.id_a AND o.g_b = t.id_b
LEFT JOIN two w ON w.g_a = t.id_a AND w.g_b = t.id_b
GROUP BY t.dist
ORDER BY t.dist
"""


QUERIES["fuzzy_customer_sn2_recall"] = (
    fuzzy_customer_sn2_recall,
    _sn2_recall_oracle(),
)


# ---------------------------------------------------------------------------
# attribute survivorship (round 7) — golden records, VERDICT r6 #6


def fuzzy_customer_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based golden records over the resolved entities (upgrades
    fuzzy_customer_entities' min-id canonicalization to real MDM
    survivorship): per entity, each attribute survives by its own rule
    with per-attribute provenance —

    - ``golden_name`` / ``golden_nationkey``: MOST RECENT non-null
      (c_custkey stands in for a record timestamp on this fixture;
      ``name_src`` / ``nation_src`` record the supplying member),
    - ``golden_mktsegment``: MODE across members (ties break to the
      lexicographically smallest segment; ``segment_src`` = smallest
      member id carrying the winning segment),
    - ``golden_acctbal``: MAX (``acctbal_src`` = smallest member id
      attaining it).

    Scale shape: one components run (shared with the entities query),
    then one window + two keyed aggs over members — per-attribute rules
    are conditional aggregates, never per-entity collects. Bounded to
    c_custkey < 300 for the same reason as the entities query (the
    RECURSIVE oracle's reachability set)."""
    from pos_pipeline_core_etl_spark.operators import dedup as dedup_ops
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    )
    pairs = fuzzy.fuzzy_key_pairs(cust, "c_custkey", "c_name").select(
        "id_a", "id_b"
    )
    comps = dedup_ops.connected_components(pairs, src="id_a", dst="id_b")
    members = cust.join(
        comps.select(
            F.col("id").alias("c_custkey"),
            F.col("component_id").alias("entity_id"),
        ),
        "c_custkey",
        "left",
    ).withColumn("entity_id", F.coalesce("entity_id", "c_custkey"))

    w = Window.partitionBy("entity_id")
    with_max = members.withColumn("max_bal", F.max("c_acctbal").over(w))
    recency = with_max.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max_by(
            "c_name",
            F.when(F.col("c_name").isNotNull(), F.col("c_custkey")),
        ).alias("golden_name"),
        F.max(
            F.when(F.col("c_name").isNotNull(), F.col("c_custkey"))
        ).alias("name_src"),
        F.max_by(
            "c_nationkey",
            F.when(F.col("c_nationkey").isNotNull(), F.col("c_custkey")),
        ).cast("long").alias("golden_nationkey"),
        F.max(
            F.when(F.col("c_nationkey").isNotNull(), F.col("c_custkey"))
        ).alias("nation_src"),
        F.max("c_acctbal").alias("golden_acctbal"),
        F.min(
            F.when(F.col("c_acctbal") == F.col("max_bal"), F.col("c_custkey"))
        ).alias("acctbal_src"),
    )
    seg_counts = members.groupBy("entity_id", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_seg"),
        F.min("c_custkey").alias("seg_min_id"),
    )
    ws = Window.partitionBy("entity_id").orderBy(
        F.col("n_seg").desc(), F.col("c_mktsegment").asc()
    )
    seg_win = (
        seg_counts.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") == 1)
        .select(
            "entity_id",
            F.col("c_mktsegment").alias("golden_mktsegment"),
            F.col("seg_min_id").alias("segment_src"),
        )
    )
    return (
        recency.join(seg_win, "entity_id")
        .select(
            F.col("entity_id").cast("long").alias("entity_id"),
            "n_members",
            "golden_name",
            "name_src",
            "golden_nationkey",
            "nation_src",
            "golden_mktsegment",
            "segment_src",
            "golden_acctbal",
            "acctbal_src",
        )
        .orderBy("entity_id")
    )


def _fuzzy_golden_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH RECURSIVE
{_fuzzy_variant_cte(" WHERE c_custkey < 300")},
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 1
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.lbl FROM reach JOIN sym s ON s.a = reach.id
),
comp AS (SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY id),
members0 AS (
  SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment,
         COALESCE(p.component_id, c.c_custkey) AS entity_id
  FROM customer c LEFT JOIN comp p ON p.id = c.c_custkey
  WHERE c.c_custkey < 300
),
members AS (
  SELECT *, MAX(c_acctbal) OVER (PARTITION BY entity_id) AS max_bal
  FROM members0
),
recency AS (
  SELECT entity_id,
         CAST(count(*) AS BIGINT) AS n_members,
         arg_max(c_name, CASE WHEN c_name IS NOT NULL
                              THEN c_custkey END) AS golden_name,
         MAX(CASE WHEN c_name IS NOT NULL THEN c_custkey END) AS name_src,
         CAST(arg_max(c_nationkey, CASE WHEN c_nationkey IS NOT NULL
                                        THEN c_custkey END) AS BIGINT)
           AS golden_nationkey,
         MAX(CASE WHEN c_nationkey IS NOT NULL THEN c_custkey END)
           AS nation_src,
         MAX(c_acctbal) AS golden_acctbal,
         MIN(CASE WHEN c_acctbal = max_bal THEN c_custkey END) AS acctbal_src
  FROM members
  GROUP BY entity_id
),
segs AS (
  SELECT entity_id, c_mktsegment, count(*) AS n_seg,
         MIN(c_custkey) AS seg_min_id
  FROM members GROUP BY entity_id, c_mktsegment
),
seg_pick AS (
  SELECT entity_id, c_mktsegment AS golden_mktsegment,
         seg_min_id AS segment_src,
         row_number() OVER (PARTITION BY entity_id
                            ORDER BY n_seg DESC, c_mktsegment ASC) AS rn
  FROM segs
)
SELECT CAST(r.entity_id AS BIGINT) AS entity_id, r.n_members,
       r.golden_name, r.name_src, r.golden_nationkey, r.nation_src,
       s.golden_mktsegment, s.segment_src, r.golden_acctbal, r.acctbal_src
FROM recency r JOIN seg_pick s ON s.entity_id = r.entity_id AND s.rn = 1
ORDER BY entity_id
"""


QUERIES["fuzzy_customer_golden"] = (
    fuzzy_customer_golden,
    _fuzzy_golden_oracle(),
)


# ---------------------------------------------------------------------------
# cluster-scoped depth-2 fuzzy matching (round 8 — VERDICT r7 #3)
#
# Fixture note (a vacuous-green catch, SELFREVIEW_r8): the first draft
# ran on the customer audit subset (c_custkey < 300) and returned ZERO
# rows at both SFs — the digit-substituted names are so dense that the
# d1 pass collapses the whole subset into ONE entity, leaving a single
# representative and no rep pairs. Scoped d2's interesting regime needs
# MULTIPLE d1 clusters separated by distance-2 gaps; the word-structured
# part names provide exactly that (cold/old merge at d1; red/new sit at
# distance 2 from them and from each other), plus a measurable
# representative loss (the cold–old entity links to red only when its
# min-id representative happens to be the "old …" spelling).


def _fuzzy_d1_components_ctes(k_select: str) -> str:
    """CTE chain text shared by the scoped-d2 oracles: keys (from the
    caller's ``k_select``, columns ``id, nm``) → d1 deletion variants →
    capped verified pairs → symmetric closure → recursive reachability →
    components → entities → representatives → depth-2 variants over the
    representatives. The d1/d2 variant expressions are the same texts
    as the entities/golden/d2 oracles, so the chains cannot drift."""
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""k AS ({k_select}),
v AS (
  SELECT id, nm, unnest(CASE WHEN length(nm) = 0 THEN [nm]
    ELSE list_distinct(list_prepend(nm,
      list_transform(generate_series(1, length(nm)),
                     i -> substr(nm, 1, i - 1) || substr(nm, i + 1))))
    END) AS variant
  FROM k
),
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 1
),
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym
  UNION
  SELECT s.b, reach.lbl FROM reach JOIN sym s ON s.a = reach.id
),
comp AS (SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY id),
ents AS (
  SELECT k.id, k.nm, COALESCE(c.component_id, k.id) AS entity_id
  FROM k LEFT JOIN comp c ON c.id = k.id
),
reps AS (SELECT entity_id AS id, nm FROM ents WHERE id = entity_id),
rv AS (
  SELECT id, nm, unnest({_D2_VARIANT_LIST_SQL}) AS variant
  FROM reps
),
rsizes AS (SELECT variant, count(*) AS n FROM rv GROUP BY variant)"""


_PART_NAME_REGISTRY_SQL = (
    "SELECT MIN(p_partkey) AS id, p_name AS nm FROM part GROUP BY p_name"
)


def _part_name_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part names keyed by their min part id — the exact-first
    stage (dedupe identical keys BEFORE any near-match blocking) that
    keeps the component structure name-sized rather than row-sized."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("name_id"))
        .select("name_id", "p_name")
    )


def fuzzy_part_pairs_d2_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scoped depth-2 fuzzy matching (VERDICT r7 #3;
    operators/fuzzy.py::cluster_scoped_pairs_d2): resolve entities with
    the CHEAP d1 pass first, collapse each to its canonical (min-id)
    representative, and run the EXPENSIVE depth-2 deletion neighborhood
    over representatives only — the scale path for DUPLICATES-dense
    key spaces, measured on the round-8 ladder at 1.5M keys / 100k typo
    clusters: 38 s / 87.8k entity links vs 283 s / 46.1M redundant
    within-cluster pairs for full d2 on the same fixture (the
    identifier-dense limit where the d1 cap blocks the collapse is
    measured and documented too — PERFORMANCE.md round-8,
    SELFREVIEW_r8.md cap-vs-collapse). Output =
    candidate LINKS between d1 entities whose representative names are
    within edit distance 2 — the merges a second resolution round would
    apply (here: the red/new/old–cold adjective families). Cross-cluster
    pairs between NON-representative members are lost by construction;
    fuzzy_part_d2_scoped_recall measures that loss. Runs on the distinct
    part-name registry (exact-first staging), which also keeps the
    recursive oracle's reachability set name-sized."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    out = fuzzy.cluster_scoped_pairs_d2(names, "name_id", "p_name")
    return out.select(
        F.col("entity_a").cast("long").alias("entity_a"),
        F.col("entity_b").cast("long").alias("entity_b"),
        "key_a",
        "key_b",
        "dist",
    ).orderBy("entity_a", "entity_b")


def _fuzzy_d2_scoped_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_D2_MAX_BUCKET

    return f"""
WITH RECURSIVE
{_fuzzy_d1_components_ctes(_PART_NAME_REGISTRY_SQL)},
rcands AS (
  SELECT DISTINCT a.id AS entity_a, b.id AS entity_b,
         a.nm AS key_a, b.nm AS key_b
  FROM rv a JOIN rv b ON a.variant = b.variant AND a.id < b.id
  JOIN rsizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_D2_MAX_BUCKET}
)
SELECT CAST(entity_a AS BIGINT) AS entity_a,
       CAST(entity_b AS BIGINT) AS entity_b,
       key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
FROM rcands
WHERE levenshtein(key_a, key_b) <= 2
ORDER BY entity_a, entity_b
"""


QUERIES["fuzzy_part_pairs_d2_scoped"] = (
    fuzzy_part_pairs_d2_scoped,
    _fuzzy_d2_scoped_oracle(),
)


def fuzzy_part_d2_scoped_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the cluster-scoped d2 pass against ENTITY-GRAIN
    ground truth: brute-force all distance-≤2 pairs over the distinct
    part names, map both endpoints to their d1 entities, keep
    cross-entity pairs at the (entity_a, entity_b) grain with the MIN
    member distance, and count how many the scoped index recovered. The
    gap (n_matched < n_true) is exactly the documented representative
    loss — links whose closest members are not the canonical
    representatives (the cold–old entity reaches "red …" only through
    its "old …" spelling, so the link survives only when that spelling
    is the min-id representative). The oracle re-derives BOTH legs, so
    a regression in the scoping composition hash-fails the driver
    check rather than silently shifting the measured recall."""
    from pos_pipeline_core_etl_spark.operators import dedup as dedup_ops
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    pairs_d1 = fuzzy.fuzzy_key_pairs(names, "name_id", "p_name").select(
        "id_a", "id_b"
    )
    comps = dedup_ops.connected_components(pairs_d1, src="id_a", dst="id_b")
    ents = names.join(
        comps.select(
            F.col("id").alias("name_id"),
            F.col("component_id").alias("entity_id"),
        ),
        "name_id",
        "left",
    ).select(
        "name_id",
        F.coalesce("entity_id", "name_id").alias("entity_id"),
    )
    a = names.alias("a")
    b = names.alias("b")
    raw_truth = (
        a.join(b, F.col("a.name_id") < F.col("b.name_id"))
        .where(F.levenshtein("a.p_name", "b.p_name") <= 2)
        .select(
            F.col("a.name_id").alias("ka"),
            F.col("b.name_id").alias("kb"),
            F.levenshtein("a.p_name", "b.p_name").cast("long").alias("pdist"),
        )
    )
    ea = ents.select(F.col("name_id").alias("ka"), F.col("entity_id").alias("ent_ka"))
    eb = ents.select(F.col("name_id").alias("kb"), F.col("entity_id").alias("ent_kb"))
    truth = (
        raw_truth.join(ea, "ka")
        .join(eb, "kb")
        .where(F.col("ent_ka") != F.col("ent_kb"))
        .select(
            F.least("ent_ka", "ent_kb").alias("entity_a"),
            F.greatest("ent_ka", "ent_kb").alias("entity_b"),
            "pdist",
        )
        .groupBy("entity_a", "entity_b")
        .agg(F.min("pdist").alias("dist"))
    )
    idx = fuzzy.cluster_scoped_pairs_d2(names, "name_id", "p_name").select(
        F.col("entity_a").alias("i_a"), F.col("entity_b").alias("i_b")
    )
    joined = truth.join(
        idx,
        (F.col("entity_a") == F.col("i_a")) & (F.col("entity_b") == F.col("i_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("i_a").isNotNull().cast("long")).alias("n_matched"),
        )
        .orderBy("dist")
    )


def _fuzzy_d2_scoped_recall_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_D2_MAX_BUCKET

    return f"""
WITH RECURSIVE
{_fuzzy_d1_components_ctes(_PART_NAME_REGISTRY_SQL)},
rcands AS (
  SELECT DISTINCT a.id AS entity_a, b.id AS entity_b,
         a.nm AS key_a, b.nm AS key_b
  FROM rv a JOIN rv b ON a.variant = b.variant AND a.id < b.id
  JOIN rsizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_D2_MAX_BUCKET}
),
idx AS (
  SELECT entity_a, entity_b FROM rcands
  WHERE levenshtein(key_a, key_b) <= 2
),
truth AS (
  SELECT LEAST(ea.entity_id, eb.entity_id) AS entity_a,
         GREATEST(ea.entity_id, eb.entity_id) AS entity_b,
         MIN(levenshtein(a.nm, b.nm)) AS dist
  FROM k a JOIN k b ON a.id < b.id
  JOIN ents ea ON ea.id = a.id
  JOIN ents eb ON eb.id = b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
    AND ea.entity_id != eb.entity_id
  GROUP BY 1, 2
)
SELECT CAST(t.dist AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(i.entity_a) AS BIGINT) AS n_matched
FROM truth t
LEFT JOIN idx i ON i.entity_a = t.entity_a AND i.entity_b = t.entity_b
GROUP BY t.dist
ORDER BY dist
"""


QUERIES["fuzzy_part_d2_scoped_recall"] = (
    fuzzy_part_d2_scoped_recall,
    _fuzzy_d2_scoped_recall_oracle(),
)


# ---------------------------------------------------------------------------
# phonetic blocking family (round 8 — VERDICT r7 #4)


def _phonetic_cte(word: str) -> str:
    """pk CTE over the part-name registry ``k``: the DuckDB rendering of
    the SAME step list the operator renders for Spark
    (operators/fuzzy.py::phonetic_key_sql)."""
    from pos_pipeline_core_etl_spark.operators.fuzzy import phonetic_key_sql

    return (
        "pk AS (SELECT id, nm, "
        + phonetic_key_sql("nm", word=word, dialect="duckdb")
        + " AS pk FROM k)"
    )


def fuzzy_part_phonetic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking over the distinct part names (VERDICT r7 #4;
    operators/fuzzy.py::phonetic_pairs): the textbook name-ER recipe —
    block on the Soundex-class code of the discriminating word (here the
    final noun: the "surname"), verify exact levenshtein on the FULL
    name, distance ≤ 2 kept. Catches every adjective typo the SN window
    misses (cold/old, new/red sort far apart but share the noun block)
    with NO explode at all: one map-side key expression and one keyed
    shuffle — the cheapest of the three blocking families. Its blind
    spot is a typo in the BLOCKING word itself; the recall audit
    measures against full truth, so such pairs would surface as
    n_matched < n_true."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    return (
        fuzzy.phonetic_pairs(names, "name_id", "p_name", word="last")
        .orderBy("id_a", "id_b")
    )


def _phonetic_pairs_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH k AS ({_PART_NAME_REGISTRY_SQL}),
{_phonetic_cte("last")},
psizes AS (SELECT pk.pk, count(*) AS n FROM pk GROUP BY pk.pk),
cands AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS key_a, b.nm AS key_b
  FROM pk a JOIN pk b ON a.pk = b.pk AND a.id < b.id
  JOIN psizes z ON z.pk = a.pk
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
)
SELECT id_a, id_b, key_a, key_b,
       CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
FROM cands
WHERE levenshtein(key_a, key_b) <= 2
ORDER BY id_a, id_b
"""


QUERIES["fuzzy_part_phonetic_pairs"] = (
    fuzzy_part_phonetic_pairs,
    _phonetic_pairs_oracle(),
)


def fuzzy_part_phonetic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the phonetic block against brute-force
    distance-≤2 truth over the distinct part names — the standing-audit
    discipline every blocking family carries. On this fixture the noun
    block is total (every true pair shares its noun), so the gap, if it
    ever appears, is a regression in the key algorithm or the cap; the
    oracle re-derives BOTH legs, so either hash-fails the driver."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    a = names.alias("a")
    b = names.alias("b")
    truth = (
        a.join(b, F.col("a.name_id") < F.col("b.name_id"))
        .where(F.levenshtein("a.p_name", "b.p_name") <= 2)
        .select(
            F.col("a.name_id").alias("id_a"),
            F.col("b.name_id").alias("id_b"),
            F.levenshtein("a.p_name", "b.p_name").cast("long").alias("dist"),
        )
    )
    idx = fuzzy.phonetic_pairs(names, "name_id", "p_name", word="last").select(
        F.col("id_a").alias("i_a"), F.col("id_b").alias("i_b")
    )
    joined = truth.join(
        idx,
        (F.col("id_a") == F.col("i_a")) & (F.col("id_b") == F.col("i_b")),
        "left",
    )
    return (
        joined.groupBy("dist")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.sum(F.col("i_a").isNotNull().cast("long")).alias("n_matched"),
        )
        .orderBy("dist")
    )


def _phonetic_recall_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_MAX_BUCKET

    return f"""
WITH k AS ({_PART_NAME_REGISTRY_SQL}),
{_phonetic_cte("last")},
psizes AS (SELECT pk.pk, count(*) AS n FROM pk GROUP BY pk.pk),
idx AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM pk a JOIN pk b ON a.pk = b.pk AND a.id < b.id
  JOIN psizes z ON z.pk = a.pk
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 2
),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
)
SELECT t.dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(i.id_a) AS BIGINT) AS n_matched
FROM truth t
LEFT JOIN idx i ON i.id_a = t.id_a AND i.id_b = t.id_b
GROUP BY t.dist
ORDER BY t.dist
"""


QUERIES["fuzzy_part_phonetic_recall"] = (
    fuzzy_part_phonetic_recall,
    _phonetic_recall_oracle(),
)


def fuzzy_phonetic_overflow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phonetic family's degenerate mode, demonstrated instead of
    asserted: on identifier-like keys (customer names — letters
    constant, digits carrying all identity) the whole-string phonetic
    key folds EVERY row into one block. The capped-bucket contract
    refuses to expand it and reports it here — one row, n_keys =
    |customers| — exactly the stop-bucket observability every other
    blocking family carries. This is why the production phonetic recipe
    keys on a chosen word of a NAME-shaped field, never on an opaque
    identifier."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        fuzzy.phonetic_overflow(cust, "c_custkey", "c_name", word="whole")
        .select("pk", F.col("n_keys").cast("long").alias("n_keys"))
        .orderBy("pk")
    )


def _phonetic_overflow_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import (
        FUZZY_MAX_BUCKET,
        phonetic_key_sql,
    )

    key = phonetic_key_sql("c_name", word="whole", dialect="duckdb")
    return f"""
WITH pk AS (SELECT c_custkey AS id, {key} AS pk FROM customer)
SELECT pk, CAST(count(DISTINCT id) AS BIGINT) AS n_keys
FROM pk GROUP BY pk
HAVING count(DISTINCT id) > {FUZZY_MAX_BUCKET}
ORDER BY pk
"""


QUERIES["fuzzy_phonetic_overflow"] = (
    fuzzy_phonetic_overflow,
    _phonetic_overflow_oracle(),
)


def fuzzy_family_recall_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three-family recall comparison (VERDICT r7 #4): every
    blocking family this engine ships — deletion variants at d1 and d2,
    sorted neighborhood single- and multi-pass, phonetic-of-the-noun —
    measured against the SAME brute-force distance-≤2 truth over the
    distinct part names, per true distance. One artifact showing each
    family's profile on an adversarial fixture: FastSS-d1 is
    d1-complete and d2-blind by construction; FastSS-d2 is complete but
    explode-priced; SN-1pass misses everything here (adjective typos
    sort far apart); SN-2pass recovers what sorts adjacent REVERSED
    (cold/old, old/red — shared nouns) but not red/new (7 ranks apart,
    window 5); phonetic-of-the-noun is total on this fixture at explode
    factor zero. The sixth row IS the production prescription measured:
    union_cheap (d1 + phonetic + SN-2pass,
    operators/fuzzy.py::union_blocking_pairs) reaches FastSS-d2's total
    recall while its most expensive leg explodes only L variants per
    key — d2 stays reserved for the cluster-scoped residual."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    a = names.alias("a")
    b = names.alias("b")
    truth = (
        a.join(b, F.col("a.name_id") < F.col("b.name_id"))
        .where(F.levenshtein("a.p_name", "b.p_name") <= 2)
        .select(
            F.col("a.name_id").alias("id_a"),
            F.col("b.name_id").alias("id_b"),
            F.levenshtein("a.p_name", "b.p_name").cast("long").alias("dist"),
        )
    )

    def norm(pairs: DataFrame) -> DataFrame:
        return pairs.select(
            F.least("id_a", "id_b").alias("i_a"),
            F.greatest("id_a", "id_b").alias("i_b"),
        ).distinct()

    families = {
        "fastss_d1": norm(
            fuzzy.fuzzy_key_pairs(names, "name_id", "p_name", max_distance=1)
        ),
        "fastss_d2": norm(
            fuzzy.fuzzy_key_pairs(
                names,
                "name_id",
                "p_name",
                max_distance=2,
                max_bucket_size=fuzzy.FUZZY_D2_MAX_BUCKET,
            )
        ),
        "phonetic_noun": norm(
            fuzzy.phonetic_pairs(names, "name_id", "p_name", word="last")
        ),
        "sn_1pass": norm(
            fuzzy.sorted_neighborhood_pairs(names, "name_id", "p_name")
        ),
        "sn_2pass": norm(
            fuzzy.sorted_neighborhood_pairs_multi(names, "name_id", "p_name")
        ),
        # the production prescription: union of the three cheap legs —
        # measured in the same table so the "covers every blind spot at
        # explode <= L" claim is a row, not prose
        "union_cheap": norm(
            fuzzy.union_blocking_pairs(names, "name_id", "p_name")
        ),
    }
    out = None
    for family, idx in families.items():
        joined = truth.join(
            idx,
            (F.col("id_a") == F.col("i_a")) & (F.col("id_b") == F.col("i_b")),
            "left",
        )
        leg = (
            joined.groupBy("dist")
            .agg(
                F.count(F.lit(1)).alias("n_true"),
                F.sum(F.col("i_a").isNotNull().cast("long")).alias("n_matched"),
            )
            .select(F.lit(family).alias("family"), "dist", "n_true", "n_matched")
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("family", "dist")


def _family_recall_compare_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.fuzzy import (
        FUZZY_D2_MAX_BUCKET,
        FUZZY_MAX_BUCKET,
        SN_WINDOW,
        phonetic_key_sql,
    )

    pk = phonetic_key_sql("nm", word="last", dialect="duckdb")
    fam_leg = """SELECT '{family}' AS family, t.dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(i.id_a) AS BIGINT) AS n_matched
FROM truth t LEFT JOIN {idx} i ON i.id_a = t.id_a AND i.id_b = t.id_b
GROUP BY t.dist"""
    legs = "\nUNION ALL\n".join(
        fam_leg.format(family=f, idx=i)
        for f, i in [
            ("fastss_d1", "d1p"),
            ("fastss_d2", "d2p"),
            ("phonetic_noun", "php"),
            ("sn_1pass", "snp"),
            ("sn_2pass", "sn2p"),
            ("union_cheap", "unionc"),
        ]
    )
    return f"""
WITH k AS ({_PART_NAME_REGISTRY_SQL}),
truth AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM k a JOIN k b ON a.id < b.id
  WHERE levenshtein(a.nm, b.nm) <= 2
),
v AS (
  SELECT id, nm, unnest(CASE WHEN length(nm) = 0 THEN [nm]
    ELSE list_distinct(list_prepend(nm,
      list_transform(generate_series(1, length(nm)),
                     i -> substr(nm, 1, i - 1) || substr(nm, i + 1))))
    END) AS variant
  FROM k
),
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
d1p AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 1
),
v2 AS (
  SELECT id, nm, unnest({_D2_VARIANT_LIST_SQL}) AS variant
  FROM k
),
sizes2 AS (SELECT variant, count(*) AS n FROM v2 GROUP BY variant),
d2p AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM v2 a JOIN v2 b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes2 z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_D2_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 2
),
pkc AS (SELECT id, nm, {pk} AS pk FROM k),
psizes AS (SELECT pk, count(*) AS n FROM pkc GROUP BY pk),
php AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM pkc a JOIN pkc b ON a.pk = b.pk AND a.id < b.id
  JOIN psizes z ON z.pk = a.pk
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 2
),
r AS (SELECT id, nm, row_number() OVER (ORDER BY nm, id) AS rnk FROM k),
snp AS (
  SELECT DISTINCT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
  FROM r a JOIN r b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {SN_WINDOW}
  WHERE levenshtein(a.nm, b.nm) <= 2
),
rr AS (SELECT id, nm, row_number() OVER (ORDER BY reverse(nm), id) AS rnk FROM k),
snrev AS (
  SELECT DISTINCT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b
  FROM rr a JOIN rr b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {SN_WINDOW}
  WHERE levenshtein(a.nm, b.nm) <= 2
),
sn2p AS (SELECT id_a, id_b FROM snp UNION SELECT id_a, id_b FROM snrev),
unionc AS (
  SELECT id_a, id_b FROM d1p
  UNION SELECT id_a, id_b FROM php
  UNION SELECT id_a, id_b FROM sn2p
)
{legs}
ORDER BY family, dist
"""


QUERIES["fuzzy_family_recall_compare"] = (
    fuzzy_family_recall_compare,
    _family_recall_compare_oracle(),
)


def fuzzy_part_pairs_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production blocking prescription as a query
    (operators/fuzzy.py::union_blocking_pairs): union of the three
    CHEAP verified families — FastSS-d1, phonetic-of-the-noun, two-pass
    sorted neighborhood — reaching the d2 recall the family table
    measures WITHOUT the depth-2 explode. On this fixture the union is
    total at both distances while its most expensive leg explodes only
    L variants per key; the d2 machinery stays reserved for the
    cluster-scoped residual pass."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    return fuzzy.union_blocking_pairs(names, "name_id", "p_name").orderBy(
        "id_a", "id_b"
    )


def _union_pairs_ctes() -> str:
    """CTE chain text for the cheap-family blocking union over the
    part-name registry, ending in ``upairs`` (id_a, id_b, key_a,
    key_b, dist) — shared by the union-pairs oracle AND the round-9
    end-to-end entity-resolution oracles, so the family legs cannot
    drift between them."""
    from pos_pipeline_core_etl_spark.operators.fuzzy import (
        FUZZY_MAX_BUCKET,
        SN_WINDOW,
        phonetic_key_sql,
    )

    pk = phonetic_key_sql("nm", word="last", dialect="duckdb")
    sn_leg = f"""SELECT DISTINCT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b,
         CASE WHEN a.id < b.id THEN a.nm ELSE b.nm END AS key_a,
         CASE WHEN a.id < b.id THEN b.nm ELSE a.nm END AS key_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM {{rel}} a JOIN {{rel}} b ON b.rnk BETWEEN a.rnk + 1 AND a.rnk + {SN_WINDOW}
  WHERE levenshtein(a.nm, b.nm) <= 2"""
    return f"""k AS ({_PART_NAME_REGISTRY_SQL}),
v AS (
  SELECT id, nm, unnest(CASE WHEN length(nm) = 0 THEN [nm]
    ELSE list_distinct(list_prepend(nm,
      list_transform(generate_series(1, length(nm)),
                     i -> substr(nm, 1, i - 1) || substr(nm, i + 1))))
    END) AS variant
  FROM k
),
sizes AS (SELECT variant, count(*) AS n FROM v GROUP BY variant),
d1p AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS key_a, b.nm AS key_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM v a JOIN v b ON a.variant = b.variant AND a.id < b.id
  JOIN sizes z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 1
),
pkc AS (SELECT id, nm, {pk} AS pk FROM k),
psizes AS (SELECT pk, count(*) AS n FROM pkc GROUP BY pk),
php AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS key_a, b.nm AS key_b,
         CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
  FROM pkc a JOIN pkc b ON a.pk = b.pk AND a.id < b.id
  JOIN psizes z ON z.pk = a.pk
  WHERE z.n BETWEEN 2 AND {FUZZY_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 2
),
r AS (SELECT id, nm, row_number() OVER (ORDER BY nm, id) AS rnk FROM k),
snpk AS (
  {sn_leg.format(rel="r")}
),
rr AS (SELECT id, nm, row_number() OVER (ORDER BY reverse(nm), id) AS rnk FROM k),
snrk AS (
  {sn_leg.format(rel="rr")}
),
upairs AS (
  SELECT DISTINCT id_a, id_b, key_a, key_b, dist FROM (
    SELECT * FROM d1p
    UNION ALL SELECT * FROM php
    UNION ALL SELECT * FROM snpk
    UNION ALL SELECT * FROM snrk
  )
)"""


def _pairs_union_oracle() -> str:
    return f"""
WITH {_union_pairs_ctes()}
SELECT id_a, id_b, key_a, key_b, dist FROM upairs
ORDER BY id_a, id_b
"""


QUERIES["fuzzy_part_pairs_union"] = (
    fuzzy_part_pairs_union,
    _pairs_union_oracle(),
)


# ---------------------------------------------------------------------------
# end-to-end entity resolution (round 9 — VERDICT r8 #5)


def _entity_final_ctes() -> str:
    """CTE chain from the blocking union through the second components
    pass to the final entity table ``fin`` (name_id, nm, entity_id,
    final_entity) — shared by the entities-final and recall oracles.
    Both recursive reachabilities live in ONE ``WITH RECURSIVE`` clause
    (DuckDB allows several recursive CTEs per clause but only one
    clause per statement)."""
    from pos_pipeline_core_etl_spark.operators.fuzzy import FUZZY_D2_MAX_BUCKET

    return f"""{_union_pairs_ctes()},
sym1 AS (SELECT id_a AS a, id_b AS b FROM upairs
         UNION SELECT id_b, id_a FROM upairs),
reach1(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym1
  UNION
  SELECT s.b, reach1.lbl FROM reach1 JOIN sym1 s ON s.a = reach1.id
),
comp1 AS (SELECT id, MIN(lbl) AS component_id FROM reach1 GROUP BY id),
ents AS (
  SELECT k.id AS name_id, k.nm, COALESCE(c.component_id, k.id) AS entity_id
  FROM k LEFT JOIN comp1 c ON c.id = k.id
),
reps AS (SELECT entity_id AS id, nm FROM ents WHERE name_id = entity_id),
rv AS (
  SELECT id, nm, unnest({_D2_VARIANT_LIST_SQL}) AS variant
  FROM reps
),
rsz AS (SELECT variant, count(*) AS n FROM rv GROUP BY variant),
links AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM rv a JOIN rv b ON a.variant = b.variant AND a.id < b.id
  JOIN rsz z ON z.variant = a.variant
  WHERE z.n BETWEEN 2 AND {FUZZY_D2_MAX_BUCKET}
    AND levenshtein(a.nm, b.nm) <= 2
),
sym2 AS (SELECT id_a AS a, id_b AS b FROM links
         UNION SELECT id_b, id_a FROM links),
reach2(id, lbl) AS (
  SELECT DISTINCT a, a FROM sym2
  UNION
  SELECT s.b, reach2.lbl FROM reach2 JOIN sym2 s ON s.a = reach2.id
),
comp2 AS (SELECT id, MIN(lbl) AS merged_id FROM reach2 GROUP BY id),
fin AS (
  SELECT e.name_id, e.nm, e.entity_id,
         COALESCE(c2.merged_id, e.entity_id) AS final_entity
  FROM ents e LEFT JOIN comp2 c2 ON c2.id = e.entity_id
)"""


def fuzzy_part_entities_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over the part-name registry
    (operators/fuzzy.py::resolve_entities, VERDICT r8 #5): cheap-family
    blocking union → connected components → cluster-scoped depth-2
    links over entity representatives → second components pass → final
    entity table with golden-record survivorship. golden_name is the
    min-member-id name — stable under composition because both
    component passes label by min id, so final_entity IS the min
    original id of the merged cluster. n_members / n_subentities make
    the merge structure inspectable (a stage-3 regression that stops
    merging shows up as n_subentities collapsing to 1 everywhere, not
    just as silent value drift)."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    fin = fuzzy.resolve_entities(names, "name_id", "p_name")
    stats = fin.groupBy("final_entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.count_distinct("entity_id").cast("long").alias("n_subentities"),
    )
    golden = names.select(
        F.col("name_id").alias("final_entity"),
        F.col("p_name").alias("golden_name"),
    )
    return (
        fin.join(stats, "final_entity")
        .join(golden, "final_entity")
        .select(
            F.col("id").cast("long").alias("name_id"),
            F.col("k").alias("p_name"),
            F.col("entity_id").cast("long").alias("entity_id"),
            F.col("final_entity").cast("long").alias("final_entity"),
            "golden_name",
            "n_members",
            "n_subentities",
        )
        .orderBy("name_id")
    )


def _entities_final_oracle() -> str:
    return f"""
WITH RECURSIVE
{_entity_final_ctes()},
stats AS (
  SELECT final_entity, CAST(count(*) AS BIGINT) AS n_members,
         CAST(count(DISTINCT entity_id) AS BIGINT) AS n_subentities
  FROM fin GROUP BY final_entity
)
SELECT CAST(f.name_id AS BIGINT) AS name_id,
       f.nm AS p_name,
       CAST(f.entity_id AS BIGINT) AS entity_id,
       CAST(f.final_entity AS BIGINT) AS final_entity,
       g.nm AS golden_name,
       s.n_members, s.n_subentities
FROM fin f
JOIN k g ON g.id = f.final_entity
JOIN stats s ON s.final_entity = f.final_entity
ORDER BY name_id
"""


QUERIES["fuzzy_part_entities_final"] = (
    fuzzy_part_entities_final,
    _entities_final_oracle(),
)


def fuzzy_part_entities_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-grain recall of the end-to-end resolution against
    ONE-SHOT FULL-d2 ground truth: brute-force every distance-≤2 name
    pair, then count how many land in the SAME final entity, grouped
    by distance. The honest-recall discipline of the blocking family
    applied to the full composition: n_same < n_true quantifies what
    the staged pipeline loses vs the quadratic pass it replaces
    (representative loss + capped buckets), instead of asserting
    totality. The oracle re-derives BOTH legs, so a composition
    regression hash-fails rather than silently shifting the measured
    recall."""
    from pos_pipeline_core_etl_spark.operators import fuzzy

    names = _part_name_registry(spark, sf_dir)
    fin = fuzzy.resolve_entities(names, "name_id", "p_name").select(
        F.col("id").alias("name_id"), "final_entity"
    )
    a = names.alias("a")
    b = names.alias("b")
    truth = (
        a.join(b, F.col("a.name_id") < F.col("b.name_id"))
        .where(F.levenshtein("a.p_name", "b.p_name") <= 2)
        .select(
            F.col("a.name_id").alias("ka"),
            F.col("b.name_id").alias("kb"),
            F.levenshtein("a.p_name", "b.p_name").cast("long").alias("dist"),
        )
    )
    fa = fin.select(F.col("name_id").alias("ka"), F.col("final_entity").alias("ea"))
    fb = fin.select(F.col("name_id").alias("kb"), F.col("final_entity").alias("eb"))
    return (
        truth.join(fa, "ka")
        .join(fb, "kb")
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true"),
            F.sum((F.col("ea") == F.col("eb")).cast("long")).alias("n_same_entity"),
        )
        .orderBy("dist")
    )


def _entities_recall_oracle() -> str:
    return f"""
WITH RECURSIVE
{_entity_final_ctes()}
SELECT CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist,
       CAST(count(*) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN fa.final_entity = fb.final_entity
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_same_entity
FROM k a JOIN k b ON a.id < b.id
JOIN fin fa ON fa.name_id = a.id
JOIN fin fb ON fb.name_id = b.id
WHERE levenshtein(a.nm, b.nm) <= 2
GROUP BY 1
ORDER BY dist
"""


QUERIES["fuzzy_part_entities_recall"] = (
    fuzzy_part_entities_recall,
    _entities_recall_oracle(),
)
