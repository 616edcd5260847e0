"""Grain/invariant assertions — the reference's correctness spec
(tests/test_grain_assertions.py, SURVEY §5) ported to the rebuild.

Facts must honor their declared grains (SURVEY §1.1.2):
- fact_payments_ticket: key (sucursal, operating_date, order_index,
  payment_method); multiple rows per ticket allowed (split payments).
- fact_sales_item_line: key (sucursal, operating_date, order_id,
  item_key); multiple item lines per ticket expected.
- marts are strictly coarser: one row per their stated grain.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.operators.payments import (
    assert_tip_sanity,
    build_payments_daily,
    tip_sanity_violations,
)
from pos_pipeline_core_etl_spark.operators.sales import build_sales_by_ticket
from pos_pipeline_core_etl_spark.plans import pos_adapter

SF_DIR = "/root/testdata/sf0.001"


def _dup_keys(df, keys):
    return df.groupBy(*keys).count().where(F.col("count") > 1).count()


class TestPaymentsGrain:
    def test_key_uniqueness(self, spark):
        fact = pos_adapter.fact_payments_ticket(spark, SF_DIR)
        assert (
            _dup_keys(
                fact, ["sucursal", "operating_date", "order_index", "payment_method"]
            )
            == 0
        )

    def test_mart_grain_is_branch_day(self, spark):
        fact = pos_adapter.fact_payments_ticket(spark, SF_DIR)
        mart = build_payments_daily(fact, pos_adapter.holidays(spark, SF_DIR))
        assert _dup_keys(mart, ["sucursal", "fecha"]) == 0

    def test_ticket_counts_bounded_by_fact(self, spark):
        fact = pos_adapter.fact_payments_ticket(spark, SF_DIR)
        mart = build_payments_daily(fact, pos_adapter.holidays(spark, SF_DIR))
        total_tickets = mart.agg(F.sum("num_tickets")).collect()[0][0]
        distinct_tickets = fact.select("order_index").distinct().count()
        assert total_tickets == distinct_tickets


class TestSalesGrain:
    def test_key_uniqueness(self, spark):
        fact = pos_adapter.fact_sales_item_line(spark, SF_DIR)
        assert (
            _dup_keys(fact, ["sucursal", "operating_date", "order_id", "item_key"]) == 0
        )

    def test_multiple_lines_per_ticket_exist(self, spark):
        fact = pos_adapter.fact_sales_item_line(spark, SF_DIR)
        multi = (
            fact.groupBy("sucursal", "operating_date", "order_id")
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert multi > 0  # item-line grain is finer than ticket grain

    def test_ticket_mart_totals_match_fact(self, spark):
        fact = pos_adapter.fact_sales_item_line(spark, SF_DIR)
        mart = build_sales_by_ticket(fact)
        fact_total = fact.agg(F.round(F.sum("total_item"), 0)).collect()[0][0]
        mart_total = mart.agg(F.round(F.sum("total_ticket_cost"), 0)).collect()[0][0]
        assert abs(fact_total - mart_total) <= 1.0  # only rounding drift


class TestTipGate:
    def _fact(self, spark, tips_ok: bool):
        day_total = 15.0 if tips_ok else 99.0
        rows = [
            ("A", dt.date(2024, 1, 1), 1, "Efectivo", 100.0, 10.0, day_total),
            ("A", dt.date(2024, 1, 1), 2, "Efectivo", 50.0, 5.0, day_total),
        ]
        return spark.createDataFrame(
            rows,
            "sucursal string, operating_date date, order_index long, "
            "payment_method string, ticket_total double, ticket_tip double, "
            "total_day_tips double",
        )

    def test_gate_passes_within_tolerance(self, spark):
        assert_tip_sanity(self._fact(spark, tips_ok=True))

    def test_gate_raises_on_violation(self, spark):
        fact = self._fact(spark, tips_ok=False)
        assert tip_sanity_violations(fact).count() == 1
        with pytest.raises(ValueError, match="tip sanity gate"):
            assert_tip_sanity(fact)

    def test_gate_noop_without_day_column(self, spark):
        fact = self._fact(spark, tips_ok=False).drop("total_day_tips")
        assert tip_sanity_violations(fact).count() == 0
