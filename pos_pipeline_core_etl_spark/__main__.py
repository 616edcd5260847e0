"""CLI entry (reference parity: build_payments_dataset / run_qa CLIs).

Usage:
    python -m pos_pipeline_core_etl_spark mart     [--sf-dir D] [--out P]
    python -m pos_pipeline_core_etl_spark qa       [--sf-dir D]
    python -m pos_pipeline_core_etl_spark forecast [--sf-dir D] [--horizon N]
    python -m pos_pipeline_core_etl_spark queries  [--sf-dir D] [--name Q]

``qa`` exits 1 on ERROR-level findings (reference ``run_qa``,
qa_payments.py:974-1144).
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pos_pipeline_core_etl_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_mart = sub.add_parser("mart", help="build mart_payments_daily")
    p_mart.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_mart.add_argument("--out", default=None, help="parquet output dir")

    p_qa = sub.add_parser("qa", help="run the payments QA suite")
    p_qa.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    p_fc = sub.add_parser("forecast", help="run the payments forecast")
    p_fc.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_fc.add_argument("--horizon", type=int, default=7)

    p_q = sub.add_parser("queries", help="list or run registry queries")
    p_q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_q.add_argument("--name", default=None)

    args = parser.parse_args(argv)

    from pos_pipeline_core_etl_spark.session import get_spark

    spark = get_spark(app_name=f"cli_{args.cmd}")
    try:
        if args.cmd == "mart":
            from pos_pipeline_core_etl_spark.plans.marts import payments_daily_mart

            mart = payments_daily_mart(spark, args.sf_dir)
            if args.out:
                from pos_pipeline_core_etl_spark.sources.writers import write_partitioned

                write_partitioned(mart, args.out, partition_by=("fecha",))
                print(f"wrote {args.out}")
            else:
                mart.show(20, truncate=False)
            return 0

        if args.cmd == "qa":
            from pos_pipeline_core_etl_spark.operators.qa import run_payments_qa
            from pos_pipeline_core_etl_spark.plans.marts import payments_daily_mart

            result = run_payments_qa(payments_daily_mart(spark, args.sf_dir))
            print(json.dumps(result["summary"], indent=2))
            return 1 if result["summary"]["status"] == "ERROR" else 0

        if args.cmd == "forecast":
            from pos_pipeline_core_etl_spark.forecasting.api import (
                ForecastConfig,
                run_payments_forecast,
            )
            from pos_pipeline_core_etl_spark.forecasting.formatters import (
                format_forecast_console,
            )
            from pos_pipeline_core_etl_spark.plans.marts import payments_daily_mart

            res = run_payments_forecast(
                payments_daily_mart(spark, args.sf_dir),
                ForecastConfig(horizon_days=args.horizon),
            )
            fc = [r.asDict() for r in res.forecast.collect()]
            dep = [r.asDict() for r in res.deposit_schedule.collect()]
            print(format_forecast_console(fc, dep))
            return 0

        if args.cmd == "queries":
            from pos_pipeline_core_etl_spark import registry

            qs = registry.all_queries()
            if args.name is None:
                for name in sorted(qs):
                    print(name)
                return 0
            if args.name not in qs:
                print(f"unknown query {args.name!r}", file=sys.stderr)
                return 2
            qs[args.name](spark, args.sf_dir).show(20, truncate=False)
            return 0
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
