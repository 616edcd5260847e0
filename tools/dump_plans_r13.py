#!/usr/bin/env python
"""Dump .explain("formatted") plans for round-12 optimization evidence.

Writes plans/r13/<query>_<tag>.txt for each named query, where tag is
"before" or "after" (argv[1]).  Plans are built at sf0.001 — plan SHAPE
(Exchange count, join strategy, PushedFilters, codegen spans) is what
the round-12 deliverable documents, and it does not depend on SF; AQE
final plans are runtime artifacts and are cited from the bench/profile
runs instead.

Usage: python tools/dump_plans_r13.py before q1,q2,...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402
from pos_pipeline_core_etl_spark import registry  # noqa: E402

SF = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    spark = get_spark(app_name="dump_plans_r13")
    qs = registry.all_queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
