#!/usr/bin/env python
"""Synthesize an sf1-equivalent bench dataset (VERDICT r2 item 4).

Union-replicates the sf0.1 fixtures 10x with shifted keys into
$SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1), so the headline
bench can be measured one notch past sf0.1: ~6M lineitem rows, ~1M
orders, ~200K events, 50K documents, 20K embeddings. Fact tables get a
per-replica key offset (so joins stay consistent within a replica and
group-by keys keep their cardinality shape); dimension tables are
shared across replicas, exactly like a production star schema where
facts grow and dims don't.

Usage:
    python tools/make_scaled_bench.py            # writes the dataset
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py

    # third scale notch (sf3-equivalent, 30x facts — round 4):
    SPARK_GRAFT_SF1_DIR=/tmp/spark_graft_sf3 SPARK_GRAFT_REPLICAS=30 \
        python tools/make_scaled_bench.py
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf3 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))
OFFSET = 100_000_000  # far above any sf0.1 key

# fact table -> columns shifted by replica * OFFSET
FACT_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    spark = get_spark(app_name="make_scaled_bench")
    os.makedirs(DST, exist_ok=True)
    for table in DIMS:
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"{table}: {df.count()} rows (shared dim)")
    for table, shift_cols in FACT_SHIFTS.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = None
        for r in range(REPLICAS):
            rep = base
            for c in shift_cols:
                rep = rep.withColumn(c, F.col(c) + F.lit(r * OFFSET))
            out = rep if out is None else out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{DST}/{table}.parquet")
        print(f"{table}: {REPLICAS}x replicated")
    spark.stop()
    print(f"dataset at {DST}")


if __name__ == "__main__":
    main()
