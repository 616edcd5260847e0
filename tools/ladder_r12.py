#!/usr/bin/env python
"""Round-12 scale-ladder measurement: ER RESOLVE PAST 15M KEYS
(VERDICT r11 #4).

LADDER_r11 cleared the r10 OOM notch — 15M keys resolved in 2213 s at a
64g heap with the oriented/serialized/per-round-released components
memory shape — but left the headroom unknown.  This leg pushes the SAME
clustered duplicates-dense fixture (15 members per cluster, base keys
colliding mod 1e7, so blocking densifies with n exactly as in the
r9/r10/r11 runs this extends) to 30M keys (2M clusters).

Note the fixture's density is SUPERLINEAR past 15M: 2M distinct bases in
a 1e7 key space roughly doubles the per-block collision rate on top of
doubling the rows, so the pair graph grows faster than 2× — this notch
is deliberately harder per-key than every prior one.  If the run hits a
resource wall (heap or the ~78 GB sandbox disk) the honest boundary row
is the result: record the failure mode, do not shrink the fixture to
manufacture a completion.

Run inside tmux (multi-hour) with the r11 configuration:
  SPARK_GRAFT_DRIVER_MEM=64g python tools/ladder_r12.py \
      | tee -a LADDER_r12.jsonl
LADDER_ER_CLUSTERS overrides the notch list (default warms at 4.5M then
runs 30M; the 4.5M row doubles as the cross-round comparability anchor —
r10 2270 s, r11 845 s on the same fixture).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402


def _time(fn):
    t0 = time.perf_counter()
    n = fn().count()
    return round(time.perf_counter() - t0, 3), n


def er_legs(spark) -> None:
    from pos_pipeline_core_etl_spark.operators import fuzzy

    # same clustered duplicates-dense fixture as LADDER_r9/r10/r11
    def clustered(n_clusters, members=15):
        base = (F.floor(F.col("id") / members) * 7919) % 10_000_000
        return spark.range(n_clusters * members).select(
            F.col("id").alias("c_custkey"),
            F.format_string(
                "Customer#%09d", base * 100 + F.col("id") % members
            ).alias("c_name"),
        )

    notches = [
        int(x)
        for x in os.environ.get(
            "LADDER_ER_CLUSTERS", "300000,2000000"
        ).split(",")
    ]
    fuzzy.resolve_entities(clustered(500), "c_custkey", "c_name").count()  # warm
    for n_clusters in notches:
        df = clustered(n_clusters)
        try:
            sec_e, rows_e = _time(
                lambda: fuzzy.resolve_entities(df, "c_custkey", "c_name")
            )
            print(
                json.dumps(
                    {
                        "leg": "er_resolve_entities",
                        "keys": n_clusters * 15,
                        "sec": sec_e,
                        "rows": rows_e,
                        "note": "r11 components memory shape; 64g driver",
                    }
                ),
                flush=True,
            )
        except Exception as e:  # the honest boundary row
            print(
                json.dumps(
                    {
                        "leg": "er_resolve_entities",
                        "keys": n_clusters * 15,
                        "boundary": f"{type(e).__name__}: {str(e)[:400]}",
                        "note": "resource wall at this notch — recorded, "
                        "not retried smaller",
                    }
                ),
                flush=True,
            )
            raise SystemExit(1)


def main() -> None:
    # periodicGC=2min: same disk-spill lesson as LADDER_r11 — a 64 GiB
    # heap never GCs on its own, so finished components rounds' shuffle
    # files outlive their usefulness by the default 30 min and the
    # sandbox disk (~78 GB) fills before reclamation.
    spark = get_spark(
        app_name="ladder_r12_er",
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    er_legs(spark)
    spark.stop()


if __name__ == "__main__":
    main()
