#!/usr/bin/env python
"""Round-12 optimization profiler: per-query isolated measurement.

For each named registry query (or every bench headline entry) this runs
the query at $SPARK_GRAFT_SF_DIR with the noop sink (guide §1.4 — the
computation, not the sink, is what gets timed), under a per-query job
group so the event log attributes every job/stage to its query, and
reports:

  wall seconds (median of reps, after a warmup),
  number of Spark jobs,
  number of stages / total tasks,
  total shuffle read/write bytes,
  executor run time (sum over tasks).

Usage:
  python tools/profile_r12.py q1,q2,...       # profile named queries
  python tools/profile_r12.py --plans q1,...  # also dump formatted plans
Output: one JSON line per query + a summary JSON to stdout.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402
from pos_pipeline_core_etl_spark import registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"
EVDIR = "/tmp/sparkevents_r12"


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _parse_eventlog(path: str) -> dict[str, dict]:
    """Group job/stage metrics by spark.job.description."""
    per: dict[str, dict] = {}
    stage_to_desc: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "?"
                )
                d = per.setdefault(
                    desc,
                    {"jobs": 0, "stages": 0, "tasks": 0, "sh_read": 0,
                     "sh_write": 0, "exec_ms": 0, "input_bytes": 0},
                )
                d["jobs"] += 1
                for sid in ev.get("Stage IDs", []):
                    stage_to_desc[sid] = desc
            elif et == "SparkListenerStageCompleted":
                si = ev.get("Stage Info", {})
                desc = stage_to_desc.get(si.get("Stage ID"))
                if desc is None:
                    continue
                d = per[desc]
                if si.get("Submission Time") is None:
                    continue  # skipped stage (reused exchange)
                d["stages"] += 1
                d["tasks"] += si.get("Number of Tasks", 0)
                for acc in si.get("Accumulables", []):
                    name, val = acc.get("Name", ""), acc.get("Value", 0)
                    try:
                        val = int(val)
                    except (TypeError, ValueError):
                        continue
                    if name == "internal.metrics.shuffle.read.remoteBytesRead":
                        d["sh_read"] += val
                    elif name == "internal.metrics.shuffle.read.localBytesRead":
                        d["sh_read"] += val
                    elif name == "internal.metrics.shuffle.write.bytesWritten":
                        d["sh_write"] += val
                    elif name == "internal.metrics.executorRunTime":
                        d["exec_ms"] += val
                    elif name == "internal.metrics.input.bytesRead":
                        d["input_bytes"] += val
    return per


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--plans" in sys.argv
    names = args[0].split(",") if args else []

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="profile_r12",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            # flat uncompressed file so the line parser can read it
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    qs = registry.all_queries()
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    sc = spark.sparkContext

    results = {}
    for name in names:
        fn = qs[name]
        # warmup at tiny SF (codegen/JIT), best-effort
        try:
            _noop(fn(spark, WARM_DIR))
        except Exception:
            pass
        walls = []
        for rep in range(reps):
            # only the LAST rep is labeled so eventlog metrics are per one run
            sc.setJobDescription(f"{name}" if rep == reps - 1 else f"warmrep:{name}")
            t0 = time.perf_counter()
            _noop(fn(spark, SF_DIR))
            walls.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        results[name] = {"wall_median": round(statistics.median(walls), 3),
                         "walls": [round(w, 3) for w in walls]}
        if dump_plans:
            df = fn(spark, SF_DIR)
            pdir = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "plans", "r12")
            os.makedirs(pdir, exist_ok=True)
            with open(os.path.join(pdir, f"{name}_profile.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    app_id = sc.applicationId
    spark.stop()
    evpath = os.path.join(EVDIR, app_id)
    if not os.path.exists(evpath):
        # Spark 4 writes a v2 event-log DIRECTORY; the events file lives
        # inside it
        d = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
        if os.path.isdir(d):
            cands = [f for f in os.listdir(d) if f.startswith("events_")]
            if cands:
                evpath = os.path.join(d, sorted(cands)[0])
    if os.path.exists(evpath):
        per = _parse_eventlog(evpath)
        for name in results:
            if name in per:
                d = per[name]
                results[name].update(
                    jobs=d["jobs"], stages=d["stages"], tasks=d["tasks"],
                    shuffle_read_mb=round(d["sh_read"] / 1e6, 2),
                    shuffle_write_mb=round(d["sh_write"] / 1e6, 2),
                    executor_sec=round(d["exec_ms"] / 1e3, 2),
                    input_mb=round(d["input_bytes"] / 1e6, 2),
                )
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
