"""Z-order layout WRITER — the artifact half of the data-layout story
(LLM-pipeline + lakehouse extension; no reference analog — the
reference writes presentation files, never clustered tables).

``plans/analytics.py::events_layout_skipping`` MEASURES what a z-order
layout would buy; this module SHIPS it: assign every row a Morton
z-file id over the (user, day) bucket grid, write one parquet file per
z-file (a ``partitionBy`` directory tree — deterministic, unlike
``repartitionByRange``'s sampled boundaries), and read the tree back to
report per-file min/max statistics — exactly the stats a parquet
reader's min/max pruning consults. The read-back report closes the
loop: analysis → written artifact → measured pruning on the artifact.

100 TB shape: the z-value is map-side integer math; the write is one
hash shuffle on the file id (each file's rows co-located on one task);
stats are one keyed agg over the read-back tree. On a real lakehouse
the same recipe scales by widening the bucket grids and letting the
writer emit thousands of files — the pruning math is unchanged.

Determinism contract (what makes the written layout ORACLE-CHECKABLE):
file membership is a pure function of the row (no sampling, no task
order), so a SQL engine that never sees the files can still predict
every per-file statistic. ``repartitionByRange(z)`` would be the
convenient writer at scale; its sampled range boundaries are
nondeterministic, so the shipped writer pins ``partitionBy`` on the
precomputed file id instead — same physical effect (files = aligned
z-ranges), reproducible bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 32 files over a 16×16 Morton grid: z in [0, 256) → file = z div 8.
ZORDER_N_FILES = 32
ZORDER_EPOCH = "DATE'2024-01-01'"


def interleave4(zu: str, zd: str) -> str:
    """8-bit Morton code from two 4-bit bucket expressions (valid in
    both Spark SQL and DuckDB — emitted as arithmetic so ONE string
    serves both engines). Shared with the layout ANALYSIS query so the
    writer can never drift from what the analysis measured."""
    terms = []
    for i in range(4):
        terms.append(
            f"((CAST(floor(({zu}) / {1 << i}) AS INT) % 2) * {1 << (2 * i + 1)})"
        )
        terms.append(
            f"((CAST(floor(({zd}) / {1 << i}) AS INT) % 2) * {1 << (2 * i)})"
        )
    return " + ".join(terms)


def zorder_buckets(events: DataFrame) -> DataFrame:
    """(user_id, d_bucket, u_bucket, zfile) for every event row — the
    deterministic z-file assignment shared by the writer and the
    skipping analysis. Pure map-side integer math."""
    base = events.select(
        "user_id",
        F.expr(
            f"pmod(datediff(CAST(ts AS DATE), {ZORDER_EPOCH}), 32)"
        ).alias("d_bucket"),
        F.expr("pmod(user_id, 32)").alias("u_bucket"),
    )
    z = interleave4("floor(u_bucket / 2)", "floor(d_bucket / 2)")
    return base.select(
        "user_id",
        "d_bucket",
        "u_bucket",
        F.expr(f"CAST(floor(({z}) / 8) AS INT)").alias("zfile"),
    )


def write_zorder_layout(events: DataFrame, path: str) -> None:
    """Write the z-ordered events layout: one parquet directory per
    z-file id, each holding exactly one data file (the id's rows are
    co-located by the pre-write repartition). ``partitionBy`` on the
    precomputed id keeps file membership deterministic — see module
    docstring for why not ``repartitionByRange``."""
    df = zorder_buckets(events)
    (
        df.repartition(ZORDER_N_FILES, "zfile")
        .sortWithinPartitions("zfile", "u_bucket", "d_bucket")
        .write.mode("overwrite")
        .partitionBy("zfile")
        .parquet(path)
    )


def read_zorder_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-written-file min/max statistics, computed from the READ-BACK
    artifact (not the writer's lineage): row count and the
    (u_bucket, d_bucket) ranges a min/max-pruning reader would consult.
    One keyed agg over the partition-discovered tree."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.col("zfile").cast("long").alias("zfile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("u_bucket").cast("long").alias("min_u"),
            F.max("u_bucket").cast("long").alias("max_u"),
            F.min("d_bucket").cast("long").alias("min_d"),
            F.max("d_bucket").cast("long").alias("max_d"),
        )
        .orderBy("zfile")
    )


def apply_zorder_increment(
    spark: SparkSession, late_events: DataFrame, path: str
) -> None:
    """Incremental maintenance of a written z-order layout: merge a
    late slice of events into the existing tree by rewriting ONLY the
    z-files the slice touches (dynamic partition overwrite — untouched
    directories keep their bytes). The new content of a touched file =
    its existing rows (read back from the artifact) ∪ the slice's rows,
    so after the call the tree is byte-for-byte equivalent in stats to
    a full rewrite over base ∪ slice — the payments_daily_mart_
    incremental discipline applied to physical layout.

    Scale shape: the slice's z-assignment is map-side math; the
    existing-rows leg reads only touched files (a broadcast semi join
    on the partition column prunes directories at scan time); the
    rewrite shuffles touched-file rows only. The eager checkpoint
    breaks the read-path → overwrite-path dependency (Spark refuses to
    overwrite a path its own plan is reading) and bounds the
    materialization at touched-files size, never layout size."""
    late = zorder_buckets(late_events)
    touched = late.select("zfile").distinct()
    existing = (
        spark.read.parquet(path)
        .join(F.broadcast(touched), "zfile")
        .select("user_id", "d_bucket", "u_bucket", "zfile")
    )
    merged = (
        existing.unionByName(
            late.select("user_id", "d_bucket", "u_bucket", "zfile")
        )
        .localCheckpoint(eager=True)
    )
    (
        merged.repartition(ZORDER_N_FILES, "zfile")
        .sortWithinPartitions("zfile", "u_bucket", "d_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("zfile")
        .parquet(path)
    )


def zorder_pruning_report(stats: DataFrame) -> DataFrame:
    """Min/max-pruning cost of the written layout, from its file stats:
    for every probe value of each dimension (the 32 user buckets, the
    32 day buckets), how many files have ``min <= probe <= max`` and
    must be read. Exactly the arithmetic a parquet scan's file-skipping
    performs against footer stats. Output: one row per dimension with
    the probe count and the average / worst-case files read."""
    probes = (
        stats.sparkSession.range(32)
        .select(F.col("id").cast("long").alias("probe"))
        .crossJoin(
            F.broadcast(
                stats.select("zfile", "min_u", "max_u", "min_d", "max_d")
            )
        )
    )
    from pos_pipeline_core_etl_spark.functions.rounding import hround

    per_probe = probes.select(
        "probe",
        F.expr(
            "explode(array("
            "named_struct('dim', 'user_bucket', 'hit', "
            "  CASE WHEN probe BETWEEN min_u AND max_u THEN 1 ELSE 0 END), "
            "named_struct('dim', 'day_bucket', 'hit', "
            "  CASE WHEN probe BETWEEN min_d AND max_d THEN 1 ELSE 0 END)))"
        ).alias("dh"),
    ).select("probe", F.col("dh.dim").alias("dim"), F.col("dh.hit").alias("hit"))
    files_per_probe = per_probe.groupBy("dim", "probe").agg(
        F.sum("hit").alias("nf")
    )
    return (
        files_per_probe.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            hround(F.sum("nf") / F.count(F.lit(1)), 6).alias("avg_files_read"),
            F.max("nf").alias("max_files_read"),
        )
        .orderBy("dim")
    )
