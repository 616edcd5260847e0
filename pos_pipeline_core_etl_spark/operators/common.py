"""Cross-operator helpers shared by the dedup / text / sales / query
layers (promoted from ``operators.dedup`` module-privates — ADVICE r12
asked the query layer to stop importing a dedup internal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition when the source has too few input files for CPU-bound
    per-row work (a single-row-group parquet file arrives as ONE task —
    shingling / hashing / wide conditional aggregation would run
    single-threaded). Uses ``inputFiles()`` — no plan→RDD conversion
    (VERDICT r1). At real scale the input already has thousands of
    files/partitions and this is a no-op; for non-file-backed frames
    (tests) the planner's own parallelism stands.

    When ``key`` is (a prefix subset of) a downstream groupBy/join key,
    the inserted exchange is REUSED by that operator (hash partitioning
    on a subset of the grouping keys satisfies its clustered
    distribution), so the spread costs no extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if 0 < n_files < max(2, target // 2):
        return df.repartition(target, key)
    return df


def release_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind a ``localCheckpoint``-ed frame
    once it can never be read again (the NEXT iterate has materialized).

    ``DataFrame.unpersist()`` only clears cache-manager entries, not
    checkpoint blocks, so iterative loops that checkpoint per round
    otherwise leak one frame per round for the life of the job — the
    round-10 ladder's 15M-key ER OOM.  The analyzed plan of a
    checkpointed Dataset is exactly the ``LogicalRDD`` wrapping the
    persisted blocks; anything else (a frame that was never
    checkpointed) has no ``rdd`` accessor and is left alone."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
