"""MERGE / SCD upsert emulation (no Delta in this environment).

The reference's incremental model overwrites whole date ranges; a
cluster deployment wants row-level MERGE. Without a transactional
format, the standard emulation is anti-join + union (upsert) and the
window-closing variant for SCD-2 — both pure DataFrame ops that Delta's
MERGE INTO would replace one-for-one.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert: rows from ``updates`` replace matching-key rows in
    ``target``; unmatched target rows pass through."""
    keep = target.join(updates.select(*keys).distinct(), list(keys), "left_anti")
    return keep.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective_date: dt.date,
    tracked_cols: Sequence[str],
) -> DataFrame:
    """SCD-2: close the current window of changed keys and append the
    new version.

    ``dim`` columns: key, *tracked_cols, valid_from, valid_to (null =
    current). ``changes``: key, *tracked_cols. Unchanged keys (same
    tracked values) are left untouched. Keys present in ``changes`` but
    absent from ``dim`` are appended as initial versions (ADVICE r1),
    and keys whose versions are ALL closed (no current row) are
    re-activated with a fresh version (ADVICE r2) — hence the anti-join
    below is against CURRENT keys, not all dim keys.
    """
    current = dim.where(F.col("valid_to").isNull())
    changed_keys = (
        current.alias("c")
        .join(changes.alias("u"), key)
        .where(
            F.concat_ws("␟", *[F.coalesce(F.col(f"c.{t}").cast("string"), F.lit("")) for t in tracked_cols])
            != F.concat_ws("␟", *[F.coalesce(F.col(f"u.{t}").cast("string"), F.lit("")) for t in tracked_cols])
        )
        .select(F.col(f"c.{key}").alias(key))
        .distinct()
    )
    # keys with no CURRENT row get a fresh version: brand-new keys and
    # re-activated keys (all versions closed) alike
    new_keys = changes.select(key).distinct().join(
        current.select(key).distinct(), key, "left_anti"
    )
    version_keys = changed_keys.unionByName(new_keys)
    closed = (
        current.join(changed_keys, key)
        .withColumn("valid_to", F.lit(effective_date - dt.timedelta(days=1)))
    )
    untouched_current = current.join(changed_keys, key, "left_anti")
    history = dim.where(F.col("valid_to").isNotNull())
    new_versions = (
        changes.join(version_keys, key)
        .withColumn("valid_from", F.lit(effective_date))
        .withColumn("valid_to", F.lit(None).cast("date"))
        .select(*dim.columns)
    )
    return history.unionByName(closed).unionByName(untouched_current).unionByName(new_versions)
