"""Snapshot diffing — corpus versioning over keyed tables.

Topics give immutable dense-offset cuts (TopicHandle.snapshot); this
module compares two such cuts (or any two keyed frames) and emits the
delta: which keys were added, removed, or changed. The training-data
use: audit exactly what a recrawl/refilter changed between two corpus
versions before retraining on it.

Scale shape: one full outer join on the key (both sides shuffle once,
co-partitioned); payload comparison travels as a 64-bit hash computed
map-side, so wide payloads never shuffle twice. Output carries only
keys + change class — O(delta), not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cmp_cols: list[str],
) -> DataFrame:
    """Keyed delta between two frames: (key..., change) with change in
    {'added', 'removed', 'changed'}; unchanged keys are absent.

    ``cmp_cols`` define payload equality (compared via xxhash64 of the
    column struct, computed before the shuffle). Keys must be unique
    per side — pre-aggregate if not (a topic cut keyed by event id is).
    """
    o = old.select(
        *key_cols, F.xxhash64(F.struct(*cmp_cols)).alias("_oh")
    )
    n = new.select(
        *key_cols, F.xxhash64(F.struct(*cmp_cols)).alias("_nh")
    )
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
