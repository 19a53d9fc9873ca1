"""Epoch-partitioned parquet stores: the shared persistence protocol
behind the incremental streaming operators (rollup partials, neardup
signature/edge tables, ANN index cells).

Protocol (the LSM shape, entirely in Spark operators):

- WRITE: each micro-batch lands under ``[partition_cols...]/_epoch=<id>``
  with dynamic partition overwrite — a replayed epoch REPLACES exactly
  the leaves it writes, so foreachBatch retries after failure/restart
  are idempotent with no side ledger. Epoch ids come from Spark's
  checkpoint and are monotonically increasing.
- READ: scan the store, drop ``_epoch`` — readers never block on
  writers (parquet files are immutable once visible).
- COMPACT: when per-group epoch fragments outgrow the merge-on-read
  budget, rewrite the store into the reserved ``_epoch=-1`` slot
  (real epochs are >= 0, so future appends never collide) and swap
  directories. Readers see identical content before and after; the
  swap is two renames — production on an object store would commit via
  a table format's log (Delta/Iceberg), which owns exactly this step.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

COMPACTED_EPOCH = -1


def epoch_write(
    df: DataFrame,
    path: str,
    epoch_id: int,
    partition_cols: tuple[str, ...] = (),
) -> None:
    """Append one epoch's rows idempotently (see module docstring)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            df.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .partitionBy(*partition_cols, "_epoch")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_store(
    spark: SparkSession,
    path: str,
    schema: str,
    as_of_epoch: int | None = None,
) -> DataFrame:
    """The accumulated store, or an empty frame of ``schema`` before
    the first epoch lands (keeps per-epoch plans identical across
    epochs — the first batch unions with an empty relation instead of
    branching).

    ``as_of_epoch`` time-travels: only partials from epochs <= the
    given id (the state the store held after that micro-batch
    committed — reproducible reads for debugging replays and
    comparing runs). The compacted slot (_epoch = -1) is always
    included: it REPRESENTS every epoch folded at compaction time, so
    compaction trades time-travel granularity below the compaction
    point for size — the standard LSM deal. The filter is on the
    partition column, so Spark prunes non-qualifying epoch
    directories at plan time."""
    if os.path.isdir(path) and any(
        "=" in e or e.endswith(".parquet") for e in os.listdir(path)
    ):
        df = spark.read.parquet(path)
        if as_of_epoch is not None:
            df = df.filter(F.col("_epoch") <= int(as_of_epoch))
        return df.drop("_epoch")
    return spark.createDataFrame([], schema)


def compact_epoch_store(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = (),
    dedup: bool = False,
) -> None:
    """Rewrite all epoch fragments into the ``_epoch=-1`` slot,
    preserving ``partition_cols`` layout (so e.g. the ANN store's
    cell= directory pruning survives compaction). ``dedup=True``
    additionally collapses full-row duplicates — correct for stores
    whose readers are set-semantic (the neardup edge table; its
    read-side distinct() becomes cheaper after)."""
    df = spark.read.parquet(path).drop("_epoch")
    if dedup:
        df = df.distinct()
    merged = df.withColumn("_epoch", F.lit(COMPACTED_EPOCH))
    tmp = path.rstrip("/") + ".compact-tmp"
    merged.write.mode("overwrite").partitionBy(*partition_cols, "_epoch").parquet(
        tmp
    )
    old = path.rstrip("/") + ".compact-old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
