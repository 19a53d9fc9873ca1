"""Streaming deduplication over topic event streams.

Batch dedup (operators/dedup.py) answers "which of these N docs are
copies"; an ingest pipeline also needs the ONLINE form — drop events
whose content was already seen — so duplicates never reach the log or
the downstream training tables. The reference has no dedup at all (its
events are opaque); this extends the engine's streaming surface the
same way the batch operators extend its analytics surface.

Spark-first design: Structured Streaming's dropDuplicates[WithinWatermark]
IS the stateful streaming dedup operator — per-key state in the state
store, one shuffle on the dedup key, and (with a watermark) bounded
state: keys older than the event-time horizon are evicted, which is the
only way streaming dedup survives an unbounded stream at 100 TB.

Two state regimes:

- ``dedup_stream(..., within="10 minutes")`` — bounded state.
  Duplicates separated by more than the horizon re-emit; that is the
  documented trade for O(horizon-cardinality) state.
- ``dedup_stream(..., within=None)`` — exact forever-dedup via
  dropDuplicates; state grows with distinct keys (only for bounded
  topics / AvailableNow drains).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from mofka_spark.operators.dedup import normalize_text


def content_key(metadata_col: Column | str = "metadata") -> Column:
    """Dedup key for an event stream: md5 of normalized metadata text.
    Uniform 128-bit key — the dedup shuffle never skews."""
    col = F.col(metadata_col) if isinstance(metadata_col, str) else metadata_col
    return F.md5(normalize_text(col))

def dedup_stream(
    events: DataFrame,
    key: Column | list[str] | None = None,
    ts_col: str = "ingest_ts",
    within: str | None = "10 minutes",
) -> DataFrame:
    """Drop duplicate events from a streaming DataFrame.

    ``key``: a Column expression (default: md5 of normalized metadata),
    or a list of existing column names. ``within``: the event-time
    horizon that bounds state; None = exact dedup with unbounded state.

    Emission semantics (Spark): the FIRST event per key within the
    horizon is emitted; later copies are dropped while the key is in
    state. The output keeps the full event schema (the key column is
    internal unless the caller passed column names).
    """
    df = events
    if key is None:
        key = content_key()
    if isinstance(key, list):
        key_cols = key
        drop_after = None
    else:
        key_cols = ["_dedup_key"]
        drop_after = "_dedup_key"
        df = df.withColumn("_dedup_key", key)
    if within is None:
        out = df.dropDuplicates(key_cols)
    else:
        out = df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            key_cols
        )
    return out.drop(drop_after) if drop_after else out
