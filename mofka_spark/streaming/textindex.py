"""Incrementally-maintained inverted index over streaming documents.

Batch ``operators/text.py inverted_index`` builds token -> (df, sorted
postings) in one pass. A live retrieval/pipeline deployment wants that
index to be FRESH as documents arrive without rescanning the corpus:
this module maintains it per micro-batch on the epoch-store protocol
(streaming/store.py — replay-idempotent epoch writes, merge-on-read,
compaction).

- the STORE is two epoch-partitioned tables under one root:
  ``postings/`` (token, doc)  — globally-distinct presence pairs
  ``meta/``     (n_docs)      — one row per epoch (df-bound input)
- per micro-batch: distinct (token, doc) pairs come out of the batch
  with the same presence-list trick as the batch operator (explode of
  array_distinct — no distinct exchange); pair rows and the batch's
  doc count append under ``_epoch=<id>``. Documents are unique across
  epochs (dense topic offsets), so the union of per-epoch pair sets
  IS the batch pair set — read_index therefore returns exactly
  ``inverted_index(all docs so far)``, the equality the gate pins.
- per-epoch cost is O(batch tokens): history is never read on the
  write path (unlike neardup, an index append has no cross-history
  candidates to find).

100 TB shape: read_index's df-bound pruning happens BEFORE posting
lists materialize, exactly like the batch operator; at deployment
scale, bucket ``postings/`` by token (operators/layout.py) so the
merge groupBy is exchange-free, and compact on a maintenance cadence
(compact_index) to bound per-token fragment counts.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mofka_spark.streaming.store import (
    compact_epoch_store,
    epoch_write,
    read_store,
)

_POSTINGS, _META = "postings", "meta"


def index_sink(
    store_path: str,
    id_col: str = "id",
    text_col: str = "text",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: extend the postings store with this batch's
    distinct (token, doc) pairs. Idempotent under epoch replay."""
    from mofka_spark.operators.dedup import normalize_text

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        docs = batch.select(
            F.col(id_col).cast("long").alias("doc"),
            F.col(text_col).alias("text"),
        ).filter(F.col("text").isNotNull()).persist()
        pairs = docs.select(
            "doc",
            F.explode(
                F.array_distinct(F.split(normalize_text(F.col("text")), " "))
            ).alias("token"),
        ).filter(F.col("token") != "").select("token", "doc")
        epoch_write(pairs, os.path.join(store_path, _POSTINGS), epoch_id)
        n = docs.count()
        epoch_write(
            spark.createDataFrame([(n,)], "n_docs long"),
            os.path.join(store_path, _META),
            epoch_id,
        )
        docs.unpersist()

    return write_epoch


def read_index(
    spark: SparkSession,
    store_path: str,
    min_df: int = 2,
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """token -> (df, sorted postings) from the accumulated store —
    identical contract AND result to the batch inverted_index over
    every document ingested so far (same df bounds, same pruning-
    before-collect order)."""
    pairs = read_store(
        spark, os.path.join(store_path, _POSTINGS), "token string, doc long"
    )
    n_docs = (
        read_store(spark, os.path.join(store_path, _META), "n_docs long")
        .agg(F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n"))
        .collect()[0]["n"]
    )
    max_df = int(n_docs * max_df_ratio)
    stats = (
        pairs.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )
    return (
        pairs.join(stats, "token")
        .groupBy("token")
        .agg(
            F.first("df").alias("df"),
            F.sort_array(F.collect_list("doc")).alias("postings"),
        )
        .select("token", F.col("df").cast("long").alias("df"), "postings")
    )


def compact_index(spark: SparkSession, store_path: str) -> None:
    """Collapse epoch fragments (streaming/store.py protocol). Reads
    are identical before and after."""
    for sub in (_POSTINGS, _META):
        path = os.path.join(store_path, sub)
        if os.path.isdir(path):
            compact_epoch_store(spark, path)
