"""Streaming sink: write a streaming DataFrame into a mofka topic.

Spark-first design choice: the sink is a ``foreachBatch`` writer around
``EventLog.append_batch`` rather than a custom DataSourceStreamWriter.
Rationale (SURVEY.md L1/P9): dense per-partition EventIDs require one
serialization point per partition per batch — exactly what the
reference's per-partition writer lock does
(/root/reference/src/DefaultPartitionManager.cpp:399-405). foreachBatch
gives the sink a whole-epoch view, so offsets are assigned with one
window over the micro-batch and one O(#partitions) ledger update, while
the Parquet append itself stays fully parallel. A per-task stream
writer would have to coordinate offset ranges across tasks mid-epoch —
strictly worse.

``ack_early`` parity (P10): the reference accepts-and-ignores the flag
(server drops ack_early_requested, /root/reference/src/ProviderImpl.hpp:137-160);
here it maps to skipping the (already-redundant-under-checkpointing)
ledger fsync — observable behavior identical, crash window documented.

Usage::

    writer = topic_sink(driver, "mytopic")
    (df.writeStream.foreachBatch(writer)
       .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topic_sink(
    driver,
    topic_name: str,
    metadata_col: str = "metadata",
    data_col: str | None = "data",
    partition_expr=None,
    sink_id: str = "default",
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function appending each epoch to the topic.

    The input batch needs a ``metadata`` (string JSON) column and
    optionally ``data`` (binary). Validation + partition selection come
    from the topic's persisted config, compiled to Column expressions —
    the whole epoch is validated/partitioned/offset-assigned as three
    narrow projections, no Python per row.

    Exactly-once: Structured Streaming re-runs the last epoch after a
    restart if foreachBatch succeeded but the checkpoint commit didn't.
    The sink therefore records (sink_id, epoch_id) INSIDE the ledger's
    atomic commit (EventLog.append_batch txn marker) and skips any
    epoch <= the recorded one — a replayed epoch is a no-op instead of
    a duplicate append.

    ``sink_id`` MUST be unique per logical query: epoch ids are scoped
    to a checkpoint, so a NEW query (fresh checkpoint, epochs restarting
    at 0) reusing a previous query's sink_id would see its first epochs
    skipped as "already committed". TopicHandle.write_stream derives
    sink_id from the checkpoint path, which has exactly the right
    lifetime (same checkpoint ⇒ same epoch numbering ⇒ same sink_id);
    only set it manually for hand-rolled foreachBatch wiring."""

    # cache the handle across epochs: a fresh EventLog per epoch would
    # re-run the footer-stats consistency scan (O(files), inside the
    # writer lock) on EVERY epoch — O(epochs^2) metadata IO overall
    state: dict = {}

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        if "topic" not in state:
            state["topic"] = driver.open_topic(topic_name)
        topic = state["topic"]
        if topic.log.committed_epoch(sink_id) >= epoch_id:
            return  # replayed epoch: already fully committed
        producer = topic.producer("stream-epoch")
        df = batch_df
        if metadata_col != "metadata":
            df = df.withColumnRenamed(metadata_col, "metadata")
        if data_col is None:
            df = df.withColumn("data", F.lit(None).cast("binary"))
        elif data_col != "data":
            df = df.withColumnRenamed(data_col, "data")
        producer.push_dataframe(
            df, partition_expr=partition_expr, txn=(sink_id, epoch_id)
        )

    return write_epoch
