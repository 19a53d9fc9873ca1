"""Streaming data-quality monitor: the constraint audit
(operators/quality.py) maintained incrementally over a live topic.

Row-level rules (not_null / in_range / is_in / matches) compile to
conditional counts, which are DISTRIBUTIVE: each micro-batch appends
its one-row partial counts under the epoch-store protocol
(streaming/store.py — replay-idempotent), and the running audit is the
column-wise SUM of partials, equal at every point to the batch
``audit`` over all rows seen. ``unique`` is NOT distributive (distinct
state spans batches) and is rejected — streaming uniqueness is what
streaming/dedup.py and the HLL sketches are for.

100 TB shape: per-epoch cost is the batch's own scan (map-side
conditional counts, one-row result); the store grows one row per
epoch and compacts like every other epoch store; reads are
O(#epochs x #rules) metadata, never data-sized.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mofka_spark.streaming.store import (
    compact_epoch_store,
    epoch_write,
    read_store,
)


def audit_sink(
    store_path: str,
    rules: list[tuple[str, Column]],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: append this batch's per-rule violation
    partials. Raises on non-distributive rules."""
    for name, _ in rules:
        if name.startswith("unique("):
            raise ValueError(
                f"rule {name!r} is not distributive across micro-batches; "
                "track stream uniqueness with streaming dedup or an HLL "
                "sketch instead"
            )

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        row = batch.agg(
            *[
                F.coalesce(expr.cast("long"), F.lit(0)).alias(f"_r{i}")
                for i, (_, expr) in enumerate(rules)
            ]
        )
        epoch_write(row, os.path.join(store_path, "partials"), epoch_id)

    return write_epoch


def read_audit(
    spark: SparkSession,
    store_path: str,
    rules: list[tuple[str, Column]],
) -> DataFrame:
    """(rule, violations) totals — equal to quality.audit over every
    row ingested so far."""
    schema = ", ".join(f"_r{i} long" for i in range(len(rules)))
    partials = read_store(
        spark, os.path.join(store_path, "partials"), schema
    )
    totals = partials.agg(
        *[
            F.coalesce(F.sum(f"_r{i}"), F.lit(0)).alias(f"_r{i}")
            for i in range(len(rules))
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_r{i}").cast("long").alias("violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return totals.select(F.explode(pairs).alias("p")).select(
        "p.rule", "p.violations"
    )


def compact_monitor(spark: SparkSession, store_path: str) -> None:
    path = os.path.join(store_path, "partials")
    if os.path.isdir(path):
        compact_epoch_store(spark, path)
