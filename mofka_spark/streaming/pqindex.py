"""Incrementally-maintained IVF-PQ index: the compressed-domain
variant of streaming/annindex.py.

The raw-vector ANN store keeps 4d bytes per vector; at corpus scale
the index dominates storage. This store keeps m log2(k)-bit PQ codes
instead (operators/similarity.py pq_encode) — 64-dim float32 vectors
become 2-4 int codes — and searches with the asymmetric distance
(ivfpq_topk): per-query lookup tables against the frozen codebooks,
true vectors never read. Re-rank survivors against the raw corpus
with pq_rerank when exact final order matters.

Protocol (shared with annindex/rollup/neardup — streaming/store.py):

- codebooks AND the coarse cell model are fit once and frozen
  (pq_train / kmeans_fit_full); a periodic re-fit + re-encode is the
  compaction analog, not a per-batch cost;
- each epoch encodes the batch scan-locally (codebooks are plan
  literals) and appends (id, codes, cell) under ``cell=<c>/_epoch=<e>``
  with dynamic partition overwrite — replayed epochs replace their own
  leaves, so foreachBatch retries are idempotent;
- search probes each query's ``nprobe`` nearest coarse cells; the
  probed set becomes a LITERAL isin predicate, so the ``cell=``
  partition column prunes unprobed directories at planning time, and
  the scan reads only thin code rows.

Deterministic end to end: an index built over ANY batch partitioning
returns bit-identical results to batch ivfpq_topk given the same
models (pinned in tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from mofka_spark.operators.similarity import (
    _sqdist_to_literal,
    ivfpq_topk,
    pq_encode,
)
from mofka_spark.streaming.store import (
    compact_epoch_store,
    epoch_write,
    read_store,
)


def compact_pq_index(spark: SparkSession, store_path: str) -> None:
    """Collapse epoch fragments within each cell directory (search
    results identical before and after; cell= pruning survives)."""
    compact_epoch_store(spark, store_path, partition_cols=("cell",))


def pq_index_sink(
    store_path: str,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    id_col: str = "id",
    vec_col: str = "embedding",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer: PQ-encode the batch against the frozen
    codebooks and extend the cell-partitioned code store."""

    def write_epoch(batch: DataFrame, epoch_id: int) -> None:
        codes = pq_encode(
            batch,
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
            coarse_centroids=coarse_centroids,
        )
        epoch_write(codes, store_path, epoch_id, partition_cols=("cell",))

    return write_epoch


def search_pq_index(
    spark: SparkSession,
    store_path: str,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k from the incrementally-built code store: probe cells
    collect to the driver (O(#queries x nprobe) small ints) and become
    the isin literal that prunes cell directories; ivfpq_topk then
    ranks the surviving code rows — the store never yields a vector."""
    qv = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col)
    )
    probe_rank = F.array_sort(
        F.array(
            *[
                F.struct(
                    _sqdist_to_literal(F.col(vec_col), c).alias("d"),
                    F.lit(j).cast("int").alias("cell"),
                )
                for j, c in enumerate(coarse_centroids)
            ]
        )
    )
    probed = sorted(
        {
            r["cell"]
            for r in qv.select(
                F.explode(
                    F.slice(probe_rank, 1, nprobe)
                ).alias("p")
            )
            .select(F.col("p.cell").alias("cell"))
            .distinct()
            .collect()
        }
    )
    codes = read_store(
        spark, store_path, "id long, codes array<int>, cell int"
    ).filter(F.col("cell").isin(probed))
    return ivfpq_topk(
        queries,
        codes,
        codebooks,
        coarse_centroids,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
    )
