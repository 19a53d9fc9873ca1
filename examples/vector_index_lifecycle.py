"""Vector-index lifecycle — build, persist, search, refresh: the full
ANN serving story over a plain TEXT corpus with no external model.

    text corpus -> hash_embed (model-free vectors)
                -> kmeans_fit_full (coarse cells)
                -> pq_train (per-subspace codebooks)
                -> write_pq_codes (cell-partitioned code TABLE on disk)
                -> search_pq_codes (probe-pruned ADC top-k)
                -> pq_rerank (exact order within the shortlist)
    and the incremental path: pq_index_sink appends new batches to the
    same layout epoch-by-epoch (streaming/pqindex.py).

At 100 TB the code table IS the index: m small ints per vector
instead of 4d bytes, hive-partitioned by coarse cell so a query's
probe set prunes whole directories before any distance math runs
(PartitionFilters at plan time — pinned by tests/test_similarity.py
and tests/test_plans.py; recall vs exact is gated by doc_hash_ann).

Run:  PYTHONPATH=.. python vector_index_lifecycle.py
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mofka_spark.operators import similarity as S
from mofka_spark.operators.text import hash_embed
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    # 1. model-free embeddings: signed token hashing, bit-reproducible
    emb = hash_embed(docs, dim=64).withColumnRenamed(
        "id", "vec_id"
    ).localCheckpoint(eager=True)  # feeds fit + encode + queries once
    print("embedded docs:", emb.count())

    # 2. model state (driver-side, KBs): coarse cells + PQ codebooks.
    # method="sums" is the corpus-scale fit; gates pin "ordered".
    cents = S.kmeans_fit_full(emb, k=8, iters=2)
    books = S.pq_train(emb, m=4, k=16, iters=2)

    # 3. the persisted index: (id, codes, cell) hive-partitioned by
    # cell — 4 ints per doc here instead of 64 doubles (~32x smaller)
    root = tempfile.mkdtemp(prefix="vector-index-")
    table = os.path.join(root, "codes")
    S.write_pq_codes(
        S.pq_encode(emb, books, coarse_centroids=cents), table
    )
    cells = len(os.listdir(table))
    print(f"code table at {table}: {cells} cell directories")

    # 4. serve: probe-pruned ADC top-k straight off the table. The
    # probe union becomes a literal partition filter — unprobed cell
    # directories are never opened.
    queries = emb.filter(F.col("vec_id") < 3)
    hits = S.search_pq_codes(
        spark, table, queries, books, cents, k=10, nprobe=3
    )
    print("ADC shortlist (compressed-domain order):")
    hits.orderBy("query_id", "rank").show(9)

    # 5. exact order where it matters: rerank the shortlist against
    # the true vectors (only shortlist rows are ever re-read)
    codes = spark.read.parquet(table)
    exact = S.pq_rerank(
        queries, codes.drop("cell"), books, corpus=emb, k=3, shortlist=10
    )
    print("after exact rerank (top-3 per query):")
    exact.orderBy("query_id", "rank").show(9)

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
