"""Incremental ingest-time dedup + ANN index walkthrough: the two
persisted state stores a training-data pipeline maintains AS documents
and embeddings arrive (streaming/neardup.py, streaming/annindex.py),
driven here batch-by-batch so the store mechanics are visible. In
production the same sinks hang off topic.read_stream(...)
.writeStream.foreachBatch(...) — see the streaming_neardup /
streaming_ann_index gates in mofka_spark/queries.py.

Run:  PYTHONPATH=.. python incremental_dedup_index.py
"""

from __future__ import annotations

import tempfile

from mofka_spark.operators.similarity import fit_centroids
from mofka_spark.session import get_spark
from mofka_spark.streaming.annindex import (
    ann_index_sink,
    compact_index,
    search_index,
)
from mofka_spark.streaming.neardup import (
    compact_store,
    neardup_sink,
    read_result,
)


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")

    # --- near-dup: batches arrive, each checks against ALL history ---
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated text about parquet row groups")],
        [(3, "the quick brown fox jumps over the lazy dog today"),
         (4, "another novel document about broadcast joins")],
        [(5, "the quick brown fox jumps over the lazy dog today")],
    ]
    store = tempfile.mkdtemp(prefix="neardup-") + "/store"
    sink = neardup_sink(store, num_hashes=32, bands=16)
    for epoch, rows in enumerate(batches):
        sink(spark.createDataFrame(rows, "id long, text string"), epoch)
    print("near-dup ledger after 3 epochs (docs 3 and 5 dup doc 1):")
    read_result(spark, store).orderBy("id").show()
    compact_store(spark, store)  # epoch fragments -> one slot, same answer

    # --- Bloom prefilter: the cheap "seen this exact key before?"
    # membership gate that runs BEFORE the (pricier) near-dup check —
    # O(m/64) rows of state, no false negatives ---
    from pyspark.sql import functions as F

    from mofka_spark.streaming.bloom import bloom_sink, read_membership

    bf = tempfile.mkdtemp(prefix="bloom-") + "/store"
    seen = bloom_sink(bf, "key", m_bits=1 << 14, k=4)
    for epoch, rows in enumerate(batches):
        batch = spark.createDataFrame(rows, "id long, text string")
        seen(batch.select(F.md5("text").alias("key")), epoch)
    probe = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",),
         ("never ingested text",)],
        "text string",
    ).select("text", F.md5("text").alias("key"))
    print("bloom membership (exact-text prefilter):")
    read_membership(spark, bf, probe, "key", m_bits=1 << 14, k=4).select(
        "text", "might_contain"
    ).show(truncate=45)

    # --- ANN index: vectors arrive, the index grows, searches prune ---
    vecs = [(i, [float(i % 4 == j) + 0.01 * i for j in range(4)])
            for i in range(32)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cents = fit_centroids(emb, "vec_id", "embedding", n_centroids=4, seed=7)
    idx = tempfile.mkdtemp(prefix="annidx-") + "/store"
    ann = ann_index_sink(idx, cents, id_col="vec_id")
    ann(emb.filter("vec_id < 16"), 0)
    ann(emb.filter("vec_id >= 16"), 1)
    compact_index(spark, idx)
    queries = emb.filter("vec_id < 2")
    print("top-3 neighbors from the incrementally-built index:")
    search_index(spark, idx, queries, cents, k=3, nprobe=2).orderBy(
        "query_id", "rank"
    ).show()

    # --- batch-shaped ingest against a materialized signature index:
    # the same decision table cross_corpus_dedup produces when the
    # index corpus's band rows are persisted once (bucketize them on
    # (band_id, band_hash) and the store side of the candidate join
    # reads with no Exchange) and each arriving batch computes only
    # ITS OWN signatures.
    from mofka_spark.operators.dedup import (
        cross_corpus_dedup,
        minhash_band_rows,
    )

    index_docs = spark.createDataFrame(
        batches[0], "id long, text string"
    )
    index_bands = minhash_band_rows(index_docs, "id", "text")
    arriving = spark.createDataFrame(
        batches[1], "id long, text string"
    )
    print("cross-corpus verdicts for the arriving batch:")
    cross_corpus_dedup(
        arriving, index_docs, id_col="id", index_bands=index_bands
    ).orderBy("id").show()

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
