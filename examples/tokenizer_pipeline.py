"""Text -> training-tensor walkthrough: learn a BPE tokenizer on the
corpus, encode it, score it with the classifier stage, and pack the
surviving documents into fixed-capacity training windows — the round-9
bridge, end to end on one SparkSession.

Run:  PYTHONPATH=.. python tokenizer_pipeline.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mofka_spark.operators import packing
from mofka_spark.operators.quality import classifier_filter
from mofka_spark.operators.text import bpe_encode, bpe_train
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox naps under the warm sun",
        "sphinx of black quartz judge my vow",
        "!!! buy now; cheap... deals, click; here !!!",
        "the lazy dog naps under the quick brown fox",
    ] * 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )

    # 1. quality-filter with the batched classifier stage (the spam
    #    line scores low; plug a real model via scorer=)
    kept = classifier_filter(docs, threshold=0.3)
    print(f"classifier kept {kept.count()}/{docs.count()} docs")

    # 2. learn BPE merges on the surviving corpus (one corpus collapse,
    #    then bounded per-ROUND jobs: merges_per_round batches
    #    provably-sequential-equivalent merges — the 32k-merge
    #    production trainer)
    merges = bpe_train(kept, n_merges=24, merges_per_round=8)
    print("top merges:")
    for r in merges.orderBy("rank").limit(8).collect():
        print(f"  {r['rank']:>2}  {r['lhs']!r} + {r['rhs']!r} "
              f"-> {r['merged']!r}  (count {r['pair_count']})")

    # 2b. persist the TOKENIZER ARTIFACT (merges + train-time vocab):
    #     ids become a property of the tokenizer, so every later
    #     shard — or engine — encodes with identical token_ids
    import tempfile

    from mofka_spark.operators.text import (
        bpe_vocab_table, load_bpe_tokenizer, save_bpe_tokenizer,
    )

    tok_path = tempfile.mkdtemp(prefix="tokenizer-") + "/tok"
    save_bpe_tokenizer(tok_path, merges, bpe_vocab_table(merges, kept))
    merges2, vocab2 = load_bpe_tokenizer(spark, tok_path)

    # 3. encode WITH the loaded artifact: replace-chain for bounded
    #    tables; method="arrow" is the big-merge-table production
    #    path (bit-identical)
    enc = bpe_encode(kept, merges2, method="arrow", vocab=vocab2)
    per_doc = enc.groupBy("id").agg(
        F.count("*").cast("long").alias("n_tokens")
    )
    fert = enc.groupBy().agg(
        (F.count("*") / F.countDistinct("id", "word_pos")).alias("ppw")
    ).collect()[0]["ppw"]
    print(f"pieces per word: {fert:.2f}")

    # 4. pack into 32-token training windows with the span manifest a
    #    dataloader turns into attention/loss masks
    manifest = packing.pack_manifest(
        per_doc.withColumnRenamed("id", "doc_id"),
        id_col="doc_id", tokens_col="n_tokens", capacity=32,
    )
    print("first packed windows:")
    for r in manifest.orderBy("bin", "start_in_bin").limit(6).collect():
        print(f"  bin {r['bin']}: doc {r['id']} @ {r['start_in_bin']} "
              f"len {r['span_len']} start={r['is_doc_start']} "
              f"end={r['is_doc_end']}")

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
