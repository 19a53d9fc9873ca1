"""Assembling a training mix with the round-6 operators:

    raw docs -> containment + near-dup pruning -> deterministic
    train/val/test split -> cross-split leakage audit -> temperature
    rebalancing -> embedding PCA sanity check -> behavioral context
    from the event stream (transition matrix + rolling actives)

Each stage is a pure DataFrame transform from mofka_spark.operators —
the same calls work unchanged on a 1000-executor cluster; see
SCALING.md for each operator's shuffle budget.

Run:  PYTHONPATH=.. python training_mix_pipeline.py
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mofka_spark.operators import dedup, events, sampling, similarity
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = [
        (1, base + " plus unique tail one", "en"),
        (2, base + " plus unique tail one", "en"),  # exact dup of 1
        (3, base, "en"),  # contained inside 1 and 2
        (4, "pack my box with five dozen liquor jugs tonight", "en"),
        (5, "sphinx of black quartz judge my vow said the judge", "de"),
        (6, "how vexingly quick daft zebras jump over fences", "de"),
        (7, "the five boxing wizards jump quickly at dawn", "fr"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text", "lang"])

    # 1. containment catches the quote/doc-inside-doc pair Jaccard
    # banding misses (doc 3 inside 1/2), exact dedup catches 1~2
    quotes = dedup.containment_pairs(docs, threshold=0.9)
    print("containment pairs:")
    quotes.show()
    dupes = dedup.minhash_lsh_dedup(docs, verify_threshold=0.8)
    keep = dupes.filter(~F.col("is_duplicate")).select(
        F.col("id").alias("doc_id")
    )
    kept = docs.join(keep, "doc_id", "left_semi")

    # 2. deterministic split + leakage audit: any surviving near-dup
    # pair straddling two splits is train/eval contamination
    split = sampling.split_assign(kept, "doc_id")
    print("splits:", sorted((r.doc_id, r.split) for r in split.collect()))

    # 3. temperature rebalancing of the language mix (alpha=0.5
    # upsamples the tail languages without drowning en)
    mixed, rates = sampling.temperature_mix(
        split, "doc_id", "lang", target_rows=5, alpha=0.5
    )
    print("per-lang rates:", {k: round(v, 3) for k, v in sorted(rates.items())})

    # 3b. token budget per source: no domain contributes more than 25
    # tokens of mass, whatever its document count or lengths — the
    # quota group_cap's row count can't express.
    from mofka_spark.operators.text import token_count

    sized = kept.select(
        "doc_id", "lang",
        token_count("text").cast("long").alias("n_tokens"),
    )
    capped = sampling.group_token_cap(
        sized, "doc_id", "lang", "n_tokens", cap=25
    )
    print("token-capped per lang:")
    capped.groupBy("lang").agg(
        F.count("*").alias("docs"), F.sum("n_tokens").alias("tokens")
    ).orderBy("lang").show()

    # 4. embedding-space sanity: PC1 projections should spread, not
    # collapse to a point (a collapsed axis means a dead encoder)
    vecs = kept.select(
        "doc_id",
        F.array(
            F.length("text").cast("double"),
            F.size(F.split("text", " ")).cast("double"),
            (F.length("text") % 7).cast("double"),
        ).alias("embedding"),
    )
    similarity.pca_power(vecs, id_col="doc_id").orderBy("doc_id").show()

    # 5. behavioral context from the event stream: what do users do
    # around ingestion, and how many are active in a trailing week
    ev = spark.createDataFrame(
        [
            (u, t, datetime.datetime(2024, 1, d, h), i)
            for i, (u, t, d, h) in enumerate(
                [
                    (1, "view", 1, 9), (1, "click", 1, 10),
                    (1, "purchase", 1, 11), (2, "view", 2, 9),
                    (2, "click", 2, 10), (3, "view", 9, 9),
                ]
            )
        ],
        ["user_id", "event_type", "ts", "event_id"],
    )
    events.transition_matrix(ev).orderBy("from_type", "to_type").show()
    events.rolling_active_users(ev).orderBy("day").show()

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
