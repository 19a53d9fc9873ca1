"""Training-corpus curation walkthrough with the round-5 operators:

    raw docs -> quality gate -> CDC chunk dedup stats -> fuzzy title
    reconciliation -> curriculum bins -> weighted sample -> TF-IDF
    retrieval spot-check -> blended-score keeper selection ->
    token-budget cut

Each stage is a pure DataFrame transform from mofka_spark.operators —
the same calls work unchanged on a 1000-executor cluster; see
SCALING.md for each operator's shuffle budget.

Run:  PYTHONPATH=.. python curation_pipeline.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mofka_spark.operators import dedup, joins, sampling, text
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    corpus = [
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "the quick brown fox jumps over the lazy dog", "web"),  # dup
        (3, "pack my box with five dozen liquor jugs", "books"),
        (4, "sphinx of black quartz judge my vow", "books"),
        (5, "a a a a a a a a a a a a", "web"),  # junk repetition
        (6, "how vexingly quick daft zebras jump", "news"),
        (7, "the five boxing wizards jump quickly", "news"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text", "source"])

    # 1. quality gate: token stats drop the degenerate repetition doc
    feats = text.quality_features(docs)
    kept = docs.join(
        feats.filter(F.col("mean_token_len") >= 2.0).select("doc_id"),
        "doc_id", "left_semi",
    )
    print("after quality gate:", sorted(r.doc_id for r in kept.collect()))

    # 2. chunk-level dedup accounting across sources
    stats = text.cdc_dedup_stats(kept, "source", w=2, divisor=2)
    stats.show(truncate=False)

    # 2b. DROP-FREE dedup: near-dup clusters get 1/cluster_size soft
    # weights instead of being removed — duplicated content keeps
    # appearing but contributes ~one unit of sampling mass in total.
    # The weight column feeds the weighted sample below (and the DSIR
    # log-weights in stage 7); exact-dup docs 1/2 each get 0.5.
    comps = dedup.minhash_lsh_dedup(
        kept, shingle_k=2, transitive=True, verify_threshold=0.8
    )
    soft = dedup.soft_dedup_weights(comps)
    print(
        "soft dedup weights:",
        sorted((r.id, r.cluster_size, r.weight) for r in soft.collect()),
    )
    weighted = kept.join(
        soft.select(F.col("id").alias("doc_id"), "weight"), "doc_id"
    )

    # 3. fuzzy reconciliation: noisy external titles -> canonical docs
    probes = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dogs",),
         ("pack my box with five dozen liqour jugs",)],
        ["probe"],
    )
    matches = joins.fuzzy_join_pairs(probes, kept, "probe", "text", max_dist=2)
    matches.show(truncate=False)

    # 4. curriculum bins by length, then weighted sample per source —
    # sampling mass = length x soft-dedup weight, so a doc duplicated
    # N times races with 1/N of its solo mass per copy (drop-free
    # dedup composed into selection; weighted_sample honors
    # fractional weights as-is)
    sized = weighted.withColumn(
        "n_chars", F.length("text")
    ).withColumn("mass", F.col("n_chars") * F.col("weight"))
    bins = sampling.rank_bins(sized, "n_chars", "source", "doc_id", n_bins=2)
    sample = sampling.weighted_sample(sized, "doc_id", "mass", "source", k=1)
    print("bins:", sorted((r.source, r.doc_id, r.bin) for r in bins.collect()))
    print("sample:", sorted((r.source, r.doc_id) for r in sample.collect()))

    # 5. retrieval spot-check over the curated set
    text.tfidf_scores(kept, ["quick", "jump"]).orderBy(
        F.desc("tfidf")
    ).show()

    # 6. corpus health: lexical diversity per doc, cross-source n-gram
    # overlap (which source pairs share boilerplate), and an
    # order-sensitive bigram-LM score (low = templated/shuffled text)
    print("lexical diversity (entropy / TTR):")
    text.token_entropy(docs).orderBy("id").show()
    print("cross-source n-gram overlap:")
    text.corpus_overlap(docs, strata_col="source", n=1).show()
    print("bigram LM scores (order-sensitive quality):")
    text.bigram_lm_score(kept).orderBy("id").show()

    # 7. domain-targeted selection: DSIR importance weights against a
    # target domain (here: the news docs), then Gumbel-top-k resample.
    # The soft-dedup weight folds into the log-weight additively
    # (logw + ln(1/cluster_size)): duplicated docs keep their domain
    # affinity but split their selection probability across copies.
    target = kept.filter(F.col("source") == "news")
    w = sampling.dsir_weights(kept, target)
    w_soft = w.join(soft.select("id", "weight"), "id").withColumn(
        "logw", F.col("logw") + F.log("weight")
    )
    print("DSIR selection (news-like first, dedup-discounted):")
    sampling.dsir_select(w_soft, 3).show()

    # 8. fuzzy decontamination vs a benchmark and a low-discrepancy
    # training order: every source spread uniformly through the epoch
    evals = spark.createDataFrame(
        [(100, "the quick brown fox leaps over the lazy dog")],
        ["doc_id", "text"],
    )
    flagged = text.fuzzy_decontaminate(kept, evals)
    clean = kept.join(
        flagged.filter(~F.col("contaminated")).select(F.col("id").alias("doc_id")),
        "doc_id", "left_semi",
    )
    order = sampling.interleave_strata(clean, "doc_id", "source")
    print("training order (interleaved):")
    order.orderBy("interleave_key", "source", "doc_id").show()

    # 8b. REAL-model classifier gate (the FineWeb-Edu-shaped stage):
    # a serialized hashed-feature logistic regression — weights in an
    # .npz artifact, loaded lazily ONCE per worker process inside the
    # Arrow-batched scoring stage (hashed_logistic_scorer), never
    # shipped per task. Here the "model" is trained by construction:
    # prose words get positive weight, the junk token negative.
    import os
    import tempfile
    import zlib

    import numpy as np

    from mofka_spark.operators import quality as qops

    n_feat = 256
    wts = np.zeros(n_feat)
    for tok in ("fox", "box", "wizards", "zebras", "quartz", "jugs"):
        wts[zlib.crc32(tok.encode()) % n_feat] += 2.0
    wts[zlib.crc32(b"a") % n_feat] -= 1.0  # the repetition doc's token
    model = os.path.join(tempfile.mkdtemp(prefix="clf-"), "lr.npz")
    np.savez(model, w=wts, b=np.float64(-1.0))
    scored = qops.classifier_filter(
        docs,
        threshold=0.5,
        scorer=qops.hashed_logistic_scorer(model),
    )
    print("real-model classifier gate (sigmoid > 0.5):")
    scored.select("doc_id", "score").orderBy("doc_id").show()

    # 8c. calibrate the cutoff BEFORE committing it: the retention
    # curve sweeps candidate thresholds in ONE aggregate pass and
    # reports docs/tokens surviving each — pick the threshold from the
    # retention constraint ("keep >= X% of tokens"), not from the
    # score's absolute value.
    curve_in = qops.classifier_scores(
        docs, scorer=qops.hashed_logistic_scorer(model), keep_cols=True
    ).withColumn("n_tokens", text.token_count("text").cast("long"))
    print("retention curve (threshold -> surviving docs/tokens):")
    qops.retention_curve(
        curve_in, [0.3, 0.5, 0.7], weight_col="n_tokens"
    ).orderBy("threshold").show()

    # 9. quality-aware keeper selection + blended scoring + budget cut:
    # instead of stage 2b's min-id keepers, keep each near-dup
    # cluster's BEST member under a rank-normalized blend of signals
    # (token count up-weighted, junk repetition penalized), then fill
    # a fixed token budget with the top-blended survivors — the
    # end-to-end "dedup by quality, then spend the budget" path.
    sigs = docs.join(
        text.repetition_signals(docs).select(
            F.col("id").alias("doc_id"), "top_bigram_frac"
        ),
        "doc_id",
    ).select(
        "doc_id",
        text.token_count("text").cast("long").alias("n_tokens"),
        F.col("top_bigram_frac"),
    )
    blended = qops.blend_scores(
        sigs, {"n_tokens": 0.7, "top_bigram_frac": -0.3}, "doc_id"
    )
    reps = dedup.cluster_representatives(
        comps.select("id", "keeper_id"),
        blended.select(F.col("doc_id").alias("id"), "blended"),
        score_col="blended",
    )
    print("cluster representatives (best blended member kept):")
    reps.orderBy("keeper_id").show()
    survivors = sigs.join(
        reps.select(F.col("rep_id").alias("doc_id")), "doc_id", "left_semi"
    ).join(blended.select("doc_id", "blended"), "doc_id")
    picked = sampling.curriculum_select(
        survivors, "blended", "n_tokens", "doc_id", budget=20
    )
    print("token-budget selection (20-token budget):")
    picked.orderBy(F.desc("blended")).show()

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
