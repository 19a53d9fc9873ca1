"""vocab_stats / decontaminate operator tests (values + plan shape)."""

from pyspark.sql import functions as F

from mofka_spark import plans
from mofka_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestVocabStats:
    def test_counts_and_tiebreak(self, spark):
        docs = _docs(spark, [(1, "a b a b c"), (2, "a b x")])
        out = text.vocab_stats(docs, n=1).collect()
        m = {r.gram: (r.n_total, r.n_docs) for r in out}
        assert m["a"] == (3, 2) and m["b"] == (3, 2)
        assert m["c"] == (1, 1) and m["x"] == (1, 1)
        # deterministic order: count desc, gram asc
        assert [r.gram for r in out] == ["a", "b", "c", "x"]

    def test_min_count_and_topk(self, spark):
        docs = _docs(spark, [(1, "a a a b b c")])
        out = text.vocab_stats(docs, n=1, top_k=2, min_count=2).collect()
        assert [(r.gram, r.n_total) for r in out] == [("a", 3), ("b", 2)]

    def test_partial_aggregation(self, spark):
        docs = _docs(spark, [(1, "a b")])
        p = plans.plan_string(text.vocab_stats(docs, n=1))
        assert "partial_" in p  # map-side combine before the shuffle


class TestDecontaminate:
    def test_flags_overlap(self, spark):
        eight = "one two three four five six seven eight"
        docs = _docs(
            spark,
            [
                (1, f"prefix {eight} suffix"),   # contains the eval 8-gram
                (2, "totally different words here with no overlap at all"),
                (3, eight),                       # the eval doc itself
            ],
        )
        eval_docs = _docs(spark, [(100, eight)])
        out = {r.id: (r.n_hits, r.contaminated) for r in
               text.decontaminate(docs, eval_docs, n=8).collect()}
        assert out[1] == (1, True)
        assert out[2] == (0, False)
        assert out[3] == (1, True)

    def test_eval_side_broadcasts(self, spark):
        docs = _docs(spark, [(1, "a b c d e f g h i")])
        ev = _docs(spark, [(9, "a b c d e f g h")])
        p = plans.plan_string(text.decontaminate(docs, ev, n=8))
        assert "BroadcastHashJoin" in p


class TestWinnowFingerprints:
    def test_shared_passage_shares_fingerprint(self, spark):
        # docs sharing a passage of length >= k + window - 1 = 8 chars
        # are guaranteed >= 1 common fingerprint
        passage = "a shared common passage of text"
        # doc 3 uses a disjoint alphabet: no common 5-shingle exists,
        # so no fingerprint can collide (precision is only guaranteed
        # when the shingle sets are disjoint — winnowing guarantees
        # recall, not precision, on overlapping shingle sets)
        docs = _docs(spark, [(1, "xxxx " + passage), (2, passage + " yyyy"),
                             (3, "0123456789012345678901234567890123456789")])
        fps = text.winnow_fingerprints(docs).collect()
        by_doc = {}
        for r in fps:
            by_doc.setdefault(r.id, set()).add(r.fingerprint)
        assert by_doc[1] & by_doc[2]
        assert not by_doc[1] & by_doc[3]
        assert not by_doc[2] & by_doc[3]

    def test_local_edit_keeps_most_fingerprints(self, spark):
        base = "the quick brown fox jumps over the lazy dog and runs far away"
        edited = base.replace("jumps", "leaps")
        docs = _docs(spark, [(1, base), (2, edited)])
        fps = text.winnow_fingerprints(docs).collect()
        a = {r.fingerprint for r in fps if r.id == 1}
        b = {r.fingerprint for r in fps if r.id == 2}
        # one word edit perturbs only windows overlapping it
        assert len(a & b) / len(a | b) > 0.5

    def test_deterministic(self, spark):
        docs = _docs(spark, [(1, "some text for determinism checks")])
        one = sorted(r.fingerprint for r in text.winnow_fingerprints(docs).collect())
        two = sorted(r.fingerprint for r in text.winnow_fingerprints(docs).collect())
        assert one == two and len(one) >= 1


class TestRepetitionSignals:
    def test_values(self, spark):
        docs = _docs(spark, [(1, "a a a b"), (2, "x y z w")])
        m = {r.id: r for r in text.repetition_signals(docs).collect()}
        r1 = m[1]
        assert r1.n_tokens == 4
        assert r1.distinct_ratio == 0.5
        assert r1.top_unigram_frac == 0.75       # "a" 3/4
        assert r1.top_bigram_frac == round(2 / 3, 6)  # "a a" 2/3
        r2 = m[2]
        assert r2.distinct_ratio == 1.0
        assert r2.top_unigram_frac == 0.25
        assert r2.top_bigram_frac == round(1 / 3, 6)

    def test_single_token_doc(self, spark):
        out = text.repetition_signals(_docs(spark, [(1, "solo")])).collect()[0]
        assert out.n_tokens == 1
        assert out.top_unigram_frac == 1.0
        # 1-token doc: word_ngrams yields the token itself as one gram
        assert out.top_bigram_frac == 1.0

    def test_no_shuffle(self, spark):
        from mofka_spark import plans

        docs = _docs(spark, [(1, "a b")])
        p = plans.plan_string(text.repetition_signals(docs))
        # the only exchange allowed is the _spread repartition
        assert p.count("Exchange") <= 1


class TestPiiScan:
    def test_counts_and_redaction(self, spark):
        docs = _docs(
            spark,
            [
                (1, "mail bob@site.org and sue@x.co now"),
                (2, "call +4915551234567 ok"),
                (3, "host 192.168.0.1 and 10.0.0.2"),
                (4, "clean text"),
            ],
        )
        m = {r.id: r for r in text.pii_scan(docs).collect()}
        assert (m[1].n_emails, m[1].n_phones, m[1].n_ipv4) == (2, 0, 0)
        assert m[1].redacted == "mail <EMAIL> and <EMAIL> now"
        assert m[2].n_phones == 1 and m[2].redacted == "call <PHONE> ok"
        assert m[3].n_ipv4 == 2 and m[3].redacted == "host <IP> and <IP>"
        assert m[4].n_pii == 0 and m[4].redacted == "clean text"

    def test_no_redact_column(self, spark):
        out = text.pii_scan(_docs(spark, [(1, "x")]), redact=False)
        assert "redacted" not in out.columns


class TestChunkDocuments:
    def test_overlap_and_tail(self, spark):
        words = " ".join(f"w{i}" for i in range(10))
        out = text.chunk_documents(
            _docs(spark, [(1, words)]), chunk_tokens=4, stride=3
        ).collect()
        chunks = {r.chunk_id: r for r in sorted(out, key=lambda r: r.chunk_id)}
        # 10 tokens, chunk 4, stride 3 -> ceil((10-4)/3)+1 = 3 chunks
        assert len(chunks) == 3
        assert chunks[0].chunk == "w0 w1 w2 w3"
        assert chunks[1].chunk == "w3 w4 w5 w6"
        assert chunks[2].chunk == "w6 w7 w8 w9"
        assert all(r.n_chunk_tokens == 4 for r in out)

    def test_short_doc_single_chunk(self, spark):
        out = text.chunk_documents(
            _docs(spark, [(1, "a b")]), chunk_tokens=64, stride=48
        ).collect()
        assert len(out) == 1
        assert out[0].chunk == "a b" and out[0].n_chunk_tokens == 2

    def test_invalid_params(self, spark):
        import pytest

        with pytest.raises(ValueError):
            text.chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=0)


class TestLmScore:
    def test_mle_logprob(self, spark):
        import math

        # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
        docs = _docs(spark, [(1, "a a a"), (2, "b")])
        m = {r.id: r for r in text.lm_score(docs).collect()}
        assert m[1].n_tokens == 3
        assert m[1].avg_logp == round(math.log(3 / 4), 6)
        assert m[2].avg_logp == round(math.log(1 / 4), 6)

    def test_common_scores_higher(self, spark):
        docs = _docs(
            spark,
            [(1, "the the the the"), (2, "rare words here now")],
        )
        m = {r.id: r.avg_logp for r in text.lm_score(docs).collect()}
        assert m[1] > m[2]


class TestDupSpans:
    def test_planted_shared_span(self, spark):
        shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
        docs = _docs(
            spark,
            [
                (1, f"{shared} unique tail one"),
                (2, f"other head {shared}"),
                (3, "totally different words nothing repeated here at all"),
            ],
        )
        out = {r.id: r for r in text.dup_spans(docs, n=8).collect()}
        # doc 1: 4 windows (11 tokens), exactly 1 (the shared span) dup
        assert out[1].n_windows == 4 and out[1].n_dup_windows == 1
        # doc 2: 3 windows (10 tokens), the shared span is its 3rd
        assert out[2].n_windows == 3 and out[2].n_dup_windows == 1
        assert out[3].n_dup_windows == 0 and out[3].dup_frac == 0.0
        assert abs(out[1].dup_frac - 0.25) < 1e-9

    def test_short_doc_single_window(self, spark):
        # < n tokens: one window covering the whole doc; identical short
        # docs are cross-doc duplicates of each other
        docs = _docs(spark, [(1, "tiny doc"), (2, "tiny doc"), (3, "tiny other")])
        out = {r.id: r for r in text.dup_spans(docs, n=8).collect()}
        assert out[1].n_windows == 1 and out[1].n_dup_windows == 1
        assert out[2].dup_frac == 1.0
        assert out[3].n_dup_windows == 0

    def test_same_doc_repeat_not_cross(self, spark):
        # a span repeated WITHIN one doc only is not cross-doc duplication
        span = "a b c d e f g h"
        docs = _docs(spark, [(1, f"{span} x {span}"), (2, "nothing shared here")])
        out = {r.id: r for r in text.dup_spans(docs, n=8).collect()}
        assert out[1].n_dup_windows == 0


class TestGopherQuality:
    def test_rules(self, spark):
        good = "the cat and the dog walked to the house of friends " * 6
        docs = _docs(
            spark,
            [
                (1, good),                                    # passes all
                (2, "short text only"),                       # too few words
                (3, "### " * 60 + good),                      # symbol ratio
                (4, ("x1 " * 80).strip()),                    # non-alpha words + no stopwords
            ],
        )
        out = {r.id: r for r in text.gopher_quality(docs).collect()}
        assert out[1].pass_quality
        assert not out[2].pass_quality and out[2].n_words == 3
        assert not out[3].pass_quality and out[3].symbol_ratio > 0.1
        assert not out[4].pass_quality and out[4].alpha_frac == 0.0

    def test_single_scan_no_shuffle(self, spark):
        from mofka_spark import plans

        docs = _docs(spark, [(1, "the and of")])
        p = plans.plan_string(text.gopher_quality(docs))
        assert "Exchange" not in p


class TestTfidfScores:
    def test_higher_tf_scores_higher(self, spark):
        docs = _docs(
            spark,
            [
                (1, "spark spark spark noise"),
                (2, "spark noise filler words"),
                (3, "unrelated content here now"),
            ],
        )
        out = {r.id: r for r in text.tfidf_scores(docs, ["spark"]).collect()}
        assert set(out) == {1, 2}  # doc 3 matches no term
        assert out[1].tfidf > out[2].tfidf
        assert all(r.n_terms == 1 for r in out.values())

    def test_cosine_bounded_and_full_match(self, spark):
        # a doc that IS the query (each term once) has cosine < 1 only
        # because idf weights differ; all scores within [0, 1]
        docs = _docs(
            spark,
            [(1, "alpha beta"), (2, "alpha gamma delta"), (3, "beta beta")],
        )
        rows = text.tfidf_scores(docs, ["alpha", "beta"]).collect()
        assert rows and all(0.0 <= r.tfidf <= 1.0 for r in rows)
        one = [r for r in rows if r.id == 1][0]
        assert one.n_terms == 2

    def test_shuffles_carry_no_text(self, spark):
        # the exploded tf frame shuffles (id, token) pairs; the raw
        # text column must not survive past the scan projection
        docs = _docs(spark, [(1, "a b"), (2, "b c")])
        p = plans.plan_string(text.tfidf_scores(docs, ["a"]))
        assert "partial_count" in p  # map-side combine on tf


class TestCdcChunks:
    def test_chunks_cover_document(self, spark):
        docs = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")])
        rows = text.cdc_chunks(docs, w=2, divisor=2).orderBy("chunk_idx").collect()
        assert sum(r.n_words for r in rows) == 10
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))

    def test_edit_locality(self, spark):
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        edited = base.rsplit(" ", 1)[0] + " CHANGED"
        docs = _docs(spark, [(1, base), (2, edited)])
        rows = text.cdc_chunks(docs, w=2, divisor=2).collect()
        h1 = [r.chunk_hash for r in rows if r.doc_id == 1]
        h2 = [r.chunk_hash for r in rows if r.doc_id == 2]
        # every chunk before the edited tail is byte-identical
        shared = len(set(h1) & set(h2))
        assert shared >= len(h1) - 2

    def test_identical_docs_share_all_chunks(self, spark):
        t = "one two three four five six seven eight nine ten"
        docs = spark.createDataFrame(
            [(1, t, "s1"), (2, t, "s2")], ["doc_id", "text", "source"]
        )
        stats = {
            r.source: r
            for r in text.cdc_dedup_stats(docs, "source", w=2, divisor=2).collect()
        }
        assert stats["s1"].shared_ratio == 1.0
        assert stats["s2"].shared_ratio == 1.0

    def test_no_shuffle_before_chunks(self, spark):
        docs = _docs(spark, [(1, "a b c d e f")])
        p = plans.plan_string(text.cdc_chunks(docs, w=2, divisor=2))
        assert "Exchange" not in p


class TestDistinctiveTerms:
    def test_group_exclusive_token_tops_rank(self, spark):
        from mofka_spark.operators.text import distinctive_terms

        # "zebra" appears only in group A and often; shared filler
        # tokens are at corpus rate and must not outrank it
        rows = [
            (1, "A", "zebra zebra zebra common words here"),
            (2, "A", "zebra common words here"),
            (3, "B", "common words here again and again"),
            (4, "B", "more common words here"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = distinctive_terms(df, "source", k=3).collect()
        top_a = [r.tok for r in out if r.source == "A" and r.rnk == 1]
        assert top_a == ["zebra"]
        # zebra is absent from B, so it can never appear in B's list
        assert all(r.tok != "zebra" for r in out if r.source == "B")

    def test_only_overrepresented_terms(self, spark):
        from mofka_spark.operators.text import distinctive_terms

        rows = [
            (1, "A", "x x x y"),
            (2, "B", "y y y x"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = distinctive_terms(df, "source", k=10).collect()
        got = {(r.source, r.tok) for r in out}
        # each token is overrepresented in exactly one group
        assert ("A", "x") in got and ("B", "y") in got
        assert ("A", "y") not in got and ("B", "x") not in got

    def test_g2_nonnegative_and_k_cap(self, spark):
        from mofka_spark.operators.text import distinctive_terms

        rows = [(i, f"g{i%2}", f"tok{i} filler text body") for i in range(8)]
        df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
        out = distinctive_terms(df, "source", k=2).collect()
        assert all(r.g2 >= 0 for r in out)
        for g in ("g0", "g1"):
            assert len([r for r in out if r.source == g]) <= 2


class TestContainmentPairs:
    def test_subdocument_found_despite_low_jaccard(self, spark):
        from mofka_spark.operators.dedup import containment_pairs

        quote = "alpha beta gamma delta epsilon zeta"
        big = quote + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
        rows = [(1, quote), (2, big), (3, "totally unrelated content here")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = containment_pairs(df, threshold=0.9).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
        assert out[0].containment == 1.0

    def test_threshold_filters(self, spark):
        from mofka_spark.operators.dedup import containment_pairs

        rows = [
            (1, "a b c d e f"),
            (2, "a b c d zz yy xx ww vv uu"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        # doc1 grams: 4; shared grams: (a b c), (b c d) = 2 -> 0.5
        hit = containment_pairs(df, threshold=0.5).collect()
        assert len(hit) == 1 and hit[0].containment == 0.5
        assert containment_pairs(df, threshold=0.6).count() == 0

    def test_max_df_drops_common_gram_anchors(self, spark):
        from mofka_spark.operators.dedup import containment_candidates

        # one gram shared by ALL docs: with max_df=2 it cannot anchor
        common = "the same boilerplate line"
        rows = [(i, common) for i in range(4)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        assert containment_candidates(df, max_df=2).count() == 0
        assert containment_candidates(df).count() == 6  # C(4,2)


class TestCooccurrencePmi:
    def test_exclusive_collocations_beat_promiscuous_words(self, spark):
        from mofka_spark.operators.text import cooccurrence_pmi

        # "hong kong" and "zk wq" are exclusive partners; "common"
        # appears in every doc, so any pair with it scores lower PMI
        docs = [(i, "hong kong common") for i in range(10)] + [
            (100 + i, "zk wq common") for i in range(10)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        out = cooccurrence_pmi(df, window=2, min_count=5, k=10).collect()
        top_two = {(r.w1, r.w2) for r in out if r.rnk <= 2}
        assert top_two == {("hong", "kong"), ("wq", "zk")}
        assert all(
            r.rnk > 2 for r in out if "common" in (r.w1, r.w2)
        )

    def test_min_count_prunes(self, spark):
        from mofka_spark.operators.text import cooccurrence_pmi

        df = spark.createDataFrame(
            [(1, "rare pair only once here")], ["doc_id", "text"]
        )
        assert cooccurrence_pmi(df, min_count=2).count() == 0

    def test_pairs_cross_window_only(self, spark):
        from mofka_spark.operators.text import cooccurrence_pmi

        # distance between far1 and far2 is 3 > window=2: no pair
        df = spark.createDataFrame(
            [(i, "far1 a b far2") for i in range(10)], ["doc_id", "text"]
        )
        out = {(r.w1, r.w2) for r in cooccurrence_pmi(df, window=2, min_count=5).collect()}
        assert ("far1", "far2") not in out
        assert ("a", "far1") in out


class TestReadability:
    def test_simple_vs_dense_text(self, spark):
        from mofka_spark.operators.text import readability_scores

        rows = [
            (1, "the cat sat. the dog ran."),
            (2, "extraordinarily sophisticated considerations notwithstanding."),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {r.id: r for r in readability_scores(df).collect()}
        assert out[1].n_sentences == 2 and out[1].n_words == 6
        # simple short words read easier than the polysyllabic doc
        assert out[1].flesch > out[2].flesch

    def test_syllables_floored_at_words(self, spark):
        from mofka_spark.operators.text import readability_scores

        df = spark.createDataFrame([(1, "hm psst brr")], ["doc_id", "text"])
        out = readability_scores(df).collect()[0]
        # vowel-free words still count one syllable each
        assert out.n_syllables == 3

    def test_empty_and_null_dropped(self, spark):
        from mofka_spark.operators.text import readability_scores

        df = spark.createDataFrame(
            [(1, "real text here."), (2, "   "), (3, None)],
            ["doc_id", "text"],
        )
        assert readability_scores(df).count() == 1


class TestCorpusOverlap:
    def test_known_overlap_matrix(self, spark):
        from mofka_spark.operators.text import corpus_overlap

        # unigram sets: A={a,b,c}, B={b,c,d}, C={x}
        df = spark.createDataFrame(
            [
                ("A", "a b"), ("A", "b c"),
                ("B", "b c"), ("B", "c d"),
                ("C", "x"),
            ],
            ["source", "text"],
        )
        out = {
            (r.src_a, r.src_b): (r.n_common, r.n_a, r.n_b, r.jaccard, r.containment)
            for r in corpus_overlap(df, n=1).collect()
        }
        # only the A-B pair shares grams; C pairs are absent entirely
        assert set(out) == {("A", "B")}
        n_common, n_a, n_b, jac, cont = out[("A", "B")]
        assert (n_common, n_a, n_b) == (2, 3, 3)
        assert jac == round(2 / 4, 6) and cont == round(2 / 3, 6)

    def test_symmetric_and_ordered(self, spark):
        from mofka_spark.operators.text import corpus_overlap

        df = spark.createDataFrame(
            [("zeta", "a b c"), ("alpha", "a b c")], ["source", "text"]
        )
        rows = corpus_overlap(df, n=3).collect()
        assert len(rows) == 1
        (r,) = rows
        # src_a < src_b regardless of input order; identical docs ->
        # full overlap
        assert (r.src_a, r.src_b) == ("alpha", "zeta")
        assert r.jaccard == 1.0 and r.containment == 1.0


class TestBigramLm:
    def test_hand_computed_probabilities(self, spark):
        import math

        from mofka_spark.operators.text import bigram_lm_score

        # doc1 bigrams: (a,b) (b,a) (a,b); doc2: (b,a)
        # counts: c(a,b)=2, c(b,a)=2; ctx: c(a)=2, c(b)=2;
        # V = |{a, b, solo}| = 3 (vocab spans ALL tokens, including the
        # bigram-less doc 3 — the smoothing event space)
        # P(b|a) = (2+1)/(2+3) = 0.6 = P(a|b)
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "b a"), (3, "solo"), (4, None)],
            ["doc_id", "text"],
        )
        out = {r.id: (r.n_bigrams, r.avg_logp) for r in bigram_lm_score(df).collect()}
        lp = round(math.log(0.6), 6)
        # doc 3 has one token (no bigrams) and doc 4 is null: excluded
        assert out == {1: (3, lp), 2: (1, lp)}

    def test_order_sensitivity(self, spark):
        """The signal lm_score cannot give: same token multiset,
        different order -> different bigram score."""
        from mofka_spark.operators.text import bigram_lm_score

        df = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")]
            + [(i, "the cat sat on the mat") for i in range(3, 10)],
            ["doc_id", "text"],
        )
        out = {r.id: r.avg_logp for r in bigram_lm_score(df).collect()}
        assert out[1] > out[2]  # natural order dominates the corpus


class TestTokenEntropy:
    def test_hand_computed(self, spark):
        import math

        from mofka_spark.operators.text import token_entropy

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "x x x x"), (3, None)], ["doc_id", "text"]
        )
        out = {r.id: r for r in token_entropy(df).collect()}
        assert set(out) == {1, 2}
        h = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
        assert out[1].n_tokens == 3 and out[1].n_types == 2
        assert out[1].entropy == round(h, 6)
        assert out[1].ttr == round(2 / 3, 6)
        # all-same tokens: zero entropy, minimal diversity
        assert out[2].entropy == 0.0 and out[2].ttr == 0.25

    def test_diversity_orders_docs(self, spark):
        from mofka_spark.operators.text import token_entropy

        df = spark.createDataFrame(
            [(1, "the the the the the cat"), (2, "one two three four five six")],
            ["doc_id", "text"],
        )
        out = {r.id: r.entropy for r in token_entropy(df).collect()}
        assert out[2] > out[1]  # uniform vocabulary = max entropy


class TestOovRate:
    def test_known_rates(self, spark):
        from mofka_spark.operators.text import oov_rate

        docs = _docs(spark, [(1, "a b zz"), (2, "a a a"), (3, "  "), (4, None)])
        vocab = spark.createDataFrame([("a",), ("b",)], ["token"])
        out = {r.id: (r.n_tokens, r.n_oov, r.oov_rate) for r in oov_rate(docs, vocab).collect()}
        # blank/null docs excluded
        assert out == {1: (3, 1, round(1 / 3, 6)), 2: (3, 0, 0.0)}

    def test_duplicate_vocab_rows_do_not_double_count(self, spark):
        from mofka_spark.operators.text import oov_rate

        docs = _docs(spark, [(1, "a b")])
        vocab = spark.createDataFrame([("a",), ("a",)], ["token"])
        (row,) = oov_rate(docs, vocab).collect()
        assert (row.n_tokens, row.n_oov) == (2, 1)


class TestFuzzyDecontaminate:
    def test_near_dup_of_eval_flagged_exact_miss_not(self, spark):
        from mofka_spark.operators.text import fuzzy_decontaminate

        eval_doc = "the quick brown fox jumps over the lazy dog near the river"
        near = "the quick brown fox leaps over the lazy dog near the river"
        far = "completely unrelated text about spark shuffles and joins here"
        docs = _docs(spark, [(1, eval_doc), (2, near), (3, far)])
        evals = _docs(spark, [(100, eval_doc)])
        out = {r.id: r for r in fuzzy_decontaminate(docs, evals).collect()}
        assert out[1].contaminated and out[1].max_jaccard == 1.0
        assert out[2].contaminated and 0.5 <= out[2].max_jaccard < 1.0
        assert not out[3].contaminated and out[3].max_jaccard == 0.0

    def test_threshold_applies(self, spark):
        from mofka_spark.operators.text import fuzzy_decontaminate

        # J = 6/10 = 0.6 — inside the blocking regime (bands=32, r=2:
        # miss probability ~6e-7), so the threshold alone decides
        docs = _docs(spark, [(1, "a b c d e f g h i j")])
        evals = _docs(spark, [(100, "a b c d e f g h w v")])
        loose = fuzzy_decontaminate(docs, evals, threshold=0.1).collect()[0]
        tight = fuzzy_decontaminate(docs, evals, threshold=0.9).collect()[0]
        assert loose.contaminated and not tight.contaminated

    def test_eval_side_broadcasts(self, spark):
        from mofka_spark.operators.text import fuzzy_decontaminate

        docs = _docs(spark, [(i, f"doc {i} text body") for i in range(20)])
        evals = _docs(spark, [(100, "doc 5 text body")])
        plan = (
            fuzzy_decontaminate(docs, evals)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestBlocklistScan:
    def test_token_exact_no_substring_hits(self, spark):
        from mofka_spark.operators.text import blocklist_scan

        docs = _docs(
            spark,
            [
                (1, "the class is in session"),   # 'ass' must NOT hit
                (2, "bad bad word here"),
                (3, "clean text only"),
            ],
        )
        out = {r.id: r for r in blocklist_scan(docs, ["ass", "bad"]).collect()}
        assert not out[1].flagged and out[1].n_hits == 0
        assert out[2].flagged and out[2].n_hits == 2
        assert not out[3].flagged

    def test_case_insensitive(self, spark):
        from mofka_spark.operators.text import blocklist_scan

        docs = _docs(spark, [(1, "BAD things")])
        (row,) = blocklist_scan(docs, ["bad"]).collect()
        assert row.flagged

    def test_no_shuffle_plan(self, spark):
        from mofka_spark.operators.text import blocklist_scan

        docs = _docs(spark, [(1, "a b c")])
        plan = (
            blocklist_scan(docs, ["a"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_broadcast_regime_parity_and_plan(self, spark):
        # forcing the broadcast swap (max_literal_entries=0) must match
        # the literal-folded plan exactly — every doc present, counts
        # identical — and the term probe must be a BroadcastHashJoin,
        # never a giant literal or a nested-loop join
        from mofka_spark.operators.text import blocklist_scan

        docs = _docs(
            spark,
            [
                (1, "the class is in session"),
                (2, "bad bad word here"),
                (3, "clean text only"),
                (4, None),
                (5, "BAD mixed Case bad"),
            ],
        )
        terms = ["ass", "bad", "unused"]
        lit = sorted(
            tuple(r) for r in blocklist_scan(docs, terms).collect()
        )
        bc_df = blocklist_scan(docs, terms, max_literal_entries=0)
        bc = sorted(tuple(r) for r in bc_df.collect())
        assert lit == bc
        assert {r[0]: r[1] for r in bc} == {1: 0, 2: 2, 3: 0, 5: 2}
        plan = bc_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestTokenizerFertility:
    def test_per_stratum_arithmetic(self, spark):
        from mofka_spark.operators.text import tokenizer_fertility

        df = spark.createDataFrame(
            [
                ("en", "hello world"),          # 2 words
                ("en", "a b c"),                # 3 words
                ("zh", None),                   # null text: counted out
                ("zh", "x"),                    # 1 word
            ],
            "lang string, text string",
        )
        out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
        assert out["en"]["n_docs"] == 2 and out["en"]["n_words"] == 5
        assert out["zh"]["n_docs"] == 1 and out["zh"]["n_words"] == 1
        en = out["en"]
        assert en["fertility"] == round(en["n_bpe"] / en["n_words"], 6)

    def test_zero_token_stratum_yields_null_not_error(self, spark):
        from mofka_spark.operators.text import tokenizer_fertility

        df = spark.createDataFrame(
            [("xx", None)], "lang string, text string"
        )
        row = tokenizer_fertility(df).first()
        assert row["n_docs"] == 0
        assert row["fertility"] is None and row["chars_per_token"] is None


class TestNgramDiversity:
    def test_collapsed_stratum_scores_low(self, spark):
        from mofka_spark.operators.text import ngram_diversity

        df = spark.createDataFrame(
            [
                ("tmpl", "the same old template"),
                ("tmpl", "the same old template"),
                ("tmpl", "the same old template"),
                ("var", "one two three four"),
                ("var", "five six seven eight"),
            ],
            "source string, text string",
        )
        out = {r["source"]: r for r in ngram_diversity(df, "source").collect()}
        # template stratum: 3 distinct bigrams over 9 occurrences
        assert out["tmpl"]["n_total"] == 9 and out["tmpl"]["n_distinct"] == 3
        # varied stratum: every bigram unique
        assert out["var"]["n_distinct"] == out["var"]["n_total"] == 6
        assert out["tmpl"]["diversity"] < out["var"]["diversity"] == 1.0

    def test_null_text_excluded(self, spark):
        from mofka_spark.operators.text import ngram_diversity

        df = spark.createDataFrame(
            [("a", None), ("a", "x y")], "source string, text string"
        )
        row = ngram_diversity(df, "source").first()
        assert row["n_total"] == 1  # the single "x y" bigram


class TestZipfFit:
    def test_planted_zipf_slope_near_minus_one(self, spark):
        from mofka_spark.operators.text import zipf_fit

        # counts ~ 1/rank: token t_r appears round(120/r) times
        words = []
        for r in range(1, 13):
            words += [f"t{r:02d}"] * round(120 / r)
        df = spark.createDataFrame(
            [("s", " ".join(words))], "source string, text string"
        )
        row = zipf_fit(df, "source").first()
        assert row["vocab_size"] == 12
        assert -1.15 < row["slope"] < -0.85

    def test_max_vocab_caps_fit_and_min_count_prunes(self, spark):
        from mofka_spark.operators.text import zipf_fit

        df = spark.createDataFrame(
            [("s", "a a a a b b b c c d")], "source string, text string"
        )
        full = zipf_fit(df, "source").first()
        capped = zipf_fit(df, "source", max_vocab=3).first()
        assert full["vocab_size"] == 4 and capped["vocab_size"] == 3
        pruned = zipf_fit(df, "source", min_count=2).first()
        assert pruned["vocab_size"] == 3  # drops the hapax "d"

    def test_tiny_vocab_dropped(self, spark):
        from mofka_spark.operators.text import zipf_fit

        # one distinct token: denom = 0, no defined fit
        df = spark.createDataFrame(
            [("s", "a a a")], "source string, text string"
        )
        assert zipf_fit(df, "source").count() == 0


class TestBuildVocabEncodeIds:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "the dog sat"),
             (3, "zebra xylophone"),
             (4, None)],
            "doc_id long, text string",
        )

    def test_ids_dense_and_deterministic(self, spark):
        from mofka_spark.operators.text import build_vocab

        v = {r["token"]: r["token_id"] for r in
             build_vocab(self._docs(spark), max_vocab=3).collect()}
        # count desc, token asc: the(3), sat(2), then 'cat' wins the
        # 1-count tie alphabetically
        assert v == {"the": 1, "sat": 2, "cat": 3}

    def test_oov_maps_to_unk(self, spark):
        from mofka_spark.operators.text import build_vocab, encode_ids

        docs = self._docs(spark)
        vocab = build_vocab(docs, max_vocab=3)
        out = encode_ids(docs, vocab)
        rows = {(r["id"], r["pos"]): r["token_id"] for r in out.collect()}
        # doc 3 is entirely OOV; doc 2: the=1 dog=0 sat=2
        assert rows[(3, 0)] == 0 and rows[(3, 1)] == 0
        assert [rows[(2, p)] for p in range(3)] == [1, 0, 2]
        # null-text doc contributes no rows
        assert not any(k[0] == 4 for k in rows)

    def test_reassembles_to_per_doc_arrays(self, spark):
        import pyspark.sql.functions as F

        from mofka_spark.operators.text import build_vocab, encode_ids

        docs = self._docs(spark)
        out = encode_ids(docs, build_vocab(docs, max_vocab=3))
        seqs = {
            r["id"]: [s["token_id"] for s in r["seq"]]
            for r in out.groupBy("id").agg(
                F.sort_array(
                    F.collect_list(F.struct("pos", "token_id"))
                ).alias("seq")
            ).collect()
        }
        assert seqs[1] == [1, 3, 2, 0, 1, 0]  # the cat sat on the mat

    def test_min_count_prunes_and_validation(self, spark):
        import pytest as _pytest

        from mofka_spark.operators.text import build_vocab

        v = build_vocab(self._docs(spark), max_vocab=10, min_count=2)
        assert {r["token"] for r in v.collect()} == {"the", "sat"}
        with _pytest.raises(ValueError):
            build_vocab(self._docs(spark), max_vocab=0)

    def test_vocab_broadcasts_no_corpus_shuffle(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.text import build_vocab, encode_ids

        docs = self._docs(spark)
        out = encode_ids(docs, build_vocab(docs, max_vocab=3))
        p = plans.plan_string(out)
        assert "BroadcastHashJoin" in p  # vocab side broadcasts
        assert "SortMergeJoin" not in p  # corpus never shuffles to join


class TestHashEmbed:
    def test_shape_and_determinism(self, spark):
        from mofka_spark.operators.text import hash_embed

        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
             (3, "totally different words here")],
            "doc_id long, text string",
        )
        out = {r["id"]: r["embedding"] for r in hash_embed(df, dim=16).collect()}
        assert all(len(v) == 16 for v in out.values())
        # identical text -> identical vector; different text differs
        assert out[1] == out[2] != out[3]
        # signed counts: total L1 mass <= token count (collisions cancel)
        assert sum(abs(x) for x in out[1]) <= 3

    def test_feeds_the_vector_stack(self, spark):
        from mofka_spark.operators.similarity import brute_force_topk
        from mofka_spark.operators.text import hash_embed

        df = spark.createDataFrame(
            [(1, "spark shuffle join"), (2, "spark shuffle join"),
             (3, "entirely unrelated corpus text")],
            "doc_id long, text string",
        )
        emb = hash_embed(df).withColumnRenamed("id", "vec_id")
        nn = brute_force_topk(
            emb.filter("vec_id = 1"), emb, k=1
        ).first()
        assert nn["neighbor_id"] == 2 and nn["score"] == 1.0

    def test_feeds_ivf_scale_path(self, spark, sf_dir):
        # The documented scale path (SCALING.md): hash embeddings feed
        # the cell-pruned ANN family. Gate doc_hash_ann pins this at
        # sf0.01; here the same composition must clear recall@5 >= 0.6
        # per query on the sf0.001 corpus.
        import pyspark.sql.functions as F

        from mofka_spark.operators.similarity import (
            brute_force_topk, ivf_topk, topk_recall,
        )
        from mofka_spark.operators.text import hash_embed

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        emb = hash_embed(docs).withColumnRenamed("id", "vec_id")
        queries = emb.filter(F.col("vec_id") < 3)
        exact = brute_force_topk(queries, emb, k=5)
        approx = ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=4)
        rec = topk_recall(approx, exact, k=5).collect()
        assert len(rec) == 3
        assert all(r["recall"] >= 0.6 for r in rec)

    def test_null_text_excluded(self, spark):
        from mofka_spark.operators.text import hash_embed

        df = spark.createDataFrame(
            [(1, "x"), (2, None)], "doc_id long, text string"
        )
        assert [r["id"] for r in hash_embed(df).collect()] == [1]


class TestBpe:
    CORPUS = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest"
    )

    def _df(self, spark, text=None):
        return spark.createDataFrame(
            [(1, text or self.CORPUS)], "doc_id long, text string"
        )

    def test_merge_sequence_matches_hand_computed(self, spark):
        # the classic Sennrich example corpus: low x5, lower x2,
        # newest x6, widest x3 — merge sequence derived by hand
        # (pair_count desc, lhs asc, rhs asc ties)
        from mofka_spark.operators.text import bpe_train

        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train(self._df(spark), n_merges=8)
            .orderBy("rank")
            .collect()
        ]
        assert got == [
            (1, "e", "s", "es", 9),
            (2, "es", "t", "est", 9),
            (3, "l", "o", "lo", 7),
            (4, "lo", "w", "low", 7),
            (5, "e", "w", "ew", 6),
            (6, "ew", "est", "ewest", 6),
            (7, "n", "ewest", "newest", 6),
            (8, "d", "est", "dest", 3),
        ]

    def test_overlapping_pairs_counted_greedy_applied(self, spark):
        # "aaaa" x3: pair (a,a) counts OVERLAPPING (3 per word = 9);
        # application is greedy left-to-right ((aa)(aa), never a(aa)a),
        # so the next round's top pair is (aa,aa) at count 3
        from mofka_spark.operators.text import bpe_train

        got = [
            (r["lhs"], r["rhs"], r["pair_count"])
            for r in bpe_train(
                self._df(spark, "aaaa aaaa aaaa"), n_merges=2
            ).orderBy("rank").collect()
        ]
        assert got == [("a", "a", 9), ("aa", "aa", 3)]

    def test_early_stop_below_min_pair_count(self, spark):
        # every pair unique -> nothing reaches min_pair_count=2
        from mofka_spark.operators.text import bpe_train

        m = bpe_train(self._df(spark, "abc def"), n_merges=5)
        assert m.count() == 0

    def test_encode_reproduces_training_segmentation(self, spark):
        from mofka_spark.operators.text import bpe_encode, bpe_train

        df = self._df(spark)
        merges = bpe_train(df, n_merges=8)
        enc = bpe_encode(df, merges).orderBy("word_pos", "piece_pos")
        by_word = {}
        for r in enc.collect():
            by_word.setdefault(r["word_pos"], []).append(r["piece"])
        # corpus word order: low x5, lower x2, newest x6, widest x3
        assert by_word[0] == ["low"]
        assert by_word[5] == ["low", "e", "r"]
        assert by_word[7] == ["newest"]
        assert by_word[13] == ["w", "i", "dest"]

    def test_encode_token_ids_deterministic(self, spark):
        # alphabet d,e,i,l,n,o,r,s,t,w -> ids 1..10 asc; merges 11..18
        from mofka_spark.operators.text import bpe_encode, bpe_train

        df = self._df(spark)
        enc = bpe_encode(df, bpe_train(df, n_merges=8))
        ids = {r["piece"]: r["token_id"] for r in enc.collect()}
        assert ids["low"] == 10 + 4  # 4th merge
        assert ids["e"] == 2 and ids["r"] == 7
        assert ids["newest"] == 10 + 7

    def test_encode_accepts_merge_list_and_handles_unseen(self, spark):
        # encoding a corpus with merges learned elsewhere: unseen
        # chars get OOV id 0; applicable merges still apply
        from mofka_spark.operators.text import bpe_encode

        df = self._df(spark, "lox qq")
        enc = bpe_encode(df, [(1, "l", "o"), (2, "lo", "x")])
        got = {
            (r["word_pos"], r["piece_pos"]): (r["piece"], r["token_id"])
            for r in enc.collect()
        }
        # alphabet of THIS corpus: l,o,q,x -> 1..4; merges: lo=5, lox=6
        assert got[(0, 0)] == ("lox", 6)
        assert got[(1, 0)] == ("q", 3) and got[(1, 1)] == ("q", 3)

    def test_train_leaves_only_gc_bounded_blocks(self, spark):
        # the iteration checkpoints must be localCheckpoints (GC-
        # reclaimed), never bare persists
        from mofka_spark.operators.text import bpe_train

        sc = spark.sparkContext
        before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
        bpe_train(self._df(spark), n_merges=3).collect()
        jmap = sc._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet().toArray()) - before:
            assert jmap.get(rid).rdd().isLocallyCheckpointed()

    def test_unicode_codepoint_segmentation(self, spark):
        # char segmentation is by CODE POINT in both engines (verified
        # incl. non-BMP: Spark split('', '') == DuckDB string_split
        # '' on 'a<emoji>b'); a multibyte corpus must train the same
        # merges the pure-Python (code-point) reference computes
        from mofka_spark.operators.text import bpe_train

        got = [
            (r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train(
                self._df(spark, "héé wörld héé wörld héé"), n_merges=2
            ).orderBy("rank").collect()
        ]
        # hand-computed: héé x3 -> pairs (h,é)x3, (é,é)x3 tie ->
        # lhs asc: (h,é) wins? 'h' < 'é' in code-point order (h=0x68,
        # é=0xE9) -> (h,é) first; then (hé,é) x3
        assert got[0] == ("h", "é", "hé", 3)
        assert got[1] == ("hé", "é", "héé", 3)

    def test_arrow_encode_identical_to_replace_chain(self, spark):
        # the production (arrow kernel) path must be bit-identical to
        # the gate (replace chain) path — same pieces, positions, ids
        from mofka_spark.operators.text import bpe_encode, bpe_train

        df = self._df(spark)
        merges = bpe_train(df, n_merges=8)
        a = bpe_encode(df, merges, method="replace")
        b = bpe_encode(df, merges, method="arrow")
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_arrow_encode_identical_on_adversarial_corpus(self, spark):
        # overlapping runs, merged-symbol re-merges, unseen words,
        # single-char words, unicode
        from mofka_spark.operators.text import bpe_encode

        merges = [(1, "a", "a"), (2, "aa", "aa"), (3, "é", "x"),
                  (4, "aaaa", "b")]
        df = self._df(spark, "aaaaa aaaab zz q éx a héé")
        a = bpe_encode(df, merges, method="replace")
        b = bpe_encode(df, merges, method="arrow")
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb
        got = {}
        for r in a.collect():
            got.setdefault(r["word_pos"], []).append(
                (r["piece_pos"], r["piece"])
            )
        # aaaaa -> aa aa a -> aaaa a -> (merge 4 needs b) stays
        assert [p for _, p in sorted(got[0])] == ["aaaa", "a"]
        # aaaab -> aa aa b -> aaaa b -> aaaab
        assert [p for _, p in sorted(got[1])] == ["aaaab"]

    def test_arrow_encode_empty_partitions(self, spark):
        from mofka_spark.operators.text import bpe_encode

        df = spark.createDataFrame(
            [(1, "ab")], "doc_id long, text string"
        ).repartition(8)
        out = bpe_encode(df, [(1, "a", "b")], method="arrow").collect()
        assert [(r["piece"], r["token_id"]) for r in out] == [("ab", 3)]

    def test_vocab_table_is_train_time_artifact(self, spark):
        # the persisted (piece, token_id) artifact: alphabet of the
        # TRAINING corpus 1..A asc, merged symbols A+rank, OOV 0
        from mofka_spark.operators.text import bpe_train, bpe_vocab_table

        df = self._df(spark)
        merges = bpe_train(df, n_merges=8)
        vocab = {
            r["piece"]: r["token_id"]
            for r in bpe_vocab_table(merges, df).collect()
        }
        # alphabet d,e,i,l,n,o,r,s,t,w -> 1..10; merges 11..18
        assert vocab["d"] == 1 and vocab["w"] == 10
        assert vocab["low"] == 14 and vocab["newest"] == 17
        assert len(vocab) == 18

    def test_encode_with_vocab_stable_ids_on_disjoint_corpus(self, spark):
        # encoding a DISJOINT corpus with the trained artifact: shared
        # pieces keep the TRAINING ids; unseen chars become OOV 0 —
        # the exact property corpus-derived ids lack (ADVICE r9)
        from mofka_spark.operators.text import (
            bpe_encode,
            bpe_train,
            bpe_vocab_table,
        )

        train = self._df(spark)
        merges = bpe_train(train, n_merges=8)
        vocab = bpe_vocab_table(merges, train)
        train_ids = {
            r["piece"]: r["token_id"]
            for r in bpe_encode(train, merges, vocab=vocab).collect()
        }
        other = self._df(spark, "slow lowest zest")
        enc = {
            (r["word_pos"], r["piece_pos"]): (r["piece"], r["token_id"])
            for r in bpe_encode(other, merges, vocab=vocab).collect()
        }
        # every shared piece id equals the training corpus's id
        for (wp, pp), (piece, tid) in enc.items():
            if piece in train_ids:
                assert tid == train_ids[piece], piece
        # "slow" -> s + low (training merge id), "zest" -> z(OOV) + est
        assert enc[(0, 0)] == ("s", 8)
        assert enc[(0, 1)] == ("low", 14)
        assert enc[(2, 0)] == ("z", 0)  # z unseen in training -> OOV
        assert enc[(2, 1)] == ("est", 12)
        # corpus-derived ids on the same input DIVERGE (the footgun)
        drift = {
            r["piece"]: r["token_id"]
            for r in bpe_encode(other, merges).collect()
        }
        assert drift["low"] != train_ids["low"]

    def test_encode_with_vocab_arrow_method(self, spark):
        from mofka_spark.operators.text import (
            bpe_encode,
            bpe_train,
            bpe_vocab_table,
        )

        train = self._df(spark)
        merges = bpe_train(train, n_merges=8)
        vocab = bpe_vocab_table(merges, train)
        other = self._df(spark, "slow zest")
        a = bpe_encode(other, merges, vocab=vocab, method="replace")
        b = bpe_encode(other, merges, vocab=vocab, method="arrow")
        key = ["word_pos", "piece_pos"]
        assert sorted(map(tuple, a.collect())) == sorted(
            map(tuple, b.collect())
        )

    def test_encode_rejects_malformed_vocab(self, spark):
        import pytest

        from mofka_spark.operators.text import bpe_encode

        df = self._df(spark, "ab")
        bad = spark.createDataFrame([("a", 1)], "piece string, wrong int")
        with pytest.raises(ValueError, match="vocab"):
            bpe_encode(df, [(1, "a", "b")], vocab=bad)

    def test_tokenizer_artifact_round_trip(self, spark, tmp_path):
        # save/load the full artifact: a fresh load must encode a NEW
        # corpus with ids identical to the original tokenizer's
        from mofka_spark.operators.text import (
            bpe_encode,
            bpe_train,
            bpe_vocab_table,
            load_bpe_tokenizer,
            save_bpe_tokenizer,
        )

        train = self._df(spark)
        merges = bpe_train(train, n_merges=8)
        vocab = bpe_vocab_table(merges, train)
        path = str(tmp_path / "tok")
        save_bpe_tokenizer(path, merges, vocab)
        m2, v2 = load_bpe_tokenizer(spark, path)
        other = self._df(spark, "slow lowest zest")
        a = sorted(map(tuple, bpe_encode(other, merges, vocab=vocab).collect()))
        b = sorted(map(tuple, bpe_encode(other, m2, vocab=v2).collect()))
        assert a == b
        # merge-LIST artifacts round-trip too
        save_bpe_tokenizer(path, [(1, "l", "o"), (2, "lo", "w")], vocab)
        m3, _ = load_bpe_tokenizer(spark, path)
        assert m3 == [(1, "l", "o"), (2, "lo", "w")]

    def test_batched_train_matches_sequential_classic(self, spark):
        # merges_per_round > 1 must reproduce the sequential table
        # exactly (the conservative-exact selection rule)
        from mofka_spark.operators.text import bpe_train

        df = self._df(spark)
        seq = [tuple(r) for r in bpe_train(df, n_merges=8).collect()]
        for mpr in (3, 8):
            got = [
                tuple(r)
                for r in bpe_train(
                    df, n_merges=8, merges_per_round=mpr
                ).collect()
            ]
            assert got == seq, mpr

    def test_batched_train_self_pair_worst_case(self, spark):
        # a self-pair ends its batch: "aaaa" corpora degrade to one
        # merge per round but stay exact
        from mofka_spark.operators.text import bpe_train

        got = [
            (r["lhs"], r["rhs"], r["pair_count"])
            for r in bpe_train(
                self._df(spark, "aaaa aaaa aaaa"),
                n_merges=2,
                merges_per_round=4,
            ).orderBy("rank").collect()
        ]
        assert got == [("a", "a", 9), ("aa", "aa", 3)]


class TestEncodingSignals:
    def test_counts_each_noise_class(self, spark):
        from mofka_spark.operators.text import encoding_signals

        rows = [
            (1, "clean ascii text"),
            (2, "bad � decode � here"),          # 2 repl
            (3, "ctrl\x01\x02 and del\x7f"),               # 3 ctrl
            (4, "cafÃ© naÃ¯ve Â "),  # 3 moji leads
            (5, "tab\tand\nnewline\rok"),                  # layout != ctrl
            (6, "münchen 中文"),              # legit non-ascii
            (7, None),
            (8, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["id"]: r for r in encoding_signals(df).collect()}
        assert set(out) == {1, 2, 3, 4, 5, 6, 8}  # NULL dropped
        assert out[1]["n_repl"] == out[1]["n_ctrl"] == out[1]["n_moji"] == 0
        assert out[2]["n_repl"] == 2
        assert out[2]["repl_ratio"] == round(2 / len(rows[1][1]), 6)
        assert out[3]["n_ctrl"] == 3
        assert out[4]["n_moji"] == 3
        assert out[4]["n_nonascii"] == 6  # 3 leads + 2 trails + nbsp
        assert out[5]["n_ctrl"] == 0  # \t \n \r are layout, not noise
        assert out[6]["n_moji"] == 0 and out[6]["n_nonascii"] == 3
        assert out[8]["n_chars"] == 0 and out[8]["repl_ratio"] == 0.0

    def test_scan_local_no_shuffle(self, spark):
        from mofka_spark.operators.text import encoding_signals

        df = spark.createDataFrame(
            [(1, "x")], "doc_id long, text string"
        )
        plan = (
            encoding_signals(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestUnigram:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "the cat sat on the mat"),
             (2, "the rat ate the cat food"),
             (3, "a catapult on the mat")],
            "doc_id long, text string",
        )

    def test_seed_counts_hand_computed(self, spark):
        from mofka_spark.operators.text import unigram_seed

        df = spark.createDataFrame([(1, "aba ab aba")], "doc_id long, text string")
        got = {
            r["piece"]: (r["freq"], r["is_char"])
            for r in unigram_seed(df, max_piece_len=3, min_count=1).collect()
        }
        # chars: aba x2 + ab -> a: 2*2+1=5, b: 2+1=3
        assert got["a"] == (5, True) and got["b"] == (3, True)
        # substrings: ab in aba(1 occurrence)x2 + ab(1) = 3; ba only in aba x2
        assert got["ab"] == (3, False)
        assert got["ba"] == (2, False)
        assert got["aba"] == (2, False)

    def test_seed_min_count_and_size(self, spark):
        from mofka_spark.operators.text import unigram_seed

        df = spark.createDataFrame([(1, "xy xy zq")], "doc_id long, text string")
        got = {r["piece"] for r in
               unigram_seed(df, min_count=2, seed_size=10).collect()}
        assert "xy" in got and "zq" not in got  # zq freq 1 < min_count
        assert {"x", "y", "z", "q"} <= got      # chars always survive

    def test_longest_match_encode(self, spark):
        from mofka_spark.operators.text import unigram_encode

        df = spark.createDataFrame([(1, "abcab")], "doc_id long, text string")
        inv = {"ab": 5, "ca": 3, "a": 2, "b": 2, "c": 2}
        got = [
            (r["piece_pos"], r["piece"])
            for r in unigram_encode(df, inv, objective="longest")
            .orderBy("piece_pos").collect()
        ]
        # greedy longest-first: ab | ca | b
        assert got == [(0, "ab"), (1, "ca"), (2, "b")]

    def test_unknown_char_token_id_zero(self, spark):
        from mofka_spark.operators.text import unigram_encode, unigram_train

        art = unigram_train(self._df(spark), vocab_size=16, n_iters=1)
        out = unigram_encode(
            spark.createDataFrame([(9, "cat zzz9")], "doc_id long, text string"),
            art,
        )
        rows = out.collect()
        known = [r for r in rows if r["word_pos"] == 0]
        unk = [r for r in rows if r["word_pos"] == 1]
        assert all(r["token_id"] > 0 for r in known)
        # '9' and 'z' never occurred in training: fallback pieces, id 0
        assert any(r["token_id"] == 0 for r in unk)

    def test_train_deterministic(self, spark):
        from mofka_spark.operators.text import unigram_train

        a = sorted(map(tuple, unigram_train(self._df(spark), vocab_size=20).collect()))
        b = sorted(map(tuple, unigram_train(self._df(spark), vocab_size=20).collect()))
        assert a == b

    def test_train_releases_checkpoint(self, spark):
        # the word-freq localCheckpoint must not outlive the call:
        # library callers in long-lived sessions would otherwise leak
        # one persisted RDD per train invocation
        from mofka_spark.operators.text import unigram_train

        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        before = set(jmap.keySet().toArray())
        unigram_train(self._df(spark), vocab_size=16, n_iters=1).collect()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        after = set(jmap.keySet().toArray())
        assert after - before == set()

    def test_ids_follow_artifact(self, spark):
        from mofka_spark.operators.text import unigram_encode, unigram_train

        art = unigram_train(self._df(spark), vocab_size=20)
        ids = {r["piece"]: r["token_id"] for r in art.collect()}
        out = unigram_encode(self._df(spark), art)
        for r in out.collect():
            assert r["token_id"] == ids.get(r["piece"], 0)

    def test_validation(self, spark):
        from mofka_spark.operators.text import (
            unigram_encode, unigram_seed, unigram_train,
        )

        df = self._df(spark)
        import pytest as _pt
        with _pt.raises(ValueError):
            unigram_train(df, vocab_size=0)
        with _pt.raises(ValueError):
            unigram_train(df, n_iters=0)
        with _pt.raises(ValueError):
            unigram_train(df, objective="bogus")
        with _pt.raises(ValueError):
            unigram_seed(df, max_piece_len=1)
        with _pt.raises(ValueError):
            unigram_encode(df, {"a": 1}, objective="bogus")

    def test_artifact_round_trip(self, spark, tmp_path):
        from mofka_spark.operators.text import (
            load_unigram_tokenizer, save_unigram_tokenizer,
            unigram_encode, unigram_train,
        )

        art = unigram_train(self._df(spark), vocab_size=20)
        save_unigram_tokenizer(str(tmp_path / "tok"), art)
        art2 = load_unigram_tokenizer(spark, str(tmp_path / "tok"))
        assert sorted(map(tuple, art.collect())) == sorted(map(tuple, art2.collect()))
        e1 = sorted(map(tuple, unigram_encode(self._df(spark), art).collect()))
        e2 = sorted(map(tuple, unigram_encode(self._df(spark), art2).collect()))
        assert e1 == e2
        import pytest as _pt
        with _pt.raises(ValueError):
            save_unigram_tokenizer(str(tmp_path / "bad"), art.select("piece"))


class TestScriptSignals:
    def test_counts_dominant_and_mixed(self, spark):
        from mofka_spark.operators.text import script_signals

        df = spark.createDataFrame(
            [(1, "hello world"),                  # pure latin
             (2, "统计数据分析统计数据分析 ok"),      # cjk-dominant, mixed
             (3, "Привет мир"),                   # cyrillic-dominant
             (4, ""),                             # empty
             (5, "...!!!")],                      # no class matches
            "doc_id long, text string",
        )
        got = {r["id"]: r for r in script_signals(df).collect()}
        assert got[1]["dominant_script"] == "latin" and not got[1]["is_mixed"]
        assert got[2]["dominant_script"] == "cjk" and got[2]["n_cjk"] == 12
        assert got[2]["is_mixed"]                  # latin 'ok' >= 10%
        assert got[3]["dominant_script"] == "cyrillic"
        assert got[3]["n_cyrillic"] == 9
        assert got[4]["dominant_script"] == "none"
        assert got[5]["dominant_script"] == "other" and got[5]["n_scripts"] == 0

    def test_priority_tie_break(self, spark):
        from mofka_spark.operators.text import script_signals

        # equal latin and digit counts: priority order picks latin
        df = spark.createDataFrame([(1, "ab12")], "doc_id long, text string")
        r = script_signals(df).collect()[0]
        assert r["n_latin"] == 2 and r["n_digit"] == 2
        assert r["dominant_script"] == "latin"

    def test_scan_local_plan(self, spark):
        from mofka_spark.operators.text import script_signals

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = script_signals(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
