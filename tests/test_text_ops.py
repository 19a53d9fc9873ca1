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
