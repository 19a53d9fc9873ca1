"""Property-based tests (hypothesis): the compiled Spark expressions
must agree with the pure-Python evaluators on arbitrary inputs.

- DataDescriptor: random view-algebra compositions applied via Spark
  byte-slicing Columns == python apply() on the same payload.
- Eventbridge: random scalar docs, compiled Column == match_event.
- SchemaValidator: the Column fast path is a NECESSARY condition of the
  exact validator (never rejects a doc the exact validator accepts).
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from mofka_spark.errors import InvalidViewError
from mofka_spark.functions.eventbridge import compile_pattern, match_event
from mofka_spark.functions.validators import SchemaValidator
from mofka_spark.functions.views import DataDescriptor

PAYLOAD = bytes(range(97, 123)) * 2  # 52 bytes, 'a'..'z' twice


def _ops():
    return st.lists(
        st.one_of(
            st.tuples(st.just("sub"), st.integers(0, 40), st.integers(0, 20)),
            st.tuples(
                st.just("strided"),
                st.integers(0, 20),
                st.integers(1, 3),
                st.integers(1, 5),
                st.integers(0, 4),
            ),
            st.tuples(
                st.just("unstructured"),
                st.lists(
                    st.tuples(st.integers(0, 30), st.integers(0, 10)),
                    min_size=1,
                    max_size=3,
                ),
            ),
        ),
        max_size=3,
    )


class TestViewAlgebraProperties:
    @settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(ops=_ops())
    def test_spark_equals_python(self, spark, ops):
        desc = DataDescriptor.identity(len(PAYLOAD))
        try:
            for op in ops:
                if op[0] == "sub":
                    desc = desc.make_sub_view(op[1], op[2])
                elif op[0] == "strided":
                    desc = desc.make_strided_view(op[1], op[2], op[3], op[4])
                else:
                    desc = desc.make_unstructured_view(list(op[1]))
        except InvalidViewError:
            return  # composition exceeded the selected region: fine
        expected = desc.apply(PAYLOAD)
        df = spark.createDataFrame([(PAYLOAD,)], "data binary")
        got = df.select(desc.to_column("data").alias("v")).collect()[0]["v"]
        got = bytes(got) if got is not None else b""
        assert got == expected

    def test_flatten_segments_sum_to_size(self):
        desc = DataDescriptor.identity(52).make_strided_view(1, 3, 4, 2)
        assert sum(s for _, s in desc.flatten()) == desc.size == 12


_SCALAR = st.one_of(
    st.integers(-1000, 1000),
    st.booleans(),
    st.text(alphabet="abcXYZ019 _", max_size=8),
    st.none(),
)
_DOC = st.dictionaries(
    st.sampled_from(["k", "tag", "n", "u"]), _SCALAR, max_size=4
)

_PATTERNS = [
    {"k": [{"numeric": [">=", 0, "<", 500]}]},
    {"tag": [{"prefix": "ab"}, {"suffix": "Z"}]},
    {"k": [{"exists": True}], "tag": [{"anything-but": {"prefix": "x"}}]},
    {"$or": [{"u": [{"exists": True}]}, {"n": [{"numeric": ["<", 0]}]}]},
    {"tag": [{"wildcard": "a*9"}]},
    {"k": [True, None, 3]},
    {"tag": [{"equals-ignore-case": "ABC"}]},
    {"u": [{"exists": False}]},
]


class TestEventbridgeProperties:
    @settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(_DOC, min_size=1, max_size=25))
    def test_compiled_equals_python(self, spark, docs):
        df = spark.createDataFrame(
            [(i, json.dumps(d)) for i, d in enumerate(docs)], "i long, metadata string"
        )
        cols = [
            compile_pattern(p).alias(f"p{j}") for j, p in enumerate(_PATTERNS)
        ]
        rows = df.select("i", *cols).orderBy("i").collect()
        for j, pattern in enumerate(_PATTERNS):
            py = [match_event(pattern, d) for d in docs]
            sp = [r[f"p{j}"] is True for r in rows]
            assert py == sp, f"pattern {pattern} docs {docs}"


_SCHEMA = {
    "required": ["k"],
    "properties": {
        "k": {"type": "integer", "minimum": -50, "maximum": 50},
        "tag": {"type": "string", "minLength": 1, "maxLength": 6, "pattern": "^[abcXYZ019 _]*$"},
        "n": {"type": "number"},
    },
    "anyOf": [{"properties": {"k": {"minimum": 0}}}, {"required": ["tag"]}],
}


class TestValidatorNecessity:
    @settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(docs=st.lists(_DOC, min_size=1, max_size=25))
    def test_column_path_is_necessary_condition(self, spark, docs):
        v = SchemaValidator(_SCHEMA)
        exact_ok = []
        for d in docs:
            try:
                v.validate(d)
                exact_ok.append(True)
            except Exception:
                exact_ok.append(False)
        df = spark.createDataFrame(
            [(i, json.dumps(d)) for i, d in enumerate(docs)], "i long, metadata string"
        )
        rows = df.select("i", v.to_column("metadata").alias("ok")).orderBy("i").collect()
        for d, ok_exact, r in zip(docs, exact_ok, rows):
            if ok_exact:
                assert r["ok"] is True, f"column path rejected a valid doc: {d}"


_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=40,
)


class TestSegmentDedupProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(texts=st.lists(_WORDS, min_size=1, max_size=12))
    def test_no_duplicate_segments_and_conservation(self, spark, texts):
        """After segment_dedup: (1) no 8-word segment string appears
        twice across the rebuilt corpus, (2) kept+dropped == total, and
        (3) doc 0 (first in id order) is byte-identical to its input
        normalization (nothing earlier can own its segments)."""
        from mofka_spark.operators.text import segment_dedup

        df = spark.createDataFrame(
            [(i, " ".join(w)) for i, w in enumerate(texts)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in segment_dedup(df, seg_words=8).collect()}
        segs = []
        for r in out.values():
            words = r["clean_text"].split(" ") if r["clean_text"] else []
            segs.extend(
                " ".join(words[i: i + 8]) for i in range(0, len(words), 8)
            )
        # (1) global uniqueness of surviving segments
        assert len(segs) == len(set(segs))
        # (2) conservation
        for i, w in enumerate(texts):
            import math

            assert out[i]["total_segments"] == math.ceil(len(w) / 8)
            assert out[i]["kept_segments"] <= out[i]["total_segments"]
        # (3) first doc keeps exactly its distinct segments, in order of
        # first appearance (internal repeats dedupe within the doc too)
        w0 = texts[0]
        seen, expect = set(), []
        for i in range(0, len(w0), 8):
            s = " ".join(w0[i: i + 8])
            if s not in seen:
                seen.add(s)
                expect.append(s)
        assert out[0]["clean_text"] == " ".join(expect)


class TestSaltedJoinProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 100)),
            min_size=1, max_size=30,
        ),
        nsalts=st.integers(2, 5),
    )
    def test_equivalent_to_plain_join(self, spark, rows, nsalts):
        from mofka_spark.operators.joins import salted_join

        big = spark.createDataFrame(
            [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, rid int"
        )
        small = big.groupBy("k").count()
        plain = sorted(
            tuple(r) for r in big.join(small, "k").select("k", "v", "rid", "count").collect()
        )
        salted = sorted(
            tuple(r)
            for r in salted_join(big, small, on="k", salt_by="rid", nsalts=nsalts)
            .select("k", "v", "rid", "count")
            .collect()
        )
        assert plain == salted


# ---------------------------------------------------------------------------
# Incremental == batch invariance (streaming/neardup.py, annindex.py):
# for ANY corpus, ANY batch split, and ANY arrival order, the
# incrementally-maintained state must reproduce the batch operator's
# answer exactly. Randomizing the partitioning is the point — the unit
# tests pin chosen splits, these pin the universal property.
# ---------------------------------------------------------------------------

_ND_WORDS = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]
_ND_TEXT = st.lists(
    st.sampled_from(_ND_WORDS), min_size=4, max_size=8
).map(" ".join)


class TestIncrementalNearDupProperty:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_any_split_any_order_equals_batch(self, spark, data):
        import tempfile

        from mofka_spark.operators.dedup import minhash_lsh_dedup
        from mofka_spark.streaming.neardup import neardup_sink, read_result

        texts = data.draw(st.lists(_ND_TEXT, min_size=2, max_size=10))
        docs = list(enumerate(texts))
        order = data.draw(st.permutations(docs))
        n_batches = data.draw(st.integers(1, min(3, len(docs))))
        batch_df = spark.createDataFrame(docs, "id long, text string")
        expected = {
            tuple(r)
            for r in minhash_lsh_dedup(
                batch_df, id_col="id", text_col="text",
                num_hashes=32, bands=16, verify_threshold=0.8,
            ).collect()
        }
        store = tempfile.mkdtemp(prefix="prop-neardup-") + "/store"
        sink = neardup_sink(store, num_hashes=32, bands=16)
        per = (len(order) + n_batches - 1) // n_batches
        for eid in range(n_batches):
            chunk = order[eid * per:(eid + 1) * per]
            if chunk:
                sink(spark.createDataFrame(chunk, "id long, text string"), eid)
        got = {tuple(r) for r in read_result(spark, store).collect()}
        assert got == expected, (texts, [d[0] for d in order], n_batches)


class TestIncrementalAnnProperty:
    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_any_split_equals_batch_ivf(self, spark, data):
        import tempfile

        from mofka_spark.operators.similarity import fit_centroids, ivf_topk
        from mofka_spark.streaming.annindex import ann_index_sink, search_index

        dim = 4
        n = data.draw(st.integers(6, 14))
        vecs = [
            (
                i,
                [
                    data.draw(
                        st.floats(-1, 1, allow_nan=False, width=32)
                    )
                    for _ in range(dim)
                ],
            )
            for i in range(n)
        ]
        # degenerate all-zero vectors make cosine undefined; nudge
        vecs = [
            (i, v if any(abs(x) > 1e-3 for x in v) else [1.0, 0.0, 0.0, 0.0])
            for i, v in vecs
        ]
        emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        cents = fit_centroids(emb, "vec_id", "embedding", 4, seed=7)
        cut = data.draw(st.integers(1, n - 1))
        store = tempfile.mkdtemp(prefix="prop-ann-") + "/store"
        sink = ann_index_sink(store, cents, id_col="vec_id")
        sink(emb.filter(F.col("vec_id") < cut), 0)
        sink(emb.filter(F.col("vec_id") >= cut), 1)
        queries = emb.filter(F.col("vec_id") < 3)
        inc = {
            tuple(r)
            for r in search_index(
                spark, store, queries, cents, k=3, nprobe=2
            ).collect()
        }
        bat = {
            tuple(r)
            for r in ivf_topk(
                queries, emb, k=3, n_centroids=4, nprobe=2, centroids=cents
            ).collect()
        }
        assert inc == bat, (vecs, cut)


class TestCdcChunkProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from("alpha beta gamma delta eps zeta".split()),
                min_size=1, max_size=30,
            ),
            min_size=1, max_size=5,
        )
    )
    def test_chunks_partition_the_document(self, spark, docs):
        # chunk word counts sum to the doc length, indexes are dense,
        # and re-running is bit-identical (pure function of content)
        from mofka_spark.operators.text import cdc_chunks

        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = cdc_chunks(df, w=2, divisor=3).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, ws in enumerate(docs):
            rs = sorted(by_doc[i], key=lambda r: r.chunk_idx)
            assert [r.chunk_idx for r in rs] == list(range(len(rs)))
            assert sum(r.n_words for r in rs) == len(ws)
        again = cdc_chunks(df, w=2, divisor=3).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out))


class TestRankBinProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        scores=st.lists(st.integers(0, 50), min_size=1, max_size=60),
        n_bins=st.integers(2, 8),
    )
    def test_balanced_and_order_respecting(self, spark, scores, n_bins):
        from mofka_spark.operators.sampling import rank_bins

        rows = [(i, "g", s) for i, s in enumerate(scores)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "score"])
        out = rank_bins(df, "score", "lang", "doc_id", n_bins=n_bins).collect()
        sizes = {}
        for r in out:
            sizes[r.bin] = sizes.get(r.bin, 0) + 1
        # only bins < n_bins, populations differ by at most 1 when
        # n <= n_bins*floor(n/n_bins)+... (exact ntile-style balance)
        assert max(sizes) < n_bins
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # rank order respected: sort rows by (score, doc_id); bins must
        # be non-decreasing along that order
        ordered = sorted(out, key=lambda r: (r.score, r.doc_id))
        bins = [r.bin for r in ordered]
        assert bins == sorted(bins)


class TestWeightedSampleProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        n=st.integers(1, 40),
        k=st.integers(1, 10),
        salt=st.sampled_from(["", "s1"]),
    )
    def test_size_determinism_and_merge(self, spark, n, k, salt):
        # |sample| = min(k, n); deterministic; and sampling a UNION of
        # two disjoint shards == taking the k best of the per-shard
        # samples (mergeability — the property that makes A-ES correct
        # under distribution)
        from mofka_spark.operators.sampling import weighted_sample

        rows = [(i, "g", 1 + (i * 7) % 13) for i in range(n)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "wt"])
        out = weighted_sample(df, "doc_id", "wt", "lang", k, salt=salt).collect()
        assert len(out) == min(k, n)
        again = weighted_sample(df, "doc_id", "wt", "lang", k, salt=salt).collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out))
        half = n // 2
        a = weighted_sample(
            df.filter(F.col("doc_id") < half), "doc_id", "wt", "lang", k, salt=salt
        )
        b = weighted_sample(
            df.filter(F.col("doc_id") >= half), "doc_id", "wt", "lang", k, salt=salt
        )
        merged = sorted(
            a.unionByName(b).collect(), key=lambda r: (r.race_key, r.doc_id)
        )[: min(k, n)]
        assert sorted(r.doc_id for r in merged) == sorted(r.doc_id for r in out)


class TestTransitionMatrixProperties:
    @settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        st.lists(
            st.tuples(st.integers(1, 4), st.sampled_from(["a", "b", "c"])),
            min_size=2,
            max_size=40,
        )
    )
    def test_probabilities_partition_and_counts_conserve(self, spark, evs):
        """Per from_type the probabilities sum to 1; total transition
        count equals sum over users of (n_events - 1)."""
        import datetime

        from mofka_spark.operators.events import transition_matrix

        rows = [
            (u, t, datetime.datetime(2024, 1, 1, 0, 0, i), i)
            for i, (u, t) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows, ["user_id", "event_type", "ts", "event_id"]
        )
        out = transition_matrix(df).collect()
        per_user = {}
        for u, _ in evs:
            per_user[u] = per_user.get(u, 0) + 1
        expect_total = sum(n - 1 for n in per_user.values())
        assert sum(r.n_transitions for r in out) == expect_total
        by_from = {}
        for r in out:
            by_from.setdefault(r.from_type, 0.0)
            by_from[r.from_type] += r.probability
        for s in by_from.values():
            assert abs(s - 1.0) < 1e-4


class TestContainmentProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=4, max_size=12),
            min_size=2,
            max_size=8,
        )
    )
    def test_bounds_orientation_and_self_containment(self, spark, docs):
        """containment in (0, 1]; id_a < id_b; a doc duplicated
        verbatim always yields containment 1.0 with its copy."""
        from mofka_spark.operators.dedup import containment_pairs

        texts = [" ".join(d) for d in docs] + [" ".join(docs[0])]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        out = containment_pairs(df, threshold=0.01).collect()
        for r in out:
            assert 0.0 < r.containment <= 1.0
            assert r.id_a < r.id_b
        dup_pair = [
            r for r in out if r.id_a == 0 and r.id_b == len(texts) - 1
        ]
        assert dup_pair and dup_pair[0].containment == 1.0


class TestTemperatureMixProperties:
    @settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        st.dictionaries(
            st.sampled_from(["s1", "s2", "s3", "s4"]),
            st.integers(5, 60),
            min_size=2,
            max_size=4,
        ),
        st.floats(0.0, 1.0),
    )
    def test_budget_shares_follow_power_weights(self, spark, sizes, alpha):
        """Expected kept rows per stratum = target * n^alpha / sum —
        verified on the RATES (exact), not the hash draw (noisy)."""
        from mofka_spark.operators.sampling import temperature_mix

        rows = [
            (f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)
        ]
        df = spark.createDataFrame(rows, ["key", "stratum"])
        total = sum(sizes.values())
        target = max(1, total // 3)
        _, rates = temperature_mix(
            df, "key", "stratum", target_rows=target, alpha=alpha
        )
        wsum = sum(n**alpha for n in sizes.values())
        for s, n in sizes.items():
            expect = min(1.0, target * (n**alpha) / wsum / n)
            assert abs(rates[s] - expect) < 1e-9


class TestBloomStoreProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_any_split_equals_one_epoch_filter(self, spark, data):
        """OR-merge algebra: the filter built from ANY epoch split (and
        any replay) has EXACTLY the bit set of the single-batch filter —
        so membership answers are split-invariant, and ingested keys are
        always found."""
        import tempfile

        from mofka_spark.streaming.bloom import bloom_sink, read_membership

        keys = data.draw(
            st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                     min_size=1, max_size=20, unique=True)
        )
        n_batches = data.draw(st.integers(1, min(3, len(keys))))
        replay = data.draw(st.booleans())

        def words(path):
            return {
                (r.word, r.bits)
                for r in spark.read.parquet(path)
                .groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
                .collect()
            }

        one = tempfile.mkdtemp(prefix="prop-bloom1-") + "/store"
        bloom_sink(one, "key", m_bits=1 << 10, k=3)(
            spark.createDataFrame([(k,) for k in keys], "key string"), 0
        )
        split = tempfile.mkdtemp(prefix="prop-bloomN-") + "/store"
        sink = bloom_sink(split, "key", m_bits=1 << 10, k=3)
        per = (len(keys) + n_batches - 1) // n_batches
        for eid in range(n_batches):
            chunk = keys[eid * per:(eid + 1) * per]
            if chunk:
                sink(spark.createDataFrame([(k,) for k in chunk], "key string"), eid)
                if replay:
                    sink(spark.createDataFrame([(k,) for k in chunk], "key string"), eid)
        assert words(one) == words(split)
        probes = spark.createDataFrame([(k,) for k in keys], "key string")
        hits = read_membership(spark, split, probes, "key", m_bits=1 << 10, k=3)
        assert hits.filter(~F.col("might_contain")).count() == 0


class TestSampleStoreProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_any_split_equals_direct_bottom_k(self, spark, data):
        """Bottom-k of per-epoch bottom-ks == bottom-k of the full key
        set, for any split and arrival order."""
        import tempfile

        from mofka_spark.operators.sampling import hash_bucket
        from mofka_spark.streaming.sample import read_sample, sample_sink

        keys = data.draw(
            st.lists(st.text(alphabet="xyz0123", min_size=1, max_size=6),
                     min_size=1, max_size=25, unique=True)
        )
        order = data.draw(st.permutations(keys))
        n_batches = data.draw(st.integers(1, min(4, len(keys))))
        k = data.draw(st.integers(1, 6))

        expected = [
            (r.key, r.race)
            for r in spark.createDataFrame([(x,) for x in keys], "key string")
            .withColumn("race", hash_bucket(F.col("key"), "rs"))
            .orderBy("race", "key").limit(k).collect()
        ]
        store = tempfile.mkdtemp(prefix="prop-sample-") + "/store"
        sink = sample_sink(store, "key", k=k)
        per = (len(order) + n_batches - 1) // n_batches
        for eid in range(n_batches):
            chunk = order[eid * per:(eid + 1) * per]
            if chunk:
                sink(spark.createDataFrame([(x,) for x in chunk], "key string"), eid)
        got = [
            (r.key, r.race)
            for r in read_sample(spark, store, k=k).orderBy("rnk").collect()
        ]
        assert got == expected, (keys, n_batches, k)


class TestDsirProperties:
    """DSIR invariants: weights are split-invariant (mergeable bucket
    sums) and scale-equivariant under target choice."""

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                min_size=1, max_size=6,
            ).map(" ".join),
            min_size=2, max_size=12,
        ),
        cut=st.integers(0, 11),
    )
    def test_store_split_invariance(self, spark, tmp_path_factory, texts, cut):
        from mofka_spark.operators.sampling import dsir_weights
        from mofka_spark.streaming.dsirstore import dsir_sink, read_bucket_counts

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        target = docs.filter(F.col("doc_id") % 2 == 0)
        cut = min(cut, len(texts))
        path = str(tmp_path_factory.mktemp("dsirprop") / "s")
        sink = dsir_sink(path)
        sink(docs.filter(F.col("doc_id") < cut), 0)
        sink(docs.filter(F.col("doc_id") >= cut), 1)
        batch = sorted(map(tuple, dsir_weights(docs, target).collect()))
        stored = sorted(
            map(
                tuple,
                dsir_weights(
                    docs, target,
                    raw_counts=read_bucket_counts(spark, path),
                ).collect(),
            )
        )
        assert batch == stored


class TestInterleaveProperties:
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 500), st.sampled_from(["a", "b", "c"])),
            min_size=1, max_size=40, unique_by=lambda t: t[0],
        )
    )
    def test_keys_form_per_stratum_bijection_in_unit_interval(
        self, spark, rows
    ):
        from mofka_spark.operators.sampling import interleave_strata

        df = spark.createDataFrame(rows, ["doc_id", "s"])
        out = interleave_strata(df, "doc_id", "s").collect()
        assert len(out) == len(rows)
        by_s = {}
        for r in out:
            assert 0.0 < r.interleave_key < 1.0
            by_s.setdefault(r.s, []).append(r.interleave_key)
        for s, keys in by_s.items():
            n = len(keys)
            # exactly the lattice {(i - 0.5)/n : i = 1..n}
            assert sorted(keys) == [(i + 0.5) / n for i in range(n)]


class TestCountMinProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_never_undercounts_and_split_invariant(self, spark, data):
        """For ANY multiset of keys, ANY (depth, width), and ANY split
        into shards: est(key) >= true(key) for every key (seen or
        not), and cell-wise-summed shard sketches estimate exactly
        like the whole-corpus sketch."""
        from mofka_spark.operators.sketch import (
            count_min_build,
            count_min_estimate,
        )

        keys = data.draw(
            st.lists(
                st.text(alphabet="abcdefg", min_size=1, max_size=3),
                min_size=1,
                max_size=30,
            )
        )
        depth = data.draw(st.integers(1, 4))
        width = data.draw(st.sampled_from([1, 2, 8, 64]))
        cut = data.draw(st.integers(0, len(keys)))
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        probe_keys = sorted(set(keys) | {"zzz-absent"})
        probes = spark.createDataFrame([(k,) for k in probe_keys], "k string")
        whole = count_min_build(df, "k", depth=depth, width=width)
        est = {
            r.k: r.est
            for r in count_min_estimate(
                whole, probes, "k", depth=depth, width=width
            ).collect()
        }
        true = {k: keys.count(k) for k in probe_keys}
        for k in probe_keys:
            assert est[k] >= true.get(k, 0), (k, est[k], true)
        # shard merge == whole
        a = spark.createDataFrame([(k,) for k in keys[:cut]] or [("_",)], "k string")
        b = spark.createDataFrame([(k,) for k in keys[cut:]] or [("_",)], "k string")
        merged = (
            count_min_build(a, "k", depth=depth, width=width)
            .unionAll(count_min_build(b, "k", depth=depth, width=width))
            .groupBy("r", "c")
            .agg(F.sum("cnt").alias("cnt"))
        )
        est2 = {
            r.k: r.est
            for r in count_min_estimate(
                merged, probes, "k", depth=depth, width=width
            ).collect()
        }
        pad = {"_": 1} if (cut == 0 or cut == len(keys)) else {}
        for k in probe_keys:
            # the '_' padding key (empty-shard stand-in) can only ADD
            # collisions, so est2 >= est always; equality holds when
            # no pad was needed
            if not pad:
                assert est2[k] == est[k], (k, est2[k], est[k])
            else:
                assert est2[k] >= est[k]


class TestKmeansProperties:
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(data=st.data())
    def test_assignment_is_nearest_centroid(self, spark, data):
        """For ANY corpus and ANY fitted centroids, every row's cell
        is the true argmin of squared L2 distance (ties to the lower
        cell id) — the invariant Lloyd's assignment step must hold."""
        from mofka_spark.operators.similarity import (
            kmeans_cells,
            kmeans_fit_full,
        )

        dim = data.draw(st.integers(1, 4))
        vec = st.lists(
            st.integers(-5, 5).map(float), min_size=dim, max_size=dim
        )
        rows = data.draw(
            st.lists(vec, min_size=2, max_size=15).map(
                lambda vs: list(enumerate(vs))
            )
        )
        k = data.draw(st.integers(1, 3))
        iters = data.draw(st.integers(0, 2))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_fit_full(df, k=k, iters=iters)
        # init takes the k smallest ids; a corpus smaller than k can
        # only seed as many centroids as it has rows
        assert len(cents) == min(k, len(rows))
        got = {r.vec_id: r.cell for r in kmeans_cells(df, cents).collect()}
        for vid, v in rows:
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(v, c)), j)
                for j, c in enumerate(cents)
            ]
            want = min(dists)[1]
            # float fold order differs from python sum only below any
            # integer-coordinate distance gap, so argmin is exact here
            assert got[vid] == want, (vid, v, cents, dists)


class TestCurriculumSelectProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(
                st.floats(-100, 100, allow_nan=False),
                st.integers(1, 50),
            ),
            min_size=1,
            max_size=40,
        ),
        budget=st.integers(1, 400),
        n_bins=st.sampled_from([2, 7, 1024]),
    )
    def test_binned_threshold_equals_sequential_greedy(
        self, spark, rows, budget, n_bins
    ):
        """The binned two-phase selection must equal the literal global
        greedy for ANY score distribution, budget, and bin count —
        including duplicate scores, single-bin degeneracy, and budgets
        beyond the corpus."""
        from mofka_spark.operators.sampling import curriculum_select

        data = [(i, s, w) for i, (s, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, score double, w long")
        got = sorted(
            r["id"]
            for r in curriculum_select(
                df, "score", "w", "id", budget, n_bins=n_bins
            ).collect()
        )
        taken, acc = [], 0
        for rid, s, w in sorted(data, key=lambda r: (-r[1], r[0])):
            if acc >= budget:
                break
            taken.append(rid)
            acc += w
        assert got == sorted(taken)


class TestGroupTokenCapProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 30)),
            min_size=1,
            max_size=40,
        ),
        cap=st.integers(1, 200),
    )
    def test_budget_and_overshoot_invariants(self, spark, rows, cap):
        """Every group's kept mass is < cap + its largest row (one-row
        overshoot), groups under budget keep everything, and the kept
        set is a deterministic function of the input."""
        from mofka_spark.operators.sampling import group_token_cap

        data = [(i, g, w) for i, (g, w) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, g string, w long")
        out = group_token_cap(df, "id", "g", "w", cap).collect()
        kept = {}
        for r in out:
            kept.setdefault(r["g"], []).append((r["id"], r["w"]))
        tot_in = {}
        for i, g, w in data:
            tot_in[g] = tot_in.get(g, 0) + w
        for g, members in kept.items():
            mass = sum(w for _, w in members)
            assert mass < cap + max(w for _, w in members)
            if tot_in[g] <= cap:
                assert mass == tot_in[g]
        # under-budget groups must be fully present
        for g, tot in tot_in.items():
            if tot <= cap:
                assert sum(w for _, w in kept.get(g, [])) == tot


class TestBlendScoresProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        vals=st.lists(
            st.tuples(
                st.floats(-50, 50, allow_nan=False),
                st.floats(-50, 50, allow_nan=False),
            ),
            min_size=2,
            max_size=30,
        )
    )
    def test_percentiles_bounded_and_monotone(self, spark, vals):
        """pr columns live in [0, 1]; a strictly larger signal value
        never gets a smaller percentile; blended respects the weights'
        linearity."""
        from mofka_spark.operators.quality import blend_scores

        data = [(i, a, b) for i, (a, b) in enumerate(vals)]
        df = spark.createDataFrame(data, "id long, a double, b double")
        out = {r["id"]: r for r in
               blend_scores(df, {"a": 0.6, "b": 0.4}, "id").collect()}
        byid = {i: (a, b) for i, a, b in data}
        rows = sorted(out, key=lambda i: byid[i][0])
        for i in out:
            assert 0.0 <= out[i]["pr_a"] <= 1.0
            assert 0.0 <= out[i]["pr_b"] <= 1.0
        for x, y in zip(rows, rows[1:]):
            if byid[x][0] < byid[y][0]:
                assert out[x]["pr_a"] <= out[y]["pr_a"]


def _py_bpe(word_freq: dict, n_merges: int, min_pair: int = 2):
    """Pure-Python Sennrich BPE trainer (the spec bpe_train must
    match): overlapping pair counts, (count desc, lhs asc, rhs asc)
    argmax, greedy left-to-right application."""
    segs = {w: list(w) for w in word_freq}
    merges = []
    for it in range(n_merges):
        counts: dict = {}
        for w, f in word_freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + f
        cands = [
            (c, a, b) for (a, b), c in counts.items() if c >= min_pair
        ]
        if not cands:
            break
        cands.sort(key=lambda t: (-t[0], t[1], t[2]))
        cnt, a, b = cands[0]
        merges.append((it + 1, a, b, a + b, cnt))
        for w in segs:
            s = segs[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def _py_bpe_batched(word_freq: dict, n_merges: int, batch: int,
                    min_pair: int = 2):
    """Pure-Python mirror of bpe_train's BATCHED round loop: sorted
    pair table -> _bpe_select_batch (the same selection code the
    distributed trainer runs) -> sequential greedy application of the
    accepted merges. Exercises the conservative-exact selection rule
    against the sequential reference without paying a Spark job per
    example."""
    from mofka_spark.operators.text import _bpe_select_batch

    segs = {w: list(w) for w in word_freq}
    merges = []
    while len(merges) < n_merges:
        counts: dict = {}
        for w, f in word_freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                counts[k] = counts.get(k, 0) + f
        cands = sorted(
            (
                {"lhs": a, "rhs": b, "cnt": c}
                for (a, b), c in counts.items()
                if c >= min_pair
            ),
            key=lambda r: (-r["cnt"], r["lhs"], r["rhs"]),
        )
        if not cands:
            break
        b = min(batch, n_merges - len(merges))
        top_k = 1 if b == 1 else max(32, 8 * b)
        rows = cands[:top_k]
        picked = _bpe_select_batch(rows, b, truncated=len(rows) == top_k)
        for lhs, rhs, cnt in picked:
            merges.append((len(merges) + 1, lhs, rhs, lhs + rhs, cnt))
            for w in segs:
                s = segs[w]
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                segs[w] = out
    return merges, segs


class TestBpeProperties:
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        # two-letter alphabet: maximal density of the prefix-adjacency
        # pathology (symbol "ba" starting with merge-rhs "b") that a
        # prefix-only separator scheme mis-merged — caught by this
        # suite's encode property in round 9
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        ),
        reps=st.lists(st.integers(1, 5), min_size=12, max_size=12),
    )
    def test_train_matches_python_reference(self, spark, words, reps):
        # arbitrary small corpora: distributed bpe_train must replay
        # the exact Sennrich merge sequence, including ties and
        # overlapping pairs (e.g. runs of one character)
        from mofka_spark.operators.text import bpe_train

        corpus = " ".join(w for w, r in zip(words, reps) for _ in range(r))
        wf: dict = {}
        for w in corpus.split():
            wf[w] = wf.get(w, 0) + 1
        ref, _ = _py_bpe(wf, n_merges=4)
        df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train(df, n_merges=4).orderBy("rank").collect()
        ]
        assert got == ref

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=5),
            min_size=2,
            max_size=8,
        ),
    )
    def test_encode_matches_training_segmentation(self, spark, words):
        # training-replay semantics: encoding the training corpus must
        # reproduce the Python reference's final segmentation
        from mofka_spark.operators.text import bpe_encode, bpe_train

        corpus = " ".join(words + words)  # every word appears >= 2x
        wf: dict = {}
        for w in corpus.split():
            wf[w] = wf.get(w, 0) + 1
        _, ref_segs = _py_bpe(wf, n_merges=3)
        df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
        merges = bpe_train(df, n_merges=3)
        toks = corpus.split()
        for method in ("replace", "arrow"):
            enc = bpe_encode(df, merges, method=method).collect()
            got: dict = {}
            for r in enc:
                got.setdefault(r["word_pos"], []).append(
                    (r["piece_pos"], r["piece"])
                )
            for wpos, pieces in got.items():
                pieces = [p for _, p in sorted(pieces)]
                assert pieces == ref_segs[toks[wpos]], method


class TestBpeBatchedProperties:
    """The batched-merge selection must reproduce the SEQUENTIAL
    trainer's merge table exactly — the whole point of the
    conservative-exact rule (_bpe_select_batch). Pure-Python mirrors
    run the REAL selection code at fuzz scale; one Spark case pins
    the distributed loop's wiring."""

    @settings(max_examples=300, deadline=None)
    @given(
        # two-letter alphabet: tie- and conflict-dense (the regime
        # where naive batching diverges from sequential)
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=7),
            min_size=1,
            max_size=14,
        ),
        reps=st.lists(st.integers(1, 4), min_size=14, max_size=14),
        batch=st.integers(2, 6),
        n_merges=st.integers(1, 10),
    )
    def test_batched_selection_matches_sequential_ab(
        self, words, reps, batch, n_merges
    ):
        wf: dict = {}
        for w, r in zip(words, reps):
            wf[w] = wf.get(w, 0) + r
        ref, ref_segs = _py_bpe(wf, n_merges=n_merges)
        got, got_segs = _py_bpe_batched(wf, n_merges=n_merges, batch=batch)
        assert got == ref
        assert got_segs == ref_segs

    @settings(max_examples=200, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=8),
            min_size=2,
            max_size=20,
        ),
        batch=st.integers(2, 8),
    )
    def test_batched_selection_matches_sequential_wider_alphabet(
        self, words, batch
    ):
        wf: dict = {}
        for w in words:
            wf[w] = wf.get(w, 0) + 1
        ref, _ = _py_bpe(wf, n_merges=12)
        got, _ = _py_bpe_batched(wf, n_merges=12, batch=batch)
        assert got == ref

    @settings(max_examples=4, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=10,
        ),
    )
    def test_distributed_batched_matches_python_reference(
        self, spark, words
    ):
        from mofka_spark.operators.text import bpe_train

        corpus = " ".join(words + words)
        wf: dict = {}
        for w in corpus.split():
            wf[w] = wf.get(w, 0) + 1
        ref, _ = _py_bpe(wf, n_merges=5)
        df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train(df, n_merges=5, merges_per_round=3)
            .orderBy("rank")
            .collect()
        ]
        assert got == ref


class TestWinnowingProperties:
    @staticmethod
    def _py_winnow(text: str, k: int = 5, window: int = 4) -> set:
        """Pure-Python mirror of winnow_fingerprints' documented
        semantics: normalize, char k-shingles (short text -> one
        truncated shingle), 60-bit md5-prefix hashes, min per sliding
        window (short docs -> one window over everything), distinct."""
        import hashlib
        import re as _re

        # Spark trim strips SPACES only (not \t); mirror that exactly
        norm = _re.sub(r"\s+", " ", text.lower().strip(" "))
        n = max(len(norm) - (k - 1), 1)
        grams = [norm[i:i + k] for i in range(n)]
        hashes = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            for g in grams
        ]
        nwin = max(len(hashes) - (window - 1), 1)
        return {
            min(hashes[i:i + window]) for i in range(nwin)
        }

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        text=st.text(
            alphabet="ab x.\t", min_size=1, max_size=40
        ).filter(lambda t: t.strip())
    )
    def test_matches_python_mirror(self, spark, text):
        # guards the expression machinery (try_element_at past-the-end,
        # short-doc single-window path, normalization) against an
        # independent evaluator — the check class that caught the BPE
        # separator bug
        from mofka_spark.operators.text import winnow_fingerprints

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = {
            r["fingerprint"]
            for r in winnow_fingerprints(df).collect()
        }
        assert got == self._py_winnow(text)


class TestCdcChunkProperties:
    @staticmethod
    def _py_cdc(text, w=3, divisor=8, min_words=1):
        """Pure-Python mirror of cdc_chunks' documented semantics."""
        import hashlib
        import re as _re

        toks = _re.split(r"\s+", text.lower().strip(" "))
        n = len(toks)
        gh = {}
        for i in range(w, n + 1):
            gram = " ".join(toks[i - w:i])
            gh[i] = int(
                hashlib.md5(gram.encode()).hexdigest()[:15], 16
            )
        cuts = [
            i for i in range(1, n + 1)
            if i == n or (i in gh and gh[i] % divisor == 0)
        ]
        starts = [0] + cuts[:-1]
        chunks = [
            (e - s,
             hashlib.md5(" ".join(toks[s:e]).encode()).hexdigest())
            for s, e in zip(starts, cuts)
        ]
        return [
            (idx, nw, h)
            for idx, (nw, h) in enumerate(
                c for c in chunks if c[0] >= min_words
            )
        ]

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        words=st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "e"]),
            min_size=1, max_size=30,
        ),
        min_words=st.integers(1, 3),
    )
    def test_matches_python_mirror(self, spark, words, min_words):
        # the cut logic (null w-gram guard, doc-end close, min_words
        # drop, POST-filter chunk_idx) re-evaluated independently
        from mofka_spark.operators.text import cdc_chunks

        text = " ".join(words)
        df = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        got = sorted(
            (r["chunk_idx"], r["n_words"], r["chunk_hash"])
            for r in cdc_chunks(df, min_words=min_words).collect()
        )
        assert got == self._py_cdc(text, min_words=min_words)


class TestRetentionCurveProperties:
    """retention_curve == a pure-pandas mirror on arbitrary scored
    frames: kept counts/weights per (group, threshold), totals
    including NULL/NaN scores, and the monotone structure
    (n_kept non-increasing in threshold)."""

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.one_of(
                    st.none(),
                    st.just(float("nan")),
                    st.floats(-2.0, 2.0, allow_nan=False),
                ),
                st.integers(0, 100),
            ),
            min_size=1,
            max_size=40,
        ),
        thresholds=st.lists(
            st.floats(-1.5, 1.5, allow_nan=False),
            min_size=1, max_size=5, unique=True,
        ),
    )
    def test_matches_pandas_mirror(self, spark, rows, thresholds):
        import math

        from mofka_spark.operators.quality import retention_curve

        df = spark.createDataFrame(
            [(i, g, s, w) for i, (g, s, w) in enumerate(rows)],
            "id long, grp string, score double, w long",
        )
        got = {
            (r["grp"], r["threshold"]): r
            for r in retention_curve(
                df, thresholds, group_col="grp", weight_col="w"
            ).collect()
        }
        groups = {g for g, _, _ in rows}
        assert set(got) == {(g, t) for g in groups for t in thresholds}
        for g in groups:
            grows = [(s, w) for gg, s, w in rows if gg == g]
            nd, wd = len(grows), float(sum(w for _, w in grows))
            per_t = []
            for t in thresholds:
                kept = [
                    (s, w) for s, w in grows
                    if s is not None and not math.isnan(s) and s >= t
                ]
                r = got[(g, t)]
                assert r["n_kept"] == len(kept)
                assert r["w_kept"] == pytest.approx(
                    float(sum(w for _, w in kept))
                )
                assert r["frac_docs"] == pytest.approx(len(kept) / nd)
                if wd:
                    assert r["frac_weight"] == pytest.approx(
                        sum(w for _, w in kept) / wd
                    )
                else:
                    assert r["frac_weight"] is None
                per_t.append((t, len(kept)))
            # monotone: higher threshold never keeps more
            per_t.sort()
            for (t1, k1), (t2, k2) in zip(per_t, per_t[1:]):
                assert k1 >= k2


def _py_unigram_segment_all(word, logp, max_len):
    """Brute-force enumeration of ALL segmentations (multi-char pieces
    must be in the inventory; unknown single chars fall back at the
    floor log-prob), argmax by (score, fewer pieces, lexicographically
    smallest sequence) — structurally different from the operator's
    Viterbi DP, so agreement is a genuine cross-check."""
    floor = (min(logp.values()) if logp else 0.0) - 1.0
    results = []

    def rec(i, seq, score):
        if i == len(word):
            results.append((score, -len(seq), tuple(seq)))
            return
        for ln in range(1, min(max_len, len(word) - i) + 1):
            p = word[i : i + ln]
            lp = logp.get(p)
            if lp is None:
                if ln > 1:
                    continue
                lp = floor
            rec(i + ln, seq + [p], score + lp)

    rec(0, [], 0.0)
    best = max(r[:2] for r in results)
    return list(min(r[2] for r in results if r[:2] == best))


def _py_unigram_train(word_freq, vocab_size, max_len, seed_size,
                      seed_min, n_iters):
    """Pure-Python mirror of unigram_train (viterbi objective)."""
    import math

    sub: dict = {}
    chars: dict = {}
    for w, f in word_freq.items():
        for i in range(len(w)):
            chars[w[i]] = chars.get(w[i], 0) + f
            for ln in range(2, min(max_len, len(w) - i) + 1):
                p = w[i : i + ln]
                sub[p] = sub.get(p, 0) + f
    multi = sorted(
        ((p, c) for p, c in sub.items() if c >= seed_min),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    counts = dict(chars)
    counts.update(dict(multi))
    charset = sorted(chars)
    for _ in range(n_iters):
        total = float(sum(counts.values())) or 1.0
        logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
        new: dict = {}
        for w, f in word_freq.items():
            for p in _py_unigram_segment_all(w, logp, max_len):
                new[p] = new.get(p, 0) + f
        kept = sorted(
            ((p, c) for p, c in new.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )[: max(vocab_size - len(charset), 0)]
        counts = {c: new.get(c, 0) for c in charset}
        counts.update(dict(kept))
    out = [(p, counts[p], True, i + 1) for i, p in enumerate(charset)]
    for j, (p, c) in enumerate(
        sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
    ):
        out.append((p, c, False, len(charset) + j + 1))
    return out


class TestUnigramProperties:
    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        words=st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1, max_size=10,
        ),
        reps=st.lists(st.integers(1, 5), min_size=10, max_size=10),
    )
    def test_train_matches_python_mirror(self, spark, words, reps):
        # arbitrary small corpora: the distributed hard-EM trainer
        # (Viterbi DP kernel + Spark aggregates) must reproduce the
        # brute-force pure-Python mirror exactly — counts, pruning,
        # tie-breaks, ids
        from mofka_spark.operators.text import unigram_train

        corpus = " ".join(w for w, r in zip(words, reps) for _ in range(r))
        wf: dict = {}
        for w in corpus.split():
            wf[w] = wf.get(w, 0) + 1
        ref = sorted(
            _py_unigram_train(wf, vocab_size=8, max_len=3, seed_size=16,
                              seed_min=2, n_iters=2)
        )
        df = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
        got = sorted(
            (r["piece"], r["freq"], r["is_char"], r["token_id"])
            for r in unigram_train(
                df, vocab_size=8, max_piece_len=3, seed_size=16,
                seed_min_count=2, n_iters=2,
            ).collect()
        )
        assert got == ref

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        words=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=7),
            min_size=1, max_size=8,
        ),
    )
    def test_viterbi_dp_matches_bruteforce(self, spark, words):
        # the DP inside the kernel vs full enumeration, on a fixed
        # hand inventory — pure Python on both sides, no Spark jobs
        import math

        from mofka_spark.operators.text import _unigram_segment_word

        inv = {"ab": 5, "bc": 4, "abc": 3, "a": 6, "b": 2, "c": 2,
               "aa": 2, "cc": 2}
        total = float(sum(inv.values()))
        logp = {p: math.log(c / total) for p, c in inv.items()}
        for w in words:
            assert _unigram_segment_word(w, logp, 3, "viterbi") == \
                _py_unigram_segment_all(w, logp, 3)


class TestAlternatingComponentsProperty:
    """connected_components_alternating vs a pure-Python union-find:
    the large-star/small-star fixed point must be EXACTLY the
    connected components of the input, for arbitrary edge lists
    (multi-edges, self-loops, isolated stars, long chains)."""

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 40), st.integers(0, 40)),
            min_size=1, max_size=60,
        )
    )
    def test_matches_union_find(self, spark, edges):
        from mofka_spark.operators.graph import (
            connected_components_alternating,
        )

        # reference: union-find with path compression
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        nodes = set()
        for a, b in edges:
            if a != b:
                union(a, b)
                nodes.update((a, b))
        # min-id root per node (re-find after all unions)
        expected = {}
        for n in nodes:
            r = n
            while parent.get(r, r) != r:
                r = parent[r]
            # find() roots are min only if unions kept min as root —
            # they do (parent[max] = min), but compress fully anyway
            expected[n] = r

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components_alternating(df).collect()
        }
        assert got == expected


class TestRobotsRulesProperty:
    """robots_rules_filter vs a pure-Python most-specific resolver
    (domain-match length, then path length, then allow) over
    hypothesis-drawn rule sets and URLs — run in BOTH regimes: the
    literal-folded plan and the broadcast-join swap must match the
    resolver (and hence each other) exactly."""

    _DOMS = ("a.com", "b.a.com", "c.org")
    _PREFS = ("/", "/x", "/x/y", "/xz", "/y")

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        rules=st.lists(
            st.tuples(
                st.sampled_from(_DOMS),
                st.sampled_from(_PREFS),
                st.booleans(),
            ),
            min_size=0, max_size=8,
        ),
        paths=st.lists(st.sampled_from(
            ("/", "/x", "/x/y/z", "/xz/1", "/y/", "/other")
        ), min_size=1, max_size=6),
        hosts=st.lists(st.sampled_from(
            ("a.com", "www.a.com", "sub.b.a.com", "c.org", "zc.org")
        ), min_size=1, max_size=6),
    )
    def test_matches_python_resolver(self, spark, rules, paths, hosts):
        from mofka_spark.operators.webtext import robots_rules_filter

        urls = [
            f"http://{h}{p}"
            for h, p in zip(hosts, paths * ((len(hosts) // len(paths)) + 1))
        ]

        def strip_www(d):
            return d[4:] if d.startswith("www.") else d

        def resolve(host, path):
            host = strip_www(host)
            cand = [
                (len(d), len(p), a, p)
                for d, p, a in {
                    (strip_www(rd.lower()), rp, ra) for rd, rp, ra in rules
                }
                if (host == d or host.endswith("." + d))
                and path.startswith(p)
            ]
            if not cand:
                return (None, True)
            _dl, _ln, a, p = max(cand)
            return (p, a)

        expected = {
            i: resolve(h, p)
            for i, (h, p) in enumerate(
                (u.split("://", 1)[1].split("/", 1)[0],
                 "/" + (u.split("://", 1)[1].split("/", 1)[1]
                        if "/" in u.split("://", 1)[1] else ""))
                for u in urls
            )
        }
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "id long, url string"
        )
        for max_literal in (10_000, 0):  # literal fold, broadcast swap
            got = {
                r["id"]: (r["rule_path"], r["allowed"])
                for r in robots_rules_filter(
                    df, list(rules), max_literal_entries=max_literal
                ).collect()
            }
            assert got == expected, f"regime max_literal={max_literal}"
