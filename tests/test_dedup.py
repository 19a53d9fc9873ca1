"""Dedup operator unit tests: LSH hot-bucket cap, pigeonhole banding
recall, portable simhash, connected-components keeper assignment."""

import pytest
from pyspark.sql import functions as F

from mofka_spark.operators import dedup, graph


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestHotBucketCap:
    def test_boilerplate_bucket_is_capped(self, spark):
        # 1000 identical boilerplate docs + 2 genuinely-near docs.
        # Uncapped, the boilerplate bucket alone yields ~500k pairs;
        # with the cap the candidate count stays bounded.
        boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit") for i in range(1000)]
        near = [
            (2000, "a completely different document about spark engines"),
            (2001, "a completely different document about spark enginez"),
        ]
        df = _docs(spark, boiler + near)
        capped = dedup.minhash_lsh_candidates(df, bucket_cap=100)
        n = capped.count()
        # boilerplate pairs dropped entirely; the near pair survives
        assert n < 5000
        pairs = {(r.id_a, r.id_b) for r in capped.collect()}
        assert (2000, 2001) in pairs

    def test_uncapped_finds_boilerplate(self, spark):
        boiler = [(i, "same text here for everyone in this tiny corpus") for i in range(20)]
        df = _docs(spark, boiler)
        n = dedup.minhash_lsh_candidates(df, bucket_cap=None).count()
        assert n == 20 * 19 // 2

    def test_simhash_cap(self, spark):
        boiler = [(i, "identical words repeated in all of these documents") for i in range(50)]
        df = _docs(spark, boiler)
        uncapped = dedup.simhash_dedup(df, bucket_cap=None).count()
        capped = dedup.simhash_dedup(df, bucket_cap=10).count()
        assert uncapped == 50 * 49 // 2
        assert capped == 0


class TestSimhashBanding:
    def test_bands_derived_from_max_hamming(self, spark):
        # banded blocking must have 100% recall vs brute-force hamming
        # for every max_hamming (the round-1 bug: fixed 4 bands only
        # guaranteed recall up to hamming 3).
        rows = [
            (i, f"word{i} alpha beta gamma delta epsilon zeta eta theta " * 3)
            for i in range(40)
        ]
        df = _docs(spark, rows)
        for h in (1, 3, 6, 9):
            banded = dedup.simhash_dedup(df, max_hamming=h, bucket_cap=None)
            sigs = dedup.simhash_signatures(df)
            a, b = sigs.alias("a"), sigs.alias("b")
            brute = (
                a.join(b, F.col("a.id") < F.col("b.id"))
                .select(
                    F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                    dedup.hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
                )
                .filter(F.col("hamming") <= h)
            )
            got = {(r.id_a, r.id_b, r.hamming) for r in banded.collect()}
            want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
            assert got == want, f"recall broken at max_hamming={h}"

    def test_portable_matches_duckdb(self, spark):
        import duckdb

        rows = [(1, "the quick brown fox"), (2, "the quick brown foxes"), (3, "unrelated")]
        df = _docs(spark, rows)
        sigs = {r.id: r.sim for r in dedup.simhash_signatures(df, portable=True).collect()}
        con = duckdb.connect()
        con.sql("CREATE TABLE d AS SELECT * FROM (VALUES (1, 'the quick brown fox'), (2, 'the quick brown foxes'), (3, 'unrelated')) t(doc_id, text)")
        oracle = dict(
            con.sql(
                r"""
            WITH toks AS (
              SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t FROM d
            ), grams AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(t)-1, 1)),
                                    i -> array_to_string(t[i:i+1], ' '))) AS g FROM toks
            ), hashed AS (
              SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM grams
            ), votes AS (
              SELECT doc_id, bit, SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM hashed, (SELECT unnest(generate_series(0,59)) AS bit) GROUP BY doc_id, bit
            )
            SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
            FROM votes GROUP BY doc_id
            """
            ).fetchall()
        )
        assert sigs == oracle


class TestConnectedComponents:
    def test_transitive_chain(self, spark):
        # A~B, B~C but no A~C edge: single-hop misses keeper(C)=A
        edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
        comp = {r.id: r.component for r in graph.connected_components(edges).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_assign_keepers(self, spark):
        docs = _docs(spark, [(i, f"t{i}") for i in range(6)])
        edges = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
        out = {r.id: (r.keeper_id, r.is_duplicate) for r in graph.assign_keepers(docs, edges).collect()}
        assert out == {
            0: (0, False),
            1: (0, True),
            2: (0, True),
            3: (3, False),
            4: (4, False),
            5: (4, True),
        }

    def test_single_node_cycle_free(self, spark):
        edges = spark.createDataFrame([(7, 8)], ["id_a", "id_b"])
        comp = graph.connected_components(edges).collect()
        assert {(r.id, r.component) for r in comp} == {(7, 7), (8, 7)}

    def test_unknown_method_raises(self, spark):
        import pytest as _pt

        edges = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        with _pt.raises(ValueError, match="method"):
            graph.connected_components(edges, method="bogus")


class TestAlternatingComponents:
    """Large-star/small-star: O(log n) rounds regardless of diameter —
    the crawl-graph path (web_graph edges chain hundreds deep, where
    min-label propagation needs diameter rounds)."""

    def test_deep_chain_logarithmic_rounds(self, spark):
        # path graph, diameter 256: propagation would need ~256 rounds;
        # the alternating algorithm must finish within an O(log n)
        # budget (2 * log2(256) + slack = 20) or raise
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(256)], ["id_a", "id_b"]
        )
        comp = {
            r.id: r.component
            for r in graph.connected_components_alternating(
                edges, max_iter=20
            ).collect()
        }
        assert comp == {i: 0 for i in range(257)}

    def test_matches_propagation_on_random_graph(self, spark):
        import random

        rng = random.Random(12)
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(150)
        ]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        prop = {
            (r.id, r.component)
            for r in graph.connected_components(df, max_iter=60).collect()
        }
        alt = {
            (r.id, r.component)
            for r in graph.connected_components_alternating(df).collect()
        }
        # identical contracts, self-loop-only nodes excluded from both
        loops_only = {
            a for a, b in edges if a == b
        } - {x for a, b in edges if a != b for x in (a, b)}
        assert {p for p in prop if p[0] not in loops_only} == alt

    def test_string_node_ids(self, spark):
        # web_graph nodes are URLs: lexicographic min must be the root
        edges = spark.createDataFrame(
            [("http://b.com", "http://a.com"), ("http://c.com", "http://b.com")],
            ["id_a", "id_b"],
        )
        alt = {
            r.id: r.component
            for r in graph.connected_components_alternating(edges).collect()
        }
        assert alt == {
            "http://a.com": "http://a.com",
            "http://b.com": "http://a.com",
            "http://c.com": "http://a.com",
        }

    def test_empty_and_self_loops(self, spark):
        empty = spark.createDataFrame([], "id_a long, id_b long")
        assert graph.connected_components_alternating(empty).count() == 0
        loops = spark.createDataFrame([(5, 5)], ["id_a", "id_b"])
        assert graph.connected_components_alternating(loops).count() == 0

    def test_releases_checkpoints(self, spark):
        before = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], ["id_a", "id_b"]
        )
        graph.connected_components_alternating(edges).collect()
        after = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        # only the final round's frame may remain pinned
        assert len(after - before) <= 1

    def test_propagation_and_pagerank_release_rounds(self, spark):
        # iterative loops must not leak one persisted RDD per round
        # into long-lived sessions; only the final frame stays pinned
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
        )
        before = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        graph.connected_components(edges, max_iter=30).collect()
        mid = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        assert len(mid - before) <= 1
        nodes = edges.select(F.col("id_a").alias("id")).union(
            edges.select(F.col("id_b").alias("id"))
        )
        graph.pagerank(nodes, edges, iters=5).collect()
        after = set(
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
        )
        assert len(after - mid) <= 1


class TestTransitiveKeeperPipeline:
    def test_minhash_dedup_transitive_flag(self, spark):
        # a chain of overlapping near-identical docs: with single-hop
        # assignment the chain tail can keep a non-root keeper; with
        # transitive=True every cluster member maps to the min id
        base = "the quick brown fox jumps over the lazy dog again and again " * 4
        rows = [
            (0, base),
            (1, base + "tail one"),
            (2, base + "tail one two"),
            (3, "completely different text about spark engines " * 6),
        ]
        docs = _docs(spark, rows)
        out = dedup.minhash_lsh_dedup(
            docs, verify_threshold=0.5, transitive=True
        ).collect()
        m = {r.id: (r.keeper_id, r.is_duplicate) for r in out}
        assert m[0] == (0, False)
        assert m[1] == (0, True)
        assert m[2] == (0, True)
        assert m[3] == (3, False)


class TestComponentsMethodPassthrough:
    def test_minhash_dedup_alternating_equals_propagation(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again " * 4
        rows = [
            (0, base),
            (1, base + "tail one"),
            (2, base + "tail one two"),
            (3, "completely different text about spark engines " * 6),
        ]
        docs = _docs(spark, rows)
        prop = sorted(map(tuple, dedup.minhash_lsh_dedup(
            docs, verify_threshold=0.5, transitive=True
        ).collect()))
        alt = sorted(map(tuple, dedup.minhash_lsh_dedup(
            docs, verify_threshold=0.5, transitive=True,
            components_method="alternating",
        ).collect()))
        assert prop == alt


class TestPagerank:
    def test_star_graph_ordering(self, spark):
        from mofka_spark.operators.graph import pagerank

        nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
        # star: 0 at center of 1..4; 5 isolated
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 5)], ["id_a", "id_b"]
        )
        r = {row.id: row.rank for row in pagerank(nodes, edges).collect()}
        assert r[0] > r[1]  # hub concentrates rank
        assert r[1] == r[2] == r[3] == r[4]  # symmetric leaves
        assert r[5] < r[1]  # isolated node keeps teleport only
        assert abs(r[5] - 0.15 / 6) < 1e-6

    def test_fixed_point_of_symmetric_pair(self, spark):
        from mofka_spark.operators.graph import pagerank

        nodes = spark.createDataFrame([(1,), (2,)], ["id"])
        edges = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
        r = {row.id: row.rank for row in pagerank(nodes, edges, iters=3).collect()}
        # two-node symmetric graph: uniform 1/2 is the exact fixed point
        assert r[1] == r[2] == 0.5


class TestTriangleCount:
    def test_clique_and_tail(self, spark):
        from mofka_spark.operators.graph import triangle_count

        # 4-clique {0,1,2,3} plus a pendant 4-5 edge off node 3
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        edges = spark.createDataFrame(
            clique + [(3, 4), (4, 5)], ["id_a", "id_b"]
        )
        out = {r.id: r for r in triangle_count(edges).collect()}
        # each clique node sits on C(3,2)=3 triangles
        assert [out[i].triangles for i in range(3)] == [3, 3, 3]
        assert out[3].triangles == 3 and out[3].degree == 4
        assert out[4].triangles == 0 and out[4].degree == 2
        assert out[5].triangles == 0 and out[5].degree == 1
        # clustering: clique nodes deg 3 -> 2*3/(3*2)=1.0; node 3
        # deg 4 -> 2*3/12=0.5; degree-1 node defined as 0.0
        assert out[0].clustering == 1.0
        assert out[3].clustering == 0.5
        assert out[5].clustering == 0.0

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from mofka_spark.operators.graph import triangle_count

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 1)],
            ["id_a", "id_b"],
        )
        out = {r.id: r for r in triangle_count(edges).collect()}
        assert all(out[i].triangles == 1 for i in (1, 2, 3))
        assert all(out[i].degree == 2 for i in (1, 2, 3))

    def test_no_cartesian_in_plan(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.graph import triangle_count

        edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
        p = plans.plan_string(triangle_count(edges))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestAggressiveNormalization:
    def test_collapses_digit_punct_variants(self, spark):
        from mofka_spark.operators.dedup import exact_dedup

        docs = spark.createDataFrame(
            [
                (1, "Updated 2023! The cat sat."),
                (2, "updated 2024 -- the cat sat"),
                (3, "a different document entirely"),
            ],
            ["doc_id", "text"],
        )
        plain = exact_dedup(docs)
        assert plain.count() == 3  # plain canon keeps them apart
        agg = exact_dedup(docs, aggressive=True).collect()
        groups = {r.content_hash: r for r in agg}
        assert len(groups) == 2
        merged = [r for r in agg if r.n_copies == 2][0]
        assert merged.keeper_id == 1 and set(merged.ids) == {1, 2}

    def test_normalizer_output(self, spark):
        from pyspark.sql import functions as F
        from mofka_spark.operators.dedup import normalize_text_aggressive

        df = spark.createDataFrame([("  Héllo,   World 42!_x  ",)], ["t"])
        (row,) = df.select(
            normalize_text_aggressive(F.col("t")).alias("n")
        ).collect()
        # lowercase, digits->0, punctuation/underscore gone, ws collapsed
        assert row.n == "héllo world 00x"


class TestSoftDedupWeights:
    def test_cluster_mass_sums_to_one(self, spark):
        from pyspark.sql import functions as F
        from mofka_spark.operators.dedup import soft_dedup_weights

        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
            ["id", "keeper_id"],
        )
        out = soft_dedup_weights(comp)
        rows = {r.id: r for r in out.collect()}
        assert rows[1].cluster_size == 3 and rows[1].weight == round(1 / 3, 6)
        assert rows[4].cluster_size == 1 and rows[4].weight == 1.0
        mass = (
            out.groupBy("keeper_id").agg(F.round(F.sum("weight"), 4).alias("m"))
            .collect()
        )
        assert all(abs(r.m - 1.0) < 1e-3 for r in mass)

    def test_mass_survives_weighted_sampler(self, spark):
        """The drop-free composition soft_dedup_weights ->
        weighted_sample (the curation_pipeline.py stage-2b/4 path):
        per-cluster mass still sums to one unit after joining onto the
        corpus, and the sampler honors the fractional weights
        (race = -ln(u)/w, so halving w exactly doubles the same key's
        race key — pre-fix, weights < 1 were silently clamped to 1)."""
        from mofka_spark.operators.dedup import soft_dedup_weights
        from mofka_spark.operators.sampling import weighted_sample

        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4)], ["id", "keeper_id"]
        )
        docs = spark.createDataFrame(
            [(i, "s") for i in (1, 2, 3, 4)], ["id", "stratum"]
        )
        soft = soft_dedup_weights(comp)
        weighted = docs.join(soft.select("id", "weight"), "id")
        mass = (
            weighted.groupBy()
            .agg(F.sum("weight").alias("m"))
            .collect()[0]
            .m
        )
        # cluster {1,2,3} contributes ~1 + singleton 1 (6dp rounding)
        assert abs(mass - 2.0) < 1e-5
        # sampler honors fractional weights: same key, two strata,
        # weights w and w/2 draw the same u -> race ratio exactly 2
        race_df = spark.createDataFrame(
            [("a", 7, 0.5), ("b", 7, 1.0)], ["s", "id", "w"]
        )
        out = {
            r.s: r.race_key
            for r in weighted_sample(race_df, "id", "w", "s", k=1).collect()
        }
        assert abs(out["a"] - 2.0 * out["b"]) < 1e-6
        # end-to-end: race keys of the weighted corpus equal the
        # unit-weight races scaled by 1/weight (cluster members race
        # 3x slower), so the fractional weights are demonstrably in
        # force through the whole composition
        sampled = weighted_sample(weighted, "id", "weight", "stratum", k=4)
        got = {r.id: r.race_key for r in sampled.collect()}
        unit = weighted.withColumn("one", F.lit(1.0))
        base = {
            r.id: r.race_key
            for r in weighted_sample(unit, "id", "one", "stratum", k=4).collect()
        }
        w_of = {r.id: r.weight for r in soft.collect()}
        assert set(got) == {1, 2, 3, 4}
        for i in got:
            assert got[i] == pytest.approx(base[i] / w_of[i], rel=1e-5)


class TestClusterRepresentatives:
    """cluster_representatives: best-score keeper per component."""

    def _fixtures(self, spark):
        comp = spark.createDataFrame(
            # cluster 1 = {1, 2, 3}; cluster 7 = {7}; cluster 9 = {9, 10}
            [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
            "id long, keeper_id long",
        )
        scores = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 9.0), (7, 1.0), (9, None), (10, 4.0)],
            "id long, score double",
        )
        return comp, scores

    def test_best_score_wins_ties_break_id_asc(self, spark):
        from mofka_spark.operators.dedup import cluster_representatives

        comp, scores = self._fixtures(spark)
        out = {
            r["keeper_id"]: (r["rep_id"], r["rep_score"], r["cluster_size"])
            for r in cluster_representatives(comp, scores).collect()
        }
        # cluster 1: 2 and 3 tie at 9.0 -> id-asc picks 2.
        assert out[1] == (2, 9.0, 3)
        # singleton keeps itself.
        assert out[7] == (7, 1.0, 1)
        # null-scored member 9 can't compete; size counts scored only.
        assert out[9] == (10, 4.0, 1)

    def test_single_exchange_for_both_windows(self, spark):
        from mofka_spark.operators.dedup import cluster_representatives

        comp, scores = self._fixtures(spark)
        plan = (
            cluster_representatives(comp, scores)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # rank + size windows share the keeper-keyed partitioning: the
        # plan must not re-shuffle between them.
        n_keeper_exchanges = plan.count("hashpartitioning(keeper_id")
        assert n_keeper_exchanges <= 1, plan


class TestCrossCorpusDedup:
    """cross_corpus_dedup: new-vs-index LSH + exact verify."""

    _BASE = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )

    def _corpora(self, spark):
        index = spark.createDataFrame(
            [
                (10, self._BASE),
                (11, "totally different content about spark shuffles "
                     "and partition pruning strategies at scale"),
            ],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (1, self._BASE),                       # exact cross-dup
                (2, self._BASE + " extra trailing"),   # near cross-dup
                (3, "novel words entirely unlike anything indexed "
                    "nothing shared with either document at all ok"),
            ],
            "doc_id long, text string",
        )
        return new, index

    def test_flags_cross_duplicates_only(self, spark):
        from mofka_spark.operators.dedup import cross_corpus_dedup

        new, index = self._corpora(spark)
        out = {r["id"]: r for r in cross_corpus_dedup(new, index).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["is_dup"] and out[1]["dup_of"] == 10
        assert out[1]["jaccard"] == 1.0
        assert out[2]["is_dup"] and out[2]["dup_of"] == 10
        assert not out[3]["is_dup"] and out[3]["dup_of"] is None

    def test_id_collision_across_corpora_not_suppressed(self, spark):
        from mofka_spark.operators.dedup import cross_corpus_dedup

        # same id on both sides, same text: different documents in
        # different id spaces — the match must NOT be dropped as a
        # "self pair".
        index = spark.createDataFrame(
            [(1, self._BASE)], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(1, self._BASE)], "doc_id long, text string"
        )
        row = cross_corpus_dedup(new, index).first()
        assert row["is_dup"] and row["dup_of"] == 1

    def test_release_contract(self, spark):
        from mofka_spark.operators.dedup import cross_corpus_dedup

        new, index = self._corpora(spark)
        rel = []
        out = cross_corpus_dedup(new, index, release=rel)
        out.count()
        assert len(rel) == 1
        for frame in rel:
            frame.unpersist()

    def test_precomputed_index_bands_equivalent(self, spark):
        from mofka_spark.operators.dedup import (
            cross_corpus_dedup,
            minhash_band_rows,
        )

        new, index = self._corpora(spark)
        # production shape: the index's band rows are a materialized
        # table; only the new batch computes signatures.
        bands = minhash_band_rows(index, "doc_id", "text")
        got = sorted(
            (r["id"], r["is_dup"], r["dup_of"])
            for r in cross_corpus_dedup(new, index, index_bands=bands)
            .collect()
        )
        want = sorted(
            (r["id"], r["is_dup"], r["dup_of"])
            for r in cross_corpus_dedup(new, index).collect()
        )
        assert got == want


class TestHits:
    def test_hub_and_authority_structure(self, spark):
        from mofka_spark.operators.graph import hits

        # directory d points at p1..p3; everyone also points at p1
        edges = spark.createDataFrame(
            [("d", "p1"), ("d", "p2"), ("d", "p3"),
             ("x", "p1"), ("y", "p1")],
            "src string, dst string",
        )
        nodes = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        )
        got = {r["id"]: (r["hub"], r["authority"]) for r in
               hits(nodes, edges, iters=3).collect()}
        # d is the best hub; p1 the best authority; pure targets have
        # hub 0; pure sources have authority 0
        assert max(got, key=lambda k: got[k][0]) == "d"
        assert max(got, key=lambda k: got[k][1]) == "p1"
        for p in ("p1", "p2", "p3"):
            assert got[p][0] == 0.0
        for s in ("d", "x", "y"):
            assert got[s][1] == 0.0
        # L1 normalization: each score family sums to ~1
        assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-6
        assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-6

    def test_matches_pure_python_power_iteration(self, spark):
        from mofka_spark.operators.graph import hits

        E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (1, 3)]
        nodes_py = sorted({u for e in E for u in e})
        h = {v: 1.0 for v in nodes_py}
        a = {}
        for _ in range(3):
            a = {v: sum(h[u] for u, w in E if w == v) for v in nodes_py}
            t = sum(a.values()) or 1.0
            a = {v: x / t for v, x in a.items()}
            h = {u: sum(a[w] for uu, w in E if uu == u) for u in nodes_py}
            t = sum(h.values()) or 1.0
            h = {u: x / t for u, x in h.items()}
        edges = spark.createDataFrame(E, "src long, dst long")
        nodes = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        )
        got = {r["id"]: (r["hub"], r["authority"]) for r in
               hits(nodes, edges, iters=3).collect()}
        for v in nodes_py:
            assert abs(got[v][0] - round(h[v], 6)) < 1e-9, (v, got[v], h[v])
            assert abs(got[v][1] - round(a[v], 6)) < 1e-9, (v, got[v], a[v])

    def test_iters_validated(self, spark):
        # iters=0 previously crashed deep in the final join with an
        # obscure error; out-of-range iters risk float overflow -> NaN
        # normalization on power-law graphs (ADVICE r13)
        import pytest

        from mofka_spark.operators.graph import hits

        edges = spark.createDataFrame([(0, 1)], "src long, dst long")
        nodes = edges.select(F.col("src").alias("id"))
        for bad in (0, -1, 13):
            with pytest.raises(ValueError, match="iters"):
                hits(nodes, edges, iters=bad)

    def test_release_frees_edge_checkpoint(self, spark):
        # the release-list contract: after materializing the result,
        # releasing the appended frames leaves no persisted RDD behind
        # (long-lived sessions calling hits() repeatedly must not leak
        # one edge checkpoint per call)
        from mofka_spark.operators.graph import hits
        from mofka_spark.session import release_local_checkpoint

        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0)], "src long, dst long"
        )
        nodes = edges.select(F.col("src").alias("id")).distinct()
        before = len(spark.sparkContext._jsc.getPersistentRDDs())
        rel: list = []
        out = hits(nodes, edges, iters=2, release=rel)
        rows = out.collect()
        assert len(rows) == 3 and len(rel) == 1
        for fr in rel:
            release_local_checkpoint(fr)
        after = len(spark.sparkContext._jsc.getPersistentRDDs())
        assert after <= before
