"""ANN operator tests: multi-table LSH, fitted IVF, recall helper."""

import math
import random

import pytest
from pyspark.sql import functions as F

from mofka_spark.operators import similarity as S


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated clusters of 30 vectors each in 16-dim."""
    rng = random.Random(0)
    centers = [[10.0 * (i == c) for i in range(16)] for c in range(3)]
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(30):
            rows.append((vid, [x + rng.gauss(0, 0.5) for x in center], c))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


class TestLshTopk:
    def test_multi_table_recall_on_clusters(self, clustered):
        queries = clustered.filter(F.col("vec_id").isin(0, 30, 60))
        exact = S.brute_force_topk(queries, clustered, k=5)
        approx = S.lsh_topk(
            queries, clustered, k=5, dim=16, n_planes=4, n_tables=8
        )
        rec = {r.query_id: r.recall for r in S.topk_recall(approx, exact, 5).collect()}
        assert all(v >= 0.8 for v in rec.values()), rec

    def test_more_tables_never_lose_candidates(self, clustered):
        queries = clustered.filter(F.col("vec_id") == 0)
        one = S.lsh_topk(queries, clustered, k=50, dim=16, n_planes=6, n_tables=1)
        many = S.lsh_topk(queries, clustered, k=50, dim=16, n_planes=6, n_tables=6)
        n1 = {r.neighbor_id for r in one.collect()}
        n6 = {r.neighbor_id for r in many.collect()}
        assert n1 <= n6

    def test_deterministic(self, clustered):
        queries = clustered.filter(F.col("vec_id") == 0)
        a = S.lsh_topk(queries, clustered, k=5, dim=16, n_planes=4, n_tables=4).collect()
        b = S.lsh_topk(queries, clustered, k=5, dim=16, n_planes=4, n_tables=4).collect()
        assert a == b


class TestIvfTopk:
    def test_fitted_centroids_recover_clusters(self, clustered):
        cents = S.fit_centroids(clustered, n_centroids=3, sample_n=90, iters=5)
        # each fitted centroid should sit near one true cluster center
        # (max coordinate ~10 in its cluster dimension)
        dims = sorted(max(range(16), key=lambda i: c[i]) for c in cents)
        assert dims == [0, 1, 2]

    def test_ivf_recall_on_clusters(self, clustered):
        queries = clustered.filter(F.col("vec_id").isin(0, 30, 60))
        exact = S.brute_force_topk(queries, clustered, k=5)
        approx = S.ivf_topk(queries, clustered, k=5, n_centroids=3, nprobe=1)
        rec = {r.query_id: r.recall for r in S.topk_recall(approx, exact, 5).collect()}
        # nprobe=1 on cleanly-separated clusters: the right cell has
        # every true neighbor
        assert all(v == 1.0 for v in rec.values()), rec

    def test_centroid_reuse(self, clustered):
        cents = S.fit_centroids(clustered, n_centroids=3, sample_n=90)
        queries = clustered.filter(F.col("vec_id") == 0)
        a = S.ivf_topk(queries, clustered, k=3, centroids=cents).collect()
        b = S.ivf_topk(queries, clustered, k=3, centroids=cents).collect()
        assert a == b


class TestRecallHelper:
    def test_recall_math(self, spark):
        exact = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20), (2, 21)], ["query_id", "neighbor_id"]
        )
        approx = spark.createDataFrame(
            [(1, 10), (1, 99), (2, 20), (2, 21)], ["query_id", "neighbor_id"]
        )
        rec = {r.query_id: r.recall for r in S.topk_recall(approx, exact, 2).collect()}
        assert rec == {1: 0.5, 2: 1.0}

    def test_zero_hits(self, spark):
        exact = spark.createDataFrame([(1, 10)], ["query_id", "neighbor_id"])
        approx = spark.createDataFrame([(1, 99)], ["query_id", "neighbor_id"])
        rec = S.topk_recall(approx, exact, 1).collect()
        assert rec[0].recall == 0.0


class TestEmbeddingNeardupBlocking:
    def test_lsh_blocking_finds_clustered_neardups(self, clustered):
        # near-identical vectors share a sign bucket; cross-cluster
        # pairs never reach the comparison
        out = S.embedding_neardup_pairs(
            clustered, block_col=None, threshold=0.9, lsh_planes=2, dim=16
        )
        pairs = out.collect()
        assert len(pairs) > 0
        # verify correctness of scores against the unblocked exact form
        exact = {
            (r.id_a, r.id_b): r.cos_sim
            for r in S.embedding_neardup_pairs(clustered, threshold=0.9).collect()
        }
        for r in pairs:
            assert exact[(r.id_a, r.id_b)] == r.cos_sim

    def test_lsh_blocking_bounds_comparisons(self, clustered):
        blocked = S.embedding_neardup_pairs(
            clustered, threshold=-1.0, lsh_planes=2, dim=16
        ).count()
        unblocked = S.embedding_neardup_pairs(clustered, threshold=-1.0).count()
        assert blocked < unblocked  # cross-bucket pairs excluded


class TestSemanticDedup:
    def _corpus(self, spark, seed=3):
        """60 well-spread base vectors + near-copies of the first 10
        (the SemDeDup regime: tight duplicate pairs, tau >= 0.9)."""
        import random

        rng = random.Random(seed)
        rows = []
        base = []
        for i in range(60):
            v = [rng.gauss(0, 1) for _ in range(16)]
            base.append(v)
            rows.append((i, v))
        for j in range(10):  # ids 100+j duplicate j with tiny noise
            v = [x + rng.gauss(0, 0.01) for x in base[j]]
            rows.append((100 + j, v))
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_planted_duplicates_pruned_exactly(self, spark):
        from mofka_spark.operators import similarity as S

        emb = self._corpus(spark)
        out = {r.id: r.keep for r in S.semantic_dedup(
            emb, tau=0.9, n_clusters=8, nprobe=2
        ).collect()}
        # exact keep set by brute force
        exact_pairs = {
            (r.id_a, r.id_b)
            for r in S.embedding_neardup_pairs(emb, threshold=0.9).collect()
        }
        exact_dropped = {b for _, b in exact_pairs}
        assert len(out) == 70
        for vid, keep in out.items():
            assert keep == (vid not in exact_dropped), vid
        # every planted copy dropped, every original kept
        assert all(not out[100 + j] for j in range(10))
        assert all(out[j] for j in range(60))

    def test_keep_is_single_hop_min_id(self, spark):
        from mofka_spark.operators import similarity as S

        # chain a~b~c where a<b<c: b and c both have a smaller tau-
        # neighbor, so only a survives (single-hop, no cascade logic)
        v = [1.0] + [0.0] * 15
        rows = [(1, v), (2, v), (3, v), (4, [0.0, 1.0] + [0.0] * 14)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {r.id: r.keep for r in S.semantic_dedup(
            emb, tau=0.99, n_clusters=2, nprobe=2
        ).collect()}
        assert out == {1: True, 2: False, 3: False, 4: True}


class TestEmbeddingDimStats:
    def test_collapsed_detection(self, spark):
        from mofka_spark.operators.similarity import embedding_dim_stats

        rows = [([1.0, 5.0, -2.0],), ([3.0, 5.0, 2.0],), ([5.0, 5.0, 0.0],)]
        df = spark.createDataFrame(rows, ["embedding"])
        out = {r.dim: r for r in embedding_dim_stats(df).collect()}
        assert out[0].mean == 3.0 and out[0].std == 2.0
        assert out[1].collapsed and not out[0].collapsed
        assert out[2].min_val == -2.0 and out[2].max_val == 2.0

    def test_null_vectors_skipped(self, spark):
        from mofka_spark.operators.similarity import embedding_dim_stats

        rows = [([1.0, 2.0],), (None,)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = embedding_dim_stats(df).collect()
        assert len(out) == 2


class TestPcaPower:
    def test_dominant_axis_recovered(self, spark):
        from mofka_spark.operators.similarity import pca_power

        # variance lives on dim 0; dims 1-2 are constant
        rows = [(i, [float(i), 1.0, 2.0]) for i in range(-5, 6)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = {r.vec_id: r.pc1 for r in pca_power(df).collect()}
        # projections are the centered dim-0 values (up to global sign)
        sign = 1.0 if out[5] > 0 else -1.0
        for i in range(-5, 6):
            assert abs(sign * out[i] - float(i)) < 1e-4
        # symmetric inputs -> antisymmetric projections
        assert abs(out[3] + out[-3]) < 1e-6

    def test_deterministic_across_runs(self, spark):
        from mofka_spark.operators.similarity import pca_power

        rows = [
            (i, [float((i * 7) % 5), float((i * 3) % 4), float(i % 3)])
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        a = sorted((r.vec_id, r.pc1) for r in pca_power(df).collect())
        b = sorted((r.vec_id, r.pc1) for r in pca_power(df).collect())
        assert a == b

    def test_centered_projections_sum_to_zero(self, spark):
        from mofka_spark.operators.similarity import pca_power

        rows = [(i, [float(i), float(i * i % 7)]) for i in range(9)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        total = sum(r.pc1 for r in pca_power(df).collect())
        assert abs(total) < 1e-3


class TestLabelSeparation:
    def test_nearest_and_norms(self, spark):
        from mofka_spark.operators.similarity import label_separation

        rows = (
            [(0, [0.0, 0.0]), (0, [0.0, 2.0])]       # centroid (0, 1)
            + [(1, [10.0, 1.0])]                      # centroid (10, 1)
            + [(2, [0.0, 4.0]), (2, [0.0, 6.0])]      # centroid (0, 5)
        )
        df = spark.createDataFrame(rows, ["label", "embedding"])
        out = {r.label: r for r in label_separation(df).collect()}
        assert out[0].n_vecs == 2 and out[0].centroid_norm == 1.0
        # label 0 is 4 away from label 2, ~10 from label 1
        assert out[0].nearest_label == 2 and out[0].nearest_dist == 4.0
        assert out[2].nearest_label == 0
        # label 1 centroid (10,1) vs label 0 centroid (0,1): dist 10;
        # vs label 2 (0,5): sqrt(116) > 10 -> nearest is label 0
        assert out[1].nearest_label == 0 and out[1].nearest_dist == 10.0

    def test_collapsed_class_flagged_by_zero_norm(self, spark):
        from mofka_spark.operators.similarity import label_separation

        rows = [(0, [1.0, -1.0]), (0, [-1.0, 1.0]), (1, [3.0, 3.0])]
        df = spark.createDataFrame(rows, ["label", "embedding"])
        out = {r.label: r for r in label_separation(df).collect()}
        assert out[0].centroid_norm == 0.0  # averaged away to origin
        assert out[1].centroid_norm > 0


class TestLabelAgreement:
    def test_planted_mislabel_scores_low(self, spark):
        from mofka_spark.operators.similarity import label_agreement

        # two tight clusters in 2-D; vec 99 sits in cluster A but
        # carries cluster B's label -> agreement 0; everyone else 1
        rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)]
        rows += [(10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(5)]
        rows.append((99, [1.0, 0.005], 1))  # mislabeled A-cluster point
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r.id: r.agreement for r in label_agreement(df, k=4).collect()}
        assert out[99] == 0.0
        assert all(v == 1.0 for i, v in out.items() if i in range(5))

    def test_null_embedding_excluded_not_crashing(self, spark):
        # a NULL vector used to crash the Arrow matmul kernel with a
        # ragged-ndarray error; it must be dropped on both sides like
        # the expr path drops it (NULL score never ranks)
        from mofka_spark.operators.similarity import (
            brute_force_topk,
            label_agreement,
        )

        rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(4)]
        rows += [(10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(4)]
        rows.append((99, None, 0))  # NULL embedding
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r.id: r.agreement for r in label_agreement(df, k=3).collect()}
        assert 99 not in out
        assert all(v == 1.0 for v in out.values())
        for method in ("expr", "arrow"):
            nbrs = brute_force_topk(df, df, k=3, method=method)
            ids = {r.query_id for r in nbrs.collect()} | {
                r.neighbor_id for r in nbrs.collect()
            }
            assert 99 not in ids

    def test_external_neighbors_frame(self, spark):
        from mofka_spark.operators.similarity import label_agreement

        df = spark.createDataFrame(
            [(1, [1.0], 0), (2, [1.0], 0), (3, [1.0], 1)],
            "vec_id long, embedding array<double>, label int",
        )
        nbrs = spark.createDataFrame(
            [(1, 2), (1, 3)], "query_id long, neighbor_id long"
        )
        (row,) = label_agreement(df, neighbors=nbrs).filter("id = 1").collect()
        assert row.n_neighbors == 2 and row.agreement == 0.5


class TestHardNegatives:
    def _emb(self, spark):
        return spark.createDataFrame(
            [
                (1, [1.0, 0.0], 0),
                (2, [0.99, 0.14], 1),   # very close, other label
                (3, [0.0, 1.0], 1),     # far, other label
                (4, [1.0, 0.01], 0),    # close but SAME label
            ],
            "vec_id long, embedding array<double>, label int",
        )

    def test_label_filter_before_topk(self, spark):
        from mofka_spark.operators.similarity import hard_negatives

        emb = self._emb(spark)
        out = hard_negatives(emb, emb.filter("vec_id = 1"), k=1).collect()
        (row,) = out
        # nearest overall is 4 (same label) — must be skipped for 2
        assert row.negative_id == 2 and row.negative_label == 1

    def test_k_and_rank_order(self, spark):
        from mofka_spark.operators.similarity import hard_negatives

        emb = self._emb(spark)
        rows = hard_negatives(emb, emb.filter("vec_id = 1"), k=2).collect()
        assert [r.negative_id for r in sorted(rows, key=lambda r: r.rank)] == [2, 3]

    def test_anchors_default_to_corpus(self, spark):
        from mofka_spark.operators.similarity import hard_negatives

        emb = self._emb(spark)
        out = hard_negatives(emb, k=10)
        assert out.select("anchor_id").distinct().count() == 4


class TestRandomProjection:
    def test_deterministic_and_shaped(self, spark):
        from mofka_spark.operators.similarity import random_projection

        df = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]), (2, [0.0, 2.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        a = {r.id: r.proj for r in random_projection(df, 3, 4).collect()}
        b = {r.id: r.proj for r in random_projection(df, 3, 4).collect()}
        assert a == b and all(len(v) == 4 for v in a.values())
        # a different seed gives a different matrix
        c = {r.id: r.proj for r in random_projection(df, 3, 4, seed=9).collect()}
        assert c != a

    def test_distance_preservation_statistical(self, spark):
        """JL: squared distances contract by ~1 in expectation. With
        k=16 the ratio is within [0.2, 3] with overwhelming margin for
        a fixed seed over fixed vectors (deterministic check)."""
        import random as pyrandom

        from mofka_spark.operators.similarity import random_projection

        rng = pyrandom.Random(3)
        rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        proj = {r.id: r.proj for r in random_projection(df, 32, 16).collect()}

        def d2(u, v):
            return sum((x - y) ** 2 for x, y in zip(u, v))

        orig = {r[0]: r[1] for r in rows}
        for i in range(0, 9):
            a, b = d2(orig[i], orig[i + 1]), d2(proj[i], proj[i + 1])
            assert 0.2 < b / a < 3.0

    def test_single_scan_no_shuffle(self, spark):
        from mofka_spark.operators.similarity import random_projection

        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        plan = (
            random_projection(df, 2, 2)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestQuantizeEmbeddings:
    def test_roundtrip_and_range(self, spark):
        from mofka_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [
                (1, [1.0, -0.5, 0.0]),
                (2, [0.5, 0.25, 0.0]),
                (3, [-1.0, 0.5, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        out = {r.id: r for r in quantize_embeddings(df).collect()}
        # max-abs dims quantize to +-127 exactly
        assert out[1].q[0] == 127 and out[3].q[0] == -127
        assert out[1].q[1] == -127  # -0.5 is dim-1 max abs
        # zero-variance dim: scale 1 -> q = 0
        assert all(out[i].q[2] == 0 for i in (1, 2, 3))
        assert all(-127 <= v <= 127 for r in out.values() for v in r.q)
        # exact representable values reconstruct with ~zero error
        assert out[1].mse < 1e-6

    def test_scales_broadcast_not_corpus_shuffle(self, spark):
        from mofka_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(50)],
            "vec_id long, embedding array<double>",
        )
        plan = (
            quantize_embeddings(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


class TestBruteForceArrowPath:
    def test_arrow_equals_expr(self, spark):
        import random as pyrandom

        from mofka_spark.operators.similarity import brute_force_topk

        rng = pyrandom.Random(5)
        rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        expr = brute_force_topk(df, df, k=5).collect()
        arrow = brute_force_topk(df, df, k=5, method="arrow").collect()
        key = lambda r: (r.query_id, r.rank)
        assert sorted(map(tuple, expr), key=lambda t: (t[0], t[3])) == sorted(
            map(tuple, arrow), key=lambda t: (t[0], t[3])
        )

    def test_no_self_pairs_and_k_rows(self, spark):
        from mofka_spark.operators.similarity import brute_force_topk

        df = spark.createDataFrame(
            [(i, [float(i), 1.0]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        out = brute_force_topk(df, df, k=3, method="arrow").collect()
        assert all(r.query_id != r.neighbor_id for r in out)
        assert len(out) == 30


class TestBruteForceArrowEdgeCases:
    def test_zero_vector_excluded_like_expr(self, spark):
        from mofka_spark.operators.similarity import brute_force_topk

        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0]),
                (2, [0.0, 0.0]),        # zero vector
                (3, [-1.0, 0.0]),       # negative cosine vs 1
            ],
            "vec_id long, embedding array<double>",
        )
        q = df.filter("vec_id = 1")
        expr = brute_force_topk(q, df, k=3).collect()
        arrow = brute_force_topk(q, df, k=3, method="arrow").collect()
        assert sorted(map(tuple, expr)) == sorted(map(tuple, arrow))
        # zero vector must appear in NEITHER (NULL score in expr path)
        assert all(r.neighbor_id != 2 for r in arrow)

    def test_empty_query_side_returns_empty(self, spark):
        from mofka_spark.operators.similarity import brute_force_topk

        df = spark.createDataFrame(
            [(1, [1.0])], "vec_id long, embedding array<double>"
        )
        out = brute_force_topk(
            df.filter("vec_id < 0"), df, k=3, method="arrow"
        )
        assert out.count() == 0
        assert out.columns == ["query_id", "neighbor_id", "score", "rank"]

    def test_label_agreement_all_null_labels(self, spark):
        from mofka_spark.operators.similarity import label_agreement

        df = spark.createDataFrame(
            [(1, [1.0], None), (2, [0.5], None)],
            "vec_id long, embedding array<double>, label int",
        )
        assert label_agreement(df).count() == 0


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        import math

        from mofka_spark.operators.similarity import ranking_metrics

        labels = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1), (4, 0), (5, 1)], ["vec_id", "label"]
        )
        # query 1 (label 0): ranked 3(no), 2(yes), 4(yes)
        ranked = spark.createDataFrame(
            [(1, 3, 1), (1, 2, 2), (1, 4, 3)],
            ["query_id", "neighbor_id", "rank"],
        )
        (row,) = ranking_metrics(ranked, labels, k=3).collect()
        assert row.precision_at_k == round(2 / 3, 6)
        assert row.mrr == 0.5
        dcg = 1 / math.log2(3) + 1 / math.log2(4)
        idcg = 1 / math.log2(2) + 1 / math.log2(3)  # R=2 relevant
        assert row.ndcg == round(dcg / idcg, 6)

    def test_no_relevant_and_singleton_label(self, spark):
        from mofka_spark.operators.similarity import ranking_metrics

        labels = spark.createDataFrame(
            [(1, 7), (2, 0), (3, 0)], ["vec_id", "label"]
        )
        ranked = spark.createDataFrame(
            [(1, 2, 1), (1, 3, 2)], ["query_id", "neighbor_id", "rank"]
        )
        (row,) = ranking_metrics(ranked, labels, k=2).collect()
        assert row.precision_at_k == 0.0 and row.mrr == 0.0
        assert row.ndcg == 0.0  # singleton label: no achievable ideal

    def test_perfect_ranking_is_one(self, spark):
        from mofka_spark.operators.similarity import ranking_metrics

        labels = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 0), (4, 1)], ["vec_id", "label"]
        )
        ranked = spark.createDataFrame(
            [(1, 2, 1), (1, 3, 2), (1, 4, 3)],
            ["query_id", "neighbor_id", "rank"],
        )
        (row,) = ranking_metrics(ranked, labels, k=3).collect()
        # R=2 relevant, both in the first two slots -> ideal
        assert row.ndcg == 1.0 and row.mrr == 1.0


class TestEmbeddingOutliers:
    def test_planted_outlier_flagged(self, spark):
        from mofka_spark.operators.similarity import embedding_outliers

        # tight cluster at (1, 0) with one far-away point
        rows = [(i, [1.0 + 0.001 * i, 0.0], 0) for i in range(20)]
        rows.append((100, [50.0, 50.0], 0))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r.id: r for r in embedding_outliers(df).collect()}
        assert out[100].is_outlier
        assert sum(1 for r in out.values() if r.is_outlier) == 1
        assert not out[0].is_outlier

    def test_degenerate_class_no_nulls(self, spark):
        from mofka_spark.operators.similarity import embedding_outliers

        df = spark.createDataFrame(
            [(1, [1.0], 0), (2, [2.0], None)],
            "vec_id long, embedding array<double>, label int",
        )
        out = embedding_outliers(df).collect()
        assert len(out) == 1  # null label excluded
        assert out[0].z == 0.0 and not out[0].is_outlier


class TestRankingMetricsNullLabels:
    def test_null_neighbor_label_is_not_relevant(self, spark):
        from mofka_spark.operators.similarity import ranking_metrics

        labels = spark.createDataFrame(
            [(1, 0), (2, None), (3, 0)],
            "vec_id long, label int",
        )
        ranked = spark.createDataFrame(
            [(1, 2, 1), (1, 3, 2)], ["query_id", "neighbor_id", "rank"]
        )
        (row,) = ranking_metrics(ranked, labels, k=2).collect()
        # neighbor 2 (NULL label) counts as not-relevant, not NULL
        assert row.precision_at_k == 0.5
        assert row.mrr == 0.5
        assert row.ndcg is not None and row.ndcg > 0


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        from mofka_spark.operators.similarity import rrf_fuse

        a = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2)], ["query_id", "neighbor_id", "rank"]
        )
        b = spark.createDataFrame(
            [(1, 11, 1), (1, 12, 2)], ["query_id", "neighbor_id", "rank"]
        )
        out = {r.neighbor_id: r for r in rrf_fuse([a, b], k=60).collect()}
        # 11 appears in both lists -> highest fused score
        assert out[11].fused_rank == 1
        assert out[11].rrf_score == round(1 / 61 + 1 / 62, 6)
        assert out[10].rrf_score == round(1 / 61, 6)
        assert out[12].rrf_score == round(1 / 62, 6)
        # tie between 10 (rank1 in a) and 12? no - 1/61 > 1/62
        assert out[10].fused_rank == 2 and out[12].fused_rank == 3

    def test_top_and_single_list(self, spark):
        from mofka_spark.operators.similarity import rrf_fuse

        a = spark.createDataFrame(
            [(1, i, i) for i in range(1, 6)],
            ["query_id", "neighbor_id", "rank"],
        )
        out = rrf_fuse([a], top=2).collect()
        assert len(out) == 2
        assert [r.neighbor_id for r in sorted(out, key=lambda r: r.fused_rank)] == [1, 2]

    def test_empty_list_raises(self, spark):
        import pytest

        from mofka_spark.operators.similarity import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([])


class TestKmeansFull:
    def test_separates_planted_clusters(self, spark):
        from mofka_spark.operators.similarity import (
            kmeans_cells,
            kmeans_fit_full,
        )

        rows = [(i, [10.0 + 0.1 * i, 0.0]) for i in range(5)]
        rows += [(10 + i, [0.0, 10.0 + 0.1 * i]) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_fit_full(df, k=2, iters=3)
        out = {r.vec_id: r.cell for r in kmeans_cells(df, cents).collect()}
        a = {out[i] for i in range(5)}
        b = {out[10 + i] for i in range(5)}
        assert len(a) == 1 and len(b) == 1 and a != b
        # centroids converge to the cluster means
        import math

        means = sorted([10.2, 0.0])
        got0 = sorted(cents[0])
        assert math.isclose(got0[0], 0.0, abs_tol=1e-9)
        assert math.isclose(got0[1], means[1] if means[1] else 10.2, rel_tol=1e-9)

    def test_ordered_method_partitioning_invariant(self, spark):
        # method="ordered" (the gate path) must produce bit-identical
        # centroids regardless of how the corpus is partitioned — the
        # float-identity property plain AVG cannot give (partial-agg
        # association order varies under repartition/AQE).
        import random

        from mofka_spark.operators.similarity import kmeans_fit_full

        rng = random.Random(11)
        rows = [
            (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        fits = [
            kmeans_fit_full(
                df.repartition(p, "vec_id"), k=3, iters=2, method="ordered"
            )
            for p in (1, 7, 32)
        ]
        assert fits[0] == fits[1] == fits[2]
        # and the scale path agrees to float tolerance (same model,
        # different summation order)
        sums = kmeans_fit_full(df, k=3, iters=2, method="sums")
        for ca, cb in zip(fits[0], sums):
            for a, b in zip(ca, cb):
                assert abs(a - b) < 1e-9

    def test_unknown_method_rejected(self, spark):
        import pytest as _pytest

        from mofka_spark.operators.similarity import kmeans_fit_full

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="method"):
            kmeans_fit_full(df, k=1, iters=1, method="bogus")

    def test_cell_sizes_attached(self, spark):
        from mofka_spark.operators.similarity import (
            kmeans_cells,
            kmeans_fit_full,
        )

        rows = [(i, [float(i % 2) * 10.0, 1.0]) for i in range(6)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = kmeans_fit_full(df, k=2, iters=2)
        out = kmeans_cells(df, cents).collect()
        assert all(r.n_cell == 3 for r in out)

    def test_empty_cell_keeps_previous_centroid(self, spark):
        from mofka_spark.operators.similarity import kmeans_fit_full

        # 4 identical points, k=3 -> two cells go empty after round 1;
        # their centroids must stay at the init vectors, not NaN out
        df = spark.createDataFrame(
            [(i, [5.0, 5.0]) for i in range(4)],
            "vec_id long, embedding array<double>",
        )
        cents = kmeans_fit_full(df, k=3, iters=2)
        assert len(cents) == 3
        assert all(all(v == 5.0 for v in c) for c in cents)

    def test_null_vectors_excluded(self, spark):
        from mofka_spark.operators.similarity import (
            kmeans_cells,
            kmeans_fit_full,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.9, 0.0]), (3, None), (4, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        cents = kmeans_fit_full(df, k=2, iters=2)
        out = kmeans_cells(df, cents).collect()
        assert {r.vec_id for r in out} == {1, 2, 4}

    def test_deterministic_across_runs(self, spark):
        from mofka_spark.operators.similarity import kmeans_fit_full

        rows = [(i, [float((i * 37) % 11), float((i * 53) % 7)]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        c1 = kmeans_fit_full(df, k=4, iters=3)
        c2 = kmeans_fit_full(df, k=4, iters=3)
        assert c1 == c2

    def test_assignment_plan_is_scan_local(self, spark):
        from mofka_spark import plans
        from mofka_spark.operators.similarity import kmeans_cells

        df = spark.createDataFrame(
            [(i, [float(i), 0.0]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        p = plans.plan_string(kmeans_cells(df, [[0.0, 0.0], [10.0, 0.0]]))
        # centroids are literals: the only join is the k-row size
        # broadcast; assignment itself never joins or shuffles vectors
        assert "SortMergeJoin" not in p
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


class TestLabelPropagation:
    def test_seeds_spread_across_clusters(self, spark):
        from mofka_spark.operators.similarity import label_propagation

        # two tight clusters; one seed each; everyone inherits their
        # cluster's seed label within 2 rounds
        rows = [(i, [1.0 + 0.01 * i, 0.0], 0 if i == 0 else None) for i in range(5)]
        rows += [
            (10 + i, [0.0, 1.0 + 0.01 * i], 7 if i == 0 else None)
            for i in range(5)
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r.id: (r.label, r.is_seed) for r in label_propagation(df, k=3).collect()}
        assert out[0] == (0, True) and out[10] == (7, True)
        for i in range(1, 5):
            assert out[i] == (0, False)
        for i in range(11, 15):
            assert out[10 + (i - 10)][0] == 7

    def test_seed_clamped_against_majority(self, spark):
        from mofka_spark.operators.similarity import label_propagation

        # seed 99 sits inside the 0-labeled cluster but keeps label 1
        rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(4)]
        rows.append((99, [1.0, 0.005], 1))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        out = {r.id: r.label for r in label_propagation(df, k=3).collect()}
        assert out[99] == 1

    def test_vote_tie_takes_smaller_label(self, spark):
        from mofka_spark.operators.similarity import label_propagation

        nbrs = spark.createDataFrame(
            [(3, 1), (3, 2)], "query_id long, neighbor_id long"
        )
        df = spark.createDataFrame(
            [(1, [1.0], 5), (2, [1.0], 2), (3, [1.0], None)],
            "vec_id long, embedding array<double>, label int",
        )
        out = {
            r.id: r.label
            for r in label_propagation(df, neighbors=nbrs, iters=1).collect()
        }
        assert out[3] == 2  # one vote each for 2 and 5 -> smaller wins

    def test_unreachable_stays_null_then_second_hop_reaches(self, spark):
        from mofka_spark.operators.similarity import label_propagation

        # chain seed(1) -> 2 -> 3 with directed edges: one round labels
        # 2 only; two rounds reach 3 through 2's new label
        nbrs = spark.createDataFrame(
            [(2, 1), (3, 2)], "query_id long, neighbor_id long"
        )
        df = spark.createDataFrame(
            [(1, [1.0], 4), (2, [1.0], None), (3, [1.0], None)],
            "vec_id long, embedding array<double>, label int",
        )
        one = {
            r.id: r.label
            for r in label_propagation(df, neighbors=nbrs, iters=1).collect()
        }
        assert one == {1: 4, 2: 4, 3: None}
        two = {
            r.id: r.label
            for r in label_propagation(df, neighbors=nbrs, iters=2).collect()
        }
        assert two == {1: 4, 2: 4, 3: 4}


class TestKcenterSelect:
    def test_picks_cover_clusters_first(self, spark):
        from mofka_spark.operators.similarity import kcenter_select

        # 3 tight clusters: the first 3 picks must hit 3 DIFFERENT
        # clusters (diversity-first, unlike uniform sampling)
        rows = []
        vid = 0
        for c in range(3):
            for i in range(10):
                rows.append((vid, [10.0 * (d == c) + 0.01 * i for d in range(3)]))
                vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        picks = kcenter_select(df, k=3).collect()
        clusters = {r.id // 10 for r in picks}
        assert len(clusters) == 3
        # radii non-increasing after the seed
        radii = [r.radius for r in sorted(picks, key=lambda r: r.pick_order)]
        assert radii[0] is None
        assert radii[1] >= radii[2]

    def test_seed_is_smallest_id_and_deterministic(self, spark):
        from mofka_spark.operators.similarity import kcenter_select

        df = spark.createDataFrame(
            [(7, [1.0]), (3, [5.0]), (9, [9.0])],
            "vec_id long, embedding array<double>",
        )
        a = kcenter_select(df, k=3).collect()
        b = kcenter_select(df, k=3).collect()
        assert a == b
        ordered = sorted(a, key=lambda r: r.pick_order)
        assert ordered[0].id == 3 and ordered[0].radius is None
        # farthest from 5.0 is 9.0 (dist 16) over 1.0 (dist 16)... tie
        # breaks to the smaller id 7 (dist (5-1)^2=16 == (9-5)^2=16)
        assert ordered[1].id == 7 and ordered[1].radius == 16.0
        assert ordered[2].id == 9

    def test_k_larger_than_corpus(self, spark):
        from mofka_spark.operators.similarity import kcenter_select

        df = spark.createDataFrame(
            [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<double>"
        )
        out = kcenter_select(df, k=10).collect()
        assert len(out) == 2

    def test_empty_and_null_vectors(self, spark):
        from mofka_spark.operators.similarity import kcenter_select

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        assert kcenter_select(empty, k=3).count() == 0
        df = spark.createDataFrame(
            [(1, None), (2, [1.0]), (3, [9.0])],
            "vec_id long, embedding array<double>",
        )
        out = {r.id for r in kcenter_select(df, k=3).collect()}
        assert out == {2, 3}


class TestKmeansEmptyEdges:
    def test_empty_corpus_fit_and_assign(self, spark):
        from mofka_spark.operators.similarity import (
            kmeans_cells,
            kmeans_fit_full,
        )

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        cents = kmeans_fit_full(empty, k=3, iters=2)
        assert cents == []
        out = kmeans_cells(empty, cents)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "vec_id", "cell", "n_cell",
        ]


class TestKmeansSilhouette:
    def test_well_separated_clusters_score_high(self, spark):
        from mofka_spark.operators.similarity import kmeans_silhouette

        rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(3)] + [
            (10 + i, [100.0 + i * 0.01, 0.0]) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = [[0.01, 0.0], [100.01, 0.0]]
        out = {r["vec_id"]: r for r in kmeans_silhouette(df, cents).collect()}
        assert all(out[i]["cell"] == 0 for i in range(3))
        assert all(out[10 + i]["cell"] == 1 for i in range(3))
        assert all(r["silhouette"] > 0.99 for r in out.values())

    def test_point_on_both_centroids_scores_zero(self, spark):
        from mofka_spark.operators.similarity import kmeans_silhouette

        df = spark.createDataFrame(
            [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
        )
        row = kmeans_silhouette(df, [[1.0, 1.0], [1.0, 1.0]]).first()
        assert row["silhouette"] == 0.0 and row["own_dist"] == 0.0

    def test_boundary_point_near_zero_and_tie_to_lower_cell(self, spark):
        from mofka_spark.operators.similarity import kmeans_silhouette

        df = spark.createDataFrame(
            [(1, [5.0, 0.0])], "vec_id long, embedding array<double>"
        )
        row = kmeans_silhouette(df, [[0.0, 0.0], [10.0, 0.0]]).first()
        assert row["cell"] == 0  # equidistant: lower cell wins
        assert row["silhouette"] == 0.0

    def test_null_vectors_excluded_and_k1_rejected(self, spark):
        from mofka_spark.operators.similarity import kmeans_silhouette
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, [1.0]), (2, None)], "vec_id long, embedding array<double>"
        )
        assert kmeans_silhouette(df, [[0.0], [9.0]]).count() == 1
        with _pytest.raises(ValueError):
            kmeans_silhouette(df, [[0.0]])


class TestProductQuantization:
    def _corpus(self, spark):
        # two tight 4-d clusters; PQ with m=2 must separate them
        rows = [(i, [10.0 + 0.01 * i, 10.0, 0.0, 0.0]) for i in range(5)]
        rows += [(10 + i, [0.0, 0.0, 7.0 + 0.01 * i, 7.0]) for i in range(5)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_train_encode_roundtrip_separates_clusters(self, spark):
        from mofka_spark.operators.similarity import pq_encode, pq_train

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        assert len(books) == 2 and all(len(b) == 2 for b in books)
        codes = {r["id"]: tuple(r["codes"]) for r in
                 pq_encode(df, books).collect()}
        left = {codes[i] for i in range(5)}
        right = {codes[10 + i] for i in range(5)}
        assert len(left) == 1 and len(right) == 1 and left != right

    def test_adc_topk_prefers_same_cluster(self, spark):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_topk, pq_train,
        )

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        codes = pq_encode(df, books)
        out = pq_topk(df.filter("vec_id = 0"), codes, books, k=4)
        neigh = [r["neighbor_id"] for r in out.collect()]
        assert set(neigh) == {1, 2, 3, 4}  # own cluster, never the other

    def test_dim_not_divisible_rejected(self, spark):
        from mofka_spark.operators.similarity import pq_train
        import pytest as _pytest

        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError):
            pq_train(df, m=2, k=1)

    def test_empty_corpus_and_empty_queries(self, spark):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_topk, pq_train,
        )

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        assert pq_train(empty) == []
        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=1)
        codes = pq_encode(df, books)
        assert pq_topk(empty, codes, books).count() == 0

    def test_string_ids_supported(self, spark):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_topk, pq_train,
        )

        rows = [(f"d{i}", [float(i), 0.0]) for i in range(6)]
        df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
        books = pq_train(df, m=2, k=2, iters=1)
        codes = pq_encode(df, books)
        out = pq_topk(df.filter("vec_id = 'd0'"), codes, books, k=2)
        assert out.count() == 2
        assert out.first()["query_id"] == "d0"

    def test_ivfpq_full_probe_matches_pq_topk(self, spark):
        from mofka_spark.operators.similarity import (
            ivfpq_topk, pq_encode, pq_topk, pq_train,
        )

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        cents = [[10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 7.0, 7.0]]
        codes = pq_encode(df, books, coarse_centroids=cents)
        q = df.filter("vec_id = 0")
        # probing every cell must reproduce the unpruned ADC ranking
        full = sorted(
            (r["neighbor_id"], r["distance"], r["rank"])
            for r in ivfpq_topk(q, codes, books, cents, k=4, nprobe=2)
            .collect()
        )
        ref = sorted(
            (r["neighbor_id"], r["distance"], r["rank"])
            for r in pq_topk(q, codes.drop("cell"), books, k=4).collect()
        )
        assert full == ref

    def test_ivfpq_prunes_to_probed_cells(self, spark):
        from mofka_spark.operators.similarity import (
            ivfpq_topk, pq_encode, pq_train,
        )

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        cents = [[10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 7.0, 7.0]]
        codes = pq_encode(df, books, coarse_centroids=cents)
        out = ivfpq_topk(
            df.filter("vec_id = 0"), codes, books, cents, k=9, nprobe=1
        ).collect()
        # nprobe=1 from a cluster-0 query: only cluster-0 members rank
        assert {r["neighbor_id"] for r in out} == {1, 2, 3, 4}

    def test_pq_code_table_matches_in_memory_and_prunes(
        self, spark, tmp_path
    ):
        # The batch code-table path: write_pq_codes partitions by cell,
        # search_pq_codes must (a) reproduce in-memory ivfpq_topk
        # bit-for-bit and (b) turn the probe set into a directory-level
        # partition prune (same evidence bar as the streaming ANN
        # store's test_probe_prunes_directories).
        from mofka_spark import plans
        from mofka_spark.operators.similarity import (
            ivfpq_topk, pq_encode, pq_train, search_pq_codes,
            write_pq_codes,
        )

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        cents = [[10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 7.0, 7.0]]
        codes = pq_encode(df, books, coarse_centroids=cents)
        path = str(tmp_path / "pqcodes")
        write_pq_codes(codes, path)
        q = df.filter("vec_id = 0")
        out = search_pq_codes(
            spark, path, q, books, cents, k=4, nprobe=1
        )
        mem = ivfpq_topk(q, codes, books, cents, k=4, nprobe=1)
        assert {tuple(r) for r in out.collect()} == {
            tuple(r) for r in mem.collect()
        }
        p = plans.plan_string(out)
        assert "PartitionFilters" in p and "cell" in p

    def test_pq_code_table_requires_cell(self, spark, tmp_path):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_train, write_pq_codes,
        )
        import pytest as _pytest

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=1)
        with _pytest.raises(ValueError):
            write_pq_codes(pq_encode(df, books), str(tmp_path / "x"))

    def test_ivfpq_validation(self, spark):
        from mofka_spark.operators.similarity import (
            ivfpq_topk, pq_encode, pq_train,
        )
        import pytest as _pytest

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=1)
        cents = [[10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 7.0, 7.0]]
        codes = pq_encode(df, books, coarse_centroids=cents)
        with _pytest.raises(ValueError):
            ivfpq_topk(df, codes, books, cents, nprobe=0)
        with _pytest.raises(ValueError):
            ivfpq_topk(df, codes, [], cents)

    def test_rerank_fixes_adc_ordering(self, spark):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_rerank, pq_train,
        )

        # corpus where quantization collapses fine distances: rerank
        # must order by TRUE L2 within the shortlist.
        rows = [(i, [float(i), 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = pq_train(df, m=2, k=2, iters=2)
        codes = pq_encode(df, books)
        out = pq_rerank(
            df.filter("vec_id = 0"), codes, books, df, k=3, shortlist=9
        ).collect()
        by_rank = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert by_rank == [1, 2, 3]  # exact order, not code order
        # distances are the exact squared L2
        assert [r["distance"] for r in sorted(out, key=lambda r: r["rank"])] == [1.0, 4.0, 9.0]

    def test_rerank_within_shortlist_only(self, spark):
        from mofka_spark.operators.similarity import (
            pq_encode, pq_rerank, pq_train,
        )

        df = self._corpus(spark)
        books = pq_train(df, m=2, k=2, iters=2)
        codes = pq_encode(df, books)
        out = pq_rerank(
            df.filter("vec_id = 0"), codes, books, df, k=4, shortlist=4
        )
        assert out.count() == 4
