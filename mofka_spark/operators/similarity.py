"""Similarity search over embedding columns (array<float>).

- cosine/dot kernels as pure Column expressions (zip_with + aggregate)
  — JVM-side, no UDF, no data movement beyond the join itself.
- brute_force_topk: exact top-k neighbors. The baseline; at scale the
  quadratic join is the cost, so it exposes a `candidate_filter` for
  blocking.
- lsh_topk: random-hyperplane (sign) LSH bucketing as the scale path:
  only vectors sharing a bucket are compared. Hyperplanes are generated
  from a seeded RNG driver-side (deterministic), shipped as literals.
- ivf_topk: inverted-file variant — assign each vector to its nearest
  of k seeded centroids (one pass), probe nearest `nprobe` centroids.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    method: str = "expr",
) -> DataFrame:
    """Exact top-k: broadcast the (small) query side against the corpus,
    window-rank per query. Returns (query_id, neighbor_id, score, rank).

    Scale shape: corpus stays partitioned; queries broadcast (must fit
    in memory — the usual ANN-query regime). Score ties break on
    neighbor id so results are deterministic across engines.

    ``method="arrow"`` swaps the per-pair Column fold (a
    BroadcastNestedLoopJoin evaluating an interpreted O(d) lambda per
    pair) for one numpy matmul per Arrow batch that keeps only each
    batch's per-query top-k (plus a 2e-6 score slack so rows that
    could ROUND into a tie with the k-th are never cut early — the
    final rounded-score ranking stays exactly the expr path's). The
    shuffle then carries ~queries x k x n_batches thin rows instead of
    |queries| x |corpus| pairs. Use it when the query side is large
    (e.g. corpus-as-its-own-queries label scans): measured 17s -> <2s
    per run on 5k x 5k x 64d."""
    # NULL vectors carry no similarity signal and would otherwise
    # produce NULL scores (dot) or crash the numpy kernel (arrow):
    # both sides drop them up front in every method/metric.
    queries = queries.filter(F.col(vec_col).isNotNull())
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    if method == "arrow":
        return _brute_force_topk_arrow(
            queries, corpus, k, id_col, vec_col, metric
        )
    # norms precomputed once per row (not once per pair); the final
    # dot/(nq*nc) keeps the exact fp evaluation order of cosine().
    # Zero-norm vectors have no defined cosine: both sides filter them
    # out BEFORE the division (ANSI mode would otherwise raise
    # DIVIDE_BY_ZERO) — the arrow kernel mirrors this exclusion.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm(F.col(vec_col)).alias("qnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"),
    )
    if metric == "cosine":
        q = q.filter(F.col("qnrm") != 0)
        c = c.filter(F.col("cnrm") != 0)
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    score = (
        dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm"))
        if metric == "cosine"
        else dot(F.col("qvec"), F.col("cvec"))
    )
    scored = joined.select(
        "query_id", "neighbor_id", F.round(score, 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _brute_force_topk_arrow(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    metric: str,
) -> DataFrame:
    """Arrow kernel for brute_force_topk: queries collected to a numpy
    matrix (the broadcast-side contract made explicit), one matmul per
    corpus batch, per-batch per-query top-k with a 2e-6 raw-score
    slack (any row that could round-tie with the k-th at 6dp
    survives to the global window), then the same rounded-score
    window rank as the expr path."""
    import numpy as np
    from pyspark.sql import types as T

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    id_type = corpus.schema[id_col].dataType
    if not qrows:
        # empty query side: the expr path returns an empty frame — so
        # must this one (np.asarray([]) is 1-D and would AxisError)
        empty_schema = T.StructType(
            [
                T.StructField("query_id", id_type),
                T.StructField("neighbor_id", id_type),
                T.StructField("score", T.DoubleType()),
                T.StructField("rank", T.IntegerType()),
            ]
        )
        return corpus.sparkSession.createDataFrame([], empty_schema)
    qids = np.asarray([r[0] for r in qrows])
    qmat = np.asarray([np.asarray(r[1], dtype=np.float64) for r in qrows])
    if metric == "cosine":
        qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
        # zero-norm queries: the expr path's cosine divides by zero ->
        # NULL score -> no rows for that query; mark for exclusion
        zero_q = qnorm[:, 0] == 0.0
        qmat = qmat / np.maximum(qnorm, 1e-300)
    else:
        zero_q = np.zeros(len(qrows), dtype=bool)
    schema = T.StructType(
        [
            T.StructField("query_id", id_type),
            T.StructField("neighbor_id", id_type),
            T.StructField("_raw", T.DoubleType()),
        ]
    )
    narrow = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vec"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["vec"]]
            )
            if metric == "cosine":
                xnorm = np.linalg.norm(x, axis=1, keepdims=True)
                x = x / np.maximum(xnorm, 1e-300)
            nids = pdf["nid"].to_numpy()
            cos = x @ qmat.T  # (batch_rows, n_queries)
            cos[nids[:, None] == qids[None, :]] = -np.inf  # self pairs
            if metric == "cosine":
                # zero-norm rows/queries: expr-path cosine is NULL
                # (division by zero) and never ranks — mirror exactly
                cos[xnorm[:, 0] == 0.0, :] = -np.inf
                cos[:, zero_q] = -np.inf
            kk = min(k, len(pdf))
            # per query (column): indices of the kk largest raw scores
            top = np.argpartition(-cos, kk - 1, axis=0)[:kk, :]
            kth = cos[top, np.arange(cos.shape[1])].min(axis=0)
            keep = cos >= (kth[None, :] - 2e-6)  # round-tie slack
            rows, cols = np.nonzero(keep)
            raw = cos[rows, cols]
            finite = np.isfinite(raw)
            yield pd.DataFrame(
                {
                    "query_id": qids[cols[finite]],
                    "neighbor_id": nids[rows[finite]],
                    "_raw": raw[finite],
                }
            )

    cand = narrow.mapInPandas(run, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id", "neighbor_id", F.round("_raw", 6).alias("score")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(vec . plane_i). Returns long."""
    acc = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            dot(vec, lit_plane) > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        acc = acc.bitwiseOR(bit)
    return acc


def _bucket_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    all_planes: list[list[list[float]]],
    method: str = "auto",
) -> DataFrame:
    """(id, vec, buckets: array<long>) — one bucket per LSH table.

    arrow kernel: each Arrow batch becomes one numpy (rows x dim) @
    (dim x tables*planes) matmul; sign bits pack into per-table bucket
    ids. Identical output to the expression kernel (numpy float64 dot
    vs JVM double fold can differ only on exact-zero boundaries, which
    gaussian planes hit with probability 0)."""
    n_tables = len(all_planes)
    n_planes = len(all_planes[0])
    if method == "auto":
        method = "arrow" if n_tables * n_planes >= 12 else "expr"
    if method == "expr":
        return df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.array(
                *[lsh_bucket(F.col(vec_col), planes) for planes in all_planes]
            ).alias("buckets"),
        )

    import numpy as np
    from pyspark.sql import types as T

    # (dim, tables*planes) projection matrix, shipped in the closure
    mat = np.concatenate(
        [np.asarray(p, dtype=np.float64).T for p in all_planes], axis=1
    )
    weights = np.array(
        [[1 << i for i in range(n_planes)]], dtype=np.int64
    )

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("vec", df.schema[vec_col].dataType),
            T.StructField("buckets", T.ArrayType(T.LongType())),
        ]
    )
    narrow = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            if len(x) == 0:
                continue
            signs = (x @ mat) > 0  # (rows, tables*planes)
            per_table = signs.reshape(len(x), n_tables, n_planes)
            buckets = (per_table * weights).sum(axis=2).astype(np.int64)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "vec": pdf["vec"],
                    "buckets": list(buckets),
                }
            )

    return narrow.mapInPandas(run, schema)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k: compare only within matching sign-LSH buckets.

    2^n_planes buckets per table; the equi-join on (table, bucket)
    replaces the cross join — the shuffle key is two small ints.
    Recall tunes two ways: fewer planes -> bigger buckets (more cost,
    more recall); more tables -> independent plane sets OR-ed together
    (standard multi-table LSH: a true neighbor is missed only if it
    lands in a different bucket in EVERY table, so miss probability
    decays exponentially in n_tables). All tables' buckets come from
    one projection + posexplode, so it stays a single join.

    ``method``: bucket computation kernel. "expr" = pure Column
    expressions (zip_with/aggregate per plane — interpreted per
    element, O(tables*planes*dim) lambda evals per row); "arrow" = one
    Arrow-batched mapInPandas doing a single numpy matmul per batch —
    the scale path when tables*planes is large (sign-LSH is exactly a
    matrix product, which built-ins can't express vectorized); "auto"
    picks arrow when tables*planes >= 12."""
    all_planes = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def _with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        bucketed = _bucket_frame(df, id_col, vec_col, all_planes, method)
        return bucketed.select(
            F.col("id").alias(id_alias),
            F.col("vec").alias(vec_alias),
            F.posexplode("buckets").alias("tbl", "bucket"),
        )

    q = _with_buckets(queries, "query_id", "qvec")
    c = _with_buckets(corpus, "neighbor_id", "cvec")
    joined = c.join(F.broadcast(q), ["tbl", "bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # a pair colliding in several tables scores identically each time;
    # the max-agg dedupes without shuffling the vectors again
    scored = (
        joined.select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("score"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _cell_frame(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[list[float]],
    topn: int,
    method: str = "auto",
) -> DataFrame:
    """(id, vec, cells: array<int>) — the ``topn`` nearest centroids by
    cosine, ties broken by centroid id. Same expr/arrow kernel split as
    _bucket_frame: per-centroid Column cosine is O(cells*dim)
    interpreted lambdas per row; the arrow kernel is one normalized
    matmul + stable argsort per batch."""
    if method == "auto":
        method = "arrow" if len(cents) >= 8 else "expr"
    if method == "expr":

        def nearest(vec: Column) -> Column:
            scored = F.array(
                *[
                    F.struct(
                        (-cosine(vec, F.array(*[F.lit(float(x)) for x in cent]))).alias("d"),
                        F.lit(i).alias("cid"),
                    )
                    for i, cent in enumerate(cents)
                ]
            )
            return F.transform(
                F.slice(F.array_sort(scored), 1, topn), lambda s: s["cid"]
            )

        return df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            nearest(F.col(vec_col)).alias("cells"),
        )

    import numpy as np
    from pyspark.sql import types as T

    cmat = np.asarray(cents, dtype=np.float64).T  # (dim, cells)
    cnorm = np.maximum(np.linalg.norm(cmat, axis=0), 1e-300)
    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("vec", df.schema[vec_col].dataType),
            T.StructField("cells", T.ArrayType(T.IntegerType())),
        ]
    )
    narrow = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def run(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            if len(x) == 0:
                continue
            xn = np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            cos = (x @ cmat) / xn / cnorm  # (rows, cells)
            # stable sort on -cos: ties keep ascending centroid id,
            # matching the expr kernel's (d, cid) struct sort
            order = np.argsort(-cos, axis=1, kind="stable")[:, :topn]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "vec": pdf["vec"],
                    "cells": [row.astype("int32") for row in order],
                }
            )

    return narrow.mapInPandas(run, schema)


def fit_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_n: int = 2048,
    iters: int = 3,
    seed: int = 7,
) -> list[list[float]]:
    """Sampled k-means fit for IVF cells (driver-side numpy Lloyd
    iterations over a deterministic sample).

    At 100 TB the sample is still O(sample_n) rows collected once —
    the standard IVF training regime (train on a sample, assign the
    full corpus distributively). Assignment metric is cosine (matches
    ivf_topk's probe metric). Deterministic: ordered sample + seeded
    init."""
    import numpy as np

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    x = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    n_centroids = min(n_centroids, len(x))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=n_centroids, replace=False)].copy()
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    sample_n: int = 2048,
    seed: int = 7,
    method: str = "auto",
) -> DataFrame:
    """IVF-flat ANN: corpus rows assign to their nearest centroid cell;
    queries probe their `nprobe` nearest cells. Join key = centroid id:
    shuffle is on a small int.

    Centroids default to a sampled k-means fit of the corpus
    (fit_centroids) — random centroids leave most cells empty and
    recall collapses on clustered data. Pass ``centroids`` to reuse a
    fit across calls (the production pattern: fit once, assign many).

    ``method``: cell-assignment kernel, as in lsh_topk — "expr" (pure
    Column cosine per centroid), "arrow" (one numpy matmul per batch),
    "auto" (arrow when n_centroids >= 8). Tie-breaks on centroid id in
    both kernels."""
    if centroids is None:
        centroids = fit_centroids(
            corpus, id_col, vec_col, n_centroids, sample_n, seed=seed
        )
    cents = centroids

    c = _cell_frame(corpus, id_col, vec_col, cents, 1, method).select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("cells")[0].alias("cell"),
    )
    q = _cell_frame(queries, id_col, vec_col, cents, nprobe, method).select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.explode("cells").alias("cell"),
    )
    joined = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("score"),
    ).groupBy("query_id", "neighbor_id").agg(F.max("score").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def topk_recall(
    approx: DataFrame, exact: DataFrame, k: int
) -> DataFrame:
    """recall@k per query: |approx ∩ exact| / k over (query_id,
    neighbor_id) result sets. Left-semi join + count — no vectors move."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    base = exact.select("query_id").distinct()
    return base.join(hits, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k), 6).alias("recall"),
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.95,
    lsh_planes: int | None = None,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >=
    threshold). Blocking bounds the pairwise comparison:

    - ``block_col``: caller-supplied key (cluster/label) — exact within
      blocks;
    - ``lsh_planes``: built-in sign-LSH blocking (the 100 TB default
      when no natural key exists) — near-dups at cos >= 0.95 are within
      ~18°, so they land in the same sign bucket with probability
      (1 - 18/180)^planes (~0.66 at 4 planes); approximate by design,
      trade recall for the bound via fewer planes.

    Without either, this is a full O(n^2) cross join, unusable beyond
    ~1e5 rows (a warning is the guard; some corpora are genuinely
    small)."""
    sel = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    ]
    if block_col:
        sel.append(F.col(block_col).alias("blk"))
    elif lsh_planes:
        planes = _hyperplanes(dim, lsh_planes, seed)
        sel.append(lsh_bucket(F.col(vec_col), planes).alias("blk"))
        block_col = "_lsh"
    v = df.select(*sel)
    if block_col:
        # per-block Arrow kernel: one numpy gram-matrix per block
        # (chunked so memory stays O(chunk x block), not block^2)
        # instead of a pair-at-a-time join — the zip_with/aggregate dot
        # per joined pair was the measured bottleneck (~200k
        # interpreted 64-dim folds at sf0.1). Data movement is one
        # block's vectors into Python, pairs out — far below the
        # pairwise join's shuffle. Raw cosines filter at the threshold
        # inside the kernel; rounding stays Spark-side (HALF_UP parity
        # with the SQL oracle).
        id_type = v.schema["id"].dataType.simpleString()
        schema = f"id_a {id_type}, id_b {id_type}, _raw double"

        def block_pairs(pdf):
            import numpy as np
            import pandas as pd

            pdf = pdf.sort_values("id")
            ids = pdf["id"].to_numpy()
            n = len(ids)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "_raw": []})
            V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            nrm = np.sqrt((V * V).sum(axis=1))
            outs = []
            chunk = 1024
            cols = np.arange(n)[None, :]
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                G = (V[s:e] @ V.T) / np.outer(nrm[s:e], nrm)
                m = (cols > np.arange(s, e)[:, None]) & (G >= threshold)
                ii, jj = np.nonzero(m)
                outs.append(
                    pd.DataFrame(
                        {"id_a": ids[ii + s], "id_b": ids[jj], "_raw": G[ii, jj]}
                    )
                )
            return pd.concat(outs)

        return (
            v.groupBy("blk")
            .applyInPandas(block_pairs, schema)
            .select("id_a", "id_b", F.round("_raw", 6).alias("cos_sim"))
        )
    # no blocking: full O(n^2) cross join (unusable beyond ~1e5 rows);
    # norms precomputed per row, raw-cosine threshold, round for output
    v = v.withColumn("nrm", norm(F.col("vec")))
    a, b = v.alias("a"), v.alias("b")
    raw = dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            raw.alias("_raw"),
        )
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("cos_sim"))
    )


def semantic_dedup(
    emb: DataFrame,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    method: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus with
    the sampled k-means fit, compare pairs only within shared cells,
    and drop every vector that has a more-senior (smaller-id) neighbor
    at cosine >= tau. Returns (id, keep) for every input row.

    Blocking: each vector lands in its ``nprobe`` nearest cells (the
    multi-probe trick from ivf_topk applied symmetrically) — two
    vectors are compared iff their cell sets intersect. High-cosine
    pairs point in nearly the same direction, so they share nearest
    centroids with overwhelming probability; multi-probe covers the
    cell-boundary cases. The keep rule is single-hop min-id (a drop
    never cascades: b drops because of a smaller-id a regardless of
    whether a itself drops), so the output is deterministic and
    order-free.

    Scale shape: the only shuffle keys are small ints (cell ids); the
    within-cell self-join is bounded by cell sizes (centroids fitted by
    k-means keep cells balanced; raise n_clusters with corpus size,
    the standard IVF regime). Never all-pairs. Cell assignment is the
    same Arrow matmul kernel as ivf_topk."""
    if centroids is None:
        centroids = fit_centroids(
            emb, id_col, vec_col, n_centroids=n_clusters, sample_n=2048
        )
    cells = _cell_frame(emb, id_col, vec_col, centroids, nprobe, method)
    # ids only through the cell self-join: a pair probing several
    # shared cells collides once per cell, so dedupe the (id_a, id_b)
    # candidates BEFORE the cosine verify — the explode-join frame
    # carries two longs + a small int, never vectors.
    ids = cells.select(F.col("id"), F.explode("cells").alias("cell"))
    cand = (
        ids.select(F.col("id").alias("id_a"), "cell")
        .join(ids.select(F.col("id").alias("id_b"), "cell"), "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify: rejoin vectors by id. Catalyst broadcasts the vector side
    # when it is small (the gate/bench regime); at corpus scale this is
    # a pair-keyed shuffle join — candidates, not all-pairs, set cost.
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    dropped = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine(F.col("va"), F.col("vb")) >= F.lit(tau))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        emb.select(F.col(id_col).alias("id"))
        .join(dropped.withColumn("_drop", F.lit(True)), "id", "left")
        .select("id", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    collapse_eps: float = 1e-6,
) -> DataFrame:
    """Per-dimension statistics of an embedding column — the space
    diagnostic a pipeline runs before trusting vectors for dedup/ANN:
    a dimension with ~zero variance is collapsed (dead encoder unit,
    or a bug upstream zeroing a slice), and a mean far from 0 skews
    cosine against inner-product assumptions.

    Returns (dim, mean, std, min_val, max_val, collapsed) — one row
    per dimension, std is the sample standard deviation.

    Scale shape: posexplode fans each row into n_dims thin
    (dim, value) rows; the per-dim moments partial-aggregate map-side,
    so the shuffle carries n_dims rows per partition regardless of
    corpus size. Output is O(n_dims)."""
    vals = df.filter(F.col(vec_col).isNotNull()).select(
        F.posexplode(F.col(vec_col)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    return (
        vals.groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_samp("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("min_val"),
            F.round(F.max("v"), 6).alias("max_val"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "mean", "std", "min_val", "max_val",
            (F.coalesce(F.col("std"), F.lit(0.0)) < collapse_eps).alias(
                "collapsed"
            ),
        )
    )


def pca_power(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 4,
) -> DataFrame:
    """Top principal component of an embedding column by distributed
    covariance + fixed-iteration power method, returning each vector's
    PC1 projection — the 1-D "spectral score" used for embedding-space
    triage (anisotropy/outlier axes, SemDeDup-style cluster sorting,
    sanity-checking encoder drift between corpus versions).

    Deterministic closed form an oracle can replay: exactly ``iters``
    matrix-vector steps from the fixed start v0 = 1/sqrt(d) * ones,
    L2-normalized each step — both engines run the same arithmetic, so
    the (sign included) result agrees to float noise, absorbed by the
    6dp output rounding.

    Returns (id, pc1) with pc1 = (x - mean) . v_iters rounded to 6dp.

    Scale shape: the mean is one posexplode partial agg (O(d) rows);
    the covariance is an Arrow map stage emitting ONE d x d partial
    outer-product sum per partition (shuffle carries P * d^2 thin
    rows, never vectors); the d x d matrix and the iteration live on
    the driver — O(d^2) metadata, the same legitimacy class as
    collecting per-partition offsets. The projection pass is a
    scan-local index-ordered fold, no shuffle, no second pass."""
    import numpy as np
    import pandas as pd

    vecs = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    )
    stats = (
        vecs.select(F.posexplode("vec").alias("d", "x"))
        .groupBy("d")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    dim = len(stats)
    mu = np.zeros(dim)
    for r in stats:
        mu[r.d] = r.m
    n = vecs.count()

    def cov_partials(batches):
        acc = np.zeros((dim, dim))
        seen = False
        for pdf in batches:
            if len(pdf):
                a = np.stack(pdf["vec"].to_numpy()).astype("float64") - mu
                acc += a.T @ a
                seen = True
        if seen:
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "s": acc.ravel()}
            )

    partials = vecs.select("vec").mapInPandas(
        cov_partials, "i int, j int, s double"
    )
    rows = (
        partials.groupBy("i", "j").agg(F.sum("s").alias("s")).collect()
    )
    cov = np.zeros((dim, dim))
    for r in rows:
        cov[r.i, r.j] = r.s / n
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        u = cov @ v
        v = u / np.linalg.norm(u)
    # projection = x . v - mu . v: the vector dot folds in index order
    # scan-local; the centering term is one scalar
    c = float(np.dot(mu, v))
    vlit = F.array(*[F.lit(float(x)) for x in v])
    dot = F.aggregate(
        F.zip_with(F.col("vec"), vlit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return vecs.select(
        F.col("id").alias(id_col),
        F.round(dot - F.lit(c), 6).alias("pc1"),
    )


def label_separation(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-class embedding-space separation report: each label's
    centroid norm and its nearest OTHER centroid — the quick health
    check for labeled/clustered embeddings (two labels whose centroids
    nearly coincide are indistinguishable to any centroid-based
    retrieval or labeling pipeline; a centroid norm near zero flags a
    class averaged away to the origin).

    Returns (label, n_vecs, centroid_norm, nearest_label,
    nearest_dist) with norms/distances rounded to 6dp and the nearest
    pick made on the ROUNDED distance with a label tiebreak, so an
    external oracle agrees exactly.

    Scale shape: one posexplode partial-agg shuffle keyed on
    (label, dim) — the corpus collapses to L x d centroid cells
    map-side; every later step (norms, the L^2 x d pairwise frame,
    the nearest pick) runs on that tiny frame, never on vectors.
    """
    vals = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(label_col).alias("lbl"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    )
    cells = vals.groupBy("lbl", "dim").agg(
        F.avg(F.col("x").cast("double")).alias("c"),
        F.count("*").alias("_n"),
    ).localCheckpoint(eager=True)  # tiny L x d frame; GC-bounded
    norms = cells.groupBy("lbl").agg(
        F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias(
            "centroid_norm"
        ),
        F.max("_n").cast("long").alias("n_vecs"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.lbl") != F.col("b.lbl")),
        )
        .groupBy(F.col("a.lbl").alias("lbl"), F.col("b.lbl").alias("other"))
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("a.c") - F.col("b.c"), 2))), 6
            ).alias("dist")
        )
    )
    w = Window.partitionBy("lbl").orderBy(F.asc("dist"), F.asc("other"))
    nearest = (
        pair.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "lbl",
            F.col("other").alias("nearest_label"),
            F.col("dist").alias("nearest_dist"),
        )
    )
    return norms.join(nearest, "lbl").select(
        F.col("lbl").alias(label_col),
        "n_vecs",
        "centroid_norm",
        "nearest_label",
        "nearest_dist",
    )


def label_agreement(
    df: DataFrame,
    neighbors: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """kNN label-agreement — the confident-learning-style label-noise
    detector: for each labeled vector, the fraction of its k nearest
    neighbors sharing its label. Agreement near 0 flags probable
    mislabels (the vector sits inside another class's neighborhood);
    per-class mean agreement complements label_separation's
    centroid-level view with an instance-level one.

    ``neighbors``: optional (query_id, neighbor_id) pairs from ANY
    search operator — pass search_index/lsh results at deployment
    scale, where exact all-pairs kNN is off the table. The default
    computes exact brute-force top-k with the corpus as its own query
    set (the gate regime; O(N^2), small-N only — the broadcast side is
    the whole corpus).

    Returns (id, label, n_neighbors, agreement), agreement rounded to
    6dp. Scale shape beyond the neighbor search: two thin joins of the
    pair frame onto the (id, label) projection and one per-id
    aggregate — no vectors move past the search stage."""
    labeled = df.filter(F.col(label_col).isNotNull())
    if neighbors is None:
        # corpus-as-its-own-queries: the Arrow matmul path — the expr
        # BroadcastNestedLoopJoin is quadratic in interpreted lambda
        # evaluations here (measured 17s/run vs <2s at 5k x 5k x 64d)
        neighbors = brute_force_topk(
            labeled, labeled, k, id_col, vec_col, method="arrow"
        ).select("query_id", "neighbor_id")
    lbl = labeled.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lbl")
    )
    paired = (
        neighbors.join(
            lbl.withColumnRenamed("_id", "query_id").withColumnRenamed(
                "_lbl", "q_label"
            ),
            "query_id",
        )
        .join(
            lbl.withColumnRenamed("_id", "neighbor_id").withColumnRenamed(
                "_lbl", "n_label"
            ),
            "neighbor_id",
        )
    )
    return (
        paired.groupBy(F.col("query_id").alias("id"), F.col("q_label").alias("label"))
        .agg(
            F.count("*").cast("long").alias("n_neighbors"),
            F.round(
                F.avg((F.col("n_label") == F.col("q_label")).cast("double")), 6
            ).alias("agreement"),
        )
    )


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / metric training: for each
    anchor, the k most-cosine-similar corpus vectors carrying a
    DIFFERENT label — the examples a contrastive loss learns most from
    (similar embedding, wrong class). The label filter applies BEFORE
    the top-k (a different-label neighbor outside the unfiltered top-k
    is still a hard negative), which is why this is not a post-filter
    over brute_force_topk.

    Returns (anchor_id, negative_id, anchor_label, negative_label,
    score, rank) with score ties broken on negative_id.

    Scale shape: anchors broadcast against the partitioned corpus
    (the usual mining regime — anchors are the current training batch
    or a probe set, MBs against TBs); the per-anchor top-k is a
    window over each anchor's candidate rows only. For corpus-scale
    anchor sets swap the cross score for ivf_topk cells and keep the
    same label-filtered ranking."""
    anchors = anchors if anchors is not None else corpus
    # zero-norm vectors have no defined cosine — filter BEFORE the
    # division (ANSI mode raises DIVIDE_BY_ZERO), same contract as
    # brute_force_topk
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("anchor_label"),
        F.col(vec_col).alias("avec"),
        norm(F.col(vec_col)).alias("anrm"),
    ).filter(F.col("anrm") != 0)
    c = corpus.select(
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("negative_label"),
        F.col(vec_col).alias("cvec"),
        norm(F.col(vec_col)).alias("cnrm"),
    ).filter(F.col("cnrm") != 0)
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("anchor_label") != F.col("negative_label"))
        .select(
            "anchor_id",
            "negative_id",
            "anchor_label",
            "negative_label",
            F.round(
                dot(F.col("avec"), F.col("cvec"))
                / (F.col("anrm") * F.col("cnrm")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("score"), F.asc("negative_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection d -> k: proj_j =
    dot(vec, g_j) / sqrt(k) with g_j a seeded Gaussian row — distances
    are preserved within (1 +- eps) for k = O(ln n / eps^2), so
    downstream ANN / clustering / dedup can run on k=16 doubles
    instead of d=1024 floats (the standard pre-ANN compaction at
    corpus scale; composes with lsh_topk / ivf_topk / semantic_dedup
    unchanged).

    Deterministic from ``seed`` (same matrix every run/engine).
    Returns (id, proj: array<double>[out_dim]).

    Scale shape: the matrix is d x k literals baked into the plan
    (KBs); the projection is a scan-local fold per row — ONE scan, no
    shuffle, no UDF, no driver-side matrix distribution needed."""
    planes = _hyperplanes(in_dim, out_dim, seed)
    vec = F.col(vec_col)
    proj = F.array(
        *[
            (
                dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
                / F.sqrt(F.lit(float(out_dim)))
            )
            for plane in planes
        ]
    )
    return df.select(F.col(id_col).alias("id"), proj.alias("proj"))


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-dimension int8 quantization: scale_d =
    max(|v_d|) / 127 over the corpus, q_d = clamp(round(v_d / scale_d),
    -127, 127) — the standard 4x storage / memory-bandwidth cut for
    embedding stores (search re-ranks exactly on the float vectors for
    the shortlist only). Returns (id, q: array<int>, mse) where mse is
    the per-vector mean squared reconstruction error (q * scale vs v),
    rounded to 8dp (coarse enough that fold order cannot move the
    rounded value).

    Scale shape: the scales are ONE O(d)-row aggregate (posexplode ->
    per-dim max-abs partial aggs) collapsed to a single broadcast
    array row; the quantize pass is then scan-local zip_with — two
    corpus scans total, no corpus shuffle. Zero-variance dims get
    scale 1 so division is always defined."""
    vec = F.col(vec_col)
    dims = df.select(
        F.posexplode(vec).alias("dim", "v")
    ).groupBy("dim").agg(F.max(F.abs(F.col("v").cast("double"))).alias("amax"))
    scales_row = dims.groupBy().agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "amax"))),
            lambda s: F.when(s["amax"] > 0, s["amax"] / F.lit(127.0)).otherwise(
                F.lit(1.0)
            ),
        ).alias("scales")
    )
    quantized = df.crossJoin(F.broadcast(scales_row)).select(
        F.col(id_col).alias("id"),
        F.zip_with(
            vec,
            F.col("scales"),
            lambda v, s: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127), F.round(v.cast("double") / s, 0).cast("int")
                ),
            ),
        ).alias("q"),
        F.zip_with(
            vec,
            F.col("scales"),
            lambda v, s: v.cast("double")
            - F.greatest(
                F.lit(-127.0),
                F.least(F.lit(127.0), F.round(v.cast("double") / s, 0)),
            )
            * s,
        ).alias("_err"),
    )
    mse = F.round(
        F.aggregate(
            F.col("_err"), F.lit(0.0), lambda acc, e: acc + e * e
        )
        / F.size("q"),
        8,
    )
    return quantized.select("id", "q", mse.alias("mse"))


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest centroid by cosine, ties to the smaller
    centroid id — the public single-cell form of the IVF assignment
    kernel (fit centroids with fit_centroids, or pass any fixed list).
    Scan-local per row; auto-switches to the Arrow matmul kernel for
    wide centroid sets like _cell_frame."""
    cells = _cell_frame(df, id_col, vec_col, centroids, topn=1)
    return cells.select("id", F.element_at("cells", 1).alias("cell"))


def ranking_metrics(
    ranked: DataFrame,
    labels: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Retrieval-quality metrics per query over any ranked result
    frame (brute_force_topk / lsh_topk / ivf_topk output —
    (query_id, neighbor_id, rank)): binary relevance = neighbor shares
    the query's label; reports the standard search-eval triple

        precision_at_k = |relevant in top-k| / k
        mrr            = 1 / rank of the first relevant (0 if none)
        ndcg           = DCG / IDCG,  DCG = sum rel_i / log2(i + 1)

    with IDCG over min(R, k) ideal slots (R = the query's total
    relevant corpus items, so a query with only 2 relevant docs can
    still score ndcg = 1.0). Queries with R = 0 report ndcg 0. All
    three rounded to 6dp; the DCG folds run in rank order
    (sort_array + aggregate) for cross-engine float identity.

    Scale shape: two label joins onto the (already thin) ranked frame
    (optimizer-chosen strategy — the label map is corpus-sized, so it
    is NOT broadcast-hinted), one query-keyed rollup, and an
    O(#labels)-row relevant-count table broadcast back. The ranked
    frame is the expensive part and it is an INPUT — metrics cost
    scales with |queries| x k, not the corpus."""
    lbl = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lbl")
    )
    per_label = lbl.groupBy("_lbl").agg(F.count("*").alias("_n_label"))
    # no broadcast hint on the label joins: ``labels`` is corpus-sized
    # (one row per vector) — forcing it driver-side would be the OOM
    # path. Spark broadcasts on its own when the frame is small; at
    # scale the thin ranked frame shuffles against it instead.
    scored = (
        ranked.filter(F.col("rank") <= k)
        .join(
            lbl.withColumnRenamed("_id", "query_id").withColumnRenamed("_lbl", "q_label"),
            "query_id",
        )
        .join(
            lbl.withColumnRenamed("_id", "neighbor_id").withColumnRenamed("_lbl", "n_label"),
            "neighbor_id",
        )
        .select(
            "query_id",
            "q_label",
            "rank",
            # NULL neighbor labels mean not-relevant, never NULL — an
            # un-coalesced NULL would poison the DCG fold (acc + NULL)
            F.coalesce(
                (F.col("n_label") == F.col("q_label")).cast("int"),
                F.lit(0),
            ).alias("rel"),
        )
    )
    folded = scored.groupBy("query_id", "q_label").agg(
        F.round(F.sum("rel") / F.lit(float(k)), 6).alias("precision_at_k"),
        F.round(
            F.coalesce(
                1.0 / F.min(F.when(F.col("rel") == 1, F.col("rank"))),
                F.lit(0.0),
            ),
            6,
        ).alias("mrr"),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("rank", "rel"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["rel"].cast("double") / F.log2(x["rank"].cast("double") + 1),
        ).alias("_dcg"),
    )
    # ideal DCG: the first min(R, k) slots filled, R = relevant corpus
    # items for the query's label (excluding the query itself)
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("_n_label") - 1, F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    return (
        folded.join(F.broadcast(per_label), folded.q_label == per_label._lbl)
        .select(
            "query_id",
            "precision_at_k",
            "mrr",
            F.round(
                F.when(F.col("_n_label") > 1, F.col("_dcg") / idcg).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("ndcg"),
        )
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    z_thresh: float = 3.0,
) -> DataFrame:
    """Per-class embedding outlier scan: each vector's Euclidean
    distance to its label centroid, z-scored within the label —
    distance outliers are the mislabeled / corrupted / out-of-
    distribution examples a curation pass drops or re-labels (the
    geometric complement to label_agreement's neighborhood vote).

    Returns (id, label, dist, z, is_outlier) with dist/z rounded to
    6dp and is_outlier = z > z_thresh (degenerate classes emit z = 0,
    group_zscores' contract).

    Scale shape: centroids collapse the corpus to L x d cells via one
    (label, dim)-keyed partial-agg shuffle (the label_separation
    shape) and broadcast back as one array row per label; the
    per-vector distance is a scan-local dimension-ordered fold; the
    z-pass reuses group_zscores (one O(L)-row stats agg broadcast
    back). No window, no sort, no UDF."""
    from mofka_spark.operators.sketch import group_zscores

    labeled = df.filter(F.col(label_col).isNotNull())
    cents = (
        labeled.select(
            F.col(label_col).alias("_lbl"),
            F.posexplode(F.col(vec_col)).alias("_dim", "_v"),
        )
        .groupBy("_lbl", "_dim")
        .agg(F.avg(F.col("_v").cast("double")).alias("_c"))
        .groupBy("_lbl")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_dim", "_c"))),
                lambda s: s["_c"],
            ).alias("_cent")
        )
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("_cent"),
                lambda v, c: (v.cast("double") - c)
                * (v.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dists = (
        labeled.join(
            F.broadcast(cents), labeled[label_col] == cents["_lbl"]
        )
        .select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.round(dist, 6).alias("dist"),
        )
    )
    z = group_zscores(dists, "dist", "label", keep_cols=["id"])
    return z.select(
        "id",
        "label",
        "dist",
        "z",
        (F.col("z") > z_thresh).alias("is_outlier"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rank_col: str = "rank",
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner: given N ranked lists per query (BM25,
    dense cosine, dot, ...), each candidate scores

        rrf = sum over lists of 1 / (k + rank_in_list)

    (absent from a list = contributes 0). Rank-based, so the lists'
    score scales never need calibrating — which is why RRF is the
    default fusion in hybrid retrieval stacks. Returns (query_id,
    neighbor_id, rrf_score, fused_rank) with score rounded to 6dp and
    ties broken on neighbor id; ``top`` keeps the best N per query.

    Scale shape: a unionAll of the (already thin) ranked frames, one
    (query, id)-keyed partial-agg sum, and a per-query window over
    each query's candidate pool (bounded by N_lists x list_len) —
    cost scales with the rankings, never the corpus."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            (1.0 / (F.lit(k) + F.col(rank_col))).alias("_c"),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    fused = contribs.groupBy("query_id", "neighbor_id").agg(
        F.round(F.sum("_c"), 6).alias("rrf_score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w))
    if top is not None:
        out = out.filter(F.col("fused_rank") <= top)
    return out


def _sqdist_to_literal(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from an array column to a literal centroid,
    folded in DIM ORDER (acc + (x_i - c_i)^2 for i = 0..d-1) so the
    IEEE result is reproducible by an external engine computing the
    same ordered fold (the token_entropy float-identity trick)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    # (a - b) * (a - b), NOT pow(a - b, 2): Math.pow can differ from
    # the product in the last ulp, and the oracle computes the product
    return F.aggregate(
        F.zip_with(
            vec,
            lit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin over centroids of squared L2, ties to the LOWER cell id —
    one scan-local expression: array_min over (dist, cell) structs
    compares lexicographically, giving the argmin and the tie-break in
    a single fold, no join, no UDF."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _sqdist_to_literal(vec, c).alias("d"),
                    F.lit(j).cast("int").alias("cell"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    ).getField("cell")


def kmeans_fit_full(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 4,
    init_centroids: list[list[float]] | None = None,
    method: str = "sums",
) -> list[list[float]]:
    """FULL-CORPUS distributed Lloyd iterations — the scale
    counterpart of fit_centroids (which trains on a collected sample).
    When cluster quality matters more than fit time (SemDeDup cells,
    cell-balanced quotas, IVF layouts that must respect tail clusters
    a sample misses), the textbook Lloyd update is exactly two
    distributed primitives per round:

    - ASSIGN: nearest-centroid id is a scan-local fold against the
      k x d centroid LITERALS baked into the plan (KBs — the model
      broadcasts by value, no join);
    - UPDATE: new centroid = per-(cell, dim) mean — posexplode to thin
      (cell, dim, value) rows, ONE partial-agg shuffle bounded by
      k x d output rows, collected to the driver (k x d doubles).

    Per iteration: one corpus scan + one bounded shuffle; nothing else
    moves. Empty cells keep their previous centroid (the standard
    degeneracy rule, mirrored by the oracle). Deterministic: default
    init = the vectors of the k smallest ids (oracle-expressible;
    ties impossible on a key column). NULL vectors are excluded.

    ``method`` is the repo's exact-for-gate / mergeable-for-scale
    split (value_trend's convention), applied to the centroid means:

    * ``"sums"`` (default, the corpus-scale path): plain partial-agg
      AVG per (cell, dim). Association-order dependent in the last
      ulp — under multi-partition/AQE reordering a near-tied argmin
      assignment can flip, so fitted models are stable but not
      bit-pinned run to run.
    * ``"ordered"`` (the correctness-gate path): per-(cell, dim) sum
      as an id-ordered fold (sort_array(collect_list) + F.aggregate)
      divided by the count — the same IEEE doubles an external engine
      derives via list_sum(list(v ORDER BY id)) / COUNT. Costs
      O(cell size) group state; gate/small-model use only.

    Returns the k x d centroid list — feed it to kmeans_cells /
    ivf_topk(centroids=...) / cell_balanced_sample."""
    if method not in ("sums", "ordered"):
        raise ValueError(f"kmeans_fit_full: unknown method {method!r}")
    vecs = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    if init_centroids is None:
        first = vecs.orderBy("_id").limit(k).collect()
        init_centroids = [[float(x) for x in r._v] for r in first]
    cents = [list(c) for c in init_centroids]
    if not cents:  # empty corpus: no centroids to fit
        return []
    if method == "ordered":
        mean_agg = (
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_id"), F.col("_val")))
                    ),
                    lambda s: s.getField("_val"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count("_val").cast("double")
        ).alias("_c")
    else:
        mean_agg = F.avg("_val").alias("_c")
    for _ in range(iters):
        assigned = vecs.select(
            "_id", "_v", _nearest_cell(F.col("_v"), cents).alias("_cell")
        )
        means = (
            assigned.select(
                "_id",
                "_cell",
                F.posexplode(F.col("_v").cast("array<double>")).alias(
                    "_dim", "_val"
                ),
            )
            .groupBy("_cell", "_dim")
            .agg(mean_agg)
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r._cell, {})[r._dim] = r._c
        cents = [
            [by_cell[j][d] for d in range(len(cents[j]))]
            if j in by_cell
            else cents[j]  # empty cell: keep previous centroid
            for j in range(len(cents))
        ]
    return cents


def kmeans_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final cell assignment against fitted centroids: (id, cell,
    n_cell) — integer-only output so the correctness surface has no
    float-rounding edge (distances exist only inside the argmin fold).
    n_cell (the member count of the row's cell) rides along because
    every consumer (balanced quotas, per-cell stats, SemDeDup pruning)
    immediately needs it.

    Scale shape: assignment is one scan against centroid literals; the
    size join-back is a k-row broadcast."""
    if not centroids:  # no centroids (empty-corpus fit): empty result
        from pyspark.sql import types as T

        return corpus.sparkSession.createDataFrame(
            [],
            corpus.select(F.col(id_col))
            .schema.add("cell", T.IntegerType())
            .add("n_cell", T.LongType()),
        )
    assigned = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        _nearest_cell(F.col(vec_col), centroids).alias("cell"),
    )
    sizes = assigned.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_cell")
    )
    return assigned.join(F.broadcast(sizes), "cell").select(
        id_col, "cell", "n_cell"
    )


def label_propagation(
    df: DataFrame,
    neighbors: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
    iters: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation over the kNN graph: labeled
    rows are clamped seeds; every unlabeled row takes the MAJORITY
    label of its k nearest neighbors, iterated ``iters`` synchronous
    rounds — the classic weak-supervision labeler (expand a small
    hand-labeled seed set across an embedding corpus) completing the
    label-health family (label_agreement detects noise,
    label_separation scores class geometry, this one CREATES labels).

    Ties break on the smaller label; a row whose labeled-neighbor set
    is empty stays NULL. The labeled set is monotone across rounds
    (seeds never change, propagated labels can flip but never vanish),
    so ``iters`` rounds reach everything within ``iters`` hops of a
    seed.

    ``neighbors``: optional (query_id, neighbor_id) pairs from ANY
    search operator — pass lsh_topk/ivf_topk output at corpus scale.
    The default computes exact brute-force top-k with the corpus as
    its own query set (the gate regime; Arrow matmul kernel).

    Returns (id, label, is_seed). Scale shape past the neighbor
    search: per round, one thin join of the pair frame onto the
    (id, label) projection + one (query, label)-keyed count + one
    per-query argmax window over <= k vote rows; vectors never move.
    The neighbor frame is localCheckpoint'ed once and reused by every
    round."""
    base = df.filter(F.col(vec_col).isNotNull()) if neighbors is None else df
    if neighbors is None:
        neighbors = brute_force_topk(
            base, base, k, id_col, vec_col, method="arrow"
        ).select("query_id", "neighbor_id")
    # reused every round — materialize once (GC-bounded, not a cache leak)
    neighbors = neighbors.localCheckpoint(eager=True)
    seeds = base.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("_seed")
    )
    cur = seeds.select("id", F.col("_seed").alias("lbl"))
    for _ in range(iters):
        votes = (
            neighbors.join(
                cur.select(
                    F.col("id").alias("neighbor_id"),
                    F.col("lbl").alias("n_lbl"),
                ),
                "neighbor_id",
            )
            .filter(F.col("n_lbl").isNotNull())
            .groupBy("query_id", "n_lbl")
            .agg(F.count("*").alias("_n"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("_n"), F.asc("n_lbl")
        )
        top = (
            votes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("query_id").alias("id"), F.col("n_lbl").alias("_prop"))
        )
        cur = (
            seeds.join(top, "id", "left")
            .select("id", F.coalesce("_seed", "_prop").alias("lbl"))
            .localCheckpoint(eager=True)  # cut per-round lineage
        )
    return seeds.join(cur, "id").select(
        "id",
        F.col("lbl").alias("label"),
        F.col("_seed").isNotNull().alias("is_seed"),
    )


def kcenter_select(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez): start from the
    smallest id, repeatedly add the point FARTHEST from its nearest
    already-chosen center — the classic 2-approximation of the
    k-center cover, and the standard diversity-first coreset /
    active-learning seed picker (maximize coverage of the embedding
    space with k exemplars, where uniform sampling oversamples dense
    clusters).

    Deterministic and engine-exact: centers are actual corpus vectors
    (never averaged), and every distance is the dim-ordered squared-L2
    fold, so an external engine unrolling the same rounds computes
    bit-identical distances — the argmax (ties to the smaller id) and
    the radii match exactly, no rounding discipline needed.

    Returns k rows (pick_order, id, radius): radius = the pick's
    distance to its nearest prior center (the covering radius of the
    first pick_order centers), NULL for the seed pick; radii are
    non-increasing.

    Scale shape: k-1 rounds, each ONE corpus scan (the running
    nearest-center distance updates incrementally — least(dmin, one
    new literal-centroid fold), localCheckpoint'ed per round) + a
    driver top-1 via TakeOrderedAndProject (per-partition heaps, no
    global sort). The model state is k vectors on the driver."""
    vecs = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    first = vecs.orderBy("_id").limit(1).collect()
    if not first:
        return corpus.sparkSession.createDataFrame(
            [], "pick_order int, id long, radius double"
        )
    seed_id, seed_v = first[0]._id, [float(x) for x in first[0]._v]
    picks: list[tuple[int, int, float | None]] = [(0, seed_id, None)]
    cur = vecs.select(
        "_id", "_v", _sqdist_to_literal(F.col("_v"), seed_v).alias("_dmin")
    ).localCheckpoint(eager=True)
    for i in range(1, min(k, cur.count())):
        top = (
            cur.orderBy(F.desc("_dmin"), F.asc("_id")).limit(1).collect()[0]
        )
        picks.append((i, top._id, float(top._dmin)))
        new_c = [float(x) for x in top._v]
        cur = cur.select(
            "_id",
            "_v",
            F.least(
                F.col("_dmin"), _sqdist_to_literal(F.col("_v"), new_c)
            ).alias("_dmin"),
        ).localCheckpoint(eager=True)
    return corpus.sparkSession.createDataFrame(
        picks, "pick_order int, id long, radius double"
    )


def kmeans_silhouette(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-point simplified silhouette against fitted centroids: a =
    distance to the OWN (nearest) centroid, b = distance to the
    nearest OTHER centroid, s = (b - a) / max(a, b) — the standard
    centroid-based silhouette that scores a clustering in one pass
    (exact silhouette needs all pairwise point distances; this is the
    O(n*k) form every large-scale library uses). s near 1 = well
    separated, near 0 = boundary, negative never occurs here (a is
    the min by construction) but the formula keeps the general shape.

    Returns (id, cell, own_dist, other_dist, silhouette), distances
    and s rounded to 6dp (signed-zero normalized). Points exactly on
    two centroids (b = 0) get s = 0. NULL vectors are excluded.

    Scale shape: entirely scan-local — the k x d centroid literals
    bake into the plan, each row sorts its own k-element (dist, cell)
    struct array (ties to the lower cell, kmeans_cells' rule), no
    join, no shuffle, no aggregate. Mean-silhouette rollups are one
    plain groupBy away and deliberately NOT fused in (summation order
    isn't engine-reproducible; per-point rows are)."""
    if len(centroids) < 2:
        raise ValueError("kmeans_silhouette needs >= 2 centroids")
    vec = F.col(vec_col)
    structs = F.array(
        *[
            F.struct(
                _sqdist_to_literal(vec, c).alias("d"),
                F.lit(j).cast("int").alias("cell"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    srt = F.array_sort(structs)
    sa = F.sqrt(F.element_at(srt, 1).getField("d"))
    sb = F.sqrt(F.element_at(srt, 2).getField("d"))
    s = F.when(sb == 0.0, F.lit(0.0)).otherwise((sb - sa) / sb)
    return corpus.filter(vec.isNotNull()).select(
        F.col(id_col),
        F.element_at(srt, 1).getField("cell").alias("cell"),
        (F.round(sa, 6) + F.lit(0.0)).alias("own_dist"),
        (F.round(sb, 6) + F.lit(0.0)).alias("other_dist"),
        (F.round(s, 6) + F.lit(0.0)).alias("silhouette"),
    )


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    method: str = "sums",
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split each d-dim vector into
    ``m`` contiguous d/m-dim subvectors and k-means each subspace
    independently (Jégou et al.'s PQ) — the compressed-domain ANN
    representation: m log2(k) bits per vector instead of 4d bytes,
    with distances computable from code lookups alone (pq_topk).
    The compression complement of quantize_embeddings' int8 scalars.

    Returns m codebooks, each k x (d/m) — model state is k x d doubles
    on the driver, like kmeans_fit_full. Reuses kmeans_fit_full per
    subspace: deterministic init (the k smallest ids' subvectors),
    scan-local assignment vs literals, one bounded shuffle per Lloyd
    round, m x iters passes total. d must divide by m. ``method``
    passes through to kmeans_fit_full ("sums" scale path /
    "ordered" bit-pinned gate path)."""
    first = corpus.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if first is None:
        return []
    d = len(first[0])
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for j in range(m):
        piece = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col),
        )
        books.append(
            kmeans_fit_full(
                piece, id_col, vec_col, k=k, iters=iters, method=method
            )
        )
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    coarse_centroids: list[list[float]] | None = None,
) -> DataFrame:
    """PQ codes: per subspace the argmin codebook entry (ties to the
    lower code, kmeans_cells' rule). Returns (id, codes array<int>,
    length m) — the persistable compressed corpus. With
    ``coarse_centroids`` (a kmeans_fit_full model over the FULL
    vectors) a ``cell`` column rides along — the IVF-PQ layout
    ivfpq_topk probes; write it partitioned/bucketed by cell so probes
    prune directories.

    Scale shape: entirely scan-local — every codebook (and the coarse
    model) bakes into the plan as literals; no join, no shuffle."""
    if not codebooks:
        return corpus.select(F.col(id_col)).filter(F.lit(False)).withColumn(
            "codes", F.array().cast("array<int>")
        )
    sub = len(codebooks[0][0])
    vec = F.col(vec_col)
    codes = F.array(
        *[
            _nearest_cell(F.slice(vec, j * sub + 1, sub), cb)
            for j, cb in enumerate(codebooks)
        ]
    )
    cols = [F.col(id_col).alias("id"), codes.alias("codes")]
    if coarse_centroids:
        cols.append(_nearest_cell(vec, coarse_centroids).alias("cell"))
    return corpus.filter(vec.isNotNull()).select(*cols)


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: per query an
    m x k lookup table of exact subvector-to-codebook-entry squared
    distances is computed ONCE (driver-side — dims folded in order, so
    the table entries are the same IEEE doubles an external engine
    derives), then every corpus row's distance is m table lookups
    summed in subspace order. Returns (query_id, neighbor_id,
    distance, rank) with distance = the rounded ADC approximation of
    squared L2; ties rank by neighbor id.

    Scale shape: the query side collapses to (query_id, tables) rows
    that broadcast (the ANN-query regime); the corpus side reads ONLY
    the codes — never the vectors. One window per query for the rank;
    self-pairs excluded like brute_force_topk."""
    if not codebooks:
        raise ValueError("pq_topk: empty codebooks")
    sub = len(codebooks[0][0])
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        return codes.select(
            F.col("id").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            F.lit(0.0).alias("distance"),
            F.lit(0).cast("int").alias("rank"),
        ).filter(F.lit(False))
    qtab = []
    for r in qrows:
        v = [float(x) for x in r[1]]
        tables = []
        for j, cb in enumerate(codebooks):
            q = v[j * sub : (j + 1) * sub]
            row = []
            for cent in cb:
                acc = 0.0
                for a, b in zip(q, cent):
                    acc += (a - b) * (a - b)
                row.append(acc)
            tables.append(row)
        qtab.append((r[0], tables))
    spark = codes.sparkSession
    from pyspark.sql import types as T

    qdf = spark.createDataFrame(
        qtab,
        T.StructType(
            [
                T.StructField(
                    "query_id", queries.schema[id_col].dataType
                ),
                T.StructField(
                    "tab", T.ArrayType(T.ArrayType(T.DoubleType()))
                ),
            ]
        ),
    )
    dist = F.aggregate(
        F.zip_with(
            "codes", "tab", lambda c, t: F.element_at(t, c + F.lit(1))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(qdf))
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (F.round(dist, 6) + F.lit(0.0)).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search (the FAISS-style composition): per query, probe
    the ``nprobe`` nearest coarse cells, then rank ONLY those cells'
    rows by the PQ asymmetric distance — the full compressed-domain
    ANN stack: ivf_topk's pruning with pq_topk's 4d-bytes -> m-codes
    compression. ``codes`` is pq_encode(..., coarse_centroids=...)'s
    (id, codes, cell) frame.

    Probe order and distances are deterministic (centroid distance
    asc, cell asc; dim-ordered driver-side table folds), so results
    are exactly reproducible by an external engine. Returns
    (query_id, neighbor_id, distance, rank); self-pairs excluded.

    Scale shape: the query side collapses to broadcast (query,
    probe-cells, m x k table) rows; the corpus side reads codes only,
    and the cell filter prunes before any distance math — with the
    codes frame written partitioned by cell, probes prune at the
    directory level exactly like ivf_topk / the streaming ANN store."""
    if nprobe <= 0:
        raise ValueError("ivfpq_topk: nprobe must be positive")
    if not codebooks or not coarse_centroids:
        raise ValueError("ivfpq_topk: empty codebooks or centroids")
    sub = len(codebooks[0][0])
    qrows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    if not qrows:
        return codes.select(
            F.col("id").alias("query_id"),
            F.col("id").alias("neighbor_id"),
            F.lit(0.0).alias("distance"),
            F.lit(0).cast("int").alias("rank"),
        ).filter(F.lit(False))
    qtab = []
    for r in qrows:
        v = [float(x) for x in r[1]]
        cd = []
        for cell, cent in enumerate(coarse_centroids):
            acc = 0.0
            for a, b in zip(v, cent):
                acc += (a - b) * (a - b)
            cd.append((acc, cell))
        probes = [c for _, c in sorted(cd)[:nprobe]]
        tables = []
        for j, cb in enumerate(codebooks):
            q = v[j * sub : (j + 1) * sub]
            row = []
            for cent in cb:
                acc = 0.0
                for a, b in zip(q, cent):
                    acc += (a - b) * (a - b)
                row.append(acc)
            tables.append(row)
        qtab.append((r[0], probes, tables))
    from pyspark.sql import types as T

    spark = codes.sparkSession
    qdf = spark.createDataFrame(
        qtab,
        T.StructType(
            [
                T.StructField(
                    "query_id", queries.schema[id_col].dataType
                ),
                T.StructField("probes", T.ArrayType(T.IntegerType())),
                T.StructField(
                    "tab", T.ArrayType(T.ArrayType(T.DoubleType()))
                ),
            ]
        ),
    )
    dist = F.aggregate(
        F.zip_with(
            "codes", "tab", lambda c, t: F.element_at(t, c + F.lit(1))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        codes.crossJoin(F.broadcast(qdf))
        .filter(
            F.array_contains(F.col("probes"), F.col("cell"))
            & (F.col("query_id") != F.col("id"))
        )
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            (F.round(dist, 6) + F.lit(0.0)).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def write_pq_codes(codes: DataFrame, path: str) -> None:
    """Persist pq_encode's (id, codes, cell) frame as the BATCH IVF-PQ
    code table, hive-partitioned by cell — the layout that lets
    search_pq_codes turn each query's probe set into a directory-level
    prune (same layout the incremental streaming/pqindex.py store
    uses). At 100 TB the code table is the index: m ints per vector,
    and a probe touches nprobe/n_cells of its files, not the corpus."""
    if "cell" not in codes.columns:
        raise ValueError(
            "write_pq_codes: codes must carry a cell column "
            "(pq_encode(..., coarse_centroids=...))"
        )
    codes.write.mode("overwrite").partitionBy("cell").parquet(path)


def search_pq_codes(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search against a write_pq_codes table: the union of the
    queries' probe cells becomes a LITERAL isin predicate on the
    ``cell`` partition column, so unprobed cell directories are never
    opened (PartitionFilters at plan time, the batch analog of
    streaming/pqindex.py search_pq_index); ivfpq_topk then ranks the
    surviving code rows with its per-query probe filter and ADC
    tables. Results are bit-identical to in-memory ivfpq_topk over the
    same codes frame.

    The probe union is computed ENGINE-SIDE: each query's nprobe
    argmin cells come from the same literal-centroid dim-ordered fold
    ivfpq_topk ranks with (array_sort over (dist, cell) structs — ties
    to the lower cell, IEEE-identical to the driver loop it replaced),
    then one explode+distinct collapses the corpus of probe lists to
    at most n_cells rows before the only collect. No query VECTOR ever
    reaches the driver here — only the O(n_cells) distinct cell ids —
    so a 10k-query frame stays distributed through probe selection."""
    if nprobe <= 0:
        raise ValueError("search_pq_codes: nprobe must be positive")
    if not coarse_centroids:
        raise ValueError("search_pq_codes: empty coarse centroids")
    cand = F.array(
        *[
            F.struct(
                _sqdist_to_literal(F.col(vec_col), c).alias("d"),
                F.lit(j).cast("int").alias("cell"),
            )
            for j, c in enumerate(coarse_centroids)
        ]
    )
    probe_cells = F.transform(
        F.slice(F.array_sort(cand), 1, nprobe), lambda s: s["cell"]
    )
    probed = sorted(
        r["cell"]
        for r in queries.filter(F.col(vec_col).isNotNull())
        .select(F.explode(probe_cells).alias("cell"))
        .distinct()
        .collect()
    )
    codes = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    return ivfpq_topk(
        queries,
        codes,
        codebooks,
        coarse_centroids,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
    )


def pq_rerank(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search with exact rerank (the production shape): the ADC
    pass shortlists ``shortlist`` candidates per query from codes
    alone, then TRUE squared-L2 distances are computed for just those
    pairs and the top ``k`` re-ranked — quantization error decides
    only what enters the shortlist, never the final order. Exact
    distance work per query drops from |corpus| to ``shortlist``.

    Returns (query_id, neighbor_id, distance, rank) with distance =
    the exact rounded squared L2 (dim-ordered fold, engine-
    reproducible); ties rank by neighbor id.

    Scale shape: pq_topk's broadcast table pass for the shortlist;
    the rerank joins the thin (query, neighbor) shortlist back to the
    corpus on the neighbor id (AQE broadcasts the shortlist — it is
    queries x shortlist rows) and to the collected query vectors, so
    full vectors are read for shortlist members only."""
    short = pq_topk(
        queries, codes, codebooks, k=shortlist, id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    qv = queries.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cv = corpus.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    dist = F.aggregate(
        F.zip_with(
            "_qv",
            "_cv",
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        short.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (F.round(dist, 6) + F.lit(0.0)).alias("distance"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("distance"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
