"""Embedding-corpus curation walkthrough — the vector-side companion
to curation_pipeline.py (text side):

    raw vectors -> dimension health -> full-corpus k-means cells ->
    label propagation from a 20% seed set -> label-noise scan ->
    per-class outliers -> semantic dedup -> int8 quantization for
    export

Every stage is a pure DataFrame transform from
mofka_spark.operators.similarity; the same calls run unchanged on a
1000-executor cluster (see SCALING.md for each operator's shuffle
budget — the exact-kNN stages here are the small-corpus gate regime;
at deployment scale pass lsh_topk/ivf_topk output via the
``neighbors=`` hooks).

Run:  PYTHONPATH=.. python embedding_pipeline.py
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mofka_spark.operators import similarity as S
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    # 3 well-separated clusters in 8-dim, 20 vectors each; only every
    # 5th vector keeps its true label (the weak-supervision regime)
    rng = random.Random(11)
    rows = []
    vid = 0
    for c in range(3):
        center = [6.0 * (i == c) for i in range(8)]
        for _ in range(20):
            v = [x + rng.gauss(0, 0.4) for x in center]
            rows.append((vid, v, c if vid % 5 == 0 else None))
            vid += 1
    # one duplicated vector (near-copy of vec 0) and one collapsed dim
    rows.append((999, [x + 0.001 for x in rows[0][1]], None))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )

    # 0. no embedding model? hash_embed projects raw TEXT into this
    # same pipeline: near-dup texts land near each other, so every
    # vector stage below applies to a plain document corpus too.
    from mofka_spark.operators.text import hash_embed

    docs = spark.createDataFrame(
        [(1, "spark shuffle broadcast join"),
         (2, "spark shuffle broadcast join"),
         (3, "gardening tips for winter roses")],
        "doc_id long, text string",
    )
    txt_vecs = hash_embed(docs, dim=16).withColumnRenamed("id", "vec_id")
    nn = S.brute_force_topk(
        txt_vecs.filter("vec_id = 1"), txt_vecs, k=1
    ).first()
    print(
        "hash-embedded text kNN: doc 1's nearest is "
        f"{nn['neighbor_id']} (cos {nn['score']})"
    )

    # 1. dimension health: means/stds, collapsed-dimension detection
    print("per-dimension stats:")
    S.embedding_dim_stats(emb).orderBy("dim").show(4)

    # 2. full-corpus k-means (distributed Lloyd) -> cells with sizes
    cents = S.kmeans_fit_full(emb, k=3, iters=3)
    cells = S.kmeans_cells(emb, cents)
    print("cell sizes:", sorted(
        {(r.cell, r.n_cell) for r in cells.collect()}
    ))

    # 3. label propagation: spread the 20% seed labels over the kNN
    # graph (2 synchronous majority rounds, seeds clamped)
    labeled = S.label_propagation(emb, k=5, iters=2)
    n_seed = labeled.filter("is_seed").count()
    n_prop = labeled.filter("label IS NOT NULL AND NOT is_seed").count()
    print(f"labels: {n_seed} seeds -> +{n_prop} propagated")

    # 4. label-noise scan over the propagated labels: low agreement =
    # probable mislabel (none planted here, so scores stay high)
    full = emb.drop("label").join(
        labeled.select(F.col("id").alias("vec_id"), "label"), "vec_id"
    )
    print("lowest kNN label agreement:")
    S.label_agreement(full, k=5).orderBy("agreement").show(3)

    # 5. per-class centroid-distance outliers
    print("per-class outliers (|z| > 3):")
    S.embedding_outliers(full).filter("is_outlier").show()

    # 6. semantic dedup: the near-copy of vec 0 is pruned, keeper kept
    keep = {r.id: r.keep for r in S.semantic_dedup(
        emb, tau=0.98, n_clusters=3, nprobe=2
    ).collect()}
    print("semantic dedup: vec 0 kept =", keep[0], "| copy 999 kept =",
          keep[999])

    # 7. diversity-first exemplars: greedy k-center covers all 3
    # clusters in the first 3 picks (uniform sampling wouldn't)
    picks = S.kcenter_select(emb, k=4).orderBy("pick_order").collect()
    print("k-center picks:", [(r.pick_order, r.id) for r in picks])

    # 8. export form: int8 quantization (per-dim symmetric scales) —
    # reconstruction MSE rides along per vector
    print("quantized export sample:")
    S.quantize_embeddings(emb).select(
        "id", "mse"
    ).orderBy(F.desc("mse")).show(3)

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
