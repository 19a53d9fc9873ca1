"""Distributed connected components for dedup keeper assignment.

minhash_lsh_dedup's default single-hop keeper (keeper = min neighbor)
misses transitive chains A~B~C where A-C is not itself an edge. This
module provides the full iterative pass: min-label propagation to a
fixed point, the standard Spark formulation (each round is one shuffle
on node id; lineage is cut per round with localCheckpoint so plans stay
flat). Rounds needed = graph diameter — near-dup graphs are
shallow (clusters of near-identical docs), so this converges in 2-3
rounds in practice.

Reference has no graph ops; this extends SURVEY.md §2.7's dedup
pipeline to exact cluster semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (id, component) where component = min node id reachable.
    Converges when no label changes; raises if max_iter is exhausted
    (pathological diameter — raise max_iter or densify edges first).
    """
    # materialize the symmetrized edge list ONCE: it is joined in every
    # propagation round, and without a lineage cut each round would
    # re-run the (potentially expensive) upstream pipeline that
    # produced the edges — e.g. the full LSH candidate + verify plan
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed labels with round 1's result directly: min over (self,
    # neighbors) is one aggregation — same shuffle the plain
    # distinct-ids init would cost, but it saves a full propagation
    # round (each round = a join + agg + materialization job)
    labels = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.min(F.least("src", "dst")).alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over (own, neighbors' labels)
        neighbor = (
            sym.join(labels, sym.dst == labels.id)
            .select(F.col("src").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.select("id", "component")
            .union(neighbor)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def assign_keepers(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Transitive keeper assignment: every doc in a connected duplicate
    cluster maps to the cluster's min id. Returns
    (id, keeper_id, is_duplicate) over ALL docs in ``df``."""
    comp = connected_components(edges, src_col, dst_col)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            "id",
            F.coalesce("component", "id").alias("keeper_id"),
            (F.col("component").isNotNull() & (F.col("component") != F.col("id"))).alias(
                "is_duplicate"
            ),
        )
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    damping: float = 0.85,
    iters: int = 5,
) -> DataFrame:
    """Power-iteration PageRank over an undirected graph — the
    link-analysis centrality used as a document-quality signal in web
    corpus curation (a page referenced by many near-duplicates /
    similar pages concentrates rank). Simplified variant: dangling
    (edge-less) nodes keep only the teleport term, with no dangling-
    mass redistribution — the ordering signal quality scoring needs,
    with fixed ``iters`` so the result is a deterministic closed form
    an oracle can replay exactly.

    r_0 = 1/N; r_{k+1}(v) = (1-d)/N + d * sum_{u~v} r_k(u)/deg(u).

    Scale shape: each iteration is ONE shuffle — contributions project
    scan-local (rank/deg along the symmetrized edge list) and reduce
    on the destination id; the rank frame is localCheckpoint'ed per
    round so plans stay flat and the edge frame materializes once.
    Returns (id, rank) with rank rounded to 6dp.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    ids = nodes.select(F.col(id_col).alias("id")).distinct()
    n = ids.count()
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    base = F.lit((1.0 - damping) / n)
    rank = ids.select("id", F.lit(1.0 / n).alias("r")).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        contrib = (
            sym.join(rank, sym.src == rank.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        rank = (
            ids.join(contrib, "id", "left")
            .select(
                "id",
                (
                    base
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("id", F.round("r", 6).alias("rank"))
