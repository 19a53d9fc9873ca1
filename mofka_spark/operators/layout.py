"""Data layout for scan pruning: clustered writes + skipping metrics.

At 100 TB the cheapest bytes are the ones never read. Parquet stores
min/max statistics per row group; a scan with a pushed-down predicate
skips row groups whose stats exclude it. Those stats are only
selective if the writer CLUSTERED the data — a random layout gives
every row group nearly the full value range and nothing skips.

This module provides the write-side half (range-partition + sort
within partitions on the cluster keys, optionally through a Z-order
interleave for multi-column predicates) and the measurement half
(row-group stats + a pruning ratio for a hypothetical predicate,
computed from footers only — no data read). The reference has no
analog: its log is strictly arrival-ordered (SURVEY.md §1.2); this is
the engine-side layout control an analytics store needs.

Everything is built-ins: repartitionByRange / sortWithinPartitions
are the Spark-native clustered-write idiom (AQE-compatible, no hints),
and the Z-key is a pure bit-interleave Column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative int)
    column into one Z-order key: locality in the key preserves
    locality in EVERY input dimension, so range-clustering on the key
    yields row groups selective for predicates on any single column.

    Callers pre-scale values into [0, 2^bits) — ranks, bucketed
    timestamps, quantized floats. Pure bitwise Column expression
    (bits x ncols shifts/ors, all codegen)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def _bucket_search(v: Column, cuts: list[float]) -> Column:
    """Equi-depth bucket index as a BINARY-SEARCH ``when`` tree:
    bucket(v) = |{i : v >= cuts[i]}| over the sorted cut array — the
    same count the previous 63-step ``aggregate`` fold computed, but in
    ceil(log2(len+1)) codegen'd comparisons per row instead of a
    len-step interpreted HOF fold (higher-order functions are
    CodegenFallback; measured 1.4 us/row at 63 cuts — the dominant cost
    of the whole z-order rewrite). NULL input: every ``when`` condition
    is NULL, so evaluation falls through the otherwise-chain to the
    leftmost leaf — bucket 0, exactly as the fold's
    ``when(v >= cut, 1).otherwise(0)`` summed NULLs to 0."""

    def build(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo).cast("long")
        mid = (lo + hi + 1) // 2
        return F.when(
            v >= F.lit(float(cuts[mid - 1])), build(mid, hi)
        ).otherwise(build(lo, mid - 1))

    return build(0, len(cuts))


def optimize_layout(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    zorder: bool = False,
    zorder_bits: int = 16,
    mode: str = "overwrite",
    zorder_scale: bool = True,
) -> None:
    """Clustered rewrite: range-partition into ``num_files`` spans of
    the cluster key and sort within each — every output file (and its
    row groups) then covers a narrow, non-overlapping key range, which
    is exactly what makes footer min/max stats selective.

    ``zorder=True`` clusters on the interleaved key instead, trading a
    little per-column selectivity for usable skipping on ALL cluster
    columns at once (the multi-dimensional case range-sorting can't
    serve: sorting by (a, b) leaves b unclustered across a-spans).

    ``zorder_scale`` (default on) EQUI-DEPTH scales every cluster
    column before interleaving: each value maps to its approximate
    quantile bucket (up to 256 cuts from ``approxQuantile``, a bounded
    driver-side array), so every dimension spreads UNIFORMLY over its
    key bits regardless of range or skew. Without it, dims interleave
    uselessly whenever ranges differ or mass concentrates — measured:
    user_id 0..1499 against value 0..560 left the value dimension with
    ZERO row-group skipping (the key's top bits came only from the
    wider column), and min-max scaling still left skewed values at
    ~6% skipping (the mass sat in the lowest buckets). The bucket map
    is monotone per dim, so footer stats on the RAW columns stay
    selective. Pass ``zorder_scale=False`` only when callers
    pre-scaled (ranks, quantized buckets).

    Scale shape: one range exchange (sampled boundaries) + local sort;
    the only driver-side data is the cut-point arrays (<= 256 doubles
    per column). The per-row bucket lookup folds into the scan as an
    binary-search ``when`` tree (log2 cuts comparisons) — codegen, no
    join, no UDF.
    """
    if zorder:
        key_cols: list[Column | str] = list(cluster_cols)
        if zorder_scale:
            # 64 equi-depth buckets per dim: file/row-group boundaries
            # only need a few joint bits of resolution, and each cut is
            # an inlined comparison in the key expression (256 cuts
            # measured 1.6x slower for no extra skipping at 16 files)
            n_cuts = min(64, 1 << zorder_bits)
            probs = [i / n_cuts for i in range(1, n_cuts)]
            # ONE pass computes every column's cut points. SQL
            # approx_percentile (not DataFrame.stat.approxQuantile):
            # same QuantileSummaries sketch, but as a codegen'd partial
            # aggregate over the columnar scan instead of the RDD
            # row-conversion path — measured 2.2s -> 0.85s cold /
            # 0.34s -> 0.27s warm at sf0.1, identical cut count. NULLs
            # are skipped by the aggregate exactly as approxQuantile
            # did; 1/n_cuts relative error (accuracy = n_cuts) is
            # plenty — the cuts only need to land each value in
            # roughly the right bucket of n_cuts, not at exact
            # quantiles.
            prob_arr = F.array(*[F.lit(p) for p in probs])
            cut_row = df.agg(
                *[
                    F.percentile_approx(
                        F.col(c).cast("double"), prob_arr, F.lit(n_cuts)
                    ).alias(f"_c{i}")
                    for i, c in enumerate(cluster_cols)
                ]
            ).collect()[0]  # bounded model state: <= 63 doubles per column
            all_cuts = [
                list(cut_row[i]) if cut_row[i] is not None else []
                for i in range(len(cluster_cols))
            ]
            key_cols = []
            for c, raw_cuts in zip(cluster_cols, all_cuts):
                cuts = sorted(set(raw_cuts))
                if not cuts:
                    # all-NULL column: no quantiles — the dim carries
                    # no clustering signal, pin its key contribution
                    key_cols.append(F.lit(0).cast("long"))
                    continue
                v = F.col(c).cast("double")
                bucket = _bucket_search(v, cuts)
                # low-cardinality dims dedup to few cuts; stretch the
                # bucket index back over the full bit span or the dim's
                # HIGH key bits stay constant and it stops clustering
                stretch = max(1, (1 << zorder_bits) // (len(cuts) + 1))
                key_cols.append(bucket * F.lit(stretch))
        # Two-step projection: materialize each dim's bucket value as a
        # named column BEFORE interleaving. zorder_key references every
        # key column once per bit (zorder_bits times), and inlining the
        # bucket search there would re-run its when-tree per bit
        # reference. CollapseProject keeps the split because the bucket
        # expressions are non-cheap (measured: key projection
        # 0.68s -> 0.54s warm at sf0.1 for the fold shape, in BOTH the
        # range-sample and shuffle-map passes).
        if zorder_scale and key_cols and not all(
            isinstance(c, str) for c in key_cols
        ):
            bnames = [f"__zb{i}" for i in range(len(key_cols))]
            keyed = df.select(
                "*", *[c.alias(n) for c, n in zip(key_cols, bnames)]
            )
            keyed = keyed.withColumn(
                "__zkey", zorder_key(bnames, zorder_bits)
            ).drop(*bnames)
        else:
            keyed = df.withColumn("__zkey", zorder_key(key_cols, zorder_bits))
        out = (
            keyed.repartitionByRange(num_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartitionByRange(num_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    out.write.mode(mode).parquet(path)


def rowgroup_stats(path: str, column: str) -> list[tuple]:
    """(file, row_group, min, max, n_rows) per row group, from footers
    only — the metadata a pruning scan consults."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    out.append(
                        (
                            os.path.basename(f),
                            rg,
                            col.statistics.min,
                            col.statistics.max,
                            g.num_rows,
                        )
                    )
    return out


def pruning_ratio(path: str, column: str, lo, hi) -> float:
    """Fraction of ROWS a range predicate ``column BETWEEN lo AND hi``
    can skip from footer stats alone (row groups whose [min, max] is
    disjoint from [lo, hi]). 0.0 = layout gives no skipping; values
    near the predicate's unselectivity are optimal."""
    stats = rowgroup_stats(path, column)
    total = sum(s[4] for s in stats)
    if not total:
        return 0.0
    skipped = sum(s[4] for s in stats if s[3] < lo or s[2] > hi)
    return skipped / total


def bucketize(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) managed table:
    the co-location contract that makes repeated joins and aggregations
    on ``bucket_cols`` SHUFFLE-FREE.

    At 100 TB the dominant cost of a fact-to-fact join is the exchange
    of both sides. Bucketing pays that exchange ONCE at write time:
    both tables hash-partition rows into num_buckets files per side,
    and every later equi-join or groupBy on the bucket key reads
    matching buckets pairwise — Catalyst drops the Exchange entirely
    (asserted in tests/test_plans.py::TestBucketedJoin). Pick
    num_buckets so a bucket of the LARGER table fits an executor's
    memory comfortably; both sides must use the same count for the
    pairwise read.

    Uses saveAsTable (bucket metadata lives in the session catalog —
    Spark's bucketing is a table property, not a directory layout).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
