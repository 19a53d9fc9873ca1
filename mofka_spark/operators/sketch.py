"""Mergeable sketch aggregates with correctness gates.

The 100 TB pattern for "how many distinct X" is NOT countDistinct —
an exact distinct shuffles every distinct key to its group. The
production path is a mergeable sketch: build small fixed-size HLL
sketches close to the data (per file / per day / per fine-grained
group), store or cache them, and answer coarse rollups by UNIONING
sketches without ever rescanning the corpus. Spark 3.5+ ships the
Apache DataSketches HLL family as native aggregates
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate), so the whole
pipeline stays JVM-side and codegen'd — no UDFs.

The reference has no approximate aggregates (its only aggregation is
the events-per-partition counter, /root/reference/src/
DefaultPartitionManager.hpp:208); these operators extend SURVEY.md
§2.7's aggregation row with the scale-path variants.

Gate design: approximate answers can't hash-match an exact oracle, so
— like the ANN recall gates in similarity.py — each operator here has
a *_gate form that emits the EXACT answer (oracle-checkable) plus a
boolean asserting the sketch landed within its error bound. The gate
makes the sketch's accuracy itself part of the correctness surface:
a broken sketch flips the boolean and the hash mismatch flags it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hll_distinct_rollup(
    df: DataFrame,
    fine_cols: list[str | Column],
    coarse_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Two-level distinct count: HLL sketches at ``fine_cols``
    granularity, merged up to ``coarse_cols`` by sketch union.

    This is the reaggregation shape that makes sketches pay at scale:
    the fine sketches are computed once (map-side partial aggregation,
    shuffle carries one ~2^lg_k-byte sketch per fine group, not keys)
    and every coarser rollup is a union over sketches — the corpus is
    never rescanned. Standard error ~= 1.04 / sqrt(2^lg_k), so
    lg_k=12 gives ~1.6%.

    Returns coarse_cols + (approx_distinct: long).
    """
    sketches = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk")
    )
    return sketches.groupBy(*coarse_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    )


def distinct_count_gate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    fine_col: Column,
    lg_k: int = 12,
    tol: float = 0.05,
) -> DataFrame:
    """Exact distinct count per group + a boolean asserting the
    two-level HLL rollup agrees within ``tol`` relative error.

    The exact branch exists FOR the gate (and small groups); at corpus
    scale the rollup is the answer and the exact branch is the thing
    you no longer run. tol defaults to ~3x the lg_k=12 standard error.

    Returns group_cols + (exact_distinct: long, sketch_ok: boolean).
    """
    approx = hll_distinct_rollup(
        df, [*group_cols, fine_col.alias("__fine")], group_cols, value_col, lg_k
    )
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(value_col).alias("exact_distinct")
    )
    err = F.abs(F.col("approx_distinct") - F.col("exact_distinct")) / F.greatest(
        F.col("exact_distinct").cast("double"), F.lit(1.0)
    )
    return (
        exact.join(approx, group_cols)
        .select(*group_cols, "exact_distinct", (err <= tol).alias("sketch_ok"))
    )


def quantile_gate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10000,
    rank_tol: float = 0.01,
) -> DataFrame:
    """Exact per-group quantiles + a boolean asserting approx_percentile
    lands inside the exact value envelope [q - rank_tol, q + rank_tol].

    approx_percentile (Greenwald-Khanna) guarantees rank error
    <= 1/accuracy; the gate converts that to a checkable VALUE bound by
    bracketing with exact quantiles at q +/- rank_tol. Exact percentile
    buffers each group's values (fine for bounded groups / the gate);
    the production path at 100 TB is the approx aggregate, whose state
    is O(accuracy) per group regardless of input size.

    Returns group_cols + (p_<q> rounded 6dp per q, approx_ok: boolean).
    """
    exact_cols = [
        F.round(F.percentile(value_col, F.lit(q)), 6).alias(f"p_{int(q * 100)}")
        for q in qs
    ]
    lo_hi = []
    for q in qs:
        lo_hi.append(F.percentile(value_col, F.lit(max(q - rank_tol, 0.0))))
        lo_hi.append(F.percentile(value_col, F.lit(min(q + rank_tol, 1.0))))
    approx = [F.approx_percentile(value_col, F.lit(q), F.lit(accuracy)) for q in qs]
    ok = F.lit(True)
    for i, _q in enumerate(qs):
        ok = ok & approx[i].between(lo_hi[2 * i], lo_hi[2 * i + 1])
    return df.groupBy(*group_cols).agg(*exact_cols, ok.alias("approx_ok"))


def heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    k: int = 20,
    m_per_partition: int = 1024,
) -> DataFrame:
    """Exact top-k frequent items WITHOUT a full-vocabulary shuffle,
    with a per-call certificate that the answer is exact.

    The classic distributed heavy-hitters shape (local summaries ->
    candidate merge -> exact recount):

    1. Per input partition, an Arrow map stage counts items locally and
       keeps only its top ``m_per_partition``, plus one residual row
       recording the largest count it DROPPED. Nothing shuffles yet;
       Python sees each partition once.
    2. The kept rows (m x P, independent of vocabulary size) aggregate
       into a candidate set; the residual rows sum into ``slack`` = the
       maximum possible total of an item that appears in NO partition's
       top-m.
    3. One more scan recounts the candidates exactly (broadcast
       semi-join -> groupBy over candidate rows only), and the top-k of
       those exact counts is returned with
       ``guaranteed = (k-th count >= slack)``: any non-candidate is
       bounded by slack, so when the flag is true the top-k is provably
       the global exact answer. A false flag says m was too small for
       this skew — raise m, don't trust the list.

    Contrast with a plain groupBy(item).count(): that shuffles one row
    per distinct item per map partition — for web-scale n-gram vocab
    (hapax-heavy Zipf tail) the tail dominates the exchange. Here the
    exchange carries m*P + |candidates| rows regardless of how long the
    tail is; the tail dies in the map stage.

    Returns (item, cnt, rnk, guaranteed), rnk 1..k ordered by
    (cnt DESC, item ASC) — deterministic under count ties.
    """
    import pandas as pd

    def local_topm(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            for it, c in vc.items():
                counts[it] = counts.get(it, 0) + int(c)
        if not counts:
            return
        s = pd.Series(counts).sort_values(ascending=False)
        kept, dropped = s.iloc[:m_per_partition], s.iloc[m_per_partition:]
        out = pd.DataFrame(
            {item_col: kept.index.astype(str), "cnt": kept.to_numpy("int64")}
        )
        out.loc[len(out)] = [None, int(dropped.iloc[0]) if len(dropped) else 0]
        yield out

    spark = items.sparkSession
    local = items.select(item_col).mapInPandas(
        local_topm, f"{item_col} string, cnt long"
    )
    # localCheckpoint: reclaimed on GC, not a session-cache leak
    local = local.localCheckpoint(eager=True)
    slack = (
        local.filter(F.col(item_col).isNull()).agg(F.sum("cnt")).collect()[0][0] or 0
    )
    candidates = (
        local.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    )
    exact = (
        items.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(item_col))
        .limit(k)
    )
    # strict >: a non-candidate's total is <= slack, and at exact
    # equality the (cnt DESC, item ASC) tie-break could still prefer
    # it — only a strictly larger k-th count certifies the list.
    # slack == 0 (no partition dropped anything) certifies trivially.
    # partitionBy(lit) not a bare orderBy: the frame is <= k rows (the
    # limit above), but an empty partition spec still trips Spark's
    # move-all-data-to-one-partition warning on every run
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("cnt"), F.asc(item_col))
    return exact.withColumn("rnk", F.row_number().over(w).cast("long")).withColumn(
        "guaranteed", F.min("cnt").over(Window.partitionBy(F.lit(1))) > F.lit(slack)
    )


def robust_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier flags per group: value outside
    [q1 - k*IQR, q3 + k*IQR] of its group's EXACT quartiles.

    The robust complement of z-scoring (quartiles don't move under the
    outliers being hunted). Exact percentile state is O(values) per
    group, so this operator is for BOUNDED group cardinality (event
    types, languages, domains); at unbounded scale use value_quantiles'
    approx_percentile path and accept the rank-envelope error bound.
    The per-group stats frame is one row per group — broadcast back, so
    the data side stays a single scan plus one map-side join.
    """
    stats = df.groupBy(*key_cols).agg(
        F.percentile(value_col, F.lit(0.25)).alias("_q1"),
        F.percentile(value_col, F.lit(0.75)).alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    lo, hi = F.col("_q1") - k * iqr, F.col("_q3") + k * iqr
    return (
        df.join(F.broadcast(stats), key_cols)
        .withColumn(
            "is_outlier", (F.col(value_col) < lo) | (F.col(value_col) > hi)
        )
        .withColumn("fence_lo", F.round(lo, 6))
        .withColumn("fence_hi", F.round(hi, 6))
        .drop("_q1", "_q3")
    )


def group_zscores(
    df: DataFrame,
    value_col: str,
    group_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group z-score normalization: z = (v - mean_g) / stddev_g
    with the sample standard deviation — the feature-scaling pass a
    training pipeline runs over numeric columns before mixing sources
    whose value ranges differ.

    Scale shape: the group statistics reduce to ONE row per group
    (partial aggregation map-side) and broadcast back onto the scan;
    the normalized output is a pure map stage — no window, no sort,
    two scans of a pruned (group, value) projection. Degenerate groups
    (stddev 0 or a single row) emit z = 0 rather than null/inf."""
    keep = keep_cols or []
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    z = F.when(
        F.col("_sd").isNull() | (F.col("_sd") == 0.0), F.lit(0.0)
    ).otherwise((F.col(value_col) - F.col("_mu")) / F.col("_sd"))
    return (
        df.join(F.broadcast(stats), group_col)
        .select(group_col, *keep, value_col, F.round(z, 6).alias("z"))
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col,
    qs: list[float] | None = None,
) -> DataFrame:
    """Exact weighted quantiles per group: the smallest value whose
    cumulative weight fraction reaches q — the weighted companion to
    quantile_gate's unweighted forms (token-weighted length medians,
    importance-weighted score cuts; weights are first-class in
    curation, where a "document" can stand for 1 or 10^4 samples).

    ``weight_col`` is a column name or Column expression; rows with
    NULL values or non-positive weights are excluded. Returns
    (group, q, wq) for each q in ``qs`` (default quartiles + p90).

    Semantics on ties: the cumulative sum runs over a RANGE frame
    (ORDER BY value), so every copy of a tied value shares the
    cumulative weight of the whole tie group — the standard weighted-
    quantile definition, and identical across engines because RANGE
    UNBOUNDED PRECEDING .. CURRENT ROW is the default ordered-window
    frame in both.

    Scale shape: ONE group-keyed shuffle + in-partition sort shared by
    the cumulative and total windows (same Window partitioning); the
    per-q picks are conditional MIN aggregates over the same pass, and
    the unpivot is O(#groups x #qs). No driver-side collection."""
    qs = qs or [0.25, 0.5, 0.75, 0.9]
    wt = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # weights stay DOUBLE: a long cast would silently truncate the
    # fractional importance weights the docstring advertises (0.5
    # passes the wt > 0 filter, then becomes 0 — every quantile NULL)
    base = df.filter(F.col(value_col).isNotNull() & (wt > 0)).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
        wt.cast("double").alias("wt"),
    )
    cum = F.sum("wt").over(Window.partitionBy("g").orderBy("v"))
    tot = F.sum("wt").over(Window.partitionBy("g"))
    cf = base.select("g", "v", (cum / tot).alias("cf"))
    picks = cf.groupBy("g").agg(
        *[
            F.min(F.when(F.col("cf") >= q, F.col("v"))).alias(f"_q{i}")
            for i, q in enumerate(qs)
        ]
    )
    stack = ", ".join(f"{q}D, _q{i}" for i, q in enumerate(qs))
    return picks.selectExpr(
        f"g AS {group_col}",
        f"stack({len(qs)}, {stack}) AS (q, wq)",
    )


def distinct_overlap(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 12,
    tol: float = 0.1,
) -> DataFrame:
    """Pairwise audience overlap between groups via mergeable HLL
    sketches and inclusion-exclusion:

        |A ∩ B| ≈ |A| + |B| - |A ∪ B|

    (the union sketch is exact over registers, so the estimate's error
    is the two HLL standard errors — fine for the "how much do these
    cohorts / sources / event types share" observability question; an
    exact answer is one COUNT DISTINCT semi-join away when a pair
    matters). Returns (group_a, group_b, exact_overlap, sketch_ok)
    for ordered pairs group_a < group_b; ``sketch_ok`` asserts the
    estimate is within max(``tol`` relative error, a 3-sigma absolute
    slack scaled to the SET sizes, 1) of exact — inclusion-exclusion
    error tracks |A|+|B|, not the overlap, so small overlaps between
    large sets are judged by the absolute bound. The exact branch
    (and the per-group exact distinct that sizes the slack) exists
    FOR the gate; the sketch path is the one that scales.

    Scale shape: one aggregation pass builds one ~2^lg_k-byte sketch
    per group (map-side partial agg; the gate's exact-distinct shares
    the same pass at Expand cost); the pair matrix is a self-join of
    the O(#groups) sketch frame — the values are never rescanned or
    shuffled per pair. Exact branch: one distinct + one pair join of
    distinct value sets (gate-scale only)."""
    sk = df.groupBy(group_col).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sk"),
        F.countDistinct(value_col).alias("_n"),
    )
    a = sk.select(
        F.col(group_col).alias("group_a"),
        F.col("sk").alias("_ska"),
        F.col("_n").alias("_na"),
    )
    b = sk.select(
        F.col(group_col).alias("group_b"),
        F.col("sk").alias("_skb"),
        F.col("_n").alias("_nb"),
    )
    est = (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            "_na",
            "_nb",
            (
                F.hll_sketch_estimate("_ska")
                + F.hll_sketch_estimate("_skb")
                - F.hll_sketch_estimate(
                    F.hll_union("_ska", "_skb")
                )
            ).alias("_est"),
        )
    )
    vals = df.select(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).distinct()
    exact = (
        vals.alias("x")
        .join(
            vals.alias("y"),
            (F.col("x.v") == F.col("y.v"))
            & (F.col("x.g") < F.col("y.g")),
        )
        .groupBy(
            F.col("x.g").alias("group_a"), F.col("y.g").alias("group_b")
        )
        .agg(F.count("*").cast("long").alias("exact_overlap"))
    )
    # inclusion-exclusion error scales with the SET SIZES, not the
    # overlap (three HLL estimates, sd ~ 1.04/sqrt(2^lg_k) each), so
    # the gate allows max(relative tol, a 3-sigma absolute slack on
    # na + nb). Zero-overlap pairs coalesce to 0 FIRST so the slack
    # applies to them too rather than being bypassed.
    exact0 = F.coalesce(F.col("exact_overlap"), F.lit(0)).cast("long")
    hll_slack = F.lit(3 * 1.04 / float((1 << lg_k) ** 0.5)) * (
        F.col("_na") + F.col("_nb")
    )
    ok = F.abs(F.col("_est") - exact0.cast("double")) <= F.greatest(
        F.lit(tol) * exact0.cast("double"), hll_slack, F.lit(1.0)
    )
    return (
        est.join(exact, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            exact0.alias("exact_overlap"),
            ok.alias("sketch_ok"),
        )
    )


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of the key frequency distribution: a
    depth x width counter table as (r, c, cnt) rows — the classic
    Cormode-Muthukrishnan frequency summary for "how often does key X
    occur" over a stream/corpus far too large to hold exact per-key
    counts (heavy-hitter prefilters, frequency-weighted sampling,
    join-skew probes). Estimates only ever OVERcount: est(key) >=
    true(key) always; overshoot is bounded by e*N/width with
    probability 1 - e^-depth.

    Counters are plain sums, so sketches MERGE by adding cell-wise —
    the shard/epoch-parallel shape exact per-key counts lack at
    unbounded key cardinality (the store stays depth x width cells no
    matter how many keys exist). ``weight_col`` switches from
    occurrence counts to summed integer weights.

    The hash family reuses the engine-portable md5 kernel
    (sampling.hash_bucket with salt "cms{r}#"), so an ANSI-SQL oracle
    computes the IDENTICAL cells and estimates hash-match exactly —
    including collision overshoot (the distinct_users_sketch gate
    philosophy: determinism makes even approximation exact).

    Scale shape: one scan; each row fans out to ``depth`` thin (r, c)
    pairs inside the row (array explode, no join), then ONE
    (r, c)-keyed partial aggregate whose output is capped at
    depth x width rows regardless of corpus size. Map-side combine
    collapses hot keys before the shuffle."""
    from mofka_spark.operators.sampling import hash_bucket

    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                hash_bucket(
                    F.col(key_col), salt=f"cms{r}#", mod=width
                ).cast("int").alias("c"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("p"), w.alias("_w"))
        .groupBy(
            F.col("p.r").cast("int").alias("r"), F.col("p.c").alias("c")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point frequency estimates from a count_min_build sketch:
    est(key) = min over rows r of cell[r][hash_r(key)], with absent
    cells reading 0 (keys the sketch never saw estimate 0 unless every
    one of their cells collides). Returns (key_col, est).

    Scale shape: the sketch is <= depth x width rows (a few KB) and
    BROADCASTS onto the probe side, so estimation is a map-only stage
    over any probe volume; the per-key min folds depth rows."""
    from mofka_spark.operators.sampling import hash_bucket

    pos = probes.select(F.col(key_col)).distinct()
    pos = pos.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        hash_bucket(F.col(key_col), salt=f"cms{r}#", mod=width)
                        .cast("int")
                        .alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.r").alias("r"), F.col("p.c").alias("c"))
    return (
        pos.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
        )
    )


def bottomk_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salt: str = "bk",
) -> DataFrame:
    """Bottom-k (KMV) distinct-count estimation: hash each distinct
    value to u in (0, 1], keep each group's k smallest, estimate
    D = (k-1)/u_(k). The engine-portable member of the sketch family:
    where HLL's estimate is gated by a tolerance boolean
    (distinct_count_gate), the bottom-k estimate is a pure function of
    the md5 hash family, so an external engine computes the IDENTICAL
    estimate and the gate hash-matches exactly — approximation without
    non-determinism (the weighted_sample / streaming-reservoir
    philosophy applied to cardinality).

    Groups with fewer than k distinct values return their exact count
    (the estimator needs a k-th order statistic to exist). Mergeable:
    bottom-k of a union is the k smallest of the merged bottom-k sets
    — the same algebra streaming/sample.py exploits, so shard partials
    are k rows per group. Relative error ~ 1/sqrt(k-2).

    Returns (group_col, est_distinct: double rounded 4dp). Scale
    shape: one distinct exchange on (group, value) — values leave as
    48-bit hashes, never raw — then one group-keyed window over the
    thin (group, u) rows; no corpus-width columns move."""
    from mofka_spark.operators.sampling import hash_bucket

    mod = 1 << 48  # md5's 12 leading hex chars, full range
    u = (
        hash_bucket(F.col(value_col), salt, mod=mod).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(mod))
    d = (
        df.select(F.col(group_col), F.col(value_col))
        .filter(F.col(value_col).isNotNull())
        .distinct()
        .select(group_col, u.alias("_u"))
    )
    w = Window.partitionBy(group_col).orderBy("_u")
    ranked = d.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = ranked.groupBy(group_col).agg(
        F.count("*").cast("long").alias("_n"),
        F.max(F.when(F.col("_rn") == k, F.col("_u"))).alias("_uk"),
    )
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("_uk"))
    return agg.select(group_col, F.round(est, 4).alias("est_distinct"))
