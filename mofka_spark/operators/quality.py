"""Declarative data-quality constraint audit — the deequ-style
"expectations" pass a pipeline runs before trusting a table: not-null,
value ranges, set membership, regex shape, uniqueness — all evaluated
in ONE aggregate over a single scan, reported as (rule, violations).

The reference's only integrity surface is per-event validators at
ingest (P2-P4); this audits data at REST, where a 100 TB pipeline
actually discovers upstream breakage. FK checks live in the
fk_violations gate (broadcast anti-joins); this module covers the
single-table rules.

Scale shape: every rule compiles to an aggregate expression over the
same scan — N rules cost one pass, not N. Row-level rules are
conditional counts (map-side partial aggs); uniqueness is
count(col) - count(DISTINCT col) inside the same aggregate (Spark
plans multi-distinct via expand, still one scan). The one-row wide
result unpivots driver-side to (rule, violations) — O(#rules), not
data-sized.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "not_null", "in_range", "is_in", "matches", "no_match", "unique",
    "audit",
]


def not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where ``col`` is null."""
    return (
        f"not_null({col})",
        F.sum(F.col(col).isNull().cast("long")),
    )


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    c = F.col(col)
    return (
        f"in_range({col},{lo},{hi})",
        F.sum((c.isNotNull() & ~c.between(lo, hi)).cast("long")),
    )


def is_in(col: str, allowed: list) -> tuple[str, Column]:
    """Violations = non-null rows with a value outside ``allowed``."""
    c = F.col(col)
    return (
        f"is_in({col})",
        F.sum((c.isNotNull() & ~c.isin(allowed)).cast("long")),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Violations = non-null rows not FULLY matching ``pattern``
    (anchored, like DuckDB's regexp_full_match)."""
    c = F.col(col)
    return (
        f"matches({col})",
        F.sum((c.isNotNull() & ~c.rlike(f"^(?:{pattern})$")).cast("long")),
    )


def no_match(col: str, pattern: str) -> tuple[str, Column]:
    """Violations = non-null rows CONTAINING a match of ``pattern``
    (unanchored find — matches' complement direction): the
    contamination-style rule, e.g. no control bytes, no replacement
    chars, no secrets-shaped substrings. Distributive (a plain
    conditional sum), so it composes into the streaming audit
    monitor unchanged."""
    c = F.col(col)
    return (
        f"no_match({col})",
        F.sum((c.isNotNull() & c.rlike(pattern)).cast("long")),
    )


def unique(col: str) -> tuple[str, Column]:
    """Violations = non-null rows beyond the first of each value
    (count - count distinct)."""
    c = F.col(col)
    return (
        f"unique({col})",
        F.count(c) - F.countDistinct(c),
    )


def audit(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate every rule in one aggregate pass; returns
    (rule, violations) rows in rule order (violations: long)."""
    row = df.agg(
        *[expr.cast("long").alias(f"_r{i}") for i, (_, expr) in enumerate(rules)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.coalesce(F.col(f"_r{i}"), F.lit(0)).alias("violations"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return row.select(F.explode(pairs).alias("p")).select(
        "p.rule", "p.violations"
    )


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Single-pass column profile — the schema-drift / data-docs
    primitive: for every column, row count, null count, null ratio,
    and distinct count, as one aggregate over one scan unpivoted to
    (col_name, n_rows, n_nulls, null_ratio, n_distinct) rows.

    ``exact_distinct=False`` swaps COUNT(DISTINCT) for
    approx_count_distinct — the 100 TB default: N exact distincts in
    one aggregate force an Expand (one data replica per distinct
    column); the HLL form keeps the pass single-replica and the
    shuffle O(#columns * sketch). The exact form exists for the gate
    and for small frames.
    """
    columns = columns or df.columns
    dcount = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null{i}")
        )
        aggs.append(dcount(c).alias(f"_d{i}"))
    row = df.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").cast("long").alias("n_rows"),
                F.coalesce(F.col(f"_null{i}"), F.lit(0))
                .cast("long")
                .alias("n_nulls"),
                F.round(
                    F.coalesce(F.col(f"_null{i}"), F.lit(0))
                    / F.greatest(F.col("_n"), F.lit(1)),
                    6,
                ).alias("null_ratio"),
                F.col(f"_d{i}").cast("long").alias("n_distinct"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return row.select(F.explode(cells).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.null_ratio", "p.n_distinct"
    )


def inclusion_profile(
    frames: dict[str, DataFrame],
    columns: list[tuple[str, str]],
) -> DataFrame:
    """Pairwise inclusion coefficients between key-ish columns — the
    foreign-key DISCOVERY pass (constraint_audit / fk_violations check
    keys you already declared; this finds the candidates). For every
    ordered pair of distinct (table, column) entries:

        inclusion = |distinct(A) ∩ distinct(B)| / |distinct(A)|

    inclusion ~ 1.0 means A's values are contained in B — A is an FK
    candidate referencing B. Returns (from_table, from_col, to_table,
    to_col, n_from, n_common, inclusion) for every ordered pair,
    inclusion rounded to 6dp.

    ``columns`` lists (table_name, column_name); ``frames`` maps table
    names to DataFrames.

    Scale shape: ONE distinct per column (partial-agg shuffle of the
    column's values only — key columns, not rows), then per pair one
    co-partitioned join of two already-distinct value sets; counts
    only, output O(#pairs). Values compare as strings so heterogeneous
    key types (int FK -> string PK exports) still profile.
    """
    # each distinct set is materialized ONCE (localCheckpoint —
    # GC-bounded, not a session-cache leak): every column's set feeds
    # the sizes collect plus ~2(P-1) pair joins, which would otherwise
    # re-scan and re-distinct the source table per consumer
    sets = {}
    for tbl, col in columns:
        sets[(tbl, col)] = (
            frames[tbl]
            .select(F.col(col).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .localCheckpoint(eager=True)
        )
    sizes = {k: s.count() for k, s in sets.items()}
    spark = next(iter(frames.values())).sparkSession
    out = None
    for a in columns:
        for b in columns:
            if a == b:
                continue
            common = sets[tuple(a)].join(sets[tuple(b)], "v", "left_semi")
            row = common.agg(F.count("*").alias("n_common")).select(
                F.lit(a[0]).alias("from_table"),
                F.lit(a[1]).alias("from_col"),
                F.lit(b[0]).alias("to_table"),
                F.lit(b[1]).alias("to_col"),
                F.lit(int(sizes[tuple(a)])).cast("long").alias("n_from"),
                F.col("n_common").cast("long").alias("n_common"),
                F.round(
                    F.col("n_common")
                    / F.greatest(F.lit(int(sizes[tuple(a)])), F.lit(1)),
                    6,
                ).alias("inclusion"),
            )
            out = row if out is None else out.unionByName(row)
    if out is None:
        return spark.createDataFrame(
            [],
            "from_table string, from_col string, to_table string, "
            "to_col string, n_from long, n_common long, inclusion double",
        )
    return out


def corpus_report(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """Per-source corpus health report — the one-table summary a data
    curator reads before mixing sources: volume, exact-dup rate,
    length profile, punctuation load, language spread. Composes the
    existing primitives (dedup's content hash, text's token/char
    ratios) into one aggregation so the answer is a single small
    frame, not five separate jobs.

    Returns one row per stratum: (strata_col, n_docs,
    n_unique_content, dup_rate, avg_tokens, avg_chars,
    avg_punct_ratio, n_langs); ratios rounded to 4dp.

    Scale shape: ONE scan + one stratum-keyed aggregate; the content
    hash is a scan-local md5 projection and the distinct-count runs
    inside the same agg (swap for approx_count_distinct at corpus
    scale — same row shape, documented sketch trade). Output is
    O(#strata)."""
    from mofka_spark.operators.dedup import normalize_text

    col = F.col(text_col)
    n_chars = F.length(col)
    from mofka_spark.operators.text import _WS_CHARS

    n_tok = F.size(F.split(F.trim(col), f"[{_WS_CHARS}]+"))
    n_punct = F.length(F.regexp_replace(col, f"[A-Za-z0-9{_WS_CHARS}]", ""))
    base = df.filter(col.isNotNull()).select(
        F.col(strata_col).alias("stratum"),
        F.md5(normalize_text(col)).alias("_h"),
        n_tok.alias("_tok"),
        n_chars.alias("_chr"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("_pr"),
        *(
            [F.col(lang_col).alias("_lang")]
            if lang_col is not None
            else [F.lit(None).alias("_lang")]
        ),
    )
    return (
        base.groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("_h").cast("long").alias("n_unique_content"),
            F.round(
                1.0 - F.count_distinct("_h") / F.count("*"), 4
            ).alias("dup_rate"),
            F.round(F.avg("_tok"), 4).alias("avg_tokens"),
            F.round(F.avg("_chr"), 4).alias("avg_chars"),
            F.round(F.avg("_pr"), 4).alias("avg_punct_ratio"),
            F.count_distinct("_lang").cast("long").alias("n_langs"),
        )
        .withColumnRenamed("stratum", strata_col)
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_col: str | None = None,
    bins: int = 10,
    drift_threshold: float = 0.2,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and a
    current one — the standard production drift metric (credit-risk
    lineage, now the default "did this feature's distribution move"
    check): bin the value range, PSI = sum over bins of
    (p_cur - p_bin_ref) * ln(p_cur / p_ref). Rule of thumb: < 0.1
    stable, 0.1-0.2 moderate shift, > 0.2 drifted (the default
    ``drift_threshold``).

    Bins are ``bins`` equal-width slices of the REFERENCE min/max
    (current values outside clamp into the edge bins — out-of-range
    mass is exactly the drift signal). Probabilities floor at 1e-6 so
    empty bins contribute finite terms (the standard PSI smoothing);
    the per-group PSI folds its bin terms in BIN ORDER so the IEEE
    result is engine-reproducible (token_entropy discipline).

    Returns one row per group (or a single '_all' group): (group,
    n_ref, n_cur, psi rounded 6dp, drifted). Scale shape: one bounds
    aggregate over ref (O(#groups) rows, broadcast back), one
    (group, bin) count per side with map-side combine, and a
    #groups x bins-sized spine join — nothing corpus-sized shuffles
    except the two thin count passes."""
    g = F.col(group_col) if group_col is not None else F.lit("_all")
    v = F.col(value_col).cast("double")
    r = ref.filter(v.isNotNull()).select(g.alias("g"), v.alias("v"))
    c = cur.filter(v.isNotNull()).select(g.alias("g"), v.alias("v"))
    bounds = r.groupBy("g").agg(
        F.min("v").alias("_lo"), F.max("v").alias("_hi")
    )
    w = F.greatest(
        (F.col("_hi") - F.col("_lo")) / F.lit(float(bins)), F.lit(1e-12)
    )
    # clamp BEFORE the int cast: a zero-width reference range (width
    # floored at 1e-12) can put the raw bin index in the trillions,
    # which would CAST_OVERFLOW under ANSI
    bin_of = F.least(
        F.greatest(
            F.floor((F.col("v") - F.col("_lo")) / w),
            F.lit(0).cast("bigint"),
        ),
        F.lit(bins - 1).cast("bigint"),
    ).cast("int")

    def counted(side: DataFrame, name: str) -> DataFrame:
        return (
            side.join(F.broadcast(bounds), "g")
            .select("g", bin_of.alias("b"))
            .groupBy("g", "b")
            .agg(F.count("*").cast("long").alias(name))
        )

    spine = bounds.select(
        "g", F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("b")
    )
    per_bin = (
        spine.join(counted(r, "_nr"), ["g", "b"], "left")
        .join(counted(c, "_nc"), ["g", "b"], "left")
        .select(
            "g",
            "b",
            F.coalesce("_nr", F.lit(0)).alias("_nr"),
            F.coalesce("_nc", F.lit(0)).alias("_nc"),
        )
    )
    out_g = group_col if group_col is not None else "g"
    return psi_from_binned(per_bin, drift_threshold).withColumnRenamed(
        "g", out_g
    )


def psi_from_binned(
    per_bin: DataFrame, drift_threshold: float = 0.2
) -> DataFrame:
    """The PSI core over already-binned counts — (g, b, _nr, _nc)
    rows covering every bin of every group (zeros included). Shared by
    psi_drift (bins raw snapshots) and the streaming histogram store's
    drift reader (bins already live in the store). Probabilities floor
    at 1e-6; the per-group fold runs in BIN ORDER (engine-reproducible
    IEEE sum). Returns (g, n_ref, n_cur, psi rounded 6dp, drifted)."""
    totals = per_bin.groupBy("g").agg(
        F.sum("_nr").cast("long").alias("n_ref"),
        F.sum("_nc").cast("long").alias("n_cur"),
    )
    # a side with ZERO rows for a group (e.g. the group vanished from
    # the current snapshot) has no defined probabilities; every bin
    # takes the 1e-6 floor, which yields the maximal finite PSI — the
    # right signal for "this group disappeared" — instead of an ANSI
    # DIVIDE_BY_ZERO.
    pr = F.greatest(
        F.when(
            F.col("n_ref") > 0,
            F.col("_nr").cast("double") / F.col("n_ref"),
        ).otherwise(F.lit(0.0)),
        F.lit(1e-6),
    )
    pc = F.greatest(
        F.when(
            F.col("n_cur") > 0,
            F.col("_nc").cast("double") / F.col("n_cur"),
        ).otherwise(F.lit(0.0)),
        F.lit(1e-6),
    )
    term = (pc - pr) * F.log(pc / pr)
    folded = (
        per_bin.join(F.broadcast(totals), "g")
        .groupBy("g", "n_ref", "n_cur")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("b"), term.alias("t")))
                    ),
                    lambda s: s.getField("t"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_psi")
        )
    )
    return folded.select(
        "g",
        "n_ref",
        "n_cur",
        F.round(F.col("_psi"), 6).alias("psi"),
        (F.col("_psi") > drift_threshold).alias("drifted"),
    )


def blend_scores(
    df: DataFrame,
    signals: dict[str, float],
    key_col: str = "doc_id",
    signal_round: int | None = 6,
    distinct_threshold: int = 65536,
) -> DataFrame:
    """Rank-normalized quality blending: each signal column is mapped
    to its exact empirical percentile (SQL PERCENT_RANK — ties share
    the tie group's minimum rank; rank_below / (n-1)), then the
    percentiles combine as a weighted sum in the given signal order.
    The standard way to fuse scale-incompatible quality signals
    (an LM score, a token count, a punctuation ratio) into one
    sortable score without hand-tuned clamps; negative weights turn a
    signal into a penalty.

    Rows with a NULL or NaN in ANY signal have no defined rank and are
    excluded. Returns (key, pr_<signal>..., blended) with blended
    rounded to 6dp (signed-zero normalized — an all-negative-weight
    blend can round to -0.0).

    Scale shape: NO corpus-wide sort. Per signal, a (value, count)
    aggregate collapses the corpus map-side to its distinct values;
    the running-count window that turns counts into ranks orders THAT
    frame, so its cost is O(#distinct values). For integer-typed
    signals that is naturally bounded; floating-point signals are
    quantized BY CONSTRUCTION to ``signal_round`` decimal digits of
    resolution (ranking key = ``floor(sig * 10^signal_round)``), so
    the distinct map is bounded by value range x resolution, never by
    corpus size — a continuous LM score over 100 TB of documents still
    collapses to at most ~1e6 buckets per unit of range. floor (not
    round) because IEEE floor is bit-identical across engines while
    round half-way tie-breaking is not; values that collide in a
    bucket share the tie group's minimum rank, the exact PERCENT_RANK
    semantics over the quantized values. ``signal_round=None``
    restores raw-value ranking (exact at any cardinality: above
    ``distinct_threshold`` distinct values the running count switches
    from a single window over the small map to a distributed prefix
    sum — range partitions + per-partition sums + broadcast bases —
    so a corpus-cardinality distinct frame never single-tasks). Each
    percentile map joins back on its (quantized) key (AQE broadcasts
    the genuinely small maps). n is one scalar aggregate."""
    from pyspark.sql.types import DoubleType, FloatType

    if not signals:
        raise ValueError("blend_scores: signals must be non-empty")
    cond = None
    for sig in signals:
        sd = F.col(sig).cast("double")
        # non-FINITE rows are excluded, same as NULL/NaN: +/-Inf
        # would otherwise reach the quantizer, where pmod(inf, 1.0)
        # turns the rank key into NaN and the row silently collapses
        # into one NaN bucket instead of ranking at the extreme
        # (ADVICE r9)
        c = (
            F.col(sig).isNotNull()
            & ~F.isnan(sd)
            & (F.abs(sd) != F.lit(float("inf")))
        )
        cond = c if cond is None else (cond & c)
    obs = df.filter(cond).select(key_col, *signals)
    fields = {f.name: f.dataType for f in obs.schema.fields}

    def _rank_key(sig: str):
        if signal_round is not None and isinstance(
            fields[sig], (DoubleType, FloatType)
        ):
            # floor computed IN THE DOUBLE DOMAIN: Spark's floor()
            # returns LongType and overflows for |scaled| > 2^63
            # (signals beyond ~9.2e12 at signal_round=6), silently
            # diverging from an external engine's double floor().
            # x - pmod(x, 1.0) IS the exact IEEE floor for finite
            # doubles (fmod by 1.0 is exact, the subtraction result is
            # integral and representable) and stays a double at any
            # magnitude (|x| >= 2^53 is already integral, remainder 0).
            scaled = F.col(sig) * F.lit(float(10 ** signal_round))
            return scaled - F.pmod(scaled, F.lit(1.0))
        return F.col(sig)

    # Materialize the narrow (key, quantized-signal) projection ONCE:
    # it is read 2+#signals times (the n count, each per-signal
    # distinct-value map, the final join-back), and without a
    # checkpoint Spark re-evaluates the upstream signal expressions
    # (often regexp tokenization over the full text) for every branch.
    # The projection is k longs per row — tiny next to the corpus —
    # and the checkpoint is GC-bounded, same discipline as
    # containment_candidates (dedup.py). _spread first: a narrow
    # parquet input would otherwise run the CPU-bound signal compute
    # on a handful of tasks.
    from mofka_spark.operators.dedup import _spread

    obs = _spread(
        obs.select(
            key_col, *[_rank_key(s).alias(f"_q_{s}") for s in signals]
        ),
        key_col,
    ).localCheckpoint(eager=True)
    n = obs.count()
    denom = float(n - 1) if n > 1 else 1.0  # n==1: percent_rank = 0
    out = obs
    for sig in signals:
        q = f"_q_{sig}"
        counts = obs.groupBy(q).agg(F.count("*").alias("_c"))
        # The running-count window orders the DISTINCT-value frame.
        # Quantized signals keep that frame small, and a single-
        # partition window over it is the cheapest exact plan — but a
        # continuous signal at 6dp (or signal_round=None) can have
        # near-corpus-cardinality distinct values, and an unpartitioned
        # Window then single-tasks the whole map. Probe the cardinality
        # (bounded: limit k+1 on the already-aggregated frame) and
        # switch to the distributed prefix sum (the
        # curriculum_select/_rank_by_id decomposition: range-partition
        # in value order, per-partition running sums, <= #partitions
        # totals to the driver, broadcast cumulative bases) above the
        # threshold. Both paths compute the identical exact rank.
        nd = counts.limit(distinct_threshold + 1).count()
        if nd <= distinct_threshold:
            w = Window.orderBy(F.col(q).asc()).rowsBetween(
                Window.unboundedPreceding, -1
            )
            pr_map = counts.select(
                q,
                (
                    F.coalesce(F.sum("_c").over(w), F.lit(0)).cast("double")
                    / F.lit(denom)
                ).alias(f"pr_{sig}"),
            )
        else:
            n_ranges = df.sparkSession.sparkContext.defaultParallelism
            # localCheckpoint freezes _pid: the frame is read twice
            # (totals collect + the join below) and RangePartitioner
            # re-sampling on a recompute could re-draw range bounds.
            # GC-bounded, same discipline as curriculum_select.
            ranged = (
                counts.repartitionByRange(n_ranges, F.col(q).asc())
                .withColumn("_pid", F.spark_partition_id())
                .localCheckpoint(eager=True)
            )
            wloc = Window.partitionBy("_pid").orderBy(
                F.col(q).asc()
            ).rowsBetween(Window.unboundedPreceding, -1)
            local = ranged.withColumn(
                "_prior", F.coalesce(F.sum("_c").over(wloc), F.lit(0))
            )
            ptotals = (
                local.groupBy("_pid").agg(F.sum("_c").alias("_t")).collect()
            )
            bases: dict[int, int] = {}
            acc = 0
            for r in sorted(ptotals, key=lambda r: r["_pid"]):
                bases[r["_pid"]] = acc
                acc += r["_t"]
            base_col = F.create_map(
                *[F.lit(x) for kv in bases.items() for x in kv]
            )
            pr_map = local.select(
                q,
                (
                    (base_col[F.col("_pid")] + F.col("_prior")).cast("double")
                    / F.lit(denom)
                ).alias(f"pr_{sig}"),
            )
        out = out.join(pr_map, q)
    blended = None
    for sig, wt in signals.items():
        term = F.lit(float(wt)) * F.col(f"pr_{sig}")
        blended = term if blended is None else (blended + term)
    return out.select(
        key_col,
        *[F.col(f"pr_{s}") for s in signals],
        (F.round(blended, 6) + F.lit(0.0)).alias("blended"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: every row whose
    QI combination is shared by fewer than ``k`` rows is re-identifiable
    by joining the quasi-identifiers against an external dataset — the
    release-readiness check run before training data leaves a privacy
    boundary (the group-size complement of pii_scan's pattern matching).

    Returns one row per QI group: (qi..., group_size, at_risk) with
    at_risk = group_size < k. With ``sensitive_col``, adds
    n_sensitive_distinct (distinct sensitive values in the group) and
    diverse = n_sensitive_distinct >= min(k, group_size) — the
    l-diversity refinement (a k-anonymous group whose members all share
    one sensitive value still leaks it).

    Scale shape: ONE QI-keyed aggregate with map-side combine;
    count_distinct is the standard two-phase expand under the same
    shuffle. Integer-only output — no float edge anywhere."""
    if not qi_cols:
        raise ValueError("k_anonymity: qi_cols must be non-empty")
    aggs = [F.count("*").cast("long").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col))
            .cast("long")
            .alias("n_sensitive_distinct")
        )
    out = df.groupBy(*qi_cols).agg(*aggs)
    out = out.withColumn("at_risk", F.col("group_size") < k)
    if sensitive_col is not None:
        out = out.withColumn(
            "diverse",
            F.col("n_sensitive_distinct")
            >= F.least(F.lit(k), F.col("group_size")),
        )
    return out


# --- Batched classifier inference ----------------------------------------

#: Stopword inventory the default scorer shares with the language-ID
#: heuristic's English row (text.LANG_STOPWORDS["en"]).
_SCORER_STOPWORDS = ("the", "and", "of", "to", "in")
_SCORER_PUNCT = ".,!?;:"
#: non-whitespace char class over RE2's \s — the engine-portable \S
#: (see default_text_scorer's docstring). NO \x0b: RE2 (the DuckDB
#: oracle) does not treat vertical tab as whitespace; built from the
#: repo-wide text._WS_CHARS definition so all three engines agree on
#: every ASCII character and cannot drift one site at a time.
from mofka_spark.operators.text import _WS_CHARS as _TOK_WS_CHARS

_SCORER_NONWS = f"[^{_TOK_WS_CHARS}]"


def default_text_scorer(texts):
    """The built-in deterministic scorer: a fixed-weight rational
    heuristic over cheap text features (stopword density favored,
    punctuation soup penalized) — a stand-in with the same call shape
    as a real quality classifier (pandas.Series[str] ->
    pandas.Series[float64]). Pure rational arithmetic in a fixed
    operand order, so an external engine computing the same tree
    reproduces every score bit-for-bit (no transcendentals, no
    library-dependent rounding — gates round ENGINE-side, not here).
    Feature semantics mirror the repo tokenizer (lower, split on
    whitespace, drop empty tokens), computed fully VECTORIZED: token
    count = count of non-whitespace runs, stopword hits =
    token-anchored alternation (exact token equality, never a
    substring), punctuation = one char-class count. Whitespace is the
    EXPLICIT class [ \\t\\n\\f\\r] (RE2's \\s), not an engine \\s:
    Python re's \\s is Unicode-aware (U+00A0 / U+2028 would diverge),
    Java's \\s adds \\x0b which RE2's does not — the explicit class is
    the exact intersection all three engines compute identically, and
    the repo tokenizer _WS uses the same class (ADVICE r9 + review).
    Measured 2x the per-row .apply form it replaced; values
    identical."""
    low = texts.str.lower()
    nt = low.str.count(_SCORER_NONWS + "+")
    sw = low.str.count(
        "(?<!" + _SCORER_NONWS + ")(?:"
        + "|".join(_SCORER_STOPWORDS)
        + ")(?!" + _SCORER_NONWS + ")"
    )
    pu = texts.str.count("[" + re.escape(_SCORER_PUNCT) + "]")
    ln = texts.str.len()
    return (2.0 * sw + 1.0) / (nt + 3.0) - pu / (ln + 10.0)


#: Per-worker-process model cache for hashed_logistic_scorer: keyed
#: by model path, populated on the FIRST batch a worker scores and
#: reused for every later batch/task that worker runs (Spark reuses
#: Python workers across tasks). Lives at module level so the
#: cloudpickled scorer closure resolves it through the module import,
#: one instance per worker process.
_MODEL_CACHE: dict[tuple, tuple] = {}  # (path, mtime_ns, size) -> (w, b)
#: Keys already warned about after their backing file vanished — the
#: mixed-outcome job diagnosis aid (warn once per worker, not per batch).
_MODEL_GONE_WARNED: set[tuple] = set()


def hashed_logistic_scorer(model_path: str, record_loads: bool = False):
    """A REAL serialized-model scorer for :func:`classifier_scores` —
    the documented production injection pattern made executable: a
    hashed-feature (hashing-trick) logistic regression whose weights
    live in an ``.npz`` file (``w``: float64[n_features], ``b``:
    float64 scalar) and load LAZILY inside each worker process on its
    first batch, cached at module level thereafter (the decode_images
    decoder-injection discipline, operators/modality.py). Nothing
    model-sized is captured in the closure — only the PATH ships with
    the task, so a 10 MB (or 10 GB, via a shared filesystem) model
    costs one load per worker, not one per task or per row.

    Features: crc32-hashed bag of lowercase whitespace tokens
    (crc32, not Python hash(): hash() is per-process salted and
    would silently disagree across workers). Score =
    sigmoid(w . x + b), float64 throughout — deterministic.

    ``record_loads`` appends the worker pid to ``model_path +
    ".loads"`` on each ACTUAL load — test instrumentation for
    pinning the one-load-per-worker contract; leave False in
    production."""

    def scorer(texts):
        import os
        import zlib

        import numpy as np
        import pandas as pd

        # resolve the cache through the IMPORTED module, not the
        # closure's global: cloudpickle ships nested functions by
        # value with a per-task snapshot of their globals, so a bare
        # _MODEL_CACHE reference would be a fresh dict every task —
        # one load per TASK instead of per worker process
        from mofka_spark.operators import quality as _q

        # cache key includes (mtime_ns, size): retraining the model in
        # place at the same path must not keep serving warm workers the
        # old weights while fresh workers load the new file (a silent
        # mixed-version scoring job). The stat is cheap relative to an
        # Arrow batch; a changed file loads exactly once more. If the
        # file vanishes mid-job (rotated/cleaned up on a shared FS)
        # warm workers keep serving their cached version — the
        # pre-key behavior — instead of failing the job; only a
        # never-loaded worker raises. Caveat: an in-place rewrite
        # preserving both mtime_ns and size is indistinguishable —
        # write-then-rename model updates, don't rewrite in place.
        try:
            st = os.stat(model_path)
            key = (model_path, st.st_mtime_ns, st.st_size)
        except OSError:
            cached = [k for k in _q._MODEL_CACHE if k[0] == model_path]
            if not cached:
                raise
            key = cached[0]
            # The split-brain outcome (warm workers keep scoring while
            # never-loaded workers raise) is easy to misread as a
            # scoring bug — make this worker's side of it diagnosable
            # in the executor log (ADVICE r10); once per worker.
            if key not in _q._MODEL_GONE_WARNED:
                _q._MODEL_GONE_WARNED.add(key)
                import logging

                logging.getLogger(__name__).warning(
                    "hashed_logistic_scorer: model file %s vanished; "
                    "this worker keeps serving its cached weights "
                    "(mtime_ns=%d, size=%d). Workers that never loaded "
                    "it will raise — expect a mixed job outcome.",
                    model_path, key[1], key[2],
                )
        mdl = _q._MODEL_CACHE.get(key)
        if mdl is None:
            data = np.load(model_path)
            mdl = (np.asarray(data["w"], dtype="float64"), float(data["b"]))
            # evict this path's stale versions only (two DIFFERENT
            # models scoring in one job must not evict each other)
            for k in [k for k in _q._MODEL_CACHE if k[0] == model_path]:
                del _q._MODEL_CACHE[k]
            _q._MODEL_CACHE[key] = mdl
            if record_loads:
                with open(model_path + ".loads", "a") as f:
                    f.write(f"{os.getpid()}\n")
        w, b = mdl
        n = w.shape[0]
        out = np.empty(len(texts), dtype="float64")
        for i, t in enumerate(texts.fillna("").str.lower()):
            z = b
            for tok in t.split():
                z += w[zlib.crc32(tok.encode()) % n]
            out[i] = 1.0 / (1.0 + np.exp(-z))
        return pd.Series(out, index=texts.index)

    return scorer


def classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer=None,
    score_col: str = "score",
    keep_cols: bool = False,
) -> DataFrame:
    """Batched text-classifier INFERENCE stage — the quality-classifier
    filtering step of a modern pretraining pipeline (FineWeb-Edu-style:
    score every document with a small model, keep the top band). The
    Spark-side plumbing is the production shape and is what the gate
    pins: only the needed columns flow to Python (column pruning),
    batches arrive as Arrow record batches via mapInPandas, the stage
    parallelizes per input partition with NO shuffle, and the scorer is
    a per-batch vectorized hook — plug a real model by passing
    ``scorer`` (load weights lazily inside the callable: module-level
    cache, one load per worker process; the decode_images
    decoder-injection pattern, operators/modality.py).

    ``scorer``: Callable[[pandas.Series[str]], pandas.Series[float]].
    Defaults to :func:`default_text_scorer` (deterministic,
    oracle-reproducible). Returns (id, score) — or every input column
    plus ``score_col`` when ``keep_cols`` (the filter-pipeline shape:
    the document rides along, still zero shuffles).

    Composes directly with blend_scores (a classifier score is one
    more signal) and curriculum_select / classifier_filter (threshold
    selection)."""
    scorer = scorer or default_text_scorer
    base = df.filter(F.col(text_col).isNotNull())
    if keep_cols and score_col in base.columns:
        raise ValueError(
            f"classifier_scores: input already has a {score_col!r} "
            "column; pass a different score_col"
        )
    if keep_cols:
        in_df = base
        out_schema = ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in base.schema.fields]
            + [f"`{score_col}` double"]
        )
    else:
        in_df = base.select(id_col, text_col)
        id_type = base.schema[id_col].dataType.simpleString()
        out_schema = f"`id` {id_type}, `{score_col}` double"

    id_name = id_col if keep_cols else "id"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            scores = pd.Series(scorer(pdf[text_col]), dtype="float64")
            if keep_cols:
                out = pdf.copy()
                out[score_col] = scores
            else:
                out = pd.DataFrame(
                    {id_name: pdf[id_col], score_col: scores}
                )
            yield out

    return in_df.mapInPandas(run, out_schema)


def classifier_filter(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer=None,
    score_col: str = "score",
) -> DataFrame:
    """Keep documents whose classifier score clears ``threshold`` —
    the FineWeb-Edu selection step. Every input column rides through
    the scoring stage (keep_cols plumbing), so the output is the
    filtered corpus plus its scores: zero shuffles, one Python stage,
    filter applied engine-side after it."""
    scored = classifier_scores(
        df, id_col, text_col, scorer, score_col, keep_cols=True
    )
    return scored.filter(F.col(score_col) >= float(threshold))


def retention_curve(
    df: DataFrame,
    thresholds: list[float],
    score_col: str = "score",
    group_col: str | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Threshold sweep for calibrating a quality filter: for each
    candidate threshold t (and group, e.g. source), how many documents
    and how much weight (e.g. tokens) survive ``score >= t`` — the
    table you read before committing classifier_filter's threshold,
    because the real constraint is usually "keep >= X% of tokens per
    domain", not a score value.

    Returns one row per (group,) threshold: ``n_kept`` / ``w_kept``
    (weight omitted when ``weight_col`` is None) plus ``frac_docs`` /
    ``frac_weight`` relative to the group's totals. Rows with a
    NULL/NaN score count in the totals but never in the kept sums — a
    scoreless doc cannot clear any threshold.

    Scale shape: ONE scan, one narrow shuffle on the group key; every
    threshold is a codegen'd conditional sum inside the same
    HashAggregate (len(thresholds) conditional aggregates, not
    len(thresholds) passes or an exploded corpus x thresholds join);
    the unpivot to (threshold,) rows happens AFTER aggregation on the
    #groups-row result via inline() — output is #groups x #thresholds
    rows, model-state-sized."""
    if not thresholds:
        raise ValueError("retention_curve: thresholds must be non-empty")
    ts = [float(t) for t in thresholds]
    if len(set(ts)) != len(ts):
        raise ValueError("retention_curve: duplicate thresholds")
    s = F.col(score_col)
    scored = s.isNotNull() & ~F.isnan(s.cast("double"))
    aggs = [
        F.count(F.lit(1)).alias("_nd"),
    ]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col).cast("double")).alias("_wd"))
    for i, t in enumerate(ts):
        keep = scored & (s >= F.lit(t))
        aggs.append(F.sum(keep.cast("long")).alias(f"_k{i}"))
        if weight_col is not None:
            aggs.append(
                F.sum(
                    F.when(keep, F.col(weight_col).cast("double")).otherwise(
                        F.lit(0.0)
                    )
                ).alias(f"_w{i}")
            )
    grouped = df.groupBy(group_col) if group_col else df.groupBy()
    agg = grouped.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"_k{i}").alias("n_kept"),
                *(
                    [F.col(f"_w{i}").alias("w_kept")]
                    if weight_col is not None
                    else []
                ),
            )
            for i, t in enumerate(ts)
        ]
    )
    head = [F.col(group_col)] if group_col else []
    out = agg.select(
        *head,
        F.col("_nd"),
        *([F.col("_wd")] if weight_col is not None else []),
        F.inline(rows),
    )
    # Empty/fully-filtered input (global groupBy(): ONE row with
    # _nd = 0 and NULL conditional sums): kept counts coalesce to 0
    # and the 0/0 fractions guard to NULL, mirroring frac_weight
    # (ADVICE r10).
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept")
    cols = [
        *head,
        F.col("threshold"),
        n_kept,
        F.when(F.col("_nd") != 0, F.coalesce(F.col("n_kept"), F.lit(0)) / F.col("_nd"))
        .otherwise(F.lit(None))
        .alias("frac_docs"),
    ]
    if weight_col is not None:
        cols.insert(-1, F.coalesce(F.col("w_kept"), F.lit(0.0)).alias("w_kept"))
        cols.append(
            F.when(F.col("_wd") != 0, F.coalesce(F.col("w_kept"), F.lit(0.0)) / F.col("_wd"))
            .otherwise(F.lit(None))
            .alias("frac_weight")
        )
    return out.select(*cols)
