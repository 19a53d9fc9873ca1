"""Time-series joins the reference lacks and Spark doesn't ship built-in.

- asof_join: point-in-time ("most recent right row at or before the
  left row's time") — the lookup every feature/training pipeline needs
  for leakage-free joins. Implemented WITHOUT a range cross join: union
  both sides, one window per key with last(ignorenulls) forward-fill,
  filter back to left rows. One shuffle on the key, linear work, no
  pair explosion — survives arbitrarily dense right sides, unlike the
  naive `l.t >= r.t` join whose output is quadratic before
  deduplication.
- range_join_count is expressed with plain equi+range conditions in the
  caller (Catalyst handles it); see queries.asof/range gate queries.

SURVEY.md §2.7 lists as-of/interval joins as the planned analytics
extension over the event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance_sec: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right
    row with right.on <= left.on (backward; equal times match) within
    the same ``by`` keys, optionally only if within ``tolerance_sec``.

    Deterministic under ties only if the right side is unique per
    (by, on) — pre-aggregate it otherwise (the gate query does).

    Plan: union -> window(partitionBy by, orderBy on, side) ->
    last(ignorenulls) running fill -> filter left marker. The sort is
    per-key local after one hash shuffle; with both inputs bucketed by
    the key, even that shuffle disappears.
    """
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    lcols = [c for c in left.columns]
    l_side = left.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols if c not in by and c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("_rt"),
    )
    r_side = right.select(
        *by,
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != on],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(on).alias("_rt"),
    )
    u = l_side.unionByName(r_side)
    # right rows (_is_left=0) sort before left rows at the same
    # timestamp, so an equal-time right row IS visible to the left row
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
        F.last("_rt", ignorenulls=True).over(w).alias("_f_rt"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    in_tol = (
        F.lit(True)
        if tolerance_sec is None
        else (
            F.col("_f_rt").isNotNull()
            & ((F.col("_t").cast("long") - F.col("_f_rt").cast("long")) <= tolerance_sec)
        )
    )
    sel = (
        [F.col(c) for c in by]
        + [F.col("_t").alias(on)]
        + [F.col(c) for c in lcols if c not in by and c != on]
        + [F.when(in_tol, F.col(f"_f_{c}")).alias(c) for c in value_cols]
        + [F.when(in_tol, F.col("_f_rt")).alias(f"{on}_matched")]
    )
    return out.select(*sel)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt_by: list[str] | str,
    nsalts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's hot keys across
    ``nsalts`` buckets and replicate the small side per bucket.

    When ONE join key carries a large fraction of the big side (the
    Zipf reality of event types, domains, languages), a plain hash join
    sends that key's every row to one reducer — a straggler no cluster
    size fixes. Salting splits each key's rows across nsalts reducers:
    the big side joins on (key, salt(row)) where salt derives
    DETERMINISTICALLY from ``salt_by`` columns (never rand(): task
    retries must re-produce the same salt or the join drops/duplicates
    rows); the small side is exploded nsalts times so every bucket
    still finds its match. Result set is row-identical to the unsalted
    join for ``how`` in {inner, left, left_semi, left_anti, cross} —
    right/full-outer joins are REJECTED: an unmatched small-side row
    appears once per salt replica, so the salted result would not equal
    the unsalted one (dedup'ing it back would need another shuffle;
    swap the sides and use left instead).

    Use when the small side is too big to broadcast AND AQE's runtime
    skew split is unavailable (e.g. the join feeds a window/streaming
    stage AQE cannot re-plan around). Otherwise prefer broadcast() or
    AQE (tests/test_plans.py::TestAqeSkew pins that path).

    Cost model: shuffle volume grows by (nsalts - 1) x |small| — the
    explicit price for removing the hot-key straggler; keep nsalts near
    the straggler factor, not the cluster size.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows would be emitted once per salt replica "
            "(use inner/left, or swap the sides)"
        )
    on = [on] if isinstance(on, str) else list(on)
    salt_by = [salt_by] if isinstance(salt_by, str) else list(salt_by)
    overlap = set(salt_by) & set(on)
    if overlap:
        raise ValueError(
            f"salt_by {sorted(overlap)} overlaps the join key - salting by "
            "the key itself leaves every hot key in one bucket"
        )
    b = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_by]), F.lit(nsalts)).cast("int"),
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(nsalts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, on + ["_salt"], how).drop("_salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    top_k: int = 20,
) -> DataFrame:
    """Join-key skew diagnostic: the top-k heaviest key values, each
    with its row count, share of the table, and the straggler factor
    (count / mean-count-per-key) — the number that tells you whether a
    planned shuffle join needs ``salted_join`` (factor >> 1 means one
    reducer drags the stage) and roughly what ``nsalts`` to pick
    (straggler factor, rounded up).

    Scale shape: one partial-agg shuffle on the key (map-side combine
    collapses each partition's duplicates first), then a single-row
    global stats frame broadcast back onto only the top-k rows. The
    top-k itself is a thin (key, count) sort — no payload columns ever
    shuffle. Deterministic: ties order by key value."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count("*").alias("_n_keys"),
    )
    top = (
        counts.orderBy(
            F.desc("n_rows"), *[F.asc(k) for k in keys]
        ).limit(top_k)
    )
    return top.join(F.broadcast(stats)).select(
        *keys,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        F.round(
            F.col("n_rows") * F.col("_n_keys") / F.col("_total"), 4
        ).alias("straggler_factor"),
    )


def fuzzy_join_pairs(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Fuzzy string matching: all (left, right) pairs within Levenshtein
    distance ``max_dist``, without the cross join — entity resolution
    over metadata values (product names, titles, author strings).

    Blocking is q-gram pigeonhole: one edit perturbs at most ``q`` of a
    string's q-gram multiset, so two strings within ``max_dist`` edits
    MUST share a q-gram whenever len >= q * (max_dist + 1) (the shorter
    string has len-q+1 grams and at most max_dist*q of them can die).
    Candidates come from an equi-join on exploded distinct q-grams;
    the exact Levenshtein verify runs on candidate pairs only. Pairs
    with a side SHORTER than the pigeonhole bound are recovered by a
    length-band equi-join (|len difference| <= max_dist is a necessary
    condition of the edit distance), so the result is exactly the
    cross-join answer at any length and the plan contains NO nested
    loop: every candidate path is a hash equi-join.

    Scale shape: the gram explode multiplies rows by ~len; the
    candidate join shuffles (gram, id) pairs and dedupes on the pair
    key before verify — never all-pairs. Short strings group into
    length buckets, whose size is bounded by the universe of strings
    below ~q*(max_dist+1) chars. Hot grams behave like hot join keys:
    cap or salt them upstream (skew_report) if the gram distribution
    is Zipf-extreme.

    Returns (left_val, right_val, dist), distinct pairs.
    """
    bound = q * (max_dist + 1)

    def _grams(col: Column) -> Column:
        n = F.length(col) - (q - 1)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.substring(col, i, q),
            )
        )

    lv = left.select(F.col(left_col).alias("_l")).filter(
        F.col("_l").isNotNull()
    ).distinct()
    rv = right.select(F.col(right_col).alias("_r")).filter(
        F.col("_r").isNotNull()
    ).distinct()
    l_long = lv.filter(F.length("_l") >= bound)
    r_long = rv.filter(F.length("_r") >= bound)
    lg = l_long.select("_l", F.explode(_grams(F.col("_l"))).alias("_g"))
    rg = r_long.select("_r", F.explode(_grams(F.col("_r"))).alias("_g"))
    cand_long = lg.join(rg, "_g").select("_l", "_r").distinct()
    # pairs with a short side: length-band equi-join — the short side
    # announces every length within max_dist of its own, the other
    # side keys by its exact length; an edit changes length by at most
    # one, so no qualifying pair escapes the band
    l_short = lv.filter(F.length("_l") < bound)
    r_short = rv.filter(F.length("_r") < bound)

    def _bands(df: DataFrame, col: str) -> DataFrame:
        return df.select(
            col,
            F.explode(
                F.sequence(
                    F.length(col) - max_dist, F.length(col) + max_dist
                )
            ).alias("_len"),
        )

    cand_short_l = _bands(l_short, "_l").join(
        rv.withColumn("_len", F.length("_r")), "_len"
    ).select("_l", "_r")
    cand_short_r = _bands(r_short, "_r").join(
        l_long.withColumn("_len", F.length("_l")), "_len"
    ).select("_l", "_r")
    cand = (
        cand_long.unionByName(cand_short_l)
        .unionByName(cand_short_r)
        .distinct()
    )
    dist = F.levenshtein("_l", "_r")
    return cand.select(
        F.col("_l").alias("left_val"),
        F.col("_r").alias("right_val"),
        dist.alias("dist"),
    ).filter(F.col("dist") <= max_dist)
