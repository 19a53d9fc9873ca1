"""Event-stream analytics: funnel conversion and cohort retention —
the two classic product-analytics rollups over the events table
(complementing hourly_event_stats / user_sessions in queries.py).

The reference's event model stops at (id, metadata, data) FIFO logs
(/root/reference/src/PartitionManager.hpp:89-157); these operators are
part of the beyond-reference analytics layer over the same rows once
an ingest timestamp exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "funnel_conversion",
    "cohort_retention",
    "time_decayed_average",
    "transition_matrix",
    "rolling_active_users",
    "history_intervals",
    "path_counts",
    "value_trend",
]


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts through step i+1 only
    with an event STRICTLY LATER than their earliest completion of
    step i (the product-analytics definition that kills the
    'purchase before view' inversion a naive per-step count admits).

    Returns one row per step: (step_idx, step, n_users, conversion)
    with conversion = n_users / n_users(step 0).

    Scale shape: one user-keyed shuffle per step — each stage is a
    conditional MIN aggregate per user joined back onto the (pruned)
    events projection; no windows, no self-join explosion, state per
    stage is ONE timestamp per qualifying user. A k-step funnel is k
    bounded rollups, not a k-way join of the fact with itself.
    """
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    ).filter(F.col("t").isin(steps))
    # stage 0: earliest step-0 event per user
    cur = (
        ev.filter(F.col("t") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("ts0"))
    )
    counts = [("0", steps[0], cur)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            ev.filter(F.col("t") == step)
            .join(cur.select("u", F.col(f"ts{i-1}")), "u")
            .filter(F.col("ts") > F.col(f"ts{i-1}"))
            .groupBy("u")
            .agg(F.min("ts").alias(f"ts{i}"))
        )
        counts.append((str(i), step, nxt))
        cur = nxt
    rows = None
    for idx, step, frame in counts:
        c = frame.agg(F.count("*").alias("n_users")).select(
            F.lit(int(idx)).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("n_users").cast("long"),
        )
        rows = c if rows is None else rows.unionByName(c)
    base = rows.filter(F.col("step_idx") == 0).select(
        F.col("n_users").alias("_base")
    )
    return rows.join(F.broadcast(base)).select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.col("n_users") / F.col("_base"), 6).alias("conversion"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    FIRST event; for each (cohort, period offset) the count of cohort
    members active in that period. Period index = epoch_seconds div
    period_seconds — pure integer arithmetic, no calendar semantics to
    disagree across engines.

    Returns (cohort, offset, n_active, retention) with retention =
    n_active / cohort size (offset 0 row == cohort size by
    construction).

    Scale shape: first-seen is one user-keyed rollup; the join back is
    on the same user key (AQE co-partitions); the matrix aggregate
    shuffles only (cohort, offset, user) distinct triples — bounded by
    activity, not events, since the per-period distinct collapses
    map-side."""
    ev = df.select(
        F.col(user_col).alias("u"),
        (F.unix_timestamp(F.col(ts_col)).cast("long") / F.lit(period_seconds))
        .cast("long")
        .alias("p"),
    )
    first = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    active = (
        ev.join(first, "u")
        .select("u", "cohort", (F.col("p") - F.col("cohort")).alias("offset"))
        .filter(F.col("offset") < max_periods)
        .distinct()
    )
    mat = active.groupBy("cohort", "offset").agg(
        F.countDistinct("u").alias("n_active")
    )
    size = mat.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("_size")
    )
    return mat.join(size, "cohort").select(
        "cohort",
        "offset",
        F.col("n_active").cast("long"),
        F.round(F.col("n_active") / F.col("_size"), 6).alias("retention"),
    )


def time_decayed_average(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    halflife_seconds: float = 86400.0,
) -> DataFrame:
    """Exponentially time-decayed average per key, anchored at the
    key's LAST event: ewma = sum(v_i * w_i) / sum(w_i) with
    w_i = 0.5^((t_last - t_i) / halflife) — the trend signal
    ("what is this user's recent value level") that a plain AVG
    flattens and a windowed AVG quantizes. Defined as a weighted sum
    over timestamps, NOT a recursion over arrival order, so it is
    insensitive to row order and incrementally mergeable (numerator
    and denominator are distributive sums once re-anchored).

    Returns (key, n_events, ewma) with ewma rounded to 6dp.

    Scale shape: two aggregates on the same key partitioning — the
    per-key anchor (MAX ts) and the weighted sums after a same-key
    join-back; AQE co-partitions, no window, no sort. Weight
    arithmetic is integer microseconds divided into doubles, identical
    across engines."""
    anchor = df.groupBy(key_col).agg(F.max(ts_col).alias("_t_last"))
    hl_us = float(halflife_seconds) * 1e6
    w = F.pow(
        F.lit(0.5),
        (
            F.unix_micros(F.col("_t_last")) - F.unix_micros(F.col(ts_col))
        ).cast("double")
        / F.lit(hl_us),
    )
    return (
        df.join(anchor, key_col)
        .groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                F.sum(F.col(value_col) * w) / F.sum(w), 6
            ).alias("ewma"),
        )
    )


def value_trend(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    method: str = "exact",
    max_events_per_key: int | None = None,
) -> DataFrame:
    """Per-key least-squares trend of value over time: slope (per
    second) and intercept from the closed-form sums
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) — the trend-detection
    primitive (is this user's/sensor's value drifting up?) that
    time_decayed_average's level signal doesn't capture.

    x is REBASED to each key's earliest OBSERVED event — the first
    event with both a non-null timestamp and a non-null value; rows
    missing either carry no information for the fit and are excluded
    up front — measured in seconds since that origin, before
    squaring: raw epoch-microsecond x would put Sxx near 1e36 where
    the closed form loses all precision. Keys need >= 2 distinct
    timestamps for a defined slope (others are dropped).

    Returns (key, n_events, slope, intercept) rounded to 6dp;
    intercept is the fitted value at the key's first observation.
    Both are normalized through ``+ 0.0`` AFTER rounding so a slope
    that rounds to zero is +0.0, never IEEE -0.0 (ROUND(-1e-15, 6)
    yields -0.0 in both engines; stringified hashes then diverge on
    the sign bit — the ``0.0 + ROUND(...)`` convention from the
    streaming_quantiles oracle applies to both sides here).

    Two physical strategies, same closed form:

    * ``method="exact"`` (default, the correctness gate): ONE
      key-keyed aggregate collecting each key's points into a
      (ts, y)-sorted array, then four ordered left folds inside the
      array — no window, no join, one Exchange. The sums run over the
      SORTED point list so the IEEE-double result is independent of
      partial-aggregation order and reproducible by an external
      engine (the token_entropy / temperature_mix float-identity
      trick; plain F.sum over doubles rounds differently
      run-to-run at ROUND(…,6) boundaries). Per-key memory is
      O(events-per-key); ``max_events_per_key`` caps it (keeping the
      EARLIEST cap points per key, so t0 — and thus the fit origin —
      is unchanged) and a skewed key degrades to a truncated fit
      instead of an executor OOM.
    * ``method="sums"`` (the corpus-scale path): the per-key MIN-ts
      anchor joined back on the same key, then five plain mergeable
      F.sum partial aggregates — O(1) state per key, map-side
      combine, AQE co-partitions the anchor join. Bit-for-bit
      reproducibility across engines is NOT guaranteed at ROUND(…,6)
      tie boundaries (float addition order varies with partial-agg
      order); values agree to ~1e-9 relative. Use for 100 TB runs,
      ``exact`` for oracle-checked gates. ``max_events_per_key`` is
      ignored here (state is already O(1))."""
    y = F.col(value_col).cast("double")
    obs = df.filter(y.isNotNull() & F.col(ts_col).isNotNull())

    def _us(c: Column) -> Column:
        # NTZ-tolerant epoch micros: cast is a no-op on TIMESTAMP, and
        # for TIMESTAMP_NTZ the session-tz offset cancels in the
        # t - t0 difference the fit actually uses.
        return F.unix_micros(c.cast("timestamp"))

    if method == "sums":
        anchor = obs.groupBy(key_col).agg(F.min(ts_col).alias("_t0"))
        x = (_us(F.col(ts_col)) - _us(F.col("_t0"))).cast(
            "double"
        ) / F.lit(1e6)
        sums = (
            obs.join(anchor, key_col)
            .groupBy(key_col)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(x).alias("sx"),
                F.sum(y).alias("sy"),
                F.sum(x * x).alias("sxx"),
                F.sum(x * y).alias("sxy"),
            )
        )
    elif method == "exact":
        arr = F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), y.alias("y")))
        )
        if max_events_per_key is not None:
            arr = F.slice(arr, 1, int(max_events_per_key))
        pts = obs.groupBy(key_col).agg(arr.alias("_pts"))
        t0 = _us(F.element_at("_pts", 1).getField("ts"))
        xs = F.transform(
            "_pts",
            lambda p: (_us(p.getField("ts")) - t0).cast("double")
            / F.lit(1e6),
        )
        ys = F.transform("_pts", lambda p: p.getField("y"))

        def _fold(a):
            return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v)

        sums = pts.select(
            key_col,
            F.size("_pts").cast("long").alias("n"),
            _fold(xs).alias("sx"),
            _fold(ys).alias("sy"),
            _fold(F.zip_with(xs, xs, lambda a, b: a * b)).alias("sxx"),
            _fold(F.zip_with(xs, ys, lambda a, b: a * b)).alias("sxy"),
        )
    else:
        raise ValueError(f"value_trend: unknown method {method!r}")

    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    return sums.filter(denom > 0).select(
        key_col,
        F.col("n").alias("n_events"),
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
            + F.lit(0.0)
        ).alias("intercept"),
    )


def path_counts(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] = ("ts", "event_id"),
    path_len: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Consecutive event-type paths of length ``path_len`` per user,
    counted corpus-wide — the path-mining / sankey primitive one order
    up from transition_matrix (which is the path_len=2 marginal).
    Useful for discovering multi-step behaviors a first-order chain
    hides (view->click->purchase vs view->click->view).

    Returns (step_1..step_k, n_paths) for paths occurring at least
    ``min_count`` times.

    Scale shape: one user-keyed shuffle + sort shared by all k-1 lead
    windows (same partitioning and ordering — Catalyst plans a single
    Window operator); the path aggregate collapses map-side to at most
    |types|^k rows."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    steps = [F.col(type_col).alias("step_1")] + [
        F.lead(type_col, i).over(w).alias(f"step_{i + 1}")
        for i in range(1, path_len)
    ]
    paths = df.select(*steps)
    for i in range(2, path_len + 1):
        paths = paths.filter(F.col(f"step_{i}").isNotNull())
    return (
        paths.groupBy(*[f"step_{i}" for i in range(1, path_len + 1)])
        .agg(F.count("*").cast("long").alias("n_paths"))
        .filter(F.col("n_paths") >= min_count)
    )


def history_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] = ("ts", "event_id"),
    collapse: bool = True,
) -> DataFrame:
    """Change log -> validity intervals (SCD type 2): each key's value
    history becomes rows (key, value, valid_from, valid_to) where
    valid_to is the next change's timestamp (NULL for the current
    value) — the warehouse primitive for "what was this attribute at
    time T" joins (pair with asof_join for the probe side).

    ``collapse=True`` first drops rows that repeat the previous value
    (a change log with heartbeats), so intervals describe distinct
    value runs; NULL values compare as a distinct state.

    Scale shape: ONE key-keyed shuffle and in-partition sort shared by
    both window passes (lag for collapse, lead for interval close) —
    Catalyst reuses the (key, order) sort for both, no second
    exchange. State per row is one neighbor, never the full history.
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    cur = df.select(key_col, value_col, *order_cols)
    if collapse:
        prev = F.lag(value_col).over(w)
        changed = (
            F.col(value_col).eqNullSafe(prev) == F.lit(False)
        ) | F.isnull(
            F.lag(F.lit(1)).over(w)
        )  # first row of each key always starts an interval
        cur = cur.withColumn("_keep", changed).filter("_keep").drop("_keep")
    w2 = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    return cur.select(
        key_col,
        value_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct actives per day (the DAU/WAU/MAU
    family): for each day, the number of distinct users with at least
    one event in the ``window_days`` ending that day. Days reported =
    every day within window reach of an event, up to the last event
    day (so a trailing bucket never dangles past the data).

    Returns (day, n_active).

    Scale shape: COUNT(DISTINCT) over a sliding window has no
    partial-aggregate form, so the naive windowed form rescans
    window_days of data per day. This is the standard explode
    rewrite: distinct (user, day) pairs first (one shuffle, collapses
    all intra-day activity), then each pair replicates into the
    window_days buckets it supports and a plain distinct count runs
    per bucket — shuffle volume = window_days x daily-active pairs,
    independent of raw event count, and every aggregate partials
    map-side."""
    ev = df.select(
        F.col(user_col).alias("u"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    last = ev.agg(F.max("day").alias("_last"))
    return (
        ev.select(
            "u",
            F.explode(
                F.sequence(F.col("day"), F.date_add("day", window_days - 1))
            ).alias("day"),
        )
        .crossJoin(F.broadcast(last))
        .filter(F.col("day") <= F.col("_last"))
        .groupBy(F.col("day").cast("timestamp").alias("day"))
        .agg(F.countDistinct("u").cast("long").alias("n_active"))
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] = ("ts", "event_id"),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each ordered pair of consecutive events by the same
    user, count (from_type -> to_type) and normalize per from_type —
    the behavioral model behind next-action prediction, anomaly scoring
    (improbable transitions) and funnel discovery (vs funnel_conversion
    which checks ONE prescribed order).

    ``order_cols`` must totally order each user's events (ts alone can
    tie; the default breaks ties on event_id so both engines sort
    identically).

    Returns (from_type, to_type, n_transitions, probability) with
    probability = n / sum(n per from_type), rounded to 6dp.

    Scale shape: ONE user-keyed shuffle for the lag window (per-user
    state = one previous row, no full-sequence materialization); the
    pair aggregate collapses map-side to at most |types|^2 rows, and
    the per-from_type normalizer is a window over that tiny matrix —
    never a second pass over events.
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = (
        df.select(user_col, F.col(type_col).alias("to_type"), *order_cols)
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n_transitions"))
    )
    per_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(per_from), 6
        ).alias("probability"),
    )
