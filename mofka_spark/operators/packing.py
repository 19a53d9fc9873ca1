"""Sequence packing and log compaction for training-data pipelines.

``pack_sequences`` is the GPT-pretraining "concat-and-cut" layout: lay
all documents out on one global token axis (in a deterministic key
order), then cut fixed-capacity context windows. Each document's
placement is a pure function of the exclusive prefix sum of token
counts — which this module computes DISTRIBUTED: per-range-partition
running sums plus a broadcast of partition totals, never a
single-partition global window (the classic parallel prefix-sum
decomposition). At 100 TB the only data movement is one range
repartition of (id, n_tokens) pairs and a driver-side list of
#partitions partial sums.

``compact_latest`` is Kafka-style log compaction re-expressed
relationally: keep the newest event per key. One hash-aggregate with
map-side partial max over a lexicographic (order, payload) struct — no
window, no sort, one shuffle keyed by the compaction key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    num_ranges: int | None = None,
) -> DataFrame:
    """Assign each document its position in the packed token stream.

    Documents are concatenated in ascending ``id_col`` order and the
    stream is cut into windows of ``capacity`` tokens (documents may
    straddle a cut — the standard pretraining packing, where windows
    are filled exactly and attention masks handle boundaries).

    Returns (id, n_tokens, global_start, first_bin, last_bin,
    start_in_bin):

    - ``global_start``: exclusive prefix sum of token counts
    - ``first_bin``/``last_bin``: window indices the doc touches
    - ``start_in_bin``: offset of the doc's first token in first_bin

    Scale shape: ``repartitionByRange(id)`` gives sorted,
    non-overlapping ranges; a per-partition window computes local
    running sums; partition TOTALS (#partitions rows) are collected
    and broadcast back as a cumulative base — a distributed prefix
    sum, not a 1-partition global window.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    sess = df.sparkSession
    n_ranges = num_ranges or sess.sparkContext.defaultParallelism
    # localCheckpoint the _pid-stamped frame, not a leaked persist():
    # read twice (totals + result), _pid frozen against
    # RangePartitioner re-sampling, blocks reclaimed on GC; the
    # partition-local running-sum window recomputes (cheaply) per read
    part = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .repartitionByRange(n_ranges, "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # local running sum inside each sorted range
    w = (
        Window.partitionBy("_pid")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local_end", F.sum("n_tokens").over(w))
    # exclusive cumulative base per partition: tiny (#partitions rows)
    totals = (
        local.groupBy("_pid")
        .agg(F.max("_local_end").alias("t"), F.min("id").alias("lo"))
        .collect()
    )
    if not totals:
        return sess.createDataFrame(
            [],
            "id long, n_tokens long, global_start long, first_bin long, "
            "last_bin long, start_in_bin long",
        )
    base: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["lo"]):
        base[row["_pid"]] = acc
        acc += row["t"]
    base_col = F.create_map(
        *[F.lit(x) for kv in base.items() for x in kv]
    )
    start = (base_col[F.col("_pid")] + F.col("_local_end") - F.col("n_tokens")).alias(
        "global_start"
    )
    out = local.select("id", "n_tokens", start).select(
        "id",
        "n_tokens",
        "global_start",
        F.floor(F.col("global_start") / capacity).cast("long").alias("first_bin"),
        F.floor(
            (F.col("global_start") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
            / capacity
        )
        .cast("long")
        .alias("last_bin"),
        F.pmod(F.col("global_start"), F.lit(capacity)).cast("long").alias(
            "start_in_bin"
        ),
    )
    return out


def compact_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Latest row per key — Kafka log compaction as one aggregate.

    ``order_cols`` is the recency order (lexicographic, later wins;
    make it unique — e.g. (ts, event_id) — for determinism).
    Implemented as max over a (order..., payload...) struct: partial
    aggregation collapses each map partition to one candidate per key
    before the exchange, so the shuffle carries |keys| rows, not the
    log. The reference analog is the per-key cursor/latest-value read
    path; Kafka calls it topic compaction.
    """
    ordered = F.struct(
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        *[F.col(c).alias(f"p{i}") for i, c in enumerate(payload_cols)],
    )
    agg = df.groupBy(*key_cols).agg(F.max(ordered).alias("_m"))
    cols = [F.col(k) for k in key_cols]
    cols += [F.col(f"_m.o{i}").alias(c) for i, c in enumerate(order_cols)]
    cols += [F.col(f"_m.p{i}").alias(c) for i, c in enumerate(payload_cols)]
    return agg.select(*cols)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_ranges: int | None = None,
) -> DataFrame:
    """Deterministic epoch shuffle: the training-order permutation.

    Every pretraining run reorders its corpus once per epoch; doing it
    reproducibly (same seed -> same order, any cluster size) makes the
    data order part of the experiment config instead of an accident of
    scheduling. Position = rank of a 60-bit md5 stream key derived from
    (id, seed) — a new seed is a new pseudo-random permutation.

    Returns (id, shuffle_key, epoch_pos) with epoch_pos dense 0..N-1.

    Scale shape: same distributed prefix-sum decomposition as
    pack_sequences — one range repartition on the (uniform) key gives
    sorted disjoint ranges, a per-range window numbers rows locally,
    and #partitions partial counts broadcast back as cumulative bases.
    Never a single-partition global window. Compose with
    pack_sequences (order by epoch_pos) for the full shuffled-packed
    training layout."""
    sess = df.sparkSession
    n_ranges = num_ranges or sess.sparkContext.defaultParallelism
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(id_col).cast("string"), F.lit(str(seed))
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    # localCheckpoint, not a leaked persist() — same discipline as
    # pack_sequences above
    part = (
        df.select(F.col(id_col).alias("id"), key.alias("shuffle_key"))
        .repartitionByRange(n_ranges, "shuffle_key", "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid").orderBy("shuffle_key", "id")
    local = part.withColumn("_rn", F.row_number().over(w))
    totals = (
        local.groupBy("_pid")
        .agg(
            F.count("*").alias("t"),
            F.min(F.struct("shuffle_key", "id")).alias("lo"),
        )
        .collect()
    )
    if not totals:
        return sess.createDataFrame([], "id long, shuffle_key long, epoch_pos long")
    base: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: (r["lo"][0], r["lo"][1])):
        base[row["_pid"]] = acc
        acc += row["t"]
    base_col = F.create_map(*[F.lit(x) for kv in base.items() for x in kv])
    return local.select(
        "id",
        "shuffle_key",
        (base_col[F.col("_pid")] + F.col("_rn") - 1).cast("long").alias("epoch_pos"),
    )


def export_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    shard_rows: int = 1000,
    seed: int | None = None,
) -> DataFrame:
    """Write the corpus as deterministic, globally-ordered training
    shards and return the shard manifest.

    The last pipeline stage: after dedup/filter/mix, a training run
    wants the corpus as numbered shards whose concatenation IS the
    training order — reproducible across cluster sizes so the data
    order is experiment config, not scheduler accident. ``seed=None``
    exports in ascending id order; with a seed, the epoch_shuffle
    permutation for that seed becomes the order.

    Layout: ``<path>/shard=<k>/*.parquet`` where shard k holds exactly
    rows [k*shard_rows, (k+1)*shard_rows) of the global order (last
    shard ragged), each file sorted by position.

    Scale shape: order positions come from the distributed prefix sum
    (epoch_shuffle); shard assignment is a pure projection; ONE hash
    exchange on shard id co-locates each shard, and sortWithinPartitions
    orders rows inside it. No global sort, no single-partition window,
    manifest = one tiny agg over positions.
    """
    out = (
        df.join(
            shard_plan(df, id_col, shard_rows, seed).withColumnRenamed(
                "id", id_col
            ),
            id_col,
        )
        .repartition("shard")
        .sortWithinPartitions("epoch_pos")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    written = df.sparkSession.read.parquet(path)
    return (
        written.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("epoch_pos").alias("first_pos"),
            F.max("epoch_pos").alias("last_pos"),
        )
        .orderBy("shard")
    )


def shard_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_rows: int = 1000,
    seed: int | None = None,
) -> DataFrame:
    """The shard-assignment half of export_shards, as a pure frame:
    (id, epoch_pos, shard) where shard k holds exactly global-order
    positions [k*shard_rows, (k+1)*shard_rows). ``seed=None`` orders
    by ascending id; a seed applies that epoch_shuffle permutation.
    Exposed separately so the training order is inspectable (and
    driver-gateable) without writing files; export_shards is exactly
    this plan + partitioned parquet writes.

    Scale shape: positions from the distributed prefix sum; the shard
    column is a scan-local floor division — no extra shuffle."""
    if shard_rows <= 0:
        raise ValueError("shard_rows must be positive")
    if seed is None:
        pos = _rank_by_id(df, id_col)
    else:
        pos = epoch_shuffle(df, id_col=id_col, seed=seed).drop("shuffle_key")
    return pos.withColumn(
        "shard", F.floor(F.col("epoch_pos") / shard_rows).cast("int")
    )


def _rank_by_id(df: DataFrame, id_col: str) -> DataFrame:
    """Dense 0..N-1 rank in ascending id order via the distributed
    prefix sum (same decomposition as epoch_shuffle, constant key)."""
    sess = df.sparkSession
    n_ranges = sess.sparkContext.defaultParallelism
    ranged = df.select(F.col(id_col).alias("id")).repartitionByRange(
        n_ranges, "id"
    )
    # localCheckpoint the _pid-stamped frame, not a leaked persist():
    # read twice (totals collect + the returned select), _pid frozen
    # against RangePartitioner re-sampling, blocks reclaimed on GC;
    # checkpointing pre-window keeps the partition-local Sort in the
    # returned plan (the row_number recompute is one local sort).
    part = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("_pid").orderBy("id")
    local = part.withColumn("_rn", F.row_number().over(w))
    totals = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("t"), F.min("id").alias("lo"))
        .collect()
    )
    if not totals:
        return sess.createDataFrame([], "id long, epoch_pos long")
    base: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["lo"]):
        base[row["_pid"]] = acc
        acc += row["t"]
    base_col = F.create_map(*[F.lit(x) for kv in base.items() for x in kv])
    return local.select(
        "id",
        (base_col[F.col("_pid")] + F.col("_rn") - 1).cast("long").alias("epoch_pos"),
    )


def pack_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    capacity: int = 2048,
    num_ranges: int | None = None,
) -> DataFrame:
    """The dataloader-facing inverse of pack_sequences: one row per
    (window, document) SPAN — for each packed window, which documents
    occupy it, where, and whether the span is a document head/tail.
    This is exactly the structure a training loader turns into
    attention and loss masks (mask attention across is_doc_start
    boundaries; zero the loss on continuation fragments if the recipe
    drops straddled heads), so packing stays a pure layout decision
    and masking a pure read-time one.

    Returns (bin, id, start_in_bin, span_len, is_doc_start,
    is_doc_end); zero-token documents yield a zero-length marker span.
    Every column is integer/boolean arithmetic over pack_sequences'
    positions — engine-exact.

    Scale shape: pack_sequences' distributed prefix sum, then each doc
    explodes to its (last_bin - first_bin + 1) window rows INSIDE the
    row — thin spans, no join, no extra shuffle."""
    pos = pack_sequences(df, id_col, tokens_col, capacity, num_ranges)
    c = F.lit(int(capacity)).cast("long")
    bins = pos.select(
        "id",
        "n_tokens",
        "global_start",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin"),
    )
    span_start = F.greatest(F.col("global_start"), F.col("bin") * c)
    span_end = F.least(
        F.col("global_start") + F.col("n_tokens"), (F.col("bin") + 1) * c
    )
    return bins.select(
        F.col("bin").cast("long").alias("bin"),
        "id",
        (span_start - F.col("bin") * c).cast("long").alias("start_in_bin"),
        (span_end - span_start).cast("long").alias("span_len"),
        (span_start == F.col("global_start")).alias("is_doc_start"),
        (span_end == F.col("global_start") + F.col("n_tokens")).alias(
            "is_doc_end"
        ),
    )


def bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    boundaries: tuple = (16, 64, 256),
    batch_size: int = 8,
    salt: str = "",
    num_ranges: int | None = None,
) -> DataFrame:
    """Length-bucketed batch assignment — the seq2seq dataloader layout
    pack_sequences does NOT cover: instead of concatenating documents
    into fixed windows, group documents of SIMILAR length into batches
    so per-batch padding waste is bounded by the bucket width (batching
    a 10-token doc with a 2000-token doc pads the short one 200x).

    ``boundaries`` are ascending length thresholds: bucket = number of
    boundaries <= n_tokens (so (16, 64, 256) yields buckets
    [0,16) [16,64) [64,256) [256,inf)). Within each bucket, documents
    order deterministically by (hash_bucket(id, salt), id) — a seeded
    shuffle, reproducible across engines — and fill batches of
    ``batch_size`` in that order; each bucket's last batch may be
    ragged. Rows with a NULL length carry no layout information and
    are dropped. Returns (id, n_tokens, bucket, batch_idx).

    Scale shape: the bucket id and hash key are scan-local; the
    per-bucket rank is the DISTRIBUTED prefix count (curriculum_select
    / _rank_by_id's decomposition, extended to composite keys) —
    range-partition by (bucket, hash, id), one partition-LOCAL
    row_number window, per-(partition, bucket) counts to the driver
    (<= num_ranges x #buckets rows), broadcast cumulative bases. No
    per-bucket global sort, so a 4-bucket corpus at 100 TB never
    funnels through 4 tasks; integral counts make the split rank
    exactly equal the sequential one."""
    if batch_size <= 0:
        raise ValueError("bucket_batches: batch_size must be positive")
    if list(boundaries) != sorted(set(boundaries)):
        raise ValueError(
            "bucket_batches: boundaries must be strictly ascending"
        )
    from mofka_spark.operators.sampling import hash_bucket

    n_tok = F.col(tokens_col).cast("long")
    bucket = F.size(
        F.filter(
            F.array(*[F.lit(int(b)).cast("long") for b in boundaries]),
            lambda b: n_tok >= b,
        )
    ).cast("int")
    staged = (
        df.filter(n_tok.isNotNull())
        .select(
            F.col(id_col).alias("id"),
            n_tok.alias("n_tokens"),
            bucket.alias("bucket"),
            hash_bucket(F.col(id_col), salt).alias("_h"),
        )
    )
    sess = df.sparkSession
    n_ranges = num_ranges or sess.sparkContext.defaultParallelism
    # localCheckpoint (GC-bounded): read twice (totals + result) and
    # _pid must not re-draw under RangePartitioner re-sampling
    ranged = (
        staged.repartitionByRange(n_ranges, "bucket", "_h", "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid", "bucket").orderBy("_h", "id")
    local = ranged.withColumn("_rn", F.row_number().over(w))
    ptotals = ranged.groupBy("_pid", "bucket").count().collect()
    if not ptotals:
        return sess.createDataFrame(
            [], "id long, n_tokens long, bucket int, batch_idx long"
        )
    # bases: cumulative count of the SAME bucket over earlier pids —
    # range order on (bucket, _h, id) makes pid order = greedy order
    # within each bucket's contiguous pid span
    acc: dict[int, int] = {}
    base: dict[tuple[int, int], int] = {}
    for r in sorted(ptotals, key=lambda r: (r["bucket"], r["_pid"])):
        base[(r["_pid"], r["bucket"])] = acc.get(r["bucket"], 0)
        acc[r["bucket"]] = acc.get(r["bucket"], 0) + r["count"]
    kmod = len(boundaries) + 2
    base_col = F.create_map(
        *[
            F.lit(x)
            for (pid, b), v in base.items()
            for x in (pid * kmod + b, v)
        ]
    )
    rank = (
        base_col[F.col("_pid") * kmod + F.col("bucket")] + F.col("_rn")
    )
    return local.select(
        "id",
        "n_tokens",
        "bucket",
        F.floor((rank - 1) / batch_size).cast("long").alias("batch_idx"),
    )


def bucket_shard_plan(
    batches: DataFrame,
    batches_per_shard: int = 64,
) -> DataFrame:
    """Compose :func:`bucket_batches` output into the shard layout a
    seq2seq dataloader actually consumes: every batch gets a GLOBAL
    dense sequence number and lands WHOLE in one numbered shard —
    a batch is the dataloader's atomic unit, so it must never split
    across shard files the way raw rows may in shard_plan.

    Input: (id, n_tokens, bucket, batch_idx) — bucket_batches'
    schema. Output adds ``batch_seq`` (dense 0..n_batches-1 over
    (bucket asc, batch_idx asc) — similar-length batches stay
    adjacent, so a loader streaming shards in order replays the
    bucketed curriculum) and ``shard`` = batch_seq //
    batches_per_shard (last shard ragged).

    Scale shape: per-bucket batch counts are ONE tiny aggregate
    (#buckets rows to the driver — model-state-sized by
    construction); batch_seq is then a scan-local projection through
    a broadcast offset map. No global window, no extra shuffle —
    the 100 TB corpus never funnels anywhere."""
    if batches_per_shard <= 0:
        raise ValueError(
            "bucket_shard_plan: batches_per_shard must be positive"
        )
    counts = (
        batches.groupBy("bucket")
        .agg((F.max("batch_idx") + 1).alias("nb"))
        .collect()
    )
    sess = batches.sparkSession
    if not counts:
        return sess.createDataFrame(
            [],
            "id long, n_tokens long, bucket int, batch_idx long, "
            "batch_seq long, shard int",
        )
    off: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["bucket"]):
        off[r["bucket"]] = acc
        acc += int(r["nb"])
    off_col = F.create_map(*[F.lit(x) for kv in off.items() for x in kv])
    seq = (off_col[F.col("bucket")] + F.col("batch_idx")).cast("long")
    return batches.select(
        "id",
        "n_tokens",
        "bucket",
        "batch_idx",
        seq.alias("batch_seq"),
        F.floor(seq / batches_per_shard).cast("int").alias("shard"),
    )


def export_bucket_shards(
    batches: DataFrame,
    path: str,
    batches_per_shard: int = 64,
) -> DataFrame:
    """Write :func:`bucket_shard_plan`'s layout as numbered shard
    directories and return the shard manifest — export_shards'
    batch-atomic sibling. Layout: ``<path>/shard=<k>/*.parquet``,
    rows sorted by (batch_seq, id) inside each shard so concatenating
    shards in order IS the batched training order.

    Manifest: (shard, n_batches, n_rows, first_seq, last_seq) —
    exact integer spans, one tiny agg over the written files.

    Scale shape: the plan is scan-local (see bucket_shard_plan); ONE
    hash exchange on shard co-locates each shard's rows for the
    write, sortWithinPartitions orders them — no global sort."""
    plan = bucket_shard_plan(batches, batches_per_shard)
    (
        # shard FIRST in the sort key: the partitioned writer requires
        # its output ordered by the partition column and inserts its
        # own SortExec("shard") above any child that is not — which
        # preserves the (batch_seq, id) order only while that sort
        # stays in memory (spill-merge interleaves equal-key runs).
        # Leading with shard satisfies the writer's requirement, so no
        # extra sort is inserted and the within-shard order is the one
        # we wrote, at any scale.
        plan.repartition("shard")
        .sortWithinPartitions("shard", "batch_seq", "id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    written = batches.sparkSession.read.parquet(path)
    return (
        written.groupBy("shard")
        .agg(
            F.count_distinct("batch_seq").cast("long").alias("n_batches"),
            F.count("*").cast("long").alias("n_rows"),
            F.min("batch_seq").alias("first_seq"),
            F.max("batch_seq").alias("last_seq"),
        )
        .orderBy("shard")
    )
