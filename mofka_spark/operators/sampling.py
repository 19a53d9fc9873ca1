"""Deterministic, engine-portable sampling for training-data curation.

Random Bernoulli sampling (df.sample) is neither reproducible across
engines nor stable under recomputation of a nondeterministic plan. The
curation-pipeline standard is HASH sampling: a row is kept iff
hash(key) mod M < fraction*M — the same rows are selected on every
engine, every run, every retry, and adding data never flips the
decision for existing rows. The hash is md5-derived so an external
oracle (DuckDB, Trino, ...) computes the identical selection.

Scale: a pure projection + filter, no shuffle, pushes down to the scan
like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MOD = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6) from md5(salt || key).

    DuckDB equivalent:
    ``('0x' || substr(md5(salt || key::VARCHAR), 1, 12))::BIGINT % 1000000``
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(_MOD))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected deterministically by key."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * _MOD))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language quotas for
    a training mix). Strata missing from ``fractions`` use
    ``default_fraction``. Still a single scan + filter — the stratum
    threshold is a when/otherwise chain, no shuffle."""
    bucket = hash_bucket(F.col(key_col), salt)
    thresh = None
    for stratum, frac in fractions.items():
        c = F.lit(int(frac * _MOD))
        thresh = (
            F.when(F.col(strata_col) == stratum, c)
            if thresh is None
            else thresh.when(F.col(strata_col) == stratum, c)
        )
    thresh = (
        thresh.otherwise(F.lit(int(default_fraction * _MOD)))
        if thresh is not None
        else F.lit(int(default_fraction * _MOD))
    )
    return df.filter(bucket < thresh)


def group_cap(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
    salt: str = "",
    prefilter: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash rank (the per-domain quota of web-corpus curation: no single
    domain may contribute more than N documents).

    Selection is deterministic: rank rows within each group by
    (hash_bucket(key), key) and keep rank <= cap — the same rows
    survive on every engine and every run. (Unlike hash_sample's
    fraction cut, a rank-based quota is not append-stable: a new row
    with a smaller hash legitimately displaces the current cap-th row.)

    Scale: the exact form is one shuffle on the group key + a
    per-group sort (rank). For web-scale skew (a hot domain with 1e8
    docs sorted just to keep 1e4) enable ``prefilter``: a first
    partial-agg pass counts each group, and rows are pre-filtered to
    ``bucket < MOD * min(1, 4*cap/n_g)`` before the window — the
    expensive sort then touches ~4*cap rows per group instead of n_g.
    The 4x margin makes under-selection (a group landing < cap
    survivors by hash fluke) vanishingly rare but not impossible, so
    the prefiltered form VERIFIES: it recounts kept rows per group and
    raises if any group fell short of min(cap, n_g) — fail loudly,
    never silently under-sample.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    base = df
    if prefilter:
        counts = df.groupBy(group_col).agg(F.count("*").alias("_n_g"))
        base = df.join(F.broadcast(counts), group_col).filter(
            bucket
            < F.least(
                F.lit(_MOD),
                (F.lit(4 * cap * _MOD) / F.col("_n_g")).cast("long"),
            )
        )
    w = Window.partitionBy(group_col).orderBy(bucket.asc(), F.col(key_col).asc())
    kept = (
        base.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )
    if prefilter:
        kept = kept.persist()
        short = (
            kept.groupBy(group_col, "_n_g")
            .agg(F.count("*").alias("_kept"))
            .filter(F.col("_kept") < F.least(F.lit(cap), F.col("_n_g")))
            .limit(1)
            .count()
        )
        if short:
            raise RuntimeError(
                "group_cap prefilter under-selected a group; rerun with "
                "prefilter=False (or a different salt)"
            )
        return kept.drop("_n_g")
    return kept
