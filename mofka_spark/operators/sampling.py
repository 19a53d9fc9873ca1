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

from pyspark.sql import Column, DataFrame, functions as F

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
