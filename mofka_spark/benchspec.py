"""Benchmark config-space sampling — the `mofkactl benchmark generate`
analog (/root/reference/python/mochi/mofka/mofkactl/benchmark.py:69-315,
/root/reference/python/mochi/mofka/spec.py): the reference builds a
ConfigSpace over service/topic/producer/consumer parameters, samples one
configuration, and prints a benchmark spec JSON for the benchmark binary
to execute.

Spark-first mapping: the service-side dimensions (num_pools,
num_xstreams, metadata/data DB layouts — Bedrock/Argobots provisioning)
are N/A by design here, exactly like SURVEY §2.1 S6/S8: the Spark
scheduler and session own those. In their place the space carries the
ENGINE dimensions that actually steer this implementation at scale —
shuffle partitions, AQE, broadcast threshold, file split size — so a
sampled spec is a complete, runnable experiment for THIS engine the way
the reference's spec is for its own.

Range grammar (the reference's option syntax):
- "8"          -> the constant 8
- "1-16"       -> uniform integer in [1, 16]
- "0.1-0.9"    -> uniform float (float dims only)
- "a,b,c"      -> uniform choice over the listed values

Sampling is explicitly seeded (random.Random(seed)) so specs are
reproducible and diffable — the determinism contract every operator in
this repo follows (the reference delegates this to ConfigSpace's
sampler state).
"""

from __future__ import annotations

import json
import random
from typing import Any


def _parse_int_range(spec: str, rng: random.Random) -> int:
    spec = str(spec).strip()
    if "," in spec:
        return int(rng.choice([s.strip() for s in spec.split(",")]))
    if "-" in spec.lstrip("-")[0:] and not spec.lstrip("-").isdigit():
        lo, hi = spec.split("-", 1) if not spec.startswith("-") else (
            spec[: spec.index("-", 1)],
            spec[spec.index("-", 1) + 1 :],
        )
        lo_i, hi_i = int(lo), int(hi)
        if lo_i > hi_i:
            raise ValueError(f"empty range: {spec!r}")
        return rng.randint(lo_i, hi_i)
    return int(spec)


def _parse_float_range(spec: str, rng: random.Random) -> float:
    spec = str(spec).strip()
    if "," in spec:
        return float(rng.choice([s.strip() for s in spec.split(",")]))
    if spec.count("-") >= 1 and not _is_number(spec):
        lo, hi = spec.split("-", 1)
        lo_f, hi_f = float(lo), float(hi)
        if lo_f > hi_f:
            raise ValueError(f"empty range: {spec!r}")
        return rng.uniform(lo_f, hi_f)
    return float(spec)


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _parse_choice(spec: str, rng: random.Random) -> str:
    return rng.choice([s.strip() for s in str(spec).split(",")])


def _parse_bool_choice(spec: str, rng: random.Random) -> bool:
    vals = []
    for s in str(spec).split(","):
        s = s.strip().lower()
        if s not in ("true", "false"):
            raise ValueError(f"boolean dims take true/false, got {s!r}")
        vals.append(s == "true")
    return rng.choice(vals)


# dimension name -> (kind, default) — defaults mirror the reference's
# benchmark.py option defaults where a dimension exists there
SPACE: dict[str, tuple[str, str]] = {
    # topic (reference: num_partitions / metadata_* / data_* /
    # validator / partition_selector / serializer)
    "num_partitions": ("int", "1"),
    "metadata_num_fields": ("int", "8"),
    "metadata_key_sizes": ("int", "8"),
    "metadata_val_sizes": ("int", "16"),
    "data_num_blocks": ("int", "0"),
    "data_total_size": ("int", "0"),
    "validator": ("choice", "default"),
    "partition_selector": ("choice", "default"),
    "serializer": ("choice", "default"),
    # producer (reference: producer_*)
    "producer_batch_size": ("int", "-1"),
    "producer_adaptive_batch_size": ("bool", "true"),
    "producer_flush_every": ("int", "10"),
    "producer_burst_size": ("int", "1"),
    "num_producers": ("int", "1"),
    # consumer (reference: consumer_*)
    "consumer_batch_size": ("int", "-1"),
    "consumer_check_data": ("bool", "true"),
    "consumer_data_selector_selectivity": ("float", "1.0"),
    "consumer_data_selector_proportion": ("float", "1.0"),
    "num_consumers": ("int", "1"),
    # engine (replaces the reference's server-side pool/xstream dims —
    # the knobs that steer THIS engine's physical plans)
    "spark_shuffle_partitions": ("int", "32"),
    "spark_adaptive_enabled": ("bool", "true"),
    "spark_broadcast_threshold_mb": ("int", "10"),
    "spark_max_partition_mb": ("int", "128"),
}

_PARSERS = {
    "int": _parse_int_range,
    "float": _parse_float_range,
    "choice": _parse_choice,
    "bool": _parse_bool_choice,
}


def sample_spec(
    num_events: int,
    seed: int = 0,
    overrides: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Sample one benchmark configuration from the space. ``overrides``
    maps dimension names to range/choice strings (the CLI's option
    values); unlisted dimensions use their defaults. Unknown dimension
    names raise — a typo'd experiment axis must not silently sample
    the default."""
    overrides = dict(overrides or {})
    unknown = set(overrides) - set(SPACE)
    if unknown:
        raise ValueError(f"unknown dimensions: {sorted(unknown)}")
    rng = random.Random(seed)
    sampled: dict[str, Any] = {}
    # iterate the declared space in definition order so a given seed
    # always draws the same values regardless of override order
    for name, (kind, default) in SPACE.items():
        sampled[name] = _PARSERS[kind](overrides.get(name, default), rng)
    spec = {
        "seed": seed,
        "num_events": int(num_events),
        "topic": {
            k: sampled[k]
            for k in (
                "num_partitions",
                "metadata_num_fields",
                "metadata_key_sizes",
                "metadata_val_sizes",
                "data_num_blocks",
                "data_total_size",
                "validator",
                "partition_selector",
                "serializer",
            )
        },
        "producer": {
            k: sampled[k]
            for k in (
                "num_producers",
                "producer_batch_size",
                "producer_adaptive_batch_size",
                "producer_flush_every",
                "producer_burst_size",
            )
        },
        "consumer": {
            k: sampled[k]
            for k in (
                "num_consumers",
                "consumer_batch_size",
                "consumer_check_data",
                "consumer_data_selector_selectivity",
                "consumer_data_selector_proportion",
            )
        },
        "spark": {
            "spark.sql.shuffle.partitions": str(
                sampled["spark_shuffle_partitions"]
            ),
            "spark.sql.adaptive.enabled": str(
                sampled["spark_adaptive_enabled"]
            ).lower(),
            "spark.sql.autoBroadcastJoinThreshold": str(
                sampled["spark_broadcast_threshold_mb"] * 1024 * 1024
            ),
            "spark.sql.files.maxPartitionBytes": str(
                sampled["spark_max_partition_mb"] * 1024 * 1024
            ),
        },
    }
    return spec


def spec_to_json(spec: dict[str, Any]) -> str:
    return json.dumps(spec, indent=4, sort_keys=False)


# the engine-dim half of SPACE: the knobs that parameterize a
# SparkSession, keyed by the Spark conf name each one emits
_ENGINE_DIMS = (
    "spark_shuffle_partitions",
    "spark_adaptive_enabled",
    "spark_broadcast_threshold_mb",
    "spark_max_partition_mb",
)


def sample_engine_config(
    seed: int = 0,
    overrides: dict[str, str] | None = None,
    base_defaults: bool = True,
) -> dict[str, Any]:
    """The ``mofkactl config generate`` analog
    (/root/reference/python/mochi/mofka/mofkactl/config.py:23-86): the
    reference samples a deployable SERVICE config (servers, metadata
    DBs, pools, xstreams) from a constrained space and prints the spec
    JSON. This engine's deployable unit is a SparkSession conf, so the
    sampled space is the engine-dim half of :data:`SPACE` and the
    output is a ready-to-use conf object: ``{"seed": ..., "spark":
    {conf key: value}}`` — feed the ``spark`` map to
    ``mofka_spark.get_spark(conf=...)`` or spark-defaults.

    ``base_defaults=True`` merges the sampled knobs over the session's
    scale-appropriate defaults (AQE, Arrow, UTC, parquet pushdown) so
    the emitted object is complete, not a fragment."""
    overrides = dict(overrides or {})
    unknown = set(overrides) - set(_ENGINE_DIMS)
    if unknown:
        raise ValueError(f"unknown engine dimensions: {sorted(unknown)}")
    rng = random.Random(seed)
    sampled: dict[str, Any] = {}
    for name in _ENGINE_DIMS:
        kind, default = SPACE[name]
        sampled[name] = _PARSERS[kind](overrides.get(name, default), rng)
    conf: dict[str, str] = {}
    if base_defaults:
        from mofka_spark.session import _DEFAULT_CONF

        conf.update(_DEFAULT_CONF)
    conf.update(
        {
            "spark.sql.shuffle.partitions": str(
                sampled["spark_shuffle_partitions"]
            ),
            "spark.sql.adaptive.enabled": str(
                sampled["spark_adaptive_enabled"]
            ).lower(),
            "spark.sql.autoBroadcastJoinThreshold": str(
                sampled["spark_broadcast_threshold_mb"] * 1024 * 1024
            ),
            "spark.sql.files.maxPartitionBytes": str(
                sampled["spark_max_partition_mb"] * 1024 * 1024
            ),
        }
    )
    return {"seed": seed, "spark": conf}
