"""Every driver gate must emit a scalar-only schema.

The driver's correctness canonicalizer sorts rows by all columns via
pandas and hashes stringified values; an Array/Map/Struct/Binary output
column crashes it (round-7's ``doc_hash_embeddings`` red:
``TypeError: unhashable type: 'list'``). The repo convention is to
posexplode array outputs to ``(id, dim, value)`` scalar rows
(``random_projection``). This test walks the full registry and rejects
any gate whose *declared* output schema contains a non-scalar field —
schema inspection is lazy, so no gate result is executed.
"""

from __future__ import annotations

import pytest

from mofka_spark import queries
from tools.check_correctness import _nonscalar_fields


def test_all_gates_emit_scalar_schemas(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, fn in queries.SPARK_QUERIES.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, keep scanning
            errors[name] = f"{type(e).__name__}: {e}"
            continue
        bad = _nonscalar_fields(df.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "gates with non-scalar output columns (driver canonicalizer "
        f"would crash — posexplode to scalar rows): {offenders}"
    )
    assert not errors, f"gates failed to build a plan: {errors}"


def test_nonscalar_detector_matches_driver_semantics(spark):
    import pyspark.sql.functions as F

    df = spark.range(3).select(
        "id", F.array(F.lit(1.0), F.lit(2.0)).alias("embedding")
    )
    assert _nonscalar_fields(df.schema) == ["embedding"]
    exploded = df.select("id", F.posexplode("embedding").alias("dim", "value"))
    assert _nonscalar_fields(exploded.schema) == []
