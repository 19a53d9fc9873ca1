"""Local replica of the driver's correctness gate.

Runs every queries() entry and its oracle_sql() side-by-side at sf0.01,
compares row count, column names, and values (columns sorted by name,
rows sorted by all columns) — stricter than any hash: exact equality,
with float equality at 1e-9 relative tolerance reported separately from
exact match so rounding-edge risks are visible.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from mofka_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _nonscalar_fields(schema) -> list[str]:
    """Column names whose Spark type the driver's canonicalizer cannot
    sort/hash (Array/Map/Struct/Binary). The driver sorts rows by all
    columns via pandas and crashes on list cells (the round-7
    doc_hash_embeddings red); gates must posexplode to scalar rows."""
    from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

    bad = (ArrayType, MapType, StructType, BinaryType)
    return [f.name for f in schema.fields if isinstance(f.dataType, bad)]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.tolist() if hasattr(v, "tolist") else v
            )
            # The driver does NOT stringify non-scalars — it crashes on
            # them. Mirror that strictness: any list/dict/bytes cell is
            # a hard failure (caught earlier via _nonscalar_fields, but
            # guard the pandas level too for dtype surprises).
            bad = df[c].map(
                lambda v: isinstance(v, (list, dict, bytes, bytearray))
            )
            if bad.any():
                raise TypeError(
                    f"non-scalar cells in column {c!r}: the driver's "
                    "canonicalizer cannot hash these — posexplode the "
                    "gate output to scalar rows"
                )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _values_equal(a, b) -> tuple[bool, bool]:
    """(exact, close)"""
    if a is None and b is None:
        return True, True
    try:
        if pd.isna(a) and pd.isna(b):
            return True, True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False, False
        exact = fa == fb or (math.isnan(fa) and math.isnan(fb))
        close = exact or math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
        return exact, close
    if a == b:
        return True, True
    return False, False


def compare(name: str, spark, con) -> dict:
    t0 = time.time()
    sdf = entrymod.queries()[name](spark, SF_DIR)
    bad_cols = _nonscalar_fields(sdf.schema)
    if bad_cols:
        return {
            "query": name, "status": "NONSCALAR_SCHEMA",
            "nonscalar_cols": bad_cols,
            "hint": "driver canonicalizer crashes on Array/Map/Struct/"
                    "Binary outputs — posexplode to (id, dim, value)",
        }
    spark_pd = sdf.toPandas()
    t1 = time.time()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        return {
            "query": name, "status": "ROWS_ONLY", "rows": len(spark_pd),
            "spark_sec": round(t1 - t0, 2),
        }
    duck_pd = con.execute(oracles[name]).df()
    res = {"query": name, "spark_rows": len(spark_pd), "oracle_rows": len(duck_pd),
           "spark_sec": round(t1 - t0, 2)}
    if len(spark_pd) != len(duck_pd):
        res["status"] = "ROWCOUNT_MISMATCH"
        return res
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        res["status"] = "SCHEMA_MISMATCH"
        res["spark_cols"] = sorted(spark_pd.columns)
        res["oracle_cols"] = sorted(duck_pd.columns)
        return res
    a, b = _normalize(spark_pd), _normalize(duck_pd)
    # The driver hashes values *with* their dtype, so an integer Spark
    # column against a float oracle column (DuckDB HUGEINT -> float64,
    # the q12 trap) hash-mismatches even when every value is equal.
    # Surface that locally as a hard failure.
    dtype_risks = []
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if {ka, kb} <= {"i", "u", "f"} and ("f" in (ka, kb)) != (ka == kb == "f"):
            dtype_risks.append(f"{col}: spark={a[col].dtype} oracle={b[col].dtype}")
    n_exact = n_close = n_bad = 0
    first_bad = None
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            exact, close = _values_equal(x, y)
            if exact:
                n_exact += 1
            elif close:
                n_close += 1
                if first_bad is None:
                    first_bad = ("CLOSE", col, i, x, y)
            else:
                n_bad += 1
                if first_bad is None:
                    first_bad = ("DIFF", col, i, x, y)
    if n_bad:
        res["status"] = "VALUE_MISMATCH"
    elif dtype_risks:
        res["status"] = "DTYPE_MISMATCH"  # values equal, hash would differ
        res["dtype_risks"] = dtype_risks
    elif n_close:
        res["status"] = "CLOSE_ONLY"  # would likely fail a strict hash
    else:
        res["status"] = "MATCH"
    res.update(n_exact=n_exact, n_close=n_close, n_bad=n_bad)
    if first_bad:
        res["first_divergence"] = repr(first_bad)
    return res


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    failures = 0
    names = [n for n in entrymod.queries() if not only or n in only]
    for name in names:
        try:
            res = compare(name, spark, con)
        except Exception as e:  # noqa: BLE001
            res = {"query": name, "status": "ERROR", "error": f"{type(e).__name__}: {e}"}
        ok = res["status"] in ("MATCH", "ROWS_ONLY")
        if not ok:
            failures += 1
        print(("PASS " if ok else "FAIL "), res)
    print(f"\n{len(names) - failures}/{len(names)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
