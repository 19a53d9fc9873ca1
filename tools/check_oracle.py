"""Local replica of the driver's correctness gate: run Spark queries vs
DuckDB oracle SQL at sf0.01 and compare row counts, schemas, and
value hashes (columns sorted by name, rows sorted by all columns).

Usage: python tools/check_oracle.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    from mofka_spark.session import get_spark
    from mofka_spark import queries as q

    names = sys.argv[1:] or list(q.SPARK_QUERIES)
    spark = get_spark(
        app_name="oracle-check",
        master="local[8]",
        conf={"spark.sql.shuffle.partitions": "8"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = 0
    for name in names:
        fn = q.SPARK_QUERIES[name]
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in q.ORACLE_SQL:
            print(f"{name}: NO ORACLE (rows={len(sdf)})")
            continue
        odf = con.sql(q.ORACLE_SQL[name]).df()
        s, o = _canon(sdf), _canon(odf)
        rows = len(s) == len(o)
        cols = list(s.columns) == list(o.columns)
        try:
            s2 = s.astype({c: str(o[c].dtype) for c in o.columns}, errors="ignore")
            pd.testing.assert_frame_equal(
                s2, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
            )
            vals = True
        except Exception as e:  # noqa: BLE001
            vals = False
            err = str(e).splitlines()[0:6]
        # the driver hashes STRINGIFIED values, so -0.0 vs 0.0 (or any
        # repr difference inside the 1e-9 tolerance) is a real driver
        # failure even when assert_frame_equal passes — compare reprs
        # too (the r6 user_value_trend lesson).
        strict = vals
        if vals and rows and cols:
            try:
                n_str = int((s2.map(repr) != o.map(repr)).values.sum())
            except Exception:  # noqa: BLE001  (older pandas: applymap)
                n_str = int(
                    (s2.applymap(repr) != o.applymap(repr)).values.sum()
                )
            strict = n_str == 0
            if not strict:
                err = [f"{n_str} stringified cell(s) differ (hash-risk)"]
        status = "OK" if (rows and cols and vals and strict) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} spark_rows={len(s)} oracle_rows={len(o)} cols_match={cols}")
        if (not vals or not strict) and rows and cols:
            print("  value mismatch:", " / ".join(err))
        elif not cols:
            print(f"  spark cols={list(s.columns)} oracle cols={list(o.columns)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
