"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query DataFrame at sf0.001
queries()      -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()   -> {name: DuckDB SQL} equivalents (omitted for hash-based
                  ops -> rows-only check)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mofka_spark import queries as q

    return q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mofka_spark import queries as q

    return q.ordered_queries()


def oracle_sql() -> dict[str, str]:
    from mofka_spark import queries as q

    ordered = q.ordered_queries()
    first = {n: q.ORACLE_SQL[n] for n in ordered if n in q.ORACLE_SQL}
    return first
