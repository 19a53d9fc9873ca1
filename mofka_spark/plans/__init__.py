"""Physical-plan inspection helpers.

Scale discipline is enforced by looking at plans, not guessing: these
helpers stringify a DataFrame's executed plan so tests can assert the
properties that matter at 100 TB — filters reached the Parquet scan
(row-group pruning), no accidental windows/sorts on hot paths, joins
chose the intended strategy, codegen stages span the operators they
should.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True when a predicate on ``column`` reached the scan's
    PushedFilters list (Catalyst pushdown succeeded)."""
    plan = plan_string(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and column in line:
            return True
    return False


def has_operator(df: DataFrame, name: str) -> bool:
    """True when the physical plan contains an operator whose name
    includes ``name`` (e.g. 'Window', 'SortMergeJoin',
    'BroadcastHashJoin', 'Exchange')."""
    return name in plan_string(df)


def scan_schema(df: DataFrame) -> str:
    """The ReadSchema fragment of the scan — asserts column pruning
    (a scan reading all columns for a narrow projection is wrong)."""
    for line in plan_string(df).splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""
