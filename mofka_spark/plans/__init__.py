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


def stage_snapshot(spark) -> set:
    """The (stageId, attemptId) set of completed stages right now —
    pass to :func:`runtime_metrics` as ``since`` to charge a query
    with stages its BUILDER already ran (eager localCheckpoints,
    driver-side model fits execute during construction, before any
    sink action)."""
    return set(_completed_stages(spark))


def _completed_stages(spark) -> dict:
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    ui = sc.uiWebUrl
    if not ui:
        raise RuntimeError(
            "runtime metrics need spark.ui.enabled=true (static conf; "
            "set it when the session is first created)"
        )
    url = f"{ui}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {(s["stageId"], s["attemptId"]): s for s in _json.load(r)}


def runtime_metrics(df: DataFrame, since: set | None = None) -> dict:
    """EXECUTE ``df`` (count() sink, full materialization) and return
    the actual executed-stage metrics — shuffle read/write bytes,
    spill, input bytes — aggregated over every stage the action ran,
    via Spark's status REST API.

    This is the runtime counterpart of the static explain: a
    persist/localCheckpoint boundary makes static plans overstate
    exchanges (each consumer inlines the upstream), while these
    numbers are the bytes the execution actually moved. Requires a
    session with ``spark.ui.enabled=true`` (a STATIC SparkContext
    conf — the library default disables it, so use a dedicated
    session, e.g. tools/plan_report.py --runtime).

    Multi-action operators (driver-side model fits, fixture builds)
    contribute ALL their stages — the honest total cost of the query,
    not just the final job's.

    Reliability: the shuffle and spill numbers come from the shuffle
    manager and are exact. ``input_bytes`` is NOT trustworthy here —
    the vectorized parquet reader on a local filesystem reports only
    footer-ish byte counts (measured: a full 10.8 MB lineitem scan
    reports ~17 KB) — so it is returned for completeness but PLANS.md
    does not print it; column-pruning evidence stays with the static
    ReadSchema column instead.
    """
    spark = df.sparkSession
    before = since if since is not None else stage_snapshot(spark)
    df.count()
    new = [
        s for k, s in _completed_stages(spark).items() if k not in before
    ]
    return {
        "n_stages": len(new),
        "shuffle_read_bytes": sum(
            int(s.get("shuffleReadBytes", 0)) for s in new
        ),
        "shuffle_write_bytes": sum(
            int(s.get("shuffleWriteBytes", 0)) for s in new
        ),
        "memory_spill_bytes": sum(
            int(s.get("memoryBytesSpilled", 0)) for s in new
        ),
        "disk_spill_bytes": sum(
            int(s.get("diskBytesSpilled", 0)) for s in new
        ),
        "input_bytes": sum(int(s.get("inputBytes", 0)) for s in new),
        "peak_execution_memory": max(
            (int(s.get("peakExecutionMemory", 0)) for s in new), default=0
        ),
    }
