"""Dump `.explain("formatted")` artifacts for plans/r<N>/ with a
provenance header (git SHA + dirty-tree flag — r14 verdict item #2:
plan evidence must record the tree it was generated from).

    python tools/dump_plan.py r15 before containment_pairs [more ...]
        -> plans/r15/containment_pairs_before.txt

    python tools/dump_plan.py r15 executed_after containment_pairs
        executes the query (count() sink) and dumps the FINAL AQE plan
        (suffix containing "executed" triggers execution).

SF dir from $SPARK_GRAFT_SF_DIR (default sf0.001 for static plans,
sf0.1 for executed plans — the bench scale, so AQE decisions match).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    rnd, suffix, *names = sys.argv[1:]
    executed = "executed" in suffix
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1" if executed else "/root/testdata/sf0.001",
    )
    from tools.plan_report import stamp_line

    from mofka_spark import plans, queries as q
    from mofka_spark.session import get_spark

    spark = get_spark(
        app_name="dump-plan",
        master="local[8]",
        conf={"spark.sql.shuffle.partitions": "8"},
    )
    out_dir = os.path.join(_REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    header = (
        f"-- {stamp_line()}\n"
        f"-- sf_dir={sf_dir} master=local[8] shuffle_partitions=8\n"
        f"-- {'EXECUTED (final AQE) plan' if executed else 'static plan'}\n"
    )
    for name in names:
        df = q.SPARK_QUERIES[name](spark, sf_dir)
        if executed:
            # collect(), not count(): count() executes a DERIVED plan
            # and leaves this frame's own executedPlan unexecuted
            # (isFinalPlan=false — the r14 bb17ef0 misreading)
            df.collect()
            body = df._jdf.queryExecution().executedPlan().toString()
        else:
            body = plans.plan_string(df)
        out = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(header + body + "\n")
        print(f"wrote {out}")
        df = None
        spark.catalog.clearCache()
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        except Exception:  # noqa: BLE001
            pass
    spark.stop()


if __name__ == "__main__":
    main()
