"""Generate PLANS.md: a physical-plan shape report for the headline
queries — the at-a-glance evidence behind SCALING.md's claims (how many
exchanges, what joins, whether filters reached the scan, how narrow the
scans read). Regenerate after plan-affecting changes:

    python tools/plan_report.py            # writes PLANS.md (static)
    python tools/plan_report.py --runtime  # + EXECUTE each query and
                                           # record actual shuffle/spill
                                           # bytes (PLANS_RUNTIME.json +
                                           # extra PLANS.md columns)
    python tools/plan_report.py q1_pricing_summary knn_cosine   # subset

Counts come from the 'simple' explain (each physical operator listed
once); pushdown facts from the formatted explain's scan details. The
--runtime pass retires the static-explain caveat for the byte claims:
persist/localCheckpoint boundaries overstate static exchange counts,
while the runtime columns are the bytes execution actually moved
(status REST API, every stage the query's actions ran). Runtime
defaults to sf0.1 (the bench scale); static-only keeps sf0.001.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

RUNTIME = "--runtime" in sys.argv
SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR",
    "/root/testdata/sf0.1" if RUNTIME else "/root/testdata/sf0.001",
)


def tree_stamp() -> dict:
    """Provenance for every generated plan artifact: the SHA of the
    tree the artifact was generated from, plus whether the working
    tree was dirty at the time. r14's verdict found a plan artifact
    generated from an uncommitted tree shipped as evidence for a
    change that was never committed — artifacts now carry (and loudly
    mark) their generating tree so that class of drift is mechanically
    checkable."""
    import subprocess

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", "-C", _REPO, *args], capture_output=True, text=True
        ).stdout.strip()

    sha = _git("rev-parse", "HEAD") or "unknown"
    # tracked modifications only: untracked files (generated artifacts,
    # scratch probes) cannot change committed code paths, and the
    # artifact being generated is itself untracked until committed
    dirty = bool(_git("status", "--porcelain", "--untracked-files=no"))
    return {"git_sha": sha, "git_dirty": dirty}


def stamp_line() -> str:
    s = tree_stamp()
    mark = " [DIRTY TREE — not committed evidence]" if s["git_dirty"] else ""
    return f"Generated from git {s['git_sha'][:12]}{mark}."

# the per-round headline set: the r1 baseline queries + the heaviest
# pipelines + this round's additions — the queries whose plan shape
# carries the 100 TB story
HEADLINE = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q18_large_orders",
    "top_orders_per_customer",
    "hourly_event_stats",
    "user_sessions",
    "dedup_exact",
    "minhash_dedup",
    "simhash_pairs",
    "containment_pairs",
    "dedup_components",
    "knn_cosine",
    "embedding_neardup",
    "semantic_dedup",
    "kmeans_cells",
    "kcenter_coreset",
    "label_propagation",
    "count_min_freq",
    "bottomk_distinct",
    "value_drift_psi",
    "tfidf_retrieval",
    "bm25_scores",
    "inverted_index",
    "dsir_weights",
    "weighted_sample",
    "pack_sequences",
    "epoch_shuffle",
    "asof_click_purchase",
    "salted_join_skew",
    "user_value_trend",
    "corpus_report",
    "curriculum_budget",
    "quality_blend",
    "cross_corpus_dedup",
    "dedup_representatives",
    "kmeans_silhouette",
    "zipf_fit",
    "pq_adc_topk",
    "shard_plan",
    "doc_hash_embeddings",
    "doc_hash_ann",
    "ivfpq_topk",
    "bpe_vocab",
    "bpe_token_ids",
    "bpe_pack",
    "classifier_scores",
    "bucket_batches",
    "bucket_shards",
    "bpe_stable_ids",
    "encoding_noise",
    "retention_curve",
    "curation_select",
    "html_extract",
    "line_filter_docs",
    "line_dedup_corpus",
    "url_canonical",
    "url_dedup",
    "unigram_seed",
    "unigram_vocab",
    "unigram_encode_longest",
    "script_mix",
    "web_link_graph",
    "web_components",
    "zorder_pruning",
    "robots_rules",
    "url_blocklist",
    "blocklist_scan",
    "log_trim",
    "robots_parse",
    "sitemap_parse",
    "crawl_schedule",
    "url_templates",
    "audio_headers",
]


def _count(p: str, op: str) -> int:
    return len(re.findall(rf"\b{op}\b", p))


def report_row(name: str, fn, spark, runtime: bool = False) -> dict:
    from mofka_spark import plans

    # snapshot BEFORE the builder runs: operators with eager work in
    # construction (localCheckpoint pipelines, driver-side model fits)
    # must be charged those stages too
    since = plans.stage_snapshot(spark) if runtime else None
    t0 = time.time()
    df = fn(spark, SF_DIR)
    simple = plans.plan_string(df, mode="simple")
    formatted = plans.plan_string(df)
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", formatted))
    scans = len(re.findall(r"Scan parquet|FileScan|BatchScan", simple))
    # widest ReadSchema column count across scans
    widths = [
        s.count(":") for s in re.findall(r"ReadSchema: struct<([^>]*)>", formatted)
    ]
    row = {
        "query": name,
        "exchanges": _count(simple, "Exchange"),
        "bhj": _count(simple, "BroadcastHashJoin"),
        "smj": _count(simple, "SortMergeJoin"),
        "bnlj": _count(simple, "BroadcastNestedLoopJoin"),
        "windows": _count(simple, "Window"),
        "sorts": _count(simple, "Sort"),
        "scans": scans,
        "pushed": pushed,
        "max_cols": max(widths) if widths else 0,
    }
    if runtime:
        m = plans.runtime_metrics(df, since=since)
        m["exec_sec"] = round(time.time() - t0, 3)
        row["runtime"] = m
        # query isolation: drop whatever the run persisted (the bench
        # _release_rdds discipline) so later rows measure themselves
        df = None  # noqa: F841
        spark.catalog.clearCache()
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(True)
        except Exception:  # noqa: BLE001
            pass
    return row


def _mb(b: int) -> str:
    return f"{b / (1024 * 1024):.1f}"


def main() -> None:
    from mofka_spark import queries as q
    from mofka_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--runtime"]
    names = args or [n for n in HEADLINE if n in q.SPARK_QUERIES]
    conf = {"spark.sql.shuffle.partitions": "8"}
    if RUNTIME:
        # the status REST API needs the UI; port 0 = pick a free one
        conf.update({"spark.ui.enabled": "true", "spark.ui.port": "0"})
    spark = get_spark(app_name="plan-report", master="local[8]", conf=conf)
    if RUNTIME:
        # untimed warmup: JVM, parquet footers, python workers — first
        # row would otherwise carry first-touch costs in exec_sec
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    rows = []
    for n in names:
        try:
            rows.append(report_row(n, q.SPARK_QUERIES[n], spark, RUNTIME))
        except Exception as e:  # noqa: BLE001
            rows.append({"query": n, "error": str(e).splitlines()[0]})
    spark.stop()

    rt_cols = (
        " rt shuffle write MB | rt shuffle read MB | rt spill MB |"
        " rt sec |"
        if RUNTIME
        else ""
    )
    lines = [
        "# PLANS — physical-plan shapes of the headline queries",
        "",
        f"Generated by `python tools/plan_report.py"
        f"{' --runtime' if RUNTIME else ''}` at `{SF_DIR}`.",
        stamp_line(),
        "Counts are physical operators from the simple explain;",
        "`pushed` = scans with non-empty PushedFilters; `max_cols` =",
        "widest ReadSchema (column pruning evidence). The global",
        "invariants — zero CartesianProduct suite-wide, BNLJ only on",
        "pinned bounded crosses — are enforced by",
        "`tests/test_plans.py::TestGlobalPlanAudit`.",
        "",
        "The static exchange count carries a caveat: a",
        "persist()/localCheckpoint boundary inlines its upstream into",
        "every consumer — multi-consumer pipelines (minhash_dedup,",
        "containment_pairs, tfidf_retrieval) overstate exchanges here;",
        "at runtime the persisted frame materializes once and consumers",
        "read InMemoryTableScan/checkpoint output instead.",
    ]
    if RUNTIME:
        lines += [
            "",
            "The `rt` columns retire that caveat for the byte claims:",
            "each query EXECUTED once (count() sink, local[8], untimed",
            "warmup) and the status REST API summed over every stage",
            "the action ran — actual shuffle write/read and spill",
            "(memory+disk); input bytes are omitted (the vectorized",
            "parquet reader under-reports them on a local FS — see",
            "plans.runtime_metrics). Envelopes live in",
            "`PLANS_RUNTIME.json`;",
            "`tests/test_plans.py::TestRuntimeEnvelopes` re-runs a",
            "subset and asserts shuffle bytes stay under them.",
        ]
    lines += [
        "",
        "| query | exchanges | BHJ | SMJ | BNLJ | windows | sorts |"
        " scans | pushed | max cols |" + rt_cols,
        "|---|---|---|---|---|---|---|---|---|---|"
        + ("---|" * 4 if RUNTIME else ""),
    ]
    n_rt_cols = 4 if RUNTIME else 0
    for r in rows:
        if "error" in r:
            lines.append(
                f"| {r['query']} | ERROR: {r['error']} |"
                + " |" * (8 + n_rt_cols)
            )
            continue
        line = (
            "| {query} | {exchanges} | {bhj} | {smj} | {bnlj} | {windows}"
            " | {sorts} | {scans} | {pushed} | {max_cols} |".format(**r)
        )
        if RUNTIME:
            m = r["runtime"]
            line += (
                f" {_mb(m['shuffle_write_bytes'])} |"
                f" {_mb(m['shuffle_read_bytes'])} |"
                f" {_mb(m['memory_spill_bytes'] + m['disk_spill_bytes'])} |"
                f" {m['exec_sec']} |"
            )
        lines.append(line)
    out = os.path.join(_REPO, "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")
    if RUNTIME:
        rt_out = os.path.join(_REPO, "PLANS_RUNTIME.json")
        with open(rt_out, "w") as f:
            json.dump(
                {
                    **tree_stamp(),
                    "sf_dir": SF_DIR,
                    "master": "local[8]",
                    "shuffle_partitions": 8,
                    "queries": {
                        r["query"]: r["runtime"]
                        for r in rows
                        if "runtime" in r
                    },
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {rt_out}")


if __name__ == "__main__":
    main()
