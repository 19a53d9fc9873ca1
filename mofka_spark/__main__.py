"""mofka-spark control-plane CLI — the mofkactl analog.

The reference ships ``mofkactl`` (typer-based) with ``topic create/...``
and ``partition add`` command groups
(/root/reference/python/mochi/mofka/mofkactl/__main__.py:7-25,
topic.py:11-55, partition.py:11-60). This CLI covers the same DDL
surface against the Spark engine's directory-backed registry. Registry
operations are pure metadata (JSON files on the shared filesystem) — no
SparkSession, no JVM: ``python -m mofka_spark topic list -r /data/mofka``
returns in milliseconds. Commands that need the data plane (``topic
stats``) read only the O(#partitions) ledger, not event data.

Usage::

    python -m mofka_spark topic create mytopic -r ROOT -n 4 \
        --validator '{"type": "schema", "schema": {...}}'
    python -m mofka_spark topic list -r ROOT
    python -m mofka_spark topic exists mytopic -r ROOT   # exit 0/1
    python -m mofka_spark topic stats mytopic -r ROOT
    python -m mofka_spark topic complete mytopic -r ROOT
    python -m mofka_spark topic destroy mytopic -r ROOT
    python -m mofka_spark partition add mytopic -r ROOT -n 2
"""

from __future__ import annotations

import argparse
import json
import sys

from mofka_spark.errors import MofkaError


def _jarg(s: str | None, what: str) -> dict:
    if s is None:
        return {}
    try:
        doc = json.loads(s)
    except ValueError as e:
        raise SystemExit(f"error: --{what} must be a JSON object: {e}")
    if not isinstance(doc, dict):
        raise SystemExit(f"error: --{what} must be a JSON object")
    return doc


def _registry(args):
    from mofka_spark.registry import TopicRegistry

    return TopicRegistry(args.root)


def cmd_topic_create(args) -> int:
    reg = _registry(args)
    cfg = reg.create_topic(
        args.name,
        num_partitions=args.partitions,
        validator=_jarg(args.validator, "validator") or None,
        selector=_jarg(args.selector, "selector") or None,
        serializer=_jarg(args.serializer, "serializer") or None,
        backend=args.backend,
    )
    print(cfg.to_json())
    return 0


def cmd_topic_list(args) -> int:
    for name in _registry(args).list_topics():
        print(name)
    return 0


def cmd_topic_exists(args) -> int:
    ok = _registry(args).topic_exists(args.name)
    print("true" if ok else "false")
    return 0 if ok else 1


def cmd_topic_show(args) -> int:
    print(_registry(args).open_topic(args.name).to_json())
    return 0


def cmd_topic_complete(args) -> int:
    print(_registry(args).mark_as_complete(args.name).to_json())
    return 0


def cmd_topic_destroy(args) -> int:
    _registry(args).destroy_topic(args.name)
    return 0


def cmd_topic_stats(args) -> int:
    """Events per partition from the ledger — O(#partitions), no Spark."""
    import os

    from mofka_spark.streaming.source import _read_ledger

    reg = _registry(args)
    cfg = reg.open_topic(args.name)
    ledger = _read_ledger(reg.topic_path(args.name))
    parts = {str(p): int(ledger.get(str(p), 0)) for p in range(cfg.num_partitions)}
    print(
        json.dumps(
            {
                "topic": cfg.name,
                "completed": cfg.completed,
                "partitions": parts,
                "total_events": sum(parts.values()),
            },
            sort_keys=True,
        )
    )
    return 0


def cmd_partition_add(args) -> int:
    cfg = _registry(args).add_partitions(args.name, args.count)
    print(cfg.to_json())
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="mofka_spark", description="Mofka-Spark CLI.")
    sub = ap.add_subparsers(dest="group", required=True)

    topic = sub.add_parser("topic", help="Manipulate topics").add_subparsers(
        dest="cmd", required=True
    )

    def _std(p, name=True):
        if name:
            p.add_argument("name", help="Topic name")
        p.add_argument("-r", "--root", required=True, help="Engine root directory")

    p = topic.add_parser("create", help="Register a topic")
    _std(p)
    p.add_argument("-n", "--partitions", type=int, default=1)
    p.add_argument("-v", "--validator", help="Validator config (JSON)")
    p.add_argument("-p", "--selector", help="Partition selector config (JSON)")
    p.add_argument("-s", "--serializer", help="Serializer config (JSON)")
    p.add_argument("-b", "--backend", default="default", choices=["default", "memory"])
    p.set_defaults(fn=cmd_topic_create)

    p = topic.add_parser("list", help="List topics")
    _std(p, name=False)
    p.set_defaults(fn=cmd_topic_list)

    for cname, fn, hlp in [
        ("exists", cmd_topic_exists, "Check existence (exit code 0/1)"),
        ("show", cmd_topic_show, "Print a topic's persisted config"),
        ("complete", cmd_topic_complete, "Mark a topic complete (L8)"),
        ("destroy", cmd_topic_destroy, "Destroy a topic (S9)"),
        ("stats", cmd_topic_stats, "Events per partition from the ledger"),
    ]:
        p = topic.add_parser(cname, help=hlp)
        _std(p)
        p.set_defaults(fn=fn)

    part = sub.add_parser("partition", help="Manipulate partitions").add_subparsers(
        dest="cmd", required=True
    )
    p = part.add_parser("add", help="Add partitions to a topic (S5)")
    _std(p)
    p.add_argument("-n", "--count", type=int, default=1)
    p.set_defaults(fn=cmd_partition_add)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except MofkaError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
