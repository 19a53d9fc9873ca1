"""CLI (python -m mofka_spark) tests — mofkactl-analog DDL surface.

Pure metadata ops: no SparkSession is created anywhere here."""

import io
import json
from contextlib import redirect_stdout

from mofka_spark.__main__ import main


def run(*argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(list(argv))
    return rc, buf.getvalue()


class TestTopicCommands:
    def test_create_list_show_exists(self, tmp_path):
        root = str(tmp_path)
        rc, out = run("topic", "create", "t1", "-r", root, "-n", "3",
                      "--validator", '{"type": "eventbridge", "pattern": {"a": [1]}}')
        assert rc == 0
        cfg = json.loads(out)
        assert cfg["num_partitions"] == 3
        assert cfg["validator"]["type"] == "eventbridge"

        rc, out = run("topic", "list", "-r", root)
        assert rc == 0 and out.split() == ["t1"]

        rc, out = run("topic", "exists", "t1", "-r", root)
        assert rc == 0 and out.strip() == "true"
        rc, out = run("topic", "exists", "nope", "-r", root)
        assert rc == 1 and out.strip() == "false"

        rc, out = run("topic", "show", "t1", "-r", root)
        assert json.loads(out)["name"] == "t1"

    def test_duplicate_create_fails(self, tmp_path):
        root = str(tmp_path)
        assert run("topic", "create", "dup", "-r", root)[0] == 0
        assert run("topic", "create", "dup", "-r", root)[0] == 2

    def test_complete_destroy(self, tmp_path):
        root = str(tmp_path)
        run("topic", "create", "t2", "-r", root)
        rc, out = run("topic", "complete", "t2", "-r", root)
        assert rc == 0 and json.loads(out)["completed"] is True
        assert run("topic", "destroy", "t2", "-r", root)[0] == 0
        assert run("topic", "exists", "t2", "-r", root)[0] == 1

    def test_partition_add_and_stats(self, tmp_path):
        root = str(tmp_path)
        run("topic", "create", "t3", "-r", root, "-n", "1")
        rc, out = run("partition", "add", "t3", "-r", root, "-n", "2")
        assert rc == 0 and json.loads(out)["num_partitions"] == 3
        rc, out = run("topic", "stats", "t3", "-r", root)
        st = json.loads(out)
        assert st == {"completed": False, "partitions": {"0": 0, "1": 0, "2": 0},
                      "topic": "t3", "total_events": 0}

    def test_bad_json_config(self, tmp_path):
        import pytest
        with pytest.raises(SystemExit):
            run("topic", "create", "bad", "-r", str(tmp_path), "--validator", "not-json")


class TestStoreCommands:
    """store compact / store bucketize: the maintenance cadence for the
    incremental summary stores, runnable without writing a driver
    script (these DO bring up a SparkSession — the spark fixture keeps
    get_spark reusing the test session)."""

    def _snap(self, spark, store):
        from mofka_spark.streaming.textindex import read_index

        return {
            (r.token, r.df, tuple(r.postings))
            for r in read_index(spark, store, min_df=1, max_df_ratio=1.0).collect()
        }

    def test_store_compact_and_bucketize(self, spark, tmp_path):
        from mofka_spark.streaming.textindex import index_sink

        store = str(tmp_path / "ti")
        sink = index_sink(store)
        sink(spark.createDataFrame([(1, "a b a"), (2, "a c")], "id long, text string"), 0)
        sink(spark.createDataFrame([(3, "b c a")], "id long, text string"), 1)
        before = self._snap(spark, store)
        assert before  # non-trivial store

        rc, out = run("store", "compact", store, "-k", "textindex")
        assert rc == 0 and json.loads(out)["kind"] == "textindex"
        assert self._snap(spark, store) == before

        try:
            rc, out = run(
                "store", "bucketize", store, "-k", "textindex",
                "-b", "2", "--table", "bk_cli_postings",
            )
            assert rc == 0
            # post-compaction the only epoch is the compacted slot (-1)
            assert json.loads(out)["watermark"] == -1
            assert self._snap(spark, store) == before
        finally:
            spark.sql("DROP TABLE IF EXISTS bk_cli_postings")

    def test_store_compact_requires_group_cols(self, spark, tmp_path):
        rc, _ = run("store", "compact", str(tmp_path / "x"), "-k", "distinct")
        assert rc == 2
