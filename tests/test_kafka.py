"""KafkaDriver facade (reference python/py-mofka-kafka.cpp:17-52):
create_topic / open_topic / topic_exists over the ordinary engine,
plus the facade-only knobs (config file, replication_factor, Kafka
topic config persisted in the registry)."""

import json

import pytest

from mofka_spark.errors import MofkaError, TopicExistsError
from mofka_spark.kafka import KafkaDriver


@pytest.fixture()
def kafka(spark, tmp_path):
    cfg = tmp_path / "kafka.json"
    cfg.write_text(json.dumps({"root": str(tmp_path / "svc")}))
    return KafkaDriver(str(cfg), spark=spark)


class TestKafkaDriver:
    def test_create_open_exists(self, kafka):
        assert not kafka.topic_exists("clicks")
        assert kafka.create_topic("clicks", num_partitions=3) is None
        assert kafka.topic_exists("clicks")
        th = kafka.open_topic("clicks")
        assert th.num_partitions == 3

    def test_duplicate_raises(self, kafka):
        kafka.create_topic("dup")
        with pytest.raises(TopicExistsError):
            kafka.create_topic("dup")

    def test_replication_and_config_persisted(self, kafka):
        kafka.create_topic(
            "t", replication_factor=3, config={"retention.ms": "86400000"}
        )
        k = kafka.open_topic("t")._refresh().extra["kafka"]
        assert k["replication_factor"] == 3
        assert k["config"] == {"retention.ms": "86400000"}

    def test_bad_replication_raises(self, kafka):
        with pytest.raises(MofkaError):
            kafka.create_topic("t", replication_factor=0)

    def test_config_file_defaults_apply(self, spark, tmp_path):
        cfg = tmp_path / "kafka.json"
        cfg.write_text(
            json.dumps({"root": str(tmp_path / "svc"), "replication_factor": 3})
        )
        kd = KafkaDriver(str(cfg), spark=spark)
        kd.create_topic("a")  # unspecified -> file default 3
        kd.create_topic("b", replication_factor=2)  # explicit wins
        kd.create_topic("c", replication_factor=1)  # explicit 1 wins too
        assert kd.open_topic("a")._refresh().extra["kafka"]["replication_factor"] == 3
        assert kd.open_topic("b")._refresh().extra["kafka"]["replication_factor"] == 2
        assert kd.open_topic("c")._refresh().extra["kafka"]["replication_factor"] == 1

    def test_bad_file_replication_factor_raises_at_init(self, spark, tmp_path):
        # a bad config-file default must surface as MofkaError at
        # CONSTRUCTION, not a bare ValueError (or a silent 2.5 -> 2
        # truncation) on the first create_topic (ADVICE r10)
        for bad in ("three", 2.5, 0, -1, True, float("nan"), float("inf")):
            cfg = tmp_path / f"kafka-{bad}.json"
            cfg.write_text(
                json.dumps({"root": str(tmp_path / "svc"), "replication_factor": bad})
            )
            with pytest.raises(MofkaError):
                KafkaDriver(str(cfg), spark=spark)
        # an integral float is unambiguous and accepted as its int
        ok = tmp_path / "kafka-ok.json"
        ok.write_text(
            json.dumps({"root": str(tmp_path / "svc"), "replication_factor": 3.0})
        )
        kd = KafkaDriver(str(ok), spark=spark)
        kd.create_topic("f")
        assert kd.open_topic("f")._refresh().extra["kafka"]["replication_factor"] == 3

    def test_bare_root_dir_accepted(self, spark, tmp_path):
        kd = KafkaDriver(str(tmp_path), spark=spark)
        kd.create_topic("t")
        assert kd.topic_exists("t")

    def test_bad_config_file(self, spark, tmp_path):
        missing = tmp_path / "nope.json"
        with pytest.raises(MofkaError):
            KafkaDriver(str(missing), spark=spark)
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        with pytest.raises(MofkaError):
            KafkaDriver(str(bad), spark=spark)
        noroot = tmp_path / "noroot.json"
        noroot.write_text("{}")
        with pytest.raises(MofkaError):
            KafkaDriver(str(noroot), spark=spark)

    def test_produce_consume_through_facade(self, kafka, spark):
        """Topics the facade creates are ordinary engine topics: the
        whole producer/consumer path works on them unchanged."""
        kafka.create_topic("events", num_partitions=2)
        th = kafka.open_topic("events")
        with th.producer("p") as prod:
            for i in range(6):
                prod.push({"i": i})
        th.mark_as_complete()
        got = sorted(e.metadata["i"] for e in th.consumer("c0"))
        assert got == list(range(6))

    def test_engine_driver_sees_facade_topics(self, kafka, spark, tmp_path):
        """Same registry: the main Driver lists/opens facade topics."""
        from mofka_spark.client import Driver

        kafka.create_topic("shared")
        d = Driver(spark, kafka._driver.root)
        assert "shared" in d.list_topics()
        assert d.open_topic("shared")._refresh().extra["kafka"]["replication_factor"] == 1
