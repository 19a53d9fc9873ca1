"""DDL behavior parity (FIXTURES.md F7; reference tests/MofkaDriverTest.cpp)."""

import pytest

from mofka_spark.errors import MofkaError, TopicExistsError, TopicNotFoundError
from mofka_spark.registry import TopicRegistry


@pytest.fixture()
def reg(tmp_path):
    return TopicRegistry(str(tmp_path / "root"))


def test_create_and_exists(reg):
    assert not reg.topic_exists("mytopic")
    cfg = reg.create_topic("mytopic")
    assert cfg.num_partitions == 1
    assert cfg.validator == {"type": "default"}
    assert reg.topic_exists("mytopic")


def test_duplicate_create_fails(reg):
    # reference: tests/MofkaDriverTest.cpp:41
    reg.create_topic("mytopic")
    with pytest.raises(TopicExistsError):
        reg.create_topic("mytopic")


def test_open_missing_fails(reg):
    # reference: tests/MofkaDriverTest.cpp:55
    with pytest.raises(TopicNotFoundError):
        reg.open_topic("nope")


def test_open_roundtrips_config(reg):
    reg.create_topic(
        "t",
        num_partitions=4,
        validator={"type": "eventbridge", "pattern": {"x": [1]}},
        selector={"type": "key_hash", "field": "k"},
    )
    cfg = reg.open_topic("t")
    assert cfg.num_partitions == 4
    assert cfg.validator["type"] == "eventbridge"
    assert cfg.selector["field"] == "k"


def test_list_topics(reg):
    reg.create_topic("b")
    reg.create_topic("a")
    assert reg.list_topics() == ["a", "b"]


def test_name_limits(reg):
    # reference: src/MofkaDriver.cpp:157 (256-char limit)
    reg.create_topic("x" * 256)
    with pytest.raises(MofkaError):
        reg.create_topic("x" * 257)
    with pytest.raises(MofkaError):
        reg.create_topic("")


def test_add_partitions_and_complete(reg):
    reg.create_topic("t", num_partitions=2)
    assert reg.add_partitions("t", 2).num_partitions == 4
    assert not reg.open_topic("t").completed
    reg.mark_as_complete("t")
    assert reg.open_topic("t").completed


def test_destroy(reg):
    reg.create_topic("t")
    reg.destroy_topic("t")
    assert not reg.topic_exists("t")
    with pytest.raises(TopicNotFoundError):
        reg.destroy_topic("t")
