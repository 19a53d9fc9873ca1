"""Golden byte-view tests — exact parity with the reference's
DataSelection suite (FIXTURES.md F2;
/root/reference/tests/MofkaDataSelectionTest.cpp)."""

import pytest
from pyspark.sql import functions as F

from mofka_spark.errors import InvalidViewError
from mofka_spark.functions.views import DataDescriptor, select_bytes, slice_segments

PAYLOAD = b"abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"  # 52 bytes


@pytest.fixture(scope="module")
def one_event(spark):
    return spark.createDataFrame(
        [('{"x": 123}', PAYLOAD)], "metadata string, data binary"
    )


def _run(df, col):
    return bytes(df.select(col.alias("out")).first()["out"])


# -- python-side (descriptor.apply) and Spark-side must both match goldens

GOLDENS = [
    ("null", DataDescriptor.null(), b""),
    ("identity", DataDescriptor.identity(52), PAYLOAD),
    ("sub", DataDescriptor.identity(52).make_sub_view(13, 26), b"nopqrstuvwxyzABCDEFGHIJKLM"),
    (
        "strided",
        DataDescriptor.identity(52).make_strided_view(13, 3, 4, 2),
        b"nopqtuvwzABC",
    ),
    (
        "unstructured",
        DataDescriptor.identity(52).make_unstructured_view([(3, 6), (15, 4), (27, 8)]),
        b"defghipqrsBCDEFGHI",
    ),
]


@pytest.mark.parametrize("name,desc,expected", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_golden_python(name, desc, expected):
    assert desc.apply(PAYLOAD) == expected


@pytest.mark.parametrize("name,desc,expected", GOLDENS, ids=[g[0] for g in GOLDENS])
def test_golden_spark(one_event, name, desc, expected):
    assert _run(one_event, desc.to_column("data")) == expected


def test_unsized_identity_spark(one_event):
    assert _run(one_event, DataDescriptor.identity().to_column("data")) == PAYLOAD


def test_view_composition_rebases():
    """Views compose relative to the selected region (SURVEY.md §2.6)."""
    sub = DataDescriptor.identity(52).make_sub_view(13, 26)  # n..M
    sub2 = sub.make_sub_view(5, 4)  # relative to sub -> payload[18:22]
    assert sub2.apply(PAYLOAD) == PAYLOAD[18:22] == b"stuv"
    # strided re-based through an unstructured parent
    un = DataDescriptor.identity(52).make_unstructured_view([(0, 10), (40, 10)])
    sub3 = un.make_sub_view(8, 4)  # spans the two segments
    assert sub3.apply(PAYLOAD) == PAYLOAD[8:10] + PAYLOAD[40:42]


def test_view_overflow_raises():
    with pytest.raises(InvalidViewError):
        DataDescriptor.identity(52).make_sub_view(50, 10)
    with pytest.raises(InvalidViewError):
        DataDescriptor.identity(52).make_sub_view(-1, 4)


def test_flatten_coalesces_adjacent():
    d = DataDescriptor.identity(52).make_unstructured_view([(0, 5), (5, 5), (20, 2)])
    assert d.flatten() == [(0, 10), (20, 2)]


def test_conditional_selection(spark):
    """C3: even event_num -> full payload, odd -> none
    (reference: tests/MofkaEventConsumerTest.cpp:85-132)."""
    rows = [
        (f'{{"event_num": {i}}}', f"This is data for event {i}".encode())
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "metadata string, data binary")
    even = F.get_json_object("metadata", "$.event_num").cast("long") % 2 == 0
    out = df.select(
        F.get_json_object("metadata", "$.event_num").cast("long").alias("i"),
        select_bytes("data", when=even).alias("sel"),
    ).collect()
    for r in out:
        if r["i"] % 2 == 0:
            assert bytes(r["sel"]) == f"This is data for event {r['i']}".encode()
        else:
            assert r["sel"] is None


def test_three_way_conditional(spark):
    """example/consumer.cpp:38-49: full if even & value<70; sub(2,4) if
    even & value>=70; none if odd."""
    rows = [
        ('{"id": 0, "value": 10}', b"0123456789"),
        ('{"id": 2, "value": 90}', b"0123456789"),
        ('{"id": 1, "value": 50}', b"0123456789"),
    ]
    df = spark.createDataFrame(rows, "metadata string, data binary")
    ident = F.col("id_") % 2 == 0
    low = F.col("val_") < 70
    sub24 = DataDescriptor.identity(10).make_sub_view(2, 4)
    out = (
        df.withColumn("id_", F.get_json_object("metadata", "$.id").cast("long"))
        .withColumn("val_", F.get_json_object("metadata", "$.value").cast("double"))
        .withColumn(
            "sel",
            F.when(ident & low, F.col("data"))
            .when(ident & ~low, sub24.to_column("data"))
            .otherwise(F.lit(None).cast("binary")),
        )
        .orderBy("id_")
        .collect()
    )
    assert bytes(out[0]["sel"]) == b"0123456789"
    assert out[1]["sel"] is None
    assert bytes(out[2]["sel"]) == b"2345"


def test_dynamic_segments_column(spark):
    """L5 getData with per-row descriptors: segments as an array column."""
    rows = [
        (PAYLOAD, [(3, 6), (15, 4), (27, 8)]),
        (PAYLOAD, [(0, 1)]),
        (PAYLOAD, []),
    ]
    df = spark.createDataFrame(
        rows, "data binary, segs array<struct<off:int,size:int>>"
    )
    out = df.select(slice_segments("data", F.col("segs")).alias("out")).collect()
    assert bytes(out[0]["out"]) == b"defghipqrsBCDEFGHI"
    assert bytes(out[1]["out"]) == b"a"
    assert bytes(out[2]["out"]) == b""


def test_multi_segment_push_end_to_end(driver):
    """Producer-side multi-segment data: the reference pushes a
    DataView of two non-contiguous 26-byte segments that concatenate
    logically (/root/reference/tests/MofkaDataSelectionTest.cpp:42-52);
    every consumer-side view must see the golden bytes of the
    reference's SECTIONs over the concatenated payload."""
    seg1 = b"abcdefghijklmnopqrstuvwxyz"
    seg2 = b"ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    topic = driver.create_topic("segments")
    with topic.producer("p") as producer:
        producer.push({"x": 123}, [seg1, seg2])
    topic.mark_as_complete()

    def pull_with(selector):
        return list(topic.consumer("c-" + selector.__name__,
                                   data_selector=selector))[0]

    def none_sel(meta, desc):
        return None

    def whole(meta, desc):
        return desc

    def sub(meta, desc):
        return desc.make_sub_view(13, 26)

    def strided(meta, desc):
        return desc.make_strided_view(13, 3, 4, 2)

    def unstructured(meta, desc):
        return desc.make_unstructured_view([(3, 6), (15, 4), (27, 8)])

    assert pull_with(none_sel).data == b""                 # Consume no data
    assert pull_with(whole).data == seg1 + seg2            # whole: 52 bytes
    assert pull_with(sub).data == b"nopqrstuvwxyzABCDEFGHIJKLM"
    assert pull_with(strided).data == b"nopqtuvwzABC"
    assert pull_with(unstructured).data == b"defghipqrsBCDEFGHI"
    # bytearray and tuple forms coerce the same way
    with topic.producer("p2") as producer:
        producer.push({"x": 1}, bytearray(b"ab"))
        producer.push({"x": 2}, (b"a", b"", b"b"))


def test_consumer_data_selector_callable(driver):
    """Client-path DataSelector callable (select by event_num % 2)."""
    topic = driver.create_topic("sel")
    with topic.producer("p") as producer:
        for i in range(6):
            producer.push({"event_num": i}, f"data-{i}".encode())
    topic.mark_as_complete()

    def selector(meta, desc):
        return desc if meta["event_num"] % 2 == 0 else None

    events = list(topic.consumer("c", data_selector=selector))
    assert len(events) == 6
    for ev in events:
        if ev.metadata["event_num"] % 2 == 0:
            assert ev.data == f"data-{ev.metadata['event_num']}".encode()
        else:
            assert ev.data == b""
