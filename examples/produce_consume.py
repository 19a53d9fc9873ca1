"""End-to-end produce/consume walkthrough (the engine's analog of the
reference's documented flow, /root/reference/docs/_code/producer.py and
consumer.py): create a topic with a validator and a key-hash partition
selector, push events with payloads, flush, then consume with a
metadata-driven data selector and acknowledge.

Run:  PYTHONPATH=.. python produce_consume.py /tmp/mofka-example
"""

from __future__ import annotations

import sys
import tempfile

from mofka_spark.client import Driver, NoMoreEvents
from mofka_spark.functions.views import DataDescriptor
from mofka_spark.session import get_spark


def main(root: str, spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    driver = Driver(spark, root)

    topic = driver.create_topic(
        "sensor_readings",
        num_partitions=2,
        validator={
            "type": "schema",
            "schema": {
                "type": "object",
                "properties": {
                    "sensor": {"type": "string"},
                    "x": {"type": "integer"},
                },
                "required": ["sensor", "x"],
            },
        },
        selector={"type": "key_hash", "field": "sensor"},
    )

    # -- produce ------------------------------------------------------
    with topic.producer("writer", batch_size=16) as producer:
        futures = [
            producer.push(
                {"sensor": f"s{i % 4}", "x": i},
                data=f"reading-{i}".encode(),
            )
            for i in range(100)
        ]
        producer.flush()
    print("first event ids:", [f.wait() for f in futures[:5]])
    topic.mark_as_complete()

    # -- consume with per-event payload selection ---------------------
    def only_even_x(metadata, descriptor):
        # fetch payload bytes only when x is even; first 8 bytes then
        if metadata["x"] % 2:
            return None
        return descriptor.make_sub_view(0, 8)

    consumer = topic.consumer("reader", data_selector=only_even_x)
    n = kept = 0
    while True:
        event = consumer.pull()
        if event is NoMoreEvents:
            break
        n += 1
        if event.data:  # null selection -> size-0 payload, as in the reference
            kept += 1
        event.acknowledge()
    print(f"consumed {n} events, {kept} payloads selected")

    # -- Kafka-flavored control plane over the same service -----------
    # (reference python/py-mofka-kafka.cpp): same registry, so the
    # facade sees the engine topic and vice versa.
    import json
    import os

    from mofka_spark.kafka import KafkaDriver

    cfg_path = os.path.join(root, "kafka.json")
    with open(cfg_path, "w") as f:
        json.dump({"root": root, "replication_factor": 3}, f)
    kd = KafkaDriver(cfg_path, spark=spark)
    kd.create_topic("kafka_clicks", num_partitions=2,
                    config={"retention.ms": "604800000"})
    print("facade sees engine topic:", kd.topic_exists("sensor_readings"))
    print("engine sees facade topic:", driver.topic_exists("kafka_clicks"),
          "| rf:", driver.registry.open_topic("kafka_clicks")
          .extra["kafka"]["replication_factor"])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())
