"""Topic-to-training-data analytics walkthrough — the capability layer
the reference doesn't have: SQL over topics, snapshot cuts, dedup,
quality filtering, and an incrementally-maintained rollup, all on one
SparkSession.

Run:  PYTHONPATH=.. python analytics_pipeline.py
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from mofka_spark.client import Driver
from mofka_spark.operators import dedup, text
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    driver = Driver(spark, tempfile.mkdtemp())

    topic = driver.create_topic("docs", num_partitions=2)
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "The  quick brown fox jumps over the lazy dog!",  # near dup
        "sphinx of black quartz judge my vow",
    ]
    with topic.producer("loader") as producer:
        for i, body in enumerate(corpus * 20):
            producer.push({"doc_id": i, "text": body}, data=b"")
    # a reproducible cut: everything below these offsets, forever
    cut = topic.snapshot()

    # -- SQL directly over the topic ----------------------------------
    driver.register_views()
    print("events per partition:")
    driver.sql(
        "SELECT partition, COUNT(*) AS n FROM topic_docs GROUP BY partition"
    ).show()

    # -- dedup + quality over the snapshot ----------------------------
    docs = (
        topic.dataframe(until=cut)
        .select(
            F.get_json_object("metadata", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("metadata", "$.text").alias("text"),
        )
    )
    groups = dedup.exact_dedup(docs)
    print("exact-dup groups:", groups.filter("n_copies > 1").count())

    quality = text.quality_features(docs)
    print("quality signals:")
    quality.select("doc_id", "n_tokens", "stopword_ratio").show(5)


if __name__ == "__main__":
    main()
