"""Privacy-review walkthrough: the release-readiness checks a corpus
passes before training data leaves a privacy boundary.

    PII scan + redaction -> term blocklist -> k-anonymity /
    l-diversity over quasi-identifiers -> redacted export order

Each stage is a pure DataFrame transform from mofka_spark.operators —
same calls at 100 TB; see SCALING.md for shuffle budgets.

Run:  PYTHONPATH=.. python privacy_pipeline.py
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mofka_spark.operators import quality, text
from mofka_spark.session import get_spark


def main(spark=None) -> None:
    owns_spark = spark is None
    if owns_spark:
        spark = get_spark(master="local[4]")
    docs = spark.createDataFrame(
        [
            (1, "contact me at jane.doe@example.com or 555-867-5309", "web"),
            (2, "server logs show 192.168.1.17 rejecting the handshake", "web"),
            (3, "a perfectly clean paragraph about broadcast joins", "web"),
            (4, "send the invoice to billing@corp.example please", "mail"),
        ],
        ["doc_id", "text", "source"],
    )

    # 1. PII detection + redaction: counts per category and the
    # redacted text (email -> <EMAIL>, phone -> <PHONE>, ip -> <IP>).
    scanned = text.pii_scan(docs)
    print("PII scan:")
    scanned.orderBy("id").show(truncate=False)

    # 2. blocklist scan over the redacted text (here: ban the word
    # 'invoice'): docs that still carry banned terms after redaction.
    redacted = scanned.select("id", F.col("redacted").alias("text"))
    flagged = text.blocklist_scan(redacted, ["invoice"], id_col="id")
    print("blocklist hits:")
    flagged.filter(F.col("flagged")).show(truncate=False)

    # 3. k-anonymity / l-diversity over the event stream's
    # quasi-identifiers: any (event_type, hour) group smaller than k
    # is re-identifiable; a group whose members share one user leaks
    # that user even at size >= k.
    ev = spark.createDataFrame(
        [
            (u, t, datetime.datetime(2024, 1, 1, h))
            for u, t, h in [
                (1, "view", 9), (2, "view", 9), (3, "view", 9),
                (1, "purchase", 9), (1, "purchase", 10),
                (1, "click", 11), (1, "click", 11), (1, "click", 11),
            ]
        ],
        ["user_id", "event_type", "ts"],
    )
    audit = quality.k_anonymity(
        ev.select("event_type", F.hour("ts").alias("hour"), "user_id"),
        ["event_type", "hour"],
        k=3,
        sensitive_col="user_id",
    )
    print("k-anonymity audit (k=3):")
    audit.orderBy("event_type", "hour").show()

    # 4. deterministic export order for the docs that survived review:
    # the same shard plan export_shards writes, inspectable first.
    from mofka_spark.operators.packing import shard_plan

    survivors = redacted.join(
        flagged.filter(~F.col("flagged")).select("id"), "id",
        "left_semi",
    )
    print("release shard plan:")
    shard_plan(survivors, "id", shard_rows=2).orderBy("epoch_pos").show()

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    main()
