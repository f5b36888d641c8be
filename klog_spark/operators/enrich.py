"""Broadcast-hash-join enrichment.

klog has no joins — correlation happens in in-memory hash maps and in the
operator's head (README.md:140-158 describes a human cross-referencing
segment and snapshot dumps by pid/epoch). Here the lookups become explicit
broadcast joins (dimension tables are tiny against a 10^12-row fact table,
so the join is shuffle-free) and the segment<->snapshot correlation becomes
a real equi-join on (producer_id, producer_epoch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_topic_meta(df: DataFrame, topic_meta: DataFrame) -> DataFrame:
    """Left broadcast join on (topic, partition)."""
    return df.join(F.broadcast(topic_meta), ["topic", "partition"], "left")


def enrich_with_producer_meta(df: DataFrame, producer_meta: DataFrame) -> DataFrame:
    """Left broadcast join on producer_id (-1 sessions stay unenriched)."""
    return df.join(F.broadcast(producer_meta), ["producer_id"], "left")


def open_txn_abort_commands(parsed: DataFrame, topic: str = "$TOPIC_NAME",
                            **filters) -> DataFrame:
    """The README post-mortem workflow (README.md:140-158) as one query:
    find open transactions in the segment dumps, join to producer-snapshot
    states on (producer_id, producer_epoch), and format the
    kafka-transactions.sh abort command the reference prints per matching
    ProducerState (snapshot/cli/AbortCmd.OutputVisitor:68-77)."""
    from .aggregates import open_txns

    open_df = open_txns(parsed, **filters)
    snap = parsed.filter(F.col("record_class") == "producer_state").select(
        "producer_id", "producer_epoch", "coordinator_epoch", "doc_id",
    )
    joined = snap.join(
        open_df.select("producer_id", "producer_epoch"),
        ["producer_id", "producer_epoch"],
        "left_semi",
    )
    return joined.select(
        "producer_id",
        "producer_epoch",
        "coordinator_epoch",
        F.format_string(
            "$KAFKA_HOME/bin/kafka-transactions.sh --bootstrap-server $BOOTSTRAP_URL abort "
            "--topic %s --partition $PART_NUM --producer-id %d --producer-epoch %d "
            "--coordinator-epoch %d",
            F.lit(topic), F.col("producer_id"), F.col("producer_epoch").cast("long"),
            F.col("coordinator_epoch").cast("long"),
        ).alias("abort_command"),
    )


def abort_commands_for(parsed: DataFrame, pid: int, producer_epoch: int) -> DataFrame:
    """snapshot abort-cmd (AbortCmd.java:50-66): required pid+epoch filter
    over producer-state rows, formatted command per match."""
    snap = parsed.filter(
        (F.col("record_class") == "producer_state")
        & (F.col("producer_id") == pid)
        & (F.col("producer_epoch") == producer_epoch)
    )
    return snap.select(
        "doc_id", "producer_id", "producer_epoch", "coordinator_epoch",
        F.format_string(
            "$KAFKA_HOME/bin/kafka-transactions.sh --bootstrap-server $BOOTSTRAP_URL abort "
            "--topic $TOPIC_NAME --partition $PART_NUM --producer-id %d --producer-epoch %d "
            "--coordinator-epoch %d",
            F.col("producer_id"), F.col("producer_epoch").cast("long"),
            F.col("coordinator_epoch").cast("long"),
        ).alias("abort_command"),
    )
