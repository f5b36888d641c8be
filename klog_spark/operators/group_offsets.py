"""__consumer_offsets analytics — BEYOND the reference surface.

The reference classifies ``__consumer_offsets`` segments but leaves their
payloads undecoded (segment/reader/Segment.java:28 ``// TODO support this``).
This module implements what its README implies the type is for: decoded
offset-commit / group-metadata streams and the per-group consumer-lag
aggregate an operator actually wants from that data.

Scale notes: "latest commit" is one map-side-combinable ``max_by`` per
(group, topic, partition) — the shuffle carries one row per live group-
partition, not per commit. The log-end side is one tiny aggregate over the
batch sink (per topic-partition), broadcast into the join; nothing here is
driver-side or all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_group_offsets(parsed: DataFrame) -> DataFrame:
    """Last offset-commit event per (group, topic, partition), in segment
    order (file name, then line) — Kafka's compaction semantics: the newest
    record wins, and a tombstone (`is_deletion`) deletes the key.
    """
    oc = parsed.filter(F.col("record_class") == "offset_commit")
    ordkey = F.struct(F.col("file"), F.col("line_no"))
    last = oc.groupBy("group_id", "commit_topic", "commit_partition").agg(
        F.max_by(
            F.struct("is_deletion", "committed_offset", "committed_leader_epoch",
                     "commit_timestamp_ms"),
            ordkey,
        ).alias("last")
    )
    return last.filter(~F.col("last.is_deletion")).select(
        "group_id",
        "commit_topic",
        "commit_partition",
        F.col("last.committed_offset").alias("committed_offset"),
        F.col("last.committed_leader_epoch").alias("committed_leader_epoch"),
        F.col("last.commit_timestamp_ms").alias("commit_timestamp_ms"),
    )


def group_lag(parsed: DataFrame) -> DataFrame:
    """Consumer lag per (group, topic, partition): log-end-offset of the
    dumped topic partition minus the group's latest committed offset.

    log-end = max(last_offset)+1 over the *valid* data-segment batches of
    that partition (post-routing `batch` class); commits against topics not
    present in the dump are dropped by the inner join.
    """
    latest = latest_group_offsets(parsed)
    log_end = (
        parsed.filter((F.col("record_class") == "batch") & (F.col("segment_type") == "data"))
        .groupBy("topic", "partition")
        .agg((F.max("last_offset") + F.lit(1)).alias("log_end_offset"))
    )
    joined = latest.join(
        F.broadcast(log_end),
        (latest["commit_topic"] == log_end["topic"])
        & (latest["commit_partition"] == log_end["partition"]),
    )
    return joined.select(
        "group_id",
        "commit_topic",
        "commit_partition",
        "committed_offset",
        "log_end_offset",
        (F.col("log_end_offset") - F.col("committed_offset")).alias("lag"),
    )


def latest_group_metadata(parsed: DataFrame) -> DataFrame:
    """Latest group-metadata record per group (compaction semantics);
    groups whose newest record is a tombstone are dropped."""
    gm = parsed.filter(F.col("record_class") == "group_metadata")
    ordkey = F.struct(F.col("file"), F.col("line_no"))
    last = gm.groupBy("group_id").agg(
        F.max_by(
            F.struct("is_deletion", "protocol_type", "generation", "protocol",
                     "leader", "num_members"),
            ordkey,
        ).alias("last")
    )
    return last.filter(~F.col("last.is_deletion")).select(
        "group_id",
        F.col("last.protocol_type").alias("protocol_type"),
        F.col("last.generation").alias("generation"),
        F.col("last.protocol").alias("protocol"),
        F.col("last.leader").alias("leader"),
        F.col("last.num_members").alias("num_members"),
    )
