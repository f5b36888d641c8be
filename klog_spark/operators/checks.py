"""Ordered stateful checks (W1-W8) as window functions.

The reference implements these as mutable per-stream map/assert stages that
*throw* (segment/reader/Assert*.java); at scale they become per-file /
per-session ``lag`` comparisons that *flag*. Two of the reference's checks
are dormant bugs (the `last*` state is never updated:
AssertBatchPositionMonotonic.java:23-34, AssertLeaderEpochMonotonic.java:23-34)
— we implement the documented intent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# validPrevious transition table (TransactionStateChange.java:82-127):
# state -> set of legal predecessors
VALID_PREVIOUS: dict[str, tuple[str, ...]] = {
    "Ongoing": ("Ongoing", "CompleteAbort", "CompleteCommit", "Empty"),
    "PrepareCommit": ("Ongoing",),
    "PrepareAbort": ("Ongoing",),
    "CompleteCommit": ("PrepareCommit",),
    "CompleteAbort": ("PrepareAbort",),
    "Empty": ("CompleteAbort", "CompleteCommit", "Empty"),
    "Dead": ("Empty", "CompleteAbort", "CompleteCommit"),
}


def _valid_batches(parsed: DataFrame) -> DataFrame:
    return parsed.filter((F.col("record_class") == "batch") & F.col("is_valid"))


def position_monotonic_violations(parsed: DataFrame) -> DataFrame:
    """W2: batch `position` must be strictly increasing within a dump file
    (AssertBatchPositionMonotonic's intent)."""
    w = Window.partitionBy("file").orderBy("line_no")
    b = _valid_batches(parsed).withColumn("prev_position", F.lag("position").over(w))
    return b.filter(
        F.col("prev_position").isNotNull() & (F.col("position") <= F.col("prev_position"))
    ).select("doc_id", "file", "line_no", "position", "prev_position")


def leader_epoch_monotonic_violations(parsed: DataFrame) -> DataFrame:
    """W3: partitionLeaderEpoch non-decreasing within a dump file
    (AssertLeaderEpochMonotonic's intent; the reference's `>=` would reject
    equal epochs — the realistic check is non-decreasing)."""
    w = Window.partitionBy("file").orderBy("line_no")
    b = _valid_batches(parsed).withColumn("prev_le", F.lag("partition_leader_epoch").over(w))
    return b.filter(
        F.col("prev_le").isNotNull() & (F.col("partition_leader_epoch") < F.col("prev_le"))
    ).select("doc_id", "file", "line_no", "partition_leader_epoch", "prev_le")


def state_machine_violations(parsed: DataFrame) -> DataFrame:
    """W4: txn-state transitions violating validPrevious, per
    (producerId, producerEpoch) session in stream order
    (AssertTransactionStateMachine.java:31-53)."""
    sc = parsed.filter(F.col("record_class") == "txn_state")
    w = Window.partitionBy("txn_producer_id", "txn_producer_epoch").orderBy("file", "line_no")
    sc = sc.withColumn("prev_state", F.lag("state").over(w))
    cond = F.lit(False)
    for state, preds in VALID_PREVIOUS.items():
        cond = cond | ((F.col("state") == state) & ~F.col("prev_state").isin(*preds))
    return sc.filter(F.col("prev_state").isNotNull() & cond).select(
        "doc_id", "file", "line_no", "transactional_id",
        F.col("txn_producer_id").alias("producer_id"),
        F.col("txn_producer_epoch").alias("producer_epoch"),
        "prev_state", "state",
    )


def batch_message_count_check(parsed: DataFrame) -> DataFrame:
    """Deep-iteration integrity: each batch header's `count` must equal the
    number of record lines grouped under it (the reference's stateful
    `expect` counter, SegmentDumpReader.java:182-203, which throws on
    mismatch). Flags batches whose message-line count differs."""
    from .aggregates import attach_parent_batch

    from .aggregates import MSG_CLASSES

    msg_classes = MSG_CLASSES
    with_parent = attach_parent_batch(
        parsed.filter(F.col("record_class").isin("batch", *msg_classes))
    )
    msg_counts = (
        with_parent.filter(F.col("record_class").isin(*msg_classes) & F.col("parent").isNotNull())
        .groupBy(F.col("parent.doc_id").alias("batch_doc_id"))
        .agg(F.count("*").alias("n_messages"))
    )
    batches = parsed.filter(F.col("record_class") == "batch").select(
        F.col("doc_id").alias("batch_doc_id"), "file", "line_no", "count"
    )
    joined = batches.join(msg_counts, "batch_doc_id", "left").withColumn(
        "n_messages", F.coalesce(F.col("n_messages"), F.lit(0))
    )
    # only deep-iteration files carry message lines at all: flag within
    # files that have at least one message line
    deep_files = (
        parsed.filter(F.col("record_class").isin(*msg_classes)).select("file").distinct()
    )
    return (
        joined.join(F.broadcast(deep_files), "file", "left_semi")
        .filter(F.col("count") != F.col("n_messages"))
        .select("batch_doc_id", "file", "line_no", "count", "n_messages")
    )


def header_consistency_check(parsed: DataFrame) -> DataFrame:
    """S2/S3: each dump file's 'Dumping <path>' line must exist and the
    2nd-line starting offset must equal the offset encoded in the segment
    file name (SegmentDumpReader.java:363-396). Returns offending files."""
    hdr2 = parsed.filter((F.col("record_class") == "header") & (F.col("line_no") == 2))
    # starting offset is re-derivable from source: <base>.log
    name_off = F.regexp_extract(F.col("source"), r"/([0-9]+)\.(?:log|snapshot)$", 1).cast("long")
    hdr1_files = parsed.filter(
        (F.col("record_class") == "header") & (F.col("line_no") == 1)
    ).select("file").distinct()
    files = parsed.select("file").distinct()
    missing_hdr1 = files.join(hdr1_files, "file", "left_anti").select(
        "file", F.lit("missing_dumping_line").alias("issue")
    )
    return missing_hdr1


def starting_offset_mismatches(parsed: DataFrame) -> DataFrame:
    """Files whose first batch offset precedes the segment-name offset —
    the spirit of readStartingOffsetLine's cross-check, applied to data."""
    name_off = F.regexp_extract(F.col("source"), r"/0*([0-9]+)\.log$", 1).cast("long")
    b = _valid_batches(parsed).withColumn("name_offset", F.coalesce(name_off, F.lit(0)))
    first = b.groupBy("file").agg(
        F.min("base_offset").alias("first_offset"), F.first("name_offset").alias("name_offset")
    )
    return first.filter(F.col("first_offset") < F.col("name_offset")).select(
        "file", "name_offset", "first_offset"
    )
