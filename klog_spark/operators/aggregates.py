"""Distributed re-derivation of klog's transactional aggregates.

The reference computes these with a strictly sequential fold whose combiner
was never implemented (segment/reader/TransactionalInfoCollector.java:105-107
returns null — the aggregate cannot parallelize). Here the same semantics
are decomposed into shuffle-parallel primitives:

* the ``openTransactions`` hash-map sessionization (collector lines 62-77,
  89-101) becomes a window cumulative-sum: within a producer session
  ``(producer_id, producer_epoch)`` ordered by stream order
  ``(file, line_no)``, each event's transaction group is the number of
  control events *strictly before* it; the per-group rollup then yields
  committed/aborted sizes + durations, empty transactions (control closing
  a group with no data — EmptyTransaction.java:24-35) and open transactions
  (trailing group with no control),
* commit/abort tallies are counted per control *message* (collector :82-88),
* a control message is attributed to its enclosing batch with a
  last-non-null window over the file (klog's ``currentBatch`` cursor,
  collector :61),
* offset-gap detection (W8, the documented intent of
  AssertBatchesValid.java:23-26) is a per-file ``lag``.

All shuffles key on (producer_id, producer_epoch) or (file) — high
cardinality at scale; hot sessions are bounded by segment size and AQE
handles residual skew. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _stream_window_cols():
    return [F.col("file"), F.col("line_no")]


def _countable_batch():
    """A data-segment batch that survives validity routing: CRC-valid and
    not a sessionless transactional batch (reference-fatal,
    SegmentDumpReader.checkBatch). Such rows remain *cursor* targets —
    klog's currentBatch points at every batch line — but never count as
    events, gaps, or first/last candidates."""
    fatal = F.col("is_transactional") & (
        (F.col("producer_id") == -1) | (F.col("producer_epoch") == -1)
    )
    return F.col("is_valid") & ~fatal


def attach_parent_batch(parsed: DataFrame) -> DataFrame:
    """Attach each record line's enclosing batch header (klog's currentBatch).

    Adds a ``parent`` struct column to every row, carrying the most recent
    batch-header line within the same dump file.
    """
    w = Window.partitionBy("file").orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    parent = F.last(
        F.when(
            F.col("record_class") == "batch",
            F.struct(
                F.col("doc_id").alias("doc_id"),
                F.col("line_no").alias("line_no"),
                F.col("base_offset").alias("base_offset"),
                F.col("last_offset").alias("last_offset"),
                F.col("count").alias("count"),
                F.col("producer_id").alias("producer_id"),
                F.col("producer_epoch").alias("producer_epoch"),
                F.col("create_time_ms").alias("create_time_ms"),
                F.col("partition_leader_epoch").alias("partition_leader_epoch"),
                F.col("is_transactional").alias("is_transactional"),
                F.col("is_control").alias("is_control"),
                F.col("is_valid").alias("is_valid"),
            ),
        ),
        ignorenulls=True,
    ).over(w)
    return parsed.withColumn("parent", parent)


def _txn_base(parsed: DataFrame) -> DataFrame:
    """ONE windowed pass feeding every transactional aggregate.

    Scale shape: the parse output is filtered to batch-header + control
    lines only (the other ~2/3 of lines never enter the shuffle), then a
    single Exchange on `file` serves THREE window expressions (parent
    cursor, previous-valid-batch last_offset for gap detection) — branches
    downstream reuse that exchange, so the Arrow parse runs once.
    """
    rows = parsed.filter(
        (F.col("segment_type") == "data") & F.col("record_class").isin("batch", "control_msg")
    )
    rows = attach_parent_batch(rows)
    w_prev = Window.partitionBy("file").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev_valid_last = F.last(
        F.when((F.col("record_class") == "batch") & _countable_batch(), F.col("last_offset")),
        ignorenulls=True,
    ).over(w_prev)
    return rows.withColumn("prev_last_offset", prev_valid_last)


def _batch_selected(prefix: str, pid, producer_epoch, leader_epoch):
    """BatchPredicate conjunction (segment/cli/BatchPredicate.java:29-62)."""
    p = lambda c: F.col(prefix + c)  # noqa: E731
    cond = F.lit(True)
    if pid is not None:
        cond = cond & (p("producer_id") == F.lit(pid))
    if producer_epoch is not None:
        cond = cond & (p("producer_epoch") == F.lit(producer_epoch))
    if leader_epoch is not None:
        cond = cond & (p("partition_leader_epoch") == F.lit(leader_epoch))
    return cond


def txn_events(parsed: DataFrame, pid: int | None = None, producer_epoch: int | None = None,
               leader_epoch: int | None = None, base: DataFrame | None = None) -> DataFrame:
    """The per-session event stream feeding the transactional fold.

    One row per *valid, selected* transactional data batch (opens/extends a
    txn) or control message attributed to its enclosing batch (klog's
    currentBatch cursor, TransactionalInfoCollector.java:61).
    """
    rows = base if base is not None else _txn_base(parsed)
    is_b = F.col("record_class") == "batch"
    # a transactional data batch without a real session (pid/epoch == -1) is
    # reference-fatal (SegmentDumpReader.checkBatch) — never an event, though
    # it remains a currentBatch cursor target like any other batch line
    data_keep = (
        is_b & F.col("is_valid") & F.col("is_transactional") & ~F.col("is_control")
        & (F.col("producer_id") != -1) & (F.col("producer_epoch") != -1)
        & _batch_selected("", pid, producer_epoch, leader_epoch)
    )
    ctl_keep = (
        ~is_b & F.col("parent").isNotNull() & F.col("parent.is_valid")
        & _batch_selected("parent.", pid, producer_epoch, leader_epoch)
    )
    return rows.filter(data_keep | ctl_keep).select(
        F.when(is_b, F.col("producer_id")).otherwise(F.col("parent.producer_id")).alias("producer_id"),
        F.when(is_b, F.col("producer_epoch")).otherwise(F.col("parent.producer_epoch")).alias("producer_epoch"),
        "file", "line_no",
        # duration uses the enclosing BATCH CreateTime on both sides
        F.when(is_b, F.col("create_time_ms")).otherwise(F.col("parent.create_time_ms")).alias("create_time_ms"),
        F.when(is_b, F.col("doc_id")).otherwise(F.col("parent.doc_id")).alias("doc_id"),
        (~is_b).alias("is_ctl"),
        F.col("commit"),
    )


def txn_groups(parsed: DataFrame, base: DataFrame | None = None, **filters) -> DataFrame:
    """Per-(session, txn-group) rollup. Group id = #controls strictly before."""
    ev = txn_events(parsed, base=base, **filters)
    w = Window.partitionBy("producer_id", "producer_epoch").orderBy(*_stream_window_cols())
    grp = F.coalesce(
        F.sum(F.when(F.col("is_ctl"), 1).otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    ev = ev.withColumn("txn_grp", grp)
    order_key = F.struct(F.col("file"), F.col("line_no"))
    return ev.groupBy("producer_id", "producer_epoch", "txn_grp").agg(
        F.sum(F.when(~F.col("is_ctl"), 1).otherwise(0)).alias("n_data_batches"),
        F.max(F.col("is_ctl")).alias("has_control"),
        F.min(F.when(~F.col("is_ctl"), F.struct(order_key.alias("k"), F.col("create_time_ms").alias("ct"),
                                                F.col("doc_id").alias("doc_id")))).alias("first_data"),
        F.max(F.when(F.col("is_ctl"), F.struct(order_key.alias("k"), F.col("create_time_ms").alias("ct"),
                                               F.col("doc_id").alias("doc_id"),
                                               F.col("commit").alias("commit")))).alias("closing_ctl"),
        F.sum(F.when(F.col("is_ctl") & F.col("commit"), 1).otherwise(0)).alias("n_commit"),
        F.sum(F.when(F.col("is_ctl") & ~F.col("commit"), 1).otherwise(0)).alias("n_abort"),
    )


def txn_stats(parsed: DataFrame, **filters) -> DataFrame:
    """Single-row TransactionalInfo summary (TxnStat output,
    segment/cli/TxnStat.java:94-103) + offset-gap count (W8).

    ONE plan, ONE parse: transactional events and gap rows flow through the
    same filter -> window -> group rollup -> final aggregate, so the Arrow
    parse and the per-file window Exchange each run exactly once (the round-1
    shape re-executed the parse per branch and cross-joined two singleton
    aggregates). Gap rows that are not transactional events bypass the
    session window via a spread partition key (they only contribute a
    counter), so the ``producer_id = -1`` bulk never forms a hot window
    partition.
    """
    pid = filters.get("pid")
    producer_epoch = filters.get("producer_epoch")
    leader_epoch = filters.get("leader_epoch")
    base = _txn_base(parsed)
    is_b = F.col("record_class") == "batch"
    # see txn_events: sessionless transactional batches are reference-fatal,
    # cursor-visible but never events
    data_keep = (
        is_b & F.col("is_valid") & F.col("is_transactional") & ~F.col("is_control")
        & (F.col("producer_id") != -1) & (F.col("producer_epoch") != -1)
        & _batch_selected("", pid, producer_epoch, leader_epoch)
    )
    ctl_keep = (
        ~is_b & F.col("parent").isNotNull() & F.col("parent.is_valid")
        & _batch_selected("parent.", pid, producer_epoch, leader_epoch)
    )
    is_gap = (
        is_b & _countable_batch() & F.col("prev_last_offset").isNotNull()
        & (F.col("base_offset") != F.col("prev_last_offset") + 1)
    )
    ev = base.filter(data_keep | ctl_keep | is_gap).select(
        F.when(is_b, F.col("producer_id")).otherwise(F.col("parent.producer_id")).alias("producer_id"),
        F.when(is_b, F.col("producer_epoch")).otherwise(F.col("parent.producer_epoch")).alias("producer_epoch"),
        "file", "line_no",
        F.when(is_b, F.col("create_time_ms")).otherwise(F.col("parent.create_time_ms")).alias("create_time_ms"),
        ctl_keep.alias("is_ctl"),
        (data_keep | ctl_keep).alias("is_event"),
        is_gap.cast("int").alias("is_gap"),
        F.col("commit"),
    )
    # Session window over transactional events only: non-event (gap-counting)
    # rows get a per-line partition key so they never enter — or skew — the
    # (producer_id, producer_epoch) sort.
    w = Window.partitionBy(
        "producer_id", "producer_epoch",
        F.when(F.col("is_event"), F.lit(-1)).otherwise(F.col("line_no")),
    ).orderBy(*_stream_window_cols())
    cum_ctl = F.coalesce(
        F.sum(F.when(F.col("is_ctl"), 1).otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    ev = ev.withColumn("txn_grp", F.when(F.col("is_event"), cum_ctl).otherwise(F.lit(-1)))
    order_key = F.struct(F.col("file"), F.col("line_no"))
    is_data_ev = F.col("is_event") & ~F.col("is_ctl")
    groups = ev.groupBy("producer_id", "producer_epoch", "txn_grp").agg(
        F.sum(F.when(is_data_ev, 1).otherwise(0)).alias("n_data_batches"),
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("n_events"),
        F.max(F.col("is_ctl")).alias("has_control"),
        F.min(F.when(is_data_ev, F.struct(order_key.alias("k"), F.col("create_time_ms").alias("ct")))).alias("first_data"),
        F.max(F.when(F.col("is_ctl"), F.struct(order_key.alias("k"), F.col("create_time_ms").alias("ct")))).alias("closing_ctl"),
        F.sum(F.when(F.col("is_ctl") & F.col("commit"), 1).otherwise(0)).alias("n_commit"),
        F.sum(F.when(F.col("is_ctl") & ~F.col("commit"), 1).otherwise(0)).alias("n_abort"),
        F.sum("is_gap").alias("n_gaps"),
    )
    closed = F.col("has_control") & (F.col("n_data_batches") > 0)
    empty = F.col("has_control") & (F.col("n_data_batches") == 0)
    opened = ~F.col("has_control") & (F.col("n_events") > 0)
    dur = (F.col("closing_ctl.ct") - F.col("first_data.ct")).cast("int")
    zero = F.lit(0).cast("long")
    return groups.agg(
        # count-like outputs are 0 on an empty stream, never NULL (the
        # reference prints zeros; min/max/avg stay NULL when nothing closed)
        F.coalesce(F.sum("n_commit"), zero).alias("num_committed"),
        F.coalesce(F.sum("n_abort"), zero).alias("num_aborted"),
        F.coalesce(F.sum(F.when(closed, 1).otherwise(0)), zero).alias("txn_size_count"),
        F.sum(F.when(closed, F.col("n_data_batches"))).alias("txn_size_sum"),
        F.min(F.when(closed, F.col("n_data_batches"))).alias("txn_size_min"),
        F.max(F.when(closed, F.col("n_data_batches"))).alias("txn_size_max"),
        F.avg(F.when(closed, F.col("n_data_batches"))).alias("txn_size_avg"),
        F.coalesce(F.sum(F.when(closed, 1).otherwise(0)), zero).alias("txn_dur_count"),
        F.sum(F.when(closed, dur)).alias("txn_dur_sum"),
        F.min(F.when(closed, dur)).alias("txn_dur_min"),
        F.max(F.when(closed, dur)).alias("txn_dur_max"),
        F.avg(F.when(closed, dur)).alias("txn_dur_avg"),
        F.coalesce(F.sum(F.when(empty, 1).otherwise(0)), zero).alias("num_empty_txn"),
        F.coalesce(F.sum(F.when(opened, 1).otherwise(0)), zero).alias("num_open_txn"),
        F.coalesce(F.sum("n_gaps"), zero).alias("num_offset_gaps"),
    )


def open_txns(parsed: DataFrame, **filters) -> DataFrame:
    """Sessions whose trailing group has no closing control
    (collector finisher :109-113; printed TxnStat.java:101-103)."""
    g = txn_groups(parsed, **filters)
    return g.filter(~F.col("has_control")).select(
        "producer_id", "producer_epoch",
        F.col("first_data.doc_id").alias("first_batch_doc_id"),
        F.col("n_data_batches").alias("n_data_batches"),
    )


def empty_txns(parsed: DataFrame, **filters) -> DataFrame:
    """Control batches that closed a transaction with no data
    (EmptyTransaction.java:24-35)."""
    g = txn_groups(parsed, **filters)
    return g.filter(F.col("has_control") & (F.col("n_data_batches") == 0)).select(
        "producer_id", "producer_epoch",
        F.col("closing_ctl.doc_id").alias("closing_batch_doc_id"),
        F.col("closing_ctl.commit").alias("commit"),
    )


def offset_gaps(parsed: DataFrame) -> DataFrame:
    """Valid data-segment batches whose base offset != previous last+1 within
    the same dump file (W8 — north rule's offset-gap detections)."""
    b = parsed.filter(
        (F.col("segment_type") == "data") & (F.col("record_class") == "batch") & _countable_batch()
    )
    w = Window.partitionBy("file").orderBy("line_no")
    prev_last = F.lag("last_offset").over(w)
    return (
        b.withColumn("prev_last_offset", prev_last)
        .filter(F.col("prev_last_offset").isNotNull() & (F.col("base_offset") != F.col("prev_last_offset") + 1))
        .select("doc_id", "file", "line_no", "topic", "partition", "base_offset", "prev_last_offset")
    )


def batches_per_epoch(parsed: DataFrame) -> DataFrame:
    """A9: per producer-session batch counts over valid data batches."""
    return (
        parsed.filter(
            (F.col("segment_type") == "data") & (F.col("record_class") == "batch")
            & _countable_batch() & (F.col("producer_id") != -1)
        )
        .groupBy("producer_id", "producer_epoch")
        .agg(F.count("*").alias("n_batches"))
    )


def first_last_batch(parsed: DataFrame) -> DataFrame:
    """A4: first and last valid data batch in stream order."""
    b = parsed.filter(
        (F.col("segment_type") == "data") & (F.col("record_class") == "batch") & _countable_batch()
    )
    key = F.struct(F.col("file"), F.col("line_no"))
    return b.agg(
        F.min_by(F.col("doc_id"), key).alias("first_batch_doc_id"),
        F.max_by(F.col("doc_id"), key).alias("last_batch_doc_id"),
    )


def topics_sanity(parsed: DataFrame) -> DataFrame:
    """A8: txn-stat requires all data dumps to come from one topic
    (TxnStat.java:78-81; note the reference's topicName() quirk keeps only
    the '-<partition>' suffix, SegmentDumpReader.java:343 — we expose both)."""
    return parsed.filter(F.col("segment_type") == "data").agg(
        F.countDistinct("topic").alias("n_topics"),
        F.countDistinct("partition").alias("n_partition_suffixes"),
    )


#: Every record-line class (the '| ...' lines klog's deep-iteration sniff
#: matches, SegmentDumpReader.java:136-163) — including the
#: __consumer_offsets classes this engine decodes beyond the reference.
MSG_CLASSES = ("data_msg", "control_msg", "txn_state", "txn_deletion",
               "offset_commit", "group_metadata")


def deep_iteration_files(parsed: DataFrame) -> DataFrame:
    """S4: per-file deep-iteration flag. klog sniffs lines 3-4 for a
    leading '| ' (SegmentDumpReader.java:136-163); at table scale the flag
    is simply 'does the file contain record lines'."""
    msg_classes = MSG_CLASSES
    files = parsed.filter(F.col("record_class") != "header").select("file").distinct()
    deep = (
        parsed.filter(F.col("record_class").isin(*msg_classes))
        .select("file").distinct().withColumn("deep_iteration", F.lit(True))
    )
    return files.join(deep, "file", "left").fillna(False, ["deep_iteration"])


def nest_messages(parsed: DataFrame) -> DataFrame:
    """Materialize klog's exact Batch shape (Batch.java:33-245): one row per
    batch with its record lines collected as an ordered array of structs
    (Batch.messages, Batch.java:53). Shuffles once on the batch key; message
    arrays are bounded by batch `count` (small), so no skew concern."""
    from .aggregates import attach_parent_batch  # self-import safe

    msg_classes = MSG_CLASSES
    with_parent = attach_parent_batch(
        parsed.filter(F.col("record_class").isin("batch", *msg_classes))
    )
    msgs = with_parent.filter(
        F.col("record_class").isin(*msg_classes) & F.col("parent").isNotNull()
    ).select(
        F.col("parent.doc_id").alias("batch_doc_id"),
        F.struct(
            "record_class", "line_no", "offset", "msg_create_time_ms",
            "key_size", "value_size", "sequence", "header_keys",
            "commit", "coordinator_epoch",
            "transactional_id", "txn_producer_id", "txn_producer_epoch",
            "state", "partitions", "is_deletion",
            "group_id", "commit_topic", "commit_partition", "committed_offset",
            "generation",
        ).alias("message"),
    )
    nested = msgs.groupBy("batch_doc_id").agg(
        F.sort_array(F.collect_list(F.struct(F.col("message.line_no").alias("k"),
                                             F.col("message").alias("m")))).alias("_sorted")
    ).select("batch_doc_id", F.col("_sorted.m").alias("messages"))
    batches = parsed.filter(F.col("record_class") == "batch")
    return batches.join(nested, batches["doc_id"] == nested["batch_doc_id"], "left").drop(
        "batch_doc_id"
    ).withColumn("messages", F.coalesce(F.col("messages"), F.array()))
