"""klog's `cat` display renderer (F6): one formatted, ANSI-styled line per
record, byte-for-byte the reference's output shape
(segment/cli/Cat.OutputVisitor:102-163):

* Batch(...) lines bold, with the isValid VALUE unstyled mid-line (the
  reference's ``@|bold ...isValid=|@%s@|bold )|@`` markup),
* ControlMessage commit/abort in bold green/red,
* TransactionStateMessage state in blue,
* DataMessage / TransactionStateDeletion unstyled.

The reference emits styles through picocli's ``Ansi.AUTO`` (suppressed when
not a tty); here ``color=False`` plays that role. Timestamps render via
``Instant.toString`` semantics (filters.instant_string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .filters import instant_string

ESC = "\x1b"
BOLD, BLUE, GREEN_BOLD, RED_BOLD, RESET = (
    f"{ESC}[1m", f"{ESC}[34m", f"{ESC}[32;1m", f"{ESC}[31;1m", f"{ESC}[0m"
)


def _fmt(fmt: str, *cols):
    return F.format_string(fmt, *cols)


def render_cat_lines(parsed: DataFrame, color: bool = True,
                     show_filename: bool = False,
                     show_line_numbers: bool = False) -> DataFrame:
    """(doc_id, file, line_no, display) for every displayable record.

    ``show_filename`` / ``show_line_numbers`` prepend the reference's
    ``location()`` prefixes (``%s:`` / ``%d: `` — Cat.OutputVisitor:115-122,
    the --filename / --line-numbers CLI options)."""
    bold, blue, greenb, redb, reset = (
        (BOLD, BLUE, GREEN_BOLD, RED_BOLD, RESET) if color else ("",) * 5
    )
    s = lambda c: F.col(c).cast("string")  # noqa: E731  Java toString

    batch = F.concat(
        F.lit(bold),
        _fmt(
            "Batch(baseOffset=%d, lastOffset=%d, count=%d, baseSequence=%d, "
            "lastSequence=%d, producerId=%d, producerEpoch=%s, partitionLeaderEpoch=%d, "
            "isTransactional=%s, isControl=%s, position=%d, createTime=%s, size=%d, "
            "magic=%s, compressCodec='%s', crc=%d, isValid=",
            F.col("base_offset"), F.col("last_offset"), F.col("count"),
            F.col("base_sequence"), F.col("last_sequence"), F.col("producer_id"),
            s("producer_epoch"), F.col("partition_leader_epoch"),
            s("is_transactional"), s("is_control"), F.col("position"),
            instant_string(F.col("create_time_ms")), F.col("size"), s("magic"),
            F.col("compress_codec"), F.col("crc"),
        ),
        F.lit(reset), s("is_valid"), F.lit(bold), F.lit(")"), F.lit(reset),
    )
    control = _fmt(
        "  ControlMessage(offset=%d, createTime=%s, keySize=%d, valueSize=%d, "
        "sequence=%d, headers='%s', commit=%s, coordinatorEpoch=%d)",
        F.col("offset"), instant_string(F.col("msg_create_time_ms")),
        F.col("key_size"), F.col("value_size"), F.col("sequence"), F.col("header_keys"),
        F.when(F.col("commit"), F.lit(f"{greenb}commit{reset}")).otherwise(
            F.lit(f"{redb}abort{reset}")),
        F.col("coordinator_epoch"),
    )
    data = _fmt(
        "  DataMessage(offset=%d, createTime=%s, keySize=%d, valueSize=%d, "
        "sequence=%d, headerKeys='%s')",
        F.col("offset"), instant_string(F.col("msg_create_time_ms")),
        F.col("key_size"), F.col("value_size"), F.col("sequence"), F.col("header_keys"),
    )
    state = _fmt(
        "  TransactionStateMessage(offset=%d, createTime=%s, keySize=%d, valueSize=%d, "
        "sequence=%d, headerKeys='%s', transactionId='%s', producerId=%d, producerEpoch=%s, "
        f"state={blue}%s{reset}, partitions='%s', txnLastUpdateTimestamp=%s, txnTimeoutMs=%d)",
        F.col("offset"), instant_string(F.col("msg_create_time_ms")),
        F.col("key_size"), F.col("value_size"), F.col("sequence"), F.col("header_keys"),
        F.col("transactional_id"), F.col("txn_producer_id"), s("txn_producer_epoch"),
        F.col("state"), F.col("partitions"),
        instant_string(F.col("txn_last_update_ms")), F.col("txn_timeout_ms"),
    )
    deletion = _fmt(
        "  TransactionStateDeletion(offset=%d, createTime=%s, keySize=%d, valueSize=%d, "
        "sequence=%d, headerKeys='%s', transactionId='%s')",
        F.col("offset"), instant_string(F.col("msg_create_time_ms")),
        F.col("key_size"), F.col("value_size"), F.col("sequence"), F.col("header_keys"),
        F.col("transactional_id"),
    )
    display = (
        F.when(F.col("record_class") == "batch", batch)
        .when(F.col("record_class") == "control_msg", control)
        .when(F.col("record_class") == "data_msg", data)
        .when(F.col("record_class") == "txn_state", state)
        .when(F.col("record_class") == "txn_deletion", deletion)
    )
    if show_line_numbers:
        display = F.concat(_fmt("%d: ", F.col("line_no")), display)
    if show_filename:
        display = F.concat(F.col("file"), F.lit(":"), display)
    return (
        parsed.filter(F.col("record_class").isin(
            "batch", "control_msg", "data_msg", "txn_state", "txn_deletion"))
        .select("doc_id", "file", "line_no", display.alias("display"))
    )


def batch_record_string() -> "F.Column":
    """The plain (uncolored) ``Batch.toString()`` of the reference
    (segment/model/Batch.java:100-120) as a column over a parsed batch row —
    what TxnStat's empty_txn/open_txn detail lines embed (TxnStat.java:106-127
    prints the record toString, not Cat's styled line)."""
    s = lambda c: F.col(c).cast("string")  # noqa: E731  Java toString
    return _fmt(
        "Batch(baseOffset=%d, lastOffset=%d, count=%d, baseSequence=%d, "
        "lastSequence=%d, producerId=%d, producerEpoch=%s, partitionLeaderEpoch=%d, "
        "isTransactional=%s, isControl=%s, position=%d, createTime=%s, size=%d, "
        "magic=%s, compressCodec='%s', crc=%d, isValid=%s)",
        F.col("base_offset"), F.col("last_offset"), F.col("count"),
        F.col("base_sequence"), F.col("last_sequence"), F.col("producer_id"),
        s("producer_epoch"), F.col("partition_leader_epoch"),
        s("is_transactional"), s("is_control"), F.col("position"),
        instant_string(F.col("create_time_ms")), F.col("size"), s("magic"),
        F.col("compress_codec"), F.col("crc"), s("is_valid"),
    )


def control_record_string() -> "F.Column":
    """``ControlMessage.toString()`` (segment/model/ControlMessage.java:65-76):
    note the raw boolean ``commit=true|false`` and the ``headers=`` key —
    different from Cat's styled commit/abort rendering above."""
    return _fmt(
        "ControlMessage(offset=%d, createTime=%s, keySize=%d, valueSize=%d, "
        "sequence=%d, headers='%s', commit=%s, coordinatorEpoch=%d)",
        F.col("offset"), instant_string(F.col("msg_create_time_ms")),
        F.col("key_size"), F.col("value_size"), F.col("sequence"),
        F.col("header_keys"), F.col("commit").cast("string"),
        F.col("coordinator_epoch"),
    )
