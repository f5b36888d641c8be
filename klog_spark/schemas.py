"""Spark schemas: input table, the wide parsed superset, sink projections.

Field types follow the reference's record model (segment/model/Batch.java:36-53,
BaseMessage.java:24-31, ControlMessage.java:37-38,
TransactionStateChange.java:40-46, snapshot/model/ProducerState.java:38-49):
offsets/ids/timestamps are int64, counts/sizes/epochs int32, producerEpoch
int16, magic int8, CRC parsed as *unsigned* 32-bit (so int64 here, the way
``Integer.parseUnsignedInt`` avoids the sign — SegmentDumpReader.java:235).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

INPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),          # "<dump_file>:<line_no>" lineage (common/Located.java:19-22)
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),          # original segment path -> type/topic inference
    ]
)

# Every parsed line becomes one wide row; `record_class` routes it to its
# sink (the Spark form of klog's SegmentVisitor double-dispatch,
# segment/model/SegmentVisitor.java:19-29).
PARSED_FIELDS: list[tuple[str, object]] = [
    # lineage + routing
    ("doc_id", StringType()),
    ("file", StringType()),
    ("line_no", IntegerType()),
    ("source", StringType()),
    ("n_tok", IntegerType()),
    ("record_class", StringType()),
    ("segment_type", StringType()),       # data | txn_state | consumer_offsets (Segment.Type)
    ("topic", StringType()),
    ("partition", IntegerType()),
    ("corrupt_reason", StringType()),
    # batch-header fields (Batch.java:36-53)
    ("base_offset", LongType()),
    ("last_offset", LongType()),
    ("count", IntegerType()),
    ("base_sequence", IntegerType()),
    ("last_sequence", IntegerType()),
    ("producer_id", LongType()),
    ("producer_epoch", ShortType()),
    ("partition_leader_epoch", IntegerType()),
    ("is_transactional", BooleanType()),
    ("is_control", BooleanType()),
    ("delete_horizon_ms", LongType()),
    ("position", LongType()),
    ("create_time_ms", LongType()),
    ("size", IntegerType()),
    ("magic", ByteType()),
    ("compress_codec", StringType()),
    ("crc", LongType()),
    ("is_valid", BooleanType()),
    # message fields (BaseMessage.java:24-31)
    ("offset", LongType()),
    ("msg_create_time_ms", LongType()),
    ("key_size", IntegerType()),
    ("value_size", IntegerType()),
    ("sequence", IntegerType()),
    ("header_keys", StringType()),
    # control-message fields (ControlMessage.java:37-38)
    ("commit", BooleanType()),
    ("coordinator_epoch", IntegerType()),
    # txn-state fields (TransactionStateChange.java:40-46 / Deletion)
    ("transactional_id", StringType()),
    ("txn_producer_id", LongType()),
    ("txn_producer_epoch", ShortType()),
    ("state", StringType()),
    ("partitions", StringType()),
    ("txn_last_update_ms", LongType()),
    ("txn_timeout_ms", LongType()),
    ("is_deletion", BooleanType()),
    # producer-snapshot fields (ProducerState.java:38-49); shares
    # producer_id/producer_epoch/coordinator_epoch/last_offset/last_sequence
    ("current_txn_first_offset", LongType()),
    ("last_timestamp_ms", LongType()),
    ("first_sequence", IntegerType()),
    ("offset_delta", IntegerType()),
    ("timestamp_ms", LongType()),
    # __consumer_offsets decode — BEYOND the reference surface: the
    # reference classifies the segment type but drops the payload
    # (segment/reader/Segment.java:28 "// TODO support this"). Grammar
    # follows kafka-dump-log.sh --offsets-decoder output: offset-commit and
    # group-metadata messages; tombstones carry is_deletion like txn ones.
    ("group_id", StringType()),
    ("commit_topic", StringType()),
    ("commit_partition", IntegerType()),
    ("committed_offset", LongType()),
    ("committed_leader_epoch", IntegerType()),  # NULL for Optional.empty
    ("commit_metadata", StringType()),
    ("commit_timestamp_ms", LongType()),
    ("expire_timestamp_ms", LongType()),        # NULL for None
    ("protocol_type", StringType()),
    ("generation", IntegerType()),
    ("protocol", StringType()),
    ("leader", StringType()),
    ("num_members", IntegerType()),
]

PARSED_SCHEMA = StructType([StructField(n, t) for n, t in PARSED_FIELDS])

BATCH_COLS = [
    "doc_id", "file", "line_no", "source", "segment_type", "topic", "partition",
    "base_offset", "last_offset", "count", "base_sequence", "last_sequence",
    "producer_id", "producer_epoch", "partition_leader_epoch",
    "is_transactional", "is_control", "delete_horizon_ms", "position",
    "create_time_ms", "size", "magic", "compress_codec", "crc", "is_valid",
]

DATA_MSG_COLS = [
    "doc_id", "file", "line_no", "offset", "msg_create_time_ms",
    "key_size", "value_size", "sequence", "header_keys",
]

CONTROL_MSG_COLS = DATA_MSG_COLS + ["commit", "coordinator_epoch"]

TXN_STATE_COLS = DATA_MSG_COLS + [
    "transactional_id", "txn_producer_id", "txn_producer_epoch",
    "state", "partitions", "txn_last_update_ms", "txn_timeout_ms", "is_deletion",
]

PRODUCER_STATE_COLS = [
    "doc_id", "file", "line_no", "producer_id", "producer_epoch",
    "coordinator_epoch", "current_txn_first_offset", "last_timestamp_ms",
    "first_sequence", "last_sequence", "last_offset", "offset_delta", "timestamp_ms",
]

GROUP_OFFSET_COLS = DATA_MSG_COLS + [
    "group_id", "commit_topic", "commit_partition", "committed_offset",
    "committed_leader_epoch", "commit_metadata", "commit_timestamp_ms",
    "expire_timestamp_ms", "is_deletion",
]

GROUP_METADATA_COLS = DATA_MSG_COLS + [
    "group_id", "protocol_type", "generation", "protocol", "leader",
    "num_members", "is_deletion",
]

CORRUPT_COLS = ["doc_id", "file", "line_no", "source", "corrupt_reason"]
