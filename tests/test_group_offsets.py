"""__consumer_offsets decode + per-group lag (beyond the reference surface:
Segment.java:28 leaves the type a TODO).

The gate query verifies full-value parity vs DuckDB; these tests pin the
SEMANTICS on planted inputs: compaction (newest record wins), tombstone
deletion, and the lag arithmetic against a known log-end offset.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _parse_lines(spark, rows):
    """rows: list of (doc_id, line, source) -> parsed DataFrame."""
    from klog_spark.operators.parse import parse_sequences

    df = spark.createDataFrame(
        [(d, [ord(c) for c in l], s) for d, l, s in rows],
        "doc_id string, tokens array<int>, source string",
    )
    return parse_sequences(df)


def _msg(off, t, group, topic, part, committed, deletion=False, le=None):
    key = f"offset_commit::group={group},topic={topic},partition={part}"
    if deletion:
        payload = "<DELETE>"
    else:
        lee = "Optional.empty" if le is None else f"Optional[{le}]"
        payload = (f"offset={committed},leader_epoch={lee},metadata=,"
                   f"commit_timestamp={t},expire_timestamp=None")
    return (f"| offset: {off} CreateTime: {t} keySize: {len(key)} "
            f"valueSize: {len(payload)} sequence: -1 headerKeys: [] "
            f"key: {key} payload: {payload}")


FILE = "__consumer_offsets-3-00000000000000000000.log.dump.txt"
SRC = "/tmp/kafka-logs/__consumer_offsets-3/00000000000000000000.log"


def _batch_line(base, t, pos, count=1):
    return (f"baseOffset: {base} lastOffset: {base + count - 1} count: {count} "
            f"baseSequence: -1 lastSequence: -1 producerId: -1 producerEpoch: -1 "
            f"partitionLeaderEpoch: 0 isTransactional: false isControl: false "
            f"deleteHorizonMs: OptionalLong.empty position: {pos} CreateTime: {t} "
            f"size: 100 magic: 2 compresscodec: none crc: 1234 isvalid: true")


@pytest.fixture(scope="module")
def co_parsed(spark):
    lines = [
        f"Dumping {SRC}",
        "Log starting offset: 0",
        _batch_line(0, 1000, 0),
        _msg(0, 1000, "g1", "t", 0, committed=10),
        _batch_line(1, 2000, 100),
        _msg(1, 2000, "g1", "t", 0, committed=25, le=4),   # newer wins
        _batch_line(2, 3000, 200),
        _msg(2, 3000, "g1", "t", 1, committed=7),
        _batch_line(3, 4000, 300),
        _msg(3, 4000, "g2", "t", 0, committed=99),
        _batch_line(4, 5000, 400),
        _msg(4, 5000, "g2", "t", 0, committed=0, deletion=True),  # tombstone deletes g2
    ]
    rows = [(f"{FILE}:{i + 1}", ln, SRC) for i, ln in enumerate(lines)]
    # a data-topic segment establishing log-end offsets for t-0 / t-1
    data_lines = [
        "Dumping /tmp/kafka-logs/t-0/00000000000000000000.log",
        "Log starting offset: 0",
        _batch_line(0, 1000, 0, count=30),
    ]
    dfile = "t-0-00000000000000000000.log.dump.txt"
    rows += [(f"{dfile}:{i + 1}", ln, "/tmp/kafka-logs/t-0/00000000000000000000.log")
             for i, ln in enumerate(data_lines)]
    data_lines2 = [
        "Dumping /tmp/kafka-logs/t-1/00000000000000000000.log",
        "Log starting offset: 0",
        _batch_line(0, 1000, 0, count=8),
    ]
    dfile2 = "t-1-00000000000000000000.log.dump.txt"
    rows += [(f"{dfile2}:{i + 1}", ln, "/tmp/kafka-logs/t-1/00000000000000000000.log")
             for i, ln in enumerate(data_lines2)]
    return _parse_lines(spark, rows).cache()


def test_offset_commit_parse(co_parsed):
    oc = co_parsed.filter(F.col("record_class") == "offset_commit")
    assert oc.count() == 5
    r = oc.filter(F.col("offset") == 1).first()
    assert r["group_id"] == "g1" and r["commit_topic"] == "t"
    assert r["commit_partition"] == 0 and r["committed_offset"] == 25
    assert r["committed_leader_epoch"] == 4 and not r["is_deletion"]
    # Optional.empty -> NULL
    r0 = oc.filter(F.col("offset") == 0).first()
    assert r0["committed_leader_epoch"] is None
    # tombstone carries is_deletion and no payload fields
    rt = oc.filter(F.col("offset") == 4).first()
    assert rt["is_deletion"] and rt["committed_offset"] is None
    assert co_parsed.filter(F.col("segment_type") == "consumer_offsets").count() > 0


def test_latest_group_offsets_compaction(co_parsed):
    from klog_spark.operators.group_offsets import latest_group_offsets

    latest = {(r["group_id"], r["commit_partition"]): r["committed_offset"]
              for r in latest_group_offsets(co_parsed).collect()}
    # g1/t-0: offset 25 (newest of 10, 25); g1/t-1: 7; g2/t-0 tombstoned away
    assert latest == {("g1", 0): 25, ("g1", 1): 7}


def test_group_lag(co_parsed):
    from klog_spark.operators.group_offsets import group_lag

    lag = {(r["group_id"], r["commit_partition"]): (r["log_end_offset"], r["lag"])
           for r in group_lag(co_parsed).collect()}
    # t-0 log end = lastOffset 29 + 1 = 30; t-1 log end = 8
    assert lag == {("g1", 0): (30, 5), ("g1", 1): (8, 1)}


def test_malformed_payload_routes_corrupt(spark):
    bad = ("| offset: 0 CreateTime: 1000 keySize: 10 valueSize: 10 sequence: -1 "
           "headerKeys: [] key: offset_commit::group=g,topic=t,partition=0 "
           "payload: offset=oops,leader_epoch=?,commit_timestamp=1000")
    rows = [
        (f"{FILE}:1", f"Dumping {SRC}", SRC),
        (f"{FILE}:2", "Log starting offset: 0", SRC),
        (f"{FILE}:3", _batch_line(0, 1000, 0), SRC),
        (f"{FILE}:4", bad, SRC),
    ]
    parsed = _parse_lines(spark, rows)
    r = parsed.filter(F.col("line_no") == 4).first()
    assert r["record_class"] == "corrupt"
    assert r["corrupt_reason"] == "offset_payload_mismatch"


def test_pipeline_staged_group_lag_matches_direct(spark, fixture_dir, tmp_path):
    """Pipeline API: group lag over a parse-once staging table (partition-
    pruned, parse-free) must equal the direct-parse path."""
    from klog_spark.pipeline import Pipeline

    direct = {tuple(r) for r in Pipeline(spark, fixture_dir).group_lag().collect()}
    staged = Pipeline(spark, fixture_dir).stage(str(tmp_path / "staging"))
    assert {tuple(r) for r in staged.group_lag().collect()} == direct and direct


def test_spark_matches_python_oracle_on_fixture(parsed_df, oracle_parsed):
    """Field-level parity on the seeded fixture's consumer-offsets lines."""
    got = {
        r["doc_id"]: (r["group_id"], r["commit_topic"], r["commit_partition"],
                      r["committed_offset"], r["committed_leader_epoch"],
                      r["is_deletion"], r["generation"], r["num_members"])
        for r in parsed_df.filter(
            F.col("record_class").isin("offset_commit", "group_metadata")
        ).collect()
    }
    want = {
        p.doc_id: (p.fields.get("group_id"), p.fields.get("commit_topic"),
                   p.fields.get("commit_partition"), p.fields.get("committed_offset"),
                   p.fields.get("committed_leader_epoch"), p.fields.get("is_deletion"),
                   p.fields.get("generation"), p.fields.get("num_members"))
        for p in oracle_parsed
        if p.record_class in ("offset_commit", "group_metadata")
    }
    assert got == want and len(got) > 100


def _txn_batch(base, t, pos, pid, epoch, count=1, control=False):
    return (f"baseOffset: {base} lastOffset: {base + count - 1} count: {count} "
            f"baseSequence: 0 lastSequence: {count - 1} producerId: {pid} "
            f"producerEpoch: {epoch} partitionLeaderEpoch: 0 "
            f"isTransactional: true isControl: {str(control).lower()} "
            f"position: {pos} CreateTime: {t} size: 100 magic: 2 "
            f"compresscodec: none crc: 77 isvalid: true")


def _ctl(off, t, commit):
    marker = "COMMIT" if commit else "ABORT"
    return (f"| offset: {off} CreateTime: {t} keySize: 4 valueSize: 6 "
            f"sequence: -1 headerKeys: [] endTxnMarker: {marker} coordinatorEpoch: 1")


def test_read_committed_semantics(spark):
    """Planted flows: committed txn visible, aborted hidden, open hidden,
    COMMIT marker honored across a segment-file boundary."""
    from klog_spark.operators.group_offsets import (
        latest_group_offsets, read_committed_group_offsets,
    )

    src_a = "/tmp/kafka-logs/__consumer_offsets-5/00000000000000000000.log"
    file_a_lines = [
        f"Dumping {src_a}",
        "Log starting offset: 0",
        _batch_line(0, 1000, 0),
        _msg(0, 1000, "g1", "t", 0, committed=10),          # plain: visible
        _txn_batch(1, 2000, 100, pid=7, epoch=0, count=2),
        _msg(1, 2000, "g1", "t", 0, committed=50),
        _msg(2, 2000, "g1", "t", 1, committed=60),
        _txn_batch(3, 3000, 200, pid=7, epoch=0, control=True),
        _ctl(3, 3000, commit=True),                          # commits 50/60
        _txn_batch(4, 4000, 300, pid=7, epoch=0),
        _msg(4, 4000, "g1", "t", 0, committed=99),
        _txn_batch(5, 5000, 400, pid=7, epoch=0, control=True),
        _ctl(5, 5000, commit=False),                         # aborts the 99
        _txn_batch(6, 6000, 500, pid=8, epoch=0),
        _msg(6, 6000, "g1", "t", 2, committed=70),           # never resolved
        _txn_batch(7, 7000, 600, pid=9, epoch=0),
        _msg(7, 7000, "g1", "t", 3, committed=80),           # marker in file B
    ]
    src_b = "/tmp/kafka-logs/__consumer_offsets-5/00000000000000000008.log"
    file_b_lines = [
        f"Dumping {src_b}",
        "Log starting offset: 8",
        _txn_batch(8, 8000, 0, pid=9, epoch=0, control=True),
        _ctl(8, 8000, commit=True),                          # commits the 80
    ]
    fa = "__consumer_offsets-5-00000000000000000000.log.dump.txt"
    fb = "__consumer_offsets-5-00000000000000000008.log.dump.txt"
    rows = [(f"{fa}:{i + 1}", ln, src_a) for i, ln in enumerate(file_a_lines)]
    rows += [(f"{fb}:{i + 1}", ln, src_b) for i, ln in enumerate(file_b_lines)]
    parsed = _parse_lines(spark, rows)

    rc = {(r["group_id"], r["commit_partition"]): r["committed_offset"]
          for r in read_committed_group_offsets(parsed).collect()}
    assert rc == {("g1", 0): 50, ("g1", 1): 60, ("g1", 3): 80}
    ru = {(r["group_id"], r["commit_partition"]): r["committed_offset"]
          for r in latest_group_offsets(parsed).collect()}
    assert ru == {("g1", 0): 99, ("g1", 1): 60, ("g1", 2): 70, ("g1", 3): 80}
