"""Pure-Python oracle: the reference's semantics, re-implemented naively.

Stands in for running klog itself (a Java CLI we can't execute here). It
re-implements, line-at-a-time and sequentially:

* classification/routing per klog's visitor surface
  (segment/model/SegmentVisitor.java:19-29, parse dispatch in
  segment/reader/SegmentDumpReader.java:167-311),
* the transactional fold of ``TransactionalInfoCollector``
  (segment/reader/TransactionalInfoCollector.java:56-113): commit/abort
  tallies per control *message*, open-transaction map keyed by
  (producerId, producerEpoch), empty transactions (control closing a
  session with nothing open, EmptyTransaction.java:24-35), txn size =
  number of data batches, txn duration = control-batch createTime minus
  first-data-batch createTime (int cast),
* the ordered checks: offset-gap (AssertBatchesValid.java:23-26 intent),
  position / leader-epoch monotonicity (AssertBatchPositionMonotonic.java,
  AssertLeaderEpochMonotonic.java — implementing the *intended* semantics,
  the reference's state update is dormant), and the transaction state
  machine (AssertTransactionStateMachine.java:31-53).

Tests compare the Spark pipeline's distributed results against this oracle
on the same synthetic fixture.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from . import grammar as g


@dataclass
class ParsedLine:
    doc_id: str
    file: str
    line_no: int
    source: str
    record_class: str
    fields: dict


def classify_and_parse(line: str, doc_id: str, file: str, line_no: int, source: str) -> ParsedLine:
    """Classify one dump line and extract its fields (reference dispatch order)."""
    if line.startswith("Dumping ") and g.DUMPING_PATTERN.fullmatch(line):
        return ParsedLine(doc_id, file, line_no, source, "header", {})
    if line_no == 2 and g.STARTING_OFFSET_PATTERN.fullmatch(line):
        return ParsedLine(doc_id, file, line_no, source, "header",
                          {"starting_offset": int(g.STARTING_OFFSET_PATTERN.fullmatch(line).group("starting_offset"))})
    if line.startswith("baseOffset: "):
        m = g.BATCH_PATTERN.fullmatch(line)
        if not m:
            return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "batch_regex_mismatch"})
        f = m.groupdict()
        dh = f.pop("delete_horizon_ms")
        fields = {
            "base_offset": int(f["base_offset"]), "last_offset": int(f["last_offset"]),
            "count": int(f["count"]), "base_sequence": int(f["base_sequence"]),
            "last_sequence": int(f["last_sequence"]), "producer_id": int(f["producer_id"]),
            "producer_epoch": int(f["producer_epoch"]),
            "partition_leader_epoch": int(f["partition_leader_epoch"]),
            "is_transactional": f["is_transactional"] == "true",
            "is_control": f["is_control"] == "true",
            "delete_horizon_ms": None if dh in (None, "OptionalLong.empty") else int(dh),
            "position": int(f["position"]), "create_time_ms": int(f["create_time_ms"]),
            "size": int(f["size"]), "magic": int(f["magic"]),
            "compress_codec": f["compress_codec"], "crc": int(f["crc"]),
            "is_valid": f["is_valid"] == "true",
        }
        return ParsedLine(doc_id, file, line_no, source, "batch", fields)
    if line.startswith("| "):
        base = {}
        if " key: transaction_metadata::transactionalId=" in line:
            m = g.TXN_RECORD_PATTERN.fullmatch(line)
            if not m:
                return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "txn_record_regex_mismatch"})
            base = _msg_fields(m)
            base["transactional_id"] = m.group("transactional_id")
            payload = m.group("payload")
            if payload == "<DELETE>":
                base["is_deletion"] = True
                return ParsedLine(doc_id, file, line_no, source, "txn_deletion", base)
            pm = g.TXN_PAYLOAD_PATTERN.fullmatch(payload)
            if not pm:
                return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "txn_payload_mismatch"})
            base.update(
                txn_producer_id=int(pm.group("txn_producer_id")),
                txn_producer_epoch=int(pm.group("txn_producer_epoch")),
                state=pm.group("state"), partitions=pm.group("partitions"),
                txn_last_update_ms=int(pm.group("txn_last_update_ms")),
                txn_timeout_ms=int(pm.group("txn_timeout_ms")), is_deletion=False,
            )
            return ParsedLine(doc_id, file, line_no, source, "txn_state", base)
        if " key: offset_commit::group=" in line:
            m = g.OFFSET_COMMIT_RECORD_PATTERN.fullmatch(line)
            if not m:
                return ParsedLine(doc_id, file, line_no, source, "corrupt",
                                  {"reason": "offset_commit_regex_mismatch"})
            base = _msg_fields(m)
            base.update(group_id=m.group("group_id"), commit_topic=m.group("commit_topic"),
                        commit_partition=int(m.group("commit_partition")))
            payload = m.group("payload")
            if payload == "<DELETE>":
                base["is_deletion"] = True
                return ParsedLine(doc_id, file, line_no, source, "offset_commit", base)
            pm = g.OFFSET_COMMIT_PAYLOAD_PATTERN.fullmatch(payload)
            if not pm:
                return ParsedLine(doc_id, file, line_no, source, "corrupt",
                                  {"reason": "offset_payload_mismatch"})
            le = pm.group("committed_leader_epoch")
            et = pm.group("expire_timestamp_ms")
            base.update(
                committed_offset=int(pm.group("committed_offset")),
                committed_leader_epoch=None if le == "Optional.empty" else int(le[9:-1]),
                commit_metadata=pm.group("commit_metadata"),
                commit_timestamp_ms=int(pm.group("commit_timestamp_ms")),
                expire_timestamp_ms=None if et == "None" else int(et),
                is_deletion=False,
            )
            return ParsedLine(doc_id, file, line_no, source, "offset_commit", base)
        if " key: group_metadata::group=" in line:
            m = g.GROUP_METADATA_RECORD_PATTERN.fullmatch(line)
            if not m:
                return ParsedLine(doc_id, file, line_no, source, "corrupt",
                                  {"reason": "group_metadata_regex_mismatch"})
            base = _msg_fields(m)
            base["group_id"] = m.group("group_id")
            payload = m.group("payload")
            if payload == "<DELETE>":
                base["is_deletion"] = True
                return ParsedLine(doc_id, file, line_no, source, "group_metadata", base)
            pm = g.GROUP_METADATA_PAYLOAD_PATTERN.fullmatch(payload)
            if not pm:
                return ParsedLine(doc_id, file, line_no, source, "corrupt",
                                  {"reason": "group_metadata_payload_mismatch"})
            base.update(
                protocol_type=pm.group("protocol_type"), generation=int(pm.group("generation")),
                protocol=pm.group("protocol"), leader=pm.group("leader"),
                num_members=int(pm.group("num_members")), is_deletion=False,
            )
            return ParsedLine(doc_id, file, line_no, source, "group_metadata", base)
        if " endTxnMarker: " in line:
            m = g.CONTROL_RECORD_PATTERN.fullmatch(line)
            if not m:
                return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "control_regex_mismatch"})
            base = _msg_fields(m)
            base["commit"] = m.group("end_txn_marker") == "COMMIT"
            base["coordinator_epoch"] = int(m.group("coordinator_epoch"))
            return ParsedLine(doc_id, file, line_no, source, "control_msg", base)
        m = g.DATA_RECORD_PATTERN.fullmatch(line)
        if not m:
            return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "data_regex_mismatch"})
        return ParsedLine(doc_id, file, line_no, source, "data_msg", _msg_fields(m))
    if line.startswith("producerId: "):
        m = g.SNAPSHOT_PATTERN.fullmatch(line)
        if not m:
            return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "snapshot_regex_mismatch"})
        cur = m.group("current_txn_first_offset")
        cur_v = 0 if cur == "None" else int(cur[5:-1])
        lt = m.group("last_timestamp_ms")
        fields = {
            "producer_id": int(m.group("producer_id")), "producer_epoch": int(m.group("producer_epoch")),
            "coordinator_epoch": int(m.group("coordinator_epoch")),
            "current_txn_first_offset": cur_v,
            "last_timestamp_ms": int(lt) if lt else 0,
            "first_sequence": int(m.group("first_sequence")), "last_sequence": int(m.group("last_sequence")),
            "last_offset": int(m.group("last_offset")), "offset_delta": int(m.group("offset_delta")),
            "timestamp_ms": int(m.group("timestamp_ms")),
        }
        return ParsedLine(doc_id, file, line_no, source, "producer_state", fields)
    return ParsedLine(doc_id, file, line_no, source, "corrupt", {"reason": "unrecognised_line"})


def _msg_fields(m) -> dict:
    return {
        "offset": int(m.group("offset")), "msg_create_time_ms": int(m.group("msg_create_time_ms")),
        "key_size": int(m.group("key_size")), "value_size": int(m.group("value_size")),
        "sequence": int(m.group("sequence")), "header_keys": m.group("header_keys"),
    }


def segment_type(source: str) -> str:
    if g.TXN_STATE_DIR.fullmatch(source):
        return "txn_state"
    if g.CONSUMER_OFFSETS_DIR.fullmatch(source):
        return "consumer_offsets"
    return "data"


def parse_table(rows: list[tuple[str, str, str]]) -> list[ParsedLine]:
    """rows: (doc_id, line, source); doc_id = '<file>:<line_no>'."""
    out = []
    for doc_id, line, source in rows:
        file, _, ln = doc_id.rpartition(":")
        out.append(classify_and_parse(line, doc_id, file, int(ln), source))
    return out


@dataclass
class TxnStats:
    num_committed: int = 0
    num_aborted: int = 0
    txn_sizes: list = field(default_factory=list)
    txn_durations: list = field(default_factory=list)
    empty_txns: list = field(default_factory=list)      # doc_ids of closing control batches
    open_txns: dict = field(default_factory=dict)        # (pid, epoch) -> (first_batch_doc_id, n_data_batches)
    num_offset_gaps: int = 0
    first_batch_doc: str | None = None
    last_batch_doc: str | None = None


def txn_stat(parsed: list[ParsedLine], pid: int | None = None, producer_epoch: int | None = None,
             leader_epoch: int | None = None) -> TxnStats:
    """Sequential fold with TransactionalInfoCollector semantics over valid
    data-segment batches, files in name order, lines in order.

    Deviation from the reference (by design, north-rule semantics): batches
    with ``isvalid: false`` and corrupt lines are *routed away*, not
    crashed on, so they are excluded here exactly as the pipeline excludes
    them.
    """
    by_doc = sorted(
        (p for p in parsed if segment_type(p.source) == "data"),
        key=lambda p: (p.file, p.line_no),
    )
    st = TxnStats()
    open_txns: dict[tuple[int, int], tuple[str, int, int]] = {}  # session -> (doc_id, n_batches, first_create_time)
    cur_batch: ParsedLine | None = None
    cur_file: str | None = None
    prev_last_offset: dict[str, int] = {}

    def batch_selected(b: ParsedLine) -> bool:
        if pid is not None and b.fields["producer_id"] != pid:
            return False
        if producer_epoch is not None and b.fields["producer_epoch"] != producer_epoch:
            return False
        if leader_epoch is not None and b.fields["partition_leader_epoch"] != leader_epoch:
            return False
        return True

    for p in by_doc:
        if p.file != cur_file:
            # dump files are independent units: the enclosing-batch cursor
            # never crosses a file boundary (routing semantics; klog would
            # have thrown on any file for which this matters)
            cur_batch = None
            cur_file = p.file
        if p.record_class == "batch":
            f = p.fields
            if not f["is_valid"]:
                cur_batch = None  # routed to corrupt; its messages don't count
                continue
            # a sessionless transactional batch is reference-fatal
            # (checkBatch) -> routed to corrupt: cursor target, never counted
            fatal = f["is_transactional"] and (
                f["producer_id"] == -1 or f["producer_epoch"] == -1
            )
            if not fatal:
                # offset-gap check is per segment file (W8)
                prev = prev_last_offset.get(p.file)
                if prev is not None and f["base_offset"] != prev + 1:
                    st.num_offset_gaps += 1
                prev_last_offset[p.file] = f["last_offset"]
            if not batch_selected(p):
                cur_batch = None
                continue
            cur_batch = p
            if fatal:
                continue
            if st.first_batch_doc is None:
                st.first_batch_doc = p.doc_id
            st.last_batch_doc = p.doc_id
            if f["is_transactional"] and not f["is_control"]:
                session = (f["producer_id"], f["producer_epoch"])
                if session in open_txns:
                    d, n, t = open_txns[session]
                    open_txns[session] = (d, n + 1, t)
                else:
                    open_txns[session] = (p.doc_id, 1, f["create_time_ms"])
        elif p.record_class == "control_msg" and cur_batch is not None:
            if p.fields["commit"]:
                st.num_committed += 1
            else:
                st.num_aborted += 1
            session = (cur_batch.fields["producer_id"], cur_batch.fields["producer_epoch"])
            entry = open_txns.pop(session, None)
            if entry is None:
                st.empty_txns.append(cur_batch.doc_id)
            else:
                _, n, t = entry
                st.txn_sizes.append(n)
                st.txn_durations.append(int(cur_batch.fields["create_time_ms"] - t))
    st.open_txns = {s: (d, n) for s, (d, n, _) in open_txns.items()}
    return st


def state_machine_violations(parsed: list[ParsedLine]) -> list[str]:
    """doc_ids of txn-state changes violating validPrevious
    (AssertTransactionStateMachine.java:31-53), per (pid, epoch) session in
    stream order."""
    table = {
        "Ongoing": {"Ongoing", "CompleteAbort", "CompleteCommit", "Empty"},
        "PrepareCommit": {"Ongoing"},
        "PrepareAbort": {"Ongoing"},
        "CompleteCommit": {"PrepareCommit"},
        "CompleteAbort": {"PrepareAbort"},
        "Empty": {"CompleteAbort", "CompleteCommit", "Empty"},
        "Dead": {"Empty", "CompleteAbort", "CompleteCommit"},
    }
    cur: dict[tuple[int, int], str] = {}
    out = []
    for p in sorted((q for q in parsed if q.record_class == "txn_state"), key=lambda q: (q.file, q.line_no)):
        s = (p.fields["txn_producer_id"], p.fields["txn_producer_epoch"])
        prev = cur.get(s)
        if prev is not None and prev not in table[p.fields["state"]]:
            out.append(p.doc_id)
        cur[s] = p.fields["state"]
    return out


def route_counts(parsed: list[ParsedLine]) -> dict[str, int]:
    counts: dict[str, int] = defaultdict(int)
    for p in parsed:
        counts[p.record_class] += 1
    return dict(counts)
