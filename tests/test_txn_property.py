"""Property-based parity for the transactional fold: random dump streams —
valid/invalid/control/transactional batches, stray and well-formed control
messages, multiple files — must produce identical txn_stats in the
distributed window decomposition and the sequential Python oracle
(TransactionalInfoCollector semantics). The grammar property test covers
parse; this covers the fold, where the ordering/cursor/grouping edge cases
live (control after invalid batch, control with no batch, empty txns,
back-to-back controls, sessionless transactional batches, offset gaps)."""

import statistics

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from klog_spark import oracle
from klog_spark.operators import aggregates as agg
from klog_spark.schemas import INPUT_SCHEMA

SRC = "/tmp/kafka-logs/t-{fi}/00000000000000000000.log"

BATCH = (
    "baseOffset: {bo} lastOffset: {lo} count: {cnt} baseSequence: 0 lastSequence: 0 "
    "producerId: {pid} producerEpoch: {ep} partitionLeaderEpoch: 1 isTransactional: {txn} "
    "isControl: {ctl} position: {pos} CreateTime: {ct} size: 10 magic: 2 "
    "compresscodec: none crc: 1 isvalid: {valid}"
)
CTRL_MSG = (
    "| offset: {o} CreateTime: {ct} keySize: 4 valueSize: 6 sequence: -1 headerKeys: [] "
    "endTxnMarker: {marker} coordinatorEpoch: 1"
)
DATA_MSG = "| offset: {o} CreateTime: {ct} keySize: 1 valueSize: 1 sequence: 0 headerKeys: []"

b = st.booleans()


@st.composite
def stream_element(draw):
    """One batch header plus 0-2 message lines under it."""
    pid = draw(st.sampled_from([-1, 1, 2]))
    ep = draw(st.sampled_from([0, 1]))
    is_ctl = draw(b)
    is_txn = draw(b) if not is_ctl else True
    valid = draw(st.sampled_from(["true", "true", "true", "false"]))
    bo = draw(st.integers(0, 50))
    ct = draw(st.integers(1000, 9999))
    lines = [BATCH.format(
        bo=bo, lo=bo + draw(st.integers(0, 3)), cnt=draw(st.integers(0, 2)),
        pid=pid, ep=ep, txn="true" if is_txn else "false",
        ctl="true" if is_ctl else "false", pos=bo * 10, ct=ct, valid=valid,
    )]
    for _ in range(draw(st.integers(0, 2)) if is_ctl else draw(st.integers(0, 1))):
        if is_ctl:
            lines.append(CTRL_MSG.format(o=bo, ct=ct, marker=draw(st.sampled_from(["COMMIT", "ABORT"]))))
        else:
            lines.append(DATA_MSG.format(o=bo, ct=ct))
    return lines


@st.composite
def dump_files(draw):
    """1-2 files, each 0-6 stream elements, with an occasional stray control
    message before any batch (parent must be null -> dropped)."""
    files = []
    for fi in range(draw(st.integers(1, 2))):
        lines = [f"Dumping {SRC.format(fi=fi)}", "Log starting offset: 0"]
        if draw(b):
            lines.append(CTRL_MSG.format(o=0, ct=500, marker="COMMIT"))  # stray
        for el in draw(st.lists(stream_element(), min_size=0, max_size=6)):
            lines.extend(el)
        files.append((fi, lines))
    return files


def _stats_dict(st_: oracle.TxnStats) -> dict:
    return dict(
        num_committed=st_.num_committed, num_aborted=st_.num_aborted,
        txn_size_count=len(st_.txn_sizes),
        txn_size_sum=sum(st_.txn_sizes) if st_.txn_sizes else None,
        txn_size_min=min(st_.txn_sizes, default=None),
        txn_size_max=max(st_.txn_sizes, default=None),
        txn_size_avg=statistics.mean(st_.txn_sizes) if st_.txn_sizes else None,
        txn_dur_sum=sum(st_.txn_durations) if st_.txn_durations else None,
        num_empty_txn=len(st_.empty_txns), num_open_txn=len(st_.open_txns),
        num_offset_gaps=st_.num_offset_gaps,
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(dump_files())
def test_txn_stats_matches_sequential_oracle(spark, files):
    rows, parsed_oracle = [], []
    for fi, lines in files:
        src = SRC.format(fi=fi)
        fname = f"t-{fi}.log.dump.txt"
        for i, ln in enumerate(lines, start=1):
            doc = f"{fname}:{i}"
            rows.append((doc, [ord(c) for c in ln], len(ln), src))
            parsed_oracle.append(oracle.classify_and_parse(ln, doc, fname, i, src))

    from klog_spark.operators.parse import parse_sequences

    parsed = parse_sequences(spark.createDataFrame(rows, INPUT_SCHEMA))
    for flt in ({}, {"pid": 1}):
        got = agg.txn_stats(parsed, **flt).collect()[0].asDict()
        want = _stats_dict(oracle.txn_stat(parsed_oracle, **flt))
        for k, v in want.items():
            g = got[k]
            if isinstance(v, float):
                assert g == pytest.approx(v), (k, flt)
            elif v is None:
                assert g in (None, 0), (k, flt)
            else:
                assert g == v, (k, g, v, flt, [l for _, ls in files for l in ls])
