"""Deterministic synthetic fixture generator.

Renders ``kafka-dump-log.sh``-style dump lines following the grammars in
``klog_spark.grammar`` (reference: segment/reader/SegmentDumpReader.java:66-104,
snapshot/reader/SnapshotDumpReader.java:36-45) and the scenario coverage of
the reference's golden tests (SegmentDumpReaderTest.java:36-274): committed /
aborted / empty / open transactions, multi-batch transactions, offset gaps,
interleaved + hot-skewed producer sessions, CRC-invalid batches, corrupt
lines, Kafka 2.x vs 3.x format variants, ``__transaction_state`` segments
with state-machine sequences and tombstones, and producer-snapshot dumps.

Outputs (all seeded, content-addressed by (sf, seed)):
  sequences.parquet       (doc_id, tokens:array<int32>, n_tok, source)   -- engine input
  sequences_text.parquet  (doc_id, line, source)                          -- DuckDB-oracle only
  topic_meta.parquet, producer_meta.parquet                               -- broadcast dims

``tokens`` is the codepoint encoding of the line, so token-array equality is
routed-line equality.
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .tokens import texts_to_token_arrays

T0_MS = 1_700_000_000_000
TOPIC = "payments"
N_PARTITIONS = 4
TXN_STATE_PART = 17
LINES_PER_SF = 6_000_000  # sf0.01 -> 60k lines, sf0.1 -> 600k

# NB: "LZ4" does NOT match the reference grammar (none|[A-Z]+ rejects the
# digit, SegmentDumpReader.java:81) — emitted rarely as a corrupt-case.
COMPRESS = ["none", "none", "none", "ZSTD", "GZIP", "SNAPPY", "ZSTD", "GZIP", "SNAPPY", "LZ4"]
STATE_NEXT = {  # valid transitions (TransactionStateChange.java:82-127), prev -> allowed next
    None: ["Empty", "Ongoing"],
    "Empty": ["Ongoing", "Empty", "Dead"],
    "Ongoing": ["Ongoing", "PrepareCommit", "PrepareAbort"],
    "PrepareCommit": ["CompleteCommit"],
    "PrepareAbort": ["CompleteAbort"],
    "CompleteCommit": ["Ongoing", "Empty", "Dead"],
    "CompleteAbort": ["Ongoing", "Empty", "Dead"],
    "Dead": [],
}
ALL_STATES = ["Ongoing", "PrepareCommit", "PrepareAbort", "CompleteCommit", "CompleteAbort", "Empty", "Dead"]


def _render_batch(rng: random.Random, *, base_offset: int, count: int, pid: int, epoch: int,
                  leader_epoch: int, transactional: bool, control: bool, position: int,
                  t_ms: int, size: int, variant3x: bool, valid: bool = True) -> str:
    base_seq = -1 if pid == -1 else rng.randrange(0, 100000)
    last_seq = base_seq if base_seq == -1 else base_seq + count - 1
    crc = rng.getrandbits(32)
    dh = ""
    if variant3x:
        dhv = "OptionalLong.empty" if rng.random() < 0.8 else str(t_ms + 86_400_000)
        dh = f" deleteHorizonMs: {dhv}"
    return (
        f"baseOffset: {base_offset} lastOffset: {base_offset + count - 1} count: {count} "
        f"baseSequence: {base_seq} lastSequence: {last_seq} producerId: {pid} "
        f"producerEpoch: {epoch} partitionLeaderEpoch: {leader_epoch} "
        f"isTransactional: {str(transactional).lower()} isControl: {str(control).lower()}{dh} "
        f"position: {position} CreateTime: {t_ms} size: {size} magic: 2 "
        f"compresscodec: {rng.choice(COMPRESS)} crc: {crc} isvalid: {str(valid).lower()}"
    )


def _render_data_msg(rng: random.Random, *, offset: int, t_ms: int, seq: int) -> str:
    ks = rng.choice([-1, 8, 16, 36])
    vs = rng.choice([64, 128, 512, 1024])
    casing = rng.random() < 0.5
    key_kw, hdr_kw = ("keySize", "headerKeys") if casing else ("keysize", "headerkeys")
    hdrs = rng.choice(["", "trace-id", "trace-id,span-id"])
    payload = " payload: " + "x" * rng.randrange(4, 12) if rng.random() < 0.25 else ""
    ct_kw = "CreateTime" if rng.random() < 0.85 else "createTime"
    return (
        f"| offset: {offset} {ct_kw}: {t_ms} {key_kw}: {ks} valueSize: {vs} "
        f"sequence: {seq} {hdr_kw}: [{hdrs}]{payload}"
    )


def _render_control_msg(rng: random.Random, *, offset: int, t_ms: int, commit: bool) -> str:
    marker = "COMMIT" if commit else "ABORT"
    return (
        f"| offset: {offset} CreateTime: {t_ms} keySize: 4 valueSize: 6 "
        f"sequence: -1 headerKeys: [] endTxnMarker: {marker} coordinatorEpoch: {rng.randrange(0, 5)}"
    )


def _render_txn_state_msg(rng: random.Random, *, offset: int, t_ms: int, txn_id: str,
                          pid: int, epoch: int, state: str | None, parts: str) -> str:
    if state is None:
        payload = "<DELETE>"
    else:
        payload = (
            f"producerId:{pid},producerEpoch:{epoch},state={state},partitions=[{parts}],"
            f"txnLastUpdateTimestamp={t_ms},txnTimeoutMs=60000"
        )
    return (
        f"| offset: {offset} CreateTime: {t_ms} keySize: 30 valueSize: 50 sequence: -1 "
        f"headerKeys: [] key: transaction_metadata::transactionalId={txn_id} payload: {payload}"
    )


def _render_snapshot_line(rng: random.Random, *, pid: int, epoch: int, variant3x: bool) -> str:
    coord = rng.randrange(0, 5)
    cur = "None" if rng.random() < 0.5 else f"Some({rng.randrange(0, 100000)})"
    last_ts = f" lastTimestamp: {T0_MS + rng.randrange(0, 10 ** 6)}" if variant3x else ""
    fs = rng.randrange(0, 1000)
    ls = fs + rng.randrange(0, 50)
    lo = rng.randrange(0, 100000)
    return (
        f"producerId: {pid} producerEpoch: {epoch} coordinatorEpoch: {coord} "
        f"currentTxnFirstOffset: {cur}{last_ts} firstSequence: {fs} lastSequence: {ls} "
        f"lastOffset: {lo} offsetDelta: {ls - fs} timestamp: {T0_MS + rng.randrange(0, 10 ** 6)}"
    )


CORRUPT_LINES = [
    "baseOffset: 1331 lastOffset: 1331 count: 1 baseSequence: -1",  # truncated 2.8-style header
    "| offset: 99 CreateTime: oops keySize: 4",                     # malformed record
    "$$$ GARBAGE LINE NOT A RECORD $$$",
    "| offset: not-a-number CreateTime: 1 keySize: 1 valueSize: 1 sequence: 1 headerKeys: []",
]


def _gen_data_partition(seed: int, part: int, n_lines_budget: int):
    """One topic-partition's stream of dump lines, split into segment files.

    Yields (dump_file_name, source_path, [lines]) in offset order. Producer
    sessions are partition-local; one hot session gets ~35% of traffic
    (skew scenario per the north rule).
    """
    rng = random.Random(f"{seed}-data-{part}")
    pids = [part * 1000 + i for i in range(1, 9)]
    hot = pids[0]
    epochs = {p: rng.randrange(0, 3) for p in pids}
    open_txn: set[tuple[int, int]] = set()
    offset = 0
    leader_epoch = part
    files: list[tuple[str, str, list[str]]] = []
    lines_emitted = 0
    file_lines: list[str] = []
    file_base = 0
    position = 0
    t_ms = T0_MS
    variant3x = rng.random() < 0.5

    def flush_file():
        nonlocal file_lines, file_base, position, variant3x
        if not file_lines:
            return
        seg = f"{file_base:020d}.log"
        src = f"/tmp/kafka-logs/{TOPIC}-{part}/{seg}"
        name = f"{TOPIC}-{part}-{file_base:020d}.log.dump.txt"
        head = "Log starting offset" if rng.random() < 0.5 else "Starting offset"
        header = [f"Dumping {src}", f"{head}: {file_base}"]
        files.append((name, src, header + file_lines))
        file_lines = []
        file_base = offset
        position = 0
        variant3x = rng.random() < 0.5

    target_file_lines = max(200, min(1500, n_lines_budget // 4))
    while lines_emitted < n_lines_budget:
        r = rng.random()
        t_ms += rng.randrange(1, 800)
        if r < 0.04 and lines_emitted > 10:
            # corrupt garbage injected mid-file (2.8-style breakage,
            # SegmentDumpReaderTest.java:262-274) -> must route to corrupt
            file_lines.append(rng.choice(CORRUPT_LINES))
            lines_emitted += 1
        elif r < 0.07:
            offset += rng.randrange(2, 7)  # offset gap (W8)
        elif r < 0.22 and open_txn:
            # control batch closing an open txn (commit 70%)
            pid, ep = rng.choice(sorted(open_txn))
            open_txn.discard((pid, ep))
            commit = rng.random() < 0.7
            size = rng.randrange(60, 120)
            file_lines.append(_render_batch(rng, base_offset=offset, count=1, pid=pid, epoch=ep,
                                            leader_epoch=leader_epoch, transactional=True, control=True,
                                            position=position, t_ms=t_ms, size=size, variant3x=variant3x))
            file_lines.append(_render_control_msg(rng, offset=offset, t_ms=t_ms, commit=commit))
            offset += 1
            position += size
            lines_emitted += 2
        elif r < 0.26:
            # empty txn: control for a session with nothing open
            # (EmptyTransaction.java:24-35)
            pid = rng.choice(pids)
            ep = epochs[pid]
            if (pid, ep) in open_txn:
                open_txn.discard((pid, ep))  # still a legal close; keep stream consistent
            size = rng.randrange(60, 120)
            file_lines.append(_render_batch(rng, base_offset=offset, count=1, pid=pid, epoch=ep,
                                            leader_epoch=leader_epoch, transactional=True, control=True,
                                            position=position, t_ms=t_ms, size=size, variant3x=variant3x))
            file_lines.append(_render_control_msg(rng, offset=offset, t_ms=t_ms, commit=rng.random() < 0.3))
            offset += 1
            position += size
            lines_emitted += 2
        elif r < 0.34:
            # non-transactional batch
            count = rng.randrange(1, 4)
            size = rng.randrange(100, 400)
            valid = rng.random() > 0.04  # some CRC-invalid (W1 -> corrupt route)
            file_lines.append(_render_batch(rng, base_offset=offset, count=count, pid=-1, epoch=-1,
                                            leader_epoch=leader_epoch, transactional=False, control=False,
                                            position=position, t_ms=t_ms, size=size, variant3x=variant3x,
                                            valid=valid))
            for i in range(count):
                file_lines.append(_render_data_msg(rng, offset=offset + i, t_ms=t_ms + i, seq=-1))
            offset += count
            position += size
            lines_emitted += 1 + count
        else:
            # transactional data batch (hot-session skew)
            pid = hot if rng.random() < 0.35 else rng.choice(pids)
            ep = epochs[pid]
            count = rng.randrange(1, 4)
            size = rng.randrange(100, 400)
            valid = rng.random() > 0.03
            file_lines.append(_render_batch(rng, base_offset=offset, count=count, pid=pid, epoch=ep,
                                            leader_epoch=leader_epoch, transactional=True, control=False,
                                            position=position, t_ms=t_ms, size=size, variant3x=variant3x,
                                            valid=valid))
            seq0 = rng.randrange(0, 100000)
            for i in range(count):
                file_lines.append(_render_data_msg(rng, offset=offset + i, t_ms=t_ms + i, seq=seq0 + i))
            if valid:
                open_txn.add((pid, ep))
            offset += count
            position += size
            lines_emitted += 1 + count
            # occasionally bump a session epoch (fencing), leaving old epoch's txn open
            if rng.random() < 0.01:
                epochs[pid] += 1
        if len(file_lines) >= target_file_lines:
            flush_file()
    flush_file()
    return files


def _gen_txn_state_partition(seed: int, n_lines_budget: int):
    """__transaction_state-<N> segment dumps (state changes + tombstones)."""
    rng = random.Random(f"{seed}-txnstate")
    txn_ids = [f"txn-app-{i}" for i in range(12)]
    state: dict[str, str | None] = {}
    pid_of = {t: 9000 + i for i, t in enumerate(txn_ids)}
    epoch_of = {t: rng.randrange(0, 3) for t in txn_ids}
    offset = 0
    position = 0
    t_ms = T0_MS
    lines: list[str] = []
    emitted = 0
    files = []
    file_base = 0

    def flush(last=False):
        nonlocal lines, file_base, position
        if not lines:
            return
        seg = f"{file_base:020d}.log"
        src = f"/tmp/kafka-logs/__transaction_state-{TXN_STATE_PART}/{seg}"
        name = f"__transaction_state-{TXN_STATE_PART}-{file_base:020d}.log.dump.txt"
        files.append((name, src, [f"Dumping {src}", f"Log starting offset: {file_base}"] + lines))
        lines = []
        file_base = offset
        position = 0

    while emitted < n_lines_budget:
        t_ms += rng.randrange(1, 500)
        tid = rng.choice(txn_ids)
        cur = state.get(tid)
        if cur == "Dead":
            state.pop(tid, None)
            cur = None
        r = rng.random()
        if r < 0.04:
            nxt = None  # tombstone <DELETE>
        elif r < 0.08 and cur is not None:
            # deliberately invalid transition (exercises W4 flagging)
            bad = [s for s in ALL_STATES if not _valid_prev(s, cur)]
            nxt = rng.choice(bad) if bad else rng.choice(STATE_NEXT[cur])
        else:
            choices = STATE_NEXT.get(cur) or STATE_NEXT[None]
            nxt = rng.choice(choices)
        size = rng.randrange(80, 200)
        # batches in __transaction_state have pid/epoch = -1 and are
        # non-transactional (SegmentDumpReader.java:317,322-338)
        lines.append(_render_batch(rng, base_offset=offset, count=1, pid=-1, epoch=-1,
                                   leader_epoch=0, transactional=False, control=False,
                                   position=position, t_ms=t_ms, size=size, variant3x=False))
        if rng.random() < 0.02:
            epoch_of[tid] += 1
        lines.append(_render_txn_state_msg(rng, offset=offset, t_ms=t_ms, txn_id=tid,
                                           pid=pid_of[tid], epoch=epoch_of[tid], state=nxt,
                                           parts=f"{TOPIC}-{rng.randrange(0, N_PARTITIONS)}"))
        if nxt is not None:
            state[tid] = nxt
        else:
            state.pop(tid, None)
        offset += 1
        position += size
        emitted += 2
        if len(lines) >= 1000:
            flush()
    flush(last=True)
    return files


def _java_string_hash(s: str) -> int:
    """Java String.hashCode (signed 32-bit) — places each group's commits in
    its coordinating __consumer_offsets partition exactly as Kafka does
    (reference: command/GroupCoordinatingPartition.java:38-44)."""
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


N_CO_PARTITIONS = 8
CO_GROUPS = [f"app-{name}" for name in
             ("checkout", "fraud", "billing", "audit", "search", "email", "ledger", "metrics")]


def _render_offset_commit_msg(rng: random.Random, *, offset: int, t_ms: int, group: str,
                              topic: str, part: int, committed: int | None,
                              leader_epoch: int | None = None, corrupt: bool = False) -> str:
    key = f"offset_commit::group={group},topic={topic},partition={part}"
    if corrupt:
        payload = f"offset=oops,leader_epoch=?,commit_timestamp={t_ms}"  # malformed -> corrupt sink
    elif committed is None:
        payload = "<DELETE>"
    else:
        le = "Optional.empty" if leader_epoch is None else f"Optional[{leader_epoch}]"
        meta = "" if rng.random() < 0.9 else f"m-{rng.randrange(100)}"
        exp = "None" if rng.random() < 0.9 else str(t_ms + 604_800_000)
        payload = (f"offset={committed},leader_epoch={le},metadata={meta},"
                   f"commit_timestamp={t_ms},expire_timestamp={exp}")
    return (f"| offset: {offset} CreateTime: {t_ms} keySize: {len(key)} valueSize: {len(payload)} "
            f"sequence: -1 headerKeys: [] key: {key} payload: {payload}")


def _render_group_metadata_msg(rng: random.Random, *, offset: int, t_ms: int, group: str,
                               generation: int | None, members: int = 1,
                               corrupt: bool = False) -> str:
    key = f"group_metadata::group={group}"
    if corrupt:
        payload = f"protocolType=consumer,generation=,members={members}"  # malformed
    elif generation is None:
        payload = "<DELETE>"
    else:
        payload = (f"protocolType=consumer,generation={generation},protocol=range,"
                   f"leader=consumer-{group}-1,members={members}")
    return (f"| offset: {offset} CreateTime: {t_ms} keySize: {len(key)} valueSize: {len(payload)} "
            f"sequence: -1 headerKeys: [] key: {key} payload: {payload}")


def _gen_consumer_offsets(seed: int, n_lines_budget: int):
    """__consumer_offsets-<N> segment dumps: offset commits, group-metadata
    updates, tombstones, planted malformed payloads, and (version 8)
    TRANSACTIONAL offset commits — sendOffsetsToTransaction flows where the
    commits sit in an isTransactional batch and a later control batch from
    the same producer carries the COMMIT/ABORT marker (possibly in a later
    segment file; some transactions are left open). Each group's records
    land in partition abs(hashCode(group)) % N_CO_PARTITIONS."""
    rng = random.Random(f"{seed}-consumeroffsets")
    part_of = {grp: abs(_java_string_hash(grp)) % N_CO_PARTITIONS for grp in CO_GROUPS}
    committed: dict[tuple[str, str, int], int] = {}
    generation: dict[str, int] = {grp: 1 for grp in CO_GROUPS}
    state = {p: {"offset": 0, "position": 0, "file_base": 0, "lines": []}
             for p in sorted(set(part_of.values()))}
    # transactional-producer state per coordinator partition: pid/epoch per
    # group, and the set of currently-open transactions awaiting a marker
    txn_pid = {grp: 5000 + i for i, grp in enumerate(CO_GROUPS)}
    txn_epoch = dict.fromkeys(CO_GROUPS, 0)
    open_txns: dict[int, list[str]] = {p: [] for p in state}  # p -> [group,...]
    t_ms = T0_MS
    files = []
    emitted = 0

    def flush(p: int):
        st = state[p]
        if not st["lines"]:
            return
        seg = f"{st['file_base']:020d}.log"
        src = f"/tmp/kafka-logs/__consumer_offsets-{p}/{seg}"
        name = f"__consumer_offsets-{p}-{st['file_base']:020d}.log.dump.txt"
        files.append((name, src, [f"Dumping {src}", f"Log starting offset: {st['file_base']}"] + st["lines"]))
        st["lines"] = []
        st["file_base"] = st["offset"]
        st["position"] = 0

    while emitted < n_lines_budget:
        t_ms += rng.randrange(1, 400)
        # one hot group (~40% of commits) exercises coordinator-partition skew
        grp = CO_GROUPS[0] if rng.random() < 0.4 else rng.choice(CO_GROUPS)
        p = part_of[grp]
        st = state[p]
        size = rng.randrange(90, 220)
        r = rng.random()
        grp_open = any(g == grp for g, _ in open_txns[p])
        if r < 0.14 and not grp_open:
            # BEGIN transactional commit flow: one isTransactional batch
            # carrying 1-3 offset commits; the marker arrives later (a pid
            # has at most one open transaction, as in Kafka)
            k = rng.randrange(1, 4)
            pid, ep = txn_pid[grp], txn_epoch[grp]
            st["lines"].append(_render_batch(rng, base_offset=st["offset"], count=k, pid=pid,
                                             epoch=ep, leader_epoch=0, transactional=True,
                                             control=False, position=st["position"], t_ms=t_ms,
                                             size=size, variant3x=False))
            pend = []
            for j in range(k):
                tpart = rng.randrange(0, N_PARTITIONS)
                key = (grp, TOPIC, tpart)
                val = committed.get(key, 0) + rng.randrange(1, 50)
                le = None if rng.random() < 0.2 else rng.randrange(0, 6)
                st["lines"].append(_render_offset_commit_msg(
                    rng, offset=st["offset"] + j, t_ms=t_ms, group=grp, topic=TOPIC,
                    part=tpart, committed=val, leader_epoch=le))
                pend.append((key, val))
            open_txns[p].append((grp, pend))
            st["offset"] += k
            st["position"] += size
            emitted += k + 1
        elif r < 0.22 and open_txns[p]:
            # END a pending transaction: control batch (isTransactional +
            # isControl, same pid/epoch) + COMMIT/ABORT marker message
            grp2, pend = open_txns[p].pop(rng.randrange(len(open_txns[p])))
            pid, ep = txn_pid[grp2], txn_epoch[grp2]
            commit = rng.random() < 0.7
            st["lines"].append(_render_batch(rng, base_offset=st["offset"], count=1, pid=pid,
                                             epoch=ep, leader_epoch=0, transactional=True,
                                             control=True, position=st["position"], t_ms=t_ms,
                                             size=size, variant3x=False))
            st["lines"].append(_render_control_msg(rng, offset=st["offset"], t_ms=t_ms,
                                                   commit=commit))
            if commit:
                for key, val in pend:
                    committed[key] = val
            if rng.random() < 0.15:
                txn_epoch[grp2] += 1  # producer re-epoch after the txn
            st["offset"] += 1
            st["position"] += size
            emitted += 2
        else:
            st["lines"].append(_render_batch(rng, base_offset=st["offset"], count=1, pid=-1,
                                             epoch=-1, leader_epoch=0, transactional=False,
                                             control=False, position=st["position"], t_ms=t_ms,
                                             size=size, variant3x=False))
            if r < 0.82:  # offset commit
                tpart = rng.randrange(0, N_PARTITIONS)
                key = (grp, TOPIC, tpart)
                committed[key] = committed.get(key, 0) + rng.randrange(1, 50)
                le = None if rng.random() < 0.2 else rng.randrange(0, 6)
                st["lines"].append(_render_offset_commit_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp, topic=TOPIC, part=tpart,
                    committed=committed[key], leader_epoch=le))
            elif r < 0.86:  # offset tombstone
                tpart = rng.randrange(0, N_PARTITIONS)
                committed.pop((grp, TOPIC, tpart), None)
                st["lines"].append(_render_offset_commit_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp, topic=TOPIC, part=tpart,
                    committed=None))
            elif r < 0.92:  # group-metadata update (rebalance)
                generation[grp] += 1
                st["lines"].append(_render_group_metadata_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp,
                    generation=generation[grp], members=rng.randrange(1, 9)))
            elif r < 0.94:  # group-metadata tombstone
                st["lines"].append(_render_group_metadata_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp, generation=None))
            elif r < 0.97:  # malformed offset payload -> corrupt sink
                st["lines"].append(_render_offset_commit_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp, topic=TOPIC,
                    part=rng.randrange(0, N_PARTITIONS), committed=0, corrupt=True))
            else:  # malformed group-metadata payload -> corrupt sink
                st["lines"].append(_render_group_metadata_msg(
                    rng, offset=st["offset"], t_ms=t_ms, group=grp, generation=1, corrupt=True))
            st["offset"] += 1
            st["position"] += size
            emitted += 2
        if len(st["lines"]) >= 800:
            flush(p)
    for p in state:
        flush(p)
    return files


def _valid_prev(nxt: str, prev: str) -> bool:
    table = {
        "Ongoing": {"Ongoing", "CompleteAbort", "CompleteCommit", "Empty"},
        "PrepareCommit": {"Ongoing"},
        "PrepareAbort": {"Ongoing"},
        "CompleteCommit": {"PrepareCommit"},
        "CompleteAbort": {"PrepareAbort"},
        "Empty": {"CompleteAbort", "CompleteCommit", "Empty"},
        "Dead": {"Empty", "CompleteAbort", "CompleteCommit"},
    }
    return prev in table[nxt]


def _gen_snapshots(seed: int, n_lines_budget: int):
    rng = random.Random(f"{seed}-snapshot")
    files = []
    emitted = 0
    idx = 0
    while emitted < n_lines_budget:
        part = idx % N_PARTITIONS
        base = (idx + 1) * 1_000_000
        seg = f"{base:020d}.snapshot"
        src = f"/tmp/kafka-logs/{TOPIC}-{part}/{seg}"
        name = f"{TOPIC}-{part}-{base:020d}.snapshot.dump.txt"
        variant3x = idx % 2 == 0
        k = min(rng.randrange(20, 60), n_lines_budget - emitted)
        lines = [f"Dumping {src}"]
        for _ in range(k):
            pid = part * 1000 + rng.randrange(1, 9)
            lines.append(_render_snapshot_line(rng, pid=pid, epoch=rng.randrange(0, 3), variant3x=variant3x))
        files.append((name, src, lines))
        emitted += k + 1
        idx += 1
    return files


def generate_fixture(sf: float, out_dir: str | Path, seed: int = 42, force: bool = False) -> Path:
    """Generate the fixture at scale factor ``sf`` into ``out_dir`` (cached)."""
    out = Path(out_dir)
    marker = out / "_GENERATED.json"
    spec = {"sf": sf, "seed": seed, "version": 8}
    if marker.exists() and not force:
        try:
            if json.loads(marker.read_text()) == spec:
                return out
        except (ValueError, OSError) as exc:
            print(f"fixture marker {marker} unreadable ({exc!r}); regenerating", file=sys.stderr)
    out.mkdir(parents=True, exist_ok=True)

    total = max(2000, int(LINES_PER_SF * sf))
    data_budget = int(total * 0.80)
    txn_budget = int(total * 0.14)
    snap_budget = int(total * 0.06)
    co_budget = int(total * 0.10)  # additive (version 7): __consumer_offsets decode

    all_files: list[tuple[str, str, list[str]]] = []
    per_part = data_budget // N_PARTITIONS
    for p in range(N_PARTITIONS):
        all_files.extend(_gen_data_partition(seed, p, per_part))
    all_files.extend(_gen_txn_state_partition(seed, txn_budget))
    all_files.extend(_gen_snapshots(seed, snap_budget))
    all_files.extend(_gen_consumer_offsets(seed, co_budget))

    doc_ids: list[str] = []
    sources: list[str] = []
    texts: list[str] = []
    for name, src, lines in all_files:
        for i, line in enumerate(lines, start=1):
            doc_ids.append(f"{name}:{i}")
            sources.append(src)
            texts.append(line)

    # chunked writes: token-offset buffers must stay under the 32-bit Arrow
    # offset limit, so large scale factors stream out in slices
    seq_schema = pa.schema([
        ("doc_id", pa.string()), ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()), ("source", pa.string()),
    ])
    txt_schema = pa.schema([
        ("doc_id", pa.string()), ("line", pa.string()), ("source", pa.string()),
    ])
    chunk = 2_000_000
    with pq.ParquetWriter(out / "sequences.parquet", seq_schema) as sw, \
         pq.ParquetWriter(out / "sequences_text.parquet", txt_schema) as tw:
        for lo in range(0, len(texts), chunk):
            hi = min(lo + chunk, len(texts))
            values, offsets = texts_to_token_arrays(texts[lo:hi])
            tokens_arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
            )
            n_tok = (offsets[1:] - offsets[:-1]).astype(np.int32)
            sw.write_table(pa.table({
                "doc_id": pa.array(doc_ids[lo:hi], type=pa.string()),
                "tokens": tokens_arr,
                "n_tok": pa.array(n_tok, type=pa.int32()),
                "source": pa.array(sources[lo:hi], type=pa.string()),
            }, schema=seq_schema), row_group_size=20_000)
            tw.write_table(pa.table({
                "doc_id": pa.array(doc_ids[lo:hi], type=pa.string()),
                "line": pa.array(texts[lo:hi], type=pa.string()),
                "source": pa.array(sources[lo:hi], type=pa.string()),
            }, schema=txt_schema), row_group_size=20_000)

    # broadcast dimensions (FIXTURES.md §2)
    topics = []
    for p in range(N_PARTITIONS):
        topics.append((TOPIC, p, "delete", False))
    topics.append(("__transaction_state", TXN_STATE_PART, "compact", True))
    pq.write_table(
        pa.table(
            {
                "topic": pa.array([t[0] for t in topics]),
                "partition": pa.array([t[1] for t in topics], type=pa.int32()),
                "cleanup_policy": pa.array([t[2] for t in topics]),
                "is_internal": pa.array([t[3] for t in topics]),
            }
        ),
        out / "topic_meta.parquet",
    )
    pids = sorted({part * 1000 + i for part in range(N_PARTITIONS) for i in range(1, 9)} | {9000 + i for i in range(12)})
    pq.write_table(
        pa.table(
            {
                "producer_id": pa.array(pids, type=pa.int64()),
                "client_name": pa.array([f"client-{p % 7}" for p in pids]),
                "team": pa.array([f"team-{p % 3}" for p in pids]),
            }
        ),
        out / "producer_meta.parquet",
    )

    marker.write_text(json.dumps(spec))
    return out


def fixture_dir_for_sf(sf: float, root: str | Path = "/root/repo/data/klog") -> Path:
    return Path(root) / f"sf{sf:g}"


def ensure_fixture(sf: float, root: str | Path = "/root/repo/data/klog", seed: int = 42) -> Path:
    return generate_fixture(sf, fixture_dir_for_sf(sf, root), seed=seed)
