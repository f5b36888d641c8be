"""Vectorized detokenize + classify + regex-extract parse stage.

The Spark-first equivalent of klog's line-at-a-time regex dispatch
(segment/reader/SegmentDumpReader.java:167-311): one ``mapInPandas`` pass
per Arrow batch —

1. decode ``tokens:array<int32>`` to text through a single contiguous
   UTF-32 buffer (no per-character Python),
2. classify lines with vectorized prefix/substring tests (the klog
   dispatch: batch header / record / control / txn-state / snapshot /
   headers / corrupt),
3. extract fields per class with ``pd.Series.str.extract`` on the same
   tolerant named-group grammars klog compiles
   (SegmentDumpReader.java:66-104, SnapshotDumpReader.java:36-45),
4. lines the reference would *throw* on (SegmentDumpReader.java:246,266,...)
   become ``record_class='corrupt'`` rows with a reason — the north rule's
   corrupt sink instead of a crash.

Everything derivable from ``source`` (segment type, topic, partition —
SegmentDumpReader.java:340-361) stays JVM-side as ``regexp_extract`` so it
never crosses the Arrow boundary.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .. import grammar as g
from ..schemas import PARSED_FIELDS, PARSED_SCHEMA
from ..tokens import token_series_to_texts

# Columns produced JVM-side after the UDF (pure regexp_extract on `source`).
_JVM_COLS = ("segment_type", "topic", "partition")
UDF_SCHEMA = StructType([f for f in PARSED_SCHEMA.fields if f.name not in _JVM_COLS])

_ANCHORED = {
    "batch": re.compile(r"^(?:%s)$" % g.BATCH_PATTERN.pattern),
    "data": re.compile(r"^(?:%s)$" % g.DATA_RECORD_PATTERN.pattern),
    "control": re.compile(r"^(?:%s)$" % g.CONTROL_RECORD_PATTERN.pattern),
    "txn": re.compile(r"^(?:%s)$" % g.TXN_RECORD_PATTERN.pattern),
    "payload": re.compile(r"^(?:%s)$" % g.TXN_PAYLOAD_PATTERN.pattern),
    "snapshot": re.compile(r"^(?:%s)$" % g.SNAPSHOT_PATTERN.pattern),
    "hdr2": re.compile(r"^.*starting offset: (?P<starting_offset>[0-9]+)$", re.IGNORECASE),
}

_INT_DTYPES = {
    "line_no": "Int32", "n_tok": "Int32",
    "base_offset": "Int64", "last_offset": "Int64", "count": "Int32",
    "base_sequence": "Int32", "last_sequence": "Int32", "producer_id": "Int64",
    "producer_epoch": "Int16", "partition_leader_epoch": "Int32",
    "delete_horizon_ms": "Int64", "position": "Int64", "create_time_ms": "Int64",
    "size": "Int32", "magic": "Int8", "crc": "Int64",
    "offset": "Int64", "msg_create_time_ms": "Int64", "key_size": "Int32",
    "value_size": "Int32", "sequence": "Int32",
    "coordinator_epoch": "Int32", "txn_producer_id": "Int64", "txn_producer_epoch": "Int16",
    "txn_last_update_ms": "Int64", "txn_timeout_ms": "Int64",
    "current_txn_first_offset": "Int64", "last_timestamp_ms": "Int64",
    "first_sequence": "Int32", "offset_delta": "Int32", "timestamp_ms": "Int64",
}
_BOOL_COLS = ("is_transactional", "is_control", "is_valid", "commit", "is_deletion")
_STR_COLS = ("compress_codec", "header_keys", "transactional_id", "state", "partitions", "corrupt_reason")
_UDF_COL_ORDER = [f.name for f in UDF_SCHEMA.fields]


def _parse_batch_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    n = len(pdf)
    lines = token_series_to_texts(pdf["tokens"]).reset_index(drop=True)
    out: dict[str, pd.Series] = {}
    out["doc_id"] = pdf["doc_id"].reset_index(drop=True)
    out["source"] = pdf["source"].reset_index(drop=True)
    out["n_tok"] = pdf["n_tok"].reset_index(drop=True).astype("Int32")
    loc = out["doc_id"].str.extract(r"^(?P<file>.*):(?P<line_no>[0-9]+)$")
    out["file"] = loc["file"]
    out["line_no"] = pd.to_numeric(loc["line_no"]).astype("Int32")

    cls = pd.Series(np.full(n, "corrupt", dtype=object))
    reason = pd.Series(np.full(n, None, dtype=object))

    is_hdr1 = lines.str.startswith("Dumping ")
    is_hdr2 = (out["line_no"] == 2).fillna(False).to_numpy(dtype=bool) & lines.str.match(
        _ANCHORED["hdr2"].pattern, case=False
    ).to_numpy(dtype=bool)
    is_batch = lines.str.startswith("baseOffset: ")
    is_msg = lines.str.startswith("| ")
    is_snap = lines.str.startswith("producerId: ")
    is_txn_msg = is_msg & lines.str.contains(" key: transaction_metadata::transactionalId=", regex=False)
    is_ctl_msg = is_msg & ~is_txn_msg & lines.str.contains(" endTxnMarker: ", regex=False)
    is_data_msg = is_msg & ~is_txn_msg & ~is_ctl_msg

    cls[is_hdr1 | is_hdr2] = "header"

    for name in _INT_DTYPES:
        if name not in out:
            out[name] = pd.Series([pd.NA] * n, dtype=_INT_DTYPES[name])
    for name in _BOOL_COLS:
        out[name] = pd.Series([pd.NA] * n, dtype="boolean")
    for name in _STR_COLS:
        out[name] = pd.Series([None] * n, dtype=object)

    def assign(mask: pd.Series, col: str, values: pd.Series) -> None:
        dtype = _INT_DTYPES.get(col)
        if dtype:
            values = pd.to_numeric(values, errors="coerce").astype(dtype)
        out[col].loc[mask.to_numpy(dtype=bool)] = values.to_numpy()

    # --- batch headers -----------------------------------------------------
    if is_batch.any():
        sub = lines[is_batch]
        ext = sub.str.extract(_ANCHORED["batch"])
        ok = ext["base_offset"].notna()
        good = is_batch.copy()
        good[is_batch.to_numpy(dtype=bool)] = ok.to_numpy(dtype=bool)
        bad = is_batch & ~good
        cls[good] = "batch"
        reason[bad] = "batch_regex_mismatch"
        ge = ext[ok]
        for c in ("base_offset", "last_offset", "count", "base_sequence", "last_sequence",
                  "producer_id", "producer_epoch", "partition_leader_epoch", "position",
                  "create_time_ms", "size", "magic", "crc"):
            assign(good, c, ge[c])
        assign(good, "delete_horizon_ms", ge["delete_horizon_ms"].where(ge["delete_horizon_ms"] != "OptionalLong.empty"))
        out["compress_codec"].loc[good.to_numpy(dtype=bool)] = ge["compress_codec"].to_numpy()
        for c in ("is_transactional", "is_control", "is_valid"):
            out[c].loc[good.to_numpy(dtype=bool)] = (ge[c] == "true").to_numpy()

    # --- record lines (data / control / txn-state) -------------------------
    def parse_msgs(mask: pd.Series, pattern_key: str, klass: str, fail_reason: str, extra) -> None:
        if not mask.any():
            return
        sub = lines[mask]
        ext = sub.str.extract(_ANCHORED[pattern_key])
        ok = ext["offset"].notna()
        good = mask.copy()
        good[mask.to_numpy(dtype=bool)] = ok.to_numpy(dtype=bool)
        bad = mask & ~good
        reason[bad] = fail_reason
        ge = ext[ok]
        for c in ("offset", "msg_create_time_ms", "key_size", "value_size", "sequence"):
            assign(good, c, ge[c])
        out["header_keys"].loc[good.to_numpy(dtype=bool)] = ge["header_keys"].to_numpy()
        extra(good, ge)

    def data_extra(good, ge):
        cls[good] = "data_msg"

    def ctl_extra(good, ge):
        cls[good] = "control_msg"
        out["commit"].loc[good.to_numpy(dtype=bool)] = (ge["end_txn_marker"] == "COMMIT").to_numpy()
        assign(good, "coordinator_epoch", ge["coordinator_epoch"])

    def txn_extra(good, ge):
        gmask = good.to_numpy(dtype=bool)
        out["transactional_id"].loc[gmask] = ge["transactional_id"].to_numpy()
        payload = ge["payload"]
        is_del = payload == "<DELETE>"
        pext = payload[~is_del].str.extract(_ANCHORED["payload"])
        pok = pext["state"].notna() if len(pext) else pd.Series([], dtype=bool)
        # three-way split of `good`: deletion / state-change / payload-corrupt
        del_mask = good.copy()
        del_mask[good.to_numpy(dtype=bool)] = is_del.to_numpy(dtype=bool)
        chg_mask = good.copy()
        chg_mask[good.to_numpy(dtype=bool)] = (~is_del).to_numpy(dtype=bool)
        chg_ok = chg_mask.copy()
        chg_ok[chg_mask.to_numpy(dtype=bool)] = pok.to_numpy(dtype=bool)
        chg_bad = chg_mask & ~chg_ok
        cls[del_mask] = "txn_deletion"
        cls[chg_ok] = "txn_state"
        cls[chg_bad] = "corrupt"
        reason[chg_bad] = "txn_payload_mismatch"
        out["is_deletion"].loc[del_mask.to_numpy(dtype=bool)] = True
        out["is_deletion"].loc[chg_ok.to_numpy(dtype=bool)] = False
        pe = pext[pok] if len(pext) else pext
        for c in ("txn_producer_id", "txn_producer_epoch", "txn_last_update_ms", "txn_timeout_ms"):
            assign(chg_ok, c, pe[c])
        out["state"].loc[chg_ok.to_numpy(dtype=bool)] = pe["state"].to_numpy()
        out["partitions"].loc[chg_ok.to_numpy(dtype=bool)] = pe["partitions"].to_numpy()

    parse_msgs(is_data_msg, "data", "data_msg", "data_regex_mismatch", data_extra)
    parse_msgs(is_ctl_msg, "control", "control_msg", "control_regex_mismatch", ctl_extra)
    parse_msgs(is_txn_msg, "txn", "txn_state", "txn_record_regex_mismatch", txn_extra)

    # --- producer-snapshot lines -------------------------------------------
    if is_snap.any():
        sub = lines[is_snap]
        ext = sub.str.extract(_ANCHORED["snapshot"])
        ok = ext["producer_id"].notna()
        good = is_snap.copy()
        good[is_snap.to_numpy(dtype=bool)] = ok.to_numpy(dtype=bool)
        bad = is_snap & ~good
        cls[good] = "producer_state"
        reason[bad] = "snapshot_regex_mismatch"
        ge = ext[ok]
        for c in ("producer_id", "producer_epoch", "coordinator_epoch", "first_sequence",
                  "last_sequence", "last_offset", "offset_delta", "timestamp_ms"):
            assign(good, c, ge[c])
        # None -> 0, Some(n) -> n (SnapshotDumpReader.java:102-104)
        cur = ge["current_txn_first_offset"].str.replace("None", "0", regex=False).str.replace(
            r"[^\d]", "", regex=True
        )
        assign(good, "current_txn_first_offset", cur)
        # missing lastTimestamp -> 0 (SnapshotDumpReader.java:105-106)
        assign(good, "last_timestamp_ms", ge["last_timestamp_ms"].fillna("0"))

    unmatched = (cls == "corrupt") & reason.isna()
    reason[unmatched] = "unrecognised_line"
    out["record_class"] = cls
    out["corrupt_reason"] = reason

    return pd.DataFrame({c: out[c] for c in _UDF_COL_ORDER})


def parse_sequences(df: DataFrame) -> DataFrame:
    """input (doc_id, tokens, n_tok, source) -> wide parsed DataFrame.

    Narrow map (no shuffle); source-derived columns stay in whole-stage
    codegen.
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield _parse_batch_pdf(pdf)

    parsed = df.mapInPandas(gen, schema=UDF_SCHEMA)
    parsed = (
        parsed.withColumn(
            "segment_type",
            F.when(F.col("source").rlike(r"/__transaction_state-[0-9]+/[^/]+$"), F.lit("txn_state"))
            .when(F.col("source").rlike(r"/__consumer_offsets-[0-9]+/[^/]+$"), F.lit("consumer_offsets"))
            .otherwise(F.lit("data")),
        )
        .withColumn("topic", F.regexp_extract(F.col("source"), r".*/([a-zA-Z0-9_.-]+)-([0-9]+)/[^/]+$", 1))
        .withColumn(
            "partition",
            F.regexp_extract(F.col("source"), r".*/([a-zA-Z0-9_.-]+)-([0-9]+)/[^/]+$", 2).cast("int"),
        )
    )
    return parsed.select(*[n for n, _ in PARSED_FIELDS])
