"""Transactional-aggregate parity: distributed window form vs sequential oracle.

This is the hardest correctness surface (SURVEY.md §7): klog's collector is
order-dependent (TransactionalInfoCollector.java:56-113) and its combiner
was never written — these tests prove our partial/final decomposition
reproduces it exactly, including filtered variants.
"""

import statistics

import pytest

from klog_spark import oracle
from klog_spark.operators import aggregates as agg


def _expected(st: oracle.TxnStats) -> dict:
    return dict(
        num_committed=st.num_committed,
        num_aborted=st.num_aborted,
        txn_size_count=len(st.txn_sizes),
        txn_size_sum=sum(st.txn_sizes) if st.txn_sizes else None,
        txn_size_min=min(st.txn_sizes, default=None),
        txn_size_max=max(st.txn_sizes, default=None),
        txn_size_avg=statistics.mean(st.txn_sizes) if st.txn_sizes else None,
        txn_dur_count=len(st.txn_durations),
        txn_dur_sum=sum(st.txn_durations) if st.txn_durations else None,
        txn_dur_min=min(st.txn_durations, default=None),
        txn_dur_max=max(st.txn_durations, default=None),
        txn_dur_avg=statistics.mean(st.txn_durations) if st.txn_durations else None,
        num_empty_txn=len(st.empty_txns),
        num_open_txn=len(st.open_txns),
        num_offset_gaps=st.num_offset_gaps,
    )


def _check(parsed_df, oracle_parsed, **filters):
    row = agg.txn_stats(parsed_df, **filters).collect()[0].asDict()
    exp = _expected(oracle.txn_stat(oracle_parsed, **filters))
    for k, v in exp.items():
        got = row[k]
        if isinstance(v, float):
            assert got == pytest.approx(v), k
        elif k in ("txn_size_sum", "txn_dur_sum") and v is None:
            assert got in (None, 0), k
        else:
            assert got == v, (k, got, v)


def test_txn_stats_unfiltered(parsed_df, oracle_parsed):
    _check(parsed_df, oracle_parsed)


def test_txn_stats_pid_filter(parsed_df, oracle_parsed):
    _check(parsed_df, oracle_parsed, pid=1)


def test_txn_stats_pid_epoch_filter(parsed_df, oracle_parsed):
    _check(parsed_df, oracle_parsed, pid=1001, producer_epoch=0)


def test_txn_stats_leader_epoch_filter(parsed_df, oracle_parsed):
    _check(parsed_df, oracle_parsed, leader_epoch=2)


def test_open_txn_detail(parsed_df, oracle_parsed):
    st = oracle.txn_stat(oracle_parsed)
    got = {
        (r["producer_id"], r["producer_epoch"], r["first_batch_doc_id"], r["n_data_batches"])
        for r in agg.open_txns(parsed_df).collect()
    }
    want = {(p, e, d, n) for (p, e), (d, n) in st.open_txns.items()}
    assert got == want


def test_empty_txn_detail(parsed_df, oracle_parsed):
    st = oracle.txn_stat(oracle_parsed)
    got = sorted(r["closing_batch_doc_id"] for r in agg.empty_txns(parsed_df).collect())
    assert got == sorted(st.empty_txns)


def test_first_last_batch(parsed_df, oracle_parsed):
    st = oracle.txn_stat(oracle_parsed)
    row = agg.first_last_batch(parsed_df).collect()[0]
    assert row["first_batch_doc_id"] == st.first_batch_doc
    assert row["last_batch_doc_id"] == st.last_batch_doc


def test_batches_per_epoch_totals(parsed_df, oracle_parsed):
    rows = agg.batches_per_epoch(parsed_df).collect()
    from klog_spark.oracle import segment_type

    want = {}
    for p in oracle_parsed:
        if (p.record_class == "batch" and segment_type(p.source) == "data"
                and p.fields["is_valid"] and p.fields["producer_id"] != -1):
            k = (p.fields["producer_id"], p.fields["producer_epoch"])
            want[k] = want.get(k, 0) + 1
    got = {(r["producer_id"], r["producer_epoch"]): r["n_batches"] for r in rows}
    assert got == want


def test_topics_sanity(parsed_df):
    row = agg.topics_sanity(parsed_df).collect()[0]
    assert row["n_topics"] == 1  # fixture has one data topic
