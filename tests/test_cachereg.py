"""Operator-owned cache lifetime (ADVICE r7): persisted intermediates are
registered with klog_spark.cachereg and released at invocation boundaries;
released plans still recompute correctly."""

from __future__ import annotations

from klog_spark.cachereg import _TRACKED, release_tracked, track


def test_track_and_release(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    track(df.persist())
    df.count()  # materialize the cache
    assert df.storageLevel.useMemory
    n = release_tracked(blocking=True)
    assert n >= 1
    assert not df.storageLevel.useMemory
    assert df.count() == 100  # unpersisted plan recomputes fine
    assert _TRACKED == []


def test_operators_register_their_caches(spark):
    """minhash (persist_signatures), DSIR, BM25 and temperature weights all
    leave ZERO persisted blocks behind once release_tracked runs — the
    long-lived-session leak the advice flagged."""
    from klog_spark.datapipe.dedup import minhash_dedup
    from klog_spark.datapipe.mixture import (
        dsir_importance_sample,
        temperature_mixture_weights,
    )
    from klog_spark.datapipe.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"some words {i} repeat words here", "web") for i in range(40)],
        "doc_id long, text string, source string",
    )
    def n_cached():
        sc = spark.sparkContext._jsc.sc()
        return sum(1 for r in sc.getRDDStorageInfo() if r.numCachedPartitions() > 0)

    release_tracked(blocking=True)
    baseline = n_cached()  # session fixtures legitimately cache the parsed fixture
    minhash_dedup(docs, num_hashes=8, bands=4, shingle_n=2).count()
    dsir_importance_sample(docs, docs.limit(3), k=5).count()
    temperature_mixture_weights(docs, alpha=0.5).count()
    bm25_topk(docs, [(1, "some words")], k=3).count()
    assert len(_TRACKED) >= 4
    assert n_cached() > baseline, "operators should have cached intermediates"
    release_tracked(blocking=True)
    assert _TRACKED == []
    assert n_cached() == baseline, "every operator-owned cache must release"
