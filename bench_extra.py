"""Per-query isolation bench (guide §1.4): times a SELECTED subset of the
bench.py query set with noop sinks, so an optimization can be A/B'd in
minutes instead of a full 3-run suite. Same session factory, fixture and
release discipline as bench.py; NOT a replacement for it — the driver's
numbers come from the frozen bench.py.

Usage:
  SPARK_GRAFT_SF_DIR=... python bench_extra.py [runs] [name ...]
With no names, runs every query. Prints one JSON line {name: best_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F

    from klog_spark import entry_queries as eq
    from klog_spark.cachereg import release_tracked
    from klog_spark.datapipe.dedup import (dedup_paragraph_blocks,
                                           embedding_near_dups_lsh,
                                           minhash_dedup)
    from klog_spark.entry_queries import _dup_corpus
    from klog_spark.operators import aggregates, checks
    from klog_spark.operators.enrich import enrich_with_producer_meta
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import (apply_validity_routing,
                                            routed_as_parsed, write_routed)
    from klog_spark.session import get_spark

    spark = get_spark(app_name="klog-bench-extra")
    fx = eq.klog_fixture(sf_dir)
    seq = spark.read.parquet(f"{fx}/sequences.parquet")
    meta = spark.read.parquet(f"{fx}/producer_meta.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def _novelty_packed_xx():
        from klog_spark.datapipe.dedup import (bloom_pack,
                                               ngram_novelty_packed,
                                               shingle_bloom_bits)
        from klog_spark.entry_queries import (NOVELTY_BLOOM_K, NOVELTY_BLOOM_M,
                                              _novelty_corpora)

        tgt, ref = _novelty_corpora(spark, sf_dir)
        bm = bloom_pack(
            shingle_bloom_bits(ref, m=NOVELTY_BLOOM_M, k=NOVELTY_BLOOM_K, n=3,
                               hash_fn="xxhash64"),
            m=NOVELTY_BLOOM_M)
        return ngram_novelty_packed(tgt, bm, m=NOVELTY_BLOOM_M,
                                    k=NOVELTY_BLOOM_K, n=3, hash_fn="xxhash64")

    import shutil
    import tempfile
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="klog-bx-", dir=shm)
    routed_dir = f"{out_dir}/routed"
    staged_holder = {}

    def _staged():
        if "df" not in staged_holder:
            write_routed(apply_validity_routing(parse_sequences(seq)), routed_dir)
            staged_holder["df"] = spark.read.parquet(routed_dir)
        return staged_holder["df"]

    jobs = {
        "klog_parse_only": lambda: noop(parse_sequences(seq)),
        "klog_parse_route": lambda: parse_sequences(seq).groupBy("record_class").count().collect(),
        "klog_routed_write": lambda: write_routed(
            apply_validity_routing(parse_sequences(seq)), f"{out_dir}/rw"),
        "klog_txn_stats": lambda: aggregates.txn_stats(
            routed_as_parsed(_staged(), classes=["batch", "control_msg"])).collect(),
        "klog_batches_per_epoch": lambda: aggregates.batches_per_epoch(
            routed_as_parsed(_staged(), classes=["batch"])).count(),
        "klog_enrich_team": lambda: enrich_with_producer_meta(
            _staged().filter(
                (F.col("record_class") == "batch") & (F.col("segment_type") == "data")
                & (F.col("producer_id") != -1)), meta,
        ).groupBy("team").agg(F.count("*").alias("n"),
                              F.countDistinct("producer_id").alias("p")).collect(),
        "klog_state_machine": lambda: checks.state_machine_violations(
            routed_as_parsed(_staged(), classes=["txn_state"])).count(),
        "dedup_exact": lambda: eq.q_dedup_exact(spark, sf_dir).count(),
        "dedup_minhash_lsh": lambda: minhash_dedup(
            _dup_corpus(spark, sf_dir), num_hashes=64, bands=16,
            threshold=0.5, hash_fn="xxhash64").count(),
        "dedup_embedding_lsh": lambda: eq.q_dedup_embedding_lsh(spark, sf_dir).count(),
        "ann_cosine_topk": lambda: eq.q_ann_topk(spark, sf_dir).count(),
        "ann_ivfpq_topk": lambda: eq.q_ann_ivfpq(spark, sf_dir).count(),
        "text_quality": lambda: eq.q_text_quality(spark, sf_dir).count(),
        "events_daily": lambda: eq.q_events_daily(spark, sf_dir).count(),
        "corpus_pack": lambda: eq.q_corpus_pack(spark, sf_dir).count(),
        "contamination_check": lambda: eq.q_contamination_check(spark, sf_dir).count(),
        "lm_quality": lambda: eq.q_lm_quality(spark, sf_dir).count(),
        "doc_chunks": lambda: noop(eq.q_doc_chunks(spark, sf_dir)),
        "bloom_screen_packed": lambda: noop(eq.q_bloom_screen_packed(spark, sf_dir)),
        "dedup_paragraphs": lambda: noop(dedup_paragraph_blocks(
            _dup_corpus(spark, sf_dir), block_words=16, hash_blocks=True)),
        "dsir_sample": lambda: noop(eq.q_dsir_sample(spark, sf_dir)),
        "bm25_topk": lambda: eq.q_bm25_topk(spark, sf_dir).count(),
        "chunk_quality": lambda: noop(eq.q_chunk_quality(spark, sf_dir)),
        "ngram_novelty": lambda: noop(eq.q_ngram_novelty(spark, sf_dir)),
        "ngram_novelty_packed": lambda: noop(_novelty_packed_xx()),
        "ann_sq8_topk": lambda: eq.q_ann_sq8_topk(spark, sf_dir).count(),
        "curriculum_order": lambda: noop(eq.q_curriculum_order(spark, sf_dir)),
        "ann_ivfsq8_topk": lambda: eq.q_ann_ivfsq8_topk(spark, sf_dir).count(),
        "corpus_drift": lambda: eq.q_corpus_drift(spark, sf_dir).count(),
    }
    sel = {k: v for k, v in jobs.items() if not only or k in only}

    # warm python workers + parquet cache like bench.py does
    parse_sequences(seq).filter("record_class='batch'").count()

    best: dict[str, float] = {}
    try:
        for r in range(runs):
            for name, fn in sel.items():
                spark.sparkContext.setJobDescription(f"bx:{name}")
                t0 = time.time()
                fn()
                dt = round(time.time() - t0, 3)
                best[name] = min(best.get(name, 1e9), dt)
                release_tracked()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
