"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

The klog pipeline queries run over the seeded fixture at the matching scale
(generated/cached under data/klog/); the datapipe queries run over the
driver-provided tables in $SPARK_GRAFT_SF_DIR.

Noise protocol (VERDICT r3 #4): this VM's wall-clock varies up to 3x run to
run, so the suite executes $KLOG_BENCH_RUNS times (default 3) in one session
and reports the per-query MINIMUM (the least-contended observation of the
same fixed plan). The JSON also carries every run's total and the max/min
spread so a round-over-round delta can be judged against the measured noise
floor instead of a single sample.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from klog_spark import entry_queries as eq
    from klog_spark.operators import aggregates
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing
    from klog_spark.session import get_spark

    sf = eq.sf_of(sf_dir)
    fx = eq.klog_fixture(sf_dir)
    spark = get_spark(app_name="klog-bench")

    from pyspark.sql import functions as F

    from klog_spark.datapipe.dedup import (dedup_paragraph_blocks,
                                           embedding_near_dups_lsh,
                                           minhash_dedup)
    from klog_spark.entry_queries import _dup_corpus
    from klog_spark.operators import checks
    from klog_spark.operators.enrich import enrich_with_producer_meta
    from klog_spark.operators.route import routed_as_parsed

    def _novelty_packed_xx(spark, sf_dir):
        from klog_spark.datapipe.dedup import (bloom_pack, ngram_novelty_packed,
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

    seq = spark.read.parquet(f"{fx}/sequences.parquet")
    n_rows = seq.count()
    parse_sequences(seq).filter("record_class='batch'").count()  # warm python workers

    n_runs = max(1, int(os.environ.get("KLOG_BENCH_RUNS", "3")))
    all_runs: list[dict[str, float]] = []
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        from klog_spark.cachereg import release_tracked

        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        # operator-owned caches (minhash sigs, DSIR LMs, BM25 lengths) are
        # per-invocation; release so run N+1 starts from the same storage
        # state as run 1 (ADVICE r7)
        release_tracked()

    # RAM-backed staging dir: the bench measures engine time, not /tmp disk
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="klog-bench-", dir=shm)
    try:
        from klog_spark.operators.route import write_routed

        # warm the write path ONCE (parquet writer + committer class loading —
        # measured ~2-5s of pure first-write JVM cost at sf0.1): a tiny
        # throwaway write so klog_routed_write times the engine, not classloading
        write_routed(apply_validity_routing(parse_sequences(seq.limit(500))),
                     f"{out_dir}/warmup", write_tasks=2)
        meta = spark.read.parquet(f"{fx}/producer_meta.parquet")

        for run in range(n_runs):
            timings = {}
            # the product execution shape: parse ONCE into the routed staging
            # table, then every downstream query is a partition-pruned columnar
            # read (Pipeline.stage). klog_parse_route measures the raw parse;
            # klog_routed_write is the one full parse+write the suite pays.
            # parse kernel in isolation: full materialization into a noop sink —
            # no shuffle, no collect, so kernel-speed commits show up here
            # undiluted by the groupBy/driver noise in klog_parse_route
            timed("klog_parse_only",
                  lambda: parse_sequences(seq).write.format("noop").mode("overwrite").save())
            timed("klog_parse_route", lambda: parse_sequences(seq).groupBy("record_class").count().collect())
            # adaptive layout: direct write in local[32] (the in-process
            # shuffle anti-scales past ~16 threads — measured A/B: direct
            # 10.3-10.7s vs repartition(16) 13.7-22.1s vs pre-shuffle
            # 11.8-22.6s at sf0.1), weighted pre-shuffle on real clusters
            routed_dir = f"{out_dir}/routed{run}"
            timed(
                "klog_routed_write",
                lambda: write_routed(apply_validity_routing(parse_sequences(seq)),
                                     routed_dir),
            )
            staged = spark.read.parquet(routed_dir)
            # per-query class pruning: the partition filter must hit the scan
            # BEFORE routed_as_parsed rewrites record_class into an expression
            txn_view = routed_as_parsed(staged, classes=["batch", "control_msg"])
            timed("klog_txn_stats", lambda: aggregates.txn_stats(txn_view).collect())
            timed("klog_batches_per_epoch",
                  lambda: aggregates.batches_per_epoch(routed_as_parsed(staged, classes=["batch"])).count())
            timed(
                "klog_enrich_team",
                lambda: enrich_with_producer_meta(
                    staged.filter(
                        (F.col("record_class") == "batch") & (F.col("segment_type") == "data")
                        & (F.col("producer_id") != -1)
                    ),
                    meta,
                ).groupBy("team").agg(F.count("*").alias("n"), F.countDistinct("producer_id").alias("p")).collect(),
            )
            timed("klog_state_machine",
                  lambda: checks.state_machine_violations(routed_as_parsed(staged, classes=["txn_state"])).count())
            timed("dedup_exact", lambda: eq.q_dedup_exact(spark, sf_dir).count())
            # throughput path (xxhash64 strings); the java32 oracle variant is
            # gate-verified. The r8 word-hash kernel is the SCALING-corpus
            # winner (+50%, BENCH/SCALING_RUN.md) but measured SLOWER on this
            # fixture's longer documents (in-session A/B 4.8s vs 5.7s at
            # sf0.1, BENCH/BASELINE.md r8) — kernel choice is corpus-shape
            # dependent, so the bench row keeps the comparable string path
            timed(
                "dedup_minhash_lsh",
                lambda: minhash_dedup(_dup_corpus(spark, sf_dir), num_hashes=64, bands=16,
                                      threshold=0.5, hash_fn="xxhash64").count(),
            )
            timed("dedup_embedding_lsh", lambda: eq.q_dedup_embedding_lsh(spark, sf_dir).count())
            timed("ann_cosine_topk", lambda: eq.q_ann_topk(spark, sf_dir).count())
            timed("ann_ivfpq_topk", lambda: eq.q_ann_ivfpq(spark, sf_dir).count())
            timed("text_quality", lambda: eq.q_text_quality(spark, sf_dir).count())
            timed("events_daily", lambda: eq.q_events_daily(spark, sf_dir).count())
            # round-4 operators at sf0.1 scale
            timed("corpus_pack", lambda: eq.q_corpus_pack(spark, sf_dir).count())
            timed("contamination_check", lambda: eq.q_contamination_check(spark, sf_dir).count())
            # round-5: corpus LM scoring (3 keyed shuffles over exploded words)
            timed("lm_quality", lambda: eq.q_lm_quality(spark, sf_dir).count())
            # round-6: context-window chunking — the zero-shuffle per-row path
            timed("doc_chunks", lambda: eq.q_doc_chunks(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            # round-7: packed-bitmap Bloom dedup screen end-to-end — build
            # the bit table, pack it executor-side, broadcast, O(1)-probe
            timed("bloom_screen_packed", lambda: eq.q_bloom_screen_packed(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            # late round-7: paragraph dedup (min-struct agg + reassembly,
            # xxhash64 8-byte shuffle key) and DSIR importance resampling
            # (two LM passes + Gumbel-top-k TakeOrdered)
            timed("dedup_paragraphs",
                  lambda: dedup_paragraph_blocks(_dup_corpus(spark, sf_dir),
                                                 block_words=16, hash_blocks=True)
                  .write.format("noop").mode("overwrite").save())
            timed("dsir_sample", lambda: eq.q_dsir_sample(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            # round-8 (VERDICT r7 #6): the two r7-built operators without a
            # bench row — BM25 retrieval (postings + broadcast query join)
            # and chunk-granular quality (explode + pinned-margin fold)
            timed("bm25_topk", lambda: eq.q_bm25_topk(spark, sf_dir).count())
            timed("chunk_quality", lambda: eq.q_chunk_quality(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            # round-8 operators: exact novelty join, its zero-Exchange
            # packed-Bloom twin (bitmap build included — the realistic
            # cost), SQ8 quantize+search, curriculum manifest
            timed("ngram_novelty", lambda: eq.q_ngram_novelty(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            # throughput path (xxhash64 probes); the java32 oracle variant
            # is gate-verified (same split as dedup_minhash_lsh)
            timed("ngram_novelty_packed", lambda: _novelty_packed_xx(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            timed("ann_sq8_topk", lambda: eq.q_ann_sq8_topk(spark, sf_dir).count())
            timed("curriculum_order", lambda: eq.q_curriculum_order(spark, sf_dir)
                  .write.format("noop").mode("overwrite").save())
            timed("ann_ivfsq8_topk", lambda: eq.q_ann_ivfsq8_topk(spark, sf_dir).count())
            timed("corpus_drift", lambda: eq.q_corpus_drift(spark, sf_dir).count())
            all_runs.append(timings)
            shutil.rmtree(routed_dir, ignore_errors=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # best-of-N per query: the minimum is the least-noise observation of the
    # same deterministic plan on an anti-scaling, contention-prone VM
    best = {q: min(r[q] for r in all_runs) for q in all_runs[0]}
    run_totals = [round(sum(r.values()), 3) for r in all_runs]
    total = round(sum(best.values()), 3)
    # three logical passes over the table (class counts, staged write,
    # txn-stat) — the parse itself runs twice, staged reads are parse-free
    pipeline_s = best["klog_parse_route"] + best["klog_txn_stats"] + best["klog_routed_write"]
    print(json.dumps({
        "metric": "headline query suite wall time (parse/route/aggregate + datapipe; best-of-N)",
        "value": total,
        "unit": "sec",
        "queries": best,
        "sf": sf,
        "klog_rows": n_rows,
        "klog_pipeline_rows_per_sec": round(n_rows * 3 / pipeline_s, 1),
        "runs": n_runs,
        "run_totals": run_totals,
        "noise_spread": round(max(run_totals) / min(run_totals), 3),
    }))


if __name__ == "__main__":
    main()
