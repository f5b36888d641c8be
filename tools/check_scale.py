"""Above-gate-scale correctness spot-check: run the heavyweight klog queries
at sf0.1 (10x the driver gate) on Spark AND re-derive them in DuckDB from
the text rendition of the same fixture. Same comparison as the gate (row
count + column names + order-insensitive value hash).

Usage: python tools/check_scale.py [sf]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from check_queries import lint_arrow_schema, value_hash  # noqa: E402  (same comparison code)


def main(sf: float = 0.1) -> int:
    from klog_spark import entry_queries as eq
    from klog_spark.datagen import ensure_fixture
    from klog_spark.session import get_spark

    fx = str(ensure_fixture(sf))
    sf_dir = f"/root/testdata/sf{sf:g}"
    spark = get_spark(app_name="check-scale")
    con = duckdb.connect()

    checks = {
        "route_counts": (
            eq.q_route_counts,
            f"WITH {eq.klog_base_cte(fx)} "
            "SELECT record_class, COUNT(*) AS n_rows FROM classified GROUP BY record_class",
        ),
        "txn_stats": (
            eq.q_txn_stats,
            eq.SQL_TXN_STATS.replace(eq.klog_txn_cte(), eq.klog_txn_cte(fx)),
        ),
        "batches_per_epoch": (
            eq.q_batches_per_epoch,
            f"WITH {eq.klog_base_cte(fx)} "
            "SELECT producer_id, producer_epoch, COUNT(*) AS n_batches "
            "FROM batches WHERE segment_type = 'data' AND producer_id <> -1 "
            "GROUP BY producer_id, producer_epoch",
        ),
        "offset_gaps": (
            eq.q_offset_gaps,
            f"WITH {eq.klog_base_cte(fx)}, "
            "g AS (SELECT doc_id, file, line_no, base_offset, "
            "  LAG(last_offset) OVER (PARTITION BY file ORDER BY line_no) AS prev_last_offset "
            "  FROM batches WHERE segment_type = 'data') "
            "SELECT doc_id, file, line_no, base_offset, prev_last_offset "
            "FROM g WHERE prev_last_offset IS NOT NULL AND base_offset <> prev_last_offset + 1",
        ),
        "group_lag": (
            eq.q_group_lag,
            eq.SQL_GROUP_LAG.replace(eq.klog_base_cte(), eq.klog_base_cte(fx)),
        ),
        "group_commit_rates": (
            eq.q_group_commit_rates,
            eq.SQL_GROUP_COMMIT_RATES.replace(eq.klog_base_cte(), eq.klog_base_cte(fx)),
        ),
        # round-5 corpus heavyweights over the sf-scale documents table
        "lm_quality": (eq.q_lm_quality, eq.SQL_LM_QUALITY),
        "repeated_spans": (eq.q_repeated_spans, eq.SQL_REPEATED_SPANS),
        # round-6 corpus operators at 10x the gate scale (doc_chunks'
        # oracle bound is correlated — no fixed position cap to outgrow;
        # token_budget_mixture's fixed budgets fall below 10x masses, so
        # the check exercises the pure-greedy path there)
        "doc_chunks": (eq.q_doc_chunks, eq.SQL_DOC_CHUNKS),
        "perplexity_buckets": (eq.q_perplexity_buckets, eq.SQL_PERPLEXITY_BUCKETS),
        "token_budget_mixture": (eq.q_token_budget_mixture, eq.SQL_TOKEN_BUDGET_MIXTURE),
        "semdedup": (eq.q_semdedup, eq.SQL_SEMDEDUP),
        # round-7 operators at 10x the gate scale: decontamination's shingle
        # join, the packed-bitmap Bloom kernel (same oracle as relational),
        # the pinned soft sampler and the pinned cluster rebalancer
        "contamination_removal": (eq.q_contamination_removal, eq.SQL_CONTAMINATION_REMOVAL),
        "bloom_screen_packed": (eq.q_bloom_screen_packed, eq.SQL_BLOOM_SCREEN_PACKED),
        "quality_rejection_sample": (eq.q_quality_rejection_sample, eq.SQL_QUALITY_REJECTION_SAMPLE),
        "cluster_balanced_sample": (eq.q_cluster_balanced_sample, eq.SQL_CLUSTER_BALANCED_SAMPLE),
        "semdedup_prototypes": (eq.q_semdedup_prototypes, eq.SQL_SEMDEDUP_PROTOTYPES),
        # late-round-7 operators: paragraph dedup's global first-occurrence
        # rule, the two-stage ANN refine, the wordlist screen, the snapshot
        # diff and the calibration sweep
        "dedup_paragraphs": (eq.q_dedup_paragraphs, eq.SQL_DEDUP_PARAGRAPHS),
        "ann_ivfpq_rerank": (eq.q_ann_ivfpq_rerank, eq.SQL_ANN_IVFPQ_RERANK),
        "wordlist_filter": (eq.q_wordlist_filter, eq.SQL_WORDLIST_FILTER),
        "corpus_diff": (eq.q_corpus_diff, eq.SQL_CORPUS_DIFF),
        "quality_calibration": (eq.q_quality_calibration, eq.SQL_QUALITY_CALIBRATION),
        "dsir_sample": (eq.q_dsir_sample, eq.SQL_DSIR_SAMPLE),
        "chunk_quality": (eq.q_chunk_quality, eq.SQL_CHUNK_QUALITY),
        "bm25_topk": (eq.q_bm25_topk, eq.SQL_BM25_TOPK),
        "temperature_weights": (eq.q_temperature_weights, eq.SQL_TEMPERATURE_WEIGHTS),
        # round-8 operators at 10x the gate scale: the novelty shingle
        # join, the SQ8 quantizer retrained on the 10x corpus (per-dim
        # min/max change with scale — the float-identity pin is re-proven,
        # not reused), the digest self-join matrix and the curriculum
        # manifest windows
        "ngram_novelty": (eq.q_ngram_novelty, eq.SQL_NGRAM_NOVELTY),
        "ann_sq8_topk": (eq.q_ann_sq8_topk, eq.SQL_ANN_SQ8),
        "cross_source_dups": (eq.q_cross_source_dups, eq.SQL_CROSS_SOURCE_DUPS),
        "curriculum_order": (eq.q_curriculum_order, eq.SQL_CURRICULUM_ORDER),
        # late-round-8: the drift monitor's smoothing constants, the packed
        # novelty kernel's bit derivation and the IVF-SQ8 quantizer all
        # re-derive from the 10x corpus — scale re-proves, never reuses
        "corpus_drift": (eq.q_corpus_drift, eq.SQL_CORPUS_DRIFT),
        "ngram_novelty_packed": (eq.q_ngram_novelty_packed, eq.SQL_NGRAM_NOVELTY_PACKED),
        "ann_ivfsq8_topk": (eq.q_ann_ivfsq8_topk, eq.SQL_ANN_IVFSQ8),
    }
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )

    failures = []
    for name, (q, sql) in checks.items():
        t0 = time.time()
        sdf = q(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        # Arrow fetch + type lint: the same driver-faithful representation
        # path as the sf0.01 gate (tools/check_queries.py)
        tbl = con.execute(sql).arrow()
        lint = lint_arrow_schema(tbl.schema)
        if lint:
            print(f"  sf{sf:g} {name:24s} ORACLE TYPE LINT: " + "; ".join(lint))
            failures.append(name)
            continue
        ocols = list(tbl.schema.names)
        cols_py = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
        orows = list(zip(*cols_py)) if cols_py else []
        ok = (
            len(srows) == len(orows)
            and sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in ocols)
            and value_hash(srows, [c.lower() for c in sdf.columns])
            == value_hash(orows, [c.lower() for c in ocols])
        )
        print(f"  sf{sf:g} {name:24s} {'OK ' if ok else 'FAIL'} rows={len(srows)}/{len(orows)} "
              f"{time.time() - t0:5.1f}s")
        if not ok:
            failures.append(name)
    print(("FAILURES: " + ", ".join(failures)) if failures else f"ALL OK at sf{sf:g}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.1))
