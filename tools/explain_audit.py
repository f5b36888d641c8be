"""Plan audit: capture `.explain("formatted")` for the flagship queries and
assert the shape we designed for (pushdown, pruning, broadcast joins,
whole-stage codegen, single parse). Writes BENCH/PLANS.md.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    from pyspark.sql import functions as F

    from klog_spark import entry_queries as eq
    from klog_spark.operators import aggregates
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import routed_as_parsed
    from klog_spark.session import get_spark

    spark = get_spark(app_name="explain-audit", master="local[8]", shuffle_partitions=8)
    fx = eq.klog_fixture(SF_DIR)
    seq = spark.read.parquet(f"{fx}/sequences.parquet")

    sections: list[tuple[str, str, list[str]]] = []

    # 1. parse + class filter: scan feeds ONE MapInArrow, source-derived
    #    columns codegen'd after it
    p = parse_sequences(seq).filter(F.col("record_class") == "batch")
    sections.append((
        "parse + class filter",
        plan_of(p),
        ["MapInArrow", "Scan parquet"],
    ))

    # 2. txn_stats: one file-Exchange feeding the windows, session Exchange,
    #    partial+final aggregates
    t = aggregates.txn_stats(parse_sequences(seq))
    sections.append(("txn_stats (sessionized fold)", plan_of(t), ["Window", "HashAggregate"]))

    # 3. broadcast enrichment
    e = eq.q_enrich_producer_team(spark, SF_DIR)
    sections.append(("broadcast enrich", plan_of(e), ["BroadcastHashJoin"]))

    # 4. staging read with partition pruning: sink filter must reach the scan
    import tempfile

    out = tempfile.mkdtemp()
    from klog_spark.operators.route import apply_validity_routing

    apply_validity_routing(parse_sequences(seq)).write.mode("overwrite").partitionBy(
        "record_class"
    ).parquet(f"{out}/r")
    staged = spark.read.parquet(f"{out}/r").filter(F.col("record_class") == "control_msg")
    pruned_plan = plan_of(staged.select("doc_id", "commit"))
    sections.append(("staging partition pruning", pruned_plan, ["PartitionFilters"]))

    # 5. dedup minhash LSH candidate join (shuffle on band buckets only)
    d = eq.q_dedup_minhash(spark, SF_DIR)
    sections.append(("minhash LSH", plan_of(d), ["HashAggregate"]))

    # 6. embedding LSH dedup: bucket equi-joins only — the plan must contain
    #    NO cartesian/nested-loop stage (the whole point vs dedup_embedding)
    el = eq.q_dedup_embedding_lsh(spark, SF_DIR)
    el_plan = plan_of(el, "simple")
    # equi-join on bucket — any hash/merge join form is fine (AQE picks)
    sections.append(("embedding LSH dedup", plan_of(el), ["Join"]))
    assert "CartesianProduct" not in el_plan and "BroadcastNestedLoopJoin" not in el_plan, \
        "embedding LSH dedup must not contain an all-pairs stage"

    # 7. ANN probes broadcast the tiny query side
    ann = eq.q_ann_lsh(spark, SF_DIR)
    sections.append(("ANN LSH multiprobe", plan_of(ann), ["BroadcastHashJoin"]))

    # 8. routed write: pre-shuffle Exchange on (record_class, bucket) so each
    #    task writes ~one sink's file
    from klog_spark.operators.route import write_routed
    import io as _io, contextlib as _ctx

    buf = _io.StringIO()
    wdf = apply_validity_routing(parse_sequences(seq))
    from klog_spark.operators.route import pre_shuffle_for_write

    n = spark.sparkContext.defaultParallelism
    shuffled = pre_shuffle_for_write(wdf, 3 * n)  # the write_routed scheme itself
    with _ctx.redirect_stdout(buf):
        shuffled.explain("simple")
    assert "Exchange hashpartitioning(record_class" in buf.getvalue(), \
        "routed write must pre-shuffle on (record_class, weighted bucket)"

    # 8b. group-offsets lag: the log-end side must broadcast (tiny per-
    #     partition aggregate joined into the compacted commit view)
    gl = eq.q_group_lag(spark, SF_DIR)
    sections.append(("group lag (broadcast log-end)", plan_of(gl), ["BroadcastHashJoin"]))

    # 8c. read-committed offsets: window-only visibility resolution — the
    #     marker attribution must be Window operators (running last() over
    #     DESC order), never a per-row self-join or nested loop
    rc = eq.q_group_offsets_read_committed(spark, SF_DIR)
    rc_plan = plan_of(rc, "simple")
    sections.append(("read-committed group offsets", plan_of(rc), ["Window"]))
    assert "CartesianProduct" not in rc_plan and "BroadcastNestedLoopJoin" not in rc_plan, \
        "read-committed visibility must stay window-based, no all-pairs stage"

    # 8d. round-4 operators: packing is a per-shard window (no global sort),
    #     contamination is capped equi-joins (no cartesian), IVF-PQ probes
    #     broadcast the query side and never nest loops
    pk = eq.q_corpus_pack(spark, SF_DIR)
    pk_plan = plan_of(pk, "simple")
    sections.append(("token-budget packing", plan_of(pk), ["Window"]))
    assert "Sort [" not in pk_plan.split("Window")[0] or "hashpartitioning(file" in pk_plan, \
        "packing must window per file shard, not globally sort"
    cont = eq.q_contamination_check(spark, SF_DIR)
    cont_plan = plan_of(cont, "simple")
    sections.append(("contamination scan", plan_of(cont), ["Join"]))
    assert "CartesianProduct" not in cont_plan and "BroadcastNestedLoopJoin" not in cont_plan
    pq = eq.q_ann_ivfpq(spark, SF_DIR)
    pq_plan = plan_of(pq, "simple")
    sections.append(("IVF-PQ ANN", plan_of(pq), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in pq_plan and "BroadcastNestedLoopJoin" not in pq_plan

    # 8e. named custom-operator classes: as-of is windows (no join at all),
    #     the range join is a bucket equi-join, neither may nest loops
    af = eq.q_batch_state_asof(spark, SF_DIR)
    af_plan = plan_of(af, "simple")
    sections.append(("AS-OF join (union+window)", plan_of(af), ["Window"]))
    assert "CartesianProduct" not in af_plan and "BroadcastNestedLoopJoin" not in af_plan
    ij = eq.q_event_session_interval_join(spark, SF_DIR)
    ij_plan = plan_of(ij, "simple")
    sections.append(("range join (bucketed containment)", plan_of(ij), ["Join"]))
    assert "CartesianProduct" not in ij_plan and "BroadcastNestedLoopJoin" not in ij_plan

    # 8f. round-5 corpus operators: LM scoring is three keyed shuffles
    #     (word count, score join, doc agg) with map-side partials; the
    #     derandomized weighted sample must compile to TakeOrdered (global)
    #     — per-partition partial top-k, never a single-partition sort
    lm = eq.q_lm_quality(spark, SF_DIR)
    sections.append(("unigram LM scoring", plan_of(lm), ["HashAggregate", "Join"]))
    from klog_spark.datapipe.mixture import weighted_sample

    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ws = weighted_sample(docs_df, k=50, weight_col="n_chars")
    ws_plan = plan_of(ws, "simple")
    sections.append(("weighted sample (global A-ES)", plan_of(ws), ["TakeOrderedAndProject"]))
    assert "TakeOrderedAndProject" in ws_plan, "global sample must be TakeOrdered"

    # 8g. sketches & corpus stats: fixed-size hash aggregations; the CMS
    #     estimate is a bounded (by, d, bucket) equi-join; the repeated-span
    #     merge is windows + aggregates with no nested loop anywhere
    cms = eq.q_cms_user_counts(spark, SF_DIR)
    cms_plan = plan_of(cms, "simple")
    sections.append(("Count-Min sketch build+estimate", plan_of(cms), ["HashAggregate", "Join"]))
    assert "CartesianProduct" not in cms_plan
    bp = eq.q_bpe_pair_counts(spark, SF_DIR)
    sections.append(("BPE pair counts", plan_of(bp), ["HashAggregate"]))
    rs = eq.q_repeated_spans(spark, SF_DIR)
    rs_plan = plan_of(rs, "simple")
    sections.append(("repeated-span detection", plan_of(rs), ["Window", "HashAggregate"]))
    assert "CartesianProduct" not in rs_plan and "BroadcastNestedLoopJoin" not in rs_plan

    # 8h. round-6 corpus operators: chunking must stay a pure per-row
    #     projection (ZERO Exchange); token-budget mixture broadcasts the
    #     tiny per-source mass table; semdedup's only pairwise work is the
    #     per-cell equi-join (no nested loop); perplexity bucketing is the
    #     LM joins + one ntile window
    ck = eq.q_doc_chunks(spark, SF_DIR)
    ck_plan = plan_of(ck, "simple")
    sections.append(("context-window chunking", plan_of(ck), ["Scan parquet"]))
    assert "Exchange" not in ck_plan, "chunking must not shuffle"
    tb = eq.q_token_budget_mixture(spark, SF_DIR)
    tb_plan = plan_of(tb, "simple")
    sections.append(("token-budget mixture", plan_of(tb), ["BroadcastHashJoin", "Window"]))
    assert "CartesianProduct" not in tb_plan
    sd = eq.q_semdedup(spark, SF_DIR)
    sd_plan = plan_of(sd, "simple")
    sections.append(("SemDeDup (IVF-cell prune)", plan_of(sd), ["HashAggregate"]))
    assert "CartesianProduct" not in sd_plan and "BroadcastNestedLoopJoin" not in sd_plan
    pb = eq.q_perplexity_buckets(spark, SF_DIR)
    sections.append(("perplexity bucketing", plan_of(pb), ["Window", "HashAggregate"]))
    sf_q = eq.q_scored_quality_filter(spark, SF_DIR)
    sf_plan = plan_of(sf_q, "simple")
    sections.append(("pinned scored filter (apply)", plan_of(sf_q), ["Scan parquet"]))
    assert "Exchange" not in sf_plan, "applying a pinned model must not shuffle"

    # 8i. round-7 operators: decontamination is the same capped shingle
    #     equi-join as the scan (no cartesian); the packed Bloom screen and
    #     the soft quality sampler are pure per-row kernels (ZERO Exchange);
    #     cluster-balanced sampling broadcasts the bounded cell-size table
    cr = eq.q_contamination_removal(spark, SF_DIR)
    cr_plan = plan_of(cr, "simple")
    sections.append(("contamination removal", plan_of(cr), ["Join"]))
    assert "CartesianProduct" not in cr_plan and "BroadcastNestedLoopJoin" not in cr_plan
    bsp = eq.q_bloom_screen_packed(spark, SF_DIR)
    bsp_plan = plan_of(bsp, "simple")
    sections.append(("packed Bloom screen", plan_of(bsp), ["MapInArrow"]))
    assert "Exchange" not in bsp_plan, "packed Bloom probe must not shuffle"
    qrs = eq.q_quality_rejection_sample(spark, SF_DIR)
    qrs_plan = plan_of(qrs, "simple")
    sections.append(("soft quality rejection sample", plan_of(qrs), ["Scan parquet"]))
    assert "Exchange" not in qrs_plan, "soft sampling must stay a stateless projection"
    cbs = eq.q_cluster_balanced_sample(spark, SF_DIR)
    cbs_plan = plan_of(cbs, "simple")
    sections.append(("cluster-balanced sample", plan_of(cbs), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in cbs_plan and "BroadcastNestedLoopJoin" not in cbs_plan
    hde = eq.q_hashed_embeddings(spark, SF_DIR)
    hde_plan = plan_of(hde, "simple")
    sections.append(("hashed doc embeddings", plan_of(hde), ["HashAggregate"]))
    assert "CartesianProduct" not in hde_plan and "BroadcastNestedLoopJoin" not in hde_plan
    sp = eq.q_semdedup_prototypes(spark, SF_DIR)
    sp_plan = plan_of(sp, "simple")
    sections.append(("SemDeDup prototypes (keep=farthest)", plan_of(sp), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in sp_plan and "BroadcastNestedLoopJoin" not in sp_plan

    # 8j. late-round-7 operators: paragraph dedup's keep decision must be a
    #     partial-aggregated hash agg (never a window funneling hot blocks
    #     through one task); the ANN refine stage must BROADCAST the
    #     candidate set against the corpus; the wordlist screen is a pure
    #     projection; the snapshot diff is one digest-only SortMergeJoin/
    #     ShuffledHashJoin with no cartesian
    dp = eq.q_dedup_paragraphs(spark, SF_DIR)
    dp_plan = plan_of(dp, "simple")
    sections.append(("paragraph-block dedup", plan_of(dp), ["HashAggregate"]))
    assert "Window" not in dp_plan, "block keep decision must be an agg, not a window"
    rr = eq.q_ann_ivfpq_rerank(spark, SF_DIR)
    rr_plan = plan_of(rr, "simple")
    sections.append(("IVF-PQ exact re-rank", plan_of(rr), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in rr_plan and "BroadcastNestedLoopJoin" not in rr_plan
    wf = eq.q_wordlist_filter(spark, SF_DIR)
    wf_plan = plan_of(wf, "simple")
    sections.append(("blocked-wordlist filter", plan_of(wf), ["Scan parquet"]))
    assert "Exchange" not in wf_plan, "the expr wordlist path must not shuffle"
    cd = eq.q_corpus_diff(spark, SF_DIR)
    cd_plan = plan_of(cd, "simple")
    sections.append(("corpus snapshot diff", plan_of(cd), ["Join"]))
    assert "CartesianProduct" not in cd_plan and "BroadcastNestedLoopJoin" not in cd_plan
    qc = eq.q_quality_calibration(spark, SF_DIR)
    qc_plan = plan_of(qc, "simple")
    sections.append(("quality calibration sweep", plan_of(qc), ["HashAggregate"]))
    assert "CartesianProduct" not in qc_plan and "BroadcastNestedLoopJoin" not in qc_plan
    ds = eq.q_dsir_sample(spark, SF_DIR)
    ds_plan = plan_of(ds, "simple")
    sections.append(("DSIR importance resampling", plan_of(ds), ["TakeOrderedAndProject"]))
    assert "CartesianProduct" not in ds_plan and "BroadcastNestedLoopJoin" not in ds_plan, \
        "DSIR top-k must be TakeOrdered partial top-k, never a global sort/cartesian"
    cq = eq.q_chunk_quality(spark, SF_DIR)
    cq_plan = plan_of(cq, "simple")
    sections.append(("chunk-quality worst-chunk filter", plan_of(cq), ["HashAggregate"]))
    assert "Exchange hashpartitioning(doc_id" in cq_plan, \
        "chunk quality's only shuffle is the doc_id aggregation"
    assert cq_plan.count("Exchange") == 1, \
        "chunk quality must shuffle exactly once (the doc_id agg)"
    bm = eq.q_bm25_topk(spark, SF_DIR)
    bm_plan = plan_of(bm, "simple")
    sections.append(("BM25 keyword retrieval", plan_of(bm), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in bm_plan and "BroadcastNestedLoopJoin" not in bm_plan, \
        "query terms must broadcast into the postings join"
    twq = eq.q_temperature_weights(spark, SF_DIR)
    sections.append(("temperature source weights", plan_of(twq), ["HashAggregate"]))

    # 8k. round-8 operators: novelty is one distinct-shingle equi-join (no
    #     cartesian); SQ8 search is a per-row decode into the GEMM kernel
    #     (no nested loop); the cross-source matrix is a digest-keyed
    #     self-join; the curriculum manifest windows on (bucket, shard) —
    #     never an Exchange SinglePartition global sort
    nv = eq.q_ngram_novelty(spark, SF_DIR)
    nv_plan = plan_of(nv, "simple")
    sections.append(("n-gram novelty scan", plan_of(nv), ["Join", "HashAggregate"]))
    assert "CartesianProduct" not in nv_plan and "BroadcastNestedLoopJoin" not in nv_plan
    sq = eq.q_ann_sq8_topk(spark, SF_DIR)
    sq_plan = plan_of(sq, "simple")
    sections.append(("SQ8 scalar-quantized ANN", plan_of(sq), ["MapInPandas"]))
    assert "CartesianProduct" not in sq_plan and "BroadcastNestedLoopJoin" not in sq_plan
    xs = eq.q_cross_source_dups(spark, SF_DIR)
    xs_plan = plan_of(xs, "simple")
    sections.append(("cross-source dup matrix", plan_of(xs), ["HashAggregate", "Join"]))
    assert "CartesianProduct" not in xs_plan and "BroadcastNestedLoopJoin" not in xs_plan
    co = eq.q_curriculum_order(spark, SF_DIR)
    co_plan = plan_of(co, "simple")
    sections.append(("curriculum order manifest", plan_of(co), ["Window"]))
    assert "Exchange SinglePartition" not in co_plan, \
        "curriculum manifest must window per (bucket, shard), never globally"

    # 8l. late-round-8 operators: the drift monitor's top-k must compile to
    #     TakeOrdered (partial per-partition top-k, never a single-partition
    #     sort); the packed novelty screen is a stateless kernel (ZERO
    #     Exchange); IVF-SQ8 keeps the broadcast probe shape with no nested
    #     loop anywhere
    dr = eq.q_corpus_drift(spark, SF_DIR)
    dr_plan = plan_of(dr, "simple")
    sections.append(("corpus drift monitor", plan_of(dr), ["TakeOrderedAndProject"]))
    assert "TakeOrderedAndProject" in dr_plan and "CartesianProduct" not in dr_plan
    nvp = eq.q_ngram_novelty_packed(spark, SF_DIR)
    nvp_plan = plan_of(nvp, "simple")
    sections.append(("packed-Bloom novelty screen", plan_of(nvp), ["MapInArrow"]))
    assert "Exchange" not in nvp_plan, "packed novelty must not shuffle"
    i8 = eq.q_ann_ivfsq8_topk(spark, SF_DIR)
    i8_plan = plan_of(i8, "simple")
    sections.append(("IVF-SQ8 composite ANN", plan_of(i8), ["BroadcastHashJoin"]))
    assert "CartesianProduct" not in i8_plan and "BroadcastNestedLoopJoin" not in i8_plan

    # 8m. last round-8 operators: KN scoring is vocab-sized aggregations +
    #     one (prev, w) join back; the interleave schedule windows per
    #     source — never a single-partition global sort
    kn = eq.q_kneser_ney_score(spark, SF_DIR)
    kn_plan = plan_of(kn, "simple")
    sections.append(("Kneser-Ney bigram scoring", plan_of(kn), ["HashAggregate", "Join"]))
    assert "CartesianProduct" not in kn_plan and "BroadcastNestedLoopJoin" not in kn_plan
    il = eq.q_mixture_interleave(spark, SF_DIR)
    il_plan = plan_of(il, "simple")
    sections.append(("weighted source interleave", plan_of(il), ["Window"]))
    assert "Exchange SinglePartition" not in il_plan,         "interleave must window per source, never globally"

    # 9. no input-scaled driver collects: every `.collect()` in the query
    #    registry / datapipe must be bounded by a `.limit(...)` or a literal
    #    id filter — driver memory must never grow with the corpus
    bounded = (".limit(", 'F.col("vec_id") < 5')
    for src in [Path("klog_spark/entry_queries.py"), *Path("klog_spark/datapipe").glob("*.py")]:
        for i, line in enumerate(src.read_text().splitlines(), 1):
            if ".collect()" in line and not any(b in line for b in bounded):
                raise AssertionError(
                    f"{src}:{i} unbounded driver collect: {line.strip()!r} — "
                    "cap it with .limit(...) or a literal filter"
                )
    print("driver-collect audit: all collects bounded")

    failures = []
    out_md = ["# Physical plan audit (sf0.01, local[8])\n"]
    for name, plan, must_contain in sections:
        missing = [m for m in must_contain if m not in plan]
        status = "OK" if not missing else f"MISSING {missing}"
        if missing:
            failures.append((name, missing))
        print(f"{name:32s} {status}")
        out_md.append(f"## {name} — {status}\n\n```\n{plan[:4000]}\n```\n")

    # targeted assertions
    # simple mode prints each physical node exactly once -> exact parse count
    txn_tree = plan_of(aggregates.txn_stats(parse_sequences(seq)), "simple")
    n_mapinarrow = txn_tree.count("MapInArrow")
    print(f"txn_stats MapInArrow occurrences: {n_mapinarrow} (parse branches)")
    out_md.append(f"\ntxn_stats MapInArrow occurrences: {n_mapinarrow}\n")
    assert n_mapinarrow == 1, f"txn_stats must parse exactly once, got {n_mapinarrow}"
    assert "CartesianProduct" not in txn_tree and "BroadcastNestedLoopJoin" not in txn_tree
    assert "PushedFilters" in sections[0][1] or "Scan parquet" in sections[0][1]

    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/PLANS.md").write_text("\n".join(out_md))
    print("wrote BENCH/PLANS.md")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
