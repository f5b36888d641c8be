"""Structured Streaming surface: routed sink parity with batch, watermark agg."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_input(spark, fixture_dir, tmp_path_factory):
    # stream source dir: split the fixture into several files so
    # maxFilesPerTrigger exercises multiple micro-batches
    src = tmp_path_factory.mktemp("stream_src")
    df = spark.read.parquet(f"{fixture_dir}/sequences.parquet")
    df.repartition(6).write.mode("overwrite").parquet(str(src))
    return str(src)


def test_streaming_routed_sink_matches_batch(spark, fixture_dir, stream_input, tmp_path):
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing
    from klog_spark.streaming import read_sequence_stream, start_routed_sink

    out = tmp_path / "routed"
    ckpt = tmp_path / "ckpt"
    q = start_routed_sink(read_sequence_stream(spark, stream_input), str(out), str(ckpt))
    q.awaitTermination(300)

    routed = spark.read.parquet(str(out))
    batch = apply_validity_routing(
        parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    )
    got = {r["record_class"]: r["n"] for r in routed.groupBy("record_class").agg(F.count("*").alias("n")).collect()}
    want = {r["record_class"]: r["n"] for r in batch.groupBy("record_class").agg(F.count("*").alias("n")).collect()}
    assert got == want

    # restart with no new files -> no duplicates (exactly-once resume)
    q2 = start_routed_sink(read_sequence_stream(spark, stream_input), str(out), str(ckpt))
    q2.awaitTermination(120)
    assert spark.read.parquet(str(out)).count() == sum(want.values())


def test_streaming_marker_counts(spark, fixture_dir, stream_input, tmp_path):
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.streaming import read_sequence_stream, start_marker_counts_sink

    q = start_marker_counts_sink(
        read_sequence_stream(spark, stream_input), str(tmp_path / "ckpt2"), query_name="mc_test"
    )
    q.awaitTermination(300)
    rows = spark.sql("select sum(num_committed) c, sum(num_aborted) a from mc_test").collect()[0]
    batch = parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    want = batch.filter(F.col("record_class") == "control_msg").agg(
        F.sum(F.when(F.col("commit"), 1).otherwise(0)).alias("c"),
        F.sum(F.when(~F.col("commit"), 1).otherwise(0)).alias("a"),
    ).collect()[0]
    assert rows["c"] == want["c"]
    assert rows["a"] == want["a"]


def test_stateful_session_marker_totals(spark, fixture_dir, stream_input, tmp_path):
    """applyInPandasWithState operator: final per-file totals must equal the
    batch groupBy, with state carried across multiple micro-batches."""
    from pyspark.sql import functions as F

    from klog_spark.operators.parse import parse_sequences
    from klog_spark.streaming import read_sequence_stream, session_marker_totals_stream

    q = (
        session_marker_totals_stream(read_sequence_stream(spark, stream_input, max_files_per_trigger=2))
        .writeStream.format("memory").queryName("smt_test").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # 'update' mode emits one row per state change; the LAST row per file is
    # the final total
    got = {
        r["file"]: (r["num_committed"], r["num_aborted"])
        for r in spark.sql("select * from smt_test").collect()
    }  # memory sink appends in order; dict keeps the last per file
    batch = parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    want = {
        r["file"]: (r["c"], r["a"])
        for r in batch.filter(F.col("record_class") == "control_msg")
        .groupBy("file")
        .agg(F.sum(F.when(F.col("commit"), 1).otherwise(0)).alias("c"),
             F.sum(F.when(~F.col("commit"), 1).otherwise(0)).alias("a"))
        .collect()
    }
    assert got == want


def test_stateful_latest_group_offsets_matches_batch(spark, fixture_dir, stream_input, tmp_path):
    """Streaming compaction of offset commits: the final state per
    (group, topic, partition) must equal the batch latest_group_offsets,
    with micro-batches delivering files in arbitrary order (the state's
    (file, line_no) ordering key absorbs late arrivals)."""
    from klog_spark.operators.group_offsets import latest_group_offsets
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.streaming import latest_group_offsets_stream, read_sequence_stream

    q = (
        latest_group_offsets_stream(read_sequence_stream(spark, stream_input, max_files_per_trigger=2))
        .writeStream.format("memory").queryName("lgo_test").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # take the newest emission per key by the carried (file, line_no) order
    final = {}
    for r in spark.sql("select * from lgo_test").collect():
        key = (r["group_id"], r["commit_topic"], r["commit_partition"])
        cand = (r["file"], r["line_no"], r["committed_offset"], r["is_deletion"])
        if key not in final or (cand[0], cand[1]) > (final[key][0], final[key][1]):
            final[key] = cand
    got = {k: v[2] for k, v in final.items() if not v[3]}

    batch = parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    want = {
        (r["group_id"], r["commit_topic"], r["commit_partition"]): r["committed_offset"]
        for r in latest_group_offsets(batch).collect()
    }
    assert got == want and got


def test_streaming_sink_file_count_tracks_write_tasks(spark, stream_input, tmp_path):
    """VERDICT r3 #5: the streaming routed sink must use the same weighted
    (record_class, bucket) pre-shuffle as the batch write, so one micro-batch
    emits ~write_tasks files — NOT tasks x sinks small files."""
    from klog_spark.operators.route import CLASS_WEIGHTS, SINKS
    from klog_spark.streaming import read_sequence_stream, start_routed_sink

    write_tasks = 8
    out, ckpt = tmp_path / "routed_wt", tmp_path / "ckpt_wt"
    # one micro-batch: max_files_per_trigger above the source file count
    q = start_routed_sink(
        read_sequence_stream(spark, stream_input, max_files_per_trigger=64),
        str(out), str(ckpt), write_tasks=write_tasks, pre_shuffle=True,
    )
    q.awaitTermination(300)

    files = [p for p in out.rglob("*.parquet") if p.is_file()]
    class_dirs = [d for d in out.glob("record_class=*") if d.is_dir()]
    assert class_dirs, "partitioned sink directories missing"
    # weighted buckets: class c contributes max(1, round(w_c * write_tasks))
    # distinct shuffle keys, so the ceiling is the sum over classes present
    buckets = {c: max(1, round(CLASS_WEIGHTS.get(c, 0.02) * write_tasks)) for c in SINKS}
    ceiling = sum(buckets[d.name.split("=", 1)[1]] for d in class_dirs)
    assert len(files) <= ceiling, (len(files), ceiling)
    # and nowhere near the unshuffled tasks x sinks blow-up
    parallelism = spark.sparkContext.defaultParallelism
    assert len(files) < parallelism * len(class_dirs) / 2
    # each class directory stays within its bucket allocation
    for d in class_dirs:
        n = len(list(d.glob("*.parquet")))
        assert n <= buckets[d.name.split("=", 1)[1]], (d.name, n)


def test_group_lag_stream_matches_batch(spark, fixture_dir, stream_input, tmp_path):
    """Stream-static lag: the final emission per group-partition must equal
    the batch group_lag, across multiple out-of-order micro-batches."""
    from klog_spark.operators.group_offsets import group_lag
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing
    from klog_spark.streaming import group_lag_stream, read_sequence_stream

    batch_parsed = apply_validity_routing(
        parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    )
    log_end = (
        batch_parsed.filter((F.col("record_class") == "batch") & (F.col("segment_type") == "data"))
        .groupBy("topic", "partition")
        .agg((F.max("last_offset") + F.lit(1)).alias("log_end_offset"))
    )
    q = (
        group_lag_stream(read_sequence_stream(spark, stream_input, max_files_per_trigger=2), log_end)
        .writeStream.format("memory").queryName("gls_test").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_lag"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # compact the emissions per key by the carried segment order, drop keys
    # whose newest update is a tombstone — the documented consumer contract
    final = {}
    for r in spark.sql("select * from gls_test").collect():
        key = (r["group_id"], r["commit_topic"], r["commit_partition"])
        cand = (r["file"], r["line_no"], r["is_deletion"], r["lag"])
        if key not in final or (cand[0], cand[1]) > (final[key][0], final[key][1]):
            final[key] = cand
    got = {k: v[3] for k, v in final.items() if not v[2]}
    want = {
        (r["group_id"], r["commit_topic"], r["commit_partition"]): r["lag"]
        for r in group_lag(batch_parsed).collect()
    }
    assert got == want and got


def test_event_sessions_stream_matches_python_oracle(spark, tmp_path_factory):
    """Native session_window gap sessionization: sessions split across
    micro-batches must merge to exactly the batch/Python-oracle sessions
    (same 1800s boundary contract: delta == gap stays in-session), under a
    hostile non-UTC session timezone (the NTZ->TIMESTAMP conversion is
    pure epoch arithmetic, never the session TZ)."""
    from klog_spark.streaming import event_sessions_stream

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
            F.col("ts").isNotNull()
        )
        src = tmp_path_factory.mktemp("ev_stream")
        # several files, rows shuffled across them: sessions arrive split
        # and out of order over micro-batches
        ev.repartition(5).write.mode("overwrite").parquet(str(src))

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        # the shuffled files interleave a MONTH of event time across
        # micro-batches; the watermark must cover that disorder or the
        # late-drop filter discards old events (the operator's documented
        # replay contract)
        q = (
            event_sessions_stream(stream, watermark="60 days")
            .writeStream.format("memory").queryName("ev_sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
            for r in spark.sql("select * from ev_sessions").collect()
        }

        # sequential oracle over the same (null-free) events
        from test_events_property import _python_sessions

        events = [
            (r["event_id"],
             int(r["ts"].replace(tzinfo=__import__("datetime").timezone.utc)
                 .timestamp() * 1000),
             r["user_id"], r["event_type"], r["value"])
            for r in ev.collect()
        ]
        want = {
            (uid, lo, hi, n)
            for (uid, _sid), (n, lo, hi, _dur) in _python_sessions(events).items()
        }
        assert got == want and len(got) > 50
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_dedup_stream_matches_batch_distinct(spark, tmp_path_factory):
    """Streaming exact dedup: over any micro-batch split, exactly one row
    per distinct text survives, and the surviving digest set equals the
    batch distinct set. Duplicates planted across DIFFERENT files so the
    state must carry between micro-batches."""
    from klog_spark.streaming import dedup_stream

    src = tmp_path_factory.mktemp("dedup_stream")
    texts = [f"document body {i % 40}" for i in range(200)]  # 5x dup each
    df = spark.createDataFrame(
        [(i, texts[i]) for i in range(200)], "doc_id long, text string"
    )
    df.repartition(8).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("select * from dedup_out").collect()
    assert len(out) == 40
    assert {r["text"] for r in out} == set(texts)


def test_cms_cells_stream_matches_batch(spark, tmp_path_factory):
    """Streaming CMS: after consuming all micro-batches, the emitted cells
    equal the batch cms_build over the same rows — the engine's aggregation
    state is the sketch, bounded at depth x width per group."""
    from klog_spark.datapipe.sketch import cms_build
    from klog_spark.streaming import cms_cells_stream

    src = tmp_path_factory.mktemp("cms_stream")
    rows = [(f"g{i % 2}", f"v{i % 50}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v string")
    df.repartition(6).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    q = (
        cms_cells_stream(stream, "v", by=["g"], depth=4, width=32)
        .writeStream.format("memory").queryName("cms_cells")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r["g"], r["d"], r["bucket"]): r["cnt"]
           for r in spark.sql("select * from cms_cells").collect()}
    want = {(r["g"], r["d"], r["bucket"]): r["cnt"]
            for r in cms_build(df, "v", by=["g"], depth=4, width=32).collect()}
    assert got == want and len(got) <= 2 * 4 * 32


def test_dedup_stream_within_watermark(spark, tmp_path_factory):
    """The watermark-bounded dedup variant: duplicates arriving within the
    watermark window are dropped; the output carries exactly one row per
    distinct text when all dups are inside the window."""
    import datetime as dt

    from klog_spark.streaming import dedup_stream

    src = tmp_path_factory.mktemp("dedup_wm")
    base = dt.datetime(2024, 1, 1)
    rows = [(i, f"txt {i % 25}", base + dt.timedelta(seconds=i)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.repartition(4).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream, watermark_col="ts", watermark="1 hour")
        .writeStream.format("memory").queryName("dedup_wm_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("select * from dedup_wm_out").collect()
    assert len(out) == 25
    assert {r["text"] for r in out} == {f"txt {i}" for i in range(25)}


def test_shard_manifest_stream_matches_batch(spark, tmp_path_factory):
    """Streaming export-audit manifest: after consuming all micro-batches
    (out of any order), the emitted per-shard counts/chars/checksums equal
    the batch shard_manifest over the same documents — every manifest
    column is a commutative sum, so engine aggregation state is exact."""
    from klog_spark.datapipe.shard import deterministic_shuffle, shard_manifest
    from klog_spark.streaming import shard_manifest_stream

    src = tmp_path_factory.mktemp("shard_stream")
    rows = [(i, f"doc {i} body " + "w" * (i % 17)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(7).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    q = (
        shard_manifest_stream(stream, seed="s", n_shards=8, hash_fn="java32")
        .writeStream.format("memory").queryName("shard_manifest")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["shard_id"]: (r["n_docs"], r["n_chars"], r["content_checksum"])
           for r in spark.sql("select * from shard_manifest").collect()}
    want = {
        r["shard_id"]: (r["n_docs"], r["n_chars"], r["content_checksum"])
        for r in shard_manifest(
            deterministic_shuffle(df, seed="s", n_shards=8, hash_fn="java32"),
            hash_fn="java32",
        ).collect()
    }
    assert got == want and sum(n for n, _, _ in got.values()) == 500


def test_scored_filter_stream_matches_batch(spark, tmp_path_factory):
    """The pinned-model quality filter applied to a stream (stateless
    append projection) emits exactly the batch gate query's decision and
    micro-rounded margin for every document."""
    from klog_spark import entry_queries as eq
    from klog_spark.streaming import scored_filter_stream

    src = tmp_path_factory.mktemp("scored_stream")
    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    batch.repartition(5).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(str(src))
    )
    q = (
        scored_filter_stream(stream, eq.SCORED_FILTER_WEIGHTS,
                             eq.SCORED_FILTER_STATS)
        .writeStream.format("memory").queryName("scored_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: (r["kept"], r["margin_micro"])
           for r in spark.sql("select * from scored_stream").collect()}
    want = {r["doc_id"]: (r["kept"], r["margin_micro"])
            for r in eq.q_scored_quality_filter(
                spark, "/root/testdata/sf0.001").collect()}
    assert got == want and len(got) == batch.count()


def test_wordlist_filter_stream_matches_batch(spark, tmp_path_factory):
    """Stateless badwords screen: streaming decisions equal the batch
    operator row-for-row across micro-batches."""
    from klog_spark.datapipe.textstats import wordlist_filter
    from klog_spark.streaming import wordlist_filter_stream

    src = tmp_path_factory.mktemp("wordlist_stream")
    rows = [(i, ("bad " * (i % 4) + "fine words here").strip())
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(6).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        wordlist_filter_stream(stream, ["bad"], max_ppm=300_000)
        .writeStream.format("memory").queryName("wl_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: (r["n_words"], r["n_blocked"], r["keep"])
           for r in spark.sql("select * from wl_out").collect()}
    want = {r["doc_id"]: (r["n_words"], r["n_blocked"], r["keep"])
            for r in wordlist_filter(df, ["bad"], max_ppm=300_000).collect()}
    assert got == want


def test_block_dedup_stream_matches_batch_block_set(spark, tmp_path_factory):
    """Streaming block admission: exactly one row per distinct block
    survives across micro-batches, and the admitted block set equals the
    batch operator's kept set (duplicates planted across files so state
    must carry between triggers)."""
    from klog_spark.datapipe.dedup import dedup_paragraph_blocks
    from klog_spark.streaming import block_dedup_stream

    src = tmp_path_factory.mktemp("blk_stream")
    blocks = [f"b{j} w1 w2" for j in range(10)]           # 3-word blocks
    rows = [(i, f"{blocks[i % 10]} {blocks[(i + 1) % 10]}")
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(5).write.mode("overwrite").parquet(str(src))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        block_dedup_stream(stream, block_words=3)
        .writeStream.format("memory").queryName("blk_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("select * from blk_out").collect()
    assert len(out) == len({r["block_text"] for r in out})  # one per block
    batch = dedup_paragraph_blocks(df, block_words=3)
    batch_blocks = set()
    for r in batch.collect():
        if r["kept_text"]:
            ws = r["kept_text"].split()
            batch_blocks |= {" ".join(ws[i:i + 3]) for i in range(0, len(ws), 3)}
    assert {r["block_text"] for r in out} == batch_blocks


def test_dsir_score_stream_matches_batch_weights(spark, tmp_path_factory):
    """Stateless pinned-ratio DSIR scoring: streaming weight_micro equals
    the batch operator's weights row-for-row when the stream's ratio table
    is the one the batch trainer fitted on the same corpus."""
    from klog_spark.datapipe.mixture import dsir_importance_sample
    from klog_spark.streaming import dsir_score_stream

    src = tmp_path_factory.mktemp("dsir_stream")
    rows = [(i, f"aa bb w{i % 7} cc w{(i + 2) % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(4).write.mode("overwrite").parquet(str(src))

    target = spark.createDataFrame([(99, "aa bb aa cc")],
                                   "doc_id long, text string")
    batch = dsir_importance_sample(df, target, k=5)
    want = {r["doc_id"]: (r["n_words"], r["weight_micro"])
            for r in batch.collect()}

    # fit the ratio table exactly as the batch operator does, then pin it
    import math
    words = [w for _, t in rows for w in t.split()]
    twords = "aa bb aa cc".split()
    c_raw, c_tgt = {}, {}
    for w in words:
        c_raw[w] = c_raw.get(w, 0) + 1
    for w in twords:
        c_tgt[w] = c_tgt.get(w, 0) + 1
    vocab = len(set(c_raw) | set(c_tgt))
    ratio = {w: round((math.log((c_tgt.get(w, 0) + 1) / (len(twords) + vocab))
                       - math.log((c + 1) / (len(words) + vocab))) * 1e6)
             for w, c in c_raw.items()}

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        dsir_score_stream(stream, ratio)
        .writeStream.format("memory").queryName("dsir_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: (r["n_words"], r["weight_micro"])
           for r in spark.sql("select * from dsir_out").collect()}
    assert got == want


def test_novelty_screen_stream_matches_batch(spark, tmp_path_factory):
    """Stateless packed-Bloom novelty screen: streaming (append, no
    watermark, maxFilesPerTrigger=1) emits exactly the batch operator's
    (n_shingles, n_novel, novelty_ppm) per row across micro-batches."""
    from klog_spark.datapipe.dedup import (
        bloom_pack, ngram_novelty_packed, shingle_bloom_bits,
    )
    from klog_spark.streaming import novelty_screen_stream

    ref = spark.createDataFrame(
        [(i, f"reference doc {i} alpha beta {i} gamma") for i in range(50)],
        "doc_id long, text string")
    rows = [(100 + i, f"reference doc {i} alpha beta {i} gamma")
            for i in range(0, 50, 6)]
    rows += [(900 + i, f"fresh stream text {i} zz qq ww") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = tmp_path_factory.mktemp("novelty_stream")
    df.repartition(5).write.mode("overwrite").parquet(str(src))

    m, k = 1 << 18, 3
    bitmap = bloom_pack(shingle_bloom_bits(ref, m=m, k=k, n=3), m=m)
    want = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
            for r in ngram_novelty_packed(df, bitmap, m=m, k=k, n=3).collect()}

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        novelty_screen_stream(stream, bitmap, m=m, k=k, n=3)
        .writeStream.format("memory").queryName("nv_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
           for r in spark.sql("SELECT * FROM nv_out").collect()}
    assert got == want and len(got) == len(rows)
    # planted republications are 0-novel even through the stream
    assert all(got[100 + i][2] == 0 for i in range(0, 50, 6))
