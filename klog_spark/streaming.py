"""Structured Streaming variant of the pipeline.

The reference is strictly batch (files in, stdout out — SURVEY.md §2.8);
this module is the engine's forward-looking streaming surface: the same
tokenized-sequence schema consumed as a file stream, the same vectorized
parse (mapInArrow is stateless, so it composes with streaming), routed to
per-class parquet sinks with exactly-once file-source checkpointing, plus a
watermarked event-time aggregate (committed/aborted markers per time
window) — the streaming analogue of txn-stat's A1 tallies.

Window-based sessionization (A5-A7) is NOT offered on streams: klog's
open/empty-transaction semantics are inherently order-of-arrival and the
batch pipeline (checkpoint.run_incremental) is the correct way to get them
incrementally; pretending otherwise would silently change results.

The same boundary applies to READ_COMMITTED group offsets
(group_offsets.read_committed_group_offsets): visibility of a
transactional commit depends on its parent batch line and a later control
marker — cross-line, cross-file context that a row-sharded stream cannot
attribute exactly (micro-batches split dump files across arbitrary row
boundaries). ``latest_group_offsets_stream`` below is therefore
explicitly the READ_UNCOMMITTED view; for exact read-committed results
incrementally, run checkpoint.run_incremental (whole-file granules,
per-file lineage) and query the staged table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.parse import parse_sequences
from .operators.route import apply_validity_routing
from .schemas import INPUT_SCHEMA


def read_sequence_stream(spark: SparkSession, input_dir: str,
                         max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def routed_stream(stream: DataFrame) -> DataFrame:
    """Vectorized parse + validity routing on a stream (stateless)."""
    return apply_validity_routing(parse_sequences(stream))


def start_routed_sink(stream: DataFrame, out_dir: str, checkpoint_dir: str,
                      trigger_available_now: bool = True,
                      write_tasks: int | None = None,
                      pre_shuffle: bool | None = None):
    """Write the routed stream to per-class partition directories with
    exactly-once checkpointing (the streaming face of route.write_routed).

    The stream goes through the SAME weighted (record_class, bucket)
    pre-shuffle as the batch write (route.prepare_routed_write — a stateless
    shuffle, so it composes with streaming): without it every micro-batch
    task keeps one open parquet writer per sink class and the sink
    reintroduces tasks x sinks small files at scale (VERDICT r3 #5). File
    count is ~write_tasks per micro-batch."""
    from .operators.route import prepare_routed_write

    writer = (
        prepare_routed_write(routed_stream(stream), write_tasks, pre_shuffle)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("record_class")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def marker_counts_stream(stream: DataFrame, window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Watermarked event-time tally of COMMIT/ABORT markers (A1 as a
    streaming aggregate): control-message rows, event time = the message
    CreateTime, late data bounded by the watermark."""
    parsed = routed_stream(stream)
    ctl = parsed.filter(F.col("record_class") == "control_msg").withColumn(
        "event_time", F.timestamp_millis(F.col("msg_create_time_ms"))
    )
    return (
        ctl.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"))
        .agg(
            F.sum(F.when(F.col("commit"), 1).otherwise(0)).alias("num_committed"),
            F.sum(F.when(~F.col("commit"), 1).otherwise(0)).alias("num_aborted"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "num_committed", "num_aborted",
        )
    )


def start_marker_counts_sink(stream: DataFrame, checkpoint_dir: str,
                             query_name: str = "klog_marker_counts"):
    """Run the marker tally into an in-memory sink (tests / dashboards)."""
    return (
        marker_counts_stream(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def session_marker_totals_stream(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    COMMIT/ABORT totals per dump file, carried across micro-batches.

    Marker tallies are commutative, so incremental streaming state is exact
    (unlike the order-dependent open/empty-txn fold, which stays batch-only).
    State per file: two counters; each micro-batch emits the updated totals.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ctl = routed_stream(stream).filter(F.col("record_class") == "control_msg").select(
        "file", "commit"
    )

    out_schema = StructType(
        [
            StructField("file", StringType()),
            StructField("num_committed", LongType()),
            StructField("num_aborted", LongType()),
        ]
    )
    state_schema = StructType([StructField("c", LongType()), StructField("a", LongType())])

    def update(key, pdfs, state: GroupState):
        c, a = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            commits = pdf["commit"].fillna(False).astype(bool)
            c += int(commits.sum())
            a += int((~commits).sum())
        state.update((c, a))
        yield pd.DataFrame({"file": [key[0]], "num_committed": [c], "num_aborted": [a]})

    return ctl.groupBy("file").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def latest_group_offsets_stream(stream: DataFrame) -> DataFrame:
    """Stateful streaming compaction of __consumer_offsets commits — the
    live lag-monitor feed (batch twin: operators/group_offsets.py).

    State per (group, topic, partition) is the newest offset-commit seen so
    far, where "newest" is the segment order key (file, line_no) carried IN
    the state: a micro-batch that happens to deliver older files late can
    never overwrite newer state, so the stream converges to exactly the
    batch compaction result regardless of file arrival order. Tombstones
    update state like any record (``is_deletion`` true) — downstream drops
    them, mirroring Kafka's compaction. State per key is one tiny tuple; key
    cardinality = live group-partitions, not commit volume.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField, StructType,
    )

    oc = routed_stream(stream).filter(F.col("record_class") == "offset_commit").select(
        "group_id", "commit_topic", "commit_partition",
        "file", "line_no", "committed_offset", "is_deletion",
    )
    out_schema = StructType(
        [
            StructField("group_id", StringType()),
            StructField("commit_topic", StringType()),
            StructField("commit_partition", IntegerType()),
            StructField("file", StringType()),
            StructField("line_no", IntegerType()),
            StructField("committed_offset", LongType()),
            StructField("is_deletion", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("file", StringType()),
            StructField("line_no", IntegerType()),
            StructField("committed_offset", LongType()),
            StructField("is_deletion", BooleanType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        cur = state.get if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            last = pdf.sort_values(["file", "line_no"]).iloc[-1]
            cand = (
                str(last["file"]), int(last["line_no"]),
                None if pd.isna(last["committed_offset"]) else int(last["committed_offset"]),
                bool(last["is_deletion"]),
            )
            if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
                cur = cand
        state.update(cur)
        yield pd.DataFrame(
            {
                "group_id": [key[0]],
                "commit_topic": [key[1]],
                "commit_partition": [key[2]],
                "file": [cur[0]],
                "line_no": [cur[1]],
                "committed_offset": [cur[2]],
                "is_deletion": [cur[3]],
            }
        )

    return oc.groupBy("group_id", "commit_topic", "commit_partition").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def group_lag_stream(stream: DataFrame, log_end: DataFrame) -> DataFrame:
    """Live consumer-lag monitor: the stateful offset compaction
    (latest_group_offsets_stream) stream-static joined against a log-end
    table — every micro-batch emits refreshed lag for the group-partitions
    it touched. ``log_end`` is the tiny (topic, partition, log_end_offset)
    dimension (from the batch pipeline or a metadata service); Spark
    broadcasts it into each micro-batch.

    Tombstone updates ARE emitted (``is_deletion`` true, null lag): a
    monitor that never hears about deletions would keep showing the stale
    pre-tombstone lag forever. Consumers keep the newest row per key by
    the carried (file, line_no) order and drop deleted keys."""
    latest = latest_group_offsets_stream(stream)
    joined = latest.join(
        F.broadcast(log_end),
        (latest["commit_topic"] == log_end["topic"])
        & (latest["commit_partition"] == log_end["partition"]),
    )
    return joined.select(
        "group_id", "commit_topic", "commit_partition", "file", "line_no",
        "is_deletion", "committed_offset", "log_end_offset",
        F.when(
            ~F.col("is_deletion"), F.col("log_end_offset") - F.col("committed_offset")
        ).alias("lag"),
    )


def event_sessions_stream(events: DataFrame, gap_ms: int = 1800 * 1000,
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked event-time gap sessionization of the telemetry events
    stream — the streaming twin of entry_queries.q_event_sessions, built on
    Spark's native ``session_window`` (merging session state handled by the
    engine, late data bounded by the watermark; sessions spanning
    micro-batches merge exactly).

    This is NOT the klog txn sessionization the module docstring rules out
    for streams: gap sessions are a pure event-time construction with no
    order-of-arrival semantics, so the streaming answer is well-defined.

    Boundary pin (the same 1800s contract the batch query and the Python
    oracle enforce): a gap of EXACTLY ``gap_ms`` stays in-session;
    ``session_window`` merges events strictly inside ``window_end = last +
    gap``, so the window gap is ``gap_ms + 1`` ms. Events with null
    timestamps have no event time and are dropped (the batch query instead
    attaches them to the running session — documented divergence, nulls
    cannot be watermarked).

    Output per closed session: user_id, session_start_ms, session_end_ms,
    n_events, duration_ms (no session_id — streaming sessions have no
    stable ordinal; identity is (user_id, session_start_ms)).

    ``watermark`` is the max event-time DISORDER tolerated: input older
    than (max seen event time - watermark) is dropped by the engine's
    late-row filter before it can merge. For live telemetry a couple of
    hours is right; for a historical REPLAY (availableNow over files with
    arbitrary arrival order) pass a watermark covering the full replayed
    span, or sessions fragment silently.
    """
    # Watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE for
    # NTZ), but a plain cast would consult the session timezone. The
    # TZ-independent route is pure epoch arithmetic in both directions:
    # NTZ -> ms via timestamp_diff against an NTZ epoch literal (wall-clock
    # subtraction), ms -> TIMESTAMP via timestamp_millis (absolute instant),
    # and back out with unix_millis. No step reads the session timezone.
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    ev = events.filter(F.col("ts").isNotNull()).withColumn(
        "event_time",
        F.timestamp_millis(F.timestamp_diff("MILLISECOND", epoch_ntz, F.col("ts"))),
    )
    ms = lambda c: F.unix_millis(F.col(c))  # noqa: E731
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(
            F.col("user_id"),
            F.session_window("event_time", f"{gap_ms + 1} milliseconds").alias("sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_time").alias("first_event"),
            F.max("event_time").alias("last_event"),
        )
        .select(
            "user_id",
            ms("first_event").alias("session_start_ms"),
            ms("last_event").alias("session_end_ms"),
            "n_events",
            (ms("last_event") - ms("first_event")).alias("duration_ms"),
        )
    )


def dedup_stream(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 watermark_col: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication: keep the FIRST-ARRIVED row per
    content digest (sha256 of the text — 32 B of state per distinct doc,
    the same digest key the batch dedup family shuffles on).

    Backed by ``dropDuplicates`` streaming state. Without a watermark
    column the state is the full distinct-digest set (exact forever, state
    grows with distinct content — the batch-ingest screen
    ``dedup.incremental_exact_dups`` is the right tool once that set
    outgrows executor memory). With ``watermark_col`` the digest set is
    evicted past the watermark: exact within the window, the standard
    bounded-state trade.
    """
    hashed = docs.withColumn("_digest", F.sha2(F.col(text_col), 256))
    if watermark_col is None:
        return hashed.dropDuplicates(["_digest"]).drop("_digest")
    return (
        hashed.withWatermark(watermark_col, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def cms_cells_stream(stream: DataFrame, value_col: str,
                     by: list[str] | None = None,
                     depth: int = 4, width: int = 256) -> DataFrame:
    """Live Count-Min sketch over a stream: the sketch's cells ARE a
    streaming aggregation (``groupBy(by, d, bucket).count()`` in update
    mode), so the engine's aggregation state IS the sketch — bounded at
    depth x width counters per group by construction, no custom state
    handler needed. After any prefix of the stream the emitted cells equal
    ``sketch.cms_build`` over the same rows (pytest-pinned), and
    ``sketch.cms_estimate`` answers point queries against the latest
    snapshot. The natural shape for a live heavy-hitters / hot-key monitor
    on an unbounded stream, where an exact per-key count would grow state
    with key cardinality."""
    from .datapipe.sketch import _cms_cells

    by = by or []
    cells = stream.select(*by, _cms_cells(value_col, depth, width))
    return cells.groupBy(
        *by, F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count("*").cast("long").alias("cnt"))


def shard_manifest_stream(docs: DataFrame, seed: str, n_shards: int,
                          text_col: str = "text", id_col: str = "doc_id",
                          hash_fn: str = "xxhash64") -> DataFrame:
    """Live export-audit manifest (streaming twin of
    ``datapipe.shard.shard_manifest``): as documents stream toward the
    sharded export, per-shard doc counts, char totals and the
    order-independent content checksum accumulate in plain engine
    aggregation state (update mode). Exact after ANY prefix of the stream
    because every manifest column is a commutative count/sum — the property
    the batch manifest was designed around (contrast the order-dependent
    open/empty-txn fold, which stays batch-only). ``position`` is
    deliberately absent: within-shard positions are assigned by the batch
    write itself (a per-shard sort), not meaningful mid-stream.

    State: ``n_shards`` rows of three counters — bounded by construction.
    The checksum accumulates raw u32 sums in the state and applies the
    final mod at emission, exact while a shard holds < 2^31 documents
    (the batch module's bound)."""
    from .datapipe.shard import U32, _shuffle_hash

    if hash_fn == "xxhash64":
        content_h = F.pmod(F.xxhash64(F.col(text_col)), F.lit(U32))
    elif hash_fn == "java32":
        from .javahash import java_hash_u32_expr

        content_h = java_hash_u32_expr(F.col(text_col))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    keyed = docs.select(
        F.pmod(_shuffle_hash(seed, id_col, hash_fn), F.lit(n_shards))
        .cast("int").alias("shard_id"),
        F.length(text_col).cast("long").alias("_len"),
        content_h.alias("_ch"),
    )
    return (
        keyed.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_len").cast("long").alias("n_chars"),
            F.sum("_ch").alias("_ch_sum"),
        )
        .select(
            "shard_id", "n_docs", "n_chars",
            F.pmod(F.col("_ch_sum"), F.lit(U32)).cast("long")
            .alias("content_checksum"),
        )
    )


def scored_filter_stream(docs: DataFrame, weights: list[float],
                         stats: dict[str, tuple[float, float]],
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of the pinned scored quality filter
    (entry_queries.q_scored_quality_filter): apply a FITTED logreg model to
    documents as they arrive. Stateless — the margin is a pure per-row
    column fold over the same z-scored features as the batch query, so the
    stream needs no aggregation state, no watermark, and emits in append
    mode with exactly the batch decision for every row (pytest-asserted).
    This is the shape a 100-TB ingest filter runs as: train offline, pin
    the model, score the firehose."""
    from .datapipe.textstats import quality_scores

    q = quality_scores(docs, text_col=text_col, id_col=id_col)
    feats = {
        "f_stop": F.col("stopword_ratio"),
        "f_punct": F.col("punct_ratio"),
        "f_len": F.round(F.log1p(F.col("n_words")) / 10.0, 6),
    }
    margin = F.lit(float(weights[0]))
    for w, (name, col) in zip(weights[1:], feats.items()):
        m, s = stats[name]
        margin = margin + F.lit(float(w)) * ((col - F.lit(float(m))) / F.lit(float(s)))
    return q.select(
        "doc_id",
        (margin >= 0).alias("kept"),
        F.round(margin * 1000000).cast("long").alias("margin_micro"),
    )


def wordlist_filter_stream(docs: DataFrame, blocklist: list[str],
                           max_ppm: int = 100_000, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of the blocked-wordlist filter
    (textstats.wordlist_filter, 'expr' path): the blocklist probe and the
    integer ppm accept test are pure per-row column expressions, so the
    stream is stateless, needs no watermark, and emits in append mode with
    exactly the batch decision for every row (pytest-asserted) — the
    ingest-side badwords screen of a firehose pipeline."""
    from .datapipe.textstats import wordlist_filter

    return wordlist_filter(docs, blocklist, max_ppm=max_ppm,
                           text_col=text_col, id_col=id_col, method="expr")


def block_dedup_stream(docs: DataFrame, block_words: int = 16,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Streaming paragraph-block admission — the ingest face of
    ``dedup.dedup_paragraph_blocks``: documents explode into disjoint
    ``block_words``-word blocks (same normalization as the batch operator)
    and ``dropDuplicates`` state admits only the FIRST-ARRIVED copy of
    each distinct block. Emits (doc_id, block_idx, block_text) of admitted
    blocks in append mode; which occurrence wins depends on arrival order
    (the batch operator pins min (doc_id, block_idx) instead), but the
    admitted DISTINCT BLOCK SET is identical to batch for the same input
    (pytest-asserted). State is one row per distinct block — the same
    trade, and the same remedy past memory (periodic batch re-dedup), as
    ``dedup_stream``. Document reassembly stays a downstream batch step
    (``foreachBatch``): it needs all of a doc's blocks, which an unbounded
    stream cannot close over.
    """
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    blk = (
        base.filter(F.size("_w") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(F.size("_w") / F.lit(block_words)).cast("int") - 1,
                    ),
                    lambda i: F.array_join(
                        F.slice("_w", i * block_words + 1, block_words), " "
                    ),
                )
            ).alias("block_idx", "block_text"),
        )
    )
    return blk.dropDuplicates(["block_text"])


def dsir_score_stream(docs: DataFrame, ratio_micro: dict[str, int],
                      default_micro: int = 0, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of the DSIR weighting step
    (mixture.dsir_importance_sample): apply a TRAINED importance-ratio
    table — word -> integer micro-nat log(p_target/p_raw), fitted offline
    exactly like the pinned quality model — to documents as they arrive.
    The fold is a pure per-row JVM aggregate over a literal map (broadcast
    the table past literal sizes), so the stream is stateless, needs no
    watermark, and emits (doc_id, n_words, weight_micro) in append mode
    with exactly the batch weights for every row (pytest-asserted).
    ``default_micro`` scores out-of-vocabulary words (a word unseen when
    the table was fitted); selection (Gumbel-top-k) stays a batch/
    micro-batch step — a global top-k has no streaming-append analogue.
    """
    pairs: list = []
    for w in sorted(ratio_micro):
        pairs.extend([F.lit(w), F.lit(int(ratio_micro[w])).cast("long")])
    lut = F.create_map(*pairs) if pairs else F.create_map()
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.coalesce(lut[w], F.lit(int(default_micro)).cast("long")),
        ).alias("weight_micro"),
    )


def novelty_screen_stream(docs: DataFrame, bitmap, m: int, k: int, n: int = 3,
                          text_col: str = "text", id_col: str = "doc_id",
                          hash_fn: str = "java32") -> DataFrame:
    """Streaming novelty screen — the ingest face of
    ``dedup.ngram_novelty_packed``: the reference corpus's shingle Bloom
    bitmap broadcasts once and every arriving document scores its
    (n_shingles, n_novel, novelty_ppm) inside one stateless Arrow kernel —
    no join, no state, no watermark; append mode emits exactly the batch
    decision per row (pytest-asserted). The shape for 'only ingest
    documents novel vs the existing 100-TB corpus' admission control."""
    from .datapipe.dedup import ngram_novelty_packed

    return ngram_novelty_packed(docs, bitmap, m=m, k=k, n=n,
                                text_col=text_col, id_col=id_col,
                                hash_fn=hash_fn)
