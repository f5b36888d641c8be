"""Dump-text file source + the klog-compatible CLI.

Reconstructs real dump-text files from the fixture's text rendition, then
demands (a) the file source reproduces the tokenized table exactly and
(b) the CLI commands produce the same results as the DataFrame API.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dump_dir(fixture_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("dumps")
    rows = duckdb.sql(
        f"""SELECT regexp_extract(doc_id, '^(.*):([0-9]+)$', 1) AS file,
                   CAST(regexp_extract(doc_id, '^(.*):([0-9]+)$', 2) AS INT) AS line_no,
                   line
            FROM read_parquet('{fixture_dir}/sequences_text.parquet')
            ORDER BY file, line_no"""
    ).fetchall()
    files: dict[str, list[str]] = {}
    for fname, _ln, line in rows:
        files.setdefault(fname, []).append(line)
    for fname, lines in files.items():
        (out / fname).write_text("\n".join(lines) + "\n")
    return str(out)


def test_dump_file_source_reproduces_tokenized_table(spark, fixture_dir, dump_dir):
    from klog_spark.sources.dump_files import read_dump_files

    got = read_dump_files(spark, f"{dump_dir}/*.dump.txt")
    want = spark.read.parquet(f"{fixture_dir}/sequences.parquet")
    # token-array equality per doc_id — the per-row invariant of the whole
    # engine, now holding across the text->tokens bridge
    diff = (
        got.select("doc_id", F.col("tokens").alias("t1"), "source")
        .join(want.select("doc_id", F.col("tokens").alias("t2"),
                          F.col("source").alias("s2")), "doc_id", "full")
        .filter((F.col("t1") != F.col("t2")) | F.col("t1").isNull() | F.col("t2").isNull()
                | (F.col("source") != F.col("s2")))
    )
    assert diff.count() == 0
    assert got.count() == want.count()


def test_txn_stats_parity_from_dump_files(spark, fixture_dir, dump_dir):
    from klog_spark.operators.aggregates import txn_stats
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sources.dump_files import read_dump_files

    via_files = txn_stats(parse_sequences(read_dump_files(spark, dump_dir + "/*.dump.txt"))).collect()[0]
    via_parquet = txn_stats(
        parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    ).collect()[0]
    assert via_files.asDict() == via_parquet.asDict()


def test_cli_commands(spark, dump_dir, capsys, tmp_path):
    from klog_spark.__main__ import main

    # txn-stat over the DATA dumps (TxnStat.java:70-81 rejects internal
    # topics and multi-topic input — asserted in test_cli_txn_stat_contract)
    assert main(["segment", "txn-stat", dump_dir + "/payments-*.log.dump.txt"],
                spark=spark) == 0
    out = capsys.readouterr().out
    assert "num_committed:" in out
    assert "txn_size_stats: IntSummaryStatistics{count=" in out
    assert "empty_txn:" in out and "open_txn:" in out
    # detail lines are the reference's record toStrings (TxnStat.java:106-127)
    assert "EmptyTransaction[closingBatch=Batch(baseOffset=" in out
    assert ", controlMessage=ControlMessage(offset=" in out
    import re as _re
    assert _re.search(
        r"open_txn:.* ProducerSession\[producerId=\d+, producerEpoch=\d+\]->"
        r"FirstBatchInTxn\[firstBatchInTxn=Batch\(baseOffset=.*, "
        r"numDataBatches=\d+\]", out)
    # --line-numbers prepends the control-message / first-batch line number
    assert main(["segment", "txn-stat", dump_dir + "/payments-*.log.dump.txt",
                 "--line-numbers"], spark=spark) == 0
    out_ln = capsys.readouterr().out
    assert _re.search(r"empty_txn:.*\d+: EmptyTransaction\[", out_ln)

    # filtered cat: only pid-1 batches and their records, uncolored.
    # Scoped to the DATA dumps: on __transaction_state dumps --pid matches
    # nested state-change messages and prints producerId=-1 batch headers
    # (BatchPredicate.java:33-38) — covered by test_cli_cat_txn_state_pid.
    assert main(["segment", "cat", dump_dir + "/payments-*.log.dump.txt",
                 "--pid", "1", "--no-color"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "producerId=1," in out
    assert "producerId=-1" not in out

    # group analytics incl. read-committed view
    assert main(["group", "offsets", dump_dir, "--read-committed"], spark=spark) == 0
    out = capsys.readouterr().out
    assert "group_id=" in out and "committed_offset=" in out

    # snapshot abort-cmd formatting
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sources.dump_files import read_dump_files

    parsed = parse_sequences(read_dump_files(spark, dump_dir + "/*.dump.txt"))
    snap = parsed.filter(F.col("record_class") == "producer_state").first()
    assert main(["snapshot", "abort-cmd", dump_dir, "--pid", str(snap["producer_id"]),
                 "--producer-epoch", str(snap["producer_epoch"])], spark=spark) == 0
    out = capsys.readouterr().out
    assert "kafka-transactions.sh" in out and f"--producer-id {snap['producer_id']}" in out

    # route fan-out writes the partitioned staging
    dest = str(tmp_path / "routed_cli")
    assert main(["route", dump_dir, "--out", dest], spark=spark) == 0
    out = capsys.readouterr().out
    assert "record_class=batch" in out and "routed staging written" in out


def test_sql_view_surface(spark, fixture_dir):
    """register_views publishes the engine for pure-SQL use: analytic views
    match the API, base views compose in joins, plans stay pruned."""
    from klog_spark.operators.aggregates import txn_stats
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sql import register_views

    names = register_views(spark, f"{fixture_dir}/sequences.parquet", prefix="t1")
    assert "t1_txn_stats" in names and "t1_group_lag" in names

    got = spark.sql("SELECT * FROM t1_txn_stats").collect()[0]
    want = txn_stats(parse_sequences(
        spark.read.parquet(f"{fixture_dir}/sequences.parquet"))).collect()[0]
    assert got.asDict() == want.asDict()

    # cross-view SQL join: lag vs latest metadata per group
    joined = spark.sql("""
        SELECT l.group_id, l.lag, m.generation
        FROM t1_group_lag l JOIN t1_group_metadata_latest m USING (group_id)
    """).collect()
    assert joined and all(r["generation"] >= 1 for r in joined)

    # the batches view carries only the batch projection
    cols = set(spark.sql("SELECT * FROM t1_batches LIMIT 1").columns)
    assert "base_offset" in cols and "committed_offset" not in cols


def test_sql_corpus_view_surface(spark):
    """register_corpus_views publishes the curation surface for pure-SQL
    use: scoring views match the API, and a realistic curation query (keep
    quality-passing, PII-clean, non-duplicate docs) composes across views."""
    from klog_spark.datapipe.textstats import unigram_lm_scores
    from klog_spark.sql import register_corpus_views

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    names = register_corpus_views(spark, docs, prefix="c1")
    assert "c1_lm_scores" in names and "c1_bpe_pairs" in names

    got = {r["doc_id"]: r["avg_nll"]
           for r in spark.sql("SELECT doc_id, avg_nll FROM c1_lm_scores").collect()}
    want = {r["doc_id"]: r["avg_nll"] for r in unigram_lm_scores(docs).collect()}
    assert got == want

    kept = spark.sql("""
        SELECT q.doc_id
        FROM c1_quality q
        JOIN c1_pii p USING (doc_id)
        LEFT JOIN c1_exact_dups d ON q.doc_id = d.doc_id AND q.doc_id <> d.keep_doc_id
        WHERE q.passes_quality AND NOT p.had_pii AND d.doc_id IS NULL
    """).count()
    assert 0 < kept <= docs.count()

    # round-8 views: the curriculum manifest is queryable (one pos=1 row per
    # non-empty (bucket, shard)); dup_matrix registers when source exists
    assert "c1_curriculum" in names and "c1_dup_matrix" in names
    heads = spark.sql(
        "SELECT bucket, shard, COUNT(*) n FROM c1_curriculum WHERE pos = 1 "
        "GROUP BY bucket, shard"
    ).collect()
    assert heads and all(r["n"] == 1 for r in heads)


def test_cli_corpus_round8_commands(spark, capsys, tmp_path):
    """Round-8 corpus CLI faces: novelty matches the library on a planted
    republication; dup-matrix prints the mirror counts; order writes a
    manifest identical to the gated curriculum query."""
    from klog_spark import entry_queries as eq
    from klog_spark.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"

    # novelty: reference = the corpus itself -> every doc is 0-novel
    ndest = str(tmp_path / "novelty")
    assert main(["corpus", "novelty", docs, "--reference", docs,
                 "--out", ndest], spark=spark) == 0
    nov = spark.read.parquet(ndest)
    assert nov.filter(F.col("novelty_ppm") != 0).count() == 0

    # dup-matrix over a two-source mirror corpus
    rows = [(1, "same text here", "web"), (2, "same text here", "wiki"),
            (3, "unique content", "web")]
    mpath = str(tmp_path / "mirror")
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .write.parquet(mpath)
    assert main(["corpus", "dup-matrix", mpath], spark=spark) == 0
    assert "web" in capsys.readouterr().out

    # order: CLI face == gated curriculum query row-exact
    odest = str(tmp_path / "manifest")
    # leading-minus values must use the --flag=value form (argparse)
    tvals = ",".join(str(t) for t in eq.CURRICULUM_THRESHOLDS)
    assert main(["corpus", "order", docs, "--out", odest,
                 f"--thresholds={tvals}"], spark=spark) == 0
    got = {tuple(r) for r in spark.read.parquet(odest).collect()}
    want = {tuple(r)
            for r in eq.q_curriculum_order(spark, "/root/testdata/sf0.001").collect()}
    assert got == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# arbitrary unicode lines (no newlines/surrogates), including empty ones
line_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(line_st, min_size=1, max_size=20))
def test_dump_source_tokenizes_arbitrary_text(spark, tmp_path_factory, lines):
    """Property: for ANY text content, the file source's token arrays are
    exactly the per-line code points — the bridge never mangles unicode,
    empty lines, or the trailing newline."""
    from klog_spark.sources.dump_files import read_dump_files

    d = tmp_path_factory.mktemp("prop_dumps")
    (d / "x.log.dump.txt").write_text("\n".join(lines) + "\n", encoding="utf-8")
    got = {r["doc_id"]: list(r["tokens"])
           for r in read_dump_files(spark, str(d) + "/*.dump.txt").collect()}
    want = {f"x.log.dump.txt:{i + 1}": [ord(c) for c in ln]
            for i, ln in enumerate(lines)}
    assert got == want


def test_cli_cat_transactional_id(spark, dump_dir, capsys):
    """--transactional-id selects whole BATCHES of a __transaction_state
    dump: the batch header and ALL sibling records of any batch containing
    a TransactionStateMessage with the id (Cat.java:81-88), and the flag is
    rejected for non-TRANSACTION_STATE input (Cat.java:78-80)."""
    from klog_spark.__main__ import main
    from klog_spark.operators.aggregates import attach_parent_batch
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sources.dump_files import read_dump_files

    txn_glob = dump_dir + "/__transaction_state-*.log.dump.txt"
    parsed = parse_sequences(read_dump_files(spark, txn_glob))
    txn_id = parsed.filter(F.col("transactional_id").isNotNull()).first()["transactional_id"]
    assert main(["segment", "cat", txn_glob, "--transactional-id", txn_id,
                 "--no-color"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    # expected: every line of every batch with a matching message
    wp = attach_parent_batch(parsed).withColumn(
        "_bl", F.when(F.col("record_class") == "batch", F.col("line_no"))
                .otherwise(F.col("parent.line_no")))
    hit_batches = {
        (r["file"], r["_bl"]) for r in wp.filter(
            F.col("record_class").isin("txn_state", "txn_deletion")
            & (F.col("transactional_id") == txn_id)).select("file", "_bl").collect()
    }
    renderable = ["batch", "control_msg", "data_msg", "txn_state", "txn_deletion"]
    want = wp.filter(
        F.col("_bl").isNotNull() & F.col("record_class").isin(renderable)
    ).rdd.filter(lambda r: (r["file"], r["_bl"]) in hit_batches).count()
    assert len(out) == want and want > 0
    assert any(ln.startswith("Batch(") for ln in out)          # headers print
    assert any("TransactionState" in ln for ln in out)         # with records


def test_cli_txn_stat_contract(spark, dump_dir, capsys):
    """TxnStat.java's full contract: internal-topic dumps are rejected
    (:72-75), BatchPredicate filters narrow the batch stream before the
    collector (:85-89), and the stats lines carry Java's
    IntSummaryStatistics formatting (:96-97)."""
    import pytest as _pytest

    from klog_spark.__main__ import main

    with _pytest.raises(SystemExit, match="do not contain transactional"):
        main(["segment", "txn-stat",
              dump_dir + "/__transaction_state-*.log.dump.txt"], spark=spark)

    pay = dump_dir + "/payments-*.log.dump.txt"
    assert main(["segment", "txn-stat", pay], spark=spark) == 0
    full = capsys.readouterr().out

    def n_committed(text):
        return int(next(ln for ln in text.splitlines()
                        if ln.startswith("num_committed:")).split(":")[1])

    # a pid filter must shrink (not just reproduce) the aggregate
    assert main(["segment", "txn-stat", pay, "--pid", "1"], spark=spark) == 0
    filtered = capsys.readouterr().out
    assert 0 < n_committed(filtered) < n_committed(full)
    # average prints with Java's %f default (6 decimals)
    stats_line = next(ln for ln in full.splitlines()
                      if ln.startswith("txn_size_stats:"))
    assert ", average=" in stats_line and stats_line.rstrip().endswith("}")


def test_cli_cat_transactional_id_rejects_non_txn_input(spark, dump_dir):
    """Cat.java:78-80: the flag on a mixed/non-TS input must error."""
    import pytest as _pytest

    from klog_spark.__main__ import main

    with _pytest.raises(SystemExit):
        main(["segment", "cat", dump_dir + "/payments-0-00000000000000000000.log.dump.txt",
              "--transactional-id", "whatever"], spark=spark)


def test_cli_cat_txn_state_pid(spark, dump_dir, capsys):
    """On __transaction_state dumps --pid/--producer-epoch match the NESTED
    TransactionStateChange pid/epoch (BatchPredicate.java:33-45); txn-state
    batch headers all carry producerId -1, so header comparison would print
    nothing. A selected batch prints whole (header + all records)."""
    from klog_spark.__main__ import main
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sources.dump_files import read_dump_files

    txn_glob = dump_dir + "/__transaction_state-*.log.dump.txt"
    parsed = parse_sequences(read_dump_files(spark, txn_glob))
    pick = parsed.filter(F.col("txn_producer_id").isNotNull()).first()
    pid = int(pick["txn_producer_id"])
    assert main(["segment", "cat", txn_glob, "--pid", str(pid), "--no-color"],
                spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "nested pid match must select batches"
    assert any(ln.startswith("Batch(") for ln in out)
    assert all("producerId=-1" in ln for ln in out if ln.startswith("Batch(")), \
        "txn-state batch headers carry producerId -1; selection must be nested"
    # conjunction with the nested epoch of the same message still selects
    pe = int(pick["txn_producer_epoch"])
    assert main(["segment", "cat", txn_glob, "--pid", str(pid),
                 "--producer-epoch", str(pe), "--no-color"], spark=spark) == 0
    assert capsys.readouterr().out.strip(), "pid+epoch conjunction selects"


def test_dump_source_nested_layout_no_doc_id_collision(spark, tmp_path_factory):
    """klog's usual on-disk layout repeats basenames across partition dirs
    (<topic-partition>/00000000000000000000.log.dump.txt); doc_ids must be
    derived from the path RELATIVE to the glob root so a recursive glob
    cannot silently collide doc_id-keyed joins/windows downstream."""
    from klog_spark.sources.dump_files import read_dump_files

    root = tmp_path_factory.mktemp("nested_dumps")
    for part in ("payments-0", "payments-1"):
        d = root / part
        d.mkdir()
        (d / "00000000000000000000.log.dump.txt").write_text(
            f"Dumping /tmp/kafka-logs/{part}/00000000000000000000.log\n"
            "Starting offset: 0\n"
        )
    df = read_dump_files(spark, str(root) + "/**/*.dump.txt")
    ids = [r["doc_id"] for r in df.select("doc_id").collect()]
    assert len(ids) == len(set(ids)) == 4  # 2 files x 2 lines, all distinct
    assert {i.split(":")[0] for i in ids} == {
        "payments-0/00000000000000000000.log.dump.txt",
        "payments-1/00000000000000000000.log.dump.txt",
    }
    # flat layout keeps plain-basename doc_ids (back-compat with fixtures)
    flat = tmp_path_factory.mktemp("flat_dumps")
    (flat / "a.log.dump.txt").write_text("Dumping /tmp/kafka-logs/t-0/a.log\n")
    fids = [r["doc_id"] for r in read_dump_files(spark, str(flat)).collect()]
    assert fids == ["a.log.dump.txt:1"]


def test_dump_source_survives_junk_bytes(spark, tmp_path_factory):
    """Non-UTF8 bytes in a dump file become U+FFFD lines that classify as
    corrupt — the read never raises."""
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.sources.dump_files import read_dump_files

    d = tmp_path_factory.mktemp("junk_dumps")
    (d / "j.log.dump.txt").write_bytes(
        b"Dumping /tmp/kafka-logs/t-0/x.log\n\xff\xfe garbage \x80\n"
    )
    parsed = parse_sequences(read_dump_files(spark, str(d) + "/*.dump.txt"))
    classes = {r["doc_id"]: r["record_class"] for r in parsed.collect()}
    assert classes["j.log.dump.txt:1"] == "header"
    assert classes["j.log.dump.txt:2"] == "corrupt"


def test_cli_segment_health(spark, dump_dir, capsys):
    """`segment health` prints the per-file dashboard over CLI input and
    its counts agree with direct aggregation; the same table is published
    as a SQL view."""
    from klog_spark.__main__ import main
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing
    from klog_spark.sources.dump_files import read_dump_files
    from klog_spark.sql import register_views

    assert main(["segment", "health", dump_dir], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    routed = apply_validity_routing(
        parse_sequences(read_dump_files(spark, dump_dir + "/*.dump.txt"))
    )
    n_files = routed.select("file").distinct().count()
    assert len(out) == n_files
    assert all("n_corrupt=" in ln and "corrupt_rate=" in ln for ln in out)
    total_lines = sum(int(ln.split("n_lines=")[1].split(" ")[0]) for ln in out)
    assert total_lines == routed.count()

    names = register_views(spark, dump_dir, prefix="h1")
    assert "h1_file_health" in names
    n = spark.sql("SELECT SUM(n_lines) s FROM h1_file_health").collect()[0]["s"]
    assert n == total_lines


def test_cli_corpus_commands(spark, capsys, tmp_path):
    """The corpus CLI family end to end over the driver documents fixture:
    stats aggregates per source, shard writes a dense permutation whose
    printed manifest proves it, chunk covers every word, curate writes a
    deduplicated scrubbed corpus no larger than its input."""
    from klog_spark.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    n_docs = spark.read.parquet(docs).count()

    assert main(["corpus", "stats", docs], spark=spark) == 0
    stats_lines = [ln for ln in capsys.readouterr().out.splitlines() if "n_docs=" in ln]
    assert sum(int(ln.split("n_docs=")[1].split()[0]) for ln in stats_lines) == n_docs

    dest = str(tmp_path / "shards")
    assert main(["corpus", "shard", docs, "--out", dest, "--n-shards", "4",
                 "--seed", "cli", "--hash-fn", "java32"], spark=spark) == 0
    out = capsys.readouterr().out
    man = [ln for ln in out.splitlines() if "content_checksum=" in ln]
    assert len(man) == 4
    total = 0
    for ln in man:
        nd = int(ln.split("n_docs=")[1].split()[0])
        mp = int(ln.split("max_position=")[1].split()[0])
        assert mp == nd - 1                       # dense 0-based positions
        total += nd
    assert total == n_docs
    assert spark.read.parquet(dest).count() == n_docs

    cdest = str(tmp_path / "chunks")
    assert main(["corpus", "chunk", docs, "--out", cdest,
                 "--max-words", "50", "--overlap", "10"], spark=spark) == 0
    chunked = spark.read.parquet(cdest)
    assert chunked.select("doc_id").distinct().count() <= n_docs
    assert chunked.filter("n_chunk_words > 50").count() == 0

    qdest = str(tmp_path / "curated")
    assert main(["corpus", "curate", docs, "--out", qdest], spark=spark) == 0
    curated = spark.read.parquet(qdest)
    assert 0 < curated.count() <= n_docs
    assert set(curated.columns) == {"doc_id", "source", "text",
                                    "n_kept_words", "n_removed_words"}

    sdest = str(tmp_path / "scored")
    assert main(["corpus", "score", docs, "--out", sdest], spark=spark) == 0
    from klog_spark import entry_queries as eq

    scored = spark.read.parquet(sdest)
    assert scored.count() == n_docs
    want = {r["doc_id"]: (r["kept"], r["margin_micro"])
            for r in eq.q_scored_quality_filter(
                spark, "/root/testdata/sf0.001").collect()}
    got = {r["doc_id"]: (r["kept"], r["margin_micro"]) for r in scored.collect()}
    assert got == want                      # CLI face == gated query, row-exact


def test_cli_corpus_round7_commands(spark, capsys, tmp_path):
    """Round-7 corpus CLI faces: sample == the gated rejection-sample
    query row-exact; decontaminate drops a planted train->test leak;
    embed writes normalized hashed vectors; rebalance keeps every vector
    of cells at or under the cap."""
    from klog_spark import entry_queries as eq
    from klog_spark.__main__ import main

    docs = "/root/testdata/sf0.001/documents.parquet"
    n_docs = spark.read.parquet(docs).count()

    # sample: CLI face == gated quality_rejection_sample at the same T
    sdest = str(tmp_path / "sampled")
    assert main(["corpus", "sample", docs, "--out", sdest,
                 "--temperature-micro", str(eq.QRS_TEMPERATURE_MICRO)], spark=spark) == 0
    got = {r["doc_id"]: (r["margin_micro"], r["u_micro"], r["kept"])
           for r in spark.read.parquet(sdest).collect()}
    want = {r["doc_id"]: (r["margin_micro"], r["u_micro"], r["kept"])
            for r in eq.q_quality_rejection_sample(
                spark, "/root/testdata/sf0.001").collect()}
    assert got == want

    # decontaminate: doc 0's text re-published as a benchmark doc
    leak = spark.read.parquet(docs).filter(F.col("doc_id") == 0) \
        .select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    test_path = str(tmp_path / "bench_docs")
    leak.write.mode("overwrite").parquet(test_path)
    ddest = str(tmp_path / "decon")
    assert main(["corpus", "decontaminate", docs, "--test", test_path,
                 "--out", ddest, "--n", "5", "--min-common", "3"], spark=spark) == 0
    dec = {r["doc_id"]: r["kept"] for r in spark.read.parquet(ddest).collect()}
    assert len(dec) == n_docs and dec[0] is False
    assert sum(0 if k else 1 for k in dec.values()) < n_docs / 2

    # decontaminate with COLLIDING doc_ids (ADVICE r7): independent corpora
    # both numbered from 0 must not cross-label — a test doc reusing train
    # id 0 with UNRELATED text leaves train doc 0 kept, while a test doc
    # whose text replays train doc 1 drops train doc 1 regardless of ids.
    tr_rows = [(0, "alpha beta gamma delta epsilon zeta eta theta"),
               (1, "one two three four five six seven eight nine"),
               (2, "totally different content nothing shared here at all")]
    te_rows = [(0, "unrelated benchmark text with fresh vocabulary words"),
               (1, "one two three four five six seven eight nine")]
    ctr = str(tmp_path / "coll_train")
    cte = str(tmp_path / "coll_test")
    spark.createDataFrame(tr_rows, "doc_id long, text string").write.parquet(ctr)
    spark.createDataFrame(te_rows, "doc_id long, text string").write.parquet(cte)
    cdest = str(tmp_path / "coll_decon")
    assert main(["corpus", "decontaminate", ctr, "--test", cte,
                 "--out", cdest, "--n", "5", "--min-common", "3"], spark=spark) == 0
    crows = spark.read.parquet(cdest).collect()
    cdec = {r["doc_id"]: r["kept"] for r in crows}
    assert len(crows) == 3, "colliding ids must not duplicate decision rows"
    assert cdec == {0: True, 1: False, 2: True}

    # embed: unit-norm vectors (or zero for empty docs), requested dim
    edest = str(tmp_path / "embedded")
    assert main(["corpus", "embed", docs, "--out", edest, "--dim", "16"], spark=spark) == 0
    emb = spark.read.parquet(edest)
    assert emb.count() == n_docs
    nrm2 = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    bad = emb.select(F.size("embedding").alias("d"), nrm2.alias("n2")) \
        .filter((F.col("d") != 16) | ((F.abs(F.col("n2") - 1.0) > 1e-9) & (F.col("n2") != 0.0)))
    assert bad.count() == 0

    # rebalance: big cap keeps everything
    rdest = str(tmp_path / "rebalanced")
    embs = "/root/testdata/sf0.001/embeddings.parquet"
    n_vecs = spark.read.parquet(embs).count()
    assert main(["corpus", "rebalance", embs, "--out", rdest,
                 "--cap", str(n_vecs), "--n-centroids", "4"], spark=spark) == 0
    reb = spark.read.parquet(rdest)
    assert reb.count() == n_vecs
    assert reb.filter(~F.col("kept")).count() == 0


def test_cli_corpus_new_round7_commands(spark, capsys, tmp_path):
    """Late round-7 corpus CLI faces: dedup-blocks == the batch operator
    row-exact; badwords decisions match wordlist_filter; diff status counts
    are exact on a constructed v2; calibrate prints one confusion row per
    threshold with counts partitioning n_docs."""
    from klog_spark.__main__ import main
    from klog_spark.datapipe.dedup import dedup_paragraph_blocks
    from klog_spark.datapipe.textstats import wordlist_filter

    docs = "/root/testdata/sf0.001/documents.parquet"
    ddf = spark.read.parquet(docs)
    n_docs = ddf.count()

    bdest = str(tmp_path / "blocks")
    assert main(["corpus", "dedup-blocks", docs, "--out", bdest,
                 "--block-words", "8"], spark=spark) == 0
    got = {r["doc_id"]: (r["n_blocks"], r["n_kept_blocks"], r["kept_text"])
           for r in spark.read.parquet(bdest).collect()}
    want = {r["doc_id"]: (r["n_blocks"], r["n_kept_blocks"], r["kept_text"])
            for r in dedup_paragraph_blocks(ddf, block_words=8).collect()}
    assert got == want

    wdest = str(tmp_path / "badwords")
    assert main(["corpus", "badwords", docs, "--out", wdest,
                 "--blocklist", "slow,dup", "--max-ppm", "30000"],
                spark=spark) == 0
    got = {r["doc_id"]: (r["n_blocked"], r["keep"])
           for r in spark.read.parquet(wdest).collect()}
    want = {r["doc_id"]: (r["n_blocked"], r["keep"])
            for r in wordlist_filter(ddf, ["slow", "dup"],
                                     max_ppm=30_000).collect()}
    assert got == want

    v2 = str(tmp_path / "v2.parquet")
    ddf.filter("doc_id % 3 != 0").select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 1, F.concat("text", F.lit(" x")))
        .otherwise(F.col("text")).alias("text"),
    ).write.parquet(v2)
    fdest = str(tmp_path / "diff")
    assert main(["corpus", "diff", docs, "--new", v2, "--out", fdest],
                spark=spark) == 0
    diff = {r["status"]: r["count"]
            for r in spark.read.parquet(fdest).groupBy("status").count().collect()}
    assert diff.get("added") is None                # v2 adds nothing
    assert diff["removed"] == ddf.filter("doc_id % 3 = 0").count()
    assert diff["changed"] == ddf.filter(
        "doc_id % 3 != 0 and doc_id % 4 = 1").count()
    assert sum(diff.values()) == n_docs

    capsys.readouterr()
    assert main(["corpus", "calibrate", docs,
                 "--thresholds=-1000000,0,1000000"], spark=spark) == 0
    out = capsys.readouterr().out
    rows = [ln for ln in out.splitlines() if "threshold_micro=" in ln]
    assert len(rows) == 3
    for ln in rows:
        tp = int(ln.split("tp=")[1].split()[0])
        fp = int(ln.split("fp=")[1].split()[0])
        fn = int(ln.split("fn=")[1].split()[0])
        tn = int(ln.split("tn=")[1].split()[0])
        assert tp + fp + fn + tn == n_docs


def test_cli_corpus_dsir(spark, tmp_path):
    """dsir CLI face == the operator row-exact, with the gate's src0 target."""
    from klog_spark.__main__ import main
    from klog_spark.datapipe.mixture import dsir_importance_sample

    docs = "/root/testdata/sf0.001/documents.parquet"
    ddf = spark.read.parquet(docs)
    tgt = str(tmp_path / "target.parquet")
    ddf.filter("source = 'src0'").write.parquet(tgt)
    dest = str(tmp_path / "dsir")
    assert main(["corpus", "dsir", docs, "--target", tgt, "--k", "10",
                 "--out", dest], spark=spark) == 0
    got = {r["doc_id"]: (r["weight_micro"], r["key_micro"], r["selected"])
           for r in spark.read.parquet(dest).collect()}
    want = {r["doc_id"]: (r["weight_micro"], r["key_micro"], r["selected"])
            for r in dsir_importance_sample(
                ddf, ddf.filter("source = 'src0'"), k=10).collect()}
    assert got == want
    assert sum(1 for v in got.values() if v[2]) == 10
