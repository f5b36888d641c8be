"""Parse-once / query-the-staging path: routed_as_parsed must reproduce the
direct-parse aggregates exactly (the 100 TB execution shape)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def routed_dir(spark, fixture_dir, tmp_path_factory):
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing

    out = tmp_path_factory.mktemp("staging") / "routed"
    apply_validity_routing(
        parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet"))
    ).write.mode("overwrite").partitionBy("record_class").parquet(str(out))
    return str(out)


def test_staging_txn_stats_parity(spark, parsed_df, routed_dir):
    from klog_spark.operators.aggregates import txn_stats
    from klog_spark.operators.route import routed_as_parsed

    direct = txn_stats(parsed_df).collect()[0].asDict()
    staged = txn_stats(routed_as_parsed(spark.read.parquet(routed_dir))).collect()[0].asDict()
    assert direct == staged


def test_staging_open_empty_parity(spark, parsed_df, routed_dir):
    from klog_spark.operators.aggregates import empty_txns, open_txns
    from klog_spark.operators.route import routed_as_parsed

    rp = routed_as_parsed(spark.read.parquet(routed_dir))
    assert sorted(map(tuple, open_txns(parsed_df).collect())) == sorted(map(tuple, open_txns(rp).collect()))
    assert sorted(map(tuple, empty_txns(parsed_df).collect())) == sorted(map(tuple, empty_txns(rp).collect()))


def test_read_sink_projections(spark, routed_dir):
    from klog_spark.operators.route import SINK_PROJECTIONS, read_sink

    for cls, cols in SINK_PROJECTIONS.items():
        df = read_sink(spark, routed_dir, cls)
        assert df.columns == cols
        assert df.count() > 0, cls


def test_pipeline_stage_parse_once(spark, fixture_dir, tmp_path, oracle_parsed):
    """Pipeline.stage: queries over the staged table match the parse-per-query
    path (and the oracle), with zero MapInArrow in the staged plan."""
    from klog_spark import oracle
    from klog_spark.pipeline import Pipeline

    p = Pipeline(spark, fixture_dir).stage(str(tmp_path / "staged"))
    row = p.txn_stats().collect()[0].asDict()
    st = oracle.txn_stat(oracle_parsed)
    assert row["num_committed"] == st.num_committed
    assert row["num_aborted"] == st.num_aborted
    assert row["num_open_txn"] == len(st.open_txns)
    assert row["num_offset_gaps"] == st.num_offset_gaps
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p.txn_stats().explain("simple")
    assert "MapInArrow" not in buf.getvalue()


def test_checkpoint_crash_recovery_no_duplicates(spark, fixture_dir, tmp_path):
    """A run that appended but crashed before ckpt.commit must not
    double-count: its orphan run_id partitions are dropped on the next run,
    its files reprocess, and committed-only reads never see orphans."""
    from klog_spark.checkpoint import Checkpoint, read_routed_committed, run_incremental

    out = str(tmp_path / "sink")
    ckpt = Checkpoint(tmp_path / "sink" / "_checkpoint")
    inp = f"{fixture_dir}/sequences.parquet"

    r1 = run_incremental(spark, inp, out, ckpt)
    total = spark.read.parquet(f"{out}/routed").count()
    assert total == sum(r1["sink_counts"].values())

    # simulate a crashed second run: append under a fresh run_id, NO commit
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing

    orphan = apply_validity_routing(parse_sequences(spark.read.parquet(inp)))
    orphan.withColumn("run_id", F.lit("deadbeefcafe")).write.mode("append").partitionBy(
        "record_class", "run_id"
    ).parquet(f"{out}/routed")
    assert spark.read.parquet(f"{out}/routed").count() == 2 * total  # orphan visible raw

    # committed-only reader is immune to the orphan even before cleanup
    assert read_routed_committed(spark, out, ckpt).count() == total

    # resume: orphan dropped, nothing new to process, totals unchanged
    r2 = run_incremental(spark, inp, out, ckpt)
    assert r2["n_files"] == 0
    assert spark.read.parquet(f"{out}/routed").count() == total


def test_write_routed_bounds_file_count(spark, fixture_dir, tmp_path):
    """The pre-shuffled routed write must emit ~write_tasks files, not
    tasks x sinks (the small-files explosion the pre-shuffle exists to
    prevent)."""
    import os

    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing, write_routed

    parsed = apply_validity_routing(parse_sequences(spark.read.parquet(f"{fixture_dir}/sequences.parquet")))
    out = str(tmp_path / "r")
    write_routed(parsed, out, write_tasks=8)
    parquet_files = [f for _, _, fs in os.walk(out) for f in fs if f.endswith(".parquet")]
    # 8 shuffle partitions over 8 sink-class partitions: collisions allow a
    # few extra files, but nowhere near tasks x sinks
    assert 0 < len(parquet_files) <= 16, parquet_files
    # read-back integrity
    assert spark.read.parquet(out).count() == parsed.count()


def test_bucketed_staging_shuffle_free_join(spark, parsed_df):
    """Bucketed staging: the producer correlation must (a) equal the same
    computation over the unbucketed parsed view and (b) compile to a plan
    with ZERO Exchange operators once broadcast is disabled — the co-located
    big-big join story at 10^12 rows."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from klog_spark.sources.bucketed import producer_correlation, stage_bucketed

    prefix = "t_bucketed_stage"
    tables = stage_bucketed(parsed_df, prefix, buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        corr = producer_correlation(spark, prefix)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            corr.explain("simple")
        plan = buf.getvalue()
        assert "Exchange" not in plan, f"bucketed join must be shuffle-free:\n{plan}"
        got = {r["producer_id"]: tuple(r)[1:] for r in corr.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in tables.values():
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    # reference computation over the unbucketed parsed view
    b = (
        parsed_df.filter((F.col("record_class") == "batch") & (F.col("producer_id") != -1))
        .groupBy("producer_id")
        .agg(F.count("*").alias("n_batches"), F.max("last_offset").alias("mlo"),
             F.max("producer_epoch").alias("mbe"))
    )
    s = (
        parsed_df.filter(F.col("record_class") == "producer_state")
        .groupBy("producer_id")
        .agg(F.count("*").alias("n_snapshots"), F.max("producer_epoch").alias("mse"),
             F.max("coordinator_epoch").alias("mce"))
    )
    want = {r["producer_id"]: tuple(r)[1:] for r in b.join(s, "producer_id").collect()}
    assert got == want and got
