"""Salted two-phase aggregation parity with direct aggregation."""

from pyspark.sql import functions as F


def test_salted_batches_per_epoch_parity(parsed_df):
    from klog_spark.operators.aggregates import batches_per_epoch
    from klog_spark.operators.skew import salted_batches_per_epoch

    direct = {(r["producer_id"], r["producer_epoch"]): r["n_batches"]
              for r in batches_per_epoch(parsed_df).collect()}
    salted = {(r["producer_id"], r["producer_epoch"]): r["n_batches"]
              for r in salted_batches_per_epoch(parsed_df, salt_buckets=8).collect()}
    assert direct == salted


def test_salted_sum_parity(spark):
    from klog_spark.operators.skew import salted_sum

    df = spark.range(10000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("k"),          # 3 hot keys
        (F.col("id") * 2).alias("v"),
    )
    direct = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["sum_v"] for r in salted_sum(df, ["k"], "v", salt_buckets=8).collect()}
    assert direct == salted


def test_salted_join_parity(spark, fixture_dir, parsed_df):
    from klog_spark.operators.skew import broadcast_or_salted_join

    meta = spark.read.parquet(f"{fixture_dir}/producer_meta.parquet")
    b = parsed_df.filter((F.col("record_class") == "batch") & (F.col("producer_id") != -1))
    via_broadcast = broadcast_or_salted_join(b, meta, ["producer_id"]).groupBy("team").count()
    via_salted = broadcast_or_salted_join(b, meta, ["producer_id"], salt_buckets=4).groupBy("team").count()
    # set equality: fixture v8 adds consumer-offsets transactional pids with
    # no meta row, so the left join emits a (None, n) group that Python's
    # tuple sort cannot order against strings
    assert set(map(tuple, via_broadcast.collect())) == set(map(tuple, via_salted.collect()))
