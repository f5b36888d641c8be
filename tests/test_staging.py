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
