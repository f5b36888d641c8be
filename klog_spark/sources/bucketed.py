"""Bucketed staging tables: co-located big-big joins with ZERO shuffle.

The partitioned-parquet staging (route.write_routed) gives per-class
partition pruning, but a big-big join over it — e.g. the segment <->
snapshot producer correlation the reference does by hand (README.md:140-158)
— still shuffles BOTH sides on the join key. At 10^12 rows that shuffle is
the job. Bucketing is the Spark-native fix: write both sinks hash-bucketed
(and sorted) by ``producer_id`` once, and every later producer-keyed join
or aggregate reads co-located buckets — SortMergeJoin / partial-final
aggregate with NO Exchange in the plan (asserted in
tests/test_staging.py and tools' plan audit).

This is the parquet-table flavor of the same layout an Iceberg deployment
gets from a bucket partition transform (``bucket(N, producer_id)``) — see
sources/table_io.py for the catalog indirection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Columns worth materializing per side — narrow tables keep the bucket
#: files scan-light; everything else stays in the partitioned staging.
BATCH_BUCKET_COLS = [
    "doc_id", "file", "line_no", "producer_id", "producer_epoch",
    "base_offset", "last_offset", "count", "is_transactional", "segment_type",
]
SNAPSHOT_BUCKET_COLS = [
    "doc_id", "file", "line_no", "producer_id", "producer_epoch",
    "coordinator_epoch", "last_offset", "last_timestamp_ms",
]


def stage_bucketed(parsed: DataFrame, name_prefix: str,
                   buckets: int | None = None) -> dict[str, str]:
    """Materialize the producer-keyed sinks as bucketed+sorted tables.

    One repartition per side onto the bucket key (so each bucket is one
    file, which also lets the reader skip the per-bucket sort), then
    ``bucketBy(n, producer_id).sortBy(producer_id)``. Returns
    {sink: table_name}.
    """
    spark = parsed.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism
    sides = {
        "batch": parsed.filter(
            (F.col("record_class") == "batch") & (F.col("producer_id") != -1)
        ).select(*BATCH_BUCKET_COLS),
        "producer_state": parsed.filter(
            F.col("record_class") == "producer_state"
        ).select(*SNAPSHOT_BUCKET_COLS),
    }
    tables = {}
    for sink, df in sides.items():
        name = f"{name_prefix}_{sink}"
        (
            df.repartition(buckets, "producer_id")
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(buckets, "producer_id")
            .sortBy("producer_id")
            .saveAsTable(name)
        )
        tables[sink] = name
    return tables


def producer_correlation(spark: SparkSession, name_prefix: str) -> DataFrame:
    """The README post-mortem correlation as one shuffle-free query over the
    bucketed staging: per-producer segment-side batch stats joined to
    snapshot-side producer state. Both the groupBys and the join reuse the
    bucket partitioning — with broadcast disabled the physical plan contains
    ZERO Exchange operators."""
    b = (
        spark.table(f"{name_prefix}_batch")
        .groupBy("producer_id")
        .agg(
            F.count("*").alias("n_batches"),
            F.max("last_offset").alias("max_last_offset"),
            F.max("producer_epoch").alias("max_batch_epoch"),
        )
    )
    s = (
        spark.table(f"{name_prefix}_producer_state")
        .groupBy("producer_id")
        .agg(
            F.count("*").alias("n_snapshots"),
            F.max("producer_epoch").alias("max_snapshot_epoch"),
            F.max("coordinator_epoch").alias("max_coordinator_epoch"),
        )
    )
    return b.join(s, "producer_id", "inner")
