"""Table IO: Iceberg when available, parquet otherwise.

The north rule targets partitioned Iceberg tables; this sandbox has no
Iceberg runtime jar, so the engine is written against a thin indirection:
``read_table`` / ``write_table`` use the Iceberg catalog when the session
has one configured (``spark.sql.catalog.<name>``) and fall back to parquet
paths otherwise. Checkpointing (checkpoint.py) plays the role of Iceberg
snapshot high-water marks in the fallback; on Iceberg the same manifest
keys off snapshot ids instead of file names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001 - any classloader failure means absent
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """location: an Iceberg table identifier (catalog.db.table) or a
    parquet path. Heuristic: paths contain '/'."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(df: DataFrame, location: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if "/" not in location and iceberg_available(df.sparkSession):
        writer.format("iceberg").saveAsTable(location)
    else:
        writer.parquet(location)
