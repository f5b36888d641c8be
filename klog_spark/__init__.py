"""klog-spark: a PySpark-native parse -> enrich -> route -> aggregate engine.

A from-scratch reimagining of tombentley/klog (a single-threaded CLI that
analyses ``kafka-dump-log.sh`` segment / producer-snapshot dumps) as a
distributed Spark pipeline over tables of pre-tokenized log lines
(``doc_id:string, tokens:array<int32>, n_tok:int32, source:string``).

Nothing here is a port of the reference's execution machinery: parsing is
vectorized (Arrow / pandas UDFs), correlation that klog does with in-memory
hash maps (/root/reference/src/main/java/com/github/tombentley/klog/segment/
reader/TransactionalInfoCollector.java:38) is done with window functions and
hash aggregations, and the fan-out that klog does with a visitor
(segment/model/SegmentVisitor.java:19-29) is a single partitioned write.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API: the heavyweight imports (pyspark session machinery)
    load on first use, keeping `import klog_spark` cheap for tooling."""
    if name == "Pipeline":
        from .pipeline import Pipeline

        return Pipeline
    if name == "get_spark":
        from .session import get_spark

        return get_spark
    if name == "register_views":
        from .sql import register_views

        return register_views
    if name == "read_dump_files":
        from .sources.dump_files import read_dump_files

        return read_dump_files
    raise AttributeError(f"module 'klog_spark' has no attribute {name!r}")


__all__ = ["Pipeline", "get_spark", "register_views", "read_dump_files", "__version__"]
