"""End-to-end parse -> enrich -> route -> aggregate orchestration.

One ``Pipeline`` run is the distributed equivalent of every klog CLI
invocation at once (segment cat / txn-stat / snapshot cat / abort-cmd —
segment/cli/Cat.java:71-90, TxnStat.java:64-104, snapshot/cli/*):
the input table is parsed once, routed once, and every aggregate/report is
a query over the routed result.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import Checkpoint, run_incremental
from .operators import aggregates, checks, enrich, filters
from .operators.parse import parse_sequences
from .operators.route import apply_validity_routing, sink_counts


@dataclass
class Pipeline:
    """``staging_dir`` is the parse-once switch: after :meth:`stage` (or with
    a pre-existing routed table) every query reads the partitioned staging
    parquet — partition-pruned per sink class, zero re-parses — instead of
    re-running the Arrow parse per query. At 100 TB the parse is the
    dominant cost; the product API must pay it once."""

    spark: SparkSession
    fixture_dir: str
    staging_dir: str | None = None

    def input_df(self) -> DataFrame:
        return self.spark.read.parquet(str(Path(self.fixture_dir) / "sequences.parquet"))

    def stage(self, out_dir: str) -> "Pipeline":
        """Parse + route ONCE into a partitioned staging table; further
        queries on the returned Pipeline are parse-free."""
        from .operators.route import write_routed

        write_routed(apply_validity_routing(parse_sequences(self.input_df())), out_dir)
        self.staging_dir = out_dir
        return self

    def topic_meta(self) -> DataFrame:
        return self.spark.read.parquet(str(Path(self.fixture_dir) / "topic_meta.parquet"))

    def producer_meta(self) -> DataFrame:
        return self.spark.read.parquet(str(Path(self.fixture_dir) / "producer_meta.parquet"))

    def parsed(self) -> DataFrame:
        """Parse + validity routing (no materialization — callers compose).

        This is the SINK view: CRC-invalid / invariant-violating rows are
        re-classed corrupt. Transactional aggregates must NOT consume it —
        use :meth:`parsed_raw` (klog's currentBatch cursor points at invalid
        batches too; their control messages are then dropped, not
        re-attached to an earlier valid batch).
        """
        if self.staging_dir:
            return self.spark.read.parquet(self.staging_dir)
        return apply_validity_routing(parse_sequences(self.input_df()))

    def parsed_raw(self) -> DataFrame:
        """Pre-routing parse for the transactional aggregates (the view
        TransactionalInfoCollector.java:61 folds over). From a staging table
        this is reconstructed exactly by ``routed_as_parsed``."""
        if self.staging_dir:
            from .operators.route import routed_as_parsed

            return routed_as_parsed(self.spark.read.parquet(self.staging_dir))
        return parse_sequences(self.input_df())

    def run_routed(self, out_dir: str) -> dict:
        """Checkpointed incremental route-write (resumable, idempotent)."""
        ckpt = Checkpoint(Path(out_dir) / "_checkpoint")
        return run_incremental(self.spark, str(Path(self.fixture_dir) / "sequences.parquet"), out_dir, ckpt)

    # --- the reference's query surface -------------------------------------
    def txn_stats(self, **flt) -> DataFrame:
        return aggregates.txn_stats(self.parsed_raw(), **flt)

    def cat_batches(self, **flt) -> DataFrame:
        return filters.cat_batches(self.parsed(), **flt)

    def cat_producer_states(self, **flt) -> DataFrame:
        return filters.cat_producer_states(self.parsed(), **flt)

    def abort_commands(self, pid: int, producer_epoch: int) -> DataFrame:
        return enrich.abort_commands_for(self.parsed(), pid, producer_epoch)

    def open_txn_abort_commands(self, **flt) -> DataFrame:
        return enrich.open_txn_abort_commands(self.parsed_raw(), **flt)

    def sink_counts(self) -> DataFrame:
        return sink_counts(self.parsed())

    def group_offsets(self) -> DataFrame:
        """Compacted latest offset-commit per (group, topic, partition) —
        the __consumer_offsets surface the reference leaves a TODO."""
        from .operators.group_offsets import latest_group_offsets

        return latest_group_offsets(self.parsed())

    def group_lag(self) -> DataFrame:
        from .operators.group_offsets import group_lag

        return group_lag(self.parsed())

    def group_metadata(self) -> DataFrame:
        from .operators.group_offsets import latest_group_metadata

        return latest_group_metadata(self.parsed())

    def enriched_batches(self) -> DataFrame:
        df = self.parsed().filter(F.col("record_class") == "batch")
        df = enrich.enrich_with_topic_meta(df, self.topic_meta())
        return enrich.enrich_with_producer_meta(df, self.producer_meta())

    def all_checks(self) -> dict[str, DataFrame]:
        p = self.parsed_raw()
        return {
            "offset_gaps": aggregates.offset_gaps(p),
            "position_monotonic": checks.position_monotonic_violations(p),
            "leader_epoch_monotonic": checks.leader_epoch_monotonic_violations(p),
            "state_machine": checks.state_machine_violations(p),
            "batch_message_count": checks.batch_message_count_check(p),
        }
