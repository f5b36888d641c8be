"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

The klog pipeline queries run over the seeded fixture at the matching scale
(generated/cached under data/klog/); the datapipe queries run over the
driver-provided tables in $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from klog_spark import entry_queries as eq
    from klog_spark.operators import aggregates
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing
    from klog_spark.session import get_spark

    sf = eq.sf_of(sf_dir)
    fx = eq.klog_fixture(sf_dir)
    spark = get_spark(app_name="klog-bench")

    seq = spark.read.parquet(f"{fx}/sequences.parquet")
    n_rows = seq.count()
    parse_sequences(seq).filter("record_class='batch'").count()  # warm python workers

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    out_dir = tempfile.mkdtemp(prefix="klog-bench-")
    try:
        timed("klog_parse_route", lambda: parse_sequences(seq).groupBy("record_class").count().collect())
        timed("klog_txn_stats", lambda: aggregates.txn_stats(parse_sequences(seq)).collect())
        timed(
            "klog_routed_write",
            lambda: apply_validity_routing(parse_sequences(seq))
            .write.mode("overwrite").partitionBy("record_class").parquet(f"{out_dir}/routed"),
        )
        timed("klog_batches_per_epoch", lambda: aggregates.batches_per_epoch(parse_sequences(seq)).count())
        timed("klog_enrich_team", lambda: eq.q_enrich_producer_team(spark, sf_dir).collect())
        timed("klog_state_machine", lambda: eq.q_state_machine_violations(spark, sf_dir).count())
        timed("dedup_exact", lambda: eq.q_dedup_exact(spark, sf_dir).count())
        timed("dedup_minhash_lsh", lambda: eq.q_dedup_minhash(spark, sf_dir).count())
        timed("ann_cosine_topk", lambda: eq.q_ann_topk(spark, sf_dir).count())
        timed("text_quality", lambda: eq.q_text_quality(spark, sf_dir).count())
        timed("events_daily", lambda: eq.q_events_daily(spark, sf_dir).count())
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    pipeline_s = timings["klog_parse_route"] + timings["klog_txn_stats"] + timings["klog_routed_write"]
    print(json.dumps({
        "metric": "headline query suite wall time (parse/route/aggregate + datapipe)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "klog_rows": n_rows,
        "klog_pipeline_rows_per_sec": round(n_rows * 3 / pipeline_s, 1),
    }))


if __name__ == "__main__":
    main()
