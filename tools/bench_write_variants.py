"""One-off experiment: routed-write variants at the bench config.

Measures parse->route->write wall time for:
  direct   - plain dynamic-partition write (round-1 shape)
  preshuf  - repartition(write_tasks, record_class, bucket) (round-2 shape)
  sortwp   - sortWithinPartitions(record_class), NO shuffle
at a given master, to pick the adaptive rule from data.

Usage: python tools/bench_write_variants.py local[32] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def count_files(d: str) -> int:
    return sum(1 for p in Path(d).rglob("*.parquet"))


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(master.split("[")[1].rstrip("]"))

    from pyspark.sql import functions as F

    from klog_spark import entry_queries as eq
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import SINKS, apply_validity_routing
    from klog_spark.session import get_spark

    spark = get_spark(app_name="write-variants", master=master, shuffle_partitions=n)
    fx = eq.klog_fixture(sf_dir)
    seq = spark.read.parquet(f"{fx}/sequences.parquet")
    parse_sequences(seq).filter("record_class='batch'").count()  # warm workers

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    write_tasks = min(n, 16)
    buckets = max(1, write_tasks // len(SINKS))

    def routed():
        return apply_validity_routing(parse_sequences(seq))

    variants = {
        "direct": lambda df: df,
        "preshuf": lambda df: df.repartition(
            write_tasks, F.col("record_class"), F.pmod(F.xxhash64("doc_id"), F.lit(buckets))
        ),
        "sortwp": lambda df: df.sortWithinPartitions("record_class"),
    }

    results: dict[str, list] = {k: [] for k in variants}
    for rnd in range(3):
        for name, shape in variants.items():
            out = tempfile.mkdtemp(prefix=f"wv-{name}-", dir=shm)
            try:
                t0 = time.time()
                shape(routed()).write.mode("overwrite").partitionBy("record_class").parquet(out)
                dt = time.time() - t0
                results[name].append((round(dt, 2), count_files(out)))
            finally:
                shutil.rmtree(out, ignore_errors=True)
        print(f"round {rnd}: " + " ".join(f"{k}={results[k][-1]}" for k in variants), flush=True)

    print(f"\nmaster={master} sf_dir={sf_dir} write_tasks={write_tasks}")
    for name, rs in results.items():
        best = min(t for t, _ in rs)
        print(f"{name:8s} best={best:6.2f}s runs={rs}")


if __name__ == "__main__":
    main()
