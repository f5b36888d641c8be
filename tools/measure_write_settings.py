"""A/B the parquet writer knobs on the routed fan-out write (VERDICT r4 #7).

klog_routed_write is the largest single line of the bench suite; the plan
(single MapInArrow parse -> weighted (class,bucket) pre-shuffle -> one
partitioned write) was audited as right, leaving only writer-level knobs:
row-group size (``parquet.block.size``, default 128 MiB — far larger than
any per-task file here, so each open writer buffers a whole file in the
column-chunk encoder before flushing) and page size. This script measures
them interleaved, best-of-N, against the same cached parse, writing to
/dev/shm so disk latency is out of the picture.

Usage: python tools/measure_write_settings.py [sf_dir] [reps]
Prints one line per variant; record the outcome in BENCH/BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from klog_spark.entry_queries import klog_fixture
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing, prepare_routed_write
    from klog_spark.session import get_spark

    spark = get_spark(app_name="write-settings", master="local[32]",
                      shuffle_partitions=32)
    fx = klog_fixture(sf_dir)
    parsed = apply_validity_routing(
        parse_sequences(spark.read.parquet(f"{fx}/sequences.parquet"))
    )
    staged = prepare_routed_write(parsed).cache()
    n = staged.count()  # materialize once: measure ONLY the write
    print(f"rows={n} sf_dir={sf_dir} reps={reps}")

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    variants = {
        "base-128MiB-rowgroup": {},
        "rowgroup-8MiB": {"parquet.block.size": 8 * 1024 * 1024},
        "rowgroup-32MiB": {"parquet.block.size": 32 * 1024 * 1024},
        "rowgroup-8MiB-page-256KiB": {
            "parquet.block.size": 8 * 1024 * 1024,
            "parquet.page.size": 256 * 1024,
        },
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(reps):
        for name, opts in variants.items():  # interleaved: VM drift hits all
            out = tempfile.mkdtemp(prefix="wopt-", dir=shm)
            shutil.rmtree(out)
            t0 = time.time()
            w = staged.write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            w.partitionBy("record_class").parquet(out)
            dt = time.time() - t0
            times[name].append(dt)
            nfiles = sum(1 for _ in Path(out).rglob("*.parquet"))
            nbytes = sum(p.stat().st_size for p in Path(out).rglob("*.parquet"))
            shutil.rmtree(out, ignore_errors=True)
            print(f"  rep{rep} {name:28s} {dt:6.2f}s files={nfiles} MiB={nbytes/2**20:.0f}")
    print("\nbest-of-%d:" % reps)
    for name, ts in times.items():
        print(f"  {name:28s} {min(ts):6.2f}s  (runs: {', '.join(f'{t:.2f}' for t in ts)})")


if __name__ == "__main__":
    main()
