"""Scaling-protocol job: the full parse -> enrich -> route -> aggregate
pipeline, timed from first action to last (JVM/session startup excluded per
BASELINE.md). Run via spark-submit at two parallelism levels:

    spark-submit --master local[8]  --py-files dist/klog_spark.zip tools/scaling_job.py <sf> <out>
    spark-submit --master local[32] --py-files dist/klog_spark.zip tools/scaling_job.py <sf> <out>

Prints one JSON line: rows, wall seconds, rows/sec.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"
    from klog_spark.operators import aggregates
    from klog_spark.operators.parse import parse_sequences
    from klog_spark.operators.route import apply_validity_routing

    spark = (
        SparkSession.builder.appName("klog-scaling")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.shuffle.partitions", str(spark_cores()))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if mode in ("dedup", "dedup_words"):
        # dedup_words = the allocation-light signature kernel (VERDICT r7
        # #5): word-hash int64 shingle keys, no n-gram strings — same LSH /
        # verify dataflow, same planted-pair answer
        run_dedup(spark, sf,
                  hash_fn="xxhash64_words" if mode == "dedup_words" else "xxhash64")
        return
    if mode == "paragraphs":
        run_paragraphs(spark, sf)
        return
    if mode == "novelty":
        run_novelty(spark, sf)
        return
    if mode == "manifest":
        run_manifest(spark, sf)
        return
    from klog_spark.datagen import ensure_fixture

    fx = str(ensure_fixture(sf))
    df = spark.read.parquet(f"{fx}/sequences.parquet")
    # pre-warm the Python worker pool (session-init cost, like JVM startup,
    # excluded per BASELINE.md protocol)
    parse_sequences(df).filter("record_class='header'").count()
    import os as _os
    out = tempfile.mkdtemp(prefix="klog-scaling-",
                           dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
    try:
        t0 = time.time()
        n = df.count()  # first timed action
        if mode == "parse_agg":
            # scan -> Arrow parse -> single-pass transactional aggregate
            # (the compute kernel: exactly ONE parse, no sink write)
            stats = aggregates.txn_stats(parse_sequences(df)).collect()[0]
            per_epoch = -1
        elif mode == "write":
            # write path in isolation: scan -> parse -> route -> pre-shuffled
            # partitioned sink write (the round-2 write-scaling experiment,
            # pinned as a repeatable mode)
            from klog_spark.operators.route import write_routed

            write_routed(apply_validity_routing(parse_sequences(df)),
                         f"{out}/routed", pre_shuffle=True)
            stats = {"num_committed": -1, "num_aborted": -1}
            per_epoch = -1
        else:
            from klog_spark.operators.route import write_routed

            parsed = apply_validity_routing(parse_sequences(df))
            meta = spark.read.parquet(f"{fx}/producer_meta.parquet")
            enriched = parsed.join(F.broadcast(meta), ["producer_id"], "left")
            # pin the scale plan: a scaling comparison must run the SAME
            # plan at both parallelism levels (the adaptive default would
            # switch plans below PRE_SHUFFLE_MIN_PARALLELISM)
            write_routed(enriched, f"{out}/routed", pre_shuffle=True)
            # aggregates over the routed staging (partition-pruned columnar
            # reads; the Arrow parse ran exactly once, in the write above)
            from klog_spark.operators.route import routed_as_parsed

            routed = spark.read.parquet(f"{out}/routed")
            stats = aggregates.txn_stats(
                routed_as_parsed(routed, classes=["batch", "control_msg"])
            ).collect()[0]
            per_epoch = routed.filter(
                (F.col("record_class") == "batch") & (F.col("producer_id") != -1)
            ).groupBy("producer_id", "producer_epoch").count().count()
        wall = time.time() - t0
        print(json.dumps({
            "master": spark.sparkContext.master,
            "mode": mode,
            "rows": n,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
            "num_committed": stats["num_committed"],
            "num_aborted": stats["num_aborted"],
            "n_sessions": per_epoch,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def run_dedup(spark: SparkSession, sf: float,
              hash_fn: str = "xxhash64") -> None:
    """LLM-pipeline scaling mode (VERDICT r6 next #7): MinHash+LSH near-dup
    detection over a deterministic synthetic document corpus — the same
    N -> 4N two-parallelism protocol as parse_agg, so the dedup half of the
    engine carries its own >= 0.8 efficiency evidence.

    Corpus: sf-scaled (sf1 = 100k docs of 80 synthetic words each, vocab
    4000), PLUS an exact copy of every 10th doc — generated JVM-side from
    spark.range (no RNG, identical at every parallelism level), written to
    tmp parquet OUTSIDE the timed window (the fixture role). Timed: scan ->
    minhash signatures (64 perms) -> banded LSH candidates -> signature
    verify -> pair count. Sanity across levels: num_committed = verified
    near-dup pairs, num_aborted = distinct flagged docs.
    """
    import os as _os

    from klog_spark.datapipe.dedup import minhash_dedup

    n_docs = max(1000, int(100_000 * sf))
    out = tempfile.mkdtemp(prefix="klog-scaling-dedup-",
                           dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
    try:
        words = F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id") * F.lit(997) + i), F.lit(4000)),
            ),
        )
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
        )
        dups = base.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + n_docs).alias("doc_id"), "text"
        )
        base.unionByName(dups).repartition(4 * spark_cores()) \
            .write.mode("overwrite").parquet(f"{out}/docs")
        docs = spark.read.parquet(f"{out}/docs")
        docs.limit(16).collect()  # pre-warm (session-init, excluded)

        t0 = time.time()
        n = docs.count()  # first timed action
        pairs = minhash_dedup(docs, num_hashes=64, bands=16, shingle_n=3,
                              threshold=0.5, hash_fn=hash_fn)
        # one action for the whole dedup: 2*n_pairs exploded members ->
        # (pair count, distinct flagged docs) in a single aggregate
        row = (
            pairs.select(F.explode(F.array("id1", "id2")).alias("d"))
            .agg((F.count("*") / 2).cast("long").alias("np"),
                 F.countDistinct("d").alias("nf"))
            .collect()[0]
        )
        n_pairs, n_flagged = row["np"], row["nf"]
        wall = time.time() - t0
        print(json.dumps({
            "master": spark.sparkContext.master,
            "mode": "dedup" if hash_fn == "xxhash64" else "dedup_words",
            "rows": n,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
            "num_committed": n_pairs,
            "num_aborted": n_flagged,
            "n_sessions": -1,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def run_paragraphs(spark: SparkSession, sf: float) -> None:
    """Paragraph-block dedup scaling mode: the round-7 first-occurrence-keep
    rewrite over the same deterministic synthetic corpus as run_dedup, under
    the identical N -> 4N protocol. Exercises the min-struct block
    aggregation (one wide shuffle on 8-byte hashed block keys), the doc_id
    regroup and the reassembly join — a different shuffle/agg mix than
    MinHash (no Python beyond the scan, no banded explode), so it isolates
    whether the dedup family's scaling ceiling is the algorithm or the VM.

    Sanity across levels: num_committed = total blocks,
    num_aborted = globally-kept blocks (both must be identical at N and 4N).
    """
    import os as _os

    from klog_spark.datapipe.dedup import dedup_paragraph_blocks

    n_docs = max(1000, int(100_000 * sf))
    out = tempfile.mkdtemp(prefix="klog-scaling-para-",
                           dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
    try:
        words = F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id") * F.lit(997) + i), F.lit(4000)),
            ),
        )
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
        )
        dups = base.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + n_docs).alias("doc_id"), "text"
        )
        base.unionByName(dups).repartition(4 * spark_cores()) \
            .write.mode("overwrite").parquet(f"{out}/docs")
        docs = spark.read.parquet(f"{out}/docs")
        docs.limit(16).collect()  # pre-warm (session-init, excluded)

        t0 = time.time()
        n = docs.count()  # first timed action
        rewritten = dedup_paragraph_blocks(docs, block_words=16,
                                           hash_blocks=True)
        row = rewritten.agg(
            F.sum("n_blocks").cast("long").alias("nb"),
            F.sum("n_kept_blocks").cast("long").alias("nk"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({
            "master": spark.sparkContext.master,
            "mode": "paragraphs",
            "rows": n,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
            "num_committed": row["nb"],
            "num_aborted": row["nk"],
            "n_sessions": -1,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def spark_cores() -> int:
    """Shuffle-partition count = core count, passed by the runner."""
    import os

    return int(os.environ.get("SPARK_SCALING_CORES", "32"))


def run_novelty(spark: SparkSession, sf: float) -> None:
    """Packed-Bloom novelty-screen scaling mode (round 8): the zero-Exchange
    admission-control kernel — reference shingles packed into a broadcast
    bitmap OUTSIDE the timed window (the index role, like the fixture),
    then the timed job is scan -> per-doc k-probe Arrow kernel -> one
    scalar aggregate. This is the firehose-rate component of the dedup
    family (the screen every arriving document passes at 100 TB); with no
    shuffle in the timed plan it should scale at the VM's pure-compute
    ceiling, separating the family's kernel scaling from its candidate-join
    IPC ceiling.

    Sanity across levels: num_committed = sum(n_novel),
    num_aborted = count(novelty_ppm = 0) (the planted republications).
    """
    import os as _os

    from klog_spark.datapipe.dedup import (bloom_pack, ngram_novelty_packed,
                                           shingle_bloom_bits)

    n_docs = max(1000, int(100_000 * sf))
    m, k = 1 << 24, 4
    out = tempfile.mkdtemp(prefix="klog-scaling-novelty-",
                           dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
    try:
        words = F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id") * F.lit(997) + i), F.lit(4000)),
            ),
        )
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
        )
        base.repartition(4 * spark_cores()).write.mode("overwrite") \
            .parquet(f"{out}/docs")
        docs = spark.read.parquet(f"{out}/docs")
        # reference = every 10th doc; bitmap built OUTSIDE the timed window
        bitmap = bloom_pack(
            shingle_bloom_bits(docs.filter(F.col("doc_id") % 10 == 0),
                               m=m, k=k, n=3, hash_fn="xxhash64"),
            m=m,
        )
        docs.limit(16).collect()  # pre-warm (session-init, excluded)

        t0 = time.time()
        n = docs.count()  # first timed action
        scr = ngram_novelty_packed(docs, bitmap, m=m, k=k, n=3,
                                   hash_fn="xxhash64")
        row = scr.agg(
            F.sum("n_novel").cast("long").alias("nn"),
            F.sum((F.col("novelty_ppm") == 0).cast("int")).cast("long").alias("nz"),
        ).collect()[0]
        wall = time.time() - t0
        print(json.dumps({
            "master": spark.sparkContext.master,
            "mode": "novelty",
            "rows": n,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
            "num_committed": row["nn"],
            "num_aborted": row["nz"],
            "n_sessions": -1,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def run_manifest(spark: SparkSession, sf: float) -> None:
    """Manifest-family scaling mode (VERDICT r8 #5): the two newest
    window-heavy operators — curriculum_order's (bucket, shard) manifest
    and the r9-sharded mixture_interleave — timed together over a
    synthetic scored corpus. Both now run windows over bounded (group,
    shard) partitions composed via broadcast prefix offsets, so this mode
    measures whether the manifest family scales like the per-row kernels
    (>= 0.8) rather than like a single-task per-source sort.

    Sanity across levels: num_committed = sum(pos) over the curriculum
    manifest, num_aborted = sum(rank_in_source) over the interleave
    schedule (both exact integers, partition-independent).
    """
    import os as _os

    from klog_spark.datapipe.mixture import curriculum_order, mixture_interleave

    n_docs = max(1000, int(100_000 * sf))
    out = tempfile.mkdtemp(prefix="klog-scaling-manifest-",
                           dir="/dev/shm" if _os.path.isdir("/dev/shm") else None)
    try:
        base = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), 5).cast("string"))
            .alias("source"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(2_000_001))
             - F.lit(1_000_000)).cast("long").alias("margin_micro"),
        )
        base.repartition(4 * spark_cores()).write.mode("overwrite") \
            .parquet(f"{out}/docs")
        docs = spark.read.parquet(f"{out}/docs")
        docs.limit(16).collect()  # pre-warm (session-init, excluded)

        weights = {f"src{i}": [0.4, 0.25, 0.15, 0.15, 0.05][i] for i in range(5)}
        t0 = time.time()
        n = docs.count()  # first timed action
        cur = curriculum_order(docs.select("doc_id", "margin_micro"),
                               "margin_micro", [-300_000, 0, 300_000],
                               n_shards=64)
        c_row = cur.agg(F.sum("pos").cast("long").alias("sp")).collect()[0]
        il = mixture_interleave(docs, weights)
        i_row = il.agg(F.sum("rank_in_source").cast("long").alias("sr")).collect()[0]
        wall = time.time() - t0
        print(json.dumps({
            "master": spark.sparkContext.master,
            "mode": "manifest",
            "rows": n,
            "wall_s": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
            "num_committed": c_row["sp"],
            "num_aborted": i_row["sr"],
            "n_sessions": -1,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
