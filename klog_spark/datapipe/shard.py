"""Deterministic corpus shuffle and shard-manifest export.

The last step of every training-data pipeline: give the curated corpus a
reproducible global random order, cut it into fixed shards, and emit a
manifest the trainer (and the auditor) can verify shards against. The
"random" order here is a seeded hash permutation — no RNG state, so the
same (corpus, seed) produces the identical order on any cluster size,
partitioning, or engine, which is what makes a DuckDB oracle (and a
byte-level re-audit months later) possible.

Scale shape: the permutation is ``ORDER BY hash(seed:doc_id)`` — shard
assignment is an embarrassingly parallel projection, and the
position-within-shard window is partitioned BY SHARD, so its sort is
bounded by corpus_size / n_shards. Operationally you pick ``n_shards`` to
make that ~0.5-2 GB (100k+ shards at 100 TB), the same per-shard bound
``tokens.pack_sequences`` uses for its prefix-sum. The hash is uniform, so
shards are balanced without salting.

Hash convention (CLAUDE.md): ``hash_fn='xxhash64'`` is the throughput
default (one 64-bit JVM hash); ``hash_fn='java32'`` (javahash fold, with a
doc_id tiebreak for its 32-bit collision space) is the gate-verified
variant DuckDB can replicate exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..javahash import java_hash_u32_expr

U32 = 4_294_967_296


def _shuffle_hash(seed: str, id_col: str, hash_fn: str):
    key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    if hash_fn == "xxhash64":
        return F.xxhash64(key)
    if hash_fn == "java32":
        return java_hash_u32_expr(key)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def deterministic_shuffle(docs: DataFrame, seed: str, n_shards: int,
                          id_col: str = "doc_id",
                          hash_fn: str = "xxhash64") -> DataFrame:
    """Assign every document a shard and a position within it under the
    seeded hash permutation. Output = input columns + ``shard_id`` (int) +
    ``position`` (long, 0-based dense within shard, ordered by the hash
    with an ``id_col`` tiebreak so 32-bit collisions stay deterministic).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _shuffle_hash(seed, id_col, hash_fn)
    out = docs.withColumn("_h", h).withColumn(
        "shard_id", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return out.withColumn(
        "position", (F.row_number().over(w) - 1).cast("long")
    ).drop("_h")


def shard_manifest(shuffled: DataFrame, text_col: str = "text",
                   hash_fn: str = "xxhash64") -> DataFrame:
    """Per-shard audit manifest over a ``deterministic_shuffle`` output:
    doc count, total text bytes, max position (= n_docs-1 iff positions are
    a dense 0-based permutation — the manifest exposes both so the check is
    one comparison), and an ORDER-INDEPENDENT content checksum (sum of
    per-doc content hashes mod 2^32) so a re-shuffle with a different seed
    still checksums identically per corpus, and any dropped/duplicated/
    corrupted document changes it.

    Overflow note: the checksum sums u32 values in a BIGINT, exact while a
    shard holds < 2^31 documents — orders of magnitude above the 0.5-2 GB
    shard sizing the module contract prescribes.
    """
    if hash_fn == "xxhash64":
        content_h = F.pmod(F.xxhash64(F.col(text_col)), F.lit(U32))
    elif hash_fn == "java32":
        content_h = java_hash_u32_expr(F.col(text_col))
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return (
        shuffled.select("shard_id", "position", content_h.alias("_ch"),
                        F.length(text_col).cast("long").alias("_len"))
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_len").cast("long").alias("n_chars"),
            F.max("position").alias("max_position"),
            F.pmod(F.sum("_ch"), F.lit(U32)).cast("long").alias("content_checksum"),
        )
    )


def corpus_diff(old: DataFrame, new: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Snapshot diff between two corpus versions — the audit step of an
    incremental curation pipeline (what changed between yesterday's corpus
    and today's re-run?): every doc_id present in either version labeled
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, text
    digest differs) or ``unchanged``.

    Returns (doc_id, status). Scale shape: both sides reduce to
    (doc_id, 32-byte sha256) projections before the one full-outer
    equi-join on doc_id — the shuffle carries digests, never text, and the
    join key is the natural bucketing/partitioning column of a stored
    corpus, so with bucketed snapshots (sources/bucketed.py) the diff runs
    with zero Exchange. Status counts are one further groupBy for
    dashboards; the row-level output is what feeds a selective
    re-processing of ``added``+``changed``.
    """
    o = old.select(F.col(id_col).alias("doc_id"),
                   F.sha2(F.col(text_col), 256).alias("_od"))
    n = new.select(F.col(id_col).alias("doc_id"),
                   F.sha2(F.col(text_col), 256).alias("_nd"))
    return (
        o.join(n, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("_od").isNull(), F.lit("added"))
            .when(F.col("_nd").isNull(), F.lit("removed"))
            .when(F.col("_od") == F.col("_nd"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )
