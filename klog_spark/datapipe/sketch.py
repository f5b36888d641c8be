"""K-minimum-values (KMV) distinct-count sketch.

The classic bottom-k sketch (Bar-Yossef et al. 2002): hash every value to
a uniform fraction, keep the k smallest DISTINCT hashes per group, and
estimate distinct count as (k-1) / kth_smallest_fraction (exact count
when fewer than k distinct hashes exist). Unlike HLL implementations
(approx_count_distinct), every step here is deterministic and
engine-replicable — the DuckDB gate oracle reproduces the estimate
bit-for-bit via the same java-hash fold — while keeping the sketch's
defining properties: fixed k-size state, mergeable by union+re-min.

Scale shape: stage 1 computes per-partition bottom-k candidates inside
Arrow batches (state per group never exceeds k), so the shuffle carries
at most k x partitions rows per group instead of the distinct-value set;
stage 2 is one bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

HASH_SPACE = float(1 << 32)


def kmv_distinct(df: DataFrame, value_col: str, by: list[str], k: int = 64) -> DataFrame:
    """Per-``by``-group KMV estimate: (\\*by, n_hashes, kth_hash,
    kmv_estimate). ``kmv_estimate`` is exact when the group has fewer than
    ``k`` distinct values."""
    from ..javahash import java_hash_u32_expr

    # sha256 first: raw String.hashCode of short strings is far from
    # uniform (polynomial of few chars -> small values), which wrecks the
    # order-statistic estimate; the java fold of the 64-hex digest is the
    # same well-mixed, oracle-replicable composition leakage_safe_split uses
    hashed = df.select(
        *by,
        java_hash_u32_expr(F.sha2(F.col(value_col).cast("string"), 256)).alias("_h"),
    )

    # carry each `by` column's REAL type through the partial (hardcoding
    # StringType would coerce int keys and diverge from the input schema)
    out_fields = [StructField(c, df.schema[c].dataType) for c in by]
    schema = StructType(out_fields + [StructField("_h", LongType())])

    def partial(it):
        # Fully vectorized bottom-k per group: dedup, one sort by hash,
        # then groupby(...).head(k) — no per-group Python loop, so batch
        # cost is O(rows log rows) regardless of group cardinality.
        for pdf in it:
            if not len(pdf):
                continue
            yield (
                pdf.drop_duplicates([*by, "_h"])
                .sort_values("_h", kind="stable")
                .groupby(by, sort=False, dropna=False)
                .head(k)[[*by, "_h"]]
            )

    candidates = hashed.mapInPandas(partial, schema)
    w = Window.partitionBy(*by).orderBy("_h")
    bottomk = (
        candidates.dropDuplicates([*by, "_h"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    return bottomk.groupBy(*by).agg(
        F.count("*").alias("n_hashes"),
        F.max("_h").alias("kth_hash"),
    ).select(
        *by, "n_hashes", "kth_hash",
        F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
        .otherwise(F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(HASH_SPACE)))
        .alias("kmv_estimate"),
    )


def _cms_cells(value_col: str, depth: int, width: int):
    """Exploded (d, bucket) cell coordinates for a value: java-hash of the
    d-salted sha256 digest mod width — shared by build and estimate so the
    two sides can never drift."""
    from ..javahash import java_hash_u32_expr

    digest = F.sha2(F.col(value_col).cast("string"), 256)
    return F.explode(
        F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(
                    java_hash_u32_expr(F.concat(F.lit(f"d{d}:"), digest)),
                    F.lit(width),
                ).cast("int").alias("bucket"),
            )
            for d in range(depth)
        ])
    ).alias("cell")


def cms_build(df: DataFrame, value_col: str, by: list[str] | None = None,
              depth: int = 4, width: int = 256) -> DataFrame:
    """Count-Min sketch build: a ``depth x width`` counter matrix per
    ``by`` group — (\\*by, d, bucket, cnt) rows, at most depth*width per
    group no matter how many distinct values flow in (the whole point at
    10^12 rows: the shuffle carries fixed-size sketch cells, not the
    distinct-value set). Mergeable by construction: the sketch of a union
    is the cell-wise sum of the sketches (pytest-pinned).

    Hash row d = java-hash of ``"d<d>:" || sha256(value)`` mod width —
    deterministic, engine-replicable (the same salted-fold trick as
    kmv_distinct), so estimates are oracle-checkable bit-for-bit, which an
    RNG-seeded implementation would not be.
    """
    by = by or []
    rows = df.select(*by, _cms_cells(value_col, depth, width))
    return rows.groupBy(*by, F.col("cell.d").alias("d"),
                        F.col("cell.bucket").alias("bucket")).agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimate(sketch: DataFrame, queries: DataFrame, value_col: str,
                 by: list[str] | None = None,
                 depth: int = 4, width: int = 256) -> DataFrame:
    """Point-estimate counts for the ``queries`` rows from a cms_build
    sketch: min over the depth cells each query hashes into (the classic
    CMS upper bound — exact when the row has no colliding values). Queries
    replicate depth-fold and hit the sketch via one (by, d, bucket)
    equi-join; a missing cell means a zero count.
    """
    by = by or []
    q = queries.select(
        *by, value_col, _cms_cells(value_col, depth, width)
    ).select(*by, value_col, F.col("cell.d").alias("d"),
             F.col("cell.bucket").alias("bucket"))
    joined = q.join(sketch, [*by, "d", "bucket"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(*by, value_col).agg(
        F.min("cnt").cast("long").alias("cms_count")
    )
