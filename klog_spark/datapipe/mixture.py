"""Domain-mixture sampling: deterministic corpus curation to target weights.

A pre-training corpus is rarely used as-is — the pipeline samples each
source (web/books/code/...) to a target share of the token budget. This
operator does that deterministically: within each source, documents are
ordered by a content-hash (java-hash of the sha256 digest — bit-replicable
in any engine, stable across runs, and uncorrelated with document order),
and the running-character prefix sum admits documents until the source's
budget is crossed. The same document set comes out on every engine, every
run, every cluster size.

Scale shape: one window per source partition (the natural shard; skew
bounded by source size), no sampling RNG state, no driver decisions. The
same construction extends to token budgets by swapping the weight column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_000


def mixture_sample(docs: DataFrame, weights: dict[str, float], total_chars: int,
                   default_weight: float = 0.0, text_col: str = "text",
                   id_col: str = "doc_id", size_col: str = "n_chars") -> DataFrame:
    """Select documents per source up to ``floor(weight * total_chars)``
    characters (greedy in content-hash order; the budget-crossing document
    is included, mirroring the packing operator's streaming semantics).

    ``weights``: explicit share per source; sources not listed get
    ``default_weight``. Returns the selected rows (doc_id, source, size).
    """
    from ..javahash import java_hash_u32_expr

    budget_map = F.create_map(
        *[lit for s, w in sorted(weights.items())
          for lit in (F.lit(s), F.lit(int(w * total_chars)))]
    )
    budget = F.coalesce(
        budget_map[F.col("source")], F.lit(int(default_weight * total_chars))
    )
    h = F.pmod(java_hash_u32_expr(F.sha2(F.col(text_col), 256)), F.lit(HASH_MOD))
    w = Window.partitionBy("source").orderBy("_h", id_col)
    prior = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return (
        docs.withColumn("_h", h)
        .withColumn("_prior", prior)
        .filter(F.col("_prior") < budget)
        .select(F.col(id_col).alias("doc_id"), "source",
                F.col(size_col).cast("long").alias(size_col))
    )
