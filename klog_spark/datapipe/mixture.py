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


def weighted_sample(docs: DataFrame, k: int, weight_col: str,
                    by: list[str] | None = None,
                    id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES),
    derandomized: each row gets key = u^(1/w) where u is a deterministic
    uniform in (0,1) built from the java-hash of the sha256 of its id, and
    the k largest keys per stratum ARE a weight-proportional sample. No
    RNG state, no seeds to ship to executors — the same sample on every
    engine, run, and cluster size (the property mixture_sample provides
    for share-based curation, here for probability-proportional-to-size
    selection, e.g. quality-weighted corpus subsetting).

    Rows with weight <= 0 or null can never be sampled (A-ES contract).

    Scale shape: global sampling (``by=None``) compiles to sort+limit —
    Spark's TakeOrdered computes per-partition partial top-k, shuffling
    only k rows per partition; per-stratum sampling is one window keyed on
    the strata (bounded by stratum cardinality, the natural shard).
    """
    from ..javahash import java_hash_u32_expr

    u = (java_hash_u32_expr(F.sha2(F.col(id_col).cast("string"), 256))
         .cast("double") + 0.5) / float(1 << 32)
    key = F.pow(u, 1.0 / F.col(weight_col).cast("double"))
    sampled = docs.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_es_key", key)
    if not by:
        return (
            sampled.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
            .limit(k)
            .drop("_es_key")
        )
    w = Window.partitionBy(*by).orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
    return (
        sampled.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_es_key", "_rn")
    )


def token_budget_mixture(docs: DataFrame, weights: dict[str, float],
                         total_tokens: int, max_epochs: int = 4,
                         default_weight: float = 0.0, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Token-budget mixture with per-source epoch repetition — the data
    recipe step that turns source weights + a token budget into a concrete
    training set. Each source gets ``budget = int(weight * total_tokens)``
    whitespace tokens; a source whose token mass is below its budget is
    REPEATED (the LLM-recipe "epochs"): ``n_full = min(budget div mass,
    max_epochs)`` full passes, then the leftover budget is filled greedily
    in content-hash order (budget-crossing document included, exactly like
    :func:`mixture_sample`) as the final partial epoch. A source whose full
    passes hit ``max_epochs`` is capped there — no partial epoch on top,
    mirroring the repetition caps data recipes impose to avoid memorizing
    tiny sources.

    Deterministic everywhere: no RNG, ordering is the same content-hash
    used by mixture_sample, and every arithmetic step is integer (token
    counts, div, prefix sums). Returns one row per (document, epoch):
    (doc_id, source, epoch, n_tokens), epoch = 0..n_full (partial last).

    Scale shape: one corpus pass for token counts, a tiny per-source
    mass/budget aggregate broadcast back, ``explode(sequence(...))`` for
    the full epochs (bounded by max_epochs), and ONE per-source
    prefix-sum window for the partial epoch — the window is the natural
    source shard, same bound as mixture_sample.
    """
    from ..javahash import java_hash_u32_expr
    from .textstats import _WORDS

    budget_map = F.create_map(
        *[lit for s, w in sorted(weights.items())
          for lit in (F.lit(s), F.lit(int(w * total_tokens)))]
    )
    budget = F.coalesce(
        budget_map[F.col("source")], F.lit(int(default_weight * total_tokens))
    ).cast("long")
    n_tok = F.size(F.filter(_WORDS(text_col), lambda w: w != "")).cast("long")
    h = F.pmod(java_hash_u32_expr(F.sha2(F.col(text_col), 256)), F.lit(HASH_MOD))
    d = docs.select(
        F.col(id_col).alias("doc_id"), "source",
        n_tok.alias("n_tokens"), h.alias("_h"), budget.alias("_budget"),
    )
    mass = d.groupBy("source").agg(F.sum("n_tokens").alias("_mass"))
    j = d.join(F.broadcast(mass), "source")
    n_full = F.least(
        F.when(F.col("_mass") > 0, F.expr("_budget div _mass")).otherwise(F.lit(0)),
        F.lit(max_epochs),
    ).cast("long")
    full = (
        j.filter(n_full >= 1)
        .select(
            "doc_id", "source", "n_tokens",
            F.explode(F.sequence(F.lit(0).cast("long"), n_full - 1)).alias("epoch"),
        )
    )
    w = Window.partitionBy("source").orderBy("_h", "doc_id")
    prior = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    rem = (
        j.filter(n_full < max_epochs)
        .withColumn("_prior", prior)
        .filter(F.col("_prior") < F.col("_budget") - n_full * F.col("_mass"))
        .select("doc_id", "source", "n_tokens", n_full.alias("epoch"))
    )
    return full.unionByName(rem).select("doc_id", "source", "epoch", "n_tokens")
