"""Keyword retrieval over the document corpus — the lexical complement to
the embedding-ANN family (similarity.py): BM25 ranking, the default
first-stage retriever of every search / RAG / eval-harness pipeline.

Design points for the 100 TB case:

* the inverted structure is relational — (word, doc) postings from one
  explode, document frequencies from one word-keyed aggregation (map-side
  partial; vocabulary is Heaps-law-sized, never corpus-sized),
* queries are a small driver-side list broadcast into the postings join:
  only postings matching SOME query term survive the join, so per-query
  work is bounded by the posting lists of its terms — the inverted-index
  access pattern, expressed as an equi-join,
* determinism follows the LM convention (textstats.unigram_lm_scores):
  each (term, doc) partial score is rounded ONCE to integer micro units —
  a pure function of tf, df, doc length and the corpus constants — and
  per-document scores are INTEGER sums of those, order-independent under
  any partitioning, so a DuckDB oracle reproduces every rank bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(docs: DataFrame, queries: list[tuple[int, str]], k: int = 10,
              k1: float = 1.2, b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k document retrieval (Robertson-Sparck Jones idf,
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; Okapi tf saturation with
    length normalization ``tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))``).

    ``queries`` is a small driver-side list ``[(qid, query_text), ...]``;
    duplicate terms within a query count once (the standard bag-of-terms
    presence semantics for short keyword queries). Returns
    (qid, doc_id, rank, score_micro) for the top ``k`` documents per
    query; ties break on doc_id ascending. ``score_micro`` is the exact
    integer sum of per-term micro scores — engine-independent.

    Scale shape: one explode -> (word, doc, tf) aggregation builds the
    postings (shuffle key = word); df and doc-length tables are one
    aggregation each; the query join broadcasts |query terms| rows so only
    matching postings flow; the final top-k is one window per qid over the
    matched docs. The corpus constants (N, avgdl) are two scalar
    aggregates — both engines compute the identical exact division.
    """
    words = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                     lambda w: w != "")
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    from ..cachereg import track

    lengths = track(
        base.select("doc_id", F.size("_w").cast("long").alias("dl")).persist()
    )
    n_docs = lengths.count()
    avgdl = lengths.agg(F.avg("dl")).first()[0]
    # postings feed BOTH the document-frequency aggregate and the query
    # join; persisting them (vocab x doc postings — the inverted index, the
    # thing a retrieval system materializes anyway) keeps the corpus
    # explode + (w, doc) aggregation to ONE run instead of two
    postings = track(
        base.select("doc_id", F.explode("_w").alias("w"))
        .groupBy("w", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist()
    )
    dfreq = postings.groupBy("w").agg(F.count("*").cast("long").alias("df"))

    spark = docs.sparkSession
    qterms = sorted({(qid, t) for qid, q in queries
                     for t in q.lower().strip().split() if t})
    qdf = spark.createDataFrame(list(qterms), "qid: long, w: string")

    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * F.lit(float(k1) + 1.0)) / (
        F.col("tf")
        + F.lit(float(k1)) * (F.lit(1.0 - float(b))
                              + F.lit(float(b)) * F.col("dl") / F.lit(float(avgdl)))
    )
    scored = (
        postings.join(F.broadcast(qdf), "w")
        .join(dfreq, "w")
        .join(lengths, "doc_id")
        .select(
            "qid", "doc_id",
            F.round(idf * tf_norm * 1000000).cast("long").alias("_s"),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("_s").cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "doc_id", "rank", "score_micro")
    )
