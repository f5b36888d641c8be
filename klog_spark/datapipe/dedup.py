"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine near-dup,
all over the ``documents`` / ``embeddings`` tables. Design points for the
100 TB case:

* exact dedup is a hash aggregation on a digest, never on raw text
  (shuffle carries 32 bytes/row, not documents),
* MinHash/LSH: candidate generation is an equi-join on (band, band_hash)
  buckets — the only shuffle key; no O(n^2) stage ever materializes,
* pairwise exact Jaccard runs only on LSH candidates (or, in the exact
  variant here, on shingle-join candidates with two-sided pruning),
* everything uses deterministic 64-bit hashes (xxhash64) computed JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 31-bit Mersenne prime universe: with a,b,h < 2^31, a*h + b < 2^62 stays
# inside int64 even under ANSI overflow checking
MERSENNE_PRIME = (1 << 31) - 1


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (doc_id, keep_doc_id, group_size).
    Rows only for docs in a duplicate group (size > 1); keeper = min id."""
    digests = docs.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("digest"))
    w = Window.partitionBy("digest")
    return (
        digests.withColumn("keep_doc_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "keep_doc_id", "group_size")
    )


def _word_shingles(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct word n-gram shingles per doc (lowercased, whitespace-split)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return df.withColumn("_words", words).withColumn(
        "shingle",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("_words") - n, F.lit(0))),
                    lambda i: F.array_join(F.slice("_words", i + 1, n), " "),
                )
            )
        ),
    ).drop("_words")


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id1 < id2, jaccard >= threshold).

    Candidates come from the shingle self-join (pairs sharing >= 1 shingle);
    at scale swap the candidate stage for minhash_lsh_candidates below.
    """
    sh = _word_shingles(docs.select(F.col(id_col).alias("doc_id"), text_col), text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.select(F.col("doc_id").alias("id1"), "shingle")
    b = sh.select(F.col("doc_id").alias("id2"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n_shingles").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n_shingles").alias("n2"))
    return (
        common.join(s1, "id1").join(s2, "id2")
        .withColumn("jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 64, shingle_n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash signatures: signature[i] = min over shingles of
    (a_i * h(shingle) + b_i) mod p — all JVM-side (xxhash64 + transform)."""
    import random

    rng = random.Random("minhash-seeds")
    coeffs = [(rng.randrange(1, MERSENNE_PRIME), rng.randrange(0, MERSENNE_PRIME)) for _ in range(num_hashes)]
    sh = _word_shingles(docs.select(F.col(id_col).alias("doc_id"), text_col), text_col, shingle_n)
    sh = sh.withColumn("h", F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_PRIME)))
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_PRIME)).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return mins.select("doc_id", F.array(*[f"mh_{i}" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_candidates(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs.
    The band bucket join is the ONLY shuffle; bucket sizes are bounded by
    near-duplicate cluster sizes, and AQE splits residual skew."""
    n = len(signatures.select("signature").first()["signature"])
    rows_per_band = n // bands
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.hash(F.slice("signature", i * rows_per_band + 1, rows_per_band)).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.select(F.col("doc_id").alias("id1"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def minhash_dedup(docs: DataFrame, num_hashes: int = 64, bands: int = 16,
                  shingle_n: int = 3, threshold: float = 0.5,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """MinHash-LSH near-dup pairs verified by estimated Jaccard
    (signature agreement fraction >= threshold)."""
    sigs = minhash_signatures(docs, num_hashes, shingle_n, text_col, id_col)
    cands = minhash_lsh_candidates(sigs, bands)
    s1 = sigs.select(F.col("doc_id").alias("id1"), F.col("signature").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("id2"), F.col("signature").alias("sig2"))
    est = (
        cands.join(s1, "id1").join(s2, "id2")
        .withColumn(
            "est_jaccard",
            F.size(F.arrays_zip("sig1", "sig2").alias("z"))
            .cast("double"),
        )
        .withColumn(
            "n_agree",
            F.aggregate(
                F.zip_with("sig1", "sig2", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("est_jaccard", F.col("n_agree") / F.size("sig1"))
        .filter(F.col("est_jaccard") >= threshold)
    )
    return est.select("id1", "id2", F.round("est_jaccard", 6).alias("est_jaccard"))


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document, fully JVM-side: each word contributes
    +1/-1 per bit of its xxhash64; the sign of each bit-sum forms the hash."""
    words = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    wh = docs.select(F.col(id_col).alias("doc_id"), words).withColumn("h", F.xxhash64("word"))
    bit_sums = wh.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(64)
        ]
    )
    acc = F.lit(0).cast("long")
    for i in range(64):
        acc = acc + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63))).otherwise(0)
    return bit_sums.select("doc_id", acc.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming. Candidate
    generation: 4x16-bit chunk banding (any pair within hamming 3 shares at
    least one exact chunk)."""
    sh = simhash64(docs, text_col, id_col)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("chunk_idx"),
                         F.shiftrightunsigned("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk"))
                for i in range(4)
            ])
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_idx", "c.chunk")
    a = chunks.select(F.col("doc_id").alias("id1"), F.col("simhash").alias("h1"), "chunk_idx", "chunk")
    b = chunks.select(F.col("doc_id").alias("id2"), F.col("simhash").alias("h2"), "chunk_idx", "chunk")
    cands = a.join(b, ["chunk_idx", "chunk"]).filter(F.col("id1") < F.col("id2")).select(
        "id1", "id2", "h1", "h2"
    ).distinct()
    return cands.withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))).filter(
        F.col("hamming") <= max_hamming
    ).select("id1", "id2", "hamming")


def embedding_near_dups(emb: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (id1 < id2, cosine >= threshold).
    Exact O(n^2) via self-join — correctness-scale variant; at scale, bucket
    with lsh_hyperplane_buckets first and join within buckets."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(vec_col, lambda x: x.cast("double") / norm).alias("nv"),
    )
    a = v.select(F.col("vid").alias("id1"), F.col("nv").alias("v1"))
    b = v.select(F.col("vid").alias("id2"), F.col("nv").alias("v2"))
    pairs = a.crossJoin(b).filter(F.col("id1") < F.col("id2"))
    cos = F.aggregate(F.zip_with("v1", "v2", lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z)
    return pairs.withColumn("cosine", cos).filter(F.col("cosine") >= threshold).select(
        "id1", "id2", F.round("cosine", 4).alias("cosine")
    )
