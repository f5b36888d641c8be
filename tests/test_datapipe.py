"""Training-data pipeline operators: dedup recall, ANN recall, text stats,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def dup_corpus(spark):
    from klog_spark.entry_queries import _dup_corpus

    return _dup_corpus(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup_finds_planted_dups(dup_corpus):
    from klog_spark.datapipe.dedup import exact_duplicates

    rows = exact_duplicates(dup_corpus).collect()
    # every doc_id % 10 == 0 got one exact copy -> both members flagged
    ids = {r["doc_id"] for r in rows}
    assert all(r["group_size"] == 2 for r in rows)
    originals = {r["keep_doc_id"] for r in rows}
    assert all(k % 10 == 0 and k < 1000000 for k in originals)
    assert all((i % 10 == 0) for i in ids if i < 1000000)


def test_minhash_recall_vs_exact_jaccard(dup_corpus):
    from klog_spark.datapipe.dedup import minhash_dedup, ngram_jaccard_pairs

    exact = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(dup_corpus, n=3, threshold=0.8).collect()
    }
    mh = {(r["id1"], r["id2"]) for r in minhash_dedup(dup_corpus, threshold=0.7).collect()}
    assert exact, "fixture must contain high-jaccard pairs"
    recall = len(exact & mh) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}"


def test_simhash_finds_near_dups(dup_corpus):
    from klog_spark.datapipe.dedup import simhash_near_pairs

    pairs = {(r["id1"], r["id2"]) for r in simhash_near_pairs(dup_corpus, max_hamming=3).collect()}
    # exact copies have hamming 0 and must all be found
    exact_pairs = {
        (r["doc_id"] - 1000000, r["doc_id"])
        for r in dup_corpus.filter((F.col("doc_id") >= 1000000) & (F.col("doc_id") < 2000000)).collect()
    }
    assert exact_pairs <= pairs


def test_embedding_near_dups_planted(spark, emb):
    from klog_spark.datapipe.dedup import embedding_near_dups

    dup = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dup)
    rows = embedding_near_dups(corpus, threshold=0.95).collect()
    planted = {(r["vec_id"] - 100000, r["vec_id"]) for r in dup.collect()}
    got = {(r["id1"], r["id2"]) for r in rows}
    assert planted == got  # identical vectors, nothing else is close


def test_ann_lsh_recall_vs_brute_force(emb):
    from klog_spark.datapipe.similarity import brute_force_topk, lsh_topk

    queries = [(r["vec_id"], list(r["embedding"])) for r in emb.filter(F.col("vec_id") < 3).collect()]
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["qid"], set()).add(r["vec_id"])
    # rank-1 must be the query itself (cosine 1.0 with itself in corpus)
    for r in approx:
        if r["rank"] == 1:
            assert r["vec_id"] == r["qid"]
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / 10 for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.2  # 4 planes = 16 buckets over 500 vecs


def test_brute_force_topk_is_exact(emb):
    from klog_spark.datapipe.similarity import brute_force_topk
    import numpy as np

    queries = [(r["vec_id"], list(r["embedding"])) for r in emb.filter(F.col("vec_id") == 0).collect()]
    got = [(r["vec_id"], r["rank"]) for r in brute_force_topk(emb, queries, k=5).collect()]
    all_vecs = emb.collect()
    q = np.array(queries[0][1], dtype=np.float64)
    q /= np.linalg.norm(q)
    sims = []
    for r in all_vecs:
        v = np.array(r["embedding"], dtype=np.float64)
        sims.append((r["vec_id"], float(v @ q / np.linalg.norm(v))))
    want = [(vid, i + 1) for i, (vid, _) in enumerate(sorted(sims, key=lambda t: (-t[1], t[0]))[:5])]
    assert sorted(got, key=lambda t: t[1]) == want


def test_textstats_shapes(docs):
    from klog_spark.datapipe.textstats import lang_id, quality_scores, token_counts

    n = docs.count()
    assert token_counts(docs).count() == n
    q = quality_scores(docs)
    assert q.filter(F.col("stopword_ratio").isNull()).count() == 0
    langs = lang_id(docs).groupBy("lang_guess").count().collect()
    assert len(langs) >= 2  # fixture has multiple languages


def test_multimodal_plumbing(spark, docs):
    from klog_spark.datapipe.multimodal import decode_media, documents_as_media, extract_features

    media = documents_as_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == docs.count()
    by_id = {r["doc_id"]: r for r in feats}
    sample = docs.first()
    blob = sample["text"].encode()
    r = by_id[sample["doc_id"]]
    assert r["byte_len"] == len(blob)
    assert r["n_frames"] == max(1, (len(blob) + 1023) // 1024)
    assert sum(r["frame_digests"]) == sum(blob)
    with pytest.raises(NotImplementedError):
        decode_media(b"x", "image/jpeg")
