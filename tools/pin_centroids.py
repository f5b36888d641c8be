"""Fit the SemDeDup/IVF coarse quantizer ONCE on the gate corpus and print
the centroid matrix as a Python literal to pin in entry_queries.py
(SEMDEDUP_CENTROIDS) — the train-once / apply-everywhere path (VERDICT r6
next #3, the SCORED_FILTER_WEIGHTS pattern). The pin-parity pytest
re-derives the same matrix from the live trainer, so the pinned literals
can never drift from the code that produced them.

Usage: python tools/pin_centroids.py [n_centroids]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def semdedup_gate_corpus(spark):
    """The exact corpus q_semdedup screens: sf0.01 embeddings plus exact
    copies at vec_id + 100000 for every 20th vector."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(dup)


def main(n_centroids: int = 16) -> None:
    from klog_spark.datapipe.similarity import kmeans_centroids
    from klog_spark.session import get_spark

    spark = get_spark(app_name="pin-centroids", master="local[8]", shuffle_partitions=8)
    corpus = semdedup_gate_corpus(spark)
    # identical sampling to ivf_cell_assign(train='kmeans'): first
    # sample_size vectors by id
    sample = np.array(
        [r["embedding"] for r in
         corpus.select("vec_id", "embedding").orderBy("vec_id").limit(4096).collect()],
        dtype=np.float64,
    )
    cents = kmeans_centroids(sample, n_centroids, n_iter=10, seed=7)
    print(f"# kmeans quantizer pinned from {SF_DIR} semdedup gate corpus "
          f"({len(sample)} vectors, k={n_centroids}, 10 Lloyd iters, seed 7)")
    print("SEMDEDUP_CENTROIDS = [")
    for row in cents:
        print("    [" + ", ".join(repr(float(x)) for x in row) + "],")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
