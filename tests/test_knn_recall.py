"""Multi-probe LSH kNN recall vs the exact brute-force baseline.

The VLDB'07 multi-probe argument: a near neighbor differing from the
query in one hyperplane sign lands in a Hamming-1 bucket; probing those
n_planes extra buckets recovers it without more tables. This test pins
measured recall@5 >= 0.9 averaged over query vectors on the driver's
sf0.01 embeddings — the documented evidence behind the knn_lsh gate's
"scales AND recalls" claim (recorded in BENCH.md)."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_multi_probe_recall_at_5(spark):
    import pyspark.sql.functions as F

    from lucene_solr_spark.datapipe.similarity import (
        knn_cosine_bruteforce,
        knn_cosine_lsh,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    qids = [r["vec_id"] for r in emb.select("vec_id").limit(10).collect()]
    recalls = []
    single_sizes = []
    for qid in qids:
        qv = [
            float(x)
            for x in emb.where(F.col("vec_id") == qid)
            .select("embedding")
            .collect()[0][0]
        ]
        exact = {
            r["vec_id"]
            for r in knn_cosine_bruteforce(emb, qv, k=5).collect()
        }
        approx = {
            r["vec_id"] for r in knn_cosine_lsh(emb, qv, k=5).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
        single_sizes.append(
            knn_cosine_lsh(
                emb, qv, k=5, n_tables=1, probe_hamming=1
            ).count()
        )
    mean_recall = sum(recalls) / len(recalls)
    print(f"multi-probe recall@5 over {len(qids)} queries: {mean_recall}")
    assert mean_recall >= 0.9, recalls


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)
def test_projection_margin(spark):
    """Knife-edge guard for the sign-test LSH (ADVICE r2): the engine
    computes `proj > 0` with a float64 numpy matmul while the DuckDB
    oracle sums CAST-to-double products in SQL aggregation order — a
    projection within rounding error of zero could flip a signature bit
    between them. Pin that the driver corpus keeps min |projection| far
    above double rounding error (~1e-16 * dim * |x|), so the
    knn_lsh/dedup_embed gates cannot be decided by summation order."""
    import numpy as np

    from lucene_solr_spark.datapipe.similarity import _plane_weight

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = np.stack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.select("embedding").collect()
        ]
    )
    dim = vecs.shape[1]
    W = np.array(
        [
            [_plane_weight(t, p, i) for i in range(dim)]
            for t in range(8)
            for p in range(8)
        ],
        dtype=np.float64,
    )
    proj = vecs @ W.T
    margin = float(np.abs(proj).min())
    print(f"min |projection| over corpus: {margin}")
    assert margin > 1e-9, margin
