"""Embedding-cosine near-dup (cosine_neardup_pairs): recall on a
clustered corpus with injected jittered duplicates, and exactness of
the verify step.

The driver's synthetic embeddings are near-random (hardest case for
LSH); production near-dups sit at cosine >= 0.9 where the hyperplane
collision math is strong. This test builds that regime explicitly:
deterministic base vectors + small-noise duplicates, then checks the
operator recovers >= 95% of the true duplicate pairs and reports only
pairs that genuinely clear the threshold.
"""

import numpy as np
import pytest


N_BASE = 120
N_DUP = 40
DIM = 64
THRESH = 0.9


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.RandomState(7)
    base = rng.normal(size=(N_BASE, DIM))
    # jittered duplicates of the first N_DUP base vectors: cosine to
    # their source concentrates near 1 - noise is 5% of vector scale
    dup = base[:N_DUP] + 0.05 * rng.normal(size=(N_DUP, DIM))
    V = np.vstack([base, dup]).astype(np.float64)
    ids = np.arange(len(V))
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T
    iu = np.triu_indices(len(V), 1)
    true_pairs = {
        (int(a), int(b))
        for a, b, c in zip(iu[0], iu[1], C[iu])
        if c >= THRESH
    }
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, V)],
        "vec_id long, embedding array<float>",
    )
    return df, true_pairs, C


def test_recall_on_clustered(clustered):
    from lucene_solr_spark.datapipe.similarity import cosine_neardup_pairs

    df, true_pairs, _ = clustered
    assert len(true_pairs) >= N_DUP  # every dup pairs with its source
    got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in cosine_neardup_pairs(df, threshold=THRESH).collect()
    }
    recall = len(got & true_pairs) / len(true_pairs)
    assert recall >= 0.95, f"recall {recall:.3f} over {len(true_pairs)}"


def test_verify_is_exact(clustered):
    """Every reported pair clears the threshold under independent
    float64 cosine (the LSH stage can only lose pairs, never invent)."""
    from lucene_solr_spark.datapipe.similarity import cosine_neardup_pairs

    df, _, C = clustered
    rows = cosine_neardup_pairs(df, threshold=THRESH).collect()
    assert rows
    for r in rows:
        c_ref = C[int(r["id_a"]), int(r["id_b"])]
        assert c_ref >= THRESH - 1e-9
        assert abs(float(r["cos"]) - c_ref) < 5e-4  # rounded to 4


def test_bucket_cap_drops_degenerate(clustered, spark):
    """max_bucket excludes mega-buckets: constant vectors all collide
    in every table; with a cap below their count they produce no
    pairs, while normal pairs survive."""
    from lucene_solr_spark.datapipe.similarity import cosine_neardup_pairs

    df, _, _ = clustered
    const = spark.createDataFrame(
        [(10_000 + i, [1.0] * DIM) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    both = df.unionByName(const)
    got = cosine_neardup_pairs(
        both, threshold=THRESH, max_bucket=25
    ).collect()
    const_ids = {10_000 + i for i in range(30)}
    assert not any(
        int(r["id_a"]) in const_ids and int(r["id_b"]) in const_ids
        for r in got
    )
    assert any(int(r["id_a"]) < N_BASE for r in got)


def test_embedding_outliers(spark):
    from lucene_solr_spark.datapipe.similarity import (
        embedding_outliers,
    )

    rows = [
        (0, [0.0, 0.0], 1),
        (1, [0.2, 0.0], 1),
        (2, [10.0, 10.0], 1),   # far outlier in group 1
        (3, [5.0, 5.0], 2),
        (4, [5.0, 5.0], 2),     # tight group 2
    ]
    d = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = embedding_outliers(d, k=5).collect()
    assert out[0]["vec_id"] == 2     # the planted outlier ranks first
    # the two identical group-2 points have identical distance; tie
    # broken by vec_id asc
    d2 = {r["vec_id"]: r["dist2"] for r in out}
    assert abs(d2[3] - d2[4]) < 1e-12
