"""SemDeDup-shape semantic dedup (datapipe/similarity.py::semantic_dedup).

Pins the three contract points the gate alone can't see:
  - injected jittered near-duplicates are marked dup, originals kept
    (keep-lowest-id policy);
  - anchor_cap >= cluster size is semantically identical to uncapped;
  - a tiny anchor_cap drops ONLY comparisons beyond the cap (a vector
    whose sole near-anchor ranks past the cap flips to kept), i.e. the
    mega-cluster guard is the documented lossy-but-bounded behavior.
"""

from __future__ import annotations

import numpy as np
import pytest


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _rng_unit(rng, dim):
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def corpus():
    """64 base vectors in 4 well-separated direction cones + 8 jittered
    near-duplicates of base vectors 20..27 (cosine > 0.95 to their
    source, ids 100..107)."""
    rng = np.random.default_rng(7)
    dim = 16
    anchors = [_rng_unit(rng, dim) for _ in range(4)]
    rows = []
    for i in range(64):
        a = anchors[i % 4]
        v = a + 0.55 * _rng_unit(rng, dim)
        rows.append((i, v / np.linalg.norm(v)))
    base = dict(rows)
    for j in range(8):
        src = base[20 + j]
        v = src + 0.05 * _rng_unit(rng, dim)
        rows.append((100 + j, v / np.linalg.norm(v)))
    return rows


def _run(spark, rows, **kw):
    from lucene_solr_spark.datapipe.similarity import semantic_dedup

    out = semantic_dedup(_emb_df(spark, rows), **kw).collect()
    return {r["vec_id"]: (r["centroid_id"], r["is_dup"]) for r in out}


def test_jittered_duplicates_marked(spark, corpus):
    res = _run(spark, corpus, threshold=0.95, n_centroids=4)
    assert len(res) == len(corpus)
    # every jittered copy is a dup; its lower-id source is kept
    for j in range(8):
        assert res[100 + j][1] is True, f"copy {100 + j} not marked"
        assert res[20 + j][1] is False, f"source {20 + j} dropped"
    # same cluster as the source (the whole point of the coarse stage)
    for j in range(8):
        assert res[100 + j][0] == res[20 + j][0]


def test_cap_at_least_cluster_size_is_exact(spark, corpus):
    uncapped = _run(spark, corpus, threshold=0.95, n_centroids=4,
                    anchor_cap=10**6)
    capped = _run(spark, corpus, threshold=0.95, n_centroids=4,
                  anchor_cap=len(corpus))
    assert uncapped == capped


def test_tiny_cap_drops_only_over_cap_comparisons(spark, corpus):
    """With anchor_cap=1 only the single lowest-id member of each
    cluster can witness a duplicate; every dup flagged under the tiny
    cap must also be flagged uncapped (cap never ADDS dups), and any
    vector kept under the tiny cap but dropped uncapped must owe its
    uncapped drop to an anchor ranked past the cap."""
    full = _run(spark, corpus, threshold=0.95, n_centroids=4)
    tiny = _run(spark, corpus, threshold=0.95, n_centroids=4,
                anchor_cap=1)
    for vid, (_, dup) in tiny.items():
        if dup:
            assert full[vid][1] is True
    lost = [v for v in full if full[v][1] and not tiny[v][1]]
    # the jittered copies' sources (ids 20..27) are never rank-1 in a
    # 4-cone cluster of 16+ members, so the tiny cap must lose them
    assert set(lost) >= {100 + j for j in range(8)}
