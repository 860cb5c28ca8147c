"""Model-based quality filtering (datapipe/classifier.py).

Independent oracle: a plain-numpy IRLS twin over the SAME standardized
design matrix — no Spark, no shared code with the production partials.
The distributed fit must match it to float64 solver tolerance.
"""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from lucene_solr_spark.datapipe.classifier import (
    FEATURE_COLS,
    lr_score_col,
    quality_filter_lr,
    train_quality_lr,
    with_lr_features,
)


def _numpy_irls(X, y, n_iter=8, l2=1e-3):
    """Independent reference fit: standardize, then Newton steps on the
    L2 logistic loss. Written against the math, not the module."""
    n = len(X)
    means = X.mean(axis=0)
    stds = X.std(axis=0)  # population std, matches the module
    stds = np.where(stds < 1e-12, 1.0, stds)
    Z = np.hstack([np.ones((n, 1)), (X - means) / stds])
    d = Z.shape[1]
    w = np.zeros(d)
    losses = []
    for _ in range(n_iter):
        z = Z @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = Z.T @ (p - y)
        r = np.clip(p * (1.0 - p), 1e-9, None)
        H = (Z * r[:, None]).T @ Z
        reg = l2 * n
        g[1:] += reg * w[1:]
        H[1:, 1:] += reg * np.eye(d - 1)
        loss = float(np.sum(np.logaddexp(0.0, z) - y * z)) + 0.5 * reg * float(
            w[1:] @ w[1:]
        )
        losses.append(loss / n)
        w = w - np.linalg.solve(H, g)
    return w, means, stds, losses


@pytest.fixture(scope="module")
def labeled_docs(spark, tiny_pdf):
    docs = tiny_pdf.copy()
    # deterministic "curated vs crawl" label correlated with the
    # stopword-ratio feature: every 3rd doc gets its text degraded to
    # digit noise (low stop_ratio, low alnum variety)
    noisy = docs["doc_id"] % 3 == 0
    docs.loc[noisy, "text"] = docs.loc[noisy, "doc_id"].map(
        lambda i: " ".join(str(1000003 * (i + j) % 997) for j in range(12))
    )
    docs["label"] = (~noisy).astype(int)
    sdf = spark.createDataFrame(docs[["doc_id", "text", "label"]]).repartition(
        5, "doc_id"
    )
    return with_lr_features(sdf).localCheckpoint()


def test_matches_numpy_irls(labeled_docs):
    model = train_quality_lr(labeled_docs, "label", n_iter=8, l2=1e-3)
    pdf = labeled_docs.select("label", *FEATURE_COLS).toPandas()
    X = pdf[FEATURE_COLS].to_numpy(dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    w, means, stds, losses = _numpy_irls(X, y)
    assert np.allclose(model["means"], means, atol=1e-9)
    assert np.allclose(model["stds"], stds, atol=1e-9)
    assert np.allclose(model["weights"], w, atol=1e-7)
    assert np.allclose(model["losses"], losses, rtol=1e-7)


def test_loss_decreases_and_separates(labeled_docs):
    model = train_quality_lr(labeled_docs, "label", n_iter=8)
    losses = model["losses"]
    assert all(b <= a + 1e-12 for a, b in zip(losses, losses[1:]))
    scored = labeled_docs.select(
        "label", lr_score_col(model).alias("s")
    ).toPandas()
    acc = ((scored["s"] >= 0.5).astype(int) == scored["label"]).mean()
    assert acc >= 0.95


def test_catalyst_score_matches_numpy(labeled_docs):
    model = train_quality_lr(labeled_docs, "label", n_iter=8)
    pdf = labeled_docs.select(
        "doc_id", *FEATURE_COLS, lr_score_col(model).alias("s")
    ).toPandas()
    X = pdf[FEATURE_COLS].to_numpy(dtype=np.float64)
    Z = np.hstack(
        [
            np.ones((len(X), 1)),
            (X - model["means"]) / model["stds"],
        ]
    )
    p = 1.0 / (1.0 + np.exp(-(Z @ model["weights"])))
    assert np.allclose(pdf["s"].to_numpy(), p, atol=1e-12)


def test_deterministic_refit(labeled_docs):
    m1 = train_quality_lr(labeled_docs, "label", n_iter=6)
    m2 = train_quality_lr(labeled_docs, "label", n_iter=6)
    assert np.array_equal(m1["weights"], m2["weights"])
    assert m1["losses"] == m2["losses"]


def test_quality_filter_threshold(labeled_docs):
    model = train_quality_lr(labeled_docs, "label", n_iter=8)
    kept = quality_filter_lr(labeled_docs, model, threshold=0.5)
    total = labeled_docs.count()
    n_kept = kept.count()
    assert 0 < n_kept < total
    # the kept slice should be overwhelmingly positive-labeled
    pos = kept.where(F.col("label") == 1).count()
    assert pos / n_kept >= 0.95
