"""Model-based quality filtering: distributed logistic regression.

The trained-classifier stage of LLM data pipelines — GPT-3 trained a
logistic-regression quality model to separate curated reference text
from raw CommonCrawl (Brown et al. 2020, appendix A); LLaMA filtered
CommonCrawl with a Wikipedia-reference classifier; FineWeb-Edu
thresholds a learned score. It is the step AFTER the heuristic rule
sets (Gopher/C4, ``functions/text_analysis.py``): instead of
hand-tuned thresholds, fit weights over the same analysis-derived
features against a labeled slice, then score and threshold the whole
corpus.

The feature layer reuses the engine's own analysis-chain semantics
(raw token stream + the StandardAnalyzer stopword table,
lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardAnalyzer.java:60-90 — the same table every search gate
consumes), so "train a quality model over the index's analysis
features" is the natural companion workflow.

Scale shape (the part that matters at 100 TB):
  - featurization and INFERENCE are pure Catalyst projections —
    whole-stage codegen, zero Python on the scoring path, which is
    the path that actually runs over the full corpus;
  - training is iteratively-reweighted least squares (Newton steps on
    the L2-regularized logistic loss — the classic GLM fit, ~8
    iterations to machine convergence vs hundreds for first-order GD)
    where each iteration is ONE map-only Arrow pass emitting
    per-partition partials: gradient (d+1 float64) + Hessian
    ((d+1)^2 float64) + loss. No shuffle — partials are additive and
    the driver combines a few KB per partition;
  - determinism: partials carry ``spark_partition_id`` and the driver
    sums them in sorted-pid order, so the fit is bit-stable for a
    fixed input partitioning (the ivf_train_kmeans contract,
    ``datapipe/similarity.py:434``). Standardization moments come from
    the same partial machinery, not a float-order-dependent SQL agg.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.text_analysis import quality_features

#: feature names, in model order (bias is prepended internally)
FEATURE_COLS = [
    "log_chars",
    "log_tokens",
    "stop_ratio",
    "alnum_ratio",
    "mean_token_len",
]


def with_lr_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the FEATURE_COLS as pure Catalyst projections (log1p-scaled
    counts + the ratio features of ``quality_features``)."""
    feats = quality_features(F.col(text_col))
    return (
        df.withColumn("log_chars", F.log1p(feats["n_chars"]))
        .withColumn("log_tokens", F.log1p(feats["n_tokens"]))
        .withColumn("stop_ratio", feats["stop_ratio"])
        .withColumn("alnum_ratio", feats["alnum_ratio"])
        .withColumn("mean_token_len", feats["mean_token_len"])
    )


_PARTIALS_SCHEMA = (
    "pid long, n long, grad array<double>, hess array<double>, loss double"
)


def _combine_sorted(rows, d: int):
    """Sum per-partition partials in sorted-pid order (bit-stable)."""
    g = np.zeros(d, dtype=np.float64)
    H = np.zeros((d, d), dtype=np.float64)
    loss = 0.0
    n = 0
    for r in sorted(rows, key=lambda r: r["pid"]):
        g += np.asarray(r["grad"], dtype=np.float64)
        H += np.asarray(r["hess"], dtype=np.float64).reshape(d, d)
        loss += float(r["loss"])
        n += int(r["n"])
    return g, H, loss, n


def train_quality_lr(
    df: DataFrame,
    label_col: str,
    feature_cols: list[str] | None = None,
    n_iter: int = 8,
    l2: float = 1e-3,
) -> dict:
    """Fit an L2-regularized logistic regression with distributed
    Newton/IRLS steps.

    ``df`` must already carry ``feature_cols`` (see
    :func:`with_lr_features`) and an integer/boolean ``label_col``.
    Returns ``{"weights", "means", "stds", "losses", "n"}`` where
    ``weights[0]`` is the bias over STANDARDIZED features.
    """
    feature_cols = list(feature_cols or FEATURE_COLS)
    d = len(feature_cols) + 1

    src = df.select(
        F.spark_partition_id().alias("pid"),
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double") for c in feature_cols],
    ).localCheckpoint()

    # ---- standardization moments via the same additive-partials path
    # (NOT a SQL agg: float sum order there is not partition-sorted) --
    def moments(batches):
        s = np.zeros(d - 1, dtype=np.float64)
        s2 = np.zeros(d - 1, dtype=np.float64)
        n = 0
        pid = -1
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["pid"].iloc[0])
            X = pdf[feature_cols].to_numpy(dtype=np.float64)
            s += X.sum(axis=0)
            s2 += (X * X).sum(axis=0)
            n += len(pdf)
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "n": [n],
                    "grad": [s.tolist()],
                    "hess": [np.diag(s2).ravel().tolist()],
                    "loss": [0.0],
                }
            )

    rows = src.mapInPandas(moments, _PARTIALS_SCHEMA).collect()
    s, S2, _, n_total = _combine_sorted(rows, d - 1)
    means = s / max(n_total, 1)
    var = np.diag(S2) / max(n_total, 1) - means * means
    stds = np.sqrt(np.maximum(var, 0.0))
    stds = np.where(stds < 1e-12, 1.0, stds)

    # ---- Newton iterations -----------------------------------------
    w = np.zeros(d, dtype=np.float64)
    losses: list[float] = []
    for _ in range(n_iter):
        wk, mk, sk = w.copy(), means.copy(), stds.copy()

        def partials(batches, wk=wk, mk=mk, sk=sk):
            g = np.zeros(d, dtype=np.float64)
            H = np.zeros((d, d), dtype=np.float64)
            loss = 0.0
            n = 0
            pid = -1
            for pdf in batches:
                if not len(pdf):
                    continue
                pid = int(pdf["pid"].iloc[0])
                X = pdf[feature_cols].to_numpy(dtype=np.float64)
                Xs = (X - mk) / sk
                Z = np.hstack([np.ones((len(Xs), 1)), Xs])
                y = pdf["_y"].to_numpy(dtype=np.float64)
                z = Z @ wk
                p = 1.0 / (1.0 + np.exp(-z))
                g += Z.T @ (p - y)
                r = np.clip(p * (1.0 - p), 1e-9, None)
                H += (Z * r[:, None]).T @ Z
                # numerically-stable log-loss: log(1+e^z) - y z
                loss += float(
                    np.sum(np.logaddexp(0.0, z) - y * z)
                )
                n += len(pdf)
            if n:
                yield pd.DataFrame(
                    {
                        "pid": [pid],
                        "n": [n],
                        "grad": [g.tolist()],
                        "hess": [H.ravel().tolist()],
                        "loss": [loss],
                    }
                )

        rows = src.mapInPandas(partials, _PARTIALS_SCHEMA).collect()
        g, H, loss, _ = _combine_sorted(rows, d)
        # L2 on non-bias weights
        reg = l2 * n_total
        g[1:] += reg * w[1:]
        H[1:, 1:] += reg * np.eye(d - 1)
        loss += 0.5 * reg * float(w[1:] @ w[1:])
        losses.append(loss / max(n_total, 1))
        w = w - np.linalg.solve(H, g)

    return {
        "weights": w,
        "means": means,
        "stds": stds,
        "losses": losses,
        "n": n_total,
        "feature_cols": feature_cols,
    }


def lr_score_col(model: dict) -> Column:
    """Pure-Catalyst sigmoid score under a trained model — the
    inference path is whole-stage codegen (zero Python at 100 TB)."""
    w = model["weights"]
    means = model["means"]
    stds = model["stds"]
    z: Column = F.lit(float(w[0]))
    for i, c in enumerate(model["feature_cols"]):
        z = z + F.lit(float(w[i + 1])) * (
            (F.col(c) - F.lit(float(means[i]))) / F.lit(float(stds[i]))
        )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def quality_filter_lr(
    df: DataFrame, model: dict, threshold: float = 0.5
) -> DataFrame:
    """Score every row JVM-side and keep rows above ``threshold`` —
    the corpus-scale filter stage (map-only, no shuffle)."""
    return df.withColumn("lr_score", lr_score_col(model)).where(
        F.col("lr_score") >= F.lit(float(threshold))
    )
