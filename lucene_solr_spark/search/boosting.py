"""BoostingQuery and CustomScoreQuery — score-shaping query wrappers.

Reference mapping:
  - BoostingQuery (lucene/queries/src/java/org/apache/lucene/queries/
    BoostingQuery.java:40-83): rewrites to BooleanQuery(match MUST,
    context SHOULD with boost 0) under a coord override — one clause
    matched -> 1.0, both -> the supplied boost. Net semantics: the doc
    set is exactly the match query's; a doc also matching the context
    query has its score multiplied by ``boost`` (typically < 1 to
    demote), and the context query contributes nothing additive.
  - CustomScoreQuery / CustomScoreProvider (lucene/queries/src/java/
    org/apache/lucene/queries/CustomScoreQuery.java,
    CustomScoreProvider.java:73-110): default customScore =
    subQueryScore * product of the value-source scores (one multiply
    per value source; no sources -> subQueryScore unchanged).

Spark shape: the match/sub query is scored once by the Searcher
(whatever pruned/exhaustive plan it picks for all-matches scoring);
the context set or value-source columns arrive via one left join, the
reshaped score is a pure Catalyst expression, and the top-k is a
TakeOrderedAndProject. No extra shuffle beyond the single doc_id join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher
from .funcquery import compile_func
from .query import Query


def boosting_topk(
    searcher: Searcher,
    match: Query,
    context: Query,
    boost: float,
    k: int = 10,
) -> DataFrame:
    """Top-k for BoostingQuery(match, context, boost): match-query BM25
    score, multiplied by ``boost`` iff the doc also matches the context
    query (BoostingQuery.java:57-72 coord table)."""
    m = searcher.score(match)
    ctx = (
        searcher.score(context)
        .select("doc_id")
        .distinct()
        .withColumn("_ctx", F.lit(True))
    )
    scored = m.join(ctx, "doc_id", "left").select(
        "doc_id",
        (
            F.col("score")
            * F.when(F.col("_ctx"), F.lit(float(boost))).otherwise(
                F.lit(1.0)
            )
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def custom_score_topk(
    searcher: Searcher,
    q: Query,
    value_sources: list[str],
    k: int = 10,
    docs: DataFrame | None = None,
    now=None,
) -> DataFrame:
    """Top-k for CustomScoreQuery(q, valSrcQueries...): subquery score
    times the product of each value-source expression evaluated on the
    matching doc (CustomScoreProvider.java:73-78 default combine).
    Value sources may reference stored-field columns of ``docs``
    (default: the index's doc frame) and the full funcquery registry
    incl. query()/scale() attachments."""
    sub = searcher.score(q)
    d = docs if docs is not None else searcher.index.docs
    frame = sub.join(d, "doc_id")
    score = F.col("score")
    for expr in value_sources:
        col, attachments = compile_func(
            expr, searcher=searcher, docs=d, now=now
        )
        for alias, adf in attachments:
            frame = frame.join(adf, "doc_id", "left")
        score = score * col
    scored = frame.select("doc_id", score.alias("score"))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
