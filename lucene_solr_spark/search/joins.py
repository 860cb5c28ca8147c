"""Scored joins — JoinUtil score modes and scored parent/child block
joins (SURVEY.md §2.4; the r3 verdict's missing-feature #2).

References:
  - lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:47-51
    (createJoinQuery with ScoreMode None/Avg/Max/Total): docs matching
    ``fromQuery`` are grouped by their ``fromField`` value; every to-side
    doc whose ``toField`` holds a collected value matches, scored by the
    aggregate of the from-side doc scores for that value
    (TermsWithScoreCollector).
  - lucene/join/src/java/org/apache/lucene/search/join/
    ToParentBlockJoinQuery.java: child hits are aggregated onto their
    parent doc with the same Avg/Max/Total modes.

Spark shape: the from-side score aggregation is ONE
groupBy(key).agg(...) — partial+final hash agg, so a hot join value
never concentrates raw rows on a reducer — followed by a key-equi join
to the to side (broadcastable when the collected key set is small,
exactly Lucene's collected-terms BooleanQuery rewrite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MODES = {
    "none": lambda c: F.lit(1.0),
    "avg": F.avg,
    "max": F.max,
    "total": F.sum,
}


def _agg_score(mode: str):
    try:
        return _MODES[mode]
    except KeyError:
        raise ValueError(
            f"score_mode must be one of {sorted(_MODES)}, got {mode!r}"
        ) from None


def join_scored(
    from_scored: DataFrame,
    from_key: str,
    to_df: DataFrame,
    to_key: str,
    score_mode: str = "avg",
) -> DataFrame:
    """JoinUtil.createJoinQuery analogue with score modes.

    ``from_scored``: (``from_key``, score) rows — the from-side query's
    scored matches already joined to their join-field value.
    Returns the to-side rows whose ``to_key`` was collected, plus
    ``score`` = avg/max/total of the from-side scores per key
    (ScoreMode.None scores 1.0, the r3 constant-score behavior).
    """
    aggf = _agg_score(score_mode)
    per_key = from_scored.groupBy(from_key).agg(
        (
            F.lit(1.0)
            if score_mode == "none"
            else aggf("score")
        ).alias("score")
    )
    if from_key != to_key:
        per_key = per_key.withColumnRenamed(from_key, to_key)
    return to_df.join(per_key, to_key)


def block_join_parent_scores(
    child_scored: DataFrame,
    parent_key: str,
    score_mode: str = "max",
) -> DataFrame:
    """ToParentBlockJoinQuery analogue: child hits (rows of
    (``parent_key``, score)) aggregated onto their parent —
    (parent_key, score) with score = avg/max/total of the child scores.
    Lucene walks each parent's contiguous child block; the relational
    equivalent is the same partial+final groupBy on the parent key."""
    aggf = _agg_score(score_mode)
    return child_scored.groupBy(parent_key).agg(
        (
            F.lit(1.0)
            if score_mode == "none"
            else aggf("score")
        ).alias("score")
    )


def block_join_child_scores(
    parent_scored: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_cols: list[str],
) -> DataFrame:
    """ToChildBlockJoinQuery analogue (lucene/join/.../join/
    ToChildBlockJoinQuery.java:40-60): the join runs DOWNWARD — a
    parent-matching query admits every child of a matching parent,
    and with doScores each child carries its PARENT's score
    (ToChildBlockJoinScorer: childScore = parentScore). One key-equi
    join; the parent side is the small collected set, so it
    broadcasts exactly like the collected-terms rewrite."""
    return children.select(*child_cols, parent_key).join(
        F.broadcast(parent_scored), parent_key
    ).select(*child_cols, parent_key, "score")
