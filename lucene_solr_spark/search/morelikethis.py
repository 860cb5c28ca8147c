"""MoreLikeThis — find documents similar to a given document.

Reference: lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java — extract the source doc's terms, score each as
tf(term in doc) * idf, keep the top ``max_query_terms`` (default 25)
above min-tf/min-df/max-df thresholds, then run the resulting SHOULD
BooleanQuery. idf here is MoreLikeThis's classic-similarity form
``ln(numDocs/(docFreq+1)) + 1`` (MoreLikeThis.java createQueue), distinct
from the BM25 idf used to score the final query.

Scale shape: term selection is DOC-MAJOR — re-analyze the ONE stored
text row (exactly MoreLikeThis.retrieveTerms(int docNum), which
re-analyzes the stored field when term vectors are absent) and look its
terms up in terms_stats. The inverted postings store is never touched
for source-term extraction: on a segment store, a doc_id filter over the
term-major postings view would block-decode the whole corpus for one
document. The follow-on query is the ordinary BM25 Boolean path.
"""

from __future__ import annotations

import math
from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher
from .query import BooleanClause, BooleanQuery, TermQuery

DEFAULT_MAX_QUERY_TERMS = 25  # MoreLikeThis.DEFAULT_MAX_QUERY_TERMS
DEFAULT_MIN_TERM_FREQ = 2  # MoreLikeThis.DEFAULT_MIN_TERM_FREQ
DEFAULT_MIN_DOC_FREQ = 5  # MoreLikeThis.DEFAULT_MIN_DOC_FREQ


def interesting_terms(
    searcher: Searcher,
    doc_id: int,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    text_col: str = "text",
) -> list[str]:
    """Top MLT terms of ``doc_id``, ordered by (tf*idf desc, term asc)."""
    from ..analysis.tokenizer import analyze

    idx = searcher.index
    n = idx.stats.max_doc
    row = (
        idx.docs.where(F.col("doc_id") == doc_id)
        .select(text_col)
        .collect()
    )
    if not row:
        return []
    terms_seq, _ = analyze(row[0][text_col])
    tf_counts = Counter(terms_seq)
    cand = [t for t, c in tf_counts.items() if c >= min_term_freq]
    if not cand:
        return []
    stats = idx.term_stats(sorted(cand))  # pruned terms_stats lookup
    scored = []
    for t in cand:
        df = stats.get(t, (0, 0))[0]
        if df >= min_doc_freq:
            mlt = tf_counts[t] * (math.log(float(n) / (df + 1.0)) + 1.0)
            scored.append((-mlt, t))
    scored.sort()
    return [t for _, t in scored[:max_query_terms]]


def interesting_terms_scored(
    searcher: Searcher,
    doc_id: int,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    text_col: str = "text",
) -> DataFrame:
    """mlt.interestingTerms=details (solr/core/.../handler/
    MoreLikeThisHandler.java InterestingTerm + MLTHelper): the selected
    terms WITH their tf*idf boosts, ordered by (score desc, term asc)
    — what Solr returns so callers can inspect/re-weight the generated
    query. Single-doc driver-side computation (same as term selection
    itself); result surfaced as a DataFrame (term, score)."""
    from ..analysis.tokenizer import analyze

    idx = searcher.index
    n = idx.stats.max_doc
    row = (
        idx.docs.where(F.col("doc_id") == doc_id)
        .select(text_col)
        .collect()
    )
    out: list[tuple[str, float]] = []
    if row:
        terms_seq, _ = analyze(row[0][text_col])
        tf_counts = Counter(terms_seq)
        cand = [t for t, c in tf_counts.items() if c >= min_term_freq]
        if cand:
            stats = idx.term_stats(sorted(cand))
            scored = []
            for t in cand:
                df = stats.get(t, (0, 0))[0]
                if df >= min_doc_freq:
                    mlt = tf_counts[t] * (
                        math.log(float(n) / (df + 1.0)) + 1.0
                    )
                    scored.append((-mlt, t))
            scored.sort()
            out = [(t, -s) for s, t in scored[:max_query_terms]]
    return idx.spark.createDataFrame(
        [(t, round(s, 4)) for t, s in out], "term string, score double"
    )


def more_like_this(
    searcher: Searcher,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    boost: bool = False,
    boost_factor: float = 1.0,
) -> DataFrame:
    """Top-k similar docs (excluding the source doc): (doc_id, score).

    ``boost`` = MoreLikeThis.setBoost (MoreLikeThis.java:245-300 +
    createQuery's ``tq.setBoost(boostFactor * myScore / bestScore)``):
    each SHOULD clause is weighted by its interestingness (tf*idf)
    relative to the best term, so the most characteristic source terms
    dominate ranking instead of contributing equally."""
    if boost:
        scored_terms = [
            (r["term"], float(r["score"]))
            for r in interesting_terms_scored(
                searcher, doc_id, max_query_terms, min_term_freq,
                min_doc_freq,
            ).collect()
        ]
        if not scored_terms:
            return searcher.index.spark.createDataFrame(
                [], f"doc_id long, score {searcher._score_type}"
            )
        best = max(s for _, s in scored_terms)
        q = BooleanQuery(
            [
                BooleanClause(
                    TermQuery(t, boost=boost_factor * s / best),
                    "SHOULD",
                )
                for t, s in scored_terms
            ]
        )
        scored = searcher.score(q).where(F.col("doc_id") != doc_id)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    terms = interesting_terms(
        searcher, doc_id, max_query_terms, min_term_freq, min_doc_freq
    )
    if not terms:
        return searcher.index.spark.createDataFrame(
            [], f"doc_id long, score {searcher._score_type}"
        )
    q = BooleanQuery([BooleanClause(TermQuery(t), "SHOULD") for t in terms])
    scored = searcher.score(q).where(F.col("doc_id") != doc_id)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
