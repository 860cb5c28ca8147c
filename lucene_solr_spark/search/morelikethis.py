"""MoreLikeThis — find documents similar to a given document.

Reference: lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java — extract the source doc's terms, score each as
tf(term in doc) * idf, keep the top ``max_query_terms`` (default 25)
above min-tf/min-df/max-df thresholds, then run the resulting SHOULD
BooleanQuery. idf here is MoreLikeThis's classic-similarity form
``ln(numDocs/(docFreq+1)) + 1`` (MoreLikeThis.java createQueue), distinct
from the BM25 idf used to score the final query.

Scale shape: term selection is one pruned postings lookup for a single
doc (bucket + term pruning in the segment store) joined to broadcast df
stats; the follow-on query is the ordinary BM25 Boolean path.
"""

from __future__ import annotations

import math

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
) -> list[str]:
    """Top MLT terms of ``doc_id``, ordered by (tf*idf desc, term asc)."""
    idx = searcher.index
    n = idx.stats.max_doc
    doc_terms = (
        idx.postings.where(F.col("doc_id") == doc_id)
        .select("term", "tf")
        .where(F.col("tf") >= min_term_freq)
    )
    scored = (
        doc_terms.join(idx.terms_stats.select("term", "df"), "term")
        .where(F.col("df") >= min_doc_freq)
        .withColumn(
            "mlt_score",
            F.col("tf")
            * (F.log(F.lit(float(n)) / (F.col("df") + 1.0)) + F.lit(1.0)),
        )
        .orderBy(F.desc("mlt_score"), F.asc("term"))
        .limit(max_query_terms)
    )
    return [r["term"] for r in scored.collect()]


def more_like_this(
    searcher: Searcher,
    doc_id: int,
    k: int = 10,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
) -> DataFrame:
    """Top-k similar docs (excluding the source doc): (doc_id, score)."""
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
