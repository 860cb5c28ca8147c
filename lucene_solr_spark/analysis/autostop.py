"""QueryAutoStopWordAnalyzer — df-derived stopwords, Spark-native.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
query/QueryAutoStopWordAnalyzer.java:75-168 — wrap a delegate analyzer
and ADD as stopwords every indexed term whose docFreq exceeds
``maxDocFreq`` (absolute) or ``maxPercentDocs`` of the corpus. The
reference reads term/df pairs off an IndexReader; here the same stats
come from one distinct-terms aggregation over the corpus (exactly the
df the index build computes), then the small hot-term set broadcasts
into the analyzer chain — at 10^12 turns the high-df tail is tiny by
definition, so the collect is bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .tokenizer import ENGLISH_STOP_WORDS, TOKEN_PATTERN, make_analyzer


def auto_stopwords(
    df: DataFrame,
    text_col: str = "text",
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
) -> frozenset[str]:
    """Terms whose document frequency exceeds the threshold
    (QueryAutoStopWordAnalyzer.addStopWords: df > maxDocFreq). df is
    counted over the standard post-stop analyzed stream — the indexed
    terms the reference's IndexReader would report."""
    if (max_doc_freq is None) == (max_percent_docs is None):
        raise ValueError(
            "exactly one of max_doc_freq / max_percent_docs required"
        )
    if max_doc_freq is None:
        max_doc_freq = int(max_percent_docs * df.count())
    terms = df.select(
        F.explode(
            F.array_distinct(
                F.filter(
                    F.regexp_extract_all(
                        F.lower(F.col(text_col)),
                        F.lit(TOKEN_PATTERN),
                        0,
                    ),
                    lambda t: ~t.isin(*sorted(ENGLISH_STOP_WORDS)),
                )
            )
        ).alias("term")
    )
    hot = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > F.lit(int(max_doc_freq)))
        .collect()
    )
    return frozenset(r["term"] for r in hot)


def auto_stopword_analyzer(
    df: DataFrame,
    text_col: str = "text",
    max_doc_freq: int | None = None,
    max_percent_docs: float | None = None,
    **analyzer_kwargs,
):
    """The wrapped analyzer: delegate chain + the df-derived stop set
    (reference semantics — auto words ADD to the delegate's stop
    list)."""
    auto = auto_stopwords(df, text_col, max_doc_freq, max_percent_docs)
    return make_analyzer(
        stop=True,
        stop_words=ENGLISH_STOP_WORDS | auto,
        **analyzer_kwargs,
    )
