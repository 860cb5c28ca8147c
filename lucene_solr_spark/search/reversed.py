"""Leading-wildcard queries via reversed terms —
ReversedWildcardFilter.

References:
  - solr/core/src/java/org/apache/solr/analysis/
    ReversedWildcardFilter.java + ReversedWildcardFilterFactory.java:
    32-70 — index reversed copies of each token (marked with
    START_OF_HEADING, withOriginal=true) so a query with a LEADING
    wildcard can run as a trailing-wildcard over the reversed form.
  - solr/core/src/java/org/apache/solr/search/SolrQueryParser.java:
    196-230 getWildcardQuery — when the field's chain has the factory
    and ``shouldReverse(pattern)`` (wildcard early in the pattern),
    the parser reverses the pattern automaton and queries the
    reversed terms.

Why this matters at 10^12 docs: a leading wildcard ('*ology') cannot
use the term dictionary's ordering — it is a full dictionary scan.
Reversing turns it into a PREFIX query ('ygolo*') whose literal head
prunes by parquet min/max on the reversed term column, exactly the
FST-prefix walk the reference gets. The reversed dictionary here is a
derived column (``reverse(term)``); a production deployment persists
terms_stats WITH the reversed column so the scan prunes on row-group
stats (the withOriginal=true double-indexing trade, paid once at
build).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import MULTITERM_REWRITE_CAP, Searcher


def should_reverse(pattern: str, max_pos_asterisk: int = 2,
                   max_pos_question: int = 1) -> bool:
    """ReversedWildcardFilterFactory.shouldReverse: reverse when a '*'
    appears at 1-based position <= maxPosAsterisk or a '?' at
    <= maxPosQuestion (leading-wildcard shapes)."""
    a = pattern.find("*")
    q = pattern.find("?")
    return (0 <= a < max_pos_asterisk) or (0 <= q < max_pos_question)


def _wild_rx(pattern: str) -> str:
    parts = [
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
        for ch in pattern
    ]
    return "^" + "".join(parts) + "$"


def leading_wildcard_docs(
    searcher: Searcher, pattern: str
) -> DataFrame:
    """Constant-score doc set for a leading-wildcard pattern, answered
    over the reversed dictionary: the pattern is reversed (wildcards
    and all — '*can' -> 'nac*'), its literal HEAD prunes the reversed
    terms by prefix, and the reversed-pattern regex removes false
    positives (SolrQueryParser.java:213-218)."""
    if not should_reverse(pattern):
        raise ValueError(
            f"{pattern!r} has no leading wildcard — use the ordinary "
            "wildcard path"
        )
    rev = pattern[::-1]
    lead = ""
    for ch in rev:
        if ch in "*?":
            break
        lead += ch
    cand = searcher.index.terms_stats.withColumn(
        "rterm", F.reverse(F.col("term"))
    )
    if lead:
        cand = cand.where(F.col("rterm").startswith(lead))
    matched = cand.where(F.col("rterm").rlike(_wild_rx(rev)))
    rows = matched.select("term").limit(MULTITERM_REWRITE_CAP + 1).collect()
    if not rows:
        return searcher.index.spark.createDataFrame([], "doc_id long")
    if len(rows) <= MULTITERM_REWRITE_CAP:
        src = searcher._postings_for([r["term"] for r in rows])
    else:
        src = searcher.index.postings.join(
            F.broadcast(matched.select("term")), "term", "left_semi"
        )
    return src.select("doc_id").distinct()
