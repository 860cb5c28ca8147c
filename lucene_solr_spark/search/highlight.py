"""Highlighting — snippet extraction for matched docs.

Reference: lucene/highlighter/src/java/org/apache/lucene/search/highlight/
Highlighter.java + SimpleHTMLFormatter.java (default <B>..</B> wrap,
fragment size 100) and solr/core/.../highlight/DefaultSolrHighlighter.java.
The reference re-analyzes the stored field, finds query-term spans, and
emits the best fragment with terms wrapped.

Ours keeps the whole pipeline in Catalyst expressions (no Python): locate
the first case-insensitive whole-word occurrence, slice a fragment window
around it, and wrap every whole-word occurrence inside the fragment with
<b>..</b>. Character-offset based (like the reference's offsets from
re-analysis); deterministic, and SQL-expressible so the DuckDB oracle can
mirror it textually.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FRAGMENT_SIZE = 100  # Highlighter.DEFAULT_MAX_CHARS_TO_ANALYZE fragment


def highlight(
    docs: DataFrame,
    term: str,
    text_col: str = "text",
    fragment_size: int = FRAGMENT_SIZE,
) -> DataFrame:
    """(doc_id, snippet) for docs containing ``term`` as a whole word.

    The fragment is anchored at the first WHOLE-WORD match (not the
    first substring hit — 'scanner' must not anchor a 'scan' snippet),
    clamped to text start, spanning ``fragment_size`` chars; matches are
    wrapped in <b>..</b> case-insensitively on word boundaries. Anchor =
    1 + length of the non-greedy prefix before the first whole-word
    match, the same expression the DuckDB oracle evaluates. The term is
    regex-escaped and passed through the column API (never interpolated
    into F.expr), so quotes/metachars in queries are safe.
    """
    rx_find = f"(?i)\\b{re.escape(term)}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{re.escape(term)}\\b"
    matched = docs.where(F.col(text_col).rlike(rx_find)).withColumn(
        "_pos",
        F.length(F.regexp_extract(F.col(text_col), rx_prefix, 1)) + F.lit(1),
    )
    start = F.greatest(F.lit(1), F.col("_pos") - F.lit(fragment_size // 2))
    frag = F.substring(F.col(text_col), start, fragment_size)
    wrapped = F.regexp_replace(frag, rx_find, f"<b>{term}</b>")
    return matched.select("doc_id", wrapped.alias("snippet"))
