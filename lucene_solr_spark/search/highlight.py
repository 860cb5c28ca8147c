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


def highlight_phrase(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    fragment_size: int = FRAGMENT_SIZE,
) -> DataFrame:
    """Phrase-aware highlighting — hl.usePhraseHighlighter /
    FastVectorHighlighter behavior (lucene/highlighter/.../
    vectorhighlight/FieldPhraseList.java + solr
    DefaultSolrHighlighter.java usePhraseHighlighter): only WHOLE
    phrase occurrences highlight, wrapped as ONE <b>..</b> unit — a doc
    containing the words separately never matches, and individual
    words inside the fragment stay unwrapped.

    Adjacency is raw-text adjacency (words separated by non-token
    characters only) — position adjacency for the standard grammar on
    stopword-free phrases; the wrapped replacement normalizes case and
    separators to the canonical 'w1 w2' form, the same textual rule
    the oracle twin evaluates."""
    import re as _re

    body = "[^A-Za-z0-9_]+".join(_re.escape(t) for t in terms)
    rx_find = f"(?i)\\b{body}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{body}\\b"
    canon = " ".join(terms)
    matched = docs.where(F.col(text_col).rlike(rx_find)).withColumn(
        "_pos",
        F.length(F.regexp_extract(F.col(text_col), rx_prefix, 1))
        + F.lit(1),
    )
    start = F.greatest(
        F.lit(1), F.col("_pos") - F.lit(fragment_size // 2)
    )
    frag = F.col(text_col).substr(start, F.lit(fragment_size))
    snippet = F.regexp_replace(
        frag, rx_find, f"<b>{canon}</b>"
    )
    return matched.select(
        "doc_id", snippet.alias("snippet")
    ).orderBy("doc_id")


def highlight_snippets(
    docs: DataFrame,
    term: str,
    n_snippets: int = 3,
    window: int = 3,
    text_col: str = "text",
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
) -> DataFrame:
    """hl.snippets > 1 — up to ``n_snippets`` token-window fragments
    per doc, one per term occurrence in position order
    (solr/core/.../highlight/DefaultSolrHighlighter.java hl.snippets +
    hl.simple.pre/post params; fragments here are TOKEN windows of
    ±``window`` tokens rather than char offsets — the deterministic,
    fully-JVM-side formulation of GapFragmenter's fragment-per-match).

    Whole plan in Catalyst: one regexp tokenization per doc, positions
    via array functions, a bounded posexplode for the per-occurrence
    fan-out — no Python, no second scan.
    Returns (doc_id, snippet_no, snippet)."""
    from ..analysis.tokenizer import TOKEN_PATTERN

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    t = F.lit(term)
    base = docs.select("doc_id", toks.alias("toks")).where(
        F.array_contains("toks", t)
    )
    # 1-based positions of every occurrence, in order
    occs = F.filter(
        F.transform(
            "toks",
            lambda x, i: F.when(x == t, i + 1).otherwise(F.lit(0)),
        ),
        lambda p: p > 0,
    )
    base = base.select(
        "doc_id", "toks", F.slice(occs, 1, n_snippets).alias("occs")
    )
    ex = base.select(
        "doc_id",
        "toks",
        F.posexplode("occs").alias("snippet_no", "pos"),
    )
    start = F.greatest(F.lit(1), F.col("pos") - F.lit(window))
    length = (
        F.least(
            F.size("toks"), F.col("pos") + F.lit(window)
        )
        - start
        + 1
    )
    frag = F.array_join(F.slice("toks", start, length), " ")
    wrapped = F.regexp_replace(
        frag,
        r"\b" + re.escape(term) + r"\b",
        pre_tag + term + post_tag,
    )
    return ex.select(
        "doc_id",
        (F.col("snippet_no") + 1).alias("snippet_no"),
        wrapped.alias("snippet"),
    )


def highlight_with_alternate(
    docs: DataFrame,
    term: str,
    alt_col: str = "text",
    max_alt_length: int = 60,
    text_col: str = "text",
    fragment_size: int = FRAGMENT_SIZE,
) -> DataFrame:
    """hl.alternateField / hl.maxAlternateFieldLength
    (solr/core/.../highlight/DefaultSolrHighlighter.java
    alternateField handling): docs WITH a whole-word match get the
    ordinary anchored snippet; docs WITHOUT one fall back to the first
    ``max_alt_length`` chars of the alternate field, unhighlighted.
    Returns (doc_id, snippet, is_alternate)."""
    rx_find = f"(?i)\\b{re.escape(term)}\\b"
    hl = highlight(docs, term, text_col, fragment_size).withColumn(
        "is_alternate", F.lit(0)
    )
    alt = (
        docs.where(~F.col(text_col).rlike(rx_find))
        .select(
            "doc_id",
            F.substring(F.col(alt_col), 1, max_alt_length).alias(
                "snippet"
            ),
            F.lit(1).alias("is_alternate"),
        )
    )
    return hl.unionByName(alt)


def _hex2(col):
    return F.lpad(F.upper(F.hex(col)), 2, "0")


def highlight_gradient(
    docs: DataFrame,
    term: str,
    scored: DataFrame,
    max_score: float,
    min_bg: str = "#FFFFFF",
    max_bg: str = "#FF0000",
    text_col: str = "text",
    fragment_size: int = FRAGMENT_SIZE,
) -> DataFrame:
    """GradientFormatter (lucene/highlighter/.../GradientFormatter.
    java:95-170): matches wrapped in <font bgcolor="#RRGGBB"> with each
    channel interpolated between the min and max colors by
    min(maxScore, score)/maxScore — getColorVal's ``min(cMin,cMax) +
    (int)(|cMin-cMax| * relScore)`` per channel, intToHex's zero-padded
    uppercase bytes. ``scored`` supplies (doc_id, score); arithmetic is
    double-precision here and in the oracle twin (the reference uses
    float32 — a <=1 colour-step deviation at exact channel boundaries).
    Returns (doc_id, bgcolor, snippet)."""

    def ch(h: str, i: int) -> int:
        return int(h[i : i + 2], 16)

    def color_val(cmin: int, cmax: int):
        if cmin == cmax:
            return F.lit(cmin)
        scale = float(abs(cmin - cmax))
        rel = F.least(F.lit(float(max_score)), F.col("score")) / F.lit(
            float(max_score)
        )
        return (
            F.lit(min(cmin, cmax))
            + F.floor(F.lit(scale) * rel).cast("int")
        )

    bgcolor = F.concat(
        F.lit("#"),
        _hex2(color_val(ch(min_bg, 1), ch(max_bg, 1))),
        _hex2(color_val(ch(min_bg, 3), ch(max_bg, 3))),
        _hex2(color_val(ch(min_bg, 5), ch(max_bg, 5))),
    )
    rx_find = f"(?i)\\b{re.escape(term)}\\b"
    rx_prefix = f"(?is)^(.*?)\\b{re.escape(term)}\\b"
    matched = (
        docs.join(scored, "doc_id")
        .where(F.col(text_col).rlike(rx_find))
        .withColumn("bgcolor", bgcolor)
        .withColumn(
            "_pos",
            F.length(F.regexp_extract(F.col(text_col), rx_prefix, 1))
            + F.lit(1),
        )
    )
    start = F.greatest(
        F.lit(1), F.col("_pos") - F.lit(fragment_size // 2)
    )
    frag = F.substring(F.col(text_col), start, fragment_size)
    wrapped = F.regexp_replace(
        frag,
        rx_find,
        F.concat(
            F.lit('<font bgcolor="'),
            F.col("bgcolor"),
            F.lit(f'">{term}</font>'),
        ),
    )
    return matched.select("doc_id", "bgcolor", wrapped.alias("snippet"))
