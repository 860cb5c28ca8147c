"""ComplexPhraseQueryParser — phrases whose slots are wildcards,
prefixes, or fuzzy terms.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
complexPhrase/ComplexPhraseQueryParser.java:197-283 — each slot of the
quoted phrase parses independently; multi-term slots rewrite into a
SpanOrQuery over their expansions, single terms into SpanTermQuery,
and the whole phrase becomes ``SpanNearQuery(slots, slopFactor,
inOrder=true)`` (:283). The slop is the SpanNear slop directly (not a
surround-style distance).

Spark shape: slot expansion is one bounded terms-dictionary scan per
multi-term slot (the same MultiTermQuery rewrite path); the phrase is
the surround module's ordered span-frame join — exists-an-assignment
with strictly increasing starts and Σ max(0, s[i+1]-e[i]) <= slop
(NearSpansOrdered.java:226-330). Constant-score doc set (the fq
shape)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..analysis.tokenizer import analyze
from .executor import Searcher
from .surround import (
    MAX_BASIC_QUERIES,
    TooManyBasicQueries,
    _term_spans,
    join_span_frames,
)

_FUZZY_RX = re.compile(r"^(?P<body>.+?)~(?P<edits>\d+)?$")


def _slot_terms(searcher: Searcher, token: str) -> list[str]:
    """Expand one phrase slot into concrete index terms (SpanOrQuery
    member terms). Wildcards use the WildcardQuery alphabet (* ?),
    ``word~n`` is a fuzzy slot (edit distance, default 2), plain words
    go through the analyzer."""
    ts = searcher.index.terms_stats
    fm = _FUZZY_RX.match(token)
    if ("*" in token) or ("?" in token):
        parts = [
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in token.lower()
        ]
        matched = ts.where(F.col("term").rlike("^" + "".join(parts) + "$"))
    elif fm and not token.endswith("\\~"):
        edits = int(fm.group("edits") or 2)
        matched = ts.where(
            F.levenshtein(F.col("term"), F.lit(fm.group("body").lower()))
            <= edits
        )
    else:
        terms, _ = analyze(token)
        return terms[:1]
    rows = matched.select("term").limit(MAX_BASIC_QUERIES + 1).collect()
    if len(rows) > MAX_BASIC_QUERIES:
        raise TooManyBasicQueries(
            f"slot {token!r} expands past {MAX_BASIC_QUERIES} terms"
        )
    return [r["term"] for r in rows]


def complex_phrase_doc_ids(
    searcher: Searcher, phrase: str, slop: int = 0
) -> DataFrame:
    """Doc set of a complex phrase: ordered span-near over expanded
    slots with the given slop (ComplexPhraseQuery.rewrite :283)."""
    tokens = phrase.split()
    if len(tokens) < 2:
        raise ValueError("complex phrase needs >= 2 slots")
    frames = [
        _term_spans(searcher, _slot_terms(searcher, tok))
        for tok in tokens
    ]
    return (
        join_span_frames(frames, slop=slop, ordered=True)
        .select("doc_id")
        .distinct()
    )
