"""Spark-native (JVM, whole-stage-codegen) analyzer expressions.

The same pinned grammar as analysis/tokenizer.py, expressed as built-in
``pyspark.sql.functions`` so text-analytics pipelines stay entirely
JVM-side (no Python boundary). DuckDB mirrors live in oracles.py; the
Java-regex/RE2 subset used here behaves identically on ASCII input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from ..analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
)

STOPWORDS_SORTED = sorted(ENGLISH_STOP_WORDS)


def raw_tokens(text: Column) -> Column:
    """Tokenize + lowercase (pre-stop), dropping over-length tokens."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 0)
    return F.filter(toks, lambda t: F.length(t) <= MAX_TOKEN_LENGTH)


def analyzed_tokens(text: Column) -> Column:
    """Full chain: stop-filtered terms (positions not tracked here —
    use analysis.tokenizer for the index path)."""
    return F.filter(raw_tokens(text), lambda t: ~t.isin(STOPWORDS_SORTED))


def token_shingles(tokens: Column, n: int = 3) -> Column:
    """word n-grams over a token array (ShingleFilter analogue,
    lucene/analysis/common/.../shingle/ShingleFilter.java), expressed with
    transform+slice — JVM-side, no UDF."""
    return F.when(F.size(tokens) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
            lambda i: F.array_join(F.slice(tokens, i, n), " "),
        )
    )


def hash60(s: Column) -> Column:
    """Deterministic 60-bit positive hash shared with the DuckDB oracle:
    first 15 hex chars of md5, as bigint. (Spark xxhash64 would be faster
    but is not reproducible inside ANSI SQL.)"""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
