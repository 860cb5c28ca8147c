"""N-gram token filters — NGramTokenFilter / EdgeNGramTokenFilter
analogues (lucene/analysis/common/.../ngram/NGramTokenFilter.java:28-91,
EdgeNGramTokenFilter.java:31-114).

Two surfaces, same semantics:

* per-token Python functions (:func:`ngram_tokens`,
  :func:`edge_ngram_tokens`) for the Analyzer extension slot
  (``make_analyzer(..., ngram=(min,max))``) — these run inside the
  per-doc fallback chain, exactly like the stemmer/folder slots;
* a Spark-native column expression (:func:`ngrams_expr`) that expands a
  token column into its grams entirely inside Catalyst
  (sequence -> transform -> flatten), used by analytics over the token
  stream where the per-doc chain would be the slow path. No Python on
  the hot path; whole-stage codegen applies.

Gram emission order mirrors the reference: for each gram size n from
min_gram..max_gram, front-to-back over the token (NGramTokenFilter's
curGramSize outer loop / curPos inner loop). Tokens shorter than
min_gram emit nothing; the edge variant anchors at the front edge
(Side.FRONT, the only side Solr 4 exposes by default).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def ngram_tokens(tok: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """All grams of ``tok`` with sizes min_gram..max_gram, size-major."""
    out: list[str] = []
    ln = len(tok)
    for n in range(min_gram, max_gram + 1):
        for i in range(0, ln - n + 1):
            out.append(tok[i : i + n])
    return out


def edge_ngram_tokens(
    tok: str, min_gram: int = 1, max_gram: int = 1
) -> list[str]:
    """Front-edge grams: prefixes of length min_gram..max_gram."""
    ln = len(tok)
    return [tok[:n] for n in range(min_gram, max_gram + 1) if n <= ln]


def ngrams_expr(
    term: Column, min_gram: int = 1, max_gram: int = 2
) -> Column:
    """Catalyst expression: array of all grams of ``term`` (size-major,
    front-to-back) — the NGramTokenFilter semantics with zero Python.
    Compose with ``F.explode`` to get one row per gram."""
    ln = F.length(term)
    per_size = F.transform(
        F.sequence(F.lit(min_gram), F.lit(max_gram)),
        lambda n: F.when(
            ln >= n,
            F.transform(
                F.sequence(F.lit(1), ln - n + 1),
                lambda i: F.substring(term, i, n),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.flatten(per_size)


def edge_ngrams_expr(
    term: Column, min_gram: int = 1, max_gram: int = 1
) -> Column:
    """Catalyst expression: front-edge prefixes length min_gram..max_gram."""
    ln = F.length(term)
    return F.filter(
        F.transform(
            F.sequence(F.lit(min_gram), F.lit(max_gram)),
            lambda n: F.when(ln >= n, F.substring(term, F.lit(1), n)),
        ),
        lambda x: x.isNotNull(),
    )
