"""NGramPhraseQuery — the n-gram phrase rewrite optimization.

Reference: lucene/core/src/java/org/apache/lucene/search/
NGramPhraseQuery.java:46-77 — an exact phrase over CONSECUTIVE n-grams
keeps only the terms at positions ``i % n == 0`` plus the LAST term
(with their original positions): the n-character overlap of adjacent
grams makes the dropped middle grams redundant, so the optimized query
is result-identical while decoding ~1/n of the postings. Applies only
to slop=0, n >= 2, >= 3 terms, contiguous positions (:46-63).

Spark shape: each kept gram is one pruned positions lookup; the match
is a doc_id-keyed join requiring the kept grams at their EXACT
relative offsets — decode volume drops by the same ~1/n factor the
reference saves, which at 10^12 docs is the difference between
scanning every gram's postings and every n-th."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .executor import Searcher


def ngram_phrase_rewrite(
    terms: list[str], n: int
) -> list[tuple[str, int]]:
    """(term, relative_position) list after the NGramPhraseQuery
    rewrite — the full consecutive list when not optimizable."""
    if n < 2 or len(terms) < 3:
        return [(t, i) for i, t in enumerate(terms)]
    last = len(terms) - 1
    return [
        (t, i)
        for i, t in enumerate(terms)
        if i % n == 0 or i >= last
    ]


def ngram_phrase_docs(
    searcher: Searcher,
    terms: list[str],
    n: int,
    optimize: bool = True,
) -> DataFrame:
    """Doc set of the exact consecutive-gram phrase; with ``optimize``
    the rewrite prunes the decoded grams (result-identical)."""
    kept = (
        ngram_phrase_rewrite(terms, n)
        if optimize
        else [(t, i) for i, t in enumerate(terms)]
    )
    stats = searcher.index.term_stats(sorted({t for t, _ in kept}))
    if any(t not in stats for t, _ in kept):
        return searcher.index.spark.createDataFrame([], "doc_id long")
    cur: DataFrame | None = None
    for j, (t, off) in enumerate(kept):
        p = (
            searcher._postings_for([t], want_positions=True)
            .select("doc_id", F.explode("positions").alias("_p"))
            .select(
                "doc_id", (F.col("_p") - F.lit(off)).alias(f"a{j}")
            )
        )
        if cur is None:
            cur = p.withColumnRenamed("a0", "anchor")
        else:
            cur = cur.join(p, on="doc_id").where(
                F.col(f"a{j}") == F.col("anchor")
            ).drop(f"a{j}")
    return cur.select("doc_id").distinct()
