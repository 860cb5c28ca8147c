"""Spell correction — the DirectSpellChecker analogue.

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
DirectSpellChecker.java — candidate terms within maxEdits (default 2) of
the query term are drawn live from the term dictionary and ranked by
similarity then docFreq. We rank by (edit distance asc, df desc, term asc)
— the deterministic core of DirectSpellChecker's SuggestWordQueue order —
over the ``terms_stats`` table.

Scale shape: one broadcast-size scan of terms_stats with a levenshtein
predicate (JVM whole-stage codegen; no Python). At 10^12-doc scale the
term dictionary is still only ~10^7-10^8 rows, so this remains a
single-stage scan + TakeOrderedAndProject.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def suggest(
    terms_stats: DataFrame,
    word: str,
    max_edits: int = 2,
    k: int = 5,
    min_prefix: int = 1,
) -> DataFrame:
    """Top-k suggestions: DataFrame(term, df, dist).

    ``min_prefix`` mirrors DirectSpellChecker.minPrefix=1 (candidates must
    share the first character) — it also turns the scan into a prefix
    range that Parquet min/max stats can prune.
    """
    cand = terms_stats.where(F.col("term") != word)
    if min_prefix > 0:
        cand = cand.where(
            F.col("term").startswith(word[:min_prefix])
        )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("term"), F.lit(word))
        )
        .where(F.col("dist") <= max_edits)
        .select("term", F.col("df").cast("long").alias("df"), "dist")
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def collate(
    searcher,
    query_terms: list[str],
    max_edits: int = 2,
) -> tuple[str, int]:
    """spellcheck.collate (solr/core/src/java/org/apache/solr/spelling/
    SpellCheckCollator.java): replace each query term ABSENT from the
    index with its top suggestion (suggest() order), re-run the
    corrected query as a conjunction, and return
    (collation string, hits). Terms already in the dictionary are kept;
    terms with no suggestion within max_edits are kept verbatim (they
    contribute zero hits, like Solr's failed collation attempts)."""
    from .query import And

    ts = searcher.index.terms_stats
    present = {
        r["term"]
        for r in ts.where(
            F.col("term").isin(list(set(query_terms)))
        ).collect()
    }
    corrected: list[str] = []
    for t in query_terms:
        if t in present:
            corrected.append(t)
            continue
        top = suggest(ts, t, max_edits=max_edits, k=1).collect()
        corrected.append(top[0]["term"] if top else t)
    hits = searcher.score(And(*corrected)).count()
    return " ".join(corrected), int(hits)
