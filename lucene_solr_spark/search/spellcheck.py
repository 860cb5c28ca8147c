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
