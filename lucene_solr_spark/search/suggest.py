"""Autosuggest — the suggest/Lookup surface (SURVEY.md §2.12).

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
Lookup.java (build from (key, weight) pairs; lookup(prefix, num) returns
completions by weight) and WFSTCompletionLookup.java (weight-ordered
completions; exactFirst puts an exact key match ahead of heavier
completions).

Spark shape: the FST is replaced by the terms_stats table — a prefix
lookup is a row-group-pruned scan ordered by weight. Weights default to
totalTermFreq (the corpus-frequency signal Solr's Suggester derives
from the index when no external dictionary is given,
solr/core/.../spelling/suggest/Suggester.java). At 10^8-term
dictionaries the scan prunes by parquet min/max on term; no driver
state, no FST build pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def build_suggester(terms_stats: DataFrame) -> DataFrame:
    """(key, weight) suggestion table from the index's term dictionary —
    Lookup.build analogue. Kept as a view; callers may persist it."""
    return terms_stats.select(
        F.col("term").alias("key"),
        F.col("ttf").cast("long").alias("weight"),
    )


def lookup(
    suggester: DataFrame,
    prefix: str,
    num: int = 5,
    exact_first: bool = True,
) -> DataFrame:
    """Top-``num`` completions of ``prefix`` by (weight desc, key asc);
    with ``exact_first`` an exact key match sorts ahead regardless of
    weight (WFSTCompletionLookup.exactFirst semantics)."""
    cand = suggester.where(F.col("key").startswith(prefix))
    if exact_first:
        cand = cand.withColumn(
            "is_exact", F.when(F.col("key") == prefix, 1).otherwise(0)
        )
        out = cand.orderBy(
            F.desc("is_exact"), F.desc("weight"), F.asc("key")
        )
        return out.select("key", "weight").limit(num)
    return (
        cand.orderBy(F.desc("weight"), F.asc("key"))
        .select("key", "weight")
        .limit(num)
    )
