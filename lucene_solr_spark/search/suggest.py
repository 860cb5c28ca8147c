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


def build_fst_completion(
    suggester: DataFrame, buckets: int = 10
) -> DataFrame:
    """FSTCompletionLookup.build analogue: discretize weights into
    ``buckets`` quantile buckets.

    Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
    fst/FSTCompletionLookup.java:171-206 — entries are external-sorted by
    (weight asc, key asc) and bucket = (int)(line * buckets / inputLines),
    where equal weights share the bucket of the run's FIRST line. Since a
    run of equal weights is contiguous in that sort, the run's first line
    equals the number of entries with strictly smaller weight — so the
    bucket is a function of the WEIGHT alone. The Spark shape exploits
    that: aggregate a per-distinct-weight histogram (tiny vs the
    dictionary), one cumulative-sum window over it, then broadcast-join
    the bucket back — no global row_number over 10^8 dictionary entries.
    """
    from pyspark.sql import Window

    n = suggester.count()  # inputLines — Lucene's build knows it too
    wc = suggester.groupBy("weight").agg(F.count("*").alias("c"))
    win = Window.orderBy("weight").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = wc.select(
        "weight",
        F.coalesce(F.sum("c").over(win), F.lit(0)).alias("below"),
    )
    return suggester.join(F.broadcast(cum), "weight").select(
        "key",
        "weight",
        F.floor(
            F.col("below") * F.lit(int(buckets)) / F.lit(int(n))
        ).cast("long").alias("bucket"),
    )


def fst_lookup(
    completion: DataFrame,
    prefix: str,
    num: int = 5,
    exact_first: bool = True,
) -> DataFrame:
    """FSTCompletion.lookup with higherWeightsFirst: completions by
    (bucket desc, key asc) — alphabetical within a weight bucket, NOT by
    exact weight (the discretization is the point: near-equal weights
    tie and resolve alphabetically). exactMatchFirst promotes an exact
    key hit ahead of heavier buckets
    (FSTCompletion.java:92-121, checkExactMatchFirst)."""
    cand = completion.where(F.col("key").startswith(prefix))
    order = [F.desc("bucket"), F.asc("key")]
    if exact_first:
        cand = cand.withColumn(
            "is_exact", F.when(F.col("key") == prefix, 1).otherwise(0)
        )
        order = [F.desc("is_exact")] + order
    return (
        cand.orderBy(*order)
        .select("key", "weight", "bucket")
        .limit(num)
    )


def parse_file_dictionary(text: str) -> list[tuple[str, int]]:
    """FileDictionary wire format (lucene/suggest/.../FileDictionary.java:
    33-98): one entry per line, optionally TAB-separated from an integer
    weight (floats accepted for back-compat, truncated to long); no
    weight means 1. The entry itself may contain spaces."""
    out: list[tuple[str, int]] = []
    for line in text.splitlines():
        if not line:
            continue
        fields = line.split("\t")
        if len(fields) > 1:
            try:
                w = int(fields[1])
            except ValueError:
                w = int(float(fields[1]))
            out.append((fields[0], w))
        else:
            out.append((line, 1))
    return out


def suggester_from_file(spark, text: str) -> DataFrame:
    """(key, weight) suggestion table from FileDictionary text — the
    external-dictionary Suggester path (solr/core/.../spelling/suggest/
    Suggester.java sourceLocation), interchangeable with
    build_suggester's index-derived table."""
    return spark.createDataFrame(
        parse_file_dictionary(text), "key string, weight long"
    )
