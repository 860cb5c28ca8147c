"""Dedup operator tests: vectorized shingle kernel equivalence and the
mega-bucket star-linking guard."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.datapipe.dedup import (
    distinct_shingle_rows,
    minhash_candidate_pairs,
)


@pytest.fixture(scope="module")
def texts_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "quick brown fox jumps over lazy dog again and again"),
        (2, "completely different content about spark shuffles, and joins"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "the quick brown fox jumps over the lazy dog tonight!"),
        (5, "short text"),
        (6, ""),
        (7, "don't stop believing, hold on to that 3.14 feeling"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vectorized_shingles_match_analyzer_loop(texts_df):
    """The column-vectorized shingle kernel must produce exactly the
    per-doc analyze() + set-comprehension shingles it replaced."""
    from lucene_solr_spark.analysis.tokenizer import analyze

    got = {
        (r["doc_id"], r["shingle"])
        for r in distinct_shingle_rows(texts_df).collect()
    }
    want = set()
    for row in texts_df.collect():
        toks, _ = analyze(row["text"] or "")
        for i in range(len(toks) - 2):
            want.add((row["doc_id"], " ".join(toks[i : i + 3])))
    assert got == want and len(want) > 0


def test_mega_bucket_star_linking(spark):
    """A bucket over the cap must emit O(n) star pairs (rep = min doc),
    not O(n^2) all-pairs, while keeping every member linked to the
    representative (connected component preserved)."""
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, same) for i in range(6)] + [
        (10, "totally unrelated text about parquet row groups and scans")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_candidate_pairs(df, bucket_cap=2).collect()
    uncapped = minhash_candidate_pairs(df, bucket_cap=1000).collect()
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    uncapped_pairs = {(r["doc_a"], r["doc_b"]) for r in uncapped}
    # identical docs share every band bucket: all-pairs = C(6,2) = 15
    assert uncapped_pairs == {
        (a, b) for a in range(6) for b in range(6) if a < b
    }
    # star: every member pairs with doc 0 only
    assert capped_pairs == {(0, b) for b in range(1, 6)}
