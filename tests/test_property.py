"""Randomized, seed-reproducible engine-vs-oracle identity — the
LuceneTestCase/RandomIndexWriter strategy (SURVEY.md §5.3):
random corpora and random queries, failures shrink to a minimal example.

Kept deliberately small (one Spark build per example is ~2s): breadth
comes from the query sweep per corpus, not the corpus count.
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_solr_spark.oracle_engine import OracleIndex
from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import And, Or, PhraseQuery, TermQuery
from tests.conftest import assert_topk_equal

VOCAB = ["red", "blue", "green", "fast", "slow", "the", "and", "of",
         "cat", "dog", "fish", "run", "walk", "jump"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12),
    min_size=3,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_strategy, seed=st.integers(0, 10_000))
def test_random_corpus_rank_identity(spark, docs, seed):
    from lucene_solr_spark.index.builder import build_index

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": [" ".join(d) for d in docs],
        }
    )
    oracle = OracleIndex(pdf)
    idx = build_index(spark, spark.createDataFrame(pdf))
    s = Searcher(idx, exact_float32=True)

    import random

    rng = random.Random(seed)
    terms = [rng.choice(VOCAB) for _ in range(3)]
    cases = [
        (TermQuery(terms[0]), oracle.query_term(terms[0])),
        (And(*terms[:2]), oracle.query_and(terms[:2])),
        (Or(*terms), oracle.query_or(terms)),
    ]
    if terms[0] != terms[1]:
        cases.append(
            (
                PhraseQuery(terms[:2]),
                oracle.query_phrase(terms[:2]),
            )
        )
    for q, want_scores in cases:
        got = s.search(q, 10).collect()
        want = oracle.top_k(want_scores, 10)
        assert_topk_equal(got, want)

    # algebraic law (SearchEquivalenceTestBase.assertSubsetOf):
    # AND(t0,t1) docs ⊆ OR(t0,t1) docs ⊆ union of term docs
    and_docs = {r["doc_id"] for r in s.score(And(*terms[:2])).collect()}
    or_docs = {r["doc_id"] for r in s.score(Or(*terms[:2])).collect()}
    assert and_docs <= or_docs


def test_span_near_unordered_repeated_terms_bruteforce(spark):
    """Unordered SpanNear with a repeated term vs a brute-force position
    enumeration (NearSpansUnordered.java:157-176: same-term clauses must
    occupy distinct positions)."""
    from itertools import permutations

    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spans import span_near

    rows = [
        (0, "x y x"),          # x at 0,2; y at 1 -> window width 3
        (1, "x y z y"),        # only one x -> no double-x match
        (2, "x x q q q y"),    # x at 0,1; y at 5 -> width 6
        (3, "y q x q x"),      # x at 2,4; y at 0 -> width 5
        (4, "x q q x"),        # no y
    ]
    pdf = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(spark, pdf, cache=True)
    s = Searcher(idx)

    def brute(slop):
        import re

        out = set()
        for doc_id, text in rows:
            toks = text.split()
            px = [i for i, t in enumerate(toks) if t == "x"]
            py = [i for i, t in enumerate(toks) if t == "y"]
            for a in px:
                for b in px:
                    if a >= b:
                        continue
                    for c in py:
                        w = max(a, b, c) - min(a, b, c) - 2
                        if w <= slop:
                            out.add(doc_id)
        return out

    for slop in (0, 1, 2, 3, 4, 6):
        got = {
            r["doc_id"]
            for r in span_near(
                s, ["x", "x", "y"], slop, in_order=False
            ).collect()
        }
        assert got == brute(slop), (slop, got, brute(slop))
