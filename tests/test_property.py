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
