"""Query-time synonym expansion AST tests + engine equivalence: an
expanded query must equal the hand-built disjunction."""

import pytest

from lucene_solr_spark.search.query import (
    And,
    BooleanClause,
    BooleanQuery,
    Or,
    TermQuery,
)
from lucene_solr_spark.search.synonyms import build_synonym_map, expand_query


def test_map_symmetric():
    syn = build_synonym_map([["error", "failure", "fault"]])
    assert syn["failure"] == ["error", "failure", "fault"]
    assert syn["error"] == syn["fault"]


def test_term_expansion():
    syn = build_synonym_map([["error", "failure"]])
    q = expand_query(TermQuery("error"), syn)
    assert q == Or("error", "failure", min_should_match=1) or q == BooleanQuery(
        [
            BooleanClause(TermQuery("error"), "SHOULD"),
            BooleanClause(TermQuery("failure"), "SHOULD"),
        ]
    )


def test_nested_expansion_keeps_occur():
    syn = build_synonym_map([["error", "failure"]])
    q = expand_query(And("error", "timeout"), syn)
    assert q.clauses[0].occur == "MUST"
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery)
    assert {c.query.term for c in inner.clauses} == {"error", "failure"}
    assert q.clauses[1].query == TermQuery("timeout")


def test_no_synonyms_identity():
    syn = build_synonym_map([["error", "failure"]])
    q = And("scan", "merge")
    assert expand_query(q, syn) == q


def test_engine_equivalence(spark, tiny_index):
    """Expanded query scores identically to the hand-built disjunction."""
    from lucene_solr_spark.search.executor import Searcher

    s = Searcher(tiny_index, exact_float32=True)
    syn = build_synonym_map([["error", "timeout"]])
    expanded = expand_query(TermQuery("error"), syn)
    want = s.search(Or("error", "timeout"), 10).collect()
    got = s.search(expanded, 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
