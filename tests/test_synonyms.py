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


def test_solr_synonym_parser_format():
    """SolrSynonymParser format rules (TestSolrSynonymParser.java):
    comments, equivalence classes vs explicit =>, multi-rule merge,
    escapes, expand=False collapsing to the head."""
    from lucene_solr_spark.search.synonyms import parse_solr_synonyms

    txt = (
        "# comment with => inside\n"
        "\n"
        "i-pod, i pod => ipod\n"
        "foo => foo bar\n"
        "foo => baz\n"
        "sea biscuit, sea biscit, seabiscuit\n"
    )
    m = parse_solr_synonyms(txt)
    # explicit mappings ignore expand; LHS alternatives analyze to the
    # same 'i pod' and map only to the RHS
    assert m["i pod"] == ["ipod"]
    # multiple rules for one input merge
    assert m["foo"] == ["baz", "foo bar"]
    # equivalence class: all-pairs under expand
    assert (
        m["seabiscuit"]
        == ["sea biscit", "sea biscuit", "seabiscuit"]
    )
    assert m["sea biscit"] == m["sea biscuit"] == m["seabiscuit"]
    # expand=False: everything maps to the first entry only
    m2 = parse_solr_synonyms("a, b, c\n", expand=False)
    assert m2 == {"a": ["a"], "b": ["a"], "c": ["a"]}
    # escaped comma / arrow survive as literal text
    m3 = parse_solr_synonyms("a\\,b => c\\=>d\n", analyze=lambda s: s)
    assert m3 == {"a,b": ["c=>d"]}
    # two arrows on one line is an error (reference throws)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_solr_synonyms("a => b => c\n")


def test_wordnet_synonym_parser_format():
    """WordnetSynonymParser prolog format (TestWordnetSynonymParser.java
    fixture shape): synset grouping on the id chars [2,11), '' quote
    escape, singleton synsets dropped, expand=False maps to the head."""
    from lucene_solr_spark.search.synonyms import parse_wordnet_synonyms

    txt = (
        "s(100000001,1,'woods',n,1,0).\n"
        "s(100000001,2,'wood',n,1,0).\n"
        "s(100000001,3,'forest',n,1,0).\n"
        "s(100000002,1,'wolfish',a,1,0).\n"
        "s(100000002,2,'ravenous',a,1,0).\n"
        "s(100000003,1,'lone',a,1,0).\n"  # singleton: no synonyms
        "s(100000004,1,'king''s evil',n,1,0).\n"
        "s(100000004,2,'scrofula',n,1,0).\n"
    )
    m = parse_wordnet_synonyms(txt, analyze=lambda s: s)
    assert m["woods"] == ["forest", "wood", "woods"]
    assert m["ravenous"] == ["ravenous", "wolfish"]
    assert "lone" not in m  # size<=1 synsets contribute nothing
    # '' unescapes to a single quote inside the word
    assert m["king's evil"] == ["king's evil", "scrofula"]
    m2 = parse_wordnet_synonyms(txt, expand=False, analyze=lambda s: s)
    assert m2["forest"] == ["woods"] and m2["woods"] == ["woods"]


def test_multiword_variant_expands_to_phrase():
    """A multi-token synonym output becomes a PhraseQuery SHOULD clause
    (stacked-position graph collapsed to the classic-parser shape)."""
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        PhraseQuery,
        TermQuery,
    )
    from lucene_solr_spark.search.synonyms import (
        expand_query,
        parse_solr_synonyms,
    )

    syn = parse_solr_synonyms("tv => television set\n")
    out = expand_query(TermQuery("tv"), syn)
    assert isinstance(out, BooleanQuery)
    (cl,) = out.clauses
    assert isinstance(cl.query, PhraseQuery)
    assert cl.query.terms == ("television", "set")
