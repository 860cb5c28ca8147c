"""AnalyzingQueryParser (lucene/queryparser/src/java/org/apache/lucene/
queryparser/analyzing/AnalyzingQueryParser.java:44-186): wildcard /
prefix / fuzzy fragments run through the index's analyzer chain before
dictionary expansion, so folded/stemmed stores match what the classic
parser's bare-lowercase multiterms miss."""

import pandas as pd
import pytest

from lucene_solr_spark.analysis.tokenizer import make_analyzer
from lucene_solr_spark.search.qparser import (
    QueryParseError,
    parse_analyzing,
    parse_lucene,
)
from lucene_solr_spark.search.query import (
    FuzzyQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)


def test_prefix_fragment_is_folded():
    an = make_analyzer(fold=True)
    q = parse_analyzing("Résumé*", an)
    assert q == PrefixQuery("resume")


def test_prefix_fragment_is_stemmed():
    an = make_analyzer(minimal_stem=True)
    assert parse_analyzing("tables*", an) == PrefixQuery("table")


def test_classic_parser_keeps_bare_lowercase():
    # the delta AnalyzingQueryParser exists for: classic only lowercases
    assert parse_lucene("Tables*") == PrefixQuery("tables")


def test_wildcard_fragments_each_analyzed():
    an = make_analyzer(fold=True)
    q = parse_analyzing("Rés?mé*", an)
    assert q == WildcardQuery("res?me*")


def test_leading_wildcard_fragment():
    an = make_analyzer(fold=True)
    assert parse_analyzing("*umés", an) == WildcardQuery("*umes")


def test_fuzzy_body_analyzed_through_chain():
    an = make_analyzer(minimal_stem=True)
    assert parse_analyzing("tables~1", an) == FuzzyQuery("table", 1)


def test_term_slot_uses_chain():
    an = make_analyzer(minimal_stem=True)
    assert parse_analyzing("tables", an) == TermQuery("table")


def test_zero_token_chunk_raises_like_parse_exception():
    # 'the' is swallowed by the stop filter -> analyzeSingleChunk's
    # "analyzer returned no terms" ParseException (:158-170)
    an = make_analyzer()
    with pytest.raises(QueryParseError):
        parse_analyzing("the*", an)


def test_end_to_end_stemmed_store_matches(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher

    an = make_analyzer(minimal_stem=True)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "tables stay sorted",
                "one table here",
                "no match at all",
            ],
        }
    )
    idx = build_index(spark, spark.createDataFrame(pdf), analyzer=an)
    s = Searcher(idx)
    got = sorted(
        r["doc_id"]
        for r in s.score(parse_analyzing("tables*", an))
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert got == [0, 1]  # both stem to 'table' in the store
    # classic parser: PrefixQuery('tables') finds nothing in the
    # stemmed dictionary
    got_classic = (
        s.score(parse_lucene("tables*")).select("doc_id").count()
    )
    assert got_classic == 0
