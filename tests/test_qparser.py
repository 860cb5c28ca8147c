"""Query-string parser (QParserPlugin analogue) — pure-Python AST tests,
mirroring lucene/queryparser TestQueryParser-style assertions."""

import pytest

from lucene_solr_spark.search.qparser import (
    QueryParseError,
    parse_dismax,
    parse_lucene,
)
from lucene_solr_spark.search.query import (
    BooleanClause,
    BooleanQuery,
    DisMaxQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


def test_single_term():
    assert parse_lucene("Error") == TermQuery("error")


def test_implicit_or():
    q = parse_lucene("error timeout")
    assert q == BooleanQuery(
        [
            BooleanClause(TermQuery("error"), "SHOULD"),
            BooleanClause(TermQuery("timeout"), "SHOULD"),
        ]
    )


def test_explicit_and_upgrades_both():
    q = parse_lucene("error AND timeout")
    assert q == BooleanQuery(
        [
            BooleanClause(TermQuery("error"), "MUST"),
            BooleanClause(TermQuery("timeout"), "MUST"),
        ]
    )


def test_plus_minus():
    q = parse_lucene("+error -timeout cache")
    assert q == BooleanQuery(
        [
            BooleanClause(TermQuery("error"), "MUST"),
            BooleanClause(TermQuery("timeout"), "MUST_NOT"),
            BooleanClause(TermQuery("cache"), "SHOULD"),
        ]
    )


def test_not_keyword():
    q = parse_lucene("error NOT timeout")
    assert q.clauses[1].occur == "MUST_NOT"


def test_phrase_and_slop():
    assert parse_lucene('"error timeout"') == PhraseQuery(
        ["error", "timeout"], 0
    )
    assert parse_lucene('"error timeout"~2') == PhraseQuery(
        ["error", "timeout"], 2
    )


def test_phrase_stopwords_analyzed_out():
    # "the error" -> stopword dropped by the index-time analyzer chain
    assert parse_lucene('"the error"') == PhraseQuery(["error"], 0)


def test_prefix_wildcard_fuzzy_range():
    assert parse_lucene("err*") == PrefixQuery("err")
    assert parse_lucene("e?ror") == WildcardQuery("e?ror")
    assert parse_lucene("error~1") == FuzzyQuery("error", 1)
    assert parse_lucene("error~") == FuzzyQuery("error", 2)
    assert parse_lucene("[aa TO ff]") == TermRangeQuery("aa", "ff", True, True)


def test_boost():
    assert parse_lucene("error^2.5") == TermQuery("error", 2.5)


def test_match_all():
    assert parse_lucene("*:*") == MatchAllQuery()


def test_grouping():
    q = parse_lucene("+(error timeout) -cache")
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery)
    assert [c.occur for c in q.clauses] == ["MUST", "MUST_NOT"]


def test_stopword_only_clause_dropped():
    q = parse_lucene("the error")
    assert q == TermQuery("error")


def test_unbalanced_paren_raises():
    with pytest.raises(QueryParseError):
        parse_lucene("(error")
    with pytest.raises(QueryParseError):
        parse_lucene("error)")


def test_dismax():
    q = parse_dismax("error timeout", tie=0.3, mm=1)
    assert q.min_should_match == 1
    assert all(isinstance(c.query, DisMaxQuery) for c in q.clauses)
    assert q.clauses[0].query == DisMaxQuery([TermQuery("error")], 0.3)


def test_midword_hyphen_is_not_negation():
    # classic QueryParser: '-' is an operator only at a clause start;
    # 'well-known' analyzes to a phrase, not 'well AND NOT known'
    q = parse_lucene("well-known")
    assert q == PhraseQuery(["well", "known"])


def test_leading_hyphen_still_negates():
    q = parse_lucene("scan -merge")
    assert [c.occur for c in q.clauses] == ["SHOULD", "MUST_NOT"]


def test_single_term_sloppy_phrase_rewrites_to_term():
    from lucene_solr_spark.search.query import rewrite

    # stopword-stripped '"the scan"~2' must not crash the sloppy walk
    q = rewrite(parse_lucene('"the scan"~2'))
    assert q == TermQuery("scan")


def test_escaped_specials():
    """QueryParser.jj escaping: '\\X' makes X literal everywhere."""
    from lucene_solr_spark.search.qparser import parse_lucene
    from lucene_solr_spark.search.query import (
        PhraseQuery,
        PrefixQuery,
        TermQuery,
        WildcardQuery,
    )

    # escaped '+' is part of the word, not a MUST operator
    assert parse_lucene(r"\+scan") == TermQuery("scan")
    # escaped '~' never reads as fuzzy; analyzer drops the tilde
    assert parse_lucene(r"scan\~") == TermQuery("scan")
    # escaped '*' inside a prefix stays literal in the prefix string
    q = parse_lucene(r"sc\*n*")
    assert q == PrefixQuery("sc*n")
    # escaped '*' with an unescaped '?' -> wildcard keeping the escape
    q = parse_lucene(r"sc\*?n")
    assert isinstance(q, WildcardQuery) and q.pattern == r"sc\*?n"
    # escaped quote inside a phrase body
    q = parse_lucene(r'"say \"hello\" now"')
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("say", "hello", "now")


def test_fielded_and_exclusive_ranges():
    """Full range grammar: field prefix, '{' exclusive ends, '*' open
    bounds, ^boost combos."""
    from lucene_solr_spark.search.qparser import parse_lucene
    from lucene_solr_spark.search.query import (
        FieldRangeQuery,
        TermRangeQuery,
    )

    q = parse_lucene("n_chars:[200 TO 400]")
    assert q == FieldRangeQuery("n_chars", "200", "400", True, True)
    q = parse_lucene("price:{10 TO 20]")
    assert q == FieldRangeQuery("price", "10", "20", False, True)
    q = parse_lucene("price:[* TO 20}")
    assert q == FieldRangeQuery("price", None, "20", True, False)
    q = parse_lucene("n_chars:[200 TO 400]^2")
    assert q == FieldRangeQuery("n_chars", "200", "400", True, True, 2.0)
    # bare ranges stay lexicographic term ranges, now with excl bounds
    q = parse_lucene("{sl TO so]")
    assert q == TermRangeQuery("sl", "so", False, True)
    q = parse_lucene("[sl TO *]")
    assert q == TermRangeQuery("sl", None, True, True)


def test_fielded_range_with_boost_in_boolean():
    from lucene_solr_spark.search.qparser import parse_lucene
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        FieldRangeQuery,
        TermQuery,
    )

    q = parse_lucene("+scan +n_chars:[200 TO 400]^3")
    assert isinstance(q, BooleanQuery)
    assert q.clauses[0].query == TermQuery("scan")
    assert q.clauses[0].occur == "MUST"
    assert q.clauses[1].query == FieldRangeQuery(
        "n_chars", "200", "400", True, True, 3.0
    )
    assert q.clauses[1].occur == "MUST"


def test_mm_spec_grammar():
    """SolrPluginUtils.calculateMinShouldMatch transliteration goldens
    (values cross-checked against the reference implementation's
    documented examples in SolrPluginUtils.java)."""
    from lucene_solr_spark.search.qparser import (
        calculate_min_should_match as mm,
    )

    assert mm(4, "3") == 3
    assert mm(4, "-1") == 3
    assert mm(4, "-5") == 0
    assert mm(4, "5") == 4  # capped at optional count
    assert mm(4, "75%") == 3
    assert mm(4, "-25%") == 3
    assert mm(3, "75%") == 2  # truncation toward zero (2.25 -> 2)
    assert mm(10, "33%") == 3
    # conditional: <=2 clauses -> all; 3-9 -> -25%; 10+ -> 3
    spec = "2<-25% 9<3"
    assert mm(2, spec) == 2
    assert mm(4, spec) == 3
    assert mm(12, spec) == 3
    # spec with spaces around '<'
    assert mm(4, "2 < -25% 9 < 3") == 3


def test_edismax_mm_string(spark=None):
    from lucene_solr_spark.search.qparser import parse_edismax
    from lucene_solr_spark.search.query import BooleanQuery

    q = parse_edismax("scan merge key hash", mm="75%")
    assert isinstance(q, BooleanQuery) and q.min_should_match == 3
    # conditional: at or below the bound, ALL optional clauses required
    q = parse_edismax("scan merge", mm="2<-25%")
    assert q.min_should_match == 2


def test_default_operator_and():
    """q.op semantics (QueryParserBase.addClause): bare terms MUST
    under AND; explicit OR relaxes the PRECEDING required clause; the
    default-OR behavior is unchanged."""
    from lucene_solr_spark.search.qparser import parse_lucene

    q = parse_lucene("scan merge", default_op="AND")
    assert [c.occur for c in q.clauses] == ["MUST", "MUST"]
    q = parse_lucene("scan OR merge", default_op="AND")
    assert [c.occur for c in q.clauses] == ["SHOULD", "SHOULD"]
    q = parse_lucene("scan merge OR key", default_op="AND")
    assert [c.occur for c in q.clauses] == ["MUST", "SHOULD", "SHOULD"]
    q = parse_lucene("scan AND merge OR key", default_op="OR")
    assert [c.occur for c in q.clauses] == ["MUST", "MUST", "SHOULD"]
    q = parse_lucene("-scan merge", default_op="AND")
    assert [c.occur for c in q.clauses] == ["MUST_NOT", "MUST"]


def test_parser_crash_freedom_fuzz():
    """Random query strings either parse or raise the parser's OWN
    error types — never an uncontrolled exception (the robustness
    contract of QueryParserBase.parse wrapping TokenMgrError)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_spark.search.qparser import (
        QueryParseError,
        parse_lucene,
    )
    from lucene_solr_spark.search.surround import (
        SurroundParseError,
        TooManyBasicQueries,
        parse_surround,
    )

    alphabet = 'abco ORANDT+-!()[]{}"~^*?:\\0123.5_'

    @given(st.text(alphabet=alphabet, max_size=30))
    @settings(max_examples=400, deadline=None)
    def check(s):
        try:
            parse_lucene(s)
        except QueryParseError:
            pass
        try:
            parse_lucene(s, default_op="AND")
        except QueryParseError:
            pass
        try:
            parse_surround(s)
        except (SurroundParseError, TooManyBasicQueries):
            pass

    check()
