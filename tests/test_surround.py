"""Surround query language: parser AST/precedence/errors + evaluator
equivalence against the independent brute-force oracle engine.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj (grammar + constants) and
query/DistanceQuery.java (slop = distance - 1, span translation).
"""

import pytest

from lucene_solr_spark.search.surround import (
    SrndAnd,
    SrndDistance,
    SrndNot,
    SrndOr,
    SrndPrefix,
    SrndTerm,
    SrndTrunc,
    SurroundParseError,
    parse_surround,
)


# ------------------------------------------------------------- parser


def test_infix_w_is_ordered_distance():
    q = parse_surround("scan 2W merge")
    assert q == SrndDistance(
        (SrndTerm("scan"), SrndTerm("merge")), 2, ordered=True
    )


def test_infix_n_is_unordered_and_defaults_to_1():
    q = parse_surround("scan n merge")
    assert q == SrndDistance(
        (SrndTerm("scan"), SrndTerm("merge")), 1, ordered=False
    )


def test_prefix_forms():
    assert parse_surround("3N(a, b, c)") == SrndDistance(
        (SrndTerm("a"), SrndTerm("b"), SrndTerm("c")), 3, ordered=False
    )
    assert parse_surround("AND(a, b)") == SrndAnd(
        (SrndTerm("a"), SrndTerm("b"))
    )
    assert parse_surround("or(a, b)") == SrndOr(
        (SrndTerm("a"), SrndTerm("b"))
    )


def test_precedence_or_and_not_n_w():
    # a OR b AND c  ->  OR(a, AND(b, c))
    q = parse_surround("a OR b AND c")
    assert isinstance(q, SrndOr)
    assert q.clauses[0] == SrndTerm("a")
    assert isinstance(q.clauses[1], SrndAnd)
    # a AND b NOT c -> AND(a, NOT(b, c))  (NOT binds tighter)
    q = parse_surround("a AND b NOT c")
    assert isinstance(q, SrndAnd)
    assert isinstance(q.clauses[1], SrndNot)
    # a NOT b 2N c -> NOT(a, N(b, c));  W binds tighter than N:
    q = parse_surround("a 2N b W c")
    assert isinstance(q, SrndDistance) and not q.ordered
    assert isinstance(q.clauses[1], SrndDistance) and q.clauses[1].ordered


def test_left_assoc_pairwise_distance():
    # a W b W c  ->  W(W(a,b), c) pairwise (QueryParser.jj WQuery)
    q = parse_surround("a w b w c")
    assert isinstance(q, SrndDistance) and q.ordered
    assert isinstance(q.clauses[0], SrndDistance)
    assert q.clauses[0].clauses == (SrndTerm("a"), SrndTerm("b"))


def test_prefix_and_trunc_terms():
    q = parse_surround("mer* W key")
    assert q.clauses[0] == SrndPrefix("mer")
    q = parse_surround("m?rge OR sc*n")
    assert q.clauses == (SrndTrunc("m?rge"), SrndTrunc("sc*n"))


def test_quoted_term_no_wildcards():
    q = parse_surround('"mer*"')
    assert q == SrndTerm("mer*")


def test_boost_parsed_and_composed():
    q = parse_surround("scan^2 W merge")
    assert q.clauses[0].boost == 2.0
    q = parse_surround("(scan OR merge)^3")
    assert isinstance(q, SrndOr) and q.boost == 3.0


def test_parse_errors():
    with pytest.raises(SurroundParseError):
        parse_surround("ab*")  # prefix shorter than 3
    with pytest.raises(SurroundParseError):
        parse_surround("a?b")  # < 3 literal chars in truncation
    with pytest.raises(SurroundParseError):
        parse_surround("scan merge")  # no implicit operator
    with pytest.raises(SurroundParseError):
        parse_surround("scan AND")  # dangling operator
    with pytest.raises(SurroundParseError):
        parse_surround("NOT(a, b)")  # NOT has no prefix form
    with pytest.raises(SurroundParseError):
        parse_surround("(scan W merge")  # unbalanced paren


def test_and_not_rejected_inside_distance(spark, tiny_index):
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.surround import surround_doc_ids

    s = Searcher(tiny_index)
    with pytest.raises(SurroundParseError):
        surround_doc_ids(s, "(scan AND merge) W key")


# ---------------------------------------------------------- evaluator


def _brute_docs(pdf, pred):
    """Doc ids of tiny corpus rows whose analyzed positions satisfy
    pred(positions_by_term) — an independent per-doc reimplementation."""
    from lucene_solr_spark.analysis.tokenizer import analyze

    out = []
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        terms, positions = analyze(text)
        by_term = {}
        for term, pos in zip(terms, positions):
            by_term.setdefault(term, []).append(pos)
        if pred(by_term):
            out.append(int(doc_id))
    return sorted(out)


@pytest.fixture(scope="module")
def searcher(small_index):
    from lucene_solr_spark.search.executor import Searcher

    return Searcher(small_index)


def _got(searcher, q):
    from lucene_solr_spark.search.surround import surround_doc_ids

    return sorted(
        r["doc_id"] for r in surround_doc_ids(searcher, q).collect()
    )


def test_w_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        return any(
            0 < q - p <= 2
            for p in bt.get("error", [])
            for q in bt.get("shard", [])
        )

    want = _brute_docs(small_pdf, pred)
    assert want and _got(searcher, "error 2w shard") == want


def test_n_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        return any(
            p != q and abs(q - p) <= 3
            for p in bt.get("query", [])
            for q in bt.get("retry", [])
        )

    want = _brute_docs(small_pdf, pred)
    assert want and _got(searcher, "3n(query, retry)") == want


def test_nested_distance_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        spans = [
            (p, p + 2)
            for p in bt.get("error", [])
            if p + 1 in bt.get("shard", [])
        ]
        return any(
            max(e, k + 1) - min(s, k) - 3 <= 8
            for (s, e) in spans
            for k in bt.get("retry", [])
        )

    assert _got(searcher, "(error w shard) 9n retry") == _brute_docs(
        small_pdf, pred
    )


def test_bool_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        return (
            "error" in bt
            and ("shard" in bt or "retry" in bt)
            and "commit" not in bt
        )

    want = _brute_docs(small_pdf, pred)
    assert want and _got(
        searcher, "error AND ((shard OR retry) NOT commit)"
    ) == want


def test_or_inside_w_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        firsts = bt.get("error", []) + bt.get("merge", [])
        return any(
            0 < q - p <= 3
            for p in firsts
            for q in bt.get("shard", [])
        )

    want = _brute_docs(small_pdf, pred)
    assert want and _got(searcher, "(error or merge) 3w shard") == want


def test_prefix_expansion_matches_brute_force(searcher, small_pdf):
    def pred(bt):
        firsts = [
            p
            for t, ps in bt.items()
            if t.startswith("err")
            for p in ps
        ]
        return any(
            q == p + 1 for p in firsts for q in bt.get("shard", [])
        )

    want = _brute_docs(small_pdf, pred)
    assert want and _got(searcher, "err* w shard") == want


def test_too_many_basic_queries(searcher):
    # the synthetic corpus has >>1000 distinct 'rar…' terms, so the
    # DEFAULT BasicQueryFactory cap trips without any monkeypatching
    import lucene_solr_spark.search.surround as sur

    with pytest.raises(sur.TooManyBasicQueries):
        sur.surround_doc_ids(searcher, "rar* W shard").count()


def test_fq_surround_dispatch(searcher, small_pdf):
    """{!surround} fq entries route through the handler's QParserPlugin
    dispatch (SurroundQParserPlugin.java) as a non-scoring filter."""
    from lucene_solr_spark.search.handler import select

    out = select(
        searcher,
        q="error",
        fq=["{!surround}error 2w shard"],
        rows=100,
    )["response"].collect()

    def pred(bt):
        return any(
            0 < q - p <= 2
            for p in bt.get("error", [])
            for q in bt.get("shard", [])
        )

    want = set(_brute_docs(small_pdf, pred))
    assert out and {r["doc_id"] for r in out} <= want


def test_xml_parser_elements(searcher, small_pdf):
    """CoreParser XML elements: UserQuery routing, TermsQuery analysis,
    SpanFirst/SpanNot doc sets, error paths."""
    import pytest as _pytest

    from lucene_solr_spark.search.query import (
        BooleanQuery,
        MatchAllQuery,
        TermQuery,
    )
    from lucene_solr_spark.search.xmlparser import (
        XmlQueryError,
        parse_xml_query,
        xml_span_doc_ids,
    )

    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllQuery()
    q = parse_xml_query("<TermsQuery>Error AND shard</TermsQuery>")
    assert isinstance(q, BooleanQuery)
    # analyzed: lowercased, stopword 'and' dropped
    assert [c.query.term for c in q.clauses] == ["error", "shard"]
    uq = parse_xml_query("<UserQuery>error retry</UserQuery>")
    assert uq is not None
    tq = parse_xml_query('<TermQuery boost="2.5">Error</TermQuery>')
    assert tq == TermQuery("Error", boost=2.5)  # raw, no analysis
    with _pytest.raises(XmlQueryError):
        parse_xml_query("<Nope>x</Nope>")
    with _pytest.raises(XmlQueryError):
        parse_xml_query(
            '<BooleanQuery><Clause occurs="weird">'
            "<TermQuery>x</TermQuery></Clause></BooleanQuery>"
        )

    # SpanFirst == the span_first semantics (e <= end)
    got = sorted(
        r["doc_id"]
        for r in xml_span_doc_ids(
            searcher, '<SpanFirst end="3"><SpanTerm>error</SpanTerm></SpanFirst>'
        ).collect()
    )
    from lucene_solr_spark.analysis.tokenizer import analyze

    want = sorted(
        int(d)
        for d, t in zip(small_pdf["doc_id"], small_pdf["text"])
        if any(
            p + 1 <= 3
            for tm, p in zip(*analyze(t))
            if tm == "error"
        )
    )
    assert got == want
    # SpanNot: include spans minus overlapping excludes
    got = sorted(
        r["doc_id"]
        for r in xml_span_doc_ids(
            searcher,
            "<SpanNot><SpanTerm>error</SpanTerm>"
            "<SpanTerm>error</SpanTerm></SpanNot>",
        ).collect()
    )
    assert got == []  # every include overlaps itself


# ------------------------------------------------- parser properties


def _print_srnd(q) -> str:
    """Minimal printer for round-trip testing (parenthesizes every
    composite, so precedence never has to be reproduced)."""
    from lucene_solr_spark.search.surround import (
        SrndAnd,
        SrndDistance,
        SrndNot,
        SrndOr,
        SrndPrefix,
        SrndTerm,
        SrndTrunc,
    )

    if isinstance(q, SrndTerm):
        return q.text
    if isinstance(q, SrndPrefix):
        return q.prefix + "*"
    if isinstance(q, SrndTrunc):
        return q.pattern
    if isinstance(q, SrndOr):
        return "(" + " OR ".join(_print_srnd(c) for c in q.clauses) + ")"
    if isinstance(q, SrndAnd):
        return "(" + " AND ".join(_print_srnd(c) for c in q.clauses) + ")"
    if isinstance(q, SrndNot):
        return "(" + " NOT ".join(_print_srnd(c) for c in q.clauses) + ")"
    if isinstance(q, SrndDistance):
        op = f"{q.distance}{'W' if q.ordered else 'N'}"
        return (
            op + "(" + ", ".join(_print_srnd(c) for c in q.clauses) + ")"
        )
    raise TypeError(q)


def test_parser_roundtrip_property():
    """print(parse(x)) reparses to the identical AST for randomly
    generated query trees (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_spark.search.surround import (
        SrndAnd,
        SrndDistance,
        SrndNot,
        SrndOr,
        SrndPrefix,
        SrndTerm,
        parse_surround,
    )

    words = st.text(alphabet="abcdefg", min_size=1, max_size=6)
    terms = words.map(SrndTerm)
    prefixes = st.text(alphabet="abcdefg", min_size=3, max_size=6).map(
        SrndPrefix
    )
    leaves = st.one_of(terms, prefixes)

    def composite(children):
        two_plus = st.lists(children, min_size=2, max_size=3).map(tuple)
        return st.one_of(
            two_plus.map(SrndOr),
            two_plus.map(SrndAnd),
            two_plus.map(SrndNot),
            st.tuples(
                two_plus, st.integers(min_value=1, max_value=99),
                st.booleans(),
            ).map(lambda t: SrndDistance(t[0], t[1], t[2])),
        )

    trees = st.recursive(leaves, composite, max_leaves=8)

    @given(trees)
    @settings(max_examples=200, deadline=None)
    def check(q):
        assert parse_surround(_print_srnd(q)) == q

    check()
