"""MultiPhraseQuery semantics (MultiPhraseQuery.java:52-88,281-295;
UnionDocsAndPositionsEnum :411-520; MultiPhraseWeight ctor :135-160)."""

import pytest

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import (
    MultiPhraseQuery,
    PhraseQuery,
    TermQuery,
    rewrite,
)


def _rows(df):
    return sorted(
        (int(r["doc_id"]), round(float(r["score"]), 6)) for r in df.collect()
    )


def test_all_singleton_slots_equal_phrase(tiny_index):
    s = Searcher(tiny_index)
    mp = s.score(MultiPhraseQuery([("error",), ("timeout",)]))
    ph = s.score(PhraseQuery(["error", "timeout"]))
    assert _rows(mp) == _rows(ph)


def test_superset_of_each_constituent_phrase_docset(tiny_index):
    # (a|b) c matches every doc "a c" matches and every doc "b c" matches
    s = Searcher(tiny_index)
    got = {d for d, _ in _rows(
        s.score(MultiPhraseQuery([("error", "retry"), ("timeout",)]))
    )}
    for alt in ("error", "retry"):
        sub = {d for d, _ in _rows(s.score(PhraseQuery([alt, "timeout"])))}
        assert sub <= got


def test_rewrite_rules():
    # all-singleton -> PhraseQuery; single slot -> SHOULD boolean
    q = rewrite(MultiPhraseQuery([("a",), ("b",)], slop=1, boost=2.0))
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("a", "b") and q.slop == 1 and q.boost == 2.0
    q2 = rewrite(MultiPhraseQuery([("a", "b")]))
    terms = {c.query.term for c in q2.clauses}
    assert terms == {"a", "b"}
    q3 = rewrite(MultiPhraseQuery([("a",)]))
    assert isinstance(q3, TermQuery) and q3.term == "a"


def test_missing_alternative_still_counts_idf(tiny_index):
    # a zero-df alternative can't add matches but raises the summed idf
    # weight (allTermStats includes df=0 terms) -> scores strictly grow
    s = Searcher(tiny_index)
    base = dict(_rows(s.score(MultiPhraseQuery([("error",), ("timeout",)]))))
    plus = dict(
        _rows(
            s.score(
                MultiPhraseQuery(
                    [("error", "zzznosuchterm"), ("timeout",)]
                )
            )
        )
    )
    assert set(base) == set(plus)
    assert all(plus[d] > base[d] for d in base)


def test_slot_with_no_indexed_alternative_is_empty(tiny_index):
    s = Searcher(tiny_index)
    out = s.score(MultiPhraseQuery([("zzznosuchterm",), ("timeout",)]))
    assert out.count() == 0


def test_sloppy_shared_term_across_slots_raises(tiny_index):
    s = Searcher(tiny_index)
    with pytest.raises(NotImplementedError):
        s.score(
            MultiPhraseQuery([("error", "retry"), ("retry",)], slop=1)
        ).collect()


def test_sloppy_singleton_slots_equal_sloppy_phrase(tiny_index):
    s = Searcher(tiny_index)
    # force the multi-phrase sloppy path (not the rewrite) by using a
    # 2-alt slot whose second alternative does not occur
    mp = s.score(
        MultiPhraseQuery([("error", "zzznosuchterm"), ("timeout",)], slop=2)
    )
    ph = s.score(PhraseQuery(["error", "timeout"], slop=2))
    got = {d for d, _ in _rows(mp)}
    want = {d for d, _ in _rows(ph)}
    assert got == want
