"""The reference query set (FIXTURES.md §4): rank-identity between the
Spark engine and the independent numpy oracle — docIDs exact, scores within
1e-5 abs / 1e-3 rel (CheckHits.java:42), tie-break score desc / doc_id asc
(HitQueue.java:76-81). Run at tiny (200 turns) and small (5k turns)."""

import pytest

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import (
    And,
    BooleanClause,
    BooleanQuery,
    DisMaxQuery,
    Or,
    PhraseQuery,
    TermQuery,
)
from tests.conftest import assert_topk_equal

# (id, engine query factory, oracle evaluator)
QUERY_SET = [
    # --- single term: high/mid/low df, stopword (0 hits), absent term ---
    ("q01", lambda: TermQuery("error"), lambda o: o.query_term("error")),
    ("q02", lambda: TermQuery("fill0"), lambda o: o.query_term("fill0")),
    ("q03", lambda: TermQuery("timeout"), lambda o: o.query_term("timeout")),
    ("q04", lambda: TermQuery("cache55"), lambda o: o.query_term("cache55")),
    ("q05", lambda: TermQuery("the"), lambda o: o.query_term("the")),
    ("q06", lambda: TermQuery("zzz_absent"), lambda o: o.query_term("zzz_absent")),
    # mixed-case in corpus is lowercased at index time
    ("q07", lambda: TermQuery("timeout1"), lambda o: o.query_term("timeout1")),
    # --- AND ---
    ("q11", lambda: And("error", "timeout"),
     lambda o: o.query_and(["error", "timeout"])),
    ("q12", lambda: And("error", "fill0"),
     lambda o: o.query_and(["error", "fill0"])),
    ("q13", lambda: And("error", "timeout", "deploy"),
     lambda o: o.query_and(["error", "timeout", "deploy"])),
    ("q14", lambda: And("error", "zzz_absent"),
     lambda o: o.query_and(["error", "zzz_absent"])),
    ("q15", lambda: And("cache", "query", "index", "merge"),
     lambda o: o.query_and(["cache", "query", "index", "merge"])),
    # --- OR ---
    ("q19", lambda: Or("error", "timeout"),
     lambda o: o.query_or(["error", "timeout"])),
    ("q20", lambda: Or("error", "timeout", "deploy"),
     lambda o: o.query_or(["error", "timeout", "deploy"])),
    ("q21", lambda: Or("error", "zzz_absent"),
     lambda o: o.query_or(["error", "zzz_absent"])),
    ("q22", lambda: Or("cache", "query", "index", "merge", "shard"),
     lambda o: o.query_or(["cache", "query", "index", "merge", "shard"])),
    ("q23", lambda: Or("error", "timeout", "deploy", min_should_match=2),
     lambda o: o.query_or(["error", "timeout", "deploy"], min_should_match=2)),
    # --- NOT / req-excl ---
    ("q24",
     lambda: BooleanQuery(
         [BooleanClause(TermQuery("error"), "MUST"),
          BooleanClause(TermQuery("timeout"), "MUST_NOT")]),
     lambda o: o.query_not(["error"], ["timeout"])),
    # --- dismax ---
    ("q25", lambda: DisMaxQuery([TermQuery("error"), TermQuery("timeout")], 0.0),
     lambda o: o.query_dismax(["error", "timeout"], 0.0)),
    ("q26", lambda: DisMaxQuery([TermQuery("error"), TermQuery("timeout")], 0.3),
     lambda o: o.query_dismax(["error", "timeout"], 0.3)),
    # --- phrase ---
    ("q27", lambda: PhraseQuery(["error", "timeout"]),
     lambda o: o.query_phrase(["error", "timeout"])),
    # --- edge: repeated term in OR (scored per clause -> doubled) ---
    ("q28", lambda: Or("error", "error"),
     lambda o: {d: s * 2 for d, s in o.query_term("error").items()}),
]


@pytest.fixture(scope="module")
def tiny_searcher(tiny_index):
    return Searcher(tiny_index, exact_float32=True)


@pytest.fixture(scope="module")
def small_searcher(small_index):
    return Searcher(small_index, exact_float32=True)


@pytest.mark.parametrize("qid,qf,of", QUERY_SET, ids=[q[0] for q in QUERY_SET])
def test_tiny_rank_identity(qid, qf, of, tiny_searcher, tiny_oracle):
    got = tiny_searcher.search(qf(), 10).collect()
    want = tiny_oracle.top_k(of(tiny_oracle), 10)
    assert_topk_equal(got, want)


@pytest.mark.parametrize(
    "qid,qf,of",
    QUERY_SET[:1] + QUERY_SET[7:10] + QUERY_SET[12:15] + QUERY_SET[19:],
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_small_rank_identity(qid, qf, of, small_searcher, small_oracle):
    got = small_searcher.search(qf(), 10).collect()
    want = small_oracle.top_k(of(small_oracle), 10)
    assert_topk_equal(got, want)


def test_k_larger_than_hits(tiny_searcher, tiny_oracle):
    got = tiny_searcher.search(TermQuery("error"), 10_000).collect()
    want = tiny_oracle.top_k(tiny_oracle.query_term("error"), 10_000)
    assert_topk_equal(got, want)


def test_search_after_pagination(small_searcher, small_oracle):
    q = Or("error", "timeout", "deploy")
    full = small_oracle.top_k(
        small_oracle.query_or(["error", "timeout", "deploy"]), 20
    )
    page1 = small_searcher.search(q, 10).collect()
    assert_topk_equal(page1, full[:10])
    last = full[9]
    page2 = small_searcher.search_after(q, last[1], last[0], 10).collect()
    assert_topk_equal(page2, full[10:20])


def test_native_mode_same_ranking(tiny_index, tiny_oracle):
    """The double-precision whole-stage-codegen path must agree with the
    oracle within the CheckHits tolerance too (scores differ ~1e-8 rel)."""
    s = Searcher(tiny_index, exact_float32=False)
    got = s.search(Or("error", "timeout", "deploy"), 10).collect()
    want = tiny_oracle.top_k(
        tiny_oracle.query_or(["error", "timeout", "deploy"]), 10
    )
    assert_topk_equal(got, want)
