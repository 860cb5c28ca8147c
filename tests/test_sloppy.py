"""Sloppy phrase (SloppyPhraseScorer semantics): hand-computed goldens
from the reference Javadoc, engine-vs-oracle rank identity, and the
documented greedy-walk asymmetries."""

import numpy as np
import pytest

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import PhraseQuery
from lucene_solr_spark.search.sloppy import sloppy_freq
from tests.conftest import assert_topk_equal


@pytest.fixture(scope="module")
def tiny_searcher(tiny_index):
    return Searcher(tiny_index, exact_float32=True)


def test_javadoc_example_a_b_slop2():
    """SloppyPhraseScorer.java:60-63: for "a b"~2, doc "x a b a y" scores
    twice — "a b" (distance 0) and "b a" (distance 2)."""
    # adjusted positions: a(off 0) at [1, 3]; b(off 1) at [2-1] = [1]
    f = sloppy_freq([np.array([1, 3]), np.array([1])], 2)
    assert abs(f - (1.0 + 1.0 / 3.0)) < 1e-6


def test_exact_adjacency_slop0_shape():
    # "a b" adjacent once -> distance 0 -> freq 1
    f = sloppy_freq([np.array([5]), np.array([5])], 0)
    assert f == 1.0
    # "b a" reversed at distance 2 under slop 0 -> no match
    f = sloppy_freq([np.array([2]), np.array([0])], 0)
    assert f == 0.0


def test_reversed_within_slop():
    # doc "b a": a at 1 (adj 1), b at 0 (adj -1): distance 2
    f = sloppy_freq([np.array([1]), np.array([-1])], 2)
    assert abs(f - 1.0 / 3.0) < 1e-6
    assert sloppy_freq([np.array([1]), np.array([-1])], 1) == 0.0


def test_oracle_walk_agrees_with_engine_kernel(tiny_oracle):
    """The two independent transcriptions of phraseFreq (heap vs
    min-scan) agree on random position lists."""
    rng = np.random.default_rng(11)
    for _ in range(200):
        n = int(rng.integers(2, 4))
        pls = []
        for i in range(n):
            k = int(rng.integers(1, 6))
            pls.append(np.sort(rng.choice(30, size=k, replace=False)) - i)
        slop = int(rng.integers(0, 6))
        a = sloppy_freq([np.asarray(p) for p in pls], slop)
        b = tiny_oracle._sloppy_walk([sorted(int(x) for x in p) for p in pls], slop)
        assert abs(a - b) < 1e-6, (pls, slop, a, b)


@pytest.mark.parametrize("terms,slop", [
    (["key", "order"], 1),
    (["key", "order"], 3),
    (["scan", "merge"], 2),
    (["error", "timeout"], 4),
])
def test_sloppy_rank_identity(tiny_searcher, tiny_oracle, terms, slop):
    got = tiny_searcher.search(PhraseQuery(terms, slop), 10).collect()
    want = tiny_oracle.top_k(tiny_oracle.query_phrase_sloppy(terms, slop), 10)
    assert_topk_equal(got, want)


def test_repeated_terms_rejected(tiny_searcher):
    with pytest.raises(NotImplementedError):
        tiny_searcher.search(PhraseQuery(["error", "error"], 2), 10)


def test_closed_form_equals_walk_2clause():
    """The SQL oracle's chain form must equal the greedy walk for 2
    distinct clauses — the proof backing oracles.bm25_phrase_sloppy:
    c0 = max of the two heads (tie -> clause 1), c_{k+1} = first element
    of the opposite list > c_k; each c_k emits dist = c_k - (last
    element of the other list <= c_k); freq = float32-ordered sum of
    1/(dist+1) over dists <= slop."""
    import numpy as np

    from lucene_solr_spark.search.sloppy import sloppy_freq

    def chain_freq(la, lb, slop):
        if la[0] > lb[0]:
            c, ccl = la[0], 0
        else:
            c, ccl = lb[0], 1
        dists = []
        while True:
            other = lb if ccl == 0 else la
            dists.append(c - [x for x in other if x <= c][-1])
            nxt = [x for x in (lb if ccl == 0 else la) if x > c]
            if not nxt:
                break
            c, ccl = nxt[0], 1 - ccl
        acc = np.float32(0.0)
        for d in dists:
            if d <= slop:
                acc = np.float32(acc + np.float32(1.0) / np.float32(d + 1))
        return float(acc)

    rng = np.random.default_rng(99)
    for trial in range(2000):
        na, nb = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        a = sorted(rng.choice(40, size=na, replace=False).tolist())
        b = sorted(rng.choice(40, size=nb, replace=False).tolist())
        slop = int(rng.integers(0, 7))
        want = sloppy_freq(
            [np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)],
            slop,
        )
        got = chain_freq(a, b, slop)
        assert got == want, (trial, a, b, slop, got, want)
