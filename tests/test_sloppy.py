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


def test_repeated_terms_now_supported(tiny_searcher):
    """hasRpts phrases no longer raise; they score via the repeat walk."""
    out = tiny_searcher.search(PhraseQuery(["error", "error"], 2), 10)
    assert out.columns == ["doc_id", "score"]
    out.collect()  # must execute without NotImplementedError


# ---------------------------------------------------------------------
# Line-by-line Java transliteration of SloppyPhraseScorer (hasRpts path)
# used ONLY as a test reference: real binary heap (PriorityQueue.java
# add/pop/upHeap/downHeap), PhrasePositions objects, the rptStack
# re-queue dance — everything the production scan-queue walk optimizes
# away. Agreement over randomized inputs pins control-flow equivalence.
# ---------------------------------------------------------------------


class _PP:
    """PhrasePositions.java: position = raw - offset."""

    def __init__(self, arr, offset):
        self.arr, self.offset = arr, offset
        self.i = -1
        self.position = 0
        self.rptGroup = -1
        self.rptInd = -1

    def firstPosition(self):
        self.i = -1
        self.nextPosition()

    def nextPosition(self):
        self.i += 1
        if self.i < len(self.arr):
            self.position = int(self.arr[self.i]) - self.offset
            return True
        return False


class _PQ:
    """PriorityQueue.java binary heap with PhraseQueue.lessThan."""

    def __init__(self, max_size):
        self.heap = [None] * (max_size + 1)
        self.size = 0

    @staticmethod
    def lessThan(a, b):
        if a.position == b.position:
            return a.offset < b.offset
        return a.position < b.position

    def add(self, el):
        self.size += 1
        self.heap[self.size] = el
        self._up()

    def top(self):
        return self.heap[1]

    def pop(self):
        r = self.heap[1]
        self.heap[1] = self.heap[self.size]
        self.heap[self.size] = None
        self.size -= 1
        self._down()
        return r

    def clear(self):
        self.size = 0

    def _up(self):
        i = self.size
        node = self.heap[i]
        j = i >> 1
        while j > 0 and self.lessThan(node, self.heap[j]):
            self.heap[i] = self.heap[j]
            i = j
            j >>= 1
        self.heap[i] = node

    def _down(self):
        i = 1
        node = self.heap[i]
        j = i << 1
        k = j + 1
        if k <= self.size and self.lessThan(self.heap[k], self.heap[j]):
            j = k
        while j <= self.size and self.lessThan(self.heap[j], node):
            self.heap[i] = self.heap[j]
            i = j
            j = i << 1
            k = j + 1
            if k <= self.size and self.lessThan(
                self.heap[k], self.heap[j]
            ):
                j = k
        self.heap[i] = node


def java_sloppy_freq(terms, term_positions, slop):
    """Transliterated SloppyPhraseScorer.phraseFreq for one doc.
    ``term_positions[t]`` = sorted raw positions of term t."""
    from collections import Counter, defaultdict

    n = len(terms)
    pps = [_PP(term_positions[t], i) for i, t in enumerate(terms)]
    for pp in pps:
        pp.firstPosition()
    cnt = Counter(terms)
    groups = defaultdict(list)
    for pp, t in zip(pps, terms):
        if cnt[t] >= 2:
            groups[t].append(pp)
    rptGroups = []
    for t in groups:
        rg = sorted(groups[t], key=lambda p: p.offset)
        for j, pp in enumerate(rg):
            pp.rptGroup = len(rptGroups)
            pp.rptInd = j
        rptGroups.append(rg)
    hasRpts = bool(rptGroups)
    end = -(10**9)

    def advancePP(pp):
        nonlocal end
        if not pp.nextPosition():
            return False
        if pp.position > end:
            end = pp.position
        return True

    for rg in rptGroups:  # advanceRepeatGroups (non-MTP branch)
        for j in range(1, len(rg)):
            for _ in range(j):
                if not rg[j].nextPosition():
                    return 0.0
    pq = _PQ(n)
    pq.clear()
    for pp in pps:  # fillQueue
        if pp.position > end:
            end = pp.position
        pq.add(pp)

    def tpPos(pp):
        return pp.position + pp.offset

    def collide(pp):
        for pp2 in rptGroups[pp.rptGroup]:
            if pp2 is not pp and tpPos(pp2) == tpPos(pp):
                return pp2.rptInd
        return -1

    def lesser(a, b):
        if a.position < b.position or (
            a.position == b.position and a.offset < b.offset
        ):
            return a
        return b

    rptStack = [None] * n

    def advanceRpts(pp):
        if pp.rptGroup < 0:
            return True
        rg = rptGroups[pp.rptGroup]
        bits = set()
        k0 = pp.rptInd
        while True:
            k = collide(pp)
            if k < 0:
                break
            pp = lesser(pp, rg[k])
            if not advancePP(pp):
                return False
            if k != k0:
                bits.add(k)
        m = 0
        while bits:  # re-queue dance
            pp2 = pq.pop()
            rptStack[m] = pp2
            m += 1
            if pp2.rptGroup >= 0 and pp2.rptInd in bits:
                bits.discard(pp2.rptInd)
        for i in range(m - 1, -1, -1):
            pq.add(rptStack[i])
        return True

    freq = np.float32(0.0)
    pp = pq.pop()
    matchLength = end - pp.position
    nxt = pq.top().position
    while advancePP(pp):
        if hasRpts and not advanceRpts(pp):
            break
        if pp.position > nxt:
            if matchLength <= slop:
                freq = np.float32(
                    freq + np.float32(1.0) / np.float32(matchLength + 1)
                )
            pq.add(pp)
            pp = pq.pop()
            nxt = pq.top().position
            matchLength = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < matchLength:
                matchLength = ml2
    if matchLength <= slop:
        freq = np.float32(
            freq + np.float32(1.0) / np.float32(matchLength + 1)
        )
    return float(freq)


def _engine_freq(terms, term_positions, slop):
    from lucene_solr_spark.search.sloppy import (
        sloppy_freq,
        sloppy_freq_rpts,
    )

    plists = [
        np.asarray(term_positions[t], dtype=np.int64) - i
        for i, t in enumerate(terms)
    ]
    by_term = {}
    for i, t in enumerate(terms):
        by_term.setdefault(t, []).append(i)
    rpt_groups = [v for v in by_term.values() if len(v) > 1]
    if rpt_groups:
        return sloppy_freq_rpts(plists, slop, rpt_groups)
    return sloppy_freq(plists, slop)


def test_rpts_walk_matches_java_transliteration():
    """Production repeat walk (scan queue, no requeue dance) must equal
    the literal Java port over randomized repeated-term phrases."""
    import random

    rng = random.Random(42)
    shapes = [
        ["a", "a"],
        ["a", "a", "b"],
        ["a", "b", "a"],
        ["b", "a", "a"],
        ["a", "a", "a"],
        ["a", "b", "a", "b"],
        ["a", "a", "b", "b"],
        ["a", "b", "c", "a"],
    ]
    checked = 0
    for trial in range(3000):
        terms = rng.choice(shapes)
        uniq = sorted(set(terms))
        term_positions = {}
        ok = True
        for t in uniq:
            cnt = rng.randint(1, 6)
            term_positions[t] = sorted(
                rng.sample(range(0, 25), cnt)
            )
            # phraseFreq is only invoked on docs where every clause's
            # postings advanced to the doc; repeats need enough
            # occurrences only via init exhaustion (handled by both)
            if not term_positions[t]:
                ok = False
        if not ok:
            continue
        slop = rng.randint(0, 6)
        want = java_sloppy_freq(terms, term_positions, slop)
        got = _engine_freq(terms, term_positions, slop)
        assert got == pytest.approx(want, abs=0.0), (
            terms,
            term_positions,
            slop,
            got,
            want,
        )
        checked += 1
    assert checked >= 2500


def test_rpts_positive_freq_implies_valid_window():
    """Soundness: whenever the walk scores, a valid injective
    assignment (same-term clauses on distinct raw positions) with
    adjusted span <= slop must exist (brute-force enumeration)."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(400):
        terms = rng.choice(
            [["a", "a", "b"], ["a", "b", "a"], ["a", "a"]]
        )
        term_positions = {
            t: sorted(rng.sample(range(0, 15), rng.randint(1, 5)))
            for t in sorted(set(terms))
        }
        slop = rng.randint(0, 4)
        f = _engine_freq(terms, term_positions, slop)
        if f <= 0.0:
            continue
        found = False
        for combo in itertools.product(
            *[term_positions[t] for t in terms]
        ):
            by_t = {}
            inj = True
            for i, t in enumerate(terms):
                if combo[i] in by_t.setdefault(t, set()):
                    inj = False
                    break
                by_t[t].add(combo[i])
            if not inj:
                continue
            adj = [combo[i] - i for i in range(len(terms))]
            if max(adj) - min(adj) <= slop:
                found = True
                break
        assert found, (terms, term_positions, slop, f)


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
