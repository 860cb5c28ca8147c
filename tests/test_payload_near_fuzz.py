"""Fuzz pin for the PayloadNearQuery walk.

``_RefNearSpansOrdered`` is a TEST-ONLY line-by-line transliteration of
the reference NearSpansOrdered (lucene/core/src/java/org/apache/lucene/
search/spans/NearSpansOrdered.java:138-337) specialized to unit-length
term spans in one document, kept structurally faithful (next /
advanceAfterOrdered / stretchToOrder / shrinkToAfterShortestMatch as
separate methods with the reference's state flags) so it is an
independent control-flow oracle for the fused production walk in
lucene_solr_spark/search/payloads.py::_near_ordered_walk — the same
role tests/test_sloppy.py's SloppyPhraseScorer transliteration plays.
It is a verification instrument, not shipped engine code.
"""

import random

from lucene_solr_spark.search.payloads import _near_ordered_walk


class _Sub:
    """One clause's spans enum over a sorted position list."""

    def __init__(self, positions, payloads):
        self.pos_list = positions
        self.pay_list = payloads
        self.i = 0

    def start(self):
        return self.pos_list[self.i]

    def end(self):
        return self.pos_list[self.i] + 1

    def payload(self):
        return self.pay_list[self.i]

    def next(self):
        self.i += 1
        return self.i < len(self.pos_list)


class _RefNearSpansOrdered:
    def __init__(self, pos_lists, pay_lists, allowed_slop):
        self.sub = [
            _Sub(p, q) for p, q in zip(pos_lists, pay_lists)
        ]
        self.allowed_slop = allowed_slop
        self.more = True
        self.in_same_doc = True
        self.match_start = 0
        self.match_end = 0
        self.match_payload = []

    # next() :138-149 (single doc: first call initializes nothing extra)
    def next(self):
        self.match_payload = []
        return self._advance_after_ordered()

    def _advance_after_ordered(self):  # :182-189
        while self.more and self.in_same_doc:
            if self._stretch_to_order() and self._shrink():
                return True
        return False

    @staticmethod
    def _ordered(s1, s2):  # docSpansOrdered for equal-length spans
        start1, start2 = s1.start(), s2.start()
        return (
            start1 < start2
            if start1 != start2
            else s1.end() < s2.end()
        )

    def _stretch_to_order(self):  # :244-259
        for i in range(1, len(self.sub)):
            if not self.in_same_doc:
                break
            while not self._ordered(self.sub[i - 1], self.sub[i]):
                if not self.sub[i].next():
                    self.in_same_doc = False
                    self.more = False
                    break
        return self.in_same_doc

    def _shrink(self):  # shrinkToAfterShortestMatch :265-337
        last = self.sub[-1]
        self.match_start = last.start()
        self.match_end = last.end()
        possible_match_payloads = [last.payload()]
        match_slop = 0
        last_start = self.match_start
        last_end = self.match_end
        for i in range(len(self.sub) - 2, -1, -1):
            prev_spans = self.sub[i]
            possible_payload = prev_spans.payload()
            prev_start = prev_spans.start()
            prev_end = prev_spans.end()
            while True:
                if not prev_spans.next():
                    self.in_same_doc = False
                    self.more = False
                    break
                pp_start = prev_spans.start()
                pp_end = prev_spans.end()
                if not (
                    pp_start < last_start
                    if pp_start != last_start
                    else pp_end < last_end
                ):
                    break
                prev_start = pp_start
                prev_end = pp_end
                possible_payload = prev_spans.payload()
            possible_match_payloads.append(possible_payload)
            assert prev_start <= self.match_start
            if self.match_start > prev_end:
                match_slop += self.match_start - prev_end
            self.match_start = prev_start
            last_start = prev_start
            last_end = prev_end
        match = match_slop <= self.allowed_slop
        if match and possible_match_payloads:
            self.match_payload.extend(possible_match_payloads)
        return match


def _ref_freq_and_payloads(pos_lists, pay_lists, slop):
    """SpanScorer.setFreqCurrentDoc + BM25 sloppyFreq over the
    reference enumeration."""
    spans = _RefNearSpansOrdered(pos_lists, pay_lists, slop)
    freq = 0.0
    payloads = []
    while spans.next():
        freq += 1.0 / ((spans.match_end - spans.match_start) + 1)
        payloads.extend(spans.match_payload)
        if not spans.more:
            break
    return freq, payloads


def test_walk_matches_reference_transcription_fuzz():
    rng = random.Random(42)
    for case in range(3000):
        n = rng.randint(2, 4)
        vocab = rng.randint(1, 3)  # few distinct terms -> repeats
        term_of = [rng.randrange(vocab) for _ in range(n)]
        # positions per vocab term
        npos = rng.randint(1, 8)
        pos_by_term = {}
        pay_by_term = {}
        for t in range(vocab):
            ps = sorted(rng.sample(range(0, 25), rng.randint(1, npos)))
            pos_by_term[t] = ps
            pay_by_term[t] = [rng.randint(1, 9) for _ in ps]
        pos_lists = [list(pos_by_term[t]) for t in term_of]
        pay_lists = [list(pay_by_term[t]) for t in term_of]
        slop = rng.randint(0, 12)
        got = _near_ordered_walk(
            [list(p) for p in pos_lists],
            [list(p) for p in pay_lists],
            slop,
        )
        want = _ref_freq_and_payloads(
            [list(p) for p in pos_lists],
            [list(p) for p in pay_lists],
            slop,
        )
        assert abs(got[0] - want[0]) < 1e-12 and got[1] == want[1], (
            case, pos_lists, slop, got, want,
        )
