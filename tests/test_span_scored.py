"""Scored SpanNearQuery (SpanScorer.setFreqCurrentDoc +
Similarity.sloppyFreq) vs a hand-computed BM25-over-sloppy-freq oracle.

The NearSpansOrdered match enumeration itself is pinned independently in
tests/test_payload_near_fuzz.py (production ``_near_ordered_walk`` vs a
test-only Java transcription); this test pins the NEW layer on top —
SpanScorer's freq accumulation (sum of sloppyFreq(matchLength) =
1/(matchLength+1), BM25Similarity.java:71-73), the summed-idf weight
(SpanWeight extracts the clause term SET), and the quantized-norm BM25
combination — against explicit hand math on a corpus with known
positions.
"""

import math

from lucene_solr_spark.search.payloads import _near_ordered_walk

# text -> (quantized dl via floatToByte315 round-trip, checked in
# tests/test_norms.py; dl 2 -> 2.56, 3..4 -> 4.0, 5 -> 5.2244897...)
_QDL = {2: 2.56, 3: 4.0, 4: 4.0, 5: 5.224489795918368}

ROWS = [
    (0, "x y"),          # adjacent match
    (1, "x q y"),        # one-gap match
    (2, "x q q q y"),    # gap 3: matches only at slop >= 3
    (3, "x y x y"),      # two matches (walk advances past each)
    (4, "x q"),          # no y -> never matches
]


def _expected(slop, k1=1.2, b=0.75):
    n = len(ROWS)
    toks = {d: t.split() for d, t in ROWS}
    df_x = sum("x" in ts for ts in toks.values())
    df_y = sum("y" in ts for ts in toks.values())
    idf = math.log(1 + (n - df_x + 0.5) / (df_x + 0.5)) + math.log(
        1 + (n - df_y + 0.5) / (df_y + 0.5)
    )
    avgdl = sum(len(ts) for ts in toks.values()) / n
    out = []
    for d, ts in toks.items():
        px = [i for i, t in enumerate(ts) if t == "x"]
        py = [i for i, t in enumerate(ts) if t == "y"]
        if not px or not py:
            continue
        freq, _ = _near_ordered_walk([px, py], [px, py], slop)
        if freq <= 0.0:
            continue
        q = _QDL[len(ts)]
        out.append(
            (
                d,
                idf * (k1 + 1) * freq
                / (freq + k1 * ((1 - b) + b * q / avgdl)),
            )
        )
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def test_span_near_scored_hand_math(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spans import span_near_scored

    pdf = spark.createDataFrame(ROWS, "doc_id long, text string")
    s = Searcher(build_index(spark, pdf, cache=True))
    for slop in (0, 1, 2, 3, 5):
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in span_near_scored(s, ["x", "y"], slop, k=10).collect()
        ]
        want = _expected(slop)
        assert [g[0] for g in got] == [w[0] for w in want], (slop, got)
        for g, w in zip(got, want):
            assert abs(g[1] - w[1]) <= 1e-9 + 1e-6 * abs(w[1]), (
                slop,
                got,
                want,
            )


def test_span_near_scored_absent_term_empty(spark, tiny_index):
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spans import span_near_scored

    s = Searcher(tiny_index)
    assert (
        span_near_scored(s, ["scan", "zzznotaterm"], 4, k=10).count() == 0
    )


def test_span_near_scored_matches_unscored_docset(spark, tiny_index):
    """The scored variant's match set (any freq > 0) must equal the
    boolean span_near docset for the same (terms, slop)."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spans import span_near, span_near_scored

    s = Searcher(tiny_index)
    scored = {
        int(r["doc_id"])
        for r in span_near_scored(s, ["scan", "merge"], 4, k=10**6)
        .collect()
    }
    boolean = {
        int(r["doc_id"])
        for r in span_near(s, ["scan", "merge"], 4, in_order=True)
        .collect()
    }
    assert scored == boolean
