"""DelimitedPayloadTokenFilter parse + PayloadFunction semantics
(DelimitedPayloadTokenFilter.java:30-75, AveragePayloadFunction.java,
PayloadTermQuery.java:80-150)."""

import math

from lucene_solr_spark.search.payloads import (
    payload_term_topk,
    payload_token_rows,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_parse_splits_at_last_delimiter(spark):
    d = _df(spark, [(0, "Cat|3.0 dog|0.5 plain a|b|2")])
    got = {
        (r["pos"], r["term"], r["payload"])
        for r in payload_token_rows(d).collect()
    }
    assert (0, "cat", 3.0) in got
    assert (1, "dog", 0.5) in got
    assert (2, "plain", None) in got
    # LAST delimiter wins: term keeps everything before the first '|'
    # per substring_index(token, '|', 1); payload = after the last
    assert (3, "a", 2.0) in got


def test_no_payload_seen_defaults_to_one(spark):
    # 'plain' has tf=1 and no payloads -> payloadScore falls back to 1,
    # so its score equals the bare BM25 term score
    d = _df(
        spark,
        [(0, "plain x y"), (1, "other x z")],
    )
    got = {
        int(r["doc_id"]): float(r["score"])
        for r in payload_term_topk(d, "plain", "avg").collect()
    }
    # manual BM25: N=2, df=1, tf=1, dl=3 (floatToByte315 quantizes
    # dl=3 to 4.0 — byte 120 decodes to 0.5, 1/0.5^2), avgdl=3
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    want = idf * 2.2 * 1 / (1 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0))
    assert abs(got[0] - want) < 1e-9


def test_avg_vs_max_vs_min(spark):
    d = _df(spark, [(0, "t|1 t|5 t|3 u|9")])
    for func, want_pf in (("avg", 3.0), ("max", 5.0), ("min", 1.0)):
        got = payload_term_topk(d, "t", func).collect()[0]
        # tf=3, dl=4; score = bm25 * pf -> the pf ratio is exact
        base = payload_term_topk(d, "u", func).collect()[0]
        # u: tf=1 pf=9
        assert got["score"] > 0 and base["score"] > 0
        # derive pf by dividing out the bm25 part computed from formula
        idf = math.log(1 + (1 - 1 + 0.5) / (1 + 0.5))
        bm25_t = idf * 2.2 * 3 / (3 + 1.2 * (0.25 + 0.75 * 4 / 4.0))
        assert abs(got["score"] - bm25_t * want_pf) < 1e-9


def test_mixed_payload_and_plain_occurrences(spark):
    # only payloaded occurrences feed the average (payloadsSeen)
    d = _df(spark, [(0, "t|4 t t|2")])
    got = payload_term_topk(d, "t", "avg").collect()[0]
    idf = math.log(1 + 0.5 / 1.5)
    # dl=3 quantizes to 4.0 (floatToByte315), avgdl=3
    bm25_t = idf * 2.2 * 3 / (3 + 1.2 * (0.25 + 0.75 * 4.0 / 3.0))
    assert abs(got["score"] - bm25_t * 3.0) < 1e-9


def test_near_ordered_walk_hand_traces():
    """NearSpansOrdered walk fixtures traced by hand through
    NearSpansOrdered.java:182-337 (see each comment)."""
    from lucene_solr_spark.search.payloads import _near_ordered_walk as w

    # two disjoint matches: (0,2) len 3 -> 1/4; (5,7) len 3 -> 1/4
    freq, pays = w([[0, 5], [2, 7]], [[1, 2], [3, 4]], 10)
    assert freq == 0.5 and pays == [3, 1, 4, 2]
    # shrink picks the LATEST t1 before t2: (1,2), not (0,2)
    freq, pays = w([[0, 1], [2]], [[7, 8], [9]], 10)
    assert abs(freq - 1 / 3) < 1e-12 and pays == [9, 8]
    # slop 0: only the adjacent pair matches; the far pair is walked
    # but contributes nothing
    freq, pays = w([[0, 4], [1, 9]], [[1, 2], [3, 4]], 0)
    assert abs(freq - 1 / 3) < 1e-12 and pays == [3, 1]
    # 3 ordered clauses: one match spanning 0..4 -> len 5 -> 1/6
    freq, pays = w([[0], [2], [4]], [[1], [2], [3]], 10)
    assert abs(freq - 1 / 6) < 1e-12 and pays == [3, 2, 1]
    # same term in two clauses: strict ordering forces distinct
    # positions (docSpansOrdered equal-start is false)
    freq, pays = w([[3, 5], [3, 5]], [[1, 2], [1, 2]], 10)
    assert abs(freq - 1 / 4) < 1e-12 and pays == [2, 1]
    # no passing match at all
    freq, pays = w([[0], [9]], [[1], [2]], 0)
    assert freq == 0.0 and pays == []


def test_payload_near_topk_end_to_end(spark):
    import pandas as pd

    from lucene_solr_spark.search.payloads import payload_near_topk

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "scan|2 merge|4 x|1",          # adjacent, payloads 2,4
                "scan|1 x|1 x|1 merge|5",      # gap 2, payloads 1,5
                "merge|9 scan|9",              # wrong order: no match
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    rows = payload_near_topk(docs, ["scan", "merge"], 4, "avg", 10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == {0, 1}
    # doc0 freq 1/3 beats doc1 freq 1/5; both pf = 3.0
    assert got[0] > got[1]
    # max function
    rows = payload_near_topk(docs, ["scan", "merge"], 4, "max", 10).collect()
    got_max = {r["doc_id"]: r["score"] for r in rows}
    assert got_max[0] / got[0] == (4.0 / 3.0)
    assert got_max[1] / got[1] == (5.0 / 3.0)


def test_payload_near_null_payload_occurrences(spark):
    """Occurrences without a '|payload' suffix are invisible to the
    PayloadFunction (payloadsSeen not incremented) — and all-plain
    matches fall back to pf=1."""
    import pandas as pd

    from lucene_solr_spark.search.payloads import payload_near_topk

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "scan merge|4 x|1",   # scan carries no payload
                "scan merge x",       # no payloads at all -> pf 1.0
            ],
        }
    )
    docs = spark.createDataFrame(pdf)
    rows = payload_near_topk(docs, ["scan", "merge"], 4, "avg", 10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == {0, 1}
    # doc0 pf = avg([4.0]) = 4; doc1 pf = 1 -> doc0 scores 4x doc1
    assert abs(got[0] / got[1] - 4.0) < 1e-9


def test_span_payload_check_accepts_missing_payload(spark):
    from lucene_solr_spark.search.payloads import span_payload_check_topk

    docs = spark.createDataFrame(
        [
            (0, "scan|3.0 scan|1.0 x|2.0"),   # one accepted occurrence
            (1, "scan|1.0 scan|2.0"),         # zero accepted -> no match
            (2, "scan scan|3.0"),             # bare token accepted (YES
                                              # when no payload) + match
        ],
        "doc_id long, text string",
    )
    hits = {
        r["doc_id"]: r["score"]
        for r in span_payload_check_topk(docs, "scan", 3.0, k=10)
        .collect()
    }
    assert set(hits) == {0, 2}
    # doc 2 has freq 2 (payload-less occurrence accepted + exact match)
    # vs doc 1's zero; doc 0 freq 1
    assert hits[2] > hits[0]


def test_span_near_payload_check_filters_matches(spark):
    from lucene_solr_spark.search.payloads import (
        span_near_payload_check_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "scan|2.0 merge|4.0"),   # payloads {2,4} -> accepted
            (1, "scan|1.0 merge|4.0"),   # {1,4} -> rejected
            (2, "x|1.0 scan|4.0 merge|2.0"),  # {4,2} -> accepted
            (3, "merge|2.0 scan|4.0"),   # wrong order -> no match
        ],
        "doc_id long, text string",
    )
    hits = sorted(
        r["doc_id"]
        for r in span_near_payload_check_topk(
            docs, ["scan", "merge"], 4, [2.0, 4.0], k=10
        ).collect()
    )
    assert hits == [0, 2]
