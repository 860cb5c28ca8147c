"""Multi-field index + edismax qf/pf tests.

Reference model: per-field inversion state (dl, norms, df, avgdl) —
lucene/core/src/java/org/apache/lucene/index/FieldInvertState.java:29-36;
qf DisMax composition — solr/core/src/java/org/apache/solr/search/
DisMaxQParser.java:140-180.
"""

from __future__ import annotations

import math

import pytest

from lucene_solr_spark.index.fields import build_fielded_index
from lucene_solr_spark.search.fielded import FieldedSearcher
from lucene_solr_spark.search.query import TermQuery


@pytest.fixture(scope="module")
def fielded(spark):
    rows = [
        (0, "spark index", "spark builds the inverted index with merges"),
        (1, "query scan spark", "a scan query hits the postings and scores"),
        (2, "merge policy", "segment merge policy controls compaction"),
        (3, "spark scan", "spark scan over parquet with pushdown"),
        (4, "totally off", "unrelated text about gardens and rivers"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, title string, body string"
    )
    fidx = build_fielded_index(spark, docs, ["title", "body"], cache=True)
    return fidx, FieldedSearcher(fidx)


def test_per_field_stats_are_isolated(fielded):
    """df('spark') and avgdl must differ per field — title stats never
    leak into body scoring (FieldInvertState per-field model)."""
    fidx, _ = fielded
    t = fidx.field_view("title")
    b = fidx.field_view("body")
    assert t.term_stats(["spark"])["spark"][0] == 3
    assert b.term_stats(["spark"])["spark"][0] == 2
    assert t.stats.max_doc == b.stats.max_doc == 5
    assert t.stats.sum_total_term_freq < b.stats.sum_total_term_freq
    assert t.stats.avgdl != b.stats.avgdl


def test_fielded_bm25_uses_field_norms(fielded):
    """title:scan BM25 must use title's df/avgdl: verify the exact
    value against a hand-computed BM25 with the title field's stats."""
    fidx, fs = fielded
    tview = fidx.field_view("title")
    hits = {
        r["doc_id"]: r["score"]
        for r in fs.field_searcher("title").search(TermQuery("scan"), 5)
        .collect()
    }
    assert set(hits) == {1, 3}
    n = tview.stats.max_doc
    df = tview.term_stats(["scan"])["scan"][0]
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    # title dl: doc 1 has 3 tokens, doc 3 has 2; small dls quantize to
    # themselves exactly
    from lucene_solr_spark.index.norms import NORM_TABLE, encode_norm

    avgdl = float(tview.stats.sum_total_term_freq) / float(n)

    def want(dl: int) -> float:
        qdl = float(NORM_TABLE[int(encode_norm([dl])[0])])
        return idf * (1.2 + 1) * 1.0 / (
            1.0 + 1.2 * ((1 - 0.75) + 0.75 * qdl / avgdl)
        )

    assert hits[1] == pytest.approx(want(3), rel=1e-12)
    assert hits[3] == pytest.approx(want(2), rel=1e-12)


def test_edismax_equals_manual_composition(fielded):
    """search_edismax must equal dismax(title^2, body) composed by hand
    from the per-field searchers (sum over terms of per-term max +
    tie*(sum-max))."""
    fidx, fs = fielded
    terms, tie = ["spark", "merge"], 0.3
    got = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(
            terms, {"title": 2.0, "body": 1.0}, tie=tie
        ).collect()
    }
    # manual: per (field, term) score maps
    per = {}
    for field, boost in (("title", 2.0), ("body", 1.0)):
        s = fs.field_searcher(field)
        for t in terms:
            for r in s.score(TermQuery(t, boost=boost)).collect():
                per.setdefault((r["doc_id"], t), []).append(r["score"])
    want: dict[int, float] = {}
    for (doc, _t), scores in per.items():
        dm = max(scores) + tie * (sum(scores) - max(scores))
        want[doc] = want.get(doc, 0.0) + dm
    assert set(got) == set(want)
    for doc in want:
        assert got[doc] == pytest.approx(want[doc], rel=1e-12)


def test_edismax_pf_adds_phrase_boost(fielded):
    """pf adds the phrase score only for docs where the terms occur
    adjacently in the pf field, on top of the main-query score."""
    fidx, fs = fielded
    base = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(
            ["segment", "merge"], {"body": 1.0}
        ).collect()
    }
    boosted = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(
            ["segment", "merge"], {"body": 1.0}, pf={"body": 2.0}
        ).collect()
    }
    assert set(base) == set(boosted)
    # doc 2 has "segment merge" adjacent in body -> strictly boosted
    assert boosted[2] > base[2]
    # docs matching terms but not the phrase keep their base score
    for doc in base:
        if doc != 2:
            assert boosted[doc] == pytest.approx(base[doc], rel=1e-12)


def test_field_view_unknown_field(fielded):
    fidx, _ = fielded
    with pytest.raises(KeyError):
        fidx.field_view("nope")


def test_parse_qf():
    from lucene_solr_spark.search.fielded import parse_qf

    assert parse_qf("title^2 body") == {"title": 2.0, "body": 1.0}
    assert parse_qf("a^0.5 b^3 c") == {"a": 0.5, "b": 3.0, "c": 1.0}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_qf("   ")


def test_fielded_segment_store_rank_identity(fielded, tmp_path_factory):
    """edismax over per-field SEGMENT stores (PerFieldPostingsFormat
    analogue: one block-encoded store per field) must equal the flat
    fielded index exactly — codec round-trip per field."""
    from lucene_solr_spark.index.fields import write_fielded_segments

    fidx, fs = fielded
    d = str(tmp_path_factory.mktemp("fseg"))
    seg = write_fielded_segments(fidx, d, n_buckets=4)
    fs_seg = FieldedSearcher(seg)
    want = fs.search_edismax(
        ["spark", "merge"], {"title": 2.0, "body": 1.0}, tie=0.3, k=10
    ).collect()
    got = fs_seg.search_edismax(
        ["spark", "merge"], {"title": 2.0, "body": 1.0}, tie=0.3, k=10
    ).collect()
    assert [(r["doc_id"], round(r["score"], 10)) for r in got] == [
        (r["doc_id"], round(r["score"], 10)) for r in want
    ]
    # per-field stores on disk, field-pruned bucket layout
    import os

    assert sorted(os.listdir(d)) == ["body", "title"]


def test_edismax_repeated_term_scores_per_occurrence(fielded):
    """edismax builds one SHOULD clause per user-term occurrence: a
    duplicated term scores twice and counts toward mm twice (r3 advice
    #2 — the dedup'd composition scored it once)."""
    fidx, fs = fielded
    qf = {"title": 2.0, "body": 1.0}
    single = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(["spark"], qf, tie=0.3).collect()
    }
    doubled = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(
            ["spark", "spark"], qf, tie=0.3, mm=2
        ).collect()
    }
    # same match set (dup counts toward mm=2), exactly doubled scores
    assert set(doubled) == set(single)
    for doc, sc in single.items():
        assert doubled[doc] == pytest.approx(2 * sc, rel=1e-12)
    mixed = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(
            ["spark", "spark", "merge"], qf, tie=0.3
        ).collect()
    }
    merge_only = {
        r["doc_id"]: r["score"]
        for r in fs.score_edismax(["merge"], qf, tie=0.3).collect()
    }
    for doc in mixed:
        want = 2 * single.get(doc, 0.0) + merge_only.get(doc, 0.0)
        assert mixed[doc] == pytest.approx(want, rel=1e-12)


def test_copyfield_position_increment_gap(spark):
    """copyField multi-value: a phrase NEVER matches across the value
    boundary (positionIncrementGap), while df/dl treat the values as
    one field and within-value phrases still match."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.fields import build_fielded_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import PhraseQuery, TermQuery

    rows = [
        (0, "alpha beta", "gamma delta"),
        (1, "alpha", "beta gamma"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, t1 string, t2 string"
    )
    fidx = build_fielded_index(
        spark, docs, {"all": ["t1", "t2"]}, cache=True
    )
    s = Searcher(fidx.field_view("all"))
    # within-value phrase matches
    hits = {r["doc_id"] for r in s.search(PhraseQuery(["alpha", "beta"]), 10).collect()}
    assert hits == {0}
    # cross-boundary phrase does not (doc 0: beta|gamma spans values)
    hits = {r["doc_id"] for r in s.search(PhraseQuery(["beta", "gamma"]), 10).collect()}
    assert hits == {1}
    # but both terms count toward the one field (AND matches doc 0)
    both = {r["doc_id"] for r in s.search(TermQuery("gamma"), 10).collect()}
    assert both == {0, 1}
