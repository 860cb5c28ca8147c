"""WAND engagement cost model (search/wand.py): the seed-then-prune
walk must engage IFF the block metadata predicts its skipped decode
work repays the extra sequential job — replacing round-4's fixed
splits/postings floors with the measured break-even point.

Reference analogue: Lucene only builds skip lists past skipInterval
(lucene/core/.../codecs/lucene40/Lucene40SkipListWriter.java:53-93) —
the pruning machinery is bypassed where its own bookkeeping predicts
a loss."""

import pandas as pd
import pytest

from lucene_solr_spark.search import wand as W


def test_predicted_saving_counts_only_below_theta_hat(monkeypatch):
    monkeypatch.setattr(W, "_THETA_FRACTION", 0.5)
    # best bound 10 -> theta_hat 5; prunable splits: bounds 4 and 1
    cands = [(10.0, 100), (6.0, 200), (4.0, 300), (1.0, 400)]
    assert W.predicted_saving_postings(cands) == 700


def test_predicted_saving_single_split_is_zero():
    assert W.predicted_saving_postings([(10.0, 10_000_000)]) == 0
    assert W.predicted_saving_postings([]) == 0


def test_seed_never_decoded_as_saving(monkeypatch):
    # even with every other split prunable, the seed split's own
    # postings never count toward the saving
    monkeypatch.setattr(W, "_THETA_FRACTION", 1.0)
    monkeypatch.setattr(W, "_JOB_OVERHEAD_SEC", 1.0)
    monkeypatch.setattr(W, "_DECODE_POSTINGS_PER_SEC", 1000.0)
    cands = [(10.0, 5000), (9.0, 100)]
    # saving = 100 (split 2 only) < 1000 break-even -> loss
    assert not W.seed_walk_predicted_win(cands)


def test_win_iff_saving_exceeds_measured_overhead(monkeypatch):
    monkeypatch.setattr(W, "_THETA_FRACTION", 0.5)
    monkeypatch.setattr(W, "_JOB_OVERHEAD_SEC", 0.25)
    monkeypatch.setattr(W, "_DECODE_POSTINGS_PER_SEC", 10_000.0)
    # break-even = 2500 postings-equivalents
    below = [(10.0, 1), (1.0, 2500)]
    above = [(10.0, 1), (1.0, 2501)]
    assert not W.seed_walk_predicted_win(below)
    assert W.seed_walk_predicted_win(above)


@pytest.fixture(scope="module")
def skew_seg(spark, tmp_path_factory):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.index.segments import write_segments

    rows = []
    for i in range(2000):
        if i < 100:
            text = "gamma delta " * 8
        else:
            text = "gamma delta" + " pad" * 40
        rows.append((i, text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    idx = build_index(spark, spark.createDataFrame(pdf), cache=True)
    return write_segments(
        idx,
        str(tmp_path_factory.mktemp("wandcost") / "seg"),
        n_buckets=4,
        split_range=100,
    )


def test_walk_never_engages_on_predicted_loss(skew_seg, monkeypatch):
    """The 3-job walk must NOT engage when its own metadata predicts a
    loss — the round-4 prescription. Forced-loss model (infinite job
    overhead): every candidate decodes in the single one-shot job."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import And
    from lucene_solr_spark.search.wand import wand_and_search

    monkeypatch.setattr(W, "_JOB_OVERHEAD_SEC", 1e9)
    s = Searcher(skew_seg)
    stats: dict = {}
    got = wand_and_search(
        s, ["gamma", "delta"], 10, stats_out=stats
    ).collect()
    want = s.search(And("gamma", "delta"), 10, prune=False).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert stats["splits_decoded"] == stats["splits_all"]


def test_walk_engages_on_predicted_win(skew_seg, monkeypatch):
    """Same index, zero-overhead model: the predicted win engages the
    walk and the cold splits are pruned; results stay rank-identical."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import And
    from lucene_solr_spark.search.wand import wand_and_search

    monkeypatch.setattr(W, "_JOB_OVERHEAD_SEC", 0.0)
    s = Searcher(skew_seg)
    stats: dict = {}
    got = wand_and_search(
        s, ["gamma", "delta"], 10, stats_out=stats
    ).collect()
    want = s.search(And("gamma", "delta"), 10, prune=False).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) <= 1e-9 * max(1.0, abs(w["score"]))
    assert stats["splits_decoded"] < stats["splits_all"]


def test_decision_matches_model_on_real_metadata(skew_seg):
    """With the measured default constants, whichever branch runs must
    be the one the model predicts from this index's real metadata —
    the decision function and the executed plan cannot disagree."""
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.wand import wand_and_search

    s = Searcher(skew_seg)
    seen: dict = {}
    orig = W.seed_walk_predicted_win

    def spy(cands):
        seen["pred"] = orig(cands)
        return seen["pred"]

    W.seed_walk_predicted_win = spy
    try:
        stats: dict = {}
        wand_and_search(s, ["gamma", "delta"], 10, stats_out=stats).collect()
    finally:
        W.seed_walk_predicted_win = orig
    if seen["pred"]:
        assert stats["splits_decoded"] < stats["splits_all"]
    else:
        assert stats["splits_decoded"] == stats["splits_all"]
