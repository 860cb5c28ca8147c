"""Scored joins (JoinUtil score modes / ToParentBlockJoin) and grouping
extras (ngroups, group.facet) — r3 verdict items #3 and #7."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.grouping import group_facet, grouped_topk
from lucene_solr_spark.search.joins import (
    block_join_parent_scores,
    join_scored,
)


@pytest.fixture(scope="module")
def frames(spark):
    # from side: (key, score) child hits; to side: parents
    child = spark.createDataFrame(
        [
            ("a", 1.0), ("a", 3.0), ("a", 2.0),
            ("b", 10.0),
            ("c", 4.0), ("c", 6.0),
        ],
        "k string, score double",
    )
    parent = spark.createDataFrame(
        [("a", "pa"), ("b", "pb"), ("d", "pd")], "k string, name string"
    )
    return child, parent


def test_join_scored_modes(frames):
    child, parent = frames
    for mode, want in [
        ("avg", {"a": 2.0, "b": 10.0}),
        ("max", {"a": 3.0, "b": 10.0}),
        ("total", {"a": 6.0, "b": 10.0}),
        ("none", {"a": 1.0, "b": 1.0}),
    ]:
        got = {
            r["k"]: r["score"]
            for r in join_scored(child, "k", parent, "k", mode).collect()
        }
        # 'd' has no from-side hits -> excluded; 'c' has no parent
        assert got == want, (mode, got)


def test_join_scored_bad_mode(frames):
    child, parent = frames
    with pytest.raises(ValueError):
        join_scored(child, "k", parent, "k", "bogus")


def test_block_join_parent_scores_modes(frames):
    child, _ = frames
    got = {
        r["k"]: r["score"]
        for r in block_join_parent_scores(child, "k", "avg").collect()
    }
    assert got == {"a": 2.0, "b": 10.0, "c": 5.0}
    got_t = {
        r["k"]: r["score"]
        for r in block_join_parent_scores(child, "k", "total").collect()
    }
    assert got_t == {"a": 6.0, "b": 10.0, "c": 10.0}


def test_grouped_topk_ngroups(spark):
    scored = spark.createDataFrame(
        [(0, 5.0), (1, 4.0), (2, 3.0), (3, 2.0), (4, 1.0)],
        "doc_id long, score double",
    )
    docs = spark.createDataFrame(
        [(0, "en"), (1, "en"), (2, "en"), (3, "de"), (4, "fr")],
        "doc_id long, lang string",
    )
    rows = grouped_topk(
        scored, docs, "lang", per_group=2, ngroups=True
    ).collect()
    assert all(r["ngroups"] == 3 for r in rows)
    en = sorted(r["doc_id"] for r in rows if r["lang"] == "en")
    assert en == [0, 1]  # top-2 only, doc 2 cut
    assert len(rows) == 4


def test_group_facet_counts_groups_not_docs(spark):
    scored = spark.createDataFrame(
        [(i, 1.0) for i in range(6)], "doc_id long, score double"
    )
    docs = spark.createDataFrame(
        [
            (0, "en", "s0"), (1, "en", "s0"), (2, "de", "s0"),
            (3, "en", "s1"), (4, "en", "s1"), (5, "en", "s1"),
        ],
        "doc_id long, lang string, source string",
    )
    got = {
        r["source"]: r["cnt"]
        for r in group_facet(scored, docs, "lang", "source").collect()
    }
    # s0 has docs from 2 distinct lang groups, s1 from 1 — doc counts
    # (3 and 3) must NOT leak through
    assert got == {"s0": 2, "s1": 1}


def test_grouped_topk_group_sort(spark):
    """group.sort orders WITHIN groups by the field (asc, doc_id
    tiebreak) instead of score; membership per group still per_group."""
    scored = spark.createDataFrame(
        [(0, 5.0), (1, 4.0), (2, 3.0), (3, 2.0)],
        "doc_id long, score double",
    )
    docs = spark.createDataFrame(
        [(0, "en", 900), (1, "en", 100), (2, "en", 500), (3, "de", 7)],
        "doc_id long, lang string, n_chars long",
    )
    rows = grouped_topk(
        scored, docs, "lang", per_group=2, group_sort="n_chars asc"
    ).collect()
    en = sorted(r["doc_id"] for r in rows if r["lang"] == "en")
    assert en == [1, 2]  # smallest n_chars win, not highest score
    assert len(rows) == 3
    # desc flips the representatives
    rows_d = grouped_topk(
        scored, docs, "lang", per_group=1, group_sort="n_chars desc"
    ).collect()
    assert {r["doc_id"] for r in rows_d if r["lang"] == "en"} == {0}
