"""Algebraic equivalence properties, mirroring
lucene/test-framework/.../search/SearchEquivalenceTestBase.java:46-164,
plus the BASELINE.json per-row invariant and partition-count invariance."""

import pyspark.sql.functions as F

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import And, Or, TermQuery


def _docset(searcher, q):
    return {
        int(r["doc_id"]) for r in searcher.score(q).select("doc_id").collect()
    }


def test_and_subset_term_subset_or(tiny_index):
    s = Searcher(tiny_index)
    a, b = "error", "timeout"
    and_set = _docset(s, And(a, b))
    term_set = _docset(s, TermQuery(a))
    or_set = _docset(s, Or(a, b))
    assert and_set <= term_set <= or_set


def test_single_clause_and_equals_term(tiny_index):
    s = Searcher(tiny_index, exact_float32=True)
    got_and = {
        (int(r["doc_id"]), float(r["score"]))
        for r in s.score(And("error")).collect()
    }
    got_term = {
        (int(r["doc_id"]), float(r["score"]))
        for r in s.score(TermQuery("error")).collect()
    }
    assert got_and == got_term


def test_msm_monotone(tiny_index):
    s = Searcher(tiny_index)
    terms = ("error", "timeout", "deploy")
    s1 = _docset(s, Or(*terms, min_should_match=1))
    s2 = _docset(s, Or(*terms, min_should_match=2))
    s3 = _docset(s, Or(*terms, min_should_match=3))
    assert s3 <= s2 <= s1
    assert s3 == _docset(s, And(*terms))


def test_partition_count_invariance(spark, tiny_pdf, tiny_oracle):
    """Same results at any parallelism level (north rule: identical output
    at N and 4N)."""
    from lucene_solr_spark.index.builder import build_index

    for nparts in (1, 7):
        sdf = spark.createDataFrame(
            tiny_pdf.drop(columns=["doc_id"])
        ).repartition(nparts, "conv_id")
        idx = build_index(spark, sdf)
        s = Searcher(idx, exact_float32=True)
        got = s.search(Or("error", "timeout"), 10).collect()
        want = tiny_oracle.top_k(
            tiny_oracle.query_or(["error", "timeout"]), 10
        )
        from tests.conftest import assert_topk_equal

        assert_topk_equal(got, want)


def test_per_turn_text_invariant(tiny_index, tiny_pdf):
    """BASELINE.json invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering between input and engine doc store."""
    docs = (
        tiny_index.docs.select("conv_id", "turn_idx", "doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    assert len(docs) == len(tiny_pdf)
    for r, (_, row) in zip(docs, tiny_pdf.iterrows()):
        assert int(r["doc_id"]) == int(row["doc_id"])
        assert r["conv_id"] == row["conv_id"]
        assert int(r["turn_idx"]) == int(row["turn_idx"])
        assert r["text"] == row["text"]


def test_docids_dense_and_ordered(tiny_index):
    n = tiny_index.stats.max_doc
    rows = tiny_index.docs.select("doc_id", "conv_id", "turn_idx").collect()
    ids = sorted(int(r["doc_id"]) for r in rows)
    assert ids == list(range(n))
    by_id = sorted(rows, key=lambda r: int(r["doc_id"]))
    keys = [(r["conv_id"], int(r["turn_idx"])) for r in by_id]
    assert keys == sorted(keys)
