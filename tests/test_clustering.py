"""Search-result clustering (ClusteringComponent analogue):
determinism, size conservation, label/centroid sanity."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    return Searcher(build_index(spark, docs, cache=True))


def test_cluster_results_basic(searcher):
    from lucene_solr_spark.search.clustering import cluster_results

    rows = cluster_results(
        searcher, "scan", k_docs=80, n_clusters=3
    ).collect()
    assert [r["cluster"] for r in rows] == [0, 1, 2]
    # every top-80 hit lands in exactly one cluster
    assert sum(r["size"] for r in rows) == 80
    for r in rows:
        assert r["size"] > 0
        assert r["label"] and "+" in r["label"] or r["label"] != ""
        # the representative doc must be a member of the result page
        assert r["top_doc"] >= 0


def test_cluster_results_deterministic(searcher):
    from lucene_solr_spark.search.clustering import cluster_results

    a = cluster_results(searcher, "merge", k_docs=60, n_clusters=4).collect()
    b = cluster_results(searcher, "merge", k_docs=60, n_clusters=4).collect()
    assert a == b


def test_cluster_members_match_result_page(searcher):
    """The clustered doc set IS the top-k result page."""
    from lucene_solr_spark.search.clustering import (
        _tfidf_vectors,
        cluster_results,
    )
    from lucene_solr_spark.search.qparser import parse_lucene

    top = (
        searcher.score(parse_lucene("scan"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id")
    )
    dense, vocab = _tfidf_vectors(searcher, top, 32, "text")
    page = {r["doc_id"] for r in top.collect()}
    vec_ids = {r["doc_id"] for r in dense.select("doc_id").collect()}
    assert vec_ids == page
    assert 0 < len(vocab) <= 32
