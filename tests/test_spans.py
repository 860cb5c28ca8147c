

def test_span_near_multi_prefix_and_wildcard(spark):
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.spans import span_near_multi

    docs = spark.createDataFrame(
        [
            (0, "scan merges data"),       # scan -> mer* adjacent
            (1, "scan then data merged"),  # within slop 2
            (2, "merge scan"),             # wrong order
            (3, "scan data"),              # no mer* term
        ],
        "doc_id long, text string",
    )
    s = Searcher(build_index(spark, docs))
    got = sorted(
        r["doc_id"]
        for r in span_near_multi(s, ["scan", ("prefix", "mer")], 2)
        .collect()
    )
    assert got == [0, 1]
    # wildcard clause form
    got_w = sorted(
        r["doc_id"]
        for r in span_near_multi(s, ["scan", ("wildcard", "mer*")], 2)
        .collect()
    )
    assert got_w == [0, 1]
