

def test_per_field_analyzer_wrapper(spark):
    from lucene_solr_spark.analysis.tokenizer import make_analyzer
    from lucene_solr_spark.index.fields import build_fielded_index

    docs = spark.createDataFrame(
        [(0, "Running Fast", "The-Tag"), (1, "running slow", "The-Tag")],
        "doc_id long, body string, tag string",
    )
    fidx = build_fielded_index(
        spark,
        docs,
        {"body": "body", "tag": "tag"},
        analyzer={"tag": make_analyzer(tokenizer="keyword", stop=False)},
    )
    terms = {
        (r["field"], r["term"])
        for r in fidx.terms_stats.select("field", "term").collect()
    }
    # body falls back to the default chain: lowercased, stemmed-free
    assert ("body", "running") in terms
    # tag keeps the WHOLE raw value as one unlowercased token
    assert ("tag", "The-Tag") in terms
    assert not any(f == "tag" and t != "The-Tag" for f, t in terms)
