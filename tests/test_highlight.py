

def test_gradient_formatter_color_math(spark):
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.highlight import highlight_gradient

    docs = spark.createDataFrame(
        [(0, "scan here"), (1, "also scan there")],
        "doc_id long, text string",
    )
    scored = spark.createDataFrame(
        [(0, 2.0), (1, 1.0)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: (r["bgcolor"], r["snippet"])
        for r in highlight_gradient(
            docs, "scan", scored, 2.0
        ).collect()
    }
    # doc 0: rel=1 -> G=B=floor(255*1)=255 -> #FFFFFF
    assert out[0][0] == "#FFFFFF"
    # doc 1: rel=0.5 -> floor(127.5)=127 -> 0x7F
    assert out[1][0] == "#FF7F7F"
    assert '<font bgcolor="#FF7F7F">scan</font>' in out[1][1]
    # scores above maxScore clamp (GradientFormatter min(maxScore, s))
    over = spark.createDataFrame(
        [(0, 99.0)], "doc_id long, score double"
    )
    got = highlight_gradient(docs, "scan", over, 2.0).collect()[0]
    assert got["bgcolor"] == "#FFFFFF"
