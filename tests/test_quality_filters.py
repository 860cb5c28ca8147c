"""Gopher and C4 rule filters (functions/text_analysis.py)."""


def test_gopher_rules(spark):
    from lucene_solr_spark.functions.text_analysis import (
        with_gopher_rules,
    )

    long_good = " ".join(
        ["the quick brown fox jumps over that lazy dog with"] * 6
    )  # 60 words, stopwords present, alpha-heavy
    short = "too short"
    hashy = " ".join(["word #tag"] * 40)  # hash ratio 0.5 > 0.1
    rows = [(1, long_good), (2, short), (3, hashy)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_gopher_rules(d).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gr_word_count"] is False
    assert out[2]["gopher_pass"] is False
    assert out[3]["gr_hash_ratio"] is False


def test_c4_filters(spark):
    from lucene_solr_spark.functions.text_analysis import (
        with_c4_filters,
    )

    good = "This is fine. It has sentences. Three of them."
    braces = "some code { return x; } here with words and more."
    lorem = (
        "Lorem ipsum dolor sit amet. More words here. And here."
    )
    rows = [(1, good), (2, braces), (3, lorem), (4, "tiny")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_c4_filters(d).collect()}
    assert out[1]["c4_pass"] is True
    assert out[2]["c4_no_braces"] is False
    assert out[3]["c4_no_lorem"] is False
    assert out[4]["c4_min_words"] is False
