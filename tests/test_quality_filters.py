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


def test_gopher_repetition(spark):
    from lucene_solr_spark.functions.text_analysis import (
        with_gopher_repetition,
    )

    d = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa bb"),
            (2, "x y z\ndup line\ndup line"),
            (3, "unique words only here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in with_gopher_repetition(d).collect()
    }
    # doc1: "aa bb" covers all 12 token chars (3 occurrences x 4
    # chars); every 3-gram repeats
    assert out[1]["rep_top2gram_char_frac"] == 1.0
    assert out[1]["rep_dup3gram_char_frac"] == 1.0
    # doc2: 1 of 3 lines duplicated -> 1/3; dup-line chars 16/21
    assert abs(out[2]["rep_dup_line_frac"] - 1 / 3) < 1e-9
    assert abs(out[2]["rep_dup_line_char_frac"] - 16 / 21) < 1e-9
    # doc3: no repetition beyond the single top 2-gram's own chars
    assert out[3]["rep_dup_line_frac"] == 0.0
    assert out[3]["rep_dup3gram_char_frac"] == 0.0
    # empty doc: all zeros, no division errors
    assert out[4]["rep_top2gram_char_frac"] == 0.0
