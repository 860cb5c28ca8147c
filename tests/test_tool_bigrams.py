"""Agent-trace tool-sequence mining (datapipe/training.py::tool_bigrams)."""

from lucene_solr_spark.datapipe.training import tool_bigrams


def test_pairs_counts_and_skips(spark):
    rows = [
        # conv a: search -> code -> (none, skipped) -> search
        ("a", 0, "search"), ("a", 1, "code"), ("a", 2, "none"),
        ("a", 3, "search"),
        # conv b: code -> code; a tool-less turn in between is transparent
        ("b", 0, "code"), ("b", 1, None), ("b", 2, "code"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    out = {
        (r["first_tool"], r["next_tool"]): r["n_pairs"]
        for r in tool_bigrams(df).collect()
    }
    assert out == {
        ("search", "code"): 1,
        ("code", "search"): 1,  # 'none' between them is transparent
        ("code", "code"): 1,
    }


def test_no_cross_conversation_pairs(spark):
    rows = [("a", 0, "search"), ("b", 0, "code")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    assert tool_bigrams(df).count() == 0


def test_top_k_and_order(spark):
    rows = (
        [("a", i, "search") for i in range(4)]  # 3 search->search
        + [("b", i, "code") for i in range(3)]  # 2 code->code
    )
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    got = [
        (r["first_tool"], r["next_tool"], r["n_pairs"])
        for r in tool_bigrams(df, top_k=1).collect()
    ]
    assert got == [("search", "search", 3)]
