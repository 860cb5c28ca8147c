"""Agent-trace analytics (datapipe/training.py::tool_bigrams /
turn_latency_stats)."""

import datetime

from lucene_solr_spark.datapipe.training import (
    tool_bigrams,
    turn_latency_stats,
)


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


def test_turn_latency_stats(spark):
    def ts(s):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)

    rows = [
        # conv a: user@0 -> assistant(search)@7 -> user@10 -> assistant(code)@30
        ("a", 0, "user", None, ts(0)),
        ("a", 1, "assistant", "search", ts(7)),
        ("a", 2, "user", None, ts(10)),
        ("a", 3, "assistant", "code", ts(30)),
        # conv b: assistant first turn has NO previous -> excluded;
        # second search turn latency 5
        ("b", 0, "assistant", "search", ts(0)),
        ("b", 1, "user", None, ts(55)),
        ("b", 2, "assistant", "search", ts(60)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, tool string,"
        " ts timestamp",
    )
    got = {
        r["tool"]: (r["n_turns"], r["avg_latency_sec"], r["max_latency_sec"])
        for r in turn_latency_stats(df).collect()
    }
    assert got == {"code": (1, 20.0, 20), "search": (2, 6.0, 7)}


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
