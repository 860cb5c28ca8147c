"""Training-pipeline operators (datapipe/training.py): hand-computed
tiny-corpus semantics + invariants that must hold at any scale."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.datapipe.training import (
    chunk_dedup,
    decontaminate,
    pack_next_fit,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0/1 share the 4-gram "a b c d"; doc 2 is disjoint
        (0, "a b c d e f", "en"),
        (1, "x a b c d y", "en"),
        (2, "p q r s t u", "es"),
        # doc 3 repeats doc 0's text verbatim (chunk-level dup)
        (3, "a b c d e f", "de"),
        (4, "one two", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_hits(spark, docs):
    ev = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") != 0)
    out = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, ev, n=4).collect()
    }
    # doc 1 shares exactly "a b c d"; doc 3 shares all three 4-grams
    assert out == {1: 1, 3: 3}


def test_decontaminate_short_docs_dropped(spark, docs):
    ev = docs.where(F.col("doc_id") == 4)  # 2 tokens < n
    corpus = docs.where(F.col("doc_id") != 4)
    assert decontaminate(corpus, ev, n=4).count() == 0


def test_chunk_dedup_finds_shared_chunks(spark, docs):
    out = chunk_dedup(docs, chunk_tokens=3).collect()
    # docs 0 and 3 share chunks "a b c" and "d e f" (two 3-token
    # windows); no other chunk text repeats across docs
    assert len(out) == 2
    for r in out:
        assert r["n_docs"] == 2
        assert r["n_occurrences"] == 2
        assert r["min_doc_id"] == 0


def test_chunk_dedup_ragged_tail(spark):
    # 4 tokens / chunk_tokens=3 -> chunks "a b c" and "d"; the tail
    # chunk "d" matches doc 11's full-window chunk "d"
    df = spark.createDataFrame(
        [(10, "a b c d"), (11, "d")], "doc_id long, text string"
    )
    out = chunk_dedup(df, chunk_tokens=3).collect()
    assert len(out) == 1 and out[0]["n_docs"] == 2


def test_stratified_sample_rates_and_determinism(spark):
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
    )
    rates = {"en": 1.0}
    out = stratified_sample(df, rates, default_rate=0.25)
    got = out.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts["en"] == n // 2  # rate 1.0 keeps everything
    # default 0.25 on 1000 uniform md5 draws: expect ~250, tolerance 5 sigma
    assert 180 <= counts.get("zz", 0) <= 320
    # determinism: identical plan -> identical ids
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, rates, default_rate=0.25).collect())
    assert a == b


def test_pack_next_fit_invariants(spark):
    # deterministic synthetic sizes; one doc larger than the budget
    rows = [(i, "tok " * ((i * 37) % 90 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 64
    out = pack_next_fit(df, budget=budget, n_buckets=8).collect()
    assert len(out) == 200
    by_bucket: dict[int, list] = {}
    for r in out:
        assert r["bucket"] == r["doc_id"] % 8
        by_bucket.setdefault(r["bucket"], []).append(r)
    for rows_b in by_bucket.values():
        rows_b.sort(key=lambda r: r["doc_id"])
        # bins are contiguous non-decreasing along doc order
        bins = [r["bin_idx"] for r in rows_b]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # a bin holding >1 doc never exceeds the budget; a new bin is
        # opened only when the doc would not have fit
        fill: dict[int, int] = {}
        for r in rows_b:
            fill[r["bin_idx"]] = fill.get(r["bin_idx"], 0) + r["n_tokens"]
        for b, rsum in fill.items():
            ndocs = sum(1 for r in rows_b if r["bin_idx"] == b)
            if ndocs > 1:
                assert rsum <= budget
        for b1, b2 in zip(bins, bins[1:]):
            if b2 == b1 + 1:
                # the doc that opened b2 would have overflowed b1
                opener = next(r for r in rows_b if r["bin_idx"] == b2)
                prev_fill = sum(
                    r["n_tokens"]
                    for r in rows_b
                    if r["bin_idx"] == b1
                )
                assert prev_fill + opener["n_tokens"] > budget


def test_domain_mix_upsamples_and_downsamples(spark):
    from lucene_solr_spark.datapipe.training import domain_mix

    docs = spark.createDataFrame(
        [(i, "w " * 10, "heavy" if i < 80 else "light")
         for i in range(100)],
        "doc_id long, text string, source string",
    )
    # targets: half the token mass each; 'light' holds 20% of tokens
    # so it upsamples (rate 2.5), 'heavy' downsamples (rate 0.625)
    out = domain_mix(
        docs, {"heavy": 0.5, "light": 0.5}, domain_col="source"
    )
    by = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"])
             .count("*").alias("n"))
        .collect()
    }
    # expectation: heavy 80*0.625 = 50, light 20*2.5 = 50; md5
    # thresholding is deterministic so just bound the deviation
    assert 35 <= by["heavy"] <= 65
    assert 35 <= by["light"] <= 65
    # every light doc appears at least floor(2.5)=2 times
    light_copies = (
        out.where("source = 'light'").groupBy("doc_id").count().collect()
    )
    assert all(r["count"] >= 2 for r in light_copies)
    # deterministic: same call twice gives identical rows
    a = sorted((r["doc_id"], r["copy"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["copy"])
        for r in domain_mix(
            docs, {"heavy": 0.5, "light": 0.5}, domain_col="source"
        ).collect()
    )
    assert a == b


def test_decontaminate_bloom_equals_exact(spark):
    from lucene_solr_spark.datapipe.training import (
        decontaminate,
        decontaminate_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"tok{i % 9} alpha beta gamma tok{i % 7} delta")
         for i in range(120)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(1000, "alpha beta gamma tok3"), (1001, "zz yy xx ww")],
        "doc_id long, text string",
    )
    exact = sorted(
        (r["doc_id"], r["n_hits"])
        for r in decontaminate(corpus, ev, n=4).collect()
    )
    fast = sorted(
        (r["doc_id"], r["n_hits"])
        for r in decontaminate_bloom(corpus, ev, n=4).collect()
    )
    assert exact == fast and len(exact) > 0


def test_pack_conversation_windows(spark):
    from lucene_solr_spark.datapipe.training import (
        pack_conversation_windows,
    )

    rows = [
        ("c1", 0, "u", "one two three"),          # 3 tokens
        ("c1", 1, "a", "four five six seven"),    # 4 -> fill 7
        ("c1", 2, "u", "a b c d"),                # 4 -> overflow @8
        ("c1", 3, "a", "x"),                      # 1 -> fill 5
        ("c2", 0, "u", " ".join(["w"] * 20)),     # oversized alone
        ("c2", 1, "a", "tail"),
    ]
    d = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string"
    )
    out = {
        (r["conv_id"], r["turn_idx"]): r["window_idx"]
        for r in pack_conversation_windows(d, budget=8).collect()
    }
    assert out[("c1", 0)] == 0 and out[("c1", 1)] == 0
    assert out[("c1", 2)] == 1 and out[("c1", 3)] == 1
    # oversized first turn keeps window 0; next turn opens window 1
    assert out[("c2", 0)] == 0 and out[("c2", 1)] == 1
