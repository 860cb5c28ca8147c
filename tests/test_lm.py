"""Bigram-LM perplexity and DSIR importance weights (datapipe/lm.py).

Hand-computed oracle values for tiny corpora; invariants for the
hashed importance sampler.
"""

import math

import pytest

from lucene_solr_spark.datapipe.lm import (
    dsir_importance_weights,
    score_perplexity,
    train_bigram_lm,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_lm_counts(spark):
    d = _df(spark, [(0, "a b"), (1, "a c")])
    uni, bi, v, t = train_bigram_lm(d)
    assert v == 3 and t == 4
    assert {(r["term"], r["c1"]) for r in uni.collect()} == {
        ("a", 2), ("b", 1), ("c", 1)
    }
    assert {(r["w1"], r["w2"], r["c2"]) for r in bi.collect()} == {
        ("a", "b", 1), ("a", "c", 1)
    }


def test_perplexity_hand_computed(spark):
    d = _df(spark, [(0, "a b"), (1, "a c")])
    uni, bi, v, t = train_bigram_lm(d)
    out = {
        r["doc_id"]: r
        for r in score_perplexity(d, uni, bi, v, t).collect()
    }
    # p(a) = (2+.5)/(4+1.5); p(b|a) = (1+.5)/(2+1.5)
    exp0 = -(math.log(2.5 / 5.5) + math.log(1.5 / 3.5)) / 2
    assert out[0]["n_tokens"] == 2
    assert out[0]["logppl"] == pytest.approx(exp0, rel=1e-12)
    assert out[1]["logppl"] == pytest.approx(exp0, rel=1e-12)


def test_perplexity_unseen_bigram_fallback(spark):
    train = _df(spark, [(0, "a b"), (1, "a c")])
    uni, bi, v, t = train_bigram_lm(train)
    score = _df(spark, [(9, "b c")])
    out = score_perplexity(score, uni, bi, v, t).collect()[0]
    # p(b) = (1+.5)/(4+1.5); p(c|b): bigram unseen -> (0+.5)/(1+1.5)
    exp = -(math.log(1.5 / 5.5) + math.log(0.5 / 2.5)) / 2
    assert out["logppl"] == pytest.approx(exp, rel=1e-12)
    # an unseen doc is MORE perplexing than an in-model one
    in_model = score_perplexity(train, uni, bi, v, t).collect()
    assert out["logppl"] > max(r["logppl"] for r in in_model)


def test_perplexity_empty_doc_excluded(spark):
    d = _df(spark, [(0, "a b"), (1, "")])
    uni, bi, v, t = train_bigram_lm(d)
    out = score_perplexity(d, uni, bi, v, t).collect()
    assert {r["doc_id"] for r in out} == {0}


def test_dsir_self_target_is_zero(spark):
    d = _df(spark, [(0, "x y z"), (1, "p q")])
    out = dsir_importance_weights(d, d).collect()
    assert len(out) == 2
    for r in out:
        assert r["logweight"] == pytest.approx(0.0, abs=1e-12)


def test_dsir_ranks_target_like_docs_higher(spark):
    src = _df(
        spark,
        [(0, "alpha alpha beta"), (1, "gamma gamma delta"),
         (2, "alpha beta beta")],
    )
    tgt = _df(spark, [(10, "alpha beta alpha")])
    out = {
        r["doc_id"]: r["logweight"]
        for r in dsir_importance_weights(src, tgt).collect()
    }
    # docs made of target vocabulary outweigh the disjoint-vocab doc
    assert out[0] > out[1] and out[2] > out[1]


def test_dsir_token_counts(spark):
    src = _df(spark, [(0, "a b c"), (1, "d")])
    tgt = _df(spark, [(5, "a")])
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in dsir_importance_weights(src, tgt).collect()
    }
    assert out == {0: 3, 1: 1}


def test_pmi_collocations(spark):
    from lucene_solr_spark.datapipe.lm import (
        pmi_collocations,
        train_bigram_lm,
    )
    import math

    # "a b" always adjacent (5x); "x" pairs with varied neighbors
    rows = [(i, "a b x " + ("p" if i % 2 else "q")) for i in range(5)]
    d = _df(spark, rows)
    uni, bi, v, t = train_bigram_lm(d)
    out = pmi_collocations(uni, bi, t, min_count=5, k=5).collect()
    assert out[0]["w1"] == "a" and out[0]["w2"] == "b"
    # hand value: c2=5, T2=15, ca=cb=5, T=20
    exp = math.log((5 / 15) / ((5 / 20) * (5 / 20)))
    assert out[0]["pmi"] == pytest.approx(exp, rel=1e-12)


def test_tfidf_keywords(spark):
    from lucene_solr_spark.datapipe.lm import tfidf_keywords
    import math

    d = _df(
        spark,
        [
            (1, "rare rare common"),
            (2, "common other"),
            (3, "common third"),
        ],
    )
    out = [
        r
        for r in tfidf_keywords(d, top_k=2).collect()
        if r["doc_id"] == 1
    ]
    out.sort(key=lambda r: r["rank"])
    # "rare" df=1 tf=2 -> 2*ln(3); "common" df=3 -> score 0
    assert out[0]["term"] == "rare"
    assert out[0]["score"] == pytest.approx(
        2 * math.log(3.0), rel=1e-12
    )
    assert out[1]["score"] == pytest.approx(0.0, abs=1e-12)


def test_stupid_backoff_hand_computed(spark):
    from lucene_solr_spark.datapipe.lm import (
        score_stupid_backoff,
        train_trigram_lm,
    )
    import math

    train = _df(spark, [(0, "a b c"), (1, "a b d")])
    uni, bi, tri, v, t = train_trigram_lm(train)
    # seen trigram: S(c|a b) = c3/c2(a,b) = 1/2
    out = {
        r["doc_id"]: r
        for r in score_stupid_backoff(train, uni, bi, tri, t).collect()
    }
    assert out[0]["logscore"] == pytest.approx(
        math.log(0.5), rel=1e-12
    )
    # backoff chain: "x b c": trigram (x,b,c) unseen, bigram (b,c)
    # seen -> a * c2(b,c)/c1(b) = 0.4 * 1/2
    probe = _df(spark, [(9, "x b c")])
    o = score_stupid_backoff(probe, uni, bi, tri, t).collect()[0]
    assert o["logscore"] == pytest.approx(
        math.log(0.4 * 0.5), rel=1e-12
    )
    # full floor: all-unseen trigram over unseen words
    probe2 = _df(spark, [(10, "q r s")])
    o2 = score_stupid_backoff(probe2, uni, bi, tri, t).collect()[0]
    assert o2["logscore"] == pytest.approx(
        math.log(0.4 * 0.4 / 6.0), rel=1e-12
    )


def test_conversation_dedup(spark):
    from lucene_solr_spark.datapipe.dedup import conversation_dedup

    rows = [
        ("c1", 0, "hello"), ("c1", 1, "world"),
        ("c2", 0, "hello"), ("c2", 1, "world"),   # dup of c1
        ("c3", 0, "different"),
        ("c4", 1, "world"), ("c4", 0, "hello"),   # same AFTER ordering
    ]
    d = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, text string"
    )
    out = conversation_dedup(d).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 3 and out[0]["keep_conv"] == "c1"
