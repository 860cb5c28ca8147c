"""BPE tokenizer (functions/bpe.py) — independent oracles that justify
the pinned bpe_train / bpe_tokens gate values:

  - the published worked example from Sennrich et al. 2016 §3.2
    (corpus low/lower/newest/widest) reproduced merge-for-merge, and
    the paper's headline encode: "lowest" -> low + est</w>;
  - an independently-coded (per-word quadratic re-scan, no shared
    helpers) trainer+encoder agreeing with the production one on a
    seeded random corpus;
  - invariants: concatenating a word's tokens reconstructs word+</w>;
    token count never increases as merges are appended.
"""

from __future__ import annotations

import re

import pytest


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_sennrich_worked_example(spark):
    from lucene_solr_spark.functions.bpe import encode_word, train_bpe

    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges = train_bpe(_df(spark, texts), n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est</w>"]


# ---- independent reference implementation (no shared helpers) ----


def _ref_train(word_freq: dict, n_merges: int):
    vocab = {
        " ".join(list(w) + ["</w>"]): f for w, f in word_freq.items()
    }
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for spaced, f in vocab.items():
            syms = spaced.split(" ")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)
        pat = re.compile(
            r"(?<!\S)"
            + re.escape(pair[0])
            + r" "
            + re.escape(pair[1])
            + r"(?!\S)"
        )
        vocab = {
            pat.sub(pair[0] + pair[1], s): f for s, f in vocab.items()
        }
    return merges


def _ref_encode(word: str, merges) -> list[str]:
    spaced = " ".join(list(word) + ["</w>"])
    for a, b in merges:  # rank order IS application order here
        pat = re.compile(
            r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)"
        )
        while pat.search(spaced):
            spaced = pat.sub(a + b, spaced)
    return spaced.split(" ")


@pytest.fixture(scope="module")
def rand_texts():
    import random

    rng = random.Random(11)
    words = [
        "".join(
            rng.choice("abcdef") for _ in range(rng.randint(2, 7))
        )
        for _ in range(30)
    ]
    return [
        " ".join(rng.choice(words) for _ in range(12))
        for _ in range(40)
    ]


def test_matches_independent_reference(spark, rand_texts):
    from lucene_solr_spark.functions.bpe import encode_word, train_bpe

    merges = train_bpe(_df(spark, rand_texts), n_merges=25)
    wf: dict = {}
    for t in rand_texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            wf[w] = wf.get(w, 0) + 1
    assert merges == _ref_train(wf, 25)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wf:
        assert encode_word(w, ranks) == _ref_encode(w, merges), w


def test_roundtrip_and_monotonic_counts(spark, rand_texts):
    from lucene_solr_spark.functions.bpe import encode_word, train_bpe

    merges = train_bpe(_df(spark, rand_texts), n_merges=30)
    wf = {
        w
        for t in rand_texts
        for w in re.findall(r"[a-z0-9]+", t.lower())
    }
    prev = None
    for k in (0, 10, 20, 30):
        ranks = {p: i for i, p in enumerate(merges[:k])}
        total = 0
        for w in wf:
            toks = encode_word(w, ranks)
            assert "".join(toks) == w + "</w>"
            total += len(toks)
        if prev is not None:
            assert total <= prev
        prev = total


def test_bpe_encode_dataframe(spark, rand_texts):
    from lucene_solr_spark.functions.bpe import (
        bpe_encode,
        encode_word,
        train_bpe,
    )

    df = _df(spark, rand_texts)
    merges = train_bpe(df, n_merges=25)
    rows = {
        r["doc_id"]: r
        for r in bpe_encode(df, merges, preview_tokens=4).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(rand_texts):
        words = re.findall(r"[a-z0-9]+", t.lower())
        toks = [tok for w in words for tok in encode_word(w, ranks)]
        assert rows[i]["n_words"] == len(words)
        assert rows[i]["n_tokens"] == len(toks)
        assert rows[i]["preview"] == " ".join(toks[:4])
