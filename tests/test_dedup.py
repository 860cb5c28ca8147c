"""Dedup operator tests: vectorized shingle kernel equivalence and the
mega-bucket star-linking guard."""

from __future__ import annotations

import pandas as pd
import pytest

from lucene_solr_spark.datapipe.dedup import (
    distinct_shingle_rows,
    minhash_candidate_pairs,
)


@pytest.fixture(scope="module")
def texts_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "quick brown fox jumps over lazy dog again and again"),
        (2, "completely different content about spark shuffles, and joins"),
        (3, "the quick brown fox jumps over the lazy dog tonight"),
        (4, "the quick brown fox jumps over the lazy dog tonight!"),
        (5, "short text"),
        (6, ""),
        (7, "don't stop believing, hold on to that 3.14 feeling"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vectorized_shingles_match_analyzer_loop(texts_df):
    """The column-vectorized shingle kernel must produce exactly the
    per-doc analyze() + set-comprehension shingles it replaced."""
    from lucene_solr_spark.analysis.tokenizer import analyze

    got = {
        (r["doc_id"], r["shingle"])
        for r in distinct_shingle_rows(texts_df).collect()
    }
    want = set()
    for row in texts_df.collect():
        toks, _ = analyze(row["text"] or "")
        for i in range(len(toks) - 2):
            want.add((row["doc_id"], " ".join(toks[i : i + 3])))
    assert got == want and len(want) > 0


def test_mega_bucket_star_linking(spark):
    """A bucket over the cap must emit O(n) star pairs (rep = min doc),
    not O(n^2) all-pairs, while keeping every member linked to the
    representative (connected component preserved)."""
    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, same) for i in range(6)] + [
        (10, "totally unrelated text about parquet row groups and scans")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_candidate_pairs(df, bucket_cap=2).collect()
    uncapped = minhash_candidate_pairs(df, bucket_cap=1000).collect()
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    uncapped_pairs = {(r["doc_a"], r["doc_b"]) for r in uncapped}
    # identical docs share every band bucket: all-pairs = C(6,2) = 15
    assert uncapped_pairs == {
        (a, b) for a in range(6) for b in range(6) if a < b
    }
    # star: every member pairs with doc 0 only
    assert capped_pairs == {(0, b) for b in range(1, 6)}


def _simhash_reference(text: str, bits: int = 64) -> int | None:
    """Pure-Python definitional simhash: tf-weighted +-1 sums over the
    md5-derived term-hash bits (layout: bits 0..59 from hex[0:15],
    60..63 from low 4 bits of hex[15:30]), bit set iff sum > 0."""
    import hashlib
    from collections import Counter

    from lucene_solr_spark.analysis.tokenizer import analyze

    toks, _ = analyze(text or "")
    if not toks:
        return None
    tf = Counter(toks)
    sums = [0] * bits
    for t, c in tf.items():
        hx = hashlib.md5(t.encode()).hexdigest()
        a = int(hx[0:15], 16)
        b2 = int(hx[15:30], 16) & 0xF
        for b in range(bits):
            bit = (a >> b) & 1 if b < 60 else (b2 >> (b - 60)) & 1
            sums[b] += c if bit else -c
    sig = 0
    for b in range(bits):
        if sums[b] > 0:
            sig |= 1 << b
    # int64 two's complement view
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_kernel_matches_reference(texts_df):
    """The one-pass Arrow simhash kernel must equal the definitional
    per-doc reference (independent of the DuckDB oracle twin)."""
    from lucene_solr_spark.datapipe.dedup import simhash

    got = {
        r["doc_id"]: r["simhash"] for r in simhash(texts_df).collect()
    }
    want = {}
    for row in texts_df.collect():
        sig = _simhash_reference(row["text"])
        if sig is not None:
            want[row["doc_id"]] = sig
    assert got == want and len(want) > 0


def test_simhash_near_pairs_jittered_duplicates(spark):
    """Pair recall on jittered duplicates: each base doc gets a copy
    with 2 of ~40 tokens replaced; 64-bit fingerprints with 4x16-bit
    pigeonhole blocking must recover every (base, jitter) pair whose
    hamming distance is within the bound, and the emitted pairs must
    carry the true hamming distance."""
    from lucene_solr_spark.datapipe.dedup import (
        simhash,
        simhash_near_pairs,
    )

    base_words = [
        "select project filter aggregate shuffle partition broadcast",
        "index posting merge segment norm score rank boost query",
        "arrow batch kernel vector column stripe page footer stat",
        "stream window watermark state trigger sink source offset",
    ]
    rows = []
    for i in range(8):
        toks = (base_words[i % 4] + " ").split() * 5  # ~35-40 tokens
        rows.append((i * 2, " ".join(toks)))
        jit = list(toks)
        jit[3] = "changedword"
        jit[17] = "anotherchange"
        rows.append((i * 2 + 1, " ".join(jit)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    want = set()
    for i in range(8):
        a, b = i * 2, i * 2 + 1
        ham = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want.add((a, b))
    assert want, "fixture produced no within-bound jittered pairs"
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }
    # pigeonhole blocking guarantees every within-bound pair is found
    assert want <= set(got)
    for (a, b), ham in got.items():
        true_ham = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
        assert ham == true_ham <= 3


def test_simhash_carry_across_tiny_arrow_batches(spark, texts_df):
    """The bit accumulator carries a doc's partial sums across Arrow
    batch boundaries: forcing 3-row batches must give identical
    fingerprints to the default batching."""
    from lucene_solr_spark.datapipe.dedup import simhash

    want = {
        r["doc_id"]: r["simhash"] for r in simhash(texts_df).collect()
    }
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    try:
        got = {
            r["doc_id"]: r["simhash"]
            for r in simhash(texts_df).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert got == want and len(want) > 0


def test_exact_dedup_keep_best_survivor(spark):
    from lucene_solr_spark.datapipe.dedup import exact_dedup_keep_best

    docs = spark.createDataFrame(
        [
            (0, "same text", 5),
            (1, "same text", 9),   # best quality -> survivor
            (2, "same text", 9),   # tie -> lower id wins among best
            (3, "unique", 1),
        ],
        "doc_id long, text string, quality long",
    )
    got = {
        r["text_hash"]: (r["n_dups"], r["keep_doc_id"])
        for r in exact_dedup_keep_best(docs, "quality").collect()
    }
    assert sorted(got.values()) == [(1, 3), (3, 1)]


def test_boilerplate_line_dedup(spark):
    from lucene_solr_spark.datapipe.dedup import boilerplate_line_dedup

    d = spark.createDataFrame(
        [
            (1, "alpha one\nFOOTER\nbeta"),
            (2, "gamma two\nFOOTER\ndelta"),
            (3, "epsilon\nFOOTER"),
            (4, "FOOTER"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_line_dedup(d, min_docs=3).collect()
    }
    # FOOTER appears in 4 >= 3 docs -> removed everywhere; unique
    # lines keep their original order; all-boilerplate doc -> ''
    assert out == {
        1: "alpha one\nbeta",
        2: "gamma two\ndelta",
        3: "epsilon",
        4: "",
    }


def test_boilerplate_line_dedup_threshold(spark):
    from lucene_solr_spark.datapipe.dedup import boilerplate_line_dedup

    d = spark.createDataFrame(
        [(1, "x\nshared"), (2, "y\nshared")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in boilerplate_line_dedup(d, min_docs=3).collect()
    }
    # only 2 docs share the line -> below threshold, kept
    assert out == {1: "x\nshared", 2: "y\nshared"}


def test_duplicate_span_removal(spark):
    from lucene_solr_spark.datapipe.dedup import duplicate_span_removal

    # docs 1 and 2 share an exact 4-token run; doc 3 is clean
    d = spark.createDataFrame(
        [
            (1, "alpha beta p q r s gamma"),
            (2, "delta p q r s epsilon zeta"),
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_removal(d, k=4).collect()
    }
    # the duplicated shingle "p q r s" covers exactly those 4 tokens
    # in both docs; boundary shingles are unique so neighbors survive
    assert out == {
        1: "alpha beta gamma",
        2: "delta epsilon zeta",
        3: "one two three four five",
    }


def test_duplicate_span_removal_within_doc(spark):
    from lucene_solr_spark.datapipe.dedup import duplicate_span_removal

    # the SAME doc repeats a 3-run: both occurrences removed (count>1
    # includes within-doc repeats, Lee et al.'s self-repetition case)
    d = spark.createDataFrame(
        [(1, "x y z junk x y z"), (2, "totally different words here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_removal(d, k=3).collect()
    }
    assert out[1] == "junk"


def test_duplicate_span_removal_short_docs_untouched(spark):
    from lucene_solr_spark.datapipe.dedup import duplicate_span_removal

    # docs shorter than k produce no shingles and pass through whole
    d = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in duplicate_span_removal(d, k=8).collect()
    }
    assert out == {1: "tiny doc", 2: "tiny doc"}
