"""NGram / EdgeNGram token filter semantics
(lucene/analysis/common/.../ngram/NGramTokenFilter.java goldens) and
Python-vs-Catalyst path agreement."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.analysis.ngram import (
    edge_ngram_tokens,
    edge_ngrams_expr,
    ngram_tokens,
    ngrams_expr,
)
from lucene_solr_spark.analysis.tokenizer import make_analyzer


def test_ngram_goldens():
    # NGramTokenFilterTest.testBigrams-style: size-major, front-to-back
    assert ngram_tokens("abcde", 1, 2) == [
        "a", "b", "c", "d", "e", "ab", "bc", "cd", "de",
    ]
    assert ngram_tokens("abc", 3, 3) == ["abc"]
    assert ngram_tokens("ab", 3, 3) == []  # shorter than min_gram


def test_edge_ngram_goldens():
    assert edge_ngram_tokens("abcde", 1, 3) == ["a", "ab", "abc"]
    assert edge_ngram_tokens("ab", 1, 3) == ["a", "ab"]
    assert edge_ngram_tokens("", 1, 2) == []


def test_analyzer_slot_ngram():
    an = make_analyzer(edge_ngram=(2, 3), stop=True)
    terms, positions = an("the quick fox")
    # 'the' stop-removed; grams share the source token's position
    assert terms == ["qu", "qui", "fo", "fox"]
    assert positions == [1, 1, 2, 2]
    with pytest.raises(ValueError):
        make_analyzer(ngram=(1, 2), edge_ngram=(1, 2))


def test_catalyst_matches_python(spark):
    words = ["scan", "merge", "a", "keyspace", ""]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = df.select(
        "term",
        ngrams_expr(F.col("term"), 2, 3).alias("g"),
        edge_ngrams_expr(F.col("term"), 1, 2).alias("e"),
    ).collect()
    for row in got:
        assert row["g"] == ngram_tokens(row["term"], 2, 3)
        assert row["e"] == edge_ngram_tokens(row["term"], 1, 2)


def test_ngram_phrase_rewrite_positions():
    """NGramPhraseQuery.rewrite (NGramPhraseQuery.java:46-77): keep
    positions i % n == 0 plus the last; short/degenerate inputs pass
    through unchanged."""
    from lucene_solr_spark.search.ngramphrase import ngram_phrase_rewrite

    grams = ["sca", "can", "ann", "nni", "nin", "ing"]  # 'scanning' 3-grams
    kept = ngram_phrase_rewrite(grams, 3)
    assert kept == [("sca", 0), ("nni", 3), ("ing", 5)]
    assert ngram_phrase_rewrite(["ab", "bc"], 2) == [("ab", 0), ("bc", 1)]
    assert ngram_phrase_rewrite(grams, 1) == [
        (g, i) for i, g in enumerate(grams)
    ]


def test_ngram_phrase_docs_optimized_equals_full(spark, tmp_path):
    """Optimized n-gram phrase == exhaustive all-grams phrase on an
    ngram-analyzed index, while decoding fewer gram postings."""
    import pandas as pd

    from lucene_solr_spark.analysis.ngram import ngram_tokens
    from lucene_solr_spark.index.builder import build_index
    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.ngramphrase import ngram_phrase_docs

    words = ["scanning", "scanner", "spanning", "planning", "scanline"]
    rows = []
    for i in range(40):
        rows.append(
            {
                "conv_id": f"c{i:03d}",
                "turn_idx": 0,
                "role": "user",
                "text": " ".join(
                    " ".join(ngram_tokens(words[(i + j) % len(words)], 3, 3))
                    for j in range(3)
                ),
                "tool": "",
                "ts": pd.Timestamp("2024-01-01"),
            }
        )
    docs = spark.createDataFrame(pd.DataFrame(rows))
    idx = build_index(spark, docs, cache=True)
    s = Searcher(idx)
    grams = ngram_tokens("scanning", 3, 3)
    full = sorted(
        r["doc_id"]
        for r in ngram_phrase_docs(s, grams, 3, optimize=False).collect()
    )
    opt = sorted(
        r["doc_id"]
        for r in ngram_phrase_docs(s, grams, 3, optimize=True).collect()
    )
    assert full and opt == full
