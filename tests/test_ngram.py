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
