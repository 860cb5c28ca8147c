"""MemoryIndex (single-doc percolation) tests — pure Python, no Spark."""

from __future__ import annotations

import pytest

from lucene_solr_spark.search.memoryindex import MemoryIndex
from lucene_solr_spark.search.qparser import parse_lucene
from lucene_solr_spark.search.query import And, Or, PhraseQuery, TermQuery


@pytest.fixture(scope="module")
def mi():
    return MemoryIndex(
        "The quick brown fox jumps over the lazy dog; the fox wins."
    )


def test_term_match(mi):
    assert mi.matches(TermQuery("fox"))
    assert not mi.matches(TermQuery("cat"))
    assert mi.score(TermQuery("fox")) > mi.score(TermQuery("dog")) > 0


def test_boolean(mi):
    assert mi.matches(And("fox", "dog"))
    assert not mi.matches(And("fox", "cat"))
    assert mi.matches(Or("cat", "dog"))
    assert not mi.matches(parse_lucene("fox -dog"))


def test_phrase(mi):
    assert mi.matches(PhraseQuery(["quick", "brown", "fox"]))
    assert not mi.matches(PhraseQuery(["brown", "quick"]))
    assert mi.matches(PhraseQuery(["quick", "fox"], slop=1))
    assert not mi.matches(PhraseQuery(["quick", "fox"], slop=0))


def test_stopwords_and_empty():
    assert not MemoryIndex("").matches(TermQuery("fox"))
    # 'the' is stopped at index AND query analysis
    mi = MemoryIndex("the the the")
    assert not mi.matches(TermQuery("the"))


def test_score_equals_engine_formula():
    """MemoryIndex score == hand-computed BM25 with N=1 stats."""
    import math

    import numpy as np

    from lucene_solr_spark.index.norms import NORM_TABLE, encode_norm

    text = "alpha beta alpha gamma"
    mi = MemoryIndex(text)
    dl = 4
    nb = int(encode_norm(np.array([dl]))[0])
    qdl = float(NORM_TABLE[nb])
    idf = math.log(1 + (1 - 1 + 0.5) / (1 + 0.5))
    w = idf * 2.2
    tf = 2.0
    want = w * tf / (tf + 1.2 * (0.25 + 0.75 * qdl / dl))
    assert abs(mi.score(TermQuery("alpha")) - want) < 1e-12


def test_percolate_kernel():
    import pandas as pd

    from lucene_solr_spark.search.memoryindex import percolate

    queries = [
        ("q_fox", parse_lucene("fox")),
        ("q_phrase", PhraseQuery(["lazy", "dog"])),
        ("q_absent", parse_lucene("unicorn")),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "quick brown fox and the lazy dog",
                "no animals here at all",
            ],
        }
    )
    out = pd.concat(list(percolate(queries)([pdf])), ignore_index=True)
    got = {(r.doc_id, r.query_name) for r in out.itertuples()}
    assert got == {(0, "q_fox"), (0, "q_phrase")}
