"""SimpleText postings dump (index/simpletext.py) — exact line
vocabulary of SimpleTextFieldsWriter.java:20-40."""

import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.index.simpletext import simpletext_dump


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha"),
            (1, "beta gamma"),
            (2, "alpha the beta"),  # 'the' stops out, leaves a gap
        ],
        "doc_id long, text string",
    )
    return build_index(spark, docs)


def test_dump_golden(idx):
    got = [
        r["line"]
        for r in simpletext_dump(idx, terms=["alpha", "beta"])
        .orderBy("line_no")
        .collect()
    ]
    assert got == [
        "field text",
        "  term alpha",
        "    doc 0",
        "      freq 2",
        "      pos 0",
        "      pos 2",
        "    doc 2",
        "      freq 1",
        "      pos 0",
        "  term beta",
        "    doc 0",
        "      freq 1",
        "      pos 1",
        "    doc 1",
        "      freq 1",
        "      pos 0",
        "    doc 2",
        "      freq 1",
        "      pos 2",  # position gap from the stopped 'the'
        "END",
    ]


def test_line_numbers_are_dense_from_one(idx):
    rows = simpletext_dump(idx, terms=["gamma"]).collect()
    nums = sorted(r["line_no"] for r in rows)
    assert nums == list(range(1, len(rows) + 1))
