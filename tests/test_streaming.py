"""Incremental / NRT indexing: streaming build == batch build
(rank-identity), exactly-once on batch replay, compaction invariance.

Mirrors the reference's NRT guarantees (SURVEY.md §2.10): reopened
readers see committed segments; replayed updates are idempotent; merges
don't change query results (TestNRTManager / TestIndexWriterMerging
analogues)."""

import glob
import os

import pytest

from lucene_solr_spark.search.executor import Searcher
from lucene_solr_spark.search.query import And, Or, TermQuery
from lucene_solr_spark.streaming.incremental import (
    IncrementalIndexWriter,
    index_stream,
)
from tests.conftest import assert_topk_equal

QUERIES = [
    TermQuery("error"),
    And("error", "timeout"),
    Or("error", "timeout", "deploy"),
]


@pytest.fixture(scope="module")
def stream_built(spark, tiny_pdf, tmp_path_factory):
    """Feed the tiny corpus through a real Structured Streaming file
    source, one file per micro-batch, in (conv_id, turn_idx) order so
    streaming docIDs coincide with the batch build's."""
    root = tmp_path_factory.mktemp("stream")
    in_dir = str(root / "in")
    index_dir = str(root / "idx")
    ckpt = str(root / "ckpt")
    os.makedirs(in_dir)

    ordered = tiny_pdf.drop(columns=["doc_id"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    n = len(ordered)
    cut1, cut2 = n // 3, 2 * n // 3
    # chunk boundaries on conversation edges would be ideal but are not
    # required: doc ids only need global (conv,turn) order across files.
    # One parquet file per chunk; file-source batches follow (modTime,
    # path) order, so batch i == chunk i.
    for i, chunk in enumerate(
        [ordered.iloc[:cut1], ordered.iloc[cut1:cut2], ordered.iloc[cut2:]]
    ):
        chunk.to_parquet(
            f"{in_dir}/chunk{i:03d}.parquet",
            index=False,
            coerce_timestamps="us",  # Spark rejects TIMESTAMP(NANOS)
            allow_truncated_timestamps=True,
        )

    schema = spark.read.parquet(f"{in_dir}/chunk000.parquet").schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = index_stream(src, index_dir, ckpt)
    q.awaitTermination(180)
    return index_dir


def test_streaming_equals_batch(spark, stream_built, tiny_index, tiny_oracle):
    w = IncrementalIndexWriter(spark, stream_built)
    r = w.reader()
    assert r.stats.max_doc == tiny_index.stats.max_doc
    assert (
        r.stats.sum_total_term_freq == tiny_index.stats.sum_total_term_freq
    )
    s_stream = Searcher(r, exact_float32=True)
    for q in QUERIES:
        got = s_stream.search(q, 10).collect()
        # compare via the batch searcher (itself oracle-pinned elsewhere)
        want = Searcher(tiny_index, exact_float32=True).search(q, 10).collect()
        assert [r_["doc_id"] for r_ in got] == [w_["doc_id"] for w_ in want]
        for g, w_ in zip(got, want):
            assert abs(g["score"] - w_["score"]) <= 1e-6


def test_replay_is_idempotent(spark, stream_built, tiny_pdf):
    w = IncrementalIndexWriter(spark, stream_built)
    before = w.reader().stats.max_doc
    # replay an already-committed batch id with arbitrary data
    replay_df = spark.createDataFrame(
        tiny_pdf.drop(columns=["doc_id"]).head(20)
    )
    w.process_batch(replay_df, 0)
    assert w.reader().stats.max_doc == before


def test_compaction_preserves_results(spark, stream_built):
    w = IncrementalIndexWriter(spark, stream_built)
    s_before = Searcher(w.reader(), exact_float32=True)
    want = {
        id(q): s_before.search(q, 10).collect() for q in QUERIES
    }
    assert w.compact() is True
    assert len(w.reader().manifest["segments"]) == 1
    s_after = Searcher(w.reader(), exact_float32=True)
    for q in QUERIES:
        got = s_after.search(q, 10).collect()
        assert [
            (r["doc_id"], round(float(r["score"]), 6)) for r in got
        ] == [
            (r["doc_id"], round(float(r["score"]), 6)) for r in want[id(q)]
        ]
    # second compact is a no-op below min_segments
    assert w.compact() is False


def test_delete_visible_before_compaction(spark, tmp_path):
    """Tombstoned docs must vanish from matches IMMEDIATELY (liveDocs
    anti-join), while df keeps counting them until compaction — the
    reference's pre-merge semantics."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.executor import Searcher
    from lucene_solr_spark.search.query import TermQuery
    from lucene_solr_spark.streaming.incremental import (
        IncrementalIndexWriter,
    )

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha delta"),
        (2, "alpha epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, "uid long, text string")
    w = IncrementalIndexWriter(spark, str(tmp_path / "ix"), ("uid",))
    w.process_batch(df, 0)
    r0 = w.reader()
    assert r0.term_stats(["alpha"])["alpha"][0] == 3
    w.delete_by_keys(df.where(F.col("uid") == 1).select("uid"))
    r1 = w.reader()
    hits = {x["doc_id"] for x in Searcher(r1).score(TermQuery("alpha")).collect()}
    assert hits == {0, 2}  # delete visible immediately
    assert r1.term_stats(["alpha"])["alpha"][0] == 3  # df pre-merge
    assert r1.stats.max_doc == 3  # maxDoc counts deleted pre-merge
    w.compact(min_segments=1)
    r2 = w.reader()
    assert r2.term_stats(["alpha"])["alpha"][0] == 2  # reclaimed
    assert r2.stats.max_doc == 2
    hits2 = {x["doc_id"] for x in Searcher(r2).score(TermQuery("alpha")).collect()}
    assert hits2 == {0, 2}


def test_update_replaces_and_rtg(spark, tmp_path):
    import pyspark.sql.functions as F

    from lucene_solr_spark.streaming.incremental import (
        IncrementalIndexWriter,
    )

    v1 = spark.createDataFrame(
        [(0, "old broken contents"), (1, "stable text")],
        "uid long, text string",
    )
    w = IncrementalIndexWriter(spark, str(tmp_path / "ix2"), ("uid",))
    w.process_batch(v1, 0)
    v2 = spark.createDataFrame(
        [(0, "new corrected contents")], "uid long, text string"
    )
    w.update_documents(v2, 1)
    got = w.reader().get([0], key_col="uid").collect()
    assert len(got) == 1 and got[0]["text"] == "new corrected contents"
    # replay of the same update batch is a no-op (exactly-once)
    w.update_documents(v2, 1)
    assert w.reader().get([0], key_col="uid").count() == 1
