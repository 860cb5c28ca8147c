import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark(app_name="lss-tests", master="local[8]")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pdf():
    from lucene_solr_spark.corpus import generate_transcripts

    pdf = generate_transcripts(200)
    docs = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs["doc_id"] = range(len(docs))
    return docs


@pytest.fixture(scope="session")
def small_pdf():
    from lucene_solr_spark.corpus import generate_transcripts

    pdf = generate_transcripts(5000)
    docs = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    docs["doc_id"] = range(len(docs))
    return docs


@pytest.fixture(scope="session")
def tiny_oracle(tiny_pdf):
    from lucene_solr_spark.oracle_engine import OracleIndex

    return OracleIndex(tiny_pdf)


@pytest.fixture(scope="session")
def small_oracle(small_pdf):
    from lucene_solr_spark.oracle_engine import OracleIndex

    return OracleIndex(small_pdf)


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_pdf):
    from lucene_solr_spark.index.builder import build_index

    sdf = spark.createDataFrame(
        tiny_pdf.drop(columns=["doc_id"])
    ).repartition(4, "conv_id")
    return build_index(spark, sdf, cache=True)


@pytest.fixture(scope="session")
def small_index(spark, small_pdf):
    from lucene_solr_spark.index.builder import build_index

    sdf = spark.createDataFrame(
        small_pdf.drop(columns=["doc_id"])
    ).repartition(8, "conv_id")
    return build_index(spark, sdf, cache=True)


def assert_topk_equal(got_rows, want, abs_tol=1e-5, rel_tol=1e-3):
    """CheckHits semantics: docIDs exact, scores within tolerance
    (lucene/test-framework/.../search/CheckHits.java:42,161-208)."""
    got = [(int(r["doc_id"]), float(r["score"])) for r in got_rows]
    assert [g[0] for g in got] == [w[0] for w in want], (
        f"docID sequence mismatch:\n got={got}\nwant={want}"
    )
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) <= max(abs_tol, rel_tol * abs(w[1])), (
            f"score mismatch doc {g[0]}: {g[1]} vs {w[1]}"
        )
