"""Domain-balanced quota sampling (datapipe/training.py::quota_sample)."""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.datapipe.training import quota_sample


@pytest.fixture(scope="module")
def domains_df(spark):
    rows = [
        (i, f"d{i % 7}", f"text {i}") for i in range(400)
    ] + [  # one tiny domain below the quota
        (1000 + i, "tiny", "t") for i in range(3)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).repartition(6)


def _ids(df):
    return sorted(
        (r["source"], r["doc_id"])
        for r in df.select("source", "doc_id").collect()
    )


def test_exact_quota_per_domain(domains_df):
    out = quota_sample(domains_df, 10, domain_col="source")
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for i in range(7):
        assert counts[f"d{i}"] == 10
    # undersized domain keeps everything it has
    assert counts["tiny"] == 3


def test_two_phase_matches_naive_window(domains_df):
    naive = quota_sample(domains_df, 10, domain_col="source")
    two_phase = quota_sample(
        domains_df, 10, domain_col="source", prefilter_margin=0.5
    )
    assert _ids(naive) == _ids(two_phase)


def test_shortfall_fallback_still_exact(domains_df):
    # a pathologically thin margin forces the per-domain fallback for
    # most domains; the result must STILL equal the naive selection
    naive = quota_sample(domains_df, 25, domain_col="source")
    thin = quota_sample(
        domains_df, 25, domain_col="source", prefilter_margin=0.0001
    )
    assert _ids(naive) == _ids(thin)


def test_replayable(domains_df):
    a = quota_sample(domains_df, 5, domain_col="source")
    b = quota_sample(
        domains_df.repartition(13), 5, domain_col="source"
    )
    assert _ids(a) == _ids(b)
