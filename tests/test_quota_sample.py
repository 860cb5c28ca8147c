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


def test_zero_candidate_domain_still_sampled(spark):
    # regression: a domain whose hash cut admits ZERO candidates must
    # fall back to the full window, not vanish. Construct ids whose
    # md5 buckets all sit above the cut (quota=1, margin=0.5, 10 rows
    # -> cut = ceil(10000*1.5/10) = 1500).
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 10000

    high = [i for i in range(100000) if bucket(i) >= 2000][:10]
    assert len(high) == 10
    df = spark.createDataFrame(
        [(i, "only", "t") for i in high],
        "doc_id long, source string, text string",
    )
    out = quota_sample(df, 1, domain_col="source", prefilter_margin=0.5)
    rows = out.collect()
    assert len(rows) == 1
    # and it is the naive winner: lowest bucket, ties by id
    want = min(high, key=lambda i: (bucket(i), i))
    assert rows[0]["doc_id"] == want


def test_property_two_phase_always_exact(spark):
    # randomized-but-seeded property sweep: for a grid of corpus
    # shapes, quotas and margins (including degenerate ones), the
    # two-phase path must equal the naive window EXACTLY
    import random

    rng = random.Random(42)
    for case in range(6):
        n_domains = rng.randint(1, 6)
        rows = []
        next_id = 0
        for d in range(n_domains):
            size = rng.choice([1, 2, 7, 40, 150])
            for _ in range(size):
                # non-contiguous ids so hash buckets are arbitrary
                next_id += rng.randint(1, 97)
                rows.append((next_id, f"dom{d}", "x"))
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).repartition(rng.choice([1, 3, 8]))
        quota = rng.choice([1, 3, 10, 200])
        margin = rng.choice([0.0001, 0.1, 0.5, 2.0])
        naive = quota_sample(df, quota, domain_col="source")
        two = quota_sample(
            df, quota, domain_col="source", prefilter_margin=margin
        )
        assert _ids(naive) == _ids(two), (
            f"case {case}: quota={quota} margin={margin}"
        )


def test_replayable(domains_df):
    a = quota_sample(domains_df, 5, domain_col="source")
    b = quota_sample(
        domains_df.repartition(13), 5, domain_col="source"
    )
    assert _ids(a) == _ids(b)
