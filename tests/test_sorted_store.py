"""Sort-on-write store + early-terminating top-k
(index/sorted_store.py): rank identity vs a full sort, score-safe
early termination, zone-map manifest."""

import pyspark.sql.functions as F

from lucene_solr_spark.index.sorted_store import (
    build_sorted_store,
    read_sorted_manifest,
    sorted_topk,
)


def _corpus(spark, n=2000):
    # deterministic, heavy ties: val cycles 0..99
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("double").alias("val"),
        (F.col("id") % 7).alias("grp"),
    )


def _expect(df, k, pred=None, descending=True):
    d = df if pred is None else df.where(pred(df))
    sort = (
        [F.desc("val"), F.asc("doc_id")]
        if descending
        else [F.asc("val"), F.asc("doc_id")]
    )
    return [tuple(r) for r in d.orderBy(*sort).limit(k).collect()]


def _got(spark, store, k, pred=None, descending=True, stats=None):
    out = sorted_topk(
        spark, store, k, where=pred, descending=descending,
        stats_out=stats,
    ).select("doc_id", "val", "grp")
    return [tuple(r) for r in out.collect()]


def test_topk_rank_identity(spark, tmp_path):
    df = _corpus(spark)
    store = str(tmp_path / "st")
    build_sorted_store(df, "val", store, n_buckets=8)
    for k in (1, 10, 150):
        assert _got(spark, store, k) == _expect(df, k), f"k={k}"
    # ascending too
    assert _got(spark, store, 25, descending=False) == _expect(
        df, 25, descending=False
    )


def test_topk_with_predicate(spark, tmp_path):
    df = _corpus(spark)
    store = str(tmp_path / "st")
    build_sorted_store(df, "val", store, n_buckets=8)
    pred = lambda d: F.col("grp") == 3
    assert _got(spark, store, 20, pred) == _expect(df, 20, pred)
    # predicate with zero matches -> empty, no error
    none = lambda d: F.col("grp") == 99
    assert _got(spark, store, 5, none) == []


def test_early_termination_reads_fewer_buckets(spark, tmp_path):
    df = _corpus(spark)
    store = str(tmp_path / "st")
    build_sorted_store(df, "val", store, n_buckets=16)
    stats = {}
    got = _got(spark, store, 10, stats=stats)
    assert got == _expect(df, 10)
    # 10 rows from 2000 must not open the whole store
    assert stats["buckets_read"] < stats["buckets_total"]
    assert stats["probe_jobs"] <= 5  # geometric probing


def test_ties_never_span_buckets(spark, tmp_path):
    """bucket i = {v: exactly i bounds <= v}: equal sort keys always
    land in one bucket, so stopping at k matches is score-safe even
    on a massively tied column."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("double").alias("val"),  # 3 values only
        F.lit(0).alias("grp"),
    )
    store = str(tmp_path / "st")
    build_sorted_store(df, "val", store, n_buckets=8)
    man = read_sorted_manifest(store)
    by_val = {}
    data = spark.read.parquet(store + "/data")
    for r in data.select("val", "sbucket").distinct().collect():
        by_val.setdefault(r["val"], set()).add(r["sbucket"])
    assert all(len(s) == 1 for s in by_val.values())
    assert _got(spark, store, 12) == _expect(df, 12)
    assert len(man["zones"]) <= 8


def test_manifest_zone_maps(spark, tmp_path):
    df = _corpus(spark)
    store = str(tmp_path / "st")
    build_sorted_store(df, "val", store, n_buckets=4)
    man = read_sorted_manifest(store)
    assert man["sort_col"] == "val"
    assert sum(z["rows"] for z in man["zones"]) == 2000
    # zone maps are disjoint and ordered: max of bucket i < min of i+1
    zs = man["zones"]
    for a, b in zip(zs, zs[1:]):
        assert a["max"] < b["min"]
