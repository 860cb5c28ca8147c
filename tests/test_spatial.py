

def test_prefix_cover_is_complete_and_prunes(spark):
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.spatial import (
        cover_cells,
        geofilt,
        geofilt_prefix,
        geohash_encode_py,
        with_synthetic_coords,
    )

    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    pts = with_synthetic_coords(docs)
    for (lat, lon, d) in [(12.5, 40.0, 2500.0), (-33.0, 151.0, 800.0),
                          (60.0, -100.0, 1500.0)]:
        full = {(r["doc_id"], r["dist_km"])
                for r in geofilt(pts, lat, lon, d).collect()}
        fast = {(r["doc_id"], r["dist_km"])
                for r in geofilt_prefix(pts, lat, lon, d).collect()}
        assert full == fast, (lat, lon, d)
        p, cells = cover_cells(lat, lon, d)
        assert 1 <= len(cells) <= 64
        assert all(len(c) == p for c in cells)
    # the cover genuinely prunes: candidate count < corpus for a
    # small-radius query
    p, cells = cover_cells(12.5, 40.0, 300.0)
    from lucene_solr_spark.search.spatial import geohash_encode
    cand = pts.where(
        F.substring(geohash_encode(F.col("lat"), F.col("lon")), 1, p)
        .isin(cells)
    ).count()
    assert cand < 4000 * 0.2
    # completeness of the cell math itself: the center's own cell is
    # always in the cover
    assert geohash_encode_py(12.5, 40.0)[:p] in cells


def test_stored_geohash_prefix_filter_pushes_down(spark, tmp_path):
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.spatial import (
        geofilt,
        geofilt_prefix,
        geohash_encode,
        with_synthetic_coords,
    )

    pts = with_synthetic_coords(
        spark.range(0, 3000).select(F.col("id").alias("doc_id"))
    ).withColumn("gh", geohash_encode(F.col("lat"), F.col("lon")))
    d = str(tmp_path / "pts")
    pts.orderBy("gh").write.parquet(d)  # sorted -> tight row groups
    stored = spark.read.parquet(d)
    fast = geofilt_prefix(stored, 12.5, 40.0, 800.0, gh_col="gh")
    full = geofilt(stored, 12.5, 40.0, 800.0)
    assert sorted(
        (r["doc_id"], r["dist_km"]) for r in fast.collect()
    ) == sorted((r["doc_id"], r["dist_km"]) for r in full.collect())
    # the startswith predicates reach the parquet scan
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan and "PushedFilters" in plan
