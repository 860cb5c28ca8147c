"""Spatial search — the LatLonType / geofilt surface (SURVEY.md §2.12).

References: solr/core/src/java/org/apache/solr/schema/LatLonType.java
(+ solr/core/.../search/SpatialFilterQParserPlugin.java '{!geofilt}'):
filter docs within d km of a point, with a bounding-box prune before
the exact great-circle test; lucene/spatial/ provides the underlying
distance math (GeoDistanceUtils haversine).

Spark shape: the bounding box is a pair of BETWEEN predicates pushed
into the parquet scan (the trie/grid prune analogue — at 100 TB this is
partition + row-group pruning on lat/lon min-max stats); only surviving
rows pay the haversine, a whole-stage-codegen'd expression. No UDFs.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

EARTH_RADIUS_KM = 6371.0087714  # GeoDistanceUtils mean earth radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km, double math in a fixed op order
    (mirrored textually by the SQL oracle)."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.atan2(F.sqrt(a), F.sqrt(F.lit(1.0) - a))
    )


def geofilt(
    docs: DataFrame,
    lat: float,
    lon: float,
    d_km: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """{!geofilt pt=lat,lon d=km}: docs within d km, with a bbox prune
    before the exact haversine. Returns (doc_id, dist_km)."""
    dlat = math.degrees(d_km / EARTH_RADIUS_KM)
    coslat = math.cos(math.radians(lat))
    dlon = 180.0 if coslat <= 1e-9 else math.degrees(
        d_km / (EARTH_RADIUS_KM * coslat)
    )
    boxed = docs.where(
        F.col(lat_col).between(lat - dlat, lat + dlat)
        & F.col(lon_col).between(lon - dlon, lon + dlon)
    )
    dist = haversine_km(
        F.lit(float(lat)),
        F.lit(float(lon)),
        F.col(lat_col),
        F.col(lon_col),
    )
    return (
        boxed.withColumn("dist_km", dist)
        .where(F.col("dist_km") <= F.lit(float(d_km)))
        .select("doc_id", F.round("dist_km", 4).alias("dist_km"))
    )


def with_synthetic_coords(docs: DataFrame) -> DataFrame:
    """Deterministic lat/lon derived from doc_id (the driver tables
    carry no coordinates; both engine and oracle derive the SAME values
    from the same integer arithmetic, so the operator is fully gated)."""
    lat = (F.pmod(F.col("doc_id") * F.lit(37), F.lit(1800)) / 10.0) - 90.0
    lon = (F.pmod(F.col("doc_id") * F.lit(73), F.lit(3600)) / 10.0) - 180.0
    return docs.withColumn("lat", lat).withColumn("lon", lon)
