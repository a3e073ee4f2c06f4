"""Geocoding against a gazetteer table (ogr_geocode SQL functions).

The reference exposes ``ogr_geocode(name)`` / ``ogr_geocode_reverse
(lon, lat, field)`` (ogr/ogrsqlitesqlfunctions.cpp:1111+) backed by
OGRGeocode (ogr/ogrgeocoding.cpp) — an HTTP Nominatim/Yahoo query with
a local cache layer. A Spark cluster geocodes against a gazetteer
TABLE instead of a remote service (the cache table is the durable part
of the reference design; the HTTP hop has no place in a 100 TB scan):

- forward: exact-name equi-join against the gazetteer (broadcast dim)
- reverse: nearest gazetteer entry by great-circle distance —
  broadcast the (small) gazetteer, one cross join + windowed argmin;
  the probe side never shuffles, so the op is skew-immune and scales
  linearly with the point count.

Ties broken by (dist, place_id) — deterministic and
algorithm-independent, mirrored in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

from gdal_spark.operators.gnm import HAVERSINE_MM_SQL


def reverse_geocode(points: DataFrame, places: DataFrame) -> DataFrame:
    """ogr_geocode_reverse(lon, lat, 'display_name')
    (ogrsqlitesqlfunctions.cpp:1111, OGRGeocodeReverse
    ogr/ogrgeocoding.cpp): nearest gazetteer place for every point.

    ``points``: (pt_id, lon, lat); ``places``: (place_id, place, lon,
    lat). Returns (pt_id, place, dist_m) with the mm-snapped
    great-circle distance (shared SQL text → bit-identical in the
    DuckDB oracle)."""
    p = points.select(
        "pt_id", F.col("lon").alias("lon1"), F.col("lat").alias("lat1")
    )
    g = places.select(
        "place_id", "place", F.col("lon").alias("lon2"), F.col("lat").alias("lat2")
    )
    d = p.crossJoin(broadcast(g)).withColumn("dist_m", F.expr(HAVERSINE_MM_SQL))
    w = Window.partitionBy("pt_id").orderBy("dist_m", "place_id")
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("pt_id", "place", "dist_m")
    )


def forward_geocode(names: DataFrame, places: DataFrame) -> DataFrame:
    """ogr_geocode(name) (ogrsqlitesqlfunctions.cpp:1023,
    OGRGeocode): exact-name lookup returning the place point; NULL
    coordinates when unknown (the reference returns a NULL blob)."""
    return names.join(
        broadcast(places.select("place", "lon", "lat")), "place", "left"
    )
