"""SRS reprojection tests — UTM Krüger series + warped layer + warp grid.

External anchors (public geodesy constants, no PROJ needed):
- quarter meridian of WGS84 = 10 001 965.7293 m,
- meridian arc to 45°N = 4 984 944.378 m,
- central meridian of a zone maps to E=500000 exactly,
- an independent Snyder/Redfearn series implementation agrees < 1 mm,
mirroring ``autotest/utilities/test_gdalwarp.py`` / ``test_ogr2ogr.py:62``
(EPSG:32631) which verify against known coordinates.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions import geometry as G
from gdal_spark.functions import srs


def snyder_utm(lon, lat, zone):
    """Independent classical series (Snyder 1987, eq. 8-9..8-15)."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lam = math.radians(lon - srs.utm_zone_lon0(zone))
    phi = math.radians(lat)
    n = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    t = math.tan(phi) ** 2
    c = ep2 * math.cos(phi) ** 2
    aa = lam * math.cos(phi)
    m = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
        - (35 * e2**3 / 3072) * math.sin(6 * phi)
    )
    east = 500000 + k0 * n * (
        aa + (1 - t + c) * aa**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * aa**5 / 120
    )
    north = k0 * (
        m
        + n
        * math.tan(phi)
        * (
            aa**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * aa**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * aa**6 / 720
        )
    )
    return east, north


def test_geodesy_anchors():
    assert abs(srs.A_RECT * math.pi / 2 - 10001965.7293) < 1e-3
    e, n = srs.utm_forward_np([3.0], [0.0], 31)
    assert e[0] == 500000.0 and n[0] == 0.0
    e, n = srs.utm_forward_np([3.0], [45.0], 31)
    assert abs(n[0] / srs.K0 - 4984944.378) < 1e-2


def test_utm_matches_independent_series():
    for lon, lat in [(2, 49), (0, 0), (5.9, 70), (0.1, -40), (4.5, -12)]:
        e1, n1 = srs.utm_forward_np([lon], [lat], 31)
        e2, n2 = snyder_utm(lon, lat, 31)
        assert abs(e1[0] - e2) < 1e-2, (lon, lat)
        assert abs(n1[0] - n2) < 1e-2, (lon, lat)


def test_utm_roundtrip():
    rng = np.random.default_rng(7)
    lons = rng.uniform(-1, 7, 300)
    lats = rng.uniform(-84, 84, 300)
    e, n = srs.utm_forward_np(lons, lats, 31)
    lo, la = srs.utm_inverse_np(e, n, 31)
    assert np.abs(lo - lons).max() < 1e-8
    assert np.abs(la - lats).max() < 1e-8


def test_south_zone_false_northing():
    e_n, n_n = srs.utm_forward_np([3.0], [-10.0], 31, south=False)
    e_s, n_s = srs.utm_forward_np([3.0], [-10.0], 31, south=True)
    assert n_s[0] == n_n[0] + 10000000.0
    assert e_s[0] == e_n[0]


def test_transform_chain_epsg():
    # 3857 → 32631 chains through lon/lat
    mx, my = srs.merc_forward_np([2.0], [49.0])
    e1, n1 = srs.transform_np(mx, my, 3857, 32631)
    e2, n2 = srs.utm_forward_np([2.0], [49.0], 31)
    assert abs(e1[0] - e2[0]) < 1e-6 and abs(n1[0] - n2[0]) < 1e-6
    # 27700 graduated into the proj.py registry in round 4; a code
    # nobody registered still raises with a pointer to the table
    assert srs.parse_epsg(27700)["kind"] == "general"
    with pytest.raises(ValueError):
        srs.parse_epsg(99999)


def test_sql_matches_numpy(spark):
    """The shared SQL text must equal the NumPy kernel to float noise
    (same math, different evaluators)."""
    from pyspark.sql import functions as F

    e_sql, n_sql = srs.utm_sql("lon", "lat", 31)
    df = spark.createDataFrame(
        [(2.0, 49.0), (0.5, -33.0), (5.5, 71.5)], "lon double, lat double"
    ).withColumn("e", F.expr(e_sql)).withColumn("n", F.expr(n_sql))
    rows = df.collect()
    for r in rows:
        e, n = srs.utm_forward_np([r.lon], [r.lat], 31)
        assert abs(r.e - e[0]) < 1e-6
        assert abs(r.n - n[0]) < 1e-6


def test_warped_layer_geometry(spark):
    from gdal_spark.operators.warped_layer import warped_layer

    wkb = G.wkb_bbox_polygon(1.0, 48.0, 2.0, 49.0)
    df = spark.createDataFrame([(1, bytearray(wkb))], "id long, geom binary")
    out = warped_layer(df, 4326, 32631).collect()[0]
    g = G.parse_wkb(bytes(out.geom))
    ring = g.rings[0]
    # every transformed vertex equals the direct kernel transform
    src = G.parse_wkb(wkb).rings[0]
    e, n = srs.utm_forward_np(src[:, 0], src[:, 1], 31)
    assert np.allclose(ring[:, 0], e) and np.allclose(ring[:, 1], n)
    # UTM sanity: west of central meridian → easting < 500000
    assert ring[:, 0].max() < 500000.0


def test_warp_grid_identity_region():
    """Warping into a 4326 'grid' (identity SRS) reproduces a plain
    resample of the footprint window."""
    from gdal_spark.raster.warp import warp_lonlat_to_grid

    src = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
    out, valid = warp_lonlat_to_grid(
        src, 10.0, 40.0, 10.1, 40.1, (10.0, 40.0, 10.1, 40.1), 4326, 64, 64, "near"
    )
    assert valid.all()
    assert (out == src).all()


def test_warp_to_utm_grid_covers():
    from gdal_spark.raster.warp import warp_lonlat_to_grid

    src = np.full((32, 32), 200, dtype=np.uint8)
    e, n = srs.utm_forward_np([0.5, 0.6], [50.0, 50.1], 31)
    out, valid = warp_lonlat_to_grid(
        src, 0.5, 50.0, 0.6, 50.1,
        (float(e.min()), float(n.min()), float(e.max()), float(n.max())),
        32631, 48, 48, "near",
    )
    # center of the grid must hit the source; corners may fall outside
    assert valid[24, 24]
    assert out[valid].min() == 200


def test_warp_cubic_lanczos_interpolating():
    """Catmull-Rom and Lanczos are interpolating kernels: sampling at
    exact pixel centers reproduces the source; off-center samples of
    a linear ramp reproduce the ramp (cubic is linear-exact)."""
    from gdal_spark.raster.warp import _sample_cubic, _sample_lanczos, sample_at

    src = (np.arange(16 * 16, dtype=np.float64).reshape(16, 16) % 251)
    yy, xx = np.mgrid[0:16, 0:16]
    sx = xx + 0.5  # pixel centers
    sy = yy + 0.5
    for fn in (_sample_cubic, _sample_lanczos):
        out, valid = fn(src, sx, sy)
        assert valid.all()
        assert np.abs(out - src).max() < 1e-9, fn.__name__
    # linear ramp, off-center positions: cubic reproduces exactly
    ramp = np.tile(np.arange(32, dtype=np.float64)[None, :], (8, 1))
    qx = np.full((8, 20), 0.0) + np.linspace(3.2, 28.7, 20)[None, :]
    qy = np.full((8, 20), 4.0)
    out, valid = _sample_cubic(ramp, qx, qy)
    assert np.abs(out - (qx - 0.5)).max() < 1e-9
    # uint8 path: rounding + clipping applied
    u8 = (src).astype(np.uint8)
    out8, _ = sample_at(u8, sx, sy, "cubic")
    assert out8.dtype == np.uint8
    assert np.array_equal(out8, u8)
