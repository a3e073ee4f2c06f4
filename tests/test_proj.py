"""Projection registry correctness (functions/proj.py).

No PROJ/pyproj exists in the sandbox, so correctness is pinned by
the strongest available external + mathematical oracles:

1. a published authority test vector (Ordnance Survey's worked
   example for the British National Grid — "A guide to coordinate
   systems in Great Britain", Annex C);
2. exact anchor identities (natural origin → (FE, FN));
3. forward∘inverse roundtrips below 1e-7 deg across each CRS's
   service area;
4. the differential invariants that uniquely characterize each
   projection class: conformal scale k == 1 along LCC standard
   parallels and the polar-stereo standard parallel, area scale
   h·k == 1 everywhere for Albers (finite differences);
5. Helmert consistency: forward∘inverse is identity, and the OSGB36
   shift moves points by the publicly known ~120 m magnitude.

Reference parity: ``ogr/ogrct.cpp`` (OGRCreateCoordinateTransformation),
``alg/gdaltransformer.cpp:2236`` chain; semantics tests
``autotest/ogr/ogr_ct.py``.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gdal_spark.functions import proj as P
from gdal_spark.functions import srs


def test_osgb_published_vector():
    """OS worked example: OSGB36 52°39'27.2531\"N 1°43'4.5177\"E →
    E 651409.903 N 313177.270 (nearest mm)."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = P.lookup(27700).proj.forward(lon, lat)
    assert abs(float(x) - 651409.903) < 2e-3
    assert abs(float(y) - 313177.270) < 2e-3


@pytest.mark.parametrize(
    "code,origin,expect",
    [
        (2154, (3.0, 46.5), (700000.0, 6600000.0)),
        (3978, (-95.0, 49.0), (0.0, 0.0)),
        (3034, (10.0, 52.0), (4000000.0, 2800000.0)),
        (5070, (-96.0, 23.0), (0.0, 0.0)),
        (3577, (132.0, 0.0), (0.0, 0.0)),
        (3031, (0.0, -90.0), (0.0, 0.0)),
        (3413, (-45.0, 90.0), (0.0, 0.0)),
        (5041, (0.0, 90.0), (2000000.0, 2000000.0)),
    ],
)
def test_natural_origin_anchor(code, origin, expect):
    x, y = P.lookup(code).proj.forward(*origin)
    assert abs(float(x) - expect[0]) < 1e-6
    assert abs(float(y) - expect[1]) < 1e-6


SERVICE = {
    2154: ((-4, 9), (41, 51)),
    3978: ((-140, -50), (40, 85)),
    3034: ((-10, 30), (35, 70)),
    5070: ((-125, -67), (24, 50)),
    3577: ((112, 154), (-44, -10)),
    3031: ((-180, 180), (-89, -60)),
    3413: ((-180, 180), (60, 89)),
    5041: ((-180, 180), (60, 89)),
    27700: ((-6, 1.5), (50, 58)),
    25832: ((6, 12), (38, 62)),
    26917: ((-84, -78), (24, 50)),
}


@pytest.mark.parametrize("code", sorted(SERVICE))
def test_roundtrip(code):
    (lo0, lo1), (la0, la1) = SERVICE[code]
    rng = np.random.default_rng(code)
    lons = rng.uniform(lo0, lo1, 500)
    lats = rng.uniform(la0, la1, 500)
    crs = P.lookup(code)
    x, y = P.from_lonlat_wgs84(crs, lons, lats)
    lo, la = P.to_lonlat_wgs84(crs, x, y)
    dlon = np.abs(P._wrap_lon(lo - lons))
    assert dlon.max() < 1e-7
    assert np.abs(la - lats).max() < 1e-7


def _merid_radius(ell, lat):
    phi = np.deg2rad(lat)
    return ell.a * (1 - ell.e2) / (1 - ell.e2 * np.sin(phi) ** 2) ** 1.5


def _k_meridional(proj, lon, lat, ell):
    eps = 1e-7
    x0, y0 = proj.forward(lon, lat)
    x1, y1 = proj.forward(lon, lat + eps)
    return float(np.hypot(x1 - x0, y1 - y0) / (_merid_radius(ell, lat) * np.deg2rad(eps)))


def test_lcc_scale_unity_on_standard_parallels():
    p = P.lookup(2154).proj
    for lon in (-1.0, 3.0, 7.0):
        assert abs(_k_meridional(p, lon, 49.0, P.GRS80) - 1.0) < 1e-6
        assert abs(_k_meridional(p, lon, 44.0, P.GRS80) - 1.0) < 1e-6
    # off the standard parallels the cone is strictly expanding
    assert _k_meridional(p, 3.0, 41.0, P.GRS80) > 1.0005
    assert _k_meridional(p, 3.0, 46.5, P.GRS80) < 1.0


def test_polar_stereo_scale_unity_at_lat_ts():
    p3031 = P.lookup(3031).proj
    for lon in (0.0, 77.0, -120.0):
        assert abs(_k_meridional(p3031, lon, -71.0, P.WGS84) - 1.0) < 1e-6
    p3413 = P.lookup(3413).proj
    for lon in (0.0, 77.0, -120.0):
        assert abs(_k_meridional(p3413, lon, 70.0, P.WGS84) - 1.0) < 1e-6


def test_albers_preserves_area():
    p = P.lookup(5070).proj
    ell = P.GRS80
    eps = 1e-7
    for lon, lat in [(-120.0, 30.0), (-96.0, 40.0), (-70.0, 47.0)]:
        x0, y0 = p.forward(lon, lat)
        xl, yl = p.forward(lon + eps, lat)
        xp, yp = p.forward(lon, lat + eps)
        J = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
        phi = math.radians(lat)
        N = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
        ground = (N * math.cos(phi) * math.radians(eps)) * (
            _merid_radius(ell, lat) * math.radians(eps)
        )
        assert abs(J / ground - 1.0) < 1e-5


def test_helmert_roundtrip_and_magnitude():
    h = P._OSGB36
    rng = np.random.default_rng(3)
    x = rng.uniform(3.5e6, 4.0e6, 100)
    y = rng.uniform(-3e5, 1e5, 100)
    z = rng.uniform(4.8e6, 5.2e6, 100)
    X, Y, Z = h.forward(x, y, z)
    xb, yb, zb = h.inverse(X, Y, Z)
    assert np.abs(xb - x).max() < 1e-6
    assert np.abs(yb - y).max() < 1e-6
    assert np.abs(zb - z).max() < 1e-6
    # OSGB36<->WGS84 is famously a ~100-130 m shift over GB
    lon, lat = -1.0, 53.0
    gx, gy, gz = P.geodetic_to_geocentric(P.WGS84, lon, lat)
    sx, sy, sz = h.inverse(gx, gy, gz)
    lo36, la36 = P.geocentric_to_geodetic(P.AIRY1830, sx, sy, sz)
    d = math.hypot((float(lo36) - lon) * 111320 * math.cos(math.radians(lat)),
                   (float(la36) - lat) * 110574)
    assert 80.0 < d < 160.0


def test_geocentric_roundtrip():
    rng = np.random.default_rng(5)
    lons = rng.uniform(-180, 180, 300)
    lats = rng.uniform(-89.9, 89.9, 300)
    x, y, z = P.geodetic_to_geocentric(P.WGS84, lons, lats)
    lo, la = P.geocentric_to_geodetic(P.WGS84, x, y, z)
    assert np.abs(P._wrap_lon(lo - lons)).max() < 1e-10
    assert np.abs(la - lats).max() < 1e-10


def test_srs_transform_np_chains_through_registry():
    """srs.transform_np handles registry codes end-to-end (the
    warped-layer / warp entry point)."""
    lons = np.array([2.35, 3.0, 5.4])
    lats = np.array([48.85, 46.5, 43.3])
    x, y = srs.transform_np(lons, lats, 4326, 2154)
    lo, la = srs.transform_np(x, y, 2154, 4326)
    assert np.abs(lo - lons).max() < 1e-8
    assert np.abs(la - lats).max() < 1e-8
    # chained projected->projected via the WGS84 hub, with datum shift.
    # tolerance is mm-class, not nm: a 2-D chain drops ellipsoidal
    # height, and the OSGB36 Helmert offsets (~±60 m vertical) make
    # forward∘inverse agree only to ~1 mm — PROJ's 2-D pipelines have
    # the same property.
    x2, y2 = srs.transform_np(x, y, 2154, 27700)
    x3, y3 = srs.transform_np(x2, y2, 27700, 2154)
    assert np.abs(x3 - x).max() < 5e-3
    assert np.abs(y3 - y).max() < 5e-3


def test_unknown_epsg_still_raises():
    with pytest.raises(ValueError, match="proj.py EPSG table"):
        srs.parse_epsg(99999)


def test_sql_twin_matches_numpy_in_duckdb():
    """The shared-SQL forward (Spark∩DuckDB text) agrees with the
    NumPy kernel to sub-micrometer for the conic/azimuthal twins."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(11)
    cases = {
        2154: ((-4, 9), (41, 51)),
        5070: ((-125, -67), (24, 50)),
        3577: ((112, 154), (-44, -10)),
        3031: ((-180, 180), (-89, -60)),
        3413: ((-180, 180), (60, 89)),
    }
    con = duckdb.connect()
    for code, ((lo0, lo1), (la0, la1)) in cases.items():
        lons = rng.uniform(lo0, lo1, 200)
        lats = rng.uniform(la0, la1, 200)
        crs = P.lookup(code)
        xs, ys = P.from_lonlat_wgs84(crs, lons, lats)
        xsql, ysql = P.forward_sql(code, "lon", "lat")
        con.register("pts", pd.DataFrame({"lon": lons, "lat": lats}))
        res = con.execute(f"SELECT {xsql} AS x, {ysql} AS y FROM pts").fetchnumpy()
        assert np.abs(res["x"] - xs).max() < 1e-5, code
        assert np.abs(res["y"] - ys).max() < 1e-5, code


def test_sql_twin_datum_shift_refused():
    with pytest.raises(ValueError, match="datum shift"):
        P.forward_sql(27700, "lon", "lat")


# ---------------------------------------------------------------------------
# round-4 late additions: LAEA (EPSG:3035) + CEA / EASE-Grid 2.0 (6933)
# ---------------------------------------------------------------------------


def test_laea_cea_anchor_roundtrip_area():
    # LAEA natural origin -> (FE, FN)
    x, y = P.lookup(3035).proj.forward(10.0, 52.0)
    assert abs(float(x) - 4321000.0) < 1e-6 and abs(float(y) - 3210000.0) < 1e-6
    # CEA equator/lon0 -> (0, 0)
    x, y = P.lookup(6933).proj.forward(0.0, 0.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    rng = np.random.default_rng(9)
    for code, (lo, hi), (la0, la1) in (
        (3035, (-10, 30), (35, 70)),
        (6933, (-179, 179), (-80, 80)),
    ):
        lons = rng.uniform(lo, hi, 400)
        lats = rng.uniform(la0, la1, 400)
        crs = P.lookup(code)
        xx, yy = P.from_lonlat_wgs84(crs, lons, lats)
        lo2, la2 = P.to_lonlat_wgs84(crs, xx, yy)
        assert np.abs(P._wrap_lon(lo2 - lons)).max() < 1e-7
        assert np.abs(la2 - lats).max() < 1e-7
    # both are equal-area: h*k == 1 everywhere
    eps = 1e-7
    for code, pts, ell in (
        (3035, [(5.0, 45.0), (20.0, 60.0)], P.GRS80),
        (6933, [(-120.0, 10.0), (77.0, -45.0)], P.WGS84),
    ):
        p = P.lookup(code).proj
        for lon, lat in pts:
            x0, y0 = p.forward(lon, lat)
            xl, yl = p.forward(lon + eps, lat)
            xp, yp = p.forward(lon, lat + eps)
            J = abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
            phi = math.radians(lat)
            N = ell.a / math.sqrt(1 - ell.e2 * math.sin(phi) ** 2)
            ground = (N * math.cos(phi) * math.radians(eps)) * (
                _merid_radius(ell, lat) * math.radians(eps)
            )
            assert abs(J / ground - 1.0) < 1e-5, (code, lon, lat)


def test_laea_cea_sql_twins():
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(13)
    con = duckdb.connect()
    for code, (lo, hi), (la0, la1) in (
        (3035, (-10, 30), (35, 70)),
        (6933, (-179, 179), (-80, 80)),
    ):
        lons = rng.uniform(lo, hi, 200)
        lats = rng.uniform(la0, la1, 200)
        crs = P.lookup(code)
        xs, ys = P.from_lonlat_wgs84(crs, lons, lats)
        xsql, ysql = P.forward_sql(code, "lon", "lat")
        con.register("pts", pd.DataFrame({"lon": lons, "lat": lats}))
        res = con.execute(f"SELECT {xsql} AS x, {ysql} AS y FROM pts").fetchnumpy()
        assert np.abs(res["x"] - xs).max() < 1e-5, code
        assert np.abs(res["y"] - ys).max() < 1e-5, code


def test_sinusoidal_published_pins():
    """Sinusoidal pins: (a) the WGS84 quarter meridian is the published
    10 001 965.729 m (Snyder meridian-arc series 3-21 at 90°); (b) the
    MODIS grid half-width is the documented 20 015 109.354 m (π·R for
    the MODIS sphere R = 6 371 007.181, MODIS user-guide constant);
    (c) forward/inverse round trip to sub-µdeg."""
    import numpy as np

    from gdal_spark.functions.proj import MODIS_SPHERE, WGS84, Sinusoidal

    s_wgs = Sinusoidal(WGS84, 0.0)
    _, qm = s_wgs.forward(0.0, 90.0)
    assert abs(float(qm) - 10001965.7293) < 0.01

    s_mod = Sinusoidal(MODIS_SPHERE, 0.0)
    x, _ = s_mod.forward(180.0, 0.0)
    assert abs(float(x) - 20015109.354) < 0.01

    rng = np.random.default_rng(4)
    lon = rng.uniform(-179, 179, 50)
    lat = rng.uniform(-85, 85, 50)
    for p in (s_wgs, s_mod):
        x, y = p.forward(lon, lat)
        lon2, lat2 = p.inverse(x, y)
        # the e^6/e1^4-truncated Snyder 3-21/3-26 series pair leaves
        # ~7e-9 deg (≈0.8 mm) in φ; λ = x/(a·cosφ) amplifies that by
        # 1/cosφ at high latitude
        assert np.abs(lat2 - lat).max() < 1e-8
        assert np.abs(lon2 - lon).max() < 1e-6


def test_sinusoidal_sql_twin_matches_kernel(spark):
    """Shared-SQL forward == NumPy kernel bit-for-bit-ish (<1e-6 m)."""
    import numpy as np

    from gdal_spark.functions.proj import lookup, sinus_sql

    crs = lookup(96974)
    x_sql, y_sql = sinus_sql(crs.proj, "lon", "lat")
    df = spark.createDataFrame(
        [(float(lo), float(la)) for lo in (-120, -30, 45, 170) for la in (-55, 0, 33, 59)],
        "lon double, lat double",
    )
    rows = df.selectExpr("lon", "lat", f"{x_sql} AS x", f"{y_sql} AS y").collect()
    for r in rows:
        x, y = crs.proj.forward(r.lon, r.lat)
        assert abs(float(x) - r.x) < 1e-6
        assert abs(float(y) - r.y) < 1e-6
