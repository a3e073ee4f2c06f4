"""Geolocation-array transformer tests (alg/gdalgeoloc.cpp semantics):
forward bilinear gather vs a scalar reference loop, edge clamping,
Newton inverse round-trip, Spark projection parity."""

import numpy as np
import pytest

from gdal_spark.functions.geoloc import GeolocArray, geoloc_project


def _arrays(ni=17, nj=13):
    i, j = np.meshgrid(np.arange(ni, dtype=float), np.arange(nj, dtype=float))
    lon = 10 + i + 0.01 * i * i + 0.05 * j
    lat = 50 + 0.9 * j + 0.02 * j * j - 0.03 * i
    return lon, lat


def _scalar_forward(lon_a, lat_a, step, px, ln):
    """Independent per-point reference: clamped-cell bilinear."""
    nj, ni = lon_a.shape
    u, v = px / step, ln / step
    i0 = min(max(int(np.floor(u)), 0), ni - 2)
    j0 = min(max(int(np.floor(v)), 0), nj - 2)
    fx, fy = u - i0, v - j0
    out = []
    for a in (lon_a, lat_a):
        out.append(
            (1 - fx) * (1 - fy) * a[j0, i0]
            + fx * (1 - fy) * a[j0, i0 + 1]
            + (1 - fx) * fy * a[j0 + 1, i0]
            + fx * fy * a[j0 + 1, i0 + 1]
        )
    return out


@pytest.fixture()
def geoloc():
    lon, lat = _arrays()
    return GeolocArray(lon, lat, pixel_step=4.0, line_step=4.0)


def test_forward_hits_samples_exactly(geoloc):
    """At sample positions (pixel = step*i) interpolation returns the
    array values bit-for-bit."""
    lon, lat = geoloc.forward([0.0, 4.0, 64.0], [0.0, 8.0, 48.0])
    assert lon[0] == geoloc.lon[0, 0] and lat[0] == geoloc.lat[0, 0]
    assert lon[1] == geoloc.lon[2, 1] and lat[1] == geoloc.lat[2, 1]
    assert lon[2] == geoloc.lon[12, 16] and lat[2] == geoloc.lat[12, 16]


def test_forward_fractional_vs_scalar(geoloc):
    rng = np.random.default_rng(7)
    px = rng.uniform(0, 64, 200)
    ln = rng.uniform(0, 48, 200)
    lo, la = geoloc.forward(px, ln)
    for k in range(200):
        elo, ela = _scalar_forward(geoloc.lon, geoloc.lat, 4.0, px[k], ln[k])
        assert lo[k] == pytest.approx(elo, abs=1e-12)
        assert la[k] == pytest.approx(ela, abs=1e-12)


def test_edge_clamp_extrapolates(geoloc):
    """Probes outside the grid use the border cell (reference edge
    handling) — matches the scalar reference with the same clamp."""
    for px, ln in [(-3.0, -2.0), (70.0, 50.0), (-1.0, 47.0), (65.0, 0.5)]:
        lo, la = geoloc.forward([px], [ln])
        elo, ela = _scalar_forward(geoloc.lon, geoloc.lat, 4.0, px, ln)
        assert lo[0] == pytest.approx(elo, abs=1e-12)
        assert la[0] == pytest.approx(ela, abs=1e-12)


def test_inverse_round_trip(geoloc):
    rng = np.random.default_rng(11)
    px = rng.uniform(0.5, 63.5, 300)
    ln = rng.uniform(0.5, 47.5, 300)
    lo, la = geoloc.forward(px, ln)
    rpx, rln = geoloc.inverse(lo, la)
    np.testing.assert_allclose(rpx, px, atol=1e-8)
    np.testing.assert_allclose(rln, ln, atol=1e-8)


def test_offsets_applied():
    lon, lat = _arrays()
    g = GeolocArray(lon, lat, pixel_offset=2.0, line_offset=1.0,
                    pixel_step=4.0, line_step=4.0)
    # pixel 2+4*3 = index 3 exactly
    lo, la = g.forward([14.0], [1.0 + 4.0 * 5])
    assert lo[0] == lon[5, 3]
    assert la[0] == lat[5, 3]


def test_warp_affine_equivalence():
    """gdalwarp -geoloc with arrays sampled from an exact affine
    mapping must equal the closed-form affine pullback (bilinear
    interpolation of an affine field is the field, so the inverse is
    the exact affine inverse)."""
    from gdal_spark.raster.pipeline import warp_geoloc_array
    from gdal_spark.raster.warp import sample_at

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 255, (48, 64), dtype=np.uint8).astype(float)
    a, b, c, d = 10.0, 0.05, 55.0, 0.04  # lon = a + b*px, lat = c - d*ln
    i, j = np.meshgrid(np.arange(9, dtype=float), np.arange(7, dtype=float))
    lon = a + b * (i * 8.0)  # pixel_step = 64/8
    lat = c - d * (j * 8.0)  # line_step = 48/6
    g = GeolocArray(lon, lat, pixel_step=8.0, line_step=8.0)
    out, valid, rt = warp_geoloc_array(arr, g, 32, 24, "bilinear")
    assert rt < 1e-9
    gx0, gx1 = lon.min(), lon.max()
    gy0, gy1 = lat.min(), lat.max()
    xs = gx0 + (np.arange(32) + 0.5) * (gx1 - gx0) / 32
    ys = gy1 - (np.arange(24) + 0.5) * (gy1 - gy0) / 24
    glon, glat = np.meshgrid(xs, ys)
    exp, _ = sample_at(arr, (glon - a) / b, (c - glat) / d, "bilinear")
    np.testing.assert_allclose(out, exp, atol=1e-7)


def test_warp_nonaffine_roundtrip_metric(spark, sf_dir):
    """Operator-level: every image's round-trip error quantizes to a
    tiny integer (the Newton inverse converged) and checksums are
    stable ints."""
    from gdal_spark.raster.pipeline import warp_with_geoloc
    from gdal_spark.sources import synth

    imgs = synth.images(spark, sf_dir, where="okey % 200 = 0")
    rows = warp_with_geoloc(imgs).collect()
    assert rows
    for r in rows:
        assert abs(r.rt_err_ndeg) < 1000  # < 1 micro-degree
        assert isinstance(r.checksum, int)


def test_spark_projection_parity(spark, geoloc):
    import pandas as pd

    rng = np.random.default_rng(3)
    px = rng.uniform(0, 64, 500)
    ln = rng.uniform(0, 48, 500)
    df = spark.createDataFrame(pd.DataFrame({"px": px, "ln": ln}))
    rows = geoloc_project(df, geoloc, "px", "ln").select("px", "lon", "lat").collect()
    exp_lon, exp_lat = geoloc.forward(px, ln)
    by_px = {r.px: (r.lon, r.lat) for r in rows}
    for k in range(500):
        lo, la = by_px[px[k]]
        assert lo == pytest.approx(exp_lon[k], abs=1e-12)
        assert la == pytest.approx(exp_lat[k], abs=1e-12)
