"""ApproxTransformer tests (alg/gdaltransformer.cpp:58 semantics):
error-bounded scanline subdivision vs the exact transformer chain."""

import numpy as np

from gdal_spark.functions import srs as S
from gdal_spark.raster.warp import approx_transform_grid, warp_lonlat_to_grid


def _grid(epsg, lon0=2.0, lat0=44.0, lon1=8.0, lat1=49.0, nx=128, ny=96):
    ex, ny_ = S.transform_np([lon0, lon1], [lat0, lat1], 4326, epsg)
    xs = ex[0] + (np.arange(nx) + 0.5) * (ex[1] - ex[0]) / nx
    ys = ny_[1] - (np.arange(ny) + 0.5) * (ny_[1] - ny_[0]) / ny
    return xs, ys


def _exact_fn(epsg, w=512.0, h=512.0, lon0=2.0, lat0=44.0, lon1=8.0, lat1=49.0):
    def fn(x, y):
        lo, la = S.transform_np(x, y, epsg, 4326)
        return (lo - lon0) / (lon1 - lon0) * w, (lat1 - la) / (lat1 - lat0) * h

    return fn


def test_error_bound_lcc():
    """Lambert-93 (nonlinear in both axes): every grid point within
    2x the midpoint bound of the exact transform at 0.125 px."""
    xs, ys = _grid(2154)
    fn = _exact_fn(2154)
    U, V, n_exact = approx_transform_grid(fn, xs, ys, 0.125)
    gx, gy = np.meshgrid(xs, ys)
    eu, ev = fn(gx.ravel(), gy.ravel())
    du = np.abs(U.ravel() - eu).max()
    dv = np.abs(V.ravel() - ev).max()
    assert max(du, dv) <= 0.25
    assert not np.isnan(U).any()


def test_savings_mercator():
    """Web-mercator target: sx is exactly linear in x, so scanlines
    collapse to endpoints+one midpoint — big exact-call savings."""
    xs, ys = _grid(3857, nx=256, ny=64)
    fn = _exact_fn(3857)
    U, V, n_exact = approx_transform_grid(fn, xs, ys, 0.125)
    assert n_exact < 0.25 * (256 * 64)
    gx, gy = np.meshgrid(xs, ys)
    eu, ev = fn(gx.ravel(), gy.ravel())
    assert np.abs(U.ravel() - eu).max() <= 0.25
    assert np.abs(V.ravel() - ev).max() <= 0.25


def test_tiny_tolerance_is_exact():
    """max_err -> 0 forces full subdivision: every point evaluated
    exactly, bit-identical to the direct path."""
    xs, ys = _grid(2154, nx=33, ny=9)
    fn = _exact_fn(2154)
    U, V, n_exact = approx_transform_grid(fn, xs, ys, 0.0)
    gx, gy = np.meshgrid(xs, ys)
    eu, ev = fn(gx.ravel(), gy.ravel())
    assert np.array_equal(U.ravel(), eu)
    assert np.array_equal(V.ravel(), ev)
    assert n_exact == 33 * 9  # every grid point evaluated exactly once


def test_warp_approx_path_matches_exact():
    # smooth source so the pixel-value error is gradient * coord error
    yy, xx = np.meshgrid(np.arange(64, dtype=float), np.arange(64, dtype=float),
                         indexing="ij")
    src = 2.0 * xx + 1.5 * yy
    ex, en = S.transform_np([2.0, 8.0], [44.0, 49.0], 4326, 2154)
    bounds = (ex[0], en[0], ex[1], en[1])
    exact, _ = warp_lonlat_to_grid(src, 2.0, 44.0, 8.0, 49.0, bounds, 2154, 96, 96, "bilinear")
    approx, _ = warp_lonlat_to_grid(
        src, 2.0, 44.0, 8.0, 49.0, bounds, 2154, 96, 96, "bilinear",
        approx_err_px=0.01,
    )
    # 0.01-px coordinate error on a gradient-(2, 1.5) source moves a
    # bilinear sample by <= ~3.5 * 0.01
    assert np.abs(approx - exact).max() < 0.1
    assert np.abs(approx - exact).mean() < 0.01
