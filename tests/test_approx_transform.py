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


def test_suggested_warp_output_identity():
    """An identity transform suggests the source grid back."""
    from gdal_spark.raster.warp import suggested_warp_output

    bounds, ow, oh = suggested_warp_output(lambda x, y: (x, y), 512, 256)
    assert bounds == (0.0, 0.0, 512.0, 256.0)
    assert (ow, oh) == (512, 256)


def test_suggested_warp_output_projection():
    """Reprojected footprint: envelope covers all edge samples and the
    suggested size preserves the diagonal resolution (aspect follows
    the projected shape)."""
    from gdal_spark.raster.warp import suggested_warp_output

    def fn(px, py):
        lon = 2.0 + px / 512.0 * 6.0
        lat = 49.0 - py / 256.0 * 5.0
        return S.transform_np(lon, lat, 4326, 2154)

    (x0, y0, x1, y1), ow, oh = suggested_warp_output(fn, 512, 256)
    X, Y = fn(np.array([0.0, 512.0, 0.0, 512.0]), np.array([0.0, 0.0, 256.0, 256.0]))
    assert x0 <= X.min() and x1 >= X.max()
    assert y0 <= Y.min() and y1 >= Y.max()
    # square pixels: px size equals py size by construction
    assert abs((x1 - x0) / ow - (y1 - y0) / oh) / ((x1 - x0) / ow) < 0.01
    # diagonal preserved within a few percent
    assert abs(np.hypot(ow, oh) - np.hypot(512, 256)) / np.hypot(512, 256) < 0.05


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
