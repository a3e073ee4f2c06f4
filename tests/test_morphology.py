"""Morphology + raster→vector kernel unit tests (proximity EDT, sieve
labeling, fill-nodata, polygonize, marching-squares contour)."""

from __future__ import annotations

import numpy as np

from gdal_spark.raster import morphology as M
from gdal_spark.raster.vectorize import contour_stats, polygonize_array


def test_edt_exact_vs_bruteforce():
    rng = np.random.default_rng(0)
    mask = rng.random((40, 50)) < 0.03
    d = M.edt(mask)
    ys, xs = np.nonzero(mask)
    pts = np.stack([ys, xs], 1)
    bf = np.full(mask.shape, np.inf)
    for i in range(mask.shape[0]):
        for j in range(mask.shape[1]):
            bf[i, j] = np.sqrt(((pts - [i, j]) ** 2).sum(1).min())
    assert np.abs(d - bf).max() == 0.0


def test_label4_and_sieve():
    vals = np.zeros((10, 10), np.uint8)
    vals[2:4, 2:4] = 1  # 4-px component
    vals[7, 7] = 2      # 1-px component
    labels, sizes = M.label4(vals)
    assert len(sizes) == 3
    assert sorted(sizes.values()) == [1, 4, 95]
    out = M.sieve_array(vals, threshold=3)
    assert out[7, 7] == 0      # small component merged into background
    assert out[2, 2] == 1      # 4-px component survives threshold 3
    # diagonal touch is NOT 4-connected
    diag = np.zeros((4, 4), np.uint8)
    diag[0, 0] = diag[1, 1] = 1
    _, s2 = M.label4(diag)
    assert sorted(s2.values()) == [1, 1, 14]


def test_fill_nodata():
    band = np.full((8, 8), 100, np.uint8)
    band[3:5, 3:5] = 0
    f = M.fill_nodata_array(band, 0)
    assert (f[3:5, 3:5] == 100).all()
    assert (f == 100).all()
    # gradient fill interpolates between sides
    g = np.tile(np.arange(0, 160, 20, dtype=np.uint8)[None, :], (4, 1))
    g2 = g.copy()
    g2[:, 3] = 0  # knock out the 60-column; neighbors 40 / 80
    out = M.fill_nodata_array(g2, 0)
    assert (out[:, 3] >= 40).all() and (out[:, 3] <= 80).all()


def test_polygonize_array():
    vals = np.zeros((6, 8), np.uint8)
    vals[1:3, 1:5] = 7
    regions = polygonize_array(vals, min_px=1)
    by_val = {v: (n, x0, y0, x1, y1) for v, n, x0, y0, x1, y1 in regions}
    assert by_val[7] == (8, 1, 1, 4, 2)
    assert by_val[0][0] == 48 - 8


def test_contour_stats():
    # vertical gradient: a single horizontal contour line per level
    z = np.tile(np.linspace(0, 255, 32)[:, None], (1, 16)).astype(np.uint8)
    out = contour_stats(z, [64.0, 128.0])
    for level, n, ln in out:
        assert n == 15  # one crossing per cell column
        assert abs(ln - 15.0) < 1e-9  # horizontal segments of length 1
    # flat raster: no contours
    flat = np.full((8, 8), 50, np.uint8)
    assert contour_stats(flat, [64.0]) == [(64.0, 0, 0.0)]


def test_viewshed_kernel():
    from gdal_spark.raster.viewshed import viewshed_mask

    flat = np.full((32, 32), 100.0)
    assert viewshed_mask(flat, 16, 16, 10).all()
    wall = flat.copy()
    wall[:, 20] = 400.0
    m = viewshed_mask(wall, 16, 16, 10)
    assert m[16, 18] and m[16, 20]     # before + wall top visible
    assert not m[16, 25]               # behind the wall hidden
    assert not m[5, 30]                # diagonal behind the wall hidden
    # valley is hidden from a ridge-side observer
    ridge = np.full((16, 16), 0.0)
    ridge[:, 8] = 50.0
    m2 = viewshed_mask(ridge, 2, 8, 1.0)
    assert not m2[8, 12]


def brute_force_los(dem, ox, oy, obs_height=10.0, oversample=4):
    """Independent per-cell scalar LOS oracle: densely sample each ray,
    bilinear terrain, blocked iff any interior sample rises above the
    sight line. O(n^3) — test-only."""
    dem = dem.astype(np.float64)
    h, w = dem.shape
    oz = dem[oy, ox] + obs_height
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        for x in range(w):
            if (x, y) == (ox, oy):
                out[y, x] = True
                continue
            dist = np.hypot(x - ox, y - oy)
            n = max(2, int(np.ceil(dist)) * oversample)
            vis = True
            for k in range(1, n):
                t = k / n
                sx = ox + (x - ox) * t
                sy = oy + (y - oy) * t
                x0, y0 = int(np.floor(sx)), int(np.floor(sy))
                x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
                fx, fy = sx - x0, sy - y0
                tv = (dem[y0, x0] * (1 - fx) * (1 - fy) + dem[y0, x1] * fx * (1 - fy)
                      + dem[y1, x0] * (1 - fx) * fy + dem[y1, x1] * fx * fy)
                if tv > oz + (dem[y, x] - oz) * t:
                    vis = False
                    break
            out[y, x] = vis
    return out


def test_viewshed_wang_exact_on_crafted_dems():
    """Crafted DEMs where the Wang propagation is interpolation-exact:
    flat (all visible), full-column wall (everything beyond blocked),
    Chebyshev cone from the peak (all visible). Brute-force per-cell
    LOS must agree cell-for-cell."""
    from gdal_spark.raster.viewshed import viewshed_mask_wang

    flat = np.zeros((17, 17))
    assert viewshed_mask_wang(flat, 8, 8, 10.0).all()

    wall = np.zeros((17, 17))
    wall[:, 11] = 200.0
    got = viewshed_mask_wang(wall, 8, 8, 10.0)
    exp = brute_force_los(wall, 8, 8, 10.0)
    assert np.array_equal(got, exp)
    assert not got[:, 12:].any() and got[:, :12].all()

    yy, xx = np.mgrid[0:17, 0:17]
    cone = np.maximum(0.0, 100.0 - 10.0 * np.maximum(np.abs(xx - 8), np.abs(yy - 8)))
    assert viewshed_mask_wang(cone, 8, 8, 10.0).all()


def test_viewshed_wang_vs_bruteforce_random_dem():
    """On a smooth random DEM the Wang interpolation is an approx of
    the exact ray test — require >= 97% cell agreement (the reference
    algorithm has the same interpolation-order deviation)."""
    from gdal_spark.raster.viewshed import viewshed_mask_wang

    rng = np.random.default_rng(11)
    base = rng.uniform(0, 60, (7, 7))
    # bilinear-upsample to 28x28 for smoothness
    from gdal_spark.raster.resample import resize_kernel

    dem = resize_kernel(base, 28, 28, "bilinear")
    got = viewshed_mask_wang(dem, 14, 14, 8.0)
    exp = brute_force_los(dem, 14, 14, 8.0)
    agree = (got == exp).mean()
    assert agree >= 0.97, agree
