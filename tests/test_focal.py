"""Focal (neighbors), clean-collar and footprint kernels.

Independent scalar re-derivations (the make_golden honesty rule:
golden parquet pins distribution-determinism only, these loops pin the
kernel semantics): the neighbors naive loop follows
``frmts/vrt/vrtfilters.cpp:485-700`` verbatim, the collar oracle is a
literal queue BFS, and the footprint case is closed-form.
"""

import numpy as np
import pytest

from gdal_spark.raster.collar import (
    BLACK,
    WHITE,
    border_connected,
    clean_collar_array,
    footprint_digest,
    near_color_mask,
)
from gdal_spark.raster.focal import KERNELS, METHODS, default_method, neighbors_array


def naive_neighbors(band, kernel, method):
    """Per-pixel transliteration of VRTKernelFilteredSource::FilterData
    (vrtfilters.cpp:541-700): edge-replicate pad, val*coef before the
    stat, zero coefs skipped, mean normalized by the coef sum, stddev
    population, median averaging middles, mode first-to-reach-max."""
    k = kernel.shape[0]
    pad = k // 2
    p = np.pad(band.astype(np.float64), pad, mode="edge")
    h, w = band.shape
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            vals = []
            for di in range(-pad, pad + 1):
                for dj in range(-pad, pad + 1):
                    c = kernel[di + pad, dj + pad]
                    if c == 0.0:
                        continue
                    vals.append(p[i + pad + di, j + pad + dj] * c)
            if method == "sum":
                out[i, j] = sum(vals)
            elif method == "mean":
                ks = kernel.sum()
                out[i, j] = 0.0 if ks == 0 else sum(vals) / ks
            elif method == "min":
                out[i, j] = min(vals)
            elif method == "max":
                out[i, j] = max(vals)
            elif method == "stddev":
                m = sum(vals) / len(vals)
                out[i, j] = (sum((x - m) ** 2 for x in vals) / len(vals)) ** 0.5
            elif method == "median":
                s = sorted(vals)
                n = len(s)
                out[i, j] = s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2
            elif method == "mode":
                counts, best, mc = {}, None, 0
                for x in vals:
                    counts[x] = counts.get(x, 0) + 1
                    if counts[x] > mc:
                        mc, best = counts[x], x
                out[i, j] = best
    return out


@pytest.mark.parametrize("kname", sorted(KERNELS))
def test_neighbors_matches_naive_loop(kname):
    rng = np.random.default_rng(11)
    band = rng.integers(0, 256, (13, 17)).astype(np.uint8)
    for method in METHODS:
        got = neighbors_array(band, KERNELS[kname], method)
        want = naive_neighbors(band, KERNELS[kname], method)
        assert np.allclose(got, want, atol=1e-9), (kname, method)


def test_default_method_rule():
    # gdalalg_raster_neighbors.cpp:453-461: zero-sum kernel → sum
    assert default_method(KERNELS["edge1"]) == "sum"
    assert default_method(KERNELS["u"]) == "sum"
    assert default_method(KERNELS["gaussian-3x3"]) == "mean"
    assert default_method(KERNELS["equal"]) == "mean"


def test_mode_tie_break_first_to_reach_max():
    # window {10,10,20,20,...}: 10 reaches count 2 first in scan order
    band = np.array([[10, 20], [20, 10]], dtype=np.uint8)
    out = neighbors_array(band, KERNELS["equal"], "mode")
    # every 3x3 edge-replicated window here is dominated by the corner
    # replication; check against the naive loop rather than by hand
    want = naive_neighbors(band, KERNELS["equal"], "mode")
    assert np.array_equal(out, want)


def test_border_connected_equals_bfs():
    from collections import deque

    rng = np.random.default_rng(5)
    for _ in range(10):
        mask = rng.random((14, 16)) < 0.45
        H, W = mask.shape
        seen = np.zeros_like(mask)
        dq = deque()
        for i in range(H):
            for j in range(W):
                if (i in (0, H - 1) or j in (0, W - 1)) and mask[i, j]:
                    seen[i, j] = True
                    dq.append((i, j))
        while dq:
            i, j = dq.popleft()
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < H and 0 <= jj < W and mask[ii, jj] and not seen[ii, jj]:
                    seen[ii, jj] = True
                    dq.append((ii, jj))
        assert (border_connected(mask) == seen).all()


def test_clean_collar_semantics():
    a = np.full((12, 14, 3), 120, dtype=np.uint8)
    a[:2, :, :] = 3  # top near-black collar
    a[6:8, 6:8, :] = 5  # interior dark lake — must survive floodfill
    a[-1, -4:, :] = 250  # near-white collar corner
    m = near_color_mask(a, (BLACK, WHITE), 15)
    assert m[:2].all() and m[6:8, 6:8].all() and m[-1, -4:].all()
    cleaned, alpha = clean_collar_array(a, (BLACK, WHITE), 15)
    assert (cleaned[:2] == 0).all() and (cleaned[-1, -4:] == 0).all()
    assert (cleaned[6:8, 6:8] == 5).all()  # nearblack_lib floodfill keeps lakes
    assert alpha[0, 0] == 0 and alpha[6, 6] == 255
    # single white color replaces with 255 (nearblack_lib.cpp:552-556)
    w = np.full((6, 6, 3), 200, dtype=np.uint8)
    w[:, :2, :] = 252
    cw, _ = clean_collar_array(w, (WHITE,), 15)
    assert (cw[:, :2] == 255).all() and (cw[:, 2:] == 200).all()


def test_near_color_mask_threshold_boundary():
    # |color - pix| > dist is NON-matching (nearblack_lib.cpp:588-598):
    # pix == threshold matches, threshold+1 does not
    a = np.array([[[15, 15, 15], [16, 15, 15]]], dtype=np.uint8)
    m = near_color_mask(a, (BLACK,), 15)
    assert m[0, 0] and not m[0, 1]


def test_footprint_digest_closed_form():
    # 8x10 raster: valid everywhere except a 3-wide nodata right collar
    # and one 1-px valid island inside it (dropped by min_ring_area=4)
    arr = np.full((8, 10, 3), 50, dtype=np.uint8)
    arr[:, 7:, :] = 0
    arr[2, 8, 0] = 9  # island, 1 px < min_ring_area
    n_rings, valid_px, area, hull = footprint_digest(arr, 2.0, 3.0, 0, 4)
    assert n_rings == 1
    assert valid_px == 8 * 7
    assert area == pytest.approx(8 * 7 * 6.0)
    # main ring is a rect ⇒ hull == its exact corner box 14m x 24m
    assert hull == pytest.approx(14.0 * 24.0)
    # with min_ring_area=1 the island is a second ring; the hull grows
    n_rings2, valid_px2, _, hull2 = footprint_digest(arr, 2.0, 3.0, 0, 1)
    assert n_rings2 == 2 and valid_px2 == 8 * 7 + 1 and hull2 > hull


def test_neighbors_spark_matches_golden(spark, sf_dir):
    import duckdb

    from gdal_spark.sources import synth
    from gdal_spark.raster.focal import neighbors

    imgs = synth.images(spark, sf_dir, where="okey % 200 = 0")
    got = {
        (r.image_id, r.kernel, r.method): r.checksum
        for r in neighbors(imgs).collect()
    }
    want = {
        (i, k, m): c
        for i, k, m, c in duckdb.sql(
            "SELECT image_id, kernel, method, checksum "
            "FROM 'golden/sf0.001/raster_neighbors.parquet'"
        ).fetchall()
    }
    assert got == want


def test_nodata_to_alpha_vs_clean_collar_distinction():
    """nodata-to-alpha marks ALL nodata pixels; clean-collar only the
    border-connected ones — an interior 0-lake separates them."""
    import numpy as np

    from gdal_spark.raster.collar import border_connected

    a = np.full((10, 10, 3), 80, dtype=np.uint8)
    a[:, :2, :] = 0  # border collar
    a[5:7, 5:7, :] = 0  # interior lake
    transparent = (a == 0).all(axis=2)
    assert transparent.sum() == 2 * 10 + 4  # nodata-to-alpha count
    collar = border_connected(transparent)
    assert collar.sum() == 2 * 10  # clean-collar excludes the lake
