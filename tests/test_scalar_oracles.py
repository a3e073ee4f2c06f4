"""Independent scalar-loop oracles for the self-referential kernels.

Round-2 verdict item 9: golden parquet pins distribution invariance
only — these tests pin KERNEL SEMANTICS with per-pixel Python loop
re-derivations written independently of the NumPy array programs
(the same method the checksum/EDT/TIN kernels already have).
"""

import numpy as np

from gdal_spark.raster.palette import map_nearest, median_cut
from gdal_spark.raster.pipeline import pansharpen_array


def synth(h=8, w=12, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_pansharpen_vs_per_pixel_loop():
    arr = synth()
    got = pansharpen_array(arr, factor=2)
    h, w = arr.shape[:2]
    exp = np.zeros_like(arr)
    for y in range(h):
        for x in range(w):
            # pan = channel mean at full res
            pan = (float(arr[y, x, 0]) + float(arr[y, x, 1]) + float(arr[y, x, 2])) / 3.0
            by, bx = (y // 2) * 2, (x // 2) * 2
            # MS = 2×2 block average rounded half-up to int (GDAL
            # overview-average semantics for integer rasters,
            # gcore/overview.cpp), nearest-upsampled
            ms = [
                float(int(np.floor((
                    float(arr[by, bx, c]) + float(arr[by, bx + 1, c])
                    + float(arr[by + 1, bx, c]) + float(arr[by + 1, bx + 1, c])
                ) / 4.0 + 0.5)))
                for c in range(3)
            ]
            denom = (ms[0] + ms[1] + ms[2]) / 3.0
            ratio = pan / denom if denom > 0 else 0.0
            for c in range(3):
                exp[y, x, c] = min(255, max(0, int(np.floor(ms[c] * ratio + 0.5))))
    assert np.array_equal(got, exp)


def naive_median_cut(arr, n_colors):
    """List-based median cut re-derivation: most-populous splittable
    box first, widest channel (lowest index on ties), stable median
    split, mean palette, palette sorted by packed RGB key."""
    boxes = [[tuple(int(v) for v in p) for p in arr.reshape(-1, 3)]]
    while len(boxes) < n_colors:
        order = sorted(range(len(boxes)), key=lambda i: -len(boxes[i]))
        for bi in order:
            b = boxes[bi]
            spans = [max(p[c] for p in b) - min(p[c] for p in b) for c in range(3)]
            if max(spans) == 0 or len(b) < 2:
                continue
            ch = spans.index(max(spans))
            idx = sorted(range(len(b)), key=lambda i: b[i][ch])  # stable
            half = len(b) // 2
            boxes[bi : bi + 1] = [[b[i] for i in idx[:half]], [b[i] for i in idx[half:]]]
            break
        else:
            break
    pal = []
    for b in boxes:
        pal.append(
            tuple(
                min(255, max(0, int(np.floor(sum(p[c] for p in b) / len(b) + 0.5))))
                for c in range(3)
            )
        )
    pal.sort(key=lambda p: p[0] * 65536 + p[1] * 256 + p[2])
    return np.array(pal, dtype=np.uint8)


def test_median_cut_vs_naive():
    arr = synth(6, 6, seed=9)
    got = median_cut(arr, n_colors=8)
    exp = naive_median_cut(arr, 8)
    assert np.array_equal(got, exp)


def test_map_nearest_vs_loop():
    arr = synth(5, 7, seed=2)
    pal = median_cut(arr, 8)
    got = map_nearest(arr, pal)
    for y in range(5):
        for x in range(7):
            best, bd = 0, 10 ** 9
            for i, p in enumerate(pal.astype(int)):
                d = sum((int(arr[y, x, c]) - p[c]) ** 2 for c in range(3))
                if d < bd:
                    best, bd = i, d
            assert got[y, x] == best


def test_blend_vs_loop():
    """blend_arrays (the blend_pair group kernel): first member weight
    alpha, others split 1-alpha; half-up rounding — re-derived per
    pixel with scalar arithmetic."""
    from gdal_spark.raster.composite import blend_arrays

    a = synth(6, 6, seed=3)[:, :, 0]
    b = synth(6, 6, seed=4)[:, :, 0]
    c = synth(6, 6, seed=5)[:, :, 0]
    got = blend_arrays([a, b, c], alpha=0.5)
    for y in range(6):
        for x in range(6):
            v = float(a[y, x]) * 0.5 + float(b[y, x]) * 0.25 + float(c[y, x]) * 0.25
            assert got[y, x] == min(255, max(0, int(np.floor(v + 0.5))))


def test_hillshade_variants_scalar_oracle():
    """Per-pixel scalar re-derivation of gdaldem -combined /
    -multidirectional / -igor, transcribed independently from
    apps/gdaldem_lib.cpp (double precision), vs the vectorized kernels."""
    import math

    import numpy as np

    from gdal_spark.raster.dem import (
        hillshade_combined,
        hillshade_igor,
        hillshade_multidirectional,
    )

    rng = np.random.default_rng(99)
    z = (rng.random((12, 14)) * 80).astype(np.float64)
    xres, yres, zf_user, az_deg, alt_deg = 2.0, 3.0, 1.5, 315.0, 45.0
    zf = zf_user / 8.0
    az, alt = math.radians(az_deg), math.radians(alt_deg)

    comb = hillshade_combined(z, az_deg, alt_deg, xres, yres, zf_user)
    md = hillshade_multidirectional(z, alt_deg, xres, yres, zf_user)
    igor = hillshade_igor(z, az_deg, xres, yres, zf_user)

    for rr in range(1, 11):
        for cc in range(1, 13):
            win = [z[rr - 1, cc - 1], z[rr - 1, cc], z[rr - 1, cc + 1],
                   z[rr, cc - 1], z[rr, cc], z[rr, cc + 1],
                   z[rr + 1, cc - 1], z[rr + 1, cc], z[rr + 1, cc + 1]]
            x = ((win[0] + 2 * win[3] + win[6]) - (win[2] + 2 * win[5] + win[8])) / xres
            y = ((win[6] + 2 * win[7] + win[8]) - (win[0] + 2 * win[1] + win[2])) / (-yres)
            xx_plus_yy = x * x + y * y
            slope = xx_plus_yy * zf * zf

            # combined (gdaldem_lib.cpp:1151)
            num = math.sin(alt) - (y * math.cos(az) * math.cos(alt) * zf
                                   - x * math.sin(az) * math.cos(alt) * zf)
            cang = math.acos(max(-1.0, min(1.0, num / math.sqrt(1.0 + slope))))
            cang = 1.0 - cang * math.atan(math.sqrt(slope)) / ((math.pi ** 2) / 4)
            expect = 1.0 if cang <= 0 else 1.0 + 254.0 * cang
            assert abs(comb[rr - 1, cc - 1] - expect) < 1e-9

            # multidirectional (gdaldem_lib.cpp:1255)
            if xx_plus_yy == 0.0:
                expect_md = 1.0 + 254.0 * math.sin(alt)
            else:
                s127 = 127.0 * math.sin(alt)
                c225 = 127.0 * math.cos(math.radians(225.0)) * math.cos(alt) * zf
                czm = 127.0 * math.cos(alt) * zf
                v225 = max(s127 + (x - y) * c225, 0.0)
                v270 = max(s127 - x * czm, 0.0)
                v315 = max(s127 + (x + y) * c225, 0.0)
                v360 = max(s127 - y * czm, 0.0)
                w225 = 0.5 * xx_plus_yy - x * y
                w270 = x * x
                w315 = xx_plus_yy - w225
                w360 = y * y
                expect_md = 1.0 + (
                    (w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360)
                    / xx_plus_yy
                ) / math.sqrt(1.0 + zf * zf * xx_plus_yy)
            assert abs(md[rr - 1, cc - 1] - expect_md) < 1e-9

            # igor (gdaldem_lib.cpp:947)
            slope_deg = math.degrees(math.atan(math.sqrt(xx_plus_yy) * zf))
            dx = (win[2] + 2 * win[5] + win[8]) - (win[0] + 2 * win[3] + win[6])
            dy2 = (win[6] + 2 * win[7] + win[8]) - (win[0] + 2 * win[1] + win[2])
            aspect = math.atan2(dy2, -dx)
            target = 1.5 * math.pi - az
            d = abs(aspect % (2 * math.pi) - target % (2 * math.pi))
            if d > math.pi:
                d = 2 * math.pi - d
            expect_ig = 255.0 * (1.0 - (slope_deg / 90.0) * (1.0 - d / math.pi))
            assert abs(igor[rr - 1, cc - 1] - expect_ig) < 1e-9


def test_color_relief_scalar_oracle():
    """Per-pixel re-derivation of GDALColorReliefGetRGBA
    (gdaldem_lib.cpp:1639-1806) for all three selection modes."""
    import numpy as np

    from gdal_spark.raster.composite import DEFAULT_RAMP, color_relief_array

    rv = [e[0] for e in DEFAULT_RAMP]
    rc = [e[1] for e in DEFAULT_RAMP]
    n = len(rv)

    def scalar(v, mode):
        # binary-search semantics: first i with rv[i] >= v
        i = 0
        while i < n and rv[i] < v:
            i += 1
        if i == 0:
            if mode == "exact" and rv[0] != v:
                return (0, 0, 0, 0)
            return rc[0]
        if i == n:
            if mode == "exact" and rv[n - 1] != v:
                return (0, 0, 0, 0)
            return rc[n - 1]
        if rv[i - 1] == v:
            return rc[i - 1]
        if rv[i] == v:
            return rc[i]
        if mode == "exact":
            return (0, 0, 0, 0)
        if mode == "nearest":
            return rc[i - 1] if v - rv[i - 1] < rv[i] - v else rc[i]
        ratio = (v - rv[i - 1]) / (rv[i] - rv[i - 1])
        return tuple(
            min(255, max(0, int(0.5 + a + ratio * (b - a))))
            for a, b in zip(rc[i - 1], rc[i])
        )

    rng = np.random.default_rng(5)
    band = np.concatenate(
        [rng.integers(0, 256, 300), [40, 90, 160, 220, 39, 41, 221, 0, 255, 125]]
    ).astype(np.float64).reshape(31, 10)
    for mode in ("interpolate", "nearest", "exact"):
        got = color_relief_array(band, mode=mode)
        for rr in range(band.shape[0]):
            for cc in range(band.shape[1]):
                assert tuple(got[rr, cc]) == scalar(band[rr, cc], mode), (
                    mode, band[rr, cc], tuple(got[rr, cc]), scalar(band[rr, cc], mode),
                )
