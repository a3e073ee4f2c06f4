"""Warp kernel: reproject a lon/lat-gridded source into a mercator
tile grid, pure NumPy.

The Spark re-expression of ``GDALWarpOperation`` (SURVEY.md §3.3):
the reference chunks the output and runs a transformer chain
(dst pixel → dst SRS → PROJ → src SRS → src pixel,
``alg/gdaltransformer.cpp:3087``) per chunk; here the "chunk" is one
tile inside an Arrow batch, and the transformer chain is the inverse
spherical-mercator formula (exact, no approximation needed — it is a
closed form, cheaper than GDAL's ApproxTransformer).
"""

from __future__ import annotations

import math

import numpy as np

ORIGIN_SHIFT = 2 * math.pi * 6378137 / 2.0
INITIAL_RESOLUTION = 2 * math.pi * 6378137 / 256.0


def merc_to_lat(my: np.ndarray) -> np.ndarray:
    """EPSG:3857 y → WGS84 lat (gdal2tiles.py:433-441, vectorized)."""
    lat = (my / ORIGIN_SHIFT) * 180.0
    return 180.0 / math.pi * (2.0 * np.arctan(np.exp(lat * math.pi / 180.0)) - math.pi / 2.0)


def merc_to_lon(mx: np.ndarray) -> np.ndarray:
    return (mx / ORIGIN_SHIFT) * 180.0


def _sample_nearest(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, nodata=0):
    h, w = src.shape[:2]
    xi = np.floor(sx).astype(np.int64)
    yi = np.floor(sy).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    xi = np.clip(xi, 0, w - 1)
    yi = np.clip(yi, 0, h - 1)
    out = src[yi, xi]
    out[~valid] = nodata
    return out, valid


def _sample_bilinear(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, nodata=0):
    h, w = src.shape[:2]
    fx = sx - 0.5
    fy = sy - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    valid = (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    y0c = np.clip(y0, 0, h - 1)
    y1c = np.clip(y0 + 1, 0, h - 1)
    a = src[y0c, x0c].astype(np.float64)
    b = src[y0c, x1c].astype(np.float64)
    c = src[y1c, x0c].astype(np.float64)
    d = src[y1c, x1c].astype(np.float64)
    if src.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    top = a * (1 - tx) + b * tx
    bot = c * (1 - tx) + d * tx
    out = top * (1 - ty) + bot * ty
    if src.dtype.kind in "ui":
        out = np.clip(np.floor(out + 0.5), 0, 255)
    out = out.astype(src.dtype)
    out[~valid] = nodata
    return out, valid


def _kernel_sample(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, taps: int, weight_fn, nodata=0):
    """Separable kernel sampling at arbitrary positions (the GWK
    resampler shape, ``alg/gdalwarpkernel.cpp:170-197``): ``taps``
    source pixels per axis, weights from ``weight_fn(offset)``,
    normalized so partial windows at the borders stay unbiased."""
    h, w = src.shape[:2]
    fx = sx - 0.5
    fy = sy - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    tx = fx - x0
    ty = fy - y0
    valid = (fx >= -0.5) & (fx <= w - 0.5) & (fy >= -0.5) & (fy <= h - 0.5)
    half = taps // 2
    acc = None
    wsum = None
    for j in range(-half + 1, half + 1):
        wy = weight_fn(j - ty)
        yi = np.clip(y0 + j, 0, h - 1)
        row_acc = None
        row_w = None
        for i in range(-half + 1, half + 1):
            wx = weight_fn(i - tx)
            xi = np.clip(x0 + i, 0, w - 1)
            v = src[yi, xi].astype(np.float64)
            wgt = wx * wy
            if src.ndim == 3:
                wgt_b = wgt[..., None]
            else:
                wgt_b = wgt
            row_acc = v * wgt_b if row_acc is None else row_acc + v * wgt_b
            row_w = wgt if row_w is None else row_w + wgt
        acc = row_acc if acc is None else acc + row_acc
        wsum = row_w if wsum is None else wsum + row_w
    if src.ndim == 3:
        wsum = wsum[..., None]
    with np.errstate(divide="ignore", invalid="ignore"):
        out = acc / wsum
    if src.dtype.kind in "ui":
        out = np.clip(np.floor(out + 0.5), 0, 255)
    out = out.astype(src.dtype)
    out[~valid] = nodata
    return out, valid


def _cubic_weight(d: np.ndarray) -> np.ndarray:
    """Catmull–Rom (a=-0.5), GDAL's GRA_Cubic kernel."""
    ad = np.abs(d)
    a = -0.5
    w = np.where(
        ad <= 1.0,
        (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0,
        np.where(ad < 2.0, a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a, 0.0),
    )
    return w


def _lanczos_weight(d: np.ndarray, a: int = 3) -> np.ndarray:
    ad = np.abs(d)
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(
            ad < 1e-12,
            1.0,
            np.where(
                ad < a,
                a * np.sin(np.pi * d) * np.sin(np.pi * d / a) / (np.pi**2 * d**2),
                0.0,
            ),
        )
    return w


def _sample_cubic(src, sx, sy, nodata=0):
    return _kernel_sample(src, sx, sy, 4, _cubic_weight, nodata)


def _sample_lanczos(src, sx, sy, nodata=0):
    return _kernel_sample(src, sx, sy, 6, _lanczos_weight, nodata)


def sample_at(src: np.ndarray, sx: np.ndarray, sy: np.ndarray, resampling: str, nodata=0):
    """Dispatch over the warp resampler names (alg/gdalwarper.h:34-68
    subset: near / bilinear / cubic / lanczos)."""
    if resampling in ("near", "nearest"):
        return _sample_nearest(src, sx, sy, nodata)
    if resampling == "bilinear":
        return _sample_bilinear(src, sx, sy, nodata)
    if resampling == "cubic":
        return _sample_cubic(src, sx, sy, nodata)
    if resampling == "lanczos":
        return _sample_lanczos(src, sx, sy, nodata)
    raise ValueError(f"unknown warp resampling {resampling!r}")


def approx_transform_grid(exact_fn, xs: np.ndarray, ys: np.ndarray,
                          max_err: float):
    """Error-bounded approximation of a point transform over a regular
    grid — ``GDALCreateApproxTransformer`` (``alg/gdaltransformer.cpp:58``)
    re-expressed level-synchronously: GDAL transforms a scanline's
    endpoints + midpoint exactly, accepts linear interpolation for the
    span when the midpoint deviates by less than ``dfMaxError`` (warp
    default 0.125 source pixels), else splits and recurses. Here every
    scanline runs that recursion in lock-step, so each refinement
    level is ONE vectorized ``exact_fn`` call over all still-active
    midpoints — the transcendental projection math runs on O(rows ×
    log cols) points instead of rows × cols for smooth projections.

    ``exact_fn(x, y) -> (u, v)`` vectorized; returns (U, V) with
    shape (len(ys), len(xs)) and the number of exact evaluations
    spent (the savings evidence)."""
    nx, ny = len(xs), len(ys)
    U = np.full((ny, nx), np.nan)
    V = np.full((ny, nx), np.nan)
    gy = np.repeat(ys, 2)
    gx = np.tile(np.array([xs[0], xs[-1]]), ny)
    u, v = exact_fn(gx, gy)
    n_exact = gx.size
    U[:, 0], U[:, -1] = u[0::2], u[1::2]
    V[:, 0], V[:, -1] = v[0::2], v[1::2]
    # active segments: (row, i0, i1) with exact values known at ends
    rows = np.arange(ny, dtype=np.int64)
    seg_r = rows
    seg_i0 = np.zeros(ny, dtype=np.int64)
    seg_i1 = np.full(ny, nx - 1, dtype=np.int64)
    while seg_r.size:
        gap = seg_i1 - seg_i0
        live = gap > 1
        seg_r, seg_i0, seg_i1 = seg_r[live], seg_i0[live], seg_i1[live]
        if not seg_r.size:
            break
        mid = (seg_i0 + seg_i1) // 2
        mu, mv = exact_fn(xs[mid], ys[seg_r])
        n_exact += mid.size
        u0, v0 = U[seg_r, seg_i0], V[seg_r, seg_i0]
        u1, v1 = U[seg_r, seg_i1], V[seg_r, seg_i1]
        t = (xs[mid] - xs[seg_i0]) / (xs[seg_i1] - xs[seg_i0])
        iu = u0 + t * (u1 - u0)
        iv = v0 + t * (v1 - v0)
        ok = np.maximum(np.abs(iu - mu), np.abs(iv - mv)) <= max_err
        # accepted: linear-fill the whole span now
        for r, i0, i1 in zip(seg_r[ok], seg_i0[ok], seg_i1[ok]):
            tt = (xs[i0 + 1 : i1] - xs[i0]) / (xs[i1] - xs[i0])
            U[r, i0 + 1 : i1] = U[r, i0] + tt * (U[r, i1] - U[r, i0])
            V[r, i0 + 1 : i1] = V[r, i0] + tt * (V[r, i1] - V[r, i0])
        # rejected: record exact midpoint, split in two
        bad = ~ok
        U[seg_r[bad], mid[bad]] = mu[bad]
        V[seg_r[bad], mid[bad]] = mv[bad]
        seg_r = np.concatenate([seg_r[bad], seg_r[bad]])
        seg_i0 = np.concatenate([seg_i0[bad], mid[bad]])
        seg_i1 = np.concatenate([mid[bad], seg_i1[bad]])
    return U, V, n_exact


def suggested_warp_output(exact_fn, src_w: int, src_h: int,
                          n_edge: int = 21):
    """``GDALSuggestedWarpOutput2`` (``alg/gdaltransformer.cpp:342``):
    size the destination grid by forward-transforming a ring of
    source-edge sample points (the reference walks 21 points per edge)
    plus the center, taking the envelope, and choosing a square pixel
    size that preserves the source diagonal's resolution.

    ``exact_fn(px, py) -> (X, Y)`` maps source pixel coords to the
    destination SRS, vectorized. Returns (bounds (x0, y0, x1, y1),
    out_w, out_h)."""
    t = np.linspace(0.0, 1.0, n_edge)
    px = np.concatenate([t * src_w, t * src_w,
                         np.zeros(n_edge), np.full(n_edge, float(src_w)),
                         [src_w / 2.0]])
    py = np.concatenate([np.zeros(n_edge), np.full(n_edge, float(src_h)),
                         t * src_h, t * src_h, [src_h / 2.0]])
    X, Y = exact_fn(px, py)
    if not (np.isfinite(X).all() and np.isfinite(Y).all()):
        raise ValueError("edge sample failed to transform")
    x0, x1 = float(X.min()), float(X.max())
    y0, y1 = float(Y.min()), float(Y.max())
    # pixel size preserving the source diagonal's ground resolution,
    # matching the reference's dfPixelSize = dist / diagonal heuristic
    diag_dst = float(np.hypot(x1 - x0, y1 - y0))
    diag_src = float(np.hypot(src_w, src_h))
    pixel = diag_dst / diag_src
    out_w = max(1, int(round((x1 - x0) / pixel)))
    out_h = max(1, int(round((y1 - y0) / pixel)))
    return (x0, y0, x1, y1), out_w, out_h


def warp_lonlat_to_grid(
    src: np.ndarray,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    dst_bounds: tuple[float, float, float, float],
    dst_epsg: int,
    out_w: int,
    out_h: int,
    resampling: str = "near",
    approx_err_px: float | None = None,
):
    """General gdalwarp target-grid path: render a lon/lat-gridded
    source into a regular grid of ANY supported destination SRS
    (``functions/srs.py``: 4326 / 3857 / UTM).

    The transformer chain of ``GDALGenImgProjTransform``
    (``alg/gdaltransformer.cpp:3087``) — dst pixel → dst SRS → src SRS
    → src pixel — evaluated exactly on every target pixel center by
    default. ``approx_err_px`` enables the ApproxTransformer path
    (gdalwarp's default is 0.125 source pixels): error-bounded
    scanline subdivision via :func:`approx_transform_grid`, cutting
    the transcendental projection evaluations by ~8-30× for smooth
    projections. Returns (out HxW[xC], valid HxW bool)."""
    from gdal_spark.functions import srs as _srs

    x0, y0, x1, y1 = dst_bounds
    xs = x0 + (np.arange(out_w) + 0.5) * (x1 - x0) / out_w
    ys = y1 - (np.arange(out_h) + 0.5) * (y1 - y0) / out_h
    h, w = src.shape[:2]
    if approx_err_px is not None:

        def exact_fn(x, y):
            lo, la = _srs.transform_np(x, y, dst_epsg, 4326)
            return (
                (lo - lon_min) / (lon_max - lon_min) * w,
                (lat_max - la) / (lat_max - lat_min) * h,
            )

        sx, sy, _ = approx_transform_grid(exact_fn, xs, ys, approx_err_px)
        return sample_at(src, sx, sy, resampling)
    gx, gy = np.meshgrid(xs, ys)
    lon, lat = _srs.transform_np(gx.ravel(), gy.ravel(), dst_epsg, 4326)
    lon = lon.reshape(out_h, out_w)
    lat = lat.reshape(out_h, out_w)
    sx = (lon - lon_min) / (lon_max - lon_min) * w
    sy = (lat_max - lat) / (lat_max - lat_min) * h
    return sample_at(src, sx, sy, resampling)


def warp_lonlat_to_merc_tile(
    src: np.ndarray,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    tile_bounds: tuple[float, float, float, float],
    tile_size: int = 256,
    resampling: str = "near",
):
    """Render one mercator tile window from a lon/lat-gridded source.

    Returns (tile HxWxC, alpha HxW bool). Pixels outside the source
    footprint get alpha 0 (the reference's alpha-band transparency,
    gdal2tiles.py:1171).
    """
    minx, miny, maxx, maxy = tile_bounds
    res = (maxx - minx) / tile_size
    mx = minx + (np.arange(tile_size) + 0.5) * res
    my = maxy - (np.arange(tile_size) + 0.5) * res
    lon1d = merc_to_lon(mx)
    lat1d = merc_to_lat(my)
    h, w = src.shape[:2]

    # geo_query windowing (gdal2tiles.py:2968): restrict sampling to
    # the tile sub-window the footprint can touch — a 0.01° footprint
    # covers ~30² px of a z12 tile, so sampling all 256² wastes ~50×
    cols = np.nonzero((lon1d >= lon_min) & (lon1d <= lon_max))[0]
    rows = np.nonzero((lat1d >= lat_min) & (lat1d <= lat_max))[0]
    shape = (tile_size, tile_size) if src.ndim == 2 else (tile_size, tile_size, src.shape[2])
    out = np.zeros(shape, dtype=src.dtype)
    valid = np.zeros((tile_size, tile_size), dtype=bool)
    if len(cols) == 0 or len(rows) == 0:
        return out, valid
    c0, c1 = cols[0], cols[-1] + 1
    r0, r1 = rows[0], rows[-1] + 1
    lon = lon1d[c0:c1][None, :]
    lat = lat1d[r0:r1][:, None]
    sx = (lon - lon_min) / (lon_max - lon_min) * w
    sy = (lat_max - lat) / (lat_max - lat_min) * h
    sub = (r1 - r0, c1 - c0)
    sx = np.broadcast_to(sx, sub).copy()
    sy = np.broadcast_to(sy, sub).copy()
    if resampling not in ("near", "nearest", "bilinear", "cubic", "lanczos"):
        resampling = "bilinear"  # legacy: any other name fell back here
    o, v = sample_at(src, sx, sy, resampling)
    out[r0:r1, c0:c1] = o
    valid[r0:r1, c0:c1] = v
    return out, valid
