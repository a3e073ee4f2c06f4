"""Resampling kernels, pure NumPy, vectorized.

Kernel set mirrors the warp resamplers (``alg/gdalwarper.h:34-68``) and
overview resamplers (``gcore/overview.cpp:81,:1199,:1993``):

- near / bilinear / cubic (Catmull-Rom a=-0.5, GDAL's cubic) /
  cubicspline (B-spline) / lanczos (a=3) — separable 1-D kernels.
- average / min / max / med / q1 / q3 / mode / sum / rms — block
  statistics (exact for integer shrink factors, the gdal2tiles
  overview case of 2×; general factors use area-weighted average).
- gauss — binomial-kernel Gauss filter (``gcore/overview.cpp:1993``),
  kernel size picked by shrink factor, edge-renormalized.

All functions take HxW or HxWxC uint8/float arrays and return the same
rank. These run only inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np


def _as_3d(a):
    return a[:, :, None] if a.ndim == 2 else a, a.ndim == 2


def resize_nearest(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = a.shape[:2]
    rows = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(np.int64)
    cols = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(np.int64)
    return a[rows][:, cols]


def _kernel_weights(kind: str, t: np.ndarray) -> np.ndarray:
    at = np.abs(t)
    if kind == "bilinear":
        return np.clip(1.0 - at, 0.0, None)
    if kind == "cubic":  # Catmull-Rom / cubic convolution a=-0.5 (GDAL cubic)
        a = -0.5
        w = np.where(
            at <= 1,
            (a + 2) * at**3 - (a + 3) * at**2 + 1,
            np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
        )
        return w
    if kind == "cubicspline":  # cubic B-spline
        w = np.where(
            at <= 1,
            (4 + at**2 * (3 * at - 6)) / 6.0,
            np.where(at < 2, (2 - at) ** 3 / 6.0, 0.0),
        )
        return w
    if kind == "lanczos":
        aa = 3.0
        w = np.where(at < 1e-12, 1.0, np.sinc(t) * np.sinc(t / aa))
        return np.where(at < aa, w, 0.0)
    raise ValueError(f"unknown kernel {kind}")


_KERNEL_RADIUS = {"bilinear": 1, "cubic": 2, "cubicspline": 2, "lanczos": 3}


def _resize_1d(a: np.ndarray, out_n: int, axis: int, kind: str) -> np.ndarray:
    n = a.shape[axis]
    radius = _KERNEL_RADIUS[kind]
    scale = n / out_n
    # center mapping
    centers = (np.arange(out_n) + 0.5) * scale - 0.5
    if scale > 1:  # widen kernel when shrinking (anti-alias), as gdalwarp does
        radius_eff = radius * scale
    else:
        radius_eff = radius
    lo = np.floor(centers - radius_eff).astype(np.int64)
    width = int(np.ceil(2 * radius_eff)) + 2
    idx = lo[:, None] + np.arange(width)[None, :]
    t = (centers[:, None] - idx) / (scale if scale > 1 else 1.0)
    wts = _kernel_weights(kind, t)
    s = wts.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    wts = wts / s
    idx = np.clip(idx, 0, n - 1)
    moved = np.moveaxis(a, axis, 0).astype(np.float64)
    gathered = moved[idx]  # (out_n, width, ...)
    out = np.einsum("ow,ow...->o...", wts, gathered)
    return np.moveaxis(out, 0, axis)


def resize_kernel(a: np.ndarray, out_h: int, out_w: int, kind: str) -> np.ndarray:
    was_int = a.dtype.kind in "ui"
    r = _resize_1d(a.astype(np.float64), out_h, 0, kind)
    r = _resize_1d(r, out_w, 1, kind)
    if was_int:
        info = np.iinfo(a.dtype)
        r = np.clip(np.floor(r + 0.5), info.min, info.max).astype(a.dtype)
    return r


def _block_view(a: np.ndarray, fy: int, fx: int) -> np.ndarray:
    a3, _ = _as_3d(a)
    h, w, c = a3.shape
    return a3.reshape(h // fy, fy, w // fx, fx, c).transpose(0, 2, 1, 3, 4).reshape(
        h // fy, w // fx, fy * fx, c
    )


def block_reduce(a: np.ndarray, out_h: int, out_w: int, stat: str) -> np.ndarray:
    """Integer-factor block statistics (GDAL overview/average semantics:
    average rounds to nearest for integer types, gcore/overview.cpp)."""
    h, w = a.shape[:2]
    if h % out_h or w % out_w:
        raise ValueError("block_reduce requires integer shrink factors")
    fy, fx = h // out_h, w // out_w
    blocks = _block_view(a, fy, fx).astype(np.float64)
    if stat in ("average", "mean"):
        r = blocks.mean(axis=2)
        if a.dtype.kind in "ui":
            r = np.floor(r + 0.5)
    elif stat == "sum":
        r = blocks.sum(axis=2)
    elif stat == "rms":
        r = np.sqrt((blocks**2).mean(axis=2))
        if a.dtype.kind in "ui":
            r = np.floor(r + 0.5)
    elif stat == "min":
        r = blocks.min(axis=2)
    elif stat == "max":
        r = blocks.max(axis=2)
    elif stat == "med":
        r = np.median(blocks, axis=2)
    elif stat == "q1":
        r = np.quantile(blocks, 0.25, axis=2)
    elif stat == "q3":
        r = np.quantile(blocks, 0.75, axis=2)
    elif stat == "mode":
        srt = np.sort(blocks, axis=2)
        changes = np.concatenate(
            [np.ones_like(srt[:, :, :1]), np.diff(srt, axis=2) != 0], axis=2
        )
        # run-length trick: mode = value at position of longest run
        runs = np.cumsum(changes, axis=2)
        nvals = fy * fx
        best = np.zeros_like(srt[:, :, 0])
        bestc = np.zeros_like(best)
        for k in range(nvals):
            cnt = (runs == runs[:, :, k : k + 1]).sum(axis=2).astype(np.float64)
            take = cnt > bestc
            best = np.where(take, srt[:, :, k], best)
            bestc = np.where(take, cnt, bestc)
        r = best
    else:
        raise ValueError(f"unknown block stat {stat}")
    r = r.astype(a.dtype) if a.dtype.kind in "ui" else r
    return r[:, :, 0] if a.ndim == 2 else r


_GAUSS_3 = np.array([1, 2, 1, 2, 4, 2, 1, 2, 1], dtype=np.float64).reshape(3, 3)
_GAUSS_5 = np.array(
    [1, 4, 6, 4, 1, 4, 16, 24, 16, 4, 6, 24, 36, 24, 6, 4, 16, 24, 16, 4,
     1, 4, 6, 4, 1], dtype=np.float64,
).reshape(5, 5)
_GAUSS_7 = np.array(
    [1, 6, 15, 20, 15, 6, 1, 6, 36, 90, 120, 90, 36, 6, 15, 90, 225, 300,
     225, 90, 15, 20, 120, 300, 400, 300, 120, 20, 15, 90, 225, 300, 225,
     90, 15, 6, 36, 90, 120, 90, 36, 6, 1, 6, 15, 20, 15, 6, 1],
    dtype=np.float64,
).reshape(7, 7)


def _gauss_starts(out_n: int, n: int, dim: int) -> np.ndarray:
    """Per-destination-index window start, GDALResampleChunk_Gauss's
    offset arithmetic (gcore/overview.cpp:2103-2114): center the dim-wide
    kernel on the average-resampling source window."""
    ratio = n / out_n
    i = np.arange(out_n)
    off = np.floor(0.5 + i * ratio).astype(np.int64)
    off2 = np.floor(0.5 + (i + 1) * ratio).astype(np.int64) + 1
    size = off2 - off
    return off + size // 2 - dim // 2


def resize_gauss(a: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Gauss overview resampling (gcore/overview.cpp:1993
    ``GDALResampleChunk_Gauss``): binomial 3x3/5x5/7x7 kernel picked by
    the shrink factor, window centered on the average window, edges
    clamped with weight renormalization over in-bounds taps only."""
    h, w = a.shape[:2]
    res_factor = int(0.5 + h / out_h)
    dim = 3 if res_factor <= 2 else (5 if res_factor <= 4 else 7)
    kern = {3: _GAUSS_3, 5: _GAUSS_5, 7: _GAUSS_7}[dim]
    rows0 = _gauss_starts(out_h, h, dim)
    cols0 = _gauss_starts(out_w, w, dim)
    a3, was_2d = _as_3d(a)
    af = a3.astype(np.float64)
    acc = np.zeros((out_h, out_w, a3.shape[2]), dtype=np.float64)
    wsum = np.zeros((out_h, out_w), dtype=np.float64)
    for dy in range(dim):
        ry = rows0 + dy
        my = (ry >= 0) & (ry < h)
        ryc = np.clip(ry, 0, h - 1)
        for dx in range(dim):
            cx = cols0 + dx
            mx = (cx >= 0) & (cx < w)
            cxc = np.clip(cx, 0, w - 1)
            m = (my[:, None] & mx[None, :]).astype(np.float64)
            wgt = kern[dy, dx] * m
            acc += wgt[:, :, None] * af[ryc][:, cxc]
            wsum += wgt
    wsum[wsum == 0] = 1.0
    r = acc / wsum[:, :, None]
    if a.dtype.kind in "ui":
        info = np.iinfo(a.dtype)
        r = np.clip(np.floor(r + 0.5), info.min, info.max).astype(a.dtype)
    return r[:, :, 0] if was_2d else r


def resample(a: np.ndarray, out_h: int, out_w: int, alg: str = "near") -> np.ndarray:
    """Dispatch matching gdal2tiles ``scale_query_to_tile``
    (gdal2tiles.py:838-933): average → block/area reduce; the kernel
    algs → convolution resize; near → center-pick."""
    alg = alg.lower()
    if alg in ("near", "nearest"):
        return resize_nearest(a, out_h, out_w)
    if alg in ("bilinear", "cubic", "cubicspline", "lanczos"):
        return resize_kernel(a, out_h, out_w, alg)
    if alg == "gauss":
        return resize_gauss(a, out_h, out_w)
    h, w = a.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        return block_reduce(a, out_h, out_w, "average" if alg == "average" else alg)
    if alg == "average":  # general-factor area average via bilinear on big kernel
        return resize_kernel(a, out_h, out_w, "bilinear")
    raise ValueError(f"resampling {alg!r} requires integer shrink factors")
