"""GCP-based geotransforms: polynomial (order 1-3) and thin-plate
spline, pure NumPy, vectorized.

Reference surfaces re-expressed:
- ``GDALCreateGCPTransformer`` / CRS polynomial fit
  (``alg/gdal_crs.cpp:594-780``): mean-centered least squares on the
  triangular basis, forward and inverse fitted independently from the
  same control points. Term order matches ``CRS_georef``:
  [1, x, y, x^2, xy, y^2, x^3, x^2y, xy^2, y^3].
- ``GDALCreateTPSTransformer`` (``alg/thinplatespline.cpp:180``):
  radial kernel U(d2) = d2 * log(d2) on the *squared* distance, affine
  part + per-point weights, side conditions sum(w)=sum(w x)=sum(w y)=0.

Spark shape: a GCP set is tiny (tens of points) — transformers are
fitted once on the driver (or per-executor from a broadcast list) and
applied vectorized inside Arrow batches; the image side stays
distributed. Used by ``raster.warp.warp_with_gcps``.
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def poly_terms(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Design matrix columns in CRS_georef term order."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * x, x * y, y * y]
    if order >= 3:
        cols += [x**3, x * x * y, x * y * y, y**3]
    if order not in _N_TERMS:
        raise ValueError(f"polynomial order must be 1..3, got {order}")
    return np.stack(cols, axis=-1)


class PolyTransform:
    """One fitted direction (src -> dst) of a GCP polynomial."""

    def __init__(self, sx, sy, dx, dy, order: int):
        sx = np.asarray(sx, float)
        sy = np.asarray(sy, float)
        n_terms = _N_TERMS[order]
        if len(sx) < n_terms:
            raise ValueError(
                f"order-{order} polynomial needs >= {n_terms} GCPs, got {len(sx)}"
            )
        # mean-centering as gdal_crs.cpp does (x1_mean/y1_mean):
        # conditions the normal equations for far-from-origin coords.
        self.mx = float(np.mean(sx))
        self.my = float(np.mean(sy))
        self.order = order
        A = poly_terms(sx - self.mx, sy - self.my, order)
        self.ex, *_ = np.linalg.lstsq(A, np.asarray(dx, float), rcond=None)
        self.ny, *_ = np.linalg.lstsq(A, np.asarray(dy, float), rcond=None)

    def __call__(self, x, y):
        A = poly_terms(np.asarray(x, float) - self.mx, np.asarray(y, float) - self.my, self.order)
        return A @ self.ex, A @ self.ny


class TPSTransform:
    """One fitted direction of the thin-plate spline."""

    def __init__(self, sx, sy, dx, dy):
        sx = np.asarray(sx, float)
        sy = np.asarray(sy, float)
        n = len(sx)
        if n < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self.sx, self.sy = sx, sy
        d2 = (sx[:, None] - sx[None, :]) ** 2 + (sy[:, None] - sy[None, :]) ** 2
        K = np.where(d2 > 0, d2 * np.log(np.where(d2 > 0, d2, 1.0)), 0.0)
        P = np.column_stack([np.ones(n), sx, sy])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n, 0] = np.asarray(dx, float)
        rhs[:n, 1] = np.asarray(dy, float)
        sol = np.linalg.solve(A, rhs)
        self.w = sol[:n]
        self.a = sol[n:]

    def __call__(self, x, y):
        x = np.asarray(x, float)
        y = np.asarray(y, float)
        shp = x.shape
        xf, yf = x.ravel(), y.ravel()
        d2 = (xf[:, None] - self.sx[None, :]) ** 2 + (yf[:, None] - self.sy[None, :]) ** 2
        U = np.where(d2 > 0, d2 * np.log(np.where(d2 > 0, d2, 1.0)), 0.0)
        out = U @ self.w + np.column_stack([np.ones_like(xf), xf, yf]) @ self.a
        return out[:, 0].reshape(shp), out[:, 1].reshape(shp)


class GCPTransformer:
    """Bidirectional transformer from a GCP list, matching
    ``GDALCreateGCPTransformer``/``GDALCreateTPSTransformer`` usage:
    ``fwd`` maps (pixel, line) -> (geo_x, geo_y); ``inv`` is an
    independently fitted reverse transform (GDAL fits both directions
    from the same points rather than inverting the polynomial).

    gcps: iterable of (pixel, line, geo_x, geo_y).
    method: 'poly1' | 'poly2' | 'poly3' | 'tps'.
    """

    def __init__(self, gcps, method: str = "poly1"):
        g = np.asarray(list(gcps), dtype=np.float64)
        px, py, gx, gy = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
        if method == "tps":
            self.fwd = TPSTransform(px, py, gx, gy)
            self.inv = TPSTransform(gx, gy, px, py)
        elif method in ("poly1", "poly2", "poly3"):
            order = int(method[-1])
            self.fwd = PolyTransform(px, py, gx, gy, order)
            self.inv = PolyTransform(gx, gy, px, py, order)
        else:
            raise ValueError(f"unknown GCP method {method!r}")

    def residuals(self, gcps) -> np.ndarray:
        """Forward-fit residual distance per GCP (gdalinfo-style RMS
        material)."""
        g = np.asarray(list(gcps), dtype=np.float64)
        fx, fy = self.fwd(g[:, 0], g[:, 1])
        return np.hypot(fx - g[:, 2], fy - g[:, 3])
