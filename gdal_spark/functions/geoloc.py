"""Geolocation-array transformer — ``gdalwarp -geoloc``.

Reference surface: ``alg/gdalgeoloc.cpp`` (``GDALCreateGeoLocTransformer``,
forward bilinear interpolation of the GEOLOCATION lon/lat arrays,
inverse via the generated backmap + refinement) and the GEOLOCATION
metadata domain (X_DATASET/Y_DATASET, PIXEL_OFFSET, LINE_OFFSET,
PIXEL_STEP, LINE_STEP). This is the transformer used for satellite
swath data whose per-pixel coordinates live in sidecar arrays (very
commonly netCDF variables — see ``sources/netcdf.py``) instead of an
affine geotransform or GCPs. With it, the warp transformer family is
complete: affine, GCP polynomial, TPS, RPC, geoloc.

Spark shape: geoloc arrays are strided (PIXEL_STEP×LINE_STEP), so a
whole scene's arrays are a few hundred KB — dim-sided data. They ride
along broadcast (closure capture of the NumPy arrays) and each Arrow
batch gathers/interpolates vectorized; the point/pixel side stays
distributed and never shuffles. The inverse needs no precomputed
backmap raster at this array size: a coarse nearest-sample seed plus
vectorized Newton iterations on the local bilinear cell converges in
a handful of steps (the reference's backmap exists to amortize the
seed for per-pixel-dense warps; the Newton refinement is the same
idea as its GDALGeoLocInverseTransform iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GeolocArray:
    """Strided geolocation arrays + the GEOLOCATION-domain mapping
    between pixel space and array index space:
    ``array_index = (pixel - offset) / step``."""

    def __init__(
        self,
        lon: np.ndarray,
        lat: np.ndarray,
        pixel_offset: float = 0.0,
        line_offset: float = 0.0,
        pixel_step: float = 1.0,
        line_step: float = 1.0,
    ):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        if lon.shape != lat.shape or lon.ndim != 2:
            raise ValueError("lon/lat must be equal-shape 2-D arrays")
        if lon.shape[0] < 2 or lon.shape[1] < 2:
            raise ValueError("geoloc arrays need >= 2 samples per axis")
        self.lon, self.lat = lon, lat
        self.px_off, self.ln_off = float(pixel_offset), float(line_offset)
        self.px_step, self.ln_step = float(pixel_step), float(line_step)

    # -- forward: pixel -> (lon, lat) ------------------------------------

    def _index_space(self, pixel, line):
        u = (np.asarray(pixel, np.float64) - self.px_off) / self.px_step
        v = (np.asarray(line, np.float64) - self.ln_off) / self.ln_step
        return u, v

    def forward(self, pixel, line):
        """Clamped bilinear interpolation of the arrays at fractional
        pixel coordinates (GDALGeoLocTransform forward direction).
        Cell choice clamps to [0, n-2] so edge/outside probes
        extrapolate from the border cell, matching the reference's
        edge handling."""
        u, v = self._index_space(pixel, line)
        nj, ni = self.lon.shape  # (lines, pixels)
        i0 = np.clip(np.floor(u).astype(np.int64), 0, ni - 2)
        j0 = np.clip(np.floor(v).astype(np.int64), 0, nj - 2)
        fx = u - i0
        fy = v - j0
        out = []
        for arr in (self.lon, self.lat):
            g00 = arr[j0, i0]
            g01 = arr[j0, i0 + 1]
            g10 = arr[j0 + 1, i0]
            g11 = arr[j0 + 1, i0 + 1]
            out.append(
                (1.0 - fx) * (1.0 - fy) * g00
                + fx * (1.0 - fy) * g01
                + (1.0 - fx) * fy * g10
                + fx * fy * g11
            )
        return out[0], out[1]

    # -- inverse: (lon, lat) -> pixel ------------------------------------

    def inverse(self, lon, lat, iters: int = 12):
        """Vectorized inverse: nearest-sample seed (the backmap
        analogue) then Newton on the piecewise-bilinear forward —
        per iteration solve the 2×2 Jacobian of the current cell."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        nj, ni = self.lon.shape
        # seed: nearest sample by squared degree distance (arrays are
        # dim-sized; this is an O(N_probe × N_samples) NumPy matmul-
        # shaped pass, never a Spark join)
        flat_lon = self.lon.ravel()
        flat_lat = self.lat.ravel()
        d2 = (lon[:, None] - flat_lon[None, :]) ** 2 + (
            lat[:, None] - flat_lat[None, :]
        ) ** 2
        k = np.argmin(d2, axis=1)
        u = (k % ni).astype(np.float64)
        v = (k // ni).astype(np.float64)
        for _ in range(iters):
            i0 = np.clip(np.floor(u).astype(np.int64), 0, ni - 2)
            j0 = np.clip(np.floor(v).astype(np.int64), 0, nj - 2)
            fx = u - i0
            fy = v - j0
            vals = []
            grads = []
            for arr in (self.lon, self.lat):
                g00 = arr[j0, i0]
                g01 = arr[j0, i0 + 1]
                g10 = arr[j0 + 1, i0]
                g11 = arr[j0 + 1, i0 + 1]
                val = (
                    (1.0 - fx) * (1.0 - fy) * g00
                    + fx * (1.0 - fy) * g01
                    + (1.0 - fx) * fy * g10
                    + fx * fy * g11
                )
                du = (1.0 - fy) * (g01 - g00) + fy * (g11 - g10)
                dv = (1.0 - fx) * (g10 - g00) + fx * (g11 - g01)
                vals.append(val)
                grads.append((du, dv))
            rx = lon - vals[0]
            ry = lat - vals[1]
            (a, b), (c, d) = grads  # [[a b],[c d]] @ [du dv] = [rx ry]
            det = a * d - b * c
            det = np.where(np.abs(det) < 1e-300, 1e-300, det)
            u = u + (rx * d - ry * b) / det
            v = v + (ry * a - rx * c) / det
        return u * self.px_step + self.px_off, v * self.ln_step + self.ln_off


def synth_geoloc(
    okey: int,
    w: int,
    h: int,
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    ni: int = 9,
    nj: int = 7,
) -> GeolocArray:
    """Deterministic per-image geolocation arrays over the footprint:
    a strided (ni × nj) sample grid whose lon/lat carry a mild
    key-dependent bilinear bend (s·u(1−u)v style) — injective (the
    straight-grid term dominates: |bend slope| ≤ 0.16 < 1) and
    genuinely non-affine, so the warp must really invert the arrays.
    Mirrors synth_gcps' role for the -geoloc transformer."""
    i, j = np.meshgrid(
        np.arange(ni, dtype=np.float64), np.arange(nj, dtype=np.float64)
    )
    u = i / (ni - 1)
    v = j / (nj - 1)
    s = 0.04 * (1 + okey % 4)
    dlon = lon_max - lon_min
    dlat = lat_max - lat_min
    lon = lon_min + dlon * (u + s * u * (1.0 - u) * v)
    lat = lat_max - dlat * (v + s * v * (1.0 - v) * (1.0 - u))
    return GeolocArray(
        lon, lat, pixel_step=w / (ni - 1), line_step=h / (nj - 1)
    )


def geoloc_project(
    df: DataFrame, geoloc: GeolocArray, px_col: str, ln_col: str
) -> DataFrame:
    """Add (lon, lat) columns by forward-transforming fractional pixel
    coordinates through the geolocation arrays — one vectorized gather
    per Arrow batch, arrays captured in the UDF closure (broadcast to
    executors once per task set)."""
    lon_a, lat_a = geoloc.lon, geoloc.lat
    params = (geoloc.px_off, geoloc.ln_off, geoloc.px_step, geoloc.ln_step)

    @F.pandas_udf("lon double, lat double")
    def _fwd(px: pd.Series, ln: pd.Series) -> pd.DataFrame:
        g = GeolocArray(lon_a, lat_a, *params)
        lo, la = g.forward(px.to_numpy(), ln.to_numpy())
        return pd.DataFrame({"lon": lo, "lat": la})

    out = df.withColumn("_g", _fwd(F.col(px_col), F.col(ln_col)))
    return out.withColumn("lon", F.col("_g.lon")).withColumn(
        "lat", F.col("_g.lat")
    ).drop("_g")
