"""NTv2 datum-shift grids — `frmts/raw/ntv2dataset.cpp`, `ogr/ogrct.cpp`.

Original implementation of the public NTv2 (.gsb) format and the PROJ
grid-shift semantics the reference applies through ``ogrct.cpp``:

- 11-record overview header + per-subgrid 11-record headers; values in
  arc-seconds, longitudes **positive west** (the classic NTv2 quirk);
  both endiannesses (detected from ``NUM_OREC == 11``).
- Node order: from (S_LAT, E_LONG) with west-positive longitude
  increasing — i.e. from the SE corner westward, then northward
  (``ntv2dataset.cpp:464-480`` remaps this with negative raw strides).
- Application (PROJ ``hgridshift``): forward (source→target datum):
  lat' = lat + Δlat/3600, lon' = lon − Δlon/3600 (east-positive);
  shifts bilinearly interpolated on the cell; inverse by fixed-point
  iteration (4 rounds, the PROJ method).

Scale posture: grids are a few MB and broadcast to executors as plain
NumPy arrays inside the vectorized transformer chain
(``functions/proj.py``) — per-point work stays whole-array NumPy.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class NTv2SubGrid:
    name: str
    parent: str
    s_lat: float  # degrees
    n_lat: float
    w_lon: float  # east-positive degrees (western edge)
    e_lon: float
    lat_inc: float  # degrees
    lon_inc: float
    # (ny, nx): row 0 = s_lat, col 0 = w_lon (south-up, west→east)
    lat_shift: np.ndarray  # arc-seconds, +north
    lon_shift_w: np.ndarray  # arc-seconds, positive WEST

    @property
    def shape(self) -> tuple[int, int]:
        return self.lat_shift.shape

    def contains(self, lon, lat):
        return (
            (lat >= self.s_lat) & (lat <= self.n_lat)
            & (lon >= self.w_lon) & (lon <= self.e_lon)
        )


def read_ntv2(path: str) -> list[NTv2SubGrid]:
    """Parse a .gsb file → subgrids (any endianness)."""
    with open(path, "rb") as f:
        buf = f.read()

    def rec_name(off):
        return buf[off : off + 8].decode("ascii", "replace")

    # endianness probe: NUM_OREC value must be 11
    for en in ("<", ">"):
        if struct.unpack_from(en + "i", buf, 8)[0] == 11:
            break
    else:
        raise ValueError("not an NTv2 .gsb file (NUM_OREC != 11)")

    def header(off, n):
        vals = {}
        for k in range(n):
            nm = rec_name(off + 16 * k).strip()
            vals[nm] = off + 16 * k + 8
        return vals

    ov = header(0, 11)
    num_file = struct.unpack_from(en + "i", buf, ov["NUM_FILE"])[0]
    gs_type = buf[ov["GS_TYPE"] : ov["GS_TYPE"] + 8].decode().strip()
    if gs_type not in ("SECONDS", ""):
        raise NotImplementedError(f"NTv2 GS_TYPE {gs_type!r} (want SECONDS)")
    off = 11 * 16
    grids: list[NTv2SubGrid] = []
    for _ in range(num_file):
        sh = header(off, 11)

        def d(key):
            return struct.unpack_from(en + "d", buf, sh[key])[0]

        name = buf[sh["SUB_NAME"] : sh["SUB_NAME"] + 8].decode().strip()
        parent = buf[sh["PARENT"] : sh["PARENT"] + 8].decode().strip()
        s_lat, n_lat = d("S_LAT") / 3600.0, d("N_LAT") / 3600.0
        # stored positive west: E_LONG is the numerically smaller one
        e_lon = -d("E_LONG") / 3600.0
        w_lon = -d("W_LONG") / 3600.0
        lat_inc, lon_inc = d("LAT_INC") / 3600.0, d("LONG_INC") / 3600.0
        count = struct.unpack_from(en + "i", buf, sh["GS_COUNT"])[0]
        off += 11 * 16
        nodes = np.frombuffer(
            buf, dtype=en + "f4", count=count * 4, offset=off
        ).reshape(count, 4)
        off += count * 16
        nx = int(np.floor((w_lon - e_lon) / lon_inc + 1.5))  # hmm: east-pos
        nx = int(np.floor(abs(e_lon - w_lon) / lon_inc + 1.5))
        ny = int(np.floor((n_lat - s_lat) / lat_inc + 1.5))
        if nx * ny != count:
            raise ValueError(
                f"NTv2 subgrid {name}: GS_COUNT {count} != {nx}x{ny}"
            )
        # file order: SE corner, longitude increasing WESTWARD → flip
        # columns to get west→east
        lat_s = nodes[:, 0].reshape(ny, nx)[:, ::-1]
        lon_s = nodes[:, 1].reshape(ny, nx)[:, ::-1]
        grids.append(
            NTv2SubGrid(
                name, parent, s_lat, n_lat, w_lon, e_lon, lat_inc, lon_inc,
                np.ascontiguousarray(lat_s.astype(np.float64)),
                np.ascontiguousarray(lon_s.astype(np.float64)),
            )
        )
    return grids


def ntv2_raster(path: str):
    """GDAL-driver view of the (first) subgrid: geotransform + the four
    bands in GDAL orientation (north-up, west→east), matching
    ``ntv2dataset.cpp`` — for pinning against autotest expectations."""
    g = read_ntv2(path)[0]
    gt = (
        g.w_lon - g.lon_inc * 0.5,
        g.lon_inc,
        0.0,
        g.n_lat + g.lat_inc * 0.5,
        0.0,
        -g.lat_inc,
    )
    b1 = g.lat_shift[::-1]  # north-up
    b2 = g.lon_shift_w[::-1]
    return gt, (b1, b2)


class GridShift:
    """PROJ-style horizontal grid shift over NTv2 subgrids (most
    detailed containing subgrid wins, children listed after parents)."""

    def __init__(self, grids: list[NTv2SubGrid]):
        if not grids:
            raise ValueError("no subgrids")
        self.grids = grids

    @classmethod
    def from_file(cls, path: str) -> "GridShift":
        return cls(read_ntv2(path))

    def _interp(self, g: NTv2SubGrid, lon, lat):
        ny, nx = g.shape
        fx = np.clip((lon - g.w_lon) / g.lon_inc, 0.0, nx - 1.0)
        fy = np.clip((lat - g.s_lat) / g.lat_inc, 0.0, ny - 1.0)
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, nx - 2) if nx > 1 else np.zeros_like(fx, dtype=np.int64)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, ny - 2) if ny > 1 else np.zeros_like(fy, dtype=np.int64)
        tx = fx - x0
        ty = fy - y0
        x1 = np.minimum(x0 + 1, nx - 1)
        y1 = np.minimum(y0 + 1, ny - 1)

        def bil(a):
            return (
                a[y0, x0] * (1 - tx) * (1 - ty)
                + a[y0, x1] * tx * (1 - ty)
                + a[y1, x0] * (1 - tx) * ty
                + a[y1, x1] * tx * ty
            )

        return bil(g.lat_shift), bil(g.lon_shift_w)

    def _shift_at(self, lon, lat):
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        dlat = np.zeros_like(lon)
        dlon_w = np.zeros_like(lon)
        done = np.zeros(lon.shape, dtype=bool)
        # later (child) grids override earlier ones where they apply
        for g in self.grids:
            m = g.contains(lon, lat)
            if not m.any():
                continue
            a, b = self._interp(g, lon, lat)
            dlat = np.where(m, a, dlat)
            dlon_w = np.where(m, b, dlon_w)
            done |= m
        return dlat, dlon_w, done

    def forward(self, lon, lat):
        """Source datum → target datum (east-positive degrees).
        Points outside every subgrid pass through unshifted (the PROJ
        out-of-grid behavior)."""
        dlat, dlon_w, _ = self._shift_at(lon, lat)
        return (
            np.asarray(lon, dtype=np.float64) - dlon_w / 3600.0,
            np.asarray(lat, dtype=np.float64) + dlat / 3600.0,
        )

    def inverse(self, lon, lat, iterations: int = 4):
        """Target → source by fixed-point iteration (PROJ method)."""
        lon_t = np.asarray(lon, dtype=np.float64)
        lat_t = np.asarray(lat, dtype=np.float64)
        lon_s = lon_t.copy()
        lat_s = lat_t.copy()
        for _ in range(iterations):
            dlat, dlon_w, _ = self._shift_at(lon_s, lat_s)
            lon_s = lon_t + dlon_w / 3600.0
            lat_s = lat_t - dlat / 3600.0
        return lon_s, lat_s
