"""Terrain-grid interchange formats in NumPy.

Five classic single-band elevation formats, each mirrored from the
reference driver and pinned on its published autotest checksums in
``tests/test_terrain.py``:

* **SRTMHGT** (``frmts/srtmhgt/srtmhgtdataset.cpp``): raw big-endian
  int16 (or byte ``.raw`` SWBD / float32 ``.hgts``), dimensions
  derived from the file size (121/1201/1801x3601/3601/7201), the SW
  corner from the ``N43W080``-style filename, point-registered
  georeferencing ``(lon - 0.5/(n-1), 1/(n-1), ...)``
  (``srtmhgtdataset.cpp:483-489``), nodata -32768.  The autotest pin
  (checksum 60918) is n43.dt0 nearest-upsampled 121→1201 with GDAL's
  ``floor((i+0.5)·src/dst)`` rule.
* **GSBG** — Golden Software Surfer 6 binary (``frmts/gsg/
  gsbgdataset.cpp``): ``DSBB`` + uint16 nx/ny + 6 LE doubles
  (xlo/xhi/ylo/yhi/zlo/zhi) + float32 rows bottom-up, blank value
  1.701410009187828e38, node-registered (origin = xlo - px/2).
* **GSAG** — Surfer 6 ASCII (``frmts/gsg/gsagdataset.cpp``):
  ``DSAA`` header with the same six extents, whitespace-separated
  values bottom-up, Float64, blank 1.70141e38.
* **GS7BG** — Surfer 7 binary (``frmts/gsg/gs7bgdataset.cpp``):
  little-endian tagged sections 0x42525344 header / 0x44495247 grid
  (nRow, nCol, xLL, yLL, xSize, ySize, zMin, zMax, rotation, blank)
  / 0x41544144 data — float64 rows bottom-up.
* **BT** — VTP binary terrain 1.3 (``frmts/raw/btdataset.cpp``):
  256-byte header (``binterr1.3``, int32 cols/rows, int16 datasize,
  byte float-flag, int16 h-units/UTM-zone/datum, LE doubles
  left/right/bottom/top, float vscale at 62), then **column-major**
  profiles, each column stored bottom-to-top
  (``btdataset.cpp:122-171``).

All three GSG fixtures and the BT round trip reproduce GDAL band
checksum 4672 (the byte.tif 20x20 grid).
"""

from __future__ import annotations

import struct

import numpy as np

GSG_BLANK_F32 = np.float32(1.701410009187828e38)
GSG_BLANK = 1.70141e38
HGT_NODATA = -32768


# ---------------------------------------------------------------- SRTMHGT

_HGT_SIZES = {
    1201 * 1201 * 2: (1201, 1201, np.dtype(">i2")),
    1801 * 3601 * 2: (3601, 1801, np.dtype(">i2")),
    3601 * 3601: (3601, 3601, np.dtype("u1")),
    3601 * 3601 * 2: (3601, 3601, np.dtype(">i2")),
    3601 * 3601 * 4: (3601, 3601, np.dtype(">f4")),
    7201 * 7201 * 2: (7201, 7201, np.dtype(">i2")),
}


def hgt_corner(name: str) -> tuple[int, int]:
    """SW corner (lat, lon) from an ``N43W080``-style basename
    (srtmhgtdataset.cpp:398-419)."""
    base = name.rsplit("/", 1)[-1]
    lat = int(base[1:3])
    lon = int(base[4:7])
    if base[0] in "Ss":
        lat = -lat
    elif base[0] not in "Nn":
        raise ValueError(f"{base}: not an SRTMHGT filename")
    if base[3] in "Ww":
        lon = -lon
    elif base[3] not in "Ee":
        raise ValueError(f"{base}: not an SRTMHGT filename")
    return lat, lon


def hgt_name(lat: int, lon: int) -> str:
    return (f"{'N' if lat >= 0 else 'S'}{abs(lat):02d}"
            f"{'E' if lon >= 0 else 'W'}{abs(lon):03d}.hgt")


def read_hgt(buf: bytes, name: str) -> tuple[np.ndarray, dict]:
    """Decode an SRTMHGT cell: rows run north→south.  Returns the
    array and {geotransform, nodata}."""
    if len(buf) not in _HGT_SIZES:
        raise ValueError(f"{len(buf)} bytes: not a recognized HGT size")
    h, w, dt = _HGT_SIZES[len(buf)]
    lat, lon = hgt_corner(name)
    arr = np.frombuffer(buf, dt).reshape(h, w)
    gt = (lon - 0.5 / (w - 1), 1.0 / (w - 1), 0.0,
          lat + 1 + 0.5 / (h - 1), 0.0, -1.0 / (h - 1))
    return arr, {"geotransform": gt, "w": w, "h": h,
                 "nodata": None if dt.kind == "u" else HGT_NODATA,
                 "area_or_point": "Point"}


def write_hgt(arr: np.ndarray) -> bytes:
    """Encode int16 (big-endian), uint8, or float32 rows-north-first."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint8:
        return arr.tobytes()
    if arr.dtype.kind == "f":
        return arr.astype(">f4").tobytes()
    return arr.astype(">i2").tobytes()


def gdal_nearest_indices(src_n: int, dst_n: int) -> np.ndarray:
    """GDAL RasterIO nearest-neighbour sample positions: the source
    index under the center of each destination pixel (pinned by the
    autotest's 121→1201 upsample producing checksum 60918)."""
    return ((np.arange(dst_n) + 0.5) * src_n / dst_n).astype(np.int64)


# ------------------------------------------------------------ GSBG (DSBB)

def read_gsbg(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:4] != b"DSBB":
        raise ValueError("not a GSBG (DSBB) grid")
    nx, ny = struct.unpack_from("<HH", buf, 4)
    xlo, xhi, ylo, yhi, zlo, zhi = struct.unpack_from("<6d", buf, 8)
    arr = np.frombuffer(buf, "<f4", nx * ny, 56).reshape(ny, nx)[::-1]
    px = (xhi - xlo) / (nx - 1)
    py = (yhi - ylo) / (ny - 1)
    gt = (xlo - px / 2, px, 0.0, yhi + py / 2, 0.0, -py)
    return arr.copy(), {"geotransform": gt, "w": nx, "h": ny,
                        "nodata": float(GSG_BLANK_F32),
                        "zmin": zlo, "zmax": zhi}


def write_gsbg(arr: np.ndarray, geotransform) -> bytes:
    arr = np.asarray(arr, np.float32)
    ny, nx = arr.shape
    gt = geotransform
    xlo = gt[0] + gt[1] / 2
    xhi = xlo + (nx - 1) * gt[1]
    yhi = gt[3] + gt[5] / 2
    ylo = yhi + (ny - 1) * gt[5]
    valid = arr[arr != GSG_BLANK_F32]
    zlo = float(valid.min()) if valid.size else 0.0
    zhi = float(valid.max()) if valid.size else 0.0
    return (b"DSBB" + struct.pack("<HH", nx, ny)
            + struct.pack("<6d", xlo, xhi, ylo, yhi, zlo, zhi)
            + arr[::-1].astype("<f4").tobytes())


# ------------------------------------------------------------ GSAG (DSAA)

def read_gsag(buf: bytes) -> tuple[np.ndarray, dict]:
    text = buf.decode("ascii", "replace")
    if not text.startswith("DSAA"):
        raise ValueError("not a GSAG (DSAA) grid")
    toks = text.split()
    nx, ny = int(toks[1]), int(toks[2])
    xlo, xhi, ylo, yhi, zlo, zhi = (float(t) for t in toks[3:9])
    vals = np.array(toks[9:9 + nx * ny], np.float64).reshape(ny, nx)[::-1]
    px = (xhi - xlo) / (nx - 1)
    py = (yhi - ylo) / (ny - 1)
    gt = (xlo - px / 2, px, 0.0, yhi + py / 2, 0.0, -py)
    return vals, {"geotransform": gt, "w": nx, "h": ny,
                  "nodata": GSG_BLANK, "zmin": zlo, "zmax": zhi}


def write_gsag(arr: np.ndarray, geotransform) -> bytes:
    arr = np.asarray(arr, np.float64)
    ny, nx = arr.shape
    gt = geotransform
    xlo = gt[0] + gt[1] / 2
    xhi = xlo + (nx - 1) * gt[1]
    yhi = gt[3] + gt[5] / 2
    ylo = yhi + (ny - 1) * gt[5]
    valid = arr[arr != GSG_BLANK]
    zlo = float(valid.min()) if valid.size else 0.0
    zhi = float(valid.max()) if valid.size else 0.0
    lines = [f"DSAA", f"{nx} {ny}", f"{xlo:.10g} {xhi:.10g}",
             f"{ylo:.10g} {yhi:.10g}", f"{zlo:.10g} {zhi:.10g}"]
    flat = arr[::-1].ravel()
    for row in flat.reshape(ny, nx):
        for i in range(0, nx, 10):
            lines.append(" ".join(f"{v:.10g}" for v in row[i:i + 10]))
        lines.append("")
    return ("\n".join(lines) + "\n").encode("ascii")


# ----------------------------------------------------------- GS7BG (DSRB)

_TAG_HEADER = 0x42525344  # 'DSRB'
_TAG_GRID = 0x44495247    # 'GRID'
_TAG_DATA = 0x41544144    # 'DATA'


def read_gs7bg(buf: bytes) -> tuple[np.ndarray, dict]:
    tag, size = struct.unpack_from("<ii", buf, 0)
    if tag != _TAG_HEADER:
        raise ValueError("not a GS7BG (DSRB) grid")
    pos = 8 + size
    grid = None
    while pos + 8 <= len(buf):
        tag, size = struct.unpack_from("<ii", buf, pos)
        pos += 8
        if tag == _TAG_GRID:
            (ny, nx) = struct.unpack_from("<ii", buf, pos)
            (xll, yll, px, py, zlo, zhi, rot, blank) = struct.unpack_from(
                "<8d", buf, pos + 8)
            grid = (ny, nx, xll, yll, px, py, zlo, zhi, blank)
            pos += size
        elif tag == _TAG_DATA:
            if grid is None:
                raise ValueError("GS7BG DATA before GRID section")
            ny, nx, xll, yll, px, py, zlo, zhi, blank = grid
            arr = np.frombuffer(buf, "<f8", nx * ny, pos).reshape(
                ny, nx)[::-1]
            gt = (xll - px / 2, px, 0.0,
                  yll + (ny - 1) * py + py / 2, 0.0, -py)
            return arr.copy(), {"geotransform": gt, "w": nx, "h": ny,
                                "nodata": blank, "zmin": zlo, "zmax": zhi}
        else:
            pos += size
    raise ValueError("GS7BG: no DATA section")


def write_gs7bg(arr: np.ndarray, geotransform) -> bytes:
    arr = np.asarray(arr, np.float64)
    ny, nx = arr.shape
    gt = geotransform
    xll = gt[0] + gt[1] / 2
    yll = gt[3] + gt[5] / 2 + (ny - 1) * gt[5]
    blank = 1.70141e38
    valid = arr[arr != blank]
    zlo = float(valid.min()) if valid.size else 0.0
    zhi = float(valid.max()) if valid.size else 0.0
    out = struct.pack("<iii", _TAG_HEADER, 4, 1)
    out += struct.pack("<ii", _TAG_GRID, 72)
    out += struct.pack("<ii", ny, nx)
    out += struct.pack("<8d", xll, yll, gt[1], -gt[5], zlo, zhi, 0.0, blank)
    out += struct.pack("<ii", _TAG_DATA, nx * ny * 8)
    out += arr[::-1].astype("<f8").tobytes()
    return out


# ------------------------------------------------------------------- BT

_BT_DTYPES = {
    (2, 0): np.dtype("<i2"),
    (4, 0): np.dtype("<i4"),
    (4, 1): np.dtype("<f4"),
}


def read_bt(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:7] != b"binterr":
        raise ValueError("not a BT file")
    version = buf[7:10].decode("ascii", "replace")
    nx, = struct.unpack_from("<i", buf, 10)
    ny, = struct.unpack_from("<i", buf, 14)
    dsize, = struct.unpack_from("<h", buf, 18)
    is_float = buf[20]
    hunits, zone, datum = struct.unpack_from("<3h", buf, 22)
    left, right, bottom, top = struct.unpack_from("<4d", buf, 28)
    vscale, = struct.unpack_from("<f", buf, 62)
    dt = _BT_DTYPES.get((dsize, 1 if is_float else 0))
    if dt is None:
        raise ValueError(f"BT datasize={dsize} float={is_float} unknown")
    # column-major profiles, each bottom-to-top (btdataset.cpp:122-171)
    cols = np.frombuffer(buf, dt, nx * ny, 256).reshape(nx, ny)
    arr = cols[:, ::-1].T.copy()
    gt = (left, (right - left) / nx, 0.0, top, 0.0, (bottom - top) / ny)
    return arr, {"geotransform": gt, "w": nx, "h": ny,
                 "dtype": arr.dtype.name,
                 "version": version, "utm_zone": zone, "datum": datum,
                 "hunits": hunits,
                 "vscale": float(vscale) if vscale != 0.0 else 1.0}


def write_bt(arr: np.ndarray, geotransform, utm_zone: int = 0,
             datum: int = 0, hunits: int = 1) -> bytes:
    arr = np.asarray(arr)
    ny, nx = arr.shape
    if arr.dtype.kind == "f":
        dt, dsize, is_float = np.dtype("<f4"), 4, 1
    elif arr.dtype.itemsize <= 2:
        dt, dsize, is_float = np.dtype("<i2"), 2, 0
    else:
        dt, dsize, is_float = np.dtype("<i4"), 4, 0
    gt = geotransform
    left = gt[0]
    right = gt[0] + nx * gt[1]
    top = gt[3]
    bottom = gt[3] + ny * gt[5]
    hdr = bytearray(256)
    hdr[0:10] = b"binterr1.3"
    struct.pack_into("<i", hdr, 10, nx)
    struct.pack_into("<i", hdr, 14, ny)
    struct.pack_into("<h", hdr, 18, dsize)
    hdr[20] = is_float
    struct.pack_into("<3h", hdr, 22, hunits, utm_zone, datum)
    struct.pack_into("<4d", hdr, 28, left, right, bottom, top)
    struct.pack_into("<h", hdr, 60, 0)  # no external .prj
    struct.pack_into("<f", hdr, 62, 1.0)
    return bytes(hdr) + arr[::-1].T.astype(dt).tobytes()
