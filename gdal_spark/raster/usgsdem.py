"""USGS DEM (classic ASCII) reader in NumPy.

Mirrors ``frmts/usgsdem/usgsdemdataset.cpp``:

* four A-record layouts auto-detected exactly like ``LoadFromFile``
  (``usgsdemdataset.cpp:592-640``): old format (data at 864), new
  format (1024), the 1025-byte-records-with-newline variant
  (#5007), the undocumented 893 layout (39109h1.dem) and the 918
  layout (fema06 TNRIS exports);
* free-format Fortran integer scanning that skips whitespace and
  stops at the first non-digit (``ReadInt`` /
  ``USGSDEMReadIntFromBuffer``), fixed-width 12/24/48-char double
  fields with ``D`` exponents (``DConvert``);
* georeferencing: UTM / State Plane quads expand the corner extents
  modulus the pixel size and anchor X on the first profile's
  easting; geographic quads convert arc-second extents to degrees
  (``:783-842``);
* horizontal datum from the 2-char code at 890 (NAD27 / WGS72 /
  WGS84 / NAD83), vertical units from the A record (feet → Float32
  band, else Int16; fVRes < 1 also promotes to Float32);
* B-record profiles are columns running south→north, each with its
  own y-origin (``lygap`` vertical registration against the grid),
  elevation = stored * fVRes + profile elev-offset computed in
  float32 (``:483-500``), nodata -32767 preserved, int16 results
  clamped; after each profile the cursor re-aligns to the next
  1024-byte record boundary when the data section starts at 1024
  (junk trailing values, issue #583).

All eight shipped autotest fixtures decode to GDAL's published band
checksums in ``tests/test_usgsdem.py``.

The reference tree ships the format read-only (USGSDEMCreateCopy is
declared but absent), so the writer here exists for round-trip tests
and distributed sinks: it emits spec-conformant new-format geographic
cells (A record with the Identify-checked level/pattern words, SW/NW/
NE/SE corners in arc-seconds, D-exponent doubles; B-record profiles
padded to 1024-byte boundaries) that re-read through this reader.
"""

from __future__ import annotations

import re

import numpy as np

NODATA = -32767

_INT_RE = re.compile(rb"\s*([+-]?[0-9]+)")

_DATUMS = {1: "NAD27", 2: "WGS72", 3: "WGS84", 4: "NAD83", -9: None}


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_int(self) -> int:
        """ReadInt: skip whitespace, consume sign+digits, leave the
        cursor on the terminating character."""
        m = _INT_RE.match(self.buf, self.pos)
        if m is None:
            raise ValueError(
                f"USGSDEM: expected integer at byte {self.pos}")
        self.pos = m.end(1)
        return int(m.group(1))

    def read_fixed_double(self, n: int) -> float:
        """DConvert: exactly n bytes, Fortran D exponents."""
        raw = self.buf[self.pos:self.pos + n]
        if len(raw) < n:
            raise ValueError("USGSDEM: truncated double field")
        self.pos += n
        txt = raw.replace(b"D", b"E").strip()
        return float(txt) if txt else 0.0


def _detect_layout(buf: bytes) -> int:
    """Return the B-record start offset (864/893/918/1024/1025)."""
    c = _Cursor(buf, 864)
    try:
        n_row = c.read_int()
        n_col = c.read_int()
    except ValueError:
        n_row = n_col = -1
    if c.pos < 1024 and n_row == 1 and n_col == 1:
        return 864  # old format
    for start, j_ok in ((1024, (0, 1)), (893, (1,)), (918, (1,))):
        c = _Cursor(buf, start)
        try:
            i = c.read_int()
            j = c.read_int()
        except ValueError:
            continue
        if i == 1 and j in j_ok:
            if start == 1024:
                # 1025-byte records ending with newline (#5007)
                if (len(buf) > 2049 and buf[1024:1025] == b"\n"
                        and buf[2049:2050] == b"\n"):
                    return 1025
            return start
    raise ValueError("Does not appear to be a USGS DEM file")


def read_usgsdem(buf: bytes, header_only: bool = False):
    """Decode a USGS DEM to (arr, info).  ``info`` carries
    geotransform, datum, coord_system, utm_zone, units, dtype."""
    data_start = _detect_layout(buf)

    c = _Cursor(buf, 156)
    coord_system = c.read_int()
    utm_zone = c.read_int()

    c = _Cursor(buf, 528)
    g_unit = c.read_int()
    v_unit = c.read_int()
    units = "ft" if v_unit == 1 else "m"

    c = _Cursor(buf, 816)
    dx = c.read_fixed_double(12)
    dy = c.read_fixed_double(12)
    if dy == 0:
        raise ValueError("USGSDEM: zero y pixel size")
    vres = c.read_fixed_double(12)

    dtype = np.float32 if (v_unit == 1 or vres < 1.0) else np.int16

    c = _Cursor(buf, 546)
    corners = [(c.read_fixed_double(24), c.read_fixed_double(24))
               for _ in range(4)]  # SW, NW, NE, SE
    ext_min_x = min(corners[0][0], corners[1][0])
    ext_max_x = max(corners[2][0], corners[3][0])
    ext_min_y = min(corners[0][1], corners[3][1])
    ext_max_y = max(corners[1][1], corners[2][1])

    c = _Cursor(buf, 858)
    n_profiles = c.read_int()

    new_format = data_start != 864
    datum = "NAD27"
    if new_format:
        code = buf[890:892].strip()
        datum = _DATUMS.get(int(code) if code else 0, "NAD27")

    geographic = coord_system not in (1, 2, -9999)
    if not geographic:
        ext_min_y = np.floor(ext_min_y / dy) * dy
        ext_max_y = np.ceil(ext_max_y / dy) * dy
        c = _Cursor(buf, data_start)
        for _ in range(4):
            c.read_int()
        dx_start = c.read_fixed_double(24)
        h = int((ext_max_y - ext_min_y) / dy + 1.5)
        w = n_profiles
        gt = (dx_start - dx / 2.0, dx, 0.0,
              ext_max_y + dy / 2.0, 0.0, -dy)
    else:
        h = int((ext_max_y - ext_min_y) / dy + 1.5)
        w = n_profiles
        gt = ((ext_min_x - dx / 2.0) / 3600.0, dx / 3600.0, 0.0,
              (ext_max_y + dy / 2.0) / 3600.0, 0.0, -dy / 3600.0)

    info = {
        "w": w, "h": h, "geotransform": gt, "nodata": NODATA,
        "datum": datum, "coord_system": coord_system,
        "utm_zone": utm_zone, "g_unit": g_unit, "units": units,
        "vres": vres, "data_start": data_start,
        "dtype": np.dtype(dtype).name,
    }
    if header_only:
        return None, info
    if w <= 0 or h <= 0:
        raise ValueError(f"USGSDEM: invalid dimensions {w}x{h}")

    arr = np.full((h, w), NODATA, dtype)
    y_min = gt[3] + (h - 0.5) * gt[5]

    c = _Cursor(buf, data_start)
    for i in range(w):
        c.read_int()             # row number (1)
        c.read_int()             # column number (i+1)
        n_pts = c.read_int()
        c.read_int()             # number of columns in profile (1)
        c.read_fixed_double(24)  # x start
        dy_start = c.read_fixed_double(24)
        elev_off = c.read_fixed_double(24)
        c.read_fixed_double(24)  # min z
        c.read_fixed_double(24)  # max z
        if geographic:
            dy_start = dy_start / 3600.0
        lygap = int((y_min - dy_start) / gt[5] + 0.5)  # C trunc-to-zero
        if n_pts > 0:
            vals = np.empty(n_pts, np.int64)
            for k in range(n_pts):
                vals[k] = c.read_int()
            j = np.arange(lygap, n_pts + lygap)
            iy = h - j - 1
            ok = (iy >= 0) & (iy < h) & (vals != NODATA)
            computed = (vals * np.float64(vres)
                        + elev_off).astype(np.float32)
            if dtype is np.int16:
                clamped = np.clip(computed, -32768, 32767)
                store = clamped.astype(np.int16)
            else:
                store = computed
            arr[iy[ok], i] = store[ok]
        if data_start == 1024:
            new_pos = (c.pos + 1023) // 1024 * 1024
            if new_pos > c.pos:
                c.pos = new_pos
    return arr, info


def _d24(v: float) -> bytes:
    return f"{v:24.15E}".replace("E", "D").encode("ascii")


def _i6(v: int) -> bytes:
    return b"%6d" % v


def write_usgsdem(arr: np.ndarray, sw_lon: float, sw_lat: float,
                  dx_arcsec: float = 3600.0, dy_arcsec: float = 3600.0,
                  datum: str = "NAD27") -> bytes:
    """Encode a (h, w) int grid (row 0 = north) as a new-format
    geographic USGS DEM cell with its SW node at (sw_lon, sw_lat)
    degrees and node spacing in arc-seconds.  Elevations must fit the
    I6 field (|v| <= 32767); vres=1, per-profile offset 0."""
    arr = np.asarray(arr)
    h, w = arr.shape
    if np.abs(arr).max(initial=0) > 32767:
        raise ValueError("USGSDEM I6 elevations must fit int16")
    x0 = sw_lon * 3600.0
    y0 = sw_lat * 3600.0
    xmax = x0 + (w - 1) * dx_arcsec
    ymax = y0 + (h - 1) * dy_arcsec
    datum_code = {"NAD27": 1, "WGS72": 2, "WGS84": 3, "NAD83": 4}[datum]

    a = bytearray(b" " * 1024)
    a[0:14] = b"GDAL_SPARK DEM"
    a[150:156] = _i6(1)            # DEM level (Identify: 150 in {1,4})
    a[156:162] = _i6(0)            # coord system 0 = geographic
    a[162:168] = _i6(0)            # zone
    a[528:534] = _i6(3)            # ground units: arc-seconds
    a[534:540] = _i6(2)            # vertical units: meters
    a[540:546] = _i6(4)            # polygon sides
    corners = [(x0, y0), (x0, ymax), (xmax, ymax), (xmax, y0)]
    pos = 546
    for cx, cy in corners:
        a[pos:pos + 24] = _d24(cx)
        a[pos + 24:pos + 48] = _d24(cy)
        pos += 48
    a[738:762] = _d24(float(arr.min()) if arr.size else 0.0)
    a[762:786] = _d24(float(arr.max()) if arr.size else 0.0)
    a[786:810] = _d24(0.0)         # rotation
    a[810:816] = _i6(0)            # accuracy code
    a[816:828] = f"{dx_arcsec:12.6E}".replace("E", "D").encode()
    a[828:840] = f"{dy_arcsec:12.6E}".replace("E", "D").encode()
    a[840:852] = f"{1.0:12.6E}".replace("E", "D").encode()
    a[852:858] = _i6(1)            # rows of profiles
    a[858:864] = _i6(w)            # columns of profiles
    a[890:892] = b"%2d" % datum_code

    out = bytearray(bytes(a))
    col_sn = arr[::-1, :].T  # (w, h) south→north per profile
    for i in range(w):
        rec = bytearray()
        rec += _i6(1) + _i6(i + 1) + _i6(h) + _i6(1)
        rec += _d24(x0 + i * dx_arcsec)
        rec += _d24(y0)
        rec += _d24(0.0)  # elevation offset
        rec += _d24(float(col_sn[i].min()))
        rec += _d24(float(col_sn[i].max()))
        rec += b"".join(_i6(int(v)) for v in col_sn[i])
        pad = (-len(rec)) % 1024
        rec += b" " * pad
        out += rec
    return bytes(out)
