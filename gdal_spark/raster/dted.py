"""DTED (Military Elevation Data, MIL-PRF-89020B) codec in NumPy.

Mirrors ``frmts/dted/dted_api.c`` / ``dted_create.c`` /
``dteddataset.cpp``:

* leading VOL / HDR records are skipped until the UHL record
  (``dted_api.c:132-155``);
* the "weird DTED3" variant (space at UHL byte 4) reads pixel sizes
  from alternate UHL offsets and raster dims from the DSI
  (``dted_api.c:214-246``);
* the buggy original MIL-D-89020 lat/long inversion in the UHL is
  auto-detected via the hemisphere letters and the corner swapped
  back (``dted_api.c:278-315``, pinned on
  ``autotest/gdrivers/data/dted/n43_coord_inverted.dt0``);
* data records are columns stored south→north in signed-magnitude
  int16; values below -16000 after sign-decode are re-read as two's
  complement (improperly generated files, ``dted_api.c:640-670``);
* partial/sparse column variants: when the first/last record headers
  don't span the declared width, a logical-column→offset map is
  built (sequential fast path, else a full scan of record headers)
  and unmapped columns fill with nodata -32767
  (``DTEDDetectVariantWithMissingColumns``, ``dted_api.c:336-470``;
  pinned on the autotest ``n43_partial_cols.dt0`` checksum 56006 and
  ``n43_sparse_cols.dt0`` checksum 56369);
* optional record-checksum verification (config
  ``DTED_VERIFY_CHECKSUM``): the trailing big-endian uint32 is the
  byte sum of header+data (``dted_api.c:683-720``);
* georeferencing is the UHL lower-left corner minus half a pixel
  (area convention), or the corner itself with
  ``pixel_is_point=True`` (config ``DTED_APPLY_PIXEL_IS_POINT``,
  ``dteddataset.cpp``; pinned on the autotest n43.dt0
  geotransform);
* horizontal datum from DSI bytes 144:149 — WGS84 → the standard
  lat/long WKT, WGS72 → the WGS 72 GEOGCS with a warning flag
  (``dteddataset.cpp:571-635``);
* the writer reproduces ``dted_create.c`` byte-for-byte: UHL/DSI/ACC
  headers (edition 01A, security U, PRF89020B), blank 0xFF profile
  templates, then per-column signed-magnitude records with the
  32-bit byte-sum checksum (``DTEDWriteProfile``,
  ``dted_api.c:747-800``) — so a decode→encode round trip of
  ``n43.dt0`` reproduces GDAL's published band checksum 49187.
"""

from __future__ import annotations

import numpy as np

UHL_SIZE = 80
DSI_SIZE = 648
ACC_SIZE = 2700
NODATA = -32767

WKT_WGS84 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],AXIS["Latitude",NORTH],'
    'AXIS["Longitude",EAST],AUTHORITY["EPSG","4326"]]'
)
WKT_WGS72_PREFIX = 'GEOGCS["WGS 72"'


class DtedInfo(dict):
    """Decoded metadata: w h geotransform nodata datum level ..."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__


def _dms(buf: bytes, deg_off: int, deg_len: int) -> tuple[float, str]:
    """Parse DDDMMSSH starting at ``deg_off`` (degrees field of
    ``deg_len`` chars, then 2+2 minutes/seconds and the hemisphere)."""
    deg = int(buf[deg_off:deg_off + deg_len].lstrip(b"0") or b"0")
    mn = int(buf[deg_off + deg_len:deg_off + deg_len + 2].lstrip(b"0")
             or b"0")
    sec = int(buf[deg_off + deg_len + 2:deg_off + deg_len + 4].lstrip(b"0")
              or b"0")
    hemi = chr(buf[deg_off + deg_len + 4])
    return deg + mn / 60.0 + sec / 3600.0, hemi


def read_dted(buf: bytes, verify_checksum: bool = False,
              pixel_is_point: bool = False) -> tuple[np.ndarray, DtedInfo]:
    """Decode a DTED cell to a (h, w) int16 array (row 0 = north) and
    its metadata.  Raises ValueError on malformed headers and, when
    ``verify_checksum``, on any record whose byte-sum trailer
    mismatches (autotest ``n43_bad_crc.dt0`` semantics)."""
    pos = 0
    while True:
        rec = buf[pos:pos + UHL_SIZE]
        if len(rec) < UHL_SIZE:
            raise ValueError("No UHL record: not a DTED file")
        head = rec[:3].upper()
        if head in (b"VOL", b"HDR"):
            pos += UHL_SIZE
            continue
        break
    if rec[:3].upper() != b"UHL":
        raise ValueError("No UHL record: not a DTED file")
    uhl = rec
    dsi = buf[pos + UHL_SIZE:pos + UHL_SIZE + DSI_SIZE]
    acc = buf[pos + UHL_SIZE + DSI_SIZE:pos + UHL_SIZE + DSI_SIZE + ACC_SIZE]
    if dsi[:3].upper() != b"DSI" or acc[:3].upper() != b"ACC":
        raise ValueError("DSI or ACC record missing")
    data_off = pos + UHL_SIZE + DSI_SIZE + ACC_SIZE

    weird = uhl[4:5] == b" "  # DTED3 FalconView variant
    if not weird:
        psx = int(uhl[20:24]) / 36000.0
        psy = int(uhl[24:28]) / 36000.0
        w = int(uhl[47:51])
        h = int(uhl[51:55])
        lon, lon_h = _dms(uhl, 4, 3)
        lat, lat_h = _dms(uhl, 12, 3)
        datum = dsi[144:149].strip().decode("ascii", "replace")
    else:
        psx = int(uhl[40:44]) / 36000.0
        psy = int(uhl[44:48]) / 36000.0
        w = int(dsi[562:566])
        h = int(dsi[566:570])
        lon, lon_h = _dms(uhl, 8, 3)
        lat, lat_h = _dms(uhl, 24, 3)
        datum = dsi[270:275].strip().decode("ascii", "replace")
    if w <= 0 or h <= 0:
        raise ValueError(f"Invalid dimensions {w} x {h}")

    # MIL-D-89020 original-edition bug: lat/long fields inverted;
    # detect via N/S in the longitude slot (dted_api.c:278).
    swap = lon_h in ("N", "S")
    llx = -lon if lon_h in ("W", "S") else lon
    lly = -lat if lat_h == "S" or (swap and lat_h == "W") else lat
    if swap:
        llx, lly = lly, llx

    if pixel_is_point:
        gt = (llx, psx, 0.0, lly + (h - 1) * psy, 0.0, -psy)
    else:
        gt = (llx - 0.5 * psx, psx, 0.0,
              lly - 0.5 * psy + h * psy, 0.0, -psy)

    rec_sz = 12 + h * 2
    # Missing-column variants (dted_api.c:336): map logical col → offset.
    n_phys = (len(buf) - data_off) // rec_sz
    col_off = None
    first = buf[data_off:data_off + 8]
    standard = False
    if len(first) == 8 and first[0] == 0xAA:
        f_blk = (first[2] << 8) | first[3]
        f_lon = (first[4] << 8) | first[5]
        last = buf[data_off + (n_phys - 1) * rec_sz:
                   data_off + (n_phys - 1) * rec_sz + 8]
        if len(last) == 8 and last[0] == 0xAA:
            l_blk = (last[2] << 8) | last[3]
            l_lon = (last[4] << 8) | last[5]
            if (f_blk == 0 and f_lon == 0 and l_blk == w - 1
                    and l_lon == w - 1
                    and len(buf) - data_off == w * rec_sz):
                standard = True
            elif (f_blk == 0 and l_lon - f_lon == l_blk - f_blk
                  and len(buf) - data_off == (l_lon - f_lon + 1) * rec_sz):
                col_off = np.full(w, -1, np.int64)
                cols = np.arange(f_lon, l_lon + 1)
                col_off[cols] = data_off + (cols - f_lon) * rec_sz
            else:  # non-sequential: scan every physical record header
                col_off = np.full(w, -1, np.int64)
                for i in range(n_phys):
                    o = data_off + i * rec_sz
                    hdr = buf[o:o + 8]
                    if len(hdr) < 8 or hdr[0] != 0xAA:
                        break
                    lc = (hdr[4] << 8) | hdr[5]
                    if lc < w:
                        col_off[lc] = o

    arr = np.full((h, w), NODATA, np.int16)
    if standard:
        recs = np.frombuffer(
            buf, np.uint8, w * rec_sz, data_off).reshape(w, rec_sz)
        offs = None
    else:
        present = np.nonzero(col_off >= 0)[0] if col_off is not None else \
            np.arange(min(n_phys, w))
        offs = (col_off[present] if col_off is not None
                else data_off + present * rec_sz)
        recs = np.stack([np.frombuffer(buf, np.uint8, rec_sz, int(o))
                         for o in offs]) if len(present) else \
            np.empty((0, rec_sz), np.uint8)

    if verify_checksum and recs.shape[0]:
        sums = recs[:, :8 + h * 2].astype(np.uint32).sum(axis=1)
        stored = recs[:, 8 + h * 2:].astype(np.uint32)
        stored = (stored[:, 0] << 24 | stored[:, 1] << 16
                  | stored[:, 2] << 8 | stored[:, 3])
        bad = np.nonzero(sums != stored)[0]
        if len(bad):
            raise ValueError(
                f"DTED checksum verification failed on {len(bad)} "
                f"record(s), first at physical column {int(bad[0])}")

    if recs.shape[0]:
        hi = recs[:, 8:8 + h * 2:2].astype(np.int32)
        lo = recs[:, 9:9 + h * 2:2].astype(np.int32)
        val = ((hi & 0x7F) << 8) | lo
        neg = (hi & 0x80) != 0
        val = np.where(neg, -val, val)
        # two's-complement repair for out-of-spec producers
        twos = ((hi << 8) | lo).astype(np.uint16).view(np.int16)
        val = np.where(neg & (val < -16000) & (val != NODATA),
                       twos.astype(np.int32), val).astype(np.int16)
        cols = (present if not standard else np.arange(w))
        arr[:, cols] = val[:, ::-1].T  # records run south→north

    level = {121: 0, 1201: 1, 3601: 2}.get(h, -1)
    return arr, DtedInfo(
        w=w, h=h, geotransform=gt, nodata=NODATA, datum=datum,
        level=level, weird=weird,
        projection_wkt=(WKT_WGS84 if datum.upper() != "WGS72"
                        else WKT_WGS72_PREFIX + ",...]"),
        datum_warning=(datum.upper() == "WGS72"),
        partial=col_off is not None,
    )


def _fmt_dms(deg: float, is_lat: bool, deg_digits: int = 3) -> bytes:
    hemi = ("S" if deg < 0 else "N") if is_lat else ("W" if deg < 0 else "E")
    a = abs(deg)
    d = int(np.floor(a + 0.5 / 3600.0))
    rem = a - d
    m = int(np.floor(rem * 60.0 + 0.5 / 60.0))
    rem -= m / 60.0
    s = int(np.floor(rem * 3600.0 + 0.5))
    return f"{d:0{deg_digits}d}{m:02d}{s:02d}{hemi}".encode()


def _put(rec: bytearray, off: int, text: bytes) -> None:
    rec[off:off + len(text)] = text


def write_dted(arr: np.ndarray, ll_lon: float, ll_lat: float) -> bytes:
    """Encode a (h, w) int16 array (row 0 = north) as a DTED cell with
    lower-left corner (ll_lon, ll_lat).  Level is inferred from the
    row count (121→0, 1201→1, 3601→2); the column count must match
    the level's zone-reduced width for the reference latitude
    (dted_create.c:100-130)."""
    arr = np.asarray(arr, np.int16)
    h, w = arr.shape
    level = {121: 0, 1201: 1, 3601: 2}.get(h)
    if level is None:
        raise ValueError(f"rows={h}: not a DTED level (121/1201/3601)")
    ref_lat = -(int(ll_lat) + 1) if ll_lat < 0 else int(ll_lat)
    full = h
    exp_w = full
    if ref_lat >= 80:
        exp_w = (full - 1) // 6 + 1
    elif ref_lat >= 75:
        exp_w = (full - 1) // 4 + 1
    elif ref_lat >= 70:
        exp_w = (full - 1) // 3 + 1
    elif ref_lat >= 50:
        exp_w = (full - 1) // 2 + 1
    if w != exp_w:
        raise ValueError(
            f"cols={w}: DTED level {level} at latitude {ref_lat} "
            f"requires {exp_w} columns")

    uhl = bytearray(b" " * UHL_SIZE)
    _put(uhl, 0, b"UHL1")
    _put(uhl, 4, _fmt_dms(ll_lon, False))
    _put(uhl, 12, _fmt_dms(ll_lat, True))
    _put(uhl, 20, b"%04d" % ((3600 // (w - 1)) * 10))
    _put(uhl, 24, b"%04d" % ((3600 // (h - 1)) * 10))
    _put(uhl, 28, b"NA  ")
    _put(uhl, 32, b"U  ")
    _put(uhl, 47, b"%04d" % w)
    _put(uhl, 51, b"%04d" % h)
    _put(uhl, 55, b"0")

    dsi = bytearray(b" " * DSI_SIZE)
    _put(dsi, 0, b"DSI")
    _put(dsi, 3, b"U")
    _put(dsi, 59, b"DTED%d" % level)
    _put(dsi, 64, b"%015d" % 0)
    _put(dsi, 87, b"01")
    _put(dsi, 89, b"A")
    _put(dsi, 90, b"0000")
    _put(dsi, 94, b"0000")
    _put(dsi, 98, b"0000")
    _put(dsi, 126, b"PRF89020B")
    _put(dsi, 135, b"00")
    _put(dsi, 137, b"0005")
    _put(dsi, 141, b"MSL")
    _put(dsi, 144, b"WGS84")
    lat0 = _fmt_dms(ll_lat, True, 2)
    _put(dsi, 185, lat0[:-1] + b".0" + lat0[-1:])
    lon0 = _fmt_dms(ll_lon, False)
    _put(dsi, 194, lon0[:-1] + b".0" + lon0[-1:])
    _put(dsi, 204, lat0)
    _put(dsi, 211, lon0)
    lat1 = _fmt_dms(ll_lat + 1, True, 2)
    lon1 = _fmt_dms(ll_lon + 1, False)
    _put(dsi, 219, lat1)
    _put(dsi, 226, lon0)
    _put(dsi, 234, lat1)
    _put(dsi, 241, lon1)
    _put(dsi, 249, lat0)
    _put(dsi, 256, lon1)
    _put(dsi, 264, b"0000000.0")
    _put(dsi, 273, b"%04d" % ((3600 // (h - 1)) * 10))
    _put(dsi, 277, b"%04d" % ((3600 // (w - 1)) * 10))
    _put(dsi, 281, b"%04d" % h)
    _put(dsi, 285, b"%04d" % w)
    _put(dsi, 289, b"00")

    acc = bytearray(b" " * ACC_SIZE)
    _put(acc, 0, b"ACC")
    _put(acc, 3, b"NA")
    _put(acc, 7, b"NA")
    _put(acc, 11, b"NA")
    _put(acc, 15, b"NA")
    _put(acc, 55, b"00")

    # profiles: south→north signed magnitude + 32-bit byte-sum checksum
    rec_sz = 12 + h * 2
    recs = np.zeros((w, rec_sz), np.uint8)
    recs[:, 0] = 0xAA
    cols = np.arange(w)
    recs[:, 2] = cols >> 8
    recs[:, 3] = cols & 0xFF
    recs[:, 4] = cols >> 8
    recs[:, 5] = cols & 0xFF
    col_sn = arr[::-1, :].T.astype(np.int32)  # (w, h) south→north
    mag = np.abs(col_sn)
    hi = ((mag >> 8) & 0x7F) | np.where(col_sn < 0, 0x80, 0)
    recs[:, 8:8 + h * 2:2] = hi.astype(np.uint8)
    recs[:, 9:9 + h * 2:2] = (mag & 0xFF).astype(np.uint8)
    sums = recs[:, :8 + h * 2].astype(np.uint32).sum(axis=1)
    recs[:, 8 + h * 2] = (sums >> 24) & 0xFF
    recs[:, 9 + h * 2] = (sums >> 16) & 0xFF
    recs[:, 10 + h * 2] = (sums >> 8) & 0xFF
    recs[:, 11 + h * 2] = sums & 0xFF

    return bytes(uhl) + bytes(dsi) + bytes(acc) + recs.tobytes()
