"""RMF — Raster Matrix Format ("Panorama"/"Integratsia" GIS) in NumPy.

Mirrors ``frmts/rmf/``:

* 320-byte header (``rmfdataset.h:57-117``, field offsets
  ``rmfdataset.cpp:1339-1400``): ``RSW\\0`` raster / ``MTW\\0`` DEM /
  ``\\0WSR`` big-endian signatures, version 0x0200 (and 0x0201
  "huge", whose stored offsets scale by 256 —
  ``GetFileOffset``, ``rmfdataset.cpp:2403``);
* tile table of (offset, size) uint32 pairs; offset 0 → null tile
  filled with the header nodata (``ReadTile``,
  ``rmfdataset.cpp:3105-3137``);
* RSW bit depths: 24/32-bit pixel-interleaved with **reversed band
  order** (band 1 reads channel ``nBands - 1`` —
  ``rmfdataset.cpp:273``), 16-bit packed 5-5-5 expanded
  ``(v&0x7c00)>>7 / (v&0x3e0)>>2 / (v&0x1f)<<3``
  (``:300-320``), 8-bit + 4-bit (low nibble first) + 1-bit
  (MSB-first) palette images with an RGB0 color table; MTW depths
  8/16/32/64 → UInt8/Int16/Int32/Float64;
* compression 1 = the Panorama 12-bit hash-table LZW (both
  directions, ``rmflzw.cpp``), 2 = JPEG tiles stored B,G,R
  (``rmfjpeg.cpp:95`` band map {3,2,1}), 32 = the DEM
  differential coder (record header = 3-bit type + 5-bit count,
  extended count byte +32; 4/8/12/16/24/32-bit diffs with
  out-of-range sentinels, ``rmfdem.cpp:30-300``) — both
  directions;
* overview chain via ``nOvrOffset`` sub-headers
  (``OpenOverview``, pinned on the published overview checksums
  32756/51233/3192 of ``overviews.rsw``);
* georeferencing ``(LLX, px, 0, LLY + h*px, 0, -px)``
  (``rmfdataset.cpp:1897-1905``), EPSG code at 132 (pinned 3388),
  MTW elevation min/max/units (0=m 1=dm 2=cm 3=mm) and nodata;
* the writer emits version-correct headers (normal or huge),
  palette/24-bit RSW and MTW cells, NONE/LZW/DEM tile compression
  with the reference's store-raw-if-not-smaller fallback.

Decode pinned on every published autotest checksum in
``tests/test_rmf.py``: byte.rsw 4672, byte-lzw 40503, float64.mtw
4672, rgbsmall [21212/21053/21349], rgbsmall-lzw [40503/41429/40238],
big-endian [7782/8480/4195], t100.mtw 6388, 1bit/4bit fixtures, the
cucled/invalid/corrupted-subheader robustness set, and the JPEG tile
variant checksums.
"""

from __future__ import annotations

import struct

import numpy as np

HEADER_SIZE = 320
SIG_RSW = b"RSW\x00"
SIG_RSW_BE = b"\x00WSR"
SIG_MTW = b"MTW\x00"
VERSION = 0x0200
VERSION_HUGE = 0x0201
HUGE_FACTOR = 256

COMP_NONE = 0
COMP_LZW = 1
COMP_JPEG = 2
COMP_DEM = 32
_COMP_NAMES = {COMP_NONE: "NONE", COMP_LZW: "LZW", COMP_JPEG: "JPEG",
               COMP_DEM: "RMF_DEM"}
_UNITS = {0: "m", 1: "dm", 2: "cm", 3: "mm"}


# ------------------------------------------------------------------- LZW

def _lzw_tables():
    # poCodeTab as parallel arrays: used, next, pred, follower
    used = np.zeros(4096, bool)
    nxt = np.zeros(4096, np.int32)
    pred = np.zeros(4096, np.int32)
    fol = np.zeros(4096, np.int32)
    return used, nxt, pred, fol


def _lzw_hash(pred: int, follow: int) -> int:
    f = follow - 256 if follow >= 128 else follow
    local = ((pred + f) & 0xFFFFFFFF) | 0x0800
    return ((local * local) & 0xFFFFFFFF) >> 6 & 0x0FFF


_NO_PRED = 0xFFFF
_NOT_FND = 0xFFFF


def _lzw_update(tabs, ipred: int, follow: int) -> None:
    used, nxt, pred, fol = tabs
    local = _lzw_hash(ipred, follow)
    nnext = local
    if used[local]:
        while (nnext := int(nxt[local])) != 0:
            local = nnext
        nnext = (local + 101) & 0x0FFF
        while used[nnext]:
            nnext += 1
            if nnext >= 4096:
                nnext = 0
        nxt[local] = nnext
    used[nnext] = True
    nxt[nnext] = 0
    pred[nnext] = ipred
    fol[nnext] = follow


def _lzw_find(tabs, ipred: int, follow: int) -> int:
    used, nxt, pred, fol = tabs
    local = _lzw_hash(ipred, follow)
    while True:
        if pred[local] == ipred and fol[local] == follow:
            return local
        local = int(nxt[local])
        if local <= 0:
            return _NOT_FND


def _lzw_create():
    tabs = _lzw_tables()
    for code in range(256):
        _lzw_update(tabs, _NO_PRED, code)
    return tabs


def lzw_decompress(data: bytes, out_size: int) -> bytes:
    """rmflzw.cpp LZWReadStream: 12-bit codes, mid-square hash table."""
    if len(data) < 2:
        return b""
    used, nxt, pred, fol = tabs = _lzw_create()
    out = bytearray()
    pos = 0
    n = len(data)
    code = (data[pos] << 4) & 0xFF0
    pos += 1
    code += (data[pos] >> 4) & 0x0F
    old = code
    bitsleft = True
    fin = int(fol[code])
    out.append(fin)
    count = 4096 - 256
    while pos < n:
        if bitsleft:
            code = ((data[pos] & 0x0F) << 8) & 0xF00
            pos += 1
            if pos >= n:
                break
            code += data[pos]
            pos += 1
            bitsleft = False
        else:
            code = (data[pos] << 4) & 0xFF0
            pos += 1
            if pos >= n:
                break
            code += (data[pos] >> 4) & 0x0F
            bitsleft = True
        in_code = code
        new_code = False
        last = 0
        if not used[code]:
            code = old
            last = fin
            new_code = True
        stack = []
        while pred[code] != _NO_PRED:
            if len(stack) >= 4096:
                return bytes(out[:0])
            stack.append(int(fol[code]))
            code = int(pred[code])
        if len(out) >= out_size:
            return b""
        fin = int(fol[code])
        out.append(fin)
        if len(stack) > out_size - len(out):
            return b""
        out.extend(reversed(stack))
        if new_code:
            if len(out) >= out_size:
                return b""
            fin = last
            out.append(fin)
        if count > 0:
            count -= 1
            _lzw_update(tabs, old, fin)
        old = in_code
    return bytes(out)


def lzw_compress(data: bytes) -> bytes:
    """rmflzw.cpp LZWWriteStream."""
    if not data:
        return b""
    tabs = _lzw_create()
    out = bytearray()
    tmp = 0
    bitsleft = True

    def put(code):
        nonlocal tmp, bitsleft
        if bitsleft:
            out.append((code >> 4) & 0xFF)
            tmp = code & 0x0F
            bitsleft = False
        else:
            out.append(((tmp << 4) & 0xF0) | ((code >> 8) & 0x0F))
            out.append(code & 0xFF)
            bitsleft = True

    code = _lzw_find(tabs, _NO_PRED, data[0])
    count = 4096 - 256
    for b in data[1:]:
        nxt_code = _lzw_find(tabs, code, b)
        if nxt_code != _NOT_FND:
            code = nxt_code
            continue
        put(code)
        if count > 0:
            count -= 1
            _lzw_update(tabs, code, b)
        code = _lzw_find(tabs, _NO_PRED, b)
    put(code)
    if not bitsleft:
        out.append((tmp << 4) & 0xF0)
    return bytes(out)


# ------------------------------------------------------------------- DEM

_T_OUT, _T_ZERO, _T_I4, _T_I8 = 0x00, 0x20, 0x40, 0x60
_T_I12, _T_I16, _T_I24, _T_I32 = 0x80, 0xA0, 0xC0, 0xE0
_OUT_I32 = -0x80000000


def dem_decompress(data: bytes, out_size: int) -> bytes:
    """rmfdem.cpp DEMDecompress: differential records over int32."""
    vals = np.empty(out_size // 4, np.int32)
    nv = 0
    prev = np.int32(0)
    pos = 0
    n = len(data)
    while pos < n:
        hdr = data[pos]
        pos += 1
        count = hdr & 0x1F
        typ = hdr & 0xE0
        if count == 0:
            if pos >= n:
                break
            count = 32 + data[pos]
            pos += 1
        room = len(vals) - nv
        if typ == _T_ZERO:
            if room < count:
                break
            vals[nv:nv + count] = prev
            nv += count
        elif typ == _T_OUT:
            if room < count:
                break
            vals[nv:nv + count] = _OUT_I32
            nv += count
        elif typ == _T_I4:
            if n - pos < (count + 1) // 2 or room < count:
                break
            nbytes = (count + 1) // 2
            raw = np.frombuffer(data, np.uint8, nbytes, pos)
            codes = np.empty(2 * nbytes, np.int32)
            codes[0::2] = raw & 0x0F
            codes[1::2] = (raw >> 4) & 0x0F
            codes = codes[:count]
            codes[codes > 7] |= ~np.int32(0x0F)
            prev = _dem_apply(vals, nv, codes, -8, prev)
            nv += count
            pos += nbytes if count % 2 else count // 2
            if count % 2 == 0:
                pass
        elif typ == _T_I8:
            if n - pos < count or room < count:
                break
            codes = np.frombuffer(data, np.int8, count, pos).astype(np.int32)
            prev = _dem_apply(vals, nv, codes, -0x80, prev)
            nv += count
            pos += count
        elif typ == _T_I12:
            nbytes = (3 * count + 1) // 2
            if n - pos < nbytes or room < count:
                break
            codes = np.empty(count, np.int32)
            p = pos
            i = 0
            while i < count:
                lo = struct.unpack_from("<h", data, p)[0]
                c = lo & 0x0FFF
                if c > 0x7FF:
                    c |= ~0x0FFF
                codes[i] = c
                p += 1
                i += 1
                if i >= count:
                    p += 1
                    break
                hi = struct.unpack_from("<h", data, p)[0]
                c = (hi >> 4) & 0x0FFF
                if c > 0x7FF:
                    c |= ~0x0FFF
                codes[i] = c
                p += 2
                i += 1
            prev = _dem_apply(vals, nv, codes, -0x800, prev)
            nv += count
            pos = p
        elif typ == _T_I16:
            if n - pos < 2 * count or room < count:
                break
            codes = np.frombuffer(data, "<i2", count, pos).astype(np.int32)
            prev = _dem_apply(vals, nv, codes, -0x8000, prev)
            nv += count
            pos += 2 * count
        elif typ == _T_I24:
            if n - pos < 3 * count or room < count:
                break
            raw = np.frombuffer(data, np.uint8, 3 * count,
                                pos).reshape(count, 3).astype(np.int32)
            codes = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            codes[codes > 0x7FFFFF] |= ~np.int32(0xFFFFFF)
            prev = _dem_apply(vals, nv, codes, -0x800000, prev)
            nv += count
            pos += 3 * count
        elif typ == _T_I32:
            if n - pos < 4 * count or room < count:
                break
            codes = np.frombuffer(data, "<i4", count, pos).astype(np.int32)
            prev = _dem_apply(vals, nv, codes, _OUT_I32, prev)
            nv += count
            pos += 4 * count
    return vals[:nv].astype("<i4").tobytes()


def _dem_apply(vals, nv, codes, out_code, prev):
    """Cumulative diffs with the out-of-range sentinel preserved."""
    out = np.empty(len(codes), np.int64)
    p = int(prev)
    for i, c in enumerate(codes):
        if c == out_code:
            out[i] = _OUT_I32
        else:
            p = (p + int(c)) & 0xFFFFFFFF
            if p >= 0x80000000:
                p -= 0x100000000
            out[i] = p
    vals[nv:nv + len(codes)] = out.astype(np.int32)
    return np.int32(p)


def dem_compress(data: bytes) -> bytes:
    """Valid RMF DEM encoding: per-record narrowest diff width
    (records of <=287 values, extended-count header byte)."""
    vals = np.frombuffer(data, "<i4").astype(np.int64)
    out = bytearray()
    prev = 0
    i = 0
    n = len(vals)
    while i < n:
        # out-of-range run (decoded nodata): TYPE_OUT, iPrev untouched
        # (rmfdem.cpp DEMCompress treats sub-minimum values as OUT)
        if vals[i] == _OUT_I32:
            j = i
            while j < n and vals[j] == _OUT_I32 and j - i < 287:
                j += 1
            count = j - i
            if count <= 31:
                out.append(_T_OUT | count)
            else:
                out.append(_T_OUT)
                out.append(count - 32)
            i = j
            continue
        count = min(287, n - i)
        stop = np.nonzero(vals[i:i + count] == _OUT_I32)[0]
        if len(stop):
            count = int(stop[0])
        chunk = vals[i:i + count]
        diffs = np.diff(np.concatenate(([prev], chunk)))
        # wrap to int32 like AddInt32
        diffs = ((diffs + 0x80000000) % 0x100000000 - 0x80000000)
        amax = int(np.abs(diffs).max()) if count else 0
        if amax == 0:
            typ, width = _T_ZERO, 0
        elif amax <= 7:
            typ, width = _T_I4, 4
        elif amax <= 0x7F:
            typ, width = _T_I8, 8
        elif amax <= 0x7FF:
            typ, width = _T_I12, 12
        elif amax <= 0x7FFF:
            typ, width = _T_I16, 16
        elif amax <= 0x7FFFFF:
            typ, width = _T_I24, 24
        else:
            typ, width = _T_I32, 32
        if count <= 31:
            out.append(typ | count)
        else:
            out.append(typ)
            out.append(count - 32)
        if typ == _T_ZERO:
            pass
        elif width == 4:
            d = diffs.astype(np.int64) & 0x0F
            j = 0
            while j < count:
                b = int(d[j])
                if j + 1 < count:
                    b |= int(d[j + 1]) << 4
                out.append(b)
                j += 2
        elif width == 8:
            out += diffs.astype("<i1").tobytes()
        elif width == 12:
            j = 0
            while j < count:
                c0 = int(diffs[j]) & 0x0FFF
                if j + 1 < count:
                    c1 = int(diffs[j + 1]) & 0x0FFF
                    out.append(c0 & 0xFF)
                    out.append(((c0 >> 8) & 0x0F) | ((c1 & 0x0F) << 4))
                    out.append((c1 >> 4) & 0xFF)
                    j += 2
                else:
                    out.append(c0 & 0xFF)
                    out.append((c0 >> 8) & 0x0F)
                    j += 1
        elif width == 16:
            out += diffs.astype("<i2").tobytes()
        elif width == 24:
            d = diffs.astype(np.int64) & 0xFFFFFF
            arr = np.empty((count, 3), np.uint8)
            arr[:, 0] = d & 0xFF
            arr[:, 1] = (d >> 8) & 0xFF
            arr[:, 2] = (d >> 16) & 0xFF
            out += arr.tobytes()
        else:
            out += diffs.astype("<i4").tobytes()
        prev = int(chunk[-1])
        i += count
    return bytes(out)


# ----------------------------------------------------------------- header

def _parse_header(buf: bytes, off: int) -> dict:
    sig = buf[off:off + 4]
    if sig == SIG_MTW:
        mtw, big = True, False
    elif sig == SIG_RSW_BE:
        mtw, big = False, True
    elif sig == SIG_RSW:
        mtw, big = False, False
    else:
        raise ValueError("not an RMF header")
    e = ">" if big else "<"

    def u32(o):
        return struct.unpack_from(e + "I", buf, off + o)[0]

    def i32(o):
        return struct.unpack_from(e + "i", buf, off + o)[0]

    def f64(o):
        return struct.unpack_from(e + "d", buf, off + o)[0]

    h = {
        "mtw": mtw, "big": big,
        "version": u32(4), "size": u32(8), "ovr_offset": u32(12),
        "user_id": u32(16),
        "name": buf[off + 20:off + 52].split(b"\0")[0].decode(
            "ascii", "replace"),
        "bitdepth": u32(52), "height": u32(56), "width": u32(60),
        "xtiles": u32(64), "ytiles": u32(68),
        "tile_h": u32(72), "tile_w": u32(76),
        "last_tile_h": u32(80), "last_tile_w": u32(84),
        "roi_offset": u32(88), "roi_size": u32(92),
        "clr_offset": u32(96), "clr_size": u32(100),
        "tile_tbl_offset": u32(104), "tile_tbl_size": u32(108),
        "map_type": i32(124), "projection": i32(128), "epsg": i32(132),
        "scale": f64(136), "resolution": f64(144), "pixel_size": f64(152),
        "lly": f64(160), "llx": f64(168),
        "stdp1": f64(176), "stdp2": f64(184),
        "center_long": f64(192), "center_lat": f64(200),
        "compression": buf[off + 208], "mask_type": buf[off + 209],
        "mask_step": buf[off + 210], "frame_flag": buf[off + 211],
        "flags_tbl_offset": u32(212), "flags_tbl_size": u32(216),
        "file_size0": u32(220), "file_size1": u32(224),
        "georef_flag": buf[off + 244], "inverse": buf[off + 245],
        "jpeg_quality": buf[off + 246],
        "elev_min": f64(280), "elev_max": f64(288), "nodata": f64(296),
        "elev_unit": u32(304), "elev_type": buf[off + 308],
        "ext_offset": u32(312), "ext_size": u32(316),
    }
    return h


def _file_off(h: dict, rmf_off: int) -> int:
    if h["version"] >= VERSION_HUGE:
        return rmf_off * HUGE_FACTOR
    return rmf_off


def _dtype_bands(h: dict):
    if not h["mtw"]:
        bd = h["bitdepth"]
        if bd in (16, 24, 32):
            return np.dtype(np.uint8), 3
        if bd in (1, 4, 8):
            return np.dtype(np.uint8), 1
        raise ValueError(f"invalid RSW bit depth {bd}")
    bd = h["bitdepth"]
    dt = {8: np.uint8, 16: np.int16, 32: np.int32, 64: np.float64}.get(bd)
    if dt is None:
        raise ValueError(f"invalid MTW bit depth {bd}")
    return np.dtype(dt), 1


def _read_one(buf: bytes, off: int, jpeg_decode=None):
    h = _parse_header(buf, off)
    dt, bands = _dtype_bands(h)
    w, hgt = h["width"], h["height"]
    tw, th = h["tile_w"], h["tile_h"]
    if tw == 0 or th == 0 or w == 0 or hgt == 0:
        raise ValueError("invalid RMF dimensions")
    xtiles = (w + tw - 1) // tw
    ytiles = (hgt + th - 1) // th
    e = ">" if h["big"] else "<"
    tbl_off = _file_off(h, h["tile_tbl_offset"])
    n_entries = h["tile_tbl_size"] // 4
    tiles = np.frombuffer(buf, e + "u4", n_entries, tbl_off)

    palette = None
    if not h["mtw"] and h["bitdepth"] in (1, 4, 8):
        nclr = 1 << h["bitdepth"]
        co = _file_off(h, h["clr_offset"])
        raw = np.frombuffer(buf, np.uint8, nclr * 4, co).reshape(nclr, 4)
        palette = np.zeros((nclr, 4), np.uint8)
        palette[:, :3] = raw[:, :3]
        palette[:, 3] = 255

    comp = h["compression"]
    bd = h["bitdepth"]
    cube = np.zeros((hgt, w, bands), dt)
    nodata = h["nodata"]

    for ty in range(ytiles):
        for tx in range(xtiles):
            itile = ty * xtiles + tx
            if 2 * itile + 1 >= n_entries:
                raise ValueError("tile index beyond tile table")
            t_off = _file_off(h, int(tiles[2 * itile]))
            t_bytes = int(tiles[2 * itile + 1])
            raw_x = tw if not (h["last_tile_w"] and tx == xtiles - 1) \
                else h["last_tile_w"]
            raw_y = th if not (h["last_tile_h"] and ty == ytiles - 1) \
                else h["last_tile_h"]
            raw_bytes = raw_x * raw_y * bd // 8
            y0, x0 = ty * th, tx * tw
            view = cube[y0:y0 + raw_y, x0:x0 + raw_x]
            if t_off == 0:
                view[:] = np.asarray(nodata).astype(dt)
                continue
            if t_bytes >= 2 * tw * th * bd // 8:
                raise ValueError("invalid tile size")
            data = buf[t_off:t_off + t_bytes]
            if comp == COMP_JPEG and t_bytes != raw_bytes:
                if jpeg_decode is None:
                    from gdal_spark.raster import jpeg as _jpeg
                    jpeg_decode = lambda b: _jpeg.decode(b)  # noqa: E731
                rgb = np.asarray(jpeg_decode(bytes(data)))
                if rgb.ndim == 2:
                    rgb = np.stack([rgb] * 3, axis=-1)
                tile = rgb[:raw_y, :raw_x, ::-1]  # store as B,G,R
                raw = tile.reshape(raw_y, raw_x * 3).astype(np.uint8)
                data = raw.tobytes()
            elif comp == COMP_LZW and t_bytes != raw_bytes:
                data = lzw_decompress(data, raw_bytes)
            elif comp == COMP_DEM and t_bytes != raw_bytes:
                data = dem_decompress(data, raw_bytes)
            if len(data) != raw_bytes:
                raise ValueError(
                    f"tile {itile}: got {len(data)} bytes, "
                    f"expected {raw_bytes}")
            if h["mtw"]:
                arr = np.frombuffer(data, dt.newbyteorder("<"),
                                    raw_x * raw_y).reshape(raw_y, raw_x)
                view[:, :, 0] = arr
            elif bd == 24 or bd == 32:
                step = bd // 8
                arr = np.frombuffer(data, np.uint8).reshape(
                    raw_y, raw_x, step)
                # reversed band order: band k reads channel bands-k
                for b in range(3):
                    view[:, :, b] = arr[:, :, 2 - b]
            elif bd == 16:
                v = np.frombuffer(data, e + "u2").reshape(raw_y, raw_x)
                view[:, :, 0] = ((v & 0x7C00) >> 7).astype(np.uint8)
                view[:, :, 1] = ((v & 0x03E0) >> 2).astype(np.uint8)
                view[:, :, 2] = ((v & 0x001F) << 3).astype(np.uint8)
            elif bd == 8:
                view[:, :, 0] = np.frombuffer(
                    data, np.uint8).reshape(raw_y, raw_x)
            elif bd == 4:
                if t_bytes == raw_bytes and len(data) != (tw * th + 1) // 2:
                    pass
                line_sz = 4 * raw_x // 8
                raw8 = np.frombuffer(data, np.uint8)
                for iy in range(raw_y):
                    line = raw8[iy * line_sz:]
                    px = np.empty(raw_x, np.uint8)
                    need = (raw_x + 1) // 2
                    pair = line[:need]
                    px[0::2] = pair[:len(px[0::2])] & 0x0F
                    hi = (pair >> 4) & 0x0F
                    px[1::2] = hi[:len(px[1::2])]
                    view[iy, :, 0] = px
            elif bd == 1:
                line_sz = raw_x // 8
                raw8 = np.frombuffer(data, np.uint8)
                for iy in range(raw_y):
                    line = raw8[iy * line_sz:iy * line_sz
                                + (raw_x + 7) // 8]
                    bits = np.unpackbits(line)[:raw_x]
                    view[iy, :, 0] = bits
            else:
                raise ValueError(f"invalid block data type bd={bd}")

    gt = None
    if (not h["mtw"] and h["georef_flag"]) or (
            h["mtw"] and h["pixel_size"] != 0.0):
        px = h["pixel_size"]
        gt = (h["llx"], px, 0.0, h["lly"] + hgt * px, 0.0, -px)

    info = {
        "w": w, "h": hgt, "bands": bands, "dtype": dt.name,
        "mtw": h["mtw"], "big_endian": h["big"],
        "compression": _COMP_NAMES.get(comp, str(comp)),
        "geotransform": gt, "epsg": h["epsg"],
        "nodata": nodata, "palette": palette,
        "version": h["version"],
        "elev_min": h["elev_min"], "elev_max": h["elev_max"],
        "elev_unit": _UNITS.get(h["elev_unit"], ""),
        "name": h["name"], "ovr_offset": h["ovr_offset"],
        "map_type": h["map_type"], "projection": h["projection"],
        "scale": h["scale"],
        "nbits": bd if (bands == 1 and bd < 8) else (
            5 if (bd == 16 and bands == 3) else None),
    }
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr, info, h


def read_rmf(buf: bytes, jpeg_decode=None) -> tuple[np.ndarray, dict]:
    """``jpeg_decode`` overrides the tile JPEG decoder (the tests pin
    the published GDAL checksums by plugging the system libjpeg in —
    the in-repo codec differs only in IDCT rounding)."""
    arr, info, _ = _read_one(buf, 0, jpeg_decode=jpeg_decode)
    return arr, info


def read_rmf_overviews(buf: bytes) -> list[tuple[np.ndarray, dict]]:
    """The overview chain (rmfdataset.cpp Open loop, max 64)."""
    out = []
    arr, info, h = _read_one(buf, 0)
    seen = {0}
    nxt = _file_off(h, h["ovr_offset"]) if h["ovr_offset"] else 0
    while nxt and nxt not in seen and len(out) < 64:
        seen.add(nxt)
        arr_o, info_o, h_o = _read_one(buf, nxt)
        out.append((arr_o, info_o))
        nxt = _file_off(h_o, h_o["ovr_offset"]) if h_o["ovr_offset"] else 0
    return out


# ----------------------------------------------------------------- writer

def write_rmf(arr: np.ndarray, pixel_size: float = 0.0, llx: float = 0.0,
              lly: float = 0.0, mtw: bool = False, huge: bool = False,
              compression: str = "NONE", palette: np.ndarray | None = None,
              nodata: float = 0.0, epsg: int = 0,
              elevation_unit: str = "m",
              tile_size: tuple[int, int] = (256, 256)) -> bytes:
    """Encode as RSW (uint8 1- or 3-band) or MTW (uint8/int16/int32/
    float64 single band); compression NONE / LZW / RMF_DEM (DEM only
    for 32-bit MTW, like the reference)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        hgt, w = arr.shape
        bands = 1
    else:
        hgt, w, bands = arr.shape
    if mtw:
        if bands != 1:
            raise ValueError("MTW is single band")
        dt = arr.dtype
        bd = {np.dtype(np.uint8): 8, np.dtype(np.int16): 16,
              np.dtype(np.int32): 32, np.dtype(np.float64): 64}.get(dt)
        if bd is None:
            raise ValueError(f"MTW cannot store dtype {dt}")
        sig = SIG_MTW
    else:
        if arr.dtype != np.uint8:
            raise ValueError("RSW stores uint8")
        bd = 8 if bands == 1 else 24
        sig = SIG_RSW
    comp = {"NONE": COMP_NONE, "LZW": COMP_LZW,
            "RMF_DEM": COMP_DEM}[compression]
    if comp == COMP_DEM and not (mtw and bd == 32):
        raise ValueError("RMF_DEM compression requires 32-bit MTW")

    tw, th = tile_size
    xtiles = (w + tw - 1) // tw
    ytiles = (hgt + th - 1) // th
    last_w = w % tw
    last_h = hgt % th

    factor = HUGE_FACTOR if huge else 1

    def align(n):
        return (n + factor - 1) // factor * factor

    pos = align(HEADER_SIZE)
    clr_off = clr_size = 0
    clr_bytes = b""
    if not mtw and bands == 1:
        pal = palette if palette is not None else np.stack(
            [np.arange(256, dtype=np.uint8)] * 3
            + [np.zeros(256, np.uint8)], axis=1)
        clr_off, clr_size = pos, pal.shape[0] * 4
        buf4 = np.zeros((pal.shape[0], 4), np.uint8)
        buf4[:, :3] = pal[:, :3]
        clr_bytes = buf4.tobytes()
        pos = align(pos + clr_size)

    tbl_off = pos
    tbl_size = xtiles * ytiles * 8
    pos = align(tbl_off + tbl_size)

    tile_entries = []
    tile_blobs = []
    for ty in range(ytiles):
        for tx in range(xtiles):
            raw_x = last_w if (last_w and tx == xtiles - 1) else tw
            raw_y = last_h if (last_h and ty == ytiles - 1) else th
            y0, x0 = ty * th, tx * tw
            t = arr[y0:y0 + raw_y, x0:x0 + raw_x]
            if mtw:
                raw = np.ascontiguousarray(t).astype(
                    np.dtype(arr.dtype).newbyteorder("<")).tobytes()
            elif bands == 3:
                raw = np.ascontiguousarray(t[:, :, ::-1]).tobytes()  # BGR
            else:
                raw = np.ascontiguousarray(t).tobytes()
            blob = raw
            if comp == COMP_LZW:
                c = lzw_compress(raw)
                if 0 < len(c) < len(raw):
                    blob = c
            elif comp == COMP_DEM:
                c = dem_compress(raw)
                if 0 < len(c) < len(raw):
                    blob = c
            tile_entries.append((pos // factor, len(blob)))
            tile_blobs.append((pos, blob))
            pos = align(pos + len(blob))

    total = pos
    out = bytearray(total)
    hdr = bytearray(HEADER_SIZE)
    hdr[0:4] = sig
    struct.pack_into("<I", hdr, 4, VERSION_HUGE if huge else VERSION)
    struct.pack_into("<I", hdr, 8, total)
    struct.pack_into("<I", hdr, 12, 0)   # no overviews
    hdr[20:20 + 10] = b"gdal_spark"
    struct.pack_into("<I", hdr, 52, bd)
    struct.pack_into("<I", hdr, 56, hgt)
    struct.pack_into("<I", hdr, 60, w)
    struct.pack_into("<I", hdr, 64, xtiles)
    struct.pack_into("<I", hdr, 68, ytiles)
    struct.pack_into("<I", hdr, 72, th)
    struct.pack_into("<I", hdr, 76, tw)
    struct.pack_into("<I", hdr, 80, last_h)
    struct.pack_into("<I", hdr, 84, last_w)
    struct.pack_into("<I", hdr, 96, clr_off // factor)
    struct.pack_into("<I", hdr, 100, clr_size)
    struct.pack_into("<I", hdr, 104, tbl_off // factor)
    struct.pack_into("<I", hdr, 108, tbl_size)
    struct.pack_into("<i", hdr, 132, epsg)
    struct.pack_into("<d", hdr, 152, pixel_size)
    struct.pack_into("<d", hdr, 160, lly)
    struct.pack_into("<d", hdr, 168, llx)
    hdr[208] = comp
    hdr[244] = 1 if (pixel_size != 0.0 and not mtw) else 0
    valid = arr[arr != nodata] if mtw else arr
    struct.pack_into("<d", hdr, 280,
                     float(valid.min()) if valid.size else 0.0)
    struct.pack_into("<d", hdr, 288,
                     float(valid.max()) if valid.size else 0.0)
    struct.pack_into("<d", hdr, 296, nodata)
    unit_code = {v: k for k, v in _UNITS.items()}.get(elevation_unit, 0)
    struct.pack_into("<I", hdr, 304, unit_code)
    out[0:HEADER_SIZE] = hdr
    if clr_bytes:
        out[clr_off:clr_off + len(clr_bytes)] = clr_bytes
    tbl = np.array(tile_entries, "<u4").tobytes()
    out[tbl_off:tbl_off + len(tbl)] = tbl
    for off, blob in tile_blobs:
        out[off:off + len(blob)] = blob
    return bytes(out)
