"""Five classic single-purpose raster formats in NumPy.

* **LAN/GIS** — Erdas 7.x (``frmts/raw/landataset.cpp``): 128-byte
  header, ``HEAD74`` (int32 dims) vs ``HEADER`` (float32 dims)
  magics, byte order sniffed from header byte 8, pixel types 0=8bit
  / 1=4bit (packed nibbles, high first, per-band-per-line) / 2=16bit,
  BIL band layout, center-registered corner floats at 112/116 and
  pixel sizes at 120/124 (``:470-527``), coordinate-system word at
  88.  Read and write.
* **GTX** — NOAA vertical-datum shift grids
  (``frmts/raw/gtxdataset.cpp``): 40-byte big-endian header (south
  lat, west lon, dy, dx doubles + rows/cols int32), Float32 (or
  Float64 by file size) samples stored south-to-north — the band
  reads bottom-up (``:274-300``), half-pixel-shifted geotransform.
  Read and write.
* **DOQ2** — USGS DOQ keyword headers (``frmts/raw/doq2dataset.cpp``):
  ``BEGIN_USGS_DOQ_HEADER`` records with 80-char comment tails,
  SAMPLES_AND_LINES, BYTE_COUNT skip, BIP pixel layout with
  BAND_CONTENT counting, XY_ORIGIN corner-registered geotransform,
  everything else captured as metadata with quoted-token joining.
  Read-only, like the reference.
* **Terragen** — ``TERRAGENTERRAIN `` chunk streams
  (``frmts/terragen/terragendataset.cpp``): SIZE/XPTS/YPTS/SCAL/ALTW
  chunks, Int16 samples bottom-up, band scale SCAL·(heightscale/
  65536) and offset SCAL·baseheight.  Read and write.
* **ISIS2** — USGS ISIS cube version 2
  (``frmts/isis2/isis2dataset.cpp``): ODL label (shared with the
  PDS3 parser) with a ``^QUBE`` record pointer, AXIS_NAME/CORE_ITEMS
  dims, CORE_ITEM_BYTES/TYPE typing (SUN/MSB big-endian vs PC
  little), CORE_BASE/MULTIPLIER scaling and the ``16#…#`` hex-float
  CORE_NULL.  Read-only.

Pinned on the published autotest checksums: fakelan/fakelan4bit 10,
hydroc1.gtx 64183, the DOQ2 row checksums 4201/4010/5820 + exact
geotransform + QUADRANGLE_NAME metadata, terragen float32.ter 1128,
and isis2 arvidson 382 (``tests/test_legacy_formats.py``).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------- LAN

def read_lan(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:6].upper() not in (b"HEAD74", b"HEADER"):
        raise ValueError("not an Erdas LAN/GIS file")
    big = buf[8] == 0  # landataset.cpp:381
    e = ">" if big else "<"
    if buf[:6].upper() == b"HEADER":
        w = int(struct.unpack_from(e + "f", buf, 16)[0])
        h = int(struct.unpack_from(e + "f", buf, 20)[0])
    else:
        w, h = struct.unpack_from(e + "2i", buf, 16)
    pix_type, = struct.unpack_from(e + "h", buf, 6)
    bands, = struct.unpack_from(e + "h", buf, 8)
    coord_sys, = struct.unpack_from(e + "h", buf, 88)
    ulx, uly, pw, ph = struct.unpack_from(e + "4f", buf, 112)

    if pix_type == 0:
        dt, item = np.dtype("u1"), 1
    elif pix_type == 2:
        dt, item = np.dtype(e + "i2"), 2
    elif pix_type == 1:
        dt, item = np.dtype("u1"), None  # 4-bit
    else:
        raise ValueError(f"LAN pixel type {pix_type} unsupported")

    if item is not None:
        flat = np.frombuffer(buf, dt, w * h * bands, 128)
        cube = flat.reshape(h, bands, w).transpose(0, 2, 1)  # BIL
    else:
        # 4-bit: per line per band, w/2 bytes, high nibble first
        cube = np.empty((h, w, bands), np.uint8)
        line_bytes = w // 2
        pos = 128
        for iy in range(h):
            for b in range(bands):
                line = np.frombuffer(buf, np.uint8, line_bytes, pos)
                px = np.empty(w, np.uint8)
                px[0::2] = (line >> 4) & 0x0F
                px[1::2] = line[:w // 2] & 0x0F
                cube[iy, :, b] = px[:w]
                pos += line_bytes
    gt = None
    if pw != 0.0 and ph != 0.0:
        gt = (ulx - pw * 0.5, float(pw), 0.0,
              uly + ph * 0.5, 0.0, -float(ph))
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr.copy(), {
        "w": w, "h": h, "bands": bands, "dtype": dt.name,
        "four_bit": pix_type == 1, "geotransform": gt,
        "coord_sys": int(coord_sys), "magic": buf[:6].decode(),
    }


def write_lan(arr: np.ndarray, geotransform=None) -> bytes:
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    if arr.dtype == np.uint8:
        pix_type = 0
    elif arr.dtype == np.int16:
        pix_type = 2
    else:
        raise ValueError("LAN stores uint8 or int16")
    hdr = bytearray(128)
    hdr[0:6] = b"HEAD74"
    struct.pack_into("<h", hdr, 6, pix_type)
    struct.pack_into("<h", hdr, 8, bands)
    struct.pack_into("<2i", hdr, 16, w, h)
    if geotransform is not None:
        gt = geotransform
        struct.pack_into("<4f", hdr, 112,
                         gt[0] + gt[1] * 0.5, gt[3] + gt[5] * 0.5,
                         gt[1], -gt[5])
    data = np.ascontiguousarray(arr.transpose(0, 2, 1)).astype(
        arr.dtype.newbyteorder("<")).tobytes()
    return bytes(hdr) + data


# ------------------------------------------------------------------- GTX

def read_gtx(buf: bytes) -> tuple[np.ndarray, dict]:
    if len(buf) < 40:
        raise ValueError("not a GTX grid")
    s_lat, w_lon, dy, dx = struct.unpack_from(">4d", buf, 0)
    rows, cols = struct.unpack_from(">2i", buf, 32)
    if rows <= 0 or cols <= 0:
        raise ValueError("invalid GTX dimensions")
    dt = np.dtype(">f4")
    if len(buf) - 40 == 8 * rows * cols:
        dt = np.dtype(">f8")
    flat = np.frombuffer(buf, dt, rows * cols, 40).reshape(rows, cols)
    arr = flat[::-1]  # stored south→north; row 0 = north
    gt = (w_lon - dx * 0.5, dx, 0.0,
          (s_lat + dy * (rows - 1)) + dy * 0.5, 0.0, -dy)
    return arr.copy(), {"w": cols, "h": rows, "dtype": dt.name.lstrip(">"),
                        "geotransform": gt, "nodata": -88.8888}


def write_gtx(arr: np.ndarray, geotransform) -> bytes:
    arr = np.asarray(arr, np.float32)
    h, w = arr.shape
    gt = geotransform
    s_lat = gt[3] + (h - 0.5) * gt[5]
    w_lon = gt[0] + gt[1] * 0.5
    out = struct.pack(">4d", s_lat, w_lon, -gt[5], gt[1])
    out += struct.pack(">2i", h, w)
    out += arr[::-1].astype(">f4").tobytes()
    return out


# ------------------------------------------------------------------- DOQ2

def read_doq2(buf: bytes, header_only: bool = False):
    text_end = buf.find(b"END_USGS_DOQ_HEADER")
    if text_end < 0:
        text_end = buf.find(b"END_USGS_HEADER")
    if not buf.startswith(b"BEGIN_USGS_DOQ_HEADER") or text_end < 0:
        raise ValueError("not a USGS DOQ2 file")
    lines = buf[:text_end].decode("latin-1").splitlines()[1:]
    import shlex

    w = h = 0
    skip = 0
    ulx = uly = 0.0
    res = 0.0
    organization = ""
    band_count = 0
    bytes_per_pixel = 1
    md = {}
    for line in lines:
        try:
            toks = shlex.split(line)
        except ValueError:
            toks = line.split()
        if len(toks) < 2:
            continue
        key = toks[0].upper()
        if key == "SAMPLES_AND_LINES" and len(toks) >= 3:
            w, h = int(toks[1]), int(toks[2])
        elif key == "BYTE_COUNT":
            skip = int(toks[1])
        elif key == "XY_ORIGIN" and len(toks) >= 3:
            ulx, uly = float(toks[1]), float(toks[2])
        elif key == "HORIZONTAL_RESOLUTION":
            res = float(toks[1])
        elif key == "BAND_ORGANIZATION":
            organization = toks[1].upper()
        elif key == "BAND_CONTENT":
            band_count += 1
        elif key == "BITS_PER_PIXEL":
            bytes_per_pixel = int(toks[1]) // 8
        else:
            md[toks[0]] = " ".join(toks[1:])
    if w < 500 or h < 500:
        raise ValueError("implausible DOQ2 dimensions")
    if band_count >= 2:
        bytes_per_pixel *= band_count
    else:
        band_count = bytes_per_pixel
    gt = (ulx, res, 0.0, uly, 0.0, -res) if res else None
    info = {"w": w, "h": h, "bands": band_count,
            "organization": organization, "geotransform": gt,
            "metadata": md, "skip_bytes": skip}
    if header_only:
        return None, info
    avail_rows = min(h, (len(buf) - skip) // (bytes_per_pixel * w))
    raw = np.frombuffer(buf, np.uint8, avail_rows * w * bytes_per_pixel,
                        skip)
    cube = raw.reshape(avail_rows, w, bytes_per_pixel)
    return cube.copy(), info


# --------------------------------------------------------------- Terragen

def read_terragen(buf: bytes) -> tuple[np.ndarray, dict]:
    if buf[:16] != b"TERRAGENTERRAIN ":
        raise ValueError("not a Terragen terrain file")
    pos = 16
    scal = 30.0
    xpts = ypts = None
    size = None
    height_scale = base_height = 0
    data_off = 0
    while pos + 4 <= len(buf):
        tag = buf[pos:pos + 4]
        pos += 4
        if tag == b"SIZE":
            size, = struct.unpack_from("<H", buf, pos)
            pos += 4
            if xpts is None:
                xpts = ypts = size + 1
        elif tag == b"XPTS":
            xpts, = struct.unpack_from("<H", buf, pos)
            pos += 4
        elif tag == b"YPTS":
            ypts, = struct.unpack_from("<H", buf, pos)
            pos += 4
        elif tag == b"SCAL":
            scal = struct.unpack_from("<3f", buf, pos)[1]
            pos += 12
        elif tag == b"CRAD":
            pos += 4
        elif tag == b"CRVM":
            pos += 4
        elif tag == b"ALTW":
            height_scale, base_height = struct.unpack_from("<2h", buf, pos)
            pos += 4
            data_off = pos
            pos += xpts * ypts * 2
        elif tag == b"EOF ":
            break
        else:
            break
    if not xpts or not ypts or not data_off:
        raise ValueError("Terragen file lacks ALTW data")
    flat = np.frombuffer(buf, "<i2", xpts * ypts, data_off)
    arr = flat.reshape(ypts, xpts)[::-1]  # bottom-up rows
    return arr.copy(), {
        "w": int(xpts), "h": int(ypts),
        "scale": scal * height_scale / 65536.0,
        "offset": scal * base_height,
        "geotransform": (0.0, scal, 0.0, ypts * scal, 0.0, -scal),
        "scal": scal, "height_scale": int(height_scale),
        "base_height": int(base_height),
    }


def write_terragen(arr: np.ndarray, scal: float = 30.0,
                   height_scale: int = 65535 // 2,
                   base_height: int = 0) -> bytes:
    arr = np.asarray(arr, np.int16)
    h, w = arr.shape
    out = bytearray(b"TERRAGENTERRAIN ")
    out += b"SIZE" + struct.pack("<H", min(w, h) - 1) + b"\0\0"
    out += b"XPTS" + struct.pack("<H", w) + b"\0\0"
    out += b"YPTS" + struct.pack("<H", h) + b"\0\0"
    out += b"SCAL" + struct.pack("<3f", scal, scal, scal)
    out += b"ALTW" + struct.pack("<2h", height_scale, base_height)
    out += arr[::-1].astype("<i2").tobytes()
    out += b"EOF "
    return bytes(out)


# ------------------------------------------------------------------- SAGA

_SAGA_FORMATS = {
    "bit": np.dtype("u1"), "byte_unsigned": np.dtype("u1"),
    "byte": np.dtype("i1"), "shortint_unsigned": np.dtype("<u2"),
    "shortint": np.dtype("<i2"), "integer_unsigned": np.dtype("<u4"),
    "integer": np.dtype("<i4"), "float": np.dtype("<f4"),
    "double": np.dtype("<f8"),
}
_SAGA_NAMES = {"u1": "BYTE_UNSIGNED", "i1": "BYTE",
               "u2": "SHORTINT_UNSIGNED", "i2": "SHORTINT",
               "u4": "INTEGER_UNSIGNED", "i4": "INTEGER",
               "f4": "FLOAT", "f8": "DOUBLE"}


def read_saga(sgrd_text: str, sdat: bytes,
              header_only: bool = False):
    """SAGA GIS .sgrd/.sdat pair (frmts/saga/sagadataset.cpp): tab
    key=value header, bottom-up rows, node-registered POSITION_X/YMIN."""
    kv = {}
    for line in sgrd_text.splitlines():
        if "=" in line:
            k, _, v = line.partition("=")
            kv[k.strip().upper()] = v.strip()
    w = int(kv.get("CELLCOUNT_X", "0"))
    h = int(kv.get("CELLCOUNT_Y", "0"))
    if w <= 0 or h <= 0:
        raise ValueError("SAGA header lacks CELLCOUNT")
    fmt = kv.get("DATAFORMAT", "FLOAT").lower()
    dt = _SAGA_FORMATS.get(fmt)
    if dt is None:
        raise ValueError(f"SAGA DATAFORMAT {fmt!r} unsupported")
    if kv.get("BYTEORDER_BIG", "FALSE").upper() == "TRUE":
        dt = dt.newbyteorder(">")
    cell = float(kv.get("CELLSIZE", "1"))
    xmin = float(kv.get("POSITION_XMIN", "0"))
    ymin = float(kv.get("POSITION_YMIN", "0"))
    top_to_bottom = kv.get("TOPTOBOTTOM", "FALSE").upper() == "TRUE"
    offset = int(kv.get("DATAFILE_OFFSET", "0"))
    gt = (xmin - cell / 2.0, cell, 0.0,
          ymin + cell * (h - 1) + cell / 2.0, 0.0, -cell)
    info = {"w": w, "h": h, "dtype": np.dtype(dt).base.name,
            "geotransform": gt,
            "nodata": float(kv.get("NODATA_VALUE", "-99999")),
            "z_factor": float(kv.get("Z_FACTOR", "1"))}
    if header_only:
        return None, info
    arr = np.frombuffer(sdat, dt, w * h, offset).reshape(h, w)
    if not top_to_bottom:
        arr = arr[::-1]
    return arr.copy(), info


def write_saga(arr: np.ndarray, geotransform=None,
               nodata: float = -99999.0) -> tuple[str, bytes]:
    arr = np.asarray(arr)
    h, w = arr.shape
    name = _SAGA_NAMES.get(arr.dtype.str.lstrip("<>=|"))
    if name is None:
        raise ValueError(f"SAGA cannot store {arr.dtype}")
    gt = geotransform or (0.0, 1.0, 0.0, float(h), 0.0, -1.0)
    cell = gt[1]
    xmin = gt[0] + cell / 2.0
    ymin = gt[3] + gt[5] * h + (-gt[5]) / 2.0
    hdr = (
        "NAME\t= gdal_spark\nDESCRIPTION\t= \nUNIT\t= \n"
        "DATAFILE_OFFSET\t= 0\n"
        f"DATAFORMAT\t= {name}\n"
        "BYTEORDER_BIG\t= FALSE\n"
        f"POSITION_XMIN\t= {xmin:.10f}\n"
        f"POSITION_YMIN\t= {ymin:.10f}\n"
        f"CELLCOUNT_X\t= {w}\n"
        f"CELLCOUNT_Y\t= {h}\n"
        f"CELLSIZE\t= {cell:.10f}\n"
        "Z_FACTOR\t= 1.000000\n"
        f"NODATA_VALUE\t= {nodata:.6f}\n"
        "TOPTOBOTTOM\t= FALSE\n")
    data = arr[::-1].astype(arr.dtype.newbyteorder("<")).tobytes()
    return hdr, data


# -------------------------------------------------------------------- KRO

def read_kro(buf: bytes) -> tuple[np.ndarray, dict]:
    """KOLOR raw (frmts/raw/krodataset.cpp): 'KRO\\x01' + big-endian
    w/h/depth/ncomp, big-endian pixel-interleaved samples."""
    if buf[:4] != b"KRO\x01":
        raise ValueError("not a KRO file")
    w, h, depth, ncomp = struct.unpack_from(">4i", buf, 4)
    dt = {8: np.dtype(">u1"), 16: np.dtype(">u2"),
          32: np.dtype(">f4")}.get(depth)
    if dt is None:
        raise ValueError(f"KRO depth {depth} unsupported")
    flat = np.frombuffer(buf, dt, w * h * ncomp, 20)
    cube = flat.reshape(h, w, ncomp)
    arr = cube[:, :, 0] if ncomp == 1 else cube
    return arr.copy(), {"w": w, "h": h, "bands": ncomp,
                        "dtype": dt.base.name}


def write_kro(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ncomp = arr.shape
    depth = {np.dtype("u1"): 8, np.dtype("u2"): 16,
             np.dtype("f4"): 32}.get(np.dtype(arr.dtype.str.lstrip("<>=|")))
    if depth is None:
        raise ValueError(f"KRO cannot store {arr.dtype}")
    hdr = b"KRO\x01" + struct.pack(">4i", w, h, depth, ncomp)
    return hdr + np.ascontiguousarray(arr).astype(
        arr.dtype.newbyteorder(">")).tobytes()


# ------------------------------------------------------------------ ISIS2

def read_isis2(buf: bytes) -> tuple[np.ndarray, dict]:
    from gdal_spark.raster.pds import parse_label, _hex_float, _num, _sub

    text = buf[:1024 * 256].decode("latin-1")
    kv = parse_label(text)
    q = kv.get("^QUBE")
    if q is None:
        raise ValueError("not an ISIS2 cube (no ^QUBE)")
    record_bytes = int(_num(kv.get("RECORD_BYTES", "512")))
    n = int(_num(q))
    skip = (n - 1) if "<BYTES>" in q else (n - 1) * record_bytes

    axis = kv.get("QUBE.AXIS_NAME", "").replace(" ", "").upper()
    core = kv.get("QUBE.CORE_ITEMS", "")
    if axis == "(SAMPLE,LINE,BAND)" or axis == "":
        w, h, bands = (int(_sub(core, i, "1")) for i in (1, 2, 3))
        layout = "BSQ"
    elif axis == "(BAND,LINE,SAMPLE)":
        bands, h, w = (int(_sub(core, i, "1")) for i in (1, 2, 3))
        layout = "BIP"
    elif axis == "(SAMPLE,BAND,LINE)":
        w, bands, h = (int(_sub(core, i, "1")) for i in (1, 2, 3))
        layout = "BIL"
    else:
        raise ValueError(f"ISIS2 layout {axis} unsupported")

    item = int(_num(kv.get("QUBE.CORE_ITEM_BYTES", "1")))
    ctype = kv.get("QUBE.CORE_ITEM_TYPE", "").upper()
    little = "PC_" in ctype or "LSB" in ctype or "VAX" in ctype
    if item == 1:
        dt = np.dtype("u1")
    elif item == 2:
        dt = np.dtype("u2" if "UNSIGNED" in ctype else "i2")
    elif item == 4:
        dt = np.dtype("f4")
    else:
        raise ValueError(f"ISIS2 CORE_ITEM_BYTES {item} unsupported")
    edt = dt.newbyteorder("<" if little else ">")

    base = _num(kv.get("QUBE.CORE_BASE", "0.0"))
    mult = _num(kv.get("QUBE.CORE_MULTIPLIER", "1.0"), 1.0)
    null = kv.get("QUBE.CORE_NULL")
    nodata = None
    if null is not None:
        nodata = _hex_float(null)
        if nodata is None:
            nodata = _num(null)

    flat = np.frombuffer(buf, edt, w * h * bands, skip)
    if layout == "BSQ":
        cube = flat.reshape(bands, h, w).transpose(1, 2, 0)
    elif layout == "BIP":
        cube = flat.reshape(h, w, bands)
    else:
        cube = flat.reshape(h, bands, w).transpose(0, 2, 1)
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr.copy(), {
        "w": w, "h": h, "bands": bands, "dtype": dt.name,
        "layout": layout, "scale": mult, "offset": base,
        "nodata": nodata,
        "target": kv.get("QUBE.TARGET_NAME", "").strip('"'),
    }
