"""Four more single-purpose reference drivers in NumPy.

* **JDEM** — Japanese DEM (``frmts/jdem/jdemdataset.cpp``): 1011-byte
  text header (xsize @23+3, ysize @26+3, DDDMMSS·10 angles at
  29/36/43/50 for the LL/UR corners), records of ``xsize·5 + 9 + 2``
  bytes whose 5-digit fields are heights in 0.1 m (Float32 band);
  geotransform straight from the corner angles.  Pin: fakejdem.mem
  checksum 15.
* **PAux** — PCI .aux labelled raw (``frmts/raw/pauxdataset.cpp``):
  ``AuxilaryTarget`` + ``RawDefinition cols rows bands`` +
  ``ChanDefinition-N: type offset pixoff lineoff [Swapped]`` (the
  reference's quirk: the token ``Swapped`` means NATIVE little
  endian, ``Unswapped`` means big — ``pauxdataset.cpp:660-666``),
  UpLeft/LoRight corner georeferencing.  Pin: small16.raw band 2
  checksum 12816.
* **TIL** — DigitalGlobe tiled product (``frmts/til/``): ``numTiles``
  + per-tile filename/offset keys; tiles are TIFFs decoded with the
  in-repo codec and mosaicked at their offsets.  Pin: testtil.til
  checksum 4672.
* **NDF** — NLAPS/NDF2 (``frmts/raw/ndfdataset.cpp``): ``KEY=VALUE;``
  text header, PIXELS_PER_LINE/LINES_PER_DATA_FILE, BANDn_FILENAME
  raw byte files, UPPER_LEFT_CORNER map coordinates (pixel centers →
  half-pixel-shifted geotransform), PIXEL_SPACING.  Pin: the
  published geotransform (320325.75, 14.25, ...) and the 15620×1
  window checksum 6510.
"""

from __future__ import annotations

import re

import numpy as np


# ------------------------------------------------------------------ JDEM

def _jdem_angle(txt: str) -> float:
    n = int(txt[:7].replace(" ", "0") or "0")
    deg = n // 10000
    mn = (n // 100) % 100
    sec = n % 100
    return deg + mn / 60.0 + sec / 3600.0


def read_jdem(buf: bytes):
    hdr = buf[:1011].decode("latin-1", "replace")
    w = int(hdr[23:26].strip() or 0)
    h = int(hdr[26:29].strip() or 0)
    if w <= 0 or h <= 0:
        raise ValueError("not a JDEM file (bad dimensions)")
    rec = w * 5 + 9 + 2
    arr = np.zeros((h, w), np.float32)
    for row in range(h):
        line = buf[1011 + rec * row:1011 + rec * (row + 1)].decode(
            "latin-1", "replace")
        for i in range(w):
            fld = line[9 + 5 * i:14 + 5 * i].strip()
            arr[row, i] = (int(fld) if fld else 0) * 0.1
    ll_lat = _jdem_angle(hdr[29:36])
    ll_lon = _jdem_angle(hdr[36:43])
    ur_lat = _jdem_angle(hdr[43:50])
    ur_lon = _jdem_angle(hdr[50:57])
    gt = (ll_lon, (ur_lon - ll_lon) / w, 0.0,
          ur_lat, 0.0, -(ur_lat - ll_lat) / h)
    return arr, {"w": w, "h": h, "dtype": "float32",
                 "geotransform": gt}


# ------------------------------------------------------------------ PAux

_PAUX_TYPES = {"8U": "u1", "16U": "u2", "16S": "i2", "32R": "f4"}


def read_paux(aux_text: str, raw: bytes):
    kv = {}
    for line in aux_text.splitlines():
        if ":" in line:
            k, _, v = line.partition(":")
            kv[k.strip()] = v.strip()
    if "AuxilaryTarget" not in kv and "AuxilaryTarget " not in kv:
        if not any(k.startswith("Auxilary") for k in kv):
            raise ValueError("not a PCI .aux header")
    toks = kv.get("RawDefinition", "").split()
    if len(toks) < 3:
        raise ValueError("PAux RawDefinition missing")
    w, h, bands = int(toks[0]), int(toks[1]), int(toks[2])
    out = []
    dtypes = []
    for b in range(1, bands + 1):
        t = kv.get(f"ChanDefinition-{b}", "").split()
        base = _PAUX_TYPES.get(t[0])
        if base is None:
            raise ValueError(f"PAux channel type {t[0]!r} unsupported")
        # "Swapped" == native little endian (pauxdataset.cpp:660)
        endian = "<"
        if len(t) >= 5 and t[4].lower() == "unswapped":
            endian = ">"
        dt = np.dtype(endian + base) if base != "u1" else np.dtype("u1")
        off, pix, line = int(t[1]), int(t[2]), int(t[3])
        band = np.zeros((h, w), dt.base)
        rawb = np.frombuffer(raw, np.uint8)
        for r in range(h):
            start = off + r * line
            row = np.frombuffer(
                rawb[start:start + pix * w].tobytes(), dt)[
                :: pix // dt.itemsize]
            band[r, :len(row)] = row[:w]
        out.append(band)
        dtypes.append(dt.base.name)
    gt = None
    if "UpLeftX" in kv:
        ulx, uly = float(kv["UpLeftX"]), float(kv["UpLeftY"])
        lrx, lry = float(kv["LoRightX"]), float(kv["LoRightY"])
        gt = (ulx, (lrx - ulx) / w, 0.0, uly, 0.0, (lry - uly) / h)
    cube = out[0] if bands == 1 else np.stack(out, axis=-1)
    return cube, {"w": w, "h": h, "bands": bands, "dtypes": dtypes,
                  "geotransform": gt}


# ------------------------------------------------------------------- TIL

def read_til(til_text: str, resolve):
    """DigitalGlobe .til: mosaic the referenced TIFF tiles."""
    kv = dict(re.findall(r"([\w.]+)\s*=\s*\"?([^\";\n]+)\"?", til_text))
    n = int(kv.get("numTiles", "0"))
    if n <= 0:
        raise ValueError("not a TIL file")
    from gdal_spark.raster import tiff

    tiles = []
    maxx = maxy = 0
    for i in range(1, n + 1):
        name = kv[f"TILE_{i}.filename"].strip()
        ulc = int(kv.get(f"TILE_{i}.ULColOffset", "0"))
        ulr = int(kv.get(f"TILE_{i}.ULRowOffset", "0"))
        arr, _ = tiff.decode_full(resolve(name))
        arr = arr.squeeze()
        tiles.append((ulr, ulc, arr))
        maxy = max(maxy, ulr + arr.shape[0])
        maxx = max(maxx, ulc + arr.shape[1])
    first = tiles[0][2]
    shape = (maxy, maxx) + first.shape[2:]
    mosaic = np.zeros(shape, first.dtype)
    for ulr, ulc, arr in tiles:
        mosaic[ulr:ulr + arr.shape[0], ulc:ulc + arr.shape[1]] = arr
    return mosaic, {"w": maxx, "h": maxy, "tiles": n,
                    "dtype": first.dtype.name}


# ------------------------------------------------------------------- NDF

def read_ndf(header_text: str, resolve, header_only: bool = False):
    kv = {}
    for line in header_text.replace(";", "\n").splitlines():
        if "=" in line:
            k, _, v = line.partition("=")
            kv[k.strip()] = v.strip()
    if "PIXELS_PER_LINE" not in kv or "LINES_PER_DATA_FILE" not in kv:
        raise ValueError("not an NLAPS/NDF header")
    w = int(kv["PIXELS_PER_LINE"])
    h = int(kv["LINES_PER_DATA_FILE"])
    bands = int(kv.get("NUMBER_OF_BANDS_IN_VOLUME", "1"))
    spacing = [float(v) for v in
               kv.get("PIXEL_SPACING", "1,1").split(",")[:2]]
    gt = None
    ul = kv.get("UPPER_LEFT_CORNER", "").split(",")
    if len(ul) >= 4:
        # map coordinates are pixel centers → half-pixel shift
        cx, cy = float(ul[2]), float(ul[3])
        gt = (cx - spacing[0] / 2.0, spacing[0], 0.0,
              cy + spacing[1] / 2.0, 0.0, -spacing[1])
    info = {"w": w, "h": h, "bands": bands, "geotransform": gt,
            "dtype": "uint8",
            "band_names": [kv.get(f"BAND{b}_NAME", "")
                           for b in range(1, bands + 1)],
            "projection_number": int(kv.get("USGS_PROJECTION_NUMBER",
                                            "0") or 0),
            "zone": int(kv.get("USGS_MAP_ZONE", "0") or 0)}
    if header_only:
        return None, info
    out = []
    for b in range(1, bands + 1):
        data = resolve(kv[f"BAND{b}_FILENAME"].strip())
        avail_rows = min(h, len(data) // w)
        band = np.zeros((h, w), np.uint8)
        band[:avail_rows] = np.frombuffer(
            data, np.uint8, avail_rows * w).reshape(avail_rows, w)
        out.append(band)
    cube = out[0] if bands == 1 else np.stack(out, axis=-1)
    return cube, info
