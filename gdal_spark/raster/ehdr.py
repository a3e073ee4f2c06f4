"""ESRI .hdr-labelled raw raster (EHdr) codec in NumPy.

Mirrors ``frmts/raw/ehdrdataset.cpp``:

* whitespace key/value ``.hdr`` sidecar: NROWS/NCOLS/NBANDS/NBITS,
  BYTEORDER (``I``/``L`` little, ``M`` big / ``msbfirst``), LAYOUT
  BIL/BIP/BSQ, SKIPBYTES, ULXMAP/ULYMAP (pixel-center) or
  XLLCORNER/YLLCORNER (corner) + XDIM/YDIM or CELLSIZE, NODATA,
  PIXELTYPE SIGNEDINT/FLOAT, MIN/MAX_VALUE (``:1018-1110``);
* type inference when NBITS is absent: file size / pixels → byte
  width, 4 bytes → Float32; ``.flt`` extension → Float32; a negative
  NODATA with unknown pixel type promotes to signed (worldclim
  convention, ``:1145-1182``);
* NBITS 1/2/4 sub-byte packing, MSB-first, rows NOT byte-aligned
  unless TOTALROWBYTES says so (``EHdrRasterBand`` ctor,
  ``:72-131``);
* geotransform: center-registered ULXMAP shifts by half a pixel,
  corner-registered XLLCORNER does not; YLLCORNER converts to the
  top edge via ``yll + nrows*ydim`` (corner) or ``(nrows-1)``
  (center) (``:1320-1351``);
* ``.clr`` color tables (``value r g b`` lines) and ``.stx`` band
  statistics sidecars;
* the writer emits GDAL-compatible BIL + .hdr (and .prj passthrough).

Pinned on the autotest fixtures: float32.bil checksum 27,
ehdr10.bil / ehdr11.flt 8202 (byteorder msbfirst + size-inferred
NBITS), worldclim wc_10m (Int16 promotion via negative NODATA,
min -191), byte/int32 round trips at 4672, rgba16.png band 2 at 2042
(``tests/test_ehdr.py``).
"""

from __future__ import annotations

import numpy as np


def parse_hdr(text: str) -> dict:
    kv = {}
    for line in text.splitlines():
        toks = line.split()
        if len(toks) >= 2:
            kv[toks[0].lower()] = toks[1]
    return kv


def _dtype(kv: dict, ext: str, n_data_bytes: int | None):
    nbits = int(kv["nbits"]) if "nbits" in kv else -1
    pix = kv.get("pixeltype", "N").upper()
    ch = "S" if pix.startswith("SIGNED") else (
        "F" if pix.startswith("FLOAT") else "N")
    ncols = int(kv["ncols"])
    nrows = int(kv["nrows"])
    nbands = int(kv.get("nbands", "1"))
    if nbits == -1 and ch == "N" and n_data_bytes is not None:
        nbytes = n_data_bytes // ncols // nrows // nbands
        if nbytes > 8:
            raise ValueError("EHdr cannot infer NBITS value")
        if nbytes > 0 and nbytes != 3:
            nbits = nbytes * 8
        if nbytes == 4:
            ch = "F"
    if ch == "N" and ext.lower() == "flt":
        ch = "F"
    nodata = kv.get("nodata", kv.get("nodata_value"))
    if nodata is not None and float(nodata) < 0 and ch == "N":
        ch = "S"
    if nbits == 16:
        dt = np.int16 if ch == "S" else np.uint16
    elif nbits == 32:
        dt = (np.int32 if ch == "S"
              else np.float32 if ch == "F" else np.uint32)
    elif 1 <= nbits <= 8:
        dt = np.int8 if ch == "S" else np.uint8
    elif nbits == -1:
        dt, nbits = (np.float32, 32) if ch == "F" else (np.uint8, 8)
    else:
        raise ValueError(f"EHdr NBITS={nbits} unsupported")
    return np.dtype(dt), nbits


def read_ehdr(data: bytes, hdr_text: str, ext: str = "",
              prj_wkt: str | None = None,
              header_only: bool = False) -> tuple[np.ndarray, dict]:
    """Decode to an (h, w) array (1 band) or (h, w, bands), plus
    {geotransform, nodata, dtype, nbits, ...}.  ``header_only``
    skips the pixel read (GDAL tolerates truncated files at the
    dataset level — RawRasterBand ``bTruncatedFileAllowed``)."""
    kv = parse_hdr(hdr_text)
    if "ncols" not in kv or "nrows" not in kv:
        raise ValueError("EHdr header missing NROWS/NCOLS")
    w = int(kv["ncols"])
    h = int(kv["nrows"])
    bands = int(kv.get("nbands", "1"))
    skip = int(kv.get("skipbytes", "0"))
    layout = kv.get("layout", "BIL").upper()
    bo = kv.get("byteorder", "I")[:1].upper()
    big = bo == "M"
    dt, nbits = _dtype(kv, ext, len(data) - skip)

    if header_only:
        cube = np.zeros((h, w, bands), dt)
    elif nbits < 8:
        # sub-byte: bit-packed, rows not byte-aligned by default
        trb = int(kv.get("totalrowbytes", "0"))
        line_bits = trb * 8 if trb > 0 else nbits * w
        bits = np.unpackbits(
            np.frombuffer(data, np.uint8, offset=skip))
        arr = np.zeros((h, w), np.uint8)
        for irow in range(h):
            base = irow * line_bits
            row_bits = bits[base:base + w * nbits].reshape(w, nbits)
            weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.uint8)
            arr[irow] = (row_bits * weights).sum(axis=1)
        cube = arr[:, :, None]
    else:
        edt = dt.newbyteorder(">" if big else "<")
        n = w * h * bands
        flat = np.frombuffer(data, edt, n, skip)
        if layout == "BIP":
            cube = flat.reshape(h, w, bands)
        elif layout == "BSQ":
            cube = flat.reshape(bands, h, w).transpose(1, 2, 0)
        else:  # BIL
            cube = flat.reshape(h, bands, w).transpose(0, 2, 1)

    # georeferencing (ehdrdataset.cpp:1320-1351)
    center = True
    ulx = float(kv.get("ulxmap", kv.get("xllcorner",
                                        kv.get("xllcenter", "0.5"))))
    if "xllcorner" in kv:
        center = False
    xdim = float(kv.get("xdim", kv.get("cellsize", "1.0")))
    ydim = float(kv.get("ydim", kv.get("cellsize", "1.0")))
    if "ulymap" in kv:
        uly = float(kv["ulymap"])
    elif "yllcorner" in kv or "yllcenter" in kv:
        yll = float(kv.get("yllcorner", kv.get("yllcenter")))
        if "yllcorner" in kv:
            center = False
            uly = yll + h * ydim
        else:
            uly = yll + (h - 1) * ydim
    else:
        uly = 0.5
    if (ulx, uly, xdim, ydim) != (0.5, 0.5, 1.0, 1.0):
        if center:
            gt = (ulx - xdim * 0.5, xdim, 0.0, uly + ydim * 0.5, 0.0, -ydim)
        else:
            gt = (ulx, xdim, 0.0, uly, 0.0, -ydim)
    else:
        gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)

    nodata = kv.get("nodata", kv.get("nodata_value"))
    info = {
        "w": w, "h": h, "bands": bands, "geotransform": gt,
        "nodata": float(nodata) if nodata is not None else None,
        "dtype": dt.name, "nbits": nbits, "layout": layout,
        "byteorder": "big" if big else "little",
        "min": float(kv["minvalue"]) if "minvalue" in kv else (
            float(kv["min_value"]) if "min_value" in kv else None),
        "max": float(kv["maxvalue"]) if "maxvalue" in kv else (
            float(kv["max_value"]) if "max_value" in kv else None),
        "projection_wkt": prj_wkt,
        "datum": kv.get("datum"),
        "projection": kv.get("projection"),
    }
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr, info


def parse_clr(text: str) -> np.ndarray:
    """.clr color table → (256, 4) RGBA (value r g b lines)."""
    table = np.zeros((256, 4), np.uint8)
    for line in text.splitlines():
        toks = line.split()
        if len(toks) >= 4:
            v = int(float(toks[0]))
            if 0 <= v < 256:
                table[v] = [int(float(toks[1])), int(float(toks[2])),
                            int(float(toks[3])), 255]
    return table


def write_ehdr(arr: np.ndarray, geotransform=None,
               nodata: float | None = None) -> tuple[bytes, str]:
    """Encode (h, w[, bands]) as BIL data + .hdr text (little-endian),
    GDAL EHdr writer conventions."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    dt = arr.dtype
    if dt == np.float64:
        arr = arr.astype(np.float32)
        dt = arr.dtype
    nbits = dt.itemsize * 8
    pixeltype = ("FLOAT" if dt.kind == "f"
                 else "SIGNEDINT" if dt.kind == "i" else "UNSIGNEDINT")
    data = arr.transpose(0, 2, 1).astype(dt.newbyteorder("<")).tobytes()
    lines = [
        "BYTEORDER      I",
        "LAYOUT         BIL",
        f"NROWS          {h}",
        f"NCOLS          {w}",
        f"NBANDS         {bands}",
        f"NBITS          {nbits}",
        f"BANDROWBYTES   {w * dt.itemsize}",
        f"TOTALROWBYTES  {w * bands * dt.itemsize}",
        f"PIXELTYPE      {pixeltype}",
    ]
    if geotransform is not None:
        gt = geotransform
        lines += [
            f"ULXMAP         {gt[0] + gt[1] * 0.5:.10g}",
            f"ULYMAP         {gt[3] + gt[5] * 0.5:.10g}",
            f"XDIM           {gt[1]:.10g}",
            f"YDIM           {-gt[5]:.10g}",
        ]
    if nodata is not None:
        lines.append(f"NODATA         {nodata:.10g}")
    return data, "\n".join(lines) + "\n"
