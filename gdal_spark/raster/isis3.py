"""USGS ISIS cube version 3 reader in NumPy.

Mirrors ``frmts/pds/isis3dataset.cpp``:

* PVL labels (``Object = X`` / ``Group = Y`` / ``End_Object`` /
  ``End``), parsed with the shared ODL machinery from the PDS3
  reader (the grammars coincide for the read surface);
* ``IsisCube.Core``: attached cores at 1-based ``StartByte``,
  detached cores via ``^Core``, GeoTIFF-format cores delegated to
  the in-repo TIFF codec;
* ``Format = BandSequential`` raw layout and ``Format = Tile``
  (TileSamples × TileLines tiles, row-major per band);
* ``Pixels``: UnsignedByte / SignedWord / UnsignedWord / Real /
  Double with Lsb/Msb byte order, Base + Multiplier exposed as
  scale/offset (raw DNs are returned, like the reference band);
* ISIS special NULL pixels as nodata (0 / -32768 /
  -3.4028226550889045e38 per type);
* ``Mapping`` georeferencing: UpperLeftCornerX/Y corner coordinates
  + PixelResolution.

Pinned on the published autotest checksums 9978 (detached + the
GeoTIFF-core variant, with the published geotransform) and 42403
(tiled SignedWord unit-test cube), ``tests/test_isis3.py``.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.raster.pds import parse_label, _num

_TYPES = {
    "unsignedbyte": (np.dtype("u1"), 0.0),
    "signedword": (np.dtype("i2"), -32768.0),
    "unsignedword": (np.dtype("u2"), 0.0),
    "real": (np.dtype("f4"), -3.4028226550889045e38),
    "double": (np.dtype("f8"), -3.4028226550889045e38),
}


def read_isis3(buf: bytes, resolve=None, header_only: bool = False):
    text = buf[:1024 * 1024].decode("latin-1", "replace")
    kv = parse_label(text)
    core = "IsisCube.Core."
    if core + "Dimensions.Samples" not in kv:
        raise ValueError("not an ISIS3 cube (no IsisCube.Core)")
    w = int(_num(kv[core + "Dimensions.Samples"]))
    h = int(_num(kv[core + "Dimensions.Lines"]))
    bands = int(_num(kv.get(core + "Dimensions.Bands", "1")))
    ptype = kv.get(core + "Pixels.Type", "UnsignedByte").strip().lower()
    if ptype not in _TYPES:
        raise ValueError(f"ISIS3 pixel type {ptype!r} unsupported")
    dt, nodata = _TYPES[ptype]
    little = kv.get(core + "Pixels.ByteOrder", "Lsb").strip().lower() \
        == "lsb"
    edt = dt.newbyteorder("<" if little else ">")
    base = _num(kv.get(core + "Pixels.Base", "0.0"))
    mult = _num(kv.get(core + "Pixels.Multiplier", "1.0"), 1.0)
    fmt = kv.get(core + "Format", "BandSequential").strip().lower()
    start = int(_num(kv.get(core + "StartByte", "1"), 1.0)) - 1

    gt = None
    m = "IsisCube.Mapping."
    if m + "UpperLeftCornerX" in kv:
        res = _num(kv.get(m + "PixelResolution", "1"))
        gt = (_num(kv[m + "UpperLeftCornerX"]), res, 0.0,
              _num(kv[m + "UpperLeftCornerY"]), 0.0, -res)

    info = {
        "w": w, "h": h, "bands": bands, "dtype": dt.name,
        "format": fmt, "scale": mult, "offset": base,
        "nodata": nodata, "geotransform": gt,
        "target": kv.get("IsisCube.Mapping.TargetName",
                         kv.get("IsisCube.Instrument.TargetName",
                                "")).strip(),
        "projection": kv.get(m + "ProjectionName", "").strip(),
        "detached": kv.get(core + "^Core"),
    }
    if header_only:
        return None, info

    data = buf
    if core + "^Core" in kv:
        name = kv[core + "^Core"].strip().strip('"')
        if resolve is None:
            raise ValueError("detached ISIS3 core needs a resolve "
                             "callback")
        data = resolve(name.rsplit("/", 1)[-1])
        if fmt == "geotiff":
            from gdal_spark.raster import tiff
            arr, _ = tiff.decode_full(data)
            arr = arr.squeeze()
            return arr, info

    if fmt == "tile":
        tw = int(_num(kv.get(core + "TileSamples", "128")))
        th = int(_num(kv.get(core + "TileLines", "128")))
        tpr = (w + tw - 1) // tw
        tpc = (h + th - 1) // th
        tile_px = tw * th
        cube = np.zeros((h, w, bands), dt)
        pos = start
        for b in range(bands):
            for t in range(tpr * tpc):
                ty, tx = divmod(t, tpr)
                tile = np.frombuffer(data, edt, tile_px, pos).reshape(
                    th, tw)
                pos += tile_px * dt.itemsize
                ys = min(th, h - ty * th)
                xs = min(tw, w - tx * tw)
                cube[ty * th:ty * th + ys, tx * tw:tx * tw + xs, b] = \
                    tile[:ys, :xs]
    else:  # BandSequential
        flat = np.frombuffer(data, edt, w * h * bands, start)
        cube = flat.reshape(bands, h, w).transpose(1, 2, 0)
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr.copy(), info


# ------------------------------------------------------------------- VICAR

def parse_vicar_label(buf: bytes):
    """VICAR label → (flat {scope.key: value}, nested json-ish dict).
    Mirrors vicardataset.cpp: LBLSIZE leads; 'quoted' strings with ''
    escapes; (a,b,c) lists; PROPERTY=/TASK= scoping."""
    head = buf[:40].decode("latin-1", "replace")
    if not head.lstrip().startswith("LBLSIZE"):
        raise ValueError("not a VICAR file (no LBLSIZE)")
    lblsize = int(head.split("=", 1)[1].split()[0])
    text = buf[:lblsize].decode("latin-1", "replace")

    def tokens(s):
        i, n = 0, len(s)
        while i < n:
            while i < n and s[i] in " \t\r\n\0":
                i += 1
            if i >= n:
                return
            j = s.index("=", i)
            key = s[i:j].strip()
            i = j + 1
            while i < n and s[i] == " ":
                i += 1
            if i < n and s[i] == "'":
                out = []
                i += 1
                while i < n:
                    if s[i] == "'":
                        if i + 1 < n and s[i + 1] == "'":
                            out.append("'")
                            i += 2
                            continue
                        i += 1
                        break
                    out.append(s[i])
                    i += 1
                yield key, "".join(out), True
            elif i < n and s[i] == "(":
                j = s.index(")", i)
                yield key, s[i + 1:j], "list"
                i = j + 1
            else:
                j = i
                while j < n and s[j] not in " \t\r\n\0":
                    j += 1
                yield key, s[i:j], False
                i = j

    def typed(v):
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            return v

    def list_item(v):
        v = v.strip()
        if v.startswith("'"):
            return v.strip("'").replace("''", "'")
        return typed(v)

    flat = {}
    nested: dict = {}
    scope_kind = scope_name = None
    for key, val, kind in tokens(text):
        if kind == "list":
            value = [list_item(p) for p in val.split(",")]
        elif kind is True:
            value = val
        else:
            value = typed(val)
        if key in ("PROPERTY", "TASK"):
            scope_kind, scope_name = key, str(value)
            nested.setdefault(scope_kind, {}).setdefault(scope_name, {})
            continue
        if key in ("DAT_TIM", "USER"):  # task bookkeeping stays scoped
            pass
        if scope_name is not None:
            nested[scope_kind][scope_name][key] = value
            flat[f"{scope_name}.{key}"] = value
        else:
            nested[key] = value
            flat[key] = value
    return flat, nested, lblsize


_VICAR_FORMATS = {"BYTE": ("u1", 0.0), "HALF": ("<i2", -32768.0),
                  "FULL": ("<i4", 0.0), "REAL": ("<f4", 0.0),
                  "DOUB": ("<f8", 0.0), "WORD": ("<i2", -32768.0),
                  "LONG": ("<i4", 0.0)}


def read_vicar(buf: bytes, header_only: bool = False,
               sample_shift: float = 0.5, line_shift: float = 0.5):
    """Decode a VICAR image (vicardataset.cpp read path): RECSIZE
    records with NBB binary prefixes and NLB binary header records,
    BSQ/BIL/BIP, truncated data padded with zeros like the
    reference."""
    flat, nested, lblsize = parse_vicar_label(buf)
    w = int(flat.get("NS", 0))
    h = int(flat.get("NL", 0))
    bands = int(flat.get("NB", 1))
    if w <= 0 or h <= 0:
        raise ValueError("VICAR label lacks NL/NS")
    fmt = str(flat.get("FORMAT", "BYTE")).upper()
    if fmt not in _VICAR_FORMATS:
        raise ValueError(f"VICAR FORMAT {fmt!r} unsupported")
    dts, nodata = _VICAR_FORMATS[fmt]
    dt = np.dtype(dts)
    if str(flat.get("INTFMT", "LOW")).upper() == "HIGH":
        dt = dt.newbyteorder(">")
    recsize = int(flat.get("RECSIZE", 0))
    nbb = int(flat.get("NBB", 0))
    nlb = int(flat.get("NLB", 0))
    org = str(flat.get("ORG", "BSQ")).upper()

    # georeferencing from the MAP property (same PDS3 default shifts)
    gt = None
    ms = flat.get("MAP.MAP_SCALE")
    if ms is not None:
        xdim = float(ms) * 1000.0
        ydim = -xdim
        ulx = uly = 0.5
        lpo = flat.get("MAP.LINE_PROJECTION_OFFSET")
        spo = flat.get("MAP.SAMPLE_PROJECTION_OFFSET")
        if lpo is not None:
            uly = (float(lpo) + line_shift) * -ydim
        if spo is not None:
            ulx = (float(spo) + sample_shift) * xdim * -1.0
        gt = (ulx, xdim, 0.0, uly, 0.0, ydim)

    scale = offset = None
    if "DTM.DTM_SCALING_FACTOR" in flat:
        scale = float(flat["DTM.DTM_SCALING_FACTOR"])
        offset = float(flat.get("DTM.DTM_OFFSET", 0.0))
        if "DTM.DTM_MISSING_DN" in flat:
            nodata = float(flat["DTM.DTM_MISSING_DN"])
    elif str(flat.get("BLTYPE", "")) == "M94_HRSC":
        scale = float(flat.get("DLRTO8.REFLECTANCE_SCALING_FACTOR",
                               flat.get("HRCAL.REFLECTANCE_SCALING_FACTOR",
                                        1.0)))
        offset = float(flat.get("DLRTO8.REFLECTANCE_OFFSET",
                                flat.get("HRCAL.REFLECTANCE_OFFSET", 0.0)))

    info = {
        "w": w, "h": h, "bands": bands, "dtype": dt.base.name,
        "org": org, "geotransform": gt, "nodata": nodata,
        "scale": scale, "offset": offset, "label": nested,
        "metadata": {k: str(v) for k, v in flat.items()},
    }
    if header_only:
        return None, info

    n_recs = {"BSQ": h * bands, "BIL": h * bands, "BIP": h}[org]
    start = lblsize + nlb * recsize
    item = dt.itemsize
    per_rec = (w * bands if org == "BIP" else w)
    rows = np.zeros((n_recs, per_rec), dt)
    for r in range(n_recs):
        off = start + r * recsize + nbb
        avail = max(0, min(per_rec, (len(buf) - off) // item))
        if avail <= 0:
            continue  # truncated: stays zero, like the reference
        rows[r, :avail] = np.frombuffer(buf, dt, avail, off)
    if org == "BSQ":
        cube = rows.reshape(bands, h, w).transpose(1, 2, 0)
    elif org == "BIL":
        cube = rows.reshape(h, bands, w).transpose(0, 2, 1)
    else:
        cube = rows.reshape(h, w, bands)
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr.copy(), info
