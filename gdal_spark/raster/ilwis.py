"""ILWIS raster (.mpr/.mpl ODF + .mp# data) codec in NumPy.

Mirrors ``frmts/ilwis/ilwisdataset.cpp``:

* INI-style object-definition files: ``[Section]`` + ``Key=Value``,
  case-insensitive lookups; ``Map.Size`` is "Rows Cols"
  (``GetRowCol``, ``:319``), data in the same-named ``.mp#`` file,
  one line per block;
* store types Byte/Int/Long/Float/Real →
  UInt8/Int16/Int32/Float32/Float64 (little-endian);
* the ILWIS domain system (``GetILWISInfo``, ``:1455-1545``):
  system value domains (value/count/distance/min1to1/nilto1/noaa/
  perc/radar) trigger ``ReadValueDomainProperties`` — a
  ``Range=lo:hi:step[:offset=r0]`` string picks the most compact
  GDAL type and, for integer store types, raw values convert via
  ``(raw + r0) * step`` with out-of-range → rUNDEF
  (``ValueRange::rValue``); Float/Real stores pass raw values
  through; byte-ish domains (bool/byte/bit/image/colorcmp/...) force
  UInt8; self-created ``.dom`` files are consulted for
  ``Type=DomainValue`` vs class/identifier domains;
* nodata per output type: -1e308 / -2147483647 / -32767 / -1e38
  (``GetNoDataValue``, ``:1922``);
* GeoRefCorners georeferencing with the ``CornersOfCorners``
  half-pixel rule (``:506-538``);
* MapList containers (one ``.mpr`` per band) for multi-band data —
  how the reference's CreateCopy stores RGB;
* the writer emits GDAL-compatible .mpr/.grf/.mp# (+ .mpl) sets.

Pinned on the autotest fixtures: LanduseSmall.mpr checksum 2351
(class domain, Byte store), real_store_value_domain.mpr checksum 350
(Real store + value domain → UInt8 band), and CreateCopy round trips
at 4672 / 23529 / 21053 (``tests/test_ilwis.py``).
"""

from __future__ import annotations

import numpy as np

R_UNDEF = -1e308
I_UNDEF = -2147483647
SH_UNDEF = -32767
FL_UNDEF = np.float32(-1e38)

_STORE_TYPES = {
    "byte": np.dtype("u1"), "int": np.dtype("<i2"),
    "long": np.dtype("<i4"), "float": np.dtype("<f4"),
    "real": np.dtype("<f8"),
}
_STORE_NAMES = {"u1": "Byte", "i2": "Int", "i4": "Long",
                "f4": "Float", "f8": "Real"}
_VALUE_DOMAINS = {"value", "count", "distance", "min1to1", "nilto1",
                  "noaa", "perc", "radar"}
_BYTE_DOMAINS = {"bool", "byte", "bit", "image", "colorcmp",
                 "flowdirection", "hortonratio", "yesno"}
_BAD_DOMAINS = {"color", "none", "coordbuf", "binary", "string"}


def parse_odf(text: str) -> dict:
    """ILWIS object-definition file → {section.key (lower): value}."""
    kv = {}
    section = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1].strip().lower()
        elif "=" in line:
            k, _, v = line.partition("=")
            kv[f"{section}.{k.strip().lower()}"] = v.strip()
    return kv


class ValueRange:
    """ValueRange(sRng) semantics (ilwisdataset.cpp:1978-2124)."""

    def __init__(self, rng: str):
        self.lo = self.hi = self.step = 0.0
        self.r0 = 0.0
        self.raw_undef = 0
        if ":" not in rng:
            return
        txt = rng
        r0 = None
        for marker in (",offset=", ":offset="):
            if marker in txt:
                txt, _, off = txt.partition(marker)
                r0 = float(off)
                break
        parts = txt.split(":")
        self.step = 1.0
        if len(parts) >= 3:
            self.step = float(parts[-1])
            parts = parts[:-1]
        self.lo = float(parts[0])
        self.hi = float(parts[1]) if len(parts) > 1 else self.lo
        # init(): compute storage class to choose r0/raw_undef defaults
        if self.step < 0:
            self.step = 0.0
        if self.step < 1e-06:
            st = "real"
            self.step = 0.0
        else:
            r = (self.hi - self.lo) / self.step + 2
            if r > 2 ** 31 - 1:
                st = "real"
            elif r <= 256:
                st = "byte"
            elif r <= 65536:
                st = "int"
            else:
                st = "long"
        if r0 is not None:
            self.r0 = r0
        else:
            self.r0 = -1.0 if st == "byte" else 0.0
        if st in ("long", "float", "real"):
            self.raw_undef = I_UNDEF
        elif st == "int":
            self.raw_undef = SH_UNDEF
        else:
            self.raw_undef = 0

    def r_value(self, raw: np.ndarray) -> np.ndarray:
        val = (raw.astype(np.float64) + self.r0) * self.step
        if self.lo != self.hi:
            eps = 1e-6 if self.step == 0.0 else self.step / 3.0
            bad = (val - self.lo < -eps) | (val - self.hi > eps)
            val = np.where(bad, R_UNDEF, val)
        val = np.where((raw == I_UNDEF) | (raw == self.raw_undef),
                       R_UNDEF, val)
        return val


def _gdal_dtype_for_range(vr: ValueRange) -> np.dtype:
    lo, hi, step = vr.lo, vr.hi, vr.step
    if float(step).is_integer():
        if lo >= 0 and hi <= 255:
            return np.dtype("u1")
        if lo >= -32768 and hi <= 32767:
            return np.dtype("<i2")
        if lo >= 0 and hi <= 65535:
            return np.dtype("<u2")
        if lo >= -(2 ** 31) and hi <= 2 ** 31 - 1:
            return np.dtype("<i4")
        if lo >= 0 and hi <= 2 ** 32 - 1:
            return np.dtype("<u4")
        return np.dtype("<f8")
    if abs(step) >= 1.19e-7 and abs(lo) <= 3.4e38 and abs(hi) <= 3.4e38:
        return np.dtype("<f4")
    return np.dtype("<f8")


def _nodata_for(dt: np.dtype):
    if dt == np.float64:
        return R_UNDEF
    if dt == np.int32:
        return float(I_UNDEF)
    if dt == np.int16:
        return float(SH_UNDEF)
    if dt == np.float32:
        return float(FL_UNDEF)
    return None


def _read_band(files: dict, mpr_name: str):
    kv = parse_odf(files[mpr_name.lower()].decode("latin-1"))
    store = kv.get("mapstore.type", "").lower()
    dt_store = _STORE_TYPES.get(store)
    if dt_store is None:
        raise ValueError(f"ILWIS store type {store!r} unsupported")
    size = kv.get("map.size", "")
    toks = size.replace(",", " ").replace(";", " ").split()
    if len(toks) < 2:
        raise ValueError("ILWIS Map.Size missing")
    rows, cols = int(toks[0]), int(toks[-1])

    # domain logic
    domain = kv.get("basemap.domain", "").rsplit("/", 1)[-1]
    dom_base = domain.rsplit(".", 1)[0].lower()
    use_range = False
    vr = None
    out_dt = dt_store
    stdomain = ""
    if dom_base in _VALUE_DOMAINS:
        vr = ValueRange(kv.get("basemap.range", ""))
        if vr.step != 0:
            use_range = True
            out_dt = _gdal_dtype_for_range(vr)
        else:
            out_dt = np.dtype("<f4") if store == "float" \
                else np.dtype("<f8")
    elif dom_base in _BYTE_DOMAINS:
        out_dt = np.dtype("u1")
        if dom_base in ("image", "colorcmp"):
            stdomain = dom_base
    elif dom_base in _BAD_DOMAINS:
        raise ValueError(f"Unsupported ILWIS domain type {dom_base!r}")
    else:
        dom_file = files.get(dom_base + ".dom")
        dom_type = ""
        if dom_file is not None:
            dom_kv = parse_odf(dom_file.decode("latin-1"))
            dom_type = dom_kv.get("domain.type", "").lower()
        if dom_type == "domainvalue":
            vr = ValueRange(kv.get("basemap.range", ""))
            if vr.step != 0:
                use_range = True
                out_dt = _gdal_dtype_for_range(vr)
            else:
                out_dt = np.dtype("<f4") if store == "float" \
                    else np.dtype("<f8")
        # class/bool/identifier domains keep the store type

    data_name = kv.get("mapstore.data",
                       mpr_name.rsplit(".", 1)[0] + ".mp#")
    data = files[data_name.lower()]
    raw = np.frombuffer(data, dt_store, rows * cols).reshape(rows, cols)

    if use_range and store in ("byte", "int", "long"):
        vals = vr.r_value(raw)
        arr = vals.astype(out_dt)  # C-cast semantics per SetValue
    else:
        arr = raw.astype(out_dt)

    # georeference
    gt = None
    grf = kv.get("map.georef", "none")
    if grf and grf.lower() != "none":
        grf_base = grf.rsplit(".", 1)[0].lower() + ".grf"
        grf_file = files.get(grf_base)
        if grf_file is not None:
            g = parse_odf(grf_file.decode("latin-1"))
            if g.get("georef.type", "").lower() == "georefcorners":
                minx = float(g.get("georefcorners.minx", "0"))
                miny = float(g.get("georefcorners.miny", "0"))
                maxx = float(g.get("georefcorners.maxx", "0"))
                maxy = float(g.get("georefcorners.maxy", "0"))
                px = (maxx - minx) / cols
                py = (maxy - miny) / rows
                if g.get("georefcorners.cornersofcorners",
                         "").lower() == "yes":
                    gt = (minx, px, 0.0, maxy, 0.0, -py)
                else:
                    gt = (minx - px / 2.0, px, 0.0,
                          maxy + py / 2.0, 0.0, -py)

    info = {
        "w": cols, "h": rows, "dtype": np.dtype(out_dt).name,
        "store_type": store, "domain": dom_base,
        "nodata": (None if stdomain in ("image", "colorcmp")
                   else _nodata_for(np.dtype(out_dt))),
        "geotransform": gt,
    }
    return arr, info


def read_ilwis(files: dict, name: str):
    """Decode an ILWIS map or map list.  ``files`` maps lowercase
    filenames to their bytes; ``name`` is the .mpr or .mpl entry."""
    files = {k.lower(): v for k, v in files.items()}
    text = files[name.lower()].decode("latin-1")
    kv = parse_odf(text)
    if kv.get("ilwis.type", "").lower() == "maplist" or \
            "maplist.maps" in kv:
        n = int(kv.get("maplist.maps", "0"))
        bands = []
        info = None
        for i in range(n):
            member = kv.get(f"maplist.map{i}", "")
            member = member.rsplit("\\", 1)[-1].rsplit("/", 1)[-1]
            if not member.lower().endswith(".mpr"):
                member += ".mpr"
            arr, binfo = _read_band(files, member)
            bands.append(arr)
            info = binfo
        cube = np.stack(bands, axis=-1)
        info = dict(info, bands=n)
        return cube, info
    arr, info = _read_band(files, name)
    return arr, dict(info, bands=1)


def write_ilwis(arr: np.ndarray, base: str = "out",
                geotransform=None) -> dict:
    """Encode as a dict of ILWIS files ({name: str|bytes}).  2-D
    arrays produce base.mpr/.grf/.mp#; 3-D add an .mpl with one .mpr
    per band (the reference CreateCopy layout)."""
    arr = np.asarray(arr)

    def band_files(a2, bname):
        st = _STORE_NAMES.get(a2.dtype.str.lstrip("<>=|"))
        if st is None:
            raise ValueError(f"ILWIS cannot store dtype {a2.dtype}")
        rows, cols = a2.shape
        domain = {"Byte": "Image.dom"}.get(st, "value.dom")
        # Range chosen so ValueRange round-trips the store type
        # exactly (integer step spanning the type for Int/Long, step 0
        # → raw passthrough for Float/Real)
        rng = {
            "Int": "Range=-32768:32767:1.0:offset=0\n",
            "Long": "Range=-2147483646:2147483647:1.0:offset=0\n",
            "Float": "Range=-1e300:1e300:0.0:offset=0\n",
            "Real": "Range=-1e300:1e300:0.0:offset=0\n",
        }.get(st, "")
        mpr = (
            "[Ilwis]\nType=BaseMap\nClass=Raster Map\nVersion=3.1\n\n"
            "[BaseMap]\nType=Map\n"
            f"Domain={domain}\n"
            + rng
            + "\n[Map]\nType=MapStore\n"
            f"Size={rows} {cols}\n"
            f"GeoRef={base}.grf\n\n"
            "[MapStore]\n"
            f"Type={st}\n"
            f"Data={bname}.mp#\n"
            "Structure=Line\nStartOffset=0\nSwapBytes=No\n")
        data = np.ascontiguousarray(a2).astype(
            a2.dtype.newbyteorder("<")).tobytes()
        return mpr, data

    out = {}
    rows, cols = arr.shape[:2]
    if geotransform is not None:
        gt = geotransform
        out[f"{base}.grf"] = (
            "[Ilwis]\nType=GeoRef\nClass=GeoReference Corners\n\n"
            "[GeoRef]\nType=GeoRefCorners\n"
            f"Lines={rows}\nColumns={cols}\n\n"
            "[GeoRefCorners]\nCornersOfCorners=Yes\n"
            f"MinX={gt[0]:.15g}\n"
            f"MinY={gt[3] + rows * gt[5]:.15g}\n"
            f"MaxX={gt[0] + cols * gt[1]:.15g}\n"
            f"MaxY={gt[3]:.15g}\n")
    if arr.ndim == 2:
        mpr, data = band_files(arr, base)
        out[f"{base}.mpr"] = mpr
        out[f"{base}.mp#"] = data
        return out
    nb = arr.shape[2]
    maps = [f"{base}_band_{b + 1}" for b in range(nb)]
    out[f"{base}.mpl"] = (
        "[Ilwis]\nType=MapList\n\n[MapList]\n"
        f"GeoRef={base}.grf\n"
        f"Size={rows} {cols}\n"
        f"Maps={nb}\n"
        + "".join(f"Map{b}={maps[b]}.mpr\n" for b in range(nb)))
    for b in range(nb):
        mpr, data = band_files(arr[:, :, b], maps[b])
        out[f"{maps[b]}.mpr"] = mpr
        out[f"{maps[b]}.mp#"] = data
    return out
