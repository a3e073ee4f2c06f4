"""ERMapper ERS (.ers header + raw BIL data) codec in NumPy.

Mirrors ``frmts/ers/ersdataset.cpp`` + ``ershdrnode.cpp``:

* header tokenizer with the reference's exact rules
  (``ershdrnode.cpp ReadLine``): ``#`` comments stripped only
  outside quoted strings, ``\\``-escapes inside quotes, ``{ }``
  bracket groups spanning lines (the srtm.ers fixture deliberately
  stresses all three); ``Name Begin`` / ``Name End`` nesting matched
  case-insensitively (the caseinsensitive fixture), dotted-path
  lookups case-insensitive, quoted values stripped on Find;
* cell types Unsigned/Signed 8/16/32-bit + IEEE4/8ByteReal,
  MSBFirst/LSBFirst byte order, HeaderOffset, the data file is
  ``DataFile`` or the .ers name minus extension;
* pixel layout: band-interleaved-by-line — band offset
  ``iBand·item·nCols``, line stride ``item·nBands·nCols``
  (``ersdataset.cpp:1079-1086``);
* georeferencing: Eastings/Northings or DMS Latitude/Longitude
  registration coordinate, Xdimension/Ydimension cell size, shifted
  by the fractional RegistrationCellX/Y (``:1151-1210``);
* NullCellValue nodata, BandId.Value band descriptions, and
  RegionInfo("All") Stats → STATISTICS_MINIMUM/MAXIMUM/MEAN/MEDIAN
  per-band metadata (brace lists indexed by band);
* the writer emits a GDAL-compatible .ers header + raw data pair.

Pinned on the autotest fixtures: srtm.ers checksum 64074 + the exact
published statistics dict, ers_dem.ers 56588 (HeaderOffset 512,
IEEE4ByteReal), 8s.ers Int8, the caseinsensitive band description,
and CreateCopy round trips at 4672/27/21053 (``tests/test_ers.py``).
"""

from __future__ import annotations

import numpy as np

_CELL_TYPES = {
    "unsigned8bitinteger": np.dtype("u1"),
    "signed8bitinteger": np.dtype("i1"),
    "unsigned16bitinteger": np.dtype("u2"),
    "signed16bitinteger": np.dtype("i2"),
    "unsigned32bitinteger": np.dtype("u4"),
    "signed32bitinteger": np.dtype("i4"),
    "ieee4bytereal": np.dtype("f4"),
    "ieee8bytereal": np.dtype("f8"),
}
_CELL_NAMES = {
    "u1": "Unsigned8BitInteger", "i1": "Signed8BitInteger",
    "u2": "Unsigned16BitInteger", "i2": "Signed16BitInteger",
    "u4": "Unsigned32BitInteger", "i4": "Signed32BitInteger",
    "f4": "IEEE4ByteReal", "f8": "IEEE8ByteReal",
}


class ErsNode:
    """One header object: ordered (name, value-or-child) items."""

    def __init__(self):
        self.items: list[tuple[str, object]] = []

    def find(self, path: str, default=None):
        head, _, rest = path.partition(".")
        for name, val in self.items:
            if name.lower() == head.lower():
                if rest:
                    if isinstance(val, ErsNode):
                        got = val.find(rest, None)
                        if got is not None:
                            return got
                    continue
                if isinstance(val, ErsNode):
                    return default
                v = val.strip()
                if v.startswith('"') and v.endswith('"') and len(v) >= 2:
                    return v[1:-1]
                return v
        return default

    def find_node(self, path: str):
        head, _, rest = path.partition(".")
        for name, val in self.items:
            if name.lower() == head.lower() and isinstance(val, ErsNode):
                return val.find_node(rest) if rest else val
        return None


def _read_logical_lines(text: str):
    """ReadLine semantics: strip # comments outside quotes, join lines
    while a { } group is open (quotes may contain escaped chars)."""
    out = []
    raw_lines = text.splitlines()
    i = 0
    while i < len(raw_lines):
        brackets = 0
        in_quote = False
        escaped = False
        acc = ""
        while True:
            line = raw_lines[i] if i < len(raw_lines) else ""
            i += 1
            keep = []
            for ch in line:
                if escaped:
                    escaped = False
                elif ch == '"':
                    in_quote = not in_quote
                elif ch == "{" and not in_quote:
                    brackets += 1
                elif ch == "}" and not in_quote:
                    brackets -= 1
                elif ch == "\\" and in_quote:
                    escaped = True
                elif ch == "#" and not in_quote:
                    break
                keep.append(ch)
            acc += "".join(keep)
            if brackets <= 0 or i >= len(raw_lines):
                break
            acc += "\n"
        out.append(acc)
        if i >= len(raw_lines):
            break
    return out


def parse_ers_header(text: str) -> ErsNode:
    lines = _read_logical_lines(text)
    root = ErsNode()
    stack = [root]
    for line in lines:
        s = line.strip()
        if not s:
            continue
        if "=" in s:
            name, _, val = s.partition("=")
            stack[-1].items.append((name.strip(), val.strip()))
        elif s.lower().endswith(" begin"):
            child = ErsNode()
            stack[-1].items.append((s[:-len(" begin")].strip(), child))
            stack.append(child)
        elif s.lower().endswith(" end"):
            if len(stack) > 1:
                stack.pop()
    return root


def _dms(v: str) -> float:
    parts = v.strip().split(":")
    if len(parts) != 3:
        try:
            return float(v)
        except ValueError:
            return 0.0
    result = (abs(float(parts[0])) + float(parts[1]) / 60.0
              + float(parts[2]) / 3600.0)
    return -result if "-" in v else result


def _stats_list(value) -> list[str]:
    v = value.strip()
    if v.startswith("{") and v.endswith("}"):
        v = v[1:-1]
    return v.split()


def read_ers(header_text: str, data: bytes | None,
             header_only: bool = False):
    """Decode an ERS pair: returns ((h, w) or (h, w, bands) array,
    info).  ``data`` is the companion raw file's content."""
    hdr = parse_ers_header(header_text)
    ds = hdr.find_node("DatasetHeader")
    if ds is None:
        raise ValueError("not an ERS header (no DatasetHeader)")
    w = int(float(ds.find("RasterInfo.NrOfCellsPerLine", "0")))
    h = int(float(ds.find("RasterInfo.NrOfLines", "0")))
    bands = int(float(ds.find("RasterInfo.NrOfBands", "1")))
    if w <= 0 or h <= 0:
        raise ValueError("ERS header lacks raster dimensions")
    cell = ds.find("RasterInfo.CellType", "Unsigned8BitInteger")
    dt = _CELL_TYPES.get(cell.lower())
    if dt is None:
        raise ValueError(f"ERS CellType {cell!r} unsupported")
    big = ds.find("ByteOrder", "MSBFirst").lower() == "msbfirst"
    offset = int(float(ds.find("HeaderOffset", "0")))

    # georeferencing
    gt = None
    xdim = float(ds.find("RasterInfo.CellInfo.Xdimension", "1.0"))
    ydim = float(ds.find("RasterInfo.CellInfo.Ydimension", "1.0"))
    east = ds.find("RasterInfo.RegistrationCoord.Eastings")
    lat = ds.find("RasterInfo.RegistrationCoord.Latitude")
    if east is not None:
        north = ds.find("RasterInfo.RegistrationCoord.Northings", "0")
        gt = [float(east), xdim, 0.0, float(north), 0.0, -ydim]
    elif lat is not None and \
            ds.find("RasterInfo.CellInfo.Xdimension") is not None:
        lon = ds.find("RasterInfo.RegistrationCoord.Longitude", "0")
        gt = [_dms(lon), xdim, 0.0, _dms(lat), 0.0, -ydim]
    if gt is not None:
        cx = float(ds.find("RasterInfo.RegistrationCellX", "0"))
        cy = float(ds.find("RasterInfo.RegistrationCellY", "0"))
        gt[0] -= cx * gt[1]
        gt[3] -= cy * gt[5]
        gt = tuple(gt)

    null = ds.find("RasterInfo.NullCellValue")
    raster = ds.find_node("RasterInfo")
    band_desc = []
    if raster is not None:
        for name, val in raster.items:
            if name.lower() == "bandid" and isinstance(val, ErsNode):
                band_desc.append(val.find("Value", ""))
    # RegionInfo "All" statistics
    stats = {}
    region = None
    if raster is not None:
        for name, val in raster.items:
            if name.lower() == "regioninfo" and isinstance(val, ErsNode):
                if val.find("RegionName", "").lower() == "all" or \
                        region is None:
                    region = val
    if region is not None:
        st = region.find_node("Stats")
        if st is not None:
            for kw, mdkey in [("MinimumValue", "STATISTICS_MINIMUM"),
                              ("MaximumValue", "STATISTICS_MAXIMUM"),
                              ("MeanValue", "STATISTICS_MEAN"),
                              ("MedianValue", "STATISTICS_MEDIAN")]:
                raw = st.find(kw)
                if raw is not None:
                    stats[mdkey] = _stats_list(raw)

    info = {
        "w": w, "h": h, "bands": bands, "dtype": dt.name,
        "byteorder": "big" if big else "little",
        "geotransform": gt,
        "nodata": float(null) if null is not None else None,
        "band_descriptions": band_desc,
        "band_stats": [
            {k: v[b] for k, v in stats.items() if b < len(v)}
            for b in range(bands)],
        "datum": ds.find("CoordinateSpace.Datum", "RAW"),
        "projection": ds.find("CoordinateSpace.Projection", "RAW"),
        "units": ds.find("CoordinateSpace.Units", "METERS"),
        "header_offset": offset,
    }
    if header_only or data is None:
        return None, info

    edt = dt.newbyteorder(">" if big else "<")
    item = dt.itemsize
    flat = np.frombuffer(data, edt, w * h * bands, offset)
    cube = flat.reshape(h, bands, w).transpose(0, 2, 1)  # BIL
    arr = cube[:, :, 0] if bands == 1 else cube
    return arr.copy(), info


def write_ers(arr: np.ndarray, geotransform=None, nodata=None,
              datum: str = "RAW", projection: str = "RAW",
              units: str = "METERS",
              band_descriptions=None) -> tuple[str, bytes]:
    """Encode as (.ers header text, raw BIL data bytes), matching the
    reference writer's field set (LSBFirst output)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, bands = arr.shape
    cell = _CELL_NAMES.get(arr.dtype.str.lstrip("<>=|"))
    if cell is None:
        raise ValueError(f"ERS cannot store dtype {arr.dtype}")
    lines = [
        "DatasetHeader Begin",
        '\tVersion\t\t= "6.0"',
        "\tDataSetType\t= ERStorage",
        "\tDataType\t= Raster",
        "\tByteOrder\t= LSBFirst",
        "\tCoordinateSpace Begin",
        f'\t\tDatum\t\t= "{datum}"',
        f'\t\tProjection\t= "{projection}"',
        "\t\tCoordinateType\t= EN",
        f'\t\tUnits\t\t= "{units}"',
        "\t\tRotation\t= 0:0:0.0",
        "\tCoordinateSpace End",
        "\tRasterInfo Begin",
        f"\t\tCellType\t= {cell}",
    ]
    if nodata is not None:
        lines.append(f"\t\tNullCellValue\t= {nodata:.10g}")
    if geotransform is not None:
        gt = geotransform
        lines += [
            "\t\tCellInfo Begin",
            f"\t\t\tXdimension\t= {abs(gt[1]):.15g}",
            f"\t\t\tYdimension\t= {abs(gt[5]):.15g}",
            "\t\tCellInfo End",
        ]
    lines += [
        f"\t\tNrOfLines\t= {h}",
        f"\t\tNrOfCellsPerLine\t= {w}",
    ]
    if geotransform is not None:
        gt = geotransform
        lines += [
            "\t\tRegistrationCoord Begin",
            f"\t\t\tEastings\t= {gt[0]:.15g}",
            f"\t\t\tNorthings\t= {gt[3]:.15g}",
            "\t\tRegistrationCoord End",
        ]
    lines.append(f"\t\tNrOfBands\t= {bands}")
    for b in range(bands):
        desc = (band_descriptions[b] if band_descriptions
                and b < len(band_descriptions) else f"Band {b + 1}")
        lines += ["\t\tBandId Begin",
                  f'\t\t\tValue\t\t= "{desc}"',
                  "\t\tBandId End"]
    lines += ["\tRasterInfo End", "DatasetHeader End", ""]
    data = np.ascontiguousarray(
        arr.transpose(0, 2, 1)).astype(
            arr.dtype.newbyteorder("<")).tobytes()
    return "\n".join(lines), data
