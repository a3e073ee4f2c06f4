"""MapInfo MIF/MID (interchange format) reader in NumPy/pure Python.

Mirrors ``ogr/ogrsf_frmts/mitab/mitab_feature_mif.cpp`` +
``mitab_utils.cpp``:

* header: Version / Charset / Delimiter / CoordSys / Columns N +
  typed field defs, then ``Data``;
* geometries: Point (plain/Symbol variants), Line, Pline (inline or
  next-line count, MULTIPLE), Region (multi-ring, rings closed via
  ``TABCloseRing``), Rect, RoundRect (four 45-segment corner arcs,
  counterclockwise from the lower-left, radius halved and clamped to
  the MBR), Ellipse (one 180-point arc → step 2π/179), Arc (2°
  segments, ``numPts = |Δangle|/2 + 1``; the 5- and 7-token
  spellings), Text (geometry = the rotated lower-left corner rule of
  ``mitab_feature_mif.cpp:1840-1866``), MultiPoint, Collection, None;
* ``TABGenerateArc`` replicated exactly — including the duplicated
  final vertex it appends (``mitab_utils.cpp:46-72``);
* style clauses (Pen/Brush/Symbol/Font/Smooth/Center/Spacing/
  Justify/Angle/Label) are consumed; Text Angle feeds the
  lower-left-corner rule;
* .mid rows split on the declared Delimiter with quoted strings,
  typed per the Columns declarations.

Pinned on the autotest golden oracle
``data/mitab/all_geoms.mif.golden.csv`` — every non-style column of
the published WKTs, vertex-exact for the tessellated shapes
(``tests/test_mif.py``).
"""

from __future__ import annotations

import math
import re


def _num(v: float) -> str:
    return f"{float(v):.15g}"


def _arc_points(n: int, cx, cy, rx, ry, a0, a1):
    """TABGenerateArc: n points from a0..a1 plus a duplicate of the
    last (mitab_utils.cpp adds one extra)."""
    if a1 < a0:
        a1 += 2.0 * math.pi
    step = (a1 - a0) / (n - 1.0)
    pts = []
    ang = a0
    for i in range(n):
        ang = a0 + i * step
        pts.append((cx + rx * math.cos(ang), cy + ry * math.sin(ang)))
    pts.append((cx + rx * math.cos(ang), cy + ry * math.sin(ang)))
    return pts


def _close_ring(pts):
    if pts and pts[0] != pts[-1]:
        pts = pts + [pts[0]]
    return pts


def _pts_txt(pts):
    return ",".join(f"{_num(x)} {_num(y)}" for x, y in pts)


_STYLE_WORDS = {"pen", "brush", "symbol", "smooth", "center", "font",
                "spacing", "justify", "angle", "label"}
_GEOM_WORDS = {"point", "line", "pline", "region", "rect", "roundrect",
               "ellipse", "arc", "text", "multipoint", "collection",
               "none"}


class _Lines:
    def __init__(self, lines):
        self.lines = lines
        self.i = 0

    def next(self):
        while self.i < len(self.lines):
            s = self.lines[self.i].strip()
            self.i += 1
            if s:
                return s
        return None

    def peek(self):
        j = self.i
        while j < len(self.lines):
            s = self.lines[j].strip()
            if s:
                return s
            j += 1
        return None

    def push_back(self):
        self.i -= 1
        while self.i > 0 and not self.lines[self.i].strip():
            self.i -= 1


def _tok(line):
    return re.findall(r'"[^"]*"|\S+', line)


def _read_style(lines, collect=None):
    """Consume trailing style clauses; optionally collect Angle."""
    angle = 0.0
    while True:
        nxt = lines.peek()
        if nxt is None:
            break
        w = nxt.split()[0].strip("(").lower()
        w = re.split(r"[(\d]", w)[0] or nxt.split("(")[0].lower()
        first = re.match(r"[A-Za-z]+", nxt)
        word = first.group(0).lower() if first else ""
        if word not in _STYLE_WORDS:
            break
        line = lines.next()
        if word == "angle":
            try:
                angle = float(line.split()[1])
            except (IndexError, ValueError):
                pass
    return angle


def _read_coords(lines, n):
    pts = []
    while len(pts) < n:
        toks = lines.next().split()
        for i in range(0, len(toks) - 1, 2):
            pts.append((float(toks[i]), float(toks[i + 1])))
    return pts


def _read_geometry(lines, first_line):
    toks = _tok(first_line)
    kw = toks[0].lower()
    if kw == "none":
        return None
    if kw == "point":
        x, y = float(toks[1]), float(toks[2])
        _read_style(lines)
        return f"POINT ({_num(x)} {_num(y)})"
    if kw == "line":
        pts = [(float(toks[1]), float(toks[2])),
               (float(toks[3]), float(toks[4]))]
        _read_style(lines)
        return f"LINESTRING ({_pts_txt(pts)})"
    if kw == "pline":
        rest = [t for t in toks[1:]]
        if rest and rest[0].lower() == "multiple":
            n_sections = int(rest[1])
            parts = []
            for _ in range(n_sections):
                n = int(lines.next().split()[0])
                parts.append(_read_coords(lines, n))
            _read_style(lines)
            if len(parts) == 1:
                return f"LINESTRING ({_pts_txt(parts[0])})"
            return ("MULTILINESTRING (("
                    + "),(".join(_pts_txt(p) for p in parts) + "))")
        if rest:
            n = int(rest[0])
        else:
            n = int(lines.next().split()[0])
        pts = _read_coords(lines, n)
        _read_style(lines)
        return f"LINESTRING ({_pts_txt(pts)})"
    if kw == "region":
        n_rings = int(toks[1])
        rings = []
        for _ in range(n_rings):
            n = int(lines.next().split()[0])
            rings.append(_close_ring(_read_coords(lines, n)))
        _read_style(lines)
        body = ",".join(f"({_pts_txt(r)})" for r in rings)
        return f"POLYGON ({body})"
    if kw in ("rect", "roundrect"):
        x0, y0, x1, y1 = (float(v) for v in toks[1:5])
        xmin, xmax = min(x0, x1), max(x0, x1)
        ymin, ymax = min(y0, y1), max(y0, y1)
        radius = None
        if kw == "roundrect":
            if len(toks) >= 6:
                radius = float(toks[5]) / 2.0
            else:
                radius = float(lines.next().split()[0]) / 2.0
        _read_style(lines)
        if kw == "rect" or not radius:
            pts = [(xmin, ymin), (xmax, ymin), (xmax, ymax),
                   (xmin, ymax), (xmin, ymin)]
            return f"POLYGON (({_pts_txt(pts)}))"
        rx = min(radius, (xmax - xmin) / 2.0)
        ry = min(radius, (ymax - ymin) / 2.0)
        ring = []
        ring += _arc_points(45, xmin + rx, ymin + ry, rx, ry,
                            math.pi, 3 * math.pi / 2)
        ring += _arc_points(45, xmax - rx, ymin + ry, rx, ry,
                            3 * math.pi / 2, 2 * math.pi)
        ring += _arc_points(45, xmax - rx, ymax - ry, rx, ry,
                            0.0, math.pi / 2)
        ring += _arc_points(45, xmin + rx, ymax - ry, rx, ry,
                            math.pi / 2, math.pi)
        ring = _close_ring(ring)
        return f"POLYGON (({_pts_txt(ring)}))"
    if kw == "ellipse":
        x0, y0, x1, y1 = (float(v) for v in toks[1:5])
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = abs(x1 - x0) / 2.0, abs(y1 - y0) / 2.0
        _read_style(lines)
        ring = _close_ring(_arc_points(180, cx, cy, rx, ry,
                                       0.0, 2 * math.pi))
        return f"POLYGON (({_pts_txt(ring)}))"
    if kw == "arc":
        x0, y0, x1, y1 = (float(v) for v in toks[1:5])
        if len(toks) >= 7:
            a0, a1 = float(toks[5]), float(toks[6])
        else:
            t2 = lines.next().split()
            a0, a1 = float(t2[0]), float(t2[1])
        _read_style(lines)
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = abs(x1 - x0) / 2.0, abs(y1 - y0) / 2.0
        n = max(2, (int(abs(((a1 + 360.0) - a0) / 2.0) + 1)
                    if a1 < a0 else int(abs((a1 - a0) / 2.0) + 1)))
        pts = _arc_points(n, cx, cy, rx, ry,
                          a0 * math.pi / 180.0, a1 * math.pi / 180.0)
        return f"LINESTRING ({_pts_txt(pts)})"
    if kw == "text":
        if len(toks) >= 2:
            pass
        else:
            lines.next()  # the string itself on the next line
        bbox = lines.next().split()
        x0, y0, x1, y1 = (float(v) for v in bbox[:4])
        xmin, xmax = min(x0, x1), max(x0, x1)
        ymin, ymax = min(y0, y1), max(y0, y1)
        height = ymax - ymin
        angle = _read_style(lines)
        s = math.sin(angle * math.pi / 180.0)
        c = math.cos(angle * math.pi / 180.0)
        if s > 0.0 and c > 0.0:
            px, py = xmin + height * s, ymin
        elif s > 0.0 and c < 0.0:
            px, py = xmax, ymin - height * c
        elif s < 0.0 and c < 0.0:
            px, py = xmax + height * s, ymax
        else:
            px, py = xmin, ymax - height * c
        return f"POINT ({_num(px)} {_num(py)})"
    if kw == "multipoint":
        n = int(toks[1])
        pts = _read_coords(lines, n)
        _read_style(lines)
        return f"MULTIPOINT ({_pts_txt(pts)})"
    if kw == "collection":
        n = int(toks[1])
        parts = []
        for _ in range(n):
            sub = lines.next()
            parts.append(_read_geometry(lines, sub))
        _read_style(lines)
        return ("GEOMETRYCOLLECTION ("
                + ",".join(p for p in parts if p) + ")")
    raise ValueError(f"MIF geometry keyword {toks[0]!r} unsupported")


_TYPE_RE = re.compile(r"(\w+)")


def parse_mif(mif_text: str, mid_text: str | None = None):
    """Parse a MIF (+ optional MID) pair → (features, columns).
    Features are dicts with ``wkt`` (or None) + typed fields."""
    lines = _Lines(mif_text.splitlines())
    delimiter = "\t"
    columns: list[tuple[str, str]] = []
    while True:
        line = lines.next()
        if line is None:
            return [], columns
        low = line.lower()
        if low.startswith("delimiter"):
            m = re.search(r'"(.*)"', line)
            if m:
                delimiter = m.group(1)
        elif low.startswith("columns"):
            n = int(line.split()[1])
            for _ in range(n):
                parts = lines.next().split(None, 1)
                columns.append((parts[0],
                                _TYPE_RE.match(parts[1]).group(1).lower()
                                if len(parts) > 1 else "char"))
        elif low.startswith("data"):
            break

    feats = []
    while True:
        line = lines.next()
        if line is None:
            break
        first = re.match(r"[A-Za-z]+", line)
        if not first or first.group(0).lower() not in _GEOM_WORDS:
            continue
        feats.append({"wkt": _read_geometry(lines, line)})

    if mid_text is not None and columns:
        import csv as _csv
        import io as _io

        rows = list(_csv.reader(
            _io.StringIO(mid_text), delimiter=delimiter,
            doublequote=True))
        rows = [r for r in rows if r]
        for feat, vals in zip(feats, rows):
            for (name, typ), raw in zip(columns, vals):
                raw = raw.strip() if typ != "char" else raw
                if typ in ("integer", "smallint"):
                    try:
                        feat[name] = int(raw)
                    except ValueError:
                        feat[name] = None
                elif typ in ("float", "decimal"):
                    try:
                        feat[name] = float(raw)
                    except ValueError:
                        feat[name] = None
                else:
                    feat[name] = raw
    return feats, columns
