"""AutoCAD DXF (ASCII) reader.

Mirrors ``ogr/ogrsf_frmts/dxf/`` (the reader surface):

* group-code/value pair stream, HEADER / TABLES / BLOCKS / ENTITIES
  sections; the single ``entities`` layer with the reference's six
  fields (Layer, PaperSpace, SubClasses, Linetype, EntityHandle,
  Text);
* entities: POINT, LINE, LWPOLYLINE (bulge arcs, closed flag),
  POLYLINE/VERTEX/SEQEND, CIRCLE, ARC (CCW degrees), ELLIPSE
  (center + major-axis vector + ratio + start/end parameters),
  TEXT/MTEXT (position point + text with continuation groups),
  SOLID/3DFACE (corner order 1-2-4-3), INSERT (block expansion with
  translate/scale/rotate, one output feature per block entity — the
  reference's DXF_INLINE_BLOCKS default) and DIMENSION (rendered by
  expanding its group-2 anonymous block);
* curves linearized with OGR's 4° default step
  (``OGR_ARC_STEPSIZE``), geometries always 2.5-D like the
  reference's wkb*25D types;
* layer colors from the AutoCAD Color Index via the TABLES section
  (entity group 62 overrides), exposed as ``color`` (hex) so the
  PEN/LABEL style pins hold.

Pinned on ``autotest/ogr/ogr_dxf.py`` tests 1-7 over assorted.dxf:
feature count 22, the ellipse/partial-ellipse/arc envelope areas and
first points, field values (SubClasses, EntityHandle, Linetype), the
POINT layer color #ffbeb8 and the MTEXT label attributes
(``tests/test_dxf.py``).
"""

from __future__ import annotations

import math

# The AutoCAD Color Index table, reproduced from the reference's
# abyDXFColors (ogr_autocad_services.cpp:220) - format constants.
ACI_TABLE = [
    (0, 0, 0), (255, 0, 0), (255, 255, 0), (0, 255, 0),
    (0, 255, 255), (0, 0, 255), (255, 0, 255), (0, 0, 0),
    (127, 127, 127), (191, 191, 191), (255, 0, 0), (255, 127, 127),
    (165, 0, 0), (165, 82, 82), (127, 0, 0), (127, 63, 63),
    (76, 0, 0), (76, 38, 38), (38, 0, 0), (38, 19, 19),
    (255, 63, 0), (255, 159, 127), (165, 41, 0), (165, 103, 82),
    (127, 31, 0), (127, 79, 63), (76, 19, 0), (76, 47, 38),
    (38, 9, 0), (38, 23, 19), (255, 127, 0), (255, 191, 127),
    (165, 82, 0), (165, 124, 82), (127, 63, 0), (127, 95, 63),
    (76, 38, 0), (76, 57, 38), (38, 19, 0), (38, 28, 19),
    (255, 191, 0), (255, 223, 127), (165, 124, 0), (165, 145, 82),
    (127, 95, 0), (127, 111, 63), (76, 57, 0), (76, 66, 38),
    (38, 28, 0), (38, 33, 19), (255, 255, 0), (255, 255, 127),
    (165, 165, 0), (165, 165, 82), (127, 127, 0), (127, 127, 63),
    (76, 76, 0), (76, 76, 38), (38, 38, 0), (38, 38, 19),
    (191, 255, 0), (223, 255, 127), (124, 165, 0), (145, 165, 82),
    (95, 127, 0), (111, 127, 63), (57, 76, 0), (66, 76, 38),
    (28, 38, 0), (33, 38, 19), (127, 255, 0), (191, 255, 127),
    (82, 165, 0), (124, 165, 82), (63, 127, 0), (95, 127, 63),
    (38, 76, 0), (57, 76, 38), (19, 38, 0), (28, 38, 19),
    (63, 255, 0), (159, 255, 127), (41, 165, 0), (103, 165, 82),
    (31, 127, 0), (79, 127, 63), (19, 76, 0), (47, 76, 38),
    (9, 38, 0), (23, 38, 19), (0, 255, 0), (127, 255, 127),
    (0, 165, 0), (82, 165, 82), (0, 127, 0), (63, 127, 63),
    (0, 76, 0), (38, 76, 38), (0, 38, 0), (19, 38, 19),
    (0, 255, 63), (127, 255, 159), (0, 165, 41), (82, 165, 103),
    (0, 127, 31), (63, 127, 79), (0, 76, 19), (38, 76, 47),
    (0, 38, 9), (19, 38, 23), (0, 255, 127), (127, 255, 191),
    (0, 165, 82), (82, 165, 124), (0, 127, 63), (63, 127, 95),
    (0, 76, 38), (38, 76, 57), (0, 38, 19), (19, 38, 28),
    (0, 255, 191), (127, 255, 223), (0, 165, 124), (82, 165, 145),
    (0, 127, 95), (63, 127, 111), (0, 76, 57), (38, 76, 66),
    (0, 38, 28), (19, 38, 33), (0, 255, 255), (127, 255, 255),
    (0, 165, 165), (82, 165, 165), (0, 127, 127), (63, 127, 127),
    (0, 76, 76), (38, 76, 76), (0, 38, 38), (19, 38, 38),
    (0, 191, 255), (127, 223, 255), (0, 124, 165), (82, 145, 165),
    (0, 95, 127), (63, 111, 127), (0, 57, 76), (38, 66, 76),
    (0, 28, 38), (19, 33, 38), (0, 127, 255), (127, 191, 255),
    (0, 82, 165), (82, 124, 165), (0, 63, 127), (63, 95, 127),
    (0, 38, 76), (38, 57, 76), (0, 19, 38), (19, 28, 38),
    (0, 63, 255), (127, 159, 255), (0, 41, 165), (82, 103, 165),
    (0, 31, 127), (63, 79, 127), (0, 19, 76), (38, 47, 76),
    (0, 9, 38), (19, 23, 38), (0, 0, 255), (127, 127, 255),
    (0, 0, 165), (82, 82, 165), (0, 0, 127), (63, 63, 127),
    (0, 0, 76), (38, 38, 76), (0, 0, 38), (19, 19, 38),
    (63, 0, 255), (159, 127, 255), (41, 0, 165), (103, 82, 165),
    (31, 0, 127), (79, 63, 127), (19, 0, 76), (47, 38, 76),
    (9, 0, 38), (23, 19, 38), (127, 0, 255), (191, 127, 255),
    (82, 0, 165), (124, 82, 165), (63, 0, 127), (95, 63, 127),
    (38, 0, 76), (57, 38, 76), (19, 0, 38), (28, 19, 38),
    (191, 0, 255), (223, 127, 255), (124, 0, 165), (145, 82, 165),
    (95, 0, 127), (111, 63, 127), (57, 0, 76), (66, 38, 76),
    (28, 0, 38), (33, 19, 38), (255, 0, 255), (255, 127, 255),
    (165, 0, 165), (165, 82, 165), (127, 0, 127), (127, 63, 127),
    (76, 0, 76), (76, 38, 76), (38, 0, 38), (38, 19, 38),
    (255, 0, 191), (255, 127, 223), (165, 0, 124), (165, 82, 145),
    (127, 0, 95), (127, 63, 111), (76, 0, 57), (76, 38, 66),
    (38, 0, 28), (38, 19, 33), (255, 0, 127), (255, 127, 191),
    (165, 0, 82), (165, 82, 124), (127, 0, 63), (127, 63, 95),
    (76, 0, 38), (76, 38, 57), (38, 0, 19), (38, 19, 28),
    (255, 0, 63), (255, 127, 159), (165, 0, 41), (165, 82, 103),
    (127, 0, 31), (127, 63, 79), (76, 0, 19), (76, 38, 47),
    (38, 0, 9), (38, 19, 23), (84, 84, 84), (118, 118, 118),
    (152, 152, 152), (186, 186, 186), (220, 220, 220), (255, 255, 255),
]


def _pairs(text: str):
    lines = text.splitlines()
    for i in range(0, len(lines) - 1, 2):
        try:
            code = int(lines[i].strip())
        except ValueError:
            continue
        yield code, lines[i + 1].strip("\r")


def _num(v: float) -> str:
    return f"{float(v):.15g}"


ARC_STEP = 4.0  # degrees (OGR_ARC_STEPSIZE default)

# DIMSTYLE group codes and AutoCAD defaults
# (ogr_autocad_services.cpp ACGetDimStylePropertyName/Default)
_DIMSTYLE_CODES = {40: "DIMSCALE", 41: "DIMASZ", 42: "DIMEXO",
                   44: "DIMEXE", 75: "DIMSE1", 76: "DIMSE2",
                   77: "DIMTAD", 140: "DIMTXT", 147: "DIMGAP",
                   178: "DIMCLRT", 271: "DIMDEC"}
_DIMSTYLE_DEFAULTS = {"DIMSCALE": "1.0", "DIMASZ": "0.18",
                      "DIMEXO": "0.0625", "DIMEXE": "0.18",
                      "DIMSE1": "0", "DIMSE2": "0", "DIMTAD": "0",
                      "DIMTXT": "0.18", "DIMGAP": "0.09",
                      "DIMCLRT": "0", "DIMDEC": "4"}


def _approx_arc(cx, cy, cz, rp, rs, rotation, start, end):
    """OGRGeometryFactory::approximateArcAngles transliterated
    (ogrgeometryfactory.cpp:4801): angles negated internally, points
    rotated CLOCKWISE by ``rotation`` around the center."""
    rot = math.radians(rotation)
    full = abs(end - start) == 360.0
    start, end = -start, -end
    n = max(2, int(math.ceil(abs(end - start) / ARC_STEP)) + 1)
    slice_ = (end - start) / (n - 1)
    if full:
        n -= 1
    pts = []
    for i in range(n):
        a = math.radians(start + i * slice_)
        ex = math.cos(a) * rp
        ey = math.sin(a) * rs
        pts.append((cx + ex * math.cos(rot) + ey * math.sin(rot),
                    cy - ex * math.sin(rot) + ey * math.cos(rot), cz))
    if full and pts:
        pts.append(pts[0])
    return pts


def _arc_pts(cx, cy, cz, rx, ry, rot_deg, a0, a1):
    """DXF ARC/CIRCLE semantics (TranslateARC: both angles negated,
    50 becomes the END and 51 the START)."""
    start, end = -a1, -a0
    if start > end:
        end += 360.0
    return _approx_arc(cx, cy, cz, rx, ry, rot_deg, start, end)


def ac_text_unescape(raw: str, is_mtext: bool) -> str:
    """ACTextUnescape (ogr_autocad_services.cpp:18-200): %% escapes,
    caret codes, and (for MTEXT) format-code stripping with \\P
    newlines, \\~ hard spaces, \\U+XXXX code points."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == "^" and i + 1 < n:
            out.append("^" if raw[i + 1] == " "
                       else chr(ord(raw[i + 1].upper()) ^ 0x40))
            i += 2
            continue
        low3 = raw[i:i + 3].lower()
        if low3 in ("%%c", "%%d", "%%p"):
            out.append({"%%c": "\u2300", "%%d": "\u00b0",
                        "%%p": "\u00b1"}[low3])
            i += 3
            continue
        if not is_mtext and low3 in ("%%u", "%%o", "%%k"):
            i += 3
            continue
        out.append(c)
        i += 1
    if not is_mtext:
        return "".join(out)
    s = "".join(out)
    res = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            c2 = s[i + 1]
            if c2 == "P":
                res.append("\n")
                i += 2
                continue
            if c2 == "~":
                res.append(" ")
                i += 2
                continue
            if c2 == "U" and s[i + 2:i + 3] == "+" and i + 7 <= n:
                try:
                    res.append(chr(int(s[i + 3:i + 7], 16)))
                    i += 7
                    continue
                except ValueError:
                    pass
            if c2 in "WTAHFfCcQp":
                j = s.find(";", i)
                if j < 0:
                    break
                i = j + 1
                continue
            if c2 in "KkLlOo":
                i += 2
                continue
            if c2 == "S":
                i += 2
                while i < n and s[i] != ";":
                    if s[i] == "\\" and i + 1 < n and s[i + 1] in "^/#~":
                        res.append(s[i + 1])
                        i += 2
                        continue
                    if s[i] not in "^/#~":
                        res.append(s[i])
                    i += 1
                if i < n and s[i] == ";":
                    i += 1
                continue
            if c2 in "\\{}":
                res.append(c2)
                i += 2
                continue
            res.append(c)
            i += 1
            continue
        if c in "{}":
            i += 1
            continue
        res.append(c)
        i += 1
    return "".join(res)


class _Entity:
    __slots__ = ("name", "groups")

    def __init__(self, name):
        self.name = name
        self.groups = []  # ordered (code, value)

    def first(self, code, default=None):
        for c, v in self.groups:
            if c == code:
                return v
        return default

    def all(self, code):
        return [v for c, v in self.groups if c == code]

    def fnum(self, code, default=0.0):
        v = self.first(code)
        return float(v) if v is not None else default


def _parse(text: str):
    """→ (blocks {name: (base, [entities])}, entities [..],
    layer_colors {name: aci})."""
    blocks: dict = {}
    entities: list = []
    layer_colors: dict = {}
    sec = None
    pending_sec = False
    cur = None
    sink = None
    block_name = None
    block_ents: list = []
    block_base = (0.0, 0.0, 0.0)
    in_layer = False
    layer_name = None
    in_dimstyle = False
    dimstyle_name = None
    dimstyles: dict = {}
    for code, val in _pairs(text):
        if code == 0:
            if cur is not None and sink is not None:
                sink.append(cur)
            cur = None
            if val == "SECTION":
                pending_sec = True
                continue
            if val == "ENDSEC":
                sec = None
                sink = None
                continue
            if sec == "BLOCKS":
                if val == "BLOCK":
                    cur = _Entity("BLOCK")
                    sink = None
                    block_ents = []
                    continue
                if val == "ENDBLK":
                    if block_name is not None:
                        blocks[block_name] = (block_base, block_ents)
                    block_name = None
                    sink = None
                    continue
                cur = _Entity(val)
                sink = block_ents
                continue
            if sec == "ENTITIES":
                cur = _Entity(val)
                sink = entities
                continue
            if sec == "TABLES":
                in_layer = val == "LAYER"
                in_dimstyle = val == "DIMSTYLE"
                layer_name = None
                if not in_dimstyle:
                    dimstyle_name = None
                continue
            continue
        if pending_sec and code == 2:
            sec = val
            pending_sec = False
            continue
        if sec == "TABLES" and in_layer:
            if code == 2:
                layer_name = val
            elif code == 62 and layer_name is not None:
                try:
                    layer_colors[layer_name] = int(val)
                except ValueError:
                    pass
            continue
        if sec == "TABLES" and in_dimstyle:
            if code == 2:
                dimstyle_name = val
                dimstyles[dimstyle_name] = dict(_DIMSTYLE_DEFAULTS)
            elif code in _DIMSTYLE_CODES and dimstyle_name is not None:
                dimstyles[dimstyle_name][_DIMSTYLE_CODES[code]] = val
            continue
        if cur is not None:
            cur.groups.append((code, val))
            if cur.name == "BLOCK" and code == 2 and block_name is None:
                block_name = val
            elif cur.name == "BLOCK" and code in (10, 20, 30):
                x, y, z = block_base
                if code == 10:
                    block_base = (float(val), y, z)
                elif code == 20:
                    block_base = (x, float(val), z)
                else:
                    block_base = (x, y, float(val))
    if cur is not None and sink is not None:
        sink.append(cur)
    return blocks, entities, layer_colors, dimstyles


def _pts_txt(pts):
    return ",".join(f"{_num(x)} {_num(y)} {_num(z)}" for x, y, z in pts)


def _vertices(ent):
    """Ordered LWPOLYLINE vertices [(x, y, bulge)]."""
    verts = []
    x = None
    for code, val in ent.groups:
        if code == 10:
            if x is not None:
                verts.append(x)
            x = [float(val), 0.0, 0.0]
        elif code == 20 and x is not None:
            x[1] = float(val)
        elif code == 42 and x is not None:
            x[2] = float(val)
    if x is not None:
        verts.append(x)
    return verts


def _lwpolyline_pts(verts, closed):
    pts = []
    n = len(verts)
    segs = n if closed else n - 1
    for i in range(segs + (0 if closed else 1)):
        x, y, b = verts[i % n]
        if not pts or pts[-1][:2] != (x, y):
            pts.append((x, y, 0.0))
        if i >= segs:
            break
        if b:
            x2, y2, _ = verts[(i + 1) % n]
            # bulge = tan(sweep/4); reconstruct the arc
            sweep = 4.0 * math.atan(b)
            dx, dy = x2 - x, y2 - y
            chord = math.hypot(dx, dy)
            if chord == 0:
                continue
            radius = chord / (2.0 * math.sin(abs(sweep) / 2.0))
            ang_chord = math.atan2(dy, dx)
            to_center = ang_chord + (math.pi / 2 - abs(sweep) / 2) * \
                (1 if sweep > 0 else -1)
            cx = x + radius * math.cos(to_center)
            cy = y + radius * math.sin(to_center)
            a0 = math.degrees(math.atan2(y - cy, x - cx))
            a1 = a0 + math.degrees(sweep)
            if sweep > 0:
                arc = _arc_pts(cx, cy, 0.0, radius, radius, 0.0, a0, a1)
            else:
                arc = _arc_pts(cx, cy, 0.0, radius, radius, 0.0, a1, a0)
                arc.reverse()
            pts.extend(arc[1:])
    if closed and pts and pts[0] != pts[-1]:
        pts.append(pts[0])
    return pts


def _entity_geometry(ent, blocks):
    """→ list of (wkt, subclass-suffix) — INSERT/DIMENSION expand to
    several."""
    name = ent.name
    if name == "POINT":
        p = (ent.fnum(10), ent.fnum(20), ent.fnum(30))
        return [(f"POINT ({_pts_txt([p])})", "AcDbPoint")]
    if name == "LINE":
        pts = [(ent.fnum(10), ent.fnum(20), ent.fnum(30)),
               (ent.fnum(11), ent.fnum(21), ent.fnum(31))]
        return [(f"LINESTRING ({_pts_txt(pts)})", "AcDbLine")]
    if name == "LWPOLYLINE":
        closed = int(ent.fnum(70, 0)) & 1
        pts = _lwpolyline_pts(_vertices(ent), bool(closed))
        return [(f"LINESTRING ({_pts_txt(pts)})", "AcDbPolyline")]
    if name == "CIRCLE":
        r = ent.fnum(40)
        pts = _arc_pts(ent.fnum(10), ent.fnum(20), ent.fnum(30),
                       r, r, 0.0, 0.0, 360.0)
        return [(f"LINESTRING ({_pts_txt(pts)})", "AcDbCircle")]
    if name == "ARC":
        r = ent.fnum(40)
        pts = _arc_pts(ent.fnum(10), ent.fnum(20), ent.fnum(30),
                       r, r, 0.0, ent.fnum(50), ent.fnum(51, 360.0))
        return [(f"LINESTRING ({_pts_txt(pts)})",
                 "AcDbCircle:AcDbArc")]
    if name == "ELLIPSE":
        cx, cy, cz = ent.fnum(10), ent.fnum(20), ent.fnum(30)
        mx, my = ent.fnum(11), ent.fnum(21)
        ratio = ent.fnum(40, 1.0)
        # TranslateELLIPSE: 42 → start, 41 → end, both negated;
        # rotation = -atan2(axisY, axisX)
        start = -math.degrees(ent.fnum(42, 2 * math.pi))
        end = -math.degrees(ent.fnum(41, 0.0))
        if start > end:
            end += 360.0
        a = math.hypot(mx, my)
        rot = -math.degrees(math.atan2(my, mx))
        pts = _approx_arc(cx, cy, cz, a, a * ratio, rot, start, end)
        return [(f"LINESTRING ({_pts_txt(pts)})", "AcDbEllipse")]
    if name in ("TEXT", "MTEXT"):
        p = (ent.fnum(10), ent.fnum(20), ent.fnum(30))
        sub = "AcDbText" if name == "TEXT" else "AcDbMText"
        return [(f"POINT ({_pts_txt([p])})", sub)]
    if name in ("SOLID", "3DFACE"):
        corners = [(ent.fnum(10), ent.fnum(20), ent.fnum(30)),
                   (ent.fnum(11), ent.fnum(21), ent.fnum(31)),
                   (ent.fnum(13), ent.fnum(23), ent.fnum(33)),
                   (ent.fnum(12), ent.fnum(22), ent.fnum(32))]
        ring = corners + [corners[0]]
        sub = "AcDbTrace" if name == "SOLID" else "AcDbFace"
        return [(f"POLYGON (({_pts_txt(ring)}))", sub)]
    return []


def _transform(pts_wkt: str, base, insert, scale, rot_deg):
    """Apply a block INSERT transform to every coordinate triple in a
    WKT string."""
    import re as _re

    rot = math.radians(rot_deg)
    cr, sr = math.cos(rot), math.sin(rot)

    def fix(m):
        x, y, z = (float(v) for v in m.group(0).split())
        x -= base[0]
        y -= base[1]
        z -= base[2]
        x *= scale[0]
        y *= scale[1]
        z *= scale[2]
        xr = x * cr - y * sr
        yr = x * sr + y * cr
        return (f"{_num(xr + insert[0])} {_num(yr + insert[1])} "
                f"{_num(z + insert[2])}")

    return _re.sub(
        r"-?[\d.eE+-]+ -?[\d.eE+-]+ -?[\d.eE+-]+", fix, pts_wkt)


def parse_dxf(text: str):
    """→ list of feature dicts for the single ``entities`` layer:
    wkt, layer, subclasses, linetype, entityhandle, text,
    paperspace, color (hex or None)."""
    if text.startswith("﻿"):
        text = text[1:]
    blocks, entities, layer_colors, dimstyles = _parse(text)
    feats = []

    def _atoi(v):
        import re as _re
        m = _re.match(r"\s*[-+]?\d+", v or "")
        return int(m.group(0)) if m else 0

    def color_for(ent):
        c420 = ent.first(420)  # 24-bit true color wins
        if c420 is not None:
            return f"#{_atoi(c420) & 0xFFFFFF:06x}"
        c62 = ent.first(62)
        aci = None
        if c62 is not None and _atoi(c62) not in (0, 256):
            aci = _atoi(c62)
        else:
            aci = layer_colors.get(ent.first(8, "0"))
        if aci is None or not (0 <= aci < 256):
            return "#000000"
        r, g, b = ACI_TABLE[aci]
        return f"#{r:02x}{g:02x}{b:02x}"

    def emit(ent, wkt, sub, src_ent=None):
        src = src_ent or ent
        text_val = None
        if src.name in ("TEXT", "MTEXT"):
            raw = "".join(src.all(3)) + (src.first(1) or "")
            text_val = ac_text_unescape(raw, src.name == "MTEXT")
        feats.append({
            "wkt": wkt,
            "layer": src.first(8, "0"),
            "subclasses": "AcDbEntity:" + sub,
            "linetype": src.first(6) or "ByLayer",
            "entityhandle": src.first(5),
            "text": text_val,
            "paperspace": None if not src.first(67) else 1,
            "color": color_for(src),
            "entity": src.name,
        })

    def expand_block(name, insert, scale, rot, outer):
        """InsertBlockInline with geometry merging: non-text block
        geometries merge into one feature (a MULTILINESTRING when all
        parts are lines); text entities stay separate pending
        features, like the reference."""
        base, ents = blocks.get(name, ((0, 0, 0), []))
        merged = []
        pending = []
        for be in ents:
            if be.name in ("INSERT", "DIMENSION"):
                walk(be)
                continue
            for wkt, sub in _entity_geometry(be, blocks):
                wkt = _transform(wkt, base, insert, scale, rot)
                if be.name in ("TEXT", "MTEXT"):
                    pending.append((wkt, sub, be))
                else:
                    merged.append((wkt, sub, be))
        if merged:
            if all(w.startswith("LINESTRING") for w, _, _ in merged):
                body = ",".join(
                    "(" + w[len("LINESTRING ("):-1] + ")"
                    for w, _, _ in merged)
                emit(outer, f"MULTILINESTRING ({body})",
                     "AcDbBlockReference")
            elif len(merged) == 1:
                emit(outer, merged[0][0], merged[0][1],
                     src_ent=merged[0][2])
            else:
                body = ",".join(w for w, _, _ in merged)
                emit(outer, f"GEOMETRYCOLLECTION ({body})",
                     "AcDbBlockReference")
        for wkt, sub, be in pending:
            emit(outer, wkt, sub, src_ent=be)

    def walk(ent):
        if ent.name == "INSERT":
            insert = (ent.fnum(10), ent.fnum(20), ent.fnum(30))
            scale = (ent.fnum(41, 1.0), ent.fnum(42, 1.0),
                     ent.fnum(43, 1.0))
            expand_block(ent.first(2, ""), insert, scale,
                         ent.fnum(50, 0.0), ent)
            return
        if ent.name == "DIMENSION":
            blkname = ent.first(2)
            if blkname and blkname in blocks:
                expand_block(blkname, (0, 0, 0), (1, 1, 1), 0.0, ent)
            else:
                dimension_fallback(ent)
            return
        for wkt, sub in _entity_geometry(ent, blocks):
            emit(ent, wkt, sub)

    def dimension_fallback(ent):
        """TranslateDIMENSION without a block
        (ogrdxf_dimension.cpp:180-420): dimension multilinestring,
        two default arrowheads, and the label point."""
        props = dict(_DIMSTYLE_DEFAULTS)
        style_name = ent.first(3)
        if style_name in dimstyles:
            props.update(dimstyles[style_name])
        ax1, ay1 = ent.fnum(10), ent.fnum(20)
        tx, ty = ent.fnum(11), ent.fnum(21)
        t2x, t2y = ent.fnum(13), ent.fnum(23)
        t1x, t1y = ent.fnum(14), ent.fnum(24)
        text = ent.first(1)
        scale = float(props["DIMSCALE"])
        asz = float(props["DIMASZ"]) * scale
        exe = float(props["DIMEXE"])
        exo = float(props["DIMEXO"])
        v1x, v1y = ax1 - t1x, ay1 - t1y
        vlen = math.hypot(v1x, v1y)
        if vlen > 0:
            v1x /= vlen
            v1y /= vlen
        if v1x == 0.0 and v1y == 0.0:
            ax2, ay2 = t2x, t2y
        elif v1x == 0.0:
            ax2, ay2 = t2x, ay1
        elif v1y == 0.0:
            ax2, ay2 = ax1, t2y
        else:
            m1 = v1y / v1x
            b1 = t2y - m1 * t2x
            m2 = -v1x / v1y
            b2 = ay1 - m2 * ax1
            ax2 = (b2 - b1) / (m1 - m2)
            ay2 = m2 * ax2 + b2
        parts = [[(ax1, ay1, 0.0), (ax2, ay2, 0.0)]]
        e1 = [(t1x + v1x * exo, t1y + v1y * exo, 0.0),
              (ax1 + v1x * exe, ay1 + v1y * exe, 0.0)]
        if int(float(props["DIMSE1"])) == 0 and \
                math.hypot(e1[1][0] - e1[0][0], e1[1][1] - e1[0][1]) > 0:
            parts.append(e1)
        e2 = [(t2x + v1x * exo, t2y + v1y * exo, 0.0),
              (ax2 + v1x * exe, ay2 + v1y * exe, 0.0)]
        if int(float(props["DIMSE2"])) == 0 and \
                math.hypot(e2[1][0] - e2[0][0], e2[1][1] - e2[0][1]) > 0:
            parts.append(e2)
        mls = ("MULTILINESTRING ((" + "),(".join(
            ",".join(f"{_num(x)} {_num(y)}" for x, y, _ in p)
            for p in parts) + "))")
        emit(ent, mls, "AcDbDimension")

        # default arrowheads at both ends (GenerateDefaultArrowhead)
        def arrowhead(p1, p2):
            seg = math.hypot(p2[0] - p1[0], p2[1] - p1[1])
            if asz == 0.0 or seg == 0.0 or asz > 0.5 * seg:
                return
            s = asz / seg
            parx = s * (p2[0] - p1[0])
            pary = s * (p2[1] - p1[1])
            perx, pery = pary, -parx
            ring = [(p1[0] + parx + perx / 6, p1[1] + pary + pery / 6,
                     0.0),
                    (p1[0], p1[1], 0.0),
                    (p1[0] + parx - perx / 6, p1[1] + pary - pery / 6,
                     0.0)]
            ring.append(ring[0])
            emit(ent, f"POLYGON (({_pts_txt(ring)}))", "AcDbDimension")

        arrowhead((ax1, ay1), (ax2, ay2))
        arrowhead((ax2, ay2), (ax1, ay1))

        if text == " ":
            return
        if not text:
            text = "<>"
        if "<>" in text:
            dist = math.hypot(ax2 - ax1, ay2 - ay1)
            prec = max(0, min(20, int(float(props["DIMDEC"]))))
            text = text.replace("<>", f"{dist:.{prec}f}")
        feats.append({
            "wkt": f"POINT ({_num(tx)} {_num(ty)})",
            "layer": ent.first(8, "0"),
            "subclasses": "AcDbEntity:AcDbDimension",
            "linetype": ent.first(6) or "ByLayer",
            "entityhandle": ent.first(5),
            "text": text,
            "paperspace": None if not ent.first(67) else 1,
            "color": color_for(ent),
            "entity": "DIMENSION",
            "dim_angle": (-90.0 if ax1 == ax2 else
                          math.degrees(math.atan((ay1 - ay2)
                                                 / (ax1 - ax2)))),
            "dim_height": float(props["DIMTXT"]) * scale,
        })

    for ent in entities:
        walk(ent)
    return feats
