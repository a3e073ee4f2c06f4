"""GML source + sink (the reference's GML driver, read side).

Reference: ``ogr/ogrsf_frmts/gml/`` (``gmlreader.cpp`` feature-member
scanning, ``gml2ogrgeometry.cpp`` geometry translation); tests
``autotest/ogr/ogr_gml.py``.

Reader model mirrored from the reference:

* any element whose local name ends in ``member``/``members``
  (featureMember, cartographicMember, ...) is a feature container;
  the contained element's local name is the layer;
* simple child elements become fields; complex non-geometry children
  flatten their leaf elements to fields by local name (#3680 —
  pinned on bom.gml's ``textRendering/anchorPosition``);
* geometry properties are children wrapping a GML geometry element;
  GML 2 ``coordinates`` (with ``decimal``/``cs``/``ts`` separators)
  and GML 3 ``pos``/``posList`` (with ``srsDimension``) both parse;
* geometries: Point, LineString, Polygon (outer/innerBoundaryIs and
  exterior/interior), Multi{Point,LineString,Polygon,Surface,Curve,
  Geometry}, Curve/segments/LineStringSegment, Surface/patches/
  PolygonPatch, LinearRing;
* field types are inferred per layer (Integer → Real → String) like
  the reference's second scan;
* UTF-8 BOM tolerated (bom.gml).

The writer emits an ogr-flavoured GML 2 FeatureCollection
(``<gml:featureMember><ogr:LAYER>...``) that re-reads through this
reader; bulk interchange stays on GeoJSONSeq/parquet as with the
KML/GPX sources, and the Spark read is one task per document.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _num(v: float) -> str:
    return f"{float(v):.15g}"


_GEOM_TAGS = {
    "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
    "MultiPolygon", "MultiSurface", "MultiCurve", "MultiGeometry",
    "Curve", "Surface", "LinearRing", "Box", "Envelope",
    "CompositeCurve", "GeometryCollection",
}


def _parse_coordinates(el) -> list[tuple]:
    """GML2 <coordinates>: ts-separated tuples, cs-separated members."""
    ts = el.get("ts", " ")
    cs = el.get("cs", ",")
    dec = el.get("decimal", ".")
    text = (el.text or "").strip()
    if dec != ".":
        text = text.replace(dec, ".")
    pts = []
    for tup in text.split(ts):
        tup = tup.strip()
        if not tup:
            continue
        parts = tup.split(cs)
        pts.append(tuple(float(p) for p in parts[:3]))
    return pts


def _parse_poslist(el) -> list[tuple]:
    dim = int(el.get("srsDimension", "2"))
    vals = [float(v) for v in (el.text or "").split()]
    return [tuple(vals[i:i + dim]) for i in range(0, len(vals) - dim + 1,
                                                  dim)]


def _ring_coords(el) -> list[tuple]:
    for ch in el.iter():
        t = _local(ch.tag)
        if t == "coordinates":
            return _parse_coordinates(ch)
        if t == "posList":
            return _parse_poslist(ch)
    # sequence of <pos> elements
    pts = []
    for ch in el.iter():
        if _local(ch.tag) == "pos":
            vals = [float(v) for v in (ch.text or "").split()]
            pts.append(tuple(vals))
    return pts


def _pts_txt(pts) -> str:
    return ",".join(" ".join(_num(v) for v in p[:2]) for p in pts)


def gml_geometry_to_wkt(el) -> str:
    """Translate one GML geometry element to WKT
    (gml2ogrgeometry.cpp semantics for the 2-D feature set)."""
    t = _local(el.tag)
    if t == "Point":
        pts = _ring_coords(el)
        return f"POINT ({_pts_txt(pts[:1])})" if pts else "POINT EMPTY"
    if t in ("LineString", "LineStringSegment"):
        pts = _ring_coords(el)
        return f"LINESTRING ({_pts_txt(pts)})" if pts \
            else "LINESTRING EMPTY"
    if t == "Curve":
        pts = []
        for seg in el.iter():
            if _local(seg.tag) == "LineStringSegment":
                seg_pts = _ring_coords(seg)
                if pts and seg_pts and pts[-1] == seg_pts[0]:
                    seg_pts = seg_pts[1:]
                pts.extend(seg_pts)
        return f"LINESTRING ({_pts_txt(pts)})" if pts \
            else "LINESTRING EMPTY"
    if t in ("Polygon", "PolygonPatch", "Rectangle"):
        outer = None
        inners = []
        for ch in el:
            cl = _local(ch.tag)
            if cl in ("outerBoundaryIs", "exterior"):
                outer = _ring_coords(ch)
            elif cl in ("innerBoundaryIs", "interior"):
                inners.append(_ring_coords(ch))
        if outer is None:
            outer = _ring_coords(el)
        if not outer:
            return "POLYGON EMPTY"
        rings = [f"({_pts_txt(outer)})"] + \
            [f"({_pts_txt(r)})" for r in inners if r]
        return "POLYGON (" + ",".join(rings) + ")"
    if t == "Surface":
        parts = []
        for ch in el.iter():
            if _local(ch.tag) in ("PolygonPatch", "Rectangle"):
                wkt = gml_geometry_to_wkt(ch)
                if "EMPTY" not in wkt:
                    parts.append(wkt[len("POLYGON ("):-1])
        if len(parts) == 1:
            return f"POLYGON ({parts[0]})"
        return ("MULTIPOLYGON ((" + "),(".join(parts) + "))"
                if parts else "POLYGON EMPTY")
    if t in ("MultiPoint", "MultiLineString", "MultiPolygon",
             "MultiSurface", "MultiCurve", "MultiGeometry",
             "GeometryCollection"):
        member_geoms = []
        for ch in el:
            if _local(ch.tag).lower().endswith(("member", "members")):
                for sub in ch:
                    if _local(sub.tag) in _GEOM_TAGS or \
                            _local(sub.tag) == "LineStringSegment":
                        member_geoms.append(gml_geometry_to_wkt(sub))
        if t == "MultiPoint":
            body = ",".join(g[len("POINT ("):-1] for g in member_geoms
                            if "EMPTY" not in g)
            return f"MULTIPOINT ({body})" if body else "MULTIPOINT EMPTY"
        if t in ("MultiLineString", "MultiCurve"):
            body = "),(".join(g[len("LINESTRING ("):-1]
                              for g in member_geoms if "EMPTY" not in g)
            return (f"MULTILINESTRING (({body}))" if body
                    else "MULTILINESTRING EMPTY")
        if t in ("MultiPolygon", "MultiSurface"):
            parts = []
            for g in member_geoms:
                if g.startswith("POLYGON (") and "EMPTY" not in g:
                    parts.append(g[len("POLYGON ("):-1])
                elif g.startswith("MULTIPOLYGON ((") and "EMPTY" not in g:
                    parts.append(g[len("MULTIPOLYGON (("):-2])
            return ("MULTIPOLYGON ((" + "),(".join(parts) + "))"
                    if parts else "MULTIPOLYGON EMPTY")
        body = ",".join(member_geoms)
        return (f"GEOMETRYCOLLECTION ({body})" if body
                else "GEOMETRYCOLLECTION EMPTY")
    raise ValueError(f"GML geometry {t!r} unsupported")


def _find_geometry(el):
    """First GML geometry element among/below the property children."""
    if _local(el.tag) in _GEOM_TAGS:
        return el
    for ch in el:
        got = _find_geometry(ch)
        if got is not None:
            return got
    return None


_GML_NS = "{http://www.opengis.net/gml}"


def _skipped(ch) -> bool:
    """gml:boundedBy always; gml:name/description only when they are
    in the GML namespace (application-schema fields keep theirs)."""
    cl = _local(ch.tag)
    if cl == "boundedBy":
        return True
    return (ch.tag.startswith(_GML_NS)
            and cl in ("name", "description", "metaDataProperty"))


def _collect_fields(el, fields: dict):
    for ch in el:
        cl = _local(ch.tag)
        if _skipped(ch):
            continue
        kids = list(ch)
        if not kids:
            if ch.text is not None and ch.text.strip() != "":
                fields[cl] = ch.text.strip()
        elif _find_geometry(ch) is None:
            _collect_fields(ch, fields)  # nested elements (#3680)


def parse_gml(data: bytes) -> dict:
    """Parse a GML document → {layer_name: list of feature dicts}.
    Each feature has ``fid``, ``wkt`` (or None) plus typed fields."""
    if data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    root = ET.fromstring(data)
    layers: dict[str, list] = {}
    for member in root.iter():
        ln = _local(member.tag)
        if not (ln.endswith("Member") or ln.endswith("Members")
                or ln in ("member", "members")):
            continue
        for feat_el in member:
            lname = _local(feat_el.tag)
            if lname in _GEOM_TAGS:
                continue
            fields: dict = {}
            _collect_fields(feat_el, fields)
            geom = None
            for ch in feat_el:
                if _skipped(ch):
                    continue
                g = _find_geometry(ch)
                if g is not None:
                    geom = gml_geometry_to_wkt(g)
                    break
            feat = {"fid": feat_el.get("fid")
                    or feat_el.get("{http://www.opengis.net/gml}id"),
                    "wkt": geom, **fields}
            layers.setdefault(lname, []).append(feat)
    # type inference per layer (second-scan equivalent)
    for feats in layers.values():
        keys = {k for f in feats for k in f if k not in ("fid", "wkt")}
        for k in keys:
            vals = [f[k] for f in feats if f.get(k) is not None]
            try:
                ints = [int(v) for v in vals]
                for f in feats:
                    if f.get(k) is not None:
                        f[k] = int(f[k])
                _ = ints
                continue
            except ValueError:
                pass
            try:
                for f in feats:
                    if f.get(k) is not None:
                        f[k] = float(f[k])
            except ValueError:
                pass
    return layers


# ------------------------------------------------------------------ writer

def _wkt_to_gml(wkt: str) -> str:
    wkt = wkt.strip()

    def coords(body):
        return " ".join(",".join(_num(float(v)) for v in pt.split())
                        for pt in body.split(","))

    if wkt.startswith("POINT"):
        body = wkt[wkt.find("(") + 1:wkt.rfind(")")]
        return (f"<gml:Point><gml:coordinates>{coords(body)}"
                "</gml:coordinates></gml:Point>")
    if wkt.startswith("LINESTRING"):
        body = wkt[wkt.find("(") + 1:wkt.rfind(")")]
        return (f"<gml:LineString><gml:coordinates>{coords(body)}"
                "</gml:coordinates></gml:LineString>")
    if wkt.startswith("POLYGON"):
        inner = wkt[wkt.find("(") + 1:wkt.rfind(")")]
        rings = [r.strip().strip("()") for r in inner.split("),(")]
        out = ["<gml:Polygon>"]
        for i, ring in enumerate(rings):
            tag = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
            out.append(f"<gml:{tag}><gml:LinearRing><gml:coordinates>"
                       f"{coords(ring)}</gml:coordinates>"
                       f"</gml:LinearRing></gml:{tag}>")
        out.append("</gml:Polygon>")
        return "".join(out)
    if wkt.startswith("MULTILINESTRING"):
        inner = wkt[wkt.find("((") + 2:wkt.rfind("))")]
        parts = inner.split("),(")
        out = ["<gml:MultiLineString>"]
        for part in parts:
            out.append("<gml:lineStringMember><gml:LineString>"
                       f"<gml:coordinates>{coords(part)}"
                       "</gml:coordinates></gml:LineString>"
                       "</gml:lineStringMember>")
        out.append("</gml:MultiLineString>")
        return "".join(out)
    if wkt.startswith("MULTIPOLYGON"):
        inner = wkt[wkt.find("(") + 1:wkt.rfind(")")]
        polys = []
        depth = 0
        cur = ""
        for ch in inner:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            cur += ch
            if depth == 0 and cur.strip(", "):
                polys.append(cur.strip(", "))
                cur = ""
        out = ["<gml:MultiPolygon>"]
        for p in polys:
            out.append("<gml:polygonMember>"
                       + _wkt_to_gml("POLYGON " + p)
                       + "</gml:polygonMember>")
        out.append("</gml:MultiPolygon>")
        return "".join(out)
    raise ValueError(f"cannot serialize wkt {wkt[:30]!r}")


def _esc(s) -> str:
    return (str(s).replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_gml(layer: str, features: list[dict]) -> str:
    """Serialize features ({wkt, fid, fields...}) as an ogr-style
    GML 2 FeatureCollection."""
    lines = [
        '<?xml version="1.0" encoding="utf-8" ?>',
        '<ogr:FeatureCollection xmlns:gml="http://www.opengis.net/gml" '
        'xmlns:ogr="http://ogr.maptools.org/">',
    ]
    for i, f in enumerate(features):
        fid = f.get("fid") or f"{layer}.{i}"
        lines.append("  <gml:featureMember>")
        lines.append(f'    <ogr:{layer} fid="{_esc(fid)}">')
        if f.get("wkt"):
            lines.append("      <ogr:geometryProperty>"
                         + _wkt_to_gml(f["wkt"])
                         + "</ogr:geometryProperty>")
        for k, v in f.items():
            if k in ("fid", "wkt") or v is None:
                continue
            lines.append(f"      <ogr:{k}>{_esc(v)}</ogr:{k}>")
        lines.append(f"    </ogr:{layer}>")
        lines.append("  </gml:featureMember>")
    lines.append("</ogr:FeatureCollection>")
    return "\n".join(lines) + "\n"
