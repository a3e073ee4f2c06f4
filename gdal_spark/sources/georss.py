"""GeoRSS source (the reference's GeoRSS driver, read side).

Mirrors ``ogr/ogrsf_frmts/georss/``: RSS 2.0 ``<item>`` and Atom
``<entry>`` layers; GeoRSS-Simple ``georss:point/line/polygon/box``
(coordinates in lat-lon order, swapped to lon-lat on output — the
published WKTs pin this) and ``georss:where`` GML geometries (also
lat-lon, reusing the GML translator); fields title/author/link/
description plus OGR-datetime pubDate and numbered repeated
``category``/``category_domain`` pairs.

Pinned on the autotest fixtures: the exact published WKTs for all
four simple geometries (incl. the box→polygon corner order) and the
where/GML variants, and the published field strings
(``tests/test_georss.py``).
"""

from __future__ import annotations

import email.utils
import xml.etree.ElementTree as ET

from gdal_spark.sources.gml import gml_geometry_to_wkt, _find_geometry


def _local(tag):
    return tag.rsplit("}", 1)[-1]


def _num(v: float) -> str:
    return f"{float(v):.15g}"


def _swap_latlon(wkt: str) -> str:
    """GeoRSS stores lat lon; OGR emits lon lat."""
    import re

    def fix(m):
        parts = m.group(0).split()
        parts[0], parts[1] = parts[1], parts[0]
        return " ".join(parts)

    return re.sub(r"-?[\d.eE+]+ -?[\d.eE+]+", fix, wkt)


def _pairs(text: str):
    vals = [float(v) for v in text.split()]
    return [(vals[i + 1], vals[i]) for i in range(0, len(vals) - 1, 2)]


def _pub_date(text: str) -> str:
    """RFC822 → OGR datetime string (2008/12/07 20:13:00+02)."""
    try:
        dt = email.utils.parsedate_to_datetime(text.strip())
    except (TypeError, ValueError):
        return text
    out = dt.strftime("%Y/%m/%d %H:%M:%S")
    off = dt.utcoffset()
    if off is not None:
        total = int(off.total_seconds() // 60)
        sign = "+" if total >= 0 else "-"
        hh, mm = divmod(abs(total), 60)
        out += f"{sign}{hh:02d}" + (f"{mm:02d}" if mm else "")
    return out


def _geom_from_item(item):
    for ch in item:
        ln = _local(ch.tag)
        if ln == "point":
            (x, y), = _pairs(ch.text)
            return f"POINT ({_num(x)} {_num(y)})"
        if ln == "line":
            pts = _pairs(ch.text)
            body = ",".join(f"{_num(x)} {_num(y)}" for x, y in pts)
            return f"LINESTRING ({body})"
        if ln == "polygon":
            pts = _pairs(ch.text)
            if pts and pts[0] != pts[-1]:
                pts.append(pts[0])
            body = ",".join(f"{_num(x)} {_num(y)}" for x, y in pts)
            return f"POLYGON (({body}))"
        if ln == "box":
            (x0, y0), (x1, y1) = _pairs(ch.text)
            ring = [(x0, y0), (x0, y1), (x1, y1), (x1, y0), (x0, y0)]
            body = ",".join(f"{_num(x)} {_num(y)}" for x, y in ring)
            return f"POLYGON (({body}))"
        if ln == "where":
            g = _find_geometry(ch)
            if g is not None:
                t = _local(g.tag)
                if t == "Envelope":
                    lo = hi = None
                    for sub in g:
                        if _local(sub.tag) == "lowerCorner":
                            lo = [float(v) for v in sub.text.split()]
                        elif _local(sub.tag) == "upperCorner":
                            hi = [float(v) for v in sub.text.split()]
                    if lo and hi:
                        x0, y0 = lo[1], lo[0]
                        x1, y1 = hi[1], hi[0]
                        ring = [(x0, y0), (x0, y1), (x1, y1),
                                (x1, y0), (x0, y0)]
                        body = ",".join(f"{_num(x)} {_num(y)}"
                                        for x, y in ring)
                        return f"POLYGON (({body}))"
                    continue
                return _swap_latlon(gml_geometry_to_wkt(g))
    return None


def parse_georss(data: bytes):
    """→ list of feature dicts (wkt + fields) over the items/entries
    layer."""
    if data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    root = ET.fromstring(data)
    rn = _local(root.tag)
    feats = []
    if rn == "rss":
        items = [el for ch in root for el in ch
                 if _local(ch.tag) == "channel"
                 and _local(el.tag) == "item"]
    elif rn == "feed":
        items = [el for el in root if _local(el.tag) == "entry"]
    else:
        raise ValueError("not a GeoRSS/Atom document")
    for item in items:
        f: dict = {"wkt": _geom_from_item(item)}
        cat_count = 0
        for ch in item:
            ln = _local(ch.tag)
            if ln in ("point", "line", "polygon", "box", "where"):
                continue
            if ln == "category":
                cat_count += 1
                key = "category" if cat_count == 1 \
                    else f"category{cat_count}"
                f[key] = (ch.text or "").strip()
                if ch.get("domain"):
                    f[key + "_domain"] = ch.get("domain")
                continue
            if ln == "pubDate":
                f["pubDate"] = _pub_date(ch.text or "")
                continue
            if list(ch):  # complex (e.g. atom author) — flatten
                for sub in ch:
                    if sub.text and sub.text.strip():
                        f[f"{ln}_{_local(sub.tag)}"] = sub.text.strip()
                continue
            if ch.text and ch.text.strip():
                f[ln] = ch.text.strip()
        feats.append(f)
    return feats
