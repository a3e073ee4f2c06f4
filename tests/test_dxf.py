"""DXF reader vs the reference's published oracle values
(``autotest/ogr/ogr_dxf.py`` tests 1-9 over assorted.dxf)."""

from __future__ import annotations

import os
import re

import pytest

from gdal_spark.sources import dxf

D = "/root/reference/autotest/ogr/data/dxf"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


@pytest.fixture(scope="module")
def feats():
    txt = open(f"{D}/assorted.dxf", encoding="latin-1").read()
    return dxf.parse_dxf(txt)


def _coords(wkt):
    return [float(v) for v in
            re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", wkt)]


def _env_area(wkt):
    cs = _coords(wkt)
    xs, ys = cs[0::3], cs[1::3]
    return (max(xs) - min(xs)) * (max(ys) - min(ys))


def _geom_eq(a, b, tol=1e-6):
    ca, cb = _coords(a), _coords(b)
    assert len(ca) == len(cb)
    for x, y in zip(ca, cb):
        assert abs(x - y) <= tol


@needs_ref
def test_feature_count_and_fields(feats):
    """test_ogr_dxf_1/2: 22 features; feature 0 is the ellipse with
    the published field values."""
    assert len(feats) == 22
    f0 = feats[0]
    assert f0["layer"] == "0"
    assert f0["paperspace"] is None
    assert f0["subclasses"] == "AcDbEntity:AcDbEllipse"
    assert f0["linetype"] == "ByLayer"
    assert f0["entityhandle"] == "43"
    assert f0["color"] == "#000000"  # PEN(c:#000000)


@needs_ref
def test_ellipse_geometry(feats):
    """test_ogr_dxf_2: envelope area 1596.12 ± 0.5, first point
    (73.25, 139.75) ± 0.001."""
    g = feats[0]["wkt"]
    assert abs(_env_area(g) - 1596.12) <= 0.5
    x0, y0 = _coords(g)[0], _coords(g)[1]
    assert x0 == pytest.approx(73.25, abs=0.001)
    assert y0 == pytest.approx(139.75, abs=0.001)


@needs_ref
def test_partial_ellipse(feats):
    """test_ogr_dxf_3: area 311.864 ± 0.5, first point (61.133,
    103.592) ± 0.01 — pins the negated start/end parameter mapping of
    TranslateELLIPSE."""
    g = feats[1]["wkt"]
    assert abs(_env_area(g) - 311.864) <= 0.5
    assert _coords(g)[0] == pytest.approx(61.133, abs=0.01)
    assert _coords(g)[1] == pytest.approx(103.592, abs=0.01)


@needs_ref
def test_point_true_color(feats):
    """test_ogr_dxf_4: the POINT carries 24-bit true color #ffbeb8
    (group 420 beats the ACI)."""
    f = feats[2]
    assert f["wkt"].startswith("POINT")
    assert f["color"] == "#ffbeb8"


@needs_ref
def test_arc(feats):
    """test_ogr_dxf_7: area 445.748 ± 0.5, first point x 115.258 —
    pins TranslateARC's swapped/negated angle convention."""
    f = feats[5]
    assert f["entity"] == "ARC"
    assert abs(_env_area(f["wkt"]) - 445.748) <= 0.5
    assert _coords(f["wkt"])[0] == pytest.approx(115.258, abs=0.01)


@needs_ref
def test_dimension_fallback(feats):
    """test_ogr_dxf_8: the blockless DIMENSION renders as the
    published multilinestring, two arrowhead polygons and the label
    point with FormatDimension text."""
    _geom_eq(feats[7]["wkt"],
             "MULTILINESTRING ((63.8628719444825 149.209935992088,"
             "24.3419606685507 111.934531038653),"
             "(72.3255686642474 140.237438265109,"
             "63.0051995752285 150.119275371538),"
             "(32.8046573883157 102.962033311673,"
             "23.4842882992968 112.843870418103))", tol=1e-6)
    _geom_eq(feats[8]["wkt"],
             "POLYGON Z ((61.7583023958313 147.797704380064 0,"
             "63.8628719444825 149.209935992088 0,"
             "62.3300839753339 147.191478127097 0,"
             "61.7583023958313 147.797704380064 0))", tol=1e-6)
    _geom_eq(feats[9]["wkt"],
             "POLYGON Z ((26.4465302172018 113.346762650677 0,"
             "24.3419606685507 111.934531038653 0,"
             "25.8747486376992 113.952988903644 0,"
             "26.4465302172018 113.346762650677 0))", tol=1e-6)
    f = feats[10]
    _geom_eq(f["wkt"], "POINT (42.815907752635709 131.936242584545)")
    assert f["text"] == "54.33"
    assert f["dim_angle"] == pytest.approx(43.3, abs=0.05)
    assert f["dim_height"] == pytest.approx(2.5)


@needs_ref
def test_insert_block_merge(feats):
    """test_ogr_dxf_9: the STAR block's five lines merge into one
    MULTILINESTRING; the two MTEXTs follow with unescaped text incl.
    \\U+ code points and \\P newlines."""
    f = feats[19]
    _geom_eq(f["wkt"],
             "MULTILINESTRING ((79.069506278985116 121.003652476273 0,"
             "79.716898725419625 118.892590150943 0),"
             "(79.716898725419625 118.892590150943 0,"
             "78.140638855839953 120.440702522851 0),"
             "(78.140638855839953 120.440702522851 0,"
             "80.139111190485622 120.328112532167 0),"
             "(80.139111190485622 120.328112532167 0,"
             "78.619146316248077 118.920737648614 0),"
             "(78.619146316248077 118.920737648614 0,"
             "79.041358781314059 120.975504978602 0))", tol=1e-6)
    assert feats[20]["text"] == 'Text Sample1¿λ\n"abc"'
    _geom_eq(feats[20]["wkt"],
             "POINT (77.602201427662891 120.775897075866 0)")
    assert feats[21]["text"] == "Second"
    _geom_eq(feats[21]["wkt"],
             "POINT (79.977331629005178 119.698291706739 0)")


@needs_ref
def test_mtext_dimension_label(feats):
    """test_ogr_dxf_6: the bare MTEXT's label attributes (text,
    height from the entity) ride on the feature."""
    f = feats[4]
    assert f["entity"] == "MTEXT"
    assert f["text"] == "Test"
    assert f["wkt"].startswith("POINT")


def test_text_unescape_rules():
    assert dxf.ac_text_unescape(r"A\~B\PC", True) == "A B\nC"
    assert dxf.ac_text_unescape(r"\U+03bb", True) == "λ"
    assert dxf.ac_text_unescape(r"{\fArial;X}", True) == "X"
    assert dxf.ac_text_unescape("%%d45", False) == "°45"
    assert dxf.ac_text_unescape(r"\S1/2;", True) == "12"
