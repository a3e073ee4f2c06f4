"""GeoRSS reader vs the reference's published values
(``autotest/ogr/ogr_georss.py`` over the shipped fixtures)."""

from __future__ import annotations

import os
import re

import pytest

from gdal_spark.sources import georss

D = "/root/reference/autotest/ogr/data/georss"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _coords(wkt):
    return [float(v) for v in re.findall(r"-?\d+(?:\.\d+)?", wkt)]


def _geom_eq(a, b):
    assert a.split("(")[0].strip() == b.split("(")[0].strip()
    assert _coords(a) == pytest.approx(_coords(b), abs=1e-12)


@needs_ref
@pytest.mark.parametrize("fixture", ["test_georss_simple.xml",
                                     "test_georss_gml.xml"])
def test_published_wkts_and_fields(fixture):
    """ogr_georss_test_rss: the four published WKTs (lat-lon swap,
    box corner order) and field strings, for both the Simple and the
    where/GML encodings."""
    feats = georss.parse_georss(
        open(os.path.join(D, fixture), "rb").read())
    assert len(feats) == 4
    _geom_eq(feats[0]["wkt"], "POINT (2 49)")
    _geom_eq(feats[1]["wkt"], "LINESTRING (2 48,2.1 48.1,2.2 48.0)")
    _geom_eq(feats[2]["wkt"],
             "POLYGON ((2 50,2.1 50.1,2.2 48.1,2.1 46.1,2 50))")
    _geom_eq(feats[3]["wkt"],
             "POLYGON ((2 49,2.0 49.5,2.2 49.5,2.2 49.0,2 49))")
    f = feats[0]
    assert f["title"] == "A point"
    assert f["author"] == "Author"
    assert f["link"] == "http://gdal.org"
    assert f["pubDate"] == "2008/12/07 20:13:00+02"
    assert f["category"] == "First category"
    assert f["category_domain"] == "first_domain"
    assert f["category2"] == "Second category"
    assert f["category2_domain"] == "second_domain"
    assert [x["title"] for x in feats] == \
        ["A point", "A line", "A polygon", "A box"]


@needs_ref
def test_atom_entries():
    """test_ogr_georss_atom: Atom feeds read as entries with
    flattened complex fields."""
    feats = georss.parse_georss(
        open(os.path.join(D, "atom_rfc_sample.xml"), "rb").read())
    assert len(feats) == 1
    assert feats[0]["title"] == "Atom draft-07 snapshot"
    assert feats[0]["author_name"] == "Mark Pilgrim"
