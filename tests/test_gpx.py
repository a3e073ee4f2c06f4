"""GPX source vs the reference's published oracle values.

Every assertion pins a value published in ``autotest/ogr/ogr_gpx.py``
over the shipped ``autotest/ogr/data/gpx`` fixtures, including the
metadata state-machine quirk and the byte-for-byte writer reference
``ogr_gpx_8_ref.txt``.
"""

from __future__ import annotations

import os

import pytest

from gdal_spark.sources import gpx

DATA = "/root/reference/autotest/ogr/data/gpx"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference autotest data absent")


def _load(name="test.gpx"):
    return open(os.path.join(DATA, name), "rb").read()


@needs_ref
def test_waypoints_layer():
    """test_ogr_gpx_1: field values and point geometries."""
    feats = gpx.parse_gpx(_load(), "waypoints")
    assert [f.get("ele") for f in feats] == [2, None]
    assert [f.get("name") for f in feats] == ["waypoint name", None]
    assert [f.get("link1_href") for f in feats] == ["href", None]
    assert [f.get("link1_text") for f in feats] == ["text", None]
    assert [f.get("link1_type") for f in feats] == ["type", None]
    assert [f.get("link2_href") for f in feats] == ["href2", None]
    assert [f.get("time") for f in feats] == \
        ["2007/11/25 17:58:00+01", None]
    assert feats[0]["wkt"] == "POINT (1 0)"
    assert feats[1]["wkt"] == "POINT (4 3)"


@needs_ref
def test_routes_layer():
    """test_ogr_gpx_2: route linestrings incl. the empty route."""
    feats = gpx.parse_gpx(_load(), "routes")
    assert feats[0]["wkt"] == "LINESTRING (6 5,9 8,12 11)"
    assert feats[1]["wkt"] == "LINESTRING EMPTY"


@needs_ref
def test_route_points_layer():
    """test_ogr_gpx_3."""
    feats = gpx.parse_gpx(_load(), "route_points")
    assert [f.get("name") for f in feats] == \
        ["route point name", None, None]
    assert feats[0]["wkt"] == "POINT (6 5)"
    assert feats[0]["route_fid"] == 0
    assert feats[0]["route_point_id"] == 0


@needs_ref
def test_tracks_layer():
    """test_ogr_gpx_4: multilinestrings; pointless segments drop,
    empty tracks (with or without <trkseg>) are MULTILINESTRING
    EMPTY."""
    feats = gpx.parse_gpx(_load(), "tracks")
    assert feats[0]["wkt"] == \
        "MULTILINESTRING ((15 14,18 17),(21 20,24 23))"
    assert feats[1]["wkt"] == "MULTILINESTRING EMPTY"
    assert feats[2]["wkt"] == "MULTILINESTRING EMPTY"


@needs_ref
def test_track_points_layer():
    """test_ogr_gpx_5."""
    feats = gpx.parse_gpx(_load(), "track_points")
    assert [f.get("name") for f in feats] == \
        ["track point name", None, None, None]
    assert feats[0]["wkt"] == "POINT (15 14)"
    assert [f["track_fid"] for f in feats] == [0, 0, 0, 0]
    assert [f["track_seg_id"] for f in feats] == [0, 0, 1, 1]
    assert [f["track_seg_point_id"] for f in feats] == [0, 1, 0, 1]


@needs_ref
def test_ele_as_25d():
    """test_ogr_gpx_ELE_AS_25D: z from <ele>."""
    feats = gpx.parse_gpx(_load(), "waypoints", ele_as_25d=True)
    assert feats[0]["wkt"] == "POINT Z (1 0 2)"
    routes = gpx.parse_gpx(_load(), "routes", ele_as_25d=True)
    assert routes[0]["wkt"] == "LINESTRING Z (6 5 7,9 8 10,12 11 13)"


@needs_ref
def test_short_names():
    """test_ogr_gpx_SHORT_NAMES: trksegid etc."""
    feats = gpx.parse_gpx(_load(), "track_points", short_names=True)
    assert feats[0]["trksegid"] == 0
    assert feats[0]["trksegptid"] == 0


@needs_ref
def test_n_max_links():
    """test_ogr_gpx_N_MAX_LINKS: third link only with the option."""
    feats = gpx.parse_gpx(_load(), "waypoints", n_max_links=3)
    assert feats[0]["link3_href"] == "href3"
    assert feats[1].get("link3_href") is None
    default = gpx.parse_gpx(_load(), "waypoints")
    assert "link3_href" not in default[0]


@needs_ref
def test_metadata_read_with_reference_quirk():
    """test_ogr_gpx_metadata_read — the exact published dict,
    including LINK_2_TEXT == "text3" from the stale in-link flag."""
    md = gpx.parse_gpx_metadata(_load())
    assert md == {
        "AUTHOR_EMAIL": "foo@example.com",
        "AUTHOR_LINK_HREF": "author_href",
        "AUTHOR_LINK_TEXT": "author_text",
        "AUTHOR_LINK_TYPE": "author_type",
        "AUTHOR_NAME": "metadata author name",
        "COPYRIGHT_AUTHOR": "copyright author",
        "COPYRIGHT_LICENSE": "my license",
        "COPYRIGHT_YEAR": "2023",
        "DESCRIPTION": "metadata desc",
        "KEYWORDS": "kw",
        "LINK_1_HREF": "href",
        "LINK_1_TEXT": "text",
        "LINK_1_TYPE": "type",
        "LINK_2_HREF": "href2",
        "LINK_2_TEXT": "text3",
        "LINK_2_TYPE": "type3",
        "NAME": "metadata name",
        "TIME": "2007-11-25T17:58:00+01:00",
    }


@needs_ref
def test_writer_matches_reference_bytes():
    """test_ogr_gpx_8: grouped route_points + track_points serialize
    to the exact published reference bytes."""
    rpts = [
        {"wkt": "POINT(2 49)", "route_name": "ROUTE_NAME", "route_fid": 0},
        {"wkt": "POINT(3 50)", "route_name": "--ignored--", "route_fid": 0},
        {"wkt": "POINT(3 51)", "route_name": "ROUTE_NAME2", "route_fid": 1},
        {"wkt": "POINT(3 49)", "route_fid": 1},
    ]
    tpts = [
        {"wkt": "POINT(2 49)", "track_name": "TRACK_NAME",
         "track_fid": 0, "track_seg_id": 0},
        {"wkt": "POINT(3 50)", "track_name": "--ignored--",
         "track_fid": 0, "track_seg_id": 0},
        {"wkt": "POINT(3 51)", "track_fid": 0, "track_seg_id": 1},
        {"wkt": "POINT(3 49)", "track_name": "TRACK_NAME2",
         "track_fid": 1, "track_seg_id": 0},
    ]
    doc = gpx.write_gpx("route_points", rpts)
    doc = doc[:doc.rfind("</gpx>")] \
        + gpx.write_gpx("track_points", tpts).split("\n", 2)[2]
    ref = open(os.path.join(DATA, "ogr_gpx_8_ref.txt")).read()
    assert ref in doc


@needs_ref
def test_track_with_time_extension():
    """test_ogr_gpx_9 (#6237): <time> at track level parses fine."""
    feats = gpx.parse_gpx(_load("track_with_time_extension.gpx"),
                          "tracks")
    assert len(feats) >= 1
    assert feats[0]["wkt"].startswith("MULTILINESTRING")


@needs_ref
def test_roundtrip_through_writer():
    """CreateCopy-style round trip (test_ogr_gpx_6 semantics)."""
    src = gpx.parse_gpx(_load(), "waypoints")
    doc = gpx.write_gpx("waypoints", src)
    back = gpx.parse_gpx(doc.encode(), "waypoints")
    assert [f["wkt"] for f in back] == [f["wkt"] for f in src]
    assert [f.get("name") for f in back] == [f.get("name") for f in src]
    assert [f.get("ele") for f in back] == [f.get("ele") for f in src]


@needs_ref
def test_metadata_write_roundtrip():
    """test_ogr_gpx_metadata_write: written metadata reads back."""
    md = {
        "AUTHOR_EMAIL": "foo@example.com",
        "AUTHOR_LINK_HREF": "author_href",
        "AUTHOR_LINK_TEXT": "author_text",
        "AUTHOR_LINK_TYPE": "author_type",
        "AUTHOR_NAME": "metadata author name",
        "COPYRIGHT_AUTHOR": "copyright author",
        "COPYRIGHT_LICENSE": "my license",
        "COPYRIGHT_YEAR": "2023",
        "DESCRIPTION": "metadata desc",
        "KEYWORDS": "kw",
        "LINK_1_HREF": "href",
        "LINK_1_TEXT": "text",
        "LINK_1_TYPE": "type",
        "NAME": "metadata name",
        "TIME": "2007-11-25T17:58:00+01:00",
    }
    doc = gpx.write_gpx("waypoints", [], metadata=md)
    assert gpx.parse_gpx_metadata(doc.encode()) == md


def test_not_gpx():
    with pytest.raises(Exception):
        gpx.parse_gpx(b"<kml></kml>", "waypoints")
