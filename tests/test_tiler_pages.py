"""gdal2tiles sidecar outputs: KML superoverlay, TMS xml, viewer html.

Reference: ``osgeo_utils/gdal2tiles.py`` generate_kml (:2740+),
generate_tilemapresource, generate_leaflet.
"""

import re
import xml.etree.ElementTree as ET

from gdal_spark.functions.tile_math import GlobalGeodetic
from gdal_spark.raster import tiler_pages as TP


def test_kml_bounds_match_global_geodetic_oracle(spark):
    zoom = 5
    tiles = spark.createDataFrame(
        [(10, 3), (31, 17), (0, 0), (63, 31)], "tx int, ty int")
    out = {(r.tx, r.ty): r for r in
           TP.kml_superoverlay(tiles, zoom).collect()}
    gg = GlobalGeodetic(tmscompatible=True)
    for (tx, ty), r in out.items():
        w, s, e, n = gg.TileBounds(tx, ty, zoom)
        m = re.search(r"<LatLonAltBox><north>([^<]+)</north><south>([^<]+)"
                      r"</south><east>([^<]+)</east><west>([^<]+)</west>",
                      r.kml)
        assert (float(m.group(1)), float(m.group(2)),
                float(m.group(3)), float(m.group(4))) == (n, s, e, w)
        assert r.n_links == 0
        # valid XML with the right structure
        root = ET.fromstring(r.kml)
        ns = "{http://www.opengis.net/kml/2.2}"
        doc = root.find(f"{ns}Document")
        assert doc.find(f"{ns}GroundOverlay") is not None


def test_kml_network_links_only_for_existing_children(spark):
    zoom = 4
    tiles = spark.createDataFrame([(4, 2), (9, 9)], "tx int, ty int")
    # children of (4,2): (8..9, 4..5); give it 3 of 4. (9,9) gets none
    children = spark.createDataFrame(
        [(8, 4), (8, 5), (9, 4), (30, 30)], "tx int, ty int")
    out = {(r.tx, r.ty): r for r in
           TP.kml_superoverlay(tiles, zoom, children=children).collect()}
    assert out[(4, 2)].n_links == 3
    assert out[(9, 9)].n_links == 0
    assert out[(4, 2)].kml.count("<NetworkLink>") == 3
    assert "5/8/4.kml" in out[(4, 2)].kml


def test_tilemapresource_structure():
    xml = TP.tilemapresource_xml("t", 2, 4, profile="geodetic")
    root = ET.fromstring(xml)
    assert root.find("SRS").text == "EPSG:4326"
    sets = root.find("TileSets").findall("TileSet")
    assert [s.get("order") for s in sets] == ["2", "3", "4"]
    # units-per-pixel halves per zoom
    u = [float(s.get("units-per-pixel")) for s in sets]
    assert u[0] == 2 * u[1] == 4 * u[2]
    bb = root.find("BoundingBox")
    assert float(bb.get("minx")) == -180.0 and float(bb.get("maxy")) == 90.0


def test_leaflet_html_has_layer_config():
    html = TP.leaflet_html("demo", 3, 8)
    assert "L.tileLayer('./{z}/{x}/{y}.png'" in html
    assert "minZoom: 3" in html and "maxZoom: 8" in html and "tms: true" in html
