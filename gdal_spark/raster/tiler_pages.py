"""gdal2tiles output sidecars: KML superoverlay, TMS + viewer files.

The reference's tiler emits more than tiles: per-tile KML documents
chained into a superoverlay (``osgeo_utils/gdal2tiles.py:generate_kml``,
the ``--kml`` / ``-k`` flag, geodetic profile), a TMS
``tilemapresource.xml`` (``generate_tilemapresource``), and HTML
viewers (``generate_leaflet`` / ``generate_openlayers``).

Spark-first mapping:

- :func:`kml_superoverlay` — the per-tile KML is pure string math over
  the tile key, so it is generated as **UDF-free Spark SQL columns**
  (concat/format over exact binary-fraction geodetic bounds) — one
  distributed projection, no Python, one row per tile.  NetworkLinks
  point at the children that actually exist (a left join against the
  z+1 tile set, exactly gdal2tiles' ``children`` check at :2827).
- :func:`tilemapresource_xml` / :func:`leaflet_html` — single tiny
  driver-side documents (they describe the whole pyramid), same as
  the reference writing them once at the end of a run.

Geodetic (tmscompatible) tile spans are ``180/2^z`` degrees — exact
binary fractions times 180, so every bound survives the SQL
double→string→double trip bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _geodetic_bounds(tx: Column, ty: Column, zoom: int):
    """TMS geodetic tile bounds (west, south, east, north) as exact
    binary-fraction doubles (GlobalGeodetic.TileBounds)."""
    span = 180.0 / (1 << zoom)
    west = tx.cast("double") * span - 180.0
    south = ty.cast("double") * span - 90.0
    return west, south, west + span, south + span


def _network_link(zoom: int) -> Column:
    """One child <NetworkLink> element (built from child tx/ty cols)."""
    cw, cs, ce, cn = _geodetic_bounds(F.col("ctx"), F.col("cty"), zoom + 1)
    href = F.format_string("%d/%d/%d.kml", F.lit(zoom + 1), F.col("ctx"),
                           F.col("cty"))
    return F.concat(
        F.lit("<NetworkLink><name>"), href, F.lit("</name><Region>"
              "<LatLonAltBox><north>"), cn.cast("string"),
        F.lit("</north><south>"), cs.cast("string"),
        F.lit("</south><east>"), ce.cast("string"),
        F.lit("</east><west>"), cw.cast("string"),
        F.lit("</west></LatLonAltBox>"
              "<Lod><minLodPixels>128</minLodPixels>"
              "<maxLodPixels>-1</maxLodPixels></Lod></Region>"
              "<Link><href>"), href,
        F.lit("</href><viewRefreshMode>onRegion</viewRefreshMode></Link>"
              "</NetworkLink>"),
    )


def kml_superoverlay(tiles: DataFrame, zoom: int,
                     children: DataFrame | None = None,
                     fmt: str = "png") -> DataFrame:
    """Per-tile superoverlay KML docs for one geodetic zoom level.

    ``tiles``: DataFrame with (tx, ty) TMS keys at ``zoom``.
    ``children``: the (tx, ty) set at ``zoom+1`` (NetworkLinks are
    emitted only for children that exist).  Output: one row per tile
    with columns (z, tx, ty, n_links, kml)."""
    t = tiles.select(
        F.col("tx").cast("int").alias("tx"),
        F.col("ty").cast("int").alias("ty")).distinct()
    if children is not None:
        ch = children.select(
            F.col("tx").cast("int").alias("ctx"),
            F.col("ty").cast("int").alias("cty")).distinct()
        ch = ch.withColumn("ptx", (F.col("ctx") / 2).cast("int")).withColumn(
            "pty", (F.col("cty") / 2).cast("int"))
        links = (
            t.join(ch, (t.tx == ch.ptx) & (t.ty == ch.pty), "left")
            .withColumn("link", F.when(F.col("ctx").isNotNull(),
                                       _network_link(zoom)))
            .groupBy("tx", "ty")
            .agg(
                F.count("link").alias("n_links"),
                F.concat_ws("", F.array_sort(F.collect_list("link"))
                            ).alias("links_xml"),
            )
        )
    else:
        links = t.withColumn("n_links", F.lit(0).cast("long")).withColumn(
            "links_xml", F.lit(""))

    w, s, e, n = _geodetic_bounds(F.col("tx"), F.col("ty"), zoom)
    name = F.format_string(f"%d/%d/%d.{fmt}", F.lit(zoom), F.col("tx"),
                           F.col("ty"))
    kml = F.concat(
        F.lit('<?xml version="1.0" encoding="utf-8"?>'
              '<kml xmlns="http://www.opengis.net/kml/2.2">'
              "<Document><name>"), name,
        F.lit("</name><Region><LatLonAltBox><north>"), n.cast("string"),
        F.lit("</north><south>"), s.cast("string"),
        F.lit("</south><east>"), e.cast("string"),
        F.lit("</east><west>"), w.cast("string"),
        F.lit("</west></LatLonAltBox>"
              "<Lod><minLodPixels>128</minLodPixels>"
              "<maxLodPixels>2048</maxLodPixels></Lod></Region>"
              f"<GroundOverlay><drawOrder>{zoom}</drawOrder><Icon><href>"),
        name,
        F.lit("</href></Icon><LatLonBox><north>"), n.cast("string"),
        F.lit("</north><south>"), s.cast("string"),
        F.lit("</south><east>"), e.cast("string"),
        F.lit("</east><west>"), w.cast("string"),
        F.lit("</west></LatLonBox></GroundOverlay>"),
        F.col("links_xml"),
        F.lit("</Document></kml>"),
    )
    return links.select(
        F.lit(zoom).alias("z"), "tx", "ty", "n_links", kml.alias("kml"))


def tilemapresource_xml(title: str, min_zoom: int, max_zoom: int,
                        profile: str = "geodetic",
                        tile_size: int = 256, fmt: str = "png") -> str:
    """TMS tilemapresource.xml (gdal2tiles generate_tilemapresource)."""
    if profile == "geodetic":
        srs, bbox = "EPSG:4326", (-180.0, -90.0, 180.0, 90.0)
        units_per_pixel = 180.0 / tile_size
    else:
        srs = "EPSG:3857"
        m = 20037508.342789244
        bbox = (-m, -m, m, m)
        units_per_pixel = 2 * m / tile_size
    sets = "\n".join(
        f'      <TileSet href="{z}" units-per-pixel="{units_per_pixel / (1 << z)!r}" order="{z}"/>'
        for z in range(min_zoom, max_zoom + 1))
    return f"""<?xml version="1.0" encoding="utf-8"?>
<TileMap version="1.0.0" tilemapservice="http://tms.osgeo.org/1.0.0">
  <Title>{title}</Title>
  <Abstract></Abstract>
  <SRS>{srs}</SRS>
  <BoundingBox minx="{bbox[0]!r}" miny="{bbox[1]!r}" maxx="{bbox[2]!r}" maxy="{bbox[3]!r}"/>
  <Origin x="{bbox[0]!r}" y="{bbox[1]!r}"/>
  <TileFormat width="{tile_size}" height="{tile_size}" mime-type="image/{fmt}" extension="{fmt}"/>
  <TileSets profile="{profile}">
{sets}
  </TileSets>
</TileMap>
"""


def leaflet_html(title: str, min_zoom: int, max_zoom: int,
                 url_template: str = "./{z}/{x}/{y}.png") -> str:
    """Minimal Leaflet viewer (gdal2tiles generate_leaflet analogue)."""
    tpl = url_template.replace("{", "{{").replace("}", "}}")
    tpl = tpl.replace("{{z}}", "{z}").replace("{{x}}", "{x}").replace(
        "{{y}}", "{y}")
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"/><title>{title}</title>
<link rel="stylesheet" href="https://unpkg.com/leaflet/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet/dist/leaflet.js"></script>
<style>html,body,#map{{height:100%;margin:0}}</style></head>
<body><div id="map"></div><script>
var map = L.map('map').setView([0, 0], {min_zoom});
L.tileLayer('{tpl}', {{minZoom: {min_zoom}, maxZoom: {max_zoom},
  tms: true, attribution: '{title}'}}).addTo(map);
</script></body></html>
"""
