"""OGR feature-style string parsing (ogr/ogrfeaturestyle.cpp).

The reference stores per-feature drawing instructions as style
strings — ``PEN(c:#FF0000,w:5px);BRUSH(fc:#00AA55,id:"ogr-brush-1")``
— parsed by OGRStyleMgr/OGRStyleTool into typed params
(ogr/ogrfeaturestyle.cpp:38-89 param tables: PEN c/w/id, BRUSH fc/id/s,
SYMBOL id/c/s, LABEL f/s/t/c). Values may be double-quoted when they
contain commas (OGRStyleTool::Parse). Colors are ``#RRGGBB[AA]``
(GetRGBFromString, ogrfeaturestyle.cpp:1524 — sscanf ``#%2x%2x%2x%2x``,
alpha defaults opaque). Numeric params carry a unit suffix
g/px/pt/mm/cm/in, default MM (OGRSTUMM, ogr_featurestyle.h:161),
converted through meters by ComputeWithUnit (ogrfeaturestyle.cpp:1920:
px and pt divide by 72*39.37, mm ×0.001, cm ×0.01, in /39.37).

Spark re-expression: everything is JVM-side ``regexp_extract`` /
``conv`` column expressions — style parsing is a pure scalar string
transform, so at 100 TB it rides whole-stage codegen with no UDFs and
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# meters-per-unit, Python-computed once and repr()'d into SQL text so
# Spark and any oracle evaluate the identical double literal
# (ComputeWithUnit, ogrfeaturestyle.cpp:1920-1978); ground ('g') needs
# the tool's m_dfScale and is left NULL here
UNIT_TO_M: dict[str, float] = {
    "px": 1.0 / (72.0 * 39.37),
    "pt": 1.0 / (72.0 * 39.37),
    "mm": 0.001,
    "cm": 0.01,
    "in": 1.0 / 39.37,
    "": 0.001,  # default unit is MM (ogr_featurestyle.h:161)
}


def style_tool(style: Column | str, tool: str) -> Column:
    """Param string of one tool in a multi-tool style (OGRStyleMgr::
    GetPart splits on ';' outside quotes; tool grammar
    ogrfeaturestyle.cpp:498+). Missing tool → NULL."""
    c = F.col(style) if isinstance(style, str) else style
    got = F.regexp_extract(c, tool + r"\(([^)]*)\)", 1)
    return F.when(c.rlike(tool + r"\("), got)


def style_param(style: Column | str, tool: str, key: str) -> Column:
    """One param value of one tool (OGRStyleTool::GetParamStr):
    ``key:value`` with value either bare (up to the next comma) or
    double-quoted (commas allowed inside). Missing → NULL."""
    params = style_tool(style, tool)
    raw = F.regexp_extract(params, r"(?:^|,)" + key + r':("[^"]*"|[^,]*)', 1)
    unq = F.regexp_replace(raw, r'^"|"$', "")
    return F.when(params.isNotNull() & (raw != ""), unq)


def style_color(value: Column) -> Column:
    """#RRGGBB[AA] → struct(r, g, b, a) ints (GetRGBFromString,
    ogrfeaturestyle.cpp:1524); alpha defaults to 255 (opaque, :1551).
    Malformed → NULL struct fields."""

    def hex2(pos: int) -> Column:
        return F.conv(F.substring(value, pos, 2), 16, 10).cast("int")

    ok = value.rlike(r"^#[0-9a-fA-F]{6}([0-9a-fA-F]{2})?$")
    return F.struct(
        F.when(ok, hex2(2)).alias("r"),
        F.when(ok, hex2(4)).alias("g"),
        F.when(ok, hex2(6)).alias("b"),
        F.when(
            ok, F.when(F.length(value) >= 9, hex2(8)).otherwise(F.lit(255))
        ).alias("a"),
    )


def style_num_m(value: Column) -> Column:
    """Numeric param with unit suffix → meters (GetParamDbl +
    ComputeWithUnit): '5px' → 5/(72*39.37); bare number → MM default.
    Ground units ('g') need the tool scale → NULL here."""
    num = F.regexp_extract(value, r"^([-+]?[0-9.]+)", 1).cast("double")
    unit = F.regexp_extract(value, r"([a-z]+)$", 1)
    factor = F.lit(None).cast("double")
    for u, m in UNIT_TO_M.items():
        factor = F.when(unit == u, F.lit(m)).otherwise(factor)
    return num * factor
