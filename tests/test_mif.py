"""MapInfo MIF/MID reader vs the reference's published oracle
(``autotest/ogr/ogr_mitab.py`` + the shipped
``all_geoms.mif.golden.csv`` — the reference's own golden WKTs)."""

from __future__ import annotations

import csv
import os
import re

import pytest

from gdal_spark.sources import mif

D = "/root/reference/autotest/ogr/data/mitab"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(D), reason="reference autotest data absent")


def _coords(wkt):
    return [float(v) for v in
            re.findall(r"-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?", wkt)]


@needs_ref
def test_all_geoms_against_golden_csv():
    """test_ogr_mitab_39: every feature of all_geoms.mif matches the
    reference's golden WKT vertex-for-vertex — including the
    RoundRect/Ellipse/Arc tessellations and the Text rotation
    rule."""
    feats, _ = mif.parse_mif(open(f"{D}/all_geoms.mif").read())
    golden = list(csv.DictReader(open(f"{D}/all_geoms.mif.golden.csv")))
    assert len(feats) == len(golden) == 16
    for f, g in zip(feats, golden):
        a, b = f["wkt"], g["WKT"]
        assert a.split("(")[0].strip() == b.split("(")[0].strip()
        ca, cb = _coords(a), _coords(b)
        assert len(ca) == len(cb), (a[:50], b[:50])
        for x, y in zip(ca, cb):
            assert abs(x - y) <= 1e-7


@needs_ref
def test_small_mif_fields_and_polygon():
    """test_ogr_mitab_10: NAME / FLOODZONE / the doubled-quote OWNER
    and the published polygon."""
    feats, cols = mif.parse_mif(open(f"{D}/small.mif").read(),
                                open(f"{D}/small.mid").read())
    f = feats[0]
    assert f["NAME"] == " S. 11th St."
    assert f["FLOODZONE"] == 10
    want = ("POLYGON ((407131.721 155322.441,407134.468 155329.616,"
            "407142.741 155327.242,407141.503 155322.467,"
            "407140.875 155320.049,407131.721 155322.441))")
    ca, cb = _coords(f["wkt"]), _coords(want)
    assert len(ca) == len(cb)
    for x, y in zip(ca, cb):
        assert abs(x - y) <= 1e-9
    assert feats[1]["OWNER"] == 'Guarino "Chucky" Sandra'
    assert [c[0] for c in cols] == ["NAME", "DATA", "OWNER",
                                    "APPRAISED_VALUE", "TAXES",
                                    "FLOODZONE", "NUM"]


@needs_ref
def test_tab_delimiter_empty_first_field():
    """test in ogr_mitab.py:1772: tab-delimited .mid with an empty
    first field."""
    feats, _ = mif.parse_mif(
        open(f"{D}/empty_first_field_with_tab_delimiter.mif").read(),
        open(f"{D}/empty_first_field_with_tab_delimiter.mid").read())
    assert feats[0]["field1"] == ""
    assert feats[0]["field2"] == "foo"


@needs_ref
def test_nomid_opens():
    """test_ogr_mitab_nomid: a .mif without its .mid still reads."""
    feats, cols = mif.parse_mif(open(f"{D}/nomid.mif").read())
    assert len(feats) >= 1
    assert feats[0]["wkt"] is not None
