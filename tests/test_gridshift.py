"""NTv2 datum-shift grids (functions/gridshift.py).

External oracle: the reference autotest's .gsb fixtures with
GDAL-published expectations (``autotest/gdrivers/ntv2.py``: band 2
checksum 10, the driver geotransform formula of
``frmts/raw/ntv2dataset.cpp:511-516``) in BOTH endiannesses.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from gdal_spark.functions.gridshift import GridShift, NTv2SubGrid, ntv2_raster, read_ntv2

REF = "/root/reference/autotest/gdrivers/data/ntv2"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference autotest data not available"
)


@needs_ref
@pytest.mark.parametrize("name", ["test_ntv2_le.gsb", "test_ntv2_be.gsb"])
def test_parse_matches_gdal_driver(name):
    p = f"{REF}/{name}"
    gt, (b1, b2) = ntv2_raster(p)
    # driver formula: xorig=(w_long-inc/2)/3600, yorig=(n_lat+inc/2)/3600
    # (autotest's pinned gt passes within gdaltest's pixel/100 epsilon)
    assert gt[1] == pytest.approx(7.8) and gt[5] == pytest.approx(-5.55)
    assert gt[0] == pytest.approx(-5.55) and gt[3] == pytest.approx(52.05)
    from gdal_spark.raster.checksum import checksum_band

    assert checksum_band(b2) == 10  # autotest: GDALTest("NTV2", f, 2, 10)
    g = read_ntv2(p)[0]
    assert g.shape == (2, 2)
    # both endiannesses must decode to identical arrays
    le = read_ntv2(f"{REF}/test_ntv2_le.gsb")[0]
    assert np.array_equal(g.lat_shift, le.lat_shift)
    assert np.array_equal(g.lon_shift_w, le.lon_shift_w)


def _toy_grid():
    # 3x3 grid over lon [0, 2], lat [50, 52]: Δlat = 3600*0.01*lat-ish
    lat_s = np.array(
        [[3.6, 7.2, 10.8], [7.2, 10.8, 14.4], [10.8, 14.4, 18.0]]
    )
    lon_w = np.full((3, 3), -36.0)  # +0.01° east everywhere
    return NTv2SubGrid(
        "TOY", "NONE", 50.0, 52.0, 0.0, 2.0, 1.0, 1.0, lat_s, lon_w
    )


def test_bilinear_node_and_midpoint():
    gs = GridShift([_toy_grid()])
    # exact node: shift equals the node value
    lon, lat = gs.forward(np.array([0.0]), np.array([50.0]))
    assert lat[0] == pytest.approx(50.0 + 3.6 / 3600.0)
    assert lon[0] == pytest.approx(0.0 + 36.0 / 3600.0)
    # cell midpoint: average of the four corners
    lon, lat = gs.forward(np.array([0.5]), np.array([50.5]))
    assert lat[0] == pytest.approx(50.5 + (3.6 + 7.2 + 7.2 + 10.8) / 4 / 3600.0)


def test_inverse_fixed_point_roundtrip():
    gs = GridShift([_toy_grid()])
    rng = np.random.default_rng(5)
    lon = rng.uniform(0.1, 1.9, 50)
    lat = rng.uniform(50.1, 51.9, 50)
    lo2, la2 = gs.forward(lon, lat)
    lo3, la3 = gs.inverse(lo2, la2)
    assert np.abs(lo3 - lon).max() < 1e-9
    assert np.abs(la3 - lat).max() < 1e-9


def test_outside_grid_passthrough():
    gs = GridShift([_toy_grid()])
    lon, lat = gs.forward(np.array([10.0]), np.array([10.0]))
    assert lon[0] == 10.0 and lat[0] == 10.0


def test_crs_grid_shift_hook():
    """with_grid_shift: the grid takes precedence over the Helmert in
    the transformer chain, both directions consistent."""
    from gdal_spark.functions import proj as P

    crs = P.with_grid_shift(P.lookup(4277), GridShift([_toy_grid()]))
    lon, lat = P.to_lonlat_wgs84(crs, np.array([0.5]), np.array([50.5]))
    assert lon[0] == pytest.approx(0.5 + 0.01)
    x, y = P.from_lonlat_wgs84(crs, lon, lat)
    assert x[0] == pytest.approx(0.5, abs=1e-9)
    assert y[0] == pytest.approx(50.5, abs=1e-9)
    # without the grid the Helmert path gives a very different answer
    lon_h, lat_h = P.to_lonlat_wgs84(P.lookup(4277), np.array([0.5]), np.array([50.5]))
    assert abs(lon_h[0] - lon[0]) > 1e-4


@needs_ref
def test_real_gsb_through_the_chain():
    from gdal_spark.functions import proj as P

    gs = GridShift.from_file(f"{REF}/test_ntv2_le.gsb")
    crs = P.with_grid_shift(P.lookup(4277), gs)
    g = gs.grids[0]
    lon0 = (g.w_lon + g.e_lon) / 2
    lat0 = (g.s_lat + g.n_lat) / 2
    lon, lat = P.to_lonlat_wgs84(crs, np.array([lon0]), np.array([lat0]))
    x, y = P.from_lonlat_wgs84(crs, lon, lat)
    assert x[0] == pytest.approx(lon0, abs=1e-9)
    assert y[0] == pytest.approx(lat0, abs=1e-9)
