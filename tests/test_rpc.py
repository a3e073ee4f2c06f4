"""RPC transformer tests with independent oracles.

The kernel (gdal_spark.functions.rpc) re-expresses
``GDALCreateRPCTransformer`` (alg/gdal_rpc.cpp). Oracles: a scalar
re-derivation of the 20-term basis written out long-hand from
``RPCComputeTerms`` (gdal_rpc.cpp:189), closed forms for degenerate
models, round-trip bounds for the iterative inverse, and a DuckDB run
of the generated SQL twin.
"""

import numpy as np
import pytest

from gdal_spark.functions.rpc import (
    RPCModel,
    RPCTransform,
    forward_sql,
    rpc_terms_np,
    synth_rpc,
)


def _scalar_terms(L, P, H):
    """RPCComputeTerms written out long-hand (independent of
    TERM_POWERS)."""
    return [
        1.0, L, P, H,
        L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
        P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
    ]


class TestTerms:
    def test_basis_matches_reference_order(self):
        rng = np.random.default_rng(5)
        for _ in range(10):
            L, P, H = rng.uniform(-1, 1, 3)
            got = rpc_terms_np(np.array([L]), np.array([P]), np.array([H]))[0]
            np.testing.assert_allclose(got, _scalar_terms(L, P, H), rtol=1e-15)


def _identity_model():
    """samp = 100 + 50*Lnorm, line = 200 - 80*Pnorm, no rational part."""
    m = RPCModel(
        line_off=200.0, line_scale=80.0, samp_off=100.0, samp_scale=50.0,
        long_off=10.0, long_scale=2.0, lat_off=45.0, lat_scale=1.0,
    )
    m.samp_num = np.zeros(20); m.samp_num[1] = 1.0
    m.line_num = np.zeros(20); m.line_num[2] = -1.0
    return m


class TestForward:
    def test_linear_model_closed_form(self):
        t = RPCTransform(_identity_model())
        lon = np.array([10.0, 11.0, 9.5])
        lat = np.array([45.0, 45.5, 44.0])
        s, l = t.forward(lon, lat)
        np.testing.assert_allclose(s, 100.0 + 50.0 * (lon - 10.0) / 2.0, rtol=1e-14)
        np.testing.assert_allclose(l, 200.0 - 80.0 * (lat - 45.0) / 1.0, rtol=1e-14)

    def test_rational_denominator_scalar_oracle(self):
        """Full model vs a per-point scalar loop using the long-hand
        basis and explicit num/den division."""
        m = synth_rpc(601, 256, 128, 10.0, 40.0, 10.01, 40.008)
        t = RPCTransform(m)
        rng = np.random.default_rng(8)
        lon = rng.uniform(10.0, 10.01, 25)
        lat = rng.uniform(40.0, 40.008, 25)
        s, l = t.forward(lon, lat)
        for i in range(25):
            L = (lon[i] - m.long_off) / m.long_scale
            P = (lat[i] - m.lat_off) / m.lat_scale
            terms = _scalar_terms(L, P, 0.0)
            sn = sum(c * v for c, v in zip(m.samp_num, terms))
            sd = sum(c * v for c, v in zip(m.samp_den, terms))
            ln = sum(c * v for c, v in zip(m.line_num, terms))
            ld = sum(c * v for c, v in zip(m.line_den, terms))
            assert abs(s[i] - (sn / sd * m.samp_scale + m.samp_off)) < 1e-9
            assert abs(l[i] - (ln / ld * m.line_scale + m.line_off)) < 1e-9

    def test_height_terms_active(self):
        m = synth_rpc(601, 256, 128, 10.0, 40.0, 10.01, 40.008)
        m.samp_num[3] = 0.01  # H term
        t = RPCTransform(m)
        s0, _ = t.forward(np.array([10.005]), np.array([40.004]), np.array([0.0]))
        s1, _ = t.forward(np.array([10.005]), np.array([40.004]), np.array([1.0]))
        expected = 0.01 * (1.0 / m.height_scale) * m.samp_scale
        assert abs((s1[0] - s0[0]) - expected) < 1e-9


class TestInverse:
    def test_round_trip(self):
        for okey in (600, 601, 1000, 1234):
            m = synth_rpc(okey, 512, 512, -3.0, 50.0, -2.99, 50.008)
            t = RPCTransform(m)
            rng = np.random.default_rng(okey)
            lon = rng.uniform(-3.0, -2.99, 40)
            lat = rng.uniform(50.0, 50.008, 40)
            s, l = t.forward(lon, lat)
            ilon, ilat = t.inverse(s, l)
            assert np.abs(ilon - lon).max() < 1e-9
            assert np.abs(ilat - lat).max() < 1e-9

    def test_linear_model_one_step(self):
        """For an affine model the linear first guess is already exact."""
        t = RPCTransform(_identity_model())
        lon, lat = t.inverse(np.array([125.0]), np.array([160.0]))
        np.testing.assert_allclose(lon, [11.0], atol=1e-10)
        np.testing.assert_allclose(lat, [45.5], atol=1e-10)


class TestSQLTwin:
    def test_duckdb_matches_numpy(self):
        duckdb = pytest.importorskip("duckdb")
        m = synth_rpc(777, 1024, 1024, -180.0, -85.0, 180.0, 85.0)
        t = RPCTransform(m)
        rng = np.random.default_rng(1)
        lon = rng.uniform(-179, 179, 50)
        lat = rng.uniform(-84, 84, 50)
        s, l = t.forward(lon, lat)
        samp_sql, line_sql = forward_sql(m, "lon", "lat")
        con = duckdb.connect()
        con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
        got = con.execute(
            f"SELECT {samp_sql} AS s, {line_sql} AS l FROM pts"
        ).fetchnumpy()
        # different summation order than NumPy → allclose, not equality
        np.testing.assert_allclose(got["s"], s, rtol=1e-9)
        np.testing.assert_allclose(got["l"], l, rtol=1e-9)

    def test_sql_has_no_zero_terms(self):
        m = synth_rpc(601, 256, 128, 10.0, 40.0, 10.01, 40.008)
        samp_sql, _ = forward_sql(m, "lon", "lat")
        # synth model: samp_num has 3 nonzero coefficients -> 3 literals
        assert samp_sql.count("CAST(") < 40  # sparse, not 80 dense terms


class TestOrtho:
    def test_scalar_rederivation(self):
        """rpc_orthorectify kernel path vs per-pixel loop with the
        long-hand basis + hand bilinear."""
        from gdal_spark.raster.warp import sample_at
        from gdal_spark.sources.synth import synth_pixels

        arr = synth_pixels("img000000000600", 64, 48)
        m = synth_rpc(600, 64, 48, 10.0, 40.0, 10.01, 40.008)
        t = RPCTransform(m)
        ow = oh = 8
        lon = 10.0 + (np.arange(ow) + 0.5) * 0.01 / ow
        lat = 40.008 - (np.arange(oh) + 0.5) * 0.008 / oh
        glon, glat = np.meshgrid(lon, lat)
        sx, sy = t.forward(glon, glat, np.zeros_like(glon))
        out, valid = sample_at(arr, sx, sy, "near")
        for r in range(oh):
            for c in range(ow):
                L = (glon[r, c] - m.long_off) / m.long_scale
                P = (glat[r, c] - m.lat_off) / m.lat_scale
                terms = _scalar_terms(L, P, 0.0)
                sn = sum(cc * v for cc, v in zip(m.samp_num, terms))
                sd = sum(cc * v for cc, v in zip(m.samp_den, terms))
                ln = sum(cc * v for cc, v in zip(m.line_num, terms))
                ld = sum(cc * v for cc, v in zip(m.line_den, terms))
                px = sn / sd * m.samp_scale + m.samp_off
                py = ln / ld * m.line_scale + m.line_off
                ix, iy = int(np.floor(px)), int(np.floor(py))
                if 0 <= ix < 64 and 0 <= iy < 48:
                    assert valid[r, c]
                    np.testing.assert_array_equal(out[r, c], arr[iy, ix])
