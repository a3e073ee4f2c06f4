"""GCP polynomial / TPS transformer tests with independent oracles.

The fit kernels (gdal_spark.functions.gcp) re-express
``GDALCreateGCPTransformer`` (alg/gdal_crs.cpp:594) and
``GDALCreateTPSTransformer`` (alg/thinplatespline.cpp:180). Oracles
here are independent re-derivations: explicit normal equations solved
by a different route than the kernel's lstsq, scalar per-pixel warp
loops, and the TPS side conditions from the spline's definition —
never the kernel under test calling itself.
"""

import numpy as np
import pytest

from gdal_spark.functions.gcp import (
    GCPTransformer,
    PolyTransform,
    TPSTransform,
    poly_terms,
)


def _grid_gcps(n=5, w=512.0, h=512.0):
    u, v = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    return u.ravel() * w, v.ravel() * h


class TestPolyFit:
    def test_exact_recovery_per_order(self):
        """An order-k polynomial mapping is recovered exactly by the
        order-k fit (the CRS_georef least-squares is interpolating when
        the model class contains the truth)."""
        px, py = _grid_gcps()
        truths = {
            1: (lambda x, y: 3.0 + 0.5 * x - 0.25 * y,
                lambda x, y: -2.0 + 0.125 * x + 0.75 * y),
            2: (lambda x, y: 1.0 + 0.01 * x + 0.02 * y + 1e-4 * x * y + 2e-4 * y * y,
                lambda x, y: 0.5 - 0.03 * x + 3e-4 * x * x),
            3: (lambda x, y: 1e-6 * x ** 3 - 2e-6 * x * y * y + 0.004 * x + 1.0,
                lambda x, y: 5e-7 * y ** 3 + 1e-6 * x * x * y - 0.002 * y),
        }
        qx = np.array([17.0, 303.5, 450.25])
        qy = np.array([41.0, 99.5, 501.75])
        for order, (fx, fy) in truths.items():
            t = PolyTransform(px, py, fx(px, py), fy(px, py), order)
            ox, oy = t(qx, qy)
            np.testing.assert_allclose(ox, fx(qx, qy), rtol=0, atol=1e-7)
            np.testing.assert_allclose(oy, fy(qx, qy), rtol=0, atol=1e-7)

    def test_against_independent_normal_equations(self):
        """Over-determined noisy fit: kernel lstsq vs an independent
        mean-centered normal-equations solve (AtA x = At b via
        np.linalg.solve — a different algorithm and code path)."""
        rng = np.random.default_rng(11)
        px = rng.uniform(0, 1000, 40)
        py = rng.uniform(0, 1000, 40)
        gx = 5.0 + 0.01 * px - 0.002 * py + rng.normal(0, 0.5, 40)
        gy = 7.0 + 0.003 * px + 0.011 * py + rng.normal(0, 0.5, 40)
        t = PolyTransform(px, py, gx, gy, 2)
        A = poly_terms(px - px.mean(), py - py.mean(), 2)
        ex = np.linalg.solve(A.T @ A, A.T @ gx)
        ey = np.linalg.solve(A.T @ A, A.T @ gy)
        qx = rng.uniform(0, 1000, 7)
        qy = rng.uniform(0, 1000, 7)
        Q = poly_terms(qx - px.mean(), qy - py.mean(), 2)
        ox, oy = t(qx, qy)
        np.testing.assert_allclose(ox, Q @ ex, rtol=1e-10)
        np.testing.assert_allclose(oy, Q @ ey, rtol=1e-10)

    def test_term_order_matches_crs_georef(self):
        """poly_terms column order is the CRS_georef triangular order
        [1, x, y, x2, xy, y2, x3, x2y, xy2, y3] (gdal_crs.cpp:841)."""
        x = np.array([2.0])
        y = np.array([3.0])
        np.testing.assert_array_equal(
            poly_terms(x, y, 3)[0],
            [1, 2, 3, 4, 6, 9, 8, 12, 18, 27],
        )

    def test_underdetermined_raises(self):
        with pytest.raises(ValueError, match="needs >= 6"):
            PolyTransform([0, 1, 2], [0, 1, 2], [0, 1, 2], [0, 1, 2], 2)
        with pytest.raises(ValueError, match="order must be 1..3"):
            poly_terms(np.zeros(3), np.zeros(3), 4)


class TestTPS:
    def test_interpolates_exactly_at_gcps(self):
        rng = np.random.default_rng(3)
        px = rng.uniform(0, 100, 15)
        py = rng.uniform(0, 100, 15)
        gx = rng.uniform(-50, 50, 15)
        gy = rng.uniform(-50, 50, 15)
        t = TPSTransform(px, py, gx, gy)
        ox, oy = t(px, py)
        np.testing.assert_allclose(ox, gx, rtol=0, atol=1e-8)
        np.testing.assert_allclose(oy, gy, rtol=0, atol=1e-8)

    def test_side_conditions(self):
        """The spline definition requires sum(w) = sum(w x) = sum(w y)
        = 0 (thinplatespline.cpp solve block) — checked directly on the
        solved weights."""
        rng = np.random.default_rng(4)
        px = rng.uniform(0, 10, 12)
        py = rng.uniform(0, 10, 12)
        t = TPSTransform(px, py, rng.normal(size=12), rng.normal(size=12))
        for col in range(2):
            w = t.w[:, col]
            assert abs(w.sum()) < 1e-9
            assert abs((w * px).sum()) < 1e-8
            assert abs((w * py).sum()) < 1e-8

    def test_affine_data_yields_affine_spline(self):
        """TPS of exactly-affine data reduces to the affine (all
        radial weights ~0), so off-GCP points are exact too."""
        px, py = _grid_gcps(n=4, w=10, h=10)
        gx = 1.0 + 2.0 * px - 0.5 * py
        gy = -3.0 + 0.25 * px + 1.5 * py
        t = TPSTransform(px, py, gx, gy)
        assert np.abs(t.w).max() < 1e-9
        qx = np.array([3.7, 8.21])
        qy = np.array([1.9, 6.03])
        ox, oy = t(qx, qy)
        np.testing.assert_allclose(ox, 1.0 + 2.0 * qx - 0.5 * qy, atol=1e-8)
        np.testing.assert_allclose(oy, -3.0 + 0.25 * qx + 1.5 * qy, atol=1e-8)

    def test_shape_preserved(self):
        px, py = _grid_gcps(n=3, w=4, h=4)
        t = TPSTransform(px, py, px * 2, py * 3)
        gx, gy = np.meshgrid(np.linspace(0, 4, 5), np.linspace(0, 4, 7))
        ox, oy = t(gx, gy)
        assert ox.shape == (7, 5) and oy.shape == (7, 5)


class TestGCPTransformer:
    def test_bidirectional_independent_fits(self):
        """fwd and inv are independently fitted (GDAL fits both
        directions, gdal_crs.cpp:654) — for affine truth the round trip
        is exact."""
        rng = np.random.default_rng(9)
        px = rng.uniform(0, 512, 20)
        py = rng.uniform(0, 512, 20)
        gx = 100.0 + 0.5 * px - 0.1 * py
        gy = 200.0 - 0.2 * px + 0.7 * py
        g = np.column_stack([px, py, gx, gy])
        for method in ("poly1", "poly2", "tps"):
            t = GCPTransformer(g, method)
            fx, fy = t.fwd(px, py)
            ix, iy = t.inv(fx, fy)
            np.testing.assert_allclose(ix, px, atol=1e-6)
            np.testing.assert_allclose(iy, py, atol=1e-6)

    def test_residuals(self):
        g = np.array([[0, 0, 0, 0], [1, 0, 1, 0], [0, 1, 0, 1], [1, 1, 1, 1.5]],
                     dtype=float)
        t = GCPTransformer(g, "poly1")
        r = t.residuals(g)
        assert r.shape == (4,)
        assert r.max() > 0.05  # the bent corner can't fit an affine
        # lstsq minimizes the same SSE the residuals measure: any
        # perturbed affine must do worse (independent optimality check)
        A = np.column_stack([np.ones(4), g[:, 0] - g[:, 0].mean(), g[:, 1] - g[:, 1].mean()])
        best = (r ** 2).sum()
        rng = np.random.default_rng(0)
        for _ in range(50):
            ex = t.fwd.ex + rng.normal(0, 1e-3, 3)
            ny = t.fwd.ny + rng.normal(0, 1e-3, 3)
            sse = ((A @ ex - g[:, 2]) ** 2 + (A @ ny - g[:, 3]) ** 2).sum()
            assert sse >= best - 1e-12

    def test_unknown_method(self):
        with pytest.raises(ValueError, match="unknown GCP method"):
            GCPTransformer([[0, 0, 0, 0]] * 4, "rubbersheet")


class TestWarpGCP:
    def test_scalar_rederivation(self):
        """warp_gcp_array vs an independent per-pixel loop: re-fit the
        inverse via explicit normal equations, walk every dst pixel,
        bilinear-sample by hand."""
        from gdal_spark.raster.pipeline import synth_gcps, warp_gcp_array
        from gdal_spark.sources.synth import synth_pixels

        arr = synth_pixels("img000000000600", 64, 48).astype(np.float64)
        gcps = synth_gcps(600, 64, 48, 10.0, 40.0, 10.01, 40.008)
        out, valid, _ = warp_gcp_array(
            arr.astype(np.uint8), gcps, "poly2", 16, 12, "bilinear"
        )

        # independent inverse fit (geo -> pixel), normal equations
        gx, gy = gcps[:, 2], gcps[:, 3]
        mx, my = gx.mean(), gy.mean()
        A = poly_terms(gx - mx, gy - my, 2)
        cx = np.linalg.solve(A.T @ A, A.T @ gcps[:, 0])
        cy = np.linalg.solve(A.T @ A, A.T @ gcps[:, 1])
        x0, x1 = gx.min(), gx.max()
        y0, y1 = gy.min(), gy.max()
        h, w = arr.shape[:2]
        for r in range(12):
            for c in range(16):
                X = x0 + (c + 0.5) * (x1 - x0) / 16
                Y = y1 - (r + 0.5) * (y1 - y0) / 12
                tt = poly_terms(np.array([X - mx]), np.array([Y - my]), 2)
                sx = float((tt @ cx)[0])
                sy = float((tt @ cy)[0])
                # hand bilinear at pixel-center registration
                fx, fy = sx - 0.5, sy - 0.5
                ix, iy = int(np.floor(fx)), int(np.floor(fy))
                if ix < 0 or iy < 0 or ix + 1 >= w or iy + 1 >= h:
                    continue  # edge handling covered by the kernel tests
                wx, wy = fx - ix, fy - iy
                exp = (
                    arr[iy, ix] * (1 - wx) * (1 - wy)
                    + arr[iy, ix + 1] * wx * (1 - wy)
                    + arr[iy + 1, ix] * (1 - wx) * wy
                    + arr[iy + 1, ix + 1] * wx * wy
                )
                assert valid[r, c]
                np.testing.assert_allclose(out[r, c], exp.round().clip(0, 255), atol=1)

    def test_poly2_fits_synth_ripple_exactly(self):
        """synth_gcps' ripple is bilinear+quadratic, inside the order-2
        model class: rms must be fp-zero for poly2/poly3/tps, nonzero
        for poly1 whenever the okey ripple coefficients are nonzero."""
        from gdal_spark.raster.pipeline import synth_gcps
        from gdal_spark.functions.gcp import GCPTransformer

        gcps = synth_gcps(601, 256, 256, 0.0, 0.0, 0.01, 0.01)
        for m, bound in (("poly1", 1e-6), ("poly2", 1e-12), ("tps", 1e-12)):
            t = GCPTransformer(gcps, m)
            rms = float(np.sqrt((t.residuals(gcps) ** 2).mean()))
            if m == "poly1":
                assert rms > bound
            else:
                assert rms < bound
