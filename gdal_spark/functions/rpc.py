"""RPC (rational polynomial coefficient) transformer — the third leg
of GDAL's GCP-transformer family, pure NumPy + a Spark-SQL twin.

Reference surfaces re-expressed:
- ``GDALCreateRPCTransformer`` (``alg/gdal_rpc.cpp``): RPC00B model,
  20-term cubic basis in ``RPCComputeTerms`` order
  (``gdal_rpc.cpp:189``) — [1, L, P, H, LP, LH, PH, LL, PP, HH, PLH,
  LLL, LPP, LHH, LLP, PPP, PHH, LLH, PPH, HHH] with L=normalized
  longitude, P=latitude, H=height — four coefficient vectors
  (LINE_NUM/DEN, SAMP_NUM/DEN, ``gcore/gdal.h:2317`` GDALRPCInfoV2),
  offset/scale normalization on both sides.
- Inverse: iterative refinement from a linear first guess
  (``RPCInverseTransformPoint``, ``gdal_rpc.cpp:1178``); this engine
  uses the same scheme (linear-approx Jacobian fixed point) without
  the optional DEM lookup — height is a constant per call, the
  ``RPC_HEIGHT`` transformer option.

Spark shape: the forward map is plain rational-polynomial arithmetic,
so the hot path for projecting billions of points is a generated SQL
expression (``forward_sql`` — JVM whole-stage codegen, shared verbatim
with the DuckDB oracle: identical text → identical IEEE op sequence →
bit-identical doubles). The NumPy twin backs the per-image ortho warp
where pixels are already inside an Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

#: index -> (L exponent, P exponent, H exponent), RPCComputeTerms order
TERM_POWERS = [
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 0, 0),
    (0, 2, 0), (0, 0, 2), (1, 1, 1), (3, 0, 0),
    (1, 2, 0), (1, 0, 2), (2, 1, 0), (0, 3, 0),
    (0, 1, 2), (2, 0, 1), (0, 2, 1), (0, 0, 3),
]


def rpc_terms_np(L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    """(..., 20) design tensor over normalized lon/lat/height."""
    L = np.asarray(L, np.float64)
    P = np.asarray(P, np.float64)
    H = np.broadcast_to(np.asarray(H, np.float64), L.shape)
    return np.stack([L**a * P**b * H**c for a, b, c in TERM_POWERS], axis=-1)


@dataclass
class RPCModel:
    """GDALRPCInfoV2 fields (gcore/gdal.h:2305-2331)."""

    line_off: float
    line_scale: float
    samp_off: float
    samp_scale: float
    long_off: float
    long_scale: float
    lat_off: float
    lat_scale: float
    height_off: float = 0.0
    height_scale: float = 1.0
    line_num: np.ndarray = field(default_factory=lambda: np.zeros(20))
    line_den: np.ndarray = field(default_factory=lambda: _unit())
    samp_num: np.ndarray = field(default_factory=lambda: np.zeros(20))
    samp_den: np.ndarray = field(default_factory=lambda: _unit())


def _unit() -> np.ndarray:
    v = np.zeros(20)
    v[0] = 1.0
    return v


class RPCTransform:
    """Forward (lon, lat, h) -> (samp=pixel, line) and iterative
    inverse, vectorized."""

    def __init__(self, model: RPCModel):
        self.m = model

    def forward(self, lon, lat, h=None):
        m = self.m
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        if h is None:
            h = np.full_like(lon, m.height_off)
        L = (lon - m.long_off) / m.long_scale
        P = (lat - m.lat_off) / m.lat_scale
        H = (np.asarray(h, np.float64) - m.height_off) / m.height_scale
        t = rpc_terms_np(L, P, H)

        # (t * c).sum(-1), not t @ c: the matvec would dispatch to BLAS
        # dgemv whose accumulation order can differ between the worker
        # thread pool and the single-process golden build; the masked
        # elementwise sum is a fixed left-to-right reduction, so warped
        # checksums are bit-stable across contexts
        def dot(c):
            return (t * c).sum(axis=-1)

        samp_n = dot(m.samp_num) / dot(m.samp_den)
        line_n = dot(m.line_num) / dot(m.line_den)
        return samp_n * m.samp_scale + m.samp_off, line_n * m.line_scale + m.line_off

    def _linear_approx(self):
        """Fit the PLToLatLong linear first guess the way the
        reference seeds its inverse (forward-evaluate around the
        offset point, invert the 2x2)."""
        m = self.m
        eps_lon = m.long_scale * 0.1
        eps_lat = m.lat_scale * 0.1
        s0, l0 = self.forward(m.long_off, m.lat_off)
        s1, l1 = self.forward(m.long_off + eps_lon, m.lat_off)
        s2, l2 = self.forward(m.long_off, m.lat_off + eps_lat)
        J = np.array(
            [[(s1 - s0) / eps_lon, (s2 - s0) / eps_lat],
             [(l1 - l0) / eps_lon, (l2 - l0) / eps_lat]],
            dtype=np.float64,
        )
        return np.linalg.inv(J), float(s0), float(l0)

    def inverse(self, samp, line, h=None, max_iter: int = 10, tol: float = 1e-8):
        """(samp, line) -> (lon, lat) by the reference's fixed-point
        scheme: linear first guess, then correct by the back-projected
        pixel error through the linear-approx inverse Jacobian
        (gdal_rpc.cpp RPCInverseTransformPoint, nMaxIterations=10 when
        no DEM)."""
        m = self.m
        samp = np.asarray(samp, np.float64)
        line = np.asarray(line, np.float64)
        Jinv, s0, l0 = self._linear_approx()
        lon = m.long_off + Jinv[0, 0] * (samp - s0) + Jinv[0, 1] * (line - l0)
        lat = m.lat_off + Jinv[1, 0] * (samp - s0) + Jinv[1, 1] * (line - l0)
        tol_px = tol * max(abs(m.samp_scale), abs(m.line_scale))
        for _ in range(max_iter):
            bs, bl = self.forward(lon, lat, h)
            ds = bs - samp
            dl = bl - line
            if max(np.abs(ds).max(initial=0.0), np.abs(dl).max(initial=0.0)) < tol_px:
                break
            lon = lon - (Jinv[0, 0] * ds + Jinv[0, 1] * dl)
            lat = lat - (Jinv[1, 0] * ds + Jinv[1, 1] * dl)
        return lon, lat


# ---------------------------------------------------------------------------
# Spark-SQL twin (shared verbatim with the DuckDB oracle)
# ---------------------------------------------------------------------------

def _term_sql(i: int) -> str:
    a, b, c = TERM_POWERS[i]
    parts = ["LN"] * a + ["PN"] * b + ["HN"] * c
    return " * ".join(parts) if parts else "1"


def _poly_sql(coef: np.ndarray) -> str:
    """Left-associated sum of the nonzero terms — both engines fold
    the identical IEEE add/mul sequence."""
    parts = []
    for i, c in enumerate(coef):
        if c == 0.0:
            continue
        t = _term_sql(i)
        lit = f"CAST({c!r} AS DOUBLE)"
        parts.append(lit if t == "1" else f"{lit} * {t}")
    return "(" + " + ".join(parts) + ")" if parts else "0.0"


def forward_sql(m: RPCModel, lon_expr: str, lat_expr: str, h_expr: str = "0.0") -> tuple[str, str]:
    """(samp_sql, line_sql) evaluating the forward RPC over column
    expressions, valid in BOTH Spark SQL and DuckDB. Coefficients are
    embedded as full-repr DOUBLE literals (17 significant digits round-
    trip exactly)."""

    def norm(e, off, scale):
        return f"(({e}) - CAST({off!r} AS DOUBLE)) / CAST({scale!r} AS DOUBLE)"

    ln = norm(lon_expr, m.long_off, m.long_scale)
    pn = norm(lat_expr, m.lat_off, m.lat_scale)
    hn = norm(h_expr, m.height_off, m.height_scale)
    subs = lambda s: s.replace("LN", f"({ln})").replace("PN", f"({pn})").replace("HN", f"({hn})")
    samp = (
        f"({subs(_poly_sql(m.samp_num))} / {subs(_poly_sql(m.samp_den))})"
        f" * CAST({m.samp_scale!r} AS DOUBLE) + CAST({m.samp_off!r} AS DOUBLE)"
    )
    line = (
        f"({subs(_poly_sql(m.line_num))} / {subs(_poly_sql(m.line_den))})"
        f" * CAST({m.line_scale!r} AS DOUBLE) + CAST({m.line_off!r} AS DOUBLE)"
    )
    return samp, line


def synth_rpc(okey: int, w: int, h: int, lon_min: float, lat_min: float,
              lon_max: float, lat_max: float) -> RPCModel:
    """Deterministic plausible RPC for an image footprint: identity
    projective core plus okey-keyed quadratic numerator ripple and a
    small rational denominator tilt (binary-fraction coefficients)."""
    a = ((okey % 7) - 3) / 128.0
    b = ((okey % 5) - 2) / 128.0
    c = ((okey % 3) - 1) / 256.0
    m = RPCModel(
        line_off=h / 2.0, line_scale=h / 2.0,
        samp_off=w / 2.0, samp_scale=w / 2.0,
        long_off=(lon_min + lon_max) / 2.0, long_scale=(lon_max - lon_min) / 2.0,
        lat_off=(lat_min + lat_max) / 2.0, lat_scale=(lat_max - lat_min) / 2.0,
    )
    sn = np.zeros(20); sn[1] = 1.0; sn[4] = a; sn[7] = b
    sd = _unit(); sd[2] = c
    ln_ = np.zeros(20); ln_[2] = -1.0; ln_[8] = a; ln_[4] = -b
    ld = _unit(); ld[1] = c
    m.samp_num, m.samp_den, m.line_num, m.line_den = sn, sd, ln_, ld
    return m
