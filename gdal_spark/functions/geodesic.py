"""Ellipsoidal (geodesic) length and area on WGS84.

Reference surface: ``OGRGeometry::get_GeodesicArea`` /
``get_GeodesicLength`` (``ogr/ogr_geometry.h``; the SQLite dialect's
two-argument ``ST_Area(geom, use_ellipsoid)`` / ``ST_Length``,
``ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1230-1240``), which
GDAL answers through PROJ's ``geod_polygonarea`` (Karney).

This implementation is built from the published math directly — no
PROJ, no GeographicLib port:

- **Edge lengths / azimuths**: Vincenty's inverse and direct formulae
  (Vincenty 1975, Survey Review XXIII/176) — closed iteration on the
  auxiliary sphere, accurate to well under a millimetre except for
  nearly-antipodal pairs (which raise; polygon edges are short).
- **Area**: the exact ellipsoidal area integral.  The area swept
  between the equator and a boundary curve is (a²/2)·∮ q(φ) dλ with
  the authalic function
      q(φ) = (1−e²)·[ sinφ/(1−e²sin²φ) + atanh(e·sinφ)/e ],
  (Snyder, *Map Projections — A Working Manual*, USGS PP 1395, eq.
  3-12).  Each polygon edge is the true geodesic: it is densified by
  Vincenty-direct sampling at equal arc steps and the integral is
  evaluated with composite Simpson — error O(h⁴), driven far below
  the reference tolerance (rel 1e−6, `autotest/ogr/ogr_geom.py:4742`)
  at N=64 samples per edge.

Semantics matched to the reference tests (`ogr_geom.py:4742-4830`):
holes subtract (a hole equal to the shell ⇒ area 0), multipolygon
parts add, lines/points ⇒ 0 area; length sums every segment of every
ring/part.  Polygons enclosing a pole need a ±2π winding correction —
detected and applied via the accumulated longitude swing.
"""

from __future__ import annotations

import math

import numpy as np

from gdal_spark.functions import geometry as G

# WGS84 (the reference computes against the SRS ellipsoid; our layers
# are EPSG:4326 by construction)
_A = 6378137.0
_F = 1.0 / 298.257223563
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)
_E = math.sqrt(_E2)


def vincenty_inverse(lat1, lon1, lat2, lon2):
    """(s12 meters, alpha1 radians) between two lon/lat degrees points."""
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - _F) * math.tan(phi1))
    U2 = math.atan((1 - _F) * math.tan(phi2))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sinU2, cosU2 = math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(200):
        sinLam, cosLam = math.sin(lam), math.cos(lam)
        sin_sigma = math.hypot(
            cosU2 * sinLam, cosU1 * sinU2 - sinU1 * cosU2 * cosLam
        )
        if sin_sigma == 0.0:
            return 0.0, 0.0  # coincident
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLam
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cosU1 * cosU2 * sinLam / sin_sigma
        cos2_alpha = 1.0 - sin_alpha * sin_alpha
        cos_2sigma_m = (
            cos_sigma - 2.0 * sinU1 * sinU2 / cos2_alpha
            if cos2_alpha != 0.0
            else 0.0
        )
        C = _F / 16.0 * cos2_alpha * (4.0 + _F * (4.0 - 3.0 * cos2_alpha))
        lam_prev = lam
        lam = L + (1.0 - C) * _F * sin_alpha * (
            sigma
            + C
            * sin_sigma
            * (
                cos_2sigma_m
                + C * cos_sigma * (-1.0 + 2.0 * cos_2sigma_m * cos_2sigma_m)
            )
        )
        if abs(lam - lam_prev) < 1e-14:
            break
    else:
        raise ValueError("Vincenty inverse failed to converge (near-antipodal)")
    u2 = cos2_alpha * (_A * _A - _B * _B) / (_B * _B)
    A_ = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B_ = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    d_sigma = (
        B_
        * sin_sigma
        * (
            cos_2sigma_m
            + B_
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2)
                - B_
                / 6.0
                * cos_2sigma_m
                * (-3.0 + 4.0 * sin_sigma**2)
                * (-3.0 + 4.0 * cos_2sigma_m**2)
            )
        )
    )
    s = _B * A_ * (sigma - d_sigma)
    alpha1 = math.atan2(cosU2 * sinLam, cosU1 * sinU2 - sinU1 * cosU2 * cosLam)
    return s, alpha1


def vincenty_direct(lat1, lon1, alpha1, s):
    """Destination lon/lat degrees from start + azimuth (rad) + distance."""
    phi1 = math.radians(lat1)
    U1 = math.atan((1 - _F) * math.tan(phi1))
    sinU1, cosU1 = math.sin(U1), math.cos(U1)
    sin_a1, cos_a1 = math.sin(alpha1), math.cos(alpha1)
    sigma1 = math.atan2(math.tan(U1), cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (_A * _A - _B * _B) / (_B * _B)
    A_ = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B_ = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    sigma = s / (_B * A_)
    for _ in range(100):
        cos_2sigma_m = math.cos(2.0 * sigma1 + sigma)
        sin_sigma, cos_sigma = math.sin(sigma), math.cos(sigma)
        d_sigma = (
            B_
            * sin_sigma
            * (
                cos_2sigma_m
                + B_
                / 4.0
                * (
                    cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2)
                    - B_
                    / 6.0
                    * cos_2sigma_m
                    * (-3.0 + 4.0 * sin_sigma**2)
                    * (-3.0 + 4.0 * cos_2sigma_m**2)
                )
            )
        )
        sigma_prev = sigma
        sigma = s / (_B * A_) + d_sigma
        if abs(sigma - sigma_prev) < 1e-14:
            break
    sin_sigma, cos_sigma = math.sin(sigma), math.cos(sigma)
    cos_2sigma_m = math.cos(2.0 * sigma1 + sigma)
    phi2 = math.atan2(
        sinU1 * cos_sigma + cosU1 * sin_sigma * cos_a1,
        (1 - _F)
        * math.hypot(sin_alpha, sinU1 * sin_sigma - cosU1 * cos_sigma * cos_a1),
    )
    lam = math.atan2(
        sin_sigma * sin_a1, cosU1 * cos_sigma - sinU1 * sin_sigma * cos_a1
    )
    C = _F / 16.0 * cos2_alpha * (4.0 + _F * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - C) * _F * sin_alpha * (
        sigma
        + C
        * sin_sigma
        * (cos_2sigma_m + C * cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2))
    )
    return phi2, L  # radians: destination latitude, longitude offset


def _q_authalic(phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12 (without the (a²/2) factor)."""
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s) + np.arctanh(_E * s) / _E
    )


_Q_POLE = float(_q_authalic(np.array([math.pi / 2.0]))[0])


def _edge_area_term(lat1, lon1, lat2, lon2, n_samples: int = 64):
    """∮ q(φ) dλ along the geodesic edge (Simpson), plus the edge's dλ."""
    s12, alpha1 = vincenty_inverse(lat1, lon1, lat2, lon2)
    if s12 == 0.0:
        return 0.0, 0.0
    n = n_samples if n_samples % 2 == 0 else n_samples + 1
    phis = np.empty(n + 1)
    dlams = np.empty(n + 1)
    phis[0] = math.radians(lat1)
    dlams[0] = 0.0
    for k in range(1, n + 1):
        phi, dlam = vincenty_direct(lat1, lon1, alpha1, s12 * k / n)
        phis[k] = phi
        dlams[k] = dlam
    q = _q_authalic(phis)
    # composite Simpson over the (possibly non-uniform in λ) samples:
    # integrate q dλ segment-pair-wise with the quadratic through
    # (λ0,q0),(λ1,q1),(λ2,q2)
    total = 0.0
    for k in range(0, n, 2):
        x0, x1, x2 = dlams[k], dlams[k + 1], dlams[k + 2]
        y0, y1, y2 = q[k], q[k + 1], q[k + 2]
        h0, h1 = x1 - x0, x2 - x1
        hs = h0 + h1
        if hs == 0.0:
            continue
        if min(abs(h0), abs(h1)) < 1e-18 * max(abs(h0), abs(h1), 1e-30):
            total += 0.5 * (y0 + y2) * hs  # degenerate: trapezoid
            continue
        # exact quadratic-interpolant integral on non-uniform nodes
        total += (hs / 6.0) * (
            y0 * (2.0 - h1 / h0)
            + y1 * hs * hs / (h0 * h1)
            + y2 * (2.0 - h0 / h1)
        )
    return total, dlams[n]


def ring_geodesic_area(ring: np.ndarray, n_samples: int = 64) -> float:
    """Signed ellipsoidal area (m²) of one lon/lat ring (CCW positive)."""
    total = 0.0
    swing = 0.0
    pts = np.asarray(ring, dtype=np.float64)
    for i in range(len(pts) - 1):
        lon1, lat1 = pts[i]
        lon2, lat2 = pts[i + 1]
        term, dlam = _edge_area_term(lat1, lon1, lat2, lon2, n_samples)
        total += term
        swing += dlam
    area = (_A * _A / 2.0) * total
    # pole-enclosing ring: the boundary winds ±2π in longitude and the
    # integral measures the area to the equator; close it over the pole
    if abs(swing) > math.pi:
        area = (_A * _A / 2.0) * (_Q_POLE * (2.0 * math.pi) * math.copysign(1.0, swing)) - area
        area = abs(area)
    return area


def geodesic_area(g: G.Geom) -> float:
    """GDAL get_GeodesicArea semantics: |shells| − |holes| summed."""
    if not g.rings:
        return 0.0
    total = 0.0
    for ring, is_outer in zip(g.rings, g.ring_roles):
        a = abs(ring_geodesic_area(np.asarray(ring)))
        total += a if is_outer else -a
    return total


def geodesic_length(g: G.Geom) -> float:
    """GDAL get_GeodesicLength: Vincenty sum over every part's segments."""
    total = 0.0
    for part in g.rings or g.coords:
        pts = np.asarray(part, dtype=np.float64)
        for i in range(len(pts) - 1):
            s, _ = vincenty_inverse(pts[i][1], pts[i][0], pts[i + 1][1], pts[i + 1][0])
            total += s
    return total
