"""Projected-CRS engine: ellipsoidal Transverse Mercator (UTM).

The reference delegates arbitrary CRS math to PROJ
(ogr/ogrct.cpp:655 OGRProjCT over coordinate arrays); its canonical
warp benchmark is a UTM source (autotest/benchmark/test_gdalwarp.py:24
warps UTM->EPSG:4326; the checksum-4672 fixture gcore/data/byte.tif is
UTM zone 11).  This module implements the one projected-CRS family
that covers those cases natively: ellipsoidal Transverse Mercator on
WGS84 via the 6th-order Krueger series in the third flattening n
(Karney 2011, "Transverse Mercator with an accuracy of a few
nanometers", arXiv:1002.1417 — the same series PROJ's default tmerc
evaluates), plus the UTM zone parametrization (k0=0.9996,
FE=500000, FN=0 north / 10000000 south, EPSG:326zz / 327zz).

Everything is vectorized numpy over coordinate arrays (the OGRProjCT
array contract).  Accuracy: the order-n^6 truncation error is below
10 nm inside a UTM zone; the inverse tau'(tau) Newton solve runs to
machine precision (<= 2 iterations from the tau' seed).

The rasterref golden restates these published series with the
identical elementwise expression sequence (the documented-contract
discipline used for the geoloc/RPC transformers), so engine and
golden produce identical doubles.
"""

from __future__ import annotations

import numpy as np

# WGS84
A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)
E1 = np.sqrt(E2)
N3 = F / (2.0 - F)  # third flattening n

# Rectifying radius A1 = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
A1 = A / (1.0 + N3) * (1.0 + N3 ** 2 / 4.0 + N3 ** 4 / 64.0
                       + N3 ** 6 / 256.0)

# Krueger series, third-flattening coefficients (Karney 2011 eq. 35/36)
_n = N3
ALPHA = (
    _n / 2 - 2 * _n ** 2 / 3 + 5 * _n ** 3 / 16 + 41 * _n ** 4 / 180
    - 127 * _n ** 5 / 288 + 7891 * _n ** 6 / 37800,
    13 * _n ** 2 / 48 - 3 * _n ** 3 / 5 + 557 * _n ** 4 / 1440
    + 281 * _n ** 5 / 630 - 1983433 * _n ** 6 / 1935360,
    61 * _n ** 3 / 240 - 103 * _n ** 4 / 140 + 15061 * _n ** 5 / 26880
    + 167603 * _n ** 6 / 181440,
    49561 * _n ** 4 / 161280 - 179 * _n ** 5 / 168
    + 6601661 * _n ** 6 / 7257600,
    34729 * _n ** 5 / 80640 - 3418889 * _n ** 6 / 1995840,
    212378941 * _n ** 6 / 319334400,
)
BETA = (
    _n / 2 - 2 * _n ** 2 / 3 + 37 * _n ** 3 / 96 - _n ** 4 / 360
    - 81 * _n ** 5 / 512 + 96199 * _n ** 6 / 604800,
    _n ** 2 / 48 + _n ** 3 / 15 - 437 * _n ** 4 / 1440
    + 46 * _n ** 5 / 105 - 1118711 * _n ** 6 / 3870720,
    17 * _n ** 3 / 480 - 37 * _n ** 4 / 840 - 209 * _n ** 5 / 4480
    + 5569 * _n ** 6 / 90720,
    4397 * _n ** 4 / 161280 - 11 * _n ** 5 / 504
    - 830251 * _n ** 6 / 7257600,
    4583 * _n ** 5 / 161280 - 108847 * _n ** 6 / 3991680,
    20648693 * _n ** 6 / 638668800,
)


def _tau_prime(tau):
    """Conformal tangent tau' = tan(chi) from geodetic tangent
    tau = tan(phi) (Karney eq. 7-9)."""
    sig = np.sinh(E1 * np.arctanh(E1 * tau / np.hypot(1.0, tau)))
    return tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)


def _tau_from_tau_prime(taup):
    """Invert tau'(tau) by Newton (Karney eq. 19-21); converges to
    machine precision in <= 2 steps from the tau' / e'^2 seed."""
    e2m = 1.0 - E2
    tau = taup / e2m  # first guess
    for _ in range(5):
        taupa = _tau_prime(tau)
        dtau = ((taup - taupa) * (1.0 + e2m * tau * tau)
                / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa)))
        tau = tau + dtau
        if np.all(np.abs(dtau) < 1e-14 * np.maximum(1.0, np.abs(tau))):
            break
    return tau


def tm_forward(lon_deg, lat_deg, lon0_deg: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0):
    """Geographic (degrees) -> Transverse Mercator easting/northing.

    Karney 2011 eq. 10-11: conformal coords (xi', eta') then the
    alpha series to (xi, eta); E = fe + k0 A1 eta, N = fn + k0 A1 xi.
    """
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64)
                     - float(lon0_deg))
    taup = _tau_prime(np.tan(lat))
    coslon = np.cos(lon)
    xi_p = np.arctan2(taup, coslon)
    eta_p = np.arcsinh(np.sin(lon) / np.hypot(taup, coslon))
    xi = xi_p
    eta = eta_p
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi = xi + ALPHA[j] * np.sin(a2j * xi_p) * np.cosh(a2j * eta_p)
        eta = eta + ALPHA[j] * np.cos(a2j * xi_p) * np.sinh(a2j * eta_p)
    return fe + k0 * A1 * eta, fn + k0 * A1 * xi


def tm_inverse(easting, northing, lon0_deg: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0):
    """Transverse Mercator easting/northing -> geographic (degrees).

    Karney 2011 eq. 15-18: beta series back to (xi', eta'), then
    tau' -> tau Newton solve."""
    xi = (np.asarray(northing, np.float64) - fn) / (k0 * A1)
    eta = (np.asarray(easting, np.float64) - fe) / (k0 * A1)
    xi_p = xi
    eta_p = eta
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi_p = xi_p - BETA[j] * np.sin(a2j * xi) * np.cosh(a2j * eta)
        eta_p = eta_p - BETA[j] * np.cos(a2j * xi) * np.sinh(a2j * eta)
    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    taup = np.sin(xi_p) / np.hypot(sinh_eta, cos_xi)
    tau = _tau_from_tau_prime(taup)
    lat = np.degrees(np.arctan(tau))
    lon = float(lon0_deg) + np.degrees(np.arctan2(sinh_eta, cos_xi))
    return lon, lat


# ------------------------------------------------------------------- UTM


def parse_utm_epsg(code: str):
    """'EPSG:326zz' (north) / 'EPSG:327zz' (south) -> (lon0_deg, fn).

    UTM zone zz central meridian = 6*zz - 183; k0 = 0.9996,
    FE = 500 km, FN = 0 (north) / 10,000 km (south)."""
    num = int(code.split(":")[1])
    zone = num % 100
    if not (1 <= zone <= 60) or num // 100 not in (326, 327):
        raise ValueError(f"not a UTM code: {code}")
    lon0 = 6.0 * zone - 183.0
    fn = 0.0 if num // 100 == 326 else 10000000.0
    return lon0, fn


class UTMProjection:
    """fwd: (lon, lat) degrees -> (E, N); inv: (E, N) -> (lon, lat)."""

    def __init__(self, epsg: str):
        self.epsg = epsg
        self.lon0, self.fn = parse_utm_epsg(epsg)

    def fwd(self, lon, lat):
        return tm_forward(lon, lat, self.lon0, fn=self.fn)

    def inv(self, e, n):
        return tm_inverse(e, n, self.lon0, fn=self.fn)


class WebMercatorProjection:
    """fwd: (lon, lat) degrees -> EPSG:3857 meters; inv: meters ->
    (lon, lat) — the closed forms of functions.mercator (the
    reference's GlobalMercator, gdal2tiles.py:422-441), wrapped in the
    projection protocol so they compose."""

    def fwd(self, lon, lat):
        from . import mercator

        mx, my = mercator.lat_lon_to_meters(lat, lon)
        return mx, my

    def inv(self, mx, my):
        from . import mercator

        lat, lon = mercator.meters_to_lat_lon(mx, my)
        return lon, lat


class InverseOf:
    """Adapter flipping a projection's direction (a CRS->geographic
    step inside a chain)."""

    def __init__(self, p):
        self.p = p

    def fwd(self, x, y):
        return self.p.inv(x, y)

    def inv(self, x, y):
        return self.p.fwd(x, y)


class ComposedTransform:
    """PROJ-pipeline-style chained CRS transform (the reference's
    GDALCreateGenImgProjTransformer src-CRS -> intermediate -> dst-CRS
    chain, alg/gdaltransformer.cpp:2187; PROJ `+proj=pipeline` analog):
    ``fwd`` applies each step's fwd in order, ``inv`` the reversed
    steps' inverses.  Steps are any objects with fwd/inv over
    coordinate arrays (UTMProjection, WebMercatorProjection,
    InverseOf, GCP/TPS transformers via their fwd/inv attributes...).
    """

    def __init__(self, *steps):
        if not steps:
            raise ValueError("ComposedTransform needs >= 1 step")
        self.steps = steps

    def fwd(self, x, y):
        for s in self.steps:
            x, y = s.fwd(x, y)
        return x, y

    def inv(self, x, y):
        for s in reversed(self.steps):
            x, y = s.inv(x, y)
        return x, y


# ------------------------------------------------------- fixture synthesis


def synth_utm(i: int):
    """Deterministic per-chip UTM georeferencing (FIXTURE — mirrored
    by the rasterref golden): chip i sits in zone 11 + (i % 3) north
    (the reference's canonical byte.tif neighborhood for i % 3 == 0),
    dyadic easting/northing origin and a 16 m GSD so every grid value
    is exactly representable.  Returns (epsg, e0, n0, gsd); the chip
    footprint is E in [e0, e0 + gsd*w], N in [n0, n0 + gsd*h]."""
    zone = 11 + (i % 3)
    e0 = 320000.0 + ((i * 7) % 64) * 4096.0
    n0 = 3600000.0 + ((i * 11) % 64) * 4096.0
    return f"EPSG:{32600 + zone}", e0, n0, 16.0
