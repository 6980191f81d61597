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
# (module-level WGS84 value comes out of _krueger(A, N3) below)

# Krueger series, third-flattening coefficients (Karney 2011 eq. 35/36)


def _krueger(a: float, _n: float):
    """(A1, ALPHA, BETA) for semi-major a and third flattening n —
    the Karney eq. 14/35/36 polynomial coefficients, evaluated at
    runtime so any ellipsoid can drive the same series (the module-
    level WGS84 constants below come from this exact call, so the
    default path is arithmetically unchanged)."""
    a1 = a / (1.0 + _n) * (1.0 + _n ** 2 / 4.0 + _n ** 4 / 64.0
                           + _n ** 6 / 256.0)
    alpha = (
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
    beta = (
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
    return a1, alpha, beta


A1, ALPHA, BETA = _krueger(A, N3)


def _resolve_ellipsoid(ellipsoid):
    """ELLIPSOIDS name or (a, 1/f) tuple -> (a, e1, e2).  The WGS84
    path reproduces the module constants bit-exactly (same e2 = f(2-f)
    expression), so default-ellipsoid callers are unchanged."""
    a, inv_f = (ELLIPSOIDS[ellipsoid]
                if isinstance(ellipsoid, str) else ellipsoid)
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    return float(a), float(np.sqrt(e2)), float(e2)


def _tau_prime(tau, e1=E1):
    """Conformal tangent tau' = tan(chi) from geodetic tangent
    tau = tan(phi) (Karney eq. 7-9)."""
    sig = np.sinh(e1 * np.arctanh(e1 * tau / np.hypot(1.0, tau)))
    return tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)


def _tau_from_tau_prime(taup, e1=E1, e2=E2):
    """Invert tau'(tau) by Newton (Karney eq. 19-21); converges to
    machine precision in <= 2 steps from the tau' / e'^2 seed."""
    e2m = 1.0 - e2
    tau = taup / e2m  # first guess
    for _ in range(5):
        taupa = _tau_prime(tau, e1)
        dtau = ((taup - taupa) * (1.0 + e2m * tau * tau)
                / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa)))
        tau = tau + dtau
        if np.all(np.abs(dtau) < 1e-14 * np.maximum(1.0, np.abs(tau))):
            break
    return tau


def tm_forward(lon_deg, lat_deg, lon0_deg: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               kr=(A1, ALPHA, BETA)):
    """Geographic (degrees) -> Transverse Mercator easting/northing.

    Karney 2011 eq. 10-11: conformal coords (xi', eta') then the
    alpha series to (xi, eta); E = fe + k0 A1 eta, N = fn + k0 A1 xi.
    """
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lon = np.radians(np.asarray(lon_deg, np.float64)
                     - float(lon0_deg))
    a1k, alpha = kr[0], kr[1]
    taup = _tau_prime(np.tan(lat), kr[3] if len(kr) > 3 else E1)
    coslon = np.cos(lon)
    xi_p = np.arctan2(taup, coslon)
    eta_p = np.arcsinh(np.sin(lon) / np.hypot(taup, coslon))
    xi = xi_p
    eta = eta_p
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi = xi + alpha[j] * np.sin(a2j * xi_p) * np.cosh(a2j * eta_p)
        eta = eta + alpha[j] * np.cos(a2j * xi_p) * np.sinh(a2j * eta_p)
    return fe + k0 * a1k * eta, fn + k0 * a1k * xi


def tm_inverse(easting, northing, lon0_deg: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 0.0,
               kr=(A1, ALPHA, BETA)):
    """Transverse Mercator easting/northing -> geographic (degrees).

    Karney 2011 eq. 15-18: beta series back to (xi', eta'), then
    tau' -> tau Newton solve."""
    a1k, beta = kr[0], kr[2]
    xi = (np.asarray(northing, np.float64) - fn) / (k0 * a1k)
    eta = (np.asarray(easting, np.float64) - fe) / (k0 * a1k)
    xi_p = xi
    eta_p = eta
    for j in range(6):
        a2j = 2.0 * (j + 1)
        xi_p = xi_p - beta[j] * np.sin(a2j * xi) * np.cosh(a2j * eta)
        eta_p = eta_p - beta[j] * np.cos(a2j * xi) * np.sinh(a2j * eta)
    sinh_eta = np.sinh(eta_p)
    cos_xi = np.cos(xi_p)
    taup = np.sin(xi_p) / np.hypot(sinh_eta, cos_xi)
    tau = _tau_from_tau_prime(taup, kr[3] if len(kr) > 3 else E1,
                              kr[4] if len(kr) > 4 else E2)
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


# ---------------------------------------------- conic / polar families
#
# The reference reaches every projected CRS through PROJ
# (ogr/ogrct.cpp:1018 OGRCreateCoordinateTransformation); the families
# below are the closed ellipsoidal forms PROJ's lcc/aea/stere evaluate
# (Snyder 1987, "Map Projections — A Working Manual", USGS PP 1395:
# LCC eq. 15-1..15-11, Albers eq. 14-1..14-12 + 3-16, Polar
# Stereographic eq. 21-33..21-41 + 3-5), parameterized the EPSG way
# (two standard parallels / lat_ts, false origin) and composable with
# ComposedTransform.  All vectorized numpy over coordinate arrays (the
# OGRProjCT array contract).  The rasterref golden restates the same
# published formulas with the identical elementwise expression
# sequence, so engine and golden produce identical doubles.


def _t_snyder(phi, e1=E1):
    """Snyder eq. 15-9: isometric-colatitude function t(phi)."""
    esin = e1 * np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / ((1.0 - esin) / (1.0 + esin)) ** (e1 / 2.0))


def _m_snyder(phi, e2=E2):
    """Snyder eq. 14-15: m(phi) = cos(phi)/sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - e2 * s * s)


def _phi_from_t(t, e1=E1):
    """Invert Snyder eq. 15-9 (eq. 7-9 fixed-point): phi =
    pi/2 - 2 atan(t ((1 - e sin phi)/(1 + e sin phi))^(e/2)),
    seeded with the spherical phi; converges quadratically."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(15):
        esin = e1 * np.sin(phi)
        phi_new = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - esin) / (1.0 + esin)) ** (e1 / 2.0))
        if np.all(np.abs(phi_new - phi) < 1e-14):
            phi = phi_new
            break
        phi = phi_new
    return phi


def _q_snyder(phi, e1=E1, e2=E2):
    """Snyder eq. 3-12: equal-area q(phi)."""
    s = np.sin(phi)
    esin = e1 * s
    return (1.0 - e2) * (
        s / (1.0 - e2 * s * s)
        - (1.0 / (2.0 * e1)) * np.log((1.0 - esin) / (1.0 + esin))
    )


def _phi_from_q(q, e1=E1, e2=E2):
    """Invert q(phi) by Newton (Snyder eq. 3-16), seeded with the
    authalic-sphere arcsine."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(15):
        s = np.sin(phi)
        esin = e1 * s
        one = 1.0 - e2 * s * s
        dphi = (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - e2)
            - s / one
            + (1.0 / (2.0 * e1)) * np.log((1.0 - esin) / (1.0 + esin))
        )
        phi = phi + dphi
        if np.all(np.abs(dphi) < 1e-14):
            break
    return phi


class LambertConformalConic:
    """Ellipsoidal LCC, 2SP EPSG parametrization (1SP when
    lat1 == lat2) — Snyder eq. 15-1..15-11.  fwd: (lon, lat) degrees
    -> (E, N) meters; inv: (E, N) -> (lon, lat)."""

    def __init__(self, lat1: float, lat2: float, lat0: float,
                 lon0: float, fe: float = 0.0, fn: float = 0.0,
                 k0: float = 1.0, ellipsoid="WGS84"):
        self.a, self.e1, self.e2 = _resolve_ellipsoid(ellipsoid)
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        t1, t2, t0 = (_t_snyder(p1, self.e1), _t_snyder(p2, self.e1),
                      _t_snyder(p0, self.e1))
        m1 = _m_snyder(p1, self.e2)
        if lat1 == lat2:
            self.n = np.sin(p1)
        else:
            m2 = _m_snyder(p2, self.e2)
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = k0 * (m1 / (self.n * t1 ** self.n))
        self.rho0 = self.a * self.F * t0 ** self.n

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        theta = self.n * np.radians(
            np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * self.F * _t_snyder(phi, self.e1) ** self.n
        E = self.fe + rho * np.sin(theta)
        N = self.fn + self.rho0 - rho * np.cos(theta)
        return E, N

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = self.rho0 - (np.asarray(n, np.float64) - self.fn)
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.hypot(x, y)
        t = (rho / (self.a * self.F)) ** (1.0 / self.n)
        theta = np.arctan2(sgn * x, sgn * y)
        lat = np.degrees(_phi_from_t(t, self.e1))
        lon = self.lon0 + np.degrees(theta / self.n)
        return lon, lat


class AlbersEqualArea:
    """Ellipsoidal Albers equal-area conic, 2SP — Snyder eq.
    14-1..14-12 with the Newton inverse of eq. 3-16."""

    def __init__(self, lat1: float, lat2: float, lat0: float,
                 lon0: float, fe: float = 0.0, fn: float = 0.0,
                 ellipsoid="WGS84"):
        self.a, self.e1, self.e2 = _resolve_ellipsoid(ellipsoid)
        p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        m1, m2 = _m_snyder(p1, self.e2), _m_snyder(p2, self.e2)
        q1, q2, q0 = (_q_snyder(p1, self.e1, self.e2),
                      _q_snyder(p2, self.e1, self.e2),
                      _q_snyder(p0, self.e1, self.e2))
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = self.a * np.sqrt(self.C - self.n * q0) / self.n

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        theta = self.n * np.radians(
            np.asarray(lon, np.float64) - self.lon0)
        rho = self.a * np.sqrt(
            self.C - self.n * _q_snyder(phi, self.e1, self.e2)) / self.n
        E = self.fe + rho * np.sin(theta)
        N = self.fn + self.rho0 - rho * np.cos(theta)
        return E, N

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = self.rho0 - (np.asarray(n, np.float64) - self.fn)
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = np.hypot(x, y)
        q = (self.C - (rho * self.n / self.a) ** 2) / self.n
        theta = np.arctan2(sgn * x, sgn * y)
        lat = np.degrees(_phi_from_q(q, self.e1, self.e2))
        lon = self.lon0 + np.degrees(theta / self.n)
        return lon, lat


class PolarStereographic:
    """Ellipsoidal polar stereographic, variant B (standard parallel
    lat_ts; EPSG 9829) — Snyder eq. 21-33..21-41; inverse via the
    t-iteration (eq. 7-9).  ``south=True`` mirrors to the south pole
    (EPSG:3031-style)."""

    def __init__(self, lat_ts: float, lon0: float, fe: float = 0.0,
                 fn: float = 0.0, south: bool = False,
                 ellipsoid="WGS84"):
        self.a, self.e1, self.e2 = _resolve_ellipsoid(ellipsoid)
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        self.south = bool(south)
        pts = np.radians(lat_ts)
        # scale anchor at the standard parallel (Snyder eq. 21-34:
        # rho = a m_c t / t_c); m is even in phi, t mirrors for south
        self.mc = _m_snyder(pts, self.e2)
        self.tc = _t_snyder(-pts if south else pts, self.e1)

    @classmethod
    def from_k0(cls, k0: float, lon0: float, fe: float = 0.0,
                fn: float = 0.0, south: bool = False,
                ellipsoid="WGS84"):
        """Variant A (EPSG method 9810, UPS): scale factor k0 given at
        the pole instead of a standard parallel — Snyder eq. 21-33:
        rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e)), expressed in
        the variant-B anchor form by mc = 2 k0 / sqrt(...), tc = 1."""
        p = cls(60.0 if not south else -60.0, lon0, fe, fn, south,
                ellipsoid)
        e = p.e1
        p.mc = 2.0 * k0 / np.sqrt(
            (1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        p.tc = 1.0
        return p

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        t = _t_snyder(-phi if self.south else phi, self.e1)
        rho = self.a * self.mc * t / self.tc
        E = self.fe + rho * np.sin(lam)
        N = self.fn + (rho * np.cos(lam) if self.south
                       else -rho * np.cos(lam))
        return E, N

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = np.asarray(n, np.float64) - self.fn
        rho = np.hypot(x, y)
        t = rho * self.tc / (self.a * self.mc)
        phi = _phi_from_t(t, self.e1)
        lat = np.degrees(-phi if self.south else phi)
        lam = np.arctan2(x, y if self.south else -y)
        lon = self.lon0 + np.degrees(lam)
        return lon, lat


# --------------------------------------- meridian-arc projections
#
# Snyder's ellipsoidal meridian arc M(phi) (eq. 3-21) and its
# footpoint inverse (eq. 3-26 / 7-19 rectifying-latitude series)
# carry the sinusoidal (MODIS grid, PROJ +proj=sinu) and equidistant
# cylindrical (EPSG method 1028) families; Mollweide is the spherical
# Newton form PROJ's +proj=moll applies on the semi-major axis.

def _arc_coeffs(e2: float):
    """Snyder eq. 3-21 meridian-arc series coefficients + the eq.
    3-26 rectifying e1; the module WGS84 constants below come from
    this exact call (default path arithmetically unchanged)."""
    m0 = 1.0 - e2 / 4.0 - 3.0 * e2 ** 2 / 64.0 - 5.0 * e2 ** 3 / 256.0
    m2 = 3.0 * e2 / 8.0 + 3.0 * e2 ** 2 / 32.0 + 45.0 * e2 ** 3 / 1024.0
    m4 = 15.0 * e2 ** 2 / 256.0 + 45.0 * e2 ** 3 / 1024.0
    m6 = 35.0 * e2 ** 3 / 3072.0
    e1r = (1.0 - np.sqrt(1.0 - e2)) / (1.0 + np.sqrt(1.0 - e2))
    return m0, m2, m4, m6, e1r


_M0, _M2, _M4, _M6, _E1R = _arc_coeffs(E2)
_ARC_WGS84 = (A, E2, _M0, _M2, _M4, _M6, _E1R)


def _m_arc(phi, arc=_ARC_WGS84):
    """Snyder eq. 3-21: meridian arc length from the equator (m)."""
    a, _, m0, m2, m4, m6, _ = arc
    return a * (m0 * phi - m2 * np.sin(2.0 * phi)
                + m4 * np.sin(4.0 * phi) - m6 * np.sin(6.0 * phi))


def _phi_from_m(M, arc=_ARC_WGS84):
    """Footpoint latitude from meridian arc: Snyder eq. 3-26 series
    seed + two Newton steps against _m_arc (dM/dphi = the meridian
    radius), so the inverse is machine-exact against the forward's
    own e^6 truncation (the raw series pair disagrees at ~1e-4 m)."""
    a, e2, m0, _, _, _, e1r = arc
    mu = M / (a * m0)
    e1 = e1r
    phi = (mu
           + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
           + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
           * np.sin(4.0 * mu)
           + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
           + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu))
    for _ in range(2):
        s = np.sin(phi)
        rho = a * (1.0 - e2) / (1.0 - e2 * s * s) ** 1.5
        phi = phi + (M - _m_arc(phi, arc)) / rho
    return phi


class Sinusoidal:
    """Ellipsoidal sinusoidal (Snyder eq. 30-8/30-9; PROJ +proj=sinu
    — the MODIS grid projection).  fwd: (lon, lat) deg -> (E, N) m."""

    def __init__(self, lon0: float = 0.0, fe: float = 0.0,
                 fn: float = 0.0, ellipsoid="WGS84"):
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        a, _, e2 = _resolve_ellipsoid(ellipsoid)
        self.arc = ((A, E2) + (_M0, _M2, _M4, _M6, _E1R)
                    if (a, e2) == (A, E2)
                    else (a, e2) + _arc_coeffs(e2))

    def fwd(self, lon, lat):
        a, e2 = self.arc[0], self.arc[1]
        phi = np.radians(np.asarray(lat, np.float64))
        dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        s = np.sin(phi)
        E = self.fe + a * dlam * np.cos(phi) / np.sqrt(1.0 - e2 * s * s)
        N = self.fn + _m_arc(phi, self.arc)
        return E, N

    def inv(self, e, n):
        a, e2 = self.arc[0], self.arc[1]
        x = np.asarray(e, np.float64) - self.fe
        y = np.asarray(n, np.float64) - self.fn
        phi = _phi_from_m(y, self.arc)
        s = np.sin(phi)
        lam = x * np.sqrt(1.0 - e2 * s * s) / (a * np.cos(phi))
        return self.lon0 + np.degrees(lam), np.degrees(phi)


class EquidistantCylindrical:
    """Ellipsoidal equidistant cylindrical (EPSG method 1028):
    E = FE + nu(lat1) cos(lat1) dlam, N = FN + M(phi)."""

    def __init__(self, lat1: float = 0.0, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0, ellipsoid="WGS84"):
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        a, _, e2 = _resolve_ellipsoid(ellipsoid)
        self.arc = ((A, E2) + (_M0, _M2, _M4, _M6, _E1R)
                    if (a, e2) == (A, E2)
                    else (a, e2) + _arc_coeffs(e2))
        p1 = np.radians(lat1)
        s1 = np.sin(p1)
        self.nu1cos = a * np.cos(p1) / np.sqrt(1.0 - e2 * s1 * s1)

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        return (self.fe + self.nu1cos * dlam,
                self.fn + _m_arc(phi, self.arc))

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = np.asarray(n, np.float64) - self.fn
        phi = _phi_from_m(y, self.arc)
        return (self.lon0 + np.degrees(x / self.nu1cos),
                np.degrees(phi))


class Mollweide:
    """Spherical Mollweide on the semi-major axis (PROJ +proj=moll):
    Newton solve of 2*theta + sin(2*theta) = pi sin(phi)."""

    def __init__(self, lon0: float = 0.0, fe: float = 0.0,
                 fn: float = 0.0, ellipsoid="WGS84"):
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        self.a, _, _ = _resolve_ellipsoid(ellipsoid)

    @staticmethod
    def _theta(phi):
        rhs = np.pi * np.sin(phi)
        th2 = 2.0 * np.asarray(phi, np.float64).copy()
        for _ in range(20):
            f = th2 + np.sin(th2) - rhs
            d = 1.0 + np.cos(th2)
            step = np.where(d > 1e-12, f / np.maximum(d, 1e-12), 0.0)
            th2 = th2 - step
            if np.all(np.abs(step) < 1e-14):
                break
        return th2 / 2.0

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        th = self._theta(phi)
        E = (self.fe
             + (2.0 * np.sqrt(2.0) / np.pi) * self.a * dlam * np.cos(th))
        N = self.fn + np.sqrt(2.0) * self.a * np.sin(th)
        return E, N

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = np.asarray(n, np.float64) - self.fn
        th = np.arcsin(np.clip(y / (np.sqrt(2.0) * self.a), -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (2.0 * th + np.sin(2.0 * th)) / np.pi, -1.0, 1.0))
        lam = np.pi * x / (2.0 * np.sqrt(2.0) * self.a * np.cos(th))
        return self.lon0 + np.degrees(lam), np.degrees(phi)


class TransverseMercator:
    """General ellipsoidal Transverse Mercator (EPSG method 9807)
    via the same Karney/Krueger order-n^6 series as the UTM fast
    path, with runtime-evaluated coefficients for any ellipsoid and
    a latitude-of-origin term (FN is offset by the rectifying
    northing of lat0 on the central meridian, so N(lat0, lon0) = fn
    exactly) — covers British National Grid (EPSG:27700, Airy 1830),
    NZTM (EPSG:2193) and the NAD83/ETRS89 UTM zone families the
    reference resolves through PROJ (ogr/ogrct.cpp:1018)."""

    def __init__(self, lat0: float, lon0: float, k0: float,
                 fe: float = 0.0, fn: float = 0.0, ellipsoid="WGS84"):
        a, inv_f = (ELLIPSOIDS[ellipsoid]
                    if isinstance(ellipsoid, str) else ellipsoid)
        f = 1.0 / inv_f
        n3 = f / (2.0 - f)
        e2 = f * (2.0 - f)
        e1 = float(np.sqrt(e2))
        a1k, alpha, beta = _krueger(float(a), n3)
        self.kr = (a1k, alpha, beta, e1, e2)
        self.lon0, self.k0 = float(lon0), float(k0)
        self.fe = float(fe)
        if lat0 == 0.0:
            self.fn = float(fn)
        else:
            _, n0 = tm_forward(np.float64(lon0), np.float64(lat0),
                               lon0, k0, 0.0, 0.0, self.kr)
            self.fn = float(fn) - float(n0)

    def fwd(self, lon, lat):
        return tm_forward(lon, lat, self.lon0, self.k0, self.fe,
                          self.fn, self.kr)

    def inv(self, e, n):
        return tm_inverse(e, n, self.lon0, self.k0, self.fe,
                          self.fn, self.kr)


class LambertAzimuthalEqualArea:
    """Ellipsoidal Lambert azimuthal equal-area, oblique aspect
    (EPSG method 9820; Snyder eq. 24-2..24-8 over the authalic
    sphere, eq. 3-11/3-12/3-16) — the ETRS89-LAEA Europe grid
    (EPSG:3035) family."""

    def __init__(self, lat0: float, lon0: float, fe: float = 0.0,
                 fn: float = 0.0, ellipsoid="WGS84"):
        self.a, self.e1, self.e2 = _resolve_ellipsoid(ellipsoid)
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        self.qp = float(_q_snyder(np.pi / 2.0, self.e1, self.e2))
        # authalic radius Rq = a sqrt(qp/2) (Snyder eq. 3-13)
        self.rq = self.a * np.sqrt(self.qp / 2.0)
        self.polar = 0
        if lat0 >= 90.0:
            self.polar = 1                    # north aspect (eq. 24-23)
            return
        if lat0 <= -90.0:
            self.polar = -1                   # south aspect (eq. 24-25)
            return
        q0 = _q_snyder(np.radians(lat0), self.e1, self.e2)
        self.beta0 = np.arcsin(np.clip(q0 / self.qp, -1.0, 1.0))
        self.sb0, self.cb0 = np.sin(self.beta0), np.cos(self.beta0)
        # D = a m0 / (Rq cos(beta0)) (eq. 24-20)
        m0 = _m_snyder(np.radians(lat0), self.e2)
        self.D = self.a * m0 / (self.rq * self.cb0)

    def _beta(self, phi):
        return np.arcsin(np.clip(
            _q_snyder(phi, self.e1, self.e2) / self.qp, -1.0, 1.0))

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        if self.polar:
            # polar aspects (Snyder eq. 24-23/24-25): rho =
            # a sqrt(qp -+ q); y sign flips between the aspects
            q = _q_snyder(phi, self.e1, self.e2)
            if self.polar > 0:
                rho = self.a * np.sqrt(np.maximum(self.qp - q, 0.0))
                return (self.fe + rho * np.sin(lam),
                        self.fn - rho * np.cos(lam))
            rho = self.a * np.sqrt(np.maximum(self.qp + q, 0.0))
            return (self.fe + rho * np.sin(lam),
                    self.fn + rho * np.cos(lam))
        b = self._beta(phi)
        sb, cb = np.sin(b), np.cos(b)
        denom = 1.0 + self.sb0 * sb + self.cb0 * cb * np.cos(lam)
        B = self.rq * np.sqrt(2.0 / denom)
        E = self.fe + B * self.D * cb * np.sin(lam)
        N = self.fn + (B / self.D) * (self.cb0 * sb
                                      - self.sb0 * cb * np.cos(lam))
        return E, N

    def inv(self, e, n):
        if self.polar:
            x = np.asarray(e, np.float64) - self.fe
            y = np.asarray(n, np.float64) - self.fn
            rho = np.hypot(x, y)
            q = self.qp - (rho / self.a) ** 2 if self.polar > 0 \
                else (rho / self.a) ** 2 - self.qp
            lat = np.degrees(_phi_from_q(np.clip(q, -self.qp, self.qp),
                                         self.e1, self.e2))
            lam = (np.arctan2(x, -y) if self.polar > 0
                   else np.arctan2(x, y))
            lon = self.lon0 + np.degrees(np.where(rho > 0.0, lam, 0.0))
            return lon, lat
        x = (np.asarray(e, np.float64) - self.fe) / self.D
        y = (np.asarray(n, np.float64) - self.fn) * self.D
        rho = np.hypot(x, y)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        with np.errstate(invalid="ignore"):
            sb = np.where(rho > 0.0,
                          cce * self.sb0 + (y * sce * self.cb0
                                            / np.where(rho > 0.0, rho,
                                                       1.0)),
                          self.sb0)
        q = self.qp * np.clip(sb, -1.0, 1.0)
        lat = np.degrees(_phi_from_q(q, self.e1, self.e2))
        lam = np.arctan2(x * sce,
                         rho * self.cb0 * cce - y * self.sb0 * sce)
        lon = self.lon0 + np.degrees(
            np.where(rho > 0.0, lam, 0.0))
        return lon, lat


class CylindricalEqualArea:
    """Ellipsoidal cylindrical equal-area, normal aspect (EPSG
    method 9835; Snyder eq. 10-1/10-2 with q of eq. 3-12) — the
    EASE-Grid 2.0 family (EPSG:6933)."""

    def __init__(self, lat_ts: float, lon0: float = 0.0,
                 fe: float = 0.0, fn: float = 0.0, ellipsoid="WGS84"):
        self.a, self.e1, self.e2 = _resolve_ellipsoid(ellipsoid)
        self.lon0 = float(lon0)
        self.fe, self.fn = float(fe), float(fn)
        pts = np.radians(lat_ts)
        sts = np.sin(pts)
        self.k0 = float(np.cos(pts)
                        / np.sqrt(1.0 - self.e2 * sts * sts))

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        E = self.fe + self.a * self.k0 * lam
        N = self.fn + self.a * _q_snyder(phi, self.e1, self.e2) / (
            2.0 * self.k0)
        return E, N

    def inv(self, e, n):
        x = np.asarray(e, np.float64) - self.fe
        y = np.asarray(n, np.float64) - self.fn
        q = 2.0 * self.k0 * y / self.a
        lat = np.degrees(_phi_from_q(q, self.e1, self.e2))
        lon = self.lon0 + np.degrees(x / (self.a * self.k0))
        return lon, lat


class IdentityCRS:
    """Geographic passthrough (EPSG:4326 and the null-shift datum
    aliases NAD83/ETRS89): fwd/inv are the identity over (lon, lat)
    degree arrays."""

    def fwd(self, lon, lat):
        return (np.asarray(lon, np.float64),
                np.asarray(lat, np.float64))

    inv = fwd


# ------------------------------------------------------- fixture synthesis


# ------------------------------------------------- datum shifts
#
# The reference reaches datum transformations through PROJ's Helmert
# step (ogr/ogrct.cpp pipelines emit +proj=cart -> +proj=helmert ->
# +proj=cart +inv); this is the EPSG 9606 position-vector 7-parameter
# form over geocentric coordinates, with the geodetic<->geocentric
# conversions (EPSG 9602) on each side and the 2-D contract's h=0
# assumption (heights are not carried by the engine's coordinate
# columns, matching GDAL's 2-D transform behavior).

#: ellipsoid registry: name -> (a, 1/f)
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "intl1924": (6378388.0, 297.0),       # Hayford / International
    "bessel1841": (6377397.155, 299.1528128),
    "clarke1866": (6378206.4, 294.978698214),
    # Clarke 1880 (IGN), the NTF / French Lambert ellipsoid (EPSG 7011)
    "clarke1880ign": (6378249.2, 293.4660212936269),
    # Airy 1830, the OSGB36 / British National Grid ellipsoid (EPSG 7001)
    "airy1830": (6377563.396, 299.3249646),
}


def geodetic_to_geocentric(lon_deg, lat_deg, a: float, inv_f: float,
                           h=0.0):
    """(lon, lat, h) -> geocentric (X, Y, Z) on the given ellipsoid
    (EPSG method 9602)."""
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    lam = np.radians(np.asarray(lon_deg, np.float64))
    phi = np.radians(np.asarray(lat_deg, np.float64))
    sphi = np.sin(phi)
    nrad = a / np.sqrt(1.0 - e2 * sphi * sphi)
    cphi = np.cos(phi)
    x = (nrad + h) * cphi * np.cos(lam)
    y = (nrad + h) * cphi * np.sin(lam)
    z = (nrad * (1.0 - e2) + h) * sphi
    return x, y, z


def geocentric_to_geodetic(x, y, z, a: float, inv_f: float):
    """Geocentric (X, Y, Z) -> (lon, lat, h): Bowring's seed + fixed-
    point refinement (sub-nanometer at crustal heights)."""
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = e2 / (1.0 - e2)
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    p = np.hypot(x, y)
    theta = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(theta) ** 3,
                     p - e2 * a * np.cos(theta) ** 3)
    for _ in range(3):
        sphi = np.sin(phi)
        nrad = a / np.sqrt(1.0 - e2 * sphi * sphi)
        h = p / np.cos(phi) - nrad
        phi = np.arctan2(z, p * (1.0 - e2 * nrad / (nrad + h)))
    sphi = np.sin(phi)
    nrad = a / np.sqrt(1.0 - e2 * sphi * sphi)
    h = p / np.cos(phi) - nrad
    return np.degrees(np.arctan2(y, x)), np.degrees(phi), h


class DatumShift:
    """lon/lat datum transformation via a position-vector 7-parameter
    Helmert over geocentric coordinates (EPSG method 9606 — PROJ's
    +proj=helmert convention_position_vector, the convention EPSG /
    the reference's European parameter sets use):

        X' = T + (1 + ds) * R(rx, ry, rz) * X,
        R = [[1, -rz, ry], [rz, 1, -rx], [-ry, rx, 1]]  (small angles)

    ``fwd`` maps (lon, lat) on the SOURCE ellipsoid to (lon, lat) on
    the TARGET ellipsoid; ``inv`` solves the same linear model exactly
    (3x3 inverse), so fwd/inv round-trip to machine precision.  The
    rotation parameters are arcseconds, ``ds_ppm`` parts-per-million.
    h=0 on input, height dropped on output (2-D contract).
    """

    def __init__(self, dx: float, dy: float, dz: float,
                 rx_as: float = 0.0, ry_as: float = 0.0,
                 rz_as: float = 0.0, ds_ppm: float = 0.0,
                 src: str = "intl1924", dst: str = "WGS84"):
        self.t = np.array([dx, dy, dz], np.float64)
        arc = np.pi / (180.0 * 3600.0)
        rx, ry, rz = rx_as * arc, ry_as * arc, rz_as * arc
        m = 1.0 + ds_ppm * 1e-6
        self.mat = m * np.array(
            [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]], np.float64)
        self.mat_inv = np.linalg.inv(self.mat)
        self.src = ELLIPSOIDS[src] if isinstance(src, str) else src
        self.dst = ELLIPSOIDS[dst] if isinstance(dst, str) else dst

    def fwd(self, lon, lat):
        x, y, z = geodetic_to_geocentric(lon, lat, *self.src)
        v = self.mat @ np.vstack([np.ravel(x), np.ravel(y), np.ravel(z)])
        lon2, lat2, _ = geocentric_to_geodetic(
            v[0] + self.t[0], v[1] + self.t[1], v[2] + self.t[2],
            *self.dst)
        shp = np.shape(np.asarray(lon, np.float64))
        return lon2.reshape(shp), lat2.reshape(shp)

    def inv(self, lon, lat):
        x, y, z = geodetic_to_geocentric(lon, lat, *self.dst)
        w = np.vstack([np.ravel(x) - self.t[0], np.ravel(y) - self.t[1],
                       np.ravel(z) - self.t[2]])
        v = self.mat_inv @ w
        lon2, lat2, _ = geocentric_to_geodetic(v[0], v[1], v[2],
                                               *self.src)
        shp = np.shape(np.asarray(lon, np.float64))
        return lon2.reshape(shp), lat2.reshape(shp)


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


# Conic/polar fixture parameter families (FIXTURES — mirrored by the
# rasterref golden).  Parameters follow well-known EPSG products:
# Lambert-93 (EPSG:2154), NAD83 / Conus Albers (EPSG:5070), NSIDC Sea
# Ice Polar Stereographic North (EPSG:3413) — evaluated on WGS84.
LCC_PARAMS = (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)
ALBERS_PARAMS = (29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
STERE_PARAMS = (70.0, -45.0, 0.0, 0.0)  # lat_ts, lon0, fe, fn (north)
SINU_PARAMS = (0.0, 0.0, 0.0)           # lon0, fe, fn (MODIS grid form)
EQC_PARAMS = (30.0, 0.0, 0.0, 0.0)      # lat1, lon0, fe, fn
MOLL_PARAMS = (0.0, 0.0, 0.0)           # lon0, fe, fn


def synth_sinu(i: int):
    """Deterministic per-chip sinusoidal georeferencing (a MODIS
    h18-ish mid-latitude window, dyadic offsets, 16 m GSD)."""
    x0 = 400000.0 + (((i * 7) % 64) - 32) * 4096.0
    y0 = 4800000.0 + (((i * 11) % 64) - 32) * 4096.0
    return x0, y0, 16.0


def synth_eqc(i: int):
    """Deterministic per-chip equidistant-cylindrical georeferencing
    (lat1=30 grid, mid-latitude window, dyadic offsets, 16 m GSD)."""
    x0 = -131072.0 + ((i * 13) % 64) * 4096.0
    y0 = 4700000.0 + ((i * 5) % 64) * 4096.0
    return x0, y0, 16.0


def synth_moll(i: int):
    """Deterministic per-chip Mollweide georeferencing (central-
    meridian mid-latitude window, dyadic offsets, 16 m GSD)."""
    x0 = -1048576.0 + ((i * 9) % 64) * 4096.0
    y0 = 4500000.0 + ((i * 3) % 64) * 4096.0
    return x0, y0, 16.0


def synth_lcc(i: int):
    """Deterministic per-chip LCC georeferencing: dyadic false-origin
    offsets inside the Lambert-93 usage area, 16 m GSD.  Returns
    (x0, y0, gsd); footprint X in [x0, x0+gsd*w], Y in
    [y0, y0+gsd*h]."""
    x0 = 700000.0 + (((i * 7) % 64) - 32) * 4096.0
    y0 = 6600000.0 + (((i * 11) % 64) - 32) * 4096.0
    return x0, y0, 16.0


def synth_albers(i: int):
    """Deterministic per-chip Albers georeferencing (Conus Albers
    interior, dyadic offsets, 16 m GSD)."""
    x0 = -256000.0 + ((i * 13) % 64) * 4096.0
    y0 = 1792000.0 + ((i * 5) % 64) * 4096.0
    return x0, y0, 16.0


def synth_stere(i: int):
    """Deterministic per-chip polar-stereographic georeferencing
    (EPSG:3413 interior — a Greenland-ish window off the pole so
    lon/lat vary smoothly across the chip, dyadic offsets, 16 m
    GSD)."""
    x0 = -512000.0 + ((i * 9) % 64) * 4096.0
    y0 = -2304000.0 + ((i * 3) % 64) * 4096.0
    return x0, y0, 16.0


# ------------------------------------------------- NTv2 grid-shift datum


class NTv2GridShift:
    """Horizontal datum transformation via an NTv2 shift grid — the
    reference reaches this through PROJ's ``+nadgrids=`` horizontal
    grid correction (ogr/ogrct.cpp:1018; the grid FILE itself is the
    frmts/ntv2 driver's subject, sources/ntv2.py here).

    ``subgrids`` is the parsed list from :func:`sources.ntv2.read_ntv2`
    (or equivalently-shaped dicts): bounds/increments in arc-seconds
    with longitudes POSITIVE WEST, float32 shift arrays with row 0 at
    S_LAT and col 0 at E_LONG.

    Subgrid selection: the LAST subgrid in file order whose bounds
    contain the point wins (NTv2 files list children after their
    parents, so the densest containing grid is chosen — the PROJ
    child-grid rule).  Points outside every subgrid pass through
    UNSHIFTED (the PROJ ``errno_outside_grid`` soft path).

    Bilinear interpolation, exact elementwise sequence (the rasterref
    golden mirrors it)::

        tw = (-lon * 3600 - e_long) / long_inc      # positive-west col
        ty = ( lat * 3600 - s_lat) / lat_inc
        c0 = clip(floor(tw), 0, ncols - 2); fx = tw - c0
        r0 = clip(floor(ty), 0, nrows - 2); fy = ty - r0
        v  = (v00 * (1-fy) * (1-fx) + v01 * (1-fy) * fx
              + v10 * fy * (1-fx) + v11 * fy * fx)

    with v00 = grid[r0, c0], v01 = grid[r0, c0+1], v10 = grid[r0+1,
    c0], v11 = grid[r0+1, c0+1] (float32 nodes upcast to float64).

    ``fwd`` maps source-datum (lon, lat) degrees to target-datum
    degrees: lat' = lat + latshift/3600, lon' = lon - lonshift/3600
    (shift positive west, lon positive east).  ``inv`` runs exactly
    FOUR fixed-point iterations of the forward field (deterministic —
    no tolerance branch; PROJ iterates to tolerance, but a fixed count
    makes engine/golden bit-identical and lands ~1e-4 arc-second
    accuracy at realistic shift gradients).
    """

    def __init__(self, subgrids: list[dict]):
        if not subgrids:
            raise ValueError("NTv2GridShift needs >= 1 subgrid")
        self.subs = []
        for s in subgrids:
            nrows = int(round((s["n_lat"] - s["s_lat"]) / s["lat_inc"])) + 1
            ncols = int(round((s["w_long"] - s["e_long"])
                              / s["long_inc"])) + 1
            self.subs.append((
                float(s["s_lat"]), float(s["n_lat"]), float(s["e_long"]),
                float(s["w_long"]), float(s["lat_inc"]),
                float(s["long_inc"]), nrows, ncols,
                np.asarray(s["lat_shift"], np.float64),
                np.asarray(s["lon_shift"], np.float64),
            ))

    def _shift_sec(self, lon, lat):
        """Interpolated (lat_shift, lon_shift) arc-seconds at
        east-positive degree coordinates; zeros outside coverage."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        lon_w = lon * -3600.0
        lat_s = lat * 3600.0
        dla = np.zeros(lon.shape, np.float64)
        dlo = np.zeros(lon.shape, np.float64)
        for (s_lat, n_lat, e_long, w_long, lat_inc, long_inc,
             nrows, ncols, gla, glo) in self.subs:
            m = ((lat_s >= s_lat) & (lat_s <= n_lat)
                 & (lon_w >= e_long) & (lon_w <= w_long))
            if not np.any(m):
                continue
            tw = (lon_w[m] - e_long) / long_inc
            ty = (lat_s[m] - s_lat) / lat_inc
            c0 = np.clip(np.floor(tw), 0, ncols - 2).astype(np.int64)
            r0 = np.clip(np.floor(ty), 0, nrows - 2).astype(np.int64)
            fx = tw - c0
            fy = ty - r0
            for grid, acc in ((gla, dla), (glo, dlo)):
                v = (grid[r0, c0] * (1.0 - fy) * (1.0 - fx)
                     + grid[r0, c0 + 1] * (1.0 - fy) * fx
                     + grid[r0 + 1, c0] * fy * (1.0 - fx)
                     + grid[r0 + 1, c0 + 1] * fy * fx)
                acc[m] = v
        return dla, dlo

    def fwd(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        dla, dlo = self._shift_sec(lon, lat)
        return lon - dlo / 3600.0, lat + dla / 3600.0

    def inv(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        lon_s = lon.copy()
        lat_s = lat.copy()
        for _ in range(4):
            dla, dlo = self._shift_sec(lon_s, lat_s)
            lon_s = lon + dlo / 3600.0
            lat_s = lat - dla / 3600.0
        return lon_s, lat_s


def synth_ntv2_subgrids() -> list[dict]:
    """Deterministic NTv2 fixture grid (FIXTURE — node formulas
    mirrored by the rasterref golden): a 0.25-degree base grid over
    lat 42..46 N, lon 112..118 W, plus a 0.125-degree child subgrid
    over lat 43.5..44.5, lon 114..116 W with an UNRELATED field (so
    child-over-parent selection is observable).  Shift node values are
    small dyadic integers scaled by 4 resp. 2 (exactly representable
    in the file's float32 nodes):

        base : lat[r, c] = (((3r + 5c) %% 17) - 8) * 4
               lon[r, c] = (((7r + 11c) %% 13) - 6) * 4
        child: lat[r, c] = (((5r + 7c) %% 19) - 9) * 2 + 8
               lon[r, c] = (((11r + 3c) %% 23) - 11) * 2 - 4

    (arc-seconds; lon positive west)."""
    r, c = np.meshgrid(np.arange(17), np.arange(25), indexing="ij")
    base = dict(
        name="BASE", parent=None,
        s_lat=42.0 * 3600.0, n_lat=46.0 * 3600.0,
        e_long=112.0 * 3600.0, w_long=118.0 * 3600.0,
        lat_inc=900.0, long_inc=900.0,
        lat_shift=(((3 * r + 5 * c) % 17) - 8).astype(np.float64) * 4.0,
        lon_shift=(((7 * r + 11 * c) % 13) - 6).astype(np.float64) * 4.0,
    )
    r, c = np.meshgrid(np.arange(9), np.arange(17), indexing="ij")
    child = dict(
        name="CHILD", parent="BASE",
        s_lat=43.5 * 3600.0, n_lat=44.5 * 3600.0,
        e_long=114.0 * 3600.0, w_long=116.0 * 3600.0,
        lat_inc=450.0, long_inc=450.0,
        lat_shift=(((5 * r + 7 * c) % 19) - 9).astype(np.float64) * 2.0
        + 8.0,
        lon_shift=(((11 * r + 3 * c) % 23) - 11).astype(np.float64) * 2.0
        - 4.0,
    )
    return [base, child]


def synth_ntv2(i: int):
    """Deterministic per-chip NAD27 lon/lat georeferencing inside the
    synth_ntv2_subgrids coverage (FIXTURE — mirrored by the rasterref
    golden): dyadic origins, 1/512-degree GSD; a subset of chips
    overlaps the CHILD subgrid window.  Returns (lon0, lat0, gsd_deg);
    the chip footprint is lon in [lon0, lon0 + gsd*w], lat in
    [lat0, lat0 + gsd*h] (east-positive degrees)."""
    lon0 = -117.5 + ((i * 7) % 16) * 0.25
    lat0 = 42.5 + ((i * 11) % 16) * 0.1875
    return lon0, lat0, 1.0 / 512.0


def fixture_ntv2_transform() -> NTv2GridShift:
    """The NTv2 fixture transform straight from the synth subgrids
    (in-memory; the warp stage instead round-trips through a real
    .gsb file via sources.ntv2).  float32 node quantization is applied
    here too so both paths interpolate identical values."""
    subs = []
    for s in synth_ntv2_subgrids():
        s = dict(s)
        s["lat_shift"] = s["lat_shift"].astype(np.float32)
        s["lon_shift"] = s["lon_shift"].astype(np.float32)
        subs.append(s)
    return NTv2GridShift(subs)


# -------------------------------------------------- azimuthal families


AEQD_PARAMS = (40.0, -100.0, 0.0, 0.0)    # lat0, lon0, fe, fn
ORTHO_PARAMS = (40.0, -100.0, 0.0, 0.0)
GNOM_PARAMS = (40.0, -100.0, 0.0, 0.0)


class SphericalAzimuthal:
    """The azimuthal family's closed spherical forms on the WGS84
    semi-major (the PROJ ``+R=a`` sphere convention these projections
    classically use; the reference reaches them through PROJ's
    aeqd/ortho/gnom, ogr/ogrct.cpp:1018):

    - ``mode='aeqd'`` — Azimuthal Equidistant (Snyder eq. 25-1..25-15):
      radial distance from the center equals the great-circle arc,
      k' = c / sin(c);
    - ``mode='ortho'`` — Orthographic (Snyder eq. 20-3..20-19):
      the view-from-infinity globe, k' = 1, valid on the near
      hemisphere (cos c > 0);
    - ``mode='gnom'`` — Gnomonic (Snyder eq. 22-3..22-17):
      projection from the sphere center, k' = 1 / cos c; great
      circles map to STRAIGHT LINES (the navigation property).

    All share the oblique-aspect kernel
    ``cos c = sin(lat0) sin(lat) + cos(lat0) cos(lat) cos(lon-lon0)``
    with x = R k' cos(lat) sin(dlon) and
    y = R k' (cos(lat0) sin(lat) - sin(lat0) cos(lat) cos(dlon)); the
    rasterref golden mirrors the exact elementwise sequence.
    Vectorized over coordinate arrays; composable via
    ComposedTransform.
    """

    _R = 6378137.0

    def __init__(self, mode: str, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0):
        if mode not in ("aeqd", "ortho", "gnom"):
            raise ValueError(f"unknown azimuthal mode {mode!r}")
        self.mode = mode
        self.lon0 = float(lon0)
        self.fe = float(fe)
        self.fn = float(fn)
        p0 = np.radians(float(lat0))
        self.sin0 = np.sin(p0)
        self.cos0 = np.cos(p0)

    def fwd(self, lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        cdl = np.cos(dlam)
        cosc = self.sin0 * sphi + self.cos0 * cphi * cdl
        if self.mode == "ortho":
            kp = np.ones_like(cosc)
        elif self.mode == "gnom":
            kp = 1.0 / cosc
        else:
            c = np.arccos(np.clip(cosc, -1.0, 1.0))
            sinc = np.sin(c)
            kp = np.where(sinc > 1e-12,
                          c / np.where(sinc > 1e-12, sinc, 1.0), 1.0)
        x = self._R * kp * cphi * np.sin(dlam)
        y = self._R * kp * (self.cos0 * sphi
                            - self.sin0 * cphi * cdl)
        return self.fe + x, self.fn + y

    def inv(self, E, N):
        x = (np.asarray(E, np.float64) - self.fe) / self._R
        y = (np.asarray(N, np.float64) - self.fn) / self._R
        rho = np.hypot(x, y)
        if self.mode == "ortho":
            c = np.arcsin(np.clip(rho, -1.0, 1.0))
        elif self.mode == "gnom":
            c = np.arctan(rho)
        else:
            c = rho
        sinc = np.sin(c)
        cosc = np.cos(c)
        safe = rho > 1e-12
        rho1 = np.where(safe, rho, 1.0)
        phi = np.arcsin(np.clip(
            cosc * self.sin0
            + np.where(safe, y * sinc * self.cos0 / rho1, 0.0),
            -1.0, 1.0))
        lam = np.arctan2(x * sinc,
                         rho1 * self.cos0 * cosc - y * self.sin0 * sinc)
        lam = np.where(safe, lam, 0.0)
        return self.lon0 + np.degrees(lam), np.degrees(phi)


def synth_aeqd(i: int):
    """Deterministic per-chip azimuthal-equidistant georeferencing
    (window within ~300 km of the projection center, dyadic offsets,
    16 m GSD; FIXTURE — mirrored by the rasterref golden)."""
    x0 = -262144.0 + ((i * 7) % 64) * 4096.0
    y0 = -131072.0 + ((i * 11) % 64) * 4096.0
    return x0, y0, 16.0


def synth_ortho(i: int):
    """Deterministic per-chip orthographic georeferencing (near-center
    window, dyadic offsets, 16 m GSD)."""
    x0 = -131072.0 + ((i * 13) % 64) * 4096.0
    y0 = -262144.0 + ((i * 5) % 64) * 4096.0
    return x0, y0, 16.0


def synth_gnom(i: int):
    """Deterministic per-chip gnomonic georeferencing (near-center
    window, dyadic offsets, 16 m GSD)."""
    x0 = -196608.0 + ((i * 9) % 64) * 4096.0
    y0 = -196608.0 + ((i * 3) % 64) * 4096.0
    return x0, y0, 16.0

# ---------------------------------------------- vertical / geoid shift
#
# The reference's 3-D transform path applies PROJ's +vgridshift
# (geoid grids) behind OGRCreateCoordinateTransformation
# (ogr/ogrct.cpp); the engine's coordinate columns are 2-D, so the
# vertical correction surfaces as a HEIGHT transform: ellipsoidal
# h <-> orthometric H = h - N(lon, lat), with the undulation N
# bilinearly interpolated from a .gtx grid (sources.ntv2.read_gtx)
# using the same elementwise sequence as the NTv2 horizontal grids.


class GeoidGridShift:
    """Geoid-undulation grid: ``undulation(lon, lat)`` metres via
    bilinear interpolation (row 0 = south edge), zeros outside
    coverage (the PROJ outside-grid soft path);
    ``to_orthometric(h, lon, lat)`` = h - N and ``to_ellipsoidal`` =
    H + N are exact inverses by construction.  ``fwd``/``inv`` take
    and return (lon, lat, h) triples so the step composes with 2-D
    chains that carry heights alongside."""

    def __init__(self, lat0: float, lon0: float, dlat: float,
                 dlon: float, values):
        self.lat0, self.lon0 = float(lat0), float(lon0)
        self.dlat, self.dlon = float(dlat), float(dlon)
        self.grid = np.asarray(values, np.float64)
        if self.grid.ndim != 2:
            raise ValueError("geoid grid must be 2-D")

    def undulation(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        nrows, ncols = self.grid.shape
        tx = (lon - self.lon0) / self.dlon
        ty = (lat - self.lat0) / self.dlat
        inside = ((tx >= 0.0) & (tx <= ncols - 1)
                  & (ty >= 0.0) & (ty <= nrows - 1))
        c0 = np.clip(np.floor(tx), 0, ncols - 2).astype(np.int64)
        r0 = np.clip(np.floor(ty), 0, nrows - 2).astype(np.int64)
        fx = tx - c0
        fy = ty - r0
        g = self.grid
        v = (g[r0, c0] * (1.0 - fy) * (1.0 - fx)
             + g[r0, c0 + 1] * (1.0 - fy) * fx
             + g[r0 + 1, c0] * fy * (1.0 - fx)
             + g[r0 + 1, c0 + 1] * fy * fx)
        return np.where(inside, v, 0.0)

    def to_orthometric(self, h, lon, lat):
        return np.asarray(h, np.float64) - self.undulation(lon, lat)

    def to_ellipsoidal(self, H, lon, lat):
        return np.asarray(H, np.float64) + self.undulation(lon, lat)

    def fwd(self, lon, lat, h):
        return (np.asarray(lon, np.float64),
                np.asarray(lat, np.float64),
                self.to_orthometric(h, lon, lat))

    def inv(self, lon, lat, H):
        return (np.asarray(lon, np.float64),
                np.asarray(lat, np.float64),
                self.to_ellipsoidal(H, lon, lat))


def synth_geoid() -> dict:
    """Deterministic geoid-undulation fixture (FIXTURE — mirrored by
    tests): a smooth dyadic surface over a 1-degree cell, amplitudes
    in the real geoid's +-50 m range."""
    nrows, ncols = 33, 41
    j = np.arange(nrows)[:, None]
    i = np.arange(ncols)[None, :]
    v = (20.0 + 12.0 * np.sin(2.0 * np.pi * i / 40.0)
         * np.cos(2.0 * np.pi * j / 32.0)
         - 8.0 * (j / 32.0) + 4.0 * (i / 40.0))
    return {"lat0": 44.0, "lon0": 3.0, "dlat": 1.0 / 32.0,
            "dlon": 1.0 / 40.0, "values": v}

