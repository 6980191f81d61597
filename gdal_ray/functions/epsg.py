"""EPSG code -> coordinate-transform resolver (PROJ database front door).

The reference resolves any ``EPSG:NNNN`` string through PROJ's
parameter database (`ogr/ogrct.cpp:1018` OGRCreateCoordinateTransformation,
`ogr/ogrspatialreference.cpp` importFromEPSG).  This module is the
engine's static analog: a registry of the widely-used codes mapped onto
the existing projection-family classes of :mod:`.proj`, so
``raster_reproject(src_srs="EPSG:2154")`` works without ``family:``
parameter plumbing.

``resolve_epsg(code)`` returns an object with the engine's transform
protocol — ``fwd(lon, lat)`` maps WGS84 geographic degrees to the CRS's
coordinates (projected meters, or datum-shifted degrees for geographic
CRS), ``inv`` maps back.  Codes on non-WGS84 datums compose the
published Helmert shift (EPSG method 9606) ahead of the projection via
:class:`.proj.ComposedTransform`; null-transformation datums
(NAD83/ETRS89/RGF93 — EPSG's 0-parameter transforms to WGS84) project
directly.

Every entry records a ``sample`` validity-window point (lon, lat) used
by round-trip tests and by the deterministic chip-georeferencing
fixture ``synth_epsg``.  Unknown codes raise a loud ValueError listing
what IS supported plus the ``family:`` escape hatch.
"""

from __future__ import annotations

import numpy as np

from . import proj as P

# ------------------------------------------------------------------
# datum shifts (published Helmert parameter sets; EPSG method 9606
# position-vector convention — the convention DatumShift implements).
# Directions below are SOURCE-datum -> WGS84, matching DatumShift's
# fwd; the resolver composes InverseOf(...) where it needs
# WGS84 -> source.


def _ntf_to_wgs84():
    # NTF -> WGS84 geocentric translation (IGN / EPSG:1193):
    # dX=-168, dY=-60, dZ=+320 m, no rotation.
    return P.DatumShift(-168.0, -60.0, 320.0,
                        src="clarke1880ign", dst="WGS84")


def _osgb36_to_wgs84():
    # OSGB36 -> WGS84 (OS "A guide to coordinate systems in Great
    # Britain", the national standard 7-parameter set; ~2 m accuracy):
    # the published WGS84->OSGB36 set negated.
    return P.DatumShift(446.448, -125.157, 542.060,
                        rx_as=0.1502, ry_as=0.2470, rz_as=0.8421,
                        ds_ppm=-20.4894,
                        src="airy1830", dst="WGS84")


# ------------------------------------------------------------------
# registry: code -> (builder, sample_lonlat, description)
# sample = a (lon, lat) interior to the CRS's intended usage area.

def _utm_wgs84(num):
    return lambda: P.UTMProjection(f"EPSG:{num}")


def _utm_grs80(num, base):
    zone = num - base
    lon0 = 6.0 * zone - 183.0
    return lambda: P.TransverseMercator(
        0.0, lon0, 0.9996, 500000.0, 0.0, "GRS80")


def _entries():
    reg = {
        # ---- geographic
        4326: (P.IdentityCRS, (10.0, 50.0),
               "WGS84 geographic (identity)"),
        4258: (P.IdentityCRS, (10.0, 50.0),
               "ETRS89 geographic (EPSG null transform to WGS84)"),
        4269: (P.IdentityCRS, (-96.0, 40.0),
               "NAD83 geographic (EPSG null transform to WGS84)"),
        4171: (P.IdentityCRS, (3.0, 46.5),
               "RGF93 geographic (EPSG null transform to WGS84)"),
        4277: (lambda: P.InverseOf(_osgb36_to_wgs84()), (-2.0, 53.0),
               "OSGB36 geographic (Helmert from WGS84)"),
        4275: (lambda: P.InverseOf(_ntf_to_wgs84()), (2.34, 46.8),
               "NTF geographic (geocentric translation from WGS84)"),
        # ---- web mercator
        3857: (P.WebMercatorProjection, (10.0, 50.0),
               "WGS84 / Pseudo-Mercator"),
        # ---- France
        2154: (lambda: P.LambertConformalConic(
            49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0,
            ellipsoid="GRS80"), (2.35, 48.85),
            "RGF93 / Lambert-93 (LCC 2SP, GRS80)"),
        27572: (lambda: P.ComposedTransform(
            P.InverseOf(_ntf_to_wgs84()),
            P.LambertConformalConic(
                46.8, 46.8, 46.8, 2.337229166666667,
                600000.0, 2200000.0, k0=0.99987742,
                ellipsoid="clarke1880ign")), (2.35, 46.8),
            "NTF (Paris) / Lambert zone II etendu (LCC 1SP + datum)"),
        # ---- Britain
        27700: (lambda: P.ComposedTransform(
            P.InverseOf(_osgb36_to_wgs84()),
            P.TransverseMercator(
                49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
                "airy1830")), (-1.5, 52.5),
            "OSGB36 / British National Grid (TM Airy 1830 + datum)"),
        # ---- Europe
        3035: (lambda: P.LambertAzimuthalEqualArea(
            52.0, 10.0, 4321000.0, 3210000.0, ellipsoid="GRS80"),
            (10.0, 52.0), "ETRS89-extended / LAEA Europe"),
        3034: (lambda: P.LambertConformalConic(
            35.0, 65.0, 52.0, 10.0, 4000000.0, 2800000.0,
            ellipsoid="GRS80"), (10.0, 52.0),
            "ETRS89-extended / LCC Europe"),
        # ---- North America
        5070: (lambda: P.AlbersEqualArea(
            29.5, 45.5, 23.0, -96.0, 0.0, 0.0, ellipsoid="GRS80"),
            (-96.0, 38.0), "NAD83 / Conus Albers (GRS80)"),
        3310: (lambda: P.AlbersEqualArea(
            34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0,
            ellipsoid="GRS80"), (-120.0, 37.0),
            "NAD83 / California Albers (GRS80)"),
        26985: (lambda: P.LambertConformalConic(
            38.3, 39.45, 37.666666666666664, -77.0, 400000.0, 0.0,
            ellipsoid="GRS80"), (-77.0, 39.0),
            "NAD83 / Maryland (SPCS83 LCC 2SP, GRS80)"),
        3112: (lambda: P.LambertConformalConic(
            -18.0, -36.0, 0.0, 134.0, 0.0, 0.0, ellipsoid="GRS80"),
            (134.0, -25.0),
            "GDA94 / Geoscience Australia Lambert (GRS80)"),
        102003: (lambda: P.AlbersEqualArea(
            29.5, 45.5, 37.5, -96.0, 0.0, 0.0, ellipsoid="GRS80"),
            (-96.0, 38.0), "ESRI USA Contiguous Albers (GRS80)"),
        102008: (lambda: P.AlbersEqualArea(
            20.0, 60.0, 40.0, -96.0, 0.0, 0.0, ellipsoid="GRS80"),
            (-96.0, 45.0), "ESRI North America Albers (GRS80)"),
        # ---- polar
        3413: (lambda: P.PolarStereographic(
            70.0, -45.0, 0.0, 0.0), (-45.0, 75.0),
            "WGS84 / NSIDC Sea Ice Polar Stereographic North"),
        3031: (lambda: P.PolarStereographic(
            -71.0, 0.0, 0.0, 0.0, south=True), (10.0, -75.0),
            "WGS84 / Antarctic Polar Stereographic"),
        3976: (lambda: P.PolarStereographic(
            -70.0, 0.0, 0.0, 0.0, south=True), (10.0, -75.0),
            "WGS84 / NSIDC Sea Ice Polar Stereographic South"),
        5041: (lambda: P.PolarStereographic.from_k0(
            0.994, 0.0, 2000000.0, 2000000.0), (30.0, 80.0),
            "WGS84 / UPS North (variant A, k0=0.994)"),
        5042: (lambda: P.PolarStereographic.from_k0(
            0.994, 0.0, 2000000.0, 2000000.0, south=True),
            (30.0, -80.0), "WGS84 / UPS South (variant A)"),
        3995: (lambda: P.PolarStereographic(
            71.0, 0.0, 0.0, 0.0), (20.0, 78.0),
            "WGS84 / Arctic Polar Stereographic"),
        # polar-aspect LAEA (Snyder eq. 24-23/24-25)
        6931: (lambda: P.LambertAzimuthalEqualArea(
            90.0, 0.0, 0.0, 0.0), (15.0, 75.0),
            "WGS84 / NSIDC EASE-Grid 2.0 North (polar LAEA)"),
        6932: (lambda: P.LambertAzimuthalEqualArea(
            -90.0, 0.0, 0.0, 0.0), (15.0, -75.0),
            "WGS84 / NSIDC EASE-Grid 2.0 South (polar LAEA)"),
        3575: (lambda: P.LambertAzimuthalEqualArea(
            90.0, 10.0, 0.0, 0.0), (25.0, 72.0),
            "WGS84 / North Pole LAEA Europe"),
        # ---- world / equal-area grids
        54008: (lambda: P.Sinusoidal(0.0, 0.0, 0.0), (15.0, 40.0),
                "ESRI World Sinusoidal (WGS84)"),
        54009: (lambda: P.Mollweide(0.0, 0.0, 0.0), (15.0, 40.0),
                "ESRI World Mollweide (WGS84)"),
        6933: (lambda: P.CylindricalEqualArea(30.0, 0.0, 0.0, 0.0),
               (15.0, 40.0), "WGS84 / NSIDC EASE-Grid 2.0 Global"),
        4087: (lambda: P.EquidistantCylindrical(0.0, 0.0, 0.0, 0.0),
               (15.0, 40.0), "WGS84 / World Equidistant Cylindrical"),
        # ---- Oceania
        2193: (lambda: P.TransverseMercator(
            0.0, 173.0, 0.9996, 1600000.0, 10000000.0, "GRS80"),
            (173.0, -41.0), "NZGD2000 / New Zealand Transverse Mercator"),
        3577: (lambda: P.AlbersEqualArea(
            -18.0, -36.0, 0.0, 132.0, 0.0, 0.0, ellipsoid="GRS80"),
            (134.0, -25.0), "GDA94 / Australian Albers (GRS80)"),
    }
    # WGS84 UTM (the existing Krueger fast path)
    for z in range(1, 61):
        lon0 = 6.0 * z - 183.0
        reg[32600 + z] = (_utm_wgs84(32600 + z), (lon0, 40.0),
                          f"WGS84 / UTM zone {z}N")
        reg[32700 + z] = (_utm_wgs84(32700 + z), (lon0, -40.0),
                          f"WGS84 / UTM zone {z}S")
    # ETRS89 UTM 28N..38N (EPSG 25828-25838) and NAD83 UTM 1N..23N
    # (EPSG 26901-26923): same UTM parametrization on GRS80.
    for z in range(28, 39):
        lon0 = 6.0 * z - 183.0
        reg[25800 + z] = (_utm_grs80(25800 + z, 25800), (lon0, 50.0),
                          f"ETRS89 / UTM zone {z}N (GRS80)")
    for z in range(1, 24):
        lon0 = 6.0 * z - 183.0
        reg[26900 + z] = (_utm_grs80(26900 + z, 26900), (lon0, 40.0),
                          f"NAD83 / UTM zone {z}N (GRS80)")
    return reg


_REGISTRY = _entries()

#: codes whose WGS84<->CRS path includes a datum shift (accuracy is
#: that of the published Helmert set, ~1-2 m, not mm)
DATUM_SHIFTED = frozenset({4277, 4275, 27572, 27700})

#: 6350 = NAD83(2011) Conus Albers — identical defining parameters to
#: 5070 (the 2011 realization shift is null at this registry's 2-D
#: accuracy), same ESRI web aliases for Web Mercator.
_ALIASES = {900913: 3857, 102100: 3857, 102113: 3857, 6350: 5070}


def parse_code(code) -> int:
    """'EPSG:2154' / 'ESRI:102003' / 2154 -> canonical integer code."""
    if isinstance(code, str):
        body = code.split(":")[-1]
        num = int(body)
    else:
        num = int(code)
    return _ALIASES.get(num, num)


def supported_codes() -> dict[int, str]:
    """code -> description for every registered CRS."""
    return {k: v[2] for k, v in sorted(_REGISTRY.items())}


def resolve_epsg(code):
    """EPSG/ESRI code (int or 'EPSG:NNNN' string) OR WKT1 text ->
    transform with ``fwd(lon, lat) -> (x, y)`` (WGS84 degrees -> CRS
    coordinates) and ``inv`` back.  WKT text (PROJCS/GEOGCS) routes
    through :func:`.crswkt.from_wkt` — registry by AUTHORITY code,
    parameter-level construction otherwise — so every ``src_srs``
    surface accepts a ``.prj``-style string.  Raises a loud
    ValueError for unknown codes."""
    if isinstance(code, str) and code.lstrip().upper().startswith(
            ("PROJCS", "GEOGCS")):
        from .crswkt import from_wkt

        return from_wkt(code)
    num = parse_code(code)
    ent = _REGISTRY.get(num)
    if ent is None:
        fams = "lcc|albers|stere|sinu|eqc|moll|aeqd|ortho|gnom|ntv2"
        known = sorted(_REGISTRY)
        raise ValueError(
            f"EPSG:{num} is not in the engine's static CRS registry. "
            f"Registered codes: {known}. For an unlisted projected "
            f"CRS, pass explicit parameters via src_srs='family:"
            f"<{fams}>' (see functions.proj) or construct the "
            f"projection class directly.")
    return ent[0]()


def sample_point(code) -> tuple[float, float]:
    """A (lon, lat) point interior to the CRS's usage area."""
    return _REGISTRY[parse_code(code)][1]


def synth_epsg(code, i: int):
    """Deterministic per-chip georeferencing for an EPSG-resolved CRS
    (FIXTURE — mirrored by the rasterref golden): dyadic offsets
    around the CRS coordinates of the registry sample point, 16 m
    GSD.  Returns (x0, y0, gsd)."""
    num = parse_code(code)
    prj = resolve_epsg(num)
    lon, lat = sample_point(num)
    cx, cy = prj.fwd(np.float64(lon), np.float64(lat))
    # snap the anchor to a 4096 m lattice so every chip-pixel
    # coordinate is dyadic-exact (the synth_lcc discipline)
    x0 = float(np.floor(float(cx) / 4096.0) * 4096.0) \
        + (((i * 7) % 64) - 32) * 4096.0
    y0 = float(np.floor(float(cy) / 4096.0) * 4096.0) \
        + (((i * 11) % 64) - 32) * 4096.0
    return x0, y0, 16.0
