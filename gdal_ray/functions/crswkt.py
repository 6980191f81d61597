"""CRS Well-Known Text (WKT1 / OGC 01-009) export for the EPSG
registry — the `OGRSpatialReference::exportToWkt` analog
(`ogr/ogr_srs_api.h` / `ogr/ogrspatialreference.cpp`), used for
Shapefile ``.prj`` sidecars and anywhere a CRS travels as text.

The emitter templates GEOGCS/PROJCS nodes from an explicit
parameter table that mirrors :mod:`.epsg`'s registry entries (same
defining constants — the text and the math cannot drift), with the
UTM zone families generated programmatically.  ``from_wkt`` resolves
text back through the registry by its AUTHORITY code — the
round-trip contract ``.prj`` needs — and falls back to
PARAMETER-LEVEL construction (``build_from_wkt``) for authority-less
or unregistered text: a real WKT1 parser feeding the projection-family
classes, with SPHEROID constants matched to named ellipsoids and
TOWGS84 terms composed as Helmert shifts.
"""

from __future__ import annotations

import re

_GEOGCS = {
    "WGS84": ('GEOGCS["WGS 84",DATUM["WGS_1984",'
              'SPHEROID["WGS 84",6378137,298.257223563]],'
              'PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433],'
              'AUTHORITY["EPSG","4326"]]'),
    "ETRS89": ('GEOGCS["ETRS89",DATUM["European_Terrestrial_'
               'Reference_System_1989",'
               'SPHEROID["GRS 1980",6378137,298.257222101]],'
               'PRIMEM["Greenwich",0],'
               'UNIT["degree",0.0174532925199433],'
               'AUTHORITY["EPSG","4258"]]'),
    "NAD83": ('GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
              'SPHEROID["GRS 1980",6378137,298.257222101]],'
              'PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433],'
              'AUTHORITY["EPSG","4269"]]'),
    "RGF93": ('GEOGCS["RGF93",DATUM["Reseau_Geodesique_Francais_'
              '1993",SPHEROID["GRS 1980",6378137,298.257222101]],'
              'PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433],'
              'AUTHORITY["EPSG","4171"]]'),
    "GDA94": ('GEOGCS["GDA94",DATUM["Geocentric_Datum_of_'
              'Australia_1994",'
              'SPHEROID["GRS 1980",6378137,298.257222101]],'
              'PRIMEM["Greenwich",0],'
              'UNIT["degree",0.0174532925199433],'
              'AUTHORITY["EPSG","4283"]]'),
    "NZGD2000": ('GEOGCS["NZGD2000",DATUM["New_Zealand_Geodetic_'
                 'Datum_2000",'
                 'SPHEROID["GRS 1980",6378137,298.257222101]],'
                 'PRIMEM["Greenwich",0],'
                 'UNIT["degree",0.0174532925199433],'
                 'AUTHORITY["EPSG","4167"]]'),
}

#: code -> (name, geogcs key, PROJECTION method, ordered parameters).
#: Values mirror functions.epsg's registry entries exactly.
_PROJCS = {
    3857: ("WGS 84 / Pseudo-Mercator", "WGS84", "Mercator_1SP",
           [("central_meridian", 0), ("scale_factor", 1),
            ("false_easting", 0), ("false_northing", 0)]),
    2154: ("RGF93 / Lambert-93", "RGF93", "Lambert_Conformal_Conic_2SP",
           [("standard_parallel_1", 49), ("standard_parallel_2", 44),
            ("latitude_of_origin", 46.5), ("central_meridian", 3),
            ("false_easting", 700000), ("false_northing", 6600000)]),
    3034: ("ETRS89-extended / LCC Europe", "ETRS89",
           "Lambert_Conformal_Conic_2SP",
           [("standard_parallel_1", 35), ("standard_parallel_2", 65),
            ("latitude_of_origin", 52), ("central_meridian", 10),
            ("false_easting", 4000000), ("false_northing", 2800000)]),
    3035: ("ETRS89-extended / LAEA Europe", "ETRS89",
           "Lambert_Azimuthal_Equal_Area",
           [("latitude_of_center", 52), ("longitude_of_center", 10),
            ("false_easting", 4321000), ("false_northing", 3210000)]),
    5070: ("NAD83 / Conus Albers", "NAD83", "Albers_Conic_Equal_Area",
           [("standard_parallel_1", 29.5),
            ("standard_parallel_2", 45.5),
            ("latitude_of_center", 23), ("longitude_of_center", -96),
            ("false_easting", 0), ("false_northing", 0)]),
    3310: ("NAD83 / California Albers", "NAD83",
           "Albers_Conic_Equal_Area",
           [("standard_parallel_1", 34),
            ("standard_parallel_2", 40.5),
            ("latitude_of_center", 0), ("longitude_of_center", -120),
            ("false_easting", 0), ("false_northing", -4000000)]),
    26985: ("NAD83 / Maryland", "NAD83",
            "Lambert_Conformal_Conic_2SP",
            [("standard_parallel_1", 38.3),
             ("standard_parallel_2", 39.45),
             ("latitude_of_origin", 37.666666666666664),
             ("central_meridian", -77),
             ("false_easting", 400000), ("false_northing", 0)]),
    3112: ("GDA94 / Geoscience Australia Lambert", "GDA94",
           "Lambert_Conformal_Conic_2SP",
           [("standard_parallel_1", -18),
            ("standard_parallel_2", -36),
            ("latitude_of_origin", 0), ("central_meridian", 134),
            ("false_easting", 0), ("false_northing", 0)]),
    102003: ("USA Contiguous Albers Equal Area Conic", "NAD83",
             "Albers_Conic_Equal_Area",
             [("standard_parallel_1", 29.5),
              ("standard_parallel_2", 45.5),
              ("latitude_of_center", 37.5),
              ("longitude_of_center", -96),
              ("false_easting", 0), ("false_northing", 0)]),
    102008: ("North America Albers Equal Area Conic", "NAD83",
             "Albers_Conic_Equal_Area",
             [("standard_parallel_1", 20),
              ("standard_parallel_2", 60),
              ("latitude_of_center", 40),
              ("longitude_of_center", -96),
              ("false_easting", 0), ("false_northing", 0)]),
    3413: ("WGS 84 / NSIDC Sea Ice Polar Stereographic North",
           "WGS84", "Polar_Stereographic",
           [("latitude_of_origin", 70), ("central_meridian", -45),
            ("false_easting", 0), ("false_northing", 0)]),
    3031: ("WGS 84 / Antarctic Polar Stereographic", "WGS84",
           "Polar_Stereographic",
           [("latitude_of_origin", -71), ("central_meridian", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    3976: ("WGS 84 / NSIDC Sea Ice Polar Stereographic South",
           "WGS84", "Polar_Stereographic",
           [("latitude_of_origin", -70), ("central_meridian", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    3995: ("WGS 84 / Arctic Polar Stereographic", "WGS84",
           "Polar_Stereographic",
           [("latitude_of_origin", 71), ("central_meridian", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    5041: ("WGS 84 / UPS North (E,N)", "WGS84",
           "Polar_Stereographic",
           [("latitude_of_origin", 90), ("central_meridian", 0),
            ("scale_factor", 0.994), ("false_easting", 2000000),
            ("false_northing", 2000000)]),
    5042: ("WGS 84 / UPS South (E,N)", "WGS84",
           "Polar_Stereographic",
           [("latitude_of_origin", -90), ("central_meridian", 0),
            ("scale_factor", 0.994), ("false_easting", 2000000),
            ("false_northing", 2000000)]),
    6931: ("WGS 84 / NSIDC EASE-Grid 2.0 North", "WGS84",
           "Lambert_Azimuthal_Equal_Area",
           [("latitude_of_center", 90), ("longitude_of_center", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    6932: ("WGS 84 / NSIDC EASE-Grid 2.0 South", "WGS84",
           "Lambert_Azimuthal_Equal_Area",
           [("latitude_of_center", -90), ("longitude_of_center", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    3575: ("WGS 84 / North Pole LAEA Europe", "WGS84",
           "Lambert_Azimuthal_Equal_Area",
           [("latitude_of_center", 90), ("longitude_of_center", 10),
            ("false_easting", 0), ("false_northing", 0)]),
    6933: ("WGS 84 / NSIDC EASE-Grid 2.0 Global", "WGS84",
           "Cylindrical_Equal_Area",
           [("standard_parallel_1", 30), ("central_meridian", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    4087: ("WGS 84 / World Equidistant Cylindrical", "WGS84",
           "Equirectangular",
           [("standard_parallel_1", 0), ("central_meridian", 0),
            ("false_easting", 0), ("false_northing", 0)]),
    54008: ("World_Sinusoidal", "WGS84", "Sinusoidal",
            [("longitude_of_center", 0),
             ("false_easting", 0), ("false_northing", 0)]),
    54009: ("World_Mollweide", "WGS84", "Mollweide",
            [("central_meridian", 0),
             ("false_easting", 0), ("false_northing", 0)]),
    2193: ("NZGD2000 / New Zealand Transverse Mercator 2000",
           "NZGD2000", "Transverse_Mercator",
           [("latitude_of_origin", 0), ("central_meridian", 173),
            ("scale_factor", 0.9996), ("false_easting", 1600000),
            ("false_northing", 10000000)]),
    3577: ("GDA94 / Australian Albers", "GDA94",
           "Albers_Conic_Equal_Area",
           [("standard_parallel_1", -18),
            ("standard_parallel_2", -36),
            ("latitude_of_center", 0), ("longitude_of_center", 132),
            ("false_easting", 0), ("false_northing", 0)]),
}

_GEOGCS_CODES = {4326: "WGS84", 4258: "ETRS89", 4269: "NAD83",
                 4171: "RGF93"}


def _num(v) -> str:
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def to_wkt(code) -> str:
    """EPSG code -> WKT1 string for the registry's null-shift-datum
    CRS (geographic, UTM zone families, and every named projected
    entry).  Datum-composed codes (27700/27572/4277/4275) raise —
    emitting them without TOWGS84 terms would imply wrong datum
    metadata."""
    from .epsg import parse_code, supported_codes

    num = parse_code(code)
    if num in _GEOGCS_CODES:
        return _GEOGCS[_GEOGCS_CODES[num]]
    if num in _PROJCS:
        name, gk, method, params = _PROJCS[num]
        body = ",".join(f'PARAMETER["{k}",{_num(v)}]'
                        for k, v in params)
        return (f'PROJCS["{name}",{_GEOGCS[gk]},'
                f'PROJECTION["{method}"],{body},UNIT["metre",1],'
                f'AUTHORITY["EPSG","{num}"]]')
    # UTM families
    for base, gk, tag in ((32600, "WGS84", "WGS 84"),
                          (32700, "WGS84", "WGS 84"),
                          (25800, "ETRS89", "ETRS89"),
                          (26900, "NAD83", "NAD83")):
        zone = num - base
        if 1 <= zone <= 60 and num in supported_codes():
            south = base == 32700
            name = f"{tag} / UTM zone {zone}{'S' if south else 'N'}"
            params = [("latitude_of_origin", 0),
                      ("central_meridian", 6 * zone - 183),
                      ("scale_factor", 0.9996),
                      ("false_easting", 500000),
                      ("false_northing", 10000000 if south else 0)]
            body = ",".join(f'PARAMETER["{k}",{_num(v)}]'
                            for k, v in params)
            return (f'PROJCS["{name}",{_GEOGCS[gk]},'
                    f'PROJECTION["Transverse_Mercator"],{body},'
                    f'UNIT["metre",1],AUTHORITY["EPSG","{num}"]]')
    raise ValueError(
        f"EPSG:{num}: WKT export unsupported (datum-composed codes "
        "carry no TOWGS84 text here; unknown codes are not in the "
        "registry)")


def authority_code(wkt: str) -> int | None:
    """The outermost AUTHORITY["EPSG","NNNN"] code (written last by
    every WKT1 emitter)."""
    hits = re.findall(
        r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
    return int(hits[-1]) if hits else None


def from_wkt(wkt: str):
    """WKT1 -> engine transform.  Resolves through the registry by
    AUTHORITY code when the code is registered (the importFromWkt
    common path), else falls back to PARAMETER-LEVEL construction
    over the projection-family classes — the
    ``OGRSpatialReference::importFromWkt`` +
    ``OGRCreateCoordinateTransformation`` pair
    (`ogr/ogrspatialreference.cpp`, `ogr/ogrct.cpp:1018`) for text
    from other producers."""
    from .epsg import resolve_epsg, supported_codes

    code = authority_code(wkt)
    if code is not None and code in supported_codes():
        return resolve_epsg(code)
    return build_from_wkt(wkt)


# ------------------------------------------------------------------
# parameter-level WKT1 import


def parse_wkt1(wkt: str):
    """WKT1 text -> nested ``(keyword, [items])`` tree; items are
    strings (quoted), floats (numbers) or child nodes."""
    pos = 0
    n = len(wkt)

    def skip_ws():
        nonlocal pos
        while pos < n and wkt[pos] in " \t\r\n":
            pos += 1

    def parse_value():
        nonlocal pos
        skip_ws()
        if pos >= n:
            raise ValueError("WKT: unexpected end of text")
        c = wkt[pos]
        if c == '"':
            end = wkt.index('"', pos + 1)
            s = wkt[pos + 1:end]
            pos = end + 1
            return s
        # keyword (possibly a node) or bare number
        m = re.match(r"[A-Za-z_][A-Za-z_0-9]*", wkt[pos:])
        if m:
            kw = m.group(0)
            pos += len(kw)
            skip_ws()
            if pos < n and wkt[pos] in "[(":
                closer = "]" if wkt[pos] == "[" else ")"
                pos += 1
                items = []
                while True:
                    items.append(parse_value())
                    skip_ws()
                    if pos < n and wkt[pos] == ",":
                        pos += 1
                        continue
                    if pos < n and wkt[pos] == closer:
                        pos += 1
                        break
                    raise ValueError(
                        f"WKT: expected ',' or '{closer}' at "
                        f"offset {pos}")
                return (kw.upper(), items)
            return kw
        m = re.match(r"[-+0-9.eE]+", wkt[pos:])
        if m:
            pos += len(m.group(0))
            return float(m.group(0))
        raise ValueError(f"WKT: cannot parse at offset {pos}: "
                         f"{wkt[pos:pos + 20]!r}")

    node = parse_value()
    if not isinstance(node, tuple):
        raise ValueError("WKT: top level is not a node")
    return node


def _find(node, keyword: str):
    for it in node[1]:
        if isinstance(it, tuple) and it[0] == keyword:
            return it
    return None


def _params_of(node) -> dict[str, float]:
    out = {}
    for it in node[1]:
        if isinstance(it, tuple) and it[0] == "PARAMETER":
            out[str(it[1][0]).lower()] = float(it[1][1])
    return out


def _ellipsoid_of(geogcs) -> tuple[float, float]:
    datum = _find(geogcs, "DATUM")
    sph = _find(datum, "SPHEROID") if datum else None
    if sph is None:
        raise ValueError("WKT GEOGCS carries no SPHEROID node")
    return float(sph[1][1]), float(sph[1][2])


def _match_ellipsoid(a: float, rf: float):
    """(a, 1/f) -> named engine ellipsoid when one matches (keeps
    fast paths / exact constants), else the raw tuple (every
    projection class accepts (a, 1/f) directly)."""
    from .proj import ELLIPSOIDS

    for name, (ea, erf) in ELLIPSOIDS.items():
        if abs(ea - a) < 1e-4 and abs(erf - rf) < 1e-7:
            return name
    return (a, rf)


def _towgs84_of(geogcs):
    datum = _find(geogcs, "DATUM")
    tw = _find(datum, "TOWGS84") if datum else None
    if tw is None:
        return None
    vals = [float(v) for v in tw[1]] + [0.0] * 7
    return vals[:7]


#: WKT1 PROJECTION method name (upper) -> builder(params, ell).
def _proj_builders():
    from . import proj as P

    def p(d, *names, default=None):
        for nm in names:
            if nm in d:
                return d[nm]
        if default is None:
            raise ValueError(
                f"WKT PROJECTION missing parameter {names[0]!r}")
        return default

    def tmerc(d, ell):
        return P.TransverseMercator(
            p(d, "latitude_of_origin", default=0.0),
            p(d, "central_meridian"),
            p(d, "scale_factor", default=1.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ell)

    def lcc2(d, ell):
        return P.LambertConformalConic(
            p(d, "standard_parallel_1"),
            p(d, "standard_parallel_2"),
            p(d, "latitude_of_origin"),
            p(d, "central_meridian"),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ellipsoid=ell)

    def lcc1(d, ell):
        lat0 = p(d, "latitude_of_origin")
        return P.LambertConformalConic(
            lat0, lat0, lat0, p(d, "central_meridian"),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0),
            k0=p(d, "scale_factor", default=1.0), ellipsoid=ell)

    def albers(d, ell):
        return P.AlbersEqualArea(
            p(d, "standard_parallel_1"),
            p(d, "standard_parallel_2"),
            p(d, "latitude_of_center", "latitude_of_origin"),
            p(d, "longitude_of_center", "central_meridian"),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ellipsoid=ell)

    def stere(d, ell):
        lat0 = p(d, "latitude_of_origin")
        south = lat0 < 0
        k0 = d.get("scale_factor")
        if k0 is not None and k0 != 1.0:
            if abs(lat0) != 90.0:
                raise ValueError(
                    "Polar_Stereographic variant A needs "
                    "latitude_of_origin ±90")
            return P.PolarStereographic.from_k0(
                k0, p(d, "central_meridian", default=0.0),
                p(d, "false_easting", default=0.0),
                p(d, "false_northing", default=0.0),
                south=south, ellipsoid=ell)
        return P.PolarStereographic(
            lat0, p(d, "central_meridian", default=0.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0),
            south=south, ellipsoid=ell)

    def laea(d, ell):
        return P.LambertAzimuthalEqualArea(
            p(d, "latitude_of_center", "latitude_of_origin"),
            p(d, "longitude_of_center", "central_meridian"),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ellipsoid=ell)

    def sinu(d, ell):
        return P.Sinusoidal(
            p(d, "longitude_of_center", "central_meridian",
              default=0.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ell)

    def moll(d, ell):
        return P.Mollweide(
            p(d, "central_meridian", "longitude_of_center",
              default=0.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ell)

    def cea(d, ell):
        return P.CylindricalEqualArea(
            p(d, "standard_parallel_1", default=0.0),
            p(d, "central_meridian", default=0.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ell)

    def eqc(d, ell):
        return P.EquidistantCylindrical(
            p(d, "standard_parallel_1", "latitude_of_origin",
              default=0.0),
            p(d, "central_meridian", default=0.0),
            p(d, "false_easting", default=0.0),
            p(d, "false_northing", default=0.0), ell)

    def merc1(d, ell):
        if (p(d, "central_meridian", default=0.0) == 0.0
                and p(d, "scale_factor", default=1.0) == 1.0
                and p(d, "false_easting", default=0.0) == 0.0
                and p(d, "false_northing", default=0.0) == 0.0):
            return P.WebMercatorProjection()
        raise ValueError(
            "Mercator_1SP with non-default parameters is not in the "
            "engine's family set (only the Pseudo-Mercator layout)")

    def azim(mode):
        def b(d, ell):
            return P.SphericalAzimuthal(
                mode,
                p(d, "latitude_of_center", "latitude_of_origin"),
                p(d, "longitude_of_center", "central_meridian"),
                p(d, "false_easting", default=0.0),
                p(d, "false_northing", default=0.0))
        return b

    return {
        "TRANSVERSE_MERCATOR": tmerc,
        "LAMBERT_CONFORMAL_CONIC_2SP": lcc2,
        "LAMBERT_CONFORMAL_CONIC_1SP": lcc1,
        "ALBERS_CONIC_EQUAL_AREA": albers,
        "POLAR_STEREOGRAPHIC": stere,
        "LAMBERT_AZIMUTHAL_EQUAL_AREA": laea,
        "SINUSOIDAL": sinu,
        "MOLLWEIDE": moll,
        "CYLINDRICAL_EQUAL_AREA": cea,
        "EQUIRECTANGULAR": eqc,
        "EQUIDISTANT_CYLINDRICAL": eqc,
        "MERCATOR_1SP": merc1,
        "AZIMUTHAL_EQUIDISTANT": azim("aeqd"),
        "ORTHOGRAPHIC": azim("ortho"),
        "GNOMONIC": azim("gnom"),
    }


def build_from_wkt(wkt: str):
    """Parameter-level WKT1 import: build the transform from the
    PROJECTION/PARAMETER/SPHEROID/TOWGS84 nodes directly.  Unknown
    methods and non-metre units error loudly naming what IS
    supported."""
    from . import proj as P

    root = parse_wkt1(wkt)
    if root[0] == "GEOGCS":
        tw = _towgs84_of(root)
        if tw is None or all(v == 0.0 for v in tw):
            return P.IdentityCRS()
        a, rf = _ellipsoid_of(root)
        shift = P.DatumShift(tw[0], tw[1], tw[2], rx_as=tw[3],
                             ry_as=tw[4], rz_as=tw[5], ds_ppm=tw[6],
                             src=_match_ellipsoid(a, rf), dst="WGS84")
        return P.InverseOf(shift)
    if root[0] != "PROJCS":
        raise ValueError(f"WKT root {root[0]} is not GEOGCS/PROJCS")
    geogcs = _find(root, "GEOGCS")
    if geogcs is None:
        raise ValueError("PROJCS carries no GEOGCS node")
    unit = _find(root, "UNIT")
    if unit is not None and abs(float(unit[1][1]) - 1.0) > 1e-12:
        raise ValueError(
            f"PROJCS UNIT {unit[1][0]!r} (factor {unit[1][1]}) "
            "unsupported: the engine's projected CRS are metre-based")
    method = _find(root, "PROJECTION")
    if method is None:
        raise ValueError("PROJCS carries no PROJECTION node")
    mname = str(method[1][0]).upper()
    builders = _proj_builders()
    if mname not in builders:
        raise ValueError(
            f"PROJECTION {method[1][0]!r} unsupported "
            f"(supported: {sorted(builders)})")
    a, rf = _ellipsoid_of(geogcs)
    ell = _match_ellipsoid(a, rf)
    prj = builders[mname](_params_of(root), ell)
    tw = _towgs84_of(geogcs)
    if tw is not None and any(v != 0.0 for v in tw):
        shift = P.DatumShift(tw[0], tw[1], tw[2], rx_as=tw[3],
                             ry_as=tw[4], rz_as=tw[5], ds_ppm=tw[6],
                             src=ell, dst="WGS84")
        return P.ComposedTransform(P.InverseOf(shift), prj)
    return prj
