"""CRS Well-Known Text (WKT1 / OGC 01-009) export for the EPSG
registry — the `OGRSpatialReference::exportToWkt` analog
(`ogr/ogr_srs_api.h` / `ogr/ogrspatialreference.cpp`), used for
Shapefile ``.prj`` sidecars and anywhere a CRS travels as text.

The emitter templates GEOGCS/PROJCS nodes from an explicit
parameter table that mirrors :mod:`.epsg`'s registry entries (same
defining constants — the text and the math cannot drift), with the
UTM zone families generated programmatically.  ``from_wkt`` resolves
text back through the registry by its AUTHORITY code — the
round-trip contract ``.prj`` needs.
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
    """WKT1 -> engine transform via the registry's AUTHORITY code
    (the importFromWkt common path; parameter-level parsing is not
    attempted — authority-less text errors loudly)."""
    from .epsg import resolve_epsg

    code = authority_code(wkt)
    if code is None:
        raise ValueError(
            "WKT has no EPSG AUTHORITY node; pass an EPSG:NNNN code "
            "or registry-emitted WKT")
    return resolve_epsg(code)
