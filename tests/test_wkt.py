"""WKT parse/emit (functions/wkt.py) — OGRGeometry::exportToWkt /
importFromWkt analog."""

import numpy as np
import pytest

from gdal_ray.functions.geom import (
    parse_wkb,
    wkb_geometrycollection,
    wkb_multipolygon,
    wkb_point,
    wkb_point_z,
    wkb_polygon,
    wkb_tin,
)
from gdal_ray.functions.wkt import parse_wkt, to_wkt, wkb_to_wkt, wkt_to_wkb


def test_point_and_z_forms():
    assert parse_wkt("POINT (1 2)") == ("point", (1.0, 2.0))
    assert parse_wkt("POINT Z (1 2 3)") == ("point_z", (1.0, 2.0, 3.0))
    # bare 3-wide reads as Z (OGR convention)
    assert parse_wkt("POINT (1 2 3)") == ("point_z", (1.0, 2.0, 3.0))
    assert parse_wkt("POINT ZM (1 2 3 4)") == ("point_zm",
                                               (1.0, 2.0, 3.0, 4.0))
    assert to_wkt(("point", (1.5, -2.25))) == "POINT (1.5 -2.25)"
    assert to_wkt(("point_z", (1.0, 2.0, 3.0))) == "POINT Z (1 2 3)"


def test_linestring_polygon_round_trip():
    k, a = parse_wkt("LINESTRING (0 0, 1.5 2.5, -3 4)")
    assert k == "linestring" and a.shape == (3, 2)
    wkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 1 2, 1 1))"
    k, rings = parse_wkt(wkt)
    assert k == "polygon" and len(rings) == 2
    assert to_wkt((k, rings)) == wkt


def test_multi_and_collection_round_trip():
    for wkt in [
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (5 5, 6 7, 8 5))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (10 20), LINESTRING (0 0, 1 1))",
        "TIN (((0 0, 4 0, 0 3, 0 0)), ((4 0, 4 3, 0 3, 4 0)))",
        "CIRCULARSTRING (0 0, 1 1, 2 0)",
    ]:
        assert to_wkt(parse_wkt(wkt)) == wkt
    # nested-parens MULTIPOINT form normalizes to the bare form
    k1, a1 = parse_wkt("MULTIPOINT ((1 2), (3 4))")
    k2, a2 = parse_wkt("MULTIPOINT (1 2, 3 4)")
    assert k1 == k2 and np.array_equal(a1, a2)


def test_wkb_bridge_bit_exact():
    geoms = [
        wkb_point(1.125, -9.5),
        wkb_polygon([[[0, 0], [10, 0], [10, 10], [0, 10]]]),
        wkb_multipolygon([[[[0, 0], [1, 0], [1, 1], [0, 0]]],
                          [[[5, 5], [6, 5], [6, 6], [5, 5]]]]),
        wkb_geometrycollection([wkb_point(3.0, 4.0)]),
    ]
    for wkb in geoms:
        assert wkt_to_wkb(wkb_to_wkt(wkb)) == wkb
    # repr-round-trip doubles survive the text form exactly
    ugly = wkb_point(0.1 + 0.2, 1e-17)
    assert wkt_to_wkb(wkb_to_wkt(ugly)) == ugly
    # Z survives through the text form
    k, p = parse_wkt(to_wkt(parse_wkb(wkb_point_z(1.0, 2.0, 3.5))))
    assert k == "point_z" and p == (1.0, 2.0, 3.5)
    # TIN text form round-trips through the parsed convention
    tin = wkb_tin([[[0, 0], [4, 0], [0, 3]]])
    assert to_wkt(parse_wkb(tin)).startswith("TIN (((")


def test_empty_and_errors():
    k, a = parse_wkt("LINESTRING EMPTY")
    assert k == "linestring" and len(a) == 0
    k, v = parse_wkt("GEOMETRYCOLLECTION EMPTY")
    assert k == "geometrycollection" and v == []
    with pytest.raises(ValueError, match="POINT EMPTY"):
        parse_wkt("POINT EMPTY")
    with pytest.raises(ValueError, match="unknown geometry tag"):
        parse_wkt("BLOB (1 2)")
    with pytest.raises(ValueError, match="trailing"):
        parse_wkt("POINT (1 2) junk")
    with pytest.raises(ValueError, match="inconsistent"):
        parse_wkt("LINESTRING (0 0, 1 1 1)")
    with pytest.raises(ValueError, match="mismatch"):
        parse_wkt("POINT Z (1 2)")


def test_whitespace_and_case_insensitive():
    assert parse_wkt("  point(1   2)  ") == ("point", (1.0, 2.0))
    assert parse_wkt("PoLyGoN((0 0,1 0,1 1,0 0))")[0] == "polygon"


def test_curve_wkt_forms():
    """COMPOUNDCURVE / CURVEPOLYGON text grammar: bare paren groups are
    LineString members, tagged members parse fully (OGR convention)."""
    w = "COMPOUNDCURVE ((0 0, 2 0), CIRCULARSTRING (2 0, 3 1, 4 0))"
    k, members = parse_wkt(w)
    assert k == "compoundcurve"
    assert [m[0] for m in members] == ["linestring", "circularstring"]
    assert to_wkt((k, members)) == w
    w2 = "CURVEPOLYGON (CIRCULARSTRING (-1 0, 0 1, 1 0, 0 -1, -1 0))"
    k, rings = parse_wkt(w2)
    assert k == "curvepolygon" and rings[0][0] == "circularstring"
    assert to_wkt((k, rings)) == w2
    # nested compound ring inside a curve polygon
    w3 = ("CURVEPOLYGON (COMPOUNDCURVE ((0 0, 4 0), "
          "CIRCULARSTRING (4 0, 2 2, 0 0)))")
    k, rings = parse_wkt(w3)
    assert rings[0][0] == "compoundcurve"
    assert to_wkt((k, rings)) == w3
    with pytest.raises(ValueError, match="not allowed"):
        parse_wkt("COMPOUNDCURVE (COMPOUNDCURVE ((0 0, 1 1)))")


def test_curvepolygon_compound_ring_linearizes():
    """The linearizer accepts CurvePolygon rings that are
    CompoundCurves (straight base + arc cap) — ring closes and its
    area approaches the analytic half-disc + nothing."""
    import math

    from gdal_ray.functions.curves import linearize_curve
    from gdal_ray.functions.wkt import parse_wkt

    R = 2.0
    w = ("CURVEPOLYGON (COMPOUNDCURVE ((-2 0, 2 0), "
         "CIRCULARSTRING (2 0, 0 2, -2 0)))")
    kind, rings = linearize_curve(parse_wkt(w))
    assert kind == "polygon"
    r = rings[0]
    assert np.array_equal(r[0], r[-1])  # closed
    n = len(r)
    a2 = math.fsum(r[i, 0] * r[(i + 1) % n, 1]
                   - r[(i + 1) % n, 0] * r[i, 1] for i in range(n))
    half_disc = 0.5 * np.pi * R * R
    assert abs(abs(a2) * 0.5 - half_disc) < 0.01 * half_disc
