"""Exact-predicate semantics: ray casting + boundary rule
(ogr/ogrlinearring.cpp:462-543 behavior) incl. on-edge fixtures."""

import numpy as np

from gdal_ray.functions import geom as G


def square(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]], float
    )


def test_wkb_roundtrip_polygon_with_hole():
    rings = [square(0, 0, 10), square(3, 3, 4)[::-1]]
    kind, parsed = G.parse_wkb(G.wkb_polygon(rings))
    assert kind == "polygon"
    assert len(parsed) == 2
    assert np.allclose(parsed[0], rings[0])


def test_wkb_multipolygon():
    mp = G.wkb_multipolygon([[square(0, 0, 1)], [square(5, 5, 2)]])
    kind, polys = G.parse_wkb(mp)
    assert kind == "multipolygon" and len(polys) == 2


def test_pip_interior_exterior():
    rings = [square(0, 0, 10)]
    xs = np.array([5.0, 15.0, -1.0])
    ys = np.array([5.0, 5.0, 5.0])
    assert G.points_intersect_polygon(xs, ys, rings).tolist() == [True, False, False]


def test_pip_boundary_inclusive():
    rings = [square(0, 0, 10)]
    # corners, edge midpoints
    xs = np.array([0.0, 10.0, 5.0, 0.0, 10.0, 5.0])
    ys = np.array([0.0, 10.0, 0.0, 5.0, 5.0, 10.0])
    assert G.points_intersect_polygon(xs, ys, rings).all()


def test_pip_hole_semantics():
    rings = [square(0, 0, 10), square(3, 3, 4)[::-1]]
    xs = np.array([5.0, 3.0, 1.0, 4.0])
    ys = np.array([5.0, 5.0, 1.0, 3.0])
    # inside hole -> out; on hole boundary -> in; in shell -> in
    assert G.points_intersect_polygon(xs, ys, rings).tolist() == [
        False,
        True,
        True,
        True,
    ]


def test_concave_pip():
    # star-like concave ring
    ring = np.array(
        [[0, 0], [10, 0], [5, 4], [10, 10], [0, 10], [0, 0]], dtype=float
    )
    # at y=1 the notch edge (10,0)-(5,4) sits at x=8.75: (8,1) in, (9,1) out
    xs = np.array([2.0, 8.0, 9.0])
    ys = np.array([5.0, 1.0, 1.0])
    res = G.points_intersect_polygon(xs, ys, [ring])
    assert res.tolist() == [True, True, False]


def test_polygons_intersect_cases():
    a = [square(0, 0, 10)]
    assert G.polygons_intersect(a, [square(5, 5, 10)])  # overlap
    assert G.polygons_intersect(a, [square(10, 0, 5)])  # edge touch
    assert G.polygons_intersect(a, [square(2, 2, 2)])  # containment
    assert not G.polygons_intersect(a, [square(20, 20, 3)])  # disjoint
    # hole: small square strictly inside the hole does NOT intersect
    holed = [square(0, 0, 10), square(2, 2, 6)[::-1]]
    assert not G.polygons_intersect(holed, [square(4, 4, 1)])
    assert G.polygons_intersect(holed, [square(1, 1, 8)])  # crosses the ring


def test_clip_ring_rect():
    r = G.clip_ring_rect(square(0, 0, 10), 5, 5, 20, 20)
    assert abs(G.ring_area(r)) == 25.0
    assert G.clip_ring_rect(square(0, 0, 10), 20, 20, 30, 30) is None


def test_envelope_wkb():
    assert G.envelope_wkb(G.wkb_point(3.0, 4.0)) == (3.0, 4.0, 3.0, 4.0)
    assert G.envelope_wkb(G.wkb_polygon([square(1, 2, 3)])) == (1.0, 2.0, 4.0, 5.0)


def test_wkb_z_iso_round_trip():
    """ISO +1000 Z codes parse/emit (ogr/ogr_core.h:405-440)."""
    from gdal_ray.functions.geom import (
        envelope_wkb,
        parse_wkb,
        wkb_linestring_z,
        wkb_point_z,
        wkb_polygon_z,
    )

    k, p = parse_wkb(wkb_point_z(1.0, 2.0, 3.0))
    assert k == "point_z" and p == (1.0, 2.0, 3.0)

    ls = wkb_linestring_z([[0, 0, 5], [3, 4, 7]])
    k, pts = parse_wkb(ls)
    assert k == "linestring_z" and pts.shape == (2, 3)
    assert envelope_wkb(ls) == (0.0, 0.0, 3.0, 4.0)  # XY envelope

    pg = wkb_polygon_z([[[0, 0, 1], [4, 0, 1], [4, 4, 1], [0, 4, 1]]])
    k, rings = parse_wkb(pg)
    assert k == "polygon_z" and rings[0].shape == (5, 3)  # auto-closed
    assert envelope_wkb(pg) == (0.0, 0.0, 4.0, 4.0)


def test_wkb_ewkb_flags_and_m():
    """EWKB 0x80000000 (Z) / 0x40000000 (M) flags and ISO +2000/+3000
    codes parse to the right widths (regression: the old parser
    stripped flags and mis-read 3-wide vertices as 2-wide)."""
    import struct

    from gdal_ray.functions.geom import parse_wkb

    ewkb_z = struct.pack("<BIddd", 1, 0x80000000 | 1, 1.0, 2.0, 3.0)
    assert parse_wkb(ewkb_z) == ("point_z", (1.0, 2.0, 3.0))
    iso_m = struct.pack("<BIddd", 1, 2001, 1.0, 2.0, 9.0)
    assert parse_wkb(iso_m) == ("point_m", (1.0, 2.0, 9.0))
    iso_zm = struct.pack("<BIdddd", 1, 3002, 0, 0, 1, 2) \
        + struct.pack("<4d", 3, 4, 5, 6)
    # LineStringZM: header carries point count, not inline coords
    iso_zm = struct.pack("<BII", 1, 3002, 2) \
        + struct.pack("<8d", 0, 0, 1, 2, 3, 4, 5, 6)
    k, pts = parse_wkb(iso_zm)
    assert k == "linestring_zm" and pts.shape == (2, 4)
    assert pts[1].tolist() == [3.0, 4.0, 5.0, 6.0]


def test_flatten_and_force_3d():
    from gdal_ray.functions.geom import (
        flatten_to_2d,
        force_3d,
        parse_wkb,
        wkb_point,
        wkb_polygon,
        wkb_polygon_z,
    )

    pg3 = wkb_polygon_z([[[0, 0, 9], [4, 0, 9], [4, 4, 9], [0, 4, 9]]])
    flat = flatten_to_2d(pg3)
    k, rings = parse_wkb(flat)
    assert k == "polygon" and rings[0].shape == (5, 2)
    # 2-D input passes through unchanged
    assert flatten_to_2d(flat) == flat
    up = force_3d(wkb_point(1.0, 2.0), z=7.0)
    assert parse_wkb(up) == ("point_z", (1.0, 2.0, 7.0))
    assert force_3d(up) == up  # Z input passes through
    # round trip: force then flatten recovers the 2-D form
    assert flatten_to_2d(force_3d(wkb_polygon([[[0, 0], [2, 0], [1, 2]]])))\
        == wkb_polygon([[[0, 0], [2, 0], [1, 2]]])


def test_multipolygon_z_parse():
    import struct

    from gdal_ray.functions.geom import parse_wkb, wkb_polygon_z

    p1 = wkb_polygon_z([[[0, 0, 1], [2, 0, 1], [1, 2, 1]]])
    p2 = wkb_polygon_z([[[5, 5, 2], [7, 5, 2], [6, 7, 2]]])
    mp = struct.pack("<BII", 1, 6 + 1000, 2) + p1 + p2
    k, polys = parse_wkb(mp)
    assert k == "multipolygon_z" and len(polys) == 2
    assert polys[1][0][0].tolist() == [5.0, 5.0, 2.0]


def test_multipoint_multilinestring_collection_round_trip():
    import numpy as np

    from gdal_ray.functions.geom import (
        envelope_wkb,
        parse_wkb,
        wkb_geometrycollection,
        wkb_multilinestring,
        wkb_multipoint,
        wkb_of,
        wkb_point,
        wkb_polygon,
    )

    mp = wkb_multipoint([[1.0, 2.0], [-3.0, 4.0], [5.0, -6.0]])
    k, pts = parse_wkb(mp)
    assert k == "multipoint" and pts.shape == (3, 2)
    assert envelope_wkb(mp) == (-3.0, -6.0, 5.0, 4.0)
    assert wkb_of((k, pts)) == mp

    mls = wkb_multilinestring([[[0, 0], [1, 1]], [[5, 5], [6, 7], [8, 5]]])
    k, lines = parse_wkb(mls)
    assert k == "multilinestring" and len(lines) == 2
    assert envelope_wkb(mls) == (0.0, 0.0, 8.0, 7.0)
    assert wkb_of((k, lines)) == mls

    gc = wkb_geometrycollection([
        wkb_point(10.0, 20.0),
        wkb_polygon([[[0, 0], [4, 0], [4, 4], [0, 4]]]),
        mp,
    ])
    k, members = parse_wkb(gc)
    assert k == "geometrycollection"
    assert [m[0] for m in members] == ["point", "polygon", "multipoint"]
    assert envelope_wkb(gc) == (-3.0, -6.0, 10.0, 20.0)
    assert wkb_of((k, members)) == gc


def test_geojson_renders_multi_and_collection():
    import json

    from gdal_ray.functions.geom import (
        wkb_geometrycollection,
        wkb_multilinestring,
        wkb_multipoint,
        wkb_point,
    )
    from gdal_ray.sources.geojson import _wkb_to_geojson, geojson_to_table

    gj = _wkb_to_geojson(wkb_multipoint([[1, 2], [3, 4]]))
    assert gj == {"type": "MultiPoint", "coordinates": [[1, 2], [3, 4]]}
    gj = _wkb_to_geojson(wkb_multilinestring([[[0, 0], [1, 1]]]))
    assert gj["type"] == "MultiLineString"
    gj = _wkb_to_geojson(wkb_geometrycollection([wkb_point(5.0, 6.0)]))
    assert gj == {"type": "GeometryCollection",
                  "geometries": [{"type": "Point",
                                  "coordinates": [5.0, 6.0]}]}
    # GeoJSON reader round-trips MultiPoint/MultiLineString features
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"k": 1},
         "geometry": {"type": "MultiPoint",
                      "coordinates": [[1, 2], [3, 4]]}},
        {"type": "Feature", "properties": {"k": 2},
         "geometry": {"type": "MultiLineString",
                      "coordinates": [[[0, 0], [2, 2], [4, 0]]]}},
    ]}
    t = geojson_to_table(json.dumps(fc))
    from gdal_ray.functions.geom import parse_wkb

    kinds = [parse_wkb(w)[0] for w in t.column("geometry").to_pylist()]
    assert kinds == ["multipoint", "multilinestring"]


def test_surface_family_round_trip():
    """PolyhedralSurface / TIN / Triangle (ISO types 15/16/17,
    ogr/ogr_core.h:405-440) + forceTo-MultiPolygon."""
    import numpy as np

    from gdal_ray.functions.geom import (
        parse_wkb,
        ring_area,
        surface_to_multipolygon,
        wkb_polyhedralsurface,
        wkb_tin,
        wkb_triangle,
    )

    tri = wkb_triangle([[0, 0], [4, 0], [0, 3]])
    k, rings = parse_wkb(tri)
    assert k == "triangle" and len(rings) == 1 and len(rings[0]) == 4
    assert abs(abs(ring_area(rings[0])) - 6.0) < 1e-12

    tin = wkb_tin([[[0, 0], [4, 0], [0, 3]],
                   [[4, 0], [4, 3], [0, 3]]])
    k, tris = parse_wkb(tin)
    assert k == "tin" and len(tris) == 2
    mp = surface_to_multipolygon(tin)
    k2, polys = parse_wkb(mp)
    assert k2 == "multipolygon" and len(polys) == 2
    total = sum(abs(ring_area(p[0])) for p in polys)
    assert abs(total - 12.0) < 1e-12  # the two triangles tile a 4x3 rect

    ps = wkb_polyhedralsurface([
        [[[0, 0], [1, 0], [1, 1], [0, 1]]],
        [[[1, 0], [2, 0], [2, 1], [1, 1]]],
    ])
    k, patches = parse_wkb(ps)
    assert k == "polyhedralsurface" and len(patches) == 2
    k2, polys = parse_wkb(surface_to_multipolygon(ps))
    assert k2 == "multipolygon" and len(polys) == 2

    import pytest

    with pytest.raises(ValueError, match="4 points"):
        import struct

        from gdal_ray.functions.geom import WKB_TRIANGLE, _pack_ring

        bad = struct.pack("<BII", 1, WKB_TRIANGLE, 1) + _pack_ring(
            np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float))
        parse_wkb(bad)
    with pytest.raises(ValueError, match="need 3 distinct"):
        wkb_triangle([[0, 0], [1, 0], [1, 1], [0, 1]])


def test_m_and_zm_emitters():
    from gdal_ray.functions.geom import (
        flatten_to_2d,
        parse_wkb,
        wkb_linestring_m,
        wkb_linestring_zm,
        wkb_point,
        wkb_point_m,
        wkb_point_zm,
    )

    assert parse_wkb(wkb_point_m(1.0, 2.0, 9.0)) == ("point_m",
                                                     (1.0, 2.0, 9.0))
    assert parse_wkb(wkb_point_zm(1.0, 2.0, 3.0, 4.0)) == (
        "point_zm", (1.0, 2.0, 3.0, 4.0))
    k, a = parse_wkb(wkb_linestring_m([[0, 0, 5], [1, 1, 6]]))
    assert k == "linestring_m" and a.shape == (2, 3)
    k, a = parse_wkb(wkb_linestring_zm([[0, 0, 5, 7], [1, 1, 6, 8]]))
    assert k == "linestring_zm" and a.shape == (2, 4)
    assert flatten_to_2d(wkb_point_zm(1.0, 2.0, 3.0, 4.0)) == \
        wkb_point(1.0, 2.0)
