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
