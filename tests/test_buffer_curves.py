"""Polygon buffer + ISO curve WKB: analytic invariants (engine-side).

Buffer semantics: OGRGeometry::Buffer -> GEOS BufferOp round-join
positive offset (ogr/ogrgeometry.cpp Buffer; autotest/ogr/ogr_geom.py).
Curve semantics: ogr/ogr_core.h:405-440 type codes,
OGRGeometryFactory::curveToLineString / approximateArcAngles stepping
(ogr/ogrgeometryfactory.cpp:4278).
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.curves import (
    linearize_arc3,
    linearize_circularstring,
    linearize_curve,
)
from gdal_ray.functions.geom import (
    parse_wkb,
    wkb_circularstring,
    wkb_compoundcurve,
    wkb_curvepolygon,
    wkb_linestring,
    wkb_point,
)
from gdal_ray.stages.geomops import (buffer_line_chain, buffer_polygon_ring,
                                     curve_suite_batch)

# ------------------------------------------------------------- buffer


def test_buffer_square_analytic_area():
    # A + P*r + four quadrant fillets (8 segments each -> the area of
    # an inscribed regular 32-gon): A + P*r + 16 r^2 sin(pi/16)
    h, r = 5000.0, 1000.0
    xs = [-h, h, h, -h]
    ys = [-h, -h, h, h]
    nv, area, nc = buffer_polygon_ring(xs, ys, r)
    expect = (2 * h) ** 2 + 4 * (2 * h) * r + 16.0 * r * r * np.sin(np.pi / 16.0)
    assert nc == 0
    assert nv == 4 * 2 + 4 * 7  # 2 pts/edge + (m-1)=7 fillet pts/corner
    assert abs(area - expect) < 1e-6 * expect


def test_buffer_orientation_invariant():
    h, r = 5000.0, 1000.0
    cw = buffer_polygon_ring([-h, -h, h, h], [-h, h, h, -h], r)
    ccw = buffer_polygon_ring([-h, h, h, -h], [-h, -h, h, h], r)
    assert cw == ccw


def test_buffer_reflex_trims_and_matches_membership_grid():
    # concave "arrow": reflex vertex at the notch; the raw offset walk
    # self-crosses there and the trim must drop the inverted loop.
    xs = [0, 8000, 8000, 4000, 0]
    ys = [0, 0, 6000, 2500, 6000]
    r = 900.0
    nv, area, nc = buffer_polygon_ring(xs, ys, r)
    assert nc >= 1
    # independent membership estimate: point is in the buffer iff its
    # distance to the polygon is <= r (or it is inside). 400x400 grid.
    px = np.array(xs + [xs[0]], np.float64)
    py = np.array(ys + [ys[0]], np.float64)
    gx = np.linspace(-r - 500, 8000 + r + 500, 400)
    gy = np.linspace(-r - 500, 6000 + r + 500, 400)
    X, Y = np.meshgrid(gx, gy)
    inside = np.zeros(X.shape, bool)
    dmin = np.full(X.shape, np.inf)
    for i in range(len(px) - 1):
        x0, y0, x1, y1 = px[i], py[i], px[i + 1], py[i + 1]
        dx, dy = x1 - x0, y1 - y0
        tt = np.clip(((X - x0) * dx + (Y - y0) * dy) / (dx * dx + dy * dy), 0, 1)
        d2 = (X - (x0 + tt * dx)) ** 2 + (Y - (y0 + tt * dy)) ** 2
        dmin = np.minimum(dmin, np.sqrt(d2))
        crosses = ((y0 <= Y) & (y1 > Y)) | ((y1 <= Y) & (y0 > Y))
        frac = np.where(crosses, (Y - y0) / np.where(y1 != y0, y1 - y0, 1.0), 0)
        inside ^= crosses & (X < x0 + frac * dx)
    member = inside | (dmin <= r)
    cell = (gx[1] - gx[0]) * (gy[1] - gy[0])
    est = member.sum() * cell
    assert abs(area - est) < 0.02 * est


def test_buffer_monotone_in_radius():
    xs = [0, 8000, 8000, 4000, 0]
    ys = [0, 0, 6000, 2500, 6000]
    a1 = buffer_polygon_ring(xs, ys, 500.0)[1]
    a2 = buffer_polygon_ring(xs, ys, 1500.0)[1]
    assert a2 > a1 > 0


def test_buffer_rejects_bad_inputs():
    with pytest.raises(ValueError):
        buffer_polygon_ring([0, 1], [0, 1], 10.0)
    with pytest.raises(ValueError):
        buffer_polygon_ring([0, 10, 0], [0, 0, 10], 0.0)
    with pytest.raises(ValueError):
        buffer_polygon_ring([0, 0, 10, 0], [0, 0, 0, 10], 5.0)  # zero edge


# ------------------------------------------------------- line buffer


def test_line_buffer_straight_segment_exact():
    # corridor: 2rL rectangle + two pi caps sampled at 2*quadseg
    # slices each = one inscribed 32-gon: 16 r^2 sin(pi/16)
    r, L = 500.0, 8000.0
    nv, area, nc = buffer_line_chain([0, L], [0, 0], r)
    expect = 2 * r * L + 16.0 * r * r * np.sin(np.pi / 16.0)
    assert nc == 0
    assert abs(area - expect) < 1e-9 * expect


def test_line_buffer_direction_invariant():
    xs = [0, 4000, 4000]
    ys = [0, 0, 4000]
    fwd = buffer_line_chain(xs, ys, 700.0)
    rev = buffer_line_chain(xs[::-1], ys[::-1], 700.0)
    assert fwd[1] == pytest.approx(rev[1], rel=1e-12)
    assert fwd[0] == rev[0] and fwd[2] == rev[2]


def test_line_buffer_membership_grid():
    # zigzag corridor vs the distance-to-polyline membership estimate
    xs = [0, 2000, 4000, 6000]
    ys = [0, 1500, 0, 1500]
    r = 300.0
    nv, area, nc = buffer_line_chain(xs, ys, r)
    assert nc >= 2  # inside-of-turn trims
    px = np.array(xs, np.float64)
    py = np.array(ys, np.float64)
    gx = np.linspace(-r - 200, 6000 + r + 200, 500)
    gy = np.linspace(-r - 200, 1500 + r + 200, 300)
    X, Y = np.meshgrid(gx, gy)
    dmin = np.full(X.shape, np.inf)
    for i in range(len(px) - 1):
        x0, y0, x1, y1 = px[i], py[i], px[i + 1], py[i + 1]
        dx, dy = x1 - x0, y1 - y0
        tt = np.clip(((X - x0) * dx + (Y - y0) * dy) / (dx * dx + dy * dy),
                     0, 1)
        d2 = (X - (x0 + tt * dx)) ** 2 + (Y - (y0 + tt * dy)) ** 2
        dmin = np.minimum(dmin, np.sqrt(d2))
    cell = (gx[1] - gx[0]) * (gy[1] - gy[0])
    est = (dmin <= r).sum() * cell
    assert abs(area - est) < 0.02 * est


def test_line_buffer_monotone_in_radius():
    xs = [0, 2000, 4000, 6000]
    ys = [0, 1500, 0, 1500]
    a1 = buffer_line_chain(xs, ys, 200.0)[1]
    a2 = buffer_line_chain(xs, ys, 800.0)[1]
    assert a2 > a1 > 0


def test_line_buffer_matches_oracle_restatement():
    from gdal_ray.oracle_ref.geomref import _buffer_line_ref, _ngon

    for kk in (5, 15, 25, 105):
        _, _, vx, vy = _ngon(kk)
        nchain = len(vx) // 2 + 2
        nv, area, nc = buffer_line_chain(list(vx[:nchain]),
                                         list(vy[:nchain]), 1000.0)
        rnv, rnc, rarea = _buffer_line_ref(vx[:nchain], vy[:nchain])
        assert (nv, nc, area) == (rnv, rnc, rarea)


def test_line_buffer_rejects_bad_inputs():
    with pytest.raises(ValueError):
        buffer_line_chain([0], [0], 10.0)
    with pytest.raises(ValueError):
        buffer_line_chain([0, 10], [0, 0], 0.0)
    with pytest.raises(ValueError):
        buffer_line_chain([0, 0, 10], [0, 0, 5], 5.0)  # zero edge


# -------------------------------------------------------- curve WKB


def test_curve_wkb_round_trip():
    cs_pts = [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]
    cs = wkb_circularstring(cs_pts)
    kind, pts = parse_wkb(cs)
    assert kind == "circularstring"
    assert np.array_equal(np.asarray(pts), np.asarray(cs_pts))

    cc = wkb_compoundcurve([wkb_linestring([[0, 0], [2, 0]]),
                            wkb_circularstring([[2, 0], [3, 1], [4, 0]])])
    kind, segs = parse_wkb(cc)
    assert kind == "compoundcurve"
    assert [s[0] for s in segs] == ["linestring", "circularstring"]

    cp = wkb_curvepolygon([wkb_circularstring(
        [[-1, 0], [0, 1], [1, 0], [0, -1], [-1, 0]])])
    kind, rings = parse_wkb(cp)
    assert kind == "curvepolygon"
    assert rings[0][0] == "circularstring"


def test_curve_wkb_rejects_bad_members():
    bad = wkb_compoundcurve([wkb_point(1.0, 2.0)])
    with pytest.raises(ValueError):
        parse_wkb(bad)


def test_arc3_half_circle_chord_length():
    # polyline length of a half circle at 4-degree steps equals the
    # analytic equal-chord sum (n-1) * 2R sin(|sweep| / (2(n-1)))
    R = 1000.0
    pts = linearize_arc3([-R, 0], [0, R], [R, 0])
    n = len(pts)
    assert n == 46  # ceil(180/4) + 1
    seg = np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))
    expect = 2.0 * R * np.sin(np.pi / (2 * (n - 1)))
    assert np.allclose(seg, expect, rtol=1e-9)
    assert pts[0, 0] == -R and pts[-1, 0] == R  # exact endpoints


def test_arc3_collinear_falls_back_straight():
    pts = linearize_arc3([0, 0], [1, 1], [2, 2])
    assert np.array_equal(pts, [[0, 0], [1, 1], [2, 2]])


def test_arc3_step_parameter():
    pts = linearize_arc3([-1, 0], [0, 1], [1, 0], step_deg=90.0)
    assert len(pts) == 3  # max(2, ceil(180/90)+1)


def test_arc3_minor_arc_orientation():
    # p1 on the short way round: sweep must pass through p1
    R = 10.0
    pts = linearize_arc3([R, 0], [R / np.sqrt(2), R / np.sqrt(2)], [0, R])
    assert len(pts) == int(np.ceil(90 / 4)) + 1
    assert (np.hypot(pts[:, 0], pts[:, 1]) > 0.99 * R).all()
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 1] >= -1e-9).all()


def test_circularstring_multi_arc_concat():
    # two arcs sharing an endpoint: shared point appears once
    pts = linearize_circularstring(
        [[-2, 0], [-1, 1], [0, 0], [1, -1], [2, 0]])
    a = linearize_arc3([-2, 0], [-1, 1], [0, 0])
    b = linearize_arc3([0, 0], [1, -1], [2, 0])
    assert len(pts) == len(a) + len(b) - 1
    with pytest.raises(ValueError):
        linearize_circularstring([[0, 0], [1, 1]])  # even count


def test_curvepolygon_full_circle_area():
    # linearized full circle (two half arcs, 91-pt ring with duplicated
    # seam) has the area of the inscribed regular 90-gon
    R = 2000.0
    cp = wkb_curvepolygon([wkb_circularstring(
        [[-R, 0], [0, R], [R, 0], [0, -R], [-R, 0]])])
    kind, rings = linearize_curve(parse_wkb(cp))
    assert kind == "polygon"
    r = rings[0]
    assert len(r) == 91
    n = len(r)
    a2 = sum(r[i, 0] * r[(i + 1) % n, 1] - r[(i + 1) % n, 0] * r[i, 1]
             for i in range(n))
    expect = 0.5 * 90 * R * R * np.sin(2 * np.pi / 90)
    assert abs(abs(a2) * 0.5 - expect) < 1e-9 * expect


def test_curve_suite_batch_schema_and_kinds():
    t = pa.table({"fid": pa.array([3], pa.int64()),
                  "cx": pa.array([1000.0]), "cy": pa.array([2000.0])})
    out = curve_suite_batch(t)
    assert out.column_names == ["kind", "fid", "a", "b", "v"]
    assert out.column("kind").to_pylist() == ["curvecs", "curvecc", "curvepoly"]
    # compound = straight base (2R) + same half-arc polyline
    vs = dict(zip(out.column("kind").to_pylist(), out.column("v").to_pylist()))
    R = 4000.0 + 3 * 500.0
    assert abs(vs["curvecc"] - vs["curvecs"] - 2 * R) < 1e-9 * R
