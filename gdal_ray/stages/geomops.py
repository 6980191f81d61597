"""Geometry scalar operators (GEOS-parity subset, from scratch).

Reference analogs: OGRGeometry::Centroid (ogr/ogrgeometry.cpp:579 via
GEOS), Simplify (ogr/ogrgeometry.cpp Douglas-Peucker via GEOS),
Buffer (ogr/ogrgeometry.cpp:3564 neighborhood), Intersection
(ogr/ogrlayer.cpp:3345 overlay) and the vector pipeline steps
apps/gdalalg_vector_buffer.cpp / _simplify.cpp.  This engine
re-expresses them as vectorized map_batches kernels over rings stored
as (fid, xs:list<double>, ys:list<double>) columns.

Exactness discipline: input vertices are INTEGER lattice coordinates
(the fixture derivation rounds them), so area/centroid/DP-distance
comparisons are exact int64 arithmetic; the only float results are
Sutherland-Hodgman clip vertices (elementwise IEEE expressions,
bit-reproducible) and their shoelace area accumulated with math.fsum
(correctly-rounded sum — order-independent), which the independent
oracle reproduces bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _rings_from_table(t: pa.Table):
    """-> (fid int64[n], list of (k_i, 2) float arrays)."""
    fid = t.column("fid").to_numpy(zero_copy_only=False)
    xs = t.column("xs").to_pylist()
    ys = t.column("ys").to_pylist()
    rings = [
        np.column_stack([np.asarray(x, np.float64), np.asarray(y, np.float64)])
        for x, y in zip(xs, ys)
    ]
    return fid, rings


# ------------------------------------------------------------- centroid


def centroid_batch(t: pa.Table) -> pa.Table:
    """Area-weighted polygon centroid, exact integer arithmetic.

    Shoelace on int64 lattice coords (translated to the ring's first
    vertex to bound magnitudes), centroid milli-coordinates computed
    with Python big-int rounding floor(p/q + 1/2) = (2p + q) // (2q) —
    no float rounding anywhere.  Vectorized across features with
    np.add.reduceat over the concatenated vertex arrays."""
    fid = t.column("fid").to_numpy(zero_copy_only=False)
    xs = t.column("xs").to_pylist()
    ys = t.column("ys").to_pylist()
    n_feat = len(xs)
    lens = np.fromiter((len(x) for x in xs), np.int64, n_feat)
    if n_feat == 0:
        return pa.table(
            {
                "fid": pa.array([], pa.int64()),
                "cx_milli": pa.array([], pa.int64()),
                "cy_milli": pa.array([], pa.int64()),
            }
        )
    X = np.concatenate([np.asarray(x) for x in xs]).astype(np.int64)
    Y = np.concatenate([np.asarray(y) for y in ys]).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # translate each ring to its first vertex (magnitude bound)
    x0 = np.repeat(X[starts], lens)
    y0 = np.repeat(Y[starts], lens)
    xl = X - x0
    yl = Y - y0
    # next vertex within each ring (wrap)
    idx = np.arange(len(X))
    nxt = idx + 1
    ends = starts + lens - 1
    nxt[ends] = starts
    cross = xl * yl[nxt] - xl[nxt] * yl  # |x|<=6e4 -> cross <= 7.2e9
    a2 = np.add.reduceat(cross, starts)  # 2*signed area
    sx = np.add.reduceat((xl + xl[nxt]) * cross, starts)
    sy = np.add.reduceat((yl + yl[nxt]) * cross, starts)
    cx = np.empty(n_feat, np.int64)
    cy = np.empty(n_feat, np.int64)
    for i in range(n_feat):  # Python big-int exact rounding per feature
        q = 3 * int(a2[i])
        if q == 0:
            cx[i] = int(X[starts[i]]) * 1000
            cy[i] = int(Y[starts[i]]) * 1000
            continue
        px = 1000 * int(sx[i])
        py = 1000 * int(sy[i])
        if q < 0:
            px, py, q = -px, -py, -q
        cx[i] = int(X[starts[i]]) * 1000 + (2 * px + q) // (2 * q)
        cy[i] = int(Y[starts[i]]) * 1000 + (2 * py + q) // (2 * q)
    return pa.table(
        {
            "fid": pa.array(fid, pa.int64()),
            "cx_milli": pa.array(cx, pa.int64()),
            "cy_milli": pa.array(cy, pa.int64()),
        }
    )


# ------------------------------------------- simplify (Douglas-Peucker)


def _dp_keep(pts: np.ndarray, lo: int, hi: int, tol2: int, keep: np.ndarray):
    """Mark kept vertices of the open chain pts[lo..hi] (endpoints kept).
    Distance test is exact: cross^2 > tol2 * |b-a|^2 in int64."""
    if hi - lo < 2:
        return
    ax, ay = int(pts[lo, 0]), int(pts[lo, 1])
    bx, by = int(pts[hi, 0]), int(pts[hi, 1])
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    mx = pts[lo + 1 : hi, 0].astype(np.int64)
    my = pts[lo + 1 : hi, 1].astype(np.int64)
    cross = (mx - ax) * dy - (my - ay) * dx
    d2 = cross * cross  # perpendicular-to-line distance^2 * seg2
    j = int(np.argmax(d2))
    if int(d2[j]) > tol2 * seg2:
        k = lo + 1 + j
        keep[k] = True
        _dp_keep(pts, lo, k, tol2, keep)
        _dp_keep(pts, k, hi, tol2, keep)


def simplify_ring(pts: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker on a closed ring (first vertex NOT repeated):
    anchor at vertex 0 and the vertex farthest from it (max squared
    distance, lowest index on ties), DP the two open chains, rejoin."""
    n = len(pts)
    if n <= 3:
        return pts
    p0 = pts[0].astype(np.int64)
    d2 = ((pts.astype(np.int64) - p0) ** 2).sum(axis=1)
    far = int(np.argmax(d2))
    if far == 0:
        return pts[:3]
    tol2 = int(round(tol * tol))
    keep = np.zeros(n + 1, dtype=bool)
    keep[[0, far, n]] = True  # n aliases vertex 0 (ring closure)
    ring = np.vstack([pts, pts[:1]])
    _dp_keep(ring, 0, far, tol2, keep)
    _dp_keep(ring, far, n, tol2, keep)
    out = ring[np.flatnonzero(keep)[:-1]]  # drop the closing alias
    return out


def simplify_batch(tol: float):
    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        n_in = np.fromiter((len(r) for r in rings), np.int64, len(rings))
        n_out = np.fromiter(
            (len(simplify_ring(r, tol)) for r in rings), np.int64, len(rings)
        )
        return pa.table(
            {
                "fid": pa.array(fid, pa.int64()),
                "n_in": pa.array(n_in, pa.int64()),
                "n_out": pa.array(n_out, pa.int64()),
            }
        )

    fn.__name__ = f"simplify_dp_tol{tol}"
    return fn


# ----------------------------------------------------- point buffer


def buffer_points_batch(radius: float, quadseg: int = 8):
    """Point -> buffer polygon approximated by a 4*quadseg-gon (the
    GEOS quadrant-segments discipline), vertices rounded to the integer
    lattice; emits the exact doubled shoelace area (int64)."""
    n_seg = 4 * quadseg
    ang = 2.0 * np.pi * np.arange(n_seg) / n_seg
    cosr, sinr = np.cos(ang), np.sin(ang)

    def fn(t: pa.Table) -> pa.Table:
        px = t.column("x").to_numpy(zero_copy_only=False)
        py = t.column("y").to_numpy(zero_copy_only=False)
        pid = t.column("pid").to_numpy(zero_copy_only=False)
        dx = np.floor(radius * cosr + 0.5).astype(np.int64)  # shared offsets
        dy = np.floor(radius * sinr + 0.5).astype(np.int64)
        vx = px.astype(np.int64)[:, None] + dx[None, :]
        vy = py.astype(np.int64)[:, None] + dy[None, :]
        vxn = np.roll(vx, -1, axis=1)
        vyn = np.roll(vy, -1, axis=1)
        area2 = (vx * vyn - vxn * vy).sum(axis=1)
        return pa.table(
            {
                "pid": pa.array(pid.astype(np.int64), pa.int64()),
                "area2": pa.array(area2, pa.int64()),
                "n_verts": pa.array(np.full(len(pid), n_seg, np.int64), pa.int64()),
            }
        )

    fn.__name__ = f"buffer_r{radius}"
    return fn


# ----------------------------------------------------- polygon buffer


def _node_walk_prefiltered(xs, ys):
    """Exact noding of a closed walk with a float-bbox prefilter
    (bbox-disjoint edges cannot properly cross — a sound skip, not an
    approximation; needed because buffer rings run ~100 vertices and
    the all-pairs Fraction test would dominate).  Same output as
    functions.makevalid.node_ring."""
    from fractions import Fraction

    from ..functions.makevalid import _seg_intersection

    n = len(xs)
    xa = np.asarray(xs, np.float64)
    ya = np.asarray(ys, np.float64)
    x2 = np.roll(xa, -1)
    y2 = np.roll(ya, -1)
    eminx, emaxx = np.minimum(xa, x2), np.maximum(xa, x2)
    eminy, emaxy = np.minimum(ya, y2), np.maximum(ya, y2)
    pts = [(Fraction(float(xa[i])), Fraction(float(ya[i])))
           for i in range(n)]
    cuts: dict[int, list] = {i: [] for i in range(n)}
    n_cross = 0
    for i in range(n):
        cand = np.nonzero(
            (eminx[i] <= emaxx) & (emaxx[i] >= eminx)
            & (eminy[i] <= emaxy) & (emaxy[i] >= eminy)
        )[0]
        a1, a2 = pts[i], pts[(i + 1) % n]
        for j in cand:
            j = int(j)
            if j <= i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            b1, b2 = pts[j], pts[(j + 1) % n]
            hit = _seg_intersection(a1, a2, b1, b2)
            if hit is None:
                continue
            pt, t = hit
            hit_j = _seg_intersection(b1, b2, a1, a2)
            cuts[i].append((t, pt))
            cuts[j].append((hit_j[1], pt))
            n_cross += 1
    out = []
    for i in range(n):
        out.append(pts[i])
        for _, pt in sorted(cuts[i], key=lambda c: c[0]):
            out.append(pt)
    return out, n_cross


def buffer_polygon_ring(xs, ys, radius: float, quadseg: int = 8):
    """Positive-offset round-join POLYGON buffer (the Minkowski sum
    with a radius-r disc; OGRGeometry::Buffer -> GEOS BufferOp
    analog, ogr/ogrgeometry.cpp Buffer; autotest/ogr/ogr_geom.py):

    1. orient the ring CCW (exact integer shoelace sign — fixture
       coordinates are lattice integers);
    2. raw offset curve: each edge shifts outward by ``radius`` along
       its right normal; each CONVEX vertex inserts a circular fillet
       sampled at the GEOS quadrant-segments discipline (arc quantum
       (pi/2)/quadseg, m = ceil(sweep/quantum) equal steps); reflex
       vertices connect directly (the inverted local loop is removed
       by step 3 — the trim point is the exact crossing);
    3. EXACT noding of the offset walk (rational crossings over the
       dyadic float lattice) + pinch-split into simple rings — the
       same machinery as MakeValid (functions/makevalid.py);
    4. the buffered region of a connected polygon is simply connected,
       so its boundary is the DOMINANT ring: the unique max-|area|
       ring, which must be CCW (exact-positive) and strictly larger
       than every pinched loop (reflex trims pinch off small loops on
       either side of the trim point — a CW inverted sliver when the
       crossing is between the two offset edges, a CCW redundant
       triangle when it involves the connecting chord; both lie inside
       the union and drop).  A tie or a CW dominant ring means the
       offset curve self-touched pathologically and raises.

    Returns (n_verts, area float64 [exact rational -> rounded once],
    n_crossings)."""
    from ..functions.makevalid import ring_area2_exact, split_simple_rings

    n = len(xs)
    if n < 3:
        raise ValueError("buffer_polygon_ring: need >= 3 vertices")
    if not radius > 0:
        raise ValueError("buffer_polygon_ring: radius must be > 0")
    # exact integer orientation (fixture lattice contract)
    a2 = 0
    for i in range(n):
        j = (i + 1) % n
        a2 += int(xs[i]) * int(ys[j]) - int(xs[j]) * int(ys[i])
    if a2 < 0:
        xs = list(xs)[::-1]
        ys = list(ys)[::-1]
    vx = np.asarray(xs, np.float64)
    vy = np.asarray(ys, np.float64)
    dx = np.roll(vx, -1) - vx
    dy = np.roll(vy, -1) - vy
    L = np.hypot(dx, dy)
    if not (L > 0).all():
        raise ValueError("buffer_polygon_ring: zero-length edge")
    nx = dy / L
    ny = -dx / L
    quantum = (np.pi / 2.0) / quadseg
    wx: list[float] = []
    wy: list[float] = []
    for i in range(n):
        wx.append(vx[i] + radius * nx[i])
        wy.append(vy[i] + radius * ny[i])
        k = (i + 1) % n
        wx.append(vx[k] + radius * nx[i])
        wy.append(vy[k] + radius * ny[i])
        crossz = dx[i] * dy[k] - dy[i] * dx[k]
        if crossz > 0:  # convex turn: circular fillet around v_k
            th0 = np.arctan2(ny[i], nx[i])
            th1 = np.arctan2(ny[k], nx[k])
            dth = (th1 - th0) % (2.0 * np.pi)
            m = max(1, int(np.ceil(dth / quantum - 1e-12)))
            for s in range(1, m):
                th = th0 + dth * s / m
                wx.append(vx[k] + radius * np.cos(th))
                wy.append(vy[k] + radius * np.sin(th))
    walk, n_cross = _node_walk_prefiltered(wx, wy)
    rings = split_simple_rings(walk)
    areas = [ring_area2_exact(r) for r in rings]
    order = sorted(range(len(rings)), key=lambda q: abs(areas[q]),
                   reverse=True)
    best = order[0]
    if areas[best] <= 0 or (
        len(order) > 1 and abs(areas[order[1]]) >= areas[best]
    ):
        raise ValueError(
            "buffer_polygon_ring: no dominant CCW exterior ring "
            "(pathological self-touching offset curve)")
    return len(rings[best]), float(areas[best] / 2), n_cross


def buffer_line_chain(xs, ys, radius: float, quadseg: int = 8):
    """Positive round-join, round-cap LINESTRING buffer (the corridor:
    Minkowski sum of an open polyline with a radius-r disc;
    OGRGeometry::Buffer on a LineString -> GEOS BufferOp analog,
    ogr/ogrgeometry.cpp Buffer; autotest/ogr/ogr_geom.py).

    The offset walk traverses the right side forward, sweeps a pi
    round cap at the far end (GEOS quadrant-segments discipline: arc
    quantum (pi/2)/quadseg), returns along the left side (reversed
    edges, negated normals) and closes with the near-end pi cap.
    Convex joints (on whichever side is outside the turn) insert
    circular fillets; the inside of the turn self-crosses and is
    trimmed by the SAME exact-noding + pinch-split + dominant-ring
    machinery as the polygon buffer.

    Returns (n_verts, area float64, n_crossings)."""
    from ..functions.makevalid import ring_area2_exact, split_simple_rings

    m = len(xs)
    if m < 2:
        raise ValueError("buffer_line_chain: need >= 2 vertices")
    if not radius > 0:
        raise ValueError("buffer_line_chain: radius must be > 0")
    vx = np.asarray(xs, np.float64)
    vy = np.asarray(ys, np.float64)
    dx = vx[1:] - vx[:-1]
    dy = vy[1:] - vy[:-1]
    L = np.hypot(dx, dy)
    if not (L > 0).all():
        raise ValueError("buffer_line_chain: zero-length edge")
    nx = dy / L
    ny = -dx / L
    quantum = (np.pi / 2.0) / quadseg
    wx: list[float] = []
    wy: list[float] = []

    def fillet(cx, cy, th0, th1):
        """CCW arc samples strictly between th0 and th1 around (cx, cy)."""
        dth = (th1 - th0) % (2.0 * np.pi)
        k = max(1, int(np.ceil(dth / quantum - 1e-12)))
        for s in range(1, k):
            th = th0 + dth * s / k
            wx.append(cx + radius * np.cos(th))
            wy.append(cy + radius * np.sin(th))

    ne = m - 1
    # right side, forward
    for i in range(ne):
        wx.append(vx[i] + radius * nx[i])
        wy.append(vy[i] + radius * ny[i])
        wx.append(vx[i + 1] + radius * nx[i])
        wy.append(vy[i + 1] + radius * ny[i])
        if i + 1 < ne:
            crossz = dx[i] * dy[i + 1] - dy[i] * dx[i + 1]
            if crossz > 0:  # convex on the right side
                fillet(vx[i + 1], vy[i + 1],
                       np.arctan2(ny[i], nx[i]),
                       np.arctan2(ny[i + 1], nx[i + 1]))
    # far round cap: n_{last} -> -n_{last} (pi sweep)
    fillet(vx[-1], vy[-1],
           np.arctan2(ny[ne - 1], nx[ne - 1]),
           np.arctan2(-ny[ne - 1], -nx[ne - 1]))
    # left side, backward (reversed edges: normal flips sign)
    for i in range(ne - 1, -1, -1):
        wx.append(vx[i + 1] - radius * nx[i])
        wy.append(vy[i + 1] - radius * ny[i])
        wx.append(vx[i] - radius * nx[i])
        wy.append(vy[i] - radius * ny[i])
        if i > 0:
            # joint at v_i between reversed edge i and reversed edge
            # i-1: convex on the left side when the right side was
            # reflex (crossz < 0)
            crossz = dx[i - 1] * dy[i] - dy[i - 1] * dx[i]
            if crossz < 0:
                fillet(vx[i], vy[i],
                       np.arctan2(-ny[i], -nx[i]),
                       np.arctan2(-ny[i - 1], -nx[i - 1]))
    # near round cap: -n_0 -> n_0
    fillet(vx[0], vy[0],
           np.arctan2(-ny[0], -nx[0]),
           np.arctan2(ny[0], nx[0]))

    # drop consecutive duplicates (collinear joints produce them)
    ux: list[float] = []
    uy: list[float] = []
    for px_, py_ in zip(wx, wy):
        if not ux or px_ != ux[-1] or py_ != uy[-1]:
            ux.append(px_)
            uy.append(py_)
    if ux[0] == ux[-1] and uy[0] == uy[-1]:
        ux.pop()
        uy.pop()
    walk, n_cross = _node_walk_prefiltered(ux, uy)
    rings = split_simple_rings(walk)
    areas = [ring_area2_exact(r) for r in rings]
    order = sorted(range(len(rings)), key=lambda q: abs(areas[q]),
                   reverse=True)
    best = order[0]
    if areas[best] <= 0 or (
        len(order) > 1 and abs(areas[order[1]]) >= areas[best]
    ):
        raise ValueError(
            "buffer_line_chain: no dominant CCW exterior ring "
            "(pathological self-touching offset curve)")
    return len(rings[best]), float(areas[best] / 2), n_cross


def buffer_line_batch(radius: float, quadseg: int = 8):
    """map_batches stage over (fid, xs, ys) OPEN polyline rows: round
    cap + round join line buffer; emits (fid, n_verts, n_cross, area)."""

    def fn(t: pa.Table) -> pa.Table:
        fids = t.column("fid").to_numpy(zero_copy_only=False)
        xs = t.column("xs").to_pylist()
        ys = t.column("ys").to_pylist()
        nv = np.empty(len(fids), np.int64)
        nc = np.empty(len(fids), np.int64)
        ar = np.empty(len(fids), np.float64)
        for i in range(len(fids)):
            nv[i], ar[i], nc[i] = buffer_line_chain(
                xs[i], ys[i], radius, quadseg)
        return pa.table(
            {
                "fid": pa.array(fids, pa.int64()),
                "n_verts": pa.array(nv),
                "n_cross": pa.array(nc),
                "area": pa.array(ar),
            }
        )

    return fn


def buffer_polygon_batch(radius: float, quadseg: int = 8):
    """map_batches stage over (fid, xs, ys) polygon rows: positive
    round-join polygon buffer; emits (fid, n_verts, n_cross, area)."""

    def fn(t: pa.Table) -> pa.Table:
        fids = t.column("fid").to_numpy(zero_copy_only=False)
        xs_l = t.column("xs").to_pylist()
        ys_l = t.column("ys").to_pylist()
        nv, nc, ar = [], [], []
        for xs, ys in zip(xs_l, ys_l):
            v, a, c = buffer_polygon_ring(xs, ys, radius, quadseg)
            nv.append(v)
            nc.append(c)
            ar.append(a)
        return pa.table(
            {
                "fid": pa.array(fids.astype(np.int64), pa.int64()),
                "n_verts": pa.array(nv, pa.int64()),
                "n_cross": pa.array(nc, pa.int64()),
                "area": pa.array(ar, pa.float64()),
            }
        )

    fn.__name__ = f"buffer_poly_r{radius}"
    return fn


# ------------------------------------------------------ curve suite


def curve_suite_batch(t: pa.Table) -> pa.Table:
    """Curve-geometry suite over the ngon fixture centers: emit ISO
    curve WKB (CircularString / CompoundCurve / CurvePolygon,
    ogr/ogr_core.h:405-440), parse it back, linearize at the
    reference's 4-degree arc step (ogrgeometryfactory.cpp:4278
    approximateArcAngles discipline) and measure:
      kind='curvecs'  : half-circle CircularString -> n_pts, length
      kind='curvecc'  : line+arc CompoundCurve     -> n_pts, length
      kind='curvepoly': full-circle CurvePolygon   -> n_pts, area
    Lengths/areas are math.fsum reductions (shared engine<->golden
    expression contract); radius R = 4000 + (fid % 10) * 500."""
    import math

    from ..functions.curves import linearize_curve
    from ..functions.geom import (
        parse_wkb,
        wkb_circularstring,
        wkb_compoundcurve,
        wkb_curvepolygon,
        wkb_linestring,
    )

    fids = t.column("fid").to_numpy(zero_copy_only=False)
    cxs = t.column("cx").to_numpy(zero_copy_only=False)
    cys = t.column("cy").to_numpy(zero_copy_only=False)
    kind_o, fid_o, a_o, v_o = [], [], [], []
    for kk, cx, cy in zip(fids, cxs, cys):
        kk, cx, cy = int(kk), float(cx), float(cy)
        R = 4000.0 + (kk % 10) * 500.0
        cs = wkb_circularstring(
            [[cx - R, cy], [cx, cy + R], [cx + R, cy]])
        cc = wkb_compoundcurve([
            wkb_linestring([[cx - R, cy], [cx + R, cy]]),
            wkb_circularstring(
                [[cx + R, cy], [cx, cy + R], [cx - R, cy]]),
        ])
        cp = wkb_curvepolygon([
            wkb_circularstring(
                [[cx - R, cy], [cx, cy + R], [cx + R, cy],
                 [cx, cy - R], [cx - R, cy]]),
        ])
        for kind, wkb in (("curvecs", cs), ("curvecc", cc)):
            _, pts = linearize_curve(parse_wkb(wkb))
            length = math.fsum(
                np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1])).tolist())
            kind_o.append(kind)
            fid_o.append(kk)
            a_o.append(len(pts))
            v_o.append(length)
        _, rings = linearize_curve(parse_wkb(cp))
        r = rings[0]
        n = len(r)
        terms = [r[i, 0] * r[(i + 1) % n, 1]
                 - r[(i + 1) % n, 0] * r[i, 1] for i in range(n)]
        kind_o.append("curvepoly")
        fid_o.append(kk)
        a_o.append(n)
        v_o.append(abs(math.fsum(terms)) * 0.5)
    return pa.table(
        {
            "kind": pa.array(kind_o, pa.string()),
            "fid": pa.array(fid_o, pa.int64()),
            "a": pa.array(a_o, pa.int64()),
            "b": pa.array(np.zeros(len(a_o), np.int64), pa.int64()),
            "v": pa.array(v_o, pa.float64()),
        }
    )


# ------------------------------------- Sutherland-Hodgman rect clip


def clip_ring_rect(pts: np.ndarray, minx: float, miny: float, maxx: float,
                   maxy: float) -> np.ndarray:
    """Clip a (simple, any-winding) ring by an axis-aligned rect via
    Sutherland-Hodgman (4 half-plane passes).  Intersection vertices
    use the canonical t = d1 / (d1 - d2) parameterization — the exact
    elementwise expression the oracle mirrors."""
    out = pts
    for side, bound in (("l", minx), ("r", maxx), ("b", miny), ("t", maxy)):
        if len(out) == 0:
            break
        if side == "l":
            d = out[:, 0] - bound
        elif side == "r":
            d = bound - out[:, 0]
        elif side == "b":
            d = out[:, 1] - bound
        else:
            d = bound - out[:, 1]
        nxt = np.roll(np.arange(len(out)), -1)
        res = []
        for i in range(len(out)):
            j = nxt[i]
            di, dj = d[i], d[j]
            if di >= 0.0:
                res.append(out[i])
                if dj < 0.0:
                    tt = di / (di - dj)
                    res.append(out[i] + tt * (out[j] - out[i]))
            elif dj >= 0.0:
                tt = di / (di - dj)
                res.append(out[i] + tt * (out[j] - out[i]))
        out = np.asarray(res, np.float64).reshape(-1, 2)
    return out


def ring_area_fsum(pts: np.ndarray) -> float:
    """Shoelace area via math.fsum (correctly rounded — deterministic
    regardless of accumulation order), absolute value halved."""
    if len(pts) < 3:
        return 0.0
    x = pts[:, 0]
    y = pts[:, 1]
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    return abs(math.fsum((x * yn - xn * y).tolist())) * 0.5


def clip_rect_batch(dx: float, half: float):
    """Clip each ring by the per-feature window centered (cx+dx, cy)
    with half-size ``half`` (cx, cy columns carried on the batch)."""

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        cx = t.column("cx").to_numpy(zero_copy_only=False)
        cy = t.column("cy").to_numpy(zero_copy_only=False)
        n_out = np.empty(len(rings), np.int64)
        area = np.empty(len(rings), np.float64)
        for i, r in enumerate(rings):
            c = clip_ring_rect(
                r, cx[i] + dx - half, cy[i] - half, cx[i] + dx + half, cy[i] + half
            )
            n_out[i] = len(c)
            area[i] = ring_area_fsum(c)
        return pa.table(
            {
                "fid": pa.array(fid, pa.int64()),
                "n_clip": pa.array(n_out, pa.int64()),
                "clip_area": pa.array(area, pa.float64()),
            }
        )

    fn.__name__ = f"clip_rect_dx{dx}"
    return fn


# ---------------------------------------------------------- segmentize


def segmentize_points(pts: np.ndarray, max_len: float) -> np.ndarray:
    """OGRSimpleCurve::segmentize (ogr/ogrlinestring.cpp:2661-2825):
    densify so no segment exceeds ``max_len``.  Exact reference
    semantics: direction-canonicalisation (reverse when first < last
    by (x, y), segmentize, reverse back), the relative epsilons
    1e-5 (length-square test) and 1e-2 (rounding guard), intermediate
    points at p_i + j * (d / (n+1)) in doubles."""
    n = len(pts)
    if max_len <= 0:
        raise ValueError("max_len must be strictly positive")
    if n < 2:
        return pts
    if pts[0, 0] < pts[-1, 0] or (
        pts[0, 0] == pts[-1, 0] and pts[0, 1] < pts[-1, 1]
    ):
        return segmentize_points(pts[::-1], max_len)[::-1]
    sq_max = max_len * max_len
    out_x: list[float] = []
    out_y: list[float] = []
    for i in range(n):
        out_x.append(pts[i, 0])
        out_y.append(pts[i, 1])
        if i == n - 1:
            break
        dx = pts[i + 1, 0] - pts[i, 0]
        dy = pts[i + 1, 1] - pts[i, 1]
        sq = dx * dx + dy * dy
        if sq - sq_max > 1e-5 * sq_max:
            n_int = int(math.floor(math.sqrt(sq / sq_max) - 1e-2))
            rx = dx / (n_int + 1.0)
            ry = dy / (n_int + 1.0)
            j = np.arange(1, n_int + 1, dtype=np.float64)
            out_x.extend(pts[i, 0] + j * rx)
            out_y.extend(pts[i, 1] + j * ry)
    return np.column_stack([np.asarray(out_x), np.asarray(out_y)])


def segmentize_batch(max_len: float):
    """Per-ring segmentize over the CLOSED ring (first vertex appended
    to the tail, matching the polygon-boundary linestring); emits
    (fid, n_in, n_out, coord_fsum) where coord_fsum is the correctly-
    rounded sum of every output coordinate (order-independent)."""

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        n_in = np.empty(len(rings), np.int64)
        n_out = np.empty(len(rings), np.int64)
        csum = np.empty(len(rings), np.float64)
        for i, r in enumerate(rings):
            closed = np.vstack([r, r[:1]])
            seg = segmentize_points(closed, max_len)
            n_in[i] = len(closed)
            n_out[i] = len(seg)
            csum[i] = math.fsum(seg.ravel().tolist())
        return pa.table(
            {
                "fid": pa.array(fid, pa.int64()),
                "n_in": pa.array(n_in, pa.int64()),
                "n_out": pa.array(n_out, pa.int64()),
                "coord_fsum": pa.array(csum, pa.float64()),
            }
        )

    fn.__name__ = f"segmentize_{max_len}"
    return fn


# ------------------------------------------------------------- swap_xy


def swap_xy_batch(t: pa.Table) -> pa.Table:
    """gdal vector swap-xy (apps/gdalalg_vector_swap_xy.cpp,
    OGRSimpleCurve::swapXY ogr/ogrlinestring.cpp:2841): exchange x/y
    in the ring columns (zero-copy column swap)."""
    cols = {c: t.column(c) for c in t.column_names}
    cols["xs"], cols["ys"] = t.column("ys"), t.column("xs")
    if "cx" in cols and "cy" in cols:
        cols["cx"], cols["cy"] = t.column("cy"), t.column("cx")
    return pa.table(cols)


# -------------------------------------------------- explode collections


def explode_two_part_batch(offset_x: float):
    """gdal vector explode-collections
    (apps/gdalalg_vector_explode_collections.cpp): one output feature
    per geometry part.  Fixture collections are (ring, ring shifted by
    offset_x); emits one row per part (fid, part, n_pts)."""

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        out_f, out_p, out_n = [], [], []
        for i, r in enumerate(rings):
            for part, ring in enumerate((r, r + np.array([offset_x, 0.0]))):
                out_f.append(int(fid[i]))
                out_p.append(part)
                out_n.append(len(ring))
        return pa.table(
            {
                "fid": pa.array(out_f, pa.int64()),
                "part": pa.array(out_p, pa.int64()),
                "n_pts": pa.array(out_n, pa.int64()),
            }
        )

    fn.__name__ = "explode_two_part"
    return fn


# -------------------------------------------------------- make-valid


def make_valid_batch(t: pa.Table) -> pa.Table:
    """gdal vector make-valid (apps/gdalalg_vector_make_valid.cpp /
    OGRGeometry::MakeValid ogr/ogrgeometry.cpp:3924, GEOS LINEWORK
    method): node boundary self-intersections exactly, stack-split
    into simple rings, drop zero-area parts.  Emits one row per output
    part (fid, part [area-ascending], n_pts, area) — for a
    single-crossing bowtie this is exactly the GEOS 2-triangle result
    (autotest/ogr/ogr_geom.py makevalid case)."""
    from ..functions.makevalid import make_valid_batch_arrays

    fid = t.column("fid").to_numpy(zero_copy_only=False)
    xs = t.column("xs").to_pylist()
    ys = t.column("ys").to_pylist()
    f, p, n, a = make_valid_batch_arrays(xs, ys, fid)
    return pa.table(
        {
            "fid": pa.array(f),
            "part": pa.array(p),
            "n_pts": pa.array(n),
            "area": pa.array(a),
        }
    )


# ---------------------------------------------------- vector reproject


def reproject_batch(t: pa.Table) -> pa.Table:
    """gdal vector reproject (apps/gdalalg_vector_reproject.cpp) for
    the supported closed-form CRS pair: ring coordinates treated as
    EPSG:3857 meters -> EPSG:4326 degrees (gdal2tiles GlobalMercator
    MetersToLatLon formulas via functions.mercator).  Emits (fid,
    n_pts, lon_fsum, lat_fsum) — math.fsum is correctly rounded, so
    the sums are accumulation-order independent and bit-mirrorable."""
    from ..functions import mercator as MERC

    fid, rings = _rings_from_table(t)
    out_f, out_n, out_lon, out_lat = [], [], [], []
    for i, r in enumerate(rings):
        lat, lon = MERC.meters_to_lat_lon(r[:, 0], r[:, 1])
        out_f.append(int(fid[i]))
        out_n.append(len(r))
        out_lon.append(math.fsum(lon))
        out_lat.append(math.fsum(lat))
    return pa.table(
        {
            "fid": pa.array(out_f, pa.int64()),
            "n_pts": pa.array(out_n, pa.int64()),
            "lon_fsum": pa.array(out_lon, pa.float64()),
            "lat_fsum": pa.array(out_lat, pa.float64()),
        }
    )


def reproject_epsg_batch(code):
    """gdal vector reproject from ANY registered EPSG CRS (the
    ogrct.cpp importFromEPSG front door, functions.epsg): ring
    coordinates treated as CRS coordinates -> EPSG:4326 degrees via
    the resolver's inverse.  Same output contract as
    reproject_batch."""
    from ..functions.epsg import resolve_epsg

    prj = resolve_epsg(code)

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        out_f, out_n, out_lon, out_lat = [], [], [], []
        for i, r in enumerate(rings):
            lon, lat = prj.inv(r[:, 0], r[:, 1])
            out_f.append(int(fid[i]))
            out_n.append(len(r))
            out_lon.append(math.fsum(np.atleast_1d(lon)))
            out_lat.append(math.fsum(np.atleast_1d(lat)))
        return pa.table(
            {
                "fid": pa.array(out_f, pa.int64()),
                "n_pts": pa.array(out_n, pa.int64()),
                "lon_fsum": pa.array(out_lon, pa.float64()),
                "lat_fsum": pa.array(out_lat, pa.float64()),
            }
        )

    return fn


def reproject_epsg_pair_batch(src, dst):
    """gdal vector reproject between TWO registry CRS (the ogr2ogr
    -s_srs/-t_srs pair): ring coordinates in the SOURCE CRS map
    through src-inverse -> WGS84 -> dst-forward.  Same output
    contract as reproject_batch but sums are in dst units."""
    from ..functions.epsg import resolve_epsg
    from ..functions.proj import ComposedTransform, InverseOf

    chain = ComposedTransform(InverseOf(resolve_epsg(src)),
                              resolve_epsg(dst))

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        out_f, out_n, out_x, out_y = [], [], [], []
        for i, r in enumerate(rings):
            x, y = chain.fwd(r[:, 0], r[:, 1])
            out_f.append(int(fid[i]))
            out_n.append(len(r))
            out_x.append(math.fsum(np.atleast_1d(x)))
            out_y.append(math.fsum(np.atleast_1d(y)))
        return pa.table(
            {
                "fid": pa.array(out_f, pa.int64()),
                "n_pts": pa.array(out_n, pa.int64()),
                "lon_fsum": pa.array(out_x, pa.float64()),
                "lat_fsum": pa.array(out_y, pa.float64()),
            }
        )

    return fn


def reproject_family_batch(family: str):
    """gdal vector reproject through an arbitrary projected family
    (the ogrct.cpp path for non-WebMercator source CRS): ring
    coordinates treated as <family> meters -> EPSG:4326 degrees via
    the functions.proj closed forms (lcc/albers/stere/sinu/eqc/moll
    at the engine's fixture parameters).  Same output contract as
    reproject_batch."""
    from ..functions import proj as P

    prj = {
        "lcc": lambda: P.LambertConformalConic(*P.LCC_PARAMS),
        "albers": lambda: P.AlbersEqualArea(*P.ALBERS_PARAMS),
        "stere": lambda: P.PolarStereographic(*P.STERE_PARAMS),
        "sinu": lambda: P.Sinusoidal(*P.SINU_PARAMS),
        "eqc": lambda: P.EquidistantCylindrical(*P.EQC_PARAMS),
        "moll": lambda: P.Mollweide(*P.MOLL_PARAMS),
        "aeqd": lambda: P.SphericalAzimuthal("aeqd", *P.AEQD_PARAMS),
        "ortho": lambda: P.SphericalAzimuthal("ortho", *P.ORTHO_PARAMS),
        "gnom": lambda: P.SphericalAzimuthal("gnom", *P.GNOM_PARAMS),
    }[family]()

    def fn(t: pa.Table) -> pa.Table:
        fid, rings = _rings_from_table(t)
        out_f, out_n, out_lon, out_lat = [], [], [], []
        for i, r in enumerate(rings):
            lon, lat = prj.inv(r[:, 0], r[:, 1])
            out_f.append(int(fid[i]))
            out_n.append(len(r))
            out_lon.append(math.fsum(lon))
            out_lat.append(math.fsum(lat))
        return pa.table(
            {
                "fid": pa.array(out_f, pa.int64()),
                "n_pts": pa.array(out_n, pa.int64()),
                "lon_fsum": pa.array(out_lon, pa.float64()),
                "lat_fsum": pa.array(out_lat, pa.float64()),
            }
        )

    return fn


# ------------------------------------------------------- set-geom-type


def set_geom_type_batch(t: pa.Table) -> pa.Table:
    """``gdal vector set-geom-type`` promote-to-multi path
    (apps/gdalalg_vector_set_geom_type.cpp via
    OGRGeometryFactory::forceToMultiPolygon): each single Polygon is
    wrapped into a one-part MultiPolygon.  Emits the WKB geometry type
    codes before/after (3 -> 6), the part count, and the fsum of the
    emitted coordinate stream (proves the content survived the
    coercion byte-exactly)."""
    import math
    import struct

    from ..functions.geom import wkb_multipolygon, wkb_polygon

    fid, rings = _rings_from_table(t)
    t_in, t_out, fsums, nv = [], [], [], []
    for pts in rings:
        closed = np.vstack([pts, pts[:1]])
        single = wkb_polygon([closed])
        multi = wkb_multipolygon([[closed]])
        t_in.append(struct.unpack("<I", single[1:5])[0])
        t_out.append(struct.unpack("<I", multi[1:5])[0])
        fsums.append(math.fsum(closed.ravel()))
        nv.append(len(closed))
    return pa.table({
        "fid": pa.array(fid, pa.int64()),
        "type_in": pa.array(t_in, pa.int64()),
        "type_out": pa.array(t_out, pa.int64()),
        "n_verts": pa.array(nv, pa.int64()),
        "coord_fsum": pa.array(fsums, pa.float64()),
    })


# ----------------------------------------------------------- convex hull


def convex_hull_pts(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over int lattice points — exact integer
    cross products (OGRGeometry::ConvexHull analog, GEOS delegate in
    ogr/ogrgeometry.cpp).  Returns hull vertices CCW, no repeated
    endpoint; collinear boundary points are dropped (strict turns)."""
    P = sorted({(int(x), int(y)) for x, y in pts})
    if len(P) <= 2:
        return np.array(P, dtype=np.int64).reshape(-1, 2)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lo: list = []
    for p in P:
        while len(lo) >= 2 and cross(lo[-2], lo[-1], p) <= 0:
            lo.pop()
        lo.append(p)
    hi: list = []
    for p in reversed(P):
        while len(hi) >= 2 and cross(hi[-2], hi[-1], p) <= 0:
            hi.pop()
        hi.append(p)
    return np.array(lo[:-1] + hi[:-1], dtype=np.int64)


def convex_hull_batch(t: pa.Table) -> pa.Table:
    """(fid, n_hull, hull doubled shoelace area — exact int)."""
    fid, rings = _rings_from_table(t)
    n_o, a_o = [], []
    for pts in rings:
        hull = convex_hull_pts(pts)
        n_o.append(len(hull))
        x = hull[:, 0].astype(object)
        y = hull[:, 1].astype(object)
        a2 = 0
        for i in range(len(hull)):
            j = (i + 1) % len(hull)
            a2 += x[i] * y[j] - x[j] * y[i]
        a_o.append(abs(int(a2)))
    return pa.table({
        "fid": pa.array(fid, pa.int64()),
        "n_hull": pa.array(n_o, pa.int64()),
        "hull_area2": pa.array(a_o, pa.int64()),
    })


# -------------------------------------------------------------- distance


def distance_point_batch(t: pa.Table) -> pa.Table:
    """OGRGeometry::Distance analog for a polygon boundary vs an
    external probe point derived from the feature itself
    (max(x)+30000, min(y)-20000): min over boundary segments of the
    point-to-segment distance.  Float contract: the per-segment
    squared-distance expression below (dot/len2 clamp form) is shared
    verbatim with the golden — identical IEEE doubles, one final
    sqrt."""
    fid, rings = _rings_from_table(t)
    d_o, n_o = [], []
    for pts in rings:
        qx = float(pts[:, 0].max()) + 30000.0
        qy = float(pts[:, 1].min()) - 20000.0
        x0 = pts[:, 0]
        y0 = pts[:, 1]
        x1 = np.roll(x0, -1)
        y1 = np.roll(y0, -1)
        dx = x1 - x0
        dy = y1 - y0
        len2 = dx * dx + dy * dy
        dot = (qx - x0) * dx + (qy - y0) * dy
        tt = np.clip(dot / np.maximum(len2, 1.0), 0.0, 1.0)
        cx = x0 + tt * dx
        cy = y0 + tt * dy
        d2 = (qx - cx) * (qx - cx) + (qy - cy) * (qy - cy)
        d_o.append(math.sqrt(float(d2.min())))
        n_o.append(len(pts))
    return pa.table({
        "fid": pa.array(fid, pa.int64()),
        "n_pts": pa.array(n_o, pa.int64()),
        "dist": pa.array(d_o, pa.float64()),
    })
