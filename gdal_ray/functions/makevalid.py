"""MakeValid for self-intersecting polygon rings.

Reference analog: OGRGeometry::MakeValid (ogr/ogrgeometry.cpp:3924),
which delegates to GEOS MakeValid with the default LINEWORK method:
node every self-intersection of the boundary, then reassemble simple
rings.  The vector pipeline step is apps/gdalalg_vector_make_valid.cpp;
autotest coverage in autotest/ogr/ogr_geom.py (test_ogr_geom_makevalid:
the canonical bowtie POLYGON ((0 0,10 10,0 10,10 0,0 0)) becomes a
2-part MULTIPOLYGON).

Engine contract (deterministic, exact):

1. **Noding** — every proper pairwise crossing between non-adjacent
   ring edges is computed EXACTLY (integer/rational arithmetic over
   the lattice fixture coordinates; `fractions.Fraction` for the
   crossing point, so no float noise enters the decomposition).
2. **Stack split** — walking the noded closed boundary, a repeated
   node pinches off the loop between its two visits as one simple
   ring (classic bowtie split).  For a single-crossing bowtie this is
   exactly the GEOS MakeValid result (two triangles); for higher-order
   stars it is the engine's documented deterministic decomposition
   (each pinched loop + the residual core ring).
3. Zero-area parts are dropped; parts are reported sorted by exact
   area so the output order is reproducible bit-for-bit.

All returned areas are exact rationals converted once to float64
(correctly rounded), so an independent implementation that computes
the same rationals produces identical bits.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np


def _seg_intersection(p1, p2, p3, p4):
    """Exact proper-crossing test + crossing point for segments
    (p1,p2) and (p3,p4) with rational endpoints.  Returns the crossing
    point (Fraction pair) iff the segments cross in their interiors,
    else None."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = p3
    x4, y4 = p4
    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if d == 0:
        return None  # parallel / collinear: no proper crossing
    t_num = (x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)
    s_num = (x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)
    t = Fraction(t_num, d)
    s = Fraction(s_num, d)
    if not (0 < t < 1 and 0 < s < 1):
        return None
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1)), t


def node_ring(xs, ys):
    """Insert every proper pairwise edge crossing into the closed ring
    walk.  Input coordinates are converted to exact rationals.  Returns
    (noded point list [(Fraction, Fraction), ...], n_crossings)."""
    n = len(xs)
    # Fraction(float) is exact (every float is a dyadic rational)
    pts = [(Fraction(float(xs[i])), Fraction(float(ys[i]))) for i in range(n)]
    cuts: dict[int, list] = {i: [] for i in range(n)}
    n_cross = 0
    for i in range(n):
        a1, a2 = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share an endpoint
            b1, b2 = pts[j], pts[(j + 1) % n]
            hit = _seg_intersection(a1, a2, b1, b2)
            if hit is None:
                continue
            pt, t = hit
            # parameter of pt along edge j as well
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


def split_simple_rings(walk):
    """Stack-split the noded closed walk into simple rings: a repeated
    node pinches off the loop between its visits."""
    rings = []
    path = []
    seen: dict[tuple, int] = {}
    for p in walk:
        if p in seen:
            k = seen[p]
            loop = path[k:]
            if len(loop) >= 3:
                rings.append(loop)
            for q in path[k + 1:]:
                seen.pop(q, None)
            path = path[: k + 1]
        else:
            seen[p] = len(path)
            path.append(p)
    if len(path) >= 3:
        rings.append(path)
    return rings


def ring_area2_exact(ring) -> Fraction:
    """Doubled signed shoelace area, exact."""
    a2 = Fraction(0)
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        a2 += ring[i][0] * ring[j][1] - ring[j][0] * ring[i][1]
    return a2


def make_valid_ring(xs, ys):
    """MakeValid of one (possibly self-intersecting) ring.

    Returns a list of parts sorted by exact |area| ascending, each a
    dict {n_pts, area (float64, exact->rounded once)}, plus the number
    of crossings noded."""
    walk, n_cross = node_ring(xs, ys)
    rings = split_simple_rings(walk)
    parts = []
    for r in rings:
        a2 = abs(ring_area2_exact(r))
        if a2 == 0:
            continue
        parts.append((a2, len(r)))
    parts.sort(key=lambda p: p[0])
    return (
        [{"n_pts": np, "area": float(a2 / 2)} for a2, np in parts],
        n_cross,
    )


def make_valid_batch_arrays(xs_list, ys_list, fids):
    """Vectorized-per-feature MakeValid over list-typed coordinate
    columns; emits one row per output part (fid, part_idx, n_pts,
    area)."""
    o_fid, o_idx, o_np, o_area = [], [], [], []
    for f, xs, ys in zip(fids, xs_list, ys_list):
        parts, _ = make_valid_ring(xs, ys)
        for k, p in enumerate(parts):
            o_fid.append(int(f))
            o_idx.append(k)
            o_np.append(p["n_pts"])
            o_area.append(p["area"])
    return (
        np.asarray(o_fid, np.int64),
        np.asarray(o_idx, np.int64),
        np.asarray(o_np, np.int64),
        np.asarray(o_area, np.float64),
    )
