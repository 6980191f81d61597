"""Delaunay triangulation + piecewise-linear (barycentric) gridding.

``gdal_grid -a linear`` analog: the reference triangulates the
scattered points (alg/delaunay.c, qhull-backed GDALTriangulationCreate)
and interpolates each grid node inside its containing triangle
(alg/gdalgrid.cpp GDALGridLinear); nodes outside the hull get nodata.

Determinism contract (shared with the independent oracle in
``oracle_ref.rasterref``): the triangulation is THE Delaunay
triangulation of the input points augmented with three fixed far-away
"frame" vertices (so every finite point lies inside the frame and the
triangulation of the augmented set is unique whenever no four points
are exactly co-circular).  All geometric decisions — in-circumcircle
during construction, node-in-triangle during location — are EXACT
float64 sign evaluations: a numpy static filter accepts the sign when
the magnitude clears a forward-error bound, and the rare filtered-out
cases recompute with ``fractions.Fraction`` (float64 coordinates are
dyadic rationals, so the fallback is exact).  Interpolated values use
one canonical formula (vertices sorted by (x, y), barycentric along
v1 + l2*(v2-v1) + l3*(v3-v1)) so any correct implementation reproduces
them bit-for-bit.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Frame ("super-triangle") vertices in normalized [0,1] data space.
# Far enough that frame triangles never shadow interior Delaunay
# adjacencies for data confined to the unit square (empirically exact
# vs the true Delaunay on random fixtures; the contract is the
# augmented-set triangulation either way).
FRAME = ((-4096.0, -4096.0), (4096.0, -4096.0), (0.0, 8192.0))

_ORIENT_BOUND = 1e-14  # >> Shewchuk ccwerrboundA (3.33e-16), conservative
_INCIRCLE_BOUND = 1e-13  # >> inerrboundA (2.22e-15), conservative


def _orient_exact(ax, ay, bx, by, cx, cy) -> int:
    F = Fraction
    d = (F(bx) - F(ax)) * (F(cy) - F(ay)) - (F(cx) - F(ax)) * (F(by) - F(ay))
    return (d > 0) - (d < 0)


def orient_sign(ax, ay, bx, by, cx, cy):
    """Vectorized exact sign of orient2d (CCW > 0).  Inputs broadcast;
    returns int8 array of {-1, 0, 1}."""
    ax, ay, bx, by, cx, cy = np.broadcast_arrays(
        *(np.asarray(v, np.float64) for v in (ax, ay, bx, by, cx, cy))
    )
    t1 = (bx - ax) * (cy - ay)
    t2 = (cx - ax) * (by - ay)
    det = t1 - t2
    mag = np.abs(t1) + np.abs(t2)
    out = np.sign(det).astype(np.int8)
    unsure = np.abs(det) <= _ORIENT_BOUND * mag
    if unsure.any():
        idx = np.flatnonzero(unsure.reshape(-1))
        fa = [v.reshape(-1) for v in (ax, ay, bx, by, cx, cy)]
        flat = out.reshape(-1)
        for i in idx:
            flat[i] = _orient_exact(*(v[i] for v in fa))
        out = flat.reshape(out.shape)
    return out


def _incircle_exact(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    F = Fraction
    adx, ady = F(ax) - F(dx), F(ay) - F(dy)
    bdx, bdy = F(bx) - F(dx), F(by) - F(dy)
    cdx, cdy = F(cx) - F(dx), F(cy) - F(dy)
    det = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        + (bdx * bdx + bdy * bdy) * (cdx * ady - adx * cdy)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return (det > 0) - (det < 0)


def incircle_sign(ax, ay, bx, by, cx, cy, dx, dy):
    """Vectorized exact sign of incircle(a,b,c,d) for CCW triangle
    (a,b,c): > 0 iff d strictly inside the circumcircle."""
    ax, ay, bx, by, cx, cy, dx, dy = np.broadcast_arrays(
        *(np.asarray(v, np.float64) for v in (ax, ay, bx, by, cx, cy, dx, dy))
    )
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    alift = adx * adx + ady * ady
    blift = bdx * bdx + bdy * bdy
    clift = cdx * cdx + cdy * cdy
    ab = bdx * cdy - cdx * bdy
    bc = cdx * ady - adx * cdy
    ca = adx * bdy - bdx * ady
    det = alift * ab + blift * bc + clift * ca
    mag = (
        alift * (np.abs(bdx * cdy) + np.abs(cdx * bdy))
        + blift * (np.abs(cdx * ady) + np.abs(adx * cdy))
        + clift * (np.abs(adx * bdy) + np.abs(bdx * ady))
    )
    out = np.sign(det).astype(np.int8)
    unsure = np.abs(det) <= _INCIRCLE_BOUND * mag
    if unsure.any():
        idx = np.flatnonzero(unsure.reshape(-1))
        fa = [v.reshape(-1) for v in (ax, ay, bx, by, cx, cy, dx, dy)]
        flat = out.reshape(-1)
        for i in idx:
            flat[i] = _incircle_exact(*(v[i] for v in fa))
        out = flat.reshape(out.shape)
    return out


def _normalize(px, py):
    """Affine-map points into [0,1]^2 (exact float ops, same formula as
    the oracle).  Returns (nx, ny, fx(x), fy(y)) where fx/fy map grid
    node coordinates with the identical formula."""
    minx, maxx = float(np.min(px)), float(np.max(px))
    miny, maxy = float(np.min(py)), float(np.max(py))
    span = max(maxx - minx, maxy - miny, 1e-300)
    nx = (np.asarray(px, np.float64) - minx) / span
    ny = (np.asarray(py, np.float64) - miny) / span
    return nx, ny, (minx, miny, span)


def _orient_s(ax, ay, bx, by, cx, cy) -> int:
    """Scalar exact orient2d sign (CCW > 0): float static filter,
    Fraction fallback.  Pure-Python floats — no numpy call overhead on
    the incremental construction's hot path."""
    t1 = (bx - ax) * (cy - ay)
    t2 = (cx - ax) * (by - ay)
    det = t1 - t2
    if abs(det) > _ORIENT_BOUND * (abs(t1) + abs(t2)):
        return 1 if det > 0.0 else -1
    return _orient_exact(ax, ay, bx, by, cx, cy)


def _incircle_s(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    """Scalar exact incircle sign for CCW (a,b,c): same filter/fallback
    contract as the vectorized ``incircle_sign``."""
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    alift = adx * adx + ady * ady
    blift = bdx * bdx + bdy * bdy
    clift = cdx * cdx + cdy * cdy
    ab = bdx * cdy - cdx * bdy
    bc = cdx * ady - adx * cdy
    ca = adx * bdy - bdx * ady
    det = alift * ab + blift * bc + clift * ca
    mag = (
        alift * (abs(bdx * cdy) + abs(cdx * bdy))
        + blift * (abs(cdx * ady) + abs(adx * cdy))
        + clift * (abs(adx * bdy) + abs(bdx * ady))
    )
    if abs(det) > _INCIRCLE_BOUND * mag:
        return 1 if det > 0.0 else -1
    return _incircle_exact(ax, ay, bx, by, cx, cy, dx, dy)


def _delaunay_incremental(X, Y, n) -> np.ndarray:
    """Incremental Bowyer-Watson: visibility-walk point location from
    the last created triangle + cavity BFS over strictly-bad neighbours
    (the classic conflict-walk insert, replacing the former
    every-triangle incircle scan — O(n·T) → ~O(n√n) predicate calls).

    Geometric decisions are the SAME strict-incircle / containment
    contract as the vectorized scan: the global bad set of Bowyer-Watson
    is exactly the edge-connected set of strictly-conflicting triangles
    around the containing triangle, so the cavity BFS evicts the
    identical set and the output triangulation is bit-identical
    (property-tested against the quadratic path)."""
    X = [float(v) for v in X]
    Y = [float(v) for v in Y]
    # triangle store: list of (a, b, c) CCW tuples; None = dead
    tris = [(n, n + 1, n + 2)]
    # directed half-edge -> owning triangle index (each alive directed
    # edge belongs to exactly one alive triangle)
    edge = {(n, n + 1): 0, (n + 1, n + 2): 0, (n + 2, n): 0}
    seen = {(X[n], Y[n]), (X[n + 1], Y[n + 1]), (X[n + 2], Y[n + 2])}
    last = 0
    orient = _orient_s
    incircle = _incircle_s
    for p in range(n):
        xp, yp = X[p], Y[p]
        if (xp, yp) in seen:
            continue  # coincident vertex: first-wins, same as the scan
        seen.add((xp, yp))
        # --- visibility walk from `last` to the triangle containing p
        t = last
        guard = 4 * len(tris) + 16
        while True:
            a, b, c = tris[t]
            if orient(X[a], Y[a], X[b], Y[b], xp, yp) < 0:
                t = edge[(b, a)]
            elif orient(X[b], Y[b], X[c], Y[c], xp, yp) < 0:
                t = edge[(c, b)]
            elif orient(X[c], Y[c], X[a], Y[a], xp, yp) < 0:
                t = edge[(a, c)]
            else:
                break  # p inside (or on boundary of) triangle t
            guard -= 1
            if guard <= 0:  # pragma: no cover - safety net
                raise RuntimeError("delaunay walk did not terminate")
        # --- cavity BFS: strictly-conflicting triangles around t
        bad = {t}
        stack = [t]
        while stack:
            ti = stack.pop()
            a, b, c = tris[ti]
            for u, v in ((a, b), (b, c), (c, a)):
                nb = edge.get((v, u))
                if nb is None or nb in bad:
                    continue
                na, nbv, nc = tris[nb]
                if incircle(X[na], Y[na], X[nbv], Y[nbv],
                            X[nc], Y[nc], xp, yp) > 0:
                    bad.add(nb)
                    stack.append(nb)
        # --- boundary = directed edges whose opposite tri is not bad
        boundary = []
        for ti in bad:
            a, b, c = tris[ti]
            for u, v in ((a, b), (b, c), (c, a)):
                nb = edge.get((v, u))
                if nb is None or nb not in bad:
                    boundary.append((u, v))
        for ti in bad:
            a, b, c = tris[ti]
            del edge[(a, b)], edge[(b, c)], edge[(c, a)]
            tris[ti] = None
        for u, v in boundary:
            if orient(X[u], Y[u], X[v], Y[v], xp, yp) < 0:
                u, v = v, u  # keep CCW (mirrors the scan's flip step)
            ti = len(tris)
            tris.append((u, v, p))
            edge[(u, v)] = ti
            edge[(v, p)] = ti
            edge[(p, u)] = ti
            last = ti
    alive = [tr for tr in tris if tr is not None]
    return np.asarray(alive, np.int64).reshape(-1, 3)


def _delaunay_scan(X, Y, n) -> np.ndarray:
    """Vectorized every-triangle-scan Bowyer-Watson (the original
    quadratic path).  Kept as the independent parity check for the
    incremental construction (see tests/test_delaunay_fast.py)."""

    # triangle soup as (3,) index arrays, CCW-oriented
    tris = np.array([[n, n + 1, n + 2]], np.int64)
    for p in range(n):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        bad = (
            incircle_sign(X[a], Y[a], X[b], Y[b], X[c], Y[c], X[p], Y[p]) > 0
        )
        if not bad.any():
            if ((X[:n] == X[p]) & (Y[:n] == Y[p])).sum() > 1:
                continue  # coincident vertex (first-wins; pre-deduped)
            # on-circumcircle tie with its containing triangle: fall
            # back to splitting the exact containing triangle (the same
            # documented convention the oracle's flip algorithm uses:
            # strict empty-circle, containment decides the tie)
            s1 = orient_sign(X[a], Y[a], X[b], Y[b], X[p], Y[p])
            s2 = orient_sign(X[b], Y[b], X[c], Y[c], X[p], Y[p])
            s3 = orient_sign(X[c], Y[c], X[a], Y[a], X[p], Y[p])
            bad = (s1 >= 0) & (s2 >= 0) & (s3 >= 0)
            if not bad.any():
                continue
            bad[np.flatnonzero(bad)[1:]] = False  # split exactly one
        cavity = tris[bad]
        tris = tris[~bad]
        # boundary edges of the cavity = edges appearing exactly once
        edges = np.concatenate(
            [cavity[:, [0, 1]], cavity[:, [1, 2]], cavity[:, [2, 0]]]
        )
        ek = np.sort(edges, axis=1)
        key = ek[:, 0] * (n + 3) + ek[:, 1]
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        uniq_mask = np.ones(len(key_s), bool)
        dup = key_s[1:] == key_s[:-1]
        uniq_mask[1:][dup] = False
        uniq_mask[:-1][dup] = False
        boundary = edges[order][uniq_mask]
        new = np.column_stack(
            [boundary[:, 0], boundary[:, 1], np.full(len(boundary), p, np.int64)]
        )
        # orient new triangles CCW
        s = orient_sign(
            X[new[:, 0]], Y[new[:, 0]], X[new[:, 1]], Y[new[:, 1]],
            X[new[:, 2]], Y[new[:, 2]],
        )
        flip = s < 0
        new[flip] = new[flip][:, [0, 2, 1]]
        tris = np.concatenate([tris, new])
    return tris


def delaunay_triangles(px, py, method: str = "auto") -> np.ndarray:
    """Bowyer-Watson over the normalized points + frame vertices.
    Returns (T, 3) int64 array of point indices (frame triangles
    dropped), each row sorted ascending, rows lexicographically sorted
    — the canonical form the oracle reproduces.

    ``method``: "auto" (incremental walk above a small-n cutoff),
    "incremental", or "scan" (the original vectorized quadratic scan,
    kept as the parity reference)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    n = len(px)
    if n < 3:
        return np.empty((0, 3), np.int64)
    nx, ny, _ = _normalize(px, py)
    # frame vertices occupy indices n..n+2
    X = np.concatenate([nx, [FRAME[0][0], FRAME[1][0], FRAME[2][0]]])
    Y = np.concatenate([ny, [FRAME[0][1], FRAME[1][1], FRAME[2][1]]])
    if method == "scan" or (method == "auto" and n <= 48):
        tris = _delaunay_scan(X, Y, n)
    else:
        tris = _delaunay_incremental(X, Y, n)
    finite = (tris < n).all(axis=1)
    out = np.sort(tris[finite], axis=1)
    order = np.lexsort((out[:, 2], out[:, 1], out[:, 0]))
    return out[order]


def locate_and_interp(px, py, pv, tris, qx, qy, nodata=0.0):
    """For each query node (qx, qy flat arrays), find its containing
    triangle (exact orientation signs; ties -> canonically smallest
    triangle, i.e. the first in the sorted `tris`) and evaluate the
    canonical barycentric formula.  Outside all triangles -> nodata.

    Point location is a uniform grid over the query extent (~sqrt(T)
    cells per axis): each triangle is bucketed into the cells its bbox
    overlaps, each node tests only its own cell's candidates.  The
    bucket mapping is monotone in each coordinate, so a node's cell
    always contains every triangle whose bbox covers the node — the
    candidate set is exact, and taking the smallest-index hit inside
    the cell equals the global canonical choice.  Replaces the former
    all-pairs Q x T sign matrices (the 100x hot-cell cost the
    linear_cap guard worked around)."""
    qx = np.asarray(qx, np.float64)
    qy = np.asarray(qy, np.float64)
    out = np.full(len(qx), nodata, np.float64)
    T = len(tris)
    if T == 0 or len(qx) == 0:
        return out
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pv = np.asarray(pv, np.float64)

    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    ax, ay = px[a], py[a]
    bx, by = px[b], py[b]
    cx, cy = px[c], py[c]
    # vertices are index-sorted; orient CCW for the containment test
    ccw = orient_sign(ax, ay, bx, by, cx, cy)
    swap = ccw < 0
    bx2 = np.where(swap, cx, bx)
    by2 = np.where(swap, cy, by)
    cx2 = np.where(swap, bx, cx)
    cy2 = np.where(swap, by, cy)

    qx0, qx1 = float(qx.min()), float(qx.max())
    qy0, qy1 = float(qy.min()), float(qy.max())
    G = int(min(256, max(1, np.ceil(np.sqrt(T)))))
    sx = (qx1 - qx0) or 1.0
    sy = (qy1 - qy0) or 1.0

    def _cx(v):
        return np.clip(((v - qx0) / sx * G).astype(np.int64), 0, G - 1)

    def _cy(v):
        return np.clip(((v - qy0) / sy * G).astype(np.int64), 0, G - 1)

    ix0 = _cx(np.minimum(np.minimum(ax, bx), cx))
    ix1 = _cx(np.maximum(np.maximum(ax, bx), cx))
    iy0 = _cy(np.minimum(np.minimum(ay, by), cy))
    iy1 = _cy(np.maximum(np.maximum(ay, by), cy))
    nxc = ix1 - ix0 + 1
    nyc = iy1 - iy0 + 1
    cnt = nxc * nyc
    total = int(cnt.sum())
    tri_rep = np.repeat(np.arange(T, dtype=np.int64), cnt)
    off = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    r = np.arange(total, dtype=np.int64) - np.repeat(off, cnt)
    rx = r % np.repeat(nxc, cnt)
    ry = r // np.repeat(nxc, cnt)
    cellid = (np.repeat(iy0, cnt) + ry) * G + (np.repeat(ix0, cnt) + rx)
    rep_order = np.lexsort((tri_rep, cellid))
    cellid = cellid[rep_order]
    tri_rep = tri_rep[rep_order]

    qcell = _cy(qy) * G + _cx(qx)
    q_order = np.argsort(qcell, kind="stable")
    qcell_s = qcell[q_order]
    q_starts = np.searchsorted(qcell_s, np.arange(G * G + 1))
    t_starts = np.searchsorted(cellid, np.arange(G * G + 1))

    for cell in np.unique(qcell_s):
        qs, qe = q_starts[cell], q_starts[cell + 1]
        ts_, te = t_starts[cell], t_starts[cell + 1]
        if ts_ == te:
            continue
        cand = tri_rep[ts_:te]  # ascending tri index (lexsort order)
        rows = q_order[qs:qe]
        ux, uy = qx[rows], qy[rows]
        s1 = orient_sign(
            ax[cand][None, :], ay[cand][None, :],
            bx2[cand][None, :], by2[cand][None, :],
            ux[:, None], uy[:, None],
        )
        s2 = orient_sign(
            bx2[cand][None, :], by2[cand][None, :],
            cx2[cand][None, :], cy2[cand][None, :],
            ux[:, None], uy[:, None],
        )
        s3 = orient_sign(
            cx2[cand][None, :], cy2[cand][None, :],
            ax[cand][None, :], ay[cand][None, :],
            ux[:, None], uy[:, None],
        )
        inside = (s1 >= 0) & (s2 >= 0) & (s3 >= 0) & (ccw[cand] != 0)[None, :]
        hit = inside.any(axis=1)
        if not hit.any():
            continue
        ti = cand[inside.argmax(axis=1)[hit]]  # first = smallest index
        out[rows[hit]] = _bary_eval(px, py, pv, tris[ti], ux[hit], uy[hit])
    return out


def _bary_eval(px, py, pv, tri_rows, ux, uy):
    """Canonical barycentric formula — identical text in the oracle.
    Vertices are ordered by point index (tris rows are pre-sorted)."""
    i1, i2, i3 = tri_rows[:, 0], tri_rows[:, 1], tri_rows[:, 2]
    x1, y1, v1 = px[i1], py[i1], pv[i1]
    x2, y2, v2 = px[i2], py[i2], pv[i2]
    x3, y3, v3 = px[i3], py[i3], pv[i3]
    det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
    l2 = ((ux - x1) * (y3 - y1) - (x3 - x1) * (uy - y1)) / det
    l3 = ((x2 - x1) * (uy - y1) - (ux - x1) * (y2 - y1)) / det
    return v1 + l2 * (v2 - v1) + l3 * (v3 - v1)


def grid_linear(px, py, pv, xs, ys, nodata: float = 0.0) -> np.ndarray:
    """Piecewise-linear gridding: Delaunay triangulate the (deduped,
    canonical-order) points, barycentric-interpolate each grid node in
    its containing triangle; outside the hull -> nodata
    (gdalgrid.cpp GDALGridLinear with default radius semantics)."""
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pv = np.asarray(pv, np.float64)
    # first-wins dedupe of exactly-coincident points (qhull joggle analog)
    _, first = np.unique(np.stack([px, py], axis=1), axis=0, return_index=True)
    keep = np.sort(first)
    px, py, pv = px[keep], py[keep], pv[keep]
    H, W = len(ys), len(xs)
    if len(px) < 3:
        return np.full((H, W), nodata, np.float64)
    tris = delaunay_triangles(px, py)
    # location runs in the SAME normalized space the triangulation used
    nx, ny, (minx, miny, span) = _normalize(px, py)
    gx, gy = np.meshgrid(xs, ys)
    qx = (gx.reshape(-1) - minx) / span
    qy = (gy.reshape(-1) - miny) / span
    vals = locate_and_interp(nx, ny, pv, tris, qx, qy, nodata=nodata)
    return vals.reshape(H, W)
