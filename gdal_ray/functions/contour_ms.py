"""Contour extraction — marching squares with linear interpolation.

Reference semantics: alg/contour.cpp:568 GDALContourGenerateEx +
alg/marching_squares/ (segment per cell-square from the 16-case
lookup, crossing positions linearly interpolated between pixel
centers; saddle cases disambiguated by the center average, the
marching-squares standard the reference uses).

Output: per level, an (N, 4) array of segments (x0, y0, x1, y1) in
grid pixel-center coordinates; callers map to georeferenced space.
Cross-cell polyline stitching is a planned round-2 stage (per-cell
segments are already consistent at shared values).
"""

from __future__ import annotations

import numpy as np


def _interp(p, q, vp, vq, level):
    t = (level - vp) / (vq - vp)
    return p + t * (q - p)


_EDGE_PAIRS = {
    # case -> list of (edge_a, edge_b); edges: 0=top 1=bottom 2=left 3=right
    1: [(2, 1)], 14: [(2, 1)],
    2: [(1, 3)], 13: [(1, 3)],
    3: [(2, 3)], 12: [(2, 3)],
    4: [(0, 3)], 11: [(0, 3)],
    6: [(0, 1)], 9: [(0, 1)],
    7: [(2, 0)], 8: [(2, 0)],
}


def marching_squares(grid: np.ndarray, level: float) -> np.ndarray:
    """Segments of the iso-line ``level`` over grid (H, W) float values
    at integer pixel-center coordinates.  Returns (N, 4) float64.

    Fully vectorized: the four edge-crossing coordinate fields are
    computed once for every square, then each of the 16 cases gathers
    its segment endpoints with fancy indexing (saddles split by the
    center-average rule)."""
    g = grid.astype(np.float64)
    h, w = g.shape
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    bl = g[1:, :-1]
    br = g[1:, 1:]
    case = (
        (tl >= level).astype(np.int8) * 8
        + (tr >= level).astype(np.int8) * 4
        + (br >= level).astype(np.int8) * 2
        + (bl >= level).astype(np.int8)
    )
    ys, xs = np.nonzero((case > 0) & (case < 15))
    if len(ys) == 0:
        return np.empty((0, 4), dtype=np.float64)
    c = case[ys, xs]
    v_tl, v_tr, v_bl, v_br = tl[ys, xs], tr[ys, xs], bl[ys, xs], br[ys, xs]
    xf = xs.astype(np.float64)
    yf = ys.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # edge crossing (x, y) per square for: top, bottom, left, right
        ex = np.stack(
            [
                xf + (level - v_tl) / (v_tr - v_tl),
                xf + (level - v_bl) / (v_br - v_bl),
                xf,
                xf + 1.0,
            ]
        )
        ey = np.stack(
            [
                yf,
                yf + 1.0,
                yf + (level - v_tl) / (v_bl - v_tl),
                yf + (level - v_tr) / (v_br - v_tr),
            ]
        )
    segs = []
    idx_all = np.arange(len(c))
    for cv, pairs in _EDGE_PAIRS.items():
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        for ea, eb in pairs:
            segs.append(
                np.stack([ex[ea, m], ey[ea, m], ex[eb, m], ey[eb, m]], axis=1)
            )
    # saddles (5, 10): center-average disambiguation (reference rule)
    for cv in (5, 10):
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        center_hi = (v_tl[m] + v_tr[m] + v_bl[m] + v_br[m]) / 4.0 >= level
        first = (cv == 5) == center_hi  # (left,bottom)+(top,right) branch
        for sel, pairs in (
            (m[first], [(2, 1), (0, 3)]),
            (m[~first], [(2, 0), (1, 3)]),
        ):
            if len(sel) == 0:
                continue
            for ea, eb in pairs:
                segs.append(
                    np.stack(
                        [ex[ea, sel], ey[ea, sel], ex[eb, sel], ey[eb, sel]], axis=1
                    )
                )
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    return np.concatenate(segs, axis=0)


def marching_squares_desc(grid: np.ndarray, level: float):
    """Marching squares with DECOMPOSED endpoints, for cross-cell
    stitching: every crossing is (orientation, iy, ix, t) where
    orientation 0 = horizontal pixel edge (r, c)->(r, c+1) crossed at
    (x = c + t, y = r) and orientation 1 = vertical edge
    (r, c)->(r + 1, c) crossed at (x = c, y = r + t).

    The same physical edge shared by two squares (or, with integer
    offsets, two CELLS) yields the bitwise-identical (o, iy, ix, t)
    tuple, so fragments can be matched exactly across任 partition.
    NaN pixels mark missing data: squares touching one emit nothing.

    Returns (N, 8) float64 rows (o0, iy0, ix0, t0, o1, iy1, ix1, t1)
    — integer fields are exact in float64.
    """
    g = grid.astype(np.float64)
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    bl = g[1:, :-1]
    br = g[1:, 1:]
    finite = np.isfinite(tl) & np.isfinite(tr) & np.isfinite(bl) & np.isfinite(br)
    case = (
        (tl >= level).astype(np.int8) * 8
        + (tr >= level).astype(np.int8) * 4
        + (br >= level).astype(np.int8) * 2
        + (bl >= level).astype(np.int8)
    )
    ys, xs = np.nonzero(finite & (case > 0) & (case < 15))
    if len(ys) == 0:
        return np.empty((0, 8), dtype=np.float64)
    c = case[ys, xs]
    v_tl, v_tr, v_bl, v_br = tl[ys, xs], tr[ys, xs], bl[ys, xs], br[ys, xs]
    xf = xs.astype(np.float64)
    yf = ys.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        # per-square edge descriptors [edge 0=top 1=bottom 2=left 3=right]
        # -> (o, iy, ix, t); t always measured from the top/left pixel
        eo = np.stack([np.zeros_like(xf), np.zeros_like(xf),
                       np.ones_like(xf), np.ones_like(xf)])
        eiy = np.stack([yf, yf + 1.0, yf, yf])
        eix = np.stack([xf, xf, xf, xf + 1.0])
        et = np.stack(
            [
                (level - v_tl) / (v_tr - v_tl),
                (level - v_bl) / (v_br - v_bl),
                (level - v_tl) / (v_bl - v_tl),
                (level - v_tr) / (v_br - v_tr),
            ]
        )
    segs = []
    idx_all = np.arange(len(c))

    def emit(sel, ea, eb):
        segs.append(
            np.stack(
                [
                    eo[ea, sel], eiy[ea, sel], eix[ea, sel], et[ea, sel],
                    eo[eb, sel], eiy[eb, sel], eix[eb, sel], et[eb, sel],
                ],
                axis=1,
            )
        )

    for cv, pairs in _EDGE_PAIRS.items():
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        for ea, eb in pairs:
            emit(m, ea, eb)
    for cv in (5, 10):
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        center_hi = (v_tl[m] + v_tr[m] + v_bl[m] + v_br[m]) / 4.0 >= level
        first = (cv == 5) == center_hi
        for sel, pairs in ((m[first], [(2, 1), (0, 3)]), (m[~first], [(2, 0), (1, 3)])):
            if len(sel) == 0:
                continue
            for ea, eb in pairs:
                emit(sel, ea, eb)
    if not segs:
        return np.empty((0, 8), dtype=np.float64)
    return np.concatenate(segs, axis=0)


# Directed case table for POLYGON mode (gdal_contour -p,
# alg/marching_squares/polygon_ring_appender.h semantics): each
# segment is oriented so the {v >= level} region lies on the LEFT of
# the walk direction in y-DOWN pixel coordinates (left of direction
# (dx, dy) is (dy, -dx)).  Unordered pairs match _EDGE_PAIRS exactly;
# only the traversal order is added.
_EDGE_PAIRS_DIR = {
    1: [(1, 2)], 14: [(2, 1)],
    2: [(3, 1)], 13: [(1, 3)],
    3: [(3, 2)], 12: [(2, 3)],
    4: [(0, 3)], 11: [(3, 0)],
    6: [(0, 1)], 9: [(1, 0)],
    8: [(2, 0)], 7: [(0, 2)],
}

# Saddles keep the line-mode pairing convention ((2,1),(0,3) on the
# `first` branch) so polygon boundaries and polylines share topology;
# direction still follows high-on-left, which depends on WHICH corners
# are high, so cv=5 and cv=10 orient the same unordered pairs
# oppositely.
_SADDLE_DIR = {
    # (case, first_branch) -> directed pairs
    (5, True): [(1, 2), (0, 3)],   # high bl cut, high tr cut
    (10, True): [(2, 1), (3, 0)],  # low bl cut, low tr cut
    (5, False): [(0, 2), (1, 3)],  # low tl cut, low br cut
    (10, False): [(2, 0), (3, 1)],  # high tl cut, high br cut
}


def marching_squares_desc_dir(grid: np.ndarray, level: float):
    """DIRECTED variant of :func:`marching_squares_desc` for polygon
    mode: rows are (o0,iy0,ix0,t0, o1,iy1,ix1,t1) with the {v >= level}
    side on the left of the 0 -> 1 walk direction.  Endpoint
    descriptors are bitwise identical to the undirected variant."""
    g = grid.astype(np.float64)
    tl = g[:-1, :-1]
    tr = g[:-1, 1:]
    bl = g[1:, :-1]
    br = g[1:, 1:]
    finite = np.isfinite(tl) & np.isfinite(tr) & np.isfinite(bl) & np.isfinite(br)
    case = (
        (tl >= level).astype(np.int8) * 8
        + (tr >= level).astype(np.int8) * 4
        + (br >= level).astype(np.int8) * 2
        + (bl >= level).astype(np.int8)
    )
    ys, xs = np.nonzero(finite & (case > 0) & (case < 15))
    if len(ys) == 0:
        return np.empty((0, 8), dtype=np.float64)
    c = case[ys, xs]
    v_tl, v_tr, v_bl, v_br = tl[ys, xs], tr[ys, xs], bl[ys, xs], br[ys, xs]
    xf = xs.astype(np.float64)
    yf = ys.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        eo = np.stack([np.zeros_like(xf), np.zeros_like(xf),
                       np.ones_like(xf), np.ones_like(xf)])
        eiy = np.stack([yf, yf + 1.0, yf, yf])
        eix = np.stack([xf, xf, xf, xf + 1.0])
        et = np.stack(
            [
                (level - v_tl) / (v_tr - v_tl),
                (level - v_bl) / (v_br - v_bl),
                (level - v_tl) / (v_bl - v_tl),
                (level - v_tr) / (v_br - v_tr),
            ]
        )
    segs = []
    idx_all = np.arange(len(c))

    def emit(sel, ea, eb):
        segs.append(
            np.stack(
                [
                    eo[ea, sel], eiy[ea, sel], eix[ea, sel], et[ea, sel],
                    eo[eb, sel], eiy[eb, sel], eix[eb, sel], et[eb, sel],
                ],
                axis=1,
            )
        )

    for cv, pairs in _EDGE_PAIRS_DIR.items():
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        for ea, eb in pairs:
            emit(m, ea, eb)
    for cv in (5, 10):
        m = idx_all[c == cv]
        if len(m) == 0:
            continue
        center_hi = (v_tl[m] + v_tr[m] + v_bl[m] + v_br[m]) / 4.0 >= level
        first = (cv == 5) == center_hi
        for branch, sel in ((True, m[first]), (False, m[~first])):
            if len(sel) == 0:
                continue
            for ea, eb in _SADDLE_DIR[(cv, branch)]:
                emit(sel, ea, eb)
    if not segs:
        return np.empty((0, 8), dtype=np.float64)
    return np.concatenate(segs, axis=0)


def contour_levels(grid: np.ndarray, interval: float, base: float = 0.0):
    """Fixed-interval level list covering the grid's range (the
    -i/-off contour options)."""
    lo, hi = float(grid.min()), float(grid.max())
    first = np.ceil((lo - base) / interval)
    levels = base + np.arange(first, np.floor((hi - base) / interval) + 1) * interval
    return [float(l) for l in levels if lo < l < hi]
