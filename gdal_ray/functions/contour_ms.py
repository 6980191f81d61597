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


def marching_squares(grid: np.ndarray, level: float) -> np.ndarray:
    """Segments of the iso-line ``level`` over grid (H, W) float values
    at integer pixel-center coordinates.  Returns (N, 4) float64."""
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
    segs = []
    for y, x in zip(ys, xs):
        c = case[y, x]
        v_tl, v_tr, v_bl, v_br = g[y, x], g[y, x + 1], g[y + 1, x], g[y + 1, x + 1]
        # edge crossing points (in x,y pixel coords; y increases downward)
        top = (_interp(x, x + 1, v_tl, v_tr, level), float(y)) if (v_tl >= level) != (v_tr >= level) else None
        bottom = (_interp(x, x + 1, v_bl, v_br, level), float(y + 1)) if (v_bl >= level) != (v_br >= level) else None
        left = (float(x), _interp(y, y + 1, v_tl, v_bl, level)) if (v_tl >= level) != (v_bl >= level) else None
        right = (float(x + 1), _interp(y, y + 1, v_tr, v_br, level)) if (v_tr >= level) != (v_br >= level) else None
        if c in (1, 14):
            pairs = [(left, bottom)]
        elif c in (2, 13):
            pairs = [(bottom, right)]
        elif c in (3, 12):
            pairs = [(left, right)]
        elif c in (4, 11):
            pairs = [(top, right)]
        elif c in (6, 9):
            pairs = [(top, bottom)]
        elif c in (7, 8):
            pairs = [(left, top)]
        elif c in (5, 10):
            # saddle: disambiguate with the center average (reference rule)
            center_hi = (v_tl + v_tr + v_bl + v_br) / 4.0 >= level
            if (c == 5) == center_hi:
                pairs = [(left, bottom), (top, right)]
            else:
                pairs = [(left, top), (bottom, right)]
        else:
            pairs = []
        for a, b in pairs:
            if a is not None and b is not None:
                segs.append((a[0], a[1], b[0], b[1]))
    if not segs:
        return np.empty((0, 4), dtype=np.float64)
    return np.asarray(segs, dtype=np.float64)


def contour_levels(grid: np.ndarray, interval: float, base: float = 0.0):
    """Fixed-interval level list covering the grid's range (the
    -i/-off contour options)."""
    lo, hi = float(grid.min()), float(grid.max())
    first = np.ceil((lo - base) / interval)
    levels = base + np.arange(first, np.floor((hi - base) / interval) + 1) * interval
    return [float(l) for l in levels if lo < l < hi]
