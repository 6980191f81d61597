"""Per-grid raster algorithms: proximity, sieve, fill-nodata, grid
interpolation kernels (pure numpy; used by stages over rasterized
cells with an optional 1-ring halo).

Reference semantics:
- proximity: two-pass row-scan distance transform
  (alg/gdalproximity.cpp) — here an exact euclidean distance via a
  separable squared-distance transform (row scan + vectorized vertical
  combine; same output metric: distance in pixels to nearest target).
- sieve: remove connected components smaller than a threshold, merging
  them into their largest neighbor (alg/gdalsievefilter.cpp;
  4/8-connectivity).
- fillnodata: inverse-distance ring search + smoothing iterations
  (alg/rasterfill.cpp) — nearest-valid IDW within a max ring distance.
- grid interpolation: scattered points -> raster with invdist
  (alg/gdalgrid.cpp:109 GDALGridInverseDistanceToAPower), nearest
  (:853), moving average (:629).
"""

from __future__ import annotations

import numpy as np


# ------------------------------------------------------------ proximity


def proximity(target_mask: np.ndarray, max_dist: float | None = None) -> np.ndarray:
    """Euclidean distance (pixels) from every pixel to the nearest True
    pixel.  Pixels farther than max_dist are clamped to max_dist
    (gdalproximity MAXDIST semantics).

    Exact EDT, vectorized: pass 1 computes per-row distance to the
    nearest in-row target (two cumulative scans); pass 2 minimizes
    D2[r, c] + (r - y)^2 over rows with one vectorized (H, W) op per
    output row — same result as the per-line FH transform but ~3x
    faster in numpy (no per-element python)."""
    h, w = target_mask.shape
    INF = 1e18
    cols = np.arange(w, dtype=np.float64)
    # pass 1: nearest target index to the left / right within each row
    left = np.where(target_mask, cols[None, :], -INF)
    left = np.maximum.accumulate(left, axis=1)
    right = np.where(target_mask, cols[None, :], INF)
    right = np.minimum.accumulate(right[:, ::-1], axis=1)[:, ::-1]
    dx = np.minimum(cols[None, :] - left, right - cols[None, :])
    d2_row = np.where(np.isfinite(dx), dx * dx, INF)
    # pass 2: combine vertically
    rows2 = np.arange(h, dtype=np.float64) ** 2
    out2 = np.empty((h, w))
    for y in range(h):
        dy2 = rows2[np.abs(np.arange(h) - y)]
        out2[y] = (d2_row + dy2[:, None]).min(axis=0)
    d = np.sqrt(out2)
    if max_dist is not None:
        d = np.minimum(d, max_dist)
    return d


# ---------------------------------------------------------------- sieve


def _label4(g: np.ndarray):
    """4-connected labeling of equal-valued pixels (incl. value 0)."""
    h, w = g.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for r in range(h):
        c = 0
        while c < w:
            v = g[r, c]
            e = c
            while e < w and g[r, e] == v:
                e += 1
            lbl = 0
            if r > 0:
                above = labels[r - 1, c:e]
                vals = g[r - 1, c:e]
                for al in np.unique(above[vals == v]):
                    if al > 0:
                        if lbl == 0:
                            lbl = int(al)
                        else:
                            union(lbl, int(al))
            if lbl == 0:
                lbl = nxt
                parent.append(lbl)
                nxt += 1
            labels[r, c:e] = lbl
            c = e
    remap = np.zeros(nxt, dtype=np.int32)
    nn = 0
    for l in range(1, nxt):
        rt = find(l)
        if remap[rt] == 0:
            nn += 1
            remap[rt] = nn
        remap[l] = remap[rt]
    return remap[labels], nn


def sieve(g: np.ndarray, threshold: int) -> np.ndarray:
    """Remove components with < threshold pixels by merging into the
    neighboring component with the largest pixel count
    (gdalsievefilter semantics, 4-connectivity).  Iterates until no
    undersized component remains."""
    out = g.copy()
    while True:
        labels, n = _label4(out)
        sizes = np.bincount(labels.reshape(-1), minlength=n + 1)
        small = [l for l in range(1, n + 1) if sizes[l] < threshold]
        if not small:
            return out
        changed = False
        small_set = set(small)
        for l in small:
            mask = labels == l
            # find neighboring labels (4-neighborhood of the component)
            nb: dict[int, int] = {}
            ys, xs = np.nonzero(mask)
            for y, x in zip(ys, xs):
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < out.shape[0] and 0 <= xx < out.shape[1]:
                        ll = labels[yy, xx]
                        if ll != l:
                            nb[ll] = sizes[ll]
            if not nb:
                continue
            big = max(nb.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            vy, vx = np.nonzero(labels == big)
            out[mask] = out[vy[0], vx[0]]
            changed = True
        if not changed:
            return out


# ------------------------------------------------------------ fillnodata


def fillnodata(g: np.ndarray, valid: np.ndarray, max_search: int = 100,
               smoothing_iterations: int = 0) -> np.ndarray:
    """Fill invalid pixels with inverse-distance weighting of the
    nearest valid pixels along 4 axes within max_search pixels
    (rasterfill.cpp ring-search approximation), then optional 3x3
    smoothing passes over filled pixels only."""
    out = g.astype(np.float64).copy()
    h, w = g.shape
    need = ~valid
    if not need.any():
        return g.copy()
    acc = np.zeros((h, w))
    wsum = np.zeros((h, w))
    for axis, direction in ((1, 1), (1, -1), (0, 1), (0, -1)):
        dist = np.full((h, w), np.inf)
        val = np.zeros((h, w))
        rng = range(w) if axis == 1 else range(h)
        it = rng if direction == 1 else reversed(rng)
        prev_d = None
        for i in it:
            sl = (slice(None), i) if axis == 1 else (i, slice(None))
            if prev_d is None:
                d = np.where(valid[sl], 0.0, np.inf)
                v = np.where(valid[sl], out[sl], 0.0)
            else:
                d = np.where(valid[sl], 0.0, prev_d + 1)
                v = np.where(valid[sl], out[sl], prev_v)
            dist[sl] = d
            val[sl] = v
            prev_d, prev_v = d, v
        ok = need & np.isfinite(dist) & (dist <= max_search) & (dist > 0)
        acc[ok] += val[ok] / dist[ok]
        wsum[ok] += 1.0 / dist[ok]
    fill = wsum > 0
    out[fill & need] = acc[fill & need] / wsum[fill & need]
    for _ in range(smoothing_iterations):
        p = np.pad(out, 1, mode="edge")
        sm = (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
            + p[1:-1, 1:-1]
        ) / 5.0
        out[need] = sm[need]
    if np.issubdtype(g.dtype, np.integer):
        return np.clip(np.floor(out + 0.5), 0, 255).astype(g.dtype)
    return out


# -------------------------------------------------- grid interpolation


def grid_metric(px, py, pv, xs, ys, metric: str = "count", radius: float = 0.0,
                nodata: float = 0.0) -> np.ndarray:
    """Data-metrics gridding (gdalgrid.cpp GDALGridDataMetric* family):
    per node, count / minimum / maximum / range of point VALUES within
    the circular search radius."""
    gx, gy = np.meshgrid(xs, ys)
    d2 = (gx[:, :, None] - px[None, None, :]) ** 2 + (
        gy[:, :, None] - py[None, None, :]
    ) ** 2
    inside = d2 <= radius * radius
    cnt = inside.sum(axis=2)
    if metric == "count":
        return cnt.astype(np.float64)
    vals = np.where(inside, pv[None, None, :], np.nan)
    out = np.full(gx.shape, nodata, dtype=np.float64)
    got = cnt > 0
    with np.errstate(all="ignore"):
        if metric == "minimum":
            out[got] = np.nanmin(vals, axis=2)[got]
        elif metric == "maximum":
            out[got] = np.nanmax(vals, axis=2)[got]
        elif metric == "range":
            out[got] = (np.nanmax(vals, axis=2) - np.nanmin(vals, axis=2))[got]
        else:
            raise ValueError(f"unknown metric {metric}")
    return out


def grid_invdist(px, py, pv, xs, ys, power: float = 2.0, smoothing: float = 0.0,
                 radius: float | None = None, nodata: float = 0.0) -> np.ndarray:
    """Inverse-distance-to-a-power over scattered points, evaluated on
    the grid xs (W,) x ys (H,) (gdalgrid.cpp:109 semantics: exact hit
    -> point value; optional circular search radius)."""
    H, W = len(ys), len(xs)
    out = np.full((H, W), nodata, dtype=np.float64)
    gx, gy = np.meshgrid(xs, ys)
    d2 = (
        (gx[:, :, None] - px[None, None, :]) ** 2
        + (gy[:, :, None] - py[None, None, :]) ** 2
        + smoothing * smoothing
    )
    if radius is not None:
        d2 = np.where(d2 <= radius * radius, d2, np.inf)
    exact = d2 <= 1e-20
    wts = 1.0 / np.maximum(d2, 1e-20) ** (power / 2.0)
    wts[np.isinf(d2)] = 0.0
    wsum = wts.sum(axis=2)
    vsum = (wts * pv[None, None, :]).sum(axis=2)
    got = wsum > 0
    out[got] = vsum[got] / wsum[got]
    hit = exact.any(axis=2)
    if hit.any():
        first = exact.argmax(axis=2)
        out[hit] = pv[first[hit]]
    return out


def grid_invdistnn(px, py, pv, xs, ys, power: float = 2.0,
                   smoothing: float = 0.0, radius: float = 1.0,
                   max_points: int = 12, min_points: int = 0,
                   nodata: float = 0.0) -> np.ndarray:
    """Inverse distance to a power restricted to the max_points nearest
    neighbours inside a mandatory search radius
    (alg/gdalgrid.cpp GDALGridInverseDistanceToAPowerNearestNeighbor,
    gdal_grid -a invdistnn / apps/gdalalg_vector_grid_invdistnn.cpp).

    Reference contract preserved:
    - the radius test uses the RAW distance, the weights and the
      nearest-n ranking use the SMOOTHED distance r2 + smoothing^2;
    - an exact hit is "smoothed r2 < 1e-13 -> point value" and is NOT
      gated by the radius;
    - candidates are ranked by smoothed distance ascending (ties by
      the canonical point order the caller established) and only the
      first max_points carry weight 1/r2^(power/2);
    - fewer than min_points in-radius neighbours -> nodata.

    Float-summation order is the vectorized-numpy contract shared with
    the golden (np.sum over the masked weight cube), not the
    reference's ascending-order scalar accumulation — same values to
    the last ulp only, as for the other grid kernels."""
    H, W = len(ys), len(xs)
    n_pts = len(px)
    out = np.full((H, W), nodata, dtype=np.float64)
    if n_pts == 0:
        return out
    gx, gy = np.meshgrid(xs, ys)
    d2raw = (gx[:, :, None] - px[None, None, :]) ** 2 + (
        gy[:, :, None] - py[None, None, :]
    ) ** 2
    d2 = d2raw + smoothing * smoothing
    within = d2raw <= radius * radius
    # rank candidates by smoothed distance; out-of-radius -> +inf so
    # they rank last.  stable argsort keeps the canonical point order
    # for equal distances (the reference's multimap insertion order).
    key = np.where(within, d2, np.inf)
    order = np.argsort(key, axis=2, kind="stable")
    ranks = np.empty_like(order)
    np.put_along_axis(
        ranks, order, np.broadcast_to(np.arange(n_pts), key.shape), axis=2
    )
    keep = within & (ranks < max_points)
    wts = np.where(keep, 1.0 / np.maximum(d2, 1e-20) ** (power / 2.0), 0.0)
    nsel = keep.sum(axis=2)
    wsum = wts.sum(axis=2)
    vsum = (wts * pv[None, None, :]).sum(axis=2)
    got = (nsel >= max(int(min_points), 1)) & (wsum > 0)
    out[got] = vsum[got] / wsum[got]
    exact = d2 < 1e-13
    hit = exact.any(axis=2)
    if hit.any():
        first = exact.argmax(axis=2)
        out[hit] = pv[first[hit]]
    return out


def grid_nearest(px, py, pv, xs, ys, radius: float | None = None,
                 nodata: float = 0.0) -> np.ndarray:
    """Nearest-neighbor gridding (gdalgrid.cpp:853); ties by point order."""
    gx, gy = np.meshgrid(xs, ys)
    d2 = (gx[:, :, None] - px[None, None, :]) ** 2 + (
        gy[:, :, None] - py[None, None, :]
    ) ** 2
    idx = d2.argmin(axis=2)
    best = np.take_along_axis(d2, idx[:, :, None], 2)[:, :, 0]
    out = pv[idx].astype(np.float64)
    if radius is not None:
        out[best > radius * radius] = nodata
    return out


def grid_average(px, py, pv, xs, ys, radius: float, min_points: int = 1,
                 nodata: float = 0.0) -> np.ndarray:
    """Moving-average gridding within a circular radius (gdalgrid.cpp:629)."""
    gx, gy = np.meshgrid(xs, ys)
    d2 = (gx[:, :, None] - px[None, None, :]) ** 2 + (
        gy[:, :, None] - py[None, None, :]
    ) ** 2
    inside = d2 <= radius * radius
    cnt = inside.sum(axis=2)
    s = (inside * pv[None, None, :]).sum(axis=2)
    out = np.full(gx.shape, nodata, dtype=np.float64)
    ok = cnt >= min_points
    out[ok] = s[ok] / cnt[ok]
    return out
