"""Viewshed — per-chip DEM visibility from an observer.

Default algorithm is the Wang et al. reference-plane sweep that the
reference implements (alg/viewshed/viewshed.cpp, cumulative.cpp:72-88):
pixels are processed in Chebyshev rings outward from the observer; the
line of sight to a pixel crosses the previous ring between two already-
computed pixels, whose auxiliary max-slope values are linearly
interpolated.  A pixel is visible when its own slope reaches the
interpolated maximum; the auxiliary grid propagates
``aux = max(slope, interp)``.  Fully vectorized per ring.

The radial-sampling approximation from round 1 is kept as
``algorithm="radial"`` for comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def viewshed_mask_wang(elev: np.ndarray, obs_height: float = 2.0,
                       obs: tuple[int, int] | None = None) -> np.ndarray:
    """(h, w) elevation -> bool visibility mask from the observer pixel
    (Wang et al. sweep; slope = (z - oz) / chebyshev-line distance).
    ``obs`` = (row, col); default = the center pixel."""
    h, w = elev.shape
    oy, ox = ((h - 1) // 2, (w - 1) // 2) if obs is None else obs
    oz = float(elev[oy, ox]) + obs_height
    yy, xx = np.mgrid[0:h, 0:w]
    dy = yy - oy
    dx = xx - ox
    dist = np.hypot(dx, dy)
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = np.where(dist > 0, (elev.astype(np.float64) - oz) / dist, -np.inf)
    aux = np.full((h, w), -np.inf)
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True
    aux[oy, ox] = -np.inf
    ring = np.maximum(np.abs(dx), np.abs(dy))
    rmax = int(ring.max())
    for r in range(1, rmax + 1):
        ys, xs = np.nonzero(ring == r)
        rdx = xs - ox
        rdy = ys - oy
        adx = np.abs(rdx)
        ady = np.abs(rdy)
        col_dom = adx >= ady
        # crossing of the previous ring along the LOS
        sx = np.sign(rdx)
        sy = np.sign(rdy)
        # column-dominant: previous column x - sx, fractional row
        px = np.where(col_dom, xs - sx, 0)
        fy = np.where(col_dom, oy + (px - ox) * rdy / np.where(adx == 0, 1, rdx), 0.0)
        # row-dominant: previous row y - sy, fractional col
        py = np.where(~col_dom, ys - sy, 0)
        fx = np.where(~col_dom, ox + (py - oy) * rdx / np.where(ady == 0, 1, rdy), 0.0)
        # gather the two bracketing cells + interpolation weight
        n0y = np.where(col_dom, np.floor(fy).astype(np.int64), py).astype(np.int64)
        n0x = np.where(col_dom, px, np.floor(fx).astype(np.int64)).astype(np.int64)
        frac = np.where(col_dom, fy - np.floor(fy), fx - np.floor(fx))
        n1y = np.where(col_dom, np.minimum(n0y + 1, h - 1), n0y)
        n1x = np.where(col_dom, n0x, np.minimum(n0x + 1, w - 1))
        n0y = np.clip(n0y, 0, h - 1)
        n0x = np.clip(n0x, 0, w - 1)
        a0 = aux[n0y, n0x]
        a1 = aux[n1y, n1x]
        interp = a0 * (1.0 - frac) + a1 * frac
        # exact-on-cell crossings (frac==0) read only a0; -inf * 0 would
        # poison the lerp, so guard
        interp = np.where(frac == 0.0, a0, interp)
        interp = np.where(np.isneginf(a0) & np.isneginf(a1), -np.inf, interp)
        s = slope[ys, xs]
        vis[ys, xs] = s >= interp
        aux[ys, xs] = np.maximum(s, interp)
    return vis


def viewshed_mask_radial(elev: np.ndarray, obs_height: float = 2.0) -> np.ndarray:
    """Radial-sampling approximation (round-1 method, kept for
    comparison): rays to every boundary pixel, nearest-neighbor
    sampling, running-max slope."""
    h, w = elev.shape
    oy, ox = (h - 1) / 2.0, (w - 1) / 2.0
    oz = float(elev[int(round(oy)), int(round(ox))]) + obs_height
    tx = np.concatenate(
        [np.arange(w), np.full(h, w - 1), np.arange(w)[::-1], np.zeros(h)]
    )
    ty = np.concatenate(
        [np.zeros(w), np.arange(h), np.full(w, h - 1), np.arange(h)[::-1]]
    )
    steps = max(h, w) * 2
    t = np.linspace(0.0, 1.0, steps)[None, :]
    rx = ox + (tx[:, None] - ox) * t
    ry = oy + (ty[:, None] - oy) * t
    ix = np.clip(np.round(rx).astype(np.int64), 0, w - 1)
    iy = np.clip(np.round(ry).astype(np.int64), 0, h - 1)
    dist = np.hypot(rx - ox, ry - oy)
    dist[:, 0] = 1e-9
    z = elev[iy, ix].astype(np.float64)
    slope = (z - oz) / dist
    runmax = np.maximum.accumulate(slope, axis=1)
    vis = slope >= runmax - 1e-12
    mask = np.zeros((h, w), dtype=bool)
    mask[iy[vis], ix[vis]] = True
    mask[int(round(oy)), int(round(ox))] = True
    return mask


def cumulative_viewshed_counts(elev: np.ndarray, obs_height: float = 2.0,
                               spacing: int = 32):
    """Cumulative (multi-observer) viewshed — the observer-grid
    accumulation mode of the reference (alg/viewshed/cumulative.cpp:
    66-68 queues observers every ``observerSpacing`` pixels starting
    at 0 in BOTH axes; each runs a normal-mode viewshed with
    visibleVal=1 and the rasters sum).  Returns (counts int32 raster,
    n_observers); integer-exact, accumulation-order independent."""
    h, w = elev.shape
    counts = np.zeros((h, w), np.int32)
    n_obs = 0
    for x in range(0, w, spacing):
        for y in range(0, h, spacing):
            counts += viewshed_mask_wang(elev, obs_height, obs=(y, x))
            n_obs += 1
    return counts, n_obs


def line_of_sight(elev: np.ndarray, xA: int, yA: int, zA: float,
                  xB: int, yB: int, zB: float):
    """Point-to-point line of sight over a DEM — the
    GDALIsLineOfSightVisible contract (alg/los.cpp:177): both
    endpoints must be strictly above terrain; the path walks the
    published Bresenham cell traversal (alg/los.cpp:37-108, the
    balance-increment variant restated here expression-for-
    expression — the visited cell SET is part of the contract) and
    each cell tests ``z > terrain`` with z linearly interpolated along
    the ray: by the axis ratio for purely vertical/horizontal lines,
    by the sqrt distance ratio otherwise (alg/los.cpp:330-346).

    Returns (visible, ix, iy) — (True, -1, -1) when clear, else the
    first blocking cell."""
    h, w = elev.shape

    def above(x, y, z):
        return z > float(elev[y, x])

    if not above(xA, yA, zA):
        return False, xA, yA
    if not above(xB, yB, zB):
        return False, xB, yB
    if xA == xB and yA == yB:
        return True, -1, -1
    if xA == xB:  # vertical: lerp by y ratio
        step = 1 if yB > yA else -1
        for y in range(yA, yB + step, step):
            z = zA + (y - yA) / (yB - yA) * (zB - zA)
            if not above(xA, y, z):
                return False, xA, y
        return True, -1, -1
    if yA == yB:  # horizontal: lerp by x ratio
        step = 1 if xB > xA else -1
        for x in range(xA, xB + step, step):
            z = zA + (x - xA) / (xB - xA) * (zB - zA)
            if not above(x, yA, z):
                return False, x, yA
        return True, -1, -1
    r_denom = float(xB - xA) ** 2 + float(yB - yA) ** 2

    def z_of(x, y):
        r_num = float(x - xA) ** 2 + float(y - yA) ** 2
        ratio = np.sqrt(r_num / r_denom)
        return zA + ratio * (zB - zA)

    dx, incx = (xB - xA, 1) if xB >= xA else (xA - xB, -1)
    dy, incy = (yB - yA, 1) if yB >= yA else (yA - yB, -1)
    x, y = xA, yA
    if dx >= dy:
        dy2 = dy << 1
        balance = dy2 - dx
        dx2 = dx * 2
        while x != xB:
            if not above(x, y, z_of(x, y)):
                return False, x, y
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
    else:
        dx2 = dx * 2
        balance = dx2 - dy
        dy2 = dy * 2
        while y != yB:
            if not above(x, y, z_of(x, y)):
                return False, x, y
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
    if not above(xB, yB, z_of(xB, yB)):
        return False, xB, yB
    return True, -1, -1


def los_ray_suite(elev: np.ndarray, obs_height: float = 2.0):
    """Deterministic LOS ray fan per chip: from the center (terrain +
    obs_height, and terrain + 8*obs_height for the high variant) to
    the 8 border compass targets at terrain + obs_height -> 16 rays;
    returns the visible-ray count."""
    h, w = elev.shape
    cy, cx = (h - 1) // 2, (w - 1) // 2
    targets = [
        (0, 0), (0, cx), (0, w - 1), (cy, w - 1),
        (h - 1, w - 1), (h - 1, cx), (h - 1, 0), (cy, 0),
    ]
    n_vis = 0
    for zmul in (1.0, 8.0):
        zA = float(elev[cy, cx]) + obs_height * zmul
        for ty, tx in targets:
            zB = float(elev[ty, tx]) + obs_height
            ok, _, _ = line_of_sight(elev, cx, cy, zA, tx, ty, zB)
            n_vis += int(ok)
    return n_vis, 16


# back-compat alias (round-1 name)
viewshed_mask = viewshed_mask_radial

_ALGOS = {"wang": viewshed_mask_wang, "radial": viewshed_mask_radial}


def viewshed_stage(
    images, obs_height: float = 2.0, concurrency: int = 4, algorithm: str = "wang"
):
    """map_batches stage: per-chip viewshed from the center; output
    rows (image_id, n_visible, frac_visible, mask_bytes packbits)."""
    algo = _ALGOS[algorithm]

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        n_vis, frac, masks = [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            m = algo(img[:, :, 0].astype(np.float64), obs_height)
            n_vis.append(int(m.sum()))
            frac.append(float(m.mean()))
            masks.append(np.packbits(m).tobytes())
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "n_visible": pa.array(n_vis, pa.int64()),
                "frac_visible": pa.array(np.round(frac, 6), pa.float64()),
                "mask_bytes": pa.array(masks, pa.binary()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)


def cumulative_viewshed_stage(images, obs_height: float = 2.0,
                              spacing: int = 32):
    """map_batches stage: per-chip CUMULATIVE viewshed (observer grid
    every ``spacing`` px, alg/viewshed/cumulative.cpp); output rows
    (image_id, n_obs, sum_counts = Σ per-pixel visibility count,
    frac_visible = sum_counts/(npx·n_obs) rounded to 1e-6)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist()
                for c in ("image_id", "bytes", "w", "h", "fmt")}
        n_ob, sums, frac = [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i],
                                cols["h"][i], cols["fmt"][i])
            counts, n_obs = cumulative_viewshed_counts(
                img[:, :, 0].astype(np.float64), obs_height, spacing)
            s = int(counts.sum())
            n_ob.append(n_obs)
            sums.append(s)
            frac.append(float(np.round(
                s / float(counts.size * n_obs), 6)))
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "n_obs": pa.array(n_ob, pa.int64()),
                "n_visible": pa.array(sums, pa.int64()),
                "frac_visible": pa.array(frac, pa.float64()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)
