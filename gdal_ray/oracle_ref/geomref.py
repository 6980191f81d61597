"""Reference implementations for rasterize/polygonize/proximity/sieve
(q33, q36) — single-process, separately coded from the engine stages.

The scanline parity-fill crossing math (llrasterize.cpp semantics) is
restated expression-for-expression: bitwise parity of the burned grids
is the contract.  Connected components use BFS flood fill (vs the
engine's run-based two-pass labeling + distributed seam merge);
proximity uses the Felzenszwalb-Huttenlocher 1-D parabola EDT (vs the
engine's row-scan + column-min formulation) — different algorithms,
identical exact results.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd

ORIGIN_SHIFT = 20037508.342789244
INITIAL_RES = 156543.03392804097
GRID = 256


def _tile_of(m, zoom: int):
    px = (np.asarray(m, np.float64) + ORIGIN_SHIFT) / (INITIAL_RES / (1 << zoom))
    return np.maximum(np.ceil(px / 256.0) - 1, 0).astype(np.int64)


def _fill_parity_ref(rings, x0, y0, res, grid, value):
    ys = y0 - (np.arange(GRID) + 0.5) * res
    a = np.vstack([r[:-1] for r in rings])
    b = np.vstack([r[1:] for r in rings])
    y1, y2 = a[:, 1], b[:, 1]
    x1, x2 = a[:, 0], b[:, 0]
    for row in range(GRID):
        y = ys[row]
        cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
        if not cond.any():
            continue
        t = (y - y1[cond]) / (y2[cond] - y1[cond])
        xs = x1[cond] + t * (x2[cond] - x1[cond])
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            c0 = max(int(np.ceil((xs[i] - x0) / res - 0.5)), 0)
            c1 = min(int(np.ceil((xs[i + 1] - x0) / res - 0.5)), GRID)
            if c1 > c0:
                grid[row, c0:c1] = value


def ref_rasterize(sf_dir: str, zoom: int, value_fn=None):
    """Burn the fixture polygon layer at ``zoom``.  Returns
    {(tx, ty): grid uint8} for non-empty cells.  value_fn(fid) -> burn
    value (default 1).  Burn order: ascending fid per cell."""
    import pyarrow.parquet as pq

    from ..synth.make_table import ensure_fixtures, polygon_rings_of, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    t = pq.read_table(paths["polygons"], columns=["fid", "minx", "miny", "maxx", "maxy"])
    fids = t.column("fid").to_numpy(zero_copy_only=False)
    env = {
        c: t.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")
    }
    n1 = (1 << zoom) - 1
    by_cell: dict[tuple[int, int], list[int]] = {}
    for k in range(len(fids)):
        tx0 = int(_tile_of(env["minx"][k], zoom))
        ty0 = int(_tile_of(env["miny"][k], zoom))
        tx1 = min(int(_tile_of(env["maxx"][k], zoom)), n1)
        ty1 = min(int(_tile_of(env["maxy"][k], zoom)), n1)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                by_cell.setdefault((tx, ty), []).append(int(fids[k]))
    res = INITIAL_RES / (1 << zoom)
    out = {}
    for (tx, ty), cell_fids in by_cell.items():
        minx = tx * 256 * res - ORIGIN_SHIFT
        maxy = (ty + 1) * 256 * res - ORIGIN_SHIFT
        grid = np.zeros((GRID, GRID), dtype=np.uint16)
        for fid in sorted(cell_fids):
            rings = polygon_rings_of(fid)
            v = value_fn(fid) if value_fn else 1
            _fill_parity_ref(rings, minx, maxy, res, grid, v)
        g8 = np.minimum(grid, 255).astype(np.uint8)
        if (g8 > 0).any():
            out[(tx, ty)] = g8
    return out


# ------------------------------------------------------- q33 polygonize


def _row_spread(labr: np.ndarray, gr: np.ndarray) -> np.ndarray:
    """Spread the min label across each run of equal values in a row."""
    change = np.flatnonzero(np.diff(gr.astype(np.int64))) + 1
    starts = np.r_[0, change]
    mins = np.minimum.reduceat(labr, starts)
    reps = np.diff(np.r_[starts, len(gr)])
    return np.repeat(mins, reps)


def _cc_relax(g: np.ndarray, max_sweeps: int = 200) -> np.ndarray:
    """4-connected equal-value components by min-label relaxation
    (forward+backward raster sweeps with per-run segment minima).
    Label of a component = flat index of its first pixel in row-major
    scan order (the canonical pixel)."""
    h, w = g.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)
    for _ in range(max_sweeps):
        before = lab.copy()
        for rows in (range(h), range(h - 1, -1, -1)):
            prev = None
            for y in rows:
                r = lab[y]
                if prev is not None:
                    eq = g[y] == g[prev]
                    r = np.minimum(r, np.where(eq, lab[prev], r))
                lab[y] = _row_spread(r, g[y])
                prev = y
        if np.array_equal(lab, before):
            return lab
    from collections import deque as _dq  # pragma: no cover - fallback

    raise RuntimeError("relaxation did not converge")  # pragma: no cover


def q33_rasterize_polygonize(sf_dir: str, zoom: int = 10) -> pd.DataFrame:
    cells = ref_rasterize(sf_dir, zoom, value_fn=lambda fid: fid % 254 + 1)
    return _polygonize_cells_ref(cells, zoom)


def q56_footprint(sf_dir: str, zoom: int = 8) -> pd.DataFrame:
    """Footprint = polygonize of the mosaic's valid-data mask
    (apps/gdal_footprint_lib.cpp:1281 semantics)."""
    from .tileref import _ref_base_tiles

    tiles = _ref_base_tiles(sf_dir, zoom)
    cells = {k: m.astype(np.uint8) for k, (_, m) in tiles.items()}
    return _polygonize_cells_ref(cells, zoom)


def _polygonize_cells_ref(cells: dict, zoom: int) -> pd.DataFrame:
    res = INITIAL_RES / (1 << zoom)
    nt = 1 << zoom
    world = nt * GRID
    # local components per cell, keyed by canonical pixel
    members = {}  # canon -> dict(value, count, env, cell)
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    local_label = {}  # (tx, ty) -> label grid of canon ids
    for (tx, ty), g in cells.items():
        rl = _cc_relax(g)
        lab = np.full(g.shape, -1, dtype=np.int64)
        bminx = tx * 256 * res - ORIGIN_SHIFT
        bmaxy = (ty + 1) * 256 * res - ORIGIN_SHIFT
        nz = g > 0
        for l in np.unique(rl[nz]):
            mask = nz & (rl == l)
            ys, xs = np.nonzero(mask)
            y0, x0 = int(l) // GRID, int(l) % GRID  # first scan pixel
            gr = (nt - 1 - ty) * GRID + y0
            gc = tx * GRID + x0
            canon = gr * world + gc
            lab[mask] = canon
            parent[canon] = canon
            members[canon] = dict(
                value=int(g[y0, x0]),
                count=len(ys),
                minx=bminx + xs.min() * res,
                maxx=bminx + (xs.max() + 1) * res,
                maxy=bmaxy - ys.min() * res,
                miny=bmaxy - (ys.max() + 1) * res,
            )
        local_label[(tx, ty)] = lab
    # merge across shared borders (equal value, adjacent pixels)
    for (tx, ty), g in cells.items():
        lab = local_label[(tx, ty)]
        if (tx + 1, ty) in cells:  # east neighbor: col 255 <-> col 0
            gb = cells[(tx + 1, ty)]
            lb = local_label[(tx + 1, ty)]
            m = (g[:, GRID - 1] > 0) & (g[:, GRID - 1] == gb[:, 0])
            for r in np.flatnonzero(m):
                union(int(lab[r, GRID - 1]), int(lb[r, 0]))
        if (tx, ty + 1) in cells:  # north neighbor (TMS y+1): row 0 <-> row 255
            gb = cells[(tx, ty + 1)]
            lb = local_label[(tx, ty + 1)]
            m = (g[0, :] > 0) & (g[0, :] == gb[GRID - 1, :])
            for c in np.flatnonzero(m):
                union(int(lab[0, c]), int(lb[GRID - 1, c]))
    agg = {}
    for canon, rec in members.items():
        root = find(canon)
        a = agg.setdefault(
            root,
            dict(value=rec["value"], pixel_count=0, n_cells=0,
                 minx=np.inf, miny=np.inf, maxx=-np.inf, maxy=-np.inf),
        )
        a["pixel_count"] += rec["count"]
        a["n_cells"] += 1
        a["minx"] = min(a["minx"], rec["minx"])
        a["miny"] = min(a["miny"], rec["miny"])
        a["maxx"] = max(a["maxx"], rec["maxx"])
        a["maxy"] = max(a["maxy"], rec["maxy"])
    rows = [
        (root, a["value"], a["pixel_count"], a["minx"], a["miny"], a["maxx"],
         a["maxy"], a["n_cells"])
        for root, a in agg.items()
    ]
    df = pd.DataFrame(
        rows,
        columns=["comp_id", "value", "pixel_count", "minx", "miny", "maxx", "maxy", "n_cells"],
    )
    for c in ("comp_id", "value", "pixel_count", "n_cells"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("comp_id").reset_index(drop=True)


# -------------------------------------------------- q36 proximity/sieve


def _edt_1d(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1-D squared EDT of sampled function f."""
    n = len(f)
    d = np.empty(n)
    v = np.zeros(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = 0
    z[0], z[1] = -np.inf, np.inf
    for q in range(1, n):
        if not np.isfinite(f[q]) and not np.isfinite(f[v[k]]):
            continue
        s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        while s <= z[k]:
            k -= 1
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
        k += 1
        v[k] = q
        z[k] = s
        z[k + 1] = np.inf
    k = 0
    for q in range(n):
        while z[k + 1] < q:
            k += 1
        d[q] = (q - v[k]) ** 2 + f[v[k]]
    return d


def _proximity_ref(target: np.ndarray, max_dist: float) -> np.ndarray:
    h, w = target.shape
    INF = 1e18
    f = np.where(target, 0.0, INF)
    tmp = np.empty_like(f)
    for x in range(w):
        tmp[:, x] = _edt_1d(f[:, x])
    out2 = np.empty_like(f)
    for y in range(h):
        out2[y, :] = _edt_1d(tmp[y, :])
    d = np.sqrt(np.minimum(out2, INF))
    return np.minimum(d, max_dist)


def _label4_ref(g: np.ndarray):
    """Labeling of ALL equal-valued 4-connected components (including
    value 0), labels 1..n in scan order (relaxation labels are the
    component's first-pixel flat index, so rank order == scan order)."""
    rl = _cc_relax(g)
    uniq, inv = np.unique(rl, return_inverse=True)
    labels = (inv + 1).astype(np.int32).reshape(g.shape)
    return labels, len(uniq)


def _sieve_ref(g: np.ndarray, threshold: int) -> np.ndarray:
    """gdalsievefilter semantics restated: repeatedly merge every
    undersized component into its largest neighbor (ties -> lowest
    scan-order label), labels/sizes snapshotted per sweep, merged value
    read from the neighbor's first pixel at merge time."""
    out = g.copy()
    w = out.shape[1]
    while True:
        rl = _cc_relax(out)
        uniq, inv = np.unique(rl, return_inverse=True)
        labels = (inv + 1).astype(np.int64).reshape(out.shape)
        n = len(uniq)
        sizes = np.bincount(labels.reshape(-1), minlength=n + 1)
        small = (np.flatnonzero(sizes[1:] < threshold) + 1).tolist()
        if not small:
            return out
        # adjacency label pairs, vectorized over the 4-neighborhood
        nbmap: dict[int, set] = {}
        for a, b in (
            (labels[:-1, :].ravel(), labels[1:, :].ravel()),
            (labels[:, :-1].ravel(), labels[:, 1:].ravel()),
        ):
            diff = a != b
            ps = np.unique(np.stack([a[diff], b[diff]], axis=1), axis=0)
            for x, y in ps:
                nbmap.setdefault(int(x), set()).add(int(y))
                nbmap.setdefault(int(y), set()).add(int(x))
        changed = False
        for l in small:
            nb = nbmap.get(int(l))
            if not nb:
                continue
            big = max(nb, key=lambda ll: (sizes[ll], -ll))
            fy, fx = divmod(int(uniq[big - 1]), w)
            out[labels == l] = out[fy, fx]
            changed = True
        if not changed:
            return out


def q36_proximity_sieve(sf_dir: str, zoom: int = 8) -> pd.DataFrame:
    cells = ref_rasterize(sf_dir, zoom, value_fn=lambda fid: 1)
    rows = []
    for (tx, ty), g in sorted(cells.items()):
        cell = (zoom << 58) | (tx << 29) | ty
        prox = _proximity_ref(g > 0, 64.0).astype(np.float32)
        mean = float(prox.mean())
        sieved = _sieve_ref(g, 20)
        rows.append(
            (cell, float(np.round(mean, 3)), int((sieved > 0).sum()))
        )
    df = pd.DataFrame(rows, columns=["cell", "mean_dist", "n_after_sieve"])
    df["cell"] = df["cell"].astype(np.int64)
    df["n_after_sieve"] = df["n_after_sieve"].astype(np.int64)
    return df.sort_values("cell").reset_index(drop=True)


# ----------------------------------------------------- q38 contour


def _field_ref(mx, my):
    return (
        128.0
        + 90.0 * np.sin(np.asarray(mx, np.float64) / 9000.0)
        * np.cos(np.asarray(my, np.float64) / 11000.0)
        + 30.0
        * np.sin((2.0 * np.asarray(mx, np.float64) + np.asarray(my, np.float64)) / 23000.0)
    )


_MS_CASES = {
    1: [(2, 1)], 14: [(2, 1)], 2: [(1, 3)], 13: [(1, 3)],
    3: [(2, 3)], 12: [(2, 3)], 4: [(0, 3)], 11: [(0, 3)],
    6: [(0, 1)], 9: [(0, 1)], 7: [(2, 0)], 8: [(2, 0)],
}


def _ms_desc_ref(ext: np.ndarray, level: float, gr0: int, gc0: int):
    """Restated marching squares with decomposed endpoints in GLOBAL
    edge coordinates; yields ((o,iy,ix,tbits) endpoint tuples, len_px
    canonical dx/dy)."""
    tl = ext[:-1, :-1]; tr = ext[:-1, 1:]; bl = ext[1:, :-1]; br = ext[1:, 1:]
    finite = np.isfinite(tl) & np.isfinite(tr) & np.isfinite(bl) & np.isfinite(br)
    case = (
        (tl >= level).astype(np.int8) * 8
        + (tr >= level).astype(np.int8) * 4
        + (br >= level).astype(np.int8) * 2
        + (bl >= level).astype(np.int8)
    )
    ys, xs = np.nonzero(finite & (case > 0) & (case < 15))
    segs = []
    for y, x in zip(ys, xs):
        vtl, vtr, vbl, vbr = tl[y, x], tr[y, x], bl[y, x], br[y, x]
        cv = int(case[y, x])
        # edge -> (o, iy, ix, t) in global coords
        edges = {
            0: (0, gr0 + y, gc0 + x, (level - vtl) / (vtr - vtl)),
            1: (0, gr0 + y + 1, gc0 + x, (level - vbl) / (vbr - vbl)),
            2: (1, gr0 + y, gc0 + x, (level - vtl) / (vbl - vtl)),
            3: (1, gr0 + y, gc0 + x + 1, (level - vtr) / (vbr - vtr)),
        }
        if cv in _MS_CASES:
            pairs = _MS_CASES[cv]
        else:  # saddle
            center_hi = (vtl + vtr + vbl + vbr) / 4.0 >= level
            if (cv == 5) == center_hi:
                pairs = [(2, 1), (0, 3)]
            else:
                pairs = [(2, 0), (1, 3)]
        for ea, eb in pairs:
            segs.append((edges[ea], edges[eb]))
    return segs


def _pack_ep(level: int, ep) -> bytes:
    import struct

    o, iy, ix, t = ep
    return struct.pack("<qqqqq", level, o, iy, ix, np.float64(t).view(np.int64))


def _ep_hash(ep, salt: bytes = b"") -> int:
    import hashlib
    import struct

    o, iy, ix, t = ep
    key = salt + struct.pack("<qqqq", o, iy, ix, np.float64(t).view(np.int64))
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big") >> 1


def _seg_len_mm(a, b, res_px: float) -> int:
    ox0, iy0, ix0, t0 = a
    ox1, iy1, ix1, t1 = b
    xf0 = t0 if ox0 == 0 else 0.0
    yf0 = t0 if ox0 == 1 else 0.0
    xf1 = t1 if ox1 == 0 else 0.0
    yf1 = t1 if ox1 == 1 else 0.0
    dx = (np.float64(ix1) - np.float64(ix0)) + (xf1 - xf0)
    dy = (np.float64(iy1) - np.float64(iy0)) + (yf1 - yf0)
    return int(np.floor(np.hypot(dx, dy) * res_px * 1000.0 + 0.5))


def q38_contour(sf_dir: str, zoom: int = 8, grid: int = 64) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    t = pq.read_table(paths["images"], columns=["minx", "miny", "maxx", "maxy"])
    n1 = (1 << zoom) - 1
    cells = set()
    tx0 = _tile_of(t.column("minx").to_numpy(), zoom)
    ty0 = _tile_of(t.column("miny").to_numpy(), zoom)
    tx1 = np.minimum(_tile_of(t.column("maxx").to_numpy(), zoom), n1)
    ty1 = np.minimum(_tile_of(t.column("maxy").to_numpy(), zoom), n1)
    for a, b, c, d in zip(tx0, tx1, ty0, ty1):
        for x in range(a, b + 1):
            for y in range(c, d + 1):
                cells.add((int(x), int(y)))
    res = INITIAL_RES / (1 << zoom)
    res_px = res * 256.0 / grid
    nt = 1 << zoom

    def cell_grid(tx, ty):
        # pixel pitch as (maxx - minx) / grid — the engine's expression;
        # any other float formulation shifts centers by ~1e-9 m and
        # flips interpolation-t bits
        minx = tx * 256 * res - ORIGIN_SHIFT
        maxx = (tx + 1) * 256 * res - ORIGIN_SHIFT
        maxy = (ty + 1) * 256 * res - ORIGIN_SHIFT
        gres = (maxx - minx) / grid
        xs = minx + (np.arange(grid) + 0.5) * gres
        ys = maxy - (np.arange(grid) + 0.5) * gres
        return _field_ref(xs[None, :], ys[:, None])

    grids = {c: cell_grid(*c) for c in cells}
    all_segs: dict[int, list] = {}
    for (tx, ty), g in grids.items():
        ext = np.full((grid + 1, grid + 1), np.nan)
        ext[:grid, :grid] = g
        if (tx, ty - 1) in grids:  # south neighbor's top row
            ext[grid, :grid] = grids[(tx, ty - 1)][0, :]
        if (tx + 1, ty) in grids:  # east neighbor's first column
            ext[:grid, grid] = grids[(tx + 1, ty)][:, 0]
        if (tx + 1, ty - 1) in grids:
            ext[grid, grid] = grids[(tx + 1, ty - 1)][0, 0]
        gr0 = (nt - 1 - ty) * grid
        gc0 = tx * grid
        for level in (64.0, 128.0, 192.0):
            all_segs.setdefault(int(level), []).extend(
                _ms_desc_ref(ext, level, gr0, gc0)
            )
    rows = []
    for level, segs in all_segs.items():
        adj: dict[bytes, list] = {}
        for i, (a, b) in enumerate(segs):
            adj.setdefault(_pack_ep(level, a), []).append((i, 0))
            adj.setdefault(_pack_ep(level, b), []).append((i, 1))
        visited = np.zeros(len(segs), dtype=bool)

        def walk(start_key):
            total = 0
            count = 0
            canon = None
            open_ends = 0
            key = start_key
            while True:
                nxt = [e for e in adj[key] if not visited[e[0]]]
                if not nxt:
                    open_ends += 1 if len(adj[key]) == 1 else 0
                    break
                i, side = nxt[0]
                visited[i] = True
                a, b = segs[i]
                total += _seg_len_mm(a, b, res_px)
                count += 1
                for ep in (a, b):
                    h = _ep_hash(ep)
                    if canon is None or h < canon:
                        canon = h
                key = _pack_ep(level, b if side == 0 else a)
            return total, count, canon

        for key, ents in list(adj.items()):
            if len(ents) != 1 or visited[ents[0][0]]:
                continue
            total, count, canon = walk(key)
            rows.append((level, canon, count, total, False))
        for i in range(len(segs)):
            if visited[i]:
                continue
            total, count, canon = walk(_pack_ep(level, segs[i][0]))
            rows.append((level, canon, count, total, True))
    df = pd.DataFrame(
        rows, columns=["level", "comp_id", "n_segments", "length_mm", "closed"]
    )
    for c in ("level", "comp_id", "n_segments", "length_mm"):
        df[c] = df[c].astype(np.int64)
    df.insert(0, "kind", "line")
    df["area_px2_milli"] = np.int64(0)
    poly = _q38_poly_rows(grids, grid, res_px, nt)
    df = pd.concat([df, poly], ignore_index=True)
    return df.sort_values(["kind", "level", "comp_id"]).reset_index(drop=True)


# contract (shared with the engine): directed marching-squares case
# table — {v >= level} on the LEFT of the 0 -> 1 walk in y-down pixel
# coordinates; saddles keep the line-mode pairing branches
_MS_CASES_DIR = {
    1: [(1, 2)], 14: [(2, 1)], 2: [(3, 1)], 13: [(1, 3)],
    3: [(3, 2)], 12: [(2, 3)], 4: [(0, 3)], 11: [(3, 0)],
    6: [(0, 1)], 9: [(1, 0)], 8: [(2, 0)], 7: [(0, 2)],
}
_MS_SADDLE_DIR = {
    (5, True): [(1, 2), (0, 3)], (10, True): [(2, 1), (3, 0)],
    (5, False): [(0, 2), (1, 3)], (10, False): [(2, 0), (3, 1)],
}


def _area_term_milli(a, b) -> int:
    """Shared contract: directed trapezoid shoelace term in integer
    milli-px^2 (exterior rings sum negative, holes positive)."""
    ox0, iy0, ix0, t0 = a
    ox1, iy1, ix1, t1 = b
    x0 = np.float64(ix0) + (t0 if ox0 == 0 else 0.0)
    y0 = np.float64(iy0) + (t0 if ox0 == 1 else 0.0)
    x1 = np.float64(ix1) + (t1 if ox1 == 0 else 0.0)
    y1 = np.float64(iy1) + (t1 if ox1 == 1 else 0.0)
    return int(np.floor((x0 + x1) * (y1 - y0) * 500.0 + 0.5))


def _q38_poly_rows(grids: dict, grid: int, res_px: float, nt: int,
                   levels=(64.0, 128.0, 192.0)) -> "pd.DataFrame":
    """Independent single-process reference for contour POLYGONS
    (gdal_contour -p semantics): global dense node/value arrays over
    the covered-cell bounding box, directed iso segments + band
    sub-pieces of domain-border edges, global dict-walk ring chaining.
    Shares only the contract formulas with the engine (field, crossing
    t, band searchsorted, mm rounding, area term, endpoint hash)."""
    lv = np.asarray(levels, np.float64)
    txs = [c[0] for c in grids]
    tys = [c[1] for c in grids]
    rb = [nt - 1 - ty for ty in tys]
    goff_r = min(rb) * grid
    goff_c = min(txs) * grid
    H = (max(rb) - min(rb) + 1) * grid
    W = (max(txs) - min(txs) + 1) * grid
    vals = np.full((H + 1, W + 1), np.nan)
    for (tx, ty), g in grids.items():
        lr = (nt - 1 - ty) * grid - goff_r
        lc = tx * grid - goff_c
        vals[lr:lr + grid, lc:lc + grid] = g
    # shared contract: marching_squares/utility.h:30-47 value fudge —
    # nodes within 1e-6 of a level shift up by 1e-6
    for L in lv:
        near = np.abs(vals - L) < 1e-6
        if near.any():
            vals[near] += 1e-6
    fin = np.isfinite(vals)
    dom = fin[:-1, :-1] & fin[:-1, 1:] & fin[1:, :-1] & fin[1:, 1:]

    # directed pieces per band: band 0 = (-inf, L0) ... band k = [Lk-1, inf)
    band_pieces: list[list] = [[] for _ in range(len(lv) + 1)]

    tl = vals[:-1, :-1]; tr = vals[:-1, 1:]; bl = vals[1:, :-1]; br = vals[1:, 1:]
    for li, level in enumerate(lv):
        case = (
            (tl >= level).astype(np.int8) * 8
            + (tr >= level).astype(np.int8) * 4
            + (br >= level).astype(np.int8) * 2
            + (bl >= level).astype(np.int8)
        )
        ys, xs = np.nonzero(dom & (case > 0) & (case < 15))
        for y, x in zip(ys, xs):
            vtl, vtr, vbl, vbr = tl[y, x], tr[y, x], bl[y, x], br[y, x]
            cv = int(case[y, x])
            gy, gx = goff_r + y, goff_c + x
            edges = {
                0: (0, gy, gx, (level - vtl) / (vtr - vtl)),
                1: (0, gy + 1, gx, (level - vbl) / (vbr - vbl)),
                2: (1, gy, gx, (level - vtl) / (vbl - vtl)),
                3: (1, gy, gx + 1, (level - vtr) / (vbr - vtr)),
            }
            if cv in _MS_CASES_DIR:
                pairs = _MS_CASES_DIR[cv]
            else:
                center_hi = (vtl + vtr + vbl + vbr) / 4.0 >= level
                pairs = _MS_SADDLE_DIR[(cv, (cv == 5) == center_hi)]
            for ea, eb in pairs:
                a, b = edges[ea], edges[eb]
                band_pieces[li + 1].append((a, b))   # lower bound: as-is
                band_pieces[li].append((b, a))       # upper bound: reversed

    # domain-border pieces: edges between an in-domain square and not
    false_row = np.zeros((1, dom.shape[1]), bool)
    false_col = np.zeros((dom.shape[0], 1), bool)
    nbr_n = np.vstack([false_row, dom[:-1, :]])
    nbr_s = np.vstack([dom[1:, :], false_row])
    nbr_w = np.hstack([false_col, dom[:, :-1]])
    nbr_e = np.hstack([dom[:, 1:], false_col])

    def border(o, biy, bix, v0, v1, fwd):
        crossings = sorted(
            (L - v0) / (v1 - v0) for L in lv if (v0 >= L) != (v1 >= L)
        )
        ts = [0.0] + crossings + [1.0]
        for a, b in zip(ts[:-1], ts[1:]):
            vm = v0 + 0.5 * (a + b) * (v1 - v0)
            band = int(np.searchsorted(lv, vm, side="right"))

            def ep(t):
                if t == 0.0:
                    return (0, biy, bix, 0.0)
                if t == 1.0:
                    return (0, biy + (1 if o == 1 else 0),
                            bix + (1 if o == 0 else 0), 0.0)
                return (o, biy, bix, t)

            pa_, pb_ = (ep(a), ep(b)) if fwd else (ep(b), ep(a))
            band_pieces[band].append((pa_, pb_))

    for mask, kind in ((dom & ~nbr_n, "n"), (dom & ~nbr_s, "s"),
                       (dom & ~nbr_w, "w"), (dom & ~nbr_e, "e")):
        ys, xs = np.nonzero(mask)
        for y, x in zip(ys.tolist(), xs.tolist()):
            gy, gx = goff_r + y, goff_c + x
            if kind == "n":
                border(0, gy, gx, vals[y, x], vals[y, x + 1], False)
            elif kind == "s":
                border(0, gy + 1, gx, vals[y + 1, x], vals[y + 1, x + 1], True)
            elif kind == "w":
                border(1, gy, gx, vals[y, x], vals[y + 1, x], True)
            else:
                border(1, gy, gx + 1, vals[y, x + 1], vals[y + 1, x + 1], False)

    import struct as _struct

    rows = []
    for band, pieces in enumerate(band_pieces):
        if not pieces:
            continue
        start = {}
        for i, (a, b) in enumerate(pieces):
            ka = _struct.pack("<qqqq", int(a[0]), int(a[1]), int(a[2]),
                              np.float64(a[3]).view(np.int64))
            if ka in start:
                raise ValueError("q38 poly oracle: duplicate start key")
            start[ka] = i
        visited = np.zeros(len(pieces), dtype=bool)
        for i0 in range(len(pieces)):
            if visited[i0]:
                continue
            total = n = area = 0
            canon = None
            i = i0
            while True:
                visited[i] = True
                a, b = pieces[i]
                total += _seg_len_mm(a, b, res_px)
                area += _area_term_milli(a, b)
                n += 1
                for ep_ in (a, b):
                    # band-salted (shared contract): the same iso line
                    # appears reversed in the adjacent band with the
                    # SAME endpoints — unsalted ids would collide
                    h = _ep_hash(ep_, salt=_struct.pack("<q", band))
                    if canon is None or h < canon:
                        canon = h
                kb = _struct.pack("<qqqq", int(b[0]), int(b[1]), int(b[2]),
                                  np.float64(b[3]).view(np.int64))
                if kb not in start:
                    raise ValueError("q38 poly oracle: unclosed ring")
                i = start[kb]
                if visited[i]:
                    break
            rows.append((band, canon, n, total, area))
    df = pd.DataFrame(
        rows, columns=["level", "comp_id", "n_segments", "length_mm",
                       "area_px2_milli"]
    )
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    df.insert(0, "kind", "poly")
    df["closed"] = True
    return df[["kind", "level", "comp_id", "n_segments", "length_mm",
               "closed", "area_px2_milli"]]


# --------------------------------------------- q57 geometry scalar ops


def _ngon(kk: int):
    """Fixture spec shared with the engine: lattice n-gon of part key."""
    n = 5 + kk % 6
    cx = float((kk * 91) % 2000) * 1250.0
    cy = float((kk * 57) % 2000) * 1250.0
    i = np.arange(n)
    r = (50 + ((kk * 13 + i * 7) % 100)).astype(np.float64) * 100.0
    th = 2.0 * np.pi * i / n
    vx = cx + np.floor(r * np.cos(th) + 0.5)
    vy = cy + np.floor(r * np.sin(th) + 0.5)
    return cx, cy, vx, vy


def _centroid_milli_ref(vx, vy):
    """Exact big-int area-weighted centroid (scalar loop — independent
    of the engine's reduceat formulation)."""
    n = len(vx)
    x0, y0 = int(vx[0]), int(vy[0])
    xl = [int(v) - x0 for v in vx]
    yl = [int(v) - y0 for v in vy]
    a2 = 0
    sx = 0
    sy = 0
    for i in range(n):
        j = (i + 1) % n
        cr = xl[i] * yl[j] - xl[j] * yl[i]
        a2 += cr
        sx += (xl[i] + xl[j]) * cr
        sy += (yl[i] + yl[j]) * cr
    if a2 == 0:
        return x0 * 1000, y0 * 1000
    q = 3 * a2
    px, py = 1000 * sx, 1000 * sy
    if q < 0:
        px, py, q = -px, -py, -q
    return x0 * 1000 + (2 * px + q) // (2 * q), y0 * 1000 + (2 * py + q) // (2 * q)


def _dp_ref(vx, vy, tol: float):
    """Douglas-Peucker vertex count on the closed ring (anchor 0 and
    farthest vertex, exact int comparisons; scalar recursion)."""
    n = len(vx)
    if n <= 3:
        return n
    pts = [(int(vx[i]), int(vy[i])) for i in range(n)]
    d2 = [(p[0] - pts[0][0]) ** 2 + (p[1] - pts[0][1]) ** 2 for p in pts]
    far = d2.index(max(d2))  # first max — matches np.argmax
    if far == 0:
        return 3
    tol2 = int(round(tol * tol))
    ring = pts + [pts[0]]
    kept = {0, far, n}

    def rec(lo, hi):
        if hi - lo < 2:
            return
        ax, ay = ring[lo]
        bx, by = ring[hi]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best, bj = -1, -1
        for k in range(lo + 1, hi):
            cr = (ring[k][0] - ax) * dy - (ring[k][1] - ay) * dx
            v = cr * cr
            if v > best:
                best, bj = v, k
        if best > tol2 * seg2:
            kept.add(bj)
            rec(lo, bj)
            rec(bj, hi)

    rec(0, far)
    rec(far, n)
    return len(kept) - 1  # index n aliases vertex 0


def _clip_rect_ref(vx, vy, minx, miny, maxx, maxy):
    """Sutherland-Hodgman with the canonical t = d1/(d1-d2) vertex
    formula (scalar loops; same IEEE expression sequence per element)."""
    pts = [(float(vx[i]), float(vy[i])) for i in range(len(vx))]
    for side in range(4):
        if not pts:
            break
        if side == 0:
            d = [p[0] - minx for p in pts]
        elif side == 1:
            d = [maxx - p[0] for p in pts]
        elif side == 2:
            d = [p[1] - miny for p in pts]
        else:
            d = [maxy - p[1] for p in pts]
        res = []
        n = len(pts)
        for i in range(n):
            j = (i + 1) % n
            di, dj = d[i], d[j]
            if di >= 0.0:
                res.append(pts[i])
                if dj < 0.0:
                    tt = di / (di - dj)
                    res.append(
                        (
                            pts[i][0] + tt * (pts[j][0] - pts[i][0]),
                            pts[i][1] + tt * (pts[j][1] - pts[i][1]),
                        )
                    )
            elif dj >= 0.0:
                tt = di / (di - dj)
                res.append(
                    (
                        pts[i][0] + tt * (pts[j][0] - pts[i][0]),
                        pts[i][1] + tt * (pts[j][1] - pts[i][1]),
                    )
                )
        pts = res
    return pts


def _segmentize_ref(vx, vy, max_len: float):
    """OGRSimpleCurve::segmentize contract (ogr/ogrlinestring.cpp:2661)
    over the closed ring: per-edge densify with the reference's
    relative epsilons (1e-5 square-length slack, 1e-2 rounding guard)
    and exact double expression p_i + j * (d / (k+1)).  Returns
    (n_points_out, fsum of every output coordinate) — fsum is the
    correctly-rounded sum, so accumulation order cannot differ."""
    import math

    xs = [float(v) for v in vx] + [float(vx[0])]
    ys = [float(v) for v in vy] + [float(vy[0])]
    sq_max = max_len * max_len
    ox, oy = [], []
    n = len(xs)
    for i in range(n):
        ox.append(xs[i])
        oy.append(ys[i])
        if i == n - 1:
            break
        dx = xs[i + 1] - xs[i]
        dy = ys[i + 1] - ys[i]
        sq = dx * dx + dy * dy
        if sq - sq_max > 1e-5 * sq_max:
            k = int(math.floor(math.sqrt(sq / sq_max) - 1e-2))
            rx = dx / (k + 1.0)
            ry = dy / (k + 1.0)
            for j in range(1, k + 1):
                ox.append(xs[i] + j * rx)
                oy.append(ys[i] + j * ry)
    return len(ox), math.fsum(ox + oy)



def _makevalid_bowtie_ref(kk: int):
    """Golden for MakeValid on the bowtie fixture: the single crossing
    X of edge P0->P1 and edge P2->P3 solved in CLOSED FORM
    (t = (a+c)/(2a+c+d), exact Fraction — the engine runs its general
    noding + stack-split machinery instead), then exact shoelace areas
    of the two triangles [X,P1,P2] and [P0,X,P3], sorted ascending.
    Returns [(part_idx, n_pts, area_float), ...]."""
    from fractions import Fraction as F

    x0 = ((kk * 91) % 2000) * 1250
    y0 = ((kk * 57) % 2000) * 1250
    a = 1000 + (kk * 13) % 4000
    b = 1000 + (kk * 7) % 4000
    c = 500 + (kk * 29) % 3000
    d = 500 + (kk * 41) % 3500
    t = F(a + c, 2 * a + c + d)
    X = (F(x0) + t * a, F(y0) + t * b)
    P0 = (F(x0), F(y0))
    P1 = (F(x0 + a), F(y0 + b))
    P2 = (F(x0 + a + c), F(y0))
    P3 = (F(x0 - d), F(y0 + b))

    def area(r):
        s = F(0)
        for i in range(len(r)):
            j = (i + 1) % len(r)
            s += r[i][0] * r[j][1] - r[j][0] * r[i][1]
        return abs(s) / 2

    parts = sorted([area([X, P1, P2]), area([P0, X, P3])])
    return [(i, 3, float(v)) for i, v in enumerate(parts)]


# ---------------------- coverage-simplify golden (single-process ref)
#
# Independent implementation of the simplify-coverage contract
# (stages/coverage.py documents it): exact-tuple dict segment map (no
# hashing), per-ring arc split at neighbour-signature changes,
# Visvalingam-Whyatt with doubled-area threshold 2*tol^2, lowest-index
# tie-break, canonical (lexicographically-smaller-endpoint-first) arc
# orientation.  The FIXTURE formulas (jittered lattice + densified
# edges) are mirrored from the engine's derivation — shared input, as
# for the bowtie fixture above.


def _cov_mix(*ks: int) -> int:
    import hashlib
    import struct

    h = hashlib.blake2b(
        struct.pack(f"<{len(ks)}q", *ks), digest_size=8
    ).digest()
    return int.from_bytes(h, "little")


def _cov_quad(i: int, j: int, grid: int, S: int = 100000, m: int = 3):
    def node(a, b):
        if 0 < a < grid and 0 < b < grid:
            return (
                a * S + _cov_mix(a, b, 1) % (S // 4) - S // 8,
                b * S + _cov_mix(a, b, 2) % (S // 4) - S // 8,
            )
        return a * S, b * S

    corners = [(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1)]
    ring = []
    for c in range(4):
        ka, kb = corners[c], corners[(c + 1) % 4]
        rev = kb < ka
        c0, c1 = (kb, ka) if rev else (ka, kb)
        (ax, ay), (bx, by) = node(*c0), node(*c1)
        dx, dy = bx - ax, by - ay
        L = float(np.hypot(dx, dy))
        pts = []
        for t in range(1, m + 1):
            f = t / (m + 1)
            d = _cov_mix(c0[0], c0[1], c1[0], c1[1], t) % 4001 - 2000
            pts.append(
                (
                    int(round(ax + f * dx + (-dy) * d / L)),
                    int(round(ay + f * dy + dx * d / L)),
                )
            )
        if rev:
            pts.reverse()
        ring.append(node(*ka))
        ring.extend(pts)
    return ring


def _cov_vw(chain, thresh: int, closed: bool):
    """VW keep-set over a list of (x, y) int tuples.  Open chains keep
    both endpoints; closed rings keep >= 3 vertices."""
    alive = list(range(len(chain)))

    def a2(p, v, n):
        (xp, yp), (xv, yv), (xn, yn) = chain[p], chain[v], chain[n]
        return abs((xv - xp) * (yn - yp) - (xn - xp) * (yv - yp))

    while True:
        m = len(alive)
        if m <= (3 if closed else 2):
            break
        cand = range(m) if closed else range(1, m - 1)
        best = None
        for j in cand:
            area = a2(alive[j - 1], alive[j], alive[(j + 1) % m])
            if best is None or area < best[0]:
                best = (area, j)
        if best is None or best[0] >= thresh:
            break
        del alive[best[1]]
    return set(alive)


def _cov_simplify_ref(grid: int, tolerance: float, preserve: bool):
    """-> {fid: (n_in, n_out, area2_out)} for the grid x grid fixture."""
    thresh = int(2 * tolerance * tolerance)
    quads = {
        j * grid + i: _cov_quad(i, j, grid)
        for j in range(grid)
        for i in range(grid)
    }
    use: dict = {}
    for f, ring in quads.items():
        n = len(ring)
        for s in range(n):
            a, b = ring[s], ring[(s + 1) % n]
            use.setdefault((min(a, b), max(a, b)), []).append(f)
    out = {}
    for f, ring in quads.items():
        n = len(ring)
        nbr = []
        for s in range(n):
            a, b = ring[s], ring[(s + 1) % n]
            users = use[(min(a, b), max(a, b))]
            nbr.append(users[0] + users[1] - f if len(users) == 2 else -1)
        if all(v == nbr[0] for v in nbr):
            if preserve and nbr[0] < 0:
                kept = list(range(n))
            else:
                start = min(range(n), key=lambda s: ring[s])
                rot = [(start + s) % n for s in range(n)]
                ks = _cov_vw([ring[s] for s in rot], thresh, closed=True)
                kept = [rot[s] for s in sorted(ks)]
        else:
            start = next(
                s for s in range(n) if nbr[s] != nbr[(s - 1) % n]
            )
            rot = [(start + s) % n for s in range(n)]
            rnbr = [nbr[s] for s in rot]
            cuts = [s for s in range(n) if rnbr[s] != rnbr[s - 1]] + [n]
            keep = set()
            for b0, b1 in zip(cuts[:-1], cuts[1:]):
                idxs = [rot[s % n] for s in range(b0, b1 + 1)]
                keep.add(idxs[0])
                keep.add(idxs[-1])
                if preserve and rnbr[b0] < 0:
                    keep.update(idxs)
                    continue
                chain = [ring[s] for s in idxs]
                if chain[-1] < chain[0]:
                    ks = _cov_vw(chain[::-1], thresh, closed=False)
                    ks = {len(chain) - 1 - s for s in ks}
                else:
                    ks = _cov_vw(chain, thresh, closed=False)
                keep.update(idxs[s] for s in ks)
            kept = sorted(keep)
        pts = [ring[s] for s in kept]
        terms = 0
        for s in range(len(pts)):
            t = (s + 1) % len(pts)
            terms += pts[s][0] * pts[t][1] - pts[t][0] * pts[s][1]
        out[f] = (n, len(kept), abs(terms))
    return out


# ------------------------- polygon-buffer golden (single-process ref)
#
# Independent restatement of the round-join positive polygon buffer
# contract (stages/geomops.py documents it; OGRGeometry::Buffer / GEOS
# BufferOp analog).  The raw offset-walk construction is the SHARED
# published discipline (per-edge right-normal shift + quadrant-segment
# fillets) mirrored with the identical scalar float expression
# sequence, like the segmentize golden above; everything downstream —
# the all-pairs rational noding (no bbox prefilter here), the
# first-repeat pinch split (restated with a linear path scan instead of
# the engine's seen-dict), the dominant-ring selection and the exact
# shoelace — is exact Fraction arithmetic, so any correct restatement
# produces identical bits.


def _buf_cross_ref(a1, a2, b1, b2):
    """Exact proper-crossing of segments (a1,a2) x (b1,b2): returns
    (t_along_a, u_along_b, point) or None.  All Fractions."""
    from fractions import Fraction

    rx, ry = a2[0] - a1[0], a2[1] - a1[1]
    sx, sy = b2[0] - b1[0], b2[1] - b1[1]
    den = rx * sy - ry * sx
    if den == 0:
        return None
    qpx, qpy = b1[0] - a1[0], b1[1] - a1[1]
    t = Fraction(qpx * sy - qpy * sx, den)
    u = Fraction(qpx * ry - qpy * rx, den)
    if not (0 < t < 1 and 0 < u < 1):
        return None
    return t, u, (a1[0] + t * rx, a1[1] + t * ry)


def _buffer_ref(xs, ys, radius: float = 1000.0, quadseg: int = 8):
    """-> (n_verts, n_cross, area) of the buffered polygon boundary."""
    import math
    from fractions import Fraction

    n = len(xs)
    a2i = 0
    for i in range(n):
        j = (i + 1) % n
        a2i += int(xs[i]) * int(ys[j]) - int(xs[j]) * int(ys[i])
    if a2i < 0:
        xs = list(xs)[::-1]
        ys = list(ys)[::-1]
    vx = [np.float64(v) for v in xs]
    vy = [np.float64(v) for v in ys]
    quantum = (np.pi / 2.0) / quadseg
    dx = [vx[(i + 1) % n] - vx[i] for i in range(n)]
    dy = [vy[(i + 1) % n] - vy[i] for i in range(n)]
    L = [np.hypot(dx[i], dy[i]) for i in range(n)]
    nx = [dy[i] / L[i] for i in range(n)]
    ny = [-dx[i] / L[i] for i in range(n)]
    wx: list = []
    wy: list = []
    for i in range(n):
        wx.append(vx[i] + radius * nx[i])
        wy.append(vy[i] + radius * ny[i])
        k = (i + 1) % n
        wx.append(vx[k] + radius * nx[i])
        wy.append(vy[k] + radius * ny[i])
        crossz = dx[i] * dy[k] - dy[i] * dx[k]
        if crossz > 0:
            th0 = np.arctan2(ny[i], nx[i])
            th1 = np.arctan2(ny[k], nx[k])
            dth = (th1 - th0) % (2.0 * np.pi)
            m = max(1, int(np.ceil(dth / quantum - 1e-12)))
            for s in range(1, m):
                th = th0 + dth * s / m
                wx.append(vx[k] + radius * np.cos(th))
                wy.append(vy[k] + radius * np.sin(th))
    return _node_split_dominant_ref(wx, wy)


def _node_split_dominant_ref(wx, wy):
    """Exact noding + first-repeat pinch split + dominant-ring pick of
    a closed offset walk (shared by the polygon and line buffer refs;
    everything here is exact Fraction arithmetic)."""
    from fractions import Fraction

    # all-pairs exact noding of the closed offset walk
    w = len(wx)
    pts = [(Fraction(float(wx[i])), Fraction(float(wy[i]))) for i in range(w)]
    cuts: list[list] = [[] for _ in range(w)]
    n_cross = 0
    for i in range(w):
        for j in range(i + 1, w):
            if (j + 1) % w == i or (i + 1) % w == j:
                continue
            hit = _buf_cross_ref(
                pts[i], pts[(i + 1) % w], pts[j], pts[(j + 1) % w]
            )
            if hit is None:
                continue
            t, u, pt = hit
            cuts[i].append((t, pt))
            cuts[j].append((u, pt))
            n_cross += 1
    walk = []
    for i in range(w):
        walk.append(pts[i])
        for _, pt in sorted(cuts[i], key=lambda c: c[0]):
            walk.append(pt)
    # first-repeat pinch split (linear path scan restatement)
    rings = []
    path: list = []
    for p in walk:
        try:
            k = path.index(p)
        except ValueError:
            path.append(p)
            continue
        loop = path[k:]
        if len(loop) >= 3:
            rings.append(loop)
        path = path[: k + 1]
    if len(path) >= 3:
        rings.append(path)
    areas = []
    for r in rings:
        s = Fraction(0)
        for i in range(len(r)):
            j = (i + 1) % len(r)
            s += r[i][0] * r[j][1] - r[j][0] * r[i][1]
        areas.append(s)
    best = max(range(len(rings)), key=lambda q: abs(areas[q]))
    assert areas[best] > 0
    assert all(
        abs(areas[q]) < areas[best] for q in range(len(rings)) if q != best
    )
    return len(rings[best]), n_cross, float(areas[best] / 2)


def _buffer_line_ref(xs, ys, radius: float = 1000.0, quadseg: int = 8):
    """-> (n_verts, n_cross, area) of the round-cap/round-join LINE
    buffer (corridor).  Walk: right side forward, pi cap, left side
    backward, pi cap — the same scalar float expression sequence as
    the engine's buffer_line_chain (shared published discipline);
    noding/split/dominant are exact Fractions via
    _node_split_dominant_ref."""
    m = len(xs)
    vx = [np.float64(v) for v in xs]
    vy = [np.float64(v) for v in ys]
    ne = m - 1
    dx = [vx[i + 1] - vx[i] for i in range(ne)]
    dy = [vy[i + 1] - vy[i] for i in range(ne)]
    L = [np.hypot(dx[i], dy[i]) for i in range(ne)]
    nx = [dy[i] / L[i] for i in range(ne)]
    ny = [-dx[i] / L[i] for i in range(ne)]
    quantum = (np.pi / 2.0) / quadseg
    wx: list = []
    wy: list = []

    def fillet(cx, cy, th0, th1):
        dth = (th1 - th0) % (2.0 * np.pi)
        k = max(1, int(np.ceil(dth / quantum - 1e-12)))
        for s in range(1, k):
            th = th0 + dth * s / k
            wx.append(cx + radius * np.cos(th))
            wy.append(cy + radius * np.sin(th))

    for i in range(ne):
        wx.append(vx[i] + radius * nx[i])
        wy.append(vy[i] + radius * ny[i])
        wx.append(vx[i + 1] + radius * nx[i])
        wy.append(vy[i + 1] + radius * ny[i])
        if i + 1 < ne:
            crossz = dx[i] * dy[i + 1] - dy[i] * dx[i + 1]
            if crossz > 0:
                fillet(vx[i + 1], vy[i + 1],
                       np.arctan2(ny[i], nx[i]),
                       np.arctan2(ny[i + 1], nx[i + 1]))
    fillet(vx[-1], vy[-1],
           np.arctan2(ny[ne - 1], nx[ne - 1]),
           np.arctan2(-ny[ne - 1], -nx[ne - 1]))
    for i in range(ne - 1, -1, -1):
        wx.append(vx[i + 1] - radius * nx[i])
        wy.append(vy[i + 1] - radius * ny[i])
        wx.append(vx[i] - radius * nx[i])
        wy.append(vy[i] - radius * ny[i])
        if i > 0:
            crossz = dx[i - 1] * dy[i] - dy[i - 1] * dx[i]
            if crossz < 0:
                fillet(vx[i], vy[i],
                       np.arctan2(-ny[i], -nx[i]),
                       np.arctan2(-ny[i - 1], -nx[i - 1]))
    fillet(vx[0], vy[0],
           np.arctan2(-ny[0], -nx[0]),
           np.arctan2(ny[0], nx[0]))
    ux: list = []
    uy: list = []
    for px_, py_ in zip(wx, wy):
        if not ux or px_ != ux[-1] or py_ != uy[-1]:
            ux.append(px_)
            uy.append(py_)
    if ux[0] == ux[-1] and uy[0] == uy[-1]:
        ux.pop()
        uy.pop()
    return _node_split_dominant_ref(ux, uy)


# ----------------------------- curve-suite golden (single-process ref)
#
# The engine path emits ISO curve WKB (CircularString / CompoundCurve /
# CurvePolygon), parses it back and linearizes at the published
# OGR_ARC_STEPSIZE discipline (ogrgeometryfactory.cpp:4278
# approximateArcAngles: n = max(2, ceil(|sweep_deg|/4) + 1) uniform
# slices).  The golden computes the SAME fixture geometry analytically
# (no WKB round trip — that encode/decode is what the comparison
# tests), restating the stepping with the identical numpy array
# expression sequence (np.cos/np.sin over the slice array — the shared
# numpy-expression contract of the reproject golden above, since the
# SIMD transcendental loops differ from scalar libm in the last ulp).


def _arc_pts_ref(x0, y0, x1, y1, x2, y2):
    """Linearized arc through three points, both endpoints exact."""
    d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    ux = ((x0 * x0 + y0 * y0) * (y1 - y2)
          + (x1 * x1 + y1 * y1) * (y2 - y0)
          + (x2 * x2 + y2 * y2) * (y0 - y1)) / d
    uy = ((x0 * x0 + y0 * y0) * (x2 - x1)
          + (x1 * x1 + y1 * y1) * (x0 - x2)
          + (x2 * x2 + y2 * y2) * (x1 - x0)) / d
    r = np.hypot(x0 - ux, y0 - uy)
    a0 = np.arctan2(y0 - uy, x0 - ux)
    a1 = np.arctan2(y1 - uy, x1 - ux)
    a2 = np.arctan2(y2 - uy, x2 - ux)
    two_pi = 2.0 * np.pi
    s01 = (a1 - a0) % two_pi
    s02 = (a2 - a0) % two_pi
    sweep = s02 if s01 <= s02 else s02 - two_pi
    npts = max(2, int(np.ceil(abs(sweep) * 180.0 / np.pi / 4.0)) + 1)
    i = np.arange(npts, dtype=np.float64)
    th = a0 + sweep * i / (npts - 1)
    axs = ux + r * np.cos(th)
    ays = uy + r * np.sin(th)
    axs[0], ays[0] = x0, y0
    axs[-1], ays[-1] = x2, y2
    return axs, ays


def _curve_ref(kk: int, cx: float, cy: float):
    """-> [(kind, n_pts, value), ...] for the three curve fixtures."""
    import math

    R = 4000.0 + (kk % 10) * 500.0
    out = []
    # half-circle CircularString, left -> top -> right (clockwise)
    ux, uy = _arc_pts_ref(cx - R, cy, cx, cy + R, cx + R, cy)
    length = math.fsum(np.hypot(np.diff(ux), np.diff(uy)).tolist())
    out.append(("curvecs", len(ux), length))
    # CompoundCurve: straight base then the reversed upper arc
    bx, by = _arc_pts_ref(cx + R, cy, cx, cy + R, cx - R, cy)
    qx = np.concatenate([[cx - R, cx + R], bx[1:]])
    qy = np.concatenate([[cy, cy], by[1:]])
    length = math.fsum(np.hypot(np.diff(qx), np.diff(qy)).tolist())
    out.append(("curvecc", len(qx), length))
    # CurvePolygon: full circle as two half arcs
    lx, ly = _arc_pts_ref(cx + R, cy, cx, cy - R, cx - R, cy)
    fx = np.concatenate([ux, lx[1:]])
    fy = np.concatenate([uy, ly[1:]])
    m = len(fx)
    terms = [fx[i] * fy[(i + 1) % m] - fx[(i + 1) % m] * fy[i]
             for i in range(m)]
    out.append(("curvepoly", m, abs(math.fsum(terms)) * 0.5))
    return out


def q57_geometry_ops(sf_dir: str) -> pd.DataFrame:
    import math

    import pyarrow.parquet as pq

    keys = (
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .column("p_partkey")
        .to_numpy(zero_copy_only=False)
    )
    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    eid = ev.column("event_id").to_numpy(zero_copy_only=False)
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)

    rows = []
    for kk in keys:
        kk = int(kk)
        cx, cy, vx, vy = _ngon(kk)
        cxm, cym = _centroid_milli_ref(vx, vy)
        rows.append(("centroid", kk, cxm, cym, 0.0))
        rows.append(("simplify", kk, len(vx), _dp_ref(vx, vy, 500.0), 0.0))
        n_seg, seg_sum = _segmentize_ref(vx, vy, 3000.0)
        rows.append(("segmentize", kk, len(vx) + 1, n_seg, seg_sum))
        sxm, sym = _centroid_milli_ref(vy, vx)  # swapped axes
        rows.append(("swapxy", kk, sxm, sym, 0.0))
        rows.append(("explode", kk, 0, len(vx), 0.0))
        rows.append(("explode", kk, 1, len(vx), 0.0))
        pts = _clip_rect_ref(
            vx, vy, cx + 2000.0 - 6000.0, cy - 6000.0, cx + 2000.0 + 6000.0,
            cy + 6000.0
        )
        if len(pts) < 3:
            area = 0.0
        else:
            terms = []
            for i in range(len(pts)):
                j = (i + 1) % len(pts)
                terms.append(pts[i][0] * pts[j][1] - pts[j][0] * pts[i][1])
            area = abs(math.fsum(terms)) * 0.5
        rows.append(("clip", kk, len(pts), 0, area))
        for part_idx, n_pts, av in _makevalid_bowtie_ref(kk):
            rows.append(("makevalid", kk, part_idx, n_pts, av))
        # vector reproject golden: MetersToLatLon
        # (gdal2tiles.py:431-441) restated with numpy elementwise ops
        # — numpy's SIMD exp/atan differ from scalar libm in the last
        # ulp ~25% of the time, so the shared contract is the numpy
        # expression; fsum per axis is order-independent, one final add
        OS = 20037508.342789244
        lon_a = (np.asarray(vx, np.float64) / OS) * 180.0
        lat_a = (np.asarray(vy, np.float64) / OS) * 180.0
        lat_a = 180.0 / np.pi * (
            2.0 * np.arctan(np.exp(lat_a * np.pi / 180.0)) - np.pi / 2.0)
        rows.append(("reproject", kk, len(vx), 0,
                     math.fsum(lon_a) + math.fsum(lat_a)))
        # convex hull golden: Jarvis march (gift wrapping) — an
        # algorithm INDEPENDENT of the engine's monotone chain; exact
        # integer predicates and the same strict-turn convention
        # (boundary-collinear points dropped: among collinear
        # candidates the farthest wins), so vertex set, count and
        # doubled area agree exactly
        P = sorted({(int(a), int(b)) for a, b in zip(vx, vy)})
        if len(P) <= 2:
            hull = list(P)
        else:
            hull = []
            start = P[0]
            cur = start
            while True:
                hull.append(cur)
                cand = P[0] if P[0] != cur else P[1]
                for p in P:
                    if p == cur:
                        continue
                    cr = (cand[0] - cur[0]) * (p[1] - cur[1]) - (
                        cand[1] - cur[1]
                    ) * (p[0] - cur[0])
                    if cr < 0:
                        cand = p
                    elif cr == 0:
                        d_c = (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
                        d_p = (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                        if d_p > d_c:
                            cand = p
                cur = cand
                if cur == start:
                    break
        ha2 = 0
        for i in range(len(hull)):
            j = (i + 1) % len(hull)
            ha2 += hull[i][0] * hull[j][1] - hull[j][0] * hull[i][1]
        rows.append(("convexhull", kk, len(hull), abs(ha2), 0.0))
        # distance golden: scalar per-segment point-to-segment with the
        # engine's exact float expression sequence
        qx = float(max(vx)) + 30000.0
        qy = float(min(vy)) - 20000.0
        best = None
        npts = len(vx)
        for i in range(npts):
            j = (i + 1) % npts
            x0, y0 = float(vx[i]), float(vy[i])
            dxs, dys = float(vx[j]) - x0, float(vy[j]) - y0
            len2 = dxs * dxs + dys * dys
            dot = (qx - x0) * dxs + (qy - y0) * dys
            tt = dot / (len2 if len2 > 1.0 else 1.0)
            tt = 0.0 if tt < 0.0 else (1.0 if tt > 1.0 else tt)
            ccx = x0 + tt * dxs
            ccy = y0 + tt * dys
            d2 = (qx - ccx) * (qx - ccx) + (qy - ccy) * (qy - ccy)
            if best is None or d2 < best:
                best = d2
        rows.append(("distance", kk, npts, 0, math.sqrt(best)))
        # set-geom-type golden: Polygon (WKB code 3) -> MultiPolygon
        # (code 6), closed-ring vertex count, fsum of the interleaved
        # coordinate stream in WKB emit order (x0,y0,x1,y1,...)
        closed_x = np.append(vx, vx[0])
        closed_y = np.append(vy, vy[0])
        inter = np.column_stack([closed_x, closed_y]).ravel()
        rows.append(("setgeomtype", kk, 3 * 100 + 6, len(closed_x),
                     math.fsum(inter)))
        # polygon buffer (every 10th ngon, r=1000 round joins)
        if kk % 10 == 0:
            nverts, ncross, barea = _buffer_ref(vx, vy)
            rows.append(("bufferpoly", kk, nverts, ncross, barea))
        # LINE buffer (fid % 10 == 5): open chain = the ngon's first
        # ceil(n/2)+1 vertices, r=1000, round caps + round joins
        if kk % 10 == 5:
            nchain = len(vx) // 2 + 2
            nverts, ncross, barea = _buffer_line_ref(vx[:nchain],
                                                     vy[:nchain])
            rows.append(("bufferline", kk, nverts, ncross, barea))
        # ISO curve suite (CircularString / CompoundCurve / CurvePolygon)
        for ckind, cn, cv in _curve_ref(kk, cx, cy):
            rows.append((ckind, kk, cn, 0, cv))

    # point buffers (pid % 10 == 0), 32-gon on the lattice
    ang = 2.0 * np.pi * np.arange(32) / 32
    dx = np.floor(2500.0 * np.cos(ang) + 0.5).astype(np.int64)
    dy = np.floor(2500.0 * np.sin(ang) + 0.5).astype(np.int64)
    px = ((eid * 37) % 100000).astype(np.float64) * 25.0
    py = ((uid * 53 + eid) % 100000).astype(np.float64) * 25.0
    for i in range(len(eid)):
        pid = int(eid[i])
        if pid % 10 != 0:
            continue
        wx = int(px[i]) + dx
        wy = int(py[i]) + dy
        a2 = 0
        for s in range(32):
            t2 = (s + 1) % 32
            a2 += int(wx[s]) * int(wy[t2]) - int(wx[t2]) * int(wy[s])
        rows.append(("buffer", pid, a2, 32, 0.0))

    for kind, preserve in (("simplifycov", False), ("simplifycovpb", True)):
        for f, (n_in, n_out, area2) in _cov_simplify_ref(
            20, 3000.0, preserve
        ).items():
            rows.append((kind, f, n_in, n_out, float(area2)))

    df = pd.DataFrame(rows, columns=["kind", "fid", "a", "b", "v"])
    df["fid"] = df["fid"].astype(np.int64)
    df["a"] = df["a"].astype(np.int64)
    df["b"] = df["b"].astype(np.int64)
    df["v"] = df["v"].astype(np.float64)
    return df.sort_values(["kind", "fid"]).reset_index(drop=True)


GOLDENS = {
    "q33_rasterize_polygonize": (q33_rasterize_polygonize, ["comp_id"]),
    "q56_footprint": (q56_footprint, ["comp_id"]),
    "q36_proximity_sieve": (q36_proximity_sieve, ["cell"]),
    "q38_contour": (q38_contour, ["kind", "level", "comp_id"]),
    "q57_geometry_ops": (q57_geometry_ops, ["kind", "fid"]),
}


# ------------------------------------------------------ q51 layer algebra


def _union_area_sweep(x0, y0, x1, y1) -> float:
    """Area of the union of axis-aligned rects by x-strip sweep with
    y-interval merging — deliberately a DIFFERENT algorithm from the
    engine's coordinate-grid matmul decomposition (both exact on the
    integer-derived fixture coordinates)."""
    if len(x0) == 0:
        return 0.0
    xs = np.unique(np.concatenate([x0, x1]))
    area = 0.0
    for i in range(len(xs) - 1):
        xa, xb = xs[i], xs[i + 1]
        if xb <= xa:
            continue
        act = (x0 <= xa) & (x1 >= xb)
        if not act.any():
            continue
        ys0, ys1 = y0[act], y1[act]
        order = np.argsort(ys0, kind="mergesort")
        tot = 0.0
        cur0 = cur1 = None
        for s, e in zip(ys0[order], ys1[order]):
            if e <= s:
                continue
            if cur1 is None:
                cur0, cur1 = s, e
            elif s <= cur1:
                cur1 = max(cur1, e)
            else:
                tot += cur1 - cur0
                cur0, cur1 = s, e
        if cur1 is not None:
            tot += cur1 - cur0
        area += (xb - xa) * tot
    return area


def q51_overlay(sf_dir: str) -> pd.DataFrame:
    """Layer-algebra overlay golden: rect layers restated from the
    q51 fixture spec (part -> A, supplier -> B); pairwise intersection
    areas by closed form, per-feature remainders/coverage by the
    strip-sweep union-of-rects (independent of the engine's grid
    decomposition)."""
    import pyarrow.parquet as pq

    pk = (pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
          .column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64))
    sk = (pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
          .column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64))

    acx = ((pk * 91) % 2000).astype(np.float64) * 1250.0
    acy = ((pk * 57) % 2000).astype(np.float64) * 1250.0
    ahw = (50 + (pk % 200)).astype(np.float64) * 100.0
    ax0, ay0, ax1, ay1 = acx - ahw, acy - ahw, acx + ahw, acy + ahw
    bcx = ((sk * 83) % 2000).astype(np.float64) * 1250.0
    bcy = ((sk * 47) % 2000).astype(np.float64) * 1250.0
    bhw = (100 + (sk % 150)).astype(np.float64) * 100.0
    bx0, by0, bx1, by1 = bcx - bhw, bcy - bhw, bcx + bhw, bcy + bhw

    ops, fa, fb, ar = [], [], [], []
    # pairwise intersections + per-A remainder/coverage
    for i in range(len(pk)):
        ix0 = np.maximum(ax0[i], bx0)
        iy0 = np.maximum(ay0[i], by0)
        ix1 = np.minimum(ax1[i], bx1)
        iy1 = np.minimum(ay1[i], by1)
        m = (ix1 >= ix0) & (iy1 >= iy0)  # boundary-inclusive match
        idx = np.flatnonzero(m)
        for j in idx:
            ops.append("inter")
            fa.append(int(pk[i]))
            fb.append(int(sk[j]))
            ar.append(int(np.floor((ix1[j] - ix0[j]) * (iy1[j] - iy0[j]) + 0.5)))
        area_a = (ax1[i] - ax0[i]) * (ay1[i] - ay0[i])
        cov = _union_area_sweep(ix0[m], iy0[m], ix1[m], iy1[m])
        rem = area_a - cov
        if rem > 0:
            ops.append("erase_a")
            fa.append(int(pk[i]))
            fb.append(-1)
            ar.append(int(np.floor(rem + 0.5)))
        if cov > 0:
            ops.append("clip_a")
            fa.append(int(pk[i]))
            fb.append(-1)
            ar.append(int(np.floor(cov + 0.5)))
    # per-B remainder
    for j in range(len(sk)):
        ix0 = np.maximum(bx0[j], ax0)
        iy0 = np.maximum(by0[j], ay0)
        ix1 = np.minimum(bx1[j], ax1)
        iy1 = np.minimum(by1[j], ay1)
        m = (ix1 >= ix0) & (iy1 >= iy0)
        area_b = (bx1[j] - bx0[j]) * (by1[j] - by0[j])
        rem = area_b - _union_area_sweep(ix0[m], iy0[m], ix1[m], iy1[m])
        if rem > 0:
            ops.append("erase_b")
            fa.append(-1)
            fb.append(int(sk[j]))
            ar.append(int(np.floor(rem + 0.5)))
    return pd.DataFrame({
        "op": ops,
        "fid_a": np.asarray(fa, np.int64),
        "fid_b": np.asarray(fb, np.int64),
        "area_m2": np.asarray(ar, np.int64),
    })


GOLDENS["q51_intersection_overlay"] = (q51_overlay, ["op", "fid_a", "fid_b"])
