"""Reference implementations for the tiling/mosaic queries —
single-process numpy, separately coded from the engine's stages.  The
WebMercator tile formulas are public math (gdal2tiles GlobalMercator,
gdal2tiles.py:422-497), restated here independently."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

ORIGIN_SHIFT = 20037508.342789244
INITIAL_RES = 156543.03392804097


def _fixture_paths(sf_dir: str):
    # input provisioning only: the fixture tables ARE the query inputs
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    return ensure_fixtures(scale_for_sf_dir(sf_dir))


def _tile_of(m: np.ndarray, zoom: int) -> np.ndarray:
    px = (m + ORIGIN_SHIFT) / (INITIAL_RES / (1 << zoom))
    return np.maximum(np.ceil(px / 256.0) - 1, 0).astype(np.int64)


# -------------------------------------------------- q22 envelope cover


def q22_images_cells(sf_dir: str, zoom: int = 10) -> pd.DataFrame:
    t = pq.read_table(
        _fixture_paths(sf_dir)["images"], columns=["minx", "miny", "maxx", "maxy"]
    )
    tx0 = _tile_of(t.column("minx").to_numpy(), zoom)
    ty0 = _tile_of(t.column("miny").to_numpy(), zoom)
    n1 = (1 << zoom) - 1
    tx1 = np.minimum(_tile_of(t.column("maxx").to_numpy(), zoom), n1)
    ty1 = np.minimum(_tile_of(t.column("maxy").to_numpy(), zoom), n1)
    counts: dict[int, int] = {}
    for a, b, c, d in zip(tx0, tx1, ty0, ty1):
        for x in range(a, b + 1):
            for y in range(c, d + 1):
                cell = (zoom << 58) | (x << 29) | y
                counts[cell] = counts.get(cell, 0) + 1
    cells = np.asarray(sorted(counts), dtype=np.int64)
    return pd.DataFrame(
        {"cell": cells, "n": np.asarray([counts[c] for c in cells], np.int64)}
    )


# ------------------------------------------------ single-process tiler

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _cs_band(a: np.ndarray) -> int:
    flat = np.ascontiguousarray(a).reshape(-1).astype(np.int64)
    return int((flat % _PRIMES[np.arange(flat.size) % 11]).sum() & 0xFFFF)


def _ref_chip(image_id: str, w: int, h: int, fmt: str) -> np.ndarray:
    from .rasterref import ref_decoded

    return ref_decoded(int(image_id[3:]), w, h, fmt)


def _ref_base_tiles(sf_dir: str, zoom: int):
    """Compose all non-empty base tiles at ``zoom`` (nearest-neighbor,
    image_id-ordered last-wins — the gdalbuildvrt overlap rule).
    Returns {(tx, ty): (canvas uint8 (256,256,3), mask bool)}."""
    df = _images_df(sf_dir)
    res = INITIAL_RES / (1 << zoom)
    n1 = (1 << zoom) - 1
    by_tile: dict[tuple[int, int], list] = {}
    for row in df.itertuples(index=False):
        tx0 = int(_tile_of(np.array([row.minx]), zoom)[0])
        ty0 = int(_tile_of(np.array([row.miny]), zoom)[0])
        tx1 = min(int(_tile_of(np.array([row.maxx]), zoom)[0]), n1)
        ty1 = min(int(_tile_of(np.array([row.maxy]), zoom)[0]), n1)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                by_tile.setdefault((tx, ty), []).append(row)
    tiles = {}
    for (tx, ty), rows in by_tile.items():
        tb_minx = tx * 256 * res - ORIGIN_SHIFT
        tb_maxy = (ty + 1) * 256 * res - ORIGIN_SHIFT
        canvas = np.zeros((256, 256, 3), dtype=np.uint8)
        mask = np.zeros((256, 256), dtype=bool)
        for row in sorted(rows, key=lambda r: r.image_id):
            w, h = int(row.w), int(row.h)
            i0 = max(0, int(np.ceil((row.minx - tb_minx) / res - 0.5)))
            i1 = min(255, int(np.floor((row.maxx - tb_minx) / res - 0.5)))
            j0 = max(0, int(np.ceil((tb_maxy - row.maxy) / res - 0.5)))
            j1 = min(255, int(np.floor((tb_maxy - row.miny) / res - 0.5)))
            if i1 < i0 or j1 < j0:
                continue
            img = _ref_chip(row.image_id, w, h, row.fmt)
            xs_m = tb_minx + (np.arange(i0, i1 + 1) + 0.5) * res
            ys_m = tb_maxy - (np.arange(j0, j1 + 1) + 0.5) * res
            sx = (xs_m - row.minx) / ((row.maxx - row.minx) / w) - 0.5
            sy = (row.maxy - ys_m) / ((row.maxy - row.miny) / h) - 0.5
            ix = np.clip(np.floor(sx + 0.5).astype(np.int64), 0, w - 1)
            iy = np.clip(np.floor(sy + 0.5).astype(np.int64), 0, h - 1)
            canvas[j0 : j1 + 1, i0 : i1 + 1] = img[iy[:, None], ix[None, :]]
            mask[j0 : j1 + 1, i0 : i1 + 1] = True
        if mask.any():
            tiles[(tx, ty)] = (canvas, mask)
    return tiles


def _images_df(sf_dir: str):
    t = pq.read_table(
        _fixture_paths(sf_dir)["images"],
        columns=["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    return t.to_pandas().sort_values("image_id").reset_index(drop=True)


def _ref_overview(tiles: dict) -> dict:
    """Children tiles -> parents (2x masked integer average, TMS)."""
    parents: dict[tuple[int, int], list] = {}
    for (tx, ty), tm in tiles.items():
        parents.setdefault((tx >> 1, ty >> 1), []).append((tx, ty, tm))
    out = {}
    for (px, py), children in parents.items():
        canvas = np.zeros((512, 512, 3), dtype=np.uint32)
        mask = np.zeros((512, 512), dtype=np.uint32)
        for tx, ty, (c, m) in children:
            dx, dy = tx - 2 * px, ty - 2 * py
            r0, c0 = (1 - dy) * 256, dx * 256
            canvas[r0 : r0 + 256, c0 : c0 + 256] = c
            mask[r0 : r0 + 256, c0 : c0 + 256] = m
        a = canvas
        mw = mask[:, :, None]
        s = (
            (a * mw)[0::2, 0::2]
            + (a * mw)[0::2, 1::2]
            + (a * mw)[1::2, 0::2]
            + (a * mw)[1::2, 1::2]
        )
        cnt = mask[0::2, 0::2] + mask[0::2, 1::2] + mask[1::2, 0::2] + mask[1::2, 1::2]
        safe = np.maximum(cnt, 1)
        oimg = ((s + safe[:, :, None] // 2) // safe[:, :, None]).astype(np.uint8)
        valid = cnt > 0
        oimg *= valid[:, :, None]
        out[(px, py)] = (oimg, valid)
    return out


def _pyramid_checksums(sf_dir: str, z_max: int, z_min: int) -> pd.DataFrame:
    rows = []
    tiles = _ref_base_tiles(sf_dir, z_max)
    z = z_max
    while True:
        for (tx, ty), (canvas, _) in tiles.items():
            rows.append(
                (
                    z,
                    tx,
                    ty,
                    _cs_band(canvas[:, :, 0]),
                    _cs_band(canvas[:, :, 1]),
                    _cs_band(canvas[:, :, 2]),
                )
            )
        if z == z_min:
            break
        tiles = _ref_overview(tiles)
        z -= 1
    df = pd.DataFrame(rows, columns=["z", "x", "y", "cs_r", "cs_g", "cs_b"])
    return df.astype(np.int64).sort_values(["z", "x", "y"]).reset_index(drop=True)


def q24_tile_pyramid(sf_dir: str) -> pd.DataFrame:
    return _pyramid_checksums(sf_dir, z_max=10, z_min=8)


def q34_checkpointed_tiles(sf_dir: str, zoom: int = 9, shift: int = 6) -> pd.DataFrame:
    """Partition counters of the z9 base-tile checkpoint store:
    pid = cell >> shift with cell = (z<<58)|(x<<29)|y; fresh run, so
    nothing is skipped."""
    tiles = _ref_base_tiles(sf_dir, zoom)
    counts: dict[int, int] = {}
    for tx, ty in tiles:
        cell = (zoom << 58) | (tx << 29) | ty
        pid = cell >> shift
        counts[pid] = counts.get(pid, 0) + 1
    pids = sorted(counts)
    return pd.DataFrame(
        {
            "pid": np.asarray(pids, np.int64),
            "rows": np.asarray([counts[p] for p in pids], np.int64),
            "skipped": np.zeros(len(pids), dtype=bool),
        }
    )


def q40_tile_tree(sf_dir: str, zoom: int = 8) -> pd.DataFrame:
    """Fresh z/x/y.png tree write: every non-empty z8 tile written."""
    n = len(_ref_base_tiles(sf_dir, zoom))
    return pd.DataFrame({"written": [np.int64(n)], "skipped": [np.int64(0)]})


# ------------------------------------------ q23 image x polygon join


def _seg_intersect(p1, p2, p3, p4) -> bool:
    """Segments p1p2 / p3p4 intersect (boundary-inclusive, collinear
    overlaps count)."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    if o4 == 0 and on_seg(p3, p4, p2):
        return True
    return False


def _pip_ref(x: float, y: float, rings: list) -> bool:
    """Boundary-inclusive point-in-polygon with holes (crossing number
    per ring; on-edge of any ring counts as inside)."""
    inside_ext = False
    for ri, ring in enumerate(rings):
        n = len(ring) - 1
        cross = False
        for k in range(n):
            x1, y1 = ring[k]
            x2, y2 = ring[k + 1]
            # on-edge check
            if _seg_intersect((x1, y1), (x2, y2), (x, y), (x, y)):
                return True
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if xint > x:
                    cross = not cross
        if ri == 0:
            if not cross:
                return False
            inside_ext = True
        elif cross:  # strictly inside a hole
            return False
    return inside_ext


def _rect_poly_intersects_ref(minx, miny, maxx, maxy, rings: list) -> bool:
    # any ring vertex inside the rect
    for ring in rings:
        for vx, vy in ring[:-1]:
            if minx <= vx <= maxx and miny <= vy <= maxy:
                return True
    # any rect corner inside the polygon
    for cx, cy in ((minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy)):
        if _pip_ref(cx, cy, rings):
            return True
    # any edge pair intersects
    rect = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]
    for ring in rings:
        for k in range(len(ring) - 1):
            for j in range(4):
                if _seg_intersect(
                    rect[j], rect[j + 1], tuple(ring[k]), tuple(ring[k + 1])
                ):
                    return True
    return False


def q23_spatial_join_images(sf_dir: str) -> pd.DataFrame:
    """Brute-force image-envelope x polygon intersects join over the
    fixtures, with the polygon geometry rebuilt from the fixture spec
    (synth.make_table.polygon_rings_of — the input definition)."""
    from ..synth.make_table import polygon_rings_of

    paths = _fixture_paths(sf_dir)
    imgs = pq.read_table(
        paths["images"], columns=["image_id", "caption", "minx", "miny", "maxx", "maxy"]
    )
    pols = pq.read_table(paths["polygons"], columns=["fid", "category"])
    iid = np.asarray(imgs.column("image_id").to_pylist())
    cap = np.asarray(imgs.column("caption").to_pylist(), dtype=object)
    ix0 = imgs.column("minx").to_numpy()
    iy0 = imgs.column("miny").to_numpy()
    ix1 = imgs.column("maxx").to_numpy()
    iy1 = imgs.column("maxy").to_numpy()
    fids = pols.column("fid").to_numpy(zero_copy_only=False)
    cats = np.asarray(pols.column("category").to_pylist(), dtype=object)
    rows = []
    for k in range(len(fids)):
        rings = polygon_rings_of(int(fids[k]))
        ext = rings[0]
        pminx, pminy = ext[:, 0].min(), ext[:, 1].min()
        pmaxx, pmaxy = ext[:, 0].max(), ext[:, 1].max()
        cand = np.flatnonzero(
            (ix0 <= pmaxx) & (ix1 >= pminx) & (iy0 <= pmaxy) & (iy1 >= pminy)
        )
        for i in cand:
            if _rect_poly_intersects_ref(ix0[i], iy0[i], ix1[i], iy1[i], rings):
                rows.append((iid[i], cap[i], int(fids[k]), cats[k]))
    df = pd.DataFrame(rows, columns=["image_id", "caption", "fid", "category"])
    df["fid"] = df["fid"].astype(np.int64)
    return df.sort_values(["image_id", "fid"]).reset_index(drop=True)


# --------------------------------------------------- q43 MVT layers


def _clip_ring_ref(ring: np.ndarray, minx, miny, maxx, maxy):
    """Sutherland-Hodgman restated (same boundary order/expressions as
    the engine — bitwise parity pins the formula)."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    for axis, bound, keep_ge in (
        (0, minx, True), (0, maxx, False), (1, miny, True), (1, maxy, False)
    ):
        if len(pts) == 0:
            return None
        out = []
        n = len(pts)
        for i in range(n):
            cur = pts[i]
            prv = pts[i - 1]
            cin = cur[axis] >= bound if keep_ge else cur[axis] <= bound
            pin = prv[axis] >= bound if keep_ge else prv[axis] <= bound
            if cin != pin:
                t = (bound - prv[axis]) / (cur[axis] - prv[axis])
                out.append(prv + t * (cur - prv))
            if cin:
                out.append(cur)
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def q43_mvt_tiles(sf_dir: str, zoom: int = 8, buffer_px: int = 64,
                  extent: int = 4096) -> pd.DataFrame:
    import pyarrow.parquet as pq_

    from ..synth.make_table import polygon_rings_of

    paths = _fixture_paths(sf_dir)
    pol = pq_.read_table(paths["polygons"], columns=["fid"])
    pts = pq_.read_table(paths["points"], columns=["pid", "x", "y"])
    fids = pol.column("fid").to_numpy(zero_copy_only=False)
    px = pts.column("x").to_numpy()
    py = pts.column("y").to_numpy()
    res = INITIAL_RES / (1 << zoom)
    buf_m = buffer_px / extent * (256.0 * res)
    n1 = (1 << zoom) - 1
    counts: dict[tuple[int, int], list] = {}

    def tile_geo(tx, ty):
        minx = tx * 256 * res - ORIGIN_SHIFT
        maxx = (tx + 1) * 256 * res - ORIGIN_SHIFT
        miny = ty * 256 * res - ORIGIN_SHIFT
        maxy = (ty + 1) * 256 * res - ORIGIN_SHIFT
        size = maxx - minx
        return minx, miny, maxx, maxy, size, buffer_px / extent * size

    def quant(coords, minx, maxy, size):
        ix = np.floor((coords[:, 0] - minx) / size * extent + 0.5)
        iy = np.floor((maxy - coords[:, 1]) / size * extent + 0.5)
        q = np.stack([ix, iy], axis=1).astype(np.int64)
        keep = np.ones(len(q), dtype=bool)
        keep[1:] = (q[1:] != q[:-1]).any(axis=1)
        return q[keep]

    for fid in fids:
        rings = polygon_rings_of(int(fid))
        ext = rings[0]
        e0, e1 = ext[:, 0].min(), ext[:, 0].max()
        f0, f1 = ext[:, 1].min(), ext[:, 1].max()
        tx0 = int(_tile_of(np.array([e0 - buf_m]), zoom)[0])
        ty0 = int(_tile_of(np.array([f0 - buf_m]), zoom)[0])
        tx1 = min(int(_tile_of(np.array([e1 + buf_m]), zoom)[0]), n1)
        ty1 = min(int(_tile_of(np.array([f1 + buf_m]), zoom)[0]), n1)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                minx, miny, maxx, maxy, size, buf = tile_geo(tx, ty)
                parts = 0
                for ring in rings:
                    c = _clip_ring_ref(ring, minx - buf, miny - buf,
                                       maxx + buf, maxy + buf)
                    if c is not None and len(quant(c, minx, maxy, size)) >= 4:
                        parts += 1
                rec = counts.setdefault((tx, ty), [0, 0, 0])
                if parts:
                    rec[0] += 1
                if (e0 <= maxx + buf and e1 >= minx - buf
                        and f0 <= maxy + buf and f1 >= miny - buf):
                    if len(quant(ext, minx, maxy, size)) >= 2:
                        rec[1] += 1
    tx0s = _tile_of(px - buf_m, zoom)
    ty0s = _tile_of(py - buf_m, zoom)
    tx1s = np.minimum(_tile_of(px + buf_m, zoom), n1)
    ty1s = np.minimum(_tile_of(py + buf_m, zoom), n1)
    for k in range(len(px)):
        for tx in range(int(tx0s[k]), int(tx1s[k]) + 1):
            for ty in range(int(ty0s[k]), int(ty1s[k]) + 1):
                minx, miny, maxx, maxy, size, buf = tile_geo(tx, ty)
                if (minx - buf <= px[k] <= maxx + buf
                        and miny - buf <= py[k] <= maxy + buf):
                    counts.setdefault((tx, ty), [0, 0, 0])[2] += 1
    rows = [
        (zoom, tx, ty, a, b, c)
        for (tx, ty), (a, b, c) in sorted(counts.items())
        if a or b or c
    ]
    df = pd.DataFrame(
        rows, columns=["z", "x", "y", "n_polys", "n_lines", "n_points"]
    ).astype(np.int64)
    return df.sort_values(["z", "x", "y"]).reset_index(drop=True)


GOLDENS: dict = {
    "q22_images_cells": (q22_images_cells, ["cell"]),
    "q43_mvt_tiles": (q43_mvt_tiles, ["z", "x", "y"]),
    "q23_spatial_join_images": (q23_spatial_join_images, ["image_id", "fid"]),
    "q24_tile_pyramid": (q24_tile_pyramid, ["z", "x", "y"]),
    "q34_checkpointed_tiles": (q34_checkpointed_tiles, ["pid"]),
    "q40_tile_tree": (q40_tile_tree, ["written"]),
}
