"""Contour over a cell mosaic with CROSS-CELL polyline stitching.

Reference semantics: alg/contour.cpp:568 GDALContourGenerateEx +
alg/marching_squares/ (segment generation), with the distributed twist
of SURVEY.md §2.9: per-cell marching squares needs a one-pixel halo
(south row / east column / corner) exchanged through the same
groupby(cell) shuffle that carries the grids, and polylines crossing a
cell border are merged by matching their DECOMPOSED endpoint
descriptors (orientation, global edge, interpolation-t bits — bitwise
identical on both sides of a border) with the same min-label
propagation used by the polygonize seam merge.

Chain identity is the minimum endpoint hash over the polyline — a pure
function of the field, reproducible by the independent oracle.

Output rows: level:int64, comp_id:int64, n_segments:int64,
length_mm:int64 (per-segment rounded milli-meter lengths, so sums are
order-independent), closed:bool.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ..functions import mercator
from ..functions.contour_ms import marching_squares_desc
from .cells import cover_envelope_cells

LEVELS = (64.0, 128.0, 192.0)


def field_value(mx, my):
    """Deterministic analytic test field over EPSG:3857 meters (the
    fixture 'DEM'; smooth so iso-lines are long and cross cells)."""
    return (
        128.0
        + 90.0 * np.sin(np.asarray(mx, np.float64) / 9000.0)
        * np.cos(np.asarray(my, np.float64) / 11000.0)
        + 30.0 * np.sin((2.0 * np.asarray(mx, np.float64) + np.asarray(my, np.float64)) / 23000.0)
    )


def field_cells(envelopes, zoom: int = 8, grid: int = 64):
    """Envelope rows -> one field grid per covered cell (cell, z, x, y,
    grid_bytes float64 grid x grid)."""
    cover = envelopes.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")

    import pandas as pd

    def one_cell(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        res = (maxx - minx) / grid
        xs = minx + (np.arange(grid) + 0.5) * res
        ys = maxy - (np.arange(grid) + 0.5) * res
        vals = field_value(xs[None, :], ys[:, None])
        return pd.DataFrame(
            {
                "cell": [cell],
                "z": [z],
                "x": [tx],
                "y": [ty],
                "grid_bytes": [vals.astype(np.float64).tobytes()],
            }
        )

    from ray.data.aggregate import Count

    distinct = cover.select_columns(["cell"]).groupby("cell").aggregate(
        Count(alias_name="n")
    )

    def grids_batch(t: pa.Table) -> pa.Table:
        cells_arr = t.column("cell").to_numpy(zero_copy_only=False)
        zs, txs, tys = mercator.unpack_cell(cells_arr)
        out_bytes = []
        for k in range(len(cells_arr)):
            z, tx, ty = int(zs[k]), int(txs[k]), int(tys[k])
            minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
            res = (maxx - minx) / grid
            xs = minx + (np.arange(grid) + 0.5) * res
            ys = maxy - (np.arange(grid) + 0.5) * res
            out_bytes.append(field_value(xs[None, :], ys[:, None]).astype(np.float64).tobytes())
        return pa.table(
            {
                "cell": pa.array(cells_arr, pa.int64()),
                "z": pa.array(zs.astype(np.int64), pa.int64()),
                "x": pa.array(txs.astype(np.int64), pa.int64()),
                "y": pa.array(tys.astype(np.int64), pa.int64()),
                "grid_bytes": pa.array(out_bytes, pa.binary()),
            }
        )

    return distinct.map_batches(grids_batch, batch_format="pyarrow", batch_size=64)


def _node_hash(key: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big") >> 1


def _endpoint_keys(segs: np.ndarray) -> tuple[list[bytes], list[bytes]]:
    """Exact endpoint keys: (level-independent) packed (o, iy, ix,
    t-bits).  Caller scopes by level."""
    out = []
    for side in (0, 4):
        o = segs[:, side].astype(np.int64)
        iy = segs[:, side + 1].astype(np.int64)
        ix = segs[:, side + 2].astype(np.int64)
        tb = segs[:, side + 3].copy().view(np.int64)
        out.append(
            [struct.pack("<qqqq", o[i], iy[i], ix[i], tb[i]) for i in range(len(o))]
        )
    return out[0], out[1]


def _seg_lengths_mm(segs: np.ndarray, res_px: float) -> np.ndarray:
    """Canonical per-segment integer milli-meter lengths from the
    decomposed endpoints (frame-independent)."""
    o0, iy0, ix0, t0 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    o1, iy1, ix1, t1 = segs[:, 4], segs[:, 5], segs[:, 6], segs[:, 7]
    xf0 = np.where(o0 == 0, t0, 0.0)
    yf0 = np.where(o0 == 1, t0, 0.0)
    xf1 = np.where(o1 == 0, t1, 0.0)
    yf1 = np.where(o1 == 1, t1, 0.0)
    dx = (ix1 - ix0) + (xf1 - xf0)
    dy = (iy1 - iy0) + (yf1 - yf0)
    return np.floor(np.hypot(dx, dy) * res_px * 1000.0 + 0.5).astype(np.int64)


def chain_segments(segs: np.ndarray, res_px: float):
    """Chain segments into polylines by exact endpoint matching.
    Returns (chains, open_endpoints): chains = list of dicts
    (n_seg, len_mm, canon, open_keys [0 or 2 packed keys])."""
    n = len(segs)
    k0, k1 = _endpoint_keys(segs)
    lens = _seg_lengths_mm(segs, res_px)
    adj: dict[bytes, list[tuple[int, int]]] = {}
    for i in range(n):
        adj.setdefault(k0[i], []).append((i, 0))
        adj.setdefault(k1[i], []).append((i, 1))
    visited = np.zeros(n, dtype=bool)
    chains = []

    def walk(start_key: bytes):
        """Follow the chain from an endpoint key; returns stats."""
        total = 0
        count = 0
        canon = None
        key = start_key
        last = start_key
        while True:
            nxt = [e for e in adj[key] if not visited[e[0]]]
            if not nxt:
                break
            i, side = nxt[0]
            visited[i] = True
            total += int(lens[i])
            count += 1
            for kk in (k0[i], k1[i]):
                hsh = _node_hash(kk)
                if canon is None or hsh < canon:
                    canon = hsh
            key = k1[i] if side == 0 else k0[i]
            last = key
        return total, count, canon, last

    # open chains first (endpoints of degree 1)
    for key, ents in adj.items():
        if len(ents) != 1:
            continue
        i, _ = ents[0]
        if visited[i]:
            continue
        total, count, canon, last = walk(key)
        chains.append(
            dict(n_seg=count, len_mm=total, canon=canon, open_keys=[key, last])
        )
    # remaining are closed rings
    for i in range(n):
        if visited[i]:
            continue
        total, count, canon, _ = walk(k0[i])
        chains.append(dict(n_seg=count, len_mm=total, canon=canon, open_keys=[]))
    return chains


def _frag_xy(segs: np.ndarray):
    """Decomposed endpoints -> cartesian pixel coords (x0,y0,x1,y1)."""
    o0, iy0, ix0, t0 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    o1, iy1, ix1, t1 = segs[:, 4], segs[:, 5], segs[:, 6], segs[:, 7]
    x0 = ix0 + np.where(o0 == 0, t0, 0.0)
    y0 = iy0 + np.where(o0 == 1, t0, 0.0)
    x1 = ix1 + np.where(o1 == 0, t1, 0.0)
    y1 = iy1 + np.where(o1 == 1, t1, 0.0)
    return x0, y0, x1, y1


def _area_terms_milli(segs: np.ndarray) -> np.ndarray:
    """Per-DIRECTED-fragment trapezoid shoelace term, rounded to
    integer milli-px^2 so ring sums are accumulation-order independent:
    floor((x0+x1)*(y1-y0) * 1000/2 + 0.5).  With the region-on-left /
    y-down orientation convention, exterior rings sum NEGATIVE and
    holes POSITIVE."""
    x0, y0, x1, y1 = _frag_xy(segs)
    return np.floor((x0 + x1) * (y1 - y0) * 500.0 + 0.5).astype(np.int64)


def chain_directed(segs: np.ndarray, res_px: float, salt: bytes = b"",
                   collect_points: bool = False):
    """Chain DIRECTED fragments (start -> end) into maximal paths by
    exact endpoint matching.  Every endpoint key must be the start of
    at most one fragment and the end of at most one (degree > 2 means
    a degenerate 'pinch' node — raise rather than mis-stitch).

    `salt` scopes the canon node hashes (polygon mode salts with the
    BAND: the same iso line is emitted into both adjacent bands —
    as-is and reversed — with identical endpoint descriptors, so
    unsalted canons would collide across bands and the band-blind
    min-label CC would merge one band's ring into the other's).

    Returns chains: dicts (n_seg, len_mm, area_milli, canon,
    open_keys [start_key, end_key] or [] when locally closed; with
    ``collect_points`` also 'pts', the (n_seg+1, 2) pixel-space
    vertex run in walk order)."""
    n = len(segs)
    k0, k1 = _endpoint_keys(segs)
    lens = _seg_lengths_mm(segs, res_px)
    areas = _area_terms_milli(segs)
    if collect_points:
        px0, py0, px1, py1 = _frag_xy(segs)
    start: dict[bytes, int] = {}
    end_keys: set[bytes] = set()
    for i in range(n):
        if k0[i] in start:
            raise ValueError("contour polygons: duplicate fragment start key "
                             "(degenerate pinch node)")
        start[k0[i]] = i
        if k1[i] in end_keys:
            raise ValueError("contour polygons: duplicate fragment end key "
                             "(degenerate pinch node)")
        end_keys.add(k1[i])
    visited = np.zeros(n, dtype=bool)
    chains = []

    def walk(i0: int):
        total = 0
        count = 0
        area = 0
        canon = None
        pts: list | None = [(px0[i0], py0[i0])] if collect_points else None
        i = i0
        while True:
            visited[i] = True
            total += int(lens[i])
            area += int(areas[i])
            count += 1
            if pts is not None:
                pts.append((px1[i], py1[i]))
            for kk in (k0[i], k1[i]):
                hsh = _node_hash(salt + kk)
                if canon is None or hsh < canon:
                    canon = hsh
            nxt = start.get(k1[i])
            if nxt is None or visited[nxt]:
                return total, count, area, canon, k1[i], pts
            i = nxt

    # open chains first: heads are fragments whose start key is no
    # local fragment's end key
    for i in range(n):
        if visited[i] or k0[i] in end_keys:
            continue
        total, count, area, canon, last, pts = walk(i)
        chains.append(dict(n_seg=count, len_mm=total, area_milli=area,
                           canon=canon, open_keys=[k0[i], last], pts=pts))
    # remaining unvisited fragments belong to locally-closed rings
    for i in range(n):
        if visited[i]:
            continue
        total, count, area, canon, last, pts = walk(i)
        if last != k0[i]:
            raise ValueError("contour polygons: local ring did not close")
        chains.append(dict(n_seg=count, len_mm=total, area_milli=area,
                           canon=canon, open_keys=[], pts=pts))
    return chains


def _border_pieces(ext: np.ndarray, dom: np.ndarray, ex: dict,
                   gr0: int, gc0: int, levels, grid: int) -> np.ndarray:
    """Directed band-boundary pieces along the DOMAIN border owned by
    this cell, split at level crossings: (N, 9) rows of
    (band, o0,iy0,ix0,t0, o1,iy1,ix1,t1) with domain interior on the
    LEFT.  `dom` is the (grid,grid) in-domain mask of OWN squares;
    `ex` holds the 8-neighbor existence bits (pixel-space N/S/E/W/
    NE/SE/SW/NW).  Neighbor-square domain status across the cell
    border is derived from existence bits (covered cells have fully
    finite grids — asserted by the caller)."""
    g = grid
    rng = np.arange(g)
    inner = rng < g - 1
    padN = ex["N"] & (inner | (ex["NE"] & ex["E"]))   # per column c
    padS = ex["S"] & (inner | ex["SE"])               # per column c
    padW = ex["W"] & (inner | (ex["SW"] & ex["S"]))   # per row r
    padE = ex["E"] & (inner | ex["SE"])               # per row r

    nbr_n = np.vstack([padN[None, :], dom[:-1, :]])   # square (r-1, c)
    nbr_s = np.vstack([dom[1:, :], padS[None, :]])    # square (r+1, c)
    nbr_w = np.hstack([padW[:, None], dom[:, :-1]])   # square (r, c-1)
    nbr_e = np.hstack([dom[:, 1:], padE[:, None]])    # square (r, c+1)

    lv = np.asarray(levels, np.float64)
    out = []

    def edge_pieces(o, biy, bix, v0, v1, fwd):
        """Split one border edge (descriptor base (o,biy,bix), values
        v0 at the top/left node, v1 at the other) into band pieces."""
        crossings = []
        for L in lv:
            if (v0 >= L) != (v1 >= L):
                t = (L - v0) / (v1 - v0)
                if not (0.0 < t < 1.0):
                    raise ValueError(
                        "contour polygons: level crossing landed on a node")
                crossings.append(t)
        ts = [0.0] + sorted(crossings) + [1.0]
        for a, b in zip(ts[:-1], ts[1:]):
            vm = v0 + 0.5 * (a + b) * (v1 - v0)
            band = int(np.searchsorted(lv, vm, side="right"))

            def ep(t):
                if t == 0.0:
                    return (0.0, float(biy), float(bix), 0.0)
                if t == 1.0:
                    return (0.0, float(biy + (1 if o == 1 else 0)),
                            float(bix + (1 if o == 0 else 0)), 0.0)
                return (float(o), float(biy), float(bix), float(t))

            pa_, pb_ = (ep(a), ep(b)) if fwd else (ep(b), ep(a))
            out.append((float(band),) + pa_ + pb_)

    for mask, kind in ((dom & ~nbr_n, "n"), (dom & ~nbr_s, "s"),
                       (dom & ~nbr_w, "w"), (dom & ~nbr_e, "e")):
        ys, xs = np.nonzero(mask)
        for r, c in zip(ys.tolist(), xs.tolist()):
            if kind == "n":    # D below the edge -> walk -x
                edge_pieces(0, gr0 + r, gc0 + c,
                            ext[r, c], ext[r, c + 1], fwd=False)
            elif kind == "s":  # D above -> walk +x
                edge_pieces(0, gr0 + r + 1, gc0 + c,
                            ext[r + 1, c], ext[r + 1, c + 1], fwd=True)
            elif kind == "w":  # D east -> walk +y
                edge_pieces(1, gr0 + r, gc0 + c,
                            ext[r, c], ext[r + 1, c], fwd=True)
            else:              # east edge: D west -> walk -y
                edge_pieces(1, gr0 + r, gc0 + c + 1,
                            ext[r, c + 1], ext[r + 1, c + 1], fwd=False)
    if not out:
        return np.empty((0, 9), dtype=np.float64)
    return np.asarray(out, dtype=np.float64)


def contour_cells(cells, levels=LEVELS, grid: int = 64):
    """Cell grid rows -> stitched contour polylines Dataset."""
    from .polygonize import min_label_components
    from .tiles import _add_scatter

    levels = tuple(float(l) for l in levels)

    def emit_with_halo(t: pa.Table) -> pa.Table:
        rows = {"cell": [], "kind": [], "payload": [], "z": [], "x": [], "y": []}
        for r in range(t.num_rows):
            z = int(t.column("z")[r].as_py())
            tx = int(t.column("x")[r].as_py())
            ty = int(t.column("y")[r].as_py())
            gb = t.column("grid_bytes")[r].as_py()
            g = np.frombuffer(gb, dtype=np.float64).reshape(grid, grid)
            n = 1 << z
            rows["cell"].append(int(mercator.pack_cell(z, tx, ty)))
            rows["kind"].append("own")
            rows["payload"].append(gb)
            rows["z"].append(z)
            rows["x"].append(tx)
            rows["y"].append(ty)
            # top row -> north neighbor (its south halo); first col ->
            # west neighbor (its east halo); corner -> northwest
            for kind, dx, dy, payload in (
                ("row", 0, 1, g[0, :].tobytes()),
                ("col", -1, 0, g[:, 0].tobytes()),
                ("cor", -1, 1, g[0, 0].tobytes()),
            ):
                nx, ny = tx + dx, ty + dy
                if 0 <= nx < n and 0 <= ny < n:
                    rows["cell"].append(int(mercator.pack_cell(z, nx, ny)))
                    rows["kind"].append(kind)
                    rows["payload"].append(payload)
                    rows["z"].append(z)
                    rows["x"].append(nx)
                    rows["y"].append(ny)
        return pa.table(
            {
                "cell": pa.array(rows["cell"], pa.int64()),
                "kind": pa.array(rows["kind"], pa.string()),
                "payload": pa.array(rows["payload"], pa.binary()),
                "z": pa.array(rows["z"], pa.int32()),
                "x": pa.array(rows["x"], pa.int32()),
                "y": pa.array(rows["y"], pa.int32()),
            }
        )

    def fragments_group(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        if "own" not in kinds:
            return _empty_frag_table()
        z = int(g.column("z")[0].as_py())
        tx = int(g.column("x")[0].as_py())
        ty = int(g.column("y")[0].as_py())
        nt = 1 << z
        res_px = float(mercator.resolution(z)) * 256.0 / grid
        ext = np.full((grid + 1, grid + 1), np.nan)
        for r, kind in enumerate(kinds):
            pl = g.column("payload")[r].as_py()
            if kind == "own":
                ext[:grid, :grid] = np.frombuffer(pl, dtype=np.float64).reshape(
                    grid, grid
                )
            elif kind == "row":  # south neighbor's top row
                ext[grid, :grid] = np.frombuffer(pl, dtype=np.float64)
            elif kind == "col":  # east neighbor's first column
                ext[:grid, grid] = np.frombuffer(pl, dtype=np.float64)
            else:  # corner
                ext[grid, grid] = np.frombuffer(pl, dtype=np.float64)[0]
        gr0 = (nt - 1 - ty) * grid
        gc0 = tx * grid
        out = {
            "level": [], "node": [], "n_seg": [], "len_mm": [],
            "closed": [], "ep1": [], "ep2": [],
        }
        for level in levels:
            segs = marching_squares_desc(ext, level)
            if len(segs) == 0:
                continue
            segs[:, 1] += gr0
            segs[:, 2] += gc0
            segs[:, 5] += gr0
            segs[:, 6] += gc0
            for ch in chain_segments(segs, res_px):
                out["level"].append(int(level))
                out["node"].append(ch["canon"])
                out["n_seg"].append(ch["n_seg"])
                out["len_mm"].append(ch["len_mm"])
                out["closed"].append(len(ch["open_keys"]) == 0)
                out["ep1"].append(ch["open_keys"][0] if ch["open_keys"] else b"")
                out["ep2"].append(ch["open_keys"][1] if ch["open_keys"] else b"")
        return pa.table(
            {
                "level": pa.array(out["level"], pa.int64()),
                "node": pa.array(out["node"], pa.int64()),
                "n_seg": pa.array(out["n_seg"], pa.int64()),
                "len_mm": pa.array(out["len_mm"], pa.int64()),
                "closed": pa.array(out["closed"], pa.bool_()),
                "ep1": pa.array(out["ep1"], pa.binary()),
                "ep2": pa.array(out["ep2"], pa.binary()),
            }
        )

    def _empty_frag_table() -> pa.Table:
        return pa.table(
            {
                "level": pa.array([], pa.int64()),
                "node": pa.array([], pa.int64()),
                "n_seg": pa.array([], pa.int64()),
                "len_mm": pa.array([], pa.int64()),
                "closed": pa.array([], pa.bool_()),
                "ep1": pa.array([], pa.binary()),
                "ep2": pa.array([], pa.binary()),
            }
        )

    scattered = cells.map_batches(emit_with_halo, batch_format="pyarrow").map_batches(
        _add_scatter, batch_format="pyarrow"
    )
    from .polygonize import _materialize_detached

    frags = _materialize_detached(
        scattered.groupby("__scatter").map_groups(
            fragments_group, batch_format="pyarrow"
        )
    )

    def _only(closed_val: bool):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column("closed"), pa.scalar(closed_val)))

        fn.__name__ = f"closed_{closed_val}"
        return fn

    closed_rings = frags.map_batches(_only(True), batch_format="pyarrow").select_columns(
        ["level", "node", "n_seg", "len_mm"]
    )
    open_frags = frags.map_batches(_only(False), batch_format="pyarrow")

    # endpoint table: one row per open endpoint, keyed (level, key)
    def endpoints(t: pa.Table) -> pa.Table:
        lvs = t.column("level").to_pylist()
        nodes = t.column("node").to_pylist()
        e1 = t.column("ep1").to_pylist()
        e2 = t.column("ep2").to_pylist()
        key, node = [], []
        for r in range(t.num_rows):
            pfx = struct.pack("<q", lvs[r])
            key.append(pfx + e1[r])
            key.append(pfx + e2[r])
            node.append(nodes[r])
            node.append(nodes[r])
        return pa.table(
            {
                "key": pa.array(key, pa.binary()),
                "node": pa.array(node, pa.int64()),
            }
        )

    eps = open_frags.map_batches(endpoints, batch_format="pyarrow")

    # vectorized endpoint matching: per endpoint-key count + min/max
    # node (hash aggregate); count==2 -> pair, count==1 -> unmatched
    from ray.data.aggregate import Count, Max, Min, Sum

    ep_stats = (
        eps.groupby("key")
        .aggregate(
            Count(alias_name="n"),
            Min("node", alias_name="mn"),
            Max("node", alias_name="mx"),
        )
    )
    ep_stats = _materialize_detached(ep_stats)

    def to_pairs(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        if (n > 2).any():
            # each decomposed endpoint descriptor (orientation, cell,
            # t-bits) identifies ONE crossing shared by at most the two
            # fragments on either side; 3+ would mean the marching-
            # squares decomposition emitted a duplicate crossing and
            # pairing min/max would silently drop the middle node
            bad = int((n > 2).sum())
            raise ValueError(
                f"contour stitch: {bad} endpoint keys carry >2 fragments"
            )
        two = t.filter(pa.array(n >= 2))
        return pa.table({"a": two.column("mn"), "b": two.column("mx")})

    def to_unmatched(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        one = t.filter(pa.array(n == 1))
        return pa.table({"node": one.column("mn")})

    from .polygonize import _materialize_detached as _mat

    pairs = ep_stats.map_batches(to_pairs, batch_format="pyarrow")
    unmatched = _mat(ep_stats.map_batches(to_unmatched, batch_format="pyarrow"))
    labels = min_label_components(pairs)
    open_count = open_frags.count()
    unm_count = unmatched.count()

    # vectorized relabel: left-join the root-label table onto fragment
    # rows and unmatched-endpoint rows; null label -> the node itself
    def _with_root(ds, node_col="node"):
        if labels is None:
            def self_root(t: pa.Table) -> pa.Table:
                return t.append_column("root", t.column(node_col))

            return ds.map_batches(self_root, batch_format="pyarrow")
        n_lab = labels.count()
        parts_n = max(1, n_lab // 50_000)
        renamed = labels.map_batches(
            lambda t: pa.table({node_col: t.column("node"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        joined = ds.join(
            renamed, join_type="left_outer", num_partitions=parts_n, on=(node_col,)
        )

        def pick(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            root = pc.coalesce(t.column("label"), t.column(node_col))
            return t.drop_columns(["label"]).append_column("root", root)

        return joined.map_batches(pick, batch_format="pyarrow")

    frag_stats = _with_root(
        open_frags.select_columns(["level", "node", "n_seg", "len_mm"])
    ).map_batches(
        lambda t: pa.table(
            {
                "root": t.column("root"),
                "level": t.column("level"),
                "n_seg": t.column("n_seg"),
                "len_mm": t.column("len_mm"),
                "unm": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    unm_stats = _with_root(unmatched).map_batches(
        lambda t: pa.table(
            {
                "root": t.column("root"),
                "level": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                "n_seg": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "len_mm": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "unm": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    stats_in = frag_stats.union(unm_stats) if unm_count else frag_stats
    merged = (
        stats_in
        .groupby("root")
        .aggregate(
            Max("level", alias_name="level"),  # every root has >=1 real fragment
            Sum("n_seg", alias_name="n_segments"),
            Sum("len_mm", alias_name="length_mm"),
            Sum("unm", alias_name="unm"),
        )
    )

    def shape_merged(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "level": t.column("level"),
                "comp_id": t.column("root"),
                "n_segments": t.column("n_segments"),
                "length_mm": t.column("length_mm"),
                "closed": pc.equal(t.column("unm"), pa.scalar(0, pa.int64())),
            }
        )

    def shape_closed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "level": t.column("level"),
                "comp_id": t.column("node"),
                "n_segments": t.column("n_seg"),
                "length_mm": t.column("len_mm"),
                "closed": pa.array([True] * t.num_rows),
            }
        )

    closed_ds = closed_rings.map_batches(shape_closed, batch_format="pyarrow")
    if open_count == 0:
        return closed_ds
    return merged.map_batches(shape_merged, batch_format="pyarrow").union(closed_ds)


def _poly_frag_stage(cells, levels, grid: int, with_points: bool = False,
                     expect_zoom: int | None = None):
    """Shared fragment stage of the polygon modes: one groupby(cell)
    shuffle carrying grids + halos + 8-neighbor existence bits, per-
    cell directed fragment generation (iso + domain border) and local
    chaining.  Returns (frags Dataset, n_bands); ``with_points`` adds
    a 'pts' binary column (float64 (x,y) pixel vertex runs in walk
    order) for geometry emission."""
    from .polygonize import _materialize_detached
    from .tiles import _add_scatter
    from ..functions.contour_ms import marching_squares_desc_dir

    # bands index the SORTED unique levels (searchsorted + the i/i+1
    # iso assignment both assume strict ascending order)
    levels = tuple(sorted({float(l) for l in levels}))
    if not levels:
        raise ValueError("contour polygons: need >= 1 level")
    n_bands = len(levels) + 1

    def emit_with_halo_ex(t: pa.Table) -> pa.Table:
        rows = {"cell": [], "kind": [], "payload": [], "z": [], "x": [], "y": []}
        for r in range(t.num_rows):
            z = int(t.column("z")[r].as_py())
            tx = int(t.column("x")[r].as_py())
            ty = int(t.column("y")[r].as_py())
            gb = t.column("grid_bytes")[r].as_py()
            g = np.frombuffer(gb, dtype=np.float64).reshape(grid, grid)
            n = 1 << z
            rows["cell"].append(int(mercator.pack_cell(z, tx, ty)))
            rows["kind"].append("own")
            rows["payload"].append(gb)
            rows["z"].append(z)
            rows["x"].append(tx)
            rows["y"].append(ty)
            sends = [
                ("row", 0, 1, g[0, :].tobytes()),
                ("col", -1, 0, g[:, 0].tobytes()),
                ("cor", -1, 1, g[0, 0].tobytes()),
            ]
            # existence markers to all 8 neighbors: payload = sender's
            # tile offset relative to the receiver
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    sends.append(("ex", dx, dy, struct.pack("<bb", -dx, -dy)))
            for kind, dx, dy, payload in sends:
                nx, ny = tx + dx, ty + dy
                if 0 <= nx < n and 0 <= ny < n:
                    rows["cell"].append(int(mercator.pack_cell(z, nx, ny)))
                    rows["kind"].append(kind)
                    rows["payload"].append(payload)
                    rows["z"].append(z)
                    rows["x"].append(nx)
                    rows["y"].append(ny)
        return pa.table(
            {
                "cell": pa.array(rows["cell"], pa.int64()),
                "kind": pa.array(rows["kind"], pa.string()),
                "payload": pa.array(rows["payload"], pa.binary()),
                "z": pa.array(rows["z"], pa.int32()),
                "x": pa.array(rows["x"], pa.int32()),
                "y": pa.array(rows["y"], pa.int32()),
            }
        )

    def _empty_poly_frag_table() -> pa.Table:
        cols = {
            "band": pa.array([], pa.int64()),
            "node": pa.array([], pa.int64()),
            "n_seg": pa.array([], pa.int64()),
            "len_mm": pa.array([], pa.int64()),
            "area_milli": pa.array([], pa.int64()),
            "closed": pa.array([], pa.bool_()),
            "ep1": pa.array([], pa.binary()),
            "ep2": pa.array([], pa.binary()),
        }
        if with_points:
            cols["pts"] = pa.array([], pa.binary())
        return pa.table(cols)

    def poly_fragments_group(g: pa.Table) -> pa.Table:
        kinds = g.column("kind").to_pylist()
        if "own" not in kinds:
            return _empty_poly_frag_table()
        z = int(g.column("z")[0].as_py())
        if expect_zoom is not None and z != expect_zoom:
            # a caller-supplied zoom that disagrees with the cells'
            # own z would silently mis-scale/mis-place the WKB rings
            # while the stats columns stay plausible — fail loudly
            raise ValueError(
                f"contour polygons: cell z={z} != caller zoom="
                f"{expect_zoom} (pixel->meter conversion would be wrong)")
        tx = int(g.column("x")[0].as_py())
        ty = int(g.column("y")[0].as_py())
        nt = 1 << z
        res_px = float(mercator.resolution(z)) * 256.0 / grid
        ext = np.full((grid + 1, grid + 1), np.nan)
        # pixel-space existence: tile +y is pixel NORTH
        ex = {k: False for k in ("N", "S", "E", "W", "NE", "NW", "SE", "SW")}
        _DIR = {(1, 0): "E", (-1, 0): "W", (0, 1): "N", (0, -1): "S",
                (1, 1): "NE", (1, -1): "SE", (-1, 1): "NW", (-1, -1): "SW"}
        for r, kind in enumerate(kinds):
            pl = g.column("payload")[r].as_py()
            if kind == "own":
                own = np.frombuffer(pl, dtype=np.float64).reshape(grid, grid)
                if not np.isfinite(own).all():
                    raise ValueError(
                        "contour polygons: covered cell with non-finite grid")
                ext[:grid, :grid] = own
            elif kind == "row":
                ext[grid, :grid] = np.frombuffer(pl, dtype=np.float64)
            elif kind == "col":
                ext[:grid, grid] = np.frombuffer(pl, dtype=np.float64)
            elif kind == "cor":
                ext[grid, grid] = np.frombuffer(pl, dtype=np.float64)[0]
            else:  # ex
                ox, oy = struct.unpack("<bb", pl)
                ex[_DIR[(ox, oy)]] = True
        # COVERAGE PRECONDITION (documented): no diagonal-only
        # adjacency.  A neighbor cell touching ONLY at a corner (e.g.
        # NE covered while N and E are not) makes that domain corner a
        # 4-edge pinch node of the band boundary; the exact endpoint
        # chaining (chain_directed) is degree-<=2 by construction and
        # would abort deep in the run with a misleading 'degenerate
        # pinch node'.  The reference's polygon_ring_appender resolves
        # such touch points by a turn rule; this engine instead
        # requires edge-connected coverage (every mosaic fixture is a
        # full rectangle of cells) and fails loudly up front here.
        for dia, (s1, s2) in (("NE", ("N", "E")), ("NW", ("N", "W")),
                              ("SE", ("S", "E")), ("SW", ("S", "W"))):
            if ex[dia] and not (ex[s1] or ex[s2]):
                raise ValueError(
                    f"contour polygons: diagonal-only covered neighbor "
                    f"{dia} at cell z={z} x={tx} y={ty} — corner touch "
                    "points (pinch nodes) are unsupported; coverage "
                    "must be edge-connected")
        gr0 = (nt - 1 - ty) * grid
        gc0 = tx * grid
        # value fudge (marching_squares/utility.h:30-47 discipline):
        # nodes within 1e-6 of a level shift up by 1e-6 so no crossing
        # ever lands EXACTLY on a node (t==0/1 descriptors would fail
        # seam pairing); a pure function of (value, levels), so halo
        # copies fudge identically on both sides of a border.  (The
        # reference exempts the raster-minimum level; value-side
        # fudging here keeps every band boundary strictly off-node.)
        for L in levels:
            near = np.abs(ext - L) < 1e-6
            if near.any():
                ext[near] += 1e-6
        fin = np.isfinite(ext)
        dom = fin[:-1, :-1] & fin[:-1, 1:] & fin[1:, :-1] & fin[1:, 1:]

        band_frags: list[list[np.ndarray]] = [[] for _ in range(n_bands)]
        for i, L in enumerate(levels):
            segs = marching_squares_desc_dir(ext, L)
            if len(segs) == 0:
                continue
            segs[:, 1] += gr0
            segs[:, 2] += gc0
            segs[:, 5] += gr0
            segs[:, 6] += gc0
            band_frags[i + 1].append(segs)          # lower bound: as-is
            band_frags[i].append(                   # upper bound: reversed
                np.concatenate([segs[:, 4:8], segs[:, 0:4]], axis=1))
        borders = _border_pieces(ext, dom, ex, gr0, gc0, levels, grid)
        for b in range(n_bands):
            sel = borders[borders[:, 0] == b, 1:9] if len(borders) else None
            if sel is not None and len(sel):
                band_frags[b].append(sel)

        out = {k: [] for k in ("band", "node", "n_seg", "len_mm",
                               "area_milli", "closed", "ep1", "ep2", "pts")}
        for b in range(n_bands):
            if not band_frags[b]:
                continue
            frags = np.concatenate(band_frags[b], axis=0)
            for ch in chain_directed(frags, res_px,
                                     salt=struct.pack("<q", b),
                                     collect_points=with_points):
                out["band"].append(b)
                out["node"].append(ch["canon"])
                out["n_seg"].append(ch["n_seg"])
                out["len_mm"].append(ch["len_mm"])
                out["area_milli"].append(ch["area_milli"])
                out["closed"].append(len(ch["open_keys"]) == 0)
                out["ep1"].append(ch["open_keys"][0] if ch["open_keys"] else b"")
                out["ep2"].append(ch["open_keys"][1] if ch["open_keys"] else b"")
                if with_points:
                    out["pts"].append(
                        np.asarray(ch["pts"], np.float64).tobytes())
        cols = {
            "band": pa.array(out["band"], pa.int64()),
            "node": pa.array(out["node"], pa.int64()),
            "n_seg": pa.array(out["n_seg"], pa.int64()),
            "len_mm": pa.array(out["len_mm"], pa.int64()),
            "area_milli": pa.array(out["area_milli"], pa.int64()),
            "closed": pa.array(out["closed"], pa.bool_()),
            "ep1": pa.array(out["ep1"], pa.binary()),
            "ep2": pa.array(out["ep2"], pa.binary()),
        }
        if with_points:
            cols["pts"] = pa.array(out["pts"], pa.binary())
        return pa.table(cols)

    scattered = cells.map_batches(
        emit_with_halo_ex, batch_format="pyarrow"
    ).map_batches(_add_scatter, batch_format="pyarrow")
    frags = _materialize_detached(
        scattered.groupby("__scatter").map_groups(
            poly_fragments_group, batch_format="pyarrow"
        )
    )
    return frags, n_bands


def _poly_seam_labels(open_frags):
    """Seam pairing shared by both polygon output modes: one row per
    open-chain endpoint keyed (band | endpoint descriptor), each key
    must carry exactly one chain START and one chain END (polygon band
    boundaries always close — anything else is a mis-stitch and
    raises); min-label CC over the resulting chain pairs.  Returns the
    (node, label) Dataset, or None when there are no pairs."""
    from .polygonize import _materialize_detached, min_label_components

    def endpoints(t: pa.Table) -> pa.Table:
        bands = t.column("band").to_pylist()
        nodes = t.column("node").to_pylist()
        e1 = t.column("ep1").to_pylist()
        e2 = t.column("ep2").to_pylist()
        key, node, role = [], [], []
        for r in range(t.num_rows):
            pfx = struct.pack("<q", bands[r])
            key.append(pfx + e1[r])
            role.append(1)
            key.append(pfx + e2[r])
            role.append(0)
            node.append(nodes[r])
            node.append(nodes[r])
        return pa.table(
            {
                "key": pa.array(key, pa.binary()),
                "node": pa.array(node, pa.int64()),
                "role": pa.array(role, pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Max, Min, Sum

    ep_stats = _materialize_detached(
        open_frags.map_batches(endpoints, batch_format="pyarrow")
        .groupby("key")
        .aggregate(
            Count(alias_name="n"),
            Min("node", alias_name="mn"),
            Max("node", alias_name="mx"),
            Sum("role", alias_name="rs"),
        )
    )

    def to_pairs(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        rs = t.column("rs").to_numpy(zero_copy_only=False)
        if (n != 2).any() or (rs != 1).any():
            bad = int(((n != 2) | (rs != 1)).sum())
            raise ValueError(
                f"contour polygons: {bad} seam endpoints failed to pair "
                "one chain start with one chain end (unclosed boundary)")
        return pa.table({"a": t.column("mn"), "b": t.column("mx")})

    return min_label_components(
        ep_stats.map_batches(to_pairs, batch_format="pyarrow"))


def contour_polygon_cells(cells, levels=LEVELS, grid: int = 64):
    """Contour POLYGONS (``gdal_contour -p``; alg/contour.cpp polygon
    mode + alg/marching_squares/polygon_ring_appender.h semantics,
    distributed): the value range is partitioned into bands
    ``(-inf, L0), [L0, L1), ..., [Lk, +inf)`` and each band's region
    boundary is emitted as closed rings with sub-pixel crossings —
    DIRECTED iso segments at the band's bounding levels (region on the
    left) plus band sub-pieces of the mosaic's DOMAIN-border edges,
    stitched across cells by the same exact endpoint matching +
    min-label CC the line mode uses.

    Domain = union of node-grid unit squares whose 4 corners exist;
    border edges owned across cells are decided from 8-neighbor cell
    existence bits carried through the one groupby(cell) shuffle
    (covered cells have fully finite grids — asserted).

    Output rows: band:int64 (0..k), comp_id:int64 (min band-salted
    endpoint hash over the ring), n_segments:int64, length_mm:int64
    (perimeter), area_px2_milli:int64 (signed trapezoid sum; with
    region-on-left / y-down, EXTERIOR rings are negative and HOLES
    positive — the sign is the ring role, GDAL's winding-number
    nesting restated).  See :func:`contour_polygon_rings` for the
    WKB-geometry-emitting variant."""
    frags, n_bands = _poly_frag_stage(cells, levels, grid)

    def _only(closed_val: bool):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column("closed"), pa.scalar(closed_val)))

        fn.__name__ = f"pclosed_{closed_val}"
        return fn

    closed_rings = frags.map_batches(
        _only(True), batch_format="pyarrow"
    ).select_columns(["band", "node", "n_seg", "len_mm", "area_milli"])
    open_frags = frags.map_batches(_only(False), batch_format="pyarrow")

    from ray.data.aggregate import Max, Sum

    labels = _poly_seam_labels(open_frags)
    open_count = open_frags.count()

    def _with_root(ds):
        if labels is None or open_count == 0:
            def self_root(t: pa.Table) -> pa.Table:
                return t.append_column("root", t.column("node"))

            return ds.map_batches(self_root, batch_format="pyarrow")
        n_lab = labels.count()
        parts_n = max(1, n_lab // 50_000)
        renamed = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("label")}),
            batch_format="pyarrow",
        )
        joined = ds.join(renamed, join_type="left_outer",
                         num_partitions=parts_n, on=("node",))

        def pick(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            root = pc.coalesce(t.column("label"), t.column("node"))
            return t.drop_columns(["label"]).append_column("root", root)

        return joined.map_batches(pick, batch_format="pyarrow")

    def shape_closed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": t.column("band"),
                "comp_id": t.column("node"),
                "n_segments": t.column("n_seg"),
                "length_mm": t.column("len_mm"),
                "area_px2_milli": t.column("area_milli"),
            }
        )

    closed_ds = closed_rings.map_batches(shape_closed, batch_format="pyarrow")
    if open_count == 0:
        return closed_ds

    merged = (
        _with_root(open_frags.select_columns(
            ["band", "node", "n_seg", "len_mm", "area_milli"]))
        .groupby("root")
        .aggregate(
            Max("band", alias_name="band"),
            Sum("n_seg", alias_name="n_segments"),
            Sum("len_mm", alias_name="length_mm"),
            Sum("area_milli", alias_name="area_px2_milli"),
        )
    )

    def shape_merged(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": t.column("band"),
                "comp_id": t.column("root"),
                "n_segments": t.column("n_segments"),
                "length_mm": t.column("length_mm"),
                "area_px2_milli": t.column("area_px2_milli"),
            }
        )

    return merged.map_batches(shape_merged, batch_format="pyarrow").union(closed_ds)


def contour_polygon_rings(cells, levels=LEVELS, grid: int = 64,
                          zoom: int = 8, num_partitions: int = 16):
    """Contour polygon RING GEOMETRIES — the WKB output surface of
    ``gdal_contour -p`` (contour_polygon_cells emits the deterministic
    ring STATISTICS the golden gate checks; this variant emits the
    actual geometry): one WKB POLYGON per ring (single ring, EPSG:3857
    meters, region-on-left vertex order; the signed area column tells
    exterior (<0) from hole (>0) so consumers can nest rings).

    Cross-cell rings assemble in ONE ``map_groups`` over the CC root:
    each group holds exactly one ring's chains (bounded by the number
    of cells the ring touches), ordered by following each chain's end
    key to the next chain's start key.  Coordinate payloads ride the
    shuffles — inherent to geometry output; everything else matches
    the stats mode's one-shuffle plan.  All cells must share ``zoom``
    (the fixture field's contract) for the pixel->meter conversion."""
    from ..functions.geom import wkb_polygon

    res_px = float(mercator.resolution(zoom)) * 256.0 / grid
    origin = mercator.ORIGIN_SHIFT

    def to_meters(pts_px: np.ndarray) -> np.ndarray:
        out = np.empty_like(pts_px)
        out[:, 0] = -origin + (pts_px[:, 0] + 0.5) * res_px
        out[:, 1] = origin - (pts_px[:, 1] + 0.5) * res_px
        return out

    frags, n_bands = _poly_frag_stage(cells, levels, grid, with_points=True,
                                      expect_zoom=zoom)

    def _only(closed_val: bool):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t.column("closed"), pa.scalar(closed_val)))

        fn.__name__ = f"rclosed_{closed_val}"
        return fn

    def shape_closed(t: pa.Table) -> pa.Table:
        wkbs = []
        for blob in t.column("pts").to_pylist():
            ring = to_meters(np.frombuffer(blob, np.float64).reshape(-1, 2))
            wkbs.append(wkb_polygon([ring]))
        return pa.table(
            {
                "band": t.column("band"),
                "comp_id": t.column("node"),
                "n_points": pa.array(
                    [len(b) // 16 for b in t.column("pts").to_pylist()],
                    pa.int64()),
                "area_px2_milli": t.column("area_milli"),
                "wkb": pa.array(wkbs, pa.binary()),
            }
        )

    closed_ds = frags.map_batches(
        _only(True), batch_format="pyarrow"
    ).map_batches(shape_closed, batch_format="pyarrow")

    open_frags = frags.map_batches(_only(False), batch_format="pyarrow")
    open_count = open_frags.count()
    if open_count == 0:
        return closed_ds

    labels = _poly_seam_labels(open_frags)

    open_sel = open_frags.select_columns(
        ["band", "node", "n_seg", "area_milli", "ep1", "ep2", "pts"])
    if labels is None:
        with_root = open_sel.map_batches(
            lambda t: t.append_column("root", t.column("node")),
            batch_format="pyarrow",
        )
    else:
        renamed = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": t.column("label")}),
            batch_format="pyarrow",
        )
        joined = open_sel.join(
            renamed, join_type="left_outer",
            num_partitions=num_partitions, on=("node",),
        )

        def pick(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            root = pc.coalesce(t.column("label"), t.column("node"))
            return t.drop_columns(["label"]).append_column("root", root)

        with_root = joined.map_batches(pick, batch_format="pyarrow")

    def assemble(g: pa.Table) -> pa.Table:
        e1 = g.column("ep1").to_pylist()
        e2 = g.column("ep2").to_pylist()
        blobs = g.column("pts").to_pylist()
        start = {}
        for i, k in enumerate(e1):
            if k in start:
                raise ValueError(
                    "contour polygon rings: duplicate chain start in ring")
            start[k] = i
        run = [0]
        nxt = start.get(e2[0])
        while nxt is not None and nxt != 0:
            run.append(nxt)
            nxt = start.get(e2[nxt])
        if len(run) != g.num_rows or nxt != 0:
            raise ValueError(
                "contour polygon rings: ring chains did not close "
                f"({len(run)} of {g.num_rows} walked)")
        parts = [np.frombuffer(blobs[run[0]], np.float64).reshape(-1, 2)]
        for i in run[1:]:
            parts.append(
                np.frombuffer(blobs[i], np.float64).reshape(-1, 2)[1:])
        ring = np.concatenate(parts, axis=0)
        if not (ring[0] == ring[-1]).all():
            raise ValueError("contour polygon rings: assembled ring open")
        area = int(g.column("area_milli").to_numpy(
            zero_copy_only=False).sum())
        return pa.table(
            {
                "band": pa.array([int(g.column("band")[0].as_py())],
                                 pa.int64()),
                "comp_id": pa.array(
                    [int(g.column("root")[0].as_py())], pa.int64()),
                "n_points": pa.array([len(ring)], pa.int64()),
                "area_px2_milli": pa.array([area], pa.int64()),
                "wkb": pa.array([wkb_polygon([to_meters(ring)])],
                                pa.binary()),
            }
        )

    merged = with_root.groupby("root").map_groups(
        assemble, batch_format="pyarrow"
    )
    return merged.union(closed_ds)
