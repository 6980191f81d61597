"""kNN lookup — concentric cell-ring expansion (+ broadcast baseline).

Reference analog: quadtree-accelerated nearest-neighbor searches
feeding interpolators (alg/gdalgrid.cpp:853 GDALGridNearestNeighbor,
quadtree search :260-276) and point queries
(alg/gdal_interpolateatpoint.cpp:415).  SURVEY.md §2.4 maps these to
cell-ring expansion: candidates come from the probe's cell plus the
ring of neighbors; a probe is *resolved* when it has >= k candidates
and the kth distance is no farther than the nearest unexplored cell
(the ring lower bound); unresolved probes (tiny fraction) fall back to
an exact broadcast pass.

Ties broken by site id ascending (deterministic, FIXTURES.md rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import mercator
from .cells import assign_point_cells


def _topk_per_point(d2: np.ndarray, sids: np.ndarray, k: int):
    """Smallest-k by (d2, sid)."""
    order = np.lexsort((sids, d2))[:k]
    return order


def knn_broadcast(points, sites_table: pa.Table, k: int = 5, site_chunk: int = 65536):
    """Exact kNN baseline: broadcast the sites once (ray.put), probe per
    batch with chunked numpy distance matrices.  Output: pid, sid, rank
    (1-based), d2."""
    import ray

    sx = sites_table.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
    sy = sites_table.column("y").to_numpy(zero_copy_only=False).astype(np.float64)
    sid = sites_table.column("sid").to_numpy(zero_copy_only=False).astype(np.int64)
    ref = ray.put((sx, sy, sid))

    def fn(t: pa.Table) -> pa.Table:
        sx, sy, sid = ray.get(ref)
        px = t.column("x").to_numpy(zero_copy_only=False)
        py = t.column("y").to_numpy(zero_copy_only=False)
        pid = t.column("pid").to_numpy(zero_copy_only=False)
        n = len(px)
        # distance matrix in site chunks with running top-k
        best_d2 = np.full((n, k), np.inf)
        best_sid = np.full((n, k), np.iinfo(np.int64).max, dtype=np.int64)
        for c0 in range(0, len(sx), site_chunk):
            cx = sx[c0 : c0 + site_chunk]
            cy = sy[c0 : c0 + site_chunk]
            cid = sid[c0 : c0 + site_chunk]
            d2 = (px[:, None] - cx[None, :]) ** 2 + (py[:, None] - cy[None, :]) ** 2
            # merge chunk top-k with running top-k
            m = min(k, d2.shape[1])
            part = np.argpartition(d2, m - 1, axis=1)[:, :m]
            cand_d2 = np.concatenate([best_d2, np.take_along_axis(d2, part, 1)], axis=1)
            cand_sid = np.concatenate([best_sid, cid[part]], axis=1)
            order = np.lexsort((cand_sid, cand_d2), axis=1)[:, :k]
            best_d2 = np.take_along_axis(cand_d2, order, 1)
            best_sid = np.take_along_axis(cand_sid, order, 1)
        valid = np.isfinite(best_d2)
        ranks = np.broadcast_to(np.arange(1, k + 1), best_d2.shape)
        pids = np.broadcast_to(pid[:, None], best_d2.shape)
        return pa.table(
            {
                "pid": pa.array(pids[valid].astype(np.int64), pa.int64()),
                "sid": pa.array(best_sid[valid], pa.int64()),
                "rank": pa.array(ranks[valid].astype(np.int32), pa.int32()),
                "d2": pa.array(best_d2[valid], pa.float64()),
            }
        )

    fn.__name__ = f"knn_broadcast_k{k}"
    return points.map_batches(fn, batch_format="pyarrow")


def _topk_by_pid(pairs, k: int, zoom: int, cell_size: float, r: int,
                 world_edges: bool, full: bool, num_partitions: int):
    """Per-probe (d2, sid)-ordered top-k with the ring-lower-bound
    resolution flag, grouped by a hash PART of pid — one vectorized
    group call per partition instead of one Python call per probe.

    Resolution semantics preserved exactly: resolved iff the run has
    >= k candidates and the kth distance is STRICTLY inside the
    (2r+1)x(2r+1) block edge distance; with ``world_edges`` a block
    side at the world boundary contributes +inf (no cells beyond it);
    ``full`` short-circuits every run to resolved."""

    def add_part(t: pa.Table) -> pa.Table:
        p = t.column("pid").to_numpy(zero_copy_only=False).astype(np.uint64)
        p = (p ^ (p >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        p = p ^ (p >> np.uint64(33))
        return t.append_column(
            "__ppart",
            pa.array((p % np.uint64(num_partitions)).astype(np.int64),
                     pa.int64()),
        )

    n_grid = 1 << zoom

    def topk_part(g: pa.Table) -> pa.Table:
        px = g.column("x").to_numpy(zero_copy_only=False)
        py = g.column("y").to_numpy(zero_copy_only=False)
        sx = g.column("x_s").to_numpy(zero_copy_only=False)
        sy = g.column("y_s").to_numpy(zero_copy_only=False)
        sid = g.column("sid").to_numpy(zero_copy_only=False)
        pid = g.column("pid").to_numpy(zero_copy_only=False)
        d2 = (px - sx) ** 2 + (py - sy) ** 2
        order = np.lexsort((sid, d2, pid))
        pid_s, d2_s, sid_s = pid[order], d2[order], sid[order]
        n = len(order)
        new = np.concatenate([[True], pid_s[1:] != pid_s[:-1]])
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, n))
        rank = np.arange(n) - np.repeat(starts, run_len)
        keep = rank < k
        # per-run ring lower bound from the probe coordinates
        px0 = px[order][starts]
        py0 = py[order][starts]
        tx, ty = mercator.meters_to_tile(px0, py0, zoom)
        bminx = (tx - r).astype(np.float64) * cell_size - mercator.ORIGIN_SHIFT
        bminy = (ty - r).astype(np.float64) * cell_size - mercator.ORIGIN_SHIFT
        bmaxx = bminx + (2 * r + 1) * cell_size
        bmaxy = bminy + (2 * r + 1) * cell_size
        s1, s2 = px0 - bminx, bmaxx - px0
        s3, s4 = py0 - bminy, bmaxy - py0
        if world_edges:
            s1 = np.where(tx - r > 0, s1, np.inf)
            s2 = np.where(tx + r < n_grid - 1, s2, np.inf)
            s3 = np.where(ty - r > 0, s3, np.inf)
            s4 = np.where(ty + r < n_grid - 1, s4, np.inf)
        edge = np.minimum(np.minimum(s1, s2), np.minimum(s3, s4))
        kth = starts + np.minimum(run_len, k) - 1
        # strict <: a site just outside the block at exactly the kth
        # distance could win the (d2, sid) tie-break
        res_run = (run_len >= k) & (d2_s[kth] < edge * edge)
        if full:
            res_run = np.ones(len(starts), dtype=bool)
        resolved = np.repeat(res_run, run_len)[keep]
        return pa.table(
            {
                "pid": pa.array(pid_s[keep], pa.int64()),
                "sid": pa.array(sid_s[keep], pa.int64()),
                "rank": pa.array((rank[keep] + 1).astype(np.int32)),
                "d2": pa.array(d2_s[keep], pa.float64()),
                "resolved": pa.array(resolved, pa.bool_()),
            }
        )

    return (
        pairs.map_batches(add_part, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(topk_part, batch_format="pyarrow")
    )


def knn_cell_ring(
    points,
    sites,
    k: int = 5,
    zoom: int = 8,
    num_partitions: int = 32,
    broadcast_max_sites: int = 100_000,
):
    """Scale-path exact kNN: sites replicate to their cell's 3x3
    neighborhood; probes join on their own cell; per-probe top-k with a
    ring-lower-bound resolution check.  Unresolved probes (distributed
    anti-join, no driver-side sets) go to the iterative ring-expansion
    pass; the exact broadcast pass is used only when the site table is
    under ``broadcast_max_sites`` rows.  Returns (pid, sid, rank, d2)."""

    def replicate_sites(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        tx, ty = mercator.meters_to_tile(x, y, zoom)
        n = 1 << zoom
        rows, cells = [], []
        offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
        for dx, dy in offs:
            nx = tx + dx
            ny = ty + dy
            ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
            idx = np.flatnonzero(ok)
            rows.append(idx)
            cells.append(mercator.pack_cell(np.full(len(idx), zoom), nx[idx], ny[idx]))
        rows = np.concatenate(rows)
        cells = np.concatenate(cells)
        out = t.take(pa.array(rows, pa.int64()))
        return out.append_column("cell", pa.array(cells, pa.int64()))

    st = sites.map_batches(replicate_sites, batch_format="pyarrow")
    pt = points.map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    pairs = pt.join(
        st, join_type="inner", num_partitions=num_partitions, on=("cell",),
        right_suffix="_s",
    )

    cell_size = 2.0 * mercator.ORIGIN_SHIFT / (1 << zoom)

    ring_res = _topk_by_pid(
        pairs, k=k, zoom=zoom, cell_size=cell_size, r=1,
        world_edges=False, full=False, num_partitions=num_partitions,
    )
    ring_res = ring_res.materialize()
    resolved = ring_res.filter(expr="resolved == True").drop_columns(["resolved"])

    # unresolved probes (incl. probes whose cell had NO candidate rows at
    # all — they vanish from the inner join): distributed anti-join of
    # the probe table against the resolved pid set (no driver-side set)
    res_pids = (
        ring_res.filter(expr="resolved == True")
        .select_columns(["pid"])
        .groupby("pid")
        .count()
    )
    leftover = _anti_join_pids(points, res_pids, num_partitions)

    n_sites = sites.count()
    if n_sites <= broadcast_max_sites:
        # small-side gate: sites fit comfortably in one broadcast object
        sites_tbl = dataset_to_table(sites.select_columns(["sid", "x", "y"]))
        fallback = knn_broadcast(leftover, sites_tbl, k=k)
        return resolved.union(fallback)

    # scale path: iterative ring expansion — replicate the (shrinking)
    # unresolved probe set to all cells within Chebyshev radius r and
    # join against sites keyed by their OWN cell; doubles r until every
    # probe resolves (or its block covers the world grid)
    fallback = _knn_ring_expand(leftover, sites, k=k, zoom=zoom,
                                num_partitions=num_partitions)
    return resolved.union(fallback)


def _anti_join_pids(probes, pid_ds, num_partitions: int):
    """probes minus pids present in pid_ds (left-outer join + null
    filter — the distributed anti-join; empty right side guarded)."""
    import pyarrow.compute as pc

    if pid_ds.count() == 0:
        return probes

    def mark(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": t.column("pid"),
                "__res": pa.array(np.ones(t.num_rows, np.int8), pa.int8()),
            }
        )

    j = probes.join(
        pid_ds.map_batches(mark, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=max(1, num_partitions),
        on=("pid",),
    )

    def keep_unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("__res"))).drop_columns(["__res"])

    return j.map_batches(keep_unmatched, batch_format="pyarrow")


def _knn_ring_expand(probes, sites, k: int, zoom: int, num_partitions: int):
    """Iterative exact-kNN resolution for the unresolved tail: each
    round replicates probes to the cells of their (2r+1)^2 block,
    joins on the sites' own cell, takes per-probe top-k and keeps it
    when the kth distance beats the block-edge lower bound (sides at
    the world edge are safe).  r doubles; a block covering the whole
    grid is exact by construction.  Probes with zero sites anywhere
    emit nothing (kNN of an empty site set)."""
    from .polygonize import _materialize_detached

    n_grid = 1 << zoom
    cell_size = 2.0 * mercator.ORIGIN_SHIFT / n_grid
    st = sites.map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    outs = []
    U = _materialize_detached(probes)
    r = 2
    while True:
        n_u = U.count()
        if n_u == 0:
            break
        full = r >= n_grid

        def replicate_probes(t: pa.Table, r=r) -> pa.Table:
            px = t.column("x").to_numpy(zero_copy_only=False)
            py = t.column("y").to_numpy(zero_copy_only=False)
            tx, ty = mercator.meters_to_tile(px, py, zoom)
            rows, cells = [], []
            for dx in range(-r, r + 1):
                nx = tx + dx
                okx = (nx >= 0) & (nx < n_grid)
                for dy in range(-r, r + 1):
                    ny = ty + dy
                    ok = okx & (ny >= 0) & (ny < n_grid)
                    idx = np.flatnonzero(ok)
                    if len(idx) == 0:
                        continue
                    rows.append(idx)
                    cells.append(
                        mercator.pack_cell(
                            np.full(len(idx), zoom), nx[idx], ny[idx]
                        )
                    )
            rows = np.concatenate(rows) if rows else np.array([], np.int64)
            cells = np.concatenate(cells) if cells else np.array([], np.int64)
            out = t.take(pa.array(rows, pa.int64()))
            return out.append_column("cell", pa.array(cells, pa.int64()))

        parts = max(1, min(num_partitions, (n_u * (2 * r + 1) ** 2) // 50_000 + 1))
        pairs = U.map_batches(replicate_probes, batch_format="pyarrow").join(
            st, join_type="inner", num_partitions=parts, on=("cell",),
            right_suffix="_s",
        )

        round_res = _materialize_detached(
            _topk_by_pid(
                pairs, k=k, zoom=zoom, cell_size=cell_size, r=r,
                world_edges=True, full=full, num_partitions=parts,
            )
        )
        outs.append(
            round_res.filter(expr="resolved == True").drop_columns(["resolved"])
        )
        if full:
            break
        done_pids = (
            round_res.filter(expr="resolved == True")
            .select_columns(["pid"])
            .groupby("pid")
            .count()
        )
        U = _materialize_detached(_anti_join_pids(U, done_pids, parts))
        r *= 2

    if not outs:
        return probes.limit(0).map_batches(
            lambda t: pa.table(
                {
                    "pid": pa.array([], pa.int64()),
                    "sid": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int32()),
                    "d2": pa.array([], pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small) Dataset to one pyarrow Table on the driver."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches)
