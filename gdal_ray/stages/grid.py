"""Scattered points -> raster grids per cell (gdal_grid analog) and
per-chip proximity / sieve / fillnodata stages.

Reference: apps/gdal_grid_lib.cpp:629 + alg/gdalgrid.cpp interpolators
(per-cell with a 1-ring halo so interpolation near cell borders sees
neighboring points — the 'GB points by cell (+1-ring halo)' plan of
SURVEY.md §2.9); alg/gdalproximity.cpp, alg/gdalsievefilter.cpp,
alg/rasterfill.cpp applied per rasterized cell.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import mercator, rasterops

GRID = 256


def grid_points(
    points,
    zoom: int,
    algorithm: str = "invdist",
    value_col: str = "v",
    grid_size: int = 64,
    **algo_kwargs,
):
    """Interpolate scattered (x, y, value) points onto a grid_size^2
    raster per covered cell.  Points replicate to their cell AND its
    1-ring (halo) so border pixels interpolate correctly; only the
    owner cell emits the grid.  Output: cell, z, x, y, grid (float64
    bytes), n_points."""

    def replicate_halo(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        tx, ty = mercator.meters_to_tile(x, y, zoom)
        n = 1 << zoom
        rows, cells, owner = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = tx + dx, ty + dy
                ok = (nx >= 0) & (nx < n) & (ny >= 0) & (ny < n)
                idx = np.flatnonzero(ok)
                rows.append(idx)
                cells.append(
                    mercator.pack_cell(np.full(len(idx), zoom), nx[idx], ny[idx])
                )
                owner.append(np.full(len(idx), dx == 0 and dy == 0))
        rows = np.concatenate(rows)
        out = t.take(pa.array(rows, pa.int64()))
        out = out.append_column("cell", pa.array(np.concatenate(cells), pa.int64()))
        return out.append_column("owner", pa.array(np.concatenate(owner)))

    if algorithm in ("count", "minimum", "maximum", "range"):
        metric = algorithm

        def algo(px, py, pv, xs, ys, **kw):
            return rasterops.grid_metric(px, py, pv, xs, ys, metric=metric, **kw)

    else:
        from ..functions import delaunay

        algo = {
            "invdist": rasterops.grid_invdist,
            # gdal_grid -a invdistnn (GDALGridInverseDistanceToAPower
            # NearestNeighbor): radius-gated nearest-max_points IDW
            "invdistnn": rasterops.grid_invdistnn,
            "nearest": rasterops.grid_nearest,
            "average": rasterops.grid_average,
            # gdal_grid -a linear (alg/gdalgrid.cpp GDALGridLinear via
            # alg/delaunay.c): Delaunay + barycentric, nodata outside hull
            "linear": delaunay.grid_linear,
        }[algorithm]

    # hot-cell guard for the exact-arithmetic Delaunay path: a
    # degenerate dense cell would stall its whole partition, so cap the
    # halo set at the ``linear_cap`` points nearest the cell center
    # (deterministic: distance, then canonical order) and REPORT the
    # drop in the output row — no silent caps.  (History: 512 when node
    # location was all-pairs Q x T, 2,048 after the bucketed point
    # location; now that construction itself is the incremental
    # walk-and-cavity insert — near-linear, 16k points ≈ 2.4 s — the
    # cap binds only on truly pathological cells.)
    linear_cap = int(algo_kwargs.pop("linear_cap", 16384))

    def interpolate_group(g: pa.Table) -> pa.Table:
        cell = int(g.column("cell")[0].as_py())
        owner = g.column("owner").to_numpy(zero_copy_only=False)
        if not owner.any():  # halo-only group: no owned points -> skip
            return _empty_grid_table()
        z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        res = (maxx - minx) / grid_size
        xs = minx + (np.arange(grid_size) + 0.5) * res
        ys = maxy - (np.arange(grid_size) + 0.5) * res
        px = g.column("x").to_numpy(zero_copy_only=False)
        py = g.column("y").to_numpy(zero_copy_only=False)
        pv = g.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        # canonical point order: float weight sums must not depend on
        # the (shuffle-dependent) group arrival order
        order = np.lexsort((pv, py, px))
        px, py, pv = px[order], py[order], pv[order]
        n_dropped = 0
        if algorithm == "linear" and len(px) > linear_cap:
            cx_c = (minx + maxx) / 2.0
            cy_c = (miny + maxy) / 2.0
            d2c = (px - cx_c) ** 2 + (py - cy_c) ** 2
            keep = np.sort(
                np.argsort(d2c, kind="stable")[:linear_cap]
            )  # nearest cap, back in canonical order
            n_dropped = len(px) - linear_cap
            px, py, pv = px[keep], py[keep], pv[keep]
        grid = algo(px, py, pv, xs, ys, **algo_kwargs)
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "z": pa.array([z], pa.int32()),
                "x": pa.array([tx], pa.int32()),
                "y": pa.array([ty], pa.int32()),
                "grid": pa.array([grid.astype(np.float64).tobytes()], pa.binary()),
                "n_points": pa.array([int(owner.sum())], pa.int32()),
                "n_dropped": pa.array([n_dropped], pa.int32()),
            }
        )

    return (
        points.map_batches(replicate_halo, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(interpolate_group, batch_format="pyarrow")
    )


def _empty_grid_table() -> pa.Table:
    return pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "z": pa.array([], pa.int32()),
            "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()),
            "grid": pa.array([], pa.binary()),
            "n_points": pa.array([], pa.int32()),
            "n_dropped": pa.array([], pa.int32()),
        }
    )


# --------------------------- per-grid ops over rasterized cell rows


def _grid_op_stage(fn, out_dtype: str):
    def stage(t: pa.Table) -> pa.Table:
        grids = t.column("grid_bytes").to_pylist()
        out = []
        for gb in grids:
            g = np.frombuffer(gb, dtype=np.uint8).reshape(GRID, GRID)
            out.append(fn(g).astype(out_dtype).tobytes())
        return pa.table(
            {
                "cell": t.column("cell"),
                "z": t.column("z"),
                "x": t.column("x"),
                "y": t.column("y"),
                "data": pa.array(out, pa.binary()),
                "dtype": pa.array([out_dtype] * t.num_rows, pa.string()),
            }
        )

    return stage


def proximity_cells(raster_cells, max_dist: float | None = None):
    """Distance-to-nearest-burned-pixel raster per cell (float32)."""
    return raster_cells.map_batches(
        _grid_op_stage(lambda g: rasterops.proximity(g > 0, max_dist), "float32"),
        batch_format="pyarrow",
    )


def sieve_cells(raster_cells, threshold: int):
    """Remove small components per cell (uint8)."""
    return raster_cells.map_batches(
        _grid_op_stage(lambda g: rasterops.sieve(g, threshold), "uint8"),
        batch_format="pyarrow",
    )


def fillnodata_cells(raster_cells, max_search: int = 100):
    """Treat zero as nodata and fill it per cell (uint8)."""
    return raster_cells.map_batches(
        _grid_op_stage(
            lambda g: rasterops.fillnodata(g, g > 0, max_search=max_search), "uint8"
        ),
        batch_format="pyarrow",
    )


# ------------------------------------- point query (gdallocationinfo)


def query_points_in_chips(chips, probes, zoom: int = 10, num_partitions: int = 16):
    """gdallocationinfo / GDALInterpolateAtPoint analog: for each probe
    (pid, x, y), bilinear-sample every chip whose footprint contains it.
    Cell co-partitioned like the PIP join.  Output: pid, image_id,
    band values r/g/b (bilinear, float64)."""
    from ..functions import codecs, kernels
    from .cells import assign_point_cells, cover_envelope_cells

    pts = probes.map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    ch = chips.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    pairs = pts.join(
        ch, join_type="inner", num_partitions=num_partitions, on=("cell",),
        right_suffix="_r",
    )
    import pyarrow.compute as pc

    def env_prefilter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(t.column("x"), t.column("minx")),
                pc.less_equal(t.column("x"), t.column("maxx")),
            ),
            pc.and_(
                pc.greater_equal(t.column("y"), t.column("miny")),
                pc.less_equal(t.column("y"), t.column("maxy")),
            ),
        )
        return t.filter(keep)

    def sample(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out = np.empty((n, 3), dtype=np.float64)
        cols = {
            c: t.column(c).to_pylist()
            for c in ("bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy", "x", "y")
        }
        for i in range(n):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            res_x = (cols["maxx"][i] - cols["minx"][i]) / cols["w"][i]
            res_y = (cols["maxy"][i] - cols["miny"][i]) / cols["h"][i]
            sx = (cols["x"][i] - cols["minx"][i]) / res_x - 0.5
            sy = (cols["maxy"][i] - cols["y"][i]) / res_y - 0.5
            val = kernels.resample_separable(
                img, np.array([sx]), np.array([sy]), "bilinear"
            )
            out[i] = val[0, 0]
        return pa.table(
            {
                "pid": t.column("pid"),
                "image_id": t.column("image_id"),
                "r": pa.array(out[:, 0]),
                "g": pa.array(out[:, 1]),
                "b": pa.array(out[:, 2]),
            }
        )

    return pairs.map_batches(env_prefilter, batch_format="pyarrow").map_batches(
        sample, batch_format="pyarrow"
    )
