"""Rasterize — burn vector polygons into per-cell pixel grids.

Reference semantics: gdal_rasterize scanline parity fill
(alg/gdalrasterize.cpp:569 gv_rasterize_one_shape, low-level
alg/llrasterize.cpp GDALdllImageFilledPolygon: a pixel is burned when
its CENTER is inside the polygon, parity rule), ALL_TOUCHED variant
(GDALdllImageLineAllTouched: every pixel the boundary passes through),
MERGE_ALG replace/add (apps/gdal_rasterize_lib.cpp:959).

Ray-Data shape: polygons replicate to covering cells (map_batches) ->
groupby(cell) -> map_groups burns one 256x256 uint8 grid per cell.
Output rows: cell, z, x, y, grid_bytes (raw uint8 256x256), n_burned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geom, mercator
from .cells import cover_envelope_cells

GRID = 256


def _fill_parity(rings: list[np.ndarray], x0: float, y0: float, res: float,
                 grid: np.ndarray, value: int, add: bool):
    """Scanline parity fill on a GRID x GRID window anchored at
    (x0, y0) top-left (y decreases downward), pixel centers at +0.5.

    llrasterize.cpp semantics: for each scanline through the pixel
    centers, collect polygon-edge x-crossings, sort, fill between
    pairs; all rings (exterior + holes) contribute crossings, so holes
    fall out of the parity automatically."""
    ys = y0 - (np.arange(GRID) + 0.5) * res  # pixel-center y per row
    # gather all edges from all rings
    a = np.vstack([r[:-1] for r in rings])
    b = np.vstack([r[1:] for r in rings])
    y1, y2 = a[:, 1], b[:, 1]
    x1, x2 = a[:, 0], b[:, 0]
    for row in range(GRID):
        y = ys[row]
        # llrasterize rule: edge spans scanline when min<=y<max (half-open)
        cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
        if not cond.any():
            continue
        t = (y - y1[cond]) / (y2[cond] - y1[cond])
        xs = x1[cond] + t * (x2[cond] - x1[cond])
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            # pixel centers in [xs[i], xs[i+1]): center = x0+(c+0.5)*res
            c0 = int(np.ceil((xs[i] - x0) / res - 0.5))
            c1 = int(np.ceil((xs[i + 1] - x0) / res - 0.5))  # exclusive
            c0 = max(c0, 0)
            c1 = min(c1, GRID)
            if c1 > c0:
                if add:
                    grid[row, c0:c1] += value
                else:
                    grid[row, c0:c1] = value


def _burn_all_touched(rings: list[np.ndarray], x0: float, y0: float, res: float,
                      grid: np.ndarray, value: int, add: bool):
    """ALL_TOUCHED: additionally burn every pixel any ring edge passes
    through (supercover line walk per edge)."""
    touched = np.zeros_like(grid, dtype=bool)
    for ring in rings:
        for k in range(len(ring) - 1):
            ax, ay = ring[k]
            bx, by = ring[k + 1]
            # supercover: step through the pixel grid along the segment
            n = int(max(abs(bx - ax), abs(by - ay)) / res * 2) + 2
            ts = np.linspace(0.0, 1.0, n)
            px = ((ax + ts * (bx - ax)) - x0) / res
            py = (y0 - (ay + ts * (by - ay))) / res
            cx = np.clip(np.floor(px).astype(int), 0, GRID - 1)
            cy = np.clip(np.floor(py).astype(int), 0, GRID - 1)
            inside = (px >= 0) & (px < GRID) & (py >= 0) & (py < GRID)
            touched[cy[inside], cx[inside]] = True
    if add:
        grid += touched.astype(grid.dtype) * value
    else:
        grid[touched] = value


def rasterize_polygons(
    polygons,
    zoom: int,
    burn_value: int = 1,
    value_col: str | None = None,
    all_touched: bool = False,
    merge_add: bool = False,
):
    """Polygon layer -> per-cell 256x256 uint8 grids at ``zoom``.

    Deterministic burn order: ascending fid within each cell."""
    ds = polygons.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")

    def burn_group(g: pa.Table) -> pa.Table:
        cell = g.column("cell")[0].as_py()
        z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        res = float(mercator.resolution(z)) * 1.0  # 256 px per tile
        grid = np.zeros((GRID, GRID), dtype=np.uint16)
        order = np.argsort(g.column("fid").to_numpy(zero_copy_only=False), kind="stable")
        wkbs = g.column("wkb").to_pylist()
        vals = (
            g.column(value_col).to_numpy(zero_copy_only=False)
            if value_col
            else np.full(g.num_rows, burn_value, dtype=np.int64)
        )
        for k in order:
            parsed = geom.parse_wkb(wkbs[k])
            for rings in geom.polygon_rings(parsed):
                _fill_parity(rings, minx, maxy, res, grid, int(vals[k]), merge_add)
                if all_touched:
                    _burn_all_touched(
                        rings, minx, maxy, res, grid, int(vals[k]), merge_add
                    )
        out = np.minimum(grid, 255).astype(np.uint8)
        n = int((out > 0).sum())
        if n == 0:
            return pa.table(
                {
                    "cell": pa.array([], pa.int64()),
                    "z": pa.array([], pa.int32()),
                    "x": pa.array([], pa.int32()),
                    "y": pa.array([], pa.int32()),
                    "grid_bytes": pa.array([], pa.binary()),
                    "n_burned": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "cell": pa.array([cell], pa.int64()),
                "z": pa.array([z], pa.int32()),
                "x": pa.array([tx], pa.int32()),
                "y": pa.array([ty], pa.int32()),
                "grid_bytes": pa.array([out.tobytes()], pa.binary()),
                "n_burned": pa.array([n], pa.int32()),
            }
        )

    return ds.groupby("cell").map_groups(burn_group, batch_format="pyarrow")
