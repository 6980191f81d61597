"""Spatial joins — cell co-partitioned, exact predicates, skew-aware.

The north-star operator (reference semantics: OGR layer-algebra
Intersection/Clip/Erase, ogr/ogrsf_frmts/generic/ogrlayer.cpp:3345,
:5497, :5806, and the spatial-filter scan :2253-2320).  Plan shape:

  points  -> map_batches(assign cell at Z [+ salt hot cells])
  polygons-> map_batches(replicate to covering cells [+ salt fan-out])
  pairs   -> Dataset.join on the cell key (hash-partitioned shuffle)
  exact   -> map_batches vectorized ray-casting PIP / rect-intersects
  dedup   -> canonical-cell rule (a pair is emitted only by the cell
             that owns it) so output rows are exactly-once

Envelope candidates come from the hash join itself; the per-batch
exact test parses each distinct polygon once and probes all its
candidate points vectorized (numpy ray casting, boundary-inclusive —
ogrlinearring.cpp:462/543 semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import geom, mercator
from .cells import add_salt, assign_point_cells, cover_envelope_cells, replicate_salt

DEFAULT_NUM_PARTITIONS = 32


def _exact_pip_batch(batch: pa.Table) -> pa.Table:
    """Keep candidate (point, polygon) pairs whose point intersects the
    polygon.  Expects columns x, y, wkb; groups by identical wkb within
    the batch for vectorized probing."""
    n = batch.num_rows
    if n == 0:
        return batch
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    wkb = batch.column("wkb").to_pylist()
    keep = np.zeros(n, dtype=bool)
    by_geom: dict[bytes, list[int]] = {}
    for i, g in enumerate(wkb):
        by_geom.setdefault(g, []).append(i)
    for g, idxs in by_geom.items():
        idxs = np.asarray(idxs, dtype=np.int64)
        parsed = geom.parse_wkb(g)
        keep[idxs] = geom.points_intersect_geom(x[idxs], y[idxs], parsed)
    return batch.filter(pa.array(keep))


def _exact_rect_poly_batch(batch: pa.Table) -> pa.Table:
    """Exact rect (chip footprint) x polygon intersects + canonical-cell
    dedup.  Expects chip envelope columns minx..maxy, polygon wkb +
    envelope columns minx_r..maxy_r, and the join cell key column
    ``cell``.  A pair is kept only in the cell containing the lower-left
    corner of the envelope intersection (exactly-once across cells)."""
    n = batch.num_rows
    if n == 0:
        return batch
    aminx = batch.column("minx").to_numpy(zero_copy_only=False)
    aminy = batch.column("miny").to_numpy(zero_copy_only=False)
    amaxx = batch.column("maxx").to_numpy(zero_copy_only=False)
    amaxy = batch.column("maxy").to_numpy(zero_copy_only=False)
    bminx = batch.column("minx_r").to_numpy(zero_copy_only=False)
    bminy = batch.column("miny_r").to_numpy(zero_copy_only=False)
    cells = batch.column("cell").to_numpy(zero_copy_only=False)
    z, _, _ = mercator.unpack_cell(cells[:1])
    zoom = int(z[0])
    # canonical cell of each pair
    ix = np.maximum(aminx, bminx)
    iy = np.maximum(aminy, bminy)
    canon = mercator.cell_of_points(ix, iy, zoom)
    keep = canon == cells
    wkb = batch.column("wkb").to_pylist()
    by_geom: dict[bytes, list[int]] = {}
    for i in np.flatnonzero(keep):
        by_geom.setdefault(wkb[i], []).append(int(i))
    keep2 = np.zeros(n, dtype=bool)
    for g, idxs in by_geom.items():
        rings_list = geom.polygon_rings(geom.parse_wkb(g))
        for i in idxs:
            rect = np.array(
                [
                    [aminx[i], aminy[i]],
                    [amaxx[i], aminy[i]],
                    [amaxx[i], amaxy[i]],
                    [aminx[i], amaxy[i]],
                    [aminx[i], aminy[i]],
                ]
            )
            keep2[i] = any(
                geom.polygons_intersect([rect], rings) for rings in rings_list
            )
    return batch.filter(pa.array(keep2))


def join_points_in_polygons(
    points,
    polygons,
    zoom: int = 10,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
    hot_cells: dict[int, int] | None = None,
    point_id_col: str = "pid",
):
    """Inner spatial join: points intersecting polygons (exactly-once).

    ``points`` needs x/y columns; ``polygons`` needs wkb + envelope
    columns.  Points own exactly one cell, so no cross-cell dedup is
    needed.  ``hot_cells`` maps cell id -> salt fan-out for skewed
    cells (points salted by id, polygons replicated per salt).
    """
    key = "cell"
    pts = points.map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    pol = polygons.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    if hot_cells:
        pts = pts.map_batches(add_salt(hot_cells, point_id_col), batch_format="pyarrow")
        pol = pol.map_batches(replicate_salt(hot_cells), batch_format="pyarrow")
        key = "cellsalt"
    pairs = pts.join(
        pol,
        join_type="inner",
        num_partitions=num_partitions,
        on=(key,),
        right_suffix="_r",
    )
    # envelope pre-filter (cheap, vectorized) then exact PIP
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

    exact = pairs.map_batches(env_prefilter, batch_format="pyarrow").map_batches(
        _exact_pip_batch, batch_format="pyarrow"
    )
    if point_cols or poly_cols:
        exact = exact.select_columns(list(point_cols or []) + list(poly_cols or []))
    return exact


def join_chips_with_polygons(
    chips,
    polygons,
    zoom: int = 10,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    chip_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
):
    """Inner spatial join: chip footprints (axis-aligned rects from
    minx..maxy) intersecting polygons — both sides envelope-replicated
    to covering cells, exactly-once via the canonical-cell rule."""
    ch = chips.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    pol = polygons.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    pairs = ch.join(
        pol,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell",),
        right_suffix="_r",
    )
    import pyarrow.compute as pc

    def env_prefilter(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.less_equal(t.column("minx"), t.column("maxx_r")),
                pc.greater_equal(t.column("maxx"), t.column("minx_r")),
            ),
            pc.and_(
                pc.less_equal(t.column("miny"), t.column("maxy_r")),
                pc.greater_equal(t.column("maxy"), t.column("miny_r")),
            ),
        )
        return t.filter(keep)

    exact = pairs.map_batches(env_prefilter, batch_format="pyarrow").map_batches(
        _exact_rect_poly_batch, batch_format="pyarrow"
    )
    if chip_cols or poly_cols:
        exact = exact.select_columns(list(chip_cols or []) + list(poly_cols or []))
    return exact


def semi_join_points(points, matched_pids, point_id_col: str = "pid", anti: bool = False):
    """Clip (semi) / Erase (anti) over a computed match set
    (ogrlayer.cpp:5497 Clip, :5806 Erase): broadcast the matched-id set
    (ray.put once) and filter points inside map_batches."""
    import ray

    ref = ray.put(set(matched_pids))

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(point_id_col).to_numpy(zero_copy_only=False)
        s = ray.get(ref)
        keep = np.fromiter((i in s for i in ids), dtype=bool, count=len(ids))
        if anti:
            keep = ~keep
        return t.filter(pa.array(keep))

    fn.__name__ = "anti_join" if anti else "semi_join"
    return points.map_batches(fn, batch_format="pyarrow")
