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
        idxs = np.asarray(idxs, dtype=np.int64)
        rings_list = geom.polygon_rings(geom.parse_wkb(g))
        keep2[idxs] = _rects_intersect_polygons(
            aminx[idxs], aminy[idxs], amaxx[idxs], amaxy[idxs], rings_list
        )
    return batch.filter(pa.array(keep2))


def _rects_intersect_polygons(rminx, rminy, rmaxx, rmaxy, rings_list) -> np.ndarray:
    """Vectorized exact rect-x-polygon intersects for many rects vs ONE
    (multi)polygon.  Fast paths cover almost every pair:
      1. any rect corner intersects the polygon (vectorized PIP), or
      2. any polygon vertex falls inside the rect (vectorized bbox), or
      3. (rare leftovers) edge-crossing check per pair.
    """
    m = len(rminx)
    out = np.zeros(m, dtype=bool)
    # 1: rect corners in polygon (4m probe points per polygon part)
    cx = np.concatenate([rminx, rmaxx, rmaxx, rminx])
    cy = np.concatenate([rminy, rminy, rmaxy, rmaxy])
    for rings in rings_list:
        hit = geom.points_intersect_polygon(cx, cy, rings)
        out |= hit[:m] | hit[m : 2 * m] | hit[2 * m : 3 * m] | hit[3 * m :]
    # 2: polygon vertices inside rect
    todo = np.flatnonzero(~out)
    if len(todo):
        verts = np.vstack([r[:-1] for rings in rings_list for r in rings])
        vx, vy = verts[:, 0], verts[:, 1]
        for i in todo:
            if (
                (vx >= rminx[i])
                & (vx <= rmaxx[i])
                & (vy >= rminy[i])
                & (vy <= rmaxy[i])
            ).any():
                out[i] = True
    # 3: leftovers -> exact edge-cross test
    todo = np.flatnonzero(~out)
    for i in todo:
        rect = np.array(
            [
                [rminx[i], rminy[i]],
                [rmaxx[i], rminy[i]],
                [rmaxx[i], rmaxy[i]],
                [rminx[i], rmaxy[i]],
                [rminx[i], rminy[i]],
            ]
        )
        out[i] = any(geom.polygons_intersect([rect], rings) for rings in rings_list)
    return out


def join_points_in_polygons(
    points,
    polygons,
    zoom: int = 10,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    point_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
    hot_cells: dict[int, int] | None = None,
    point_id_col: str = "pid",
    strategy: str = "groupby",
):
    """Inner spatial join: points intersecting polygons (exactly-once).

    ``points`` needs x/y columns; ``polygons`` needs wkb + envelope
    columns.  Points own exactly one cell, so no cross-cell dedup is
    needed.  ``hot_cells`` maps cell id -> salt fan-out for skewed
    cells (points salted by id, polygons replicated per salt).

    strategy="groupby" (default, the scale path): one shuffle of the
    inputs, candidates generated and PIP-filtered inside the per-cell
    group task.  strategy="hashjoin": Dataset.join candidate-pair
    materialization (kept for low-fan-out workloads / comparison).
    """
    if strategy == "groupby":
        return _join_points_groupby(
            points,
            polygons,
            zoom,
            point_cols or [point_id_col],
            poly_cols or ["fid"],
            hot_cells=hot_cells,
            point_id_col=point_id_col,
        )
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


def _join_points_groupby(
    points, polygons, zoom, point_cols, poly_cols, hot_cells=None, point_id_col="pid"
):
    """Co-partitioned group join for points: union + groupby(cell) +
    per-cell STRtree over points, probed by each polygon's envelope,
    exact ray-casting PIP on the candidates (no cross-cell dedup — a
    point owns exactly one cell)."""
    from ..state.strtree import STRtree
    from .tiles import _add_scatter

    pts = points.select_columns(
        list(dict.fromkeys(point_cols + ["x", "y"]))
    ).map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    pol = polygons.select_columns(
        list(dict.fromkeys(poly_cols + ["wkb", "minx", "miny", "maxx", "maxy"]))
    ).map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    key = "cell"
    if hot_cells:
        pts = pts.map_batches(add_salt(hot_cells, point_id_col), batch_format="pyarrow")
        pol = pol.map_batches(replicate_salt(hot_cells), batch_format="pyarrow")
        key = "cellsalt"

    pt_schema = dict(zip(pts.schema().names, pts.schema().types))
    pol_schema = dict(zip(pol.schema().names, pol.schema().types))
    full: dict[str, pa.DataType] = {}
    for c, ty in pt_schema.items():
        if c not in ("cell", "cellsalt"):
            full[c] = ty
    for c, ty in pol_schema.items():
        if c in ("cell", "cellsalt"):
            continue
        full.setdefault(c, ty)
    full["cell"] = pa.int64()
    if key != "cell":
        full[key] = pa.int64()
    full["side"] = pa.int8()

    def _aligned(t: pa.Table, side: int) -> pa.Table:
        cols = {}
        for name, ty in full.items():
            if name == "side":
                cols[name] = pa.array(np.full(t.num_rows, side, np.int8))
            elif name in t.schema.names:
                cols[name] = t.column(name).cast(ty)
            else:
                cols[name] = pa.nulls(t.num_rows, ty)
        return pa.table(cols)

    both = pts.map_batches(lambda t: _aligned(t, 0), batch_format="pyarrow").union(
        pol.map_batches(lambda t: _aligned(t, 1), batch_format="pyarrow")
    )
    out_schema_cols = point_cols + poly_cols

    def probe_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        pts_t = g.filter(pa.array(side == 0))
        pol_t = g.filter(pa.array(side == 1))
        empty = pa.table({c: g.column(c).slice(0, 0) for c in out_schema_cols})
        if pts_t.num_rows == 0 or pol_t.num_rows == 0:
            return empty
        px = pts_t.column("x").to_numpy(zero_copy_only=False)
        py = pts_t.column("y").to_numpy(zero_copy_only=False)
        tree = STRtree(px, py, px, py)
        bminx = pol_t.column("minx").to_numpy(zero_copy_only=False)
        bminy = pol_t.column("miny").to_numpy(zero_copy_only=False)
        bmaxx = pol_t.column("maxx").to_numpy(zero_copy_only=False)
        bmaxy = pol_t.column("maxy").to_numpy(zero_copy_only=False)
        wkbs = pol_t.column("wkb").to_pylist()
        out_pi, out_gi = [], []
        for p in range(pol_t.num_rows):
            cand = tree.query(bminx[p], bminy[p], bmaxx[p], bmaxy[p])
            if len(cand) == 0:
                continue
            parsed = geom.parse_wkb(wkbs[p])
            hit = geom.points_intersect_geom(px[cand], py[cand], parsed)
            sel = cand[hit]
            if len(sel):
                out_pi.append(sel)
                out_gi.append(np.full(len(sel), p, dtype=np.int64))
        if not out_pi:
            return empty
        pi = pa.array(np.concatenate(out_pi), pa.int64())
        gi = pa.array(np.concatenate(out_gi), pa.int64())
        cols = {}
        for c in point_cols:
            cols[c] = pts_t.column(c).take(pi)
        for c in poly_cols:
            cols[c] = pol_t.column(c).take(gi)
        return pa.table(cols)

    scattered = both.map_batches(lambda t: _add_scatter(t, key), batch_format="pyarrow")
    return scattered.groupby("__scatter").map_groups(
        probe_group, batch_format="pyarrow"
    )


def join_chips_with_polygons(
    chips,
    polygons,
    zoom: int = 10,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    chip_cols: list[str] | None = None,
    poly_cols: list[str] | None = None,
    strategy: str = "groupby",
    hot_cells: dict[int, int] | None = None,
    emit_geometry: bool = False,
):
    """Inner spatial join: chip footprints (axis-aligned rects from
    minx..maxy) intersecting polygons — both sides envelope-replicated
    to covering cells, exactly-once via the canonical-cell rule.
    ``emit_geometry`` additionally outputs the intersection geometry
    (inter_wkb, inter_area) per pair — the geometry-producing overlay
    of ogrlayer.cpp:3345 Intersection.

    strategy="groupby" (default): union + groupby(cell) + per-group
    STRtree probe — candidate pairs are generated AND filtered inside
    the group task, so the shuffle moves only the replicated inputs
    (~0.5M rows at bench scale), never the raw candidate pairs (~15M).
    strategy="hashjoin": Dataset.join pair materialization (slower at
    high pair fan-out; kept for comparison and low-fan-out workloads).
    """
    if strategy == "groupby":
        return _join_chips_groupby(
            chips, polygons, zoom, chip_cols or ["image_id"], poly_cols or ["fid"],
            hot_cells=hot_cells, emit_geometry=emit_geometry,
        )
    if emit_geometry:
        raise ValueError("emit_geometry requires strategy='groupby'")
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


def _join_chips_groupby(chips, polygons, zoom, chip_cols, poly_cols, hot_cells=None,
                        emit_geometry=False):
    """Co-partitioned group join: one shuffle of the replicated inputs,
    per-cell STRtree build + probe + exact test in map_groups (the
    per-partition index pattern of SURVEY.md §2.3).  ``hot_cells``
    ({cell: salt_fanout}, e.g. from detect_hot_cells) splits skewed
    cells into sub-groups: chips salted by id hash, polygons replicated
    per salt — straggler groups become salt_fanout parallel tasks."""
    from ..state.strtree import STRtree

    ch = chips.select_columns(
        list(dict.fromkeys(chip_cols + ["minx", "miny", "maxx", "maxy"]))
    ).map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    pol = polygons.select_columns(
        list(dict.fromkeys(poly_cols + ["wkb", "minx", "miny", "maxx", "maxy"]))
    ).map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    key = "cell"
    if hot_cells:
        ch = ch.map_batches(add_salt(hot_cells, chip_cols[0]), batch_format="pyarrow")
        pol = pol.map_batches(replicate_salt(hot_cells), batch_format="pyarrow")
        key = "cellsalt"

    # build the unified schema explicitly — Dataset.union does NOT align
    # block schemas, so every block must carry every column (typed nulls
    # for the other side's fields)
    chip_schema = dict(zip(ch.schema().names, ch.schema().types))
    poly_schema = dict(zip(pol.schema().names, pol.schema().types))
    full: dict[str, pa.DataType] = {}
    for c, ty in chip_schema.items():
        if c not in ("cell", "cellsalt"):
            full[c] = ty
    for c, ty in poly_schema.items():
        if c in ("cell", "cellsalt"):
            continue
        name = c + "_r" if c in ("minx", "miny", "maxx", "maxy") else c
        full.setdefault(name, ty)
    full.pop("cellsalt", None)
    full["cell"] = pa.int64()  # true cell always carried (the salted
    if key != "cell":          # cellsalt key wraps int64 and cannot be
        full[key] = pa.int64() # inverted back to the cell)
    full["side"] = pa.int8()

    def _aligned(t: pa.Table, rename: dict[str, str], side: int) -> pa.Table:
        cols = {}
        present = {rename.get(c, c): c for c in t.schema.names}
        for name, ty in full.items():
            if name == "side":
                cols[name] = pa.array(np.full(t.num_rows, side, np.int8))
            elif name in present:
                cols[name] = t.column(present[name]).cast(ty)
            else:
                cols[name] = pa.nulls(t.num_rows, ty)
        return pa.table(cols)

    rename_poly = {"minx": "minx_r", "miny": "miny_r", "maxx": "maxx_r", "maxy": "maxy_r"}
    left = ch.map_batches(
        lambda t: _aligned(t, {}, 0), batch_format="pyarrow"
    )
    right = pol.map_batches(
        lambda t: _aligned(t, rename_poly, 1), batch_format="pyarrow"
    )
    both = left.union(right)

    out_schema_cols = chip_cols + poly_cols

    def probe_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        chips_t = g.filter(pa.array(side == 0))
        polys_t = g.filter(pa.array(side == 1))
        n_c, n_p = chips_t.num_rows, polys_t.num_rows
        empty_cols = {c: g.column(c).slice(0, 0) for c in out_schema_cols}
        if emit_geometry:
            empty_cols["inter_wkb"] = pa.array([], pa.binary())
            empty_cols["inter_area"] = pa.array([], pa.float64())
        empty = pa.table(empty_cols)
        if n_c == 0 or n_p == 0:
            return empty
        cell = int(g.column("cell")[0].as_py())
        aminx = chips_t.column("minx").to_numpy(zero_copy_only=False)
        aminy = chips_t.column("miny").to_numpy(zero_copy_only=False)
        amaxx = chips_t.column("maxx").to_numpy(zero_copy_only=False)
        amaxy = chips_t.column("maxy").to_numpy(zero_copy_only=False)
        bminx = polys_t.column("minx_r").to_numpy(zero_copy_only=False)
        bminy = polys_t.column("miny_r").to_numpy(zero_copy_only=False)
        bmaxx = polys_t.column("maxx_r").to_numpy(zero_copy_only=False)
        bmaxy = polys_t.column("maxy_r").to_numpy(zero_copy_only=False)
        wkbs = polys_t.column("wkb").to_pylist()
        tree = STRtree(aminx, aminy, amaxx, amaxy)
        out_ci, out_pi = [], []
        out_wkb, out_area = [], []
        for p in range(n_p):
            cand = tree.query(bminx[p], bminy[p], bmaxx[p], bmaxy[p])
            if len(cand) == 0:
                continue
            # canonical-cell rule: pair owned by the cell containing the
            # lower-left corner of the envelope intersection
            ix = np.maximum(aminx[cand], bminx[p])
            iy = np.maximum(aminy[cand], bminy[p])
            canon = mercator.cell_of_points(ix, iy, zoom)
            cand = cand[canon == cell]
            if len(cand) == 0:
                continue
            rings_list = geom.polygon_rings(geom.parse_wkb(wkbs[p]))
            hit = _rects_intersect_polygons(
                aminx[cand], aminy[cand], amaxx[cand], amaxy[cand], rings_list
            )
            sel = cand[hit]
            if len(sel):
                out_ci.append(sel)
                out_pi.append(np.full(len(sel), p, dtype=np.int64))
                if emit_geometry:
                    for c in sel:
                        wkb_i, area = geom.clip_polygon_rect(
                            rings_list, aminx[c], aminy[c], amaxx[c], amaxy[c]
                        )
                        out_wkb.append(wkb_i or b"")
                        out_area.append(area)
        if not out_ci:
            return empty
        ci = pa.array(np.concatenate(out_ci), pa.int64())
        pi = pa.array(np.concatenate(out_pi), pa.int64())
        cols = {}
        for c in chip_cols:
            cols[c] = chips_t.column(c).take(ci)
        for c in poly_cols:
            cols[c] = polys_t.column(c).take(pi)
        if emit_geometry:
            cols["inter_wkb"] = pa.array(out_wkb, pa.binary())
            cols["inter_area"] = pa.array(out_area, pa.float64())
        return pa.table(cols)

    from .tiles import _add_scatter

    scattered = both.map_batches(lambda t: _add_scatter(t, key), batch_format="pyarrow")
    return scattered.groupby("__scatter").map_groups(
        probe_group, batch_format="pyarrow"
    )


def clip_erase_points(
    points,
    polygons,
    zoom: int = 10,
    anti: bool = False,
    point_cols: list[str] | None = None,
    hot_cells: dict[int, int] | None = None,
    point_id_col: str = "pid",
):
    """Clip (semi) / Erase (anti) join, fully co-partitioned
    (ogrlayer.cpp:5497 Clip, :5806 Erase semantics for point inputs):
    points and covering-cell-replicated polygons meet in ONE
    groupby(cell) shuffle; the group task emits each point exactly once
    (a point owns exactly one cell) with its matched flag, so neither
    the match set nor the candidate pairs ever reach the driver.

    Scale note: identical partitioning/salting contract as
    :func:`join_points_in_polygons`; output is the filtered point rows.
    """
    from ..state.strtree import STRtree
    from .tiles import _add_scatter

    point_cols = point_cols or [point_id_col, "x", "y"]
    pts = points.select_columns(
        list(dict.fromkeys(point_cols + ["x", "y"]))
    ).map_batches(assign_point_cells(zoom), batch_format="pyarrow")
    pol = polygons.select_columns(
        ["wkb", "minx", "miny", "maxx", "maxy"]
    ).map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
    key = "cell"
    if hot_cells:
        pts = pts.map_batches(add_salt(hot_cells, point_id_col), batch_format="pyarrow")
        pol = pol.map_batches(replicate_salt(hot_cells), batch_format="pyarrow")
        key = "cellsalt"

    pt_schema = dict(zip(pts.schema().names, pts.schema().types))
    pol_schema = dict(zip(pol.schema().names, pol.schema().types))
    full: dict[str, pa.DataType] = {}
    for c, ty in pt_schema.items():
        if c not in ("cell", "cellsalt"):
            full[c] = ty
    for c, ty in pol_schema.items():
        if c not in ("cell", "cellsalt"):
            full.setdefault(c, ty)
    full["cell"] = pa.int64()
    if key != "cell":
        full[key] = pa.int64()
    full["side"] = pa.int8()

    def _aligned(t: pa.Table, side: int) -> pa.Table:
        cols = {}
        for name, ty in full.items():
            if name == "side":
                cols[name] = pa.array(np.full(t.num_rows, side, np.int8))
            elif name in t.schema.names:
                cols[name] = t.column(name).cast(ty)
            else:
                cols[name] = pa.nulls(t.num_rows, ty)
        return pa.table(cols)

    both = pts.map_batches(lambda t: _aligned(t, 0), batch_format="pyarrow").union(
        pol.map_batches(lambda t: _aligned(t, 1), batch_format="pyarrow")
    )

    def flag_group(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        pts_t = g.filter(pa.array(side == 0))
        if pts_t.num_rows == 0:
            return pa.table({c: g.column(c).slice(0, 0) for c in point_cols})
        pol_t = g.filter(pa.array(side == 1))
        matched = np.zeros(pts_t.num_rows, dtype=bool)
        if pol_t.num_rows:
            px = pts_t.column("x").to_numpy(zero_copy_only=False)
            py = pts_t.column("y").to_numpy(zero_copy_only=False)
            tree = STRtree(px, py, px, py)
            bminx = pol_t.column("minx").to_numpy(zero_copy_only=False)
            bminy = pol_t.column("miny").to_numpy(zero_copy_only=False)
            bmaxx = pol_t.column("maxx").to_numpy(zero_copy_only=False)
            bmaxy = pol_t.column("maxy").to_numpy(zero_copy_only=False)
            wkbs = pol_t.column("wkb").to_pylist()
            for p in range(pol_t.num_rows):
                cand = tree.query(bminx[p], bminy[p], bmaxx[p], bmaxy[p])
                cand = cand[~matched[cand]]  # only probe still-unmatched points
                if len(cand) == 0:
                    continue
                parsed = geom.parse_wkb(wkbs[p])
                hit = geom.points_intersect_geom(px[cand], py[cand], parsed)
                matched[cand[hit]] = True
        keep = ~matched if anti else matched
        return pa.table({c: pts_t.column(c).filter(pa.array(keep)) for c in point_cols})

    scattered = both.map_batches(lambda t: _add_scatter(t, key), batch_format="pyarrow")
    return scattered.groupby("__scatter").map_groups(
        flag_group, batch_format="pyarrow"
    )


def semi_join_points(points, matched_pids, point_id_col: str = "pid", anti: bool = False):
    """Semi/anti filter over an id set already small enough to broadcast
    (ray.put once, vectorized ``pc.is_in`` per batch).  For the full
    Clip/Erase operator use :func:`clip_erase_points`, which never
    materializes the match set."""
    import ray
    import pyarrow.compute as pc

    ref = ray.put(pa.array(sorted(set(int(i) for i in matched_pids)), pa.int64()))

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(point_id_col)
        keep = pc.is_in(ids, value_set=ray.get(ref))
        if anti:
            keep = pc.invert(keep)
        return t.filter(keep)

    fn.__name__ = "anti_join" if anti else "semi_join"
    return points.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------- layer algebra
#
# The reference's remaining overlay modes (ogrlayer.cpp: Union :3763,
# SymDifference :4300, Identity :4730, Update :5148, Clip :5497,
# Erase :5806) all reduce — for rect layers — to two primitives:
# the pairwise intersection geometry (join_chips_with_polygons with
# emit_geometry, ogrlayer.cpp:3345) and the per-feature REMAINDER
# A - union(intersecting B), which the reference computes as a
# progressive GEOS Difference over the spatial-filter matches.
#
# Distributed shape: the pair stream (one cell-copartition shuffle,
# exactly-once) is unioned with one bare row per A feature and grouped
# by the A fid — every group then holds the feature's envelope plus
# ALL of its intersecting B envelopes regardless of which cells the
# matches came from.  The remainder is computed by coordinate-grid
# decomposition (B edge coordinates clipped to A split A into a grid;
# a cell is covered iff some B spans it), which is exact for the
# integer-derived fixtures and emits the uncovered cells as a
# MultiPolygon.  No driver-side state; group size = matches per
# feature.


def _cover_grid(aminx, aminy, amaxx, amaxy, bx0, by0, bx1, by1):
    """Coordinate-grid coverage of rect A by the union of B rects
    (already clipped to A).  Returns (covered, xs, ys): covered[i, j]
    is True iff grid cell x in [xs[i], xs[i+1]] x y in [ys[j], ys[j+1]]
    lies inside some B — grid edges include every B edge, so a cell is
    never partially overlapped."""
    xs = np.unique(np.concatenate([[aminx, amaxx], bx0, bx1]))
    ys = np.unique(np.concatenate([[aminy, amaxy], by0, by1]))
    xs = xs[(xs >= aminx) & (xs <= amaxx)]
    ys = ys[(ys >= aminy) & (ys <= amaxy)]
    cx = (bx0[:, None] <= xs[None, :-1]) & (bx1[:, None] >= xs[None, 1:])
    cy = (by0[:, None] <= ys[None, :-1]) & (by1[:, None] >= ys[None, 1:])
    covered = (cx.astype(np.uint8).T @ cy.astype(np.uint8)) > 0  # (nx, ny)
    return covered, xs, ys


def _grid_pieces(mask: np.ndarray, xs: np.ndarray, ys: np.ndarray):
    """(area, run-merged rect pieces) of the True cells of ``mask``."""
    dx = np.diff(xs)
    dy = np.diff(ys)
    area = float(np.sum(mask * dx[:, None] * dy[None, :]))
    pieces = []
    for j in range(len(dy)):
        col = mask[:, j]
        i = 0
        while i < len(col):
            if col[i]:
                k = i
                while k + 1 < len(col) and col[k + 1]:
                    k += 1
                pieces.append((xs[i], ys[j], xs[k + 1], ys[j + 1]))
                i = k + 1
            else:
                i += 1
    return area, pieces


def overlay_remainders(a, b, zoom: int = 10, fid_a: str = "fid_a",
                       fid_b: str = "fid_b", hot_cells=None):
    """Per-A-feature remainder/coverage against the union of its
    intersecting B features (both rect layers; B must carry wkb +
    envelope columns).  Returns one row per A feature:
    (fid_a, rem_area, cov_area, n_matches, rem_wkb MultiPolygon)."""
    b2 = b.map_batches(
        lambda t: (t.append_column("bminx", t.column("minx"))
                    .append_column("bminy", t.column("miny"))
                    .append_column("bmaxx", t.column("maxx"))
                    .append_column("bmaxy", t.column("maxy"))),
        batch_format="pyarrow",
    )
    pairs = join_chips_with_polygons(
        a, b2, zoom=zoom,
        chip_cols=[fid_a, "minx", "miny", "maxx", "maxy"],
        poly_cols=[fid_b, "bminx", "bminy", "bmaxx", "bmaxy"],
        hot_cells=hot_cells,
    )

    def bare(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            fid_a: t.column(fid_a).cast(pa.int64()),
            "minx": t.column("minx"), "miny": t.column("miny"),
            "maxx": t.column("maxx"), "maxy": t.column("maxy"),
            fid_b: pa.array(np.full(n, -1, np.int64)),
            "bminx": pa.nulls(n, pa.float64()),
            "bminy": pa.nulls(n, pa.float64()),
            "bmaxx": pa.nulls(n, pa.float64()),
            "bmaxy": pa.nulls(n, pa.float64()),
        })

    cols = [fid_a, "minx", "miny", "maxx", "maxy",
            fid_b, "bminx", "bminy", "bmaxx", "bmaxy"]
    u = pairs.select_columns(cols).union(
        a.map_batches(bare, batch_format="pyarrow").select_columns(cols)
    )

    def rem_group(g: pa.Table) -> pa.Table:
        fid = int(g.column(fid_a)[0].as_py())
        ax0 = float(g.column("minx")[0].as_py())
        ay0 = float(g.column("miny")[0].as_py())
        ax1 = float(g.column("maxx")[0].as_py())
        ay1 = float(g.column("maxy")[0].as_py())
        fb = g.column(fid_b).to_numpy(zero_copy_only=False)
        m = fb >= 0
        area_a = (ax1 - ax0) * (ay1 - ay0)
        if not m.any():
            rem_pieces = [(ax0, ay0, ax1, ay1)]
            rem_area, cov_area, cov_pieces, n_match = area_a, 0.0, [], 0
        else:
            bx0 = np.maximum(g.column("bminx").to_numpy(zero_copy_only=False)[m], ax0)
            by0 = np.maximum(g.column("bminy").to_numpy(zero_copy_only=False)[m], ay0)
            bx1 = np.minimum(g.column("bmaxx").to_numpy(zero_copy_only=False)[m], ax1)
            by1 = np.minimum(g.column("bmaxy").to_numpy(zero_copy_only=False)[m], ay1)
            covered, xs, ys = _cover_grid(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1)
            rem_area, rem_pieces = _grid_pieces(~covered, xs, ys)
            cov_area, cov_pieces = _grid_pieces(covered, xs, ys)
            n_match = int(m.sum())

        def mp(pieces):
            return geom.wkb_multipolygon([
                [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])]
                for (x0, y0, x1, y1) in pieces
            ]) if pieces else b""

        return pa.table({
            fid_a: pa.array([fid], pa.int64()),
            "rem_area": pa.array([rem_area], pa.float64()),
            "cov_area": pa.array([cov_area], pa.float64()),
            "n_matches": pa.array([n_match], pa.int64()),
            "rem_wkb": pa.array([mp(rem_pieces)], pa.binary()),
            "cov_wkb": pa.array([mp(cov_pieces)], pa.binary()),
        })

    return u.groupby(fid_a).map_groups(rem_group, batch_format="pyarrow")


def overlay_layers(a, b, op: str, zoom: int = 10):
    """Full layer-algebra overlay for rect layers — the 7-method
    surface of ogrlayer.cpp (Intersection :3345, Union :3763,
    SymDifference :4300, Identity :4730, Update :5148, Clip :5497,
    Erase :5806).  ``a`` carries (fid_a, minx..maxy [, wkb]); ``b``
    carries (fid_b, wkb, minx..maxy).  Output rows are tagged by
    ``part``: 'pair' rows carry the pairwise intersection geometry
    (fid_a, fid_b, wkb, area); 'a_rem' / 'b_rem' rows carry the
    per-feature remainder MultiPolygon; 'b_full' rows (Update) pass B
    through unchanged.  Empty geometries are dropped (the reference
    skips them)."""
    import pyarrow.compute as pc

    def pairs_part():
        out = join_chips_with_polygons(
            a, b, zoom=zoom, chip_cols=["fid_a"], poly_cols=["fid_b"],
            emit_geometry=True,
        )
        return out.map_batches(lambda t: pa.table({
            "part": pa.array(["pair"] * t.num_rows, pa.string()),
            "fid_a": t.column("fid_a").cast(pa.int64()),
            "fid_b": t.column("fid_b").cast(pa.int64()),
            "wkb": t.column("inter_wkb"),
            "area": t.column("inter_area"),
        }), batch_format="pyarrow").filter(expr="area > 0.0")

    def rem_part(x, y, tag, fx, fy):
        rem = overlay_remainders(x, y, zoom=zoom, fid_a=fx, fid_b=fy)
        return rem.map_batches(lambda t: pa.table({
            "part": pa.array([tag] * t.num_rows, pa.string()),
            "fid_a": (t.column(fx) if tag == "a_rem"
                      else pa.nulls(t.num_rows, pa.int64())).cast(pa.int64()),
            "fid_b": (t.column(fx) if tag == "b_rem"
                      else pa.nulls(t.num_rows, pa.int64())).cast(pa.int64()),
            "wkb": t.column("rem_wkb"),
            "area": t.column("rem_area"),
        }), batch_format="pyarrow").filter(expr="area > 0.0")

    def b_full():
        def fn(t: pa.Table) -> pa.Table:
            area = pc.multiply(
                pc.subtract(t.column("maxx"), t.column("minx")),
                pc.subtract(t.column("maxy"), t.column("miny")),
            )
            return pa.table({
                "part": pa.array(["b_full"] * t.num_rows, pa.string()),
                "fid_a": pa.nulls(t.num_rows, pa.int64()),
                "fid_b": t.column("fid_b").cast(pa.int64()),
                "wkb": t.column("wkb"),
                "area": pc.cast(area, pa.float64()),
            })
        return b.map_batches(fn, batch_format="pyarrow")

    def clip_part():
        rem = overlay_remainders(a, b, zoom=zoom)
        return rem.map_batches(lambda t: pa.table({
            "part": pa.array(["a_clip"] * t.num_rows, pa.string()),
            "fid_a": t.column("fid_a").cast(pa.int64()),
            "fid_b": pa.nulls(t.num_rows, pa.int64()),
            "wkb": t.column("cov_wkb"),
            "area": t.column("cov_area"),
        }), batch_format="pyarrow").filter(expr="area > 0.0")

    a_rem = lambda: rem_part(a, b, "a_rem", "fid_a", "fid_b")  # noqa: E731
    b_rem = lambda: rem_part(b, a, "b_rem", "fid_b", "fid_a")  # noqa: E731
    if op == "intersection":
        return pairs_part()
    if op == "erase":
        return a_rem()
    if op == "clip":
        return clip_part()  # per-A geometry clipped to union(B)
    if op == "union":
        return pairs_part().union(a_rem()).union(b_rem())
    if op == "symdifference":
        return a_rem().union(b_rem())
    if op == "identity":
        return pairs_part().union(a_rem())
    if op == "update":
        return a_rem().union(b_full())
    raise ValueError(f"unknown overlay op: {op}")
