"""Cross-cell contour stitching (round-2 op)."""

import numpy as np
import pyarrow as pa
import pytest


def _cells_ds(grids, z=8):
    import ray.data as rd

    from gdal_ray.functions import mercator

    rows = {"cell": [], "z": [], "x": [], "y": [], "grid_bytes": []}
    for (tx, ty), g in grids.items():
        rows["cell"].append(int(mercator.pack_cell(z, tx, ty)))
        rows["z"].append(z)
        rows["x"].append(tx)
        rows["y"].append(ty)
        rows["grid_bytes"].append(np.asarray(g, np.float64).tobytes())
    return rd.from_arrow(pa.table({k: pa.array(v) for k, v in rows.items()}))


def test_circle_spanning_four_cells_is_one_closed_ring(ray_session):
    """A radial cone centered on the shared corner of a 2x2 cell block:
    the iso-circle crosses all four cells and must stitch into exactly
    ONE closed polyline."""
    from gdal_ray.functions import mercator
    from gdal_ray.stages.contour import contour_cells

    z, gx, gy, grid = 8, 200, 200, 64
    # shared corner (center of the 2x2 block) in meters
    minx, miny, maxx, maxy = mercator.tile_bounds(gx + 1, gy + 1, z)
    cx, cy = float(minx), float(miny)
    grids = {}
    for tx in (gx, gx + 1):
        for ty in (gy, gy + 1):
            tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
            res = (tmaxx - tminx) / grid
            xs = tminx + (np.arange(grid) + 0.5) * res
            ys = tmaxy - (np.arange(grid) + 0.5) * res
            d = np.hypot(xs[None, :] - cx, ys[:, None] - cy)
            grids[(tx, ty)] = 200.0 - d / 1000.0  # cone, peak 200 at corner
    out = contour_cells(_cells_ds(grids), levels=(128.0,)).to_pandas()
    # level 128 -> circle of radius 72 km, well inside the 2x2 block
    assert len(out) == 1
    assert bool(out.closed.iloc[0])
    assert int(out.n_segments.iloc[0]) > 40
    # circumference ~ 2*pi*72km; marching-squares polyline is shorter
    # than the circle but within ~10%
    assert out.length_mm.iloc[0] / 1e6 == pytest.approx(2 * np.pi * 72.0, rel=0.1)


def test_open_chain_at_data_boundary(ray_session):
    """A linear ramp across a single cell: iso-lines end at the cell
    boundary (no neighbors) -> open polylines."""
    from gdal_ray.functions import mercator
    from gdal_ray.stages.contour import contour_cells

    z, tx, ty, grid = 8, 300, 300, 64
    tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
    res = (tmaxx - tminx) / grid
    xs = tminx + (np.arange(grid) + 0.5) * res
    g = np.repeat(((xs - tminx) / (tmaxx - tminx) * 255.0)[None, :], grid, axis=0)
    out = contour_cells(_cells_ds({(tx, ty): g}), levels=(128.0,)).to_pandas()
    assert len(out) == 1
    assert not bool(out.closed.iloc[0])


def test_distributed_propagation_matches_one_task(ray_session):
    """The >threshold distributed min-label path and the one-task
    union-find produce identical components."""
    import ray.data as rd

    from gdal_ray.stages.polygonize import min_label_components

    rng = np.random.RandomState(5)
    # chains + a few merges
    edges = []
    base = 0
    for chain in range(30):
        ln = rng.randint(2, 40)
        ids = base + np.arange(ln)
        edges.extend(zip(ids[:-1], ids[1:]))
        base += ln + 10
    t = pa.table(
        {
            "a": pa.array([int(a) for a, b in edges], pa.int64()),
            "b": pa.array([int(b) for a, b in edges], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    small = min_label_components(ds).to_pandas().sort_values("node").reset_index(drop=True)
    big = (
        min_label_components(rd.from_arrow(t), one_task_threshold=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert small.equals(big)


def test_polygon_bands_cone_four_cells(ray_session):
    """Polygon mode over the 4-cell cone: level 128 splits the domain
    into band 1 (the disk, one exterior ring) and band 0 (everything
    else: one domain-border exterior + the disk as a HOLE).  Checks
    ring counts, orientation signs, areas, and that the hole and the
    adjacent band's exterior are the SAME curve under DIFFERENT
    band-salted comp_ids (the cross-band collision regression)."""
    from gdal_ray.functions import mercator
    from gdal_ray.stages.contour import contour_polygon_cells

    z, gx, gy, grid = 8, 200, 200, 64
    minx, miny, maxx, maxy = mercator.tile_bounds(gx + 1, gy + 1, z)
    cx, cy = float(minx), float(miny)
    grids = {}
    for tx in (gx, gx + 1):
        for ty in (gy, gy + 1):
            tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
            res = (tmaxx - tminx) / grid
            xs = tminx + (np.arange(grid) + 0.5) * res
            ys = tmaxy - (np.arange(grid) + 0.5) * res
            d = np.hypot(xs[None, :] - cx, ys[:, None] - cy)
            grids[(tx, ty)] = 200.0 - d / 1000.0
    res_px = float(mercator.resolution(z)) * 256.0 / grid
    out = (
        contour_polygon_cells(_cells_ds(grids), levels=(128.0,))
        .to_pandas()
        .sort_values(["band", "area_px2_milli"])
        .reset_index(drop=True)
    )
    r_px = 72000.0 / res_px  # iso radius in pixels
    disk_px2 = np.pi * r_px * r_px
    b1 = out[out.band == 1]
    b0 = out[out.band == 0]
    assert len(b1) == 1 and len(b0) == 2
    # band 1: one exterior (negative) ring ~ disk area
    assert b1.area_px2_milli.iloc[0] < 0
    assert -b1.area_px2_milli.iloc[0] / 1000.0 == pytest.approx(disk_px2, rel=0.05)
    # band 0: domain exterior (negative, (2*grid-1)^2 node squares)
    # + the disk as a positive HOLE
    dom_px2 = float((2 * grid - 1) ** 2)
    ext = b0[b0.area_px2_milli < 0]
    hole = b0[b0.area_px2_milli > 0]
    assert len(ext) == 1 and len(hole) == 1
    assert -ext.area_px2_milli.iloc[0] / 1000.0 == pytest.approx(dom_px2, rel=0.02)
    assert hole.area_px2_milli.iloc[0] / 1000.0 == pytest.approx(disk_px2, rel=0.05)
    # the hole IS the band-1 exterior curve: same perimeter/segment
    # count, different band-salted comp_id
    assert int(hole.n_segments.iloc[0]) == int(b1.n_segments.iloc[0])
    assert int(hole.length_mm.iloc[0]) == int(b1.length_mm.iloc[0])
    assert int(hole.comp_id.iloc[0]) != int(b1.comp_id.iloc[0])
    # perimeter ~ circle circumference
    assert b1.length_mm.iloc[0] / 1e6 == pytest.approx(2 * np.pi * 72.0, rel=0.1)


def test_polygon_bands_ramp_single_cell(ray_session):
    """Polygon mode on a single-cell x-ramp: each band is one closed
    region ring; band areas partition the cell domain."""
    from gdal_ray.functions import mercator
    from gdal_ray.stages.contour import contour_polygon_cells

    z, tx, ty, grid = 8, 300, 300, 64
    tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
    xs = tminx + (np.arange(grid) + 0.5) * (tmaxx - tminx) / grid
    g = np.repeat(((xs - tminx) / (tmaxx - tminx) * 255.0)[None, :], grid, axis=0)
    out = contour_polygon_cells(_cells_ds({(tx, ty): g}), levels=(128.0,)).to_pandas()
    assert len(out) == 2
    assert set(out.band) == {0, 1}
    assert (out.area_px2_milli < 0).all()  # two exteriors, no holes
    dom_px2 = float((grid - 1) ** 2)
    total = -out.area_px2_milli.sum() / 1000.0
    assert total == pytest.approx(dom_px2, abs=0.1)


def test_polygon_rings_emit_wkb_geometry(ray_session):
    """contour_polygon_rings emits one WKB POLYGON per ring whose
    shoelace area and identity match the stats mode exactly (same CC
    roots), with rings closed and n_points == n_segments + 1."""
    from gdal_ray.functions import mercator
    from gdal_ray.functions.geom import parse_wkb
    from gdal_ray.stages.contour import (
        contour_polygon_cells,
        contour_polygon_rings,
    )

    z, gx, gy, grid = 8, 200, 200, 64
    minx, miny, maxx, maxy = mercator.tile_bounds(gx + 1, gy + 1, z)
    cx, cy = float(minx), float(miny)
    grids = {}
    for tx in (gx, gx + 1):
        for ty in (gy, gy + 1):
            tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
            res = (tmaxx - tminx) / grid
            xs = tminx + (np.arange(grid) + 0.5) * res
            ys = tmaxy - (np.arange(grid) + 0.5) * res
            d = np.hypot(xs[None, :] - cx, ys[:, None] - cy)
            grids[(tx, ty)] = 200.0 - d / 1000.0
    stats = (
        contour_polygon_cells(_cells_ds(grids), levels=(128.0,))
        .to_pandas().set_index(["band", "comp_id"]).sort_index()
    )
    rings = (
        contour_polygon_rings(_cells_ds(grids), levels=(128.0,), zoom=z)
        .to_pandas().set_index(["band", "comp_id"]).sort_index()
    )
    assert list(stats.index) == list(rings.index)  # identical ring identity
    assert (rings.area_px2_milli == stats.area_px2_milli).all()
    assert (rings.n_points == stats.n_segments + 1).all()
    res_px = float(mercator.resolution(z)) * 256.0 / grid
    for (band, comp), row in rings.iterrows():
        geom = parse_wkb(bytes(row.wkb))
        ring = geom[1][0] if isinstance(geom, tuple) else geom["rings"][0]
        ring = np.asarray(ring, np.float64)
        assert (ring[0] == ring[-1]).all()
        # y-down px -> y-up meters flips the shoelace sign
        sh = 0.5 * np.sum(
            (ring[:-1, 0] + ring[1:, 0]) * (ring[1:, 1] - ring[:-1, 1])
        )
        expect_m2 = -(row.area_px2_milli / 1000.0) * res_px * res_px
        assert sh == pytest.approx(expect_m2, rel=1e-6, abs=1.0)


def test_polygon_levels_unsorted_and_node_equal_value(ray_session):
    """Unsorted level lists sort before banding, and grid values
    EXACTLY equal to a level take the reference's value fudge
    (marching_squares/utility.h:30-47) instead of crashing seam
    pairing."""
    from gdal_ray.functions import mercator
    from gdal_ray.stages.contour import contour_polygon_cells

    z, tx, ty, grid = 8, 300, 300, 64
    tminx, tminy, tmaxx, tmaxy = mercator.tile_bounds(tx, ty, z)
    xs = tminx + (np.arange(grid) + 0.5) * (tmaxx - tminx) / grid
    # integer-valued ramp 0..252: many nodes EXACTLY equal 64/128
    g = np.repeat(np.floor(
        (xs - tminx) / (tmaxx - tminx) * 253.0)[None, :], grid, axis=0)
    out = (
        contour_polygon_cells(_cells_ds({(tx, ty): g}),
                              levels=(128.0, 64.0))  # unsorted on purpose
        .to_pandas()
    )
    assert set(out.band) == {0, 1, 2}
    assert len(out) == 3
    assert (out.area_px2_milli < 0).all()
    dom_px2 = float((grid - 1) ** 2)
    assert -out.area_px2_milli.sum() / 1000.0 == pytest.approx(dom_px2, abs=0.1)
