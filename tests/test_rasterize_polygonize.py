"""Rasterize -> polygonize round trip (golden case 6, FIXTURES.md):
burned-pixel counts match the scanline oracle; a shape spanning 4 cells
comes back as ONE merged component (seam merge)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import geom, mercator
from gdal_ray.functions.geom import wkb_polygon

Z = 10


def _rect_wkb(minx, miny, maxx, maxy):
    return wkb_polygon(
        [
            np.array(
                [
                    [minx, miny],
                    [maxx, miny],
                    [maxx, maxy],
                    [minx, maxy],
                    [minx, miny],
                ]
            )
        ]
    )


@pytest.fixture(scope="module")
def poly_table():
    # one rect inside a single cell; one rect spanning a 2x2 cell corner
    tx, ty = (int(v) for v in mercator.meters_to_tile(500_000.0, 500_000.0, Z))
    cminx, cminy, cmaxx, cmaxy = mercator.tile_bounds(tx, ty, Z)
    w = cmaxx - cminx
    small = (cminx + 0.2 * w, cminy + 0.2 * w, cminx + 0.4 * w, cminy + 0.4 * w)
    # centered on the cell's top-right corner -> spans 4 cells
    big = (cmaxx - 0.3 * w, cmaxy - 0.3 * w, cmaxx + 0.3 * w, cmaxy + 0.3 * w)
    rows = []
    for fid, (r, val) in enumerate(((small, 3), (big, 7))):
        rows.append(
            {
                "fid": fid,
                "wkb": _rect_wkb(*r),
                "minx": r[0],
                "miny": r[1],
                "maxx": r[2],
                "maxy": r[3],
                "burn": val,
            }
        )
    return pa.Table.from_pylist(rows)


def test_rasterize_counts_match_scanline_oracle(ray_session, poly_table):
    import ray.data as rd

    from gdal_ray.stages.rasterize import rasterize_polygons

    cells = rasterize_polygons(
        rd.from_arrow(poly_table), zoom=Z, value_col="burn"
    ).to_pandas()
    # big spans 4 cells; small shares the big's SW cell -> 4 distinct cells
    assert len(cells) == 4
    res = float(mercator.resolution(Z))
    # oracle: count pixels whose center lies inside each rect
    total = {3: 0, 7: 0}
    for r in cells.itertuples():
        g = np.frombuffer(r.grid_bytes, dtype=np.uint8).reshape(256, 256)
        total[3] += int((g == 3).sum())
        total[7] += int((g == 7).sum())
    t = poly_table.to_pylist()
    for row, val in ((t[0], 3), (t[1], 7)):
        nx = _pixels_between(row["minx"], row["maxx"], res)
        ny = _pixels_between(row["miny"], row["maxy"], res)
        assert total[val] == nx * ny


def _pixels_between(lo, hi, res):
    # pixel centers on the global grid: (k + 0.5) * res
    import math

    k0 = math.ceil(lo / res - 0.5)
    k1 = math.ceil(hi / res - 0.5)  # exclusive (half-open parity rule)
    return max(0, k1 - k0)


def test_polygonize_merges_across_cells(ray_session, poly_table):
    import ray.data as rd

    from gdal_ray.stages.polygonize import polygonize
    from gdal_ray.stages.rasterize import rasterize_polygons

    cells = rasterize_polygons(rd.from_arrow(poly_table), zoom=Z, value_col="burn")
    comps = polygonize(cells).to_pandas()
    by_val = comps.groupby("value")
    assert len(comps[comps.value == 3]) == 1  # small rect: one component
    big = comps[comps.value == 7]
    assert len(big) == 1  # seam-merged into ONE component
    assert big.iloc[0].n_cells == 4  # spanning the 2x2 corner
    # pixel counts survive the merge
    cellsdf = cells.to_pandas()
    n7 = sum(
        int((np.frombuffer(r.grid_bytes, dtype=np.uint8) == 7).sum())
        for r in cellsdf.itertuples()
    )
    assert big.iloc[0].pixel_count == n7


def test_all_touched_superset(ray_session, poly_table):
    import ray.data as rd

    from gdal_ray.stages.rasterize import rasterize_polygons

    plain = rasterize_polygons(
        rd.from_arrow(poly_table), zoom=Z, value_col="burn"
    ).to_pandas()
    touched = rasterize_polygons(
        rd.from_arrow(poly_table), zoom=Z, value_col="burn", all_touched=True
    ).to_pandas()

    def count(df):
        return sum(
            int((np.frombuffer(r.grid_bytes, dtype=np.uint8) > 0).sum())
            for r in df.itertuples()
        )

    assert count(touched) > count(plain)


def test_polygonize_many_cross_border_components(ray_session):
    """A stack of horizontal stripes crossing a vertical cell border:
    every stripe is one merged component (the seam-merge pair graph has
    hundreds of edges; the min-label propagation must converge with no
    driver-side adjacency)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.functions import mercator
    from gdal_ray.stages.polygonize import polygonize

    z = 10
    tx, ty = 500, 500
    n_stripes = 120
    ga = np.zeros((256, 256), dtype=np.uint8)
    gb = np.zeros((256, 256), dtype=np.uint8)
    for k in range(n_stripes):
        row = 2 * k
        ga[row, 128:] = 1 + (k % 3)
        gb[row, :128] = 1 + (k % 3)
    cells = rd.from_arrow(
        pa.table(
            {
                "cell": pa.array(
                    [int(mercator.pack_cell(z, tx, ty)), int(mercator.pack_cell(z, tx + 1, ty))],
                    pa.int64(),
                ),
                "z": pa.array([z, z], pa.int32()),
                "x": pa.array([tx, tx + 1], pa.int32()),
                "y": pa.array([ty, ty], pa.int32()),
                "grid_bytes": pa.array([ga.tobytes(), gb.tobytes()], pa.binary()),
            }
        )
    )
    comps = polygonize(cells).to_pandas()
    assert len(comps) == n_stripes            # each stripe merged across the border
    assert (comps.n_cells == 2).all()
    assert (comps.pixel_count == 256).all()   # 128 px per side
