"""Proximity/sieve/fillnodata vs hand oracles; grid interpolation with
halo correctness at cell borders; point query sampling."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import mercator, rasterops


def test_proximity_exact():
    m = np.zeros((8, 8), dtype=bool)
    m[2, 3] = True
    d = rasterops.proximity(m)
    assert d[2, 3] == 0
    assert d[2, 4] == 1
    assert np.isclose(d[4, 5], np.hypot(2, 2))
    # brute force oracle
    ys, xs = np.mgrid[0:8, 0:8]
    want = np.hypot(ys - 2, xs - 3)
    assert np.allclose(d, want)


def test_proximity_maxdist():
    m = np.zeros((8, 8), dtype=bool)
    m[0, 0] = True
    d = rasterops.proximity(m, max_dist=3.0)
    assert d.max() == 3.0


def test_sieve_merges_small_component():
    g = np.zeros((10, 10), dtype=np.uint8)
    g[:, :5] = 7  # big region value 7
    g[4, 6] = 9  # single isolated pixel value 9 inside background 0
    out = rasterops.sieve(g, threshold=3)
    assert (out[:, :5] == 7).all()
    assert out[4, 6] == 0  # merged into surrounding background


def test_fillnodata_fills_holes():
    g = np.full((6, 6), 100, dtype=np.uint8)
    valid = np.ones((6, 6), dtype=bool)
    g[3, 3] = 0
    valid[3, 3] = False
    out = rasterops.fillnodata(g, valid)
    assert out[3, 3] == 100
    assert (out[valid] == 100).all()


def test_grid_invdist_exact_hit_and_ties():
    px = np.array([10.0, 20.0])
    py = np.array([10.0, 20.0])
    pv = np.array([5.0, 15.0])
    xs = np.array([10.0, 15.0])
    ys = np.array([10.0])
    out = rasterops.grid_invdist(px, py, pv, xs, ys)
    assert out[0, 0] == 5.0  # exact hit -> point value
    # midpoint-ish: weighted toward nearer point
    assert 5.0 < out[0, 1] < 15.0


def test_grid_nearest():
    px = np.array([0.0, 100.0])
    py = np.array([0.0, 0.0])
    pv = np.array([1.0, 2.0])
    xs = np.array([10.0, 90.0])
    ys = np.array([0.0])
    out = rasterops.grid_nearest(px, py, pv, xs, ys)
    assert out.tolist() == [[1.0, 2.0]]


def test_grid_points_halo_consistency(ray_session):
    """A point just across a cell border must influence the neighbor
    cell's border pixels (the 1-ring halo)."""
    import ray.data as rd

    from gdal_ray.stages.grid import grid_points

    Z = 8
    tx, ty = (int(v) for v in mercator.meters_to_tile(500_000.0, 500_000.0, Z))
    minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, Z)
    w = maxx - minx
    # point A owned by the EAST neighbor, just across the border;
    # point B in the center of (tx,ty).  (tx,ty)'s east-border pixels
    # must see A through the halo (nearest -> A's value).
    pts = pa.table(
        {
            "pid": pa.array([0, 1], pa.int64()),
            "x": pa.array([maxx + 0.01 * w, minx + 0.5 * w]),
            "y": pa.array([miny + 0.5 * w, miny + 0.5 * w]),
            "v": pa.array([200.0, 50.0]),
        }
    )
    out = grid_points(
        rd.from_arrow(pts), zoom=Z, algorithm="nearest", grid_size=16
    ).to_pandas()
    own = out[(out.x == tx) & (out.y == ty)]
    assert len(own) == 1
    grid = np.frombuffer(own.iloc[0].grid, dtype=np.float64).reshape(16, 16)
    assert grid[8, 15] == 200.0  # east border pixel -> halo point A
    assert grid[8, 7] == 50.0  # center pixel -> owned point B


def test_query_points_in_chips(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.grid import query_points_in_chips

    imgs = rd.read_parquet(smoke_fixtures["images"])
    one = imgs.take(1)[0]
    cx = (one["minx"] + one["maxx"]) / 2
    cy = (one["miny"] + one["maxy"]) / 2
    probes = rd.from_arrow(
        pa.table({"pid": pa.array([0], pa.int64()), "x": [cx], "y": [cy]})
    )
    res = query_points_in_chips(imgs, probes, zoom=10, num_partitions=4).to_pandas()
    assert one["image_id"] in set(res.image_id)
    row = res[res.image_id == one["image_id"]].iloc[0]
    from gdal_ray.functions import codecs

    img = codecs.decode(one["bytes"], one["w"], one["h"], one["fmt"])
    # center sample should be close to the center pixel value
    hc, wc = img.shape[0] // 2, img.shape[1] // 2
    assert abs(row.r - float(img[hc, wc, 0])) <= 16
