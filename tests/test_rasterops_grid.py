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


def test_grid_invdistnn_semantics():
    """invdistnn vs a from-first-principles scalar loop (sorted-ascending
    accumulation like the reference's multimap walk), plus the nodata /
    radius / exact-hit branches."""
    import math

    from gdal_ray.functions.rasterops import grid_invdist, grid_invdistnn

    rng = np.random.default_rng(7)
    px = rng.uniform(0, 100, 40)
    py = rng.uniform(0, 100, 40)
    pv = rng.uniform(0, 255, 40)
    xs = np.linspace(5, 95, 12)
    ys = np.linspace(95, 5, 12)
    radius, max_pts, min_pts, smoothing = 30.0, 5, 2, 2.0
    out = grid_invdistnn(px, py, pv, xs, ys, radius=radius,
                         max_points=max_pts, min_points=min_pts,
                         smoothing=smoothing, nodata=-1.0)
    for r in (0, 5, 11):
        for c in (0, 6, 11):
            d2raw = (xs[c] - px) ** 2 + (ys[r] - py) ** 2
            d2 = d2raw + smoothing * smoothing
            cand = sorted(
                (float(d2[i]), float(pv[i]))
                for i in np.flatnonzero(d2raw <= radius * radius)
            )[:max_pts]
            if len(cand) < min_pts:
                assert out[r, c] == -1.0
                continue
            num = den = 0.0
            for dd, vv in cand:
                w = 1.0 / dd  # power=2 -> w = 1/r^2
                num += w * vv
                den += w
            assert math.isclose(out[r, c], num / den, rel_tol=1e-12)

    # max_points larger than N and huge radius, no smoothing ->
    # identical to plain invdist
    a = grid_invdistnn(px, py, pv, xs, ys, radius=1e6, max_points=1000)
    b = grid_invdist(px, py, pv, xs, ys)
    assert np.allclose(a, b, rtol=1e-12)

    # exact hit: grid node exactly on a point -> point value even with
    # a radius that excludes everything else
    xs2 = np.array([px[0]])
    ys2 = np.array([py[0]])
    hit = grid_invdistnn(px, py, pv, xs2, ys2, radius=1e-6, max_points=3,
                         min_points=1, nodata=-1.0)
    assert hit[0, 0] == pv[0]


def test_grid_linear_hot_cell_cap(ray_session):
    """Delaunay hot-cell guard: a dense cell is capped at linear_cap
    nearest-to-center points, deterministically, and the drop is
    REPORTED (n_dropped column), never silent."""
    import ray.data as rd

    from gdal_ray.functions import mercator
    from gdal_ray.functions.delaunay import grid_linear
    from gdal_ray.stages.grid import grid_points

    Z = 6
    tx, ty = 31, 30
    minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, Z)
    rng = np.random.default_rng(11)
    n = 300
    px = rng.uniform(minx, maxx, n)
    py = rng.uniform(miny, maxy, n)
    pv = rng.uniform(0, 255, n)
    pts = pa.table(
        {"pid": pa.array(np.arange(n), pa.int64()), "x": px, "y": py, "v": pv}
    )
    out = grid_points(
        rd.from_arrow(pts), zoom=Z, algorithm="linear", grid_size=16,
        linear_cap=100,
    ).to_pandas()
    own = out[(out.x == tx) & (out.y == ty)].iloc[0]
    # points landed in this cell AND its halo; the owner's group is
    # capped at 100 with the rest reported
    assert own.n_dropped > 0
    # capped result == direct call on the same deterministically
    # selected subset (canonical order, then nearest-100 to center)
    order = np.lexsort((pv, py, px))
    sx, sy, sv = px[order], py[order], pv[order]
    cx_c, cy_c = (minx + maxx) / 2.0, (miny + maxy) / 2.0
    d2c = (sx - cx_c) ** 2 + (sy - cy_c) ** 2
    keep = np.sort(np.argsort(d2c, kind="stable")[:100])
    res = (maxx - minx) / 16
    xs = minx + (np.arange(16) + 0.5) * res
    ys = maxy - (np.arange(16) + 0.5) * res
    ref = grid_linear(sx[keep], sy[keep], sv[keep], xs, ys)
    got = np.frombuffer(own.grid, dtype=np.float64).reshape(16, 16)
    assert (got == ref).all()
