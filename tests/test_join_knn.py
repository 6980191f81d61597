"""Spatial join + kNN vs brute-force oracles (golden case 4/5,
FIXTURES.md)."""

import glob

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gdal_ray.functions import geom
from gdal_ray.synth.make_table import Z_JOIN


def _read_all(path, columns=None):
    return pa.concat_tables(
        pq.read_table(f, columns=columns) for f in sorted(glob.glob(path + "/*.parquet"))
    )


@pytest.fixture(scope="module")
def oracle_pip(smoke_fixtures):
    tp = _read_all(smoke_fixtures["points"]).to_pydict()
    tl = _read_all(smoke_fixtures["polygons"]).to_pydict()
    xs, ys, pids = np.array(tp["x"]), np.array(tp["y"]), np.array(tp["pid"])
    want = set()
    for k in range(len(tl["fid"])):
        m = geom.points_intersect_geom(xs, ys, geom.parse_wkb(tl["wkb"][k]))
        for p in pids[m]:
            want.add((int(p), int(tl["fid"][k])))
    return want


def test_pip_join_matches_oracle(ray_session, smoke_fixtures, oracle_pip):
    import ray.data as rd

    from gdal_ray.stages.join import join_points_in_polygons

    pts = rd.read_parquet(smoke_fixtures["points"])
    pol = rd.read_parquet(smoke_fixtures["polygons"])
    res = join_points_in_polygons(
        pts, pol, zoom=Z_JOIN, num_partitions=8, point_cols=["pid"], poly_cols=["fid"]
    ).to_pandas()
    got = set(zip(res.pid, res.fid))
    assert got == oracle_pip
    assert len(res) == len(got)  # exactly-once


def test_pip_join_salted_equals_unsalted(ray_session, smoke_fixtures, oracle_pip):
    import ray.data as rd

    from gdal_ray.functions import mercator
    from gdal_ray.stages.join import join_points_in_polygons

    # salt the hot cell (and one arbitrary cell) and expect identical output
    hot_tx, hot_ty = mercator.meters_to_tile(100_000.0, 100_000.0, Z_JOIN)
    hot = int(mercator.pack_cell(Z_JOIN, int(hot_tx), int(hot_ty)))
    pts = rd.read_parquet(smoke_fixtures["points"])
    pol = rd.read_parquet(smoke_fixtures["polygons"])
    res = join_points_in_polygons(
        pts,
        pol,
        zoom=Z_JOIN,
        num_partitions=8,
        point_cols=["pid"],
        poly_cols=["fid"],
        hot_cells={hot: 4},
    ).to_pandas()
    got = set(zip(res.pid, res.fid))
    assert got == oracle_pip
    assert len(res) == len(got)


def test_semi_and_anti_join(ray_session, smoke_fixtures, oracle_pip):
    import ray.data as rd

    from gdal_ray.stages.join import semi_join_points

    pts = rd.read_parquet(smoke_fixtures["points"])
    matched = {p for p, _ in oracle_pip}
    semi = semi_join_points(pts, matched).to_pandas()
    anti = semi_join_points(pts, matched, anti=True).to_pandas()
    assert set(semi.pid) == matched
    assert set(anti.pid).isdisjoint(matched)
    assert len(semi) + len(anti) == pts.count()


@pytest.fixture(scope="module")
def oracle_chips(smoke_fixtures):
    ti = _read_all(
        smoke_fixtures["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"]
    ).to_pydict()
    tl = _read_all(smoke_fixtures["polygons"]).to_pydict()
    want = set()
    for k in range(len(tl["fid"])):
        rings_list = geom.polygon_rings(geom.parse_wkb(tl["wkb"][k]))
        for j in range(len(ti["image_id"])):
            if (
                ti["maxx"][j] < tl["minx"][k]
                or ti["minx"][j] > tl["maxx"][k]
                or ti["maxy"][j] < tl["miny"][k]
                or ti["miny"][j] > tl["maxy"][k]
            ):
                continue
            rect = np.array(
                [
                    [ti["minx"][j], ti["miny"][j]],
                    [ti["maxx"][j], ti["miny"][j]],
                    [ti["maxx"][j], ti["maxy"][j]],
                    [ti["minx"][j], ti["maxy"][j]],
                    [ti["minx"][j], ti["miny"][j]],
                ]
            )
            if any(geom.polygons_intersect([rect], rings) for rings in rings_list):
                want.add((ti["image_id"][j], int(tl["fid"][k])))
    return want


@pytest.mark.parametrize("strategy", ["groupby", "hashjoin"])
def test_chips_join_matches_oracle(ray_session, smoke_fixtures, oracle_chips, strategy):
    import ray.data as rd

    from gdal_ray.stages.join import join_chips_with_polygons

    chips = rd.read_parquet(
        smoke_fixtures["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"]
    )
    pol = rd.read_parquet(smoke_fixtures["polygons"])
    res = join_chips_with_polygons(
        chips, pol, zoom=Z_JOIN, num_partitions=8,
        chip_cols=["image_id"], poly_cols=["fid"], strategy=strategy,
    ).to_pandas()
    got = set(zip(res.image_id, res.fid))
    assert got == oracle_chips
    assert len(res) == len(got)  # exactly-once across cells


def test_chips_join_salted_equals_unsalted(ray_session, smoke_fixtures, oracle_chips):
    import ray.data as rd

    from gdal_ray.functions import mercator
    from gdal_ray.stages.join import join_chips_with_polygons

    hot_tx, hot_ty = mercator.meters_to_tile(100_000.0, 100_000.0, Z_JOIN)
    hot = {int(mercator.pack_cell(Z_JOIN, int(hot_tx), int(hot_ty))): 4}
    chips = rd.read_parquet(
        smoke_fixtures["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"]
    )
    pol = rd.read_parquet(smoke_fixtures["polygons"])
    res = join_chips_with_polygons(
        chips, pol, zoom=Z_JOIN, chip_cols=["image_id"], poly_cols=["fid"],
        hot_cells=hot,
    ).to_pandas()
    got = set(zip(res.image_id, res.fid))
    assert got == oracle_chips
    assert len(res) == len(got)


def test_detect_hot_cells_finds_constructed_skew(ray_session, smoke_fixtures):
    """The synth images put ~20% of chips in one z8 cell; the sampler
    must flag exactly that cell's z10 children."""
    import pyarrow as pa2
    import ray.data as rd

    from gdal_ray.functions import mercator
    from gdal_ray.stages.cells import detect_hot_cells

    imgs = rd.read_parquet(
        smoke_fixtures["images"], columns=["minx", "miny", "maxx", "maxy"]
    ).map_batches(
        lambda t: pa2.table(
            {
                "x": pa2.array(
                    (
                        t.column("minx").to_numpy(zero_copy_only=False)
                        + t.column("maxx").to_numpy(zero_copy_only=False)
                    )
                    / 2
                ),
                "y": pa2.array(
                    (
                        t.column("miny").to_numpy(zero_copy_only=False)
                        + t.column("maxy").to_numpy(zero_copy_only=False)
                    )
                    / 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    hot = detect_hot_cells(imgs, 10, sample_frac=0.5)
    assert hot, "constructed hot cluster not detected"
    tx, ty = mercator.meters_to_tile(100_000.0, 100_000.0, 8)
    for c in hot:
        _, x, y = mercator.unpack_cell(np.array([c]))
        assert (int(x) >> 2, int(y) >> 2) == (int(tx), int(ty))
        assert hot[c] >= 2


def test_knn_cell_ring_matches_bruteforce(ray_session):
    import ray.data as rd

    from gdal_ray.stages.knn import knn_broadcast, knn_cell_ring

    rng = np.random.RandomState(3)
    npts, nsites = 400, 120
    px, py = rng.uniform(0, 2.5e6, (2, npts))
    sx, sy = rng.uniform(0, 2.5e6, (2, nsites))
    pts = rd.from_arrow(pa.table({"pid": pa.array(np.arange(npts)), "x": px, "y": py}))
    sites_t = pa.table({"sid": pa.array(np.arange(nsites)), "x": sx, "y": sy})
    d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
    order = np.lexsort(
        (np.broadcast_to(np.arange(nsites), (npts, nsites)), d2), axis=1
    )[:, :5]
    want = [(p, int(order[p, r]), r + 1) for p in range(npts) for r in range(5)]

    res_b = knn_broadcast(pts, sites_t, k=5).to_pandas().sort_values(["pid", "rank"])
    assert list(zip(res_b.pid, res_b.sid, res_b["rank"])) == want

    res_r = (
        knn_cell_ring(pts, rd.from_arrow(sites_t), k=5, zoom=5, num_partitions=4)
        .to_pandas()
        .sort_values(["pid", "rank"])
    )
    assert list(zip(res_r.pid, res_r.sid, res_r["rank"])) == want
