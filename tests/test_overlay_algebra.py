"""Layer-algebra overlay tests (ogrlayer.cpp Union/SymDifference/
Identity/Update/Clip/Erase :3763-:5806): remainders exact vs a
brute-force pixel grid, op compositions via area-conservation
identities."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.geom import wkb_polygon


def _mk(n, seed, fid_name):
    r = np.random.default_rng(seed)
    cx = r.integers(0, 200, n) * 100.0
    cy = r.integers(0, 200, n) * 100.0
    hw = r.integers(5, 40, n) * 100.0
    return pa.table({
        fid_name: pa.array(np.arange(n), pa.int64()),
        "minx": pa.array(cx - hw), "miny": pa.array(cy - hw),
        "maxx": pa.array(cx + hw), "maxy": pa.array(cy + hw),
        "wkb": pa.array([
            wkb_polygon([np.array([
                [cx[i] - hw[i], cy[i] - hw[i]], [cx[i] + hw[i], cy[i] - hw[i]],
                [cx[i] + hw[i], cy[i] + hw[i]], [cx[i] - hw[i], cy[i] + hw[i]],
                [cx[i] - hw[i], cy[i] - hw[i]]])])
            for i in range(n)], pa.binary()),
    })


@pytest.fixture(scope="module")
def layers(ray_session):
    import ray.data as rd

    ta, tb = _mk(40, 1, "fid_a"), _mk(15, 2, "fid_b")
    return ta, tb, rd.from_arrow(ta), rd.from_arrow(tb)


def test_remainders_match_brute_force_grid(layers):
    from gdal_ray.stages.join import overlay_remainders

    ta, tb, A, B = layers
    rem = overlay_remainders(A, B, zoom=10).to_pandas().set_index("fid_a")
    am = {c: ta.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    bm = {c: tb.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    for i in range(ta.num_rows):
        x0, y0 = am["minx"][i], am["miny"][i]
        x1, y1 = am["maxx"][i], am["maxy"][i]
        gx = np.arange(x0, x1, 100.0) + 50.0
        gy = np.arange(y0, y1, 100.0) + 50.0
        GX, GY = np.meshgrid(gx, gy)
        cov = np.zeros(GX.shape, bool)
        for j in range(tb.num_rows):
            cov |= ((GX > bm["minx"][j]) & (GX < bm["maxx"][j])
                    & (GY > bm["miny"][j]) & (GY < bm["maxy"][j]))
        rem_true = float((~cov).sum()) * 100.0 * 100.0
        assert rem.loc[i, "rem_area"] == pytest.approx(rem_true, abs=1e-6)
        assert rem.loc[i, "cov_area"] == pytest.approx(
            (x1 - x0) * (y1 - y0) - rem_true, abs=1e-6)


def test_overlay_op_identities(layers):
    from gdal_ray.stages.join import overlay_layers

    ta, tb, A, B = layers
    am = {c: ta.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    bm = {c: tb.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    uni = overlay_layers(A, B, "union", zoom=10).to_pandas()
    sym = overlay_layers(A, B, "symdifference", zoom=10).to_pandas()
    ide = overlay_layers(A, B, "identity", zoom=10).to_pandas()
    upd = overlay_layers(A, B, "update", zoom=10).to_pandas()
    clp = overlay_layers(A, B, "clip", zoom=10).to_pandas()
    ers = overlay_layers(A, B, "erase", zoom=10).to_pandas()
    area_a = float(((am["maxx"] - am["minx"]) * (am["maxy"] - am["miny"])).sum())
    # erase + clip partition layer A exactly
    assert ers["area"].sum() + clp["area"].sum() == pytest.approx(area_a)
    # pair parts match the closed-form pairwise rect intersections
    pair_true = 0.0
    for i in range(ta.num_rows):
        w = np.maximum(np.minimum(am["maxx"][i], bm["maxx"])
                       - np.maximum(am["minx"][i], bm["minx"]), 0)
        h = np.maximum(np.minimum(am["maxy"][i], bm["maxy"])
                       - np.maximum(am["miny"][i], bm["miny"]), 0)
        pair_true += float((w * h).sum())
    assert uni[uni.part == "pair"]["area"].sum() == pytest.approx(pair_true)
    # symdifference = union's remainder parts; identity = pairs + a_rem
    assert sym["area"].sum() == pytest.approx(
        uni[uni.part == "a_rem"]["area"].sum()
        + uni[uni.part == "b_rem"]["area"].sum())
    assert ide["area"].sum() == pytest.approx(
        uni[uni.part == "pair"]["area"].sum()
        + uni[uni.part == "a_rem"]["area"].sum())
    # update = a_rem + B passthrough (every B feature present)
    assert set(upd.part) <= {"a_rem", "b_full"}
    assert (upd.part == "b_full").sum() == tb.num_rows


def test_remainder_multipolygon_roundtrip(layers):
    from gdal_ray.functions import geom
    from gdal_ray.stages.join import overlay_remainders

    _, _, A, B = layers
    rem = overlay_remainders(A, B, zoom=10).to_pandas()
    row = rem[rem.n_matches > 0].iloc[0]
    if row.rem_wkb:
        polys = geom.polygon_rings(geom.parse_wkb(row.rem_wkb))
        total = sum(geom.ring_area(r) for rings in polys for r in rings)
        assert total == pytest.approx(row.rem_area)
