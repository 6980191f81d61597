"""MVT round-trip via our decoder; pansharpen/nearblack semantics."""

import numpy as np
import pyarrow as pa

from gdal_ray.functions import mvt
from gdal_ray.stages.pansharpen import brovey_pansharpen, nearblack_mask


def test_mvt_roundtrip_polygon():
    ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]], dtype=np.int64)
    feats = [
        {
            "id": 7,
            "type": mvt.GEOM_POLYGON,
            "parts": [ring],
            "tags": {"fid": 7, "category": "parcel", "weight": 0.5},
        }
    ]
    data = mvt.encode_tile("test", feats)
    layers = mvt.decode_tile(data)
    assert "test" in layers
    lay = layers["test"]
    assert lay["extent"] == 4096
    f = lay["features"][0]
    assert f["id"] == 7 and f["type"] == mvt.GEOM_POLYGON
    assert np.array_equal(f["parts"][0], ring)  # ClosePath restores closure
    assert f["tags"] == {"fid": 7, "category": "parcel", "weight": 0.5}


def test_mvt_value_dedup_and_multi_features():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 0]], dtype=np.int64)
    feats = [
        {"id": i, "type": mvt.GEOM_POLYGON, "parts": [ring + i], "tags": {"cat": "x"}}
        for i in range(3)
    ]
    layers = mvt.decode_tile(mvt.encode_tile("l", feats))
    assert len(layers["l"]["features"]) == 3
    assert all(f["tags"] == {"cat": "x"} for f in layers["l"]["features"])


def test_mvt_writer_stage(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.mvt import write_mvt_tiles

    pol = rd.read_parquet(smoke_fixtures["polygons"])
    tiles = write_mvt_tiles(pol, zoom=8, layer_name="polys").to_pandas()
    assert len(tiles) > 0
    assert tiles.n_features.sum() >= pol.count()  # replicated per tile
    # every tile decodes and carries fid tags
    row = tiles.iloc[0]
    lay = mvt.decode_tile(row.mvt_bytes)["polys"]
    assert all("fid" in f["tags"] for f in lay["features"])


def test_brovey_identity_when_pan_matches():
    ms = np.full((4, 4, 3), 90, dtype=np.uint8)
    pan = np.full((8, 8), 90, dtype=np.uint8)
    out = brovey_pansharpen(ms, pan)
    assert (out == 90).all()
    # doubling pan doubles the output
    out2 = brovey_pansharpen(ms, (pan * 2).astype(np.uint8))
    assert (out2 == 180).all()


def test_nearblack_only_border_connected():
    img = np.full((10, 10, 3), 200, dtype=np.uint8)
    img[0:3, 0:3] = 0  # border-connected dark collar
    img[5:7, 5:7] = 0  # interior dark patch (must survive)
    m = nearblack_mask(img, near=15)
    assert m[0, 0] and m[2, 2]
    assert not m[5, 5] and not m[6, 6]


def test_viewshed_flat_all_visible():
    import numpy as np

    from gdal_ray.stages.viewshed import viewshed_mask

    flat = np.zeros((21, 21))
    assert viewshed_mask(flat).all()


def test_viewshed_wall_occludes():
    import numpy as np

    from gdal_ray.stages.viewshed import viewshed_mask

    elev = np.zeros((21, 21))
    elev[:, 14] = 100.0  # wall east of center (col 14, center col 10)
    m = viewshed_mask(elev, obs_height=2.0)
    assert m[10, 14]  # the wall top is visible
    assert not m[10, 18] and not m[10, 20]  # behind the wall: hidden
    assert m[10, 5]  # open west side visible


def test_viewshed_wang_flat_all_visible():
    import numpy as np

    from gdal_ray.stages.viewshed import viewshed_mask_wang

    flat = np.full((21, 21), 100.0)
    assert viewshed_mask_wang(flat).all()


def test_viewshed_wang_wall_occludes():
    import numpy as np

    from gdal_ray.stages.viewshed import viewshed_mask_wang

    elev = np.zeros((31, 31))
    elev[:, 20] = 50.0  # tall wall right of center
    m = viewshed_mask_wang(elev, obs_height=2.0)
    assert m[15, 15]
    assert m[:, 20].any()       # the wall face is visible
    assert not m[15, 25]        # ground behind the wall is not
    assert m[:, :15].all()      # open side fully visible


def test_viewshed_wang_single_peak_shadow():
    import numpy as np

    from gdal_ray.stages.viewshed import viewshed_mask_wang

    elev = np.zeros((41, 41))
    elev[20, 30] = 80.0
    m = viewshed_mask_wang(elev, obs_height=2.0)
    assert m[20, 30]            # the peak itself
    assert not m[20, 35]        # directly behind the peak on the ray


def test_mvt_roundtrip_line_and_point():
    line = np.array([[10, 10], [500, 40], [900, 900]], dtype=np.int64)
    pts = np.array([[5, 7]], dtype=np.int64)
    feats = [
        {"id": 1, "type": mvt.GEOM_LINESTRING, "parts": [line], "tags": {"fid": 1}},
        {"id": 2, "type": mvt.GEOM_POINT, "parts": [pts], "tags": {"pid": 2}},
    ]
    data = mvt.encode_tile("mixed", feats)
    lay = mvt.decode_tile(data)["mixed"]
    by_id = {f["id"]: f for f in lay["features"]}
    assert np.array_equal(by_id[1]["parts"][0], line)
    assert by_id[1]["type"] == mvt.GEOM_LINESTRING
    assert np.array_equal(by_id[2]["parts"][0], pts)
    assert by_id[2]["type"] == mvt.GEOM_POINT


def test_mvt_multilayer_stage(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.mvt import write_mvt_layers

    pol = rd.read_parquet(smoke_fixtures["polygons"])
    pts = rd.read_parquet(smoke_fixtures["points"])
    tiles = write_mvt_layers(pol, pts, zoom=8).to_pandas()
    assert len(tiles) > 0
    assert tiles.n_points.sum() >= pts.count()  # buffered replication
    # pick a tile with all three layers and decode each
    rich = tiles[(tiles.n_polys > 0) & (tiles.n_lines > 0) & (tiles.n_points > 0)]
    assert len(rich) > 0
    row = rich.iloc[0]
    layers = mvt.decode_tile(row.mvt_bytes)
    assert len(layers["polys"]["features"]) == row.n_polys
    assert len(layers["lines"]["features"]) == row.n_lines
    assert len(layers["points"]["features"]) == row.n_points
    assert all(f["type"] == mvt.GEOM_LINESTRING for f in layers["lines"]["features"])
    assert all(f["type"] == mvt.GEOM_POINT for f in layers["points"]["features"])


def test_los_flat_and_wall():
    """GDALIsLineOfSightVisible semantics (alg/los.cpp:177)."""
    import numpy as np

    from gdal_ray.stages.viewshed import line_of_sight

    flat = np.zeros((32, 32), np.float64)
    ok, ix, iy = line_of_sight(flat, 0, 0, 2.0, 31, 31, 2.0)
    assert ok and (ix, iy) == (-1, -1)
    wall = flat.copy()
    wall[:, 16] = 50.0
    ok, ix, iy = line_of_sight(wall, 0, 5, 2.0, 31, 5, 2.0)
    assert not ok and (ix, iy) == (16, 5)  # first blocking cell
    # high enough to clear the wall
    ok, _, _ = line_of_sight(wall, 0, 5, 120.0, 31, 5, 120.0)
    assert ok
    # endpoint below terrain fails the pre-check at that endpoint
    ok, ix, iy = line_of_sight(wall, 16, 3, 10.0, 31, 3, 2.0)
    assert not ok and (ix, iy) == (16, 3)
    # vertical / horizontal / same-point paths
    assert line_of_sight(flat, 4, 0, 1.0, 4, 31, 1.0)[0]
    assert line_of_sight(flat, 0, 9, 1.0, 31, 9, 1.0)[0]
    assert line_of_sight(flat, 7, 7, 1.0, 7, 7, 1.0)[0]


def test_los_lerp_clears_rising_ground():
    """z interpolates along the ray: a ramp under a climbing sightline
    stays visible, but a flat sightline into the ramp is blocked."""
    import numpy as np

    from gdal_ray.stages.viewshed import line_of_sight

    ramp = np.tile(np.arange(32, dtype=np.float64), (32, 1))
    ok, _, _ = line_of_sight(ramp, 0, 10, 2.0, 31, 13, 33.0)
    assert ok  # sightline climbs with the terrain
    ok, ix, iy = line_of_sight(ramp, 0, 10, 2.0, 31, 13, 2.0)
    assert not ok and ix >= 1  # flat sightline hits the ramp early


def test_los_fan_engine_matches_golden():
    import numpy as np

    from gdal_ray.oracle_ref.rasterref import _los_fan_ref
    from gdal_ray.stages.viewshed import los_ray_suite

    rng = np.random.default_rng(19)
    for _ in range(6):
        elev = rng.integers(0, 40, (33, 47)).astype(np.float64)
        assert los_ray_suite(elev) == _los_fan_ref(elev)
