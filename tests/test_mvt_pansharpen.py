"""MVT round-trip via our decoder; pansharpen/nearblack semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

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


# ----------------------------------------------------- MVT reader
# (the open/read half of ogr/ogrsf_frmts/mvt/ogrmvtdataset.cpp)


def _poly_layer_ds(n=12, seed=42):
    from gdal_ray.functions import geom

    rng = np.random.default_rng(seed)
    rows = {"fid": [], "wkb": [], "minx": [], "miny": [],
            "maxx": [], "maxy": []}
    for i in range(n):
        cx, cy = rng.uniform(-2e6, 2e6, 2)
        r = rng.uniform(2e4, 3e5)
        ang = np.linspace(0.0, 2.0 * np.pi, 9)[:-1]
        ring = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                        axis=1)
        ring = np.vstack([ring, ring[:1]])
        rows["fid"].append(i)
        rows["wkb"].append(geom.wkb_polygon([ring]))
        rows["minx"].append(ring[:, 0].min())
        rows["maxx"].append(ring[:, 0].max())
        rows["miny"].append(ring[:, 1].min())
        rows["maxy"].append(ring[:, 1].max())
    return rd.from_arrow(pa.table(rows))


def test_mvt_reader_int_exact_inversion(ray_session):
    """write -> read -> re-quantize returns the EXACT tile integers
    for every ring (the reader inverts the writer's quantization
    bijectively on the lattice)."""
    from gdal_ray.functions import geom, mercator
    from gdal_ray.functions import mvt as mvtc
    from gdal_ray.stages.mvt import read_mvt_features, write_mvt_tiles

    tiles = write_mvt_tiles(_poly_layer_ds(), zoom=5).take_all()
    feat = read_mvt_features(rd.from_items(tiles)).take_all()
    assert len(feat) > 0
    n_ok = n_tot = 0
    for trow in tiles:
        z, tx, ty = trow["z"], trow["x"], trow["y"]
        minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
        size = maxx - minx
        lay = mvtc.decode_tile(trow["mvt_bytes"])["layer"]
        ext = lay["extent"]
        raw = [p for f in lay["features"] for p in f["parts"]]
        rings = []
        for r in feat:
            if (r["z"], r["x"], r["y"]) != (z, tx, ty):
                continue
            for rr in geom.polygon_rings(geom.parse_wkb(r["wkb"])):
                rings.extend(rr)
        for ring in rings:
            ix = np.round((ring[:, 0] - minx) / size * ext).astype(np.int64)
            iy = np.round((maxy - ring[:, 1]) / size * ext).astype(np.int64)
            cand = np.stack([ix, iy], axis=1)
            n_tot += 1
            n_ok += any(len(p) == len(cand) and (p == cand).all()
                        for p in raw)
    assert n_tot > 0 and n_ok == n_tot


def test_mvt_reader_feature_count_and_tags(ray_session):
    from gdal_ray.stages.mvt import read_mvt_features, write_mvt_tiles
    import json

    tiles = write_mvt_tiles(_poly_layer_ds(), zoom=5)
    n_written = sum(r["n_features"] for r in tiles.take_all())
    feat = read_mvt_features(tiles).take_all()
    # one row per polygon part; >= one per written feature
    assert len(feat) >= n_written
    for r in feat:
        tags = json.loads(r["tags"])
        assert tags["fid"] == r["fid"]
        assert r["layer"] == "layer"
        assert r["gtype"] == 3


def test_mvt_reader_point_and_line_types(ray_session):
    """Hand-encoded tile with POINT and LINESTRING features decodes to
    world-coordinate WKB of the right types."""
    from gdal_ray.functions import geom, mercator
    from gdal_ray.functions import mvt as mvtc
    from gdal_ray.stages.mvt import read_mvt_features

    z, tx, ty = 3, 2, 5
    feats = [
        {"id": 1, "type": mvtc.GEOM_POINT,
         "parts": [np.array([[100, 200]], np.int64)], "tags": {"k": "pt"}},
        {"id": 2, "type": mvtc.GEOM_LINESTRING,
         "parts": [np.array([[0, 0], [512, 256], [1024, 256]], np.int64)],
         "tags": {"k": "ln"}},
    ]
    data = mvtc.encode_tile("roads", feats, extent=4096)
    ds = rd.from_items([{"z": z, "x": tx, "y": ty, "mvt_bytes": data}])
    rows = read_mvt_features(ds).take_all()
    by_id = {r["fid"]: r for r in rows}
    assert by_id[1]["gtype"] == 1 and by_id[2]["gtype"] == 2
    minx, miny, maxx, maxy = mercator.tile_bounds(tx, ty, z)
    size = maxx - minx
    g = geom.parse_wkb(by_id[1]["wkb"])
    px, py = g["coords"][0] if isinstance(g, dict) and "coords" in g else (None, None)
    # point at (100, 200)/4096 of the tile
    exp_x = minx + 100 / 4096 * size
    exp_y = maxy - 200 / 4096 * size
    wkb = by_id[1]["wkb"]
    import struct
    x, y = struct.unpack_from("<2d", wkb, 5)
    assert abs(x - exp_x) < 1e-6 and abs(y - exp_y) < 1e-6
    # layer filter
    assert read_mvt_features(ds, layer="other").take_all() == []


def test_mvt_reader_polygon_hole_grouping(ray_session):
    """Exterior (positive-shoelace in tile ints) followed by a
    negative-area interior ring reassembles into ONE polygon with an
    interior ring (the MVT 2.1 winding rule)."""
    from gdal_ray.functions import geom
    from gdal_ray.functions import mvt as mvtc
    from gdal_ray.stages.mvt import read_mvt_features

    # y-down tile coords: CW on screen = positive shoelace
    ext_ring = np.array([[0, 0], [0, 1000], [1000, 1000], [1000, 0],
                         [0, 0]], np.int64)
    if (np.dot(ext_ring[:-1, 0], np.roll(ext_ring[:-1, 1], -1))
            - np.dot(ext_ring[:-1, 1], np.roll(ext_ring[:-1, 0], -1))) < 0:
        ext_ring = ext_ring[::-1]
    hole = np.array([[200, 200], [600, 200], [600, 600], [200, 600],
                     [200, 200]], np.int64)
    if (np.dot(hole[:-1, 0], np.roll(hole[:-1, 1], -1))
            - np.dot(hole[:-1, 1], np.roll(hole[:-1, 0], -1))) > 0:
        hole = hole[::-1]
    feats = [{"id": 7, "type": mvtc.GEOM_POLYGON,
              "parts": [ext_ring, hole], "tags": {}}]
    data = mvtc.encode_tile("layer", feats, extent=4096)
    ds = rd.from_items([{"z": 2, "x": 1, "y": 1, "mvt_bytes": data}])
    rows = read_mvt_features(ds).take_all()
    assert len(rows) == 1
    rings = geom.polygon_rings(geom.parse_wkb(rows[0]["wkb"]))
    # one polygon, two rings (exterior + hole)
    flat = [r for rs in rings for r in rs]
    assert len(flat) == 2
