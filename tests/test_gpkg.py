"""GeoPackage source/sink (sources/gpkg.py).

Reference behavior model: ogr/ogrsf_frmts/gpkg/ (GP binary header per
OGC 12-128r18 §2.1.3; required metadata tables) and
autotest/ogr/ogr_gpkg.py.
"""

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.geom import envelope_wkb, wkb_point, wkb_polygon
from gdal_ray.sources import gpkg as GP


def _ring(cx, cy, h):
    return np.array(
        [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
         [cx - h, cy + h], [cx - h, cy - h]], np.float64)


def _features(n=7):
    wkbs, names, vals = [], [], []
    for i in range(n):
        if i % 2:
            wkbs.append(wkb_point(float(i), float(10 * i)))
        else:
            wkbs.append(wkb_polygon([_ring(i * 5.0, i * 3.0, 2.0)]))
        names.append(f"f{i}")
        vals.append(None if i == 3 else i * 1.5)
    return pa.table({
        "geometry": pa.array(wkbs, pa.binary()),
        "name": pa.array(names, pa.string()),
        "val": pa.array(vals, pa.float64()),
    })


def test_gp_header_round_trip_and_layout():
    wkb = wkb_point(3.25, -4.5)
    blob = GP.gp_wrap(wkb, srs_id=3857)
    assert blob[:2] == b"GP" and blob[2] == 0
    flags = blob[3]
    assert flags & 1  # little-endian header
    assert (flags >> 1) & 0b111 == 1  # xy envelope
    (srs,) = struct.unpack_from("<i", blob, 4)
    assert srs == 3857
    minx, maxx, miny, maxy = struct.unpack_from("<4d", blob, 8)
    assert (minx, maxx, miny, maxy) == (3.25, 3.25, -4.5, -4.5)
    out, srs2 = GP.gp_unwrap(blob)
    assert out == wkb and srs2 == 3857
    # no-envelope form
    out2, _ = GP.gp_unwrap(GP.gp_wrap(wkb, envelope=False))
    assert out2 == wkb
    with pytest.raises(ValueError):
        GP.gp_unwrap(b"XX" + blob[2:])


def test_write_read_round_trip(ray_session, tmp_path):
    t = _features()
    path = str(tmp_path / "a.gpkg")
    n = GP.write_gpkg(t, path, layer="feats", srs_id=4326)
    assert n == t.num_rows
    # file-level metadata the spec requires
    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == GP.GPKG_APPLICATION_ID
    rows = con.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents"
    ).fetchall()
    assert rows == [("feats", "features", 4326)]
    gc = con.execute(
        "SELECT table_name, column_name, geometry_type_name, srs_id "
        "FROM gpkg_geometry_columns").fetchall()
    assert gc == [("feats", "geom", "GEOMETRY", 4326)]  # mixed types
    # contents extent covers every feature envelope
    ext = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents"
    ).fetchone()
    con.close()
    envs = [envelope_wkb(w.as_py()) for w in t.column("geometry")]
    assert ext[0] == min(e[0] for e in envs)
    assert ext[3] == max(e[3] for e in envs)

    back = GP.read_gpkg(path).to_pandas().sort_values("fid")
    assert len(back) == t.num_rows
    assert list(back["geometry"]) == t.column("geometry").to_pylist()
    assert list(back["name"]) == t.column("name").to_pylist()
    assert back["val"].isna().tolist() == [False] * 3 + [True] + [False] * 3
    assert (back["srs_id"] == 4326).all()
    assert list(back["fid"]) == list(range(1, 8))  # sqlite auto fid


def test_explicit_fid_and_single_type_layer(ray_session, tmp_path):
    wkbs = [wkb_point(float(i), 0.0) for i in range(5)]
    t = pa.table({
        "myfid": pa.array([10, 20, 30, 40, 50], pa.int64()),
        "geometry": pa.array(wkbs, pa.binary()),
    })
    path = str(tmp_path / "pts.gpkg")
    GP.write_gpkg(t, path, layer="pts", fid_col="myfid")
    con = sqlite3.connect(path)
    (gt,) = con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns").fetchone()
    con.close()
    assert gt == "POINT"
    back = GP.read_gpkg(path).to_pandas().sort_values("fid")
    assert list(back["fid"]) == [10, 20, 30, 40, 50]


def test_parallel_range_read_equals_whole(ray_session, tmp_path):
    wkbs = [wkb_point(float(i), float(i % 13)) for i in range(257)]
    t = pa.table({"geometry": pa.array(wkbs, pa.binary()),
                  "k": pa.array(list(range(257)), pa.int64())})
    path = str(tmp_path / "many.gpkg")
    GP.write_gpkg(t, path, layer="pts")
    one = GP.read_gpkg(path, parallelism=1).to_pandas().sort_values("fid")
    many = GP.read_gpkg(path, parallelism=16).to_pandas().sort_values("fid")
    assert list(one["k"]) == list(many["k"]) == list(range(257))
    assert list(one["geometry"]) == list(many["geometry"])


def test_bbox_pushdown(ray_session, tmp_path):
    wkbs = [wkb_point(float(i), float(i)) for i in range(100)]
    t = pa.table({"geometry": pa.array(wkbs, pa.binary())})
    path = str(tmp_path / "grid.gpkg")
    GP.write_gpkg(t, path, layer="pts")
    sel = GP.read_gpkg(path, bbox=(10.0, 10.0, 20.0, 20.0)).to_pandas()
    assert len(sel) == 11  # i in [10, 20]


def test_multi_layer_file(ray_session, tmp_path):
    path = str(tmp_path / "two.gpkg")
    w = GP.GpkgWriter(path)
    w.write_table(
        pa.table({"geometry": pa.array([wkb_point(1.0, 2.0)], pa.binary())}),
        "a", srs_id=4326)
    w.write_table(
        pa.table({"geometry": pa.array(
            [wkb_polygon([_ring(0, 0, 1)])], pa.binary())}),
        "b", srs_id=3857)
    w.close()
    meta = GP.list_layers(path)
    assert [m["layer"] for m in meta] == ["a", "b"]
    assert meta[0]["srs_id"] == 4326 and meta[1]["srs_id"] == 3857
    with pytest.raises(ValueError):
        GP.read_gpkg(path)  # ambiguous without layer=
    b = GP.read_gpkg(path, layer="b").to_pandas()
    assert (b["srs_id"] == 3857).all()
    # custom srs got registered in gpkg_spatial_ref_sys
    con = sqlite3.connect(path)
    (n,) = con.execute(
        "SELECT COUNT(*) FROM gpkg_spatial_ref_sys WHERE srs_id=3857"
    ).fetchone()
    con.close()
    assert n == 1


def test_geojson_gpkg_interop(ray_session, tmp_path):
    """Same features through both boundary formats -> identical WKB."""
    from gdal_ray.sources import geojson as GJ

    t = _features()
    gj = GJ.geojson_to_table(GJ.table_to_geojson(t))
    path = str(tmp_path / "x.gpkg")
    GP.write_gpkg(t, path, layer="f")
    gp = GP.read_gpkg(path).to_pandas().sort_values("fid")
    assert gj.column("geometry").to_pylist() == list(gp["geometry"])


def test_dataset_streaming_write(ray_session, tmp_path):
    import ray.data as rd

    t = _features(64)
    ds = rd.from_arrow(t).repartition(8)
    path = str(tmp_path / "ds.gpkg")
    n = GP.write_gpkg(ds, path, layer="f")
    assert n == 64
    back = GP.read_gpkg(path).to_pandas()
    assert len(back) == 64
    assert sorted(back["name"]) == sorted(t.column("name").to_pylist())


def test_schema_mismatch_rejected(tmp_path):
    w = GP.GpkgWriter(str(tmp_path / "m.gpkg"))
    w.write_table(
        pa.table({"geometry": pa.array([wkb_point(0.0, 0.0)], pa.binary()),
                  "a": pa.array([1], pa.int64())}), "f")
    with pytest.raises(ValueError):
        w.write_table(
            pa.table({"geometry": pa.array([wkb_point(0.0, 0.0)],
                                           pa.binary()),
                      "b": pa.array([1], pa.int64())}), "f")


def _tile_rows(zs=(9, 10)):
    rows = {"z": [], "x": [], "y": [], "tile_bytes": []}
    for z in zs:
        for x in range(3):
            for y in range(2):
                rows["z"].append(z)
                rows["x"].append(x)
                rows["y"].append(y)
                rows["tile_bytes"].append(bytes([z, x, y]) * 5)
    return pa.table({
        "z": pa.array(rows["z"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "y": pa.array(rows["y"], pa.int32()),
        "tile_bytes": pa.array(rows["tile_bytes"], pa.binary()),
    })


def test_gpkg_tile_pyramid_round_trip(ray_session, tmp_path):
    """GPKG raster half: gpkg_tile_matrix_set/_matrix metadata + XYZ
    tile rows (GPKG rows are XYZ, unlike MBTiles TMS)."""
    import ray.data as rd

    t = _tile_rows()
    path = str(tmp_path / "t.gpkg")
    n = GP.write_gpkg_tiles(rd.from_arrow(t).repartition(3), path)
    assert n == t.num_rows
    con = sqlite3.connect(path)
    (dt,) = con.execute(
        "SELECT data_type FROM gpkg_contents WHERE table_name='tiles'"
    ).fetchone()
    assert dt == "tiles"
    tm = con.execute(
        "SELECT zoom_level, matrix_width, tile_width, pixel_x_size "
        "FROM gpkg_tile_matrix ORDER BY zoom_level").fetchall()
    assert [r[0] for r in tm] == [9, 10]
    assert tm[0][1] == 512 and tm[0][2] == 256  # 2^9 matrix, 256px
    assert abs(tm[1][3] - 156543.03392804097 / 1024) < 1e-9
    # XYZ orientation: row stored as-is (no TMS flip)
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=10 AND "
        "tile_column=1 AND tile_row=1").fetchone()
    assert blob == bytes([10, 1, 1]) * 5
    con.close()
    back = GP.read_gpkg_tiles(path, parallelism=4).to_pandas()
    got = sorted(zip(back["z"], back["x"], back["y"], back["tile_bytes"]))
    exp = sorted(zip(*[t.column(c).to_pylist()
                       for c in ("z", "x", "y", "tile_bytes")]))
    assert got == exp
    z9 = GP.read_gpkg_tiles(path, zoom=9).to_pandas()
    assert (z9["z"] == 9).all() and len(z9) == 6


def test_gpkg_vector_and_tiles_coexist(ray_session, tmp_path):
    """One GeoPackage carrying a vector layer AND a tile pyramid."""
    path = str(tmp_path / "both.gpkg")
    GP.write_gpkg(_features(5), path, layer="v")
    GP.write_gpkg_tiles(_tile_rows(zs=(8,)), path)
    meta = GP.list_layers(path)
    assert [m["layer"] for m in meta] == ["v"]  # features only
    con = sqlite3.connect(path)
    types = dict(con.execute(
        "SELECT table_name, data_type FROM gpkg_contents").fetchall())
    con.close()
    assert types == {"v": "features", "tiles": "tiles"}
    assert GP.read_gpkg(path, layer="v").count() == 5
    assert GP.read_gpkg_tiles(path).count() == 6


def test_attribute_filter_pushdown(ray_session, tmp_path):
    """where= lowers into the per-range SQL (SetAttributeFilter
    analog), composing with bbox pruning."""
    wkbs = [wkb_point(float(i), float(i)) for i in range(60)]
    t = pa.table({"geometry": pa.array(wkbs, pa.binary()),
                  "k": pa.array(list(range(60)), pa.int64()),
                  "name": pa.array([f"n{i % 4}" for i in range(60)])})
    path = str(tmp_path / "w.gpkg")
    GP.write_gpkg(t, path, layer="pts")
    sel = GP.read_gpkg(path, where="k % 2 = 0 AND name = 'n0'",
                       parallelism=4).to_pandas()
    assert sorted(sel["k"]) == [i for i in range(60)
                                if i % 2 == 0 and i % 4 == 0]
    both = GP.read_gpkg(path, where="k >= 10",
                        bbox=(0.0, 0.0, 20.0, 20.0)).to_pandas()
    assert sorted(both["k"]) == list(range(10, 21))


def test_gpkg_tiles_write_once(ray_session, tmp_path):
    path = str(tmp_path / "dup.gpkg")
    GP.write_gpkg_tiles(_tile_rows(zs=(8,)), path)
    with pytest.raises(ValueError, match="already exists"):
        GP.write_gpkg_tiles(_tile_rows(zs=(8,)), path)
    # a different table name appends fine
    GP.write_gpkg_tiles(_tile_rows(zs=(9,)), path, table="tiles2")
    assert GP.read_gpkg_tiles(path, table="tiles2").count() == 6


def test_gpkg_webp_tiles_register_extension(ray_session, tmp_path):
    """WebP tile_data requires the gpkg_webp extension row (OGC GPKG
    extension_tiles_webp); real VP8L blobs round-trip bit-exact."""
    import numpy as np

    from gdal_ray.functions.webp import decode_webp, encode_webp

    rng = np.random.default_rng(3)
    rows = {"z": [], "x": [], "y": [], "tile_bytes": []}
    imgs = {}
    for x in range(2):
        for y in range(2):
            img = rng.integers(0, 256, (16, 16, 3), np.uint8)
            imgs[(x, y)] = img
            rows["z"].append(8)
            rows["x"].append(x)
            rows["y"].append(y)
            rows["tile_bytes"].append(encode_webp(img))
    t = pa.table({
        "z": pa.array(rows["z"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "y": pa.array(rows["y"], pa.int32()),
        "tile_bytes": pa.array(rows["tile_bytes"], pa.binary()),
    })
    path = str(tmp_path / "w.gpkg")
    GP.write_gpkg_tiles(t, path, tile_format="webp")
    con = sqlite3.connect(path)
    ext = con.execute(
        "SELECT table_name, column_name, extension_name, scope "
        "FROM gpkg_extensions").fetchall()
    con.close()
    assert ("tiles", "tile_data", "gpkg_webp", "read-write") in ext
    back = GP.read_gpkg_tiles(path).to_pandas()
    assert len(back) == 4
    for _, r in back.iterrows():
        dec = decode_webp(bytes(r["tile_bytes"]))[:, :, :3]
        assert (dec == imgs[(r["x"], r["y"])]).all()
    # png needs no extension row; bad format rejected
    p2 = str(tmp_path / "p.gpkg")
    GP.write_gpkg_tiles(_tile_rows(zs=(8,)), p2)
    con = sqlite3.connect(p2)
    n_ext = con.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE name='gpkg_extensions'"
    ).fetchone()[0]
    con.close()
    assert n_ext == 0
    with pytest.raises(ValueError, match="tile_format"):
        GP.write_gpkg_tiles(_tile_rows(zs=(9,)), p2, table="t2",
                            tile_format="gif")


# ------------------------------------- R-tree spatial index extension


def _hex_layer(n=120, seed=42):
    rng = np.random.default_rng(seed)
    rows = {"fid": [], "geometry": [], "name": []}
    for i in range(n):
        cx, cy = rng.uniform(0.0, 1000.0, 2)
        ang = np.linspace(0.0, 2.0 * np.pi, 6)[:-1]
        ring = np.stack([cx + 5.0 * np.cos(ang),
                         cy + 5.0 * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        rows["fid"].append(i)
        rows["geometry"].append(wkb_polygon([ring]))
        rows["name"].append(f"f{i}")
    return rows


def test_rtree_spatial_index_and_pushdown(ray_session, tmp_path):
    """The gpkg_rtree_index extension (the reference GPKG driver's
    spatial index): rtree_<t>_<g> virtual table populated from the
    envelopes, gpkg_extensions row, six sync triggers, and bbox reads
    route through the index (EXPLAIN QUERY PLAN shows the rtree scan)
    while matching the brute-force envelope filter exactly."""
    import sqlite3

    from gdal_ray.sources.gpkg import (create_spatial_index,
                                       has_spatial_index, read_gpkg,
                                       write_gpkg)

    rows = _hex_layer()
    p = str(tmp_path / "sx.gpkg")
    write_gpkg(pa.table(rows), p, fid_col="fid")
    assert not has_spatial_index(p, "layer")
    n = create_spatial_index(p)
    assert n == 120 and has_spatial_index(p, "layer")
    con = sqlite3.connect(p)
    assert con.execute(
        "SELECT COUNT(*) FROM rtree_layer_geom").fetchone()[0] == 120
    assert con.execute(
        "SELECT extension_name FROM gpkg_extensions WHERE "
        "table_name='layer'").fetchone()[0] == "gpkg_rtree_index"
    trig = [r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='trigger'")]
    assert len([t for t in trig if t.startswith("rtree_layer_geom")]) == 6
    plan = " ".join(str(r) for r in con.execute(
        "EXPLAIN QUERY PLAN SELECT id FROM rtree_layer_geom "
        "WHERE maxx >= 1 AND minx <= 2").fetchall())
    assert "rtree" in plan.lower() or "VIRTUAL" in plan.upper()
    con.close()
    bbox = (100.0, 100.0, 300.0, 300.0)
    got = sorted(r["fid"] for r in
                 read_gpkg(p, bbox=bbox, parallelism=3).take_all())
    env = [envelope_wkb(w) for w in rows["geometry"]]
    want = sorted(i for i in range(120)
                  if not (env[i][2] < bbox[0] or env[i][0] > bbox[2]
                          or env[i][3] < bbox[1]
                          or env[i][1] > bbox[3]))
    assert got == want and len(got) > 0
    # un-indexed file still answers identically (fallback path)
    p2 = str(tmp_path / "plain.gpkg")
    write_gpkg(pa.table(rows), p2, fid_col="fid")
    got2 = sorted(r["fid"] for r in
                  read_gpkg(p2, bbox=bbox, parallelism=3).take_all())
    assert got2 == want
