"""MBTiles source/sink (sources/mbtiles.py).

Behavior model: frmts/mbtiles/mbtilesdataset.cpp (TMS row flip,
metadata table) per the MBTiles 1.3 spec.
"""

import sqlite3

import numpy as np
import pyarrow as pa

from gdal_ray.sources.mbtiles import (
    mbtiles_metadata,
    read_mbtiles,
    write_mbtiles,
)


def _tiles(zs=(9, 10)):
    rows = {"z": [], "x": [], "y": [], "tile_bytes": []}
    for z in zs:
        for x in range(0, 4):
            for y in range(0, 3):
                rows["z"].append(z)
                rows["x"].append(x)
                rows["y"].append(y)
                rows["tile_bytes"].append(
                    bytes([z, x, y]) * 7)
    return pa.table({
        "z": pa.array(rows["z"], pa.int32()),
        "x": pa.array(rows["x"], pa.int32()),
        "y": pa.array(rows["y"], pa.int32()),
        "tile_bytes": pa.array(rows["tile_bytes"], pa.binary()),
    })


def test_write_flips_to_tms(ray_session, tmp_path):
    t = _tiles()
    path = str(tmp_path / "a.mbtiles")
    n = write_mbtiles(t, path, bounds=(-180, -85, 180, 85))
    assert n == t.num_rows
    con = sqlite3.connect(path)
    # XYZ (z=10, x=1, y=2) must land at TMS row 2^10 - 1 - 2 = 1021
    (blob,) = con.execute(
        "SELECT tile_data FROM tiles WHERE zoom_level=10 AND "
        "tile_column=1 AND tile_row=1021").fetchone()
    assert blob == bytes([10, 1, 2]) * 7
    con.close()
    meta = mbtiles_metadata(path)
    assert meta["format"] == "png" and meta["version"] == "1.3"
    assert meta["minzoom"] == "9" and meta["maxzoom"] == "10"
    assert meta["bounds"].startswith("-180.0,")


def test_round_trip_and_zoom_filter(ray_session, tmp_path):
    import ray.data as rd

    t = _tiles()
    path = str(tmp_path / "b.mbtiles")
    write_mbtiles(rd.from_arrow(t).repartition(4), path)
    back = read_mbtiles(path, parallelism=8).to_pandas()
    got = sorted(zip(back["z"], back["x"], back["y"], back["tile_bytes"]))
    exp = sorted(zip(*[t.column(c).to_pylist()
                       for c in ("z", "x", "y", "tile_bytes")]))
    assert got == exp
    z9 = read_mbtiles(path, zoom=9).to_pandas()
    assert (z9["z"] == 9).all() and len(z9) == 12
    empty = read_mbtiles(path, zoom=3)
    assert empty.count() == 0


def test_pyramid_to_mbtiles(ray_session, smoke_fixtures, tmp_path):
    """Real pipeline: the tile pyramid written into MBTiles and read
    back tile-identical."""
    import ray.data as rd

    from gdal_ray.stages.tiles import build_base_tiles

    imgs = rd.read_parquet(smoke_fixtures["images"])
    tiles = build_base_tiles(imgs, zoom=9).select_columns(
        ["z", "x", "y", "tile_bytes"])
    ref = tiles.to_pandas()
    path = str(tmp_path / "p.mbtiles")
    n = write_mbtiles(tiles, path)
    assert n == len(ref) > 0
    back = read_mbtiles(path).to_pandas()
    a = sorted(zip(ref["z"], ref["x"], ref["y"], ref["tile_bytes"]))
    b = sorted(zip(back["z"], back["x"], back["y"], back["tile_bytes"]))
    assert a == b


def test_webp_format_mbtiles(ray_session, tmp_path):
    """MBTiles 1.3 allows format=webp; real VP8L blobs round-trip."""
    import numpy as np
    import pyarrow as pa

    from gdal_ray.functions.webp import decode_webp, encode_webp
    from gdal_ray.sources.mbtiles import (mbtiles_metadata, read_mbtiles,
                                          write_mbtiles)

    rng = np.random.default_rng(4)
    imgs = {}
    rows = {"z": [], "x": [], "y": [], "tile_bytes": []}
    for x in range(2):
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        imgs[x] = img
        rows["z"].append(7)
        rows["x"].append(x)
        rows["y"].append(0)
        rows["tile_bytes"].append(encode_webp(img))
    t = pa.table({k: pa.array(v) for k, v in rows.items()})
    path = str(tmp_path / "w.mbtiles")
    assert write_mbtiles(t, path, fmt="webp") == 2
    assert mbtiles_metadata(path)["format"] == "webp"
    back = read_mbtiles(path).to_pandas()
    for _, r in back.iterrows():
        dec = decode_webp(bytes(r["tile_bytes"]))[:, :, :3]
        assert (dec == imgs[int(r["x"])]).all()
