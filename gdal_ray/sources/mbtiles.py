"""MBTiles source / sink for the tile pyramid.

Reference analog: the MBTiles driver (frmts/mbtiles/mbtilesdataset.cpp)
and the gdal2tiles/`gdal raster tile` output convention.  An MBTiles
file is one SQLite database (MBTiles 1.3 spec): a ``metadata``
name/value table (``name``, ``format``, ``minzoom``/``maxzoom``,
``bounds``) and a ``tiles`` table keyed (zoom_level, tile_column,
tile_row) with ``tile_row`` in TMS orientation — flipped from the
engine's XYZ tile rows (``tms_y = 2^z - 1 - y``, the same flip
mbtilesdataset.cpp applies).

Like GPKG this is a single-file interop sink (one SQLite writer); the
tile PYRAMID itself is built distributed by stages/tiles.py — this
sink only streams the finished (z, x, y, tile_bytes) rows into the
container.  Reads parallelize over rowid ranges like the GPKG reader.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

__all__ = ["write_mbtiles", "read_mbtiles", "mbtiles_metadata"]


def write_mbtiles(ds, path: str, *, name: str = "tiles",
                  fmt: str = "png", bounds=None) -> int:
    """Stream a Dataset (or pyarrow Table) of XYZ tile rows
    (z, x, y, tile_bytes) into an MBTiles file.  Returns tile count."""
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.unlink(tmp)
    con = sqlite3.connect(tmp)
    con.execute("CREATE TABLE metadata (name TEXT, value TEXT)")
    con.execute(
        "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
        "tile_row INTEGER, tile_data BLOB)")
    con.execute(
        "CREATE UNIQUE INDEX tile_index ON tiles "
        "(zoom_level, tile_column, tile_row)")
    n = 0
    zmin, zmax = None, None

    def insert(t: pa.Table):
        nonlocal n, zmin, zmax
        z = t.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        data = t.column("tile_bytes").to_pylist()
        tms_y = (1 << z) - 1 - y  # XYZ -> TMS row flip
        with con:
            con.executemany(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                [(int(zz), int(xx), int(ty), d)
                 for zz, xx, ty, d in zip(z, x, tms_y, data)])
        n += len(z)
        if len(z):
            zmin = int(z.min()) if zmin is None else min(zmin, int(z.min()))
            zmax = int(z.max()) if zmax is None else max(zmax, int(z.max()))

    if isinstance(ds, pa.Table):
        insert(ds)
    else:
        for t in ds.iter_batches(batch_format="pyarrow", batch_size=512):
            insert(t)
    meta = [("name", name), ("format", fmt),
            ("type", "overlay"), ("version", "1.3")]
    if zmin is not None:
        meta += [("minzoom", str(zmin)), ("maxzoom", str(zmax))]
    if bounds is not None:
        meta.append(("bounds", ",".join(str(float(v)) for v in bounds)))
    with con:
        con.executemany("INSERT INTO metadata VALUES (?, ?)", meta)
    con.close()
    os.replace(tmp, path)
    return n


def mbtiles_metadata(path: str) -> dict:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        rows = con.execute("SELECT name, value FROM metadata").fetchall()
    finally:
        con.close()
    return dict(rows)


def read_mbtiles(path: str, zoom: int | None = None,
                 parallelism: int = 16):
    """Ray Dataset of XYZ tile rows (z, x, y, tile_bytes) from an
    MBTiles file; ``zoom`` filters one level in SQL.  Rowid ranges
    fan out across tasks (each opens the file read-only)."""
    import ray.data as rd

    where = "" if zoom is None else f" WHERE zoom_level = {int(zoom)}"
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(
            f"SELECT MIN(rowid), MAX(rowid) FROM tiles{where}").fetchone()
    finally:
        con.close()
    if lo is None:
        return rd.from_arrow(pa.table({
            "z": pa.array([], pa.int32()), "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()),
            "tile_bytes": pa.array([], pa.binary())}))
    edges = np.unique(np.linspace(lo, hi + 1, parallelism + 1)
                      .astype(np.int64))
    items = [{"lo": int(edges[i]), "hi": int(edges[i + 1] - 1)}
             for i in range(len(edges) - 1)]

    def fetch(t: pa.Table) -> pa.Table:
        con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
        zs, xs, ys, bs = [], [], [], []
        try:
            for lo_, hi_ in zip(t.column("lo").to_pylist(),
                                t.column("hi").to_pylist()):
                cond = f"rowid >= {lo_} AND rowid <= {hi_}"
                if zoom is not None:
                    cond += f" AND zoom_level = {int(zoom)}"
                for z, x, ty, d in con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data "
                    f"FROM tiles WHERE {cond}"
                ):
                    zs.append(z)
                    xs.append(x)
                    ys.append((1 << z) - 1 - ty)  # TMS -> XYZ
                    bs.append(d)
        finally:
            con.close()
        return pa.table({
            "z": pa.array(zs, pa.int32()), "x": pa.array(xs, pa.int32()),
            "y": pa.array(ys, pa.int32()),
            "tile_bytes": pa.array(bs, pa.binary())})

    return rd.from_items(items).map_batches(fetch, batch_format="pyarrow")
