"""Sinks: the gdal2tiles z/x/y.png file tree and partitioned parquet.

Reference parity: gdal2tiles writes ``{out}/{z}/{x}/{y}.png`` with an
XYZ or TMS y convention (--xyz flag; getYTile y-flip) and skips
existing files on --resume (gdal2tiles.py:1497,2846).  The tree sink
here is a map_batches side-effect stage (each task writes its own
tiles; resume = skip existing file) plus a driver-visible counter
result.  For the scale path prefer `state.checkpoint.write_partitioned`
(atomic partition dirs + lineage manifest); the file tree is the
compatibility layout a gdal2tiles user expects.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import mercator


def write_tile_tree(tiles, out_dir: str, xyz: bool = True, resume: bool = True):
    """Write tile rows (z, x, y TMS, tile_bytes PNG) as
    ``out_dir/z/x/y.png``.  Returns a Dataset of per-batch counters
    (written, skipped)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        zs = t.column("z").to_pylist()
        xs = t.column("x").to_pylist()
        ys = t.column("y").to_pylist()
        data = t.column("tile_bytes").to_pylist()
        written = skipped = 0
        for i in range(t.num_rows):
            y = int(mercator.tms_to_xyz(ys[i], zs[i])) if xyz else int(ys[i])
            d = os.path.join(out_dir, str(zs[i]), str(xs[i]))
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{y}.png")
            if resume and os.path.exists(path):
                skipped += 1
                continue
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data[i])
            os.replace(tmp, path)
            written += 1
        return pa.table(
            {
                "written": pa.array([written], pa.int64()),
                "skipped": pa.array([skipped], pa.int64()),
            }
        )

    return tiles.map_batches(write_batch, batch_format="pyarrow")


def read_tile_tree(root: str, xyz: bool = True):
    """Read a z/x/y.png tree back into a tile Dataset (driver open
    analog)."""
    import ray.data as rd

    paths = []
    for z in sorted(os.listdir(root)):
        zp = os.path.join(root, z)
        if not z.isdigit() or not os.path.isdir(zp):
            continue
        for x in sorted(os.listdir(zp)):
            xp = os.path.join(zp, x)
            for f in sorted(os.listdir(xp)):
                if f.endswith(".png"):
                    paths.append(os.path.join(xp, f))
    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        zs, xs, ys, data = [], [], [], []
        for path, b in zip(t.column("path").to_pylist(), t.column("bytes").to_pylist()):
            parts = path.rsplit("/", 3)
            z, x, y = int(parts[-3]), int(parts[-2]), int(parts[-1][:-4])
            if xyz:
                y = int(mercator.xyz_to_tms(np.int64(y), np.int64(z)))
            zs.append(z)
            xs.append(x)
            ys.append(y)
            data.append(b)
        return pa.table(
            {
                "z": pa.array(zs, pa.int32()),
                "x": pa.array(xs, pa.int32()),
                "y": pa.array(ys, pa.int32()),
                "tile_bytes": pa.array(data, pa.binary()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")
