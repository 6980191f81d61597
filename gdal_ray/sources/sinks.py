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


# ------------------------------------------------- grid-directory I/O

#: single-grid drivers the bulk exporter can emit, with their writer
#: (module, function, extension).  Every entry takes (path, 2-D
#: float/int grid) and writes atomically — the registry reads all of
#: them back.
_GRID_WRITERS = {
    "gsbg": ("terrain_rasters", "write_gsbg", ".grd"),
    "gsag": ("terrain_rasters", "write_gsag", ".grd"),
    "gs7bg": ("terrain_rasters", "write_gs7bg", ".grd"),
    "aaigrid": ("simple_rasters", "write_aaigrid", ".asc"),
    "zmap": ("terrain_rasters", "write_zmap", ".dat"),
    "gxf": ("terrain_rasters", "write_gxf", ".gxf"),
    "hf2": ("terrain_rasters", "write_hf2", ".hf2"),
    "terragen": ("terrain_rasters", "write_terragen", ".ter"),
    "leveller": ("terrain_rasters", "write_leveller", ".ter"),
}


def write_grid_dir(ds, out_dir: str, driver: str = "gsbg",
                   key_col: str = "image_id", grid_col: str = "grid",
                   resume: bool = True):
    """Bulk-export a Dataset of grid rows (``key_col``, ``grid_col``
    = float64 bytes + ``w``/``h``) to one grid file per row under
    ``out_dir`` — the gdal_translate-to-any-format batch analog over
    the format zoo.  Resumable like the tile tree (existing files
    skip); returns per-batch (written, skipped) counters."""
    if driver not in _GRID_WRITERS:
        raise ValueError(f"grid driver {driver!r} unsupported "
                         f"(supported: {sorted(_GRID_WRITERS)})")
    mod_name, fn_name, ext = _GRID_WRITERS[driver]
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        import importlib

        fn = getattr(importlib.import_module(
            f"gdal_ray.sources.{mod_name}"), fn_name)
        keys = t.column(key_col).to_pylist()
        blobs = t.column(grid_col).to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        written = skipped = 0
        for k, blob, w, h in zip(keys, blobs, ws, hs):
            path = os.path.join(out_dir, f"{k}{ext}")
            if resume and os.path.exists(path):
                skipped += 1
                continue
            grid = np.frombuffer(blob, np.float64).reshape(h, w)
            fn(path, grid)
            written += 1
        return pa.table({
            "written": pa.array([written], pa.int64()),
            "skipped": pa.array([skipped], pa.int64()),
        })

    return ds.map_batches(write_batch, batch_format="pyarrow")


def read_grid_dir(root: str, parallelism: int = 8):
    """Read a directory of single-grid files (ANY registered grid
    driver, sniffed per file by the registry front door) back into a
    Dataset of (image_id, grid float64 bytes, w, h, driver) rows —
    one ranged task per file batch."""
    import glob

    import ray.data as rd

    files = sorted(
        p for p in glob.glob(os.path.join(root, "*"))
        if os.path.isfile(p) and not p.endswith((".sgrd", ".rdc",
                                                 ".hdr", ".mid",
                                                 ".prj")))
    if not files:
        raise ValueError(f"{root}: no grid files")

    def load(t: pa.Table) -> pa.Table:
        from .registry import identify, open_raster

        rows = []
        for p in t.column("path").to_pylist():
            out = open_raster(p)
            g = out.get("grid", out.get("grid_m"))
            if g is None:
                img = out.get("img")
                if img is None or np.asarray(img).ndim != 2:
                    raise ValueError(f"{p}: not a single-grid file")
                g = np.asarray(img, np.float64)
            g = np.asarray(g, np.float64)
            rows.append({
                "image_id": os.path.splitext(
                    os.path.basename(p))[0],
                "grid": g.tobytes(),
                "w": g.shape[1],
                "h": g.shape[0],
                "driver": identify(p),
            })
        return pa.Table.from_pylist(rows)

    src = rd.from_items([{"path": p} for p in files],
                        override_num_blocks=min(parallelism,
                                                len(files)))
    return src.map_batches(load, batch_format="pyarrow")
