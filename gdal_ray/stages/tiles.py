"""Tile pyramid build — the gdal2tiles/gdal-raster-tile analog.

Reference semantics: base tiles composed from source windows with a
chosen resample kernel (gdal2tiles.py generate_base_tiles :2795 /
create_base_tile :1283, scale_query_to_tile :843), overview tiles from
<=4 children with a per-zoom barrier (create_overview_tile :1471),
fully-transparent tiles skipped, TMS<->XYZ y-flip (getYTile), C++ tiler
apps/gdalalg_raster_tile.cpp GenerateTile :358.

Ray-Data shape: chips replicate to covering tiles (map_batches flat
expansion) -> groupby(cell) -> map_groups composes one 256x256 tile
from its overlapping chips (separable kernel resampling, last-wins
overlap in image_id order); each overview level is one more
groupby(parent cell) -> map_groups 4->1 masked-average reduction —
children-before-parents via per-level materialization (the same
per-zoom barrier the reference uses).

Tile row schema: cell:int64, z:int32, x:int32, y:int32 (TMS),
tile_bytes:binary (PNG), mask_bytes:binary (zlib-packed validity
bitmap), n_valid:int32.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..functions import codecs, kernels, mercator
from .cells import cover_envelope_cells

TILE_SIZE = 256


def _pack_mask(mask: np.ndarray) -> bytes:
    return zlib.compress(np.packbits(mask).tobytes(), 1)


def _unpack_mask(data: bytes, n: int = TILE_SIZE * TILE_SIZE) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(zlib.decompress(data), dtype=np.uint8))[:n]
    return bits.astype(bool).reshape(TILE_SIZE, TILE_SIZE)


def compose_tile_group(group: pa.Table, resampling: str = "near") -> pa.Table:
    """Compose one 256x256 tile from all chips overlapping it.

    Chips are drawn in image_id order (deterministic last-wins, the
    gdalbuildvrt overlap rule) into the tile's pixel grid; each chip is
    sampled separably at dst pixel centers with the chosen kernel.
    """
    cell = group.column("cell")[0].as_py()
    z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
    tb_minx, tb_miny, tb_maxx, tb_maxy = mercator.tile_bounds(tx, ty, z)
    res = float(mercator.resolution(z))
    canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
    mask = np.zeros((TILE_SIZE, TILE_SIZE), dtype=bool)

    order = np.argsort(
        np.asarray(group.column("image_id").to_pylist(), dtype=object), kind="stable"
    )
    cols = {
        name: group.column(name).to_pylist()
        for name in ("image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
    }
    for k in order:
        w, h = cols["w"][k], cols["h"][k]
        cminx, cminy, cmaxx, cmaxy = (
            cols["minx"][k],
            cols["miny"][k],
            cols["maxx"][k],
            cols["maxy"][k],
        )
        chip_res_x = (cmaxx - cminx) / w
        chip_res_y = (cmaxy - cminy) / h
        # dst column/row range the chip covers (pixel centers inside chip)
        i0 = max(0, int(np.ceil((cminx - tb_minx) / res - 0.5)))
        i1 = min(TILE_SIZE - 1, int(np.floor((cmaxx - tb_minx) / res - 0.5)))
        j0 = max(0, int(np.ceil((tb_maxy - cmaxy) / res - 0.5)))
        j1 = min(TILE_SIZE - 1, int(np.floor((tb_maxy - cminy) / res - 0.5)))
        if i1 < i0 or j1 < j0:
            continue
        img = codecs.decode(cols["bytes"][k], w, h, cols["fmt"][k])
        xs_m = tb_minx + (np.arange(i0, i1 + 1) + 0.5) * res
        ys_m = tb_maxy - (np.arange(j0, j1 + 1) + 0.5) * res
        src_x = (xs_m - cminx) / chip_res_x - 0.5
        src_y = (cmaxy - ys_m) / chip_res_y - 0.5
        patch = kernels.resample_separable(img, src_x, src_y, resampling)
        canvas[j0 : j1 + 1, i0 : i1 + 1] = patch
        mask[j0 : j1 + 1, i0 : i1 + 1] = True

    n_valid = int(mask.sum())
    if n_valid == 0:  # fully transparent -> skip (gdal2tiles behavior)
        return _empty_tile_table()
    return pa.table(
        {
            "cell": pa.array([cell], pa.int64()),
            "z": pa.array([z], pa.int32()),
            "x": pa.array([tx], pa.int32()),
            "y": pa.array([ty], pa.int32()),
            "tile_bytes": pa.array([codecs.encode_png(canvas, level=1)], pa.binary()),
            "mask_bytes": pa.array([_pack_mask(mask)], pa.binary()),
            "n_valid": pa.array([n_valid], pa.int32()),
        }
    )


def _empty_tile_table() -> pa.Table:
    return pa.table(
        {
            "cell": pa.array([], pa.int64()),
            "z": pa.array([], pa.int32()),
            "x": pa.array([], pa.int32()),
            "y": pa.array([], pa.int32()),
            "tile_bytes": pa.array([], pa.binary()),
            "mask_bytes": pa.array([], pa.binary()),
            "n_valid": pa.array([], pa.int32()),
        }
    )


def _add_scatter(t: pa.Table, key: str = "cell") -> pa.Table:
    """Hash scatter key: groupby sorts by range, so spatially contiguous
    hot groups (e.g. a hot cluster's tiles, which have adjacent cell
    ids) land in ONE sorted block and are processed serially by one
    map_groups task.  The xorshift-multiply mix is a BIJECTION on
    64-bit ints, so grouping by __scatter ALONE groups exactly by key
    (one int64 sort column instead of two — cheaper range exchange)
    while scattering heavy groups uniformly across range partitions."""
    c = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
    c = (c ^ (c >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    c = (c ^ (c >> np.uint64(33))).astype(np.int64)
    return t.append_column("__scatter", pa.array(c, pa.int64()))


def make_patches(zoom: int, resampling: str):
    """Pre-aggregation stage: resample each (chip, tile) replica to its
    destination window BEFORE the shuffle — the shuffle then moves only
    the already-resampled patch (3-6x smaller than the encoded chip at
    overview-ish zooms) and the per-tile group task is a cheap ordered
    paste.  Identical output to composing from raw chips (the same
    separable sampling at the same dst pixel centers)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {
            name: t.column(name).to_pylist()
            for name in ("image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy", "cell")
        }
        res_cache: dict[int, tuple] = {}
        out = {k: [] for k in ("cell", "image_id", "i0", "j0", "pw", "ph", "patch")}
        for k in range(t.num_rows):
            cell = cols["cell"][k]
            if cell not in res_cache:
                z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
                res_cache[cell] = (mercator.tile_bounds(tx, ty, z), float(mercator.resolution(z)))
            (tb_minx, tb_miny, tb_maxx, tb_maxy), res = res_cache[cell]
            w, h = cols["w"][k], cols["h"][k]
            cminx, cminy = cols["minx"][k], cols["miny"][k]
            cmaxx, cmaxy = cols["maxx"][k], cols["maxy"][k]
            i0 = max(0, int(np.ceil((cminx - tb_minx) / res - 0.5)))
            i1 = min(TILE_SIZE - 1, int(np.floor((cmaxx - tb_minx) / res - 0.5)))
            j0 = max(0, int(np.ceil((tb_maxy - cmaxy) / res - 0.5)))
            j1 = min(TILE_SIZE - 1, int(np.floor((tb_maxy - cminy) / res - 0.5)))
            if i1 < i0 or j1 < j0:
                continue
            img = codecs.decode(cols["bytes"][k], w, h, cols["fmt"][k])
            xs_m = tb_minx + (np.arange(i0, i1 + 1) + 0.5) * res
            ys_m = tb_maxy - (np.arange(j0, j1 + 1) + 0.5) * res
            src_x = (xs_m - cminx) / ((cmaxx - cminx) / w) - 0.5
            src_y = (cmaxy - ys_m) / ((cmaxy - cminy) / h) - 0.5
            patch = kernels.resample_separable(img, src_x, src_y, resampling)
            out["cell"].append(cell)
            out["image_id"].append(cols["image_id"][k])
            out["i0"].append(i0)
            out["j0"].append(j0)
            out["ph"].append(patch.shape[0])
            out["pw"].append(patch.shape[1])
            out["patch"].append(patch.tobytes())
        return pa.table(
            {
                "cell": pa.array(out["cell"], pa.int64()),
                "image_id": pa.array(out["image_id"], pa.string()),
                "i0": pa.array(out["i0"], pa.int32()),
                "j0": pa.array(out["j0"], pa.int32()),
                "pw": pa.array(out["pw"], pa.int32()),
                "ph": pa.array(out["ph"], pa.int32()),
                "patch": pa.array(out["patch"], pa.binary()),
            }
        )

    fn.__name__ = f"make_patches_z{zoom}"
    return fn


def paste_tile_group(group: pa.Table) -> pa.Table:
    """Paste pre-resampled patches in image_id order (last-wins) ->
    one tile row."""
    cell = group.column("cell")[0].as_py()
    z, tx, ty = (int(v) for v in mercator.unpack_cell(np.array([cell])))
    canvas = np.zeros((TILE_SIZE, TILE_SIZE, 3), dtype=np.uint8)
    mask = np.zeros((TILE_SIZE, TILE_SIZE), dtype=bool)
    ids = group.column("image_id").to_pylist()
    order = sorted(range(len(ids)), key=lambda k: ids[k])
    i0 = group.column("i0").to_pylist()
    j0 = group.column("j0").to_pylist()
    pw = group.column("pw").to_pylist()
    ph = group.column("ph").to_pylist()
    patches = group.column("patch").to_pylist()
    for k in order:
        p = np.frombuffer(patches[k], dtype=np.uint8).reshape(ph[k], pw[k], 3)
        canvas[j0[k] : j0[k] + ph[k], i0[k] : i0[k] + pw[k]] = p
        mask[j0[k] : j0[k] + ph[k], i0[k] : i0[k] + pw[k]] = True
    n_valid = int(mask.sum())
    if n_valid == 0:
        return _empty_tile_table()
    return pa.table(
        {
            "cell": pa.array([cell], pa.int64()),
            "z": pa.array([z], pa.int32()),
            "x": pa.array([tx], pa.int32()),
            "y": pa.array([ty], pa.int32()),
            "tile_bytes": pa.array([codecs.encode_png(canvas, level=1)], pa.binary()),
            "mask_bytes": pa.array([_pack_mask(mask)], pa.binary()),
            "n_valid": pa.array([n_valid], pa.int32()),
        }
    )


def build_base_tiles(images, zoom: int, resampling: str = "near", num_partitions: int | None = None):
    """Chips -> base tiles at ``zoom`` (one Dataset row per non-empty tile)."""
    needed = ["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    ds = (
        images.select_columns(needed)
        .map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")
        .map_batches(make_patches(zoom, resampling), batch_format="pyarrow")
        .map_batches(_add_scatter, batch_format="pyarrow")
    )
    return ds.groupby("__scatter").map_groups(
        paste_tile_group, batch_format="pyarrow"
    )


def compose_parent_group(group: pa.Table) -> pa.Table:
    """One overview tile from its <=4 children (2x masked average;
    create_overview_tile gdal2tiles.py:1471 semantics, TMS placement)."""
    pcell = group.column("pcell")[0].as_py()
    pz, px, py = (int(v) for v in mercator.unpack_cell(np.array([pcell])))
    canvas = np.zeros((2 * TILE_SIZE, 2 * TILE_SIZE, 3), dtype=np.uint8)
    mask = np.zeros((2 * TILE_SIZE, 2 * TILE_SIZE), dtype=bool)
    xs = group.column("x").to_pylist()
    ys = group.column("y").to_pylist()
    tb = group.column("tile_bytes").to_pylist()
    mb = group.column("mask_bytes").to_pylist()
    for k in range(group.num_rows):
        dx = int(xs[k]) - 2 * px
        dy = int(ys[k]) - 2 * py  # TMS: dy=1 is the northern (top) child
        row0 = (1 - dy) * TILE_SIZE
        col0 = dx * TILE_SIZE
        canvas[row0 : row0 + TILE_SIZE, col0 : col0 + TILE_SIZE] = codecs.decode_png(
            tb[k]
        )
        mask[row0 : row0 + TILE_SIZE, col0 : col0 + TILE_SIZE] = _unpack_mask(mb[k])
    out, omask = kernels.downsample2x_masked_average(canvas, mask)
    n_valid = int(omask.sum())
    return pa.table(
        {
            "cell": pa.array([int(mercator.pack_cell(pz, px, py))], pa.int64()),
            "z": pa.array([pz], pa.int32()),
            "x": pa.array([px], pa.int32()),
            "y": pa.array([py], pa.int32()),
            "tile_bytes": pa.array([codecs.encode_png(out, level=1)], pa.binary()),
            "mask_bytes": pa.array([_pack_mask(omask)], pa.binary()),
            "n_valid": pa.array([n_valid], pa.int32()),
        }
    )


def build_overview_level(tiles):
    """Tiles at zoom z -> tiles at z-1 (groupby parent cell)."""

    def add_parent(t: pa.Table) -> pa.Table:
        z = t.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        x = t.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(np.int64)
        pcell = mercator.pack_cell(z - 1, x >> 1, y >> 1)
        return t.append_column("pcell", pa.array(pcell, pa.int64()))

    return (
        tiles.map_batches(add_parent, batch_format="pyarrow")
        .map_batches(lambda t: _add_scatter(t, "pcell"), batch_format="pyarrow")
        .groupby("__scatter")
        .map_groups(compose_parent_group, batch_format="pyarrow")
    )


def build_pyramid(
    images,
    z_max: int,
    z_min: int,
    resampling: str = "near",
    checkpoint_dir: str | None = None,
):
    """Full pyramid z_max..z_min.  Returns {zoom: Dataset}.

    Children-before-parents ordering is enforced with a per-level
    barrier: each level is materialized (object store) or written to
    ``checkpoint_dir/z={z}`` parquet (resumable — a completed level is
    read back instead of recomputed; the manifest analog of
    gdal2tiles --resume, gdal2tiles.py:2846)."""
    import ray.data as rd

    levels: dict[int, object] = {}
    cur = build_base_tiles(images, z_max, resampling)
    cur = _level_barrier(cur, z_max, checkpoint_dir)
    levels[z_max] = cur
    for z in range(z_max - 1, z_min - 1, -1):
        cur = build_overview_level(cur)
        cur = _level_barrier(cur, z, checkpoint_dir)
        levels[z] = cur
    return levels


def _level_barrier(ds, z: int, checkpoint_dir: str | None):
    import os

    import ray.data as rd

    if checkpoint_dir is None:
        return ds.materialize()
    path = os.path.join(checkpoint_dir, f"z={z}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        tmp = path + ".tmp"
        ds.write_parquet(tmp)
        os.rename(tmp, path)
        open(done, "w").close()
    return rd.read_parquet(path, file_extensions=["parquet"])


def tiles_checksum(tiles):
    """Per-tile band checksums (the gdal2tiles test oracle pattern,
    autotest/pyscripts/test_gdal2tiles.py:85) — returns a Dataset of
    (z, x, y, cs_r, cs_g, cs_b)."""
    from ..functions import checksum

    def fn(t: pa.Table) -> pa.Table:
        tb = t.column("tile_bytes").to_pylist()
        cs = np.empty((len(tb), 3), dtype=np.int64)
        for i, b in enumerate(tb):
            img = codecs.decode_png(b)
            cs[i] = checksum.checksum_image(img)
        return pa.table(
            {
                "z": t.column("z").cast(pa.int64()),
                "x": t.column("x").cast(pa.int64()),
                "y": t.column("y").cast(pa.int64()),
                "cs_r": pa.array(cs[:, 0], pa.int64()),
                "cs_g": pa.array(cs[:, 1], pa.int64()),
                "cs_b": pa.array(cs[:, 2], pa.int64()),
            }
        )

    return tiles.map_batches(fn, batch_format="pyarrow")
