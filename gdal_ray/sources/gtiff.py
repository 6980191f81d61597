"""GTiff / Cloud-Optimized GeoTIFF (COG) tiled writer + reader.

A from-scratch minimal implementation of the reference's COG layout
contract (frmts/gtiff/gtiffdataset_write.cpp:7440-7490,
frmts/gtiff/cogdriver.cpp, read side gtiffdataset_read.cpp:3880-3905):

- classic TIFF 6.0, little-endian, TILED (tags 322/323/324/325);
- hidden structural-metadata ghost area right after the 8-byte header:
  ``GDAL_STRUCTURAL_METADATA_SIZE=%06d bytes\\n`` followed by
  ``LAYOUT=IFDS_BEFORE_DATA``, ``BLOCK_ORDER=ROW_MAJOR``,
  ``BLOCK_LEADER=SIZE_AS_UINT4``, ``BLOCK_TRAILER=LAST_4_BYTES_REPEATED``
  and ``KNOWN_INCOMPATIBLE_EDITION=NO\\n `` (trailing space intended);
- every IFD (full resolution first, then overviews flagged
  NewSubfileType=1) written BEFORE any tile data;
- tile data in row-major order, overview levels from smallest to
  full resolution, each tile preceded by a uint32 size leader and
  followed by its last 4 bytes repeated (the trailer lets streaming
  readers validate a ranged read without a second request);
- DEFLATE (zlib, compression id 8) or uncompressed (1);
- GeoTIFF georeferencing: ModelPixelScale (33550) + ModelTiepoint
  (33922) + a minimal GeoKeyDirectory (34735) declaring EPSG:3857
  (the engine's tile CRS — functions/mercator.py).

Only the subset the engine needs is implemented (uint8/float32,
1 or 3 samples, pixel interleave) — a real deployment would swap in a
full driver behind the same function signatures; the LAYOUT contract
above is what makes the output a valid streaming COG.
"""

from __future__ import annotations

import math
import os
import struct
import zlib

import numpy as np

# TIFF tag ids
_T_NEWSUBFILETYPE = 254
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITSPERSAMPLE = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_SAMPLESPERPIXEL = 277
_T_PLANARCONFIG = 284
_T_TILEWIDTH = 322
_T_TILELENGTH = 323
_T_TILEOFFSETS = 324
_T_TILEBYTECOUNTS = 325
_T_SAMPLEFORMAT = 339
_T_PIXELSCALE = 33550
_T_TIEPOINT = 33922
_T_GEOKEYS = 34735

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12

_GHOST_BODY = (
    b"LAYOUT=IFDS_BEFORE_DATA\n"
    b"BLOCK_ORDER=ROW_MAJOR\n"
    b"BLOCK_LEADER=SIZE_AS_UINT4\n"
    b"BLOCK_TRAILER=LAST_4_BYTES_REPEATED\n"
    b"KNOWN_INCOMPATIBLE_EDITION=NO\n "
)


def _ghost_area() -> bytes:
    head = b"GDAL_STRUCTURAL_METADATA_SIZE=%06d bytes\n" % len(_GHOST_BODY)
    return head + _GHOST_BODY


def _downsample2x(img: np.ndarray) -> np.ndarray:
    """2x overview by box average (the COG driver's default AVERAGE
    resampling for power-of-two overviews)."""
    h, w = img.shape[:2]
    h2, w2 = (h + 1) // 2, (w + 1) // 2
    ph, pw = h2 * 2, w2 * 2
    if img.ndim == 2:
        pad = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
        a = pad.astype(np.float64).reshape(h2, 2, w2, 2).mean(axis=(1, 3))
    else:
        pad = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        a = (
            pad.astype(np.float64)
            .reshape(h2, 2, w2, 2, img.shape[2])
            .mean(axis=(1, 3))
        )
    if img.dtype == np.uint8:
        return np.floor(a + 0.5).astype(np.uint8)
    return a.astype(img.dtype)


def _tiles_of(img: np.ndarray, ts: int):
    """Row-major tile iterator: full-size tiles, edge tiles padded
    with zeros (TIFF tiles are always ts x ts)."""
    h, w = img.shape[:2]
    nb = 1 if img.ndim == 2 else img.shape[2]
    for ty in range(0, h, ts):
        for tx in range(0, w, ts):
            tile = np.zeros(
                (ts, ts, nb) if nb > 1 else (ts, ts), dtype=img.dtype
            )
            sub = img[ty : ty + ts, tx : tx + ts]
            if nb > 1:
                tile[: sub.shape[0], : sub.shape[1], :] = sub
            else:
                tile[: sub.shape[0], : sub.shape[1]] = sub
            yield tile


class _IFD:
    def __init__(self, img: np.ndarray, ts: int, overview: bool):
        self.img = img
        self.ts = ts
        self.overview = overview
        h, w = img.shape[:2]
        self.n_tiles = math.ceil(h / ts) * math.ceil(w / ts)
        self.tile_offsets: list[int] = []
        self.tile_sizes: list[int] = []


def write_cog(
    path: str,
    img: np.ndarray,
    envelope: tuple[float, float, float, float] | None = None,
    tile_size: int = 256,
    compress: str = "deflate",
    overview_min: int = 128,
    max_overviews: int = 8,
) -> dict:
    """Write one COG.  img: (h, w) or (h, w, bands) uint8/float32;
    envelope: (minx, miny, maxx, maxy) in EPSG:3857.  Returns layout
    stats {path, levels, tiles, size}."""
    if img.ndim == 2:
        nb = 1
    elif img.ndim == 3 and img.shape[2] in (1, 3):
        nb = img.shape[2]
        if nb == 1:
            img = img[:, :, 0]
    else:
        raise ValueError("img must be (h,w) or (h,w,{1,3})")
    if img.dtype == np.uint8:
        bps, sfmt = 8, 1
    elif img.dtype == np.float32:
        bps, sfmt = 32, 3
    else:
        raise ValueError("dtype must be uint8 or float32")
    if compress not in ("deflate", "none"):
        raise ValueError("compress must be deflate|none")

    # overview pyramid: halve until max dim < overview_min
    levels = [img]
    while (
        max(levels[-1].shape[:2]) >= 2 * overview_min
        and len(levels) <= max_overviews
    ):
        levels.append(_downsample2x(levels[-1]))

    ifds = [_IFD(lv, tile_size, i > 0) for i, lv in enumerate(levels)]

    # ---- lay out: header + ghost + all IFDs, then data
    ghost = _ghost_area()
    pos = 8 + len(ghost)

    def ifd_sizes(ifd: _IFD) -> tuple[int, int]:
        # entries: common 12 (+1 subfiletype) (+georef 3 on main)
        n_entries = 12
        if ifd.overview:
            n_entries += 1
        elif envelope is not None:
            n_entries += 3
        table = 2 + n_entries * 12 + 4
        # out-of-line payloads: tile offsets/counts arrays (LONG each),
        # bits-per-sample array if nb==3, georef doubles
        extra = 0
        if ifd.n_tiles > 1:
            extra += 4 * ifd.n_tiles * 2
        if nb == 3:
            extra += 2 * 3  # bits-per-sample SHORT[3]
            extra += 2 * 3  # sample-format SHORT[3]
        if not ifd.overview and envelope is not None:
            extra += 8 * 3 + 8 * 6 + 2 * 16  # scale + tiepoint + geokeys
        return table, extra

    ifd_pos = []
    for ifd in ifds:
        table, extra = ifd_sizes(ifd)
        ifd_pos.append((pos, pos + table))
        pos += table + extra
    data_start = pos

    # ---- encode tiles: data order = smallest overview first, then up
    # (gtiffdataset_write.cpp CopyImageIntoNewTabFile overview-first
    # pass), row-major within a level
    chunks: list[bytes] = []
    for ifd in reversed(ifds):
        for tile in _tiles_of(ifd.img, tile_size):
            raw = tile.tobytes()
            enc = zlib.compress(raw, 6) if compress == "deflate" else raw
            leader = struct.pack("<I", len(enc))
            trailer = enc[-4:] if len(enc) >= 4 else enc.ljust(4, b"\0")
            ifd.tile_offsets.append(pos + 4)  # offset past the leader
            ifd.tile_sizes.append(len(enc))
            blob = leader + enc + trailer
            chunks.append(blob)
            pos += len(blob)

    # ---- render IFD tables
    comp_id = 8 if compress == "deflate" else 1

    def pack_entry(tag, typ, count, value_or_offset) -> bytes:
        if typ == _TYPE_SHORT and count == 1:
            return struct.pack("<HHIHH", tag, typ, 1, value_or_offset, 0)
        return struct.pack("<HHII", tag, typ, count, value_or_offset)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_pos[0][0])
    out += ghost
    for i, ifd in enumerate(ifds):
        table_pos, extra_pos = ifd_pos[i]
        assert len(out) == table_pos, (len(out), table_pos)
        h, w = ifd.img.shape[:2]
        entries = []
        payload = bytearray()

        def off(data: bytes) -> int:
            nonlocal payload
            o = extra_pos + len(payload)
            payload += data
            return o

        if ifd.overview:
            entries.append(pack_entry(_T_NEWSUBFILETYPE, _TYPE_LONG, 1, 1))
        entries.append(pack_entry(_T_WIDTH, _TYPE_LONG, 1, w))
        entries.append(pack_entry(_T_LENGTH, _TYPE_LONG, 1, h))
        if nb == 3:
            entries.append(
                pack_entry(
                    _T_BITSPERSAMPLE, _TYPE_SHORT, 3,
                    off(struct.pack("<3H", bps, bps, bps)),
                )
            )
        else:
            entries.append(pack_entry(_T_BITSPERSAMPLE, _TYPE_SHORT, 1, bps))
        entries.append(pack_entry(_T_COMPRESSION, _TYPE_SHORT, 1, comp_id))
        entries.append(
            pack_entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, 2 if nb == 3 else 1)
        )
        entries.append(pack_entry(_T_SAMPLESPERPIXEL, _TYPE_SHORT, 1, nb))
        entries.append(pack_entry(_T_PLANARCONFIG, _TYPE_SHORT, 1, 1))
        entries.append(pack_entry(_T_TILEWIDTH, _TYPE_SHORT, 1, tile_size))
        entries.append(pack_entry(_T_TILELENGTH, _TYPE_SHORT, 1, tile_size))
        if ifd.n_tiles == 1:
            entries.append(
                pack_entry(_T_TILEOFFSETS, _TYPE_LONG, 1, ifd.tile_offsets[0])
            )
            entries.append(
                pack_entry(_T_TILEBYTECOUNTS, _TYPE_LONG, 1, ifd.tile_sizes[0])
            )
        else:
            entries.append(
                pack_entry(
                    _T_TILEOFFSETS, _TYPE_LONG, ifd.n_tiles,
                    off(struct.pack(f"<{ifd.n_tiles}I", *ifd.tile_offsets)),
                )
            )
            entries.append(
                pack_entry(
                    _T_TILEBYTECOUNTS, _TYPE_LONG, ifd.n_tiles,
                    off(struct.pack(f"<{ifd.n_tiles}I", *ifd.tile_sizes)),
                )
            )
        if nb == 3:
            entries.append(
                pack_entry(
                    _T_SAMPLEFORMAT, _TYPE_SHORT, 3,
                    off(struct.pack("<3H", sfmt, sfmt, sfmt)),
                )
            )
        else:
            entries.append(pack_entry(_T_SAMPLEFORMAT, _TYPE_SHORT, 1, sfmt))
        if not ifd.overview and envelope is not None:
            minx, miny, maxx, maxy = envelope
            sx = (maxx - minx) / w
            sy = (maxy - miny) / h
            entries.append(
                pack_entry(
                    _T_PIXELSCALE, _TYPE_DOUBLE, 3,
                    off(struct.pack("<3d", sx, sy, 0.0)),
                )
            )
            entries.append(
                pack_entry(
                    _T_TIEPOINT, _TYPE_DOUBLE, 6,
                    off(struct.pack("<6d", 0.0, 0.0, 0.0, minx, maxy, 0.0)),
                )
            )
            # GeoKeyDirectory: version 1.1.0, 3 keys:
            # GTModelType=1 (projected), GTRasterType=1 (pixel-is-area),
            # ProjectedCSType=3857
            geokeys = struct.pack(
                "<16H",
                1, 1, 0, 3,
                1024, 0, 1, 1,
                1025, 0, 1, 1,
                3072, 0, 1, 3857,
            )
            entries.append(
                pack_entry(_T_GEOKEYS, _TYPE_SHORT, 16, off(geokeys))
            )

        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        next_ifd = ifd_pos[i + 1][0] if i + 1 < len(ifds) else 0
        out += struct.pack("<H", len(entries))
        for e in entries:
            out += e
        out += struct.pack("<I", next_ifd)
        out += payload

    assert len(out) == data_start, (len(out), data_start)
    for blob in chunks:
        out += blob

    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return {
        "path": path,
        "levels": len(ifds),
        "tiles": sum(f.n_tiles for f in ifds),
        "size": len(out),
    }


# ----------------------------------------------------------------- reader


def read_cog(path: str, level: int = 0) -> dict:
    """Read one IFD level of a COG written by write_cog (or any
    compatible tiled little-endian TIFF).  Returns dict(img, envelope,
    levels, cog_layout: bool)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != b"II\x2a\x00":
        raise ValueError("not a little-endian classic TIFF")
    (first_ifd,) = struct.unpack_from("<I", buf, 4)
    ghost = buf[8:first_ifd]
    cog_layout = b"LAYOUT=IFDS_BEFORE_DATA" in ghost

    ifds = []
    pos = first_ifd
    while pos:
        (n,) = struct.unpack_from("<H", buf, pos)
        tags = {}
        for k in range(n):
            tag, typ, count, val = struct.unpack_from(
                "<HHII", buf, pos + 2 + k * 12
            )
            if typ == _TYPE_SHORT and count == 1:
                val = struct.unpack_from("<H", buf, pos + 2 + k * 12 + 8)[0]
            tags[tag] = (typ, count, val)
        (pos,) = struct.unpack_from("<I", buf, pos + 2 + n * 12)
        ifds.append(tags)

    def arr(tags, tag, fmt_char):
        typ, count, val = tags[tag]
        size = {"H": 2, "I": 4, "d": 8}[fmt_char]
        if count * size <= 4:
            return [val]
        return list(struct.unpack_from(f"<{count}{fmt_char}", buf, val))

    tags = ifds[level]
    w = tags[_T_WIDTH][2]
    h = tags[_T_LENGTH][2]
    ts = tags[_T_TILEWIDTH][2]
    nb = tags[_T_SAMPLESPERPIXEL][2]
    comp = tags[_T_COMPRESSION][2]
    sfmt = arr(tags, _T_SAMPLEFORMAT, "H")[0] if _T_SAMPLEFORMAT in tags else 1
    bps = arr(tags, _T_BITSPERSAMPLE, "H")[0]
    dtype = np.uint8 if (sfmt == 1 and bps == 8) else np.float32
    offsets = arr(tags, _T_TILEOFFSETS, "I")
    counts = arr(tags, _T_TILEBYTECOUNTS, "I")

    img = np.zeros((h, w, nb) if nb > 1 else (h, w), dtype)
    ntx = math.ceil(w / ts)
    for ti, (o, c) in enumerate(zip(offsets, counts)):
        enc = buf[o : o + c]
        raw = zlib.decompress(enc) if comp == 8 else enc
        tile = np.frombuffer(raw, dtype).reshape(
            (ts, ts, nb) if nb > 1 else (ts, ts)
        )
        ty, tx = divmod(ti, ntx)
        y0, x0 = ty * ts, tx * ts
        hh = min(ts, h - y0)
        ww = min(ts, w - x0)
        if nb > 1:
            img[y0 : y0 + hh, x0 : x0 + ww, :] = tile[:hh, :ww, :]
        else:
            img[y0 : y0 + hh, x0 : x0 + ww] = tile[:hh, :ww]

    envelope = None
    main = ifds[0]
    if _T_PIXELSCALE in main and _T_TIEPOINT in main:
        sx, sy, _ = arr(main, _T_PIXELSCALE, "d")
        tp = arr(main, _T_TIEPOINT, "d")
        minx, maxy = tp[3], tp[4]
        w0, h0 = main[_T_WIDTH][2], main[_T_LENGTH][2]
        envelope = (minx, maxy - sy * h0, minx + sx * w0, maxy)
    return {
        "img": img,
        "envelope": envelope,
        "levels": len(ifds),
        "cog_layout": cog_layout,
    }


def validate_cog_layout(path: str) -> dict:
    """Check the streaming-layout invariants the ghost area promises:
    all IFD tables before any tile data, tile data offsets strictly
    increasing in (level smallest->largest, row-major) order, each
    tile preceded by its uint32 size leader and followed by its last
    4 bytes repeated."""
    with open(path, "rb") as f:
        buf = f.read()
    (first_ifd,) = struct.unpack_from("<I", buf, 4)
    ifds, pos = [], first_ifd
    max_table_end = 0
    while pos:
        (n,) = struct.unpack_from("<H", buf, pos)
        tags = {}
        for k in range(n):
            tag, typ, count, val = struct.unpack_from("<HHII", buf, pos + 2 + k * 12)
            if typ == _TYPE_SHORT and count == 1:
                val = struct.unpack_from("<H", buf, pos + 2 + k * 12 + 8)[0]
            tags[tag] = (typ, count, val)
        max_table_end = max(max_table_end, pos + 2 + n * 12 + 4)
        (pos,) = struct.unpack_from("<I", buf, pos + 2 + n * 12)
        ifds.append(tags)

    def arr(tags, tag):
        typ, count, val = tags[tag]
        if count == 1:
            return [val]
        return list(struct.unpack_from(f"<{count}I", buf, val))

    all_offsets = []
    for tags in reversed(ifds):  # data order: smallest overview first
        offs = arr(tags, _T_TILEOFFSETS)
        cnts = arr(tags, _T_TILEBYTECOUNTS)
        all_offsets.extend(zip(offs, cnts))
    ok_order = all(
        a[0] < b[0] for a, b in zip(all_offsets, all_offsets[1:])
    )
    ok_before_data = (
        not all_offsets or max_table_end <= all_offsets[0][0] - 4
    )
    ok_leader = all(
        struct.unpack_from("<I", buf, o - 4)[0] == c for o, c in all_offsets
    )
    ok_trailer = all(
        buf[o + c : o + c + 4] == (buf[o + c - 4 : o + c] if c >= 4 else buf[o : o + c].ljust(4, b"\0"))
        for o, c in all_offsets
    )
    return {
        "ifds_before_data": ok_before_data,
        "row_major": ok_order,
        "block_leader": ok_leader,
        "block_trailer": ok_trailer,
        "valid": ok_before_data and ok_order and ok_leader and ok_trailer,
    }


# --------------------------------------------------------------- Ray sink


def write_cog_sink(images, out_dir: str, resume: bool = True, **cog_kwargs):
    """Partitioned COG sink: one .tif per chip (image_id-named),
    written atomically (tmp + rename) so a re-run skips finished files
    (the --resume discipline of gdal2tiles.py:2846).  Returns a
    manifest Dataset (image_id, path, levels, tiles, size)."""
    import pyarrow as pa

    from ..functions import codecs

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("image_id").to_pylist()
        data = t.column("bytes").to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        fmts = t.column("fmt").to_pylist()
        has_env = "minx" in t.column_names
        rows = {"image_id": [], "path": [], "levels": [], "tiles": [], "size": []}
        for i in range(t.num_rows):
            path = os.path.join(out_dir, f"{ids[i]}.tif")
            if resume and os.path.exists(path):
                st = os.stat(path)
                rows["image_id"].append(ids[i])
                rows["path"].append(path)
                rows["levels"].append(-1)  # skipped (resume)
                rows["tiles"].append(-1)
                rows["size"].append(st.st_size)
                continue
            img = codecs.decode(data[i], ws[i], hs[i], fmts[i])
            env = None
            if has_env:
                env = (
                    t.column("minx")[i].as_py(),
                    t.column("miny")[i].as_py(),
                    t.column("maxx")[i].as_py(),
                    t.column("maxy")[i].as_py(),
                )
            st = write_cog(path, img, envelope=env, **cog_kwargs)
            rows["image_id"].append(ids[i])
            rows["path"].append(st["path"])
            rows["levels"].append(st["levels"])
            rows["tiles"].append(st["tiles"])
            rows["size"].append(st["size"])
        return pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "path": pa.array(rows["path"], pa.string()),
                "levels": pa.array(rows["levels"], pa.int32()),
                "tiles": pa.array(rows["tiles"], pa.int32()),
                "size": pa.array(rows["size"], pa.int64()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=64)
