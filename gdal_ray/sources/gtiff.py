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
- DEFLATE (zlib, compression id 8), LZW (id 5 via the in-engine
  TIFF-flavor early-change codec, functions/lzw.py), WEBP lossless
  (50001 via the in-engine VP8L codec, uint8 RGB tiles only) or
  uncompressed (1);
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
_T_STRIPOFFSETS = 273
_T_SAMPLESPERPIXEL = 277
_T_ROWSPERSTRIP = 278
_T_STRIPBYTECOUNTS = 279
_T_PLANARCONFIG = 284
_T_PREDICTOR = 317
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
_TYPE_LONG8 = 16  # BigTIFF 64-bit unsigned

_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8, _TYPE_LONG8: 8}
_TYPE_FMT = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d",
             _TYPE_LONG8: "Q"}

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
    quality: int = 90,
    subsampling: str = "444",
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
    if compress not in ("deflate", "none", "webp", "lzw", "jpeg"):
        raise ValueError("compress must be deflate|none|webp|lzw|jpeg")
    if compress == "webp" and (nb != 3 or img.dtype != np.uint8):
        raise ValueError(
            "compress='webp' requires uint8 3-band imagery (the GDAL "
            "GTiff WEBP restriction: PHOTOMETRIC RGB, Byte)")
    if compress == "jpeg" and img.dtype != np.uint8:
        raise ValueError(
            "compress='jpeg' requires uint8 samples (the GDAL GTiff "
            "JPEG restriction: Byte, 1 or 3 bands)")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be 444|420")

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
            if compress == "webp":
                from ..functions.webp import encode_webp

                enc = encode_webp(tile, use_lz77=False)
            elif compress == "jpeg":
                # TIFF 6.0 TechNote 2 new-style JPEG (COMPRESSION=7):
                # each tile is one complete baseline JFIF stream
                # (frmts/gtiff JPEG codec path via libjpeg); 4:2:0
                # matches the real-world libjpeg default layout
                from ..functions.jpegc import (encode_jpeg,
                                               encode_jpeg_420,
                                               encode_jpeg_gray)

                if nb != 3:
                    enc = encode_jpeg_gray(tile, quality)
                elif subsampling == "420":
                    enc = encode_jpeg_420(tile, quality)
                else:
                    enc = encode_jpeg(tile, quality)
            elif compress == "lzw":
                from ..functions.lzw import lzw_encode

                enc = lzw_encode(tile.tobytes())
            else:
                raw = tile.tobytes()
                enc = (zlib.compress(raw, 6)
                       if compress == "deflate" else raw)
            leader = struct.pack("<I", len(enc))
            trailer = enc[-4:] if len(enc) >= 4 else enc.ljust(4, b"\0")
            ifd.tile_offsets.append(pos + 4)  # offset past the leader
            ifd.tile_sizes.append(len(enc))
            blob = leader + enc + trailer
            chunks.append(blob)
            pos += len(blob)

    # ---- render IFD tables
    comp_id = {"deflate": 8, "none": 1, "webp": 50001,
               "lzw": 5, "jpeg": 7}[compress]

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
        photometric = (6 if (compress == "jpeg" and nb == 3)
                       else (2 if nb == 3 else 1))
        entries.append(
            pack_entry(_T_PHOTOMETRIC, _TYPE_SHORT, 1, photometric)
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


def _parse_header(buf: bytes) -> tuple[bool, int]:
    """Return (bigtiff, first_ifd_offset).  Little-endian only (the
    engine never emits MM; reference readers accept both,
    gtiffdataset_read.cpp bSwab — documented restriction)."""
    if buf[:2] != b"II":
        raise ValueError("only little-endian TIFF supported")
    (magic,) = struct.unpack_from("<H", buf, 2)
    if magic == 42:
        (first,) = struct.unpack_from("<I", buf, 4)
        return False, first
    if magic == 43:
        offsize, zero = struct.unpack_from("<HH", buf, 4)
        if offsize != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        (first,) = struct.unpack_from("<Q", buf, 8)
        return True, first
    raise ValueError(f"not a TIFF (magic {magic})")


def _parse_ifds(buf: bytes) -> tuple[list[dict], bool, int]:
    """Parse the IFD chain of a classic (magic 42, 12-byte entries,
    4-byte offsets) or BigTIFF (magic 43, 20-byte entries, 8-byte
    offsets) file.  Each IFD is {tag: (type, count, raw_value_bytes)};
    raw_value_bytes is the inline value field (4 or 8 bytes) which is
    either the value(s) or the out-of-line offset."""
    big, first = _parse_header(buf)
    entry_sz, cnt_fmt = (20, "<Q") if big else (12, "<I")
    ifds: list[dict] = []
    pos = first
    while pos:
        if big:
            (n,) = struct.unpack_from("<Q", buf, pos)
            base = pos + 8
        else:
            (n,) = struct.unpack_from("<H", buf, pos)
            base = pos + 2
        tags = {}
        for k in range(n):
            e = base + k * entry_sz
            tag, typ = struct.unpack_from("<HH", buf, e)
            (count,) = struct.unpack_from(cnt_fmt, buf, e + 4)
            raw = buf[e + entry_sz - (8 if big else 4) : e + entry_sz]
            tags[tag] = (typ, count, raw)
        (pos,) = struct.unpack_from(cnt_fmt, buf, base + n * entry_sz)
        ifds.append(tags)
    return ifds, big, first


def _tag_values(buf: bytes, tags: dict, tag: int, big: bool) -> list:
    """Decode a tag's value list, inline or out-of-line."""
    typ, count, raw = tags[tag]
    size, fmt = _TYPE_SIZE[typ], _TYPE_FMT[typ]
    if count * size <= (8 if big else 4):
        return list(struct.unpack_from(f"<{count}{fmt}", raw))
    (off,) = struct.unpack_from("<Q" if big else "<I", raw)
    return list(struct.unpack_from(f"<{count}{fmt}", buf, off))


def _undo_predictor2(a: np.ndarray) -> np.ndarray:
    """Undo TIFF predictor=2 horizontal differencing: cumulative sum
    along x per sample, wrapping in the storage dtype (mod 256 for
    uint8) exactly as the spec's byte differencing requires."""
    return np.cumsum(a, axis=1, dtype=a.dtype)


def read_cog(path: str, level: int = 0) -> dict:
    """Read one IFD level of a little-endian TIFF: tiled (the engine's
    COG layout) or stripped, classic or BigTIFF, uncompressed or
    deflate, predictor 1/2 (gtiffdataset_read.cpp strip/tile dual path
    + predictor undo).  Returns dict(img, envelope, levels,
    cog_layout: bool)."""
    with open(path, "rb") as f:
        buf = f.read()
    ifds, big, first_ifd = _parse_ifds(buf)
    ghost = buf[(16 if big else 8) : first_ifd]
    cog_layout = b"LAYOUT=IFDS_BEFORE_DATA" in ghost

    tags = ifds[level]

    def gv(tag, default=None):
        return _tag_values(buf, tags, tag, big)[0] if tag in tags else default

    w, h = gv(_T_WIDTH), gv(_T_LENGTH)
    nb = gv(_T_SAMPLESPERPIXEL, 1)
    comp = gv(_T_COMPRESSION, 1)
    pred = gv(_T_PREDICTOR, 1)
    planar = gv(_T_PLANARCONFIG, 1)
    sfmt = gv(_T_SAMPLEFORMAT, 1)
    bps = gv(_T_BITSPERSAMPLE, 8)
    if comp not in (1, 5, 7, 8, 50001):
        raise ValueError(f"unsupported compression {comp}")
    if comp in (7, 50001) and pred == 2:
        raise ValueError(
            "JPEG/WEBP compression cannot combine with predictor=2")
    if pred not in (1, 2):
        raise ValueError(f"unsupported predictor {pred}")
    if planar not in (1, 2):
        raise ValueError(f"unsupported planar config {planar}")
    if sfmt == 1 and bps == 8:
        dtype = np.uint8
    elif sfmt == 1 and bps == 16:
        dtype = np.uint16
    elif sfmt == 3 and bps == 32:
        dtype = np.float32
    else:
        raise ValueError(f"unsupported sample format {sfmt}/{bps}")
    if pred == 2 and dtype == np.float32:
        raise ValueError("predictor=2 requires integer samples")
    img = np.zeros((h, w, nb) if nb > 1 else (h, w), dtype)
    sep = planar == 2 and nb > 1  # band-sequential chunk layout

    def _paste(a: np.ndarray, y0: int, x0: int, band: int | None):
        hh = min(a.shape[0], h - y0)
        ww = min(a.shape[1], w - x0)
        if band is not None:
            img[y0 : y0 + hh, x0 : x0 + ww, band] = a[:hh, :ww]
        elif nb > 1:
            img[y0 : y0 + hh, x0 : x0 + ww, :] = a[:hh, :ww, :]
        else:
            img[y0 : y0 + hh, x0 : x0 + ww] = a[:hh, :ww]

    if _T_TILEOFFSETS in tags:
        ts = gv(_T_TILEWIDTH)
        offsets = _tag_values(buf, tags, _T_TILEOFFSETS, big)
        counts = _tag_values(buf, tags, _T_TILEBYTECOUNTS, big)
        ntx = math.ceil(w / ts)
        per_band = math.ceil(h / ts) * ntx  # tiles per plane when sep
        for ti, (o, c) in enumerate(zip(offsets, counts)):
            enc = buf[o : o + c]
            band = ti // per_band if sep else None
            if comp == 50001:
                from ..functions.webp import decode_webp

                if sep or nb != 3:
                    raise ValueError(
                        "WEBP tiles require chunky 3-band layout")
                tile = np.ascontiguousarray(decode_webp(enc)[:, :, :3])
            elif comp == 7:
                from ..functions.jpegc import decode_jpeg

                if sep:
                    raise ValueError(
                        "JPEG tiles require chunky layout")
                tile = decode_jpeg(enc)
            else:
                if comp == 8:
                    raw = zlib.decompress(enc)
                elif comp == 5:
                    from ..functions.lzw import lzw_decode

                    raw = lzw_decode(enc)
                else:
                    raw = enc
                shape = (ts, ts) if (sep or nb == 1) else (ts, ts, nb)
                tile = np.frombuffer(raw, dtype).reshape(shape)
            if pred == 2:
                tile = _undo_predictor2(tile)
            ty, tx = divmod(ti % per_band if sep else ti, ntx)
            _paste(tile, ty * ts, tx * ts, band)
    elif _T_STRIPOFFSETS in tags:
        offsets = _tag_values(buf, tags, _T_STRIPOFFSETS, big)
        counts = _tag_values(buf, tags, _T_STRIPBYTECOUNTS, big)
        rps = gv(_T_ROWSPERSTRIP, h)
        per_band = math.ceil(h / rps)  # strips per plane when sep
        if comp == 50001:
            raise ValueError("WEBP compression is tile-only (no strips)")
        for si, (o, c) in enumerate(zip(offsets, counts)):
            band = si // per_band if sep else None
            y0 = (si % per_band if sep else si) * rps
            rows = min(rps, h - y0)
            enc = buf[o : o + c]
            if comp == 7:
                from ..functions.jpegc import decode_jpeg

                if sep:
                    raise ValueError("JPEG strips require chunky layout")
                _paste(decode_jpeg(enc), y0, 0, None)
                continue
            if comp == 8:
                raw = zlib.decompress(enc)
            elif comp == 5:
                from ..functions.lzw import lzw_decode

                raw = lzw_decode(enc)
            else:
                raw = enc
            shape = (rows, w) if (sep or nb == 1) else (rows, w, nb)
            a = np.frombuffer(raw, dtype).reshape(shape)
            if pred == 2:
                a = _undo_predictor2(a)
            _paste(a, y0, 0, band)
    else:
        raise ValueError("IFD has neither tile nor strip offsets")

    envelope = None
    main = ifds[0]
    if _T_PIXELSCALE in main and _T_TIEPOINT in main:
        sx, sy, _ = _tag_values(buf, main, _T_PIXELSCALE, big)
        tp = _tag_values(buf, main, _T_TIEPOINT, big)
        minx, maxy = tp[3], tp[4]
        w0 = _tag_values(buf, main, _T_WIDTH, big)[0]
        h0 = _tag_values(buf, main, _T_LENGTH, big)[0]
        envelope = (minx, maxy - sy * h0, minx + sx * w0, maxy)
    return {
        "img": img,
        "envelope": envelope,
        "levels": len(ifds),
        "cog_layout": cog_layout,
    }


# --------------------------------------------- strip writer (plain TIFF)


def _render_ifd(entries, table_pos: int, big: bool, next_ifd: int = 0) -> bytes:
    """Render one IFD (table + out-of-line payload immediately after).
    entries: list of (tag, type, [values])."""
    n = len(entries)
    table_sz = (8 + n * 20 + 8) if big else (2 + n * 12 + 4)
    payload_pos = table_pos + table_sz
    cap = 8 if big else 4
    cfmt = "<Q" if big else "<I"
    payload = bytearray()
    ents = []
    for tag, typ, vals in sorted(entries):
        data = struct.pack(f"<{len(vals)}{_TYPE_FMT[typ]}", *vals)
        if len(data) <= cap:
            raw = data.ljust(cap, b"\0")
        else:
            raw = struct.pack(cfmt, payload_pos + len(payload))
            payload += data
        ents.append(
            struct.pack("<HH", tag, typ)
            + struct.pack(cfmt, len(vals))
            + raw
        )
    out = bytearray()
    out += struct.pack("<Q" if big else "<H", n)
    for e in ents:
        out += e
    out += struct.pack(cfmt, next_ifd)
    out += payload
    return bytes(out)


def write_tiff(
    path: str,
    img: np.ndarray,
    envelope: tuple[float, float, float, float] | None = None,
    rows_per_strip: int = 64,
    compress: str = "deflate",
    predictor: int = 1,
    bigtiff: bool = False,
    planar: int = 1,
    quality: int = 90,
) -> dict:
    """Plain strip-layout TIFF writer: classic or BigTIFF offsets,
    optional predictor=2 horizontal differencing (integer samples,
    per-sample mod-2^bits) under deflate, pixel- (1) or band-
    sequential (2) planar config — the non-COG interop shapes the
    reference's GTiff driver reads and writes by default
    (gtiffdataset_write.cpp strip path, TIFFPredictor).  Single IFD,
    no overviews; georef tags as write_cog.  Returns {path, strips,
    size, bigtiff}."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    if img.ndim == 2:
        nb = 1
    elif img.ndim == 3 and img.shape[2] == 3:
        nb = 3
    else:
        raise ValueError("img must be (h,w) or (h,w,{1,3})")
    if img.dtype == np.uint8:
        bps, sfmt = 8, 1
    elif img.dtype == np.uint16:
        bps, sfmt = 16, 1
    elif img.dtype == np.float32:
        bps, sfmt = 32, 3
    else:
        raise ValueError("dtype must be uint8, uint16 or float32")
    if compress not in ("deflate", "none", "lzw", "jpeg"):
        raise ValueError("compress must be deflate|none|lzw|jpeg "
                         "(WEBP is tile-only — use write_cog)")
    if compress == "jpeg":
        if img.dtype != np.uint8:
            raise ValueError("compress='jpeg' requires uint8 samples")
        if predictor == 2:
            raise ValueError("JPEG cannot combine with predictor=2")
        if planar == 2:
            raise ValueError("JPEG strips require chunky layout")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1|2")
    if predictor == 2 and img.dtype == np.float32:
        raise ValueError("predictor=2 requires integer samples")
    if planar not in (1, 2):
        raise ValueError("planar must be 1|2")

    h, w = img.shape[:2]
    planes = (
        [img[:, :, b] for b in range(nb)]
        if planar == 2 and nb > 1
        else [img]
    )
    strips: list[bytes] = []
    for plane in planes:
        for y0 in range(0, h, rows_per_strip):
            sub = plane[y0 : y0 + rows_per_strip]
            if predictor == 2:
                d = sub.copy()
                d[:, 1:] = sub[:, 1:] - sub[:, :-1]  # wraps mod 2^bits
                sub = d
            if compress == "jpeg":
                from ..functions.jpegc import (encode_jpeg,
                                               encode_jpeg_gray)

                strips.append(encode_jpeg(sub, quality) if nb == 3
                              else encode_jpeg_gray(sub, quality))
                continue
            raw = np.ascontiguousarray(sub).tobytes()
            if compress == "deflate":
                strips.append(zlib.compress(raw, 6))
            elif compress == "lzw":
                from ..functions.lzw import lzw_encode

                strips.append(lzw_encode(raw))
            else:
                strips.append(raw)

    n_strips = len(strips)
    off_typ = _TYPE_LONG8 if bigtiff else _TYPE_LONG
    entries = [
        (_T_WIDTH, _TYPE_LONG, [w]),
        (_T_LENGTH, _TYPE_LONG, [h]),
        (_T_BITSPERSAMPLE, _TYPE_SHORT, [bps] * nb),
        (_T_COMPRESSION, _TYPE_SHORT,
         [{"deflate": 8, "lzw": 5, "none": 1, "jpeg": 7}[compress]]),
        (_T_PHOTOMETRIC, _TYPE_SHORT,
         [6 if (compress == "jpeg" and nb == 3)
          else (2 if nb == 3 else 1)]),
        (_T_SAMPLESPERPIXEL, _TYPE_SHORT, [nb]),
        (_T_ROWSPERSTRIP, _TYPE_LONG, [rows_per_strip]),
        (_T_STRIPBYTECOUNTS, _TYPE_LONG, [len(s) for s in strips]),
        (_T_PLANARCONFIG, _TYPE_SHORT, [planar if nb > 1 else 1]),
        (_T_SAMPLEFORMAT, _TYPE_SHORT, [sfmt] * nb),
    ]
    if predictor == 2:
        entries.append((_T_PREDICTOR, _TYPE_SHORT, [2]))
    if envelope is not None:
        minx, miny, maxx, maxy = envelope
        entries.append(
            (_T_PIXELSCALE, _TYPE_DOUBLE,
             [(maxx - minx) / w, (maxy - miny) / h, 0.0])
        )
        entries.append(
            (_T_TIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, minx, maxy, 0.0])
        )
        entries.append(
            (_T_GEOKEYS, _TYPE_SHORT,
             [1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, 3857])
        )

    if bigtiff:
        header = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
        table_pos = 16
    else:
        header = struct.pack("<2sHI", b"II", 42, 8)
        table_pos = 8

    # pass 1 with dummy strip offsets to measure the data start
    probe = entries + [(_T_STRIPOFFSETS, off_typ, [0] * n_strips)]
    data_start = table_pos + len(_render_ifd(probe, table_pos, bigtiff))
    offsets, pos = [], data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    final = entries + [(_T_STRIPOFFSETS, off_typ, offsets)]
    ifd = _render_ifd(final, table_pos, bigtiff)
    assert table_pos + len(ifd) == data_start

    out = header + ifd + b"".join(strips)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, path)
    return {
        "path": path,
        "strips": n_strips,
        "size": len(out),
        "bigtiff": bigtiff,
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


# --------------------------------------------------------------- Ray source


def read_tiff_source(paths, level: int = 0, batch_size: int = 16):
    """Read a list of .tif paths (COG or strip layout, classic or
    BigTIFF) into the engine's chip schema: image_id (file stem),
    bytes (fmt='raw'), w, h, fmt, minx..maxy (NaN when ungeoreferenced).
    The path list is distributed as a Dataset and each file decoded
    inside map_batches — no driver-side I/O."""
    import pyarrow as pa
    import ray.data

    if isinstance(paths, str):
        paths = sorted(
            os.path.join(paths, p)
            for p in os.listdir(paths)
            if p.endswith(".tif")
        )
    ds = ray.data.from_items([{"path": p} for p in paths])

    def fn(t: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                "minx", "miny", "maxx", "maxy")}
        for p in t.column("path").to_pylist():
            r = read_cog(p, level=level)
            img = r["img"]
            env = r["envelope"] or (float("nan"),) * 4
            rows["image_id"].append(os.path.splitext(os.path.basename(p))[0])
            rows["bytes"].append(np.ascontiguousarray(img).tobytes())
            rows["h"].append(img.shape[0])
            rows["w"].append(img.shape[1])
            rows["fmt"].append("raw")
            for k, v in zip(("minx", "miny", "maxx", "maxy"), env):
                rows[k].append(float(v))
        return pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "fmt": pa.array(rows["fmt"], pa.string()),
                "minx": pa.array(rows["minx"], pa.float64()),
                "miny": pa.array(rows["miny"], pa.float64()),
                "maxx": pa.array(rows["maxx"], pa.float64()),
                "maxy": pa.array(rows["maxy"], pa.float64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


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
