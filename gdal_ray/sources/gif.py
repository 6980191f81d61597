"""GIF87a source/sink (the reference's ``frmts/gif`` driver links
giflib; this is the published GIF87a layout from scratch):

- header + logical screen descriptor, a global color table, one image
  descriptor, LZW-compressed pixel data in 255-byte sub-blocks (the
  GIF LZW variant lives in functions/lzw.py: LSB-first, variable
  minimum code size, no early change), and the 0x3B trailer;
- true-color input quantizes through the engine's median-cut palette
  with optional Floyd-Steinberg dithering (functions/colors.py — the
  rgb2pct path); inputs with <= 256 distinct colors round-trip
  EXACTLY through an exact palette;
- interlace, animation/extension blocks and local color tables are
  out of scope (declared; extension blocks are SKIPPED on read so
  GIF89a still-image files parse).
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ..functions.lzw import gif_lzw_decode, gif_lzw_encode


def _exact_palette(img: np.ndarray):
    """(palette (n, 3), indices) when the image has <= 256 distinct
    colors, else None."""
    flat = img.reshape(-1, 3)
    packed = (flat[:, 0].astype(np.uint32) << 16) \
        | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    uniq, inv = np.unique(packed, return_inverse=True)
    if len(uniq) > 256:
        return None
    pal = np.stack([(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF,
                    uniq & 0xFF], axis=1).astype(np.uint8)
    return pal, inv.reshape(img.shape[:2]).astype(np.uint8)


def write_gif(path: str, img: np.ndarray, *, n_colors: int = 256,
              dither: bool = False) -> None:
    """Write one still GIF87a.  img: (h, w, 3) uint8 (exact palette
    when <= 256 distinct colors, else median-cut to ``n_colors`` with
    optional dithering) or (h, w) uint8 indices with a grayscale
    palette."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError("GIF: uint8 only")
    if a.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, 1)
        idx = a
    elif a.ndim == 3 and a.shape[2] == 3:
        exact = _exact_palette(a)
        if exact is not None:
            pal, idx = exact
        else:
            from ..functions.colors import (
                dither_floyd_steinberg,
                median_cut_palette,
                quantize,
            )

            pal = median_cut_palette(a, n_colors).astype(np.uint8)
            idx = (dither_floyd_steinberg(a, pal) if dither
                   else quantize(a, pal)).astype(np.uint8)
    else:
        raise ValueError("GIF: (h, w) or (h, w, 3) uint8")
    h, w = idx.shape
    n_pal = len(pal)
    # global color table size: next power of two >= n_pal, >= 2
    size_bits = max(1, int(np.ceil(np.log2(max(n_pal, 2)))))
    table = np.zeros((1 << size_bits, 3), np.uint8)
    table[:n_pal] = pal
    mcs = max(2, size_bits)                 # LZW minimum code size
    packed_lsd = 0x80 | ((size_bits - 1) << 4) | (size_bits - 1)
    out = [b"GIF87a",
           struct.pack("<HHBBB", w, h, packed_lsd, 0, 0),
           table.tobytes(),
           b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0),
           bytes([mcs])]
    lz = gif_lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lz), 255):
        blk = lz[i:i + 255]
        out.append(bytes([len(blk)]) + blk)
    out.append(b"\x00\x3b")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(out))
    os.replace(tmp, path)


def read_gif(path: str) -> np.ndarray:
    """Read the FIRST image of a GIF87a/89a file -> (h, w, 3) uint8
    (extension blocks skipped; interlace/local tables rejected)."""
    buf = open(path, "rb").read()
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    w, h, packed, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        pal = np.frombuffer(buf, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x3B:                       # trailer
            raise ValueError("GIF: no image descriptor before trailer")
        if b0 == 0x21:                       # extension: skip blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        break
    ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", buf[pos + 1:pos + 10])
    pos += 10
    if ipacked & 0x80:
        raise ValueError("GIF: local color tables unsupported")
    if ipacked & 0x40:
        raise ValueError("GIF: interlaced images unsupported")
    if pal is None:
        raise ValueError("GIF: no color table")
    mcs = buf[pos]
    pos += 1
    chunks = []
    while True:
        ln = buf[pos]
        pos += 1
        if ln == 0:
            break
        chunks.append(buf[pos:pos + ln])
        pos += ln
    idx = np.frombuffer(
        gif_lzw_decode(b"".join(chunks), mcs, max_out=iw * ih + 8),
        np.uint8, iw * ih).reshape(ih, iw)
    return np.ascontiguousarray(pal[idx])
