"""Maptech/NOAA BSB nautical raster charts — the reference's
``frmts/bsb/bsb_read.c`` surface, from the published reverse-
engineered layout (the Higgins notes quoted verbatim in the
reference), not its code.

Layout:

- ASCII header lines (``VER/2.0``, ``BSB/NA=...,RA=w,h``,
  ``RGB/index,r,g,b`` palette entries, ``!`` comments) terminated by
  the ``0x1A 0x00`` end-of-header sequence;
- one color-size byte (bits per pixel value, 1..7);
- run-length-coded scanlines: a 7-bit most-significant-first
  multi-byte LINE NUMBER (1-based for version >= 2.0), then pixel
  bytes — value in the TOP ``colorsize`` bits below the 0x80
  continuation flag, run count in the low bits extended by
  0x80-flagged continuation bytes (``count = count*128 + (b &
  0x7f)``), each token emitting ``count + 1`` pixels — closed by a
  0x00 terminator (``bsb_read.c:760-880``);
- the writer, like the reference's ``BSBWriteScanline``
  (``bsb_read.c:1054-1107``), emits one byte per pixel (run count 0);
  the reader decodes FULL multi-byte runs, so real charts read too;
- the reference's one-pixel-short scanline quirk
  (``bsb_read.c:874-878``) is honored on read.
"""

from __future__ import annotations

import os

import numpy as np


def write_bsb(path: str, idx: np.ndarray, palette: np.ndarray, *,
              name: str = "chart", version: str = "2.0") -> None:
    """``idx`` = (rows, cols) uint8 palette indices (1-based values
    recommended; 0 is the run terminator domain in some readers),
    ``palette`` = (n, 3) uint8 RGB rows registered as ``RGB/i,r,g,b``
    with 1-based indices like real charts."""
    a = np.asarray(idx)
    if a.ndim != 2 or a.dtype != np.uint8:
        raise ValueError("BSB wants (rows, cols) uint8 indices")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("palette must be (n, 3) RGB")
    nmax = int(a.max(initial=0))
    color_size = max(1, nmax.bit_length())
    if color_size > 7:
        raise ValueError("BSB pixel values exceed 7 bits")
    ny, nx = a.shape
    lines = [
        "! Written by gdal_ray.",
        f"VER/{version}",
        f"BSB/NA={name},NU=,RA={nx},{ny},DU=254",
    ]
    for i, (r, g, b) in enumerate(pal):
        lines.append(f"RGB/{i + 1},{r},{g},{b}")
    shift = 7 - color_size
    parts = [("\r\n".join(lines) + "\r\n").encode("ascii"),
             b"\x1a\x00", bytes([color_size])]
    v2 = float(version) >= 2.0
    for y in range(ny):
        n = y + 1 if v2 else y
        row = bytearray()
        if n >= 128 * 128:
            row.append(0x80 | ((n >> 14) & 0x7F))
        if n >= 128:
            row.append(0x80 | ((n >> 7) & 0x7F))
        row.append(n & 0x7F)
        row += bytes((a[y].astype(np.uint16) << shift)
                     .astype(np.uint8).tobytes())
        row.append(0x00)
        parts.append(bytes(row))
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(parts))
    os.replace(tmp, path)


def read_bsb(path: str) -> dict:
    """-> dict(idx (rows, cols) uint8, rgb (rows, cols, 3) uint8,
    palette, header dict).  Full multi-byte run decoding."""
    with open(path, "rb") as fh:
        data = fh.read()
    eoh = data.find(b"\x1a\x00")
    if eoh < 0:
        raise ValueError(f"{path}: no BSB end-of-header sequence")
    header = data[:eoh].decode("ascii", "replace")
    kv: dict[str, list[str]] = {}
    pal_entries: dict[int, tuple] = {}
    nx = ny = None
    version = 2.0
    for ln in header.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("!"):
            continue
        if "/" not in ln:
            continue
        key, body = ln.split("/", 1)
        kv.setdefault(key, []).append(body)
        if key == "VER":
            version = float(body)
        elif key == "BSB":
            for fld in body.split(","):
                if fld.startswith("RA="):
                    nx = int(fld[3:])
                elif fld.isdigit() and nx is not None and ny is None:
                    ny = int(fld)
        elif key == "RGB":
            i, r, g, b = (int(v) for v in body.split(","))
            pal_entries[i] = (r, g, b)
    if nx is None or ny is None:
        raise ValueError(f"{path}: BSB/RA= dimensions not found")
    pos = eoh + 2
    color_size = data[pos]
    pos += 1
    if color_size >= 0x31 and color_size <= 0x38:   # ASCII-digit quirk
        color_size -= 0x30
    if not (1 <= color_size <= 7):
        raise ValueError(f"{path}: bad color size {color_size}")
    shift = 7 - color_size
    value_mask = ((1 << color_size) - 1) << shift
    count_mask = (1 << shift) - 1
    out = np.zeros((ny, nx), np.uint8)
    for y in range(ny):
        # line number: 7-bit groups, 0x80-continued, MSB first
        n = 0
        while True:
            b = data[pos]
            pos += 1
            n = (n << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        want = y + 1 if version >= 2.0 else y
        if n != want:
            raise ValueError(f"{path}: scanline number {n} != {want}")
        i = 0
        row = out[y]
        while True:
            b = data[pos]
            pos += 1
            if b == 0:
                break
            val = (b & value_mask) >> shift
            count = b & count_mask
            while b & 0x80:
                b = data[pos]
                pos += 1
                count = count * 128 + (b & 0x7F)
            if i + count + 1 > nx:
                count = nx - i - 1
            row[i:i + count + 1] = val
            i += count + 1
        if i == nx - 1:                    # the one-short quirk
            row[i] = 0
    npal = max(pal_entries) if pal_entries else 0
    palette = np.zeros((npal + 1, 3), np.uint8)
    for i, rgb0 in pal_entries.items():
        palette[i] = rgb0
    rgb = palette[np.minimum(out, npal)]
    return {"idx": out, "rgb": rgb, "palette": palette,
            "header": kv, "color_size": int(color_size)}
