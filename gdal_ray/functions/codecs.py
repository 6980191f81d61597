"""Image codecs for the ``bytes`` column: raw / png / qraw.

The input table carries encoded pixels as an opaque Arrow ``binary``
column plus (w, h, fmt).  Three deterministic codecs (the container has
no PIL/cv2/GDAL — reference raster drivers live in frmts/, e.g. PNG
frmts/png/; we implement the subset needed by the north star):

- ``raw``  : C-order uint8 RGB buffer (lossless).
- ``png``  : minimal PNG (8-bit RGB, filter 0, fixed zlib level 6) —
             lossless, deterministic bytes.
- ``qraw`` : uniform 3-bit-truncation quantizer (lossy stand-in for
             JPEG until a JPEG codec is available; reconstruction at
             bucket midpoint gives PSNR ~40.7 dB on uniform data,
             exercising the PSNR>=40dB parity path of BASELINE.md).

All functions are per-image (one chip = one row); batch stages loop
over rows of a batch but each call is O(w*h) vectorized numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode (h, w, 3) uint8 -> PNG bytes (color type 2, filter 0).

    ``level`` is the zlib effort (lossless either way; deterministic
    per level).  Interior pipeline stages that re-decode immediately
    (tile compose) use level 1 — the decoded pixels, and hence every
    checksum oracle, are identical, and encode is ~2x cheaper."""
    h, w = img.shape[:2]
    img = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * 3)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


#: PNG color type -> samples per pixel
_PNG_SPP = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


#: Adam7 pass lattice (x0, y0, dx, dy), PNG spec 8.2
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_defilter(raw: np.ndarray, h: int, nb: int,
                  bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters 0-4 over a (h, 1+nb) byte array
    -> (h, nb) reconstructed samples."""
    filters = raw[:, 0]
    out = np.empty((h, nb), dtype=np.uint8)
    if not filters.any():  # common fast path: all filter 0
        out[:] = raw[:, 1:]
        return out
    prev = np.zeros(nb, dtype=np.uint8)
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        f = filters[y]
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-scan
            rec = np.empty(nb, dtype=np.int32)
            pv = prev.astype(np.int32)
            for i in range(nb):
                a = rec[i - bpp] if i >= bpp else 0
                b = pv[i]
                if f == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = pv[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = (abs(p - a), abs(p - b), abs(p - c))
                    pred = (a if (pa <= pb and pa <= pc)
                            else (b if pb <= pc else c))
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG (filters 0-4): 8-bit RGB -> (h, w, 3) uint8 (the
    engine's chip form), grayscale 8 -> (h, w) uint8, grayscale 16 ->
    (h, w) uint16 (big-endian samples per spec), RGBA 8 -> (h, w, 4),
    gray+alpha -> (h, w, 2), and 8-bit palette (PLTE) expanded to
    (h, w, 3) — the color surfaces of the reference's PNG driver
    (frmts/png)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = depth = ctype = None
    idat = []
    plte = None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack_from(">IIBBBBB", payload)
            if interlace not in (0, 1):
                raise ValueError(f"bad PNG interlace {interlace}")
            if ctype not in _PNG_SPP:
                raise ValueError(f"unsupported PNG ctype={ctype}")
            if depth == 16 and ctype != 0:
                raise ValueError("16-bit PNG supported for grayscale "
                                 "only")
            if depth not in (8, 16):
                raise ValueError(f"unsupported PNG depth={depth}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    spp = _PNG_SPP[ctype]
    bpp = spp * (depth // 8)
    nb = w * bpp
    stream = np.frombuffer(zlib.decompress(b"".join(idat)),
                           dtype=np.uint8)
    if interlace:
        # Adam7 (PNG spec 8.2): seven consecutive sub-images, each
        # filtered independently, scattered onto the (y0 + dy*j,
        # x0 + dx*i) lattice
        out = np.zeros((h, nb), dtype=np.uint8)
        full = out.reshape(h, w, bpp)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            nbp = wp * bpp
            sub = stream[pos2:pos2 + hp * (1 + nbp)].reshape(
                hp, 1 + nbp)
            pos2 += hp * (1 + nbp)
            rec = _png_defilter(sub, hp, nbp, bpp)
            full[y0::dy, x0::dx] = rec.reshape(hp, wp, bpp)
    else:
        raw = stream.reshape(h, 1 + nb)
        out = _png_defilter(raw, h, nb, bpp)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[out.reshape(h, w)]
    if depth == 16:
        return out.reshape(h, w, 2).astype(np.uint16) @ \
            np.array([256, 1], np.uint16)
    if spp == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, spp)


def encode_png_gray(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) uint8 or uint16 -> grayscale PNG (ctype 0; 16-bit
    samples big-endian per spec), filter 0."""
    h, w = img.shape
    if img.dtype == np.uint8:
        depth, body = 8, np.ascontiguousarray(img)
        nb = w
    elif img.dtype == np.uint16:
        depth = 16
        body = np.ascontiguousarray(img.astype(">u2")).view(
            np.uint8).reshape(h, 2 * w)
        nb = 2 * w
    else:
        raise ValueError("grayscale PNG needs uint8 or uint16")
    raw = np.empty((h, 1 + nb), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = body.reshape(h, nb)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    idat = zlib.compress(raw.tobytes(), level)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def encode_png_palette(idx: np.ndarray, palette: np.ndarray,
                       level: int = 6) -> bytes:
    """(h, w) uint8 indices + (n, 3) uint8 palette -> ctype-3 PNG."""
    h, w = idx.shape
    raw = np.empty((h, 1 + w), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = idx
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", np.ascontiguousarray(
                palette, np.uint8).tobytes())
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
            + _chunk(b"IEND", b""))


def encode_qraw(img: np.ndarray) -> bytes:
    """Lossy: keep top 5 bits of each channel (values 0..31, one byte each)."""
    q = (np.ascontiguousarray(img, dtype=np.uint8) >> 3).astype(np.uint8)
    return q.tobytes()


def decode_qraw(data: bytes, w: int, h: int) -> np.ndarray:
    q = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3).astype(np.uint16)
    return np.minimum(q * 8 + 4, 255).astype(np.uint8)


def encode_raw(img: np.ndarray) -> bytes:
    return np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


JPEG_QUALITY = 97  # keeps PSNR >= 40 dB on the noisy fixture content


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one chip to (h, w, 3) uint8."""
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "qraw":
        return decode_qraw(data, w, h)
    if fmt == "jpeg":
        from . import jpegc

        return jpegc.decode_jpeg(data)
    if fmt == "webp":
        from . import webp

        return np.ascontiguousarray(webp.decode_webp(data)[:, :, :3])
    raise ValueError(f"unknown fmt {fmt!r}")


def encode(img: np.ndarray, fmt: str) -> bytes:
    """Encode (h, w, 3) uint8 to one chip's bytes."""
    if fmt == "raw":
        return encode_raw(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "qraw":
        return encode_qraw(img)
    if fmt == "jpeg":
        from . import jpegc

        return jpegc.encode_jpeg(img, JPEG_QUALITY)
    if fmt == "webp":
        from . import webp

        # pipeline default: the fully vectorized literal path (lossless
        # either way; LZ77/cache/predictor stay available through
        # functions.webp.encode_webp for interchange-grade compression)
        return webp.encode_webp(img, use_lz77=False)
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw", "png", "webp")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
