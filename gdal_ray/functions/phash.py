"""64-bit DCT perceptual hash over decoded chips (deterministic numpy).

The input schema carries ``phash:int64`` (BASELINE.json input_hint); the
engine computes it from decoded pixels: grayscale -> bilinear resize to
32x32 -> 2-D DCT-II -> top-left 8x8 coefficients (skipping DC) compared
against their median -> 64 bits.  Used by the near-dup stage
(groupby on phash bands + within-group Hamming check).
"""

from __future__ import annotations

import numpy as np

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)
    mat = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    mat[0] *= np.sqrt(1.0 / n)
    mat[1:] *= np.sqrt(2.0 / n)
    return mat


_DCT = _dct_matrix(_N)


def _resize_bilinear(gray: np.ndarray, out: int = _N) -> np.ndarray:
    h, w = gray.shape
    ys = (np.arange(out) + 0.5) * h / out - 0.5
    xs = (np.arange(out) + 0.5) * w / out - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    g = gray.astype(np.float64)
    top = g[y0][:, x0] * (1 - fx) + g[y0][:, x1] * fx
    bot = g[y1][:, x0] * (1 - fx) + g[y1][:, x1] * fx
    return top * (1 - fy[:, :1]) + bot * fy[:, :1]


def phash64(img: np.ndarray) -> int:
    """(h, w, 3) uint8 -> signed int64 perceptual hash."""
    gray = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1]
        + 0.114 * img[:, :, 2]
    )
    small = _resize_bilinear(gray)
    coef = _DCT @ small @ _DCT.T
    block = coef[:8, :8].copy().ravel()
    med = np.median(block[1:])  # exclude DC from the median
    bits = block > med
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | np.uint64(bool(b))
    return int(val.astype(np.int64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between int64 hash arrays."""
    x = (np.asarray(a).astype(np.int64) ^ np.asarray(b).astype(np.int64)).astype(
        np.uint64
    )
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt


def phash_bands(h: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """Split int64 hashes into n_bands 16-bit bands (LSH for near-dup):
    returns (len(h), n_bands) int64 array of band values."""
    x = np.asarray(h).astype(np.int64).astype(np.uint64)
    width = np.uint64(64 // n_bands)
    mask = (np.uint64(1) << width) - np.uint64(1)
    out = np.empty((len(x), n_bands), dtype=np.int64)
    for b in range(n_bands):
        out[:, b] = ((x >> (width * np.uint64(b))) & mask).astype(np.int64)
    return out
