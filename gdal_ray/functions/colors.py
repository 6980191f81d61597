"""Color quantization (median cut) + Floyd-Steinberg dithering.

Reference semantics: alg/gdalmediancut.cpp GDALComputeMedianCutPCT
(recursive box split on the widest channel at the median) and
alg/gdaldither.cpp GDALDitherRGB2PCT (Floyd-Steinberg error diffusion
with the 7/16, 3/16, 5/16, 1/16 kernel).  Deterministic: ties split
toward the lower index; palette ordered by box creation order.
"""

from __future__ import annotations

import numpy as np


def median_cut_palette(img: np.ndarray, n_colors: int = 16) -> np.ndarray:
    """(h, w, 3) uint8 -> (n, 3) uint8 palette via median cut.

    Split the box with the largest (range * count) on its widest axis
    at the median; ties toward the lower box index.  Box ranges are
    cached — only the two boxes produced by a split are re-measured."""
    pixels = img.reshape(-1, 3).astype(np.int32)

    def width_of(b):
        return int((b.max(axis=0) - b.min(axis=0)).max()) if len(b) else -1

    boxes = [pixels]
    widths = [width_of(pixels)]
    while len(boxes) < n_colors:
        scores = [-w * len(b) for w, b in zip(widths, boxes)]
        i = int(np.argsort(scores, kind="stable")[0])
        b = boxes[i]
        if len(b) <= 1 or widths[i] <= 0:
            break
        axis = int((b.max(axis=0) - b.min(axis=0)).argmax())
        srt = b[np.argsort(b[:, axis], kind="stable")]
        mid = len(srt) // 2
        boxes[i] = srt[:mid]
        boxes.append(srt[mid:])
        widths[i] = width_of(boxes[i])
        widths.append(width_of(boxes[-1]))
    pal = np.array(
        [
            np.floor(b.mean(axis=0) + 0.5) if len(b) else np.zeros(3)
            for b in boxes
        ],
        dtype=np.int32,
    )
    return np.clip(pal, 0, 255).astype(np.uint8)


def nearest_palette_index(pix: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Nearest palette entry by squared RGB distance; ties -> lowest index.

    Computed as argmin of (-2 p.pal + |pal|^2): differs from the true
    squared distance by the per-pixel constant |p|^2, so the argmin and
    its tie ordering are identical — and all values are exact integers
    in float64, so BLAS evaluation is safe."""
    p = pix.astype(np.float64)
    pal = palette.astype(np.float64)
    d = p @ (-2.0 * pal.T)
    d += (pal * pal).sum(axis=1)[None, :]
    return d.argmin(axis=1)


def quantize(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Nearest-color mapping (no dithering): (h, w) palette indices."""
    h, w = img.shape[:2]
    idx = nearest_palette_index(img.reshape(-1, 3), palette)
    return idx.reshape(h, w).astype(np.uint8)


def dither_floyd_steinberg(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Floyd-Steinberg error diffusion onto the palette -> (h, w)
    indices (gdaldither.cpp kernel: right 7/16, down-left 3/16,
    down 5/16, down-right 1/16; serpentine OFF, matching the
    left-to-right reference loop)."""
    h, w = img.shape[:2]
    work = img.astype(np.float64).copy()
    out = np.zeros((h, w), dtype=np.uint8)
    palf = palette.astype(np.float64)
    for y in range(h):
        for x in range(w):
            old = work[y, x]
            i = int(((palf - old) ** 2).sum(axis=1).argmin())
            out[y, x] = i
            err = old - palf[i]
            if x + 1 < w:
                work[y, x + 1] += err * (7 / 16)
            if y + 1 < h:
                if x > 0:
                    work[y + 1, x - 1] += err * (3 / 16)
                work[y + 1, x] += err * (5 / 16)
                if x + 1 < w:
                    work[y + 1, x + 1] += err * (1 / 16)
    return out


def dither_floyd_steinberg_wavefront(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Bitwise-identical vectorization of :func:`dither_floyd_steinberg`.

    FS is sequential per pixel, but pixel (y, x) depends only on
    (y, x-1), (y-1, x-1), (y-1, x), (y-1, x+1) — all of which lie on an
    earlier anti-diagonal wavefront t = 2y + x.  Pixels on one wavefront
    are therefore independent and vectorize.  Error pushes are scattered
    with one np.add.at per wavefront, flattened (source-major, kernel
    order right/down-left/down/down-right, sources ascending y) so the
    float accumulation order equals the scalar loop's row-major order —
    the result is bit-identical (asserted in tests)."""
    h, w = img.shape[:2]
    work = img.astype(np.float64).copy()
    out = np.zeros((h, w), dtype=np.uint8)
    palf = palette.astype(np.float64)
    flat = work.reshape(-1, 3)
    # kernel offsets (dy, dx, weight) in the scalar push order
    offs = np.array([[0, 1], [1, -1], [1, 0], [1, 1]], dtype=np.int64)
    wgt = np.array([7.0, 3.0, 5.0, 1.0]) / 16.0
    for t in range(2 * (h - 1) + (w - 1) + 1):
        y_lo = max(0, (t - (w - 1) + 1) // 2)
        y_hi = min(h - 1, t // 2)
        if y_lo > y_hi:
            continue
        ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
        xs = t - 2 * ys
        old = work[ys, xs]  # (K, 3)
        d = ((palf[None, :, :] - old[:, None, :]) ** 2).sum(axis=2)
        idx = d.argmin(axis=1)
        out[ys, xs] = idx
        err = old - palf[idx]  # (K, 3)
        ty = ys[:, None] + offs[None, :, 0]  # (K, 4)
        tx = xs[:, None] + offs[None, :, 1]
        valid = (ty < h) & (tx >= 0) & (tx < w)
        contrib = err[:, None, :] * wgt[None, :, None]  # (K, 4, 3)
        tgt = (ty * w + tx).reshape(-1)
        v = valid.reshape(-1)
        np.add.at(flat, tgt[v], contrib.reshape(-1, 3)[v])
    return out


def dither_floyd_steinberg_batch(imgs: np.ndarray, palettes: np.ndarray) -> np.ndarray:
    """Wavefront FS dither over a STACK of same-shape images, each with
    its own palette: (B, h, w, 3) x (B, P, 3) -> (B, h, w) indices.
    Amortizes the per-wavefront numpy overhead across the whole batch;
    per image the arithmetic order equals the scalar loop (bit-identical,
    tested against :func:`dither_floyd_steinberg`)."""
    B, h, w = imgs.shape[:3]
    work = imgs.astype(np.float64).copy()
    out = np.zeros((B, h, w), dtype=np.uint8)
    palf = palettes.astype(np.float64)  # (B, P, 3)
    flat = work.reshape(B, -1, 3)
    offs = np.array([[0, 1], [1, -1], [1, 0], [1, 1]], dtype=np.int64)
    wgt = np.array([7.0, 3.0, 5.0, 1.0]) / 16.0
    bi = np.arange(B, dtype=np.int64)
    for t in range(2 * (h - 1) + (w - 1) + 1):
        y_lo = max(0, (t - (w - 1) + 1) // 2)
        y_hi = min(h - 1, t // 2)
        if y_lo > y_hi:
            continue
        ys = np.arange(y_lo, y_hi + 1, dtype=np.int64)
        xs = t - 2 * ys
        old = work[:, ys, xs]  # (B, K, 3)
        d = ((palf[:, None, :, :] - old[:, :, None, :]) ** 2).sum(axis=3)  # (B, K, P)
        idx = d.argmin(axis=2)  # (B, K)
        out[:, ys, xs] = idx
        err = old - np.take_along_axis(palf, idx[:, :, None], axis=1)
        ty = ys[:, None] + offs[None, :, 0]  # (K, 4)
        tx = xs[:, None] + offs[None, :, 1]
        valid = ((ty < h) & (tx >= 0) & (tx < w)).reshape(-1)
        tgt = (ty * w + tx).reshape(-1)[valid]
        contrib = (err[:, :, None, :] * wgt[None, None, :, None]).reshape(B, -1, 3)[
            :, valid, :
        ]
        bidx = np.repeat(bi, len(tgt))
        np.add.at(
            flat, (bidx, np.tile(tgt, B)), contrib.reshape(-1, 3)
        )
    return out


def apply_palette(indices: np.ndarray, palette: np.ndarray) -> np.ndarray:
    return palette[indices]
