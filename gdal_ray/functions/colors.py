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
    """(h, w, 3) uint8 -> (n, 3) uint8 palette via median cut."""
    pixels = img.reshape(-1, 3).astype(np.int32)
    boxes = [pixels]
    while len(boxes) < n_colors:
        # split the box with the largest (range * count) on its widest axis
        widths = [
            (b.max(axis=0) - b.min(axis=0)).max() if len(b) else -1 for b in boxes
        ]
        order = np.argsort([-w * len(b) for w, b in zip(widths, boxes)], kind="stable")
        i = int(order[0])
        b = boxes[i]
        if len(b) <= 1 or widths[i] <= 0:
            break
        axis = int((b.max(axis=0) - b.min(axis=0)).argmax())
        srt = b[np.argsort(b[:, axis], kind="stable")]
        mid = len(srt) // 2
        boxes[i] = srt[:mid]
        boxes.append(srt[mid:])
    pal = np.array(
        [
            np.floor(b.mean(axis=0) + 0.5) if len(b) else np.zeros(3)
            for b in boxes
        ],
        dtype=np.int32,
    )
    return np.clip(pal, 0, 255).astype(np.uint8)


def nearest_palette_index(pix: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Nearest palette entry by squared RGB distance; ties -> lowest index."""
    d = ((pix[:, None, :].astype(np.int32) - palette[None, :, :].astype(np.int32)) ** 2).sum(
        axis=2
    )
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


def apply_palette(indices: np.ndarray, palette: np.ndarray) -> np.ndarray:
    return palette[indices]
