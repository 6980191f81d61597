"""Pansharpen (weighted Brovey) + nearblack collar removal.

Reference semantics: alg/gdalpansharpen.cpp (weighted Brovey:
out_band = band * pan / pseudo_pan, pseudo_pan = sum(w_i * band_i));
apps/nearblack_lib.cpp:76 + nearblack_lib_floodfill.cpp (flood fill
from the image border of pixels within `near` of black/white, set to
nodata — NOT a global threshold: interior dark pixels survive).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs, kernels


def brovey_pansharpen(
    ms: np.ndarray, pan: np.ndarray, weights=(1 / 3, 1 / 3, 1 / 3)
) -> np.ndarray:
    """(h, w, 3) multispectral + (H, W) pan -> (H, W, 3) sharpened
    (ms upsampled bilinear to pan grid; GDAL weighted Brovey)."""
    H, W = pan.shape
    up = kernels.resize(ms, W, H, "bilinear").astype(np.float64)
    pseudo = sum(w * up[:, :, i] for i, w in enumerate(weights))
    pseudo = np.maximum(pseudo, 1e-9)
    ratio = pan.astype(np.float64) / pseudo
    out = up * ratio[:, :, None]
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def nearblack_mask(img: np.ndarray, near: int = 15, white: bool = False) -> np.ndarray:
    """True where the border-connected collar of near-black (or
    near-white) pixels sits (4-connected flood fill from every edge)."""
    if white:
        nearv = (img.astype(np.int32) >= 255 - near).all(axis=2)
    else:
        nearv = (img.astype(np.int32) <= near).all(axis=2)
    h, w = nearv.shape
    mask = np.zeros((h, w), dtype=bool)
    mask[0, :] = nearv[0, :]
    mask[-1, :] = nearv[-1, :]
    mask[:, 0] = nearv[:, 0]
    mask[:, -1] = nearv[:, -1]
    # iterative dilation constrained to near-valued pixels
    while True:
        grown = mask.copy()
        grown[1:, :] |= mask[:-1, :]
        grown[:-1, :] |= mask[1:, :]
        grown[:, 1:] |= mask[:, :-1]
        grown[:, :-1] |= mask[:, 1:]
        grown &= nearv
        if (grown == mask).all():
            return mask
        mask = grown


class PansharpenStage:
    """Actor-pool stage: per chip, synthesize the pan band (grayscale at
    2x resolution via cubic) and Brovey-sharpen — output rows keep the
    schema with doubled w/h."""

    def __init__(self, weights=(1 / 3, 1 / 3, 1 / 3)):
        self.weights = weights

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_pylist() for c in ("bytes", "w", "h", "fmt")
        }
        out_b, out_w, out_h = [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            gray = (
                0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
            )
            pan = kernels.resize(
                gray[:, :, None].astype(np.uint8), img.shape[1] * 2, img.shape[0] * 2, "cubic"
            )[:, :, 0]
            sharp = brovey_pansharpen(img, pan, self.weights)
            out_b.append(codecs.encode(sharp, cols["fmt"][i]))
            out_h.append(sharp.shape[0])
            out_w.append(sharp.shape[1])
        out = t
        for name, arr in (
            ("bytes", pa.array(out_b, pa.binary())),
            ("w", pa.array(out_w, pa.int32())),
            ("h", pa.array(out_h, pa.int32())),
        ):
            out = out.set_column(out.schema.get_field_index(name), name, arr)
        return out


def nearblack_stage(images, near: int = 15, concurrency: int = 4):
    """Zero out the border-connected collar; adds n_collar count."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("bytes", "w", "h", "fmt")}
        out_b, n_collar = [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            m = nearblack_mask(img, near=near)
            out = img.copy()
            out[m] = 0
            out_b.append(codecs.encode(out, cols["fmt"][i]))
            n_collar.append(int(m.sum()))
        out = t.set_column(
            t.schema.get_field_index("bytes"), "bytes", pa.array(out_b, pa.binary())
        )
        return out.append_column("n_collar", pa.array(n_collar, pa.int64()))

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)
