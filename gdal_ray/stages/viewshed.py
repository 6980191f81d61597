"""Viewshed — per-chip DEM visibility from an observer (radial method).

Reference analog: alg/viewshed/ (Wang et al. sweep; executor +
combiner pools, cumulative.cpp:72-88).  This implementation uses the
radial-sampling method: rays from the observer to every boundary
pixel, a point is visible when its elevation angle reaches the running
maximum along its ray (vectorized (rays x steps) numpy).  Band 0 of
each chip is the DEM; observer at the chip center at ``obs_height``
above ground.  Rays are an approximation of the exact sweep (standard
for radial viewsheds); visibility on flat terrain and behind walls is
exact and golden-tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def viewshed_mask(elev: np.ndarray, obs_height: float = 2.0) -> np.ndarray:
    """(h, w) elevation -> bool visibility mask from the center pixel."""
    h, w = elev.shape
    oy, ox = (h - 1) / 2.0, (w - 1) / 2.0
    oz = float(elev[int(round(oy)), int(round(ox))]) + obs_height
    # boundary targets (one ray each)
    tx = np.concatenate(
        [np.arange(w), np.full(h, w - 1), np.arange(w)[::-1], np.zeros(h)]
    )
    ty = np.concatenate(
        [np.zeros(w), np.arange(h), np.full(w, h - 1), np.arange(h)[::-1]]
    )
    steps = max(h, w) * 2
    t = np.linspace(0.0, 1.0, steps)[None, :]
    rx = ox + (tx[:, None] - ox) * t  # (R, T)
    ry = oy + (ty[:, None] - oy) * t
    ix = np.clip(np.round(rx).astype(np.int64), 0, w - 1)
    iy = np.clip(np.round(ry).astype(np.int64), 0, h - 1)
    dist = np.hypot(rx - ox, ry - oy)
    dist[:, 0] = 1e-9
    z = elev[iy, ix].astype(np.float64)
    slope = (z - oz) / dist
    runmax = np.maximum.accumulate(slope, axis=1)
    vis = slope >= runmax - 1e-12
    mask = np.zeros((h, w), dtype=bool)
    mask[iy[vis], ix[vis]] = True
    mask[int(round(oy)), int(round(ox))] = True
    return mask


def viewshed_stage(images, obs_height: float = 2.0, concurrency: int = 4):
    """map_batches stage: per-chip viewshed from the center; output
    rows (image_id, n_visible, frac_visible, mask_bytes packbits)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        n_vis, frac, masks = [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            m = viewshed_mask(img[:, :, 0].astype(np.float64), obs_height)
            n_vis.append(int(m.sum()))
            frac.append(float(m.mean()))
            masks.append(np.packbits(m).tobytes())
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "n_visible": pa.array(n_vis, pa.int64()),
                "frac_visible": pa.array(np.round(frac, 6), pa.float64()),
                "mask_bytes": pa.array(masks, pa.binary()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)
