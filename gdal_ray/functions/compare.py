"""Image comparison utilities — the gdalcompare analog.

Reference: swig/python/gdal-utils/osgeo_utils/gdalcompare.py
(compare_image_pixels :79 — count of differing pixels + max
difference; compare_db :281 — whole-dataset compare returning a
difference count).  Used by the golden-diff tests and available as a
library utility for pipeline validation.
"""

from __future__ import annotations

import numpy as np

from . import codecs


def compare_image_pixels(a: np.ndarray, b: np.ndarray) -> dict:
    """Pixel comparison of two equal-shape images:
    {n_diff, max_diff, mean_abs_diff, psnr_db} (psnr inf when equal)."""
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    diff = a.astype(np.int64) - b.astype(np.int64)
    n_diff = int((diff != 0).sum())
    return {
        "n_diff": n_diff,
        "max_diff": int(np.abs(diff).max()) if diff.size else 0,
        "mean_abs_diff": float(np.abs(diff).mean()) if diff.size else 0.0,
        "psnr_db": codecs.psnr(a, b),
    }


def compare_chips(row_a: dict, row_b: dict, psnr_threshold: float = 40.0) -> dict:
    """Whole-row compare of two chip rows (the per-row invariant of
    BASELINE.json input_hint): decoded pixels exact for lossless fmts,
    PSNR >= threshold for lossy; caption byte-identical.  Returns
    {ok, reasons, pixels: {...}}."""
    reasons = []
    img_a = codecs.decode(row_a["bytes"], row_a["w"], row_a["h"], row_a["fmt"])
    img_b = codecs.decode(row_b["bytes"], row_b["w"], row_b["h"], row_b["fmt"])
    if img_a.shape != img_b.shape:
        return {"ok": False, "reasons": ["shape mismatch"], "pixels": None}
    px = compare_image_pixels(img_a, img_b)
    lossless = codecs.is_lossless(row_a["fmt"]) and codecs.is_lossless(row_b["fmt"])
    if lossless and px["n_diff"] != 0:
        reasons.append(f"lossless pixels differ ({px['n_diff']})")
    if not lossless and px["psnr_db"] < psnr_threshold:
        reasons.append(f"psnr {px['psnr_db']:.1f} < {psnr_threshold}")
    if row_a.get("caption") != row_b.get("caption"):
        reasons.append("caption differs")
    return {"ok": not reasons, "reasons": reasons, "pixels": px}
