"""Resampling kernels — numpy ports of the reference's warp/overview weights.

Weight formulas from alg/gdalwarpkernel.cpp:3383-3560 (GWKLanczosSinc
:3383, GWKBilinear :3429, GWKCubic (Catmull-Rom) :3467, GWKBSpline
:3523) and the overview average/mode reducers (gcore/overview.cpp:79+,
mode tie -> lowest value :2109 family).  Both supported CRS mappings
(EPSG:3857 <-> EPSG:4326) are axis-separable, so the engine resamples
separably: 1-D weights along x then y, applied as vectorized
gather+weighted-sum over a kernel window.

Coordinates are in "source pixel index" space: the center of source
pixel i is at coordinate i (a dst sample at 3.5 sits between pixels
3 and 4).
"""

from __future__ import annotations

import numpy as np

KERNEL_RADIUS = {
    "near": 0,
    "bilinear": 1,
    "cubic": 2,
    "cubicspline": 2,
    "lanczos": 3,
}


def _w_bilinear(x):
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


def _w_cubic(x):
    # Catmull-Rom (GWKCubic, alg/gdalwarpkernel.cpp:3467): a = -0.5
    ax = np.abs(x)
    r = np.zeros_like(ax)
    m1 = ax < 1
    m2 = (ax >= 1) & (ax < 2)
    r[m1] = ((1.5 * ax[m1] - 2.5) * ax[m1]) * ax[m1] + 1.0
    r[m2] = ((-0.5 * ax[m2] + 2.5) * ax[m2] - 4.0) * ax[m2] + 2.0
    return r


def _w_bspline(x):
    # Cubic B-spline (GWKBSpline, alg/gdalwarpkernel.cpp:3523)
    ax = np.abs(x)
    r = np.zeros_like(ax)
    m1 = ax < 1
    m2 = (ax >= 1) & (ax < 2)
    r[m1] = (4.0 - 6.0 * ax[m1] ** 2 + 3.0 * ax[m1] ** 3) / 6.0
    r[m2] = ((2.0 - ax[m2]) ** 3) / 6.0
    return r


def _w_lanczos(x):
    # 3-lobe Lanczos windowed sinc (GWKLanczosSinc, alg/gdalwarpkernel.cpp:3383)
    ax = np.abs(x)
    r = np.zeros_like(ax)
    m = ax < 3
    xm = np.where(m & (ax > 0), ax, 1.0)
    px = np.pi * xm
    r_m = (np.sin(px) / px) * (np.sin(px / 3.0) / (px / 3.0))
    r[m] = np.where(ax[m] > 0, r_m[m], 1.0)
    return r


_WEIGHT_FN = {
    "bilinear": _w_bilinear,
    "cubic": _w_cubic,
    "cubicspline": _w_bspline,
    "lanczos": _w_lanczos,
}


def _axis_weights(src_coords: np.ndarray, n_src: int, method: str):
    """For each dst sample (fractional src coord), neighbor indices and
    normalized weights.  Returns (idx (D, K) int64 clipped, w (D, K))."""
    r = KERNEL_RADIUS[method]
    if r == 0:  # nearest: pixel whose center is closest; .5 rounds down (GDAL near picks floor(x+0.5))
        idx = np.floor(src_coords + 0.5).astype(np.int64)
        idx = np.clip(idx, 0, n_src - 1)[:, None]
        return idx, np.ones((len(src_coords), 1))
    base = np.floor(src_coords).astype(np.int64)
    offs = np.arange(-r + 1, r + 1, dtype=np.int64)  # 2r taps
    idx = base[:, None] + offs[None, :]
    dx = src_coords[:, None] - idx
    w = _WEIGHT_FN[method](dx)
    s = w.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    w = w / s
    idx = np.clip(idx, 0, n_src - 1)  # edge clamp
    return idx, w


def resample_separable(
    img: np.ndarray, src_x: np.ndarray, src_y: np.ndarray, method: str = "near"
) -> np.ndarray:
    """Sample (h, w, c) uint8 at fractional source coords, separably.

    src_x: (W,) source x coord of each dst column center;
    src_y: (H,) source y coord of each dst row center.
    Returns (H, W, c) uint8 (rounded, clipped).
    """
    h, w = img.shape[:2]
    xi, xw = _axis_weights(np.asarray(src_x, np.float64), w, method)
    yi, yw = _axis_weights(np.asarray(src_y, np.float64), h, method)
    data = img.astype(np.float64)
    # x pass: (h, W, c)
    gx = data[:, xi, :]  # (h, W, K, c)
    tmp = np.einsum("hwkc,wk->hwc", gx, xw)
    # y pass: (H, W, c)
    gy = tmp[yi, :, :]  # (H, K, W, c)
    out = np.einsum("hkwc,hk->hwc", gy, yw)
    if img.dtype == np.uint8:
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out


def resize(img: np.ndarray, out_w: int, out_h: int, method: str = "near") -> np.ndarray:
    """Resize with dst pixel centers mapped uniformly into src index space."""
    h, w = img.shape[:2]
    src_x = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    src_y = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    return resample_separable(img, src_x, src_y, method)


def downsample2x_average(img: np.ndarray) -> np.ndarray:
    """Exact 2x box average (the overview 4->1 reduction,
    gcore/overview.cpp average family; integer output rounds half up)."""
    h, w = img.shape[:2]
    a = img[: h // 2 * 2, : w // 2 * 2].astype(np.uint32)
    s = a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
    return ((s + 2) // 4).astype(np.uint8)


def downsample2x_masked_average(img: np.ndarray, mask: np.ndarray):
    """2x average honoring a validity mask (nodata-aware parent build):
    parent pixel = rounded mean of valid children; parent mask = any
    child valid.  mask: (h, w) bool."""
    h, w = img.shape[:2]
    a = img[: h // 2 * 2, : w // 2 * 2].astype(np.uint32)
    m = mask[: h // 2 * 2, : w // 2 * 2].astype(np.uint32)
    mw = m[:, :, None] if a.ndim == 3 else m
    s = (
        (a * mw)[0::2, 0::2]
        + (a * mw)[0::2, 1::2]
        + (a * mw)[1::2, 0::2]
        + (a * mw)[1::2, 1::2]
    )
    cnt = m[0::2, 0::2] + m[0::2, 1::2] + m[1::2, 0::2] + m[1::2, 1::2]
    safe = np.maximum(cnt, 1)
    safe_b = safe[:, :, None] if a.ndim == 3 else safe
    out = ((s + safe_b // 2) // safe_b).astype(np.uint8)
    valid = cnt > 0
    out *= valid[:, :, None] if a.ndim == 3 else valid
    return out, valid


def mode_reduce(values: np.ndarray, axis: int = -1) -> np.ndarray:
    """Mode along an axis for uint8 data; ties -> lowest value
    (GDALResampleChunk_Mode tie rule, gcore/overview.cpp:2109)."""
    v = np.moveaxis(values, axis, -1)
    flat = v.reshape(-1, v.shape[-1])
    out = np.empty(flat.shape[0], dtype=values.dtype)
    for i, row in enumerate(flat):
        vals, cnts = np.unique(row, return_counts=True)
        out[i] = vals[np.argmax(cnts)]  # np.unique sorts -> first max = lowest
    return out.reshape(v.shape[:-1])


def resample_grid(
    img: np.ndarray,
    src_x: np.ndarray,
    src_y: np.ndarray,
    method: str = "near",
    nodata: int = 0,
) -> np.ndarray:
    """Sample (h, w, c) uint8 at a full 2-D grid of fractional source
    coords (non-separable mappings: GCP/affine warps with rotation or
    shear).  src_x/src_y: (H, W) source coords of each dst pixel
    center.  Out-of-source pixels get ``nodata``; in-range gathers
    replicate edges.  Formula spec (mirrored by rasterref):
    bilinear out = (1-fy)*((1-fx)*p00 + fx*p01) + fy*((1-fx)*p10 +
    fx*p11), rounded floor(v + 0.5)."""
    h, w = img.shape[:2]
    sx = np.asarray(src_x, np.float64)
    sy = np.asarray(src_y, np.float64)
    valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    data = img.astype(np.float64)
    if method == "near":
        ix = np.clip(np.floor(sx + 0.5).astype(np.int64), 0, w - 1)
        iy = np.clip(np.floor(sy + 0.5).astype(np.int64), 0, h - 1)
        out = data[iy, ix, :]
    elif method == "bilinear":
        fx0 = np.floor(sx)
        fy0 = np.floor(sy)
        fx = sx - fx0
        fy = sy - fy0
        x0 = np.clip(fx0.astype(np.int64), 0, w - 1)
        x1 = np.clip(fx0.astype(np.int64) + 1, 0, w - 1)
        y0 = np.clip(fy0.astype(np.int64), 0, h - 1)
        y1 = np.clip(fy0.astype(np.int64) + 1, 0, h - 1)
        p00 = data[y0, x0, :]
        p01 = data[y0, x1, :]
        p10 = data[y1, x0, :]
        p11 = data[y1, x1, :]
        fxc = fx[..., None]
        fyc = fy[..., None]
        out = (1.0 - fyc) * ((1.0 - fxc) * p00 + fxc * p01) + fyc * (
            (1.0 - fxc) * p10 + fxc * p11
        )
    else:
        raise ValueError(f"resample_grid: unsupported method {method}")
    res = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    res[~valid] = nodata
    return res
