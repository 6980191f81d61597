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
    if method in AREA_METHODS:
        return resample_area(img, out_w, out_h, method)
    h, w = img.shape[:2]
    src_x = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    src_y = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    return resample_separable(img, src_x, src_y, method)


# ------------------------------------------------- area-aggregating kernels
#
# GDAL's "area" resamplers (gdalwarp/translate -r average/rms/sum/min/
# max/med/q1/q3/mode): each dst pixel aggregates every source pixel in
# its back-projected footprint box.  Contract restated from
# GWKAverageOrModeThread (alg/gdalwarpkernel.cpp:6508):
#  - box: [floor(min+EPS), ceil(max-EPS)) per axis (EPS=1e-10), grown
#    by one when empty (:6820-6840);
#  - fractional edge pixels carry weight 1-(frac) via the separable
#    COMPUTE_WEIGHT / COMPUTE_WEIGHT_Y product (:6845-6860), single-
#    column/row boxes weight 1;
#  - average = weighted mean, sum = weighted sum, rms = sqrt(weighted
#    mean of squares);
#  - med/q1/q3: UNWEIGHTED sorted box values, index ceil(q*n - 1)
#    (:7605-7607);
#  - mode for Byte data: value-histogram scan 0..255, strict '>' so the
#    LOWEST value wins ties (:7420 family / overview.cpp:2109);
#  - uint8 output rounds floor(v + 0.5), clipped.

AREA_METHODS = ("average", "rms", "sum", "min", "max", "med", "q1", "q3", "mode")

_AREA_EPS = 1e-10


def _area_axis(n_src: int, n_dst: int):
    """Per-dst-index source boxes along one axis for a uniform resize
    (dst pixel j spans src [j*r, (j+1)*r), r = n_src/n_dst).

    Returns (idx (D, K) int64, w (D, K) float64, valid (D, K) bool):
    padded gather indices, GDAL edge weights (0 on padding lanes)."""
    r = n_src / n_dst
    j = np.arange(n_dst, dtype=np.float64)
    xmin = j * r
    xmax = (j + 1.0) * r
    i0 = np.maximum(np.floor(xmin + _AREA_EPS), 0.0).astype(np.int64)
    i1 = np.minimum(np.ceil(xmax - _AREA_EPS), float(n_src)).astype(np.int64)
    grow = (i0 == i1) & (i1 < n_src)
    i1 = i1 + grow
    cnt = i1 - i0
    K = int(cnt.max())
    idx = i0[:, None] + np.arange(K, dtype=np.int64)[None, :]
    valid = idx < i1[:, None]
    w = np.ones((n_dst, K), np.float64)
    multi = cnt > 1
    w[:, 0] = np.where(multi, 1.0 - (xmin - i0), 1.0)
    rows = np.arange(n_dst)
    last = cnt - 1
    w[rows, last] = np.where(multi, 1.0 - (i1 - xmax), w[rows, last])
    w[~valid] = 0.0
    idx = np.clip(idx, 0, n_src - 1)
    return idx, w, valid


def resample_area(img: np.ndarray, out_w: int, out_h: int, method: str) -> np.ndarray:
    """Area-aggregating resize (see module contract above).  img:
    (h, w) or (h, w, c); uint8 in -> uint8 out except 'sum' (float64,
    unclamped — GDAL's sum is a float-typed op)."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w = img.shape[:2]
    xi, xw, xv = _area_axis(w, out_w)
    yi, yw, yv = _area_axis(h, out_h)
    data = img.astype(np.float64)

    if method in ("average", "sum", "rms"):
        d = data * data if method == "rms" else data
        # x pass: weighted sums (h, W, c), then y pass
        sx = np.einsum("hwkc,wk->hwc", d[:, xi, :], xw)
        s = np.einsum("hkwc,hk->hwc", sx[yi, :, :], yw)
        if method == "sum":
            out = s
            return out[:, :, 0] if squeeze else out
        wsum = (yw.sum(axis=1)[:, None] * xw.sum(axis=1)[None, :])[:, :, None]
        out = s / wsum
        if method == "rms":
            out = np.sqrt(out)
    elif method in ("min", "max"):
        fill = np.inf if method == "min" else -np.inf
        gx = np.where(xv[None, :, :, None], data[:, xi, :], fill)
        red = np.min if method == "min" else np.max
        tx = red(gx, axis=2)  # (h, W, c)
        gy = np.where(yv[:, :, None, None], tx[yi, :, :], fill)
        out = red(gy, axis=1)  # (H, W, c)
    else:  # med / q1 / q3 / mode: full 2-D windows, unweighted
        # windows: (H, Ky, W, Kx, c) -> (H, W, Ky*Kx, c)
        win = data[yi[:, :, None, None], xi[None, None, :, :], :]
        win = win.transpose(0, 2, 1, 3, 4)
        H, W = win.shape[0], win.shape[1]
        K2 = win.shape[2] * win.shape[3]
        win = win.reshape(H, W, K2, -1)
        vmask = (yv[:, :, None, None] & xv[None, None, :, :]).transpose(0, 2, 1, 3)
        vmask = vmask.reshape(H, W, K2)
        n = vmask.sum(axis=2)  # valid count per window
        if method == "mode":
            s = np.where(vmask[:, :, :, None], win, np.inf)
            s = np.sort(s, axis=2)
            eq = s[:, :, :, None, :] == s[:, :, None, :, :]
            counts = eq.sum(axis=3)  # (H, W, K2, c)
            counts[~np.isfinite(s)] = 0
            pick = np.argmax(counts, axis=2)  # first max -> lowest value
            out = np.take_along_axis(s, pick[:, :, None, :], axis=2)[:, :, 0, :]
        else:
            q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[method]
            s = np.where(vmask[:, :, :, None], win, np.inf)
            s = np.sort(s, axis=2)
            qi = np.ceil(q * n - 1.0).astype(np.int64)
            qi = np.clip(qi, 0, K2 - 1)
            out = np.take_along_axis(
                s, qi[:, :, None, None].repeat(s.shape[3], axis=3), axis=2
            )[:, :, 0, :]
    if img.dtype == np.uint8:
        out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    out = out[:, :, 0] if squeeze else out
    return out


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
    h2, w2 = h // 2 * 2, w // 2 * 2
    # uint16 is exact here: each 2x2 sum is <= 4*255 = 1020, and the
    # rounding numerator s + cnt//2 <= 1022 — no overflow possible
    a = img[:h2, :w2].astype(np.uint16)
    m = mask[:h2, :w2].astype(np.uint16)
    am = a * (m[:, :, None] if a.ndim == 3 else m)  # masked once, not 4x
    s = am[0::2, 0::2] + am[0::2, 1::2] + am[1::2, 0::2] + am[1::2, 1::2]
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
