"""Reference implementations for the per-chip raster queries.

Single-process numpy implementations, separately coded from the engine
stages.  Chip pixels are reconstructed from the FIXTURE SPEC
(synth.make_table.chip_pixels — the definition of the input, not
engine code) plus a restated model of the lossy qraw codec, so the
oracles also implicitly validate the engine's decode path.  The GDAL
checksum (alg/gdalchecksum.cpp:48-260) and the resampling weight
formulas (alg/gdalwarpkernel.cpp:3383-3560) are public specs restated
here; bitwise parity with the engine pins the formula, which is the
point of the check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

_PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)


def _cs_band(a: np.ndarray) -> int:
    flat = np.ascontiguousarray(a).reshape(-1).astype(np.int64)
    return int((flat % _PRIMES[np.arange(flat.size) % 11]).sum() & 0xFFFF)


def _fixture_images(sf_dir: str, columns=None):
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    cols = columns or ["image_id", "w", "h", "fmt"]
    t = pq.read_table(paths["images"], columns=cols)
    df = t.to_pandas().sort_values("image_id").reset_index(drop=True)
    return df


def ref_decoded(i: int, w: int, h: int, fmt: str) -> np.ndarray:
    """Expected decoded pixels of fixture chip i: generator spec + the
    qraw lossy model ((v >> 3) * 8 + 4, capped 255)."""
    from ..synth.make_table import chip_pixels  # fixture spec, not engine

    px = chip_pixels(i, w, h)
    if fmt == "qraw":
        px = np.minimum((px >> 3).astype(np.uint16) * 8 + 4, 255).astype(np.uint8)
    return px


def _iter_chips(df: pd.DataFrame):
    for row in df.itertuples(index=False):
        i = int(row.image_id[3:])
        yield row, ref_decoded(i, int(row.w), int(row.h), row.fmt)


# -------------------------------------------------------- q29 band stats


def q29_band_stats(sf_dir: str) -> pd.DataFrame:
    df = _fixture_images(sf_dir)
    s = np.zeros(3, dtype=np.int64)
    ss = np.zeros(3, dtype=np.int64)
    n = np.zeros(3, dtype=np.int64)
    mn = np.full(3, 255, dtype=np.int64)
    mx = np.zeros(3, dtype=np.int64)
    for _, px in _iter_chips(df):
        flat = px.reshape(-1, 3).astype(np.int64)
        s += flat.sum(axis=0)
        ss += (flat * flat).sum(axis=0)
        n += flat.shape[0]
        mn = np.minimum(mn, flat.min(axis=0))
        mx = np.maximum(mx, flat.max(axis=0))
    sf = s.astype(np.float64)
    ssf = ss.astype(np.float64)
    nf = n.astype(np.float64)
    mean = sf / nf
    var = ssf / nf - mean * mean
    return pd.DataFrame(
        {
            "band": np.arange(3, dtype=np.int64),
            "n": n,
            "min": mn,
            "max": mx,
            "mean": mean,
            "stddev": np.sqrt(np.maximum(var, 0.0)),
        }
    )


# --------------------------------------------------------- q30 histogram


def q30_band_histogram(sf_dir: str, n_buckets: int = 256) -> pd.DataFrame:
    df = _fixture_images(sf_dir)
    counts = np.zeros((3, n_buckets), dtype=np.int64)
    for _, px in _iter_chips(df):
        for b in range(3):
            counts[b] += np.bincount(px[:, :, b].reshape(-1), minlength=n_buckets)[
                :n_buckets
            ]
    bands = np.repeat(np.arange(3, dtype=np.int64), n_buckets)
    buckets = np.tile(np.arange(n_buckets, dtype=np.int64), 3)
    flat = counts.reshape(-1)
    nz = flat > 0
    return pd.DataFrame({"band": bands[nz], "bucket": buckets[nz], "count": flat[nz]})


# ------------------------------------------------ separable resampling


def _w_bilinear_ref(x):
    return np.maximum(0.0, 1.0 - np.abs(x))


def _w_cubic_ref(x):
    # Catmull-Rom (GWKCubic, alg/gdalwarpkernel.cpp:3467 formula)
    ax = np.abs(x)
    r = np.zeros_like(ax)
    m1 = ax < 1
    m2 = (ax >= 1) & (ax < 2)
    r[m1] = ((1.5 * ax[m1] - 2.5) * ax[m1]) * ax[m1] + 1.0
    r[m2] = ((-0.5 * ax[m2] + 2.5) * ax[m2] - 4.0) * ax[m2] + 2.0
    return r


_REF_KERNELS = {"bilinear": (_w_bilinear_ref, 1), "cubic": (_w_cubic_ref, 2)}


def _axis_ref(coords: np.ndarray, n: int, method: str):
    wfn, r = _REF_KERNELS[method]
    base = np.floor(coords).astype(np.int64)
    offs = np.arange(-r + 1, r + 1, dtype=np.int64)
    idx = base[:, None] + offs[None, :]
    d = coords[:, None] - idx
    w = wfn(d)
    s = w.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    w = w / s
    return np.clip(idx, 0, n - 1), w


def _sample_ref(img: np.ndarray, src_x, src_y, method: str = "bilinear"):
    h, w = img.shape[:2]
    xi, xw = _axis_ref(np.asarray(src_x, np.float64), w, method)
    yi, yw = _axis_ref(np.asarray(src_y, np.float64), h, method)
    data = img.astype(np.float64)
    gx = data[:, xi, :]
    tmp = np.einsum("hwkc,wk->hwc", gx, xw)
    gy = tmp[yi, :, :]
    out = np.einsum("hkwc,hk->hwc", gy, yw)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _sample_bilinear(img: np.ndarray, src_x, src_y):
    return _sample_ref(img, src_x, src_y, "bilinear")


def _resize_ref(img: np.ndarray, out_w: int, out_h: int, method: str = "bilinear"):
    h, w = img.shape[:2]
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    return _sample_ref(img, sx, sy, method)


def _resize_bilinear(img: np.ndarray, out_w: int, out_h: int):
    return _resize_ref(img, out_w, out_h, "bilinear")


# --------------------------------------------------------- q31 translate


def _qraw_model(px: np.ndarray) -> np.ndarray:
    return np.minimum((px >> 3).astype(np.uint16) * 8 + 4, 255).astype(np.uint8)


def _translate_cs(row, px: np.ndarray) -> list[int]:
    """gdal_translate recipe: srcwin (2,2,12,12) -> resize 24x24
    bilinear -> bands [2,1,0] -> scale (0,255)->(30,220), re-encoded in
    the chip's own fmt, then GDAL checksums of the re-decoded output."""
    f = (220.0 - 30.0) / max(255.0 - 0.0, 1e-12)
    img = px[2 : 2 + 12, 2 : 2 + 12]
    img = _resize_bilinear(img, 24, 24)
    img = img[:, :, [2, 1, 0]]
    out = (img.astype(np.float64) - 0.0) * f + 30.0
    img = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    if row.fmt == "qraw":  # re-encode model (encode->decode round trip)
        img = _qraw_model(img)
    return [_cs_band(img[:, :, b]) for b in range(3)]


def _reclassify_cs(px: np.ndarray) -> int:
    """Interval mapping '[0,63]=10;(63,127]=20;[128,191)=30;255=77;
    DEFAULT=40' applied to band 0 — expressed as an np.select over
    explicit integer-range conditions (the parse/nextafter machinery of
    vrtreclassifier.cpp collapses to these ranges on uint8 input)."""
    v = px[:, :, 0].astype(np.float64)
    out = np.select(
        [v <= 63, v <= 127, (v >= 128) & (v <= 190), v == 255],
        [10.0, 20.0, 30.0, 77.0],
        default=40.0,
    )
    return _cs_float(out.astype(np.float32))


def _unscale_cs(px: np.ndarray) -> int:
    """out = v * 0.5 + 10 per band, float32."""
    out = px.astype(np.float32) * np.float32(0.5) + np.float32(10.0)
    return sum(_cs_float(out[:, :, b]) for b in range(out.shape[2]))


def _n2a_cs(px: np.ndarray) -> int:
    """Alpha from NODATA_VALUES (0,0,0): 0 where all bands zero."""
    allnd = (px == 0).all(axis=2)
    return _cs_band(np.where(allnd, 0, 255).astype(np.uint8))


def _color_merge_cs(px: np.ndarray) -> int:
    """HSV merge with the chip's own band 0 as the value channel
    (gdalalg_raster_color_merge.cpp:134-230 float32 contract, mask-
    assignment structure rather than nested np.where)."""
    r = px[:, :, 0].astype(np.int32)
    g = px[:, :, 1].astype(np.int32)
    b = px[:, :, 2].astype(np.int32)
    minc = np.min(px.astype(np.int32), axis=2)
    maxc = np.max(px.astype(np.int32), axis=2)
    d = maxc - minc
    s = d.astype(np.float32) / np.maximum(1, maxc).astype(np.float32)
    d6 = np.where(d == 0, np.float32(1.0), np.float32(6.0) * d.astype(np.float32))
    h = np.empty(r.shape, np.float32)
    m_b = maxc == b
    m_g = (maxc == g) & ~m_b
    m_r = ~m_b & ~m_g
    h[m_b] = (np.float32(4.0) / np.float32(6.0) + (r - g).astype(np.float32) / d6)[m_b]
    h[m_g] = (np.float32(2.0) / np.float32(6.0) + (b - r).astype(np.float32) / d6)[m_g]
    tmp = (g - b).astype(np.float32) / d6
    h[m_r] = np.where(tmp < 0, tmp + np.float32(1.0), tmp)[m_r]

    v = px[:, :, 0]  # gray = band 0
    vf = v.astype(np.float32)
    i = (np.float32(6.0) * h).astype(np.int32)
    f = np.float32(6.0) * h - i.astype(np.float32)
    p = (vf * (np.float32(1.0) - s) + np.float32(0.5)).astype(np.uint8)
    q = (vf * (np.float32(1.0) - s * f) + np.float32(0.5)).astype(np.uint8)
    t = (vf * (np.float32(1.0) - s * (np.float32(1.0) - f)) + np.float32(0.5)).astype(np.uint8)
    vv = v.astype(np.uint8)
    # choose_among tables (index >5 falls to the last entry)
    ic = np.minimum(np.maximum(i, 0), 5)
    sel_r = [vv, q, p, p, t, vv]
    sel_g = [t, vv, vv, q, p, p]
    sel_b = [p, p, t, vv, vv, q]
    out = np.empty(px.shape, np.uint8)
    for k in range(6):
        m = ic == k
        out[:, :, 0][m] = sel_r[k][m]
        out[:, :, 1][m] = sel_g[k][m]
        out[:, :, 2][m] = sel_b[k][m]
    return sum(_cs_band(out[:, :, bb]) for bb in range(3))


def _area_cs(px: np.ndarray) -> dict:
    """Golden for the 9 area-aggregating resamplers at the exact-2x
    downscale the q31 suite pins (alg/gdalwarpkernel.cpp:6508
    GWKAverageOrModeThread semantics; quantile index ceil(q*n-1)
    :7605; Byte mode = 0..255 histogram scan, strict '>', lowest value
    wins ties).  Structurally independent of the engine: reshape
    windows (engine: padded-gather einsum/sort); mode via per-value
    scatter-add histogram (engine: sorted pairwise-equality counts).
    All aggregates are integer-exact at integral boxes, so bit parity
    does not depend on float accumulation order."""
    h2, w2 = px.shape[0] // 2, px.shape[1] // 2
    a = px[: h2 * 2, : w2 * 2].astype(np.float64)
    win = a.reshape(h2, 2, w2, 2, 3).transpose(0, 2, 1, 3, 4).reshape(h2, w2, 4, 3)
    res = {}
    s = win.sum(axis=2)
    res["average"] = np.floor(s / 4.0 + 0.5)
    res["rms"] = np.floor(np.sqrt((win * win).sum(axis=2) / 4.0) + 0.5)
    res["sum"] = None  # handled as float below
    res["min"] = win.min(axis=2)
    res["max"] = win.max(axis=2)
    srt = np.sort(win, axis=2)
    res["q1"] = srt[:, :, 0]   # ceil(.25*4 - 1) = 0
    res["med"] = srt[:, :, 1]  # ceil(.5*4 - 1) = 1
    res["q3"] = srt[:, :, 2]   # ceil(.75*4 - 1) = 2
    cnts = np.zeros((h2, w2, 3, 256), np.int32)
    I, J, C = np.indices((h2, w2, 3))
    for k in range(4):
        np.add.at(cnts, (I, J, C, win[:, :, k, :].astype(np.int64)), 1)
    res["mode"] = np.argmax(cnts, axis=3).astype(np.float64)
    out = {}
    for m, v in res.items():
        if m == "sum":
            out[m] = sum(
                _cs_float(s[:, :, b].astype(np.float32)) for b in range(3)
            )
        else:
            u = np.clip(v, 0, 255).astype(np.uint8)
            out[m] = sum(_cs_band(u[:, :, b]) for b in range(3))
    return out


def _mdim_rows_ref():
    """Golden for the q31 multidim suite: the WHOLE 48x64x64 array is
    materialized in one numpy buffer and every op applied globally
    (the engine streams 64 chunk rows through map_batches/groupby
    instead); per-chunk checksums by direct slicing."""
    A0 = np.arange(48, dtype=np.int64)[:, None, None]
    A1 = np.arange(64, dtype=np.int64)[None, :, None]
    A2 = np.arange(64, dtype=np.int64)[None, None, :]
    A = (A0 * 97 + A1 * 89 + A2 * 83) % 1000 + (A0 * A1) % 57

    def chunks_cs(arr, chunks, tag, is_float=False):
        grid = [-(-s // c) for s, c in zip(arr.shape, chunks)]
        rows = []
        for idx in np.ndindex(*grid):
            sel = tuple(
                slice(i * c, min((i + 1) * c, s))
                for i, c, s in zip(idx, chunks, arr.shape)
            )
            sub = np.ascontiguousarray(arr[sel]).reshape(1, -1)
            cs = (_cs_float(sub) if is_float
                  else int((sub.reshape(-1) % _PRIMES[
                      np.arange(sub.size) % 11]).sum() & 0xFFFF))
            rows.append((
                "chunk_" + "_".join(str(v) for v in idx), tag, int(cs)
            ))
        return rows

    out = []
    out += chunks_cs(A, (16, 16, 16), "mdim_base")
    out += chunks_cs(np.ascontiguousarray(A.transpose(2, 0, 1)),
                     (16, 16, 16), "mdim_transpose")
    out += chunks_cs(A[8:40, 16:48, 4:60], (16, 16, 16), "mdim_slice")
    out += chunks_cs(A * 3 + 1, (16, 16, 16), "mdim_calc")
    out += chunks_cs(A.sum(axis=0), (16, 16), "mdim_sum0")
    out += chunks_cs(A.sum(axis=2) / 64.0, (16, 16), "mdim_mean2",
                     is_float=True)
    # 2x area resample on axes (1, 2): strided-pair sums, round half up
    v = (A[:, 0::2, 0::2] + A[:, 0::2, 1::2]
         + A[:, 1::2, 0::2] + A[:, 1::2, 1::2])
    out += chunks_cs((v + 2) // 4, (16, 8, 8), "mdim_resample")
    return out


def q31_raster_steps(sf_dir: str) -> pd.DataFrame:
    """Raster pipeline step suite: translate / reclassify / unscale /
    nodata-to-alpha / HSV color-merge / self band-stack / 9 area
    resamplers / multidim chunk suite, one op-tagged checksum row per
    chip (or chunk)."""
    df = _fixture_images(sf_dir)
    ids, ops, css = [], [], []

    def add(iid, op, cs):
        ids.append(iid)
        ops.append(op)
        css.append(int(cs))

    for row, px in _iter_chips(df):
        tcs = _translate_cs(row, px)
        add(row.image_id, "translate_r", tcs[0])
        add(row.image_id, "translate_g", tcs[1])
        add(row.image_id, "translate_b", tcs[2])
        add(row.image_id, "reclassify", _reclassify_cs(px))
        add(row.image_id, "unscale", _unscale_cs(px))
        add(row.image_id, "nodata_to_alpha", _n2a_cs(px))
        add(row.image_id, "color_merge", _color_merge_cs(px))
        # self-stack: 6 identical-pair bands => twice the per-band sum
        add(row.image_id, "stack",
            2 * sum(_cs_band(px[:, :, b]) for b in range(3)))
        # gdal raster calc golden: the fixed q31 expression
        # clip((A + 2*B + C)/4 + sqrt(A) - B % 7, 0, 255) restated as
        # direct numpy in the same evaluation-tree order (the engine
        # runs its compiled-expression interpreter instead)
        A = px[:, :, 0].astype(np.float64)
        B = px[:, :, 1].astype(np.float64)
        C = px[:, :, 2].astype(np.float64)
        calc = np.minimum(np.maximum(
            (A + 2.0 * B + C) / 4.0 + np.sqrt(A) - np.fmod(B, 7.0),
            0.0), 255.0)
        add(row.image_id, "calc", _cs_float(calc))
        # create + update: canvas (h+8, w+8) of 7s, chip at (4, 4)
        H, W = px.shape[0], px.shape[1]
        canvas = np.full((H + 8, W + 8, px.shape[2]), 7, np.uint8)
        canvas[4 : 4 + H, 4 : 4 + W] = px
        add(row.image_id, "create_update",
            sum(_cs_band(canvas[:, :, b]) for b in range(canvas.shape[2])))
        # pixel-info: packed RGB at 5 deterministic positions
        pix = 0
        for k in range(1, 6):
            yy, xx = (H * k) // 7 % H, (W * k) // 5 % W
            pix += (int(px[yy, xx, 0]) * 65536 + int(px[yy, xx, 1]) * 256
                    + int(px[yy, xx, 2]))
        add(row.image_id, "pixel_info", pix)
        for m, cs in _area_cs(px).items():
            add(row.image_id, f"area_{m}", cs)
    for iid, op, cs in _mdim_rows_ref():
        add(iid, op, cs)
    return pd.DataFrame(
        {"image_id": ids, "op": ops, "cs": np.asarray(css, np.int64)}
    )


# --------------------------------------------------------- q32 hillshade


def q32_hillshade(sf_dir: str) -> pd.DataFrame:
    """gdaldem derivative suite goldens (apps/gdaldem_lib.cpp formulas
    restated on generator-spec pixels): Horn + Zevenbergen-Thorne
    hillshades, multidirectional (USGS OF 92-422 weights), combined,
    Igor, slope degrees/percent, aspect azimuth/trig, TRI/TPI/
    roughness; float outputs checksum through the float32 cast +
    GDALCopyWords rounding path."""
    df = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    ids, ops, css = [], [], []

    def add(iid, op, cs):
        ids.append(iid)
        ops.append(op)
        css.append(int(cs))

    def shade_byte(val):
        return np.clip(np.floor(val + 0.5), 1, 255).astype(np.uint8)

    def norm_ang(ang, n):
        ang = np.fmod(ang, n)
        return np.where(ang < 0.0, n + ang, ang)

    az315 = np.radians(360.0 - 315.0 + 90.0)
    alt = np.radians(45.0)
    azr = np.radians(315.0)
    for row, px in _iter_chips(df):
        e = px[:, :, 0].astype(np.float64)
        xres = (row.maxx - row.minx) / int(row.w)
        yres = (row.maxy - row.miny) / int(row.h)
        p = np.pad(e, 1, mode="edge")
        a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
        d = p[1:-1, :-2]; f2 = p[1:-1, 2:]
        g = p[2:, :-2]; h2 = p[2:, 1:-1]; i2 = p[2:, 2:]
        dzdx = ((c + 2 * f2 + i2) - (a + 2 * d + g)) / (8 * xres)
        dzdy = ((g + 2 * h2 + i2) - (a + 2 * b + c)) / (8 * yres)
        slope = np.arctan(np.hypot(dzdx, dzdy))
        aspect = np.arctan2(dzdy, -dzdx)
        shade = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(
            az315 - aspect
        )
        out = np.clip(np.floor(254.0 * np.maximum(shade, 0.0) + 1.5), 1, 255).astype(
            np.uint8
        )
        add(row.image_id, "hillshade", _cs_band(out))

        # folded reference gradients (z_factor = 1/8 Horn, 1/2 ZT)
        xg_h = (1.0 / 8.0) * (((a + 2 * d + g) - (c + 2 * f2 + i2)) / xres)
        yg_h = (1.0 / 8.0) * (((g + 2 * h2 + i2) - (a + 2 * b + c)) / -yres)
        xg_z = (1.0 / 2.0) * ((d - f2) / xres)
        yg_z = (1.0 / 2.0) * ((h2 - b) / -yres)

        # hillshade_zt: standard formula, ZT gradient
        num = np.sin(alt) - (yg_z * np.cos(azr) - xg_z * np.sin(azr)) * np.cos(alt)
        cang254 = 254.0 * num / np.sqrt(1.0 + (xg_z * xg_z + yg_z * yg_z))
        add(row.image_id, "hillshade_zt",
            _cs_band(shade_byte(np.where(cang254 <= 0.0, 1.0, 1.0 + cang254))))

        # hillshade_md: sin^2-weighted shades from 225/270/315/360
        s127 = 127.0 * np.sin(alt)
        c127 = 127.0 * np.cos(alt)
        c225_127 = np.cos(np.radians(225.0)) * c127
        xy = xg_h * xg_h + yg_h * yg_h
        val225 = np.maximum(s127 + (xg_h - yg_h) * c225_127, 0.0)
        val270 = np.maximum(s127 - xg_h * c127, 0.0)
        val315 = np.maximum(s127 + (xg_h + yg_h) * c225_127, 0.0)
        val360 = np.maximum(s127 - yg_h * c127, 0.0)
        w225 = 0.5 * xy - xg_h * yg_h
        w270 = xg_h * xg_h
        w315 = xy - w225
        w360 = yg_h * yg_h
        with np.errstate(invalid="ignore", divide="ignore"):
            cang127 = ((w225 * val225 + w270 * val270 + w315 * val315
                        + w360 * val360) / xy) / np.sqrt(1.0 + xy)
        add(row.image_id, "hillshade_md",
            _cs_band(shade_byte(
                np.where(xy == 0.0, 1.0 + 254.0 * np.sin(alt), 1.0 + cang127))))

        # hillshade_combined: incidence angle * atan(slope) / (pi/2)^2
        numh = np.sin(alt) - (yg_h * np.cos(azr) - xg_h * np.sin(azr)) * np.cos(alt)
        cang = np.arccos(np.clip(numh / np.sqrt(1.0 + xy), -1.0, 1.0))
        cang = 1.0 - cang * np.arctan(np.sqrt(xy)) * (4.0 / (np.pi * np.pi))
        add(row.image_id, "hillshade_combined",
            _cs_band(shade_byte(np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang))))

        # hillshade_igor: shadowness via unscaled-sum aspect
        slope_deg = np.degrees(np.arctan(np.sqrt(xy)))
        asp_i = np.arctan2((g + 2 * h2 + i2) - (a + 2 * b + c),
                           (a + 2 * d + g) - (c + 2 * f2 + i2))
        two_pi = np.pi * 2.0
        dd = np.abs(norm_ang(asp_i, two_pi)
                    - norm_ang(np.pi * 3.0 / 2.0 - azr, two_pi))
        aspect_diff = np.where(dd > np.pi, two_pi - dd, dd)
        shadow = 1.0 - (slope_deg / 90.0) * (1.0 - aspect_diff / np.pi)
        add(row.image_id, "hillshade_igor",
            _cs_band(np.clip(np.floor(255.0 * shadow + 0.5), 0, 255)
                     .astype(np.uint8)))

        # slope family (float32-cast checksums)
        add(row.image_id, "slope",
            _cs_float(np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
                      .astype(np.float32)))
        add(row.image_id, "slope_zt",
            _cs_float(np.degrees(np.arctan(
                np.sqrt(xg_z * xg_z + yg_z * yg_z))).astype(np.float32)))
        add(row.image_id, "slope_percent",
            _cs_float((100.0 * np.sqrt(xy)).astype(np.float32)))

        # aspect family
        asp = np.degrees(np.arctan2(dzdy, -dzdx))
        az_out = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
        az_out = np.where((dzdx == 0) & (dzdy == 0), -9999.0, az_out % 360.0)
        add(row.image_id, "aspect", _cs_float(az_out.astype(np.float32)))
        tr_out = np.where(asp < 0.0, asp + 360.0, asp)
        tr_out = np.where(tr_out == 360.0, 0.0, tr_out)
        tr_out = np.where((dzdx == 0) & (dzdy == 0), -9999.0, tr_out)
        add(row.image_id, "aspect_trig", _cs_float(tr_out.astype(np.float32)))
        zdx = f2 - d
        zdy = h2 - b
        aspz = np.degrees(np.arctan2(zdy, -zdx))
        azz = np.where(aspz > 90.0, 450.0 - aspz, 90.0 - aspz)
        azz = np.where((zdx == 0) & (zdy == 0), -9999.0, azz % 360.0)
        add(row.image_id, "aspect_zt", _cs_float(azz.astype(np.float32)))

        # TRI (Wilson mean |dz|), TPI, roughness
        ctr = p[1:-1, 1:-1]
        acc = np.zeros_like(ctr)
        acc2 = np.zeros_like(ctr)
        mx = np.full(e.shape, -np.inf)
        mn = np.full(e.shape, np.inf)
        for dy0 in (-1, 0, 1):
            for dx0 in (-1, 0, 1):
                win = p[1 + dy0: p.shape[0] - 1 + dy0,
                        1 + dx0: p.shape[1] - 1 + dx0]
                mx = np.maximum(mx, win)
                mn = np.minimum(mn, win)
                if dx0 == 0 and dy0 == 0:
                    continue
                acc += np.abs(win - ctr)
                acc2 += win
        add(row.image_id, "tri", _cs_float((acc / 8.0).astype(np.float32)))
        add(row.image_id, "tpi",
            _cs_float((ctr - acc2 / 8.0).astype(np.float32)))
        add(row.image_id, "roughness", _cs_float((mx - mn).astype(np.float32)))
    return pd.DataFrame(
        {"image_id": ids, "op": ops, "cs": np.asarray(css, np.int64)}
    )


ORIGIN_SHIFT = 20037508.342789244
INITIAL_RES = 156543.03392804097


def _cs_float(a: np.ndarray) -> int:
    """GDAL checksum, float path (gdalchecksum.cpp GDALCopyWords
    rounding restated)."""
    v = np.asarray(a, np.float64).reshape(-1) + 0.5
    n = np.clip(np.floor(v), -2147483647.0, 2147483647.0).astype(np.int64)
    n[~np.isfinite(v)] = np.iinfo(np.int32).min
    rem = np.fmod(n, _PRIMES[np.arange(n.size) % 11])
    return int(rem.sum() & 0xFFFF)


def _tile_of(m: np.ndarray, zoom: int) -> np.ndarray:
    px = (np.asarray(m, np.float64) + ORIGIN_SHIFT) / (INITIAL_RES / (1 << zoom))
    return np.maximum(np.ceil(px / 256.0) - 1, 0).astype(np.int64)


# ----------------- linear (Delaunay) gridding reference: Lawson flips
#
# Independent of the engine's Bowyer-Watson (functions/delaunay.py):
# incremental insertion into the containing triangle with recursive
# edge flips.  The DECISION CONTRACT is shared by definition, not by
# code: every in-circumcircle / orientation test is an exact float64
# sign (static filter + Fraction fallback — any exact implementation
# agrees), the point set is augmented with the same three published
# frame vertices, and interpolation uses the same canonical
# index-sorted barycentric formula, so the unique augmented-set
# Delaunay triangulation and its piecewise-linear surface reproduce
# bit-for-bit.

_RF_FRAME = ((-4096.0, -4096.0), (4096.0, -4096.0), (0.0, 8192.0))


def _rf_orient(ax, ay, bx, by, cx, cy) -> int:
    t1 = (bx - ax) * (cy - ay)
    t2 = (cx - ax) * (by - ay)
    det = t1 - t2
    if abs(det) > 1e-14 * (abs(t1) + abs(t2)):
        return 1 if det > 0 else -1
    from fractions import Fraction as F

    d = (F(bx) - F(ax)) * (F(cy) - F(ay)) - (F(cx) - F(ax)) * (F(by) - F(ay))
    return (d > 0) - (d < 0)


def _rf_incircle(ax, ay, bx, by, cx, cy, dx, dy) -> int:
    adx, ady = ax - dx, ay - dy
    bdx, bdy = bx - dx, by - dy
    cdx, cdy = cx - dx, cy - dy
    al = adx * adx + ady * ady
    bl = bdx * bdx + bdy * bdy
    cl = cdx * cdx + cdy * cdy
    ab = bdx * cdy - cdx * bdy
    bc = cdx * ady - adx * cdy
    ca = adx * bdy - bdx * ady
    det = al * ab + bl * bc + cl * ca
    mag = (
        al * (abs(bdx * cdy) + abs(cdx * bdy))
        + bl * (abs(cdx * ady) + abs(adx * cdy))
        + cl * (abs(adx * bdy) + abs(bdx * ady))
    )
    if abs(det) > 1e-13 * mag:
        return 1 if det > 0 else -1
    from fractions import Fraction as F

    adx, ady = F(ax) - F(dx), F(ay) - F(dy)
    bdx, bdy = F(bx) - F(dx), F(by) - F(dy)
    cdx, cdy = F(cx) - F(dx), F(cy) - F(dy)
    d = (
        (adx * adx + ady * ady) * (bdx * cdy - cdx * bdy)
        + (bdx * bdx + bdy * bdy) * (cdx * ady - adx * cdy)
        + (cdx * cdx + cdy * cdy) * (adx * bdy - bdx * ady)
    )
    return (d > 0) - (d < 0)


class _RfTriangulation:
    """Lawson incremental Delaunay over normalized points + frame."""

    def __init__(self, X, Y, n):
        self.X, self.Y, self.n = X, Y, n
        self.tris: dict[int, tuple[int, int, int]] = {0: (n, n + 1, n + 2)}
        self.edge: dict[tuple[int, int], set[int]] = {}
        self.next_tid = 1
        for e in ((n, n + 1), (n + 1, n + 2), (n, n + 2)):
            self.edge[e] = {0}

    def _ekey(self, u, v):
        return (u, v) if u < v else (v, u)

    def _add(self, a, b, c) -> int:
        tid = self.next_tid
        self.next_tid += 1
        self.tris[tid] = (a, b, c)
        for u, v in ((a, b), (b, c), (c, a)):
            self.edge.setdefault(self._ekey(u, v), set()).add(tid)
        return tid

    def _rm(self, tid):
        a, b, c = self.tris.pop(tid)
        for u, v in ((a, b), (b, c), (c, a)):
            k = self._ekey(u, v)
            self.edge[k].discard(tid)
            if not self.edge[k]:
                del self.edge[k]

    def _signs(self, tid, p):
        X, Y = self.X, self.Y
        a, b, c = self.tris[tid]
        return (
            _rf_orient(X[a], Y[a], X[b], Y[b], X[p], Y[p]),
            _rf_orient(X[b], Y[b], X[c], Y[c], X[p], Y[p]),
            _rf_orient(X[c], Y[c], X[a], Y[a], X[p], Y[p]),
        )

    def _locate(self, p):
        """Containing triangle (all signs >= 0) by scan; returns
        (tid, signs)."""
        for tid in self.tris:
            s = self._signs(tid, p)
            if s[0] >= 0 and s[1] >= 0 and s[2] >= 0:
                return tid, s
        raise AssertionError("point outside frame")

    def _legalize(self, p, u, v):
        """Edge (u, v) opposite freshly-inserted p: flip if the far
        apex is strictly inside circumcircle of (triangle with p)."""
        k = self._ekey(u, v)
        tids = self.edge.get(k, set())
        t_far = None
        for tid in tids:
            if p not in self.tris[tid]:
                t_far = tid
        if t_far is None:
            return
        tri = self.tris[t_far]
        d = next(w for w in tri if w not in (u, v))
        X, Y = self.X, self.Y
        t_near = next(tid for tid in tids if p in self.tris[tid])
        a, b, c = self.tris[t_near]  # CCW, contains p
        if _rf_incircle(X[a], Y[a], X[b], Y[b], X[c], Y[c], X[d], Y[d]) > 0:
            self._rm(t_near)
            self._rm(t_far)
            # flip: replace edge (u,v) with (p,d); orient CCW
            for w in (u, v):
                if _rf_orient(X[p], Y[p], X[d], Y[d], X[w], Y[w]) > 0:
                    self._add(p, d, w)
                else:
                    self._add(p, w, d)
            self._legalize(p, u, d)
            self._legalize(p, d, v)

    def insert(self, p):
        tid, s = self._locate(p)
        a, b, c = self.tris[tid]
        zero = [i for i, si in enumerate(s) if si == 0]
        if len(zero) >= 2:
            return  # coincides with a vertex (pre-deduped upstream)
        if not zero:
            self._rm(tid)
            self._add(a, b, p)
            self._add(b, c, p)
            self._add(c, a, p)
            self._legalize(p, a, b)
            self._legalize(p, b, c)
            self._legalize(p, c, a)
            return
        # on edge: split the two adjacent triangles 2 -> 4
        u, v = ((a, b), (b, c), (c, a))[zero[0]]
        k = self._ekey(u, v)
        others = [t for t in self.edge.get(k, set()) if t != tid]
        w1 = next(w for w in (a, b, c) if w not in (u, v))
        self._rm(tid)
        pend = [(u, p, w1), (p, v, w1)]
        leg = [(u, w1), (w1, v)]
        if others:
            t2 = others[0]
            d = next(w for w in self.tris[t2] if w not in (u, v))
            self._rm(t2)
            pend += [(p, u, d), (v, p, d)]
            leg += [(u, d), (d, v)]
        X, Y = self.X, self.Y
        for (x1, x2, x3) in pend:
            if _rf_orient(X[x1], Y[x1], X[x2], Y[x2], X[x3], Y[x3]) > 0:
                self._add(x1, x2, x3)
            else:
                self._add(x1, x3, x2)
        for u2, v2 in leg:
            self._legalize(p, u2, v2)


def _rf_grid_linear(px, py, pv, xs, ys, nodata: float = 0.0) -> np.ndarray:
    px = np.asarray(px, np.float64)
    py = np.asarray(py, np.float64)
    pv = np.asarray(pv, np.float64)
    _, first = np.unique(np.stack([px, py], axis=1), axis=0, return_index=True)
    keep = np.sort(first)
    px, py, pv = px[keep], py[keep], pv[keep]
    H, W = len(ys), len(xs)
    if len(px) < 3:
        return np.full((H, W), nodata, np.float64)
    n = len(px)
    minx, maxx = float(px.min()), float(px.max())
    miny, maxy = float(py.min()), float(py.max())
    span = max(maxx - minx, maxy - miny, 1e-300)
    nx = (px - minx) / span
    ny = (py - miny) / span
    X = np.concatenate([nx, [f[0] for f in _RF_FRAME]])
    Y = np.concatenate([ny, [f[1] for f in _RF_FRAME]])
    tri = _RfTriangulation(X, Y, n)
    for p in range(n):
        tri.insert(p)
    finite = sorted(
        tuple(sorted(t)) for t in tri.tris.values() if max(t) < n
    )
    # node assignment: first containing triangle in canonical order
    gx, gy = np.meshgrid(xs, ys)
    qx = (gx.reshape(-1) - minx) / span
    qy = (gy.reshape(-1) - miny) / span
    out = np.full(qx.shape, nodata, np.float64)
    done = np.zeros(qx.shape, bool)
    for (i1, i2, i3) in finite:
        if done.all():
            break
        x1, y1, v1 = X[i1], Y[i1], pv[i1]
        x2, y2, v2 = X[i2], Y[i2], pv[i2]
        x3, y3, v3 = X[i3], Y[i3], pv[i3]
        bminx, bmaxx = min(x1, x2, x3), max(x1, x2, x3)
        bminy, bmaxy = min(y1, y2, y3), max(y1, y2, y3)
        cand = np.flatnonzero(
            ~done
            & (qx >= bminx) & (qx <= bmaxx)
            & (qy >= bminy) & (qy <= bmaxy)
        )
        if len(cand) == 0:
            continue
        o = _rf_orient(x1, y1, x2, y2, x3, y3)
        if o == 0:
            continue
        if o > 0:
            e = ((x1, y1, x2, y2), (x2, y2, x3, y3), (x3, y3, x1, y1))
        else:
            e = ((x1, y1, x3, y3), (x3, y3, x2, y2), (x2, y2, x1, y1))
        inside = np.ones(len(cand), bool)
        for (ex1, ey1, ex2, ey2) in e:
            t1 = (ex2 - ex1) * (qy[cand] - ey1)
            t2 = (qx[cand] - ex1) * (ey2 - ey1)
            det = t1 - t2
            sgn = np.sign(det)
            unsure = np.abs(det) <= 1e-14 * (np.abs(t1) + np.abs(t2))
            for j in np.flatnonzero(unsure):
                sgn[j] = _rf_orient(
                    ex1, ey1, ex2, ey2, qx[cand[j]], qy[cand[j]]
                )
            inside &= sgn >= 0
        hit = cand[inside]
        if len(hit) == 0:
            continue
        # canonical barycentric formula (index-sorted vertices)
        det = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
        l2 = ((qx[hit] - x1) * (y3 - y1) - (x3 - x1) * (qy[hit] - y1)) / det
        l3 = ((x2 - x1) * (qy[hit] - y1) - (qx[hit] - x1) * (y2 - y1)) / det
        out[hit] = v1 + l2 * (v2 - v1) + l3 * (v3 - v1)
        done[hit] = True
    return out.reshape(H, W)


# ------------------------------------------------------- q35 grid invdist


def q35_grid_invdist(sf_dir: str, zoom: int = 8, grid_size: int = 64) -> pd.DataFrame:
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    t = pq.read_table(paths["points"], columns=["pid", "x", "y"])
    pid = t.column("pid").to_numpy(zero_copy_only=False)
    px = t.column("x").to_numpy(zero_copy_only=False)
    py = t.column("y").to_numpy(zero_copy_only=False)
    pv = ((pid * 37) % 251).astype(np.float64)
    tx, ty = _tile_of(px, zoom), _tile_of(py, zoom)
    res = INITIAL_RES / (1 << zoom)
    owned = sorted({(int(a), int(b)) for a, b in zip(tx, ty)})
    rows = []
    for cx, cy in owned:
        member = (np.abs(tx - cx) <= 1) & (np.abs(ty - cy) <= 1)
        mx, my, mv = px[member], py[member], pv[member]
        order = np.lexsort((mv, my, mx))
        mx, my, mv = mx[order], my[order], mv[order]
        minx = cx * 256 * res - ORIGIN_SHIFT
        maxy = (cy + 1) * 256 * res - ORIGIN_SHIFT
        cres = (256 * res) / grid_size
        xs = minx + (np.arange(grid_size) + 0.5) * cres
        ys = maxy - (np.arange(grid_size) + 0.5) * cres
        gx, gy = np.meshgrid(xs, ys)
        d2 = (gx[:, :, None] - mx[None, None, :]) ** 2 + (
            gy[:, :, None] - my[None, None, :]
        ) ** 2
        exact = d2 <= 1e-20
        wts = 1.0 / np.maximum(d2, 1e-20) ** 1.0
        wsum = wts.sum(axis=2)
        vsum = (wts * mv[None, None, :]).sum(axis=2)
        out = np.zeros((grid_size, grid_size))
        got = wsum > 0
        out[got] = vsum[got] / wsum[got]
        hit = exact.any(axis=2)
        if hit.any():
            first = exact.argmax(axis=2)
            out[hit] = mv[first[hit]]
        n_owned = int(((tx == cx) & (ty == cy)).sum())
        rows.append(("invdist", zoom, cx, cy, n_owned, _cs_float(out)))
        lin = _rf_grid_linear(mx, my, mv, xs, ys, nodata=0.0)
        rows.append(("linear", zoom, cx, cy, n_owned, _cs_float(lin)))
        # invdistnn golden: row-at-a-time (W, N) slices (the engine is
        # one (H, W, N) cube).  The weight vectors stay full-length
        # with zeros in the masked slots and are reduced along the
        # point axis, so numpy's pairwise reduction tree matches the
        # engine's axis-2 sum bit-for-bit.
        radius, max_pts, min_pts, smoothing = 40000.0, 8, 2, 5000.0
        nn = np.zeros((grid_size, grid_size))
        pt_idx = np.arange(len(mx))
        for r in range(grid_size):
            d2raw = (xs[:, None] - mx[None, :]) ** 2 + (
                ys[r] - my[None, :]
            ) ** 2
            d2 = d2raw + smoothing * smoothing
            within = d2raw <= radius * radius
            key = np.where(within, d2, np.inf)
            rank = np.empty_like(key, dtype=np.int64)
            np.put_along_axis(
                rank,
                np.argsort(key, axis=1, kind="stable"),
                np.broadcast_to(pt_idx, key.shape),
                axis=1,
            )
            keep = within & (rank < max_pts)
            w = np.where(keep, 1.0 / np.maximum(d2, 1e-20), 0.0)
            ws = w.sum(axis=1)
            vs = (w * mv[None, :]).sum(axis=1)
            got = (keep.sum(axis=1) >= max(min_pts, 1)) & (ws > 0)
            nn[r, got] = vs[got] / ws[got]
        rows.append(("invdistnn", zoom, cx, cy, n_owned, _cs_float(nn)))
    df = pd.DataFrame(
        rows, columns=["algorithm", "z", "x", "y", "n_points", "cs"]
    )
    for c in ("z", "x", "y", "n_points", "cs"):
        df[c] = df[c].astype(np.int64)
    return df


# ------------------------------------------------------ q37 point query


def q37_point_query(sf_dir: str) -> pd.DataFrame:
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pts = pq.read_table(paths["points"], columns=["pid", "x", "y"])
    imgs = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    pid = pts.column("pid").to_numpy(zero_copy_only=False)
    qx = pts.column("x").to_numpy(zero_copy_only=False)
    qy = pts.column("y").to_numpy(zero_copy_only=False)
    rows = []
    for row in imgs.itertuples(index=False):
        inside = (
            (qx >= row.minx) & (qx <= row.maxx) & (qy >= row.miny) & (qy <= row.maxy)
        )
        hits = np.flatnonzero(inside)
        if len(hits) == 0:
            continue
        i = int(row.image_id[3:])
        img = ref_decoded(i, int(row.w), int(row.h), row.fmt)
        res_x = (row.maxx - row.minx) / int(row.w)
        res_y = (row.maxy - row.miny) / int(row.h)
        for k in hits:
            sx = (qx[k] - row.minx) / res_x - 0.5
            sy = (row.maxy - qy[k]) / res_y - 0.5
            val = _sample_bilinear(img, np.array([sx]), np.array([sy]))[0, 0]
            rows.append(
                (int(pid[k]), row.image_id, float(val[0]), float(val[1]), float(val[2]))
            )
    return pd.DataFrame(rows, columns=["pid", "image_id", "r", "g", "b"])


# ---------------------------------------------------- q39 color quantize


def _median_cut(pixels: np.ndarray, n_colors: int = 16) -> np.ndarray:
    """Median-cut (gdalmediancut.cpp semantics restated): split the box
    with the largest width*count on its widest axis at the median;
    stable ties toward lower index; palette = floor(box mean + 0.5)."""
    boxes = [pixels.astype(np.int32)]
    while len(boxes) < n_colors:
        widths = [
            (b.max(axis=0) - b.min(axis=0)).max() if len(b) else -1 for b in boxes
        ]
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
    pal = np.array(
        [np.floor(b.mean(axis=0) + 0.5) if len(b) else np.zeros(3) for b in boxes],
        dtype=np.int32,
    )
    return np.clip(pal, 0, 255).astype(np.uint8)


def _dither_naive(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """Scalar Floyd-Steinberg (gdaldither.cpp kernel), the independent
    check on the engine's wavefront vectorization."""
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


def q39_color_quantize(sf_dir: str) -> pd.DataFrame:
    df = _fixture_images(sf_dir)
    ids, cs_q, cs_d = [], [], []
    for row, px in _iter_chips(df):
        pal = _median_cut(px.reshape(-1, 3))
        palf = pal.astype(np.int32)
        flat = px.reshape(-1, 3).astype(np.int32)
        d = ((flat[:, None, :] - palf[None, :, :]) ** 2).sum(axis=2)
        qidx = d.argmin(axis=1).reshape(px.shape[:2]).astype(np.uint8)
        ids.append(row.image_id)
        cs_q.append(_cs_band(qidx))
        cs_d.append(_cs_band(_dither_naive(px[:16, :16], pal)))
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_quant": np.asarray(cs_q, np.int64),
            "cs_dither": np.asarray(cs_d, np.int64),
        }
    )


# --------------------------------------------------- q25 warp 3857->4326


def q25_warp(sf_dir: str) -> pd.DataFrame:
    """Exact per-chip 3857->4326 warp (gdal2tiles.py:422-441 closed
    forms restated; bilinear; dst grid keeps the source pixel count)."""
    df = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    ids, csr, csg, csb = [], [], [], []

    def to_lat(my):
        lat = (np.asarray(my, np.float64) / ORIGIN_SHIFT) * 180.0
        return 180.0 / np.pi * (
            2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0
        )

    def to_my(lat):
        my = np.log(np.tan((90.0 + np.asarray(lat, np.float64)) * np.pi / 360.0)) / (
            np.pi / 180.0
        )
        return my * ORIGIN_SHIFT / 180.0

    for row, px in _iter_chips(df):
        w, h = int(row.w), int(row.h)
        dminx = (row.minx / ORIGIN_SHIFT) * 180.0
        dmaxx = (row.maxx / ORIGIN_SHIFT) * 180.0
        dminy = float(to_lat(row.miny))
        dmaxy = float(to_lat(row.maxy))
        res_x = (row.maxx - row.minx) / w
        res_y = (row.maxy - row.miny) / h
        dres_x = (dmaxx - dminx) / w
        dres_y = (dmaxy - dminy) / h
        xs = dminx + (np.arange(w) + 0.5) * dres_x
        ys = dmaxy - (np.arange(h) + 0.5) * dres_y
        sx_m = xs * ORIGIN_SHIFT / 180.0
        sy_m = to_my(ys)
        src_x = (sx_m - row.minx) / res_x - 0.5
        src_y = (row.maxy - sy_m) / res_y - 0.5
        out = _sample_bilinear(px, src_x, src_y)
        if row.fmt == "qraw":
            out = _qraw_model(out)
        ids.append(row.image_id)
        csr.append(_cs_band(out[:, :, 0]))
        csg.append(_cs_band(out[:, :, 1]))
        csb.append(_cs_band(out[:, :, 2]))
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


# ------------------------------------------- q44 pansharpen + nearblack


def _nearblack_ref(img: np.ndarray, near: int = 15) -> np.ndarray:
    """Border-connected near-black collar via BFS (independent of the
    engine's iterative-dilation flood fill)."""
    from collections import deque

    nearv = (img.astype(np.int32) <= near).all(axis=2)
    h, w = nearv.shape
    mask = np.zeros((h, w), dtype=bool)
    dq = deque()
    for x in range(w):
        for y in (0, h - 1):
            if nearv[y, x] and not mask[y, x]:
                mask[y, x] = True
                dq.append((y, x))
    for y in range(h):
        for x in (0, w - 1):
            if nearv[y, x] and not mask[y, x]:
                mask[y, x] = True
                dq.append((y, x))
    while dq:
        y, x = dq.popleft()
        for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
            if 0 <= ny < h and 0 <= nx < w and nearv[ny, nx] and not mask[ny, nx]:
                mask[ny, nx] = True
                dq.append((ny, nx))
    return mask


def q44_pansharpen_nearblack(sf_dir: str) -> pd.DataFrame:
    """Weighted Brovey (alg/gdalpansharpen.cpp) + nearblack
    (apps/nearblack_lib.cpp flood-fill semantics), restated: gray pan
    synthesized at 2x via cubic, ms upsampled bilinear, codecs modeled
    per fmt, GDAL checksums of the re-decoded result."""
    df = _fixture_images(sf_dir)
    ids, csr, csg, csb = [], [], [], []
    for row, px in _iter_chips(df):
        gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        pan = _resize_ref(
            gray[:, :, None].astype(np.uint8), px.shape[1] * 2, px.shape[0] * 2, "cubic"
        )[:, :, 0]
        up = _resize_ref(px, pan.shape[1], pan.shape[0], "bilinear").astype(np.float64)
        pseudo = (1 / 3) * up[:, :, 0] + (1 / 3) * up[:, :, 1] + (1 / 3) * up[:, :, 2]
        pseudo = np.maximum(pseudo, 1e-9)
        ratio = pan.astype(np.float64) / pseudo
        sharp = np.clip(np.floor(up * ratio[:, :, None] + 0.5), 0, 255).astype(np.uint8)
        if row.fmt == "qraw":
            sharp = _qraw_model(sharp)
        m = _nearblack_ref(sharp)
        out = sharp.copy()
        out[m] = 0
        if row.fmt == "qraw":
            out = _qraw_model(out)
        ids.append(row.image_id)
        csr.append(_cs_band(out[:, :, 0]))
        csg.append(_cs_band(out[:, :, 1]))
        csb.append(_cs_band(out[:, :, 2]))
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


# --------------------------------------------------------- q45 viewshed


def _viewshed_ref(elev: np.ndarray, obs_height: float = 2.0,
                  obs: tuple | None = None) -> np.ndarray:
    """Per-pixel scalar evaluation of the Wang reference-plane
    recurrence (memoized recursion — independent of the engine's
    ring-vectorized propagation).  ``obs`` = (row, col) observer;
    default = center."""
    h, w = elev.shape
    oy, ox = ((h - 1) // 2, (w - 1) // 2) if obs is None else obs
    oz = float(elev[oy, ox]) + obs_height
    aux = {}
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True

    def slope_of(y, x):
        d = np.hypot(x - ox, y - oy)
        if d == 0:
            return -np.inf
        return (float(elev[y, x]) - oz) / d

    def get_aux(y, x):
        if (y, x) == (oy, ox):
            return -np.inf
        if (y, x) in aux:
            return aux[(y, x)]
        dx, dy = x - ox, y - oy
        if abs(dx) >= abs(dy):
            px = x - int(np.sign(dx))
            fy = oy + (px - ox) * dy / (dx if dx != 0 else 1)
            n0y, n0x = int(np.floor(fy)), px
            frac = fy - np.floor(fy)
            n1y, n1x = min(n0y + 1, h - 1), px
        else:
            py = y - int(np.sign(dy))
            fx = ox + (py - oy) * dx / (dy if dy != 0 else 1)
            n0y, n0x = py, int(np.floor(fx))
            frac = fx - np.floor(fx)
            n1y, n1x = py, min(n0x + 1, w - 1)
        n0y = min(max(n0y, 0), h - 1)
        n0x = min(max(n0x, 0), w - 1)
        a0 = get_aux(n0y, n0x)
        if frac == 0.0:
            # n1 may sit on the SAME ring for exact-diagonal crossings;
            # it is never read, so don't recurse into it
            interp = a0
        else:
            a1 = get_aux(n1y, n1x)
            if np.isneginf(a0) and np.isneginf(a1):
                interp = -np.inf
            else:
                interp = a0 * (1.0 - frac) + a1 * frac
        s = slope_of(y, x)
        vis[y, x] = s >= interp
        aux[(y, x)] = max(s, interp)
        return aux[(y, x)]

    # evaluate in ring order (recursion depth stays bounded)
    for r in range(1, max(h, w) + 1):
        for y in range(max(0, oy - r), min(h, oy + r + 1)):
            for x in range(max(0, ox - r), min(w, ox + r + 1)):
                if max(abs(x - ox), abs(y - oy)) == r:
                    get_aux(y, x)
    return vis


def _los_cells_ref(xA, yA, xB, yB):
    """The published Bresenham cell traversal of alg/los.cpp:37-108
    (balance-increment variant) — the visited-cell SET is part of the
    LOS contract, so it is mirrored expression-for-expression like the
    scanline parity fill above; the golden differs structurally by
    materializing the path first and testing after."""
    cells = []
    dx, incx = (xB - xA, 1) if xB >= xA else (xA - xB, -1)
    dy, incy = (yB - yA, 1) if yB >= yA else (yA - yB, -1)
    x, y = xA, yA
    if dx >= dy:
        dy2 = dy << 1
        balance = dy2 - dx
        dx2 = dx * 2
        while x != xB:
            cells.append((x, y))
            if balance >= 0:
                y += incy
                balance -= dx2
            balance += dy2
            x += incx
        cells.append((x, y))
    else:
        dx2 = dx * 2
        balance = dx2 - dy
        dy2 = dy * 2
        while y != yB:
            cells.append((x, y))
            if balance >= 0:
                x += incx
                balance -= dy2
            balance += dx2
            y += incy
        cells.append((x, y))
    return cells


def _los_visible_ref(elev, xA, yA, zA, xB, yB, zB) -> bool:
    """GDALIsLineOfSightVisible (alg/los.cpp:177) restated: endpoint
    pre-checks, axis-ratio lerp for vertical/horizontal lines, sqrt
    distance-ratio lerp otherwise, strict z > terrain."""
    if not zA > float(elev[yA, xA]):
        return False
    if not zB > float(elev[yB, xB]):
        return False
    if xA == xB and yA == yB:
        return True
    if xA == xB:
        step = 1 if yB > yA else -1
        return all(
            zA + (y - yA) / (yB - yA) * (zB - zA) > float(elev[y, xA])
            for y in range(yA, yB + step, step)
        )
    if yA == yB:
        step = 1 if xB > xA else -1
        return all(
            zA + (x - xA) / (xB - xA) * (zB - zA) > float(elev[yA, x])
            for x in range(xA, xB + step, step)
        )
    r_denom = float(xB - xA) ** 2 + float(yB - yA) ** 2
    for x, y in _los_cells_ref(xA, yA, xB, yB):
        r_num = float(x - xA) ** 2 + float(y - yA) ** 2
        z = zA + np.sqrt(r_num / r_denom) * (zB - zA)
        if not z > float(elev[y, x]):
            return False
    return True


def _los_fan_ref(elev, obs_height: float = 2.0):
    """16-ray fan golden: center at +2 and +16 to the 8 border compass
    targets at +2 (fixture spec shared with the engine)."""
    h, w = elev.shape
    cy, cx = (h - 1) // 2, (w - 1) // 2
    targets = [
        (0, 0), (0, cx), (0, w - 1), (cy, w - 1),
        (h - 1, w - 1), (h - 1, cx), (h - 1, 0), (cy, 0),
    ]
    n = 0
    for zmul in (1.0, 8.0):
        zA = float(elev[cy, cx]) + obs_height * zmul
        for ty, tx in targets:
            zB = float(elev[ty, tx]) + obs_height
            n += int(_los_visible_ref(elev, cx, cy, zA, tx, ty, zB))
    return n, 16


def q45_viewshed(sf_dir: str) -> pd.DataFrame:
    """Viewshed suite golden: mode='single' = center-observer Wang
    recurrence; mode='cumulative' = the observer-grid accumulation
    (alg/viewshed/cumulative.cpp:66-68: observers every 32 px starting
    at 0 in both axes, 1-for-visible rasters summed)."""
    df = _fixture_images(sf_dir)
    df = df[(df["w"] <= 64) & (df["h"] <= 64)].reset_index(drop=True)
    ids, modes, nv, fr = [], [], [], []
    for row, px in _iter_chips(df):
        elev = px[:, :, 0].astype(np.float64)
        m = _viewshed_ref(elev)
        ids.append(row.image_id)
        modes.append("single")
        nv.append(int(m.sum()))
        fr.append(float(np.round(float(m.mean()), 6)))
        h, w = elev.shape
        counts = np.zeros((h, w), np.int64)
        n_obs = 0
        for x in range(0, w, 32):
            for y in range(0, h, 32):
                counts += _viewshed_ref(elev, obs=(y, x))
                n_obs += 1
        s = int(counts.sum())
        ids.append(row.image_id)
        modes.append("cumulative")
        nv.append(s)
        fr.append(float(np.round(s / float(counts.size * n_obs), 6)))
        n_los, n_rays = _los_fan_ref(elev)
        ids.append(row.image_id)
        modes.append("los")
        nv.append(n_los)
        fr.append(float(np.round(n_los / float(n_rays), 6)))
    return pd.DataFrame(
        {
            "image_id": ids,
            "mode": modes,
            "n_visible": np.asarray(nv, np.int64),
            "frac_visible": np.asarray(fr, np.float64),
        }
    )


# --------------------------------------------------- q52 jpeg roundtrip

_JQL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_JQC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _jpeg_ref_decode(img: np.ndarray, quality: int = 97) -> np.ndarray:
    """ITU-T T.81 baseline DCT-quantization model restated (Huffman is
    lossless, so this IS the expected decode)."""
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_JQL * scale + 50) // 100, 1, 255)
    qc = np.clip((_JQC * scale + 50) // 100, 1, 255)
    h, w = img.shape[:2]
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(img, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
    r = pad[:, :, 0].astype(np.float64)
    g = pad[:, :, 1].astype(np.float64)
    b = pad[:, :, 2].astype(np.float64)
    ycc = np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=2,
    )
    k = np.arange(8, dtype=np.float64)
    C = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    C[0] *= np.sqrt(1.0 / 8.0)
    C[1:] *= np.sqrt(2.0 / 8.0)
    out = np.empty((H, W, 3))
    for c, q in ((0, ql), (1, qc), (2, qc)):
        ch = ycc[:, :, c]
        blocks = ch.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        f = np.einsum("ij,njk,lk->nil", C, blocks - 128.0, C)
        coef = np.round(f / q[None, :, :]).astype(np.int32)
        back = np.einsum("ji,njk,kl->nil", C, coef.astype(np.float64) * q[None, :, :], C) + 128.0
        out[:, :, c] = back.reshape(H // 8, W // 8, 8, 8).transpose(0, 2, 1, 3).reshape(H, W)
    y = out[:, :, 0]
    cb = out[:, :, 1] - 128.0
    cr = out[:, :, 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)[:h, :w]


def q52_multimodal_codecs(sf_dir: str, quality: int = 97) -> pd.DataFrame:
    """Multimodal codec golden: jpeg roundtrip rows (DCT-quantization
    model), plus audio-feature and video-frame-sample rows over the
    deterministic event-key clips (synthesis formulas mirrored from
    stages/media.py — shared input; the FEATURE math below is an
    independent scalar/numpy restatement)."""
    df = _fixture_images(sf_dir)
    df = df[(df["w"] <= 64) & (df["h"] <= 64)].reset_index(drop=True)
    rows = []
    for row, px in _iter_chips(df):
        dec = _jpeg_ref_decode(px, quality)
        diff = px.astype(np.float64) - dec.astype(np.float64)
        mse = float(np.mean(diff * diff))
        p = float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
        pm = 999999 if np.isinf(p) else int(np.floor(p * 1000.0 + 0.5))
        rows.append(("jpeg_cs", row.image_id, _cs_band(dec[:, :, 0]),
                     _cs_band(dec[:, :, 1]), _cs_band(dec[:, :, 2])))
        rows.append(("jpeg_psnr", row.image_id, pm, 0, 0))
        # webp_cs: VP8L is lossless, so the expected decode IS the
        # source chip — the golden is the original pixels' checksums
        # (the engine side actually rides the encode->decode bitstream
        # on the same deterministic 1-in-4 id-numeral subset)
        if int(row.image_id[3:]) % 4 == 0:
            rows.append(("webp_cs", row.image_id, _cs_band(px[:, :, 0]),
                         _cs_band(px[:, :, 1]), _cs_band(px[:, :, 2])))
        # image-quality metrics: integer luma + the shared IEEE
        # expressions from stages/media.image_quality_metrics (same
        # floats by construction; the integer moment sums are exact)
        g = (
            77 * px[:, :, 0].astype(np.int64)
            + 150 * px[:, :, 1].astype(np.int64)
            + 29 * px[:, :, 2].astype(np.int64)
        ) >> 8
        h2, w2 = g.shape
        npx = h2 * w2
        bright_m = int((2000 * int(g.sum()) + npx) // (2 * npx))
        if h2 > 2 and w2 > 2:
            lap = (
                4 * g[1:-1, 1:-1]
                - g[:-2, 1:-1] - g[2:, 1:-1] - g[1:-1, :-2] - g[1:-1, 2:]
            )
            n2 = (h2 - 2) * (w2 - 2)
            s1 = int(lap.sum())
            s2 = int((lap * lap).sum())
            var = s2 / n2 - (s1 / n2) ** 2
            lapvar_m = int(np.floor(var * 1000.0 + 0.5))
        else:
            lapvar_m = 0
        cnt = np.bincount(g.reshape(-1).astype(np.int64), minlength=256)
        pq_ = cnt[cnt > 0] / npx
        ent = float(-(pq_ * np.log2(pq_)).sum())
        ent_m = int(np.floor(ent * 1000.0 + 0.5))
        rows.append(("img_quality", row.image_id, bright_m, lapvar_m, ent_m))

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
    keys = sorted(
        int(k)
        for k in ev.column("event_id").to_numpy(zero_copy_only=False)
        if k % 97 == 0
    )
    win, hop = 512, 256
    for k in keys:
        # ---- audio clip (mirrored synthesis) -> features
        if k % 17 == 0:
            rows.append(("audio_unsupported", f"a{k}", 0, 0, 0))
        else:
            n = 8000 + (k * 37) % 8000
            f1 = 3 + (k * 7) % 40
            f2 = 50 + (k * 13) % 200
            i = np.arange(n, dtype=np.float64)
            s = (9000.0 * np.sin(2.0 * np.pi * f1 * i / 16000.0)
                 + 4000.0 * np.sin(2.0 * np.pi * f2 * i / 16000.0))
            saw = ((i * (1 + k % 5)) % 4096) - 2048.0
            samples = np.floor(s + saw + 0.5).astype(np.int16)
            nf = 1 + (n - win) // hop
            energy = 0
            zcr = 0
            for fi in range(nf):
                fr = samples[fi * hop : fi * hop + win].astype(np.int64)
                energy += int((fr * fr).sum())
                sg = fr >= 0
                zcr += int((sg[1:] != sg[:-1]).sum())
            rows.append(("audio_feat", f"a{k}", nf, zcr, energy))
        # ---- video clip (mirrored synthesis) -> every-4th frame cs
        if k % 19 == 0:
            rows.append(("video_unsupported", f"v{k}", -1, 0, 0))
        else:
            w, h = 32, 24
            n = 8 + (k * 11) % 25
            for fi in range(0, n, 4):
                yy = np.arange(h, dtype=np.int64)[:, None]
                xx = np.arange(w, dtype=np.int64)[None, :]
                r = ((xx * 8 + fi * 5 + k) % 256) + 0 * yy
                g = ((yy * 11 + fi * 3 + k * 7) % 256) + 0 * xx
                b = (xx + yy + fi * 9) % 256
                cs = sum(
                    _cs_band(ch.astype(np.uint8))
                    for ch in (r, g, b)
                )
                rows.append(("video_frame", f"v{k}", fi, n, cs))

    out = pd.DataFrame(rows, columns=["kind", "media_id", "a", "b", "v"])
    for c in ("a", "b", "v"):
        out[c] = out[c].astype(np.int64)
    return out


# -------------------------------------------------- q54 grid metrics


def q54_grid_metrics(sf_dir: str, zoom: int = 8, grid_size: int = 64,
                     radius: float = 40000.0) -> pd.DataFrame:
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    t = pq.read_table(paths["points"], columns=["pid", "x", "y"])
    px = t.column("x").to_numpy()
    py = t.column("y").to_numpy()
    tx, ty = _tile_of(px, zoom), _tile_of(py, zoom)
    res = INITIAL_RES / (1 << zoom)
    owned = sorted({(int(a), int(b)) for a, b in zip(tx, ty)})
    rows = []
    for cx, cy in owned:
        member = (np.abs(tx - cx) <= 1) & (np.abs(ty - cy) <= 1)
        mx, my = px[member], py[member]
        minx = cx * 256 * res - ORIGIN_SHIFT
        maxy = (cy + 1) * 256 * res - ORIGIN_SHIFT
        cres = (256 * res) / grid_size
        xs = minx + (np.arange(grid_size) + 0.5) * cres
        ys = maxy - (np.arange(grid_size) + 0.5) * cres
        gx, gy = np.meshgrid(xs, ys)
        d2 = (gx[:, :, None] - mx[None, None, :]) ** 2 + (
            gy[:, :, None] - my[None, None, :]
        ) ** 2
        cnt = (d2 <= radius * radius).sum(axis=2).astype(np.float64)
        n_owned = int(((tx == cx) & (ty == cy)).sum())
        rows.append((zoom, cx, cy, n_owned, _cs_float(cnt)))
    return pd.DataFrame(
        rows, columns=["z", "x", "y", "n_points", "cs"]
    ).astype(np.int64)


# -------------------------------------------------- q55 color relief

_RAMP_X = np.array([0.0, 64.0, 128.0, 192.0, 255.0])
_RAMP_RGB = np.array(
    [[0, 0, 139], [0, 128, 255], [34, 139, 34], [205, 133, 63], [255, 255, 255]],
    dtype=np.float64,
)


def q55_color_relief(sf_dir: str) -> pd.DataFrame:
    df = _fixture_images(sf_dir)
    ids, csr, csg, csb = [], [], [], []
    for row, px in _iter_chips(df):
        e = px[:, :, 0].astype(np.float64)
        cs = []
        for c in range(3):
            v = np.interp(e, _RAMP_X, _RAMP_RGB[:, c])
            band = np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)
            cs.append(_cs_band(band))
        ids.append(row.image_id)
        csr.append(cs[0]); csg.append(cs[1]); csb.append(cs[2])
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


def q29_band_stats_hist(sf_dir: str) -> pd.DataFrame:
    """Long-format union of band statistics (kind='stat_*', k=0,
    v=statistic) and the 256-bucket histogram (kind='hist', k=bucket,
    v=count) — the oracle of the one registered q29 query."""
    s = q29_band_stats(sf_dir)
    h = q30_band_histogram(sf_dir)
    rows = []
    for stat, col in (
        ("stat_n", "n"),
        ("stat_min", "min"),
        ("stat_max", "max"),
        ("stat_mean", "mean"),
        ("stat_std", "stddev"),
    ):
        rows.append(
            pd.DataFrame(
                {
                    "kind": stat,
                    "band": s["band"].astype(np.int64),
                    "k": np.int64(0),
                    "v": s[col].astype(np.float64),
                }
            )
        )
    rows.append(
        pd.DataFrame(
            {
                "kind": "hist",
                "band": h["band"].astype(np.int64),
                "k": h["bucket"].astype(np.int64),
                "v": h["count"].astype(np.float64),
            }
        )
    )
    rows.append(_zonal_ref(sf_dir))
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values(["kind", "band", "k"])
        .reset_index(drop=True)
    )


def _zonal_ref(sf_dir: str) -> pd.DataFrame:
    """Zonal-statistics golden: for every polygon zone, aggregate the
    pixels of every envelope-overlapping chip whose CENTER is inside
    the polygon.  DIFFERENT inside test than the engine's scanline
    span fill: per scanline, crossing-count parity with the <=
    convention — inside iff #{edge crossings with x <= center_x} is
    odd (an even total crossing count makes left-parity == span-fill
    membership, and exact-tie centers resolve identically: a center AT
    a span-opening crossing is IN, at a closing one OUT).  Rows
    (kind='zonal_n|zonal_sum|zonal_min|zonal_max', band, k=fid, v)."""
    import pyarrow.parquet as pq

    from ..synth.make_table import (
        ensure_fixtures,
        polygon_rings_of,
        scale_for_sf_dir,
    )

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = _fixture_images(
        sf_dir,
        columns=["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    pt = pq.read_table(
        paths["polygons"], columns=["fid", "minx", "miny", "maxx", "maxy"]
    )
    pf = pt.column("fid").to_numpy(zero_copy_only=False)
    pe = {c: pt.column(c).to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    ie = {c: imgs[c].to_numpy() for c in ("minx", "miny", "maxx", "maxy")}
    acc: dict[tuple[int, int], list] = {}
    for k in range(len(pf)):
        fid = int(pf[k])
        rings = polygon_rings_of(fid)
        a = np.vstack([r[:-1] for r in rings])
        b = np.vstack([r[1:] for r in rings])
        y1, y2 = a[:, 1], b[:, 1]
        x1, x2 = a[:, 0], b[:, 0]
        hit = np.flatnonzero(
            (ie["minx"] <= pe["maxx"][k]) & (ie["maxx"] >= pe["minx"][k])
            & (ie["miny"] <= pe["maxy"][k]) & (ie["maxy"] >= pe["miny"][k])
        )
        for ci in hit:
            row = imgs.iloc[int(ci)]
            w, h = int(row.w), int(row.h)
            res = (row.maxx - row.minx) / w
            cx = row.minx + (np.arange(w) + 0.5) * res
            ys = row.maxy - (np.arange(h) + 0.5) * res
            mask = np.zeros((h, w), dtype=bool)
            for r_ in range(h):
                y = ys[r_]
                cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
                if not cond.any():
                    continue
                t = (y - y1[cond]) / (y2[cond] - y1[cond])
                xs = x1[cond] + t * (x2[cond] - x1[cond])
                mask[r_] = ((xs[:, None] <= cx[None, :]).sum(axis=0) % 2) == 1
            if not mask.any():
                continue
            px = ref_decoded(int(row.image_id[3:]), w, h, row.fmt)
            sel = px[mask]
            for band in range(px.shape[2]):
                v = sel[:, band]
                key = (fid, band)
                st = acc.get(key)
                if st is None:
                    acc[key] = [len(v), int(v.sum(dtype=np.int64)),
                                int(v.min()), int(v.max())]
                else:
                    st[0] += len(v)
                    st[1] += int(v.sum(dtype=np.int64))
                    st[2] = min(st[2], int(v.min()))
                    st[3] = max(st[3], int(v.max()))
    recs = []
    for (fid, band), (n, sm, mn, mx) in acc.items():
        for kind, v in (("zonal_n", n), ("zonal_sum", sm),
                        ("zonal_min", mn), ("zonal_max", mx)):
            recs.append((kind, band, fid, float(v)))
    return pd.DataFrame(recs, columns=["kind", "band", "k", "v"]).astype(
        {"band": np.int64, "k": np.int64, "v": np.float64}
    )


# ------------------------------------------------------ q58 GCP warp


def _poly_terms_ref(u, v, order):
    terms = [np.ones_like(u), u, v]
    if order >= 2:
        terms += [u * u, u * v, v * v]
    if order >= 3:
        terms += [u * u * u, u * u * v, u * v * v, v * v * v]
    return terms[: {1: 3, 2: 6, 3: 10}[order]]


def _fit_poly_ref(sx, sy, dx, dy, order):
    """Normal-equations least squares (vs the engine's lstsq — the
    2^-16 quantization of the SPEC makes both produce the identical
    transform), min/max-midpoint normalized."""

    def norm(a):
        lo, hi = float(np.min(a)), float(np.max(a))
        mid, half = (lo + hi) * 0.5, (hi - lo) * 0.5
        return mid, (half if half != 0.0 else 1.0)

    sxm, sxh = norm(sx)
    sym, syh = norm(sy)
    dxm, dxh = norm(dx)
    dym, dyh = norm(dy)
    u = (sx - sxm) / sxh
    v = (sy - sym) / syh
    B = np.column_stack(_poly_terms_ref(u, v, order))
    G = B.T @ B
    cx = np.linalg.solve(G, B.T @ ((dx - dxm) / dxh))
    cy = np.linalg.solve(G, B.T @ ((dy - dym) / dyh))
    cx = np.floor(cx * 65536.0 + 0.5) / 65536.0
    cy = np.floor(cy * 65536.0 + 0.5) / 65536.0

    def ev(x, y):
        uu = (np.asarray(x, np.float64) - sxm) / sxh
        vv = (np.asarray(y, np.float64) - sym) / syh
        terms = _poly_terms_ref(uu, vv, order)
        ax = np.full_like(uu, cx[0])
        ay = np.full_like(uu, cy[0])
        for k in range(1, len(terms)):
            ax = ax + cx[k] * terms[k]
            ay = ay + cy[k] * terms[k]
        return ax * dxh + dxm, ay * dyh + dym

    return ev


def _bilinear_grid_ref(img, sx, sy):
    """2-D bilinear gather, nodata-0 outside (resample_grid spec)."""
    h, w = img.shape[:2]
    valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    data = img.astype(np.float64)
    fx0 = np.floor(sx)
    fy0 = np.floor(sy)
    fx = (sx - fx0)[..., None]
    fy = (sy - fy0)[..., None]
    x0 = np.clip(fx0.astype(np.int64), 0, w - 1)
    x1 = np.clip(fx0.astype(np.int64) + 1, 0, w - 1)
    y0 = np.clip(fy0.astype(np.int64), 0, h - 1)
    y1 = np.clip(fy0.astype(np.int64) + 1, 0, h - 1)
    out = (1.0 - fy) * ((1.0 - fx) * data[y0, x0, :] + fx * data[y0, x1, :]) + fy * (
        (1.0 - fx) * data[y1, x0, :] + fx * data[y1, x1, :]
    )
    res = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    res[~valid] = 0
    return res


def _gauss_solve_ref(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hand-rolled Gaussian elimination with partial pivoting (the
    independent solver for the TPS golden — structurally different
    from the engine's LAPACK solve; the 2^-16 coefficient quantization
    absorbs the arithmetic difference)."""
    A = A.astype(np.float64).copy()
    b = b.astype(np.float64).copy()
    n = len(b)
    for col in range(n):
        p = col + int(np.argmax(np.abs(A[col:, col])))
        if p != col:
            A[[col, p]] = A[[p, col]]
            b[[col, p]] = b[[p, col]]
        piv = A[col, col]
        for r in range(col + 1, n):
            f = A[r, col] / piv
            if f != 0.0:
                A[r, col:] -= f * A[col, col:]
                b[r] -= f * b[col]
    x = np.zeros(n)
    for r in range(n - 1, -1, -1):
        x[r] = (b[r] - A[r, r + 1 :] @ x[r + 1 :]) / A[r, r]
    return x


def _phi_ref(d2: np.ndarray) -> np.ndarray:
    """TPS radial basis (thinplatespline.cpp:179 restated):
    phi(d2) = d2 * log(d2), phi(0) = 0."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(d2 > 0.0, d2 * np.log(np.maximum(d2, 1e-300)), 0.0)


class _TpsRef:
    """One TPS direction, golden side: same normalization/quantization
    contract as the engine, independent Gaussian-elimination solve."""

    def __init__(self, sx, sy, dx, dy):
        def norm(a):
            lo, hi = float(np.min(a)), float(np.max(a))
            mid = (lo + hi) * 0.5
            half = (hi - lo) * 0.5
            return mid, (half if half != 0.0 else 1.0)

        self.sxm, self.sxh = norm(sx)
        self.sym, self.syh = norm(sy)
        self.dxm, self.dxh = norm(dx)
        self.dym, self.dyh = norm(dy)
        self.u = (sx - self.sxm) / self.sxh
        self.v = (sy - self.sym) / self.syh
        tu = (dx - self.dxm) / self.dxh
        tv = (dy - self.dym) / self.dyh
        n = len(sx)
        A = np.zeros((n + 3, n + 3))
        d2 = (self.u[:, None] - self.u[None, :]) ** 2 + (
            self.v[:, None] - self.v[None, :]
        ) ** 2
        A[:n, :n] = _phi_ref(d2)
        A[:n, n] = 1.0
        A[:n, n + 1] = self.u
        A[:n, n + 2] = self.v
        A[n, :n] = 1.0
        A[n + 1, :n] = self.u
        A[n + 2, :n] = self.v
        q = lambda c: np.floor(c * 65536.0 + 0.5) / 65536.0  # noqa: E731
        self.cx = q(_gauss_solve_ref(A, np.concatenate([tu, np.zeros(3)])))
        self.cy = q(_gauss_solve_ref(A, np.concatenate([tv, np.zeros(3)])))

    def _eval(self, coef, u, v):
        n = len(self.u)
        acc = coef[n] + coef[n + 1] * u + coef[n + 2] * v
        for i in range(n):
            d2 = (u - self.u[i]) ** 2 + (v - self.v[i]) ** 2
            acc = acc + coef[i] * _phi_ref(d2)
        return acc

    def __call__(self, x, y):
        u = (np.asarray(x, np.float64) - self.sxm) / self.sxh
        v = (np.asarray(y, np.float64) - self.sym) / self.syh
        return (
            self._eval(self.cx, u, v) * self.dxh + self.dxm,
            self._eval(self.cy, u, v) * self.dyh + self.dym,
        )


class _RpcRef:
    """RPC golden (alg/gdal_rpc.cpp no-DEM contract): fixture
    coefficients restated from functions.rpc.synth_rpc; forward =
    sequential 20-term rational polynomial (RPCComputeTerms order);
    inverse = scalar per-point fixed-point iteration with the
    1e-4-difference affine seed (structurally independent of the
    engine's masked vectorized iteration — bitwise agreement comes
    from the shared elementwise expression sequence)."""

    def __init__(self, i: int, w: int, h: int):
        lon0 = ((i * 5) % 64 - 32) / 256.0
        lat0 = ((i * 11) % 64 - 32) / 256.0
        a = ((i * 7) % 16) / 1024.0
        b = ((i * 13) % 16) / 2048.0
        c = ((i * 3) % 8) / 4096.0
        d = ((i * 17) % 8) / 8192.0
        sn = [0.0] * 20
        sn[1], sn[4], sn[8], sn[11] = 1.0, a, b, c
        sd = [0.0] * 20
        sd[0], sd[2] = 1.0, d
        ln = [0.0] * 20
        ln[2], ln[4], ln[7], ln[15] = 1.0, -a, b, c
        ld = [0.0] * 20
        ld[0], ld[1] = 1.0, d
        self.sn, self.sd, self.ln, self.ld = sn, sd, ln, ld
        self.lon0, self.lat0 = lon0, lat0
        self.lsc = 1.0 / 16.0
        self.soff, self.ssc = w / 2.0, w / 2.0
        self.loff, self.lsc2 = h / 2.0, h / 2.0
        # affine seed from forward differences, then 2x3 inversion
        rp, rl = self._fwd1(lon0, lat0)
        dd = 0.0001
        p1, l1 = self._fwd1(lon0 + dd, lat0)
        p2, l2 = self._fwd1(lon0, lat0 + dd)
        gt = [0.0] * 6
        gt[1] = (p1 - rp) / dd
        gt[4] = (l1 - rl) / dd
        gt[2] = (p2 - rp) / dd
        gt[5] = (l2 - rl) / dd
        gt[0] = rp - gt[1] * lon0 - gt[2] * lat0
        gt[3] = rl - gt[4] * lon0 - gt[5] * lat0
        det = gt[1] * gt[5] - gt[2] * gt[4]
        iv = 1.0 / det
        self.gt = [
            (gt[2] * gt[3] - gt[0] * gt[5]) * iv, gt[5] * iv, -gt[2] * iv,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * iv, -gt[4] * iv, gt[1] * iv,
        ]

    @staticmethod
    def _terms(L, P, H):
        one = L * 0.0 + 1.0 if isinstance(L, np.ndarray) else 1.0
        return [
            one, L, P, H,
            L * P, L * H, P * H, L * L, P * P, H * H,
            L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
            P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
        ]

    def _eval(self, lonlat_pair):
        lon, lat = lonlat_pair
        L = (lon - self.lon0) / self.lsc
        P = (lat - self.lat0) / self.lsc
        H = L * 0.0
        t = self._terms(L, P, H)

        def poly(c):
            acc = c[0] * t[0]
            for k in range(1, 20):
                acc = acc + c[k] * t[k]
            return acc

        px = (poly(self.sn) / poly(self.sd)) * self.ssc + self.soff
        ln = (poly(self.ln) / poly(self.ld)) * self.lsc2 + self.loff
        return px, ln

    def _fwd1(self, lon: float, lat: float):
        return self._eval((lon, lat))

    def fwd_grid(self, XX, YY):
        return self._eval((XX, YY))

    def inv_points(self, pxs, lns):
        out_x, out_y = [], []
        for px, ln in zip(pxs, lns):
            X = self.gt[0] + self.gt[1] * px + self.gt[2] * ln
            Y = self.gt[3] + self.gt[4] * px + self.gt[5] * ln
            for _ in range(10):
                bp, bl = self._fwd1(X, Y)
                dx, dy = bp - px, bl - ln
                if max(abs(dx), abs(dy)) < 0.1:
                    break
                X = X - (dx * self.gt[1]) - (dy * self.gt[2])
                Y = Y - (dx * self.gt[4]) - (dy * self.gt[5])
            out_x.append(X)
            out_y.append(Y)
        return np.asarray(out_x), np.asarray(out_y)


class _RpcDemRef(_RpcRef):
    """DEM-backed RPC golden: the synth_rpc_dem H-term/scale variant
    plus the dyadic DEM; inverse is a SCALAR per-point loop running
    the full RPCInverseTransformPoint state machine (oscillation mean,
    boost 10 after 5 consecutive sub-2-px errors, 20 iterations) —
    structurally independent of the engine's per-lane vectorization."""

    def __init__(self, i: int, w: int, h: int):
        self.hsc = 1.0  # placeholder: super().__init__ dispatches to
        # the subclass _eval while deriving its (discarded) seed
        super().__init__(i, w, h)
        e = ((i * 9) % 8) / 512.0
        self.sn = list(self.sn)
        self.ln = list(self.ln)
        self.sn[3] = e
        self.ln[3] = -e
        self.hsc = 128.0
        amp = float(i % 8)
        r = np.arange(17, dtype=np.float64)[:, None]
        c = np.arange(17, dtype=np.float64)[None, :]
        self.dem = np.broadcast_to(
            amp * (r * (16.0 - r) + c * (16.0 - c)) / 8.0, (17, 17)).copy()
        self.dlon0 = self.lon0 - 1.0 / 16.0
        self.dlat0 = self.lat0 - 1.0 / 16.0
        self.dstep = 1.0 / 128.0
        # re-derive the affine seed with the H-term model (h=0 at ref)
        rp, rl = self._fwd1(self.lon0, self.lat0)
        dd = 0.0001
        p1, l1 = self._fwd1(self.lon0 + dd, self.lat0)
        p2, l2 = self._fwd1(self.lon0, self.lat0 + dd)
        gt = [0.0] * 6
        gt[1] = (p1 - rp) / dd
        gt[4] = (l1 - rl) / dd
        gt[2] = (p2 - rp) / dd
        gt[5] = (l2 - rl) / dd
        gt[0] = rp - gt[1] * self.lon0 - gt[2] * self.lat0
        gt[3] = rl - gt[4] * self.lon0 - gt[5] * self.lat0
        det = gt[1] * gt[5] - gt[2] * gt[4]
        iv = 1.0 / det
        self.gt = [
            (gt[2] * gt[3] - gt[0] * gt[5]) * iv, gt[5] * iv, -gt[2] * iv,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * iv, -gt[4] * iv, gt[1] * iv,
        ]

    def _eval(self, lonlat_pair, h=0.0):
        lon, lat = lonlat_pair
        L = (lon - self.lon0) / self.lsc
        P = (lat - self.lat0) / self.lsc
        H = (h - 0.0) / self.hsc
        one = L * 0.0 + 1.0 if isinstance(L, np.ndarray) else 1.0
        t = [
            one, L, P, H,
            L * P, L * H, P * H, L * L, P * P, H * H,
            L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
            P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
        ]

        def poly(c):
            acc = c[0] * t[0]
            for k in range(1, 20):
                acc = acc + c[k] * t[k]
            return acc

        px = (poly(self.sn) / poly(self.sd)) * self.ssc + self.soff
        ln = (poly(self.ln) / poly(self.ld)) * self.lsc2 + self.loff
        return px, ln

    def _fwd1(self, lon: float, lat: float, h: float = 0.0):
        return self._eval((lon, lat), h)

    def _dem_at(self, lon, lat):
        gx = (np.asarray(lon, np.float64) - self.dlon0) / self.dstep
        gy = (np.asarray(lat, np.float64) - self.dlat0) / self.dstep
        gx = np.minimum(np.maximum(0.0, gx), 16.0)
        gy = np.minimum(np.maximum(0.0, gy), 16.0)
        ix = np.minimum(gx.astype(np.int64), 15)
        iy = np.minimum(gy.astype(np.int64), 15)
        fx = gx - ix
        fy = gy - iy
        v = self.dem
        return (1 - fy) * (v[iy, ix] + fx * (v[iy, ix + 1] - v[iy, ix])) \
            + fy * (v[iy + 1, ix] + fx * (v[iy + 1, ix + 1]
                                          - v[iy + 1, ix]))

    def fwd_grid(self, XX, YY):
        return self._eval((XX, YY), self._dem_at(XX, YY))

    def inv_points(self, pxs, lns):
        out_x, out_y = [], []
        for px, ln in zip(pxs, lns):
            X = self.gt[0] + self.gt[1] * px + self.gt[2] * ln
            Y = self.gt[3] + self.gt[4] * px + self.gt[5] * ln
            last_dx = last_dy = last_X = last_Y = 0.0
            last_valid = False
            cnt = 0
            for _ in range(20):
                demh = float(self._dem_at(np.float64(X), np.float64(Y)))
                bp, bl = self._fwd1(X, Y, demh)
                dx, dy = bp - px, bl - ln
                err = max(abs(dx), abs(dy))
                if err < 0.1:
                    break
                if last_valid and dx * last_dx < 0 and dy * last_dy < 0:
                    adx, aldx = abs(dx), abs(last_dx)
                    ady, aldy = abs(dy), abs(last_dy)
                    X = (adx * last_X + aldx * X) / (adx + aldx)
                    Y = (ady * last_Y + aldy * Y) / (ady + aldy)
                    last_valid = False
                    cnt = 0
                    continue
                boost = 10.0 if (cnt >= 5 and err < 2) else 1.0
                cnt = cnt + 1 if err < 2 else 0
                newX = X - (dx * self.gt[1] * boost) - (dy * self.gt[2] * boost)
                newY = Y - (dx * self.gt[4] * boost) - (dy * self.gt[5] * boost)
                last_X, last_Y = X, Y
                X, Y = newX, newY
                last_dx, last_dy = dx, dy
                last_valid = True
            out_x.append(X)
            out_y.append(Y)
        return np.asarray(out_x), np.asarray(out_y)


class _GeolocRef:
    """Geoloc golden: fixture arrays restated from synth_geoloc;
    forward = the PixelLineToXY nested bilinear; inverse = the
    documented masked-Newton contract (same elementwise expression
    sequence as the engine => identical doubles; independent code)."""

    def __init__(self, i: int, w: int, h: int, minx, miny, maxx, maxy):
        gsd = (maxx - minx) / w
        gsdy = (maxy - miny) / h
        nc, nr = w // 4 + 1, h // 4 + 1
        ax = ((i * 3) % 8) / 32.0
        bx = ((i * 5) % 8) / 64.0
        ay = ((i * 7) % 8) / 32.0
        by = ((i * 11) % 8) / 64.0
        c = np.arange(nc, dtype=np.float64)[None, :]
        r = np.arange(nr, dtype=np.float64)[:, None]
        bc = c * (nc - 1 - c) / 64.0
        br = r * (nr - 1 - r) / 64.0
        self.glx = np.broadcast_to(
            minx + gsd * (4.0 * c + ax * bc + bx * br), (nr, nc)).copy()
        self.gly = np.broadcast_to(
            maxy - gsdy * (4.0 * r + ay * br + by * bc), (nr, nc)).copy()
        self.nr, self.nc = nr, nc
        x00, y00 = self.glx[0, 0], self.gly[0, 0]
        gt = [x00, (self.glx[0, nc - 1] - x00) / (nc - 1),
              (self.glx[nr - 1, 0] - x00) / (nr - 1),
              y00, (self.gly[0, nc - 1] - y00) / (nc - 1),
              (self.gly[nr - 1, 0] - y00) / (nr - 1)]
        det = gt[1] * gt[5] - gt[2] * gt[4]
        iv = 1.0 / det
        self.inv_gt = [
            (gt[2] * gt[3] - gt[0] * gt[5]) * iv, gt[5] * iv, -gt[2] * iv,
            (-gt[1] * gt[3] + gt[0] * gt[4]) * iv, -gt[4] * iv, gt[1] * iv,
        ]

    def _corners(self, gp, gl):
        gp = np.minimum(np.maximum(0.0, gp), float(self.nc - 1))
        gl = np.minimum(np.maximum(0.0, gl), float(self.nr - 1))
        iX = np.minimum(gp.astype(np.int64), self.nc - 2)
        iY = np.minimum(gl.astype(np.int64), self.nr - 2)
        return iX, iY, gp, gl

    def _bil(self, iX, iY, fx, fy):
        glx, gly = self.glx, self.gly
        X = (1 - fy) * (glx[iY, iX] + fx * (glx[iY, iX + 1] - glx[iY, iX])
             ) + fy * (glx[iY + 1, iX] + fx * (
                 glx[iY + 1, iX + 1] - glx[iY + 1, iX]))
        Y = (1 - fy) * (gly[iY, iX] + fx * (gly[iY, iX + 1] - gly[iY, iX])
             ) + fy * (gly[iY + 1, iX] + fx * (
                 gly[iY + 1, iX + 1] - gly[iY + 1, iX]))
        return X, Y

    def forward(self, pixel, line):
        iX, iY, gp, gl = self._corners(
            np.asarray(pixel, np.float64) / 4.0,
            np.asarray(line, np.float64) / 4.0)
        return self._bil(iX, iY, gp - iX, gl - iY)

    def inverse(self, x, y):
        shape = np.asarray(x).shape
        x = np.asarray(x, np.float64).reshape(-1)
        y = np.asarray(y, np.float64).reshape(-1)
        g = self.inv_gt
        U = g[0] + g[1] * x + g[2] * y
        V = g[3] + g[4] * x + g[5] * y
        active = np.ones(U.shape, bool)
        glx, gly = self.glx, self.gly
        for _ in range(12):
            if not active.any():
                break
            iX, iY, gp, gl = self._corners(U[active], V[active])
            fx, fy = gp - iX, gl - iY
            FX, FY = self._bil(iX, iY, fx, fy)
            FX = FX - x[active]
            FY = FY - y[active]
            err = np.maximum(np.abs(FX), np.abs(FY))
            conv = err < 2.0 ** -16
            idx = np.flatnonzero(active)
            active[idx[conv]] = False
            live = ~conv
            ju_x = (1 - fy) * (glx[iY, iX + 1] - glx[iY, iX]) + fy * (
                glx[iY + 1, iX + 1] - glx[iY + 1, iX])
            jv_x = (glx[iY + 1, iX] + fx * (glx[iY + 1, iX + 1]
                    - glx[iY + 1, iX])) - (glx[iY, iX] + fx * (
                        glx[iY, iX + 1] - glx[iY, iX]))
            ju_y = (1 - fy) * (gly[iY, iX + 1] - gly[iY, iX]) + fy * (
                gly[iY + 1, iX + 1] - gly[iY + 1, iX])
            jv_y = (gly[iY + 1, iX] + fx * (gly[iY + 1, iX + 1]
                    - gly[iY + 1, iX])) - (gly[iY, iX] + fx * (
                        gly[iY, iX + 1] - gly[iY, iX]))
            det = ju_x * jv_y - jv_x * ju_y
            du = (FX * jv_y - FY * jv_x) / det
            dv = (FY * ju_x - FX * ju_y) / det
            upd = idx[live]
            U[upd] = U[upd] - du[live]
            V[upd] = V[upd] - dv[live]
        return (U * 4.0).reshape(shape), (V * 4.0).reshape(shape)


class _UtmRef:
    """UTM golden: the Karney 2011 Krueger series (third flattening,
    order n^6) restated with the engine's documented elementwise
    expression sequence (identical doubles; independent code), over
    the synth_utm dyadic chip georeferencing."""

    _A = 6378137.0
    _F = 1.0 / 298.257223563

    def __init__(self, i: int, w: int, h: int):
        f = self._F
        self.e2 = f * (2.0 - f)
        self.e1 = np.sqrt(self.e2)
        n = f / (2.0 - f)
        self.a1 = self._A / (1.0 + n) * (
            1.0 + n ** 2 / 4.0 + n ** 4 / 64.0 + n ** 6 / 256.0)
        self.alpha = (
            n / 2 - 2 * n ** 2 / 3 + 5 * n ** 3 / 16 + 41 * n ** 4 / 180
            - 127 * n ** 5 / 288 + 7891 * n ** 6 / 37800,
            13 * n ** 2 / 48 - 3 * n ** 3 / 5 + 557 * n ** 4 / 1440
            + 281 * n ** 5 / 630 - 1983433 * n ** 6 / 1935360,
            61 * n ** 3 / 240 - 103 * n ** 4 / 140 + 15061 * n ** 5 / 26880
            + 167603 * n ** 6 / 181440,
            49561 * n ** 4 / 161280 - 179 * n ** 5 / 168
            + 6601661 * n ** 6 / 7257600,
            34729 * n ** 5 / 80640 - 3418889 * n ** 6 / 1995840,
            212378941 * n ** 6 / 319334400,
        )
        self.beta = (
            n / 2 - 2 * n ** 2 / 3 + 37 * n ** 3 / 96 - n ** 4 / 360
            - 81 * n ** 5 / 512 + 96199 * n ** 6 / 604800,
            n ** 2 / 48 + n ** 3 / 15 - 437 * n ** 4 / 1440
            + 46 * n ** 5 / 105 - 1118711 * n ** 6 / 3870720,
            17 * n ** 3 / 480 - 37 * n ** 4 / 840 - 209 * n ** 5 / 4480
            + 5569 * n ** 6 / 90720,
            4397 * n ** 4 / 161280 - 11 * n ** 5 / 504
            - 830251 * n ** 6 / 7257600,
            4583 * n ** 5 / 161280 - 108847 * n ** 6 / 3991680,
            20648693 * n ** 6 / 638668800,
        )
        zone = 11 + (i % 3)
        self.lon0 = 6.0 * zone - 183.0
        self.e0 = 320000.0 + ((i * 7) % 64) * 4096.0
        self.n0 = 3600000.0 + ((i * 11) % 64) * 4096.0
        self.gsd = 16.0
        self.w, self.h = w, h

    def _taup(self, tau):
        sig = np.sinh(self.e1 * np.arctanh(
            self.e1 * tau / np.hypot(1.0, tau)))
        return tau * np.hypot(1.0, sig) - sig * np.hypot(1.0, tau)

    def fwd_corners(self, pixel, line):
        """pixel-space corners -> (lon, lat) via the TM inverse."""
        E = self.e0 + self.gsd * np.asarray(pixel, np.float64)
        N = self.n0 + self.gsd * self.h - self.gsd * np.asarray(
            line, np.float64)
        xi = N / (0.9996 * self.a1)
        eta = (E - 500000.0) / (0.9996 * self.a1)
        xi_p, eta_p = xi, eta
        for j in range(6):
            a2j = 2.0 * (j + 1)
            xi_p = xi_p - self.beta[j] * np.sin(a2j * xi) * np.cosh(
                a2j * eta)
            eta_p = eta_p - self.beta[j] * np.cos(a2j * xi) * np.sinh(
                a2j * eta)
        sinh_eta = np.sinh(eta_p)
        cos_xi = np.cos(xi_p)
        taup = np.sin(xi_p) / np.hypot(sinh_eta, cos_xi)
        e2m = 1.0 - self.e2
        tau = taup / e2m
        for _ in range(5):
            taupa = self._taup(tau)
            dtau = ((taup - taupa) * (1.0 + e2m * tau * tau)
                    / (e2m * np.hypot(1.0, tau) * np.hypot(1.0, taupa)))
            tau = tau + dtau
            if np.all(np.abs(dtau) < 1e-14 * np.maximum(
                    1.0, np.abs(tau))):
                break
        lat = np.degrees(np.arctan(tau))
        lon = self.lon0 + np.degrees(np.arctan2(sinh_eta, cos_xi))
        return lon, lat

    def inv_grid(self, lon, lat):
        """(lon, lat) grid -> source pixel coords via the TM forward."""
        latr = np.radians(np.asarray(lat, np.float64))
        lonr = np.radians(np.asarray(lon, np.float64) - self.lon0)
        taup = self._taup(np.tan(latr))
        coslon = np.cos(lonr)
        xi_p = np.arctan2(taup, coslon)
        eta_p = np.arcsinh(np.sin(lonr) / np.hypot(taup, coslon))
        xi, eta = xi_p, eta_p
        for j in range(6):
            a2j = 2.0 * (j + 1)
            xi = xi + self.alpha[j] * np.sin(a2j * xi_p) * np.cosh(
                a2j * eta_p)
            eta = eta + self.alpha[j] * np.cos(a2j * xi_p) * np.sinh(
                a2j * eta_p)
        E = 500000.0 + 0.9996 * self.a1 * eta
        N = 0.0 + 0.9996 * self.a1 * xi
        sp = (E - self.e0) / self.gsd
        sl = (self.n0 + self.gsd * self.h - N) / self.gsd
        return sp, sl

    # composed chain (UTM -> lon/lat -> EPSG:3857): the mercator legs
    # restate the gdal2tiles.py:422-441 closed forms EXACTLY (shared
    # expression contract with functions/mercator.py)
    def chain_fwd_corners(self, pixel, line):
        lon, lat = self.fwd_corners(pixel, line)
        mx = np.asarray(lon, np.float64) * ORIGIN_SHIFT / 180.0
        my = np.log(np.tan((90.0 + np.asarray(lat, np.float64))
                           * np.pi / 360.0)) / (np.pi / 180.0)
        my = my * ORIGIN_SHIFT / 180.0
        return mx, my

    def chain_inv_grid(self, mx, my):
        lon = (np.asarray(mx, np.float64) / ORIGIN_SHIFT) * 180.0
        lat = (np.asarray(my, np.float64) / ORIGIN_SHIFT) * 180.0
        lat = (
            180.0
            / np.pi
            * (2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)
        )
        return self.inv_grid(lon, lat)


def _sum_preserve_ref(px: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sum-preserving 3857->4326 warp golden: the engine's documented
    banded-scatter contract restated (deterministic np.add.at, no
    BLAS), mercator closed forms from gdal2tiles.py:422-441."""
    h, w = px.shape[:2]
    lon0 = (minx / ORIGIN_SHIFT) * 180.0
    lon1 = (maxx / ORIGIN_SHIFT) * 180.0

    def to_lat(my):
        lat = (np.asarray(my, np.float64) / ORIGIN_SHIFT) * 180.0
        return 180.0 / np.pi * (
            2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0)

    lat0 = float(to_lat(miny))
    lat1 = float(to_lat(maxy))
    res_x = (maxx - minx) / w
    res_y = (maxy - miny) / h
    dres_x = (lon1 - lon0) / w
    dres_y = (lat1 - lat0) / h
    ex_m = minx + np.arange(w + 1) * res_x
    ey_m = maxy - np.arange(h + 1) * res_y
    ex = (ex_m / ORIGIN_SHIFT) * 180.0
    ey = to_lat(ey_m)
    ex_px = (np.asarray(ex, np.float64) - lon0) / dres_x
    ey_px = (lat1 - np.asarray(ey, np.float64)) / dres_y

    def band_w(edges, m):
        e0, e1 = edges[:-1], edges[1:]
        base = np.floor(e0).astype(np.int64)
        width = e1 - e0
        wts, idxs = [], []
        for k in range(3):
            j = base + k
            ov = np.minimum(e1, j + 1.0) - np.maximum(e0, j)
            wt = np.maximum(ov, 0.0) / width
            wt[(j < 0) | (j >= m)] = 0.0
            wts.append(wt)
            idxs.append(np.clip(j, 0, m - 1))
        return idxs, wts

    xi, xw = band_w(ex_px, w)
    yi, yw = band_w(ey_px, h)
    src = px.astype(np.float64)
    out = np.zeros((h, w, px.shape[2]), np.float64)
    for ky in range(3):
        if not np.any(yw[ky] > 0):
            continue
        for kx in range(3):
            if not np.any(xw[kx] > 0):
                continue
            contrib = src * (yw[ky][:, None, None] * xw[kx][None, :, None])
            np.add.at(out, (yi[ky][:, None], xi[kx][None, :]), contrib)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


class _ConicRef:
    """Conic/polar projected-CRS golden (LCC 2SP / Albers / polar
    stereographic): the Snyder 1987 closed forms (eq. 15-1..15-11,
    14-1..14-12 + 3-16, 21-33..21-41 + 7-9) restated with the engine's
    documented elementwise expression sequence (identical doubles;
    independent code), over the synth_lcc/synth_albers/synth_stere
    dyadic chip georeferencing fixtures."""

    _A = 6378137.0
    _F = 1.0 / 298.257223563
    _F_GRS80 = 1.0 / 298.257222101  # NAD83/ETRS89/RGF93 codes

    def __init__(self, i: int, w: int, h: int, mode: str):
        f = self._F
        self.e2 = f * (2.0 - f)
        self.e1 = np.sqrt(self.e2)
        self.mode = mode
        self.w, self.h = w, h
        if mode == "epsg":
            # EPSG-registry tag: chip i cycles Lambert-93 (2154,
            # GRS80) / Conus Albers (5070, GRS80) / NSIDC north
            # (3413, WGS84); georef = synth_epsg restated (dyadic
            # offsets around the floor-snapped forward of the
            # registry sample point).
            code = (2154, 5070, 3413)[i % 3]
            if code in (2154, 5070):
                f = self._F_GRS80
                self.e2 = f * (2.0 - f)
                self.e1 = np.sqrt(self.e2)
            dx = (((i * 7) % 64) - 32) * 4096.0
            dy = (((i * 11) % 64) - 32) * 4096.0
            if code == 2154:
                lat1, lat2, lat0, lon0 = 49.0, 44.0, 46.5, 3.0
                self.fe, self.fn = 700000.0, 6600000.0
                self.lon0 = lon0
                p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
                t1, t2, t0 = self._t(p1), self._t(p2), self._t(p0)
                m1, m2 = self._m(p1), self._m(p2)
                self.n = (np.log(m1) - np.log(m2)) / (
                    np.log(t1) - np.log(t2))
                self.Fc = 1.0 * (m1 / (self.n * t1 ** self.n))
                self.rho0 = self._A * self.Fc * t0 ** self.n
                slon, slat = 2.35, 48.85
                phi = np.radians(np.float64(slat))
                theta = self.n * np.radians(np.float64(slon) - lon0)
                rho = self._A * self.Fc * self._t(phi) ** self.n
                ax = self.fe + rho * np.sin(theta)
                ay = self.fn + self.rho0 - rho * np.cos(theta)
                self.mode = "lcc"
            elif code == 5070:
                lat1, lat2, lat0, lon0 = 29.5, 45.5, 23.0, -96.0
                self.fe, self.fn = 0.0, 0.0
                self.lon0 = lon0
                p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
                m1, m2 = self._m(p1), self._m(p2)
                q1, q2, q0 = self._q(p1), self._q(p2), self._q(p0)
                self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
                self.C = m1 * m1 + self.n * q1
                self.rho0 = self._A * np.sqrt(
                    self.C - self.n * q0) / self.n
                slon, slat = -96.0, 38.0
                phi = np.radians(np.float64(slat))
                theta = self.n * np.radians(np.float64(slon) - lon0)
                rho = self._A * np.sqrt(
                    self.C - self.n * self._q(phi)) / self.n
                ax = self.fe + rho * np.sin(theta)
                ay = self.fn + self.rho0 - rho * np.cos(theta)
                self.mode = "albers"
            else:  # 3413 stere north (WGS84)
                self.fe, self.fn = 0.0, 0.0
                self.lon0 = -45.0
                pts = np.radians(70.0)
                self.mc = self._m(pts)
                self.tc = self._t(pts)
                slon, slat = -45.0, 75.0
                phi = np.radians(np.float64(slat))
                lam = np.radians(np.float64(slon) - self.lon0)
                t = self._t(phi)
                rho = self._A * self.mc * t / self.tc
                ax = self.fe + rho * np.sin(lam)
                ay = self.fn + (-rho * np.cos(lam))
                self.mode = "stere"
            self.x0 = float(np.floor(float(ax) / 4096.0) * 4096.0) + dx
            self.y0 = float(np.floor(float(ay) / 4096.0) * 4096.0) + dy
            self.gsd = 16.0
            return
        if mode == "lcc":
            lat1, lat2, lat0, lon0 = 49.0, 44.0, 46.5, 3.0
            self.fe, self.fn = 700000.0, 6600000.0
            self.lon0 = lon0
            p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
            t1, t2, t0 = self._t(p1), self._t(p2), self._t(p0)
            m1, m2 = self._m(p1), self._m(p2)
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
            self.Fc = m1 / (self.n * t1 ** self.n)
            self.rho0 = self._A * self.Fc * t0 ** self.n
            self.x0 = 700000.0 + (((i * 7) % 64) - 32) * 4096.0
            self.y0 = 6600000.0 + (((i * 11) % 64) - 32) * 4096.0
        elif mode == "albers":
            lat1, lat2, lat0, lon0 = 29.5, 45.5, 23.0, -96.0
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = lon0
            p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
            m1, m2 = self._m(p1), self._m(p2)
            q1, q2, q0 = self._q(p1), self._q(p2), self._q(p0)
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
            self.C = m1 * m1 + self.n * q1
            self.rho0 = self._A * np.sqrt(self.C - self.n * q0) / self.n
            self.x0 = -256000.0 + ((i * 13) % 64) * 4096.0
            self.y0 = 1792000.0 + ((i * 5) % 64) * 4096.0
        elif mode == "stere":  # north, lat_ts=70, lon0=-45
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = -45.0
            pts = np.radians(70.0)
            self.mc = self._m(pts)
            self.tc = self._t(pts)
            self.x0 = -512000.0 + ((i * 9) % 64) * 4096.0
            self.y0 = -2304000.0 + ((i * 3) % 64) * 4096.0
        elif mode == "sinu":
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = 0.0
            self.x0 = 400000.0 + (((i * 7) % 64) - 32) * 4096.0
            self.y0 = 4800000.0 + (((i * 11) % 64) - 32) * 4096.0
        elif mode == "eqc":
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = 0.0
            p1 = np.radians(30.0)
            s1 = np.sin(p1)
            self.nu1cos = self._A * np.cos(p1) / np.sqrt(
                1.0 - self.e2 * s1 * s1)
            self.x0 = -131072.0 + ((i * 13) % 64) * 4096.0
            self.y0 = 4700000.0 + ((i * 5) % 64) * 4096.0
        elif mode == "aeqd":  # spherical oblique, center (40, -100)
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = -100.0
            p0 = np.radians(40.0)
            self.sin0a, self.cos0a = np.sin(p0), np.cos(p0)
            self.x0 = -262144.0 + ((i * 7) % 64) * 4096.0
            self.y0 = -131072.0 + ((i * 11) % 64) * 4096.0
        elif mode == "ortho":
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = -100.0
            p0 = np.radians(40.0)
            self.sin0a, self.cos0a = np.sin(p0), np.cos(p0)
            self.x0 = -131072.0 + ((i * 13) % 64) * 4096.0
            self.y0 = -262144.0 + ((i * 5) % 64) * 4096.0
        elif mode == "gnom":
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = -100.0
            p0 = np.radians(40.0)
            self.sin0a, self.cos0a = np.sin(p0), np.cos(p0)
            self.x0 = -196608.0 + ((i * 9) % 64) * 4096.0
            self.y0 = -196608.0 + ((i * 3) % 64) * 4096.0
        else:  # moll (spherical on a)
            self.fe, self.fn = 0.0, 0.0
            self.lon0 = 0.0
            self.x0 = -1048576.0 + ((i * 9) % 64) * 4096.0
            self.y0 = 4500000.0 + ((i * 3) % 64) * 4096.0
        if mode in ("sinu", "eqc"):
            e2 = self.e2
            self.m0 = 1.0 - e2 / 4.0 - 3.0 * e2 ** 2 / 64.0 \
                - 5.0 * e2 ** 3 / 256.0
            self.m2 = 3.0 * e2 / 8.0 + 3.0 * e2 ** 2 / 32.0 \
                + 45.0 * e2 ** 3 / 1024.0
            self.m4 = 15.0 * e2 ** 2 / 256.0 + 45.0 * e2 ** 3 / 1024.0
            self.m6 = 35.0 * e2 ** 3 / 3072.0
            self.e1r = (1.0 - np.sqrt(1.0 - e2)) / (1.0 + np.sqrt(1.0 - e2))
        self.gsd = 16.0

    def _t(self, phi):
        esin = self.e1 * np.sin(phi)
        return (np.tan(np.pi / 4.0 - phi / 2.0)
                / ((1.0 - esin) / (1.0 + esin)) ** (self.e1 / 2.0))

    def _m(self, phi):
        s = np.sin(phi)
        return np.cos(phi) / np.sqrt(1.0 - self.e2 * s * s)

    def _q(self, phi):
        s = np.sin(phi)
        esin = self.e1 * s
        return (1.0 - self.e2) * (
            s / (1.0 - self.e2 * s * s)
            - (1.0 / (2.0 * self.e1))
            * np.log((1.0 - esin) / (1.0 + esin)))

    def _phi_t(self, t):
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(15):
            esin = self.e1 * np.sin(phi)
            phi_new = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - esin) / (1.0 + esin)) ** (self.e1 / 2.0))
            if np.all(np.abs(phi_new - phi) < 1e-14):
                phi = phi_new
                break
            phi = phi_new
        return phi

    def _phi_q(self, q):
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(15):
            s = np.sin(phi)
            esin = self.e1 * s
            one = 1.0 - self.e2 * s * s
            dphi = (one * one / (2.0 * np.cos(phi))) * (
                q / (1.0 - self.e2)
                - s / one
                + (1.0 / (2.0 * self.e1))
                * np.log((1.0 - esin) / (1.0 + esin)))
            phi = phi + dphi
            if np.all(np.abs(dphi) < 1e-14):
                break
        return phi

    def _m_arc(self, phi):
        return self._A * (self.m0 * phi - self.m2 * np.sin(2.0 * phi)
                          + self.m4 * np.sin(4.0 * phi)
                          - self.m6 * np.sin(6.0 * phi))

    def _phi_m(self, M):
        """Series footpoint + two Newton steps (the engine's
        documented sequence — identical doubles)."""
        mu = M / (self._A * self.m0)
        e1 = self.e1r
        phi = (mu
               + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0)
               * np.sin(2.0 * mu)
               + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
               * np.sin(4.0 * mu)
               + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
               + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu))
        for _ in range(2):
            s = np.sin(phi)
            rho = self._A * (1.0 - self.e2) / (
                1.0 - self.e2 * s * s) ** 1.5
            phi = phi + (M - self._m_arc(phi)) / rho
        return phi

    def _theta_moll(self, phi):
        rhs = np.pi * np.sin(phi)
        th2 = 2.0 * np.asarray(phi, np.float64).copy()
        for _ in range(20):
            f = th2 + np.sin(th2) - rhs
            d = 1.0 + np.cos(th2)
            step = np.where(d > 1e-12, f / np.maximum(d, 1e-12), 0.0)
            th2 = th2 - step
            if np.all(np.abs(step) < 1e-14):
                break
        return th2 / 2.0

    def fwd_corners(self, pixel, line):
        """pixel-space corners -> (lon, lat) via the projection
        INVERSE."""
        E = self.x0 + self.gsd * np.asarray(pixel, np.float64)
        N = self.y0 + self.gsd * self.h - self.gsd * np.asarray(
            line, np.float64)
        if self.mode in ("aeqd", "ortho", "gnom"):
            x = (E - self.fe) / self._A
            y = (N - self.fn) / self._A
            rho = np.hypot(x, y)
            if self.mode == "ortho":
                c = np.arcsin(np.clip(rho, -1.0, 1.0))
            elif self.mode == "gnom":
                c = np.arctan(rho)
            else:
                c = rho
            sinc = np.sin(c)
            cosc = np.cos(c)
            ok = rho > 1e-12
            r1 = np.where(ok, rho, 1.0)
            phi = np.arcsin(np.clip(
                cosc * self.sin0a
                + np.where(ok, y * sinc * self.cos0a / r1, 0.0),
                -1.0, 1.0))
            lam = np.arctan2(x * sinc,
                             r1 * self.cos0a * cosc
                             - y * self.sin0a * sinc)
            lam = np.where(ok, lam, 0.0)
            return self.lon0 + np.degrees(lam), np.degrees(phi)
        if self.mode == "sinu":
            x = E - self.fe
            y = N - self.fn
            phi = self._phi_m(y)
            s = np.sin(phi)
            lam = x * np.sqrt(1.0 - self.e2 * s * s) / (
                self._A * np.cos(phi))
            return self.lon0 + np.degrees(lam), np.degrees(phi)
        if self.mode == "eqc":
            x = E - self.fe
            y = N - self.fn
            phi = self._phi_m(y)
            return (self.lon0 + np.degrees(x / self.nu1cos),
                    np.degrees(phi))
        if self.mode == "moll":
            x = E - self.fe
            y = N - self.fn
            th = np.arcsin(np.clip(
                y / (np.sqrt(2.0) * self._A), -1.0, 1.0))
            phi = np.arcsin(np.clip(
                (2.0 * th + np.sin(2.0 * th)) / np.pi, -1.0, 1.0))
            lam = np.pi * x / (
                2.0 * np.sqrt(2.0) * self._A * np.cos(th))
            return self.lon0 + np.degrees(lam), np.degrees(phi)
        if self.mode == "lcc":
            x = E - self.fe
            y = self.rho0 - (N - self.fn)
            sgn = 1.0 if self.n >= 0 else -1.0
            rho = sgn * np.hypot(x, y)
            t = (rho / (self._A * self.Fc)) ** (1.0 / self.n)
            theta = np.arctan2(sgn * x, sgn * y)
            lat = np.degrees(self._phi_t(t))
            lon = self.lon0 + np.degrees(theta / self.n)
        elif self.mode == "albers":
            x = E - self.fe
            y = self.rho0 - (N - self.fn)
            sgn = 1.0 if self.n >= 0 else -1.0
            rho = np.hypot(x, y)
            q = (self.C - (rho * self.n / self._A) ** 2) / self.n
            theta = np.arctan2(sgn * x, sgn * y)
            lat = np.degrees(self._phi_q(q))
            lon = self.lon0 + np.degrees(theta / self.n)
        else:  # stere north
            x = E - self.fe
            y = N - self.fn
            rho = np.hypot(x, y)
            t = rho * self.tc / (self._A * self.mc)
            phi = self._phi_t(t)
            lat = np.degrees(phi)
            lam = np.arctan2(x, -y)
            lon = self.lon0 + np.degrees(lam)
        return lon, lat

    def inv_grid(self, lon, lat):
        """(lon, lat) grid -> source pixel coords via the projection
        FORWARD."""
        if self.mode in ("aeqd", "ortho", "gnom"):
            phi = np.radians(np.asarray(lat, np.float64))
            dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
            sphi = np.sin(phi)
            cphi = np.cos(phi)
            cdl = np.cos(dlam)
            cosc = self.sin0a * sphi + self.cos0a * cphi * cdl
            if self.mode == "ortho":
                kp = np.ones_like(cosc)
            elif self.mode == "gnom":
                kp = 1.0 / cosc
            else:
                c = np.arccos(np.clip(cosc, -1.0, 1.0))
                sinc = np.sin(c)
                kp = np.where(sinc > 1e-12,
                              c / np.where(sinc > 1e-12, sinc, 1.0),
                              1.0)
            E = self.fe + self._A * kp * cphi * np.sin(dlam)
            N = self.fn + self._A * kp * (self.cos0a * sphi
                                          - self.sin0a * cphi * cdl)
            sp = (E - self.x0) / self.gsd
            sl = (self.y0 + self.gsd * self.h - N) / self.gsd
            return sp, sl
        if self.mode == "sinu":
            phi = np.radians(np.asarray(lat, np.float64))
            dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
            s = np.sin(phi)
            E = self.fe + self._A * dlam * np.cos(phi) / np.sqrt(
                1.0 - self.e2 * s * s)
            N = self.fn + self._m_arc(phi)
            sp = (E - self.x0) / self.gsd
            sl = (self.y0 + self.gsd * self.h - N) / self.gsd
            return sp, sl
        if self.mode == "eqc":
            phi = np.radians(np.asarray(lat, np.float64))
            dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
            E = self.fe + self.nu1cos * dlam
            N = self.fn + self._m_arc(phi)
            sp = (E - self.x0) / self.gsd
            sl = (self.y0 + self.gsd * self.h - N) / self.gsd
            return sp, sl
        if self.mode == "moll":
            phi = np.radians(np.asarray(lat, np.float64))
            dlam = np.radians(np.asarray(lon, np.float64) - self.lon0)
            th = self._theta_moll(phi)
            E = self.fe + (2.0 * np.sqrt(2.0) / np.pi) * self._A \
                * dlam * np.cos(th)
            N = self.fn + np.sqrt(2.0) * self._A * np.sin(th)
            sp = (E - self.x0) / self.gsd
            sl = (self.y0 + self.gsd * self.h - N) / self.gsd
            return sp, sl
        if self.mode == "lcc":
            phi = np.radians(np.asarray(lat, np.float64))
            theta = self.n * np.radians(
                np.asarray(lon, np.float64) - self.lon0)
            rho = self._A * self.Fc * self._t(phi) ** self.n
            E = self.fe + rho * np.sin(theta)
            N = self.fn + self.rho0 - rho * np.cos(theta)
        elif self.mode == "albers":
            phi = np.radians(np.asarray(lat, np.float64))
            theta = self.n * np.radians(
                np.asarray(lon, np.float64) - self.lon0)
            rho = self._A * np.sqrt(
                self.C - self.n * self._q(phi)) / self.n
            E = self.fe + rho * np.sin(theta)
            N = self.fn + self.rho0 - rho * np.cos(theta)
        else:  # stere north
            phi = np.radians(np.asarray(lat, np.float64))
            lam = np.radians(np.asarray(lon, np.float64) - self.lon0)
            t = self._t(phi)
            rho = self._A * self.mc * t / self.tc
            E = self.fe + rho * np.sin(lam)
            N = self.fn + -rho * np.cos(lam)
        sp = (E - self.x0) / self.gsd
        sl = (self.y0 + self.gsd * self.h - N) / self.gsd
        return sp, sl


class _NtvRef:
    """NTv2 grid-shift datum golden: restates the fixture grid node
    formulas, the child-over-parent subgrid selection, the documented
    bilinear sequence and the fixed-4-step iterative inverse with
    independent code (identical doubles; the engine additionally
    round-trips the grid through a real .gsb file — float32 nodes are
    dyadic, so the file quantization is exact on both sides).  Chip
    georeferencing restates functions.proj.synth_ntv2."""

    def __init__(self, i: int, w: int, h: int):
        self.w, self.h = w, h
        self.lon0 = -117.5 + ((i * 7) % 16) * 0.25
        self.lat0 = 42.5 + ((i * 11) % 16) * 0.1875
        self.gsd = 1.0 / 512.0
        r, c = np.meshgrid(np.arange(17), np.arange(25), indexing="ij")
        base_la = ((((3 * r + 5 * c) % 17) - 8).astype(np.float64)
                   * 4.0).astype(np.float32).astype(np.float64)
        base_lo = ((((7 * r + 11 * c) % 13) - 6).astype(np.float64)
                   * 4.0).astype(np.float32).astype(np.float64)
        r, c = np.meshgrid(np.arange(9), np.arange(17), indexing="ij")
        ch_la = (((((5 * r + 7 * c) % 19) - 9).astype(np.float64) * 2.0
                  + 8.0)).astype(np.float32).astype(np.float64)
        ch_lo = (((((11 * r + 3 * c) % 23) - 11).astype(np.float64) * 2.0
                  - 4.0)).astype(np.float32).astype(np.float64)
        # (s_lat, n_lat, e_long, w_long, inc, nrows, ncols, la, lo) —
        # seconds, lon positive west; LAST containing subgrid wins
        self.subs = (
            (151200.0, 165600.0, 403200.0, 424800.0, 900.0, 17, 25,
             base_la, base_lo),
            (156600.0, 160200.0, 410400.0, 417600.0, 450.0, 9, 17,
             ch_la, ch_lo),
        )

    def _shift(self, lon, lat):
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        lon_w = lon * -3600.0
        lat_s = lat * 3600.0
        dla = np.zeros(lon.shape, np.float64)
        dlo = np.zeros(lon.shape, np.float64)
        for (s_lat, n_lat, e_long, w_long, inc, nrows, ncols,
             gla, glo) in self.subs:
            inside = ((lat_s >= s_lat) & (lat_s <= n_lat)
                      & (lon_w >= e_long) & (lon_w <= w_long))
            if not inside.any():
                continue
            tw = (lon_w - e_long) / inc
            ty = (lat_s - s_lat) / inc
            c0 = np.clip(np.floor(tw), 0, ncols - 2).astype(np.int64)
            r0 = np.clip(np.floor(ty), 0, nrows - 2).astype(np.int64)
            fx = tw - c0
            fy = ty - r0
            va = (gla[r0, c0] * (1.0 - fy) * (1.0 - fx)
                  + gla[r0, c0 + 1] * (1.0 - fy) * fx
                  + gla[r0 + 1, c0] * fy * (1.0 - fx)
                  + gla[r0 + 1, c0 + 1] * fy * fx)
            vo = (glo[r0, c0] * (1.0 - fy) * (1.0 - fx)
                  + glo[r0, c0 + 1] * (1.0 - fy) * fx
                  + glo[r0 + 1, c0] * fy * (1.0 - fx)
                  + glo[r0 + 1, c0 + 1] * fy * fx)
            dla = np.where(inside, va, dla)
            dlo = np.where(inside, vo, dlo)
        return dla, dlo

    def fwd_corners(self, pixel, line):
        """pixel-space corners -> target-datum (lon, lat) via the
        forward shift."""
        lon = self.lon0 + self.gsd * np.asarray(pixel, np.float64)
        lat = (self.lat0 + self.gsd * self.h
               - self.gsd * np.asarray(line, np.float64))
        dla, dlo = self._shift(lon, lat)
        return lon - dlo / 3600.0, lat + dla / 3600.0

    def inv_grid(self, lon, lat):
        """target-datum grid -> source pixel coords via the fixed-4
        iterative inverse."""
        lon = np.asarray(lon, np.float64)
        lat = np.asarray(lat, np.float64)
        lon_it = lon.copy()
        lat_it = lat.copy()
        for _ in range(4):
            dla, dlo = self._shift(lon_it, lat_it)
            lon_it = lon + dlo / 3600.0
            lat_it = lat - dla / 3600.0
        sp = (lon_it - self.lon0) / self.gsd
        sl = (self.lat0 + self.gsd * self.h - lat_it) / self.gsd
        return sp, sl


def q58_gcp_warp(sf_dir: str) -> pd.DataFrame:
    """GCP warp suite golden: 'poly1' = order-1 fit by normal
    equations over the dyadic affine GCP spec; 'tps' = thin-plate
    spline (Gaussian-elimination solve) over the same GCPs with the
    dyadic non-affine bump; dst grid from forward-mapped pixel-space
    corners, inverse-mapped bilinear sampling."""
    df = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    ids, tags, csr, csg, csb = [], [], [], [], []
    for row, px in _iter_chips(df):
        i = int(row.image_id[3:])
        w, h = int(row.w), int(row.h)
        a = 0.75 + (i % 8) / 32.0
        b = ((i % 5) - 2) / 16.0
        d = ((i % 7) - 3) / 16.0
        e = 0.8125 + (i % 6) / 32.0
        gsd = (row.maxx - row.minx) / w
        pp = np.array([0.0, w / 2.0, float(w)] * 3)
        ll = np.repeat([0.0, h / 2.0, float(h)], 3)
        gx = row.minx + (a * pp + b * ll) * gsd
        gy = row.miny + (d * pp + e * ll) * gsd
        # TPS gets the bumped GCPs (q58 query _bump_gcps spec)
        k = np.arange(9)
        p_idx, l_idx = k % 3, k // 3
        bgx = gx + gsd * (((3 * p_idx + 5 * l_idx + i) % 7) - 3) / 8.0
        bgy = gy + gsd * (((2 * p_idx + 7 * l_idx + i) % 5) - 2) / 8.0

        # polyref corruption spec (shared contract): GCP i%9 shifted
        # +32/-16 gsd; outlier removal at tolerance 8*gsd
        j_bad = i % 9
        cgx, cgy = gx.copy(), gy.copy()
        cgx[j_bad] += 32.0 * gsd
        cgy[j_bad] -= 16.0 * gsd

        for tag in ("poly1", "poly0", "polyref", "tps", "rpc", "rpc_dem",
                    "geoloc", "utm", "utmchain", "lcc", "albers", "stere",
                    "sinu", "eqc", "moll", "aeqd", "ortho", "gnom",
                    "ntv2", "epsg", "sumpres"):
            if tag == "sumpres":
                # sum-preserving 3857->4326 warp: banded fractional-
                # overlap scatter of source pixels (GWKSumPreserving
                # separable collapse), mercator closed forms restated
                out = _sum_preserve_ref(
                    px, row.minx, row.miny, row.maxx, row.maxy)
                if row.fmt == "qraw":
                    out = _qraw_model(out)
                ids.append(row.image_id)
                tags.append(tag)
                csr.append(_cs_band(out[:, :, 0]))
                csg.append(_cs_band(out[:, :, 1]))
                csb.append(_cs_band(out[:, :, 2]))
                continue
            if tag == "poly1":
                fwd = _fit_poly_ref(pp, ll, gx, gy, 1)
                inv = _fit_poly_ref(gx, gy, pp, ll, 1)
            elif tag == "poly0":
                # auto-order restated (gdal_crs.cpp:202-210): 9 GCPs
                # -> order 2, fitted on the BUMPED (non-affine) GCPs
                fwd = _fit_poly_ref(pp, ll, bgx, bgy, 2)
                inv = _fit_poly_ref(bgx, bgy, pp, ll, 2)
            elif tag == "polyref":
                # independent remove_outliers: iterate normal-equations
                # order-1 fits, dropping the worst residual >= 8*gsd
                kp, kl, kx, ky = pp.copy(), ll.copy(), cgx.copy(), cgy.copy()
                while len(kp) > 4:
                    f = _fit_poly_ref(kp, kl, kx, ky, 1)
                    ex, ey = f(kp, kl)
                    res = np.hypot(ex - kx, ey - ky)
                    res[res < 1.19209290e-07] = 0.0
                    worst, diff = -1, -1.0
                    for q, r in enumerate(res):
                        if r > diff and r >= 8.0 * gsd:
                            worst, diff = q, r
                    if worst == -1:
                        break
                    keep = np.arange(len(kp)) != worst
                    kp, kl, kx, ky = kp[keep], kl[keep], kx[keep], ky[keep]
                fwd = _fit_poly_ref(kp, kl, kx, ky, 1)
                inv = _fit_poly_ref(kx, ky, kp, kl, 1)
            elif tag == "tps":
                fwd = _TpsRef(pp, ll, bgx, bgy)
                inv = _TpsRef(bgx, bgy, pp, ll)
            elif tag in ("rpc", "rpc_dem"):  # corners via iterative
                # INVERSE, grid via FORWARD (DEM-backed for rpc_dem)
                ref = _RpcRef(i, w, h) if tag == "rpc" else \
                    _RpcDemRef(i, w, h)
                fwd = ref.inv_points
                inv = ref.fwd_grid
            elif tag == "utm":  # TM-inverse corners, TM-forward grid
                ref = _UtmRef(i, w, h)
                fwd = ref.fwd_corners
                inv = ref.inv_grid
            elif tag == "utmchain":  # composed UTM -> lon/lat -> 3857
                ref = _UtmRef(i, w, h)
                fwd = ref.chain_fwd_corners
                inv = ref.chain_inv_grid
            elif tag in ("lcc", "albers", "stere", "sinu", "eqc",
                         "moll", "aeqd", "ortho", "gnom",
                         "epsg"):                 # projected families:
                # projection-inverse corners, forward grid
                ref = _ConicRef(i, w, h, tag)
                fwd = ref.fwd_corners
                inv = ref.inv_grid
            elif tag == "ntv2":  # grid-shift datum: forward-shift
                # corners, fixed-4 iterative-inverse grid
                ref = _NtvRef(i, w, h)
                fwd = ref.fwd_corners
                inv = ref.inv_grid
            else:  # geoloc arrays: forward corners, Newton-inverse grid
                ref = _GeolocRef(i, w, h, row.minx, row.miny,
                                 row.maxx, row.maxy)
                fwd = ref.forward
                inv = ref.inverse
            cx, cy = fwd(
                np.array([0.0, float(w), float(w), 0.0]),
                np.array([0.0, 0.0, float(h), float(h)]),
            )
            minx, maxx = float(np.min(cx)), float(np.max(cx))
            miny, maxy = float(np.min(cy)), float(np.max(cy))
            X = minx + (np.arange(w) + 0.5) * ((maxx - minx) / w)
            Y = maxy - (np.arange(h) + 0.5) * ((maxy - miny) / h)
            XX, YY = np.meshgrid(X, Y)
            sp, sl = inv(XX, YY)
            out = _bilinear_grid_ref(px, sp - 0.5, sl - 0.5)
            if row.fmt == "qraw":
                out = _qraw_model(out)
            ids.append(row.image_id)
            tags.append(tag)
            csr.append(_cs_band(out[:, :, 0]))
            csg.append(_cs_band(out[:, :, 1]))
            csb.append(_cs_band(out[:, :, 2]))
    return pd.DataFrame(
        {
            "image_id": ids,
            "transformer": tags,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


# ---------------------------------------------------- q59 cutline warp


def _cutline_mask_ref(poly_x, poly_y, X, Y):
    """Even-odd parity mask at pixel centers (cutline spec restated)."""
    h, w = len(Y), len(X)
    inside = np.zeros((h, w), dtype=bool)
    n = len(poly_x)
    for k in range(n):
        x1, y1 = poly_x[k], poly_y[k]
        x2, y2 = poly_x[(k + 1) % n], poly_y[(k + 1) % n]
        crosses = (y1 <= Y) != (y2 <= Y)
        if not crosses.any():
            continue
        xint = x1 + (Y - y1) * (x2 - x1) / (y2 - y1)
        inside ^= crosses[:, None] & (X[None, :] < xint[:, None])
    return inside


def q59_cutline_warp(sf_dir: str) -> pd.DataFrame:
    """q25's exact 3857->4326 bilinear warp + the hexagon cutline spec
    of the q59 query (parity mask at dst pixel centers).  qraw chips
    take the lossy model twice: once for the warped store, once for the
    masked re-store (masked zeros become the model's 4)."""
    df = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    ids, csr, csg, csb = [], [], [], []

    def to_lat(my):
        lat = (np.asarray(my, np.float64) / ORIGIN_SHIFT) * 180.0
        return 180.0 / np.pi * (
            2.0 * np.arctan(np.exp(lat * np.pi / 180.0)) - np.pi / 2.0
        )

    def to_my(lat):
        my = np.log(np.tan((90.0 + np.asarray(lat, np.float64)) * np.pi / 360.0)) / (
            np.pi / 180.0
        )
        return my * ORIGIN_SHIFT / 180.0

    ang = 2.0 * np.pi * np.arange(6) / 6
    ca, sa = np.cos(ang), np.sin(ang)
    for row, px in _iter_chips(df):
        i = int(row.image_id[3:])
        w, h = int(row.w), int(row.h)
        dminx = (row.minx / ORIGIN_SHIFT) * 180.0
        dmaxx = (row.maxx / ORIGIN_SHIFT) * 180.0
        dminy = float(to_lat(row.miny))
        dmaxy = float(to_lat(row.maxy))
        res_x = (row.maxx - row.minx) / w
        res_y = (row.maxy - row.miny) / h
        dres_x = (dmaxx - dminx) / w
        dres_y = (dmaxy - dminy) / h
        xs = dminx + (np.arange(w) + 0.5) * dres_x
        ys = dmaxy - (np.arange(h) + 0.5) * dres_y
        sx_m = xs * ORIGIN_SHIFT / 180.0
        sy_m = to_my(ys)
        src_x = (sx_m - row.minx) / res_x - 0.5
        src_y = (row.maxy - sy_m) / res_y - 0.5
        out = _sample_bilinear(px, src_x, src_y)
        if row.fmt == "qraw":
            out = _qraw_model(out)
        cx = (dminx + dmaxx) * 0.5
        cy = (dminy + dmaxy) * 0.5
        rx = (0.35 + (i % 4) / 32.0) * (dmaxx - dminx)
        ry = (0.35 + (i % 3) / 32.0) * (dmaxy - dminy)
        X = dminx + (np.arange(w) + 0.5) * ((dmaxx - dminx) / w)
        Y = dmaxy - (np.arange(h) + 0.5) * ((dmaxy - dminy) / h)
        m = _cutline_mask_ref(cx + rx * ca, cy + ry * sa, X, Y)
        out = out * m[:, :, None].astype(np.uint8)
        if row.fmt == "qraw":
            out = _qraw_model(out)
        ids.append(row.image_id)
        csr.append(_cs_band(out[:, :, 0]))
        csg.append(_cs_band(out[:, :, 1]))
        csb.append(_cs_band(out[:, :, 2]))
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


GOLDENS = {
    "q29_band_stats_hist": (q29_band_stats_hist, ["kind", "band", "k"]),
    "q58_gcp_warp": (q58_gcp_warp, ["image_id", "transformer"]),
    "q59_cutline_warp": (q59_cutline_warp, ["image_id"]),
    "q52_multimodal_codecs": (q52_multimodal_codecs, ["kind", "media_id", "a"]),
    "q54_grid_metrics": (q54_grid_metrics, ["z", "x", "y"]),
    "q55_color_relief": (q55_color_relief, ["image_id"]),
    "q31_raster_steps": (q31_raster_steps, ["image_id", "op"]),
    "q32_hillshade": (q32_hillshade, ["image_id", "op"]),
    "q35_grid_invdist": (q35_grid_invdist, ["algorithm", "z", "x", "y"]),
    "q37_point_query": (q37_point_query, ["pid", "image_id"]),
    "q39_color_quantize": (q39_color_quantize, ["image_id"]),
    "q44_pansharpen_nearblack": (q44_pansharpen_nearblack, ["image_id"]),
    "q45_viewshed": (q45_viewshed, ["image_id", "mode"]),
    "q25_warp": (q25_warp, ["image_id"]),
}
