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


def _axis_bilinear(coords: np.ndarray, n: int):
    base = np.floor(coords).astype(np.int64)
    idx = np.stack([base, base + 1], axis=1)
    d = coords[:, None] - idx
    w = np.maximum(0.0, 1.0 - np.abs(d))
    s = w.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    w = w / s
    return np.clip(idx, 0, n - 1), w


def _sample_bilinear(img: np.ndarray, src_x: np.ndarray, src_y: np.ndarray):
    h, w = img.shape[:2]
    xi, xw = _axis_bilinear(np.asarray(src_x, np.float64), w)
    yi, yw = _axis_bilinear(np.asarray(src_y, np.float64), h)
    data = img.astype(np.float64)
    gx = data[:, xi, :]
    tmp = np.einsum("hwkc,wk->hwc", gx, xw)
    gy = tmp[yi, :, :]
    out = np.einsum("hkwc,hk->hwc", gy, yw)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _resize_bilinear(img: np.ndarray, out_w: int, out_h: int):
    h, w = img.shape[:2]
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    return _sample_bilinear(img, sx, sy)


# --------------------------------------------------------- q31 translate


def _qraw_model(px: np.ndarray) -> np.ndarray:
    return np.minimum((px >> 3).astype(np.uint16) * 8 + 4, 255).astype(np.uint8)


def q31_translate(sf_dir: str) -> pd.DataFrame:
    """gdal_translate recipe of q31: srcwin (2,2,12,12) -> resize 24x24
    bilinear -> bands [2,1,0] -> scale (0,255)->(30,220), re-encoded in
    the chip's own fmt, then GDAL checksums of the re-decoded output."""
    df = _fixture_images(sf_dir)
    ids, csr, csg, csb = [], [], [], []
    f = (220.0 - 30.0) / max(255.0 - 0.0, 1e-12)
    for row, px in _iter_chips(df):
        img = px[2 : 2 + 12, 2 : 2 + 12]
        img = _resize_bilinear(img, 24, 24)
        img = img[:, :, [2, 1, 0]]
        out = (img.astype(np.float64) - 0.0) * f + 30.0
        img = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
        if row.fmt == "qraw":  # re-encode model (encode->decode round trip)
            img = _qraw_model(img)
        cs = [_cs_band(img[:, :, b]) for b in range(3)]
        ids.append(row.image_id)
        csr.append(cs[0])
        csg.append(cs[1])
        csb.append(cs[2])
    return pd.DataFrame(
        {
            "image_id": ids,
            "cs_r": np.asarray(csr, np.int64),
            "cs_g": np.asarray(csg, np.int64),
            "cs_b": np.asarray(csb, np.int64),
        }
    )


# --------------------------------------------------------- q32 hillshade


def q32_hillshade(sf_dir: str) -> pd.DataFrame:
    """Horn hillshade (apps/gdaldem_lib.cpp:806 formula restated) on
    band 0, az 315 / alt 45, edge-replicated 3x3 window."""
    df = _fixture_images(
        sf_dir, ["image_id", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"]
    )
    ids, css = [], []
    az = np.radians(360.0 - 315.0 + 90.0)
    alt = np.radians(45.0)
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
            az - aspect
        )
        out = np.clip(np.floor(254.0 * np.maximum(shade, 0.0) + 1.5), 1, 255).astype(
            np.uint8
        )
        ids.append(row.image_id)
        css.append(_cs_band(out))
    return pd.DataFrame({"image_id": ids, "cs": np.asarray(css, np.int64)})


GOLDENS = {
    "q29_band_stats": (q29_band_stats, ["band"]),
    "q30_band_histogram": (q30_band_histogram, ["band", "bucket"]),
    "q31_translate": (q31_translate, ["image_id"]),
    "q32_hillshade": (q32_hillshade, ["image_id"]),
}
