"""DEM derivatives — 3x3 window ops per chip (gdaldem analog).

Reference semantics: apps/gdaldem_lib.cpp — generic 3x3 engine
GDALGeneric3x3Processing :318, hillshade :806 (Horn's formula, ZevenbergenThorne
variant), slope :1322 (percent/degrees), aspect :1397, TRI/TPI/roughness
(same file).  Band 0 of each chip is treated as elevation; windows are
fully vectorized numpy with edge replication (the reference computes
edges with duplicated border rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import codecs


def _pad(e: np.ndarray) -> np.ndarray:
    return np.pad(e, 1, mode="edge")


def _horn_gradients(e: np.ndarray, xres: float, yres: float):
    p = _pad(e.astype(np.float64))
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2];                  f = p[1:-1, 2:]
    g = p[2:, :-2];  h = p[2:, 1:-1];  i = p[2:, 2:]
    # Horn's formula (gdaldem_lib.cpp hillshade/slope kernels)
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8 * xres)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8 * yres)
    return dzdx, dzdy


def slope_degrees(e: np.ndarray, xres: float, yres: float) -> np.ndarray:
    dzdx, dzdy = _horn_gradients(e, xres, yres)
    return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))


def aspect_degrees(e: np.ndarray, xres: float, yres: float) -> np.ndarray:
    """Aspect in degrees from north, clockwise (gdaldem aspect
    convention); flat cells -> -9999."""
    dzdx, dzdy = _horn_gradients(e, xres, yres)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    out = np.where(
        asp > 90.0, 450.0 - asp, 90.0 - asp
    )
    out = np.where((dzdx == 0) & (dzdy == 0), -9999.0, out % 360.0)
    return out


def hillshade(
    e: np.ndarray,
    xres: float,
    yres: float,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z_factor: float = 1.0,
) -> np.ndarray:
    """Horn hillshade, Byte output 1..255 (0 reserved), gdaldem rule."""
    dzdx, dzdy = _horn_gradients(e * z_factor, xres, yres)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(np.floor(254.0 * np.maximum(shade, 0.0) + 1.5), 1, 255).astype(
        np.uint8
    )


def tri(e: np.ndarray) -> np.ndarray:
    """Terrain ruggedness: mean |center - neighbor| over the 8 neighbors
    (Wilson variant, the gdaldem TRI default)."""
    p = _pad(e.astype(np.float64))
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += np.abs(p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx] - c)
    return acc / 8.0


def tpi(e: np.ndarray) -> np.ndarray:
    """Topographic position: center minus mean of the 8 neighbors."""
    p = _pad(e.astype(np.float64))
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
    return c - acc / 8.0


def roughness(e: np.ndarray) -> np.ndarray:
    """Max - min over the 3x3 window."""
    p = _pad(e.astype(np.float64))
    mx = np.full(e.shape, -np.inf)
    mn = np.full(e.shape, np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            win = p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
            mx = np.maximum(mx, win)
            mn = np.minimum(mn, win)
    return mx - mn


# ---------------------------------------------------------------------------
# gdaldem variants — the reference's folded-gradient form.
#
# Reference semantics: apps/gdaldem_lib.cpp GDALCreateHillshadeData
# (z_factor = z/8 for Horn, z/2 for Zevenbergen-Thorne, folded into the
# az/alt trig constants), GDALHillshadeAlg :1008, ...CombinedAlg :1140,
# ...MultiDirectionalAlg :1238 (USGS OF 92-422 weights),
# ...IgorAlg :943, GDALSlopeZevenbergenThorneAlg :1368 (and the
# percent slopeFormat), GDALAspectAlg :1417 trigonometric mode.
# A north-up geotransform is assumed (gt1 = xres > 0, gt5 = -yres < 0),
# matching the chip fixtures; row 0 of the decoded array is the first
# scanline, i.e. afWin[0..2].


def _ref_grad(e: np.ndarray, xres: float, yres: float, alg: str = "horn",
              z: float = 1.0):
    """Gradient<T, alg>::calc with the z-factor fold applied: returns
    (xg, yg) = (x, y) * z_factor so every downstream formula uses the
    reference's pre-multiplied constants implicitly."""
    p = _pad(e.astype(np.float64))
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2];                  f = p[1:-1, 2:]
    g = p[2:, :-2];  h = p[2:, 1:-1];  i = p[2:, 2:]
    if alg == "horn":
        xg = (z / 8.0) * (((a + 2 * d + g) - (c + 2 * f + i)) / xres)
        yg = (z / 8.0) * (((g + 2 * h + i) - (a + 2 * b + c)) / -yres)
    elif alg == "zt":
        xg = (z / 2.0) * ((d - f) / xres)
        yg = (z / 2.0) * ((h - b) / -yres)
    else:
        raise ValueError(f"unknown gradient alg {alg}")
    return xg, yg


def _shade_byte(val: np.ndarray) -> np.ndarray:
    return np.clip(np.floor(val + 0.5), 1, 255).astype(np.uint8)


def hillshade_ref(e, xres, yres, azimuth=315.0, altitude=45.0, z=1.0,
                  alg="horn") -> np.ndarray:
    """Standard hillshade in the reference's folded form (equals
    `hillshade` for alg='horn'; the ZT gradient needs this form)."""
    xg, yg = _ref_grad(e, xres, yres, alg, z)
    alt = np.radians(altitude)
    az = np.radians(azimuth)
    num = np.sin(alt) - (yg * np.cos(az) - xg * np.sin(az)) * np.cos(alt)
    cang254 = 254.0 * num / np.sqrt(1.0 + (xg * xg + yg * yg))
    return _shade_byte(np.where(cang254 <= 0.0, 1.0, 1.0 + cang254))


def hillshade_multidirectional(e, xres, yres, altitude=45.0, z=1.0,
                               alg="horn") -> np.ndarray:
    """USGS OF 92-422 multidirectional hillshade: shades from azimuths
    225/270/315/360 weighted by sin^2(aspect - az); flat cells get the
    full sin(alt) shade."""
    xg, yg = _ref_grad(e, xres, yres, alg, z)
    alt = np.radians(altitude)
    s127 = 127.0 * np.sin(alt)
    c127 = 127.0 * np.cos(alt)
    c225_127 = np.cos(np.radians(225.0)) * c127
    xy = xg * xg + yg * yg
    val225 = np.maximum(s127 + (xg - yg) * c225_127, 0.0)
    val270 = np.maximum(s127 - xg * c127, 0.0)
    val315 = np.maximum(s127 + (xg + yg) * c225_127, 0.0)
    val360 = np.maximum(s127 - yg * c127, 0.0)
    w225 = 0.5 * xy - xg * yg
    w270 = xg * xg
    w315 = xy - w225
    w360 = yg * yg
    with np.errstate(invalid="ignore", divide="ignore"):
        cang127 = ((w225 * val225 + w270 * val270 + w315 * val315
                    + w360 * val360) / xy) / np.sqrt(1.0 + xy)
    val = np.where(xy == 0.0, 1.0 + 254.0 * np.sin(alt), 1.0 + cang127)
    return _shade_byte(val)


def hillshade_combined(e, xres, yres, azimuth=315.0, altitude=45.0, z=1.0,
                       alg="horn") -> np.ndarray:
    """Combined (oblique * slope) shading: the incidence angle scaled
    by atan(slope) / (pi/2)^2."""
    xg, yg = _ref_grad(e, xres, yres, alg, z)
    alt = np.radians(altitude)
    az = np.radians(azimuth)
    xy = xg * xg + yg * yg
    num = np.sin(alt) - (yg * np.cos(az) - xg * np.sin(az)) * np.cos(alt)
    cang = np.arccos(np.clip(num / np.sqrt(1.0 + xy), -1.0, 1.0))
    cang = 1.0 - cang * np.arctan(np.sqrt(xy)) * (4.0 / (np.pi * np.pi))
    return _shade_byte(np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang))


def _norm_angle(a, n):
    a = np.fmod(a, n)
    return np.where(a < 0.0, n + a, a)


def _diff_angles(a1, a2, n):
    d = np.abs(_norm_angle(a1, n) - _norm_angle(a2, n))
    return np.where(d > n / 2.0, n - d, d)


def hillshade_igor(e, xres, yres, azimuth=315.0, z=1.0,
                   alg="horn") -> np.ndarray:
    """Igor shading: shadowness = 1 - slopeStrength * aspectStrength;
    the aspect term uses the UNSCALED window sums (reference quirk) and
    the output range is 0..255 (0 is not reserved)."""
    xg, yg = _ref_grad(e, xres, yres, alg, z)
    slope_deg = np.degrees(np.arctan(np.sqrt(xg * xg + yg * yg)))
    p = _pad(e.astype(np.float64))
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2];                  f = p[1:-1, 2:]
    g = p[2:, :-2];  h = p[2:, 1:-1];  i = p[2:, 2:]
    if alg == "horn":
        # aspect = atan2(dy, -dx) with dx = (c+2f+i)-(a+2d+g)
        aspect = np.arctan2((g + 2 * h + i) - (a + 2 * b + c),
                            (a + 2 * d + g) - (c + 2 * f + i))
    else:
        aspect = np.arctan2(h - b, d - f)
    az = np.radians(azimuth)
    aspect_diff = _diff_angles(aspect, np.pi * 3.0 / 2.0 - az, np.pi * 2.0)
    shadow = 1.0 - (slope_deg / 90.0) * (1.0 - aspect_diff / np.pi)
    return np.clip(np.floor(255.0 * shadow + 0.5), 0, 255).astype(np.uint8)


def slope_zt_degrees(e, xres, yres) -> np.ndarray:
    xg, yg = _ref_grad(e, xres, yres, "zt")
    return np.degrees(np.arctan(np.sqrt(xg * xg + yg * yg)))


def slope_percent(e, xres, yres, alg="horn") -> np.ndarray:
    """gdaldem slope -p: 100 * rise/run."""
    xg, yg = _ref_grad(e, xres, yres, alg)
    return 100.0 * np.sqrt(xg * xg + yg * yg)


def aspect_trig_degrees(e, xres, yres) -> np.ndarray:
    """Aspect, trigonometric convention (bAngleAsAzimuth=false):
    counter-clockwise degrees from east, negatives wrapped +360,
    360 -> 0, flat -> -9999."""
    dzdx, dzdy = _horn_gradients(e, xres, yres)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    out = np.where(asp < 0.0, asp + 360.0, asp)
    out = np.where(out == 360.0, 0.0, out)
    return np.where((dzdx == 0) & (dzdy == 0), -9999.0, out)


def aspect_zt_degrees(e, xres, yres) -> np.ndarray:
    """Aspect (azimuth convention) with the Zevenbergen-Thorne
    gradient; flat -> -9999."""
    p = _pad(e.astype(np.float64))
    b = p[:-2, 1:-1]
    d = p[1:-1, :-2]; f = p[1:-1, 2:]
    h = p[2:, 1:-1]
    dx = f - d
    dy = h - b
    asp = np.degrees(np.arctan2(dy, -dx))
    out = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    return np.where((dx == 0) & (dy == 0), -9999.0, out % 360.0)


DEFAULT_RAMP = (
    (0.0, (0, 0, 139)),
    (64.0, (0, 128, 255)),
    (128.0, (34, 139, 34)),
    (192.0, (205, 133, 63)),
    (255.0, (255, 255, 255)),
)


def color_relief(e: np.ndarray, ramp=DEFAULT_RAMP) -> np.ndarray:
    """gdaldem color-relief (apps/gdaldem_lib.cpp:1497): elevation ->
    RGB via linear interpolation between ramp entries."""
    xs = np.asarray([r[0] for r in ramp], np.float64)
    ef = e.astype(np.float64)
    out = np.empty((*e.shape, 3), dtype=np.uint8)
    for c in range(3):
        ys = np.asarray([r[1][c] for r in ramp], np.float64)
        v = np.interp(ef, xs, ys)
        out[:, :, c] = np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)
    return out


def color_relief_stage(images, ramp=DEFAULT_RAMP, concurrency: int = 4):
    """Per-chip color-relief of band 0; output rows (image_id, w, h,
    data RGB bytes)."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        out = []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            out.append(color_relief(img[:, :, 0], ramp).tobytes())
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "w": t.column("w"),
                "h": t.column("h"),
                "data": pa.array(out, pa.binary()),
            }
        )

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)


_OPS = {
    "hillshade": lambda e, xr, yr: hillshade(e, xr, yr),
    "hillshade_md": hillshade_multidirectional,
    "hillshade_combined": hillshade_combined,
    "hillshade_igor": hillshade_igor,
    "hillshade_zt": lambda e, xr, yr: hillshade_ref(e, xr, yr, alg="zt"),
    "slope": slope_degrees,
    "slope_zt": slope_zt_degrees,
    "slope_percent": slope_percent,
    "aspect": aspect_degrees,
    "aspect_trig": aspect_trig_degrees,
    "aspect_zt": aspect_zt_degrees,
    "tri": lambda e, xr, yr: tri(e),
    "tpi": lambda e, xr, yr: tpi(e),
    "roughness": lambda e, xr, yr: roughness(e),
}


class DemStage:
    """Actor-pool stage: apply a DEM op to band 0 of every chip; output
    rows (image_id, op, result bytes float32/uint8 raw + shape)."""

    def __init__(self, op: str = "hillshade"):
        if op not in _OPS:
            raise ValueError(f"unknown dem op {op}; known {sorted(_OPS)}")
        self.op = op
        self.fn = _OPS[op]

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy")
        }
        out_bytes, dtypes = [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            e = img[:, :, 0].astype(np.float64)
            xres = (cols["maxx"][i] - cols["minx"][i]) / cols["w"][i]
            yres = (cols["maxy"][i] - cols["miny"][i]) / cols["h"][i]
            res = self.fn(e, xres, yres)
            if res.dtype == np.uint8:
                out_bytes.append(res.tobytes())
                dtypes.append("uint8")
            else:
                out_bytes.append(res.astype(np.float32).tobytes())
                dtypes.append("float32")
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "op": pa.array([self.op] * t.num_rows, pa.string()),
                "w": t.column("w"),
                "h": t.column("h"),
                "dtype": pa.array(dtypes, pa.string()),
                "data": pa.array(out_bytes, pa.binary()),
            }
        )


def dem_derivative(images, op: str = "hillshade", concurrency: int = 4):
    return images.map_batches(
        DemStage,
        fn_constructor_kwargs=dict(op=op),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


class DemChecksumSuite:
    """Actor-pool stage: decode each chip ONCE, run every requested DEM
    op on band 0 and emit (image_id, op, cs) rows — checksums are
    computed in place so per-op rasters never leave the task (one
    decode per chip for the whole suite, the q52/q58 fusion pattern).
    uint8 results use the integer GDAL checksum, float results the
    float32-cast GDALCopyWords-rounding checksum."""

    def __init__(self, ops):
        from ..functions import checksum as _ck

        unknown = [o for o in ops if o not in _OPS]
        if unknown:
            raise ValueError(f"unknown dem ops {unknown}; known {sorted(_OPS)}")
        self.ops = list(ops)
        self._cs_int = _ck.checksum_band
        self._cs_float = _ck.checksum_float_band

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            c: t.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt",
                      "minx", "miny", "maxx", "maxy")
        }
        ids, ops, css = [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(
                cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i]
            )
            e = img[:, :, 0].astype(np.float64)
            xres = (cols["maxx"][i] - cols["minx"][i]) / cols["w"][i]
            yres = (cols["maxy"][i] - cols["miny"][i]) / cols["h"][i]
            for op in self.ops:
                res = _OPS[op](e, xres, yres)
                if res.dtype == np.uint8:
                    cs = self._cs_int(res)
                else:
                    cs = self._cs_float(res.astype(np.float32))
                ids.append(cols["image_id"][i])
                ops.append(op)
                css.append(cs)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "op": pa.array(ops, pa.string()),
                "cs": pa.array(css, pa.int64()),
            }
        )


def dem_checksum_suite(images, ops=None, concurrency: int = 4):
    """All gdaldem derivative checksums in one decode-once pass."""
    ops = list(_OPS) if ops is None else list(ops)
    return images.map_batches(
        DemChecksumSuite,
        fn_constructor_kwargs=dict(ops=ops),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
