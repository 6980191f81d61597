"""`gdal raster` pixel-step algebra completions: reclassify, unscale,
nodata-to-alpha, color-merge (HSV), stack.

Reference semantics:

- **reclassify** — frmts/vrt/vrtreclassifier.cpp (interval parse
  :81-160 with open/closed brackets realised via ``nextafter``,
  overlap rejection :166-194, binary-search lookup :352, Reclassify
  :398: NO_DATA / DEFAULT sources, NO_DATA / PASS_THROUGH dests, NaN
  routing), pipeline step apps/gdalalg_raster_reclassify.cpp, pixel
  function frmts/vrt/pixelfunctions.cpp:2867 (unmatched value is an
  error).
- **unscale** — gdal_translate -unscale
  (apps/gdalalg_raster_unscale.cpp → apps/gdal_translate_lib.cpp):
  ``out = v * scale + offset`` per band, float32 output.
- **nodata-to-alpha** — apps/gdalalg_raster_nodata_to_alpha.cpp: with
  a per-band nodata tuple (NODATA_VALUES semantics,
  gcore/gdalnodatavaluesmaskband.cpp) a pixel is transparent only
  when ALL bands equal their nodata value; alpha band 0/255.
- **color-merge** — apps/gdalalg_raster_color_merge.cpp:134-230
  (``rgb_to_hs`` / ``hsv_to_rgb`` float32 math derived from
  hsv_merge.py): keep hue+saturation of the RGB input, replace the
  HSV value channel with the grayscale band.
- **stack** — apps/gdalalg_raster_stack.cpp: band concatenation of
  aligned inputs.

All stages are vectorized ``map_batches`` over pyarrow chip batches
(no per-pixel Python in any hot path; reclassify lookup is one
``np.searchsorted`` per chip).  The two-input stages (color-merge,
stack) join their sides by image_id through the engine's
co-partitioned equi-join — ONE shuffle, then the per-chip merge runs
inside the partition group.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions import codecs, kernels

# --------------------------------------------------------------- reclassify


class MappingParseError(ValueError):
    pass


def _parse_number(s: str, pos: int) -> tuple[float, int]:
    t = s[pos:].lstrip()
    pos += len(s[pos:]) - len(t)
    low = t.lower()
    if low.startswith("-inf"):
        return -math.inf, pos + 4
    if low.startswith("inf"):
        return math.inf, pos + 3
    j = 0
    while j < len(t) and (t[j] in "+-.eE0123456789"):
        # stop if 'e'/'E' is not part of an exponent (defensive)
        j += 1
    if j == 0:
        raise MappingParseError(f"expected number at ...{t[:12]!r}")
    return float(t[:j]), pos + j


def parse_mapping(
    text: str, nodata: float | None = None
) -> dict:
    """Parse a reclassification mapping string
    (``SRC=DST;SRC=DST;...``) into a lookup spec.

    SRC: constant | interval ``[a,b] (a,b) [a,b) (a,b]`` (inf ok) |
    ``NO_DATA`` | ``DEFAULT``.  DST: constant | ``NO_DATA`` |
    ``PASS_THROUGH``.  Open endpoints become the adjacent
    representable double (vrtreclassifier.cpp:150-154), so the lookup
    itself is always closed-interval.
    """
    intervals: list[tuple[float, float, float]] = []  # (min, max, dst) dst NaN => pass-through
    default: float | None = None
    default_pass = False
    nan_value: float | None = None
    nan_pass = False

    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise MappingParseError(f"missing '=' in {part!r}")
        src, dst = part.split("=", 1)
        src, dst = src.strip(), dst.strip()

        # destination
        du = dst.upper()
        if du == "NO_DATA":
            if nodata is None:
                raise MappingParseError(
                    "value mapped to NO_DATA, but nodata is not set"
                )
            dval: float | None = float(nodata)
        elif du == "PASS_THROUGH":
            dval = None
        else:
            dval, j = _parse_number(dst, 0)
            if dst[j:].strip():
                raise MappingParseError(f"trailing text in dest {dst!r}")

        su = src.upper()
        if su == "DEFAULT":
            if dval is None:
                default_pass = True
            else:
                default = dval
            continue
        if su == "NO_DATA":
            if nodata is None:
                raise MappingParseError(
                    "value mapped from NO_DATA, but nodata is not set"
                )
            if isinstance(nodata, float) and math.isnan(nodata):
                if dval is None:
                    nan_pass = True
                else:
                    nan_value = dval
                continue
            lo = hi = float(nodata)
        elif src[:1] in "([":
            open_lo = src[0] == "("
            lo, j = _parse_number(src, 1)
            k = src.find(",", j)
            if k < 0:
                raise MappingParseError(f"expected ',' in interval {src!r}")
            hi, j = _parse_number(src, k + 1)
            tail = src[j:].strip()
            if tail not in (")", "]"):
                raise MappingParseError(f"bad interval close in {src!r}")
            open_hi = tail == ")"
            if open_lo:
                lo = np.nextafter(lo, math.inf)
            if open_hi:
                hi = np.nextafter(hi, -math.inf)
        else:
            lo, j = _parse_number(src, 0)
            if src[j:].strip():
                raise MappingParseError(f"trailing text in source {src!r}")
            hi = lo
        intervals.append((lo, hi, math.nan if dval is None else dval))

    intervals.sort(key=lambda t: t[0])
    for (l0, h0, _), (l1, h1, _) in zip(intervals, intervals[1:]):
        if h0 >= l1:  # sorted by min; closed intervals overlap iff this
            raise MappingParseError(
                f"interval [{l0},{h0}] overlaps [{l1},{h1}]"
            )
    return {
        "mins": np.array([t[0] for t in intervals], np.float64),
        "maxs": np.array([t[1] for t in intervals], np.float64),
        "dsts": np.array([t[2] for t in intervals], np.float64),
        "default": default,
        "default_pass": default_pass,
        "nan_value": nan_value,
        "nan_pass": nan_pass,
    }


def reclassify_array(x: np.ndarray, spec: dict) -> np.ndarray:
    """Vectorized Reclassify (vrtreclassifier.cpp:398): interval
    lookup via searchsorted over the sorted non-overlapping intervals;
    NaN routed to the NaN rule; unmatched values take DEFAULT /
    pass-through or raise (pixelfunctions.cpp:2923)."""
    v = x.astype(np.float64, copy=False).ravel()
    out = np.empty_like(v)
    isnan = np.isnan(v)
    # interval lookup on the non-NaN lanes
    idx = np.searchsorted(spec["maxs"], v, side="left")
    idx_c = np.minimum(idx, max(len(spec["mins"]) - 1, 0))
    if len(spec["mins"]):
        hit = (
            (idx < len(spec["mins"]))
            & (spec["mins"][idx_c] <= v)
            & (v <= spec["maxs"][idx_c])
            & ~isnan
        )
    else:
        hit = np.zeros(v.shape, bool)
    dst = spec["dsts"][idx_c] if len(spec["mins"]) else np.zeros_like(v)
    passthrough = np.isnan(dst)
    out[hit] = np.where(passthrough[hit], v[hit], dst[hit])

    unmatched = ~hit & ~isnan
    if spec["default"] is not None:
        out[unmatched] = spec["default"]
    elif spec["default_pass"]:
        out[unmatched] = v[unmatched]
    elif unmatched.any():
        bad = v[unmatched][0]
        raise ValueError(f"value {bad:g} has no specified mapping")

    if isnan.any():
        if spec["nan_value"] is not None:
            out[isnan] = spec["nan_value"]
        elif spec["nan_pass"]:
            out[isnan] = v[isnan]
        elif spec["default"] is not None:
            out[isnan] = spec["default"]
        elif spec["default_pass"]:
            out[isnan] = v[isnan]
        else:
            raise ValueError("NaN value has no specified mapping")
    return out.reshape(x.shape)


# ----------------------------------------------------------- chip helpers


_META = ("image_id", "bytes", "w", "h", "fmt")


def _decode_batch(t: pa.Table):
    ids = t.column("image_id").to_pylist()
    data = t.column("bytes").to_pylist()
    ws = t.column("w").to_pylist()
    hs = t.column("h").to_pylist()
    fmts = t.column("fmt").to_pylist()
    for i in range(t.num_rows):
        yield ids[i], codecs.decode(data[i], ws[i], hs[i], fmts[i])


def _emit(rows: list[tuple], op: str) -> pa.Table:
    return pa.table(
        {
            "image_id": pa.array([r[0] for r in rows], pa.string()),
            "op": pa.array([op] * len(rows), pa.string()),
            "w": pa.array([r[1] for r in rows], pa.int32()),
            "h": pa.array([r[2] for r in rows], pa.int32()),
            "dtype": pa.array([r[3] for r in rows], pa.string()),
            "data": pa.array([r[4] for r in rows], pa.binary()),
        }
    )


class ReclassifyStage:
    """Actor-pool stage: mapping parsed ONCE in __init__, applied to
    band 0 of every chip; float32 output."""

    def __init__(self, mapping: str, nodata: float | None = None):
        self.spec = parse_mapping(mapping, nodata)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        for iid, img in _decode_batch(t):
            r = reclassify_array(img[:, :, 0], self.spec).astype(np.float32)
            rows.append((iid, img.shape[1], img.shape[0], "float32", r.tobytes()))
        return _emit(rows, "reclassify")


def reclassify_images(images, mapping: str, nodata=None, concurrency=(1, 4)):
    # autoscaling actor pool: min 1 so several pools can coexist in one
    # unioned plan without reserving every CPU (scheduling deadlock)
    return images.map_batches(
        ReclassifyStage,
        fn_constructor_kwargs=dict(mapping=mapping, nodata=nodata),
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )


def unscale_images(images, scale: float, offset: float, concurrency: int = 4):
    """-unscale: out = v * scale + offset (float32, all bands)."""

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for iid, img in _decode_batch(t):
            r = (img.astype(np.float32) * np.float32(scale)) + np.float32(offset)
            rows.append((iid, img.shape[1], img.shape[0], "float32", r.tobytes()))
        return _emit(rows, "unscale")

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)


def nodata_to_alpha_images(images, nodata: tuple, concurrency: int = 4):
    """Alpha band from a per-band nodata tuple: 0 where ALL bands equal
    their nodata value, 255 elsewhere (NODATA_VALUES semantics)."""
    nd = np.asarray(nodata, np.float64)

    def fn(t: pa.Table) -> pa.Table:
        rows = []
        for iid, img in _decode_batch(t):
            eq = (img.astype(np.float64) == nd[None, None, : img.shape[2]]).all(axis=2)
            alpha = np.where(eq, 0, 255).astype(np.uint8)
            rows.append((iid, img.shape[1], img.shape[0], "uint8", alpha.tobytes()))
        return _emit(rows, "nodata_to_alpha")

    return images.map_batches(fn, batch_format="pyarrow", batch_size=128)


# ----------------------------------------------------------- color merge


def rgb_to_hs(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Vectorized rgb_to_hs (gdalalg_raster_color_merge.cpp:134):
    float32 h,s in [0,1]; the maxc==b branch takes priority, then
    maxc==g, else the r branch (exact branch order of the scalar
    code)."""
    ri = r.astype(np.int32)
    gi = g.astype(np.int32)
    bi = b.astype(np.int32)
    minc = np.minimum(np.minimum(ri, gi), bi)
    maxc = np.maximum(np.maximum(ri, gi), bi)
    d = (maxc - minc).astype(np.int32)
    s = d.astype(np.float32) / np.maximum(1, maxc).astype(np.float32)
    d6 = np.where(d == 0, np.float32(1.0), np.float32(6.0) * d.astype(np.float32))
    h_b = np.float32(4.0) / np.float32(6.0) + (ri - gi).astype(np.float32) / d6
    h_g = np.float32(2.0) / np.float32(6.0) + (bi - ri).astype(np.float32) / d6
    tmp = (gi - bi).astype(np.float32) / d6
    h_r = np.where(tmp < 0, tmp + np.float32(1.0), tmp)
    h = np.where(maxc == bi, h_b, np.where(maxc == gi, h_g, h_r)).astype(np.float32)
    return h, s.astype(np.float32)


def hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray):
    """Vectorized hsv_to_rgb (gdalalg_raster_color_merge.cpp:216):
    v is uint8; p/q/t use the exact float32 + 0.5 truncation cast."""
    hf = h.astype(np.float32)
    sf = s.astype(np.float32)
    vf = v.astype(np.float32)
    i = (np.float32(6.0) * hf).astype(np.int32)
    f = np.float32(6.0) * hf - i.astype(np.float32)
    one = np.float32(1.0)
    half = np.float32(0.5)
    p = (vf * (one - sf) + half).astype(np.uint8)
    q = (vf * (one - sf * f) + half).astype(np.uint8)
    t = (vf * (one - sf * (one - f)) + half).astype(np.uint8)
    vv = v.astype(np.uint8)
    ic = np.clip(i, 0, 5)
    r = np.choose(ic, [vv, q, p, p, t, vv])
    g = np.choose(ic, [t, vv, vv, q, p, p])
    b = np.choose(ic, [p, p, t, vv, vv, q])
    return r, g, b


def _merge_one(color: np.ndarray, gray: np.ndarray) -> np.ndarray:
    h, s = rgb_to_hs(color[:, :, 0], color[:, :, 1], color[:, :, 2])
    r, g, b = hsv_to_rgb(h, s, gray)
    return np.stack([r, g, b], axis=2)


def _join_chips(a, b, num_buckets: int = 64):
    """Co-partition two chip datasets by hash(image_id) BUCKET: one
    shuffle into ``num_buckets`` groups (NOT one group per image — a
    per-image group pays a Python map_groups round per chip, which at
    20k+ chips dominates wall time), then vectorized id-matched
    pairing inside each bucket group."""
    import zlib as _zlib

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("image_id").to_pylist()
            bk = np.array(
                [_zlib.crc32(s.encode()) % num_buckets for s in ids], np.int64
            )
            return pa.table(
                {
                    "image_id": t.column("image_id"),
                    "bytes": t.column("bytes"),
                    "w": t.column("w"),
                    "h": t.column("h"),
                    "fmt": t.column("fmt"),
                    "__side": pa.array(np.full(t.num_rows, side, np.int8)),
                    "__bucket": pa.array(bk),
                }
            )

        return fn

    both = a.map_batches(tag(0), batch_format="pyarrow").union(
        b.map_batches(tag(1), batch_format="pyarrow")
    )
    return both.groupby("__bucket")


def _paired_merge(op: str, merge_fn):
    """Group fn: match side-0/side-1 rows by image_id inside a bucket
    and apply merge_fn(img_a, img_b) per matched pair."""

    def fn(g: pa.Table) -> pa.Table:
        side = g.column("__side").to_numpy(zero_copy_only=False)
        ids = g.column("image_id").to_pylist()
        pos_a = {ids[i]: i for i in np.flatnonzero(side == 0)}
        rows = []
        data = g.column("bytes").to_pylist()
        ws = g.column("w").to_pylist()
        hs = g.column("h").to_pylist()
        fmts = g.column("fmt").to_pylist()

        def dec(i):
            return codecs.decode(data[i], ws[i], hs[i], fmts[i])

        for j in np.flatnonzero(side == 1):
            i = pos_a.get(ids[j])
            if i is None:
                continue
            out = merge_fn(dec(i), dec(j))
            rows.append(
                (ids[j], out.shape[1], out.shape[0], "uint8", out.tobytes())
            )
        return _emit(rows, op)

    return fn


def color_merge_images(color, gray_band, num_buckets: int = 64):
    """HSV merge: hue+saturation from `color`, value from band 0 of
    `gray_band`, paired by image_id (one bucketed co-partition
    shuffle)."""
    return _join_chips(color, gray_band, num_buckets).map_groups(
        _paired_merge("color_merge", lambda a, b: _merge_one(a, b[:, :, 0])),
        batch_format="pyarrow",
    )


def stack_images(a, b, num_buckets: int = 64):
    """Band stack: channels of `a` then channels of `b` (aligned by
    image_id; gdalalg_raster_stack.cpp band concat)."""
    return _join_chips(a, b, num_buckets).map_groups(
        _paired_merge("stack", lambda x, y: np.concatenate([x, y], axis=2)),
        batch_format="pyarrow",
    )


# ----------------------------------------------------- fused step suite


class RasterStepSuite:
    """One-decode-per-chip fused evaluation of the whole step suite
    (translate + reclassify + unscale + nodata-to-alpha + color-merge
    + self-stack), emitting (image_id, op, cs) rows directly.

    The driver-facing q31 query uses this fused actor stage so every
    chip is decoded ONCE (the naive composition decodes 8x and pays a
    per-image map_groups round for the two-input ops); the general
    distributed operators above remain the public API for heterogenous
    inputs and are covered by tests/test_pixelops.py.
    """

    def __init__(self, mapping: str, translate_kwargs: dict,
                 unscale_scale: float, unscale_offset: float,
                 n2a_nodata: tuple,
                 calc_expr: str = "clip((A + 2*B + C) / 4 + sqrt(A)"
                                  " - B % 7, 0, 255)"):
        from ..functions import checksum
        from ..functions.exprcalc import CalcExpr
        from .translate import TranslateChips

        self.spec = parse_mapping(mapping)
        self.calc = CalcExpr(calc_expr)  # compiled once per actor
        self.translate = TranslateChips(**translate_kwargs)
        self.us = np.float32(unscale_scale)
        self.uo = np.float32(unscale_offset)
        self.nd = np.asarray(n2a_nodata, np.float64)
        self.cs_band = checksum.checksum_band
        self.cs_float = checksum.checksum_float_band

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("image_id").to_pylist()
        data = t.column("bytes").to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        fmts = t.column("fmt").to_pylist()
        envs = None
        if "minx" in t.column_names:
            envs = [
                (
                    t.column("minx")[i].as_py(),
                    t.column("miny")[i].as_py(),
                    t.column("maxx")[i].as_py(),
                    t.column("maxy")[i].as_py(),
                )
                for i in range(t.num_rows)
            ]
        out_i, out_o, out_c = [], [], []

        def add(iid, op, cs):
            out_i.append(iid)
            out_o.append(op)
            out_c.append(int(cs))

        for i in range(t.num_rows):
            img = codecs.decode(data[i], ws[i], hs[i], fmts[i])
            iid = ids[i]
            # translate (physical codec round-trip in the chip's fmt)
            tr, _ = self.translate._one(
                img, envs[i] if envs else (0.0, 0.0, float(ws[i]), float(hs[i]))
            )
            if tr is not None:
                dec = codecs.decode(
                    codecs.encode(tr, fmts[i]), tr.shape[1], tr.shape[0], fmts[i]
                )
                add(iid, "translate_r", self.cs_band(dec[:, :, 0]))
                add(iid, "translate_g", self.cs_band(dec[:, :, 1]))
                add(iid, "translate_b", self.cs_band(dec[:, :, 2]))
            # reclassify band 0 -> float32
            rec = reclassify_array(img[:, :, 0], self.spec).astype(np.float32)
            add(iid, "reclassify", self.cs_float(rec))
            # unscale all bands -> float32
            un = img.astype(np.float32) * self.us + self.uo
            add(iid, "unscale", sum(
                self.cs_float(un[:, :, b]) for b in range(un.shape[2])
            ))
            # nodata-to-alpha
            eq = (img.astype(np.float64) == self.nd[None, None, : img.shape[2]]).all(axis=2)
            add(iid, "nodata_to_alpha", self.cs_band(
                np.where(eq, 0, 255).astype(np.uint8)
            ))
            # color-merge with own band 0 as value channel
            cm = _merge_one(img, img[:, :, 0])
            add(iid, "color_merge", sum(
                self.cs_band(cm[:, :, b]) for b in range(3)
            ))
            # self-stack: 6 identical-pair bands
            add(iid, "stack", 2 * sum(
                self.cs_band(img[:, :, b]) for b in range(3)
            ))
            # gdal raster calc: compiled band-math expression over the
            # chip's bands (A=band0, B=band1, C=band2), float64 result
            add(iid, "calc", self.cs_float(
                self.calc(img[:, :, 0], img[:, :, 1], img[:, :, 2])
            ))
            # gdal raster create + update (apps/gdalalg_raster_create
            # .cpp / _update.cpp): blank canvas (h+8, w+8) initialized
            # to burn value 7, the chip composited at offset (4, 4) —
            # the create-then-update-window workflow as one fused op
            H, W = img.shape[0], img.shape[1]
            canvas = np.full((H + 8, W + 8, img.shape[2]), 7, np.uint8)
            canvas[4 : 4 + H, 4 : 4 + W] = img
            add(iid, "create_update", sum(
                self.cs_band(canvas[:, :, b]) for b in range(canvas.shape[2])
            ))
            # gdal raster pixel-info: packed RGB at 5 deterministic
            # pixel positions (k=1..5), summed
            pix = 0
            for k in range(1, 6):
                yy, xx = (H * k) // 7 % H, (W * k) // 5 % W
                pix += (
                    int(img[yy, xx, 0]) * 65536
                    + int(img[yy, xx, 1]) * 256
                    + int(img[yy, xx, 2])
                )
            add(iid, "pixel_info", pix)
            # area-aggregating resamplers (-r average/rms/sum/min/max/
            # med/q1/q3/mode, GWKAverageOrModeThread): exact 2x
            # downscale over the even-cropped chip — integral boxes,
            # so every aggregate is integer-exact and the checksum is
            # solver-order independent
            h2, w2 = img.shape[0] // 2, img.shape[1] // 2
            ac = img[: h2 * 2, : w2 * 2]
            for m in kernels.AREA_METHODS:
                out = kernels.resample_area(ac, w2, h2, m)
                if m == "sum":  # float-typed op: no byte rounding
                    add(iid, f"area_{m}", sum(
                        self.cs_float(out[:, :, b].astype(np.float32))
                        for b in range(out.shape[2])
                    ))
                else:
                    add(iid, f"area_{m}", sum(
                        self.cs_band(out[:, :, b]) for b in range(out.shape[2])
                    ))
        return pa.table(
            {
                "image_id": pa.array(out_i, pa.string()),
                "op": pa.array(out_o, pa.string()),
                "cs": pa.array(out_c, pa.int64()),
            }
        )


def raster_step_suite(images, mapping: str, translate_kwargs: dict,
                      unscale_scale: float, unscale_offset: float,
                      n2a_nodata: tuple, concurrency=(1, 12)):
    return images.map_batches(
        RasterStepSuite,
        fn_constructor_kwargs=dict(
            mapping=mapping,
            translate_kwargs=translate_kwargs,
            unscale_scale=unscale_scale,
            unscale_offset=unscale_offset,
            n2a_nodata=n2a_nodata,
        ),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
