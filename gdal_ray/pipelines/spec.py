"""Serialized pipeline spec — the GDALG / `gdal raster pipeline` analog.

The reference serializes a CLI pipeline as JSON and replays it lazily
on open (frmts/gdalg/gdalgdriver.cpp:24,222; step chaining
apps/gdalalg_raster_pipeline.cpp:286-298; step registry
gcore/gdalalgorithm.h:2239 GDALAlgorithmRegistry).  Here a pipeline is
a JSON list of registered steps applied to a lazy Dataset — the
engine's user-extension surface: ``register_step`` adds new operators
(plain callables: (Dataset, params) -> Dataset).

Example spec:
    [
      {"step": "read_images", "path": ".../images"},
      {"step": "filter_envelope", "minx": 0, "miny": 0,
       "maxx": 1e6, "maxy": 1e6},
      {"step": "assign_cells", "zoom": 10},
      {"step": "warp", "dst_srs": "EPSG:4326", "resampling": "bilinear"},
      {"step": "write_parquet", "path": "/tmp/out"}
    ]
"""

from __future__ import annotations

import json
from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    """Decorator: register a pipeline step (the GDALAlgorithmRegistry
    analog; UDF hook for users)."""

    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def list_steps() -> list[str]:
    return sorted(_REGISTRY)


def run_pipeline(spec: list[dict] | str, ds=None):
    """Apply a (JSON) step list; returns the resulting Dataset (lazy
    unless a sink step consumed it)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    for step in spec:
        params = dict(step)
        name = params.pop("step")
        if name not in _REGISTRY:
            raise KeyError(f"unknown pipeline step {name!r}; known: {list_steps()}")
        ds = _REGISTRY[name](ds, **params)
    return ds


# ------------------------------------------------------- built-in steps


@register_step("read_images")
def _read_images(ds, path: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


@register_step("read_parquet")
def _read_parquet(ds, path: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


@register_step("filter_envelope")
def _filter_envelope(ds, minx, miny, maxx, maxy):
    from ..stages.cells import envelope_filter

    return ds.map_batches(
        envelope_filter(minx, miny, maxx, maxy), batch_format="pyarrow"
    )


@register_step("assign_cells")
def _assign_cells(ds, zoom: int):
    from ..stages.cells import cover_envelope_cells

    return ds.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")


@register_step("warp")
def _warp(ds, dst_srs="EPSG:4326", src_srs="EPSG:3857", resampling="bilinear",
          concurrency=4):
    from ..stages.warp import warp_images

    return warp_images(ds, src_srs, dst_srs, resampling, concurrency=concurrency)


@register_step("tiles")
def _tiles(ds, zoom: int, resampling="near"):
    from ..stages.tiles import build_base_tiles

    return build_base_tiles(ds, zoom, resampling)


@register_step("select")
def _select(ds, columns):
    return ds.select_columns(columns)


@register_step("limit")
def _limit(ds, n: int):
    return ds.limit(n)


@register_step("checksum")
def _checksum(ds):
    from ..stages.stats import image_checksums

    return image_checksums(ds)


@register_step("write_parquet")
def _write_parquet(ds, path: str):
    ds.write_parquet(path)
    return ds


@register_step("write_partitioned")
def _write_partitioned(ds, path: str, key_col="cell", shift=6):
    from ..state.checkpoint import write_partitioned

    return write_partitioned(ds, path, key_col=key_col, shift=shift)


# ----------------------------------------------------------------------
# Reference step algebra — one registered step per `gdal raster ...` /
# `gdal vector ...` pipeline step (apps/gdalalg_raster_*.cpp,
# apps/gdalalg_vector_*.cpp in the reference; 46 raster + 30 vector
# step names).  Every step is a thin delegation to the engine's
# distributed stages, so a serialized reference pipeline has a 1:1
# replayable spec here.  Steps that read a second layer take a
# ``path`` (parquet dir) or accept an inline dataset via run_pipeline
# composition.
#
# Input schema conventions (documented per step):
#   chips:  image rows (image_id, bytes, w, h, fmt[, minx..maxy])
#   cells:  rasterized cell rows (cell, grid/packed mask, ...)
#   rings:  polygon rows (fid, xs list<double>, ys list<double>)
#   points: point rows (pid, x, y[, v])


def _read_ds(path: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)


# --------------------------------------------------------- raster steps


def _register_dem(op: str):
    @register_step(f"raster_{op}")
    def step(ds, concurrency: int = 4, _op=op):
        from ..stages.dem import dem_derivative

        return dem_derivative(ds, op=_op, concurrency=concurrency)


for _op in ("hillshade", "hillshade_md", "hillshade_combined",
            "hillshade_igor", "hillshade_zt", "slope", "slope_zt",
            "slope_percent", "aspect", "aspect_trig", "aspect_zt",
            "tri", "tpi", "roughness"):
    _register_dem(_op)


@register_step("raster_color_map")
def _raster_color_map(ds, concurrency: int = 4):
    """color-relief ramp over chips (gdalalg_raster_color_map.cpp)."""
    from ..stages.dem import color_relief_stage

    return color_relief_stage(ds, concurrency=concurrency)


@register_step("raster_clean_collar")
def _raster_clean_collar(ds, near: int = 15, concurrency: int = 4):
    """nearblack analog (gdalalg_raster_clean_collar.cpp)."""
    from ..stages.pansharpen import nearblack_stage

    return nearblack_stage(ds, near=near, concurrency=concurrency)


@register_step("raster_clip")
def _raster_clip(ds, minx, miny, maxx, maxy, concurrency: int = 4):
    """Georeferenced window crop (gdalalg_raster_clip.cpp) — chips
    intersecting the window are cropped to it via the translate
    projwin path; chips outside are dropped."""
    from ..stages.cells import envelope_filter
    from ..stages.translate import translate_images

    ds = ds.map_batches(
        envelope_filter(minx, miny, maxx, maxy), batch_format="pyarrow"
    )
    return translate_images(
        ds, concurrency=concurrency, projwin=(minx, miny, maxx, maxy)
    )


@register_step("raster_convert")
def _raster_convert(ds, fmt: str, concurrency: int = 4, batch_size: int = 128):
    """Codec conversion (gdalalg_raster_convert.cpp): re-encode every
    chip's payload in ``fmt`` (png/raw/qraw/jpeg/webp)."""
    import pyarrow as pa

    from ..functions import codecs

    def fn(t: pa.Table) -> pa.Table:
        data = t.column("bytes").to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        fmts = t.column("fmt").to_pylist()
        out = [
            codecs.encode(codecs.decode(d, w, h, f), fmt)
            for d, w, h, f in zip(data, ws, hs, fmts)
        ]
        i = t.column_names.index("bytes")
        t = t.set_column(i, "bytes", pa.array(out, pa.binary()))
        return t.set_column(
            t.column_names.index("fmt"), "fmt",
            pa.array([fmt] * t.num_rows, pa.string()),
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


@register_step("raster_calc")
def _raster_calc(ds, expr: str, concurrency: int = 4, batch_size: int = 128):
    """Band math (gdalalg_raster_calc.cpp): compiled expression over
    bands A/B/C per chip; result clipped to [0,255], GDAL-rounded
    (floor(x+0.5)) and re-encoded in the chip's fmt."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codecs
    from ..functions.exprcalc import CalcExpr

    class Calc:
        def __init__(self):
            self.expr = CalcExpr(expr)  # compiled once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            data = t.column("bytes").to_pylist()
            ws = t.column("w").to_pylist()
            hs = t.column("h").to_pylist()
            fmts = t.column("fmt").to_pylist()
            out = []
            for d, w, h, f in zip(data, ws, hs, fmts):
                img = codecs.decode(d, w, h, f)
                res = self.expr(
                    *(img[:, :, b] for b in range(len(self.expr.bands)))
                )
                byte = np.clip(np.floor(res + 0.5), 0, 255).astype(np.uint8)
                out.append(codecs.encode(
                    np.repeat(byte[:, :, None], img.shape[2], axis=2), f
                ))
            i = t.column_names.index("bytes")
            return t.set_column(i, "bytes", pa.array(out, pa.binary()))

    return ds.map_batches(
        Calc, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


@register_step("raster_reclassify")
def _raster_reclassify(ds, mapping: str, nodata=None, concurrency=(1, 4)):
    from ..stages.pixelops import reclassify_images

    return reclassify_images(ds, mapping, nodata=nodata, concurrency=concurrency)


@register_step("raster_unscale")
def _raster_unscale(ds, scale: float, offset: float, concurrency: int = 4):
    from ..stages.pixelops import unscale_images

    return unscale_images(ds, scale, offset, concurrency=concurrency)


@register_step("raster_nodata_to_alpha")
def _raster_nodata_to_alpha(ds, nodata, concurrency: int = 4):
    from ..stages.pixelops import nodata_to_alpha_images

    return nodata_to_alpha_images(ds, tuple(nodata), concurrency=concurrency)


@register_step("raster_color_merge")
def _raster_color_merge(ds, gray_path: str, num_buckets: int = 64):
    """HSV color merge with the grayscale layer at ``gray_path``
    (gdalalg_raster_color_merge.cpp); joined on image_id."""
    from ..stages.pixelops import color_merge_images

    return color_merge_images(ds, _read_ds(gray_path), num_buckets=num_buckets)


@register_step("raster_stack")
def _raster_stack(ds, other_path: str, num_buckets: int = 64):
    from ..stages.pixelops import stack_images

    return stack_images(ds, _read_ds(other_path), num_buckets=num_buckets)


@register_step("raster_resize")
def _raster_resize(ds, w: int, h: int, resampling: str = "near",
                   concurrency: int = 4):
    from ..stages.translate import translate_images

    return translate_images(
        ds, concurrency=concurrency, out_size=(w, h), resampling=resampling
    )


@register_step("raster_scale")
def _raster_scale(ds, src_min: float, src_max: float, dst_min: float,
                  dst_max: float, concurrency: int = 4):
    from ..stages.translate import translate_images

    return translate_images(
        ds, concurrency=concurrency, scale=(src_min, src_max, dst_min, dst_max)
    )


@register_step("raster_select")
def _raster_select(ds, bands, concurrency: int = 4):
    """Band select/reorder (gdalalg_raster_select.cpp), 0-based."""
    from ..stages.translate import translate_images

    return translate_images(ds, concurrency=concurrency, bands=list(bands))


@register_step("raster_reproject")
def _raster_reproject(ds, dst_srs="EPSG:4326", src_srs="EPSG:3857",
                      resampling="bilinear", concurrency: int = 4):
    """3857<->4326 closed-form warp, any projected family via
    ``src_srs='family:<lcc|albers|stere|sinu|eqc|moll|...>'``, or ANY
    code in the static EPSG registry (``src_srs='EPSG:2154'`` etc. —
    functions.epsg, the importFromEPSG analog; dst 4326; per-chip
    fixture georeferencing, the q58 transformer contract)."""
    if src_srs.startswith("family:"):
        from ..stages.warp import warp_images_projfam

        return warp_images_projfam(ds, src_srs.split(":", 1)[1],
                                   resampling, concurrency=concurrency)
    if src_srs not in ("EPSG:3857", "EPSG:4326"):
        from ..functions.epsg import resolve_epsg
        from ..stages.warp import warp_images_epsg, warp_images_epsg_pair

        resolve_epsg(src_srs)  # loud unknown-code error up front
        if dst_srs not in ("EPSG:4326",):
            resolve_epsg(dst_srs)
            return warp_images_epsg_pair(ds, src_srs, dst_srs,
                                         resampling,
                                         concurrency=concurrency)
        return warp_images_epsg(ds, src_srs, resampling,
                                concurrency=concurrency)
    from ..stages.warp import warp_images

    return warp_images(ds, src_srs, dst_srs, resampling, concurrency=concurrency)


@register_step("raster_mosaic")
def _raster_mosaic(ds, zoom: int, resampling: str = "near"):
    """Last-wins mosaic onto the tile grid (gdalalg_raster_mosaic.cpp;
    buildvrt overlap rule) — same compose path as base tiles."""
    from ..stages.tiles import build_base_tiles

    return build_base_tiles(ds, zoom, resampling)


@register_step("raster_tile")
def _raster_tile(ds, z_max: int, z_min: int | None = None,
                 resampling: str = "near", checkpoint_dir: str | None = None):
    """Full pyramid (gdalalg_raster_tile.cpp): returns the base level;
    overview levels land in checkpoint_dir when given."""
    from ..stages.tiles import build_pyramid

    levels = build_pyramid(
        ds, z_max=z_max, z_min=z_min if z_min is not None else z_max,
        resampling=resampling, checkpoint_dir=checkpoint_dir,
    )
    return levels[z_max]


@register_step("raster_overview")
def _raster_overview(ds):
    """One overview level up from a tile dataset
    (gdalalg_raster_overview.cpp equivalent for the tile grid)."""
    from ..stages.tiles import build_overview_level

    return build_overview_level(ds)


@register_step("raster_footprint")
def _raster_footprint(ds, zoom: int = 8, resampling: str = "near"):
    from ..stages.polygonize import footprint

    return footprint(ds, zoom=zoom, resampling=resampling)


@register_step("raster_polygonize")
def _raster_polygonize(ds, num_partitions: int = 16):
    from ..stages.polygonize import polygonize

    return polygonize(ds, num_partitions=num_partitions)


@register_step("raster_proximity")
def _raster_proximity(ds, max_dist: float | None = None):
    from ..stages.grid import proximity_cells

    return proximity_cells(ds, max_dist=max_dist)


@register_step("raster_sieve")
def _raster_sieve(ds, threshold: int):
    from ..stages.grid import sieve_cells

    return sieve_cells(ds, threshold)


@register_step("raster_fill_nodata")
def _raster_fill_nodata(ds, max_search: int = 100):
    from ..stages.grid import fillnodata_cells

    return fillnodata_cells(ds, max_search=max_search)


@register_step("raster_contour")
def _raster_contour(ds, zoom: int = 8, grid: int = 64, levels=None,
                    polygons: bool = False, emit: str = "stats"):
    """Envelope rows -> synthetic field cells -> stitched contour
    polylines, or level-band POLYGON rings with ``polygons=True``
    (gdalalg_raster_contour.cpp; -p maps to polygons).  With
    ``polygons=True, emit='wkb'`` the rings carry actual WKB POLYGON
    geometry instead of the deterministic ring statistics."""
    from ..stages.contour import (
        LEVELS,
        contour_cells,
        contour_polygon_cells,
        contour_polygon_rings,
        field_cells,
    )

    if emit not in ("stats", "wkb"):
        raise ValueError(f"raster_contour: unknown emit {emit!r} "
                         "(expected 'stats' or 'wkb')")
    if emit == "wkb" and not polygons:
        raise ValueError(
            "raster_contour: emit='wkb' requires polygons=True "
            "(polyline WKB emission is not implemented)")
    cells = field_cells(ds, zoom=zoom, grid=grid)
    lv = tuple(levels) if levels else LEVELS
    if polygons and emit == "wkb":
        return contour_polygon_rings(cells, levels=lv, grid=grid, zoom=zoom)
    stage = contour_polygon_cells if polygons else contour_cells
    return stage(cells, levels=lv, grid=grid)


@register_step("raster_viewshed")
def _raster_viewshed(ds, obs_height: float = 2.0, algorithm: str = "wang",
                     concurrency: int = 4):
    from ..stages.viewshed import viewshed_stage

    return viewshed_stage(ds, obs_height=obs_height, algorithm=algorithm,
                          concurrency=concurrency)


@register_step("raster_pansharpen")
def _raster_pansharpen(ds, weights=(1 / 3, 1 / 3, 1 / 3),
                       concurrency: int = 4, batch_size: int = 64):
    from ..stages.pansharpen import PansharpenStage

    return ds.map_batches(
        PansharpenStage,
        fn_constructor_kwargs=dict(weights=tuple(weights)),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register_step("raster_rgb_to_palette")
def _raster_rgb_to_palette(ds, n_colors: int = 16, concurrency: int = 4,
                           batch_size: int = 64):
    """Median-cut palette + FS dither per chip
    (gdalalg_raster_rgb_to_palette.cpp; gdalmediancut/gdaldither):
    output rows (image_id, palette bytes, index bytes)."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codecs, colors

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("image_id").to_pylist()
        data = t.column("bytes").to_pylist()
        ws = t.column("w").to_pylist()
        hs = t.column("h").to_pylist()
        fmts = t.column("fmt").to_pylist()
        pals, idxs = [], []
        for d, w, h, f in zip(data, ws, hs, fmts):
            img = codecs.decode(d, w, h, f)
            pal = colors.median_cut_palette(img, n_colors)
            dit = colors.dither_floyd_steinberg_wavefront(img, pal)
            pals.append(pal.astype(np.uint8).tobytes())
            idxs.append(dit.astype(np.uint8).tobytes())
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "palette": pa.array(pals, pa.binary()),
                "indices": pa.array(idxs, pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


@register_step("raster_to_xyz")
def _raster_to_xyz(ds, skip_zero: bool = False, batch_size: int = 16):
    """gdal2xyz analog (osgeo_utils/gdal2xyz.py): one output row per
    pixel with pixel-center geo coordinates and band values; output
    explodes w*h per chip, so batches stay small."""
    from ..stages.translate import xyz_points_batch

    return ds.map_batches(xyz_points_batch(skip_zero),
                          batch_format="pyarrow", batch_size=batch_size)


@register_step("raster_info")
def _raster_info(ds, sample_frac: float | None = None):
    """Band min/max/mean/std summary (gdalalg_raster_info.cpp /
    gdalinfo -stats)."""
    from ..stages.stats import band_statistics

    return band_statistics(ds, sample_frac=sample_frac)


@register_step("raster_index")
def _raster_index(ds, zoom: int = 10):
    """gdaltindex analog: one row per chip with its covering cell and
    envelope — the tile-index manifest layer."""
    from ..stages.cells import cover_envelope_cells

    return ds.drop_columns(["bytes"]).map_batches(
        cover_envelope_cells(zoom), batch_format="pyarrow"
    )


@register_step("raster_edit")
def _raster_edit(ds, a_srs: str | None = None, a_ullr=None):
    """Metadata-only edit (gdalalg_raster_edit.cpp: -a_srs/-a_ullr
    georef override): rewrites srs/envelope columns, pixels untouched."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if a_srs is not None:
            col = pa.array([a_srs] * n, pa.string())
            if "srs" in t.column_names:
                t = t.set_column(t.column_names.index("srs"), "srs", col)
            else:
                t = t.append_column("srs", col)
        if a_ullr is not None:
            ulx, uly, lrx, lry = a_ullr
            for name, v in (("minx", ulx), ("miny", lry),
                            ("maxx", lrx), ("maxy", uly)):
                col = pa.array([float(v)] * n, pa.float64())
                if name in t.column_names:
                    t = t.set_column(t.column_names.index(name), name, col)
                else:
                    t = t.append_column(name, col)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


@register_step("raster_create")
def _raster_create(ds, n: int, w: int, h: int, fill: int = 0,
                   fmt: str = "raw", parallelism: int = 8):
    """Blank-canvas source (gdalalg_raster_create.cpp): n chips of
    w x h x 3 constant ``fill``."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..functions import codecs

    payload = codecs.encode(np.full((h, w, 3), fill, np.uint8), fmt)

    def make(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_pylist()
        return pa.table(
            {
                "image_id": pa.array([f"create_{i}" for i in ids], pa.string()),
                "bytes": pa.array([payload] * len(ids), pa.binary()),
                "w": pa.array([w] * len(ids), pa.int32()),
                "h": pa.array([h] * len(ids), pa.int32()),
                "fmt": pa.array([fmt] * len(ids), pa.string()),
            }
        )

    return rd.range(n, override_num_blocks=parallelism).map_batches(
        make, batch_format="pyarrow"
    )


@register_step("raster_update")
def _raster_update(ds, patch_path: str, xoff: int = 0, yoff: int = 0,
                   num_buckets: int = 64):
    """Composite the patch layer's chips into this layer's canvases at
    (xoff, yoff), joined on image_id (gdalalg_raster_update.cpp)."""
    import numpy as np

    from ..stages.pixelops import _join_chips, _paired_merge

    def merge(canvas: "np.ndarray", patch: "np.ndarray") -> "np.ndarray":
        canvas = canvas.copy()
        ph = min(patch.shape[0], canvas.shape[0] - yoff)
        pw = min(patch.shape[1], canvas.shape[1] - xoff)
        if ph > 0 and pw > 0:
            canvas[yoff:yoff + ph, xoff:xoff + pw] = patch[:ph, :pw]
        return canvas

    return _join_chips(ds, _read_ds(patch_path), num_buckets).map_groups(
        _paired_merge("update", lambda canvas, patch: merge(canvas, patch)),
        batch_format="pyarrow",
    )


@register_step("raster_pixel_info")
def _raster_pixel_info(ds, positions, concurrency: int = 4):
    """Pixel probe (gdalalg_raster_pixel_info.cpp): packed RGB at the
    given (x, y) pixel positions per chip."""
    import pyarrow as pa

    from ..functions import codecs

    pos = [(int(x), int(y)) for x, y in positions]

    def fn(t: pa.Table) -> pa.Table:
        ids, outx, outy, vals = [], [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(
                t.column("bytes")[i].as_py(), t.column("w")[i].as_py(),
                t.column("h")[i].as_py(), t.column("fmt")[i].as_py(),
            )
            iid = t.column("image_id")[i].as_py()
            for x, y in pos:
                if 0 <= y < img.shape[0] and 0 <= x < img.shape[1]:
                    v = (int(img[y, x, 0]) * 65536 + int(img[y, x, 1]) * 256
                         + int(img[y, x, 2]))
                    ids.append(iid)
                    outx.append(x)
                    outy.append(y)
                    vals.append(v)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "x": pa.array(outx, pa.int32()),
                "y": pa.array(outy, pa.int32()),
                "rgb": pa.array(vals, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", concurrency=concurrency)


@register_step("raster_set_type")
def _raster_set_type(ds, dtype: str = "float32"):
    """Pixel type cast (gdalalg_raster_set_type.cpp): decoded pixels
    cast to ``dtype``, stored as raw band-interleaved bytes with the
    dtype recorded."""
    import numpy as np
    import pyarrow as pa

    from ..functions import codecs

    def fn(t: pa.Table) -> pa.Table:
        out = []
        for i in range(t.num_rows):
            img = codecs.decode(
                t.column("bytes")[i].as_py(), t.column("w")[i].as_py(),
                t.column("h")[i].as_py(), t.column("fmt")[i].as_py(),
            )
            out.append(img.astype(np.dtype(dtype)).tobytes())
        t = t.set_column(t.column_names.index("bytes"), "bytes",
                         pa.array(out, pa.binary()))
        return t.set_column(t.column_names.index("fmt"), "fmt",
                            pa.array([f"raw_{dtype}"] * t.num_rows, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------- vector steps


@register_step("vector_filter")
def _vector_filter(ds, where: str, num_partitions: int = 16):
    """Attribute filter with an OGR-SQL WHERE string
    (gdalalg_vector_filter.cpp) — routed through the swq front-end."""
    from .sql import sql_query

    return sql_query(f"SELECT * FROM t WHERE {where}", {"t": ds},
                     num_partitions=num_partitions)


@register_step("vector_sql")
def _vector_sql(ds, sql: str, num_partitions: int = 16, tables=None):
    """Full SQL step (gdalalg_vector_sql.cpp): the flowing dataset is
    table ``t``; extra tables may be given as {name: path}."""
    from .sql import sql_query

    tbls = {"t": ds}
    for name, path in (tables or {}).items():
        tbls[name] = _read_ds(path)
    return sql_query(sql, tbls, num_partitions=num_partitions)


@register_step("vector_select")
def _vector_select(ds, columns):
    return ds.select_columns(list(columns))


@register_step("vector_concat")
def _vector_concat(ds, paths):
    """Layer concat (gdalalg_vector_concat.cpp)."""
    from .relational import concat_layers

    return concat_layers([ds] + [_read_ds(p) for p in paths])


@register_step("vector_buffer")
def _vector_buffer(ds, radius: float, quadseg: int = 8,
                   geometry: str = "points"):
    """gdalalg_vector_buffer.cpp analog: 'points' buffers (px, py)
    rows; 'polygons' runs the round-join offset-curve buffer over
    (fid, xs, ys) ring rows; 'lines' the round-cap corridor buffer
    over (fid, xs, ys) OPEN polyline rows."""
    from ..stages.geomops import (buffer_line_batch, buffer_points_batch,
                                  buffer_polygon_batch)

    if geometry == "polygons":
        return ds.map_batches(buffer_polygon_batch(radius, quadseg),
                              batch_format="pyarrow")
    if geometry == "lines":
        return ds.map_batches(buffer_line_batch(radius, quadseg),
                              batch_format="pyarrow")
    if geometry != "points":
        raise ValueError(f"vector_buffer: unknown geometry {geometry!r}")
    return ds.map_batches(buffer_points_batch(radius, quadseg),
                          batch_format="pyarrow")


_VECTOR_DRIVERS = {
    ".geojson": "geojson", ".json": "geojson", ".shp": "shapefile",
    ".gpkg": "gpkg", ".fgb": "flatgeobuf", ".csv": "csv",
    ".kml": "kml", ".mif": "mif", ".gml": "gml", ".dxf": "dxf",
    ".sql": "pgdump",
}


def _vector_driver_of(path: str, driver: str | None) -> str:
    if driver:
        return driver
    import os

    ext = os.path.splitext(path)[1].lower()
    if ext not in _VECTOR_DRIVERS:
        raise ValueError(
            f"cannot infer vector driver from {path!r}; pass driver= "
            f"(one of {sorted(set(_VECTOR_DRIVERS.values()))})")
    return _VECTOR_DRIVERS[ext]


@register_step("vector_read")
def _vector_read(ds, path: str, driver: str | None = None,
                 layer: str | None = None, bbox=None):
    """Open a vector source in the engine's WKB convention — the
    `gdal vector convert` read half (driver inferred from the
    extension: geojson / shapefile / gpkg / flatgeobuf)."""
    drv = _vector_driver_of(path, driver)
    if drv == "geojson":
        from ..sources.geojson import read_geojson

        return read_geojson(path)
    if drv == "shapefile":
        from ..sources.shapefile import read_shapefile

        return read_shapefile(path)
    if drv == "gpkg":
        from ..sources.gpkg import read_gpkg

        return read_gpkg(path, layer=layer, bbox=bbox)
    if drv == "csv":
        import ray.data as rd

        from ..sources.textvec import read_csv_features

        return rd.from_arrow(read_csv_features(path))
    if drv == "kml":
        import ray.data as rd

        from ..sources.textvec import read_kml

        return rd.from_arrow(read_kml(path))
    if drv in ("mif", "gml", "dxf"):
        import ray.data as rd

        if drv == "mif":
            from ..sources.mif import read_mif as _rd
        elif drv == "gml":
            from ..sources.gml import read_gml as _rd
        else:
            from ..sources.dxf import read_dxf as _rd
        return rd.from_arrow(_rd(path))
    if drv == "pgdump":
        raise ValueError("pgdump is a write-only driver")
    from ..sources.flatgeobuf import read_flatgeobuf

    return read_flatgeobuf(path, bbox=bbox)


@register_step("vector_write")
def _vector_write(ds, path: str, driver: str | None = None,
                  layer: str = "layer", srs_id: int = 4326):
    """Write the WKB-convention Dataset through a vector driver — the
    `gdal vector convert` write half.  GPKG/FlatGeobuf are single-file
    sinks (see their module docstrings); GeoJSON/Shapefile write
    resumable partitioned directories."""
    drv = _vector_driver_of(path, driver)
    if drv == "geojson":
        from ..sources.geojson import write_geojson

        return write_geojson(ds, path)
    if drv == "shapefile":
        from ..sources.shapefile import write_shapefile_sink

        return write_shapefile_sink(ds, path)
    if drv == "gpkg":
        import pyarrow as pa

        from ..sources.gpkg import write_gpkg

        n = write_gpkg(ds, path, layer=layer, srs_id=srs_id)
        import ray.data as rd

        return rd.from_arrow(pa.table({"path": pa.array([path]),
                                       "n": pa.array([n], pa.int64())}))
    if drv in ("csv", "kml", "mif", "gml", "dxf", "pgdump"):
        import pyarrow as pa
        import ray.data as rd

        # text sinks are single-writer (like the gpkg sink): stream
        # batches driver-side into one file
        t = pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow", batch_size=4096))
        if drv == "csv":
            from ..sources.textvec import write_csv_features

            write_csv_features(path, t)
        elif drv == "kml":
            from ..sources.textvec import write_kml

            write_kml(path, t,
                      name_col="name" if "name" in t.column_names
                      else None)
        elif drv == "mif":
            from ..sources.mif import write_mif

            write_mif(path, t)
        elif drv == "gml":
            from ..sources.gml import write_gml

            write_gml(path, t, layer=layer)
        elif drv == "dxf":
            from ..sources.dxf import write_dxf

            write_dxf(path, t)
        else:
            from ..sources.pgdump import write_pgdump

            write_pgdump(path, t, table_name=layer, srid=srs_id)
        return rd.from_arrow(pa.table(
            {"path": pa.array([path]),
             "n": pa.array([t.num_rows], pa.int64())}))
    import pyarrow as pa

    from ..sources.flatgeobuf import write_flatgeobuf

    n = write_flatgeobuf(ds, path, layer=layer, srs_code=srs_id)
    import ray.data as rd

    return rd.from_arrow(pa.table({"path": pa.array([path]),
                                   "n": pa.array([n], pa.int64())}))


@register_step("grid_export")
def _grid_export(ds, path: str, driver: str = "gsbg",
                 resume: bool = True):
    """Bulk grid export: one single-grid file per row through any of
    the format zoo's grid writers (sources.sinks.write_grid_dir) —
    the gdal_translate-of-many analog, resumable."""
    from ..sources.sinks import write_grid_dir

    return write_grid_dir(ds, path, driver=driver, resume=resume)


@register_step("grid_import")
def _grid_import(ds, path: str, parallelism: int = 8):
    """Bulk grid import: a directory of grid files (any registered
    driver, sniffed per file) -> (image_id, grid, w, h, driver)
    rows (sources.sinks.read_grid_dir)."""
    from ..sources.sinks import read_grid_dir

    return read_grid_dir(path, parallelism=parallelism)


@register_step("vector_simplify")
def _vector_simplify(ds, tolerance: float):
    from ..stages.geomops import simplify_batch

    return ds.map_batches(simplify_batch(tolerance), batch_format="pyarrow")


@register_step("vector_segmentize")
def _vector_segmentize(ds, max_length: float):
    from ..stages.geomops import segmentize_batch

    return ds.map_batches(segmentize_batch(max_length), batch_format="pyarrow")


@register_step("vector_swap_xy")
def _vector_swap_xy(ds):
    from ..stages.geomops import swap_xy_batch

    return ds.map_batches(swap_xy_batch, batch_format="pyarrow")


@register_step("vector_make_valid")
def _vector_make_valid(ds):
    from ..stages.geomops import make_valid_batch

    return ds.map_batches(make_valid_batch, batch_format="pyarrow")


@register_step("vector_set_geom_type")
def _vector_set_geom_type(ds):
    from ..stages.geomops import set_geom_type_batch

    return ds.map_batches(set_geom_type_batch, batch_format="pyarrow")


@register_step("vector_explode_collections")
def _vector_explode_collections(ds, offset_x: float = 0.0):
    from ..stages.geomops import explode_two_part_batch

    return ds.map_batches(explode_two_part_batch(offset_x),
                          batch_format="pyarrow")


@register_step("vector_reproject")
def _vector_reproject(ds, src_srs: str = "EPSG:3857",
                      dst_srs: str = "EPSG:4326"):
    """3857->4326 by default; ``src_srs='family:<name>'`` routes
    through the projected-family closed forms (geomops
    reproject_family_batch); any other ``EPSG:NNNN`` resolves through
    the static registry (functions.epsg importFromEPSG analog)."""
    if src_srs.startswith("family:"):
        from ..stages.geomops import reproject_family_batch

        return ds.map_batches(
            reproject_family_batch(src_srs.split(":", 1)[1]),
            batch_format="pyarrow")
    if dst_srs not in ("EPSG:4326",):
        from ..functions.epsg import resolve_epsg
        from ..stages.geomops import reproject_epsg_pair_batch

        resolve_epsg(src_srs)
        resolve_epsg(dst_srs)
        return ds.map_batches(
            reproject_epsg_pair_batch(src_srs, dst_srs),
            batch_format="pyarrow")
    if src_srs not in ("EPSG:3857",):
        from ..functions.epsg import resolve_epsg
        from ..stages.geomops import reproject_epsg_batch

        resolve_epsg(src_srs)  # loud unknown-code error up front
        return ds.map_batches(reproject_epsg_batch(src_srs),
                              batch_format="pyarrow")
    from ..stages.geomops import reproject_batch

    return ds.map_batches(reproject_batch, batch_format="pyarrow")


@register_step("vector_geom")
def _vector_geom(ds, op: str):
    """Geometry scalar dispatcher (gdalalg_vector_geom.cpp subcommands):
    op in centroid | convex_hull | distance."""
    from ..stages import geomops

    fns = {
        "centroid": geomops.centroid_batch,
        "convex_hull": geomops.convex_hull_batch,
        "distance": geomops.distance_point_batch,
    }
    if op not in fns:
        raise ValueError(f"vector_geom op must be one of {sorted(fns)}")
    return ds.map_batches(fns[op], batch_format="pyarrow")


def _register_grid(name: str, algorithm: str):
    @register_step(name)
    def step(ds, zoom: int, value_col: str = "v", grid_size: int = 64,
             _algo=algorithm, **algo_kwargs):
        from ..stages.grid import grid_points

        return grid_points(ds, zoom, algorithm=_algo, value_col=value_col,
                           grid_size=grid_size, **algo_kwargs)


for _name, _algo in (
    ("vector_grid_invdist", "invdist"),
    ("vector_grid_invdistnn", "invdistnn"),
    ("vector_grid_nearest", "nearest"),
    ("vector_grid_average", "average"),
    ("vector_grid_linear", "linear"),
):
    _register_grid(_name, _algo)


@register_step("vector_grid_data_metrics")
def _vector_grid_data_metrics(ds, zoom: int, metric: str = "count",
                              value_col: str = "v", grid_size: int = 64,
                              **algo_kwargs):
    from ..stages.grid import grid_points

    return grid_points(ds, zoom, algorithm=metric, value_col=value_col,
                       grid_size=grid_size, **algo_kwargs)


@register_step("vector_grid")
def _vector_grid(ds, zoom: int, algorithm: str = "invdist",
                 value_col: str = "v", grid_size: int = 64, **algo_kwargs):
    from ..stages.grid import grid_points

    return grid_points(ds, zoom, algorithm=algorithm, value_col=value_col,
                       grid_size=grid_size, **algo_kwargs)


@register_step("vector_rasterize")
def _vector_rasterize(ds, zoom: int, burn_value: int = 1,
                      value_col: str | None = None, all_touched: bool = False):
    from ..stages.rasterize import rasterize_polygons

    return rasterize_polygons(ds, zoom, burn_value=burn_value,
                              value_col=value_col, all_touched=all_touched)


@register_step("vector_clip")
def _vector_clip(ds, clip_path: str, zoom: int = 10, point_id_col: str = "pid"):
    """Clip points by a polygon layer (gdalalg_vector_clip.cpp) — the
    co-partitioned exact semi-join."""
    from ..stages.join import clip_erase_points

    return clip_erase_points(ds, _read_ds(clip_path), zoom=zoom,
                             point_id_col=point_id_col, anti=False)


@register_step("vector_erase")
def _vector_erase(ds, clip_path: str, zoom: int = 10, point_id_col: str = "pid"):
    from ..stages.join import clip_erase_points

    return clip_erase_points(ds, _read_ds(clip_path), zoom=zoom,
                             point_id_col=point_id_col, anti=True)


@register_step("vector_layer_algebra")
def _vector_layer_algebra(ds, other_path: str, op: str = "intersection",
                          zoom: int = 10, fid_col: str = "fid"):
    """7-method layer algebra (gdalalg_vector_layer_algebra.cpp /
    ogrlayer.cpp Intersection..Erase) over rect layers; ``fid_col``
    names each layer's feature id (renamed to the fid_a/fid_b
    convention overlay_layers uses)."""
    from ..stages.join import overlay_layers

    def rn(d, out):
        if fid_col == out:
            return d
        return d.map_batches(
            lambda t, _o=out: t.rename_columns(
                [_o if c == fid_col else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )

    return overlay_layers(rn(ds, "fid_a"), rn(_read_ds(other_path), "fid_b"),
                          op, zoom=zoom)


@register_step("vector_simplify_coverage")
def _vector_simplify_coverage(ds, tolerance: float,
                              preserve_boundary: bool = False):
    from ..stages.coverage import simplify_coverage

    return simplify_coverage(ds, tolerance,
                             preserve_boundary=preserve_boundary)


@register_step("vector_index")
def _vector_index(ds, zoom: int = 10):
    """Cell assignment (the vector tile-index analog)."""
    from ..stages.cells import cover_envelope_cells

    return ds.map_batches(cover_envelope_cells(zoom), batch_format="pyarrow")


@register_step("vector_info")
def _vector_info(ds):
    """Layer summary (gdalalg_vector_info.cpp): feature count + extent."""
    from .relational import global_aggregate

    cols = list(ds.schema().names)
    specs = [(("fid" if "fid" in cols else cols[0]), "count", "n")]
    for c, agg, alias in (("minx", "min", "minx"), ("miny", "min", "miny"),
                          ("maxx", "max", "maxx"), ("maxy", "max", "maxy")):
        if c in cols:
            specs.append((c, agg, alias))
    if "x" in cols:
        specs += [("x", "min", "minx"), ("x", "max", "maxx"),
                  ("y", "min", "miny"), ("y", "max", "maxy")]
    return global_aggregate(ds, specs)


@register_step("vector_edit")
def _vector_edit(ds, rename: dict | None = None, set_const: dict | None = None):
    """Attribute edit (gdalalg_vector_edit.cpp): rename columns and/or
    set constant-valued columns."""
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        if rename:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
        for name, v in (set_const or {}).items():
            col = pa.array([v] * t.num_rows)
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, col)
            else:
                t = t.append_column(name, col)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


@register_step("vector_sample")
def _vector_sample(ds, key_col: str, frac: float):
    """Deterministic hash-Bernoulli sample (the reference's OGRLayer
    random-read sampling analog)."""
    from .relational import sample_hash

    return sample_hash(ds, key_col, frac)


# ------------------------------------------------- mdim steps
#
# The `gdal mdim convert/info` analog (apps/gdalalg_mdim_*.cpp): N-D
# steps thread an (ds, spec) pair through the pipeline as an
# MDimHandle, opened by an mdim_read_* step and consumed by
# mdim_checksums / mdim_write_zarr.


class MDimHandle:
    """Chunk-row Dataset + its MDSpec, threaded between mdim steps."""

    def __init__(self, ds, spec):
        self.ds = ds
        self.spec = spec


def _mdim_handle(ds) -> "MDimHandle":
    if not isinstance(ds, MDimHandle):
        raise TypeError(
            "mdim step needs an MDimHandle input — start the pipeline "
            "with mdim_read_zarr / mdim_read_netcdf")
    return ds


@register_step("mdim_read_zarr")
def _mdim_read_zarr(ds, path: str, parallelism: int = 16):
    from ..sources.zarr import read_zarr

    zds, spec = read_zarr(path, parallelism=parallelism)
    return MDimHandle(zds, spec)


@register_step("mdim_read_netcdf")
def _mdim_read_netcdf(ds, path: str, var: str, slab: int = 0,
                      parallelism: int = 16):
    from ..sources.netcdf import read_netcdf

    nds, spec = read_netcdf(path, var, slab=slab,
                            parallelism=parallelism)
    return MDimHandle(nds, spec)


@register_step("mdim_read_grib2")
def _mdim_read_grib2(ds, path: str, msg: int = 0, slab: int = 0,
                     parallelism: int = 16):
    """One GRIB2 message's (nj, ni) field as mdim chunk rows
    (frmts/grib analog; sources.grib2)."""
    from ..sources.grib2 import read_grib2_mdim

    gds, spec = read_grib2_mdim(path, msg=msg, slab=slab,
                                parallelism=parallelism)
    return MDimHandle(gds, spec)


@register_step("mdim_read_hdf5")
def _mdim_read_hdf5(ds, path: str, name: str, slab: int = 0,
                    parallelism: int = 16):
    """One contiguous HDF5 dataset as mdim chunk rows (frmts/hdf5
    analog; sources.hdf5)."""
    from ..sources.hdf5 import read_hdf5_mdim

    hds, spec = read_hdf5_mdim(path, name, slab=slab,
                               parallelism=parallelism)
    return MDimHandle(hds, spec)


@register_step("mdim_transpose")
def _mdim_transpose(ds, perm):
    from ..stages.mdim import mdim_transpose

    h = _mdim_handle(ds)
    out, spec = mdim_transpose(h.ds, h.spec, tuple(perm))
    return MDimHandle(out, spec)


@register_step("mdim_slice")
def _mdim_slice(ds, ranges):
    from ..stages.mdim import mdim_slice

    h = _mdim_handle(ds)
    out, spec = mdim_slice(h.ds, h.spec,
                           [tuple(r) for r in ranges])
    return MDimHandle(out, spec)


@register_step("mdim_reduce")
def _mdim_reduce(ds, op: str, axis: int):
    from ..stages.mdim import mdim_reduce

    h = _mdim_handle(ds)
    out, spec = mdim_reduce(h.ds, h.spec, op, axis)
    return MDimHandle(out, spec)


@register_step("mdim_resample2x")
def _mdim_resample2x(ds, axes):
    from ..stages.mdim import mdim_resample2x

    h = _mdim_handle(ds)
    out, spec = mdim_resample2x(h.ds, h.spec, tuple(axes))
    return MDimHandle(out, spec)


@register_step("mdim_checksums")
def _mdim_checksums(ds, tag: str = "mdim"):
    from ..stages.mdim import mdim_chunk_checksums

    h = _mdim_handle(ds)
    return mdim_chunk_checksums(h.ds, h.spec, tag)


@register_step("mdim_write_zarr")
def _mdim_write_zarr(ds, path: str, compressor: str | None = "zlib",
                     level: int = 1):
    from ..sources.zarr import write_zarr

    h = _mdim_handle(ds)
    return write_zarr(h.ds, h.spec, path, compressor=compressor,
                      level=level)


@register_step("raster_zonal_stats")
def _raster_zonal_stats(ds, zones_path: str, zoom: int = 10):
    """Zonal statistics (engine addition; the gdal_rasterize +
    band-statistics composition): per-(zone fid, band) n/sum/min/max
    over chips whose pixel centers fall inside the zone polygon."""
    from ..stages.zonal import zonal_statistics

    return zonal_statistics(ds, _read_ds(zones_path), zoom=zoom)

@register_step("mvt_tiles")
def _mvt_tiles(ds, zoom: int = 5, layer: str = "layer",
               buffer_px: int = 64):
    """Polygon layer -> MVT protobuf tiles (the OGR MVT writer,
    ogrmvtdataset.cpp:3323): groupby tile cell, per-tile encode."""
    from ..stages.mvt import write_mvt_tiles

    return write_mvt_tiles(ds, zoom=zoom, layer_name=layer,
                           buffer_px=buffer_px)


@register_step("mvt_read")
def _mvt_read(ds, layer: str | None = None):
    """MVT tiles (z, x, y, mvt_bytes) -> world-coordinate WKB feature
    rows (the OGR MVT reader half, ogrmvtdataset.cpp open/read)."""
    from ..stages.mvt import read_mvt_features

    return read_mvt_features(ds, layer=layer)

@register_step("raster_geoid_shift")
def _raster_geoid_shift(ds, concurrency: int = 4):
    """Vertical (geoid) shift of band values through a real .gtx grid
    (PROJ +vgridshift analog behind ogr/ogrct.cpp 3-D transforms)."""
    from ..stages.warp import geoid_shift_images

    return geoid_shift_images(ds, concurrency=concurrency)

@register_step("write_geoparquet")
def _write_geoparquet(ds, path: str, geometry_column: str = "wkb"):
    """GeoParquet 1.0 sink (ogr/ogrsf_frmts/parquet write half): one
    partial pass computes geometry types + global bbox, every file
    carries the 'geo' schema metadata."""
    import ray.data as rd

    from ..sources.geoparquet import write_geoparquet

    meta = write_geoparquet(ds, path, geometry_column)
    import json

    return rd.from_items([{"path": path,
                           "geo": json.dumps(meta)}])


@register_step("read_geoparquet")
def _read_geoparquet(ds, path: str):
    """GeoParquet source (validates the 'geo' metadata)."""
    from ..sources.geoparquet import read_geoparquet

    out, _meta = read_geoparquet(path)
    return out

@register_step("mdim_read_zarr3")
def _mdim_read_zarr3(ds, path: str, parallelism: int = 16):
    """Zarr v3 mdim source (zarr.json document, c/i/j chunk keys,
    bytes[+gzip] codec chain)."""
    from ..sources.zarr import read_zarr3

    zds, spec = read_zarr3(path, parallelism=parallelism)
    return MDimHandle(zds, spec)


@register_step("mdim_write_zarr3")
def _mdim_write_zarr3(ds, path: str, codec: str | None = "gzip",
                      level: int = 1):
    """Zarr v3 mdim sink (resumable per-chunk files)."""
    from ..sources.zarr import write_zarr3

    h = _mdim_handle(ds)
    return write_zarr3(h.ds, h.spec, path, codec=codec, level=level)

