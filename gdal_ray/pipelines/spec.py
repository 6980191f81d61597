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
