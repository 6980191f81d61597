"""gdal_ray — a Ray-Data-native spatial-join + tiling engine.

Rebuilds the query/data-processing capabilities of the reference GDAL
tree (/root/reference, v3.12.0) from scratch as `ray.data.Dataset`
pipelines: zero-copy Arrow `map_batches` stages, actor pools for
stateful stages (tile composers, spatial indexes, transformers), and
explicit `groupby`-on-cell shuffles with skew-aware salting.

Layout:
  functions/  pure vectorized kernels (tile math, codecs, checksum,
              geometry/WKB, resample kernels, text/sketch functions)
  stages/     map_batches / map_groups stage callables (cells, join,
              tiles, warp, knn, rasterize, polygonize, dedup, text)
  sources/    table readers / partitioned sinks
  state/      spatial index (STRtree), checkpoint manifest, lineage
  pipelines/  end-to-end pipelines + the SQL-oracle query surface
  synth/      deterministic (seed 42) fixture table generators
"""

__version__ = "0.1.0"
