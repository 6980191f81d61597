"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "throughput": {"join_rows_per_s": ..., "tile_tiles_per_s": ...}}

--scaling: runs the headline twice in fresh processes at
RAY_GRAFT_CPUS=8 and 32 on the same input and reports both throughputs
plus scaling efficiency (the N vs 4N cluster stand-in, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from gdal_ray.stages.join import join_chips_with_polygons
    from gdal_ray.stages.tiles import build_pyramid
    from gdal_ray.synth.make_table import SCALES, ensure_fixtures, scale_for_sf_dir

    scale = os.environ.get("GRAFT_BENCH_SCALE") or scale_for_sf_dir(sf_dir)
    paths = ensure_fixtures(scale)  # cached after first run
    n_images = SCALES[scale][0]

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    # warm page cache (untimed)
    rd.read_parquet(paths["images"]).count()

    # 1. spatial join: chips x polygons (the north-star join), with
    # sample-based hot-cell detection + salting (skew handling)
    import pyarrow as _pa

    from gdal_ray.stages.cells import detect_hot_cells

    t0 = time.time()
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"]
    )
    pol = rd.read_parquet(paths["polygons"])
    centers = imgs.map_batches(
        lambda t: _pa.table(
            {
                "x": _pa.array(
                    (t.column("minx").to_numpy(zero_copy_only=False)
                     + t.column("maxx").to_numpy(zero_copy_only=False)) / 2
                ),
                "y": _pa.array(
                    (t.column("miny").to_numpy(zero_copy_only=False)
                     + t.column("maxy").to_numpy(zero_copy_only=False)) / 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    hot = detect_hot_cells(centers, 10, sample_frac=0.05, max_salt=16)
    n_pairs = join_chips_with_polygons(
        imgs, pol, zoom=10, num_partitions=max(16, num_cpus * 2),
        chip_cols=["image_id"], poly_cols=["fid"], hot_cells=hot,
    ).count()
    timings["spatial_join"] = time.time() - t0
    throughput["join_rows_per_s"] = n_images / timings["spatial_join"]

    # 2. tile pyramid (z11 base + 2 overview levels)
    t0 = time.time()
    imgs_full = rd.read_parquet(paths["images"])
    levels = build_pyramid(imgs_full, z_max=11, z_min=9, resampling="near")
    n_tiles = sum(ds.count() for ds in levels.values())
    timings["tile_pyramid"] = time.time() - t0
    throughput["tile_tiles_per_s"] = n_tiles / timings["tile_pyramid"]
    throughput["n_tiles"] = n_tiles
    throughput["n_join_pairs"] = n_pairs

    # 3. decode+warp throughput
    t0 = time.time()
    from gdal_ray.stages.warp import warp_images

    warp_images(
        imgs_full, resampling="bilinear",
        concurrency=max(2, num_cpus * 3 // 4), batch_size=128,
    ).map_batches(lambda t: t.select(["image_id"]), batch_format="pyarrow").count()
    timings["warp"] = time.time() - t0
    throughput["warp_rows_per_s"] = n_images / timings["warp"]

    headline = timings["spatial_join"] + timings["tile_pyramid"]
    result = {
        "metric": "spatial_join+tile_pyramid wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "throughput": {k: round(v, 2) for k, v in throughput.items()},
    }
    ray.shutdown()
    return result


def run_scaling() -> None:
    """Same job, fresh processes, 8 then 32 CPUs, on the 3x 'xbench'
    fixture (fixed costs amortized as at target scale)."""

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_SCALE=os.environ.get("GRAFT_BENCH_SCALE", "xbench"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    print(
        json.dumps(
            {
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "throughput_8": lo["throughput"],
                "throughput_32": hi["throughput"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
