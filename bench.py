"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N,
   "throughput": {"join_rows_per_s": ..., "tile_tiles_per_s": ...}}

Each phase (join / tiles / warp) runs in its own fresh process and Ray
session — the way separate `ray job submit` pipelines run in
production.  (Measured: in one shared local-mode session, later stages
run 20-30% slower than standalone — worker/object-store state from the
previous stage lingers; per-phase processes remove that artifact.)

--scaling: runs the whole thing twice at N and 4N CPUs
(GRAFT_SCALING_CPUS, default "4,16") on the same input and reports both
throughputs plus scaling efficiency (the N- vs 4N-node cluster
stand-in, BENCH/BASELINE.md).  Default pair 4/16: this box saturates
above ~16 concurrent workers (shared memory bandwidth / all-core
turbo), a single-node artifact a real 4N-node cluster does not have;
BENCH/BASELINE.md records the 8/32 pairing too.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — co-tenancy sentinel."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(v) for v in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def _steal_sample(window: float = 3.0) -> float:
    """Instantaneous steal%% over a short window."""
    s0, t0 = _cpu_ticks()
    time.sleep(window)
    s1, t1 = _cpu_ticks()
    return 100.0 * (s1 - s0) / max(1, t1 - t0)


def wait_quiet(max_wait: float | None = None, threshold: float = 5.0) -> dict:
    """Pre-flight: poll hypervisor steal%% and start the measurement
    only once it drops under ``threshold`` (or ``max_wait`` elapses).
    Round-3 lesson: the box sees 20-40%% co-tenant steal in bursts —
    waiting ~minutes is cheaper than a 2-4x inflated artifact.
    Controlled by GRAFT_WAIT_QUIET (seconds, default 180; 0 disables).
    Returns a probe report for the artifact."""
    if max_wait is None:
        max_wait = float(os.environ.get("GRAFT_WAIT_QUIET", "180"))
    t0 = time.time()
    probes = []
    while True:
        s = _steal_sample()
        probes.append(round(s, 2))
        if s < threshold or (time.time() - t0) >= max_wait:
            return {
                "steal_probes": probes[-8:],
                "waited_s": round(time.time() - t0, 1),
                "started_at_steal_pct": round(s, 2),
            }
        time.sleep(10.0)


class _EnvSentinel:
    """Captures host load + steal over a timed window so BENCH artifacts
    self-document co-tenant contention (round-2 lesson: a loaded box
    inflated wall times 1.6x with no in-artifact evidence)."""

    def __enter__(self):
        self.load0 = _loadavg()
        self.steal0, self.total0 = _cpu_ticks()
        return self

    def __exit__(self, *exc):
        self.load1 = _loadavg()
        steal1, total1 = _cpu_ticks()
        dt = max(1, total1 - self.total0)
        self.report = {
            "loadavg_start": self.load0,
            "loadavg_end": self.load1,
            "steal_pct": round(100.0 * (steal1 - self.steal0) / dt, 3),
        }


def _dump_stats(phase: str, datasets) -> None:
    """Write ds.stats() for executed datasets to BENCH/stats_<phase>.txt
    (SURVEY §9.7: stage-level attribution without a bisect)."""
    try:
        out = []
        for label, ds in datasets:
            out.append(f"===== {label}\n{ds.stats()}\n")
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", f"stats_{phase}.txt")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write("".join(out)[:200_000])
    except Exception:  # stats are advisory; never fail the bench
        pass


def _mem_stats() -> dict:
    """Object-store usage + spill counters from Ray's memory summary
    (captured at phase end — the peak-pressure evidence the sf1
    scale-up run records).  Advisory: never fails the bench."""
    try:
        import re

        from ray._private.internal_api import memory_summary

        txt = memory_summary(stats_only=True)
        out = {}
        m = re.search(r"Spilled (\d+) MiB, (\d+) objects", txt)
        if m:
            out["spilled_mib"] = int(m.group(1))
            out["spilled_objects"] = int(m.group(2))
        m = re.search(r"Restored (\d+) MiB, (\d+) objects", txt)
        if m:
            out["restored_mib"] = int(m.group(1))
        m = re.search(r"Plasma memory usage (\d+) MiB", txt)
        if m:
            out["plasma_mib_at_end"] = int(m.group(1))
        return out
    except Exception:
        return {}


def _session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # GRAFT_SHUFFLE=hash switches Ray Data's groupby/repartition exchange
    # to the hash-shuffle implementation (2.49+) — A/B knob for the wide
    # stages; default stays the sort-based exchange.
    if os.environ.get("GRAFT_SHUFFLE") == "hash":
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE


def _setup():
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gdal_ray.synth.make_table import SCALES, ensure_fixtures, scale_for_sf_dir

    scale = os.environ.get("GRAFT_BENCH_SCALE") or scale_for_sf_dir(sf_dir)
    _session(num_cpus)
    paths = ensure_fixtures(scale)  # cached after first run
    import ray.data as rd

    rd.read_parquet(paths["images"]).count()  # warm page cache (untimed)
    return num_cpus, sf_dir, scale, paths, SCALES[scale][0]


def phase_join() -> dict:
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.cells import detect_hot_cells
    from gdal_ray.stages.join import join_chips_with_polygons

    num_cpus, _, _, paths, n_images = _setup()
    sentinel = _EnvSentinel().__enter__()
    t0 = time.time()
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"]
    )
    pol = rd.read_parquet(paths["polygons"])
    centers = imgs.map_batches(
        lambda t: pa.table(
            {
                "x": pa.array(
                    (t.column("minx").to_numpy(zero_copy_only=False)
                     + t.column("maxx").to_numpy(zero_copy_only=False)) / 2
                ),
                "y": pa.array(
                    (t.column("miny").to_numpy(zero_copy_only=False)
                     + t.column("maxy").to_numpy(zero_copy_only=False)) / 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    hot = detect_hot_cells(centers, 10, sample_frac=0.05, max_salt=16)
    joined = join_chips_with_polygons(
        imgs, pol, zoom=10, chip_cols=["image_id"], poly_cols=["fid"], hot_cells=hot
    )
    # metadata-only consume (rows stay in the object store) so
    # ds.stats() survives for the BENCH/ dump; same work as .count()
    n_pairs = sum(
        b.num_rows() or 0 for b in joined.iter_internal_ref_bundles()
    )
    dt = time.time() - t0
    sentinel.__exit__()
    _dump_stats("join", [("join", joined)])
    return {
        "sec": round(dt, 3),
        "join_rows_per_s": round(n_images / dt, 2),
        "n_join_pairs": n_pairs,
        "env": sentinel.report,
        "mem": _mem_stats(),
    }


def phase_tiles() -> dict:
    import ray.data as rd

    from gdal_ray.stages.tiles import build_pyramid

    num_cpus, _, _, paths, _ = _setup()
    sentinel = _EnvSentinel().__enter__()
    t0 = time.time()
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    levels = build_pyramid(imgs, z_max=11, z_min=9, resampling="near")
    n_tiles = sum(ds.count() for ds in levels.values())
    dt = time.time() - t0
    sentinel.__exit__()
    _dump_stats("tiles", [(f"z{z}", ds) for z, ds in levels.items()])
    return {
        "sec": round(dt, 3),
        "tile_tiles_per_s": round(n_tiles / dt, 2),
        "n_tiles": n_tiles,
        "env": sentinel.report,
        "mem": _mem_stats(),
    }


def phase_warp() -> dict:
    import ray.data as rd

    from gdal_ray.stages.warp import warp_images

    num_cpus, _, _, paths, n_images = _setup()
    sentinel = _EnvSentinel().__enter__()
    t0 = time.time()
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    warped = warp_images(
        imgs, resampling="bilinear",
        concurrency=max(2, num_cpus * 3 // 4), batch_size=128,
    ).map_batches(lambda t: t.select(["image_id"]), batch_format="pyarrow")
    for _ in warped.iter_internal_ref_bundles():
        pass
    dt = time.time() - t0
    sentinel.__exit__()
    _dump_stats("warp", [("warp", warped)])
    return {
        "sec": round(dt, 3),
        "warp_rows_per_s": round(n_images / dt, 2),
        "env": sentinel.report,
        "mem": _mem_stats(),
    }


PHASES = {"join": phase_join, "tiles": phase_tiles, "warp": phase_warp}


def _spawn_phase(name: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", name],
        env=dict(os.environ),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # ensure fixtures exist once (children then hit the cache)
    from gdal_ray.synth.make_table import ensure_fixtures, scale_for_sf_dir

    scale = os.environ.get("GRAFT_BENCH_SCALE") or scale_for_sf_dir(sf_dir)
    _session(num_cpus)
    ensure_fixtures(scale)
    import ray

    ray.shutdown()
    quiet = wait_quiet()

    results = {name: _spawn_phase(name) for name in ("join", "tiles", "warp")}
    timings = {name: r["sec"] for name, r in results.items()}
    throughput: dict = {}
    env = {name: r.pop("env", {}) for name, r in results.items()}
    mem = {name: r.pop("mem", {}) for name, r in results.items()}
    for name, m in mem.items():
        if m:
            env[name]["mem"] = m
    for r in results.values():
        for k, v in r.items():
            if k != "sec":
                throughput[k] = v
    headline = timings["join"] + timings["tiles"]
    return {
        "env": {"quiet_probe": quiet, **env},
        "metric": "spatial_join+tile_pyramid wall time",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {
            "spatial_join": timings["join"],
            "tile_pyramid": timings["tiles"],
            "warp": timings["warp"],
        },
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "throughput": throughput,
    }


def run_scaling() -> None:
    lo_n, hi_n = (
        int(v) for v in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")
    )

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

    lo, hi = run(lo_n), run(hi_n)
    eff = (lo["value"] / hi["value"]) / (hi_n / lo_n)
    print(
        json.dumps(
            {
                f"sec_{lo_n}": lo["value"],
                f"sec_{hi_n}": hi["value"],
                f"throughput_{lo_n}": lo["throughput"],
                f"throughput_{hi_n}": hi["throughput"],
                "cpus": [lo_n, hi_n],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--phase" in sys.argv:
        name = sys.argv[sys.argv.index("--phase") + 1]
        result = PHASES[name]()
        import ray

        ray.shutdown()
        print(json.dumps(result))
    elif "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
