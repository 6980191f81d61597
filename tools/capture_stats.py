"""Capture per-query ds.stats() for every registered query suite.

Runs each `queries()` entry at the given sf_dir, executes the result
(Datasets are materialized — query outputs are small aggregate/
checksum tables), and writes:

- BENCH/stats/<query>.txt   — the full Ray Data stats report for the
  query's execution (operator wall/CPU/rows, per-stage breakdown),
- BENCH/query_stats.json    — one line of {query: {wall_s, rows,
  kind}} plus the co-tenancy sentinel (loadavg, steal%) so stage-level
  regressions are attributable without a bisect (SURVEY §9.7).

Usage: python tools/capture_stats.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def _steal_pct(interval: float = 0.5) -> float:
    def snap():
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return vals

    a = snap()
    time.sleep(interval)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 1) if tot else 0.0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("GDAL_RAY_ORACLE_SF", sf_dir)
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR",
                 log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs = E.queries()
    names = sys.argv[2:] or list(qs)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "stats")
    os.makedirs(out_dir, exist_ok=True)
    # merge into an existing capture so a subset refresh doesn't drop
    # the other queries' rows
    summary = {"sf_dir": sf_dir, "queries": {}}
    prev_path = os.path.join(out_dir, "..", "query_stats.json")
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path))
            if prev.get("sf_dir") == sf_dir:
                summary["queries"].update(prev.get("queries", {}))
        except (ValueError, OSError):
            pass
    for name in names:
        t0 = time.time()
        entry = {"kind": "?", "rows": None}
        try:
            res = qs[name](sf_dir)
            if hasattr(res, "stats"):  # ray.data.Dataset
                mat = res.materialize()
                entry["kind"] = "dataset"
                entry["rows"] = mat.count()
                with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                    f.write(mat.stats())
            else:  # pandas / pyarrow — no Ray stats surface
                entry["kind"] = type(res).__name__
                entry["rows"] = len(res)
            entry["wall_s"] = round(time.time() - t0, 2)
        except Exception as e:  # noqa: BLE001
            entry["error"] = str(e)[:200]
            entry["wall_s"] = round(time.time() - t0, 2)
        entry["steal_pct"] = _steal_pct()
        summary["queries"][name] = entry
        print(f"{name}: {entry}", flush=True)
    summary["loadavg"] = open("/proc/loadavg").read().split()[:3]
    with open(os.path.join(out_dir, "..", "query_stats.json"), "w") as f:
        json.dump(summary, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
