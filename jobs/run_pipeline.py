"""`ray job submit` entry point: run a serialized pipeline spec.

Usage:
  python jobs/run_pipeline.py spec.json
  ray job submit --working-dir . -- python jobs/run_pipeline.py spec.json

The spec format is documented in gdal_ray/pipelines/spec.py (the GDALG
analog).  Owns its Ray session (guarded init).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gdal_ray.pipelines.spec import run_pipeline

    spec = json.load(open(sys.argv[1]))
    out = run_pipeline(spec)
    if out is not None and hasattr(out, "count"):
        print(json.dumps({"rows": out.count(), "schema": out.schema().names}))
    ray.shutdown()


if __name__ == "__main__":
    main()
