"""Per-partition checkpoint store + lineage records + counters.

The north rule requires every partition to emit lineage records and
counters to a checkpoint store so a killed job resumes at partition
granularity.  This is the engine's stronger version of the reference's
file-existence resume (gdal2tiles.py:1497,2846 --resume;
gdal_retile.py:547,1073): writes are atomic (tmp dir + rename), each
partition records a manifest JSON with row counters and an id-hash,
and a rerun skips completed partitions (SURVEY.md §4 'Checkpoint /
resume').

Partition id = key >> shift (a cell RANGE, so partition count is
controlled independently of zoom).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class Manifest:
    """Partition-granular manifest: one JSON per completed partition,
    written atomically next to the partition's parquet output."""

    def __init__(self, root: str):
        self.root = root
        self.parts = os.path.join(root, "_manifest")
        os.makedirs(self.parts, exist_ok=True)

    def done_path(self, pid: int) -> str:
        return os.path.join(self.parts, f"part-{pid}.json")

    def is_done(self, pid: int) -> bool:
        return os.path.exists(self.done_path(pid))

    def record(self, pid: int) -> dict | None:
        p = self.done_path(pid)
        if not os.path.exists(p):
            return None
        return json.load(open(p))

    def mark_done(self, pid: int, rec: dict) -> None:
        tmp = self.done_path(pid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.done_path(pid))

    def completed(self) -> dict[int, dict]:
        out = {}
        for f in os.listdir(self.parts):
            if f.startswith("part-") and f.endswith(".json"):
                rec = json.load(open(os.path.join(self.parts, f)))
                out[rec["pid"]] = rec
        return out

    def summary(self) -> dict:
        recs = self.completed().values()
        return {
            "n_partitions": len(recs),
            "rows": int(sum(r["rows"] for r in recs)),
            "bytes": int(sum(r.get("bytes", 0) for r in recs)),
            "skipped_reruns": int(sum(r.get("runs", 1) - 1 for r in recs)),
        }


def write_partitioned(
    ds,
    out_dir: str,
    key_col: str = "cell",
    shift: int = 6,
    id_col: str | None = None,
):
    """Resumable partitioned sink: rows land in one parquet dir per
    key-range partition (pid = key >> shift), each with a lineage
    manifest (row count, key range, id hash, wall time).  Completed
    partitions are skipped on rerun.  Returns a Dataset of per-partition
    counter rows (pid, rows, skipped)."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    # store-level layout manifest: a rerun with a different shift or key
    # column must fail loudly, not silently mix two partition layouts
    layout = {"key_col": key_col, "shift": shift}
    layout_path = os.path.join(out_dir, "_store.json")
    if os.path.exists(layout_path):
        prev = json.load(open(layout_path))
        if prev != layout:
            raise ValueError(
                f"checkpoint store {out_dir} was written with layout {prev}; "
                f"rerun requested {layout} — use a fresh out_dir"
            )
    else:
        tmp = layout_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(layout, f)
        os.replace(tmp, layout_path)

    def add_pid(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__pid", pa.array(keys >> shift, pa.int64()))

    def write_group(g: pa.Table) -> pa.Table:
        pid = int(g.column("__pid")[0].as_py())
        g = g.drop_columns(["__pid"])
        t0 = time.time()
        if manifest.is_done(pid):
            rec = manifest.record(pid)
            rec["runs"] = rec.get("runs", 1) + 1
            manifest.mark_done(pid, rec)
            return pa.table(
                {
                    "pid": pa.array([pid], pa.int64()),
                    "rows": pa.array([rec["rows"]], pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        part_dir = os.path.join(out_dir, f"pid={pid}")
        tmp = part_dir + ".tmp"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(g, os.path.join(tmp, "data.parquet"))
        if os.path.exists(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        os.replace(tmp, part_dir)
        keys = g.column(key_col).to_numpy(zero_copy_only=False)
        ids = (
            g.column(id_col).to_pylist()
            if id_col
            else keys.tolist()
        )
        id_hash = hashlib.sha1(
            ("\n".join(str(x) for x in sorted(ids))).encode()
        ).hexdigest()[:16]
        rec = {
            "pid": pid,
            "rows": int(g.num_rows),
            "bytes": int(os.path.getsize(os.path.join(part_dir, "data.parquet"))),
            "key_min": int(keys.min()),
            "key_max": int(keys.max()),
            "id_hash": id_hash,
            "wall_s": round(time.time() - t0, 3),
            "runs": 1,
        }
        manifest.mark_done(pid, rec)
        return pa.table(
            {
                "pid": pa.array([pid], pa.int64()),
                "rows": pa.array([g.num_rows], pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    return (
        ds.map_batches(add_pid, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(write_group, batch_format="pyarrow")
    )


def read_partitioned(out_dir: str):
    """Read back a partitioned sink as a Dataset."""
    import ray.data as rd

    return rd.read_parquet(out_dir, file_extensions=["parquet"])
