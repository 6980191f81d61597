"""Cell-assignment stages: map_batches callables adding partition keys.

The engine's one partitioning key (SURVEY.md §1.3): the packed
WebMercatorQuad tile id at a chosen zoom.  Points get exactly one cell;
envelopes (chips / polygons) are replicated to every cell they cover
(flat expansion inside the batch, zero-copy Arrow in/out).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import mercator


def assign_point_cells(zoom: int, x_col: str = "x", y_col: str = "y", out_col: str = "cell"):
    """Stage factory: add the cell id of each point row."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = mercator.cell_of_points(x, y, zoom)
        return batch.append_column(out_col, pa.array(cells, pa.int64()))

    fn.__name__ = f"assign_point_cells_z{zoom}"
    return fn


def cover_envelope_cells(zoom: int, out_col: str = "cell"):
    """Stage factory: replicate each row to every cell its envelope
    (minx/miny/maxx/maxy columns) covers; adds ``out_col``."""

    def fn(batch: pa.Table) -> pa.Table:
        row_idx, cells = mercator.cover_cells_batch(
            batch.column("minx").to_numpy(zero_copy_only=False),
            batch.column("miny").to_numpy(zero_copy_only=False),
            batch.column("maxx").to_numpy(zero_copy_only=False),
            batch.column("maxy").to_numpy(zero_copy_only=False),
            zoom,
        )
        out = batch.take(pa.array(row_idx, pa.int64()))
        return out.append_column(out_col, pa.array(cells, pa.int64()))

    fn.__name__ = f"cover_envelope_cells_z{zoom}"
    return fn


def envelope_filter(minx: float, miny: float, maxx: float, maxy: float):
    """Vectorized envelope pre-filter (the reference's cheap bbox test,
    ogrlayer.cpp:2253 FilterGeometry step 1) over envelope columns."""

    def fn(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.less_equal(batch.column("minx"), pa.scalar(maxx)),
                pc.greater_equal(batch.column("maxx"), pa.scalar(minx)),
            ),
            pc.and_(
                pc.less_equal(batch.column("miny"), pa.scalar(maxy)),
                pc.greater_equal(batch.column("maxy"), pa.scalar(miny)),
            ),
        )
        return batch.filter(keep)

    fn.__name__ = "envelope_filter"
    return fn


def detect_hot_cells(
    points,
    zoom: int,
    x_col: str = "x",
    y_col: str = "y",
    sample_frac: float = 0.05,
    hot_factor: float = 8.0,
    max_salt: int = 16,
    seed: int = 42,
) -> dict[int, int]:
    """Sample-based skew probe (SURVEY.md §4 'hot-cell salting'):
    estimate per-cell row counts from a small random sample and return
    {cell: salt_fanout} for cells holding more than ``hot_factor`` times
    the mean sampled cell load.  Cheap (one sampled pass, driver-side
    bincount) — run before a cell co-partitioned join on unknown data."""
    import collections

    sample = points.random_sample(sample_frac, seed=seed)
    counts: collections.Counter = collections.Counter()
    for batch in sample.iter_batches(batch_size=65536, batch_format="pyarrow"):
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        cells = mercator.cell_of_points(x, y, zoom)
        vals, cnts = np.unique(cells, return_counts=True)
        for v, c in zip(vals, cnts):
            counts[int(v)] += int(c)
    if not counts:
        return {}
    mean = sum(counts.values()) / len(counts)
    hot = {}
    for cell, c in counts.items():
        if c > hot_factor * mean:
            hot[cell] = int(min(max_salt, max(2, round(c / (hot_factor * mean) * 4))))
    return hot


def add_salt(n_salt_for_cell: dict[int, int], id_col: str, cell_col: str = "cell"):
    """Skew handling (SURVEY.md §4): rows in hot cells get a salt derived
    from their id; the group key becomes cell*MAX_SALT + salt.  The
    other join side must replicate hot-cell rows to every salt value
    (use :func:`replicate_salt`)."""
    MAX_SALT = 64

    def fn(batch: pa.Table) -> pa.Table:
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False)
        cells = _zoom_masked(cells)
        col = batch.column(id_col)
        if pa.types.is_string(col.type) or pa.types.is_binary(col.type):
            import zlib

            ids = np.fromiter(
                (zlib.crc32(str(v).encode()) for v in col.to_pylist()),
                dtype=np.int64,
                count=len(col),
            )
        else:
            ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.zeros(len(cells), dtype=np.int64)
        mask = (np.int64(1) << np.int64(58)) - np.int64(1)
        for cell, ns in n_salt_for_cell.items():
            m = cells == (np.int64(cell) & mask)
            if m.any():
                salt[m] = (ids[m] * 2654435761) % ns
        key = cells * MAX_SALT + salt
        return batch.append_column("cellsalt", pa.array(key, pa.int64()))

    fn.__name__ = "add_salt"
    return fn


def _zoom_masked(cells: np.ndarray) -> np.ndarray:
    """Salted keys multiply the cell by MAX_SALT, which would shift the
    zoom bits (cell = z<<58 | x<<29 | y) off the top of int64.  All
    salted joins run at a single zoom, so drop the zoom bits — and
    assert that invariant rather than silently wrapping."""
    if len(cells):
        z = cells >> 58
        if z.min() != z.max():
            raise ValueError("salted join requires a single zoom level")
    return cells & ((np.int64(1) << np.int64(58)) - np.int64(1))


def replicate_salt(n_salt_for_cell: dict[int, int], cell_col: str = "cell"):
    """Other side of salting: replicate hot-cell rows across all salts."""
    MAX_SALT = 64

    def fn(batch: pa.Table) -> pa.Table:
        cells = batch.column(cell_col).to_numpy(zero_copy_only=False)
        cells = _zoom_masked(cells)
        reps = np.ones(len(cells), dtype=np.int64)
        mask = (np.int64(1) << np.int64(58)) - np.int64(1)
        for cell, ns in n_salt_for_cell.items():
            reps[cells == (np.int64(cell) & mask)] = ns
        row_idx = np.repeat(np.arange(len(cells), dtype=np.int64), reps)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        salt = np.arange(len(row_idx), dtype=np.int64) - np.repeat(starts, reps)
        out = batch.take(pa.array(row_idx, pa.int64()))
        key = cells[row_idx] * MAX_SALT + salt
        return out.append_column("cellsalt", pa.array(key, pa.int64()))

    fn.__name__ = "replicate_salt"
    return fn
