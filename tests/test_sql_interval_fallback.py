"""Non-equi JOIN interval-join lowering (integer/timestamp ranges) —
DuckDB-verbatim, including a right side ABOVE the nested-loop cap."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import sql_query


def _tables(n_iv=400, n_pts=500):
    rng = np.random.default_rng(11)
    lo = rng.integers(0, 10_000, n_iv)
    w = rng.integers(0, 50, n_iv)
    iv = pa.table(
        {
            "iv_id": pa.array(np.arange(n_iv, dtype=np.int64)),
            "lo": pa.array(lo.astype(np.int64)),
            "hi": pa.array((lo + w).astype(np.int64)),
        }
    )
    pts = pa.table(
        {
            "pid": pa.array(np.arange(n_pts, dtype=np.int64)),
            "t": pa.array(rng.integers(0, 10_000, n_pts).astype(np.int64)),
        }
    )
    return {"iv": iv, "pts": pts}


def _both(sql, tables):
    import ray.data as rd

    eng = sql_query(
        sql, {k: rd.from_arrow(v) for k, v in tables.items()}
    ).to_pandas()
    con = duckdb.connect()
    for k, v in tables.items():
        con.register(k, v)
    ora = con.execute(sql).fetchdf()
    assert sorted(eng.columns) == sorted(ora.columns)

    def norm(d):
        d = d[sorted(d.columns)].astype(str)
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    g, w = norm(eng), norm(ora)
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert (g.values == w.values).all()


def test_between_join_probe_left(ray_session):
    # probe on the FROM table, intervals on the joined table
    _both(
        "SELECT pid, iv_id FROM pts JOIN iv ON t BETWEEN lo AND hi",
        _tables(),
    )


def test_between_join_probe_right(ray_session):
    # probe on the JOINED table, intervals on the FROM table
    _both(
        "SELECT pid, iv_id FROM iv JOIN pts ON t BETWEEN lo AND hi",
        _tables(),
    )


def test_inequality_pair_strict_upper(ray_session):
    # ge/lt pair; the strict bound re-filters after the inclusive
    # co-location
    _both(
        "SELECT pid, iv_id, t, lo FROM pts JOIN iv ON t >= lo AND t < hi",
        _tables(),
    )


def test_range_join_with_aggregation(ray_session):
    _both(
        "SELECT iv_id, COUNT(*) AS n, MIN(t) AS tmin "
        "FROM pts JOIN iv ON t BETWEEN lo AND hi "
        "GROUP BY iv_id ORDER BY iv_id",
        _tables(),
    )


def test_range_join_above_nested_loop_cap(ray_session):
    # 70k intervals: the broadcast nested loop would raise at its
    # 65,536-row cap; the interval lowering handles it
    tables = _tables(n_iv=70_000, n_pts=300)
    _both(
        "SELECT pid, COUNT(*) AS n FROM pts JOIN iv "
        "ON t BETWEEN lo AND hi GROUP BY pid ORDER BY pid",
        tables,
    )


def test_float_range_still_nested_loop(ray_session):
    # float bounds are not rangeable -> nested-loop path (unchanged)
    rng = np.random.default_rng(3)
    tables = {
        "fiv": pa.table(
            {
                "iv_id": pa.array(np.arange(50, dtype=np.int64)),
                "lo": pa.array(rng.uniform(0, 100, 50)),
                "hi": pa.array(rng.uniform(0, 100, 50) + 10.0),
            }
        ),
        "fp": pa.table(
            {
                "pid": pa.array(np.arange(80, dtype=np.int64)),
                "v": pa.array(rng.uniform(0, 110, 80)),
            }
        ),
    }
    _both("SELECT pid, iv_id FROM fp JOIN fiv ON v BETWEEN lo AND hi", tables)


def test_mixed_tick_types_do_not_take_interval_path(ray_session):
    """Probe and bound columns of DIFFERENT tick units (timestamp[s]
    vs timestamp[us]) must not band in incomparable spaces — the
    lowering declines and the nested loop (arrow comparison kernels
    handle the cast) gives the DuckDB answer."""
    ts_s = pa.array(
        np.array([100, 200, 300], dtype="datetime64[s]"),
        pa.timestamp("s"),
    )
    lo_us = pa.array(
        np.array([50_000_000, 250_000_000], dtype="datetime64[us]"),
        pa.timestamp("us"),
    )
    hi_us = pa.array(
        np.array([150_000_000, 350_000_000], dtype="datetime64[us]"),
        pa.timestamp("us"),
    )
    tables = {
        "p": pa.table({"pid": pa.array([1, 2, 3], pa.int64()), "t": ts_s}),
        "iv": pa.table({"iv_id": pa.array([10, 20], pa.int64()),
                        "lo": lo_us, "hi": hi_us}),
    }
    _both("SELECT pid, iv_id FROM p JOIN iv ON t BETWEEN lo AND hi", tables)
