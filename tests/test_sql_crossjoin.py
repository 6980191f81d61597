"""CROSS JOIN / pure non-equi ON — broadcast nested-loop lowering,
DuckDB-verbatim."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import sql_query


def _tables():
    rng = np.random.default_rng(7)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(300, dtype=np.int64)),
            "v": pa.array(rng.normal(50.0, 20.0, 300).round(3)),
            "g": pa.array(rng.choice(["r", "s", "t"], 300)),
        }
    )
    bins = pa.table(
        {
            "bin_id": pa.array(np.arange(5, dtype=np.int64)),
            "lo": pa.array([-1e9, 20.0, 40.0, 60.0, 80.0]),
            "hi": pa.array([20.0, 40.0, 60.0, 80.0, 1e9]),
        }
    )
    return {"pts": pts, "bins": bins}


def _both(sql):
    import ray.data as rd

    tables = _tables()
    eng = sql_query(
        sql, {k: rd.from_arrow(v) for k, v in tables.items()}
    ).to_pandas()
    con = duckdb.connect()
    for k, v in tables.items():
        con.register(k, v)
    ora = con.execute(sql).fetchdf()
    if len(eng) == 0 and len(eng.columns) == 0:
        # an all-empty pipeline can lose the schema (Ray cannot infer
        # names through zero-block stages); row-count contract holds
        assert len(ora) == 0
        return
    assert sorted(eng.columns) == sorted(ora.columns)

    def norm(d):
        d = d[sorted(d.columns)].astype(str)
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    g, w = norm(eng), norm(ora)
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert (g.values == w.values).all()


def test_cross_join_count(ray_session):
    _both("SELECT COUNT(*) AS n FROM pts CROSS JOIN bins")


def test_cross_join_where_band(ray_session):
    # the classic binning pattern: cross join + range WHERE
    _both(
        "SELECT pid, bin_id FROM pts CROSS JOIN bins "
        "WHERE v >= lo AND v < hi ORDER BY pid LIMIT 50"
    )


def test_non_equi_on(ray_session):
    # pure non-equi ON conjuncts (no column equality) -> nested loop
    _both(
        "SELECT pid, bin_id FROM pts JOIN bins ON v >= lo AND v < hi "
        "ORDER BY pid LIMIT 50"
    )


def test_non_equi_group_by(ray_session):
    _both(
        "SELECT bin_id, COUNT(*) AS n, MIN(v) AS mn FROM pts "
        "JOIN bins ON v >= lo AND v < hi GROUP BY bin_id ORDER BY bin_id"
    )


def test_cross_join_qualified_and_agg(ray_session):
    _both(
        "SELECT g, bins.bin_id, COUNT(*) AS n FROM pts CROSS JOIN bins "
        "WHERE pts.v > bins.lo GROUP BY g, bins.bin_id "
        "ORDER BY g, bin_id"
    )


def test_left_join_non_equi_raises(ray_session):
    import ray.data as rd

    tables = {k: rd.from_arrow(v) for k, v in _tables().items()}
    with pytest.raises(ValueError, match="column equality"):
        sql_query(
            "SELECT pid FROM pts LEFT JOIN bins ON v >= lo", tables
        ).to_pandas()


def test_nl_cap_raises(ray_session):
    import ray.data as rd

    big = pa.table({"x": pa.array(np.arange(70000, dtype=np.int64))})
    tables = {
        "pts": rd.from_arrow(_tables()["pts"]),
        "big": rd.from_arrow(big),
    }
    with pytest.raises(ValueError, match="cap"):
        sql_query("SELECT COUNT(*) AS n FROM pts CROSS JOIN big", tables)


def test_empty_right_side(ray_session):
    _both(
        "SELECT pid, bin_id FROM pts CROSS JOIN "
        "(SELECT bin_id FROM bins WHERE bin_id > 99) e"
    )
