"""INTERSECT / EXCEPT set operations — every statement runs VERBATIM
in DuckDB on the same tables (set semantics: results deduplicate and
NULLs compare EQUAL, unlike join equality)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import sql_query


def _tables():
    rng = np.random.default_rng(9)
    a = pa.table(
        {
            "k": pa.array(rng.integers(0, 30, 2000)),
            "s": pa.array(rng.choice(["x", "y", None], 2000)),
        }
    )
    b = pa.table(
        {
            "k": pa.array(rng.integers(10, 40, 800)),
            "s": pa.array(rng.choice(["x", "z", None], 800)),
        }
    )
    return {"a": a, "b": b}


def _both(sql):
    import ray.data as rd

    tables = _tables()
    ds = sql_query(sql, {k: rd.from_arrow(v) for k, v in tables.items()})
    sch = ds.schema()
    eng = ds.to_pandas()
    con = duckdb.connect()
    for k, v in tables.items():
        con.register(k, v)
    ora = con.execute(sql).fetchdf()
    if len(eng) == 0 and len(eng.columns) == 0:
        if sch is None:
            # an all-empty co-partitioned shuffle loses the schema
            # (Ray cannot infer names through zero-block stages); the
            # row-count contract still holds
            assert len(ora) == 0
            return
        eng = pd.DataFrame({c: [] for c in sch.names})
    assert sorted(eng.columns) == sorted(ora.columns)

    def norm(d):
        d = d[sorted(d.columns)].astype(str)
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    g, w = norm(eng), norm(ora)
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    assert (g.values == w.values).all()


def test_intersect_two_columns(ray_session):
    _both("SELECT k, s FROM a INTERSECT SELECT k, s FROM b")


def test_except_two_columns(ray_session):
    _both("SELECT k, s FROM a EXCEPT SELECT k, s FROM b")


def test_except_chain_left_associative(ray_session):
    _both(
        "SELECT k FROM a WHERE k < 20 EXCEPT SELECT k FROM b "
        "EXCEPT SELECT k FROM a WHERE k > 15"
    )


def test_union_then_except(ray_session):
    _both(
        "SELECT k FROM a UNION SELECT k FROM b "
        "EXCEPT SELECT k FROM b WHERE k > 30"
    )


def test_setop_nulls_compare_equal(ray_session):
    # both sides contain NULL s: INTERSECT keeps one NULL row
    _both("SELECT s FROM a INTERSECT SELECT s FROM b")


def test_intersect_empty_result(ray_session):
    _both(
        "SELECT k, s FROM a WHERE k = 0 "
        "INTERSECT SELECT k, s FROM a WHERE k = 29"
    )


def test_mixed_intersect_union_raises(ray_session):
    import ray.data as rd

    tables = {k: rd.from_arrow(v) for k, v in _tables().items()}
    with pytest.raises(ValueError, match="INTERSECT"):
        sql_query(
            "SELECT k FROM a UNION SELECT k FROM b "
            "INTERSECT SELECT k FROM b",
            tables,
        )


def _both_num(sql):
    """Like _both but numeric-tolerant (DuckDB renders BIGINT sums as
    floats through pandas)."""
    import ray.data as rd

    tables = _tables()
    eng = sql_query(sql, {k: rd.from_arrow(v) for k, v in tables.items()}).to_pandas()
    con = duckdb.connect()
    for k, v in tables.items():
        con.register(k, v)
    ora = con.execute(sql).fetchdf()
    assert sorted(eng.columns) == sorted(ora.columns)

    def norm(d):
        d = d[sorted(d.columns)]
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    a, b = norm(eng), norm(ora)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)


def test_limit_offset_plain(ray_session):
    _both_num("SELECT k, s FROM a ORDER BY k, s LIMIT 10 OFFSET 5")


def test_limit_offset_group_by(ray_session):
    _both_num(
        "SELECT k, SUM(k) AS sv, COUNT(*) AS n FROM a GROUP BY k "
        "ORDER BY n DESC, k LIMIT 7 OFFSET 3"
    )


def test_limit_offset_union_tail(ray_session):
    _both_num(
        "SELECT k FROM a WHERE k < 10 UNION SELECT k FROM b WHERE k > 25 "
        "ORDER BY k LIMIT 6 OFFSET 2"
    )


def test_offset_requires_order_and_limit(ray_session):
    import ray.data as rd

    tables = {k: rd.from_arrow(v) for k, v in _tables().items()}
    with pytest.raises(ValueError, match="OFFSET requires"):
        sql_query("SELECT k FROM a LIMIT 5 OFFSET 2", tables)
    with pytest.raises(ValueError, match="OFFSET requires"):
        sql_query("SELECT k FROM a ORDER BY k OFFSET 2", tables)
