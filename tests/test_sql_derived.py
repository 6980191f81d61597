"""Derived tables (FROM / JOIN subqueries) in the SQL front-end —
every statement runs VERBATIM in DuckDB on the same tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import sql_query


def _t():
    rng = np.random.default_rng(5)
    n = 3000
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 40, n)),
            "v": pa.array(rng.integers(-100, 100, n).astype(np.float64)),
            "s": pa.array(rng.choice(["aa", "bb", "cc"], n)),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )


def _d():
    return pa.table(
        {
            "k": pa.array(np.arange(40, dtype=np.int64)),
            "name": pa.array([f"grp{i}" for i in range(40)], pa.string()),
        }
    )


def _both(sql):
    import ray.data as rd

    tables = {"t": _t(), "d": _d()}
    eng = sql_query(sql, {k: rd.from_arrow(v) for k, v in tables.items()}).to_pandas()
    con = duckdb.connect()
    for k, v in tables.items():
        con.register(k, v)
    ora = con.execute(sql).fetchdf()
    assert sorted(eng.columns) == sorted(ora.columns)

    def norm(d):
        d = d[sorted(d.columns)].copy()
        for c in d.columns:
            if d[c].dtype == object:
                d[c] = d[c].astype(str)
        return d.sort_values(list(d.columns)).reset_index(drop=True)

    a, b = norm(eng), norm(ora)
    assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)


def test_derived_from_with_outer_group(ray_session):
    _both(
        "SELECT k2, COUNT(*) AS n, SUM(sv) AS tot FROM "
        "(SELECT k AS k2, SUM(v) AS sv FROM t GROUP BY k) sub "
        "GROUP BY k2 ORDER BY k2 LIMIT 10"
    )


def test_derived_where_order(ray_session):
    _both(
        "SELECT k2, sv FROM (SELECT k AS k2, SUM(v) AS sv FROM t "
        "WHERE v > 0 GROUP BY k) x WHERE sv > 100 ORDER BY sv DESC LIMIT 5"
    )


def test_derived_join_both_positions(ray_session):
    _both(
        "SELECT a.k AS k, a.sv AS sv, b.name AS name FROM "
        "(SELECT k, SUM(v) AS sv FROM t GROUP BY k) a "
        "JOIN d b ON a.k = b.k ORDER BY k LIMIT 8"
    )
    _both(
        "SELECT t.k AS k, COUNT(*) AS n FROM t JOIN "
        "(SELECT k FROM d WHERE k < 25) dd ON t.k = dd.k "
        "GROUP BY t.k ORDER BY k LIMIT 6"
    )


def test_derived_nested_two_levels(ray_session):
    _both(
        "SELECT MAX(sv) AS mx FROM (SELECT k2, sv FROM "
        "(SELECT k AS k2, SUM(v) AS sv FROM t GROUP BY k) i "
        "WHERE sv <> 0) o"
    )


def test_window_over_derived(ray_session):
    _both(
        "SELECT k2, RANK() OVER (PARTITION BY p ORDER BY sv) AS r FROM "
        "(SELECT k AS k2, k % 5 AS p, SUM(v) AS sv FROM t GROUP BY k) x "
        "ORDER BY k2 LIMIT 12"
    )


def test_derived_alias_shadowing_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="shadows"):
        sql_query(
            "SELECT * FROM (SELECT k FROM t) t",
            {"t": rd.from_arrow(_t())},
        )


def test_group_by_expression(ray_session):
    _both(
        "SELECT k % 5 AS p, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv "
        "FROM t GROUP BY k % 5 ORDER BY p"
    )


def test_group_by_mixed_expr_and_column(ray_session):
    _both(
        "SELECT k % 4 AS p, s, COUNT(*) AS n FROM t "
        "GROUP BY k % 4, s ORDER BY p, s LIMIT 8"
    )


def test_group_by_case_expression_with_having(ray_session):
    _both(
        "SELECT CASE WHEN k < 10 THEN 'lo' ELSE 'hi' END AS b, "
        "COUNT(*) AS n FROM t "
        "GROUP BY CASE WHEN k < 10 THEN 'lo' ELSE 'hi' END ORDER BY b"
    )
    _both(
        "SELECT k % 3 AS p, MAX(v) AS mx FROM t WHERE v > 10 "
        "GROUP BY k % 3 HAVING COUNT(*) > 5 ORDER BY p"
    )


def test_group_by_expression_over_join_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="derived table"):
        sql_query(
            "SELECT t.k % 2 AS p, COUNT(*) AS n FROM t "
            "JOIN d ON t.k = d.k GROUP BY t.k % 2",
            {"t": rd.from_arrow(_t()), "d": rd.from_arrow(_d())},
        )
