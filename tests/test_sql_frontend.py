"""SQL string front-end (OGR SQL dialect subset)."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import parse_select


def _table():
    return pa.table(
        {
            "a": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "b": pa.array([10.0, 20.0, 30.0, 40.0, 50.0], pa.float64()),
            "name": pa.array(["alpha", "beta", "gamma", "delta", "eps"], pa.string()),
        }
    )


def _run(sql, t=None):
    import ray.data as rd

    t = t or _table()
    from gdal_ray.pipelines.sql import sql_query

    return sql_query(sql, {"t": rd.from_arrow(t)}).to_pandas()


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_select("SELECT FROM WHERE")
    with pytest.raises(ValueError):
        parse_select("DELETE FROM t")


def test_filter_project(ray_session):
    df = _run("SELECT a, b * 2 AS b2 FROM t WHERE a >= 2 AND name LIKE '%a%'")
    assert list(df.a) == [2, 3, 4]
    assert list(df.b2) == [40.0, 60.0, 80.0]


def test_in_between_not(ray_session):
    df = _run("SELECT a FROM t WHERE a IN (1, 5) OR (b BETWEEN 25 AND 35)")
    assert sorted(df.a) == [1, 3, 5]
    df = _run("SELECT a FROM t WHERE NOT (a IN (1, 5)) ORDER BY a DESC LIMIT 2")
    assert list(df.a) == [4, 3]


def test_scalar_functions(ray_session):
    df = _run(
        "SELECT CONCAT(CAST(a AS VARCHAR), '-', SUBSTR(name, 1, 2)) AS tag, "
        "a % 2 AS parity FROM t ORDER BY a"
    )
    assert list(df.tag) == ["1-al", "2-be", "3-ga", "4-de", "5-ep"]
    assert list(df.parity) == [1, 0, 1, 0, 1]


def test_select_star_order(ray_session):
    df = _run("SELECT * FROM t ORDER BY a DESC LIMIT 1")
    assert df.iloc[0]["name"] == "eps"
