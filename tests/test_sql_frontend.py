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


# ---------------------------------------------- JOIN / GROUP BY
# (ogr_gensql.cpp:1319-1510 secondary-table join; PrepareSummary
# aggregates :849 — here generalised to keyed GROUP BY)


def _two_tables():
    left = pa.table(
        {
            "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "k": pa.array([10, 20, 10, 30, 20, 99], pa.int64()),
            "v": pa.array([1.5, 2.5, 3.5, 4.5, 5.5, 6.5], pa.float64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([10, 20, 30], pa.int64()),
            "tag": pa.array(["x", "y", "z"], pa.string()),
        }
    )
    return left, right


def _run2(sql):
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    left, right = _two_tables()
    return sql_query(
        sql, {"l": rd.from_arrow(left), "r": rd.from_arrow(right)}
    ).to_pandas()


def _duck2(sql):
    import duckdb

    left, right = _two_tables()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(sql).df()


def _assert_matches_duck(sql):
    import pandas as pd

    a = _run2(sql).reset_index(drop=True)
    b = _duck2(sql).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_inner_join(ray_session):
    _assert_matches_duck(
        "SELECT l.id, r.tag FROM l JOIN r ON l.k = r.k ORDER BY id ASC"
    )


def test_left_join_null_fill(ray_session):
    _assert_matches_duck(
        "SELECT l.id, r.tag FROM l LEFT JOIN r ON l.k = r.k ORDER BY id ASC"
    )


def test_join_where_pushdown(ray_session):
    _assert_matches_duck(
        "SELECT l.id, l.v, r.tag FROM l JOIN r ON l.k = r.k "
        "WHERE l.v > 2 AND r.tag <> 'z' ORDER BY id ASC"
    )


def test_group_by_aggregates(ray_session):
    _assert_matches_duck(
        "SELECT k, COUNT(*) AS n, SUM(v) AS sv, MIN(v) AS lo, "
        "MAX(v) AS hi, AVG(v) AS av FROM l GROUP BY k ORDER BY k ASC"
    )


def test_avg_ignores_nulls(ray_session):
    # SQL AVG divides by the NON-NULL count — a null-bearing column
    # must not be averaged over the group size (regression: mean was
    # sum/__n, giving 4/3 instead of 4/2 here)
    import duckdb
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([1.0, None, 3.0, None, None], pa.float64()),
        }
    )
    con = duckdb.connect()
    con.register("t", t)
    for sql in (
        "SELECT g, AVG(v) AS av, SUM(v) AS sv, COUNT(v) AS cv "
        "FROM t GROUP BY g ORDER BY g",
        "SELECT AVG(v) AS av FROM t",
        "SELECT g, AVG(DISTINCT v) AS adv FROM t GROUP BY g ORDER BY g",
    ):
        a = sql_query(sql, {"t": rd.from_arrow(t)}).to_pandas()
        b = con.execute(sql).df()
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b, check_dtype=False
        )


def test_join_group_by(ray_session):
    _assert_matches_duck(
        "SELECT r.tag, COUNT(*) AS n, CAST(SUM(l.v * 2) AS BIGINT) AS s2 "
        "FROM l JOIN r ON l.k = r.k GROUP BY r.tag ORDER BY tag ASC"
    )


def test_global_aggregate_no_group(ray_session):
    _assert_matches_duck("SELECT COUNT(*) AS n, SUM(v) AS sv FROM l")


def test_count_col_counts_non_null(ray_session):
    # left join leaves tag NULL for k=99: COUNT(col) skips it
    _assert_matches_duck(
        "SELECT COUNT(r.tag) AS nn, COUNT(*) AS nall "
        "FROM l LEFT JOIN r ON l.k = r.k"
    )


def test_join_non_equi_nested_loop(ray_session):
    # a join with NO column equality lowers to the broadcast nested
    # loop now — DuckDB-verbatim; LEFT JOIN still requires an equality
    _assert_matches_duck(
        "SELECT l.id AS id, r.k AS rk FROM l JOIN r ON l.k > r.k "
        "ORDER BY id"
    )
    with pytest.raises(ValueError, match="column equality"):
        _run2("SELECT l.id AS id FROM l LEFT JOIN r ON l.k > r.k")


def test_agg_in_where_rejected(ray_session):
    with pytest.raises(ValueError):
        _run2("SELECT k FROM l WHERE SUM(v) > 3 GROUP BY k")


def _dup_table():
    return pa.table(
        {
            "g": pa.array(["x", "x", "x", "y", "y", "z"], pa.string()),
            "u": pa.array([1, 1, 2, 3, 3, None], pa.int64()),
            "v": pa.array([5.0, 6.0, 7.0, 8.0, 9.0, 1.0], pa.float64()),
        }
    )


def test_having(ray_session):
    df = _run(
        "SELECT g, COUNT(*) AS n FROM t GROUP BY g HAVING COUNT(*) > 1 "
        "ORDER BY g",
        _dup_table(),
    ).reset_index(drop=True)
    assert list(df.g) == ["x", "y"]
    assert list(df.n) == [3, 2]


def test_count_distinct_grouped(ray_session):
    df = _run(
        "SELECT g, COUNT(DISTINCT u) AS nu, COUNT(*) AS n FROM t "
        "GROUP BY g ORDER BY g",
        _dup_table(),
    ).reset_index(drop=True)
    # z's only u is NULL -> COUNT(DISTINCT) = 0
    assert list(df.g) == ["x", "y", "z"]
    assert list(df.nu) == [2, 1, 0]
    assert list(df.n) == [3, 2, 1]


def test_count_distinct_keyless(ray_session):
    df = _run("SELECT COUNT(DISTINCT u) AS nu FROM t", _dup_table())
    assert list(df.nu) == [3]


def test_union_all_with_trailing_order(ray_session):
    df = _run(
        "SELECT a AS k FROM t WHERE a <= 2 UNION ALL "
        "SELECT a AS k FROM t WHERE a >= 4 ORDER BY k DESC LIMIT 3"
    )
    assert list(df.k) == [5, 4, 2]


def test_union_all_rejects_inner_order(ray_session):
    with pytest.raises(ValueError):
        parse_select(
            "SELECT a FROM t ORDER BY a UNION ALL SELECT a FROM t"
        )


def test_sum_avg_distinct_grouped(ray_session):
    df = _run(
        "SELECT g, SUM(DISTINCT u) AS su, AVG(DISTINCT u) AS au, "
        "MAX(DISTINCT u) AS mu FROM t GROUP BY g ORDER BY g",
        _dup_table(),
    ).reset_index(drop=True)
    # x: distinct u = {1,2}; y: {3}; z: {} (all NULL) -> SUM/AVG NULL
    assert list(df.g) == ["x", "y", "z"]
    assert list(df.su)[:2] == [3.0, 3.0] and np.isnan(df.su[2])
    assert list(df.au)[:2] == [1.5, 3.0] and np.isnan(df.au[2])
    assert list(df.mu)[:2] == [2, 3]


def test_sum_distinct_keyless(ray_session):
    df = _run("SELECT SUM(DISTINCT u) AS su, COUNT(DISTINCT u) AS cu FROM t",
              _dup_table())
    assert list(df.su) == [6.0] and list(df.cu) == [3]


def test_scalar_subquery_where_and_select(ray_session):
    df = _run(
        "SELECT a, b - (SELECT AVG(b) FROM t) AS delta FROM t "
        "WHERE b > (SELECT AVG(b) FROM t) ORDER BY a"
    )
    assert list(df.a) == [4, 5]
    assert list(df.delta) == [10.0, 20.0]


def test_scalar_subquery_must_be_1x1(ray_session):
    with pytest.raises(ValueError):
        _run("SELECT a FROM t WHERE b > (SELECT b FROM t)")


def test_in_subquery_semi(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    tables = {"t": rd.from_arrow(_table()), "d": rd.from_arrow(_dup_table())}
    df = sql_query(
        "SELECT a FROM t WHERE a IN (SELECT u FROM d) ORDER BY a", tables
    ).to_pandas()
    assert list(df.a) == [1, 2, 3]


def test_not_in_subquery_null_semantics(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    tables = {"t": rd.from_arrow(_table()), "d": rd.from_arrow(_dup_table())}
    # subquery result contains NULL -> NOT IN never TRUE -> empty
    df = sql_query(
        "SELECT a FROM t WHERE a NOT IN (SELECT u FROM d)", tables
    ).to_pandas()
    assert len(df) == 0
    # NULL-free subquery -> plain anti join
    df = sql_query(
        "SELECT a FROM t WHERE a NOT IN (SELECT u FROM d WHERE u IS NOT NULL)"
        " ORDER BY a",
        tables,
    ).to_pandas()
    assert list(df.a) == [4, 5]


def test_in_subquery_with_groupby(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    tables = {"t": rd.from_arrow(_dup_table())}
    df = sql_query(
        "SELECT g, COUNT(*) AS n FROM t WHERE u IN (SELECT u FROM t "
        "WHERE v >= 6.0) GROUP BY g ORDER BY g",
        tables,
    ).to_pandas()
    assert list(df.g) == ["x", "y"]
    assert list(df.n) == [3, 2]


def test_in_subquery_with_join_now_supported(ray_session):
    # was rejected until the probe-owner routing landed; the semi join
    # now applies to t below the main join
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    tables = {"t": rd.from_arrow(_table()), "d": rd.from_arrow(_dup_table())}
    df = sql_query(
        "SELECT t.a AS a FROM t JOIN d ON t.a = d.u "
        "WHERE t.a IN (SELECT u FROM d)",
        tables,
    ).to_pandas()
    uvals = set(_dup_table().column("u").to_pylist())
    avals = set(_table().column("a").to_pylist())
    assert set(df.a) == (avals & uvals) and len(df) > 0


def test_select_distinct(ray_session):
    df = _run(
        "SELECT DISTINCT g FROM t ORDER BY g", _dup_table()
    ).reset_index(drop=True)
    assert list(df.g) == ["x", "y", "z"]
    df = _run(
        "SELECT DISTINCT g, u FROM t WHERE u IS NOT NULL ORDER BY g, u",
        _dup_table(),
    ).reset_index(drop=True)
    assert list(zip(df.g, df.u)) == [("x", 1), ("x", 2), ("y", 3)]


def test_bare_union_dedup(ray_session):
    df = _run(
        "SELECT a AS k FROM t WHERE a <= 3 UNION "
        "SELECT a AS k FROM t WHERE a >= 2 ORDER BY k"
    ).reset_index(drop=True)
    assert list(df.k) == [1, 2, 3, 4, 5]


def test_mixed_union_modes_left_associative(ray_session):
    # (b1 UNION b2) dedups, then UNION ALL b3 re-introduces duplicates
    df = _run(
        "SELECT a AS k FROM t WHERE a = 1 UNION "
        "SELECT a AS k FROM t WHERE a = 1 UNION ALL "
        "SELECT a AS k FROM t WHERE a = 1 ORDER BY k"
    )
    assert list(df.k) == [1, 1]


# ------------------------------- CASE / COALESCE / NULLIF / ILIKE


def _null_table():
    return pa.table(
        {
            "g": pa.array(["a", "a", "b", "b", "c"]),
            "x": pa.array([1, None, 3, 4, None], pa.int64()),
            "y": pa.array([None, 2.5, None, 4.0, 5.0], pa.float64()),
            "s": pa.array(["Alpha", "BETA", None, "gamma", "ALPHARD"]),
        }
    )


def _assert_null_table_matches_duck(sql):
    import duckdb
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    t = _null_table()
    a = sql_query(sql, {"t": rd.from_arrow(t)}).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    b = con.execute(sql).df()
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)].reset_index(drop=True),
        b[sorted(b.columns)].reset_index(drop=True),
        check_dtype=False,
    )


def test_case_searched(ray_session):
    # NULL conditions are not-matched; int+float branches widen
    _assert_null_table_matches_duck(
        "SELECT g, CASE WHEN x > 2 THEN x * 10 WHEN y > 2 THEN 0 "
        "ELSE -1 END AS c1, "
        "CASE WHEN x IS NULL THEN y ELSE x END AS c2 "
        "FROM t ORDER BY g, c1"
    )


def test_case_simple_and_no_else(ray_session):
    # simple CASE desugars to equality (NULL base never matches);
    # missing ELSE yields NULL
    _assert_null_table_matches_duck(
        "SELECT g, CASE g WHEN 'a' THEN 1 WHEN 'b' THEN 2 END AS tag, "
        "CASE x WHEN 3 THEN 'three' ELSE 'other' END AS sx "
        "FROM t ORDER BY g, sx"
    )


def test_case_in_where_and_over_aggregates(ray_session):
    _assert_null_table_matches_duck(
        "SELECT g, SUM(CASE WHEN x IS NULL THEN 0 ELSE x END) AS sx, "
        "CASE WHEN COUNT(*) > 2 THEN 'big' ELSE 'small' END AS sz "
        "FROM t WHERE CASE WHEN g = 'c' THEN 0 ELSE 1 END = 1 "
        "GROUP BY g ORDER BY g"
    )


def test_coalesce_nullif(ray_session):
    _assert_null_table_matches_duck(
        "SELECT g, COALESCE(CAST(x AS DOUBLE), y, -1) AS cx, "
        "NULLIF(g, 'b') AS ng, COALESCE(NULLIF(s, 'BETA'), 'none') AS cs "
        "FROM t ORDER BY g, cx"
    )


def test_ilike(ray_session):
    _assert_null_table_matches_duck(
        "SELECT g, s FROM t WHERE s ILIKE 'alpha%' ORDER BY s"
    )
    _assert_null_table_matches_duck(
        "SELECT g, s FROM t WHERE s NOT ILIKE '%a' ORDER BY s"
    )


def test_rollup_cube_grouping_sets(ray_session):
    """GROUP BY ROLLUP/CUBE: grouping-set expansion matches DuckDB
    verbatim (NULL group keys on rolled-up rows, HAVING per set,
    COALESCE over rolled keys, COUNT(DISTINCT key) unaffected by the
    NULL substitution, trailing ORDER BY null-safe)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.sql import sql_query

    rows = []
    for i in range(60):
        rows.append({"k": i, "seg": f"s{i % 3}", "nat": i % 4,
                     "bal": float(i % 7) - 2.0})
    ds = rd.from_items(rows)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    queries = [
        "SELECT seg, nat, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s "
        "FROM t WHERE bal > 0 GROUP BY ROLLUP (seg, nat) "
        "ORDER BY seg, nat",
        "SELECT seg, nat, COUNT(*) AS n FROM t "
        "GROUP BY CUBE (seg, nat)",
        "SELECT seg, COUNT(*) AS n FROM t GROUP BY ROLLUP (seg) "
        "HAVING COUNT(*) > 10",
        "SELECT COALESCE(seg, 'ALL') AS seg2, "
        "COUNT(DISTINCT nat) AS n_nat, COUNT(*) AS n FROM t "
        "GROUP BY ROLLUP (seg) ORDER BY seg2",
    ]
    for q in queries:
        a = canon(sql_query(q, {"t": ds}).to_pandas())
        b = canon(con.execute(q).fetchdf())
        assert len(a) == len(b), q
        assert a.astype(str).equals(b.astype(str)), q
