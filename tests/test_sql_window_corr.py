"""Window functions + correlated subqueries / EXISTS in the SQL
front-end, cross-checked by running the SAME statement verbatim in
DuckDB on the same tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_ray.pipelines.sql import sql_query


def _orders():
    rng = np.random.default_rng(42)
    n = 400
    return pa.table(
        {
            "okey": pa.array(np.arange(n, dtype=np.int64)),
            "cust": pa.array(rng.integers(0, 23, n)),
            "price": pa.array(np.round(rng.uniform(10, 5000, n), 2)),
            "prio": pa.array(
                [f"P{int(v)}" for v in rng.integers(1, 6, n)], pa.string()
            ),
        }
    )


def _items():
    rng = np.random.default_rng(7)
    n = 900
    return pa.table(
        {
            "okey": pa.array(rng.integers(0, 450, n)),
            "qty": pa.array(rng.integers(1, 50, n)),
            "tax": pa.array(np.round(rng.uniform(0, 0.1, n), 4)),
        }
    )


def _both(sql, tables):
    import ray.data as rd

    ds = sql_query(sql, {k: rd.from_arrow(v) for k, v in tables.items()})
    sch = ds.schema()
    eng = ds.to_pandas()
    if len(eng) == 0 and len(eng.columns) == 0:
        # Ray's to_pandas drops columns when every block is empty; the
        # Dataset schema still carries them
        eng = pd.DataFrame({c: [] for c in sch.names})
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
            else:
                d[c] = pd.to_numeric(d[c], errors="ignore")
        return (
            d.sort_values(list(d.columns))
            .reset_index(drop=True)
            .astype({c: "float64" for c in d.columns if d[c].dtype.kind in "if"})
        )

    a, b = norm(eng), norm(ora)
    assert len(a) == len(b), f"rows {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, atol=1e-9)
    return eng


def test_row_number_rank_dense(ray_session):
    _both(
        "SELECT okey, cust, "
        "ROW_NUMBER() OVER (PARTITION BY cust ORDER BY okey) AS rn, "
        "RANK() OVER (PARTITION BY cust ORDER BY prio DESC, okey) AS rk, "
        "DENSE_RANK() OVER (PARTITION BY cust ORDER BY prio) AS dr "
        "FROM orders",
        {"orders": _orders()},
    )


def test_aggregate_windows(ray_session):
    _both(
        "SELECT okey, cust, "
        "COUNT(*) OVER (PARTITION BY cust) AS n_in_part, "
        "CAST(SUM(price) OVER (PARTITION BY cust) AS DOUBLE) AS tot, "
        "AVG(price) OVER (PARTITION BY cust) AS avg_p, "
        "MIN(price) OVER (PARTITION BY cust) AS lo, "
        "MAX(price) OVER (PARTITION BY cust) AS hi "
        "FROM orders WHERE price > 100",
        {"orders": _orders()},
    )


def test_window_then_order_limit(ray_session):
    _both(
        "SELECT okey, RANK() OVER (PARTITION BY prio ORDER BY price DESC, okey) "
        "AS rk FROM orders WHERE cust < 10 ORDER BY okey LIMIT 50",
        {"orders": _orders()},
    )


def test_window_requires_partition(ray_session):
    with pytest.raises(ValueError):
        sql_query("SELECT RANK() OVER (ORDER BY okey) AS r FROM orders", {})


def test_correlated_scalar_count_and_sum(ray_session):
    # COUNT fills no-match with 0; SUM stays NULL
    _both(
        "SELECT okey, price, "
        "(SELECT COUNT(*) FROM items i WHERE i.okey = o.okey) AS n_items, "
        "(SELECT SUM(qty) FROM items i WHERE i.okey = o.okey AND qty > 25) "
        "AS big_qty "
        "FROM orders o WHERE okey < 120",
        {"orders": _orders(), "items": _items()},
    )


def test_correlated_in_where(ray_session):
    _both(
        "SELECT okey FROM orders o WHERE "
        "(SELECT COUNT(*) FROM items i WHERE i.okey = o.okey) > 3 "
        "ORDER BY okey",
        {"orders": _orders(), "items": _items()},
    )


def test_exists_and_not_exists(ray_session):
    _both(
        "SELECT okey, cust FROM orders o WHERE EXISTS "
        "(SELECT qty FROM items i WHERE i.okey = o.okey AND qty > 40)",
        {"orders": _orders(), "items": _items()},
    )
    _both(
        "SELECT okey FROM orders o WHERE NOT EXISTS "
        "(SELECT qty FROM items i WHERE i.okey = o.okey)",
        {"orders": _orders(), "items": _items()},
    )


def test_uncorrelated_exists_gate(ray_session):
    _both(
        "SELECT okey FROM orders WHERE EXISTS "
        "(SELECT okey FROM items WHERE qty > 49) AND okey < 5",
        {"orders": _orders(), "items": _items()},
    )
    _both(
        "SELECT okey FROM orders WHERE NOT EXISTS "
        "(SELECT okey FROM items WHERE qty > 999) AND okey < 5",
        {"orders": _orders(), "items": _items()},
    )


def test_in_subquery_with_join(ray_session):
    _both(
        "SELECT o.okey AS okey, i.qty AS qty "
        "FROM orders o JOIN items i ON o.okey = i.okey "
        "WHERE o.cust IN (SELECT cust FROM orders WHERE price > 4000) "
        "AND i.qty > 30 ORDER BY okey, qty LIMIT 100",
        {"orders": _orders(), "items": _items()},
    )
    # non-vacuous: the semi-join keeps some but not all join rows
    eng = _both(
        "SELECT o.okey AS okey FROM orders o JOIN items i "
        "ON o.okey = i.okey "
        "WHERE o.cust IN (SELECT cust FROM orders WHERE price > 4000)",
        {"orders": _orders(), "items": _items()},
    )
    assert 0 < len(eng) < 900


def test_not_in_and_exists_with_join(ray_session):
    _both(
        "SELECT o.okey AS okey, i.qty AS qty "
        "FROM orders o JOIN items i ON o.okey = i.okey "
        "WHERE i.qty NOT IN (SELECT qty FROM items WHERE tax > 0.09) "
        "AND EXISTS (SELECT okey FROM orders o2 WHERE o2.okey = i.okey "
        "AND o2.price > 1000) "
        "ORDER BY okey, qty LIMIT 100",
        {"orders": _orders(), "items": _items()},
    )
    eng = _both(
        "SELECT i.okey AS okey, i.qty AS qty FROM orders o "
        "JOIN items i ON o.okey = i.okey "
        "WHERE EXISTS (SELECT okey FROM orders o2 WHERE o2.okey = i.okey "
        "AND o2.price > 4000)",
        {"orders": _orders(), "items": _items()},
    )
    assert 0 < len(eng) < 900


def test_in_probe_on_left_join_right_side_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        sql_query(
            "SELECT o.okey FROM orders o LEFT JOIN items i ON o.okey = i.okey "
            "WHERE i.qty IN (SELECT qty FROM items)",
            {"orders": rd.from_arrow(_orders()),
             "items": rd.from_arrow(_items())},
        )


def test_running_frame_windows(ray_session):
    # DuckDB default frame: RANGE UNBOUNDED PRECEDING..CURRENT ROW
    # (peers included) — running sums over an integer expr are exact
    _both(
        "SELECT okey, cust, "
        "CAST(SUM(okey % 7) OVER (PARTITION BY cust ORDER BY okey) "
        "AS DOUBLE) AS run_tot, "
        "COUNT(*) OVER (PARTITION BY cust ORDER BY okey) AS run_n, "
        "AVG(okey % 7) OVER (PARTITION BY cust ORDER BY okey) AS run_avg, "
        "MIN(price) OVER (PARTITION BY cust ORDER BY okey) AS run_lo, "
        "MAX(price) OVER (PARTITION BY cust ORDER BY okey) AS run_hi "
        "FROM orders",
        {"orders": _orders()},
    )


def test_running_frame_with_peer_ties(ray_session):
    # prio has heavy ties: peers must share the frame value
    _both(
        "SELECT okey, cust, "
        "COUNT(*) OVER (PARTITION BY cust ORDER BY prio) AS run_n, "
        "CAST(SUM(okey % 5) OVER (PARTITION BY cust ORDER BY prio) "
        "AS DOUBLE) AS run_tot "
        "FROM orders WHERE cust < 8",
        {"orders": _orders()},
    )


def test_lag_lead_first_value_ntile(ray_session):
    _both(
        "SELECT okey, cust, "
        "LAG(price) OVER (PARTITION BY cust ORDER BY okey) AS prev_p, "
        "LEAD(price, 2) OVER (PARTITION BY cust ORDER BY okey) AS next2_p, "
        "LAG(prio, 1) OVER (PARTITION BY cust ORDER BY okey) AS prev_s, "
        "FIRST_VALUE(price) OVER (PARTITION BY cust ORDER BY okey) AS fst, "
        "NTILE(4) OVER (PARTITION BY cust ORDER BY okey) AS quartile "
        "FROM orders",
        {"orders": _orders()},
    )


def test_ntile_small_partitions(ray_session):
    _both(
        "SELECT okey, cust, "
        "NTILE(7) OVER (PARTITION BY cust ORDER BY okey) AS t7 "
        "FROM orders WHERE okey < 40",
        {"orders": _orders()},
    )


def test_rows_frame_moving_windows(ray_session):
    _both(
        "SELECT okey, cust, "
        "CAST(SUM(okey % 9) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_tot, "
        "COUNT(*) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n, "
        "AVG(okey % 9) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mov_avg, "
        "MIN(price) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS mov_lo, "
        "MAX(price) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_hi "
        "FROM orders",
        {"orders": _orders()},
    )


def _nullable_orders():
    rng = np.random.default_rng(11)
    n = 500
    o = rng.integers(0, 40, n).astype("float64")
    # integer-valued doubles: prefix-sum differences then stay exact,
    # so engine and DuckDB rows sort identically in the comparison
    x = rng.integers(-500, 500, n).astype("float64")
    # real Arrow NULLs (not NaN values, which DuckDB orders as a value)
    return pa.table(
        {
            "cust": pa.array(rng.integers(0, 17, n)),
            "ts": pa.array(o, mask=rng.random(n) < 0.1),
            "amt": pa.array(x, mask=rng.random(n) < 0.08),
        }
    )


def test_rows_frame_following_bounds(ray_session):
    _both(
        "SELECT okey, cust, "
        "CAST(SUM(okey % 9) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE) AS ctr, "
        "COUNT(*) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fwd_n, "
        "AVG(price) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 1 FOLLOWING AND 4 FOLLOWING) AS fwd_avg, "
        "MIN(price) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS lag_lo, "
        "MAX(price) OVER (PARTITION BY cust ORDER BY okey "
        "ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING) AS tail_hi "
        "FROM orders",
        {"orders": _orders()},
    )


def test_range_frame_value_bounds(ray_session):
    _both(
        "SELECT cust, ts, amt, "
        "SUM(amt) OVER (PARTITION BY cust ORDER BY ts "
        "RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS near_tot, "
        "COUNT(amt) OVER (PARTITION BY cust ORDER BY ts "
        "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS trail_n, "
        "MIN(amt) OVER (PARTITION BY cust ORDER BY ts "
        "RANGE BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fwd_lo, "
        "MAX(amt) OVER (PARTITION BY cust ORDER BY ts "
        "RANGE BETWEEN 2 FOLLOWING AND 6 FOLLOWING) AS gap_hi, "
        "AVG(amt) OVER (PARTITION BY cust ORDER BY ts "
        "RANGE BETWEEN 1 PRECEDING AND UNBOUNDED FOLLOWING) AS tail_avg "
        "FROM ledger",
        {"ledger": _nullable_orders()},
    )


def test_range_frame_desc_order(ray_session):
    _both(
        "SELECT cust, ts, amt, "
        "SUM(amt) OVER (PARTITION BY cust ORDER BY ts DESC "
        "RANGE BETWEEN 4 PRECEDING AND 2 FOLLOWING) AS w "
        "FROM ledger",
        {"ledger": _nullable_orders()},
    )


def test_range_frame_requires_single_order_key(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="exactly one"):
        sql_query(
            "SELECT SUM(price) OVER (PARTITION BY cust ORDER BY okey, "
            "prio RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS w "
            "FROM orders",
            {"orders": rd.from_arrow(_orders())},
        )


def test_window_over_group_by(ray_session):
    # rank groups by their aggregate; nested agg-in-window arg; HAVING
    _both(
        "SELECT cust, prio, CAST(SUM(okey % 7) AS DOUBLE) AS s, "
        "RANK() OVER (PARTITION BY prio ORDER BY SUM(okey % 7) DESC, "
        "cust) AS rk "
        "FROM orders GROUP BY cust, prio",
        {"orders": _orders()},
    )
    _both(
        "SELECT prio, cust, "
        "CAST(SUM(SUM(okey % 7)) OVER (PARTITION BY prio ORDER BY cust) "
        "AS DOUBLE) AS run_tot, COUNT(*) AS nrec "
        "FROM orders GROUP BY prio, cust",
        {"orders": _orders()},
    )
    _both(
        "SELECT prio, cust, "
        "MAX(AVG(price)) OVER (PARTITION BY prio ORDER BY cust "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS mx "
        "FROM orders GROUP BY prio, cust HAVING COUNT(*) > 1",
        {"orders": _orders()},
    )


def test_window_over_join_group_by(ray_session):
    _both(
        "SELECT o.prio, CAST(SUM(i.qty) AS DOUBLE) AS tot, "
        "ROW_NUMBER() OVER (PARTITION BY o.prio ORDER BY SUM(i.qty) "
        "DESC, o.cust) AS rn, o.cust "
        "FROM orders o JOIN items i ON o.okey = i.okey "
        "GROUP BY o.prio, o.cust",
        {"orders": _orders(), "items": _items()},
    )


def test_windowed_global_aggregate_raises(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="GROUP BY"):
        sql_query(
            "SELECT RANK() OVER (PARTITION BY cust ORDER BY SUM(price)) "
            "AS rk FROM orders",
            {"orders": rd.from_arrow(_orders())},
        )


def test_multiple_correlated_equalities(ray_session):
    # two correlated equalities pair into one composite join key
    _both(
        "SELECT okey, cust, "
        "(SELECT COUNT(*) FROM items i WHERE i.okey = o.okey "
        "AND i.qty = o.cust) AS n_match, "
        "(SELECT SUM(tax) FROM items i WHERE i.okey = o.okey "
        "AND i.qty = o.cust AND i.tax > 0.02) AS s_match "
        "FROM orders o WHERE okey < 200",
        {"orders": _orders(), "items": _items()},
    )
    eng = _both(
        "SELECT okey, cust FROM orders o WHERE EXISTS "
        "(SELECT qty FROM items i WHERE i.okey = o.okey "
        "AND i.qty = o.cust)",
        {"orders": _orders(), "items": _items()},
    )
    assert 0 < len(eng) < 400
    _both(
        "SELECT okey FROM orders o WHERE NOT EXISTS "
        "(SELECT qty FROM items i WHERE i.okey = o.okey "
        "AND i.qty = o.cust) ORDER BY okey",
        {"orders": _orders(), "items": _items()},
    )


def test_join_on_residual_conditions(ray_session):
    # non-equi conjuncts in ON: hash join on the equality, residual
    # applied as a post-join filter (inner joins only)
    _both(
        "SELECT o.okey AS okey, i.qty AS qty, i.tax AS tax "
        "FROM orders o JOIN items i ON o.okey = i.okey "
        "AND i.qty > o.cust AND i.tax < 0.08",
        {"orders": _orders(), "items": _items()},
    )
    _both(
        "SELECT o.prio AS prio, COUNT(*) AS n, "
        "CAST(SUM(i.qty) AS DOUBLE) AS sq "
        "FROM orders o JOIN items i ON o.okey = i.okey "
        "AND i.qty <> o.cust WHERE o.price > 500 GROUP BY o.prio",
        {"orders": _orders(), "items": _items()},
    )
    import ray.data as rd

    with pytest.raises(ValueError, match="LEFT JOIN"):
        sql_query(
            "SELECT o.okey FROM orders o LEFT JOIN items i "
            "ON o.okey = i.okey AND i.qty > 10",
            {"orders": rd.from_arrow(_orders()),
             "items": rd.from_arrow(_items())},
        )


def test_bare_count_star(ray_session):
    # regression: COUNT(*)-only summaries used to build a zero-column
    # pre-aggregation table, losing every row
    _both("SELECT COUNT(*) AS n FROM orders", {"orders": _orders()})
    _both(
        "SELECT COUNT(*) AS n FROM orders o JOIN items i "
        "ON o.okey = i.okey",
        {"orders": _orders(), "items": _items()},
    )
