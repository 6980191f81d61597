"""The engine's query surface — one entry per operator (SURVEY.md §2).

Two families:

- SQL-oracle-checked (driver runs the DuckDB SQL in ``ORACLE_SQL`` on
  the same parquet tables and compares row count + schema + value
  hash): relational ops over the TPC-H-ish testdata tables, plus
  spatial ops over geometry DERIVED from those tables with integer
  math mirrored verbatim in the SQL (so float results are
  bit-deterministic in both engines — sums are computed over exact
  integer cents, divisions of exact integers only).

- rows-only (non-SQL-expressible: raster compose, codecs, sketches):
  run over the deterministic synthetic geospatial fixtures
  (gdal_ray.synth) and golden-tested in pytest instead.

Every callable takes ``sf_dir`` and returns a Dataset / DataFrame /
pyarrow Table.  Column names match the oracle SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import mercator
from ..synth.make_table import ensure_fixtures, scale_for_sf_dir
from . import relational as R

# --------------------------------------------------------------- helpers


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col):
    """floor(x*100 + 0.5) as int64 — exact money arithmetic, mirrored in
    SQL as CAST(FLOOR(x*100 + 0.5) AS BIGINT) (half-away rounding on
    both sides; DuckDB ROUND and pyarrow round disagree on ties)."""
    return pc.cast(
        pc.floor(pc.add(pc.multiply(col, pa.scalar(100.0)), pa.scalar(0.5))),
        pa.int64(),
    )


# Derived deterministic geometry (mirrored verbatim in the oracle SQL)

def _derive_points(sf_dir: str):
    """Points from events: exact integer-derived EPSG:3857 coords."""
    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        x = ((eid * 37) % 100000).astype(np.float64) * 25.0
        y = ((uid * 53 + eid) % 100000).astype(np.float64) * 25.0
        return pa.table(
            {
                "pid": pa.array(eid, pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    return ev.map_batches(fn, batch_format="pyarrow")


_PTS_SQL = (
    "SELECT event_id AS pid, ((event_id * 37) % 100000) * 25.0 AS x, "
    "((user_id * 53 + event_id) % 100000) * 25.0 AS y FROM events"
)


def _derive_rects(sf_dir: str, as_wkb: bool):
    """Rectangles from part (exact integer-derived envelopes); with
    ``as_wkb`` the engine also materializes real WKB polygons so the
    full join machinery (WKB parse + ray-casting) runs."""
    from ..functions.geom import wkb_polygon

    pt = _read(sf_dir, "part", columns=["p_partkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False)
        cx = ((k * 91) % 2000).astype(np.float64) * 1250.0
        cy = ((k * 57) % 2000).astype(np.float64) * 1250.0
        hw = (50 + (k % 200)).astype(np.float64) * 100.0
        cols = {
            "fid": pa.array(k, pa.int64()),
            "minx": pa.array(cx - hw, pa.float64()),
            "miny": pa.array(cy - hw, pa.float64()),
            "maxx": pa.array(cx + hw, pa.float64()),
            "maxy": pa.array(cy + hw, pa.float64()),
        }
        if as_wkb:
            wkbs = [
                wkb_polygon(
                    [
                        np.array(
                            [
                                [cx[i] - hw[i], cy[i] - hw[i]],
                                [cx[i] + hw[i], cy[i] - hw[i]],
                                [cx[i] + hw[i], cy[i] + hw[i]],
                                [cx[i] - hw[i], cy[i] + hw[i]],
                                [cx[i] - hw[i], cy[i] - hw[i]],
                            ]
                        )
                    ]
                )
                for i in range(len(k))
            ]
            cols["wkb"] = pa.array(wkbs, pa.binary())
        return pa.table(cols)

    return pt.map_batches(fn, batch_format="pyarrow")


_RECTS_SQL = (
    "SELECT p_partkey AS fid, "
    "((p_partkey * 91) % 2000) * 1250.0 - (50 + (p_partkey % 200)) * 100.0 AS minx, "
    "((p_partkey * 57) % 2000) * 1250.0 - (50 + (p_partkey % 200)) * 100.0 AS miny, "
    "((p_partkey * 91) % 2000) * 1250.0 + (50 + (p_partkey % 200)) * 100.0 AS maxx, "
    "((p_partkey * 57) % 2000) * 1250.0 + (50 + (p_partkey % 200)) * 100.0 AS maxy "
    "FROM part"
)


def _derive_sites(sf_dir: str):
    cu = _read(sf_dir, "customer", columns=["c_custkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        x = ((k * 79) % 100000).astype(np.float64) * 25.0
        y = ((k * 31 + 7) % 100000).astype(np.float64) * 25.0
        return pa.table(
            {
                "sid": pa.array(k, pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
            }
        )

    return cu.map_batches(fn, batch_format="pyarrow")


_SITES_SQL = (
    "SELECT c_custkey AS sid, ((c_custkey * 79) % 100000) * 25.0 AS x, "
    "((c_custkey * 31 + 7) % 100000) * 25.0 AS y FROM customer"
)


# ----------------------------------------------------- relational queries


def q01_lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape: filter + GROUP BY + sum/avg/count (integer-cents
    arithmetic for bit-stable sums; §2.5 aggregates)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
        )
        ep = _cents(t.column("l_extendedprice"))
        dc = _cents(t.column("l_discount"))
        rev = pc.multiply(ep, pc.subtract(pa.scalar(100, pa.int64()), dc))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
                "ep_cents": ep,
                "rev_c4": rev,
            }
        )

    agg = R.grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [
            ("qty", "sum", "sum_qty"),
            ("ep_cents", "sum", "sum_base_cents"),
            ("rev_c4", "sum", "sum_rev_c4"),
            ("qty", "count", "count_order"),
        ],
    )

    def finalize(t: pa.Table) -> pa.Table:
        avg_qty = pc.divide(
            pc.cast(t.column("sum_qty"), pa.float64()),
            pc.cast(t.column("count_order"), pa.float64()),
        )
        sum_rev = pc.divide(pc.cast(t.column("sum_rev_c4"), pa.float64()), pa.scalar(10000.0))
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": t.column("sum_qty"),
                "sum_base_cents": t.column("sum_base_cents"),
                "sum_revenue": sum_rev,
                "avg_qty": avg_qty,
                "count_order": t.column("count_order"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


_Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT))) / 10000.0 AS sum_revenue,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q02_filter_project(sf_dir: str):
    """Attribute filter + field map + computed column (ogr2ogr
    SetFrom/field-map analog, apps/ogr2ogr_lib.cpp:6687)."""
    ds = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("o_totalprice"), pa.scalar(150000.0)))
        cents = _cents(t.column("o_totalprice"))
        return pa.table(
            {
                "okey": t.column("o_orderkey"),
                "status": t.column("o_orderstatus"),
                "price_cents": cents,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow").sort("okey")


_Q02_SQL = """
SELECT o_orderkey AS okey, o_orderstatus AS status,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM orders WHERE o_totalprice > 150000.0 ORDER BY o_orderkey
"""


def q03_sort_topk(sf_dir: str):
    """ORDER BY + LIMIT top-k (ogr_gensql.cpp:2201 CreateOrderByIndex +
    LIMIT; distributed sort with per-batch top-k pruning)."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": pc.cast(t.column("l_linenumber"), pa.int64()),
                "price_cents": _cents(t.column("l_extendedprice")),
            }
        )

    ds = ds.map_batches(prep, batch_format="pyarrow")
    return R.order_by_limit(
        ds, ["price_cents", "l_orderkey", "l_linenumber"], descending=[True, False, False], limit=10
    )


_Q03_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM lineitem ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 10
"""


def q04_distinct(sf_dir: str):
    """SELECT DISTINCT (SWQM_DISTINCT_LIST analog)."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return R.distinct(ds, ["l_returnflag", "l_linestatus"]).sort(
        ["l_returnflag", "l_linestatus"]
    )


_Q04_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


def q05_union_concat(sf_dir: str):
    """UNION ALL of two filtered layers + grouped count (OGRUnionLayer /
    gdalalg_vector_concat analog)."""
    o = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    lo = R.filter_expr(o, pc.field("o_totalprice") < 50000.0)
    hi = R.filter_expr(o, pc.field("o_totalprice") > 250000.0)
    u = lo.union(hi)
    return R.grouped_aggregate(
        u, ["o_orderstatus"], [("o_totalprice", "count", "n")]
    ).sort("o_orderstatus")


_Q05_SQL = """
SELECT o_orderstatus, COUNT(*) AS n FROM (
  SELECT * FROM orders WHERE o_totalprice < 50000.0
  UNION ALL
  SELECT * FROM orders WHERE o_totalprice > 250000.0
) GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q06_broadcast_join(sf_dir: str):
    """Dimension-table broadcast join (ray.put once) + grouped agg."""
    from ..stages.knn import dataset_to_table

    cust = dataset_to_table(
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    )
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "price_cents": _cents(t.column("o_totalprice")),
            }
        )

    joined = R.broadcast_hash_join(
        orders.map_batches(prep, batch_format="pyarrow"), cust, on="c_custkey"
    )
    return R.grouped_aggregate(
        joined,
        ["c_mktsegment"],
        [("price_cents", "sum", "sum_cents"), ("price_cents", "count", "n")],
    ).sort("c_mktsegment")


_Q06_SQL = """
SELECT c_mktsegment,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       COUNT(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q07_hash_join(sf_dir: str):
    """Join suite: both-sides-large hash-partitioned equi-join
    (Dataset.join) + grouped agg (the GROUP-BY superset of the OGR SQL
    JOIN, ogr_gensql.cpp:1319), PLUS rows tagged ``asof_<event_type>``
    from the distributed backward as-of join (relational.asof_join —
    an engine addition, SURVEY §2.4: not present in the reference):
    each event aligned to the latest order of the same user at or
    before its timestamp, aggregated integer-exactly over the matched
    order keys.  Oracle: DuckDB ASOF JOIN of the same shape."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            }
        )

    joined = R.hash_join(
        li.map_batches(prep, batch_format="pyarrow"), orders, on="o_orderkey",
        num_partitions=16,
    )
    eq = R.grouped_aggregate(
        joined,
        ["o_orderpriority"],
        [("qty", "sum", "sum_qty"), ("qty", "count", "n_items")],
    )

    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    od2 = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate",
                                           "o_orderkey"])

    def snap(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t.column("o_custkey"),
                "ts": t.column("o_orderdate"),
                "o_orderkey": t.column("o_orderkey"),
            }
        )

    matched = R.asof_join(
        ev,
        od2.map_batches(snap, batch_format="pyarrow"),
        on="ts", by="user_id", how="inner",
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": pc.binary_join_element_wise(
                    pa.array(["asof"] * t.num_rows, pa.string()),
                    t.column("event_type"), "_",
                ),
                "qty": pc.cast(t.column("o_orderkey"), pa.int64()),
            }
        )

    asof = R.grouped_aggregate(
        matched.map_batches(shape, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("qty", "sum", "sum_qty"), ("qty", "count", "n_items")],
    )

    # range/window rows: events within 2 h AFTER the same user's latest
    # 'purchase' event (validity-window lookup = as-of + tolerance)
    ev2 = _read(sf_dir, "events",
                columns=["event_id", "ts", "user_id", "event_type"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "anchor_id": t.column("event_id"),
            }
        )

    in_window = R.asof_join(
        ev2,
        ev2.map_batches(purchases, batch_format="pyarrow"),
        on="ts", by="user_id", how="inner",
        tolerance=2 * 3600 * 1_000_000,  # 2 h in microseconds
    )

    def shape_r(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": pc.binary_join_element_wise(
                    pa.array(["range"] * t.num_rows, pa.string()),
                    t.column("event_type"), "_",
                ),
                "qty": pc.cast(t.column("anchor_id"), pa.int64()),
            }
        )

    rng = R.grouped_aggregate(
        in_window.map_batches(shape_r, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("qty", "sum", "sum_qty"), ("qty", "count", "n_items")],
    )
    return eq.union(asof).union(rng).sort("o_orderpriority")


_Q07_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, COUNT(*) AS n_items
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderpriority
  UNION ALL
  SELECT 'asof_' || ev.event_type AS o_orderpriority,
         CAST(SUM(sn.o_orderkey) AS BIGINT) AS sum_qty,
         COUNT(*) AS n_items
  FROM events ev
  ASOF JOIN (SELECT o_custkey AS user_id, o_orderdate AS ts, o_orderkey FROM orders) sn
    ON ev.user_id = sn.user_id AND ev.ts >= sn.ts
  GROUP BY ev.event_type
  UNION ALL
  SELECT 'range_' || ev.event_type AS o_orderpriority,
         CAST(SUM(px.anchor_id) AS BIGINT) AS sum_qty,
         COUNT(*) AS n_items
  FROM events ev
  ASOF JOIN (SELECT user_id, ts, event_id AS anchor_id FROM events
             WHERE event_type = 'purchase') px
    ON ev.user_id = px.user_id AND ev.ts >= px.ts
  WHERE epoch_us(ev.ts) - epoch_us(px.ts) <= 7200000000
  GROUP BY ev.event_type
) ORDER BY o_orderpriority
"""


def q08_extent_count(sf_dir: str):
    """GetFeatureCount + GetExtent analog (ogrlayer.cpp:158,224):
    count + envelope min/max over the derived point layer."""
    pts = _derive_points(sf_dir)
    return R.global_aggregate(
        pts,
        [
            ("pid", "count", "n"),
            ("x", "min", "minx"),
            ("y", "min", "miny"),
            ("x", "max", "maxx"),
            ("y", "max", "maxy"),
        ],
    )


_Q08_SQL = f"""
SELECT COUNT(*) AS n, MIN(x) AS minx, MIN(y) AS miny, MAX(x) AS maxx, MAX(y) AS maxy
FROM ({_PTS_SQL})
"""


def q09_cell_assign(sf_dir: str):
    """WebMercator cell assignment at z=12 (GlobalMercator.MetersToTile,
    gdal2tiles.py:473) + per-cell counts, top 20 cells."""
    from ..stages.cells import assign_point_cells

    pts = _derive_points(sf_dir).map_batches(
        assign_point_cells(12), batch_format="pyarrow"
    )

    def unpack(t: pa.Table) -> pa.Table:
        z, x, y = mercator.unpack_cell(t.column("cell").to_numpy(zero_copy_only=False))
        return pa.table(
            {"tx": pa.array(x, pa.int64()), "ty": pa.array(y, pa.int64())}
        )

    cells = pts.map_batches(unpack, batch_format="pyarrow")
    agg = R.grouped_aggregate(cells, ["tx", "ty"], [("tx", "count", "n")])
    return R.order_by_limit(agg, ["n", "tx", "ty"], descending=[True, False, False], limit=20)


_Q09_SQL = f"""
SELECT tx, ty, COUNT(*) AS n FROM (
  SELECT GREATEST(CAST(ceil(((x + 20037508.342789244) / (156543.03392804097 / 4096.0)) / 256.0) AS BIGINT) - 1, 0) AS tx,
         GREATEST(CAST(ceil(((y + 20037508.342789244) / (156543.03392804097 / 4096.0)) / 256.0) AS BIGINT) - 1, 0) AS ty
  FROM ({_PTS_SQL})
) GROUP BY tx, ty ORDER BY n DESC, tx, ty LIMIT 20
"""


def q10_spatial_join(sf_dir: str):
    """The north-star spatial join on derived data: points x rectangle
    polygons through the FULL machinery (cell co-partition at z=10, WKB
    parse, envelope prefilter, exact ray-casting PIP) — oracle is a
    plain SQL range join."""
    from ..stages.join import join_points_in_polygons

    pts = _derive_points(sf_dir)
    rects = _derive_rects(sf_dir, as_wkb=True)
    out = join_points_in_polygons(
        pts, rects, zoom=10, num_partitions=16, point_cols=["pid"], poly_cols=["fid"]
    )
    return out.sort(["pid", "fid"])


_Q10_SQL = f"""
SELECT p.pid, r.fid FROM ({_PTS_SQL}) p, ({_RECTS_SQL}) r
WHERE p.x BETWEEN r.minx AND r.maxx AND p.y BETWEEN r.miny AND r.maxy
ORDER BY p.pid, r.fid
"""


def q11_knn(sf_dir: str):
    """kNN k=3: derived points -> derived sites, exact broadcast
    baseline (ties by sid; oracle = SQL window rank)."""
    from ..stages.knn import dataset_to_table, knn_broadcast

    pts = _derive_points(sf_dir)
    sites = dataset_to_table(_derive_sites(sf_dir))
    out = knn_broadcast(pts, sites, k=3)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": t.column("pid"),
                "sid": t.column("sid"),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort(["pid", "rank"])


_Q11_SQL = f"""
SELECT pid, sid, rank FROM (
  SELECT p.pid, s.sid,
         ROW_NUMBER() OVER (PARTITION BY p.pid
             ORDER BY (p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y), s.sid) AS rank
  FROM ({_PTS_SQL}) p CROSS JOIN ({_SITES_SQL}) s
) WHERE rank <= 3 ORDER BY pid, rank
"""


def q12_window_tumbling(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped batch
    windowing, ray_guide; value summed as exact milli-units)."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour = pc.divide(us, pa.scalar(3600000000, pa.int64()))
        milli = pc.cast(
            pc.floor(
                pc.add(pc.multiply(t.column("value"), pa.scalar(1000.0)), pa.scalar(0.5))
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour": hour,
                "v_milli": milli,
            }
        )

    agg = R.grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "hour"],
        [("v_milli", "sum", "sum_milli"), ("v_milli", "count", "n")],
    )
    return agg.sort(["event_type", "hour"])


_Q12_SQL = """
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_milli, COUNT(*) AS n
FROM events GROUP BY event_type, hour ORDER BY event_type, hour
"""


def q13_exact_dedup(sf_dir: str):
    """Exact dedup of documents by content (hash-partition + min-id per
    group), reported as per-source distinct/total counts."""
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    deduped = exact_dedup(docs, content_col="text", id_col="doc_id")
    return R.grouped_aggregate(
        deduped, ["source"], [("doc_id", "count", "n_unique")]
    ).sort("source")


_Q13_SQL = """
SELECT d.source, COUNT(*) AS n_unique
FROM (SELECT MIN(doc_id) AS keeper FROM documents GROUP BY text) k
JOIN documents d ON d.doc_id = k.keeper
GROUP BY d.source ORDER BY d.source
"""


def q13_windowdup(sf_dir: str):
    """Exact-substring (8-token-window) duplicate detection — the
    Lee-et-al.-2021 training-data dedup step re-expressed as two
    bounded hash-keyed shuffles (stages.dedup.duplicate_window_stats:
    window rolling hashes -> whash-part duplicate marking -> doc-part
    island merge), aggregated per source."""
    from ..stages.dedup import duplicate_window_stats

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    stats = duplicate_window_stats(docs, window=8)
    joined = R.copartition_equi_join(
        stats, docs.select_columns(["doc_id", "source"]),
        lkey="doc_id", rkey="doc_id", num_partitions=8,
        left_schema=[("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                     ("dup_windows", pa.int64()),
                     ("covered_tokens", pa.int64())],
        right_schema=[("doc_id", pa.int64()), ("source", pa.string())])
    return R.grouped_aggregate(
        joined, ["source"],
        [("dup_windows", "count", "n_docs_dup"),
         ("dup_windows", "sum", "sum_dup_windows"),
         ("covered_tokens", "sum", "sum_covered")]).sort("source")


_Q13W_SQL = r"""
WITH tk AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
),
wins AS (
  SELECT t.doc_id, t.source, u.i AS pos, len(t.arr) AS nt,
         array_to_string(t.arr[u.i : u.i + 7], ' ') AS w
  FROM tk t, UNNEST(generate_series(1, len(t.arr) - 7)) AS u(i)
),
dupw AS (SELECT w FROM wins GROUP BY w HAVING COUNT(*) >= 2),
occ AS (SELECT doc_id, source, pos, nt FROM wins
        WHERE w IN (SELECT w FROM dupw)),
perdoc AS (
  SELECT doc_id, source,
         CAST(COUNT(*) AS BIGINT) AS dup_windows,
         CAST(SUM(LEAST(8, COALESCE(next_pos - pos, 8))) AS BIGINT)
           AS covered
  FROM (SELECT doc_id, source, pos, nt,
               LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                 AS next_pos
        FROM occ)
  GROUP BY doc_id, source
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_dup,
       CAST(SUM(dup_windows) AS BIGINT) AS sum_dup_windows,
       CAST(SUM(covered) AS BIGINT) AS sum_covered
FROM perdoc GROUP BY source ORDER BY source
"""


def q13_contamination(sf_dir: str):
    """Benchmark decontamination (pre-training hygiene): documents
    sharing any 8-token window with the benchmark set (deterministic
    fixture rule: doc_id % 97 == 0).  Scale shape: benchmark window
    hashes broadcast once via ray.put; the corpus streams through a
    single no-shuffle map_batches probe
    (stages.dedup.contamination_stats)."""
    import ray

    from ..stages.dedup import (benchmark_window_hashes,
                                contamination_stats)

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def _is_bench(t: pa.Table, keep: bool) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = (ids % 97) == 0
        return t.filter(pa.array(m if keep else ~m))

    bench = docs.map_batches(
        lambda t: _is_bench(t, True).select(["text"]),
        batch_format="pyarrow").take_all()
    bh = ray.put(benchmark_window_hashes(
        [r["text"] for r in bench], window=8))
    corpus = docs.map_batches(lambda t: _is_bench(t, False),
                              batch_format="pyarrow")
    stats = contamination_stats(corpus, bh, window=8)
    joined = R.copartition_equi_join(
        stats, docs.select_columns(["doc_id", "source"]),
        lkey="doc_id", rkey="doc_id", num_partitions=8,
        left_schema=[("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                     ("matched_windows", pa.int64()),
                     ("first_match_pos", pa.int64())],
        right_schema=[("doc_id", pa.int64()), ("source", pa.string())])
    return R.grouped_aggregate(
        joined, ["source"],
        [("matched_windows", "count", "n_docs_contam"),
         ("matched_windows", "sum", "sum_matched")]).sort("source")


_Q13C_SQL = r"""
WITH tk AS (
  SELECT doc_id, source,
         regexp_split_to_array(trim(text), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
),
wins AS (
  SELECT t.doc_id, t.source, u.i AS pos,
         array_to_string(t.arr[u.i : u.i + 7], ' ') AS w
  FROM tk t, UNNEST(generate_series(1, len(t.arr) - 7)) AS u(i)
),
bwins AS (SELECT DISTINCT w FROM wins WHERE doc_id % 97 = 0),
occ AS (SELECT doc_id, source FROM wins
        WHERE doc_id % 97 <> 0 AND w IN (SELECT w FROM bwins)),
perdoc AS (SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS matched
           FROM occ GROUP BY doc_id, source)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs_contam,
       CAST(SUM(matched) AS BIGINT) AS sum_matched
FROM perdoc GROUP BY source ORDER BY source
"""


def q13_dedup(sf_dir: str):
    """Dedup suite: exact content dedup (kind='exact') + exact-
    substring window dedup (kind='windowdup') + benchmark
    decontamination (kind='contam') as tagged rows."""
    ex = q13_exact_dedup(sf_dir)
    wd = q13_windowdup(sf_dir)
    cm = q13_contamination(sf_dir)

    def tag_ex(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "kind": pa.array(["exact"] * n, pa.string()),
            "k1": t.column("source"),
            "v1": pc.cast(t.column("n_unique"), pa.int64()),
            "v2": pa.array([0] * n, pa.int64()),
            "v3": pa.array([0] * n, pa.int64()),
        })

    def tag_wd(t: pa.Table) -> pa.Table:
        return pa.table({
            "kind": pa.array(["windowdup"] * t.num_rows, pa.string()),
            "k1": t.column("source"),
            "v1": pc.cast(t.column("n_docs_dup"), pa.int64()),
            "v2": pc.cast(t.column("sum_dup_windows"), pa.int64()),
            "v3": pc.cast(t.column("sum_covered"), pa.int64()),
        })

    def tag_cm(t: pa.Table) -> pa.Table:
        return pa.table({
            "kind": pa.array(["contam"] * t.num_rows, pa.string()),
            "k1": t.column("source"),
            "v1": pc.cast(t.column("n_docs_contam"), pa.int64()),
            "v2": pc.cast(t.column("sum_matched"), pa.int64()),
            "v3": pa.array([0] * t.num_rows, pa.int64()),
        })

    return (ex.map_batches(tag_ex, batch_format="pyarrow")
            .union(wd.map_batches(tag_wd, batch_format="pyarrow"))
            .union(cm.map_batches(tag_cm, batch_format="pyarrow"))
            .sort(["kind", "k1"]))


_Q13D_SQL = f"""
SELECT * FROM (
  SELECT 'exact' AS kind, source AS k1, n_unique AS v1,
         CAST(0 AS BIGINT) AS v2, CAST(0 AS BIGINT) AS v3
  FROM ({_Q13_SQL.strip()})
  UNION ALL
  SELECT 'windowdup', source, n_docs_dup, sum_dup_windows, sum_covered
  FROM ({_Q13W_SQL.strip()})
  UNION ALL
  SELECT 'contam', source, n_docs_contam, sum_matched,
         CAST(0 AS BIGINT)
  FROM ({_Q13C_SQL.strip()})
)
ORDER BY kind, k1
"""


def q14_token_count(sf_dir: str):
    """Whitespace token counting per doc, aggregated per lang."""
    from ..stages.text import token_count_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    toks = docs.map_batches(token_count_batch, batch_format="pyarrow")
    # copartition (no hash-shuffle aggregator actors): three native
    # joins in one q14 DAG starve each other at small CPU budgets
    joined = R.copartition_equi_join(
        toks, docs.select_columns(["doc_id", "lang"]),
        lkey="doc_id", rkey="doc_id", num_partitions=8,
        left_schema=[("doc_id", pa.int64()), ("n_tokens", pa.int64())],
        right_schema=[("doc_id", pa.int64()), ("lang", pa.string())],
    )
    return R.grouped_aggregate(
        joined, ["lang"], [("n_tokens", "sum", "sum_tokens"), ("n_tokens", "count", "n_docs")]
    ).sort("lang")


_Q14_SQL = """
SELECT lang,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS sum_tokens,
       COUNT(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def q15_text_quality(sf_dir: str):
    """Quality scoring: per-lang alpha/space character ratios from
    exact integer character counts."""
    from ..stages.text import QualityScorer

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    scored = docs.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
    joined = R.copartition_equi_join(
        scored, docs.select_columns(["doc_id", "lang"]),
        lkey="doc_id", rkey="doc_id", num_partitions=8,
        left_schema=[("doc_id", pa.int64()), ("n_chars", pa.int64()),
                     ("alpha_ratio", pa.float64()),
                     ("digit_ratio", pa.float64()),
                     ("punct_ratio", pa.float64()),
                     ("space_ratio", pa.float64()),
                     ("stopword_ratio", pa.float64()),
                     ("mean_word_len", pa.float64())],
        right_schema=[("doc_id", pa.int64()), ("lang", pa.string())],
    )

    def prep(t: pa.Table) -> pa.Table:
        n = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
        alpha = np.round(
            t.column("alpha_ratio").to_numpy(zero_copy_only=False) * np.maximum(n, 1)
        ).astype(np.int64)
        space = np.round(
            t.column("space_ratio").to_numpy(zero_copy_only=False) * np.maximum(n, 1)
        ).astype(np.int64)
        return pa.table(
            {
                "lang": t.column("lang"),
                "n_chars": t.column("n_chars"),
                "alpha": pa.array(alpha, pa.int64()),
                "space": pa.array(space, pa.int64()),
            }
        )

    agg = R.grouped_aggregate(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["lang"],
        [
            ("n_chars", "sum", "sum_chars"),
            ("alpha", "sum", "sum_alpha"),
            ("space", "sum", "sum_space"),
        ],
    )
    return agg.sort("lang")


_Q15_SQL = """
SELECT lang, CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))) AS BIGINT) AS sum_alpha,
       CAST(SUM(length(text) - length(regexp_replace(text, '\\s', '', 'g'))) AS BIGINT) AS sum_space
FROM documents GROUP BY lang ORDER BY lang
"""


def q16_ann_cosine(sf_dir: str):
    """Exact brute-force cosine top-5 for 8 fixed query vectors (vec_id
    0..7) against all embeddings (scores dropped: only int columns are
    compared; ties by vec_id)."""
    import duckdb  # only to read the query vectors deterministically

    from ..stages.ann import ann_cosine_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding FROM parquet_scan('{sf_dir}/embeddings.parquet') "
            "WHERE vec_id < 8 ORDER BY vec_id"
        )
        .fetch_arrow_table()
    )
    queries = np.stack([np.asarray(v, np.float64) for v in qt.column("embedding").to_pylist()])
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False)
    out = ann_cosine_topk(emb, queries, qids, k=5)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": t.column("qid"),
                "vec_id": t.column("vec_id"),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort(["qid", "rank"])


_Q16_SQL = """
SELECT qid, vec_id, rank FROM (
  SELECT q.vec_id AS qid, e.vec_id AS vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC, e.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings e WHERE q.vec_id < 8
) WHERE rank <= 5 ORDER BY qid, rank
"""


def q41_scalar_functions(sf_dir: str):
    """OGR SQL scalar-operator parity (swq_op_registrar.cpp:28-62):
    LIKE, IN, BETWEEN, CONCAT, SUBSTR, CAST, arithmetic %, CASE-ish
    boolean — all as pyarrow.compute kernels."""
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_type", "p_size", "p_retailprice"])

    def fn(t: pa.Table) -> pa.Table:
        name = t.column("p_name")
        like_hit = pc.match_like(name, "%steel%")
        in_hit = pc.is_in(
            t.column("p_size"), value_set=pa.array([5, 10, 15, 20], pa.int32())
        )
        between = pc.and_(
            pc.greater_equal(t.column("p_retailprice"), pa.scalar(500.0)),
            pc.less_equal(t.column("p_retailprice"), pa.scalar(1500.0)),
        )
        keep = pc.or_(pc.and_(like_hit, between), in_hit)
        t = t.filter(keep)
        concat = pc.binary_join_element_wise(
            pc.cast(t.column("p_partkey"), pa.string()), t.column("p_type"), ":"
        )
        substr = pc.utf8_slice_codeunits(t.column("p_name"), 0, 8)
        modkey = pc.cast(
            pc.subtract(
                t.column("p_partkey"),
                pc.multiply(pc.divide(t.column("p_partkey"), pa.scalar(7, pa.int64())), pa.scalar(7, pa.int64())),
            ),
            pa.int64(),
        )
        # DuckDB ROUND is half-away-from-zero; mirror with floor(x+0.5)
        # (values are positive prices with exact .5 cases)
        price_int = pc.cast(
            pc.floor(pc.add(t.column("p_retailprice"), pa.scalar(0.5))), pa.int64()
        )
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "tagged": concat,
                "name8": substr,
                "key_mod7": modkey,
                "price_int": price_int,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow").sort("p_partkey")


_Q41_SQL = """
SELECT p_partkey,
       CONCAT(CAST(p_partkey AS VARCHAR), ':', p_type) AS tagged,
       SUBSTR(p_name, 1, 8) AS name8,
       p_partkey % 7 AS key_mod7,
       CAST(FLOOR(p_retailprice + 0.5) AS BIGINT) AS price_int
FROM part
WHERE (p_name LIKE '%steel%' AND p_retailprice BETWEEN 500.0 AND 1500.0)
   OR p_size IN (5, 10, 15, 20)
ORDER BY p_partkey
"""


def q42_left_outer_join(sf_dir: str):
    """LEFT JOIN with null padding (the OGR SQL JOIN null-fill
    behavior, ogr_gensql.cpp:1319-1510): customers with their order
    counts including customers with no orders."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "o_orderkey": t.column("o_orderkey"),
            }
        )

    joined = cust.join(
        orders.map_batches(prep, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=8,
        on=("c_custkey",),
    )

    def count_fn(t: pa.Table) -> pa.Table:
        has = pc.is_valid(t.column("o_orderkey")).cast(pa.int64())
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "has_order": has,
            }
        )

    agg = R.grouped_aggregate(
        joined.map_batches(count_fn, batch_format="pyarrow"),
        ["c_custkey", "c_mktsegment"],
        [("has_order", "sum", "n_orders")],
    )
    return agg.sort("c_custkey")


_Q42_SQL = """
SELECT c_custkey, c_mktsegment,
       CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey
"""


def q46_sliding_window(sf_dir: str):
    """Sliding window (2h size, 1h slide) per event_type: each event
    lands in two windows (flat replication inside map_batches — the
    batch expression of a sliding window, ray_guide 'Streaming-shaped
    workloads')."""
    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3600000000
        milli = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 1000.0 + 0.5
        ).astype(np.int64)
        et = t.column("event_type")
        n = len(hour)
        # window starts: hour and hour-1 (2h windows sliding by 1h)
        ws = np.concatenate([hour, hour - 1])
        idx = np.concatenate([np.arange(n), np.arange(n)])
        return pa.table(
            {
                "event_type": et.take(pa.array(idx, pa.int64())),
                "ws": pa.array(ws, pa.int64()),
                "v_milli": pa.array(milli[idx], pa.int64()),
            }
        )

    agg = R.grouped_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "ws"],
        [("v_milli", "sum", "sum_milli"), ("v_milli", "count", "n")],
    )
    return agg.sort(["event_type", "ws"])


_Q46_SQL = """
SELECT event_type, ws, CAST(SUM(v_milli) AS BIGINT) AS sum_milli, COUNT(*) AS n
FROM (
  SELECT event_type,
         epoch_us(ts) // 3600000000 - k.k AS ws,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_milli
  FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
)
GROUP BY event_type, ws ORDER BY event_type, ws
"""


def q47_session_window(sf_dir: str):
    """Session windows per user (30-min inactivity gap): groupby(user)
    -> per-group sorted gap-split (the keyed stateful-window pattern);
    per user: n_sessions, n_events, total span seconds."""
    ev = _read(sf_dir, "events", columns=["ts", "user_id", "event_id"])
    GAP_US = 30 * 60 * 1_000_000
    P = 32

    def add_part(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        u = (u ^ (u >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        u = u ^ (u >> np.uint64(33))
        return t.append_column(
            "__spart", pa.array((u % np.uint64(P)).astype(np.int64), pa.int64())
        )

    def sessions_part(g: pa.Table) -> pa.Table:
        # one vectorized call per hash partition (NOT one per user):
        # sort by (user, ts, event_id), split sessions at user changes
        # or >30-min gaps, then per-user reductions via reduceat
        # (pyarrow group container; internals are pure numpy)
        us_raw = (g.column("ts").to_numpy(zero_copy_only=False)
                  .astype("datetime64[us]").astype(np.int64))
        uid_raw = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us_raw, uid_raw))
        us, uid = us_raw[order], uid_raw[order]
        n = len(uid)
        new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[GAP_US + 1], np.diff(us)])
        new_sess = new_user | (gap > GAP_US)
        s_start = np.flatnonzero(new_sess)
        s_end = np.append(s_start[1:], n)
        span_us = us[s_end - 1] - us[s_start]
        s_user = uid[s_start]  # non-decreasing
        u_start = np.flatnonzero(new_user)
        users = uid[u_start]
        n_events = np.diff(np.append(u_start, n))
        first_sess = np.searchsorted(s_user, users)
        n_sessions = np.diff(np.append(first_sess, len(s_user)))
        span_s = (
            np.add.reduceat(span_us, first_sess) // 1_000_000
            if len(s_user)
            else np.array([], np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
                "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
                "span_s": pa.array(span_s.astype(np.int64), pa.int64()),
            }
        )

    return (
        ev.map_batches(add_part, batch_format="pyarrow")
        .groupby("__spart")
        .map_groups(sessions_part, batch_format="pyarrow")
        .sort("user_id")
    )


_Q47_SQL = """
SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
       CAST(SUM(n_in_sess) AS BIGINT) AS n_events,
       CAST(SUM(span_end - span_start) // 1000000 AS BIGINT) AS span_s
FROM (
  SELECT user_id, sess_id, COUNT(*) AS n_in_sess,
         MIN(epoch_us(ts)) AS span_start, MAX(epoch_us(ts)) AS span_end
  FROM (
    SELECT user_id, ts,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sess_id
    FROM (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 1800000000
                  OR LAG(epoch_us(ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
  )
  GROUP BY user_id, sess_id
)
GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------ rows-only (non-SQL) ops


def q17_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs over documents."""
    from ..stages.dedup import minhash_lsh_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_lsh_pairs(docs, threshold=0.5).sort(["doc_a", "doc_b"])


def q18_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(docs, max_hamming=3).sort(["doc_a", "doc_b"])


def q19_langid(sf_dir: str):
    from ..stages.text import LangId

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=2).sort("doc_id")


# the engine's first-max-wins vote (LangId iterates en,de,fr,es and only
# updates on strictly-greater counts) mirrored as a CASE cascade: branch
# k passes iff count_k > 0 and >= every LATER count — if an earlier
# count were strictly greater, that earlier branch would have passed
_Q19_SQL = """
SELECT doc_id, CASE
    WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
    WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
    WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
    WHEN n_es > 0 THEN 'es'
    ELSE 'und' END AS pred_lang
FROM (
  SELECT doc_id,
    len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) AS n_en,
    len(list_filter(toks, w -> w IN ('der','die','das','und','ist','nicht','ein','mit','auf','für'))) AS n_de,
    len(list_filter(toks, w -> w IN ('le','la','les','et','est','un','une','des','dans','pour'))) AS n_fr,
    len(list_filter(toks, w -> w IN ('el','la','los','las','y','es','un','una','en','por'))) AS n_es
  FROM (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents)
) ORDER BY doc_id
"""


def q20_fingerprint(sf_dir: str):
    from ..stages.text import Fingerprinter

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(Fingerprinter, batch_format="pyarrow", concurrency=2).sort(
        "doc_id"
    )


def q21_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate ANN (scale path of q16)."""
    import duckdb

    from ..stages.ann import ann_lsh_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding FROM parquet_scan('{sf_dir}/embeddings.parquet') "
            "WHERE vec_id < 8 ORDER BY vec_id"
        )
        .fetch_arrow_table()
    )
    queries = np.stack([np.asarray(v, np.float64) for v in qt.column("embedding").to_pylist()])
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False)
    out = ann_lsh_topk(emb, queries, qids, k=5)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": t.column("qid"),
                "vec_id": t.column("vec_id"),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort(["qid", "rank"])


def q22_images_cells(sf_dir: str):
    """Cell assignment of the image fixture table at the join zoom —
    per-cell chip counts (skew visible: the hot cell dominates)."""
    import ray.data as rd

    from ..stages.cells import cover_envelope_cells

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "minx", "miny", "maxx", "maxy"])
    covered = imgs.map_batches(cover_envelope_cells(10), batch_format="pyarrow")
    return R.grouped_aggregate(covered, ["cell"], [("cell", "count", "n")]).sort(
        ["cell"]
    )


def q23_spatial_join_images(sf_dir: str):
    """Flagship: image chips x polygon layer intersects join (fixtures),
    exactly-once, with caption carry-through."""
    import ray.data as rd

    from ..stages.join import join_chips_with_polygons

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "caption", "minx", "miny", "maxx", "maxy"]
    )
    pol = rd.read_parquet(paths["polygons"])
    return join_chips_with_polygons(
        imgs, pol, zoom=10, num_partitions=16,
        chip_cols=["image_id", "caption"], poly_cols=["fid", "category"],
    ).sort(["image_id", "fid"])


def q24_tile_pyramid(sf_dir: str):
    """Tile pyramid z10..z8 over the image fixtures; returns per-tile
    checksums (the gdal2tiles golden pattern)."""
    import ray.data as rd

    from ..stages.tiles import build_pyramid, tiles_checksum

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    levels = build_pyramid(imgs, z_max=10, z_min=8, resampling="near")
    out = None
    for z in sorted(levels):
        cs = tiles_checksum(levels[z])
        out = cs if out is None else out.union(cs)
    return out.sort(["z", "x", "y"])


def q25_warp(sf_dir: str):
    """Warp all fixture chips 3857->4326 (bilinear, EXACT transformer —
    the -et 0 gdalwarp path, so the independent oracle can restate the
    closed-form inverse; the 0.125-px approx transformer is covered by
    its error-bound pytest and the bench pipeline) and checksum the
    outputs."""
    import ray.data as rd

    from ..functions import checksum, codecs
    from ..stages.warp import warp_images

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"] + ["srs"])
    warped = warp_images(imgs, resampling="bilinear", concurrency=4, use_approx=False)

    def cs(t: pa.Table) -> pa.Table:
        b = t.column("bytes").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        f = t.column("fmt").to_pylist()
        out = np.empty((len(b), 3), dtype=np.int64)
        for i in range(len(b)):
            out[i] = checksum.checksum_image(codecs.decode(b[i], w[i], h[i], f[i]))
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "cs_r": pa.array(out[:, 0]),
                "cs_g": pa.array(out[:, 1]),
                "cs_b": pa.array(out[:, 2]),
            }
        )

    return warped.map_batches(cs, batch_format="pyarrow").sort("image_id")


def q26_phash_neardup(sf_dir: str):
    """Image near-dup pairs via phash bands + Hamming."""
    import ray.data as rd

    from ..stages.dedup import phash_neardup_pairs

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "phash"])
    return phash_neardup_pairs(imgs, max_hamming=6).sort(["id_a", "id_b"])


def q27_knn_cell_ring(sf_dir: str):
    """Scale-path kNN (cell-ring expansion) — same result as q11."""
    from ..stages.knn import knn_cell_ring

    pts = _derive_points(sf_dir)
    sites = _derive_sites(sf_dir)
    # broadcast_max_sites=0 forces the distributed ring-expansion tail
    # (the 100-TB path) even though the fixture site table is small
    out = knn_cell_ring(
        pts, sites, k=3, zoom=7, num_partitions=16, broadcast_max_sites=0
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pid": t.column("pid"),
                "sid": t.column("sid"),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort(["pid", "rank"])


def q28_embedding_neardup(sf_dir: str):
    from ..stages.ann import embedding_neardup_pairs

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # bands x 2^planes = 16 x 4096 = 65,536 effective buckets — the
    # 100-TB granularity (vs the r2 single 1,024-bucket table)
    return embedding_neardup_pairs(
        emb, threshold=0.35, bands=16, planes_per_band=12
    ).select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])


def q29_band_stats(sf_dir: str):
    """Band statistics min/max/mean/stddev via blockwise partials
    (gdalrasterband.cpp:5325 ComputeStatistics semantics)."""
    import ray.data as rd

    from ..stages.stats import band_statistics

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    return band_statistics(
        rd.read_parquet(paths["images"], columns=["bytes", "w", "h", "fmt"])
    )


def q30_band_histogram(sf_dir: str):
    """256-bucket per-band histogram (bincount partials + merge)."""
    import ray.data as rd

    from ..stages.stats import band_histogram

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    return band_histogram(
        rd.read_parquet(paths["images"], columns=["bytes", "w", "h", "fmt"])
    )


def q31_raster_steps(sf_dir: str):
    """Raster pipeline step suite (`gdal raster ...` step algebra,
    apps/gdalalg_raster_*.cpp): translate (srcwin crop + resize + band
    reorder + scale), reclassify (vrtreclassifier.cpp interval
    mapping), unscale, nodata-to-alpha (NODATA_VALUES tuple), HSV
    color-merge (gdalalg_raster_color_merge.cpp), and band stack —
    each as one op-tagged checksum row per chip.  Runs through the
    FUSED one-decode-per-chip actor stage (stages/pixelops.py
    RasterStepSuite) — the general distributed two-input operators
    (color_merge_images / stack_images, bucket-hash co-partition) are
    the public API and are exercised in tests/test_pixelops.py."""
    import ray.data as rd

    from ..stages.pixelops import raster_step_suite

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"],
        columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    out = raster_step_suite(
        imgs,
        mapping="[0,63]=10;(63,127]=20;[128,191)=30;255=77;DEFAULT=40",
        translate_kwargs=dict(
            srcwin=(2, 2, 12, 12),
            out_size=(24, 24),
            resampling="bilinear",
            bands=[2, 1, 0],
            scale=(0, 255, 30, 220),
        ),
        unscale_scale=0.5,
        unscale_offset=10.0,
        n2a_nodata=(0.0, 0.0, 0.0),
    )
    return out.union(_mdim_suite()).sort(["image_id", "op"])


def _mdim_fill(i, j, k):
    """Deterministic non-negative int64 fill for the mdim fixture array
    (mirrored by the rasterref golden)."""
    return (i * 97 + j * 89 + k * 83) % 1000 + (i * j) % 57


def _mdim_suite():
    """Multidim N-D array op suite (gcore/gdalmultidim.cpp analog —
    see stages/mdim.py): a 48x64x64 int64 array on a 16^3 chunk grid,
    exercised through transpose (zero-shuffle), an UNALIGNED slice
    (local re-chunk + one merge shuffle), elementwise calc, sum/mean
    reductions (partial -> one groupby), and a 2x area resample; one
    checksum row per output chunk, schema-compatible with the q31
    step rows."""
    from ..stages import mdim as M

    spec = M.MDSpec((48, 64, 64), (16, 16, 16), "int64")
    base = M.mdim_create(spec, _mdim_fill, parallelism=16)
    parts = [M.mdim_chunk_checksums(base, spec, "mdim_base")]
    tr, tr_spec = M.mdim_transpose(base, spec, (2, 0, 1))
    parts.append(M.mdim_chunk_checksums(tr, tr_spec, "mdim_transpose"))
    sl, sl_spec = M.mdim_slice(base, spec, [(8, 40), (16, 48), (4, 60)])
    parts.append(M.mdim_chunk_checksums(sl, sl_spec, "mdim_slice"))
    ca, ca_spec = M.mdim_calc(base, spec, lambda a: a * 3 + 1)
    parts.append(M.mdim_chunk_checksums(ca, ca_spec, "mdim_calc"))
    s0, s0_spec = M.mdim_reduce(base, spec, "sum", 0)
    parts.append(M.mdim_chunk_checksums(s0, s0_spec, "mdim_sum0"))
    m2, m2_spec = M.mdim_reduce(base, spec, "mean", 2)
    parts.append(M.mdim_chunk_checksums(m2, m2_spec, "mdim_mean2"))
    rs, rs_spec = M.mdim_resample2x(base, spec, (1, 2))
    parts.append(M.mdim_chunk_checksums(rs, rs_spec, "mdim_resample"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def q32_hillshade(sf_dir: str):
    """The full gdaldem derivative suite over band 0 of every chip —
    hillshade (standard Horn + ZT gradient, multidirectional, combined,
    Igor), slope (degrees Horn/ZT + percent), aspect (azimuth Horn/ZT +
    trigonometric), TRI/TPI/roughness — one decode per chip, checksums
    fused into the actor task (apps/gdaldem_lib.cpp surface); returns
    (image_id, op, cs) rows."""
    import ray.data as rd

    from ..stages.dem import dem_checksum_suite

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    return dem_checksum_suite(imgs, concurrency=4).sort(["image_id", "op"])


def q33_rasterize_polygonize(sf_dir: str):
    """Rasterize the polygon layer at z10 then polygonize with seam
    merge; returns merged components (value, pixel_count, n_cells)."""
    import ray.data as rd

    from ..stages.polygonize import polygonize
    from ..stages.rasterize import rasterize_polygons

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pol = rd.read_parquet(paths["polygons"]).map_batches(
        lambda t: t.append_column(
            "burn",
            pa.array(
                (t.column("fid").to_numpy(zero_copy_only=False) % 254 + 1).astype(
                    np.int64
                )
            ),
        ),
        batch_format="pyarrow",
    )
    cells = rasterize_polygons(pol, zoom=10, value_col="burn")
    return polygonize(cells).sort(["comp_id"])


def q34_checkpointed_tiles(sf_dir: str):
    """Tile build + resumable partitioned sink with lineage manifest;
    returns per-partition counters."""
    import shutil

    import ray.data as rd

    from ..stages.tiles import build_base_tiles
    from ..state.checkpoint import write_partitioned

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    out_dir = f"/tmp/gdal_ray_out/tiles_{scale_for_sf_dir(sf_dir)}"
    shutil.rmtree(out_dir, ignore_errors=True)
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    tiles = build_base_tiles(imgs, zoom=9, resampling="near")
    return write_partitioned(tiles, out_dir, key_col="cell", shift=6).sort("pid")


def q35_grid_invdist(sf_dir: str):
    """gdal_grid analog: T3 points (weight = pid-derived) -> per-cell
    rasters with 1-ring halo, one branch per interpolation algorithm
    (inverse-distance, Delaunay piecewise-linear, and radius-gated
    nearest-n invdistnn); returns per-cell grid checksums tagged by
    algorithm."""
    import ray.data as rd

    from ..functions import checksum
    from ..stages.grid import grid_points

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pts = rd.read_parquet(paths["points"]).map_batches(
        lambda t: t.append_column(
            "v",
            pa.array(
                ((t.column("pid").to_numpy(zero_copy_only=False) * 37) % 251).astype(
                    np.float64
                )
            ),
        ),
        batch_format="pyarrow",
    )

    def cs(algorithm: str):
        def fn(t: pa.Table) -> pa.Table:
            vals = [
                checksum.checksum_float_band(
                    np.frombuffer(g, dtype=np.float64).reshape(64, 64)
                )
                for g in t.column("grid").to_pylist()
            ]
            return pa.table(
                {
                    "algorithm": pa.array([algorithm] * t.num_rows, pa.string()),
                    "z": pc.cast(t.column("z"), pa.int64()),
                    "x": pc.cast(t.column("x"), pa.int64()),
                    "y": pc.cast(t.column("y"), pa.int64()),
                    "n_points": pc.cast(t.column("n_points"), pa.int64()),
                    "cs": pa.array(vals, pa.int64()),
                }
            )

        return fn

    branches = [
        grid_points(pts, zoom=8, algorithm=alg, grid_size=64, **kw).map_batches(
            cs(alg), batch_format="pyarrow"
        )
        for alg, kw in (
            ("invdist", {}),
            ("linear", {}),
            # gdal_grid -a invdistnn: 40 km radius, 8 nearest, >=2
            # neighbours required, 5 km smoothing
            (
                "invdistnn",
                dict(radius=40000.0, max_points=8, min_points=2,
                     smoothing=5000.0),
            ),
        )
    ]
    return branches[0].union(*branches[1:]).sort(["algorithm", "z", "x", "y"])


def q36_proximity_sieve(sf_dir: str):
    """Proximity + sieve over rasterized polygons; per-cell summary
    (mean distance, pixels surviving the sieve)."""
    import ray.data as rd

    from ..stages.grid import proximity_cells, sieve_cells
    from ..stages.rasterize import rasterize_polygons

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pol = rd.read_parquet(paths["polygons"])
    cells = rasterize_polygons(pol, zoom=8, burn_value=1).materialize()
    prox = proximity_cells(cells, max_dist=64.0)
    sieved = sieve_cells(cells, threshold=20)

    def summarize_prox(t: pa.Table) -> pa.Table:
        means = [
            float(np.frombuffer(d, dtype=np.float32).mean())
            for d in t.column("data").to_pylist()
        ]
        return pa.table(
            {
                "cell": t.column("cell"),
                "mean_dist": pa.array(np.round(means, 3), pa.float64()),
            }
        )

    def summarize_sieve(t: pa.Table) -> pa.Table:
        n = [
            int((np.frombuffer(d, dtype=np.uint8) > 0).sum())
            for d in t.column("data").to_pylist()
        ]
        return pa.table(
            {"cell": t.column("cell"), "n_after_sieve": pa.array(n, pa.int64())}
        )

    a = prox.map_batches(summarize_prox, batch_format="pyarrow")
    b = sieved.map_batches(summarize_sieve, batch_format="pyarrow")
    return a.join(b, join_type="inner", num_partitions=8, on=("cell",)).sort("cell")


def q37_point_query(sf_dir: str):
    """gdallocationinfo analog: bilinear-sample every chip containing
    each T3 probe point (cell co-partitioned)."""
    import ray.data as rd

    from ..stages.grid import query_points_in_chips

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"])
    probes = rd.read_parquet(paths["points"], columns=["pid", "x", "y"])
    return query_points_in_chips(imgs, probes, zoom=10, num_partitions=8).sort(
        ["pid", "image_id"]
    )


def q38_contour(sf_dir: str):
    """Contour suite, both output modes of gdal_contour
    (alg/contour.cpp:568, distributed): 'line' rows are cross-cell
    stitched iso-POLYLINES (exact endpoint matching + min-label
    propagation); 'poly' rows are contour POLYGONS (-p;
    polygon_ring_appender.h semantics) — level-band region boundaries
    as closed rings with signed trapezoid areas (exterior negative,
    holes positive).  One shared field-grid build; each mode is its
    own one-shuffle stitch."""
    import ray.data as rd

    from ..stages.contour import (
        contour_cells,
        contour_polygon_cells,
        field_cells,
    )

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["minx", "miny", "maxx", "maxy"])
    cells = field_cells(imgs, zoom=8, grid=64).materialize()

    def shape_line(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["line"] * t.num_rows, pa.string()),
                "level": t.column("level"),
                "comp_id": t.column("comp_id"),
                "n_segments": t.column("n_segments"),
                "length_mm": t.column("length_mm"),
                "closed": t.column("closed"),
                "area_px2_milli": pa.array(
                    np.zeros(t.num_rows, np.int64), pa.int64()
                ),
            }
        )

    def shape_poly(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["poly"] * t.num_rows, pa.string()),
                "level": t.column("band"),
                "comp_id": t.column("comp_id"),
                "n_segments": t.column("n_segments"),
                "length_mm": t.column("length_mm"),
                "closed": pa.array([True] * t.num_rows, pa.bool_()),
                "area_px2_milli": t.column("area_px2_milli"),
            }
        )

    lines = contour_cells(cells).map_batches(shape_line, batch_format="pyarrow")
    polys = contour_polygon_cells(cells).map_batches(
        shape_poly, batch_format="pyarrow"
    )
    return lines.union(polys).sort(["kind", "level", "comp_id"])


def q39_color_quantize(sf_dir: str):
    """Median-cut palette + Floyd-Steinberg dither per chip
    (gdalmediancut/gdaldither analogs); returns checksum of the
    palettized indices."""
    import ray.data as rd

    from ..functions import checksum, codecs, colors

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt"])

    def fn(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        n = t.num_rows
        cs_q = []
        pals = np.empty((n, 16, 3), dtype=np.uint8)
        crops = np.empty((n, 16, 16, 3), dtype=np.uint8)
        for i in range(n):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            pals[i] = colors.median_cut_palette(img, 16)
            cs_q.append(checksum.checksum_band(colors.quantize(img, pals[i])))
            crops[i] = img[:16, :16]  # all fixture chips are >= 16x16
        # 16x16 window keeps the oracle's independent NAIVE dither
        # tractable; the engine path is the batched wavefront
        # (bit-identical per chip — tests/test_colors_contour_sinks)
        dithered = colors.dither_floyd_steinberg_batch(crops, pals)
        cs_d = [checksum.checksum_band(dithered[i]) for i in range(n)]
        return pa.table(
            {
                "image_id": pa.array(cols["image_id"], pa.string()),
                "cs_quant": pa.array(cs_q, pa.int64()),
                "cs_dither": pa.array(cs_d, pa.int64()),
            }
        )

    return imgs.map_batches(fn, batch_format="pyarrow", batch_size=64).sort("image_id")


def q40_tile_tree(sf_dir: str):
    """gdal2tiles-layout z/x/y.png file-tree sink with resume; returns
    written/skipped counters."""
    import shutil

    import ray.data as rd

    from ..sources.sinks import write_tile_tree
    from ..stages.tiles import build_base_tiles

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    out_dir = f"/tmp/gdal_ray_out/tree_{scale_for_sf_dir(sf_dir)}"
    shutil.rmtree(out_dir, ignore_errors=True)
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    tiles = build_base_tiles(imgs, zoom=8, resampling="near")
    out = write_tile_tree(tiles, out_dir, xyz=True)
    return R.global_aggregate(
        out, [("written", "sum", "written"), ("skipped", "sum", "skipped")]
    )


def q43_mvt_tiles(sf_dir: str):
    """MVT vector-tile writer, all three geometry classes
    (OGRMVTWriterDataset analog, ogrmvtdataset.cpp:3323): polygon,
    boundary-line and point layers at z8; per-tile per-layer feature
    counts (the encoded protobuf is round-trip-decoded in pytest)."""
    import ray.data as rd

    from ..stages.mvt import write_mvt_layers

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pol = rd.read_parquet(
        paths["polygons"], columns=["fid", "wkb", "minx", "miny", "maxx", "maxy"]
    )
    pts = rd.read_parquet(paths["points"], columns=["pid", "x", "y"])
    tiles = write_mvt_layers(pol, pts, zoom=8)
    return tiles.select_columns(
        ["z", "x", "y", "n_polys", "n_lines", "n_points"]
    ).sort(["z", "x", "y"])


def q44_pansharpen_nearblack(sf_dir: str):
    """Pansharpen (weighted Brovey) + nearblack collar removal; per-chip
    output checksums + collar pixel counts."""
    import ray.data as rd

    from ..stages.pansharpen import PansharpenStage, nearblack_stage
    from ..stages.stats import image_checksums

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(paths["images"], columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"])
    sharp = imgs.map_batches(
        PansharpenStage, batch_format="pyarrow", batch_size=64, concurrency=4
    )
    nb = nearblack_stage(sharp)
    cs = image_checksums(nb.drop_columns(["n_collar"]))
    return cs.sort("image_id")


def q45_viewshed(sf_dir: str):
    """Viewshed suite over band-0 elevation: mode='single' = the Wang
    et al. reference-plane sweep from the chip center
    (alg/viewshed/viewshed.cpp semantics); mode='cumulative' = the
    observer-grid accumulation mode (alg/viewshed/cumulative.cpp:66-68:
    observers every 32 px starting at 0 in both axes, normal-mode
    1-for-visible rasters summed; n_visible = Σ per-pixel count,
    frac_visible = count/(npx·n_obs)).  Per-chip rows, both modes from
    ONE decode.  Runs on the chips with w,h <= 64 (an explicit
    predicate: the independent per-pixel oracle recursion is O(px·obs)
    per chip)."""
    import ray.data as rd

    from ..stages.viewshed import (
        cumulative_viewshed_counts,
        los_ray_suite,
        viewshed_mask_wang,
    )

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "bytes", "w", "h", "fmt"]
    )

    def small(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.less_equal(t.column("w"), pa.scalar(64, pa.int32())),
                pc.less_equal(t.column("h"), pa.scalar(64, pa.int32())),
            )
        )

    def suite(t: pa.Table) -> pa.Table:
        from ..functions import codecs

        cols = {c: t.column(c).to_pylist()
                for c in ("image_id", "bytes", "w", "h", "fmt")}
        ids, modes, nv, fr = [], [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i],
                                cols["h"][i], cols["fmt"][i])
            elev = img[:, :, 0].astype(np.float64)
            m = viewshed_mask_wang(elev)
            ids.append(cols["image_id"][i])
            modes.append("single")
            nv.append(int(m.sum()))
            fr.append(float(np.round(float(m.mean()), 6)))
            counts, n_obs = cumulative_viewshed_counts(elev, spacing=32)
            s = int(counts.sum())
            ids.append(cols["image_id"][i])
            modes.append("cumulative")
            nv.append(s)
            fr.append(float(np.round(s / float(counts.size * n_obs), 6)))
            # mode='los': GDALIsLineOfSightVisible (alg/los.cpp) over a
            # deterministic 16-ray fan (center at +2/+16 to the 8
            # border compass targets at +2)
            n_los, n_rays = los_ray_suite(elev)
            ids.append(cols["image_id"][i])
            modes.append("los")
            nv.append(n_los)
            fr.append(float(np.round(n_los / float(n_rays), 6)))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "mode": pa.array(modes, pa.string()),
                "n_visible": pa.array(nv, pa.int64()),
                "frac_visible": pa.array(fr, pa.float64()),
            }
        )

    return (
        imgs.map_batches(small, batch_format="pyarrow")
        .map_batches(suite, batch_format="pyarrow", batch_size=64)
        .sort(["image_id", "mode"])
    )


def q48_clip_points(sf_dir: str):
    """Clip (semi join): points kept when inside >= 1 polygon, via the
    co-partitioned one-shuffle semi join (ogrlayer.cpp:5497 semantics;
    no driver-side match set)."""
    from ..stages.join import clip_erase_points

    pts = _derive_points(sf_dir)
    rects = _derive_rects(sf_dir, as_wkb=True)
    return clip_erase_points(pts, rects, zoom=10, anti=False).sort("pid")


_Q48_SQL = f"""
SELECT p.pid, p.x, p.y FROM ({_PTS_SQL}) p
WHERE EXISTS (SELECT 1 FROM ({_RECTS_SQL}) r
              WHERE p.x BETWEEN r.minx AND r.maxx AND p.y BETWEEN r.miny AND r.maxy)
ORDER BY p.pid
"""


def q49_erase_points(sf_dir: str):
    """Erase (anti join): points kept when inside NO polygon
    (ogrlayer.cpp:5806 semantics), same co-partitioned machinery."""
    from ..stages.join import clip_erase_points

    pts = _derive_points(sf_dir)
    rects = _derive_rects(sf_dir, as_wkb=True)
    return clip_erase_points(pts, rects, zoom=10, anti=True).sort("pid")


_Q49_SQL = f"""
SELECT p.pid, p.x, p.y FROM ({_PTS_SQL}) p
WHERE NOT EXISTS (SELECT 1 FROM ({_RECTS_SQL}) r
                  WHERE p.x BETWEEN r.minx AND r.maxx AND p.y BETWEEN r.miny AND r.maxy)
ORDER BY p.pid
"""


def _derive_rects_b(sf_dir: str):
    """Second rect layer (from supplier) for the overlay oracle — WKB
    polygons + envelopes, integer-derived coords mirrored in SQL."""
    from ..functions.geom import wkb_polygon

    sup = _read(sf_dir, "supplier", columns=["s_suppkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t.column("s_suppkey").to_numpy(zero_copy_only=False)
        cx = ((k * 83) % 2000).astype(np.float64) * 1250.0
        cy = ((k * 47) % 2000).astype(np.float64) * 1250.0
        hw = (100 + (k % 150)).astype(np.float64) * 100.0
        wkbs = [
            wkb_polygon(
                [
                    np.array(
                        [
                            [cx[i] - hw[i], cy[i] - hw[i]],
                            [cx[i] + hw[i], cy[i] - hw[i]],
                            [cx[i] + hw[i], cy[i] + hw[i]],
                            [cx[i] - hw[i], cy[i] + hw[i]],
                            [cx[i] - hw[i], cy[i] - hw[i]],
                        ]
                    )
                ]
            )
            for i in range(len(k))
        ]
        return pa.table(
            {
                "fid_b": pa.array(k, pa.int64()),
                "wkb": pa.array(wkbs, pa.binary()),
                "minx": pa.array(cx - hw, pa.float64()),
                "miny": pa.array(cy - hw, pa.float64()),
                "maxx": pa.array(cx + hw, pa.float64()),
                "maxy": pa.array(cy + hw, pa.float64()),
            }
        )

    return sup.map_batches(fn, batch_format="pyarrow")


_RECTS_B_SQL = (
    "SELECT s_suppkey AS fid_b, "
    "((s_suppkey * 83) % 2000) * 1250.0 - (100 + (s_suppkey % 150)) * 100.0 AS minx, "
    "((s_suppkey * 47) % 2000) * 1250.0 - (100 + (s_suppkey % 150)) * 100.0 AS miny, "
    "((s_suppkey * 83) % 2000) * 1250.0 + (100 + (s_suppkey % 150)) * 100.0 AS maxx, "
    "((s_suppkey * 47) % 2000) * 1250.0 + (100 + (s_suppkey % 150)) * 100.0 AS maxy "
    "FROM supplier"
)


def q52_multimodal_codecs(sf_dir: str):
    """Multimodal codec suite (long format: kind, media_id, a, b, v):

    - 'jpeg_cs' / 'jpeg_psnr': baseline-JFIF roundtrip per small chip
      (frmts/jpeg analog) — decoded-pixel band checksums and PSNR in
      milli-dB; the oracle recomputes the decode through the
      DCT-quantization model only, so matching proves the
      entropy-coded bitstream round-trips.
    - 'webp_cs': VP8L lossless roundtrip per small chip (frmts/webp
      analog, from-scratch functions/webp.py) — the oracle checksums
      the source pixels (lossless identity), the engine rides the
      actual encode->decode bitstream.
    - 'audio_feat': frame energy / zero-crossing features over
      synthetic pcm16 clips (stages/media.py actor pool; clips derived
      deterministically from event keys).
    - 'video_frame': every-4th-frame sampling of raw-frame video clips
      (one row per sampled frame, band-checksum payload).
    - 'audio_unsupported' / 'video_unsupported': clips whose codec
      (opus / h264) has no decoder in this container — routed to
      explicit counter rows by the stage, never silently dropped.
    """
    import ray.data as rd

    from ..functions import checksum, codecs
    from ..stages import media as M

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "bytes", "w", "h", "fmt"]
    )

    def small(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.less_equal(t.column("w"), pa.scalar(64, pa.int32())),
                pc.less_equal(t.column("h"), pa.scalar(64, pa.int32())),
            )
        )

    def jfn(t: pa.Table) -> pa.Table:
        from ..stages.media import image_quality_metrics

        cols = {c: t.column(c).to_pylist() for c in ("image_id", "bytes", "w", "h", "fmt")}
        kinds, ids, a_o, b_o, v_o = [], [], [], [], []
        for i in range(t.num_rows):
            img = codecs.decode(cols["bytes"][i], cols["w"][i], cols["h"][i], cols["fmt"][i])
            dec = codecs.decode(codecs.encode(img, "jpeg"), cols["w"][i], cols["h"][i], "jpeg")
            cs = checksum.checksum_image(dec)
            p = codecs.psnr(img, dec)
            pm = 999999 if np.isinf(p) else int(np.floor(p * 1000.0 + 0.5))
            # image-quality scoring on the SAME decode (one decode per
            # chip for the whole multimodal suite)
            bq, lq, eq = image_quality_metrics(img)
            kinds += ["jpeg_cs", "jpeg_psnr", "img_quality"]
            ids += [cols["image_id"][i]] * 3
            a_o += [int(cs[0]), pm, bq]
            b_o += [int(cs[1]), 0, lq]
            v_o += [int(cs[2]), 0, eq]
            # VP8L round trip on a deterministic 1-in-4 chip subset
            # (id-numeral rule, mirrored verbatim by the oracle): the
            # oracle checksums the ORIGINAL pixels (lossless-identity
            # claim), so any bitstream defect in the from-scratch webp
            # codec lands as a driver-row mismatch.  Subsetting keeps
            # the Python-loop VP8L symbol decode off 3/4 of the suite.
            if int(cols["image_id"][i][3:]) % 4 == 0:
                wdec = codecs.decode(
                    codecs.encode(img, "webp"),
                    cols["w"][i], cols["h"][i], "webp")
                wcs = checksum.checksum_image(wdec)
                kinds.append("webp_cs")
                ids.append(cols["image_id"][i])
                a_o.append(int(wcs[0]))
                b_o.append(int(wcs[1]))
                v_o.append(int(wcs[2]))
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "media_id": pa.array(ids, pa.string()),
                "a": pa.array(a_o, pa.int64()),
                "b": pa.array(b_o, pa.int64()),
                "v": pa.array(v_o, pa.int64()),
            }
        )

    jpeg = imgs.map_batches(small, batch_format="pyarrow").map_batches(
        jfn, batch_format="pyarrow", batch_size=64
    )

    keys = _read(sf_dir, "events", columns=["event_id"]).filter(
        lambda r: r["event_id"] % 97 == 0
    )

    def synth_a(t: pa.Table) -> pa.Table:
        ks = t.column("event_id").to_numpy(zero_copy_only=False)
        blobs, codecs_, ids = [], [], []
        for k in ks:
            blob, codec = M.synth_audio_clip(int(k))
            blobs.append(blob)
            codecs_.append(codec)
            ids.append(f"a{int(k)}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "codec": pa.array(codecs_, pa.string()),
            }
        )

    def synth_v(t: pa.Table) -> pa.Table:
        ks = t.column("event_id").to_numpy(zero_copy_only=False)
        blobs, codecs_, ids = [], [], []
        for k in ks:
            blob, codec = M.synth_video_clip(int(k))
            blobs.append(blob)
            codecs_.append(codec)
            ids.append(f"v{int(k)}")
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "codec": pa.array(codecs_, pa.string()),
            }
        )

    def tag_audio(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("status"), pa.scalar("ok"))
        kind = pc.if_else(
            ok, pa.scalar("audio_feat"), pa.scalar("audio_unsupported")
        )
        return pa.table(
            {
                "kind": kind,
                "media_id": t.column("media_id"),
                "a": t.column("n_frames"),
                "b": t.column("zcr"),
                "v": t.column("energy"),
            }
        )

    def tag_video(t: pa.Table) -> pa.Table:
        ok = pc.equal(t.column("status"), pa.scalar("ok"))
        kind = pc.if_else(
            ok, pa.scalar("video_frame"), pa.scalar("video_unsupported")
        )
        return pa.table(
            {
                "kind": kind,
                "media_id": t.column("media_id"),
                "a": t.column("frame_idx"),
                "b": t.column("n_frames"),
                "v": t.column("cs"),
            }
        )

    aud = M.audio_features(
        keys.map_batches(synth_a, batch_format="pyarrow")
    ).map_batches(tag_audio, batch_format="pyarrow")
    vid = M.video_frame_sample(
        keys.map_batches(synth_v, batch_format="pyarrow")
    ).map_batches(tag_video, batch_format="pyarrow")

    return jpeg.union(aud).union(vid).sort(["kind", "media_id", "a"])


def q53_sampling(sf_dir: str):
    """Deterministic Bernoulli sampling by multiplicative key hash
    (approx-ok decimation analog, gdalrasterband.cpp:4151): ~10% of
    orders, reproducible and SQL-mirrorable."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = R.sample_hash(ds, "o_orderkey", 0.1)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": t.column("o_orderkey"),
                "price_cents": _cents(t.column("o_totalprice")),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort("okey")


_Q53_SQL = """
SELECT o_orderkey AS okey,
       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM orders
WHERE (o_orderkey * 2654435761) % 4294967296 < 429496729
ORDER BY o_orderkey
"""


def q54_grid_metrics(sf_dir: str):
    """gdal_grid data metrics (gdalgrid.cpp GDALGridDataMetric*):
    per-cell COUNT-in-radius grids over the T3 points; per-cell grid
    checksums (counts are integral -> exact)."""
    import ray.data as rd

    from ..functions import checksum
    from ..stages.grid import grid_points

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    pts = rd.read_parquet(paths["points"]).map_batches(
        lambda t: t.append_column(
            "v",
            pa.array(np.zeros(t.num_rows, np.float64)),
        ),
        batch_format="pyarrow",
    )
    grids = grid_points(pts, zoom=8, algorithm="count", grid_size=64, radius=40000.0)

    def cs(t: pa.Table) -> pa.Table:
        vals = [
            checksum.checksum_float_band(
                np.frombuffer(g, dtype=np.float64).reshape(64, 64)
            )
            for g in t.column("grid").to_pylist()
        ]
        return pa.table(
            {
                "z": pc.cast(t.column("z"), pa.int64()),
                "x": pc.cast(t.column("x"), pa.int64()),
                "y": pc.cast(t.column("y"), pa.int64()),
                "n_points": pc.cast(t.column("n_points"), pa.int64()),
                "cs": pa.array(vals, pa.int64()),
            }
        )

    return grids.map_batches(cs, batch_format="pyarrow").sort(["z", "x", "y"])


def q55_color_relief(sf_dir: str):
    """gdaldem color-relief (apps/gdaldem_lib.cpp:1497): band-0 ramp
    lookup per chip; per-chip RGB checksums."""
    import ray.data as rd

    from ..functions import checksum
    from ..stages.dem import color_relief_stage

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"], columns=["image_id", "bytes", "w", "h", "fmt"]
    )
    out = color_relief_stage(imgs)

    def cs(t: pa.Table) -> pa.Table:
        data = t.column("data").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        vals = np.empty((t.num_rows, 3), dtype=np.int64)
        for i in range(t.num_rows):
            img = np.frombuffer(data[i], dtype=np.uint8).reshape(h[i], w[i], 3)
            vals[i] = checksum.checksum_image(img)
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "cs_r": pa.array(vals[:, 0]),
                "cs_g": pa.array(vals[:, 1]),
                "cs_b": pa.array(vals[:, 2]),
            }
        )

    return out.map_batches(cs, batch_format="pyarrow").sort("image_id")


def q56_footprint(sf_dir: str):
    """gdal_footprint analog (apps/gdal_footprint_lib.cpp:1281): the
    valid-data footprint of the z8 image mosaic — the mask is built by
    the tiler, polygonized with the cross-cell seam merge."""
    import ray.data as rd

    from ..stages.polygonize import footprint

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"],
        columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    return footprint(imgs, zoom=8).sort("comp_id")


_Q50_TEXT = """
SELECT o_orderkey AS okey,
       CONCAT(CAST(o_orderkey AS VARCHAR), ':', o_orderstatus) AS tag,
       SUBSTR(o_orderpriority, 1, 4) AS prio4,
       o_orderkey % 13 AS k13,
       ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)
           AS rn,
       RANK() OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderpriority DESC, o_orderkey) AS rk,
       DENSE_RANK() OVER (PARTITION BY o_orderstatus
                          ORDER BY o_orderpriority) AS dr,
       CAST(SUM(o_orderkey % 13) OVER (PARTITION BY o_orderstatus)
            AS DOUBLE) AS k13_tot,
       COUNT(*) OVER (PARTITION BY o_orderstatus) AS n_status,
       MIN(o_totalprice) OVER (PARTITION BY o_orderstatus) AS lo_price,
       LAG(o_orderkey) OVER (PARTITION BY o_orderstatus
                             ORDER BY o_orderkey) AS prev_okey,
       CAST(SUM(o_orderkey % 13) OVER (PARTITION BY o_orderstatus
            ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS mov_k13,
       CAST(SUM(o_orderkey % 13) OVER (PARTITION BY o_orderstatus
            ORDER BY o_orderkey ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING)
            AS DOUBLE) AS ctr_k13,
       CAST(SUM(o_orderkey % 13) OVER (PARTITION BY o_orderstatus
            ORDER BY o_orderkey
            RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
            AS DOUBLE) AS rng_k13,
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey)
           AS n_items,
       (SELECT COUNT(*) FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = o_orderstatus)
           AS n_flag
FROM orders o
WHERE ((o_totalprice BETWEEN 100000 AND 200000
        AND o_orderpriority LIKE '1%')
   OR o_orderkey IN (1, 7, 42))
  AND EXISTS (SELECT l_orderkey FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 10)
ORDER BY okey LIMIT 500
"""


def q50_sql_frontend(sf_dir: str):
    """SQL string front-end (the OGR SQL dialect, swq_parser.y /
    swq_op_registrar.cpp:28-62 surface, plus the engine extensions:
    window functions ROW_NUMBER/RANK/DENSE_RANK/SUM/COUNT/MIN OVER
    (PARTITION BY ... ) lowered onto one hash shuffle + vectorized
    per-partition rank/reduceat, a correlated scalar subquery
    decorrelated to a grouped aggregate + co-partitioned left-outer
    join (incl. a two-equality correlation paired into one exact
    composite key), a correlated EXISTS lowered to a co-partitioned
    semi join, and explicit ROWS/RANGE BETWEEN frames with FOLLOWING
    bounds): the SAME SQL string is parsed and compiled to pyarrow
    kernels by the engine and handed verbatim to DuckDB as its oracle.
    The window SUM aggregates an integer expression so float64 sums
    are exact and order-independent across both engines."""
    from .sql import sql_query

    orders = _read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    lineitem = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    return sql_query(_Q50_TEXT, {"orders": orders, "lineitem": lineitem})


_Q60_TEXT = """
SELECT r.r_name AS region_name,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c.c_nationkey) AS n_nat,
       CAST(SUM(c.c_custkey) AS BIGINT) AS key_sum,
       MIN(c.c_acctbal) AS lo_bal,
       MAX(c.c_acctbal) AS hi_bal,
       RANK() OVER (PARTITION BY 'g' ORDER BY SUM(c.c_custkey) DESC)
           AS key_rank
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_acctbal > 0 AND r.r_name <> 'ASIA'
GROUP BY r.r_name
HAVING COUNT(*) > 1
UNION ALL
SELECT 'ALL' AS region_name,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c_nationkey) AS n_nat,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       MIN(c_acctbal) AS lo_bal,
       MAX(c_acctbal) AS hi_bal,
       CAST(1 AS BIGINT) AS key_rank
FROM customer
WHERE c_acctbal > 0
UNION ALL
SELECT 'SUBQ' AS region_name,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c_nationkey) AS n_nat,
       CAST(SUM(DISTINCT c_custkey) AS BIGINT) AS key_sum,
       MIN(c_acctbal) AS lo_bal,
       MAX(c_acctbal) AS hi_bal,
       CAST(1 AS BIGINT) AS key_rank
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
UNION ALL
SELECT 'DERIVED' AS region_name,
       COUNT(*) AS n_cust,
       CAST(MAX(nat_cnt) AS BIGINT) AS n_nat,
       CAST(SUM(key_sum_g) AS BIGINT) AS key_sum,
       MIN(lo) AS lo_bal,
       MAX(hi) AS hi_bal,
       CAST(1 AS BIGINT) AS key_rank
FROM (SELECT c_nationkey, COUNT(*) AS nat_cnt,
             CAST(SUM(c_custkey) AS BIGINT) AS key_sum_g,
             MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey) g
WHERE nat_cnt > 2
UNION ALL
SELECT 'CROSSNE' AS region_name,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT n.n_nationkey) AS n_nat,
       CAST(SUM(n.n_nationkey) AS BIGINT) AS key_sum,
       MIN(r.r_regionkey + 0.0) AS lo_bal,
       MAX(r.r_regionkey + 0.0) AS hi_bal,
       CAST(1 AS BIGINT) AS key_rank
FROM nation n JOIN region r ON n.n_regionkey < r.r_regionkey
UNION ALL
SELECT CONCAT('RU_', COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL'))
           AS region_name,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c_nationkey) AS n_nat,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
       MIN(c_acctbal) AS lo_bal,
       MAX(c_acctbal) AS hi_bal,
       CAST(1 AS BIGINT) AS key_rank
FROM customer
WHERE c_acctbal > 0
GROUP BY ROLLUP (c_nationkey)
ORDER BY region_name ASC
"""


def q60_sql_join_agg(sf_dir: str):
    """SQL front-end JOIN + GROUP BY surface (the OGR generic-SQL
    secondary-table join, ogr/ogrsf_frmts/generic/ogr_gensql.cpp:1319
    -1510, and summary aggregation :849 PrepareSummary — extended with
    keyed GROUP BY): a two-hop equi-join chain with single-table WHERE
    pushdown below the shuffle, lowered onto copartition_equi_join +
    grouped_aggregate (partial agg before the keyed shuffle), plus the
    r3 dialect tail: HAVING over the summary table, COUNT(DISTINCT)
    (distinct-of-keys+arg -> per-key count -> copartitioned left-outer
    attach), UNION ALL branches with the trailing ORDER BY applied
    to the whole union, SUM(DISTINCT) over the per-group distinct set,
    an IN (SELECT ...) WHERE conjunct lowered to a co-partitioned semi
    join, a scalar subquery substituted as a literal, and a pure
    non-equi JOIN (no ON equality) lowered to the broadcast
    nested-loop ('CROSSNE' branch).  The SAME
    string runs verbatim in DuckDB as the oracle; aggregates are
    integer-exact (COUNT / int SUM / MIN / MAX) so the value hash is
    order-independent."""
    from .sql import sql_query

    customer = _read(
        sf_dir, "customer",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"])
    return sql_query(
        _Q60_TEXT, {"customer": customer, "nation": nation, "region": region}
    )


def q51_intersection_overlay(sf_dir: str):
    """Layer-algebra overlay suite (ogrlayer.cpp Intersection :3345,
    Union :3763, SymDifference :4300, Identity :4730, Update :5148,
    Clip :5497, Erase :5806): rect layer A x rect layer B.  Row tags
    (``op``) cover every distinct overlay COMPONENT — the 7 methods
    are unions of these:

    - 'inter'   per-pair intersection geometry area (Intersection;
      pair parts of Union/Identity),
    - 'erase_a' per-A remainder A - union(matching B) (Erase; the
      A-side parts of Union/SymDifference/Identity/Update),
    - 'erase_b' per-B remainder B - union(matching A) (B-side parts
      of Union/SymDifference),
    - 'clip_a'  per-A coverage A ^ union(matching B) (Clip).

    Areas exact integer m^2 (the remainder comes from the distributed
    pair->groupby(fid) grid decomposition of stages.join); the golden
    recomputes remainders with an independent strip-sweep
    union-of-rects algorithm."""
    from ..stages.join import join_chips_with_polygons, overlay_remainders

    def _rn(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["fid_a" if c == "fid" else c for c in t.schema.names]
        )

    a_env = _derive_rects(sf_dir, as_wkb=False).map_batches(
        _rn, batch_format="pyarrow"
    )
    a_wkb = _derive_rects(sf_dir, as_wkb=True).map_batches(
        _rn, batch_format="pyarrow"
    )
    b = _derive_rects_b(sf_dir)
    pairs = join_chips_with_polygons(
        a_env, b, zoom=10, chip_cols=["fid_a"], poly_cols=["fid_b"],
        emit_geometry=True,
    )

    def shape_inter(t: pa.Table) -> pa.Table:
        area = pc.cast(
            pc.floor(pc.add(t.column("inter_area"), pa.scalar(0.5))), pa.int64()
        )
        n = t.num_rows
        return pa.table(
            {
                "op": pa.array(["inter"] * n, pa.string()),
                "fid_a": t.column("fid_a").cast(pa.int64()),
                "fid_b": t.column("fid_b").cast(pa.int64()),
                "area_m2": area,
            }
        )

    def shape_rem(fid_col: str, other_col: str, erase_tag: str,
                  with_clip: bool):
        def fn(t: pa.Table) -> pa.Table:
            fid = t.column(fid_col).to_numpy(zero_copy_only=False)
            rem = t.column("rem_area").to_numpy(zero_copy_only=False)
            cov = t.column("cov_area").to_numpy(zero_copy_only=False)
            ops, fa, fb, ar = [], [], [], []
            rm = rem > 0
            ops += [erase_tag] * int(rm.sum())
            fa += list(fid[rm] if fid_col == "fid_a" else np.full(rm.sum(), -1))
            fb += list(np.full(rm.sum(), -1) if fid_col == "fid_a" else fid[rm])
            ar += list(np.floor(rem[rm] + 0.5).astype(np.int64))
            if with_clip:
                cm = cov > 0
                ops += ["clip_a"] * int(cm.sum())
                fa += list(fid[cm])
                fb += list(np.full(cm.sum(), -1))
                ar += list(np.floor(cov[cm] + 0.5).astype(np.int64))
            return pa.table({
                "op": pa.array(ops, pa.string()),
                "fid_a": pa.array(np.asarray(fa, np.int64)),
                "fid_b": pa.array(np.asarray(fb, np.int64)),
                "area_m2": pa.array(np.asarray(ar, np.int64)),
            })
        return fn

    rem_a = overlay_remainders(a_env, b, zoom=10).map_batches(
        shape_rem("fid_a", "fid_b", "erase_a", with_clip=True),
        batch_format="pyarrow",
    )
    rem_b = overlay_remainders(
        b, a_wkb, zoom=10, fid_a="fid_b", fid_b="fid_a"
    ).map_batches(
        shape_rem("fid_b", "fid_a", "erase_b", with_clip=False),
        batch_format="pyarrow",
    )
    return (
        pairs.map_batches(shape_inter, batch_format="pyarrow")
        .union(rem_a)
        .union(rem_b)
        .sort(["op", "fid_a", "fid_b"])
    )


_Q51_SQL = f"""
SELECT a.fid_a, b.fid_b,
       CAST(FLOOR((LEAST(a.maxx, b.maxx) - GREATEST(a.minx, b.minx))
                  * (LEAST(a.maxy, b.maxy) - GREATEST(a.miny, b.miny)) + 0.5) AS BIGINT) AS area_m2
FROM (SELECT fid AS fid_a, minx, miny, maxx, maxy FROM ({_RECTS_SQL})) a,
     ({_RECTS_B_SQL}) b
WHERE LEAST(a.maxx, b.maxx) >= GREATEST(a.minx, b.minx)
  AND LEAST(a.maxy, b.maxy) >= GREATEST(a.miny, b.miny)
ORDER BY a.fid_a, b.fid_b
"""


# --------------------------------------------------- consolidated suites
#
# The correctness driver enumerates at most 50 queries, so closely
# related operators are exercised through ONE registered query each
# (tag column distinguishes the sub-operators; the oracle is the
# UNION ALL / join of the per-operator oracles).  The original
# single-operator callables above remain the implementation units.


def q04_distinct_union(sf_dir: str):
    """DISTINCT + UNION-ALL-of-layers in one suite (tag column
    ``kind``): 'distinct' rows from the SELECT DISTINCT operator,
    'union_agg' rows from the two-layer union + grouped count, and
    'concat_*' rows from the schema-UNIFYING layer concat
    (gdalalg_vector_concat field-union mode: two layers with different
    field sets, missing fields null-filled; per-status row and
    non-null counts prove the alignment)."""
    d = q04_distinct(sf_dir)
    u = q05_union_concat(sf_dir)

    o = _read(
        sf_dir, "orders",
        columns=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    lo = R.filter_expr(
        o, pc.field("o_totalprice") < 50000.0
    ).drop_columns(["o_orderpriority"])
    hi = R.filter_expr(
        o, pc.field("o_totalprice") > 250000.0
    ).drop_columns(["o_totalprice"])
    cat = R.concat_layers([lo, hi])

    def valid_ints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "vp": pc.cast(pc.is_valid(t.column("o_totalprice")),
                              pa.int64()),
                "vr": pc.cast(pc.is_valid(t.column("o_orderpriority")),
                              pa.int64()),
            }
        )

    cagg = R.grouped_aggregate(
        cat.map_batches(valid_ints, batch_format="pyarrow"),
        ["o_orderstatus"],
        [("*", "count", "n_all"), ("vp", "sum", "n_price"),
         ("vr", "sum", "n_prio")],
    )

    def tag_c(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for kind, col in (("concat_n", "n_all"), ("concat_price", "n_price"),
                          ("concat_prio", "n_prio")):
            parts.append(pa.table(
                {
                    "kind": pa.array([kind] * n, pa.string()),
                    "a": t.column("o_orderstatus"),
                    "b": pa.array([""] * n, pa.string()),
                    "n": pc.cast(t.column(col), pa.int64()),
                }
            ))
        return pa.concat_tables(parts)

    def tag_d(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["distinct"] * n, pa.string()),
                "a": t.column("l_returnflag"),
                "b": t.column("l_linestatus"),
                "n": pa.array([-1] * n, pa.int64()),
            }
        )

    def tag_u(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["union_agg"] * n, pa.string()),
                "a": t.column("o_orderstatus"),
                "b": pa.array([""] * n, pa.string()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return (
        d.map_batches(tag_d, batch_format="pyarrow")
        .union(u.map_batches(tag_u, batch_format="pyarrow"))
        .union(cagg.map_batches(tag_c, batch_format="pyarrow"))
        .sort(["kind", "a", "b"])
    )


_Q04U_SQL = f"""
WITH concat_sub AS (
  SELECT o_orderstatus, o_totalprice,
         CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_totalprice < 50000.0
  UNION ALL
  SELECT o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_totalprice > 250000.0
)
SELECT * FROM (
  SELECT 'distinct' AS kind, l_returnflag AS a, l_linestatus AS b,
         CAST(-1 AS BIGINT) AS n
  FROM ({_Q04_SQL.strip()})
  UNION ALL
  SELECT 'union_agg' AS kind, o_orderstatus AS a, '' AS b, n
  FROM ({_Q05_SQL.strip()})
  UNION ALL
  SELECT 'concat_n' AS kind, o_orderstatus AS a, '' AS b,
         COUNT(*) AS n FROM concat_sub GROUP BY o_orderstatus
  UNION ALL
  SELECT 'concat_price' AS kind, o_orderstatus AS a, '' AS b,
         COUNT(o_totalprice) AS n FROM concat_sub GROUP BY o_orderstatus
  UNION ALL
  SELECT 'concat_prio' AS kind, o_orderstatus AS a, '' AS b,
         COUNT(o_orderpriority) AS n FROM concat_sub GROUP BY o_orderstatus
) ORDER BY kind, a, b
"""


def q06_join_strategies(sf_dir: str):
    """Broadcast equi-join AND hash-partitioned equi-join in one suite
    (tag column ``strategy``); each sub-result is the joined grouped
    aggregate of its operator."""
    b = q06_broadcast_join(sf_dir)
    h = q07_hash_join(sf_dir)

    def tag_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "strategy": pa.array(["broadcast"] * n, pa.string()),
                "key": t.column("c_mktsegment"),
                "sum_v": pc.cast(t.column("sum_cents"), pa.int64()),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def tag_h(t: pa.Table) -> pa.Table:
        key = t.column("o_orderpriority")
        strat = pc.if_else(
            pc.starts_with(key, "asof_"),
            pa.scalar("asof", pa.string()),
            pc.if_else(
                pc.starts_with(key, "range_"),
                pa.scalar("range", pa.string()),
                pa.scalar("hash", pa.string()),
            ),
        )
        return pa.table(
            {
                "strategy": strat,
                "key": key,
                "sum_v": pc.cast(t.column("sum_qty"), pa.int64()),
                "n": pc.cast(t.column("n_items"), pa.int64()),
            }
        )

    return (
        b.map_batches(tag_b, batch_format="pyarrow")
        .union(h.map_batches(tag_h, batch_format="pyarrow"))
        .sort(["strategy", "key"])
    )


_Q06J_SQL = f"""
SELECT * FROM (
  SELECT 'broadcast' AS strategy, c_mktsegment AS key, sum_cents AS sum_v, n
  FROM ({_Q06_SQL.strip()})
  UNION ALL
  SELECT CASE WHEN o_orderpriority LIKE 'asof_%' THEN 'asof'
              WHEN o_orderpriority LIKE 'range_%' THEN 'range'
              ELSE 'hash' END AS strategy,
         o_orderpriority AS key, sum_qty AS sum_v, n_items AS n
  FROM ({_Q07_SQL.strip()})
) ORDER BY strategy, key
"""


def q12_windows(sf_dir: str):
    """Windowed aggregation suite: tumbling (1h), sliding (2h/1h) and
    session (30-min gap) windows in one query (tag column ``kind``)."""
    tu = q12_window_tumbling(sf_dir)
    sl = q46_sliding_window(sf_dir)
    se = q47_session_window(sf_dir)

    def tag_tu(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["tumbling"] * n, pa.string()),
                "k1": t.column("event_type"),
                "k2": pc.cast(t.column("hour"), pa.int64()),
                "v1": pc.cast(t.column("sum_milli"), pa.int64()),
                "v2": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def tag_sl(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["sliding"] * n, pa.string()),
                "k1": t.column("event_type"),
                "k2": pc.cast(t.column("ws"), pa.int64()),
                "v1": pc.cast(t.column("sum_milli"), pa.int64()),
                "v2": pc.cast(t.column("n"), pa.int64()),
            }
        )

    def tag_se(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["session"] * n, pa.string()),
                "k1": pc.cast(t.column("user_id"), pa.string()),
                "k2": pc.cast(t.column("n_sessions"), pa.int64()),
                "v1": pc.cast(t.column("n_events"), pa.int64()),
                "v2": pc.cast(t.column("span_s"), pa.int64()),
            }
        )

    return (
        tu.map_batches(tag_tu, batch_format="pyarrow")
        .union(sl.map_batches(tag_sl, batch_format="pyarrow"))
        .union(se.map_batches(tag_se, batch_format="pyarrow"))
        .sort(["kind", "k1", "k2"])
    )


_Q12W_SQL = f"""
SELECT * FROM (
  SELECT 'tumbling' AS kind, event_type AS k1, hour AS k2,
         sum_milli AS v1, n AS v2 FROM ({_Q12_SQL.strip()})
  UNION ALL
  SELECT 'sliding' AS kind, event_type AS k1, ws AS k2,
         sum_milli AS v1, n AS v2 FROM ({_Q46_SQL.strip()})
  UNION ALL
  SELECT 'session' AS kind, CAST(user_id AS VARCHAR) AS k1,
         n_sessions AS k2, n_events AS v1, span_s AS v2
  FROM ({_Q47_SQL.strip()})
)
ORDER BY kind, k1, k2
"""


def q14_corpus_scores(sf_dir: str):
    """TF-IDF + Okapi BM25 (k1=1.2, b=0.75) corpus-statistics scoring
    — the relevance/quality-weighting primitive of LLM data curation.
    Distributed shape: one explode pass builds distinct (doc_id, term,
    tf, dl) posting rows (dl rides along, so BM25 needs NO doc-keyed
    shuffle), document frequency is ONE term-keyed grouped_aggregate
    (per-batch partial counts first), joined back with ONE
    co-partitioned hash join; the corpus scalars (n_docs, total token
    count) reduce through per-block two-int partials.  Scores use the
    log-free Robertson rational idf so every value is a fixed float64
    expression tree over exact integers — bit-identical to the DuckDB
    oracle that mirrors the same tree."""
    from ..stages.text import explode_terms_batch, token_count_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tf = docs.map_batches(explode_terms_batch, batch_format="pyarrow")
    df = R.grouped_aggregate(tf, ["term"], [("tf", "count", "df")])
    # copartition (not Dataset.join): robust to sparse term domains —
    # empty hash partitions would otherwise lose the schema
    scored = R.copartition_equi_join(
        tf, df, lkey="term", rkey="term", how="inner", num_partitions=8,
        left_schema=[("doc_id", pa.int64()), ("term", pa.string()),
                     ("tf", pa.int64()), ("dl", pa.int64())],
        right_schema=[("term", pa.string()), ("df", pa.int64())],
    )

    def _partial(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([int((n > 0).sum())], pa.int64()),
                "s": pa.array([int(n.sum())], pa.int64()),
            }
        )

    parts = docs.map_batches(
        token_count_batch, batch_format="pyarrow"
    ).map_batches(_partial, batch_format="pyarrow").take_all()
    n_f = float(sum(p["n"] for p in parts))
    avgdl = float(sum(p["s"] for p in parts)) / n_f

    def score(t: pa.Table) -> pa.Table:
        tf64 = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df64 = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        dl64 = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        tfidf = tf64 * (n_f / df64)
        idf = ((n_f - df64) + 0.5) / (df64 + 0.5)
        bm25 = idf * (
            (tf64 * 2.2) / (tf64 + 1.2 * (0.25 + 0.75 * (dl64 / avgdl)))
        )
        t = t.append_column("tfidf", pa.array(tfidf, pa.float64()))
        return t.append_column("bm25", pa.array(bm25, pa.float64()))

    return scored.map_batches(score, batch_format="pyarrow")


def q14_text_stats(sf_dir: str):
    """Text-analysis suite in long format (kind, k1, k2, v): per-lang
    token counting + exact character-count quality metrics, plus the
    per-(doc, term) corpus-statistics scores — tf / df / tfidf / bm25
    rows (see q14_corpus_scores)."""
    base = R.copartition_equi_join(
        q14_token_count(sf_dir), q15_text_quality(sf_dir),
        lkey="lang", rkey="lang", num_partitions=1,
        left_schema=[("lang", pa.string()), ("sum_tokens", pa.int64()),
                     ("n_docs", pa.int64())],
        right_schema=[("lang", pa.string()), ("sum_chars", pa.int64()),
                      ("sum_alpha", pa.int64()), ("sum_space", pa.int64())],
    )

    def melt_lang(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_pylist()
        kinds, k1s, vs = [], [], []
        for kind in ("sum_tokens", "n_docs", "sum_chars", "sum_alpha",
                     "sum_space"):
            col = t.column(kind).to_numpy(zero_copy_only=False)
            kinds.extend([kind] * len(lang))
            k1s.extend(lang)
            vs.extend(col.astype(np.float64).tolist())
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "k1": pa.array(k1s, pa.string()),
                "k2": pa.array([""] * len(kinds), pa.string()),
                "v": pa.array(vs, pa.float64()),
            }
        )

    def melt_scores(t: pa.Table) -> pa.Table:
        k1 = [str(d) for d in t.column("doc_id").to_pylist()]
        k2 = t.column("term").to_pylist()
        n = len(k1)
        kinds, k1s, k2s, vs = [], [], [], []
        for kind in ("tf", "df", "tfidf", "bm25"):
            col = t.column(kind).to_numpy(zero_copy_only=False)
            kinds.extend([kind] * n)
            k1s.extend(k1)
            k2s.extend(k2)
            vs.extend(col.astype(np.float64).tolist())
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "k1": pa.array(k1s, pa.string()),
                "k2": pa.array(k2s, pa.string()),
                "v": pa.array(vs, pa.float64()),
            }
        )

    lang_rows = base.map_batches(melt_lang, batch_format="pyarrow")
    score_rows = q14_corpus_scores(sf_dir).map_batches(
        melt_scores, batch_format="pyarrow"
    )
    # chunking rows (stages.text.chunk_documents — the LLM-prep
    # token-window splitter): 'chunks' = chunk count per doc,
    # 'chunk_tokens' = token count per (doc, chunk); oracle = the
    # closed-form window rule n_chunks = max(1, ceil((ntok -
    # overlap)/step)) over the same tokenization
    from ..stages.text import chunk_documents

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ch = chunk_documents(docs, target_tokens=64, overlap_tokens=16)

    def melt_chunks(t: pa.Table) -> pa.Table:
        did = [str(d) for d in t.column("doc_id").to_pylist()]
        ci = t.column("chunk_idx").to_pylist()
        nck = t.column("n_chunks").to_numpy(zero_copy_only=False)
        ntk = t.column("n_tokens").to_numpy(zero_copy_only=False)
        kinds, k1s, k2s, vs = [], [], [], []
        for i in range(len(did)):
            kinds.append("chunk_tokens")
            k1s.append(did[i])
            k2s.append(f"{int(ci[i]):04d}")
            vs.append(float(ntk[i]))
            if int(ci[i]) == 0:
                kinds.append("chunks")
                k1s.append(did[i])
                k2s.append("")
                vs.append(float(nck[i]))
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "k1": pa.array(k1s, pa.string()),
            "k2": pa.array(k2s, pa.string()),
            "v": pa.array(vs, pa.float64()),
        })

    chunk_rows = ch.map_batches(melt_chunks, batch_format="pyarrow")
    # repetition quality signals (Gopher/C4-style filter inputs):
    # dup_bigram_frac + top_token_frac per doc, same tokenization as
    # the corpus scores so one SQL toks CTE oracles everything
    from ..stages.text import repetition_stats_batch

    rep = docs.map_batches(repetition_stats_batch,
                           batch_format="pyarrow")

    def melt_rep(t: pa.Table) -> pa.Table:
        did = [str(d) for d in t.column("doc_id").to_pylist()]
        dup = t.column("dup_bigram_frac").to_pylist()
        top = t.column("top_token_frac").to_pylist()
        kinds, k1s, vs = [], [], []
        for i in range(len(did)):
            if dup[i] is not None:
                kinds.append("dup_bigram_frac")
                k1s.append(did[i])
                vs.append(float(dup[i]))
            kinds.append("top_token_frac")
            k1s.append(did[i])
            vs.append(float(top[i]))
        return pa.table({
            "kind": pa.array(kinds, pa.string()),
            "k1": pa.array(k1s, pa.string()),
            "k2": pa.array([""] * len(kinds), pa.string()),
            "v": pa.array(vs, pa.float64()),
        })

    rep_rows = rep.map_batches(melt_rep, batch_format="pyarrow")
    # Naive Bayes model rows (stages.text.nb_train — distributed
    # exact-integer training): per-(lang, term) counts + label priors
    from ..stages.text import nb_train

    docs_l = _read(sf_dir, "documents",
                   columns=["doc_id", "text", "lang"])
    nb_counts, nb_priors = nb_train(docs_l, label_col="lang")

    def melt_nbc(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "kind": pa.array(["nb_count"] * n, pa.string()),
            "k1": t.column("label"),
            "k2": t.column("term"),
            "v": pc.cast(t.column("count"), pa.float64()),
        })

    def melt_nbp(t: pa.Table) -> pa.Table:
        lab = t.column("label").to_pylist()
        nd = t.column("n_docs").to_numpy(zero_copy_only=False)
        ntk = t.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table({
            "kind": pa.array(["nb_prior"] * len(lab)
                             + ["nb_tokens"] * len(lab), pa.string()),
            "k1": pa.array(lab + lab, pa.string()),
            "k2": pa.array([""] * (2 * len(lab)), pa.string()),
            "v": pa.array(np.concatenate(
                [nd.astype(np.float64), ntk.astype(np.float64)]),
                pa.float64()),
        })

    nb_rows = (nb_counts.map_batches(melt_nbc, batch_format="pyarrow")
               .union(nb_priors.map_batches(melt_nbp,
                                            batch_format="pyarrow")))
    return (lang_rows.union(score_rows).union(chunk_rows)
            .union(rep_rows).union(nb_rows)
            .sort(["kind", "k1", "k2"]))


_Q14TS_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tfx AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term),
dlx AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM toks GROUP BY doc_id),
dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY term),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dlx),
scored AS (
  SELECT t.doc_id, t.term, t.tf, f.df,
         t.tf * (CAST(st.n AS DOUBLE) / f.df) AS tfidf,
         (((CAST(st.n AS DOUBLE) - f.df) + 0.5e0) / (f.df + 0.5e0))
           * ((t.tf * 2.2e0)
              / (t.tf + 1.2e0 * (0.25e0 + 0.75e0
                 * (d.dl / (CAST(st.sum_dl AS DOUBLE) / st.n))))) AS bm25
  FROM tfx t JOIN dfx f ON t.term = f.term
             JOIN dlx d ON t.doc_id = d.doc_id, st
),
langstats AS (
  SELECT a.lang, a.sum_tokens, a.n_docs, b.sum_chars, b.sum_alpha, b.sum_space
  FROM ({_Q14_SQL.strip().replace("ORDER BY lang", "")}) a
  JOIN ({_Q15_SQL.strip()}) b ON a.lang = b.lang
)
SELECT 'tf' AS kind, CAST(doc_id AS VARCHAR) AS k1, term AS k2,
       CAST(tf AS DOUBLE) AS v FROM scored
UNION ALL SELECT 'df', CAST(doc_id AS VARCHAR), term, CAST(df AS DOUBLE)
FROM scored
UNION ALL SELECT 'tfidf', CAST(doc_id AS VARCHAR), term, tfidf FROM scored
UNION ALL SELECT 'bm25', CAST(doc_id AS VARCHAR), term, bm25 FROM scored
UNION ALL SELECT 'sum_tokens', lang, '', CAST(sum_tokens AS DOUBLE)
FROM langstats
UNION ALL SELECT 'n_docs', lang, '', CAST(n_docs AS DOUBLE) FROM langstats
UNION ALL SELECT 'sum_chars', lang, '', CAST(sum_chars AS DOUBLE)
FROM langstats
UNION ALL SELECT 'sum_alpha', lang, '', CAST(sum_alpha AS DOUBLE)
FROM langstats
UNION ALL SELECT 'sum_space', lang, '', CAST(sum_space AS DOUBLE)
FROM langstats
UNION ALL SELECT 'chunks', CAST(doc_id AS VARCHAR), '',
       CAST(n_chunks AS DOUBLE)
FROM (SELECT doc_id,
             GREATEST(1, CAST(CEIL((dl - 16) / 48.0) AS BIGINT))
               AS n_chunks
      FROM dlx)
UNION ALL SELECT 'chunk_tokens', CAST(c.doc_id AS VARCHAR),
       printf('%04d', u.ci), CAST(LEAST(64, c.dl - 48 * u.ci) AS DOUBLE)
FROM (SELECT doc_id, dl,
             GREATEST(1, CAST(CEIL((dl - 16) / 48.0) AS BIGINT))
               AS n_chunks
      FROM dlx) c,
     UNNEST(generate_series(0, c.n_chunks - 1)) AS u(ci)
UNION ALL SELECT 'dup_bigram_frac', CAST(b.doc_id AS VARCHAR), '',
       1.0e0 - CAST(b.dist AS DOUBLE) / CAST(b.total AS DOUBLE)
FROM (SELECT d2.doc_id, len(d2.arr) - 1 AS total,
             COUNT(DISTINCT d2.arr[u.i] || ' ' || d2.arr[u.i + 1])
               AS dist
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)),
                                         '\s+') AS arr
            FROM documents WHERE trim(text) <> '') d2,
           UNNEST(generate_series(1, len(d2.arr) - 1)) AS u(i)
      WHERE len(d2.arr) >= 2
      GROUP BY d2.doc_id, len(d2.arr)) b
UNION ALL SELECT 'top_token_frac', CAST(t2.doc_id AS VARCHAR), '',
       CAST(t2.topc AS DOUBLE) / CAST(t2.ntok AS DOUBLE)
FROM (SELECT d3.doc_id, len(d3.arr) AS ntok,
             (SELECT MAX(c) FROM (SELECT COUNT(*) AS c
                FROM UNNEST(d3.arr) AS uu(term)
                GROUP BY term)) AS topc
      FROM (SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)),
                                         '\s+') AS arr
            FROM documents WHERE trim(text) <> '') d3) t2
UNION ALL SELECT 'nb_count', d.lang, t.term, CAST(COUNT(*) AS DOUBLE)
FROM toks t JOIN documents d ON t.doc_id = d.doc_id
GROUP BY d.lang, t.term
UNION ALL SELECT 'nb_prior', lang, '', CAST(COUNT(*) AS DOUBLE)
FROM documents WHERE trim(text) <> '' GROUP BY lang
UNION ALL SELECT 'nb_tokens', d.lang, '', CAST(COUNT(*) AS DOUBLE)
FROM toks t JOIN documents d ON t.doc_id = d.doc_id GROUP BY d.lang
ORDER BY kind, k1, k2
"""


def q16_ann_topk(sf_dir: str):
    """ANN suite: exact brute-force cosine top-5, the LSH-bucketed
    approximate path, AND the IVF inverted-list path (k-means coarse
    quantizer, nprobe lists), tagged by ``method`` — plus per-query
    recall quantification rows ('lsh_recall' / 'ivf_recall':
    vec_id = |approx top-k ∩ exact top-k| per qid, rank = k) so the
    approximate variants report their recall as an oracle-checked
    metric column rather than an unquantified claim."""
    from .relational import copartition_equi_join, grouped_aggregate

    # each result is tiny (n_queries x k rows); materialize once so the
    # tag branch and the recall branches don't re-execute the whole
    # embedding pipeline per consumer (small-result materialize is the
    # sanctioned exception to streaming)
    ex = q16_ann_cosine(sf_dir).materialize()
    ls = q21_ann_lsh(sf_dir).materialize()
    iv = q_ann_ivf(sf_dir).materialize()

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.add_column(
                0, "method", pa.array([name] * t.num_rows, pa.string())
            )

        return fn

    def _keyed(t: pa.Table) -> pa.Table:
        k = pc.add(
            pc.multiply(pc.cast(t.column("qid"), pa.int64()),
                        pa.scalar(1 << 32, pa.int64())),
            pc.cast(t.column("vec_id"), pa.int64()),
        )
        return pa.table({"qid": pc.cast(t.column("qid"), pa.int64()),
                         "__k": k})

    def recall(approx, name):
        # approx rows whose (qid, vec_id) is in the exact top-k ->
        # per-qid hit count (distributed semi join, no driver sets)
        hits = copartition_equi_join(
            approx.map_batches(_keyed, batch_format="pyarrow"),
            ex.map_batches(_keyed, batch_format="pyarrow")
            .drop_columns(["qid"]),
            "__k", "__k", how="semi", num_partitions=4,
        )
        cnt = grouped_aggregate(hits, ["qid"], [("*", "count", "n_hit")])

        def shape(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "method": pa.array([name] * n, pa.string()),
                    "qid": t.column("qid"),
                    "vec_id": pc.cast(t.column("n_hit"), pa.int64()),
                    "rank": pa.array([5] * n, pa.int64()),
                }
            )

        return cnt.map_batches(shape, batch_format="pyarrow")

    # distributed PCA rows: method='pca', qid=component (eigenvalue-
    # descending), vec_id=round(eigenvalue*2^24), rank=position-weighted
    # integer checksum of the sign-canonicalized quantized loadings —
    # integer-exact, so the hash compare is accumulation-order-proof
    from ..stages.ann import embedding_pca

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def shape_pca(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["pca"] * n, pa.string()),
                "qid": t.column("comp"),
                "vec_id": t.column("eig_q"),
                "rank": t.column("load_cs"),
            }
        )

    pc_rows = embedding_pca(emb).map_batches(
        shape_pca, batch_format="pyarrow"
    )

    # distributed k-means rows: per-vector assignments
    # (method='kmeans_assign', qid=vec_id, vec_id=cluster, rank=sim_q)
    # and per-cluster summaries (method='kmeans', qid=cluster,
    # vec_id=n_members, rank=centroid checksum) — integer-exact under
    # the shared per-iteration centroid-quantization contract
    from ..stages.ann import embedding_kmeans

    assign_ds, summary = embedding_kmeans(emb)

    def shape_assign(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["kmeans_assign"] * n, pa.string()),
                "qid": pc.cast(t.column("vec_id"), pa.int64()),
                "vec_id": t.column("cluster"),
                "rank": t.column("sim_q"),
            }
        )

    km_assign = assign_ds.map_batches(shape_assign, batch_format="pyarrow")
    counts = grouped_aggregate(
        assign_ds, ["cluster"], [("*", "count", "n")]
    ).to_pandas().set_index("cluster")["n"]  # k tiny rows
    import ray.data as _rd

    km_sum = _rd.from_arrow(pa.table(
        {
            "method": pa.array(["kmeans"] * len(summary), pa.string()),
            "qid": pa.array([c for c, _ in summary], pa.int64()),
            "vec_id": pa.array(
                [int(counts.get(c, 0)) for c, _ in summary], pa.int64()
            ),
            "rank": pa.array([cs for _, cs in summary], pa.int64()),
        }
    ))

    return (
        ex.map_batches(tag("exact"), batch_format="pyarrow")
        .union(ls.map_batches(tag("lsh"), batch_format="pyarrow"))
        .union(iv.map_batches(tag("ivf"), batch_format="pyarrow"))
        .union(recall(ls, "lsh_recall"))
        .union(recall(iv, "ivf_recall"))
        .union(pc_rows)
        .union(km_assign)
        .union(km_sum)
        .sort(["method", "qid", "rank"])
    )


def q_ann_ivf(sf_dir: str, k_lists: int = 16, nprobe: int = 2,
              n_train: int = 256):
    """IVF approximate ANN: deterministic k-means coarse quantizer
    trained on the id-sorted ``vec_id < n_train`` sample, inverted-
    list probe of the ``nprobe`` nearest lists per query."""
    import duckdb

    from ..stages.ann import ann_ivf_topk, kmeans_centroids

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    con = duckdb.connect()
    tt = con.execute(
        f"SELECT vec_id, embedding FROM parquet_scan('{sf_dir}/embeddings.parquet') "
        f"WHERE vec_id < {n_train} ORDER BY vec_id"
    ).fetch_arrow_table()
    train = np.stack(
        [np.asarray(v, np.float64) for v in tt.column("embedding").to_pylist()]
    )
    qt = con.execute(
        f"SELECT vec_id, embedding FROM parquet_scan('{sf_dir}/embeddings.parquet') "
        "WHERE vec_id < 8 ORDER BY vec_id"
    ).fetch_arrow_table()
    queries = np.stack(
        [np.asarray(v, np.float64) for v in qt.column("embedding").to_pylist()]
    )
    qids = qt.column("vec_id").to_numpy(zero_copy_only=False)
    C = kmeans_centroids(train, k=k_lists, iters=10)
    out = ann_ivf_topk(emb, queries, qids, C, k=5, nprobe=nprobe)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "qid": t.column("qid"),
                "vec_id": t.column("vec_id"),
                "rank": pc.cast(t.column("rank"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow").sort(["qid", "rank"])


def q17_neardup_pairs(sf_dir: str):
    """Near-dup pair suite: MinHash+banded-LSH pairs (score =
    estimated Jaccard), SimHash band pairs (score = Hamming distance),
    exact n-gram Jaccard pairs (same LSH candidates, exact shingle-set
    intersection verify), and 'cluster' rows — the dedup DECISION:
    connected components over the exact-Jaccard pairs (distributed CC
    + left-outer label attach, stages.dedup.neardup_clusters), one row
    per document with doc_b = the canonical representative (min doc_id
    of its component; keep doc_a == doc_b to dedup) and score = the
    component size — all tagged by ``method``."""
    from ..stages.dedup import minhash_lsh_pairs, neardup_clusters

    mh = q17_minhash_pairs(sf_dir)
    sh = q18_simhash_pairs(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ja = minhash_lsh_pairs(docs, threshold=0.5, exact_shingles=True)
    cl = neardup_clusters(ja, _read(sf_dir, "documents", columns=["doc_id"]))

    def tag_cl(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["cluster"] * n, pa.string()),
                "doc_a": t.column("doc_id"),
                "doc_b": t.column("rep"),
                "score": pc.cast(t.column("csize"), pa.float64()),
            }
        )

    def tag_ja(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["jaccard"] * n, pa.string()),
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "score": pc.cast(t.column("jaccard"), pa.float64()),
            }
        )

    def tag_mh(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["minhash"] * n, pa.string()),
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "score": pc.cast(t.column("est_jaccard"), pa.float64()),
            }
        )

    def tag_sh(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "method": pa.array(["simhash"] * n, pa.string()),
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "score": pc.cast(t.column("hamming"), pa.float64()),
            }
        )

    return (
        mh.map_batches(tag_mh, batch_format="pyarrow")
        .union(sh.map_batches(tag_sh, batch_format="pyarrow"))
        .union(ja.map_batches(tag_ja, batch_format="pyarrow"))
        .union(cl.map_batches(tag_cl, batch_format="pyarrow"))
        .sort(["method", "doc_a", "doc_b"])
    )


def q19_langid_fingerprint(sf_dir: str):
    """Per-doc text suite: n-gram language ID joined with the rolling-
    hash winnowing fingerprint."""
    li = q19_langid(sf_dir)
    fp = q20_fingerprint(sf_dir)
    return R.hash_join(li, fp, on="doc_id", num_partitions=4).sort("doc_id")


def q29_band_stats_hist(sf_dir: str):
    """Band-statistics + 256-bucket histogram suite in long format
    (kind, band, k, v): stats rows carry k=0 and v = the statistic
    (n/min/max/mean/stddev); 'hist' rows carry k=bucket, v=count.
    Stats DERIVE from the merged histogram (Byte data: the histogram
    is a sufficient statistic with identical int64 partials), so the
    two surfaces share ONE decode pass."""
    import ray.data as rd_

    from ..stages.stats import band_stats_and_histogram

    paths0 = ensure_fixtures(scale_for_sf_dir(sf_dir))
    s, h = band_stats_and_histogram(
        rd_.read_parquet(paths0["images"],
                         columns=["bytes", "w", "h", "fmt"]))

    def melt_stats(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        nb = len(band)
        kinds, bands, vs = [], [], []
        for stat, col in (
            ("stat_n", "n"),
            ("stat_min", "min"),
            ("stat_max", "max"),
            ("stat_mean", "mean"),
            ("stat_std", "stddev"),
        ):
            vals = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            kinds.extend([stat] * nb)
            bands.extend(band.tolist())
            vs.extend(vals.tolist())
        return pa.table(
            {
                "kind": pa.array(kinds, pa.string()),
                "band": pa.array(bands, pa.int64()),
                "k": pa.array([0] * len(kinds), pa.int64()),
                "v": pa.array(vs, pa.float64()),
            }
        )

    def melt_hist(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "kind": pa.array(["hist"] * n, pa.string()),
                "band": pc.cast(t.column("band"), pa.int64()),
                "k": pc.cast(t.column("bucket"), pa.int64()),
                "v": pc.cast(t.column("count"), pa.float64()),
            }
        )

    # zonal statistics rows (stages/zonal.py: one co-partitioned
    # spatial-join shuffle + per-pair masked partials + keyed merge):
    # kind='zonal_{n,sum,min,max}', band, k=zone fid, v — integer-exact
    import ray.data as rd

    from ..stages.zonal import zonal_statistics

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"],
        columns=["image_id", "bytes", "w", "h", "fmt",
                 "minx", "miny", "maxx", "maxy"],
    )
    pol = rd.read_parquet(
        paths["polygons"],
        columns=["fid", "wkb", "minx", "miny", "maxx", "maxy"],
    )
    z = zonal_statistics(imgs, pol, zoom=10)

    def melt_zonal(t: pa.Table) -> pa.Table:
        band = pc.cast(t.column("band"), pa.int64())
        fid = pc.cast(t.column("fid"), pa.int64())
        parts = []
        for kind, col in (("zonal_n", "n_pix"), ("zonal_sum", "sum_val"),
                          ("zonal_min", "min_val"), ("zonal_max", "max_val")):
            parts.append(pa.table(
                {
                    "kind": pa.array([kind] * t.num_rows, pa.string()),
                    "band": band,
                    "k": fid,
                    "v": pc.cast(t.column(col), pa.float64()),
                }
            ))
        return pa.concat_tables(parts) if parts else pa.table({})

    return (
        s.map_batches(melt_stats, batch_format="pyarrow")
        .union(h.map_batches(melt_hist, batch_format="pyarrow"))
        .union(z.map_batches(melt_zonal, batch_format="pyarrow"))
        .sort(["kind", "band", "k"])
    )


def q48_clip_erase(sf_dir: str):
    """Clip (semi join) + Erase (anti join) suite through the
    co-partitioned one-shuffle machinery, tagged by ``op``."""
    cl = q48_clip_points(sf_dir)
    er = q49_erase_points(sf_dir)

    def tag(name):
        def fn(t: pa.Table) -> pa.Table:
            return t.add_column(
                0, "op", pa.array([name] * t.num_rows, pa.string())
            )

        return fn

    return (
        cl.map_batches(tag("clip"), batch_format="pyarrow")
        .union(er.map_batches(tag("erase"), batch_format="pyarrow"))
        .sort(["op", "pid"])
    )


_Q48CE_SQL = f"""
SELECT * FROM (
  SELECT 'clip' AS op, pid, x, y FROM ({_Q48_SQL.strip()})
  UNION ALL
  SELECT 'erase' AS op, pid, x, y FROM ({_Q49_SQL.strip()})
) ORDER BY op, pid
"""


def _oracle_q16_ann_topk(sf_dir: str) -> str:
    from ..oracle_ref import golden_sql

    return f"""
WITH ex AS ({_Q16_SQL.strip()}),
     lsh AS ({golden_sql("part_ann_lsh", sf_dir)}),
     ivf AS ({golden_sql("part_ann_ivf", sf_dir)})
SELECT * FROM (
  SELECT 'exact' AS method, qid, vec_id, rank FROM ex
  UNION ALL
  SELECT 'lsh' AS method, qid, vec_id, rank FROM lsh
  UNION ALL
  SELECT 'ivf' AS method, qid, vec_id, rank FROM ivf
  UNION ALL
  SELECT 'lsh_recall' AS method, l.qid,
         CAST(COUNT(*) AS BIGINT) AS vec_id, CAST(5 AS BIGINT) AS rank
  FROM lsh l JOIN ex e ON l.qid = e.qid AND l.vec_id = e.vec_id
  GROUP BY l.qid
  UNION ALL
  SELECT 'ivf_recall' AS method, i.qid,
         CAST(COUNT(*) AS BIGINT) AS vec_id, CAST(5 AS BIGINT) AS rank
  FROM ivf i JOIN ex e ON i.qid = e.qid AND i.vec_id = e.vec_id
  GROUP BY i.qid
  UNION ALL
  SELECT 'pca' AS method, qid, vec_id, rank
  FROM ({golden_sql("part_pca", sf_dir)})
  UNION ALL
  SELECT m AS method, qid, vec_id, rank
  FROM ({golden_sql("part_kmeans", sf_dir)})
) ORDER BY method, qid, rank
"""


def _oracle_q19_langid_fingerprint(sf_dir: str) -> str:
    from ..oracle_ref import golden_sql

    return f"""
SELECT a.doc_id, a.pred_lang, b.fingerprint
FROM ({_Q19_SQL.strip()}) a
JOIN ({golden_sql("part_fingerprint", sf_dir)}) b ON a.doc_id = b.doc_id
ORDER BY a.doc_id
"""


def _derive_ngons(sf_dir: str):
    """Irregular lattice n-gons from part keys: 5..10 vertices, radii
    5,000..14,900 m rounded to INTEGER coords (exact-arithmetic
    geometry fixture; formula mirrored by the geomref oracle)."""
    pt = _read(sf_dir, "part", columns=["p_partkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False)
        fids, xs, ys, cxs, cys = [], [], [], [], []
        for kk in k:
            kk = int(kk)
            n = 5 + kk % 6
            cx = float((kk * 91) % 2000) * 1250.0
            cy = float((kk * 57) % 2000) * 1250.0
            i = np.arange(n)
            r = (50 + ((kk * 13 + i * 7) % 100)).astype(np.float64) * 100.0
            th = 2.0 * np.pi * i / n
            fids.append(kk)
            xs.append(cx + np.floor(r * np.cos(th) + 0.5))
            ys.append(cy + np.floor(r * np.sin(th) + 0.5))
            cxs.append(cx)
            cys.append(cy)
        return pa.table(
            {
                "fid": pa.array(fids, pa.int64()),
                "xs": pa.array([list(v) for v in xs], pa.list_(pa.float64())),
                "ys": pa.array([list(v) for v in ys], pa.list_(pa.float64())),
                "cx": pa.array(cxs, pa.float64()),
                "cy": pa.array(cys, pa.float64()),
            }
        )

    return pt.map_batches(fn, batch_format="pyarrow")


def q57_geometry_ops(sf_dir: str):
    """Geometry scalar-op suite (GEOS-parity subset, golden oracle):
    'centroid' (exact int64/big-int area-weighted centroid),
    'simplify' (Douglas-Peucker, exact integer distance tests),
    'buffer' (point buffer 32-gon, exact doubled shoelace area),
    'clip' (Sutherland-Hodgman rect window, fsum shoelace area),
    'segmentize' (ogrlinestring.cpp:2661 densify, fsum coord sum),
    'swapxy' (swap then re-centroid), 'explode' (collection ->
    one row per part) — long format (kind, fid, a, b, v)."""
    from ..stages.geomops import (
        buffer_points_batch,
        centroid_batch,
        clip_rect_batch,
        explode_two_part_batch,
        segmentize_batch,
        simplify_batch,
        swap_xy_batch,
    )

    ngons = _derive_ngons(sf_dir)

    def tag_centroid(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["centroid"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("cx_milli"),
                "b": t.column("cy_milli"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    def tag_simplify(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["simplify"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_in"),
                "b": t.column("n_out"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    def tag_buffer(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["buffer"] * t.num_rows, pa.string()),
                "fid": t.column("pid"),
                "a": t.column("area2"),
                "b": t.column("n_verts"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    def tag_clip(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["clip"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_clip"),
                "b": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "v": t.column("clip_area"),
            }
        )

    cen = ngons.map_batches(centroid_batch, batch_format="pyarrow").map_batches(
        tag_centroid, batch_format="pyarrow"
    )
    simp = ngons.map_batches(simplify_batch(500.0), batch_format="pyarrow").map_batches(
        tag_simplify, batch_format="pyarrow"
    )
    # buffer every 10th derived point (keeps the golden compact)
    def every_10th(t: pa.Table) -> pa.Table:
        pid = t.column("pid").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pid % 10 == 0))

    pts = _derive_points(sf_dir).map_batches(every_10th, batch_format="pyarrow")
    buf = pts.map_batches(
        buffer_points_batch(radius=2500.0), batch_format="pyarrow"
    ).map_batches(tag_buffer, batch_format="pyarrow")
    clip = ngons.map_batches(
        clip_rect_batch(dx=2000.0, half=6000.0), batch_format="pyarrow"
    ).map_batches(tag_clip, batch_format="pyarrow")

    def tag_segmentize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["segmentize"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_in"),
                "b": t.column("n_out"),
                "v": t.column("coord_fsum"),
            }
        )

    def tag_swapxy(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["swapxy"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("cx_milli"),
                "b": t.column("cy_milli"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    def tag_explode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["explode"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("part"),
                "b": t.column("n_pts"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    seg = ngons.map_batches(
        segmentize_batch(3000.0), batch_format="pyarrow"
    ).map_batches(tag_segmentize, batch_format="pyarrow")
    swp = (
        ngons.map_batches(swap_xy_batch, batch_format="pyarrow")
        .map_batches(centroid_batch, batch_format="pyarrow")
        .map_batches(tag_swapxy, batch_format="pyarrow")
    )
    exp = ngons.map_batches(
        explode_two_part_batch(offset_x=1.0e6), batch_format="pyarrow"
    ).map_batches(tag_explode, batch_format="pyarrow")

    def tag_makevalid(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["makevalid"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("part"),
                "b": t.column("n_pts"),
                "v": t.column("area"),
            }
        )

    from ..stages.geomops import make_valid_batch, reproject_batch

    mkv = (
        _derive_bowties(sf_dir)
        .map_batches(make_valid_batch, batch_format="pyarrow")
        .map_batches(tag_makevalid, batch_format="pyarrow")
    )

    def tag_reproject(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["reproject"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_pts"),
                "b": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "v": pc.add(t.column("lon_fsum"), t.column("lat_fsum")),
            }
        )

    rpj = ngons.map_batches(
        reproject_batch, batch_format="pyarrow"
    ).map_batches(tag_reproject, batch_format="pyarrow")

    def tag_setgt(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["setgeomtype"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": pc.add(
                    pc.multiply(t.column("type_in"), pa.scalar(100, pa.int64())),
                    t.column("type_out"),
                ),
                "b": t.column("n_verts"),
                "v": t.column("coord_fsum"),
            }
        )

    from ..stages.geomops import set_geom_type_batch

    sgt = ngons.map_batches(
        set_geom_type_batch, batch_format="pyarrow"
    ).map_batches(tag_setgt, batch_format="pyarrow")

    from ..stages.geomops import convex_hull_batch, distance_point_batch

    def tag_hull(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["convexhull"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_hull"),
                "b": t.column("hull_area2"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        )

    def tag_dist(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["distance"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_pts"),
                "b": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "v": t.column("dist"),
            }
        )

    hul = ngons.map_batches(convex_hull_batch, batch_format="pyarrow").map_batches(
        tag_hull, batch_format="pyarrow"
    )
    dst = ngons.map_batches(
        distance_point_batch, batch_format="pyarrow"
    ).map_batches(tag_dist, batch_format="pyarrow")

    # simplify-coverage (gdal vector simplify-coverage / GEOS
    # CoverageSimplifyVW): jittered-lattice quad coverage, shared arcs
    # simplified identically on both sides; one branch per
    # preserve-boundary flag.  v carries the exact doubled output area.
    from ..stages.coverage import simplify_coverage

    cov = _derive_coverage()

    def tag_cov(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "kind": pa.array([kind] * t.num_rows, pa.string()),
                    "fid": t.column("fid"),
                    "a": t.column("n_in"),
                    "b": t.column("n_out"),
                    "v": pc.cast(t.column("area2_out"), pa.float64()),
                }
            )

        return fn

    scv = simplify_coverage(cov, tolerance=3000.0).map_batches(
        tag_cov("simplifycov"), batch_format="pyarrow"
    )
    scvpb = simplify_coverage(
        _derive_coverage(), tolerance=3000.0, preserve_boundary=True
    ).map_batches(tag_cov("simplifycovpb"), batch_format="pyarrow")

    # polygon buffer (every 10th ngon, r=1000, round joins + exact
    # noding dissolve — OGRGeometry::Buffer/GEOS BufferOp analog)
    from ..stages.geomops import buffer_polygon_batch, curve_suite_batch

    def every_10th_fid(t: pa.Table) -> pa.Table:
        fid = t.column("fid").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(fid % 10 == 0))

    def tag_bufpoly(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["bufferpoly"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_verts"),
                "b": t.column("n_cross"),
                "v": t.column("area"),
            }
        )

    bfp = (
        ngons.map_batches(every_10th_fid, batch_format="pyarrow")
        .map_batches(buffer_polygon_batch(radius=1000.0),
                     batch_format="pyarrow")
        .map_batches(tag_bufpoly, batch_format="pyarrow")
    )
    # LINE buffer (fid % 10 == 5): open chain = first n//2+2 ring
    # vertices, round caps + round joins, exact-noding dissolve
    from ..stages.geomops import buffer_line_batch

    def chains_fid5(t: pa.Table) -> pa.Table:
        fid = t.column("fid").to_numpy(zero_copy_only=False)
        keep = fid % 10 == 5
        xs = [v[: len(v) // 2 + 2]
              for v, k in zip(t.column("xs").to_pylist(), keep) if k]
        ys = [v[: len(v) // 2 + 2]
              for v, k in zip(t.column("ys").to_pylist(), keep) if k]
        return pa.table(
            {
                "fid": pa.array(fid[keep], pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )

    def tag_bufline(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kind": pa.array(["bufferline"] * t.num_rows, pa.string()),
                "fid": t.column("fid"),
                "a": t.column("n_verts"),
                "b": t.column("n_cross"),
                "v": t.column("area"),
            }
        )

    bfl = (
        ngons.map_batches(chains_fid5, batch_format="pyarrow")
        .map_batches(buffer_line_batch(radius=1000.0),
                     batch_format="pyarrow")
        .map_batches(tag_bufline, batch_format="pyarrow")
    )
    # ISO curve WKB parse + 4-degree linearization suite
    crv = ngons.map_batches(curve_suite_batch, batch_format="pyarrow")

    out = cen.union(simp).union(buf).union(clip).union(seg).union(swp)
    out = out.union(exp).union(mkv).union(rpj).union(sgt)
    out = out.union(hul).union(dst).union(bfp).union(bfl).union(crv)
    return out.union(scv).union(scvpb).sort(["kind", "fid"])


def _derive_coverage(grid: int = 20):
    """Deterministic jittered-lattice quad coverage (grid^2 features,
    int coords); formulas mirrored by the geomref golden."""
    import ray.data as rd

    from ..stages.coverage import coverage_fixture_quad

    def build(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        fids, xs, ys = [], [], []
        for k in ids:
            k = int(k)
            i, j = k % grid, k // grid
            ring = coverage_fixture_quad(i, j, grid)
            fids.append(k)
            xs.append([float(p[0]) for p in ring])
            ys.append([float(p[1]) for p in ring])
        return pa.table(
            {
                "fid": pa.array(fids, pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )

    return rd.range(grid * grid, override_num_blocks=8).map_batches(
        build, batch_format="pyarrow"
    )


def _derive_bowties(sf_dir: str):
    """Deterministic self-intersecting quads (bowties) from part keys:
    ring (x0,y0) -> (x0+a,y0+b) -> (x0+a+c,y0) -> (x0-d,y0+b) has
    exactly one proper crossing (edge 0 x edge 2) for positive
    a,b,c,d; integer lattice coords so MakeValid's noding is exact.
    Formula mirrored by the geomref golden."""
    pt = _read(sf_dir, "part", columns=["p_partkey"])

    def fn(t: pa.Table) -> pa.Table:
        k = t.column("p_partkey").to_numpy(zero_copy_only=False)
        fids, xs, ys = [], [], []
        for kk in k:
            kk = int(kk)
            x0 = float((kk * 91) % 2000) * 1250.0
            y0 = float((kk * 57) % 2000) * 1250.0
            a = 1000.0 + (kk * 13) % 4000
            b = 1000.0 + (kk * 7) % 4000
            c = 500.0 + (kk * 29) % 3000
            d = 500.0 + (kk * 41) % 3500
            fids.append(kk)
            xs.append([x0, x0 + a, x0 + a + c, x0 - d])
            ys.append([y0, y0 + b, y0, y0 + b])
        return pa.table(
            {
                "fid": pa.array(fids, pa.int64()),
                "xs": pa.array(xs, pa.list_(pa.float64())),
                "ys": pa.array(ys, pa.list_(pa.float64())),
            }
        )

    return pt.map_batches(fn, batch_format="pyarrow")


def _attach_affine_gcps(t: pa.Table) -> pa.Table:
    """Deterministic per-chip GCPs: a 3x3 pixel grid mapped through a
    dyadic-coefficient affine derived from the image index (exactly
    recoverable by the quantized order-1 fit; mirrored by rasterref)."""
    ids = t.column("image_id").to_pylist()
    ws = t.column("w").to_pylist()
    hs = t.column("h").to_pylist()
    mnx = t.column("minx").to_pylist()
    mny = t.column("miny").to_pylist()
    mxx = t.column("maxx").to_pylist()
    gp, gl, gx, gy = [], [], [], []
    for r in range(t.num_rows):
        i = int(ids[r][3:])
        w, h = int(ws[r]), int(hs[r])
        a = 0.75 + (i % 8) / 32.0
        b = ((i % 5) - 2) / 16.0
        d = ((i % 7) - 3) / 16.0
        e = 0.8125 + (i % 6) / 32.0
        gsd = (mxx[r] - mnx[r]) / w
        pp = np.array([0.0, w / 2.0, float(w)] * 3)
        ll = np.repeat([0.0, h / 2.0, float(h)], 3)
        gp.append(pp.tolist())
        gl.append(ll.tolist())
        gx.append((mnx[r] + (a * pp + b * ll) * gsd).tolist())
        gy.append((mny[r] + (d * pp + e * ll) * gsd).tolist())
    for name, vals in (("gcp_p", gp), ("gcp_l", gl), ("gcp_x", gx), ("gcp_y", gy)):
        t = t.append_column(name, pa.array(vals, pa.list_(pa.float64())))
    return t


def q58_gcp_warp(sf_dir: str):
    """gdalwarp transformer suite: 'poly1' = -order 1 polynomial
    fit over the sheared-affine GCP spec; 'poly0' = -order 0
    AUTO-selection (gdal_crs.cpp:202-210; 9 GCPs -> order 2) over the
    bumped non-affine GCPs; 'polyref' = -refine_gcps outlier removal
    (remove_outliers/worst_outlier loop) recovering the order-1 fit
    from one deterministically-corrupted GCP; 'tps' = thin-plate-spline
    transformer (alg/gdal_tps.cpp analog) over the same GCPs with a
    deterministic dyadic non-affine bump (so the spline actually
    bends); 'rpc' = rational-polynomial transformer (alg/gdal_rpc.cpp
    analog, no-DEM, iterative inverse) from a deterministic dyadic
    coefficient fixture; 'utm' = ellipsoidal Transverse Mercator
    (Karney/Krueger series — the gdalwarp UTM->4326 canonical case,
    autotest/benchmark/test_gdalwarp.py:24) over the synth_utm dyadic
    zone/origin fixture; 'utmchain' = the same chips warped straight
    to EPSG:3857 through a COMPOSED transform chain (ComposedTransform
    UTM-inverse -> WebMercator-forward — the GenImgProjTransformer /
    PROJ-pipeline composition hook); 'lcc'/'albers'/'stere' = the
    conic/polar projected-CRS families (Lambert Conformal Conic 2SP,
    Albers Equal Area, polar stereographic — Snyder closed forms over
    the synth_lcc/synth_albers/synth_stere dyadic fixtures; the
    arbitrary-CRS coverage the reference reaches through PROJ,
    ogr/ogrct.cpp:1018); 'sinu'/'eqc'/'moll' = the meridian-arc +
    pseudocylindrical families (sinusoidal aka the MODIS grid,
    equidistant cylindrical EPSG method 1028, spherical Mollweide —
    Snyder eq. 30-8/30-9, 3-21/3-26 + Newton, and the 2theta Newton
    form, over dyadic fixtures); 'aeqd'/'ortho'/'gnom' = the azimuthal
    families (azimuthal equidistant, orthographic, gnomonic — Snyder
    ch. 25/20/22 spherical oblique forms on the WGS84 semi-major, the
    PROJ +R=a convention); 'ntv2' = NTv2 grid-shift datum
    transform (the PROJ +nadgrids= horizontal correction the reference
    reaches through ogr/ogrct.cpp:1018; the deterministic fixture grid
    round-trips through a REAL .gsb file via sources.ntv2, base +
    child subgrid selection, fixed-4 iterative inverse); 'epsg' =
    the static EPSG registry front door (functions.epsg — the
    importFromEPSG / ogrct.cpp:1018 analog; chip i cycles EPSG:2154
    Lambert-93 on GRS80 / EPSG:5070 Conus Albers on GRS80 / EPSG:3413
    polar stereo, resolved from the code string alone); 'sumpres' =
    sum-preserving warp
    (GWKSumPreserving, alg/gdalwarpkernel.cpp:7969 — fractional
    footprint-overlap scatter, global sum conserved in the float
    path).  Quantized-coefficient transformers, full 2-D
    inverse-mapped bilinear warp; one checksum row per (chip,
    transformer) — the golden recomputes both through independent
    solvers (normal equations / Gaussian elimination); the 2^-16
    quantization makes the transforms identical."""
    import ray.data as rd

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"],
        columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    return imgs.map_batches(
        _WarpSuiteChips,
        batch_format="pyarrow",
        batch_size=32,
        # CPU-bound fused stage: let the pool scale to the box (r3 stats
        # showed 654 s of CPU squeezed through an 8-actor cap -> only
        # ~4.7x effective parallelism on 32 CPUs).  Min stays 1: a high
        # actor floor can starve the upstream read tasks of CPUs on
        # small budgets (the 4-CPU scaling leg hung with min=8).
        concurrency=(1, 32),
    ).sort(["image_id", "transformer"])


class _WarpSuiteChips:
    """Fused q58 transformer suite: decode each chip ONCE, run all
    seven transformer warps on the decoded array via the stage
    classes' per-chip _warp_one methods, and emit the checksum rows
    directly (the per-tag codec round-trip before the checksum is
    preserved - it is part of the oracle contract).

    The earlier 7-branch union ran seven actor pools concurrently,
    over-subscribing the CPU budget (7 pools x max actors on the same
    cores) and re-decoding every chip seven times - measured 10x
    slower than the per-tag sum at sf0.01 (1280 s vs ~122 s).  The
    individual warp_images_* stages remain the public per-transformer
    API (tests/test_tiles_warp.py, test_warp_sum.py,
    test_proj_utm.py)."""

    def __init__(self):
        from ..stages.warp import (
            WarpChipsAeqd,
            WarpChipsAlbers,
            WarpChipsEqc,
            WarpChipsGCP,
            WarpChipsGnom,
            WarpChipsGeoloc,
            WarpChipsLCC,
            WarpChipsMoll,
            WarpChipsNTv2,
            WarpChipsOrtho,
            WarpChipsRPC,
            WarpChipsRPCDEM,
            WarpChipsSinu,
            WarpChipsStere,
            WarpChipsSum,
            WarpChipsTPS,
            WarpChipsUTM,
            WarpChipsUTMChain,
        )

        self.poly = WarpChipsGCP(order=1, resampling="bilinear")
        # order=0 -> reference auto-selection (alg/gdal_crs.cpp:202-210;
        # 9 GCPs -> order 2), exercised on the BUMPED (non-affine) GCPs
        self.poly0 = WarpChipsGCP(order=0, resampling="bilinear")
        self.tps = WarpChipsTPS(resampling="bilinear")
        self.rpc = WarpChipsRPC(resampling="bilinear")
        self.glc = WarpChipsGeoloc(resampling="bilinear")
        self.rpd = WarpChipsRPCDEM(resampling="bilinear")
        self.utm = WarpChipsUTM(resampling="bilinear")
        # composed CRS chain (PROJ-pipeline analog): UTM -> 4326 -> 3857
        self.utmc = WarpChipsUTMChain(resampling="bilinear")
        # conic/polar CRS families (the PROJ-database coverage gap:
        # LCC 2SP, Albers, polar stereographic — Snyder closed forms)
        self.lcc = WarpChipsLCC(resampling="bilinear")
        self.alb = WarpChipsAlbers(resampling="bilinear")
        self.ste = WarpChipsStere(resampling="bilinear")
        # meridian-arc + pseudocylindrical families (sinusoidal = the
        # MODIS grid, equidistant cylindrical EPSG 1028, Mollweide)
        self.sin = WarpChipsSinu(resampling="bilinear")
        self.eqc = WarpChipsEqc(resampling="bilinear")
        self.mol = WarpChipsMoll(resampling="bilinear")
        # azimuthal families (Snyder spherical aeqd/ortho/gnom)
        self.azq = WarpChipsAeqd(resampling="bilinear")
        self.azo = WarpChipsOrtho(resampling="bilinear")
        self.azg = WarpChipsGnom(resampling="bilinear")
        # NTv2 grid-shift datum transform (the +nadgrids= horizontal
        # correction path; grid round-tripped through a real .gsb)
        self.ntv = WarpChipsNTv2(resampling="bilinear")
        self.smp = WarpChipsSum()
        # EPSG-code-resolved CRS (functions.epsg registry — the
        # importFromEPSG front door); chip i cycles 2154/5070/3413
        from ..stages.warp import WarpChipsEPSG

        self.epsg = {c: WarpChipsEPSG(epsg=c, resampling="bilinear")
                     for c in ("EPSG:2154", "EPSG:5070", "EPSG:3413")}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions import checksum, codecs

        plain = _attach_affine_gcps(batch)
        bumped = _bump_gcps(plain)
        cols = {
            c: batch.column(c).to_pylist()
            for c in ("image_id", "bytes", "w", "h", "fmt",
                      "minx", "miny", "maxx", "maxy")
        }
        gp = plain.column("gcp_p").to_pylist()
        gl = plain.column("gcp_l").to_pylist()
        gx = plain.column("gcp_x").to_pylist()
        gy = plain.column("gcp_y").to_pylist()
        bx = bumped.column("gcp_x").to_pylist()
        by = bumped.column("gcp_y").to_pylist()
        ids_o, tag_o, cs_o = [], [], []
        for i in range(batch.num_rows):
            iid = cols["image_id"][i]
            w, h, fmt = cols["w"][i], cols["h"][i], cols["fmt"][i]
            env = (cols["minx"][i], cols["miny"][i],
                   cols["maxx"][i], cols["maxy"][i])
            img = codecs.decode(cols["bytes"][i], w, h, fmt)
            # polyref: one corrupted GCP (index i_img % 9, +32/-16 gsd —
            # dyadic, mirrored by rasterref), removed by the
            # remove_outliers loop at tolerance 8*gsd
            i_img = int(iid[3:])
            j = i_img % 9
            gsd = (env[2] - env[0]) / w
            cgx = list(gx[i])
            cgy = list(gy[i])
            cgx[j] += 32.0 * gsd
            cgy[j] -= 16.0 * gsd
            for tag, out in (
                ("poly1",
                 self.poly._warp_one(img, gp[i], gl[i], gx[i], gy[i])[0]),
                ("poly0",
                 self.poly0._warp_one(img, gp[i], gl[i], bx[i], by[i])[0]),
                ("polyref",
                 self.poly._warp_one(img, gp[i], gl[i], cgx, cgy,
                                     refine=True, tolerance=8.0 * gsd)[0]),
                ("tps",
                 self.tps._warp_one(img, gp[i], gl[i], bx[i], by[i])[0]),
                ("rpc", self.rpc._warp_one(img, iid)[0]),
                ("geoloc", self.glc._warp_one(img, iid, env)[0]),
                ("rpc_dem", self.rpd._warp_one(img, iid)[0]),
                ("utm", self.utm._warp_one(img, iid)[0]),
                ("utmchain", self.utmc._warp_one(img, iid)[0]),
                ("lcc", self.lcc._warp_one(img, iid)[0]),
                ("albers", self.alb._warp_one(img, iid)[0]),
                ("stere", self.ste._warp_one(img, iid)[0]),
                ("sinu", self.sin._warp_one(img, iid)[0]),
                ("eqc", self.eqc._warp_one(img, iid)[0]),
                ("moll", self.mol._warp_one(img, iid)[0]),
                ("aeqd", self.azq._warp_one(img, iid)[0]),
                ("ortho", self.azo._warp_one(img, iid)[0]),
                ("gnom", self.azg._warp_one(img, iid)[0]),
                ("ntv2", self.ntv._warp_one(img, iid)[0]),
                ("epsg", self.epsg[
                    ("EPSG:2154", "EPSG:5070", "EPSG:3413")[i_img % 3]
                ]._warp_one(img, iid)[0]),
                ("sumpres", self.smp._warp_one(img, *env)[0]),
            ):
                dec = codecs.decode(codecs.encode(out, fmt), w, h, fmt)
                ids_o.append(iid)
                tag_o.append(tag)
                cs_o.append(checksum.checksum_image(dec))
        cs_a = np.asarray(cs_o, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {
                "image_id": pa.array(ids_o, pa.string()),
                "transformer": pa.array(tag_o, pa.string()),
                "cs_r": pa.array(cs_a[:, 0]),
                "cs_g": pa.array(cs_a[:, 1]),
                "cs_b": pa.array(cs_a[:, 2]),
            }
        )


def _bump_gcps(t: pa.Table) -> pa.Table:
    """Add a deterministic dyadic NON-affine offset to the geo side of
    each GCP (grid point (p_idx, l_idx) of chip i gets
    gsd * (((3p+5l+i) % 7) - 3) / 8 in x and
    gsd * (((2p+7l+i) % 5) - 2) / 8 in y) so a TPS fit genuinely
    bends; mirrored by the rasterref oracle."""
    ids = t.column("image_id").to_pylist()
    ws = t.column("w").to_pylist()
    mnx = t.column("minx").to_pylist()
    mxx = t.column("maxx").to_pylist()
    gx = t.column("gcp_x").to_pylist()
    gy = t.column("gcp_y").to_pylist()
    new_x, new_y = [], []
    for r in range(t.num_rows):
        i = int(ids[r][3:])
        gsd = (mxx[r] - mnx[r]) / int(ws[r])
        bx, by = [], []
        for k in range(9):
            p_idx, l_idx = k % 3, k // 3
            bx.append(gx[r][k] + gsd * (((3 * p_idx + 5 * l_idx + i) % 7) - 3) / 8.0)
            by.append(gy[r][k] + gsd * (((2 * p_idx + 7 * l_idx + i) % 5) - 2) / 8.0)
        new_x.append(bx)
        new_y.append(by)
    t = t.set_column(
        t.schema.get_field_index("gcp_x"), "gcp_x",
        pa.array(new_x, pa.list_(pa.float64())),
    )
    return t.set_column(
        t.schema.get_field_index("gcp_y"), "gcp_y",
        pa.array(new_y, pa.list_(pa.float64())),
    )


def _attach_cutlines(t: pa.Table) -> pa.Table:
    """Deterministic per-chip cutline hexagon in the DST CRS (4326),
    sized from the chip's transformed envelope (mirrored by the
    rasterref oracle)."""
    ids = t.column("image_id").to_pylist()
    mnx = t.column("minx").to_pylist()
    mny = t.column("miny").to_pylist()
    mxx = t.column("maxx").to_pylist()
    mxy = t.column("maxy").to_pylist()
    ang = 2.0 * np.pi * np.arange(6) / 6
    ca, sa = np.cos(ang), np.sin(ang)
    cut_x, cut_y = [], []
    for r in range(t.num_rows):
        i = int(ids[r][3:])
        dminx = (mnx[r] / mercator.ORIGIN_SHIFT) * 180.0
        dmaxx = (mxx[r] / mercator.ORIGIN_SHIFT) * 180.0
        dminy = float(mercator.meters_to_lat_lon(0.0, mny[r])[0])
        dmaxy = float(mercator.meters_to_lat_lon(0.0, mxy[r])[0])
        cx = (dminx + dmaxx) * 0.5
        cy = (dminy + dmaxy) * 0.5
        rx = (0.35 + (i % 4) / 32.0) * (dmaxx - dminx)
        ry = (0.35 + (i % 3) / 32.0) * (dmaxy - dminy)
        cut_x.append((cx + rx * ca).tolist())
        cut_y.append((cy + ry * sa).tolist())
    t = t.append_column("cut_x", pa.array(cut_x, pa.list_(pa.float64())))
    t = t.append_column("cut_y", pa.array(cut_y, pa.list_(pa.float64())))
    return t


def q59_cutline_warp(sf_dir: str):
    """gdalwarp -cutline analog: exact 3857->4326 bilinear warp with a
    per-chip cutline polygon rasterized to a parity mask at dst pixel
    centers (alg/gdalcutline.cpp semantics, binary -cblend 0); per-chip
    checksums of the masked output (golden oracle)."""
    import ray.data as rd

    from ..functions import checksum, codecs
    from ..stages.warp import warp_images_cutline

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    imgs = rd.read_parquet(
        paths["images"],
        columns=["image_id", "bytes", "w", "h", "fmt", "minx", "miny", "maxx", "maxy"],
    )
    warped = warp_images_cutline(
        imgs.map_batches(_attach_cutlines, batch_format="pyarrow"),
        resampling="bilinear", concurrency=4, use_approx=False,
    )

    def cs(t: pa.Table) -> pa.Table:
        b = t.column("bytes").to_pylist()
        w = t.column("w").to_pylist()
        h = t.column("h").to_pylist()
        f = t.column("fmt").to_pylist()
        out = np.empty((t.num_rows, 3), dtype=np.int64)
        for i in range(t.num_rows):
            out[i] = checksum.checksum_image(codecs.decode(b[i], w[i], h[i], f[i]))
        return pa.table(
            {
                "image_id": t.column("image_id"),
                "cs_r": pa.array(out[:, 0]),
                "cs_g": pa.array(out[:, 1]),
                "cs_b": pa.array(out[:, 2]),
            }
        )

    return warped.map_batches(cs, batch_format="pyarrow").sort("image_id")


# Oracles that are assembled per-scale from a static-SQL part and a
# golden part (rendered by oracle_ref at the driver's scale).
COMBINED_ORACLES = {
    "q16_ann_topk": _oracle_q16_ann_topk,
    "q19_langid_fingerprint": _oracle_q19_langid_fingerprint,
}


# ------------------------------------------------------------- registry

QUERIES = {
    "q01_lineitem_agg": q01_lineitem_agg,
    "q02_filter_project": q02_filter_project,
    "q03_sort_topk": q03_sort_topk,
    "q04_distinct_union": q04_distinct_union,
    "q06_join_strategies": q06_join_strategies,
    "q08_extent_count": q08_extent_count,
    "q09_cell_assign": q09_cell_assign,
    "q10_spatial_join": q10_spatial_join,
    "q11_knn": q11_knn,
    "q12_windows": q12_windows,
    "q13_dedup": q13_dedup,
    "q14_text_stats": q14_text_stats,
    "q16_ann_topk": q16_ann_topk,
    "q17_neardup_pairs": q17_neardup_pairs,
    "q19_langid_fingerprint": q19_langid_fingerprint,
    "q22_images_cells": q22_images_cells,
    "q23_spatial_join_images": q23_spatial_join_images,
    "q24_tile_pyramid": q24_tile_pyramid,
    "q25_warp": q25_warp,
    "q26_phash_neardup": q26_phash_neardup,
    "q27_knn_cell_ring": q27_knn_cell_ring,
    "q28_embedding_neardup": q28_embedding_neardup,
    "q29_band_stats_hist": q29_band_stats_hist,
    "q31_raster_steps": q31_raster_steps,
    "q32_hillshade": q32_hillshade,
    "q33_rasterize_polygonize": q33_rasterize_polygonize,
    "q34_checkpointed_tiles": q34_checkpointed_tiles,
    "q35_grid_invdist": q35_grid_invdist,
    "q36_proximity_sieve": q36_proximity_sieve,
    "q37_point_query": q37_point_query,
    "q38_contour": q38_contour,
    "q39_color_quantize": q39_color_quantize,
    "q40_tile_tree": q40_tile_tree,
    "q41_scalar_functions": q41_scalar_functions,
    "q42_left_outer_join": q42_left_outer_join,
    "q43_mvt_tiles": q43_mvt_tiles,
    "q44_pansharpen_nearblack": q44_pansharpen_nearblack,
    "q45_viewshed": q45_viewshed,
    "q48_clip_erase": q48_clip_erase,
    "q50_sql_frontend": q50_sql_frontend,
    "q51_intersection_overlay": q51_intersection_overlay,
    "q52_multimodal_codecs": q52_multimodal_codecs,
    "q53_sampling": q53_sampling,
    "q54_grid_metrics": q54_grid_metrics,
    "q55_color_relief": q55_color_relief,
    "q56_footprint": q56_footprint,
    "q57_geometry_ops": q57_geometry_ops,
    "q58_gcp_warp": q58_gcp_warp,
    "q59_cutline_warp": q59_cutline_warp,
    "q60_sql_join_agg": q60_sql_join_agg,
}

ORACLE_SQL = {
    "q01_lineitem_agg": _Q01_SQL,
    "q02_filter_project": _Q02_SQL,
    "q03_sort_topk": _Q03_SQL,
    "q04_distinct_union": _Q04U_SQL,
    "q06_join_strategies": _Q06J_SQL,
    "q08_extent_count": _Q08_SQL,
    "q09_cell_assign": _Q09_SQL,
    "q10_spatial_join": _Q10_SQL,
    "q11_knn": _Q11_SQL,
    "q12_windows": _Q12W_SQL,
    "q13_dedup": _Q13D_SQL,
    "q14_text_stats": _Q14TS_SQL,
    # q27 computes the same result as q11 through the cell-ring scale
    # path -- the exact-kNN SQL is its oracle too
    "q27_knn_cell_ring": _Q11_SQL,
    "q41_scalar_functions": _Q41_SQL,
    "q42_left_outer_join": _Q42_SQL,
    "q48_clip_erase": _Q48CE_SQL,
    # the engine parses and executes the SAME string DuckDB runs
    "q50_sql_frontend": _Q50_TEXT,
    "q53_sampling": _Q53_SQL,
    # JOIN + GROUP BY through the SQL front-end: same string in DuckDB
    "q60_sql_join_agg": _Q60_TEXT,
}
