"""Polygonize — raster connected components with cross-cell seam merge.

Reference semantics: alg/polygonize.cpp:73 GDALPolygonizeT — scanline-
pairwise connected-component tracing (4-connectivity, equal pixel
value), zero treated as nodata/background.  The distributed twist
(SURVEY.md §2.9): components are labeled per cell, then components
touching a shared cell border are merged — the cross-border pair graph
is reduced by ITERATED MIN-LABEL PROPAGATION (Ray Data joins +
groupby-min per round, monotone so convergence is detected from the
label-sum aggregate), never collected to the driver.

Component identity is the CANONICAL PIXEL id: each per-cell component
is named by its first burned pixel in global scan order
(canon = global_row * world_width + global_col), and a merged
component's id is the minimum canon over its members — a pure function
of the raster, independent of labeling internals (which makes the
independent oracle able to reproduce it).

Input rows: the rasterize output (cell, z, x, y, grid_bytes 256x256
uint8).  Output rows: one per merged component — comp_id (int64
canonical pixel), value, pixel_count, minx, miny, maxx, maxy
(georeferenced envelope), n_cells (how many cells it spans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import mercator

GRID = 256


def _label_components(g: np.ndarray):
    """Two-pass run-based 4-connected labeling of equal-valued nonzero
    pixels (the scanline-pair strategy of polygonize.cpp).  Returns
    (labels int32 array, n_labels); labels are 1..n in first-encounter
    scan order."""
    labels = np.zeros_like(g, dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    prev_runs: list[tuple[int, int, int, int]] = []  # (start, end, value, label)
    for row in range(GRID):
        line = g[row]
        runs = []
        change = np.flatnonzero(np.diff(line)) + 1
        starts = np.concatenate(([0], change))
        ends = np.concatenate((change, [GRID]))
        for s, e in zip(starts, ends):
            v = int(line[s])
            if v == 0:
                continue
            lbl = 0
            for ps, pe, pv, pl in prev_runs:
                if pv == v and ps < e and pe > s:  # 4-connected overlap
                    if lbl == 0:
                        lbl = pl
                    else:
                        union(lbl, pl)
            if lbl == 0:
                lbl = nxt
                parent.append(lbl)
                nxt += 1
            labels[row, s:e] = lbl
            runs.append((int(s), int(e), v, lbl))
        prev_runs = runs
    remap = np.zeros(nxt, dtype=np.int32)
    out_n = 0
    for l in range(1, nxt):
        r = find(l)
        if remap[r] == 0:
            out_n += 1
            remap[r] = out_n
        remap[l] = remap[r]
    return remap[labels], out_n


def _per_cell(t: pa.Table) -> pa.Table:
    """Per-cell labeling: one row per (cell, local component) with
    stats, the canonical-pixel id, and the four border label stripes."""
    out = {
        "cell": [], "z": [], "x": [], "y": [], "canon": [], "value": [],
        "pixel_count": [], "minx": [], "miny": [], "maxx": [], "maxy": [],
        "border_n": [], "border_s": [], "border_w": [], "border_e": [],
    }
    for r in range(t.num_rows):
        cell = t.column("cell")[r].as_py()
        z = int(t.column("z")[r].as_py())
        tx = int(t.column("x")[r].as_py())
        ty = int(t.column("y")[r].as_py())
        g = np.frombuffer(t.column("grid_bytes")[r].as_py(), dtype=np.uint8).reshape(
            GRID, GRID
        )
        labels, n = _label_components(g)
        if n == 0:
            continue
        bminx, bminy, bmaxx, bmaxy = mercator.tile_bounds(tx, ty, z)
        res = float(mercator.resolution(z))
        nt = 1 << z
        world = nt * GRID
        for lbl in range(1, n + 1):
            mask = labels == lbl
            ys, xs = np.nonzero(mask)
            v = int(g[ys[0], xs[0]])
            # canonical pixel: first in global top-down scan order
            # (grid row 0 is the tile's TOP; TMS ty grows northward)
            gr = (nt - 1 - ty) * GRID + int(ys[0])
            gc = tx * GRID + int(xs[0])
            out["cell"].append(cell)
            out["z"].append(z)
            out["x"].append(tx)
            out["y"].append(ty)
            out["canon"].append(gr * world + gc)
            out["value"].append(v)
            out["pixel_count"].append(int(mask.sum()))
            out["minx"].append(bminx + xs.min() * res)
            out["maxx"].append(bminx + (xs.max() + 1) * res)
            out["maxy"].append(bmaxy - ys.min() * res)
            out["miny"].append(bmaxy - (ys.max() + 1) * res)
            out["border_n"].append((labels[0, :] == lbl).tobytes())
            out["border_s"].append((labels[GRID - 1, :] == lbl).tobytes())
            out["border_w"].append((labels[:, 0] == lbl).tobytes())
            out["border_e"].append((labels[:, GRID - 1] == lbl).tobytes())
    return pa.table(
        {
            "cell": pa.array(out["cell"], pa.int64()),
            "z": pa.array(out["z"], pa.int32()),
            "x": pa.array(out["x"], pa.int32()),
            "y": pa.array(out["y"], pa.int32()),
            "canon": pa.array(out["canon"], pa.int64()),
            "value": pa.array(out["value"], pa.int32()),
            "pixel_count": pa.array(out["pixel_count"], pa.int64()),
            "minx": pa.array(out["minx"], pa.float64()),
            "miny": pa.array(out["miny"], pa.float64()),
            "maxx": pa.array(out["maxx"], pa.float64()),
            "maxy": pa.array(out["maxy"], pa.float64()),
            "border_n": pa.array(out["border_n"], pa.binary()),
            "border_s": pa.array(out["border_s"], pa.binary()),
            "border_w": pa.array(out["border_w"], pa.binary()),
            "border_e": pa.array(out["border_e"], pa.binary()),
        }
    )


def _edges(t: pa.Table) -> pa.Table:
    """One row per (component, touched cell border): edge key + stripe."""
    rows = {"edge": [], "node": [], "value": [], "stripe": [], "side": []}
    for r in range(t.num_rows):
        z = int(t.column("z")[r].as_py())
        x = int(t.column("x")[r].as_py())
        y = int(t.column("y")[r].as_py())
        node = int(t.column("canon")[r].as_py())
        v = int(t.column("value")[r].as_py())
        n = 1 << z
        for side, dx, dy in (("e", 1, 0), ("w", -1, 0), ("n", 0, 1), ("s", 0, -1)):
            stripe = np.frombuffer(
                t.column(f"border_{side}")[r].as_py(), dtype=np.uint8
            )
            if not stripe.any():
                continue
            nx, ny = x + dx, y + dy
            if nx < 0 or ny < 0 or nx >= n or ny >= n:
                continue
            a, b = (x, y), (nx, ny)
            lo, hi = (a, b) if a <= b else (b, a)
            rows["edge"].append(f"{z}/{lo[0]}/{lo[1]}|{hi[0]}/{hi[1]}")
            rows["node"].append(node)
            rows["value"].append(v)
            rows["stripe"].append(stripe.tobytes())
            rows["side"].append(side)
    return pa.table(
        {
            "edge": pa.array(rows["edge"], pa.string()),
            "node": pa.array(rows["node"], pa.int64()),
            "value": pa.array(rows["value"], pa.int32()),
            "stripe": pa.array(rows["stripe"], pa.binary()),
            "side": pa.array(rows["side"], pa.string()),
        }
    )


def _pairs_in_edge(g: pa.Table) -> pa.Table:
    """Cross-border component pairs within one shared edge — vectorized
    stripe intersection (bool matmul), no per-pair python loop."""
    side = np.asarray(g.column("side").to_pylist())
    vals = g.column("value").to_numpy(zero_copy_only=False)
    nodes = g.column("node").to_numpy(zero_copy_only=False)
    stripes = g.column("stripe").to_pylist()
    out_a, out_b = [], []
    for sa, sb in (("e", "w"), ("n", "s")):
        ia = np.flatnonzero(side == sa)
        ib = np.flatnonzero(side == sb)
        if len(ia) == 0 or len(ib) == 0:
            continue
        A = np.stack([np.frombuffer(stripes[i], dtype=np.uint8) for i in ia])
        B = np.stack([np.frombuffer(stripes[i], dtype=np.uint8) for i in ib])
        overlap = (A.astype(np.int64) @ B.astype(np.int64).T) > 0
        same_val = vals[ia][:, None] == vals[ib][None, :]
        pi, pj = np.nonzero(overlap & same_val)
        out_a.extend(nodes[ia[pi]].tolist())
        out_b.extend(nodes[ib[pj]].tolist())
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
    )


def _materialize_detached(ds):
    """materialize() + cut the DatasetStats parent chain: iterative
    algorithms otherwise accumulate an ever-deeper stats lineage that
    Ray's stats update thread re-summarizes recursively (quadratic
    driver stalls between rounds)."""
    mds = ds.materialize()
    try:
        mds._plan.stats().parents = []
    except Exception:  # noqa: BLE001 - stats internals are best-effort
        pass
    return mds


def _cc_one_task(t: pa.Table) -> pa.Table:
    """Union-find over the whole (small) pair graph in ONE WORKER task
    (the input was repartitioned to a single block) — never on the
    driver.  Root = min node id, matching the propagation's fixpoint."""
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    nodes = sorted(set(int(v) for v in a) | set(int(v) for v in b))
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def min_label_components(edges, max_iters: int = 32,
                         one_task_threshold: int = 2_000_000):
    """Distributed connected components by iterated min-label
    propagation: labels start as the node id; each round every node
    takes the min label over itself and its neighbors (two hash joins +
    one groupby-min).  Labels only decrease, so the label-sum aggregate
    detects convergence without a row-wise diff.  Returns a Dataset
    (node, label=root) — only nodes that appear in the edge list.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    edges = _materialize_detached(edges)
    n_edges = edges.count()
    if n_edges == 0:
        return None
    if n_edges <= one_task_threshold:
        # small graph: one worker-side union-find task beats dozens of
        # tiny shuffle rounds (each with actor-pool startup); the
        # iterated propagation below is the >2M-edge scale path
        return _materialize_detached(
            edges.repartition(1).map_batches(
                _cc_one_task, batch_format="pyarrow", batch_size=None
            )
        )

    def endpoints(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        return pa.table({"node": pa.array(both, pa.int64())})

    labels = _materialize_detached(
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("node", alias_name="label"))
    )
    # vectorized rounds: hash-join the label table onto the message
    # list, redirect to the receiver, hash-aggregate the min.  The
    # partition count is sized so hash partitions are never empty
    # (Ray's join operator mishandles schema-less empty partitions).
    def edge_msgs(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "other": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    def to_receiver(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("other"), "label": t.column("label")})

    def jump_requests(t: pa.Table) -> pa.Table:
        # ask each node's LABEL node for ITS label (pointer jumping —
        # halves the remaining path length, so O(log diameter) rounds)
        return pa.table({"node": t.column("label"), "other": t.column("node")})

    msgs_e = _materialize_detached(edges.map_batches(edge_msgs, batch_format="pyarrow"))
    n_nodes = labels.count()
    parts = max(1, n_nodes // 50_000)

    def _minimize(msgs, lbls):
        contrib = msgs.join(lbls, join_type="inner", num_partitions=parts,
                            on=("node",)).map_batches(to_receiver,
                                                      batch_format="pyarrow")
        return _materialize_detached(
            lbls.union(contrib)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
        )

    prev_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
    for it in range(max_iters):
        labels = _minimize(msgs_e, labels)  # neighbor min
        for _ in range(2):  # double pointer jump: ~4x reach per round
            jump = labels.map_batches(jump_requests, batch_format="pyarrow")
            labels = _minimize(jump, labels)
        if it % 2 == 1 or it == max_iters - 1:
            new_sum = labels.aggregate(Sum("label", alias_name="s"))["s"]
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    return labels


def footprint(images, zoom: int = 8, resampling: str = "near"):
    """gdal_footprint analog (apps/gdal_footprint_lib.cpp:1281): the
    valid-data mask of the image mosaic at ``zoom``, polygonized with
    the cross-cell seam merge — one row per connected data region
    (comp_id, value=1, pixel_count, envelope, n_cells)."""
    from .tiles import _unpack_mask, build_base_tiles

    tiles = build_base_tiles(images, zoom, resampling)

    def to_cells(t: pa.Table) -> pa.Table:
        masks = [
            _unpack_mask(mb).astype(np.uint8).tobytes()
            for mb in t.column("mask_bytes").to_pylist()
        ]
        return pa.table(
            {
                "cell": t.column("cell"),
                "z": t.column("z"),
                "x": t.column("x"),
                "y": t.column("y"),
                "grid_bytes": pa.array(masks, pa.binary()),
            }
        )

    return polygonize(tiles.map_batches(to_cells, batch_format="pyarrow"))


def polygonize(raster_cells, num_partitions: int = 16):
    """Raster cells -> merged components Dataset.

    Seam merge: components emit rows per touched cell border keyed by
    the undirected edge id; groupby(edge) matches stripes into a pair
    graph; min-label propagation reduces the graph; a hash join maps
    每 local component to its root — no driver-side collection at any
    step."""
    comps = raster_cells.map_batches(_per_cell, batch_format="pyarrow").materialize()

    pair_edges = (
        comps.map_batches(_edges, batch_format="pyarrow")
        .groupby("edge")
        .map_groups(_pairs_in_edge, batch_format="pyarrow")
    )
    labels = min_label_components(pair_edges)

    slim_cols = ["canon", "value", "pixel_count", "minx", "miny", "maxx", "maxy"]
    slim = comps.select_columns(slim_cols)
    if labels is None:
        relabeled = slim.map_batches(
            lambda t: t.append_column("comp_id", t.column("canon")),
            batch_format="pyarrow",
        )
    else:
        # cogroup relabel: union (typed-null padded) + groupby(canon)
        def pad_comp(t: pa.Table) -> pa.Table:
            return t.append_column("label", pa.nulls(t.num_rows, pa.int64()))

        def pad_label(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "canon": t.column("node"),
                    "value": pa.nulls(t.num_rows, pa.int32()),
                    "pixel_count": pa.nulls(t.num_rows, pa.int64()),
                    "minx": pa.nulls(t.num_rows, pa.float64()),
                    "miny": pa.nulls(t.num_rows, pa.float64()),
                    "maxx": pa.nulls(t.num_rows, pa.float64()),
                    "maxy": pa.nulls(t.num_rows, pa.float64()),
                    "label": t.column("label"),
                }
            )

        def pick(g: pa.Table) -> pa.Table:
            lbls = g.column("label").drop_null()
            root = (
                int(lbls[0].as_py()) if len(lbls) else int(g.column("canon")[0].as_py())
            )
            data = g.filter(g.column("label").is_null())
            out = data.select(slim_cols)
            return out.append_column(
                "comp_id", pa.array([root] * out.num_rows, pa.int64())
            )

        relabeled = (
            slim.map_batches(pad_comp, batch_format="pyarrow")
            .union(labels.map_batches(pad_label, batch_format="pyarrow"))
            .groupby("canon")
            .map_groups(pick, batch_format="pyarrow")
        )

    from ray.data.aggregate import Count, Max, Min, Sum

    agg = (
        relabeled.select_columns(
            ["comp_id", "value", "pixel_count", "minx", "miny", "maxx", "maxy"]
        )
        .groupby(["comp_id", "value"])
        .aggregate(
            Sum("pixel_count", alias_name="pixel_count"),
            Min("minx", alias_name="minx"),
            Min("miny", alias_name="miny"),
            Max("maxx", alias_name="maxx"),
            Max("maxy", alias_name="maxy"),
            Count(alias_name="n_cells"),
        )
    )

    def shape(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "comp_id": t.column("comp_id"),
                "value": pc.cast(t.column("value"), pa.int64()),
                "pixel_count": t.column("pixel_count"),
                "minx": t.column("minx"),
                "miny": t.column("miny"),
                "maxx": t.column("maxx"),
                "maxy": t.column("maxy"),
                "n_cells": pc.cast(t.column("n_cells"), pa.int64()),
            }
        )

    return agg.map_batches(shape, batch_format="pyarrow")
