"""Polygonize — raster connected components with cross-cell seam merge.

Reference semantics: alg/polygonize.cpp:73 GDALPolygonizeT — scanline-
pairwise connected-component tracing (4-connectivity, equal pixel
value), zero treated as nodata/background.  The distributed twist
(SURVEY.md §2.9): components are labeled per cell, then components
touching a shared cell border are merged by a groupby on the border's
edge key + a union-find reduce over the (small) cross-border adjacency
graph, exactly the 'per-cell trace + seam merge' plan.

Input rows: the rasterize output (cell, z, x, y, grid_bytes 256x256
uint8).  Output rows: one per merged component — comp_id (stable
string), value, pixel_count, minx, miny, maxx, maxy (georeferenced
envelope), n_cells (how many cells it spans).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import mercator

GRID = 256


def _label_components(g: np.ndarray):
    """Two-pass run-based 4-connected labeling of equal-valued nonzero
    pixels (the scanline-pair strategy of polygonize.cpp).  Returns
    (labels int32 array, n_labels); labels are 1..n."""
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
        # extract runs of equal nonzero values
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
    # flatten labels
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
    """Per-cell labeling: emits one row per (cell, local component) with
    stats + the four border label/value stripes for seam matching."""
    out = {
        "cell": [], "z": [], "x": [], "y": [], "local_id": [], "value": [],
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
        for lbl in range(1, n + 1):
            mask = labels == lbl
            ys, xs = np.nonzero(mask)
            v = int(g[ys[0], xs[0]])
            out["cell"].append(cell)
            out["z"].append(z)
            out["x"].append(tx)
            out["y"].append(ty)
            out["local_id"].append(lbl)
            out["value"].append(v)
            out["pixel_count"].append(int(mask.sum()))
            out["minx"].append(bminx + xs.min() * res)
            out["maxx"].append(bminx + (xs.max() + 1) * res)
            out["maxy"].append(bmaxy - ys.min() * res)
            out["miny"].append(bmaxy - (ys.max() + 1) * res)
        # border stripes: this component's pixels on each cell border
        for lbl in range(1, n + 1):
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
            "local_id": pa.array(out["local_id"], pa.int32()),
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


def polygonize(raster_cells, num_partitions: int = 16):
    """Raster cells -> merged components Dataset.

    Seam merge: each component emits one row per cell border it
    touches, keyed by the undirected edge id; groupby(edge) finds
    cross-cell pairs (same value, overlapping border pixels); the pair
    graph (small: border-crossing comps only) is reduced by union-find
    and broadcast back to relabel (the 'GB on shared-edge key' plan of
    SURVEY.md §2.9)."""
    import ray
    import ray.data as rd

    comps = raster_cells.map_batches(_per_cell, batch_format="pyarrow").materialize()

    def edges(t: pa.Table) -> pa.Table:
        rows = {"edge": [], "guid": [], "value": [], "stripe": [], "side": []}
        for r in range(t.num_rows):
            z = int(t.column("z")[r].as_py())
            x = int(t.column("x")[r].as_py())
            y = int(t.column("y")[r].as_py())
            guid = f"{z}/{x}/{y}/{int(t.column('local_id')[r].as_py())}"
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
                # undirected edge id between (x,y) and neighbor
                a = (z, x, y)
                b = (z, nx, ny)
                lo, hi = (a, b) if a <= b else (b, a)
                rows["edge"].append(f"{lo[0]}/{lo[1]}/{lo[2]}|{hi[1]}/{hi[2]}")
                rows["guid"].append(guid)
                rows["value"].append(v)
                rows["stripe"].append(stripe.tobytes())
                rows["side"].append(side)
        return pa.table(
            {
                "edge": pa.array(rows["edge"], pa.string()),
                "guid": pa.array(rows["guid"], pa.string()),
                "value": pa.array(rows["value"], pa.int32()),
                "stripe": pa.array(rows["stripe"], pa.binary()),
                "side": pa.array(rows["side"], pa.string()),
            }
        )

    import pandas as pd

    def pairs_in_edge(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        # opposite sides touch: e<->w and n<->s
        for sa, sb in (("e", "w"), ("n", "s")):
            ga = g[g.side == sa]
            gb = g[g.side == sb]
            for _, ra in ga.iterrows():
                st_a = np.frombuffer(ra.stripe, dtype=np.uint8).astype(bool)
                for _, rb in gb.iterrows():
                    if ra.value != rb.value:
                        continue
                    st_b = np.frombuffer(rb.stripe, dtype=np.uint8).astype(bool)
                    if (st_a & st_b).any():
                        out_a.append(ra.guid)
                        out_b.append(rb.guid)
        return pd.DataFrame({"a": pd.Series(out_a, dtype=object),
                             "b": pd.Series(out_b, dtype=object)})

    adj = (
        comps.map_batches(edges, batch_format="pyarrow")
        .groupby("edge")
        .map_groups(pairs_in_edge, batch_format="pandas")
        .to_pandas()
    )
    # union-find over the (small) cross-border adjacency graph
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(adj.get("a", []), adj.get("b", [])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    mapping = {k: find(k) for k in list(parent)}
    map_ref = ray.put(mapping)

    def relabel(t: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        guids = [
            f"{z}/{x}/{y}/{l}"
            for z, x, y, l in zip(
                t.column("z").to_pylist(),
                t.column("x").to_pylist(),
                t.column("y").to_pylist(),
                t.column("local_id").to_pylist(),
            )
        ]
        comp = [m.get(g_, g_) for g_ in guids]
        return pa.table(
            {
                "comp_id": pa.array(comp, pa.string()),
                "value": t.column("value"),
                "pixel_count": t.column("pixel_count"),
                "minx": t.column("minx"),
                "miny": t.column("miny"),
                "maxx": t.column("maxx"),
                "maxy": t.column("maxy"),
            }
        )

    from ray.data.aggregate import Count, Max, Min, Sum

    return (
        comps.map_batches(relabel, batch_format="pyarrow")
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
