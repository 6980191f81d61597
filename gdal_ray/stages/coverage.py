"""Polygonal-coverage simplification (gdal vector simplify-coverage).

Reference: apps/gdalalg_vector_simplify_coverage.cpp, which delegates
to GEOS >= 3.12 GEOSCoverageSimplifyVW_r(tolerance, preserveBoundary):
Visvalingam-Whyatt simplification applied to the SHARED ARCS of a
valid polygonal coverage, so the common boundary between two
neighbouring polygons is simplified once and identically on both
sides — the simplified layer stays a gap-free / overlap-free coverage.

Ray-Data-first decomposition (no driver state, two shuffles):

1. ``flat_map`` each feature ring into micro-segments keyed by a
   canonical undirected hash of the two endpoint coordinates.
2. ``groupby(skey)`` — each group holds the 1 or 2 features using the
   segment; emit per copy its neighbour signature
   ``(fid, ring_idx, nbr)`` (nbr = other fid, or -1 on the coverage
   boundary).  This is the only cross-feature exchange.
3. Bare-row union of the signature rows with the original feature
   rows, then one ``groupby(fid)``: rebuild the per-ring neighbour
   array, split the ring into maximal arcs of constant signature
   (arc endpoints = topology nodes: any vertex where the neighbour
   changes, which includes every >= 3-polygon corner), and simplify
   each arc INDEPENDENTLY in a canonical orientation.

No simplified geometry is ever shipped between features: because both
sides of a shared arc see the identical vertex chain, each side
re-derives the identical VW result locally (canonical orientation =
lexicographically smaller endpoint first; deterministic (area, index)
tie-break).  This is what makes the operator embarrassingly
data-parallel after the signature shuffle.

Exactness: the fixture vertices are integer lattice coordinates, and
VW effective areas are doubled-triangle areas computed with int64
cross products — every engine<->golden comparison is exact integer
arithmetic, no float contract needed.

VW contract (documented, both engine and the independent golden):
remove the interior vertex with the smallest doubled triangle area
|cross(prev, v, next)| while that minimum is < 2*tolerance^2,
recomputing neighbour areas after each removal; ties broken by the
lowest vertex index; arc endpoints are never removed.  A closed arc
(island ring / full-ring neighbour pair) rotates to start at its
lexicographically smallest vertex and keeps >= 3 vertices.
``preserve_boundary=True`` leaves nbr == -1 arcs (the coverage's
exterior boundary) untouched, matching the reference flag.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _seg_key(x0: int, y0: int, x1: int, y1: int) -> int:
    """Canonical undirected segment key (order-independent 63-bit)."""
    if (x0, y0) > (x1, y1):
        x0, y0, x1, y1 = x1, y1, x0, y0
    h = hashlib.blake2b(
        struct.pack("<qqqq", x0, y0, x1, y1), digest_size=8
    ).digest()
    return int.from_bytes(h, "little") >> 1


def _exact_xy(pts: np.ndarray):
    """Coordinate columns for exact cross products: translated int64
    when the chain's span keeps every product-sum far from 2^63
    (span < 2^20 -> |cross| < 2^41), else Python big-int objects."""
    span = int(pts.max()) - int(pts.min()) if len(pts) else 0
    if span < (1 << 20):
        return (pts[:, 0] - pts[0, 0], pts[:, 1] - pts[0, 1])
    return (pts[:, 0].astype(object), pts[:, 1].astype(object))


def vw_open(pts: np.ndarray, area2_thresh: int) -> np.ndarray:
    """Visvalingam-Whyatt on an open chain; endpoints fixed.

    pts: (k, 2) int64.  Returns the boolean keep-mask.  O(k^2) re-scan
    (arcs are short); exact int arithmetic throughout."""
    k = len(pts)
    keep = np.ones(k, dtype=bool)
    if k <= 2:
        return keep
    x, y = _exact_xy(pts)
    alive = list(range(k))
    while len(alive) > 2:
        best_i = -1
        best_a = None
        for j in range(1, len(alive) - 1):
            p, v, n = alive[j - 1], alive[j], alive[j + 1]
            a2 = abs(
                (x[v] - x[p]) * (y[n] - y[p]) - (x[n] - x[p]) * (y[v] - y[p])
            )
            if best_a is None or a2 < best_a:
                best_a, best_i = a2, j
        if best_a is None or best_a >= area2_thresh:
            break
        keep[alive[best_i]] = False
        del alive[best_i]
    return keep


def vw_closed(pts: np.ndarray, area2_thresh: int) -> np.ndarray:
    """VW on a closed ring (no fixed endpoints), >= 3 vertices kept."""
    k = len(pts)
    keep = np.ones(k, dtype=bool)
    x, y = _exact_xy(pts)
    alive = list(range(k))
    while len(alive) > 3:
        best_i = -1
        best_a = None
        m = len(alive)
        for j in range(m):
            p, v, n = alive[j - 1], alive[j], alive[(j + 1) % m]
            a2 = abs(
                (x[v] - x[p]) * (y[n] - y[p]) - (x[n] - x[p]) * (y[v] - y[p])
            )
            if best_a is None or a2 < best_a:
                best_a, best_i = a2, j
        if best_a is None or best_a >= area2_thresh:
            break
        keep[alive[best_i]] = False
        del alive[best_i]
    return keep


def _ring_area2(pts: np.ndarray) -> int:
    """Exact doubled shoelace area (int64 lattice; translated-int64
    fast path under the _exact_xy span guard, big-int otherwise)."""
    if len(pts) == 0:
        return 0
    x, y = _exact_xy(pts)
    xn = np.roll(x, -1)
    yn = np.roll(y, -1)
    return abs(int(np.sum(x * yn - xn * y)))


def simplify_ring_in_coverage(
    pts: np.ndarray, nbr: np.ndarray, tolerance: float,
    preserve_boundary: bool = False,
) -> np.ndarray:
    """Simplify one ring given its per-segment neighbour signature.

    pts: (n, 2) int64 open ring (no repeated last vertex); nbr[i] is
    the neighbour fid of segment (pts[i], pts[i+1 mod n]).  Returns
    the keep-mask over vertices."""
    n = len(pts)
    area2_thresh = int(2 * tolerance * tolerance)
    if n < 4:
        return np.ones(n, dtype=bool)
    if (nbr == nbr[0]).all():
        # single-signature ring: island (or full-ring pair) — closed arc
        if preserve_boundary and nbr[0] < 0:
            return np.ones(n, dtype=bool)
        start = int(
            np.lexsort((pts[:, 1], pts[:, 0]))[0]
        )  # canonical rotation: lexicographic min vertex
        rot = np.roll(np.arange(n), -start)
        keep_rot = vw_closed(pts[rot], area2_thresh)
        keep = np.empty(n, dtype=bool)
        keep[rot] = keep_rot
        return keep
    # rotate so index 0 is a signature boundary (nbr changes at -1 -> 0)
    start = int(np.flatnonzero(nbr != np.roll(nbr, 1))[0])
    rot = np.roll(np.arange(n), -start)
    rpts, rnbr = pts[rot], nbr[rot]
    # arc runs of constant signature
    cut = np.flatnonzero(rnbr != np.roll(rnbr, 1))  # run starts, incl. 0
    keep_rot = np.ones(n, dtype=bool)
    bounds = list(cut) + [n]
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        # arc vertices: b0 .. b1 (inclusive of the closing node b1 % n)
        idxs = np.arange(b0, b1 + 1)
        chain = rpts[idxs % n]
        if preserve_boundary and rnbr[b0] < 0:
            continue
        # canonical orientation: smaller endpoint first
        if tuple(chain[-1]) < tuple(chain[0]):
            k = vw_open(chain[::-1], area2_thresh)[::-1]
        else:
            k = vw_open(chain, area2_thresh)
        inner = idxs[1:-1] % n  # endpoints are nodes, always kept
        keep_rot[inner] = k[1:-1]
    keep = np.empty(n, dtype=bool)
    keep[rot] = keep_rot
    return keep


def simplify_coverage(
    features, tolerance: float, preserve_boundary: bool = False
):
    """Distributed coverage simplification over a Dataset of
    (fid int64, xs list<double>, ys list<double>) integer-lattice open
    rings.  Output: (fid, n_in, n_out, area2_in, area2_out) — doubled
    shoelace areas exact int64."""

    def emit_segments(t: pa.Table) -> pa.Table:
        fid = t.column("fid").to_numpy(zero_copy_only=False)
        xs = t.column("xs").to_pylist()
        ys = t.column("ys").to_pylist()
        keys, fids, idxs = [], [], []
        for f, xr, yr in zip(fid, xs, ys):
            n = len(xr)
            for i in range(n):
                j = (i + 1) % n
                keys.append(
                    _seg_key(int(xr[i]), int(yr[i]), int(xr[j]), int(yr[j]))
                )
                fids.append(int(f))
                idxs.append(i)
        return pa.table(
            {
                "skey": pa.array(keys, pa.int64()),
                "fid": pa.array(fids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
            }
        )

    # Neighbour signatures WITHOUT per-segment map_groups (hundreds of
    # thousands of 1-2-row groups = one Python call each; measured 10x
    # slower than this shape at the 14k-feature scale).  For a valid
    # coverage every segment is used by 1 or 2 rings, so the neighbour
    # of a segment copy is sum(fids at skey) - own_fid when the count
    # is 2: one VECTORIZED hash-aggregate shuffle (Count + Sum per
    # skey), then a partition-local searchsorted join back onto the
    # segment stream (union + one groupby over num_partitions hash
    # parts — a handful of vectorized group calls, not one per key).
    from ray.data.aggregate import Count, Sum

    num_partitions = 32
    seg = features.map_batches(emit_segments, batch_format="pyarrow")
    aggs = seg.groupby("skey").aggregate(
        Count(alias_name="__c"), Sum("fid", alias_name="__s")
    )

    def _part(sk: np.ndarray) -> np.ndarray:
        c = sk.astype(np.uint64)
        c = (c ^ (c >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        c = c ^ (c >> np.uint64(33))
        return (c % np.uint64(num_partitions)).astype(np.int64)

    def tag_seg(t: pa.Table) -> pa.Table:
        sk = t.column("skey").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(_part(sk), pa.int64()),
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
                "skey": t.column("skey"),
                "fid": t.column("fid"),
                "idx": t.column("idx"),
                "__c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "__s": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def tag_agg(t: pa.Table) -> pa.Table:
        sk = t.column("skey").to_numpy(zero_copy_only=False)
        n = t.num_rows
        return pa.table(
            {
                "part": pa.array(_part(sk), pa.int64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
                "skey": t.column("skey"),
                "fid": pa.array(np.zeros(n, np.int64), pa.int64()),
                "idx": pa.array(np.zeros(n, np.int64), pa.int64()),
                "__c": pc.cast(t.column("__c"), pa.int64()),
                "__s": pc.cast(t.column("__s"), pa.int64()),
            }
        )

    both = seg.map_batches(tag_seg, batch_format="pyarrow").union(
        aggs.map_batches(tag_agg, batch_format="pyarrow")
    )

    def part_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        am = side == 1
        keys = sk[am]
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        cc = g.column("__c").to_numpy(zero_copy_only=False)[am][order]
        ss = g.column("__s").to_numpy(zero_copy_only=False)[am][order]
        if (cc > 2).any():
            bad = int(cc.max())
            raise ValueError(
                f"segment shared by {bad} rings: not a valid coverage"
            )
        sm = ~am
        pos = np.searchsorted(keys, sk[sm])
        fid = g.column("fid").to_numpy(zero_copy_only=False)[sm]
        nbr = np.where(cc[pos] == 2, ss[pos] - fid, -1)
        return pa.table(
            {
                "fid": pa.array(fid, pa.int64()),
                "idx": pa.array(
                    g.column("idx").to_numpy(zero_copy_only=False)[sm],
                    pa.int64(),
                ),
                "nbr": pa.array(nbr, pa.int64()),
            }
        )

    sig = both.groupby("part").map_groups(part_join, batch_format="pyarrow")

    # bare-row union with the feature rows, one groupby(fid) to join
    def feature_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "fid": t.column("fid"),
                "idx": pa.array(np.full(n, -1), pa.int64()),
                "nbr": pa.array(np.zeros(n, np.int64), pa.int64()),
                "xs": t.column("xs"),
                "ys": t.column("ys"),
            }
        )

    def sig_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        empty = pa.array([None] * n, pa.list_(pa.float64()))
        return pa.table(
            {
                "fid": t.column("fid"),
                "idx": t.column("idx"),
                "nbr": t.column("nbr"),
                "xs": empty,
                "ys": empty,
            }
        )

    # The reassembly groups by a HASH PART of fid, not fid itself —
    # one vectorized group call per partition instead of one Python
    # call per feature (same per-key-overhead argument as the
    # signature join above).
    def feature_rows_p(t: pa.Table) -> pa.Table:
        t = feature_rows(t)
        return t.append_column(
            "fpart",
            pa.array(_part(t.column("fid").to_numpy(zero_copy_only=False)),
                     pa.int64()),
        )

    def sig_rows_p(t: pa.Table) -> pa.Table:
        t = sig_rows(t)
        return t.append_column(
            "fpart",
            pa.array(_part(t.column("fid").to_numpy(zero_copy_only=False)),
                     pa.int64()),
        )

    unioned = features.map_batches(
        feature_rows_p, batch_format="pyarrow"
    ).union(sig.map_batches(sig_rows_p, batch_format="pyarrow"))

    def simplify_part(g: pa.Table) -> pa.Table:
        fid_a = g.column("fid").to_numpy(zero_copy_only=False)
        idx_a = g.column("idx").to_numpy(zero_copy_only=False)
        nbr_a = g.column("nbr").to_numpy(zero_copy_only=False)
        order = np.lexsort((idx_a, fid_a))
        fid_s, idx_s, nbr_s = fid_a[order], idx_a[order], nbr_a[order]
        starts = np.flatnonzero(
            np.concatenate([[True], fid_s[1:] != fid_s[:-1]])
        )
        bounds = list(starts) + [len(fid_s)]
        xs_col, ys_col = g.column("xs"), g.column("ys")
        o_f, o_ni, o_no, o_ai, o_ao = [], [], [], [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            rows = order[b0:b1]
            # idx == -1 sorts first within the fid run
            if idx_s[b0] != -1:
                continue  # signature rows without a feature row
            frow = int(rows[0])
            xr = np.asarray(xs_col[frow].as_py(), np.int64)
            yr = np.asarray(ys_col[frow].as_py(), np.int64)
            pts = np.column_stack([xr, yr])
            n = len(pts)
            nbr = np.full(n, -1, dtype=np.int64)
            si = idx_s[b0 + 1 : b1]
            nbr[si] = nbr_s[b0 + 1 : b1]
            keep = simplify_ring_in_coverage(
                pts, nbr, tolerance, preserve_boundary
            )
            out = pts[keep]
            o_f.append(int(fid_s[b0]))
            o_ni.append(n)
            o_no.append(int(keep.sum()))
            o_ai.append(_ring_area2(pts))
            o_ao.append(_ring_area2(out))
        return pa.table(
            {
                "fid": pa.array(o_f, pa.int64()),
                "n_in": pa.array(o_ni, pa.int64()),
                "n_out": pa.array(o_no, pa.int64()),
                "area2_in": pa.array(o_ai, pa.int64()),
                "area2_out": pa.array(o_ao, pa.int64()),
            }
        )

    return unioned.groupby("fpart").map_groups(
        simplify_part, batch_format="pyarrow"
    )


# ------------------------------------------------- deterministic fixture


LATTICE_STEP = 100000  # lattice pitch (int)
DENSIFY = 3  # interior points per lattice edge


def _mix(*ks: int) -> int:
    """Deterministic integer hash of a key tuple."""
    h = hashlib.blake2b(
        struct.pack(f"<{len(ks)}q", *ks), digest_size=8
    ).digest()
    return int.from_bytes(h, "little")


def _node(i: int, j: int, grid: int) -> tuple[int, int]:
    """Jittered lattice node; hull nodes stay on the lattice."""
    S = LATTICE_STEP
    if 0 < i < grid and 0 < j < grid:
        jx = _mix(i, j, 1) % (S // 4) - S // 8
        jy = _mix(i, j, 2) % (S // 4) - S // 8
        return i * S + jx, j * S + jy
    return i * S, j * S


def _edge_polyline(a: tuple[int, int], b: tuple[int, int],
                   ka: tuple[int, int], kb: tuple[int, int]):
    """Densified polyline between nodes a->b with perpendicular jitter,
    a pure function of the CANONICAL edge key (so both adjacent quads
    derive the identical chain).  Returns the interior points only, in
    a->b order."""
    rev = kb < ka
    if rev:
        a, b, ka, kb = b, a, kb, ka
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    # unit-ish perpendicular scaled by 1/|d| via integer rational: the
    # perpendicular offset is applied as round(perp * t / |d|) with
    # |d| ~ LATTICE_STEP; use float here then round — deterministic
    # IEEE, and the result is an int lattice coordinate.
    L = float(np.hypot(dx, dy))
    pts = []
    for t in range(1, DENSIFY + 1):
        f = t / (DENSIFY + 1)
        d = _mix(ka[0], ka[1], kb[0], kb[1], t) % 4001 - 2000
        px = int(round(ax + f * dx + (-dy) * d / L))
        py = int(round(ay + f * dy + dx * d / L))
        pts.append((px, py))
    if rev:
        pts.reverse()
    return pts


def coverage_fixture_quad(i: int, j: int, grid: int):
    """Open ring (int lattice) of quad (i, j): corners CCW with
    densified shared edges."""
    corners = [(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1)]
    ring = []
    for c in range(4):
        ka, kb = corners[c], corners[(c + 1) % 4]
        a, b = _node(*ka, grid), _node(*kb, grid)
        ring.append(a)
        ring.extend(_edge_polyline(a, b, ka, kb))
    return ring
