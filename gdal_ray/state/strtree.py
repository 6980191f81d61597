"""Packed STR R-tree over envelopes — the per-partition join index.

From-scratch numpy implementation following the packed-tree idea of
the reference's FlatGeobuf packed Hilbert R-tree
(ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-120) with STR (sort-tile-
recursive) bulk loading: leaves are built by sorting envelopes into
x-slices then y-order; internal levels aggregate node MBRs bottom-up.

Built once per cell partition (inside a map_groups task or an actor's
``__init__``) and probed with vectorized envelope queries.
"""

from __future__ import annotations

import numpy as np

NODE_CAP = 16


class STRtree:
    """Bulk-loaded static R-tree over n envelopes (minx,miny,maxx,maxy)."""

    def __init__(self, minx, miny, maxx, maxy):
        self.env = np.stack(
            [
                np.asarray(minx, np.float64),
                np.asarray(miny, np.float64),
                np.asarray(maxx, np.float64),
                np.asarray(maxy, np.float64),
            ],
            axis=1,
        )
        n = len(self.env)
        self.n = n
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        # STR packing: sort by x-center into vertical slices, y-center within
        cx = (self.env[:, 0] + self.env[:, 2]) * 0.5
        cy = (self.env[:, 1] + self.env[:, 3]) * 0.5
        n_leaves = int(np.ceil(n / NODE_CAP))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = int(np.ceil(n / n_slices))
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        for s in range(n_slices):
            sl = by_x[s * per_slice : (s + 1) * per_slice]
            order[s * per_slice : s * per_slice + len(sl)] = sl[
                np.argsort(cy[sl], kind="stable")
            ]
        self.order = order
        sorted_env = self.env[order]
        # build levels bottom-up: each level is (m, 4) MBRs of NODE_CAP children
        self.levels = []  # levels[0] = leaf-node MBRs, ..., last = root level
        cur = sorted_env
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / NODE_CAP))
            pad = m * NODE_CAP - len(cur)
            if pad:
                padded = np.vstack(
                    [cur, np.tile([np.inf, np.inf, -np.inf, -np.inf], (pad, 1))]
                )
            else:
                padded = cur
            g = padded.reshape(m, NODE_CAP, 4)
            nxt = np.empty((m, 4))
            nxt[:, 0] = g[:, :, 0].min(axis=1)
            nxt[:, 1] = g[:, :, 1].min(axis=1)
            nxt[:, 2] = g[:, :, 2].max(axis=1)
            nxt[:, 3] = g[:, :, 3].max(axis=1)
            self.levels.append(nxt)
            cur = nxt

    def query(self, qminx, qminy, qmaxx, qmaxy) -> np.ndarray:
        """Indices (into the original arrays) whose envelope intersects
        the query envelope (inclusive edges)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        if not self.levels:
            i = 0 if _env_hits(self.env[self.order[0]], qminx, qminy, qmaxx, qmaxy) else None
            return self.order[:1] if i == 0 else np.empty(0, dtype=np.int64)
        # descend from root level
        nodes = np.arange(len(self.levels[-1]), dtype=np.int64)
        for lvl in range(len(self.levels) - 1, -1, -1):
            env = self.levels[lvl][nodes]
            hit = (
                (env[:, 0] <= qmaxx)
                & (env[:, 2] >= qminx)
                & (env[:, 1] <= qmaxy)
                & (env[:, 3] >= qminy)
            )
            nodes = nodes[hit]
            if len(nodes) == 0:
                return np.empty(0, dtype=np.int64)
            if lvl > 0:
                children = (nodes[:, None] * NODE_CAP + np.arange(NODE_CAP)).ravel()
                nodes = children[children < len(self.levels[lvl - 1])]
        # nodes now index leaf groups of sorted entries
        cand = (nodes[:, None] * NODE_CAP + np.arange(NODE_CAP)).ravel()
        cand = cand[cand < self.n]
        env = self.env[self.order[cand]]
        hit = (
            (env[:, 0] <= qmaxx)
            & (env[:, 2] >= qminx)
            & (env[:, 1] <= qmaxy)
            & (env[:, 3] >= qminy)
        )
        return self.order[cand[hit]]

    def query_points(self, xs: np.ndarray, ys: np.ndarray):
        """Batch point probe: returns (point_idx, entry_idx) candidate
        pairs where the point lies inside the entry envelope (inclusive)."""
        pi, ei = [], []
        for k in range(len(xs)):
            hits = self.query(xs[k], ys[k], xs[k], ys[k])
            if len(hits):
                pi.append(np.full(len(hits), k, dtype=np.int64))
                ei.append(hits)
        if not pi:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pi), np.concatenate(ei)


def _env_hits(env, qminx, qminy, qmaxx, qmaxy) -> bool:
    return (
        env[0] <= qmaxx and env[2] >= qminx and env[1] <= qmaxy and env[3] >= qminy
    )
