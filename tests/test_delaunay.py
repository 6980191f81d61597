"""Delaunay linear gridding: engine (Bowyer-Watson) vs brute-force
ground truth and vs the independent oracle (Lawson flips) — the
augmented-set triangulation contract of functions/delaunay.py.

Reference semantics: alg/gdalgrid.cpp GDALGridLinear + alg/delaunay.c
(barycentric interpolation inside the triangulation, nodata outside).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from gdal_ray.functions.delaunay import (
    FRAME,
    _normalize,
    delaunay_triangles,
    grid_linear,
    incircle_sign,
    orient_sign,
)
from gdal_ray.oracle_ref.rasterref import _rf_grid_linear


def _brute_force(px, py):
    n = len(px)
    nx, ny, _ = _normalize(px, py)
    X = np.concatenate([nx, [f[0] for f in FRAME]])
    Y = np.concatenate([ny, [f[1] for f in FRAME]])
    out = []
    for i, j, k in combinations(range(n), 3):
        o = orient_sign(X[i], Y[i], X[j], Y[j], X[k], Y[k])
        if o == 0:
            continue
        a, b, c = (i, j, k) if o > 0 else (i, k, j)
        others = np.array([m for m in range(n + 3) if m not in (i, j, k)])
        s = incircle_sign(
            X[a], Y[a], X[b], Y[b], X[c], Y[c], X[others], Y[others]
        )
        if (s > 0).any():
            continue
        out.append(tuple(sorted((i, j, k))))
    return sorted(out)


def test_bowyer_watson_matches_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(3):
        px, py = rng.random(35), rng.random(35)
        got = [tuple(r) for r in delaunay_triangles(px, py)]
        assert got == _brute_force(px, py)


def test_planar_field_reproduced_exactly():
    rng = np.random.default_rng(3)
    px, py = rng.random(60) * 100, rng.random(60) * 100
    pv = 2.0 * px + 3.0 * py + 1.0
    xs = np.linspace(10, 90, 16)
    ys = np.linspace(90, 10, 16)
    g = grid_linear(px, py, pv, xs, ys, nodata=np.nan)
    gx, gy = np.meshgrid(xs, ys)
    inside = ~np.isnan(g)
    assert inside.mean() > 0.5
    assert np.allclose(g[inside], (2.0 * gx + 3.0 * gy + 1.0)[inside], rtol=1e-9)


def test_engine_vs_lawson_oracle_bit_exact():
    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(30, 150))
        px = rng.random(n) * 1000 + 500
        py = rng.random(n) * 800 - 200
        pv = rng.random(n) * 251
        px[::13] = 650.0  # collinear column -> on-edge insertions
        px[5], py[5] = px[4], py[4]  # coincident points
        xs = 500 + (np.arange(32) + 0.5) * (1000 / 32)
        ys = 600 - (np.arange(32) + 0.5) * (800 / 32)
        a = grid_linear(px, py, pv, xs, ys)
        b = _rf_grid_linear(px, py, pv, xs, ys)
        assert (a == b).all(), f"trial {trial}: max diff {np.abs(a - b).max()}"


def test_degenerate_inputs():
    # fewer than 3 distinct points -> all-nodata grid
    xs = np.arange(4) + 0.5
    ys = np.arange(4) + 0.5
    g = grid_linear(
        np.array([1.0, 1.0]), np.array([2.0, 2.0]), np.array([5.0, 6.0]),
        xs, ys, nodata=-1.0,
    )
    assert (g == -1.0).all()
    # all-collinear points -> no finite triangles -> all nodata
    px = np.linspace(0, 3, 7)
    g2 = grid_linear(px, px, px, xs, ys, nodata=-1.0)
    assert (g2 == -1.0).all()
