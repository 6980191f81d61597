"""simplify-coverage: distributed engine vs the dict-based golden,
plus the coverage-preservation invariants."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages.coverage import (
    _ring_area2,
    coverage_fixture_quad,
    simplify_coverage,
    simplify_ring_in_coverage,
    vw_open,
)


def _fixture_ds(grid: int):
    import ray.data as rd

    rows = []
    for k in range(grid * grid):
        i, j = k % grid, k // grid
        ring = coverage_fixture_quad(i, j, grid)
        rows.append(
            (k, [float(p[0]) for p in ring], [float(p[1]) for p in ring])
        )
    t = pa.table(
        {
            "fid": pa.array([r[0] for r in rows], pa.int64()),
            "xs": pa.array([r[1] for r in rows], pa.list_(pa.float64())),
            "ys": pa.array([r[2] for r in rows], pa.list_(pa.float64())),
        }
    )
    return rd.from_arrow(t).repartition(4)


def test_vw_open_basic():
    # near-flat chain with one small bump: the near-collinear vertices
    # (doubled areas 10) go first; the bump vertex's area GROWS as its
    # neighbours vanish (10 -> 30 -> 40) and survives the threshold
    pts = np.array([[0, 0], [10, 0], [20, 1], [30, 0], [40, 0]], np.int64)
    keep = vw_open(pts, area2_thresh=25)
    assert keep.tolist() == [True, False, True, False, True]
    keep2 = vw_open(pts, area2_thresh=1)
    assert keep2.all()
    # raising the threshold past the recomputed area removes the bump too
    keep3 = vw_open(pts, area2_thresh=100)
    assert keep3.tolist() == [True, False, False, False, True]


def test_engine_matches_golden_and_conserves(ray_session):
    from gdal_ray.oracle_ref.geomref import _cov_simplify_ref

    G = 8
    ds = _fixture_ds(G)
    for preserve in (False, True):
        eng = (
            simplify_coverage(ds, tolerance=3000.0, preserve_boundary=preserve)
            .to_pandas()
            .sort_values("fid")
            .reset_index(drop=True)
        )
        ref = _cov_simplify_ref(G, 3000.0, preserve)
        assert len(eng) == G * G
        for _, r in eng.iterrows():
            n_in, n_out, area2 = ref[int(r.fid)]
            assert (r.n_in, r.n_out, r.area2_out) == (n_in, n_out, area2), (
                int(r.fid), preserve
            )
        # topology preservation: with the outer boundary fixed, the
        # simplified parts must tile the SAME total area exactly
        # (shared arcs simplified identically on both sides)
        if preserve:
            assert int(eng.area2_out.sum()) == int(eng.area2_in.sum())
        assert (eng.n_out < eng.n_in).any()
        assert (eng.n_out >= 4).all()


def test_island_closed_ring():
    # single-signature ring (island): canonical-rotation closed VW
    pts = np.array(
        [[0, 0], [50, 1], [100, 0], [100, 100], [0, 100]], np.int64
    )
    nbr = np.full(5, -1, np.int64)
    keep = simplify_ring_in_coverage(pts, nbr, tolerance=20.0)
    # vertex (50,1) has doubled area |cross|=200 < 2*20^2=800 -> removed
    assert not keep[1] and keep.sum() == 4
    assert _ring_area2(pts[keep]) == 2 * 100 * 100
    # preserve_boundary leaves the island untouched
    keep_pb = simplify_ring_in_coverage(
        pts, nbr, tolerance=20.0, preserve_boundary=True
    )
    assert keep_pb.all()
