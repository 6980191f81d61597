"""Geometry scalar ops: analytic invariants (engine-side only)."""

import numpy as np
import pyarrow as pa

from gdal_ray.stages.geomops import (
    centroid_batch,
    clip_ring_rect,
    ring_area_fsum,
    simplify_ring,
)


def _square(cx, cy, h):
    return np.array(
        [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h], [cx - h, cy + h]],
        np.float64,
    )


def test_centroid_of_square_is_center():
    sq = _square(1000, 2000, 100)
    t = pa.table(
        {
            "fid": pa.array([7], pa.int64()),
            "xs": pa.array([sq[:, 0].tolist()], pa.list_(pa.float64())),
            "ys": pa.array([sq[:, 1].tolist()], pa.list_(pa.float64())),
        }
    )
    out = centroid_batch(t)
    assert out.column("cx_milli")[0].as_py() == 1000 * 1000
    assert out.column("cy_milli")[0].as_py() == 2000 * 1000


def test_simplify_drops_collinear_midpoints():
    # square with midpoints on each edge: DP at any positive tol drops them
    sq = np.array(
        [
            [0, 0], [50, 0], [100, 0], [100, 50], [100, 100],
            [50, 100], [0, 100], [0, 50],
        ],
        np.float64,
    )
    out = simplify_ring(sq, tol=1.0)
    assert len(out) == 4
    # zero tolerance keeps nothing extra either (distance exactly 0)
    assert len(simplify_ring(sq, tol=0.0)) == 4


def test_clip_rect_area_analytic():
    sq = _square(0, 0, 100)  # area 40000
    out = clip_ring_rect(sq, 0.0, -50.0, 200.0, 50.0)  # overlap 100 x 100
    assert abs(ring_area_fsum(out) - 100.0 * 100.0) < 1e-9
    # disjoint window clips to nothing
    assert len(clip_ring_rect(sq, 500.0, 500.0, 600.0, 600.0)) == 0


def test_clip_nonconvex_subject_area():
    # L-shape (non-convex): clip to a window covering its left arm
    L = np.array(
        [[0, 0], [200, 0], [200, 50], [50, 50], [50, 200], [0, 200]],
        np.float64,
    )
    out = clip_ring_rect(L, 0.0, 0.0, 50.0, 200.0)
    assert abs(ring_area_fsum(out) - 50.0 * 200.0) < 1e-9
