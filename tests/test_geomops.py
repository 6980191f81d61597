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


# ------------------------------------------- segmentize / swap / explode


def test_segmentize_short_segments_untouched():
    from gdal_ray.stages.geomops import segmentize_points

    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
    out = segmentize_points(pts[::-1], 10.0)  # direction-canonicalised
    assert np.array_equal(out, pts[::-1])


def test_segmentize_inserts_uniform_points():
    from gdal_ray.stages.geomops import segmentize_points

    pts = np.array([[10.0, 0.0], [0.0, 0.0]])  # first > last: no reverse
    out = segmentize_points(pts, 3.0)
    # d=10, L=3: n_int = floor(10/3 - 0.01) = 3 -> 5 points total
    assert len(out) == 5
    assert np.allclose(np.diff(out[:, 0]), -2.5)


def test_segmentize_direction_independent():
    from gdal_ray.stages.geomops import segmentize_points

    a = np.array([[0.0, 0.0], [7.0, 3.0], [20.0, 5.0]])
    fwd = segmentize_points(a, 2.0)
    rev = segmentize_points(a[::-1], 2.0)
    assert np.array_equal(fwd, rev[::-1])


def test_segmentize_epsilon_guard():
    from gdal_ray.stages.geomops import segmentize_points

    # exactly max_len: within the 1e-5 relative slack -> untouched
    pts = np.array([[3.0, 0.0], [0.0, 0.0]])
    assert len(segmentize_points(pts, 3.0)) == 2


def test_swap_xy_batch_swaps_columns():
    from gdal_ray.stages.geomops import swap_xy_batch

    t = pa.table(
        {
            "fid": pa.array([1], pa.int64()),
            "xs": pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
            "ys": pa.array([[3.0, 4.0]], pa.list_(pa.float64())),
        }
    )
    out = swap_xy_batch(t)
    assert out.column("xs").to_pylist() == [[3.0, 4.0]]
    assert out.column("ys").to_pylist() == [[1.0, 2.0]]


def test_explode_two_part_counts():
    from gdal_ray.stages.geomops import explode_two_part_batch

    t = pa.table(
        {
            "fid": pa.array([7], pa.int64()),
            "xs": pa.array([[0.0, 1.0, 0.5]], pa.list_(pa.float64())),
            "ys": pa.array([[0.0, 0.0, 1.0]], pa.list_(pa.float64())),
        }
    )
    out = explode_two_part_batch(100.0)(t)
    assert out.column("fid").to_pylist() == [7, 7]
    assert out.column("part").to_pylist() == [0, 1]
    assert out.column("n_pts").to_pylist() == [3, 3]


# ------------------------------------------------------------ make-valid


def test_makevalid_canonical_bowtie():
    """The GDAL autotest bowtie POLYGON ((0 0,10 10,0 10,10 0,0 0))
    -> 2-part MULTIPOLYGON, two triangles of area 25 each
    (autotest/ogr/ogr_geom.py makevalid case)."""
    from gdal_ray.functions.makevalid import make_valid_ring

    parts, n_cross = make_valid_ring([0, 10, 0, 10], [0, 10, 10, 0])
    assert n_cross == 1
    assert [p["area"] for p in parts] == [25.0, 25.0]
    assert all(p["n_pts"] == 3 for p in parts)


def test_makevalid_identity_on_valid_ring():
    from gdal_ray.functions.makevalid import make_valid_ring

    parts, n_cross = make_valid_ring([0, 10, 10, 0], [0, 0, 10, 10])
    assert n_cross == 0
    assert len(parts) == 1 and parts[0]["area"] == 100.0


def test_makevalid_star_total_area_deterministic():
    """Higher-order star: decomposition is the engine's documented
    stack-split; parts are simple, nonzero area, deterministic."""
    import numpy as np

    from gdal_ray.functions.makevalid import make_valid_ring

    th = 2 * np.pi * np.arange(5) / 5
    vx = np.floor(1000 * np.cos(th * 2) + 0.5)
    vy = np.floor(1000 * np.sin(th * 2) + 0.5)
    p1, n1 = make_valid_ring(vx, vy)
    p2, n2 = make_valid_ring(vx, vy)
    assert n1 == n2 == 5
    assert [p["area"] for p in p1] == [p["area"] for p in p2]
    assert all(p["area"] > 0 for p in p1)


def test_convex_hull_exact():
    import numpy as np

    from gdal_ray.stages.geomops import convex_hull_pts

    # star: hull drops the concave vertices; collinear midpoint dropped
    pts = np.array(
        [[0, 0], [4, 1], [8, 0], [7, 4], [8, 8], [4, 7], [0, 8], [1, 4],
         [4, 0]],  # (4,0) collinear between (0,0)-(8,0)
        np.int64,
    )
    h = convex_hull_pts(pts)
    hs = {tuple(p) for p in h}
    assert hs == {(0, 0), (8, 0), (8, 8), (0, 8)}


def test_distance_point_semantics():
    import numpy as np
    import pyarrow as pa

    from gdal_ray.stages.geomops import distance_point_batch

    # unit square scaled: probe at (max+30000, min-20000) ->
    # closest point is the corner (1000, 0); exact hypot
    t = pa.table(
        {
            "fid": pa.array([1], pa.int64()),
            "xs": pa.array([[0.0, 1000.0, 1000.0, 0.0]], pa.list_(pa.float64())),
            "ys": pa.array([[0.0, 0.0, 1000.0, 1000.0]], pa.list_(pa.float64())),
        }
    )
    out = distance_point_batch(t)
    import math

    assert out.column("dist")[0].as_py() == math.sqrt(30000.0**2 + 20000.0**2)
