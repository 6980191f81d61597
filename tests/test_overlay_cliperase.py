"""Round-2 ops: co-partitioned Clip/Erase and geometry-output overlay."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions import geom


def _ring(pts):
    a = np.asarray(pts, dtype=np.float64)
    return np.vstack([a, a[:1]])


class TestClipPolygonRect:
    def test_rect_rect(self):
        rect = [_ring([(0, 0), (10, 0), (10, 10), (0, 10)])]
        wkb, area = geom.clip_polygon_rect([rect], 5, 5, 20, 20)
        assert area == pytest.approx(25.0)
        rings = geom.polygon_rings(geom.parse_wkb(wkb))[0]
        ext = rings[0]
        assert ext[:, 0].min() == 5 and ext[:, 0].max() == 10
        assert ext[:, 1].min() == 5 and ext[:, 1].max() == 10

    def test_disjoint(self):
        rect = [_ring([(0, 0), (1, 0), (1, 1), (0, 1)])]
        wkb, area = geom.clip_polygon_rect([rect], 5, 5, 6, 6)
        assert wkb is None and area == 0.0

    def test_hole_subtracts(self):
        ext = _ring([(0, 0), (10, 0), (10, 10), (0, 10)])
        hole = _ring([(4, 4), (4, 6), (6, 6), (6, 4)])  # CW hole
        wkb, area = geom.clip_polygon_rect([[ext, hole]], -1, -1, 11, 11)
        assert area == pytest.approx(100.0 - 4.0)

    def test_triangle_clip_area(self):
        tri = [_ring([(0, 0), (10, 0), (0, 10)])]
        # clip to the lower-left quadrant square [0,5]^2: area = 25 - 12.5/... compute directly
        wkb, area = geom.clip_polygon_rect([tri], 0, 0, 5, 5)
        # triangle covers the square except the corner above x+y=10 — fully inside here
        assert area == pytest.approx(25.0 - 0.0) or area > 0
        # exact: region x,y>=0, x<=5, y<=5, x+y<=10 -> full square 25
        assert area == pytest.approx(25.0)


class TestClipErase(object):
    @pytest.fixture(scope="class")
    def layers(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(7)
        n = 2000
        x = rng.uniform(0, 100000, n)
        y = rng.uniform(0, 100000, n)
        pts = rd.from_arrow(
            pa.table(
                {
                    "pid": pa.array(np.arange(n), pa.int64()),
                    "x": pa.array(x),
                    "y": pa.array(y),
                }
            )
        )
        polys = []
        envs = []
        for k in range(20):
            cx, cy = rng.uniform(10000, 90000, 2)
            r = rng.uniform(2000, 15000)
            ang = 2 * np.pi * np.arange(5) / 5
            ring = _ring(np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], 1))
            polys.append(geom.wkb_polygon([ring]))
            envs.append((ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()))
        envs = np.array(envs)
        pol = rd.from_arrow(
            pa.table(
                {
                    "fid": pa.array(np.arange(20), pa.int64()),
                    "wkb": pa.array(polys, pa.binary()),
                    "minx": pa.array(envs[:, 0]),
                    "miny": pa.array(envs[:, 1]),
                    "maxx": pa.array(envs[:, 2]),
                    "maxy": pa.array(envs[:, 3]),
                }
            )
        )
        # brute-force truth
        matched = np.zeros(n, dtype=bool)
        for wkb in polys:
            g = geom.parse_wkb(wkb)
            matched |= geom.points_intersect_geom(x, y, g)
        return pts, pol, matched

    def test_semi_matches_bruteforce(self, layers):
        from gdal_ray.stages.join import clip_erase_points

        pts, pol, matched = layers
        out = clip_erase_points(pts, pol, zoom=12, anti=False)
        got = sorted(r["pid"] for r in out.take_all())
        assert got == sorted(np.flatnonzero(matched).tolist())

    def test_anti_matches_bruteforce(self, layers):
        from gdal_ray.stages.join import clip_erase_points

        pts, pol, matched = layers
        out = clip_erase_points(pts, pol, zoom=12, anti=True)
        got = sorted(r["pid"] for r in out.take_all())
        assert got == sorted(np.flatnonzero(~matched).tolist())

    def test_semi_anti_partition_points(self, layers):
        from gdal_ray.stages.join import clip_erase_points

        pts, pol, _ = layers
        n_semi = clip_erase_points(pts, pol, zoom=12, anti=False).count()
        n_anti = clip_erase_points(pts, pol, zoom=12, anti=True).count()
        assert n_semi + n_anti == pts.count()


class TestOverlayGeometry:
    def test_intersection_area_vs_direct(self, ray_session):
        import ray.data as rd

        from gdal_ray.stages.join import join_chips_with_polygons

        # chips: unit squares on a grid; polygon: one big triangle
        xs, ys = np.meshgrid(np.arange(10) * 10000.0, np.arange(10) * 10000.0)
        minx, miny = xs.ravel(), ys.ravel()
        chips = rd.from_arrow(
            pa.table(
                {
                    "cid": pa.array(np.arange(100), pa.int64()),
                    "minx": pa.array(minx),
                    "miny": pa.array(miny),
                    "maxx": pa.array(minx + 10000.0),
                    "maxy": pa.array(miny + 10000.0),
                }
            )
        )
        tri = _ring([(5000.0, 5000.0), (95000.0, 5000.0), (5000.0, 95000.0)])
        pol = rd.from_arrow(
            pa.table(
                {
                    "fid": pa.array([0], pa.int64()),
                    "wkb": pa.array([geom.wkb_polygon([tri])], pa.binary()),
                    "minx": pa.array([5000.0]),
                    "miny": pa.array([5000.0]),
                    "maxx": pa.array([95000.0]),
                    "maxy": pa.array([95000.0]),
                }
            )
        )
        out = join_chips_with_polygons(
            chips, pol, zoom=10, chip_cols=["cid"], poly_cols=["fid"],
            emit_geometry=True,
        ).take_all()
        total = sum(r["inter_area"] for r in out)
        assert total == pytest.approx(abs(geom.ring_area(tri)))
        # each clipped geometry's own shoelace area must equal inter_area
        for r in out:
            if r["inter_wkb"]:
                rings = geom.polygon_rings(geom.parse_wkb(r["inter_wkb"]))
                a = sum(abs(geom.ring_area(p[0])) for p in rings)
                assert a == pytest.approx(r["inter_area"])


def test_translate_rejects_two_bands():
    from gdal_ray.stages.translate import TranslateChips

    with pytest.raises(ValueError):
        TranslateChips(bands=[0, 1])
