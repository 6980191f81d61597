"""gdal_translate recipe semantics + DEM derivative oracles."""

import numpy as np
import pytest

from gdal_ray.stages.dem import (
    aspect_degrees,
    hillshade,
    roughness,
    slope_degrees,
    tpi,
    tri,
)
from gdal_ray.stages.translate import TranslateChips
from gdal_ray.synth.make_table import chip_pixels

ENV = (1000.0, 2000.0, 1000.0 + 32 * 10.0, 2000.0 + 32 * 10.0)


@pytest.fixture
def img():
    return chip_pixels(11, 32, 32)


def test_srcwin_crop(img):
    tr = TranslateChips(srcwin=(4, 6, 10, 8))
    out, env = tr._one(img, ENV)
    assert out.shape == (8, 10, 3)
    assert np.array_equal(out, img[6:14, 4:14])
    # envelope shifted by the crop offset (10 m/px)
    assert env[0] == ENV[0] + 4 * 10.0
    assert env[3] == ENV[3] - 6 * 10.0


def test_projwin_crop(img):
    tr = TranslateChips(projwin=(ENV[0] + 100.0, ENV[1] + 100.0, ENV[2] - 100.0, ENV[3] - 100.0))
    out, env = tr._one(img, ENV)
    assert out.shape == (12, 12, 3)
    assert np.array_equal(out, img[10:22, 10:22])


def test_out_of_window_returns_none(img):
    tr = TranslateChips(projwin=(0.0, 0.0, 10.0, 10.0))
    out, _ = tr._one(img, ENV)
    assert out is None


def test_band_reorder_and_scale(img):
    tr = TranslateChips(bands=[2, 1, 0], scale=(0, 255, 0, 127))
    out, _ = tr._one(img, ENV)
    # reorder then halve (floor(x*127/255 + 0.5))
    want = np.clip(
        np.floor(img[:, :, [2, 1, 0]].astype(np.float64) * (127 / 255) + 0.5), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(out, want)


def test_resize(img):
    tr = TranslateChips(out_size=(16, 16), resampling="near")
    out, _ = tr._one(img, ENV)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, img[1::2, 1::2])  # near picks floor(s+0.5) on 2x


def test_slope_flat_and_ramp():
    flat = np.full((8, 8), 100.0)
    assert (slope_degrees(flat, 1.0, 1.0) == 0).all()
    yy, xx = np.mgrid[0:8, 0:8]
    ramp = xx.astype(np.float64)  # dz/dx = 1 per pixel
    s = slope_degrees(ramp, 1.0, 1.0)
    assert np.allclose(s[2:-2, 2:-2], 45.0)


def test_aspect_directions():
    yy, xx = np.mgrid[0:8, 0:8]
    east_up = xx.astype(np.float64)  # rises to the east -> aspect west (270)
    a = aspect_degrees(east_up, 1.0, 1.0)
    assert np.allclose(a[2:-2, 2:-2], 270.0)
    flat = np.zeros((4, 4))
    assert (aspect_degrees(flat, 1.0, 1.0) == -9999.0).all()


def test_hillshade_range_and_flat():
    flat = np.zeros((6, 6))
    h = hillshade(flat, 1.0, 1.0)
    # flat surface under 45 deg sun: shade = sin(45) -> ~180
    assert np.allclose(h, int(np.floor(254 * np.sin(np.radians(45)) + 1.5)))
    assert h.dtype == np.uint8


def test_tri_tpi_roughness():
    g = np.zeros((5, 5))
    g[2, 2] = 8.0
    assert tri(g)[2, 2] == 8.0  # all 8 neighbors differ by 8
    assert tpi(g)[2, 2] == 8.0  # center minus mean(0)
    assert roughness(g)[2, 2] == 8.0
    assert roughness(g)[0, 0] == 0.0


def test_hillshade_variants_flat():
    from gdal_ray.stages.dem import (
        hillshade_combined,
        hillshade_igor,
        hillshade_multidirectional,
        hillshade_ref,
    )

    flat = np.zeros((6, 6))
    expect = int(np.floor(1.0 + 254.0 * np.sin(np.radians(45.0)) + 0.5))
    assert (hillshade_ref(flat, 1.0, 1.0) == expect).all()
    assert (hillshade_ref(flat, 1.0, 1.0, alg="zt") == expect).all()
    assert (hillshade_multidirectional(flat, 1.0, 1.0) == expect).all()
    # combined: acos(sin 45) * atan(0) term vanishes -> full bright
    assert (hillshade_combined(flat, 1.0, 1.0) == 255).all()
    # igor: slopeStrength 0 -> shadowness 1 -> 255
    assert (hillshade_igor(flat, 1.0, 1.0) == 255).all()


def test_hillshade_igor_ramp():
    from gdal_ray.stages.dem import hillshade_igor

    yy, xx = np.mgrid[0:8, 0:8]
    ramp = xx.astype(np.float64)  # 45 deg slope facing west (aspect pi)
    # aspectDiff(pi, 3pi/2 - rad(315)) = 3pi/4 -> strength 1/4;
    # shadow = 1 - 0.5 * 0.25 = 0.875 -> 223
    assert (hillshade_igor(ramp, 1.0, 1.0)[2:-2, 2:-2] == 223).all()


def test_slope_aspect_variants():
    from gdal_ray.stages.dem import (
        aspect_trig_degrees,
        aspect_zt_degrees,
        slope_percent,
        slope_zt_degrees,
    )

    yy, xx = np.mgrid[0:8, 0:8]
    ramp = xx.astype(np.float64)
    assert np.allclose(slope_zt_degrees(ramp, 1.0, 1.0)[2:-2, 2:-2], 45.0)
    assert np.allclose(slope_percent(ramp, 1.0, 1.0)[2:-2, 2:-2], 100.0)
    # east-up ramp: azimuth aspect 270, trig aspect 180
    assert np.allclose(aspect_zt_degrees(ramp, 1.0, 1.0)[2:-2, 2:-2], 270.0)
    assert np.allclose(aspect_trig_degrees(ramp, 1.0, 1.0)[2:-2, 2:-2], 180.0)
    flat = np.zeros((4, 4))
    assert (aspect_zt_degrees(flat, 1.0, 1.0) == -9999.0).all()
    assert (aspect_trig_degrees(flat, 1.0, 1.0) == -9999.0).all()


def test_translate_stage_end_to_end(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.translate import translate_images

    imgs = rd.read_parquet(smoke_fixtures["images"]).limit(50)
    out = translate_images(
        imgs, concurrency=1, srcwin=(0, 0, 8, 8), out_size=(4, 4)
    ).to_pandas()
    assert (out.w == 4).all() and (out.h == 4).all()
    assert len(out) == 50
