"""Pixel-step algebra: reclassify / unscale / nodata-to-alpha /
color-merge / stack (stages/pixelops.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.stages import pixelops
from gdal_ray.stages.pixelops import (
    MappingParseError,
    parse_mapping,
    reclassify_array,
)


# ------------------------------------------------------ mapping parser


def test_parse_constants_and_intervals():
    spec = parse_mapping("1=10;(2,4]=20;[5,7)=30")
    assert list(spec["mins"])[0] == 1.0
    # open lower endpoint moved inward
    assert spec["mins"][1] > 2.0
    assert spec["maxs"][1] == 4.0
    assert spec["mins"][2] == 5.0
    assert spec["maxs"][2] < 7.0


def test_parse_inf_and_default():
    spec = parse_mapping("[0,inf]=1;DEFAULT=9")
    assert spec["maxs"][0] == math.inf
    assert spec["default"] == 9.0


def test_parse_nodata_source_and_dest():
    spec = parse_mapping("NO_DATA=0;5=NO_DATA", nodata=255.0)
    assert 255.0 in spec["mins"]
    with pytest.raises(MappingParseError):
        parse_mapping("NO_DATA=0")  # nodata unset


def test_parse_overlap_rejected():
    with pytest.raises(MappingParseError):
        parse_mapping("[0,5]=1;[5,9]=2")
    # adjacent after open-endpoint adjustment is fine
    parse_mapping("[0,5]=1;(5,9]=2")


def test_parse_pass_through():
    spec = parse_mapping("[0,10]=PASS_THROUGH;DEFAULT=0")
    x = np.array([3.0, 50.0])
    out = reclassify_array(x, spec)
    assert out[0] == 3.0 and out[1] == 0.0


# ------------------------------------------------------ classify kernel


def test_reclassify_values():
    spec = parse_mapping("[0,63]=10;(63,127]=20;[128,191)=30;255=77;DEFAULT=40")
    x = np.array([0, 63, 64, 127, 128, 190, 191, 254, 255], np.float64)
    out = reclassify_array(x, spec)
    assert list(out) == [10, 10, 20, 20, 30, 30, 40, 40, 77]


def test_reclassify_unmatched_raises():
    spec = parse_mapping("[0,10]=1")
    with pytest.raises(ValueError):
        reclassify_array(np.array([99.0]), spec)


def test_reclassify_nan_routing():
    spec = parse_mapping("NO_DATA=7;DEFAULT=1", nodata=float("nan"))
    out = reclassify_array(np.array([np.nan, 3.0]), spec)
    assert out[0] == 7.0 and out[1] == 1.0


# ------------------------------------------------------ HSV round trip


def test_hsv_roundtrip_pure_and_gray():
    # saturated primaries and grays survive merge with their own value
    px = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [128, 128, 128]]], np.uint8
    )
    h, s = pixelops.rgb_to_hs(px[:, :, 0], px[:, :, 1], px[:, :, 2])
    # value channel = max(r,g,b) keeps the original colors
    v = px.max(axis=2).astype(np.uint8)
    r, g, b = pixelops.hsv_to_rgb(h, s, v)
    out = np.stack([r, g, b], axis=2)
    assert np.array_equal(out, px)


def test_hsv_merge_replaces_value():
    px = np.full((2, 2, 3), [200, 100, 50], np.uint8)
    gray = np.full((2, 2), 90, np.uint8)
    out = pixelops._merge_one(px, gray)
    # max channel becomes the gray value; hue ordering preserved
    assert out[:, :, 0].max() == 90
    assert (out[0, 0, 0] > out[0, 0, 1] > out[0, 0, 2])


# ------------------------------------------------------ dataset stages


def _chips_ds(n=6):
    import ray.data as rd

    from gdal_ray.functions import codecs

    rng = np.random.default_rng(7)
    rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
    for i in range(n):
        img = rng.integers(0, 256, (8, 8, 3), np.uint8)
        rows["image_id"].append(f"t{i}")
        rows["bytes"].append(codecs.encode(img, "raw"))
        rows["w"].append(8)
        rows["h"].append(8)
        rows["fmt"].append("raw")
    return rd.from_arrow(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "fmt": pa.array(rows["fmt"], pa.string()),
            }
        )
    )


def test_unscale_stage(ray_session):
    ds = pixelops.unscale_images(_chips_ds(), scale=2.0, offset=-1.0)
    t = ds.take_all()
    assert len(t) == 6
    r = t[0]
    a = np.frombuffer(r["data"], np.float32).reshape(8, 8, 3)
    assert r["dtype"] == "float32"
    assert a.min() >= -1.0 and a.max() <= 2 * 255 - 1


def test_nodata_to_alpha_stage(ray_session):
    ds = pixelops.nodata_to_alpha_images(_chips_ds(), nodata=(0.0, 0.0, 0.0))
    rows = ds.take_all()
    a = np.frombuffer(rows[0]["data"], np.uint8)
    assert set(np.unique(a)) <= {0, 255}


def test_color_merge_and_stack_pair_by_id(ray_session):
    ds = _chips_ds()
    merged = pixelops.color_merge_images(ds, ds).take_all()
    assert sorted(r["image_id"] for r in merged) == [f"t{i}" for i in range(6)]
    stacked = pixelops.stack_images(ds, ds).take_all()
    a = np.frombuffer(stacked[0]["data"], np.uint8)
    assert a.size == 8 * 8 * 6  # six bands
