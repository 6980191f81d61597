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


# ------------------------------------------------- area resample kernels


def _brute_area(img, out_w, out_h, method):
    """Per-pixel restatement of GWKAverageOrModeThread (independent of
    the vectorized engine path)."""
    EPS = 1e-10
    h, w = img.shape[:2]
    rx, ry = w / out_w, h / out_h
    out = np.zeros((out_h, out_w, img.shape[2]))
    for i in range(out_h):
        for j in range(out_w):
            xmin, xmax = j * rx, (j + 1) * rx
            ymin, ymax = i * ry, (i + 1) * ry
            x0 = int(max(np.floor(xmin + EPS), 0))
            x1 = int(min(np.ceil(xmax - EPS), w))
            if x0 == x1 and x1 < w:
                x1 += 1
            y0 = int(max(np.floor(ymin + EPS), 0))
            y1 = int(min(np.ceil(ymax - EPS), h))
            if y0 == y1 and y1 < h:
                y1 += 1
            vals, wts = [], []
            for yy in range(y0, y1):
                wy = (1.0 if y1 - y0 == 1 else
                      1 - (ymin - y0) if yy == y0 else
                      1 - (y1 - ymax) if yy == y1 - 1 else 1.0)
                for xx in range(x0, x1):
                    wx = (1.0 if x1 - x0 == 1 else
                          1 - (xmin - x0) if xx == x0 else
                          1 - (x1 - xmax) if xx == x1 - 1 else 1.0)
                    vals.append(img[yy, xx].astype(np.float64))
                    wts.append(wy * wx)
            vals, wts = np.array(vals), np.array(wts)
            if method == "average":
                out[i, j] = (vals * wts[:, None]).sum(0) / wts.sum()
            elif method == "sum":
                out[i, j] = (vals * wts[:, None]).sum(0)
            elif method == "rms":
                out[i, j] = np.sqrt((vals ** 2 * wts[:, None]).sum(0) / wts.sum())
            elif method == "min":
                out[i, j] = vals.min(0)
            elif method == "max":
                out[i, j] = vals.max(0)
            elif method in ("med", "q1", "q3"):
                q = {"med": .5, "q1": .25, "q3": .75}[method]
                s = np.sort(vals, axis=0)
                out[i, j] = s[max(int(np.ceil(q * len(vals) - 1)), 0)]
            elif method == "mode":
                for c in range(vals.shape[1]):
                    u, cn = np.unique(vals[:, c], return_counts=True)
                    out[i, j, c] = u[np.argmax(cn)]
    return out


def test_resample_area_matches_reference_formula():
    from gdal_ray.functions.kernels import AREA_METHODS, resample_area

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    for method in AREA_METHODS:
        for ow, oh in ((7, 5), (5, 4), (4, 3), (14, 10)):
            got = resample_area(img, ow, oh, method)
            want = _brute_area(img, ow, oh, method)
            if method == "sum":
                assert np.allclose(got, want, rtol=1e-12), method
            else:
                wantu = np.clip(np.floor(want + 0.5), 0, 255).astype(np.uint8)
                integral = (14 % ow == 0) and (10 % oh == 0)
                if integral or method in ("min", "max", "med", "q1", "q3", "mode"):
                    # integer-exact aggregates: bit parity guaranteed
                    assert np.array_equal(got, wantu), (method, ow, oh)
                else:
                    # fractional weights: summation-order ulp can flip
                    # a value sitting exactly on the .5 boundary
                    assert np.abs(got.astype(int) - wantu.astype(int)).max() <= 1


def test_resize_dispatches_area_methods():
    from gdal_ray.functions.kernels import resize

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    out = resize(img, 4, 4, "average")
    assert out.shape == (4, 4, 3)


def test_calc_expression_compiler():
    from gdal_ray.functions.exprcalc import CalcExpr, CalcParseError

    a = np.arange(12.0).reshape(3, 4)
    b = a[::-1].copy()
    c = a * 2
    assert np.allclose(CalcExpr("(A + 2*B + C) / 4")(a, b, c),
                       (a + 2 * b + c) / 4)
    assert np.allclose(
        CalcExpr("clip(sqrt(A)*10 - B % 3, 0, 255)")(a, b),
        np.clip(np.sqrt(a) * 10 - np.fmod(b, 3), 0, 255))
    assert np.allclose(CalcExpr("-A ** 2 + max(A, B)")(a, b),
                       -(a ** 2) + np.maximum(a, b))
    assert CalcExpr("2 ** 3 ** 2")() == 512.0  # right-assoc
    assert CalcExpr("2 ** -2")() == 0.25
    for bad in ("A +", "foo(A)", "min(A)", "A B"):
        try:
            CalcExpr(bad)
            raise AssertionError(bad)
        except CalcParseError:
            pass
