"""PDS3 labelled rasters (sources.pds): ODL label anchors, record
pointer forms, sample-type matrix, BAND_SEQUENTIAL bands, registry
dispatch, loud detached-label guard.

Reference behavior: frmts/pds/pdsdataset.cpp.
"""

import numpy as np
import pytest

from gdal_ray.sources.pds import read_pds, write_pds


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16,
                                   np.int32, np.float32, np.float64])
def test_pds_dtypes_roundtrip(tmp_path, dtype):
    rng = np.random.default_rng(2)
    img = rng.integers(1, 100, (2, 6, 7)).astype(dtype)
    p = str(tmp_path / f"p_{np.dtype(dtype).name}.img")
    write_pds(p, img)
    m = read_pds(p)
    np.testing.assert_array_equal(m["img"], img)


def test_pds_label_anchors_and_pointer_forms(tmp_path):
    img = np.arange(20, dtype=np.uint8).reshape(4, 5)
    p = str(tmp_path / "a.img")
    write_pds(p, img, record_bytes=256, target="MARS")
    raw = open(p, "rb").read()
    txt = raw[:512].decode()
    assert txt.startswith("PDS_VERSION_ID = PDS3\r\n")
    assert "RECORD_BYTES = 256" in txt
    assert 'TARGET_NAME = "MARS"' in txt
    assert "SAMPLE_TYPE = UNSIGNED_INTEGER" in txt
    assert "OBJECT = IMAGE" in txt and "END_OBJECT = IMAGE" in txt
    rec = int([ln for ln in txt.splitlines()
               if ln.startswith("^IMAGE")][0].split("=")[1])
    assert raw[(rec - 1) * 256:(rec - 1) * 256 + 20] == img.tobytes()
    # byte-form pointer reads identically (label re-padded so the
    # data offset is unchanged)
    data_off = (rec - 1) * 256
    label = raw[:data_off].decode().rstrip().replace(
        f"^IMAGE = {rec}", f"^IMAGE = {data_off + 1} <BYTES>")
    assert len(label) <= data_off
    p2 = str(tmp_path / "b.img")
    open(p2, "wb").write(label.ljust(data_off).encode()
                         + raw[data_off:])
    np.testing.assert_array_equal(read_pds(p2)["img"][0], img)
    # MSB anchor for int16: big-endian on disk
    p3 = str(tmp_path / "c.img")
    write_pds(p3, np.array([[256]], np.int16), record_bytes=256)
    raw3 = open(p3, "rb").read()
    off = raw3.index(b"\x01\x00")
    assert raw3[off:off + 2] == b"\x01\x00"   # 256 as MSB


def test_pds_guards_and_registry(tmp_path):
    from gdal_ray.sources.registry import identify, open_raster

    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    p = str(tmp_path / "r.img")
    write_pds(p, img)
    assert identify(p) == "pds"
    np.testing.assert_array_equal(open_raster(p)["img"][0], img)
    raw = open(p, "rb").read()
    detached = raw.replace(b"^IMAGE = ", b'^IMAGE = "EXT.IMG" /*', 1)
    p2 = str(tmp_path / "d.img")
    open(p2, "wb").write(detached)
    with pytest.raises(ValueError, match="detached"):
        read_pds(p2)


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.uint16,
                                   np.float32, np.float64])
def test_isis2_dtypes_roundtrip(tmp_path, dtype):
    from gdal_ray.sources.pds import read_isis2, write_isis2

    rng = np.random.default_rng(7)
    img = rng.integers(1, 120, (2, 4, 5)).astype(dtype)
    p = str(tmp_path / f"c_{np.dtype(dtype).name}.cub")
    write_isis2(p, img)
    np.testing.assert_array_equal(read_isis2(p)["img"], img)


def test_isis2_label_scaling_and_registry(tmp_path):
    from gdal_ray.sources.pds import read_isis2, write_isis2
    from gdal_ray.sources.registry import identify, open_raster

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 1000, (1, 3, 4)).astype(np.int16)
    p = str(tmp_path / "s.cub")
    write_isis2(p, raw, core_base=10.0, core_multiplier=0.5)
    txt = open(p, "rb").read(512).decode()
    assert txt.startswith("CCSD3ZF")
    assert "OBJECT = QUBE" in txt
    assert "AXIS_NAME = (SAMPLE,LINE,BAND)" in txt
    assert "CORE_ITEMS = (4,3,1)" in txt
    assert "SUFFIX_ITEMS = (0,0,0)" in txt
    m = read_isis2(p)
    np.testing.assert_allclose(m["img"], 10.0 + 0.5 * raw)
    np.testing.assert_array_equal(m["raw"], raw)
    assert identify(p) == "isis2"
    assert open_raster(p)["driver"] == "isis2"
    # suffix side planes rejected loudly
    bad = open(p, "rb").read().replace(b"SUFFIX_ITEMS = (0,0,0)",
                                       b"SUFFIX_ITEMS = (1,0,0)")
    p2 = str(tmp_path / "b.cub")
    open(p2, "wb").write(bad)
    with pytest.raises(ValueError, match="SUFFIX_ITEMS"):
        read_isis2(p2)
