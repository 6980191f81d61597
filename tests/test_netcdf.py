"""netCDF classic source/sink (sources/netcdf.py).

Behavior model: frmts/netcdf/ over the multidim model; on-disk layout
per the public CDF-1/CDF-2 classic format spec.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.netcdf import netcdf_info, read_netcdf, write_netcdf
from gdal_ray.stages import mdim as M


def _arr():
    i, j, k = np.meshgrid(np.arange(12), np.arange(20), np.arange(8),
                          indexing="ij")
    return ((i * 37 + j * 11 + k) % 1000).astype(np.int32)


def test_header_layout_and_info(tmp_path):
    path = str(tmp_path / "a.nc")
    a = _arr()
    write_netcdf(path, {"t": (("time", "y", "x"), a)},
                 {"time": 12, "y": 20, "x": 8},
                 attrs={"title": "fixture", "level": 3}, version=2)
    with open(path, "rb") as fh:
        head = fh.read(8)
    assert head[:4] == b"CDF\x02"
    assert struct.unpack(">I", head[4:8])[0] == 0  # numrecs
    info = netcdf_info(path)
    assert info["version"] == 2
    assert info["dims"] == {"time": 12, "y": 20, "x": 8}
    assert info["attrs"] == {"title": "fixture", "level": 3}
    v = info["variables"]["t"]
    assert v["dims"] == ("time", "y", "x") and v["shape"] == (12, 20, 8)
    assert v["dtype"] == "int32"
    # data lands big-endian at begin
    with open(path, "rb") as fh:
        fh.seek(v["begin"])
        first = np.frombuffer(fh.read(8 * 4), ">i4")
    assert first.tolist() == a[0, 0, :].tolist()


def test_cdf1_round_trip(tmp_path):
    path = str(tmp_path / "v1.nc")
    a = np.linspace(-4.0, 4.0, 60).reshape(12, 5).astype(np.float64)
    write_netcdf(path, {"z": (("r", "c"), a)}, {"r": 12, "c": 5},
                 version=1)
    info = netcdf_info(path)
    assert info["version"] == 1
    v = info["variables"]["z"]
    with open(path, "rb") as fh:
        fh.seek(v["begin"])
        back = np.frombuffer(fh.read(a.nbytes), ">f8").reshape(12, 5)
    assert np.array_equal(back, a)


def test_ray_read_slabs_match_source(ray_session, tmp_path):
    path = str(tmp_path / "r.nc")
    a = _arr()
    write_netcdf(path, {"t": (("time", "y", "x"), a)},
                 {"time": 12, "y": 20, "x": 8})
    ds, spec = read_netcdf(path, "t", slab=5)
    assert spec.shape == (12, 20, 8) and spec.chunks == (5, 20, 8)
    rows = ds.to_pandas()
    assert len(rows) == 3  # ceil(12/5)
    rebuilt = np.zeros((12, 20, 8), np.int32)
    for c, s, d in zip(rows["chunk"], rows["shape"], rows["data"]):
        i0 = c[0] * 5
        rebuilt[i0:i0 + s[0]] = np.frombuffer(d, np.int32).reshape(
            tuple(s))
    assert np.array_equal(rebuilt, a)


def test_mdim_ops_over_netcdf(ray_session, tmp_path):
    """mdim reductions over a netCDF read match the same ops over the
    synthetic chunk source."""
    path = str(tmp_path / "m.nc")
    a = _arr()
    write_netcdf(path, {"t": (("time", "y", "x"), a)},
                 {"time": 12, "y": 20, "x": 8})
    nds, nspec = read_netcdf(path, "t", slab=4)
    red, rspec = M.mdim_reduce(nds, nspec, "sum", 0)
    out = M.mdim_chunk_checksums(red, rspec, "nc").to_pandas()
    # independent dense answer
    dense = a.astype(np.int64).sum(axis=0)
    from gdal_ray.functions import checksum

    exp = int(checksum.checksum_band(dense.reshape(1, -1)))
    assert out["cs"].tolist() == [exp]  # one 20x8 chunk after reduce


def test_multi_variable_and_errors(tmp_path):
    path = str(tmp_path / "mv.nc")
    a = np.arange(24, dtype=np.int16).reshape(4, 6)
    b = (np.arange(4) * 0.5).astype(np.float32)
    write_netcdf(path, {"a": (("r", "c"), a), "b": (("r",), b)},
                 {"r": 4, "c": 6})
    info = netcdf_info(path)
    assert set(info["variables"]) == {"a", "b"}
    assert info["variables"]["b"]["dtype"] == "float32"
    v = info["variables"]["b"]
    with open(path, "rb") as fh:
        fh.seek(v["begin"])
        assert np.array_equal(np.frombuffer(fh.read(16), ">f4"), b)
    with pytest.raises(ValueError, match="int64"):
        write_netcdf(str(tmp_path / "bad.nc"),
                     {"x": (("r",), np.arange(3))}, {"r": 3})
    with pytest.raises(ValueError, match="not a classic netCDF"):
        p = str(tmp_path / "junk.nc")
        with open(p, "wb") as fh:
            fh.write(b"HDF\x89" + b"\x00" * 64)
        netcdf_info(p)
