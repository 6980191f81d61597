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


def test_record_dimension_single_var(ray_session, tmp_path):
    """Unlimited dim: length 0 in the dim list, numrecs in the header;
    a single record variable is unpadded (the classic special case)."""
    path = str(tmp_path / "rec1.nc")
    a = np.arange(7 * 3 * 5, dtype=np.int16).reshape(7, 3, 5)
    write_netcdf(path, {"t": (("time", "y", "x"), a)},
                 {"time": 7, "y": 3, "x": 5}, record_dim="time")
    with open(path, "rb") as fh:
        head = fh.read(8)
    assert struct.unpack(">I", head[4:8])[0] == 7  # numrecs
    info = netcdf_info(path)
    assert info["record_dim"] == "time" and info["numrecs"] == 7
    assert info["variables"]["t"]["record"]
    assert info["variables"]["t"]["shape"] == (7, 3, 5)
    assert info["recsize"] == 3 * 5 * 2  # unpadded single-var case
    ds, spec = read_netcdf(path, "t", slab=3)
    rows = ds.to_pandas()
    rebuilt = np.zeros((7, 3, 5), np.int16)
    for c, s, d in zip(rows["chunk"], rows["shape"], rows["data"]):
        rebuilt[c[0] * 3:c[0] * 3 + s[0]] = np.frombuffer(
            d, np.int16).reshape(tuple(s))
    assert np.array_equal(rebuilt, a)


def test_record_dimension_interleaved_vars(ray_session, tmp_path):
    """Two record variables interleave per record, each chunk padded
    to 4; both read back exactly through the strided path."""
    path = str(tmp_path / "rec2.nc")
    a = np.arange(6 * 3, dtype=np.int16).reshape(6, 3)  # 6 B -> pad 8
    b = (np.arange(6 * 2) * 1.5).astype(np.float64).reshape(6, 2)
    write_netcdf(path, {"a": (("time", "p"), a), "b": (("time", "q"), b)},
                 {"time": 6, "p": 3, "q": 2}, record_dim="time")
    info = netcdf_info(path)
    assert info["recsize"] == 8 + 16  # padded int16x3 + float64x2
    assert info["variables"]["a"]["record"]
    assert info["variables"]["b"]["record"]
    # raw layout anchor: record 0 of b follows the padded record 0 of a
    va, vb = info["variables"]["a"], info["variables"]["b"]
    assert vb["begin"] == va["begin"] + 8
    for name, src, dt in (("a", a, np.int16), ("b", b, np.float64)):
        ds, spec = read_netcdf(path, name, slab=4)
        rows = ds.to_pandas()
        rebuilt = np.zeros(src.shape, dt)
        for c, s, d in zip(rows["chunk"], rows["shape"], rows["data"]):
            rebuilt[c[0] * 4:c[0] * 4 + s[0]] = np.frombuffer(
                d, dt).reshape(tuple(s))
        assert np.array_equal(rebuilt, src), name
    # fixed + record vars coexist
    path2 = str(tmp_path / "mix.nc")
    fix = np.arange(4, dtype=np.int32)
    write_netcdf(path2, {"f": (("s",), fix), "r": (("time", "s"),
                 np.arange(8, dtype=np.int32).reshape(2, 4))},
                 {"s": 4, "time": 2}, record_dim="time")
    i2 = netcdf_info(path2)
    assert not i2["variables"]["f"]["record"]
    assert i2["variables"]["r"]["record"]
    dsf, _ = read_netcdf(path2, "f", slab=4)
    assert np.frombuffer(dsf.to_pandas()["data"][0],
                         np.int32).tolist() == [0, 1, 2, 3]
    dsr, _ = read_netcdf(path2, "r", slab=2)
    assert np.frombuffer(dsr.to_pandas()["data"][0],
                         np.int32).tolist() == list(range(8))


def test_record_dim_must_be_first(tmp_path):
    with pytest.raises(ValueError, match="FIRST"):
        write_netcdf(str(tmp_path / "x.nc"),
                     {"v": (("y", "time"),
                            np.zeros((2, 3), np.int32))},
                     {"y": 2, "time": 3}, record_dim="time")
