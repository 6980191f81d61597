"""HDF5 source/sink (sources.hdf5): byte anchors restating the HDF5
File Format Specification directly against raw file bytes (superblock
v0, TREE/SNOD/HEAP structures, v1 object headers, datatype message
encodings), round trips across the dtype matrix, the declared
unsupported guards, and the distributed mdim reader.

Reference behavior: frmts/hdf5 (libhdf5-linked); nothing is shared
with it — the layout here comes from the published spec.
"""

import struct

import numpy as np
import pytest

from gdal_ray.sources.hdf5 import (
    hdf5_info,
    read_hdf5,
    read_hdf5_mdim,
    write_hdf5,
)


def test_superblock_byte_anchors(tmp_path):
    """Signature, version fields, offset sizes, EOF address, root
    symbol-table entry layout — straight off the spec."""
    p = str(tmp_path / "a.h5")
    write_hdf5(p, {"x": np.arange(10, dtype=np.int64)})
    buf = open(p, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 0                           # superblock version
    assert buf[13] == 8 and buf[14] == 8         # offset/length sizes
    leaf_k, int_k = struct.unpack("<HH", buf[16:20])
    assert leaf_k > 0 and int_k == 16
    base, _fs, eof, _drv = struct.unpack("<QQQQ", buf[24:56])
    assert base == 0
    assert eof == len(buf)                       # EOF address = size
    # root symbol-table entry: header address + cached btree/heap
    root_hdr = struct.unpack("<Q", buf[64:72])[0]
    cache_type = struct.unpack("<I", buf[72:76])[0]
    assert cache_type == 1
    btree, heap = struct.unpack("<QQ", buf[80:96])
    assert buf[btree:btree + 4] == b"TREE"
    assert buf[heap:heap + 4] == b"HEAP"
    # root object header v1 with ONE symbol table message (0x0011)
    ver, _r, nmsg = struct.unpack("<BBH", buf[root_hdr:root_hdr + 4])
    assert ver == 1 and nmsg == 1
    mtype = struct.unpack("<H", buf[root_hdr + 16:root_hdr + 18])[0]
    assert mtype == 0x0011
    bt2, hp2 = struct.unpack("<QQ", buf[root_hdr + 24:root_hdr + 40])
    assert (bt2, hp2) == (btree, heap)
    # SNOD child of the btree
    snod = struct.unpack("<Q", buf[btree + 32:btree + 40])[0]
    assert buf[snod:snod + 4] == b"SNOD"
    assert struct.unpack("<H", buf[snod + 6:snod + 8])[0] == 1


def test_datatype_message_anchors(tmp_path):
    """float64 datatype message: class 1 version 1, norm bits 0x20,
    sign bit 63, IEEE exponent/mantissa split, bias 1023."""
    p = str(tmp_path / "d.h5")
    write_hdf5(p, {"f": np.zeros(3), "i": np.zeros(3, np.int16)})
    buf = open(p, "rb").read()
    # find the float64 datatype message body
    body = bytes([0x11, 0x20, 63, 0]) + struct.pack("<I", 8) \
        + struct.pack("<HHBBBBI", 0, 64, 52, 11, 0, 52, 1023)
    assert body in buf
    # int16 signed LE: class 0, sign flag 0x08, precision 16
    body_i = bytes([0x10, 0x08, 0, 0]) + struct.pack("<I", 2) \
        + struct.pack("<HH", 0, 16)
    assert body_i in buf


def test_roundtrip_dtype_matrix(tmp_path):
    p = str(tmp_path / "m.h5")
    rng = np.random.default_rng(9)
    ds = {}
    for dt in ("int8", "int16", "int32", "int64",
               "uint8", "uint16", "uint32", "uint64"):
        info = np.iinfo(dt)
        ds[dt] = rng.integers(info.min, info.max, (4, 5), dtype=dt)
    ds["float32"] = rng.normal(size=(3, 2, 2)).astype(np.float32)
    ds["float64"] = rng.normal(size=(7,))
    ds["scalar_rank1"] = np.array([42.5])
    write_hdf5(p, ds)
    names = sorted(hdf5_info(p)["datasets"])
    assert names == sorted(ds)
    for k, v in ds.items():
        got = read_hdf5(p, k)
        assert got.dtype == v.dtype and np.array_equal(got, v), k


def test_symbols_sorted_and_heap_names(tmp_path):
    """Links live in the local heap NUL-terminated, SNOD entries in
    name order (the B-tree invariant)."""
    p = str(tmp_path / "s.h5")
    write_hdf5(p, {"zeta": np.zeros(1), "alpha": np.zeros(1),
                   "mid": np.zeros(1)})
    buf = open(p, "rb").read()
    assert buf.index(b"alpha\x00") < buf.index(b"mid\x00") \
        < buf.index(b"zeta\x00")
    info = hdf5_info(p)["datasets"]
    assert sorted(info) == ["alpha", "mid", "zeta"]


def test_guards(tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        write_hdf5(str(tmp_path / "x.h5"),
                   {"c": np.array(["a"], dtype=object)})
    with pytest.raises(ValueError, match="little-endian"):
        write_hdf5(str(tmp_path / "x.h5"),
                   {"b": np.zeros(2, dtype=">f8")})
    with pytest.raises(ValueError, match=">= 1 dataset"):
        write_hdf5(str(tmp_path / "x.h5"), {})
    p = str(tmp_path / "junk.h5")
    open(p, "wb").write(b"NOTHDF5!" + b"\x00" * 96)
    with pytest.raises(ValueError, match="signature"):
        hdf5_info(p)
    p2 = str(tmp_path / "ok.h5")
    write_hdf5(p2, {"x": np.zeros(4)})
    with pytest.raises(ValueError, match="no dataset"):
        read_hdf5(p2, "missing")


def test_mdim_reader(tmp_path, ray_session):
    """Distributed slab reads reassemble the dataset bit-exactly and
    compose with the mdim step algebra from JSON."""
    import json

    from gdal_ray.pipelines.spec import run_pipeline

    p = str(tmp_path / "r.h5")
    rng = np.random.default_rng(4)
    v = rng.normal(size=(12, 6, 5))
    write_hdf5(p, {"cube": v})
    ds, spec = read_hdf5_mdim(p, "cube", slab=5, parallelism=4)
    assert spec.shape == (12, 6, 5) and spec.chunks == (5, 6, 5)
    chunks = sorted(ds.take_all(), key=lambda c: c["chunk"][0])
    rebuilt = np.concatenate(
        [np.frombuffer(c["data"], np.float64).reshape(tuple(c["shape"]))
         for c in chunks])
    np.testing.assert_array_equal(rebuilt, v)

    out = run_pipeline(json.dumps([
        {"step": "mdim_read_hdf5", "path": p, "name": "cube", "slab": 4},
        {"step": "mdim_slice", "ranges": [[0, 8], [0, 6], [1, 4]]},
        {"step": "mdim_checksums", "tag": "h5"},
    ])).to_pandas()
    assert len(out) == 2 and (out["op"] == "h5").all()


def test_chunked_deflate_roundtrip(tmp_path):
    """Chunked layout (v1 node-type-1 B-tree) with and without the
    deflate filter; ragged edges stored as full zero-padded chunks and
    cropped on read."""
    p = str(tmp_path / "c.h5")
    rng = np.random.default_rng(8)
    a = rng.normal(size=(37, 23))
    b = rng.integers(0, 255, (9, 11, 5)).astype(np.int16)
    write_hdf5(p, {"a": a, "b": b},
               chunks={"a": (16, 8), "b": (4, 4, 4)},
               compress={"a": 6})
    info = hdf5_info(p)["datasets"]
    assert info["a"]["layout"] == "chunked"
    assert info["a"]["chunk"] == (16, 8)
    assert info["a"]["filters"] == [1]
    assert "filters" not in info["b"]
    np.testing.assert_array_equal(read_hdf5(p, "a"), a)
    np.testing.assert_array_equal(read_hdf5(p, "b"), b)
    # deflate actually shrinks a compressible dataset
    p2 = str(tmp_path / "z.h5")
    z = np.zeros((64, 64))
    write_hdf5(p2, {"z": z}, chunks={"z": (32, 32)},
               compress={"z": 6})
    import os
    assert os.path.getsize(p2) < z.nbytes // 4
    np.testing.assert_array_equal(read_hdf5(p2, "z"), z)


def test_chunked_guards(tmp_path):
    with pytest.raises(ValueError, match="requires chunks"):
        write_hdf5(str(tmp_path / "x.h5"), {"a": np.zeros((4, 4))},
                   compress={"a": 6})
    with pytest.raises(ValueError, match="rank"):
        write_hdf5(str(tmp_path / "x.h5"), {"a": np.zeros((4, 4))},
                   chunks={"a": (2,)})
    with pytest.raises(ValueError, match="> 64"):
        write_hdf5(str(tmp_path / "x.h5"), {"a": np.zeros((100, 100))},
                   chunks={"a": (2, 2)})


def test_chunked_mdim_reader(tmp_path, ray_session):
    """The file's own chunks become the mdim grain: distributed
    ranged reads + inflate reassemble bit-exactly."""
    p = str(tmp_path / "cm.h5")
    rng = np.random.default_rng(10)
    v = rng.normal(size=(20, 14))
    write_hdf5(p, {"v": v}, chunks={"v": (8, 8)}, compress={"v": 4})
    ds, spec = read_hdf5_mdim(p, "v", parallelism=3)
    assert spec.chunks == (8, 8)
    out = np.zeros_like(v)
    for c in ds.take_all():
        i, j = c["chunk"]
        blk = np.frombuffer(c["data"], np.float64).reshape(
            tuple(c["shape"]))
        out[i * 8:i * 8 + blk.shape[0], j * 8:j * 8 + blk.shape[1]] = blk
    np.testing.assert_array_equal(out, v)


def test_attributes(tmp_path):
    """Attribute messages (0x000C v1): numeric scalars, 1-D arrays and
    ASCII strings on datasets and on the root group (the CF-convention
    metadata shape)."""
    p = str(tmp_path / "attr.h5")
    v = np.arange(12.0).reshape(3, 4)
    write_hdf5(
        p, {"temp": v},
        attrs={"temp": {"units": "kelvin",
                        "valid_range": np.array([180.0, 330.0]),
                        "scale_factor": np.float64(0.5),
                        "count": np.int32(7)},
               "/": {"Conventions": "CF-1.8", "version": np.int64(3)}})
    info = hdf5_info(p)
    a = info["datasets"]["temp"]["attrs"]
    assert a["units"] == "kelvin"
    np.testing.assert_array_equal(a["valid_range"], [180.0, 330.0])
    assert a["scale_factor"] == 0.5 and a["scale_factor"].dtype == np.float64
    assert np.ndim(a["scale_factor"]) == 0       # scalar stays scalar
    assert a["count"] == 7 and a["count"].dtype == np.int32
    assert info["attrs"] == {"Conventions": "CF-1.8", "version": 3}
    np.testing.assert_array_equal(read_hdf5(p, "temp"), v)
    with pytest.raises(ValueError, match="no such dataset"):
        write_hdf5(p, {"x": np.zeros(2)}, attrs={"y": {"a": 1.0}})


def test_nested_groups(tmp_path, ray_session):
    """"a/b/dset" paths create real group machinery (per-group B-tree
    + heap + SNOD); the reader recurses, group attributes surface, and
    the mdim reader addresses datasets by full path."""
    p = str(tmp_path / "g.h5")
    rng = np.random.default_rng(3)
    ds = {"top": rng.normal(size=(4, 4)),
          "g1/a": rng.integers(0, 100, (5,)).astype(np.int32),
          "g1/b": rng.normal(size=(6, 6)),
          "g1/sub/deep": rng.normal(size=(2, 6)),
          "g2/x": rng.normal(size=(7,))}
    write_hdf5(p, ds, chunks={"g1/b": (4, 4)}, compress={"g1/b": 4},
               attrs={"g1": {"role": "measurements"},
                      "/": {"v": np.int64(1)},
                      "g1/a": {"u": "m"}})
    info = hdf5_info(p)
    assert sorted(info["datasets"]) == sorted(ds)
    assert info["group_attrs"] == {"g1": {"role": "measurements"}}
    assert info["attrs"]["v"] == 1
    assert info["datasets"]["g1/a"]["attrs"]["u"] == "m"
    for k, v in ds.items():
        np.testing.assert_array_equal(read_hdf5(p, k), v)
    rds, spec = read_hdf5_mdim(p, "g1/sub/deep", parallelism=2)
    chunks_out = sorted(rds.take_all(), key=lambda c: c["chunk"][0])
    rebuilt = np.concatenate(
        [np.frombuffer(c["data"], np.float64).reshape(tuple(c["shape"]))
         for c in chunks_out])
    np.testing.assert_array_equal(rebuilt, ds["g1/sub/deep"])
    with pytest.raises(ValueError, match="bad dataset path"):
        write_hdf5(str(tmp_path / "x.h5"), {"a//b": np.zeros(2)})


def test_shuffle_filter(tmp_path):
    """Shuffle (id 2) + deflate: smaller than deflate alone on float
    data, pipeline order [2, 1] on disk, exact round trip; shuffle
    without compress rejected."""
    import os

    rng = np.random.default_rng(12)
    v = (rng.normal(size=(64, 64)) * 4).round() / 4
    p1 = str(tmp_path / "d.h5")
    p2 = str(tmp_path / "sd.h5")
    write_hdf5(p1, {"v": v}, chunks={"v": (32, 32)}, compress={"v": 6})
    write_hdf5(p2, {"v": v}, chunks={"v": (32, 32)}, compress={"v": 6},
               shuffle={"v"})
    assert os.path.getsize(p2) < os.path.getsize(p1)
    assert hdf5_info(p2)["datasets"]["v"]["filters"] == [2, 1]
    np.testing.assert_array_equal(read_hdf5(p2, "v"), v)
    rds, _spec = read_hdf5_mdim(p2, "v", parallelism=2)
    total = sum(np.frombuffer(c["data"], np.float64).sum()
                for c in rds.take_all())
    assert total == v.sum()
    with pytest.raises(ValueError, match="requires compress"):
        write_hdf5(str(tmp_path / "x.h5"), {"v": v},
                   chunks={"v": (32, 32)}, shuffle={"v"})


# ------------------------- new-style (1.8+/libver='latest') groups


def test_lookup3_published_vector():
    """Jenkins lookup3 hashlittle self-test vector (lookup3.c):
    'Four score and seven years ago' with init 0 -> 0x17770551."""
    from gdal_ray.sources.hdf5 import _lookup3

    assert _lookup3(b"Four score and seven years ago") == 0x17770551
    assert _lookup3(b"") == 0xDEADBEEF


def test_latest_superblock_and_ohdr_anchors(tmp_path):
    """Superblock v3 byte anchors (version at offset 8, root OHDR
    address at 36, lookup3 checksum at 44) and the OHDR signature at
    the root address."""
    from gdal_ray.sources.hdf5 import _lookup3, write_hdf5_latest

    p = str(tmp_path / "a.h5")
    write_hdf5_latest(p, {"x": np.arange(12.0).reshape(3, 4)})
    buf = open(p, "rb").read()
    assert buf[:8] == b"\x89HDF\r\n\x1a\n"
    assert buf[8] == 3                       # superblock version
    assert buf[9] == 8 and buf[10] == 8      # offset/length sizes
    (root,) = struct.unpack("<Q", buf[36:44])
    (ck,) = struct.unpack("<I", buf[44:48])
    assert ck == _lookup3(buf[:44])
    assert buf[root:root + 4] == b"OHDR"
    assert buf[root + 4] == 2                # header version


def test_latest_compact_and_nested_roundtrip(tmp_path):
    from gdal_ray.sources.hdf5 import (hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(42)
    ds = {
        "top": rng.normal(size=(6, 7)),
        "g/mid": rng.integers(0, 99, (4, 4)).astype("<i8"),
        "g/sub/deep": rng.normal(size=(5,)).astype("<f4"),
    }
    p = str(tmp_path / "c.h5")
    write_hdf5_latest(p, ds)
    info = hdf5_info(p)
    assert set(info["datasets"]) == set(ds)
    for k, v in ds.items():
        assert np.array_equal(read_hdf5(p, k), v)


def test_latest_dense_group_fractal_heap_btree(tmp_path):
    """> max_compact children switch to DENSE storage: FRHP + FHDB
    fractal heap and BTHD/BTLF v2 B-tree appear on disk (signature
    anchors), B-tree records are hash-sorted, and every dataset reads
    back bit-exact through the heap-id path."""
    from gdal_ray.sources.hdf5 import (_lookup3, hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(7)
    ds = {f"d{i:02d}": rng.normal(size=(3, 5)) + i for i in range(12)}
    p = str(tmp_path / "dense.h5")
    write_hdf5_latest(p, ds)
    buf = open(p, "rb").read()
    for sig in (b"FRHP", b"FHDB", b"BTHD", b"BTLF"):
        assert sig in buf, sig
    # BTHD anchors: type 5 (link-name-hash), record size 11, depth 0
    b = buf.index(b"BTHD")
    assert buf[b + 4] == 0 and buf[b + 5] == 5
    assert struct.unpack("<H", buf[b + 10:b + 12])[0] == 11
    assert struct.unpack("<H", buf[b + 12:b + 14])[0] == 0
    nrec = struct.unpack("<H", buf[b + 24:b + 26])[0]
    assert nrec == 12
    # leaf records sorted by the lookup3 name hash
    lf = buf.index(b"BTLF")
    hashes = [struct.unpack("<I", buf[lf + 6 + 11 * k:lf + 10 + 11 * k])[0]
              for k in range(nrec)]
    assert hashes == sorted(hashes)
    assert set(hashes) == {_lookup3(n.encode()) for n in ds}
    info = hdf5_info(p)
    assert set(info["datasets"]) == set(ds)
    for k, v in ds.items():
        assert np.array_equal(read_hdf5(p, k), v)


def test_latest_chunked_deflate_under_new_groups(tmp_path):
    from gdal_ray.sources.hdf5 import read_hdf5, write_hdf5_latest

    rng = np.random.default_rng(3)
    a = rng.normal(size=(40, 50)).astype("<f4")
    p = str(tmp_path / "ck.h5")
    write_hdf5_latest(p, {"grp/chunky": a},
                      chunks={"grp/chunky": (16, 16)},
                      compress={"grp/chunky": 6})
    assert np.array_equal(read_hdf5(p, "grp/chunky"), a)


def test_latest_ohdr_checksum_corruption_detected(tmp_path):
    from gdal_ray.sources.hdf5 import hdf5_info, write_hdf5_latest

    p = str(tmp_path / "bad.h5")
    write_hdf5_latest(p, {"x": np.arange(6.0)})
    buf = bytearray(open(p, "rb").read())
    root = struct.unpack("<Q", bytes(buf[36:44]))[0]
    buf[root + 11] ^= 0xFF                   # flip a message byte
    open(p, "wb").write(bytes(buf))
    with pytest.raises(ValueError, match="checksum"):
        hdf5_info(p)


def test_fixed_array_chunk_index(tmp_path):
    """HDF5 1.10 fixed-array chunk index (v4 data layout, index type
    3): FAHD/FADB byte anchors, checksums verified, filtered (client
    1: address + stored size + mask) and unfiltered (client 0)
    elements, bit-exact reads through both read_hdf5 and the
    distributed mdim reader."""
    from gdal_ray.sources.hdf5 import (_lookup3, hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(42)
    a = rng.normal(size=(40, 50)).astype("<f4")
    b = rng.integers(0, 9999, (30, 20)).astype("<i8")
    p = str(tmp_path / "fa.h5")
    write_hdf5_latest(p, {"g/x": a, "g/y": b},
                      chunks={"g/x": (16, 16), "g/y": (8, 8)},
                      compress={"g/x": 6},
                      fixed_array={"g/x", "g/y"})
    info = hdf5_info(p)["datasets"]
    assert "fa_addr" in info["g/x"] and "fa_addr" in info["g/y"]
    buf = open(p, "rb").read()
    fa = info["g/x"]["fa_addr"]
    assert buf[fa:fa + 4] == b"FAHD"
    assert buf[fa + 4] == 0                   # version
    assert buf[fa + 5] == 1                   # client: filtered
    assert buf[fa + 6] == 16                  # entry size
    nelem = struct.unpack("<Q", buf[fa + 8:fa + 16])[0]
    assert nelem == 12                        # ceil(40/16)*ceil(50/16)
    assert struct.unpack("<I", buf[fa + 24:fa + 28])[0] == \
        _lookup3(buf[fa:fa + 24])
    db = struct.unpack("<Q", buf[fa + 16:fa + 24])[0]
    assert buf[db:db + 4] == b"FADB"
    fb = info["g/y"]["fa_addr"]
    assert buf[fb + 5] == 0 and buf[fb + 6] == 8  # unfiltered client
    assert np.array_equal(read_hdf5(p, "g/x"), a)
    assert np.array_equal(read_hdf5(p, "g/y"), b)


def test_fixed_array_mdim_distributed(tmp_path, ray_session):
    from gdal_ray.sources.hdf5 import read_hdf5_mdim, write_hdf5_latest

    rng = np.random.default_rng(5)
    a = rng.normal(size=(24, 32)).astype("<f8")
    p = str(tmp_path / "famd.h5")
    write_hdf5_latest(p, {"x": a}, chunks={"x": (8, 16)},
                      compress={"x": 6}, fixed_array={"x"})
    ds, spec = read_hdf5_mdim(p, "x", parallelism=3)
    rows = ds.take_all()
    tot = sum(np.frombuffer(bytes(r["data"]), "<f8").sum()
              for r in rows)
    assert abs(tot - a.sum()) < 1e-9


def test_extensible_array_chunk_index(tmp_path):
    """HDF5 1.10 extensible-array chunk index (v4 data layout, index
    type 4 — the index the library selects for ONE unlimited
    dimension): EAHD/EAIB/EADB byte anchors per the published spec
    schedule (4 direct index-block elements, then data blocks of
    16/32/32/... elements while 2^(s//2) < sblk_min_data_ptrs),
    checksums verified, filtered and unfiltered clients, unlimited
    maxshape recorded in the dataspace."""
    from gdal_ray.sources.hdf5 import (_lookup3, hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(9)
    a = rng.integers(-500, 500, 85).astype("<i4")   # 11 chunks of 8
    b = rng.normal(size=420).astype("<f8")          # 60 chunks of 7
    p = str(tmp_path / "ea.h5")
    write_hdf5_latest(p, {"a": a, "b": b},
                      chunks={"a": (8,), "b": (7,)},
                      compress={"a": 6},
                      ext_array={"a", "b"},
                      maxshape={"a": (None,), "b": (None,)})
    info = hdf5_info(p)["datasets"]
    assert "ea_addr" in info["a"] and "ea_addr" in info["b"]
    buf = open(p, "rb").read()
    ea = info["a"]["ea_addr"]
    assert buf[ea:ea + 4] == b"EAHD"
    assert buf[ea + 4] == 0                    # version
    assert buf[ea + 5] == 1                    # client: filtered
    assert buf[ea + 6] == 16                   # element size
    assert tuple(buf[ea + 7:ea + 12]) == (32, 4, 16, 4, 10)  # params
    assert struct.unpack("<I", buf[ea + 68:ea + 72])[0] == \
        _lookup3(buf[ea:ea + 68])
    ib = struct.unpack("<Q", buf[ea + 60:ea + 68])[0]
    assert buf[ib:ib + 4] == b"EAIB"
    # first data block: 11 chunks -> 4 direct + one 16-elem EADB
    db = struct.unpack("<Q", buf[ib + 14 + 4 * 16:ib + 14 + 4 * 16 + 8])[0]
    assert buf[db:db + 4] == b"EADB"
    assert int.from_bytes(buf[db + 14:db + 18], "little") == 4  # offset
    eb = info["b"]["ea_addr"]
    assert buf[eb + 5] == 0 and buf[eb + 6] == 8   # unfiltered client
    assert np.array_equal(read_hdf5(p, "a"), a)
    assert np.array_equal(read_hdf5(p, "b"), b)


def test_btree2_chunk_index(tmp_path):
    """v2 B-tree chunk index (v4 data layout, index type 5 — the
    index for >= 2 unlimited dimensions): BTHD record-type-10 anchor,
    scaled-offset records, bit-exact read; filtered btree2 requests
    are rejected loudly (type-11 records unsupported)."""
    import pytest as _pytest

    from gdal_ray.sources.hdf5 import (hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(3)
    m = rng.normal(size=(20, 30)).astype("<f8")
    p = str(tmp_path / "bt2.h5")
    write_hdf5_latest(p, {"m": m}, chunks={"m": (8, 8)},
                      btree2={"m"}, maxshape={"m": (None, None)})
    info = hdf5_info(p)["datasets"]["m"]
    assert "bt2_addr" in info
    buf = open(p, "rb").read()
    bt = info["bt2_addr"]
    assert buf[bt:bt + 4] == b"BTHD"
    assert buf[bt + 5] == 10                   # chunk record type
    rec_size = struct.unpack("<H", buf[bt + 10:bt + 12])[0]
    assert rec_size == 8 + 8 * 2
    leaf = struct.unpack("<Q", buf[bt + 16:bt + 24])[0]
    assert buf[leaf:leaf + 4] == b"BTLF"
    nrec = struct.unpack("<H", buf[bt + 24:bt + 26])[0]
    assert nrec == 12                          # ceil(20/8)*ceil(30/8)
    # second record's scaled offsets = (0, 1) -> chunk (0, 8)
    r1 = leaf + 6 + rec_size
    sx, sy = struct.unpack("<QQ", buf[r1 + 8:r1 + 24])
    assert (sx, sy) == (0, 1)
    assert np.array_equal(read_hdf5(p, "m"), m)
    with _pytest.raises(ValueError, match="type 11"):
        write_hdf5_latest(str(tmp_path / "x.h5"), {"m": m},
                          chunks={"m": (8, 8)}, btree2={"m"},
                          compress={"m": 6})


def test_ea_bt2_mdim_distributed(tmp_path, ray_session):
    """Both new chunk indexes drive the distributed mdim reader at
    the file's own chunk grain."""
    from gdal_ray.sources.hdf5 import read_hdf5_mdim, write_hdf5_latest

    rng = np.random.default_rng(11)
    a = rng.normal(size=200).astype("<f8")
    m = rng.normal(size=(24, 32)).astype("<f4")
    p = str(tmp_path / "mix.h5")
    write_hdf5_latest(p, {"a": a, "m": m},
                      chunks={"a": (16,), "m": (8, 16)},
                      ext_array={"a"}, btree2={"m"},
                      maxshape={"a": (None,), "m": (None, None)})
    ds, _ = read_hdf5_mdim(p, "a", parallelism=3)
    tot = sum(np.frombuffer(bytes(r["data"]), "<f8").sum()
              for r in ds.take_all())
    assert abs(tot - a.sum()) < 1e-9
    ds2, _ = read_hdf5_mdim(p, "m", parallelism=3)
    tot2 = sum(np.frombuffer(bytes(r["data"]), "<f4").astype(np.float64).sum()
               for r in ds2.take_all())
    assert abs(tot2 - m.astype(np.float64).sum()) < 1e-4


def test_paged_fixed_array(tmp_path):
    """1.10 PAGED fixed-array data blocks (elements exceed one
    2^page_bits page): page bitmap + header checksum then per-page
    element runs each closed by its own checksum; filtered and
    unfiltered clients; byte anchors on the bitmap and page layout."""
    from gdal_ray.sources.hdf5 import (_lookup3, hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(13)
    a = rng.integers(-9999, 9999, 60 * 7).astype("<i4")  # 60 chunks
    p = str(tmp_path / "pf.h5")
    write_hdf5_latest(p, {"d": a}, chunks={"d": (7,)},
                      fixed_array={"d"}, fa_page_bits=4)
    info = hdf5_info(p)["datasets"]["d"]
    assert info["fa_page_bits"] == 4
    buf = open(p, "rb").read()
    fa = info["fa_addr"]
    assert buf[fa:fa + 4] == b"FAHD" and buf[fa + 7] == 4
    db = struct.unpack("<Q", buf[fa + 16:fa + 24])[0]
    assert buf[db:db + 4] == b"FADB"
    # 60 elements / 16 per page = 4 pages -> 1 bitmap byte 0b1111
    assert buf[db + 14] == 0x0F
    # header checksum right after the bitmap
    assert struct.unpack("<I", buf[db + 15:db + 19])[0] == \
        _lookup3(buf[db:db + 15])
    # first page: 16 addresses then the page checksum
    pg0 = buf[db + 19:db + 19 + 16 * 8]
    assert struct.unpack("<I",
                         buf[db + 19 + 128:db + 19 + 132])[0] == \
        _lookup3(pg0)
    assert np.array_equal(read_hdf5(p, "d"), a)
    # filtered paged
    write_hdf5_latest(p, {"d": a}, chunks={"d": (7,)},
                      fixed_array={"d"}, compress={"d": 6},
                      fa_page_bits=4)
    assert np.array_equal(read_hdf5(p, "d"), a)


def test_extensible_array_secondary_blocks(tmp_path):
    """EA beyond the index block's direct capacity (244 elements with
    the default creation params): secondary blocks (EASB — full
    data-block address slot list, block offsets on FULL-capacity
    lattice) carry the overflow; boundary (244/245), deep (1000,
    spanning multiple super blocks) and filtered cases, plus EASB
    byte anchors."""
    from gdal_ray.sources.hdf5 import (hdf5_info, read_hdf5,
                                       write_hdf5_latest)

    rng = np.random.default_rng(23)
    for nchunks in (244, 245, 400, 1000):
        a = rng.integers(-999, 999, nchunks * 5).astype("<i2")
        p = str(tmp_path / f"e{nchunks}.h5")
        write_hdf5_latest(p, {"d": a}, chunks={"d": (5,)},
                          ext_array={"d"}, maxshape={"d": (None,)})
        assert np.array_equal(read_hdf5(p, "d"), a), nchunks
    # anchors on the 400-chunk file: one EASB with sblk-4 geometry
    p = str(tmp_path / "e400.h5")
    info = hdf5_info(p)["datasets"]["d"]
    buf = open(p, "rb").read()
    ea = info["ea_addr"]
    nsblks = struct.unpack("<Q", buf[ea + 12:ea + 20])[0]
    assert nsblks == 1
    sb = buf.find(b"EASB")
    assert sb > 0
    # block offset = 4 direct + 240 direct-dblk elements = 244
    assert int.from_bytes(buf[sb + 14:sb + 18], "little") == 244
    # sblk 4 holds 4 data blocks of 64 elements; 400-244=156 -> 3 used
    addrs = [struct.unpack("<Q", buf[sb + 18 + 8 * j:
                                     sb + 26 + 8 * j])[0]
             for j in range(4)]
    assert sum(a != 0xFFFFFFFFFFFFFFFF for a in addrs) == 3
    # filtered overflow path
    af = rng.normal(size=300 * 5).astype("<f8")
    p2 = str(tmp_path / "ef.h5")
    write_hdf5_latest(p2, {"d": af}, chunks={"d": (5,)},
                      ext_array={"d"}, compress={"d": 6},
                      maxshape={"d": (None,)})
    assert np.array_equal(read_hdf5(p2, "d"), af)
