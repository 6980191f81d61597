"""Zarr v2 source/sink (sources/zarr.py) — the file form of the
stages/mdim.py chunk-row model.

Behavior model: frmts/zarr/ over the GDAL multidim data model
(gcore/gdalmultidim.cpp); on-disk layout per the public Zarr v2 spec.
"""

import json
import os
import zlib

import numpy as np
import pytest

from gdal_ray.sources.zarr import read_zarr, write_zarr, zarr_info
from gdal_ray.stages import mdim as M


# a lambda pickles by value (the test module is not importable on
# Ray workers)
_fill = lambda i, j, k: (i * 37 + j * 11 + k) % 1000  # noqa: E731


def _spec():
    return M.MDSpec((48, 64, 64), (16, 16, 16), "int64")


def _cs_map(ds, spec, tag):
    out = M.mdim_chunk_checksums(ds, spec, tag).to_pandas()
    return dict(zip(out["image_id"], out["cs"]))


def test_write_read_round_trip_checksums(ray_session, tmp_path):
    spec = _spec()
    base = M.mdim_create(spec, _fill, parallelism=8)
    path = str(tmp_path / "a.zarr")
    stats = write_zarr(base, spec, path).to_pandas()
    assert len(stats) == 3 * 4 * 4  # the 48x64x64 / 16^3 chunk grid
    assert stats["written"].all()
    back, spec2 = read_zarr(path)
    assert spec2.shape == spec.shape and spec2.chunks == spec.chunks
    assert spec2.dtype == "int64"
    assert _cs_map(back, spec2, "t") == _cs_map(
        M.mdim_create(spec, _fill, parallelism=8), spec, "t")


def test_zarray_metadata(ray_session, tmp_path):
    spec = M.MDSpec((10, 20), (4, 8), "float64")
    ds = M.mdim_create(spec, lambda i, j: i + 0.5 * j)
    path = str(tmp_path / "m.zarr")
    write_zarr(ds, spec, path, compressor="zlib", level=3,
               attrs={"units": "m"}).to_pandas()
    with open(os.path.join(path, ".zarray")) as fh:
        meta = json.load(fh)
    assert meta["zarr_format"] == 2
    assert meta["shape"] == [10, 20] and meta["chunks"] == [4, 8]
    assert meta["dtype"] == "<f8"
    assert meta["compressor"] == {"id": "zlib", "level": 3}
    assert meta["order"] == "C" and meta["filters"] is None
    assert zarr_info(path)["attrs"] == {"units": "m"}


def test_edge_chunks_padded_on_disk_cropped_on_read(ray_session, tmp_path):
    # 10x20 on 4x8 chunks: edge chunks 2x8 / 4x4 / 2x4 logical, but
    # every file must decompress to the FULL 4x8 chunk (Zarr spec)
    spec = M.MDSpec((10, 20), (4, 8), "int64")
    ds = M.mdim_create(spec, lambda i, j: i * 100 + j)
    path = str(tmp_path / "e.zarr")
    write_zarr(ds, spec, path).to_pandas()
    for name in ("2.0", "2.2", "0.2"):
        with open(os.path.join(path, name), "rb") as fh:
            raw = zlib.decompress(fh.read())
        assert len(raw) == 4 * 8 * 8  # full chunk, padded
    back, spec2 = read_zarr(path)
    rows = back.to_pandas()
    shapes = {tuple(c): tuple(s)
              for c, s in zip(rows["chunk"], rows["shape"])}
    assert shapes[(2, 2)] == (2, 4)  # cropped logical edge chunk
    assert shapes[(0, 0)] == (4, 8)
    # values identical to the synthetic source
    assert _cs_map(back, spec2, "t") == _cs_map(
        M.mdim_create(spec, lambda i, j: i * 100 + j), spec, "t")


def test_raw_compressor_and_missing_chunk_fill(ray_session, tmp_path):
    spec = M.MDSpec((8, 8), (4, 4), "int64")
    ds = M.mdim_create(spec, lambda i, j: i + j)
    path = str(tmp_path / "r.zarr")
    write_zarr(ds, spec, path, compressor=None, fill_value=7).to_pandas()
    os.unlink(os.path.join(path, "1.1"))  # simulate a sparse store
    back, spec2 = read_zarr(path)
    rows = back.to_pandas()
    arr = {tuple(c): np.frombuffer(d, np.int64).reshape(tuple(s))
           for c, s, d in zip(rows["chunk"], rows["shape"], rows["data"])}
    assert (arr[(1, 1)] == 7).all()  # fill_value per spec
    assert arr[(0, 0)][1, 2] == 3


def test_resume_skips_existing(ray_session, tmp_path):
    spec = M.MDSpec((8, 8), (4, 4), "int64")
    ds = M.mdim_create(spec, lambda i, j: i * 10 + j)
    path = str(tmp_path / "s.zarr")
    first = write_zarr(ds, spec, path).to_pandas()
    assert first["written"].all()
    second = write_zarr(
        M.mdim_create(spec, lambda i, j: i * 10 + j), spec, path
    ).to_pandas()
    assert not second["written"].any()


def test_mdim_ops_over_zarr_parity(ray_session, tmp_path):
    """The q31 mdim op suite computed over a Zarr read matches the
    same suite over the synthetic chunk source (identical checksums).
    Includes an unaligned re-chunk read (mdim_slice off the chunk
    grid)."""
    spec = _spec()
    path = str(tmp_path / "p.zarr")
    write_zarr(M.mdim_create(spec, _fill, parallelism=8), spec,
               path).to_pandas()

    for tag, build in [
        ("transpose", lambda ds, sp: M.mdim_transpose(ds, sp, (2, 0, 1))),
        ("slice", lambda ds, sp: M.mdim_slice(
            ds, sp, [(8, 40), (16, 48), (4, 60)])),  # unaligned re-chunk
        ("calc", lambda ds, sp: M.mdim_calc(ds, sp, lambda a: a * 3 + 1)),
        ("sum0", lambda ds, sp: M.mdim_reduce(ds, sp, "sum", 0)),
        ("mean2", lambda ds, sp: M.mdim_reduce(ds, sp, "mean", 2)),
        ("resample", lambda ds, sp: M.mdim_resample2x(ds, sp, (1, 2))),
    ]:
        zds, zspec = read_zarr(path)
        a, a_spec = build(zds, zspec)
        b, b_spec = build(M.mdim_create(spec, _fill, parallelism=8), spec)
        assert a_spec.shape == b_spec.shape, tag
        assert _cs_map(a, a_spec, tag) == _cs_map(b, b_spec, tag), tag


def test_unsupported_store_rejected(tmp_path):
    p = str(tmp_path / "bad.zarr")
    os.makedirs(p)
    with open(os.path.join(p, ".zarray"), "w") as fh:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [2],
                   "dtype": "<i8", "order": "C", "filters": None,
                   "fill_value": 0,
                   "compressor": {"id": "blosc"}}, fh)
    with pytest.raises(ValueError, match="compressor"):
        zarr_info(p)
    with open(os.path.join(p, ".zarray"), "w") as fh:
        json.dump({"zarr_format": 2, "shape": [4], "chunks": [2],
                   "dtype": "<i8", "order": "F", "filters": None,
                   "fill_value": 0, "compressor": None}, fh)
    with pytest.raises(ValueError, match="C-order"):
        zarr_info(p)


# ----------------------------------------------------------- Zarr v3


def _arr_ds(a, chunks):
    from gdal_ray.stages.mdim import MDSpec, mdim_create

    spec = MDSpec(a.shape, chunks, str(a.dtype))
    idx = lambda *I: a[tuple(i.astype(int) for i in I)]  # noqa: E731
    return mdim_create(spec, idx), spec


def _reassemble(rows, spec, dtype):
    out = np.zeros(spec.shape, dtype)
    for r in rows:
        idx = tuple(r["chunk"])
        sh = tuple(r["shape"])
        arr = np.frombuffer(bytes(r["data"]), dtype).reshape(sh)
        sl = tuple(slice(i * c, i * c + s)
                   for i, c, s in zip(idx, spec.chunks, sh))
        out[sl] = arr
    return out


def test_zarr3_document_and_key_anchors(ray_session, tmp_path):
    """Zarr v3 (the current spec; GDAL frmts/zarr reads both): one
    zarr.json array document (node_type/array, regular grid, default
    key encoding), c/i/j nested chunk keys, bytes+gzip codec chain —
    chunk files carry REAL gzip framing (RFC 1952 magic), unlike v2's
    numcodecs zlib streams."""
    import json

    from gdal_ray.sources.zarr import write_zarr3

    rng = np.random.default_rng(42)
    a = rng.normal(size=(20, 33)).astype("<f4")
    ds, spec = _arr_ds(a, (8, 16))
    out = str(tmp_path / "v3.zarr")
    st = write_zarr3(ds, spec, out).take_all()
    assert len(st) == 9                      # ceil(20/8) * ceil(33/16)
    doc = json.load(open(out + "/zarr.json"))
    assert doc["zarr_format"] == 3 and doc["node_type"] == "array"
    assert doc["chunk_grid"]["configuration"]["chunk_shape"] == [8, 16]
    assert [c["name"] for c in doc["codecs"]] == ["bytes", "gzip"]
    assert doc["data_type"] == "float32"
    raw = open(out + "/c/1/2", "rb").read()
    assert raw[:2] == b"\x1f\x8b"            # gzip magic


def test_zarr3_roundtrip_and_missing_chunk_fill(ray_session, tmp_path):
    import os as _os

    from gdal_ray.sources.zarr import read_zarr3, write_zarr3

    rng = np.random.default_rng(7)
    a = (rng.integers(0, 1000, (17, 11))).astype("<i4")
    ds, spec = _arr_ds(a, (8, 8))
    out = str(tmp_path / "i.zarr")
    write_zarr3(ds, spec, out, codec=None).take_all()
    # uncompressed chunk = raw little-endian bytes of the full chunk
    raw = open(out + "/c/0/0", "rb").read()
    assert len(raw) == 8 * 8 * 4
    ds2, spec2 = read_zarr3(out)
    assert np.array_equal(_reassemble(ds2.take_all(), spec2, "<i4"), a)
    # delete one chunk -> fill_value materializes per spec
    _os.remove(out + "/c/1/0")
    ds3, _ = read_zarr3(out)
    back = _reassemble(ds3.take_all(), spec2, "<i4")
    assert (back[8:16, 0:8] == 0).all()
    assert np.array_equal(back[:8, :], a[:8, :])


def test_zarr3_spec_steps_roundtrip(ray_session, tmp_path):
    """mdim_write_zarr3 / mdim_read_zarr3 drive from JSON; v3 output
    reduces to the same answer as the dense array."""
    from gdal_ray.pipelines.spec import run_pipeline
    from gdal_ray.sources.zarr import write_zarr3

    rng = np.random.default_rng(3)
    a = rng.normal(size=(12, 10)).astype("<f8")
    ds, spec = _arr_ds(a, (4, 4))
    out = str(tmp_path / "s.zarr")
    write_zarr3(ds, spec, out).take_all()
    got = run_pipeline([
        {"step": "mdim_read_zarr3", "path": out},
        {"step": "mdim_checksums", "tag": "v3"},
    ]).to_pandas()
    assert len(got) > 0
