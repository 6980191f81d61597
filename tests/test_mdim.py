"""Multidim N-D chunked array engine (stages/mdim.py)."""

import numpy as np
import pyarrow as pa

from gdal_ray.stages import mdim as M


def _full(ds, spec):
    """Materialize a chunk Dataset back to one ndarray (test helper)."""
    out = np.zeros(spec.shape, dtype=spec.dtype)
    for r in ds.take_all():
        idx = r["chunk"]
        arr = np.frombuffer(r["data"], dtype=spec.dtype).reshape(
            tuple(r["shape"])
        )
        sel = tuple(
            slice(i * c, i * c + s)
            for i, c, s in zip(idx, spec.chunks, arr.shape)
        )
        out[sel] = arr
    return out


def test_mdim_create_and_transpose(ray_session):
    fill = lambda i, j, k: (i * 7 + j * 5 + k * 3) % 100  # noqa: E731
    spec = M.MDSpec((12, 20, 8), (8, 8, 8), "int64")
    ds = M.mdim_create(spec, fill, parallelism=4)
    I, J, K = np.meshgrid(np.arange(12), np.arange(20), np.arange(8),
                          indexing="ij")
    A = fill(I, J, K).astype(np.int64)
    assert np.array_equal(_full(ds, spec), A)
    tr, tr_spec = M.mdim_transpose(ds, spec, (2, 0, 1))
    assert tr_spec.shape == (8, 12, 20)
    assert np.array_equal(_full(tr, tr_spec), A.transpose(2, 0, 1))


def test_mdim_unaligned_slice(ray_session):
    spec = M.MDSpec((16, 16), (8, 8), "int64")
    ds = M.mdim_create(spec, lambda i, j: i * 31 + j, parallelism=2)
    sl, sl_spec = M.mdim_slice(ds, spec, [(3, 14), (5, 12)])
    I, J = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    A = (I * 31 + J).astype(np.int64)
    assert sl_spec.shape == (11, 7)
    assert np.array_equal(_full(sl, sl_spec), A[3:14, 5:12])


def test_mdim_reduce_and_resample(ray_session):
    fill = lambda i, j, k: (i * 7 + j * 5 + k * 3) % 100  # noqa: E731
    spec = M.MDSpec((8, 16, 16), (4, 8, 8), "int64")
    ds = M.mdim_create(spec, fill, parallelism=4)
    I, J, K = np.meshgrid(np.arange(8), np.arange(16), np.arange(16),
                          indexing="ij")
    A = fill(I, J, K).astype(np.int64)
    s0, s0_spec = M.mdim_reduce(ds, spec, "sum", 0)
    assert np.array_equal(_full(s0, s0_spec), A.sum(axis=0))
    m2, m2_spec = M.mdim_reduce(ds, spec, "mean", 2)
    assert np.allclose(_full(m2, m2_spec), A.sum(axis=2) / 16.0)
    mx, mx_spec = M.mdim_reduce(ds, spec, "max", 1)
    assert np.array_equal(_full(mx, mx_spec), A.max(axis=1))
    rs, rs_spec = M.mdim_resample2x(ds, spec, (1, 2))
    v = (A[:, 0::2, 0::2] + A[:, 0::2, 1::2]
         + A[:, 1::2, 0::2] + A[:, 1::2, 1::2])
    assert np.array_equal(_full(rs, rs_spec), (v + 2) // 4)
