"""neardup_clusters: CC over pair stream + canonical representative."""

import pyarrow as pa

from gdal_ray.stages.dedup import neardup_clusters


def _ids(vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array(vals, pa.int64())}))


def _pairs(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                "doc_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )


def test_chain_and_singletons(ray_session):
    # 1-2, 2-3 chain; 5-6 pair; 4 and 7 singletons
    out = neardup_clusters(
        _pairs([(1, 2), (2, 3), (5, 6)]), _ids([1, 2, 3, 4, 5, 6, 7])
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.rep) == [1, 1, 1, 4, 5, 5, 7]
    assert list(out.csize) == [3, 3, 3, 1, 2, 2, 1]
    kept = out[out.doc_id == out.rep]
    assert sorted(kept.doc_id) == [1, 4, 5, 7]


def test_no_pairs(ray_session):
    out = neardup_clusters(
        _pairs([]), _ids([10, 11])
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out.rep) == [10, 11]
    assert list(out.csize) == [1, 1]


def test_embedding_pca_block_split_invariant(ray_session):
    """The fsum-reduced partials + covariance quantization make the
    PCA rows independent of block boundaries."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.stages.ann import embedding_pca

    rng = np.random.default_rng(9)
    n, d = 333, 16
    x = rng.normal(0, 1, (n, d)) @ np.diag(np.linspace(2, 0.1, d))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in x],
                                  pa.list_(pa.float64())),
        }
    )
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        outs.append(
            embedding_pca(ds, n_components=5)
            .to_pandas().sort_values("comp").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    assert list(outs[0].comp) == [0, 1, 2, 3, 4]
    # eigenvalues descending
    e = list(outs[0].eig_q)
    assert e == sorted(e, reverse=True) and e[0] > 0
