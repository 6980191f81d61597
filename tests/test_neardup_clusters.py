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
