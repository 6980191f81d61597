"""Product quantization (Jegou/Douze/Schmid 2011) — the ANN family's
memory-compression scale path: PQ codebooks + uint8 codes + ADC
lookup-table scoring over the distributed encode/probe stages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from gdal_ray.stages.ann import (_normalize, ann_cosine_topk,
                                 ann_pq_topk, pq_encode, pq_train)

pytestmark = pytest.mark.usefixtures("ray_session")


def _clustered(n_per=200, k=8, d=16, sigma=0.3, seed=42):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3.0
    X = np.vstack([c + rng.normal(0.0, sigma, (n_per, d))
                   for c in centers])
    return X, centers, np.repeat(np.arange(k), n_per)


def _emb_ds(X):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(X)), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float64())),
    }))


def test_pq_codes_shape_determinism_and_compression():
    X, _, _ = _clustered()
    books = pq_train(X, m_sub=4, ksub=16)
    assert books.shape == (4, 16, 4)
    enc = pq_encode(_emb_ds(X), books).take_all()
    assert len(enc) == len(X)
    by_id = {r["vec_id"]: list(r["codes"]) for r in enc}
    assert all(len(v) == 4 for v in by_id.values())        # 4 B/vec
    assert all(0 <= c < 16 for v in by_id.values() for c in v)
    enc2 = pq_encode(_emb_ds(X), books).take_all()
    assert {r["vec_id"]: list(r["codes"]) for r in enc2} == by_id


def test_pq_adc_approximates_cosine_and_cluster_precision():
    """ADC inner products on normalized codebooks track cosine
    (mean |ADC - cos| < 0.05) and the top-5 of every query land in
    the query's true cluster."""
    X, centers, label = _clustered()
    books = pq_train(X, m_sub=4, ksub=16)
    # driver-side reconstruction error: codes actually quantize
    Xn = _normalize(X)
    m_sub, ksub, dsub = books.shape
    codes = np.empty((len(X), m_sub), np.int64)
    for j in range(m_sub):
        sub = Xn[:, j * dsub:(j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    rec = np.concatenate([books[j][codes[:, j]]
                          for j in range(m_sub)], axis=1)
    assert np.linalg.norm(rec - Xn) / np.linalg.norm(Xn) < 0.25
    enc = pq_encode(_emb_ds(X), books)
    Q = centers + 0.1
    qids = np.arange(len(Q))
    out = ann_pq_topk(enc, Q, qids, books, k=5).to_pandas()
    assert len(out) == 5 * len(Q)
    prec = 0.0
    errs = []
    for qi in range(len(Q)):
        rows = out[out.qid == qi]
        prec += (label[rows.vec_id.to_numpy()] == qi).mean()
        qn = Q[qi] / np.linalg.norm(Q[qi])
        errs.append(np.abs(rows.score.to_numpy()
                           - Xn[rows.vec_id.to_numpy()] @ qn).mean())
    assert prec / len(Q) >= 0.95
    assert np.mean(errs) < 0.05


def test_pq_vs_exact_overlap_on_separated_data():
    """With tight clusters the ADC top-1 matches the exact cosine
    top-1's cluster for every query (rank-1 fidelity at the
    granularity PQ preserves)."""
    X, centers, label = _clustered(sigma=0.1)
    books = pq_train(X, m_sub=4, ksub=16)
    enc = pq_encode(_emb_ds(X), books)
    Q = centers
    qids = np.arange(len(Q))
    approx = ann_pq_topk(enc, Q, qids, books, k=1).to_pandas()
    exact = ann_cosine_topk(_emb_ds(X), Q, qids, k=1).to_pandas()
    for qi in range(len(Q)):
        va = int(approx[approx.qid == qi].vec_id.iloc[0])
        ve = int(exact[exact.qid == qi].vec_id.iloc[0])
        assert label[va] == label[ve] == qi


def test_pq_guards():
    X, _, _ = _clustered()
    with pytest.raises(ValueError, match="divisible"):
        pq_train(X, m_sub=5)
    with pytest.raises(ValueError, match="samples"):
        pq_train(X[:4], m_sub=4, ksub=16)


def test_ivfpq_cluster_precision_and_pruning():
    """IVF-PQ (IVFADC composition): nprobe coarse lists prune the
    corpus, ADC scores the survivors; every query's top-5 stays in
    its true cluster, and results are a subset of the probed lists'
    members (pruning is real)."""
    from gdal_ray.stages.ann import ann_ivfpq_topk, kmeans_centroids

    X, centers, label = _clustered()
    books = pq_train(X, m_sub=4, ksub=16)
    C = kmeans_centroids(_normalize(X), 8, iters=10)
    Q = centers + 0.1
    qids = np.arange(len(Q))
    out = ann_ivfpq_topk(_emb_ds(X), Q, qids, C, books, k=5,
                         nprobe=2).to_pandas()
    assert len(out) == 5 * len(Q)
    prec = 0.0
    for qi in range(len(Q)):
        rows = out[out.qid == qi]
        prec += (label[rows.vec_id.to_numpy()] == qi).mean()
    assert prec / len(Q) >= 0.95
    # pruning: with nprobe == all lists, results can only grow richer
    out_all = ann_ivfpq_topk(_emb_ds(X), Q, qids, C, books, k=5,
                             nprobe=8).to_pandas()
    for qi in range(len(Q)):
        s2 = out_all[out_all.qid == qi].score.to_numpy()
        s1 = out[out.qid == qi].score.to_numpy()
        assert s2.max() >= s1.max() - 1e-12


def test_sq8_encode_and_recall(ray_session):
    """Int8 scalar quantization: codes round-trip within one
    quantization step, zero vectors stay zero with scale 0, and SQ8
    top-k recall@5 vs the exact float path stays high on clustered
    embeddings."""
    import numpy as np
    import ray.data as rd

    from gdal_ray.stages.ann import (ann_cosine_topk, ann_sq8_topk,
                                     sq8_encode)

    rng = np.random.default_rng(31)
    d, n = 16, 400
    centers = rng.normal(size=(8, d)) * 5.0
    emb = np.vstack([centers[i % 8] + rng.normal(size=d) * 0.4
                     for i in range(n)])
    emb[7] = 0.0                       # exactly-zero vector
    rows = [{"vec_id": i, "embedding": emb[i].tolist()}
            for i in range(n)]
    ds = rd.from_items(rows)
    enc = sq8_encode(ds)
    et = enc.to_pandas().set_index("vec_id").sort_index()
    # reconstruction within one step of the per-vector scale
    for i in (0, 7, 123):
        codes = np.asarray(et.loc[i, "codes"], np.float64)
        scale = float(et.loc[i, "scale"])
        if i == 7:
            assert scale == 0.0 and not codes.any()
        else:
            err = np.abs(codes * scale - emb[i]).max()
            assert err <= 0.5 * scale + 1e-12
            assert np.abs(codes).max() == 127   # symmetric full range
    # recall vs exact float top-k
    q = centers + rng.normal(size=(8, d)) * 0.1
    qid = np.arange(8)
    exact = ann_cosine_topk(ds, q, qid, k=5).to_pandas()
    sq = ann_sq8_topk(sq8_encode(ds), q, qid, k=5).to_pandas()
    rec = []
    for qi in range(8):
        a = set(exact[exact.qid == qi].vec_id)
        b = set(sq[sq.qid == qi].vec_id)
        rec.append(len(a & b) / 5.0)
    assert np.mean(rec) >= 0.9
