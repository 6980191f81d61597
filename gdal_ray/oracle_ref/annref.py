"""Reference implementations for the similarity-search / image near-dup
queries (q21/q26/q28) — single-process numpy, separately coded from the
engine's bucketed map_batches/groupby stages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

try:
    _popcount = np.bitwise_count  # numpy >= 2.0
except AttributeError:  # pragma: no cover
    _TABLE = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)

    def _popcount(x):
        x = np.asarray(x, np.uint64)
        return (
            _TABLE[x & np.uint64(0xFFFF)]
            + _TABLE[(x >> np.uint64(16)) & np.uint64(0xFFFF)]
            + _TABLE[(x >> np.uint64(32)) & np.uint64(0xFFFF)]
            + _TABLE[(x >> np.uint64(48)) & np.uint64(0xFFFF)]
        )


def _embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    order = np.argsort(ids, kind="mergesort")
    return ids[order], emb[order]


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


# ----------------------------------------------------------- q21 ann lsh


def q21_ann_lsh(sf_dir: str, k: int = 5, n_planes: int = 12) -> pd.DataFrame:
    ids, emb = _embeddings(sf_dir)
    dim = emb.shape[1]
    planes = np.random.RandomState(42).standard_normal((dim, n_planes))
    pows = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = (((emb @ planes) > 0) * pows[None, :]).sum(axis=1)
    qsel = ids < 8
    qids, qemb = ids[qsel], _unit(emb[qsel])
    qbuckets = (((qemb @ planes) > 0) * pows[None, :]).sum(axis=1)
    en = _unit(emb)
    out_q, out_v, out_r = [], [], []
    for qi in range(len(qids)):
        rows = np.flatnonzero(buckets == qbuckets[qi])
        if len(rows) == 0:
            continue
        scores = en[rows] @ qemb[qi]
        # top-k by (score desc, vec_id asc), stable
        order = np.lexsort((ids[rows], -scores))[:k]
        for r, idx in enumerate(order, start=1):
            out_q.append(int(qids[qi]))
            out_v.append(int(ids[rows][idx]))
            out_r.append(r)
    return pd.DataFrame(
        {
            "qid": np.asarray(out_q, np.int64),
            "vec_id": np.asarray(out_v, np.int64),
            "rank": np.asarray(out_r, np.int64),
        }
    )


# ----------------------------------------------------------- q16 ann ivf


def q_ann_ivf(sf_dir: str, k: int = 5, k_lists: int = 16, nprobe: int = 2,
              n_train: int = 256, iters: int = 10) -> pd.DataFrame:
    """IVF golden: the same deterministic Lloyd contract (init = first
    k_lists rows of the id-sorted sample, cosine argmax assignment,
    member-mean renormalized update, emptied cluster keeps its
    centroid), coded independently as a single-process pass."""
    ids, emb = _embeddings(sf_dir)
    en = _unit(emb)
    train = en[ids < n_train]
    C = train[:k_lists].copy()
    for _ in range(iters):
        assign = np.argmax(train @ C.T, axis=1)
        for c in range(k_lists):
            rows = np.flatnonzero(assign == c)
            if len(rows):
                s = train[rows].sum(axis=0) / float(len(rows))
                n = np.linalg.norm(s)
                if n > 0:
                    C[c] = s / n
    assign = np.argmax(en @ C.T, axis=1)
    qsel = ids < 8
    qids, qemb = ids[qsel], en[qsel]
    qlists = np.argsort(-(qemb @ C.T), axis=1, kind="stable")[:, :nprobe]
    out_q, out_v, out_r = [], [], []
    for qi in range(len(qids)):
        rows = np.flatnonzero(np.isin(assign, qlists[qi]))
        if len(rows) == 0:
            continue
        scores = en[rows] @ qemb[qi]
        order = np.lexsort((ids[rows], -scores))[:k]
        for r, idx in enumerate(order, start=1):
            out_q.append(int(qids[qi]))
            out_v.append(int(ids[rows][idx]))
            out_r.append(r)
    return pd.DataFrame(
        {
            "qid": np.asarray(out_q, np.int64),
            "vec_id": np.asarray(out_v, np.int64),
            "rank": np.asarray(out_r, np.int64),
        }
    )


# ------------------------------------------------------ q26 phash near-dup


def q26_phash(sf_dir: str, max_hamming: int = 6, bands: int = 4) -> pd.DataFrame:
    # fixture input provisioning only: the images table IS the query input
    from ..synth.make_table import ensure_fixtures, scale_for_sf_dir

    paths = ensure_fixtures(scale_for_sf_dir(sf_dir))
    t = pq.read_table(paths["images"], columns=["image_id", "phash"])
    ids = np.asarray(t.column("image_id").to_pylist())
    ph = t.column("phash").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="mergesort")
    ids, ph = ids[order], ph[order]
    u = ph.astype(np.uint64)
    width = np.uint64(64 // bands)
    mask = (np.uint64(1) << width) - np.uint64(1)
    band_vals = np.stack(
        [((u >> (width * np.uint64(b))) & mask).astype(np.int64) for b in range(bands)],
        axis=1,
    )
    seen: set[tuple[int, int]] = set()
    out_a, out_b, out_h = [], [], []
    for b in range(bands):
        vals = band_vals[:, b]
        sort_idx = np.argsort(vals, kind="mergesort")
        sv = vals[sort_idx]
        starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
        ends = np.r_[starts[1:], len(sv)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            grp = np.sort(sort_idx[s:e])
            gu = u[grp]
            for x in range(len(grp)):
                hd = _popcount(gu[x] ^ gu[x + 1 :]).astype(np.int64)
                for off in np.flatnonzero(hd <= max_hamming):
                    i, j = int(grp[x]), int(grp[x + 1 + off])
                    key = (i, j)
                    if key in seen:
                        continue
                    seen.add(key)
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(int(hd[off]))
    df = pd.DataFrame(
        {
            "id_a": out_a,
            "id_b": out_b,
            "hamming": np.asarray(out_h, np.int64),
        }
    )
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------- q28 embedding near-dup


def q28_embedding_neardup(sf_dir: str, threshold: float = 0.35,
                          bands: int = 16, planes_per_band: int = 12,
                          max_bucket: int = 4096) -> pd.DataFrame:
    """Banded multi-table LSH candidate rule (operator SPEC shared with
    the engine: seed-42 planes of shape (dim, bands*planes_per_band),
    band b uses plane columns [b*p, (b+1)*p)): a pair is a candidate in
    its FIRST shared band, restricted to the ``max_bucket`` smallest
    ids per (band, bucket); candidates verified with exact cosine."""
    ids, emb = _embeddings(sf_dir)
    dim = emb.shape[1]
    p = planes_per_band
    planes = np.random.RandomState(42).standard_normal((dim, bands * p))
    pows = (1 << np.arange(p)).astype(np.int64)
    bits = (emb @ planes) > 0
    bk = (bits.reshape(len(ids), bands, p) * pows[None, None, :]).sum(axis=2)
    en = _unit(emb)
    out_a, out_b = [], []
    for b in range(bands):
        for bv in np.unique(bk[:, b]):
            grp = np.flatnonzero(bk[:, b] == bv)
            if len(grp) < 2:
                continue
            grp = grp[np.argsort(ids[grp], kind="mergesort")][:max_bucket]
            iu, ju = np.triu_indices(len(grp), 1)
            gi, gj = grp[iu], grp[ju]
            if b > 0:
                # first-shared-band: skip pairs already bucketed
                # together in ANY earlier band (cap-independent rule)
                shared = (bk[gi, :b] == bk[gj, :b]).any(axis=1)
                gi, gj = gi[~shared], gj[~shared]
            if not len(gi):
                continue
            s = np.einsum("ij,ij->i", en[gi], en[gj])
            hit = s >= threshold
            aa, bb = ids[gi[hit]], ids[gj[hit]]
            lo = np.minimum(aa, bb)
            hi = np.maximum(aa, bb)
            out_a.extend(int(v) for v in lo)
            out_b.extend(int(v) for v in hi)
    df = pd.DataFrame(
        {"id_a": np.asarray(out_a, np.int64), "id_b": np.asarray(out_b, np.int64)}
    )
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def part_pca(sf_dir: str, n_components: int = 8,
             quant_bits: int = 24) -> pd.DataFrame:
    """PCA golden: single-process direct covariance ((X-μ)ᵀ(X-μ)/n —
    a DIFFERENT accumulation path than the engine's streaming
    Σx·xᵀ partials; the shared 2^-quant_bits covariance quantization
    makes both eigendecompose the identical matrix), then the same
    canonical encoding: eigenvalue-descending components, sign fixed
    at the max-|v| entry, integer-quantized eigenvalue and
    position-weighted loading checksum.  Columns renamed to the q16
    suite shape (qid=comp, vec_id=eig_q, rank=load_cs)."""
    _, emb = _embeddings(sf_dir)
    n, d = emb.shape
    mu = emb.mean(axis=0)
    xc = emb - mu
    cov = (xc.T @ xc) / n
    q = float(1 << quant_bits)
    cov = np.round(cov * q) / q
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w, kind="stable")[: min(n_components, d)]
    rows = []
    for ci, ei in enumerate(order):
        vec = v[:, ei]
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        qv = np.round(vec * q).astype(np.int64)
        rows.append(
            (ci, int(round(w[ei] * q)), int(((np.arange(d) + 1) * qv).sum()))
        )
    return pd.DataFrame(rows, columns=["qid", "vec_id", "rank"]).astype(
        np.int64
    )


def part_kmeans(sf_dir: str, k: int = 8, iters: int = 5,
                quant_bits: int = 24) -> pd.DataFrame:
    """Distributed-k-means golden: single-process Lloyd with plain
    ``np.sum`` means — a DIFFERENT accumulation path than the engine's
    fsum-of-block-partials reduce; the shared per-iteration
    2^-quant_bits centroid quantization makes every iteration's
    assignments identical (the repo's determinism contract, as in
    part_pca).  Same init (k id-smallest vectors), empty-cluster and
    argmax-lowest-index tie rules.  Rows in the q16 suite shape:
    ('kmeans', cluster, n_members, cent_cs) summaries and
    ('kmeans_assign', vec_id, cluster, sim_q) per-vector assignments,
    with sim_q = round(cos·2^quant_bits) and cent_cs =
    Σ_j (j+1)·round(c_j·2^quant_bits)."""
    ids, emb = _embeddings(sf_dir)
    x = _unit(emb)
    q = float(1 << quant_bits)
    C = np.round(_unit(emb[:k].copy()) * q) / q
    d = C.shape[1]
    for _ in range(iters):
        assign = np.argmax(x @ C.T, axis=1)
        nxt = C.copy()
        for c in range(k):
            rows = np.flatnonzero(assign == c)
            if not len(rows):
                continue
            m = x[rows].sum(axis=0) / float(len(rows))
            n = np.linalg.norm(m)
            if n > 0:
                nxt[c] = m / n
        C = np.round(nxt * q) / q
    sims = x @ C.T
    assign = np.argmax(sims, axis=1)
    best = sims[np.arange(len(assign)), assign]
    qc = np.round(C * q).astype(np.int64)
    rows = []
    for c in range(k):
        rows.append(
            ("kmeans", c, int((assign == c).sum()),
             int(((np.arange(d) + 1) * qc[c]).sum()))
        )
    for i in range(len(ids)):
        rows.append(
            ("kmeans_assign", int(ids[i]), int(assign[i]),
             int(round(best[i] * q)))
        )
    return pd.DataFrame(
        rows, columns=["m", "qid", "vec_id", "rank"]
    ).astype({"qid": np.int64, "vec_id": np.int64, "rank": np.int64})


GOLDENS = {
    # composed into q16_ann_topk by pipelines.queries.COMBINED_ORACLES
    "part_ann_lsh": (q21_ann_lsh, ["qid", "rank"]),
    "part_ann_ivf": (q_ann_ivf, ["qid", "rank"]),
    "part_pca": (part_pca, ["qid"]),
    "part_kmeans": (part_kmeans, ["m", "qid"]),
    "q26_phash_neardup": (q26_phash, ["id_a", "id_b"]),
    "q28_embedding_neardup": (q28_embedding_neardup, ["id_a", "id_b"]),
}
