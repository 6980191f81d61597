"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the exact baseline (numpy matmul per batch
against a broadcast query matrix, ray.put once); the scale path is
random-hyperplane LSH bucketing (sign-bit buckets + multiprobe),
trading recall for a groupby instead of an all-pairs scan.  Engine
addition (no reference analog; SURVEY.md training-data ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _emb_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # zero-copy-ish: flatten fixed-length lists
    flat = np.asarray(arr.values)
    return flat.reshape(len(t), -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n



def _topk_merge_by_qid(partials, k: int, num_partitions: int = 16):
    """Final per-query top-k merge over (qid, vec_id, score) partials,
    grouped by a hash PART of qid — one vectorized call per partition
    (lexsort + run ranks) instead of one pandas call per query.
    Ordering: score desc, vec_id asc; rank is 1-based."""

    def add_part(t: pa.Table) -> pa.Table:
        q = t.column("qid").to_numpy(zero_copy_only=False).astype(np.uint64)
        q = (q ^ (q >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        q = q ^ (q >> np.uint64(33))
        return t.append_column(
            "__qpart",
            pa.array((q % np.uint64(num_partitions)).astype(np.int64),
                     pa.int64()),
        )

    def merge_part(g: pa.Table) -> pa.Table:
        qid = g.column("qid").to_numpy(zero_copy_only=False)
        vid = g.column("vec_id").to_numpy(zero_copy_only=False)
        score = g.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -score, qid))
        qid_s = qid[order]
        n = len(order)
        new = np.concatenate([[True], qid_s[1:] != qid_s[:-1]])
        starts = np.flatnonzero(new)
        run_len = np.diff(np.append(starts, n))
        rank = np.arange(n) - np.repeat(starts, run_len)
        keep = rank < k
        return pa.table(
            {
                "qid": pa.array(qid_s[keep], pa.int64()),
                "vec_id": pa.array(vid[order][keep], pa.int64()),
                "score": pa.array(score[order][keep], pa.float64()),
                "rank": pa.array((rank[keep] + 1).astype(np.int32)),
            }
        )

    return (
        partials.map_batches(add_part, batch_format="pyarrow")
        .groupby("__qpart")
        .map_groups(merge_part, batch_format="pyarrow")
    )


def ann_cosine_topk(embeddings, queries: np.ndarray, query_ids: np.ndarray, k: int = 5):
    """Exact top-k cosine neighbors for each query row.

    Per-batch partial top-k (vectorized matmul vs the broadcast query
    matrix) then a tiny groupby(qid) merge — the partial+final
    aggregate pattern.  Returns (qid, vec_id, rank, score)."""
    import ray

    qn = _normalize(np.asarray(queries, np.float64))
    ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        qn, qids = ray.get(ref)
        m = _normalize(_emb_matrix(t))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        scores = m @ qn.T  # (B, Q)
        kk = min(k, scores.shape[0])
        top = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, Q)
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            rows = top[:, qi]
            out_q.append(np.full(len(rows), qids[qi], dtype=np.int64))
            out_v.append(vid[rows])
            out_s.append(scores[rows, qi])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return _topk_merge_by_qid(
        embeddings.map_batches(partial, batch_format="pyarrow"), k
    )


class LSHBucketer:
    """Actor-pool stage: random-hyperplane sign-bit bucket ids
    (deterministic seeded planes built once per actor)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.pows = (1 << np.arange(n_planes)).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        bits = (m @ self.planes) > 0
        bucket = (bits * self.pows[None, :]).sum(axis=1).astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))


def ann_lsh_topk(
    embeddings,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    n_planes: int = 12,
    concurrency: int = 4,
):
    """Approximate cosine top-k: only vectors sharing the query's LSH
    bucket are scored (bucketed groupby instead of all-pairs; recall
    depends on n_planes).  Returns (qid, vec_id, rank, score)."""
    import ray

    dim = np.asarray(queries).shape[1]
    bucketed = embeddings.map_batches(
        LSHBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    b = LSHBucketer(dim=dim, n_planes=n_planes)
    qn = _normalize(np.asarray(queries, np.float64))
    qbits = (qn @ b.planes) > 0
    qbucket = (qbits * b.pows[None, :]).sum(axis=1).astype(np.int64)
    by_bucket: dict[int, list[int]] = {}
    for qi, qb in enumerate(qbucket):
        by_bucket.setdefault(int(qb), []).append(qi)
    ref = ray.put((qn, np.asarray(query_ids, np.int64), by_bucket))

    def probe(t: pa.Table) -> pa.Table:
        qn, qids, by_bucket = ray.get(ref)
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        m = _normalize(_emb_matrix(t))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for qb, qis in by_bucket.items():
            rows = np.flatnonzero(buckets == qb)
            if len(rows) == 0:
                continue
            scores = m[rows] @ qn[qis].T
            for c, qi in enumerate(qis):
                out_q.append(np.full(len(rows), qids[qi], dtype=np.int64))
                out_v.append(vid[rows])
                out_s.append(scores[:, c])
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return _topk_merge_by_qid(
        bucketed.map_batches(probe, batch_format="pyarrow"), k
    )


class BandedLSHBucketer:
    """Actor-pool stage: banded multi-table random-hyperplane LSH.

    ``bands`` independent hash tables of ``planes_per_band`` sign bits
    each (seeded planes built once per actor).  Each vector explodes to
    one (vec_id, band, bucket, sig) row per band — NO embedding payload
    crosses the shuffle; ``sig`` packs all per-band bucket ids so the
    group task can apply the first-shared-band dedup locally."""

    def __init__(self, dim: int | None = None, bands: int = 16,
                 planes_per_band: int = 12, seed: int = 42):
        self.bands = bands
        self.p = planes_per_band
        self.seed = seed
        self.planes = None
        if dim is not None:
            self._build(dim)
        self.pows = (1 << np.arange(planes_per_band)).astype(np.int64)

    def _build(self, dim: int) -> None:
        # dim may be discovered lazily from the first batch (avoids a
        # driver-side take(1) round-trip); the seed makes every actor
        # build the identical plane matrix
        rng = np.random.RandomState(self.seed)
        self.planes = rng.standard_normal((dim, self.bands * self.p))

    def band_buckets(self, m: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n, bands) int32 bucket ids."""
        if self.planes is None:
            self._build(m.shape[1])
        bits = (m @ self.planes) > 0  # (n, bands*p)
        bits = bits.reshape(len(m), self.bands, self.p)
        return (bits * self.pows[None, None, :]).sum(axis=2).astype(np.int32)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _emb_matrix(t)
        bk = self.band_buckets(m)  # (n, B)
        n, B = bk.shape
        sig = bk.astype("<i4").tobytes()
        sigs = [sig[i * 4 * B : (i + 1) * 4 * B] for i in range(n)]
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vec_id": pa.array(np.tile(vid, B), pa.int64()),
                "band": pa.array(
                    np.repeat(np.arange(B, dtype=np.int32), n), pa.int32()
                ),
                "bucket": pa.array(
                    np.concatenate([bk[:, b] for b in range(B)]).astype(np.int64),
                    pa.int64(),
                ),
                "sig": pa.array(sigs * B, pa.binary()),
            }
        )


def embedding_neardup_pairs(
    embeddings,
    threshold: float = 0.95,
    bands: int = 16,
    planes_per_band: int = 12,
    max_bucket: int = 4096,
    return_stats: bool = False,
):
    """Embedding-cosine near-duplicate pairs via banded multi-table LSH
    (bands x 2^planes_per_band effective buckets) + join-back exact
    verification.  Returns (id_a, id_b, score); with ``return_stats``
    also a per-(band, bucket) truncation Dataset (n_in_bucket,
    n_dropped) so capped work is visible, never silent.

    Scale shape: the shuffle carries only (vec_id, band, bucket, sig)
    — the embedding payload stays in the base table and is re-attached
    to the candidate pairs by two hash joins for the vectorized cosine
    verify (same join-back discipline as stages/dedup.minhash).
    Candidate pairs are emitted in their FIRST shared band only;
    degenerate buckets are truncated to the ``max_bucket`` smallest
    ids (bounded O(cap^2) candidate work)."""
    B = bands
    exploded = embeddings.map_batches(
        BandedLSHBucketer,
        fn_constructor_kwargs=dict(bands=bands,
                                   planes_per_band=planes_per_band),
        batch_format="pyarrow",
        concurrency=2,
    )

    # candidate pairs grouped by a hash PART of (band, bucket) — one
    # vectorized group call per partition instead of one Python call
    # per (mostly tiny) bucket
    n_cand_parts = 64

    def add_bpart(t: pa.Table) -> pa.Table:
        bk = t.column("bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        bd = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = bk * np.uint64(1000003) + bd
        key = (key ^ (key >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        part = ((key ^ (key >> np.uint64(33)))
                % np.uint64(n_cand_parts)).astype(np.int64)
        return t.append_column("__bpart", pa.array(part, pa.int64()))

    def cand_pairs_part(g: pa.Table) -> pa.Table:
        band_a = g.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
        bk_a = g.column("bucket").to_numpy(zero_copy_only=False).astype(np.int64)
        vid_a = g.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vid_a, bk_a, band_a))
        bs, ks = band_a[order], bk_a[order]
        new = np.concatenate(
            [[True], (bs[1:] != bs[:-1]) | (ks[1:] != ks[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        sig_all = g.column("sig").to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for b0, b1 in zip(starts, ends):
            if b1 - b0 < 2:
                continue
            rows = order[b0:b1][: max_bucket]  # vec_id-sorted in run
            band = int(bs[b0])
            ids = vid_a[rows]
            sig = np.frombuffer(
                b"".join(sig_all[rows]), dtype="<i4"
            ).reshape(len(rows), B)
            n = len(ids)
            chunk = max(1, 4_000_000 // max(n, 1))
            for lo in range(0, n, chunk):
                hi = min(n, lo + chunk)
                # first-shared-band dedup: keep (i, j) only when no
                # earlier band already bucketed them together
                if band > 0:
                    earlier = (
                        sig[lo:hi, None, :band] == sig[None, :, :band]
                    ).any(axis=2)
                else:
                    earlier = np.zeros((hi - lo, n), dtype=bool)
                ri, ci = np.nonzero(~earlier)
                keep = (ri + lo) < ci
                out_a.append(ids[ri[keep] + lo])
                out_b.append(ids[ci[keep]])
        a = np.concatenate(out_a) if out_a else np.array([], np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], np.int64)
        return pa.table(
            {
                "id_a": pa.array(a.astype(np.int64), pa.int64()),
                "id_b": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    cands = (
        exploded.map_batches(add_bpart, batch_format="pyarrow")
        .groupby("__bpart")
        .map_groups(cand_pairs_part, batch_format="pyarrow")
    )

    n_cand = cands.count()
    if n_cand == 0:
        import ray.data as rd

        pairs = rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        )
    else:
        parts = max(1, min(32, n_cand // 50_000 + 1))

        def emb_as(name):
            # Arrow hash join rejects list<float> payload columns —
            # pack each embedding as little-endian float32 bytes
            def fn(t: pa.Table) -> pa.Table:
                m = _emb_matrix(t).astype("<f4")
                d = m.shape[1] if m.size else dim
                raw = m.tobytes()
                packed = [raw[i * 4 * d : (i + 1) * 4 * d] for i in range(len(t))]
                return pa.table(
                    {
                        name: t.column("vec_id"),
                        f"emb_{name}": pa.array(packed, pa.binary()),
                    }
                )

            return fn

        j = cands.join(
            embeddings.map_batches(emb_as("id_a"), batch_format="pyarrow"),
            join_type="inner", num_partitions=parts, on=("id_a",),
        ).join(
            embeddings.map_batches(emb_as("id_b"), batch_format="pyarrow"),
            join_type="inner", num_partitions=parts, on=("id_b",),
        )

        def verify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            def unpack(col):
                raw = b"".join(col.to_pylist())
                return (
                    np.frombuffer(raw, dtype="<f4")
                    .reshape(t.num_rows, -1)
                    .astype(np.float64)
                )

            ma = _normalize(unpack(t.column("emb_id_a")))
            mb = _normalize(unpack(t.column("emb_id_b")))
            s = np.einsum("ij,ij->i", ma, mb)
            keep = s >= threshold
            return pa.table(
                {
                    "id_a": t.column("id_a").filter(pa.array(keep)),
                    "id_b": t.column("id_b").filter(pa.array(keep)),
                    "score": pa.array(s[keep], pa.float64()),
                }
            )

        pairs = j.map_batches(verify, batch_format="pyarrow")

    if not return_stats:
        return pairs

    from ray.data.aggregate import Count

    def overflow(t: pa.Table) -> pa.Table:
        n = t.column("count()").to_numpy(zero_copy_only=False)
        dropped = np.maximum(n - max_bucket, 0)
        return pa.table(
            {
                "band": t.column("band"),
                "bucket": t.column("bucket"),
                "n_in_bucket": pa.array(n.astype(np.int64), pa.int64()),
                "n_dropped": pa.array(dropped.astype(np.int64), pa.int64()),
            }
        )

    stats = (
        exploded.groupby(["band", "bucket"])
        .aggregate(Count())
        .map_batches(overflow, batch_format="pyarrow")
    )
    return pairs, stats


# ---------------------------------------------------------------- IVF ANN


def kmeans_centroids(m: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means on UNIT vectors with cosine
    assignment (the IVF coarse quantizer; Sivic & Zisserman-style
    inverted lists): init = the first k rows of the id-sorted sample,
    assign by argmax dot (numpy argmax tie -> lowest index), update =
    member mean re-normalized; an emptied cluster keeps its previous
    centroid.  Fixed iteration count, shared-expression contract."""
    m = _normalize(np.asarray(m, np.float64))
    C = m[:k].copy()
    for _ in range(iters):
        assign = np.argmax(m @ C.T, axis=1)
        for c in range(k):
            rows = np.flatnonzero(assign == c)
            if len(rows):
                s = m[rows].sum(axis=0) / float(len(rows))
                n = np.linalg.norm(s)
                if n > 0:
                    C[c] = s / n
    return C


def ann_ivf_topk(
    embeddings,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    concurrency: int = 4,
):
    """IVF approximate cosine top-k (the k-means sibling of the LSH
    scale path): vectors live in inverted lists keyed by their nearest
    coarse centroid; each query scores only its ``nprobe`` nearest
    lists.  Centroids are broadcast once (ray.put); list assignment is
    a vectorized map; per-batch partial scores merge through ONE
    groupby(qid).  Returns (qid, vec_id, rank, score)."""
    import ray

    C = np.asarray(centroids, np.float64)
    qn = _normalize(np.asarray(queries, np.float64))
    qlists = np.argsort(-(qn @ C.T), axis=1, kind="stable")[:, :nprobe]
    by_list: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for li in qlists[qi]:
            by_list.setdefault(int(li), []).append(qi)
    ref = ray.put((C, qn, np.asarray(query_ids, np.int64), by_list))

    def probe(t: pa.Table) -> pa.Table:
        C, qn, qids, by_list = ray.get(ref)
        m = _normalize(_emb_matrix(t))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        assign = np.argmax(m @ C.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for li, qis in by_list.items():
            rows = np.flatnonzero(assign == li)
            if len(rows) == 0:
                continue
            scores = m[rows] @ qn[qis].T
            for c, qi in enumerate(qis):
                out_q.append(np.full(len(rows), qids[qi], dtype=np.int64))
                out_v.append(vid[rows])
                out_s.append(scores[:, c])
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    return _topk_merge_by_qid(
        embeddings.map_batches(probe, batch_format="pyarrow"), k
    )


# -------------------------------------------------------------- PCA


def embedding_pca(emb, n_components: int = 8, quant_bits: int = 24):
    """Distributed PCA over an embedding column (engine addition — the
    whitening / variance-analysis step of an embedding pipeline).

    Streaming shape: one ``map_batches`` pass emits per-batch partials
    (count, Σx, Σx·xᵀ — one tiny row per block, d ≤ a few hundred), a
    single-worker reduce sums them with ``math.fsum`` per entry
    (exactly-rounded, so the result is independent of block arrival
    order), forms the covariance, QUANTIZES it to 2^-quant_bits (the
    repo's shared engine↔golden determinism contract: any two correct
    accumulation orders agree far below the quantization step) and
    eigendecomposes the tiny d×d matrix on that worker — the full
    embedding matrix never gathers anywhere.

    Output rows (integer-exact so the oracle hash is stable):
    ``comp`` (0-based, eigenvalue-descending), ``eig_q`` =
    round(eigenvalue·2^quant_bits), ``load_cs`` = Σ_j (j+1)·q_j with
    q_j = round(v_j·2^quant_bits), after canonicalizing each
    eigenvector's sign (entry of max |v|, first index on ties, made
    positive)."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        x = _emb_matrix(t, "embedding")
        d = x.shape[1]
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()],
                              pa.list_(pa.float64())),
                "xtx": pa.array([(x.T @ x).reshape(-1).tolist()],
                                pa.list_(pa.float64())),
                "d": pa.array([d], pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        d = int(t.column("d")[0].as_py())
        n = int(pa.compute.sum(t.column("n")).as_py())
        svals = t.column("s").to_pylist()
        xvals = t.column("xtx").to_pylist()
        s = np.array([math.fsum(col) for col in zip(*svals)])
        xtx = np.array([math.fsum(col) for col in zip(*xvals)]).reshape(d, d)
        mu = s / n
        cov = xtx / n - np.outer(mu, mu)
        q = float(1 << quant_bits)
        cov = np.round(cov * q) / q
        w, v = np.linalg.eigh(cov)
        order = np.argsort(-w, kind="stable")[: min(n_components, d)]
        comps, eig_q, load_cs = [], [], []
        for ci, ei in enumerate(order):
            vec = v[:, ei]
            j = int(np.argmax(np.abs(vec)))
            if vec[j] < 0:
                vec = -vec
            qv = np.round(vec * q).astype(np.int64)
            comps.append(ci)
            eig_q.append(int(round(w[ei] * q)))
            load_cs.append(int(((np.arange(d) + 1) * qv).sum()))
        return pa.table(
            {
                "comp": pa.array(comps, pa.int64()),
                "eig_q": pa.array(eig_q, pa.int64()),
                "load_cs": pa.array(load_cs, pa.int64()),
            }
        )

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


# ----------------------------------------------------- distributed k-means


def embedding_kmeans(emb, k: int = 8, iters: int = 5, quant_bits: int = 24,
                     id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd k-means over the embedding column — the
    full-corpus sibling of the sample-trained IVF coarse quantizer
    (:func:`kmeans_centroids`); the clustering step of semantic-dedup /
    curriculum pipelines.

    Shape: each iteration is ONE ``map_batches`` pass emitting
    per-block per-cluster (count, Σx) partials — k tiny rows per block,
    k·d floats of shuffle volume regardless of corpus size — reduced on
    a single worker with ``math.fsum`` per component (exactly-rounded,
    block-arrival-order independent); new centroids renormalize, then
    QUANTIZE to 2^-quant_bits before broadcasting into the next pass
    (the repo's engine↔golden determinism contract: assignments depend
    only on quantized centroids, so any two correct accumulation
    orders agree).  Init = the k id-smallest vectors (distributed
    top-k on ``id_col``); an emptied cluster keeps its previous
    centroid; cosine assignment with numpy argmax lowest-index ties.
    The embedding matrix never gathers anywhere.

    Returns ``(assign_ds, summary)``:
      assign_ds — Dataset (id_col, cluster int64, sim_q int64 =
        round(cos·2^quant_bits));
      summary — list of (cluster, cent_cs) with cent_cs =
        Σ_j (j+1)·round(c_j·2^quant_bits), integer-exact.
    """
    import math

    from ..pipelines.relational import order_by_limit

    q = float(1 << quant_bits)

    seed = order_by_limit(
        emb.select_columns([id_col, vec_col]), [id_col], limit=k
    ).to_pandas()
    C = _normalize(np.stack(
        [np.asarray(v, np.float64) for v in seed[vec_col]]
    ))
    C = np.round(C * q) / q
    d = C.shape[1]

    def partial_pass(Cq):
        def partial(t: pa.Table) -> pa.Table:
            x = _normalize(_emb_matrix(t, vec_col))
            assign = np.argmax(x @ Cq.T, axis=1)
            cl, ns, ss = [], [], []
            for c in range(k):
                rows = np.flatnonzero(assign == c)
                cl.append(c)
                ns.append(len(rows))
                ss.append(x[rows].sum(axis=0).tolist() if len(rows)
                          else [0.0] * d)
            return pa.table(
                {
                    "cluster": pa.array(cl, pa.int64()),
                    "n": pa.array(ns, pa.int64()),
                    "s": pa.array(ss, pa.list_(pa.float64())),
                }
            )

        return partial

    for _ in range(iters):
        Cq = C

        def reduce_(t: pa.Table, _Cq=Cq) -> pa.Table:
            cl = t.column("cluster").to_numpy(zero_copy_only=False)
            ns = t.column("n").to_numpy(zero_copy_only=False)
            ss = t.column("s").to_pylist()
            out = _Cq.copy()
            for c in range(k):
                sel = np.flatnonzero(cl == c)
                n_c = int(ns[sel].sum())
                if n_c == 0:
                    continue  # emptied cluster keeps its centroid
                s = np.array(
                    [math.fsum(ss[i][j] for i in sel) for j in range(d)]
                )
                m = s / n_c
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    out[c] = m / nrm
            out = np.round(out * q) / q
            return pa.table({"c": pa.array(out.reshape(-1).tolist(),
                                           pa.float64())})

        C = np.array(
            emb.map_batches(partial_pass(Cq), batch_format="pyarrow")
            .repartition(1)
            .map_batches(reduce_, batch_format="pyarrow", batch_size=None)
            .to_pandas()["c"]
        ).reshape(k, d)

    Cf = C

    def assign_rows(t: pa.Table) -> pa.Table:
        x = _normalize(_emb_matrix(t, vec_col))
        sims = x @ Cf.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(a)), a]
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "sim_q": pa.array(np.round(best * q).astype(np.int64),
                                  pa.int64()),
            }
        )

    assign_ds = emb.map_batches(assign_rows, batch_format="pyarrow")
    qc = np.round(Cf * q).astype(np.int64)
    summary = [
        (c, int(((np.arange(d) + 1) * qc[c]).sum())) for c in range(k)
    ]
    return assign_ds, summary

# ------------------------------------------------- product quantization
#
# PQ (Jegou, Douze & Schmid 2011, "Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI): split d-dim vectors into M subspaces,
# k-means each subspace to ksub centroids, store each vector as M
# uint8 codes — the memory-compression scale path (a 16-dim float64
# embedding becomes 4 bytes at M=4).  Queries score encoded vectors
# by ADC (asymmetric distance computation): one inner-product lookup
# table per (query, subspace), scores = LUT gathers — no
# decompression.  Engine shape: codebooks broadcast once (ray.put),
# encode and probe are vectorized map_batches, merges ride the same
# ONE groupby(qid) as the other ANN paths.


def pq_train(sample: np.ndarray, m_sub: int = 4, ksub: int = 16,
             iters: int = 10, normalize: bool = True) -> np.ndarray:
    """Train PQ codebooks on a driver-side sample: deterministic L2
    Lloyd per subspace (stride init over the id-sorted sample,
    argmin L2 assignment with numpy's lowest-index ties, mean
    update, emptied clusters keep their centroid).  ``normalize``
    (default) trains on unit vectors so ADC inner products
    approximate COSINE — the contract the other ANN paths use.
    Returns (m_sub, ksub, dsub) float64."""
    x = np.asarray(sample, np.float64)
    if normalize:
        x = _normalize(x)
    n, d = x.shape
    if d % m_sub:
        raise ValueError(f"dim {d} not divisible by {m_sub} subspaces")
    if n < ksub:
        raise ValueError(f"PQ training needs >= {ksub} samples")
    dsub = d // m_sub
    books = np.empty((m_sub, ksub, dsub), np.float64)
    stride = max(1, n // ksub)
    for j in range(m_sub):
        sub = x[:, j * dsub:(j + 1) * dsub]
        # deterministic stride init: evenly spaced sample rows, so a
        # cluster-ordered sample still seeds every region
        C = sub[::stride][:ksub].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                rows = np.flatnonzero(assign == c)
                if len(rows):
                    C[c] = sub[rows].mean(axis=0)
        books[j] = C
    return books


def pq_encode(embeddings, codebooks: np.ndarray, concurrency: int = 4,
              normalize: bool = True):
    """Encode an (vec_id, embedding) Dataset to (vec_id, codes) —
    codes = fixed-size-list<uint8>[m_sub], one argmin-L2 per
    subspace, vectorized per batch; codebooks broadcast once.
    ``normalize`` must match the pq_train setting (cosine
    contract)."""
    import ray

    ref = ray.put(np.asarray(codebooks, np.float64))

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(ref)
        m_sub, ksub, dsub = books.shape
        x = _emb_matrix(t)
        if normalize:
            x = _normalize(x)
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        codes = np.empty((len(x), m_sub), np.uint8)
        for j in range(m_sub):
            sub = x[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2
                  ).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m_sub),
        })

    return embeddings.map_batches(enc, batch_format="pyarrow")


def ann_pq_topk(encoded, queries: np.ndarray, query_ids: np.ndarray,
                codebooks: np.ndarray, k: int = 5):
    """ADC top-k over PQ-encoded vectors: per query q and subspace j,
    LUT[j, c] = q_j . books[j, c]; a vector's approximate
    inner-product score is the sum of its code gathers.  Returns
    (qid, vec_id, rank, score) through the shared top-k merge."""
    import ray

    books = np.asarray(codebooks, np.float64)
    m_sub, ksub, dsub = books.shape
    q = np.asarray(queries, np.float64)
    qn = _normalize(q)
    # LUTs: (nq, m_sub, ksub)
    luts = np.einsum("qjd,jkd->qjk",
                     qn.reshape(len(qn), m_sub, dsub), books)
    ref = ray.put((luts, np.asarray(query_ids, np.int64)))

    def probe(t: pa.Table) -> pa.Table:
        luts, qids = ray.get(ref)
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        flat = t.column("codes").combine_chunks().flatten()
        codes = flat.to_numpy(zero_copy_only=False).reshape(
            len(vid), -1)
        jj = np.arange(codes.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(len(luts)):
            s = luts[qi][jj[None, :], codes].sum(axis=1)
            out_q.append(np.full(len(vid), qids[qi], np.int64))
            out_v.append(vid)
            out_s.append(s)
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _topk_merge_by_qid(
        encoded.map_batches(probe, batch_format="pyarrow"), k)

def ann_ivfpq_topk(embeddings, queries: np.ndarray,
                   query_ids: np.ndarray, centroids: np.ndarray,
                   codebooks: np.ndarray, k: int = 5,
                   nprobe: int = 2):
    """IVF-PQ (the IVFADC composition of Jegou et al. 2011 — coarse
    inverted lists + PQ codes): vectors are assigned to their nearest
    coarse centroid and PQ-encoded IN ONE PASS; each query builds its
    ADC lookup tables once and scores only its ``nprobe`` nearest
    lists.  At scale this is the memory-AND-compute path: codes are
    M bytes per vector and each query touches nprobe/k_coarse of the
    corpus.  Direct (non-residual) encoding — the same codebooks
    serve every list; the residual refinement is a documented
    non-goal.  Returns (qid, vec_id, rank, score)."""
    import ray

    C = _normalize(np.asarray(centroids, np.float64))
    books = np.asarray(codebooks, np.float64)
    m_sub, ksub, dsub = books.shape
    qn = _normalize(np.asarray(queries, np.float64))
    qlists = np.argsort(-(qn @ C.T), axis=1, kind="stable")[:, :nprobe]
    luts = np.einsum("qjd,jkd->qjk",
                     qn.reshape(len(qn), m_sub, dsub), books)
    by_list: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for li in qlists[qi]:
            by_list.setdefault(int(li), []).append(qi)
    ref = ray.put((C, books, luts,
                   np.asarray(query_ids, np.int64), by_list))

    def probe(t: pa.Table) -> pa.Table:
        C, books, luts, qids, by_list = ray.get(ref)
        m_sub, ksub, dsub = books.shape
        x = _normalize(_emb_matrix(t))
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        assign = np.argmax(x @ C.T, axis=1)
        codes = np.empty((len(x), m_sub), np.int64)
        for j in range(m_sub):
            sub = x[:, j * dsub:(j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2
                  ).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        jj = np.arange(m_sub)
        out_q, out_v, out_s = [], [], []
        for li, qis in by_list.items():
            rows = np.flatnonzero(assign == li)
            if len(rows) == 0:
                continue
            sub_codes = codes[rows]
            for qi in qis:
                s = luts[qi][jj[None, :], sub_codes].sum(axis=1)
                out_q.append(np.full(len(rows), qids[qi], np.int64))
                out_v.append(vid[rows])
                out_s.append(s)
        if not out_q:
            return pa.table({
                "qid": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _topk_merge_by_qid(
        embeddings.map_batches(probe, batch_format="pyarrow"), k)



# ------------------------------------------- scalar quantization (SQ8)


def sq8_encode(embeddings, col: str = "embedding",
               concurrency: int = 4):
    """Int8 scalar quantization — the 4x memory-compression path
    between full floats and PQ (FAISS's SQ8 analog): per-vector
    symmetric scale ``s = max|x| / 127``, codes ``q_i = round(x_i /
    s)`` with the engine's floor(x+0.5) rounding.  Emits (vec_id,
    codes int8-list, scale) rows; exactly-zero vectors carry scale 0
    and all-zero codes.  Vectorized over the whole batch."""

    def fn(t: pa.Table) -> pa.Table:
        m = _emb_matrix(t, col)
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        amax = np.abs(m).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        q = np.clip(np.floor(m / safe[:, None] + 0.5), -127,
                    127).astype(np.int8)
        q[scale == 0] = 0
        d = m.shape[1]
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1), pa.int8()), d),
            "scale": pa.array(scale, pa.float64()),
        })

    return embeddings.map_batches(fn, batch_format="pyarrow")


def ann_sq8_topk(encoded, queries: np.ndarray, query_ids: np.ndarray,
                 k: int = 5):
    """Exact-shape top-k cosine over SQ8 codes: per batch the int8
    code matrix decodes to ``codes * scale`` (float64, zero-copy
    flatten) and scores against the broadcast normalized query
    matrix — same partial+merge shape as :func:`ann_cosine_topk`, a
    quarter the stored bytes.  Returns (qid, vec_id, rank, score)."""
    import ray

    qn = _normalize(np.asarray(queries, np.float64))
    ref = ray.put((qn, np.asarray(query_ids, np.int64)))

    def partial(t: pa.Table) -> pa.Table:
        qn, qids = ray.get(ref)
        codes = t.column("codes")
        d = codes.type.list_size
        flat = np.asarray(codes.combine_chunks().flatten(),
                          dtype=np.float64).reshape(-1, d)
        scale = t.column("scale").to_numpy(zero_copy_only=False)
        m = _normalize(flat * scale[:, None])
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        scores = m @ qn.T
        kk = min(k, scores.shape[0])
        top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
        out_q, out_v, out_s = [], [], []
        for qi in range(scores.shape[1]):
            rows = top[:, qi]
            out_q.append(np.full(len(rows), qids[qi], dtype=np.int64))
            out_v.append(vid[rows])
            out_s.append(scores[rows, qi])
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    return _topk_merge_by_qid(
        encoded.map_batches(partial, batch_format="pyarrow"), k)
