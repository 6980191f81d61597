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

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return (
        embeddings.map_batches(partial, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final, batch_format="pandas")
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

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g

    return (
        bucketed.map_batches(probe, batch_format="pyarrow")
        .groupby("qid")
        .map_groups(final, batch_format="pandas")
    )


def embedding_neardup_pairs(embeddings, threshold: float = 0.95, n_planes: int = 10,
                            max_bucket: int = 4096):
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact
    within-bucket verification.  Returns (id_a, id_b, score).
    Buckets beyond ``max_bucket`` vectors are truncated to the smallest
    vec_ids (bounded O(cap^2) similarity work per degenerate bucket);
    the pair matrix is evaluated in row chunks, never materializing an
    O(n^2) triangle index."""

    def first_dim(t: pa.Table) -> int:
        return len(t.column("embedding")[0].as_py())

    import ray.data as rd  # noqa: F401

    # peek dim from the first batch lazily inside the bucketer factory
    sample = embeddings.take(1)[0]
    dim = len(sample["embedding"])
    bucketed = embeddings.map_batches(
        LSHBucketer,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=2,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "score": pd.Series([], dtype=np.float64),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values("vec_id")
        if len(g) > max_bucket:
            g = g.head(max_bucket)
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        chunk = max(1, 20_000_000 // max(n, 1))  # ~160MB of scores max
        for lo in range(0, n, chunk):
            hi = min(n, lo + chunk)
            s = m[lo:hi] @ m.T  # (hi-lo, n)
            ri, ci = np.nonzero(s >= threshold)
            keep = (ri + lo) < ci  # upper triangle only
            out_a.append(ids[ri[keep] + lo])
            out_b.append(ids[ci[keep]])
            out_s.append(s[ri[keep], ci[keep]])
        if not out_a or not len(np.concatenate(out_a)):
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a).astype(np.int64),
                "id_b": np.concatenate(out_b).astype(np.int64),
                "score": np.concatenate(out_s).astype(np.float64),
            }
        )

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
