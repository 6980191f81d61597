"""Reference implementations for the text-sketch queries (q17/q18/q20).

Single-process, separately-coded implementations of the operator
SPECS (datasketch-style MinHash+banded-LSH, Charikar SimHash, FNV
rolling-window fingerprint).  Algorithm PARAMETERS (seeds, perm
counts, band layout) are part of each operator's definition and are
shared with the engine; the code computing them is not.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

M64 = (1 << 64) - 1
MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str) -> pd.DataFrame:
    return (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _norm(text: str) -> str:
    return " ".join((text or "").lower().split())


# ------------------------------------------------------------- q17 minhash


def _shingle_set(text: str, k: int = 5) -> np.ndarray:
    t = _norm(text)
    if len(t) < k:
        t = t.ljust(k, "_")
    buf = t.encode("utf-8", "replace")
    assert len(buf) == len(t), "reference fixture text must be ascii"
    seen = set()
    for i in range(len(t) - k + 1):
        h = 0
        for ch in buf[i : i + k]:
            h = (h * 257 + ch) & M64
        seen.add(h)
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))


def q17_minhash(sf_dir: str, num_perm: int = 64, bands: int = 8,
                threshold: float = 0.5) -> pd.DataFrame:
    docs = _docs(sf_dir)
    rng = np.random.RandomState(42)
    a = rng.randint(1, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    n = len(docs)
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    for i, txt in enumerate(docs["text"]):
        sh = _shingle_set(txt)
        for p in range(num_perm):
            vals = (a[p] * sh + b[p]) % np.uint64(MERSENNE)
            sigs[i, p] = vals.min()
    rows = num_perm // bands
    seg = sigs.reshape(n, bands, rows)
    ids = docs["doc_id"].to_numpy()
    out_a, out_b, out_j = [], [], []
    order = np.argsort(ids, kind="mergesort")
    for ii in range(n):
        i = order[ii]
        for jj in range(ii + 1, n):
            j = order[jj]
            band_eq = (seg[i] == seg[j]).all(axis=1)
            if not band_eq.any():
                continue
            est = float((sigs[i] == sigs[j]).mean())
            if est >= threshold:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_j.append(est)
    return pd.DataFrame(
        {
            "doc_a": np.asarray(out_a, np.int64),
            "doc_b": np.asarray(out_b, np.int64),
            "est_jaccard": np.asarray(out_j, np.float64),
        }
    )


# ------------------------------------------------------------- q18 simhash


def _simhash(text: str) -> int:
    toks = (text or "").lower().split()
    if not toks:
        return 0
    counts = np.zeros(64, dtype=np.int64)
    for w in toks:
        h = int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16)
        for bit in range(64):
            counts[bit] += (h >> bit) & 1
    val = 0
    for bit in range(64):
        if counts[bit] * 2 >= len(toks):
            val |= 1 << bit
    return int(np.uint64(val).astype(np.int64))


def _popcount64(x: int) -> int:
    return bin(x & M64).count("1")


def q18_simhash(sf_dir: str, max_hamming: int = 3, bands: int = 4) -> pd.DataFrame:
    docs = _docs(sf_dir)
    ids = docs["doc_id"].to_numpy()
    sh = np.asarray([_simhash(t) for t in docs["text"]], dtype=np.int64)
    width = 64 // bands
    mask = (1 << width) - 1
    out_a, out_b, out_h = [], [], []
    n = len(ids)
    order = np.argsort(ids, kind="mergesort")
    for ii in range(n):
        i = order[ii]
        hi = int(np.uint64(sh[i]))
        for jj in range(ii + 1, n):
            j = order[jj]
            hj = int(np.uint64(sh[j]))
            hd = _popcount64(hi ^ hj)
            if hd > max_hamming:
                continue
            shares = any(
                ((hi >> (width * bb)) & mask) == ((hj >> (width * bb)) & mask)
                for bb in range(bands)
            )
            if shares:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_h.append(hd)
    return pd.DataFrame(
        {
            "doc_a": np.asarray(out_a, np.int64),
            "doc_b": np.asarray(out_b, np.int64),
            "hamming": np.asarray(out_h, np.int64),
        }
    )


# --------------------------------------------------------- q20 fingerprint


def q20_fingerprint(sf_dir: str, k: int = 16) -> pd.DataFrame:
    FNV = 1099511628211
    docs = _docs(sf_dir)
    out = np.empty(len(docs), dtype=np.int64)
    for i, txt in enumerate(docs["text"]):
        norm = _norm(txt)
        if len(norm) < k:
            norm = norm.ljust(k, "_")
        buf = norm.encode("utf-8", "replace")
        best = None
        for s in range(len(buf) - k + 1):
            h = 0
            for ch in buf[s : s + k]:
                h = (h * FNV + ch) & M64
            if best is None or h < best:
                best = h
        out[i] = int(np.uint64(best).astype(np.int64))
    return pd.DataFrame(
        {"doc_id": docs["doc_id"].to_numpy(np.int64), "fingerprint": out}
    )


def q17_jaccard(sf_dir: str, num_perm: int = 64, bands: int = 8,
                threshold: float = 0.5) -> pd.DataFrame:
    """Exact n-gram Jaccard near-dup golden: the SAME banded-LSH
    candidate rule as q17_minhash, but the verify is the exact
    shingle-set Jaccard |A n B| / |A u B| (python set ops — the engine
    uses sorted-array intersection; one float division on identical
    integer operands, so bit-equal)."""
    docs = _docs(sf_dir)
    rng = np.random.RandomState(42)
    a = rng.randint(1, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    n = len(docs)
    shs = [set(_shingle_set(txt).tolist()) for txt in docs["text"]]
    sigs = np.empty((n, num_perm), dtype=np.uint64)
    for i in range(n):
        sh = np.fromiter(shs[i], dtype=np.uint64, count=len(shs[i]))
        for p in range(num_perm):
            sigs[i, p] = ((a[p] * sh + b[p]) % np.uint64(MERSENNE)).min()
    rows = num_perm // bands
    seg = sigs.reshape(n, bands, rows)
    ids = docs["doc_id"].to_numpy()
    order = np.argsort(ids, kind="mergesort")
    out_a, out_b, out_j = [], [], []
    for ii in range(n):
        i = order[ii]
        for jj in range(ii + 1, n):
            j = order[jj]
            if not (seg[i] == seg[j]).all(axis=1).any():
                continue
            ni = len(shs[i] & shs[j])
            jac = ni / (len(shs[i]) + len(shs[j]) - ni)
            if jac >= threshold:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[j]))
                out_j.append(jac)
    return pd.DataFrame(
        {
            "doc_a": np.asarray(out_a, np.int64),
            "doc_b": np.asarray(out_b, np.int64),
            "jaccard": np.asarray(out_j, np.float64),
        }
    )


def q17_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-dup clustering golden: single-process union-find (path
    halving, min-id root) over the exact-Jaccard pairs, one row per
    document (doc_id, rep, csize); singletons map to themselves.
    Independent of the engine's distributed min-label-propagation /
    one-task-CC implementation."""
    ja = q17_jaccard(sf_dir)
    docs = _docs(sf_dir)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(ja["doc_a"], ja["doc_b"]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    ids = [int(v) for v in docs["doc_id"]]
    reps = [find(i) for i in ids]
    from collections import Counter

    sizes = Counter(reps)
    return pd.DataFrame(
        {
            "doc_id": np.asarray(ids, np.int64),
            "rep": np.asarray(reps, np.int64),
            "csize": np.asarray([sizes[r] for r in reps], np.int64),
        }
    )


def q17_neardup_pairs(sf_dir: str) -> pd.DataFrame:
    """Combined near-dup pair suite: minhash pairs (score = estimated
    Jaccard) + simhash pairs (score = Hamming distance) + exact n-gram
    Jaccard pairs + per-document 'cluster' rows (doc_b = canonical
    representative, score = component size), tagged by ``method`` —
    the oracle of the one registered q17 query."""
    mh = q17_minhash(sf_dir)
    sh = q18_simhash(sf_dir)
    ja = q17_jaccard(sf_dir)
    cl = q17_clusters(sf_dir)
    a = pd.DataFrame(
        {
            "method": "minhash",
            "doc_a": mh["doc_a"],
            "doc_b": mh["doc_b"],
            "score": mh["est_jaccard"].astype(np.float64),
        }
    )
    b = pd.DataFrame(
        {
            "method": "simhash",
            "doc_a": sh["doc_a"],
            "doc_b": sh["doc_b"],
            "score": sh["hamming"].astype(np.float64),
        }
    )
    c = pd.DataFrame(
        {
            "method": "jaccard",
            "doc_a": ja["doc_a"],
            "doc_b": ja["doc_b"],
            "score": ja["jaccard"].astype(np.float64),
        }
    )
    d = pd.DataFrame(
        {
            "method": "cluster",
            "doc_a": cl["doc_id"],
            "doc_b": cl["rep"],
            "score": cl["csize"].astype(np.float64),
        }
    )
    return (
        pd.concat([a, b, c, d], ignore_index=True)
        .sort_values(["method", "doc_a", "doc_b"])
        .reset_index(drop=True)
    )


GOLDENS = {
    "q17_neardup_pairs": (q17_neardup_pairs, ["method", "doc_a", "doc_b"]),
    # 'part_' goldens are not driver-facing oracles themselves; they are
    # composed into combined oracles by pipelines.queries.COMBINED_ORACLES
    "part_fingerprint": (q20_fingerprint, ["doc_id"]),
}
