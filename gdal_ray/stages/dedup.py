"""Deduplication stages — exact, MinHash+LSH, SimHash, phash near-dup.

Engine additions beyond the reference (SURVEY.md §2.6: the reference
has no first-class dedup; closest is FID uniqueness).  All stages
follow the mergeable-partial pattern: per-batch vectorized signature
computation in map_batches, then one groupby on the bucket key, then
within-group verification — no driver-side loops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.phash import hamming64, phash_bands

# ------------------------------------------------------------ exact dedup


def add_content_hash(text_col: str = "text", out_col: str = "chash"):
    """Vectorized sha1 content hash (hex, first 16 chars)."""

    def fn(t: pa.Table) -> pa.Table:
        vals = t.column(text_col).to_pylist()
        hs = [hashlib.sha1(v.encode() if isinstance(v, str) else v).hexdigest()[:16] for v in vals]
        return t.append_column(out_col, pa.array(hs, pa.string()))

    fn.__name__ = "add_content_hash"
    return fn


def exact_dedup(ds, content_col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per identical content (hash-partition + per-
    group first; ray_guide 'Exact dedup' pattern)."""
    hashed = ds.map_batches(add_content_hash(content_col), batch_format="pyarrow")

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        hashed.groupby("chash")
        .map_groups(first_per_group, batch_format="pandas")
        .drop_columns(["chash"])
    )


# ------------------------------------------------------- MinHash + LSH


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature over char shingles.

    Stateful setup (permutation parameters) happens once per actor in
    __init__; per-batch work is vectorized over each doc's shingle set.
    """

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, self.MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.num_perm = num_perm
        self.k = shingle_k

    def _shingle_hashes(self, text: str) -> np.ndarray:
        t = " ".join(text.lower().split())
        if len(t) < self.k:
            t = t.ljust(self.k, "_")
        n = len(t) - self.k + 1
        buf = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
        if len(buf) < len(t):  # non-ascii shifted offsets; fall back per-shingle
            hs = {hash(t[i : i + self.k]) & 0xFFFFFFFFFFFF for i in range(n)}
            return np.fromiter(hs, dtype=np.uint64, count=len(hs))
        # rolling polynomial hash, vectorized via cumulative powers
        out = np.zeros(n, dtype=np.uint64)
        for j in range(self.k):
            out = out * np.uint64(257) + buf[j : j + n].astype(np.uint64)
        return np.unique(out)

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingle_hashes(text)
        # (P, S) permuted mins mod mersenne prime
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(self.MERSENNE)
        return v.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = np.stack([self.signature(x or "") for x in texts])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array(list(sigs.astype(np.uint64)), pa.list_(pa.uint64())),
            }
        )


def minhash_lsh_pairs(
    docs,
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.7,
    concurrency: int = 4,
):
    """Near-dup candidate pairs via banded LSH, verified with the
    signature-estimated Jaccard (shingle→minhash→band→bucket groupby →
    within-bucket pairs).  Returns (doc_a, doc_b, est_jaccard), doc_a <
    doc_b, deduped across buckets (a pair is emitted only by its first
    matching band)."""
    rows = num_perm // bands
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=1024,
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sig = np.stack(t.column("sig").to_pylist()).astype(np.uint64)
        out_id, out_band, out_bh, out_sig = [], [], [], []
        for b in range(bands):
            seg = sig[:, b * rows : (b + 1) * rows]
            bh = seg[:, 0].copy()
            for j in range(1, rows):
                bh = bh * np.uint64(1000003) + seg[:, j]
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bh.append(bh.astype(np.int64))
        n = len(ids)
        rep_sig = [s for _ in range(bands) for s in sig]
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "bh": pa.array(np.concatenate(out_bh), pa.int64()),
                "sig": pa.array([list(s) for s in rep_sig], pa.list_(pa.uint64())),
            }
        )

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sig = np.stack(g["sig"].to_numpy()).astype(np.uint64)
        band = int(g["band"].iloc[0])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            eq = (sig[i + 1 :] == sig[i]).mean(axis=1)
            for jj, j_est in enumerate(eq):
                if j_est >= threshold:
                    a, b = int(ids[i]), int(ids[i + 1 + jj])
                    # emit only from the FIRST band where the pair collides
                    seg_eq = np.array(
                        [
                            (sig[i, bb * rows : (bb + 1) * rows]
                             == sig[i + 1 + jj, bb * rows : (bb + 1) * rows]).all()
                            for bb in range(bands)
                        ]
                    )
                    if seg_eq.argmax() == band:
                        out_a.append(a)
                        out_b.append(b)
                        out_j.append(float(j_est))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "est_jaccard": out_j})

    return exploded.groupby(["band", "bh"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )


# ------------------------------------------------------------- SimHash


def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit SimHash over token hashes (vectorized per doc)."""
    texts = t.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.int64)
    for i, txt in enumerate(texts):
        toks = (txt or "").lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.array(
            [int(hashlib.blake2b(w.encode(), digest_size=8).hexdigest(), 16) for w in toks],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0).astype(np.uint64)
        out[i] = int((v << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64).astype(np.int64))
    return t.append_column("simhash", pa.array(out, pa.int64()))


def simhash_pairs(docs, max_hamming: int = 3, bands: int = 4):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, via 16-bit
    band bucketing (a pair within distance 3 shares >= one of 4 bands)."""
    hashed = docs.map_batches(simhash_batch, batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sh = t.column("simhash").to_numpy(zero_copy_only=False)
        bnd = phash_bands(sh, n_bands=bands)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, bands), pa.int64()),
                "simhash": pa.array(np.tile(sh, bands), pa.int64()),
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), len(ids))),
                "bh": pa.array(
                    np.concatenate([bnd[:, b] for b in range(bands)]), pa.int64()
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy()
        band = int(g["band"].iloc[0])
        bnds_all = phash_bands(sh, n_bands=bands)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            hd = hamming64(np.full(len(ids) - i - 1, sh[i]), sh[i + 1 :])
            for jj in np.flatnonzero(hd <= max_hamming):
                j = i + 1 + jj
                if ids[i] == ids[j]:
                    continue
                shared = np.flatnonzero(bnds_all[i] == bnds_all[j])
                if len(shared) and shared[0] == band:  # first-shared-band dedup
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_h.append(int(hd[jj]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": out_h})

    return (
        hashed.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pandas")
    )


# ---------------------------------------------------- image phash near-dup


def phash_neardup_pairs(images, max_hamming: int = 6, bands: int = 4):
    """Image near-duplicates: groupby 16-bit phash band, within-group
    Hamming check (engine addition, SURVEY.md §2.6 'Near dedup')."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("image_id").to_pylist()
        ph = t.column("phash").to_numpy(zero_copy_only=False)
        bnd = phash_bands(ph, n_bands=bands)
        return pa.table(
            {
                "image_id": pa.array(ids * bands, pa.string()),
                "phash": pa.array(np.tile(ph, bands), pa.int64()),
                "band": pa.array(np.repeat(np.arange(bands, dtype=np.int32), len(ids))),
                "bh": pa.array(
                    np.concatenate([bnd[:, b] for b in range(bands)]), pa.int64()
                ),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.sort_values("image_id")
        ids = g["image_id"].to_numpy()
        ph = g["phash"].to_numpy()
        band = int(g["band"].iloc[0])
        bnds_all = phash_bands(ph, n_bands=bands)
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            hd = hamming64(np.full(len(ids) - i - 1, ph[i]), ph[i + 1 :])
            for jj in np.flatnonzero(hd <= max_hamming):
                j = i + 1 + jj
                if ids[i] == ids[j]:
                    continue
                shared = np.flatnonzero(bnds_all[i] == bnds_all[j])
                if len(shared) and shared[0] == band:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_h.append(int(hd[jj]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    return (
        images.select_columns(["image_id", "phash"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pandas")
    )
