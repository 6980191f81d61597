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


_HP = 1099511628211  # FNV-1a 64-bit prime (odd -> invertible mod 2^64)
_HPINV = pow(_HP, -1, 1 << 64)
_MASK64 = (1 << 64) - 1


def _splitmix64(z: np.ndarray) -> np.ndarray:
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _content_hash_array(arr: pa.Array) -> np.ndarray:
    """64-bit content hash per row of a string/binary Array — the
    polars vectorized hash kernel (Rust, ~GB/s) when available, else a
    pure-numpy buffer-level path.  Stability contract: hashes are an
    ENGINE-INTERNAL groupby key (exact dedup), equal-content-equal-hash
    within one run is all that is required; they are not persisted.

    Numpy fallback: rolling polynomial h = sum (byte_i + 1) * P^i over
    the row's bytes (P odd, mod 2^64), extracted per row from global
    prefix sums via the modular inverse P^-1, then
    splitmix64-avalanched with the row length.  No Python per-row loop
    (the original version ran hashlib.sha1 row by row)."""
    try:
        import polars as pl

        s = pl.from_arrow(arr)
        return s.hash(seed=42).to_numpy().astype(np.uint64)
    except ImportError:
        pass
    n_rows = len(arr)
    if n_rows == 0:
        return np.empty(0, np.uint64)
    big = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odt = np.int64 if big else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + n_rows + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    b = data[lo:hi].astype(np.uint64) + np.uint64(1)
    n = hi - lo
    starts = off[:-1] - lo
    ends = off[1:] - lo
    with np.errstate(over="ignore"):
        w = np.empty(n, np.uint64)  # w[i] = P^(i+1) mod 2^64
        if n:
            np.multiply.accumulate(np.full(n, np.uint64(_HP)), out=w)
        pinv_all = np.empty(n + 1, np.uint64)  # pinv_all[i] = P^-i
        pinv_all[0] = 1
        if n:
            np.multiply.accumulate(
                np.full(n, np.uint64(_HPINV & _MASK64)), out=pinv_all[1:]
            )
        s = np.zeros(n + 1, np.uint64)  # prefix sums of (b+1)*P^(i+1)
        if n:
            np.cumsum(b * w, out=s[1:])
        # start-normalized row hash: sum_j (b_j+1) * P^(j+1)
        raw = (s[ends] - s[starts]) * pinv_all[starts]
        lens = (off[1:] - off[:-1]).astype(np.uint64)
    return _splitmix64(raw ^ _splitmix64(lens))


def add_content_hash(text_col: str = "text", out_col: str = "chash"):
    """Vectorized 64-bit content hash (buffer-level polynomial +
    splitmix64 finalizer; see _content_hash_array)."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        parts = [_content_hash_array(c) for c in t.column(text_col).chunks]
        hs = np.concatenate(parts).view(np.int64)
        return t.append_column(out_col, pa.array(hs, pa.int64()))

    fn.__name__ = "add_content_hash"
    return fn


def exact_dedup(ds, content_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 64):
    """Keep the min-id row per identical content.

    Scale shape: groupby a HASH PART of the content hash (one
    vectorized group call per partition), then a lexsort first-per-key
    inside the partition — NOT groupby(chash).map_groups, which costs
    one Python+pandas call per distinct document (at corpus scale that
    is one call per surviving row)."""
    hashed = ds.map_batches(add_content_hash(content_col), batch_format="pyarrow")

    def add_part(t: pa.Table) -> pa.Table:
        ch = t.column("chash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ch = (ch ^ (ch >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        ch = ch ^ (ch >> np.uint64(33))
        return t.append_column(
            "__dpart",
            pa.array((ch % np.uint64(num_partitions)).astype(np.int64),
                     pa.int64()),
        )

    def part_first(g: pa.Table) -> pa.Table:
        ch = g.column("chash").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ch))  # by content hash, then id
        first = np.concatenate([[True], ch[order][1:] != ch[order][:-1]])
        return g.take(pa.array(order[first], pa.int64()))

    return (
        hashed.map_batches(add_part, batch_format="pyarrow")
        .groupby("__dpart")
        .map_groups(part_first, batch_format="pyarrow")
        .drop_columns(["chash", "__dpart"])
    )


# ------------------------------------------------------- MinHash + LSH


class MinHasher:
    """Actor-pool stage: per-doc MinHash signature over char shingles.

    Stateful setup (permutation parameters) happens once per actor in
    __init__; per-batch work is vectorized over each doc's shingle set.
    """

    MERSENNE = (1 << 61) - 1

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                 emit_shingles: bool = False):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, self.MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, self.MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.num_perm = num_perm
        self.k = shingle_k
        self.emit_shingles = emit_shingles

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
        # (P, S) permuted mins mod mersenne prime
        return self._sig_of(self._shingle_hashes(text))

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        if self.emit_shingles:
            sh_sets = [self._shingle_hashes(x or "") for x in texts]
            sigs = np.stack([self._sig_of(sh) for sh in sh_sets])
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "sig": pa.array(
                        list(sigs.astype(np.uint64)), pa.list_(pa.uint64())
                    ),
                    # sorted unique shingle hashes, fixed-width binary
                    # (acero joins reject list payloads)
                    "sh": pa.array([s.tobytes() for s in sh_sets], pa.binary()),
                }
            )
        sigs = np.stack([self.signature(x or "") for x in texts])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array(list(sigs.astype(np.uint64)), pa.list_(pa.uint64())),
            }
        )

    def _sig_of(self, sh: np.ndarray) -> np.ndarray:
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(
            self.MERSENNE
        )
        return v.min(axis=1)


def minhash_lsh_pairs(
    docs,
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.7,
    concurrency: int = 4,
    max_bucket: int = 4096,
    exact_shingles: bool = False,
    return_stats: bool = False,
):
    """Near-dup pairs via banded LSH, verified with the signature-
    estimated Jaccard.  Returns (doc_a, doc_b, est_jaccard), doc_a <
    doc_b, each pair once.

    ``exact_shingles=True`` is the n-gram-Jaccard variant: the SAME
    banded candidate generation, but the verify step joins back each
    side's full sorted-unique shingle-hash set and computes the EXACT
    Jaccard |A n B| / |A u B| (sorted-array intersection), returning
    (doc_a, doc_b, jaccard).  Only candidate-pair docs ever ship their
    shingle sets, and only through the two hash joins.

    Scale shape (round-2 rework): the band explosion ships ONLY
    (doc_id, band, band-hash) through the shuffle — never the full
    signature (8x less volume than round 1); candidate pairs from the
    bucket groupby are DISTINCT-ed, then the two signatures are
    attached back with hash joins for the vectorized verify step.
    Buckets larger than ``max_bucket`` (degenerate content — e.g.
    millions of empty or boilerplate docs landing in one band hash) are
    truncated to the ``max_bucket`` smallest doc_ids, bounding every
    bucket at O(max_bucket^2) pair work instead of O(n^2).

    ``return_stats=True`` also returns a truncation Dataset of the
    OVERFLOWING (band, band-hash) buckets only — (band, bh,
    n_in_bucket, n_dropped) — so capped work is visible, never silent
    (the no-silent-caps discipline; empty at healthy corpora, so the
    stats table stays tiny at any scale).
    """
    from .polygonize import _materialize_detached

    rows = num_perm // bands
    sigs = _materialize_detached(
        docs.map_batches(
            MinHasher,
            fn_constructor_kwargs=dict(
                num_perm=num_perm, emit_shingles=exact_shingles
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=1024,
        )
    )
    score_col = "jaccard" if exact_shingles else "est_jaccard"

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sig = np.stack(t.column("sig").to_pylist()).astype(np.uint64)
        out_id, out_band, out_bh = [], [], []
        for b in range(bands):
            seg = sig[:, b * rows : (b + 1) * rows]
            bh = seg[:, 0].copy()
            for j in range(1, rows):
                bh = bh * np.uint64(1000003) + seg[:, j]
            out_id.append(ids)
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_bh.append(bh.astype(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "bh": pa.array(np.concatenate(out_bh), pa.int64()),
            }
        )

    exploded = sigs.select_columns(["doc_id", "sig"]).map_batches(
        explode_bands, batch_format="pyarrow"
    )

    # candidate pairs per bucket, grouped by a hash PART of the bucket
    # key (buckets are mostly singletons; one Python call per bucket
    # would dominate at corpus scale — same lesson as _banded_hash_pairs)
    n_cand_parts = 64

    def add_bpart(t: pa.Table) -> pa.Table:
        bh = t.column("bh").to_numpy(zero_copy_only=False).astype(np.uint64)
        bd = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = bh * np.uint64(1000003) + bd
        key = (key ^ (key >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        part = ((key ^ (key >> np.uint64(33)))
                % np.uint64(n_cand_parts)).astype(np.int64)
        return t.append_column("__bpart", pa.array(part, pa.int64()))

    def bucket_pairs_part(g: pa.Table) -> pa.Table:
        band_a = g.column("band").to_numpy(zero_copy_only=False)
        bh_a = g.column("bh").to_numpy(zero_copy_only=False)
        ids_a = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_a, bh_a, band_a))
        bs, ks, ids_s = band_a[order], bh_a[order], ids_a[order]
        new = np.concatenate(
            [[True], (bs[1:] != bs[:-1]) | (ks[1:] != ks[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        acc_a: list = []
        acc_b: list = []
        for b0, b1 in zip(starts, ends):
            if b1 - b0 < 2:
                continue
            ids = ids_s[b0:b1]  # already id-sorted within the bucket
            if len(ids) > max_bucket:
                ids = ids[:max_bucket]
            iu, ju = np.triu_indices(len(ids), 1)
            acc_a.append(ids[iu])
            acc_b.append(ids[ju])
        if not acc_a:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(acc_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(acc_b), pa.int64()),
            }
        )

    from ray.data.aggregate import Count

    cand = (
        exploded.map_batches(add_bpart, batch_format="pyarrow")
        .groupby("__bpart")
        .map_groups(bucket_pairs_part, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="__n"))
        .drop_columns(["__n"])
    )
    cand = _materialize_detached(cand)
    n_cand = cand.count()
    if n_cand == 0:
        empty = cand.map_batches(
            lambda t: t.append_column(score_col, pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
        if not return_stats:
            return empty
        return empty, _bucket_overflow_stats(exploded, "band", "bh",
                                             max_bucket)
    parts = max(1, n_cand // 50_000)

    def _sig_as(key: str):
        # acero joins reject list-typed payload columns: carry the
        # signature (or exact shingle set) as binary instead
        src = "sh" if exact_shingles else "sig"

        def fn(t: pa.Table) -> pa.Table:
            if exact_shingles:
                payload = t.column("sh")
            else:
                sig = np.stack(t.column("sig").to_pylist()).astype(np.uint64)
                payload = pa.array([s.tobytes() for s in sig], pa.binary())
            return pa.table(
                {
                    key: t.column("doc_id"),
                    f"sig_{key[-1]}": payload,
                }
            )

        fn.__name__ = f"{src}_{key}"
        return fn

    witha = cand.join(
        sigs.map_batches(_sig_as("doc_a"), batch_format="pyarrow"),
        join_type="inner", num_partitions=parts, on=("doc_a",),
    )
    withb = witha.join(
        sigs.map_batches(_sig_as("doc_b"), batch_format="pyarrow"),
        join_type="inner", num_partitions=parts, on=("doc_b",),
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    score_col: pa.array([], pa.float64()),
                }
            )
        if exact_shingles:
            blobs_a = t.column("sig_a").to_pylist()
            blobs_b = t.column("sig_b").to_pylist()
            est = np.empty(t.num_rows, np.float64)
            for i, (ba, bb) in enumerate(zip(blobs_a, blobs_b)):
                A = np.frombuffer(ba, dtype=np.uint64)
                B = np.frombuffer(bb, dtype=np.uint64)
                ni = len(np.intersect1d(A, B, assume_unique=True))
                est[i] = ni / (len(A) + len(B) - ni)
        else:
            sa = np.frombuffer(b"".join(t.column("sig_a").to_pylist()), dtype=np.uint64).reshape(t.num_rows, -1)
            sb = np.frombuffer(b"".join(t.column("sig_b").to_pylist()), dtype=np.uint64).reshape(t.num_rows, -1)
            est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "doc_a": t.column("doc_a").filter(pa.array(keep)),
                "doc_b": t.column("doc_b").filter(pa.array(keep)),
                score_col: pa.array(est[keep], pa.float64()),
            }
        )

    pairs = withb.map_batches(verify, batch_format="pyarrow")
    if not return_stats:
        return pairs
    return pairs, _bucket_overflow_stats(exploded, "band", "bh", max_bucket)


def _bucket_overflow_stats(exploded, band_col: str, bh_col: str,
                           max_bucket: int):
    """Overflowing LSH buckets as (band, bh, n_in_bucket, n_dropped)
    rows — only buckets beyond the cap are emitted, so the stats table
    is tiny unless the corpus is degenerate."""
    from ray.data.aggregate import Count

    def overflow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.column("count()").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(n > max_bucket))
        n = n[n > max_bucket]
        return pa.table(
            {
                "band": pc.cast(t.column(band_col), pa.int64()),
                "bh": t.column(bh_col),
                "n_in_bucket": pa.array(n.astype(np.int64), pa.int64()),
                "n_dropped": pa.array(
                    (n - max_bucket).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        exploded.groupby([band_col, bh_col])
        .aggregate(Count())
        .map_batches(overflow, batch_format="pyarrow")
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


try:
    _popcount64_vec = np.bitwise_count  # numpy >= 2.0
except AttributeError:  # pragma: no cover
    _PCTABLE = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)

    def _popcount64_vec(x):
        x = np.asarray(x, np.uint64)
        return (
            _PCTABLE[x & np.uint64(0xFFFF)]
            + _PCTABLE[(x >> np.uint64(16)) & np.uint64(0xFFFF)]
            + _PCTABLE[(x >> np.uint64(32)) & np.uint64(0xFFFF)]
            + _PCTABLE[(x >> np.uint64(48)) & np.uint64(0xFFFF)]
        )


def _banded_hash_pairs(
    ds, id_col: str, hash_col: str, out_a: str, out_b: str,
    max_hamming: int, bands: int, max_bucket: int, id_is_string: bool,
    return_stats: bool = False,
):
    """Shared scale path for 64-bit-hash near-dup (simhash / phash):
    explode to (id, hash, band, band-hash) -> ONE groupby on a hash
    PART of the bucket key (buckets are mostly singletons, so grouping
    by the bucket itself would cost one Python call per bucket) ->
    per-partition bucket runs, each verified with VECTORIZED all-pairs
    Hamming (matrix xor + popcount), first-shared-band dedup, buckets
    capped at ``max_bucket`` smallest ids (bounded degenerate-content
    work).  ``return_stats=True`` also returns the overflowing-bucket
    truncation Dataset (see :func:`_bucket_overflow_stats`)."""
    id_ty = pa.string() if id_is_string else pa.int64()
    num_partitions = 64

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        ph = t.column(hash_col).to_numpy(zero_copy_only=False)
        bnd = phash_bands(ph, n_bands=bands)
        rep = pa.concat_arrays([ids.combine_chunks()] * bands)
        bh = np.concatenate([bnd[:, b] for b in range(bands)])
        band_a = np.repeat(np.arange(bands, dtype=np.int32), len(ph))
        key = bh.astype(np.uint64) * np.uint64(1000003) + band_a.astype(
            np.uint64
        )
        key = (key ^ (key >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        part = ((key ^ (key >> np.uint64(33)))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table(
            {
                "id": rep.cast(id_ty),
                "hash": pa.array(np.tile(ph, bands), pa.int64()),
                "band": pa.array(band_a),
                "bh": pa.array(bh, pa.int64()),
                "__bpart": pa.array(part, pa.int64()),
            }
        )

    def pairs_part(g: pa.Table) -> pa.Table:
        band_a = g.column("band").to_numpy(zero_copy_only=False)
        bh_a = g.column("bh").to_numpy(zero_copy_only=False)
        order = np.lexsort((bh_a, band_a))
        bs, hs_k = band_a[order], bh_a[order]
        new = np.concatenate(
            [[True], (bs[1:] != bs[:-1]) | (hs_k[1:] != hs_k[:-1])]
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(order))
        ids_all = np.asarray(g.column("id").to_pylist(), dtype=object)
        hs_all = g.column("hash").to_numpy(zero_copy_only=False)
        acc_a: list = []
        acc_b: list = []
        acc_h: list = []
        for b0, b1 in zip(starts, ends):
            if b1 - b0 < 2:
                continue
            rows = order[b0:b1]
            ids = ids_all[rows]
            hs = hs_all[rows]
            o = np.argsort(ids, kind="mergesort")
            ids, hs = ids[o], hs[o]
            if len(ids) > max_bucket:
                ids, hs = ids[:max_bucket], hs[:max_bucket]
            band = int(bs[b0])
            u = hs.astype(np.int64).astype(np.uint64)
            hd = _popcount64_vec(u[:, None] ^ u[None, :]).astype(np.int64)
            iu, ju = np.triu_indices(len(ids), 1)
            hit = hd[iu, ju] <= max_hamming
            iu, ju = iu[hit], ju[hit]
            if len(iu) == 0:
                continue
            same_id = ids[iu] == ids[ju]
            iu, ju = iu[~same_id], ju[~same_id]
            if len(iu) == 0:
                continue
            # first-shared-band dedup, vectorized over surviving pairs
            bnds_all = phash_bands(hs, n_bands=bands)
            eq = bnds_all[iu] == bnds_all[ju]  # (P, bands)
            keep = eq.any(axis=1) & (eq.argmax(axis=1) == band)
            iu, ju = iu[keep], ju[keep]
            if len(iu) == 0:
                continue
            acc_a.extend(ids[iu])
            acc_b.extend(ids[ju])
            acc_h.extend(hd[iu, ju].tolist())
        return pa.table(
            {
                out_a: pa.array(acc_a, id_ty),
                out_b: pa.array(acc_b, id_ty),
                "hamming": pa.array(acc_h, pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    pairs = exploded.groupby("__bpart").map_groups(
        pairs_part, batch_format="pyarrow"
    )
    if not return_stats:
        return pairs
    return pairs, _bucket_overflow_stats(exploded, "band", "bh", max_bucket)


def simhash_pairs(docs, max_hamming: int = 3, bands: int = 4,
                  max_bucket: int = 4096, return_stats: bool = False):
    """Near-dup pairs with Hamming(simhash) <= max_hamming, via 16-bit
    band bucketing (a pair within distance 3 shares >= one of 4
    bands); vectorized bucket pair check with a degenerate-bucket cap
    (``return_stats=True`` surfaces overflowing buckets)."""
    hashed = docs.map_batches(simhash_batch, batch_format="pyarrow")
    return _banded_hash_pairs(
        hashed.select_columns(["doc_id", "simhash"]),
        "doc_id", "simhash", "doc_a", "doc_b",
        max_hamming, bands, max_bucket, id_is_string=False,
        return_stats=return_stats,
    )


# ---------------------------------------------------- image phash near-dup


def phash_neardup_pairs(images, max_hamming: int = 6, bands: int = 4,
                        max_bucket: int = 4096, return_stats: bool = False):
    """Image near-duplicates: groupby 16-bit phash band, vectorized
    within-group Hamming check, capped buckets (engine addition,
    SURVEY.md §2.6 'Near dedup'; ``return_stats=True`` surfaces
    overflowing buckets)."""
    return _banded_hash_pairs(
        images.select_columns(["image_id", "phash"]),
        "image_id", "phash", "id_a", "id_b",
        max_hamming, bands, max_bucket, id_is_string=True,
        return_stats=return_stats,
    )


# ------------------------------------------------- near-dup clustering


def neardup_clusters(pairs, doc_ids, num_partitions: int = 16):
    """Dedup clustering — the 'which rows survive' step of a training-
    data dedup pipeline (engine addition; the reference has no dedup,
    SURVEY.md §2.6): connected components over verified near-dup pairs,
    then a canonical representative for EVERY document.

    ``pairs``: Dataset with ``doc_a``/``doc_b`` (any verified pair
    stream, e.g. ``minhash_lsh_pairs``).  ``doc_ids``: Dataset with
    ``doc_id``.  Returns ``(doc_id, rep, csize)``: ``rep`` is the min
    doc_id of the document's component (singletons map to themselves),
    ``csize`` the component size.  Keep ``doc_id == rep`` to dedup.

    Distributed shape: one connected-components pass (the size-gated
    one-task union-find / pointer-jumped min-label infra shared with
    polygonize), one co-partitioned left-outer join to attach labels,
    one count groupby + join-back for sizes — no driver-side graph.
    """
    import pyarrow.compute as pc

    from ..pipelines import relational as R
    from .polygonize import min_label_components

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.cast(t.column("doc_a"), pa.int64()),
                "b": pc.cast(t.column("doc_b"), pa.int64()),
            }
        )

    def only_ids(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64())})

    ids = doc_ids.map_batches(only_ids, batch_format="pyarrow")
    labels = min_label_components(
        pairs.map_batches(as_edges, batch_format="pyarrow")
    )
    if labels is None:  # no pairs at all: every document is a singleton
        def selfrep(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "rep": t.column("doc_id"),
                    "csize": pa.array(np.ones(n, np.int64)),
                }
            )

        return ids.map_batches(selfrep, batch_format="pyarrow")

    joined = R.copartition_equi_join(
        ids, labels, "doc_id", "node", how="left_outer",
        num_partitions=num_partitions,
    )

    def fill_rep(t: pa.Table) -> pa.Table:
        rep = pc.coalesce(t.column("label"), t.column("doc_id"))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "rep": pc.cast(rep, pa.int64()),
            }
        )

    base = joined.map_batches(fill_rep, batch_format="pyarrow")
    sizes = R.grouped_aggregate(base, ["rep"], [("rep", "count", "csize")])
    return R.copartition_equi_join(
        base, sizes, "rep", "rep", num_partitions=num_partitions
    )


# ------------------------------------- exact-substring (window) dedup


def _fnv1a_tokens(tokens: list[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes, VECTORIZED: FNV-1a over the
    tokens' Unicode code points (Python's builtin hash is salted per
    process and cannot cross workers).  One UTF-32 decode of the
    space-joined token stream gives a flat uint32 array; the
    byte-position loop runs ``max(len(token))`` vectorized passes,
    never a Python loop per character."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(" ".join(tokens).encode("utf-32-le"), "<u4")
    lens = np.fromiter(map(len, tokens), np.int64, len(tokens))
    starts = np.zeros(len(tokens), np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    h = np.full(len(tokens), 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    mlen = int(lens.max()) if len(lens) else 0
    for j in range(mlen):
        m = lens > j
        h[m] = (h[m] ^ cp[starts[m] + j].astype(np.uint64)) * prime
    return h


def duplicate_window_stats(docs, *, window: int = 8,
                           content_col: str = "text",
                           id_col: str = "doc_id",
                           num_partitions: int = 32):
    """Exact-substring duplicate detection by token windows — the
    training-data dedup step of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better") re-expressed
    Ray-Data-first: instead of a corpus-wide suffix array (which
    needs the whole corpus in one address space), every ``window``-
    token span is rolling-hashed and duplicate spans are found by a
    hash-keyed shuffle.

    Scale shape (two bounded shuffles, no corpus materialization):

    1. ``map_batches``: per doc, token hashes (FNV-1a) -> polynomial
       window hashes, emitted as (whash, doc_id, pos) rows; the
       per-doc token count RIDES the row (the q14 ``dl``-rides-along
       precedent) so no third doc-keyed join is needed;
    2. hash-part groupby on ``whash`` (the q13 ``__dpart`` pattern —
       vectorized run-length duplicate marking inside each
       partition, one group call per partition, never per key);
       only duplicate OCCURRENCES survive, so the second exchange
       carries just the duplicated spans;
    3. hash-part groupby on ``doc_id``: per-doc duplicate-window
       count and covered-token total from the sorted positions
       (fixed window length L: covered = sum(min(L, next-pos)) + L
       per run — vectorized island merge).

    Returns a Dataset of (doc_id, n_tokens, dup_windows,
    covered_tokens) for documents carrying >= 1 duplicated window.
    A window counts as duplicated when its token span occurs >= 2
    times anywhere in the corpus (including inside the same doc).
    """
    L = int(window)
    if L < 2:
        raise ValueError("window must be >= 2 tokens")

    def emit_windows(t: pa.Table) -> pa.Table:
        """One vectorized pass over the whole batch: all documents'
        tokens concatenate into a single token-hash stream; window
        hashes roll over the stream in L vector ops, and windows
        crossing a document boundary are masked out (the per-doc
        Python work is only ``str.split`` + list extend)."""
        ids = t.column(id_col).to_pylist()
        texts = t.column(content_col).to_pylist()
        all_toks: list[str] = []
        tok_doc: list[np.ndarray] = []
        tok_start: list[int] = []
        doc_nt: list[int] = []
        doc_ids: list[int] = []
        start = 0
        for did, x in zip(ids, texts):
            toks = (x or "").split()
            nt = len(toks)
            if nt == 0:
                continue
            all_toks.extend(toks)
            doc_ids.append(did)
            doc_nt.append(nt)
            tok_start.append(start)
            start += nt
        empty = pa.table({
            "whash": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
        })
        ntot = len(all_toks)
        n = ntot - L + 1
        if n <= 0:
            return empty
        th = _fnv1a_tokens(all_toks)
        P = np.uint64(1099511628211)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(L):
            h = h * P + th[j:j + n]
        # per-token doc index / position, then boundary masking
        nt_arr = np.asarray(doc_nt, np.int64)
        didx = np.repeat(np.arange(len(doc_nt), dtype=np.int64),
                         nt_arr)
        tpos = np.arange(ntot, dtype=np.int64) - np.repeat(
            np.asarray(tok_start, np.int64), nt_arr)
        valid = didx[:n] == didx[L - 1:]
        if not valid.any():
            return empty
        vi = np.flatnonzero(valid)
        vd = didx[vi]
        return pa.table({
            "whash": pa.array(h[vi].view(np.int64), pa.int64()),
            "doc_id": pa.array(
                np.asarray(doc_ids, np.int64)[vd], pa.int64()),
            "pos": pa.array(tpos[vi], pa.int64()),
            "n_tokens": pa.array(nt_arr[vd], pa.int64()),
        })

    def add_wpart(t: pa.Table) -> pa.Table:
        h = t.column("whash").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        return t.append_column(
            "__wpart", pa.array((h % np.uint64(num_partitions)).astype(np.int64), pa.int64()))

    def mark_dups(g: pa.Table) -> pa.Table:
        h = g.column("whash").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        same_prev = np.concatenate([[False], hs[1:] == hs[:-1]])
        same_next = np.concatenate([hs[:-1] == hs[1:], [False]])
        dup = same_prev | same_next
        keep = order[dup]
        return g.select(["doc_id", "pos", "n_tokens"]).take(
            pa.array(keep, pa.int64()))

    def add_dpart(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        d = (d ^ (d >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        d = d ^ (d >> np.uint64(33))
        return t.append_column(
            "__dpart", pa.array((d % np.uint64(num_partitions)).astype(np.int64), pa.int64()))

    def per_doc(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        pos = g.column("pos").to_numpy(zero_copy_only=False)
        ntk = g.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        ids, pos, ntk = ids[order], pos[order], ntk[order]
        boundary = np.concatenate([[True], ids[1:] != ids[:-1]])
        starts = np.flatnonzero(boundary)
        ends = np.concatenate([starts[1:], [len(ids)]])
        gap = np.empty(len(ids), dtype=np.int64)
        gap[:-1] = np.minimum(L, pos[1:] - pos[:-1])
        gap[ends - 1] = L                    # each run's last window
        csum = np.concatenate([[0], np.cumsum(gap)])
        covered = csum[ends] - csum[starts]
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "n_tokens": pa.array(ntk[starts], pa.int64()),
            "dup_windows": pa.array(ends - starts, pa.int64()),
            "covered_tokens": pa.array(covered, pa.int64()),
        })

    wins = docs.map_batches(emit_windows, batch_format="pyarrow")
    occ = (wins.map_batches(add_wpart, batch_format="pyarrow")
           .groupby("__wpart")
           .map_groups(mark_dups, batch_format="pyarrow"))
    return (occ.map_batches(add_dpart, batch_format="pyarrow")
            .groupby("__dpart")
            .map_groups(per_doc, batch_format="pyarrow"))


def benchmark_window_hashes(texts: list[str], *, window: int = 8
                            ) -> np.ndarray:
    """Sorted unique window hashes of a (small) benchmark text set —
    the broadcast side of :func:`contamination_stats`.  Same
    vectorized hashing as :func:`duplicate_window_stats`, so engine
    membership equals window-text membership (collision-free at
    64 bits)."""
    L = int(window)
    toks_all: list[str] = []
    bounds: list[int] = [0]
    for x in texts:
        toks_all.extend((x or "").split())
        bounds.append(len(toks_all))
    n = len(toks_all) - L + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    th = _fnv1a_tokens(toks_all)
    P = np.uint64(1099511628211)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(L):
        h = h * P + th[j:j + n]
    # mask windows crossing text boundaries
    b = np.asarray(bounds[1:-1], np.int64)
    start_doc = np.searchsorted(b, np.arange(n), side="right")
    end_doc = np.searchsorted(b, np.arange(n) + L - 1, side="right")
    return np.unique(h[start_doc == end_doc])


def contamination_stats(docs, bench_hashes, *, window: int = 8,
                        content_col: str = "text",
                        id_col: str = "doc_id"):
    """Benchmark decontamination — the pre-training hygiene step
    (WMDP/GSM8K-style n-gram overlap checks): flag documents sharing
    any ``window``-token span with a benchmark set.

    Scale shape: the benchmark's window hashes are broadcast ONCE
    (``ray.put`` of the sorted array from
    :func:`benchmark_window_hashes`; pass the ObjectRef — every task
    reads it zero-copy from the object store), and the corpus streams
    through a single ``map_batches`` with NO shuffle: each batch
    hashes its windows vectorized and membership is a single
    ``searchsorted`` probe.  Returns (doc_id, n_tokens,
    matched_windows, first_match_pos) for documents with >= 1 match.
    """
    import ray

    L = int(window)
    if L < 2:
        raise ValueError("window must be >= 2 tokens")
    if not isinstance(bench_hashes, ray.ObjectRef):
        bench_hashes = ray.put(np.asarray(bench_hashes, np.uint64))

    def probe(t: pa.Table) -> pa.Table:
        bh = ray.get(bench_hashes)
        ids = t.column(id_col).to_pylist()
        texts = t.column(content_col).to_pylist()
        all_toks: list[str] = []
        tok_start: list[int] = []
        doc_nt: list[int] = []
        doc_ids: list[int] = []
        start = 0
        for did, x in zip(ids, texts):
            toks = (x or "").split()
            if not toks:
                continue
            all_toks.extend(toks)
            doc_ids.append(did)
            doc_nt.append(len(toks))
            tok_start.append(start)
            start += len(toks)
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "matched_windows": pa.array([], pa.int64()),
            "first_match_pos": pa.array([], pa.int64()),
        })
        ntot = len(all_toks)
        n = ntot - L + 1
        if n <= 0 or len(bh) == 0:
            return empty
        th = _fnv1a_tokens(all_toks)
        P = np.uint64(1099511628211)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(L):
            h = h * P + th[j:j + n]
        nt_arr = np.asarray(doc_nt, np.int64)
        didx = np.repeat(np.arange(len(doc_nt), dtype=np.int64), nt_arr)
        tpos = np.arange(ntot, dtype=np.int64) - np.repeat(
            np.asarray(tok_start, np.int64), nt_arr)
        valid = didx[:n] == didx[L - 1:]
        loc = np.searchsorted(bh, h[:n])
        loc[loc >= len(bh)] = len(bh) - 1
        hit = valid & (bh[loc] == h[:n])
        if not hit.any():
            return empty
        hi = np.flatnonzero(hit)
        hd = didx[hi]
        # per-doc count + first position (hits are in doc order)
        first_mask = np.concatenate([[True], hd[1:] != hd[:-1]])
        starts = np.flatnonzero(first_mask)
        counts = np.diff(np.concatenate([starts, [len(hd)]]))
        return pa.table({
            "doc_id": pa.array(
                np.asarray(doc_ids, np.int64)[hd[starts]], pa.int64()),
            "n_tokens": pa.array(nt_arr[hd[starts]], pa.int64()),
            "matched_windows": pa.array(counts, pa.int64()),
            "first_match_pos": pa.array(tpos[hi[starts]], pa.int64()),
        })

    return docs.map_batches(probe, batch_format="pyarrow")


def dedup_against(ds, snapshot, *, content_col: str = "text",
                  id_col: str = "doc_id", num_partitions: int = 32):
    """Incremental corpus dedup: drop documents whose CONTENT already
    exists in a prior snapshot — the standard between-crawl dedup
    step (new dump vs. the corpus already trained on).

    Scale shape: both sides reduce to 64-bit content hashes
    (vectorized buffer-level hashing), the snapshot side keeps ONLY
    its distinct hash column, and survivors come from one
    co-partitioned ANTI join on the hash — neither corpus is
    broadcast or materialized.  Exact content equality (not near-dup;
    compose with the minhash family for that).  Returns the surviving
    rows of ``ds`` with original columns."""
    from ..pipelines import relational as R

    hashed = ds.map_batches(add_content_hash(content_col),
                            batch_format="pyarrow")
    snap = snapshot.map_batches(
        add_content_hash(content_col), batch_format="pyarrow")

    def only_hash(t: pa.Table) -> pa.Table:
        return t.select(["chash"])

    out = R.copartition_equi_join(
        hashed, snap.map_batches(only_hash, batch_format="pyarrow"),
        "chash", "chash", how="anti", num_partitions=num_partitions)
    return out.drop_columns(["chash"])


def split_by_content(ds, *, content_col: str = "text",
                     fractions: dict[str, float] | None = None,
                     salt: int = 0):
    """Deterministic train/val/test assignment by CONTENT hash — the
    leakage-safe split rule: byte-identical documents always land in
    the SAME split (id- or position-based splits leak duplicates
    across train and eval).  Reuses the vectorized content hash of
    the dedup family; ``salt`` reshuffles the assignment without
    touching the data.  Adds a ``split`` column; fractions must sum
    to 1 (default 98/1/1)."""
    fr = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fr.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {total}, need 1.0")
    names = list(fr)
    bounds = np.cumsum([fr[n] for n in names])

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("split", pa.array([], pa.string()))
        parts = [_content_hash_array(c)
                 for c in t.column(content_col).chunks]
        h = np.concatenate(parts)
        h = _splitmix64(h ^ np.uint64(salt * 0x9E3779B97F4A7C15
                                      & 0xFFFFFFFFFFFFFFFF))
        u = h.astype(np.float64) / float(2**64)
        idx = np.searchsorted(bounds, u, side="right")
        idx = np.minimum(idx, len(names) - 1)
        lab = np.asarray(names, dtype=object)[idx]
        return t.append_column("split",
                               pa.array(lab.tolist(), pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")
