"""Degenerate-bucket bounds for the dedup/ANN family (round-2 fix)."""

import time

import numpy as np
import pyarrow as pa


def test_phash_degenerate_bucket_bounded(ray_session):
    """A bucket of 100k IDENTICAL hashes (worst case: O(n^2) without a
    cap) completes in bounded time with the cap and emits only
    cap-bounded pairs."""
    import ray.data as rd

    from gdal_ray.stages.dedup import phash_neardup_pairs

    n = 100_000
    ids = [f"img{i:08d}" for i in range(n)]
    t = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "phash": pa.array(np.full(n, 12345, np.int64), pa.int64()),
        }
    )
    t0 = time.time()
    cap = 100
    out = phash_neardup_pairs(rd.from_arrow(t), max_bucket=cap)
    n_pairs = out.count()
    wall = time.time() - t0
    assert n_pairs == cap * (cap - 1) // 2  # pairs among the cap smallest ids
    assert wall < 120  # uncapped would be ~5e9 pair checks

def test_simhash_cap_does_not_change_small_results(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dedup import simhash_pairs

    texts = ["the quick brown fox jumps"] * 3 + ["completely different words here"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = simhash_pairs(rd.from_arrow(t)).to_pandas().sort_values(["doc_a", "doc_b"])
    b = simhash_pairs(rd.from_arrow(t), max_bucket=2048).to_pandas().sort_values(
        ["doc_a", "doc_b"]
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert len(a) == 3  # the 3 identical docs pair up


def test_embedding_neardup_cap(ray_session):
    import ray.data as rd

    from gdal_ray.stages.ann import embedding_neardup_pairs

    n, d = 3000, 16
    emb = np.tile(np.ones(d), (n, 1)) + 0.0  # all identical -> one bucket
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb],
                                  pa.list_(pa.float64())),
        }
    )
    cap = 50
    out, stats = embedding_neardup_pairs(
        rd.from_arrow(t), threshold=0.9, bands=2, planes_per_band=4,
        max_bucket=cap, return_stats=True,
    )
    # identical vectors share every band's bucket: pairs are emitted in
    # band 0 only (first-shared-band), capped to the smallest 50 ids
    assert out.count() == cap * (cap - 1) // 2
    sdf = stats.to_pandas()
    # truncation is reported, never silent: both bands overflow
    assert (sdf["n_in_bucket"] == 3000).all()
    assert (sdf["n_dropped"] == 3000 - cap).all()
    assert len(sdf) == 2


def test_ivf_recall_against_exact(ray_session):
    """IVF with nprobe=4 of 8 lists recalls most exact top-5 neighbors
    on a random corpus (sanity: the inverted-list path works)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages.ann import (
        ann_cosine_topk,
        ann_ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((400, 16))
    ids = np.arange(400)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [list(v) for v in emb]}))
    queries, qids = emb[:4], ids[:4]
    C = kmeans_centroids(emb[:128], k=8, iters=10)
    ivf = ann_ivf_topk(ds, queries, qids, C, k=5, nprobe=4).to_pandas()
    exact = ann_cosine_topk(ds, queries, qids, k=5).to_pandas()
    hits = 0
    for q in qids:
        got = set(ivf[ivf.qid == q].vec_id)
        want = set(exact[exact.qid == q].vec_id)
        hits += len(got & want)
    assert hits >= 12  # >=60% recall across the 20 exact pairs


def test_phash_truncation_stats_surface_overflow(ray_session):
    """return_stats=True reports exactly the overflowing buckets with
    their dropped counts (no-silent-caps), and nothing on healthy
    corpora."""
    import ray.data as rd

    from gdal_ray.stages.dedup import phash_neardup_pairs

    n, cap = 500, 100
    ids = [f"img{i:04d}" for i in range(n)]
    t = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "phash": pa.array(np.full(n, 777, np.int64), pa.int64()),
        }
    )
    pairs, stats = phash_neardup_pairs(
        rd.from_arrow(t), max_bucket=cap, return_stats=True
    )
    sdf = stats.to_pandas()
    # identical hashes: all 4 bands overflow with the same counts
    assert len(sdf) == 4
    assert (sdf.n_in_bucket == n).all()
    assert (sdf.n_dropped == n - cap).all()
    assert pairs.count() == cap * (cap - 1) // 2
    # healthy corpus -> empty stats
    t2 = pa.table(
        {
            "image_id": pa.array(ids[:50], pa.string()),
            "phash": pa.array(np.arange(50) * 1_000_003, pa.int64()),
        }
    )
    _, stats2 = phash_neardup_pairs(
        rd.from_arrow(t2), max_bucket=cap, return_stats=True
    )
    assert stats2.count() == 0


def test_minhash_truncation_stats(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dedup import minhash_lsh_pairs

    n, cap = 300, 50
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(["same boilerplate text here"] * n, pa.string()),
        }
    )
    pairs, stats = minhash_lsh_pairs(
        rd.from_arrow(t), max_bucket=cap, return_stats=True
    )
    sdf = stats.to_pandas()
    assert len(sdf) == 8  # all 8 bands overflow (identical signatures)
    assert (sdf.n_in_bucket == n).all()
    assert (sdf.n_dropped == n - cap).all()
    assert pairs.count() == cap * (cap - 1) // 2


def test_minhash_return_stats_zero_candidates(ray_session):
    """return_stats keeps the (pairs, stats) contract when NO candidate
    pairs exist (the regression: the n_cand==0 early return used to
    hand back a bare Dataset)."""
    import ray.data as rd

    from gdal_ray.stages.dedup import minhash_lsh_pairs

    rng = np.random.default_rng(13)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    texts = ["".join(rng.choice(alphabet, 400)) for _ in range(8)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(8), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pairs, stats = minhash_lsh_pairs(
        rd.from_arrow(t), return_stats=True
    )
    assert pairs.count() == 0
    assert stats.count() == 0


def test_duplicate_window_stats_matches_bruteforce(ray_session):
    """Exact-substring window dedup (duplicate_window_stats) equals a
    brute-force window-text reference: duplicate = token window
    occurring >= 2 times corpus-wide (incl. same-doc repeats);
    coverage = union of fixed-length intervals."""
    from collections import Counter

    import ray.data as rd

    from gdal_ray.stages.dedup import duplicate_window_stats

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(25)]
    docs = []
    for i in range(60):
        n = int(rng.integers(0, 40))
        docs.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, n))})
    span = "a b c d e f g h i j"
    docs[3]["text"] = span + " tail one"
    docs[9]["text"] = "head " + span
    docs[20]["text"] = span + " mid " + span      # same-doc repeat
    L = 8

    wins = Counter()
    for d in docs:
        toks = d["text"].split()
        for p in range(len(toks) - L + 1):
            wins[tuple(toks[p:p + L])] += 1
    ref = {}
    for d in docs:
        toks = d["text"].split()
        occ = [p for p in range(len(toks) - L + 1)
               if wins[tuple(toks[p:p + L])] >= 2]
        if occ:
            cov, last_end = 0, -1
            for p in occ:
                cov += max(0, p + L - max(p, last_end))
                last_end = max(last_end, p + L)
            ref[d["doc_id"]] = (len(toks), len(occ), cov)
    assert {3, 9, 20} <= set(ref)

    out = duplicate_window_stats(rd.from_items(docs), window=L,
                                 num_partitions=4).take_all()
    got = {r["doc_id"]: (r["n_tokens"], r["dup_windows"],
                         r["covered_tokens"]) for r in out}
    assert got == ref


def test_duplicate_window_guards():
    import pytest as _pytest

    from gdal_ray.stages.dedup import duplicate_window_stats

    with _pytest.raises(ValueError, match="window"):
        duplicate_window_stats(None, window=1)


def test_contamination_stats_crafted(ray_session):
    """Benchmark decontamination: docs sharing an 8-token span with
    the broadcast benchmark set are flagged with exact match counts
    and first positions; clean docs are absent."""
    import ray
    import ray.data as rd

    from gdal_ray.stages.dedup import (benchmark_window_hashes,
                                       contamination_stats)

    bench = ["the quick brown fox jumps over the lazy dog tonight",
             "one two three four five six seven eight nine ten"]
    bh = benchmark_window_hashes(bench, window=8)
    assert len(bh) > 0
    docs = [
        {"doc_id": 1, "text": "prefix the quick brown fox jumps over "
                              "the lazy dog suffix"},
        {"doc_id": 2, "text": "totally unrelated words with no "
                              "overlap at all here now"},
        {"doc_id": 3, "text": "one two three four five six seven "
                              "eight nine ten and more"},
        {"doc_id": 4, "text": "short"},
    ]
    out = {r["doc_id"]: r for r in contamination_stats(
        rd.from_items(docs), ray.put(bh), window=8).take_all()}
    assert set(out) == {1, 3}
    # doc 1: bench windows inside "the quick ... dog" (9 tokens -> 2
    # windows), both present starting at token 1
    assert out[1]["first_match_pos"] == 1
    assert out[1]["matched_windows"] == 2
    # doc 3: "one..ten" = 10 tokens -> 3 bench windows present at 0
    assert out[3]["first_match_pos"] == 0
    assert out[3]["matched_windows"] == 3
    # boundary windows spanning two benchmark texts are NOT benchmark
    # windows: a doc gluing the two texts' edge tokens stays clean
    glue = "lazy dog tonight one two three four five"
    out2 = contamination_stats(
        rd.from_items([{"doc_id": 9, "text": glue}]), ray.put(bh),
        window=8).take_all()
    assert out2 == []


def test_dedup_against_snapshot(ray_session):
    """Cross-corpus anti-join dedup: new docs whose content appears
    in the snapshot are dropped (regardless of ids), fresh content
    survives with original columns, and the result matches a local
    set-difference reference."""
    import ray.data as rd

    from gdal_ray.stages.dedup import dedup_against

    snap_texts = [f"old document number {i}" for i in range(30)]
    snapshot = rd.from_items(
        [{"doc_id": 1000 + i, "text": t}
         for i, t in enumerate(snap_texts)])
    new_docs = []
    for i in range(40):
        if i % 3 == 0:
            txt = snap_texts[i % 30]          # exact rehash of old
        else:
            txt = f"fresh content {i}"
        new_docs.append({"doc_id": i, "text": txt, "src": f"s{i%2}"})
    out = dedup_against(rd.from_items(new_docs), snapshot,
                        num_partitions=4).take_all()
    got = sorted(r["doc_id"] for r in out)
    want = sorted(d["doc_id"] for d in new_docs
                  if d["text"] not in set(snap_texts))
    assert got == want
    assert all(set(r) == {"doc_id", "text", "src"} for r in out)


def test_split_by_content_leakage_safe(ray_session):
    """Content-hash splits: byte-identical docs ALWAYS share a split
    (the leakage property id-based splits lack), proportions track
    fractions, assignment is deterministic per salt and changes
    across salts."""
    import ray.data as rd

    from gdal_ray.stages.dedup import split_by_content

    rng = np.random.default_rng(71)
    docs = []
    for i in range(600):
        docs.append({"doc_id": i,
                     "text": f"unique document {i} "
                             + " ".join(map(str, rng.integers(0, 9, 5)))})
    # 200 duplicate pairs with DIFFERENT ids
    for i in range(200):
        docs.append({"doc_id": 1000 + i, "text": docs[i]["text"]})
    ds = rd.from_items(docs)
    out = split_by_content(
        ds, fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    ).to_pandas()
    assert len(out) == 800
    by_text = out.groupby("text")["split"].nunique()
    assert (by_text == 1).all()          # no duplicate crosses splits
    frac = out.split.value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert 0.04 < frac["val"] < 0.18 and 0.04 < frac["test"] < 0.18
    out2 = split_by_content(
        ds, fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    ).to_pandas()
    assert out.sort_values("doc_id").split.tolist() == \
        out2.sort_values("doc_id").split.tolist()
    out3 = split_by_content(
        ds, fractions={"train": 0.8, "val": 0.1, "test": 0.1},
        salt=7).to_pandas()
    assert out.sort_values("doc_id").split.tolist() != \
        out3.sort_values("doc_id").split.tolist()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum"):
        split_by_content(ds, fractions={"a": 0.5})
