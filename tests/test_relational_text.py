"""Relational layer vs pandas; text/dedup stages on tiny fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from gdal_ray.pipelines import relational as R

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(ray_session):
    import ray.data as rd

    return rd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_linestatus", "l_quantity"],
    )


def test_grouped_aggregate_matches_pandas(lineitem):
    got = (
        R.grouped_aggregate(
            lineitem,
            ["l_returnflag", "l_linestatus"],
            [
                ("l_quantity", "sum", "s"),
                ("l_quantity", "count", "n"),
                ("l_quantity", "min", "mn"),
                ("l_quantity", "max", "mx"),
                ("l_quantity", "mean", "avg"),
            ],
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    df = pd.read_parquet(f"{SF}/lineitem.parquet")
    want = (
        df.groupby(["l_returnflag", "l_linestatus"])["l_quantity"]
        .agg(s="sum", n="count", mn="min", mx="max", avg="mean")
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    assert (got["s"] == want["s"]).all()
    assert (got["n"] == want["n"]).all()
    assert (got["mn"] == want["mn"]).all()
    assert (got["mx"] == want["mx"]).all()
    assert np.allclose(got["avg"], want["avg"])


def test_global_aggregate(lineitem):
    got = R.global_aggregate(
        lineitem, [("l_quantity", "count", "n"), ("l_quantity", "max", "mx")]
    ).to_pandas()
    df = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert got["n"][0] == len(df) and got["mx"][0] == df.l_quantity.max()


def test_distinct_and_topk(lineitem):
    d = R.distinct(lineitem, ["l_returnflag"]).to_pandas()
    df = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert set(d.l_returnflag) == set(df.l_returnflag)
    top = R.order_by_limit(
        lineitem, ["l_quantity", "l_orderkey"], descending=[True, False], limit=5
    ).to_pandas()
    want = df.sort_values(
        ["l_quantity", "l_orderkey"], ascending=[False, True]
    ).head(5)
    assert top.l_orderkey.tolist() == want.l_orderkey.tolist()


def test_exact_dedup_finds_duplicates(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dedup import exact_dedup

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": ["a", "b", "a", "c", "b"],
        }
    )
    out = exact_dedup(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out.doc_id.tolist() == [0, 1, 3]


def test_minhash_identical_docs_pair(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dedup import MinHasher, minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [base, base, "completely different text about ray data engines"],
        }
    )
    pairs = minhash_lsh_pairs(rd.from_arrow(t), threshold=0.9).to_pandas()
    assert [(0, 1)] == list(zip(pairs.doc_a, pairs.doc_b))
    # signature determinism across actors
    m1, m2 = MinHasher(), MinHasher()
    assert np.array_equal(m1.signature(base), m2.signature(base))


def test_simhash_near_and_far(ray_session):
    import ray.data as rd

    from gdal_ray.stages.dedup import simhash_pairs

    a = "ray data engine spatial join tiles pyramid " * 4
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [a, a + " extra", "unrelated words entirely here now"],
        }
    )
    pairs = simhash_pairs(rd.from_arrow(t), max_hamming=3).to_pandas()
    assert (0, 1) in set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 2) not in set(zip(pairs.doc_a, pairs.doc_b))


def test_langid_and_quality(ray_session):
    import ray.data as rd

    from gdal_ray.stages.text import LangId, QualityScorer

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": [
                "the cat and the dog in a house of it",
                "der Hund und die Katze ist nicht da",
            ],
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(LangId, batch_format="pyarrow", concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out.pred_lang.tolist() == ["en", "de"]
    q = (
        rd.from_arrow(t)
        .map_batches(QualityScorer, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert (q.alpha_ratio > 0.5).all() and (q.n_chars > 0).all()


def test_phash_neardup_finds_synth_dups(ray_session, smoke_fixtures):
    import ray.data as rd

    from gdal_ray.stages.dedup import phash_neardup_pairs

    imgs = rd.read_parquet(smoke_fixtures["images"], columns=["image_id", "phash"])
    pairs = phash_neardup_pairs(imgs, max_hamming=6).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    # constructed near-dups: every 89th row duplicates row i-89 (+faint noise)
    for i in range(89, 1000, 89):
        a, b = f"img{i-89:08d}", f"img{i:08d}"
        assert (a, b) in got or (b, a) in got, (a, b)


def test_join_auto_strategies_agree(ray_session):
    """join_auto's broadcast and copartition paths produce the same
    result set; the gate picks by build-side count."""
    import pandas as pd
    import ray.data as rd

    from gdal_ray.pipelines.relational import join_auto

    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4, 2, 1], "a": list("abcdef")}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 5], "b": ["x", "y", "z"]}))
    small = join_auto(left, right, "k", broadcast_max_rows=10).to_pandas()
    big = join_auto(left, right, "k", broadcast_max_rows=0,
                    num_partitions=4).to_pandas()
    canon = lambda d: d[sorted(d.columns)].sort_values(  # noqa: E731
        sorted(d.columns)).reset_index(drop=True)
    assert canon(small).equals(canon(big))
    assert len(small) == 4


# ------------------------------------------------------- as-of join


def _asof_fixtures():
    import numpy as np
    import pyarrow as pa

    lt = pa.table(
        {
            "k": pa.array([1, 1, 2, 3, None], pa.int64()),
            "t": pa.array([10, 4, 7, 1, 5], pa.int64()),
            "lv": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 4], pa.int64()),
            "t": pa.array([5, 8, 7, 9, 1], pa.int64()),
            "rv": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
        }
    )
    return lt, rt


def test_asof_join_inner(ray_session):
    import ray.data as rd

    from gdal_ray.pipelines.relational import asof_join

    lt, rt = _asof_fixtures()
    df = (
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t", by="k")
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    # (1,10)->(1,8); (1,4) no earlier; (2,7)->(2,7) inclusive; (3,1)
    # no key 3; NULL key never matches
    assert list(df.k) == [1, 2]
    assert list(df.t) == [10, 7]
    assert list(df.rv) == [20.0, 30.0]


def test_asof_join_left_outer_and_tolerance(ray_session):
    import numpy as np
    import ray.data as rd

    from gdal_ray.pipelines.relational import asof_join

    lt, rt = _asof_fixtures()
    df = (
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t", by="k",
                  how="left_outer")
        .to_pandas().sort_values(["k", "t"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(df) == 5
    m = df.dropna(subset=["rv"])
    assert list(m.rv) == [20.0, 30.0]
    # tolerance 1: (1,10)->(1,8) delta 2 excluded; (2,7)->(2,7) kept
    df = (
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t", by="k",
                  tolerance=1)
        .to_pandas()
    )
    assert list(df.k) == [2] and list(df.rv) == [30.0]


def test_asof_join_timestamps_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.relational import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 300
    lt = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, n_l), pa.int64()),
            "t": pa.array(
                np.datetime64("2024-01-01", "us")
                + rng.integers(0, 10**9, n_l).astype("timedelta64[us]")
            ),
            "lv": pa.array(np.arange(n_l, dtype=np.int64)),
        }
    )
    rt = pa.table(
        {
            "k": pa.array(rng.integers(0, 20, n_r), pa.int64()),
            "t": pa.array(
                np.datetime64("2024-01-01", "us")
                + rng.integers(0, 10**9, n_r).astype("timedelta64[us]")
            ),
            "rv": pa.array(np.arange(n_r, dtype=np.int64)),
        }
    )
    got = (
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t", by="k")
        .to_pandas().sort_values("lv").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    exp = con.execute(
        "SELECT l.k, l.t, l.lv, r.rv FROM l ASOF JOIN r "
        "ON l.k = r.k AND l.t >= r.t ORDER BY l.lv"
    ).fetchdf()
    assert len(got) == len(exp)
    assert list(got.lv) == list(exp.lv)
    assert list(got.rv) == list(exp.rv)


def test_asof_join_column_collision_suffix(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.relational import asof_join

    lt = pa.table({"k": pa.array([1], pa.int64()),
                   "t": pa.array([5], pa.int64()),
                   "v": pa.array([1.0])})
    rt = pa.table({"k": pa.array([1], pa.int64()),
                   "t": pa.array([3], pa.int64()),
                   "v": pa.array([9.0])})
    df = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                   by="k").to_pandas()
    assert list(df.columns) == ["k", "t", "v", "v_r"]
    assert df.v[0] == 1.0 and df.v_r[0] == 9.0


def test_range_lookup_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.relational import range_lookup_join

    # non-overlapping validity windows per key (SCD-2 shape)
    lt = pa.table(
        {
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "t": pa.array([2, 12, 25, 5], pa.int64()),
            "lv": pa.array([1.0, 2.0, 3.0, 4.0]),
        }
    )
    rt = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "lo": pa.array([0, 10, 0], pa.int64()),
            "hi": pa.array([9, 19, 3], pa.int64()),
            "rv": pa.array([100.0, 200.0, 300.0]),
        }
    )
    df = (
        range_lookup_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                          by="k", lo="lo", hi="hi")
        .to_pandas().sort_values("t").reset_index(drop=True)
    )
    # t=2 -> [0,9]; t=12 -> [10,19]; t=25 beyond hi; (2,5) beyond hi=3
    assert list(df.t) == [2, 12]
    assert list(df.rv) == [100.0, 200.0]

    df = (
        range_lookup_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                          by="k", lo="lo", hi="hi", how="left_outer")
        .to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    )
    assert len(df) == 4
    # matched windows carry rv; beyond-hi rows null out the right side
    got = {(int(r.k), int(r.t)): (None if r.rv != r.rv else r.rv)
           for r in df.itertuples()}
    assert got == {(1, 2): 100.0, (1, 12): 200.0, (1, 25): None,
                   (2, 5): None}


def test_range_lookup_join_vs_duckdb_between(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.relational import range_lookup_join

    rng = np.random.default_rng(23)
    # non-overlapping windows per key: starts on a 10-grid, width <= 9
    ks, los = np.meshgrid(np.arange(8), np.arange(0, 200, 10))
    ks, los = ks.ravel(), los.ravel()
    his = los + rng.integers(0, 10, len(los))
    rt = pa.table({"k": pa.array(ks, pa.int64()),
                   "lo": pa.array(los, pa.int64()),
                   "hi": pa.array(his, pa.int64()),
                   "rv": pa.array(np.arange(len(ks), dtype=np.int64))})
    lt = pa.table({"k": pa.array(rng.integers(0, 8, 500), pa.int64()),
                   "t": pa.array(rng.integers(0, 210, 500), pa.int64()),
                   "lv": pa.array(np.arange(500, dtype=np.int64))})
    got = (
        range_lookup_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                          by="k", lo="lo", hi="hi")
        .to_pandas().sort_values("lv").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    exp = con.execute(
        "SELECT l.lv, r.rv FROM l JOIN r ON l.k = r.k "
        "AND l.t BETWEEN r.lo AND r.hi ORDER BY l.lv"
    ).fetchdf()
    assert list(got.lv) == list(exp.lv)
    assert list(got.rv) == list(exp.rv)


def test_interval_join_all_pairs_vs_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.pipelines.relational import interval_join

    rng = np.random.default_rng(31)
    n_l, n_r = 400, 150
    lt = pa.table({"k": pa.array(rng.integers(0, 6, n_l), pa.int64()),
                   "t": pa.array(rng.integers(0, 500, n_l), pa.int64()),
                   "lv": pa.array(np.arange(n_l, dtype=np.int64))})
    los = rng.integers(0, 460, n_r)
    rt = pa.table({"k": pa.array(rng.integers(0, 6, n_r), pa.int64()),
                   "lo": pa.array(los, pa.int64()),
                   "hi": pa.array(los + rng.integers(0, 80, n_r), pa.int64()),
                   "rv": pa.array(np.arange(n_r, dtype=np.int64))})
    got = (
        interval_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t", by="k",
                      lo="lo", hi="hi", band=40)
        .to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    exp = con.execute(
        "SELECT l.lv, r.rv FROM l JOIN r ON l.k = r.k AND "
        "l.t BETWEEN r.lo AND r.hi ORDER BY lv, rv"
    ).fetchdf()
    assert list(got.lv) == list(exp.lv) and list(got.rv) == list(exp.rv)


def test_interval_join_timestamps_and_band_guard(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest as _pt
    import ray.data as rd

    from gdal_ray.pipelines.relational import interval_join

    base = np.datetime64("2024-01-01", "us")
    lt = pa.table({"k": pa.array([1, 1], pa.int64()),
                   "t": pa.array(base + np.array([10, 400], "timedelta64[us]")),
                   "lv": pa.array([0, 1], pa.int64())})
    rt = pa.table({"k": pa.array([1], pa.int64()),
                   "lo": pa.array(base + np.array([0], "timedelta64[us]")),
                   "hi": pa.array(base + np.array([100], "timedelta64[us]")),
                   "rv": pa.array([7], pa.int64())})
    df = interval_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                       by="k", lo="lo", hi="hi", band=50).to_pandas()
    assert list(df.lv) == [0] and list(df.rv) == [7]
    # an interval spanning > max_bands raises instead of silently
    # clamping (no-silent-caps)
    with _pt.raises(Exception):
        interval_join(rd.from_arrow(lt), rd.from_arrow(rt), on="t",
                      by="k", lo="lo", hi="hi", band=50,
                      max_bands=1).to_pandas()


def test_embedding_kmeans_matches_single_process(ray_session, tmp_path):
    """Distributed Lloyd (block partials -> fsum reduce -> per-iteration
    centroid quantization) equals the independent single-process golden
    under the shared contract, for every row, regardless of block
    split."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.stages.ann import embedding_kmeans

    rng = np.random.default_rng(17)
    n, d, k, iters = 400, 16, 5, 4
    q = float(1 << 24)
    emb = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(emb.tolist(), pa.list_(pa.float64())),
    })

    # single-process reference (plain np.sum means, same quantization)
    def unit(m):
        nn = np.linalg.norm(m, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        return m / nn

    x = unit(emb)
    C = np.round(unit(emb[:k].copy()) * q) / q
    for _ in range(iters):
        a = np.argmax(x @ C.T, axis=1)
        nxt = C.copy()
        for c in range(k):
            rows = np.flatnonzero(a == c)
            if len(rows):
                m = x[rows].sum(axis=0) / float(len(rows))
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    nxt[c] = m / nrm
        C = np.round(nxt * q) / q
    sims = x @ C.T
    want_a = np.argmax(sims, axis=1)
    want_q = np.round(sims[np.arange(n), want_a] * q).astype(np.int64)

    for blocks in (3, 11):  # block-split invariance
        ds = rd.from_arrow(t).repartition(blocks)
        assign, summary = embedding_kmeans(ds, k=k, iters=iters)
        got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
        assert (got["cluster"].to_numpy() == want_a).all()
        assert (got["sim_q"].to_numpy() == want_q).all()
        qc = np.round(C * q).astype(np.int64)
        want_cs = [int(((np.arange(d) + 1) * qc[c]).sum()) for c in range(k)]
        assert [cs for _, cs in summary] == want_cs


def test_explode_terms_batch_contract():
    import pyarrow as pa

    from gdal_ray.stages.text import explode_terms_batch

    t = pa.table(
        {
            "doc_id": pa.array([7, 8, 9, 10], pa.int64()),
            "text": pa.array(
                ["the cat the hat", "  ", "", "B b  a"], pa.string()
            ),
        }
    )
    out = explode_terms_batch(t).to_pandas()
    # empty / whitespace-only docs vanish; lower + \s+ split; dl counts
    # duplicates; (doc, term) rows are distinct
    got = {
        (r.doc_id, r.term): (r.tf, r.dl) for r in out.itertuples(index=False)
    }
    assert got == {
        (7, "the"): (2, 4),
        (7, "cat"): (1, 4),
        (7, "hat"): (1, 4),
        (10, "b"): (2, 3),
        (10, "a"): (1, 3),
    }


def test_corpus_tfidf_bm25_vs_duckdb(ray_session, tmp_path, monkeypatch):
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(3)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 12)).tolist())
        for _ in range(80)
    ] + ["", "   "]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(82, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 82, pa.string()),
            "source": pa.array(["s"] * 82, pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    from gdal_ray.pipelines.queries import q14_corpus_scores

    eng = (
        q14_corpus_scores(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "term"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    ora = con.execute(
        """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tfx AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term),
dlx AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM toks GROUP BY doc_id),
dfx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tfx GROUP BY term),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dlx)
SELECT t.doc_id, t.term, t.tf, f.df, d.dl,
       t.tf * (CAST(st.n AS DOUBLE) / f.df) AS tfidf,
       (((CAST(st.n AS DOUBLE) - f.df) + 0.5e0) / (f.df + 0.5e0))
         * ((t.tf * 2.2e0)
            / (t.tf + 1.2e0 * (0.25e0 + 0.75e0
               * (d.dl / (CAST(st.sum_dl AS DOUBLE) / st.n))))) AS bm25
FROM tfx t JOIN dfx f ON t.term = f.term
           JOIN dlx d ON t.doc_id = d.doc_id, st
ORDER BY t.doc_id, t.term
"""
    ).fetchdf()
    assert len(eng) == len(ora)
    for c in ("doc_id", "tf", "df", "dl"):
        assert (eng[c].to_numpy() == ora[c].to_numpy()).all()
    assert list(eng.term) == list(ora.term)
    # bit-identical float64 scores (shared expression tree)
    assert (eng.tfidf.to_numpy() == ora.tfidf.to_numpy()).all()
    assert (eng.bm25.to_numpy() == ora.bm25.to_numpy()).all()


def test_chunk_documents_invariants(ray_session):
    """LLM-prep chunker: exact-substring chunks, full token coverage,
    the documented overlap, and the closed-form chunk-count rule
    n_chunks = max(1, ceil((ntok - overlap)/step))."""
    import math
    import re

    import ray.data as rd

    from gdal_ray.stages.text import chunk_documents

    docs = [
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(100))},
        {"doc_id": 2, "text": "only three tokens"},
        {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(130))},
        {"doc_id": 4, "text": "   "},
        {"doc_id": 5, "text": " ".join(f"x{i}" for i in range(64))},
    ]
    out = chunk_documents(rd.from_items(docs), target_tokens=64,
                          overlap_tokens=16).take_all()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc                      # whitespace-only: none
    for d in docs:
        toks = [m.span() for m in re.finditer(r"\S+", d["text"])]
        if not toks:
            continue
        rows = sorted(by_doc[d["doc_id"]], key=lambda r: r["chunk_idx"])
        want = max(1, math.ceil((len(toks) - 16) / 48))
        assert rows[0]["n_chunks"] == want == len(rows)
        # exact substrings + token coverage + overlap
        for r in rows:
            assert d["text"][r["char_start"]:r["char_end"]] == r["chunk"]
        assert all(any(r["char_start"] <= a and b <= r["char_end"]
                       for r in rows) for a, b in toks)
        for k in range(1, len(rows)):
            prev_toks = [t for t in toks
                         if rows[k - 1]["char_start"] <= t[0]
                         and t[1] <= rows[k - 1]["char_end"]]
            cur_start = rows[k]["char_start"]
            shared = [t for t in prev_toks if t[0] >= cur_start]
            assert len(shared) == 16            # the overlap contract
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_items(docs), target_tokens=8,
                        overlap_tokens=8)


def test_repetition_stats_hand_values(ray_session):
    """dup_bigram_frac / top_token_frac against hand-computed
    values, incl. the <2-token and repeated-text edges."""
    import ray.data as rd

    from gdal_ray.stages.text import repetition_stats_batch

    docs = rd.from_items([
        {"doc_id": 1, "text": "a b a b a"},     # bigrams: ab,ba,ab,ba
        {"doc_id": 2, "text": "unique words only here"},
        {"doc_id": 3, "text": "single"},
        {"doc_id": 4, "text": ""},
    ])
    out = {r["doc_id"]: r for r in docs.map_batches(
        repetition_stats_batch, batch_format="pyarrow").take_all()}
    assert 4 not in out
    assert out[1]["dup_bigram_frac"] == 1.0 - 2.0 / 4.0
    assert out[1]["top_token_frac"] == 3.0 / 5.0
    assert out[2]["dup_bigram_frac"] == 0.0
    assert out[2]["top_token_frac"] == 1.0 / 4.0
    assert out[3]["dup_bigram_frac"] is None
    assert out[3]["top_token_frac"] == 1.0


def test_pattern_counter_pii(ray_session):
    """PII pattern counts (C4 filter inputs): emails, URLs,
    phone-like numbers; hand-crafted docs with known counts; a
    DuckDB regexp_extract_all cross-oracle on the same patterns."""
    import duckdb
    import ray.data as rd

    from gdal_ray.stages.text import PatternCounter

    docs = [
        {"doc_id": 1,
         "text": "mail a@b.com and c.d+x@e.org, see https://x.io/p "
                 "or http://y.z/q?a=1 call +1 (555) 123-4567"},
        {"doc_id": 2, "text": "no pii here at all"},
        {"doc_id": 3, "text": "bad@@mail @nope 555 tel: 020 7946 0958"},
    ]
    out = {r["doc_id"]: r for r in rd.from_items(docs).map_batches(
        PatternCounter, batch_format="pyarrow",
        concurrency=1).take_all()}
    assert (out[1]["n_emails"], out[1]["n_urls"],
            out[1]["n_phones"]) == (2, 2, 1)
    assert (out[2]["n_emails"], out[2]["n_urls"],
            out[2]["n_phones"]) == (0, 0, 0)
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 1
    # cross-oracle: DuckDB RE2 agrees on every count (patterns are
    # alternation-free -> leftmost-longest == leftmost-greedy)
    con = duckdb.connect()
    for d in docs:
        for pat, key in ((PatternCounter.EMAIL, "n_emails"),
                         (PatternCounter.URL, "n_urls"),
                         (PatternCounter.PHONE, "n_phones")):
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [d["text"], pat]).fetchone()[0]
            assert n == out[d["doc_id"]][key], (d["doc_id"], key)


def test_naive_bayes_train_and_score(ray_session):
    """Distributed NB training (exact-integer model) + broadcast
    scorer: model counts match a local Counter reference; prediction
    matches an independent per-doc log-score reference; the trained
    classifier separates two clearly-distinct vocabularies."""
    import math
    from collections import Counter

    import numpy as np
    import ray
    import ray.data as rd

    from gdal_ray.stages.text import NBScorer, nb_train

    rng = np.random.default_rng(21)
    voc_a = ["alpha", "apple", "anchor", "arrow", "amber"]
    voc_b = ["beta", "berry", "bridge", "bolt", "basil"]
    docs = []
    for i in range(80):
        lang = "aa" if i % 2 == 0 else "bb"
        voc = voc_a if lang == "aa" else voc_b
        n = int(rng.integers(5, 20))
        docs.append({"doc_id": i, "lang": lang,
                     "text": " ".join(rng.choice(voc, n))})
    ds = rd.from_items(docs)
    counts, priors = nb_train(ds, label_col="lang")
    ct = counts.to_pandas()
    pr = priors.to_pandas().set_index("label")

    # exact model check vs a local Counter
    ref = Counter()
    ref_tok = Counter()
    for d in docs:
        for tm in d["text"].strip().lower().split():
            ref[(d["lang"], tm)] += 1
            ref_tok[d["lang"]] += 1
    got = {(r.label, r.term): r.count
           for r in ct.itertuples(index=False)}
    assert got == dict(ref)
    assert pr.loc["aa", "n_docs"] == 40
    assert pr.loc["aa", "n_tokens"] == ref_tok["aa"]

    # scorer: held-out docs classify to the right vocabulary
    import pyarrow as pa

    model = ray.put((
        pa.Table.from_pandas(ct, preserve_index=False),
        pa.Table.from_pandas(pr.reset_index(), preserve_index=False)))
    test_docs = [
        {"doc_id": 100, "text": "apple arrow amber anchor"},
        {"doc_id": 101, "text": "berry bolt basil bridge"},
        {"doc_id": 102, "text": "unknownword apple alpha"},
    ]
    out = {r["doc_id"]: r for r in rd.from_items(test_docs).map_batches(
        NBScorer, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"model_ref": model}).take_all()}
    assert out[100]["pred"] == "aa"
    assert out[101]["pred"] == "bb"
    assert out[102]["pred"] == "aa"
    # independent log-score reference for doc 100
    vocab = {tm for (_l, tm) in ref}
    v = len(vocab)
    total = 80

    def score(lang, toks):
        s = math.log((40) / total)
        d = ref_tok[lang] + v
        for tm in toks:
            s += math.log((ref.get((lang, tm), 0) + 1) / d)
        return s

    toks = test_docs[0]["text"].split()
    want = max(score("aa", toks), score("bb", toks))
    assert abs(out[100]["log_score"] - want) < 1e-9


def test_domain_extraction_vs_duckdb(ray_session):
    """URL-domain extraction + per-domain aggregation cross-checked
    against DuckDB regexp_extract_all over crafted docs (the
    PatternCounter cross-oracle discipline)."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages.text import domain_stats

    docs = [
        {"doc_id": 1, "text": "see https://a.example.com/x and "
                              "http://B.example.com/y plus "
                              "https://a.example.com/z"},
        {"doc_id": 2, "text": "nothing here"},
        {"doc_id": 3, "text": "ref https://c.org http://c.org/page"},
        {"doc_id": 4, "text": "dup https://a.example.com"},
    ]
    out = domain_stats(rd.from_items(docs),
                       concurrency=1).to_pandas()
    out = out.sort_values("domain").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(docs))
    want = con.execute(r"""
        WITH urls AS (
          SELECT doc_id,
                 lower(regexp_extract(u, 'https?://([A-Za-z0-9.-]+)',
                                      1)) AS domain
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(
                           text, 'https?://[A-Za-z0-9.-]+')) AS u
                FROM docs)
        )
        SELECT domain,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM urls GROUP BY domain ORDER BY domain
    """).fetchdf()
    assert out["domain"].tolist() == want["domain"].tolist()
    assert out["n_docs"].tolist() == want["n_docs"].tolist()
    assert out["n_urls"].tolist() == want["n_urls"].tolist()
    assert "a.example.com" in set(out["domain"])
    assert out.set_index("domain").loc["a.example.com", "n_docs"] == 2


def test_top_terms_heavy_hitters(ray_session):
    """Bounded-shuffle top-k terms: exact match with the full-groupby
    answer (DuckDB) at fixture scale with the exactness certificate
    proven; a deliberately tiny per-batch cap on adversarial batches
    flips proven=False instead of silently approximating."""
    import duckdb
    import pandas as pd
    import ray.data as rd

    from gdal_ray.stages.text import top_terms

    rng = np.random.default_rng(41)
    zipf_vocab = [f"w{i}" for i in range(200)]
    weights = 1.0 / np.arange(1, 201)
    weights /= weights.sum()
    docs = []
    for i in range(120):
        n = int(rng.integers(20, 60))
        docs.append({"doc_id": i, "text": " ".join(
            rng.choice(zipf_vocab, n, p=weights))})
    ds = rd.from_items(docs)
    out = top_terms(ds, k=10, per_batch_cap=150).to_pandas()
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(docs))
    want = con.execute(r"""
        SELECT term, CAST(COUNT(*) AS BIGINT) AS count
        FROM (SELECT unnest(regexp_split_to_array(lower(trim(text)),
                                                  '\s+')) AS term
              FROM docs WHERE trim(text) <> '')
        GROUP BY term ORDER BY count DESC, term ASC LIMIT 10
    """).fetchdf()
    assert out["term"].tolist() == want["term"].tolist()
    assert out["count"].tolist() == want["count"].tolist()
    assert bool(out["proven"].all())
    assert out["rank"].tolist() == list(range(1, 11))

    # adversarial: cap of 2 on a 200-term vocabulary cannot certify
    tiny = top_terms(ds, k=10, per_batch_cap=2).to_pandas()
    assert not bool(tiny["proven"].any())


def test_bpe_train_matches_local_reference(ray_session):
    """Distributed BPE training: the merge list equals an independent
    local implementation (deterministic most-frequent / smallest-pair
    rule) on a corpus with known structure; BpeApply token counts
    match encoding by hand."""
    from collections import Counter

    import ray
    import ray.data as rd

    from gdal_ray.stages.text import BpeApply, bpe_train, word_counts

    docs = [
        {"doc_id": 0, "text": "low low low low low"},
        {"doc_id": 1, "text": "lower lower newest newest"},
        {"doc_id": 2, "text": "newest newest newest newest"},
        {"doc_id": 3, "text": "widest widest widest"},
    ]
    ds = rd.from_items(docs)
    wc = {r["word"]: r["count"]
          for r in word_counts(ds).take_all()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    merges, vocab = bpe_train(ds, num_merges=10)

    # independent local reference (Sennrich-style)
    words = {}
    for w, c in wc.items():
        words[tuple(list(w[:-1]) + [w[-1] + "</w>"])] = c
    ref_merges = []
    for _ in range(10):
        pairs = Counter()
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref_merges.append(best)
        nw = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and (syms[i], syms[i + 1])
                        == best):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nw[tuple(out)] = nw.get(tuple(out), 0) + c
        words = nw
    assert merges == ref_merges
    assert "est</w>" in "".join(v for v in vocab) or any(
        "est" in v for v in vocab)

    out = {r["doc_id"]: r for r in ds.map_batches(
        BpeApply, batch_format="pyarrow", concurrency=1,
        fn_constructor_kwargs={"merges_ref": ray.put(merges)}
    ).take_all()}
    # after enough merges the frequent words collapse to few symbols
    assert out[0]["n_tokens"] <= 2 * 5
    assert all(r["n_unk"] == 0 for r in out.values())
    # determinism across runs
    merges2, _ = bpe_train(ds, num_merges=10)
    assert merges2 == merges


def test_pack_sequences_invariants(ray_session):
    """Sequence packing: every doc assigned exactly once, bin fills
    never exceed seq_len, offsets tile each bin contiguously,
    over-length docs flagged truncated, and waste stays sane for a
    best-fit-decreasing packer (bins >= ceil(total/L) lower bound,
    <= the naive one-doc-per-bin count)."""
    import ray.data as rd

    from gdal_ray.stages.text import pack_sequences

    rng = np.random.default_rng(53)
    docs = [{"doc_id": i, "n_tokens": int(rng.integers(10, 900))}
            for i in range(400)]
    docs.append({"doc_id": 400, "n_tokens": 5000})   # over-length
    L = 1024
    out = pack_sequences(rd.from_items(docs), seq_len=L,
                         num_partitions=4).to_pandas()
    assert len(out) == 401
    assert sorted(out.doc_id) == list(range(401))
    assert bool(out[out.doc_id == 400].truncated.iloc[0])
    assert not out[out.doc_id != 400].truncated.any()
    eff = out.n_tokens.clip(upper=L)
    fills = out.assign(eff=eff).groupby("bin_id").agg(
        fill=("eff", "sum")).fill
    assert (fills <= L).all()
    # offsets tile contiguously within each bin
    for b, grp in out.assign(eff=eff).groupby("bin_id"):
        g = grp.sort_values("offset")
        expect = 0
        for _, r in g.iterrows():
            assert r.offset == expect
            expect += min(int(r.n_tokens), L)
    total = int(eff.sum())
    lower = -(-total // L)
    assert lower <= len(fills) <= len(docs) + 1
    # with 4 partitions the packer should do far better than naive
    assert len(fills) <= 1.25 * lower + 4
