"""Text analysis stages over the documents table (engine additions).

Language-ID (stopword + n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace +
BPE-ish regex), and rolling-hash document fingerprints — each an
actor-pool map_batches stage with compiled state in ``__init__``
(ray_guide 'Stateful stages' pattern).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por"},
}


def token_count_batch(t: pa.Table) -> pa.Table:
    """Whitespace token count, vectorized with pandas str ops
    (``len(text.split())`` semantics: empty/whitespace-only -> 0)."""
    s = pd.Series(t.column("text").to_pylist(), dtype=object).fillna("")
    n = s.str.split().str.len().astype(np.int64)
    return pa.table(
        {"doc_id": t.column("doc_id"), "n_tokens": pa.array(n.to_numpy(), pa.int64())}
    )


class BpeishTokenCounter:
    """Token count with a GPT-style pre-tokenizer regex (compiled once
    per actor) — the 'BPE-ish regex' counting path."""

    def __init__(self):
        self.pat = re.compile(
            r"""'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"""
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = np.fromiter(
            (len(self.pat.findall(x or "")) for x in texts), np.int64, len(texts)
        )
        return pa.table(
            {"doc_id": t.column("doc_id"), "n_bpe_tokens": pa.array(n, pa.int64())}
        )


def _token_regex(words) -> re.Pattern:
    """Regex matching a whole whitespace-delimited token equal to one of
    ``words`` (the vectorized form of ``tok in words`` over split()):
    lookarounds assert no adjacent non-space character."""
    alt = "|".join(sorted(words, key=len, reverse=True))
    return re.compile(rf"(?<![^\s])(?:{alt})(?![^\s])")


class QualityScorer:
    """Quality signals per doc: n_chars, alpha/digit/punct/space ratios,
    stopword ratio, mean word length — fully vectorized (compiled
    stopword alternation regex, no per-row lambdas)."""

    def __init__(self):
        self.stop_pat = _token_regex(_STOPWORDS["en"])

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist(), dtype=object).fillna("")
        L = s.str.len().to_numpy(np.int64)
        n = np.maximum(L, 1).astype(np.float64)
        alpha = s.str.count(r"[A-Za-z]").to_numpy(np.int64)
        digit = s.str.count(r"[0-9]").to_numpy(np.int64)
        punct = s.str.count(r"[^\w\s]").to_numpy(np.int64)
        space = s.str.count(r"\s").to_numpy(np.int64)
        n_words = s.str.split().str.len().to_numpy(np.int64)
        stop_cnt = s.str.lower().str.count(self.stop_pat).to_numpy(np.int64)
        # sum of split-token lengths == total non-whitespace chars
        mean_wl = np.where(
            n_words > 0, (L - space) / np.maximum(n_words, 1), 0.0
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pa.array(L, pa.int64()),
                "alpha_ratio": pa.array(alpha / n),
                "digit_ratio": pa.array(digit / n),
                "punct_ratio": pa.array(punct / n),
                "space_ratio": pa.array(space / n),
                "stopword_ratio": pa.array(
                    stop_cnt / np.maximum(n_words, 1).astype(np.float64)
                ),
                "mean_word_len": pa.array(mean_wl, pa.float64()),
            }
        )


class LangId:
    """Heuristic language ID: stopword vote across 4 languages, 'und'
    when no evidence.  Vectorized: one compiled token-alternation regex
    per language, per-doc counts via pandas str.count, first-max-wins
    vote in en->de->fr->es order (strictly-greater update, matching the
    oracle's CASE cascade)."""

    def __init__(self):
        self.pats = [
            (lang, _token_regex(ws)) for lang, ws in _STOPWORDS.items()
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist(), dtype=object).fillna("").str.lower()
        n_rows = len(s)
        best = np.full(n_rows, "und", dtype=object)
        best_n = np.zeros(n_rows, dtype=np.int64)
        for lang, pat in self.pats:
            cnt = s.str.count(pat).to_numpy(np.int64)
            upd = cnt > best_n
            best[upd] = lang
            best_n[upd] = cnt[upd]
        return pa.table(
            {"doc_id": t.column("doc_id"), "pred_lang": pa.array(best, pa.string())}
        )


class Fingerprinter:
    """Rolling-hash fingerprint (winnowing-lite): the minimum 64-bit
    rolling hash over k-char windows of the normalized text — a cheap
    content id robust to whitespace changes."""

    def __init__(self, k: int = 16):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        k = self.k
        for i, x in enumerate(texts):
            norm = " ".join((x or "").lower().split())
            if len(norm) < k:
                norm = norm.ljust(k, "_")
            buf = np.frombuffer(norm.encode("utf-8", "replace"), dtype=np.uint8)
            n = len(buf) - k + 1
            h = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                h = h * np.uint64(1099511628211) + buf[j : j + n].astype(np.uint64)
            out[i] = int(h.min().astype(np.int64))
        return pa.table(
            {"doc_id": t.column("doc_id"), "fingerprint": pa.array(out, pa.int64())}
        )


def explode_terms_batch(t: pa.Table) -> pa.Table:
    """Explode documents to distinct (doc_id, term, tf, dl) rows —
    the posting-list builder for corpus-statistics scoring (TF-IDF /
    BM25).  Tokenization contract shared verbatim with the DuckDB
    oracle: ``regexp_split_to_array(lower(trim(text)), '\\s+')`` —
    i.e. ``text.strip().lower().split()``; empty / whitespace-only
    docs vanish.  dl (the doc token count, duplicates included) rides
    along on every row so BM25 needs NO doc-keyed shuffle later.
    Vectorized: one pandas split pass, one lexsort over the token
    stream, run-length tf extraction."""
    import itertools

    doc = t.column("doc_id").to_numpy(zero_copy_only=False)
    s = pd.Series(t.column("text").to_pylist(), dtype=object).fillna("")
    toks = s.str.strip().str.lower().str.split()
    dl = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    keep = dl > 0
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
        }
    )
    if not keep.any():
        return empty
    dlk = dl[keep]
    docrep = np.repeat(doc[keep].astype(np.int64), dlk)
    dlrep = np.repeat(dlk, dlk)
    terms = np.asarray(
        list(itertools.chain.from_iterable(toks[keep])), dtype=object
    )
    order = np.lexsort((terms, docrep))
    dr, tr, dlr = docrep[order], terms[order], dlrep[order]
    new = np.ones(len(dr), dtype=bool)
    new[1:] = (dr[1:] != dr[:-1]) | (tr[1:] != tr[:-1])
    idx = np.flatnonzero(new)
    tf = np.diff(np.append(idx, len(dr)))
    return pa.table(
        {
            "doc_id": pa.array(dr[idx], pa.int64()),
            "term": pa.array(tr[idx].tolist(), pa.string()),
            "tf": pa.array(tf.astype(np.int64), pa.int64()),
            "dl": pa.array(dlr[idx], pa.int64()),
        }
    )

def chunk_documents(ds, *, target_tokens: int = 512,
                    overlap_tokens: int = 64, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Split documents into overlapping token-window chunks — the
    standard LLM training/RAG preparation step (engine addition; the
    reference has no text model).  Tokens are whitespace runs
    (``\S+``); windows hold ``target_tokens`` tokens and step by
    ``target_tokens - overlap_tokens``, so consecutive chunks share
    exactly ``overlap_tokens`` tokens (the final window may hold
    fewer).  Chunks are EXACT SUBSTRINGS of the source (char spans
    carried alongside), so any downstream span can be mapped back.

    Pure map_batches — no shuffle; chunk identity is (doc_id,
    chunk_idx) and deterministic.  Output: doc_id, chunk_idx,
    n_chunks, chunk, n_tokens, char_start, char_end.
    """
    if overlap_tokens >= target_tokens:
        raise ValueError("overlap_tokens must be < target_tokens")
    step = target_tokens - overlap_tokens
    tok = re.compile(r"\S+")

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        texts = t.column(text_col).to_pylist()
        o_id, o_ci, o_n, o_txt, o_nt, o_a, o_b = ([] for _ in range(7))
        for did, txt in zip(ids, texts):
            if txt is None:
                txt = ""
            spans = [m.span() for m in tok.finditer(txt)]
            if not spans:
                starts = []
                n_chunks = 0
            else:
                starts = list(range(0, len(spans), step))
                # drop trailing windows fully covered by the previous
                while (len(starts) > 1
                       and starts[-1] + target_tokens
                       > len(spans) + step - 1
                       and starts[-2] + target_tokens >= len(spans)):
                    starts.pop()
                n_chunks = len(starts)
            for ci, s0 in enumerate(starts):
                win = spans[s0:s0 + target_tokens]
                a, b = win[0][0], win[-1][1]
                o_id.append(did)
                o_ci.append(ci)
                o_n.append(n_chunks)
                o_txt.append(txt[a:b])
                o_nt.append(len(win))
                o_a.append(a)
                o_b.append(b)
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "chunk_idx": pa.array(o_ci, pa.int32()),
            "n_chunks": pa.array(o_n, pa.int32()),
            "chunk": pa.array(o_txt, pa.string()),
            "n_tokens": pa.array(o_nt, pa.int32()),
            "char_start": pa.array(o_a, pa.int64()),
            "char_end": pa.array(o_b, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")

def repetition_stats_batch(t: pa.Table) -> pa.Table:
    """Per-document repetition quality signals (the Gopher/C4-style
    filter inputs; engine addition): ``dup_bigram_frac`` = 1 -
    distinct/total bigrams (docs with >= 2 tokens) and
    ``top_token_frac`` = most-frequent-token count / token count
    (docs with >= 1 token).  Whitespace tokens, lowercased — the
    same tokenization as the corpus-scoring suite, so one SQL ``toks``
    CTE oracles both."""
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    o_id, o_dup, o_top = [], [], []
    for did, txt in zip(ids, texts):
        toks = (txt or "").lower().split()
        if not toks:
            continue
        counts: dict = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        top = max(counts.values())
        if len(toks) >= 2:
            bigrams = set()
            for i in range(len(toks) - 1):
                bigrams.add((toks[i], toks[i + 1]))
            dup = 1.0 - float(len(bigrams)) / float(len(toks) - 1)
        else:
            dup = None
        o_id.append(did)
        o_dup.append(dup)
        o_top.append(float(top) / float(len(toks)))
    return pa.table({
        "doc_id": pa.array(o_id, pa.int64()),
        "dup_bigram_frac": pa.array(o_dup, pa.float64()),
        "top_token_frac": pa.array(o_top, pa.float64()),
    })

class PatternCounter:
    """Actor-pool stage: PII / markup pattern counts per document —
    the C4-style filtering inputs (emails, URLs, phone-like numbers;
    engine addition).  Patterns compile ONCE per actor (__init__),
    counting is findall per doc; all three patterns are
    alternation-free so RE2-style and backtracking engines agree on
    the match set (the cross-oracle safety property).

    Use: ``ds.map_batches(PatternCounter, batch_format="pyarrow",
    concurrency=N)``.  Output: doc_id, n_emails, n_urls, n_phones.
    """

    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
    URL = r"https?://[^\s]+"
    PHONE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"

    def __init__(self):
        self.email = re.compile(self.EMAIL)
        self.url = re.compile(self.URL)
        self.phone = re.compile(self.PHONE)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        ne, nu, np_ = [], [], []
        for txt in texts:
            txt = txt or ""
            ne.append(len(self.email.findall(txt)))
            nu.append(len(self.url.findall(txt)))
            np_.append(len(self.phone.findall(txt)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_emails": pa.array(ne, pa.int64()),
            "n_urls": pa.array(nu, pa.int64()),
            "n_phones": pa.array(np_, pa.int64()),
        })



def _label_term_partials(t: pa.Table, label_col: str,
                         text_col: str) -> pa.Table:
    """Per-batch partial (label, term, c) counts — the combiner half
    of the NB shuffle (pre-aggregate before the keyed groupby)."""
    import itertools

    labels = t.column(label_col).to_pylist()
    s = pd.Series(t.column(text_col).to_pylist(), dtype=object).fillna("")
    toks = s.str.strip().str.lower().str.split()
    nt = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    keep = nt > 0
    if not keep.any():
        return pa.table({
            "label": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        })
    lab = np.repeat(np.asarray(labels, dtype=object)[keep], nt[keep])
    terms = np.asarray(
        list(itertools.chain.from_iterable(toks[keep])), dtype=object)
    order = np.lexsort((terms, lab))
    lo, to = lab[order], terms[order]
    new = np.ones(len(lo), dtype=bool)
    new[1:] = (lo[1:] != lo[:-1]) | (to[1:] != to[:-1])
    idx = np.flatnonzero(new)
    c = np.diff(np.append(idx, len(lo)))
    return pa.table({
        "label": pa.array(lo[idx].tolist(), pa.string()),
        "term": pa.array(to[idx].tolist(), pa.string()),
        "c": pa.array(c.astype(np.int64), pa.int64()),
    })


def nb_train(docs, label_col: str = "lang", text_col: str = "text"):
    """Multinomial Naive Bayes TRAINING, distributed and exact-
    integer — the lightweight doc classifier of classic data curation
    (quality/language/domain tagging before the expensive models).

    Scale shape: per-batch PARTIAL (label, term) counts (vectorized
    lexsort run-length, the combiner) -> ONE (label, term)-keyed
    grouped_aggregate; label priors (doc counts, token totals) the
    same way on tiny keys.  Everything is integer counts, so the
    model rows hash-match a SQL oracle exactly.

    Returns (counts, priors): ``counts`` = Dataset(label, term,
    count); ``priors`` = Dataset(label, n_docs, n_tokens).  Same
    tokenization contract as :func:`explode_terms_batch`
    (``lower().strip().split()``).
    """
    from ..pipelines import relational as R

    parts = docs.map_batches(
        lambda t: _label_term_partials(t, label_col, text_col),
        batch_format="pyarrow")
    counts = R.grouped_aggregate(
        parts, ["label", "term"], [("c", "sum", "count")])

    def doc_partials(t: pa.Table) -> pa.Table:
        labels = t.column(label_col).to_pylist()
        s = pd.Series(t.column(text_col).to_pylist(),
                      dtype=object).fillna("")
        nt = (s.str.strip().str.lower().str.split().str.len()
              .fillna(0).astype(np.int64).to_numpy())
        keep = nt > 0
        return pa.table({
            "label": pa.array(
                np.asarray(labels, dtype=object)[keep].tolist(),
                pa.string()),
            "one": pa.array(np.ones(int(keep.sum()), np.int64),
                            pa.int64()),
            "ntok": pa.array(nt[keep], pa.int64()),
        })

    priors = R.grouped_aggregate(
        docs.map_batches(doc_partials, batch_format="pyarrow"),
        ["label"], [("one", "sum", "n_docs"), ("ntok", "sum", "n_tokens")])
    return counts, priors


class NBScorer:
    """Actor-pool stage: score/classify documents against a BROADCAST
    Naive Bayes model (``ray.put`` the (counts_table, priors_table)
    pair once; every actor builds its lookup dict in ``__init__``,
    never per batch).  Laplace-smoothed multinomial log scores;
    prediction = argmax, ties broken by lexicographically smallest
    label (deterministic).  Out-of-vocabulary terms contribute the
    smoothing floor."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        counts, priors = ray.get(model_ref)
        self.text_col = text_col
        self.id_col = id_col
        self.labels = sorted(priors.column("label").to_pylist())
        nd = dict(zip(priors.column("label").to_pylist(),
                      priors.column("n_docs").to_pylist()))
        ntok = dict(zip(priors.column("label").to_pylist(),
                        priors.column("n_tokens").to_pylist()))
        vocab = set(counts.column("term").to_pylist())
        self.v = len(vocab)
        self.total_docs = sum(nd.values())
        self.log_prior = {
            lb: float(np.log(nd[lb] / self.total_docs))
            for lb in self.labels}
        self.denom = {lb: float(ntok[lb] + self.v)
                      for lb in self.labels}
        # vectorized lookup structures: term -> row index into a
        # precomputed (n_terms + 1, n_labels) LOG-probability matrix
        # (last row = out-of-vocabulary smoothing floor); per batch
        # the only Python work is one dict lookup per token
        terms = sorted({tm for tm in counts.column("term").to_pylist()})
        self.term_idx = {tm: i for i, tm in enumerate(terms)}
        lab_idx = {lb: j for j, lb in enumerate(self.labels)}
        cnt = np.zeros((len(terms) + 1, len(self.labels)), np.float64)
        for lb, tm, c in zip(counts.column("label").to_pylist(),
                             counts.column("term").to_pylist(),
                             counts.column("count").to_pylist()):
            cnt[self.term_idx[tm], lab_idx[lb]] = float(c)
        denom_vec = np.array([self.denom[lb] for lb in self.labels])
        self.logp = np.log((cnt + 1.0) / denom_vec[None, :])
        self.prior_vec = np.array(
            [self.log_prior[lb] for lb in self.labels])

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_pylist()
        texts = t.column(self.text_col).to_pylist()
        oov = len(self.term_idx)
        out_id, out_pred, out_score = [], [], []
        get = self.term_idx.get
        for did, x in zip(ids, texts):
            toks = (x or "").strip().lower().split()
            if not toks:
                continue
            idx = np.fromiter((get(tm, oov) for tm in toks),
                              np.int64, len(toks))
            scores = self.prior_vec + self.logp[idx].sum(axis=0)
            j = int(scores.argmax())      # ties -> smallest label
            out_id.append(did)
            out_pred.append(self.labels[j])
            out_score.append(float(scores[j]))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "pred": pa.array(out_pred, pa.string()),
            "log_score": pa.array(out_score, pa.float64()),
        })


class DomainExtractor:
    """Actor-pool stage: URL DOMAIN extraction per document — the C4
    provenance primitive (per-domain corpus statistics drive the
    blocklist / quality-weighting decisions).  Pattern compiled once
    per actor; alternation-free like the PatternCounter family so
    RE2-style and backtracking engines agree.  Emits one row per
    (doc_id, domain) with its in-doc occurrence count — the partial
    the per-domain aggregation consumes."""

    DOMAIN = r"https?://([A-Za-z0-9.-]+)"

    def __init__(self):
        self.pat = re.compile(self.DOMAIN)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        o_id, o_dom, o_c = [], [], []
        for did, txt in zip(ids, texts):
            doms = sorted(set(m.lower() for m in
                              self.pat.findall(txt or "")))
            counts = {}
            for m in self.pat.findall(txt or ""):
                counts[m.lower()] = counts.get(m.lower(), 0) + 1
            for dm in doms:
                o_id.append(did)
                o_dom.append(dm)
                o_c.append(counts[dm])
        return pa.table({
            "doc_id": pa.array(o_id, pa.int64()),
            "domain": pa.array(o_dom, pa.string()),
            "n": pa.array(o_c, pa.int64()),
        })


def domain_stats(docs, concurrency: int = 4):
    """Per-domain corpus statistics: (domain, n_docs, n_urls) via the
    DomainExtractor partials and ONE domain-keyed grouped_aggregate —
    the C4 provenance table."""
    from ..pipelines import relational as R

    parts = docs.map_batches(DomainExtractor, batch_format="pyarrow",
                             concurrency=concurrency)

    def one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64), pa.int64()))

    return R.grouped_aggregate(
        parts.map_batches(one, batch_format="pyarrow"),
        ["domain"], [("one", "sum", "n_docs"), ("n", "sum", "n_urls")])


def top_terms(docs, *, k: int = 20, per_batch_cap: int = 200,
              text_col: str = "text"):
    """Corpus-wide top-k terms with a BOUNDED shuffle — the heavy-
    hitters primitive for vocabularies too large to groupby in full
    (tokenizer prep / stopword discovery at corpus scale).

    Three-stage shape with an HONEST exactness certificate:

    1. map_batches: exact per-batch term counts (vectorized lexsort),
       but only each batch's top ``per_batch_cap`` terms are EMITTED,
       plus one row carrying the batch's cap-th count — any term
       never emitted has total count < sum(cap-th counts)
       (the classic two-pass threshold argument);
    2. one term-keyed groupby over the emitted rows -> candidate
       partial sums + the global threshold (tiny);
    3. recount pass: the top ~2k candidates broadcast via ray.put,
       one more map_batches computes their EXACT counts, a tiny
       groupby finalizes.  The result is PROVABLY the exact top-k
       when the k-th exact count >= threshold; the ``proven`` column
       says so row by row (no silent approximation).

    Returns a Dataset (term, count, rank, proven) of k rows ordered
    by (count desc, term asc)."""
    import itertools

    import ray

    from ..pipelines import relational as R

    cap = int(per_batch_cap)

    def batch_top(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column(text_col).to_pylist(),
                      dtype=object).fillna("")
        toks = s.str.strip().str.lower().str.split()
        allt = np.asarray(list(itertools.chain.from_iterable(
            toks.dropna())), dtype=object)
        if len(allt) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64()),
                             "thresh": pa.array([], pa.int64())})
        order = np.argsort(allt, kind="stable")
        st = allt[order]
        new = np.ones(len(st), dtype=bool)
        new[1:] = st[1:] != st[:-1]
        idx = np.flatnonzero(new)
        counts = np.diff(np.append(idx, len(st)))
        terms = st[idx]
        if len(terms) > cap:
            top = np.argsort(-counts, kind="stable")[:cap]
            thresh = int(counts[np.argsort(-counts,
                                           kind="stable")[cap]])
            terms, counts = terms[top], counts[top]
        else:
            thresh = 0
        out_t = list(terms) + [""]
        out_c = list(counts.astype(np.int64)) + [0]
        out_th = [0] * len(terms) + [thresh]
        return pa.table({"term": pa.array(out_t, pa.string()),
                         "c": pa.array(out_c, pa.int64()),
                         "thresh": pa.array(out_th, pa.int64())})

    emitted = docs.map_batches(batch_top, batch_format="pyarrow")
    agg = R.grouped_aggregate(
        emitted, ["term"],
        [("c", "sum", "csum"), ("thresh", "sum", "tsum")]).to_pandas()
    threshold = int(agg.loc[agg.term == "", "tsum"].sum())
    cand = agg[agg.term != ""].sort_values(
        ["csum", "term"], ascending=[False, True]).head(2 * k)
    cand_set = ray.put(frozenset(cand.term))

    def recount(t: pa.Table) -> pa.Table:
        want = ray.get(cand_set)
        s = pd.Series(t.column(text_col).to_pylist(),
                      dtype=object).fillna("")
        toks = s.str.strip().str.lower().str.split()
        counts: dict[str, int] = {}
        for tk in itertools.chain.from_iterable(toks.dropna()):
            if tk in want:
                counts[tk] = counts.get(tk, 0) + 1
        return pa.table({
            "term": pa.array(list(counts), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    exact = R.grouped_aggregate(
        docs.map_batches(recount, batch_format="pyarrow"),
        ["term"], [("c", "sum", "count")]).to_pandas()
    exact = exact.sort_values(["count", "term"],
                              ascending=[False, True]).head(k)
    exact = exact.reset_index(drop=True)
    kth = int(exact["count"].iloc[-1]) if len(exact) else 0
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "term": pa.array(exact["term"], pa.string()),
        "count": pa.array(exact["count"].astype(np.int64), pa.int64()),
        "rank": pa.array(np.arange(1, len(exact) + 1), pa.int64()),
        "proven": pa.array([kth >= threshold] * len(exact),
                           pa.bool_()),
    }))


def word_counts(docs, *, text_col: str = "text",
                min_count: int = 1):
    """Distinct-word frequency table via per-batch partial counts and
    ONE word-keyed grouped_aggregate (the combiner discipline) —
    the input every word-level tokenizer trainer consumes.  Words
    below ``min_count`` are dropped AFTER the exact global count (a
    visible prune, not a sampling bias)."""
    import itertools

    from ..pipelines import relational as R

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t.column(text_col).to_pylist(),
                      dtype=object).fillna("")
        toks = s.str.strip().str.lower().str.split()
        allt = np.asarray(list(itertools.chain.from_iterable(
            toks.dropna())), dtype=object)
        if len(allt) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        order = np.argsort(allt, kind="stable")
        st = allt[order]
        new = np.ones(len(st), dtype=bool)
        new[1:] = st[1:] != st[:-1]
        idx = np.flatnonzero(new)
        return pa.table({
            "word": pa.array(st[idx].tolist(), pa.string()),
            "c": pa.array(np.diff(np.append(idx, len(st)))
                          .astype(np.int64), pa.int64()),
        })

    agg = R.grouped_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["word"], [("c", "sum", "count")])
    if min_count > 1:
        import pyarrow.compute as pc

        thr = int(min_count)

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(
                t.column("count"), pa.scalar(thr, pa.int64())))

        agg = agg.map_batches(prune, batch_format="pyarrow")
    return agg


def bpe_train(docs, *, num_merges: int = 50, min_count: int = 1,
              text_col: str = "text"):
    """Byte-pair-encoding tokenizer training — the standard LLM
    tokenizer prep, shaped the way practice shapes it: the EXPENSIVE
    part (word frequencies over the corpus) is distributed
    (:func:`word_counts`), and the greedy merge loop runs over the
    bounded word-frequency table (the k-means-centroid precedent for
    driver-side small-state reductions).  Deterministic: the most
    frequent adjacent symbol pair merges each round, ties broken by
    the lexicographically smallest (left, right) pair.

    Returns (merges, vocab): ``merges`` = ordered [(left, right)]
    list; ``vocab`` = final symbol set.  Words carry the
    end-of-word marker '</w>' on their last symbol (the classic
    Sennrich formulation)."""
    wc = word_counts(docs, text_col=text_col,
                     min_count=min_count).to_pandas()
    words: dict[tuple, int] = {}
    for w, c in zip(wc["word"], wc["count"]):
        syms = tuple(list(w[:-1]) + [w[-1] + "</w>"]) if w else ()
        if syms:
            words[syms] = words.get(syms, 0) + int(c)
    merges: list[tuple] = []
    for _ in range(int(num_merges)):
        pairs: dict[tuple, int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words: dict[tuple, int] = {}
        for syms, c in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    vocab = sorted({s for syms in words for s in syms})
    return merges, vocab


class BpeApply:
    """Actor-pool stage: encode documents with a trained BPE merge
    list (broadcast once via ray.put; merge-rank dict built per actor
    in __init__).  Emits (doc_id, n_tokens, n_unk) — the tokenized-
    length accounting step before packing."""

    def __init__(self, merges_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        merges = ray.get(merges_ref)
        self.rank = {tuple(m): i for i, m in enumerate(merges)}
        self.vocab = {a + b for a, b in merges}
        self.text_col = text_col
        self.id_col = id_col

    def _encode_word(self, w: str) -> list[str]:
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = self.rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None
                                      or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i]
                                       + syms[best_i + 1]]
        return syms

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column(self.id_col).to_pylist()
        texts = t.column(self.text_col).to_pylist()
        cache: dict[str, int] = {}
        o_n, o_u = [], []
        for x in texts:
            n = u = 0
            for w in (x or "").strip().lower().split():
                if w not in cache:
                    cache[w] = len(self._encode_word(w))
                n += cache[w]
            o_n.append(n)
            o_u.append(u)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(o_n, pa.int64()),
            "n_unk": pa.array(o_u, pa.int64()),
        })


def pack_sequences(doc_tokens, *, seq_len: int = 2048,
                   num_partitions: int = 16):
    """Sequence packing for training-batch prep: assign documents to
    fixed-``seq_len`` bins (first-fit-decreasing) ahead of
    concatenate-and-mask dataloading.

    Scale shape: docs hash-partition by id (ONE shuffle); each
    partition packs its own docs with an O(n log n) best-fit-
    decreasing loop (sorted lengths, binary search over bin
    remainders) and emits globally-unique bin ids as
    ``partition * 2^40 + local``.  Per-partition packing is the
    standard practical compromise (exact global FFD is inherently
    sequential); the waste it costs is REPORTED, not hidden: the
    output carries (doc_id, n_tokens, bin_id, offset, truncated) with
    over-length docs FLAGGED and truncated to ``seq_len`` rather than
    silently dropped — downstream counters see exactly what happened.
    """
    import bisect

    from ..pipelines import relational as R  # noqa: F401 (parity)

    L = int(seq_len)
    if L < 1:
        raise ValueError("seq_len must be >= 1")

    def add_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h = (ids ^ (ids >> np.uint64(33))) * np.uint64(
            0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        return t.append_column("__part", pa.array(
            (h % np.uint64(num_partitions)).astype(np.int64),
            pa.int64()))

    def pack(g: pa.Table) -> pa.Table:
        part = int(g.column("__part")[0].as_py()) if g.num_rows else 0
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        nt = g.column("n_tokens").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -nt))        # longest first, stable
        # best-fit decreasing: sorted list of (remaining, bin index)
        rems: list = []                       # sorted remainders
        rbins: list = []
        fills = []
        out_bin = np.empty(len(ids), np.int64)
        out_off = np.empty(len(ids), np.int64)
        out_trunc = np.zeros(len(ids), bool)
        for k in order:
            n = int(nt[k])
            if n > L:
                out_trunc[k] = True
                n = L
            j = bisect.bisect_left(rems, n)
            if j < len(rems):
                rem = rems.pop(j)
                b = rbins.pop(j)
            else:
                b = len(fills)
                fills.append(0)
                rem = L
            out_bin[k] = b
            out_off[k] = fills[b]
            fills[b] += n
            nr = rem - n
            j2 = bisect.bisect_left(rems, nr)
            rems.insert(j2, nr)
            rbins.insert(j2, b)
        base = part << 40
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "bin_id": pa.array(out_bin + base, pa.int64()),
            "offset": pa.array(out_off, pa.int64()),
            "truncated": pa.array(out_trunc, pa.bool_()),
        })

    return (doc_tokens.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(pack, batch_format="pyarrow"))
