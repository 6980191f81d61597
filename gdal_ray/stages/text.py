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


class QualityScorer:
    """Quality signals per doc: n_chars, alpha/digit/punct/space ratios,
    stopword ratio, mean word length (all vectorized pandas)."""

    def __init__(self):
        self.stop = _STOPWORDS["en"]

    def __call__(self, t: pa.Table) -> pa.Table:
        s = pd.Series(t.column("text").to_pylist(), dtype=object).fillna("")
        n = s.str.len().clip(lower=1)
        alpha = s.str.count(r"[A-Za-z]")
        digit = s.str.count(r"[0-9]")
        punct = s.str.count(r"[^\w\s]")
        space = s.str.count(r"\s")
        words = s.str.split()
        n_words = words.str.len().clip(lower=1)
        stop = self.stop
        stop_cnt = words.map(lambda ws: sum(1 for w in ws if w.lower() in stop))
        mean_wl = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_chars": pa.array(s.str.len().to_numpy(np.int64), pa.int64()),
                "alpha_ratio": pa.array((alpha / n).to_numpy(np.float64)),
                "digit_ratio": pa.array((digit / n).to_numpy(np.float64)),
                "punct_ratio": pa.array((punct / n).to_numpy(np.float64)),
                "space_ratio": pa.array((space / n).to_numpy(np.float64)),
                "stopword_ratio": pa.array((stop_cnt / n_words).to_numpy(np.float64)),
                "mean_word_len": pa.array(mean_wl.to_numpy(np.float64)),
            }
        )


class LangId:
    """Heuristic language ID: stopword vote across 4 languages, 'und'
    when no evidence (word lists compiled once per actor)."""

    def __init__(self):
        self.tables = {lang: ws for lang, ws in _STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        out = []
        for x in texts:
            toks = [w.lower() for w in (x or "").split()]
            best, best_n = "und", 0
            for lang, ws in self.tables.items():
                n = sum(1 for w in toks if w in ws)
                if n > best_n:
                    best, best_n = lang, n
            out.append(best)
        return pa.table(
            {"doc_id": t.column("doc_id"), "pred_lang": pa.array(out, pa.string())}
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
