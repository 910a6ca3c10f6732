"""Text-analysis stages over a document column (SURVEY-extension ops).

All stages are vectorized-per-batch ``map_batches`` callables; stateful
setup (compiled regexes, stopword sets, n-gram profiles) happens once per
actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


class TokenCounter:
    """Whitespace token count + BPE-ish subword estimate.

    ``n_tokens`` matches ``str.split()`` semantics (runs of whitespace,
    ignore leading/trailing) so a SQL oracle can reproduce it; ``n_subwords``
    is a GPT-style approximation (word-piece regex) for budget estimation.
    """

    def __init__(self, column: str = "text"):
        self.column = column
        self.bpe_re = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        n_tokens = np.fromiter(
            (len(t.split()) if t else 0 for t in texts), dtype=np.int64, count=len(texts)
        )
        n_subwords = np.fromiter(
            (len(self.bpe_re.findall(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        out = batch.append_column("n_tokens", pa.array(n_tokens))
        return out.append_column("n_subwords", pa.array(n_subwords))


class QualityScorer:
    """Heuristic document quality features: length, punctuation density,
    stopword ratio, mean word length, uppercase ratio + a combined score."""

    STOPWORDS = frozenset(
        "the a an and or of to in is are was were be been it this that with "
        "for on as at by from".split()
    )

    def __init__(self, column: str = "text"):
        self.column = column
        self.punct_re = re.compile(r"[.!?,;:]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        n = len(texts)
        length = np.zeros(n, dtype=np.int64)
        punct = np.zeros(n, dtype=np.int64)
        stop_ratio = np.zeros(n)
        mean_wlen = np.zeros(n)
        for i, t in enumerate(texts):
            if not t:
                continue
            length[i] = len(t)
            punct[i] = len(self.punct_re.findall(t))
            words = t.lower().split()
            if words:
                stop_ratio[i] = sum(w in self.STOPWORDS for w in words) / len(words)
                mean_wlen[i] = sum(len(w) for w in words) / len(words)
        score = (
            np.clip(length / 500.0, 0, 1) * 0.3
            + np.clip(stop_ratio * 3.0, 0, 1) * 0.4
            + np.clip((mean_wlen - 2.0) / 6.0, 0, 1) * 0.3
        )
        out = batch.append_column("q_len", pa.array(length))
        out = out.append_column("q_punct", pa.array(punct))
        out = out.append_column("q_stop_ratio", pa.array(stop_ratio))
        out = out.append_column("q_score", pa.array(score))
        return out


# Tiny per-language character/stopword profiles for heuristic language ID.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in"},
    "fr": {"le", "la", "et", "de", "est", "un"},
    "de": {"der", "die", "und", "ist", "das", "ein"},
    "es": {"el", "la", "de", "que", "es", "un"},
    "zh": set(),  # detected by script below
    "ja": set(),
}


class LangId:
    """n-gram/stopword + script heuristic language identifier."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def _classify(self, t: str) -> str:
        if not t:
            return "und"
        cjk = sum(1 for c in t[:200] if "一" <= c <= "鿿")
        kana = sum(1 for c in t[:200] if "぀" <= c <= "ヿ")
        if kana > 2:
            return "ja"
        if cjk > 2:
            return "zh"
        words = set(t.lower().split())
        scores = {
            lang: len(words & profile) for lang, profile in self.profiles.items()
        }
        best = max(scores, key=scores.get)
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t) for t in batch[self.column].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


class Fingerprinter:
    """64-bit rolling polynomial hash of normalised text (document
    fingerprint for exact-dup detection with a SQL-checkable definition:
    applied to lowercased whitespace-collapsed text)."""

    def __init__(self, column: str = "text", out_column: str = "fingerprint"):
        self.column = column
        self.out_column = out_column
        self.ws_re = re.compile(r"\s+")

    def fingerprint(self, t: str) -> int:
        # polynomial rolling hash mod 2^64, fully vectorized:
        #   h = offset * P^n + Σ byte_i * P^(n-1-i)
        # (the per-byte FNV chain is sequential by construction and cost a
        # Python iteration per byte)
        norm = self.ws_re.sub(" ", t.strip().lower()) if t else ""
        data = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = len(data)
        if n == 0:
            return 0
        P = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            powers = np.full(n, P, dtype=np.uint64)
            powers[0] = np.uint64(1)
            powers = np.cumprod(powers)  # [1, P, P², …] wrapping mod 2^64
            h = np.uint64(1469598103934665603) * powers[-1] * P
            h += (data * powers[::-1]).sum(dtype=np.uint64)
        return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, batch: pa.Table) -> pa.Table:
        with np.errstate(over="ignore"):
            fps = [self.fingerprint(t) for t in batch[self.column].to_pylist()]
        return batch.append_column(self.out_column, pa.array(fps, pa.int64()))
