"""Text-analysis stages over a document column (SURVEY-extension ops).

All stages are vectorized-per-batch ``map_batches`` callables; stateful
setup (compiled regexes, stopword sets, n-gram profiles) happens once per
actor in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .sketches import hash_strings, re2_tokens, re2_words


class TokenCounter:
    """Whitespace token count + BPE-ish subword estimate.

    ``n_tokens`` follows the engine-wide tokenization contract
    (``sketches.re2_tokens``: RE2 '\\s+' runs, empties dropped) so the
    SQL oracle reproduces it on ANY input — identical to ``str.split()``
    on ASCII text without VT/FS/GS/RS/US; ``n_subwords`` is a GPT-style
    approximation (word-piece regex) for budget estimation.
    """

    def __init__(self, column: str = "text"):
        self.column = column
        self.bpe_re = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.column].to_pylist()
        n_tokens = np.fromiter(
            (len(re2_tokens(t)) for t in texts), dtype=np.int64, count=len(texts)
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
        self._stop_hashes = np.sort(hash_strings(sorted(self.STOPWORDS)))

    def __call__(self, batch: pa.Table, words_lists=None,
                 word_hashes=None) -> pa.Table:
        # ``words_lists`` / ``word_hashes``: precomputed lowercase word
        # lists (and their flat hash array) — fused callers
        # (CurationFilter) tokenize AND hash once for all kernels
        import pyarrow.compute as pc

        col = batch[self.column]
        n = len(col)
        # length/punct: Arrow C kernels over the whole column (the per-doc
        # Python re.findall loop this replaces dominated the stage)
        length = pc.fill_null(
            pc.utf8_length(col), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        punct = pc.fill_null(
            pc.count_substring_regex(col, "[.!?,;:]"), 0
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # tokenization contract: sketches.re2_words (RE2 '\s+' class) —
        # the canonical tokenizer for every oracle-compared operator;
        # str.split() diverges on NBSP/VT/FS-class whitespace
        word_lists = (
            words_lists
            if words_lists is not None
            else [re2_words(t) for t in col.to_pylist()]
        )
        counts = np.fromiter(
            (len(ws) for ws in word_lists), count=n, dtype=np.int64
        )
        all_words = [w for ws in word_lists for w in ws]
        stop_counts = np.zeros(n, dtype=np.int64)
        wlen_sums = np.zeros(n, dtype=np.int64)
        if all_words:
            # ONE flat pass: hashed stopword membership + word lengths,
            # segment-summed via cumsum differences (reduceat mishandles
            # empty segments)
            wh = hash_strings(all_words) if word_hashes is None else word_hashes
            pos = np.searchsorted(self._stop_hashes, wh)
            pos[pos == len(self._stop_hashes)] = 0
            is_stop = (self._stop_hashes[pos] == wh).astype(np.int64)
            wlen = np.fromiter(
                (len(w) for w in all_words), count=len(all_words),
                dtype=np.int64,
            )
            bounds = np.concatenate(([0], np.cumsum(counts)))
            cs = np.concatenate(([0], np.cumsum(is_stop)))
            cl = np.concatenate(([0], np.cumsum(wlen)))
            stop_counts = cs[bounds[1:]] - cs[bounds[:-1]]
            wlen_sums = cl[bounds[1:]] - cl[bounds[:-1]]
        nz = np.maximum(counts, 1)
        stop_ratio = np.where(counts > 0, stop_counts / nz, 0.0)
        mean_wlen = np.where(counts > 0, wlen_sums / nz, 0.0)
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


class RepetitionScorer:
    """Gopher-style repetition features over lowercased whitespace tokens:

    * ``n_words``          — token count
    * ``dup_word_frac``    — ``1 − distinct/total`` (mass of repeated words)
    * ``top_word_frac``    — most frequent word's share of all words
    * ``top_bigram_frac``  — most frequent word-bigram's share of bigrams

    Boilerplate/spam detectors in training-data pipelines threshold these
    (e.g. drop top_bigram_frac > 0.18). All four are SQL-reproducible
    (list/unnest aggregation), so the operator is oracle-checked; fractions
    are emitted UNROUNDED — identical integer ratios divide to bit-identical
    doubles on both sides."""

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column

    @staticmethod
    def _per_doc_run_stats(doc_idx, keys, n_docs):
        """Per-doc (#distinct keys, max key multiplicity) in ONE flat
        lexsort pass — replaces a per-doc ``np.unique`` loop."""
        order = np.lexsort((keys, doc_idx))
        d, k = doc_idx[order], keys[order]
        newrun = np.concatenate(([True], (d[1:] != d[:-1]) | (k[1:] != k[:-1])))
        run_ids = np.cumsum(newrun) - 1
        run_doc = d[newrun]
        run_len = np.bincount(run_ids)
        distinct = np.bincount(run_doc, minlength=n_docs)
        doc_start = np.concatenate(([True], run_doc[1:] != run_doc[:-1]))
        idxs = np.flatnonzero(doc_start)
        max_run = np.zeros(n_docs, dtype=np.int64)
        if len(idxs):
            max_run[run_doc[idxs]] = np.maximum.reduceat(run_len, idxs)
        return distinct, max_run

    def __call__(self, batch: pa.Table, words_lists=None,
                 word_hashes=None) -> pa.Table:
        texts = batch[self.column].to_pylist()
        n = len(texts)
        # tokenization contract: sketches.re2_words, same as QualityScorer
        word_lists = (
            words_lists if words_lists is not None
            else [re2_words(t) for t in texts]
        )
        counts = np.fromiter(
            (len(ws) for ws in word_lists), count=n, dtype=np.int64
        )
        n_words = counts.copy()
        dup_frac = np.zeros(n)
        top_word = np.zeros(n)
        top_bigram = np.zeros(n)
        all_words = [w for ws in word_lists for w in ws]
        if all_words:
            # word identity travels as 64-bit hashes (collision odds
            # ~words²/2⁶⁵ per doc — the same documented argument as every
            # gram-hash operator; the sf0.01 oracle would surface one)
            wh = hash_strings(all_words) if word_hashes is None else word_hashes
            doc_idx = np.repeat(np.arange(n), counts)
            nz = np.maximum(counts, 1)
            distinct, max_run = self._per_doc_run_stats(doc_idx, wh, n)
            has = counts > 0
            dup_frac = np.where(has, 1.0 - distinct / nz, 0.0)
            top_word = np.where(has, max_run / nz, 0.0)
            # bigrams: flat 2-gram hash windows, doc-straddlers discarded
            # (the shared window helper owns the straddle arithmetic)
            from .corpus import _flat_gram_windows

            vcounts = np.maximum(counts - 1, 0)
            bflat = _flat_gram_windows(word_lists, 2, wh)
            if bflat is not None:
                _, bi, _, bdoc = bflat
                _, bmax = self._per_doc_run_stats(bdoc, bi, n)
                nzb = np.maximum(vcounts, 1)
                top_bigram = np.where(vcounts > 0, bmax / nzb, 0.0)
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "n_words": pa.array(n_words),
                "dup_word_frac": pa.array(dup_frac),
                "top_word_frac": pa.array(top_word),
                "top_bigram_frac": pa.array(top_bigram),
            }
        )


class Fingerprinter:
    """64-bit rolling polynomial hash of normalised text (document
    fingerprint for exact-dup detection with a SQL-checkable definition:
    Horner over the UNICODE CODEPOINTS of lowercased whitespace-collapsed
    text, mod 2^64, masked to 63 bits — ``oracle_sql()['doc_fingerprints']``
    reproduces it in DuckDB with a hugeint ``list_reduce``)."""

    def __init__(self, column: str = "text", out_column: str = "fingerprint"):
        self.column = column
        self.out_column = out_column

    def fingerprint(self, t: str) -> int:
        # polynomial rolling hash mod 2^64, fully vectorized:
        #   h = offset * P^n + Σ code_i * P^(n-1-i)   (≡ Horner h = h·P + cᵢ)
        # (the per-char chain is sequential by construction and would cost a
        # Python iteration per char)
        # normalization follows the engine-wide RE2 tokenization contract
        # (Python \s+ / str.strip are Unicode-aware and would diverge from
        # the SQL oracle on NBSP / VT / tab-edge input)
        norm = " ".join(re2_words(t)) if t else ""
        data = np.frombuffer(norm.encode("utf-32-le"), dtype=np.uint32).astype(
            np.uint64
        )
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


class PIIRedactor:
    """PII scrubbing: count + redact emails, phone numbers and IPv4
    addresses in one streaming pass (no shuffle, no payload copy beyond
    the rewritten column).

    The kernels are Arrow's RE2-backed ``count_substring_regex`` /
    ``replace_substring_regex`` — vectorized C++ over the whole batch, and
    the SAME regex engine DuckDB uses, so an oracle written with identical
    patterns is dialect-exact.  Patterns are compiled (RE2 programs cached
    inside Arrow) once per actor via the instance, applied per batch.
    """

    EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
    PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
    IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

    def __init__(self, column: str = "text", out_column: str = "text_redacted"):
        self.column = column
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.column(self.column)
        n_emails = pc.count_substring_regex(t, self.EMAIL)
        n_ips = pc.count_substring_regex(t, self.IPV4)
        n_phones = pc.count_substring_regex(t, self.PHONE)
        # redaction order is part of the contract (emails first — their
        # local part may contain digit runs — then IPs, then phones); the
        # oracle applies the same order
        red = pc.replace_substring_regex(t, self.EMAIL, "<EMAIL>")
        red = pc.replace_substring_regex(red, self.IPV4, "<IP>")
        red = pc.replace_substring_regex(red, self.PHONE, "<PHONE>")
        out = batch.append_column("n_emails", n_emails.cast(pa.int64()))
        out = out.append_column("n_phones", n_phones.cast(pa.int64()))
        out = out.append_column("n_ips", n_ips.cast(pa.int64()))
        return out.append_column(self.out_column, red)
