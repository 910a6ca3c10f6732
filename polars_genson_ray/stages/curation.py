"""Fused document-curation filter (C4/Gopher-style keep/drop pass).

Real training pipelines don't run quality, repetition and contamination
as separate scans — they fuse every per-document predicate into ONE
streaming pass and emit a keep flag plus the reasons (so dropped mass is
attributable).  This stage composes the already-tested kernels
(`text.QualityScorer`, `text.RepetitionScorer`,
`decontam.ContaminationTagger`) column-wise inside a single
``map_batches`` callable: one read of the corpus, no shuffle, one output
row per document.

Thresholds are constructor parameters; the defaults are tuned to the
synthetic corpus so each reason fires on a meaningful slice (the oracle
re-states them verbatim in SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .decontam import ContaminationTagger
from .text import QualityScorer, RepetitionScorer


class CurationFilter:
    """(id, text) → (id, features, reason flags, keep).

    ``keep`` is ``NOT (r_short OR r_repetitive OR r_contaminated)`` with

    * ``r_short``        — ``len(text) < min_len``
    * ``r_repetitive``   — ``dup_word_frac > max_dup_word_frac`` or
      ``top_word_frac > max_top_word_frac`` (Gopher repetition rules)
    * ``r_contaminated`` — shares a word n-gram with the benchmark set
      (broadcast shingle-hash probe, same as ``decontam``)
    """

    def __init__(
        self,
        bench_ref,
        *,
        column: str = "text",
        id_column: str = "doc_id",
        ngram_words: int = 5,
        min_len: int = 200,
        max_dup_word_frac: float = 0.6,
        max_top_word_frac: float = 0.15,
    ):
        self.id_column = id_column
        self.min_len = min_len
        self.max_dup_word_frac = max_dup_word_frac
        self.max_top_word_frac = max_top_word_frac
        self._quality = QualityScorer(column)
        self._rep = RepetitionScorer(column, id_column)
        self._tagger = ContaminationTagger(
            bench_ref, column, id_column, ngram_words
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # tokenize ONCE; every kernel reuses the word lists (each used to
        # redo t.lower().split() — 3x the tokenization cost of the scan
        # this stage exists to fuse)
        texts = batch[self._quality.column].to_pylist()
        # RE2-exact tokenization: the contamination kernel must see the
        # SAME word lists as standalone decontaminate (sketches.re2_words)
        # or the fused and standalone verdicts could diverge on non-space
        # whitespace; quality/repetition reuse the same lists
        from .sketches import hash_strings, re2_words

        words = [re2_words(t) for t in texts]
        # hash once too: all three kernels consume the same flat array
        wh = hash_strings([w for ws in words for w in ws])
        q = self._quality(batch, words, wh)
        r = self._rep(batch, words, wh)
        c = self._tagger(batch, words, wh)
        q_len = q.column("q_len").to_numpy()
        dup = r.column("dup_word_frac").to_numpy()
        top = r.column("top_word_frac").to_numpy()
        n_contam = c.column("n_contam").to_numpy()
        r_short = q_len < self.min_len
        r_rep = (dup > self.max_dup_word_frac) | (top > self.max_top_word_frac)
        r_cont = n_contam > 0
        keep = ~(r_short | r_rep | r_cont)
        return pa.table({
            self.id_column: batch.column(self.id_column),
            "q_len": pa.array(q_len),
            "dup_word_frac": pa.array(dup),
            "top_word_frac": pa.array(top),
            "n_contam": pa.array(n_contam),
            "r_short": pa.array(r_short),
            "r_repetitive": pa.array(r_rep),
            "r_contaminated": pa.array(r_cont),
            "keep": pa.array(keep),
        })
