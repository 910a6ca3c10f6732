"""Benchmark decontamination: flag training documents that share word
n-grams with a (small) benchmark/eval corpus.

The standard training-data hygiene step (GPT-3 §C / Gopher §A.3 style):
any document containing an n-gram that also appears in a held-out
benchmark set is contaminated and must be dropped before training.

Shape at 100 TB: the benchmark side is SMALL by construction (eval sets
are thousands of documents, not billions), so this is the canonical
broadcast-semi-join — the benchmark's distinct shingle-hash set is built
once, ``ray.put`` once, and every ``map_batches`` task does a vectorized
``searchsorted`` membership probe against the shared-memory copy. No
shuffle, no join; the training corpus streams through untouched.

Shingles reuse the :mod:`.setjoin` tokenizer (one string-hash pass per
batch + flat Horner gram combine — grams never materialize as strings),
so a 64-bit gram hash here equals a gram-string match in the SQL oracle
up to hash collisions (~n²/2⁶⁵ — negligible at any real corpus size,
and the oracle comparison at sf0.01 would surface one immediately).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .setjoin import _gram_hashes_flat
from .sketches import hash_strings


def benchmark_ngram_hashes(texts, n: int = 5) -> np.ndarray:
    """Sorted distinct uint64 hashes of the word ``n``-grams of the
    benchmark corpus (lowercased, whitespace-tokenized — mirrors the SQL
    formulation ``string_split_regex(trim(lower(text)), '\\s+')``)."""
    grams = []
    for t in texts:
        words = t.lower().split() if t else []
        if len(words) >= n:
            grams.append(_gram_hashes_flat(hash_strings(words), n))
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(grams))


class ContaminationTagger:
    """map_batches: (id, text) → (id, n_contam, contaminated).

    ``n_contam`` counts the DISTINCT n-grams of the document that appear
    in the benchmark set (distinct — so a contaminated gram repeated in
    one document counts once, matching the SQL oracle's join-on-distinct
    semantics)."""

    def __init__(self, bench_ref, column: str, id_column: str, n: int = 5):
        # hold the ObjectRef, NOT the array: the instance is pickled into
        # every task, so resolving here would re-ship the benchmark set per
        # task instead of reading the one object-store copy
        self.bench_ref = bench_ref
        self.column = column
        self.id_column = id_column
        self.n = n

    def __call__(self, batch: pa.Table, words_lists=None) -> pa.Table:
        import ray

        # zero-copy shared-memory read of the broadcast array per task
        bench = ray.get(self.bench_ref)
        texts = batch[self.column].to_pylist()
        n = self.n
        word_lists = (
            words_lists if words_lists is not None
            else [t.lower().split() if t else [] for t in texts]
        )
        counts = np.fromiter(
            (len(w) for w in word_lists), count=len(word_lists), dtype=np.int64
        )
        all_words = [w for ws in word_lists for w in ws]
        wh = hash_strings(all_words)
        flat = _gram_hashes_flat(wh, n)
        starts = np.concatenate(([0], np.cumsum(counts)))
        vcounts = np.maximum(counts - n + 1, 0)
        n_contam = np.zeros(len(texts), dtype=np.int64)
        for i, vc in enumerate(vcounts.tolist()):
            if vc == 0:
                continue
            doc_grams = np.unique(flat[starts[i] : starts[i] + vc])
            # membership via searchsorted on the sorted benchmark array —
            # O(g log B) per doc, fully vectorized
            pos = np.searchsorted(bench, doc_grams)
            pos[pos == len(bench)] = 0
            n_contam[i] = int(
                np.count_nonzero(bench[pos] == doc_grams) if len(bench) else 0
            )
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "n_contam": pa.array(n_contam),
                "contaminated": pa.array(n_contam > 0),
            }
        )


def decontaminate(
    ds,
    benchmark_texts,
    column: str = "text",
    id_column: str = "doc_id",
    ngram_words: int = 5,
):
    """Tag every document in ``ds`` with its benchmark n-gram overlap.

    Returns a Dataset of (id, n_contam, contaminated) — the caller filters
    ``contaminated`` to drop, or keeps the counts for reporting. Light
    per-task state (one broadcast ref) → task pool, not actor pool."""
    import ray

    bench_ref = ray.put(benchmark_ngram_hashes(benchmark_texts, ngram_words))
    return ds.map_batches(
        ContaminationTagger(bench_ref, column, id_column, ngram_words),
        batch_format="pyarrow",
    )
