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
    from .sketches import re2_words

    grams = []
    for t in texts:
        words = re2_words(t)
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

    def __call__(self, batch: pa.Table, words_lists=None,
                 word_hashes=None) -> pa.Table:
        import ray

        # zero-copy shared-memory read of the broadcast array per task
        bench = ray.get(self.bench_ref)
        texts = batch[self.column].to_pylist()
        n = self.n
        from .sketches import re2_words

        word_lists = (
            words_lists if words_lists is not None
            else [re2_words(t) for t in texts]
        )
        n_contam = np.zeros(len(texts), dtype=np.int64)
        from .corpus import _flat_gram_windows

        flat = (
            _flat_gram_windows(word_lists, n, word_hashes)
            if len(bench) else None
        )
        if flat is not None:
            # ONE flat pass for the whole batch (the per-doc loop this
            # replaces paid a numpy-dispatch round per document on a
            # 100%-of-corpus stage): lexsort → per-doc distinct grams →
            # one searchsorted membership probe
            _, grams, _, doc_idx = flat
            from .corpus import distinct_doc_keys

            dd, dg = distinct_doc_keys(doc_idx, grams)
            pos = np.searchsorted(bench, dg)
            pos[pos == len(bench)] = 0
            hit = bench[pos] == dg
            n_contam = np.bincount(
                dd[hit], minlength=len(texts)
            ).astype(np.int64)
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


# ---------------------------------------------------------------------------
# Bloom-filter variant: contamination sets too large to broadcast exactly
# ---------------------------------------------------------------------------

def _bloom_positions(h: np.ndarray, num_hashes: int, bits_log2: int):
    """Kirsch–Mitzenmacher double hashing: k bit positions per 64-bit
    shingle hash, pos_i = (h + i * h2) mod 2^bits_log2 with odd h2."""
    mask = np.uint64((1 << bits_log2) - 1)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    return [((h + np.uint64(i) * h2) & mask) for i in range(num_hashes)]


def build_bloom_filter(
    contam_ds,
    column: str = "text",
    *,
    ngram_words: int = 5,
    bits_log2: int = 26,
    num_hashes: int = 4,
) -> np.ndarray:
    """Distributed Bloom-filter build over a contamination corpus that is
    itself a Dataset (prior training corpus, giant eval suite): the exact
    sorted-hash broadcast of :func:`decontaminate` needs 8 B per DISTINCT
    shingle — beyond ~10⁹ shingles the broadcast side stops fitting, while
    a Bloom filter stays at a FIXED 2^bits_log2 bits (2^26 = 8 MiB)
    regardless of corpus size, trading a tunable false-positive rate
    (never false negatives: nothing contaminated slips through; some clean
    docs are over-dropped — the conservative direction for hygiene).

    Each batch sets its shingles' bits in a local bitmap; bitmaps OR-merge
    through :func:`..sketches.tree_reduce_blobs` (log-depth, the driver
    sees ≤ fanin blobs — OR is the idempotent-commutative monoid here).
    Returns the packed uint64 bitmap (length 2^bits_log2 / 64).
    """
    from .corpus import _doc_words, _flat_gram_windows
    from .sketches import tree_reduce_blobs

    n = ngram_words
    words_len = 1 << max(0, bits_log2 - 6)

    def partial(batch: pa.Table) -> pa.Table:
        bitmap = np.zeros(words_len, dtype=np.uint64)
        word_lists = _doc_words(batch[column].to_pylist())
        flat = _flat_gram_windows(word_lists, n)
        if flat is not None:
            _, grams_all, _, _ = flat
            grams = np.unique(grams_all)
            for pos in _bloom_positions(grams, num_hashes, bits_log2):
                np.bitwise_or.at(
                    bitmap, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )
        return pa.table({"blob": pa.array([bitmap.tobytes()], pa.binary())})

    def combine(blobs: list) -> bytes:
        acc = np.frombuffer(blobs[0], dtype=np.uint64).copy()
        for b in blobs[1:]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return acc.tobytes()

    # batch_size=None → ONE dense bitmap per BLOCK, not per default-sized
    # batch: the build exchange ships #blocks × 2^bits_log2/8 bytes, which
    # at the big-contamination-corpus scale this operator targets is the
    # difference between GBs and the intended few-MiB-per-block
    blobs = tree_reduce_blobs(
        contam_ds.map_batches(
            partial, batch_format="pyarrow", batch_size=None
        ),
        combine,
    )
    if not blobs:
        # empty contamination corpus → nothing is contaminated
        return np.zeros(words_len, dtype=np.uint64)
    return np.frombuffer(combine(blobs), dtype=np.uint64).copy()


class BloomContaminationTagger:
    """map_batches: (id, text) → (id, n_maybe_contam, contaminated) via a
    broadcast Bloom bitmap — one flat vectorized probe per batch (no
    per-doc loop): k position computations over the batch's full gram
    array, AND-reduced, then per-doc distinct-hit counting."""

    def __init__(self, bloom_ref, column: str, id_column: str,
                 n: int = 5, bits_log2: int = 26, num_hashes: int = 4):
        self.bloom_ref = bloom_ref
        self.column = column
        self.id_column = id_column
        self.n = n
        self.bits_log2 = bits_log2
        self.num_hashes = num_hashes

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from .corpus import _doc_words, _flat_gram_windows

        bitmap = ray.get(self.bloom_ref)
        texts = batch[self.column].to_pylist()
        n = self.n
        word_lists = _doc_words(texts)
        counts = np.fromiter(
            (len(w) for w in word_lists), count=len(word_lists),
            dtype=np.int64,
        )
        n_hits = np.zeros(len(texts), dtype=np.int64)
        flat = _flat_gram_windows(word_lists, n)
        if flat is not None:
            _, grams, _, doc_idx = flat
            member = np.ones(len(grams), dtype=bool)
            for pos in _bloom_positions(
                grams, self.num_hashes, self.bits_log2
            ):
                word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
                member &= (
                    (word >> (pos & np.uint64(63))) & np.uint64(1)
                ).astype(bool)
            if member.any():
                # distinct matching grams per doc (mirror the exact
                # tagger's join-on-distinct semantics)
                from .corpus import distinct_doc_keys

                hd, _ = distinct_doc_keys(doc_idx[member], grams[member])
                n_hits = np.bincount(
                    hd, minlength=len(counts)
                ).astype(np.int64)
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "n_maybe_contam": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )


def bloom_decontaminate(
    ds,
    contam_ds,
    column: str = "text",
    id_column: str = "doc_id",
    *,
    ngram_words: int = 5,
    bits_log2: int = 26,
    num_hashes: int = 4,
):
    """Bloom-filter decontamination: build the fixed-size bitmap over
    ``contam_ds`` distributedly, broadcast it once, stream ``ds`` with a
    flat vectorized probe. NO false negatives (every truly contaminated
    doc is flagged); false-positive rate ≈ (1 - e^{-kx/m})^k per distinct
    gram probed. Returns (id, n_maybe_contam, contaminated)."""
    import ray

    bloom = build_bloom_filter(
        contam_ds, column, ngram_words=ngram_words,
        bits_log2=bits_log2, num_hashes=num_hashes,
    )
    bloom_ref = ray.put(bloom)
    return ds.map_batches(
        BloomContaminationTagger(
            bloom_ref, column, id_column, ngram_words,
            bits_log2, num_hashes,
        ),
        batch_format="pyarrow",
    )
