"""Corpus-level statistics operators: global boilerplate n-gram discovery
and unigram-distribution quality scoring.

Both follow the same 100-TB shape — a DISTRIBUTED statistics pass whose
result is small by construction (frequent grams / the vocabulary), then a
broadcast probe pass over the streaming corpus:

* pass 1 aggregates per-batch partial counts under the engine's bucketed
  large-cardinality combine (``aggregate.bucketed_groups`` — distinct
  grams/words scale with data, one task can't hold them);
* the thresholded result (heavy hitters, vocabulary) is collected and
  ``ray.put`` ONCE as sorted hash arrays;
* pass 2 streams the corpus again with a vectorized ``searchsorted``
  membership/lookup per batch — no further shuffle.

Gram/word identity travels as 64-bit hashes between stages (strings never
cross an exchange); the final heavy-hitter output recovers the gram STRING
in the probe pass, so results remain SQL-oracle-comparable. Collision odds
are ~n²/2⁶⁵ — negligible, and the sf0.01 oracle comparison would surface
one immediately.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import bucketed_groups
from .setjoin import _gram_hashes_flat
from .sketches import hash64, hash_strings, re2_words


def _typed_combine_frame(counts, cols: dict) -> pd.DataFrame:
    """Schema-safe collect of a bucketed combine result (a corpus with no
    duplicated grams filters every row out and Ray loses the pandas block
    schema) — delegates to the shared :func:`aggregate.collect_typed`."""
    from .aggregate import collect_typed

    return collect_typed(counts, cols)


def _doc_words(texts) -> list[list[str]]:
    # RE2-exact tokenization (sketches.re2_words): these operators' outputs
    # are oracle-compared, and str.split()'s Unicode whitespace diverges
    # from the SQL's string_split_regex('\s+') on NBSP/thin-space inputs
    return [re2_words(t) for t in texts]


def distinct_doc_keys(doc_idx: np.ndarray, keys: np.ndarray):
    """(doc, key) pairs deduplicated to one row per DISTINCT pair (lexsort
    + run-head mask) — the single definition of the distinct-grams-per-doc
    semantics every df-counting oracle depends on."""
    order = np.lexsort((keys, doc_idx))
    fd, fg = doc_idx[order], keys[order]
    keep = np.concatenate(
        ([True], (fd[1:] != fd[:-1]) | (fg[1:] != fg[:-1]))
    )
    return fd[keep], fg[keep]


def _flat_gram_windows(word_lists: list[list[str]], n: int,
                       word_hashes=None):
    """Flat gram-window index over a batch's word lists: hash every word
    ONCE, one gram-hash window sweep over the concatenation; windows
    straddling doc boundaries are discarded. Returns ``(all_words, grams,
    idx, doc_idx)`` — ``grams[k]`` is the hash of the n-word window
    starting at flat word position ``idx[k]`` in document ``doc_idx[k]`` —
    or None when no document has a full window. Shared by both
    boilerplate passes so the straddle arithmetic can't diverge."""
    counts = np.fromiter(
        (len(ws) for ws in word_lists), count=len(word_lists), dtype=np.int64
    )
    if not len(counts) or not (counts >= n).any():
        return None
    all_words = [w for ws in word_lists for w in ws]
    flat_all = _gram_hashes_flat(
        hash_strings(all_words) if word_hashes is None else word_hashes, n
    )
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    vcounts = np.maximum(counts - n + 1, 0)
    voffsets = np.concatenate(([0], np.cumsum(vcounts)))[:-1]
    total = int(vcounts.sum())
    idx = (
        np.repeat(starts, vcounts)
        + np.arange(total)
        - np.repeat(voffsets, vcounts)
    )
    doc_idx = np.repeat(np.arange(len(counts)), vcounts)
    return all_words, flat_all[idx], idx, doc_idx


def boilerplate_ngrams(
    ds,
    column: str = "text",
    *,
    ngram_words: int = 2,
    min_df: int = 25,
):
    """Corpus-wide boilerplate discovery: word ``ngram_words``-grams that
    appear in at least ``min_df`` DISTINCT documents (document frequency,
    not term frequency — a gram repeated inside one doc counts once).

    Returns a Dataset of (gram, df) for the frequent grams — the list a
    curation pipeline strips as boilerplate (nav bars, cookie banners,
    license headers). The result is small by construction: bounded by
    corpus_grams / min_df.

    Two passes: hashed df counts (narrow exchange), then a broadcast
    membership probe that recovers the gram strings of the survivors only.
    """
    import ray

    n = ngram_words

    def partial_counts(batch: pa.Table) -> pa.Table:
        # one flat pass per BATCH (hash every word once, one gram-hash
        # window sweep, one lexsort dedup) — the per-doc numpy-call loop
        # this replaces paid dispatch overhead per document on a stage
        # that scans 100% of the corpus
        word_lists = _doc_words(batch[column].to_pylist())
        flat = _flat_gram_windows(word_lists, n)
        if flat is not None:
            _, grams, _, doc_idx = flat
            _, dg = distinct_doc_keys(doc_idx, grams)
            h, c = np.unique(dg, return_counts=True)
        else:
            h = np.zeros(0, dtype=np.uint64)
            c = np.zeros(0, dtype=np.int64)
        return pa.table(
            {"gh": pa.array(h.view(np.int64)), "df": pa.array(c.astype(np.int64))}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("gh", as_index=False).agg(df=("df", "sum"))
        return out[out["df"] >= min_df]

    counts = bucketed_groups(
        ds.map_batches(partial_counts, batch_format="pyarrow"), ["gh"], combine
    )
    # the frequent set is small by construction (≤ total grams / min_df):
    # driver materialization here is the broadcast build, not a data scan
    freq = _typed_combine_frame(counts, {"gh": np.int64, "df": np.int64})
    if freq.empty:
        # no gram reaches min_df: short-circuit with a TYPED empty
        # dataset — running the probe pass would emit zero blocks and the
        # result Dataset would lose its schema entirely
        import ray.data as _rd

        return _rd.from_arrow(pa.table({
            "gram": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
        }))
    order = np.argsort(freq["gh"].to_numpy().view(np.uint64))
    freq_h = freq["gh"].to_numpy().view(np.uint64)[order]
    freq_df = freq["df"].to_numpy()[order]
    freq_ref = ray.put((freq_h, freq_df))

    def recover(batch: pa.Table) -> pa.Table:
        # flat per-BATCH sweep, mirroring partial_counts: hash every word
        # once, one gram-window pass, ONE searchsorted for the whole batch;
        # strings are rebuilt only at the first occurrence of each distinct
        # frequent gram (the per-doc loop this replaces re-hashed each doc
        # and looped Python-side over every hit on a 100%-of-corpus stage)
        fh, fdf = ray.get(freq_ref)
        empty = pa.table(
            {"gram": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
        word_lists = _doc_words(batch[column].to_pylist())
        flat = _flat_gram_windows(word_lists, n) if len(fh) else None
        if flat is None:
            return empty
        all_words, grams, idx, _ = flat
        pos = np.searchsorted(fh, grams)
        pos[pos == len(fh)] = 0
        hit = fh[pos] == grams
        if not hit.any():
            return empty
        hit_idx = np.flatnonzero(hit)
        _, first = np.unique(grams[hit_idx], return_index=True)
        sel = hit_idx[first]
        grams_out = [
            " ".join(all_words[s : s + n]) for s in idx[sel].tolist()
        ]
        return pa.table(
            {"gram": pa.array(grams_out, pa.string()),
             "df": pa.array(fdf[pos[sel]].astype(np.int64))}
        )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if "gram" not in df.columns:
            # every block empty (no gram reaches min_df): the pandas
            # conversion lost the schema — rebuild the typed empty frame
            return pd.DataFrame({
                "gram": pd.Series([], dtype=object),
                "df": pd.Series([], dtype=np.int64),
            })
        return df.drop_duplicates("gram")

    # per-batch recovery emits each frequent gram once per batch; the final
    # dedup coalesces a result already bounded by the frequent-set size
    return (
        ds.map_batches(recover, batch_format="pyarrow")
        .repartition(1)
        .map_batches(dedup, batch_format="pandas", batch_size=None)
    )


def duplicated_spans(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    *,
    ngram_words: int = 8,
    min_docs: int = 2,
    max_dup_grams: int = 5_000_000,
):
    """Substring-level exact duplication (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" shape, expressed over word
    windows): a word ``ngram_words``-gram occurring in ≥ ``min_docs``
    DISTINCT documents marks every word position it covers as duplicated.
    Emits per-document ``(id, n_words, dup_words, dup_fraction)`` — the
    curation signal for "this doc is partially boilerplate/copied", finer
    than whole-doc minhash and cheaper than suffix arrays.

    Same two-pass 100-TB shape as :func:`boilerplate_ngrams` (shared
    window machinery): pass 1 exchanges only gram-hash df counts, the
    duplicated-gram set (bounded by corpus_grams / min_docs) broadcasts
    once, pass 2 streams the corpus with one searchsorted probe per batch
    and computes interval-union coverage vectorized (sorted fixed-length
    windows: each contributes ``min(n, gap-to-next)``).

    ``dup_fraction`` is emitted as the EXACT IEEE quotient dup/n (no
    rounding): integer÷integer is bit-reproducible by the SQL oracle,
    while rounding rational ties (e.g. 1/128 at 6 decimals) would hit the
    numpy half-even vs SQL half-away divergence.
    """
    import ray

    n = ngram_words

    def partial_counts(batch: pa.Table) -> pa.Table:
        word_lists = _doc_words(batch[column].to_pylist())
        flat = _flat_gram_windows(word_lists, n)
        if flat is not None:
            _, grams, _, doc_idx = flat
            _, dg = distinct_doc_keys(doc_idx, grams)
            h, c = np.unique(dg, return_counts=True)
        else:
            h = np.zeros(0, dtype=np.uint64)
            c = np.zeros(0, dtype=np.int64)
        return pa.table(
            {"gh": pa.array(h.view(np.int64)), "df": pa.array(c.astype(np.int64))}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("gh", as_index=False).agg(df=("df", "sum"))
        return out[out["df"] >= min_docs]

    counts = bucketed_groups(
        ds.map_batches(partial_counts, batch_format="pyarrow"), ["gh"], combine
    )
    dup = _typed_combine_frame(counts, {"gh": np.int64, "df": np.int64})
    # bounded by corpus_grams / min_docs
    if len(dup) > max_dup_grams:
        raise ValueError(
            f"duplicated_spans: {len(dup):,} duplicated grams exceed the "
            f"broadcast budget ({max_dup_grams:,}); raise min_docs / "
            f"ngram_words (each dup gram costs 8 B broadcast — the guard "
            f"mirrors grouped_quantiles.max_distinct)"
        )
    dup_h = np.sort(dup["gh"].to_numpy().view(np.uint64))
    dup_ref = ray.put(dup_h)

    def coverage(batch: pa.Table) -> pa.Table:
        dh = ray.get(dup_ref)
        texts = batch[column].to_pylist()
        word_lists = _doc_words(texts)
        counts_ = np.fromiter(
            (len(ws) for ws in word_lists), count=len(word_lists),
            dtype=np.int64,
        )
        dup_words = np.zeros(len(counts_), dtype=np.int64)
        flat = _flat_gram_windows(word_lists, n) if len(dh) else None
        if flat is not None:
            _, grams, idx, doc_idx = flat
            pos = np.searchsorted(dh, grams)
            pos[pos == len(dh)] = 0
            hit = dh[pos] == grams
            if hit.any():
                h_doc = doc_idx[hit]
                h_pos = idx[hit]  # ascending within each doc by construction
                contrib = np.full(len(h_pos), n, dtype=np.int64)
                if len(h_pos) > 1:
                    same = h_doc[1:] == h_doc[:-1]
                    gaps = h_pos[1:] - h_pos[:-1]
                    head = contrib[:-1]
                    head[same] = np.minimum(n, gaps[same])
                dup_words = np.bincount(
                    h_doc, weights=contrib, minlength=len(counts_)
                ).astype(np.int64)
        keep = counts_ > 0
        ids = batch[id_column].to_numpy(zero_copy_only=False)[keep]
        dw = dup_words[keep]
        nw = counts_[keep]
        return pa.table(
            {
                id_column: pa.array(ids),
                "n_words": pa.array(nw),
                "dup_words": pa.array(dw),
                "dup_fraction": pa.array(dw / nw),
            }
        )

    return ds.map_batches(coverage, batch_format="pyarrow")



# odd FNV prime → invertible mod 2^64, so rolling window hashes come from
# one prefix-sum pass: h(i) = (ps[i+k] - ps[i]) * P^(i+k-1), all uint64
# wraparound arithmetic
_CP_P = np.uint64(1099511628211)
_CP_PINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _flat_codepoint_windows(texts, k: int):
    """Flat char-gram window index over a batch's texts, in CODEPOINT space
    (SQL ``substr``/``length`` semantics). Normalization is the
    ``doc_fingerprints`` contract: lowercased, RE2-whitespace-collapsed,
    single-space-joined. Returns ``(char_counts, gram_hashes, local_pos,
    doc_idx)`` — ``gram_hashes[j]`` is the mixed hash of the ``k``-codepoint
    window starting at in-doc position ``local_pos[j]`` of document
    ``doc_idx[j]`` — with the last three ``None`` when no document has a
    full window. Windows never straddle documents (per-doc window counts
    drive the gather). One rolling-hash pass over the batch concatenation;
    O(total chars)."""
    norms = [" ".join(re2_words(t)) for t in texts]
    counts = np.fromiter(
        (len(s) for s in norms), count=len(norms), dtype=np.int64
    )
    if not len(counts) or not (counts >= k).any():
        return counts, None, None, None
    codes = np.frombuffer(
        "".join(norms).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)
    n_tot = len(codes)
    pw = np.full(n_tot, _CP_P, dtype=np.uint64)
    pw[0] = np.uint64(1)
    np.cumprod(pw, out=pw)
    pwi = np.full(n_tot, _CP_PINV, dtype=np.uint64)
    pwi[0] = np.uint64(1)
    np.cumprod(pwi, out=pwi)
    ps = np.concatenate(([np.uint64(0)], np.cumsum(codes * pwi)))
    all_h = (ps[k:] - ps[:-k]) * pw[k - 1:]
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    vcounts = np.maximum(counts - k + 1, 0)
    voffsets = np.concatenate(([0], np.cumsum(vcounts)))[:-1]
    total = int(vcounts.sum())
    rep_starts = np.repeat(starts, vcounts)
    gidx = rep_starts + np.arange(total) - np.repeat(voffsets, vcounts)
    doc_idx = np.repeat(np.arange(len(counts)), vcounts)
    return counts, hash64(all_h[gidx]), gidx - rep_starts, doc_idx


def duplicated_char_spans(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    *,
    ngram_chars: int = 24,
    min_docs: int = 2,
    max_dup_grams: int = 5_000_000,
):
    """Character-level variant of :func:`duplicated_spans` (the fidelity
    step toward Lee et al.'s suffix-array formulation): a ``ngram_chars``-
    codepoint window of the whitespace-normalized text occurring in ≥
    ``min_docs`` DISTINCT documents marks every codepoint it covers as
    duplicated. Catches sub-word and cross-token duplication the word-gram
    pass cannot (hyphenation, concatenation, partial-word edits) at the
    cost of ~chars/words × more windows — same two-pass df-exchange →
    bounded broadcast → vectorized interval-union shape, so the 100-TB
    scale argument carries over unchanged.

    Emits per-document ``(id, n_chars, dup_chars, dup_fraction)`` over
    documents with non-empty normalized text; ``dup_fraction`` is the
    exact IEEE quotient (never rounded — rational ties diverge half-even
    vs half-away across engines)."""
    import ray

    k = ngram_chars

    def partial_counts(batch: pa.Table) -> pa.Table:
        _, grams, _, doc_idx = _flat_codepoint_windows(
            batch[column].to_pylist(), k
        )
        if grams is not None:
            _, dg = distinct_doc_keys(doc_idx, grams)
            h, c = np.unique(dg, return_counts=True)
        else:
            h = np.zeros(0, dtype=np.uint64)
            c = np.zeros(0, dtype=np.int64)
        return pa.table(
            {"gh": pa.array(h.view(np.int64)),
             "df": pa.array(c.astype(np.int64))}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("gh", as_index=False).agg(df=("df", "sum"))
        return out[out["df"] >= min_docs]

    counts = bucketed_groups(
        ds.map_batches(partial_counts, batch_format="pyarrow"), ["gh"], combine
    )
    dup = _typed_combine_frame(counts, {"gh": np.int64, "df": np.int64})
    # bounded by corpus_grams / min_docs
    if len(dup) > max_dup_grams:
        raise ValueError(
            f"duplicated_char_spans: {len(dup):,} duplicated grams exceed "
            f"the broadcast budget ({max_dup_grams:,}); raise min_docs / "
            f"ngram_chars (each dup gram costs 8 B broadcast)"
        )
    dup_h = np.sort(dup["gh"].to_numpy().view(np.uint64))
    dup_ref = ray.put(dup_h)

    def coverage(batch: pa.Table) -> pa.Table:
        dh = ray.get(dup_ref)
        counts_, grams, local, doc_idx = _flat_codepoint_windows(
            batch[column].to_pylist(), k
        )
        dup_chars = np.zeros(len(counts_), dtype=np.int64)
        if grams is not None and len(dh):
            pos = np.searchsorted(dh, grams)
            pos[pos == len(dh)] = 0
            hit = dh[pos] == grams
            if hit.any():
                h_doc = doc_idx[hit]
                h_pos = local[hit]  # ascending within each doc
                contrib = np.full(len(h_pos), k, dtype=np.int64)
                if len(h_pos) > 1:
                    same = h_doc[1:] == h_doc[:-1]
                    gaps = h_pos[1:] - h_pos[:-1]
                    head = contrib[:-1]
                    head[same] = np.minimum(k, gaps[same])
                dup_chars = np.bincount(
                    h_doc, weights=contrib, minlength=len(counts_)
                ).astype(np.int64)
        keep = counts_ > 0
        ids = batch[id_column].to_numpy(zero_copy_only=False)[keep]
        dc = dup_chars[keep]
        nc = counts_[keep]
        return pa.table(
            {
                id_column: pa.array(ids),
                "n_chars": pa.array(nc),
                "dup_chars": pa.array(dc),
                "dup_fraction": pa.array(dc / nc),
            }
        )

    return ds.map_batches(coverage, batch_format="pyarrow")


def bm25_scores(
    ds,
    query: str,
    *,
    column: str = "text",
    id_column: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
):
    """Distributed BM25 of every document against ONE query string
    (Robertson ``ln(1 + (N - df + .5)/(df + .5))`` idf — the Lucene
    keep-positive convention).

    The 100-TB shape differs from the generic two-pass template in one
    key way: the statistics pass exchanges ONLY ``|query|`` df counters
    plus (n_docs, total_words) per batch — a fixed-width partial row, no
    vocabulary-sized combine at all. The tiny partials collapse
    driver-side (#blocks × (|query|+2) ints; tree-merge via
    ``sketches.tree_reduce_blobs`` if block counts ever made this the
    bottleneck), then pass 2 streams the corpus once with a vectorized
    per-batch probe. Scores round to ``round_to`` (the ``doc_logprob``
    convention: cross-engine libm/g summation-order ulps vanish at 6
    decimals). Only documents containing ≥1 query term are emitted.
    """
    import ray

    q_words = sorted(set(_doc_words([query])[0]))
    if not q_words:
        raise ValueError("query has no words")
    q_h = np.sort(hash_strings(q_words))
    nq = len(q_h)

    def partials(batch: pa.Table) -> pa.Table:
        word_lists = _doc_words(batch[column].to_pylist())
        counts = np.fromiter(
            (len(ws) for ws in word_lists), count=len(word_lists),
            dtype=np.int64,
        )
        n_docs = int((counts > 0).sum())
        total_words = int(counts.sum())
        df = np.zeros(nq, dtype=np.int64)
        all_words = [w for ws in word_lists for w in ws]
        if all_words:
            wh = hash_strings(all_words)
            pos = np.searchsorted(q_h, wh)
            pos[pos == nq] = 0
            hit = q_h[pos] == wh
            if hit.any():
                doc_idx = np.repeat(np.arange(len(counts)), counts)
                key = doc_idx[hit] * nq + pos[hit]
                terms = np.unique(key) % nq  # distinct (doc, term) → df
                df = np.bincount(terms, minlength=nq).astype(np.int64)
        return pa.table(
            {
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
                "n_docs": pa.array([n_docs], pa.int64()),
                "total_words": pa.array([total_words], pa.int64()),
            }
        )

    stats = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    if stats.empty:  # empty input: no partial rows at all
        df_tot = np.zeros(nq, dtype=np.float64)
        n_docs = 0.0
    else:
        df_tot = np.sum(
            np.stack(stats["df"].to_numpy()), axis=0
        ).astype(np.float64)
        n_docs = float(stats["n_docs"].sum())
    avgdl = (
        float(stats["total_words"].sum()) / max(1.0, n_docs)
        if not stats.empty else 1.0
    )
    idf = np.log(1.0 + (n_docs - df_tot + 0.5) / (df_tot + 0.5))
    probe_ref = ray.put((q_h, idf, avgdl))

    def score(batch: pa.Table) -> pa.Table:
        qh, idf_, avgdl_ = ray.get(probe_ref)
        word_lists = _doc_words(batch[column].to_pylist())
        counts = np.fromiter(
            (len(ws) for ws in word_lists), count=len(word_lists),
            dtype=np.int64,
        )
        empty = pa.table(
            {
                id_column: pa.array([], batch[id_column].type),
                "bm25": pa.array([], pa.float64()),
            }
        )
        all_words = [w for ws in word_lists for w in ws]
        if not all_words:
            return empty
        wh = hash_strings(all_words)
        pos = np.searchsorted(qh, wh)
        pos[pos == len(qh)] = 0
        hit = qh[pos] == wh
        if not hit.any():
            return empty
        doc_idx = np.repeat(np.arange(len(counts)), counts)
        key = doc_idx[hit] * len(qh) + pos[hit]
        ukey, tf = np.unique(key, return_counts=True)
        ud, ut = ukey // len(qh), ukey % len(qh)
        dl = counts[ud].astype(np.float64)
        tf = tf.astype(np.float64)
        contrib = idf_[ut] * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl_)
        )
        docs = np.unique(ud)
        scores = np.bincount(ud, weights=contrib, minlength=len(counts))[docs]
        ids = batch[id_column].take(pa.array(docs))
        return pa.table(
            {
                id_column: ids,
                "bm25": pa.array(np.round(scores, round_to)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


class _LogProbProbe:
    """Broadcast-vocabulary scorer (pass 2 of :func:`unigram_logprob`)."""

    def __init__(self, vocab_ref, column: str, id_column: str, round_to: int):
        # ObjectRef, not the arrays: resolving at call time reads the one
        # object-store copy instead of re-shipping per task
        self.vocab_ref = vocab_ref
        self.column = column
        self.id_column = id_column
        self.round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        vh, vlp, oov_lp = ray.get(self.vocab_ref)
        texts = batch[self.column].to_pylist()
        word_lists = _doc_words(texts)
        counts = np.fromiter(
            (len(w) for w in word_lists), count=len(word_lists), dtype=np.int64
        )
        all_words = [w for ws in word_lists for w in ws]
        wh = hash_strings(all_words)
        pos = np.searchsorted(vh, wh)
        if len(vh):
            pos[pos == len(vh)] = 0
            lp = np.where(vh[pos] == wh, vlp[pos], np.nan)
        else:
            lp = np.full(len(wh), np.nan)
        starts = np.concatenate(([0], np.cumsum(counts)))
        # out-of-vocabulary words (pruned tail when min_count > 1, or a
        # probe corpus wider than the stats corpus) take the FLOOR penalty
        # — treating them as log p = 0 would score pure OOV word salad as
        # perfect text, inverting the quality filter
        lp = np.where(np.isnan(lp), oov_lp, lp)
        # segment sums via cumsum difference (reduceat mishandles empty
        # segments: equal/end-of-array indices); exact for zero-word docs
        csum = np.concatenate(([0.0], np.cumsum(lp)))
        sums = csum[starts[1:]] - csum[starts[:-1]]
        keep = counts > 0
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)[keep]
        mean = np.round(sums[keep] / counts[keep], self.round_to)
        return pa.table(
            {
                self.id_column: pa.array(ids),
                "n_words": pa.array(counts[keep]),
                "logprob": pa.array(mean),
            }
        )


def unigram_logprob(
    ds,
    probe_ds,
    column: str = "text",
    id_column: str = "doc_id",
    *,
    min_count: int = 1,
    round_to: int = 6,
):
    """Unigram-LM quality score: mean log-probability of a document's words
    under the CORPUS unigram distribution (the cheap stand-in for the
    KenLM-perplexity filter every web-scale curation pipeline runs —
    low-probability word salad scores far below natural text).

    ``ds`` supplies the corpus statistics; ``probe_ds`` is scored (pass the
    same dataset twice for self-scoring). Words absent from the vocabulary
    (possible when ``min_count`` > 1 prunes the tail) contribute 0 to the
    sum — at 100 TB pass ``min_count`` high enough that the broadcast
    vocabulary (8+8 B per word) fits the object store; the tail it prunes
    is precisely the probability mass a quality filter doesn't need.

    Returns (id, n_words, logprob) — empty documents are dropped.
    """
    import ray

    def partial_counts(batch: pa.Table) -> pa.Table:
        word_lists = _doc_words(batch[column].to_pylist())
        all_words = [w for ws in word_lists for w in ws]
        if all_words:
            h, c = np.unique(hash_strings(all_words), return_counts=True)
        else:
            h = np.zeros(0, dtype=np.uint64)
            c = np.zeros(0, dtype=np.int64)
        return pa.table(
            {"wh": pa.array(h.view(np.int64)), "c": pa.array(c.astype(np.int64))}
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("wh", as_index=False).agg(c=("c", "sum"))
        return out[out["c"] >= min_count]

    vocab = _typed_combine_frame(
        bucketed_groups(
            ds.map_batches(partial_counts, batch_format="pyarrow"),
            ["wh"], combine,
        ),
        {"wh": np.int64, "c": np.int64},
    )
    total = float(vocab["c"].sum())
    order = np.argsort(vocab["wh"].to_numpy().view(np.uint64))
    vh = vocab["wh"].to_numpy().view(np.uint64)[order]
    vlp = np.log(vocab["c"].to_numpy()[order] / total)
    # OOV floor: below every tracked word's probability (an unseen word
    # is at most as likely as half a single occurrence)
    oov_lp = float(np.log(0.5 / max(total, 1.0)))
    vocab_ref = ray.put((vh, vlp, oov_lp))

    return probe_ds.map_batches(
        _LogProbProbe(vocab_ref, column, id_column, round_to),
        batch_format="pyarrow",
    )
