"""Token-budget sequence packing: group documents into training sequences
whose token counts fill (but never exceed) a context window.

The standard pre-tokenization step of an LLM training pipeline: short
documents are concatenated up to ``max_tokens`` so padding waste stays low.
Exact global bin packing is NP-hard and inherently serial, so — like every
production packer — this implements deterministic NEXT-FIT **within each
partition**: documents are taken in partition order and a new pack opens
whenever the next document would overflow the budget. Packing never
crosses partition boundaries, which is what makes the operator
embarrassingly parallel and resumable (pack ids are namespaced by a
partition-stable hash of the first doc id, so re-running a partition
reproduces its packs bit-for-bit).

Oversized documents (count > max_tokens) get a single-doc pack of their
own and are flagged ``oversize`` — callers typically split or drop them.

Per-batch work is O(#packs) vectorized steps (searchsorted over the
cumulative token counts), not a per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketches import hash64, re2_tokens


def pack_batch(counts: np.ndarray, max_tokens: int) -> np.ndarray:
    """Next-fit pack assignment for one ordered batch of token counts.
    Returns the 0-based pack index per document. Vectorized over packs:
    each step closes one pack via a searchsorted on the cumulative sum."""
    n = len(counts)
    assign = np.zeros(n, dtype=np.int64)
    if n == 0:
        return assign
    cum = np.cumsum(counts, dtype=np.int64)
    start = 0
    pack = 0
    base = 0
    while start < n:
        # largest j with cum[j-1] - base <= max_tokens  (≥ start+1 so an
        # oversize doc still forms its own pack)
        end = int(np.searchsorted(cum, base + max_tokens, side="right"))
        end = max(end, start + 1)
        assign[start:end] = pack
        base = cum[end - 1]
        pack += 1
        start = end
    return assign


class SequencePacker:
    """``map_batches`` callable: (id, token_count) rows in → one row per
    pack out: (pack_id, doc_ids, n_docs, total_tokens, fill, oversize)."""

    def __init__(
        self,
        max_tokens: int,
        id_column: str = "doc_id",
        count_column: str = "n_tokens",
    ):
        self.max_tokens = max_tokens
        self.id_column = id_column
        self.count_column = count_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        counts = batch[self.count_column].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        assign = pack_batch(counts, self.max_tokens)
        n_packs = int(assign[-1]) + 1 if len(assign) else 0
        # partition-stable namespace: packs from different partitions can
        # never collide, and re-running the partition reproduces its ids
        ns = int(hash64(np.asarray([ids[0]], dtype=np.int64).view(np.uint64))[0]
                 >> np.uint64(1)) if len(ids) else 0
        bounds = np.concatenate(
            ([0], np.flatnonzero(np.diff(assign)) + 1, [len(ids)])
        ) if len(ids) else np.array([0])
        pack_ids, doc_lists, n_docs, totals, oversize = [], [], [], [], []
        for p in range(n_packs):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            tot = int(counts[lo:hi].sum())
            pack_ids.append(ns + p)
            doc_lists.append(ids[lo:hi].tolist())
            n_docs.append(hi - lo)
            totals.append(tot)
            oversize.append(tot > self.max_tokens)
        return pa.table(
            {
                "pack_id": pa.array(pack_ids, pa.int64()),
                "doc_ids": pa.array(doc_lists, pa.list_(pa.int64())),
                "n_docs": pa.array(n_docs, pa.int64()),
                "total_tokens": pa.array(totals, pa.int64()),
                "fill": pa.array(
                    [min(t, self.max_tokens) / self.max_tokens for t in totals]
                ),
                "oversize": pa.array(oversize, pa.bool_()),
            }
        )


def pack_documents(
    ds,
    max_tokens: int,
    *,
    id_column: str = "doc_id",
    count_column: str = "n_tokens",
    batch_size: int = 65536,
):
    """Pack ``ds`` (id + token-count rows) into training sequences.

    Streams: each batch packs independently (next-fit, partition-local),
    no shuffle. Callers wanting better fill sort by count upstream
    (first-fit-decreasing ≈ next-fit on sorted input) — at scale a
    per-partition sort inside the batch is free; a GLOBAL sort for a few %
    fill is not worth the all-to-all.
    """
    return ds.map_batches(
        SequencePacker(max_tokens, id_column, count_column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def chunk_documents(
    ds,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
):
    """Fixed-size token-window chunking with overlap — the standard
    long-document → training-sample expansion (stride < chunk_tokens
    gives ``chunk_tokens − stride`` tokens of overlap between
    consecutive chunks, preserving cross-boundary context).

    Chunk starts are ``0, stride, 2·stride, …`` while < the document's
    token count; ``chunk_id = start // stride``; tokens follow the
    engine-wide contract (``sketches.re2_tokens``: RE2 '\\s+' runs,
    empties dropped, case preserved — reproducible as
    ``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')`` in
    SQL on any input). Pure per-batch flat expansion inside
    ``map_batches`` — no shuffle; empty/whitespace-only documents emit
    no chunks. Output: (id, chunk_id, chunk, n_tokens).
    """
    if chunk_tokens <= 0 or stride <= 0 or stride > chunk_tokens:
        raise ValueError(
            f"need 0 < stride <= chunk_tokens, got {stride}/{chunk_tokens}"
        )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids, cids, chunks, lens = [], [], [], []
        for did, t in zip(df[id_column], df[text_column]):
            toks = re2_tokens(t) if isinstance(t, str) else []
            for ci, s in enumerate(range(0, len(toks), stride)):
                w = toks[s : s + chunk_tokens]
                ids.append(did)
                cids.append(ci)
                chunks.append(" ".join(w))
                lens.append(len(w))
        return pd.DataFrame(
            {
                id_column: pd.Series(ids, dtype=df[id_column].dtype),
                "chunk_id": pd.Series(cids, dtype="int64"),
                "chunk": pd.Series(chunks, dtype="object"),
                "n_tokens": pd.Series(lens, dtype="int64"),
            }
        )

    return ds.map_batches(expand, batch_format="pandas")
