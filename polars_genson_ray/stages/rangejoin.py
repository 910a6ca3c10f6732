"""Broadcast range join (interval lookup).

The small-side range join — classify each row by which of a handful of
intervals its value falls into (price tiers, size buckets, SLA bands) —
needs NO shuffle at all: the interval table is broadcast (it is driver
-side data or a tiny Dataset) and each batch resolves membership with one
vectorized ``searchsorted`` against the sorted interval starts. This is
the range analog of the broadcast equi-join in ``q_nation_revenue``.

Requirements: intervals are CLOSED ``[lo, hi]``, non-overlapping. Rows
matching no interval are dropped (inner semantics, mirroring SQL
``JOIN ... ON v BETWEEN lo AND hi``). For overlapping intervals you need
a flat-map expansion instead (one output row per covering interval) —
not built; no fixture needs it.

A large-side range join (both sides data-scaled) would instead co-
partition by coarse value buckets and sweep within buckets; at that point
the as-of machinery in :mod:`.asof` is the closer template.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def broadcast_range_join(
    ds,
    value_column: str,
    intervals: pd.DataFrame,
    *,
    lo_column: str = "lo",
    hi_column: str = "hi",
):
    """Attach every column of ``intervals`` (besides ``lo``/``hi``) to each
    row of ``ds`` whose ``value_column`` falls in ``[lo, hi]``; rows with
    no interval are dropped."""
    iv = intervals.sort_values(lo_column).reset_index(drop=True)
    lows = iv[lo_column].to_numpy()
    highs = iv[hi_column].to_numpy()
    if (highs[:-1] >= lows[1:]).any():
        raise ValueError("intervals must be non-overlapping")
    label_cols = [c for c in iv.columns if c not in (lo_column, hi_column)]
    labels = {c: iv[c].to_numpy() for c in label_cols}

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_column].to_numpy()
        idx = np.searchsorted(lows, v, side="right") - 1
        safe = np.maximum(idx, 0)
        hit = (idx >= 0) & (v <= highs[safe])
        out = df.loc[hit].copy()
        for c in label_cols:
            out[c] = labels[c][safe[hit]]
        return out

    return ds.map_batches(classify, batch_format="pandas")
