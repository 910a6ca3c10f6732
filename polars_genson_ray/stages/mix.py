"""Data-mixture sampling: per-source keep fractions via hash sampling.

Training corpora are re-weighted before training ("data mixing"): each
source/domain gets a target sampling fraction (DoReMi-style weights,
upsampled wiki, downsampled crawl, ...).  At 100 TB the sample must be

* shuffle-free — a pure per-row predicate, no groupby/sort;
* deterministic — the SAME subset on rerun, resume and any cluster size
  (seeded RNG sampling is none of these under re-partitioning);
* SQL-verifiable.

The standard idiom: map the row id to a uniform u ∈ [0,1) by hashing
(``int(md5(id)[:8], 16) / 2^32`` — the same md5 contract as
``aggregate.stratified_sample`` and ``shards.deterministic_shards``) and
keep the row iff ``u < fraction[source]``.  Expected kept mass per
source is exactly the fraction; membership is a pure function of
(id, source).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def hash_mix_sample(
    ds,
    fractions: dict[str, float] | None = None,
    *,
    id_column: str,
    source_column: str | None = None,
    default_fraction: float = 1.0,
):
    """Filter ``ds`` to the deterministic per-source sample.

    ``fractions`` maps source value → keep fraction in [0, 1]; sources
    not listed keep ``default_fraction``.  With ``source_column=None``
    the filter is a uniform deterministic Bernoulli sample at
    ``default_fraction``.  The dict is captured in the task closure (it
    is small — one entry per source/domain); a million-entry map would
    instead be ``ray.put`` and resolved per task.
    """
    fractions = fractions or {}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        u = _hash_units(df[id_column])
        if source_column is None:
            return df[u < default_fraction]
        frac = df[source_column].map(
            lambda s: fractions.get(s, default_fraction)
        ).to_numpy(dtype=np.float64)
        return df[u < frac]

    return ds.map_batches(keep, batch_format="pandas")


def _hash_units(ids) -> np.ndarray:
    """md5-derived uniform u ∈ [0,1) per id — the engine-wide deterministic
    sampling contract (same bytes as DuckDB ``('0x' || substr(md5(id),1,8))
    ::BIGINT / 2^32``)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
            for v in ids
        ),
        dtype=np.float64,
        count=len(ids),
    ) / 2**32


def hash_mix_upsample(
    ds,
    weights: dict[str, float] | None = None,
    *,
    id_column: str,
    source_column: str | None = None,
    default_weight: float = 1.0,
    rep_column: str = "rep",
):
    """Deterministic weighted REPLICATION — the ``w > 1`` half of data
    mixing (:func:`hash_mix_sample` is the ``w ≤ 1`` half). Each row is
    emitted ``floor(w) + (u < w − floor(w))`` times, so expected emitted
    mass per source is exactly ``w`` and membership/copy-count is a pure
    function of (id, source) — stable under rerun, resume and any
    partitioning. Pure per-row expansion inside ``map_batches``
    (vectorized ``np.repeat``), no shuffle.

    ``rep_column`` gets the 0-based copy index, so downstream shuffle /
    packing stages see distinct rows rather than indistinguishable
    duplicates (and dedup-by-id stages know to key on (id, rep)).
    """
    weights = weights or {}

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # np.repeat's starts/counts shapes disagree on zero rows, and
            # empty blocks arise naturally (an upstream filter emptied one)
            return df.assign(**{rep_column: pd.Series([], dtype="int64")})
        u = _hash_units(df[id_column])
        if source_column is None:
            w = np.full(len(df), float(default_weight))
        else:
            w = df[source_column].map(
                lambda s: weights.get(s, default_weight)
            ).to_numpy(dtype=np.float64)
        base = np.floor(w)
        n = base.astype(np.int64) + (u < (w - base))
        idx = np.repeat(np.arange(len(df)), n)
        out = df.iloc[idx].reset_index(drop=True)
        # per-source-row 0..n-1 copy index
        starts = np.concatenate([[0], np.cumsum(n)[:-1]])
        out[rep_column] = np.arange(len(idx)) - np.repeat(starts, n)
        return out

    return ds.map_batches(replicate, batch_format="pandas")
