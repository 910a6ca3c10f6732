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
        u = np.fromiter(
            (
                int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
                for v in df[id_column]
            ),
            dtype=np.float64,
            count=len(df),
        ) / 2**32
        if source_column is None:
            return df[u < default_fraction]
        frac = df[source_column].map(
            lambda s: fractions.get(s, default_fraction)
        ).to_numpy(dtype=np.float64)
        return df[u < frac]

    return ds.map_batches(keep, batch_format="pandas")
