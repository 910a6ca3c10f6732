"""Skew-aware wide operations (north_rule: "partitioning / shuffle / skew
handled explicitly").

``salted_group_count``: two-level aggregate for counting by a key with
heavy hitters (e.g. the synthetic table's hot phash bucket, ~10% of all
rows). A naive ``groupby(key)`` sends every hot-key row to one reducer;
salting spreads each key over ``salt`` sub-keys, pre-reduces, then combines
the (tiny) per-salt partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum


def salted_group_count(ds, key: str, *, salt: int = 16, batch_size: int = 8192):
    """count() per key value via salted two-level aggregation.

    Level 0 (map_batches): per-batch value counts — already collapses
    within-batch hot keys. Level 1: groupby((key, salt_i)) — hot keys spread
    over ``salt`` reducers. Level 2: groupby(key) over the per-salt partials
    (at most ``salt`` rows per key).
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_pylist()
        vc = pd.Series(vals).value_counts()
        n = len(vc)
        salts = np.arange(n, dtype=np.int32) % salt
        return pa.table(
            {
                key: pa.array(vc.index.to_list()),
                "__salt": pa.array(salts, pa.int32()),
                "n": pa.array(vc.to_numpy().astype("int64")),
            }
        )

    level1 = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby([key, "__salt"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return (
        level1.groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )


def top_k_keys(ds, key: str, k: int = 10, *, candidates_per_batch: int = 64,
               batch_size: int = 8192):
    """Top-k hottest key values (e.g. hot phash buckets) via mergeable
    heavy-hitter partials — per-batch local top counts, merged driver-side.
    NO shuffle: a key that is globally heavy is heavy in most batches
    (SpaceSaving-style guarantee for skew rates ≫ 1/candidates_per_batch;
    exact for the hot-bucket regime this detects)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch[key].to_pylist()).value_counts()
        top = vc.head(candidates_per_batch)
        return pa.table(
            {
                key: pa.array(top.index.to_list()),
                "n": pa.array(top.to_numpy().astype("int64")),
            }
        )

    rows = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .take_all()
    )
    df = pd.DataFrame(rows)
    if df.empty:
        return df
    merged = df.groupby(key, as_index=False)["n"].sum()
    # sort-then-head (not nlargest): count ties at the k boundary keep
    # the smallest keys, so repeated runs agree
    return (
        merged.sort_values(["n", key], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
