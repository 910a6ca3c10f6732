"""Deterministic global shuffle → training shard assignment.

Training pipelines need the corpus globally shuffled into S shard files,
and they need the SAME shuffle when a run resumes or the cluster size
changes — seeded RNG shuffles give neither (Ray's ``random_shuffle`` order
depends on block layout).  The standard fix is a *hash shuffle*: every
row's position is a pure function of its id — ``md5(id)`` is the sort key,
``int(md5[:8], 16) % S`` the shard — so the permutation is reproducible
run-to-run, across cluster sizes, and SQL-verifiable (same contract as
``aggregate.stratified_sample``'s md5 priority).

Scale shape:

* only (id, 16-byte priority) rows cross the exchange — never payload;
  the payload is re-attached by shard at write time (or the shard/pos
  map is joined back, both narrow);
* shards are the exchange partitions themselves (one groupby on the
  shard id);
* ``pos`` (rank within shard) here sorts each shard in its group task —
  fine while a shard fits a worker (pick S so corpus/S ~ a few GB).  For
  shards bigger than a worker, drop ``pos`` and let consumers order by
  the priority key at read time, or compute rank hierarchically
  (range-partition the priority space per shard and prefix-sum the
  range counts — same monoid as ``grouped_topk``'s partials).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def deterministic_shards(ds, *, id_column: str, num_shards: int):
    """Assign (shard, pos) to every row of ``ds`` from md5 of its id.

    Returns a Dataset of ``(id_column, shard, pos)`` — shard in
    ``[0, num_shards)``, pos the 0-based rank of md5(id) (ties broken by
    id) within the shard.
    """

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        pri = [
            hashlib.md5(str(v).encode()).hexdigest() for v in df[id_column]
        ]
        shard = [int(p[:8], 16) % num_shards for p in pri]
        return pd.DataFrame(
            {id_column: df[id_column], "shard": shard, "__pri": pri}
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__pri", id_column]).reset_index(drop=True)
        out = df[[id_column, "shard"]].copy()
        out["pos"] = range(len(df))
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")
    return tagged.groupby("shard").map_groups(rank, batch_format="pandas")


def range_partition_ids(
    ds,
    column: str,
    *,
    num_partitions: int = 4,
    max_distinct: int = 1_000_000,
    out_column: str = "pid",
):
    """Range partitioning — the scale-sort primitive: assign each row the
    index of its value range, so writing partition-by-``pid`` yields
    globally range-ordered output (ordered partitions, sort-within-
    partition at read time) WITHOUT an all-to-all Sort of the input.

    Boundaries are EXACT ``quantile_disc`` values (first value whose
    cumulative count reaches ``i/p``) computed from distributed
    distinct-value counts — the same bounded-cardinality contract as
    ``grouped_quantiles`` (guarded by ``max_distinct``; continuous
    columns should instead take boundaries from the t-digest sketch —
    approximate split SIZES, identical correctness). The boundary array
    is broadcast once; each batch tags itself with one ``searchsorted``
    (``pid = #{boundaries < value}``, so boundary-valued rows land in
    the lower partition — mirrored by ``value > boundary`` sums in SQL).
    """
    import ray

    from .aggregate import combine_partials

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(column, as_index=False).agg(__n=(column, "size"))

    counts = combine_partials(
        ds.select_columns([column]).map_batches(
            count_partial, batch_format="pandas"
        ),
        [column],
        {"__n": "sum"},
    ).to_pandas()
    if len(counts) > max_distinct:
        raise ValueError(
            f"range_partition_ids: > {max_distinct} distinct values — "
            "take boundaries from the t-digest sketch for continuous columns"
        )
    if counts.empty:
        raise ValueError(
            "range_partition_ids: input has no rows — no boundaries exist"
        )
    counts = counts.sort_values(column)
    vals = counts[column].to_numpy()
    cum = counts["__n"].to_numpy(dtype=np.int64).cumsum()
    total = int(cum[-1])
    boundaries = np.array(
        [
            vals[np.searchsorted(cum, total * i / num_partitions, side="left")]
            for i in range(1, num_partitions)
        ]
    )
    bref = ray.put(boundaries)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        pid = np.searchsorted(b, df[column].to_numpy(), side="left")
        return df.assign(**{out_column: pid.astype(np.int64)})

    return ds.map_batches(tag, batch_format="pandas")


def global_row_number(
    ds,
    order_column: str,
    id_column: str,
    *,
    max_distinct: int = 1_000_000,
    out_column: str = "row_number",
):
    """Exact dense global ranking — ``ROW_NUMBER() OVER (ORDER BY value,
    id)`` — without an all-to-all Sort: rank = (# rows with a smaller
    value) + (# equal-valued rows with a smaller id) + 1.

    The first term comes from distributed distinct-value counts (same
    bounded-cardinality contract as :func:`range_partition_ids`; guarded
    by ``max_distinct`` — continuous columns take a t-digest bracket
    first), turned into an exclusive prefix and broadcast once. The
    second term needs equal values co-located — ONE narrow bucketed
    exchange of (value, id) rows, then a whole-frame lexsort + per-value
    run-relative rank. Payload columns never move; join the result back
    by id (or pass them through) for a globally ordered write."""
    import ray

    from .aggregate import bucketed_groups, combine_partials

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        # null/NaN order values would silently vanish from the distinct-value
        # counts (pandas groupby drops them) while their rows still reach the
        # rank exchange, where searchsorted(NaN) lands past the prefix array —
        # refuse them up front with a clear message (SQL ROW_NUMBER orders
        # NULLs deterministically; this operator's broadcast prefix cannot)
        if df[order_column].isna().any():
            raise ValueError(
                f"global_row_number: null/NaN values in order column "
                f"{order_column!r} are not supported — filter or fill them "
                "first (e.g. fillna / dropna) so ranks are well-defined"
            )
        return df.groupby(order_column, as_index=False).agg(
            __n=(order_column, "size")
        )

    counts = combine_partials(
        ds.select_columns([order_column]).map_batches(
            count_partial, batch_format="pandas"
        ),
        [order_column],
        {"__n": "sum"},
    ).to_pandas()
    if len(counts) > max_distinct:
        raise ValueError(
            f"global_row_number: > {max_distinct} distinct values — "
            "bracket continuous columns with the t-digest sketch first"
        )
    counts = counts.sort_values(order_column)
    vals = counts[order_column].to_numpy()
    prefix = np.concatenate(([0], np.cumsum(counts["__n"].to_numpy())[:-1]))
    pre_ref = ray.put((vals, prefix))

    def rank_frame(df: pd.DataFrame) -> pd.DataFrame:
        vals_, prefix_ = ray.get(pre_ref)
        v = df[order_column].to_numpy()
        i = df[id_column].to_numpy()
        order = np.lexsort((i, v))
        sv = v[order]
        # run-relative rank: position minus the first index of the run
        starts = np.concatenate(([0], np.flatnonzero(sv[1:] != sv[:-1]) + 1))
        run_id = np.cumsum(
            np.concatenate(([0], (sv[1:] != sv[:-1]).astype(np.int64)))
        )
        local = np.arange(len(sv)) - starts[run_id]
        base = prefix_[np.searchsorted(vals_, sv)]
        rn = np.empty(len(sv), dtype=np.int64)
        rn[order] = base + local + 1
        out = df[[id_column, order_column]].copy()
        out[out_column] = rn
        return out

    return bucketed_groups(
        ds.select_columns([order_column, id_column]),
        [order_column],
        rank_frame,
    )
