"""Distributed hash equi-join (co-partitioned, narrow-shuffle).

Ray Data ships a ``Dataset.join`` (hash-shuffle based), but its exchange
strategy is the hash-shuffle path that measures catastrophically slow in
local mode (a two-table sf0.01 join: 13 s warm where this operator runs it
in well under a second) and its partition count is fixed up front. This
module keeps the engine's one exchange idiom for every co-location need
(same as :mod:`.asof`): tag each side with a key-hash bucket, union the two
narrow projections, ONE sort-based ``groupby`` on the bucket id, and a
vectorized ``pandas.merge`` inside each bucket group.

Scale shape:

* only the join keys + requested value columns travel — callers project
  before joining (and ``right_values`` forces the decision on the right);
* bucket count scales with data / cluster size (``_derive_num_buckets``),
  so per-bucket population stays ~constant as the dataset grows;
* a bucket holds whole keys — skew is bounded by the hottest key; salt a
  pathological key upstream (``stages.skew``) if one arises;
* ``inner`` and ``left`` joins; left rows with no match get typed
  nulls (``from_pandas`` NaN→null on the cast back to the Arrow schema);
* ``semi`` and ``anti`` joins (EXISTS / NOT EXISTS): the right side ships
  ONLY its key columns, deduplicated per batch before the exchange — the
  probe payload is bounded by distinct keys, not right-side rows.

The small-side case does not belong here: when one side fits in the object
store, use :func:`broadcast_join` — no shuffle at all, the dimension table
is ``ray.put`` once and every batch does a local merge against it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _derive_num_buckets
from .sketches import key_hashes as _key_hashes


def hash_join(
    left,
    right,
    *,
    on: list[str] | str,
    right_on: list[str] | str | None = None,
    right_values: list[str] | None = None,
    how: str = "inner",
    right_agg: dict[str, str] | None = None,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """Join ``left`` to ``right`` on equality of ``on`` (left) =
    ``right_on`` (right; defaults to ``on``). Output carries ALL of
    ``left``'s columns plus ``right_values``; key columns keep the left
    names. ``how`` is ``"inner"``, ``"left"``, ``"outer"`` (FULL OUTER —
    unmatched rows from either side survive, key columns coalesced,
    missing payload typed-null), ``"semi"`` (keep left rows with ≥1 right
    match — SQL ``EXISTS``) or ``"anti"`` (keep left rows with none —
    ``NOT EXISTS``). Semi/anti output only the left columns;
    ``right_values`` must be empty, and the right side is pre-deduplicated
    per batch so only distinct keys cross the exchange.

    Duplicate keys on either side produce the full cross product within
    the key (SQL join semantics) — the in-bucket ``pandas.merge`` handles
    it; callers wanting first-match-only pre-dedup the right side.

    ``right_agg`` (column → ``sum``/``min``/``max``) fuses a keyed
    aggregate into the join: the right side is reduced per key INSIDE the
    bucket before the merge. Callers feed per-batch partial aggregates
    straight in, and the aggregate rides the join's exchange instead of
    paying its own — both operations need identical co-location by key,
    so two shuffles would move the same rows twice (the classic
    aggregate-join fusion; at 100 TB an entire all-to-all disappears).
    """
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(
            f"how must be inner|left|outer|semi|anti, got {how!r}"
        )
    existence = how in ("semi", "anti")
    if right_values is None:
        right_values = []
    if existence and right_values:
        raise ValueError("semi/anti joins carry no right_values")
    if existence and right_agg is not None:
        raise ValueError("right_agg is meaningless for semi/anti joins")
    if not existence and not right_values:
        raise ValueError("inner/left joins require right_values")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if len(on) != len(right_on):
        raise ValueError("on / right_on length mismatch")
    # Dataset.schema() runs a limit-1 probe when maps precede it; callers
    # knowing their footer schemas pass them (same contract as asof_join)
    if left_schema is None:
        left_schema = pa.schema(list(zip(left.schema().names, left.schema().types)))
    if right_schema is None:
        right_schema = pa.schema(list(zip(right.schema().names, right.schema().types)))
    lt = {f.name: f.type for f in left_schema}
    rt = {f.name: f.type for f in right_schema}
    left_cols = list(left_schema.names)
    for c in on:
        if c not in lt:
            raise ValueError(f"left missing join key {c!r}")
    for c in right_on:
        if c not in rt:
            raise ValueError(f"right missing join key {c!r}")
    bad = [c for c in right_values if c in left_cols]
    if bad:
        raise ValueError(f"right_values collide with left columns: {bad}")

    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)
    mask = np.uint64(num_buckets - 1)

    # unified narrow schema for the unioned exchange: left payload + right
    # payload, each side nulling the other's columns (explicit schema —
    # implicit unions trip Ray's block batcher / upcast ints, see asof.py)
    unified = pa.schema(
        [pa.field("__side", pa.int8()), pa.field("__b", pa.int32())]
        + [pa.field(c, lt[c]) for c in left_cols]
        + [pa.field(f"__r_{c}", rt[c]) for c in right_on]
        + [pa.field(c, rt[c]) for c in right_values]
    )

    left_proj = pa.schema([pa.field(c, lt[c]) for c in left_cols])
    right_proj = pa.schema(
        [pa.field(c, rt[c]) for c in list(right_on) + list(right_values)]
    )

    def tag_left(batch: pa.Table) -> pa.Table:
        if batch.schema != left_proj:
            # normalize to the DECLARED types before hashing: both sides
            # must hash identical logical keys to identical buckets, and
            # pandas-origin blocks drift units (e.g. a Timedelta shift
            # promotes timestamp[us] → [ns], silently changing every hash)
            batch = batch.cast(left_proj)
        n = batch.num_rows
        b = (_key_hashes(batch, on) & mask).astype(np.int32)
        cols = {
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
            "__b": pa.array(b),
        }
        for c in left_cols:
            cols[c] = batch[c]
        for c in right_on:
            cols[f"__r_{c}"] = pa.nulls(n, rt[c])
        for c in right_values:
            cols[c] = pa.nulls(n, rt[c])
        return pa.table(cols, schema=unified)

    def tag_right(batch: pa.Table) -> pa.Table:
        if batch.schema != right_proj:
            batch = batch.cast(right_proj)
        if existence:
            # existence probe: only DISTINCT keys matter — pre-reduce the
            # batch before it pays the exchange
            batch = batch.group_by(right_on).aggregate([])
        n = batch.num_rows
        b = (_key_hashes(batch, right_on) & mask).astype(np.int32)
        cols = {
            "__side": pa.array(np.ones(n, dtype=np.int8)),
            "__b": pa.array(b),
        }
        for c in left_cols:
            cols[c] = pa.nulls(n, lt[c])
        for c in right_on:
            cols[f"__r_{c}"] = batch[c]
        for c in right_values:
            cols[c] = batch[c]
        return pa.table(cols, schema=unified)

    # coarse batches: the AllToAll exchange is block-COUNT-bound at narrow
    # row widths (measured on asof: 144 tiny blocks → 2.3 s; 16k-row
    # batches halve it). At real scale blocks are >=128 MB either way.
    tagged = left.select_columns(left_cols).map_batches(
        tag_left, batch_format="pyarrow", batch_size=16384
    ).union(
        right.select_columns(list(right_on) + list(right_values)).map_batches(
            tag_right, batch_format="pyarrow", batch_size=16384
        )
    )

    out_schema = pa.schema(
        [pa.field(c, lt[c]) for c in left_cols]
        + [pa.field(c, rt[c]) for c in right_values]
    )
    out_cols = [f.name for f in out_schema]
    r_keys = [f"__r_{c}" for c in right_on]

    def bucket_join(tbl: pa.Table) -> pa.Table:
        # Arrow-backed frames: the unioned exchange nulls the OTHER side's
        # columns, and a default pandas conversion would upcast int64-with-
        # nulls to float64 — silently rounding keys/values above 2^53
        # before the merge even runs. ArrowDtype keeps them exact+nullable.
        df = tbl.to_pandas(types_mapper=pd.ArrowDtype)
        l = df.loc[df["__side"] == 0, left_cols]
        r = df.loc[df["__side"] == 1, r_keys + list(right_values)]
        # full outer is the only mode where right-only rows survive
        if l.empty and not (how == "outer" and not r.empty):
            return out_schema.empty_table()
        if r.empty and how in ("inner", "semi"):
            return out_schema.empty_table()
        r = r.rename(columns=dict(zip(r_keys, on)))
        # SQL semantics: a null in ANY key column matches nothing —
        # pandas.merge would happily pair NaN with NaN, so null-key rows
        # are routed around the match (kept where unmatched rows survive)
        l_null = l[on].isna().any(axis=1)
        r_null = r[on].isna().any(axis=1)
        if l_null.any() or r_null.any():
            l_nulls, l = l[l_null], l[~l_null]
            r_nulls, r = r[r_null], r[~r_null]
        else:
            l_nulls = r_nulls = None
        if existence:
            # per-batch pre-dedup leaves ≤1 copy per (key, right batch);
            # finish the dedup here, then EXISTS = inner merge on distinct
            # keys, NOT EXISTS = left merge keeping the unmatched rows
            keys = r[on].drop_duplicates()
            if how == "semi":
                joined = l.merge(keys, how="inner", on=on)
            else:
                probe = l.merge(
                    keys.assign(__hit=np.int8(1)), how="left", on=on
                )
                joined = probe.loc[probe["__hit"].isna(), left_cols]
                if l_nulls is not None and len(l_nulls):
                    joined = pd.concat([joined, l_nulls], ignore_index=True)
        else:
            if right_agg is not None and not r.empty:
                r = r.groupby(on, as_index=False).agg(
                    **{c: (c, fn) for c, fn in right_agg.items()}
                )
            joined = l.merge(r, how=how, on=on)
            if how in ("left", "outer") and l_nulls is not None and len(l_nulls):
                joined = pd.concat([joined, l_nulls], ignore_index=True)
            if how == "outer" and r_nulls is not None and len(r_nulls):
                joined = pd.concat([joined, r_nulls], ignore_index=True)
        # typed rebuild: undoes pandas' nullable-join upcasts and maps
        # left-join NaNs to Arrow nulls (from_pandas=True)
        return pa.table(
            {
                c: pa.array(joined[c], type=out_schema.field(c).type,
                            from_pandas=True)
                for c in out_cols
            },
            schema=out_schema,
        )

    return tagged.groupby("__b").map_groups(
        bucket_join, batch_format="pyarrow"
    )


def broadcast_join(
    ds,
    small,
    *,
    on: list[str] | str,
    right_on: list[str] | str | None = None,
    right_values: list[str] | None = None,
    how: str = "inner",
):
    """Map-side join against a small table: ``small`` (pyarrow Table or
    pandas DataFrame — a dimension table, a lookup, a filtered key list)
    is put in the object store ONCE and every ``map_batches`` task merges
    its batch against the shared-memory copy. No shuffle; the big side
    streams through. This is the right half of the join family for any
    side that fits comfortably in a worker's heap (the engine's rule of
    thumb: dimension tables, pre-aggregated small results).

    ``how="semi"`` / ``"anti"`` turn it into a broadcast existence filter
    (``EXISTS`` / ``NOT EXISTS`` against the small side's key set) — the
    map-side counterpart of :func:`hash_join`'s semi/anti modes, and the
    scale idiom behind every "drop rows seen in this reference list" step
    (decontamination, blocklists, already-processed ids).
    """
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how must be inner|left|semi|anti, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    sdf = small.to_pandas() if isinstance(small, pa.Table) else small
    # SQL equality never matches NULL keys, but pandas merge pairs NaN with
    # NaN — a null in the broadcast key list would make null big-side rows
    # EXISTS hits (inverting semi/anti) or join partners (inner/left). Drop
    # null-key rows from the small side so a null key simply never matches,
    # mirroring hash_join's explicit null-key routing.
    sdf = sdf.dropna(subset=list(right_on))
    if how in ("semi", "anti"):
        keys = (
            sdf[list(right_on)]
            .rename(columns=dict(zip(right_on, on)))
            .drop_duplicates()
        )
        keys_ref = ray.put(keys.assign(__hit=np.int8(1)))

        def exists_probe(df: pd.DataFrame) -> pd.DataFrame:
            probe = df.merge(ray.get(keys_ref), how="left", on=on)
            hit = probe["__hit"].notna()
            mask = hit if how == "semi" else ~hit
            return probe.loc[mask, list(df.columns)]

        return ds.map_batches(exists_probe, batch_format="pandas")

    if right_values is None:
        right_values = [c for c in sdf.columns if c not in right_on]
    sdf = sdf[list(right_on) + list(right_values)].rename(
        columns=dict(zip(right_on, on))
    )
    small_ref = ray.put(sdf)

    # the closure ships the ObjectRef, not the frame; ray.get inside the
    # task reads the one object-store copy (worker-local deserialization
    # cache makes repeated gets free). Light state → task pool, not actors.
    def probe(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(small_ref), how=how, on=on)

    return ds.map_batches(probe, batch_format="pandas")
