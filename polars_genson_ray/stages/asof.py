"""Distributed as-of join (point-in-time lookup).

Ray Data's ``Dataset.join`` is equi-only; an as-of join ("for each left
row, the latest right row with right_ts ≤ left_ts, matching on key") is
the canonical point-in-time enrichment — events against the most recent
order, quotes against trades. It decomposes cleanly under hash
partitioning: co-locate both sides by key bucket (ONE narrow shuffle per
side — only the join key, timestamps and the requested value columns
travel), then resolve each bucket with a vectorized sorted-merge
(``pandas.merge_asof``) inside ``map_groups``.

Semantics match DuckDB's ``ASOF JOIN`` (inner: left rows with no
qualifying right row are dropped; ``l.ts >= r.ts`` picks the greatest
right timestamp ≤ the left one). Callers with duplicate right rows per
(key, ts) should pre-dedup — tie order is engine-specific otherwise.

Scale notes: bucket count scales with data/cluster like every exchange
here (``dedup._derive_num_buckets``); a bucket holds whole keys, so skew
is bounded by the hottest single key — salt-split a pathological key by
time range if one arises (the bucket fn is injectable via ``num_buckets``
today; per-key salting composes with a final per-left-row max, not built
because no fixture needs it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _derive_num_buckets
from .sketches import hash64


def asof_join(
    left,
    right,
    *,
    key: str,
    ts: str,
    right_key: str,
    right_ts: str,
    right_values: list[str],
    direction: str = "backward",
    dedup_right_by: str | None = None,
    num_buckets: int | None = None,
    approx_rows: int | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
):
    """As-of join ``left`` to ``right``. Returns a Dataset with all of
    ``left``'s columns plus ``right_values`` (and ``right_ts``) from the
    matched row; left rows with no match are dropped (inner semantics,
    mirroring SQL ``ASOF JOIN``).

    ``dedup_right_by``: when the right side can hold several rows per
    (key, right_ts), keep only the row with the MAX of this column —
    post-shuffle, inside the bucket, so it costs no extra exchange — and
    the join is deterministic (SQL equivalent: ``QUALIFY row_number()
    OVER (PARTITION BY key, ts ORDER BY col DESC) = 1``)."""
    # Dataset.schema() executes a limit-1 probe per side when maps precede
    # it; callers that know their parquet footer schemas pass them instead
    if left_schema is None:
        left_schema = pa.schema(
            list(zip(left.schema().names, left.schema().types))
        )
    if right_schema is None:
        right_schema = pa.schema(
            list(zip(right.schema().names, right.schema().types))
        )
    left_cols = list(left_schema.names)
    if key not in left_cols or ts not in left_cols:
        raise ValueError(f"left must contain {key!r} and {ts!r}")
    lt = {f.name: f.type for f in left_schema}
    rt = {f.name: f.type for f in right_schema}
    carry = [c for c in left_cols if c != key]
    out_right = [right_ts] + list(right_values)
    bad = [c for c in out_right if c in carry]
    if bad:
        raise ValueError(
            f"right columns collide with left columns: {bad}"
        )
    # one unified Arrow schema for both sides (explicit — unioning pandas
    # blocks into arrow blocks trips Ray's batcher, and implicit null
    # columns would up-cast ints to float in pandas groups)
    unified = pa.schema(
        [pa.field("__key", pa.int64()), pa.field("__side", pa.int8()),
         pa.field("__b", pa.int32())]
        + [pa.field(c, lt[c]) for c in carry]
        + [pa.field(c, rt[c]) for c in out_right]
    )
    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)

    def _bucket(keys: np.ndarray) -> np.ndarray:
        return (hash64(keys.astype(np.uint64)) & np.uint64(num_buckets - 1)).astype(
            np.int32
        )

    left_proj = pa.schema([pa.field(c, lt[c]) for c in left_cols])
    right_proj = pa.schema(
        [pa.field(right_key, rt[right_key])]
        + [pa.field(c, rt[c]) for c in out_right]
    )

    def tag_left(batch: pa.Table) -> pa.Table:
        if batch.schema != left_proj:
            # normalize to declared types before hashing — pandas-origin
            # blocks can drift timestamp units, changing every key hash
            batch = batch.cast(left_proj)
        # SQL ASOF semantics: null keys never match — and a null would
        # force Arrow's float64 conversion path, which turns nulls into
        # INT64_MIN (spurious equi-matches) and rounds keys above 2^53
        if batch[key].null_count:
            batch = batch.filter(pa.compute.is_valid(batch[key]))
        n = batch.num_rows
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "__key": pa.array(keys, pa.int64()),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
            "__b": pa.array(_bucket(keys)),
        }
        for c in carry:
            cols[c] = batch[c]
        for c in out_right:
            cols[c] = pa.nulls(n, unified.field(c).type)
        return pa.table(cols, schema=unified)

    def tag_right(batch: pa.Table) -> pa.Table:
        if batch.schema != right_proj:
            batch = batch.cast(right_proj)
        if batch[right_key].null_count:
            batch = batch.filter(pa.compute.is_valid(batch[right_key]))
        n = batch.num_rows
        keys = batch[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "__key": pa.array(keys, pa.int64()),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
            "__b": pa.array(_bucket(keys)),
        }
        for c in carry:
            cols[c] = pa.nulls(n, unified.field(c).type)
        for c in out_right:
            cols[c] = batch[c]
        return pa.table(cols, schema=unified)

    # coarse batches: the tagged rows feed an AllToAll sort whose cost is
    # dominated by block COUNT at this row width (measured: 144 ~1.4k-row
    # blocks → 2.3 s sort; coalescing to ~16k-row blocks halves it)
    tagged = left.select_columns(left_cols).map_batches(
        tag_left, batch_format="pyarrow", batch_size=16384
    ).union(
        right.select_columns([right_key] + out_right).map_batches(
            tag_right, batch_format="pyarrow", batch_size=16384
        )
    )

    out_fields = (
        [pa.field(key, lt[key])]
        + [pa.field(c, lt[c]) for c in carry]
        + [pa.field(c, rt[c]) for c in out_right]
    )
    out_schema = pa.schema(out_fields)
    out_cols = [f.name for f in out_fields]

    def bucket_join(df: pd.DataFrame) -> pa.Table:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        if l.empty or r.empty:
            return out_schema.empty_table()
        l = l[["__key", *carry]].sort_values(ts, kind="mergesort")
        r = r[["__key", *out_right]]
        if dedup_right_by is not None:
            r = r.sort_values(dedup_right_by, kind="mergesort").drop_duplicates(
                ["__key", right_ts], keep="last"
            )
        r = r.sort_values(right_ts, kind="mergesort")
        if ts == right_ts:
            r = r.rename(columns={right_ts: right_ts + "__r"})
            r_on = right_ts + "__r"
        else:
            r_on = right_ts
        joined = pd.merge_asof(
            l, r, left_on=ts, right_on=r_on, by="__key", direction=direction
        )
        joined = joined.dropna(subset=[r_on])
        if r_on != right_ts:
            joined = joined.rename(columns={r_on: right_ts})
        joined = joined.rename(columns={"__key": key})
        # nullable-join upcasts (int→float) are undone by the schema cast
        return pa.Table.from_pandas(
            joined[out_cols], preserve_index=False
        ).cast(out_schema)

    return tagged.groupby("__b").map_groups(bucket_join, batch_format="pandas")
