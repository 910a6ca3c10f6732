"""Windowed aggregates over an event stream table.

Ray Data has no event-time windowing; tumbling windows are expressed as
truncate-timestamp + pre-aggregate per batch + a small groupby over the
per-(window, key) partials (ray_guide "Streaming-shaped workloads" /
"Aggregation at scale"). Session windows use sort-within-key map_groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .aggregate import combine_partials


def _bucket_ticks(col, time_bucket: str):
    """(epoch ticks int64, bucket step in the column's own unit).

    Refuses null timestamps and sub-unit buckets up front: a null would
    round-trip through float64 (Arrow null → NaN → INT64_MIN → a garbage
    year-2262 bucket) and drag every valid ns-tick in the batch through
    float64 rounding; a ``time_bucket`` finer than the column unit would
    floor-divide by zero and collapse all rows into the epoch bucket."""
    unit = col.type.unit
    div = {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000}[unit]
    tdv = pd.Timedelta(time_bucket).value
    if tdv <= 0 or tdv % div:
        raise ValueError(
            f"time_bucket {time_bucket!r} is not a positive whole multiple "
            f"of the timestamp column's unit ({unit!r}) — the bucket width "
            "would silently truncate"
        )
    step = np.int64(tdv // div)
    if col.null_count:
        raise ValueError(
            "null timestamps cannot be window-bucketed — filter or fill "
            "them first so every row has a defined bucket"
        )
    # no nulls → Arrow gives the int64 ticks directly (no float64 detour)
    ticks = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    assert ticks.dtype == np.int64
    return ticks, step


def _arrow_add_bucket(ts_column: str, time_bucket: str, out: str = "__tb"):
    """pyarrow tag stage: append ``out`` = ts floored to ``time_bucket``.

    Integer floor-division on the epoch ticks in the column's own unit —
    identical to pandas ``.dt.floor`` for the fixed-frequency aliases this
    engine passes (d/h/min/s; numpy ``//`` floors toward −inf, matching
    pandas on pre-epoch values too) — with no Arrow→pandas round-trip on
    a 100%-of-rows stage (measured 3.1 ms → 0.14 ms per 16k-row batch)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch[ts_column]
        ticks, step = _bucket_ticks(col, time_bucket)
        tb = (ticks // step) * step
        return batch.append_column(
            out, pa.array(tb, pa.int64()).cast(col.type)
        )

    return add_bucket


def tumbling_window(
    ds,
    ts_column: str,
    key_column: str,
    value_column: str,
    *,
    window: str = "1h",
    small: bool = True,
):
    """Per-(key, window) count/sum/min/max. ``window`` is a pandas offset
    alias (``1h``, ``15min``, ``1d``). ``small=True`` assumes the distinct
    (key, window) set fits one combine task (true for bounded key sets ×
    bounded horizons); pass ``False`` for unbounded keys."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[ts_column, key_column, value_column]].copy()
        batch["window_start"] = batch[ts_column].dt.floor(window)
        g = batch.groupby([key_column, "window_start"], as_index=False).agg(
            n=(value_column, "size"),
            sum_value=(value_column, "sum"),
            min_value=(value_column, "min"),
            max_value=(value_column, "max"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    return combine_partials(
        partials,
        [key_column, "window_start"],
        {"n": "sum", "sum_value": "sum", "min_value": "min", "max_value": "max"},
        small=small,
    )


def sliding_window(
    ds,
    ts_column: str,
    key_column: str,
    value_column: str,
    *,
    window: str = "1h",
    hop: str = "30min",
    small: bool = True,
):
    """Hopping/sliding windows: size ``window``, advancing by ``hop``
    (``window`` must be a multiple of ``hop``). Each event belongs to
    ``window/hop`` overlapping windows; the expansion happens per batch
    (k small copies, each immediately pre-aggregated), so only per-(key,
    window_start) partials — not replicated events — cross the exchange.
    Same combine shape as :func:`tumbling_window`.
    """
    w, h = pd.Timedelta(window), pd.Timedelta(hop)
    k, rem = divmod(w, h)
    if rem != pd.Timedelta(0):
        raise ValueError(f"window {window} must be a multiple of hop {hop}")
    k = int(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[ts_column, key_column, value_column]].copy()
        base = batch[ts_column].dt.floor(hop)
        frames = []
        for i in range(k):
            f = batch[[key_column, value_column]].copy()
            f["window_start"] = base - i * h
            frames.append(f)
        rep = pd.concat(frames, ignore_index=True)
        return rep.groupby([key_column, "window_start"], as_index=False).agg(
            n=(value_column, "size"),
            sum_value=(value_column, "sum"),
            min_value=(value_column, "min"),
            max_value=(value_column, "max"),
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return combine_partials(
        partials,
        [key_column, "window_start"],
        {"n": "sum", "sum_value": "sum", "min_value": "min", "max_value": "max"},
        small=small,
    )


def keyed_gap_stats(
    ds,
    ts_column: str,
    key_column: str,
    *,
    time_bucket: str | None = "7d",
    round_to: int | None = None,
):
    """Per-key inter-arrival statistics — the ``LAG(ts) OVER (PARTITION BY
    key ORDER BY ts)`` window reduced to (n_gaps, avg_gap_s, max_gap_s) per
    key, without ever materializing a key's full ordered history in one
    task.

    Values are bit-reproducible against SQL without rounding: every gap is
    carried as EXACT integer microseconds (the storage resolution), the
    gap sum telescopes to ``last − first`` (integer subtraction, no float
    accumulation), and the float conversions are single divisions applied
    in a fixed order — ``max_gap_s = max_gap_us / 1e6``, ``avg_gap_s =
    (span_us / 1e6) / n_gaps`` — that the SQL mirror
    (``date_diff('microsecond', …)`` then the same divisions) reproduces
    bit-for-bit. (``epoch(interval)`` is NOT safe here: its double
    conversion differs from a correctly-rounded ``us / 1e6`` by an ulp.)

    Decomposition (same spill shape as :func:`session_windows`): events
    group by (key, ``time_bucket``); each group sorts ITS slice and emits
    one partial row (first/last ts, event count, max in-bucket gap). The
    per-key stitch then only sees one row per bucket: boundary gaps are
    ``first_ts[i] − last_ts[i−1]`` between time-adjacent buckets, the gap
    SUM telescopes to ``last − first`` globally, and max is associative —
    so the bucketed reduction is exact, not approximate. Keys with a
    single event (no gaps) are dropped, matching the SQL ``WHERE gap IS
    NOT NULL``. ``time_bucket=None`` computes one partial per key.

    Both phases run under ``bucketed_groups`` with whole-frame vectorized
    bodies (sorted diff with segment-boundary masking, one groupby-agg
    per bucket) — never one Python call per key.
    """

    import numpy as np

    from .aggregate import bucketed_groups

    seg_cols = (
        [key_column] if time_bucket is None else [key_column, "__tb"]
    )

    def gap_partials_frame(df: pd.DataFrame) -> pd.DataFrame:
        # exact integer microsecond ticks (storage resolution); -1 marks
        # "no gap" (segment-first rows / single-event segments)
        d = df.sort_values(seg_cols + [ts_column], kind="mergesort")
        ticks = d[ts_column].to_numpy(dtype="datetime64[us]").astype(np.int64)
        same_seg = np.ones(len(d), dtype=bool)
        for c in seg_cols:
            same_seg &= d[c].eq(d[c].shift()).to_numpy()
        gaps = np.concatenate(
            [[-1], np.where(same_seg[1:], np.diff(ticks), -1)]
        )
        d = d.assign(__tick=ticks, __gap=gaps)
        g = d.groupby(seg_cols, as_index=False, sort=False).agg(
            __first=("__tick", "min"),
            __last=("__tick", "max"),
            __n=("__tick", "size"),
            __max_gap=("__gap", "max"),
        )
        return g[[key_column, "__first", "__last", "__n", "__max_gap"]]

    pruned = ds.select_columns([key_column, ts_column])
    if time_bucket is None:
        partials = bucketed_groups(pruned, [key_column], gap_partials_frame)
    else:
        partials = bucketed_groups(
            pruned.map_batches(
                _arrow_add_bucket(ts_column, time_bucket),
                batch_format="pyarrow", batch_size=16384
            ),
            seg_cols,
            gap_partials_frame,
        )

    def stitch_frame(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key_column, "__first"], kind="mergesort")
        first = d["__first"].to_numpy(dtype=np.int64)
        last = d["__last"].to_numpy(dtype=np.int64)
        new_key = d[key_column].ne(d[key_column].shift()).to_numpy()
        # boundary gap to the previous bucket of the SAME key (buckets
        # partition time, so __first order is time order); -1 elsewhere
        prev_last = np.concatenate([[0], last[:-1]])
        d = d.assign(__bgap=np.where(new_key, -1, first - prev_last))
        g = d.groupby(key_column, as_index=False, sort=False).agg(
            __n=("__n", "sum"),
            __first=("__first", "min"),
            __last=("__last", "max"),
            __mg=("__max_gap", "max"),
            __bg=("__bgap", "max"),
        )
        g = g[g["__n"] >= 2]
        if g.empty:
            return pd.DataFrame(
                {
                    key_column: pd.Series([], dtype=df[key_column].dtype),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "avg_gap_s": pd.Series([], dtype="float64"),
                    "max_gap_s": pd.Series([], dtype="float64"),
                }
            )
        n_gaps = (g["__n"] - 1).to_numpy(dtype=np.int64)
        # n≥2 guarantees a real (≥0) candidate: one segment with a gap,
        # or a boundary between two segments of the key
        max_gap_us = np.maximum(
            g["__mg"].to_numpy(np.int64), g["__bg"].to_numpy(np.int64)
        )
        span_us = (g["__last"] - g["__first"]).to_numpy(dtype=np.int64)
        # fixed-order single divisions — mirrored exactly by the SQL oracle
        avg_gap = (span_us / 1e6) / n_gaps
        max_gap = max_gap_us / 1e6
        if round_to is not None:
            avg_gap = np.round(avg_gap, round_to)
            max_gap = np.round(max_gap, round_to)
        return pd.DataFrame(
            {
                key_column: g[key_column].to_numpy(),
                "n_gaps": n_gaps,
                "avg_gap_s": avg_gap,
                "max_gap_s": max_gap,
            }
        )

    return bucketed_groups(partials, [key_column], stitch_frame)


def keyed_running_total(
    ds,
    key_column: str,
    ts_column: str,
    tie_column: str,
    value_column: str,
    *,
    out_column: str = "running_total",
    time_bucket: str = "7d",
):
    """Per-key ordered cumulative sum — ``SUM(value) OVER (PARTITION BY key
    ORDER BY ts, tie ROWS UNBOUNDED PRECEDING)`` — as a two-pass prefix
    sum, the classic distributed scan:

    1. a partial-aggregate pass computes per-(key, time-bucket) value
       totals (per-batch partials → small combine — only `keys × buckets`
       rows, never the data, reach the offset table), from which each
       bucket's EXCLUSIVE prefix offset within its key is derived;
    2. the row pass groups by (key, bucket), sorts each slice by
       (ts, tie), local-cumsums, and adds the broadcast offset.

    No task ever holds a key's full history — a hot key's rows split
    across time buckets exactly as in :func:`session_windows`. The offset
    table is broadcast via ``ray.put`` (shared-memory read per task); it
    holds one row per (key, bucket) so it outgrows a broadcast only when
    distinct keys × horizon does — route through ``stages.join.hash_join``
    at that point. ``value_column`` should be integer (e.g. cents) when
    exact run-to-run / engine-to-oracle equality matters: integer prefix
    sums are order-of-association exact, float ones are not.

    The input is read TWICE (offset pass + row pass) — two cheap column-
    pruned scans beat shipping every row through an extra exchange.
    """
    import ray

    from .aggregate import combine_partials

    cols = [key_column, ts_column, tie_column, value_column]
    pruned = ds.select_columns(cols)

    def bucket_sums(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(__tb=df[ts_column].dt.floor(time_bucket))
        return df.groupby([key_column, "__tb"], as_index=False).agg(
            __tot=(value_column, "sum")
        )

    from .aggregate import bucketed_groups

    totals = combine_partials(
        pruned.map_batches(bucket_sums, batch_format="pandas"),
        [key_column, "__tb"],
        {"__tot": "sum"},
    ).to_pandas()
    totals = totals.sort_values([key_column, "__tb"])
    totals["__off"] = totals.groupby(key_column)["__tot"].cumsum() - totals[
        "__tot"
    ]
    offsets_ref = ray.put(totals[[key_column, "__tb", "__off"]])

    def scan_frame(df: pd.DataFrame) -> pd.DataFrame:
        # whole-bucket vectorized scan: one sort, one grouped cumsum, one
        # merge against the broadcast offsets — never a per-key call
        d = df.sort_values(
            [key_column, "__tb", ts_column, tie_column], kind="mergesort"
        )
        run = d.groupby([key_column, "__tb"], sort=False)[
            value_column
        ].cumsum()
        off = d[[key_column, "__tb"]].merge(
            ray.get(offsets_ref), on=[key_column, "__tb"], how="left"
        )["__off"]
        out = d.drop(columns="__tb")
        out[out_column] = run.to_numpy() + off.to_numpy()
        return out

    return bucketed_groups(
        pruned.map_batches(
            _arrow_add_bucket(ts_column, time_bucket),
            batch_format="pyarrow", batch_size=16384
        ),
        [key_column, "__tb"],
        scan_frame,
    )


def keyed_time_rolling(
    ds,
    key_column: str,
    ts_column: str,
    value_column: str,
    *,
    window: str = "1h",
    out_prefix: str = "rolling",
    time_bucket: str = "7d",
):
    """Per-key time-range rolling aggregate — ``SUM(value) / COUNT(*) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW)`` — with SQL RANGE-frame semantics (ties on ``ts`` are
    peers: every row with the same timestamp sees the same frame, so the
    result is deterministic without a tie-break column).

    Scale shape: rows group by (key, ``time_bucket``) like the other
    keyed-window operators; a row whose lookback crosses its bucket's
    start edge needs the previous bucket's tail, so each row within
    ``window`` of its bucket's END is replicated once into the NEXT
    bucket as a context row (computes, never emitted). Replication factor
    is ``window/time_bucket`` of the data (~0.6% at the defaults) — the
    exchange stays linear and no task holds a key's history.

    ``window`` must not exceed ``time_bucket`` (one-bucket lookback).
    Integer value columns (cents) make the prefix sums exact; the output
    appends ``{out_prefix}_sum`` and ``{out_prefix}_n`` to the input
    columns.
    """
    import numpy as np

    w = pd.Timedelta(window)
    tb = pd.Timedelta(time_bucket)
    if w > tb:
        raise ValueError(f"window {window} exceeds time_bucket {time_bucket}")
    w_us = np.int64(w.value // 1000)

    def add_bucket_and_context(batch: pa.Table) -> pa.Table:
        # pyarrow tag: epoch-tick floor + tail replication, no pandas
        # round-trip on this 100%-of-rows stage
        col = batch[ts_column]
        ticks, step = _bucket_ticks(col, time_bucket)
        tbv = (ticks // step) * step
        n = len(ticks)
        own = batch.append_column(
            "__tb", pa.array(tbv, pa.int64()).cast(col.type)
        ).append_column("__ctx", pa.array(np.zeros(n, dtype=bool)))
        # unit-matched window ticks (w_us is µs; rescale to the col unit)
        unit = col.type.unit
        w_ticks = np.int64(
            int(w.value)
            // {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000}[unit]
        )
        # tail rows also feed the next bucket's lookback window
        mask = ticks >= tbv + (step - w_ticks)
        if mask.any():
            sel = pa.array(np.flatnonzero(mask))
            ctx = batch.take(sel).append_column(
                "__tb", pa.array(tbv[mask] + step, pa.int64()).cast(col.type)
            ).append_column(
                "__ctx", pa.array(np.ones(int(mask.sum()), dtype=bool))
            )
            own = pa.concat_tables([own, ctx])
        return own

    sum_col, n_col = f"{out_prefix}_sum", f"{out_prefix}_n"

    # disjoint per-segment tick ranges let ONE global searchsorted handle
    # every (key, bucket) segment in the bucket frame at once: ticks are
    # rebased to the segment's bucket start (∈ [-w, tb)), then shifted by
    # segment_index · SEG_STEP with SEG_STEP > tb + 2w — lookbacks can
    # never reach a neighboring segment's range.  The stride is the
    # MINIMAL one the disjointness proof needs (tb + 2w + 1), not a fixed
    # power of two: a 2^41 µs stride would wrap int64 silently at ~2^22
    # segments per frame, exactly the regime a hot hash bucket at
    # 10^12-row scale reaches.
    tb_us = int(tb.value // 1000)
    SEG_STEP = np.int64(tb_us + 2 * int(w_us) + 1)

    def rolling_frame(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(
            [key_column, "__tb", ts_column], kind="mergesort"
        ).reset_index(drop=True)
        ticks = d[ts_column].to_numpy(dtype="datetime64[us]").astype(np.int64)
        tb_ticks = d["__tb"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        new_seg = (
            d[key_column].ne(d[key_column].shift())
            | d["__tb"].ne(d["__tb"].shift())
        ).to_numpy()
        seg_id = np.cumsum(new_seg)
        if len(seg_id) and int(seg_id[-1]) * int(SEG_STEP) + tb_us >= 2**63:
            # unreachable for any frame that fits in memory, but fail loud
            # rather than let the encoded ticks wrap and corrupt the
            # global searchsorted
            raise OverflowError(
                f"{int(seg_id[-1])} (key, {time_bucket}) segments exceed "
                "the int64 segment-tick encoding for this bucket frame"
            )
        tg = (ticks - tb_ticks) + seg_id * SEG_STEP
        vals = d[value_column].to_numpy()
        prefix = np.concatenate([[0], np.cumsum(vals)])
        # RANGE frame: [ts - w, ts] inclusive, ts-ties are peers
        lo = np.searchsorted(tg, tg - w_us, side="left")
        hi = np.searchsorted(tg, tg, side="right")
        out = d.assign(
            **{sum_col: prefix[hi] - prefix[lo], n_col: hi - lo}
        )
        out = out[~out["__ctx"]]
        return out.drop(columns=["__tb", "__ctx"])

    from .aggregate import bucketed_groups

    return bucketed_groups(
        ds.map_batches(
            add_bucket_and_context, batch_format="pyarrow", batch_size=16384
        ),
        [key_column, "__tb"],
        rolling_frame,
    )


def session_windows(
    ds,
    ts_column: str,
    key_column: str,
    *,
    gap_seconds: float = 1800.0,
    time_bucket: str | None = "7d",
):
    """Session windowing: per key, sort by ts and split where the gap to the
    previous event exceeds ``gap_seconds``. Returns one row per session
    (key, session_start, session_end, n_events).

    Hot-key spill path (default): events group by (key, ``time_bucket``)
    — a hot key's events split across time buckets, so no single group
    must hold the key's full history — then a second, tiny groupby over
    the per-bucket SESSION rows (one row per session, not per event)
    stitches sessions that straddle bucket edges. Sessionization is
    transitive gap-chaining, so splitting at arbitrary time points and
    re-merging adjacent sessions with gap ≤ threshold reproduces the
    global answer exactly. ``time_bucket=None`` drops the stitch phase
    (one-phase, still key-bucketed).

    Both phases run under ``bucketed_groups`` — ONE vectorized pandas
    call per hash bucket, never one Python call per key: a per-key
    ``map_groups`` measured 15 s at sf0.1 (7,500 groups) for work the
    whole-frame sort+diff+cumsum does in under a second. Key changes in
    the sorted frame force session breaks, so many keys sessionize in
    one pass; two time-bucket slices of one key co-residing in a bucket
    may pre-merge across the bucket edge, which is exactly what the
    stitch phase would do (gap-chaining is transitive — same result).
    """
    from .aggregate import bucketed_groups

    out_cols = [key_column, "session_start", "session_end", "n_events"]

    def sessionize_frame(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized sessionization of MANY keys at once: one sort, one
        # diff, one cumsum; a key change forces a session break
        df = df.sort_values([key_column, ts_column], kind="mergesort")
        gap = df[ts_column].diff().dt.total_seconds()
        new_key = df[key_column].ne(df[key_column].shift())
        sid = (new_key | (gap > gap_seconds)).cumsum()
        out = df.groupby(sid, sort=False).agg(
            **{key_column: (key_column, "first")},
            session_start=(ts_column, "min"),
            session_end=(ts_column, "max"),
            n_events=(ts_column, "size"),
        )
        return out.reset_index(drop=True)[out_cols]

    pruned = ds.select_columns([key_column, ts_column])
    if time_bucket is None:
        return bucketed_groups(pruned, [key_column], sessionize_frame)

    per_bucket = bucketed_groups(
        pruned.map_batches(
            _arrow_add_bucket(ts_column, time_bucket),
            batch_format="pyarrow", batch_size=16384
        ),
        [key_column, "__tb"],
        lambda df: sessionize_frame(df.drop(columns="__tb")),
    )

    def stitch_frame(df: pd.DataFrame) -> pd.DataFrame:
        # input: one row per per-bucket session (events already reduced);
        # merge consecutive same-key sessions whose inter-session gap ≤
        # threshold — only sessions split by a bucket edge qualify
        df = df.sort_values([key_column, "session_start"], kind="mergesort")
        new_key = df[key_column].ne(df[key_column].shift())
        gap = (
            df["session_start"] - df["session_end"].shift()
        ).dt.total_seconds()
        mid = (new_key | ~(gap <= gap_seconds)).cumsum()
        out = df.groupby(mid, sort=False).agg(
            **{key_column: (key_column, "first")},
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
        )
        return out.reset_index(drop=True)[out_cols]

    return bucketed_groups(per_bucket, [key_column], stitch_frame)
