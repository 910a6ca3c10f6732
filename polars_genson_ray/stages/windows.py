"""Windowed aggregates over an event stream table.

Ray Data has no event-time windowing; tumbling windows are expressed as
truncate-timestamp + pre-aggregate per batch + a small groupby over the
per-(window, key) partials (ray_guide "Streaming-shaped workloads" /
"Aggregation at scale"). Session windows use sort-within-key map_groups.
"""

from __future__ import annotations

import pandas as pd

from .aggregate import combine_partials


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
    NOT NULL``. ``time_bucket=None`` keeps one group per key.
    """

    import numpy as np

    def bucket_partial(group: pd.DataFrame) -> pd.DataFrame:
        # exact integer microsecond ticks (storage resolution); -1 marks
        # "no in-bucket gap" (real gaps are >= 0)
        ticks = np.sort(
            group[ts_column].to_numpy(dtype="datetime64[us]").astype(np.int64)
        )
        max_gap = int(np.diff(ticks).max()) if len(ticks) > 1 else -1
        return pd.DataFrame(
            {
                key_column: [group[key_column].iloc[0]],
                "__first": [int(ticks[0])],
                "__last": [int(ticks[-1])],
                "__n": [len(ticks)],
                "__max_gap": [max_gap],
            }
        )

    pruned = ds.select_columns([key_column, ts_column])
    if time_bucket is None:
        partials = pruned.groupby(key_column).map_groups(
            bucket_partial, batch_format="pandas"
        )
    else:
        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(__tb=df[ts_column].dt.floor(time_bucket))

        partials = (
            pruned.map_batches(add_bucket, batch_format="pandas")
            .groupby([key_column, "__tb"])
            .map_groups(
                lambda g: bucket_partial(g.drop(columns="__tb")),
                batch_format="pandas",
            )
        )

    def stitch(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("__first")
        n = int(group["__n"].sum())
        if n < 2:
            return pd.DataFrame(
                {
                    key_column: pd.Series([], dtype=group[key_column].dtype),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "avg_gap_s": pd.Series([], dtype="float64"),
                    "max_gap_s": pd.Series([], dtype="float64"),
                }
            )
        first = group["__first"].to_numpy(dtype=np.int64)
        last = group["__last"].to_numpy(dtype=np.int64)
        # boundary gaps between time-adjacent buckets (buckets partition
        # time, so sorting by __first orders them); single-event buckets
        # carry the -1 sentinel — n≥2 guarantees a real candidate remains
        cand = np.concatenate(
            [group["__max_gap"].to_numpy(dtype=np.int64), first[1:] - last[:-1]]
        )
        max_gap_us = int(cand[cand >= 0].max())
        span_us = int(last.max() - first.min())
        n_gaps = n - 1
        # fixed-order single divisions — mirrored exactly by the SQL oracle
        avg_gap = (span_us / 1e6) / n_gaps
        max_gap = max_gap_us / 1e6
        if round_to is not None:
            avg_gap = round(avg_gap, round_to)
            max_gap = round(max_gap, round_to)
        return pd.DataFrame(
            {
                key_column: [group[key_column].iloc[0]],
                "n_gaps": [n_gaps],
                "avg_gap_s": [avg_gap],
                "max_gap_s": [max_gap],
            }
        )

    return partials.groupby(key_column).map_groups(
        stitch, batch_format="pandas"
    )


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

    totals = combine_partials(
        pruned.map_batches(bucket_sums, batch_format="pandas"),
        [key_column, "__tb"],
        {"__tot": "sum"},
    ).to_pandas()
    totals = totals.sort_values([key_column, "__tb"])
    totals["__off"] = totals.groupby(key_column)["__tot"].cumsum() - totals[
        "__tot"
    ]
    offsets_ref = ray.put(
        totals.set_index([key_column, "__tb"])["__off"]
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__tb=df[ts_column].dt.floor(time_bucket))

    def scan_slice(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values([ts_column, tie_column])
        off = ray.get(offsets_ref).at[
            (group[key_column].iloc[0], group["__tb"].iloc[0])
        ]
        out = group.drop(columns="__tb")
        out[out_column] = group[value_column].cumsum() + off
        return out

    return (
        pruned.map_batches(add_bucket, batch_format="pandas")
        .groupby([key_column, "__tb"])
        .map_groups(scan_slice, batch_format="pandas")
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

    def add_bucket_and_context(df: pd.DataFrame) -> pd.DataFrame:
        own = df.assign(
            __tb=df[ts_column].dt.floor(time_bucket), __ctx=False
        )
        # tail rows also feed the next bucket's lookback window
        tail = own[own[ts_column] >= own["__tb"] + (tb - w)]
        if len(tail):
            ctx = tail.assign(__tb=tail["__tb"] + tb, __ctx=True)
            own = pd.concat([own, ctx], ignore_index=True)
        return own

    sum_col, n_col = f"{out_prefix}_sum", f"{out_prefix}_n"

    def rolling_slice(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(ts_column, kind="mergesort")
        ticks = group[ts_column].to_numpy(dtype="datetime64[us]").astype(
            np.int64
        )
        vals = group[value_column].to_numpy()
        prefix = np.concatenate([[0], np.cumsum(vals)])
        # RANGE frame: [ts - w, ts] inclusive, ts-ties are peers
        lo = np.searchsorted(ticks, ticks - w_us, side="left")
        hi = np.searchsorted(ticks, ticks, side="right")
        out = group.assign(
            **{sum_col: prefix[hi] - prefix[lo], n_col: hi - lo}
        )
        out = out[~out["__ctx"]]
        return out.drop(columns=["__tb", "__ctx"])

    return (
        ds.map_batches(add_bucket_and_context, batch_format="pandas")
        .groupby([key_column, "__tb"])
        .map_groups(rolling_slice, batch_format="pandas")
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
    global answer exactly. ``time_bucket=None`` keeps the one-group-per-
    key single-phase shape (requires a key's events to fit one group).
    """

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(ts_column)
        ts = group[ts_column]
        gap = ts.diff().dt.total_seconds().fillna(float("inf"))
        session_id = (gap > gap_seconds).cumsum()
        out = group.groupby(session_id).agg(
            session_start=(ts_column, "min"),
            session_end=(ts_column, "max"),
            n_events=(ts_column, "size"),
        )
        out[key_column] = group[key_column].iloc[0]
        return out.reset_index(drop=True)[
            [key_column, "session_start", "session_end", "n_events"]
        ]

    pruned = ds.select_columns([key_column, ts_column])
    if time_bucket is None:
        return pruned.groupby(key_column).map_groups(
            sessionize, batch_format="pandas"
        )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__tb=df[ts_column].dt.floor(time_bucket))

    def sessionize_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return sessionize(group.drop(columns="__tb"))

    per_bucket = (
        pruned.map_batches(add_bucket, batch_format="pandas")
        .groupby([key_column, "__tb"])
        .map_groups(sessionize_bucket, batch_format="pandas")
    )

    def stitch(group: pd.DataFrame) -> pd.DataFrame:
        # input: one row per per-bucket session (events already reduced);
        # merge consecutive sessions whose inter-session gap ≤ threshold —
        # only sessions split by a bucket edge qualify
        group = group.sort_values("session_start")
        prev_end = group["session_end"].shift()
        gap = (group["session_start"] - prev_end).dt.total_seconds()
        merged_id = (~(gap <= gap_seconds)).cumsum()
        out = group.groupby(merged_id).agg(
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
            n_events=("n_events", "sum"),
        )
        out[key_column] = group[key_column].iloc[0]
        return out.reset_index(drop=True)[
            [key_column, "session_start", "session_end", "n_events"]
        ]

    return per_bucket.groupby(key_column).map_groups(
        stitch, batch_format="pandas"
    )
