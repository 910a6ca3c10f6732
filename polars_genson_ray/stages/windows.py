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
