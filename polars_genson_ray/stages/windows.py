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


def session_windows(
    ds,
    ts_column: str,
    key_column: str,
    *,
    gap_seconds: float = 1800.0,
):
    """Session windowing: per key, sort by ts and split where the gap to the
    previous event exceeds ``gap_seconds``. Returns one row per session
    (key, session_start, session_end, n_events).

    Partitioning assumption: one key's events fit in one group (true for
    user-level sessions; salt hot keys upstream otherwise).
    """

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
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

    return ds.select_columns([key_column, ts_column]).groupby(key_column).map_groups(
        sessions, batch_format="pandas"
    )
