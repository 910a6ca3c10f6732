"""Plan-level scale guards: queries designed around partial+tiny-combine
must never regress into an all-to-all Sort of the input. The logical plan
string is asserted BEFORE execution, so these guards catch a regression
even at toy data sizes where the sort would still be fast.

(`Repartition(1)` of pre-reduced partials and the keyed groupby of
bucket-partitioned exchanges are fine — the guard is specifically about
sorting the full input to produce k rows.)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)


def _plan(ds) -> str:
    return ds._plan.get_plan_as_string(type(ds))


def test_top_events_has_no_global_sort(ray_session):
    from polars_genson_ray.pipelines import queries as Q

    ds = Q.q_top_events(SF_DIR)
    assert "Sort" not in _plan(ds)
    assert len(ds.take_all()) == 10


def test_grouped_topk_small_path_has_no_global_sort(ray_session):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.aggregate import grouped_topk

    ds = grouped_topk(
        rd.from_pandas(pd.DataFrame({"k": list("ab") * 50, "v": range(100)})),
        "k",
        "v",
        3,
        tie_columns=(),
    )
    assert "Sort" not in _plan(ds)


def test_tumbling_window_small_path_has_no_global_sort(ray_session):
    from polars_genson_ray.pipelines import queries as Q
    from polars_genson_ray.stages.windows import tumbling_window
    from polars_genson_ray.pipelines.queries import _read

    ds = tumbling_window(
        _read(SF_DIR, "events", ["ts", "event_type", "value"]),
        "ts",
        "event_type",
        "value",
        window="1h",
    )
    assert "Sort" not in _plan(ds)


def test_top_events_per_type_has_no_global_sort(ray_session):
    from polars_genson_ray.pipelines import queries as Q

    ds = Q.q_top_events_per_type(SF_DIR)
    assert "Sort" not in _plan(ds)
    assert len(ds.take_all()) == 15  # 5 event types × 3


def test_event_value_percentiles_has_no_global_sort(ray_session):
    """PERCENT_RANK must come from the broadcast CDF, never from sorting
    the events table."""
    from polars_genson_ray.pipelines import queries as Q

    ds = Q.q_event_value_percentiles(SF_DIR)
    assert "Sort" not in _plan(ds)
    assert ds.count() == 1000


def test_bucketed_groups_hot_key_guard_fails_loudly(ray_session):
    """A planted 30%-hot-key bucket must raise (naming the key), never
    silently build one giant pandas frame."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from polars_genson_ray.stages.aggregate import bucketed_groups

    n = 10_000
    keys = np.where(np.arange(n) % 10 < 3, 7, np.arange(n))  # key 7 = 30%
    df = pd.DataFrame({"k": keys.astype(np.int64), "v": 1.0})
    ds = bucketed_groups(
        rd.from_pandas(df, override_num_blocks=8),
        ["k"],
        lambda d: d.groupby("k", as_index=False)["v"].sum(),
        max_bucket_rows=1000,
    )
    with pytest.raises(ray.exceptions.RayTaskError) as ei:
        ds.take_all()
    msg = str(ei.value)
    assert "max_bucket_rows" in msg and "hottest keys" in msg


def test_bucketed_groups_pre_reduce_reroutes_hot_key(ray_session):
    """The same 30%-hot-key workload with a decomposable reduce passes a
    pre_reduce combiner: the hot key crosses the exchange as ≤1 row per
    block, so the tight cap is never hit and the result is exact."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from polars_genson_ray.stages.aggregate import bucketed_groups

    n = 10_000
    keys = np.where(np.arange(n) % 10 < 3, 7, np.arange(n))
    df = pd.DataFrame({"k": keys.astype(np.int64), "v": 1.0})

    def combiner(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", as_index=False)["v"].sum()

    out = bucketed_groups(
        rd.from_pandas(df, override_num_blocks=8),
        ["k"],
        combiner,
        pre_reduce=combiner,
        max_bucket_rows=1000,
    ).to_pandas()
    # key 7 = 3000 planted hot rows + row i=7 itself (7 % 10 >= 3 keeps it)
    assert float(out.loc[out["k"] == 7, "v"].iloc[0]) == 3001.0
    assert len(out) == n - 3000
    assert float(out["v"].sum()) == float(n)
