"""Unit tests for the co-partitioned hash join and the broadcast join
(stages/join.py) — semantics pinned against pandas merge on hand-sized
random inputs, including duplicate keys (cross product), string keys,
multi-column keys, and left-join null handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl: pa.Table, parts: int = 3):
    import ray.data as rd

    return rd.from_arrow(tbl).repartition(parts)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_hash_join_matches_pandas(ray_session, how):
    from polars_genson_ray.stages.join import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=300),
            "lv": rng.normal(size=300),
            "tag": rng.choice(["x", "y"], size=300),
        }
    )
    # right misses some keys and duplicates others (cross-product check)
    right = pd.DataFrame(
        {
            "rk": np.concatenate([np.arange(0, 30), np.arange(0, 10)]),
            "rv": np.arange(40, dtype=np.int64) * 10,
        }
    )
    out = hash_join(
        _ds(pa.Table.from_pandas(left)),
        _ds(pa.Table.from_pandas(right), parts=2),
        on="k",
        right_on="rk",
        right_values=["rv"],
        how=how,
        num_buckets=8,
    ).to_pandas()
    expected = left.merge(right.rename(columns={"rk": "k"}), how=how, on="k")
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )
    if how == "left":
        # unmatched right values must surface as nulls, not NaN-float rows
        assert out["rv"].isna().sum() == expected["rv"].isna().sum()


def test_hash_join_string_and_multi_key(ray_session):
    from polars_genson_ray.stages.join import hash_join

    rng = np.random.default_rng(5)
    left = pd.DataFrame(
        {
            "a": rng.choice(["u", "v", "w", "z"], size=120),
            "b": rng.integers(0, 5, size=120),
            "lv": np.arange(120),
        }
    )
    right = pd.DataFrame(
        {
            "a": ["u", "v", "w"] * 5,
            "b": np.tile(np.arange(5), 3),
            "rv": np.arange(15, dtype=np.float64),
        }
    )
    out = hash_join(
        _ds(pa.Table.from_pandas(left)),
        _ds(pa.Table.from_pandas(right), parts=2),
        on=["a", "b"],
        right_values=["rv"],
        num_buckets=4,
    ).to_pandas()
    expected = left.merge(right, how="inner", on=["a", "b"])
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )


def test_hash_join_rejects_colliding_value_columns(ray_session):
    from polars_genson_ray.stages.join import hash_join

    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="collide"):
        hash_join(
            _ds(t, 1), _ds(t, 1), on="k", right_values=["v"],
            left_schema=t.schema, right_schema=t.schema,
        )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(ray_session, how):
    from polars_genson_ray.stages.join import broadcast_join

    rng = np.random.default_rng(3)
    big = pd.DataFrame(
        {"k": rng.integers(0, 20, size=200), "v": rng.normal(size=200)}
    )
    dim = pd.DataFrame({"dk": np.arange(15), "name": [f"n{i}" for i in range(15)]})
    out = broadcast_join(
        _ds(pa.Table.from_pandas(big)),
        dim,
        on="k",
        right_on="dk",
        how=how,
    ).to_pandas()
    expected = big.merge(dim.rename(columns={"dk": "k"}), how=how, on="k")
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_hash_join_semi_anti_matches_pandas(ray_session, how):
    from polars_genson_ray.stages.join import hash_join

    rng = np.random.default_rng(23)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, size=400),
            "lv": rng.normal(size=400),
        }
    )
    # right with heavy key duplication (existence must not multiply rows)
    right = pd.DataFrame(
        {"rk": rng.integers(0, 25, size=600), "junk": rng.normal(size=600)}
    )
    out = hash_join(
        _ds(pa.Table.from_pandas(left)),
        _ds(pa.Table.from_pandas(right), parts=4),
        on="k",
        right_on="rk",
        how=how,
        num_buckets=8,
    ).to_pandas()
    hit = left.k.isin(set(right.rk))
    expected = left[hit] if how == "semi" else left[~hit]
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )
    # existence joins never duplicate left rows
    assert len(out) == len(expected)


def test_hash_join_semi_rejects_right_values(ray_session):
    from polars_genson_ray.stages.join import hash_join

    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="no right_values"):
        hash_join(
            _ds(t, 1), _ds(t, 1), on="k", right_values=["v"], how="semi",
            left_schema=t.schema, right_schema=t.schema,
        )
    with pytest.raises(ValueError, match="require right_values"):
        hash_join(
            _ds(t, 1), _ds(t, 1), on="k", how="inner",
            left_schema=t.schema, right_schema=t.schema,
        )


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_broadcast_join_semi_anti(ray_session, how):
    from polars_genson_ray.stages.join import broadcast_join

    rng = np.random.default_rng(7)
    big = pd.DataFrame(
        {"k": rng.integers(0, 30, size=300), "v": rng.normal(size=300)}
    )
    dim = pd.DataFrame({"dk": np.concatenate([np.arange(12), np.arange(6)])})
    out = broadcast_join(
        _ds(pa.Table.from_pandas(big)), dim, on="k", right_on="dk", how=how
    ).to_pandas()
    hit = big.k.isin(set(dim.dk))
    expected = big[hit] if how == "semi" else big[~hit]
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )
    assert list(out.columns) == list(big.columns)


def test_hash_join_outer_matches_pandas(ray_session):
    from polars_genson_ray.stages.join import hash_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, size=150), "lv": rng.normal(size=150)}
    )
    # right covers a shifted key range → unmatched rows on BOTH sides
    right = pd.DataFrame(
        {"rk": rng.integers(20, 60, size=120), "rv": rng.normal(size=120)}
    )
    out = hash_join(
        _ds(pa.Table.from_pandas(left)),
        _ds(pa.Table.from_pandas(right), parts=2),
        on="k",
        right_on="rk",
        right_values=["rv"],
        how="outer",
        num_buckets=8,
    ).to_pandas()
    expected = left.merge(
        right.rename(columns={"rk": "k"}), how="outer", on="k"
    )
    pd.testing.assert_frame_equal(
        _sorted(out), _sorted(expected), check_dtype=False
    )
    # right-only rows must surface with coalesced keys and null left payload
    right_only = set(right.rk) - set(left.k)
    assert right_only <= set(out.k)
    assert out.loc[out.k.isin(right_only), "lv"].isna().all()


def test_hash_join_normalizes_timestamp_unit_drift(ray_session):
    """pandas Timedelta arithmetic silently promotes timestamp[us] to
    [ns]; both sides must still hash identical logical keys to the same
    bucket (the tag stage casts to the declared schemas)."""
    import ray.data as rd

    from polars_genson_ray.stages.join import hash_join

    base = pd.Timestamp("2024-01-01")
    a = pd.DataFrame(
        {
            "day": [base + pd.Timedelta(days=d) for d in range(6)],
            "user_id": np.arange(6, dtype=np.int64),
        }
    )
    ps = pa.schema(
        [pa.field("day", pa.timestamp("us")), pa.field("user_id", pa.int64())]
    )
    A = rd.from_arrow(pa.Table.from_pandas(a, preserve_index=False).cast(ps))
    # shift through a PANDAS stage: the output blocks carry timestamp[ns]
    B = A.map_batches(
        lambda df: df.assign(day=df["day"] + pd.Timedelta(days=0)),
        batch_format="pandas",
    )
    assert str(B.schema().types[0]) == "timestamp[ns]"  # the hazard exists
    out = hash_join(
        A, B, on=["day", "user_id"], how="semi",
        left_schema=ps, right_schema=ps, num_buckets=8,
    ).to_pandas()
    assert len(out) == len(a)  # identical keys: every row must survive


def test_hash_join_fuzz_all_modes(ray_session):
    """Randomized differential: every join mode against pandas on mixed
    key dtypes (int, string, timestamp) with duplicate keys, partial
    overlap, and several partitionings."""
    import ray.data as rd

    from polars_genson_ray.stages.join import hash_join

    rng = np.random.default_rng(97)
    base = pd.Timestamp("2024-03-01")
    for trial in range(3):
        n_l, n_r = int(rng.integers(30, 300)), int(rng.integers(30, 300))
        left = pd.DataFrame(
            {
                "ki": rng.integers(0, 25, size=n_l),
                "ks": rng.choice(list("abcdefgh"), size=n_l),
                "kt": base
                + pd.to_timedelta(rng.integers(0, 5, size=n_l), unit="D"),
                "lv": rng.normal(size=n_l),
            }
        )
        right = pd.DataFrame(
            {
                "ki": rng.integers(10, 35, size=n_r),
                "ks": rng.choice(list("efghijkl"), size=n_r),
                "kt": base
                + pd.to_timedelta(rng.integers(0, 5, size=n_r), unit="D"),
                "rv": rng.normal(size=n_r),
            }
        )
        on = ["ki", "ks", "kt"][: int(rng.integers(1, 4))]
        A = _ds(pa.Table.from_pandas(left), parts=int(rng.integers(1, 5)))
        B = _ds(pa.Table.from_pandas(right), parts=int(rng.integers(1, 5)))
        for how in ("inner", "left", "outer", "semi", "anti"):
            rv = [] if how in ("semi", "anti") else ["rv"]
            out = hash_join(
                A, B, on=on, right_values=rv or None, how=how,
                num_buckets=int(2 ** rng.integers(2, 6)),
            ).to_pandas()
            if how in ("semi", "anti"):
                hit = left.merge(
                    right[on].drop_duplicates(), on=on, how="left",
                    indicator=True,
                )["_merge"].eq("both").to_numpy()
                expected = left[hit] if how == "semi" else left[~hit]
            else:
                expected = left.merge(
                    right[on + ["rv"]], how=how, on=on
                )
            pd.testing.assert_frame_equal(
                _sorted(out), _sorted(expected), check_dtype=False,
            )


def test_hash_join_keys_above_2_53_stay_exact(ray_session):
    """The unioned exchange nulls the other side's columns; a default
    pandas conversion would round int64 keys above 2^53 and let distinct
    keys spuriously match. Arrow-backed frames keep them exact."""
    import ray.data as rd

    from polars_genson_ray.stages.join import hash_join

    base = 2**60
    left = pd.DataFrame(
        {"k": np.array([base + 1, base + 2, base + 3], dtype=np.int64),
         "lv": [1.0, 2.0, 3.0]}
    )
    # base+1 and base+2 collapse to the same float64; only exact matching
    # keeps them apart
    right = pd.DataFrame(
        {"rk": np.array([base + 2], dtype=np.int64), "rv": [10.0]}
    )
    out = hash_join(
        _ds(pa.Table.from_pandas(left), 2),
        _ds(pa.Table.from_pandas(right), 1),
        on="k", right_on="rk", right_values=["rv"], how="inner",
        num_buckets=4,
    ).to_pandas()
    assert len(out) == 1
    assert int(out.k.iloc[0]) == base + 2


def test_hash_join_null_keys_never_match(ray_session):
    """SQL semantics: a null key matches nothing — not even another null.
    Null-key left rows survive left/outer/anti, vanish from inner/semi."""
    import ray.data as rd

    from polars_genson_ray.stages.join import hash_join

    left = pa.table(
        {"k": pa.array([1, None, 2, None], pa.int64()),
         "lv": pa.array([10, 20, 30, 40], pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([1, None], pa.int64()),
         "rv": pa.array([100, 200], pa.int64())}
    )
    for how, rv, expect in (
        ("inner", ["rv"], 1),   # only k=1 matches
        ("left", ["rv"], 4),    # all left rows survive
        ("semi", None, 1),
        ("anti", None, 3),      # k=2 and both null-key rows
        ("outer", ["rv"], 5),   # 4 left + unmatched null-key right row
    ):
        out = hash_join(
            _ds(left, 2), _ds(right, 1), on="k", right_on="rk",
            right_values=rv, how=how, num_buckets=4,
        ).to_pandas()
        assert len(out) == expect, (how, len(out))
        if how in ("inner", "left", "outer"):
            matched = out[out.rv.notna()]
            assert set(matched.k.dropna().astype("int64")) <= {1}


def test_broadcast_join_null_keys_never_match(ray_session):
    """ADVICE r2: a null in the broadcast key list must not pair with null
    big-side keys (pandas merge matches NaN==NaN) — semi keeps / anti drops
    null-key rows otherwise, inverting SQL EXISTS semantics."""
    import ray.data as rd

    from polars_genson_ray.stages.join import broadcast_join

    big = pa.table(
        {"k": pa.array([1, None, 2, None], pa.int64()),
         "lv": pa.array([10, 20, 30, 40], pa.int64())}
    )
    small = pa.table(
        {"rk": pa.array([1, None], pa.int64()),
         "rv": pa.array([100, 200], pa.int64())}
    )
    for how, rv, expect in (
        ("semi", None, 1),     # only k=1 EXISTS
        ("anti", None, 3),     # k=2 and both null-key rows NOT EXISTS
        ("inner", ["rv"], 1),
        ("left", ["rv"], 4),   # null-key rows survive with null rv
    ):
        out = broadcast_join(
            _ds(big, 2), small, on="k", right_on="rk",
            right_values=rv, how=how,
        ).to_pandas()
        assert len(out) == expect, (how, len(out))
        if how in ("inner", "left"):
            matched = out[out.rv.notna()]
            assert set(matched.k.dropna().astype("int64")) <= {1}
