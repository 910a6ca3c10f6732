"""Driver-mimic correctness harness: every ``queries()`` entry with an
``oracle_sql()`` entry is executed at sf0.001 and compared against DuckDB —
row count, schema (column names), and order-insensitive values — the same
contract the graft driver checks at sf0.01.

Rows-only entries are executed and checked for non-crash + stable schema.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# default sf0.001 for CI time; GRAFT_ORACLE_SF=/root/testdata/sf0.01 runs
# the same 71-query oracle compare one scale up (the driver-mimic covers
# the 50-entry window at sf0.01 — this covers the NON-window queries too)
SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata not available"
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


@pytest.fixture(scope="session")
def entry_module(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _to_pandas(result):
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
        if df.empty and len(df.columns) == 0:
            # Ray's to_pandas() concatenates zero blocks into a
            # columnless frame even when the Dataset schema IS known —
            # rebuild the typed empty frame so empty results compare
            # against the oracle's typed empty
            sch = result.schema()
            if sch is not None and sch.names:
                return pa.table(
                    {n: pa.array([], t)
                     for n, t in zip(sch.names, sch.types)}
                ).to_pandas()
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _compare(ray_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(ray_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(ray_df) == len(oracle_df), (
        f"{name}: row count {len(ray_df)} vs {len(oracle_df)}"
    )
    a, b = _canon(ray_df), _canon(oracle_df)
    for c in a.columns:
        col_a, col_b = a[c], b[c]
        if np.issubdtype(col_a.dtype, np.floating) or np.issubdtype(
            col_b.dtype, np.floating
        ):
            assert np.allclose(
                col_a.astype(float), col_b.astype(float), rtol=0, atol=1e-9, equal_nan=True
            ), f"{name}: float column {c} differs"
        else:
            pd.testing.assert_series_equal(
                col_a, col_b, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )


def _oracle_pairs(entry_module):
    qs = entry_module.queries()
    oracles = entry_module.oracle_sql()
    return sorted(oracles), qs, oracles


def test_oracle_keys_subset_of_queries(entry_module):
    qs = entry_module.queries()
    for key in entry_module.oracle_sql():
        assert key in qs, f"oracle_sql key {key} missing from queries()"


# The flagship parity surface: rows-only under the driver (outputs not
# SQL-expressible) but deliberately kept INSIDE the 50-entry window so
# external verification exercises the schema-inference core and the
# validation pipeline (round-3 advice), not just known-passing SQL checks.
_WINDOW_ROWS_ONLY = {
    "schema_infer_events_props",
    "schema_infer_props_by_type",
    "avro_schema_events_props",
    "normalise_events_props",
    "validation_image_table",
}


def test_driver_window_composition(entry_module):
    """The graft driver checks only the first 50 queries() entries — every
    one of those slots must either carry a SQL oracle or be one of the
    flagship rows-only entries listed above (see COVERAGE.md
    'Driver-window policy')."""
    qs = list(entry_module.queries())
    oracles = entry_module.oracle_sql()
    missing = [
        q for q in qs[:50] if q not in oracles and q not in _WINDOW_ROWS_ONLY
    ]
    assert not missing, f"unexpected un-oracled queries in the window: {missing}"
    inside = set(qs[:50])
    absent = _WINDOW_ROWS_ONLY - inside
    assert not absent, f"flagship entries fell out of the driver window: {absent}"


def test_every_query_covered_by_a_harness_list(entry_module):
    """Completeness guard: each queries() entry must appear in exactly one
    of the two parametrize lists below — a new query can't silently skip
    the in-repo harness."""
    qs = set(entry_module.queries())
    listed = set(_ORACLED_QUERIES) | set(_ROWS_ONLY_QUERIES)
    assert not set(_ORACLED_QUERIES) & set(_ROWS_ONLY_QUERIES)
    assert qs == listed, (
        f"unlisted: {sorted(qs - listed)}; stale: {sorted(listed - qs)}"
    )


_ORACLED_QUERIES = [
        "pricing_summary",
        "doc_lang_counts",
        "distinct_users",
        "quantity_quantiles",
        "price_quantiles_exact",
        "part_pruned_filter",
        "top_events",
        "union_ids",
        "duplicate_user_events",
        "referential_orphans",
        "nation_revenue",
        "customer_order_join",
        "sessions",
        "json_extract_props",
        "decode_props_typed",
        "token_counts",
        "doc_quality",
        "exact_dedup_docs",
        "ann_topk",
        "dup_spans_chars",
        "event_windows_hourly",
        "event_windows_sliding",
        "jaccard_neardup_docs",
        "neardup_clusters",
        "pii_redact",
        "shuffle_shards",
        "curation_filter",
        "source_mix",
        "sample_events",
        "events_asof_orders",
        "top_events_per_type",
        "quantity_tier_revenue",
        "stratified_sample_events",
        "quantity_stats_by_flag",
        "events_hour_pivot",
        "shipping_priority",
        "doc_repetition",
        "decontaminate_docs",
        "doc_fingerprints",
        "boilerplate_ngrams",
        "doc_logprob",
        "order_priority_check",
        "parts_never_bulk_ordered",
        "customer_order_counts",
        "users_per_event_type",
        "user_event_gaps",
        "user_running_value",
        "user_rolling_hour",
        "user_customer_presence",
        "upsample_sources",
        "event_value_percentiles",
        "chunk_documents",
        "common_user_ids",
        "salted_user_counts",
        "events_value_range_partition",
        "events_from_ndjson",
        "orders_from_orc",
        "returned_items_report",
        "events_union_by_name",
        "lineitem_unpivot",
        "hourly_active_users",
        "cumulative_new_users",
        "day_retention",
        "weekly_cohorts",
        "simhash_docs",
        "dup_spans",
        "bm25_docs",
        "value_outliers",
        "lineitem_from_csv",
        "local_supplier_revenue",
        "event_row_numbers",
]


@pytest.mark.parametrize("name", _ORACLED_QUERIES)
def test_query_matches_oracle(entry_module, duck, name):
    qs = entry_module.queries()
    sql = entry_module.oracle_sql()[name]
    ray_df = _to_pandas(qs[name](SF_DIR))
    oracle_df = duck.execute(sql).fetchdf()
    _compare(ray_df, oracle_df, name)


_ROWS_ONLY_QUERIES = [
        "schema_infer_events_props",
        "schema_infer_props_by_type",
        "avro_schema_events_props",
        "normalise_events_props",
        "langid_docs",
        "pack_documents",
        "heavy_hitter_tokens",
        "minhash_neardup_docs",
        "embedding_neardup",
        "embedding_kmeans",
        "semantic_dedup",
        "training_data_prep",
        "audio_features",
        "video_frames",
        "image_formats_real",
        "phash_neardup_images",
        "events_value_drift",
        "bloom_decontam",
        "ann_topk_ivf",
        "ann_topk_ivf_indexed",
        "ann_topk_pq",
        "ann_topk_ivfpq",
        "image_features",
        "image_resize",
        "aspect_buckets",
        "validation_image_table",
        "validation_violations",
]


@pytest.mark.parametrize("name", _ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(entry_module, name):
    qs = entry_module.queries()
    df = _to_pandas(qs[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke(entry_module):
    df = _to_pandas(entry_module.entry())
    assert len(df) >= 0
    assert len(df.columns) > 0
