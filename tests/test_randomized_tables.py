"""Randomized-table oracle differential: every SQL-oracled query replayed
against a PERTURBED copy of the testdata tables — bootstrap-resampled rows
(duplicate foreign keys, skew), re-assigned primary ids, planted hostile
documents (empty / whitespace-only / NBSP / single-word / duplicated
texts) and planted event ties (equal ts per user, equal values).

The sf0.001 oracle run (test_queries_oracle) validates the engine on the
benign generated distribution; this module validates the same contract on
data shaped to hit tie-breaks, empty groups, zero-dup corpora and
duplicate-key join fan-out. Same compare contract as the driver.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_queries_oracle import (  # noqa: E402
    _ORACLED_QUERIES,
    TABLES,
    _compare,
    _to_pandas,
)

SRC_DIR = os.environ.get("GRAFT_RAND_SRC", "/root/testdata/sf0.001")
# default one seed (CI time); GRAFT_RAND_SEED=<n> for other draws,
# GRAFT_RAND_SRC=/root/testdata/sf0.01 for a bigger-table sweep
SEED = int(os.environ.get("GRAFT_RAND_SEED", "1729"))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC_DIR), reason="testdata not available"
)


def _build_tables(out_dir: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(SRC_DIR, f"{t}.parquet"))
        n = len(tbl)
        k = max(20, n // 3)
        take = np.sort(rng.integers(0, n, size=k))
        df = tbl.take(pa.array(take)).to_pandas()
        # PRIMARY keys stay unique after resampling: dimension/PK tables
        # carry a uniqueness invariant the engine's broadcast-map join
        # plans (dict lookup per PK) legitimately rely on; the realistic
        # perturbation is duplicate FOREIGN keys + dangling references,
        # which the resample produces naturally (lineitem.l_orderkey,
        # orders.o_custkey, events.user_id...)
        _PK = {
            "region": "r_regionkey",
            "nation": "n_nationkey",
            "customer": "c_custkey",
            "supplier": "s_suppkey",
            "part": "p_partkey",
            "orders": "o_orderkey",
        }
        if t in _PK:
            pk = _PK[t]
            df[pk] = np.arange(len(df)).astype(df[pk].dtype)
        if t == "events":
            # unique ids (ROW_NUMBER ties on (value, id) must stay
            # deterministic) but planted ts/user/value ties
            df["event_id"] = np.arange(len(df)).astype(df["event_id"].dtype)
            if len(df) > 8:
                df.loc[1:3, "ts"] = df.loc[0, "ts"]
                df.loc[1:3, "user_id"] = df.loc[0, "user_id"]
                df.loc[4:7, "value"] = df.loc[4, "value"]
        elif t == "documents":
            df["doc_id"] = np.arange(len(df)).astype(df["doc_id"].dtype)
            specials = [
                "",
                "\t\n\f\r",
                "one two\xa0two three three",
                "word",
                "a b a b a b a b a b a b",
                # hostile whitespace classes (NOTES.md): VT is NOT in
                # DuckDB's RE2 \s; FS/GS/RS/US are str.split() whitespace
                # but not RE2 \s; ideographic/Unicode spaces are neither
                "alpha\x0bbeta gamma",
                "fs\x1cgs\x1drs\x1eus\x1f end",
                "wide　space line sep",
                # sub-word perturbation target for the char-span family:
                # long shared prefix, one codepoint flipped mid-word
                "the quick brown foxhound jumped over the lazy dogsbody kennel",
                "the quick brown foxhoünd jumped over the lazy dogsbody kennel",
            ]
            for i, s in enumerate(specials):
                if i < len(df):
                    df.loc[i, "text"] = s
            if len(df) > 10:
                # duplicated texts → exact-dup and span coverage paths
                df.loc[6:9, "text"] = df.loc[5, "text"]
            df["n_chars"] = df["text"].str.len().astype(df["n_chars"].dtype)
        elif t == "embeddings":
            df["vec_id"] = np.arange(len(df)).astype(df["vec_id"].dtype)
        out = pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False)
        pq.write_table(out, os.path.join(out_dir, f"{t}.parquet"))


@pytest.fixture(scope="session")
def rand_sf(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp(f"pgr_randsf_{SEED}"))
    _build_tables(out_dir, SEED)
    return out_dir


@pytest.fixture(scope="session")
def rand_duck(rand_sf):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(rand_sf, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


@pytest.fixture(scope="session")
def entry_module(ray_session):
    import __ray_entry__

    return __ray_entry__


@pytest.mark.parametrize("name", _ORACLED_QUERIES)
def test_query_matches_oracle_on_randomized_tables(
    entry_module, rand_sf, rand_duck, name
):
    qs = entry_module.queries()
    sql = entry_module.oracle_sql()[name]
    ray_df = _to_pandas(qs[name](rand_sf))
    oracle_df = rand_duck.execute(sql).fetchdf()
    _compare(ray_df, oracle_df, name)


# ---- round-4/5 families on resampled + hostile-Unicode tables ----------
# The parametrized oracle replay above covers every SQL-oracled query
# (including dup_spans_chars) at ONE seed; this sweep drives the char-span
# and PQ / IVF-PQ families across several seeds — resampling duplicates
# embedding rows byte-identically under fresh ids (exact ADC-distance
# ties) and the specials plant hostile whitespace + sub-word
# perturbations through the rolling-hash char windows.
_R4_SEEDS = [SEED + 101, SEED + 202, SEED + 303]


@pytest.mark.parametrize("seed", _R4_SEEDS)
def test_char_spans_and_pq_on_randomized_tables(
    entry_module, tmp_path_factory, seed
):
    import duckdb

    out_dir = str(tmp_path_factory.mktemp(f"pgr_randsf4_{seed}"))
    _build_tables(out_dir, seed)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs = entry_module.queries()
    # char-level dup spans: full oracle compare per seed
    for name in ("dup_spans_chars", "dup_spans"):
        sql = entry_module.oracle_sql()[name]
        _compare(
            _to_pandas(qs[name](out_dir)), con.execute(sql).fetchdf(), name
        )

    # PQ / IVF-PQ: approximate by construction (no SQL oracle), but must be
    # DETERMINISTIC under exact distance ties (duplicated embeddings) and
    # complete (k rows per query, finite distances)
    for name in ("ann_topk_pq", "ann_topk_ivfpq"):
        a = _to_pandas(qs[name](out_dir)).reset_index(drop=True)
        b = _to_pandas(qs[name](out_dir)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
        assert np.isfinite(a["adc_dist"].to_numpy(dtype=float)).all()
