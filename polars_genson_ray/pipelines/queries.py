"""Driver-contract query library: each function takes ``sf_dir`` and returns
a Dataset / pandas DataFrame / pyarrow Table.

Every function here is an operator demonstration from SURVEY.md §2 or a
training-data-pipeline extension op; ``__ray_entry__.oracle_sql`` carries the
DuckDB-equivalent SQL for the SQL-expressible ones (column names match
exactly — the driver hashes values under sorted column names).

Scale idioms used throughout: column pruning at the read, per-batch
pre-aggregation before every groupby, broadcast small sides via ``ray.put``,
sketch partials instead of row shuffles, per-batch top-k before global top-k.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..api import normalise_rows
from ..functions.context import default_pool_size
from ..stages.aggregate import combine_partials
from ..core import SchemaInferenceConfig
from ..stages.dedup import SimHasher, exact_dedup, minhash_lsh_pairs
from ..stages.infer import infer_schema_distributed
from ..stages.similarity import brute_force_topk, embedding_near_duplicates
from ..stages.text import Fingerprinter, LangId, QualityScorer, TokenCounter
from ..stages.windows import session_windows, tumbling_window


def _t(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _table_rows(sf_dir: str, table: str) -> int | None:
    """Row count from parquet footer metadata (no data read) — sizes
    data-scaled shuffle bucket counts without executing the pipeline."""
    try:
        return pq.ParquetFile(_t(sf_dir, table)).metadata.num_rows
    except Exception:
        return None


def _footer_schema(sf_dir: str, table: str, cols: list[str]) -> "pa.Schema":
    """Projected Arrow schema straight from the parquet footer — lets join
    operators skip the limit-1 schema probe Dataset.schema() would run."""
    s = pq.read_schema(_t(sf_dir, table))
    return pa.schema([s.field(c) for c in cols])


def _read(sf_dir: str, table: str, columns=None):
    from ..functions.context import (
        maybe_reshard,
        read_parallelism,
        strip_schema_metadata,
        tune_for_cluster,
    )

    tune_for_cluster()
    # single-row-group files serialize the scan (one read task); large ones
    # are resharded once into a cached parallel-readable copy (no-op for
    # real multi-fragment inputs)
    path = maybe_reshard(_t(sf_dir, table))
    ds = rd.read_parquet(path, columns=columns)
    ds = ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    if os.path.isfile(path):
        # small single file: split the one block so downstream stages still
        # parallelize; resharded/multi-fragment paths skip this
        n_blocks = read_parallelism(path)
        if n_blocks > 1:
            ds = ds.repartition(n_blocks)
    return ds


# ---------------------------------------------------------------------------
# Aggregations (partial-per-batch → small groupby)
# ---------------------------------------------------------------------------

def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary over lineitem.

    Money/quantity aggregates run in EXACT integer units (cents /
    hundredths-of-cents for price×(1−discount)) and emit the exact
    integer÷scale quotient: a ROUND(float_sum, 2) on both sides can
    straddle a rounding cliff when the two engines' float sums differ by
    an ulp around x.xx5 (found by the randomized-tables differential on
    shipping_priority); identical integers divide to identical doubles.

    int64 headroom: hundredths-of-cents saturate at ~9.2e18 = **$9.2e14
    per GROUP** (≈10× world GDP) — beyond any physical revenue, so no
    overflow guard; rescale the unit if a use case ever approaches it."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df.l_extendedprice.to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df.l_discount.to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({
            "l_returnflag": df.l_returnflag.to_numpy(),
            "l_linestatus": df.l_linestatus.to_numpy(),
            "qty_i": np.rint(df.l_quantity.to_numpy()).astype(np.int64),
            "base_i": cents,
            "disc_i": cents * (100 - dpct),
        })
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            qty_i=("qty_i", "sum"),
            base_i=("base_i", "sum"),
            disc_i=("disc_i", "sum"),
            count_order=("qty_i", "size"),
        )

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        {
            "qty_i": "sum",
            "base_i": "sum",
            "disc_i": "sum",
            "count_order": "sum",
        },
    ).to_pandas()
    out["sum_qty"] = out.pop("qty_i").astype(np.float64)
    out["sum_base_price"] = out.pop("base_i") / 100.0
    out["sum_disc_price"] = out.pop("disc_i") / 10000.0
    return out[["l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price", "sum_disc_price", "count_order"]]


def q_doc_lang_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("lang", as_index=False).agg(n=("lang", "size"))

    return combine_partials(
        ds.map_batches(partial, batch_format="pandas"), ["lang"], {"n": "sum"}
    )


def q_distinct_users(sf_dir: str):
    """Exact global COUNT(DISTINCT): per-batch dedup → bucketed distinct
    (whole ids per bucket) → one tiny per-bucket count row each.
    (``Dataset.groupby().count()`` computes the same thing but pays
    per-distinct-key Python overhead in its sort exchange — measured
    6.5 s at sf0.1 for this 4-line shape's 0.6 s.)"""
    from ..stages.aggregate import bucketed_groups

    ds = _read(sf_dir, "events", ["user_id"])
    ids = ds.map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    counts = bucketed_groups(
        ids,
        ["user_id"],
        lambda df: pd.DataFrame({"n": [df["user_id"].nunique()]}),
        approx_rows=_table_rows(sf_dir, "events"),
    ).to_pandas()
    return pd.DataFrame({"n_distinct": [int(counts["n"].sum())]})


def q_quantity_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9),
                         max_distinct: int = 1_000_000):
    """Exact PERCENTILE_DISC via distributed value counts — ONLY correct
    for bounded-cardinality columns (l_quantity has 50 distinct values).
    The distinct-value counts land on the driver, so a continuous column
    would materialize every distinct value there: guarded by
    ``max_distinct``; continuous columns belong on the t-digest sketch
    path (stages/sketches.TDigest, used by the validation stats pass)."""
    counts = combine_partials(
        _read(sf_dir, "lineitem", ["l_quantity"]).map_batches(
            lambda df: df.groupby("l_quantity", as_index=False).agg(
                __n=("l_quantity", "size")
            ),
            batch_format="pandas",
        ),
        ["l_quantity"],
        {"__n": "sum"},
    ).to_pandas()
    if len(counts) > max_distinct:
        raise ValueError(
            f"q_quantity_quantiles: > {max_distinct} distinct values — "
            "use the t-digest quantile path for continuous columns"
        )
    vals = sorted(zip(counts["l_quantity"], counts["__n"]))
    total = sum(c for _, c in vals)
    out_q, out_v = [], []
    for q in qs:
        target = q * total
        cum = 0
        for v, c in vals:
            cum += c
            if cum >= target:
                out_q.append(q)
                out_v.append(v)
                break
    return pd.DataFrame({"q": out_q, "value": out_v})


# ---------------------------------------------------------------------------
# Constraint checks
# ---------------------------------------------------------------------------

def q_price_quantiles_exact(sf_dir: str):
    """EXACT quantiles of a CONTINUOUS column (~n distinct values — the
    case the distinct-value-counts path refuses): sketch-guided selection
    (``stages/aggregate.exact_quantile_continuous``) — a t-digest pass
    brackets each rank, a counting pass collects only the ~4% of rows
    inside the brackets, and the exact rank resolves driver-side."""
    from ..stages.aggregate import exact_quantile_continuous

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return exact_quantile_continuous(
        ds, "l_extendedprice", qs=(0.25, 0.5, 0.9)
    )


def q_duplicate_user_events(sf_dir: str):
    """Uniqueness-violation listing: keys with count > 1."""
    ds = _read(sf_dir, "events", ["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(cnt=("user_id", "size"))

    # user_id cardinality scales with the data → large-cardinality combine
    # (hash-partitioned groupby), not the single-task path
    grouped = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"cnt": "sum"},
        small=False,
    )
    return grouped.map_batches(
        lambda df: df[df.cnt > 1], batch_format="pandas"
    )


def q_referential_orphans(sf_dir: str):
    """Referential check via broadcast key set (semi/anti-join pattern)."""
    keys = frozenset(
        pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey"])["c_custkey"]
        .to_pylist()
    )
    keys_ref = ray.put(keys)
    ds = _read(sf_dir, "events", ["user_id"])

    def orphan_filter(df: pd.DataFrame) -> pd.DataFrame:
        # broadcast key set: one shared-memory ray.get per task
        orphans = df[~df.user_id.isin(ray.get(keys_ref))]
        return orphans.groupby("user_id", as_index=False).agg(n=("user_id", "size"))

    # orphan set is small by construction (violations) → single-task combine
    out = combine_partials(
        ds.map_batches(orphan_filter, batch_format="pandas"),
        ["user_id"],
        {"n": "sum"},
    ).to_pandas()
    # stable schema even when there are no orphans
    return out.reindex(columns=["user_id", "n"])


# ---------------------------------------------------------------------------
# Joins (broadcast small side)
# ---------------------------------------------------------------------------

def q_nation_revenue(sf_dir: str):
    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust_map = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    nation_map = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )
    lookup_ref = ray.put((cust_map, nation_map))

    def add_nation(df: pd.DataFrame) -> pd.DataFrame:
        # broadcast lookup maps: shared-memory ray.get per task (an actor
        # pool here paid ~2 s of spawn for <1 s of useful work)
        cust_map, nation_map = ray.get(lookup_ref)
        nk = df.o_custkey.map(cust_map)
        df = df.assign(
            nation=nk.map(nation_map),
            rev_i=np.rint(df.o_totalprice.to_numpy() * 100).astype(np.int64),
        )
        return df.groupby("nation", as_index=False).agg(
            n_orders=("o_orderkey", "size"), rev_i=("rev_i", "sum")
        )

    out = combine_partials(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(add_nation, batch_format="pandas"),
        ["nation"],
        {"n_orders": "sum", "rev_i": "sum"},
    ).to_pandas()
    # exact cents quotient (the engine-wide money convention — see
    # q_pricing_summary): identical integers divide to identical doubles
    out["revenue"] = out.pop("rev_i") / 100.0
    return out


def q_returned_items_report(sf_dir: str, k: int = 20):
    """TPC-H-Q10 shape: top-k customers by revenue lost to returned items
    in one quarter. Distribution plan: lineitem (largest) filters
    ``l_returnflag='R'`` and pre-aggregates exact integer revenue per
    orderkey INSIDE the scan; orders filters the date window in-scan; the
    two join through the co-partitioned ``hash_join``; per-customer totals
    reduce via bucketed groups; the global top-k is per-batch partials +
    one tiny merge (never an all-to-all sort); only the FINAL k customer
    rows are looked up — a k-row parquet read, not a broadcast of the
    customer table."""
    from ..stages.aggregate import bucketed_groups
    from ..stages.join import hash_join

    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1996-04-01")

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.l_returnflag == "R"]
        if df.empty:
            return pd.DataFrame({
                "l_orderkey": pd.Series([], dtype=np.int64),
                "rev_i": pd.Series([], dtype=np.int64),
            })
        cents = np.rint(df.l_extendedprice.to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df.l_discount.to_numpy() * 100).astype(np.int64)
        out = df[["l_orderkey"]].copy()
        # exact hundredths-of-cents (engine-wide money convention)
        out["rev_i"] = cents * (100 - dpct)
        return out.groupby("l_orderkey", as_index=False).agg(
            rev_i=("rev_i", "sum")
        )

    def orders_window(df: pd.DataFrame) -> pd.DataFrame:
        ts = df.o_orderdate.to_numpy()
        return df.loc[(ts >= lo) & (ts < hi), ["o_orderkey", "o_custkey"]]

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(line_partial, batch_format="pandas")
    ords = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_window, batch_format="pandas")

    line_schema = pa.schema(
        [pa.field("l_orderkey", pa.int64()), pa.field("rev_i", pa.int64())]
    )
    ords_schema = pa.schema(
        [pa.field("o_orderkey", pa.int64()), pa.field("o_custkey", pa.int64())]
    )
    joined = hash_join(
        line, ords, on="l_orderkey", right_on="o_orderkey",
        right_values=["o_custkey"], how="inner",
        left_schema=line_schema, right_schema=ords_schema,
        approx_rows=_table_rows(sf_dir, "lineitem"),
    )

    per_cust = bucketed_groups(
        joined.map_batches(
            lambda df: df.groupby("o_custkey", as_index=False).agg(
                rev_i=("rev_i", "sum")
            ),
            batch_format="pandas",
        ),
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False).agg(
            rev_i=("rev_i", "sum")
        ),
        approx_rows=_table_rows(sf_dir, "customer"),
    )

    # customer + nation eligibility must attach BEFORE the top-k: the
    # report's LIMIT runs AFTER the inner joins, so a top-revenue custkey
    # with a dangling customer/nation FK must not occupy a slot (found by
    # the randomized-tables harness at seed 777 — top-k-then-lookup kept
    # dangling customers and could not backfill the dropped ranks).
    # customer joins co-partitioned (it is data-scaled); nation is a
    # 25-row broadcast map.
    nation = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    )
    nk_name = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))
    nk_ref = ray.put(nk_name)
    percust_schema = pa.schema(
        [pa.field("o_custkey", pa.int64()), pa.field("rev_i", pa.int64())]
    )
    cust_schema = _footer_schema(
        sf_dir, "customer",
        ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    labeled = hash_join(
        per_cust,
        _read(sf_dir, "customer",
              ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
        on="o_custkey", right_on="c_custkey",
        right_values=["c_name", "c_acctbal", "c_nationkey"], how="inner",
        left_schema=percust_schema, right_schema=cust_schema,
        approx_rows=_table_rows(sf_dir, "customer"),
    )

    def attach_nation(df: pd.DataFrame) -> pd.DataFrame:
        nm = df.c_nationkey.map(ray.get(nk_ref))
        keep = nm.notna()
        out = df.loc[keep].copy()
        out["n_name"] = nm[keep]
        return out.drop(columns="c_nationkey")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["rev_i", "o_custkey"], ascending=[False, True]
        ).head(k)

    top = (
        labeled.map_batches(attach_nation, batch_format="pandas")
        .map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(local_topk, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    top["revenue"] = top.pop("rev_i") / 10000.0
    top = top.rename(columns={"o_custkey": "c_custkey"}).sort_values(
        ["revenue", "c_custkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return top[["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]]


def q_local_supplier_revenue(sf_dir: str, region: str = "ASIA"):
    """TPC-H-Q5 shape — the 6-table composition: revenue by nation for
    orders whose customer and line-supplier sit in the SAME nation of one
    region. Distribution plan: region→nation→supplier collapse to tiny
    broadcast maps (suppliers are ~1e4×SF — dimension-sized); customer
    (large) joins orders (large) through the co-partitioned
    ``hash_join``; lineitem (largest) never shuffles — its supplier
    nation attaches map-side and the same-nation filter + partial
    aggregate run inside the scan, so only (orderkey, nation partials)
    reach the final join exchange."""
    from ..stages.join import hash_join

    nation = pq.read_table(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region_tbl = pq.read_table(_t(sf_dir, "region"),
                               columns=["r_regionkey", "r_name"])
    rkeys = {
        k for k, nm in zip(region_tbl["r_regionkey"].to_pylist(),
                           region_tbl["r_name"].to_pylist())
        if nm == region
    }
    nk_name = {
        k: nm
        for k, nm, rk in zip(nation["n_nationkey"].to_pylist(),
                             nation["n_name"].to_pylist(),
                             nation["n_regionkey"].to_pylist())
        if rk in rkeys
    }
    supp = pq.read_table(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    supp_nk = {
        s: nk
        for s, nk in zip(supp["s_suppkey"].to_pylist(),
                         supp["s_nationkey"].to_pylist())
        if nk in nk_name
    }
    lookup_ref = ray.put((supp_nk, nk_name))

    # large×large: customer nationkey rides through orders via hash_join
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def cust_in_region(df: pd.DataFrame) -> pd.DataFrame:
        _, nkn = ray.get(lookup_ref)
        return df[df.c_nationkey.isin(nkn)]

    # footer schemas declared explicitly: each omitted side schema costs a
    # limit-1 probe that EXECUTES the upstream read+map (~0.5 s per probe,
    # re-paid EVERY pass — 4 probes roughly doubled this query's bench
    # time: 3.7-4.2 s → 2.0 s warm once declared). One footer read per
    # table; both joins derive from these.
    orders_schema = _footer_schema(sf_dir, "orders",
                                   ["o_orderkey", "o_custkey"])
    cust_schema = _footer_schema(sf_dir, "customer",
                                 ["c_custkey", "c_nationkey"])
    ords = hash_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        cust.map_batches(cust_in_region, batch_format="pandas"),
        on="o_custkey", right_on="c_custkey",
        right_values=["c_nationkey"], how="inner",
        left_schema=orders_schema,
        right_schema=cust_schema,
    ).select_columns(["o_orderkey", "c_nationkey"])

    # lineitem: supplier nation attaches map-side; pre-aggregate per
    # (orderkey, nationkey) before the join exchange
    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        snk, _ = ray.get(lookup_ref)
        nk = df.l_suppkey.map(snk)
        keep = nk.notna()
        out = df.loc[keep, ["l_orderkey"]].copy()
        out["s_nationkey"] = nk[keep].astype(np.int64)
        cents = np.rint(
            df.loc[keep, "l_extendedprice"].to_numpy() * 100
        ).astype(np.int64)
        dpct = np.rint(
            df.loc[keep, "l_discount"].to_numpy() * 100
        ).astype(np.int64)
        # exact hundredths-of-cents (engine-wide money convention)
        out["rev_i"] = cents * (100 - dpct)
        return out.groupby(["l_orderkey", "s_nationkey"], as_index=False).agg(
            rev_i=("rev_i", "sum")
        )

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")

    joined = hash_join(
        line, ords, on="l_orderkey", right_on="o_orderkey",
        right_values=["c_nationkey"], how="inner",
        left_schema=pa.schema([
            ("l_orderkey", pa.int64()),
            ("s_nationkey", pa.int64()),
            ("rev_i", pa.int64()),
        ]),
        right_schema=pa.schema([
            orders_schema.field("o_orderkey"),
            cust_schema.field("c_nationkey"),
        ]),
    )

    def same_nation(df: pd.DataFrame) -> pd.DataFrame:
        _, nkn = ray.get(lookup_ref)
        df = df[df.s_nationkey == df.c_nationkey]
        out = df.assign(n_name=df.s_nationkey.map(nkn))
        return out.groupby("n_name", as_index=False).agg(rev_i=("rev_i", "sum"))

    from ..stages.aggregate import collect_typed

    # collect_typed: a region with no customers/suppliers legitimately
    # yields an empty combine, where Ray loses the block schema
    out = collect_typed(
        combine_partials(
            joined.map_batches(same_nation, batch_format="pandas"),
            ["n_name"],
            {"rev_i": "sum"},
        ),
        {"n_name": object, "rev_i": np.int64},
    )
    # exact hundredths-of-cents quotient (engine-wide money convention)
    out["revenue"] = out.pop("rev_i") / 10000.0
    return out


def q_customer_order_join(sf_dir: str):
    """Large×large hash join via the engine's co-partitioned
    ``stages.join.hash_join`` (one narrow exchange per side, per-bucket
    vectorized merge; contrast with the broadcast path in q_nation_revenue,
    which is the right choice when one side fits in memory). Ray's built-in
    ``Dataset.join`` computes the same thing but rides the hash-shuffle
    exchange that measures ~15× slower here (see stages/join.py)."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    joined = hash_join(
        orders,
        cust,
        on="o_custkey",
        right_on="c_custkey",
        right_values=["c_name"],
        left_schema=_footer_schema(sf_dir, "orders",
                                   ["o_orderkey", "o_custkey", "o_totalprice"]),
        right_schema=_footer_schema(sf_dir, "customer", ["c_custkey", "c_name"]),
    )
    return joined.select_columns(["o_orderkey", "o_totalprice", "c_name"])


def q_order_priority_check(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS: orders per priority having ≥1 returned
    lineitem. Distributed semi join (``stages/join.hash_join`` with
    ``how="semi"``): the lineitem side ships ONLY distinct l_orderkey
    values (per-batch pre-dedup before the exchange), never its payload,
    and the per-priority rollup is a per-batch partial + tiny combine."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    returned = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lambda t: t.filter(
            pa.compute.equal(t["l_returnflag"], "R")
        ).select(["l_orderkey"]),
        batch_format="pyarrow",
    )
    hit = hash_join(
        orders,
        returned,
        on="o_orderkey",
        right_on="l_orderkey",
        how="semi",
        approx_rows=_table_rows(sf_dir, "orders"),
        left_schema=_footer_schema(
            sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
        ),
        right_schema=_footer_schema(sf_dir, "lineitem", ["l_orderkey"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("o_orderkey", "size")
        )

    return combine_partials(
        hit.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        {"n_orders": "sum"},
    )


def q_parts_never_bulk_ordered(sf_dir: str):
    """NOT EXISTS via the distributed anti join: parts with no bulk
    (quantity ≥ 48) lineitem. Same exchange as the semi join — only
    distinct l_partkey values of the filtered right side travel."""
    from ..stages.join import hash_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    bulk = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["l_quantity"], 48)
        ).select(["l_partkey"]),
        batch_format="pyarrow",
    )
    out = hash_join(
        part,
        bulk,
        on="p_partkey",
        right_on="l_partkey",
        how="anti",
        approx_rows=_table_rows(sf_dir, "part"),
        left_schema=_footer_schema(sf_dir, "part", ["p_partkey", "p_name"]),
        right_schema=_footer_schema(sf_dir, "lineitem", ["l_partkey"]),
    )
    return out


def q_customer_order_counts(sf_dir: str):
    """TPC-H-Q13-shaped distribution of per-customer order counts,
    INCLUDING zero-order customers (left join). The orders side enters the
    join as per-batch partial counts and ``right_agg`` finishes the
    per-customer sum inside the join's bucket — the keyed aggregate rides
    the join exchange instead of paying its own (aggregate-join fusion)."""
    from ..stages.join import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def order_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            c_count=("o_custkey", "size")
        )

    counts = orders.map_batches(order_partial, batch_format="pandas")
    joined = hash_join(
        cust,
        counts,
        on="c_custkey",
        right_on="o_custkey",
        right_values=["c_count"],
        how="left",
        right_agg={"c_count": "sum"},
        approx_rows=_table_rows(sf_dir, "customer"),
        left_schema=_footer_schema(sf_dir, "customer", ["c_custkey"]),
        right_schema=pa.schema(
            [pa.field("o_custkey", pa.int64()), pa.field("c_count", pa.int64())]
        ),
    )

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(c_count=df.c_count.fillna(0).astype("int64"))
        return df.groupby("c_count", as_index=False).agg(
            custdist=("c_custkey", "size")
        )

    return combine_partials(
        joined.map_batches(dist_partial, batch_format="pandas"),
        ["c_count"],
        {"custdist": "sum"},
    )


def q_event_value_percentiles(sf_dir: str, max_distinct: int = 1_000_000):
    """Global PERCENT_RANK per row WITHOUT a global sort: distributed
    distinct-value counts (bounded — the 2-dp currency grid; guarded like
    ``q_quantity_quantiles``) → one tiny task builds the exclusive-rank
    CDF → the CDF is broadcast and every batch does a searchsorted lookup.
    Rank arithmetic is integer, the final ``rank_below / (n−1)`` is a
    single double division — bit-identical to SQL PERCENT_RANK. Continuous
    columns belong on the t-digest sketch (approximate) path."""
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("value", as_index=False).agg(n=("value", "size"))

    counts = combine_partials(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["value"],
        {"n": "sum"},
    ).to_pandas()
    if len(counts) > max_distinct:
        raise ValueError(
            f"q_event_value_percentiles: > {max_distinct} distinct values "
            "— use the t-digest path for continuous columns"
        )
    counts = counts.sort_values("value")
    vals = counts["value"].to_numpy(dtype=np.float64)
    n = int(counts["n"].sum())
    rank_below = np.concatenate(
        [[0], np.cumsum(counts["n"].to_numpy(dtype=np.int64))[:-1]]
    )
    cdf_ref = ray.put((vals, rank_below, n))

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        v, rb, total = ray.get(cdf_ref)
        x = df["value"].to_numpy(dtype=np.float64)
        # nulls never enter the CDF (groupby drops them): propagate NaN
        # instead of indexing past the rank table; single-row inputs get
        # rank 0 (SQL PERCENT_RANK convention), not a 0/0
        ok = ~np.isnan(x)
        pct = np.full(len(x), np.nan)
        denom = max(total - 1, 1)
        pct[ok] = rb[np.searchsorted(v, x[ok])] / denom
        return df.assign(pct_rank=pct)

    return ds.map_batches(attach, batch_format="pandas")


def q_user_customer_presence(sf_dir: str):
    """FULL OUTER join (``hash_join(how="outer")``): reconcile two keyed
    sets — per-user event counts vs the customer table — keeping unmatched
    rows from BOTH sides with coalesced keys. Nulls are filled with
    sentinels (0 events / −1 balance) so downstream consumers and the SQL
    oracle see a null-free, hashable frame."""
    from ..stages.join import hash_join

    events = _read(sf_dir, "events", ["user_id"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            n_events=("user_id", "size")
        )

    counts = combine_partials(
        events.map_batches(count_partial, batch_format="pandas"),
        ["user_id"],
        {"n_events": "sum"},
        small=False,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    joined = hash_join(
        counts,
        cust,
        on="user_id",
        right_on="c_custkey",
        right_values=["c_acctbal"],
        how="outer",
        approx_rows=_table_rows(sf_dir, "customer"),
        left_schema=pa.schema(
            [pa.field("user_id", pa.int64()), pa.field("n_events", pa.int64())]
        ),
        right_schema=_footer_schema(
            sf_dir, "customer", ["c_custkey", "c_acctbal"]
        ),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            n_events=df.n_events.fillna(0).astype("int64"),
            c_acctbal=df.c_acctbal.fillna(-1.0),
        )

    return joined.map_batches(fill, batch_format="pandas")


def q_upsample_sources(sf_dir: str):
    """Weighted replication side of data mixing: sources with weight > 1
    are deterministically upsampled (``stages/mix.hash_mix_upsample``) —
    floor(w) copies plus one more iff the row's md5 unit < frac(w); the
    0-based ``rep`` index keeps copies distinct for downstream shuffles."""
    from ..stages.mix import hash_mix_upsample

    weights = {
        f"src{i}": (2.5, 0.5, 1.0, 3.25)[i % 4] for i in range(20)
    }
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return hash_mix_upsample(
        ds, weights, id_column="doc_id", source_column="source"
    )


def q_users_per_event_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (``stages/aggregate.grouped_distinct_count``: only distinct pairs
    cross the exchange — the approximate companion is the HLL sketch
    path, which needs no exchange at all)."""
    from ..stages.aggregate import grouped_distinct_count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_distinct_count(
        ds, ["event_type"], "user_id",
        approx_rows=_table_rows(sf_dir, "events"), out_column="n_users",
    )


def q_user_event_gaps(sf_dir: str):
    """Per-user inter-arrival stats (the LAG window, reduced): bucketed
    exact decomposition in ``stages/windows.keyed_gap_stats``."""
    from ..stages.windows import keyed_gap_stats

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return keyed_gap_stats(ds, "ts", "user_id")


def q_user_running_value(sf_dir: str):
    """Per-user ordered running total (the window SCAN) in integer cents —
    two-pass distributed prefix sum (``stages/windows.keyed_running_total``);
    integer values make the cumulative sums association-order exact."""
    from ..stages.windows import keyed_running_total

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    cents = ds.map_batches(
        lambda df: df.assign(
            value_cents=np.rint(df.value * 100).astype("int64")
        ).drop(columns="value"),
        batch_format="pandas",
    )
    out = keyed_running_total(
        cents,
        "user_id",
        "ts",
        "event_id",
        "value_cents",
        out_column="running_cents",
    )
    return out.select_columns(["event_id", "user_id", "running_cents"])


def q_user_rolling_hour(sf_dir: str):
    """Per-user 1-hour rolling sum/count (the RANGE-frame window) —
    bucket-edge context replication keeps it exact without any task
    holding a user's history (``stages/windows.keyed_time_rolling``)."""
    from ..stages.windows import keyed_time_rolling

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    cents = ds.map_batches(
        lambda df: df.assign(
            value_cents=np.rint(df.value * 100).astype("int64")
        ).drop(columns="value"),
        batch_format="pandas",
    )
    out = keyed_time_rolling(
        cents, "user_id", "ts", "value_cents", window="1h", out_prefix="roll"
    )
    return out.select_columns(["event_id", "user_id", "roll_sum", "roll_n"])


# ---------------------------------------------------------------------------
# Scans / filters / top-k
# ---------------------------------------------------------------------------

def q_part_pruned_filter(sf_dir: str):
    """Column-pruned, predicate-pushdown read."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_name", "p_size"],
        filter=(pc.field("p_size") > 40),
    )
    return ds


def q_union_ids(sf_dir: str):
    """Set op: UNION ALL of two id streams (``Dataset.union`` concatenates
    block lists — no shuffle, no materialization)."""
    def _as_id(batch: pa.Table) -> pa.Table:
        return pa.table({"id": pa.compute.cast(batch.column(0), pa.int64())})

    ev = _read(sf_dir, "events", ["user_id"]).map_batches(
        _as_id, batch_format="pyarrow"
    )
    cu = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        _as_id, batch_format="pyarrow"
    )
    return ev.union(cu)


def q_salted_user_counts(sf_dir: str):
    """Per-key counts under SALTED two-level aggregation
    (``stages/skew.salted_group_count``): hot keys spread over 16
    sub-reducers before the per-key combine — the explicit skew-handling
    path the north-rule names, verified against the plain GROUP BY."""
    from ..stages.skew import salted_group_count

    ds = _read(sf_dir, "events", ["user_id"])
    return salted_group_count(ds, "user_id", salt=16)


def q_events_value_range_partition(sf_dir: str):
    """Range partitioning (the scale-sort primitive): exact quartile
    boundaries from distributed value counts, broadcast once, one
    searchsorted tag per batch — ordered partitions without an
    all-to-all Sort (``stages/shards.range_partition_ids``)."""
    from ..stages.shards import range_partition_ids

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return range_partition_ids(ds, "value", num_partitions=4)


def q_common_user_ids(sf_dir: str):
    """Set op INTERSECT as a composition: distinct event user_ids SEMI-
    joined against customer keys. The distinct pass is a per-batch
    pre-reduce + bucketed dedup (only distinct ids cross the exchange);
    the membership probe rides the semi join."""
    from ..stages.aggregate import bucketed_groups
    from ..stages.join import hash_join

    ids = _read(sf_dir, "events", ["user_id"]).map_batches(
        lambda df: df.drop_duplicates(), batch_format="pandas"
    )
    distinct = bucketed_groups(
        ids,
        ["user_id"],
        lambda df: df.drop_duplicates(),
        approx_rows=_table_rows(sf_dir, "events"),
    )
    return hash_join(
        distinct,
        _read(sf_dir, "customer", ["c_custkey"]),
        on="user_id",
        right_on="c_custkey",
        how="semi",
        approx_rows=_table_rows(sf_dir, "customer"),
        left_schema=pa.schema([pa.field("user_id", pa.int64())]),
        right_schema=_footer_schema(sf_dir, "customer", ["c_custkey"]),
    )


def q_events_from_ndjson(sf_dir: str):
    """Source-format coverage: the events table exported once to NDJSON
    (cached under /tmp), read back with ``ray.data.read_json``, and
    aggregated — proving the engine's operators are source-agnostic
    (Parquet is just the default). Oracle runs against the parquet view,
    so the hash-match also proves the NDJSON round-trip is lossless."""
    path = _export_cache(
        sf_dir, "events", "events_ndjson",
        "COPY (SELECT event_id, event_type, value FROM "
        "read_parquet('{src}')) TO '{out}' (FORMAT JSON)",
        "events.jsonl",
    )
    ds = rd.read_json(path)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            val_i=np.rint(df.value.to_numpy() * 100).astype(np.int64)
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("event_id", "size"), val_i=("val_i", "sum")
        )

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n": "sum", "val_i": "sum"},
    ).to_pandas()
    # exact integer-cent quotient (engine-wide money convention; events
    # value is 2-decimal by generation)
    out["sum_value"] = out.pop("val_i") / 100.0
    return out


def _export_cache(sf_dir: str, table: str, tag: str, copy_sql: str,
                  filename: str, writer=None) -> str:
    """One-time export of a testdata table to /tmp (DuckDB COPY by
    default, or a ``writer(src, out)`` callable for formats DuckDB can't
    write, e.g. ORC), keyed on the SOURCE PARQUET's identity (path +
    mtime + size): regenerating the testdata in place gets a fresh export
    instead of silently serving a stale one, and the two-phase rename
    tolerates concurrent first runs."""
    import duckdb

    import hashlib

    src = _t(sf_dir, table)
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    cache = f"/tmp/pgr_{tag}_{key}"
    out = os.path.join(cache, filename)
    if not os.path.isdir(cache):
        tmp = cache + f".tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        if writer is not None:
            writer(src, os.path.join(tmp, filename))
        else:
            duckdb.sql(
                copy_sql.format(src=src, out=os.path.join(tmp, filename))
            )
        try:
            os.rename(tmp, cache)
        except OSError:
            # a concurrent first run won the rename — use its export
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_lineitem_from_csv(sf_dir: str):
    """Source-format coverage: lineitem's pricing columns exported once to
    CSV (cached under /tmp), read back with ``ray.data.read_csv``, and
    fed through the same partial+combine aggregation — the oracle runs on
    the PARQUET view, so a hash-match proves the CSV round-trip lossless
    for these columns."""
    path = _export_cache(
        sf_dir, "lineitem", "lineitem_csv",
        "COPY (SELECT l_returnflag, l_quantity, l_extendedprice FROM "
        "read_parquet('{src}')) TO '{out}' (FORMAT CSV, HEADER)",
        "lineitem.csv",
    )
    ds = rd.read_csv(path)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty_i=np.rint(df.l_quantity.to_numpy()).astype(np.int64),
            price_i=np.rint(
                df.l_extendedprice.to_numpy() * 100
            ).astype(np.int64),
        )
        return df.groupby("l_returnflag", as_index=False).agg(
            n=("l_quantity", "size"),
            qty_i=("qty_i", "sum"),
            price_i=("price_i", "sum"),
        )

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {"n": "sum", "qty_i": "sum", "price_i": "sum"},
    ).to_pandas()
    # exact integer-unit quotients (engine-wide money convention)
    out["sum_qty"] = out.pop("qty_i").astype(np.float64)
    out["sum_price"] = out.pop("price_i") / 100.0
    return out


def q_orders_from_orc(sf_dir: str):
    """Source-format coverage: orders exported once to a multi-stripe ORC
    file (cached under /tmp; Ray 2.49 has no ORC support — this drives
    ``sources/orc_io.read_orc``, our stripe-streaming FileBasedDatasource),
    read back with READER-SIDE column pruning (3 columns in the file, 2
    decoded), and aggregated. The oracle runs on the PARQUET view, so a
    hash-match proves the ORC round-trip lossless for these columns."""
    from ..sources.orc_io import read_orc

    def _write_orc(src: str, out: str) -> None:
        import pyarrow.parquet as pq
        from pyarrow import orc

        t = pq.read_table(
            src, columns=["o_orderpriority", "o_totalprice", "o_orderstatus"]
        )
        # small stripes force the multi-stripe streaming path
        orc.write_table(t, out, stripe_size=1 << 20, compression="zstd")

    path = _export_cache(
        sf_dir, "orders", "orders_orc", "", "orders.orc", writer=_write_orc
    )
    ds = read_orc(path, columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            total_i=np.rint(
                df.o_totalprice.to_numpy() * 100
            ).astype(np.int64)
        )
        return df.groupby("o_orderpriority", as_index=False).agg(
            n=("o_totalprice", "size"), total_i=("total_i", "sum")
        )

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        {"n": "sum", "total_i": "sum"},
    ).to_pandas()
    # exact integer-cent quotient (engine-wide money convention)
    out["sum_total"] = out.pop("total_i") / 100.0
    return out


def q_events_union_by_name(sf_dir: str):
    """Schema-evolution concat: two projections of events with DIFFERENT
    column sets union BY NAME (``stages.reshape.union_by_name`` — Ray's
    own ``Dataset.union`` is positional and breaks on evolved schemas);
    missing columns surface as typed nulls. Aggregated per event_type so
    the oracle compare is order-free; null-filled measures prove the
    fill is typed (COUNT skips them) not zero-filled."""
    from ..stages.reshape import union_by_name

    old_gen = _read(sf_dir, "events", ["event_id", "event_type"])
    new_gen = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    ds = union_by_name([old_gen, new_gen])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        val_i = np.rint(df.value.to_numpy(dtype=np.float64,
                                          na_value=np.nan) * 100)
        present = ~np.isnan(val_i)
        out = df[["event_type"]].copy()
        out["n"] = 1
        out["n_with_value"] = present.astype(np.int64)
        out["val_i"] = np.where(present, val_i, 0).astype(np.int64)
        return out.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_with_value=("n_with_value", "sum"),
            val_i=("val_i", "sum"),
        )

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type"],
        {"n": "sum", "n_with_value": "sum", "val_i": "sum"},
    ).to_pandas()
    out["sum_value"] = out.pop("val_i") / 100.0
    return out


def q_lineitem_unpivot(sf_dir: str):
    """Wide→long melt (``stages.reshape.unpivot``): lineitem's three
    measure columns become (variable, value) rows — one zero-shuffle
    map transform. Aggregated per (returnflag, variable) with exact
    integer units so the oracle compare is order-free and float-safe."""
    from ..stages.reshape import unpivot

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_quantity", "l_extendedprice", "l_tax"],
    )
    long = unpivot(
        ds,
        id_columns=["l_returnflag"],
        value_columns=["l_quantity", "l_extendedprice", "l_tax"],
        variable_column="measure",
        value_column="v",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            v_i=np.rint(df.v.to_numpy() * 100).astype(np.int64)
        )
        return df.groupby(["l_returnflag", "measure"], as_index=False).agg(
            n=("v", "size"), v_i=("v_i", "sum")
        )

    out = combine_partials(
        long.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "measure"],
        {"n": "sum", "v_i": "sum"},
    ).to_pandas()
    out["sum_v"] = out.pop("v_i") / 100.0
    return out


def q_sample_events(sf_dir: str, fraction: float = 0.1):
    """Deterministic Bernoulli sampling via the md5 hash predicate
    (``mix.hash_mix_sample`` with one global fraction): the SAME sample on
    rerun, resume and any cluster size, and SQL-verifiable — strictly
    stronger than seeded ``random_sample`` (whose membership depends on
    block layout)."""
    from ..stages.mix import hash_mix_sample

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return hash_mix_sample(ds, id_column="event_id",
                           default_fraction=fraction)


def q_top_events(sf_dir: str, k: int = 10):
    """Global top-k WITHOUT an all-to-all sort: per-batch top-k partials
    (each batch emits ≤k rows) → one tiny coalesced merge. ``ds.sort(...)
    .limit(k)`` shuffles the whole table to produce 10 rows."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(k)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(local_topk, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------
# JSON / schema ops over events.props
# ---------------------------------------------------------------------------

def q_json_extract_props(sf_dir: str):
    """Per-row JSON parse of the props column (P1/P7 parser path)."""
    ds = _read(sf_dir, "events", ["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        ks = []
        for t in batch["props"].to_pylist():
            try:
                v = json.loads(t) if t else None
                ks.append(v.get("k") if isinstance(v, dict) else None)
            except ValueError:
                ks.append(None)
        return pa.table(
            {"event_id": batch["event_id"], "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(extract, batch_format="pyarrow")


def r_schema_infer_events_props(sf_dir: str):
    """Distributed genson inference over events.props (rows-only check)."""
    ds = _read(sf_dir, "events", ["props"])
    result = infer_schema_distributed(ds, "props", SchemaInferenceConfig())
    return pd.DataFrame(
        {
            "schema_json": [json.dumps(result.schema, sort_keys=True)],
            "processed_count": [result.processed_count],
        }
    )


def r_schema_infer_props_by_type(sf_dir: str):
    """Per-event-type merged schemas (keyed monoid reduce; rows-only —
    per-group equivalence vs sequential inference is unit-tested)."""
    from ..stages.infer import grouped_schema_infer

    ds = _read(sf_dir, "events", ["event_type", "props"])
    return grouped_schema_infer(
        ds, "event_type", "props", SchemaInferenceConfig()
    )


def r_avro_schema_events_props(sf_dir: str):
    ds = _read(sf_dir, "events", ["props"])
    result = infer_schema_distributed(
        ds, "props", SchemaInferenceConfig(avro=True)
    )
    return pd.DataFrame({"avro_json": [json.dumps(result.schema, sort_keys=True)]})


def r_normalise_events_props(sf_dir: str):
    """Two-pass normalise: inferred Avro schema broadcast (ray.put) into a
    task-pool map_batches rewrite (N1-N3 + decode-ready kv encoding). The
    stage state is one small schema dict, so warm task workers beat an
    actor pool (pool spawn alone cost ~2 s per run at 32 CPUs); per-task
    ``ray.get`` of the broadcast ref is a local shared-memory lookup."""
    from ..stages.normalise import NormaliseStage

    ds = _read(sf_dir, "events", ["event_id", "props"])
    schema = infer_schema_distributed(
        ds.select_columns(["props"]), "props", SchemaInferenceConfig(avro=True)
    ).schema
    stage = NormaliseStage(ray.put(schema), "props")
    return ds.map_batches(stage, batch_format="pyarrow").select_columns(
        ["event_id", "normalised"]
    )


def q_decode_props_typed(sf_dir: str):
    """Fused normalise+decode to typed Arrow columns (N4 Ray-native path):
    infer Avro over props, broadcast, decode each batch with the derived
    dtype — one pass, typed output, task pool (light state)."""
    from ..stages.normalise import NormaliseDecodeStage

    ds = _read(sf_dir, "events", ["event_id", "props"])
    schema = infer_schema_distributed(
        ds.select_columns(["props"]), "props", SchemaInferenceConfig(avro=True)
    ).schema
    stage = NormaliseDecodeStage(ray.put(schema), "props")
    return ds.map_batches(stage, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Text analysis / dedup / fingerprinting over documents
# ---------------------------------------------------------------------------

def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(TokenCounter(), batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )


def q_boilerplate_ngrams(sf_dir: str, min_df: int = 25):
    """Corpus-wide boilerplate discovery: word bigrams appearing in ≥
    ``min_df`` distinct documents (two-pass hashed heavy hitters +
    broadcast string recovery — strings never cross an exchange)."""
    from ..stages.corpus import boilerplate_ngrams

    ds = _read(sf_dir, "documents", ["text"])
    return boilerplate_ngrams(ds, "text", ngram_words=2, min_df=min_df)


def q_doc_logprob(sf_dir: str):
    """Unigram-LM quality score per document (mean log-probability of its
    words under the corpus unigram distribution — the cheap KenLM-filter
    stand-in). Distributed word counts → broadcast vocabulary → vectorized
    per-batch probe."""
    from ..stages.corpus import unigram_logprob

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    probe = _read(sf_dir, "documents", ["doc_id", "text"])
    return unigram_logprob(ds, probe)


def q_dup_spans(sf_dir: str, ngram_words: int = 5, min_docs: int = 2):
    """Substring-level exact duplication (Lee-et-al-style over word
    windows): per-document count/fraction of word positions covered by a
    ``ngram_words``-gram that occurs in ≥ ``min_docs`` distinct documents.
    Two-pass: hashed gram df exchange → broadcast dup-gram probe with
    vectorized interval-union coverage."""
    from ..stages.corpus import duplicated_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicated_spans(
        ds, "text", "doc_id", ngram_words=ngram_words, min_docs=min_docs
    )


def q_dup_spans_chars(sf_dir: str, ngram_chars: int = 24, min_docs: int = 2):
    """Character-level duplicated-span coverage (the fidelity step toward
    Lee et al.'s suffix-array formulation): per-document count/fraction of
    codepoints covered by a ``ngram_chars``-codepoint window of the
    whitespace-normalized text occurring in ≥ ``min_docs`` distinct docs.
    Catches sub-word / cross-token duplication the word-gram ``dup_spans``
    misses; same two-pass df-exchange → broadcast-probe shape."""
    from ..stages.corpus import duplicated_char_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return duplicated_char_spans(
        ds, "text", "doc_id", ngram_chars=ngram_chars, min_docs=min_docs
    )


def q_event_row_numbers(sf_dir: str):
    """Exact global ROW_NUMBER over (value, event_id) — the distributed
    total-order primitive (broadcast value-prefix + one narrow equal-value
    exchange; no all-to-all Sort). The rank VALUES encode the global
    order, so the order itself is hash-verified."""
    from ..stages.shards import global_row_number

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return global_row_number(ds, "value", "event_id")


def q_value_outliers(sf_dir: str, threshold: float = 3.0):
    """Robust per-type outlier constraint check: events whose value sits
    more than ``threshold`` MADs from their event_type's median. Exact
    medians/MADs from distributed value counts; broadcast filter pass."""
    from ..stages.aggregate import robust_outliers

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return robust_outliers(
        ds, "event_type", "value",
        threshold=threshold, passthrough_columns=["event_id"],
    )


def q_bm25_docs(sf_dir: str, query: str = "hash join merge sort"):
    """BM25 relevance of every document against a query string: the
    statistics exchange is |query| df counters per batch (no
    vocabulary-sized combine), then one streamed scoring pass."""
    from ..stages.corpus import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_scores(ds, query)


def r_pack_documents(sf_dir: str, max_tokens: int = 512):
    """Token-budget sequence packing (rows-only: next-fit order is
    partition-dependent, not SQL-expressible). Token counts come from the
    TokenCounter stage; packs never exceed max_tokens unless a single
    oversize document forms its own flagged pack."""
    from ..stages.packing import pack_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counted = ds.map_batches(TokenCounter(), batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )
    return pack_documents(counted, max_tokens)


def q_chunk_documents(sf_dir: str):
    """Overlapping token-window chunking (64-token windows, stride 48) —
    ``stages/packing.chunk_documents``; the flat-expansion dual of
    sequence packing."""
    from ..stages.packing import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=64, stride=48)


def r_heavy_hitter_tokens(sf_dir: str, k: int = 20):
    """Approximate corpus top-k tokens with ZERO key exchange: one
    SpaceSaving sketch per batch (bounded dict, ONE flat tokenize + one
    Counter pass — O(distinct) per batch), KB-sized pickled partials
    tree-merged in parallel (``tree_reduce_blobs``) so the driver touches
    at most one fan-in's worth of blobs regardless of block count. The
    exact counterpart is ``boilerplate_ngrams``' bucketed-combine df
    counts — this is the path when even the distinct-key partials are too
    wide to shuffle. count − error ≤ true ≤ count per returned row."""
    import pickle

    from ..stages.sketches import SpaceSaving, re2_words, tree_reduce_blobs

    ds = _read(sf_dir, "documents", ["text"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        sk = SpaceSaving(4096)
        sk.add_many(
            [
                w
                for t in df["text"]
                if isinstance(t, str) and t
                for w in re2_words(t)
            ]
        )
        return pd.DataFrame({"blob": [pickle.dumps(sk)]})

    def combine(blobs: list[bytes]) -> bytes:
        merged = None
        for b in blobs:
            sk = pickle.loads(b)
            merged = sk if merged is None else merged.merge(sk)
        return pickle.dumps(merged)

    blobs = tree_reduce_blobs(
        ds.map_batches(sketch_batch, batch_format="pandas"), combine
    )
    merged = pickle.loads(combine(blobs)) if blobs else None
    top = merged.topk(k) if merged is not None else []
    return pd.DataFrame(
        {
            "token": [t for t, _, _ in top],
            "count": pd.Series([c for _, c, _ in top], dtype="int64"),
            "error": pd.Series([e for _, _, e in top], dtype="int64"),
        }
    )


def q_doc_quality(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityScorer(), batch_format="pyarrow").select_columns(
        ["doc_id", "q_len", "q_punct"]
    )


def q_exact_dedup_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds, "text", "doc_id",
                       approx_rows=_table_rows(sf_dir, "documents"))


def r_doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(Fingerprinter(), batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


def r_langid_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LangId(), batch_format="pyarrow"
    ).select_columns(["doc_id", "lang_pred"])


def r_audio_features(sf_dir: str, rows: int = 256):
    """Real RIFF/WAVE PCM decode over a deterministic planted audio table
    (stdlib ``wave`` writer; ids drive frequency/amplitude/rate/width, so
    the table is reproducible without external data — TESTDATA has no audio
    table). Actor-pool stage: decoder state in ``__init__``, per-batch
    decode in ``__call__``. Rows-only: binary decode is not
    SQL-expressible; features are unit-pinned in
    tests/test_pipeline_components.py (planted sine/DC/silence signals)."""
    import io
    import wave

    import ray.data as rd

    from ..stages.multimodal import AudioFeatures

    sf_scale = max(1, int(rows))

    def synth(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        blobs = []
        for i in ids:
            rate = (8000, 16000, 22050)[i % 3]
            width = (1, 2, 3, 4)[i % 4]
            nch = 1 + (i % 2)
            n = rate // 10  # 100 ms per clip
            t = np.arange(n, dtype=np.float64) / rate
            amp = 0.2 + 0.05 * (i % 5)
            x = amp * np.sin(2 * np.pi * (220 + 20 * (i % 8)) * t)
            x = np.repeat(x, nch)
            if width == 2:
                raw = (x * 32767).astype("<i2").tobytes()
            elif width == 1:
                raw = ((x * 127) + 128).astype(np.uint8).tobytes()
            elif width == 4:
                raw = (x * 2147483647).astype("<i4").tobytes()
            else:
                v = (x * 8388607).astype(np.int32)
                v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
                b = np.zeros((len(v), 3), dtype=np.uint8)
                b[:, 0] = v & 0xFF
                b[:, 1] = (v >> 8) & 0xFF
                b[:, 2] = (v >> 16) & 0xFF
                raw = b.tobytes()
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(nch)
                w.setsampwidth(width)
                w.setframerate(rate)
                w.writeframes(raw)
            blobs.append(buf.getvalue())
        return pd.DataFrame({"audio_id": ids.astype(np.int64),
                             "audio": blobs})

    ds = rd.range(sf_scale).map_batches(synth, batch_format="pandas")
    return ds.map_batches(
        AudioFeatures, batch_format="pyarrow", concurrency=2
    ).select_columns(
        ["audio_id", "duration_s", "rms", "n_samples", "n_channels",
         "sample_rate", "decode_ok"]
    )


def r_video_frames(sf_dir: str, rows: int = 48):
    """Real RIFF/AVI demux over a deterministic planted video table
    (``sources.synth.encode_avi`` — stdlib struct writer; ids drive frame
    count / fps / frame size, so the table is reproducible without external
    data). Frames are synth-codec images, so ``decode_ok=True`` end-to-end;
    a real MJPEG AVI would demux identically and surface
    ``decode_ok=False`` rows (no JPEG codec in this container). Rows-only:
    container demux is not SQL-expressible; frame counts / timestamps are
    unit-pinned in tests/test_pipeline_components.py."""
    import ray.data as rd

    from ..sources.synth import encode_avi, encode_image, reference_pixels
    from ..stages.multimodal import VideoFrameSample

    def synth(batch):
        import pandas as pd

        ids = batch["id"].to_numpy()
        blobs = []
        for i in ids:
            n_frames = 6 + (i % 5) * 3
            fps_num, fps_den = ((24, 1), (30, 1), (30000, 1001))[i % 3]
            side = 8 + 4 * (i % 2)
            frames = [
                encode_image(reference_pixels(f"v{i}f{j}", side, side), "png")
                for j in range(n_frames)
            ]
            blobs.append(
                encode_avi(frames, fps_num=fps_num, fps_den=fps_den,
                           width=side, height=side)
            )
        return pd.DataFrame({"video_id": ids.astype(np.int64),
                             "video": blobs})

    ds = rd.range(max(1, int(rows))).map_batches(synth, batch_format="pandas")
    return ds.map_batches(
        VideoFrameSample,
        fn_constructor_kwargs={"id_column": "video_id", "every_n": 4},
        batch_format="pyarrow",
        concurrency=2,
    ).select_columns(["video_id", "frame_index", "timestamp_s", "decode_ok"])


def r_image_formats_real(sf_dir: str, rows: int = 256):
    """REAL PNG/BMP decode validation over a deterministic planted table
    (``functions/imagecodec`` — stdlib zlib/struct decoders, all five PNG
    filter types, CRC-verified chunks; ids drive size, format, filter type
    and a planted truncation class so ``decode_ok=False`` rows are
    exercised). The flagship ``DecodeValidator`` dispatches on container
    magic, so this drives the same actor-pool stage the synthetic bench
    table uses. Rows-only: binary decode is not SQL-expressible; codec
    round-trips and corruption handling are unit-pinned in
    tests/test_imagecodec.py."""
    import ray.data as rd

    from ..functions.imagecodec import encode_bmp, encode_png
    from ..sources.synth import reference_pixels
    from ..stages.image import DecodeValidator

    def synth(batch):
        ids = batch["id"].to_numpy()
        recs = []
        for i in ids:
            w = 8 + 4 * (int(i) % 5)
            h = 8 + 4 * ((int(i) // 5) % 5)
            image_id = f"img{int(i)}"
            px = reference_pixels(image_id, w, h)
            kind = int(i) % 8
            if kind < 4:  # PNG, rotating through all five filter types
                blob, fmt = encode_png(px, filter_type=int(i) % 5), "png"
            elif kind < 7:
                blob, fmt = encode_bmp(px), "bmp"
            else:  # planted corruption: truncated PNG -> decode_ok=False
                blob, fmt = encode_png(px)[:30], "png"
            recs.append((image_id, blob, w, h, fmt))
        return pd.DataFrame(
            recs, columns=["image_id", "bytes", "w", "h", "fmt"]
        )

    ds = rd.range(max(1, int(rows))).map_batches(synth, batch_format="pandas")
    val = ds.map_batches(
        DecodeValidator, batch_format="pyarrow", concurrency=2
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fmt", as_index=False).agg(
            n=("decode_ok", "size"),
            n_decoded=("decode_ok", "sum"),
            n_pixel_exact=("pixels_ok", "sum"),
        )

    out = combine_partials(
        val.map_batches(partial, batch_format="pandas"),
        ["fmt"],
        {"n": "sum", "n_decoded": "sum", "n_pixel_exact": "sum"},
    ).to_pandas()
    return out.sort_values("fmt").reset_index(drop=True)


def r_minhash_neardup_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_pairs(ds, "text", "doc_id", min_jaccard=0.8,
                             approx_rows=_table_rows(sf_dir, "documents"))


def r_simhash_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(SimHasher(), batch_format="pyarrow").select_columns(
        ["doc_id", "simhash", "simhash_bucket"]
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition/boilerplate features per document
    (duplicate-word mass, top word/bigram share) — the filters a training
    pipeline thresholds before tokenization."""
    from ..stages.text import RepetitionScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(RepetitionScorer(), batch_format="pyarrow")


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: docs sharing a word 5-gram with the
    benchmark corpus (here: every 50th doc, standing in for an eval set —
    a real pipeline passes the held-out benchmark table) are flagged.

    Broadcast-semi-join shape: the benchmark shingle-hash set is built once
    on the small side, ``ray.put`` once, probed per batch via vectorized
    searchsorted — the training corpus streams with no shuffle."""
    from ..stages.decontam import decontaminate

    bench_tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    mask = np.asarray(bench_tbl["doc_id"]) % 50 == 0
    bench_texts = [t for t, m in zip(bench_tbl["text"].to_pylist(), mask) if m]

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def drop_benchmark(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.doc_id % 50 != 0]

    return decontaminate(
        ds.map_batches(drop_benchmark, batch_format="pandas"),
        bench_texts,
        column="text",
        id_column="doc_id",
        ngram_words=5,
    )


def r_bloom_decontam(sf_dir: str):
    """Bloom-filter decontamination (rows-only: the filter is approximate
    — guaranteed no false negatives, tunable false positives — so exact
    SQL equality doesn't apply; the in-repo differential test pins
    flags ⊇ exact-decontaminate flags). Same benchmark convention as
    ``decontaminate_docs`` (every 50th doc), but the benchmark side is a
    DATASET and the membership structure is a fixed 8 MiB bitmap —
    the variant for contamination corpora too large to broadcast
    exactly."""
    from ..stages.decontam import bloom_decontaminate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def keep_benchmark(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.doc_id % 50 == 0]

    def drop_benchmark(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.doc_id % 50 != 0]

    contam = ds.map_batches(keep_benchmark, batch_format="pandas")
    return bloom_decontaminate(
        ds.map_batches(drop_benchmark, batch_format="pandas"),
        contam,
        column="text",
        id_column="doc_id",
        ngram_words=5,
    )


def q_curation_filter(sf_dir: str):
    """Fused keep/drop curation pass: quality + Gopher repetition +
    benchmark decontamination evaluated in ONE streaming scan of the
    corpus (no shuffle), emitting the keep flag and per-reason
    attribution.  Benchmark set = every 50th doc (as in
    ``decontaminate_docs``); those docs are excluded from the output."""
    from ..stages.curation import CurationFilter
    from ..stages.decontam import benchmark_ngram_hashes

    bench_tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    mask = np.asarray(bench_tbl["doc_id"]) % 50 == 0
    bench_texts = [t for t, m in zip(bench_tbl["text"].to_pylist(), mask) if m]
    bench_ref = ray.put(benchmark_ngram_hashes(bench_texts, 5))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def drop_benchmark(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.doc_id % 50 != 0]

    return ds.map_batches(drop_benchmark, batch_format="pandas").map_batches(
        CurationFilter(bench_ref), batch_format="pyarrow"
    )


def r_training_data_prep(sf_dir: str, num_shards: int = 8,
                         max_tokens: int = 512):
    """End-to-end training-data preparation — the composition a real
    100 TB pipeline runs, as ONE lazy Ray plan:

      1. fused per-doc pass (single scan of the text, dropped in-stage):
         curation keep/drop + fingerprint + token count;
      2. exact dedup on the fingerprint (narrow (fp, id, n_tokens) rows
         through a data-scaled bucket exchange; min-id survivor);
      3. deterministic md5 shard assignment + within-shard hash-order
         next-fit packing (one groupby exchange, int rows only).

    Output: one summary row per shard (n_docs, n_packs, total_tokens,
    fill).  Deterministic end-to-end — the same summary at any
    partitioning/cluster size (unit-tested) — but next-fit packing is
    iterative, so rows-only for the SQL oracle."""
    import hashlib

    from ..stages.curation import CurationFilter
    from ..stages.decontam import benchmark_ngram_hashes
    from ..stages.packing import pack_batch
    from ..stages.aggregate import bucketed_groups

    bench_tbl = pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    mask = np.asarray(bench_tbl["doc_id"]) % 50 == 0
    bench_texts = [t for t, m in zip(bench_tbl["text"].to_pylist(), mask) if m]
    bench_ref = ray.put(benchmark_ngram_hashes(bench_texts, 5))

    cf = CurationFilter(bench_ref)
    fper = Fingerprinter()
    tcount = TokenCounter()

    def prep(batch: pa.Table) -> pa.Table:
        keep0 = (batch["doc_id"].to_numpy() % 50) != 0
        batch = batch.filter(pa.array(keep0))
        flags = cf(batch)
        kept = batch.filter(flags.column("keep"))
        return pa.table({
            "doc_id": kept["doc_id"],
            "fingerprint": fper(kept)["fingerprint"],
            "n_tokens": tcount(kept)["n_tokens"],
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    per_doc = ds.map_batches(prep, batch_format="pyarrow")

    def dedup_fn(df: pd.DataFrame) -> pd.DataFrame:
        i = df.groupby("fingerprint")["doc_id"].idxmin()
        return df.loc[i, ["doc_id", "n_tokens"]]

    survivors = bucketed_groups(
        per_doc, ["fingerprint"], dedup_fn,
        approx_rows=_table_rows(sf_dir, "documents"),
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        pri = [hashlib.md5(str(v).encode()).hexdigest()
               for v in df["doc_id"]]
        shard = [int(p[:8], 16) % num_shards for p in pri]
        return df.assign(__pri=pri, shard=shard)

    def pack_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["__pri", "doc_id"])
        assign = pack_batch(df["n_tokens"].to_numpy(np.int64), max_tokens)
        n_packs = int(assign[-1]) + 1 if len(df) else 0
        tot = int(df["n_tokens"].sum())
        return pd.DataFrame({
            "shard": [int(df["shard"].iloc[0])],
            "n_docs": [len(df)],
            "n_packs": [n_packs],
            "total_tokens": [tot],
            "fill": [tot / (n_packs * max_tokens) if n_packs else 0.0],
        })

    out = (
        survivors.map_batches(tag, batch_format="pandas")
        .groupby("shard")
        .map_groups(pack_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("shard").reset_index(drop=True)


def q_quantity_stats_by_flag(sf_dir: str):
    """Exact per-group quantiles (quantile_cont semantics) over lineitem
    quantity by return flag — distributed value-count partials, one tiny
    interpolation task; O(groups × distinct values), never O(rows)."""
    from ..stages.aggregate import grouped_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_quantiles(ds, "l_returnflag", "l_quantity", qs=(0.25, 0.5, 0.9))


def q_events_hour_pivot(sf_dir: str):
    """Pivot / wide conditional aggregate: events per hour-of-day × type
    (5 fixed type columns). Partial (hour, type) counts per batch → tiny
    combine → driver-free pivot in the final single-block task."""
    types = ["click", "error", "purchase", "signup", "view"]
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df.ts.dt.hour.astype("int64"))
        return df.groupby(["hour", "event_type"], as_index=False).agg(
            n=("event_type", "size")
        )

    combined = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["hour", "event_type"],
        {"n": "sum"},
    )

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        wide = (
            df.pivot_table(index="hour", columns="event_type", values="n",
                           aggfunc="sum", fill_value=0)
            .reindex(columns=types, fill_value=0)
            .astype("int64")
        )
        wide.columns = [f"n_{t}" for t in types]
        return wide.reset_index()

    return combined.map_batches(pivot, batch_format="pandas", batch_size=None)


def q_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                        cutoff: str = "1998-01-01", k: int = 10):
    """TPC-H-Q3-shape composition: broadcast semi-filter (customer segment)
    → pre-aggregated lineitem revenue per order (partials BEFORE the join,
    so the shuffle join carries one row per orderkey, not per lineitem) →
    co-partitioned hash join with the filtered orders (stages/join.py) →
    global top-k without a sort."""
    from ..stages.join import hash_join

    cutoff_ts = pd.Timestamp(cutoff)
    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    seg_keys = frozenset(
        k_ for k_, s in zip(cust["c_custkey"].to_pylist(),
                            cust["c_mktsegment"].to_pylist())
        if s == segment
    )
    keys_ref = ray.put(seg_keys)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.l_shipdate > cutoff_ts]
        cents = np.rint(df.l_extendedprice.to_numpy() * 100).astype(np.int64)
        dpct = np.rint(df.l_discount.to_numpy() * 100).astype(np.int64)
        # exact hundredths-of-cents (engine-wide money convention — see
        # q_pricing_summary): the final revenue is the exact i/10000
        # quotient, bit-identical to the oracle's integer formulation
        df = df.assign(rev_i=cents * (100 - dpct))
        return df.groupby("l_orderkey", as_index=False).agg(rev_i=("rev_i", "sum"))

    # orderkey cardinality scales with the data → the per-batch partials
    # feed the JOIN directly (right_agg fuses the keyed sum into the join's
    # own bucket exchange — no separate combine shuffle)
    rev = li.map_batches(li_partial, batch_format="pandas")

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def ord_filter(df: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        df = df[(df.o_orderdate < cutoff_ts) & df.o_custkey.isin(keys)]
        return df[["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders_f = orders.map_batches(ord_filter, batch_format="pandas")
    ofs = _footer_schema(sf_dir, "orders",
                         ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = hash_join(
        orders_f,
        rev,
        on="o_orderkey",
        right_on="l_orderkey",
        right_values=["rev_i"],
        right_agg={"rev_i": "sum"},
        left_schema=ofs,
        right_schema=pa.schema(
            [pa.field("l_orderkey", pa.int64()), pa.field("rev_i", pa.int64())]
        ),
        approx_rows=_table_rows(sf_dir, "orders"),
    ).select_columns(["o_orderkey", "rev_i", "o_orderdate", "o_orderpriority"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            # zero-match join: Ray hands the UDF a columnless empty frame
            return df
        # rank on the exact integer (ties then break on orderkey, exactly
        # like the oracle's ORDER BY on the exact-quotient alias)
        return df.sort_values(
            ["rev_i", "o_orderkey"], ascending=[False, True]
        ).head(k)

    # per-block top-k partials are ≤ k rows each — merge them driver-side
    # instead of paying a Repartition(1) stage round-trip
    from ..stages.aggregate import collect_typed

    parts = collect_typed(
        joined.map_batches(topk, batch_format="pandas"),
        {"o_orderkey": np.int64, "rev_i": np.int64,
         "o_orderdate": "datetime64[us]", "o_orderpriority": object},
    )
    out = topk(parts).reset_index(drop=True)
    out["revenue"] = out.pop("rev_i") / 10000.0
    return out[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------

def _query_vectors(sf_dir: str, ids=(0, 1)):
    tbl = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    df = tbl.to_pandas().set_index("vec_id")
    return np.array([np.asarray(df.loc[i, "embedding"], dtype=np.float64) for i in ids])


def q_ann_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k for query vector vec_id=0 (baseline ANN)."""
    queries = _query_vectors(sf_dir, ids=(0,))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = brute_force_topk(ds, queries, k=k)
    df = df[["vec_id", "cosine"]].copy()
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def r_ann_topk_ivf(sf_dir: str, k: int = 10):
    """IVF-bucketed approximate top-k (the scale path next to the
    brute-force baseline; rows-only — approximate by construction)."""
    from ..stages.similarity import ivf_topk

    queries = _query_vectors(sf_dir, ids=(0,))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    df = ivf_topk(ds, queries, k=k, n_cells=16, nprobe=6,
                  approx_rows=_table_rows(sf_dir, "embeddings"))
    df = df[["vec_id", "cosine"]].copy()
    df["cosine"] = df["cosine"].round(4)
    return df.reset_index(drop=True)


def r_ann_topk_pq(sf_dir: str, k: int = 10):
    """Product-quantized ADC top-k (Jégou et al. 2011) — the COMPRESSED
    scale path: codes are m bytes/vector (here 8 B for 64-d = 32×), so
    the searchable representation of 10^12 vectors fits a cluster's
    object store; search gathers each query's broadcast (m, 256) LUT over
    the streaming code column, never re-reading floats. Rows-only:
    approximate by construction; ADC exactness + recall are unit-pinned
    (test_pq_adc_exact_and_deterministic / test_pq_recall...)."""
    from ..stages.pq import pq_encode, pq_topk, pq_train

    queries = _query_vectors(sf_dir, ids=(0, 1))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = _table_rows(sf_dir, "embeddings")
    dim = len(queries[0])
    cb = pq_train(ds, dim=dim, m=8, nbits=8, train_sample=65536,
                  approx_rows=n, seed=11)
    out = pq_topk(pq_encode(ds, cb), cb, np.asarray(queries), k=k)
    out["adc_dist"] = out["adc_dist"].round(4)
    return out.reset_index(drop=True)


def r_ann_topk_ivfpq(sf_dir: str, k: int = 10):
    """IVF-PQ (IVFADC): coarse cells prune the scan to nprobe cells and
    PQ encodes the RESIDUAL x − centroid, preserving the within-cell
    neighbor structure plain PQ quantizes away — the literal 10^12-row
    ANN layout (4 + m bytes searchable state per vector). Rows-only;
    recall-vs-brute-force and residual-ADC exactness are unit-pinned."""
    from ..stages.pq import ivfpq_build, ivfpq_topk

    queries = _query_vectors(sf_dir, ids=(0, 1))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = _table_rows(sf_dir, "embeddings")
    dim = len(queries[0])
    coarse, cb, codes = ivfpq_build(
        ds, dim=dim, n_cells=16, m=8, nbits=8, train_sample=65536,
        approx_rows=n, seed=11,
    )
    out = ivfpq_topk(codes, coarse, cb, np.asarray(queries), k=k, nprobe=6)
    out["adc_dist"] = out["adc_dist"].round(4)
    return out.reset_index(drop=True)


def r_embedding_neardup(sf_dir: str):
    """LSH-bucketed near-duplicate detection with exact in-bucket verify.

    The driver's embeddings are near-orthogonal random vectors — no natural
    near-dups — so the query plants deterministic perturbed copies of the
    first 8 vectors (ids offset by 10^7) and must find exactly those pairs:
    a true-positive end-to-end demonstration, not just a no-crash run."""
    first = pq.ParquetFile(_t(sf_dir, "embeddings")).read_row_group(0).slice(0, 8)
    ids = first["vec_id"].to_pylist()
    vecs = np.array(first["embedding"].to_pylist(), dtype=np.float64)
    dim = vecs.shape[1]
    rng = np.random.default_rng(99)
    planted = vecs + 0.02 * rng.standard_normal(vecs.shape)  # cosine ≈ 0.999
    # Arrow table with the read schema: unioning a pandas-block dataset
    # into an Arrow-block stream trips Ray's block-type batcher
    planted_tbl = pa.table(
        {
            "vec_id": pa.array(
                [i + 10_000_000 for i in ids], first["vec_id"].type
            ),
            "embedding": pa.array(
                [v.tolist() for v in planted], first["embedding"].type
            ),
        }
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).union(
        rd.from_arrow(planted_tbl)
    )
    out = embedding_near_duplicates(
        ds, dim=dim, threshold=0.9,
        approx_rows=_table_rows(sf_dir, "embeddings"),
    ).to_pandas()
    out = out.reindex(columns=["id_a", "id_b", "cosine"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Windows / sessions over events
# ---------------------------------------------------------------------------

def r_ann_topk_ivf_indexed(sf_dir: str, k: int = 10, nprobe: int = 4):
    """ANN over a PERSISTED IVF index: the embeddings table is rewritten
    once into cell-partitioned parquet (resumable two-phase-commit build,
    cached under /tmp); the query loads only the tiny centroid matrix and
    reads ONLY the probed cells' partitions — the scan itself skips
    ``1 − nprobe/n_cells`` of the data (``stages/similarity.
    build_ivf_index`` / ``ivf_index_topk``)."""
    from ..stages.similarity import build_ivf_index, ivf_index_topk

    import hashlib

    rows = _table_rows(sf_dir, "embeddings")
    # key the cached index by source identity (path + size), not just row
    # count — a different table with equal rows must not reuse it
    src = hashlib.md5(
        f"{os.path.abspath(_t(sf_dir, 'embeddings'))}:"
        f"{os.path.getsize(_t(sf_dir, 'embeddings'))}".encode()
    ).hexdigest()[:10]
    index_dir = f"/tmp/pgr_ivf_index_{src}_{rows}_v1"
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    build_ivf_index(
        ds, index_dir, n_cells=16, approx_rows=rows,
    )
    out = ivf_index_topk(index_dir, _query_vectors(sf_dir), k=k,
                         nprobe=nprobe)
    return out.reset_index(drop=True)


def r_embedding_kmeans(sf_dir: str, k: int = 10):
    """Distributed spherical k-means over the embeddings table (SemDeDup-
    style corpus organization: embed → cluster → prune/balance).  Fit is
    Lloyd's on a bounded unbiased sample (O(fit_sample × dim) driver
    memory — the quantizer-training convention; ``fit_sample=None``
    selects the exact streaming per-iteration fit); assignment is a
    broadcast map — no shuffle anywhere.  Returns (vec_id, cluster,
    cosine); rows-only check (iterative — not SQL-expressible)."""
    from ..stages.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(
        ds, k=k, approx_rows=_table_rows(sf_dir, "embeddings")
    )
    out = kmeans_assign(ds, centroids).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values("vec_id").reset_index(drop=True)


def r_semantic_dedup(sf_dir: str):
    """SemDeDup composition: k-means the embedding space, then greedily
    prune within-cluster near-duplicates (cosine ≥ 0.9 to a kept point).
    Plants perturbed copies of the first 8 vectors (ids +10^7) — those,
    and only those, must be dropped (the natural embeddings are
    near-orthogonal), so this is a true-positive demonstration."""
    from ..stages.cluster import semantic_dedup

    first = pq.ParquetFile(_t(sf_dir, "embeddings")).read_row_group(0).slice(0, 8)
    ids = first["vec_id"].to_pylist()
    vecs = np.array(first["embedding"].to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(99)
    planted = vecs + 0.02 * rng.standard_normal(vecs.shape)
    planted_tbl = pa.table(
        {
            "vec_id": pa.array([i + 10_000_000 for i in ids],
                               first["vec_id"].type),
            "embedding": pa.array([v.tolist() for v in planted],
                                  first["embedding"].type),
        }
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).union(
        rd.from_arrow(planted_tbl)
    )
    out = semantic_dedup(
        ds, k=10, threshold=0.9,
        approx_rows=_table_rows(sf_dir, "embeddings"),
    ).to_pandas()
    out["max_kept_cosine"] = out["max_kept_cosine"].round(4)
    return out.sort_values("vec_id").reset_index(drop=True)


def _events_cents(sf_dir: str):
    """events (ts, event_type, value_cents): value pre-scaled to exact
    int64 cents (2-decimal by generation) so window sums are
    order-of-association exact — the q_user_rolling_hour convention."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    return ds.map_batches(
        lambda df: df.assign(
            value=np.rint(df.value * 100).astype("int64")
        ),
        batch_format="pandas",
    )


def q_event_windows_hourly(sf_dir: str):
    out = tumbling_window(
        _events_cents(sf_dir), "ts", "event_type", "value", window="1h"
    ).to_pandas()
    for c in ("sum_value", "min_value", "max_value"):
        # exact cents quotients (engine-wide money convention)
        out[c] = out[c] / 100.0
    return out


def r_events_value_drift(sf_dir: str):
    """Distribution drift of events.value between the first and second
    half of the stream's time range: mergeable fixed-bin histogram
    partials per batch → one tiny driver merge → KS + PSI (the same
    sketches the validation pipeline uses, as a standalone operator).
    Rows-only: histogram KS/PSI semantics are unit-tested; a SQL
    reproduction of numpy's bin-edge conventions would be fragile."""
    from ..stages.sketches import Histogram

    ds = _read(sf_dir, "events", ["ts", "value"])

    def minmax(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "ts_mn": [pc.min(t["ts"]).as_py()],
                "ts_mx": [pc.max(t["ts"]).as_py()],
                "v_mn": [pc.min(t["value"]).as_py()],
                "v_mx": [pc.max(t["value"]).as_py()],
            }
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    split = mm.ts_mn.min() + (mm.ts_mx.max() - mm.ts_mn.min()) / 2
    v_lo, v_hi = float(mm.v_mn.min()), float(mm.v_mx.max())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        early = df.loc[df.ts < split, "value"].to_numpy()
        late = df.loc[df.ts >= split, "value"].to_numpy()
        ha, hb = Histogram(v_lo, v_hi, 64), Histogram(v_lo, v_hi, 64)
        ha.add_array(early)
        hb.add_array(late)
        return pd.DataFrame(
            {
                "ha": [ha.to_bytes()],
                "hb": [hb.to_bytes()],
                "na": [len(early)],
                "nb": [len(late)],
            }
        )

    rows = ds.map_batches(partial, batch_format="pandas").take_all()
    ha, hb = Histogram(v_lo, v_hi, 64), Histogram(v_lo, v_hi, 64)
    na = nb = 0
    for r in rows:
        ha.merge(Histogram.from_bytes(r["ha"]))
        hb.merge(Histogram.from_bytes(r["hb"]))
        na += r["na"]
        nb += r["nb"]
    return pd.DataFrame(
        {
            "ks": [round(ha.ks(hb), 6)],
            "psi": [round(ha.psi(hb), 6)],
            "rows_early": [na],
            "rows_late": [nb],
        }
    )


def q_stratified_sample_events(sf_dir: str):
    """Deterministic stratified sample: 5 events per event_type by md5(id)
    priority — reproducible across runs/cluster sizes, SQL-verifiable."""
    from ..stages.aggregate import stratified_sample

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return stratified_sample(ds, "event_type", "event_id", 5).select_columns(
        ["event_id", "event_type", "value"]
    )


def q_quantity_tier_revenue(sf_dir: str):
    """Broadcast range join: classify lineitems into quantity tiers
    (no shuffle — vectorized interval lookup per batch) then aggregate."""
    from ..stages.rangejoin import broadcast_range_join

    tiers = pd.DataFrame(
        {
            "tier": ["low", "mid", "high", "bulk"],
            "lo": [1, 10, 25, 40],
            "hi": [9, 24, 39, 50],
        }
    )
    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    tagged = broadcast_range_join(ds, "l_quantity", tiers)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            rev_i=np.rint(df.l_extendedprice.to_numpy() * 100).astype(np.int64)
        )
        return df.groupby("tier", as_index=False).agg(
            n=("l_quantity", "size"), rev_i=("rev_i", "sum")
        )

    out = combine_partials(
        tagged.map_batches(partial, batch_format="pandas"),
        ["tier"],
        {"n": "sum", "rev_i": "sum"},
    ).to_pandas()
    # exact cents quotient (engine-wide money convention)
    out["revenue"] = out.pop("rev_i") / 100.0
    return out


def q_top_events_per_type(sf_dir: str):
    """Grouped top-k: the 3 highest-value events per event_type (partial
    per batch, tiny final combine — no global sort)."""
    from ..stages.aggregate import grouped_topk

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return grouped_topk(
        ds, "event_type", "value", 3, tie_columns=("event_id",)
    ).select_columns(["event_id", "event_type", "value"])


def q_events_asof_orders(sf_dir: str):
    """Point-in-time enrichment: each event joined to the user's most
    recent order at event time (distributed as-of join; oracle is
    DuckDB's native ASOF JOIN)."""
    from ..stages.asof import asof_join

    ev_cols = ["event_id", "user_id", "ts"]
    od_cols = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    events = _read(sf_dir, "events", ev_cols)
    orders = _read(sf_dir, "orders", od_cols)

    def _footer(table: str, cols: list[str]) -> "pa.Schema":
        return _footer_schema(sf_dir, table, cols)

    return asof_join(
        events,
        orders,
        key="user_id",
        ts="ts",
        right_key="o_custkey",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
        dedup_right_by="o_orderkey",
        left_schema=_footer("events", ev_cols),
        right_schema=_footer("orders", od_cols),
    )


def q_jaccard_neardup_docs(sf_dir: str):
    """EXACT near-duplicate pairs (word-trigram Jaccard ≥ 0.8) via the
    prefix-filtered set-similarity self-join — contrast with the
    probabilistic minhash path (r_minhash_neardup_docs)."""
    from ..stages.setjoin import set_similarity_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = set_similarity_join(
        ds, "text", "doc_id", threshold=0.8, ngram_words=3
    ).to_pandas()
    # EXACT |∩|/|∪| quotient, never rounded: Jaccard is rational, and
    # quotients with power-of-two denominators (e.g. 27/32 = 0.84375) are
    # exactly representable — rounding them hits the numpy-half-even vs
    # SQL-half-away divergence
    return out.reset_index(drop=True)


def q_shuffle_shards(sf_dir: str, num_shards: int = 8):
    """Deterministic global shuffle of the corpus into training shards:
    md5(doc_id) is the permutation key, so the assignment is identical
    run-to-run and across cluster sizes (resumable), unlike seeded
    ``random_shuffle``.  Only (id, priority) rows cross the exchange."""
    from ..stages.shards import deterministic_shards

    ds = _read(sf_dir, "documents", ["doc_id"])
    return deterministic_shards(ds, id_column="doc_id",
                                num_shards=num_shards)


def q_source_mix(sf_dir: str):
    """Data-mixture sampling: deterministic per-source keep fractions via
    md5 hash sampling (pure per-row predicate — no shuffle, identical
    subset on rerun and at any cluster size).  Fractions here derive from
    the source's numeric suffix (srcN % 4 → 0.1/0.3/0.6/1.0), standing in
    for real mixture weights."""
    from ..stages.mix import hash_mix_sample

    fractions = {
        f"src{i}": (0.1, 0.3, 0.6, 1.0)[i % 4] for i in range(64)
    }
    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    return hash_mix_sample(
        ds, fractions, id_column="doc_id", source_column="source"
    )


def q_pii_redact(sf_dir: str):
    """PII scrub pass: count + redact emails / phone numbers / IPv4
    addresses (Arrow RE2 kernels, streaming, no shuffle).  The synthetic
    corpus has no natural PII, so deterministic PII is planted first
    (doc_id-keyed suffixes — the oracle plants identically in SQL), making
    the query a true-positive demonstration, not a no-op."""
    from ..stages.text import PIIRedactor

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"]
        s = df["text"].copy()
        m = d % 7 == 0
        s[m] += " contact user" + d[m].astype(str) + "@example.com"
        m = d % 11 == 0
        s[m] += " call 555-010-" + (d[m] % 10000).astype(str).str.zfill(4)
        m = d % 13 == 0
        s[m] += (
            " host 10.0." + (d[m] % 256).astype(str)
            + "." + ((d[m] * 7) % 256).astype(str)
        )
        return pd.DataFrame({"doc_id": d, "text": s})

    return (
        ds.map_batches(plant, batch_format="pandas")
        .map_batches(PIIRedactor(), batch_format="pyarrow")
        .select_columns(["doc_id", "n_emails", "n_phones", "n_ips",
                         "text_redacted"])
    )


def q_neardup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: the transitive closure of the exact
    set-similarity pairs (word-trigram Jaccard ≥ 0.8), one ``cluster_id``
    (= min doc_id in the component) per document.  Keep-one-per-cluster
    dedup is the downstream filter ``doc_id == cluster_id``.

    Pairs (id-only rows) come from the prefix-filtered self-join; the
    component labels resolve size-adaptively (driver pointer-jumping for
    sparse pair graphs, distributed min-label propagation for dup-heavy
    ones) and attach to the corpus as a broadcast probe — the documents
    table itself never shuffles."""
    from ..stages.components import connected_components
    from ..stages.setjoin import set_similarity_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = set_similarity_join(
        ds, "text", "doc_id", threshold=0.8, ngram_words=3
    ).select_columns(["id_a", "id_b"])
    nodes = _read(sf_dir, "documents", ["doc_id"])
    return connected_components(pairs, nodes, node_column="doc_id")


def q_hourly_active_users(sf_dir: str):
    """Windowed DISTINCT aggregate (hourly active users) — the windowed
    cousin of ``users_per_event_type``, sharing
    ``stages/aggregate.grouped_distinct_count``."""
    from ..stages.aggregate import grouped_distinct_count

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    return grouped_distinct_count(
        ds,
        ["window_start"],
        "user_id",
        prepare=lambda df: df.assign(window_start=df["ts"].dt.floor("1h")),
        approx_rows=_table_rows(sf_dir, "events"),
        out_column="n_users",
    )


def q_cumulative_new_users(sf_dir: str):
    """Growth accounting: cumulative distinct users by day = first-seen
    day per user (bucketed min) → per-day new-user counts (tiny combine)
    → driver cumsum over the bounded day axis. The unbounded-cardinality
    work (per-user min) never leaves the bucketed exchange."""
    from ..stages.aggregate import bucketed_groups

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.assign(day=df["ts"].dt.floor("1d"))
        return d.groupby("user_id", as_index=False).agg(day=("day", "min"))

    firsts = bucketed_groups(
        ds.map_batches(first_partial, batch_format="pandas"),
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            day=("day", "min")
        ),
        approx_rows=_table_rows(sf_dir, "events"),
    )
    days = combine_partials(
        firsts.map_batches(
            lambda df: df.groupby("day", as_index=False).agg(
                n=("user_id", "size")
            ),
            batch_format="pandas",
        ),
        ["day"],
        {"n": "sum"},
    ).to_pandas()
    days = days.sort_values("day").reset_index(drop=True)
    return pd.DataFrame(
        {"day": days["day"], "cum_users": days["n"].cumsum().astype("int64")}
    )


def q_day_retention(sf_dir: str):
    """Day-over-day retention: for each day, how many of its active users
    are active again the NEXT day — distinct (day, user) pairs self-joined
    on (user, day+1) via the co-partitioned hash join, then per-day counts.
    Only distinct pairs cross any exchange."""
    from ..stages.aggregate import bucketed_groups
    from ..stages.join import hash_join

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(day=df["ts"].dt.floor("1d"))[
            ["day", "user_id"]
        ].drop_duplicates()

    # OBJECT-STORE (not driver) materialization of the distinct-pair set,
    # reused by both join sides below. 100-TB note: distinct (day, user)
    # pairs are bounded by days × MAU — orders of magnitude below the raw
    # event stream — and the blocks spill; if even that is too large,
    # restrict `ds` to a day-range window first (the operator composes:
    # retention for day D needs only days D and D+1), which keeps the
    # pinned set to two days of actives per task wave.
    active = bucketed_groups(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["day", "user_id"],
        lambda df: df.drop_duplicates(),
        approx_rows=_table_rows(sf_dir, "events"),
    ).materialize()

    shifted = active.map_batches(
        lambda df: df.assign(day=df["day"] - pd.Timedelta(days=1)),
        batch_format="pandas",
    )
    pair_schema = pa.schema(
        [pa.field("day", pa.timestamp("us")), pa.field("user_id", pa.int64())]
    )
    retained = hash_join(
        active,
        shifted,
        on=["day", "user_id"],
        how="semi",
        approx_rows=_table_rows(sf_dir, "events"),
        left_schema=pair_schema,
        right_schema=pair_schema,
    )
    out = combine_partials(
        retained.map_batches(
            lambda df: df.groupby("day", as_index=False).agg(
                n_retained=("user_id", "size")
            ),
            batch_format="pandas",
        ),
        ["day"],
        {"n_retained": "sum"},
    )
    return out


def q_weekly_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by first-seen week (cohort),
    counted in every week they were active. Both unbounded-cardinality
    steps stay bucketed (per-user min week; distinct (week, user) pairs);
    the cohort label attaches via the co-partitioned hash join; the final
    (cohort, week) matrix is bounded → tiny combine."""
    from ..stages.aggregate import bucketed_groups
    from ..stages.join import hash_join

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def week_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            wk=df["ts"].dt.to_period("W-SUN").dt.start_time.astype(
                "datetime64[us]"
            )
        )[["wk", "user_id"]].drop_duplicates()

    # OBJECT-STORE materialization (spillable, two consumers: cohort min
    # + join left side). 100-TB note: distinct (week, user) pairs ≈ weeks
    # × WAU, far below raw events; for a longer horizon, compute the
    # matrix per cohort-week partition (each cohort's row needs only that
    # cohort's users' pairs) instead of holding all pairs at once.
    pairs = bucketed_groups(
        ds.map_batches(week_pairs, batch_format="pandas"),
        ["wk", "user_id"],
        lambda df: df.drop_duplicates(),
        approx_rows=_table_rows(sf_dir, "events"),
    ).materialize()
    cohorts = bucketed_groups(
        pairs,
        ["user_id"],
        lambda df: df.groupby("user_id", as_index=False).agg(
            cohort=("wk", "min")
        ),
        approx_rows=_table_rows(sf_dir, "events"),
    )
    pair_schema = pa.schema(
        [pa.field("wk", pa.timestamp("us")), pa.field("user_id", pa.int64())]
    )
    labeled = hash_join(
        pairs,
        cohorts,
        on="user_id",
        right_values=["cohort"],
        approx_rows=_table_rows(sf_dir, "events"),
        left_schema=pair_schema,
        right_schema=pa.schema(
            [
                pa.field("user_id", pa.int64()),
                pa.field("cohort", pa.timestamp("us")),
            ]
        ),
    )
    return combine_partials(
        labeled.map_batches(
            lambda df: df.groupby(["cohort", "wk"], as_index=False).agg(
                n_active=("user_id", "size")
            ),
            batch_format="pandas",
        ),
        ["cohort", "wk"],
        {"n_active": "sum"},
    )


def q_event_windows_sliding(sf_dir: str):
    """1-hour windows hopping every 30 minutes (each event lands in 2)."""
    from ..stages.windows import sliding_window

    out = sliding_window(
        _events_cents(sf_dir), "ts", "event_type", "value",
        window="1h", hop="30min"
    ).to_pandas()
    for c in ("sum_value", "min_value", "max_value"):
        # exact cents quotients (engine-wide money convention)
        out[c] = out[c] / 100.0
    return out


def r_sessions(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    return session_windows(ds, "ts", "user_id", gap_seconds=1800)


# ---------------------------------------------------------------------------
# Multimodal stages over the synthetic image table (rows-only checks)
# ---------------------------------------------------------------------------

def r_phash_neardup_images(sf_dir: str):
    """Perceptual-hash (Hamming ≤ 3) near-duplicate pairs over the image
    table — ``stages/dedup.phash_hamming_pairs``. Random 62-bit phashes
    have no natural near-dups, so the query PLANTS 8 perturbed copies
    (1–3 bit flips of real phashes) as a true-positive demo; the hot
    phash shared by ~10% of rows collapses to one representative in
    phase 0 instead of expanding pairwise."""
    from ..functions.context import strip_schema_metadata
    from ..stages.dedup import phash_hamming_pairs

    rows = _rows_for_sf(sf_dir)
    img_dir = _image_table_dir(rows)
    ds = rd.read_parquet(img_dir, columns=["image_id", "phash"]).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
    # plant near copies of 8 real (non-hot, distinct) phashes
    frag0 = sorted(
        f for f in os.listdir(img_dir) if f.endswith(".parquet")
    )[0]
    sample = pq.read_table(
        os.path.join(img_dir, frag0), columns=["phash"]
    )["phash"].to_numpy()
    hot = 0x5A5A5A5A
    base = []
    for v in sample:
        if v != hot and v not in base:
            base.append(int(v))
        if len(base) == 8:
            break
    planted = pa.table(
        {
            "image_id": pa.array(
                [f"plant_{i:03d}" for i in range(len(base))], pa.string()
            ),
            "phash": pa.array(
                [v ^ (0b111 >> (i % 3)) for i, v in enumerate(base)],
                pa.int64(),
            ),
        }
    )
    ds = ds.union(rd.from_arrow(planted))
    out = phash_hamming_pairs(
        ds, approx_rows=rows + len(base)
    ).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def r_image_features(sf_dir: str):
    """Actor-pool feature extraction over the image table (model-stage
    shape: state in __init__, batched work in __call__)."""
    from ..stages.multimodal import ImageFeatures

    img_dir = _image_table_dir(_rows_for_sf(sf_dir))
    ds = rd.read_parquet(img_dir, columns=["image_id", "bytes"])
    return ds.map_batches(
        ImageFeatures, batch_format="pyarrow", batch_size=256, concurrency=default_pool_size()
    ).select_columns(["image_id", "features"])


def r_image_resize(sf_dir: str):
    """Actor-pool decode→resize→re-encode; emits thumbnails + ok flag."""
    from ..stages.multimodal import ImageResize

    img_dir = _image_table_dir(_rows_for_sf(sf_dir))
    ds = rd.read_parquet(img_dir, columns=["image_id", "bytes", "w", "h"])
    out = ds.map_batches(
        ImageResize,
        fn_constructor_kwargs={"out_w": 16, "out_h": 16},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=default_pool_size(),
    )
    return out.select_columns(["image_id", "w", "h", "resize_ok"])


def r_aspect_buckets(sf_dir: str):
    """Aspect-ratio bucketing + deterministic training-batch assembly
    over the image table (rows-only: batch assignment depends on the
    engine's shuffle-key hash, not SQL-expressible; determinism and
    batch-shape invariants are unit-tested). Only (id, w, h) leave the
    scan — image bytes never move."""
    from ..stages.image import aspect_bucket_batches

    img_dir = _image_table_dir(_rows_for_sf(sf_dir))
    ds = rd.read_parquet(img_dir, columns=["image_id", "w", "h"])
    return aspect_bucket_batches(ds, batch_size=32)


# ---------------------------------------------------------------------------
# Flagship validation pipeline over the synthetic image table
# ---------------------------------------------------------------------------

def _image_table_dir(rows: int) -> str:
    from ..sources.synth import generate_image_table

    out = f"/tmp/pgr_images_{rows}_v3"
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        # enough fragments that the decode pool and per-fragment reporting
        # both exercise real parallelism; fragments stay ≥1000 rows —
        # A/B-measured best at this toy size (33×600 rows = 3.0 s vs
        # 20×1000 = 2.68 s best-of-3 same session: extra actor spawns cost
        # more than the tail-wave imbalance; 66×300 was 2.5× worse)
        fragments = max(8, min(64, rows // 1000))
        generate_image_table(out, num_rows=rows, num_fragments=fragments)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _rows_for_sf(sf_dir: str) -> int:
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        return max(1000, int(float(sf) * 200_000))
    except ValueError:
        return 2000


def r_validation_image_table(sf_dir: str):
    """Flagship: schema + constraint validation over the deterministic
    image+caption table (scaled by sf via directory size convention)."""
    from ..pipelines.validation import run_validation

    img_dir = _image_table_dir(_rows_for_sf(sf_dir))
    import shutil, tempfile

    out_dir = tempfile.mkdtemp(prefix="pgr_val_")
    try:
        rep = run_validation(img_dir, out_dir)
        frag_rows = [
            {
                "fragment": os.path.basename(p),
                "rows": r["rows"],
                "violations": r["violations"],
                "passed": bool(r["pass"]),
            }
            for p, r in sorted(rep.fragment_reports.items())
        ]
        return pd.DataFrame(frag_rows)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def r_validation_violations(sf_dir: str):
    """The per-ROW violation surface the north rule names: run the
    flagship validation, then read back the annotated parquet it wrote
    and return the violating rows (image_id, fragment, violation kind,
    psnr) — the record a downstream repair/quarantine job consumes.
    The corpus plants deterministic corruptions, so this is non-empty
    and stable."""
    from ..pipelines.validation import run_validation

    img_dir = _image_table_dir(_rows_for_sf(sf_dir))
    import shutil, tempfile

    out_dir = tempfile.mkdtemp(prefix="pgr_valrows_")
    try:
        run_validation(img_dir, out_dir)
        ann = rd.read_parquet(
            os.path.join(out_dir, "annotated"),
            columns=["image_id", "path", "violation", "psnr_db"],
        )

        def keep_violations(df: pd.DataFrame) -> pd.DataFrame:
            out = df[df.violation != ""].copy()
            out["fragment"] = out.pop("path").map(os.path.basename)
            return out

        out = (
            ann.map_batches(keep_violations, batch_format="pandas")
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        return out
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
