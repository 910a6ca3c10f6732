"""Two-level aggregation: per-batch partials → final combine.

Every wide aggregate in this engine pre-aggregates inside ``map_batches``
(one partial row per (batch, group)), so the final combine only ever sees
``n_blocks × n_groups`` tiny rows. How the combine should run depends on the
distinct-group cardinality:

* **small** (≲ a few million groups — window aggregates, per-nation/flag
  rollups, per-fragment reports): coalesce the partial blocks with
  ``repartition(1)`` and combine with ONE vectorized pandas groupby.
  Measured locally this is ~5-8× faster than ``Dataset.groupby().aggregate``,
  whose sort-based shuffle pays per-distinct-key Python overhead in both its
  map and reduce suboperators (600-850 ms per 200-row block at sf0.01).
  At 100 TB the partials are still tiny relative to the input — the single
  combine task holds ``n_groups`` rows, not the dataset.

* **large** (group count itself scales with the data — dedup keys, user
  ids): one task can't hold all groups. Callers pass ``small=False`` and
  the combine runs under :func:`bucketed_groups` — a key-hash bucket
  exchange with ONE vectorized pandas reduce per bucket. (Ray's own
  ``groupby().aggregate()`` computes the same thing but pays
  per-distinct-key Python overhead in its map and reduce suboperators:
  measured 11 s for a 13k-key sum the bucketed path does in <1 s.)

The reference has exactly one global aggregate (the schema merge,
genson-core/src/schema.rs:355-443, rayon fold/reduce); this generalizes that
partial+final shape to arbitrary keyed aggregates.
"""

from __future__ import annotations

import pandas as pd

_AGG_FNS = {"sum", "min", "max"}


def collect_typed(ds, cols: dict) -> pd.DataFrame:
    """``to_pandas()`` of a combine/join result, schema-safe when EMPTY:
    Ray drops the pandas block schema on zero-row outputs (a combine that
    filtered everything, a join with no matches), so the collected frame
    is columnless and the first column access raises KeyError. Rebuild
    the typed empty frame instead. ``cols`` maps column → dtype."""
    df = ds.to_pandas()
    if not set(cols) <= set(df.columns):
        assert df.empty, f"schema loss on non-empty frame: {list(df.columns)}"
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in cols.items()}
        )
    return df


def bucketed_groups(
    ds,
    keys: list[str],
    fn,
    *,
    approx_rows: int | None = None,
    num_buckets: int | None = None,
    max_bucket_rows: int | None = None,
    pre_reduce=None,
):
    """Hash-partition ``ds`` by a key-hash bucket and apply ``fn``
    (pandas → pandas) to each bucket's rows. A bucket holds WHOLE keys, so
    any per-key reduction (aggregate, top-k, dedup) is correct per bucket.

    This is the engine's large-cardinality exchange: one narrow sort-based
    shuffle on an int32 bucket id, one vectorized pandas call per bucket.
    It replaces both ``Dataset.groupby().aggregate()`` (per-distinct-key
    Python overhead in its map+reduce suboperators — measured 11 s for a
    13k-key sum that this path does in <1 s) and ``groupby(key).map_groups``
    (one Python call per KEY; this makes it one call per BUCKET). Bucket
    count scales with data / cluster (``_derive_num_buckets``), keeping
    per-bucket population ~constant as the dataset grows.

    Skew safety (a bucket holds whole keys, so ONE pathological key — one
    user owning 30% of all events — would land in one pandas task):

    * ``max_bucket_rows`` — loud guard. A bucket whose row count exceeds the
      cap raises with the hottest keys' populations instead of silently
      building one giant frame (default ``PGR_MAX_BUCKET_ROWS`` env,
      5,000,000 rows ≈ low-GB per task at typical widths).
    * ``pre_reduce`` — the re-route for decomposable reductions: a pandas →
      pandas per-batch combiner (keyed on ``keys``; must satisfy
      ``fn(pre(a) ++ pre(b)) == fn(a ++ b)``) applied BEFORE the exchange,
      so a hot key crosses it as ≤ 1 partial row per input block instead of
      its full row population. Most call sites already feed pre-aggregated
      partials or time-bucketed keys; this is for raw-row reductions.
    """
    import numpy as np
    import pyarrow as pa

    from .dedup import _derive_num_buckets
    from .sketches import key_hashes

    if num_buckets is None:
        num_buckets = _derive_num_buckets(approx_rows)
    mask = np.uint64(num_buckets - 1)
    if max_bucket_rows is None:
        import os

        max_bucket_rows = int(os.environ.get("PGR_MAX_BUCKET_ROWS", 5_000_000))

    if pre_reduce is not None:
        ds = ds.map_batches(pre_reduce, batch_format="pandas")

    def tag(batch: pa.Table) -> pa.Table:
        b = (key_hashes(batch, keys) & mask).astype(np.int32)
        return batch.append_column("__b", pa.array(b))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_bucket_rows:
            hottest = (
                df.groupby(keys, dropna=False, observed=True)
                .size()
                .nlargest(3)
                .to_dict()
            )
            raise ValueError(
                f"bucketed_groups: one bucket holds {len(df)} rows "
                f"(> max_bucket_rows={max_bucket_rows}); hottest keys "
                f"{hottest}. Pass pre_reduce= (per-batch combiner) for "
                f"decomposable reductions, or raise max_bucket_rows / "
                f"PGR_MAX_BUCKET_ROWS if the task can genuinely hold it."
            )
        return fn(df.drop(columns="__b"))

    # coarse batches: the exchange is block-count-bound at narrow widths
    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=16384)
    return tagged.groupby("__b").map_groups(per_bucket, batch_format="pandas")


def combine_partials(
    partials,
    keys: list[str],
    agg_map: dict[str, str],
    *,
    small: bool = True,
):
    """Final combine of pre-aggregated partial rows.

    ``agg_map`` maps column → combine fn name (``sum``/``min``/``max``);
    column names are preserved (partial and final column names match, which
    keeps them aligned with the oracle SQL aliases).
    """
    if small:

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            return df.groupby(keys, as_index=False).agg(
                **{c: (c, fn) for c, fn in agg_map.items()}
            )

        return partials.repartition(1).map_batches(
            combine, batch_format="pandas", batch_size=None
        )

    unknown = set(agg_map.values()) - _AGG_FNS
    if unknown:
        raise ValueError(f"unsupported combine fns: {unknown}")

    def combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            **{c: (c, fn) for c, fn in agg_map.items()}
        )

    return bucketed_groups(partials, keys, combine_bucket)


def grouped_topk(
    ds,
    key_column: str,
    value_column: str,
    k: int,
    *,
    tie_columns: tuple = (),
    small: bool = True,
    ascending: bool = False,
):
    """Per-key top-``k`` rows by ``value_column`` descending (``ascending=
    True`` flips it to bottom-k; ties broken by ``tie_columns`` ascending —
    pass a unique column for determinism).

    Same partial+final shape as :func:`combine_partials`: each batch
    reduces to ≤ ``k`` rows per key it contains, so the exchange carries
    ``n_blocks × n_keys × k`` rows, never the dataset. ``small=True``
    finishes in one coalesced task (bounded key sets); ``small=False``
    finishes under a keyed groupby (data-scaled key sets)."""
    sort_cols = [value_column, *tie_columns]
    ascending = [ascending] + [True] * len(tie_columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(key_column, as_index=False, sort=False)
            .head(k)
        )

    parts = ds.map_batches(partial, batch_format="pandas")
    if small:
        return parts.repartition(1).map_batches(
            partial, batch_format="pandas", batch_size=None
        )
    return bucketed_groups(parts, [key_column], partial)


def grouped_quantiles(
    ds,
    key_column: str,
    value_column: str,
    qs: tuple = (0.5,),
    *,
    max_distinct: int = 1_000_000,
):
    """Exact per-group quantiles (``quantile_cont`` semantics: linear
    interpolation at rank ``(n−1)·q``) via distributed value counts.

    Same bounded-cardinality contract as ``q_quantity_quantiles``: each
    batch pre-reduces to (key, value) counts, the tiny combine sums them,
    and the final task interpolates per group from the cumulative counts —
    O(keys × distinct values) state, never O(rows). Continuous columns
    belong on the t-digest sketch path (``stages.sketches.TDigest``).

    Returns a Dataset with columns ``key_column, q, value`` (one row per
    key × quantile; ``value`` is DOUBLE, matching DuckDB quantile_cont)."""
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([key_column, value_column], as_index=False).agg(
            __cnt=(value_column, "size")
        )

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        [key_column, value_column],
        {"__cnt": "sum"},
    )

    def interpolate(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({key_column: [], "q": [], "value": []})
        if len(df) > max_distinct:
            raise ValueError(
                f"grouped_quantiles: > {max_distinct} distinct (key, value) "
                "pairs — use the t-digest path for continuous columns"
            )
        out_k, out_q, out_v = [], [], []
        for key, g in df.groupby(key_column, sort=False):
            g = g.sort_values(value_column)
            vals = g[value_column].to_numpy(dtype=np.float64)
            cum = g["__cnt"].to_numpy(dtype=np.int64).cumsum()
            n = int(cum[-1])

            def value_at(rank: int) -> float:
                # first distinct value whose cumulative count exceeds rank
                return float(vals[np.searchsorted(cum, rank, side="right")])

            for q in qs:
                pos = (n - 1) * q
                lo, hi = int(np.floor(pos)), int(np.ceil(pos))
                v = value_at(lo)
                if hi != lo:
                    v += (pos - lo) * (value_at(hi) - v)
                out_k.append(key)
                out_q.append(q)
                out_v.append(v)
        return pd.DataFrame({key_column: out_k, "q": out_q, "value": out_v})

    return counts.map_batches(interpolate, batch_format="pandas", batch_size=None)


def stratified_sample(
    ds,
    key_column: str,
    id_column: str,
    n_per_key: int,
    *,
    small: bool = True,
):
    """Deterministic stratified sample: the ``n_per_key`` rows per key with
    the smallest md5(id) — a stable per-row priority, so the sample is
    (a) exactly reproducible run-to-run and across cluster sizes,
    (b) mergeable (bottom-k is a monoid → same partial+final shape as
    :func:`grouped_topk`), and (c) SQL-verifiable (``ORDER BY
    md5(CAST(id AS VARCHAR))``), unlike seeded RNG sampling."""
    import hashlib

    def add_priority(df: pd.DataFrame) -> pd.DataFrame:
        pri = [
            hashlib.md5(str(v).encode()).hexdigest() for v in df[id_column]
        ]
        return df.assign(__pri=pri)

    out = grouped_topk(
        ds.map_batches(add_priority, batch_format="pandas"),
        key_column,
        "__pri",
        n_per_key,
        tie_columns=(id_column,),
        small=small,
        ascending=True,
    )
    return out.drop_columns(["__pri"])


def grouped_distinct_count(
    ds,
    key_columns: list[str],
    distinct_column: str,
    *,
    prepare=None,
    approx_rows: int | None = None,
    out_column: str = "n_distinct",
):
    """Exact ``COUNT(DISTINCT distinct_column) GROUP BY key_columns``:
    per-batch pair dedup → bucketed distinct (a bucket holds whole
    (keys, value) pairs) → per-key partial counts → tiny combine. Only
    DISTINCT pairs ever cross the exchange; the final key set is assumed
    bounded (windows, categories). ``prepare`` optionally derives the key
    columns per batch (e.g. flooring a timestamp)."""

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            df = prepare(df)
        return df[key_columns + [distinct_column]].drop_duplicates()

    def bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.drop_duplicates()
            .groupby(key_columns, as_index=False)
            .agg(**{out_column: (distinct_column, "size")})
        )

    partials = bucketed_groups(
        ds.map_batches(pair_partial, batch_format="pandas"),
        key_columns + [distinct_column],
        bucket_count,
        approx_rows=approx_rows,
    )
    return combine_partials(partials, key_columns, {out_column: "sum"})


def exact_quantile_continuous(
    ds,
    column: str,
    qs: tuple = (0.5,),
    *,
    bracket_eps: float = 0.02,
    max_bracket_rows: int = 2_000_000,
):
    """EXACT ``quantile_disc`` over a CONTINUOUS column (unbounded distinct
    values — the case the distinct-value-counts path must refuse) via
    sketch-guided selection, two passes:

    1. a t-digest pass brackets each target rank: per-batch digests merge
       on the driver, and ``[q − eps, q + eps]`` quantiles of the sketch
       give value brackets guaranteed-to-contain each exact answer far
       tighter than the data range;
    2. one counting pass takes, per bracket, the row count BELOW it and
       the actual values INSIDE it (expected ``2·eps`` of the data —
       KB-sized; guarded by ``max_bracket_rows``). The exact rank then
       resolves by sorting the in-bracket values only.

    Returns a DataFrame (q, value) matching SQL ``quantile_disc`` (first
    value whose cumulative count reaches ``ceil(q·n)``). Nulls ignored,
    like SQL."""
    import pickle

    import numpy as np

    from .sketches import TDigest

    def digest_batch(df: pd.DataFrame) -> pd.DataFrame:
        td = TDigest()
        td.add_array(df[column].to_numpy(dtype=np.float64))
        return pd.DataFrame({"blob": [pickle.dumps(td)]})

    merged = None
    for row in ds.map_batches(
        digest_batch, batch_format="pandas"
    ).iter_rows():
        td = pickle.loads(row["blob"])
        merged = td if merged is None else merged.merge(td)
    if merged is not None:
        merged._compress()  # the digest buffers lazily; means may be empty
    if merged is None or len(merged.means) == 0:
        return pd.DataFrame({"q": list(qs), "value": [float("nan")] * len(qs)})

    brackets = [
        (
            merged.quantile(max(0.0, q - bracket_eps)),
            merged.quantile(min(1.0, q + bracket_eps)),
        )
        for q in qs
    ]
    lo = np.array([b[0] for b in brackets])
    hi = np.array([b[1] for b in brackets])

    def count_and_collect(df: pd.DataFrame) -> pd.DataFrame:
        x = df[column].to_numpy(dtype=np.float64)
        x = x[~np.isnan(x)]
        rows = []
        for i in range(len(lo)):
            inside = x[(x >= lo[i]) & (x <= hi[i])]
            rows.append(
                {
                    "bi": i,
                    "n_below": int((x < lo[i]).sum()),
                    "n_total": len(x),
                    "inside": inside.tobytes(),
                }
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(
        count_and_collect, batch_format="pandas"
    ).to_pandas()
    out_q, out_v = [], []
    for i, q in enumerate(qs):
        g = parts[parts.bi == i]
        n = int(g["n_total"].sum())
        n_below = int(g["n_below"].sum())
        inside = np.sort(
            np.concatenate(
                [np.frombuffer(b, dtype=np.float64) for b in g["inside"]]
            )
        )
        if len(inside) > max_bracket_rows:
            raise ValueError(
                "exact_quantile_continuous: bracket holds "
                f"{len(inside)} rows — widen delta or tighten bracket_eps"
            )
        # quantile_disc: first value whose cumulative count >= q·n (the
        # engine-wide convention, verified against DuckDB)
        target = q * n
        rank = max(0, int(np.ceil(target)) - 1)  # 0-based global rank
        local = rank - n_below
        if local < 0 or local >= len(inside):
            raise ValueError(
                "exact_quantile_continuous: sketch bracket missed the "
                f"target rank for q={q} — raise bracket_eps"
            )
        out_q.append(q)
        out_v.append(float(inside[local]))
    return pd.DataFrame({"q": out_q, "value": out_v})


def robust_outliers(
    ds,
    key_column: str,
    value_column: str,
    *,
    threshold: float = 3.0,
    passthrough_columns: list | None = None,
):
    """Per-group robust outlier detection: flag rows where
    ``|value − median(group)| > threshold × MAD(group)`` (MAD = median of
    absolute deviations, the standard robust z-score constraint check —
    mean/σ would let the outliers poison their own fence).

    Three streamed passes, no payload exchange: group medians via
    :func:`grouped_quantiles` (distributed value counts — the bounded
    per-group-distinct contract; swap a per-group sketch-guided selection
    in for unbounded continuous columns), a second value-counts pass over
    the deviations for the MADs, then a broadcast (group → median, mad)
    filter pass emitting only the outlier rows. All arithmetic is IEEE
    double on both engine and SQL sides, so the comparison is
    hash-exact."""
    import numpy as np

    med_df = grouped_quantiles(
        ds, key_column, value_column, (0.5,)
    ).to_pandas()
    med_map = dict(zip(med_df[key_column], med_df["value"]))

    def add_dev(df: pd.DataFrame) -> pd.DataFrame:
        med = df[key_column].map(med_map).to_numpy(dtype=np.float64)
        out = df[[key_column]].copy()
        out["__dev"] = np.abs(
            df[value_column].to_numpy(dtype=np.float64) - med
        )
        return out

    mad_df = grouped_quantiles(
        ds.map_batches(add_dev, batch_format="pandas"),
        key_column, "__dev", (0.5,),
    ).to_pandas()
    mad_map = dict(zip(mad_df[key_column], mad_df["value"]))

    cols = passthrough_columns or []

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        med = df[key_column].map(med_map).to_numpy(dtype=np.float64)
        mad = df[key_column].map(mad_map).to_numpy(dtype=np.float64)
        dev = np.abs(df[value_column].to_numpy(dtype=np.float64) - med)
        keep = dev > threshold * mad
        out = df.loc[keep, cols + [key_column, value_column]].copy()
        out["group_median"] = med[keep]
        out["group_mad"] = mad[keep]
        return out

    return ds.map_batches(flag, batch_format="pandas")
