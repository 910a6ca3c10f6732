"""Per-block column-stats partials for the validation pipeline.

One ``map_batches`` pass emits a single serialized partial row per batch:
t-digest sketches for numeric columns, HyperLogLog for id/hash columns,
fixed-bin histograms (drift), null/min/max/count accumulators. Partials
merge associatively on the driver (or in a tiny second stage), so no row
ever shuffles for stats (SURVEY.md §2.7 "Aggregations").
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import Histogram, HyperLogLog, TDigest, hash64, hash_strings


class ColumnStatsPartial:
    """Emit one pickled ``dict`` partial per batch.

    config:
      numeric: columns → t-digest + min/max/null count
      distinct: columns → HLL (string or integer)
      hist: {column: (lo, hi, bins)} → histogram for drift
    """

    def __init__(self, numeric=(), distinct=(), hist=None, path_hist=None,
                 heavy_hitters=None):
        self.numeric = tuple(numeric)
        self.distinct = tuple(distinct)
        self.hist = dict(hist or {})
        # path_hist: (column, lo, hi, bins) → per-"path" histograms for
        # per-fragment drift, computed in the same pass (no extra reads)
        self.path_hist = path_hist
        # heavy_hitters: {column: candidates_per_batch} → per-batch top
        # counts (mergeable heavy-hitter partials, no shuffle)
        self.heavy_hitters = dict(heavy_hitters or {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "stats_partial": pa.array(
                    [pickle.dumps(self.compute(batch))], pa.large_binary()
                )
            }
        )

    def compute(self, batch: pa.Table) -> dict:
        """The partial as a plain dict (for callers fusing several partials
        into one pass)."""
        partial: dict = {"rows": batch.num_rows, "null_counts": {}, "digests": {},
                         "hlls": {}, "hists": {}, "mins": {}, "maxs": {},
                         "path_hists": {}}
        if self.path_hist is not None and "path" in batch.column_names:
            col, lo, hi, bins = self.path_hist
            import pandas as pd

            df = pd.DataFrame(
                {"path": batch["path"].to_pylist(),
                 col: batch[col].to_numpy(zero_copy_only=False)}
            )
            for path, grp in df.groupby("path"):
                h = Histogram(lo, hi, bins)
                h.add_array(grp[col].to_numpy())
                partial["path_hists"][path] = h.to_bytes()
        for col in self.numeric:
            arr = batch[col]
            partial["null_counts"][col] = arr.null_count
            vals = arr.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            td = TDigest()
            td.add_array(vals)
            partial["digests"][col] = td.to_bytes()
            if len(vals):
                partial["mins"][col] = float(vals.min())
                partial["maxs"][col] = float(vals.max())
        for col in self.distinct:
            arr = batch[col]
            hll = HyperLogLog()
            if pa.types.is_integer(arr.type):
                vals = arr.drop_null().to_numpy(zero_copy_only=False)
                hll.add_hashes(hash64(vals.astype(np.uint64)))
            else:
                hll.add_hashes(hash_strings(arr.drop_null().to_pylist()))
            partial["hlls"][col] = hll.to_bytes()
        for col, (lo, hi, bins) in self.hist.items():
            h = Histogram(lo, hi, bins)
            h.add_array(batch[col].drop_null().to_numpy(zero_copy_only=False))
            partial["hists"][col] = h.to_bytes()
        if self.heavy_hitters:
            import pandas as pd

            partial["heavy_hitters"] = {}
            for col, k in self.heavy_hitters.items():
                vc = pd.Series(batch[col].to_pylist()).value_counts().head(k)
                partial["heavy_hitters"][col] = dict(
                    zip(vc.index.to_list(), vc.to_numpy().astype(int).tolist())
                )
        return partial


def new_stats_total() -> dict:
    return {"rows": 0, "null_counts": {}, "digests": {}, "hlls": {},
            "hists": {}, "mins": {}, "maxs": {}, "path_hists": {}}


def merge_stats_partials(rows, total: dict | None = None) -> dict:
    """Driver-side associative merge of partials → final stats dict.
    Accepts either take_all rows bearing a pickled ``stats_partial`` column
    or plain partial dicts; pass ``total`` to merge incrementally (e.g.
    while partial rows are still streaming in)."""
    total = total if total is not None else new_stats_total()
    for row in rows:
        p = row if isinstance(row, dict) and "stats_partial" not in row else pickle.loads(row["stats_partial"])
        total["rows"] += p["rows"]
        for col, n in p["null_counts"].items():
            total["null_counts"][col] = total["null_counts"].get(col, 0) + n
        for col, blob in p["digests"].items():
            td = TDigest.from_bytes(blob)
            if col in total["digests"]:
                total["digests"][col] = total["digests"][col].merge(td)
            else:
                total["digests"][col] = td
        for col, blob in p["hlls"].items():
            hll = HyperLogLog.from_bytes(blob)
            if col in total["hlls"]:
                total["hlls"][col] = total["hlls"][col].merge(hll)
            else:
                total["hlls"][col] = hll
        for col, blob in p["hists"].items():
            h = Histogram.from_bytes(blob)
            if col in total["hists"]:
                total["hists"][col] = total["hists"][col].merge(h)
            else:
                total["hists"][col] = h
        for col, counts in p.get("heavy_hitters", {}).items():
            agg = total.setdefault("heavy_hitters", {}).setdefault(col, {})
            for k, n in counts.items():
                agg[k] = agg.get(k, 0) + n
        for path, blob in p.get("path_hists", {}).items():
            h = Histogram.from_bytes(blob)
            if path in total["path_hists"]:
                total["path_hists"][path] = total["path_hists"][path].merge(h)
            else:
                total["path_hists"][path] = h
        for col, v in p["mins"].items():
            total["mins"][col] = min(total["mins"].get(col, v), v)
        for col, v in p["maxs"].items():
            total["maxs"][col] = max(total["maxs"].get(col, v), v)
    return total


def summarize_stats(total: dict, quantiles=(0.25, 0.5, 0.75, 0.9, 0.99)) -> dict:
    """Small JSON-friendly summary of merged stats."""
    out = {
        "rows": total["rows"],
        "null_counts": dict(total["null_counts"]),
        "min": dict(total["mins"]),
        "max": dict(total["maxs"]),
        "quantiles": {
            col: {str(q): td.quantile(q) for q in quantiles}
            for col, td in total["digests"].items()
        },
        "distinct_estimates": {
            col: int(hll.estimate()) for col, hll in total["hlls"].items()
        },
    }
    return out
