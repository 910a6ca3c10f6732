"""End-to-end schema + constraint validation over an image+caption table.

The flagship pipeline (BASELINE.json north_star):

  read_parquet(pending fragments, include_paths)
    → actor-pool DecodeValidator (pixel invariants; bytes dropped in-stage)
    → + vectorized caption JSON validity column
    → annotated parquet sink (resumable, one dir per run)
    → per-fragment pass/fail report  (pre-aggregated per batch → tiny groupby)
  read(caption column only) → distributed genson schema inference
  read(stats columns only)  → sketch partials → merged stats + drift

All three passes prune columns at the read, stream with backpressure, and
reduce to KB-sized results; nothing materializes the full table. Fragment
completion is journaled through ``CheckpointStore`` so a rerun revalidates
only pending fragments.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data as rd

from ..core import SchemaInferenceConfig
from ..stages.image import DecodeValidator
from ..stages.infer import infer_schema_distributed
from ..stages.stats import ColumnStatsPartial, merge_stats_partials, summarize_stats
from ..state.checkpoint import CheckpointStore


def _caption_validity(batch: pa.Table) -> pa.Table:
    """Vectorized-per-batch caption check: JSON parse validity flag (plain
    text captions are allowed and flagged as non-JSON, not violations)."""
    texts = batch["caption"].to_pylist()
    is_json = []
    for t in texts:
        if t is None:
            is_json.append(False)
            continue
        t = t.strip()
        if t.startswith("{") or t.startswith("["):
            try:
                json.loads(t)
                is_json.append(True)
            except ValueError:
                is_json.append(False)
        else:
            is_json.append(False)
    return batch.append_column("caption_is_json", pa.array(is_json, pa.bool_()))


@dataclass
class ValidationConfig:
    psnr_threshold: float = 40.0
    schema_config: SchemaInferenceConfig = field(
        default_factory=lambda: SchemaInferenceConfig(map_threshold=4, unify_maps=True)
    )
    decode_concurrency: int | tuple | None = None  # None → sized to cluster
    decode_batch_size: int = 512
    max_side: int = 4096  # histogram range for w/h drift


@dataclass
class ValidationReport:
    rows: int
    fragments: list
    fragment_reports: dict
    violation_counts: dict
    schema: dict
    processed_docs: int
    stats: dict
    drift: dict
    duplicate_image_ids: list
    hot_phash_buckets: list
    output_dir: str

    def passed(self) -> bool:
        return all(r["violations"] == 0 for r in self.fragment_reports.values()) and not self.duplicate_image_ids


def run_validation(
    input_paths,
    output_dir: str,
    checkpoint_dir: str | None = None,
    config: ValidationConfig | None = None,
    *,
    resume: bool = True,
) -> ValidationReport:
    from ..functions.context import tune_for_cluster

    tune_for_cluster()
    config = config or ValidationConfig()
    if isinstance(input_paths, str):
        import glob

        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    store = CheckpointStore(checkpoint_dir or os.path.join(output_dir, "_checkpoint"))
    pending = [p for p in input_paths if not (resume and store.is_done(p))]
    completed = {p: store.load(p) for p in input_paths if p not in pending}

    fragment_reports = {p: dict(rec["report"]) for p, rec in completed.items() if rec}
    violation_counts: dict[str, int] = {}
    for rec in completed.values():
        if rec:
            for k, v in rec.get("violation_kinds", {}).items():
                violation_counts[k] = violation_counts.get(k, 0) + v

    annotated_dir = os.path.join(output_dir, "annotated")
    if pending:
        concurrency = config.decode_concurrency
        if concurrency is None:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
            # actor pool sized to ~half the cluster so read/write/report
            # stages don't starve (ray_guide "Stateful stages")
            concurrency = (2, max(2, cpus // 2))
        ds = rd.read_parquet(pending, include_paths=True)
        annotated = ds.map_batches(
            DecodeValidator,  # callable class → actor pool
            fn_constructor_kwargs={"psnr_threshold": config.psnr_threshold},
            batch_format="pyarrow",
            batch_size=config.decode_batch_size,
            concurrency=concurrency,
        ).map_batches(_caption_validity, batch_format="pyarrow")
        # single consumption: write the annotated table partitioned per run
        annotated.write_parquet(annotated_dir)

        # per-fragment report + violation-kind counts: ONE pruned read-back,
        # pre-aggregated per batch to (path, kind) rows, one small groupby
        ann = rd.read_parquet(
            annotated_dir, columns=["path", "violation", "caption_is_json"]
        )

        def _report_partial(batch: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame(
                {
                    "path": batch["path"].to_pylist(),
                    "kind": [
                        v.split(":")[0] if v else ""
                        for v in batch["violation"].to_pylist()
                    ],
                    "jsoncap": batch["caption_is_json"]
                    .to_numpy(zero_copy_only=False)
                    .astype("int64"),
                }
            )
            g = df.groupby(["path", "kind"], as_index=False).agg(
                n=("jsoncap", "size"), json_captions=("jsoncap", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        report_rows = (
            ann.map_batches(_report_partial, batch_format="pyarrow")
            .groupby(["path", "kind"])
            .aggregate(
                Sum("n", alias_name="n"),
                Sum("json_captions", alias_name="json_captions"),
            )
            .take_all()
        )
        for row in report_rows:
            rep = fragment_reports.setdefault(
                row["path"],
                {"rows": 0, "violations": 0, "json_captions": 0, "pass": True},
            )
            n = int(row["n"])
            rep["rows"] += n
            rep["json_captions"] += int(row["json_captions"])
            if row["kind"]:
                rep["violations"] += n
                rep["pass"] = False
                violation_counts[row["kind"]] = (
                    violation_counts.get(row["kind"], 0) + n
                )

    # --- ONE fused measurement pass (pruned read): caption schema partials
    # + column stats + drift histograms + HLL + hot-key candidates, all as
    # mergeable per-batch partials → a single tiny reduce ---
    from ..stages.infer import SchemaPartialBatch, reduce_partials

    stats_fn = ColumnStatsPartial(
        numeric=("w", "h"),
        distinct=("image_id", "phash"),
        hist={"w": (0, config.max_side, 64), "h": (0, config.max_side, 64)},
        path_hist=("w", 0, config.max_side, 64),
        heavy_hitters={"phash": 32},
    )
    schema_fn = SchemaPartialBatch("caption", config.schema_config)

    def _measure_partial(batch: pa.Table) -> pa.Table:
        stats_row = stats_fn(batch)
        schema_row = schema_fn(batch)
        out = stats_row
        for name in schema_row.column_names:
            out = out.append_column(name, schema_row[name])
        return out

    measure_ds = rd.read_parquet(
        input_paths,
        columns=["caption", "image_id", "w", "h", "phash"],
        include_paths=True,
    )
    partial_rows = measure_ds.map_batches(
        _measure_partial, batch_format="pyarrow", batch_size=8192
    ).take_all()
    result = reduce_partials(partial_rows, config.schema_config)
    stats_total = merge_stats_partials(partial_rows)
    stats = summarize_stats(stats_total)

    # drift: per-fragment w histogram vs global (KS + PSI) from the same pass
    global_hist = stats_total["hists"].get("w")
    drift = {}
    if global_hist is not None and len(input_paths) > 1:
        for path, frag_hist in stats_total["path_hists"].items():
            drift[path] = {
                "ks_w": global_hist.ks(frag_hist),
                "psi_w": global_hist.psi(frag_hist),
            }

    # exact duplicate image ids: bucketed shuffle (coarse key → few Ray
    # groups) with vectorized per-bucket value counts; only ids cross the
    # shuffle. HLL cardinality estimate (no shuffle) is in `stats`.
    import pandas as pd
    import zlib

    def _add_id_bucket(batch: pa.Table) -> pa.Table:
        buckets = [
            zlib.crc32(i.encode()) & 127 for i in batch["image_id"].to_pylist()
        ]
        return batch.append_column("__bucket", pa.array(buckets, pa.int32()))

    def _bucket_dups(group: pd.DataFrame) -> pd.DataFrame:
        vc = group["image_id"].value_counts()
        d = vc[vc > 1]
        return pd.DataFrame({"image_id": d.index, "n": d.to_numpy()})

    dup_rows = (
        rd.read_parquet(input_paths, columns=["image_id"])
        .map_batches(_add_id_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_bucket_dups, batch_format="pandas")
        .take_all()
    )
    duplicate_ids = sorted(r["image_id"] for r in dup_rows)

    # hot phash buckets (skew detection) — from the fused pass's
    # heavy-hitter partials, no extra read or shuffle
    hh = stats_total.get("heavy_hitters", {}).get("phash", {})
    hot_buckets = [
        {"phash": int(k), "n": int(n)}
        for k, n in sorted(hh.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    ]

    # --- lineage records ---
    schema_digest = _digest(json.dumps(result.schema, sort_keys=True))
    for p in pending:
        rep = fragment_reports.get(p, {"rows": 0, "violations": 0, "pass": True})
        store.record(
            p,
            {
                "status": "done",
                "report": rep,
                "schema_digest": schema_digest,
                "stats_snapshot": {
                    "rows": stats["rows"],
                    "w_q50": stats["quantiles"].get("w", {}).get("0.5"),
                },
                "violation_kinds": {},
            },
        )

    return ValidationReport(
        rows=stats["rows"],
        fragments=list(input_paths),
        fragment_reports=fragment_reports,
        violation_counts=violation_counts,
        schema=result.schema,
        processed_docs=result.processed_count,
        stats=stats,
        drift=drift,
        duplicate_image_ids=duplicate_ids,
        hot_phash_buckets=hot_buckets,
        output_dir=output_dir,
    )


def _digest(s: str) -> str:
    import hashlib

    return hashlib.sha256(s.encode()).hexdigest()[:16]
