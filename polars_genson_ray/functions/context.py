"""Execution-context tuning for the engine's pipelines.

Ray Data's defaults target real clusters (e.g. ``min_parallelism=200``
shuffle partitions). On a small local session those 200 near-empty reduce
tasks dominate wall time (measured: a 20k-row groupby went 29s → 6s by
sizing partitions to the CPU count). ``tune_for_cluster`` scales the
shuffle partition count to the actual cluster size — on a 256-node cluster
it keeps large values; in local mode it right-sizes them.
"""

from __future__ import annotations

import ray
from ray.data.context import DataContext


def tune_for_cluster() -> DataContext:
    ctx = DataContext.get_current()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    # 2 shuffle partitions per core, never below 16; real clusters with
    # hundreds of cores keep (and exceed) Ray's default of 200.
    ctx.min_parallelism = max(16, cpus * 2)
    return ctx


def strip_schema_metadata(batch):
    """Drop file-level schema metadata (the parquet ``pandas`` blob) from a
    batch. pyarrow (≥16) schemas whose metadata holds that blob are
    unhashable, which knocks every downstream block-concat in a shuffle off
    Ray's fast schema-dedup path into full schema unification. Zero-copy;
    fuses with the read task."""
    return batch.replace_schema_metadata(None)


def read_parallelism(parquet_path: str, *, rows_per_block: int = 32768) -> int:
    """Target block count for a parquet file whose row-group layout is too
    coarse to parallelize (the driver's testdata is one row group per file —
    a single Ray block — which serializes every downstream stage).

    Returns 1 when the file's native row groups already provide enough
    parallelism (then no repartition is needed; at 100 TB inputs always do).
    """
    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(parquet_path).metadata
    except Exception:
        return 1
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    want = min(cpus * 2, max(1, meta.num_rows // rows_per_block))
    if meta.num_row_groups >= max(1, want // 2):
        return 1
    return want
