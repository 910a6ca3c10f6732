"""Execution-context tuning for the engine's pipelines.

Ray Data's defaults target real clusters (e.g. ``min_parallelism=200``
shuffle partitions). On a small local session those 200 near-empty reduce
tasks dominate wall time (measured: a 20k-row groupby went 29s → 6s by
sizing partitions to the CPU count). ``tune_for_cluster`` scales the
shuffle partition count to the actual cluster size — on a 256-node cluster
it keeps large values; in local mode it right-sizes them.
"""

from __future__ import annotations

import os

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


def default_pool_size(fraction: float = 0.5, minimum: int = 2) -> int:
    """Actor-pool size for a stateful ``map_batches`` stage: a fraction of
    the cluster (so concurrent stages in the same pipeline still get slots),
    never below ``minimum``. A hard-coded pool of 2 left 30 of 32 CPUs idle
    in the normalise pass."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(minimum, int(cpus * fraction))


def strip_schema_metadata(batch):
    """Drop file-level schema metadata (the parquet ``pandas`` blob) from a
    batch. pyarrow (≥16) schemas whose metadata holds that blob are
    unhashable, which knocks every downstream block-concat in a shuffle off
    Ray's fast schema-dedup path into full schema unification. Zero-copy;
    fuses with the read task."""
    return batch.replace_schema_metadata(None)


_SHARD_CACHE_ROOT = "/tmp/pgr_shard_cache"


def maybe_reshard(parquet_path: str, *, min_rows: int = 65536,
                  target_fragments: int = 32) -> str:
    """Return a parallel-readable path for a parquet input.

    A single-file, single-row-group table can only be read by ONE Ray task
    (a row group is the decompression unit), which serializes the scan for
    every downstream stage — measured 2.4 s before any compute started on a
    100k-row column. Large such files are re-written ONCE into a cached
    multi-fragment directory (same rows, same schema, no metadata blob);
    subsequent reads fan out across fragments. Small or already-multi-row-
    group inputs are returned unchanged. At 100 TB inputs arrive as many
    fragments and this is a no-op — it exists for toy single-file layouts.
    """
    import hashlib

    import pyarrow.parquet as pq

    try:
        meta = pq.ParquetFile(parquet_path).metadata
    except Exception:
        return parquet_path
    if meta.num_rows < min_rows or meta.num_row_groups >= target_fragments // 2:
        return parquet_path
    st = os.stat(parquet_path)
    key = hashlib.sha256(
        f"{parquet_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    dest = os.path.join(_SHARD_CACHE_ROOT, key)
    marker = os.path.join(dest, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(dest, exist_ok=True)
        tbl = pq.read_table(parquet_path)
        tbl = tbl.replace_schema_metadata(None)
        n = tbl.num_rows
        frags = min(target_fragments, max(1, n // 8192))
        per = n // frags + (1 if n % frags else 0)
        for f in range(frags):
            chunk = tbl.slice(f * per, per)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(dest, f"part-{f:05d}.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok")
    return dest


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
