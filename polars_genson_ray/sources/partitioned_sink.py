"""Resumable partitioned parquet sink.

At 100 TB the output layout IS the resume story: one directory per
partition value (hive-style ``col=value/``), a ``_SUCCESS`` marker per
completed partition, and a writer that SKIPS already-successful
partitions — so a failed run re-processes only what it didn't finish,
and never appends duplicate rows to a partition it did. (The flagship
validation pipeline has a fragment-grained version of this baked in at
``pipelines/validation.py``; this is the generic column-partitioned
variant for plain datasets.)

Two-phase commit per partition, in one pass over the input:
  1. partition dirs WITHOUT a marker (leftovers of a crashed run) are
     deleted up front — rewriting on top of them would duplicate rows;
  2. rows of marker-complete partitions are filtered out per batch
     (vectorized isin) so nothing ships for finished partitions;
  3. after the write completes, every unmarked partition dir gets its
     ``_SUCCESS`` marker.
"""

from __future__ import annotations

import os
import shutil


def write_partitioned(
    ds,
    out_dir: str,
    partition_col: str,
    *,
    skip_existing: bool = True,
) -> dict:
    """Write ``ds`` as hive-partitioned parquet under ``out_dir`` with a
    ``_SUCCESS`` marker per partition directory; marker-complete
    partitions are skipped when ``skip_existing`` (resume). Returns
    ``{"written": [...], "skipped": [...]}`` partition values.

    Partition values must be scalar and path-safe (str/int). Only the
    distinct partition-value set is ever driver-side, never the rows.
    """
    os.makedirs(out_dir, exist_ok=True)
    prefix = f"{partition_col}="
    done: set = set()
    for name in os.listdir(out_dir):
        if not name.startswith(prefix):
            continue
        if os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            if skip_existing:
                done.add(name[len(prefix):])
        else:
            # crashed-run leftover: rewriting on top would duplicate rows
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)

    if done:

        def drop_done(df):
            return df[~df[partition_col].astype(str).isin(done)]

        ds = ds.map_batches(drop_done, batch_format="pandas")

    ds.write_parquet(out_dir, partition_cols=[partition_col])

    written = []
    for name in os.listdir(out_dir):
        if name.startswith(prefix) and not os.path.exists(
            os.path.join(out_dir, name, "_SUCCESS")
        ):
            with open(os.path.join(out_dir, name, "_SUCCESS"), "w") as fh:
                fh.write("ok")
            written.append(name[len(prefix):])
    return {"written": sorted(written), "skipped": sorted(done)}
