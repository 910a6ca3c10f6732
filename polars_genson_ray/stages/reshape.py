"""Relational reshape operators: schema-evolution union and unpivot/melt.

Both are pure per-batch map transforms — zero shuffle, streaming-friendly
at any scale (the 100-TB posture is free here: no state, no exchange).

``union_by_name`` fills the gap Ray's ``Dataset.union`` leaves: Ray
unions by POSITION and errors (or worse, silently misaligns pandas vs
arrow blocks) when inputs have different column sets/orders — exactly
what schema evolution across parquet generations produces. This aligns
every input to the unified schema first (missing columns become typed
nulls), so downstream operators see ONE stable schema.

``unpivot`` is the melt counterpart of the pivot in
``pipelines.queries.q_events_hour_pivot``: wide measure columns →
(variable, value) rows, vectorized via numpy tile/repeat per batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray.data as rd


def union_by_name(datasets: Sequence["rd.Dataset"]) -> "rd.Dataset":
    """Union datasets BY COLUMN NAME (schema-evolution concat).

    The unified schema is ``pyarrow.unify_schemas`` over the inputs'
    schemas (permissive promotion, so int32/int64 or null-typed columns
    reconcile); each input is aligned per batch — missing columns filled
    with typed nulls, present columns cast — then the aligned datasets
    union. Raises on truly incompatible duplicate column types.

    NB: ``ds.schema()`` is footer-derived (free) for plain reads; for
    map-derived inputs Ray may execute a limit-1 probe per dataset to
    learn it — declare schemas upstream (the hash_join convention) if a
    caller unions hot map outputs."""
    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    schemas = []
    for ds in datasets:
        s = ds.schema()
        schemas.append(
            s.base_schema if hasattr(s, "base_schema") else s
        )
    unified = pa.unify_schemas(schemas, promote_options="permissive")
    unified = pa.schema(
        [unified.field(i) for i in range(len(unified))]
    ).remove_metadata()

    def align(batch: pa.Table) -> pa.Table:
        cols = []
        n = batch.num_rows
        for f in unified:
            if f.name in batch.column_names:
                cols.append(batch[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.table(cols, schema=unified)

    aligned = [
        ds.map_batches(align, batch_format="pyarrow") for ds in datasets
    ]
    out = aligned[0]
    if len(aligned) > 1:
        out = out.union(*aligned[1:])
    return out


def unpivot(
    ds: "rd.Dataset",
    *,
    id_columns: Sequence[str],
    value_columns: Sequence[str],
    variable_column: str = "variable",
    value_type: Optional[pa.DataType] = None,
    value_column: str = "value",
) -> "rd.Dataset":
    """Melt ``value_columns`` into (variable, value) rows.

    Output: ``id_columns`` + ``variable_column`` (the source column name)
    + ``value_column``; one output row per input row per value column,
    ordered value-column-major within a batch (matches the UNION ALL
    formulation SQL oracles use). ``value_type`` defaults to the unified
    (permissively promoted) type of the value columns."""
    id_columns = list(id_columns)
    value_columns = list(value_columns)
    if not value_columns:
        raise ValueError("unpivot needs at least one value column")

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        m = len(value_columns)
        vt = value_type
        if vt is None:
            vt = pa.unify_schemas(
                [
                    pa.schema([pa.field("v", batch[c].type)])
                    for c in value_columns
                ],
                promote_options="permissive",
            ).field(0).type
        cols = []
        names = []
        for c in id_columns:
            # value-column-major: each id column tiles m times
            arr = batch[c].combine_chunks()
            cols.append(pa.concat_arrays([arr] * m) if m > 1 else arr)
            names.append(c)
        var = pa.array(
            np.repeat(np.arange(m), n), pa.int32()
        )
        cols.append(
            pa.DictionaryArray.from_arrays(
                var, pa.array(value_columns, pa.string())
            ).cast(pa.string())
        )
        names.append(variable_column)
        cols.append(
            pa.concat_arrays(
                [batch[c].combine_chunks().cast(vt) for c in value_columns]
            )
        )
        names.append(value_column)
        return pa.table(cols, names=names)

    return ds.map_batches(melt, batch_format="pyarrow")
