"""Parquet file-level entry points (A4/S1-S3 parity).

Mirrors the reference's non-Polars batch API
(polars-genson-py/src/parquet_io.rs:32-295, genson-core/src/parquet.rs):
  - ``infer_from_parquet``: read one string column (nulls skipped) → infer
  - ``normalise_from_parquet``: infer Avro → normalise → write a one-column
    parquet embedding ``genson_avro_schema`` + ``genson_normalise_config``
    in the file-level key-value metadata (parquet_io.rs:261-273)
  - ``read_parquet_metadata``: file-level KV metadata as a dict

Single-file, driver-side helpers; the Ray-distributed equivalents live in
``stages.infer`` / the normalise stage, where schema/lineage metadata goes
to sidecar manifests (Ray writers don't expose per-file KV metadata).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from ..api import _build_config, normalise_rows
from ..core import infer_json_schema_from_strings
from ..core.infer import SchemaInferenceResult


def read_string_column(path: str, column: str, *, ndjson_split: bool = False) -> list[str]:
    """One Utf8/LargeUtf8 column → list of strings, nulls skipped
    (genson-core/src/parquet.rs:27-115)."""
    available = pq.read_schema(path).names
    if column not in available:
        raise ValueError(
            f"Column {column!r} not found in {path} (has: {available})"
        )
    table = pq.read_table(path, columns=[column])
    typ = table.schema.field(column).type
    if not (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
        raise ValueError(f"Column {column!r} is not a string column (got {typ})")
    values = [v for v in table[column].to_pylist() if v is not None]
    if ndjson_split:
        out = []
        for v in values:
            out.extend(line for line in v.splitlines() if line.strip())
        return out
    return values


def infer_from_parquet(
    path: str, column: str, *, ndjson: bool = False, **kwargs
) -> SchemaInferenceResult:
    strings = read_string_column(path, column, ndjson_split=ndjson)
    if not strings:
        raise ValueError("No valid JSON strings found in column")
    kwargs.pop("merge_schemas", None)
    config = _build_config(ndjson=False, **kwargs)
    return infer_json_schema_from_strings(strings, config)


def normalise_from_parquet(
    input_path: str,
    column: str,
    output_path: str,
    *,
    output_column: str | None = None,
    ndjson: bool = False,
    empty_as_null: bool = True,
    coerce_strings: bool = False,
    map_encoding: str = "mapping",
    **kwargs,
) -> SchemaInferenceResult:
    """Infer (Avro) + normalise + write, embedding schema metadata."""
    strings = read_string_column(input_path, column, ndjson_split=ndjson)
    if not strings:
        raise ValueError("No valid JSON strings found in column")
    kwargs["avro"] = True
    config = _build_config(ndjson=False, **kwargs)
    result = infer_json_schema_from_strings(strings, config)
    normalised = normalise_rows(
        strings,
        result.schema,
        empty_as_null=empty_as_null,
        coerce_strings=coerce_strings,
        map_encoding=map_encoding,
        wrap_root=config.wrap_root,
    )
    col_name = output_column or column
    norm_config = {
        "empty_as_null": empty_as_null,
        "coerce_string": coerce_strings,
        "map_encoding": map_encoding,
        "wrap_root": config.wrap_root,
    }
    metadata = {
        "genson_avro_schema": json.dumps(result.schema),
        "genson_normalise_config": json.dumps(norm_config),
    }
    write_string_column(output_path, col_name, normalised, metadata)
    return result


def write_string_column(
    path: str, column_name: str, strings: list[str], metadata: dict | None = None
) -> None:
    """One-column parquet with optional file-level KV metadata; switches to
    LargeUtf8 when total bytes exceed i32 range (parquet.rs:126-188)."""
    total = sum(len(s) for s in strings)
    typ = pa.large_string() if total > 2**31 - 1 else pa.string()
    table = pa.table({column_name: pa.array(strings, typ)})
    if metadata:
        table = table.replace_schema_metadata(
            {**(table.schema.metadata or {}), **{k: v for k, v in metadata.items()}}
        )
    pq.write_table(table, path)


def read_parquet_metadata(path: str) -> dict[str, str]:
    """File-level KV metadata map (parquet.rs:190-199)."""
    meta = pq.read_schema(path).metadata or {}
    return {
        k.decode() if isinstance(k, bytes) else k: v.decode() if isinstance(v, bytes) else v
        for k, v in meta.items()
    }
