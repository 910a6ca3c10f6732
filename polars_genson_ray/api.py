"""Column-level API mirroring the reference's Python surface.

These functions take a sequence of JSON strings (one column's worth, or one
batch's worth inside a Ray task) and mirror the keyword surface of
``df.genson.infer_json_schema`` / ``normalise_json``
(polars-genson-py/python/polars_genson/__init__.py:918-1217 and the plugin
expressions at polars-genson-py/src/expressions.rs:157-541).

Null and blank rows are skipped for inference, like the plugin
(expressions.rs:170-176); normalisation preserves row count, mapping
null/invalid rows through JSON ``null`` (expressions.rs:526-535).
"""

from __future__ import annotations

import json

from .core import (
    NormaliseConfig,
    SchemaInferenceConfig,
    infer_json_schema_from_strings,
    normalise_values,
)
from .core.config import MAP_ENCODING_KV

_DEFAULT_URI = "http://json-schema.org/schema#"


def _build_config(
    *,
    ignore_outer_array=True,
    ndjson=False,
    schema_uri=_DEFAULT_URI,
    map_threshold=20,
    map_max_required_keys=None,
    unify_maps=False,
    no_unify=None,
    force_field_types=None,
    force_parent_field_types=None,
    force_scalar_promotion=None,
    wrap_scalars=True,
    avro=False,
    wrap_root=None,
    no_root_map=True,
    max_builders=None,
    debug=False,
    profile=False,
    verbosity="normal",
) -> SchemaInferenceConfig:
    return SchemaInferenceConfig(
        ignore_outer_array=ignore_outer_array,
        delimiter="\n" if ndjson else None,
        schema_uri=schema_uri,
        map_threshold=map_threshold,
        map_max_required_keys=map_max_required_keys,
        unify_maps=unify_maps,
        no_unify=frozenset(no_unify or ()),
        force_field_types=dict(force_field_types or {}),
        force_parent_field_types=dict(force_parent_field_types or {}),
        force_scalar_promotion=frozenset(force_scalar_promotion or ()),
        wrap_scalars=wrap_scalars,
        avro=avro,
        wrap_root=wrap_root,
        no_root_map=no_root_map,
        max_builders=max_builders,
        debug=debug,
        profile=profile,
        verbosity=verbosity,
    )


def _clean_strings(json_strings) -> list[str]:
    return [s for s in json_strings if isinstance(s, str) and s.strip()]


def infer_json_schema(json_strings, *, merge_schemas: bool = True, **kwargs):
    """Infer a JSON Schema (or one per row with ``merge_schemas=False``)."""
    cleaned = _clean_strings(json_strings)
    if not cleaned:
        raise ValueError("No valid JSON strings found in column")
    config = _build_config(**kwargs)
    if merge_schemas:
        return infer_json_schema_from_strings(cleaned, config).schema
    return [
        infer_json_schema_from_strings([s], config).schema for s in cleaned
    ]


def infer_avro_schema(json_strings, **kwargs):
    kwargs["avro"] = True
    return infer_json_schema(json_strings, **kwargs)


def normalise_json(
    json_strings,
    *,
    empty_as_null: bool = True,
    coerce_strings: bool = False,
    map_encoding: str = MAP_ENCODING_KV,
    **kwargs,
) -> list[str]:
    """Two-pass normalisation: infer the merged Avro schema over all rows,
    then rewrite each row to conform. Returns JSON strings (row count
    preserved). The fused Ray stage shares pass 2 with the schema broadcast."""
    cleaned = _clean_strings(json_strings)
    if not cleaned:
        raise ValueError("No valid JSON strings found in column")
    kwargs["avro"] = True
    config = _build_config(**kwargs)
    schema = infer_json_schema_from_strings(cleaned, config).schema
    return normalise_rows(
        json_strings,
        schema,
        empty_as_null=empty_as_null,
        coerce_strings=coerce_strings,
        map_encoding=map_encoding,
        wrap_root=config.wrap_root,
    )


def infer_polars_schema(json_strings, *, avro: bool = False, **kwargs):
    """Infer a ``polars.Schema`` for the column (A2 parity,
    polars-genson-py/src/expressions.rs:314-416): infer the merged schema,
    then map it through the T11/T12 bridge to dtype strings → pl dtypes.
    Avro format materialises maps as ``List[Struct[key,value]]``."""
    import polars as pl

    from .core.dtypes import (
        avro_schema_to_polars_fields,
        json_schema_to_polars_fields,
        parse_polars_dtype,
    )

    kwargs["avro"] = avro
    schema = infer_json_schema(json_strings, **kwargs)
    fields = (
        avro_schema_to_polars_fields(schema)
        if avro
        else json_schema_to_polars_fields(schema)
    )
    return pl.Schema({name: parse_polars_dtype(t) for name, t in fields})


def schema_to_json(schema) -> str:
    """Serialise a ``pl.Schema`` to JSON (A6 parity,
    polars-genson-py/src/schema.rs:19-57): a field→dtype map where each
    dtype is the polars-rs serde value (externally tagged enum — unit
    variants as strings, ``{"List": ...}`` / ``{"Struct": [{"name","dtype"}]}``
    / ``{"Datetime": [unit, tz]}`` for parametrized types), so the JSON is
    exchangeable with the reference toolchain. Exotic dtypes without a
    serde mapping fall back to the dtype-string mini-language (accepted on
    input by both this engine and ``json_to_schema``)."""
    import polars as pl

    from .core.dtypes import polars_dtype_to_serde, polars_dtype_to_string

    if not isinstance(schema, pl.Schema):
        raise TypeError(f"Expected Schema, got {type(schema)}: {schema}")

    def encode(dt):
        try:
            return polars_dtype_to_serde(dt)
        except ValueError:
            return polars_dtype_to_string(dt)

    return json.dumps({name: encode(dt) for name, dt in schema.items()})


def json_to_schema(json_str: str):
    """Inverse of :func:`schema_to_json` (schema.rs:59-95); accepts both the
    polars-rs serde representation and round 1's dtype-string values."""
    import polars as pl

    from .core.dtypes import serde_to_polars_dtype

    data = json.loads(json_str)
    return pl.Schema({name: serde_to_polars_dtype(v) for name, v in data.items()})


def avro_to_polars_schema(avro_schema_json: str):
    """Avro schema JSON string → ``pl.Schema`` (A6,
    polars-genson-py/python/polars_genson/__init__.py:1236-1258)."""
    import polars as pl

    from .core.dtypes import avro_schema_to_polars_fields, parse_polars_dtype

    fields = avro_schema_to_polars_fields(json.loads(avro_schema_json))
    return pl.Schema({name: parse_polars_dtype(t) for name, t in fields})


def schema_to_dict(schema):
    """Nested-dict view of a ``pl.Schema`` (A6, __init__.py:1260-1276)."""
    import polars as pl

    if not isinstance(schema, pl.Schema):
        raise TypeError(f"Expected Polars Schema, got {type(schema)}")

    def dtype_to_dict(dtype):
        if isinstance(dtype, pl.Struct):
            return {f.name: dtype_to_dict(f.dtype) for f in dtype.fields}
        if isinstance(dtype, pl.List):
            return {"list": dtype_to_dict(dtype.inner)}
        if isinstance(dtype, pl.Array):
            return {"array": {"inner": dtype_to_dict(dtype.inner), "size": dtype.size}}
        return str(dtype)

    return {name: dtype_to_dict(dtype) for name, dtype in schema.items()}


def normalise_and_decode(
    json_strings,
    *,
    empty_as_null: bool = True,
    coerce_strings: bool = False,
    unnest: bool = True,
    decode_schema=None,
    **kwargs,
):
    """``normalise_json(..., decode=True)`` parity (A3,
    polars-genson-py/python/polars_genson/__init__.py:1179-1217): normalise
    against the inferred Avro schema, then ``str.json_decode`` into typed
    polars columns (kv map encoding required, as in the reference)."""
    import polars as pl

    normed = normalise_json(
        json_strings,
        empty_as_null=empty_as_null,
        coerce_strings=coerce_strings,
        map_encoding=MAP_ENCODING_KV,
        **kwargs,
    )
    if decode_schema is None:
        decode_schema = infer_polars_schema(json_strings, avro=True, **kwargs)
    dtype = pl.Struct(decode_schema)
    series = pl.Series("normalised", normed).str.json_decode(dtype)
    df = series.to_frame()
    if unnest:
        df = df.unnest("normalised")
    return df


def normalise_rows(
    json_strings,
    avro_schema,
    *,
    empty_as_null: bool = True,
    coerce_strings: bool = False,
    map_encoding: str = MAP_ENCODING_KV,
    wrap_root: str | None = None,
) -> list[str]:
    """Pass-2-only normalisation against a pre-computed Avro schema (this is
    the per-batch function used by the Ray normalise stage)."""
    cfg = NormaliseConfig(
        empty_as_null=empty_as_null,
        coerce_string=coerce_strings,
        map_encoding=map_encoding,
        wrap_root=wrap_root,
    )
    out = []
    for s in json_strings:
        try:
            val = json.loads(s) if isinstance(s, str) else None
        except ValueError:
            val = None
        normed = normalise_values([val], avro_schema, cfg)[0]
        out.append(json.dumps(normed, separators=(",", ":"), ensure_ascii=False))
    return out
