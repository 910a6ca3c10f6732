"""Normalise JSON values against a fixed Avro schema.

Reshapes jagged per-row JSON into a schema-consistent form: records get
exactly the schema's fields (missing → null, extras dropped), arrays/maps
handle empties and scalar fallbacks, unions take the first non-null branch.

Semantics replicate genson-core/src/normalise.rs:41-331 (rule-for-rule; see
the reference's doc comment for the behaviour table). This per-record pure
function is the embarrassingly-parallel second pass: the Ray engine runs it
inside ``map_batches`` with the merged schema broadcast via ``ray.put``.
"""

from __future__ import annotations

from .config import (
    MAP_ENCODING_ENTRIES,
    MAP_ENCODING_KV,
    MAP_ENCODING_MAPPING,
    NormaliseConfig,
    make_promoted_scalar_key,
)


def apply_map_encoding(mapping: dict, encoding: str):
    if encoding == MAP_ENCODING_MAPPING:
        return mapping
    if encoding == MAP_ENCODING_ENTRIES:
        return [{k: v} for k, v in mapping.items()]
    if encoding == MAP_ENCODING_KV:
        return [{"key": k, "value": v} for k, v in mapping.items()]
    raise ValueError(f"Unknown map encoding: {encoding!r}")


def _scalar_type_of_value(value) -> str:
    if isinstance(value, str):
        return "string"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    return "unknown"


def _is_float_number(v) -> bool:
    return isinstance(v, float) and not isinstance(v, bool)


def _is_int_number(v) -> bool:
    return isinstance(v, int) and not isinstance(v, bool)


def normalise_value(value, schema, cfg: NormaliseConfig, field_name: str | None = None):
    """Normalise one JSON value against an Avro ``schema``
    (normalise.rs:140-315)."""
    # Primitive types
    if isinstance(schema, str):
        if schema == "string":
            if value is None:
                return None
            if isinstance(value, str):
                return value
            return _json_to_string(value)
        if schema in ("int", "long"):
            if value is None:
                return None
            if _is_int_number(value):
                return value
            if isinstance(value, str) and cfg.coerce_string:
                try:
                    return int(value)
                except ValueError:
                    return None
            return None
        if schema in ("double", "float"):
            if value is None:
                return None
            if _is_float_number(value):
                return value
            if isinstance(value, str) and cfg.coerce_string:
                try:
                    return float(value)
                except ValueError:
                    return None
            return None
        if schema == "boolean":
            if value is None:
                return None
            if isinstance(value, bool):
                return value
            if isinstance(value, str) and cfg.coerce_string:
                if value in ("true", "1"):
                    return True
                if value in ("false", "0"):
                    return False
                return None
            return None
        # unrecognised primitive name: passthrough
        return value

    if isinstance(schema, dict):
        t = schema.get("type")

        if t == "record":
            out = {}
            fields = schema.get("fields")
            if isinstance(fields, list):
                for f in fields:
                    name = f.get("name")
                    field_schema = f.get("type")
                    if not isinstance(name, str) or field_schema is None:
                        continue
                    if isinstance(value, dict):
                        val = value.get(name)
                    else:
                        # scalar-vs-record: a synthetic `x__type` field absorbs
                        # a scalar value of the matching type
                        # (normalise.rs:193-221)
                        val = None
                        if "__" in name and value is not None:
                            type_suffix = name.rsplit("__", 1)[-1]
                            if _scalar_matches_suffix(value, type_suffix):
                                val = value
                    out[name] = normalise_value(val, field_schema, cfg, name)
            return out

        if t == "array":
            items_schema = schema.get("items", "string")
            if value is None:
                return None
            if isinstance(value, list):
                if not value and cfg.empty_as_null:
                    return None
                return [
                    normalise_value(v, items_schema, cfg, field_name) for v in value
                ]
            return [normalise_value(value, items_schema, cfg, field_name)]

        if t == "map":
            values_schema = schema.get("values", "string")
            if value is None:
                return None
            if isinstance(value, dict):
                if not value and cfg.empty_as_null:
                    return None
                out = {
                    k: normalise_value(v, values_schema, cfg, k)
                    for k, v in value.items()
                }
                return apply_map_encoding(out, cfg.map_encoding)
            # scalar fallback: wrap under a promoted key (normalise.rs:280-291)
            scalar_type = _scalar_type_of_value(value)
            wrapped_key = make_promoted_scalar_key(field_name or "", scalar_type)
            synthetic = {
                wrapped_key: normalise_value(value, values_schema, cfg, field_name)
            }
            return apply_map_encoding(synthetic, cfg.map_encoding)

        # unrecognised object schema: passthrough
        return value

    # Union
    if isinstance(schema, list):
        if any(t == "null" for t in schema):
            if value is None:
                return None
            branch = next(t for t in schema if t != "null")
            return normalise_value(value, branch, cfg, field_name)
        if schema:
            return normalise_value(value, schema[0], cfg, field_name)
        return value

    return value


def _scalar_matches_suffix(value, type_suffix: str) -> bool:
    if isinstance(value, str):
        return type_suffix == "string"
    if isinstance(value, bool):
        return type_suffix == "boolean"
    if isinstance(value, (int, float)):
        return type_suffix in ("int", "integer", "long", "float", "double", "number")
    return False


def _json_to_string(value) -> str:
    """Match serde_json's ``Value::to_string`` used by the reference for
    string coercion (compact JSON serialisation)."""
    import json

    return json.dumps(value, separators=(",", ":"), ensure_ascii=False)


def normalise_values(values, schema, cfg: NormaliseConfig):
    """Column-wise wrapper, applying ``wrap_root`` per value
    (normalise.rs:318-331)."""
    out = []
    for v in values:
        if cfg.wrap_root is not None:
            v = {cfg.wrap_root: v}
        out.append(normalise_value(v, schema, cfg, None))
    return out
