"""force_field_types rewrites applied before/after the merge.

Mirrors ``apply_force_field_types`` (schema.rs:282-329, run on every
per-document schema before merging) and ``preprocess_force_field_types`` +
``convert_to_map`` (schema.rs:452-548, run once on the merged schema).
"""

from __future__ import annotations

from .config import SchemaInferenceConfig


def apply_force_field_types(schema, config: SchemaInferenceConfig) -> None:
    """Pre-merge rewrite: forced ``"map"`` fields become string-valued maps so
    every per-document schema is structurally consistent (schema.rs:282-329)."""
    if not config.force_field_types:
        return
    _apply(schema, config)


def _apply(schema, config) -> None:
    if isinstance(schema, dict):
        props = schema.get("properties")
        if isinstance(props, dict):
            for field_name, field_schema in props.items():
                if config.force_field_types.get(field_name) == "map" and isinstance(
                    field_schema, dict
                ):
                    # REPLACE the entry rather than mutating field_schema in
                    # place: leaf schemas may be interned shared singletons
                    # (infer._SCALAR_SCHEMAS) — mutation would corrupt every
                    # other use. Key order matches the old in-place rewrite:
                    # surviving keys keep their positions ("type" updates in
                    # place), additionalProperties appends.
                    field_schema = {
                        k: v
                        for k, v in field_schema.items()
                        if k not in ("properties", "required")
                    }
                    field_schema["type"] = "object"
                    field_schema["additionalProperties"] = {"type": "string"}
                    props[field_name] = field_schema
                _apply(field_schema, config)
        if "items" in schema:
            _apply(schema["items"], config)
        if "additionalProperties" in schema:
            _apply(schema["additionalProperties"], config)
        anyof = schema.get("anyOf")
        if isinstance(anyof, list):
            for item in anyof:
                _apply(item, config)
    elif isinstance(schema, list):
        for item in schema:
            _apply(item, config)


def preprocess_force_field_types(schema, config: SchemaInferenceConfig) -> None:
    """Post-merge rewrite of forced map fields (schema.rs:452-493)."""
    if not config.force_field_types:
        return
    _preprocess(schema, config)


def _preprocess(schema, config) -> None:
    if isinstance(schema, dict):
        props = schema.get("properties")
        if isinstance(props, dict):
            for field_name in list(props):
                if config.force_field_types.get(field_name) == "map":
                    props[field_name] = _converted_to_map(props[field_name])
                _preprocess(props[field_name], config)
        if "items" in schema:
            _preprocess(schema["items"], config)
        if "additionalProperties" in schema:
            _preprocess(schema["additionalProperties"], config)
        anyof = schema.get("anyOf")
        if isinstance(anyof, list):
            for item in anyof:
                _preprocess(item, config)
    elif isinstance(schema, list):
        for item in schema:
            _preprocess(item, config)


def _converted_to_map(schema):
    """``convert_to_map`` (schema.rs:496-548); returns the rewritten schema."""
    if isinstance(schema, list):
        # legacy union form ["null", {...}] (or any list union)
        has_null = any(
            v == "null" or (isinstance(v, dict) and v.get("type") == "null")
            for v in schema
        )
        if has_null:
            return {
                "type": ["null", "object"],
                "additionalProperties": {"type": "string"},
            }
        return {"type": "object", "additionalProperties": {"type": "string"}}

    if isinstance(schema, dict):
        if "additionalProperties" in schema:
            return schema
        t = schema.get("type")
        is_nullable = isinstance(t, list) and "null" in t
        schema.pop("properties", None)
        schema.pop("required", None)
        schema.pop("anyOf", None)
        schema["type"] = ["null", "object"] if is_nullable else "object"
        schema["additionalProperties"] = {"type": "string"}
    return schema
