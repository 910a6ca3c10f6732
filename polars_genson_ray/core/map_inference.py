"""Record→map rewriting of an inferred JSON Schema.

``rewrite_objects`` post-processes the merged schema, deciding per object
whether its ``properties`` should become ``additionalProperties`` (a map):
key cardinality (``map_threshold``), required-key gating
(``map_max_required_keys``), value homogeneity, or unifiability
(``unify_maps``), with ``force_field_types`` / ``force_parent_field_types`` /
``force_scalar_promotion`` / ``no_root_map`` overrides.

Semantics replicate genson-core/src/schema/map_inference.rs:46-791,
including its recursion structure (so first-seen orderings and idempotent
double-recursions match). Runs driver-side on the already-merged schema —
it is deliberately not distributed.
"""

from __future__ import annotations


from .config import SchemaInferenceConfig, make_promoted_scalar_key
from .json_schema import _deepcopy
from .unification import check_unifiable_schemas, unify_anyof_schemas

_PROMOTABLE = ("string", "integer", "number", "boolean")
_RECURSION_SKIP_KEYS = ("items", "type", "required", "$schema", "namespace", "name")


def _is_two_elem_null_list(arr) -> bool:
    return isinstance(arr, list) and len(arr) == 2 and "null" in arr


def extract_non_null_schema(schema):
    """Non-null view of a (possibly) nullable schema, both forms
    (map_inference.rs:46-82). Returns a copy-on-write value."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if _is_two_elem_null_list(t):
            non_null = next((x for x in t if x != "null"), None)
            if non_null is not None:
                out = dict(schema)
                out["type"] = non_null
                return out
            return schema
    if _is_two_elem_null_list(schema):
        return next(v for v in schema if v != "null")
    return schema


def contains_anyof(value) -> bool:
    if isinstance(value, dict):
        if "anyOf" in value:
            return True
        return any(contains_anyof(v) for v in value.values())
    if isinstance(value, list):
        return any(contains_anyof(v) for v in value)
    return False


def process_anyof_unions(schema, field_name, config) -> bool:
    """Recursively unify anyOf unions in a (sub)schema
    (map_inference.rs:98-153)."""
    made_changes = False
    if isinstance(schema, dict):
        anyof = schema.get("anyOf")
        if isinstance(anyof, list) and config.unify_maps:
            unified = unify_anyof_schemas(anyof, field_name, config)
            if unified is not None:
                schema.clear()
                schema.update(unified)
                process_anyof_unions(schema, field_name, config)
                return True
        props = schema.get("properties")
        if isinstance(props, dict):
            for k, v in props.items():
                if process_anyof_unions(v, k, config):
                    made_changes = True
        else:
            for v in schema.values():
                if process_anyof_unions(v, field_name, config):
                    made_changes = True
    elif isinstance(schema, list):
        for v in schema:
            if process_anyof_unions(v, field_name, config):
                made_changes = True
    return made_changes


def _replace(schema: dict, new_value: dict) -> None:
    schema.clear()
    schema.update(new_value)


def _wrap_promoted_scalar(schema: dict, field_name: str, scalar_type: str) -> None:
    wrapped_key = make_promoted_scalar_key(field_name, scalar_type)
    inner = _deepcopy(schema)
    _replace(schema, {"type": "object", "properties": {wrapped_key: inner}})


def rewrite_objects(
    schema,
    field_name: str | None,
    config: SchemaInferenceConfig,
    is_root: bool,
) -> None:
    """Mutate ``schema`` in place (map_inference.rs:184-791)."""
    # --- force_scalar_promotion wrap (map_inference.rs:198-286) ---
    if (
        field_name is not None
        and field_name in config.force_scalar_promotion
        and field_name not in config.force_field_types
        and isinstance(schema, dict)
    ):
        t = schema.get("type")
        if isinstance(t, str) and t in _PROMOTABLE:
            _wrap_promoted_scalar(schema, field_name, t)
            # falls through (the reference's plain-scalar branch does not return)
        elif _is_two_elem_null_list(t):
            inner_type = next((x for x in t if x != "null"), None)
            if isinstance(inner_type, str) and inner_type in _PROMOTABLE:
                _wrap_promoted_scalar(schema, field_name, inner_type)
                return

    if isinstance(schema, dict):
        obj = schema

        # --- forced overrides by field name (map_inference.rs:289-324) ---
        if field_name is not None and field_name in config.force_field_types:
            forced = config.force_field_types[field_name]
            if forced == "map":
                obj.pop("properties", None)
                obj.pop("required", None)
                obj["additionalProperties"] = {"type": "string"}
                return
            if forced == "record":
                props = obj.get("properties")
                if isinstance(props, dict):
                    for k, v in props.items():
                        rewrite_objects(v, k, config, False)
                if "items" in obj:
                    rewrite_objects(obj["items"], None, config, False)
                return

        # --- anyOf unions (map_inference.rs:327-362) ---
        anyof = obj.get("anyOf")
        if isinstance(anyof, list):
            if config.unify_maps:
                unified = unify_anyof_schemas(anyof, field_name or "", config)
                if unified is not None:
                    _replace(schema, unified)
                    rewrite_objects(schema, field_name, config, is_root)
                    return
            anyof = obj.get("anyOf")
            if isinstance(anyof, list):
                for sub in anyof:
                    rewrite_objects(sub, field_name, config, False)

        # --- heuristic rewrite (map_inference.rs:365-753) ---
        props = obj.get("properties")
        if isinstance(props, dict):
            forced_parent = None
            for prop_key, ftype in config.force_parent_field_types.items():
                if prop_key in props:
                    forced_parent = ftype
                    break
            if forced_parent == "record":
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
                if "items" in obj:
                    rewrite_objects(obj["items"], None, config, False)
                return
            # (forced_parent == "map" continues into normal map logic)

            if field_name is not None and field_name in config.force_scalar_promotion:
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
                return

            if "additionalProperties" in obj:
                if not props:
                    rewrite_objects(obj["additionalProperties"], None, config, False)
                    return
                # schema has both properties and additionalProperties —
                # fall through like the reference (warning-only path)

            key_count = len(props)
            above_threshold = key_count >= config.map_threshold
            if config.debug:
                from .diagnostics import debug

                debug(
                    config,
                    f"{field_name or '$'}: {key_count} keys vs map_threshold="
                    f"{config.map_threshold} → "
                    f"{'map candidate' if above_threshold else 'record'}",
                )
            child_schemas = list(props.values())

            # map-of-identical-records fast path (map_inference.rs:462-478)
            if above_threshold and len(child_schemas) > 1:
                first = child_schemas[0]
                if (
                    isinstance(first, dict)
                    and first.get("type") == "object"
                    and "properties" in first
                    and all(other == first for other in child_schemas)
                ):
                    first_clone = _deepcopy(first)
                    obj.pop("properties", None)
                    obj.pop("required", None)
                    obj["additionalProperties"] = first_clone
                    return

            required = obj.get("required")
            required_key_count = len(required) if isinstance(required, list) else 0

            unified_schema = None
            if child_schemas:
                normalised = [extract_non_null_schema(v) for v in child_schemas]
                first_normalised = normalised[0]
                if all(s == first_normalised for s in normalised):
                    unified_schema = _deepcopy(first_normalised)
                elif config.unify_maps:
                    has_excluded = any(k in config.no_unify for k in props)
                    if not has_excluded:
                        if all(
                            isinstance(s, dict) and s.get("type") == "array"
                            for s in child_schemas
                        ):
                            item_schemas = []
                            all_items_ok = True
                            for s in child_schemas:
                                if "items" in s:
                                    item_schemas.append(s["items"])
                                else:
                                    all_items_ok = False
                                    break
                            if all_items_ok:
                                unified_items = check_unifiable_schemas(
                                    item_schemas, field_name or "", config
                                )
                                if unified_items is not None:
                                    unified_schema = {
                                        "type": "array",
                                        "items": unified_items,
                                    }
                        elif above_threshold:
                            unified_schema = check_unifiable_schemas(
                                child_schemas, field_name or "", config
                            )

            if unified_schema is not None and contains_anyof(unified_schema):
                process_anyof_unions(unified_schema, field_name or "", config)

            if above_threshold and unified_schema is not None:
                if is_root and config.no_root_map:
                    should_be_map = False
                elif config.map_max_required_keys is not None:
                    should_be_map = required_key_count <= config.map_max_required_keys
                else:
                    should_be_map = True
            else:
                should_be_map = False

            if should_be_map:
                obj.pop("properties", None)
                obj.pop("required", None)
                obj["type"] = "object"
                processed = _deepcopy(unified_schema)
                rewrite_objects(processed, None, config, False)
                obj["additionalProperties"] = processed
                return

        # --- recursion into nested values (map_inference.rs:756-784) ---
        if not (field_name is not None and field_name in config.force_field_types):
            props = obj.get("properties")
            if isinstance(props, dict):
                for k, v in props.items():
                    rewrite_objects(v, k, config, False)
            if "items" in obj:
                rewrite_objects(obj["items"], None, config, False)
            for k in list(obj.keys()):
                if k in _RECURSION_SKIP_KEYS:
                    continue
                v = obj.get(k)
                if isinstance(v, dict):
                    rewrite_objects(v, k, config, False)

    elif isinstance(schema, list):
        for v in schema:
            rewrite_objects(v, None, config, False)
