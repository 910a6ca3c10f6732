"""Schema unification lattice.

Decides whether heterogeneous property schemas can merge into one schema
(enabling record→map rewriting) and performs the merge: record field-wise
unification with selective nullability, map/array value unification, scalar
nullable-union formation, and scalar→object promotion under synthetic
``{field}__{type}`` keys.

Semantics replicate genson-core/src/schema/map_inference/unification.rs
(function-for-function; citations inline). Fresh Python implementation over
plain dicts.
"""

from __future__ import annotations

from .config import SchemaInferenceConfig, make_promoted_scalar_key
from .json_schema import _deepcopy

_SCALARS = ("string", "number", "integer", "boolean")


def _is_two_elem_null_list(arr) -> bool:
    return isinstance(arr, list) and len(arr) == 2 and "null" in arr


def normalise_nullable(v):
    """Strip all redundant legacy ``["null", X]`` wrapping (unification.rs:19-34)."""
    current = v
    while _is_two_elem_null_list(current):
        current = next(x for x in current if x != "null")
    return current


def _non_null_of(arr):
    for t in arr:
        if t != "null":
            return t
    return None


def _try_make_nullable_union(a, b):
    """null-typed schema + typed schema → typed schema with nullable type
    (unification.rs:37-50)."""
    if isinstance(a, dict) and a.get("type") == "null" and isinstance(b, dict):
        other_type = b.get("type")
        if other_type is not None and other_type != "null":
            result = dict(b)
            result["type"] = ["null", other_type]
            return result
    return None


def _extract_nullable_info(schema):
    """(was_nullable, inner-schema) for the modern ``{"type": ["null", T]}``
    form (unification.rs:66-91)."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if _is_two_elem_null_list(t):
            non_null = _non_null_of(t)
            if non_null is not None:
                inner = dict(schema)
                inner["type"] = non_null
                return True, inner
    return False, schema


def schemas_compatible(existing, new):
    """Unify two schemas that differ only in nullability (unification.rs:53-113)."""
    if existing == new:
        return _copy(existing)

    result = _try_make_nullable_union(existing, new) or _try_make_nullable_union(
        new, existing
    )
    if result is not None:
        return result

    existing_nullable, existing_inner = _extract_nullable_info(existing)
    new_nullable, new_inner = _extract_nullable_info(new)

    if existing_inner == new_inner:
        if existing_nullable or new_nullable:
            nullable_schema = _copy(existing_inner)
            inner_type = existing_inner.get("type") if isinstance(existing_inner, dict) else None
            if inner_type is not None:
                nullable_schema["type"] = ["null", inner_type]
            return nullable_schema
        return _copy(existing_inner)

    return None


# plain-JSON recursive copy — schemas are dict/list/scalar trees, and
# copy.deepcopy's memo/dispatch machinery measured 3x slower here
_copy = _deepcopy


# ---------------------------------------------------------------------------
# Shape predicates (unification.rs:116-321)
# ---------------------------------------------------------------------------

def is_scalar_schema(schema) -> bool:
    if _is_two_elem_null_list(schema):
        return is_scalar_schema(next(x for x in schema if x != "null"))
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t in _SCALARS
        if _is_two_elem_null_list(t):
            return _non_null_of(t) in _SCALARS
    return False


def is_object_schema(schema) -> bool:
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t == "object" and "properties" in schema
        if _is_two_elem_null_list(t):
            return _non_null_of(t) == "object" and "properties" in schema
    return False


def is_empty_record_schema(schema) -> bool:
    if not isinstance(schema, dict):
        return False
    t = schema.get("type")
    is_obj = t == "object" or (_is_two_elem_null_list(t) and _non_null_of(t) == "object")
    if not is_obj:
        return False
    ap = schema.get("additionalProperties")
    if isinstance(ap, dict) or ap is True:
        return False  # it's a map
    props = schema.get("properties")
    if props is None:
        return True
    return isinstance(props, dict) and not props


def is_map_schema(schema) -> bool:
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t == "object" and "additionalProperties" in schema
        if _is_two_elem_null_list(t):
            return _non_null_of(t) == "object" and "additionalProperties" in schema
    return False


def is_array_schema(schema) -> bool:
    if _is_two_elem_null_list(schema):
        return is_array_schema(next(x for x in schema if x != "null"))
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str):
            return t == "array"
        if _is_two_elem_null_list(t):
            return _non_null_of(t) == "array"
    return False


def get_scalar_type_name(schema):
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, str) and t in _SCALARS:
            return t
        if _is_two_elem_null_list(t):
            non_null = _non_null_of(t)
            if non_null in _SCALARS:
                return non_null
    return None


def _extract_field_from_nullable_schema(schema, field_name):
    """Unwrap nullable layers and pull out ``field_name``
    (unification.rs:375-399)."""
    if _is_two_elem_null_list(schema):
        inner = next((v for v in schema if v != "null"), None)
        if inner is None:
            return None
        return _extract_field_from_nullable_schema(inner, field_name)
    if isinstance(schema, dict):
        return schema.get(field_name)
    return None


# ---------------------------------------------------------------------------
# Scalar promotion (unification.rs:324-368, :909-948)
# ---------------------------------------------------------------------------

def _try_scalar_promotion(object_schema, scalar_schema, field_name, path, config):
    scalar_type = get_scalar_type_name(scalar_schema)
    if scalar_type is None:
        return None
    wrapped_key = make_promoted_scalar_key(field_name, scalar_type)
    promoted = {"type": "object", "properties": {wrapped_key: _copy(scalar_schema)}}
    result = check_unifiable_schemas(
        [object_schema, promoted], f"{path}.{field_name}", config
    )
    if result is None:
        return None
    if isinstance(result, dict):
        # all fields must be optional after scalar promotion
        result.pop("required", None)
    return result


def _try_mixed_scalar_promotion(existing, new, field_name, path, config):
    existing_type = get_scalar_type_name(existing)
    new_type = get_scalar_type_name(new)
    if existing_type is None or new_type is None or existing_type == new_type:
        return None
    properties = {
        make_promoted_scalar_key(field_name, existing_type): _copy(existing),
        make_promoted_scalar_key(field_name, new_type): _copy(new),
    }
    return {"type": "object", "properties": properties}


# ---------------------------------------------------------------------------
# Per-kind unifiers
# ---------------------------------------------------------------------------

def _unify_array_schemas(schemas, path, config):
    if not schemas:
        return None
    items_schemas = []
    for schema in schemas:
        items = _extract_field_from_nullable_schema(schema, "items")
        if items is None:
            return None
        items_schemas.append(items)
    unified_items = check_unifiable_schemas(items_schemas, f"{path}.items", config)
    if unified_items is None:
        return None
    return {"type": "array", "items": unified_items}


def _unify_scalar_schemas(schemas, path, config):
    if not schemas:
        return None
    base_types = set()
    for schema in schemas:
        if not isinstance(schema, dict):
            continue
        t = schema.get("type")
        if isinstance(t, str):
            base_types.add(t)
        elif _is_two_elem_null_list(t):
            non_null = _non_null_of(t)
            if isinstance(non_null, str):
                base_types.add(non_null)
    if len(base_types) == 1:
        return {"type": ["null", next(iter(base_types))]}
    return None


def _unify_map_schemas(schemas, path, config):
    if not schemas:
        return None
    value_schemas = []
    for schema in schemas:
        ap = _extract_field_from_nullable_schema(schema, "additionalProperties")
        if ap is None:
            return None
        value_schemas.append(ap)
    unified = check_unifiable_schemas(
        value_schemas, f"{path}.additionalProperties", config
    )
    if unified is None:
        return None
    return {"type": "object", "additionalProperties": unified}


def _unify_field_schemas(field_name, schemas, path, config):
    """Strategy dispatch for one record field (T5, map_inference/
    unification.rs:680-706): sequential left-fold when scalar promotion may
    apply or the set is small (<50); the reference's divide-and-conquer
    variant for large homogeneous sets. The tree fold here runs
    sequentially — the Ray engine takes its parallelism at the data level
    (per-batch partials); the semantic content of the reference's rayon
    path is its tree-shaped merge order, mirrored exactly."""
    if len(schemas) == 1:
        return _copy(schemas[0])
    needs_scalar_promo = config.wrap_scalars and (
        any(is_scalar_schema(s) for s in schemas)
        and any(is_object_schema(s) for s in schemas)
    )
    if needs_scalar_promo or len(schemas) < 50:
        return _unify_field_schemas_sequential(field_name, schemas, path, config)
    return _unify_field_schemas_tree(field_name, schemas, path, config)


def _unify_field_schemas_tree(field_name, schemas, path, config):
    """Divide-and-conquer fold (unification.rs:636-678): halves below 10
    schemas fold sequentially; merged via check_unifiable_schemas."""
    if not schemas:
        return None
    if len(schemas) == 1:
        return _copy(schemas[0])
    if len(schemas) < 10:
        return _unify_field_schemas_sequential(field_name, schemas, path, config)
    mid = len(schemas) // 2
    left = _unify_field_schemas_tree(field_name, schemas[:mid], path, config)
    right = _unify_field_schemas_tree(field_name, schemas[mid:], path, config)
    if left is None or right is None:
        return None
    return check_unifiable_schemas(
        [left, right], f"{path}.{field_name}", config
    )


def _unify_field_schemas_sequential(field_name, schemas, path, config):
    """Left-fold pairwise unification for one record field
    (unification.rs:567-634)."""
    if len(schemas) == 1:
        return _copy(schemas[0])
    first = schemas[0]
    if all(s == first for s in schemas):
        return _copy(first)

    unified = _copy(schemas[0])
    for new in schemas[1:]:
        compatible = schemas_compatible(unified, new)
        if compatible is not None:
            unified = compatible
            continue

        both_arrays = is_array_schema(unified) and is_array_schema(new)
        both_objects = (is_object_schema(unified) or is_empty_record_schema(unified)) and (
            is_object_schema(new) or is_empty_record_schema(new)
        )
        if both_arrays or both_objects:
            result = check_unifiable_schemas(
                [unified, new], f"{path}.{field_name}", config
            )
            if result is None:
                return None
            unified = result
            continue

        if config.wrap_scalars:
            unified_is_obj = is_object_schema(unified)
            unified_is_scalar = is_scalar_schema(unified)
            new_is_obj = is_object_schema(new)
            new_is_scalar = is_scalar_schema(new)
            if unified_is_obj and new_is_scalar:
                result = _try_scalar_promotion(unified, new, field_name, path, config)
                if result is not None:
                    unified = result
                    continue
            elif new_is_obj and unified_is_scalar:
                result = _try_scalar_promotion(new, unified, field_name, path, config)
                if result is not None:
                    unified = result
                    continue
            elif unified_is_scalar and new_is_scalar:
                result = _try_mixed_scalar_promotion(
                    unified, new, field_name, path, config
                )
                if result is not None:
                    unified = result
                    continue

        return None

    return unified


def _unify_record_schemas(schemas, path, config):
    """Field-wise record unification (unification.rs:708-906).

    Property order in the result: fields required in all schemas first (in
    first-seen order), then optional (nullable) fields — mirroring the
    reference's two emission loops.
    """
    if config.debug:
        from .diagnostics import debug

        debug(config, f"{path}: Attempting to unify {len(schemas)} record schemas")
    schema_properties = []
    for schema in schemas:
        props = _extract_field_from_nullable_schema(schema, "properties")
        if isinstance(props, dict):
            schema_properties.append(props)
        elif is_empty_record_schema(schema):
            schema_properties.append({})
        else:
            return None

    field_schemas: dict[str, list] = {}
    field_counts: dict[str, int] = {}
    deferred_anyof: list[tuple[str, dict]] = []

    for props in schema_properties:
        for field_name, field_schema in props.items():
            field_counts[field_name] = field_counts.get(field_name, 0) + 1
            normalized = normalise_nullable(field_schema)
            anyof = normalized.get("anyOf") if isinstance(normalized, dict) else None
            if isinstance(anyof, list):
                unified = unify_anyof_schemas(anyof, field_name, config)
                if unified is not None:
                    deferred_anyof.append((field_name, unified))
                    continue
            field_schemas.setdefault(field_name, []).append(normalized)

    for field_name, unified in deferred_anyof:
        field_schemas.setdefault(field_name, []).append(unified)

    all_fields: dict[str, dict] = {}
    for field_name, candidates in field_schemas.items():
        unified = _unify_field_schemas(field_name, candidates, path, config)
        if unified is None:
            return None
        all_fields[field_name] = unified

    total = len(schemas)
    unified_properties: dict[str, dict] = {}
    required_fields: list[str] = []

    for field_name, field_type in all_fields.items():
        if field_counts.get(field_name, 0) == total:
            unified_properties[field_name] = field_type
            required_fields.append(field_name)

    for field_name, field_type in all_fields.items():
        if field_counts.get(field_name, 0) < total:
            t = field_type.get("type") if isinstance(field_type, dict) else None
            if isinstance(t, str):
                if t == "null":
                    unified_properties[field_name] = field_type
                else:
                    nullable_field = _copy(field_type)
                    nullable_field["type"] = ["null", t]
                    unified_properties[field_name] = nullable_field
            elif isinstance(t, list):
                unified_properties[field_name] = field_type
            else:
                unified_properties[field_name] = {
                    "anyOf": [{"type": "null"}, field_type]
                }

    result = {"type": "object", "properties": unified_properties}
    if required_fields:
        result["required"] = required_fields
    return result


def unify_anyof_schemas(schemas, field_name, config: SchemaInferenceConfig):
    """anyOf with scalars + objects: promote the scalars, then unify
    (unification.rs:951-997)."""
    if not config.wrap_scalars:
        return None
    has_scalars = any(is_scalar_schema(s) for s in schemas)
    has_objects = any(is_object_schema(s) for s in schemas)
    if not has_scalars or not has_objects:
        return None
    promoted_schemas = []
    for schema in schemas:
        if is_scalar_schema(schema):
            scalar_type = get_scalar_type_name(schema)
            if scalar_type is None:
                return None
            wrapped_key = make_promoted_scalar_key(field_name, scalar_type)
            promoted_schemas.append(
                {"type": "object", "properties": {wrapped_key: _copy(schema)}}
            )
        else:
            promoted_schemas.append(schema)
    return check_unifiable_schemas(promoted_schemas, field_name, config)


def check_unifiable_schemas(schemas, path, config: SchemaInferenceConfig):
    """Dispatch on the common shape of ``schemas`` (unification.rs:1018-1143)."""
    if not schemas:
        return None

    if all(is_array_schema(s) for s in schemas):
        return _unify_array_schemas(schemas, path, config)

    if all(is_map_schema(s) or is_empty_record_schema(s) for s in schemas):
        map_schemas = [s for s in schemas if is_map_schema(s)]
        if not map_schemas:
            # all empty records — treat as an empty (string-valued) map
            return {"type": "object", "additionalProperties": {"type": "string"}}
        return _unify_map_schemas(map_schemas, path, config)

    if all(is_object_schema(s) or is_empty_record_schema(s) for s in schemas):
        return _unify_record_schemas(schemas, path, config)

    if all(is_scalar_schema(s) for s in schemas):
        return _unify_scalar_schemas(schemas, path, config)

    return None
