"""JSON Schema → Avro schema conversion.

Re-implements the subset of ``avrotize::converter::jsons_to_avro`` (v0.1.1)
exercised by the reference (genson-core/src/schema/core.rs:183-200 with
namespace "genson", root record "document"), as pinned by the reference's
CLI snapshots (genson-cli/tests/snapshots/*__avro.snap):

  - root object → ``{"type":"record","name":"document","namespace":"genson"}``
  - nested record at field F of record R → name F, namespace
    ``<ns(R)>.<name(R)>_types`` (namespaces accumulate through records only)
  - map (object with additionalProperties) at field F →
    ``{"name": F, "type": "map", "values": ...}`` (name key first, no
    namespace); a record/map inside a map's values is named ``F_values``;
    arrays are transparent to naming
  - scalars: string→string, integer→int, number→float, boolean→boolean
  - non-required record fields become ``["null", T]`` unless already nullable
"""

from __future__ import annotations

_SCALAR_MAP = {
    "string": "string",
    "integer": "int",
    "number": "float",
    "boolean": "boolean",
    "null": "null",
}


def _is_nullable_union(avro_type) -> bool:
    return isinstance(avro_type, list) and any(t == "null" for t in avro_type)


def _convert(schema, name: str, namespace: str):
    if isinstance(schema, list):
        # legacy union form ["null", {...}]
        return [_convert(s, name, namespace) for s in schema]
    if isinstance(schema, str):
        return _SCALAR_MAP.get(schema, "string")
    if not isinstance(schema, dict):
        return "string"

    anyof = schema.get("anyOf")
    if isinstance(anyof, list):
        return [_convert(s, name, namespace) for s in anyof]

    t = schema.get("type")

    if isinstance(t, list):
        if len(t) == 2 and "null" in t:
            non_null = next(x for x in t if x != "null")
            inner = dict(schema)
            inner["type"] = non_null
            return ["null", _convert(inner, name, namespace)]
        branches = []
        for x in t:
            inner = dict(schema)
            inner["type"] = x
            branches.append(_convert(inner, name, namespace))
        return branches

    if t == "object":
        ap = schema.get("additionalProperties")
        if isinstance(ap, (dict, bool)) and ap is not False:
            values_schema = {} if ap is True else ap
            return {
                "name": name,
                "type": "map",
                "values": _convert(values_schema, f"{name}_values", namespace),
            }
        # Field nullability in Avro is driven purely by `required` membership
        # (avrotize semantics, pinned by the reference's avro snapshots):
        # required fields have any JSON-level null union STRIPPED; optional
        # fields are wrapped ["null", T] (deduplicated if T is already null).
        required = schema.get("required")
        required_set = set(required) if isinstance(required, list) else set()
        child_ns = f"{namespace}.{name}_types"
        fields = []
        null_dependency = False
        props = schema.get("properties")
        if isinstance(props, dict):
            for prop, prop_schema in props.items():
                ftype = _convert(prop_schema, prop, child_ns)
                if prop in required_set:
                    if _is_nullable_union(ftype):
                        non_null = [t for t in ftype if t != "null"]
                        ftype = non_null[0] if len(non_null) == 1 else non_null
                    if ftype == "null":
                        # a required always-null field still registers the
                        # "null" dependency (claims_fixture_x1818_l5__avro)
                        null_dependency = True
                else:
                    if not _is_nullable_union(ftype):
                        if ftype == "null":
                            # always-null optional field: avrotize collapses
                            # the union to ["null"] and registers a "null"
                            # dependency (claims_fixture_x1818_l4__avro.snap)
                            ftype = ["null"]
                            null_dependency = True
                        else:
                            ftype = ["null", ftype]
                fields.append({"name": prop, "type": ftype})
        record = {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": fields,
        }
        if null_dependency:
            record["dependencies"] = ["null"]
        return record

    if t == "array":
        items = schema.get("items", {})
        if isinstance(items, list):
            # tuple schema: avro has no positional arrays; fall back to a
            # union of the item types
            item_type = [_convert(i, name, namespace) for i in items]
        else:
            item_type = _convert(items, name, namespace)
        return {"type": "array", "items": item_type}

    if isinstance(t, str):
        return _SCALAR_MAP.get(t, "string")

    # typeless {} — avrotize defaults to string values
    return "string"


def json_schema_to_avro(schema: dict, namespace: str = "genson") -> dict:
    """Convert a finalized JSON Schema document to an Avro schema with root
    record ``document`` (asserted by genson-core/tests/avro.rs:24).

    A non-record root (e.g. a root map) is wrapped in a synthetic record with
    a single ``document`` field; the map's values record is then named
    ``document_extensions`` in the root namespace (pinned by
    genson-cli/tests/snapshots/wrapping__map_of_record_values__avro_root.snap).
    """
    schema = {k: v for k, v in schema.items() if k != "$schema"}
    if (
        isinstance(schema, dict)
        and schema.get("type") == "object"
        and isinstance(schema.get("additionalProperties"), (dict, bool))
        and schema.get("additionalProperties") is not False
    ):
        ap = schema["additionalProperties"]
        values_schema = {} if ap is True else ap
        root_map = {
            "type": "map",
            "values": _convert(values_schema, "document_extensions", namespace),
            "name": "document",
        }
        return {
            "type": "record",
            "name": "document",
            "namespace": namespace,
            "fields": [{"name": "document", "type": root_map}],
        }
    converted = _convert(schema, "document", namespace)
    if isinstance(converted, dict) and converted.get("type") == "record":
        return converted
    return {
        "type": "record",
        "name": "document",
        "namespace": namespace,
        "fields": [{"name": "document", "type": converted}],
    }
