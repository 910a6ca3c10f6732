"""Canonical union ordering (reference: genson-core/src/schema.rs:82-157).

Sorting union type lists by a fixed precedence makes the commutative merge's
output independent of document order — the property that lets the Ray engine
tree-reduce per-block partial schemas in arbitrary completion order.
"""

from __future__ import annotations

_TYPE_RANK = {
    "null": 0,
    "map": 1,
    "array": 2,
    "object": 3,
    "record": 3,
    "boolean": 10,
    "integer": 11,
    "int": 11,
    "long": 11,
    "number": 12,
    "float": 12,
    "double": 12,
    "enum": 13,
    "string": 14,
    "fixed": 15,
    "bytes": 16,
}


def type_rank(val) -> int:
    if isinstance(val, str):
        return _TYPE_RANK.get(val, 99)
    if isinstance(val, dict):
        t = val.get("type")
        if isinstance(t, str):
            return _TYPE_RANK.get(t, 99)
        return 100
    return 100


def reorder_unions(schema) -> None:
    """Recursively sort ``type: [...]`` unions in place by precedence,
    preserving the common ``["null", T]`` pair as-is."""
    if isinstance(schema, dict):
        types = schema.get("type")
        if isinstance(types, list):
            if not (len(types) == 2 and any(t == "null" for t in types)):
                types.sort(key=type_rank)
        for v in schema.values():
            reorder_unions(v)
    elif isinstance(schema, list):
        for v in schema:
            reorder_unions(v)
