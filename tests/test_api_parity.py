"""API-level parity tests mirroring the reference's pytest suites
(polars-genson-py/tests/*.py — assertions replicated, fixtures per
FIXTURES.md B-families)."""

from __future__ import annotations

import polars as pl
import pytest

from polars_genson_ray.api import (
    infer_json_schema,
    infer_polars_schema,
    normalise_and_decode,
    normalise_json,
)
from polars_genson_ray.core.dtypes import (
    parse_polars_dtype,
    polars_schema_to_json_schema,
)


def test_basic_schema_inference():
    # core_test.py:18-48
    schema = infer_json_schema(
        [
            '{"name": "Alice", "age": 30}',
            '{"name": "Bob", "age": 25, "city": "NYC"}',
            '{"name": "Charlie", "age": 35, "email": "charlie@example.com"}',
        ]
    )
    props = schema["properties"]
    assert set(props) == {"name", "age", "city", "email"}
    assert props["name"]["type"] == "string"
    assert props["age"]["type"] == "integer"
    assert schema["required"] == ["age", "name"]


def test_null_and_blank_rows_skipped():
    schema = infer_json_schema(['{"a": 1}', None, "", '{"a": 2, "b": "x"}'])
    assert set(schema["properties"]) == {"a", "b"}


def test_empty_column_raises():
    with pytest.raises(ValueError):
        infer_json_schema([])


def test_invalid_json_raises():
    with pytest.raises(Exception, match="Invalid JSON"):
        infer_json_schema(['{"name": "Alice"}', '{"invalid": json}'])


def test_field_order_preserved():
    # field_order_test.py:44-60 — first-seen order across documents
    schema = infer_json_schema(
        ['{"z": 1, "b": 2}', '{"b": 3, "a": 4, "z": 5}', '{"c": 6, "z": 7, "b": 8}']
    )
    assert list(schema["properties"]) == ["z", "b", "a", "c"]


def test_merge_schemas_false_returns_per_row():
    schemas = infer_json_schema(
        ['{"a": 1}', '{"b": "x"}'], merge_schemas=False
    )
    assert isinstance(schemas, list) and len(schemas) == 2
    assert list(schemas[0]["properties"]) == ["a"]
    assert list(schemas[1]["properties"]) == ["b"]


def test_unify_maps_letters_avro():
    # unify_maps_test.py:7-49
    rows = [
        '{"letter": {"a": {"alphabet": 0, "vowel": 0, "frequency": 0.0817}}}',
        '{"letter": {"b": {"alphabet": 1, "consonant": 0, "frequency": 0.0150}}}',
        '{"letter": {"c": {"alphabet": 2, "consonant": 1, "frequency": 0.0278}}}',
        '{"letter": {"d": {"alphabet": 3, "consonant": 2, "frequency": 0.0425}}}',
        '{"letter": {"e": {"alphabet": 4, "vowel": 4, "frequency": 0.1270}}}',
    ]
    avro = infer_json_schema(rows, avro=True, map_threshold=5, unify_maps=True)
    letter = next(f for f in avro["fields"] if f["name"] == "letter")
    assert letter["type"]["type"] == "map"
    values = letter["type"]["values"]
    assert values["type"] == "record"
    ftypes = {f["name"]: f["type"] for f in values["fields"]}
    assert ftypes["alphabet"] == "int"
    assert ftypes["frequency"] == "float"
    assert ftypes["vowel"] == ["null", "int"]
    assert ftypes["consonant"] == ["null", "int"]


def test_unify_maps_normalisation():
    # unify_maps_test.py:52-100 (kv map encoding, missing fields → null)
    rows = [
        '{"letter": {"a": {"alphabet": 0, "vowel": 0, "frequency": 0.0817}}}',
        '{"letter": {"b": {"alphabet": 1, "consonant": 0, "frequency": 0.0150}}}',
        '{"letter": {"e": {"alphabet": 4, "vowel": 4, "frequency": 0.1270}}}',
    ]
    out = normalise_and_decode(rows, map_threshold=3, unify_maps=True)
    assert out.to_dicts() == [
        {"letter": [{"key": "a", "value": {"alphabet": 0, "frequency": 0.0817, "vowel": 0, "consonant": None}}]},
        {"letter": [{"key": "b", "value": {"alphabet": 1, "frequency": 0.0150, "vowel": None, "consonant": 0}}]},
        {"letter": [{"key": "e", "value": {"alphabet": 4, "frequency": 0.1270, "vowel": 4, "consonant": None}}]},
    ]


def test_normalise_empty_array_null_vs_kept():
    # normalise_test.py:9-27
    assert normalise_json(['{"labels": []}']) == ['{"labels":null}']
    assert normalise_json(['{"labels": []}'], empty_as_null=False) == ['{"labels":[]}']


def test_normalise_string_coercion():
    # normalise_test.py:50-86
    rows = ['{"id":"42", "active":"true"}', '{"id":7, "active":false}']
    out = normalise_json(rows)
    assert '"id":null' in out[0] and '"active":null' in out[0]
    out = normalise_json(rows, coerce_strings=True)
    assert '"id":42' in out[0] and '"active":true' in out[0]


def test_force_scalar_promotion():
    # normalise_test.py:29-48
    schema = infer_json_schema(
        ['{"precision": 11}', '{"precision": 12}'],
        force_scalar_promotion={"precision"},
    )
    assert schema["properties"]["precision"]["type"] == "object"
    assert "precision__integer" in schema["properties"]["precision"]["properties"]


def test_decode_basic_record():
    # decode_test.py:9-29
    out = normalise_and_decode(['{"id": 1, "active": true}', '{"id": 2, "active": false}'])
    assert dict(out.schema) == {"id": pl.Int64, "active": pl.Boolean}
    assert out.to_dicts() == [
        {"id": 1, "active": True},
        {"id": 2, "active": False},
    ]


def test_decode_map_to_kv_struct():
    # decode_test.py:31-57
    out = normalise_and_decode(
        ['{"labels": {"en": "Hello", "fr": "Bonjour"}}', '{"labels": {"es": "Hola"}}'],
        map_threshold=2,
    )
    assert dict(out.schema) == {
        "labels": pl.List(pl.Struct({"key": pl.String, "value": pl.String}))
    }
    assert out.to_dicts() == [
        {"labels": [{"key": "en", "value": "Hello"}, {"key": "fr", "value": "Bonjour"}]},
        {"labels": [{"key": "es", "value": "Hola"}]},
    ]


def test_infer_polars_schema_json_format():
    schema = infer_polars_schema(['{"a": 1, "b": "x", "c": [1.5]}'])
    assert schema == pl.Schema(
        {"a": pl.Int64, "b": pl.String, "c": pl.List(pl.Float64)}
    )


def test_dtype_string_roundtrip():
    dt = parse_polars_dtype("Struct[id:Int64,vals:List[Struct[key:String,value:Float64]]]")
    assert dt == pl.Struct(
        {"id": pl.Int64, "vals": pl.List(pl.Struct({"key": pl.String, "value": pl.Float64}))}
    )
    assert parse_polars_dtype("Array[Int32,3]") == pl.Array(pl.Int32, 3)
    assert parse_polars_dtype("Decimal(10,2)") == pl.Decimal(10, 2)


def test_polars_schema_to_json_schema():
    # serialise.rs:65-268 semantics (uint minimum, binary encoding, struct)
    schema = pl.Schema(
        {
            "i": pl.UInt32,
            "b": pl.Binary,
            "s": pl.Struct({"x": pl.Int64}),
            "arr": pl.Array(pl.Float64, 2),
        }
    )
    js = polars_schema_to_json_schema(schema)
    assert js["properties"]["i"] == {"type": "integer", "minimum": 0}
    assert js["properties"]["b"]["contentEncoding"] == "base64"
    assert js["properties"]["s"]["properties"]["x"] == {"type": "integer"}
    assert js["properties"]["arr"]["minItems"] == 2
    assert js["required"] == ["arr", "b", "i", "s"]


def test_document_schema_fast_path_matches_string_path():
    """The value-level per-doc fast path must be byte-identical (incl. key
    order — dedup keys serialize in insertion order) to the string-based
    builder round trip for every payload shape."""
    import json
    import random

    from polars_genson_ray.core.config import SchemaInferenceConfig
    from polars_genson_ray.core.infer import (
        _document_schema_from_text,
        document_schema,
    )

    random.seed(7)

    def rand_value(depth=0):
        opts = ["int", "float", "str", "bool", "null", "dict", "list"]
        if depth > 3:
            opts = opts[:5]
        t = random.choice(opts)
        if t == "int":
            return random.randint(-(10**12), 10**12)
        if t == "float":
            return random.choice([1.5, -0.0, 1e300, 3.14159])
        if t == "str":
            return random.choice(["", "a{b}", "[1,2]", "héllo", '"q"', "\\ e"])
        if t == "bool":
            return random.choice([True, False])
        if t == "null":
            return None
        if t == "dict":
            return {f"k{i}": rand_value(depth + 1) for i in range(random.randint(0, 4))}
        return [rand_value(depth + 1) for _ in range(random.randint(0, 4))]

    cfgs = [
        SchemaInferenceConfig(),
        SchemaInferenceConfig(wrap_root="root"),
        SchemaInferenceConfig(schema_uri=None),
        SchemaInferenceConfig(schema_uri="http://x/y"),
    ]
    cases = [json.dumps(rand_value()) for _ in range(500)]
    cases += ["  ", "", "\n", '  {"a": 1}  ', ' [1, {"b":2}] ', "5", '"x{y}"']
    for text in cases:
        for cfg in cfgs:
            a = document_schema(text, 0, cfg)
            b = _document_schema_from_text(text, 0, cfg)
            assert json.dumps(a, sort_keys=False) == json.dumps(b, sort_keys=False), text


def test_schema_to_json_serde_representation_roundtrip():
    """A6: schema JSON uses the polars-rs serde encoding (schema.rs:19-95)
    — exchangeable with the reference toolchain — and round-trips."""
    import json as _json

    from polars_genson_ray.api import json_to_schema, schema_to_json

    schema = pl.Schema(
        {
            "a": pl.Int64,
            "s": pl.String,
            "tags": pl.List(pl.String),
            "matrix": pl.List(pl.List(pl.Int64)),
            "user": pl.Struct({"id": pl.Int64, "name": pl.String}),
            "ts": pl.Datetime("us", "UTC"),
            "dur": pl.Duration("ms"),
            "arr": pl.Array(pl.Float64, 3),
            "price": pl.Decimal(10, 2),
            "d": pl.Date,
        }
    )
    js = schema_to_json(schema)
    parsed = _json.loads(js)
    # externally-tagged serde shapes
    assert parsed["a"] == "Int64" and parsed["s"] == "String"
    assert parsed["tags"] == {"List": "String"}
    assert parsed["matrix"] == {"List": {"List": "Int64"}}
    assert parsed["user"] == {
        "Struct": [
            {"name": "id", "dtype": "Int64"},
            {"name": "name", "dtype": "String"},
        ]
    }
    assert parsed["ts"] == {"Datetime": ["Microseconds", "UTC"]}
    assert parsed["dur"] == {"Duration": "Milliseconds"}
    assert parsed["arr"] == {"Array": ["Float64", 3]}
    assert parsed["price"] == {"Decimal": [10, 2]}
    assert parsed["d"] == "Date"
    assert json_to_schema(js) == schema
    # legacy dtype-string values still accepted on input
    legacy = _json.dumps({"x": "List[Int64]", "y": "Int32"})
    got = json_to_schema(legacy)
    assert got == pl.Schema({"x": pl.List(pl.Int64), "y": pl.Int32})


def test_add_schemas_batch_matches_sequential():
    """C4: the strategy/property-grouped batch merge must be byte-identical
    to sequential add_schema for every schema shape (incl. typeless, anyOf
    and type-list decomposition interleavings)."""
    import json as _json
    import random

    from polars_genson_ray.core.json_schema import SchemaBuilder

    random.seed(3)

    def rand_schema(depth=0):
        opts = ["scalar", "obj", "list", "tuple", "anyof", "typeless", "typelist"]
        if depth > 2:
            opts = ["scalar"]
        t = random.choice(opts)
        if t == "scalar":
            return {"type": random.choice(["string", "integer", "number", "boolean", "null"])}
        if t == "obj":
            return {
                "type": "object",
                "properties": {f"k{i}": rand_schema(depth + 1) for i in range(random.randint(0, 3))},
                "required": [f"k{i}" for i in range(random.randint(0, 2))],
            }
        if t == "list":
            return {"type": "array", "items": rand_schema(depth + 1)}
        if t == "tuple":
            return {"type": "array", "items": [rand_schema(depth + 1) for _ in range(2)]}
        if t == "anyof":
            return {"anyOf": [rand_schema(depth + 1) for _ in range(2)]}
        if t == "typeless":
            return {"foo": random.randint(0, 5)}
        return {"type": ["string", "integer"]}

    for _ in range(300):
        schemas = [rand_schema() for _ in range(random.randint(1, 8))]
        b1, b2 = SchemaBuilder(), SchemaBuilder()
        for s in schemas:
            b1.add_schema(_json.loads(_json.dumps(s)))
        b2.add_schemas([_json.loads(_json.dumps(s)) for s in schemas])
        assert _json.dumps(b1.to_schema()) == _json.dumps(b2.to_schema())


def test_unify_field_schemas_tree_matches_sequential():
    """T5: the ≥50-schema divide-and-conquer unification path must agree
    with the sequential fold on homogeneous record sets."""
    from polars_genson_ray.core.config import SchemaInferenceConfig
    from polars_genson_ray.core.unification import (
        _unify_field_schemas,
        _unify_field_schemas_sequential,
    )

    cfg = SchemaInferenceConfig(unify_maps=True)
    # 60 homogeneous object schemas (same property set — the shape the
    # reference routes to its parallel path; heterogeneous sets may fold
    # to different property order / requiredness under ANY tree fold,
    # reference included) with nullable/type variations
    schemas = []
    for i in range(60):
        props = {
            "a": {"type": "string"},
            "b": {"type": ["null", "integer"] if i % 2 else "integer"},
            "c": {"type": ["null", "string"] if i % 3 else "string"},
        }
        schemas.append(
            {"type": "object", "properties": props, "required": sorted(props)}
        )
    tree = _unify_field_schemas("f", schemas, "$", cfg)
    seq = _unify_field_schemas_sequential("f", schemas, "$", cfg)
    assert tree == seq and tree is not None
    # dispatch: <50 schemas stays on the sequential fold
    small = schemas[:20]
    assert _unify_field_schemas("f", small, "$", cfg) == \
        _unify_field_schemas_sequential("f", small, "$", cfg)


def test_avro_to_polars_schema_and_schema_to_dict():
    """A6 surface: Avro JSON → pl.Schema, and pl.Schema → nested dict
    (reference polars-genson-py __init__.py:1236-1276)."""
    import json

    import polars as pl

    from polars_genson_ray.api import (
        avro_to_polars_schema,
        infer_avro_schema,
        schema_to_dict,
    )

    docs = ['{"name": "a", "age": 1}', '{"name": "b", "age": 2, "tags": ["x"]}']
    avro = infer_avro_schema(docs)
    schema = avro_to_polars_schema(json.dumps(avro))
    assert isinstance(schema, pl.Schema)
    assert set(schema.names()) == {"name", "age", "tags"}
    assert schema["tags"] == pl.List(pl.String)

    d = schema_to_dict(schema)
    assert d["name"] == "String" and d["age"] == "Int64"
    nested = pl.Schema({"s": pl.Struct({"x": pl.Int64}), "v": pl.List(pl.Float64)})
    dn = schema_to_dict(nested)
    assert dn["s"] == {"x": "Int64"}
