"""Schema bridges: JSON Schema / Avro ↔ Polars dtype strings / pyarrow.

Mirrors the reference bridge:
  - T11 json_schema_to_polars_fields
    (polars-jsonschema-bridge/src/deserialise.rs:43-110)
  - T12 avro_schema_to_polars_fields (deserialise.rs:55-67, :113-179) —
    Avro maps become ``List[Struct[key:String,value:V]]`` (kv
    materialisation)
  - T13 polars_schema_to_json_schema
    (polars-jsonschema-bridge/src/serialise.rs:65-268)
  - T14 dtype-string parser
    (polars-genson-py/python/polars_genson/dtypes.py:8-130)

plus pyarrow equivalents for the Ray-native decode path.
"""

from __future__ import annotations

import re


class SchemaConversionError(ValueError):
    pass


# ---------------------------------------------------------------------------
# T11/T12: schema → (name, dtype-string) fields
# ---------------------------------------------------------------------------

def json_schema_to_polars_fields(json_schema: dict) -> list[tuple[str, str]]:
    props = json_schema.get("properties")
    if not isinstance(props, dict):
        return []
    return [(name, json_type_to_polars_type(s)) for name, s in props.items()]


def avro_schema_to_polars_fields(avro_schema: dict) -> list[tuple[str, str]]:
    fields = avro_schema.get("fields")
    if not isinstance(fields, list):
        return []
    out = []
    for f in fields:
        if isinstance(f, dict) and "name" in f and "type" in f:
            out.append((str(f["name"]), avro_type_to_polars_type(f["type"])))
    return out


def json_type_to_polars_type(schema) -> str:
    t = schema.get("type") if isinstance(schema, dict) else None
    if t is None or not isinstance(t, str):
        return "String"  # includes nullable ["null", T] unions — ref fallback
    if t == "string":
        return "String"
    if t == "integer":
        return "Int64"
    if t == "number":
        return "Float64"
    if t == "boolean":
        return "Boolean"
    if t == "null":
        return "Null"
    if t == "array":
        items = schema.get("items")
        if items is not None:
            return f"List[{json_type_to_polars_type(items)}]"
        return "List"
    if t == "object":
        props = schema.get("properties")
        if isinstance(props, dict):
            inner = ",".join(
                f"{name}:{json_type_to_polars_type(s)}" for name, s in props.items()
            )
            return f"Struct[{inner}]"
        return "Struct"
    raise SchemaConversionError(f"Unsupported JSON Schema type: {t}")


def avro_type_to_polars_type(avro) -> str:
    if isinstance(avro, str):
        mapping = {
            "string": "String",
            "int": "Int64",
            "long": "Int64",
            "float": "Float64",
            "double": "Float64",
            "boolean": "Boolean",
            "null": "Null",
        }
        if avro in mapping:
            return mapping[avro]
        raise SchemaConversionError(f"Unsupported Avro type: {avro}")
    if isinstance(avro, list):
        non_null = next((t for t in avro if t != "null"), None)
        if non_null is None:
            return "Null"
        return avro_type_to_polars_type(non_null)
    if isinstance(avro, dict):
        t = avro.get("type")
        if t == "array":
            items = avro.get("items")
            if items is not None:
                return f"List[{avro_type_to_polars_type(items)}]"
            return "List"
        if t == "map":
            values = avro.get("values")
            vt = avro_type_to_polars_type(values) if values is not None else "String"
            return f"List[Struct[key:String,value:{vt}]]"
        if t == "record":
            inner = ",".join(
                f"{f['name']}:{avro_type_to_polars_type(f['type'])}"
                for f in avro.get("fields", [])
                if isinstance(f, dict) and "name" in f and "type" in f
            )
            return f"Struct[{inner}]"
        if isinstance(t, (str, list, dict)):
            return avro_type_to_polars_type(t)
    raise SchemaConversionError(f"Unsupported Avro schema element: {avro!r}")


# ---------------------------------------------------------------------------
# T14: dtype-string → polars DataType (and pyarrow DataType)
# ---------------------------------------------------------------------------

def _split_bracketed(fields_str: str) -> list[str]:
    fields, current, bracket, paren = [], "", 0, 0
    for ch in fields_str:
        if ch == "[":
            bracket += 1
        elif ch == "]":
            bracket -= 1
        elif ch == "(":
            paren += 1
        elif ch == ")":
            paren -= 1
        elif ch == "," and bracket == 0 and paren == 0:
            if current.strip():
                fields.append(current.strip())
            current = ""
            continue
        current += ch
    if current.strip():
        fields.append(current.strip())
    return fields


def parse_polars_dtype(dtype_str: str):
    """Parse ``'Struct[id:Int64,name:String]'`` etc. into a polars DataType."""
    import polars as pl

    s = dtype_str.strip()
    if s.startswith("Decimal"):
        m = re.match(r"Decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
        if m:
            return pl.Decimal(int(m.group(1)), int(m.group(2)))
        return pl.Decimal(None, None)
    simple = {
        "String": pl.Utf8, "Int64": pl.Int64, "Int32": pl.Int32,
        "Int16": pl.Int16, "Int8": pl.Int8, "UInt64": pl.UInt64,
        "UInt32": pl.UInt32, "UInt16": pl.UInt16, "UInt8": pl.UInt8,
        "Float64": pl.Float64, "Float32": pl.Float32, "Boolean": pl.Boolean,
        "Date": pl.Date, "Time": pl.Time, "Datetime": pl.Datetime,
        "Duration": pl.Duration, "Null": pl.Null, "Binary": pl.Binary,
        "Categorical": pl.Categorical,
    }
    if s in simple:
        return simple[s]
    if s.startswith("List[") and s.endswith("]"):
        return pl.List(parse_polars_dtype(s[5:-1]))
    if s.startswith("Array[") and s.endswith("]"):
        inner = s[6:-1]
        if "," in inner:
            type_str, _, size_str = inner.rpartition(",")
            try:
                return pl.Array(parse_polars_dtype(type_str.strip()), int(size_str))
            except ValueError:
                pass
        return pl.List(parse_polars_dtype(inner))
    if s.startswith("Struct[") and s.endswith("]"):
        inner = s[7:-1]
        if not inner:
            return pl.Struct([])
        fields = []
        for part in _split_bracketed(inner):
            if ":" not in part:
                continue
            name, _, type_str = part.partition(":")
            fields.append(pl.Field(name.strip(), parse_polars_dtype(type_str.strip())))
        return pl.Struct(fields)
    return pl.Utf8


def polars_dtype_to_string(dtype) -> str:
    """Inverse of :func:`parse_polars_dtype` (the Rust side's dtype-string
    emission format: ``Struct[a:Int64,...]`` / ``List[...]`` /
    ``Array[T,n]`` / ``Decimal(p,s)``)."""
    import polars as pl

    if isinstance(dtype, pl.Struct):
        inner = ",".join(
            f"{f.name}:{polars_dtype_to_string(f.dtype)}" for f in dtype.fields
        )
        return f"Struct[{inner}]"
    if isinstance(dtype, pl.List):
        return f"List[{polars_dtype_to_string(dtype.inner)}]"
    if isinstance(dtype, pl.Array):
        return f"Array[{polars_dtype_to_string(dtype.inner)},{dtype.size}]"
    if isinstance(dtype, pl.Decimal):
        if dtype.precision is not None and dtype.scale is not None:
            return f"Decimal({dtype.precision},{dtype.scale})"
        return "Decimal"
    if dtype == pl.Utf8:
        return "String"
    name = str(dtype)
    return name


def parse_arrow_dtype(dtype_str: str):
    """Same dtype-string mini-language → pyarrow DataType (Ray-native path)."""
    import pyarrow as pa

    s = dtype_str.strip()
    simple = {
        "String": pa.large_string(), "Int64": pa.int64(), "Int32": pa.int32(),
        "Int16": pa.int16(), "Int8": pa.int8(), "UInt64": pa.uint64(),
        "UInt32": pa.uint32(), "UInt16": pa.uint16(), "UInt8": pa.uint8(),
        "Float64": pa.float64(), "Float32": pa.float32(),
        "Boolean": pa.bool_(), "Date": pa.date32(), "Time": pa.time64("us"),
        "Datetime": pa.timestamp("us"), "Duration": pa.duration("us"),
        "Null": pa.null(), "Binary": pa.large_binary(),
        "Categorical": pa.dictionary(pa.int32(), pa.string()),
    }
    if s in simple:
        return simple[s]
    if s.startswith("List[") and s.endswith("]"):
        return pa.list_(parse_arrow_dtype(s[5:-1]))
    if s.startswith("Struct[") and s.endswith("]"):
        inner = s[7:-1]
        fields = []
        for part in _split_bracketed(inner):
            if ":" not in part:
                continue
            name, _, type_str = part.partition(":")
            fields.append((name.strip(), parse_arrow_dtype(type_str.strip())))
        return pa.struct(fields)
    return pa.large_string()


# ---------------------------------------------------------------------------
# T13: polars Schema/DataType → JSON Schema
# ---------------------------------------------------------------------------

def polars_schema_to_json_schema(
    schema,
    *,
    schema_uri: str | None = None,
    title: str | None = None,
    description: str | None = None,
    optional_fields=(),
    additional_properties: bool = False,
) -> dict:
    properties = {}
    required = []
    for name, dtype in dict(schema).items():
        properties[name] = polars_dtype_to_json_schema(dtype)
        if name not in optional_fields:
            required.append(name)
    out: dict = {}
    if schema_uri is not None:
        out["$schema"] = schema_uri
    if title is not None:
        out["title"] = title
    if description is not None:
        out["description"] = description
    out["type"] = "object"
    out["properties"] = properties
    if required:
        out["required"] = sorted(required)
    out["additionalProperties"] = additional_properties
    return out


def polars_dtype_to_json_schema(dtype, *, additional_properties: bool = False) -> dict:
    import polars as pl

    base = dtype.base_type() if hasattr(dtype, "base_type") else dtype
    if base == pl.Boolean:
        return {"type": "boolean"}
    if base in (pl.Int8, pl.Int16, pl.Int32, pl.Int64):
        return {"type": "integer"}
    if base in (pl.UInt8, pl.UInt16, pl.UInt32, pl.UInt64):
        return {"type": "integer", "minimum": 0}
    if base in (pl.Float32, pl.Float64):
        return {"type": "number"}
    if base == pl.Utf8:
        return {"type": "string"}
    if base == pl.Date:
        return {"type": "string", "format": "date"}
    if base == pl.Datetime:
        out = {"type": "string", "format": "date-time"}
        tz = getattr(dtype, "time_zone", None)
        if tz is not None:
            out["description"] = "Date-time with timezone information"
        return out
    if base == pl.Time:
        return {"type": "string", "format": "time"}
    if base == pl.Duration:
        return {
            "type": "string",
            "format": "duration",
            "description": "ISO 8601 duration string",
        }
    if base == pl.List:
        return {"type": "array", "items": polars_dtype_to_json_schema(dtype.inner)}
    if base == pl.Array:
        return {
            "type": "array",
            "items": polars_dtype_to_json_schema(dtype.inner),
            "minItems": dtype.size,
            "maxItems": dtype.size,
        }
    if base == pl.Struct:
        properties = {}
        required = []
        for field in dtype.fields:
            properties[field.name] = polars_dtype_to_json_schema(field.dtype)
            required.append(field.name)
        return {
            "type": "object",
            "properties": properties,
            "required": required,
            "additionalProperties": additional_properties,
        }
    if base == pl.Binary:
        return {
            "type": "string",
            "contentEncoding": "base64",
            "description": "Binary data encoded as base64",
        }
    if base == pl.Decimal:
        out = {"type": "number"}
        precision = getattr(dtype, "precision", None)
        scale = getattr(dtype, "scale", None)
        if precision is not None and scale is not None:
            out["description"] = (
                f"Decimal number with precision {precision} and scale {scale}"
            )
            if scale > 0:
                out["multipleOf"] = 10.0 ** (-scale)
        return out
    if base == pl.Null:
        return {"type": "null"}
    if base == pl.Categorical:
        return {"type": "string", "description": "Categorical data"}
    if base == pl.Enum:
        return {"type": "string", "description": "Enumerated string values"}
    return {"type": "string", "description": f"Unsupported Polars type: {dtype}"}


# ---------------------------------------------------------------------------
# A6: polars-rs serde DataType representation (schema_to_json/json_to_schema,
# polars-genson-py/src/schema.rs:19-95 — field map of serde_json(DataType),
# externally tagged enum encoding)
# ---------------------------------------------------------------------------

_SERDE_UNIT_TYPES = (
    "Int8", "Int16", "Int32", "Int64",
    "UInt8", "UInt16", "UInt32", "UInt64",
    "Float32", "Float64", "Boolean", "String", "Binary",
    "Date", "Time", "Null",
)
_TIME_UNIT_SERDE = {"ns": "Nanoseconds", "us": "Microseconds", "ms": "Milliseconds"}
_TIME_UNIT_PY = {v: k for k, v in _TIME_UNIT_SERDE.items()}


def polars_dtype_to_serde(dtype):
    """One polars dtype → the polars-rs serde JSON value (externally tagged:
    unit variants as strings, parametrized as single-key dicts)."""
    import polars as pl

    base = dtype.base_type() if hasattr(dtype, "base_type") else dtype
    name = str(base)
    if base == pl.Utf8:
        return "String"
    if name in _SERDE_UNIT_TYPES:
        return name
    if base == pl.Datetime:
        return {
            "Datetime": [
                _TIME_UNIT_SERDE[getattr(dtype, "time_unit", "us") or "us"],
                getattr(dtype, "time_zone", None),
            ]
        }
    if base == pl.Duration:
        return {"Duration": _TIME_UNIT_SERDE[getattr(dtype, "time_unit", "us") or "us"]}
    if base == pl.List:
        return {"List": polars_dtype_to_serde(dtype.inner)}
    if base == pl.Array:
        return {"Array": [polars_dtype_to_serde(dtype.inner), dtype.size]}
    if base == pl.Struct:
        return {
            "Struct": [
                {"name": f.name, "dtype": polars_dtype_to_serde(f.dtype)}
                for f in dtype.fields
            ]
        }
    if base == pl.Decimal:
        return {"Decimal": [dtype.precision, dtype.scale]}
    raise ValueError(
        f"No polars-rs serde mapping for dtype {dtype!r}; use the "
        "dtype-string form (polars_dtype_to_string) for this type"
    )


def serde_to_polars_dtype(value):
    """Inverse of :func:`polars_dtype_to_serde`; string values additionally
    accept the dtype-string mini-language (round 1's representation) for
    backward compatibility."""
    import polars as pl

    if isinstance(value, str):
        if value == "String":
            return pl.String
        if value in _SERDE_UNIT_TYPES:
            return getattr(pl, value)
        return parse_polars_dtype(value)
    if not (isinstance(value, dict) and len(value) == 1):
        raise ValueError(f"Invalid serde dtype value: {value!r}")
    tag, body = next(iter(value.items()))
    if tag == "Datetime":
        tu, tz = body
        return pl.Datetime(time_unit=_TIME_UNIT_PY[tu], time_zone=tz)
    if tag == "Duration":
        return pl.Duration(time_unit=_TIME_UNIT_PY[body])
    if tag == "List":
        return pl.List(serde_to_polars_dtype(body))
    if tag == "Array":
        inner, size = body
        return pl.Array(serde_to_polars_dtype(inner), size)
    if tag == "Struct":
        return pl.Struct(
            {f["name"]: serde_to_polars_dtype(f["dtype"]) for f in body}
        )
    if tag == "Decimal":
        prec, scale = body
        return pl.Decimal(prec, scale)
    raise ValueError(f"Unknown serde dtype tag: {tag!r}")
