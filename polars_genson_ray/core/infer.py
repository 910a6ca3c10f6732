"""Schema inference over collections of JSON strings.

Replicates the reference pipeline ``infer_json_schema_from_strings``
(genson-core/src/schema.rs:551-628):

  prepare (validate [+NDJSON], wrap_root)
    → per-document schema build (outer-array unwrap, concatenated objects)
    → merge (sequential <10 docs: raw merge, count all non-empty;
             parallel ≥10 docs: per-doc schema, force_field_types pre-applied,
             xxh-style dedup, count distinct)
    → finalize (preprocess_force_field_types → rewrite_objects →
                reorder_unions → optional Avro)

Notable mirrored quirks:
  - ``ignore_outer_array=False`` has no effect through this entry point: the
    array wrap is applied to the *return value* of the reference's
    ``build_json_schema``, which both merge paths discard
    (schema.rs:270, :398 assign to ``_``), keeping only builder state.
  - top-level scalar documents contribute nothing (``trim_to_object``
    scans for ``{``/``[`` only, genson_rs/mod.rs:129-144).

Divergence (documented): concatenated-object splitting is string-aware here;
the reference's brace counter miscounts braces inside JSON strings and
panics on such input (genson_rs/mod.rs:84-100). We only hit the splitter
when the payload is not a single valid JSON value, so behaviour on all
reference-test inputs is identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from .config import SchemaInferenceConfig
from .json_schema import _DEFAULT_SCHEMA_URI, SchemaBuilder
from .map_inference import rewrite_objects
from .reorder import reorder_unions
from .transforms import apply_force_field_types, preprocess_force_field_types

MAX_JSON_ERROR_LENGTH = 100
PARALLEL_THRESHOLD = 10


class SchemaInferenceError(ValueError):
    """Raised for invalid input, mirroring the reference's error strings."""


@dataclass
class SchemaInferenceResult:
    schema: dict
    processed_count: int
    invalid_count: int = 0


def _truncate_doc(s: str) -> str:
    if len(s) > MAX_JSON_ERROR_LENGTH:
        return (
            f"{s[:MAX_JSON_ERROR_LENGTH]}... "
            f"[truncated {len(s) - MAX_JSON_ERROR_LENGTH} chars]"
        )
    return s


def prepare_json_text(text: str, index: int, config: SchemaInferenceConfig) -> str:
    """Validate (and optionally wrap) one cell's JSON payload.

    Returns the possibly-rewritten payload, or ``""`` for blank cells.
    Mirrors ``prepare_json_bytes`` (schema.rs:160-238).
    """
    if not text.strip():
        return ""

    if config.delimiter is not None and config.delimiter != "\n":
        raise SchemaInferenceError(f"Unsupported delimiter: {config.delimiter!r}")

    try:
        if config.delimiter == "\n":
            for line in text.splitlines():
                line = line.strip()
                if line:
                    json.loads(line)
        else:
            json.loads(text)
    except (ValueError, RecursionError) as e:
        raise SchemaInferenceError(
            f"Invalid JSON input at index {index + 1}: {e} - JSON: {_truncate_doc(text)}"
        ) from None

    if config.wrap_root is not None:
        field = config.wrap_root
        if config.delimiter == "\n":
            out_lines = []
            for line in text.splitlines():
                line = line.strip()
                if not line:
                    continue
                out_lines.append(json.dumps({field: json.loads(line)}))
            return "\n".join(out_lines)
        return json.dumps({field: json.loads(text)})

    return text


# ---------------------------------------------------------------------------
# Document extraction (trim_to_object / outer array / concatenated objects)
# ---------------------------------------------------------------------------

def _trim_to_object(s: str) -> str:
    """Keep the span from the first '{'/'[' to the last '}'/']'."""
    start = None
    for i, c in enumerate(s):
        if c in "{[":
            start = i
            break
    if start is None:
        return ""
    end = None
    for i in range(len(s) - 1, -1, -1):
        if s[i] in "}]":
            end = i + 1
            break
    if end is None or end <= start:
        return ""
    return s[start:end]


def _split_concatenated(s: str) -> list:
    """Parse a slice holding one or more concatenated/comma-separated JSON
    objects into Python values. String-aware scan over top-level braces."""
    s = s.strip()
    if not s:
        return []
    try:
        return [json.loads(s)]
    except ValueError:
        pass
    values = []
    depth = 0
    in_str = False
    esc = False
    chunk_start = None
    for i, c in enumerate(s):
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c in "{[":
            if depth == 0:
                chunk_start = i
            depth += 1
        elif c in "}]":
            depth -= 1
            if depth == 0 and chunk_start is not None:
                chunk = s[chunk_start : i + 1]
                try:
                    values.append(json.loads(chunk))
                except ValueError:
                    pass
                chunk_start = None
    return values


# interned scalar leaf schemas: the fast path emits these SHARED dicts for
# every scalar value — the dominant allocation of map-heavy documents.
# Safety contract: nothing downstream mutates an incoming subschema in
# place (strategies borrow, to_schema deep-copies on emission, and
# transforms._apply replaces forced-field entries instead of mutating —
# see the comment there).
_SCALAR_SCHEMAS = {
    "string": {"type": "string"},
    "boolean": {"type": "boolean"},
    "integer": {"type": "integer"},
    "number": {"type": "number"},
    "null": {"type": "null"},
    "object": {"type": "object"},
}

# record-schema interning: identical object VALUES produce the SAME schema
# dict. Key = (property name, id(child schema)) pairs — valid because every
# child is itself interned (scalar singleton or cached record) and each
# cache entry keeps its children alive through ``properties``, so ids can't
# be recycled while the entry exists. The payoff is downstream:
# ``SchemaNode.add_schemas`` identity-dedups its batch, so the K identical
# {language, value} records of a wide Wikidata-style map merge ONCE instead
# of K times (the merge is a join-semilattice — a ⊔ a = a — so dropping
# later duplicates is exact).
_RECORD_CACHE: dict[tuple, dict] = {}
_RECORD_CACHE_LIMIT = 65536


def _fast_value_schema(v):
    """Direct schema of one JSON value, bypassing the strategy machinery —
    byte-identical to ``SchemaBuilder().add_schema(...).to_schema()`` of a
    fresh builder round trip for list-free values (scalar emission,
    first-seen property order, sorted ``required``; object emission order
    is the round trip's properties→required→type — the per-doc dedup key
    serializes in insertion order, so the order is part of the contract).
    Returns None when a list (ListStrategy merge semantics needed) or
    non-JSON type is present; callers then fall back."""
    t = type(v)
    if t is str:
        return _SCALAR_SCHEMAS["string"]
    if t is bool:
        return _SCALAR_SCHEMAS["boolean"]
    if t is int:
        return _SCALAR_SCHEMAS["integer"]
    if t is float:
        return _SCALAR_SCHEMAS["number"]
    if v is None:
        return _SCALAR_SCHEMAS["null"]
    if t is dict:
        if not v:
            return _SCALAR_SCHEMAS["object"]
        props = {}
        key_parts = []
        for k, x in v.items():
            s = _fast_value_schema(x)
            if s is None:
                return None
            props[k] = s
            key_parts.append((k, id(s)))
        ck = tuple(key_parts)
        cached = _RECORD_CACHE.get(ck)
        if cached is not None:
            return cached
        schema = {"properties": props, "required": sorted(props), "type": "object"}
        if len(_RECORD_CACHE) >= _RECORD_CACHE_LIMIT:
            # whole-cache clear only: partial eviction is safe too (entries
            # pin their key ids via properties), but clearing is simpler
            # and this bound is far above any real schema diversity
            _RECORD_CACHE.clear()
        _RECORD_CACHE[ck] = schema
        return schema
    return None


def _merge_values_into(builder: SchemaBuilder, values: list) -> None:
    """Fold parsed values through a throw-away builder, then merge its schema
    (mirrors ``add_schema_from_object_par_iter``, genson_rs/mod.rs:103-126)."""
    if len(values) == 1:
        fast = _fast_value_schema(values[0])
        if fast is not None:
            builder.add_schema(fast)
            return
    combined = SchemaBuilder(schema_uri=None)
    for v in values:
        combined.add_object(v)
    builder.add_schema(combined.to_schema())


def build_document_schema(builder: SchemaBuilder, text: str, config: SchemaInferenceConfig) -> None:
    """Mirror ``build_json_schema`` (genson_rs/mod.rs:44-72) for one cell."""
    s = _trim_to_object(text)
    if not s:
        return
    if s[0] == "[" and s[-1] == "]":
        # outer array: stream the elements (objects only, scalars dropped)
        inner = s[1 : len(s) - 1]
        values = [v for v in _split_concatenated(inner) if isinstance(v, (dict, list))]
        _merge_values_into(builder, values)
        return
    if config.delimiter == "\n":
        values = []
        for line in s.split("\n"):
            line = _trim_to_object(line)
            if not line:
                continue
            values.extend(_split_concatenated(line))
    else:
        values = _split_concatenated(s)
    _merge_values_into(builder, values)


# ---------------------------------------------------------------------------
# Per-document schema (the distributable unit) and merge paths
# ---------------------------------------------------------------------------

def _schema_uri_base(config: SchemaInferenceConfig) -> dict:
    """The ``$schema`` base dict a fresh SchemaBuilder(config.schema_uri)
    would emit (builder.rs:13-41 semantics)."""
    if config.schema_uri is None:
        return {}
    if config.schema_uri == "AUTO":
        return {"$schema": _DEFAULT_SCHEMA_URI}
    return {"$schema": config.schema_uri}


def document_schema(text: str, index: int, config: SchemaInferenceConfig) -> dict | None:
    """Build one cell's standalone schema (the parallel path's per-doc unit,
    schema.rs:369-410). Returns ``None`` for blank cells.

    ``force_field_types`` is applied pre-merge (schema.rs:427) so that the
    result can be merged commutatively — this is exactly the payload the Ray
    per-batch partial inference emits.

    Fast path (delimiter=None): parse the payload ONCE and derive the doc
    schema from the value directly — the string path parses, re-serializes
    the wrap, and parses again (measured ~35% of inference wall time).
    Top-level scalar payloads keep the string path: the reference's byte
    scan can resurrect values from braces inside a scalar string
    (genson_rs/mod.rs:129-144), which only the raw text reveals.
    """
    if config.delimiter is not None:
        return _document_schema_from_text(text, index, config)
    if not text.strip():
        return None
    try:
        value = json.loads(text)
    except (ValueError, RecursionError) as e:
        raise SchemaInferenceError(
            f"Invalid JSON input at index {index + 1}: {e} - JSON: {_truncate_doc(text)}"
        ) from None
    if config.wrap_root is not None:
        value = {config.wrap_root: value}
    if type(value) is dict:
        fast = _fast_value_schema(value)
        if fast is not None:
            schema = _schema_uri_base(config)
            if config.force_field_types:
                # the fast schema tree is interned/shared; the forced-field
                # rewrite replaces entries inside its properties dicts, so
                # it needs a private copy (rare path — only when the knob
                # is set)
                from .json_schema import _deepcopy

                fast = _deepcopy(fast)
            schema.update(fast)
            apply_force_field_types(schema, config)
            return schema
        values = [value]
    elif type(value) is list:
        # outer array streams the elements, objects/arrays only — the
        # value-level filter equals _split_concatenated on the raw slice
        values = [v for v in value if isinstance(v, (dict, list))]
    else:
        return _document_schema_from_text(text, index, config)
    doc_builder = SchemaBuilder(schema_uri=config.schema_uri)
    _merge_values_into(doc_builder, values)
    schema = doc_builder.to_schema()
    apply_force_field_types(schema, config)
    return schema


def _document_schema_from_text(text: str, index: int, config: SchemaInferenceConfig) -> dict | None:
    """String-based per-doc schema (NDJSON delimiter and scalar-payload
    quirk paths)."""
    prepared = prepare_json_text(text, index, config)
    if not prepared:
        return None
    doc_builder = SchemaBuilder(schema_uri=config.schema_uri)
    build_document_schema(doc_builder, prepared, config)
    schema = doc_builder.to_schema()
    apply_force_field_types(schema, config)
    return schema


def schema_dedup_key(schema: dict) -> str:
    """Stable serialisation used for duplicate-schema detection
    (xxh64-of-string in the reference, schema.rs:429-434)."""
    return json.dumps(schema, separators=(",", ":"), sort_keys=False)


def merge_document_schemas(
    builder: SchemaBuilder,
    schemas,
    seen: set | None = None,
) -> int:
    """Merge per-document schemas with duplicate skipping; returns the number
    of distinct schemas merged (the parallel path's ``processed_count``)."""
    if seen is None:
        seen = set()
    batch: list = []
    for schema in schemas:
        if schema is None:
            continue
        key = schema_dedup_key(schema)
        if key in seen:
            continue
        seen.add(key)
        batch.append(schema)
    # C4 batch merge: one grouped traversal over the distinct schemas
    # (strategy- and property-grouped) instead of one full pass per schema
    builder.add_schemas(batch)
    return len(batch)


def finalize_schema(schema: dict, config: SchemaInferenceConfig) -> dict:
    """Driver-side post-processing of the merged schema (schema.rs:585-595)."""
    t0 = time.perf_counter() if config.profile else 0.0
    preprocess_force_field_types(schema, config)
    rewrite_objects(schema, None, config, is_root=True)
    reorder_unions(schema)
    if config.profile:
        from .diagnostics import profile

        profile(
            config,
            f"Finalize (map inference + reorder) took "
            f"{time.perf_counter() - t0:.4f}s",
        )
    if config.avro:
        from .avro import json_schema_to_avro

        return json_schema_to_avro(schema, namespace="genson")
    return schema


def infer_json_schema_from_strings(
    json_strings,
    config: SchemaInferenceConfig | None = None,
) -> SchemaInferenceResult:
    """Single-process reference-equivalent inference (the conformance path).

    The Ray pipeline composes the same pieces: ``document_schema`` per row in
    ``map_batches``, ``merge_document_schemas`` per block and in the global
    aggregate, then one ``finalize_schema`` call on the tiny merged schema.
    """
    if config is None:
        config = SchemaInferenceConfig()
    json_strings = list(json_strings)
    if not json_strings:
        raise SchemaInferenceError("No JSON strings provided")

    env = os.environ.get("GENSON_PARALLEL")
    if env is not None:
        use_parallel = env == "1" or env.lower() == "true"
    else:
        use_parallel = len(json_strings) >= PARALLEL_THRESHOLD

    builder = SchemaBuilder(schema_uri=config.schema_uri)
    if use_parallel:
        from .diagnostics import profile, profile_rss

        chunk = config.max_builders or len(json_strings)
        processed = 0
        seen: set = set()
        profile_rss(config, "before parallel processing")
        for start in range(0, len(json_strings), chunk):
            t0 = time.perf_counter() if config.profile else 0.0
            schemas = (
                document_schema(s, start + i, config)
                for i, s in enumerate(json_strings[start : start + chunk])
            )
            processed += merge_document_schemas(builder, schemas, seen)
            if config.profile:
                profile(
                    config,
                    f"Processed chunk {start // chunk} "
                    f"({min(chunk, len(json_strings) - start)} strings) in "
                    f"{time.perf_counter() - t0:.4f}s",
                )
                profile_rss(config, f"after chunk {start // chunk}")
    else:
        processed = 0
        for i, text in enumerate(json_strings):
            prepared = prepare_json_text(text, i, config)
            if not prepared:
                continue
            build_document_schema(builder, prepared, config)
            processed += 1

    final_schema = builder.to_schema()
    final_schema = finalize_schema(final_schema, config)
    return SchemaInferenceResult(schema=final_schema, processed_count=processed)
