"""Pure-Python genson-style schema inference core (no Ray dependency).

The distributable unit is ``document_schema`` (per-row) +
``merge_document_schemas`` (per-block / global reduce) + ``finalize_schema``
(driver-side); ``infer_json_schema_from_strings`` composes them in-process
for conformance testing against the reference engine.
"""

from .avro import json_schema_to_avro
from .config import (
    MAP_ENCODING_ENTRIES,
    MAP_ENCODING_KV,
    MAP_ENCODING_MAPPING,
    NormaliseConfig,
    SchemaInferenceConfig,
    make_promoted_scalar_key,
)
from .infer import (
    SchemaInferenceError,
    SchemaInferenceResult,
    build_document_schema,
    document_schema,
    finalize_schema,
    infer_json_schema_from_strings,
    merge_document_schemas,
    prepare_json_text,
    schema_dedup_key,
)
from .json_schema import SchemaBuilder, SchemaNode, wire_mode
from .map_inference import rewrite_objects
from .normalise import normalise_value, normalise_values
from .reorder import reorder_unions, type_rank
from .unification import check_unifiable_schemas

__all__ = [
    "MAP_ENCODING_ENTRIES",
    "MAP_ENCODING_KV",
    "MAP_ENCODING_MAPPING",
    "NormaliseConfig",
    "SchemaBuilder",
    "SchemaInferenceConfig",
    "SchemaInferenceError",
    "SchemaInferenceResult",
    "SchemaNode",
    "build_document_schema",
    "check_unifiable_schemas",
    "document_schema",
    "finalize_schema",
    "infer_json_schema_from_strings",
    "json_schema_to_avro",
    "make_promoted_scalar_key",
    "merge_document_schemas",
    "normalise_value",
    "normalise_values",
    "prepare_json_text",
    "reorder_unions",
    "rewrite_objects",
    "schema_dedup_key",
    "type_rank",
]
