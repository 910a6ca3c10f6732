"""Configuration objects for schema inference and normalisation.

Semantics mirror the reference engine's config surface
(``genson-core/src/schema/core.rs:5-147`` and ``normalise.rs:17-38``),
re-expressed as plain dataclasses so they serialize cheaply into Ray tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


DEFAULT_SCHEMA_URI = "http://json-schema.org/schema#"

# Map output encodings (reference: genson-core/src/normalise.rs:4-14).
MAP_ENCODING_MAPPING = "mapping"  # {"en": "Hello"}
MAP_ENCODING_ENTRIES = "entries"  # [{"en": "Hello"}]
MAP_ENCODING_KV = "kv"  # [{"key": "en", "value": "Hello"}]


@dataclass
class SchemaInferenceConfig:
    """Knobs for genson-style schema inference.

    Defaults match the reference defaults
    (``genson-core/src/schema/core.rs:123-147``).
    """

    ignore_outer_array: bool = True
    delimiter: str | None = None  # "\n" for NDJSON, else None
    schema_uri: str | None = "AUTO"
    map_threshold: int = 20
    map_max_required_keys: int | None = None
    unify_maps: bool = False
    no_unify: frozenset = field(default_factory=frozenset)
    force_field_types: dict = field(default_factory=dict)
    force_parent_field_types: dict = field(default_factory=dict)
    force_scalar_promotion: frozenset = field(default_factory=frozenset)
    wrap_scalars: bool = True
    wrap_root: str | None = None
    no_root_map: bool = True
    max_builders: int | None = None
    avro: bool = False
    debug: bool = False
    profile: bool = False
    verbosity: str = "normal"

    def __post_init__(self):
        if isinstance(self.no_unify, (list, set, tuple)):
            self.no_unify = frozenset(self.no_unify)
        if isinstance(self.force_scalar_promotion, (list, set, tuple)):
            self.force_scalar_promotion = frozenset(self.force_scalar_promotion)


@dataclass
class NormaliseConfig:
    """Options for normalising JSON values against an Avro schema.

    Defaults match ``genson-core/src/normalise.rs:29-38`` (note the Python
    plugin overrides ``map_encoding`` to ``"kv"``,
    ``polars-genson-py/src/expressions.rs:130-132``).
    """

    empty_as_null: bool = True
    coerce_string: bool = False
    map_encoding: str = MAP_ENCODING_MAPPING
    wrap_root: str | None = None


def make_promoted_scalar_key(field_prefix: str, scalar_type: str) -> str:
    """Synthetic key for promoted scalars (reference: schema/core.rs:206-209)."""
    return f"{field_prefix}__{scalar_type}"
