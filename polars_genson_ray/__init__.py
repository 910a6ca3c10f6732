"""polars_genson_ray — a Ray-Data-native schema-inference + validation engine.

Re-expresses the capabilities of the reference `lmmx/polars-genson` engine
(genson-style commutative JSON-schema inference, map inference, unification,
normalisation, Avro emission) as Ray Data pipelines, and extends them with
the constraint/validation operators a 100 TB training-data pipeline needs
(column stats, uniqueness, referential checks, drift detection, dedup,
similarity search, text analysis).

Layout:
  core/       pure-Python schema semantics (no Ray)
  stages/     ``map_batches`` stages and mergeable aggregates
  sources/    readers + deterministic synthetic image-table generator
  pipelines/  end-to-end validation pipelines
  state/      checkpoint / lineage store
  functions/  vectorised helpers (pyarrow.compute / numpy)
"""

from .core import (  # noqa: F401
    NormaliseConfig,
    SchemaInferenceConfig,
    infer_json_schema_from_strings,
    json_schema_to_avro,
    normalise_values,
)

__version__ = "0.1.0"
