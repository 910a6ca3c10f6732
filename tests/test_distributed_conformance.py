"""Distributed == sequential conformance for the Ray inference stage.

The genson merge is a commutative monoid with order canonicalisation; the
Ray path (per-batch partials + ordered reduce) must produce the SAME schema
and processed_count as the reference-equivalent in-process path, for any
batch size.
"""

from __future__ import annotations

import json

import pytest

from polars_genson_ray.core import (
    SchemaInferenceConfig,
    infer_json_schema_from_strings,
)

DOCS = [
    '{"name": "a", "age": 1}',
    '{"name": "b", "age": 2, "city": "x"}',
    '{"labels": {"en": "hi", "fr": "salut"}}',
    '{"field": null}',
    '{"field": "s"}',
    '{"field": 42}',
    '{"nums": [1, 2.5], "strs": "a"}',
    '{"strs": ["b"]}',
    '{"z": 1, "b": 2}',
    '{"b": 3, "a": 4, "z": 5}',
    '{"letter": {"a": {"alphabet": 0, "vowel": 0, "frequency": 0.1}}}',
    '{"letter": {"b": {"alphabet": 1, "consonant": 0, "frequency": 0.2}}}',
    '{"name": "a", "age": 1}',  # duplicate schema (dedup semantics)
] * 3


@pytest.mark.parametrize("batch_size", [1, 3, 7, 64])
@pytest.mark.parametrize(
    "config_kwargs",
    [
        {},
        {"map_threshold": 2, "unify_maps": True},
        {"avro": True, "map_threshold": 2, "unify_maps": True},
    ],
)
def test_distributed_matches_sequential(ray_session, batch_size, config_kwargs):
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.infer import infer_schema_distributed

    config = SchemaInferenceConfig(**config_kwargs)
    expected = infer_json_schema_from_strings(DOCS, config)

    ds = rd.from_pandas(pd.DataFrame({"caption": DOCS}))
    got = infer_schema_distributed(
        ds, "caption", SchemaInferenceConfig(**config_kwargs), batch_size=batch_size
    )
    assert json.dumps(got.schema) == json.dumps(expected.schema)
    assert got.processed_count == expected.processed_count
