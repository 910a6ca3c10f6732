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


@pytest.mark.parametrize("small", [True, False])
def test_grouped_schema_infer_matches_per_group_sequential(ray_session, small):
    """Keyed variant: each key's merged schema must equal the sequential
    inference over just that key's documents, for both finish paths."""
    import pandas as pd

    import ray.data as rd

    from polars_genson_ray.stages.infer import grouped_schema_infer

    groups = {
        "click": DOCS[:20],
        "view": DOCS[20:33],
        "scroll": ['{"depth": 1}', '{"depth": 2.5, "el": "div"}'] * 5,
    }
    rows = [(k, d) for k, docs in groups.items() for d in docs]
    df = pd.DataFrame(rows, columns=["event_type", "props"])
    config = SchemaInferenceConfig()
    out = (
        grouped_schema_infer(
            rd.from_pandas(df).repartition(6),
            "event_type",
            "props",
            config,
            batch_size=4,
            small=small,
        )
        .to_pandas()
        .set_index("event_type")
    )
    assert sorted(out.index) == sorted(groups)
    for k, docs in groups.items():
        expected = infer_json_schema_from_strings(docs, config)
        assert out.loc[k, "schema_json"] == json.dumps(
            expected.schema, sort_keys=True
        )
        assert out.loc[k, "processed_docs"] == expected.processed_count


def test_partial_merge_is_batch_boundary_invariant():
    """The wire-mode regression guard: reducing partials must equal the
    sequential result for EVERY batch split. The killer inputs are docs
    whose required-intersection goes empty inside one batch (lossy to
    serialize pre-wire-mode) and empty-object docs (absent ``required``)."""
    import itertools

    from polars_genson_ray.stages.infer import SchemaPartialBatch, reduce_partials

    docs = [
        '{"nums": [1], "strs": ["a"]}',
        '{"other": 1}',
        '{"nums": [2], "strs": ["b"], "extra": true}',
        "{}",
        '{"nested": {"x": 1}}',
        '{"nested": {}}',
    ]
    config = SchemaInferenceConfig()
    expected = infer_json_schema_from_strings(docs, config)
    fn = SchemaPartialBatch("c", config)

    def splits(n, parts):
        for cuts in itertools.combinations(range(1, n), parts - 1):
            bounds = (0, *cuts, n)
            yield [docs[bounds[i] : bounds[i + 1]] for i in range(parts)]

    for parts in (2, 3):
        for chunks in splits(len(docs), parts):
            rows = [fn.compute(c) for c in chunks]
            for perm in itertools.permutations(range(parts)):
                res = reduce_partials([rows[i] for i in perm], config)
                # property order may differ across merge orders; values and
                # required sets may not
                assert json.dumps(res.schema, sort_keys=True) == json.dumps(
                    expected.schema, sort_keys=True
                ), (chunks, perm)
                assert res.processed_count == expected.processed_count


def test_fragment_level_partial_merge_is_wire_mode():
    """The fragment-level re-merge of chunk partials must keep an explicit
    empty required list (wire mode): dropping it would read as 'no
    constraint' at the next merge level, making the final schema depend
    on chunk boundaries."""
    import json

    from polars_genson_ray.core import SchemaInferenceConfig
    from polars_genson_ray.pipelines.validation import _merge_schema_partials
    from polars_genson_ray.stages.infer import reduce_partials
    from polars_genson_ray.stages.infer import SchemaPartialBatch

    cfg = SchemaInferenceConfig()
    spb = SchemaPartialBatch("caption", cfg)

    pa_ = spb.compute(['{"a": 1}'])
    pb_ = spb.compute(['{"b": 2}'])
    frag = _merge_schema_partials([pa_, pb_], cfg.schema_uri)
    assert '"required": []' in frag["schema_json"] or '"required":[]' in (
        frag["schema_json"].replace(" ", "")
    ), frag["schema_json"]

    # a fragment requiring 'a' merged with the empty-required fragment:
    # nothing stays required
    other = spb.compute(['{"a": 3}'])
    final = reduce_partials([frag, other], cfg).schema
    assert "required" not in final, final


def test_partial_merge_invariance_hypothesis_random_json():
    """Property fuzz of the merge monoid on ARBITRARY JSON documents
    (nested dicts/lists, mixed scalar types, empty objects, unicode
    keys): for every drawn corpus, ANY drawn split into partials reduced
    in dataset order must equal single-pass inference byte-for-byte
    (values + required sets; key order canonicalized by sort_keys).

    Chunk ORDER is deliberately not permuted: root-level anyOf branch
    order is first-seen by reference contract (C6/T9 — scalar unions are
    rank-canonicalized, complex-type branches keep first-seen order), and
    the engine's reduce is an ORDERED merge over take_all's
    order-preserving rows, so order invariance is neither promised nor
    required. This fuzz DID catch a real defect: the builder's
    $schema-header leak made results depend on split boundaries for
    root-mixed-type corpora (fixed by always stripping the header)."""
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from polars_genson_ray.stages.infer import (
        SchemaPartialBatch,
        reduce_partials,
    )

    scalar = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-10**6, 10**6),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=6),
    )
    value = st.recursive(
        scalar,
        lambda c: st.one_of(
            st.lists(c, max_size=3),
            st.dictionaries(st.text(max_size=5), c, max_size=3),
        ),
        max_leaves=10,
    )

    configs = [
        {},
        {"map_threshold": 2, "unify_maps": True},
        {"avro": True, "map_threshold": 2, "unify_maps": True},
    ]

    @settings(max_examples=80, deadline=None)
    @given(
        st.lists(value, min_size=1, max_size=5),
        st.data(),
    )
    def check(values, data):
        docs = [_json.dumps(v) for v in values]
        config = SchemaInferenceConfig(
            **data.draw(st.sampled_from(configs))
        )
        expected = infer_json_schema_from_strings(docs, config)
        n = len(docs)
        parts = data.draw(st.integers(1, min(3, n)))
        cuts = sorted(
            data.draw(
                st.lists(st.integers(1, n - 1), min_size=parts - 1,
                         max_size=parts - 1, unique=True)
            )
        ) if parts > 1 else []
        bounds = (0, *cuts, n)
        chunks = [docs[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)]
        fn = SchemaPartialBatch("c", config)
        rows = [fn.compute(c) for c in chunks]
        res = reduce_partials(rows, config)
        assert _json.dumps(res.schema, sort_keys=True) == _json.dumps(
            expected.schema, sort_keys=True
        ), (docs, chunks)
        # processed_count is NOT asserted: the reference counts all docs
        # on its sequential path but distinct schemas on its parallel
        # path (C13), and random corpora hit both duplicate docs and
        # distinct docs with identical schemas — the count conformance
        # for distinct corpora is pinned by the fixed-corpus tests above.

    check()
