"""Distributed genson-style schema inference as Ray Data stages.

Pipeline shape (SURVEY.md §3.1 "Ray lifecycle equivalent"):

  read → map_batches(SchemaPartialBatch, batch_format="pyarrow")
       → tiny partial rows (one per block: merged partial schema JSON +
         distinct-doc-schema keys + counts)
       → ordered driver-side reduce (partials are a few KiB each)
       → finalize_schema (map inference / unification / reorder / Avro)

Correctness notes:
  - the per-document schema build applies ``force_field_types`` pre-merge
    exactly like the reference's parallel path (schema.rs:427), so the merge
    is a commutative monoid and regrouping by block is sound;
  - first-seen property order is recovered by reducing partials in block
    order (map_batches preserves logical order);
  - ``processed_count`` counts globally distinct per-document schemas —
    the reference's parallel-path semantics (schema.rs:429-434) — via a
    union of per-block key sets (schema variety is structurally bounded, so
    these sets stay tiny even at 10^12 rows).

Scale notes: the only non-map_batches step is the reduce over one small row
per block. For very large block counts this can be tree-reduced by an extra
``map_batches`` round over the partials; at 10^6 blocks the driver reduce
is still only ~10^6 tiny merges.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..core import (
    SchemaBuilder,
    SchemaInferenceConfig,
    SchemaInferenceResult,
    document_schema,
    finalize_schema,
    schema_dedup_key,
    wire_mode,
)

PARTIAL_SCHEMA_COL = "partial_schema"
PARTIAL_KEYS_COL = "doc_schema_keys"
PARTIAL_ROWS_COL = "rows_seen"
PARTIAL_INVALID_COL = "invalid_rows"


class SchemaPartialBatch:
    """``map_batches`` callable: one Arrow batch of JSON strings in → one
    partial-schema row out. Stateless (plain function semantics), but kept a
    class so config parses once per actor when used with ``concurrency``.

    ``strict=True`` mirrors the reference: one invalid document fails the
    whole column (genson-core/src/schema.rs:198-204). ``strict=False`` is
    the validation-engine divergence (SURVEY.md §7.4): invalid rows are
    counted and skipped — they surface as violation rows, not job failures.
    """

    def __init__(
        self,
        column: str,
        config: SchemaInferenceConfig | None = None,
        *,
        strict: bool = False,
    ):
        self.column = column
        self.config = config or SchemaInferenceConfig()
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial = self.compute(batch[self.column].to_pylist())
        return pa.table(
            {
                PARTIAL_SCHEMA_COL: pa.array(
                    [partial["schema_json"]], pa.large_string()
                ),
                PARTIAL_KEYS_COL: pa.array(
                    [partial["keys"]], pa.list_(pa.large_string())
                ),
                PARTIAL_ROWS_COL: pa.array([partial["rows"]], pa.int64()),
                PARTIAL_INVALID_COL: pa.array([partial["invalid"]], pa.int64()),
            }
        )

    def compute(self, texts) -> dict:
        """The partial as a plain dict (for callers fusing several partials
        into one pass)."""
        from ..core.infer import SchemaInferenceError

        builder = SchemaBuilder(schema_uri=self.config.schema_uri)
        seen: dict[str, None] = {}
        rows = 0
        invalid = 0
        for i, text in enumerate(texts):
            if text is None or not str(text).strip():
                continue
            rows += 1
            try:
                schema = document_schema(str(text), i, self.config)
            except SchemaInferenceError:
                if self.strict:
                    raise
                invalid += 1
                continue
            if schema is None:
                continue
            key = schema_dedup_key(schema)
            if key in seen:
                continue
            seen[key] = None
            builder.add_schema(schema)
        # wire emission keeps "required": [] when the in-batch intersection
        # emptied it — without this the partial merge is not a monoid and
        # the reduced schema would depend on batch boundaries (which Ray
        # does not guarantee to be deterministic)
        with wire_mode():
            schema_json = json.dumps(builder.to_schema())
        return {
            "schema_json": schema_json,
            "keys": list(seen),
            "rows": rows,
            "invalid": invalid,
        }


def reduce_partials(
    partial_rows, config: SchemaInferenceConfig
) -> SchemaInferenceResult:
    """Ordered merge of partial-schema rows (driver-side; input is tiny).
    Accepts take_all rows (PARTIAL_* columns) or the plain dicts that
    ``SchemaPartialBatch.compute`` emits.

    Partials are merged under :class:`wire_mode` (an explicit empty
    ``required`` list means empty-after-intersection, not the reference's
    include-empty-required quirk); the FINAL emission below runs outside
    wire mode, so an empty intersection is dropped exactly like the
    sequential path. Pre-wire checkpointed partials (no ``required`` key
    where the set was empty) merge as "no constraint" — same as before."""
    builder = SchemaBuilder(schema_uri=config.schema_uri)
    all_keys: dict[str, None] = {}
    invalid = 0
    with wire_mode():
        for row in partial_rows:
            schema_json = row.get("schema_json") or row[PARTIAL_SCHEMA_COL]
            keys = row["keys"] if "keys" in row else row[PARTIAL_KEYS_COL]
            invalid += int(
                row.get("invalid") or row.get(PARTIAL_INVALID_COL) or 0
            )
            for key in keys:
                all_keys[key] = None
            builder.add_schema(json.loads(schema_json))
    schema = finalize_schema(builder.to_schema(), config)
    return SchemaInferenceResult(
        schema=schema, processed_count=len(all_keys), invalid_count=invalid
    )


def grouped_schema_infer(
    ds,
    key_column: str,
    column: str,
    config: SchemaInferenceConfig | None = None,
    *,
    batch_size: int = 8192,
    small: bool = True,
):
    """Per-key merged schemas: one genson schema per distinct value of
    ``key_column`` (the north-star's "per-partition schemas reduced with
    groupby-aggregate", keyed by a column instead of the input fragment).

    Same monoid shape as :func:`infer_schema_distributed`, keyed: each
    batch emits one partial-schema row PER KEY it contains, so the
    exchange carries ``n_blocks × n_keys`` tiny schema rows — never the
    documents. ``small=True`` merges all keys in one coalesced task
    (bounded key sets); ``small=False`` merges under a keyed groupby.
    Returns a Dataset of (key, schema_json, processed_docs, invalid_docs).
    """
    import pandas as pd

    config = config or SchemaInferenceConfig()
    fn = SchemaPartialBatch(column, config)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_column, column]).to_pandas()
        keys, schemas, keysets, invalid = [], [], [], []
        for k, g in df.groupby(key_column, sort=False):
            p = fn.compute(g[column].tolist())
            keys.append(k)
            schemas.append(p["schema_json"])
            keysets.append(p["keys"])
            invalid.append(p["invalid"])
        return pa.table(
            {
                key_column: pa.array(keys),
                "schema_json": pa.array(schemas, pa.large_string()),
                "keys": pa.array(keysets, pa.list_(pa.large_string())),
                "invalid": pa.array(invalid, pa.int64()),
            }
        )

    parts = ds.select_columns([key_column, column]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in df.groupby(key_column, sort=False):
            res = reduce_partials(g.to_dict("records"), config)
            rows.append(
                {
                    key_column: k,
                    "schema_json": json.dumps(res.schema, sort_keys=True),
                    "processed_docs": res.processed_count,
                    "invalid_docs": res.invalid_count,
                }
            )
        return pd.DataFrame(rows)

    if small:
        return parts.repartition(1).map_batches(
            combine, batch_format="pandas", batch_size=None
        )
    from .aggregate import bucketed_groups

    # one exchange on a key-hash bucket, one combine call per bucket (a
    # bucket holds whole keys, so the per-key monoid reduce stays correct)
    return bucketed_groups(parts, [key_column], combine)


def infer_schema_distributed(
    ds,
    column: str,
    config: SchemaInferenceConfig | None = None,
    *,
    batch_size: int = 8192,
    strict: bool = False,
) -> SchemaInferenceResult:
    """Infer the merged schema of a JSON-string column of a Dataset.

    ``ds`` streams; only one tiny partial row per block is collected.
    """
    config = config or SchemaInferenceConfig()
    partials = ds.select_columns([column]).map_batches(
        SchemaPartialBatch(column, config, strict=strict),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    rows = partials.take_all()  # one small row per block
    return reduce_partials(rows, config)
