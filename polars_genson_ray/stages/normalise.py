"""Ray-native normalisation stages.

``NormaliseStage``: pass-2 normalisation against a broadcast Avro schema
(strings in → normalised JSON strings out).

``NormaliseDecodeStage``: the fused pass the reference needs three passes
for (SURVEY.md §3.2) — normalise + decode to *typed* Arrow columns in one
``map_batches``, using the polars ``str.json_decode`` kernel per batch with
the dtype derived once from the broadcast schema.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..api import normalise_rows
from ..core.dtypes import avro_schema_to_polars_fields, parse_polars_dtype


class NormaliseStage:
    def __init__(self, schema_ref, column: str, *, map_encoding: str = "kv",
                 empty_as_null: bool = True, coerce_strings: bool = False,
                 wrap_root: str | None = None, out_column: str = "normalised"):
        self.schema_ref = schema_ref
        self.column = column
        self.out_column = out_column
        self.map_encoding = map_encoding
        self.empty_as_null = empty_as_null
        self.coerce_strings = coerce_strings
        self.wrap_root = wrap_root
        self._schema = None

    def _get_schema(self):
        if self._schema is None:
            s = self.schema_ref
            self._schema = ray.get(s) if isinstance(s, ray.ObjectRef) else s
        return self._schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        normed = normalise_rows(
            batch[self.column].to_pylist(),
            self._get_schema(),
            map_encoding=self.map_encoding,
            empty_as_null=self.empty_as_null,
            coerce_strings=self.coerce_strings,
            wrap_root=self.wrap_root,
        )
        return batch.append_column(
            self.out_column, pa.array(normed, pa.large_string())
        )


class NormaliseDecodeStage(NormaliseStage):
    """Normalise then decode into one typed Arrow column per schema field
    (kv map encoding enforced, as the reference's decode path requires)."""

    def __init__(self, schema_ref, column: str, **kwargs):
        kwargs["map_encoding"] = "kv"
        super().__init__(schema_ref, column, **kwargs)
        self._dtype = None

    def _get_dtype(self):
        if self._dtype is None:
            import polars as pl

            fields = avro_schema_to_polars_fields(self._get_schema())
            self._dtype = pl.Struct(
                {name: parse_polars_dtype(t) for name, t in fields}
            )
        return self._dtype

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        normed = normalise_rows(
            batch[self.column].to_pylist(),
            self._get_schema(),
            map_encoding="kv",
            empty_as_null=self.empty_as_null,
            coerce_strings=self.coerce_strings,
            wrap_root=self.wrap_root,
        )
        decoded = (
            pl.Series("d", normed).str.json_decode(self._get_dtype()).to_frame()
        )
        decoded_tbl = decoded.unnest("d").to_arrow()
        out = batch.drop_columns([self.column])
        for name in decoded_tbl.column_names:
            out = out.append_column(name, decoded_tbl[name])
        return out
