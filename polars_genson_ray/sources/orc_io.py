"""ORC source/sink for Ray Data.

Ray 2.49 ships no ``read_orc``; this fills the gap with a stripe-streaming
``FileBasedDatasource`` so ORC inputs get the same streaming execution,
column pruning and per-file read parallelism as the built-in formats.
(Source-format breadth mirrors the reference's multi-format ingestion
surface — parquet/CSV/NDJSON readers live in ``parquet_io`` and the
query layer; reference parquet I/O: polars-genson-py/python/polars_genson/
__init__.py infer/normalise_from_parquet.)

Scale notes (100-TB posture):
- Column pruning happens INSIDE the ORC reader (``ORCFile.read_stripe(i,
  columns=[...])``) — only the selected column streams are decoded, the
  rest never leave storage.
- Each stripe yields its own Arrow table, so a multi-stripe file streams
  through the executor as bounded blocks instead of one materialized
  table (stripes are ORC's row-group analogue, ~64 MiB by default).
- File-level parallelism comes free from ``FileBasedDatasource`` (one
  read task per file group); stripe streaming bounds per-task memory.
- The sink writes one file per output block under a directory — the same
  resumable, partitioned layout convention as the parquet sink.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union

import pyarrow as pa
import ray.data as rd
from ray.data.block import Block
from ray.data.datasource import BlockBasedFileDatasink
from ray.data.datasource.file_based_datasource import FileBasedDatasource


class ORCDatasource(FileBasedDatasource):
    """Stripe-streaming ORC reader with reader-side column pruning."""

    _FILE_EXTENSIONS = ["orc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        columns: Optional[List[str]] = None,
        **file_based_datasource_kwargs,
    ):
        super().__init__(paths, **file_based_datasource_kwargs)
        self._columns = list(columns) if columns is not None else None

    def _open_input_source(self, filesystem, path: str, **open_args):
        # ORC footers + stripe index need random access (like parquet);
        # the base class default is a forward-only stream.
        return filesystem.open_input_file(path, **open_args)

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[Block]:
        from pyarrow import orc

        try:
            of = orc.ORCFile(f)
        except pa.lib.ArrowInvalid as e:
            raise ValueError(f"Failed to read ORC file: {path}.") from e
        for i in range(of.nstripes):
            batch = of.read_stripe(i, columns=self._columns)
            # drop schema-level metadata (e.g. a pandas blob round-tripped
            # through the writer): pyarrow>=16 schemas with metadata are
            # unhashable and push Ray shuffles into slow schema unification
            yield pa.Table.from_batches([batch]).replace_schema_metadata(None)


class ORCDatasink(BlockBasedFileDatasink):
    """One ORC file per output block (resumable directory layout)."""

    def __init__(self, path: str, *, compression: str = "zstd", **kwargs):
        super().__init__(path, file_format="orc", **kwargs)
        self._compression = compression

    def write_block_to_file(self, block, file: "pa.NativeFile") -> None:
        from pyarrow import orc

        orc.write_table(
            block.to_arrow().replace_schema_metadata(None),
            file,
            compression=self._compression,
        )


def read_orc(
    paths: Union[str, List[str]],
    *,
    columns: Optional[List[str]] = None,
    **read_kwargs,
) -> "rd.Dataset":
    """``ray.data.read_parquet``-shaped entry point for ORC inputs.

    ``columns`` prunes at the stripe reader (decode-side projection), not
    via a downstream ``select_columns`` — the unselected columns are never
    decoded. Directory reads skip non-``.orc`` files (success markers,
    sidecars) — the base class applies extension filtering only when
    passed explicitly.
    """
    return rd.read_datasource(
        ORCDatasource(
            paths,
            columns=columns,
            file_extensions=ORCDatasource._FILE_EXTENSIONS,
        ),
        **read_kwargs,
    )


def write_orc(ds: "rd.Dataset", path: str, **kwargs) -> None:
    """Write a Dataset as a directory of ORC files (one per block)."""
    ds.write_datasink(ORCDatasink(path, **kwargs))
