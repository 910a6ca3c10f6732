"""ORC source/sink unit tests (``sources/orc_io.py``).

Ray 2.49 ships no ORC reader; ours is a stripe-streaming
``FileBasedDatasource`` with reader-side column pruning. These tests pin
the round-trip, the pruning, and the multi-stripe block layout the scale
story relies on (one stripe = one streamed block, never a whole-file
materialization)."""

import os

import pyarrow as pa
import pytest
from pyarrow import orc

import ray.data as rd

from polars_genson_ray.sources.orc_io import read_orc, write_orc


@pytest.fixture()
def table():
    n = 50_000
    return pa.table(
        {
            "id": pa.array(range(n), type=pa.int64()),
            "name": pa.array([f"row-{i}" for i in range(n)]),
            "value": pa.array([i * 0.25 for i in range(n)]),
        }
    )


def test_round_trip_directory(ray_session, tmp_path, table):
    out = str(tmp_path / "orc_dir")
    write_orc(rd.from_arrow(table).repartition(4), out)
    files = [f for f in os.listdir(out) if f.endswith(".orc")]
    assert len(files) == 4  # one file per block (resumable layout)
    back = read_orc(out).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(back.columns) == ["id", "name", "value"]
    assert back.id.tolist() == list(range(len(table)))
    assert back.value.tolist() == table.column("value").to_pylist()


def test_column_pruning(ray_session, tmp_path, table):
    path = str(tmp_path / "one.orc")
    orc.write_table(table, path)
    ds = read_orc(path, columns=["id", "value"])
    df = ds.to_pandas()
    assert list(df.columns) == ["id", "value"]
    assert len(df) == len(table)


def test_multi_stripe_streams_as_blocks(ray_session, tmp_path, table):
    path = str(tmp_path / "striped.orc")
    # tiny stripes force several stripes in one file
    orc.write_table(table, path, stripe_size=1 << 18)
    nstripes = orc.ORCFile(path).nstripes
    assert nstripes > 1
    mat = read_orc(path).materialize()
    # stripes stream through the executor and are coalesced to target
    # block size — multiple bounded blocks, never one whole-file table
    assert 1 < mat.num_blocks() <= nstripes
    assert mat.count() == len(table)


def test_directory_read_skips_stray_files(ray_session, tmp_path, table):
    out = str(tmp_path / "dirty")
    write_orc(rd.from_arrow(table).repartition(2), out)
    (tmp_path / "dirty" / "_SUCCESS").write_text("")
    (tmp_path / "dirty" / "notes.txt").write_text("not orc")
    back = read_orc(out)
    assert back.count() == len(table)


def test_schema_metadata_stripped(ray_session, tmp_path, table):
    # a pandas-metadata blob on the schema makes pyarrow>=16 schemas
    # unhashable -> slow Ray shuffle schema unification; the source strips it
    path = str(tmp_path / "meta.orc")
    orc.write_table(
        table.replace_schema_metadata({b"pandas": b"{}"}), path
    )
    ds = read_orc(path)
    assert ds.schema().base_schema.metadata in (None, {})
