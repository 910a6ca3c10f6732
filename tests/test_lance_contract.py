"""Lance-source contract test with a MOCKED ``lance`` module surface.

The sandbox has no ``pylance``, so ``sources/lance_io.py`` gates the real
calls behind ``NotImplementedError``. This suite substitutes a fake module
exposing exactly the surface the engine consumes — ``dataset(uri)`` →
``.version`` / ``.get_fragments()`` / ``.get_fragment(id)`` →
``.to_batches(batch_size)`` — and drives the FULL validation fragment path
through it (fragment enumeration, spec parsing, checkpoint identity, the
ValidationWorker's read→decode→stats→schema→annotated-write loop), so the
Lance plumbing is executed end-to-end without the package (VERDICT r2 §8).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_genson_ray.sources import lance_io
from polars_genson_ray.sources.synth import generate_image_table


class FakeFragment:
    def __init__(self, fragment_id: int, table: pa.Table):
        self.fragment_id = fragment_id
        self._table = table

    def to_batches(self, batch_size: int):
        # mirrors lance's LanceFragment.to_batches(batch_size=...) shape:
        # an iterator of pyarrow.RecordBatch
        return iter(self._table.to_batches(max_chunksize=batch_size))


class FakeLanceDataset:
    def __init__(self, fragments: dict[int, FakeFragment], version: int = 7):
        self.version = version
        self._fragments = fragments

    def get_fragments(self):
        return [self._fragments[k] for k in sorted(self._fragments)]

    def get_fragment(self, fragment_id: int):
        return self._fragments[fragment_id]


class FakeLanceModule:
    def __init__(self, datasets: dict[str, FakeLanceDataset]):
        self._datasets = datasets

    def dataset(self, uri: str) -> FakeLanceDataset:
        return self._datasets[uri]


@pytest.fixture()
def fake_lance(monkeypatch, tmp_path):
    """Two-fragment fake Lance dataset backed by the deterministic synth
    image table; returns (uri, {fragment_id: pa.Table})."""
    paths = generate_image_table(
        str(tmp_path / "gen"), num_rows=120, num_fragments=2, seed=11
    )
    tables = {i: pq.read_table(p) for i, p in enumerate(paths)}
    uri = str(tmp_path / "images.lance")
    fake = FakeLanceModule(
        {uri: FakeLanceDataset({i: FakeFragment(i, t) for i, t in tables.items()})}
    )
    monkeypatch.setattr(lance_io, "_lance", fake)
    monkeypatch.setattr(lance_io, "_HAVE_LANCE", True)
    return uri, tables


def test_fragment_specs_and_identity(fake_lance):
    uri, tables = fake_lance
    specs = lance_io.fragment_specs(uri)
    assert specs == [f"lance://{uri}#0", f"lance://{uri}#1"]
    for i, spec in enumerate(specs):
        assert lance_io.parse_spec(spec) == (uri, i)
        # checkpoint identity = (dataset version, fragment id) — immutable
        assert lance_io.fragment_identity(spec) == f"lance:7:{i}"
    assert lance_io.is_lance_dataset(uri)
    assert lance_io.is_lance_dataset(specs[0])


def test_iter_fragment_batches_streams_chunks(fake_lance):
    uri, tables = fake_lance
    spec = f"lance://{uri}#1"
    batches = list(lance_io.iter_fragment_batches(spec, 16))
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    assert sum(b.num_rows for b in batches) == tables[1].num_rows
    assert max(b.num_rows for b in batches) <= 16
    got = pa.Table.from_batches(batches)
    assert got.schema.names == tables[1].schema.names
    assert got.equals(tables[1])


def test_validation_worker_processes_lance_fragment(fake_lance, tmp_path):
    """End-to-end worker contract over a mocked Lance fragment: the SAME
    code path the flagship pipeline runs per fragment — streamed batches,
    decode + invariants, caption validity, annotated parquet chunks named
    by fragment_key, stats/schema partials — driven in-process (Ray remote
    workers would import the real gated module)."""
    from polars_genson_ray.pipelines.validation import (
        ValidationConfig,
        ValidationWorker,
    )
    from polars_genson_ray.state.checkpoint import fragment_key

    uri, tables = fake_lance
    spec = f"lance://{uri}#0"
    ann_dir = str(tmp_path / "annotated")
    worker = ValidationWorker(
        ann_dir, ValidationConfig(decode_batch_size=32), dup_actors=[]
    )
    partial = worker._process_fragment(spec)
    assert partial["rows"] == tables[0].num_rows
    assert partial["stats"]
    assert partial["schema"] is not None
    # annotated chunks on disk, keyed by the SPEC's fragment key
    chunks = [
        f for f in os.listdir(ann_dir) if f.startswith(fragment_key(spec))
    ]
    assert len(chunks) == int(np.ceil(tables[0].num_rows / 32))
    ann = pq.read_table(os.path.join(ann_dir, sorted(chunks)[0]))
    assert "violation" in ann.schema.names
    assert "caption_is_json" in ann.schema.names
    assert "bytes" not in ann.schema.names  # pixels never leave the stage


def test_gate_still_raises_without_package():
    """The honest gate is unchanged when the package is absent."""
    if lance_io.have_lance():  # pragma: no cover — sandbox has no lance
        pytest.skip("real lance present")
    with pytest.raises(NotImplementedError):
        lance_io.fragment_specs("/nonexistent/images.lance")
