"""Lance source — the north_star input format, import-gated.

``BASELINE.json``'s input_hint names Lance tables of image+caption pairs as
the production input. The sandbox container has no ``lance`` package, so
the Lance-specific calls raise ``NotImplementedError`` with install
guidance (same gate pattern as the audio codec stub,
``stages/multimodal.py``); everything around them — dataset detection, the
fragment spec model, the per-fragment record-batch iterator the
``ValidationWorker`` consumes, checkpoint identity — is real and
unit-tested against parquet inputs. A user with ``pylance`` installed gets
the full path with no code changes.

Scale notes: ``read_lance`` maps to ``ray.data.read_lance`` (fragment-
parallel distributed scan with column pruning pushed into the format);
the validation pipeline instead enumerates fragments explicitly
(``fragment_specs``) because its resume unit is one fragment per task —
identical to the one-parquet-file-per-fragment layout.

Reference parity: the reference engine reads parquet string columns
(polars-genson-py ``infer_from_parquet``); Lance input is this engine's
own extension for the north_star workload.
"""

from __future__ import annotations

import os

try:  # lance gate — package not present in this container
    import lance as _lance

    _HAVE_LANCE = True
except ImportError:
    _lance = None
    _HAVE_LANCE = False

LANCE_SPEC_PREFIX = "lance://"


def have_lance() -> bool:
    return _HAVE_LANCE


def _require_lance() -> None:
    if not _HAVE_LANCE:
        raise NotImplementedError(
            "the 'lance' package is not available in this environment; "
            "install pylance to read Lance datasets. The surrounding "
            "plumbing (fragment specs, batch iteration, column pruning, "
            "checkpoint identity) is exercised by tests with parquet inputs."
        )


def is_lance_dataset(path: str) -> bool:
    """Detect a Lance dataset: a fragment spec, a ``.lance`` directory, or
    a directory with Lance's ``_versions``/``data`` layout."""
    if path.startswith(LANCE_SPEC_PREFIX) or path.endswith(".lance"):
        return True
    return os.path.isdir(os.path.join(path, "_versions")) and os.path.isdir(
        os.path.join(path, "data")
    )


def read_lance(uri: str, *, columns=None):
    """Distributed ``ray.data.Dataset`` over a Lance dataset (fragment-
    parallel scan; ``columns`` pruned inside the format reader)."""
    _require_lance()
    import ray.data as rd

    from ..functions.context import strip_schema_metadata

    ds = rd.read_lance(uri, columns=columns)
    return ds.map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def fragment_specs(uri: str) -> list[str]:
    """One spec string per Lance fragment — ``lance://<uri>#<fragment_id>``
    — the validation pipeline's task/resume unit, mirroring one parquet
    file per fragment."""
    _require_lance()
    ds = _lance.dataset(uri)
    return [
        f"{LANCE_SPEC_PREFIX}{uri}#{f.fragment_id}" for f in ds.get_fragments()
    ]


def parse_spec(spec: str) -> tuple[str, int]:
    body = spec[len(LANCE_SPEC_PREFIX):]
    uri, _, frag = body.rpartition("#")
    return uri, int(frag)


def iter_fragment_batches(path_or_spec: str, batch_size: int):
    """Record-batch iterator over ONE fragment — a parquet file path or a
    Lance fragment spec. The ValidationWorker's single read entry point for
    both formats (row-group / fragment streaming, memory = one chunk)."""
    if path_or_spec.startswith(LANCE_SPEC_PREFIX):
        _require_lance()
        uri, frag_id = parse_spec(path_or_spec)
        frag = _lance.dataset(uri).get_fragment(frag_id)
        yield from frag.to_batches(batch_size=batch_size)
        return
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path_or_spec)
    yield from pf.iter_batches(batch_size=batch_size)


def fragment_identity(path_or_spec: str) -> str:
    """Checkpoint input digest for one fragment. Lance fragments are
    immutable and identified by (dataset version, fragment id); parquet
    falls back to (size, mtime)."""
    if path_or_spec.startswith(LANCE_SPEC_PREFIX):
        if not _HAVE_LANCE:
            return "lance:unavailable"
        uri, frag_id = parse_spec(path_or_spec)
        return f"lance:{_lance.dataset(uri).version}:{frag_id}"
    from ..state.checkpoint import _stat_digest

    return _stat_digest(path_or_spec)
