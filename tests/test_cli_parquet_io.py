"""CLI (A5) and parquet entry-point (A4/S1-S3) tests."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from polars_genson_ray.sources.parquet_io import (
    infer_from_parquet,
    normalise_from_parquet,
    read_parquet_metadata,
    read_string_column,
    write_string_column,
)


def run_cli(args, stdin=""):
    proc = subprocess.run(
        [sys.executable, "-m", "polars_genson_ray.cli", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    return proc


def test_cli_stdin_schema():
    p = run_cli([], stdin='{"name": "Alice", "age": 30}')
    assert p.returncode == 0
    schema = json.loads(p.stdout)
    assert schema["properties"]["age"]["type"] == "integer"
    assert "Processed 1 JSON object(s)" in p.stderr


def test_cli_ndjson_normalise():
    p = run_cli(
        ["--ndjson", "--normalise", "--map-threshold", "1"],
        stdin='{"labels": {"en": "Hi"}}\n{"labels": {}}',
    )
    assert p.returncode == 0
    lines = p.stdout.strip().splitlines()
    assert json.loads(lines[0]) == {"labels": {"en": "Hi"}}
    assert json.loads(lines[1]) == {"labels": None}
    assert "Processed" in p.stderr


def test_cli_avro():
    p = run_cli(["--avro"], stdin='{"a": 1}')
    avro = json.loads(p.stdout)
    assert avro["name"] == "document" and avro["type"] == "record"


def test_cli_invalid_json_errors():
    p = run_cli([], stdin="{not json}")
    assert p.returncode == 1
    assert "failed" in p.stderr.lower()


def test_cli_unknown_flag():
    p = run_cli(["--nonsense"])
    assert p.returncode != 0


def test_parquet_roundtrip(tmp_path):
    # parquet_round_trip_test.py:33-80 shape: write → infer → normalise → metadata
    src = str(tmp_path / "in.parquet")
    write_string_column(
        src,
        "payload",
        ['{"labels": {"en": "Hello", "fr": "Bonjour"}}', '{"labels": {"es": "Hola"}}'],
    )
    assert read_string_column(src, "payload")[1] == '{"labels": {"es": "Hola"}}'

    result = infer_from_parquet(src, "payload", map_threshold=2)
    assert result.processed_count == 2
    assert result.schema["properties"]["labels"]["additionalProperties"] == {
        "type": "string"
    }

    out = str(tmp_path / "out.parquet")
    normalise_from_parquet(src, "payload", out, map_threshold=2)
    meta = read_parquet_metadata(out)
    avro = json.loads(meta["genson_avro_schema"])
    assert avro["name"] == "document"
    cfg = json.loads(meta["genson_normalise_config"])
    assert cfg["map_encoding"] == "mapping"
    rows = read_string_column(out, "payload")
    assert json.loads(rows[0]) == {"labels": {"en": "Hello", "fr": "Bonjour"}}


def test_read_string_column_type_error(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "ints.parquet")
    pq.write_table(pa.table({"x": [1, 2]}), path)
    with pytest.raises(ValueError, match="not a string column"):
        read_string_column(path, "x")


def test_debug_profile_flags_emit_stderr_only(capsys):
    """--debug/--profile print diagnostics to stderr (schema/core.rs:70-130
    semantics incl. RSS under profile); stdout (the schema) is unchanged."""
    import json

    from polars_genson_ray.core import (
        SchemaInferenceConfig,
        infer_json_schema_from_strings,
    )

    texts = ['{"a": 1}'] * 12  # >=10 rows → parallel path with profiling
    quiet = infer_json_schema_from_strings(texts, SchemaInferenceConfig())
    loud = infer_json_schema_from_strings(
        texts, SchemaInferenceConfig(debug=True, profile=True)
    )
    assert loud.schema == quiet.schema
    err = capsys.readouterr().err
    assert "RSS" in err and "chunk" in err

    from polars_genson_ray.core.diagnostics import _truncate

    long = "\n".join(f"line{i}" for i in range(30))
    t = _truncate(long, "normal")
    assert "truncated" in t and t.splitlines()[0] == "line0"
    assert _truncate(long, "verbose") == long
