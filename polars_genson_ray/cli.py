"""genson-ray CLI — flag-for-flag port of the reference CLI surface
(genson-cli/src/main.rs:17-347): stdin/file/--pq-column input, all
inference knobs as flags, --normalise mode, pretty schema output, and the
``Processed N JSON object(s)`` stderr line.

Usage: python -m polars_genson_ray.cli [OPTIONS] [FILE]
"""

from __future__ import annotations

import json
import sys

from .core import (
    NormaliseConfig,
    SchemaInferenceConfig,
    infer_json_schema_from_strings,
    normalise_values,
)

HELP = """genson-ray — JSON schema inference + normalisation (Ray Data engine CLI)

USAGE: python -m polars_genson_ray.cli [OPTIONS] [FILE]

OPTIONS:
    --ndjson                 Newline-delimited JSON input
    --no-ignore-array        Don't treat top-level arrays as object streams
    --avro                   Output Avro schema instead of JSON Schema
    --normalise              Normalise input against the inferred schema
    --coerce-strings         Parse numeric/boolean strings during normalise
    --keep-empty             Keep empty arrays/maps (default: null)
    --map-threshold N        Keys >= N may rewrite as map (default 20)
    --map-max-rk N           Max required keys for map inference
    --unify-maps             Unify compatible record schemas into maps
    --no-unify a,b           Field names excluded from unification
    --force-type f:map,...   Per-field map/record override
    --force-parent-type f:t  Parent-level override
    --force-scalar-promotion a,b  Always promote these scalar fields
    --map-encoding M         mapping | entries | kv (default mapping)
    --no-wrap-scalars        Disable scalar→object promotion
    --wrap-root NAME         Wrap each document under NAME
    --root-map               Allow the root to become a map
    --max-builders N         Chunk size for merge
    --pq-column COL          Read JSON strings from a parquet column
    --help                   Show this help
"""


def parse_args(argv: list[str]):
    cfg = SchemaInferenceConfig()
    norm = NormaliseConfig()
    do_normalise = False
    pq_column = None
    input_file = None
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            if i >= len(argv):
                raise SystemExit(f"Missing value for {a}")
            return argv[i]

        if a in ("--help", "-h"):
            print(HELP)
            raise SystemExit(0)
        elif a == "--ndjson":
            cfg.delimiter = "\n"
        elif a == "--no-ignore-array":
            cfg.ignore_outer_array = False
        elif a == "--avro":
            cfg.avro = True
        elif a == "--normalise":
            do_normalise = True
            cfg.avro = True
        elif a == "--coerce-strings":
            norm.coerce_string = True
        elif a == "--keep-empty":
            norm.empty_as_null = False
        elif a == "--map-threshold":
            cfg.map_threshold = int(val())
        elif a in ("--map-max-rk", "--map-max-required-keys"):
            cfg.map_max_required_keys = int(val())
        elif a == "--unify-maps":
            cfg.unify_maps = True
        elif a == "--no-unify":
            cfg.no_unify = frozenset(set(cfg.no_unify) | set(val().split(",")))
        elif a == "--force-type":
            for pair in val().split(","):
                f, _, t = pair.partition(":")
                if t:
                    cfg.force_field_types[f] = t
        elif a == "--force-parent-type":
            for pair in val().split(","):
                f, _, t = pair.partition(":")
                if t:
                    cfg.force_parent_field_types[f] = t
        elif a == "--force-scalar-promotion":
            cfg.force_scalar_promotion = frozenset(
                set(cfg.force_scalar_promotion) | set(val().split(","))
            )
        elif a == "--map-encoding":
            enc = val()
            if enc not in ("mapping", "entries", "kv"):
                raise SystemExit(
                    f"Invalid value for --map-encoding: {enc} (expected mapping|entries|kv)"
                )
            norm.map_encoding = enc
        elif a == "--no-wrap-scalars":
            cfg.wrap_scalars = False
        elif a == "--wrap-root":
            cfg.wrap_root = val()
        elif a == "--root-map":
            cfg.no_root_map = False
        elif a == "--max-builders":
            cfg.max_builders = int(val())
        elif a == "--pq-column":
            pq_column = val()
        elif a == "--debug":
            cfg.debug = True
        elif a == "--profile":
            cfg.profile = True
        elif a == "--verbose":
            cfg.verbosity = "verbose"
        elif a.startswith("--"):
            raise SystemExit(f"Unknown option: {a}")
        else:
            input_file = a
        i += 1
    return cfg, norm, do_normalise, pq_column, input_file


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg, norm, do_normalise, pq_column, input_file = parse_args(argv)

    if pq_column is not None:
        if input_file is None:
            print("--pq-column requires an input file path", file=sys.stderr)
            return 1
        from .sources.parquet_io import read_string_column

        json_strings = read_string_column(
            input_file, pq_column, ndjson_split=cfg.delimiter == "\n"
        )
    else:
        if input_file is not None:
            with open(input_file) as f:
                text = f.read()
        else:
            text = sys.stdin.read()
        json_strings = [text]

    try:
        result = infer_json_schema_from_strings(json_strings, cfg)
    except Exception as e:  # mirror the CLI's single-error surface
        print(f"Schema inference failed: {e}", file=sys.stderr)
        return 1

    if do_normalise:
        if pq_column is not None:
            values = [_loads_or_null(s) for s in json_strings]
        elif cfg.delimiter == "\n":
            values = [
                _loads_or_null(line)
                for line in json_strings[0].splitlines()
                if line.strip()
            ]
        else:
            values = [_loads_or_null(json_strings[0])]
        norm.wrap_root = cfg.wrap_root
        normalised = normalise_values(values, result.schema, norm)
        if cfg.delimiter == "\n":
            for v in normalised:
                print(json.dumps(v, separators=(",", ":"), ensure_ascii=False))
        else:
            print(json.dumps(normalised, indent=2, ensure_ascii=False))
    else:
        print(json.dumps(result.schema, indent=2, ensure_ascii=False))

    print(f"Processed {result.processed_count} JSON object(s)", file=sys.stderr)
    return 0


def _loads_or_null(s: str):
    try:
        return json.loads(s)
    except ValueError:
        return None


if __name__ == "__main__":
    sys.exit(main())
