"""Conformance harness: replay the reference CLI's insta snapshots.

Each ``genson-cli/tests/snapshots/*.snap`` records (args, input, output) of
the reference engine. We re-run the same inputs through our engine's
equivalent entry points and require identical output — values AND key order
(first-seen field order is part of the contract,
polars-genson-py/tests/field_order_test.py).

The reference tree is read-only input data here; no reference code is
imported or copied.
"""

from __future__ import annotations

import json
import pathlib

import pytest
import yaml

from polars_genson_ray.core import (
    NormaliseConfig,
    SchemaInferenceConfig,
    infer_json_schema_from_strings,
    normalise_values,
)

REF = pathlib.Path("/root/reference/genson-cli")
SNAP_DIR = REF / "tests" / "snapshots"

pytestmark = pytest.mark.skipif(
    not SNAP_DIR.is_dir(), reason="reference snapshots not available"
)


def _parse_snap(path: pathlib.Path):
    text = path.read_text()
    # format: ---\n<yaml header>\n---\n<payload>
    assert text.startswith("---\n")
    header_end = text.index("\n---\n", 4)
    header = yaml.safe_load(text[4:header_end])
    payload = text[header_end + 5 :]
    return header, payload


def _args_to_config(args: list[str]):
    """Map genson-cli flags (genson-cli/src/main.rs:17-196) to configs."""
    cfg = SchemaInferenceConfig()  # defaults mirror the CLI defaults
    norm = {"empty_as_null": True, "coerce_string": False, "map_encoding": "mapping"}
    do_normalise = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--ndjson":
            cfg.delimiter = "\n"
        elif a == "--no-ignore-array":
            cfg.ignore_outer_array = False
        elif a == "--avro":
            cfg.avro = True
        elif a == "--normalise":
            do_normalise = True
            cfg.avro = True  # the CLI's --normalise implies Avro (main.rs:55-58)
        elif a == "--coerce-strings":
            norm["coerce_string"] = True
        elif a == "--keep-empty":
            norm["empty_as_null"] = False
        elif a == "--map-threshold":
            i += 1
            cfg.map_threshold = int(args[i])
        elif a in ("--map-max-rk", "--map-max-required-keys"):
            i += 1
            cfg.map_max_required_keys = int(args[i])
        elif a == "--unify-maps":
            cfg.unify_maps = True
        elif a == "--no-unify":
            i += 1
            cfg.no_unify = frozenset(args[i].split(","))
        elif a == "--force-type":
            i += 1
            for pair in args[i].split(","):
                f, _, t = pair.partition(":")
                if t:
                    cfg.force_field_types[f] = t
        elif a == "--force-parent-type":
            i += 1
            for pair in args[i].split(","):
                f, _, t = pair.partition(":")
                if t:
                    cfg.force_parent_field_types[f] = t
        elif a == "--force-scalar-promotion":
            i += 1
            cfg.force_scalar_promotion = frozenset(
                set(cfg.force_scalar_promotion) | set(args[i].split(","))
            )
        elif a == "--map-encoding":
            i += 1
            norm["map_encoding"] = args[i]
        elif a == "--no-wrap-scalars":
            cfg.wrap_scalars = False
        elif a == "--wrap-root":
            i += 1
            cfg.wrap_root = args[i]
        elif a == "--root-map":
            cfg.no_root_map = False
        elif a == "--max-builders":
            i += 1
            cfg.max_builders = int(args[i])
        elif a in ("--debug", "--profile", "--verbose"):
            pass
        else:
            pytest.skip(f"unsupported CLI flag in snapshot: {a}")
        i += 1
    return cfg, norm, do_normalise


def _emulate_cli(input_text: str, args: list[str]):
    """Reproduce genson-cli's stdout (as parsed JSON) for the given input."""
    cfg, norm, do_normalise = _args_to_config(args)
    result = infer_json_schema_from_strings([input_text], cfg)
    if not do_normalise:
        return result.schema
    if cfg.delimiter == "\n":
        values = []
        for line in input_text.splitlines():
            if not line.strip():
                continue
            try:
                values.append(json.loads(line))
            except ValueError:
                values.append(None)
    else:
        try:
            values = [json.loads(input_text)]
        except ValueError:
            values = [None]
    ncfg = NormaliseConfig(
        empty_as_null=norm["empty_as_null"],
        coerce_string=norm["coerce_string"],
        map_encoding=norm["map_encoding"],
        wrap_root=cfg.wrap_root,
    )
    return normalise_values(values, result.schema, ncfg)


def _parse_payload(payload: str):
    payload = payload.strip()
    try:
        return json.loads(payload)
    except ValueError:
        pass
    # concatenated JSON documents (NDJSON lines or pretty-printed stream)
    decoder = json.JSONDecoder()
    docs = []
    idx = 0
    while idx < len(payload):
        doc, end = decoder.raw_decode(payload, idx)
        docs.append(doc)
        idx = end
        while idx < len(payload) and payload[idx] in " \t\r\n":
            idx += 1
    return docs


def _key_orders(v, path="$", out=None):
    out = out if out is not None else []
    if isinstance(v, dict):
        out.append((path, list(v.keys())))
        for k, sub in v.items():
            _key_orders(sub, f"{path}.{k}", out)
    elif isinstance(v, list):
        for i, sub in enumerate(v):
            _key_orders(sub, f"{path}[{i}]", out)
    return out


def _snapshot_input(header) -> str | None:
    info = header.get("info") or {}
    if "fixture" in info:
        fixture = REF / info["fixture"]
        if not fixture.is_file():
            return None
        return fixture.read_text()
    if "input" in info:
        inp = info["input"]
        if isinstance(inp, list):
            return "\n".join(json.dumps(v) for v in inp)
        if isinstance(inp, str):
            return inp
        return json.dumps(inp)
    return None


# The reference's l1 / l1_min claims tests are #[ignore]d
# (genson-cli/tests/claims_fixtures.rs:66,76,86,501,511,521), so their
# committed snapshots are stale relative to the reference's current engine —
# excluded from conformance.
_STALE = {
    f"claims_fixtures__claims_fixture_{fx}__{kind}"
    for fx in ("l1", "l1_min")
    for kind in ("avro", "jsonschema", "normalize")
}

_ALL_SNAPS = (
    [p for p in sorted(SNAP_DIR.glob("*.snap")) if p.stem not in _STALE]
    if SNAP_DIR.is_dir()
    else []
)


def _replay_snapshot(snap):
    header, payload = _parse_snap(snap)
    info = header.get("info") or {}
    args = info.get("args")
    if args is None:
        pytest.skip("snapshot has no recorded args")
    input_text = _snapshot_input(header)
    if input_text is None:
        pytest.skip("snapshot input not reconstructible")
    expected = _parse_payload(payload)
    actual = _emulate_cli(input_text, [str(a) for a in args])
    if isinstance(actual, list) and len(actual) == 1 and not isinstance(expected, list):
        actual = actual[0]  # single-row NDJSON output snapshotted unwrapped
    assert actual == expected, f"value mismatch for {snap.name}"
    assert _key_orders(actual) == _key_orders(expected), (
        f"key-order mismatch for {snap.name}"
    )


@pytest.mark.parametrize("snap", _ALL_SNAPS, ids=lambda p: p.stem)
def test_snapshot_conformance(snap):
    _replay_snapshot(snap)


# The reference also keeps HUMAN-VERIFIED ("blessed") snapshots in
# tests/verified/ (the approval mechanics live at
# genson-cli/tests/map_max_required_keys_snapshots.rs:20-60: a snapshot is
# approved when its payload matches the blessed copy). Same on-disk format
# as the active snapshots (extra `blessing:`/`reason:` header keys), so the
# same replay applies — this is the higher-trust oracle.
VERIFIED_DIR = REF / "tests" / "verified"
_BLESSED_SNAPS = (
    sorted(VERIFIED_DIR.glob("*.snap")) if VERIFIED_DIR.is_dir() else []
)


@pytest.mark.parametrize(
    "snap", _BLESSED_SNAPS, ids=lambda p: f"verified_{p.stem}"
)
def test_blessed_snapshot_conformance(snap):
    active = SNAP_DIR / snap.name
    if active.is_file():
        ah, ap = _parse_snap(active)
        bh, bp = _parse_snap(snap)
        if (ah.get("info") or {}).get("approved") is False:
            # the reference's CURRENT engine itself fails this blessed copy
            # (its active snapshot records approved: false); we conform to
            # the current engine, so the blessed divergence is expected
            pytest.skip(
                "reference's own current output diverges from this blessed "
                "copy (active snapshot has approved: false)"
            )
        a_args = (ah.get("info") or {}).get("args")
        b_args = (bh.get("info") or {}).get("args")
        if a_args != b_args and ap.strip() == bp.strip():
            # the test was re-parameterized after blessing (e.g.
            # map_of_unified_records now runs --map-max-rk 0, the blessed
            # file recorded 1) — the blessed PAYLOAD is identical to the
            # active snapshot, which the active replay already covers
            pytest.skip(
                "blessed args stale (test re-parameterized); payload "
                "identical to the already-replayed active snapshot"
            )
    _replay_snapshot(snap)
