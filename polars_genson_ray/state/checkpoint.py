"""Per-fragment lineage / checkpoint store.

One JSON record per input fragment (BASELINE.json north_rule: "resumable
from checkpoint with per-partition lineage + metrics"). Records are written
atomically (temp file + rename) so a crashed run never leaves a partial
record; resume = skip fragments with a ``done`` record whose input digest
still matches.
"""

from __future__ import annotations

import json
import os
import tempfile


def fragment_key(path: str) -> str:
    if path.startswith("lance://"):
        # spec string → filesystem-safe key
        return path.replace("://", "_").replace("/", "_").replace("#", "_f")
    # basename alone collides when two input dirs ship same-named
    # fragments (part-0.parquet everywhere) — records, hash sidecars and
    # annotated outputs would silently overwrite each other; a short
    # full-path digest keeps keys unique and stable
    import hashlib

    digest = hashlib.sha256(os.path.abspath(path).encode()).hexdigest()[:8]
    return f"{os.path.basename(path).replace('/', '_')}-{digest}"


def _legacy_fragment_key(path: str) -> str:
    """Pre-digest key format (basename only). Kept solely so stores written
    by earlier builds resume instead of silently re-validating from scratch:
    ``CheckpointStore.load`` falls back to this key, verifies the record's
    embedded ``fragment`` path actually matches (the basename-collision case
    the digest fixed is thereby excluded), and migrates the record + hash
    sidecar to the current key format."""
    if path.startswith("lance://"):
        return fragment_key(path)  # lance spec keys never changed
    return os.path.basename(path).replace("/", "_")


def _stat_digest(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def fragment_digest(path: str) -> str:
    """Cheap input identity: (size, mtime_ns) for parquet files — content
    hash would re-read 100 TB; fragments are immutable in practice. Lance
    fragment specs use (dataset version, fragment id)."""
    if path.startswith("lance://"):
        from ..sources.lance_io import fragment_identity

        return fragment_identity(path)
    return _stat_digest(path)


class CheckpointStore:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _record_path(self, fragment: str) -> str:
        return os.path.join(self.directory, fragment_key(fragment) + ".json")

    def load(self, fragment: str) -> dict | None:
        try:
            with open(self._record_path(fragment)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            pass
        return self._migrate_legacy(fragment)

    def _migrate_legacy(self, fragment: str) -> dict | None:
        """One-time fallback for stores written before fragment keys gained
        the path digest: find the old-format record, confirm it belongs to
        THIS fragment path (its embedded ``fragment`` field), rewrite it —
        and its ``.hashes.bin`` sidecar — under the current key."""
        legacy = _legacy_fragment_key(fragment)
        new = fragment_key(fragment)
        if legacy == new:
            return None
        legacy_json = os.path.join(self.directory, legacy + ".json")
        try:
            with open(legacy_json) as f:
                rec = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None
        recorded = rec.get("fragment", "")
        if recorded != fragment and (
            not recorded or os.path.abspath(recorded) != os.path.abspath(fragment)
        ):
            # a same-named fragment from ANOTHER directory — exactly the
            # collision the digest key fixed; not ours, leave it alone
            return None
        old_sidecar = rec.get("id_hashes_file")
        if old_sidecar == legacy + ".hashes.bin":
            src = os.path.join(self.directory, old_sidecar)
            if os.path.exists(src):
                rec["id_hashes_file"] = new + ".hashes.bin"
                os.replace(src, os.path.join(self.directory, rec["id_hashes_file"]))
        self.record(fragment, rec)
        try:
            os.unlink(legacy_json)
        except OSError:
            pass
        return rec

    def is_done(self, fragment: str) -> bool:
        rec = self.load(fragment)
        return (
            rec is not None
            and rec.get("status") == "done"
            and rec.get("input_digest") == fragment_digest(fragment)
        )

    def record(self, fragment: str, record: dict) -> None:
        record = dict(record)
        record.setdefault("fragment", fragment)
        record.setdefault("input_digest", fragment_digest(fragment))
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(record, f)
            os.replace(tmp, self._record_path(fragment))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def write_hashes(self, fragment: str, blob: bytes) -> str:
        """Store a fragment's id-hash array as a sidecar binary file and
        return its name for the record. Embedding the array in the JSON
        record (round 1) cost ~11 B/row of checkpoint JSON at 10^12 rows;
        the sidecar keeps records KB-sized and lets resume stream the
        arrays straight into the uniqueness index."""
        name = fragment_key(fragment) + ".hashes.bin"
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(self.directory, name))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        return name

    def load_hashes(self, record: dict) -> bytes:
        name = record.get("id_hashes_file")
        if not name:
            return b""
        try:
            with open(os.path.join(self.directory, name), "rb") as f:
                return f.read()
        except OSError:
            return b""

    def completed(self) -> dict[str, dict]:
        out = {}
        for name in os.listdir(self.directory):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(self.directory, name)) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if rec.get("status") == "done":
                out[rec.get("fragment", name)] = rec
        return out
