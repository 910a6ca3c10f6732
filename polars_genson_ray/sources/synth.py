"""Deterministic synthetic image+caption table (FIXTURES.md layer A).

Schema (BASELINE.json input_hint):
  image_id: string, bytes: binary, w: int32, h: int32, fmt: string,
  caption: string, phash: int64

Because image codec libraries are not available in this container, images
are encoded with a self-contained deterministic codec (`encode_image` /
`decode_image`): ``png`` is lossless (zlib over raw RGB), ``jpeg``/``webp``
are lossy (6-bit quantisation then zlib), giving a real decode +
PSNR-threshold validation path. A PIL/libjpeg decoder would plug into the
same actor-pool stage — only ``decode_image`` changes.

Injected fixture rows (all seeded, reproducible):
  - duplicate image_ids (uniqueness violations)
  - truncated byte streams (decode failures)
  - w/h mismatches vs the encoded payload (dimension violations)
  - a heavy-hitter phash bucket (~10% of rows) for skew handling
  - caption JSON documents drawn from the FIXTURES.md B-families on a
    fraction of rows; plain text captions elsewhere
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MAGIC = b"PGRI"  # polars-genson-ray image
LOSSLESS_FMTS = {"png"}
LOSSY_FMTS = {"jpeg", "webp"}
_QUANT_MASK = 0xFC  # 6-bit quantisation → PSNR ≈ 43 dB (≥ the 40 dB gate)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. Header: MAGIC fmt w h + zlib payload."""
    h, w, _ = pixels.shape
    if fmt in LOSSY_FMTS:
        payload = (pixels & _QUANT_MASK).astype(np.uint8)
    elif fmt in LOSSLESS_FMTS:
        payload = pixels
    else:
        raise ValueError(f"unknown fmt: {fmt}")
    compressed = zlib.compress(payload.tobytes(), 1)
    return MAGIC + fmt.encode().ljust(8, b"\0") + struct.pack("<II", w, h) + compressed


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode back to ((h, w, 3) uint8, fmt). Raises ValueError on corruption."""
    if len(data) < 20 or data[:4] != MAGIC:
        raise ValueError("bad magic")
    fmt = data[4:12].rstrip(b"\0").decode()
    w, h = struct.unpack("<II", data[12:20])
    try:
        raw = zlib.decompress(data[20:])
    except zlib.error as e:
        raise ValueError(f"corrupt stream: {e}") from None
    expected = w * h * 3
    if len(raw) != expected:
        raise ValueError(f"payload size {len(raw)} != {expected}")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3), fmt


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic ground-truth pixels for an image id (seeded gradient+noise)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(1, w - 1)).astype(np.uint8)
    grad = ((yy * 255) // max(1, h - 1)).astype(np.uint8)
    noise = rng.integers(0, 64, size=(h, w, 3), dtype=np.uint8)
    px = np.stack([base, grad, ((base.astype(int) + grad) // 2).astype(np.uint8)], axis=-1)
    return ((px.astype(np.uint16) + noise) % 256).astype(np.uint8)


# --- caption fixture families (FIXTURES.md layer B, abbreviated) -----------

_WORDS = (
    "ray data arrow schema batch stream table image caption pixel shard "
    "merge reduce map filter group sort window actor block spill lineage"
).split()


def _caption_for(rng: np.random.Generator, i: int) -> str:
    family = i % 7
    if family == 0:  # B1 heterogeneous record
        doc = {"name": f"n{i}", "age": int(rng.integers(1, 90))}
        if i % 3 == 0:
            doc["city"] = f"c{int(rng.integers(0, 50))}"
        return json.dumps(doc)
    if family == 1:  # B4 labels map
        langs = ["en", "fr", "de", "es", "pt", "it", "nl", "pl"]
        k = int(rng.integers(1, 5))
        return json.dumps(
            {"labels": {lang: f"w{i}" for lang in rng.choice(langs, k, replace=False)}}
        )
    if family == 2:  # B3 null/scalar unions + widening
        choice = i % 3
        val = None if choice == 0 else (f"s{i}" if choice == 1 else int(i))
        return json.dumps({"field": val, "num": float(i) if i % 2 else int(i)})
    if family == 3:  # B2 union list/scalar
        return json.dumps(
            {"id": i, "strs": f"a{i}" if i % 2 else [f"b{i}", f"c{i}"]}
        )
    if family == 4:  # B5 unifiable map-of-records
        key = "abcdef"[i % 6]
        rec = {"alphabet": i % 26, "frequency": round(float(rng.random()), 4)}
        rec["vowel" if key in "ae" else "consonant"] = i % 5
        return json.dumps({"letter": {key: rec}})
    # plain-text captions (caption-equality checks)
    n = int(rng.integers(3, 12))
    return " ".join(rng.choice(_WORDS, n))


def generate_image_table(
    out_dir: str,
    num_rows: int = 1000,
    num_fragments: int = 4,
    seed: int = 42,
    *,
    dup_rate: float = 0.01,
    corrupt_rate: float = 0.005,
    mismatch_rate: float = 0.005,
    hot_phash_rate: float = 0.10,
    min_side: int = 8,
    max_side: int = 48,
) -> list[str]:
    """Write ``num_fragments`` parquet files; returns their paths.

    Violation rows are injected deterministically; their ids are recoverable
    from the seed so tests can assert exact violation sets.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    rows_per_frag = [
        num_rows // num_fragments + (1 if f < num_rows % num_fragments else 0)
        for f in range(num_fragments)
    ]
    paths = []
    idx = 0
    hot_phash = 0x5A5A5A5A
    for f, n in enumerate(rows_per_frag):
        ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
        for _ in range(n):
            i = idx
            idx += 1
            dup = rng.random() < dup_rate and i > 0
            image_id = f"img_{(i - 1 if dup else i):012d}"
            w = int(rng.integers(min_side, max_side))
            h = int(rng.integers(min_side, max_side))
            fmt = ["png", "jpeg", "webp"][i % 3]
            px = reference_pixels(image_id, w, h)
            data = encode_image(px, fmt)
            if rng.random() < corrupt_rate:
                data = data[: max(8, len(data) // 2)]  # truncated stream
            if rng.random() < mismatch_rate:
                w += 1  # recorded width no longer matches payload
            phash = (
                hot_phash
                if rng.random() < hot_phash_rate
                else int(rng.integers(0, 2**62))
            )
            ids.append(image_id)
            blobs.append(data)
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
            captions.append(_caption_for(rng, i))
            phashes.append(phash)
        table = pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(captions, pa.string()),
                "phash": pa.array(phashes, pa.int64()),
            }
        )
        path = os.path.join(out_dir, f"fragment-{f:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
