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


def _noise_bytes(seed: int, n: int) -> np.ndarray:
    """n deterministic noise bytes in [0, 64): counter-mode splitmix64,
    8 noise bytes per hashed word (little-endian view), in-place uint64
    arithmetic. ~25 µs for an 80×80×3 image vs 316 µs for
    ``Generator.integers``, which dominated the per-row validation budget."""
    m = (n + 7) // 8
    x = np.arange(m, dtype=np.uint64)
    x += np.uint64(seed) << np.uint64(32)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    b = x.view(np.uint8)[:n].copy()
    b &= np.uint8(63)
    return b


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic ground-truth pixels for an image id (seeded
    gradient+noise), all-uint8 arithmetic (wraparound add == mod 256)."""
    seed = zlib.crc32(image_id.encode()) & 0xFFFFFFFF
    noise = _noise_bytes(seed, h * w * 3).reshape(h, w, 3)
    base = ((np.arange(w, dtype=np.uint32) * 255) // max(1, w - 1)).astype(np.uint8)
    grad = ((np.arange(h, dtype=np.uint32) * 255) // max(1, h - 1)).astype(np.uint8)
    px = np.empty((h, w, 3), np.uint8)
    px[:, :, 0] = base[None, :]
    px[:, :, 1] = grad[:, None]
    # exact (a + b) // 2 without widening: (a>>1) + (b>>1) + (a&b&1)
    b2, g2 = np.broadcast_to(base[None, :], (h, w)), np.broadcast_to(grad[:, None], (h, w))
    px[:, :, 2] = (b2 >> 1) + (g2 >> 1) + (b2 & g2 & 1)
    px += noise  # uint8 wraparound == % 256
    return px


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


def _generate_fragment(args) -> str:
    """Generate one fragment file. Seeded per fragment (``[seed, f]``), so
    fragments are independent and generation parallelizes deterministically
    — the table content does not depend on worker count or order."""
    (out_dir, f, start_idx, n, seed, dup_rate, corrupt_rate, mismatch_rate,
     hot_phash_rate, min_side, max_side) = args
    rng = np.random.default_rng([seed, f])
    hot_phash = 0x5A5A5A5A
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    for i in range(start_idx, start_idx + n):
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
    return path


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

    Violation rows are injected deterministically (per-fragment seeded rng),
    so the table is byte-stable for a given (seed, num_rows, num_fragments)
    regardless of generation parallelism.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows_per_frag = [
        num_rows // num_fragments + (1 if f < num_rows % num_fragments else 0)
        for f in range(num_fragments)
    ]
    starts = [sum(rows_per_frag[:f]) for f in range(num_fragments)]
    jobs = [
        (out_dir, f, starts[f], rows_per_frag[f], seed, dup_rate, corrupt_rate,
         mismatch_rate, hot_phash_rate, min_side, max_side)
        for f in range(num_fragments)
    ]
    if num_fragments >= 8 and num_rows >= 16384:
        from concurrent.futures import ProcessPoolExecutor

        workers = min(os.cpu_count() or 4, num_fragments, 32)
        with ProcessPoolExecutor(max_workers=workers) as pool:
            paths = list(pool.map(_generate_fragment, jobs))
    else:
        paths = [_generate_fragment(j) for j in jobs]
    return paths


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    # integer diff/square (int16→int32) — 4× less memory traffic than the
    # float64 path; np.mean reduces in float64, so the value is identical
    d = (a.astype(np.int16) - b.astype(np.int16)).astype(np.int32)
    mse = float(np.mean(d * d))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def encode_avi(frames: list, fps_num: int = 30, fps_den: int = 1,
               width: int = 8, height: int = 8,
               handler: bytes = b"MJPG") -> bytes:
    """Minimal valid RIFF/AVI writer (stdlib ``struct`` only): one video
    stream, each element of ``frames`` becomes one ``00dc`` chunk in the
    ``movi`` list. Frame timing is ``fps_num/fps_den`` (strh dwRate/dwScale).
    Used to plant deterministic AVI payloads for the demux stage — the
    sandbox has no container library to write them either."""
    import struct

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(payload))
            + payload
            + (b"\x00" if len(payload) & 1 else b"")
        )

    def lst(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    usec_per_frame = int(round(1_000_000 * fps_den / fps_num))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler, 0, 0, 0, 0,
        fps_den, fps_num,  # dwScale, dwRate → fps = rate/scale
        0, len(frames), 0, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, handler,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
