"""Actor-pool image decode + pixel-invariant validation stage.

A stateful ``map_batches`` class: decoder context is built once per actor in
``__init__`` (SURVEY.md §7.2); each ``__call__`` decodes a batch of
``bytes`` payloads and emits per-row validation columns. Decoded pixels
never leave the stage (never shuffled) — only booleans/metrics are appended
(SURVEY.md §7.4 "Very wide binary rows").

Decoding dispatches on container magic: REAL stdlib codecs for PNG and BMP
(``functions/imagecodec.py`` — zlib + struct + numpy, all five PNG filters,
palette, CRC-verified), falling back to the repo's deterministic synthetic
codec (sources/synth.py) for its own format. JPEG remains undecodable
without a codec library (none in this container — verified); JPEG payloads
surface as honest ``decode_ok=False`` violation rows, exactly like the
compressed-audio gate in ``stages/multimodal.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.imagecodec import (
    decode_bmp,
    decode_png,
    sniff_format,
    to_rgb3,
)
from ..sources.synth import LOSSLESS_FMTS, decode_image, psnr, reference_pixels

# real lossless containers validate pixel-exact, same as the synthetic png
_LOSSLESS = LOSSLESS_FMTS | {"bmp"}


def decode_any(data: bytes) -> tuple[np.ndarray, str]:
    """((h, w, 3) uint8, fmt) for PNG / BMP / synthetic payloads.

    Raises ValueError on corruption or an unrecognized container (e.g.
    JPEG) — the validator converts that into a ``decode_error`` row."""
    fmt = sniff_format(data)
    if fmt == "png":
        return to_rgb3(decode_png(data)), "png"
    if fmt == "bmp":
        return to_rgb3(decode_bmp(data)), "bmp"
    return decode_image(data)

PSNR_THRESHOLD_DB = 40.0

VALIDATION_COLUMNS = {
    "decode_ok": pa.bool_(),
    "dims_ok": pa.bool_(),
    "pixels_ok": pa.bool_(),
    "psnr_db": pa.float64(),
    "violation": pa.large_string(),  # "" when the row passes
}


class DecodeValidator:
    """Per-row invariant: bytes decode, dims match (w, h), decoded pixels
    match the reference rendering (exact for lossless fmt, PSNR >= 40 dB for
    lossy — BASELINE.json north_star)."""

    def __init__(self, psnr_threshold: float = PSNR_THRESHOLD_DB):
        self.psnr_threshold = psnr_threshold
        self._decode = decode_any  # magic-dispatch: real PNG/BMP + synth codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        fmts = batch["fmt"].to_pylist()

        n = len(ids)
        decode_ok = np.zeros(n, dtype=bool)
        dims_ok = np.zeros(n, dtype=bool)
        pixels_ok = np.zeros(n, dtype=bool)
        psnr_db = np.full(n, np.nan)
        violations = [""] * n

        for i in range(n):
            try:
                px, fmt_decoded = self._decode(blobs[i])
            except ValueError as e:
                violations[i] = f"decode_error: {e}"
                continue
            decode_ok[i] = True
            h_dec, w_dec, _ = px.shape
            if (w_dec, h_dec) != (ws[i], hs[i]):
                violations[i] = (
                    f"dims_mismatch: encoded {w_dec}x{h_dec} vs recorded {ws[i]}x{hs[i]}"
                )
                continue
            dims_ok[i] = True
            ref = reference_pixels(ids[i], w_dec, h_dec)
            if fmts[i] in _LOSSLESS:
                ok = bool(np.array_equal(px, ref))
                psnr_db[i] = float("inf") if ok else psnr(px, ref)
            else:
                psnr_db[i] = psnr(px, ref)
                ok = psnr_db[i] >= self.psnr_threshold
            pixels_ok[i] = ok
            if not ok:
                violations[i] = f"pixel_mismatch: psnr={psnr_db[i]:.2f}dB"

        out = batch.drop_columns(["bytes"])  # pixels/bytes stop here
        out = out.append_column("decode_ok", pa.array(decode_ok))
        out = out.append_column("dims_ok", pa.array(dims_ok))
        out = out.append_column("pixels_ok", pa.array(pixels_ok))
        out = out.append_column("psnr_db", pa.array(psnr_db, pa.float64()))
        out = out.append_column("violation", pa.array(violations, pa.large_string()))
        return out


# ---------------------------------------------------------------------------
# Aspect-ratio bucketing (training-batch assembly for image models)
# ---------------------------------------------------------------------------

def _aspect_ladder(step: float, max_log_ratio: float, pixel_budget: int,
                   multiple: int):
    """Bucket ladder: log2(w/h) snapped to ``step``-spaced rungs in
    [-max_log_ratio, +max_log_ratio]; each rung gets target dims with area
    ≈ ``pixel_budget``, both sides snapped DOWN to ``multiple`` (the
    SDXL-style constraint that latents/conv strides need)."""
    ratios = np.round(
        np.arange(-max_log_ratio, max_log_ratio + step / 2, step), 6
    )
    tw = np.empty(len(ratios), dtype=np.int64)
    th = np.empty(len(ratios), dtype=np.int64)
    for i, lr in enumerate(ratios):
        r = 2.0 ** lr
        h = np.sqrt(pixel_budget / r)
        th[i] = max(multiple, int(h // multiple) * multiple)
        tw[i] = max(multiple, int((r * h) // multiple) * multiple)
    return ratios, tw, th


def aspect_bucket_batches(
    ds,
    *,
    id_column: str = "image_id",
    w_column: str = "w",
    h_column: str = "h",
    batch_size: int = 64,
    pixel_budget: int = 1 << 20,
    step: float = 0.25,
    max_log_ratio: float = 1.0,
    multiple: int = 64,
    order_segments: int = 256,
):
    """Aspect-ratio bucketing: assign every image to the nearest
    log₂-aspect rung and assemble fixed-size training batches per rung —
    the standard large-scale image-model prep step (mixed-aspect batches
    waste pixels on padding; per-bucket batches train at native-ish
    aspect).

    Distribution shape (10¹²-row honest): rung assignment is
    embarrassingly parallel. Batch assembly needs a per-rung GLOBAL rank
    in deterministic-shuffle order — computed without ever gathering a
    rung into one task by segmented two-phase ranking: the shuffle key's
    top bits define ``order_segments`` contiguous ORDER segments per
    rung; pass 1 exchanges only (rung, segment) COUNTS (a
    rungs×segments int matrix, prefix-summed on the driver), pass 2
    ranks each (rung, segment) group locally and adds its broadcast
    offset. Only (id, rung, key) rows cross the exchange — image bytes
    never move. Order is a hash of the id, so the SAME batches come out
    regardless of input partitioning or cluster size: a resumed or
    re-sharded run reproduces its batch assignment exactly.

    Returns (id, bucket_id, target_w, target_h, batch_index, slot):
    ``batch_index`` is dense per rung; every batch is full except each
    rung's final partial batch.
    """
    import pandas as pd

    import ray

    from .aggregate import bucketed_groups
    from .sketches import hash64, hash_strings

    ratios, tws, ths = _aspect_ladder(
        step, max_log_ratio, pixel_budget, multiple
    )
    n_rungs = len(ratios)
    seg_shift = np.uint64(64 - int(np.log2(order_segments)))
    if (1 << (64 - int(seg_shift))) != order_segments:
        raise ValueError("order_segments must be a power of two")

    def assign(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch[w_column].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        h = np.asarray(batch[h_column].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        lr = np.log2(np.maximum(w, 1.0) / np.maximum(h, 1.0))
        idx = np.clip(
            np.round((lr + max_log_ratio) / step), 0, n_rungs - 1
        ).astype(np.int64)
        ids = batch[id_column]
        if pa.types.is_integer(ids.type):
            key = hash64(
                ids.to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        else:
            key = hash_strings(ids.to_pylist())
        return pa.table(
            {
                id_column: ids,
                "bucket_id": pa.array(idx),
                "__seg": pa.array((key >> seg_shift).astype(np.int64)),
                "__k": pa.array(key.view(np.int64)),
            }
        )

    tagged = ds.map_batches(assign, batch_format="pyarrow")

    # pass 1: (rung, segment) counts — a tiny fixed-width matrix partial
    def seg_counts(batch: pa.Table) -> pa.Table:
        flat = (
            batch["bucket_id"].to_numpy(zero_copy_only=False)
            * order_segments
            + batch["__seg"].to_numpy(zero_copy_only=False)
        )
        c = np.bincount(flat, minlength=n_rungs * order_segments)
        return pa.table({"c": pa.array([c.tolist()], pa.list_(pa.int64()))})

    parts = tagged.map_batches(seg_counts, batch_format="pyarrow").to_pandas()
    totals = np.sum(np.stack(parts["c"].to_numpy()), axis=0).reshape(
        n_rungs, order_segments
    )
    # per-rung exclusive prefix over segments = each segment's global rank
    # offset within its rung
    offsets = np.concatenate(
        [np.zeros((n_rungs, 1), dtype=np.int64),
         np.cumsum(totals, axis=1)[:, :-1]],
        axis=1,
    )
    off_ref = ray.put(offsets)

    # pass 2: rank locally within each (rung, segment) group + offset
    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        outs = []
        for (rung, seg), g in df.groupby(["bucket_id", "__seg"], sort=False):
            # __k is uint64 viewed as int64; within ONE segment all keys
            # share their top bits (incl. the sign bit), so int64 order
            # equals uint64 order here — cross-segment order comes from
            # the offsets, not this sort
            order = np.lexsort(
                (g[id_column].to_numpy(), g["__k"].to_numpy())
            )
            rank = np.empty(len(g), dtype=np.int64)
            rank[order] = np.arange(len(g)) + off[rung, seg]
            outs.append(
                pd.DataFrame(
                    {
                        id_column: g[id_column].to_numpy(),
                        "bucket_id": np.int64(rung),
                        "target_w": tws[rung],
                        "target_h": ths[rung],
                        "batch_index": rank // batch_size,
                        "slot": rank % batch_size,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else pd.DataFrame(
            {
                id_column: [], "bucket_id": [], "target_w": [],
                "target_h": [], "batch_index": [], "slot": [],
            }
        )

    return bucketed_groups(
        tagged, ["bucket_id", "__seg"], assemble,
        num_buckets=min(256, order_segments),
    )
