"""Actor-pool image decode + pixel-invariant validation stage.

A stateful ``map_batches`` class: decoder context is built once per actor in
``__init__`` (SURVEY.md §7.2); each ``__call__`` decodes a batch of
``bytes`` payloads and emits per-row validation columns. Decoded pixels
never leave the stage (never shuffled) — only booleans/metrics are appended
(SURVEY.md §7.4 "Very wide binary rows").

The container has no image codec libraries, so decoding uses the repo's
deterministic synthetic codec (sources/synth.py). A real PIL/turbojpeg
decoder would replace ``self._decode`` only; batch plumbing, schema and
violation semantics are identical and are what's under test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.synth import LOSSLESS_FMTS, decode_image, psnr, reference_pixels

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
        self._decode = decode_image  # decoder context (stub codec; see module doc)

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
            if fmts[i] in LOSSLESS_FMTS:
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
