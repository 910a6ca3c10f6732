"""Multimodal column operators: decode / resize / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Media payloads are opaque ``binary`` columns with typed metadata (the
image+caption table's ``bytes``/``w``/``h``/``fmt`` shape). Each stage here
is a callable class — codec/model state in ``__init__``, per-batch work in
``__call__`` — sized for ``map_batches(Cls, concurrency=N, batch_size=B)``.

This container has no image/audio/video codec libraries, so:
  * image stages run REAL compute against the repo's deterministic codec
    (sources/synth.py) — nearest-neighbour resize, color-moment /
    histogram feature extraction;
  * the audio stage decodes RIFF/WAVE **PCM for real** via stdlib ``wave``
    (8/16/24/32-bit, any rate/channels — no external codec needed);
    compressed audio formats and video demuxing remain gated stubs behind
    an import-try (soundfile / av): the Ray-side plumbing (schema, batch
    shape, actor signature, output layout) is real and tested with a
    deterministic fake decoder, and undecodable rows surface as
    ``decode_ok=False`` violation rows rather than job failures.

Scale notes: decoded pixels/samples never leave the stage — outputs are
small fixed-width feature vectors or re-encoded payloads; batch_size must
be set so batch × concurrency of decoded media fits worker heaps
(SURVEY.md §7.4 "Very wide binary rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.synth import decode_image, encode_image


def _resize_nn(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index maps; no codec libs)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return px[ys[:, None], xs[None, :], :]


class ImageResize:
    """Decode → resize → re-encode. Output columns: ``bytes`` (replaced),
    ``w``/``h`` (replaced), ``resize_ok``. Undecodable rows pass through
    with ``resize_ok=False`` (violation-row semantics, not job failure)."""

    def __init__(self, out_w: int = 32, out_h: int = 32, fmt: str = "png"):
        self.out_w, self.out_h, self.fmt = out_w, out_h, fmt
        self._decode, self._encode = decode_image, encode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        out_blobs, ok = [], []
        for b in blobs:
            try:
                px, _ = self._decode(b)
            except ValueError:
                out_blobs.append(b)
                ok.append(False)
                continue
            out_blobs.append(
                self._encode(_resize_nn(px, self.out_w, self.out_h), self.fmt)
            )
            ok.append(True)
        n = batch.num_rows
        batch = batch.drop_columns(
            [c for c in ("bytes", "w", "h") if c in batch.column_names]
        )
        batch = batch.append_column("bytes", pa.array(out_blobs, pa.binary()))
        batch = batch.append_column(
            "w", pa.array(np.full(n, self.out_w, np.int32))
        )
        batch = batch.append_column(
            "h", pa.array(np.full(n, self.out_h, np.int32))
        )
        return batch.append_column("resize_ok", pa.array(ok, pa.bool_()))


class ImageFeatures:
    """Decode → fixed-width feature vector (channel means/stds + an
    8-bin luminance histogram): ``features: list<float>(14)``. The shape a
    real embedding model stage would have (model load in __init__,
    batched inference in __call__)."""

    DIM = 14

    def __init__(self):
        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for b in batch["bytes"].to_pylist():
            try:
                px, _ = self._decode(b)
            except ValueError:
                feats.append([float("nan")] * self.DIM)
                continue
            f = px.reshape(-1, 3).astype(np.float32)
            lum = f.mean(axis=1)
            hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
            hist = hist / max(1, len(lum))
            feats.append(
                np.concatenate([f.mean(axis=0), f.std(axis=0), hist])
                .astype(np.float64)
                .tolist()
            )
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


try:  # audio codec gate — not present in this container
    import soundfile as _soundfile  # noqa: F401

    _HAVE_AUDIO = True
except ImportError:
    _HAVE_AUDIO = False


def decode_wav_pcm(blob: bytes):
    """REAL decode of a RIFF/WAVE PCM payload via stdlib ``wave`` (no
    external codec needed): returns ``(samples, rate, channels)`` with
    ``samples`` float32 in [-1, 1], shape (n_frames, channels).

    Sample widths 1 (unsigned 8-bit), 2 (int16), 3 (24-bit packed) and
    4 (int32) are supported — the full PCM surface ``wave`` can emit.
    Compressed WAV (non-PCM comptype) raises ``wave.Error`` upstream."""
    import io
    import wave

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 3:
        b3 = np.frombuffer(raw, dtype=np.uint8)
        b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int32)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    n = len(x) - len(x) % max(1, nch)
    return x[:n].reshape(-1, nch), rate, nch


class AudioFeatures:
    """Audio ``binary`` column → (duration_s, rms, n_samples, n_channels,
    sample_rate, decode_ok).

    RIFF/WAVE PCM payloads are decoded FOR REAL via stdlib ``wave``
    (:func:`decode_wav_pcm` — 8/16/24/32-bit PCM, any channel count / rate;
    rate and channel count come from each file's own header). Compressed
    formats still need an external codec: decoded through ``soundfile``
    when importable, otherwise the row is emitted with ``decode_ok=False``
    (violation-row semantics, matching ImageResize — the honest gate for
    codecs this container lacks). ``fake_pcm=True`` keeps the raw
    headerless int16-PCM-@``rate`` interpretation used by synthetic tables.
    """

    def __init__(self, column: str = "audio", rate: int = 16000, *, fake_pcm: bool = False):
        self.column, self.rate, self.fake_pcm = column, rate, fake_pcm

    def _decode(self, blob: bytes):
        """→ (samples float32 (n, ch), rate, channels); raises on failure."""
        if self.fake_pcm:
            x = np.frombuffer(
                blob[: len(blob) - len(blob) % 2], dtype=np.int16
            ).astype(np.float32) / 32768.0
            return x.reshape(-1, 1), self.rate, 1
        if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
            try:
                return decode_wav_pcm(blob)
            except Exception:
                # RIFF containers stdlib wave can't parse (IEEE-float WAV,
                # WAVE_FORMAT_EXTENSIBLE, ADPCM): fall through to soundfile
                # when available rather than shadowing it with the sniff
                if not _HAVE_AUDIO:
                    raise
        if _HAVE_AUDIO:
            data, rate = _soundfile.read(__import__("io").BytesIO(blob))
            x = np.asarray(data, dtype=np.float32)
            if x.ndim == 1:
                x = x.reshape(-1, 1)
            return x, int(rate), x.shape[1]
        raise NotImplementedError(
            "payload is not RIFF/WAVE PCM and no audio codec library is "
            "available; install soundfile for compressed formats"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss, ns, nchs, rates, oks = [], [], [], [], [], []
        for b in batch[self.column].to_pylist():
            try:
                x, rate, nch = self._decode(b)
            except Exception:
                durs.append(float("nan"))
                rmss.append(float("nan"))
                ns.append(0)
                nchs.append(0)
                rates.append(0)
                oks.append(False)
                continue
            mono = x.mean(axis=1) if x.size else x.reshape(0)
            ns.append(len(mono))
            durs.append(len(mono) / float(rate) if rate else 0.0)
            rmss.append(
                float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
            )
            nchs.append(nch)
            rates.append(rate)
            oks.append(True)
        batch = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        batch = batch.append_column("rms", pa.array(rmss, pa.float64()))
        batch = batch.append_column("n_samples", pa.array(ns, pa.int64()))
        batch = batch.append_column("n_channels", pa.array(nchs, pa.int32()))
        batch = batch.append_column("sample_rate", pa.array(rates, pa.int32()))
        return batch.append_column("decode_ok", pa.array(oks, pa.bool_()))


class VideoFrameSample:
    """STUB: video ``binary`` column → every-Nth-frame sample.

    With no container demuxer available, the payload is interpreted as the
    deterministic fake used in tests: a concatenation of equally-sized
    encoded frames (4-byte length prefix + synth-codec image each). Emits
    one row per sampled frame: (parent id, frame_index, frame_bytes) —
    the flat_map layout a real av/ffmpeg demuxer stage would produce."""

    def __init__(self, id_column: str, column: str = "video", every_n: int = 10):
        self.id_column, self.column, self.every_n = id_column, column, every_n

    def _frames(self, blob: bytes):
        import struct

        off = 0
        while off + 4 <= len(blob):
            (ln,) = struct.unpack_from("<I", blob, off)
            off += 4
            if off + ln > len(blob):
                return
            yield blob[off : off + ln]
            off += ln

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, idxs, frames = [], [], []
        ids = batch[self.id_column].to_pylist()
        for row, blob in enumerate(batch[self.column].to_pylist()):
            for i, frame in enumerate(self._frames(blob)):
                if i % self.every_n == 0:
                    ids_out.append(ids[row])
                    idxs.append(i)
                    frames.append(frame)
        return pa.table(
            {
                self.id_column: pa.array(ids_out, batch[self.id_column].type),
                "frame_index": pa.array(idxs, pa.int64()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )
