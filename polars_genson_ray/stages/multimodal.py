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
        from .image import decode_any

        self.out_w, self.out_h, self.fmt = out_w, out_h, fmt
        # decode dispatches on magic (real PNG/BMP + synth); re-encode
        # stays in the synth codec (fmt arg) — the metadata round-trip
        # the downstream validator expects
        self._decode, self._encode = decode_any, encode_image

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
        from .image import decode_any

        self._decode = decode_any  # real PNG/BMP + synth, by magic

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
    x = _pcm_to_float(raw, sw)
    n = len(x) - len(x) % max(1, nch)
    return x[:n].reshape(-1, nch), rate, nch


def _pcm_to_float(raw: bytes, sampwidth: int) -> np.ndarray:
    """Integer PCM bytes → float32 in [-1, 1] (shared with the stdlib path)."""
    if sampwidth == 2:
        return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if sampwidth == 1:
        return (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if sampwidth == 4:
        return np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    if sampwidth == 3:
        b3 = np.frombuffer(raw, dtype=np.uint8)
        b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int32)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float32) / 8388608.0
    raise ValueError(f"unsupported PCM sample width {sampwidth}")


def _iter_riff_chunks(blob: bytes, start: int = 12):
    """Yield (fourcc, payload_offset, payload_size) for top-level RIFF
    sub-chunks. Chunks are word-aligned (odd sizes carry a pad byte)."""
    import struct

    off = start
    while off + 8 <= len(blob):
        fourcc, size = struct.unpack_from("<4sI", blob, off)
        off += 8
        yield fourcc, off, size
        off += size + (size & 1)


def decode_wav_ext(blob: bytes):
    """Pure-``struct`` RIFF/WAVE decode for the formats stdlib ``wave``
    rejects: IEEE-float WAV (format tag 3, 32/64-bit) and
    WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE — real format in the first two bytes
    of the SubFormat GUID; covers extensible-wrapped PCM and float).
    Plain PCM (tag 1) also decodes here, so this is a complete fallback
    parser. Returns ``(samples, rate, channels)``, samples float32
    (n_frames, channels) in [-1, 1]. Raises ``ValueError`` on anything
    compressed (ADPCM, MP3-in-WAV, …) — those genuinely need a codec."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    for fourcc, off, size in _iter_riff_chunks(blob):
        if fourcc == b"fmt " and fmt is None:
            fmt = blob[off : off + size]
        elif fourcc == b"data" and data is None:
            data = blob[off : off + size]
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated fmt chunk")
    tag, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag leads the GUID
        if len(fmt) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (cb,) = struct.unpack_from("<H", fmt, 16)
        if cb < 22 or len(fmt) < 18 + 22:
            raise ValueError("truncated extensible extension")
        (tag,) = struct.unpack_from("<H", fmt, 24)
    if nch < 1 or rate < 1:
        raise ValueError(f"bad fmt: channels={nch} rate={rate}")
    if tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data[: len(data) - len(data) % 4], "<f4").astype(
                np.float32
            )
        elif bits == 64:
            x = np.frombuffer(data[: len(data) - len(data) % 8], "<f8").astype(
                np.float32
            )
        else:
            raise ValueError(f"IEEE-float WAV with {bits} bits")
    elif tag == 1:  # integer PCM (extensible-wrapped or plain)
        if bits % 8 or not 8 <= bits <= 32:
            raise ValueError(f"PCM WAV with {bits} bits")
        x = _pcm_to_float(data, bits // 8)
    else:
        raise ValueError(f"compressed WAV format tag 0x{tag:04x} needs a codec")
    n = len(x) - len(x) % nch
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
                pass
            try:
                # stdlib wave rejects IEEE-float / EXTENSIBLE containers;
                # the pure-struct parser handles those (and plain PCM)
                return decode_wav_ext(blob)
            except Exception:
                # genuinely compressed WAV (ADPCM, MP3-in-WAV): fall
                # through to soundfile when available
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


def demux_avi(blob: bytes):
    """REAL RIFF/AVI demux via stdlib ``struct`` (same pattern as the WAV
    decode — no container library needed): returns ``(frames, fps)`` where
    ``frames`` is the ordered list of the FIRST video stream's chunk
    payloads (``##dc``/``##db`` — MJPEG JPEGs, uncompressed DIBs, …) and
    ``fps`` is ``strh.dwRate/dwScale`` (falling back to
    ``avih.dwMicroSecPerFrame``; 0.0 when neither is usable).

    Handles ``LIST rec `` interleave groups inside ``movi``. Frame DECODE
    still needs a codec the frames' format requires — callers surface
    undecodable payloads as ``decode_ok=False`` rows, not failures."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    fps = 0.0
    usec_per_frame = 0
    vids_stream = None
    stream_idx = 0
    frames = []

    def walk_movi(payload: bytes, want: bytes):
        for fourcc, off, size in _iter_riff_chunks(payload, 0):
            body = payload[off : off + size]
            if fourcc == b"LIST" and body[:4] == b"rec ":
                walk_movi(body[4:], want)
            elif fourcc[:2] == want and fourcc[2:4] in (b"dc", b"db"):
                frames.append(body)

    hdrl_seen = False
    for fourcc, off, size in _iter_riff_chunks(blob):
        body = blob[off : off + size]
        if fourcc != b"LIST":
            continue
        if body[:4] == b"hdrl" and not hdrl_seen:
            hdrl_seen = True
            # iterate strl lists with a correct per-stream counter
            for fc2, o2, s2 in _iter_riff_chunks(body, 4):
                b2 = body[o2 : o2 + s2]
                # guard on the ACTUAL slice length, not the declared chunk
                # size — a truncated blob silently shortens b2 and a
                # declared-size check would let unpack_from read past it
                # (struct.error escaping the violation-row contract)
                if fc2 == b"avih" and len(b2) >= 4:
                    (usec_per_frame,) = struct.unpack_from("<I", b2, 0)
                elif fc2 == b"LIST" and b2[:4] == b"strl":
                    for fc3, o3, s3 in _iter_riff_chunks(b2, 4):
                        if fc3 == b"strh" and len(b2) >= o3 + 28:
                            if b2[o3 : o3 + 4] == b"vids" and vids_stream is None:
                                vids_stream = stream_idx
                                scale, rate = struct.unpack_from(
                                    "<II", b2, o3 + 20
                                )
                                if scale and rate:
                                    fps = rate / scale
                        break
                    stream_idx += 1
        elif body[:4] == b"movi":
            want = b"%02d" % (vids_stream if vids_stream is not None else 0)
            walk_movi(body[4:], want)
    if not fps and usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    return frames, fps


class VideoFrameSample:
    """Video ``binary`` column → every-Nth-frame sample (flat_map layout:
    one row per sampled frame).

    RIFF/AVI containers are demuxed FOR REAL via :func:`demux_avi` (stdlib
    ``struct`` — MJPEG/DIB chunk payloads of the first video stream, frame
    timestamps from the stream header's dwRate/dwScale). Other payloads
    keep the deterministic fake container used by tests (4-byte
    length-prefixed synth-codec frames; no timing → NaN timestamps).

    Output columns: (parent id, frame_index, timestamp_s, frame_bytes,
    decode_ok). ``decode_ok`` reports whether any available codec decodes
    the frame — REAL stdlib PNG/BMP (``functions/imagecodec`` via
    ``stages.image.decode_any``) or the synth codec; real MJPEG JPEGs
    surface as ``decode_ok=False`` violation rows (this container has no
    JPEG decoder), matching the audio stage's honest codec gate."""

    def __init__(self, id_column: str, column: str = "video", every_n: int = 10):
        from .image import decode_any

        self.id_column, self.column, self.every_n = id_column, column, every_n
        self._decode = decode_any

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
        ids_out, idxs, tss, frames, oks = [], [], [], [], []
        ids = batch[self.id_column].to_pylist()
        import struct as _struct

        for row, blob in enumerate(batch[self.column].to_pylist()):
            if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                try:
                    all_frames, fps = demux_avi(blob)
                except (ValueError, _struct.error):
                    # corrupt container -> ONE visible violation row
                    # (frame_index=-1, decode_ok=False), never a task kill
                    ids_out.append(ids[row])
                    idxs.append(-1)
                    tss.append(float("nan"))
                    frames.append(b"")
                    oks.append(False)
                    continue
            else:
                all_frames, fps = list(self._frames(blob)), 0.0
            for i, frame in enumerate(all_frames):
                if i % self.every_n == 0:
                    ids_out.append(ids[row])
                    idxs.append(i)
                    tss.append(i / fps if fps else float("nan"))
                    frames.append(frame)
                    try:
                        self._decode(frame)
                        oks.append(True)
                    except Exception:
                        oks.append(False)
        return pa.table(
            {
                self.id_column: pa.array(ids_out, batch[self.id_column].type),
                "frame_index": pa.array(idxs, pa.int64()),
                "timestamp_s": pa.array(tss, pa.float64()),
                "frame_bytes": pa.array(frames, pa.binary()),
                "decode_ok": pa.array(oks, pa.bool_()),
            }
        )
