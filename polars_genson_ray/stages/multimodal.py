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
  * audio/video stages are STUBS behind an import-try: the Ray-side
    plumbing (schema, batch shape, actor signature, output layout) is real
    and tested with a deterministic fake decoder; the codec call raises
    ``NotImplementedError`` unless a library (soundfile / av) is present.

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


class AudioFeatures:
    """STUB: audio ``binary`` column → (duration_s, rms, n_samples).

    The Ray plumbing is real; with no codec library the stage requires
    ``fake_pcm=True`` (payload bytes interpreted as int16 PCM @ ``rate``,
    the deterministic fake used in tests) and raises NotImplementedError
    otherwise — swapping in soundfile touches only ``_decode``."""

    def __init__(self, column: str = "audio", rate: int = 16000, *, fake_pcm: bool = False):
        self.column, self.rate, self.fake_pcm = column, rate, fake_pcm
        if not (fake_pcm or _HAVE_AUDIO):
            raise NotImplementedError(
                "no audio codec in this environment; pass fake_pcm=True for "
                "the deterministic int16-PCM interpretation, or install soundfile"
            )

    def _decode(self, blob: bytes) -> np.ndarray:
        if self.fake_pcm or not _HAVE_AUDIO:
            return np.frombuffer(
                blob[: len(blob) - len(blob) % 2], dtype=np.int16
            ).astype(np.float32) / 32768.0
        data, _ = _soundfile.read(__import__("io").BytesIO(blob))
        return np.asarray(data, dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss, ns = [], [], []
        for b in batch[self.column].to_pylist():
            samples = self._decode(b)
            ns.append(len(samples))
            durs.append(len(samples) / float(self.rate))
            rmss.append(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0)
        batch = batch.append_column("duration_s", pa.array(durs, pa.float64()))
        batch = batch.append_column("rms", pa.array(rmss, pa.float64()))
        return batch.append_column("n_samples", pa.array(ns, pa.int64()))


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
