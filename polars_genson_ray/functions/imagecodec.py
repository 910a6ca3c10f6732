"""Real stdlib image codecs: PNG (zlib + struct) and BMP (struct).

The sandbox ships no image library (no PIL/cv2/imageio — verified), so the
flagship's decode stage ran on the repo's synthetic codec alone. This
module upgrades it the same way the WAV decode upgraded audio
(`stages/multimodal.decode_wav_pcm`): a REAL, spec-following decoder built
only on the standard library + numpy, with loud ``ValueError`` on anything
out of scope. JPEG stays undecodable here (entropy coding is out of
stdlib reach) — MJPEG frames keep their honest ``decode_ok=False`` rows.

Coverage:
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette + tRNS),
  4 (gray+alpha), 6 (RGBA); all five scanline filters; non-interlaced;
  per-chunk CRC verification. Filters None/Sub/Up unfilter fully
  vectorized (Sub is a per-channel prefix sum mod 256); Average/Paeth
  take a per-pixel loop with vectorized channel math — correct on any
  input, slower on large adaptive-filtered images (documented; our own
  encoder defaults to filter 0).
- BMP: BITMAPINFOHEADER, BI_RGB 24/32-bit, bottom-up and top-down rows,
  4-byte row padding.

Encoders exist for both (PNG can emit any filter type — that's how the
decode paths get test coverage without an external image library).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (int32 in, int32 out)."""
    p = a + b - c
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        yield typ, body
        if typ == b"IEND":
            return
        pos += 12 + length
    raise ValueError("PNG missing IEND")


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to (h, w, C) uint8, C in {1, 2, 3, 4}.

    Raises ValueError on corruption or unsupported features (16-bit,
    interlaced, sub-byte depths)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    trns = None
    idat: list[bytes] = []
    for typ, body in _iter_chunks(data):
        if typ == b"IHDR":
            if len(body) != 13:
                # keep the error a ValueError (the validator's violation-
                # row contract), not a struct.error
                raise ValueError(f"bad IHDR length {len(body)}")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if len(body) % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif typ == b"IDAT":
            idat.append(body)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctype not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    if not idat:
        raise ValueError("PNG missing IDAT")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    expected = (stride + 1) * h
    # bound the inflate to the IHDR-derived size: a few-KB crafted IDAT
    # can otherwise inflate to GBs and OOM the worker before the length
    # check runs (decompression bomb); max_length stops at expected+1,
    # which the length check below converts into a loud ValueError
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG stream: {e}") from None
    if dec.unconsumed_tail:
        raise ValueError("PNG payload exceeds expected size")
    if len(raw) != expected:
        raise ValueError(
            f"PNG payload {len(raw)} != {expected} expected"
        )
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = rows[:, 0]
    if (ftypes > 4).any():
        raise ValueError("invalid PNG filter type")
    out = np.empty((h, stride), np.uint8)
    zero_row = np.zeros(stride, np.int32)
    for i in range(h):
        cur = rows[i, 1:].astype(np.int32)
        prev = out[i - 1].astype(np.int32) if i else zero_row
        ft = ftypes[i]
        if ft == 0:
            rec = cur
        elif ft == 2:  # Up — vectorized
            rec = cur + prev
        elif ft == 1:  # Sub — per-channel prefix sum mod 256
            rec = np.cumsum(cur.reshape(w, ch), axis=0, dtype=np.int64)
            rec = rec.reshape(stride)
        else:  # Average (3) / Paeth (4): sequential left-dependence.
            # Pure-python int inner loop: per-pixel numpy ops on
            # 3-element arrays cost ~3 µs each (139 ms for an 80×80
            # image); plain int arithmetic with list indexing runs the
            # same row in ~1/20th the time. Filters 0/1/2 (incl. our own
            # encoder's output) never take this path.
            cur_l = cur.tolist()
            prev_l = prev.tolist()
            rec_l = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = rec_l[x - ch] if x >= ch else 0
                    rec_l[x] = (cur_l[x] + ((left + prev_l[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    if x >= ch:
                        a = rec_l[x - ch]
                        c = prev_l[x - ch]
                    else:
                        a = 0
                        c = 0
                    b = prev_l[x]
                    pb = a - c if a >= c else c - a     # |p - b|
                    pa = b - c if b >= c else c - b     # |p - a|
                    s = a + b - c
                    pc = s - c if s >= c else c - s     # |p - c|
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rec_l[x] = (cur_l[x] + pred) & 0xFF
            out[i] = rec_l
            continue
        out[i] = rec & 0xFF
    px = out.reshape(h, w, ch)
    if ctype == 3:  # palette
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[..., 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return px


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------

def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, *, filter_type: int = 0,
               level: int = 6) -> bytes:
    """Encode (h, w[, C]) uint8 (C in {1, 2, 3, 4}) as a PNG.

    ``filter_type`` applies one filter to every scanline (0–4). The
    encode side of every filter is fully vectorized (predictors read
    ORIGINAL bytes, so there is no sequential dependence on encode)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    if px.ndim != 3 or px.shape[2] not in (1, 2, 3, 4):
        raise ValueError("pixels must be (h, w) or (h, w, 1|2|3|4) uint8")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int32)
    prev = np.vstack([np.zeros((1, w * ch), np.int32), flat[:-1]])
    left = np.zeros_like(flat)
    left[:, ch:] = flat[:, :-ch]
    upleft = np.zeros_like(flat)
    upleft[:, ch:] = prev[:, :-ch]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - prev
    elif filter_type == 3:
        filt = flat - ((left + prev) >> 1)
    else:
        filt = flat - _paeth(left, prev, upleft)
    filt = (filt & 0xFF).astype(np.uint8)
    scan = np.empty((h, w * ch + 1), np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filt
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BI_RGB 24/32-bit BMP to (h, w, 3|4) uint8 (RGB order)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offbits,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp {bpp} (24/32 only)")
    if w <= 0 or h_signed == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h_signed < 0
    h = abs(h_signed)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    need = offbits + stride * h
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} < {need}")
    raw = np.frombuffer(data, np.uint8, count=stride * h, offset=offbits)
    rows = raw.reshape(h, stride)[:, : w * nbytes].reshape(h, w, nbytes)
    if not top_down:
        rows = rows[::-1]
    if nbytes == 3:  # BGR -> RGB
        return np.ascontiguousarray(rows[..., ::-1])
    # BGRA -> RGBA
    return np.ascontiguousarray(rows[..., [2, 1, 0, 3]])


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bit bottom-up BI_RGB BMP."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    body = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + body


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def to_rgb3(px: np.ndarray) -> np.ndarray:
    """Normalize decoded (h, w, C) to (h, w, 3): gray replicates, alpha
    drops (straight, non-premultiplied source assumed)."""
    ch = px.shape[2]
    if ch == 3:
        return px
    if ch == 4:
        return np.ascontiguousarray(px[..., :3])
    gray = px[..., 0]
    return np.repeat(gray[..., None], 3, axis=2)


def sniff_format(data: bytes) -> str | None:
    """'png' / 'bmp' for real container magics, else None."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"BM" and len(data) >= 54:
        return "bmp"
    return None
