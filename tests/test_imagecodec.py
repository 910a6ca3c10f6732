"""Real stdlib PNG/BMP codec tests (``functions/imagecodec.py``).

The PNG decoder is exercised against (a) our own encoder across every
filter type × channel count (round-trip exactness), and (b) PNG byte
streams hand-assembled IN THE TEST from the spec (chunk layout, palette,
tRNS) so a shared encoder/decoder bug can't self-certify. Corruption
classes must raise ValueError — the flagship validator converts that into
``decode_ok=False`` violation rows."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from polars_genson_ray.functions.imagecodec import (
    PNG_SIG,
    decode_bmp,
    decode_png,
    encode_bmp,
    encode_png,
    sniff_format,
    to_rgb3,
)

rng = np.random.default_rng(0xC0DEC)


def _chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(channels, filter_type):
    for h, w in ((1, 1), (3, 5), (17, 31)):
        px = rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
        back = decode_png(encode_png(px, filter_type=filter_type))
        assert back.shape == (h, w, channels)
        assert np.array_equal(back, px)


def test_png_gray_2d_input():
    g = rng.integers(0, 256, (9, 9), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(g))[..., 0], g)


def test_png_hand_built_palette_and_trns():
    # independent of our encoder: bytes assembled straight from the spec
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    scan = b"".join(b"\x00" + row.tobytes() for row in idx)
    base = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", plte)
    )
    tail = _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")
    out = decode_png(base + tail)
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert np.array_equal(out, exp)
    # tRNS: palette entry 0 translucent -> RGBA output
    out_a = decode_png(base + _chunk(b"tRNS", bytes([7])) + tail)
    assert out_a.shape == (2, 2, 4)
    assert out_a[0, 0, 3] == 7 and out_a[0, 1, 3] == 255
    assert np.array_equal(out_a[..., :3], exp)


def test_png_corruption_classes_raise():
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError):
        decode_png(good[:-5])  # truncated
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))  # CRC mismatch
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)  # no chunks
    # 16-bit depth and interlace are out of scope -> loud errors
    ihdr16 = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(PNG_SIG + ihdr16 + _chunk(b"IEND", b""))
    ihdr_i = _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(PNG_SIG + ihdr_i + _chunk(b"IEND", b""))
    # malformed IHDR length must stay a ValueError (the validator's
    # violation-row contract), never a struct.error
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(
            PNG_SIG + _chunk(b"IHDR", b"\x00" * 7) + _chunk(b"IEND", b"")
        )


def test_png_corruption_fuzz_never_escapes_valueerror():
    """Flip/truncate random bytes of valid PNGs: decode must return
    (CRC catches most flips → ValueError) or raise ValueError — never a
    struct.error / IndexError / hang that would kill a validator task
    instead of producing a violation row."""
    fuzz = np.random.default_rng(1234)
    base = [
        encode_png(
            fuzz.integers(0, 256, (h, w, c), dtype=np.uint8),
            filter_type=int(f),
        )
        for (h, w, c, f) in [(5, 7, 3, 0), (4, 4, 4, 4), (6, 3, 1, 3)]
    ]
    for _ in range(300):
        blob = bytearray(base[int(fuzz.integers(len(base)))])
        kind = fuzz.integers(3)
        if kind == 0:  # flip 1-4 bytes
            for p in fuzz.integers(0, len(blob), size=int(fuzz.integers(1, 5))):
                blob[p] ^= int(fuzz.integers(1, 256))
        elif kind == 1:  # truncate
            blob = blob[: int(fuzz.integers(0, len(blob)))]
        else:  # garbage tail
            blob = blob + bytes(fuzz.integers(0, 256, size=16, dtype=np.uint8))
        try:
            out = decode_png(bytes(blob))
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass  # the violation-row path


def test_png_decompression_bomb_raises_not_ooms():
    """A few-KB IDAT that inflates to MBs must raise ValueError after at
    most expected+1 inflated bytes (max_length bound), not materialize
    the whole bomb before the length check."""
    ihdr = _chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 0, 0, 0, 0))
    bomb = _chunk(b"IDAT", zlib.compress(b"\x00" * (16 << 20), 9))
    with pytest.raises(ValueError, match="exceeds|expected"):
        decode_png(PNG_SIG + ihdr + bomb + _chunk(b"IEND", b""))


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 31), (33, 2)])
def test_bmp_round_trip(shape):
    px = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_top_down_and_32bit():
    # hand-built 2x2 top-down BGRA BMP (independent of encode_bmp)
    px_bgra = np.array(
        [[[1, 2, 3, 9], [4, 5, 6, 8]], [[7, 8, 9, 7], [10, 11, 12, 6]]],
        np.uint8,
    )
    body = px_bgra.tobytes()  # 32bpp rows of w=2 need no padding
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(body), 0, 0, 0, 0
    )
    out = decode_bmp(hdr + dib + body)
    assert out.shape == (2, 2, 4)
    # BGRA -> RGBA, rows NOT flipped (negative height = top-down)
    assert out[0, 0].tolist() == [3, 2, 1, 9]
    assert out[1, 1].tolist() == [12, 11, 10, 6]


def test_bmp_corruption():
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = encode_bmp(px)
    with pytest.raises(ValueError):
        decode_bmp(good[:40])
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])


def test_to_rgb3_and_sniff():
    g = rng.integers(0, 256, (5, 5, 1), dtype=np.uint8)
    assert to_rgb3(g).shape == (5, 5, 3)
    ga = rng.integers(0, 256, (5, 5, 2), dtype=np.uint8)
    assert np.array_equal(to_rgb3(ga)[..., 0], ga[..., 0])
    rgba = rng.integers(0, 256, (5, 5, 4), dtype=np.uint8)
    assert np.array_equal(to_rgb3(rgba), rgba[..., :3])
    assert sniff_format(encode_png(g)) == "png"
    assert sniff_format(encode_bmp(to_rgb3(g))) == "bmp"
    assert sniff_format(b"PGRIxxxxxxxxxxxxxxxxxxxx") is None


def test_decode_validator_dispatches_real_formats():
    """The flagship stage decodes real PNG/BMP payloads pixel-exact and
    flags truncated ones — driven in-process (plain callable)."""
    from polars_genson_ray.sources.synth import reference_pixels
    from polars_genson_ray.stages.image import DecodeValidator

    ids, blobs, ws, hs, fmts = [], [], [], [], []
    for i, kind in enumerate(["png"] * 5 + ["bmp"] * 3 + ["bad"] * 2):
        image_id = f"rt{i}"
        w, h = 8 + 4 * (i % 3), 12
        px = reference_pixels(image_id, w, h)
        if kind == "png":
            blob, fmt = encode_png(px, filter_type=i % 5), "png"
        elif kind == "bmp":
            blob, fmt = encode_bmp(px), "bmp"
        else:
            blob, fmt = encode_png(px)[:25], "png"
        ids.append(image_id); blobs.append(blob)
        ws.append(w); hs.append(h); fmts.append(fmt)
    batch = pa.table(
        {"image_id": ids, "bytes": blobs, "w": ws, "h": hs, "fmt": fmts}
    )
    out = DecodeValidator()(batch)
    decode_ok = out["decode_ok"].to_pylist()
    pixels_ok = out["pixels_ok"].to_pylist()
    assert decode_ok == [True] * 8 + [False] * 2
    assert pixels_ok == [True] * 8 + [False] * 2
    assert all(v == "" for v in out["violation"].to_pylist()[:8])
    assert all(
        v.startswith("decode_error") for v in out["violation"].to_pylist()[8:]
    )


def test_resize_and_features_accept_real_png():
    """ImageResize / ImageFeatures run on real-PNG payloads via the same
    magic dispatch (in-process, plain callables)."""
    from polars_genson_ray.sources.synth import decode_image, reference_pixels
    from polars_genson_ray.stages.multimodal import ImageFeatures, ImageResize

    px = reference_pixels("rf0", 20, 14)
    batch = pa.table(
        {
            "image_id": ["rf0", "bad"],
            "bytes": [encode_png(px), b"\xff\xd8 not decodable"],
            "w": [20, 20],
            "h": [14, 14],
        }
    )
    rz = ImageResize(out_w=8, out_h=8)(batch)
    assert rz["resize_ok"].to_pylist() == [True, False]
    dec, _ = decode_image(rz["bytes"].to_pylist()[0])
    assert dec.shape == (8, 8, 3)
    ft = ImageFeatures()(batch)
    vals = ft["features"].to_pylist()
    assert len(vals[0]) == ImageFeatures.DIM
    assert not any(np.isnan(vals[0]))
    assert all(np.isnan(vals[1]))


def test_image_formats_real_query_counts(ray_session):
    """Planted-table query: per-format outcome counts are fully determined
    by the id -> (format, corruption) rule."""
    from polars_genson_ray.pipelines.queries import r_image_formats_real

    out = r_image_formats_real("", rows=256).set_index("fmt")
    # i%8: 0-3 png good, 4-6 bmp, 7 truncated png
    assert out.loc["png", "n"] == 160          # 128 good + 32 truncated
    assert out.loc["png", "n_decoded"] == 128
    assert out.loc["png", "n_pixel_exact"] == 128
    assert out.loc["bmp", "n"] == 96
    assert out.loc["bmp", "n_decoded"] == 96
    assert out.loc["bmp", "n_pixel_exact"] == 96
