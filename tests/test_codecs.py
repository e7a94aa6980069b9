"""Pure-stdlib media codecs (codecs.py): roundtrips + filter correctness."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from legal_document_ocr_spark.codecs import (
    _unfilter,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (16, 8), (33, 7)])
def test_png_gray_roundtrip(w, h):
    px = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    img = decode_png(encode_png(w, h, px, 0))
    assert (img["width"], img["height"], img["mode"]) == (w, h, "L")
    assert img["pixels"] == px


@pytest.mark.parametrize("ct,ch,mode", [(2, 3, "RGB"), (6, 4, "RGBA")])
def test_png_color_roundtrip(ct, ch, mode):
    w, h = 6, 4
    px = bytes(
        (x + y + c) % 256 for y in range(h) for x in range(w) for c in range(ch)
    )
    img = decode_png(encode_png(w, h, px, ct))
    assert img["mode"] == mode and img["pixels"] == px


def _refilter(px: bytes, w: int, h: int, ch: int, ftype: int) -> bytes:
    """Forward-apply a PNG filter so _unfilter must invert it exactly."""
    stride = w * ch
    rows, prev = [], bytes(stride)
    for y in range(h):
        line = bytearray(px[y * stride : (y + 1) * stride])
        orig = bytes(line)
        if ftype == 1:
            for i in range(stride - 1, ch - 1, -1):
                line[i] = (line[i] - orig[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = orig[i - ch] if i >= ch else 0
                line[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = orig[i - ch] if i >= ch else 0
                b, c = prev[i], prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(line))
        prev = orig
    return b"".join(rows)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_unfilter_inverts_every_filter(ftype):
    w, h, ch = 4, 3, 1
    px = bytes((x * 11 + y * 29) % 256 for y in range(h) for x in range(w))
    assert _unfilter(_refilter(px, w, h, ch, ftype), w, h, ch) == px


def test_bmp_24bit_roundtrip():
    w, h = 3, 2
    rgb = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3), (4, 5, 6), (7, 8, 9)]
    row_sz = (w * 3 + 3) & ~3
    data = b""
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = b"".join(bytes((b_, g, r)) for (r, g, b_) in rgb[y * w : (y + 1) * w])
        data += row + b"\x00" * (row_sz - len(row))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    img = decode_bmp(hdr + dib + data)
    assert (img["width"], img["height"], img["mode"]) == (w, h, "RGB")
    assert img["pixels"] == b"".join(bytes(p) for p in rgb)


def test_wav_roundtrip():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(struct.pack("<8h", *range(8)))
    wav = decode_wav(buf.getvalue())
    assert (wav["channels"], wav["sample_rate"], wav["n_frames"]) == (2, 16000, 4)
    assert len(wav["pcm"]) == 16


def test_dispatch_jpeg_still_needs_a_library():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0jpegdata")


# ---------------------------------------------------------------------------
# hardening: attacker-controlled input (ADVICE r2 medium)
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import zlib as _zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def test_png_decompression_bomb_rejected_before_allocation():
    """A crafted IHDR declaring huge dims must raise ValueError, not
    attempt a multi-GB bytearray."""
    from legal_document_ocr_spark.codecs import _PNG_SIG

    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0)
    bomb = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_png(bomb)


def test_png_missing_ihdr_is_valueerror():
    from legal_document_ocr_spark.codecs import _PNG_SIG

    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(_PNG_SIG + _png_chunk(b"IEND", b""))


def test_png_truncated_chunk_and_short_idat_are_valueerror():
    import zlib as _zlib

    from legal_document_ocr_spark.codecs import _PNG_SIG, encode_png

    good = encode_png(4, 4, bytes(range(16)), 0)
    with pytest.raises(ValueError):
        decode_png(good[:-10])  # truncated mid-chunk
    # valid framing, IDAT shorter than height*(1+stride)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00" * 7))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="does not match"):
        decode_png(short)
    # corrupt deflate stream
    bad = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", b"\x99\x99\x99")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bad)


def test_bmp_truncated_and_bomb_are_valueerror():
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 1 << 16, 1 << 16, 1, 24, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="MAX_IMAGE_PIXELS"):
        decode_bmp(hdr + dib)
    dib2 = struct.pack("<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_bmp(hdr + dib2 + b"\x00" * 10)
