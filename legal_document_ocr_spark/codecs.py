"""Pure-stdlib media codecs (zlib/struct/wave — no PIL/cv2 in this env).

Round-1 shipped ``decode_image`` as a declared NotImplementedError stub
because "the image libs aren't in this container". That's true of
PIL/cv2/ffmpeg — but PNG, BMP and WAV are decodable with nothing beyond
zlib + struct + wave, so the decode step is REAL for those formats; round 3
added a real baseline JPEG decoder too (jpeg.py — Huffman + IDCT,
grayscale/YCbCr, 4:2:0, restart markers) and a GIF decoder (LZW +
interlace + palette below), so the stub now covers only genuinely-
library-bound codecs (WebP/video).

Scope: non-interlaced 8-bit-depth PNG in grayscale (color type 0), RGB (2)
and RGBA (6) with all five scanline filters; uncompressed 24-bit BMP;
PCM WAV; baseline JPEG (jpeg.py); GIF87a/89a first frame. Reference analogue: the reference leans on PIL inside
image_preprocessing_service.py:57-122 — same contract, stdlib engine.
These kernels run inside Arrow-batched mapInPandas stages
(operators/multimodal.py); per-image Python is the accepted cost of a real
codec, exactly as it would be with PIL.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}

# Decompression-bomb bound: a crafted IHDR can declare 2^32-1 x 2^32-1 and
# the decoder would allocate height*stride bytes before reading one scanline.
# 64M pixels (~256 MB RGBA) is far above any legitimate thumbnail/page scan
# in a crawl corpus; everything larger is rejected as malformed input, the
# same contract PIL enforces via Image.MAX_IMAGE_PIXELS.
MAX_IMAGE_PIXELS = 1 << 26


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Minimal PNG encoder (filter 0 rows, one IDAT). ``pixels`` is
    row-major samples, ``len == width*height*channels``."""
    ch = _PNG_CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, ch: int) -> bytes:
    """Reverse PNG scanline filters (types 0-4) for 8-bit samples."""
    stride = width * ch
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prev_row = out[(y - 1) * stride : y * stride] if y > 0 else b"\x00" * stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev_row[i]
                c = prev_row[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
    return bytes(out)


def decode_png(payload: bytes) -> dict:
    """Decode a non-interlaced 8-bit PNG: {width, height, mode, pixels}.

    Hardened against attacker-controlled input (a crawl corpus is exactly
    that): truncated chunk framing, missing/short IHDR, dimensioned
    decompression bombs (> MAX_IMAGE_PIXELS) and short IDAT streams all
    raise ValueError BEFORE any large allocation — never KeyError /
    IndexError / MemoryError.
    """
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, ctype, idat = 8, None, None, None, b""
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if pos + 8 + length > len(payload):
            raise ValueError("truncated PNG chunk data")
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if length < 13:
                raise ValueError("short IHDR")
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit non-interlaced gray/RGB/RGBA PNG supported"
                )
            if width <= 0 or height <= 0:
                raise ValueError("invalid PNG dimensions")
            if width * height > MAX_IMAGE_PIXELS:
                raise ValueError(
                    f"PNG dimensions {width}x{height} exceed "
                    f"MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS}"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ctype is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[ctype]
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != height * (1 + width * ch):
        raise ValueError(
            f"PNG pixel data length {len(raw)} does not match "
            f"{height}x{width}x{ch} scanlines"
        )
    pixels = _unfilter(raw, width, height, ch)
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[ch]
    return {"width": width, "height": height, "mode": mode, "pixels": pixels}


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP: {width, height, mode, pixels}
    (pixels top-down RGB, padding stripped)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    if len(payload) < 34:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    bpp, comp = struct.unpack("<HI", payload[28:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    row_sz = (width * 3 + 3) & ~3
    flip = height > 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("invalid BMP dimensions")
    if width * height > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"BMP dimensions {width}x{height} exceed "
            f"MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS}"
        )
    if data_off + height * row_sz > len(payload):
        raise ValueError("truncated BMP pixel data")
    out = bytearray()
    for y in range(height):
        src_y = (height - 1 - y) if flip else y
        row = payload[data_off + src_y * row_sz : data_off + src_y * row_sz + width * 3]
        for x in range(width):  # BGR -> RGB
            b, g, r = row[x * 3 : x * 3 + 3]
            out += bytes((r, g, b))
    return {"width": width, "height": height, "mode": "RGB", "pixels": bytes(out)}


def decode_wav(payload: bytes) -> dict:
    """Decode a PCM WAV via stdlib wave: {channels, sample_rate, n_frames,
    sample_width, pcm}."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        return {
            "channels": w.getnchannels(),
            "sample_rate": w.getframerate(),
            "n_frames": w.getnframes(),
            "sample_width": w.getsampwidth(),
            "pcm": w.readframes(w.getnframes()),
        }


def decode_image(payload: bytes) -> dict:
    """Dispatch by magic bytes. PNG/BMP/baseline-JPEG/GIF decode for real
    (jpeg.py: Huffman + IDCT, grayscale/YCbCr, 4:2:0, restart markers;
    decode_gif below: LZW + interlace + palette); remaining formats
    (WebP/video frames) still need an external codec."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise NotImplementedError(
        "only PNG, BMP, baseline JPEG and GIF decode without an external "
        "codec library (WebP/video need PIL/cv2/ffmpeg)"
    )


# ---------------------------------------------------------------------------
# GIF (round 3: LZW is pure integer work — no external library needed)
# ---------------------------------------------------------------------------


def encode_gif(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """Minimal GIF89a encoder (single frame, global 256-color table,
    'uncompressed' LZW: every index emitted as a literal code with clear
    codes injected before the code width would grow). For roundtrip tests.

    ``indices``: row-major palette indices; ``palette``: 768 bytes RGB.
    """
    if len(palette) != 768:
        raise ValueError("palette must be 256 RGB entries (768 bytes)")
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # global table, 8-bit color, 256 entries
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    mcs = 8  # LZW minimum code size
    clear, end = 1 << mcs, (1 << mcs) + 1
    code_bits = mcs + 1
    acc = 0
    nbits = 0
    data = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF is LSB-first
        nbits += code_bits
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    budget = (1 << code_bits) - end - 2  # literals before width would grow
    n = 0
    for idx in indices:
        if n == budget:
            put(clear)
            n = 0
        put(idx)
        n += 1
    put(end)
    if nbits:
        data.append(acc & 0xFF)
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _gif_lzw_decode(mcs: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: LSB-first variable-width codes, dict reset on clear,
    max 4096 entries."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        nonlocal table, code_bits
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_bits = mcs + 1

    code_bits = mcs + 1
    reset()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < code_bits:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_bits) - 1)
        acc >>= code_bits
        nbits -= code_bits
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_bits) and code_bits < 12:
                code_bits += 1
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise ValueError("GIF pixel data shorter than frame")
    return out[:expected]


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> dict:
    """Decode the FIRST frame of a GIF87a/89a: {width, height, mode, pixels}
    (RGB, palette applied, interlacing undone). Same hardening contract as
    the other decoders: truncated blocks / missing color table / dimension
    bombs raise ValueError before large allocation. Animation beyond the
    first frame is out of scope (documented, not silent)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    global_table = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_table = payload[pos : pos + n]
        if len(global_table) < n:
            raise ValueError("truncated GIF color table")
        pos += n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _, _, w, h = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        if w <= 0 or h <= 0:
            raise ValueError("invalid GIF dimensions")
        if w * h > MAX_IMAGE_PIXELS:
            raise ValueError(
                f"GIF dimensions {w}x{h} exceed MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS}"
            )
        table = global_table
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            table = payload[pos : pos + n]
            if len(table) < n:
                raise ValueError("truncated GIF local color table")
            pos += n
        if not table:
            raise ValueError("GIF frame has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF before LZW data")
        mcs = payload[pos]
        pos += 1
        if not (2 <= mcs <= 11):
            raise ValueError("invalid GIF LZW minimum code size")
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            data += payload[pos + 1 : pos + 1 + n]
            pos += 1 + n
        idx = _gif_lzw_decode(mcs, bytes(data), w * h)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            de = bytearray(w * h)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    de[y * w : (y + 1) * w] = idx[src : src + w]
                    src += w
            idx = de
        ncolors = len(table) // 3
        out = bytearray(w * h * 3)
        for i, ix in enumerate(idx):
            if ix >= ncolors:
                raise ValueError("GIF index outside color table")
            out[i * 3 : i * 3 + 3] = table[ix * 3 : ix * 3 + 3]
        return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}
    raise ValueError("GIF has no image frame")
