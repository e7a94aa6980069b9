"""Pure-stdlib WebP-lossless (VP8L) codec — round 4.

WebP is the dominant modern web image format; round 3 left it as the
declared stub. Lossless WebP (VP8L) is Huffman + LZ77 + color cache +
four reversible transforms — no DCT, no float — so it is pure-integer
stdlib work, same as the GIF/JPEG/TIFF decoders. Lossy WebP (VP8 intra
keyframes) decodes for real since round 5 (vp8.py), dispatched from
``decode_webp`` below.

Implemented per the public "WebP Lossless Bitstream Specification":

- container: RIFF/WEBP chunk walk (plain and VP8X-extended), VP8L only;
- header: 0x2F signature, 14-bit dims, version 0;
- entropy code: canonical prefix codes, both the "simple" (1-2 symbol)
  and the full code-length-coded variant incl. the 16/17/18 RLE codes
  and the optional max_symbol cap;
- meta-prefix (entropy image) group selection;
- LZ77 backward references with the 24 length / 40 distance prefix
  codes, including the 120-entry close-neighborhood distance mapping;
- color cache (1..11 bits, 0x1e35a7bd multiplicative hash);
- inverse transforms: SUBTRACT_GREEN, PREDICTOR (all 14 modes), COLOR
  (cross-color deltas), COLOR_INDEXING (palette, incl. sub-byte pixel
  bundling for <=16 colors).

The short-distance table note: the spec orders the (dx in -8..8,
dy in 0..7) neighborhood by increasing squared distance, larger dy
first within ties, positive dx before negative — `_distance_map()`
derives the 120 entries from that rule and the published prefix is
pinned by tests/test_codecs.py::test_vp8l_distance_map_prefix.

The encoder (`encode_webp_lossless`) is the roundtrip-oracle
counterpart (same pattern as encode_png/encode_gif/encode_tiff): real
canonical-Huffman literal streams, optional SUBTRACT_GREEN transform,
optional color cache and an optional greedy run-length LZ77 so tests
exercise the copy/cache paths, no meta-prefix. Reference analogue: the
reference accepts image uploads through PIL
(app/services/image_preprocessing_service.py:57-122); this keeps the
same contract with a stdlib engine.
"""

from __future__ import annotations

import heapq
import struct

# ---------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first within bytes; prefix-code bits are read
# root-first, i.e. emitted MSB-of-code first)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte_i, bit_i = divmod(self._pos, 8)
            if byte_i >= len(self._d):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self._d[byte_i] >> bit_i) & 1) << i
            self._pos += 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


class _BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        """LSB-first write of an nbits-wide value."""
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code write: the code's MSB goes out first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self._bytes)
        if self._n:
            out += bytes((self._acc & 0xFF,))
        return out


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (shorter first, then symbol
    order) — the DEFLATE/VP8L assignment."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _HuffDecoder:
    """Bit-by-bit canonical decoder. A single-symbol code consumes 0 bits
    (the VP8L 'simple' 1-symbol case and degenerate full codes)."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty VP8L prefix code")
        if len(nz) == 1:
            self._single = nz[0][1]
            self._table = None
            return
        self._single = None
        self._table = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }
        self._max_len = max(l for l, _ in nz)

    def decode(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code = 0
        for length in range(1, self._max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self._table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code in stream")


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> list[int]:
    """Code lengths from frequencies (heap Huffman). len(result) =
    max(symbol)+1. Depth is bounded by flattening if it ever exceeds
    ``max_len`` (cannot happen for the small test images but stated)."""
    syms = [s for s, f in freqs.items() if f > 0]
    n = (max(syms) + 1) if syms else 0
    lengths = [0] * n
    if not syms:
        return lengths
    if len(syms) == 1:
        lengths[syms[0]] = 1
        return lengths
    heap = [(freqs[s], (s,)) for s in syms]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, g1 = heapq.heappop(heap)
        f2, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            lengths[s] += 1
        heapq.heappush(heap, (f1 + f2, g1 + g2))
    if max(lengths) > max_len:  # pragma: no cover - flat fallback
        bits = max(s.bit_length() for s in range(len(syms))) or 1
        for i, s in enumerate(sorted(syms)):
            lengths[s] = bits + (0 if i < (1 << bits) else 1)
    return lengths


# ---------------------------------------------------------------------------
# spec tables
# ---------------------------------------------------------------------------

_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16
)

_NUM_LITERALS = 256
_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40
_HASH_MUL = 0x1E35A7BD


def _distance_map() -> list[tuple[int, int]]:
    """The 120 close-neighborhood (dx, dy) offsets for distance codes
    1..120: all (dx in -8..8, dy in 0..7) with positive linear offset,
    ordered by squared distance, then larger dy, then positive dx before
    negative (prefix pinned against the published table by tests)."""
    cand = []
    for dy in range(8):
        for dx in range(-8, 9):
            if dy == 0 and dx <= 0:
                continue
            cand.append((dx, dy))
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cand[:120]


_DISTANCE_MAP = _distance_map()


def _lz77_prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """value -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rem = v - (1 << (v.bit_length() - 1))
    half = (rem >> extra) & 1
    code = 2 * extra + 2 + half
    return code, rem & ((1 << extra) - 1), extra


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _HuffDecoder:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _HuffDecoder(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_dec = _HuffDecoder(cl_lengths)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev_len = 8
    while len(lengths) < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_dec.decode(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev_len = s
        elif s == 16:
            lengths.extend([prev_len] * (3 + br.read(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:
            lengths.extend([0] * (11 + br.read(7)))
    if len(lengths) > alphabet_size:
        raise ValueError("VP8L code lengths overflow the alphabet")
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _HuffDecoder(lengths)


def _decode_entropy_coded(
    br: _BitReader,
    w: int,
    h: int,
    *,
    level0: bool,
) -> list[int]:
    """One entropy-coded ARGB image (transforms handled by the caller)."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
    meta = None
    n_groups = 1
    meta_bits = 0
    if level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
        eh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px = _decode_entropy_coded(br, ew, eh, level0=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]
        n_groups = max(meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = (
        _NUM_LITERALS + _NUM_LENGTH_CODES + cache_size,
        256,
        256,
        256,
        _NUM_DISTANCE_CODES,
    )
    groups = [
        tuple(_read_prefix_code(br, a) for a in alphabets)
        for _ in range(n_groups)
    ]
    cache = [0] * cache_size
    shift = 32 - cache_bits if cache_bits else 0

    n = w * h
    pix = [0] * n
    pos = 0
    if meta is not None:
        ew = (w + (1 << meta_bits) - 1) >> meta_bits
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[
                meta[(y >> meta_bits) * ew + (x >> meta_bits)]
            ]
        else:
            g_dec, r_dec, b_dec, a_dec, d_dec = groups[0]
        s = g_dec.decode(br)
        if s < _NUM_LITERALS:
            r = r_dec.decode(br)
            b = b_dec.decode(br)
            a = a_dec.decode(br)
            argb = (a << 24) | (r << 16) | (s << 8) | b
            pix[pos] = argb
            pos += 1
            if cache_bits:
                cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = argb
        elif s < _NUM_LITERALS + _NUM_LENGTH_CODES:
            length = _lz77_prefix_value(s - _NUM_LITERALS, br)
            dist_prefix = _lz77_prefix_value(d_dec.decode(br), br)
            if dist_prefix > 120:
                dist = dist_prefix - 120
            else:
                dx, dy = _DISTANCE_MAP[dist_prefix - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                pos += 1
                if cache_bits:
                    cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> shift] = argb
        else:
            idx = s - _NUM_LITERALS - _NUM_LENGTH_CODES
            if not cache_bits or idx >= cache_size:
                raise ValueError("VP8L cache reference without cache")
            pix[pos] = cache[idx]
            pos += 1
    return pix


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _avg_argb(a: int, b: int) -> int:
    return (
        (_avg2((a >> 24) & 0xFF, (b >> 24) & 0xFF) << 24)
        | (_avg2((a >> 16) & 0xFF, (b >> 16) & 0xFF) << 16)
        | (_avg2((a >> 8) & 0xFF, (b >> 8) & 0xFF) << 8)
        | _avg2(a & 0xFF, b & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(l: int, t: int, tl: int) -> int:
    p_alpha = ((l >> 24) & 0xFF) + ((t >> 24) & 0xFF) - ((tl >> 24) & 0xFF)
    p_red = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_green = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_blue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (
        abs(p_alpha - ((l >> 24) & 0xFF))
        + abs(p_red - ((l >> 16) & 0xFF))
        + abs(p_green - ((l >> 8) & 0xFF))
        + abs(p_blue - (l & 0xFF))
    )
    pt = (
        abs(p_alpha - ((t >> 24) & 0xFF))
        + abs(p_red - ((t >> 16) & 0xFF))
        + abs(p_green - ((t >> 8) & 0xFF))
        + abs(p_blue - (t & 0xFF))
    )
    return l if pl < pt else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(
            ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        ) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        # spec pseudocode divides by 2 with C truncation-toward-zero
        half = d // 2 if d >= 0 else -((-d) // 2)
        out |= _clamp(a + half) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg_argb(_avg_argb(l, tr), t)
    if mode == 6:
        return _avg_argb(l, tl)
    if mode == 7:
        return _avg_argb(l, t)
    if mode == 8:
        return _avg_argb(tl, t)
    if mode == 9:
        return _avg_argb(t, tr)
    if mode == 10:
        return _avg_argb(_avg_argb(l, tl), _avg_argb(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(_avg_argb(l, t), tl)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _add_pixels(base: int, pred: int) -> int:
    return (
        ((((base >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
        | ((((base >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((base >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((base & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inverse_predictor(
    pix: list[int], w: int, h: int, bits: int, timg: list[int]
) -> None:
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]  # left
            elif x == 0:
                pred = pix[i - w]  # top
            else:
                mode = (timg[(y >> bits) * bw + (x >> bits)] >> 8) & 0xFF
                l = pix[i - 1]
                t = pix[i - w]
                tl = pix[i - w - 1]
                tr = pix[i - w + 1] if x + 1 < w else pix[i - w]
                # spec: the top-right of the last column is the leftmost
                # pixel of the same row as t (wraps); libwebp uses the
                # first pixel of the NEXT row's predecessor — i.e. index
                # i - w + 1 == start of current row when x == w-1
                if x + 1 >= w:
                    tr = pix[i - w + 1] if (i - w + 1) < len(pix) else t
                pred = _predict(mode, l, t, tr, tl)
            pix[i] = _add_pixels(pix[i], pred)


def _ct_delta(t: int, c: int) -> int:
    # signed(t) * signed(c) >> 5, per spec (int8 semantics)
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inverse_color_transform(
    pix: list[int], w: int, h: int, bits: int, timg: list[int]
) -> None:
    bw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = timg[(y >> bits) * bw + (x >> bits)]
            g2r = (cte >> 0) & 0xFF  # blue channel of the transform pixel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            argb = pix[i]
            g = (argb >> 8) & 0xFF
            r = (argb >> 16) & 0xFF
            b = argb & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g)) & 0xFF
            b = (b + _ct_delta(r2b, r)) & 0xFF
            pix[i] = (argb & 0xFF000000) | (r << 16) | (g << 8) | b


def _inverse_subtract_green(pix: list[int]) -> None:
    for i, argb in enumerate(pix):
        g = (argb >> 8) & 0xFF
        r = (((argb >> 16) & 0xFF) + g) & 0xFF
        b = ((argb & 0xFF) + g) & 0xFF
        pix[i] = (argb & 0xFF000000) | (r << 16) | (g << 8) | b


def _palette_xbits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inverse_palette(
    pix: list[int], w: int, h: int, palette: list[int], xbits: int
) -> list[int]:
    out = [0] * (w * h)
    packed_w = (w + (1 << xbits) - 1) >> xbits if xbits else w
    per = 1 << xbits
    bits_per = 8 >> xbits
    mask = (1 << bits_per) - 1
    for y in range(h):
        for x in range(w):
            if xbits:
                packed = pix[y * packed_w + (x >> xbits)]
                g = (packed >> 8) & 0xFF
                idx = (g >> ((x % per) * bits_per)) & mask
            else:
                idx = (pix[y * w + x] >> 8) & 0xFF
            out[y * w + x] = palette[idx] if idx < len(palette) else 0
    return out


def decode_vp8l_stream(data: bytes) -> dict:
    """Decode a raw VP8L chunk payload: {width, height, mode, pixels}
    (RGBA row-major)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    from .codecs import MAX_IMAGE_PIXELS

    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"VP8L dimensions {w}x{h} exceed MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS}"
        )
    # transforms (read order; applied inverse in reverse order)
    transforms: list[tuple] = []
    seen = set()
    cur_w = w
    while br.read_bit():
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L transform repeated")
        seen.add(ttype)
        if ttype in (0, 1):  # PREDICTOR / COLOR
            bits = br.read(3) + 2
            bw = (cur_w + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            timg = _decode_entropy_coded(br, bw, bh, level0=False)
            transforms.append((ttype, bits, timg))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append((2,))
        else:  # COLOR_INDEXING
            n_colors = br.read(8) + 1
            raw_pal = _decode_entropy_coded(br, n_colors, 1, level0=False)
            palette = []
            prev = 0
            for p in raw_pal:  # palette entries are delta-coded
                prev = _add_pixels(p, prev)
                palette.append(prev)
            xbits = _palette_xbits(n_colors)
            transforms.append((3, palette, xbits))
            cur_w = (cur_w + (1 << xbits) - 1) >> xbits if xbits else cur_w
    if any(t[0] == 3 for t in transforms) and any(
        t[0] in (0, 1) for t in transforms
    ):
        raise NotImplementedError(
            "VP8L palette combined with predictor/color transform"
        )
    pix = _decode_entropy_coded(br, cur_w, h, level0=True)
    for t in reversed(transforms):
        if t[0] == 0:
            _inverse_predictor(pix, cur_w, h, t[1], t[2])
        elif t[0] == 1:
            _inverse_color_transform(pix, cur_w, h, t[1], t[2])
        elif t[0] == 2:
            _inverse_subtract_green(pix)
        else:
            pix = _inverse_palette(pix, w, h, t[1], t[2])
            cur_w = w
    if cur_w != w:
        raise ValueError("VP8L width bookkeeping mismatch")
    out = bytearray(w * h * 4)
    for i, argb in enumerate(pix):
        out[i * 4] = (argb >> 16) & 0xFF
        out[i * 4 + 1] = (argb >> 8) & 0xFF
        out[i * 4 + 2] = argb & 0xFF
        out[i * 4 + 3] = (argb >> 24) & 0xFF
    return {"width": w, "height": h, "mode": "RGBA", "pixels": bytes(out)}


def decode_webp(payload: bytes) -> dict:
    """RIFF/WEBP container walk -> VP8L (lossless) or VP8 (lossy intra,
    vp8.py — round 5, incl. B_PRED + the normal loop filter) decode.
    Animations stay declared NotImplementedError, never silent."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return decode_vp8l_stream(data)
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_frame, yuv420_to_rgb

            return yuv420_to_rgb(decode_vp8_frame(data))
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L or VP8 chunk")


# ---------------------------------------------------------------------------
# encoder (roundtrip-oracle counterpart)
# ---------------------------------------------------------------------------


def _write_full_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Normal (non-simple) prefix-code header: code-length code + the
    literal length sequence (no 16/17/18 RLE on the write side — short
    runs of zeros are written as explicit 0-length symbols)."""
    bw.write(0, 1)  # not simple
    cl_freq: dict[int, int] = {}
    for l in lengths:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths_full = _huffman_lengths(cl_freq)
    cl_lengths = [0] * 19
    for s, l in enumerate(cl_lengths_full):
        cl_lengths[s] = l
    if max(cl_lengths) > 7:
        raise ValueError("code-length code too deep for 3-bit header")
    # num_code_lengths must cover every used symbol in the spec order
    used = {s for s, l in enumerate(cl_lengths) if l}
    num_cl = max(
        (i + 1 for i, s in enumerate(_CODE_LENGTH_ORDER) if s in used),
        default=4,
    )
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        code, length = cl_codes[l]
        bw.write_code(code, length)


def _write_prefix_code(
    bw: _BitWriter, freqs: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Emit a prefix-code header for ``freqs`` and return the symbol ->
    (code, length) map for payload writing."""
    used = sorted(s for s, f in freqs.items() if f > 0)
    if not used:
        used = [0]  # a code must exist even if never used
    if len(used) <= 2 and max(used) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] > 1:
            bw.write(1, 1)
            bw.write(used[0], 8)
        else:
            bw.write(0, 1)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}
    lengths_full = _huffman_lengths({s: freqs.get(s, 0) for s in used})
    lengths = [0] * alphabet_size
    for s, l in enumerate(lengths_full):
        lengths[s] = l
    _write_full_code(bw, lengths)
    return _canonical_codes(lengths)


def _write_entropy_coded(
    bw: _BitWriter,
    argb: list[int],
    *,
    cache_bits: int = 0,
    use_lz77: bool = False,
    level0: bool,
) -> None:
    """Write one entropy-coded image (the shared tail of the main image,
    transform sub-images and palette rows): color-cache header, meta bit
    (level0 only, always 0 on the write side), the 5 prefix codes and
    the token stream. Crafted decoder tests drive this directly to build
    predictor/color/palette/meta streams the public encoder never emits."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache: list = [None] * cache_size
    shift = 32 - cache_bits if cache_bits else 0
    tokens: list[tuple] = []
    i = 0
    n = len(argb)
    while i < n:
        if use_lz77 and i > 0 and argb[i] == argb[i - 1]:
            run = 1
            while i + run < n and argb[i + run] == argb[i - 1] and run < 4094:
                run += 1
            tokens.append(("copy", run, 1))
            if cache_bits:
                for j in range(i, i + run):
                    cache[((_HASH_MUL * argb[j]) & 0xFFFFFFFF) >> shift] = argb[j]
            i += run
            continue
        if cache_bits:
            idx = ((_HASH_MUL * argb[i]) & 0xFFFFFFFF) >> shift
            if cache[idx] == argb[i]:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = argb[i]
        tokens.append(("lit", argb[i]))
        i += 1

    g_freq: dict[int, int] = {}
    r_freq: dict[int, int] = {}
    b_freq: dict[int, int] = {}
    a_freq: dict[int, int] = {}
    d_freq: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            g_freq[(p >> 8) & 0xFF] = g_freq.get((p >> 8) & 0xFF, 0) + 1
            r_freq[(p >> 16) & 0xFF] = r_freq.get((p >> 16) & 0xFF, 0) + 1
            b_freq[p & 0xFF] = b_freq.get(p & 0xFF, 0) + 1
            a_freq[(p >> 24) & 0xFF] = a_freq.get((p >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            lcode, _, _ = _lz77_prefix_encode(t[1])
            g_freq[256 + lcode] = g_freq.get(256 + lcode, 0) + 1
            dcode, _, _ = _lz77_prefix_encode(t[2] + 120)
            d_freq[dcode] = d_freq.get(dcode, 0) + 1
        else:
            sym = 256 + 24 + t[1]
            g_freq[sym] = g_freq.get(sym, 0) + 1

    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta-prefix
    g_codes = _write_prefix_code(bw, g_freq, 256 + 24 + cache_size)
    r_codes = _write_prefix_code(bw, r_freq, 256)
    b_codes = _write_prefix_code(bw, b_freq, 256)
    a_codes = _write_prefix_code(bw, a_freq, 256)
    d_codes = _write_prefix_code(bw, d_freq, 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            bw.write_code(*g_codes[(p >> 8) & 0xFF])
            bw.write_code(*r_codes[(p >> 16) & 0xFF])
            bw.write_code(*b_codes[p & 0xFF])
            bw.write_code(*a_codes[(p >> 24) & 0xFF])
        elif t[0] == "copy":
            _, length, dist = t
            lcode, lextra, lbits = _lz77_prefix_encode(length)
            bw.write_code(*g_codes[256 + lcode])
            if lbits:
                bw.write(lextra, lbits)
            dcode, dextra, dbits = _lz77_prefix_encode(dist + 120)
            bw.write_code(*d_codes[dcode])
            if dbits:
                bw.write(dextra, dbits)
        else:
            bw.write_code(*g_codes[256 + 24 + t[1]])


def encode_webp_lossless(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGBA",
    *,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_lz77: bool = False,
) -> bytes:
    """Minimal spec-true VP8L encoder for roundtrip tests: literal
    streams with real canonical prefix codes; optional SUBTRACT_GREEN,
    color cache and greedy run-length LZ77 (distance 1 / plain distance
    codes) so the decoder's copy and cache paths get exercised. No
    predictor/palette/meta-prefix on the write side."""
    ch = {"L": 1, "RGB": 3, "RGBA": 4}[mode]
    if len(pixels) != width * height * ch:
        raise ValueError("pixel buffer does not match dimensions")
    argb = []
    for i in range(width * height):
        if mode == "L":
            r = g = b = pixels[i]
            a = 255
        elif mode == "RGB":
            r, g, b = pixels[i * 3 : i * 3 + 3]
            a = 255
        else:
            r, g, b, a = pixels[i * 4 : i * 4 + 4]
        argb.append((a << 24) | (r << 16) | (g << 8) | b)
    if subtract_green:
        argb = [
            (p & 0xFF000000)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | (p & 0xFF00)
            | ((((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF))
            for p in argb
        ]

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if mode == "RGBA" else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    _write_entropy_coded(
        bw, argb, cache_bits=cache_bits, use_lz77=use_lz77, level0=True
    )
    stream = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
