"""Pure-stdlib baseline JPEG codec (DCT, Huffman, zigzag — no PIL/cv2).

Round 2 left JPEG as the one declared decode stub; a web corpus is mostly
JPEG, so the image-bytes→features path dead-ended on the dominant format.
This module closes that with a REAL baseline (SOF0) decoder:

- markers: SOI/APPn/COM/DQT (8+16-bit)/DHT/SOF0/DRI/SOS/RSTn/EOI
- entropy: canonical Huffman DC+AC, byte unstuffing (FF 00), restart
  intervals resetting DC predictors + bit alignment
- block path: dequantize → un-zigzag → float IDCT → level shift → clamp
- color: grayscale (1 comp) and YCbCr (3 comps) with arbitrary 1-2x
  sampling factors (4:4:4, 4:2:2, 4:2:0) via box upsampling, JFIF
  YCbCr→RGB
- hardening mirrors decode_png: truncated segments, missing tables and
  decompression-bomb dimensions raise ValueError before large allocation;
  arithmetic coding / 12-bit / hierarchical raise NotImplementedError
- progressive (SOF2) since round 4: multi-scan coefficient accumulation
  with spectral selection AND successive approximation (DC/AC first +
  refinement passes, EOB runs), then one dequant+IDCT pass at the end —
  see _ProgressiveStore.

The encoder exists for the roundtrip oracle: baseline, quantization all
ones, standard Annex-K Huffman tables, grayscale or 4:4:4 YCbCr. With
quant=1, an image whose every 8x8 block is CONSTANT survives
encode→decode BYTE-EXACTLY (constant block ⇒ DC-only ⇒ the float FDCT/IDCT
pair is exact: DC = 8·(v-128) and IDCT(DC)/8 = v-128 in binary floats), so
the registry query's DuckDB oracle can state the decoded pixels in closed
form — same strategy as the PNG roundtrip oracle, adapted to a lossy codec.

Reference analogue: PIL's JpegImagePlugin inside the reference's
image_preprocessing_service.py:57-122 — same contract, stdlib engine.
"""

from __future__ import annotations

import math
import struct

# shared with codecs.decode_png — one bound for all image decoders
from .codecs import MAX_IMAGE_PIXELS

# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# JPEG spec Annex K.3 typical Huffman tables (public standard constants)
_DC_LUM_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_LUM_VALS = tuple(range(12))
_AC_LUM_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
_AC_LUM_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


def _build_codes(bits, vals):
    """BITS/HUFFVAL -> {value: (code, length)} (canonical, spec C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, vals):
    """BITS/HUFFVAL -> {(length, code): value} for MSB-first decoding."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# encoder (baseline, quant=1, for the roundtrip oracle)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _fdct_block(samples):
    """Float FDCT of one 8x8 level-shifted block (row-major list of 64)."""
    s0 = samples[0]
    if all(s == s0 for s in samples):
        # constant block: DC = 8*s0 exactly, AC = 0 — same values the
        # generic loop rounds to (unit-tested), at O(64) instead of O(64^2)
        out = [0.0] * 64
        out[0] = 8.0 * s0
        return out
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                cy = _COS[y][u]
                base = y * 8
                for x in range(8):
                    s += samples[base + x] * cy * _COS[x][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _magnitude(v: int):
    """(category, code-bits) per spec F.1.2.1 — negative values use the
    one's-complement convention."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_baseline(
    width: int, height: int, pixels: bytes, color: bool = False
) -> bytes:
    """Minimal baseline JPEG: quantization all ones, Annex-K luma Huffman
    tables for every component, no subsampling. ``pixels`` is row-major
    grayscale (1 B/px) or RGB (3 B/px) when ``color``.

    With quant=1 the only loss is FDCT coefficient rounding; images whose
    8x8 blocks are constant (and for color additionally R=G=B, so the
    YCbCr transform is exact) roundtrip byte-exactly — the oracle shape.
    """
    ncomp = 3 if color else 1
    if len(pixels) != width * height * ncomp:
        raise ValueError("pixel buffer does not match dimensions")

    # component planes, level-shifted later; color -> JFIF YCbCr (rounded)
    if color:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            ys.append(min(255, max(0, round(y))))
            cbs.append(min(255, max(0, round(cb))))
            crs.append(min(255, max(0, round(cr))))
        planes = [ys, cbs, crs]
    else:
        planes = [list(pixels)]

    dc_codes = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, b"\x00" + bytes([1] * 64))  # DQT id0, all ones
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])  # h=v=1, quant table 0
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        b"\x00" + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS),
    )
    out += seg(
        0xC4,
        b"\x10" + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    bw = _BitWriter()
    bw_x = (width + 7) // 8
    bw_y = (height + 7) // 8
    preds = [0] * ncomp
    for by in range(bw_y):
        for bx in range(bw_x):
            for c in range(ncomp):
                plane = planes[c]
                block = []
                for y in range(8):
                    sy = min(by * 8 + y, height - 1)  # edge replication
                    for x in range(8):
                        sx = min(bx * 8 + x, width - 1)
                        block.append(plane[sy * width + sx] - 128)
                coeffs = _fdct_block(block)
                q = [int(round(v)) for v in coeffs]
                zz = [q[ZIGZAG[i]] for i in range(64)]
                # DC
                diff = zz[0] - preds[c]
                preds[c] = zz[0]
                cat, bits = _magnitude(diff)
                code, ln = dc_codes[cat]
                bw.write(code, ln)
                if cat:
                    bw.write(bits, cat)
                # AC
                run = 0
                for i in range(1, 64):
                    if zz[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    cat, bits = _magnitude(zz[i])
                    code, ln = ac_codes[(run << 4) | cat]
                    bw.write(code, ln)
                    bw.write(bits, cat)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF-unstuffing.

    Stops at any non-stuffing marker; ``sync_restart`` consumes an RSTn.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # marker byte hit during fill, if any

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return True
            self.marker = nxt  # real marker: stop before it
            return False
        self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self, n: int) -> None:
        """Discard bits to the next byte boundary and consume RSTn."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward for the marker (spec: it is byte-aligned next)
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker != 0xD0 + (n & 7):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2
        self.marker = None


def _extend(v: int, cat: int) -> int:
    """Spec F.2.2.1 EXTEND: map received bits to signed value."""
    if cat == 0:
        return 0
    if v < (1 << (cat - 1)):
        return v - (1 << cat) + 1
    return v


def _idct_block(coeffs):
    """Float IDCT of one dequantized 8x8 block -> 64 level-shifted samples."""
    if not any(coeffs[1:]):
        # DC-only block (flat regions dominate real images): constant
        # DC/8 — identical to the generic loop after rounding (unit-tested)
        return [coeffs[0] / 8.0] * 64
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = _C[u] * _COS[y][u]
                base = u * 8
                for v in range(8):
                    c = coeffs[base + v]
                    if c:
                        s += cu * _C[v] * _COS[x][v] * c
            out[y * 8 + x] = 0.25 * s
    return out


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline (SOF0) JPEG: {width, height, mode, pixels}.

    mode 'L' for 1 component, 'RGB' for 3 (JFIF YCbCr, box-upsampled
    chroma). Baseline (SOF0/SOF1) decodes in one scan; progressive (SOF2)
    accumulates coefficients across scans (spectral selection +
    successive approximation) and finishes with one IDCT pass. Raises
    ValueError on malformed/truncated input and NotImplementedError for
    arithmetic/12-bit/4-component/hierarchical.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    prog_store = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = payload[pos + 1] if pos + 1 < len(payload) else None
        if marker is None:
            raise ValueError("truncated JPEG")
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(payload):
            raise ValueError("truncated JPEG segment length")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        data = payload[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            d = 0
            while d < len(data):
                pq, tq = data[d] >> 4, data[d] & 0xF
                d += 1
                n = 64 * (2 if pq else 1)
                if d + n > len(data):
                    raise ValueError("truncated DQT")
                if pq:
                    tbl = list(struct.unpack(f">{64}H", data[d : d + n]))
                else:
                    tbl = list(data[d : d + n])
                qt[tq] = tbl
                d += n
        elif marker == 0xC4:  # DHT
            d = 0
            while d < len(data):
                tc, th = data[d] >> 4, data[d] & 0xF
                bits = list(data[d + 1 : d + 17])
                nv = sum(bits)
                vals = list(data[d + 17 : d + 17 + nv])
                if len(vals) < nv:
                    raise ValueError("truncated DHT")
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                d += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise NotImplementedError("only 1- or 3-component JPEG")
            if w <= 0 or h <= 0:
                raise ValueError("invalid JPEG dimensions")
            if w * h > MAX_IMAGE_PIXELS:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed "
                    f"MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS}"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = data[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
                if not (1 <= comps[-1]["h"] <= 2 and 1 <= comps[-1]["v"] <= 2):
                    raise NotImplementedError("sampling factors beyond 2 unsupported")
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = data[0]
            scan = []
            for c in range(ns):
                cs, tda = data[1 + c * 2 : 3 + c * 2]
                comp = next(
                    (cc for cc in frame["comps"] if cc["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append({"comp": comp, "td": tda >> 4, "ta": tda & 0xF})
            if not frame.get("progressive"):
                return _decode_scan(
                    payload, pos, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            if len(data) < 1 + ns * 2 + 3:
                raise ValueError("truncated JPEG SOS header")
            ss, se, ahl = data[1 + ns * 2 : 4 + ns * 2]
            if prog_store is None:
                prog_store = _ProgressiveStore(frame)
            pos = prog_store.decode_scan(
                payload, pos, scan, huff_dc, huff_ac, restart_interval,
                ss, se, ahl >> 4, ahl & 0xF,
            )
    if prog_store is not None:
        return prog_store.finish(qt)
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, ri):
    w, h = frame["w"], frame["h"]
    comps = [s["comp"] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * c["h"] * 8, mcuy * c["v"] * 8
        planes.append(bytearray(pw * ph))
    for s in scan:
        if s["td"] not in huff_dc or s["ta"] not in huff_ac:
            raise ValueError("JPEG scan references missing Huffman table")
        if s["comp"]["tq"] not in qt:
            raise ValueError("JPEG component references missing quant table")
    br = _BitReader(payload, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu_count and mcu_count % ri == 0:
                br.sync_restart(mcu_count // ri - 1)
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, s in enumerate(scan):
                c = s["comp"]
                dctab, actab = huff_dc[s["td"]], huff_ac[s["ta"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = [0] * 64
                        cat = br.decode_huffman(dctab)
                        diff = _extend(br.receive(cat), cat)
                        preds[ci] += diff
                        zz[0] = preds[ci] * q[0]
                        i = 1
                        while i < 64:
                            rs = br.decode_huffman(actab)
                            r, sz = rs >> 4, rs & 0xF
                            if sz == 0:
                                if r == 15:
                                    i += 16
                                    continue
                                break  # EOB
                            i += r
                            if i > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[i] = _extend(br.receive(sz), sz) * q[i]
                            i += 1
                        coeffs = [0] * 64
                        for k in range(64):
                            coeffs[ZIGZAG[k]] = zz[k]
                        samples = _idct_block(coeffs)
                        plane = planes[ci]
                        pw = mcux * c["h"] * 8
                        oy = (my * c["v"] + by) * 8
                        ox = (mx * c["h"] + bx) * 8
                        for y in range(8):
                            row = (oy + y) * pw + ox
                            for x in range(8):
                                v = int(round(samples[y * 8 + x])) + 128
                                plane[row + x] = 0 if v < 0 else (
                                    255 if v > 255 else v
                                )
    return _assemble_image(w, h, comps, planes, mcux, hmax, vmax)


def _assemble_image(w, h, comps, planes, mcux, hmax, vmax):
    """Crop/upsample decoded component planes into the output image
    (shared by the baseline single-scan path and the progressive
    finalizer)."""
    if len(comps) == 1:
        c = comps[0]
        pw = mcux * c["h"] * 8
        out = bytearray(w * h)
        for y in range(h):
            out[y * w : (y + 1) * w] = planes[0][y * pw : y * pw + w]
        return {"width": w, "height": h, "mode": "L", "pixels": bytes(out)}
    # YCbCr -> RGB with box upsampling per component
    out = bytearray(w * h * 3)
    pws = [mcux * c["h"] * 8 for c in comps]
    for y in range(h):
        for x in range(w):
            vals = []
            for ci, c in enumerate(comps):
                sy = y * c["v"] // vmax
                sx = x * c["h"] // hmax
                vals.append(planes[ci][sy * pws[ci] + sx])
            yy, cb, cr = vals
            r = yy + 1.402 * (cr - 128)
            g = yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
            b = yy + 1.772 * (cb - 128)
            o = (y * w + x) * 3
            out[o] = 0 if r < 0 else (255 if r > 255 else int(round(r)))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(round(g)))
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else int(round(b)))
    return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# progressive (SOF2) decoding — round 4
# ---------------------------------------------------------------------------


class _ProgressiveStore:
    """Coefficient accumulator for progressive JPEG: each scan deposits
    DC/AC bits into per-block zigzag-order coefficient arrays; ``finish``
    dequantizes and runs the shared IDCT/assembly path once. Implements
    spectral selection and successive approximation per ITU-T T.81 G.2
    (the decode side mirrors libjpeg's decode_mcu_{DC,AC}_{first,refine}
    control flow, re-derived from the published spec)."""

    def __init__(self, frame):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcux = (frame["w"] + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (frame["h"] + 8 * self.vmax - 1) // (8 * self.vmax)
        # per component: padded (MCU-aligned) block grid, zigzag coeffs
        self.blocks = {}
        self.bw_pad = {}
        self.bw_ni = {}
        self.bh_ni = {}
        for c in comps:
            bw_pad = self.mcux * c["h"]
            bh_pad = self.mcuy * c["v"]
            self.bw_pad[c["id"]] = bw_pad
            cw = (frame["w"] * c["h"] + self.hmax - 1) // self.hmax
            chh = (frame["h"] * c["v"] + self.vmax - 1) // self.vmax
            self.bw_ni[c["id"]] = (cw + 7) // 8
            self.bh_ni[c["id"]] = (chh + 7) // 8
            self.blocks[c["id"]] = [
                [0] * 64 for _ in range(bw_pad * bh_pad)
            ]
        self.eobrun = 0

    def decode_scan(
        self, payload, pos, scan, huff_dc, huff_ac, ri, ss, se, ah, al
    ):
        """Consume one scan's entropy data; return the byte offset of the
        next marker's 0xFF."""
        if ss == 0 and se != 0:
            raise ValueError("JPEG progressive scan mixes DC and AC")
        if ss > se or se > 63:
            raise ValueError("invalid JPEG spectral selection")
        if ss > 0 and len(scan) != 1:
            raise ValueError("JPEG progressive AC scan must be single-component")
        for s in scan:
            if ss == 0 and ah == 0 and s["td"] not in huff_dc:
                raise ValueError("JPEG scan references missing DC table")
            if ss > 0 and s["ta"] not in huff_ac:
                raise ValueError("JPEG scan references missing AC table")
        br = _BitReader(payload, pos)
        self.eobrun = 0
        preds = [0] * len(scan)
        if len(scan) > 1:  # interleaved: DC scans only
            units = self.mcux * self.mcuy
            unit_blocks = None
        else:
            c = scan[0]["comp"]
            if ss == 0:
                # non-interleaved DC scan covers the component's own grid
                units = self.bw_ni[c["id"]] * self.bh_ni[c["id"]]
            else:
                units = self.bw_ni[c["id"]] * self.bh_ni[c["id"]]
        count = 0
        for unit in range(units):
            if ri and count and count % ri == 0:
                br.sync_restart(count // ri - 1)
                preds = [0] * len(scan)
                self.eobrun = 0
            count += 1
            if len(scan) > 1:
                my, mx = divmod(unit, self.mcux)
                for ci, s in enumerate(scan):
                    c = s["comp"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = self.blocks[c["id"]][
                                (my * c["v"] + by) * self.bw_pad[c["id"]]
                                + mx * c["h"] + bx
                            ]
                            preds[ci] = self._dc_unit(
                                br, blk, huff_dc.get(s["td"]),
                                preds[ci], ah, al,
                            )
            else:
                s = scan[0]
                c = s["comp"]
                by, bx = divmod(unit, self.bw_ni[c["id"]])
                blk = self.blocks[c["id"]][by * self.bw_pad[c["id"]] + bx]
                if ss == 0:
                    preds[0] = self._dc_unit(
                        br, blk, huff_dc.get(s["td"]), preds[0], ah, al
                    )
                elif ah == 0:
                    self._ac_first(br, blk, huff_ac[s["ta"]], ss, se, al)
                else:
                    self._ac_refine(br, blk, huff_ac[s["ta"]], ss, se, al)
        # locate the next marker (skip any trailing entropy bytes/RSTs)
        p = br.pos
        while p + 1 < len(payload):
            if payload[p] == 0xFF and payload[p + 1] not in (0x00,):
                if 0xD0 <= payload[p + 1] <= 0xD7:
                    p += 2
                    continue
                return p
            p += 1
        return len(payload)

    def _dc_unit(self, br, blk, dctab, pred, ah, al):
        if ah == 0:
            if dctab is None:
                raise ValueError("JPEG scan references missing DC table")
            cat = br.decode_huffman(dctab)
            pred += _extend(br.receive(cat), cat)
            blk[0] = pred << al
        else:
            if br.read_bit():
                blk[0] |= 1 << al
        return pred

    def _ac_first(self, br, blk, actab, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = br.decode_huffman(actab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r < 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += br.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC index overflow")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1

    def _ac_refine(self, br, blk, actab, ss, se, al):
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = br.decode_huffman(actab)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        # NB: unlike the first-pass EOB, the refinement
                        # EOB run INCLUDES the current block — its
                        # remaining nonzero-history coefficients still
                        # receive correction bits in the tail loop below
                        # (spec G. the eobrun is decremented there)
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += br.receive(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("invalid JPEG AC refinement size")
                    val = p1 if br.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        if br.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if self.eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            self.eobrun -= 1

    def finish(self, qt):
        frame = self.frame
        comps = frame["comps"]
        planes = []
        for c in comps:
            if c["tq"] not in qt:
                raise ValueError("JPEG component references missing quant table")
            q = qt[c["tq"]]
            bw_pad = self.bw_pad[c["id"]]
            pw = bw_pad * 8
            plane = bytearray(pw * self.mcuy * c["v"] * 8)
            for bi, zz in enumerate(self.blocks[c["id"]]):
                coeffs = [0] * 64
                for k in range(64):
                    if zz[k]:
                        coeffs[ZIGZAG[k]] = zz[k] * q[k]
                samples = _idct_block(coeffs)
                by, bx = divmod(bi, bw_pad)
                oy, ox = by * 8, bx * 8
                for y in range(8):
                    row = (oy + y) * pw + ox
                    for x in range(8):
                        v = int(round(samples[y * 8 + x])) + 128
                        plane[row + x] = 0 if v < 0 else (255 if v > 255 else v)
            planes.append(plane)
        return _assemble_image(
            frame["w"], frame["h"], comps, planes, self.mcux,
            self.hmax, self.vmax,
        )


def encode_jpeg_progressive(
    width: int, height: int, pixels: bytes, color: bool = False
) -> bytes:
    """Progressive (SOF2) counterpart of ``encode_jpeg_baseline`` for the
    roundtrip oracle: identical quant=1 coefficients, emitted as a
    spectral-selection scan script — one interleaved DC scan (Ss=Se=0)
    followed by one full AC scan per component (Ss=1, Se=63, Ah=Al=0).
    With Ah=Al=0 the first-pass AC entropy coding coincides with baseline
    AC coding, so the same block-constant-image exactness argument holds;
    successive-approximation DECODE paths are covered by crafted scans in
    tests (the encoder does not emit them)."""
    ncomp = 3 if color else 1
    if len(pixels) != width * height * ncomp:
        raise ValueError("pixel buffer does not match dimensions")
    if color:
        ys, cbs, crs = [], [], []
        for i in range(0, len(pixels), 3):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
            cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
            ys.append(min(255, max(0, round(y))))
            cbs.append(min(255, max(0, round(cb))))
            crs.append(min(255, max(0, round(cr))))
        planes = [ys, cbs, crs]
    else:
        planes = [list(pixels)]

    bw_x = (width + 7) // 8
    bw_y = (height + 7) // 8
    # per component, per block (raster order): zigzag-order coefficients
    zz_blocks: list[list[list[int]]] = [[] for _ in range(ncomp)]
    for by in range(bw_y):
        for bx in range(bw_x):
            for c in range(ncomp):
                plane = planes[c]
                block = []
                for y in range(8):
                    sy = min(by * 8 + y, height - 1)
                    for x in range(8):
                        sx = min(bx * 8 + x, width - 1)
                        block.append(plane[sy * width + sx] - 128)
                coeffs = _fdct_block(block)
                q = [int(round(v)) for v in coeffs]
                zz_blocks[c].append([q[ZIGZAG[i]] for i in range(64)])

    dc_codes = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, b"\x00" + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS))

    # scan 1: interleaved DC, Ss=Se=0, Ah=Al=0
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 0, 0])
    out += seg(0xDA, sos)
    w1 = _BitWriter()
    preds = [0] * ncomp
    for bi in range(bw_x * bw_y):
        for c in range(ncomp):
            dc = zz_blocks[c][bi][0]
            diff = dc - preds[c]
            preds[c] = dc
            cat, bits = _magnitude(diff)
            code, ln = dc_codes[cat]
            w1.write(code, ln)
            if cat:
                w1.write(bits, cat)
    w1.flush()
    out += w1.out

    # scans 2..: one full AC scan per component (Ss=1, Se=63)
    for c in range(ncomp):
        out += seg(0xDA, bytes([1, c + 1, 0x00, 1, 63, 0]))
        wc = _BitWriter()
        for zz in zz_blocks[c]:
            run = 0
            for i in range(1, 64):
                if zz[i] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    wc.write(code, ln)
                    run -= 16
                cat, bits = _magnitude(zz[i])
                code, ln = ac_codes[(run << 4) | cat]
                wc.write(code, ln)
                wc.write(bits, cat)
                run = 0
            if run:
                code, ln = ac_codes[0x00]  # EOB (eobrun = 1)
                wc.write(code, ln)
        wc.flush()
        out += wc.out
    out += b"\xff\xd9"
    return bytes(out)
