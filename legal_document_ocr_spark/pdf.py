"""Minimal PDF text layer — pure-stdlib encoder + layout-aware parser.

The north rule (BASELINE.json) names "PDF/layout parse … PDF layout-block
segmentation (reading-order sort of bounding boxes)" as part of the
extraction surface. Reference analogue: the reference converts PDFs to
page images via pdf2image and then OCRs them
(/root/reference/app/services/image_preprocessing_service.py:57-122); a
web corpus carries PDFs whose TEXT LAYER is directly extractable, so the
Spark-first rebuild parses content streams instead of rasterizing.

Scope — PDF 1.4 with UNCOMPRESSED content streams, one text run per
``BT … Tj … ET`` block, WinAnsi/ASCII literal strings. That covers the
synthesized corpus this repo tests against end-to-end; real-world PDFs
add Flate-compressed streams (zlib.decompress — wired where the stream
dict says /FlateDecode), CMaps and font subsetting, which need a real
font stack and are out of scope the same way WebP is for codecs.py.

The parser's layout model mirrors the reference's region segmentation
(region_segmentation_service.py:20-31 groups word boxes into regions by
vertical proximity, then reading-order sorts): text runs sort top-down
then left-right, and consecutive lines whose vertical gap is at most
``line_gap`` merge into one block — the classic text-density block
builder, done per document inside an Arrow batch (no per-row Python at
the DataFrame layer; see operators/multimodal.pdf_extract).
"""

from __future__ import annotations

import re
import zlib

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)"}
_UNESC = {b"\\\\": b"\\", b"\\(": b"(", b"\\)": b")"}


def _esc(text: str) -> str:
    return text.translate(_ESC)


def encode_simple_pdf(runs: list[tuple[float, float, str]]) -> bytes:
    """One-page PDF 1.4 with one uncompressed content stream; ``runs`` are
    (x, y, text) in FILE order — callers scramble that order to prove the
    parser reorders by coordinates, not by stream position. The xref table
    carries real byte offsets, so external readers open the file too."""
    content = "".join(
        f"BT /F1 12 Tf {x:g} {y:g} Td ({_esc(t)}) Tj ET\n" for x, y, t in runs
    ).encode("latin-1", "replace")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_DICT_RE = re.compile(rb"<<(.*?)>>\s*stream", re.S)
_RUN_RE = re.compile(
    rb"BT\s+/F\d+\s+[\d.]+\s+Tf\s+(-?[\d.]+)\s+(-?[\d.]+)\s+Td\s+"
    rb"\(((?:[^()\\]|\\.)*)\)\s*Tj\s+ET"
)


def _unescape(raw: bytes) -> str:
    return re.sub(
        rb"\\[\\()]", lambda m: _UNESC[m.group(0)], raw
    ).decode("latin-1")


def parse_pdf_runs(payload: bytes) -> list[tuple[float, float, str]]:
    """All (x, y, text) runs across every content stream, file order.
    Raises ValueError on a non-PDF or truncated payload (callers isolate
    per record); /FlateDecode streams are inflated before the scan."""
    if not payload.startswith(b"%PDF"):
        raise ValueError("not a PDF: missing %PDF header")
    if b"%%EOF" not in payload:
        raise ValueError("truncated PDF: missing %%EOF")
    runs: list[tuple[float, float, str]] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(payload, pos)
        if m is None:
            break
        data = m.group(1)
        dm = _DICT_RE.search(payload, pos, m.start() + len(b"stream") + 2)
        if dm is not None and b"/FlateDecode" in dm.group(1):
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}") from e
        for rm in _RUN_RE.finditer(data):
            runs.append(
                (float(rm.group(1)), float(rm.group(2)), _unescape(rm.group(3)))
            )
        pos = m.end()
    return runs


def layout_blocks(
    runs: list[tuple[float, float, str]], line_gap: float = 18.0
) -> list[dict]:
    """Reading-order layout segmentation: sort runs top-down then
    left-to-right (PDF y grows UP, so top-down = y descending), merge
    consecutive lines whose vertical gap is <= ``line_gap`` into one
    block — the region grouping of the reference's segmentation service,
    on text-layer coordinates instead of word bounding boxes."""
    ordered = sorted(runs, key=lambda r: (-r[1], r[0]))
    blocks: list[dict] = []
    for x, y, text in ordered:
        if blocks and blocks[-1]["y_bottom"] - y <= line_gap:
            b = blocks[-1]
            b["lines"].append(text)
            b["y_bottom"] = y
            b["x"] = min(b["x"], x)
        else:
            blocks.append({"x": x, "y_top": y, "y_bottom": y, "lines": [text]})
    for i, b in enumerate(blocks):
        b["block_idx"] = i
        b["text"] = " ".join(b["lines"])
    return blocks


def extract_pdf_text(payload: bytes, line_gap: float = 18.0) -> dict:
    """(n_runs, n_blocks, text) for one PDF — blocks in reading order,
    joined with single spaces after whitespace normalization."""
    runs = parse_pdf_runs(payload)
    blocks = layout_blocks(runs, line_gap)
    text = re.sub(r"\s+", " ", " ".join(b["text"] for b in blocks)).strip()
    return {"n_runs": len(runs), "n_blocks": len(blocks), "text": text}
