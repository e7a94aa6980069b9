"""F9 fixture family (FIXTURES.md §3): one case per extraction pattern in
each field's pattern list, plus near-miss negatives — pins first-match-wins
order and the exact group semantics of the reference battery
(config.json:60-106, information_extraction_service.py:24-59,90-98)."""

from __future__ import annotations

import pytest

from legal_document_ocr_spark.kernels import extract_fields

# (case id, input text, field, expected value or None)
CASES = [
    # document_type p1: keyword alternation, group(1)
    ("type-p1", "QUYẾT ĐỊNH\r\nvề abc", "document_type", "QUYẾT ĐỊNH"),
    ("type-p1-ci", "quyết định ban hành", "document_type", "quyết định"),
    # document_type p2 fires only when no keyword: Số-prefixed fallback
    ("type-p2", "Số: 15/QD\r\nnội dung", "document_type", "Số: 15"),
    ("type-miss", "một văn bản thường", "document_type", None),
    # document_number p1 (colon) beats p2 (space) — first-match-wins
    ("num-p1", "Số: 123/ABC-XYZ", "document_number", "123"),
    ("num-p2", "Số 456-DEF nội dung", "document_number", "456-DEF"),
    ("num-order", "Số 9 rồi Số: 8", "document_number", "8"),
    ("num-miss", "không có so hieu", "document_number", None),
    # issue_date p1 (ngày…tháng…năm) overridden by the location+date pass
    ("date-p1", "Hà Nội, ngày 5 tháng 3 năm 2024", "issue_date", "5/3/2024"),
    # p2 numeric d/m/yyyy: group(1) = day only (reference group semantics)
    ("date-p2", "ban hành 15/10/2023 tại đây", "issue_date", "15"),
    ("date-miss", "ngày không rõ tháng năm nào", "issue_date", None),
    # issue_location only via the combined location+date regex
    ("loc", "TP Hồ Chí Minh, ngày 1 tháng 1 năm 2025", "issue_location", "TP Hồ Chí Minh"),
    ("loc-miss", "ngày 1 tháng 1 năm 2025", "issue_location", None),
    # recipients
    ("recip", "Kính gửi: Các đơn vị trực thuộc\r\nphần sau", "recipients", "Các đơn vị trực thuộc"),
    ("recip-nearmiss", "Kinh gui: thiếu dấu\r\nx", "recipients", None),
    # subject override: v/v … up to blank line or end
    ("subj-vv", "V/v tổ chức hội nghị", "subject", "tổ chức hội nghị"),
    ("subj-vev", "Về việc điều chỉnh kế hoạch", "subject", "điều chỉnh kế hoạch"),
    # signer p1 (Người ký:) beats p2 (uppercase line). Reference quirk
    # (information_extraction_service.py:93-98): value = group(1), and this
    # two-group pattern's group(1) is the LABEL alternation, not the name —
    # faithfully reproduced.
    ("signer-p1", "Người ký: Trần Văn B\r\nhết", "signer", "Người ký"),
    (
        "signer-p2",
        "Kết thúc: 5\r\nNGUYỄN VĂN AN\r\nĐịa chỉ: 7",
        "signer",
        "NGUYỄN VĂN AN",
    ),
    # position p1 — same group(1)-is-the-label reference quirk as signer
    ("pos-p1", "Chức vụ: Thứ trưởng\r\nx", "position", "Chức vụ"),
]


@pytest.mark.parametrize("case_id,text,field,expected", CASES, ids=[c[0] for c in CASES])
def test_field_pattern(case_id, text, field, expected):
    assert extract_fields(text)[field] == expected


def test_first_match_wins_order_is_pattern_list_order():
    # both document_number patterns match; the list order (colon first) wins
    # even though the space form appears earlier in the text
    info = extract_fields("Số 111 trước nhưng Số: 222 sau")
    assert info["document_number"] == "222"


def test_gates_do_not_change_results():
    """The literal pre-gates are an evaluation shortcut only: forcing every
    pattern to run (gates emptied) must give identical output."""
    from legal_document_ocr_spark import kernels

    texts = [c[1] for c in CASES] + ["plain english text with no markers at all"]
    expected = [extract_fields(t) for t in texts]
    original = kernels._COMPILED_PATTERNS
    try:
        kernels._COMPILED_PATTERNS = {
            f: [(pat, []) for pat, _ in pats] for f, pats in original.items()
        }
        ungated = [extract_fields(t) for t in texts]
    finally:
        kernels._COMPILED_PATTERNS = original
    assert ungated == expected
