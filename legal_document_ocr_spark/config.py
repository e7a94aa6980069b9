"""Engine configuration — the web-text analogue of the reference's config.json.

Every constant here maps to a reference threshold (cited file:line into
/root/reference/), re-interpreted for HTML main-content extraction:

- region area/aspect filter (config.json:19-21, region_segmentation_service.py:19-27)
  -> block min-chars + link-density band;
- table-detection thresholds (config.json:24-30) -> HTML <table> cell minimums;
- extraction_patterns (config.json:60-106) -> the same Vietnamese legal-document
  field regex battery, first-match-wins (information_extraction_service.py:90-98).

Config is a plain driver-side dict; it is closed over by the pandas-UDF stage
functions (broadcast into UDF closures — the Spark analogue of the reference
loading config.json once per service at app/services/ocr_service.py:28-56).
"""

from __future__ import annotations

# --- block segmentation (analogue of config.json "segmentation", :18-22) ----
# reference: keep contour iff area >= 1000 and 0.1 <= w/h <= 10.0
# webtext:   keep block iff chars >= MIN_BLOCK_CHARS and link_density <= MAX_LINK_DENSITY
MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.35
# headings are kept at a lower char threshold (short but content-bearing)
MIN_HEADING_CHARS = 3

# tags whose subtree is dropped entirely (non-content, analogue of binarization
# dropping background pixels in image_preprocessing_service.py:124-168)
DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "iframe", "object"}
)
# tags marking boilerplate subtrees (nav chrome -> always dropped blocks)
BOILERPLATE_TAGS = frozenset({"nav", "footer", "header", "aside", "form", "button"})
# block-level elements that delimit text blocks (a "region" in the reference,
# region_segmentation_service.py:20-31)
BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "blockquote", "pre",
        "li", "ul", "ol", "td", "th", "tr", "table", "h1", "h2", "h3", "h4",
        "h5", "h6", "figcaption", "summary", "details", "dd", "dt", "dl",
    }
)
HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

# --- table extraction (analogue of config.json "table_detection", :23-31) ---
MIN_TABLE_ROWS = 1
MIN_TABLE_COLS = 1

# --- input validation (validation.py:10-11) ---------------------------------
MAX_HTML_BYTES = 10 * 1024 * 1024  # 10 MB cap, same as reference
ALLOWED_SCHEMES = ("http://", "https://")

# --- merge / sessionization (config.json "document_patterns", :32-58) -------
MIN_MATCHING_WORDS = 2        # document_merger_service.py:46
MIN_FIELD_MATCHES = 2         # document_merger_service.py:57
MATCHING_FIELDS = ("document_type", "issuing_agency", "issue_date")  # :50

# --- field extraction battery (config.json "extraction_patterns", :60-106) --
# Same patterns, same order, first-match-wins; value = group(1) if the pattern
# has groups else group(0) (information_extraction_service.py:93-98).
EXTRACTION_PATTERNS: dict[str, list[str]] = {
    "document_type": [
        r"(?i)(CÔNG\s+VĂN|TỜ\s+TRÌNH|QUYẾT\s+ĐỊNH|THÔNG\s+BÁO)",
        r"(?i)(Số\s*:\s*([\w-]+))",
    ],
    "document_number": [
        r"(?i)Số\s*:\s*([\w-]+)",
        r"(?i)Số\s+([\w-]+)",
    ],
    "issue_date": [
        r"(?i)ngày\s+(\d{1,2})\s+tháng\s+(\d{1,2})\s+năm\s+(\d{4})",
        r"(?i)(\d{1,2})/(\d{1,2})/(\d{4})",
    ],
    "issuing_agency": [
        r"(?i)(CỘNG\s+HÒA\s+XÃ\s+HỘI\s+CHỦ\s+NGHĨA\s+VIỆT\s+NAM.*?\n.*?\n)(.*?)\n",
    ],
    "recipients": [
        r"(?i)Kính\s+gửi:\s*(.*?)\n",
    ],
    "recipient_address": [
        r"(?i)Nơi\s+nhận:\s*\n(.*?)\n\n",
    ],
    "signer": [
        r"(?i)(Người\s+ký|NGƯỜI\s+KÝ):\s*(.*?)\n",
        r"(?i)\n\s*([A-ZĐÀÁẢÃẠĂẰẮẲẴẶÂẦẤẨẪẬÈÉẺẼẸÊỀẾỂỄỆÌÍỈĨỊÒÓỎÕỌÔỒỐỔỖỘƠỜỚỞỠỢÙÚỦŨỤƯỪỨỬỮỰÝỶỸỴ\s]+)\s*\n",
    ],
    "position": [
        r"(?i)(Chức\s+vụ|CHỨC\s+VỤ):\s*(.*?)\n",
        r"(?i)([A-Z][a-zđàáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợùúủũụưừứửữựỳýỷỹỵ\s]+)",
    ],
}

# Literal pre-gates, parallel to EXTRACTION_PATTERNS: each inner list holds
# lowercase literals of which AT LEAST ONE must appear in the lowercased text
# for the pattern to possibly match (an empty list means "always try").
# Purely an evaluation shortcut — a pattern whose mandatory literal is absent
# cannot match, so skipping it never changes the result. This is the same
# literal-prefilter trick production regex engines apply internally; CPython
# re does not, and failing Unicode-IGNORECASE searches dominate the field
# battery on non-matching (non-Vietnamese) documents without it.
# Gate literals must be SINGLE WORDS: the regexes allow \s+ (incl. \r\n
# across merged blocks) between words, so a multi-word literal like
# "công văn" would gate out a document whose type spans a line break even
# though the regex matches it.
PATTERN_GATES: dict[str, list[list[str]]] = {
    "document_type": [
        ["công", "tờ", "quyết", "thông"],
        ["số"],
    ],
    "document_number": [["số"], ["số"]],
    "issue_date": [["ngày"], ["/"]],
    "issuing_agency": [["cộng"]],
    "recipients": [["kính"]],
    "recipient_address": [["nơi"]],
    "signer": [["ký"], ["\n"]],
    "position": [["chức"], []],
}

FIELD_NAMES = (
    "document_type",
    "document_number",
    "issue_location",
    "issue_date",
    "issuing_agency",
    "recipients",
    "recipient_address",
    "signer",
    "position",
    "subject",
)

# --- config-shape validation (P2, validation.py:58-91) ----------------------


def validate_config() -> None:
    """Driver-side config assert (the rebuild of the reference's
    validate_config at app/utils/validation.py:58-91): every field has a
    non-empty pattern list, every gate list is parallel to its pattern list,
    gate literals are lowercase single entries, and thresholds are sane.
    Runs once at session build (session.build_session) — a broken config
    fails the job BEFORE any executor work, like the reference fails the
    request at the validator."""
    for field, patterns in EXTRACTION_PATTERNS.items():
        if not patterns:
            raise ValueError(f"extraction_patterns[{field!r}] is empty")
        gates = PATTERN_GATES.get(field)
        if gates is not None and len(gates) != len(patterns):
            raise ValueError(
                f"pattern_gates[{field!r}] has {len(gates)} entries for "
                f"{len(patterns)} patterns"
            )
        for gate in gates or []:
            for lit in gate:
                if lit != lit.lower():
                    raise ValueError(
                        f"gate literal {lit!r} for {field!r} must be lowercase"
                    )
    unknown = set(EXTRACTION_PATTERNS) - set(FIELD_NAMES)
    if unknown:
        raise ValueError(f"patterns for unknown fields: {sorted(unknown)}")
    if not (0 < MIN_BLOCK_CHARS and 0 <= MAX_LINK_DENSITY <= 1):
        raise ValueError("segmentation thresholds out of range")
    if MAX_HTML_BYTES <= 0 or SALT_BUCKETS <= 0 or ARROW_MAX_RECORDS <= 0:
        raise ValueError("scale knobs must be positive")


# --- scale knobs (SURVEY.md §2.11) ------------------------------------------
SALT_BUCKETS = 16                     # salt modulus for skew-busting repartition
SIZE_BUCKET_EDGES = (1_000, 10_000, 100_000, 1_000_000)  # html-size buckets
ARROW_MAX_RECORDS = 2_000             # bounded Arrow batches for multi-MB html
