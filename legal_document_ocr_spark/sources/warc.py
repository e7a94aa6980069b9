"""WARC-shaped record synthesis and parsing — the Common-Crawl input format.

The pages source (pages.py) hands the pipeline a clean (url, ts, html)
table; real crawls arrive as WARC: a header block of ``Name: value`` lines,
a blank line, then the payload. This module closes that gap Spark-first:

- ``synthesize_warc_df`` derives one WARC *response-record string* per
  document from the same deterministic template corpus (pure Catalyst
  concat — no UDF), so the parser has a by-construction oracle;
- ``parse_warc_records`` recovers (url, warc_ts, content_length, payload)
  from the record text with regexp/substring expressions only — no Python,
  no shuffle; the parse runs at scan speed and the extraction pipeline's
  contract (pages.PAGES_SCHEMA) is reachable with one further select.

Header extraction is anchored to line starts (``(?m)`` multiline) so a
payload containing ``WARC-Target-URI:`` text cannot spoof a header — the
payload begins after the FIRST blank line, and headers are only read from
the text before it.

SCOPE — text payloads only: ``parse_warc_records`` operates on a STRING
record column and recovers the payload by character offsets, so it handles
the text-payload records this pipeline extracts from (HTML pages). Real
Common-Crawl WARC files are byte-framed — Content-Length counts OCTETS and
payloads may be binary (images, gzip members) that do not survive a UTF-8
string round-trip. Binary records must go through
``parse_warc_records_binary`` (octet-offset parse over a ``binary``
column), which shares the header grammar but never decodes the payload.

Reference analogue: the upload path's multipart parsing + content-type
dispatch (app/api/v1/endpoints/documents.py:16-26 → ocr_service.py:66-103)
— same job, crawl-archive framing instead of HTTP multipart.
"""

from __future__ import annotations

import gzip as _gzip
import zlib as _zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = "\r\n"


def synthesize_warc_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One WARC response record per document: (record_id, record) with
    record = headers + blank line + html payload, all deterministic."""
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    html_txt = F.decode(F.col("html"), "UTF-8")
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(F.col("html")).cast("string"),  # bytes (html is binary)
        F.lit(_CRLF + _CRLF),
        html_txt,
    )
    return pages.select(
        F.xxhash64("url").alias("record_id"), record.alias("record")
    )


# header regexes: multiline-anchored, value = rest of line (no CR)
_URI_RE = r"(?m)^WARC-Target-URI: ([^\r\n]*)$"
_DATE_RE = r"(?m)^WARC-Date: ([^\r\n]*)$"
_LEN_RE = r"(?m)^Content-Length: ([^\r\n]*)$"


def parse_warc_records(records: DataFrame, record_col: str = "record") -> DataFrame:
    """Parse WARC record strings back to (url, warc_ts, content_length,
    payload) with pure expressions. The payload is everything after the
    first blank line; headers are read ONLY from the text before it."""
    rec = F.col(record_col)
    head = F.substring_index(rec, _CRLF + _CRLF, 1)
    # pure Column form (no SQL interpolation of the column name): payload
    # starts right after head + the 4-byte separator; length clamps
    payload = rec.substr(F.length(head) + F.lit(5), F.length(rec))
    return records.select(
        F.regexp_extract(head, _URI_RE, 1).alias("url"),
        F.to_timestamp(
            F.regexp_extract(head, _DATE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.regexp_extract(head, _LEN_RE, 1).cast("long").alias("content_length"),
        payload.alias("payload"),
    )


def synthesize_warc_binary_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-framed WARC response record per document, as BINARY.

    Same header grammar as ``synthesize_warc_df`` but Content-Length counts
    OCTETS of a payload that is deliberately NOT valid UTF-8: two raw bytes
    0x00 0xFF are prepended to the UTF-8 html. Any parser that routes the
    payload through a UTF-8 string round-trip corrupts it — which is exactly
    the honesty check ``parse_warc_records_binary`` must pass.
    """
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    payload = F.concat(F.lit(bytes([0x00, 0xFF])), F.col("html"))
    head = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),  # octets: F.length on binary
        F.lit(_CRLF + _CRLF),
    )
    return pages.select(
        F.xxhash64("url").alias("record_id"),
        F.concat(F.encode(head, "UTF-8"), payload).alias("record_bytes"),
    )


def parse_warc_records_binary(
    records: DataFrame, record_col: str = "record_bytes"
) -> DataFrame:
    """Byte-framed WARC parse over a BINARY record column — octet offsets,
    payload returned as binary, never decoded.

    Spark has no substring/locate over binary, so the record is viewed
    through ISO-8859-1 — the one charset whose byte<->char mapping is a
    BIJECTION over all 256 values. Character offsets in the latin-1 view ARE
    octet offsets, Content-Length (octets) slices exactly, and
    ``encode(·, 'ISO-8859-1')`` restores the original bytes losslessly.
    Headers are ASCII by the WARC spec, so the same multiline-anchored
    regexes apply; everything stays whole-stage-codegen expressions — no
    Python, no shuffle, scan speed.
    """
    rec = F.decode(F.col(record_col), "ISO-8859-1")
    head = F.substring_index(rec, _CRLF + _CRLF, 1)
    clen = F.regexp_extract(head, _LEN_RE, 1).cast("long")
    # byte-framed: slice exactly Content-Length octets after the separator
    payload = rec.substr(F.length(head) + F.lit(5), clen)
    return records.select(
        F.regexp_extract(head, _URI_RE, 1).alias("url"),
        F.to_timestamp(
            F.regexp_extract(head, _DATE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        clen.alias("content_length"),
        F.encode(payload, "ISO-8859-1").alias("payload"),
    )


def parse_warc_records_binary_keyed(
    records: DataFrame,
    record_col: str = "record_bytes",
    keep: tuple[str, ...] = ("warc_file", "member_idx"),
) -> DataFrame:
    """``parse_warc_records_binary`` with passthrough key columns — the
    shape the .warc.gz member walk needs (which file, which member, plus
    the parsed record). Same latin-1 octet-bijection grammar."""
    rec = F.decode(F.col(record_col), "ISO-8859-1")
    head = F.substring_index(rec, _CRLF + _CRLF, 1)
    clen = F.regexp_extract(head, _LEN_RE, 1).cast("long")
    payload = rec.substr(F.length(head) + F.lit(5), clen)
    return records.select(
        *[F.col(c) for c in keep],
        F.regexp_extract(head, _URI_RE, 1).alias("url"),
        F.to_timestamp(
            F.regexp_extract(head, _DATE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        clen.alias("content_length"),
        F.encode(payload, "ISO-8859-1").alias("payload"),
    )


def synthesize_warc_files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-framed records WITH file assignment — (warc_file, record_idx,
    record_bytes), the shape a CDX build consumes. One WARC file per corpus
    host (a few hundred records each at test scale — the same records-per-
    file ratio as a real ~1 GB crawl segment), record order within a file =
    doc_id, recovered deterministically from the url tail so the DuckDB
    oracle can state the identical grouping.
    """
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    payload = F.concat(F.lit(bytes([0x00, 0xFF])), F.col("html"))
    head = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),
        F.lit(_CRLF + _CRLF),
    )
    host = F.regexp_extract("url", r"^https://([^/]*)/", 1)
    doc_id = F.element_at(F.split("url", "/"), -1).cast("long")
    return pages.select(
        F.concat(host, F.lit(".warc")).alias("warc_file"),
        doc_id.alias("record_idx"),
        F.concat(F.encode(head, "UTF-8"), payload).alias("record_bytes"),
    )


def cdx_index(
    records: DataFrame,
    file_col: str = "warc_file",
    order_col: str = "record_idx",
    record_col: str = "record_bytes",
) -> DataFrame:
    """CDX(J)-style capture index over byte-framed WARC records:
    (warc_file, url, ts_epoch, offset, length, digest) — offset/length are
    the OCTET range of the record inside its file, digest is sha256 over
    the payload octets. This is the random-access index Common Crawl ships
    next to every crawl (cc-index): given a url, seek straight to its
    record without scanning the archive.

    Offsets are a running sum of record lengths WITHIN each file: one
    window partitioned by ``file_col`` — files process in parallel across
    the cluster and the per-file sequential walk is bounded by records-per-
    file (~50-100k for a 1 GB WARC), never by corpus size, so the shape
    holds at 10^12 records spread over ~10^7 files. No global ordering, no
    driver-side state; header fields come from the same latin-1
    octet-bijection view as ``parse_warc_records_binary`` (pure codegen).
    The digest hashes the lowercase hex of the payload (DuckDB's sha256
    takes VARCHAR, not BLOB — hex is the portable spelling).
    """
    from pyspark.sql.window import Window

    length = F.octet_length(F.col(record_col))
    w = (
        Window.partitionBy(file_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = F.decode(F.col(record_col), "ISO-8859-1")
    head = F.substring_index(rec, _CRLF + _CRLF, 1)
    clen = F.regexp_extract(head, _LEN_RE, 1).cast("long")
    payload = rec.substr(F.length(head) + F.lit(5), clen)
    return records.select(
        F.col(file_col).alias("warc_file"),
        F.regexp_extract(head, _URI_RE, 1).alias("url"),
        F.unix_timestamp(
            F.to_timestamp(
                F.regexp_extract(head, _DATE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            )
        ).alias("ts_epoch"),
        F.coalesce(F.sum(length).over(w), F.lit(0)).cast("long").alias("rec_offset"),
        length.cast("long").alias("length"),
        F.sha2(F.lower(F.hex(F.encode(payload, "ISO-8859-1"))), 256).alias("digest"),
    )


def revisit_dedup(captures: DataFrame) -> DataFrame:
    """Revisit-record elimination over a capture index — the storage dedup
    Common Crawl applies across snapshots: the FIRST capture of each payload
    digest stays a full ``response`` record; every later capture of the same
    digest becomes a ``revisit`` record pointing at the original's
    (warc_file, offset), so the archive stores each distinct payload once.

    Input: (url, ts_epoch, warc_file, rec_offset, digest) rows
    (``cdx_index`` output, typically unioned across snapshots).

    Determinism: "first" = minimum of the string encoding
    lpad(ts,12) TAB url TAB warc_file TAB lpad(offset,12) — lexicographic
    order equals (ts, url, file, offset) order because the padded numeric
    fields are fixed-width and urls cannot contain TAB; both engines state
    the identical min(varchar) (a struct min would pit Spark struct
    comparison against an engine-specific SQL row comparison).

    Scale shape: one map-side-combined groupBy(digest) argmin — NO window
    (a boilerplate-identical payload can have millions of captures; a
    per-digest window would put them in one task, the argmin partial-
    aggregates) — then one shuffle_hash join back on the digest key both
    sides already exchanged on. Nothing broadcasts: the firsts table is
    distinct-payload-sized (corpus-scale).

    Output: input columns + (kind, orig_file, orig_offset); orig_* are NULL
    on response rows.
    """
    tab = F.lit("\t")
    enc = F.concat(
        F.lpad(F.col("ts_epoch").cast("string"), 12, "0"), tab,
        F.col("url"), tab,
        F.col("warc_file"), tab,
        F.lpad(F.col("rec_offset").cast("string"), 12, "0"),
    )
    rows = captures.select(
        "url", "ts_epoch", "warc_file", "rec_offset", "digest", enc.alias("_enc")
    )
    firsts = rows.groupBy("digest").agg(F.min("_enc").alias("_first"))
    out = rows.join(firsts.hint("shuffle_hash"), "digest")
    is_first = F.col("_enc") == F.col("_first")
    return out.select(
        "url",
        "ts_epoch",
        "warc_file",
        "rec_offset",
        "digest",
        F.when(is_first, F.lit("response")).otherwise(F.lit("revisit")).alias(
            "kind"
        ),
        F.when(~is_first, F.split(F.col("_first"), "\t").getItem(2)).alias(
            "orig_file"
        ),
        F.when(
            ~is_first, F.split(F.col("_first"), "\t").getItem(3).cast("long")
        ).alias("orig_offset"),
    )


def wet_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "extracted_text",
) -> DataFrame:
    """Serialize extraction output as WARC *conversion* ("WET") records —
    the Common-Crawl ecosystem's extracted-text interchange format and the
    natural SINK of the flagship pipeline (parse_warc_records is its
    source-side mirror). One codegen concat per row at scan speed: headers
    (Target-URI, Date, sha256 Block-Digest, Content-Type text/plain,
    Content-Length in OCTETS of the UTF-8 payload) + blank line + text.

    Content-Length counts bytes, not characters — multibyte text diverges,
    and downstream octet-offset readers (cdx_index) depend on it.

    Output: (url, record). Reference analogue: the per-document result
    serialization in document_service.py:48-50, recast as the CC archive
    format.
    """
    url, ts = F.col(url_col), F.col(ts_col)
    text = F.col(text_col)
    payload_bytes = F.encode(text, "UTF-8")
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("WARC-Block-Digest: sha256:"), F.sha2(payload_bytes, 256),
        F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.length(payload_bytes).cast("string"),
        F.lit(_CRLF + _CRLF),
        text,
    )
    return df.select(url.alias("url"), record.alias("record"))


def synthesize_warc_http_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC response records whose payload is a FULL HTTP/1.1 response
    (status line + headers + body) — the real Common-Crawl layering, which
    synthesize_warc_df simplifies away. Deterministic variation: every
    19th doc is a 404, every 5th omits the charset parameter."""
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    status = F.when(doc_id % 19 == 0, F.lit("404 Not Found")).otherwise(
        F.lit("200 OK")
    )
    ctype = F.when(doc_id % 5 == 0, F.lit("text/html")).otherwise(
        F.lit("text/html; charset=utf-8")
    )
    html_txt = F.decode(F.col("html"), "UTF-8")
    http = F.concat(
        F.lit("HTTP/1.1 "), status, F.lit(_CRLF),
        F.lit("Content-Type: "), ctype, F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(F.col("html")).cast("string"),
        F.lit(_CRLF + _CRLF),
        html_txt,
    )
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(http, "UTF-8")).cast("string"),
        F.lit(_CRLF + _CRLF),
        http,
    )
    return pages.select(
        F.xxhash64("url").alias("record_id"), record.alias("record")
    )


_HTTP_STATUS_RE = r"^HTTP/1\.[01] (\d{3})"
_HTTP_CTYPE_RE = r"(?mi)^Content-Type:\s*([^\r\n;]+)"
_HTTP_CHARSET_RE = r"(?mi)^Content-Type:[^\r\n]*;\s*charset=([^\r\n;\s]+)"


def parse_http_response(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Split an HTTP/1.1 response payload into (status_code, content_type,
    charset, body) — the second parse layer of a real Common-Crawl
    response record (parse_warc_records handles the WARC envelope; this
    handles the HTTP message inside it). Pure codegen expressions: status
    from the anchored first line, headers from line-anchored
    case-insensitive regexps over the head only (a body cannot spoof
    headers), body = everything after the first blank line. Absent
    charset comes back NULL — the caller's decode-fallback chain
    (kernels.decode_html) owns that policy.
    """
    p = F.col(payload_col)
    head = F.substring_index(p, _CRLF + _CRLF, 1)
    body = p.substr(F.length(head) + F.lit(5), F.length(p))
    charset = F.regexp_extract(head, _HTTP_CHARSET_RE, 1)
    return df.withColumns(
        {
            "status_code": F.regexp_extract(head, _HTTP_STATUS_RE, 1).cast(
                "int"
            ),
            "content_type": F.regexp_extract(head, _HTTP_CTYPE_RE, 1),
            "charset": F.when(charset != "", F.lower(charset)),
            "body": body,
        }
    ).drop(payload_col)


_XROBOTS_RE = r"(?mi)^X-Robots-Tag:\s*([^\r\n]+)"
_UNAVAIL_RE = r"(?i)unavailable_after:\s*(?:[a-z]{3},\s*)?([^,\r\n]+)"


def _http_date_epoch(raw: Column) -> Column:
    """RFC-822-ish HTTP date string -> epoch seconds (long), NULL on
    malformed. Strips the optional weekday prefix and the zone suffix
    (GMT/UT/offset) then ``try_to_timestamp`` — never a task failure.
    Month names parse case-sensitively (Java MMM), so callers pass the
    UNlowercased text."""
    date = F.regexp_replace(
        F.trim(raw),
        r"(?i)^[a-z]{3},\s*|\s*(gmt|ut|[+-]\d{4})\s*$",
        "",
    )
    return F.try_to_timestamp(
        F.when(date != "", date), F.lit("dd MMM yyyy HH:mm:ss")
    ).cast("long")


def parse_x_robots(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """``X-Robots-Tag`` response-header compliance -> adds (noindex,
    nofollow, unavailable_after) to each HTTP record: the header-side
    counterpart of ``urls.meta_robots`` (markup) and the robots.txt
    battery (crawl side) — together the full publisher-opt-out surface a
    curation pipeline must honor. A noindex header drops the page from
    the corpus even when the markup is silent; ``unavailable_after``
    gives the drop an expiry epoch for recrawl scheduling.

    Only the HTTP head is scanned (``substring_index`` to the first blank
    line) so a body echoing the header text cannot spoof it. Multiple
    ``X-Robots-Tag`` lines combine (union of directives, per Google's
    documented semantics); matching is token-anchored so 'nonoindexing'
    cannot false-positive; ``none`` implies both flags. The
    ``unavailable_after`` value parses through the RFC-822 weekday/zone
    strip + ``try_to_timestamp`` (NULL on malformed, never a task
    failure). Dates parse with or without the RFC-822 weekday/zone;
    UA-scoped headers read as plain directives. All whole-stage codegen,
    no UDF, no shuffle.
    """
    head = F.substring_index(F.col(payload_col), _CRLF + _CRLF, 1)
    combined_raw = F.array_join(
        F.regexp_extract_all(head, F.lit(_XROBOTS_RE), 1), ","
    )
    combined = F.lower(combined_raw)
    tok = lambda d: combined.rlike(  # noqa: E731
        rf"(^|[,:\s]){d}($|[,\s])"
    )
    # date from the UNlowercased text (Java MMM parse is case-sensitive);
    # the optional weekday is consumed inside _UNAVAIL_RE (its comma
    # would otherwise end the capture — directive lists split on commas).
    raw_date = F.regexp_extract(combined_raw, _UNAVAIL_RE, 1)
    return df.withColumns(
        {
            "noindex": (tok("noindex") | tok("none")).cast("int"),
            "nofollow": (tok("nofollow") | tok("none")).cast("int"),
            "unavailable_after": _http_date_epoch(raw_date),
        }
    )


_CC_LINE_RE = r"(?mi)^Cache-Control:\s*([^\r\n]+)"
_MAXAGE_RE = r"(?i)(^|[,\s])max-age\s*=\s*(\d+)"
_EXPIRES_RE = r"(?mi)^Expires:\s*([^\r\n]+)"
_HTTP_DATE_HDR_RE = r"(?mi)^Date:\s*([^\r\n]+)"  # HTTP Date:, NOT WARC-Date
_ETAG_RE = r"(?mi)^ETag:"
_LASTMOD_RE = r"(?mi)^Last-Modified:"
_CLEN_RE = r"(?mi)^Content-Length:\s*(\d+)"


def parse_cache_policy(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """HTTP caching headers -> a recrawl-freshness policy per capture:
    adds (max_age, no_cache, no_store, is_private, has_etag,
    has_last_modified, date_epoch, expires_epoch, ttl_sec, fresh_until).
    The crawl-scheduling counterpart of ``urls.recrawl_priority`` —
    that operator estimates change rate from observed hash flips; this
    one reads what the PUBLISHER declares (RFC 9111 semantics), and a
    scheduler takes the min of the two signals.

    TTL precedence per RFC 9111 §4.2: ``no-store``/``no-cache`` force 0;
    else ``max-age`` (seconds) wins over ``Expires``; else
    ``Expires - Date`` when both parse (clamped at 0, per stale-on-
    arrival); else NULL (heuristic freshness is the caller's policy).
    ``fresh_until`` = Date + ttl when both are known. Multiple
    Cache-Control lines combine (union, like X-Robots-Tag); directive
    matching is token-anchored so ``s-maxage=`` can never feed
    ``max_age`` and ``no-cache-xyz`` never flags. Only the HTTP head is
    scanned — a body echoing header text cannot spoof policy. All
    whole-stage codegen, no UDF, no shuffle.
    """
    head = F.substring_index(F.col(payload_col), _CRLF + _CRLF, 1)
    cc = F.lower(
        F.array_join(F.regexp_extract_all(head, F.lit(_CC_LINE_RE), 1), ",")
    )
    tok = lambda d: cc.rlike(rf"(^|[,\s]){d}($|[,\s])")  # noqa: E731
    max_age_s = F.regexp_extract(cc, _MAXAGE_RE, 2)
    max_age = F.when(max_age_s != "", max_age_s.cast("long"))
    date_epoch = _http_date_epoch(
        F.regexp_extract(head, _HTTP_DATE_HDR_RE, 1)
    )
    expires_epoch = _http_date_epoch(F.regexp_extract(head, _EXPIRES_RE, 1))
    no_cache = tok("no-cache") | tok("no-store")
    # NOTE: greatest() ignores NULLs in Spark, so the Expires branch is
    # gated on both dates parsing — absent freshness info stays NULL.
    ttl = (
        F.when(no_cache, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .when(
            expires_epoch.isNotNull() & date_epoch.isNotNull(),
            F.greatest(expires_epoch - date_epoch, F.lit(0).cast("long")),
        )
    )
    return df.withColumns(
        {
            "max_age": max_age,
            "no_cache": tok("no-cache").cast("int"),
            "no_store": tok("no-store").cast("int"),
            "is_private": tok("private").cast("int"),
            "has_etag": head.rlike(_ETAG_RE).cast("int"),
            "has_last_modified": head.rlike(_LASTMOD_RE).cast("int"),
            "date_epoch": date_epoch,
            "expires_epoch": expires_epoch,
            "ttl_sec": ttl,
            "fresh_until": date_epoch + ttl,
        }
    )


def detect_truncation(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Declared-vs-delivered length audit per HTTP capture: adds
    (content_length, body_bytes, delta_bytes, truncated). A crawler that
    hits its per-response byte cap, a dropped connection, or a server
    lying about Content-Length all yield bodies whose octet count
    disagrees with the declared length — truncated captures poison
    extraction (mid-tag cuts) and dedup (prefix collisions), so a
    curation pipeline flags them BEFORE the parse stage.

    ``body_bytes`` counts octets, not codepoints: on the binary path the
    payload string is the latin-1 bijection of the raw bytes (see
    parse_warc_records_binary), where char count == octet count by
    construction. ``delta_bytes`` = declared - delivered, so a positive
    delta is truncation and a negative one is over-delivery (keep-alive
    bleed — a framing bug worth surfacing too). No Content-Length header
    -> NULLs (unknown is not truncated). Head-only header scan, all
    codegen, no shuffle.
    """
    p = F.col(payload_col)
    head = F.substring_index(p, _CRLF + _CRLF, 1)
    cl_s = F.regexp_extract(head, _CLEN_RE, 1)
    cl = F.when(cl_s != "", cl_s.cast("long"))
    # body = everything after the first CRLFCRLF (absent -> empty body)
    body_bytes = F.when(
        F.length(p) > F.length(head),
        F.length(p) - F.length(head) - F.lit(4),
    ).otherwise(F.lit(0)).cast("long")
    delta = cl - body_bytes
    return df.withColumns(
        {
            "content_length": cl,
            "body_bytes": body_bytes,
            "delta_bytes": delta,
            "truncated": (delta > 0).cast("int"),
        }
    )


def wat_records(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Serialize page metadata as WARC *metadata* ("WAT") records — the
    third leg of the Common-Crawl record-format triple (warc=capture,
    wet=extracted text via ``wet_records``, wat=metadata): one
    application/json record per page carrying title, link count and
    payload octet length, the inputs link-graph and census consumers read
    WITHOUT touching page bytes.

    The JSON body is built by explicit concat (never a to_json call —
    key order and spacing must be byte-stable for the Content-Length and
    any downstream digest, and the closed form makes it restatable in
    SQL). Title/link extraction is the regexp lite-parse at scan speed;
    html is read once and dropped — the emitted record is metadata-sized.

    Output: (url, record).
    """
    url, ts = F.col(url_col), F.col(ts_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    title = F.regexp_extract(html_txt, r"<title>([^<]*)</title>", 1)
    n_links = F.size(F.regexp_extract_all(html_txt, F.lit("(<a\\s)"), 1))
    payload = F.concat(
        F.lit('{"url":"'), url,
        F.lit('","content_length":'),
        F.length(F.col(html_col)).cast("string"),
        F.lit(',"title":"'), title,
        F.lit('","n_links":'), n_links.cast("string"),
        F.lit("}"),
    )
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: metadata" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(_CRLF),
        F.lit("Content-Type: application/json" + _CRLF),
        F.lit("Content-Length: "),
        F.length(F.encode(payload, "UTF-8")).cast("string"),
        F.lit(_CRLF + _CRLF),
        payload,
    )
    return df.select(url.alias("url"), record.alias("record"))


def reassemble_segments(
    segments: DataFrame,
    *,
    origin_col: str = "origin_id",
    seg_col: str = "segment_number",
    payload_col: str = "payload",
    total_col: str = "segment_total_length",
) -> DataFrame:
    """Reassemble WARC continuation records (ISO 28500 §6.10-6.12: a
    response too large for one warcinfo block ships as record 1 +
    ``continuation`` records sharing WARC-Segment-Origin-ID, ordered by
    WARC-Segment-Number, with WARC-Segment-Total-Length on the LAST) —
    the remaining corner of the WARC spec after the plain / binary /
    HTTP-in-WARC / WET / WAT / CDX surfaces.

    Completeness check rides along: a reassembly is ``complete`` iff the
    segment numbers are exactly 1..n (no gap, no dup) and the declared
    total length (max over the group — only one segment carries it)
    equals the concatenated length. Incomplete groups are EMITTED with
    complete=0, never dropped — a crawl's tail always has orphans, and
    silently losing them is how corpora drift.

    Scale shape: ONE groupBy(origin) whose state is the segments of a
    single logical record (bounded by the segment count, never
    corpus-wide); ordering happens INSIDE the group via array_sort over
    (seg, payload) structs — no window, no shuffle beyond the one
    group exchange. Payload concat is a JVM-side fold.

    Output: (origin_id, n_segments, declared_total, assembled, complete).
    """
    g = (
        segments.select(
            F.col(origin_col).alias("origin_id"),
            F.struct(
                F.col(seg_col).cast("long").alias("seg"),
                F.col(payload_col).alias("p"),
            ).alias("sp"),
            F.col(total_col).cast("long").alias("tot"),
        )
        .groupBy("origin_id")
        .agg(
            F.count("*").cast("long").alias("n_segments"),
            F.array_sort(F.collect_list("sp")).alias("sps"),
            F.max("tot").alias("declared_total"),
        )
    )
    assembled = F.aggregate(
        F.col("sps"), F.lit(""), lambda acc, x: F.concat(acc, x["p"])
    )
    segs_ok = F.aggregate(
        F.zip_with(
            F.transform(F.col("sps"), lambda x: x["seg"]),
            F.sequence(F.lit(1).cast("long"), F.col("n_segments")),
            lambda a, b: (a == b).cast("int"),
        ),
        F.lit(1),
        lambda acc, x: (acc.cast("boolean") & x.cast("boolean")).cast("int"),
    )
    return g.select(
        "origin_id",
        "n_segments",
        F.coalesce("declared_total", F.lit(-1)).alias("declared_total"),
        assembled.alias("assembled"),
        (
            segs_ok.cast("boolean")
            & (F.length(assembled) == F.col("declared_total"))
        )
        .cast("int")
        .cast("long")
        .alias("complete"),
    )


# ---------------------------------------------------------------------------
# gzip-member framing (.warc.gz) and HTTP transfer/content codings — the
# byte-level layers a real Common-Crawl reader crosses BEFORE any of the
# parsers above: each WARC record is an independent gzip MEMBER and the
# archive file is their concatenation (ISO 28500 annex; this is what makes
# CDX offset+length random access work — seek to the member, inflate one
# record); inside the HTTP payload, Transfer-Encoding: chunked and
# Content-Encoding: gzip must be removed before the body is the document.
# Reference analogue: the upload path accepting compressed files and
# normalizing them before OCR (app/services/ocr_service.py:66-103) — same
# job, archive/protocol codings instead of upload formats.
# ---------------------------------------------------------------------------

_GZ_SPLIT_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("member_idx", LongType()),
        StructField("gz_offset", LongType()),
        StructField("gz_length", LongType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)

_GZ_CHUNK = 1 << 20  # feed size for the incremental member walk


def _coding_error_label(e: Exception) -> str:
    """Stable per-record error flag (multimodal._decode_error_label twin):
    one corrupt member/chunk flags its own row, never fails the task."""
    msg = str(e).splitlines()[0] if str(e) else ""
    return f"{type(e).__name__}: {msg}"[:200]


def gzip_member_compress(df: DataFrame, payload_col: str = "record_bytes") -> DataFrame:
    """Compress each record as an independent gzip member (mapInPandas,
    stdlib zlib — deterministic: fixed level, mtime pinned to 0 so the
    10-byte header is byte-stable across runs and executors). Adds ``gz``
    (binary) next to the input columns it keeps (warc_file, record_idx)."""
    sel = df.select("warc_file", "record_idx", payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "warc_file": pdf["warc_file"],
                    "record_idx": pdf["record_idx"],
                    "gz": [
                        _gzip.compress(bytes(b), compresslevel=6, mtime=0)
                        for b in pdf[payload_col]
                    ],
                }
            )

    schema = StructType(
        [
            StructField("warc_file", StringType()),
            StructField("record_idx", LongType()),
            StructField("gz", BinaryType()),
        ]
    )
    return sel.mapInPandas(kernel, schema)


def synthesize_warc_gz_files_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenated-gzip-member WARC files — the actual ``.warc.gz`` layout:
    (warc_file, n_members, blob) with blob = member(record 1) || member(
    record 2) || ... in record_idx order, one file per corpus host.

    The per-file concat happens through the latin-1 octet<->char bijection
    (array_sort over (idx, member) structs, then ONE array_join — linear,
    never a quadratic binary fold). Per-file state is bounded by
    records-per-file exactly like cdx_index; files assemble in parallel.
    """
    gz = gzip_member_compress(synthesize_warc_files_df(spark, sf_dir))
    parts = gz.select(
        "warc_file",
        F.struct(
            F.col("record_idx").alias("i"),
            F.decode(F.col("gz"), "ISO-8859-1").alias("m"),
        ).alias("im"),
    )
    g = parts.groupBy("warc_file").agg(
        F.count("*").cast("long").alias("n_members"),
        F.array_sort(F.collect_list("im")).alias("ims"),
    )
    blob = F.encode(
        F.array_join(F.transform(F.col("ims"), lambda x: x["m"]), ""),
        "ISO-8859-1",
    )
    return g.select(
        F.concat(F.col("warc_file"), F.lit(".gz")).alias("warc_file"),
        "n_members",
        blob.alias("blob"),
    )


def split_gz_members(
    files: DataFrame, file_col: str = "warc_file", blob_col: str = "blob"
) -> DataFrame:
    """Split a concatenated-gzip-member archive blob back into records:
    (warc_file, member_idx, gz_offset, gz_length, payload, error) — the
    reader half of the ``.warc.gz`` contract and the producer of the
    offset/length pairs a CDX random-access index stores.

    The walk is INCREMENTAL (1 MiB feeds into zlib.decompressobj(wbits=31)
    until member EOF) so the per-member cost is linear in member size —
    ``unused_data`` backtrack is bounded by one feed, never the file tail,
    and a 1 GB archive never materializes twice. Files split in parallel
    across the cluster; within a file the walk is inherently sequential
    (members are self-delimiting only through inflation — exactly why
    real crawls keep files ~1 GB and ship CDX offsets alongside).

    A corrupt member emits its OWN error row (offset of the failure, NULL
    payload) and ends that file's walk — without the next member's offset
    there is nothing to resynchronize on; the emitted rows before it stay
    good.
    """
    sel = files.select(file_col, blob_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "warc_file": [],
                "member_idx": [],
                "gz_offset": [],
                "gz_length": [],
                "payload": [],
                "error": [],
            }

            def emit(wf, idx, off, ln, payload, err) -> None:
                out["warc_file"].append(wf)
                out["member_idx"].append(idx)
                out["gz_offset"].append(off)
                out["gz_length"].append(ln)
                out["payload"].append(payload)
                out["error"].append(err)

            for wf, blob in zip(pdf[file_col], pdf[blob_col]):
                if blob is None:
                    continue
                mv = memoryview(bytes(blob))
                n = len(mv)
                pos = 0
                idx = 0
                while pos < n:
                    d = _zlib.decompressobj(wbits=31)
                    body = bytearray()
                    p = pos
                    try:
                        while not d.eof and p < n:
                            feed = mv[p : p + _GZ_CHUNK]
                            body += d.decompress(feed)
                            p += len(feed)
                        if not d.eof:
                            raise _zlib.error("truncated gzip member")
                    except _zlib.error as e:
                        emit(wf, idx, pos, None, None, _coding_error_label(e))
                        break
                    consumed = (p - pos) - len(d.unused_data)
                    emit(wf, idx, pos, consumed, bytes(body), None)
                    pos += consumed
                    idx += 1
            yield pd.DataFrame(out)

    return sel.mapInPandas(kernel, _GZ_SPLIT_SCHEMA)


def synthesize_warc_chunked_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP/1.1 responses with ``Transfer-Encoding: chunked`` bodies —
    (url, http_bytes): status line + headers + chunked html. Pure Catalyst:
    per-doc chunk size s = 64 + (doc_id % 5)*37 octets, sizes written as
    lowercase hex, data sliced through the latin-1 octet bijection (chunk
    sizes count OCTETS — a codepoint slice would misframe multibyte text),
    last-chunk ``0 CRLF`` followed by a trailer header on every 3rd doc
    (RFC 9112 §7.1 allows trailers; a decoder that stops at ``0\\r\\n``
    silently eats them).
    """
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    lat = F.decode(F.col("html"), "ISO-8859-1")
    n = F.length(lat)
    s = F.lit(64).cast("long") + (doc_id % 5) * F.lit(37).cast("long")
    n_chunks = F.ceil(n / s).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            F.lower(F.hex(F.least(s, n - i.cast("long") * s))),
            F.lit(_CRLF),
            lat.substr((i.cast("long") * s + 1).cast("int"), s.cast("int")),
            F.lit(_CRLF),
        ),
    )
    trailer = F.when(
        doc_id % 3 == 0,
        F.concat(F.lit("X-Corpus-Doc: "), doc_id.cast("string"), F.lit(_CRLF)),
    ).otherwise(F.lit(""))
    body = F.concat(
        F.array_join(chunks, ""), F.lit("0" + _CRLF), trailer, F.lit(_CRLF)
    )
    http = F.concat(
        F.lit("HTTP/1.1 200 OK" + _CRLF),
        F.lit("Content-Type: text/html; charset=utf-8" + _CRLF),
        F.lit("Transfer-Encoding: chunked" + _CRLF + _CRLF),
        body,
    )
    return pages.select(
        F.col("url"), F.encode(http, "ISO-8859-1").alias("http_bytes")
    )


_DECHUNK_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("body", BinaryType()),
        StructField("n_chunks", LongType()),
        StructField("trailer", StringType()),
        StructField("error", StringType()),
    ]
)


def _dechunk_one(buf: bytes) -> tuple[bytes, int, str | None]:
    """RFC 9112 §7.1 chunked-body decode: (data, n_chunks, trailer-or-None).
    Raises ValueError on any framing violation (caller isolates per row).
    Sizes are self-describing, so data containing CRLF or hex-digit lines
    can never confuse the walk — the reason a regex/split decoder is wrong.
    """
    pos, n_chunks = 0, 0
    out = bytearray()
    while True:
        i = buf.find(b"\r\n", pos)
        if i < 0:
            raise ValueError("missing chunk-size line")
        size_token = buf[pos:i].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            raise ValueError(f"bad chunk size {size_token!r}") from None
        pos = i + 2
        if size == 0:
            trailers = []
            while True:
                j = buf.find(b"\r\n", pos)
                if j < 0:
                    raise ValueError("unterminated trailer section")
                line = bytes(buf[pos:j])
                pos = j + 2
                if line == b"":
                    break
                trailers.append(line)
            if pos != len(buf):
                raise ValueError("bytes after last-chunk")
            trailer = b"\r\n".join(trailers).decode("ISO-8859-1")
            return bytes(out), n_chunks, trailer or None
        if pos + size + 2 > len(buf):
            raise ValueError("truncated chunk data")
        out += buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 2] != b"\r\n":
            raise ValueError("missing chunk-data CRLF")
        pos += 2
        n_chunks += 1


def dechunk_http_body(
    df: DataFrame, url_col: str = "url", payload_col: str = "body_bytes"
) -> DataFrame:
    """Remove ``Transfer-Encoding: chunked`` framing from HTTP bodies:
    (url, body, n_chunks, trailer, error). One Arrow-batched mapInPandas —
    the framing is self-describing byte-at-a-time state (hex size line ->
    skip exactly that many octets -> CRLF -> repeat), which no codegen
    expression can express for unbounded chunk counts; the Python walk is
    linear per record and batch-amortized. Malformed framing (bad hex,
    truncated chunk, missing CRLF, garbage after last-chunk) error-flags
    its own row — a crawl's tail always has torn captures.
    """
    sel = df.select(F.col(url_col).alias("url"), F.col(payload_col))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "url": [],
                "body": [],
                "n_chunks": [],
                "trailer": [],
                "error": [],
            }
            for url, payload in zip(pdf["url"], pdf[payload_col]):
                out["url"].append(url)
                if payload is None:
                    out["body"].append(None)
                    out["n_chunks"].append(None)
                    out["trailer"].append(None)
                    out["error"].append("ValueError: null body")
                    continue
                try:
                    body, n_chunks, trailer = _dechunk_one(bytes(payload))
                except ValueError as e:
                    out["body"].append(None)
                    out["n_chunks"].append(None)
                    out["trailer"].append(None)
                    out["error"].append(_coding_error_label(e))
                    continue
                out["body"].append(body)
                out["n_chunks"].append(n_chunks)
                out["trailer"].append(trailer)
                out["error"].append(None)
            yield pd.DataFrame(out)

    return sel.mapInPandas(kernel, _DECHUNK_SCHEMA)


def synthesize_http_gzip_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP bodies under ``Content-Encoding: gzip`` — (url,
    content_encoding, body_bytes): every 4th doc ships identity-coded
    (header absent, body = raw html), the rest gzip members of the html
    octets (deterministic: level 6, mtime 0). The mixed corpus makes the
    decoder's dispatch-on-header path load-bearing, not decorative."""
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    sel = pages.select(
        "url",
        F.when(doc_id % 4 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("gzip"))
        .alias("content_encoding"),
        F.col("html"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "content_encoding": pdf["content_encoding"],
                    "body_bytes": [
                        bytes(h)
                        if enc is None
                        else _gzip.compress(bytes(h), compresslevel=6, mtime=0)
                        for enc, h in zip(pdf["content_encoding"], pdf["html"])
                    ],
                }
            )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("content_encoding", StringType()),
            StructField("body_bytes", BinaryType()),
        ]
    )
    return sel.mapInPandas(kernel, schema)


_GUNZIP_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("body", BinaryType()),
        StructField("was_gzipped", IntegerType()),
        StructField("error", StringType()),
    ]
)


def decompress_gzip_bodies(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "body_bytes",
    encoding_col: str = "content_encoding",
) -> DataFrame:
    """Remove ``Content-Encoding: gzip`` from HTTP bodies: (url, body,
    was_gzipped, error). Dispatch is on the declared header (NULL/identity
    rows pass through untouched — sniffing magic bytes instead would
    corrupt an html page that legitimately starts with 0x1f 0x8b); a
    declared-gzip body that does not inflate error-flags its own row.
    Multi-member bodies inflate fully (gzip.decompress walks members) —
    some servers emit one member per write()."""
    sel = df.select(
        F.col(url_col).alias("url"), F.col(payload_col), F.col(encoding_col)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "url": [],
                "body": [],
                "was_gzipped": [],
                "error": [],
            }
            for url, payload, enc in zip(
                pdf["url"], pdf[payload_col], pdf[encoding_col]
            ):
                out["url"].append(url)
                if payload is None:
                    out["body"].append(None)
                    out["was_gzipped"].append(None)
                    out["error"].append("ValueError: null body")
                    continue
                if enc is None or enc.lower() != "gzip":
                    out["body"].append(bytes(payload))
                    out["was_gzipped"].append(0)
                    out["error"].append(None)
                    continue
                try:
                    body = _gzip.decompress(bytes(payload))
                except (OSError, EOFError, _zlib.error) as e:
                    out["body"].append(None)
                    out["was_gzipped"].append(None)
                    out["error"].append(_coding_error_label(e))
                    continue
                out["body"].append(body)
                out["was_gzipped"].append(1)
                out["error"].append(None)
            yield pd.DataFrame(out)

    return sel.mapInPandas(kernel, _GUNZIP_SCHEMA)


# ---------------------------------------------------------------------------
# Response-header security/tracking census (round 4, session 18)
# ---------------------------------------------------------------------------

_SET_COOKIE_RE = r"(?mi)^Set-Cookie:\s*([^\r\n]+)"
_STS_MAXAGE_RE = r"(?i)(^|[;\s])max-age\s*=\s*(\d+)"
_XFO_RE = r"(?mi)^X-Frame-Options:\s*([^\r\n]+)"
_REFPOL_RE = r"(?mi)^Referrer-Policy:\s*([^\r\n]+)"
_STS_RE = r"(?mi)^Strict-Transport-Security:\s*([^\r\n]+)"
_CSP_RE = r"(?mi)^Content-Security-Policy:"
_NOSNIFF_RE = r"(?mi)^X-Content-Type-Options:\s*nosniff\s*$"


def parse_set_cookie(
    df: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """``Set-Cookie`` response headers -> one row per cookie (url,
    cookie_idx, name, secure, httponly, samesite, max_age, domain,
    path): the tracking-surface census a provenance-conscious corpus
    wants next to the opt-out battery — third-party-capable cookies
    (Domain=.x) and long-lived ones (Max-Age) mark tracking-heavy hosts,
    a quality/compliance signal.

    Only the HTTP head is scanned (``substring_index`` to the first
    blank line) so a body echoing 'Set-Cookie:' cannot spoof a cookie —
    the same anti-spoof contract as ``parse_x_robots``. One
    regexp_extract_all + posexplode; each attribute is one token-
    anchored extract over the cookie string (RFC 6265 attributes are
    ``;``-separated, names case-insensitive). Flag attributes read as
    0/1, valued ones NULL when absent. All codegen, no UDF, no shuffle.
    """
    head = F.substring_index(F.col(payload_col), _CRLF + _CRLF, 1)
    cookies = F.regexp_extract_all(head, F.lit(_SET_COOKIE_RE), 1)
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(cookies).alias("cookie_idx", "ck"),
    )
    ck = F.col("ck")
    val = lambda name: F.nullif(  # noqa: E731
        F.regexp_extract(ck, rf"(?i);\s*{name}\s*=\s*([^;\s]+)", 1), F.lit("")
    )
    flag = lambda name: ck.rlike(rf"(?i);\s*{name}\s*(;|$)").cast("int")  # noqa: E731
    return ex.select(
        "url",
        F.col("cookie_idx").cast("long").alias("cookie_idx"),
        F.trim(F.regexp_extract(ck, r"^\s*([^=;\s]+)\s*=", 1)).alias("name"),
        flag("secure").alias("secure"),
        flag("httponly").alias("httponly"),
        F.lower(val("samesite")).alias("samesite"),
        val("max-age").cast("long").alias("max_age"),
        F.lower(val("domain")).alias("domain"),
        val("path").alias("path"),
    )


def parse_security_headers(
    df: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """Response security-header census -> (url, hsts_max_age, has_csp,
    xfo, referrer_policy, nosniff, n_cookies): the host-hygiene signal
    set (HSTS/CSP/X-Frame-Options/Referrer-Policy/nosniff) that
    correlates with site operational quality — a cheap corpus-level
    trust feature beside url_spam and error_pages — plus the Set-Cookie
    count feeding the tracking census. Head-only scan (body echoes
    cannot spoof), one codegen extract per header, no UDF, no shuffle.
    """
    head = F.substring_index(F.col(payload_col), _CRLF + _CRLF, 1)
    sts = F.regexp_extract(head, _STS_RE, 1)
    return df.select(
        F.col(url_col).alias("url"),
        F.nullif(F.regexp_extract(sts, _STS_MAXAGE_RE, 2), F.lit(""))
        .cast("long")
        .alias("hsts_max_age"),
        head.rlike(_CSP_RE).cast("int").alias("has_csp"),
        F.nullif(
            F.lower(F.trim(F.regexp_extract(head, _XFO_RE, 1))), F.lit("")
        ).alias("xfo"),
        F.nullif(
            F.lower(F.trim(F.regexp_extract(head, _REFPOL_RE, 1))), F.lit("")
        ).alias("referrer_policy"),
        head.rlike(_NOSNIFF_RE).cast("int").alias("nosniff"),
        F.size(F.regexp_extract_all(head, F.lit(_SET_COOKIE_RE), 1))
        .cast("long")
        .alias("n_cookies"),
    )


def zipnum_blocks(
    cdx: DataFrame,
    *,
    lines_per_block: int = 20,
) -> DataFrame:
    """ZipNum-style secondary index over a CDX capture index — the
    cluster.idx Common Crawl ships beside cc-index: the sorted CDX lines
    are cut into blocks of ``lines_per_block`` and ONE summary row per
    block ((first key) -> block locator) lets a reader binary-search the
    tiny secondary index and decompress exactly one block to answer a
    URL lookup, instead of scanning the shard.

    Scale shape: ordering is per CDX shard (= ``warc_file``), the same
    per-file-window-only discipline as ``cdx_index`` — shards
    parallelize across the cluster and the in-shard walk is bounded by
    records-per-file, never corpus size; the global index is the union
    of shard indexes (how the real cluster.idx is assembled from
    pre-sorted cdx-*.gz ranges). No global sort anywhere in the plan.

    Determinism: the block's first key is min() of the TAB-fixed-width
    string encoding url || TAB || lpad(ts, 12) — lexicographic equals
    (url, ts) order because the padded field is fixed-width and URLs
    cannot contain TAB (the revisit_dedup min-encoding discipline; a
    struct min would pit Spark struct comparison against an
    engine-specific SQL row comparison).

    Output: (warc_file, block_id, first_url, first_ts_epoch, n_lines).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("warc_file").orderBy("url", "ts_epoch")
    enc = F.concat_ws(
        "\t", F.col("url"), F.lpad(F.col("ts_epoch").cast("string"), 12, "0")
    )
    rows = cdx.select(
        "warc_file",
        enc.alias("_zn_enc"),
        F.row_number().over(w).alias("_zn_rn"),
    ).withColumn(
        "block_id",
        ((F.col("_zn_rn") - 1) / lines_per_block).cast("long"),
    )
    agg = rows.groupBy("warc_file", "block_id").agg(
        F.min("_zn_enc").alias("_zn_first"),
        F.count("*").cast("long").alias("n_lines"),
    )
    return agg.select(
        "warc_file",
        "block_id",
        F.substring_index(F.col("_zn_first"), "\t", 1).alias("first_url"),
        F.substring_index(F.col("_zn_first"), "\t", -1)
        .cast("long")
        .alias("first_ts_epoch"),
        "n_lines",
    )
