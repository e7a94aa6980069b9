"""multipart/form-data parsing — the reference's literal ingest framing.

The reference ingests documents as HTTP multipart uploads (FastAPI
``UploadFile`` at app/api/v1/endpoints/documents.py:16-26 — Starlette's
multipart parser runs before ocr_service ever sees bytes). This module is
that layer Spark-first: a batch of captured upload bodies (one multipart
body per row, RFC 2046 framing) fans out to per-part rows with the part
headers parsed and the payload recovered octet-exactly.

Everything stays in whole-stage codegen: the body is viewed through the
latin-1 octet<->char bijection (warc.parse_warc_records_binary's trick), the
per-row boundary becomes a ``\\Q...\\E``-quoted split pattern (Spark 4
``split`` takes a Column pattern), parts explode positionally, and part
headers parse with line-anchored regexes over the head only — a payload
echoing ``Content-Disposition:`` text cannot spoof a header. No UDF, no
shuffle; at crawl scale the parse runs at scan speed and the recovered file
parts feed the same decode path as WARC payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = "\r\n"

_DISP_NAME_RE = r'(?mi)^Content-Disposition:[^\r\n]*;\s*name="([^"]*)"'
_DISP_FILENAME_RE = r'(?mi)^Content-Disposition:[^\r\n]*filename="([^"]*)"'
_PART_CTYPE_RE = r"(?mi)^Content-Type:\s*([^\r\n]+)"


def synthesize_multipart_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One multipart/form-data upload body per document — (upload_id,
    boundary, body_bytes): a file part carrying the html (filename,
    Content-Type) followed by a plain ``source`` field part, per-doc
    boundary, RFC 2046 close-delimiter. Pure Catalyst concat through the
    latin-1 view so Content-bytes framing is octet-exact by construction.
    """
    from .pages import synthesize_pages_df

    pages = synthesize_pages_df(spark, sf_dir)
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    source = F.regexp_extract("url", r"^https://([^.]*)\.", 1)
    boundary = F.concat(F.lit("----ldocb"), doc_id.cast("string"))
    lat = F.decode(F.col("html"), "ISO-8859-1")
    dash_b = F.concat(F.lit("--"), boundary)
    body = F.concat(
        dash_b, F.lit(_CRLF),
        F.lit('Content-Disposition: form-data; name="file"; filename="'),
        doc_id.cast("string"), F.lit('.html"' + _CRLF),
        F.lit("Content-Type: text/html" + _CRLF + _CRLF),
        lat, F.lit(_CRLF),
        dash_b, F.lit(_CRLF),
        F.lit('Content-Disposition: form-data; name="source"' + _CRLF + _CRLF),
        source, F.lit(_CRLF),
        dash_b, F.lit("--" + _CRLF),
    )
    return pages.select(
        F.col("url").alias("upload_id"),
        boundary.alias("boundary"),
        F.encode(body, "ISO-8859-1").alias("body_bytes"),
    )


def parse_multipart(
    df: DataFrame,
    id_col: str = "upload_id",
    boundary_col: str = "boundary",
    body_col: str = "body_bytes",
) -> DataFrame:
    """Fan a multipart body out to per-part rows: (upload_id, part_pos,
    name, filename, content_type, payload). RFC 2046 framing: split on
    ``--boundary`` (literal-quoted — a boundary containing regex
    metacharacters cannot change the split), keep the delimited parts
    (each begins with the CRLF that closed the delimiter line and is
    followed by another boundary), drop the preamble and the ``--``
    close-delimiter tail. Within a part: headers end at the first blank
    line; the payload is everything after it MINUS the trailing CRLF that
    belongs to the next delimiter (RFC 2046 §5.1.1 — that CRLF is part of
    the framing, not the data). filename/content_type come back NULL on
    field parts. Payload returned as binary via the latin-1 bijection.
    """
    lat = F.decode(F.col(body_col), "ISO-8859-1")
    pat = F.concat(F.lit("\\Q--"), F.col(boundary_col), F.lit("\\E"))
    parts = F.split(lat, pat)
    ex = df.select(
        F.col(id_col).alias("upload_id"),
        F.posexplode(parts).alias("raw_pos", "part"),
        F.size(parts).alias("_n"),
    )
    # part 0 is the preamble (empty here), the last is the close-delimiter
    # tail ("--CRLF"); real parts start with the delimiter's closing CRLF
    ex = ex.where(
        (F.col("raw_pos") > 0)
        & (F.col("raw_pos") < F.col("_n") - 1)
        & F.col("part").startswith(_CRLF)
    )
    body = F.expr("substring(part, 3)")  # drop the delimiter-closing CRLF
    head = F.substring_index(body, _CRLF + _CRLF, 1)
    payload = body.substr(
        F.length(head) + F.lit(5),
        F.length(body) - F.length(head) - F.lit(6),  # minus framing CRLF
    )
    filename = F.regexp_extract(head, _DISP_FILENAME_RE, 1)
    ctype = F.regexp_extract(head, _PART_CTYPE_RE, 1)
    return ex.select(
        "upload_id",
        (F.col("raw_pos") - 1).cast("long").alias("part_pos"),
        F.regexp_extract(head, _DISP_NAME_RE, 1).alias("name"),
        F.when(filename != "", filename).alias("filename"),
        F.when(ctype != "", ctype).alias("content_type"),
        F.encode(payload, "ISO-8859-1").alias("payload"),
    )
