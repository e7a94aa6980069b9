"""Registry segment: byte-level web-archive codings (round-4 session-18).

The .warc.gz member layer and the HTTP transfer/content codings — the
layers a real Common-Crawl reader crosses before any record parser runs.
All three entries are by-construction oracles: the synthesized inputs are
deterministic functions of documents.parquet, so DuckDB states the expected
DECODED output in closed form and the compress->split / chunk->dechunk /
gzip->gunzip round-trips are what the hash match proves.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import _utc


def q_warc_gz_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenated-gzip-member archive split (warc.split_gz_members):
    one .warc.gz blob per host -> members walked incrementally with
    bounded backtrack -> each inflated record byte-parsed
    (parse_warc_records_binary_keyed). The md5 over the inner payload
    octets proves the full compress->concat->split->inflate->parse chain
    is lossless; member_idx proves order survived the archive round-trip.
    """
    from ..sources.warc import (
        parse_warc_records_binary_keyed,
        split_gz_members,
        synthesize_warc_gz_files_df,
    )

    _utc(spark)
    members = split_gz_members(synthesize_warc_gz_files_df(spark, sf_dir))
    parsed = parse_warc_records_binary_keyed(
        members.where(F.col("error").isNull()), "payload"
    )
    return parsed.select(
        "warc_file",
        "member_idx",
        "url",
        "content_length",
        F.md5(F.lower(F.hex("payload"))).alias("payload_md5"),
        (F.col("content_length") == F.octet_length("payload"))
        .cast("int")
        .alias("length_ok"),
    )


def _sql_warc_gz_members() -> str:
    from ..sources.pages import _TEMPLATE_HEAD, _TEMPLATE_TAIL

    html = f"'{_TEMPLATE_HEAD}' || text || '{_TEMPLATE_TAIL}'"
    blob = rf"'\x00\xFF'::blob || encode({html})"
    return f"""
SELECT source || '.example.com.warc.gz' AS warc_file,
  (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::bigint
    AS member_idx,
  'https://' || source || '.example.com/' || lang || '/' || doc_id AS url,
  octet_length({blob})::bigint AS content_length,
  md5(lower(to_hex({blob}))) AS payload_md5,
  1::int AS length_ok
FROM documents
"""


def q_http_dechunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer-Encoding: chunked removal (warc.dechunk_http_body) over
    per-doc-varying chunk sizes with trailer headers planted on every 3rd
    doc: head/body split through the latin-1 octet bijection, then the
    self-describing hex-size walk in one Arrow-batched mapInPandas. The
    md5 over the reassembled octets proves framing removal is exact; the
    trailer column proves the walk reads past the last-chunk marker."""
    from ..sources.warc import dechunk_http_body, synthesize_warc_chunked_df

    recs = synthesize_warc_chunked_df(spark, sf_dir)
    lat = F.decode("http_bytes", "ISO-8859-1")
    head = F.substring_index(lat, "\r\n\r\n", 1)
    body_b = F.encode(
        lat.substr(F.length(head) + F.lit(5), F.length(lat)), "ISO-8859-1"
    )
    dec = dechunk_http_body(recs.select("url", body_b.alias("body_bytes")))
    return dec.where(F.col("error").isNull()).select(
        "url",
        "n_chunks",
        "trailer",
        F.octet_length("body").cast("long").alias("body_octets"),
        F.md5(F.lower(F.hex("body"))).alias("body_md5"),
    )


def _sql_http_dechunk() -> str:
    from ..sources.pages import _TEMPLATE_HEAD, _TEMPLATE_TAIL

    html = f"'{_TEMPLATE_HEAD}' || text || '{_TEMPLATE_TAIL}'"
    return f"""
WITH d AS (
  SELECT doc_id, lang, source,
    octet_length(encode({html})) AS n_oct,
    64 + (doc_id % 5) * 37 AS s,
    encode({html}) AS blob
  FROM documents
)
SELECT 'https://' || source || '.example.com/' || lang || '/' || doc_id
    AS url,
  ((n_oct + s - 1) // s)::bigint AS n_chunks,
  CASE WHEN doc_id % 3 = 0 THEN 'X-Corpus-Doc: ' || doc_id END AS trailer,
  n_oct::bigint AS body_octets,
  md5(lower(to_hex(blob))) AS body_md5
FROM d
"""


def q_http_gunzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-Encoding: gzip removal (warc.decompress_gzip_bodies) over a
    mixed corpus (every 4th doc identity-coded, header absent): dispatch
    on the declared header, stdlib inflate with per-row error isolation.
    The md5 over the decoded octets proves both branches hand back the
    exact document bytes."""
    from ..sources.warc import decompress_gzip_bodies, synthesize_http_gzip_df

    out = decompress_gzip_bodies(synthesize_http_gzip_df(spark, sf_dir))
    return out.where(F.col("error").isNull()).select(
        "url",
        "was_gzipped",
        F.octet_length("body").cast("long").alias("body_octets"),
        F.md5(F.lower(F.hex("body"))).alias("body_md5"),
    )


def _sql_http_gunzip() -> str:
    from ..sources.pages import _TEMPLATE_HEAD, _TEMPLATE_TAIL

    html = f"'{_TEMPLATE_HEAD}' || text || '{_TEMPLATE_TAIL}'"
    return f"""
SELECT 'https://' || source || '.example.com/' || lang || '/' || doc_id
    AS url,
  (doc_id % 4 <> 0)::int AS was_gzipped,
  octet_length(encode({html}))::bigint AS body_octets,
  md5(lower(to_hex(encode({html})))) AS body_md5
FROM documents
"""
