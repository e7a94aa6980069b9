"""Registry segment: markup/host metadata extraction (round-4 session-18).

IDN host decode, responsive-image srcset candidates, OpenGraph/Twitter-card
metadata, and the charset-resolution census — by-construction oracles over
deterministically decorated template pages (image_alt_pairs' pattern).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import synthesize_pages_df

# verified stdlib round-trip pairs (host.encode('ascii').decode('idna')):
# ACE form -> unicode form; the last entry is a deliberately-invalid ACE
# label that must error-isolate, not fail the task.
_IDN_PAIRS: tuple[tuple[str, str | None], ...] = (
    ("xn--mnchen-3ya.example.com", "münchen.example.com"),
    ("xn--bcher-kva.example.com", "bücher.example.com"),
    ("xn--h1alffa9f.example.com", "россия.example.com"),
    ("xn--fiqs8s.example.com", "中国.example.com"),
    ("xn--wgv71a.example.com", "日本.example.com"),
    ("xn--3e0b707e.example.com", "한국.example.com"),
    ("xn--caf-dma.example.com", "café.example.com"),
    ("xn--trkiye-3ya.example.com", "türkiye.example.com"),
    ("xn--and-6ma2c.example.com", "ñandú.example.com"),
    ("xn--hxakic4aa.example.com", "ελλάδα.example.com"),
    ("www.example.com", "www.example.com"),  # plain ASCII passthrough
    ("xn--zzzzzz.example.com", None),  # malformed ACE -> ok=0
)


def q_idn_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN host decode (urls.idn_decode_hosts) over a corpus cycling
    through 10 verified punycode hosts, one ASCII host, and one malformed
    ``xn--`` label (must error-isolate with ok=0, never fail the task)."""
    from ..operators.urls import idn_decode_hosts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.element_at(
        F.array(*[F.lit(p[0]) for p in _IDN_PAIRS]),
        (F.col("doc_id") % len(_IDN_PAIRS) + 1).cast("int"),
    )
    # the kernel decodes the 12 DISTINCT hosts once; the per-doc rows join
    # the result back on host — a bounded literal-table broadcast (the
    # 100 TB shape: never run Python over rows a distinct can collapse)
    dd = idn_decode_hosts(
        docs.select(host.alias("host")).distinct(), "host"
    )
    return (
        docs.select("doc_id", host.alias("host"))
        .join(F.broadcast(dd), "host")
        .select("doc_id", "host", "unicode_host", "is_idn", "ok")
    )


def _sql_idn_hosts() -> str:
    ace_case = " ".join(
        f"WHEN {i} THEN '{p[0]}'" for i, p in enumerate(_IDN_PAIRS)
    )
    uni_case = " ".join(
        f"WHEN {i} THEN " + (f"'{p[1]}'" if p[1] is not None else "NULL")
        for i, p in enumerate(_IDN_PAIRS)
    )
    n = len(_IDN_PAIRS)
    return f"""
SELECT doc_id,
  CASE doc_id % {n} {ace_case} END AS host,
  CASE doc_id % {n} {uni_case} END AS unicode_host,
  (doc_id % {n} <> 10)::int AS is_idn,
  (doc_id % {n} <> 11)::int AS ok
FROM documents
"""


def q_srcset_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Responsive-image srcset parse (urls.parse_srcset): every doc gets a
    3-candidate img srcset (width, density, and descriptor-less variants),
    every 3rd doc a second source-tag srcset — two posexplodes, all
    codegen; the descriptor-less candidate must come back NULL."""
    from ..operators.urls import parse_srcset

    pages = synthesize_pages_df(spark, sf_dir)
    did = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    ds = did.cast("string")
    deco = F.concat(
        F.decode("html", "UTF-8"),
        F.lit('<img srcset="/i/'), ds, F.lit("-s.jpg 480w, /i/"), ds,
        F.lit("-b.jpg 2x, /i/"), ds, F.lit('.jpg">'),
        F.when(
            did % 3 == 0,
            F.concat(F.lit('<source srcset="/v/'), ds, F.lit('.webp">')),
        ).otherwise(F.lit("")),
    )
    return parse_srcset(pages.select("url", F.encode(deco, "UTF-8").alias("html")))


def _sql_srcset_candidates() -> str:
    return """
WITH u AS (
  SELECT doc_id,
    'https://' || source || '.example.com/' || lang || '/' || doc_id AS url
  FROM documents
)
SELECT url, 0::bigint AS set_pos, 0::bigint AS candidate_pos,
  '/i/' || doc_id || '-s.jpg' AS candidate_url, '480w' AS descriptor FROM u
UNION ALL
SELECT url, 0::bigint, 1::bigint, '/i/' || doc_id || '-b.jpg', '2x' FROM u
UNION ALL
SELECT url, 0::bigint, 2::bigint, '/i/' || doc_id || '.jpg', NULL FROM u
UNION ALL
SELECT url, 1::bigint, 0::bigint, '/v/' || doc_id || '.webp', NULL
FROM u WHERE doc_id % 3 = 0
"""


def q_opengraph_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph/Twitter-card extraction (urls.opengraph_meta) with each
    field planted on its own doc_id stride so every NULL/value combination
    appears; five regexp extracts over one decode, codegen only."""
    from ..operators.urls import opengraph_meta

    pages = synthesize_pages_df(spark, sf_dir)
    did = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    ds = did.cast("string")

    def plant(cond, prefix: str, val, suffix: str):
        return F.when(cond, F.concat(F.lit(prefix), val, F.lit(suffix))).otherwise(
            F.lit("")
        )

    deco = F.concat(
        F.decode("html", "UTF-8"),
        plant(did % 2 == 0, '<meta property="og:title" content="T', ds, '">'),
        plant(did % 3 == 0, '<meta property="og:type" content="', F.lit("article"), '">'),
        plant(did % 2 == 0, '<meta property="og:image" content="/og/', ds, '.jpg">'),
        plant(did % 5 == 0, '<meta property="og:url" content="', F.col("url"), '">'),
        plant(did % 7 == 0, '<meta name="twitter:card" content="', F.lit("summary"), '">'),
    )
    return opengraph_meta(pages.select("url", F.encode(deco, "UTF-8").alias("html")))


def _sql_opengraph_meta() -> str:
    return """
SELECT
  'https://' || source || '.example.com/' || lang || '/' || doc_id AS url,
  CASE WHEN doc_id % 2 = 0 THEN 'T' || doc_id END AS og_title,
  CASE WHEN doc_id % 3 = 0 THEN 'article' END AS og_type,
  CASE WHEN doc_id % 2 = 0 THEN '/og/' || doc_id || '.jpg' END AS og_image,
  CASE WHEN doc_id % 5 = 0 THEN
    'https://' || source || '.example.com/' || lang || '/' || doc_id
  END AS og_url,
  CASE WHEN doc_id % 7 = 0 THEN 'summary' END AS twitter_card
FROM documents
"""


def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset-resolution census (urls.charset_sniff): UTF-8 BOM planted
    on every 5th doc, a header charset on every 3rd, the template's meta
    charset on all — the WHATWG precedence (BOM > header > meta) decides
    ``effective``. BOM detection reads octets via the latin-1 view."""
    from ..operators.urls import charset_sniff

    pages = synthesize_pages_df(spark, sf_dir)
    did = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    payload = F.when(
        did % 5 == 0, F.concat(F.lit(bytes([0xEF, 0xBB, 0xBF])), F.col("html"))
    ).otherwise(F.col("html"))
    ctype = F.when(
        did % 3 == 0, F.lit("text/html; charset=ISO-8859-1")
    ).otherwise(F.lit("text/html"))
    return charset_sniff(
        pages.select(
            "url", payload.alias("payload"), ctype.alias("content_type")
        )
    )


def _sql_charset_sniff() -> str:
    return """
SELECT
  'https://' || source || '.example.com/' || lang || '/' || doc_id AS url,
  CASE WHEN doc_id % 5 = 0 THEN 'utf-8' END AS bom,
  CASE WHEN doc_id % 3 = 0 THEN 'iso-8859-1' END AS header_charset,
  'utf-8' AS meta_charset,
  CASE WHEN doc_id % 5 = 0 THEN 'utf-8'
       WHEN doc_id % 3 = 0 THEN 'iso-8859-1'
       ELSE 'utf-8' END AS effective
FROM documents
"""
