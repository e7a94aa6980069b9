"""URL canonicalization — the identity function of a web corpus.

Every Common-Crawl-scale pipeline keys on the URL (dedup, revisit detection,
partitioning by host), so `HTTP://Host.COM:80/a/?utm_source=x#f` and
`http://host.com/a` must collapse to one key BEFORE any hash-keyed stage.
Reference analogue: the content-hash cache key normalization in
app/utils/cache_manager.py:24-31 (one canonical key per logical payload),
lifted to the URL domain.

Canonicalization applied (crawler conventions on top of RFC 3986):
scheme + host lowercase, default port stripped (:80 http / :443 https),
fragment dropped, tracking parameters removed (utm_*, fbclid, gclid, ref),
remaining query parameters sorted, trailing path slashes collapsed
('' -> '/'). Everything is JVM-side regexp/array expressions — one pass,
no UDF, no shuffle; the DuckDB oracle states the identical steps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url_expr(url: Column) -> Column:
    """Canonical form of ``url`` as a single codegen'd expression.

    The fragment is stripped FIRST: a '?' inside the fragment (SPA hash
    routing, 'https://site.com/app#/route?tab=2') must not be mistaken for
    the query string — the query regex below is unanchored and would
    otherwise find it.
    """
    nf = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nf, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(nf, _AUTH_RE, 1))
    host = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    raw_path = F.regexp_extract(nf, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    raw_q = F.regexp_extract(nf, _QUERY_RE, 1)
    params = F.filter(
        F.split(raw_q, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )
    # unparseable input (no scheme://authority) passes through UNCHANGED —
    # rebuilding from empty captures would emit ':///'-shaped garbage and
    # collide every malformed url onto one key
    return F.when(scheme == "", url).otherwise(rebuilt)


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Out-link extraction — the web-graph construction step: one page row
    fans out to (url, link_pos, href, resolved) rows, root-relative hrefs
    resolved against the page's own scheme://host. Reference analogue: the
    reference's DOM walk collects anchors for its link-density heuristic
    (SURVEY.md K2/P3); here the anchors themselves are the product.

    regexp_extract_all over the decoded payload + one posexplode — stays in
    codegen, no UDF, no shuffle; at corpus scale the output IS the edge list
    a host-graph (PageRank, spam-rank) stage consumes.
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    hrefs = F.regexp_extract_all(html_txt, F.lit(r'href="([^"]*)"'), 1)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    ex = df.select(
        url.alias("url"),
        scheme.alias("_scheme"),
        host.alias("_host"),
        F.posexplode(hrefs).alias("link_pos", "href"),
    )
    # protocol-relative ('//host/path') BEFORE root-relative ('/path'):
    # startswith('/') matches both, and resolving '//cdn.other.com/x' against
    # the page host would fabricate a same-host edge with a garbage path
    resolved = (
        F.when(
            F.col("href").startswith("//"),
            F.concat(F.col("_scheme"), F.lit(":"), F.col("href")),
        )
        .when(
            F.col("href").startswith("/"),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), F.col("href")),
        )
        .otherwise(F.col("href"))
    )
    return ex.select(
        "url",
        F.col("link_pos").cast("long").alias("link_pos"),
        "href",
        resolved.alias("resolved"),
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, canonical_url, host, changed) per row — ``changed`` flags rows
    whose canonical form differs (the audit signal: how dirty is the crawl).
    """
    canon = canonical_url_expr(F.col(url_col))
    return df.select(
        F.col(url_col).alias("url"),
        canon.alias("canonical_url"),
        F.lower(F.regexp_extract(canon, _AUTH_RE, 1)).alias("host"),
        (canon != F.col(url_col)).cast("int").alias("changed"),
    )
