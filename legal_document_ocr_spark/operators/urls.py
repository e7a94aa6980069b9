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

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# robots.txt + crawl politeness (round 3)
# ---------------------------------------------------------------------------


def parse_robots_rules(
    robots: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Per-host Disallow prefixes for ``User-agent: *`` -> (host, prefix).

    The section logic ("a Disallow line belongs to the most recent
    User-agent group above it") is genuinely RELATIONAL: posexplode the
    lines, carry the last seen user-agent value down with
    ``last(ua, ignorenulls) OVER (PARTITION BY host ORDER BY line_no)``,
    keep Disallow lines whose section is ``*``. One window per host —
    robots files are KB-sized, so the per-host partition is tiny; the
    whole parse is expressions + one bounded window, no UDF.

    Simplifications vs RFC 9309 (documented scope): only the ``*`` agent
    group is honored, and empty ``Disallow:`` (allow-all) lines are
    dropped. Full longest-match Allow/Disallow precedence lives in
    ``parse_robots_directives`` + ``robots_precedence_filter``; this
    Disallow-only view remains the cheap input to the LEFT-ANTI
    ``filter_disallowed`` fast path.
    """
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), r"\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract("line", r"(?i)^\s*user-agent\s*:\s*(\S+)", 1))).alias("ua_raw"),
        F.trim(F.regexp_extract("line", r"(?i)^\s*disallow\s*:\s*(\S+)", 1)).alias("dis_raw"),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    sectioned = lines.withColumn(
        "section",
        F.last(F.when(F.col("ua_raw") != "", F.col("ua_raw")), ignorenulls=True).over(w),
    )
    return (
        sectioned.where((F.col("section") == "*") & (F.col("dis_raw") != ""))
        .select("host", F.col("dis_raw").alias("prefix"))
        .distinct()
    )


def filter_disallowed(
    frontier: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Drop frontier urls whose PATH starts with a disallowed prefix for
    their host — LEFT ANTI join on (host equality AND prefix match).

    Scale shape: the join key is the host, so both sides shuffle on host
    (rules are per-host-bounded; never broadcast the frontier). The
    startswith is a post-probe filter inside the join — no fan-out."""
    path = F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    f = frontier.withColumn("_path", F.when(path == "", F.lit("/")).otherwise(path))
    r = rules.select(F.col("host").alias("_rhost"), "prefix")
    out = f.join(
        r.hint("shuffle_hash"),
        (F.col(host_col) == F.col("_rhost"))
        & F.col("_path").startswith(F.col("prefix")),
        "left_anti",
    )
    return out.drop("_path")


def politeness_topk(
    frontier: DataFrame,
    k: int,
    *,
    host_col: str = "host",
    order_col: str = "rank_nano",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-host fetch budget: keep the top-``k`` urls per host by
    (order desc, url asc) — the politeness cap every crawler applies so one
    megasite cannot monopolize the fetch fleet.

    Two-phase top-k: a naive ``row_number() OVER (PARTITION BY host)`` puts
    a megahost's entire frontier (10^9 urls for a large site) in ONE task —
    the single-partition-window failure mode. Phase 1 takes top-k within
    (host, salt) — each salt partition holds ~1/salt_buckets of the host —
    then phase 2 takes top-k per host over the pruned ≤ salt_buckets·k
    survivors. The global top-k is always contained in the union of
    per-salt top-ks, so the result is identical; the second window's
    partitions are bounded by construction. ``salt_buckets=1`` degenerates
    to the single-window plan."""
    from pyspark.sql import Window

    pruned = frontier
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            host_col, F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
        ).orderBy(F.col(order_col).desc(), F.col("url"))
        pruned = (
            frontier.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= k)
            .drop("_rn1")
        )
    w = Window.partitionBy(host_col).orderBy(
        F.col(order_col).desc(), F.col("url")
    )
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def parse_sitemap_urls(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Extract <loc> urls from sitemap XML -> (host, url), one row per loc.

    regexp_extract_all + posexplode at scan speed: sitemap XML is a fixed
    grammar (urlset/url/loc), so a full XML parser buys nothing here —
    the same judgement call as the WARC header regexes. CDATA-wrapped and
    whitespace-padded locs are normalized; nested <sitemap> index entries
    are returned too (the caller fetches and recurses).
    """
    locs = F.expr(
        f"regexp_extract_all({xml_col}, '<loc>\\\\s*(?:<!\\\\[CDATA\\\\[)?([^<\\\\]]*?)(?:\\\\]\\\\]>)?\\\\s*</loc>', 1)"
    )
    return sitemaps.select(
        F.col(host_col).alias("host"), F.explode(locs).alias("loc")
    ).select("host", F.trim(F.col("loc")).alias("url"))


# ---------------------------------------------------------------------------
# anchor text: extraction + inverted anchor index (round 3)
# ---------------------------------------------------------------------------

_ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchor_texts(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, link_pos, href, anchor_text, resolved) — out-links WITH their
    anchor text, the signal an anchor-text index / link-spam classifier
    consumes. Reference analogue: the reference's DOM walk reads anchor
    inner text for its link-density heuristic
    (region_segmentation_service.py, SURVEY.md K2/P3); here the text itself
    is the product.

    Spark's ``regexp_extract_all`` returns ONE capture group per call; a
    naive two-pass (one per group) would run the heavy page-sized regex
    TWICE per row. Instead group 0 (the whole ``<a …>…</a>`` match) is
    extracted once at scan speed, and href/text come from per-element
    ``regexp_extract`` over the short matched fragments — the page-sized
    scan happens once, everything stays in whole-stage codegen, one
    posexplode, no UDF, no shuffle. Root-relative and protocol-relative
    hrefs resolve against the page's own scheme://host exactly as in
    ``extract_links``.
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    ex = df.select(
        url.alias("url"),
        scheme.alias("_scheme"),
        host.alias("_host"),
        F.posexplode(F.regexp_extract_all(html_txt, F.lit(_ANCHOR_RE), 0)).alias(
            "link_pos", "frag"
        ),
    )
    href = F.regexp_extract(F.col("frag"), _ANCHOR_RE, 1)
    text = F.regexp_extract(F.col("frag"), _ANCHOR_RE, 2)
    resolved = (
        F.when(href.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), href))
        .when(
            href.startswith("/"),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), href),
        )
        .otherwise(href)
    )
    anchor = F.trim(F.regexp_replace(text, r"\s+", " "))
    return ex.select(
        "url",
        F.col("link_pos").cast("long").alias("link_pos"),
        href.alias("href"),
        anchor.alias("anchor_text"),
        resolved.alias("resolved"),
    )


def anchor_text_index(
    links: DataFrame, target_col: str = "resolved", text_col: str = "anchor_text"
) -> DataFrame:
    """Inverted anchor index: per target url, total in-links, distinct anchor
    phrases, and the dominant phrase — the classic web-corpus ranking /
    query-expansion signal (anchor text describes the TARGET page).

    Two map-side-combined shuffles and nothing else: (target, phrase) counts
    partial-aggregate before the first exchange (anchor phrases repeat
    heavily — "home", "click here"), then one groupBy(target) where
    ``max(struct(cnt, phrase))`` picks the dominant phrase without a window
    or a second scan. No window over a global ordering, no broadcast of a
    corpus-sized side; both exchanges are keyed by target url, which is the
    partitioning a downstream join-to-pages stage reuses.
    """
    phrase = F.lower(F.col(text_col))
    per_phrase = (
        links.select(F.col(target_col).alias("target"), phrase.alias("phrase"))
        .where(F.col("phrase") != "")
        .groupBy("target", "phrase")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = F.max(F.struct(F.col("cnt"), F.col("phrase"))).alias("_top")
    return (
        per_phrase.groupBy("target")
        .agg(
            F.sum("cnt").cast("long").alias("n_links"),
            F.count(F.lit(1)).cast("long").alias("n_phrases"),
            top,
        )
        .select(
            "target",
            "n_links",
            "n_phrases",
            F.col("_top.phrase").alias("top_phrase"),
            F.col("_top.cnt").cast("long").alias("top_count"),
        )
    )


# ---------------------------------------------------------------------------
# image-alt pair mining (round 4)
# ---------------------------------------------------------------------------

_IMG_TAG_RE = r"(?i)<img\b[^>]*>"
_IMG_SRC_RE = "(?i)\\bsrc\\s*=\\s*[\"']([^\"']*)[\"']"
_IMG_ALT_RE = "(?i)\\balt\\s*=\\s*[\"']([^\"']*)[\"']"


def extract_image_alt_pairs(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, img_pos, img_url, alt_text, alt_len) — image/alt-text pairs
    mined from page HTML: the LAION-style candidate generation step for
    image-text training corpora (CLIP-family models train on exactly
    these pairs). Reference analogue: the reference pairs each detected
    image region with its OCR text (SURVEY.md S3/K2); here the page
    AUTHOR's alt text is the caption.

    Same single-heavy-scan shape as ``extract_anchor_texts``: the
    page-sized ``<img …>`` regex runs ONCE per row via
    ``regexp_extract_all`` group 0; src/alt come from per-fragment
    ``regexp_extract`` over the short matched tags (attribute order and
    case free, single or double quotes). Everything stays in whole-stage
    codegen — no UDF, no shuffle. Root-relative and protocol-relative
    srcs resolve against the page's own scheme://host; tags missing
    either a src or a non-empty alt are dropped (a pair needs both
    halves). alt text is whitespace-collapsed, exactly like the
    extraction pipeline's text cleanup.
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    ex = df.select(
        url.alias("url"),
        scheme.alias("_scheme"),
        host.alias("_host"),
        F.posexplode(F.regexp_extract_all(html_txt, F.lit(_IMG_TAG_RE), 0)).alias(
            "img_pos", "frag"
        ),
    )
    src = F.regexp_extract(F.col("frag"), _IMG_SRC_RE, 1)
    alt = F.trim(
        F.regexp_replace(F.regexp_extract(F.col("frag"), _IMG_ALT_RE, 1), r"\s+", " ")
    )
    resolved = (
        F.when(src.startswith("//"), F.concat(F.col("_scheme"), F.lit(":"), src))
        .when(
            src.startswith("/"),
            F.concat(F.col("_scheme"), F.lit("://"), F.col("_host"), src),
        )
        .otherwise(src)
    )
    return (
        ex.select(
            "url",
            F.col("img_pos").cast("long").alias("img_pos"),
            resolved.alias("img_url"),
            alt.alias("alt_text"),
        )
        .where((F.col("img_url") != "") & (F.col("alt_text") != ""))
        .withColumn("alt_len", F.length("alt_text").cast("long"))
    )


# ---------------------------------------------------------------------------
# HTML head metadata (round 3)
# ---------------------------------------------------------------------------

_TITLE_RE = r"<title>([^<]*)</title>"
_META_DESC_RE = r'<meta name="description" content="([^"]*)"'
_CANONICAL_RE = r'<link rel="canonical" href="([^"]*)"'
_CHARSET_RE = r'<meta charset="([^"]*)"'


def extract_html_metadata(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, meta_description, canonical_url, charset) — the head
    fields every crawl pipeline indexes before looking at the body: title
    for display/ranking, meta description as a summary fallback, canonical
    link for URL-level dedup (it overrides ``canonical_url_expr`` when
    present), charset for decode dispatch. Reference analogue: the
    reference's per-document metadata dict (document_merger_service.py
    `metadata`/`document_info`), lifted to the web-page domain.

    Four regexp_extract calls over one decode — all whole-stage codegen,
    no UDF, no shuffle: metadata lands at scan speed and the scan reads
    only (url, html), so column pruning keeps every other column out of
    the plan. Missing fields are NULL (``nullif('')``), not '', so
    downstream COALESCE chains behave.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")

    def _grab(pattern: str) -> Column:
        return F.nullif(F.regexp_extract(html_txt, pattern, 1), F.lit(""))

    return df.select(
        F.col(url_col).alias("url"),
        F.nullif(
            F.trim(F.regexp_replace(_grab(_TITLE_RE), r"\s+", " ")), F.lit("")
        ).alias("title"),
        _grab(_META_DESC_RE).alias("meta_description"),
        _grab(_CANONICAL_RE).alias("canonical_url"),
        F.lower(_grab(_CHARSET_RE)).alias("charset"),
    )


# ---------------------------------------------------------------------------
# URL spam scoring + recrawl prioritization (round 3)
# ---------------------------------------------------------------------------

SPAM_KEYWORDS: tuple[str, ...] = (
    "casino",
    "viagra",
    "porn",
    "xxx",
    "pills",
    "loan",
    "betting",
    "pharma",
    "replica",
    "escort",
)


def url_spam_scores(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-only spam scoring — the pre-fetch filter of a crawl pipeline:
    spammy hosts are rejected from the frontier BEFORE any bytes are
    fetched, so the features must come from the URL string alone (the
    WEBSPAM-UK / Gopher URL-heuristic family). Reference analogue: the
    reference's input-validation predicate (SURVEY.md P1,
    app/api/routes.py content-type gate) — reject-before-work, lifted to
    the URL domain.

    Integer-weighted features, all JVM-side codegen (no UDF, no shuffle —
    scoring lands at scan speed, and at 100 TB this runs on the frontier
    table, not the payloads):

    - ``kw_hits`` x40 — spam keywords anywhere in the lowered URL
    - ``host_hyphens`` x5 / ``host_digits`` x4 — 'best-casino-777' shapes
    - ``n_params`` x3 — affiliate/tracking-id stuffing
    - ``path_depth`` x2 — auto-generated directory farms
    - long host (>30 chars) +10

    ``is_spam`` at score >= 40: one keyword hit alone is enough, host
    shape alone needs to be extreme. Weights are integers so the score is
    deterministic and engine-portable (no float summation order).
    """
    url = F.col(url_col)
    low = F.lower(url)
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    raw_q = F.regexp_extract(url, _QUERY_RE, 1)
    host_digits = F.length(host) - F.length(F.regexp_replace(host, r"[0-9]", ""))
    host_hyphens = F.length(host) - F.length(F.regexp_replace(host, r"-", ""))
    path_depth = F.size(F.filter(F.split(path, "/"), lambda p: F.length(p) > 0))
    n_params = F.size(F.filter(F.split(raw_q, "&"), lambda p: F.length(p) > 0))
    kw_hits = reduce(
        lambda a, b: a + b,
        [F.when(low.contains(k), 1).otherwise(0) for k in SPAM_KEYWORDS],
    )
    score = (
        kw_hits * 40
        + host_hyphens * 5
        + host_digits * 4
        + n_params * 3
        + path_depth * 2
        + F.when(F.length(host) > 30, 10).otherwise(0)
    )
    return df.select(
        url.alias("url"),
        host.alias("host"),
        host_digits.cast("long").alias("host_digits"),
        host_hyphens.cast("long").alias("host_hyphens"),
        path_depth.cast("long").alias("path_depth"),
        n_params.cast("long").alias("n_params"),
        kw_hits.cast("long").alias("kw_hits"),
        score.cast("long").alias("spam_score"),
        (score >= 40).alias("is_spam"),
    )


def recrawl_priority(obs: DataFrame) -> DataFrame:
    """Recrawl scheduling from revisit history — the incremental-crawl
    planner: given per-URL fetch observations ``(url, epoch,
    content_hash)``, estimate each URL's change rate and rank what to
    fetch next. Reference analogue: the content-hash revisit detection of
    app/utils/cache_manager.py:24-31 (same-hash means skip-recompute),
    extended over TIME: the history of hash flips is the change-rate
    signal.

    Model: a URL that changed in ``c`` of its ``n-1`` revisit intervals
    has estimated change rate c/(n-1) (the Cho/Garcia-Molina frequency
    estimator); priority = rate x epochs-since-last-observed-change — the
    expected number of unseen changes under a Poisson refresh model, in
    integer micro-units.

    Scale shape: one lag window partitioned by url (per-URL history is a
    handful of epochs — thousands of tiny partitions hash-spread across
    executors, never a global sort), then one map-side-combined groupBy
    on the same key, so the window's exchange is reused by the aggregate.
    Output: one row per url — (url, host, n_obs, n_changes,
    change_rate_micro, stale_epochs, priority_micro).
    """
    w = Window.partitionBy("url").orderBy("epoch")
    flagged = obs.select(
        "url",
        "epoch",
        (
            F.lag("content_hash").over(w).isNotNull()
            & (F.col("content_hash") != F.lag("content_hash").over(w))
        ).cast("int").alias("changed"),
    )
    per_url = flagged.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum("changed").cast("long").alias("n_changes"),
        F.max(F.when(F.col("changed") == 1, F.col("epoch"))).alias("_last_change"),
        F.min("epoch").alias("_first"),
        F.max("epoch").alias("_last"),
    )
    rate = F.when(
        F.col("n_obs") > 1,
        F.floor(F.col("n_changes") * 1000000 / (F.col("n_obs") - 1)),
    ).otherwise(F.lit(0))
    stale = F.col("_last") - F.coalesce(F.col("_last_change"), F.col("_first"))
    return per_url.select(
        "url",
        F.lower(F.regexp_extract(F.col("url"), _AUTH_RE, 1)).alias("host"),
        F.col("n_obs").cast("long").alias("n_obs"),
        "n_changes",
        rate.cast("long").alias("change_rate_micro"),
        stale.cast("long").alias("stale_epochs"),
        (rate * stale).cast("long").alias("priority_micro"),
    )


# ---------------------------------------------------------------------------
# registrable domain (eTLD+1) + per-host page cap (round 3)
# ---------------------------------------------------------------------------

# Built-in representative subset of the public-suffix list, multi-label
# suffixes first so longest-match wins by coalesce order. The full PSL is
# external data by the project rules — production swaps this tuple for the
# published list; every downstream expression is generated from the tuple,
# so the swap is one constant.
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "co.in",
    "github.io", "blogspot.com",
    "com", "org", "net", "edu", "gov", "io", "info", "biz", "dev",
)


def registrable_domain_expr(host: Column) -> Column:
    """eTLD+1 of ``host`` — the grouping key of per-site statistics (a
    crawler that groups by raw host treats blog.example.co.uk and
    www.example.co.uk as different sites; one that groups by bare TLD
    merges every .co.uk site into one). Longest public suffix + one label,
    PSL semantics over the built-in suffix subset.

    A coalesce chain of anchored regexp_extracts — one per suffix, all
    whole-stage codegen. Unknown TLDs fall back to the last two labels;
    a dotless host is returned unchanged.
    """
    candidates = [
        F.nullif(
            F.regexp_extract(host, r"([^.]+\." + s.replace(".", r"\.") + r")$", 1),
            F.lit(""),
        )
        for s in PUBLIC_SUFFIXES
    ]
    fallback = F.nullif(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1), F.lit(""))
    return F.coalesce(*candidates, fallback, host)


def registrable_domains(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, registrable_domain) per row — scan-speed, no shuffle."""
    host = F.lower(F.regexp_extract(F.col(url_col), _AUTH_RE, 1))
    return df.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        registrable_domain_expr(host).alias("registrable_domain"),
    )


def domain_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain crawl census: (registrable_domain, n_pages,
    n_hosts) — the site-level fan-in every curation dashboard starts from.
    One map-side-combined groupBy on the short domain key; count_distinct
    of hosts partial-aggregates because hosts of one domain co-shuffle.
    """
    d = registrable_domains(df, url_col)
    return (
        d.groupBy("registrable_domain")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.count_distinct("host").cast("long").alias("n_hosts"),
        )
    )


def host_page_cap(
    pages: DataFrame,
    k: int,
    *,
    host_col: str = "host",
    url_col: str = "url",
    salt_buckets: int = 16,
) -> DataFrame:
    """Per-host page cap — keep at most ``k`` pages per host, chosen
    DETERMINISTICALLY by md5(url) rank (not arrival order), so reruns and
    incremental crawls keep the SAME pages. The anti-monopolization step
    of corpus curation: without it one megasite contributes 10^9 of the
    10^10 training pages. Reference analogue: the per-request page cap of
    the reference's batch endpoint (app/api/routes.py limit gate), lifted
    to per-host corpus scope.

    Same two-phase top-k shape as ``politeness_topk`` (a megahost's pages
    must never meet a single row_number window): phase 1 ranks within
    (host, salt) — ~1/salt_buckets of the host per task — phase 2 ranks
    the <= salt_buckets*k survivors per host. Identical result by the
    containment argument; bounded partitions by construction.
    """
    from pyspark.sql import Window

    ranked = pages.withColumn("_cap_rank", F.md5(F.col(url_col)))
    pruned = ranked
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            host_col, F.pmod(F.xxhash64(url_col), F.lit(salt_buckets))
        ).orderBy(F.col("_cap_rank"), F.col(url_col))
        pruned = (
            ranked.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= k)
            .drop("_rn1")
        )
    w = Window.partitionBy(host_col).orderBy(F.col("_cap_rank"), F.col(url_col))
    return (
        pruned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_cap_rank")
    )


def parse_crawl_delay(
    robots: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Per-host ``Crawl-delay`` (seconds) for the ``User-agent: *`` group ->
    (host, delay_sec) — only hosts that declare one emit a row.

    Same section-assignment relational shape as ``parse_robots_rules`` (a
    directive belongs to the most recent User-agent line above it, carried
    by last(..., ignorenulls) over the per-host line window); a decoy
    delay in a non-* section must not leak. Duplicate declarations in the
    * section resolve to the MINIMUM (the conservative fetch rate).
    """
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), r"\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(
            F.trim(F.regexp_extract("line", r"(?i)^\s*user-agent\s*:\s*(\S+)", 1))
        ).alias("ua_raw"),
        F.regexp_extract("line", r"(?i)^\s*crawl-delay\s*:\s*([0-9]+)", 1).alias(
            "delay_raw"
        ),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    sectioned = lines.withColumn(
        "section",
        F.last(
            F.when(F.col("ua_raw") != "", F.col("ua_raw")), ignorenulls=True
        ).over(w),
    )
    return (
        sectioned.where((F.col("section") == "*") & (F.col("delay_raw") != ""))
        .groupBy("host")
        .agg(F.min(F.col("delay_raw").cast("long")).alias("delay_sec"))
    )


def crawl_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    *,
    host_col: str = "host",
    order_col: str = "rank_nano",
    default_delay: int = 1,
) -> DataFrame:
    """Assign each budgeted frontier url a per-host fetch slot and start
    offset honoring Crawl-delay: slot i of a host fetches at
    (i - 1) * delay_sec seconds — the last planning step between "frontier"
    and "fetch fleet".

    CONTRACT: ``frontier`` is the BUDGETED set (the output of
    ``politeness_topk``), so the per-host row_number window partitions are
    bounded at k rows by construction — this is what makes the single
    window safe where the raw frontier would need the two-phase salt. The
    delay join is per-host-bounded on the rules side and keyed on host (the
    frontier's existing partitioning), pinned shuffle_hash — at 1e8 hosts
    the delay table must never broadcast.

    Output: (host, url, rank, slot, fetch_offset_sec).
    """
    from pyspark.sql import Window

    d = delays.select(
        F.col("host").alias("_dhost"), F.col("delay_sec").alias("_delay")
    )
    joined = frontier.join(
        d.hint("shuffle_hash"), F.col(host_col) == F.col("_dhost"), "left"
    )
    w = Window.partitionBy(host_col).orderBy(F.col(order_col).desc(), F.col("url"))
    return (
        joined.withColumn("slot", F.row_number().over(w))
        .select(
            F.col(host_col).alias("host"),
            "url",
            F.col(order_col).alias("rank"),
            F.col("slot").cast("long").alias("slot"),
            (
                (F.col("slot") - 1)
                * F.coalesce(F.col("_delay"), F.lit(default_delay))
            ).cast("long").alias("fetch_offset_sec"),
        )
    )


# HTML void elements: no closing tag, no depth contribution (HTML5 spec set,
# the subset that appears in crawl templates)
VOID_TAGS: tuple[str, ...] = (
    "meta", "br", "img", "hr", "input", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
)


def dom_stats(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Per-page DOM structure statistics — the tag-ratio / nesting signals
    main-content heuristics run before extraction (north rule "DOM
    heuristics"; reference analogue: the region/density pre-filters of
    region_segmentation_service):

    - n_tags / n_close / n_void: tag census
    - max_depth: maximum element nesting depth, computed by ONE fold over
      the tag array with the (depth, max) pair packed into a single bigint
      (depth in the high bits, max in the low 20) — both engines state the
      identical integer fold; unmatched closes clamp at depth 0
    - n_links / n_scripts: boilerplate indicators
    - text_markup_ratio: chars surviving tag-strip / total chars — the
      text-density score (low ratio = chrome-heavy page)

    Pure codegen: decode + regexp_extract_all + one F.aggregate fold, no
    shuffle, no UDF — at 100 TB this is a scan-speed pre-filter whose
    verdict column prunes pages before the (expensive) Arrow extract stage.
    """
    s = F.decode(F.col(html_col), "UTF-8")
    tags = F.regexp_extract_all(s, F.lit("<[^>]+>"), 0)
    name = lambda t: F.lower(F.regexp_extract(t, "^</?([a-zA-Z0-9]+)", 1))  # noqa: E731
    void_lits = F.array(*[F.lit(v) for v in VOID_TAGS])
    is_close = lambda t: t.startswith("</")  # noqa: E731
    is_void = lambda t: F.array_contains(void_lits, name(t))  # noqa: E731
    enc = F.aggregate(
        tags,
        F.lit(0).cast("long"),
        lambda acc, t: F.when(
            is_close(t),
            F.greatest(F.floor(acc / 1048576) - 1, F.lit(0)) * 1048576
            + acc % 1048576,
        )
        .when(is_void(t), acc)
        .otherwise(
            (F.floor(acc / 1048576) + 1) * 1048576
            + F.greatest(acc % 1048576, F.floor(acc / 1048576) + 1)
        ),
    )
    stripped = F.regexp_replace(s, "<[^>]+>", "")
    n_chars = F.length(s)
    return pages.select(
        F.col(url_col).alias("url"),
        F.size(tags).cast("long").alias("n_tags"),
        F.size(F.filter(tags, is_close)).cast("long").alias("n_close"),
        F.size(F.filter(tags, is_void)).cast("long").alias("n_void"),
        (enc % 1048576).cast("long").alias("max_depth"),
        F.size(
            F.filter(tags, lambda t: (name(t) == "a") & ~is_close(t))
        ).cast("long").alias("n_links"),
        F.size(
            F.filter(tags, lambda t: (name(t) == "script") & ~is_close(t))
        ).cast("long").alias("n_scripts"),
        F.round(
            F.when(
                n_chars > 0, F.length(stripped) / n_chars.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("text_markup_ratio"),
    )


def parse_robots_directives(
    robots: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Both Allow and Disallow prefixes for the ``User-agent: *`` group ->
    (host, rule, prefix) with rule in {'allow','disallow'} — the full-
    precedence input ``robots_precedence_filter`` consumes (closes the
    documented Allow-precedence scope limit of ``parse_robots_rules``).
    Section assignment is the same last(ua) window."""
    from pyspark.sql import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), r"\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(
            F.trim(F.regexp_extract("line", r"(?i)^\s*user-agent\s*:\s*(\S+)", 1))
        ).alias("ua_raw"),
        F.trim(F.regexp_extract("line", r"(?i)^\s*disallow\s*:\s*(\S+)", 1)).alias(
            "dis_raw"
        ),
        F.trim(F.regexp_extract("line", r"(?i)^\s*allow\s*:\s*(\S+)", 1)).alias(
            "alw_raw"
        ),
    )
    w = Window.partitionBy("host").orderBy("line_no")
    sectioned = lines.withColumn(
        "section",
        F.last(
            F.when(F.col("ua_raw") != "", F.col("ua_raw")), ignorenulls=True
        ).over(w),
    ).where(F.col("section") == "*")
    dis = sectioned.where(F.col("dis_raw") != "").select(
        "host", F.lit("disallow").alias("rule"), F.col("dis_raw").alias("prefix")
    )
    alw = sectioned.where(F.col("alw_raw") != "").select(
        "host", F.lit("allow").alias("rule"), F.col("alw_raw").alias("prefix")
    )
    return dis.unionByName(alw).distinct()


def robots_precedence_filter(
    frontier: DataFrame,
    directives: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """RFC 9309 rule precedence: among the group's rules whose prefix
    matches the url path, the LONGEST prefix wins; on equal length Allow
    wins over Disallow; no matching rule means allowed. Output: every
    frontier row + (verdict, rule_prefix) — verdict in
    {'allow','disallow','none'}, rule_prefix NULL for 'none'.

    Determinism + scale shape: matches are found by ONE host-keyed join
    (per-host rule sets are KB-sized, but 1e8 hosts make the table
    corpus-scale — shuffle_hash, never broadcast) with the startswith as
    the post-probe predicate; the winner is a map-side-combined
    groupBy(url) argmax over the string encoding lpad(len,4) || rule-tag
    || prefix ('b' tags allow, 'a' disallow, so lexicographic max = longer
    prefix first, allow on ties — and the trailing prefix disambiguates
    equal-length same-type rules deterministically). LEFT join keeps
    unmatched urls as 'none'.
    """
    path = F.regexp_extract(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    f = frontier.withColumn("_path", F.when(path == "", F.lit("/")).otherwise(path))
    d = directives.select(
        F.col("host").alias("_rhost"), "rule", "prefix"
    )
    matched = f.join(
        d.hint("shuffle_hash"),
        (F.col(host_col) == F.col("_rhost"))
        & F.col("_path").startswith(F.col("prefix")),
        "left",
    )
    enc = F.when(
        F.col("prefix").isNotNull(),
        F.concat(
            F.lpad(F.length("prefix").cast("string"), 4, "0"),
            F.when(F.col("rule") == "allow", F.lit("b")).otherwise(F.lit("a")),
            F.col("prefix"),
        ),
    )
    base_cols = [c for c in frontier.columns]
    win = (
        matched.groupBy(*[F.col(c) for c in base_cols])
        .agg(F.max(enc).alias("_win"))
    )
    return win.select(
        *base_cols,
        F.when(F.col("_win").isNull(), F.lit("none"))
        .when(F.substring("_win", 5, 1) == "b", F.lit("allow"))
        .otherwise(F.lit("disallow"))
        .alias("verdict"),
        F.expr("substring(_win, 6)").alias("rule_prefix"),
    )


def resolve_redirects(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 32,
) -> DataFrame:
    """Resolve every URL through its redirect chain to the final landing
    URL: (url, final_url, hops, resolved). ``edges`` is one row per
    redirecting URL (src -> dst; src unique — a URL has ONE redirect
    target); ``nodes`` optionally supplies the full URL universe (isolated
    URLs resolve to themselves), else the universe is src ∪ dst.

    Spark-first iterative shape: POINTER DOUBLING — each round every URL
    jumps through the current pointer table (cur := cur-of-cur,
    hops := hops + hops-of-cur), so a chain of length L resolves in
    O(log L) rounds, not O(L). Web redirect chains are short (browsers cap
    ~20) but the corpus is huge: each round is ONE shuffle_hash self-join
    on (string,string,long) rows, nothing broadcast, ``localCheckpoint``
    truncates lineage per round (durable checkpoint on a cluster).
    Convergence = count of states whose cur is still a redirecting URL —
    a count, not a sum, so no overflow aliasing (ADVICE r2). Cycles
    (redirect loops) never resolve: after ``max_iters`` their rows come
    back with resolved=0 rather than looping forever.

    Reference analogue: document_merger_service.py's follow-the-chain page
    merging, recast as a web-graph fixpoint.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).persist()
    # edge endpoints ALWAYS join the universe: a redirect may land on a URL
    # outside the caller's node set, and that landing URL must exist as a
    # terminal state or its chain would silently drop in the inner join below
    universe = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    )
    if nodes is not None:
        universe = universe.unionByName(
            nodes.select(F.col(nodes.columns[0]).alias("node"))
        )
    universe = universe.distinct()
    state = (
        universe.join(e.hint("shuffle_hash"), universe.node == e.src, "left")
        .select(
            "node",
            F.coalesce("dst", F.col("node")).alias("cur"),
            F.when(F.col("dst").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hops"),
        )
        .localCheckpoint()
    )
    # terminal URLs = no outgoing redirect; cheap filter over the checkpoint
    terminals = state.where(F.col("hops") == 0).select(F.col("node").alias("t"))
    for _ in range(max_iters):
        unresolved = state.join(
            terminals, state.cur == terminals.t, "left_anti"
        ).count()
        if unresolved == 0:
            break
        lut = state.select(
            F.col("node").alias("j_node"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        state = (
            state.join(lut.hint("shuffle_hash"), state.cur == F.col("j_node"))
            .select(
                "node",
                F.col("j_cur").alias("cur"),
                (F.col("hops") + F.col("j_hops")).alias("hops"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return state.join(
        terminals.hint("shuffle_hash"), state.cur == terminals.t, "left"
    ).select(
        F.col("node").alias("url"),
        F.col("cur").alias("final_url"),
        "hops",
        F.col("t").isNotNull().cast("int").alias("resolved"),
    )


def text_density_blocks(
    pages: DataFrame,
    html_col: str = "html",
    *,
    density_threshold_micro: int = 20_000_000,
    link_density_threshold_micro: int = 333_333,
) -> DataFrame:
    """Boilerpipe-style main-content block classification (Kohlschütter et
    al., WSDM 2010): segment each page into block-level chunks, score every
    block by TEXT DENSITY (text chars per tag) and LINK DENSITY (anchor
    chars per text char), smooth the density over the two neighbor blocks,
    and flag content blocks — the heuristic core of boilerplate stripping.

    100 TB shape: the ENTIRE computation — segmentation, per-block counts,
    neighbor smoothing, classification — runs inside array higher-order
    functions on each page row (transform/zip_with over the blocks array),
    so there is NO shuffle anywhere: one scan, whole-stage codegen, then a
    single posexplode to emit block rows. The usual window-over-
    (url, block_idx) formulation would shuffle the whole corpus on url for
    a neighborhood that never leaves the row.

    All-integer scoring (float-portability): density_micro =
    floor(text_chars * 1e6 / (1 + tags)); smoothing = floor(sum/count) over
    the present neighbors. Block boundaries: nav|div|main|footer|p opening
    tags (the reference's layout-block segmentation,
    image_preprocessing_service.py row-band split, recast for HTML).

    Output: (url, block_idx, n_text_chars, n_tags, n_anchor_chars,
    density_micro, smoothed_micro, link_density_micro, is_content).
    """
    h = F.col(html_col)
    marked = F.regexp_replace(h, r"<(nav|div|main|footer|p)\b", "\x01<$1")
    blocks = F.filter(F.split(marked, "\x01"), lambda b: F.length(b) > 0)
    texts = F.transform(blocks, lambda b: F.regexp_replace(b, "<[^>]+>", ""))
    ntext = F.transform(texts, F.length)
    ntags = F.transform(blocks, lambda b: F.regexp_count(b, F.lit("<[^>]+>")))
    nanch = F.transform(
        blocks,
        lambda b: F.aggregate(
            F.regexp_extract_all(b, F.lit("<a[^>]*>([^<]*)</a>"), F.lit(1)),
            F.lit(0),
            lambda acc, x: acc + F.length(x),
        ),
    )
    dens = F.zip_with(
        ntext,
        ntags,
        lambda t, g: F.floor(t.cast("long") * 1000000 / (g + F.lit(1))),
    )
    n = F.size(dens)
    idx = F.sequence(F.lit(1), n)  # 1-based positions
    smoothed = F.transform(
        idx,
        lambda i: F.floor(
            (
                F.when(i > 1, F.element_at(dens, i - 1)).otherwise(F.lit(0))
                + F.element_at(dens, i)
                + F.when(i < n, F.element_at(dens, i + 1)).otherwise(F.lit(0))
            )
            / (
                (i > 1).cast("int") + F.lit(1) + (i < n).cast("int")
            )
        ),
    )
    zipped = F.arrays_zip(
        ntext.alias("n_text_chars"),
        ntags.alias("n_tags"),
        nanch.alias("n_anchor_chars"),
        dens.alias("density_micro"),
        smoothed.alias("smoothed_micro"),
    )
    ex = pages.select("url", F.posexplode(zipped).alias("block_idx", "b"))
    link_density = F.floor(
        F.col("b.n_anchor_chars").cast("long")
        * 1000000
        / (F.col("b.n_text_chars") + F.lit(1))
    )
    return ex.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.col("b.n_text_chars").cast("long").alias("n_text_chars"),
        F.col("b.n_tags").cast("long").alias("n_tags"),
        F.col("b.n_anchor_chars").cast("long").alias("n_anchor_chars"),
        F.col("b.density_micro").cast("long").alias("density_micro"),
        F.col("b.smoothed_micro").cast("long").alias("smoothed_micro"),
        link_density.cast("long").alias("link_density_micro"),
        (
            (F.col("b.smoothed_micro") > density_threshold_micro)
            & (link_density < link_density_threshold_micro)
        )
        .cast("int")
        .alias("is_content"),
    )


def parse_robots_sitemaps(
    robots: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` directive extraction from robots.txt -> (host,
    sitemap_url). Per RFC 9309 §2.3 the directive is GROUP-INDEPENDENT —
    it applies regardless of which User-agent section it appears inside,
    so this is one case-insensitive line-anchored regexp_extract_all +
    posexplode, no section window at all (contrast parse_robots_rules,
    where section assignment is the whole problem). Distinct per host:
    crawlers treat repeated declarations as one sitemap.
    """
    urls_arr = F.regexp_extract_all(
        F.col(robots_col), F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)"), 1
    )
    return (
        robots.select(
            F.col(host_col).alias("host"), F.explode(urls_arr).alias("sitemap_url")
        )
        .distinct()
    )


def url_depth_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host URL path-depth histogram -> (host, depth, n_pages): the
    crawl-budget signal (deep paths are calendars, faceted search and
    session-id traps; schedulers cap depth per host). Depth = number of
    non-empty path segments. One codegen expression + one map-side-combined
    groupBy onto the bounded (host, depth) key — scan-speed at any scale.
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    path = F.regexp_extract(url, _PATH_RE, 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda x: F.length(x) > 0))
    return (
        df.select(host.alias("host"), depth.alias("depth"))
        .groupBy("host", "depth")
        .agg(F.count("*").alias("n_pages"))
        .select("host", F.col("depth").cast("long").alias("depth"), "n_pages")
    )


def extract_headings(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Heading outline extraction -> (url, pos, level, heading): the
    document STRUCTURE signal structure-aware chunking wants (split on h2
    boundaries, prepend the h1 to every chunk) and a cheap title-quality
    check. Same two-stage shape as extract_anchor_texts: the group-0 match
    list is extracted ONCE at scan speed, level and inner text come from
    per-fragment extracts inside the posexplode — zero UDF, zero shuffle.
    Inner markup is stripped; whitespace collapsed.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    frags = F.regexp_extract_all(
        html_txt, F.lit(r"(?is)<h([1-6])[^>]*>.*?</h[1-6]>"), F.lit(0)
    )
    ex = df.select(
        F.col(url_col).alias("url"), F.posexplode(frags).alias("pos", "frag")
    )
    inner = F.regexp_extract(
        F.col("frag"), r"(?is)<h[1-6][^>]*>(.*?)</h[1-6]>", 1
    )
    text = F.trim(
        F.regexp_replace(F.regexp_replace(inner, "<[^>]+>", ""), r"\s+", " ")
    )
    return ex.select(
        "url",
        F.col("pos").cast("long").alias("pos"),
        F.regexp_extract(F.col("frag"), r"(?i)<h([1-6])", 1)
        .cast("int")
        .alias("level"),
        text.alias("heading"),
    )


def extract_html_tables(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """HTML table extraction -> (url, table_idx, row_idx, is_header,
    n_cells, cells): the web-native counterpart of the reference's OCR
    table-grid reconstruction (information_extraction_service.py row/cell
    clustering) — here the grid is declared by markup, so the whole parse
    is three nested regexp_extract_all levels (table -> tr -> td/th) with
    two posexplodes, all codegen, zero UDF/shuffle. Cell text is
    tag-stripped and whitespace-collapsed; ``cells`` joins with '|' (the
    oracle-stable scalar form of the row).
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    tables = F.regexp_extract_all(
        html_txt, F.lit(r"(?is)<table[^>]*>.*?</table>"), F.lit(0)
    )
    t = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(tables).alias("table_idx", "tbl"),
    )
    trs = F.regexp_extract_all(
        F.col("tbl"), F.lit(r"(?is)<tr[^>]*>.*?</tr>"), F.lit(0)
    )
    r = t.select(
        "url", "table_idx", F.posexplode(trs).alias("row_idx", "tr")
    )
    raw_cells = F.regexp_extract_all(
        F.col("tr"), F.lit(r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"), F.lit(1)
    )
    clean = F.transform(
        raw_cells,
        lambda c: F.trim(
            F.regexp_replace(F.regexp_replace(c, "<[^>]+>", ""), r"\s+", " ")
        ),
    )
    return r.select(
        "url",
        F.col("table_idx").cast("long").alias("table_idx"),
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("tr").rlike("(?is)<th[^>]*>").cast("int").alias("is_header"),
        F.size(clean).cast("long").alias("n_cells"),
        F.array_join(clean, "|").alias("cells"),
    )


def link_relations(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<link rel=... href=...>`` relation discovery -> (url, rel, href):
    rel=next/prev drives pagination-trap handling in the scheduler,
    rel=alternate surfaces RSS/Atom feeds worth seeding, rel=amphtml and
    rel=canonical mark duplicate variants. Two-stage fragment extract
    (group-0 once, attributes per fragment), rel lowercased; fragments
    missing either attribute are dropped. Zero UDF, zero shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    frags = F.regexp_extract_all(
        html_txt, F.lit(r"(?is)<link\b[^>]*>"), F.lit(0)
    )
    ex = df.select(
        F.col(url_col).alias("url"), F.posexplode(frags).alias("pos", "frag")
    )
    rel = F.lower(F.regexp_extract(F.col("frag"), r'(?i)rel="([^"]*)"', 1))
    href = F.regexp_extract(F.col("frag"), r'(?i)href="([^"]*)"', 1)
    return (
        ex.select(
            "url",
            F.col("pos").cast("long").alias("pos"),
            rel.alias("rel"),
            href.alias("href"),
        )
        .where((F.col("rel") != "") & (F.col("href") != ""))
    )


def meta_robots(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<meta name=robots>`` compliance flags -> (url, noindex, nofollow):
    a curation pipeline that honors publisher opt-outs must drop noindex
    pages from the corpus and nofollow pages from link-graph construction —
    the in-markup counterpart of robots.txt. Absent directive = (0, 0).
    One codegen extract per page, token-anchored so 'nonoindexing' cannot
    false-positive. Supported shape: name= before content= (the dominant
    order in the wild); attribute-order-reversed tags read as absent —
    extend the regex pair if a corpus needs them.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    content = F.lower(
        F.regexp_extract(
            html_txt,
            r'(?is)<meta\s+name="robots"\s+content="([^"]*)"',
            1,
        )
    )
    tok = lambda d: content.rlike(rf"(^|[,\s]){d}($|[,\s])")  # noqa: E731
    return df.select(
        F.col(url_col).alias("url"),
        (tok("noindex") | tok("none")).cast("int").alias("noindex"),
        (tok("nofollow") | tok("none")).cast("int").alias("nofollow"),
    )


# ---------------------------------------------------------------------------
# JSON-LD structured data (round 4)
# ---------------------------------------------------------------------------

_JSONLD_RE = r'<script type="application/ld\+json">([^<]*)</script>'


def extract_jsonld(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """schema.org JSON-LD blocks embedded in page HTML — the structured
    metadata channel news/product/article pipelines index (NewsPlease/
    CCNet-style enrichment; the reference's per-document metadata dict
    lifted to the web-embedded-JSON domain). One regexp_extract_all pulls
    every ``<script type="application/ld+json">`` payload, posexplode
    fans blocks out (a page can carry several), and ``from_json`` into
    ``map<string,string>`` parses each block JVM-side — malformed JSON
    becomes a NULL map, surfaced as ``parse_ok = 0`` instead of a task
    failure, per the codec-family error-isolation discipline. No UDF, no
    shuffle: blocks land at scan speed and only (url, html) are read.

    Output: (url, block_idx, parse_ok, jtype, name, n_keys) — one row per
    block; pages without JSON-LD produce no rows (join back to the page
    table for coverage censuses).
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    blocks = F.regexp_extract_all(html_txt, F.lit(_JSONLD_RE), 1)
    exploded = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(blocks).alias("block_idx", "raw"),
    )
    j = F.from_json(F.col("raw"), "map<string,string>")
    return exploded.select(
        "url",
        F.col("block_idx").cast("int").alias("block_idx"),
        j.isNotNull().cast("int").alias("parse_ok"),
        j.getItem("@type").alias("jtype"),
        j.getItem("name").alias("name"),
        F.when(j.isNotNull(), F.size(F.map_keys(j)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# hreflang alternate clusters (round 4)
# ---------------------------------------------------------------------------

_HREFLANG_RE = (
    r'(?i)<link rel="alternate" hreflang="([^"]*)" href="([^"]*)"[^>]*>'
)


def extract_hreflang(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<link rel=alternate hreflang=..>`` annotations -> (url, hreflang,
    target): the multilingual-variant channel a web-text curation pipeline
    uses to group translations of one page into a language cluster (keep
    one per cluster for dedup, or keep all with a cluster id for parallel-
    corpus mining). The reference's per-document language tag
    (SURVEY.md K9) lifted to the cross-document declaration domain.

    Same one-heavy-scan discipline as ``extract_anchor_texts``: group 0 of
    the tag regex is pulled once per page via ``regexp_extract_all``, the
    two attributes come from per-fragment ``regexp_extract`` over the short
    matches. Whole-stage codegen, one posexplode, no UDF, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(html_txt, F.lit(_HREFLANG_RE), 0)
        ).alias("pos", "frag"),
    )
    return ex.select(
        "url",
        F.lower(F.regexp_extract(F.col("frag"), _HREFLANG_RE, 1)).alias(
            "hreflang"
        ),
        F.regexp_extract(F.col("frag"), _HREFLANG_RE, 2).alias("target"),
    ).where(F.col("target") != "")


def hreflang_reciprocity(alts: DataFrame) -> DataFrame:
    """Per declared hreflang edge, whether the target page declares an
    alternate BACK to the source -> (url, hreflang, target, reciprocal).
    Google treats non-reciprocal hreflang annotations as invalid; a
    curation pipeline uses the confirmed subset to build translation
    clusters and the broken subset as a spam/misconfiguration signal.

    Shape at 100 TB: both sides of the confirmation join are the corpus-
    scale edge table itself, so neither may broadcast — the back-edge side
    is deduped to (url, target) with a map-side-combined aggregate, then
    equi-joined on the REVERSED key pair under a shuffle_hash hint
    (sort-merge acceptable, broadcast never). Self-referential alternates
    (url == target, the recommended practice) confirm themselves through
    the same join, no special case.
    """
    edges = alts.select("url", "hreflang", "target")
    back = (
        edges.select(F.col("url").alias("b_url"), F.col("target").alias("b_target"))
        .distinct()
        .hint("shuffle_hash")
    )
    joined = edges.join(
        back,
        (edges["target"] == back["b_url"]) & (edges["url"] == back["b_target"]),
        "left",
    )
    return joined.select(
        "url",
        "hreflang",
        "target",
        F.col("b_url").isNotNull().cast("int").alias("reciprocal"),
    )


# ---------------------------------------------------------------------------
# RSS / Atom feed parsing (round 4)
# ---------------------------------------------------------------------------

_RSS_ITEM_RE = r"(?is)<item>(.*?)</item>"
_ATOM_ENTRY_RE = r"(?is)<entry>(.*?)</entry>"
_RFC822_STRIP_RE = r"(?i)^\s*[a-z]{3},\s*|\s*(GMT|UT|[+-]\d{4})\s*$"


def parse_feed_entries(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """RSS 2.0 ``<item>`` / Atom ``<entry>`` parsing -> one row per feed
    entry: (feed_url, kind, entry_idx, title, link, guid, pub_epoch).
    Feeds are the freshness channel of a crawl scheduler — parsed entry
    timestamps drive recrawl priority (see ``recrawl_priority``) and entry
    links seed the frontier. Reference analogue: the reference ingests
    documents one POST at a time (app/api/routes.py); a web-scale pipeline
    discovers them from feeds.

    Both entry kinds are extracted with one page-sized scan each
    (``regexp_extract_all`` group 1), fanned out with posexplode, and the
    per-entry fields come from short-fragment ``regexp_extract`` — all
    whole-stage codegen, no UDF, no shuffle. RSS ``pubDate`` (RFC 822) is
    normalized by stripping the weekday prefix and zone suffix, then
    parsed with ``try_to_timestamp(..., 'dd MMM yyyy HH:mm:ss')`` (NULL on
    failure even under ANSI mode); Atom
    ``<updated>`` parses as ISO-8601 Zulu. Unparseable dates become NULL
    ``pub_epoch`` (error-column isolation, never a task failure).
    Timezone note: zone suffixes are stripped, not applied — a production
    corpus wanting zone-exact epochs would map the suffix to an offset
    column first; entries here are synthesized GMT.
    """
    xml_txt = F.decode(F.col(xml_col), "UTF-8")
    base = df.select(F.col(url_col).alias("feed_url"), xml_txt.alias("_xml"))

    def _fan(pattern: str, kind: str) -> DataFrame:
        return base.select(
            "feed_url",
            F.lit(kind).alias("kind"),
            F.posexplode(
                F.regexp_extract_all(F.col("_xml"), F.lit(pattern), 1)
            ).alias("entry_idx", "body"),
        )

    rss = _fan(_RSS_ITEM_RE, "rss")
    body = F.col("body")
    rss_date = F.regexp_replace(
        F.regexp_extract(body, r"(?is)<pubDate>([^<]*)</pubDate>", 1),
        _RFC822_STRIP_RE,
        "",
    )
    rss_out = rss.select(
        "feed_url",
        "kind",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        F.regexp_extract(body, r"(?is)<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(body, r"(?is)<link>([^<]*)</link>", 1).alias("link"),
        F.regexp_extract(body, r"(?is)<guid>([^<]*)</guid>", 1).alias("guid"),
        F.try_to_timestamp(rss_date, F.lit("dd MMM yyyy HH:mm:ss"))
        .cast("long")
        .alias("pub_epoch"),
    )

    atom = _fan(_ATOM_ENTRY_RE, "atom")
    atom_out = atom.select(
        "feed_url",
        "kind",
        F.col("entry_idx").cast("int").alias("entry_idx"),
        F.regexp_extract(body, r"(?is)<title>([^<]*)</title>", 1).alias("title"),
        F.regexp_extract(body, r'(?is)<link href="([^"]*)"', 1).alias("link"),
        F.regexp_extract(body, r"(?is)<id>([^<]*)</id>", 1).alias("guid"),
        F.try_to_timestamp(
            F.regexp_extract(body, r"(?is)<updated>([^<]*)</updated>", 1),
            F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"),
        )
        .cast("long")
        .alias("pub_epoch"),
    )
    return rss_out.unionByName(atom_out)


# ---------------------------------------------------------------------------
# soft-404 detection (round 4)
# ---------------------------------------------------------------------------

_TITLE_RE = r"(?is)<title[^>]*>([^<]*)</title>"
_NOTFOUND_RE = (
    r"(404|not found|no longer (exists|available)|"
    r"page (does not exist|unavailable|has been removed)|"
    r"nothing (was )?found)"
)


def soft404(
    pages: DataFrame,
    html_col: str = "html",
    status_col: str = "status_code",
    thin_tokens: int = 30,
) -> DataFrame:
    """Soft-404 detection — pages served with HTTP 200 whose CONTENT says
    "not found". Servers that return error pages under a success status
    are endemic on the open web; an archive that trusts the status code
    ingests millions of identical "Page Not Found" boilerplate documents
    (which then dominate near-dup clusters and poison LM training data),
    so curation flags them content-side. Reference analogue: the
    validation layer that rejects non-document uploads before OCR
    (/root/reference/app/utils/validation.py:19-31) — same gate, crawl
    side.

    Heuristic (precision-first, the production shape used by crawl QA):
      - ``title_404``: the <title> matches a not-found phrase battery —
        the strongest signal, flags regardless of body length;
      - ``body_404`` AND ``thin``: the not-found phrase appears in the
        first 200 chars of tag-stripped text AND the page has fewer than
        ``thin_tokens`` tokens. A long article that merely *mentions*
        "not found" deep in its body is NOT flagged.
    ``soft404`` fires only when the HTTP status is 200 — a true 404 is
    correctly labeled and needs no rescue.

    Output: (*, title, n_tokens, title_404, body_404, thin, soft404).
    One codegen projection over the scan — no UDF, no shuffle; at crawl
    scale this annotates at read speed and the flag joins the curation
    funnel as a plain filter column.
    """
    h = F.col(html_col)
    title = F.trim(F.regexp_extract(h, _TITLE_RE, 1))
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace(h, r"(?s)<[^>]*>", " "), r"\s+", " ")
    )
    n_tokens = F.when(stripped == "", F.lit(0)).otherwise(
        F.size(F.split(stripped, " "))
    )
    title_404 = F.lower(title).rlike(_NOTFOUND_RE)
    body_404 = F.lower(stripped.substr(F.lit(1), F.lit(200))).rlike(
        _NOTFOUND_RE
    )
    thin = n_tokens < F.lit(thin_tokens)
    return pages.withColumns(
        {
            "title": title,
            "n_tokens": n_tokens.cast("long"),
            "title_404": title_404.cast("int"),
            "body_404": body_404.cast("int"),
            "thin": thin.cast("int"),
            "soft404": (
                (F.col(status_col) == 200) & (title_404 | (body_404 & thin))
            ).cast("int"),
        }
    )


# ---------------------------------------------------------------------------
# paywall / login-wall detection (round 4)
# ---------------------------------------------------------------------------

_PASSWORD_INPUT_RE = r'(?is)<input[^>]*type\s*=\s*["\x27]?password'
_PAYWALL_PHRASE_RE = (
    r"(subscribe (now )?to (continue|read)|sign in to (read|continue)|"
    r"create a free account|subscribers? only|"
    r"register to (read|continue)|this (article|content) is for "
    r"(members|subscribers))"
)
_JSONLD_GATED_RE = r'(?i)"isAccessibleForFree"\s*:\s*(false|"false")'


def paywall_detect(
    pages: DataFrame, html_col: str = "html", text_col: str | None = None
) -> DataFrame:
    """Paywall / login-wall detection — gated pages carry only teaser
    text plus subscription boilerplate, so ingesting them pollutes a
    training corpus with millions of near-identical CTA fragments while
    the "document" the URL promises is absent. The curation funnel drops
    (or down-weights) gated captures the same way it drops soft-404s.

    Three independent signals, strongest first:
      - ``jsonld_gated``: schema.org's explicit machine-readable marker
        ``isAccessibleForFree: false`` (the standard publishers actually
        emit for Google's paywall policy);
      - ``has_password_input``: a ``<input type=password>`` form — the
        page is a login wall;
      - ``paywall_phrase``: a CTA phrase battery over the tag-stripped
        text ("subscribe to continue", "sign in to read", ...).
    ``gated`` = any of the three. Phrase matching runs on stripped text
    so markup can't split a phrase, and attribute matching runs on raw
    markup so text can't spoof a form. One codegen projection, no UDF,
    no shuffle.
    """
    h = F.col(html_col)
    stripped = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(h, r"(?s)<[^>]*>", " "), r"\s+", " "
            )
        )
    )
    has_pw = h.rlike(_PASSWORD_INPUT_RE)
    phrase = stripped.rlike(_PAYWALL_PHRASE_RE)
    jsonld = h.rlike(_JSONLD_GATED_RE)
    return pages.withColumns(
        {
            "has_password_input": has_pw.cast("int"),
            "paywall_phrase": phrase.cast("int"),
            "jsonld_gated": jsonld.cast("int"),
            "gated": (has_pw | phrase | jsonld).cast("int"),
        }
    )


# ---------------------------------------------------------------------------
# HTML -> Markdown conversion (round 4)
# ---------------------------------------------------------------------------


def _md_chain(col: Column) -> Column:
    """The shared replacement chain: every pattern is RE2-compatible (no
    backreferences — script/style/b/strong/em/i each get their own pass)
    so the DuckDB oracle can restate it verbatim, differing only in group
    syntax ($N Java / \\N RE2). Tag names are delimited by ``(\\s[^>]*)?>``
    so <pre> never matches the p-pass nor <br> the b-pass — content is
    therefore capture group 2."""
    x = col
    # drop non-content subtrees first so their text never leaks
    for tag in ("script", "style", "head"):
        x = F.regexp_replace(x, rf"(?is)<{tag}(\s[^>]*)?>.*?</{tag}>", " ")
    # headings -> atx
    for n in range(1, 7):
        x = F.regexp_replace(
            x,
            rf"(?is)<h{n}(\s[^>]*)?>(.*?)</h{n}>",
            "\n\n" + "#" * n + " $2\n\n",
        )
    # links BEFORE inline styling so anchor text keeps its later passes
    x = F.regexp_replace(
        x, r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>', "[$2]($1)"
    )
    # <br> BEFORE <b> so a stray un-closed bold can never swallow breaks
    x = F.regexp_replace(x, r"(?i)<br(\s[^>]*)?/?>", "\n")
    for tag in ("b", "strong"):
        x = F.regexp_replace(
            x, rf"(?is)<{tag}(\s[^>]*)?>(.*?)</{tag}>", "**$2**"
        )
    for tag in ("i", "em"):
        x = F.regexp_replace(
            x, rf"(?is)<{tag}(\s[^>]*)?>(.*?)</{tag}>", "*$2*"
        )
    x = F.regexp_replace(x, r"(?is)<li(\s[^>]*)?>(.*?)</li>", "\n- $2")
    x = F.regexp_replace(x, r"(?i)</?(p|div)(\s[^>]*)?>", "\n\n")
    # strip everything else, then normalize whitespace
    x = F.regexp_replace(x, r"(?s)<[^>]*>", " ")
    x = F.regexp_replace(x, r"[ \t]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n{3,}", "\n\n")
    return F.regexp_replace(x, r"^\s+|\s+$", "")


def html_to_markdown(
    pages: DataFrame, html_col: str = "html"
) -> DataFrame:
    """HTML -> Markdown conversion — the structure-preserving export an
    LLM training pipeline runs INSTEAD of flat text extraction when
    headings/lists/emphasis carry signal (instruction data, docs
    corpora). Reference analogue: the text-assembly stage
    (/root/reference/app/services/ocr_service.py:112-141) emits reading-
    order plain text; this emits the same content with document
    structure kept as markdown syntax.

    Deliberately grammar-light: a fixed chain of RE2-portable tag
    rewrites (headings -> atx #, <a href> -> [text](url), b/strong ->
    **, i/em -> *, li -> '- ', p/div/br -> paragraph breaks), then a
    strip-and-normalize pass. Nested same-tag structures degrade
    gracefully rather than parse (non-greedy match to the FIRST closer)
    — the documented trade for staying whole-stage codegen: one
    projection at scan speed, no UDF, no shuffle, vs the DOM walk a
    Pandas-UDF converter would need. Adds ``markdown``.
    """
    return pages.withColumn("markdown", _md_chain(F.col(html_col)))


# ---------------------------------------------------------------------------
# IP range lookup via bucketed range join (round 4)
# ---------------------------------------------------------------------------


def ip_range_lookup(
    ips: DataFrame,
    ranges: DataFrame,
    *,
    ip_col: str = "ip",
    start_col: str = "start_ip",
    end_col: str = "end_ip",
    bucket_bits: int = 16,
) -> DataFrame:
    """Range join without the range-join trap: annotate each row's IPv4
    (as uint32-in-long) with the covering range's columns (GeoIP /
    ASN / datacenter-blocklist lookup — the standard enrichment a crawl
    pipeline runs per capture). A naive ``ip BETWEEN start AND end``
    join has no equi-key, so Spark plans BroadcastNestedLoopJoin —
    O(rows x ranges) and a scale killer when the range table outgrows a
    broadcast (full GeoIP is millions of rows).

    The scale shape: each range EXPLODES to the ``2^bucket_bits``-wide
    buckets it covers (real-world ranges are narrow — a few buckets
    each, so the expansion is ~O(|ranges|)), each ip keys by its bucket,
    and the join is a plain shuffled EQUI-join on the bucket followed by
    the residual between-filter. Both sides hash-distribute; nothing
    broadcasts; skew is bounded by bucket width. LEFT join: unmatched
    ips keep NULL range columns (the "no match" signal is data, not
    absence).
    """
    b = 32 - bucket_bits
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col(start_col), b),
                F.shiftright(F.col(end_col), b),
            )
        ),
    )
    keyed = ips.withColumn("_bucket", F.shiftright(F.col(ip_col), b))
    out = keyed.join(
        r.hint("shuffle_hash"),
        on=(
            (keyed["_bucket"] == r["_bucket"])
            & (F.col(ip_col) >= F.col(start_col))
            & (F.col(ip_col) <= F.col(end_col))
        ),
        how="left",
    )
    return out.drop("_bucket")


_URL_DATE_RE = r"/(\d{4})/(\d{2})/(\d{2})/"
_META_DATE_RE = (
    r'<meta property="article:published_time" content="(\d{4}-\d{2}-\d{2})'
)


def publish_dates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Publish-date extraction — the freshness signal a web corpus needs for
    recency sampling, dedup tie-breaking (keep the newest capture), and
    time-sliced training mixes. Two extractors with the crawler-standard
    precedence: the page's own ``article:published_time`` meta tag wins
    over the ``/YYYY/MM/DD/`` URL-path convention (the meta tag is
    author-set; the path date is a publishing-platform artifact).

    Output per page: ``url_date`` / ``meta_date`` (yyyy-MM-dd strings, NULL
    when absent), ``publish_date`` (the precedence winner), ``date_source``
    ('meta' | 'url' | NULL), and ``epoch_day`` (days since 1970-01-01 of
    the winner — the integer a downstream range-partition or freshness
    decay keys on).

    Scale: two regexp_extracts and a date parse per row — one codegen
    projection over the scan, no exchange; at 100 TB this annotates at
    read speed and the regex never touches the (dropped) payload again.
    """
    u = F.col(url_col)
    h = F.col(html_col)
    url_date = F.when(
        F.regexp_extract(u, _URL_DATE_RE, 1) != "",
        F.concat_ws(
            "-",
            F.regexp_extract(u, _URL_DATE_RE, 1),
            F.regexp_extract(u, _URL_DATE_RE, 2),
            F.regexp_extract(u, _URL_DATE_RE, 3),
        ),
    )
    meta_date = F.when(
        F.regexp_extract(h, _META_DATE_RE, 1) != "",
        F.regexp_extract(h, _META_DATE_RE, 1),
    )
    publish = F.coalesce(meta_date, url_date)
    return pages.select(
        u.alias("url"),
        url_date.alias("url_date"),
        meta_date.alias("meta_date"),
        publish.alias("publish_date"),
        F.when(meta_date.isNotNull(), F.lit("meta"))
        .when(url_date.isNotNull(), F.lit("url"))
        .alias("date_source"),
        F.datediff(F.to_date(publish), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
    )


def extract_microdata(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """schema.org MICRODATA items (``itemscope``/``itemtype``/
    ``itemprop`` attributes) — the attribute-embedded sibling of
    ``extract_jsonld``'s script-block channel; older e-commerce and
    recipe pages carry structured data only this way, so a metadata
    pipeline needs both.

    Flat-scope lite parse, stated contract: the html splits on
    ``itemscope`` and each following segment owns the ``itemtype`` and
    every ``itemprop=`` up to the next ``itemscope`` — NESTED items
    attribute their props to the inner scope and are not re-attached to
    ancestors (full DOM scoping needs a tree; the per-item counts and
    types this emits are what coverage censuses consume). Everything is
    split + regexp at scan speed — no UDF, no shuffle, html read once.

    Output: (url, item_idx, itemtype, n_props) — one row per itemscope;
    pages without microdata produce no rows.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    segs = F.split(html_txt, "itemscope")
    exploded = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(segs).alias("seg_idx", "seg"),
    ).where(F.col("seg_idx") > 0)
    return exploded.select(
        "url",
        (F.col("seg_idx") - 1).cast("int").alias("item_idx"),
        F.regexp_extract(F.col("seg"), r'^[^>]*itemtype="([^"]*)"', 1).alias(
            "itemtype"
        ),
        F.size(F.regexp_extract_all(F.col("seg"), F.lit("(itemprop=)"), 1))
        .cast("int")
        .alias("n_props"),
    )


# ---------------------------------------------------------------------------
# URL template mining / crawler-trap detection (round 4, session 11)
# ---------------------------------------------------------------------------


def url_templates(
    df: DataFrame,
    url_col: str = "url",
    *,
    min_urls: int = 3,
    share_ppm_threshold: int = 500000,
) -> DataFrame:
    """Per-host URL-path template census — the crawler-trap detector:
    calendar pages, session-id paths, and faceted-search grids all
    generate unbounded URL families that collapse to ONE template once
    digit runs and long hex runs are abstracted. A template holding
    more than ``share_ppm_threshold`` of a host's URLs (with at least
    ``min_urls`` members) is flagged; the frontier scheduler caps those
    families instead of crawling them to exhaustion.

    Template = path with every digit run replaced by ``{d}`` and every
    8+-char hex run by ``{x}`` (hex first, so hex runs never decay into
    digit fragments); empty paths normalize to ``/``.

    Scale shape: template derivation is pure codegen regexp over the
    scan (no UDF); the census is one map-side-combined
    groupBy(host, template) followed by a window-free share join — the
    per-host total comes from a second tiny groupBy joined back
    shuffle_hash (hosts are ~1e8 at web scale: never broadcast, never a
    per-host sort window).

    Output: (host, template, n_urls, host_urls, share_ppm, trap).
    All-integer; deterministic.
    """
    host = F.lower(F.regexp_extract(F.col(url_col), _AUTH_RE, 1))
    raw_path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    tpl = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "{x}"), r"[0-9]+", "{d}"
    )
    census = (
        df.select(host.alias("host"), tpl.alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )
    totals = census.groupBy("host").agg(
        F.sum("n_urls").alias("host_urls")
    )
    return (
        census.join(totals.hint("shuffle_hash"), "host")
        .select(
            "host",
            "template",
            F.col("n_urls").cast("long"),
            F.col("host_urls").cast("long"),
            F.floor(F.col("n_urls") * 1000000 / F.col("host_urls"))
            .cast("long")
            .alias("share_ppm"),
        )
        .withColumn(
            "trap",
            (
                (F.col("share_ppm") >= share_ppm_threshold)
                & (F.col("n_urls") >= min_urls)
            )
            .cast("int")
            .cast("long"),
        )
    )


def robots_drift(
    rules_a: DataFrame,
    rules_b: DataFrame,
    *,
    host_col: str = "host",
    prefix_col: str = "prefix",
) -> DataFrame:
    """Per-host robots-policy drift between two crawl snapshots: which
    hosts added or dropped Disallow rules since the last fetch — the
    re-crawl trigger for politeness state (a host that just disallowed
    a tree must have those URLs retired from the frontier; one that
    opened up gets re-seeded). Input: two (host, prefix) rule sets from
    ``parse_robots_rules`` over the A and B robots corpora.

    Scale shape: ONE full-outer shuffle_hash equi-join on (host, prefix)
    classifies every rule as kept/added/removed, then a map-side-combined
    per-host rollup — both sides are rule tables (bounded by hosts x
    rule-list length), nothing is broadcast, no window.

    Output: (host, rules_a, rules_b, added, removed, changed).
    """
    a = rules_a.select(
        F.col(host_col).alias("host"),
        F.col(prefix_col).alias("prefix"),
        F.lit(1).alias("_in_a"),
    )
    b = rules_b.select(
        F.col(host_col).alias("host"),
        F.col(prefix_col).alias("prefix"),
        F.lit(1).alias("_in_b"),
    )
    merged = a.join(b.hint("shuffle_hash"), ["host", "prefix"], "full_outer")
    return (
        merged.groupBy("host")
        .agg(
            F.sum(F.coalesce("_in_a", F.lit(0))).cast("long").alias("rules_a"),
            F.sum(F.coalesce("_in_b", F.lit(0))).cast("long").alias("rules_b"),
            F.sum(
                F.when(
                    F.col("_in_a").isNull() & F.col("_in_b").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("added"),
            F.sum(
                F.when(
                    F.col("_in_a").isNotNull() & F.col("_in_b").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("removed"),
        )
        .withColumn(
            "changed",
            ((F.col("added") + F.col("removed")) > 0).cast("int").cast("long"),
        )
    )


def robots_wildcard_filter(
    frontier: DataFrame,
    rules: DataFrame,
    *,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """RFC 9309 §2.2.3 WILDCARD rule matching — the part of the robots
    grammar ``robots_precedence_filter``'s prefix rules don't cover:
    ``*`` spans any octet run, a trailing ``$`` anchors the match to the
    path end (``/*.json$`` retires every JSON endpoint; mid-pattern
    ``$`` is literal). Precedence follows the RFC: longest PATTERN wins,
    Allow beats Disallow on equal length, no match means allowed.

    Pattern→regex translation happens as THREE codegen regexp_replace
    passes (escape regex metachars, lift ``*`` to ``.*``, re-anchor a
    trailing ``$``) — never a UDF — and both the translation and the
    per-row ``regexp_like`` are restatable in RE2 for the oracle (the
    emitted regexes use only ``^``, escaped literals, ``.*``, ``$`` —
    the Java/RE2 common subset).

    Scale shape: ONE host-keyed equi-join (shuffle_hash — 1e8 hosts'
    rule table is corpus-scale, never broadcast) with the regex as the
    post-probe predicate (candidates per row bounded by the host's
    rule-list length), then a map-side-combined groupBy(host, path)
    argmax over the string encoding lpad(len,4) || tag || pattern
    ('b' allow > 'a' disallow ties, trailing pattern disambiguates).

    Output: every frontier row + (verdict, rule_pattern) — verdict in
    {'allow','disallow','none'}; rule_pattern NULL for 'none'.
    """
    esc = F.regexp_replace(
        F.col("pattern"), "([.\\+?(){}\\[\\]|^$\\\\])", "\\\\$1"
    )
    star = F.regexp_replace(esc, "\\*", ".*")
    anchored = F.col("pattern").endswith("$")
    r = (
        rules.select(
            F.col(host_col).alias("host"),
            F.col("rule"),
            F.col("pattern"),
            star.alias("_rw_star"),
        )
        .withColumn(
            "_rw_rx",
            F.concat(
                F.lit("^"),
                F.when(
                    anchored,
                    F.concat(
                        F.expr(
                            "substring(_rw_star, 1, length(_rw_star) - 2)"
                        ),
                        F.lit("$"),
                    ),
                ).otherwise(F.col("_rw_star")),
            ),
        )
        .withColumn(
            "_rw_enc",
            F.concat(
                F.lpad(F.length("pattern").cast("string"), 4, "0"),
                F.when(F.col("rule") == "allow", F.lit("b")).otherwise(
                    F.lit("a")
                ),
                F.col("pattern"),
            ),
        )
    )
    fr = frontier.select(
        F.col(host_col).alias("host"), F.col(path_col).alias("path")
    )
    hits = (
        fr.join(r.hint("shuffle_hash"), "host")
        .where(F.expr("regexp_like(path, _rw_rx)"))
        .groupBy("host", "path")
        .agg(F.max("_rw_enc").alias("_rw_win"))
    )
    return (
        fr.join(hits.hint("shuffle_hash"), ["host", "path"], "left")
        .select(
            "host",
            "path",
            F.when(F.col("_rw_win").isNull(), F.lit("none"))
            .when(F.substring("_rw_win", 5, 1) == "b", F.lit("allow"))
            .otherwise(F.lit("disallow"))
            .alias("verdict"),
            F.expr("substring(_rw_win, 6)").alias("rule_pattern"),
        )
    )


def link_locality(pages: DataFrame) -> DataFrame:
    """First-party vs third-party outlink ratio per host — the
    template/navigation-heaviness gauge (a host whose pages link only
    to themselves is a silo or a template farm; one that is mostly
    external is a link directory or spam hub), and the input a crawl
    scheduler uses to predict frontier growth per host.

    A link counts as internal when its resolved target host equals the
    page host, or when it stayed relative after resolution (same-page
    by construction). Pure codegen over ``extract_links``'s edge list.

    Scale shape: the corpus is touched once by the link extraction
    scan; the census is ONE map-side-combined groupBy(host) of
    conditional sums over short keys (href strings are dropped in the
    projection before the exchange).

    Output: (host, n_links, n_internal, n_external, locality_micro)
    ordered by host.
    """
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
    links = extract_links(pages)
    src = F.lower(F.regexp_extract("url", host_re, 1))
    dst = F.lower(F.regexp_extract("resolved", host_re, 1))
    internal = ((dst == src) | (dst == "")).cast("long")
    flagged = links.select(src.alias("host"), internal.alias("i"))
    agg = flagged.groupBy("host").agg(
        F.count("*").cast("long").alias("n_links"),
        F.sum("i").cast("long").alias("n_internal"),
    )
    return agg.select(
        "host",
        "n_links",
        "n_internal",
        (F.col("n_links") - F.col("n_internal"))
        .cast("long")
        .alias("n_external"),
        F.expr("(n_internal * 1000000) div n_links")
        .cast("long")
        .alias("locality_micro"),
    ).orderBy("host")


def title_dup_census(pages: DataFrame, *, min_hosts: int = 2) -> DataFrame:
    """Cross-host duplicated <title> census — the template-farm /
    mirror detector at the title level (the cheapest cross-host
    near-dup signal there is: one short string per page, no shingles):
    titles that appear on ≥ min_hosts distinct hosts, with page and
    host counts.

    Scale shape: title and host are extracted in the scan projection
    (html is dropped immediately); the census is groupBy(title, host)
    then groupBy(title) — both map-side-combined on short keys, the
    exact-distinct-hosts count coming from the first aggregate's
    output rather than a count(distinct) over raw pages.

    Output: (title, n_pages, n_hosts) for titles on >= min_hosts
    hosts, ordered by n_pages desc, title.
    """
    host_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)"
    title = F.trim(
        F.regexp_extract(F.col("html"), r"(?is)<title>([^<]*)</title>", 1)
    )
    th = pages.select(
        title.alias("title"),
        F.lower(F.regexp_extract("url", host_re, 1)).alias("host"),
    ).where(F.col("title") != "")
    per_host = th.groupBy("title", "host").agg(
        F.count("*").cast("long").alias("n")
    )
    census = per_host.groupBy("title").agg(
        F.sum("n").cast("long").alias("n_pages"),
        F.count("*").cast("long").alias("n_hosts"),
    )
    return census.where(F.col("n_hosts") >= min_hosts).orderBy(
        F.desc("n_pages"), F.asc("title")
    )


def revalidation_plan(headers: DataFrame) -> DataFrame:
    """Recrawl transfer planning from cached HTTP response headers — the
    bandwidth side of polite recrawl (RFC 9111 semantics): a page whose
    cached response carried a validator can be refetched with a
    conditional request (``If-None-Match`` beats ``If-Modified-Since``
    when both are present), costing ~0 bytes on a 304; ``no-store``
    responses and validator-less pages need a full fetch. At 10^12 pages
    the split decides the recrawl's egress budget.

    Input columns: (host, etag, last_modified, cache_control,
    content_length). Output per (host, plan): n_urls and total_bytes (the
    payload bytes this plan would re-transfer in the WORST case — full
    body for full_fetch, full body again for conditionals whose content
    changed; the census is the planner's upper bound per strategy).

    Scale shape: one whole-stage-codegen projection (three-way CASE) into
    one map-side-combined groupBy on the bounded (host, plan) key. No
    join, no window, nothing collected.
    """
    plan = (
        F.when(
            F.coalesce(F.col("cache_control"), F.lit("")).contains(
                "no-store"
            ),
            F.lit("full_fetch"),
        )
        .when(F.col("etag").isNotNull(), F.lit("conditional_etag"))
        .when(
            F.col("last_modified").isNotNull(),
            F.lit("conditional_modified"),
        )
        .otherwise(F.lit("full_fetch"))
    )
    return (
        headers.select(F.col("host"), plan.alias("plan"), "content_length")
        .groupBy("host", "plan")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.sum("content_length").cast("long").alias("total_bytes"),
        )
    )


def pagination_extract(
    pages: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Multi-page article detection: parse the ``Page N of M`` marker a
    paginated article prints, the primitive behind stitching split
    documents back together before dedup/training (a 10-part article is
    ten near-dup boilerplate shells around one logical document).
    Pages without a marker report NULLs — absence is data, not an error.

    Scale shape: two regexp_extract + a nullif/cast battery in one
    codegen projection; no shuffle. The stitcher downstream groups on
    (series key, total_pages) — this operator deliberately stays
    row-level so that grouping key stays the caller's choice.

    Output: (doc_id, page_no, total_pages, is_last).
    """
    c = F.col(text_col)
    pno = F.nullif(
        F.regexp_extract(c, r"Page ([0-9]+) of ([0-9]+)", 1), F.lit("")
    ).cast("long")
    tot = F.nullif(
        F.regexp_extract(c, r"Page ([0-9]+) of ([0-9]+)", 2), F.lit("")
    ).cast("long")
    return pages.select(
        "doc_id",
        pno.alias("page_no"),
        tot.alias("total_pages"),
        F.when(pno.isNotNull(), pno == tot).alias("is_last"),
    )


def breadcrumb_census(
    pages: DataFrame, crumb_col: str = "breadcrumb"
) -> DataFrame:
    """Site-taxonomy census from breadcrumb trails (``Home > Section >
    ... > Leaf``): per (top section, trail depth) page counts — the
    structural map that tells a crawler which sections are deep archives
    worth budgeting and which are flat landing shells.

    Scale shape: split + size in one codegen projection, then one
    map-side-combined groupBy on the bounded (section x depth) key.
    Trails without the ``Home > `` prefix are skipped (census of
    well-formed trails only, stated).

    Output: (section, depth, n_pages).
    """
    parts = F.split(F.col(crumb_col), " > ")
    return (
        pages.where(parts.getItem(0) == "Home")
        .select(
            parts.getItem(1).alias("section"),
            F.size(parts).cast("long").alias("depth"),
        )
        .groupBy("section", "depth")
        .agg(F.count("*").cast("long").alias("n_pages"))
    )


def page_series_gaps(
    parsed: DataFrame, series_col: str = "series"
) -> DataFrame:
    """Completeness audit over paginated-article series: given
    ``pagination_extract`` rows plus a series key, report per series how
    many member pages were actually captured vs the declared total — the
    recrawl worklist for stitching split articles (an incomplete series
    cannot be reassembled and its fragments pollute dedup as boilerplate
    shells).

    Scale shape: one map-side-combined groupBy on the series key;
    count_distinct(page_no) ignores markerless members (NULL page_no) on
    both engines, and a series with no parsed marker at all reports NULL
    totals — absence is data.

    Output: (series, total_pages, n_found, n_missing, complete).
    """
    g = parsed.groupBy(F.col(series_col).alias("series")).agg(
        F.max("total_pages").cast("long").alias("total_pages"),
        F.count_distinct("page_no").cast("long").alias("n_found"),
    )
    return g.select(
        "series",
        "total_pages",
        "n_found",
        (F.col("total_pages") - F.col("n_found"))
        .cast("long")
        .alias("n_missing"),
        (F.col("n_found") == F.col("total_pages")).alias("complete"),
    )


def canonical_pick(
    candidates: DataFrame,
    *,
    group_col: str = "group_key",
    url_col: str = "url",
) -> DataFrame:
    """Representative-URL election per duplicate-content family — the
    policy half of URL canonicalization (normalization alone leaves one
    content hash with many distinct URLs; SOMETHING must pick the one to
    keep): prefer https over http, then the shortest URL, then
    lexicographic — encoded as ONE sortable string key
    (scheme-rank char + zero-padded length + url) so the election is a
    plain ``min`` aggregate, mergeable and map-side-combined, never a
    window over the corpus.

    Output: (group_key, canonical_url, n_members).
    """
    u = F.col(url_col)
    key = F.concat(
        F.when(u.startswith("https://"), F.lit("0")).otherwise(F.lit("1")),
        F.lpad(F.length(u).cast("string"), 6, "0"),
        u,
    )
    return (
        candidates.select(F.col(group_col), key.alias("_cp_key"))
        .groupBy(group_col)
        .agg(
            F.min("_cp_key").alias("_cp_min"),
            F.count("*").cast("long").alias("n_members"),
        )
        .select(
            group_col,
            F.expr("substring(_cp_min, 8)").alias("canonical_url"),
            "n_members",
        )
    )


def stitch_series(
    pages: DataFrame,
    *,
    series_col: str = "series",
    text_col: str = "text",
) -> DataFrame:
    """Reassemble paginated articles — the capstone of the pagination
    family (``pagination_extract`` parses, ``page_series_gaps`` audits,
    this stitches): concatenate a COMPLETE series' member texts in page
    order into the one logical document that should enter dedup/training
    instead of its N boilerplate-shelled fragments. Incomplete series are
    dropped (stitching a gapped article corrupts it — they stay on the
    recrawl worklist).

    Scale shape: ONE series-keyed shuffle; ``collect_list`` is safe
    because series size is bounded by the declared page count (<= the
    pagination cap a crawler enforces), and the in-row
    sort_array/transform/array_join keeps ordering and concatenation out
    of any window. Completeness = member count equals the declared
    total.

    Output: (series, stitched_text, n_pages).
    """
    rows = pages.where(F.col("page_no").isNotNull())
    g = rows.groupBy(F.col(series_col).alias("series")).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("page_no"), F.col(text_col)))
        ).alias("_st_ps"),
        F.max("total_pages").cast("long").alias("n_pages"),
        F.count("*").alias("_st_n"),
    )
    stitched = F.array_join(
        F.transform(F.col("_st_ps"), lambda x: x[text_col]), " "
    )
    return g.where(F.col("_st_n") == F.col("n_pages")).select(
        "series", stitched.alias("stitched_text"), "n_pages"
    )


# ---------------------------------------------------------------------------
# embedded data URIs + meta-refresh + combined opt-out (round 4, session 18)
# ---------------------------------------------------------------------------

_DATA_URI_RE = r"data:([a-zA-Z0-9/+.\-]+);base64,([A-Za-z0-9+/=]+)"


def extract_data_uris(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Inline ``data:<mime>;base64,...`` payload extraction -> (url,
    uri_pos, mime, payload_octets, payload_md5): pages increasingly inline
    small images/fonts instead of linking them, and a multimodal curation
    pipeline must surface those payloads for the SAME decode/dedup path as
    fetched media (multimodal.image_decode et al. take the decoded bytes
    directly).

    Stays entirely in codegen: two positionally-zipped regexp_extract_all
    passes (mime, b64) + one posexplode + JVM-side ``unbase64`` — the
    base64 decode never leaves whole-stage codegen, so a page with a
    megabyte of inlined images decodes at scan speed with no Python. The
    md5 is over the lowercase hex of the decoded octets (the portable
    spelling shared with the WARC digests).
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    mimes = F.regexp_extract_all(html_txt, F.lit(_DATA_URI_RE), 1)
    b64s = F.regexp_extract_all(html_txt, F.lit(_DATA_URI_RE), 2)
    ex = df.select(
        url.alias("url"),
        F.posexplode(F.arrays_zip(mimes.alias("m"), b64s.alias("b"))).alias(
            "uri_pos", "mb"
        ),
    )
    decoded = F.unbase64(F.col("mb.b"))
    return ex.select(
        "url",
        F.col("uri_pos").cast("long").alias("uri_pos"),
        F.col("mb.m").alias("mime"),
        F.octet_length(decoded).cast("long").alias("payload_octets"),
        F.md5(F.lower(F.hex(decoded))).alias("payload_md5"),
    )


_META_REFRESH_RE = (
    r'(?is)<meta\s+http-equiv="refresh"\s+content="(\d+)\s*;\s*url=([^"]*)"'
)


def meta_refresh(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """``<meta http-equiv=refresh>`` redirect extraction -> (url,
    delay_sec, target, resolved): the in-markup redirect layer that HTTP
    status codes never see — soft redirects (delay 0) must join the
    redirect graph (urls.resolve_redirects) or dedup counts the stub page
    as content, and delayed refreshes are a spam/parked-domain signal
    (url_spam_scores' cousin). Pages without the tag emit delay_sec NULL.
    Root- and protocol-relative targets resolve against the page's own
    scheme://host exactly like extract_links. One codegen extract per
    page, no UDF, no shuffle.
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    delay_s = F.regexp_extract(html_txt, _META_REFRESH_RE, 1)
    target = F.regexp_extract(html_txt, _META_REFRESH_RE, 2)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    resolved = (
        F.when(target == "", F.lit(None).cast("string"))
        .when(target.startswith("//"), F.concat(scheme, F.lit(":"), target))
        .when(
            target.startswith("/"),
            F.concat(scheme, F.lit("://"), host, target),
        )
        .otherwise(target)
    )
    return df.select(
        url.alias("url"),
        F.when(delay_s != "", delay_s.cast("long")).alias("delay_sec"),
        F.when(target != "", target).alias("target"),
        resolved.alias("resolved"),
    )


def optout_resolution(flags: DataFrame) -> DataFrame:
    """Combined publisher-opt-out verdict per capture — the curation
    capstone over the three opt-out surfaces this repo parses separately:
    robots.txt (urls.parse_robots_rules / robots_precedence_filter,
    crawl-side), the X-Robots-Tag response header (warc.parse_x_robots,
    protocol-side), and ``<meta name=robots>`` (urls.meta_robots,
    markup-side).

    Input: (url, robots_disallowed, header_noindex, meta_noindex) 0/1
    flags. Precedence mirrors how the surfaces compose in the wild: a
    robots.txt disallow means the capture should never have been fetched
    (strongest — and when it applies, header/meta were never legitimately
    observed); else a header noindex outranks markup (it arrives before
    any parse and covers non-HTML); else meta noindex; else kept. Output
    adds (keep, optout_reason) — reason NULL on kept rows. Pure codegen
    CASE, no shuffle; at corpus scale this is the final filter before the
    training-set sink, so it must (and does) run at scan speed.
    """
    keep = (
        (F.col("robots_disallowed") == 0)
        & (F.col("header_noindex") == 0)
        & (F.col("meta_noindex") == 0)
    )
    reason = (
        F.when(F.col("robots_disallowed") == 1, F.lit("robots.txt"))
        .when(F.col("header_noindex") == 1, F.lit("x-robots-tag"))
        .when(F.col("meta_noindex") == 1, F.lit("meta-robots"))
    )
    return flags.select(
        "url",
        "robots_disallowed",
        "header_noindex",
        "meta_noindex",
        keep.cast("int").alias("keep"),
        reason.alias("optout_reason"),
    )


# ---------------------------------------------------------------------------
# IDN hosts + srcset + OpenGraph + charset sniff (round 4, session 18)
# ---------------------------------------------------------------------------


def idn_decode_hosts(df: DataFrame, host_col: str = "host") -> DataFrame:
    """Internationalized-domain-name decode -> (host, unicode_host,
    is_idn, ok): hosts whose labels carry the ``xn--`` ACE prefix decode
    through stdlib punycode (RFC 3492 via the ``idna`` codec) so host-level
    keys (dedup, politeness, registrable-domain rollups) can unify the
    ASCII and display forms — ``xn--mnchen-3ya.example`` and
    ``münchen.example`` are the SAME host and must not split crawl budget.

    Punycode's adaptive-bias integer decode is sequential per label — no
    codegen expression exists — so this is one Arrow-batched mapInPandas
    with per-row error isolation (``ok=0``, NULL unicode_host on a
    malformed ACE label: the wild is full of fake ``xn--`` spam labels).
    ASCII hosts pass through (is_idn=0, unicode_host = host).
    """
    from collections.abc import Iterator as _It

    import pandas as _pd
    from pyspark.sql.types import (
        IntegerType as _I,
        StringType as _S,
        StructField as _F,
        StructType as _T,
    )

    sel = df.select(F.col(host_col).alias("host"))

    def kernel(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "host": [], "unicode_host": [], "is_idn": [], "ok": []
            }
            for host in pdf["host"]:
                out["host"].append(host)
                if host is None:
                    out["unicode_host"].append(None)
                    out["is_idn"].append(None)
                    out["ok"].append(0)
                    continue
                is_idn = int(
                    any(lb.startswith("xn--") for lb in host.split("."))
                )
                out["is_idn"].append(is_idn)
                if not is_idn:
                    out["unicode_host"].append(host)
                    out["ok"].append(1)
                    continue
                try:
                    uni = host.encode("ascii").decode("idna")
                except (UnicodeError, UnicodeDecodeError):
                    out["unicode_host"].append(None)
                    out["ok"].append(0)
                    continue
                out["unicode_host"].append(uni)
                out["ok"].append(1)
            yield _pd.DataFrame(out)

    schema = _T(
        [
            _F("host", _S()),
            _F("unicode_host", _S()),
            _F("is_idn", _I()),
            _F("ok", _I()),
        ]
    )
    return sel.mapInPandas(kernel, schema)


_SRCSET_RE = r'(?i)srcset\s*=\s*"([^"]*)"'


def parse_srcset(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Responsive-image candidate extraction -> (url, set_pos,
    candidate_pos, candidate_url, descriptor): an image-harvesting
    pipeline that reads only ``src`` misses the high-resolution variants
    entirely (the 2x/wide candidates are often the only usable training
    asset). One regexp pass per page + two posexplodes (attribute -> comma
    candidates); descriptor is NULL when the candidate omits it (the spec
    default 1x is the CALLER's policy, same contract as absent charset).
    All codegen, no UDF; empty candidates (trailing commas) are dropped.
    """
    url = F.col(url_col)
    html_txt = F.decode(F.col(html_col), "UTF-8")
    sets = F.regexp_extract_all(html_txt, F.lit(_SRCSET_RE), 1)
    ex = df.select(
        url.alias("url"), F.posexplode(sets).alias("set_pos", "val")
    )
    cands = F.transform(F.split(F.col("val"), ","), lambda c: F.trim(c))
    ex2 = ex.select(
        "url",
        "set_pos",
        F.posexplode(cands).alias("candidate_pos", "cand"),
    ).where(F.col("cand") != "")
    desc = F.regexp_extract("cand", r"\s+(\S+)$", 1)
    return ex2.select(
        "url",
        F.col("set_pos").cast("long").alias("set_pos"),
        F.col("candidate_pos").cast("long").alias("candidate_pos"),
        F.regexp_extract("cand", r"^(\S+)", 1).alias("candidate_url"),
        F.when(desc != "", desc).alias("descriptor"),
    )


_OG_RES = {
    "og_title": r'<meta property="og:title" content="([^"]*)"',
    "og_type": r'<meta property="og:type" content="([^"]*)"',
    "og_image": r'<meta property="og:image" content="([^"]*)"',
    "og_url": r'<meta property="og:url" content="([^"]*)"',
    "twitter_card": r'<meta name="twitter:card" content="([^"]*)"',
}


def opengraph_meta(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """OpenGraph / Twitter-card metadata -> (url, og_title, og_type,
    og_image, og_url, twitter_card): the structured article-metadata layer
    social crawlers read — og:title/og:image are routinely CLEANER than
    <title>/first-img for article corpora (no site-name suffixes, no nav
    icons), og:url is one more canonical-election signal beside
    link rel=canonical, og:image feeds the multimodal harvest. Five
    regexp_extract calls over ONE decode, extract_html_metadata's exact
    shape; absent fields are NULL. All codegen, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    cols = [
        F.nullif(F.regexp_extract(html_txt, pat, 1), F.lit("")).alias(name)
        for name, pat in _OG_RES.items()
    ]
    return df.select(F.col(url_col).alias("url"), *cols)


_META_CHARSET_SNIFF_RE = r'(?i)<meta charset="([^"]*)"'


def charset_sniff(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "payload",
    ctype_col: str = "content_type",
) -> DataFrame:
    """Charset resolution census -> (url, bom, header_charset,
    meta_charset, effective): the decode-dispatch decision
    (kernels.decode_html owns the fallback EXECUTION; this operator makes
    the decision itself auditable corpus-wide). Precedence follows the
    WHATWG encoding sniff: a byte-order mark is authoritative over the
    HTTP header, which outranks in-markup <meta charset> (the page can't
    describe its own encoding reliably — the meta tag is only readable if
    the ASCII-compatible guess already worked).

    BOM detection reads the payload's first octets through the latin-1
    bijection (startswith on the 2-3 BOM bytes); header/meta are one
    regexp each. All codegen, no UDF, no shuffle — the census runs at
    scan speed next to the decode itself.
    """
    lat = F.decode(F.col(payload_col), "ISO-8859-1")
    bom = (
        F.when(lat.startswith("\xef\xbb\xbf"), F.lit("utf-8"))
        .when(lat.startswith("\xff\xfe"), F.lit("utf-16le"))
        .when(lat.startswith("\xfe\xff"), F.lit("utf-16be"))
    )
    hdr = F.lower(
        F.regexp_extract(F.col(ctype_col), r"(?i);\s*charset=([^;\s]+)", 1)
    )
    meta = F.lower(F.regexp_extract(lat, _META_CHARSET_SNIFF_RE, 1))
    header_charset = F.when(hdr != "", hdr)
    meta_charset = F.when(meta != "", meta)
    return df.select(
        F.col(url_col).alias("url"),
        bom.alias("bom"),
        header_charset.alias("header_charset"),
        meta_charset.alias("meta_charset"),
        F.coalesce(bom, header_charset, meta_charset).alias("effective"),
    )


# ---------------------------------------------------------------------------
# AMP <-> canonical variant election (round 4, session 18)
# ---------------------------------------------------------------------------

_HTML_TAG_RE = r"(?is)<html\b[^>]*>"
_AMP_ATTR_RE = r'(?i)[\s"\'](amp|⚡)([\s=>/]|$)'
_REL_CANONICAL_RE = (
    r'(?is)<link\b[^>]*rel="canonical"[^>]*href="([^"]*)"[^>]*>'
)
_REL_AMPHTML_RE = r'(?is)<link\b[^>]*rel="amphtml"[^>]*href="([^"]*)"[^>]*>'


def amp_canonical_pairs(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """AMP-variant election -> (canonical_url, amp_url, claimed_by_amp,
    claimed_by_canonical, bidirectional, keep_url): AMP pages are
    near-exact duplicates of their canonical article served from a
    second URL (often a different host, e.g. the AMP cache), so a
    curation pipeline that doesn't collapse the pair double-counts the
    article AND pollutes near-dup stats with a systematic variant
    family. The pairing is claimed from both sides — the AMP page's
    ``<html amp>``/``<html ⚡>`` marker plus its rel=canonical link, and
    the canonical page's rel=amphtml link — and only the BIDIRECTIONAL
    claim is election-grade (one-sided rel=canonical is a classic spam
    vector: anyone can claim any canonical). ``keep_url`` elects the
    canonical for bidirectional pairs and stays NULL otherwise (the
    caller decides what to do with unconfirmed claims).

    Scale shape: two codegen scans over the corpus (no UDF), then ONE
    equi-join on the (canonical_url, amp_url) pair key. Both sides are
    corpus-sized and pre-filtered to pages that actually carry the
    links, so the join is pinned shuffle_hash — never broadcast (the
    crawl_frontier lesson). Full outer keeps one-sided claims visible.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    html_tag = F.regexp_extract(html_txt, _HTML_TAG_RE, 0)
    is_amp = html_tag.rlike(_AMP_ATTR_RE)
    canonical_href = F.regexp_extract(html_txt, _REL_CANONICAL_RE, 1)
    amphtml_href = F.regexp_extract(html_txt, _REL_AMPHTML_RE, 1)

    amp_side = (
        df.select(
            F.col(url_col).alias("amp_url"),
            F.when(is_amp, canonical_href).alias("canonical_url"),
        )
        .where(F.col("canonical_url").isNotNull() & (F.col("canonical_url") != ""))
        .withColumn("claimed_by_amp", F.lit(1))
    )
    canon_side = (
        df.select(
            F.col(url_col).alias("canonical_url"),
            F.when(~is_amp, amphtml_href).alias("amp_url"),
        )
        .where(F.col("amp_url").isNotNull() & (F.col("amp_url") != ""))
        .withColumn("claimed_by_canonical", F.lit(1))
    )
    paired = amp_side.join(
        canon_side.hint("shuffle_hash"),
        ["canonical_url", "amp_url"],
        "full_outer",
    )
    both = (
        F.col("claimed_by_amp").isNotNull()
        & F.col("claimed_by_canonical").isNotNull()
    )
    return paired.select(
        "canonical_url",
        "amp_url",
        F.coalesce("claimed_by_amp", F.lit(0)).alias("claimed_by_amp"),
        F.coalesce("claimed_by_canonical", F.lit(0)).alias(
            "claimed_by_canonical"
        ),
        both.cast("int").alias("bidirectional"),
        F.when(both, F.col("canonical_url")).alias("keep_url"),
    )


# ---------------------------------------------------------------------------
# License detection + FAQ pair mining (round 4, session 18)
# ---------------------------------------------------------------------------

_CC_URL_RE = (
    r"(?i)creativecommons\.org/(?:licenses/([a-z][a-z-]*[a-z])/(\d\.\d)"
    r"|(publicdomain)/zero/(\d\.\d))"
)
_REL_LICENSE_RE = r'(?is)<link\b[^>]*rel="license"[^>]*href="([^"]*)"'
_A_REL_LICENSE_RE = r'(?is)<a\b[^>]*rel="license"[^>]*href="([^"]*)"'


def license_detect(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Creative-Commons license detection -> (url, license, version,
    via_rel_license, commercial_ok, derivatives_ok): the compliance gate
    a training-data pipeline runs before admitting a page into a
    redistributable corpus — CC-BY/CC-BY-SA/CC0 pages are the openly
    licensable slice of the crawl, NC/ND variants constrain use, and an
    unmarked page is all-rights-reserved by default (license NULL).

    Detection is URL-anchored (the canonical creativecommons.org license
    URL, in a ``rel="license"`` link/anchor or anywhere in the markup),
    never keyword-based — prose ABOUT licenses ("this is not CC-BY")
    cannot false-positive. First match wins (pages legitimately carry
    one license). ``commercial_ok``/``derivatives_ok`` decode the code's
    NC/ND modules; CC0 is public domain (both 1). Three codegen
    extracts over one decode, no UDF, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    rel_href = F.coalesce(
        F.nullif(F.regexp_extract(html_txt, _REL_LICENSE_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(html_txt, _A_REL_LICENSE_RE, 1), F.lit("")),
    )
    code_any = F.lower(F.regexp_extract(html_txt, _CC_URL_RE, 1))
    ver_any = F.regexp_extract(html_txt, _CC_URL_RE, 2)
    zero_any = F.regexp_extract(html_txt, _CC_URL_RE, 3)
    zero_ver = F.regexp_extract(html_txt, _CC_URL_RE, 4)
    license_ = F.when(zero_any != "", F.lit("cc0")).when(
        code_any != "", F.concat(F.lit("cc-"), code_any)
    )
    version = F.when(zero_any != "", zero_ver).when(code_any != "", ver_any)
    via_rel = (
        rel_href.isNotNull() & rel_href.rlike(r"(?i)creativecommons\.org/")
    ).cast("int")
    nc = license_.contains("-nc")
    nd = license_.contains("-nd")
    return df.select(
        F.col(url_col).alias("url"),
        license_.alias("license"),
        version.alias("version"),
        F.when(license_.isNotNull(), via_rel).otherwise(F.lit(0)).alias(
            "via_rel_license"
        ),
        F.when(license_.isNotNull(), (~nc).cast("int")).alias("commercial_ok"),
        F.when(license_.isNotNull(), (~nd).cast("int")).alias("derivatives_ok"),
    )


_FAQ_FRAG_RE = r"(?is)<h([23])[^>]*>[^<]*\?\s*</h\1>\s*<p[^>]*>[^<]*</p>"


def faq_pairs(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """FAQ question/answer mining -> (url, pair_idx, question, answer):
    instruction-tuning data hiding in plain markup — a heading that ends
    with '?' followed immediately by a paragraph is a (prompt, response)
    pair at web scale (the structural sibling of schema.org FAQPage,
    which ``jsonld_extract`` covers on the metadata side).

    Two-stage fragment extract (the link_relations idiom): group-0
    fragments once — the heading level is back-referenced so an
    <h2>…</h3> mismatch can't pair — then question/answer per fragment;
    both are whitespace-collapsed and trimmed. Headings without a
    trailing '?' or without an adjacent <p> yield nothing. All codegen,
    no UDF, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    frags = F.regexp_extract_all(html_txt, F.lit(_FAQ_FRAG_RE), 0)
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(frags).alias("pair_idx", "frag"),
    )
    clean = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    q = F.regexp_extract(F.col("frag"), r"(?is)<h[23][^>]*>([^<]*\?)\s*</h", 1)
    a = F.regexp_extract(F.col("frag"), r"(?is)<p[^>]*>([^<]*)</p>", 1)
    return ex.select(
        "url",
        F.col("pair_idx").cast("long").alias("pair_idx"),
        clean(q).alias("question"),
        clean(a).alias("answer"),
    )


_FORM_TAG_RE = r"(?is)<form\b[^>]*>"
_INPUT_TAG_RE = r"(?is)<input\b[^>]*>"


def form_census(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Form census -> (url, n_forms, n_inputs, has_password, has_search,
    has_upload, n_post_forms): page-TYPE classification from form
    structure — a password input marks a login/paywall shell whose text
    is navigation chrome (exclude from the corpus), a search input marks
    SERP-like pages (dedup magnets), an upload input marks app UIs, and
    POST forms mark interactive endpoints the crawler shouldn't re-fetch
    as content. Two regexp_extract_all passes (form tags, input tags) +
    per-fragment attribute probes folded with exists(); all codegen, no
    UDF, no shuffle — the census runs at scan speed.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    forms = F.regexp_extract_all(html_txt, F.lit(_FORM_TAG_RE), 0)
    inputs = F.regexp_extract_all(html_txt, F.lit(_INPUT_TAG_RE), 0)
    typed = lambda t: F.exists(  # noqa: E731
        inputs, lambda i: i.rlike(rf'(?i)type="{t}"')
    ).cast("int")
    n_post = F.size(
        F.filter(forms, lambda f: f.rlike(r'(?i)method="post"'))
    )
    return df.select(
        F.col(url_col).alias("url"),
        F.size(forms).cast("long").alias("n_forms"),
        F.size(inputs).cast("long").alias("n_inputs"),
        typed("password").alias("has_password"),
        (
            F.exists(inputs, lambda i: i.rlike(r'(?i)type="search"'))
            | F.exists(inputs, lambda i: i.rlike(r'(?i)name="q"'))
        ).cast("int").alias("has_search"),
        typed("file").alias("has_upload"),
        n_post.cast("long").alias("n_post_forms"),
    )


_PRE_FRAG_RE = r"(?is)<pre\b[^>]*>.*?</pre>"
_PRE_INNER_RE = r"(?is)<pre\b[^>]*>(?:\s*<code[^>]*>)?(.*?)(?:</code>\s*)?</pre>"
_CODE_LANG_RE = r'(?i)<code[^>]*class="(?:language|lang)-([\w+#.-]+)"'


def extract_code_blocks(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Code-block mining -> (url, block_idx, lang_hint, code, n_lines):
    ``<pre>``/``<pre><code>`` blocks are the code-LM training slice of a
    web crawl, and the ``language-*`` class (the highlight.js/Prism
    convention markdown renderers emit) is free language labeling.
    Unlike prose extraction, interior whitespace is PRESERVED —
    indentation is signal — only outer blank lines trim; the one-level
    entity unescape (&amp;lt; -> <, amp last) undoes the escaping HTML
    requires of code. One fragment extract_all + posexplode + per-
    fragment extracts; all codegen, no UDF, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    frags = F.regexp_extract_all(html_txt, F.lit(_PRE_FRAG_RE), 0)
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(frags).alias("block_idx", "frag"),
    )
    code = F.regexp_extract(F.col("frag"), _PRE_INNER_RE, 1)
    for ent, chr_ in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        code = F.replace(code, F.lit(ent), F.lit(chr_))
    code = F.regexp_replace(code, r"^\n+|\n+$", "")
    return ex.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        F.nullif(
            F.regexp_extract(F.col("frag"), _CODE_LANG_RE, 1), F.lit("")
        ).alias("lang_hint"),
        code.alias("code"),
        F.size(F.split(code, "\n", -1)).cast("long").alias("n_lines"),
    )


_MATH_FRAG_RE = (
    r"(?s)\$\$.*?\$\$|\\\[.*?\\\]|(?is)<math\b[^>]*>.*?</math>"
)


def extract_math_blocks(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Display-math mining -> (url, block_idx, notation, math, n_chars):
    the math-LM training slice — ``$$...$$`` and ``\\[...\\]`` LaTeX
    display blocks plus ``<math>`` MathML elements, each fragment tagged
    with its notation so downstream normalizers dispatch correctly.
    Delimiters are stripped (MathML keeps inner markup — it IS the
    notation); interior whitespace collapses to single spaces (math
    layout, unlike code indentation, is whitespace-insensitive). One
    alternation extract_all + posexplode + per-fragment strips; all
    codegen, no UDF, no shuffle."""
    html_txt = F.decode(F.col(html_col), "UTF-8")
    frags = F.regexp_extract_all(html_txt, F.lit(_MATH_FRAG_RE), 0)
    ex = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(frags).alias("block_idx", "frag"),
    )
    fr = F.col("frag")
    notation = (
        F.when(fr.startswith("$$"), F.lit("latex"))
        .when(fr.startswith("\\["), F.lit("latex"))
        .otherwise(F.lit("mathml"))
    )
    inner = (
        F.when(fr.startswith("$$"), F.expr("substring(frag, 3, length(frag) - 4)"))
        .when(fr.startswith("\\["), F.expr("substring(frag, 3, length(frag) - 4)"))
        .otherwise(F.regexp_extract(fr, r"(?is)<math\b[^>]*>(.*?)</math>", 1))
    )
    math = F.trim(F.regexp_replace(inner, r"\s+", " "))
    return ex.select(
        "url",
        F.col("block_idx").cast("long").alias("block_idx"),
        notation.alias("notation"),
        math.alias("math"),
        F.length(math).cast("long").alias("n_chars"),
    ).where(math != "")


def harvest_image_candidates(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Fused single-scan image-candidate harvest -> (url, candidate, via,
    prio): all four image sources — captioned <img src> (non-empty alt,
    extract_image_alt_pairs' contract), srcset candidates, og:image,
    inline base64 data-URIs (keyed data:<mime>:<md5-of-octets>) — mined
    from ONE decode of the payload, as parallel array expressions
    concatenated and exploded once. Semantically identical to running
    the four standalone parsers (their unit oracles pin each), but the
    corpus payload is touched ONCE — at 100 TB the standalone
    composition reads the full html column four times; this is the
    production shape. Root/protocol-relative targets resolve against
    the page's own scheme://host exactly like extract_image_alt_pairs.
    Priorities (og 1 > img 2 > srcset 3 > data 4) feed the downstream
    min_by election. All codegen, no UDF, no join, no shuffle.
    """
    base = df.select(
        F.col(url_col).alias("_u"),
        F.decode(F.col(html_col), "UTF-8").alias("_txt"),
    )
    html_txt = F.col("_txt")
    scheme = F.lower(F.regexp_extract(F.col("_u"), _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(F.col("_u"), _AUTH_RE, 1))

    def resolve(c):
        return (
            F.when(c.startswith("//"), F.concat(scheme, F.lit(":"), c))
            .when(c.startswith("/"), F.concat(scheme, F.lit("://"), host, c))
            .otherwise(c)
        )

    def cands(arr, via: str, prio: int):
        return F.filter(
            F.transform(
                arr,
                lambda c: F.struct(
                    c.alias("candidate"),
                    F.lit(via).alias("via"),
                    F.lit(prio).alias("prio"),
                ),
            ),
            lambda s: s["candidate"].isNotNull() & (s["candidate"] != ""),
        )

    img_tags = F.regexp_extract_all(html_txt, F.lit(_IMG_TAG_RE), 0)
    img_urls = F.transform(
        img_tags,
        lambda t: F.when(
            (F.trim(F.regexp_extract(t, _IMG_ALT_RE, 1)) != "")
            & ~F.regexp_extract(t, _IMG_SRC_RE, 1).startswith("data:"),
            resolve(F.regexp_extract(t, _IMG_SRC_RE, 1)),
        ),
    )
    srcset_urls = F.flatten(
        F.transform(
            F.regexp_extract_all(html_txt, F.lit(_SRCSET_RE), 1),
            lambda s: F.transform(
                F.split(s, ","),
                lambda c: F.when(
                    F.trim(c) != "",
                    resolve(F.regexp_extract(F.trim(c), r"^(\S+)", 1)),
                ),
            ),
        )
    )
    og_urls = F.array(
        F.nullif(F.regexp_extract(html_txt, _OG_RES["og_image"], 1), F.lit(""))
    )
    data_keys = F.zip_with(
        F.regexp_extract_all(html_txt, F.lit(_DATA_URI_RE), 1),
        F.regexp_extract_all(html_txt, F.lit(_DATA_URI_RE), 2),
        lambda m, b: F.concat(
            F.lit("data:"), m, F.lit(":"), F.md5(F.lower(F.hex(F.unbase64(b))))
        ),
    )
    all_cands = F.concat(
        cands(F.transform(og_urls, resolve), "og", 1),
        cands(img_urls, "img", 2),
        cands(srcset_urls, "srcset", 3),
        cands(data_keys, "data", 4),
    )
    return base.select(
        F.col("_u").alias("url"), F.explode(all_cands).alias("c")
    ).select("url", "c.candidate", "c.via", "c.prio")


_SCRIPT_SRC_RE = r'(?is)<script\b[^>]*\bsrc="([^"]*)"'
_STYLE_HREF_RE = r'(?is)<link\b[^>]*rel="stylesheet"[^>]*href="([^"]*)"'
_IFRAME_SRC_RE = r'(?is)<iframe\b[^>]*\bsrc="([^"]*)"'


def page_assets(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Sub-resource census -> (url, n_scripts, n_styles, n_imgs,
    n_iframes, n_third_party, third_party_hosts): page-weight and
    tracking structure from the asset graph — a page whose scripts come
    mostly from OTHER hosts is ad-tech-heavy (quality signal beside
    url_spam/security_headers), iframes mark embed shells, and the
    distinct third-party host list feeds the tracker-domain rollup.

    Third-party = an absolute-URL asset (script/style/iframe src) whose
    host differs from the page's own; protocol-relative counts too
    (same test as extract_links' resolution). One decode, four
    extract_all passes, host comparison and distinct-host assembly all
    in array expressions — codegen, no UDF, no shuffle.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    page_host = F.lower(F.regexp_extract(F.col(url_col), _AUTH_RE, 1))
    scripts = F.regexp_extract_all(html_txt, F.lit(_SCRIPT_SRC_RE), 1)
    styles = F.regexp_extract_all(html_txt, F.lit(_STYLE_HREF_RE), 1)
    iframes = F.regexp_extract_all(html_txt, F.lit(_IFRAME_SRC_RE), 1)
    imgs = F.regexp_extract_all(html_txt, F.lit(_IMG_TAG_RE), 0)
    refs = F.concat(scripts, styles, iframes)
    asset_host = lambda a: F.lower(  # noqa: E731
        F.when(
            a.startswith("//"), F.regexp_extract(a, r"^//([^/?#]+)", 1)
        ).otherwise(F.regexp_extract(a, _AUTH_RE, 1))
    )
    tp_hosts = F.array_distinct(
        F.filter(
            F.transform(
                refs,
                lambda a: F.when(
                    (asset_host(a) != "") & (asset_host(a) != page_host),
                    asset_host(a),
                ),
            ),
            lambda h: h.isNotNull(),
        )
    )
    n_tp = F.size(
        F.filter(
            refs,
            lambda a: (asset_host(a) != "") & (asset_host(a) != page_host),
        )
    )
    return df.select(
        F.col(url_col).alias("url"),
        F.size(scripts).cast("long").alias("n_scripts"),
        F.size(styles).cast("long").alias("n_styles"),
        F.size(imgs).cast("long").alias("n_imgs"),
        F.size(iframes).cast("long").alias("n_iframes"),
        n_tp.cast("long").alias("n_third_party"),
        F.array_join(F.array_sort(tp_hosts), ",").alias("third_party_hosts"),
    )


_IPV4_HOST_RE = r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$"


def url_safety(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Fetch-safety gate -> (url, scheme_ok, host_kind, private_target,
    port_ok, fetchable): the SSRF battery a crawler runs BEFORE
    touching the network — redirect chains and attacker-authored pages
    can point the fetcher at link-local metadata services
    (169.254.169.254), RFC 1918 ranges, loopback, or exotic schemes,
    and a fleet that fetches them exfiltrates its own credentials.

    Classification is codegen-only: scheme whitelist (http/https),
    host_kind in (name, ip4, localhost), IPv4 literals range-checked
    octet-wise (loopback 127/8, RFC 1918 10/8 + 172.16/12 + 192.168/16,
    link-local 169.254/16, 0.0.0.0), explicit ports bounded to
    (80, 443, 8080, 8443). ``fetchable`` is the conjunction. DNS-level
    private resolution (a NAME resolving to 10.x) is a resolver-side
    check by nature and stays out of scope (documented) — this gate
    kills the literal-IP and scheme vectors at scan speed.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    host = F.regexp_extract(auth, r"^([^:]*)", 1)
    port_s = F.regexp_extract(auth, r":(\d+)$", 1)
    scheme_ok = scheme.isin("http", "https").cast("int")
    o = [
        F.nullif(F.regexp_extract(host, _IPV4_HOST_RE, i), F.lit("")).cast(
            "int"
        )
        for i in (1, 2, 3, 4)
    ]
    is_ip4 = o[0].isNotNull() & (o[0] <= 255) & (o[1] <= 255) & (
        o[2] <= 255
    ) & (o[3] <= 255)
    host_kind = (
        F.when(host == "localhost", F.lit("localhost"))
        .when(is_ip4, F.lit("ip4"))
        .otherwise(F.lit("name"))
    )
    private_ip = is_ip4 & (
        (o[0] == 127)
        | (o[0] == 10)
        | ((o[0] == 172) & (o[1] >= 16) & (o[1] <= 31))
        | ((o[0] == 192) & (o[1] == 168))
        | ((o[0] == 169) & (o[1] == 254))
        | ((o[0] == 0) & (o[1] == 0) & (o[2] == 0) & (o[3] == 0))
    )
    private_target = (
        private_ip | (host_kind == "localhost")
    ).cast("int")
    port_ok = F.when(port_s == "", F.lit(1)).otherwise(
        port_s.cast("int").isin(80, 443, 8080, 8443).cast("int")
    )
    fetchable = (
        (scheme_ok == 1) & (private_target == 0) & (port_ok == 1)
    ).cast("int")
    return df.select(
        url.alias("url"),
        scheme_ok.alias("scheme_ok"),
        host_kind.alias("host_kind"),
        private_target.alias("private_target"),
        port_ok.alias("port_ok"),
        fetchable.alias("fetchable"),
    )


# --- confusable-skeleton homoglyph detection (round-4 session-19) ---------

# Pinned single-codepoint confusable map — a deterministic UTS #39
# "skeleton" subset covering the Cyrillic/Greek lookalikes and digit
# confusables that dominate real domain-spoof corpora. Single-char
# translate() only (multi-char folds like rn->m are a candidate-recall
# refinement, documented out of scope): both engines restate the same
# table, so the oracle can never drift from the operator.
_CONFUSABLE_SRC = "аеорсхуіѕοαı" + "01"
_CONFUSABLE_DST = "aeopcxyiso" + "ai" + "ol"


def confusable_skeleton(df: DataFrame, col: str = "domain") -> DataFrame:
    """Append ``skeleton``: the confusable-folded, lowercased form of
    ``col``. Pure translate()+lower() codegen — runs at scan speed; at
    100 TB this is the map side of a skeleton-keyed join against a
    bounded brand list, never a Python pass."""
    return df.withColumn(
        "skeleton",
        F.translate(
            F.lower(F.col(col)), _CONFUSABLE_SRC, _CONFUSABLE_DST
        ),
    )


def homoglyph_spoofs(
    domains: DataFrame, brands: DataFrame, col: str = "domain"
) -> DataFrame:
    """Flag domains whose confusable skeleton collides with a protected
    brand domain while the raw string differs — the IDN-homograph /
    digit-substitution phishing shape (complements url_safety's
    pre-network battery and idn_hosts' ACE decode).

    ``brands`` (one ``brand`` column, ascii-lowercase) is bounded by
    construction — broadcast it; ``domains`` is corpus-sized and only
    ever map-side translated. Left join keeps legit + unrelated rows so
    the result is a census, not just the hit list."""
    b = confusable_skeleton(
        brands.select(F.col("brand")), "brand"
    ).withColumnRenamed("skeleton", "brand_skeleton")
    d = confusable_skeleton(domains, col)
    return d.join(
        F.broadcast(b), d["skeleton"] == b["brand_skeleton"], "left"
    ).select(
        *domains.columns,
        "skeleton",
        "brand",
        F.when(
            F.col("brand").isNotNull() & (F.col(col) != F.col("brand")), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("is_spoof"),
    )


def toc_extract(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Table-of-contents integrity census -> (url, n_links, n_resolved,
    n_dangling): in-page fragment links (href="#x") matched against the
    page's own id="x" anchors — the navigation-structure signal document
    QA uses (a dangling TOC entry means the extraction lost a section, a
    rich resolved TOC marks long-form structured content worth keeping).

    Semantics are over DISTINCT fragment targets, deliberately: that
    lets the whole check run as array_intersect/array_distinct over two
    once-evaluated extracted arrays — plain function arguments, NOT
    higher-order-function lambdas, so nothing is re-inlined per element
    (the CollapseProject/HOF trap BASELINE.md documents) and the page
    bytes are scanned exactly twice (one regexp pass per array). All
    codegen, no UDF, no shuffle, no explode.
    """
    html_txt = F.decode(F.col(html_col), "UTF-8")
    ids = F.regexp_extract_all(html_txt, F.lit(r'(?is)\bid="([^"]+)"'), 1)
    frags = F.array_distinct(
        F.regexp_extract_all(html_txt, F.lit(r'(?is)href="#([^"]+)"'), 1)
    )
    n_links = F.size(frags).cast("long")
    n_resolved = F.size(F.array_intersect(frags, ids)).cast("long")
    return df.select(
        F.col(url_col).alias("url"),
        n_links.alias("n_links"),
        n_resolved.alias("n_resolved"),
        (n_links - n_resolved).cast("long").alias("n_dangling"),
    )


def robots_directive_merge(
    df: DataFrame,
    url_col: str = "url",
    headers_col: str = "headers",
    html_col: str = "html",
) -> DataFrame:
    """Effective robots directives per page from BOTH channels — the
    X-Robots-Tag HTTP header and the <meta name="robots"> tag — under
    the most-restrictive-wins rule search engines apply (Google's
    documented combination semantics): noindex or nofollow from EITHER
    channel sticks. The merge matters because a crawler that honors only
    one channel silently indexes pages the publisher blocked in the
    other; ``conflict`` (one channel silent, the other blocking) is the
    audit column.

    Head-only discipline: the header scan runs on the headers string
    only, so a decoy 'X-Robots-Tag: noindex' in the BODY never matches
    (the parse_x_robots contract); the meta scan accepts any attribute
    order via two narrow regexps. All codegen, one scan, no UDF, one
    map-side-combined groupBy(source host).

    Output per host: n_pages, hdr_noindex, meta_noindex,
    eff_noindex, eff_nofollow, conflicts.
    """
    hdr = F.lower(F.col(headers_col))
    hx = F.regexp_extract(
        hdr, r"(?m)^x-robots-tag:\s*([^\r\n]*)$", 1
    )
    hdr_noindex = (
        hx.contains("noindex") | hx.contains("none")
    ).cast("int")
    hdr_nofollow = (
        hx.contains("nofollow") | hx.contains("none")
    ).cast("int")
    html_txt = F.lower(F.decode(F.col(html_col), "UTF-8"))
    meta_nc = F.regexp_extract(
        html_txt,
        r'<meta\b[^>]*\bname="robots"[^>]*\bcontent="([^"]*)"',
        1,
    )
    meta_cn = F.regexp_extract(
        html_txt,
        r'<meta\b[^>]*\bcontent="([^"]*)"[^>]*\bname="robots"',
        1,
    )
    meta = F.when(meta_nc != "", meta_nc).otherwise(meta_cn)
    meta_noindex = (
        meta.contains("noindex") | meta.contains("none")
    ).cast("int")
    meta_nofollow = (
        meta.contains("nofollow") | meta.contains("none")
    ).cast("int")
    eff_noindex = F.greatest(hdr_noindex, meta_noindex)
    eff_nofollow = F.greatest(hdr_nofollow, meta_nofollow)
    conflict = (
        (hdr_noindex != meta_noindex) | (hdr_nofollow != meta_nofollow)
    ).cast("int")
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)/", 1)
    return (
        df.select(
            host.alias("host"),
            hdr_noindex.alias("_rm_hn"),
            meta_noindex.alias("_rm_mn"),
            eff_noindex.alias("_rm_en"),
            eff_nofollow.alias("_rm_ef"),
            conflict.alias("_rm_c"),
        )
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum("_rm_hn").cast("long").alias("hdr_noindex"),
            F.sum("_rm_mn").cast("long").alias("meta_noindex"),
            F.sum("_rm_en").cast("long").alias("eff_noindex"),
            F.sum("_rm_ef").cast("long").alias("eff_nofollow"),
            F.sum("_rm_c").cast("long").alias("conflicts"),
        )
    )
