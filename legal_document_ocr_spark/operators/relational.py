"""Relational operator surface — the reference's query API + the §2 battery.

Mirrors app/services/document_service.py:83-229 (listing / filter /
pagination / point lookup / projection-to-response) and exercises the full
SURVEY.md §2 inventory that is SQL-expressible: aggregations (A1-A11), windows
(W1-W4), sorts/limits/top-k (O1-O4), joins (J1), set-ish ops (U1-U2),
sessionization (A7 gaps-and-islands).

Determinism rules for oracle parity (shared with __spark_entry__):
- money aggregates sum DECIMAL(18,2) (exact, order-independent), cast to
  double only at the end;
- every ordered surface has a total-order tiebreak;
- ratios are per-row doubles rounded to 6 dp.

Scale notes are inline per operator — broadcast the dimension side, let the
fact side shuffle once on the group key, never collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# reference query surface (document_service.py:83-229)
# ---------------------------------------------------------------------------


def list_documents(
    docs: DataFrame,
    *,
    lang: str | None = None,
    skip: int = 0,
    limit: int = 100,
    order_col: str = "doc_id",
) -> DataFrame:
    """P5 filter + O3 offset/limit pagination (document_service.py:83-115).

    Unlike the reference (no ORDER BY -> arbitrary page order), pagination is
    pinned to a total order so pages are stable across runs and engines.
    """
    df = docs
    if lang is not None:
        df = df.where(F.col("lang") == lang)
    return df.orderBy(order_col).offset(skip).limit(limit)


def get_document(docs: DataFrame, doc_id: int) -> DataFrame:
    """P6 point lookup (document_service.py:143-153) — partition-prunable
    equality predicate, pushed to the scan."""
    return docs.where(F.col("doc_id") == doc_id).limit(1)


def document_response(docs: DataFrame) -> DataFrame:
    """P7 projection to the nested response shape (document_service.py:208-229)."""
    return docs.select(
        F.struct(
            F.col("doc_id").cast("string").alias("document_id"),
            F.col("source").alias("source"),
        ).alias("metadata"),
        F.struct(
            F.col("text").alias("content"),
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("n_chars"),
        ).alias("document_info"),
    )


def delete_documents(docs: DataFrame, doc_ids: DataFrame) -> DataFrame:
    """Row-level delete (document_service.py:117-141) as a left-anti join.

    On an Iceberg catalog this is ``DELETE FROM t WHERE ...`` (merge-on-read);
    on the parquet+manifest store it is the dataframe that a rewrite commits.
    The anti-join broadcasts the (small) id side — no shuffle of the table.
    """
    return docs.join(F.broadcast(doc_ids), "doc_id", "left_anti")


def update_documents(docs: DataFrame, patch: DataFrame) -> DataFrame:
    """Merge-patch update (document_service.py:155-206): for rows matched by
    ``patch.doc_id``, non-null patch columns override; everything else keeps
    the current value — the reference's ``data.get(k, current)`` semantics.

    Shape: broadcast left join + per-column coalesce(patch, current) — the
    DataFrame form of Iceberg's ``MERGE INTO ... WHEN MATCHED THEN UPDATE``.
    """
    patch_cols = [c for c in patch.columns if c != "doc_id"]
    renamed = patch.select(
        "doc_id", *[F.col(c).alias(f"__patch_{c}") for c in patch_cols]
    )
    out = docs.join(F.broadcast(renamed), "doc_id", "left")
    for c in patch_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__patch_{c}"), F.col(c)))
    return out.select(docs.columns)


# ---------------------------------------------------------------------------
# aggregation battery (TPC-H-shaped, over the driver testdata tables)
# ---------------------------------------------------------------------------


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: grouped sums/avgs/count over lineitem (A1/A5).

    Decimal sums -> exact + order-independent; avg derived from the exact sum
    so the double is identical across engines. Map-side partial aggregation
    collapses the 600k rows to |flag x status| groups before the exchange.
    """
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """J1 equi-join chain: fact orders ⋈ broadcast(customer) ⋈ broadcast(nation).

    Both dimension sides are broadcast explicitly (they are orders-of-
    magnitude smaller than the fact side at every SF) — zero shuffle for the
    joins; the single exchange is the final groupBy on n_name.
    """
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("n_name")
    )


def top_brands_by_revenue(lineitem: DataFrame, part: DataFrame, k: int = 5) -> DataFrame:
    """O-family top-k after a broadcast join + agg (revenue per brand)."""
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand"))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# window battery (W1-W4) + sessionization (A7)
# ---------------------------------------------------------------------------


def order_ranks(orders: DataFrame, max_custkey: int = 100) -> DataFrame:
    """W1/W4: per-customer order sequence + rank by price.

    One shuffle on o_custkey serves both window functions (same partitioning).
    Bounded to a customer range so the oracle result stays small.
    """
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.where(F.col("o_custkey") <= max_custkey)
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_seq).alias("order_seq"),
            F.rank().over(w_price).alias("price_rank"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def sessionize_events(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """A7/W2/W3 gaps-and-islands: sessions = runs of per-user events with
    inter-event gap < ``gap_seconds`` (the SQL-expressible cousin of the page
    merge fold — the fold itself needs applyInPandas, see merge.py).

    Two stacked windows over the SAME partitioning (user_id) -> one shuffle;
    the group-by on (user_id, session_id) reuses it.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ -> LTZ -> long: epoch seconds (session tz pinned to UTC in session.py,
    # so this equals DuckDB's epoch() on the naive timestamp, floored)
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs, 1).over(w)
    is_break = F.when(gap.isNull() | (gap >= gap_seconds), 1).otherwise(0)
    with_session = events.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_break)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
        )
        .orderBy("user_id", "session_id")
    )


def windowed_event_counts(events: DataFrame, bucket_seconds: int = 300) -> DataFrame:
    """Tumbling-window aggregation (the batch mirror of the streaming path in
    streaming/pipeline.py): epoch-floored buckets x event_type."""
    bucket = (
        F.floor(F.col("ts").cast("timestamp").cast("double") / bucket_seconds)
        * bucket_seconds
    ).cast("long")
    return (
        events.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket_start", "event_type")
    )


def domain_profile(pages: DataFrame) -> DataFrame:
    """Per-domain corpus profile: page count, byte volume, distinct-payload
    count and dup ratio — the skew/duplication diagnosis pass that sizes the
    salting policy (scale/salt.py: one hot domain = one straggler) and the
    dedup-before-compute decision (stages.run_extraction(dedup='auto')).

    One map-side-combined shuffle on the domain key; payloads are reduced to
    their sha2 BEFORE the exchange (the bytes never shuffle).
    """
    return (
        pages.select(
            F.expr("parse_url(url, 'HOST')").alias("domain"),
            F.length("html").alias("nb"),
            F.sha2("html", 256).alias("h"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum("nb").cast("long").alias("total_bytes"),
            F.count_distinct("h").alias("distinct_payloads"),
            F.round(
                F.lit(1.0) - F.count_distinct("h") / F.count("*").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
        .orderBy("domain")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Crawl-snapshot diff: classify every key across two snapshots as
    added / removed / changed / unchanged — the incremental-crawl planning
    step (recrawl 'changed', ingest 'added', tombstone 'removed').

    One full-outer shuffle join on the key; both sides carry only
    (key, fixed-width hash), so the exchange never moves payloads. At rest
    both snapshots are key-bucketed tables and the join is co-located.

    Presence is tracked with explicit per-side flags, NOT hash nullness —
    a key present in both snapshots whose hash is NULL on one side (failed
    fetch) must classify as changed/unchanged by the null-safe hash
    comparison, never as added/removed.
    """
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("_oh"),
        F.lit(1).alias("_op"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("_nh"),
        F.lit(1).alias("_np"),
    )
    joined = o.join(n.hint("shuffle_hash"), "k", "full_outer")
    status = (
        F.when(F.col("_op").isNull(), F.lit("added"))
        .when(F.col("_np").isNull(), F.lit("removed"))
        .when(~F.col("_oh").eqNullSafe(F.col("_nh")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col("k").alias(key_col), status.alias("status"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    value_col: str,
    out_col: str = "asof_value",
    dedupe_right: str | None = None,
) -> DataFrame:
    """As-of join: attach to each ``left`` row the ``value_col`` of the most
    recent ``right`` row with the same ``key`` and ``right.ts <= left.ts``
    (NULL when none exists). An operator Spark lacks natively.

    Implementation is the union-merge shape, NOT a range join: tag the two
    inputs, merge them, and carry the last non-null right value forward over
    ONE window per key ordered by (ts, side) — right rows sort before left
    rows at equal ts, giving at-or-before semantics. One shuffle on the key,
    O(n log n) per key, no quadratic candidate explosion and no broadcast —
    the shape that survives a 100 TB event stream.

    ``right`` must be unique per (key, ts) for deterministic output;
    ``dedupe_right`` folds the pre-aggregate in: an order-insensitive SQL
    aggregate name ('max'/'min'/'avg'/'sum') applied to ``value_col`` per
    (key, ts) before the merge. The groupBy partial-aggregates map-side, so
    duplicate-heavy right streams (tick data, retried events) shrink before
    the shuffle.
    """
    if dedupe_right is not None:
        # allowlist: only order-insensitive aggregates keep the operator's
        # determinism contract ('first' would parse fine and silently break it)
        allowed = {"max", "min", "avg", "sum"}
        if dedupe_right not in allowed:
            raise ValueError(
                f"dedupe_right must be one of {sorted(allowed)}, "
                f"got {dedupe_right!r}"
            )
        right = right.groupBy(key, ts).agg(
            F.expr(f"{dedupe_right}(`{value_col}`)").alias(value_col)
        )
    lt = left.withColumn("_src", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(right.schema[value_col].dataType)
    )
    rt = right.select(
        key, ts, F.col(value_col).alias("_rv"), F.lit(0).alias("_src")
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(ts, "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("_rv", ignorenulls=True).over(w)
    return (
        merged.withColumn(out_col, carried)
        .where(F.col("_src") == 1)
        .drop("_src", "_rv")
    )


# ---------------------------------------------------------------------------
# set-ish ops (U1/U2) — adjacent-document word overlap
# ---------------------------------------------------------------------------


def adjacent_word_overlap(
    docs: DataFrame, min_common: int = 2, *, bucket_size: int = 100_000
) -> DataFrame:
    """U1: distinct-word overlap between each doc and the next by doc_id
    (the reference's page-continuation check, document_merger_service.py:43-46).

    A plain ``lag() OVER (ORDER BY doc_id)`` is a single-partition scale
    killer (the whole corpus through one task). Instead the lag runs inside
    id-range buckets (floor(doc_id / bucket_size) — ordering by (bucket,
    doc_id) == ordering by doc_id, so the in-bucket lag IS the global lag for
    every row but the first of each bucket), and the bucket-boundary rows get
    their predecessor from a per-bucket summary: the max-doc_id row of each
    non-empty bucket, lagged over buckets. The summary has corpus/bucket_size
    rows — the only data that ever crosses a global window or a broadcast.
    Exact same output as the global-lag formulation (the oracle states the
    global lag), including across EMPTY buckets (the summary lag skips them).
    """
    from .textops import ws_tokens

    words = F.array_distinct(ws_tokens(F.lower(F.col("text"))))
    tokens = docs.select(
        "doc_id",
        F.floor(F.col("doc_id") / bucket_size).alias("_bucket"),
        words.alias("words"),
    )
    w = Window.partitionBy("_bucket").orderBy("doc_id")
    with_prev = tokens.select(
        "doc_id",
        "_bucket",
        "words",
        F.lag("words", 1).over(w).alias("prev_words"),
    )
    # per-bucket last row (struct max: doc_id decides — unique), then lag
    # over the bucket summary to reach the nearest preceding NON-EMPTY bucket
    wb = Window.orderBy("_bucket")  # bounded: one row per non-empty bucket
    boundary = (
        tokens.groupBy("_bucket")
        .agg(F.max(F.struct("doc_id", "words")).alias("m"))
        .select(
            "_bucket", F.lag(F.col("m.words"), 1).over(wb).alias("boundary_words")
        )
    )
    return (
        with_prev.join(F.broadcast(boundary), "_bucket", "left")
        .select(
            "doc_id",
            "words",
            F.coalesce("prev_words", "boundary_words").alias("prev_words"),
        )
        .where(F.col("prev_words").isNotNull())
        .select(
            "doc_id",
            F.size(F.array_intersect("words", "prev_words")).alias("common_words"),
        )
        .where(F.col("common_words") >= min_common)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join reduction
# ---------------------------------------------------------------------------


def bloom_semijoin(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    id_col: str,
    *,
    bits: int = 8192,
    hashes: int = 3,
) -> DataFrame:
    """Bloom-filter semi-join reduction: build a Bloom filter over the build
    side's keys, pre-filter the (huge) probe side to bloom CANDIDATES, and
    run the exact membership join on candidates only — the runtime-filter
    pattern (Spark's own DPP/runtime bloom applies it to equi-joins; here it
    is an explicit, oracle-checkable operator).

    The filter is the DISTINCT-position set of ``hashes`` md5-derived slots
    per key — bounded at ``bits`` rows no matter how large the build side,
    hence always broadcastable (the at-rest format would pack it to
    bits/64 words; the position-set relation keeps the identical
    false-positive semantics engine-portably). No false negatives: every
    listed key is a candidate, so non-candidates skip the exact join
    entirely — that skipped shuffle volume is the reduction.

    Output: one row per probe row — (id, key, bloom_candidate, is_listed);
    bloom_candidate may be true with is_listed false (a measured, 
    deterministic false positive).
    """
    from .dedup import base_hash28

    def _positions(col: F.Column) -> F.Column:
        return F.array(
            *[
                base_hash28(F.concat(F.lit(f"{h}|"), col)) % bits
                for h in range(hashes)
            ]
        )

    bloom = (
        build.select(F.explode(_positions(F.col(key_col))).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ex = probe.select(id_col, key_col, F.explode(_positions(F.col(key_col))).alias("pos"))
    flags = (
        ex.join(F.broadcast(bloom), "pos", "left")
        .groupBy(id_col, key_col)
        .agg((F.count("hit") == hashes).alias("bloom_candidate"))
    )
    listed = build.select(F.col(key_col)).distinct().withColumn("listed", F.lit(1))
    verified = (
        flags.where(F.col("bloom_candidate"))
        .join(listed.hint("shuffle_hash"), key_col, "left")
        .select(
            id_col,
            key_col,
            "bloom_candidate",
            F.col("listed").isNotNull().alias("is_listed"),
        )
    )
    passed = flags.where(~F.col("bloom_candidate")).select(
        id_col, key_col, "bloom_candidate", F.lit(False).alias("is_listed")
    )
    return verified.unionByName(passed)


# ---------------------------------------------------------------------------
# exact grouped quantiles via bounded distribution sketch (round 3)
# ---------------------------------------------------------------------------


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_ppm: tuple[int, ...] = (500000, 900000, 990000),
) -> DataFrame:
    """EXACT discrete quantiles per group over a bounded-domain integer
    column (doc length, token count, fetch latency ms, ...) — the
    distribution dashboard of corpus curation (what does p99 doc length
    look like per source?).

    The scale trick: a naive exact quantile sorts every group's values
    (sort-per-group over the corpus); approx_percentile is mergeable but
    NOT oracle-matchable. For a bounded-domain column the full
    DISTRIBUTION is itself small: groupBy(group, value) -> counts is a
    map-side-combined mergeable sketch bounded by |distinct values| per
    group, independent of row count — at 100 TB the sketch for a
    0..10^6-bounded length column is at most 10^6 rows per group
    regardless of page count. Quantiles then come from a cumulative sum
    over each group's (small) distribution.

    Quantile definition (stated, engine-portable, all-integer): q-quantile
    = smallest value whose cumulative count >= ceil(q_ppm * n / 10^6),
    computed as (q_ppm*n + 999999) div 10^6 — no float rank arithmetic,
    so Spark and the oracle cannot disagree by an ulp.

    Output: (group, n_rows, q_<ppm> per requested quantile) — one row per
    group.
    """
    g, v = F.col(group_col), F.col(value_col)
    dist = df.groupBy(g.alias("grp"), v.alias("val")).agg(
        F.count("*").alias("cnt")
    )
    w_cum = Window.partitionBy("grp").orderBy("val")
    w_all = Window.partitionBy("grp")
    cum = dist.select(
        "grp",
        "val",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n_rows"),
    )
    aggs = [F.max("n_rows").cast("long").alias("n_rows")]
    for q in qs_ppm:
        need = F.expr(f"({q} * n_rows + 999999) div 1000000")
        aggs.append(
            F.min(F.when(F.col("cum") >= need, F.col("val")))
            .cast("long")
            .alias(f"q_{q}")
        )
    return cum.groupBy(F.col("grp").alias(group_col)).agg(*aggs)


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 3,
) -> DataFrame:
    """Median/MAD outlier flags per group over a bounded-domain integer
    column — the robust per-host anomaly pass of corpus curation (a host
    whose page lengths are normally ~2k chars suddenly serving 400k-char
    pages is template breakage or spam, and mean/stddev is exactly the
    statistic such outliers destroy).

    Same distribution-sketch shape as grouped_quantiles: two map-side-
    combined groupBys onto the bounded (group, value) domain — one for the
    group's LOWER MEDIAN, one for the median absolute deviation — then one
    shuffle_hash join of the tiny per-group stats back to the rows. Never
    a sort-per-group, never a broadcast of the per-group table (hosts are
    ~10^8 at crawl scale — the crawl_frontier r2 lesson). All-integer
    ranks: median = smallest v with cum >= (n+1) div 2.

    Flag: |value - med| > k * mad (both sides bigint — no float). When
    mad = 0 (a majority-constant group) ANY deviation flags, which is the
    conservative choice for template hosts.

    Output: df's columns + (med, mad, is_outlier).
    """
    g, v = F.col(group_col), F.col(value_col)

    def _lower_median(vals: DataFrame, out: str) -> DataFrame:
        dist = vals.groupBy("_ro_grp", "val").agg(F.count("*").alias("cnt"))
        w_cum = Window.partitionBy("_ro_grp").orderBy("val")
        w_all = Window.partitionBy("_ro_grp")
        cum = dist.select(
            "_ro_grp",
            "val",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        return cum.groupBy("_ro_grp").agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("val"))
            )
            .cast("long")
            .alias(out)
        )

    vals = df.select(g.alias("_ro_grp"), v.cast("long").alias("val"))
    med = _lower_median(vals, "med")
    dev = vals.join(med.hint("shuffle_hash"), "_ro_grp").select(
        "_ro_grp", F.abs(F.col("val") - F.col("med")).alias("val")
    )
    mad = _lower_median(dev, "mad")
    stats = med.join(mad.hint("shuffle_hash"), "_ro_grp")
    return (
        df.join(
            stats.hint("shuffle_hash"), g == F.col("_ro_grp")
        )
        .drop("_ro_grp")
        .withColumn(
            "is_outlier",
            (F.abs(v.cast("long") - F.col("med")) > F.lit(k) * F.col("mad"))
            .cast("int"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: how many users reached step k of
    ``steps`` IN ORDER (each step strictly after the previous one's first
    qualifying occurrence — the standard product-analytics funnel, and the
    crawl-ops one: fetched -> parsed -> extracted -> shipped).

    Shape: one filtered scan per funnel (only rows whose type is a step
    survive the pushable IN filter), then ONE map-side-combined
    groupBy(user) computing each step's earliest qualifying timestamp as a
    CHAINED conditional min — min(ts of step k where ts > reach[k-1]) is
    not directly expressible as one aggregate, so reach is built
    iteratively: k aggregates over the SAME grouped pass per level, each
    level a second groupBy over the bounded (user, level-reach) rows.
    Users are unbounded; everything stays (user, k x ts) narrow rows and
    nothing broadcasts. Output: (step_idx, step, n_users) — one row per
    step with the count of users whose ordered journey got that far.
    """
    sel = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).where(F.col(type_col).isin(list(steps)))
    per_user = sel.groupBy("u").agg(
        F.collect_list(F.struct("ts", "t")).alias("evs")
    )
    # per-user fold over the (small: one user's funnel events) sorted list —
    # array expressions, not a Python UDF; state = reached-step timestamps
    evs = F.array_sort("evs")

    def _first_after(step, prev):
        def fn(acc, e):
            qualifies = acc.isNull() & (e["t"] == F.lit(step))
            if prev is not None:
                qualifies = qualifies & (e["ts"] > prev)
            return F.when(qualifies, e["ts"]).otherwise(acc)

        return F.aggregate(evs, F.lit(None).cast("timestamp"), fn)

    reach = None  # python None marks "no previous step" for step 0
    reaches = []
    for step in steps:
        reach = _first_after(step, reach)
        reaches.append(reach)
    flags = per_user.select(
        *[
            (r.isNotNull()).cast("int").alias(f"s{i}")
            for i, r in enumerate(reaches)
        ]
    )
    totals = flags.agg(
        *[F.sum(f"s{i}").alias(f"n{i}") for i in range(len(steps))]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n{i}").cast("long").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return totals.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their FIRST-activity
    period (epoch-week by default), counted once per (cohort, offset)
    they return in — product analytics' standard retention triangle, and
    the crawl-ops one (hosts first seen in week w still serving new pages
    k weeks later).

    Shape: one map-side-combined groupBy(user) min for the cohort
    assignment, one shuffle_hash join back (users are unbounded — never
    broadcast), one distinct + count onto the bounded (cohort, offset)
    key. All-integer epoch-bucket arithmetic (UTC-pinned by the caller;
    the bucket is epoch-based so session timezone cannot shift it).

    Output: (cohort_bucket, offset, n_users).
    """
    ev = events.select(
        F.col(user_col).alias("u"),
        F.floor(F.col(ts_col).cast("timestamp").cast("long") / bucket_seconds)
        .cast("long")
        .alias("b"),
    )
    first = ev.groupBy("u").agg(F.min("b").alias("b0"))
    return (
        ev.join(first.hint("shuffle_hash"), "u")
        .select("u", F.col("b0").alias("cohort_bucket"), (F.col("b") - F.col("b0")).alias("offset"))
        .distinct()
        .groupBy("cohort_bucket", "offset")
        .agg(F.count("*").alias("n_users"))
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: revenue of not-yet-shipped orders for one market
    segment — dimension-filter pushdown + broadcast(customer) into the
    orders⋈lineitem fact join, decimal revenue sum, deterministic top-k.
    Both date predicates prune at the scan (PushedFilters); the only
    exchanges are the fact-fact join on orderkey and the final groupBy.
    """
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.where(F.col("l_shipdate") > cutoff)  # noqa: E741
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l.hint("shuffle_hash"), o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_quantity: int = 250,
) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders aggregate to huge
    quantities — the grouped-HAVING semi-join: lineitem groupBy(orderkey)
    sum > threshold (map-side-combined, the ONLY pass over the fact
    table), then the qualifying-order set (tiny by construction) joins
    orders and broadcast(customer). Output one row per qualifying order.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > min_quantity)
    )
    return (
        orders.join(
            big.hint("shuffle_hash"), orders.o_orderkey == big.l_orderkey
        )
        .join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


def small_quantity_revenue(lineitem: DataFrame, *, frac_fifth: int = 5) -> DataFrame:
    """TPC-H Q17 shape (decorrelated): revenue locked in orders whose line
    quantity is below 1/``frac_fifth`` of the part's average — the classic
    correlated-subquery-to-aggregate-join rewrite. The per-part stats table
    is part-keyed (bounded by |parts| but corpus-scale at high SF) and
    joins back shuffle_hash, never broadcast. The threshold predicate is
    ALL-DECIMAL (qty * 5 * cnt < sum_qty) — no division, no float boundary
    to disagree on. Output: one row (avg_yearly-style revenue sum / 7).
    """
    q = F.col("l_quantity").cast("decimal(18,2)")
    stats = lineitem.groupBy("l_partkey").agg(
        F.sum(q).alias("sum_qty"), F.count("*").alias("cnt")
    )
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    joined = li.join(stats.hint("shuffle_hash"), "l_partkey")
    below = joined.where(
        F.col("l_quantity").cast("decimal(18,2)") * frac_fifth * F.col("cnt")
        < F.col("sum_qty")
    )
    total = below.agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("n_lines"),
    )
    return total.select(
        (F.col("s").cast("double") / 7.0).alias("avg_yearly"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def late_shipment_priority_counts(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped late
    (l_shipdate > o_orderdate + 60 days), counted per order priority —
    the EXISTS -> LEFT SEMI join rewrite; the semi join carries only the
    keys, map-side-combined count after. Both fact sides shuffle on
    orderkey, nothing broadcast.
    """
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    late = lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        late.hint("shuffle_hash"),
        # INTERVAL keeps the timestamp (date_add would truncate to DATE
        # and silently diverge from the oracle on orders with a time part)
        (o.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer including
    zero-order customers — LEFT join + per-customer count, then a second
    map-side-combined groupBy onto the bounded count domain (a histogram
    of a histogram). Output: (n_orders, n_customers).
    """
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey").hint("shuffle_hash"),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


def brand_supplier_counts(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers serving each brand —
    count(DISTINCT) over a broadcast-dimension join; the distinct runs as
    the usual two-phase partial-dedup aggregate on the bounded
    (brand, suppkey) key, never a corpus-wide shuffle of payloads.
    Output: (p_brand, n_suppliers, n_lines).
    """
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lines"),
        )
    )


def top_supplier_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum revenue — the
    argmax-WITH-TIES pattern (a LIMIT 1 silently drops co-winners; Q15's
    contract returns every supplier at the max). Revenue per supplier is
    one map-side-combined decimal groupBy; the max is a 1-row aggregate
    crossJoined back (broadcast by construction) and matched by exact
    decimal equality — no float compare. Output: (l_suppkey, revenue).
    """
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")
    per_supp = lineitem.groupBy("l_suppkey").agg(F.sum(rev).alias("r"))
    mx = per_supp.agg(F.max("r").alias("rmax"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("r") == F.col("rmax"))
        .select("l_suppkey", F.col("r").cast("double").alias("revenue"))
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: order revenue rolled up region <- nation <- customer,
    plus the region's supplier census — the full dimension-chain snowflake.
    Every dimension broadcasts (region/nation are tiny at any SF, customer
    is the usual dim side); the fact table shuffles exactly once for the
    final groupBy. Output: (r_name, revenue, n_orders, n_suppliers).
    """
    dim = (
        nation.join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        ).select("n_nationkey", "r_name")
    )
    cust = customer.join(
        F.broadcast(dim), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "r_name")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("r_name")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )
    supp = (
        supplier.join(
            F.broadcast(dim), supplier.s_nationkey == F.col("n_nationkey")
        )
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )
    return rev.join(F.broadcast(supp), "r_name", "left").select(
        "r_name",
        "revenue",
        "n_orders",
        F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
    )


def lang_source_pivot(docs: DataFrame, langs: list[str]) -> DataFrame:
    """Crosstab census: one row per source, one column per language —
    ``pivot`` with an EXPLICIT value list (an unlisted-values pivot runs a
    distinct-collect pre-pass over the corpus; pinning the list keeps it
    one map-side-combined aggregate). Output: (source, n_<lang>...).
    """
    return (
        docs.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .select(
            "source",
            *[
                F.coalesce(F.col(lang), F.lit(0)).cast("long").alias(f"n_{lang}")
                for lang in langs
            ],
        )
    )


def corpus_rollup_census(docs: DataFrame) -> DataFrame:
    """ROLLUP census over (source, lang): per-cell counts, per-source
    subtotals and the grand total in ONE aggregation pass — Spark plans a
    single expand+aggregate, not three scans. NULL group keys are coalesced
    to 'ALL' (matching the oracle's textual rollup markers) and the
    grouping level is emitted explicitly. Output: (source, lang, grouping_level,
    n_docs, sum_chars).
    """
    return (
        docs.rollup("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            .cast("long")
            .alias("sum_chars"),
            # grouping_id must be computed IN the aggregate (a later select
            # is a plain projection where it cannot resolve)
            F.grouping_id("source", "lang").cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "grouping_level",
            "n_docs",
            "sum_chars",
        )
    )


def corpus_cube_census(docs: DataFrame) -> DataFrame:
    """CUBE census over (source, lang): every cell, BOTH marginals and
    the grand total in one expand+aggregate pass — the full grouping-sets
    lattice where corpus_rollup_census emits only the source-led
    hierarchy (a rollup has no per-lang subtotal; dataset-mix dashboards
    want both axes). Spark plans a single Expand (4 projections per row)
    feeding one hash aggregate — one shuffle on the expanded keys, not
    four scans. Output matches corpus_rollup_census's shape:
    (source, lang, grouping_level, n_docs, sum_chars)."""
    return (
        docs.cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("decimal(18,0)"))
            .cast("long")
            .alias("sum_chars"),
            F.grouping_id("source", "lang").cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "grouping_level",
            "n_docs",
            "sum_chars",
        )
    )


def rolling_value_stats(events: DataFrame, *, frame: int = 2) -> DataFrame:
    """Per-user rolling aggregate over the last ``frame``+1 events (ROWS
    BETWEEN frame PRECEDING AND CURRENT ROW) — the bounded-frame window
    flavor (sessionize covers gaps, asof covers point lookups; this is the
    moving average). One shuffle on user_id serves the frame; decimal sums
    with a floor-micro mean emit. Output: (user_id, event_id, n_in_frame,
    mean_value_micro).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-frame, 0)
    )
    s = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    n = F.count("*").over(w)
    return events.select(
        "user_id",
        "event_id",
        n.cast("long").alias("n_in_frame"),
        F.floor(s.cast("double") / n * 1000000.0).cast("long").alias(
            "mean_value_micro"
        ),
    )


def length_quartiles(docs: DataFrame, *, tiles: int = 4) -> DataFrame:
    """ntile(``tiles``) quartile assignment of documents by length within
    each source — the W-family bucketing used to stratify by length.
    Tiebreak pinned by doc_id so the tile is deterministic; output rows
    are byte-identical to ``ntile(4) OVER (PARTITION BY source ORDER BY
    n_chars, doc_id)`` (that formulation stays in the oracle).

    Scale shape (round-4 fix of the r3 `weak`): a literal ntile window
    sorts every source partition in one task — a straggler-by-
    construction when one host owns 10^9 pages. Instead, tiles are
    derived from the bounded (source, n_chars) DISTRIBUTION sketch
    (map-side-combined groupBy, ≤ |distinct lengths| rows per source —
    the ``grouped_quantiles`` machinery): a tie-run of m docs sharing a
    length after s shorter docs occupies ranks (s+1 .. s+m), so its tile
    range follows from integer rank arithmetic alone. Runs that fall
    inside ONE tile (the overwhelming majority) take their tile from a
    shuffle_hash join on (source, n_chars) — no per-row ranking at all.
    Only runs STRADDLING a tile boundary — at most ``tiles``-1 runs per
    source — are rank-refined by doc_id, with the window partitioned by
    (source, n_chars), never by source alone. Worst case (a single-length
    megahost) degrades to ranking that one run; the common case touches
    the corpus with two narrow shuffles and zero corpus-wide sorts.
    Plan-pinned: tests/test_operators.py::test_length_quartiles_plan_has_
    no_per_source_sort.
    """
    d = docs.select("doc_id", "source", "n_chars")
    dist = d.groupBy("source", "n_chars").agg(F.count("*").alias("m"))
    w_below = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_src = Window.partitionBy("source")
    runs = dist.select(
        "source",
        "n_chars",
        "m",
        F.coalesce(F.sum("m").over(w_below), F.lit(0)).alias("s"),
        F.sum("m").over(w_src).alias("n"),
    )

    # ANSI ntile: base = n div tiles, rem = n mod tiles; the first rem
    # tiles hold base+1 rows. All-integer tile-of-rank (guard div-by-0 on
    # the not-taken base=0 branch):
    def _tile_of(r):
        rem = F.col("n") % tiles
        big = rem * (F.expr(f"n div {tiles}") + 1)
        t_small = F.expr(f"(({r}) + (n div {tiles})) div ((n div {tiles}) + 1)")
        t_large = rem + F.expr(
            f"(({r}) - (n % {tiles}) * ((n div {tiles}) + 1)"
            f" + greatest(n div {tiles}, 1) - 1) div greatest(n div {tiles}, 1)"
        )
        return F.when(F.expr(f"{r}") <= big, t_small).otherwise(t_large)

    tile_lo = _tile_of("s + 1")
    tile_hi = _tile_of("s + m")
    interior = runs.where(tile_lo == tile_hi).select(
        "source", "n_chars", tile_lo.cast("int").alias("quartile")
    )
    straddle = runs.where(tile_lo != tile_hi).select(
        "source", "n_chars", "s", "n"
    )
    out_interior = d.join(
        interior.hint("shuffle_hash"), ["source", "n_chars"]
    ).select("doc_id", "source", "n_chars", "quartile")
    w_run = Window.partitionBy("source", "n_chars").orderBy("doc_id")
    out_straddle = (
        d.join(straddle.hint("shuffle_hash"), ["source", "n_chars"])
        .withColumn("r", F.col("s") + F.row_number().over(w_run))
        .select(
            "doc_id",
            "source",
            "n_chars",
            _tile_of("r").cast("int").alias("quartile"),
        )
    )
    return out_interior.unionByName(out_straddle)


def revenue_forecast(
    lineitem: DataFrame,
    *,
    year: int = 1997,
    disc_lo: str = "0.02",
    disc_hi: str = "0.06",
    qty_max: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: the would-be revenue increase from dropping a
    discount band — a pure scan-side filter battery (ship-year window,
    discount band, quantity cap) with ONE map-side-combined decimal sum.
    Every predicate pushes to the parquet scan; the plan has zero joins
    and zero wide exchanges — the query is whole-stage codegen end-to-end
    and scales linearly with lineitem bytes. Output: one row
    (revenue, n_lines)."""
    lo, hi = f"{year}-01-01", f"{year + 1}-01-01"
    filt = lineitem.where(
        (F.col("l_shipdate") >= lo)
        & (F.col("l_shipdate") < hi)
        & (_dec("l_discount") >= F.lit(disc_lo).cast("decimal(18,2)"))
        & (_dec("l_discount") <= F.lit(disc_hi).cast("decimal(18,2)"))
        & (F.col("l_quantity") < qty_max)
    )
    rev = (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
    return filt.agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    *,
    nation_a: str = "NATION_11",
    nation_b: str = "NATION_12",
    year_lo: int = 1996,
    year_hi: int = 1997,
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — lineitem resolves its supplier's nation through a broadcast
    dim chain, the customer's nation arrives through the orders join, and
    the cross-nation OR predicate keeps exactly the two directed pairs.
    The two fact tables (lineitem, orders) meet in ONE shuffle_hash join
    on orderkey; everything else is broadcast. Output:
    (supp_nation, cust_nation, l_year, revenue)."""
    nat = nation.select("n_nationkey", "n_name").where(
        F.col("n_name").isin(nation_a, nation_b)
    )
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    li = (
        lineitem.where(
            (F.col("l_shipdate") >= f"{year_lo}-01-01")
            & (F.col("l_shipdate") < f"{year_hi + 1}-01-01")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "l_orderkey",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
            (
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("decimal(18,4)").alias("volume"),
        )
    )
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


def market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    target_nation: str = "NATION_1",
    region_name: str = "ASIA",
    part_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for a part
    type, by order year — the share is a conditional-sum over the same
    grouped decimal volume (numerator = target-nation suppliers only).
    All dimensions broadcast; the single wide exchange is the
    lineitem ⋈ orders shuffle_hash join on orderkey. The share is emitted
    as floor(num*1e6/den) over doubles (IEEE-identical across engines —
    the float-portability discipline). Output:
    (o_year, share_micro, volume)."""
    dim = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(dim), customer.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey")
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    snat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_type") == part_type).select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(snat), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "supp_nation",
            (
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("decimal(18,4)").alias("volume"),
        )
    )
    grouped = (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == target_nation, F.col("volume"))
                .otherwise(F.lit(0).cast("decimal(18,4)"))
            ).alias("num"),
            F.sum("volume").alias("den"),
        )
    )
    return grouped.select(
        "o_year",
        F.floor(
            F.col("num").cast("double") * 1000000.0 / F.col("den").cast("double")
        ).cast("long").alias("share_micro"),
        F.col("den").cast("double").alias("volume"),
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_lo: str = "1997-10-01",
    date_hi: str = "1998-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter — returnflag + order-date filters push to the scans, the two
    fact tables meet in one shuffle_hash join on orderkey, and the
    grouped decimal revenue rolls up per customer with the nation name
    arriving via broadcast. Deterministic top-k (revenue desc, unique
    custkey asc). Output: (c_custkey, c_name, n_name, c_acctbal,
    revenue)."""
    o = orders.where(
        (F.col("o_orderdate") >= date_lo) & (F.col("o_orderdate") < date_hi)
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).cast("decimal(18,4)").alias("rev"),
    )
    per_cust = (
        o.join(li.hint("shuffle_hash"), o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("revenue"))
    )
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_acctbal",
            F.col("revenue").cast("double").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    month_lo: str = "1997-09-01",
    month_hi: str = "1997-10-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: promotional parts' share of one month's revenue —
    the ship-date window pushes to the lineitem scan, part broadcasts
    with only (p_partkey, is-promo), and the share is one conditional
    decimal aggregate. Emitted as floor(num*1e6/den) over doubles (the
    float-portability discipline). Output: one row
    (promo_share_micro, revenue, n_lines)."""
    li = lineitem.where(
        (F.col("l_shipdate") >= month_lo) & (F.col("l_shipdate") < month_hi)
    ).select(
        "l_partkey",
        (
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).cast("decimal(18,4)").alias("rev"),
    )
    p = part.select(
        "p_partkey", (F.col("p_type") == promo_type).alias("is_promo")
    )
    agg = li.join(
        F.broadcast(p), li.l_partkey == p.p_partkey
    ).agg(
        F.sum(
            F.when(F.col("is_promo"), F.col("rev"))
            .otherwise(F.lit(0).cast("decimal(18,4)"))
        ).alias("num"),
        F.sum("rev").alias("den"),
        F.count("*").alias("n_lines"),
    )
    return agg.select(
        F.floor(
            F.col("num").cast("double") * 1000000.0 / F.col("den").cast("double")
        ).cast("long").alias("promo_share_micro"),
        F.col("den").cast("double").alias("revenue"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


def waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's columns): suppliers who
    were the SOLE returner on a finished multi-supplier order — the
    classic EXISTS (another supplier on the order) + NOT-EXISTS (another
    supplier also returned) double-correlated subquery, rewritten as ONE
    per-order aggregate: count distinct suppliers, count distinct
    RETURNING suppliers, keep orders with >=2 suppliers but exactly 1
    returner, then credit that returner. The triple self-join of the
    textbook formulation never materializes — lineitem shuffles once on
    orderkey and the qualifying-order set is tiny by construction.
    (The reference schema lacks l_receiptdate/l_commitdate, so 'kept
    waiting' is expressed via l_returnflag — the join/anti-join SHAPE is
    the point.) Output: (s_name, numwait)."""
    fin = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag")
    per_order = (
        li.join(fin.hint("shuffle_hash"), li.l_orderkey == fin.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("n_ret"),
            F.max(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("sole_ret"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_ret") == 1))
    )
    return (
        per_order.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            per_order.sole_ret == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def _ps_cost(p: Column, s: Column) -> Column:
    """Deterministic supply cost for a (partkey, suppkey) pair — the
    partsupp surrogate this schema lacks: cost = ((p*31 + s*17) % 1000)
    / 100 + 1, emitted as decimal(18,2) so both engines fold it
    exactly."""
    return (
        (((p * 31 + s * 17) % 1000) / F.lit(100.0) + 1)
        .cast("decimal(18,2)")
    )


def _ps_availqty(p: Column, s: Column) -> Column:
    """Deterministic available quantity for a (partkey, suppkey) pair
    (the Q20 partsupp surrogate): (p*13 + s*7) % 500."""
    return ((p * 13 + s * 7) % 500).cast("long")


def product_profit(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year — revenue
    minus supply cost x quantity, rolled up (n_name, o_year). The supply
    cost comes from the deterministic partsupp surrogate (this schema
    carries the (partkey, suppkey) relation implicitly on lineitem), so
    the aggregation shape is Q9's exactly: fact ⋈ fact on orderkey
    (shuffle_hash), supplier-nation dim chain broadcast, one grouped
    decimal sum. Output: (n_name, o_year, profit)."""
    snat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    li = lineitem.join(
        F.broadcast(snat), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_orderkey",
        "n_name",
        (
            (
                _dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
            ).cast("decimal(18,4)")
            - (
                _ps_cost(F.col("l_partkey"), F.col("l_suppkey"))
                * _dec("l_quantity")
            ).cast("decimal(18,4)")
        ).alias("amount"),
    )
    o = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount").cast("double").alias("profit"))
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_3",
    fraction: str = "0.001",
) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's suppliers
    exceeds a FRACTION OF THE GLOBAL TOTAL (Q11's fraction shrinks with part count — a fixed percent excludes everything at scale) — the scalar-subquery-
    threshold pattern: the per-part value is one map-side-combined
    decimal groupBy over the distinct (partkey, suppkey) relation, the
    global total is a 1-row aggregate crossJoined back (broadcast by
    construction), and the HAVING compares decimals exactly. Stock value
    uses the deterministic partsupp surrogate (cost x availqty).
    Output: (p_partkey, stock_value)."""
    snat = supplier.join(
        F.broadcast(
            nation.where(F.col("n_name") == nation_name).select("n_nationkey")
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    ps = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .withColumn(
            "value",
            (
                _ps_cost(F.col("l_partkey"), F.col("l_suppkey"))
                * _ps_availqty(F.col("l_partkey"), F.col("l_suppkey"))
            ).cast("decimal(18,2)"),
        )
    )
    nat_value = (
        ps.join(F.broadcast(snat), ps.l_suppkey == snat.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("value").alias("stock_value"))
    )
    total = nat_value.agg(F.sum("stock_value").alias("grand"))
    return (
        nat_value.crossJoin(F.broadcast(total))
        .where(
            F.col("stock_value")
            > F.col("grand") * F.lit(fraction).cast("decimal(8,4)")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("stock_value").cast("double").alias("stock_value"),
        )
    )


def promotion_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    *,
    part_type: str = "PROMO",
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess stock of promotional
    parts — the double-nested EXISTS decorrelated into aggregate joins:
    per-(part, supplier) shipped quantity for the year (one
    map-side-combined groupBy over the date-pruned scan), the availqty
    surrogate compared row-wise (availqty > shipped/2, kept all-decimal
    as 2*availqty > shipped), then DISTINCT qualifying suppliers join
    the name dim. Output: (s_suppkey, s_name, n_parts)."""
    promo = part.where(F.col("p_type") == part_type).select("p_partkey")
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= f"{year}-01-01")
            & (F.col("l_shipdate") < f"{year + 1}-01-01")
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("shipped"))
    )
    qual = shipped.where(
        (2 * _ps_availqty(F.col("l_partkey"), F.col("l_suppkey")))
        > F.col("shipped")
    )
    return (
        qual.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_parts"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_parts").cast("long"))
    )


SHIP_MODES = ("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR")


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    *,
    region_name: str = "EUROPE",
    max_size: int = 15,
    part_type: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the minimum-cost supplier
    within one region — the correlated MIN subquery decorrelated into a
    grouped argmin + tie-keeping join-back. The (partkey, suppkey)
    relation is implicit on lineitem (DISTINCT pairs) with the
    deterministic cost surrogate; the region's supplier set is a
    dim-chain broadcast (region -> nation -> supplier), and the filtered
    part table broadcasts too, so the only corpus-scale exchange is the
    DISTINCT pair extraction itself (map-side combinable). Ties on
    minimum cost are KEPT, as in Q2. Output: (s_acctbal, s_name, n_name,
    p_partkey, p_name, supplycost)."""
    rnat = nation.join(
        F.broadcast(
            region.where(F.col("r_name") == region_name).select("r_regionkey")
        ),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    rsupp = supplier.join(
        F.broadcast(rnat), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = part.where(
        (F.col("p_size") <= max_size) & (F.col("p_type") == part_type)
    ).select("p_partkey", "p_name")
    ps = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(rsupp), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "supplycost", _ps_cost(F.col("l_partkey"), F.col("l_suppkey"))
        )
    )
    min_cost = ps.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("supplycost").alias("mc")
    )
    return (
        ps.join(
            min_cost.hint("shuffle_hash"),
            (ps.l_partkey == F.col("mk")) & (ps.supplycost == F.col("mc")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_name",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
    )


def shipmode_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    *,
    year: int = 1997,
    modes: tuple[str, str] = ("MAIL", "SHIP"),
) -> DataFrame:
    """TPC-H Q12 shape: order-priority counts by ship mode — the schema
    carries no l_shipmode, so the mode is a deterministic surrogate
    element_at(SHIP_MODES, (l_orderkey*7 + l_linenumber) % 7 + 1),
    computed identically in the DuckDB oracle. The CASE-split counts
    (urgent/high vs other) are one map-side-combined aggregate after the
    fact-fact orderkey join, pinned shuffle_hash: at 10^12 lineitems both
    sides are corpus-scale and a planner broadcast of either would be the
    scale-killer. Output: (shipmode, high_line_count, low_line_count)."""
    mode = F.element_at(
        F.array(*[F.lit(m) for m in SHIP_MODES]),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 7 + 1).cast("int"),
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= f"{year}-01-01")
        & (F.col("l_shipdate") < f"{year + 1}-01-01")
    ).select("l_orderkey", mode.alias("shipmode")).where(
        F.col("shipmode").isin(*modes)
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority").hint("shuffle_hash"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue over a DISJUNCTION of three
    (brand, size-bracket, quantity-bracket) conjunctions. The part side
    is pre-filtered to the union of the three brand/size envelopes before
    the broadcast join (so the broadcast is the qualifying slice, never
    the full part table), and the residual OR-of-ANDs predicate — the
    part of Q19 Catalyst cannot push into either scan alone because it
    spans both tables — evaluates post-join in codegen. One decimal sum.
    Output: one row (revenue, n_lines)."""
    brackets = [
        ("Brand#12", 5, 1, 11),
        ("Brand#23", 10, 10, 20),
        ("Brand#4", 15, 20, 30),
    ]
    part_pred = None
    joint_pred = None
    for brand, size_max, q_lo, q_hi in brackets:
        pp = (F.col("p_brand") == brand) & (F.col("p_size") <= size_max) & (
            F.col("p_size") >= 1
        )
        jp = pp & (F.col("l_quantity") >= q_lo) & (F.col("l_quantity") <= q_hi)
        part_pred = pp if part_pred is None else (part_pred | pp)
        joint_pred = jp if joint_pred is None else (joint_pred | jp)
    parts = part.where(part_pred).select("p_partkey", "p_brand", "p_size")
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .where(joint_pred)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def idle_customers(
    customer: DataFrame, orders: DataFrame, *, since: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no RECENT orders,
    rolled up by nation (the schema's stand-in for Q22's phone country
    code; this corpus has no order-less customers at all, so the NOT
    EXISTS is date-pruned — same decorrelation, non-degenerate output).
    The scalar AVG subquery over positive balances becomes a 1-row
    aggregate crossJoined back (broadcast by construction); the
    positive-balance average is summed in decimal then divided in DOUBLE
    on both engines so the threshold is IEEE-identical. NOT EXISTS is a
    LEFT ANTI join on custkey, pinned shuffle_hash — at scale both
    customer and orders are corpus-sized, and the planner must never
    broadcast the distinct-custkey side. Output: (cntrycode, numcust,
    totacctbal)."""
    bal = _dec("c_acctbal")
    thresh = customer.where(F.col("c_acctbal") > 0).agg(
        (F.sum(bal).cast("double") / F.count("*")).alias("avg_bal")
    )
    rich = customer.crossJoin(F.broadcast(thresh)).where(
        F.col("c_acctbal").cast("double") > F.col("avg_bal")
    )
    never = rich.join(
        orders.where(F.col("o_orderdate") >= since)
        .select("o_custkey")
        .hint("shuffle_hash"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return never.groupBy(
        F.col("c_nationkey").cast("int").alias("cntrycode")
    ).agg(
        F.count("*").alias("numcust"),
        F.sum(bal).cast("double").alias("totacctbal"),
    )


def outline_numbering(
    headings: DataFrame,
    doc_col: str = "doc_id",
    pos_col: str = "pos",
    level_col: str = "level",
) -> DataFrame:
    """Hierarchical outline reconstruction: turn a flat heading stream
    (doc, position, level 1..3) into the dotted section numbers a
    structured legal document renders ("2", "2.1", "2.1.3") — the
    document-outline analogue of the reference's reading-order sort
    (text_processing_service.py top-to-bottom block ordering) applied to
    section nesting instead of page geometry.

    Mechanics: the running count of level-1 headings is both the major
    number and the GROUP id that scopes level-2 numbering (a level-2
    counter restarts where a new level-1 opens); likewise levels 1+2
    scope level-3. Three cumulative-sum windows, all PARTITIONED BY
    DOCUMENT — each window sorts only one document's headings (bounded by
    document size, never corpus-scale), so unlike a global rank this
    shape survives 100x: the shuffle is a hash exchange on doc_id and
    every sort is a few dozen rows.

    Output: (doc, pos, level, n1, n2, n3, outline).
    """
    d, p, lv = F.col(doc_col), F.col(pos_col), F.col(level_col)
    w = Window.partitionBy(doc_col).orderBy(pos_col)
    n1 = F.sum(F.when(lv == 1, 1).otherwise(0)).over(w)
    grp1 = n1  # level-1 group the heading belongs to
    w2 = Window.partitionBy(doc_col, grp1).orderBy(pos_col)
    n2 = F.sum(F.when(lv == 2, 1).otherwise(0)).over(w2)
    grp2 = F.sum(F.when(lv <= 2, 1).otherwise(0)).over(w)
    w3 = Window.partitionBy(doc_col, grp2).orderBy(pos_col)
    n3 = F.sum(F.when(lv == 3, 1).otherwise(0)).over(w3)
    return (
        headings.select(
            d.alias(doc_col),
            p.alias(pos_col),
            lv.cast("int").alias(level_col),
            n1.cast("int").alias("n1"),
            n2.cast("int").alias("n2"),
            n3.cast("int").alias("n3"),
        )
        .withColumn(
            "outline",
            F.when(lv == 1, F.col("n1").cast("string"))
            .when(
                lv == 2,
                F.concat_ws(".", F.col("n1").cast("string"),
                            F.col("n2").cast("string")),
            )
            .otherwise(
                F.concat_ws(".", F.col("n1").cast("string"),
                            F.col("n2").cast("string"),
                            F.col("n3").cast("string"))
            ),
        )
    )


def capture_intervals(
    captures: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
) -> DataFrame:
    """SCD2 interval construction over a capture history: collapse each
    URL's consecutive same-content captures into one validity interval
    (a recrawl that found no change EXTENDS the open interval; a content
    change CLOSES it) and emit (valid_from, valid_to, version,
    is_current) — the slowly-changing-dimension the crawl-store side of
    the pipeline (cdx_revisits, latest_capture) queries by AS-OF date.

    Mechanics: lag(hash) flags change points, a cumulative sum of flags
    numbers the versions, min(ts) per version opens the interval and
    lead() closes it against the next version's open. All three windows
    are PARTITIONED BY URL — bounded by captures-per-URL, never
    corpus-wide, so the only exchange at 100 TB is one hash shuffle on
    the key and each sort is a handful of rows.

    Output: (url, version, content_hash, valid_from, valid_to,
    n_captures, is_current); valid_to is NULL on the open interval.
    """
    k, t, h = F.col(key_col), F.col(ts_col), F.col(hash_col)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    changed = F.when(
        F.lag(h).over(w).isNull() | (F.lag(h).over(w) != h), 1
    ).otherwise(0)
    runs = captures.select(
        k.alias(key_col),
        t.alias(ts_col),
        h.alias(hash_col),
        F.sum(changed).over(w).alias("version"),
    )
    grouped = runs.groupBy(key_col, "version").agg(
        F.first(hash_col).alias(hash_col),
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_captures"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return grouped.select(
        key_col,
        F.col("version").cast("int").alias("version"),
        hash_col,
        F.col("valid_from").cast("long").alias("valid_from"),
        F.lead(F.col("valid_from").cast("long")).over(wv).alias("valid_to"),
        F.col("n_captures").cast("long").alias("n_captures"),
        F.lead("version").over(wv).isNull().cast("int").alias("is_current"),
    )


def profile_columns(df: DataFrame, *, exact_distinct: bool = True) -> DataFrame:
    """Single-pass data profile of EVERY column: null count, distinct
    count, and type-encoded min/max — the schema-driven quality gate a
    pipeline runs on each new corpus drop before anything downstream
    trusts it (nulls where there should be none, cardinality collapse,
    out-of-range values all surface here).

    One global aggregate computes all columns' stats in a single scan
    (no per-column jobs); the one wide row is then exploded to a
    (col_name, ...) row per column — driver never sees data, just the
    K-struct row. Min/max are encoded per type so the emit is
    engine-portable: integers/timestamps as bigint (epoch seconds, UTC
    session), doubles as floor(x*1e6) micro-units, strings raw — all
    rendered to one string column pair.

    ``exact_distinct=True`` plans Spark's Expand (one replicate per
    distinct aggregate): exact NDV, the oracle-checked contract, right
    up to mid-scale. At 100 TB pass ``exact_distinct=False`` — the
    profile stays one pure map-side-combinable pass (no Expand) and
    NDV is approx_count_distinct (HLL++, 1-2% rsd), the same trade the
    kmv/hll sketch family documents. Output: (col_name, n_rows,
    n_nulls, n_distinct, min_repr, max_repr).
    """
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    def _enc(name: str, dtype) -> Column:
        # typed (numeric stays numeric so min/max order numerically —
        # stringification happens AFTER the aggregate)
        c = F.col(name)
        if isinstance(dtype, (DoubleType, FloatType)):
            return F.floor(c * F.lit(1000000.0)).cast("long")
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            # NTZ needs the LTZ hop to reach epoch seconds; callers pin
            # the session to UTC (registry _utc) for portable values
            return c.cast("timestamp").cast("long")
        if isinstance(dtype, StringType):
            return c
        return c.cast("long")

    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for f in df.schema.fields:
        enc = _enc(f.name, f.dataType)
        nd = (
            F.countDistinct(F.col(f.name))
            if exact_distinct
            else F.approx_count_distinct(F.col(f.name))
        )
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(f.name))).alias(f"__nn_{f.name}"),
            nd.alias(f"__nd_{f.name}"),
            F.min(enc).cast("string").alias(f"__mi_{f.name}"),
            F.max(enc).cast("string").alias(f"__ma_{f.name}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(f.name).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            F.col(f"__nn_{f.name}").alias("n_nulls"),
            F.col(f"__nd_{f.name}").alias("n_distinct"),
            F.col(f"__mi_{f.name}").alias("min_repr"),
            F.col(f"__ma_{f.name}").alias("max_repr"),
        )
        for f in df.schema.fields
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def pareto_frontier(
    df: DataFrame,
    id_col: str,
    q_col: str,
    l_col: str,
) -> DataFrame:
    """2-D Pareto frontier (skyline) under maximize-both dominance: keep a
    row iff no other row is >= on both integer dimensions and > on at
    least one — the curation shape for "best documents per cost": nothing
    on the frontier is beaten on quality without giving up length (Börzsönyi
    et al., ICDE 2001's SKYLINE operator, restated in DataFrame algebra).

    Scale shape — the skyline collapses to a BOUNDED problem before any
    sort: (1) per-q maxima via ONE map-side-combined groupBy on the
    integer q key (ties on q are resolved here — only the longest row at
    each quality level can survive); (2) the strictly-higher-q running max
    is a window over the per-q MAXIMA table, whose row count is bounded by
    the q DOMAIN (an integer score: thousands of values, not corpus rows)
    — the documented bounded-domain exception to the no-unpartitioned-
    window rule, same contract as grouped_quantiles' threshold table;
    (3) survivors [(q, lmax) with lmax > every higher-q lmax] join back by
    broadcast LEFT SEMI — bounded by the q domain, the legitimate
    small-dim broadcast. The corpus is scanned once and shuffled once (on
    the short q key). Ties on (q, l) all survive (they dominate nothing
    and nothing dominates them).

    Output: (id_col, q_col, l_col) rows on the frontier.
    """
    base = df.select(
        F.col(id_col),
        F.col(q_col).cast("long").alias(q_col),
        F.col(l_col).cast("long").alias(l_col),
    )
    qmax = base.groupBy(q_col).agg(F.max(l_col).alias("_lmax"))
    w = (
        Window.orderBy(F.col(q_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    front = (
        qmax.withColumn("_hi", F.max("_lmax").over(w))
        .where(F.col("_hi").isNull() | (F.col("_lmax") > F.col("_hi")))
        .select(q_col, F.col("_lmax").alias(l_col))
    )
    return base.join(F.broadcast(front), [q_col, l_col], "left_semi").select(
        id_col, q_col, l_col
    )


def score_calibration(
    df: DataFrame,
    group_col: str,
    score_col: str,
) -> DataFrame:
    """Per-group percentile calibration of an integer score — the
    cross-source comparability fix for quality scores: a raw score of
    1,500 means "top decile" on one host and "median boilerplate" on
    another, so curation thresholds must cut on the WITHIN-GROUP
    percentile, not the raw value (the quantile-normalization step of
    mixed-source corpus assembly).

    Scale shape (the grouped_quantiles sketch, applied row-wise): the
    full per-group score DISTRIBUTION is bounded by the score domain,
    not the corpus — groupBy(group, score) counts are a mergeable
    map-side-combined sketch; the cumulative window runs over that
    bounded table; the row-level percentile comes from ONE shuffle_hash
    join back on (group, score) — never a rank/cume_dist window over
    raw rows (a corpus-scale sort-per-group straggler, the
    length_ntiles lesson).

    pct_micro = floor(1e6 * cum_count_at_score / group_n) — the integer
    cume_dist; all arithmetic exact and portable.

    Output: df's columns + pct_micro.
    """
    g, s = F.col(group_col), F.col(score_col)
    dist = df.groupBy(g.alias("_sc_grp"), s.alias("_sc_val")).agg(
        F.count("*").alias("_sc_cnt")
    )
    w_cum = Window.partitionBy("_sc_grp").orderBy("_sc_val")
    w_all = Window.partitionBy("_sc_grp")
    cum = dist.select(
        "_sc_grp",
        "_sc_val",
        F.floor(
            F.sum("_sc_cnt").over(w_cum)
            * 1000000
            / F.sum("_sc_cnt").over(w_all)
        )
        .cast("long")
        .alias("pct_micro"),
    )
    return df.join(
        cum.hint("shuffle_hash"),
        (g == F.col("_sc_grp")) & (s == F.col("_sc_val")),
    ).drop("_sc_grp", "_sc_val")


# ---------------------------------------------------------------------------
# privacy / data-quality census (round 4, session 11)
# ---------------------------------------------------------------------------


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    *,
    k: int = 5,
    report_col: str = "source",
) -> DataFrame:
    """k-anonymity census over a quasi-identifier combination — the
    release-readiness gauge of a training corpus that carries metadata
    columns (host, language, length band, capture date): a QI group
    smaller than ``k`` re-identifies its members, so curation must
    suppress or generalize those rows before the corpus ships.

    Parity anchor: the reference exposes per-document metadata verbatim
    (app/services/document_service.py:83-229 list/filter surface); this
    is the aggregate audit a release pipeline runs over that surface.

    Scale shape: one map-side-combined groupBy on the QI tuple (the
    group table is bounded by the QI domain, not the corpus), then a
    second tiny groupBy on ``report_col``. Nothing is broadcast, no
    window, no per-row join back — at 100 TB both aggregations are
    partial-aggregated before their single shuffle each.

    Output per ``report_col`` value: n_rows, n_groups, risky_groups
    (size < k), risky_rows, risk_ppm = floor(1e6 * risky_rows / n_rows).
    All-integer arithmetic (engine-portable).
    """
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").alias("_ka_n")
    )
    risky = F.when(F.col("_ka_n") < k, 1).otherwise(0)
    return (
        groups.groupBy(F.col(report_col))
        .agg(
            F.sum("_ka_n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum(risky).cast("long").alias("risky_groups"),
            F.sum(risky * F.col("_ka_n")).cast("long").alias("risky_rows"),
        )
        .select(
            report_col,
            "n_rows",
            "n_groups",
            "risky_groups",
            "risky_rows",
            F.floor(F.col("risky_rows") * 1000000 / F.col("n_rows"))
            .cast("long")
            .alias("risk_ppm"),
        )
    )


def fd_violations(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency discovery over a bounded candidate list —
    the schema-profiling primitive (does determinant -> dependent hold,
    and how many rows must change to repair it?) used to spot duplicate
    natural keys and denormalization drift before a corpus join fans
    out unexpectedly.

    For each (det, dep) pair: a group is VIOLATING when the determinant
    value maps to >1 distinct dependent value; ``repair_rows`` is the
    classic G3 measure (rows minus the modal dependent's count, summed
    over groups) — the minimum row deletions that would make the FD
    hold exactly.

    Scale shape: per pair, groupBy(det, dep) -> counts is map-side
    combined and bounded by the pair's active domain; the second
    groupBy(det) runs on that bounded table; the final per-pair rollup
    is a scalar aggregate. The Python loop is over the BOUNDED pair
    list (schema-sized, never data-sized) and unions plan fragments —
    one Spark job total. No broadcast, no window.

    Output per pair: fd (det->dep), n_groups, violating_groups,
    repair_rows, holds (0/1). All-integer.
    """
    outs = []
    for det, dep in pairs:
        pair_counts = df.groupBy(
            F.col(det).cast("string").alias("_fd_det"),
            F.col(dep).cast("string").alias("_fd_dep"),
        ).agg(F.count("*").alias("_fd_n"))
        per_det = pair_counts.groupBy("_fd_det").agg(
            F.count("*").alias("_fd_vals"),
            F.sum("_fd_n").alias("_fd_rows"),
            F.max("_fd_n").alias("_fd_modal"),
        )
        outs.append(
            per_det.agg(
                F.lit(f"{det}->{dep}").alias("fd"),
                F.count("*").cast("long").alias("n_groups"),
                F.sum(F.when(F.col("_fd_vals") > 1, 1).otherwise(0))
                .cast("long")
                .alias("violating_groups"),
                F.sum(F.col("_fd_rows") - F.col("_fd_modal"))
                .cast("long")
                .alias("repair_rows"),
            ).select(
                "fd",
                "n_groups",
                "violating_groups",
                "repair_rows",
                F.when(F.col("violating_groups") == 0, 1)
                .otherwise(0)
                .cast("long")
                .alias("holds"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    lo_ppm: int = 50000,
    hi_ppm: int = 950000,
) -> DataFrame:
    """Per-group winsorized mean of a bounded-domain integer column —
    the outlier-robust length/latency dashboard (a handful of 100 MB
    pages must not drag a host's mean page size).

    Thresholds come from the grouped_quantiles distribution sketch
    (EXACT discrete quantiles, bounded by the value domain — see
    grouped_quantiles for the 100 TB argument); clamping and summing
    then run on the SAME bounded (group, value, count) table, so the
    raw rows are scanned exactly once (for the sketch) and never again.
    No sort-per-group window anywhere.

    winsorized_mean_micro = floor(1e6 * clamped_sum / n) — all-integer.

    Output: (group, n_rows, lo, hi, winsorized_sum,
    winsorized_mean_micro).
    """
    g, v = F.col(group_col), F.col(value_col)
    dist = df.groupBy(g.alias("_ws_grp"), v.alias("_ws_val")).agg(
        F.count("*").alias("_ws_cnt")
    )
    w_cum = Window.partitionBy("_ws_grp").orderBy("_ws_val")
    w_all = Window.partitionBy("_ws_grp")
    cum = dist.select(
        "_ws_grp",
        "_ws_val",
        "_ws_cnt",
        F.sum("_ws_cnt").over(w_cum).alias("_ws_cum"),
        F.sum("_ws_cnt").over(w_all).alias("_ws_n"),
    )
    lo_need = F.expr(f"({lo_ppm} * _ws_n + 999999) div 1000000")
    hi_need = F.expr(f"({hi_ppm} * _ws_n + 999999) div 1000000")
    th = cum.groupBy("_ws_grp").agg(
        F.max("_ws_n").cast("long").alias("n_rows"),
        F.min(F.when(F.col("_ws_cum") >= lo_need, F.col("_ws_val")))
        .cast("long")
        .alias("lo"),
        F.min(F.when(F.col("_ws_cum") >= hi_need, F.col("_ws_val")))
        .cast("long")
        .alias("hi"),
    )
    clamped = (
        dist.join(th.hint("shuffle_hash"), dist["_ws_grp"] == th["_ws_grp"])
        .drop(th["_ws_grp"])
        .select(
            "_ws_grp",
            "n_rows",
            "lo",
            "hi",
            (
                F.greatest(F.least(F.col("_ws_val"), F.col("hi")), F.col("lo"))
                * F.col("_ws_cnt")
            ).alias("_ws_contrib"),
        )
    )
    return (
        clamped.groupBy(F.col("_ws_grp").alias(group_col))
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum("_ws_contrib").cast("long").alias("winsorized_sum"),
        )
        .select(
            group_col,
            "n_rows",
            "lo",
            "hi",
            "winsorized_sum",
            F.floor(F.col("winsorized_sum") * 1000000 / F.col("n_rows"))
            .cast("long")
            .alias("winsorized_mean_micro"),
        )
    )


def filter_agreement(
    df: DataFrame,
    keep_a,
    keep_b,
    group_col: str = "source",
) -> DataFrame:
    """Cohen's kappa between two keep/drop filters per group — the
    filter-comparison gauge every curation pipeline needs before
    swapping heuristics (does the classifier agree with the rule
    battery beyond chance? where do they diverge?). ``keep_a`` /
    ``keep_b`` are boolean Columns evaluated per row.

    kappa = (po - pe) / (1 - pe) over the 2x2 contingency: po =
    agreement rate, pe = chance agreement from the marginals.

    Portability/scale: the contingency is ONE map-side-combined
    groupBy(group) of four integer conditional counts; kappa is a
    per-group scalar expression over exact bigints — marginal products
    multiply as integers (exact), each rate divides in ONE pinned
    double operation, and the result is floored to micro units.
    Degenerate groups (pe = 1: both filters constant) emit kappa 0.

    Output: (group, n, both_keep, only_a, only_b, both_drop,
    kappa_micro).
    """
    a = keep_a.cast("int")
    b = keep_b.cast("int")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n11"),
        F.sum(a * (1 - b)).cast("long").alias("n10"),
        F.sum((1 - a) * b).cast("long").alias("n01"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n").cast(
        "double"
    )
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n00") + F.col("n10")) * (F.col("n00") + F.col("n01"))
    ).cast("double") / (F.col("n") * F.col("n")).cast("double")
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe)).otherwise(
        F.lit(0.0)
    )
    return g.select(
        F.col("grp").alias(group_col),
        "n",
        F.col("n11").alias("both_keep"),
        F.col("n10").alias("only_a"),
        F.col("n01").alias("only_b"),
        F.col("n00").alias("both_drop"),
        F.floor(kappa * 1000000).cast("long").alias("kappa_micro"),
    )


def partial_rollup(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """One group's mergeable aggregate state: (group, n_docs, sum_v,
    min_v, max_v) — every column merges algebraically (count/sum add,
    min/max fold), which is what makes ``merge_rollups`` exact. Means
    and other ratios are DERIVED at read time, never stored (a stored
    mean cannot merge)."""
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("sum_v"),
        F.min(F.col(value_col).cast("long")).cast("long").alias("min_v"),
        F.max(F.col(value_col).cast("long")).cast("long").alias("max_v"),
    )


def merge_rollups(
    state: DataFrame,
    batch: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Incremental rollup maintenance: merge yesterday's aggregate
    state with a new batch's partial aggregates — the mergeable-
    aggregate discipline that updates per-group stats over a 100 TB
    corpus WITHOUT rescanning history (the daily-rollup loop every
    production pipeline runs; the relational sibling of the mergeable
    HLL/KMV sketches). Both inputs carry ``partial_rollup`` columns.

    Merge rules are algebraic and engine-portable: counts and sums ADD,
    min/max FOLD through least/greatest with null-absorbing coalesce;
    the derived mean is exact integer div over the merged sums.

    Scale shape: ONE full-outer equi-join on the bounded group domain
    (state and batch aggregates are sketch-sized — the corpus was
    touched only by each side's one map-side-combined groupBy).

    Output: (group, n_docs, sum_v, min_v, max_v, mean_micro).
    """
    s = state.select(
        "grp",
        F.col("n_docs").alias("n_a"),
        F.col("sum_v").alias("s_a"),
        F.col("min_v").alias("mn_a"),
        F.col("max_v").alias("mx_a"),
    )
    b = batch.select(
        "grp",
        F.col("n_docs").alias("n_b"),
        F.col("sum_v").alias("s_b"),
        F.col("min_v").alias("mn_b"),
        F.col("max_v").alias("mx_b"),
    )
    m = s.join(b, "grp", "full_outer")
    n = F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))
    sm = F.coalesce("s_a", F.lit(0)) + F.coalesce("s_b", F.lit(0))
    return m.select(
        F.col("grp").alias(group_col),
        n.cast("long").alias("n_docs"),
        sm.cast("long").alias("sum_v"),
        F.least(
            F.coalesce("mn_a", F.col("mn_b")), F.coalesce("mn_b", F.col("mn_a"))
        )
        .cast("long")
        .alias("min_v"),
        F.greatest(
            F.coalesce("mx_a", F.col("mx_b")), F.coalesce("mx_b", F.col("mx_a"))
        )
        .cast("long")
        .alias("max_v"),
        F.expr(
            "(({s}) * 1000000L) div ({n})".format(
                s="coalesce(s_a, 0L) + coalesce(s_b, 0L)",
                n="coalesce(n_a, 0L) + coalesce(n_b, 0L)",
            )
        )
        .cast("long")
        .alias("mean_micro"),
    )


def grouped_ols(
    df: DataFrame,
    x,
    y,
    group_col: str = "source",
) -> DataFrame:
    """Per-group ordinary-least-squares fit y = slope*x + intercept via
    sufficient statistics — the closed-form, single-scan way to train a
    linear model over a 100 TB corpus (the training half of the quality
    regression story; ``quality_classifier`` is the inference half).
    No iteration, no driver-side data: every coefficient derives from
    five mergeable sums.

    Portability/scale: ONE map-side-combined groupBy(group) collects
    exact bigint sums (n, Sx, Sy, Sxx, Sxy, Syy); slope / intercept /
    r² are then per-group scalar expressions. The Cramer numerators
    and denominators multiply as exact bigints; each final ratio is
    evaluated in DOUBLES with a fixed operation order (cast, *1e6,
    divide, floor) so both engines IEEE-round identically. Groups with
    a degenerate x or y variance emit nulls.

    Output: (group, n, slope_micro, intercept_micro, r2_micro).
    """
    xl = x.cast("long")
    yl = y.cast("long")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(xl).cast("long").alias("sx"),
        F.sum(yl).cast("long").alias("sy"),
        F.sum(xl * xl).cast("long").alias("sxx"),
        F.sum(xl * yl).cast("long").alias("sxy"),
        F.sum(yl * yl).cast("long").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    # intercept = (Sy - slope*Sx)/n; the n cancels: (Sy*Sxx - Sx*Sxy)/den
    ibn = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    slope = F.floor(num.cast("double") * 1000000.0 / den.cast("double"))
    intercept = F.floor(
        ibn.cast("double") * 1000000.0 / den.cast("double")
    )
    r2 = F.floor(
        num.cast("double")
        * num.cast("double")
        * 1000000.0
        / (den.cast("double") * deny.cast("double"))
    )
    ok = (den > 0) & (deny > 0)
    return g.select(
        F.col("grp").alias(group_col),
        "n",
        F.when(ok, slope).cast("long").alias("slope_micro"),
        F.when(ok, intercept).cast("long").alias("intercept_micro"),
        F.when(ok, r2).cast("long").alias("r2_micro"),
    )


def capture_hazard(captures: DataFrame) -> DataFrame:
    """Discrete-time survival (hazard) table over a recrawl capture
    history: at each capture step k, how many urls were still under
    observation and unchanged (at risk), and how many changed content
    for the first time (deaths). This is the Kaplan-Meier life table a
    recrawl scheduler fits change-rate priors from — urls whose history
    simply ends are right-censored, not deaths.

    Input: (url, cap_idx, content_hash) with cap_idx 1-based per url.

    Scale shape: ONE url-partitioned window (per-url capture lists are
    tiny and hash-distributed) finds each url's first-change step, ONE
    map-side-combined groupBy(url) folds that to (last_alive, died),
    and the life table itself lives on the BOUNDED step domain (max
    captures per url), where the suffix-sum window is the documented
    bounded-domain exception. hazard is exact integer micro-division.

    Output: (step, at_risk, deaths, hazard_micro) for steps >= 2.
    """
    w = Window.partitionBy("url").orderBy("cap_idx")
    marked = captures.select(
        "url",
        F.col("cap_idx").cast("long").alias("cap_idx"),
        F.when(
            F.lag("content_hash").over(w).isNotNull()
            & (F.col("content_hash") != F.lag("content_hash").over(w)),
            F.col("cap_idx").cast("long"),
        ).alias("chg"),
    )
    per_url = marked.groupBy("url").agg(
        F.max("cap_idx").alias("n_caps"),
        F.min("chg").alias("death_step"),
    )
    per_url = per_url.select(
        F.coalesce(
            F.col("death_step"), F.col("n_caps")
        ).alias("last_alive"),
        F.col("death_step").isNotNull().cast("long").alias("died"),
        F.col("death_step"),
    )
    by_last = per_url.groupBy("last_alive").agg(
        F.count("*").cast("long").alias("ending_here"),
        F.sum("died").cast("long").alias("deaths_here"),
    )
    sw = (
        Window.orderBy(F.col("last_alive").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    life = by_last.select(
        F.col("last_alive").alias("step"),
        F.sum("ending_here").over(sw).cast("long").alias("at_risk"),
        F.col("deaths_here").alias("deaths"),
    )
    return life.where(F.col("step") >= 2).select(
        "step",
        "at_risk",
        "deaths",
        F.expr("(deaths * 1000000L) div at_risk")
        .cast("long")
        .alias("hazard_micro"),
    )


def logreg_train_gd(
    df: DataFrame,
    x,
    y,
    *,
    iters: int = 2,
    lr_den: int = 10,
) -> DataFrame:
    """Distributed logistic-regression training by batch gradient
    descent — the ITERATIVE sibling of ``grouped_ols``: each iteration
    is ONE full scan producing two exact-bigint gradient sums; the
    model (two weights) lives on the driver as a scalar artifact, like
    ``lm_scores``' bounded LM. ``iters`` is deliberately small and
    bounded (classifier fine-tuning on engineered features converges in
    a few steps; this is not a deep-learning loop — each round costs a
    corpus scan, so the intended regime is iters <= ~10).

    Portability: the logistic sigmoid needs exp(), which is NOT
    IEEE-reproducible across engines — so training uses the standard
    piecewise-linear surrogate sigma(z) ~ clamp(1/2 + z/4, 0, 1)
    (the first-order Taylor expansion, hard-clamped), making every
    quantity exact integer micro arithmetic: z_micro = w0 + w1*x,
    sigma_ppm = clamp(500000 + z div 4, 0, 1e6), err = y*1e6 - sigma,
    gradients Sum(err) and Sum(err*x) as bigints, updates
    w += g div (lr_den * n) (trunc-toward-zero div matches both
    engines for negative gradients too).

    Output: ONE row (n, w0_micro, w1_micro, predicted_pos, correct) —
    final weights plus training-set confusion summary under the 1/2
    threshold.
    """
    xl = x.cast("long")
    yl = y.cast("long")
    feats = df.select(xl.alias("x"), yl.alias("y"))
    n = feats.count()
    w0, w1 = 0, 0
    for _ in range(iters):
        z = F.lit(w0) + F.lit(w1) * F.col("x")
        sig = F.least(
            F.lit(1000000),
            F.greatest(F.lit(0), F.lit(500000) + F.expr(f"({w0}L + {w1}L * x) div 4")),
        )
        err = F.col("y") * 1000000 - sig
        g = feats.agg(
            F.sum(err).cast("long").alias("g0"),
            F.sum(err * F.col("x")).cast("long").alias("g1"),
        ).collect()[0]
        w0 += g["g0"] // (lr_den * n) if g["g0"] >= 0 else -((-g["g0"]) // (lr_den * n))
        w1 += g["g1"] // (lr_den * n) if g["g1"] >= 0 else -((-g["g1"]) // (lr_den * n))
    sig = F.least(
        F.lit(1000000),
        F.greatest(F.lit(0), F.lit(500000) + F.expr(f"({w0}L + {w1}L * x) div 4")),
    )
    pred = (sig >= 500000).cast("long")
    return feats.agg(
        F.count("*").cast("long").alias("n"),
        F.lit(w0).cast("long").alias("w0_micro"),
        F.lit(w1).cast("long").alias("w1_micro"),
        F.sum(pred).cast("long").alias("predicted_pos"),
        F.sum((pred == F.col("y")).cast("long")).cast("long").alias("correct"),
    )


def filter_ensemble(
    df: DataFrame,
    rules,
) -> DataFrame:
    """Majority-vote filter ensemble with leave-one-out marginals — the
    which-rule-actually-matters gauge of a curation battery: for each
    rule, how often does REMOVING it flip the majority keep/drop
    verdict? A rule with zero flips is redundant (drop it and save its
    scan cost); a rule with many flips is load-bearing and deserves its
    own quality audit. ``rules`` is a list of (name, boolean Column).

    Semantics (stated, integer-exact): keep iff 2*votes > n_rules;
    leave-one-out keep iff 2*(votes - v_r) > n_rules - 1.

    Scale shape: ONE projection computes all vote bits, ONE scalar
    aggregate folds every count, and the per-rule rows explode from
    that single row (the split_leakage shape — a union of per-rule
    selects would rescan the corpus per rule).

    Output: one row per rule — (rule, n, keep_rate_ppm,
    majority_keep_ppm, loo_flips, flip_ppm).
    """
    n_rules = len(rules)
    proj = df.select(
        *[r[1].cast("int").alias(f"v{i}") for i, r in enumerate(rules)]
    )
    votes = sum(F.col(f"v{i}") for i in range(n_rules))
    keep = (votes * 2 > n_rules).cast("int")
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum(keep).cast("long").alias("n_keep"),
    ]
    for i in range(n_rules):
        loo = ((votes - F.col(f"v{i}")) * 2 > n_rules - 1).cast("int")
        aggs.append(F.sum(F.col(f"v{i}")).cast("long").alias(f"k{i}"))
        aggs.append(
            F.sum((keep != loo).cast("int")).cast("long").alias(f"f{i}")
        )
    tot = proj.agg(*aggs)
    per = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(rules[i][0]).alias("rule"),
                    F.col(f"k{i}").alias("rk"),
                    F.col(f"f{i}").alias("rf"),
                )
                for i in range(n_rules)
            ]
        )
    ).alias("p")
    return tot.select("n", "n_keep", per).select(
        F.col("p.rule").alias("rule"),
        "n",
        F.expr("(p.rk * 1000000L) div n").cast("long").alias("keep_rate_ppm"),
        F.expr("(n_keep * 1000000L) div n")
        .cast("long")
        .alias("majority_keep_ppm"),
        F.col("p.rf").cast("long").alias("loo_flips"),
        F.expr("(p.rf * 1000000L) div n").cast("long").alias("flip_ppm"),
    )


def percentile_normalize(
    df: DataFrame,
    value_col: str = "n_chars",
    key_col: str = "doc_id",
) -> DataFrame:
    """Exact percentile normalization: map every row's value to its
    corpus percentile in ppm (cume_dist as integer arithmetic) — the
    score-calibration step that makes heterogeneous quality signals
    comparable before thresholding or mixing.

    Scale trick (grouped_quantiles discipline): the naive formulation is
    cume_dist() over a corpus-wide sort. For a bounded-domain integer
    column the DISTRIBUTION is small: groupBy(value) -> counts, ONE
    cumulative window over the bounded distinct-value table, then a
    shuffle_hash join of the tiny (value, pct) map back to the rows —
    never a corpus sort. pct_ppm = cum_count(<= v) * 1e6 div n: exact.

    Output: df's key + value + pct_ppm.
    """
    v = F.col(value_col)
    # bounded distinct-value table; feeds BOTH the total and the cum map
    dist = df.groupBy(v.alias("val")).agg(F.count("*").alias("cnt")).persist()
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = dist.agg(F.sum("cnt").cast("long").alias("n"))
    pct = (
        dist.select("val", F.sum("cnt").over(w).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .select(
            "val",
            F.expr("(cum * 1000000L) div n").cast("long").alias("pct_ppm"),
        )
    )
    return df.select(key_col, v.alias("val")).join(
        pct.hint("shuffle_hash"), "val"
    ).select(
        F.col(key_col),
        F.col("val").cast("long").alias(value_col),
        "pct_ppm",
    )


def neyman_allocation(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    *,
    budget: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_g ∝ N_g·σ_g — the
    survey-design rule that samples variable strata MORE (minimum-
    variance estimator for a fixed budget), the principled upgrade over
    proportional allocation for corpus QA sampling.

    The weight reduces to exact integer algebra: N_g·σ_g =
    sqrt(N_g·Σx² − (Σx)²) — ONE correctly-rounded IEEE sqrt per group
    over an exact bigint sum-of-squares, pinned round(·,12) ->
    decimal(28,12) so the normalizing total is order-independent
    (temperature_mixture discipline).

    Scale shape: one map-side-combined groupBy(group) of three bigint
    sums; everything after runs on the bounded group table.

    Output: (group, n_rows, ss, alloc_n, alloc_ppm).
    """
    x = F.col(value_col).cast("long")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(x * x).cast("long").alias("sxx"),
    )
    ss = (F.col("n_rows") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "long"
    )
    weighted = g.select(
        "grp",
        "n_rows",
        ss.alias("ss"),
        F.round(F.sqrt(ss.cast("double")), 12)
        .cast("decimal(28,12)")
        .alias("_w"),
    ).persist()  # bounded group table; feeds BOTH the total and the output
    tot = weighted.agg(F.sum("_w").alias("_tw"))
    return weighted.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(group_col),
        "n_rows",
        "ss",
        F.floor(
            F.col("_w").cast("double") * budget / F.col("_tw").cast("double")
        )
        .cast("long")
        .alias("alloc_n"),
        F.floor(
            F.col("_w").cast("double") * 1000000 / F.col("_tw").cast("double")
        )
        .cast("long")
        .alias("alloc_ppm"),
    )


def crossval_ols(
    df: DataFrame,
    x,
    y,
    key_col: str = "doc_id",
    *,
    k: int = 5,
) -> DataFrame:
    """k-fold cross-validated OLS in TWO corpus scans — the trick is
    that sufficient statistics SUBTRACT: the leave-one-fold-out model
    for fold f is the closed form over (totals − fold_f sums), so scan
    1 collects per-fold sums (ONE map-side-combined groupBy on the
    hash-fold), every fold's train model derives algebraically on the
    k-row table, and scan 2 evaluates each row against its own fold's
    held-out model (broadcast of k rows). No model ever sees its eval
    rows; no scan runs per fold.

    Folds are content-addressed (md5 bucket of the key), so membership
    is stable across partitionings and engines. Error is reported as
    integer MAE in micro units (|y*1e6 − (slope*x + intercept)| sums
    stay within bigint; an SSE would overflow).

    Output: one row per fold — (fold, n_train, n_test, slope_micro,
    intercept_micro, mae_micro).
    """
    from .sampling import hash_bucket

    xl = x.cast("long")
    yl = y.cast("long")
    base = df.select(
        (hash_bucket(F.col(key_col)) % k).cast("long").alias("fold"),
        xl.alias("x"),
        yl.alias("y"),
    )
    per = base.groupBy("fold").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    ).persist()  # k rows; feeds BOTH the totals and the per-fold models
    tot = per.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    tr = per.crossJoin(F.broadcast(tot)).select(
        "fold",
        (F.col("tn") - F.col("n")).cast("long").alias("n_train"),
        F.col("n").cast("long").alias("n_test"),
        (F.col("tsx") - F.col("sx")).cast("long").alias("rx"),
        (F.col("tsy") - F.col("sy")).cast("long").alias("ry"),
        (F.col("tsxx") - F.col("sxx")).cast("long").alias("rxx"),
        (F.col("tsxy") - F.col("sxy")).cast("long").alias("rxy"),
    )
    num = F.col("n_train") * F.col("rxy") - F.col("rx") * F.col("ry")
    den = F.col("n_train") * F.col("rxx") - F.col("rx") * F.col("rx")
    ibn = F.col("ry") * F.col("rxx") - F.col("rx") * F.col("rxy")
    models = tr.select(
        "fold",
        "n_train",
        "n_test",
        F.when(
            den > 0,
            F.floor(num.cast("double") * 1000000.0 / den.cast("double")),
        )
        .cast("long")
        .alias("slope_micro"),
        F.when(
            den > 0,
            F.floor(ibn.cast("double") * 1000000.0 / den.cast("double")),
        )
        .cast("long")
        .alias("intercept_micro"),
    )
    scored = base.join(F.broadcast(models), "fold").select(
        "fold",
        F.abs(
            F.col("y") * 1000000
            - (F.col("slope_micro") * F.col("x") + F.col("intercept_micro"))
        ).alias("ae"),
    )
    mae = scored.groupBy("fold").agg(
        F.expr("sum(ae) div count(*)").cast("long").alias("mae_micro")
    )
    return models.join(mae, "fold").select(
        F.col("fold"),
        "n_train",
        "n_test",
        "slope_micro",
        "intercept_micro",
        "mae_micro",
    )


def threshold_select(
    df: DataFrame,
    score,
    label,
    *,
    tp_gain: int = 1,
    fp_cost: int = 2,
) -> DataFrame:
    """Utility-optimal filter threshold: given an integer quality score
    and a binary keep-label, pick the threshold t (keep iff score >= t)
    maximizing TP*tp_gain - FP*fp_cost — how a production pipeline
    actually sets its quality gate (maximize kept-good minus the cost
    of kept-bad, rather than eyeballing a histogram).

    Scale shape (grouped_quantiles discipline): a threshold sweep is
    NOT a per-threshold scan — the (score, label) DISTRIBUTION is
    bounded, so one groupBy(score) of two counts + a suffix-sum window
    over the bounded distinct-score table evaluates EVERY candidate
    threshold at once; argmax with a deterministic tiebreak (utility
    desc, threshold asc) via one ordered limit.

    Output: one row (threshold, kept, tp, fp, utility) for the best t.
    """
    sc = score.cast("long")
    lb = label.cast("int")
    dist = df.select(sc.alias("s"), lb.alias("y")).groupBy("s").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = dist.select(
        F.col("s").alias("threshold"),
        F.sum("n").over(w).cast("long").alias("kept"),
        F.sum("pos").over(w).cast("long").alias("tp"),
        (F.sum("n").over(w) - F.sum("pos").over(w))
        .cast("long")
        .alias("fp"),
    ).select(
        "threshold",
        "kept",
        "tp",
        "fp",
        (F.col("tp") * tp_gain - F.col("fp") * fp_cost)
        .cast("long")
        .alias("utility"),
    )
    return sweep.orderBy(
        F.col("utility").desc(), F.col("threshold").asc()
    ).limit(1)


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_a: str,
    group_b: str,
    group_col: str = "source",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between two groups'
    value distributions — the distribution-drift test behind "did this
    source's page lengths change shape?" (quantile_drift compares fixed
    quantiles; KS is the sup over ALL thresholds, so it catches shape
    changes quantile grids miss).

    All integer: D = max over distinct values of
    |cum_a * n_b - cum_b * n_a| scaled by n_a*n_b — cross-multiplied,
    so no float CDFs; emitted in ppm by exact div at the end.

    Scale shape: one groupBy(value) of two conditional counts (the
    bounded distribution sketch), one cumulative window over the
    bounded distinct-value table, one argmax.

    Output: one row (n_a, n_b, d_ppm, at_value).
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    dist = (
        df.where(g.isin(group_a, group_b))
        .select(
            v.alias("val"),
            (g == group_a).cast("long").alias("ia"),
            (g == group_b).cast("long").alias("ib"),
        )
        .groupBy("val")
        .agg(
            F.sum("ia").cast("long").alias("ca"),
            F.sum("ib").cast("long").alias("cb"),
        )
        .persist()
    )
    tot = dist.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.select(
        "val",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    ).crossJoin(F.broadcast(tot))
    diff = cum.select(
        "val",
        "na",
        "nb",
        F.abs(
            F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na")
        ).alias("x"),
    )
    return (
        diff.orderBy(F.col("x").desc(), F.col("val").asc())
        .limit(1)
        .select(
            "na",
            "nb",
            F.expr("(x * 1000000L) div (na * nb)")
            .cast("long")
            .alias("d_ppm"),
            F.col("val").cast("long").alias("at_value"),
        )
    )


def auc_exact(
    df: DataFrame,
    score,
    label,
) -> DataFrame:
    """EXACT ROC-AUC of a quality score against a binary label — the
    classifier-eval headline metric, computed without sampling,
    sorting the corpus, or materializing pos x neg pairs: AUC is the
    Mann-Whitney U statistic, and U reduces to counting on the BOUNDED
    score distribution — for each distinct score, its positives beat
    every negative strictly below and tie (half-credit) the negatives
    at the same score:

        2U = Σ_s pos_s · (2·cum_neg(<s) + neg_s)
        AUC_ppm = 2U · 1e6 div (2 · n_pos · n_neg)

    All integer (the x2 carries the half-credit exactly — no .5
    anywhere). One groupBy(score) of two counts, one cumulative window
    over the bounded distinct-score table, one scalar fold.

    Output: one row (n_pos, n_neg, u2, auc_ppm).
    """
    sc = score.cast("long")
    lb = label.cast("int")
    dist = (
        df.select(sc.alias("s"), lb.alias("y"))
        .groupBy("s")
        .agg(
            F.sum("y").cast("long").alias("pos"),
            (F.count("*") - F.sum("y")).cast("long").alias("neg"),
        )
        .persist()
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    terms = dist.select(
        "pos",
        "neg",
        (
            F.col("pos")
            * (
                2 * F.coalesce(F.sum("neg").over(w), F.lit(0))
                + F.col("neg")
            )
        )
        .cast("long")
        .alias("t"),
    )
    agg = terms.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum("t").cast("long").alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        F.expr("(u2 * 1000000L) div (2L * n_pos * n_neg)")
        .cast("long")
        .alias("auc_ppm"),
    )


def quality_residuals(
    df: DataFrame,
    x,
    y,
    group_col: str = "source",
    *,
    flag_k_micro: int = 2_000_000,
) -> DataFrame:
    """Model APPLICATION after training: fit the per-group OLS
    (``grouped_ols``) and score every row's residual against its own
    group's line — the length-adjusted anomaly signal ("this page has
    far fewer chars than its token count predicts for this source" =
    template breakage, truncation, or boilerplate soup that absolute
    thresholds miss).

    Scale shape: the model is the bounded per-group table from ONE
    stats scan; application is ONE more scan with the model broadcast —
    the train->apply loop in exactly two passes. Residuals are integer
    micro (y*1e6 - (slope*x + intercept)); the flag marks |residual| >
    k on a y*1e6 scale.

    Output: (key columns of df via group+x+y) — (group, x, y,
    residual_micro, is_outlier).
    """
    xl = x.cast("long")
    yl = y.cast("long")
    model = grouped_ols(df, x, y, group_col).select(
        group_col, "slope_micro", "intercept_micro"
    )
    base = df.select(F.col(group_col), xl.alias("x"), yl.alias("y"))
    j = base.join(F.broadcast(model), group_col)
    resid = (
        F.col("y") * 1000000
        - (
            F.col("slope_micro") * F.col("x")
            + F.col("intercept_micro")
        )
    ).cast("long")
    return j.select(
        group_col,
        "x",
        "y",
        resid.alias("residual_micro"),
        F.when(F.abs(resid) > flag_k_micro, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_outlier"),
    )


def log2_histogram(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Log2-bucketed value histogram per group: bucket = bit length of
    the value (floor(log2)+1 via the portable length(bin(x)) identity,
    no float log) — the doubling-buckets view that makes heavy-tailed
    length distributions readable where linear bins drown the tail.

    ONE map-side-combined groupBy on (group, bucket); bucket count is
    bounded by the value's bit width (<= 63), so the output is
    sketch-sized regardless of corpus size.

    Output: (group, bucket, lo, hi, n) with [lo, hi] the bucket's
    value range.
    """
    v = F.col(value_col).cast("long")
    bucket = F.when(v <= 0, F.lit(0)).otherwise(F.length(F.bin(v)))
    g = df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"))
    out = g.groupBy("grp", "bucket").agg(F.count("*").cast("long").alias("n"))
    return out.select(
        F.col("grp").alias(group_col),
        F.col("bucket").cast("long"),
        F.when(F.col("bucket") == 0, F.lit(0))
        .otherwise(F.expr("shiftleft(1L, cast(bucket - 1 as int))"))
        .cast("long")
        .alias("lo"),
        F.when(F.col("bucket") == 0, F.lit(0))
        .otherwise(F.expr("shiftleft(1L, cast(bucket as int)) - 1L"))
        .cast("long")
        .alias("hi"),
        "n",
    )


def kendall_tau(df: DataFrame, x, y) -> DataFrame:
    """Exact Kendall tau-b rank correlation between two log2-bucketed
    features — the monotone-association gauge a curation pipeline runs
    before trusting one cheap signal (length) as a proxy for an
    expensive one (token count): tau near 1 means filtering on the
    proxy reorders almost nothing.

    All integer until one final pinned expression: concordant /
    discordant pair counts come from the joint BUCKET distribution
    (C = sum n_ij * n_i'j' over cells with i<i', j<j'), tie terms from
    the marginals, and tau_b = (C-D)/sqrt((T-Tx)(T-Ty)) evaluated as
    floor(((C-D)*1e6)/sqrt(T-Tx)/sqrt(T-Ty)) — every count is exactly
    representable in a double (<= n(n-1)/2) and sqrt is IEEE
    correctly-rounded in both engines, so the oracle hash-matches.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy on (xb, yb); buckets are bit lengths (<= 63 each via the
    portable length(bin(v)) identity, no float log), so the cell table
    is <= 63x63 regardless of corpus size and the inequality self-join
    that forms pair counts is a bounded nested loop over <= ~4k rows —
    never an all-pairs join over rows.

    Output: one row (n_docs, concordant, discordant, tau_micro).
    """
    xv = x.cast("long")
    yv = y.cast("long")
    xb = F.when(xv <= 0, F.lit(0)).otherwise(F.length(F.bin(xv)))
    yb = F.when(yv <= 0, F.lit(0)).otherwise(F.length(F.bin(yv)))
    cells = (
        df.select(xb.alias("xb"), yb.alias("yb"))
        .groupBy("xb", "yb")
        .agg(F.count("*").cast("long").alias("n"))
        .persist()
    )
    a = cells.select(
        F.col("xb").alias("ax"), F.col("yb").alias("ay"), F.col("n").alias("an")
    )
    b = cells.select(
        F.col("xb").alias("bx"), F.col("yb").alias("by"), F.col("n").alias("bn")
    )
    prod = F.col("an") * F.col("bn")
    cd = a.join(b, F.col("ax") < F.col("bx")).agg(
        F.coalesce(
            F.sum(F.when(F.col("ay") < F.col("by"), prod).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("concordant"),
        F.coalesce(
            F.sum(F.when(F.col("ay") > F.col("by"), prod).otherwise(F.lit(0))),
            F.lit(0),
        )
        .cast("long")
        .alias("discordant"),
    )
    mx = (
        cells.groupBy("xb")
        .agg(F.sum("n").alias("tx"))
        .agg(
            F.sum(F.expr("tx * (tx - 1) div 2")).cast("long").alias("tie_x"),
            F.sum("tx").cast("long").alias("n"),
        )
    )
    my = (
        cells.groupBy("yb")
        .agg(F.sum("n").alias("ty"))
        .agg(F.sum(F.expr("ty * (ty - 1) div 2")).cast("long").alias("tie_y"))
    )
    one = cd.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(my))
    t_pairs = F.expr("n * (n - 1) div 2")
    tau = F.floor(
        ((F.col("concordant") - F.col("discordant")) * 1000000).cast("double")
        / F.sqrt((t_pairs - F.col("tie_x")).cast("double"))
        / F.sqrt((t_pairs - F.col("tie_y")).cast("double"))
    )
    return one.select(
        F.col("n").alias("n_docs"),
        "concordant",
        "discordant",
        F.when((t_pairs > F.col("tie_x")) & (t_pairs > F.col("tie_y")), tau)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("tau_micro"),
    )


def spearman_rho(
    df: DataFrame, x, y, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Spearman rank correlation over a deterministic total order:
    ranks are unique (ties broken by id), so rho = 1 - 6*sum(d^2) /
    (n(n^2-1)) holds exactly and the whole statistic is integer until
    one pinned double division.

    Scale shape — NO single-partition global sort (the host_gini /
    shard_assign discipline): each feature is ranked in two phases —
    (1) a map-side-combined groupBy(value) builds the bounded
    distinct-value distribution (doc-length-like features have a
    domain bounded by the value cap, not the corpus), a cumulative
    window over THAT bounded table yields per-value rank offsets;
    (2) the offsets broadcast-join back and a window partitioned BY
    VALUE (parallel, tie-run-sized partitions) ranks within ties by
    id. The two rank tables then join on id. Three exchanges total,
    none a global sort.

    sum(d^2) is decimal(38,0) (it reaches n^3); rho is emitted as
    floor((1 - 6S/(n(n^2-1))) * 1e6) with the division order pinned.

    Output: one row (n_docs, sum_d2 as string, rho_micro).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        x.cast("long").alias("xv"),
        y.cast("long").alias("yv"),
    ).persist()

    def _rank(col: str, out: str) -> DataFrame:
        dist = base.groupBy(col).agg(F.count("*").alias("c"))
        below = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = dist.select(
            col,
            F.coalesce(F.sum("c").over(below), F.lit(0))
            .cast("long")
            .alias("off"),
        )
        within = Window.partitionBy(col).orderBy("id")
        return base.join(F.broadcast(off), col).select(
            "id",
            (F.col("off") + F.row_number().over(within))
            .cast("long")
            .alias(out),
        )

    ranks = _rank("xv", "rx").join(_rank("yv", "ry"), "id")
    d = (F.col("rx") - F.col("ry")).cast("decimal(38,0)")
    agg = ranks.agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum(d * d), F.lit(0).cast("decimal(38,0)")).alias("s"),
    )
    n_dec = F.col("n").cast("decimal(38,0)")
    den = n_dec * (n_dec * n_dec - 1)
    rho = F.floor(
        (
            F.lit(1.0)
            - (F.lit(6).cast("decimal(38,0)") * F.col("s")).cast("double")
            / den.cast("double")
        )
        * 1000000
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("s").cast("string").alias("sum_d2"),
        F.when(F.col("n") > 1, rho).otherwise(F.lit(0))
        .cast("long")
        .alias("rho_micro"),
    )


def avg_precision(df: DataFrame, score, label, id_col: str = "doc_id") -> DataFrame:
    """Exact average precision (the PR-curve summary ROC-AUC misses
    when positives are rare — the usual case for "is this page
    high-quality?" labels): rank all rows by (score desc, id), and
    AP = mean over positives of precision@rank-of-that-positive.

    Determinism + portability: ranks are UNIQUE (id tiebreak), each
    positive's term is the exact integer (i * 1000000) div k (i = rank
    among positives, k = global rank), and AP is the exact integer
    mean of those micro terms — no floats anywhere.

    Scale shape — the spearman_rho two-phase discipline, applied twice:
    global rank k and positive-only rank i each come from a bounded
    distinct-score distribution (cumulative window over the bounded
    table only) plus a window PARTITIONED BY SCORE for the id tiebreak
    (parallel, tie-run-sized). No corpus-wide single-partition sort.

    Output: one row (n_pos, n_total, ap_micro).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        score.cast("long").alias("s"),
        label.cast("long").alias("y"),
    ).persist()

    def _rank2(src: DataFrame, out: str) -> DataFrame:
        dist = src.groupBy("s").agg(F.count("*").alias("c"))
        above = Window.orderBy(F.col("s").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        off = dist.select(
            "s",
            F.coalesce(F.sum("c").over(above), F.lit(0))
            .cast("long")
            .alias("off"),
        )
        within = Window.partitionBy("s").orderBy("id")
        return src.join(F.broadcast(off), "s").select(
            "id",
            "y",
            (F.col("off") + F.row_number().over(within))
            .cast("long")
            .alias(out),
        )

    ranked = _rank2(base, "k")
    pos = _rank2(base.where(F.col("y") == 1), "i").select(
        "id", F.col("i")
    )
    terms = ranked.join(pos, "id").select(
        F.expr("(i * 1000000) div k").cast("long").alias("term")
    )
    n_total = base.count()
    agg = terms.agg(
        F.count("*").cast("long").alias("n_pos"),
        F.coalesce(F.sum("term"), F.lit(0)).cast("long").alias("st"),
    )
    return agg.select(
        "n_pos",
        F.lit(n_total).cast("long").alias("n_total"),
        F.when(
            F.col("n_pos") > 0, F.expr("st div n_pos")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ap_micro"),
    )


def hill_tail_index(
    df: DataFrame,
    group_col: str = "source",
    *,
    k: int = 8,
) -> DataFrame:
    """Hill estimator of the power-law tail index over per-group sizes
    (how heavy is the megahost tail? alpha near 1 = extremely heavy,
    larger = tamer) — the parametric cousin of host_gini that crawl
    budgeting uses to extrapolate "how big will the next biggest host
    be?".

    alpha = k / sum_{i=1..k} ln(x_(i) / x_(k+1)) over the k largest
    group sizes. Each log term is round(ln(xi/xk1), 6)::decimal — the
    char_entropy portability discipline — summed order-independently;
    one pinned division at the end.

    Scale shape: group sizes come from ONE map-side-combined groupBy;
    the top-(k+1) is TakeOrderedAndProject (per-task heaps); everything
    after runs on k+1 rows.

    Output: one row (k, x_kplus1, alpha_micro).
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("x"))
    top = counts.orderBy(F.col("x").desc(), F.col(group_col).asc()).limit(
        k + 1
    )
    pos = Window.orderBy(F.col("x").desc(), F.col(group_col).asc())
    ranked = top.select(
        F.col("x").cast("long").alias("x"),
        F.row_number().over(pos).alias("i"),
    ).persist()
    floor_row = ranked.where(F.col("i") == k + 1).select(
        F.col("x").alias("xk1")
    )
    terms = ranked.where(F.col("i") <= k).crossJoin(
        F.broadcast(floor_row)
    )
    s = terms.agg(
        F.sum(
            F.round(
                F.log(F.col("x").cast("double") / F.col("xk1").cast("double")),
                6,
            ).cast("decimal(18,6)")
        ).alias("s"),
        F.min("xk1").cast("long").alias("x_kplus1"),
    )
    return s.select(
        F.lit(k).cast("long").alias("k"),
        "x_kplus1",
        F.when(
            F.col("s") > 0,
            F.floor(
                (F.lit(k) * 1000000).cast("double") / F.col("s").cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("alpha_micro"),
    )


def simpson_diversity(
    df: DataFrame,
    group_col: str = "source",
    cat_col: str = "lang",
) -> DataFrame:
    """Simpson diversity per group: the probability two documents drawn
    without replacement differ in category — the single-number "is this
    source monolingual?" gauge mixture planning reads before assigning
    per-language budgets.

    Exact integers until the end: D = 1 - sum n_c (n_c - 1) / (N (N-1))
    with both operands decimal(38,0) (N^2 reaches 1e24 at corpus scale —
    past bigint, inside decimal38/hugeint), then ONE pinned
    floor(num::double / den::double) division (Spark decimal division
    rounds at result scale, so the floor goes through doubles — both
    engines convert decimal->double round-to-nearest identically).

    Scale shape: ONE map-side-combined groupBy on the bounded
    (group, category) domain; everything after runs on that sketch.

    Output: (group, n_docs, n_cats, simpson_micro), ordered by group.
    """
    cells = df.groupBy(
        F.col(group_col).alias("grp"), F.col(cat_col).alias("cat")
    ).agg(F.count("*").cast("long").alias("c"))
    per = cells.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cats"),
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * (F.col("c").cast("decimal(38,0)") - 1)
        ).alias("num"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    den = nd * (nd - 1)
    return per.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_docs"),
        "n_cats",
        F.when(
            F.col("n") > 1,
            F.floor(
                ((den - F.col("num")) * 1000000).cast("double")
                / den.cast("double")
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("simpson_micro"),
    ).orderBy(group_col)


def welch_ttest(
    df: DataFrame,
    value_col: str,
    group_a: str,
    group_b: str,
    group_col: str = "source",
) -> DataFrame:
    """Welch's unequal-variance t between two groups' value
    distributions — the "did mean page length actually move?" test for
    snapshot drift, robust to the unequal group sizes crawls always
    have (Student's pooled variance is wrong there).

    All moments are exact bigint sums from ONE map-side-combined
    conditional aggregate over a single corpus scan; t and the
    Welch-Satterthwaite dof are each ONE pinned-order IEEE expression
    over those integers (the degree_assortativity discipline), floored
    to micro units.

    Output: one row (n_a, n_b, t_micro, dof_micro).
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    agg = df.where(g.isin(group_a, group_b)).agg(
        F.sum(F.when(g == group_a, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("na"),
        F.sum(F.when(g == group_a, v).otherwise(F.lit(0)))
        .cast("long")
        .alias("sa"),
        F.sum(
            F.when(g == group_a, v.cast("decimal(38,0)") * v).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("qa"),
        F.sum(F.when(g == group_b, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("nb"),
        F.sum(F.when(g == group_b, v).otherwise(F.lit(0)))
        .cast("long")
        .alias("sb"),
        F.sum(
            F.when(g == group_b, v.cast("decimal(38,0)") * v).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    qa, qb = F.col("qa").cast("double"), F.col("qb").cast("double")
    # pinned order: variance = (q - s*s/n) / (n-1); se2 = va/na + vb/nb
    va = (qa - sa * sa / na) / (na - 1)
    vb = (qb - sb * sb / nb) / (nb - 1)
    se2 = va / na + vb / nb
    t = (sa / na - sb / nb) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (va / na) * (va / na) / (na - 1)
        + (vb / nb) * (vb / nb) / (nb - 1)
    )
    ok = (F.col("na") > 1) & (F.col("nb") > 1)
    return agg.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.when(ok, F.floor(t * 1000000)).otherwise(F.lit(0))
        .cast("long")
        .alias("t_micro"),
        F.when(ok, F.floor(dof * 1000000)).otherwise(F.lit(0))
        .cast("long")
        .alias("dof_micro"),
    )


def cvm_statistic(
    df: DataFrame,
    value_col: str,
    group_a: str,
    group_b: str,
    group_col: str = "source",
) -> DataFrame:
    """Two-sample Cramer-von Mises distance — the INTEGRATED squared
    ECDF gap, which accumulates many small distribution differences KS's
    single sup-point misses (the complementary drift test: run both).

    T = (na*nb/(na+nb)^2) * sum over combined points of
    (F_a - F_b)^2. Per distinct value: the cross-multiplied integer gap
    d = cum_a*nb - cum_b*na enters as count * round((d/(na*nb))^2, 12)
    into an exact decimal sum (order-independent); ONE pinned double
    expression scales it at the end.

    Scale shape: identical to ks_statistic — one conditional groupBy
    builds the bounded distribution sketch, one cumulative window over
    that bounded table, one scalar aggregate.

    Output: one row (n_a, n_b, t_micro).
    """
    v = F.col(value_col).cast("long")
    g = F.col(group_col)
    dist = (
        df.where(g.isin(group_a, group_b))
        .select(
            v.alias("val"),
            (g == group_a).cast("long").alias("ia"),
            (g == group_b).cast("long").alias("ib"),
        )
        .groupBy("val")
        .agg(
            F.sum("ia").cast("long").alias("ca"),
            F.sum("ib").cast("long").alias("cb"),
        )
        .persist()
    )
    tot = dist.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.select(
        "val",
        "ca",
        "cb",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    ).crossJoin(F.broadcast(tot))
    gap = (
        F.col("cum_a").cast("double") * F.col("nb").cast("double")
        - F.col("cum_b").cast("double") * F.col("na").cast("double")
    ) / (F.col("na").cast("double") * F.col("nb").cast("double"))
    term = F.round(
        (F.col("ca") + F.col("cb")).cast("double") * gap * gap, 12
    ).cast("decimal(28,12)")
    agg = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(term).alias("s"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    t = (
        na * nb / ((na + nb) * (na + nb))
    ) * F.col("s").cast("double")
    return agg.select(
        "n_a",
        "n_b",
        F.floor(t * 1000000).cast("long").alias("t_micro"),
    )


def reliability_bins(
    df: DataFrame,
    predicted_ppm,
    label,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Calibration (reliability-diagram) table for a ppm-scaled score
    against a binary outcome: per score decile, how often is the
    outcome actually true vs what the score claims — the audit run
    before a quality classifier's scores are used as sampling WEIGHTS
    (miscalibrated scores silently skew the mixture even when ranking
    AUC is fine).

    All integer: bins by `div`, observed rate and mean prediction as
    exact bigint div ppm, gap as their difference.

    Scale shape: ONE map-side-combined groupBy on the bounded bin
    domain; nothing else touches the corpus.

    Output: (bin, n, positives, mean_pred_ppm, observed_ppm, gap_ppm),
    ordered by bin.
    """
    width = 1000000 // n_bins
    p = predicted_ppm.cast("long")
    binned = df.select(
        F.least(
            (p / F.lit(width)).cast("long"), F.lit(n_bins - 1)
        ).alias("bin"),
        p.alias("pred"),
        label.cast("long").alias("y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("positives"),
        F.sum("pred").cast("long").alias("sp"),
    )
    return agg.select(
        "bin",
        "n",
        "positives",
        F.expr("sp div n").cast("long").alias("mean_pred_ppm"),
        F.expr("(positives * 1000000) div n").cast("long").alias(
            "observed_ppm"
        ),
        (
            F.expr("(positives * 1000000) div n") - F.expr("sp div n")
        )
        .cast("long")
        .alias("gap_ppm"),
    ).orderBy("bin")


def otsu_threshold(df: DataFrame, value_col: str) -> DataFrame:
    """Otsu's method on a score distribution: the UNSUPERVISED quality
    cut — pick the threshold maximizing between-class variance, i.e.
    where the score histogram most looks like two populations
    (threshold_select needs labeled gains/costs; this needs nothing).

    Per candidate threshold t (class0 = values <= t): the normalized
    between-class variance sigma_B^2 = (s0*w1 - s1*w0)^2 / (w0*w1*N^2)
    from prefix sums over the bounded distinct-value distribution. The
    products reach 1e60 at corpus scale — past any exact type — so each
    candidate is ONE pinned-order IEEE expression over exact bigint
    prefix sums; argmax by (sigma desc, t asc).

    Scale shape: ks_statistic's — one map-side-combined groupBy(value)
    builds the bounded sketch; one cumulative window over THAT table;
    one TakeOrdered(1).

    Output: one row (threshold, n_below, n_above, sigma_b_micro).
    """
    v = F.col(value_col).cast("long")
    dist = (
        df.select(v.alias("val"))
        .groupBy("val")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    tot = dist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("val")).alias("s"),
    )
    w = Window.orderBy("val").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dist.select(
        "val",
        F.sum("c").over(w).cast("long").alias("w0"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("val"))
        .over(w)
        .alias("s0"),
    ).crossJoin(F.broadcast(tot))
    w0 = F.col("w0").cast("double")
    w1 = (F.col("n") - F.col("w0")).cast("double")
    s0 = F.col("s0").cast("double")
    s1 = (F.col("s") - F.col("s0")).cast("double")
    nd = F.col("n").cast("double")
    a = s0 * w1 - s1 * w0
    sigma = a * a / (w0 * w1) / (nd * nd)
    cand = cum.where(F.col("w0") < F.col("n")).select(
        F.col("val").alias("threshold"),
        F.col("w0").alias("n_below"),
        (F.col("n") - F.col("w0")).cast("long").alias("n_above"),
        F.floor(sigma * 1000000).cast("long").alias("sigma_b_micro"),
    )
    return cand.orderBy(
        F.col("sigma_b_micro").desc(), F.col("threshold").asc()
    ).limit(1)


# round(log10(1 + 1/d) * 1e6) for d = 1..9 — sums to exactly 1e6; the
# literal table is shared verbatim with the SQL oracle (the NDCG-discount
# discipline: no runtime float logs in either engine).
BENFORD_MICRO = [
    301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757
]


def benford_deviation(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit (Benford) profile of a positive numeric field — the
    synthetic-content tripwire: organically-grown magnitudes (lengths,
    counts, prices) lean Benford, while templated/generated filler and
    fabricated metrics pile onto uniform or single-digit profiles.

    All integer: observed shares in ppm by exact div, expected shares
    from the literal micro table, deviation = obs - exp per digit.

    Scale shape: the first digit is substring arithmetic at codegen
    scan speed; ONE map-side-combined groupBy on the 9-value domain.

    Output: (digit, n, obs_ppm, exp_ppm, dev_ppm), 9 rows (absent
    digits emit 0-count rows so the shape is fixed).
    """
    v = F.col(value_col).cast("long")
    d = F.substring(v.cast("string"), 1, 1).cast("long")
    counts = (
        df.where(v > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    spark = df.sparkSession
    digits = spark.createDataFrame(
        [(i + 1, BENFORD_MICRO[i]) for i in range(9)],
        "digit long, exp_ppm long",
    )
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    out = (
        digits.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("(coalesce(n, 0) * 1000000) div total")
            .cast("long")
            .alias("obs_ppm"),
            "exp_ppm",
        )
    )
    return out.select(
        "digit",
        "n",
        "obs_ppm",
        "exp_ppm",
        (F.col("obs_ppm") - F.col("exp_ppm")).cast("long").alias("dev_ppm"),
    ).orderBy("digit")


def runs_test(df: DataFrame, flag, id_col: str = "doc_id") -> DataFrame:
    """Wald-Wolfowitz runs test on a binary attribute over the stored
    id order — the "is my corpus secretly sorted?" audit: training
    ingestion assumes rows are well-mixed, and a corpus written
    lang-by-lang or crawl-by-crawl fails it catastrophically (run count
    far below expectation -> z strongly negative).

    Runs are counted WITHOUT a sequential window: R = 1 + number of
    adjacent pairs whose flags differ, and adjacency over contiguous
    ids is an EQUI-join of the table against itself on id = id+1 — a
    co-partitioned shuffle join, not a single-task ordered scan. The
    z-score is one pinned IEEE expression over (n0, n1, boundaries).

    Output: one row (n0, n1, n_runs, z_micro).
    """
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        flag.cast("long").alias("y"),
    ).persist()
    a = base.select((F.col("id") + 1).alias("id"), F.col("y").alias("ya"))
    bounds = a.join(base.hint("shuffle_hash"), "id").agg(
        F.coalesce(
            F.sum((F.col("ya") != F.col("y")).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("b")
    )
    tot = base.agg(
        F.sum(1 - F.col("y")).cast("long").alias("n0"),
        F.sum("y").cast("long").alias("n1"),
    )
    one = bounds.crossJoin(F.broadcast(tot))
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    n = n0 + n1
    r = (F.col("b") + 1).cast("double")
    mu = 2.0 * n0 * n1 / n + 1
    var = (
        (2.0 * n0 * n1) * (2.0 * n0 * n1 - n) / (n * n * (n - 1))
    )
    z = (r - mu) / F.sqrt(var)
    ok = (F.col("n0") > 0) & (F.col("n1") > 0) & (n > 2)
    return one.select(
        "n0",
        "n1",
        (F.col("b") + 1).cast("long").alias("n_runs"),
        F.when(ok, F.floor(z * 1000000)).otherwise(F.lit(0))
        .cast("long")
        .alias("z_micro"),
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    val_col: str = "n_chars",
) -> DataFrame:
    """Apply a CDC changelog (insert/update/delete rows with a sequence
    number) onto a base snapshot — the MERGE INTO a lakehouse table
    format runs, restated in pure DataFrame algebra so it works on any
    parquet snapshot: last-writer-wins per key, deletes drop the row,
    inserts/updates carry the new value, untouched base rows pass
    through.

    Scale shape: the changelog collapses to ONE row per touched key
    with a single map-side-combined max(struct(seq, op, val)) — ordered
    structs make "latest change" an aggregate, not a window — then ONE
    full-outer shuffle join against the base on the key. Both sides are
    corpus-sized: the join is pinned shuffle_hash, nothing broadcasts.

    Output: (key, val, origin) where origin is 'base', 'insert', or
    'update' — deleted keys are absent.
    """
    latest = (
        changes.select(
            F.col(key_col).alias("k"),
            F.struct(
                F.col(seq_col).cast("long").alias("seq"),
                F.col(op_col).alias("op"),
                F.col(val_col).cast("long").alias("val"),
            ).alias("ch"),
        )
        .groupBy("k")
        .agg(F.max("ch").alias("ch"))
    )
    b = base.select(
        F.col(key_col).alias("k"), F.col(val_col).cast("long").alias("bval")
    )
    joined = b.hint("shuffle_hash").join(
        latest.hint("shuffle_hash"), "k", "full_outer"
    )
    alive = joined.where(
        F.col("ch").isNull() | (F.col("ch.op") != "D")
    )
    return alive.select(
        F.col("k").alias(key_col),
        F.coalesce(F.col("ch.val"), F.col("bval"))
        .cast("long")
        .alias(val_col),
        F.when(F.col("ch").isNull(), F.lit("base"))
        .when(F.col("bval").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("origin"),
    ).orderBy(key_col)


def mcnemar_filters(
    df: DataFrame,
    filter_a,
    filter_b,
) -> DataFrame:
    """McNemar's paired test for two quality filters scored on the SAME
    documents — the right significance test when comparing filter
    versions (the marginal pass rates share the diagonal, so an
    unpaired chi-square overstates confidence). Only the discordant
    cells matter: b = A-only passes, c = B-only passes; the
    continuity-corrected statistic is (|b-c|-1)²/(b+c).

    All-integer: (|b-c|-1)² is an exact bigint, so chi2_micro =
    ((|b-c|-1)² * 1e6) div (b+c) — truncating division in both
    engines; 0 when b+c = 0 (no disagreement) or |b-c| <= 1.

    Scale shape: ONE map-side-combined full scan — four conditional
    sums, no shuffle beyond the single-row final combine.

    Output: one row (n, n_both, a_only, b_only, neither, chi2_micro).
    """
    a = filter_a.cast("int")
    b = filter_b.cast("int")
    agg = df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(a * b).cast("long").alias("n_both"),
        F.sum(a * (1 - b)).cast("long").alias("a_only"),
        F.sum((1 - a) * b).cast("long").alias("b_only"),
        F.sum((1 - a) * (1 - b)).cast("long").alias("neither"),
    )
    disc = F.col("a_only") + F.col("b_only")
    dev = F.abs(F.col("a_only") - F.col("b_only")) - 1
    return agg.select(
        "n",
        "n_both",
        "a_only",
        "b_only",
        "neither",
        F.when(
            (disc > 0) & (dev > 0),
            F.expr(
                "((abs(a_only - b_only) - 1) * (abs(a_only - b_only) - 1)"
                " * 1000000) div (a_only + b_only)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("chi2_micro"),
    )


def theil_index(
    df: DataFrame, group_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Theil T inequality index of documents across groups (hosts) —
    the decomposable companion to the Gini gauge: T = (1/H)·Σ_g
    (x_g/μ)·ln(x_g/μ), 0 for an even spread, ln(H) for one megahost.

    Scale shape (host_gini discipline): the corpus is touched by ONE
    map-side-combined groupBy(group); all ln() terms are computed on
    the PROVABLY bounded distinct-count DISTRIBUTION table (k distinct
    counts need Σx ≥ k(k+1)/2 docs → k ≤ √(2n)), as
    count·round(ln(x·H/T), 6) decimals summed exactly — partial-agg
    order can't move the result, and the ln ulp is absorbed by the
    round (the char_entropy pattern).

    Output: one row (n_groups, n_docs, theil_micro).
    """
    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("x"))
    dist = counts.groupBy("x").agg(F.count("*").cast("long").alias("m"))
    tot = dist.agg(
        F.sum("m").cast("long").alias("h"),
        F.sum(F.col("m") * F.col("x")).cast("long").alias("t"),
    )
    term = (
        (F.col("m") * F.col("x")).cast("decimal(18,0)")
        * F.round(
            F.log(
                F.col("x").cast("double")
                * F.col("h").cast("double")
                / F.col("t").cast("double")
            ),
            6,
        ).cast("decimal(18,6)")
    ).alias("term")
    s = dist.crossJoin(F.broadcast(tot)).agg(
        F.max("h").alias("h"),
        F.max("t").alias("t"),
        F.sum(term).alias("s"),
    )
    return s.select(
        F.col("h").cast("long").alias("n_groups"),
        F.col("t").cast("long").alias("n_docs"),
        F.floor(
            F.col("s").cast("double") / F.col("t").cast("double") * 1000000
        )
        .cast("long")
        .alias("theil_micro"),
    )


def emd_drift(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Exact 1-D earth-mover (Wasserstein-1) distance between each
    group's value distribution and the REST of the corpus, over log2
    buckets — the drift gauge that, unlike KS (sup of one gap) or a
    chi-square (per-bin, unordered), charges mass by how FAR it moved
    across the ordered buckets: EMD = Σ_bins |CDF_g − CDF_rest|.

    Exactness: buckets are integer (bit-length of value+1, never a
    float log); per-bin terms clear denominators —
    |cum_g·n_rest − cum_rest·n_g| — as exact decimal(38,0) products
    summed exactly; only the final normalization divides, as ONE
    pinned double.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy(group, bucket); the grid, cumulative sums, and pair
    algebra run on the bounded (groups × ~40 buckets) table — the
    per-group window is the documented bounded-domain exception.

    Output: (group, n_g, emd_micro) ordered by group.
    """
    from pyspark.sql import Window

    b = F.length(F.expr(f"bin({value_col} + 1)")).cast("long")
    gb = (
        df.select(F.col(group_col).alias("g"), b.alias("b"))
        .groupBy("g", "b")
        .agg(F.count("*").cast("long").alias("c"))
    )
    buckets = gb.select("b").distinct()
    groups = gb.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    tot = gb.groupBy("b").agg(F.sum("c").cast("long").alias("t"))
    n = gb.agg(F.sum("c").cast("long").alias("n_all"))
    grid = (
        groups.crossJoin(F.broadcast(buckets))
        .join(gb.hint("shuffle_hash"), ["g", "b"], "left")
        .join(F.broadcast(tot), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "g",
            "b",
            "n_g",
            (F.col("n_all") - F.col("n_g")).alias("n_rest"),
            F.coalesce("c", F.lit(0)).cast("long").alias("c_g"),
            (F.col("t") - F.coalesce("c", F.lit(0)))
            .cast("long")
            .alias("c_rest"),
        )
    )
    w = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "g",
        "n_g",
        "n_rest",
        F.sum("c_g").over(w).cast("long").alias("cg"),
        F.sum("c_rest").over(w).cast("long").alias("cr"),
    )
    term = F.abs(
        F.col("cg").cast("decimal(38,0)") * F.col("n_rest")
        - F.col("cr").cast("decimal(38,0)") * F.col("n_g")
    )
    per = cum.groupBy("g").agg(
        F.max("n_g").cast("long").alias("n_g"),
        F.max("n_rest").cast("long").alias("n_rest"),
        F.sum(term).alias("s"),
    )
    return per.select(
        F.col("g").alias(group_col),
        "n_g",
        F.floor(
            F.col("s").cast("double")
            / (F.col("n_g").cast("double") * F.col("n_rest").cast("double"))
            * 1000000
        )
        .cast("long")
        .alias("emd_micro"),
    ).orderBy(group_col)


def bloom_fpr_audit(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    id_col: str,
    *,
    bits: int = 8192,
    hashes: int = 3,
) -> DataFrame:
    """Empirical false-positive-rate audit of the Bloom semi-join: how
    many non-members does this (bits, hashes) configuration wave
    through as candidates? — measured on real keys, the number that
    decides whether the skipped-shuffle reduction is worth the filter
    at a given corpus scale.

    fpr_micro = (false_positives · 1e6) div non_members — exact
    integer division over a ONE-row map-side-combined aggregate of the
    ``bloom_semijoin`` flags.

    Output: one row (n_probe, n_listed, n_candidates,
    n_false_positive, fpr_micro).
    """
    flags = bloom_semijoin(
        probe, build, key_col, id_col, bits=bits, hashes=hashes
    )
    cand = F.col("bloom_candidate").cast("long")
    listed = F.col("is_listed").cast("long")
    agg = flags.agg(
        F.count("*").cast("long").alias("n_probe"),
        F.sum(listed).cast("long").alias("n_listed"),
        F.sum(cand).cast("long").alias("n_candidates"),
        F.sum(cand * (1 - listed)).cast("long").alias("n_false_positive"),
    )
    return agg.select(
        "n_probe",
        "n_listed",
        "n_candidates",
        "n_false_positive",
        F.when(
            F.col("n_probe") - F.col("n_listed") > 0,
            F.expr("(n_false_positive * 1000000) div (n_probe - n_listed)"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fpr_micro"),
    )


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    *,
    l_min: int = 2,
    report_col: str = "source",
) -> DataFrame:
    """l-diversity census — the companion audit to ``k_anonymity``: a
    quasi-identifier group where every member shares ONE sensitive value
    leaks that value even when the group is large enough to be k-anonymous
    (the homogeneity attack, Machanavajjhala et al. ICDE'06). Groups whose
    sensitive-value diversity falls below ``l_min`` must be generalized or
    suppressed before the corpus ships.

    Parity anchor: same metadata surface as ``k_anonymity`` (the
    reference's list/filter endpoint exposes per-document attributes,
    app/services/document_service.py:83-229); this is the release audit
    over that surface.

    Scale shape: one groupBy on the QI tuple with an EXACT count_distinct
    of the sensitive column (Spark plans it as a two-phase partial
    aggregate over (QI, sensitive) — both keyed shuffles are bounded by
    the QI x sensitive domain, not the corpus), then a tiny groupBy on
    ``report_col``. No window, no join, nothing collected.

    Output per ``report_col``: n_rows, n_groups, min_l (smallest group
    diversity), risky_groups (diversity < l_min), risky_rows, risk_ppm.
    """
    groups = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").alias("_ld_n"),
        F.count_distinct(F.col(sensitive_col)).alias("_ld_l"),
    )
    risky = F.when(F.col("_ld_l") < l_min, 1).otherwise(0)
    return (
        groups.groupBy(F.col(report_col))
        .agg(
            F.sum("_ld_n").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.min("_ld_l").cast("long").alias("min_l"),
            F.sum(risky).cast("long").alias("risky_groups"),
            F.sum(risky * F.col("_ld_n")).cast("long").alias("risky_rows"),
        )
        .select(
            report_col,
            "n_rows",
            "n_groups",
            "min_l",
            "risky_groups",
            "risky_rows",
            F.floor(F.col("risky_rows") * 1000000 / F.col("n_rows"))
            .cast("long")
            .alias("risk_ppm"),
        )
    )


def copurchase_pairs(
    lineitem: DataFrame,
    *,
    min_support: int = 2,
) -> DataFrame:
    """Frequent co-occurrence pairs (market-basket 2-itemsets): pairs of
    parts that appear in the same order at least ``min_support`` times —
    the support-counting core of Apriori/FP-growth, and the same shape a
    web corpus uses for per-page co-occurring entities or per-host
    co-linked targets.

    Scale shape: ONE shuffle keyed on the basket id builds the distinct
    per-basket item list (``collect_set`` is safe here because basket size
    is capped by construction — TPC-H orders carry <= 7 lineitems; a crawl
    pipeline enforces the cap upstream), then the pair fan-out happens
    INSIDE the row as an array expression (<= C(cap,2) structs per basket,
    no self-join, no second scan), and one map-side-combined groupBy
    counts supports. The naive alternative — a corpus x corpus self-join
    on basket id — shuffles the items TWICE and rebuilds every pair row
    through the join; the array formulation moves each item once. The
    oracle states the self-join; results are identical.

    Output: (part_a, part_b, n_orders) with part_a < part_b and
    n_orders >= min_support.
    """
    baskets = lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("_cp_parts")
    )
    p = F.col("_cp_parts")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    p,
                    lambda x, i: F.transform(
                        F.slice(p, i + F.lit(2), F.size(p)),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("_cp_pair")
    )
    return (
        pairs.select("_cp_pair.part_a", "_cp_pair.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= min_support)
    )


def dow_seasonality(events: DataFrame, *, ts_col: str = "ts") -> DataFrame:
    """Day-of-week seasonality profile per event type — the weekly rhythm
    gauge behind recrawl scheduling and anomaly baselines (a Monday spike
    is seasonality, not an incident, iff the profile says Mondays run
    hot). All-integer: per (event_type, dow) counts plus the share of the
    type's total in ppm.

    ``dow`` is 0=Sunday..6=Saturday (Spark ``dayofweek`` - 1, matching
    DuckDB ``dayofweek``); callers must pin the session timezone (the
    registry wrapper sets UTC) so both engines bucket the same instants.

    Scale shape: one map-side-combined groupBy on the bounded
    (event_type x 7) key; the per-type total attaches via a window over
    that bounded census table, not the corpus.
    """
    from pyspark.sql import Window

    per = events.groupBy(
        F.col("event_type"),
        (F.dayofweek(F.col(ts_col)) - 1).cast("long").alias("dow"),
    ).agg(F.count("*").cast("long").alias("n"))
    total = F.sum("n").over(Window.partitionBy("event_type"))
    return per.select(
        "event_type",
        "dow",
        "n",
        F.floor(F.col("n") * 1000000 / total).cast("long").alias("share_ppm"),
    )


def t_closeness(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    *,
    t_micro: int = 300000,
    report_col: str = "source",
) -> DataFrame:
    """t-closeness census — the third rung of the release-audit ladder
    after ``k_anonymity`` (group too small) and ``l_diversity`` (group
    too uniform): a quasi-identifier group whose sensitive-value
    DISTRIBUTION sits far from the corpus-wide one leaks information by
    skew even when it is large and diverse (Li et al. ICDE'07). Distance
    is total variation = (1/2)·Σ_v |p_g(v) − p(v)| — the categorical
    instance of the paper's EMD — in exact cleared-denominator integers:
    |c_gv·N − t_v·n_g| summed as decimal(38,0), one pinned double
    division into micro-units at the end.

    Parity anchor: same per-document metadata surface as ``k_anonymity``
    (reference list/filter endpoint, app/services/document_service.py:
    83-229); this audit gates publishing that surface.

    Scale shape: the corpus is touched by ONE map-side-combined groupBy
    on (QI, sensitive); the cells table is persisted (three consumers)
    and everything after runs on it. The grid cross-joins the QI-domain
    group census with the BROADCAST sensitive-domain value totals (the
    zero cells must exist: a group missing a value still owes
    |0 − t_v·n_g|); the join back to observed cells is pinned
    shuffle_hash because the QI domain is hosts x bands at corpus scale
    — domain-sized, not small (plan: 2 bounded broadcasts, 1 SHJ, no
    window anywhere).

    Output per ``report_col``: n_rows, n_groups, max_t_micro,
    risky_groups (tv > t_micro), risky_rows, risk_ppm.
    """
    qi = [F.col(c) for c in qi_cols]
    # persisted: consumed by the value totals, the group census AND the
    # grid join-back — without it the corpus subtree re-scans per consumer
    # (the session-13 persist-sweep lesson)
    cells = df.groupBy(*qi, F.col(sensitive_col).alias("_tc_v")).agg(
        F.count("*").cast("long").alias("_tc_c")
    ).persist()
    vals = cells.groupBy("_tc_v").agg(
        F.sum("_tc_c").cast("long").alias("_tc_tv")
    )
    total = vals.agg(F.sum("_tc_tv").cast("long").alias("_tc_n"))
    # vals/total are sensitive-domain-sized — legitimately broadcast; the
    # cells join-back is QI-domain-sized (hosts x bands at corpus scale),
    # so it must stay a shuffle join, never a planner broadcast
    grid = (
        cells.groupBy(*qi)
        .agg(F.sum("_tc_c").cast("long").alias("_tc_ng"))
        .crossJoin(F.broadcast(vals))
        .crossJoin(F.broadcast(total))
        .join(cells.hint("shuffle_hash"), [*qi_cols, "_tc_v"], "left")
        .withColumn("_tc_c0", F.coalesce(F.col("_tc_c"), F.lit(0)))
    )
    term = F.abs(
        F.col("_tc_c0").cast("decimal(38,0)") * F.col("_tc_n")
        - F.col("_tc_tv").cast("decimal(38,0)") * F.col("_tc_ng")
    )
    per = grid.groupBy(*qi).agg(
        F.max("_tc_ng").alias("_tc_ng"),
        F.max("_tc_n").alias("_tc_n"),
        F.sum(term).alias("_tc_s"),
    )
    tv_micro = F.floor(
        F.col("_tc_s").cast("double")
        * 1000000
        / (
            2.0
            * F.col("_tc_ng").cast("double")
            * F.col("_tc_n").cast("double")
        )
    ).cast("long")
    per = per.withColumn("_tc_tvm", tv_micro)
    risky = F.when(F.col("_tc_tvm") > t_micro, 1).otherwise(0)
    return (
        per.groupBy(F.col(report_col))
        .agg(
            F.sum("_tc_ng").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_groups"),
            F.max("_tc_tvm").cast("long").alias("max_t_micro"),
            F.sum(risky).cast("long").alias("risky_groups"),
            F.sum(risky * F.col("_tc_ng")).cast("long").alias("risky_rows"),
        )
        .select(
            report_col,
            "n_rows",
            "n_groups",
            "max_t_micro",
            "risky_groups",
            "risky_rows",
            F.floor(F.col("risky_rows") * 1000000 / F.col("n_rows"))
            .cast("long")
            .alias("risk_ppm"),
        )
    )


def mann_whitney(
    df: DataFrame,
    value_col: str,
    group_a: str,
    group_b: str,
    *,
    group_col: str = "source",
) -> DataFrame:
    """Mann-Whitney U rank-sum test between two groups' value
    distributions — the nonparametric companion to ``welch_ttest``
    (which trusts moments) and ``ks_statistic`` (sup of one CDF gap):
    U measures P(a > b) via ranks, robust to outliers and any monotone
    transform of the values.

    Exactness: ranks come from the distinct-VALUE distribution table,
    not from per-row ranking — with c_v ties at value v and C_v rows
    strictly below, every tied row carries average rank C_v + (c_v+1)/2,
    so TWICE the rank sum of A is the integer Σ_v ca_v·(2·C_v + c_v + 1)
    and u2 = 2·U_A = that minus n_a(n_a+1) exactly. The tie-corrected
    normal z uses Var(U) = (na·nb/12)·((n+1) − T/(n(n−1))) with
    T = Σ(c³−c): z = (u2 − na·nb) / sqrt(na·nb/3·((n+1) − T/(n(n−1)))),
    ONE pinned IEEE expression floored to micro.

    Scale shape (cusum/theil discipline): the corpus is touched by ONE
    map-side-combined groupBy(value); the cumulative-count window runs
    on the bounded distinct-value table only (k distinct values, not n
    rows) in a single partition — legitimate because the value domain is
    bounded, never corpus-sized.

    Output: one row (n_a, n_b, u2_a, tie_t, z_micro).
    """
    ia = F.when(F.col(group_col) == group_a, 1).otherwise(0)
    ib = F.when(F.col(group_col) == group_b, 1).otherwise(0)
    d = df.where(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).cast("long").alias("_mw_v"),
        ia.alias("_mw_a"),
        ib.alias("_mw_b"),
    )
    dist = d.groupBy("_mw_v").agg(
        F.sum("_mw_a").cast("long").alias("_mw_ca"),
        F.sum("_mw_b").cast("long").alias("_mw_cb"),
    )
    w = Window.orderBy("_mw_v").rowsBetween(Window.unboundedPreceding, -1)
    c = (F.col("_mw_ca") + F.col("_mw_cb")).cast("long")
    dist = dist.withColumn(
        "_mw_cum", F.coalesce(F.sum(c).over(w), F.lit(0)).cast("long")
    )
    r2 = 2 * F.col("_mw_cum") + c + 1
    agg = dist.agg(
        F.sum("_mw_ca").cast("long").alias("n_a"),
        F.sum("_mw_cb").cast("long").alias("n_b"),
        F.sum(F.col("_mw_ca").cast("decimal(38,0)") * r2).alias("_mw_r2a"),
        F.sum(
            c.cast("decimal(38,0)") * c * c - c
        ).alias("tie_t"),
    )
    u2 = (
        F.col("_mw_r2a")
        - F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1)
    ).cast("decimal(38,0)")
    n = (F.col("n_a") + F.col("n_b")).cast("double")
    var3 = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / 3.0
        * (
            (n + 1.0)
            - F.col("tie_t").cast("double") / (n * (n - 1.0))
        )
    )
    z = (
        u2.cast("double")
        - F.col("n_a").cast("double") * F.col("n_b").cast("double")
    ) / F.sqrt(var3)
    return agg.select(
        "n_a",
        "n_b",
        u2.cast("long").alias("u2_a"),
        # decimal(38,0), NOT long: tie_t = Σ(c³−c) is cubic in the tie
        # size, so >2.09M tied rows exceed int64 — the ADVICE r4 wrap,
        # now exact end-to-end (oracle side is hugeint, uncast)
        F.col("tie_t"),
        F.floor(z * 1000000).cast("long").alias("z_micro"),
    )


def fleiss_kappa(
    df: DataFrame,
    raters: list,
    *,
    report_col: str = "source",
) -> DataFrame:
    """Fleiss' kappa across m >= 2 deterministic binary raters (quality
    filters voting keep/drop on every document) — the multi-rater
    generalization of ``filter_agreement``'s Cohen kappa: how much the
    filter ENSEMBLE agrees beyond chance, per source. Near-zero kappa
    says the filters are independent signals; near-one says they are
    redundant and the ensemble adds nothing over any single member.

    Fully rational — no float until the final division: with m raters,
    k_i = keep-votes on doc i, P_i = (k_i² + (m−k_i)² − m)/(m(m−1)),
    S = Σk_i, Q = Σ(k_i² + (m−k_i)² − m), E = S² + (mN−S)², clearing
    denominators in kappa = (P̄−P_e)/(1−P_e) with P̄ = Q/(N·m(m−1)) and
    P_e = E/(m²N²) gives
        kappa = (Q·m²N² − N·m(m−1)·E) / (N·m(m−1)·(m²N² − E)),
    computed in decimal(38,0) numerator/denominator and floored to
    micro-units through one pinned double division.

    Scale shape: every rater is a codegen column expression, so the
    corpus is touched by ONE scan folding straight into a
    map-side-combined groupBy(report_col); the kappa algebra runs on the
    bounded per-source table. No join, no window, nothing collected.

    Output per source: n_docs, m_raters, keep_votes, kappa_micro.
    """
    m = len(raters)
    k = None
    for r in raters:
        c = F.when(r, 1).otherwise(0)
        k = c if k is None else k + c
    k = k.cast("long")
    per = df.groupBy(F.col(report_col)).agg(
        F.count("*").cast("long").alias("_fk_n"),
        F.sum(k).cast("long").alias("_fk_s"),
        F.sum(k * k + (m - k) * (m - k) - m).cast("long").alias("_fk_q"),
    )
    n_ = F.col("_fk_n").cast("decimal(38,0)")
    s_ = F.col("_fk_s").cast("decimal(38,0)")
    q_ = F.col("_fk_q").cast("decimal(38,0)")
    e_ = s_ * s_ + (m * n_ - s_) * (m * n_ - s_)
    num = (q_ * (m * m) * n_ * n_ - n_ * (m * (m - 1)) * e_).cast("double")
    den_d = (m * m) * n_ * n_ - e_
    den = (n_ * (m * (m - 1)) * den_d).cast("double")
    # den_d == 0 iff every doc got a unanimous vote the same way
    # (P_e = 1): kappa is 0/0 — Spark's non-ANSI division NULLs while
    # DuckDB doubles give nan; pin the degenerate case to 1000000
    # (perfect agreement) in BOTH engines.
    kappa = F.when(
        den_d != 0, F.floor(num * 1000000 / den)
    ).otherwise(F.lit(1000000))
    return per.select(
        report_col,
        F.col("_fk_n").alias("n_docs"),
        F.lit(m).cast("long").alias("m_raters"),
        F.col("_fk_s").alias("keep_votes"),
        kappa.cast("long").alias("kappa_micro"),
    )


def shannon_diversity(
    df: DataFrame,
    group_col: str = "source",
    cat_col: str = "lang",
) -> DataFrame:
    """Shannon entropy + Pielou evenness of the category mix per group —
    the log-scaled companion to ``simpson_diversity`` (pair-collision
    probability): H charges rare categories more, and H/ln(k) normalizes
    to [0,1] so groups with different category counts compare.

    Determinism (theil_index discipline): H = ln(n) − (1/n)·Σ c·ln(c)
    with every ln computed on the BOUNDED (group x category) census
    table as count·round(ln(c),6) decimal terms — partial-agg order
    cannot move the sum, and the ln ulp is absorbed by the round.

    Scale shape: ONE map-side-combined groupBy on the bounded
    (group, category) key, then a tiny groupBy(group). No window, no
    join.

    Output per group: n_docs, n_cats, shannon_micro, evenness_micro.
    """
    cells = df.groupBy(
        F.col(group_col), F.col(cat_col).alias("_sh_c")
    ).agg(F.count("*").cast("long").alias("_sh_n"))
    term = (
        F.col("_sh_n").cast("decimal(18,0)")
        * F.round(F.log(F.col("_sh_n").cast("double")), 6).cast(
            "decimal(18,6)"
        )
    )
    per = cells.groupBy(group_col).agg(
        F.sum("_sh_n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_cats"),
        F.sum(term).alias("_sh_s"),
    )
    h = F.round(F.log(F.col("n_docs").cast("double")), 6) - F.col(
        "_sh_s"
    ).cast("double") / F.col("n_docs").cast("double")
    even = F.when(
        F.col("n_cats") > 1,
        F.floor(
            h
            / F.round(F.log(F.col("n_cats").cast("double")), 6)
            * 1000000
        ),
    ).otherwise(F.lit(0))
    return per.select(
        group_col,
        "n_docs",
        "n_cats",
        F.floor(h * 1000000).cast("long").alias("shannon_micro"),
        even.cast("long").alias("evenness_micro"),
    )


def peak_concurrency(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Peak concurrent-interval census per user via the classic
    sweep-line: each event opens a half-open session interval
    [t, t + dur) (dur derived all-integer from the event id so both
    engines agree bit-for-bit), the interval endpoints become +1/−1
    deltas, and the running sum's maximum is that user's peak
    concurrency — the same shape that audits simultaneous fetches per
    crawler host slot or overlapping capture windows per URL.

    Determinism under ties: endpoints sort by (t, delta), so at equal t
    the −1 of a closing interval lands before the +1 of an opening one
    (half-open semantics) — and within a tied (t, delta) run the prefix
    sums form the same SET whichever order the tied rows take, so
    max(running) is order-independent without a third tiebreak.

    Scale shape: the 2x endpoint fan-out is a per-row array explode (no
    second scan); the running sum is a window PARTITIONED BY USER —
    per-user event counts are bounded (the sessionize_events precedent),
    never corpus-wide. The final histogram groupBy runs on the bounded
    per-user peak table.

    Output: peak -> n_users histogram (bounded by max per-user fan-in),
    ordered by peak.
    """
    t0 = F.col(ts_col).cast("timestamp").cast("long")
    dur = (60 + F.col("event_id") % 240).cast("long")
    pts = events.select(
        F.col(user_col).alias("_pc_u"),
        F.explode(
            F.array(
                F.struct(
                    t0.alias("t"), F.lit(1).cast("long").alias("d")
                ),
                F.struct(
                    (t0 + dur).alias("t"),
                    F.lit(-1).cast("long").alias("d"),
                ),
            )
        ).alias("_pc_p"),
    ).select("_pc_u", F.col("_pc_p.t").alias("_pc_t"), F.col("_pc_p.d").alias("_pc_d"))
    w = Window.partitionBy("_pc_u").orderBy("_pc_t", "_pc_d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = F.sum("_pc_d").over(w)
    peaks = (
        pts.withColumn("_pc_r", run)
        .groupBy("_pc_u")
        .agg(F.max("_pc_r").cast("long").alias("_pc_peak"))
    )
    return (
        peaks.groupBy(F.col("_pc_peak").alias("peak"))
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("peak")
    )


def quantile_sketch(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Build the exact mergeable distribution sketch behind
    ``grouped_quantiles``: per-(group, value) counts over a
    bounded-domain integer column. This IS a sketch in the mergeable-
    summary sense — bounded size independent of row count, and two
    sketches merge by summing counts per cell with zero error (the
    property ``merge_quantile_sketches`` + the parity oracle prove) —
    the exact-arithmetic sibling of KLL/t-digest for columns whose
    domain is bounded (doc length, token count, latency ms, status
    code).

    Scale shape: ONE map-side-combined groupBy on the bounded
    (group x value) key; nothing else.
    """
    return df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).alias("val")
    ).agg(F.count("*").cast("long").alias("cnt"))


def merge_quantile_sketches(*sketches: DataFrame) -> DataFrame:
    """Merge distribution sketches by summing per-cell counts — the
    incremental-maintenance face (rollup_merge / merge_minhash_states
    discipline): merged(state, batch) must equal the full recompute,
    which is exactly what the parity oracle states.

    Scale shape: union + ONE map-side-combined groupBy on the bounded
    cell key.
    """
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("grp", "val").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def quantiles_from_sketch(
    sketch: DataFrame,
    group_col: str = "source",
    qs_ppm: tuple[int, ...] = (500000, 900000, 990000),
) -> DataFrame:
    """Exact discrete quantiles from a distribution sketch — the read
    face of ``quantile_sketch``; same stated all-integer definition as
    ``grouped_quantiles`` (smallest value whose cumulative count >=
    ceil(q_ppm·n/10^6)), windows over the bounded sketch only.
    """
    w_cum = Window.partitionBy("grp").orderBy("val")
    w_all = Window.partitionBy("grp")
    cum = sketch.select(
        "grp",
        "val",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n_rows"),
    )
    aggs = [F.max("n_rows").cast("long").alias("n_rows")]
    for q in qs_ppm:
        need = F.expr(f"({q} * n_rows + 999999) div 1000000")
        aggs.append(
            F.min(F.when(F.col("cum") >= need, F.col("val")))
            .cast("long")
            .alias(f"q_{q}")
        )
    return cum.groupBy(F.col("grp").alias(group_col)).agg(*aggs)


def concentration_indices(
    df: DataFrame, group_col: str = "source", id_col: str = "doc_id"
) -> DataFrame:
    """Market-concentration battery over the host/document distribution
    — one row (n_hosts, n_docs, hhi_micro, hhi_norm_micro, mld_micro)
    joining the inequality family (``host_gini``, ``theil_index``):

    - HHI = Σ share_i² (Herfindahl-Hirschman), the merger-review gauge —
      exact as floor(Σx²·10^6 / N²);
    - normalized HHI = (HHI − 1/n)/(1 − 1/n), 0 even .. 1 monopoly —
      exact as floor((Σx²·n − N²)·10^6 / (N²·(n−1)));
    - MLD (mean log deviation, Theil's L) = ln(μ) − mean(ln x) — the
      ε→1 Atkinson index in log form (A = 1 − e^−MLD), kept in the
      ln-only rounding discipline deliberately: an exp() would pit two
      libm implementations against a floor boundary.

    Scale shape (theil_index discipline): ONE map-side-combined
    groupBy(group), then every log term on the provably bounded
    distinct-count distribution table (k distinct counts need
    Σx ≥ k(k+1)/2 docs); Σx² is a plain decimal aggregate off the same
    table. No window, no join, nothing corpus-sized past the first
    groupBy.
    """
    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("x"))
    dist = counts.groupBy("x").agg(F.count("*").cast("long").alias("m"))
    lnterm = (
        F.col("m").cast("decimal(18,0)")
        * F.round(F.log(F.col("x").cast("double")), 6).cast("decimal(18,6)")
    )
    agg = dist.agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("x")).cast("long").alias("t"),
        F.sum(
            (F.col("m").cast("decimal(38,0)") * F.col("x") * F.col("x"))
        ).alias("sx2"),
        F.sum(lnterm).alias("slnx"),
    )
    n_, t_, sx2 = F.col("n"), F.col("t"), F.col("sx2")
    mld = F.round(
        F.log(t_.cast("double") / n_.cast("double")), 6
    ) - F.col("slnx").cast("double") / n_.cast("double")
    return agg.select(
        n_.alias("n_hosts"),
        t_.alias("n_docs"),
        F.floor(
            sx2.cast("double")
            * 1000000
            / (t_.cast("double") * t_.cast("double"))
        ).cast("long").alias("hhi_micro"),
        F.when(
            n_ > 1,
            F.floor(
                (sx2 * n_ - t_.cast("decimal(38,0)") * t_).cast("double")
                * 1000000
                / (
                    (t_.cast("decimal(38,0)") * t_) * (n_ - 1)
                ).cast("double")
            ),
        )
        # n=1 (single host): (HHI-1/n)/(1-1/n) is 0/0 — Spark's
        # non-ANSI division would NULL while DuckDB doubles give
        # inf/nan; pin the degenerate case to -1 in BOTH engines.
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("hhi_norm_micro"),
        F.floor(mld * 1000000).cast("long").alias("mld_micro"),
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Population Stability Index per group between two snapshots — the
    production-ML drift gauge (PSI = Σ_bins (p_A − p_B)·ln(p_A/p_B))
    complementing the family this repo already carries: KL
    (source_divergence, vs the corpus mix), EMD (ordered mass
    transport), KS/CvM (sup/integral CDF gaps) — PSI is symmetric,
    per-bin decomposable, and the industry threshold convention
    (0.1 warn / 0.25 act) makes it the monitoring default.

    Bins are the emd_drift log2 buckets (bit_length of value+1 — integer,
    never float log); add-1 smoothing on the per-group bucket grid keeps
    empty bins finite. Exactness: with M = n + K (K = grid bins),
    PSI = Σ ((c_A+1)·M_B − (c_B+1)·M_A) · ln((c_A+1)·M_B /
    ((c_B+1)·M_A)) / (M_A·M_B); each bin term is ONE pinned double
    product of the exact decimal mass difference with the round(ln·,6)
    ratio, itself rounded to 6 dp before an exact decimal sum (the
    chi_square pattern — partial-agg order can't move it), then ONE
    pinned double division at the end.

    Scale shape: each snapshot is touched by ONE map-side-combined
    groupBy on (group, bucket); the full-outer bucket-grid join and
    everything after run on bounded tables (groups x <=64 buckets).
    """
    b = F.length(F.bin(F.col(value_col) + 1)).cast("long")

    def gb(d: DataFrame, cn: str) -> DataFrame:
        return d.groupBy(
            F.col(group_col).alias("grp"), b.alias("bkt")
        ).agg(F.count("*").cast("long").alias(cn))

    ga, gbb = gb(df_a, "ca"), gb(df_b, "cb")
    # persisted: the bounded grid (groups x <=64 buckets) feeds both the
    # per-group totals and the term join — without it each consumer
    # re-scans BOTH snapshot subtrees (plan-audited: 4 corpus scans)
    grid = (
        ga.join(gbb, ["grp", "bkt"], "full_outer")
        .select(
            "grp",
            "bkt",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
        .persist()
    )
    per = grid.groupBy("grp").agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count("*").cast("long").alias("k"),
    )
    j = grid.join(per.hint("shuffle_hash"), "grp").select(
        "grp",
        "bkt",
        (F.col("ca") + 1).alias("sa"),
        (F.col("cb") + 1).alias("sb"),
        (F.col("na") + F.col("k")).alias("ma"),
        (F.col("nb") + F.col("k")).alias("mb"),
    )
    # chi_square discipline: ONE pinned double expression per row,
    # rounded to 6 dp before the exact decimal sum — a decimal x decimal
    # product here would trip Spark's precision-overflow scale reduction
    # (the BASELINE.md round-3 trap) where DuckDB keeps the scale
    dn = (
        F.col("sa").cast("decimal(38,0)") * F.col("mb")
        - F.col("sb").cast("decimal(38,0)") * F.col("ma")
    )
    lr = F.round(
        F.log(
            (F.col("sa").cast("double") * F.col("mb").cast("double"))
            / (F.col("sb").cast("double") * F.col("ma").cast("double"))
        ),
        6,
    )
    term = F.round(dn.cast("double") * lr, 6).cast("decimal(28,6)")
    agg = j.groupBy(F.col("grp").alias(group_col)).agg(
        F.max("ma").alias("ma"),
        F.max("mb").alias("mb"),
        F.sum(term).alias("s"),
    )
    return agg.select(
        group_col,
        (F.col("ma")).cast("long").alias("m_a"),
        (F.col("mb")).cast("long").alias("m_b"),
        F.floor(
            F.col("s").cast("double")
            * 1000000
            / (F.col("ma").cast("double") * F.col("mb").cast("double"))
        ).cast("long").alias("psi_micro"),
    )


def range_partition_audit(
    df: DataFrame, value_col: str = "n_chars", qs_ppm: tuple[int, ...] = (250000, 500000, 750000)
) -> DataFrame:
    """Range-partitioner layout audit: derive exact split points from
    the bounded value-distribution sketch (the same stated quantile
    definition as ``grouped_quantiles`` — smallest value whose
    cumulative count >= ceil(q·n/10^6)), assign every row its range by
    threshold comparison, and report per-range (n_rows, min_v, max_v) —
    the audit that verifies a global-sort file layout (ORDER BY output,
    time-range partitioning) has non-overlapping, balanced ranges
    BEFORE 100 TB gets written in that order. This is what Spark's
    RangePartitioner does by reservoir sample; the sketch derivation is
    the exact, deterministic version.

    Scale shape: ONE map-side-combined groupBy(value) builds the
    bounded distribution; the cumulative window runs on that bounded
    table only (mann_whitney discipline); the 3-threshold row
    broadcasts; range assignment is a codegen CASE at scan speed and
    ONE map-side-combined groupBy(range) closes.

    Output: (range_id, n_rows, min_v, max_v) ordered by range_id —
    non-overlap is visible as max_v(range k) < min_v(range k+1).
    """
    v = F.col(value_col).cast("long")
    dist = df.groupBy(v.alias("_rp_v")).agg(
        F.count("*").cast("long").alias("_rp_c")
    )
    w = Window.orderBy("_rp_v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = dist.select(
        "_rp_v",
        F.sum("_rp_c").over(w).alias("_rp_cum"),
        F.sum("_rp_c").over(w_all).alias("_rp_n"),
    )
    aggs = []
    for q in qs_ppm:
        need = F.expr(f"({q} * _rp_n + 999999) div 1000000")
        aggs.append(
            F.min(F.when(F.col("_rp_cum") >= need, F.col("_rp_v")))
            .cast("long")
            .alias(f"_rp_t{q}")
        )
    th = cum.agg(*aggs)
    j = df.select(v.alias("_rp_val")).crossJoin(F.broadcast(th))
    rid = F.lit(len(qs_ppm)).cast("long")
    for i, q in enumerate(reversed(qs_ppm)):
        rid = F.when(
            F.col("_rp_val") < F.col(f"_rp_t{q}"),
            F.lit(len(qs_ppm) - 1 - i),
        ).otherwise(rid)
    return (
        j.select(rid.alias("range_id"), "_rp_val")
        .groupBy("range_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("_rp_val").cast("long").alias("min_v"),
            F.max("_rp_val").cast("long").alias("max_v"),
        )
        .orderBy("range_id")
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window_sec: int = 600,
    slide_sec: int = 300,
) -> DataFrame:
    """Sliding-window event counts via the built-in ``F.window`` with a
    slide — completing the window-type triple next to
    ``windowed_event_counts`` (tumbling) and ``session_window_agg``
    (gap-merged): each event lands in window_sec/slide_sec overlapping
    windows, the shape behind every rate-limiter and rolling-rate
    dashboard. Counts only (no value sums) so the overlap fan-out stays
    all-integer.

    Scale shape: F.window expands each row to its window assignments
    IN-ROW (no self-join), then ONE map-side-combined groupBy on the
    bounded (window_start, type) key. Callers pin the session timezone
    (the registry wrapper sets UTC) — window bucketing reads instants.

    Output: (window_start, event_type, n_events) ordered.
    """
    w = F.window(
        F.col(ts_col), f"{window_sec} seconds", f"{slide_sec} seconds"
    )
    return (
        events.groupBy(
            w.alias("_sw"), F.col("event_type")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            # NTZ start -> instant -> epoch (the registry's _utc idiom)
            F.col("_sw.start").cast("timestamp").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
    )
