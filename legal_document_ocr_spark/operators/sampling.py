"""Deterministic sampling for training-data curation.

A web-scale corpus pipeline samples constantly — per-language rebalancing,
eval-holdout carving, cheap profiling passes. ``df.sample()`` is
seed-and-partitioning dependent (a repartition changes the sample), which
breaks resumability and makes results impossible to oracle. These operators
sample by CONTENT-ADDRESSED hash instead: membership is a pure function of
the row's key, so the sample is stable across runs, partitionings, engines
(md5 is portable — the DuckDB oracle states the identical computation) and
incremental arrivals (a new row's membership never disturbs old rows').
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import ws_tokens

# 28-bit md5 prefix -> uniform int in [0, 10000): membership at 4-decimal
# fraction granularity. Small enough for exact bigint math everywhere.
_BUCKETS = 10_000


def hash_bucket(key: Column) -> Column:
    """Uniform deterministic bucket in [0, 10000) from md5 of the key."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        % _BUCKETS
    )


def deterministic_sample(
    df: DataFrame, fraction: float, *, key_col: str
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < fraction * 10000.

    Exactly reproducible: same key -> same decision, independent of
    partitioning, row order, cluster size, or what else is in the corpus.
    """
    return df.where(hash_bucket(F.col(key_col)) < int(fraction * _BUCKETS))


def mixture_weights(
    df: DataFrame,
    targets: Mapping[str, float],
    *,
    key_col: str,
    group_col: str,
) -> DataFrame:
    """Rebalance a corpus toward a TARGET MIXTURE (the data-mixing step of
    training-set assembly: "the final mix should be 50% src0, 30% src1, ...").

    For each group g with c_g rows in a corpus of T rows and target share
    t_g, the keep rate is r_g = min(1, t_g·T / c_g) — downsample
    over-represented groups toward the target, never upsample. The keep
    decision is the content-addressed hash bucket (< floor(r_g·10⁴)), so
    membership is stable across runs/partitionings/engines and the realized
    mixture converges to the target as T grows.

    Scale shape: one map-side-combined count per group (bounded by |groups|,
    broadcastable by construction) joined back to the corpus; the decision
    itself is a pure row expression. Output: every input row plus
    (keep_threshold, keep) — the caller filters on ``keep`` or audits rates.
    """
    total = df.count()  # scalar driver aggregate, O(1) result
    counts = df.groupBy(group_col).agg(F.count("*").alias("_cg"))
    # targets as a joined table, not a |targets|-deep CASE chain: a realistic
    # per-domain mixture has thousands of groups, and a nested-WHEN expression
    # tree that size breaks codegen long before the data does
    spark = df.sparkSession
    from pyspark.sql.types import DoubleType, StructField, StructType

    # the group key keeps the INPUT column's type (an int-keyed mixture must
    # not silently fail against a string-typed schema, or vice versa)
    tgt = spark.createDataFrame(
        [(g, float(t)) for g, t in sorted(targets.items())],
        StructType(
            [
                StructField(group_col, df.schema[group_col].dataType),
                StructField("_target", DoubleType()),
            ]
        ),
    )
    rate = F.least(
        F.lit(1.0), F.col("_target") * F.lit(total) / F.col("_cg").cast("double")
    )
    # explicit null guard: F.least SKIPS nulls (least(1.0, NULL) == 1.0), so
    # an unlisted group would silently keep everything instead of dropping
    thr = F.when(
        F.col("_target").isNotNull(), F.floor(rate * _BUCKETS).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        df.join(F.broadcast(counts), group_col)
        .join(F.broadcast(tgt), group_col, "left")
        .withColumn("keep_threshold", thr)
        .withColumn(
            "keep",
            (hash_bucket(F.col(key_col)) < F.col("keep_threshold")).cast("int"),
        )
        .drop("_cg", "_target")
    )


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    *,
    key_col: str,
    strata_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 30% of 'en', 100% of
    low-resource languages): the per-language rebalancing pass of a training
    mix. Strata not in ``fractions`` keep ``default_fraction``.
    """
    threshold = F.lit(int(default_fraction * _BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(frac * _BUCKETS))
        ).otherwise(threshold)
    return df.where(hash_bucket(F.col(key_col)) < threshold)


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document by
    how much more likely its hashed-token profile is under a small TARGET
    domain corpus than under the raw corpus itself; downstream selection
    resamples raw docs proportional to exp(weight).

    100 TB shape: both distributions are one explode -> map-side-combined
    groupBy onto a BOUNDED ``n_buckets`` vocabulary (the hashing trick — no
    corpus-sized vocabulary ever materializes); the per-bucket log-ratio
    table is ``n_buckets`` rows and broadcasts; the only corpus-sized
    exchange is the (doc_id, bucket) count groupBy, pre-combined on the map
    side. Nothing iterates, nothing collects beyond two scalar totals.

    Determinism across engines (char_entropy discipline): each bucket's two
    log-probabilities are rounded to 12 dp and differenced as
    DECIMAL(20,12); per-doc terms ``cnt * ratio`` are summed as DECIMAL
    (exact, order-independent), then ONE double conversion + floor(micro) at
    the end. Add-1 smoothing over ``n_buckets`` keeps unseen buckets finite.

    Output: (doc_id, n_tokens, log_weight_micro) — NULL weight for docs with
    no tokens. Reference analogue: confidence-gated acceptance of extracted
    fields (/root/reference/app/services/extraction_service.py) generalized
    to corpus-level distribution matching.
    """
    toks = ws_tokens(F.lower(F.col(text_col)))

    def _bucket(c: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("bigint")
            % n_buckets
        )

    def _dist(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(toks).alias("tok"))
            .select(_bucket(F.col("tok")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
        )

    raw = _dist(docs)
    tgt = _dist(target)
    # two scalar actions (bounded-row inputs) — the repo-wide collect budget
    n_raw = raw.agg(F.sum("cnt")).collect()[0][0] or 0
    n_tgt = tgt.agg(F.sum("cnt")).collect()[0][0] or 0

    def _logp(cnt: Column, total: int) -> Column:
        return F.round(
            F.log((cnt + F.lit(1)).cast("double") / F.lit(float(total + n_buckets))),
            12,
        ).cast("decimal(20,12)")

    ratio = (
        raw.join(tgt.withColumnRenamed("cnt", "tcnt"), "bucket", "left")
        .select(
            "bucket",
            (
                _logp(F.coalesce(F.col("tcnt"), F.lit(0)), n_tgt)
                - _logp(F.col("cnt"), n_raw)
            ).alias("ratio"),
        )
    )
    per_doc = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .select("doc_id", _bucket(F.col("tok")).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt").cast("decimal(18,0)") * F.col("ratio")).alias("s"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.when(
                F.col("s").isNotNull(),
                F.floor(F.col("s").cast("double") * 1000000.0).cast("long"),
            ).alias("log_weight_micro"),
        )
    )


def source_kl_divergence(
    docs: DataFrame,
    text_col: str = "text",
    *,
    group_col: str = "source",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-source distribution drift vs the whole corpus: the plug-in KL
    estimate over hashed-token buckets — observed-frequency outer weights,
    add-1-smoothed inner probabilities (zero-count buckets contribute 0 by
    construction). The mixture-monitoring dual of [[dsir_log_weights]]:
    DSIR scores documents against a target; this scores SOURCES against
    the corpus, the drift alarm of a multi-source ingestion pipeline (a
    feed whose KL jumps changed its content mix or got spam-injected).

    100 TB shape: one corpus explode feeds BOTH distributions as map-side-
    combined groupBys onto bounded keys ((group, bucket) and (bucket)); the
    corpus log-prob table is n_buckets rows and broadcasts; per-group sums
    are decimal (order-independent), ONE double division + floor(micro) at
    the end per group. Nothing corpus-sized shuffles except the token
    explode itself.

    Output: (source, n_tokens, kl_micro).
    """
    toks = ws_tokens(F.lower(F.col(text_col)))
    g = F.col(group_col)

    def _bucket(c: Column) -> Column:
        return (
            F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("bigint")
            % n_buckets
        )

    ex = docs.select(g.alias("_grp"), F.explode(toks).alias("tok")).select(
        "_grp", _bucket(F.col("tok")).alias("bucket")
    )
    gb = ex.groupBy("_grp", "bucket").agg(F.count("*").alias("s_gb"))
    corpus = ex.groupBy("bucket").agg(F.count("*").alias("c_b"))
    n_corpus = corpus.agg(F.sum("c_b")).collect()[0][0] or 0
    c_logp = corpus.select(
        "bucket",
        F.round(
            F.log(
                (F.col("c_b") + F.lit(1)).cast("double")
                / F.lit(float(n_corpus + n_buckets))
            ),
            12,
        )
        .cast("decimal(20,12)")
        .alias("lnc"),
    )
    totals = gb.groupBy("_grp").agg(F.sum("s_gb").alias("n_g"))
    term = F.col("s_gb").cast("decimal(18,0)") * (
        F.round(
            F.log(
                (F.col("s_gb") + F.lit(1)).cast("double")
                / (F.col("n_g") + F.lit(n_buckets)).cast("double")
            ),
            12,
        ).cast("decimal(20,12)")
        - F.col("lnc")
    )
    return (
        gb.join(totals.hint("shuffle_hash"), "_grp")
        .join(F.broadcast(c_logp), "bucket")
        .groupBy("_grp")
        .agg(F.max("n_g").alias("n_tokens"), F.sum(term).alias("s"))
        .select(
            F.col("_grp").alias(group_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.floor(
                F.col("s").cast("double") / F.col("n_tokens") * 1000000.0
            )
            .cast("long")
            .alias("kl_micro"),
        )
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted top-k sampling: keep the k records with the
    smallest ``priority = hash56(key) div weight`` per stratum — the
    integer-exact analogue of priority/exponential-race sampling (bigger
    weight divides the uniform hash further down, so selection odds grow
    with weight), with zero randomness: same input, same sample, any
    cluster size. This is the quality-weighted corpus subsetting step a
    training mix runs after scoring (weight = quality points, token
    count, DSIR weight, ...); weights must be positive integers.

    Scale: the rank filter compiles to a WindowGroupLimit — Spark keeps
    only k rows per stratum BEFORE the exchange (partial limit map-side),
    so a per-source stratum never materializes a corpus-sized sort the
    way a bare ntile/rank window would (the length_ntiles lesson:
    plan-asserted in tests).

    Output: (strata, key, weight, priority, rn) — rn 1..k by priority.
    """
    from pyspark.sql import Window

    key = F.col(key_col)
    w = F.col(weight_col).cast("long")
    # integer arithmetic end-to-end (div, not /): cross-engine exact
    pri = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 14),"
        f" 16, 10) as bigint) div cast({weight_col} as bigint)"
    ).cast("long")
    strata = F.col(strata_col) if strata_col else F.lit("all")
    # partition by the POST-select alias — the input strata column is
    # renamed away before the window applies
    win = Window.partitionBy(F.col("strata")).orderBy(
        F.col("priority").asc(), F.col(key_col).asc()
    )
    ranked = df.select(
        strata.alias("strata"),
        key.alias(key_col),
        w.alias(weight_col),
        pri.alias("priority"),
    ).withColumn("rn", F.row_number().over(win))
    return ranked.where(F.col("rn") <= k)


def domain_quality_ci(
    docs: DataFrame,
    pass_col: str,
    group_col: str = "source",
    z: float = 1.96,
) -> DataFrame:
    """Wilson score LOWER BOUND on each domain's quality pass-rate — the
    ranking statistic that does not reward tiny samples: a host with 2/2
    passing docs ranks below one with 900/1000, because the bound prices
    in the sample size (the sort-by-average trap). This is how a crawl
    decides which domains earn deeper budgets from early quality
    signals; any boolean (gopher pass, classifier verdict, dedup
    survival) plugs in as ``pass_col``.

    One map-side-combined aggregate per group (count + sum of a 0/1) —
    bounded by |domains|, no second pass. The bound itself is pure
    double IEEE arithmetic stated operation-for-operation in the oracle
    (z entered as the literal, z² as z*z — never a rounded constant),
    emitted as floor(lb*1e6) micro-units. Output: (group, n_docs,
    n_pass, wilson_lb_micro).
    """
    g = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(pass_col).cast("long")).alias("n_pass"),
    )
    n = F.col("n_docs")
    zc = F.lit(float(z))
    z2 = zc * zc
    p = F.col("n_pass") / n
    num = p + z2 / (F.lit(2) * n) - zc * F.sqrt(
        (p * (F.lit(1.0) - p) + z2 / (F.lit(4) * n)) / n
    )
    den = F.lit(1.0) + z2 / n
    return g.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_pass",
        F.floor(num / den * F.lit(1000000.0)).cast("long").alias(
            "wilson_lb_micro"
        ),
    )


def budget_select(
    docs: DataFrame,
    *,
    tier_col: str,
    weight_col: str,
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Tiered token-budget selection: per group (source/host/language),
    admit documents best-quality-tier first — hash-ordered inside a tier
    so the marginal tier contributes an unbiased sample — until the
    group's ``budget`` (in ``weight_col`` units, e.g. tokens) is filled.
    A document is admitted iff the budget hasn't been exhausted when its
    span STARTS (shard_assign's convention). This is the "take the best
    N tokens per source" step of assembling a training mix from scored
    corpora; ``tier_col`` must be a small ordered int (quality bucket),
    higher = better.

    Scale shape — the length_ntiles lesson applied to cumsums: a naive
    ``sum() OVER (PARTITION BY group ORDER BY ...)`` sorts each group in
    ONE window task (a big host = a straggler by construction). Instead
    the running offset is the bucketed two-phase cumsum shared with
    shard_assign/pack_sequences: cumsum inside (group, tier, hash-range
    bucket) — every window partition is ~1/n_buckets of a tier, and the
    hash is uniform — then per-bucket offsets from the (group, tier,
    bucket) totals table, whose window partitions by group over at most
    |tiers|*n_buckets rows. The oracle states the plain per-group window
    — identical result, scalable plan.

    Output: (group, doc_id, tier, weight, rank_hash, start_offset,
    keep) for every input row.
    """
    from pyspark.sql import Window

    rank_hash = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )
    base = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).alias("doc_id"),
            F.col(tier_col).cast("int").alias("tier"),
            F.col(weight_col).cast("long").alias("weight"),
            rank_hash.alias("rank_hash"),
        )
        .withColumn(
            "_bucket", F.floor(F.col("rank_hash") / F.lit((1 << 60) // n_buckets))
        )
        .persist()
    )
    in_bucket = Window.partitionBy("grp", "tier", "_bucket").orderBy(
        "rank_hash", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "_local_off", F.coalesce(F.sum("weight").over(in_bucket), F.lit(0))
    )
    totals = base.groupBy("grp", "tier", "_bucket").agg(
        F.sum("weight").alias("_tot")
    )
    # bounded window: <= |tiers| * n_buckets rows per group — tiers fill
    # best-first (tier DESC), buckets in hash order within a tier
    over = Window.partitionBy("grp").orderBy(
        F.col("tier").desc(), F.col("_bucket").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.withColumn(
        "_boff", F.coalesce(F.sum("_tot").over(over), F.lit(0))
    ).select("grp", "tier", "_bucket", "_boff")
    return (
        local.join(offs.hint("shuffle_hash"), ["grp", "tier", "_bucket"])
        .select(
            F.col("grp").alias(group_col),
            "doc_id",
            "tier",
            "weight",
            "rank_hash",
            (F.col("_local_off") + F.col("_boff")).alias("start_offset"),
            (F.col("_local_off") + F.col("_boff") < F.lit(budget))
            .cast("int")
            .alias("keep"),
        )
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    *,
    sqrt_iters: int = 1,
    budget: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source sampling weights (the mT5/mC4 mixing
    rule): p_g ∝ n_g^alpha with alpha = (1/2)^sqrt_iters — flattens the
    head of a skewed source distribution so low-resource groups are not
    drowned (alpha=0.5 is the standard T=2 setting). The companion to
    ``mixture_weights``: that op hits an EXPLICIT target mixture; this
    one derives the mixture from the counts themselves.

    Portability: n^alpha is computed by ITERATED sqrt (IEEE-754 requires
    sqrt correctly rounded, so Spark and the oracle produce the
    bit-identical double; pow/exp carry no such guarantee and diverge by
    ulps across libms). Each sqrt result is pinned round(·,12) ->
    decimal(28,12) so the normalizing sum is EXACT and
    partial-aggregation-order-independent; the final shares divide as
    doubles from identical decimals.

    Scale shape: one map-side-combined groupBy(group) -> counts (bounded
    by the group domain), then scalar normalization crossJoined back —
    everything after the first aggregate is sketch-sized.

    Output: (group, n_docs, weight_ppm = floor(1e6 * w_g / Σw),
    expected_docs = floor(budget * w_g / Σw)).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    w = F.col("n_docs").cast("double")
    for _ in range(sqrt_iters):
        w = F.sqrt(w)
    weighted = counts.select(
        "grp",
        "n_docs",
        F.round(w, 12).cast("decimal(28,12)").alias("_tm_w"),
    ).persist()  # bounded group table; feeds BOTH the total and the shares
    total = weighted.agg(F.sum("_tm_w").alias("_tm_tw"))
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_docs").cast("long"),
            F.floor(
                F.col("_tm_w").cast("double")
                * 1000000
                / F.col("_tm_tw").cast("double")
            )
            .cast("long")
            .alias("weight_ppm"),
            F.floor(
                F.col("_tm_w").cast("double")
                * budget
                / F.col("_tm_tw").cast("double")
            )
            .cast("long")
            .alias("expected_docs"),
        )
    )


def epoch_plan(
    df: DataFrame,
    weights: DataFrame,
    group_col: str = "source",
    *,
    token_col,
    budget_tokens: int,
    max_epochs: int = 4,
) -> DataFrame:
    """Per-source repetition factors under a mixture — the
    data-constrained-scaling gauge (Muennighoff et al. 2023: repeating
    data beyond ~4 epochs stops helping): given per-group unique token
    counts and a mixture (``weights`` carries ``weight_ppm`` per group,
    e.g. from ``temperature_mixture``), how many EPOCHS of each group's
    data does serving ``budget_tokens`` imply, and which groups blow
    past the repetition cap and need their allocation clipped?

    alloc_g = floor(budget · w_g / 1e6); epochs_ppm_g =
    floor(1e6 · alloc_g / T_g) — ALL integer arithmetic (bigint-exact
    in any engine; no float appears anywhere in this op).

    Scale shape: the corpus is touched by exactly one map-side-combined
    groupBy(group) token sum; everything downstream (the weights join,
    the plan arithmetic) lives on the bounded group domain.

    Output: (group, unique_tokens, alloc_tokens, epochs_ppm, over_cap).
    """
    toks = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(token_col).cast("long").alias("unique_tokens")
    )
    w = weights.select(
        F.col(group_col).alias("grp"), F.col("weight_ppm")
    )
    j = toks.join(w, "grp")
    # bigint `div` keeps the products exact end-to-end (budget * ppm can
    # exceed double's 53-bit mantissa; floor(double) would drift)
    return (
        j.withColumn(
            "alloc_tokens",
            F.expr(f"({budget_tokens}L * weight_ppm) div 1000000L").cast(
                "long"
            ),
        )
        .withColumn(
            "epochs_ppm",
            F.expr("(alloc_tokens * 1000000L) div unique_tokens").cast(
                "long"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "unique_tokens",
            "alloc_tokens",
            "epochs_ppm",
            (F.col("epochs_ppm") > max_epochs * 1000000)
            .cast("int")
            .cast("long")
            .alias("over_cap"),
        )
    )


# Poisson(1) cumulative pmf in ppm, truncated at k=9 (tail mass 1e-6 —
# the truncation is part of the spec so both engines state it identically)
POISSON_CUM_PPM = (
    367879, 735758, 919698, 980997, 996323, 999405, 999916, 999989, 999998
)


def bootstrap_ci(
    df: DataFrame,
    id_col: str = "doc_id",
    value_col: str = "n_chars",
    *,
    replicas: int = 16,
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for a corpus
    mean — the resampling scheme streaming/big-data systems actually use
    (per-row Poisson(1) weights need NO shared state or second pass,
    unlike the classic n-out-of-n bootstrap): every replica reweights
    each row by a hash-derived Poisson draw, and the spread of replica
    means bounds the sampling error of the point estimate. 'Is the
    quality-score drift between snapshots real or noise?' needs exactly
    this.

    Determinism/portability: draw b for a row = the number of Poisson
    cumulative-ppm thresholds <= md5(id || '|' || b) mod 1e6 — a pure
    CASE ladder, identical in any engine. The ENTIRE op is bigint
    arithmetic (sums, counts, integer-div micro means; no float
    anywhere), so partial-aggregation order cannot move the result.

    Scale shape: ONE scan computing replicas x (weighted sum, weight
    sum) map-side-combined aggregate columns; the result is a single
    row. No shuffle beyond the one final-aggregate exchange.

    Output: (n_docs, mean_micro, boot_lo_micro, boot_hi_micro,
    spread_micro).
    """
    v = F.col(value_col).cast("long")
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum(v).cast("long").alias("sv"),
    ]
    for b in range(replicas):
        u = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"), F.lit(f"|{b}")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("decimal(20,0)").cast("long") % 1000000
        w = sum(
            [(u >= F.lit(t)).cast("int") for t in POISSON_CUM_PPM],
            F.lit(0),
        ).cast("long")
        aggs.append(F.sum(w * v).cast("long").alias(f"wv_{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"w_{b}"))
    g = df.agg(*aggs)
    means = [
        F.expr(f"(wv_{b} * 1000000L) div w_{b}") for b in range(replicas)
    ]
    return g.select(
        F.col("n").alias("n_docs"),
        F.expr("(sv * 1000000L) div n").cast("long").alias("mean_micro"),
        F.least(*means).cast("long").alias("boot_lo_micro"),
        F.greatest(*means).cast("long").alias("boot_hi_micro"),
        (F.greatest(*means) - F.least(*means))
        .cast("long")
        .alias("spread_micro"),
    )


def split_leakage(
    docs: DataFrame,
    key_a: Column,
    key_b: Column,
    *,
    names: tuple[str, str] = ("by_doc", "by_domain"),
    dup_key: Column | None = None,
    test_pct: int = 10,
) -> DataFrame:
    """Measure train/test contamination under two split policies — the
    eval-hygiene gauge behind "split by domain, not by document": a
    per-document hash split strands one copy of a duplicated page in
    train and its twin in test (the classic inflated-eval leak), while
    a domain-keyed split keeps whole duplicate families on one side.

    Leakage is computed WITHOUT materializing pairs: group rows by
    content (``dup_key``, default md5(text)); a group of n rows with
    n_t of them in test contributes C(n,2) duplicate pairs of which
    n_t*(n-n_t) cross the boundary. Every count is exact bigint.

    Scale shape: ONE projection computes both policies' test flags,
    ONE map-side-combined groupBy(content-hash) folds (n, n_test_a,
    n_test_b), and the verdict is a scalar aggregate — the corpus is
    touched once and nothing bigger than one row leaves the reduction.

    Output: one row per policy — (policy, dup_groups, dup_pairs,
    cross_pairs, leak_ppm).
    """
    dk = F.md5(F.col("text").cast("string")) if dup_key is None else dup_key
    ta = (hash_bucket(key_a) < test_pct * 100).cast("long")
    tb = (hash_bucket(key_b) < test_pct * 100).cast("long")
    g = (
        docs.select(dk.alias("_dup"), ta.alias("_ta"), tb.alias("_tb"))
        .groupBy("_dup")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_ta").cast("long").alias("na"),
            F.sum("_tb").cast("long").alias("nb"),
        )
    )
    tot = g.agg(
        F.sum((F.col("n") >= 2).cast("long")).cast("long").alias("dup_groups"),
        F.sum(F.expr("n * (n - 1L) div 2")).cast("long").alias("dup_pairs"),
        F.sum(F.col("na") * (F.col("n") - F.col("na")))
        .cast("long")
        .alias("cross_a"),
        F.sum(F.col("nb") * (F.col("n") - F.col("nb")))
        .cast("long")
        .alias("cross_b"),
    )
    # emit both policy rows from the ONE scalar row via explode — a
    # union of two selects would recompute the corpus aggregation twice
    pol = F.explode(
        F.array(
            F.struct(
                F.lit(names[0]).alias("policy"),
                F.col("cross_a").alias("cross_pairs"),
            ),
            F.struct(
                F.lit(names[1]).alias("policy"),
                F.col("cross_b").alias("cross_pairs"),
            ),
        )
    ).alias("p")
    return tot.select("dup_groups", "dup_pairs", pol).select(
        F.col("p.policy").alias("policy"),
        "dup_groups",
        "dup_pairs",
        F.col("p.cross_pairs").alias("cross_pairs"),
        F.when(
            F.col("dup_pairs") > 0,
            F.expr("(p.cross_pairs * 1000000L) div dup_pairs"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("leak_ppm"),
    )


def global_shuffle(
    docs: DataFrame,
    key_col: str = "doc_id",
    *,
    n_buckets: int = 1024,
) -> DataFrame:
    """Reproducible global training permutation: assign every document a
    contiguous position 0..N-1 in deterministic md5-hash order — the
    "shuffle the corpus once, read it sequentially forever" step every
    LLM training pipeline needs (hash order decorrelates training order
    from crawl order, and the SAME corpus always yields the SAME
    permutation, so runs are comparable and resumable).

    Scale shape: the naive formulation is row_number() over a global
    sort — one task sorting the corpus. This uses the repo's bucketed
    two-phase rank (shard_assign/pack_sequences machinery): the rank
    hash is uniform, so fixed hash ranges are balanced buckets; count
    within buckets, then add per-bucket offsets from the BOUNDED
    bucket-total table (the only single-partition window, <= n_buckets
    rows). The oracle states the plain global window — identical
    result, scalable plan.

    Output: (key, rank_hash, position).
    """
    rank_hash = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
        )
        .cast("decimal(20,0)")
        .cast("long")
    )
    base = (
        docs.select(F.col(key_col), rank_hash.alias("rank_hash"))
        .withColumn(
            "_bucket",
            F.floor(F.col("rank_hash") / F.lit((1 << 60) // n_buckets)),
        )
        .persist()
    )
    from pyspark.sql import Window

    in_bucket = Window.partitionBy("_bucket").orderBy(
        "rank_hash", key_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "_local", F.coalesce(F.count("*").over(in_bucket), F.lit(0))
    )
    totals = base.groupBy("_bucket").agg(F.count("*").alias("_tot"))
    over_buckets = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(over_buckets), F.lit(0))
    ).select("_bucket", "_off")
    return local.join(F.broadcast(offs), "_bucket").select(
        key_col,
        "rank_hash",
        (F.col("_local") + F.col("_off")).cast("long").alias("position"),
    )


def curriculum_order(
    docs: DataFrame,
    value_col: str = "n_chars",
    key_col: str = "doc_id",
    *,
    qs_ppm: tuple[int, ...] = (250000, 500000, 750000),
    n_buckets: int = 1024,
) -> DataFrame:
    """Curriculum training order: documents bucketed into quality phases
    by exact corpus quantiles (phase 0 = lowest quartile .. K = top),
    then given a contiguous, reproducible position WITHIN each phase in
    md5-hash order — the "easy-to-hard, shuffled within difficulty"
    schedule curriculum training consumes directly.

    Composition of two existing scale patterns: phase thresholds come
    from the bounded distribution sketch (``relational.grouped_quantiles``
    — never a corpus sort), and in-phase positions from the bucketed
    two-phase rank (``global_shuffle`` machinery, partitioned by phase;
    the only unpartitioned-per-phase window runs on the bounded
    phase x bucket total table). The oracle states the naive
    row_number() per phase.

    Output: (key, phase, position) — positions are 0..n_phase-1 within
    each phase.
    """
    from .textops import ws_tokens  # noqa: F401  (keep import graph stable)
    from ..operators import relational as _rel

    k, v = F.col(key_col), F.col(value_col).cast("long")
    th = _rel.grouped_quantiles(
        docs.select(F.lit("all").alias("_g"), v.alias("_v")),
        "_g",
        "_v",
        qs_ppm,
    )
    phase = F.lit(len(qs_ppm))
    for q in reversed(qs_ppm):
        phase = F.when(F.col("_v") <= F.col(f"q_{q}"), F.lit(qs_ppm.index(q))).otherwise(phase)
    rank_hash = (
        F.conv(F.substring(F.md5(k.cast("string")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )
    base = (
        docs.select(k, v.alias("_v"), rank_hash.alias("rank_hash"))
        .crossJoin(F.broadcast(th.drop("_g", "n_rows")))
        .select(
            key_col,
            phase.cast("long").alias("phase"),
            "rank_hash",
            F.floor(
                F.col("rank_hash") / F.lit((1 << 60) // n_buckets)
            ).alias("_bucket"),
        )
        .persist()
    )
    from pyspark.sql import Window

    in_bucket = Window.partitionBy("phase", "_bucket").orderBy(
        "rank_hash", key_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "_local", F.coalesce(F.count("*").over(in_bucket), F.lit(0))
    )
    totals = base.groupBy("phase", "_bucket").agg(F.count("*").alias("_tot"))
    over_buckets = Window.partitionBy("phase").orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(over_buckets), F.lit(0))
    ).select("phase", "_bucket", "_off")
    return local.join(F.broadcast(offs), ["phase", "_bucket"]).select(
        key_col,
        "phase",
        (F.col("_local") + F.col("_off")).cast("long").alias("position"),
    )


def cluster_sample(
    docs: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    *,
    group_pct: int = 50,
    row_pct: int = 20,
) -> DataFrame:
    """Two-stage cluster sampling with exact Horvitz-Thompson weights —
    the survey-sampling design for crawl-scale estimation: stage 1
    samples HOSTS (clusters) by hash, stage 2 samples pages within the
    selected hosts, and every emitted row carries its inverse inclusion
    probability so downstream estimators stay unbiased (Σ w·x estimates
    the corpus total from the sample alone). Sampling whole hosts first
    is what makes the physical read cheap: unselected hosts' partitions
    are never touched, unlike a row-level Bernoulli sample that scans
    everything.

    Determinism: both stages are md5-hash decisions (content-addressed
    — membership never changes under repartitioning or corpus growth),
    salted with distinct stage tags so the two draws are independent.
    The weight is the exact integer ppm of the joint inclusion
    probability's inverse: w_ppm = 1e8 * 1e4 div (group_pct*100 *
    row_pct*100) scaled to micro units — pure integer arithmetic.

    Output: sampled rows (group, key, weight_micro).
    """
    gsel = hash_bucket(F.concat(F.lit("g|"), F.col(group_col))) < group_pct * 100
    rsel = (
        hash_bucket(F.concat(F.lit("r|"), F.col(key_col).cast("string")))
        < row_pct * 100
    )
    w_micro = (1_000_000 * 10_000 * 10_000) // (
        (group_pct * 100) * (row_pct * 100)
    )
    return docs.where(gsel & rsel).select(
        F.col(group_col),
        F.col(key_col),
        F.lit(w_micro).cast("long").alias("weight_micro"),
    )


def fixed_size_sample(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    *,
    k: int = 5,
) -> DataFrame:
    """Deterministic fixed-size per-group sample: the k smallest-hash
    rows of every group — the balanced eval-set builder (exactly k docs
    per source no matter how skewed the corpus), content-addressed so
    the sample never churns as the corpus grows past the chosen rows.

    Scale shape: rank-within-group + rn <= k compiles to Spark's
    WindowGroupLimit (per-partition top-k pushed BELOW the shuffle —
    each map task forwards at most k rows per group, so the exchange
    carries O(groups x k), not the corpus). The hash gives a total
    order; ties are impossible (key is unique).

    Output: (group, key, sample_rank 1..k).
    """
    from pyspark.sql import Window

    h = hash_bucket(F.concat(F.lit("fs|"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(
        h.asc(), F.col(key_col).asc()
    )
    return (
        df.select(F.col(group_col), F.col(key_col))
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
        .select(group_col, key_col, F.col("sample_rank").cast("long"))
    )


def waterfill_allocation(
    caps: DataFrame,
    budget: int,
    *,
    group_col: str = "source",
    cap_col: str = "cap",
) -> DataFrame:
    """Water-filling budget allocation: split a corpus-wide sampling
    budget across sources as evenly as possible, never giving a source
    more than it has — the max-min fair allocation (epoch_plan's
    budget-side dual): small sources are taken whole, the rest share
    the remainder equally at the water level.

    Exact integer solution of sum min(cap_g, level) = B on the SORTED
    bounded group table: a group is capped iff prefix_i + cap_i*(m-i)
    <= B (its own cap fits under the level); the remainder divides by
    `div` with the first (R mod k) uncapped groups in (cap, name)
    order taking +1 — allocations sum to EXACTLY min(B, sum cap),
    test-pinned.

    Scale shape: windows run over the bounded per-group table only
    (the documented bounded-domain exception); the corpus is never
    touched here — callers pass the (group, cap) aggregate.

    Output: (group, cap, alloc, capped), ordered by group.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cap").asc(), F.col("grp").asc())
    t = caps.select(
        F.col(group_col).alias("grp"), F.col(cap_col).cast("long").alias("cap")
    ).select(
        "grp",
        "cap",
        F.row_number().over(w).cast("long").alias("i"),
        F.sum("cap")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("prefix"),
    )
    b = F.lit(int(budget)).cast("long")
    tot = t.agg(F.max("i").cast("long").alias("m"))
    t2 = t.crossJoin(F.broadcast(tot)).withColumn(
        "is_capped",
        (
            F.col("prefix") + F.col("cap") * (F.col("m") - F.col("i")) <= b
        ).cast("long"),
    )
    jstar = t2.agg(
        F.coalesce(
            F.max(F.when(F.col("is_capped") == 1, F.col("i"))), F.lit(0)
        )
        .cast("long")
        .alias("jstar"),
        F.coalesce(
            F.max(F.when(F.col("is_capped") == 1, F.col("prefix"))),
            F.lit(0),
        )
        .cast("long")
        .alias("taken"),
        F.max("m").cast("long").alias("m"),
    ).select(
        "jstar",
        "taken",
        (F.col("m") - F.col("jstar")).alias("k"),
        (b - F.col("taken")).alias("r"),
    )
    out = t2.crossJoin(F.broadcast(jstar)).select(
        F.col("grp").alias(group_col),
        "cap",
        F.when(F.col("is_capped") == 1, F.col("cap"))
        .otherwise(
            F.expr("r div k")
            + (F.col("i") - F.col("jstar") <= F.expr("r % k")).cast("long")
        )
        .cast("long")
        .alias("alloc"),
        F.col("is_capped").alias("capped"),
    )
    return out.orderBy(group_col)


def pps_sample(
    docs: DataFrame,
    *,
    n_target: int = 50,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: lay the
    documents end-to-end along their size axis in a seed-stable hash
    order, then take one hit every T/n_target units — big documents are
    hit with probability ∝ size (a doc larger than the step gets
    multiplicity m > 1), the classic PPS design for byte-budgeted eval
    sets.

    All-integer: step = T div n_target; a doc starting at offset s with
    size z is hit m = (s+z) div step − s div step times — exact in both
    engines.

    Scale shape (shard_assign discipline): the global offset is a
    BUCKETED two-phase cumsum — per-bucket window + broadcast bucket
    offsets — never a corpus-wide single-task sort; everything else is
    per-row arithmetic.

    Output: (doc_id, size, start_offset, m) for sampled docs (m >= 1),
    ordered by doc_id.
    """
    from pyspark.sql import Window

    rank_hash = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        )
        .cast("decimal(20,0)")
        .cast("long")
    )
    n_buckets = 1024
    base = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(size_col).cast("long").alias("size"),
            rank_hash.alias("rank_hash"),
        )
        .where(F.col("size") > 0)
        .withColumn(
            "_bucket",
            F.floor(F.col("rank_hash") / F.lit((1 << 60) // n_buckets)),
        )
        .persist()
    )
    in_bucket = Window.partitionBy("_bucket").orderBy(
        "rank_hash", "doc_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    local = base.withColumn(
        "_local_off", F.coalesce(F.sum("size").over(in_bucket), F.lit(0))
    )
    totals = base.groupBy("_bucket").agg(F.sum("size").alias("_tot"))
    over_buckets = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = totals.withColumn(
        "_bucket_off", F.coalesce(F.sum("_tot").over(over_buckets), F.lit(0))
    ).select("_bucket", "_bucket_off")
    tot = base.agg(F.sum("size").cast("long").alias("t"))
    placed = (
        local.join(F.broadcast(offs), "_bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "size",
            (F.col("_local_off") + F.col("_bucket_off")).alias(
                "start_offset"
            ),
            F.greatest(
                F.expr(f"t div {n_target}"), F.lit(1)
            ).alias("_step"),
        )
    )
    m = F.expr(
        "(start_offset + size) div _step - start_offset div _step"
    )
    return (
        placed.select(
            "doc_id",
            "size",
            "start_offset",
            m.cast("long").alias("m"),
        )
        .where(F.col("m") >= 1)
        .orderBy("doc_id")
    )
