"""Event-sequence mining over the events stream: Markov transitions,
navigation paths, and temporal burst detection.

The reference processes documents one request at a time and has no event
analytics; this is §2.13 engine surface for the telemetry side of a crawl /
training-data pipeline (which event follows which, what the common
ingest paths are, which event types spike). Built on bounded windows only:
every window here partitions by user or by event type — never an
unpartitioned corpus-wide sort (the host_gini lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each consecutive pair within a user's timeline, count
    (prev_type -> next_type) and normalize by the prev_type row total.

    Scale shape: ONE lag window partitioned by user (bounded by events
    per user — the sessionize bound) feeding a map-side-combined groupBy
    on the (prev, next) short key; the row-total join-back is over the
    BOUNDED event-type x event-type table, so the broadcast there is
    legitimate small-dim. Ordering inside a user is (ts, event_id) — the
    id tiebreak makes simultaneous events deterministic.

    prob_micro = floor(1e6 * n / row_total) — integer arithmetic only.

    Output: (prev_type, next_type, n, prob_micro).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("n") * 1000000 / F.col("row_total"))
        .cast("long")
        .alias("prob_micro"),
    )


def session_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    max_steps: int = 5,
) -> DataFrame:
    """Top navigation paths: the first ``max_steps`` event types of each
    user's timeline joined with '>', counted across users — the classic
    funnel-discovery aggregate ("which entry sequences are common").

    Scale shape: the ``rn <= max_steps`` rank filter compiles to a
    WindowGroupLimit, so Spark keeps only ``max_steps`` rows per user
    BEFORE the window exchange — a user with 1e6 events never sorts
    them all in one task (the weighted_sample lesson). The per-user
    collect_list then holds at most ``max_steps`` structs (bounded by
    construction), and the path counts are a map-side-combined groupBy
    on the short path string.

    Output: (path, n_users, n_steps).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    first_k = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(type_col).alias("event_type"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= max_steps)
    )
    per_user = first_k.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                ),
                lambda s: s.event_type,
            ),
        ).alias("path"),
        F.count("*").alias("n_steps"),
    )
    return per_user.groupBy("path", "n_steps").agg(
        F.count("*").cast("long").alias("n_users")
    ).select("path", "n_users", F.col("n_steps").cast("long").alias("n_steps"))


def event_bursts(
    events: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    trailing: int = 3,
) -> DataFrame:
    """Temporal burst detection per event type: compare each day's count
    against the trailing ``trailing``-observed-day baseline (a bounded
    rows-window, so gap days don't zero the baseline) — the Kleinberg-style
    spike gauge reduced to integer arithmetic. A crawl pipeline reads this
    as "error events tripled today" / "a host's fetch volume spiked".

    Scale shape: daily counts are a map-side-combined groupBy on the
    (type, day) short key — the corpus is touched exactly once; the
    trailing window partitions by event type over the BOUNDED
    (types x days) counts table, so no window task ever sees raw events.
    Only days with a full trailing baseline are emitted.

    burst_micro = floor(1e6 * trailing * n / baseline_sum) — 1e6 means
    "exactly at baseline", integer arithmetic only.

    Output: (event_type, day, n, baseline_sum, burst_micro).
    """
    daily = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing, -1)
    )
    wn = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.withColumn("baseline_sum", F.sum("n").over(w))
        .withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") > trailing)
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.col("baseline_sum").cast("long").alias("baseline_sum"),
            F.floor(F.col("n") * trailing * 1000000 / F.col("baseline_sum"))
            .cast("long")
            .alias("burst_micro"),
        )
    )


def event_acf(
    events: DataFrame,
    *,
    max_lag: int = 7,
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Lag-k autocorrelation of the daily event count series — the
    seasonality detector behind crawl/traffic scheduling (a strong
    lag-7 says weekly rhythm; a slowly-decaying ACF says trend, and
    either breaks the "i.i.d. days" assumption burst detection makes).

    Per lag: Pearson r over the (day, day+lag) matched pairs, from
    exact bigint moments via an EQUI-join of the bounded day-count
    table with itself — never a sequential window. r is one
    pinned-order IEEE expression per lag, floored to micro.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy(day); the per-lag joins, moments, and the final union all
    run on the bounded day table (days, not events).

    Output: (lag, n_pairs, r_micro) for lag = 1..max_lag.
    """
    day = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / bucket_seconds
    ).cast("long")
    counts = (
        events.select(day.alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("c"))
        .persist()
    )
    lagged = counts.select(F.col("d").alias("dl"), F.col("c").alias("cl"))
    spark = events.sparkSession
    out = None
    for lag in range(1, max_lag + 1):
        pairs = counts.join(
            lagged.hint("shuffle_hash"),
            F.col("d") + lag == F.col("dl"),
        )
        agg = pairs.agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("c").cast("long").alias("sx"),
            F.sum("cl").cast("long").alias("sy"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sxx"),
            F.sum(F.col("cl").cast("decimal(38,0)") * F.col("cl")).alias(
                "syy"
            ),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("cl")).alias(
                "sxy"
            ),
        ).select(F.lit(lag).cast("long").alias("lag"), "*")
        out = agg if out is None else out.unionByName(agg)
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    num = n * sxy - sx * sy
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    ok = (F.col("n_pairs") > 1) & (den > 0)
    return out.select(
        "lag",
        "n_pairs",
        F.when(ok, F.floor(num / den * 1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r_micro"),
    ).orderBy("lag")


def cusum_changepoint(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
    top_k: int = 5,
) -> DataFrame:
    """Offline CUSUM changepoint scan over the daily event-count
    series — the level-shift detector that tells a crawl scheduler
    "traffic regime changed HERE" (deploy, outage, seasonality break).

    For split point k of n days with cumulative sum S_k and total T,
    the scaled CUSUM statistic is |n*S_k - k*T| (the classic
    |S_k - (k/n)*T| times n, so it stays an EXACT bigint — no floats
    anywhere). The maximizing day is the changepoint estimate; the
    top_k candidates are returned for inspection.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy(day); the cumulative sum and ranking run on the bounded
    day table only (days, not events — the documented bounded-domain
    window exception, same as shard_assign). |n*S_k| ≤ 3.7e16 even at
    10^12 events over a century of days — bigint-safe.

    Output: (day, k, cum, stat) for the top_k interior splits,
    strongest first, day ascending on ties.
    """
    from pyspark.sql import Window

    day = F.floor(
        F.col(ts_col).cast("timestamp").cast("long") / bucket_seconds
    ).cast("long")
    counts = (
        events.select(day.alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w = Window.orderBy("day")
    ranked = counts.select(
        "day",
        F.row_number().over(w).cast("long").alias("k"),
        F.sum("c").over(w).cast("long").alias("cum"),
    )
    tot = counts.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("c").cast("long").alias("total"),
    )
    scored = ranked.crossJoin(F.broadcast(tot)).where(
        F.col("k") < F.col("n_days")
    )
    return (
        scored.select(
            "day",
            "k",
            "cum",
            F.abs(
                F.col("n_days") * F.col("cum") - F.col("k") * F.col("total")
            )
            .cast("long")
            .alias("stat"),
        )
        .orderBy(F.desc("stat"), F.asc("day"))
        .limit(top_k)
    )


def markov_stationary(
    events: DataFrame,
    *,
    iters: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Long-run state distribution of the per-user event-type Markov
    chain: power-iterate x' = x·P from a uniform start over the
    row-stochastic transition matrix that ``event_transitions``
    counts — "where does a user's session settle" (the steady-state
    companion to the one-step transition table).

    Each iteration's mass updates are round(x·c/r, 12) decimals summed
    exactly (partial-agg order can't move the result — the pagerank
    discipline); absorbing states keep their inflow, states with no
    inflow decay to their residual. P is sub-stochastic if a user's
    last event type never re-transitions; mass is NOT renormalized —
    the oracle replicates the same fixpoint.

    Scale shape: ONE per-user lag window over the corpus (the
    sessionize bound), then every iteration joins the S-row state
    vector with the BOUNDED S×S transition table — legitimately
    broadcast-sized both sides; the corpus is never touched again.

    Output: (event_type, p_micro) — floor(x·1e6) after ``iters``
    rounds, ordered by event_type.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("j"),
        )
        .withColumn("i", F.lag("j").over(w))
        .where(F.col("i").isNotNull())
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = pairs.groupBy("i").agg(F.sum("c").cast("long").alias("r"))
    trans = pairs.join(F.broadcast(totals), "i").persist()
    states = (
        events.select(F.col(type_col).alias("st")).distinct().persist()
    )
    n_states = states.count()
    x = states.select(
        "st", F.lit(1.0 / n_states).cast("double").alias("x")
    )
    for _ in range(iters):
        inflow = (
            x.join(trans, x["st"] == trans["i"])
            .select(
                F.col("j").alias("st2"),
                F.round(
                    F.col("x")
                    * F.col("c").cast("double")
                    / F.col("r").cast("double"),
                    12,
                )
                .cast("decimal(28,12)")
                .alias("term"),
            )
            .groupBy("st2")
            .agg(F.sum("term").cast("double").alias("xin"))
        )
        x = states.join(
            inflow, states["st"] == inflow["st2"], "left"
        ).select(
            "st", F.coalesce("xin", F.lit(0.0)).alias("x")
        )
    return x.select(
        F.col("st").alias(type_col),
        F.floor(F.col("x") * 1000000).cast("long").alias("p_micro"),
    ).orderBy(type_col)


def interarrival_stats(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival time profile per event type: gaps between a user's
    consecutive events of the SAME type, aggregated to the exponential
    MLE rate λ = n/Σgap and the mean gap — the recrawl/traffic model
    behind schedule tuning (a type whose λ collapses is going dormant).

    All-integer: gaps are epoch-second differences; mean_gap_micro =
    (Σgap·1e6) div n and lambda_micro = (n·1e6) div Σgap are exact
    truncating divisions in both engines.

    Scale shape: ONE per-(user, type) lag window over the corpus (the
    sessionize bound), then a map-side-combined groupBy(type) over the
    bounded type domain.

    Output: (event_type, n_gaps, sum_gap, mean_gap_micro, lambda_micro).
    """
    w = Window.partitionBy(user_col, type_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    sec = F.col(ts_col).cast("timestamp").cast("long")
    gaps = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("event_type"),
            F.col(ts_col),
            F.col(id_col),
            (sec - F.lag(sec).over(w)).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("sum_gap"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        "sum_gap",
        F.when(
            F.col("n_gaps") > 0,
            F.expr("(sum_gap * 1000000) div n_gaps"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mean_gap_micro"),
        F.when(
            F.col("sum_gap") > 0, F.expr("(n_gaps * 1000000) div sum_gap")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("lambda_micro"),
    ).orderBy("event_type")


def markov_entropy_rate(
    events: DataFrame,
    *,
    iters: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = Σ_i π_i · Σ_j P_ij·ln(1/P_ij) — the single compressibility
    number for behavioral streams (a near-zero rate says sessions are
    templated bot traffic; the maximum ln(S) says types are i.i.d.),
    composing ``markov_stationary``'s fixpoint with the conditional
    entropy of each row of the transition matrix.

    Exactness: π comes from the same round(·,12)-decimal power
    iteration as ``markov_stationary`` (shared fixpoint, full double
    precision — NOT the micro-floored output); each (i,j) entropy term
    is the pinned chain (π_i·(c/r))·round(ln(r/c),6), rounded to 12 dp
    into an exact decimal sum over the bounded S×S matrix.

    Scale shape: identical to markov_stationary — ONE per-user lag
    window over the corpus, then everything on the bounded matrix.

    Output: one row (n_states, n_transitions, entropy_rate_micro).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("j"),
        )
        .withColumn("i", F.lag("j").over(w))
        .where(F.col("i").isNotNull())
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = pairs.groupBy("i").agg(F.sum("c").cast("long").alias("r"))
    trans = pairs.join(F.broadcast(totals), "i").persist()
    states = events.select(F.col(type_col).alias("st")).distinct().persist()
    n_states = states.count()
    x = states.select(
        "st", F.lit(1.0 / n_states).cast("double").alias("x")
    )
    for _ in range(iters):
        inflow = (
            x.join(trans, x["st"] == trans["i"])
            .select(
                F.col("j").alias("st2"),
                F.round(
                    F.col("x")
                    * F.col("c").cast("double")
                    / F.col("r").cast("double"),
                    12,
                )
                .cast("decimal(28,12)")
                .alias("term"),
            )
            .groupBy("st2")
            .agg(F.sum("term").cast("double").alias("xin"))
        )
        x = states.join(
            inflow, states["st"] == inflow["st2"], "left"
        ).select("st", F.coalesce("xin", F.lit(0.0)).alias("x"))
    term = F.round(
        F.col("x")
        * (F.col("c").cast("double") / F.col("r").cast("double"))
        * F.round(
            F.log(F.col("r").cast("double") / F.col("c").cast("double")), 6
        ),
        12,
    ).cast("decimal(28,12)")
    h = x.join(trans, x["st"] == trans["i"]).agg(
        F.sum(term).alias("s")
    )
    counts = pairs.agg(F.count("*").cast("long").alias("nt"))
    return (
        h.crossJoin(F.broadcast(counts))
        .select(
            F.lit(n_states).cast("long").alias("n_states"),
            F.col("nt").alias("n_transitions"),
            F.floor(F.col("s").cast("double") * 1000000)
            .cast("long")
            .alias("entropy_rate_micro"),
        )
    )
