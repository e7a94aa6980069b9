"""Host-graph ranking over an edge list.

The natural consumer of ``urls.extract_links``: aggregate resolved out-links
to host granularity and rank hosts by link structure (crawl prioritization,
spam demotion). The reference has no graph stage — this is part of the
§2.13 web-pipeline surface, built Spark-first as an iterative DataFrame
computation like ``dedup.connected_components``.

Determinism contract (what makes an iterative float algorithm
oracle-hashable): per-iteration contributions are rounded to 12 dp and
summed as DECIMAL (exact, order-independent — parallel double summation is
not), the rank update is a fixed-order scalar expression, and the emitted
rank is floor(rank·1e9) as bigint. The DuckDB oracle unrolls the same
iterations with the same literals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration power-method PageRank over a distinct edge list.

    Per iteration: edges ⋈ ranks (shuffle_hash — both corpus-sized at web
    scale) ⋈ out-degrees, contributions partial-aggregated per target,
    rank = (1-d)/N + d·Σ. Nodes without in-links keep the teleport term;
    dangling-node mass is NOT redistributed (callers wanting the stochastic
    fix add a sink edge per dangling node — the demo graph has none).
    Output: (node, rank_nano) with rank_nano = floor(rank·1e9).
    """
    # persisted only for the duration of this call: the loop below references
    # e/nodes once per iteration, and the final ranks are localCheckpoint'ed
    # (materialized, lineage truncated) so both caches can be RELEASED before
    # returning. DataFrame.persist registers in the SQL CacheManager keyed by
    # logical plan and is only freed by explicit unpersist/session end —
    # without the unpersist, repeated pagerank calls would accumulate cached
    # edge-sized tables for the session lifetime (ADVICE r2). The checkpoint
    # RDD itself IS cleaned by ContextCleaner once the result is dropped.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar driver aggregate
    base = (1.0 - damping) / n
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(ranks.hint("shuffle_hash"), e.src == ranks.node)
            .join(outdeg.hint("shuffle_hash"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums.hint("shuffle_hash"), "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
    out = ranks.select(
        "node",
        F.floor(F.col("rank") * 1000000000.0).cast("long").alias("rank_nano"),
    ).localCheckpoint()  # host-sized, distributed across executors
    e.unpersist()
    nodes.unpersist()
    return out


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999): hub and authority scores over
    a distinct directed edge list — the complementary ranking to
    ``pagerank`` for crawl prioritization (authorities = pages worth
    fetching, hubs = directories/link farms worth mining for the frontier,
    or demoting as spam when hub score decouples from authority).

    Power method WITHOUT per-iteration normalization (values stay exact
    under the 12-dp/DECIMAL contract; with 3 iterations magnitudes are
    bounded by max-degree^3 — callers unrolling many more iterations should
    rescale per round to stay in double range), normalized ONCE at emit by
    the L1 total so scores are comparable across graphs.

    Determinism contract (same as ``pagerank``): contributions rounded to
    12 dp and summed as DECIMAL(28,12) — exact and order-independent where
    parallel double summation is not; the L1 totals are DECIMAL sums of the
    same rounded values, divided and floored to nano units at emit. The
    DuckDB oracle unrolls the identical iterations.

    Scale shape: per iteration exactly two shuffle_hash joins (edges ⋈
    scores — both corpus-sized at web scale, never a planner broadcast) and
    two partial-aggregated groupBys; the emit-time totals are 1-row
    aggregates crossJoin-broadcast back, so nothing corpus-sized ever
    funnels through the driver.

    Output: (node, hub_nano, auth_nano).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    hub = nodes.select("node", F.lit(1.0).alias("score"))
    auth = None
    for _ in range(iters):
        a_sums = (
            e.join(hub.hint("shuffle_hash"), e.src == hub.node)
            .select(
                F.col("dst").alias("node"),
                F.round("score", 12).cast("decimal(28,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        auth = nodes.join(a_sums.hint("shuffle_hash"), "node", "left").select(
            "node", F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("score")
        )
        h_sums = (
            e.join(auth.hint("shuffle_hash"), e.dst == auth.node)
            .select(
                F.col("src").alias("node"),
                F.round("score", 12).cast("decimal(28,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        hub = nodes.join(h_sums.hint("shuffle_hash"), "node", "left").select(
            "node", F.coalesce(F.col("s").cast("double"), F.lit(0.0)).alias("score")
        )
    h_tot = hub.agg(
        F.sum(F.round("score", 12).cast("decimal(28,12)")).alias("t")
    )
    a_tot = auth.agg(
        F.sum(F.round("score", 12).cast("decimal(28,12)")).alias("t")
    )
    out = (
        hub.withColumnRenamed("score", "h")
        .join(auth.withColumnRenamed("score", "a").hint("shuffle_hash"), "node")
        .crossJoin(F.broadcast(h_tot.withColumnRenamed("t", "ht")))
        .crossJoin(F.broadcast(a_tot.withColumnRenamed("t", "at")))
        .select(
            "node",
            F.floor(
                F.col("h") / F.col("ht").cast("double") * 1000000000.0
            ).cast("long").alias("hub_nano"),
            F.floor(
                F.col("a") / F.col("at").cast("double") * 1000000000.0
            ).cast("long").alias("auth_nano"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    nodes.unpersist()
    return out


def reciprocal_links(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    min_out: int = 1,
    farm_ratio_micro: int = 500_000,
) -> DataFrame:
    """Link-farm signal over the host graph: hosts whose out-links are
    mostly RECIPROCATED (A->B and B->A) are exchanging links rather than
    citing — the classic link-spam tell PageRank alone rewards instead of
    punishing (TrustRank-family heuristic).

    Shape at crawl scale: dedupe the edge list, then ONE co-located
    left-semi self-join of the edge list against its own reversal on the
    full (src, dst) key — both sides corpus-sized, shuffle_hash pinned,
    nothing broadcast, payloads are (string, string). Per-host counts are
    map-side-combined; the per-host flag is pure arithmetic. Self-loops
    are excluded up front (a self-link is trivially "reciprocal").

    Output: (host, n_out, n_mutual, mutual_ratio_micro, is_link_farm).

    Cache lifetime: the deduped edge list is persisted (it feeds three
    consumers) and the returned frame is lazy, so the entry lives in the
    SQL CacheManager until ``spark.catalog.clearCache()`` or session end —
    same contract as the dedup-module reuse-boundary persists.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev.hint("shuffle_hash"), ["src", "dst"], "left_semi")
    out_counts = e.groupBy("src").agg(F.count("*").alias("n_out"))
    mut_counts = mutual.groupBy("src").agg(F.count("*").alias("n_mutual"))
    ratio = F.floor(
        F.col("n_mutual").cast("long") * 1000000 / F.col("n_out")
    ).cast("long")
    return (
        out_counts.join(mut_counts.hint("shuffle_hash"), "src", "left")
        .select(
            F.col("src").alias("host"),
            F.col("n_out").cast("long").alias("n_out"),
            F.coalesce("n_mutual", F.lit(0)).cast("long").alias("n_mutual"),
            F.coalesce(ratio, F.lit(0)).alias("mutual_ratio_micro"),
            (
                (F.col("n_out") >= min_out)
                & (
                    F.coalesce(ratio, F.lit(0))
                    >= farm_ratio_micro
                )
            )
            .cast("int")
            .alias("is_link_farm"),
        )
    )


def trust_rank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyongyi et al., VLDB 2004): PageRank personalized to a
    curated trusted-seed set — the standard web-spam demotion signal.
    Teleport mass goes ONLY to seeds, so trust decays with link distance
    from the seed set; a host with high pagerank but near-zero trust_rank
    is the classic link-farm signature (compose with ``pagerank`` and
    ``reciprocal_links`` for the full spam dashboard).

    Same determinism contract and loop shape as ``pagerank`` (decimal
    per-iteration contributions, shuffle_hash for the corpus-sized
    edge x rank joins). The ONE broadcast is the seed list — bounded by
    construction (a human-curated trust list, thousands at most), the
    legitimate small-dim case. Seeds outside the graph carry no mass:
    normalization uses |seeds ∩ nodes|.

    Output: (node, trust_nano) with trust_nano = floor(trust·1e9).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    seed_set = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            F.broadcast(seed_set.withColumn("is_seed", F.lit(1))),
            "node",
            "left",
        )
        .select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        .persist()
    )
    s = nodes.filter(F.col("is_seed") == 1).count()  # scalar driver agg
    if s == 0:
        raise ValueError("trust_rank: no seed intersects the graph")
    base = (1.0 - damping) / s
    teleport = F.when(F.col("is_seed") == 1, F.lit(base)).otherwise(
        F.lit(0.0)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed") == 1, F.lit(1.0 / s))
        .otherwise(F.lit(0.0))
        .alias("rank"),
    )
    for _ in range(iters):
        contribs = (
            e.join(ranks.hint("shuffle_hash"), e.src == ranks.node)
            .join(outdeg.hint("shuffle_hash"), "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast("decimal(28,12)")
                .alias("c"),
            )
        )
        sums = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums.hint("shuffle_hash"), "node", "left").select(
            "node",
            (
                teleport
                + F.lit(damping)
                * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
            ).alias("rank"),
        )
    out = ranks.select(
        "node",
        F.floor(F.col("rank") * 1000000000.0).cast("long").alias(
            "trust_nano"
        ),
    ).localCheckpoint()
    e.unpersist()
    nodes.unpersist()
    return out


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (community detection) over an
    undirected host graph — the clustering companion to pagerank/hits:
    where connected_components answers "reachable at all" (min-label
    fixpoint), LPA answers "densely linked together": each round every
    node adopts its neighbors' MOST FREQUENT current label, so labels
    pool inside link-dense groups and mirror farms / template networks
    surface as one community (host_mirrors finds content twins; this
    finds link cliques).

    Determinism contract: synchronous rounds (all updates read the
    previous round's labels), initial label = the node id itself, ties
    broken by MINIMUM label — no randomness anywhere, so a fixed
    iteration count is exactly restatable as chained SQL CTEs.

    Scale: per round one shuffle_hash join (labels onto the edge list,
    never broadcast — hosts are ~1e8 rows at web scale) and one
    (node,label) count; the argmax window partitions by node and sorts
    only that node's distinct neighbor labels (bounded by degree). The
    driver loop is ``iters`` bounded rounds over the HOST table, corpus
    untouched — same envelope as pagerank.

    Output: (node, community) — community is a node id.
    """
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = fwd.unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct()
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    )
    from pyspark.sql import Window

    for _ in range(iters):
        nb = und.join(
            labels.withColumnRenamed("node", "b").hint("shuffle_hash"), "b"
        ).select(F.col("a").alias("node"), "community")
        counts = nb.groupBy("node", "community").agg(
            F.count("*").alias("votes")
        )
        w = Window.partitionBy("node").orderBy(
            F.col("votes").desc(), F.col("community").asc()
        )
        winner = counts.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") == 1
        ).select("node", "community")
        # isolated nodes (none in an edge-derived node set, but keep the
        # operator total for callers passing their own node universe)
        labels = labels.select("node").join(
            winner.hint("shuffle_hash"), "node", "left"
        ).select(
            "node",
            F.coalesce("community", F.col("node")).alias("community"),
        )
    return labels


def k_core(
    edges: DataFrame,
    k: int = 2,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peeling over the undirected host graph: each
    round drops every node whose degree IN THE SURVIVING SUBGRAPH is
    < k, then recomputes degrees. The link-graph density filter that
    separates organically embedded hosts from spray-and-pray spam: a
    link farm's satellites die in round one (their only neighbors are
    each other's casualties), while genuinely interlinked hubs survive —
    the coreness companion to pagerank (volume), hits (roles) and
    label_propagation (communities).

    Determinism: peeling is order-independent within a round (all
    removals read the previous round's alive set), rounds are a fixed
    count — so the result is exactly restatable as chained SQL CTEs.
    Nodes keep their LAST computed in-subgraph degree.

    Scale: per round two shuffle_hash semi-joins (alive set onto the
    edge list — host tables are ~1e8 rows, never broadcast) and one
    short-key count; the edge list is filtered monotonically smaller
    each round. ``iters`` bounded rounds over HOST-level tables only.

    Output: (node, degree) for nodes alive after ``iters`` rounds,
    degree measured in the final surviving subgraph.
    """
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = fwd.unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).where(F.col("a") != F.col("b")).distinct()
    alive = und.select(F.col("a").alias("node")).distinct()
    deg = None
    for _ in range(iters):
        e = und.join(
            alive.withColumnRenamed("node", "a").hint("shuffle_hash"), "a"
        ).join(
            alive.withColumnRenamed("node", "b").hint("shuffle_hash"), "b"
        )
        deg = e.groupBy(F.col("a").alias("node")).agg(
            F.count("*").alias("degree")
        )
        alive = deg.where(F.col("degree") >= k).select("node")
    return deg.where(F.col("degree") >= k)


def triangle_count(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact triangle counting + local clustering coefficient over the
    undirected host graph — the density gauge behind ``k_core``'s binary
    cut: a host embedded in genuinely interlinked neighborhoods closes
    many triangles, while a link farm's star satellites close none (their
    neighbors don't know each other). Schank & Wagner 2005 / Suri &
    Vassilvitskii 2011 (the MapReduce formulation this restates in
    DataFrame algebra).

    Scale shape — the part that matters at 1e9 edges: wedges are only ever
    generated at each edge's LOWER endpoint under the total order
    (degree, node), which bounds per-node wedge fan-out by O(sqrt(|E|))
    regardless of raw degree — a 1e7-in-degree hub generates ZERO wedges
    because every incident edge orients INTO it. The wedge join and the
    closing-edge LEFT SEMI are both corpus-sized-by-corpus-sized and
    pinned shuffle_hash; nothing is ever broadcast. Counts per node come
    from a 3-way unpivot of each triangle (each triangle closes once,
    at its lowest corner) and a map-side-combined groupBy.

    clustering_micro = floor(2e6 * triangles / (deg * (deg - 1))) — the
    local clustering coefficient in micro units, integer arithmetic only
    (portable); nodes of degree < 2 report 0.

    Output: (node, degree, triangles, clustering_micro).
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        .persist()
    )
    # orient each edge low -> high under (degree, node)
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    oriented = (
        canon.join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .select(
            F.when(
                F.struct(F.col("dega"), F.col("a"))
                < F.struct(F.col("degb"), F.col("b")),
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("degb").alias("degv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    F.col("dega").alias("degv"),
                )
            )
            .alias("e")
        )
        .select("e.u", "e.v", "e.degv")
        .persist()
    )
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("degv").alias("degx"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("degv").alias("degy"))
    wedges = e1.join(e2.hint("shuffle_hash"), "u").where(
        F.struct(F.col("degx"), F.col("x")) < F.struct(F.col("degy"), F.col("y"))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tris = wedges.join(
        closing.hint("shuffle_hash"), ["x", "y"], "left_semi"
    ).select("u", "x", "y")
    corners = (
        tris.select(F.col("u").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
    )
    tcounts = corners.groupBy("node").agg(F.count("*").alias("triangles"))
    out = (
        deg.join(tcounts.hint("shuffle_hash"), "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.floor(
                    F.coalesce("triangles", F.lit(0)).cast("long")
                    * 2000000
                    / (F.col("degree").cast("long") * (F.col("degree") - 1))
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_micro"),
        )
        .localCheckpoint()
    )
    canon.unpersist()
    deg.unpersist()
    oriented.unpersist()
    return out


def cocitation_pairs(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    hub_cap: int = 1000,
    min_common: int = 1,
) -> DataFrame:
    """Co-citation similarity over the directed host graph: hosts that
    link to many of the SAME targets are topically related (Small 1973's
    co-citation, applied src-side = bibliographic coupling) — the
    link-structure analogue of ``host_mirrors``' content twins, and the
    candidate generator for "these two hosts syndicate the same network".

    Scale shape: the pair generator is a self-join of the deduped edge
    list on dst — quadratic in per-target IN-degree, so targets with
    in-degree > ``hub_cap`` are excluded FIRST (everyone links to
    google.com; sharing it carries no signal and generates 1e7² pairs).
    With the cap, per-target fan-out is bounded by construction —
    the same df-cap discipline as ``ngram_jaccard_pairs``. The dst
    in-degree join and the self-join are pinned shuffle_hash (both sides
    corpus-sized); the src out-degree join-backs for the cosine
    denominator are host-table-sized, also shuffle_hash. Nothing is
    broadcast.

    cosine_micro = floor(1e6 * common / sqrt(out_a * out_b)) — computed
    over doubles (IEEE-identical in Spark and DuckDB), floored to micro.

    Output: (host_a, host_b, common, cosine_micro), host_a < host_b.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    indeg = e.groupBy("dst").agg(F.count("*").alias("in_deg"))
    capped = e.join(
        indeg.where(F.col("in_deg") <= hub_cap).select("dst").hint(
            "shuffle_hash"
        ),
        "dst",
        "left_semi",
    )
    left = capped.select(F.col("src").alias("host_a"), "dst")
    right = capped.select(F.col("src").alias("host_b"), "dst")
    pairs = (
        left.join(right.hint("shuffle_hash"), "dst")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").alias("common"))
        .where(F.col("common") >= min_common)
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("n_out"))
    oa = outdeg.select(F.col("src").alias("host_a"), F.col("n_out").alias("out_a"))
    ob = outdeg.select(F.col("src").alias("host_b"), F.col("n_out").alias("out_b"))
    out = (
        pairs.join(oa.hint("shuffle_hash"), "host_a")
        .join(ob.hint("shuffle_hash"), "host_b")
        .select(
            "host_a",
            "host_b",
            F.col("common").cast("long").alias("common"),
            F.floor(
                F.col("common").cast("double")
                * 1000000.0
                / F.sqrt(F.col("out_a").cast("double") * F.col("out_b"))
            )
            .cast("long")
            .alias("cosine_micro"),
        )
        .localCheckpoint()
    )
    e.unpersist()
    return out


def seed_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Hop distance from a trusted seed set (bounded-round BFS over the
    directed host graph): hop 0 = the seeds, hop h = hosts first reached
    through h links — the crawl-depth / trust-distance primitive behind
    seed-based frontier policies (fetch within k hops of the whitelist)
    and the discrete companion to ``trust_rank``'s continuous decay.

    Determinism: synchronous rounds; a node's hop is the FIRST round
    that reaches it (the LEFT ANTI against already-labeled nodes makes
    later paths irrelevant), so the result is the true shortest hop
    count <= max_hops, restatable as unrolled SQL CTEs.

    Scale shape: per round ONE shuffle_hash join (frontier onto the edge
    list — both corpus-sized at web scale, never broadcast) and one
    LEFT ANTI against the labeled set (shuffle_hash — the labeled set
    GROWS toward corpus size, the classic accidental-broadcast trap).
    The seed table itself is the only bounded frame. ``max_hops``
    bounded rounds; unreached nodes are absent (callers left-join).

    Output: (node, hop).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    labels = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .persist()
    )
    for h in range(1, max_hops + 1):
        frontier = (
            e.join(
                labels.where(F.col("hop") == h - 1)
                .select(F.col("node").alias("src"))
                .hint("shuffle_hash"),
                "src",
                "left_semi",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(labels.hint("shuffle_hash"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        nxt = labels.unionByName(frontier).localCheckpoint()
        labels.unpersist()
        labels = nxt
    e.unpersist()
    return labels


def degree_assortativity(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity (Newman 2002 r) of the undirected host graph
    — one scalar that separates web-like topologies (disassortative,
    hubs link to leaves, r < 0) from social-like ones (assortative,
    r > 0); a crawl whose r drifts positive over snapshots is usually
    growing a mesh of mutually-linking spam hosts (the aggregate
    companion to ``reciprocal_links``).

    r = Pearson correlation of (deg(u), deg(v)) over every edge taken
    in BOTH orientations (the standard symmetric formulation).

    Scale shape: degrees come from one map-side-combined groupBy over
    the canonical edge list; the two degree lookups are shuffle_hash
    equi-joins on the edge endpoints (corpus x corpus, nothing
    broadcast); the correlation itself collapses to SIX integer sums
    (n, Sx, Sy, Sxx, Syy, Sxy) in a single scalar aggregate — exact,
    order-independent, engine-portable. The final r is one IEEE-double
    expression over those exact integers, floored to micro units, so
    Spark and the oracle cannot disagree.

    Output: one row (n_edges, n_nodes, r_micro).
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    both = canon.select("a", "b").unionAll(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dx"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("dy"))
    pairs = (
        both.join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .select("dx", "dy")
    )
    sums = pairs.agg(
        F.count("*").alias("m"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return (
        sums.crossJoin(n_nodes)
        .select(
            (F.col("m") / 2).cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long"),
            F.when(den == 0.0, F.lit(0))
            .otherwise(F.floor(num.cast("double") / den * 1000000))
            .cast("long")
            .alias("r_micro"),
        )
    )


def hyperball(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    radius: int = 2,
    p: int = 6,
) -> DataFrame:
    """HyperBall / HyperANF (Boldi, Rosa & Vigna, WWW 2011): per-node
    approximate ball sizes |B(v, r)| — how many hosts are within r
    out-links of v — via iterated HyperLogLog register merges. THE
    web-graph neighborhood-function algorithm (it measured the Facebook
    graph's four degrees of separation) and the iterative consumer of
    ``dedup.hll_distinct``'s register construction: an exact BFS ball
    per node is O(n·|ball|) state, the HLL ball is m bytes per node,
    and set-union becomes a per-register max that Spark executes as a
    map-side-combined groupBy.

    b_0(v) = sketch({v}); b_t(v) = merge(b_{t-1}(v), b_{t-1}(w) for
    every edge (v, w)). After t rounds the sketch estimates |B(v, t)|.

    Portability: the register construction is ``hll_distinct``'s exactly
    (md5 15-hex-char → 60-bit h; reg = h mod m; rank = leading-zero rank
    of h div m within 60 - p bits), the per-node estimate uses the same
    exact-integer harmonic sum (2**(cap - mx) terms — no order-dependent
    float summation), and the DuckDB oracle unrolls the same rounds.

    Scale shape: per round ONE equi-join of the edge list onto the
    register table on dst (shuffle_hash both ways — at web scale both
    are corpus-sized; nothing broadcast) and one groupBy(node, reg)
    max(rank) whose map-side combine caps emitted rows at m per node.
    State is <= n·m register rows per round — the entire reason HyperANF
    beats exact BFS at 1e9 nodes.

    Output: (node, ball1_regs, ball1_est, ball2_regs, ball2_est) for
    radius=2 — generally (node, ball{t}_regs, ball{t}_est) per t.
    """
    m = 1 << p
    width = 60 - p
    rank_cap = width + 1
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = F.conv(F.substring(F.md5(F.col("node")), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    ).cast("long")
    w = F.floor(h / m).cast("long")
    rank = F.when(w > 0, F.lit(rank_cap) - F.length(F.bin(w))).otherwise(
        F.lit(rank_cap)
    )
    ball = nodes.select("node", (h % m).alias("reg"), rank.alias("mx"))

    alpha = 0.7213 / (1.0 + 1.079 / m)

    def estimate(regs: DataFrame, tag: str) -> DataFrame:
        s = regs.groupBy("node").agg(
            F.count("*").alias("n_present"),
            F.sum(F.expr(f"shiftleft(1L, {rank_cap} - mx)")).alias(
                "s_present"
            ),
        )
        zeros = F.lit(m) - F.col("n_present")
        s_int = F.col("s_present") + zeros * F.lit(1 << rank_cap).cast(
            "long"
        )
        z = s_int.cast("double") / F.lit(float(1 << rank_cap))
        e_raw = F.lit(alpha * m * m) / z
        est = F.when(
            (e_raw <= 2.5 * m) & (zeros > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
        ).otherwise(e_raw)
        return s.select(
            "node",
            F.col("n_present").cast("long").alias(f"ball{tag}_regs"),
            F.floor(est).cast("long").alias(f"ball{tag}_est"),
        )

    out = None
    for t in range(1, radius + 1):
        grown = (
            e.join(
                ball.withColumnRenamed("node", "dst").hint("shuffle_hash"),
                "dst",
            )
            .select(F.col("src").alias("node"), "reg", "mx")
            .unionByName(ball)
            .groupBy("node", "reg")
            .agg(F.max("mx").alias("mx"))
        )
        ball = grown.localCheckpoint()
        est_t = estimate(ball, str(t))
        out = est_t if out is None else out.join(
            est_t.hint("shuffle_hash"), "node"
        )
    return out


def hash_walks(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    steps: int = 3,
) -> DataFrame:
    """Deterministic hash-guided random walks — the sampling primitive
    behind DeepWalk/node2vec embeddings, made reproducible: at step ``s``
    the walk at node ``v`` moves to the out-neighbor minimizing
    ``md5(v || '#s#' || neighbor)``. The hash plays the RNG (uniform over
    neighbors, independent across steps, identical across engines and
    retries — a retried task regenerates the same walk, which is what
    makes walk corpora resumable at scale).

    Scale shape: each step is ONE map-side-combined ``min_by`` groupBy on
    the corpus-sized edge list (the per-step transition table has one row
    per non-dangling node) followed by ONE shuffle_hash join keyed on the
    walk's current node — never a per-walk loop, never a collected
    adjacency. ``steps`` is a small constant (walk length), so the plan is
    a fixed chain of bounded-width exchanges. Dangling nodes end the walk
    (NULL tail), matching the restart convention of walk-based samplers.

    Output: (start, h1, .., h{steps}) — one row per distinct start node.
    """
    if steps < 1:
        raise ValueError("steps must be >= 1")
    walks = edges.select(F.col(src_col).alias("start")).distinct()
    cur = "start"
    for s in range(1, steps + 1):
        pick = F.md5(
            F.concat_ws("#", F.col(src_col), F.lit(str(s)), F.col(dst_col))
        )
        nxt = edges.groupBy(F.col(src_col).alias("_hw_src")).agg(
            F.min_by(F.col(dst_col), pick).alias(f"h{s}")
        )
        walks = walks.join(
            nxt.hint("shuffle_hash"),
            walks[cur] == nxt["_hw_src"],
            "left",
        ).drop("_hw_src")
        cur = f"h{s}"
    return walks


def pagerank_convergence(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration convergence gauge: the per-node rank delta between
    the last two PageRank iterations — the stopping-criterion evidence a
    fixed-iteration ranking job publishes alongside its ranks (is
    ``iters`` enough, or is the tail still moving?).

    Scale shape: two ``pagerank`` runs (iters-1 and iters; the prefix
    recompute is the price of leaving the production ``pagerank`` plan
    untouched) joined on the node table via shuffle_hash — node-bounded,
    never corpus-sized. Deltas compare the published floor-nano ranks, so
    the gauge restates exactly what consumers see.

    Output: (node, rank_prev_nano, rank_nano, delta_nano).
    """
    if iters < 2:
        raise ValueError("iters must be >= 2 to compare two iterations")
    prev = pagerank(
        edges, src_col=src_col, dst_col=dst_col, iters=iters - 1,
        damping=damping,
    ).select(F.col("node"), F.col("rank_nano").alias("rank_prev_nano"))
    last = pagerank(
        edges, src_col=src_col, dst_col=dst_col, iters=iters,
        damping=damping,
    )
    return prev.join(last.hint("shuffle_hash"), "node").select(
        "node",
        "rank_prev_nano",
        "rank_nano",
        F.abs(F.col("rank_nano") - F.col("rank_prev_nano"))
        .cast("long")
        .alias("delta_nano"),
    )


def harmonic_centrality(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 3,
) -> DataFrame:
    """EXACT truncated harmonic centrality (incoming sense): for every
    node v, H(v) = Σ_{u reaching v within max_hops} 1/d(u, v) — the
    centrality HyperBall approximates at web scale (Boldi & Vigna's
    motivating application); this exact bounded-hop evaluation is the
    validation twin (the ngram_jaccard-to-minhash relationship): run it
    on a subgraph or demo graph to calibrate the sketch, never on 10^8
    hosts — the per-ORIGIN labeled BFS state is |V|·|B| pairs, which is
    exactly the blowup HyperBall's registers exist to avoid (stated
    here, measured in its docstring pairing with ``hyperball``).

    Determinism: synchronous rounds, first-touch per (origin, node)
    pair via LEFT ANTI — d is the true shortest hop count <= max_hops.
    All-integer output: hop buckets n1..n{max_hops} and
    harmonic_x{L} = Σ_h (L/h)·n_h with L = lcm(1..max_hops) (x6 for
    the default max_hops=3), so no reciprocal ever floats; both the
    bucket columns and the lcm weights derive from ``max_hops``, so
    non-default hops are exact too (not silently truncated at 3).

    Scale shape per round: ONE shuffle_hash join (pair frontier onto the
    edge list) and one LEFT ANTI against the labeled pair set — both
    pinned shuffle_hash (the labeled set grows; the accidental-broadcast
    trap). Output: (node, n1, n2, n3, harmonic_x6).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    labels = e.select(F.col("src").alias("origin")).distinct().select(
        "origin", F.col("origin").alias("node"), F.lit(0).alias("hop")
    ).persist()
    for h in range(1, max_hops + 1):
        frontier = (
            labels.where(F.col("hop") == h - 1)
            .select("origin", F.col("node").alias("src"))
            .join(e.hint("shuffle_hash"), "src")
            .select("origin", F.col("dst").alias("node"))
            .distinct()
            .join(
                labels.select("origin", "node").hint("shuffle_hash"),
                ["origin", "node"],
                "left_anti",
            )
            .withColumn("hop", F.lit(h))
        )
        labels = labels.unionByName(frontier).persist()
    reached = labels.where(F.col("hop") > 0)
    lcm_w = 1
    for h in range(1, max_hops + 1):
        lcm_w = lcm_w * h // math.gcd(lcm_w, h)
    per = reached.groupBy("node").agg(
        *[
            F.sum(F.when(F.col("hop") == h, 1).otherwise(0))
            .cast("long")
            .alias(f"n{h}")
            for h in range(1, max_hops + 1)
        ]
    )
    harmonic = sum(
        (lcm_w // h) * F.col(f"n{h}") for h in range(1, max_hops + 1)
    )
    return per.select(
        "node",
        *[f"n{h}" for h in range(1, max_hops + 1)],
        harmonic.cast("long").alias(f"harmonic_x{lcm_w}"),
    )


def bowtie_membership(
    edges: DataFrame,
    pivots: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    pivot_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Bow-tie web-graph decomposition relative to a pivot set (Broder
    et al. WWW'00): every node classifies by bounded-hop reachability —
    CORE (reaches the pivots AND is reached by them: the mutually-
    connected component the pivots sit in), IN (reaches the pivots but
    isn't reached — pages that link toward the core), OUT (reached from
    the pivots but doesn't link back), DISCONNECTED (neither, within
    ``max_hops``). The census that tells a crawl operator what fraction
    of the known web their seed set can actually reach — and what
    fraction can reach THEM (spam rings live in IN; orphaned content in
    OUT).

    Built as two ``seed_reachability`` passes — forward on the edges,
    backward on the reversed edges — so every scale property of that
    operator carries over verbatim (per round: one shuffle_hash join +
    one LEFT ANTI, the labeled set never broadcasts); classification is
    a full-outer join of the two bounded-round label tables against the
    node census.

    Output: (node, fwd_hop, bwd_hop, cls) — hops are NULL when
    unreached; cls in {'CORE','IN','OUT','DISC'}.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    p = pivots.select(F.col(pivot_col).alias("node"))
    fwd = seed_reachability(e, p, max_hops=max_hops).withColumnRenamed(
        "hop", "fwd_hop"
    )
    bwd = seed_reachability(rev, p, max_hops=max_hops).withColumnRenamed(
        "hop", "bwd_hop"
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    j = nodes.join(fwd.hint("shuffle_hash"), "node", "left").join(
        bwd.hint("shuffle_hash"), "node", "left"
    )
    reached_fwd = F.col("fwd_hop").isNotNull()
    reached_bwd = F.col("bwd_hop").isNotNull()
    cls = (
        F.when(reached_fwd & reached_bwd, F.lit("CORE"))
        .when(reached_bwd, F.lit("IN"))
        .when(reached_fwd, F.lit("OUT"))
        .otherwise(F.lit("DISC"))
    )
    return j.select(
        "node",
        F.col("fwd_hop").cast("long").alias("fwd_hop"),
        F.col("bwd_hop").cast("long").alias("bwd_hop"),
        cls.alias("cls"),
    )
