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
