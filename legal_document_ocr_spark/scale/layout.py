"""Data-layout optimization: Z-order (Morton) clustering keys.

The write-side half of partition pruning: sorting a table by the
interleaved bits of two normalized columns co-locates rows that are close
in BOTH dimensions, so min/max file statistics prune on either predicate —
the primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``. At 100 TB the
pattern is: compute ``z_key`` (one scan + two scalar aggregates), then
``repartitionByRange(z_key).sortWithinPartitions(z_key)`` into the
partitioned sink — every downstream point/range query on either dimension
then skips the files whose stats exclude it.

Everything stays JVM-side: the rank normalization is exact integer math
(SQL ``div`` — no float rounding at any span), and the bit interleave is
an UNROLLED literal-shift expression (Spark's shiftleft takes only
literal shift amounts; unrolling also keeps the whole thing inside one
whole-stage-codegen projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(zx: Column, zy: Column, bits: int) -> Column:
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(zx, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(zy, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z.cast("long")


def zorder_keys(
    df: DataFrame,
    col_x: str,
    col_y: str,
    *,
    bits: int = 16,
    out_col: str = "z_key",
) -> DataFrame:
    """Add a Morton key over two integer columns: each column min/max-
    normalizes to a ``bits``-bit rank (exact integer ``div`` — constant
    columns rank to 0 via the span floor of 1), and the ranks' bits
    interleave x-even / y-odd. Two scalar driver aggregates (the min/max
    pass) + one codegen projection; no shuffle — the caller owns the
    subsequent range-repartition-and-sort, which is the operation being
    optimized FOR, not part of key computation.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    stats = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    minx, maxx, miny, maxy = (int(v) for v in stats)
    spanx = max(1, maxx - minx)
    spany = max(1, maxy - miny)
    m = (1 << bits) - 1
    zx = F.expr(f"(({col_x} - {minx}) * {m}) div {spanx}")
    zy = F.expr(f"(({col_y} - {miny}) * {m}) div {spany}")
    return df.withColumn(out_col, _interleave(zx, zy, bits))


def rendezvous_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    *,
    out_col: str = "shard",
) -> DataFrame:
    """Highest-random-weight (rendezvous) shard assignment: a row lands on
    the shard whose ``md5(key || '#' || shard)`` is lexicographically
    largest. Unlike modulo hashing, growing the fleet from N to N+K shards
    moves only the rows whose new candidates win — an expected K/(N+K)
    fraction — and every moved row lands on a NEW shard, never between
    surviving ones (Thaler & Ravishankar, HRW hashing). That minimal-motion
    property is what makes shard growth affordable at 10^12 rows: a 100 TB
    re-shard from 8 to 9 shards rewrites ~11% of the data instead of ~89%.

    Scale shape: pure map-side — an unrolled ``n_shards``-wide md5 battery
    inside one whole-stage-codegen projection, no shuffle, no driver state.
    The md5 hex comparison is engine-portable (DuckDB computes the identical
    argmax), so assignments are reproducible across engines and retries.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.md5(
            F.concat(
                F.col(key_col).cast("string"), F.lit("#"), s.cast("string")
            )
        ),
    )
    return df.withColumn(
        out_col,
        (F.array_position(hashes, F.array_max(hashes)) - 1).cast("long"),
    )


def rendezvous_moves(
    df: DataFrame,
    key_col: str,
    n_from: int,
    n_to: int,
) -> DataFrame:
    """Re-shard motion audit: assign every row under ``n_from`` and
    ``n_to`` rendezvous shards and census, per destination shard, how many
    rows land there and how many of those MOVED (different source shard).
    With ``n_to > n_from`` the HRW invariant means every moved row lands on
    a shard id >= ``n_from`` (pinned by ``tests/test_operators.py``), so the
    audit doubles as a correctness check of the assignment battery.

    Scale shape: the two assignment batteries fuse into the same codegen
    projection (one corpus scan), then ONE map-side-combined groupBy on the
    bounded (n_to)-row destination key. Nothing is broadcast or collected.

    Output: (shard_to, n_docs, n_moved, moved_ppm) — one row per
    destination shard, all-integer except the ppm floor division.
    """
    assigned = rendezvous_assign(
        rendezvous_assign(df, key_col, n_from, out_col="_rv_from"),
        key_col,
        n_to,
        out_col="_rv_to",
    )
    moved = F.when(F.col("_rv_from") != F.col("_rv_to"), 1).otherwise(0)
    return (
        assigned.groupBy(F.col("_rv_to").alias("shard_to"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(moved).cast("long").alias("n_moved"),
        )
        .select(
            "shard_to",
            "n_docs",
            "n_moved",
            F.floor(F.col("n_moved") * 1000000 / F.col("n_docs"))
            .cast("long")
            .alias("moved_ppm"),
        )
    )
