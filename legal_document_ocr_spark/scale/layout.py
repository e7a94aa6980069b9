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
