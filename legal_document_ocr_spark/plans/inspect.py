"""Plan-shape inspection — make the 100 TB story assertable.

The engine's scale guarantees are plan properties, not code comments:
filters pushed into the parquet/Iceberg scan, dimension joins broadcast,
window stacks sharing one exchange, binary columns pruned after the UDF
stage. These helpers read the executed physical plan so tests (and bench
diagnostics) can assert those properties instead of trusting them —
`tests/test_operators.py` pins one assertion per property.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (pre-execution; AQE may refine at runtime)."""
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame, kind: str = "hashpartitioning") -> int:
    """Number of shuffle exchanges of the given partitioning kind."""
    return executed_plan(df).count(f"Exchange {kind}")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists of every scan in the plan (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """The PartitionFilters lists of every scan (partition-pruning proof)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out
