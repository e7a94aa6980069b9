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
