"""Partitioned file-tree sink (SURVEY.md §2.1 S7).

The reference writes a per-document/per-page output tree
(/root/reference/app/services/document_merger_service.py:227-306: per-page
dirs + per-doc dirs + documents.json). The Spark-native shape of that sink is
a Hive-partitioned parquet tree: ``partitionBy(col)`` encodes the grouping in
the directory layout, and every read that filters on the partition column is
partition-PRUNED — the scan lists only the matching directories, the
100 TB property the file-tree sink exists for (tests assert the pruning in
the physical plan via ``plans.inspect.partition_filters``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("lang",),
    *,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a parquet tree partitioned by ``partition_cols``.

    Column order: partition columns move to the directory layout; everything
    else stays columnar inside the leaf files. Returns ``path``.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
    return path


def read_partition(
    spark: SparkSession, path: str, **filters: object
) -> DataFrame:
    """Read back a partition-pruned slice: every kwarg is an equality filter
    on a partition column, applied BEFORE the scan materializes (Catalyst
    turns it into PartitionFilters — only matching directories are listed)."""
    df = spark.read.parquet(path)
    for col, value in filters.items():
        df = df.where(F.col(col) == value)
    return df


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
    options: dict | None = None,
) -> str:
    """Format-generic sink (parquet/orc/json/csv/text) — the same
    Hive-partitioned tree contract as ``write_partitioned`` for every
    columnar/row format Spark ships: ORC keeps the parquet properties
    (column pruning, predicate pushdown, partition pruning); JSON-lines
    and CSV are the interchange sinks downstream non-Spark consumers
    read; text is the WET/WAT record sink. Returns ``path``."""
    w = df.write.mode(mode).format(fmt)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.save(path)
    return path


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    *,
    schema: str | None = None,
    options: dict | None = None,
) -> DataFrame:
    """Format-generic source for ``write_table`` trees. A ``schema``
    string is REQUIRED for json/csv at scale — schema inference is a
    full extra pass over 100 TB; columnar formats carry their schema."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_col: str = "doc_id",
    n_buckets: int = 8,
    sort: bool = True,
) -> str:
    """Bucketed table sink — the shuffle-killing layout for repeated
    joins: ``bucketBy(n, key)`` hash-partitions rows into a fixed
    bucket count AT WRITE TIME, so every later equi-join or aggregation
    on the key between identically-bucketed tables runs with ZERO
    exchange (Catalyst recognises the matching output partitioning).
    At 100 TB this converts the dominant per-query cost — re-shuffling
    the fact table for every join — into a one-time write-side cost;
    ``sortBy`` additionally pre-sorts each bucket file so sort-merge
    joins skip their sort.

    Bucketed layouts require the table catalog (bucket metadata lives
    there, not in the files), hence ``saveAsTable`` with an explicit
    ``path`` rather than a bare ``parquet(path)``. Returns ``table``.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # one task per bucket -> one file per bucket: without this, every
    # write task emits a file into EVERY bucket (tasks x buckets small
    # files). Joins are Exchange-free either way; eliding the residual
    # per-partition Sort additionally needs one file per bucket plus
    # spark.sql.legacy.bucketedTableScan.outputOrdering=true.
    df = df.repartition(n_buckets, F.col(bucket_col))
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)
    return table


def count_leaf_files(path: str, suffix: str = ".parquet") -> int:
    """Count data files under a sink tree (the small-files gauge a
    compaction pass is judged by)."""
    import os

    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(suffix))
    return n


def compact_partitioned(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    partition_col: str = "lang",
    *,
    files_per_partition: int = 1,
) -> str:
    """Small-file compaction for a Hive-partitioned parquet tree — the
    maintenance pass every long-lived 100 TB sink needs: streaming /
    incremental writers leave hundreds of KB-sized files per partition
    directory, and scan cost degenerates into file-listing + task
    overhead (a 1e6-file table is slow even when the bytes are small).

    The rewrite is ONE job: read -> repartition(n_parts *
    files_per_partition, partition_col) -> write partitionBy. Hashing on
    the partition column routes each directory's rows onto the same
    task(s), so each partition directory comes out with at most
    files_per_partition files (hash collisions can merge two partitions
    onto one task; the partitionBy writer still splits them into their
    own directories). Content is untouched — callers verify with an
    order-independent member digest (the shard_manifest discipline).

    Returns ``out_path``.
    """
    df = spark.read.parquet(in_path)
    n_parts = df.select(partition_col).distinct().count()
    (
        df.repartition(
            max(1, int(n_parts) * files_per_partition), F.col(partition_col)
        )
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(out_path)
    )
    return out_path
