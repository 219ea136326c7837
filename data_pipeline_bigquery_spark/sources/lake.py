"""Parquet lake source/sink (SURVEY §2.1 S14, §2.2 K3).

Reference: the GCS handler lists blobs and concatenates per-file pandas
frames (``/root/reference/config/gcs/gcs.py:49-75``), enumerates year
directories ``base/{2020..now}/`` (``:143-187``), and uploads one parquet
at a time with a retry loop (``:204-229``).

Spark replaces all of it: ``spark.read.parquet(prefix)`` does listing,
schema merge, partition discovery, predicate pushdown, and parallel IO;
``partitionBy`` on write produces the partition layout that makes
pruning work at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_lake_prefix(spark: SparkSession, prefix: str, schema=None) -> DataFrame:
    """S14 parquet_lake_scan: one call, partition discovery included."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(prefix)


def read_year_partitions(
    spark: SparkSession, prefix: str, year_from: int, year_to: int, year_col: str = "year"
) -> DataFrame:
    """Year-partitioned variant: with a ``year=YYYY/`` hive layout the
    range predicate prunes directories before any file IO — the
    declarative form of the reference's ``range(2020, now)`` loop."""
    return read_lake_prefix(spark, prefix).filter(
        F.col(year_col).between(year_from, year_to)
    )


def write_lake(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """K3 parquet_write.  Retries are Spark task retries; atomicity is
    the file committer's job — no hand-rolled retry loop."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 256,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: both sides of a recurring fact-to-fact
    join written with the same ``(bucket_col, n_buckets)`` join WITHOUT
    any exchange (plan-asserted in tests/test_bucketing.py) — the 100 TB
    strategy where neither side broadcasts and re-shuffling 100 TB per
    join is the bottleneck.  Buckets also pre-sort, so the sort-merge
    join's sort is free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
