"""File-format interchange scans (CSV, ORC).

The reference ingests REST JSON and emits warehouse tables; a drop-in
engine also gets handed flat files.  Each query stages a fixture table
out through the format under test, reads it back TYPED, and aggregates
— the oracle runs the same aggregate on the original parquet, so a
green row proves the format round-trip is lossless for every column
type involved (bigint, int, double, string).

Staging is a deterministic overwrite under the system temp dir — the
same pattern as the REST-transport fixtures: scaffolding for the
format path, not part of the measured query shape.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.sources.staging import (
    read_staged_csv,
    read_staged_orc,
    write_staged_csv,
    write_staged_orc,
)

_DEC = "decimal(18,2)"

_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

_AGG_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       max(c_custkey) AS max_key
FROM customer GROUP BY c_mktsegment
"""


def _stage_dir(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{fmt}_{tag}")


def _segment_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_balance"),
        F.max("c_custkey").alias("max_key"),
    )


def _csv_typed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed CSV round-trip: parquet → headered CSV → schema-enforced
    FAILFAST read → aggregate.  Spark writes doubles in shortest
    round-trip notation, so c_acctbal survives bit-exactly — which the
    hash-compared total proves."""
    path = _stage_dir(sf_dir, "csv")
    write_staged_csv(load(spark, sf_dir, "customer"), path)
    return _segment_agg(read_staged_csv(spark, path, _CUSTOMER_SCHEMA))


def _orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip through Spark's native vectorized ORC IO; ORC is
    self-describing, so the read takes no schema."""
    path = _stage_dir(sf_dir, "orc")
    write_staged_orc(load(spark, sf_dir, "customer"), path)
    return _segment_agg(read_staged_orc(spark, path))


def _sink_seam_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K2 MERGE result routed through the pluggable sink seam in a
    SECOND format (ORC via ``SinkSpec``), re-read, and returned — the
    driver hash-compares it against the same DuckDB merge oracle as
    ``merge_upsert``, proving the format-parameterized write path is
    semantics-preserving end-to-end (the BigQuery-connector seam,
    exercised with the local format this sandbox can run)."""
    from data_pipeline_bigquery_spark.queries.pipelines import _merge_upsert
    from data_pipeline_bigquery_spark.sources.sink import (
        SinkSpec,
        read_source,
        write_sink,
    )

    merged = _merge_upsert(spark, sf_dir)
    path = _stage_dir(sf_dir, "sink_seam_orc")
    write_sink(merged, SinkSpec(format="orc"), path=path, mode="overwrite")
    return read_source(spark, SinkSpec(format="orc"), path=path)


def _sink_seam_sql() -> str:
    from data_pipeline_bigquery_spark.queries.pipelines import _MERGE_SQL

    return _MERGE_SQL


QUERIES: dict[str, QuerySpec] = {
    "csv_typed_scan": QuerySpec(_csv_typed_scan, _AGG_SQL),
    "orc_roundtrip_scan": QuerySpec(_orc_roundtrip_scan, _AGG_SQL),
    "sink_seam_merge_roundtrip": QuerySpec(_sink_seam_merge_roundtrip, _sink_seam_sql()),
}
