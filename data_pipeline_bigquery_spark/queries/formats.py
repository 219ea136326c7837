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
    read_staged_xml,
    write_staged_csv,
    write_staged_orc,
    write_staged_xml,
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
    # pid-scoped like the media/REST/snapshot fixtures: a concurrent
    # session's restage (rmtree+write) must not race another session's
    # lazy scan of the same staged dir
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(
        tempfile.gettempdir(), f"spark_graft_{fmt}_{tag}_{os.getpid()}"
    )


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


def _xml_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed XML round-trip through Spark 4's built-in XML source
    (the formerly-external spark-xml, now core): parquet → one
    element per row → schema-enforced FAILFAST read → aggregate.
    Doubles are written in round-trip notation like CSV, so the
    hash-compared balance total proves losslessness."""
    path = _stage_dir(sf_dir, "xml")
    write_staged_xml(load(spark, sf_dir, "customer"), path)
    return _segment_agg(read_staged_xml(spark, path, _CUSTOMER_SCHEMA))


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


def _schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations — the lake reality that
    columns get ADDED over a table's life.  Generation 1 stages
    customers WITHOUT the segment column; generation 2 adds it.  A
    ``mergeSchema`` read unifies both: old files surface NULL for the
    new column, new files carry values — and the aggregate proves the
    merged scan sees every generation (the oracle reproduces the same
    null-backfill split from the source table).  At 100 TB the merge is
    footer-only work per file; production would pin the evolved schema
    in the catalog instead of re-inferring per read."""
    path = _stage_dir(sf_dir, "schema_evo")
    cust = load(spark, sf_dir, "customer")
    gen1 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    gen2 = cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    return merged.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("__pre_evolution__")).alias("segment")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_balance"),
    )


_SCHEMA_EVO_SQL = """
SELECT CASE WHEN c_custkey % 2 = 0 THEN '__pre_evolution__' ELSE c_mktsegment END AS segment,
       count(*) AS n_rows,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
GROUP BY CASE WHEN c_custkey % 2 = 0 THEN '__pre_evolution__' ELSE c_mktsegment END
"""


def _malformed_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter ingestion: a JSON batch where a deterministic subset
    of lines is corrupt (every 7th record truncated mid-object).  The
    text scan + ``from_json`` split routes every line: parseable rows
    come out typed, unparseable ones surface a NULL struct and are
    counted for the dead-letter sink instead of failing the job or
    silently disappearing.  (Spark's raw-scan ``_corrupt_record``
    column forbids corrupt-only queries — UNSUPPORTED_FEATURE — so the
    expression form is also the ROBUST form.)  Output: ingested vs
    quarantined counts; the oracle recomputes both from the corruption
    rule.

    The corrupt batch itself is synthesized JVM-side (``to_json`` +
    conditional truncation, written as text) — no driver loop, so the
    staging step scales with the corpus like every other fixture
    stage."""
    path = _stage_dir(sf_dir, "dead_letter")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.to_json(F.struct("doc_id", "lang")).alias("line")
    )
    corrupted = docs.select(
        F.when(
            F.col("doc_id") % 7 == 0,
            F.expr("substr(line, 1, length(line) div 2)"),
        )
        .otherwise(F.col("line"))
        .alias("value")
    )
    corrupted.write.mode("overwrite").text(path)
    parsed = spark.read.text(path).select(
        F.from_json("value", "doc_id long, lang string").alias("j")
    )
    # a truncated object parses to NULL; every intact record carries a
    # non-null doc_id by construction
    ok = F.col("j").isNotNull() & F.col("j.doc_id").isNotNull()
    return parsed.agg(
        F.sum(F.when(ok, 1).otherwise(0)).alias("n_ingested"),
        F.sum(F.when(~ok, 1).otherwise(0)).alias("n_quarantined"),
    )


_DEAD_LETTER_SQL = """
SELECT CAST(sum(CASE WHEN doc_id % 7 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ingested,
       CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
FROM documents
"""


QUERIES: dict[str, QuerySpec] = {
    "csv_typed_scan": QuerySpec(_csv_typed_scan, _AGG_SQL),
    "orc_roundtrip_scan": QuerySpec(_orc_roundtrip_scan, _AGG_SQL),
    "xml_roundtrip_scan": QuerySpec(_xml_roundtrip_scan, _AGG_SQL),
    "sink_seam_merge_roundtrip": QuerySpec(_sink_seam_merge_roundtrip, _sink_seam_sql()),
    "schema_evolution_scan": QuerySpec(_schema_evolution_scan, _SCHEMA_EVO_SQL),
    "malformed_json_quarantine": QuerySpec(
        _malformed_json_quarantine, _DEAD_LETTER_SQL
    ),
}
