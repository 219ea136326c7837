"""Staged JSON batches (SURVEY §2.1 S15, §2.2 K7).

Reference: engagement pipelines dump page batches to numbered local
JSON files then re-read + flatten them
(``/root/reference/config/hubspot/hubspotoop.py:119-123``,
``pipeline/hubspot_engagement/hubspot_email_engagement.py:209-216``).
Spark's partitioned JSON read/write subsumes the numbering and the
list-of-lists flatten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_staged_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K7 staged_json_sink — one file per partition, no manual batch
    numbering."""
    df.write.mode(mode).json(path)


def read_staged_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S15 local_json_scan.  Always pass a schema in production —
    inference is a second full read."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_staged_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink (header on; the reference's CSV handling is
    string-level — C9/C10 in `functions/keys.py` — this is the file-
    format counterpart for interchange with non-parquet consumers)."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_staged_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """Typed CSV scan.  The schema is REQUIRED: header-based inference
    reads the data twice and guesses types per-file — at lake scale
    that is both a double scan and a schema-drift hazard.  FAILFAST
    surfaces malformed rows instead of silently nulling them."""
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "FAILFAST")
        .csv(path)
    )


def write_staged_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML sink — Spark 4 ships the (formerly spark-xml) XML source
    in core.  One element per row under ``row_tag``; still a
    splittable, partition-parallel write like every other format."""
    df.write.mode(mode).format("xml").option("rowTag", row_tag).save(path)


def read_staged_xml(
    spark: SparkSession, path: str, schema, row_tag: str = "row"
) -> DataFrame:
    """Schema-ENFORCED XML scan (FAILFAST): like the CSV path, the
    catalog schema is asserted rather than re-inferred per read —
    inference on XML is a full extra pass over the data at lake
    scale and can drift types between generations."""
    return (
        spark.read.schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST")
        .format("xml")
        .load(path)
    )


def write_staged_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other columnar interchange format Spark carries a
    native vectorized reader/writer for (zlib by default; predicate
    pushdown and column pruning work exactly as with parquet)."""
    df.write.mode(mode).orc(path)


def read_staged_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan; self-describing like parquet, so no schema argument."""
    return spark.read.orc(path)
