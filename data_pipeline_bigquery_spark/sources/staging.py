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
