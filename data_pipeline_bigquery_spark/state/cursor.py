"""Incremental cursor state (SURVEY §2.11 ST1/ST2).

Reference: a ``hubspot_object_cursor`` BigQuery table
(``/root/reference/constants.py:19-25``) read through a delegated Redash
query ``select max(cursor_date) ... where object = X``
(``pipeline/functions/functions.py:58-67``) and appended to after each
run (``pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:129-132``).

Here the store is a small append-only parquet directory; the max-cursor
lookup is a Spark aggregation (the whole Redash delegation layer
disappears — Spark SQL *is* the engine).  The table stays tiny (one row
per run per object), so every read broadcasts.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, Row, SparkSession

from data_pipeline_bigquery_spark.catalog import CURSOR_SCHEMA


class CursorStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], CURSOR_SCHEMA)
        return self.spark.read.schema(CURSOR_SCHEMA).parquet(self.path)

    def max_cursor(self, object_name: str) -> _dt.datetime | None:
        """``get_object_cursor_date`` analog: scalar max cursor for one
        object type (None on first run)."""
        from pyspark.sql import functions as F

        row = (
            self._read()
            .filter(F.col("object") == object_name)
            .agg(F.max("cursor_date").alias("c"))
            .first()
        )
        return row["c"] if row else None

    def append(
        self,
        object_name: str,
        cursor_date: _dt.datetime,
        emitted_at: _dt.datetime,
        emitted_id: str,
    ) -> None:
        """Append one cursor row (``create_cursor`` analog)."""
        df = self.spark.createDataFrame(
            [
                Row(
                    emitted_id=emitted_id,
                    emitted_at=emitted_at,
                    cursor_date=cursor_date,
                    object=object_name,
                )
            ],
            CURSOR_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.path)
