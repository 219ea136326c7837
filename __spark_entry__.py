"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship change-log pipeline (the reference's
relational-heaviest path, SURVEY §3.2) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY §2 plus
the scale-out extensions; specs live in
``data_pipeline_bigquery_spark/queries/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_bigquery_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["pipeline_change_log"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in registry().items() if spec.oracle is not None}
