"""data_pipeline_bigquery_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
``llgx10/data_pipeline_bigquery`` (a pandas + REST + BigQuery batch ETL
system) as an idiomatic Apache Spark engine:

* row-oriented REST/JSON ingestion        → Spark DataFrames (Arrow path)
* pandas transform layer                  → DataFrame API / Spark SQL
* delegated SQL (Redash)                  → ``spark.sql`` (the engine IS local)
* BigQuery MERGE upsert                   → join-based :mod:`.operators.merge`
* cursor state table                      → :mod:`.state.cursor`
* GCS parquet lake                        → :mod:`.sources.lake`
* scheduled micro-batch pipelines         → :mod:`.plans` + :mod:`.streaming`

All operators are pure ``DataFrame -> DataFrame`` functions built on
``pyspark.sql.functions`` so Catalyst performs predicate pushdown, column
pruning, partition pruning, and join selection.  Python UDFs appear only
where built-ins genuinely cannot express the semantics (documented per
call site), and then always as Arrow-vectorized pandas UDFs.
"""

from data_pipeline_bigquery_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
