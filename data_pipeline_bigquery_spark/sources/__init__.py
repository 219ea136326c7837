"""Sources & sinks: REST connector adapters, the parquet lake, staged
JSON, and REST write-backs (SURVEY §2.1/§2.2).
"""

from data_pipeline_bigquery_spark.sources.lake import (
    read_lake_prefix,
    read_year_partitions,
    write_lake,
)
from data_pipeline_bigquery_spark.sources.rest import (
    FakeTransport,
    RestSource,
    foreach_partition_writeback,
)
from data_pipeline_bigquery_spark.sources.staging import read_staged_json, write_staged_json

__all__ = [
    "read_lake_prefix",
    "read_year_partitions",
    "write_lake",
    "FakeTransport",
    "RestSource",
    "foreach_partition_writeback",
    "read_staged_json",
    "write_staged_json",
]
