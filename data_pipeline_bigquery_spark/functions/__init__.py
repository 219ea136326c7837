"""Scalar function layer — pure Column expressions (SURVEY §2.10).

Everything here compiles to Catalyst expressions inside whole-stage
codegen; none of it is a Python UDF.
"""

from data_pipeline_bigquery_spark.functions.cleansing import (
    bool_decode,
    null_literal_normalize,
    prefix_rename,
)
from data_pipeline_bigquery_spark.functions.keys import (
    concat_key,
    csv_append_dedup,
    csv_contains,
    md5_surrogate_key,
)
from data_pipeline_bigquery_spark.functions.timestamps import (
    as_instant,
    epoch_millis_to_ts,
    parse_multi_format_ts,
    to_business_tz,
    to_epoch_millis,
    to_epoch_seconds,
    truncate_seconds,
)

__all__ = [
    "bool_decode",
    "null_literal_normalize",
    "prefix_rename",
    "concat_key",
    "csv_append_dedup",
    "csv_contains",
    "md5_surrogate_key",
    "as_instant",
    "epoch_millis_to_ts",
    "to_epoch_seconds",
    "parse_multi_format_ts",
    "to_business_tz",
    "to_epoch_millis",
    "truncate_seconds",
]
