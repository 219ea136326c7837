"""Relational operators — pure ``DataFrame -> DataFrame`` functions.

Each maps a reference capability (SURVEY §2) onto the DataFrame API so
Catalyst owns the physical plan (pushdown, pruning, join selection,
partial aggregation).
"""

from data_pipeline_bigquery_spark.operators.dedup import (
    dedup_keep_latest,
    distinct_values,
    dup_pk_check,
    null_pk_check,
)
from data_pipeline_bigquery_spark.operators.joins import (
    anti_join,
    enrich_left_join,
    semi_join,
)
from data_pipeline_bigquery_spark.operators.merge import merge_upsert
from data_pipeline_bigquery_spark.operators.metadata import zip_emitted_info
from data_pipeline_bigquery_spark.operators.nested import (
    explode_array_field,
    flatten_struct,
    serialize_row_json,
)
from data_pipeline_bigquery_spark.operators.windows import (
    group_concat,
    version_row_number,
)

__all__ = [
    "dedup_keep_latest",
    "distinct_values",
    "dup_pk_check",
    "null_pk_check",
    "anti_join",
    "enrich_left_join",
    "semi_join",
    "merge_upsert",
    "zip_emitted_info",
    "explode_array_field",
    "flatten_struct",
    "serialize_row_json",
    "group_concat",
    "version_row_number",
]
