"""Pipeline compositions — the reference's 8 ``main.py`` workflows
(``/root/reference/main.py:13-54``) re-expressed as lazy DataFrame chains.

Each plan is a pure function ``(input DataFrames, run params) -> DataFrame``
so the same composition runs on fixtures (tests/oracle), a real lake, or
inside ``foreachBatch`` of a streaming job.
"""

from data_pipeline_bigquery_spark.plans.association import association_edges_plan
from data_pipeline_bigquery_spark.plans.change_log import change_log_plan
from data_pipeline_bigquery_spark.plans.email_read_log import email_read_log_plan
from data_pipeline_bigquery_spark.plans.entity import entity_sync_plan
from data_pipeline_bigquery_spark.plans.reverse_etl import reverse_etl_plan

__all__ = [
    "association_edges_plan",
    "change_log_plan",
    "email_read_log_plan",
    "entity_sync_plan",
    "reverse_etl_plan",
]
