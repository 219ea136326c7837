"""Reverse-ETL plan — the repo's most composite workflow (SURVEY §3.3).

Reference: ``Log_Mautic_email_read_to_Hubspot``
(``/root/reference/pipeline/mautic_hubspot_email_log/mautic_hubspot_email_read_activities.py:171-202``):
read-log scan → left-join email content (J1) → filter rows not yet
logged (F4) and not already in the campaign CSV (C9) → per-contact
group-concat of campaign ids (A3/W2) → order-preserving CSV dedup
(C10) → per-row engagement-create write-backs (K4, a sink concern).

Here: one lazy chain; the write-back boundary is
``df.foreachPartition`` in :mod:`..sources.rest` — the relational part
below is sink-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.keys import csv_append_dedup, csv_contains
from data_pipeline_bigquery_spark.operators.joins import enrich_left_join
from data_pipeline_bigquery_spark.operators.windows import group_concat


def reverse_etl_plan(
    read_log: DataFrame,
    email_content: DataFrame,
    email_id_col: str = "email_id",
    contact_id_col: str = "contact_id",
    logged_col: str = "is_logged",
    campaigns_col: str = "list_campaigns",
) -> DataFrame:
    """Rows that still need a write-back, enriched and with the updated
    campaign CSV attached."""
    df = enrich_left_join(read_log, email_content, email_id_col, broadcast=True)
    pending = df.filter(
        (~F.col(logged_col))
        & ~F.coalesce(csv_contains(campaigns_col, email_id_col), F.lit(False))
    )
    pending = group_concat(
        pending,
        [contact_id_col],
        email_id_col,
        out_col="new_list_campaign",
        distinct=True,
        sort=True,
    )
    return pending.withColumn(
        "updated_campaigns", csv_append_dedup(campaigns_col, email_id_col)
    )
