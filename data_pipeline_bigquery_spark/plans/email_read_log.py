"""Email-read-log plan (SURVEY §3.3).

Reference: ``mautic_email_log_to_bigquery``
(``/root/reference/pipeline/email_read_log/email_read_log.py:30-87``):
date-range report scan → drop noise columns (P2) → int/bool casts
(C11/C12) → ``contact_`` bulk prefix rename (C15) → composite
``event_id = contactId + '_' + email_id`` key (C7) → incremental filter
``date_read > cursor`` (F1) → dedup → merge upsert keyed on the
composite id with ``date_read`` as cursor.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.functions.cleansing import bool_decode, prefix_rename
from data_pipeline_bigquery_spark.functions.keys import concat_key
from data_pipeline_bigquery_spark.operators.dedup import dedup_keep_latest
from data_pipeline_bigquery_spark.operators.metadata import zip_emitted_info


def email_read_log_plan(
    report: DataFrame,
    cursor: _dt.datetime | str | None,
    emitted_at: _dt.datetime | str,
    emitted_id: str,
    drop_cols: tuple[str, ...] = (),
    contact_cols: tuple[str, ...] = (),
    contact_id_col: str = "contactId",
    email_id_col: str = "email_id",
    is_read_col: str | None = "is_read_flag",
    hits_col: str | None = "hits_str",
    date_read_col: str = "date_read",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    df = report.drop(*[c for c in drop_cols if c in report.columns])
    if hits_col and hits_col in df.columns:
        df = df.withColumn("hits", F.col(hits_col).cast("long")).drop(hits_col)
    if is_read_col and is_read_col in df.columns:
        df = df.withColumn("is_read", bool_decode(is_read_col)).drop(is_read_col)
    if contact_cols:
        df = prefix_rename(df, "contact_", list(contact_cols))
    df = df.withColumn("event_id", concat_key(contact_id_col, email_id_col))
    if cursor is not None:
        df = df.filter(F.col(date_read_col) > F.lit(cursor).cast("timestamp"))
    # pre-merge dedup on the composite key, latest read wins (A1/ST3)
    df = dedup_keep_latest(df, ["event_id"], [date_read_col, *tiebreak_cols, "event_id"])
    return zip_emitted_info(df, emitted_at, emitted_id)
