"""Coverage queries for the remaining SURVEY §2 bold operators that the
core module folds into bigger compositions — each gets its own named
entry so the inventory maps 1:1, plus the engagement-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.cleansing import null_literal_normalize, prefix_rename
from data_pipeline_bigquery_spark.functions.keys import csv_append_dedup, csv_contains
from data_pipeline_bigquery_spark.functions.timestamps import (
    parse_multi_format_ts,
    to_business_tz,
    to_epoch_millis,
    truncate_seconds,
)
from data_pipeline_bigquery_spark.operators.nested import json_field
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.sources.rest import FakeTransport, RestSource

EMITTED_AT = "2026-01-01 00:00:00"
EMITTED_ID = "run-0001"


# --- S1: rest paginated scan -------------------------------------------------

def _rest_paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 rest_paginated_scan (hubspotoop.py:50-83): cursor-paginated
    REST pages → Arrow → DataFrame.  The FakeTransport serves the
    ``nation`` table in pages of 7 with a ``paging.next.after`` cursor;
    the adapter walks the chain exactly like the reference's loop
    (minus the sleep).  The seeding collect is bounded by construction:
    ``nation`` is a fixed 25-row dimension at every SF (bulk pulls go
    through S2 ``fetch_to_staging`` instead)."""
    nation = load(spark, sf_dir, "nation")
    records = [r.asDict() for r in nation.orderBy("n_nationkey").collect()]
    source = RestSource(FakeTransport(records, page_size=7), "https://fake/api/nation")
    return source.to_dataframe(spark, nation.schema)


_REST_SCAN_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


# --- K1: append load ---------------------------------------------------------

def _append_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 append_load (bigquery.py:273-309): schema-checked append =
    target ∪ stamped batch (the WRITE_APPEND disposition as a set op)."""
    orders = load(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderdate") <= F.lit("1997-01-01").cast("timestamp")).select(
        "o_orderkey", "o_orderdate", F.lit(None).cast("string").alias("emitted_id")
    )
    batch = orders.filter(F.col("o_orderdate") > F.lit("1997-01-01").cast("timestamp")).select(
        "o_orderkey", "o_orderdate", F.lit(EMITTED_ID).alias("emitted_id")
    )
    return target.unionByName(batch)


_APPEND_SQL = f"""
SELECT o_orderkey, o_orderdate, CAST(NULL AS VARCHAR) AS emitted_id
FROM orders WHERE o_orderdate <= TIMESTAMP '1997-01-01'
UNION ALL
SELECT o_orderkey, o_orderdate, '{EMITTED_ID}'
FROM orders WHERE o_orderdate > TIMESTAMP '1997-01-01'
"""


# --- P1/P2: project select / drop -------------------------------------------

def _project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 project_select + P2 project_drop (deal_log_pipeline.py:97-109;
    email_read_log.py:33) — Catalyst prunes the parquet scan to exactly
    these columns (check ReadSchema in explain)."""
    return load(spark, sf_dir, "lineitem").drop("l_tax", "l_linestatus").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


_PROJECT_SQL = "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem"


# --- P3/C15: rename incl. bulk prefix ---------------------------------------

def _project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 project_rename + C15 bulk contact_ prefix
    (email_read_log.py:36-38)."""
    events = load(spark, sf_dir, "events")
    df = events.select(
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
        F.col("value").alias("metric"),
        F.col("user_id"),
        F.col("event_type"),
    )
    return prefix_rename(df, "contact_", ["user_id", "event_type"])


_RENAME_SQL = """
SELECT event_id, ts AS event_ts, value AS metric,
       user_id AS contact_user_id, event_type AS contact_event_type
FROM events
"""


# --- F1: client-side cursor filter ------------------------------------------

def _filter_gt_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 filter_gt_cursor (deal_log_pipeline.py:161) on the events
    stream table."""
    return load(spark, sf_dir, "events").filter(
        F.col("ts") > F.lit("2024-01-04").cast("timestamp")
    ).select("event_id", "ts", "user_id")


_CURSOR_SQL = """
SELECT event_id, ts, user_id FROM events WHERE ts > TIMESTAMP '2024-01-04'
"""


# --- F6: null sentinel normalize --------------------------------------------

def _null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 null_literal_normalize (mautic...py:54): sentinel 'null'
    string → real NULL."""
    events = load(spark, sf_dir, "events")
    sentinel = F.when(F.col("event_type") == "error", "null").otherwise(F.col("event_type"))
    return events.select(
        "event_id", null_literal_normalize(sentinel).alias("event_type_clean")
    )


_NULL_NORM_SQL = """
SELECT event_id,
       CASE WHEN (CASE WHEN event_type = 'error' THEN 'null' ELSE event_type END) = 'null'
            THEN NULL
            ELSE (CASE WHEN event_type = 'error' THEN 'null' ELSE event_type END) END
         AS event_type_clean
FROM events
"""


# --- A5: max cursor ----------------------------------------------------------

def _max_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 max_cursor (functions.py:58-67): the delegated
    ``select max(cursor_date) ... group by object`` collapses into a
    local aggregation."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("object"))
        .agg(F.max("ts").alias("cursor_date"))
    )


_MAX_CURSOR_SQL = """
SELECT event_type AS object, max(ts) AS cursor_date FROM events GROUP BY event_type
"""


# --- A6/A7: data-quality guards ---------------------------------------------

def _dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 null_count_check + A7 duplicate_pk_check as one report
    (functions.py:108-121; bigquery.py:227-229)."""
    events = load(spark, sf_dir, "events")
    nulls = events.select(
        F.lit("null_pk").alias("metric"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("value"),
    )
    dups = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select(F.lit("dup_pk_groups").alias("metric"), F.count(F.lit(1)).alias("value"))
    )
    return nulls.unionByName(dups)


_DQ_SQL = """
SELECT 'null_pk' AS metric, count(*) FILTER (WHERE user_id IS NULL) AS value FROM events
UNION ALL
SELECT 'dup_pk_groups', count(*) FROM (
  SELECT user_id, event_type FROM events GROUP BY user_id, event_type HAVING count(*) > 1)
"""


# --- C3/C4: timezone shift + microsecond truncation -------------------------

def _tz_and_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 timezone_shift_gmt7 (add_7_hours, deal_log_pipeline.py:37-41)
    + C4 truncate_microseconds (:117-121).  Asia/Bangkok is UTC+7 with
    no DST, so the oracle's literal +7h interval is exact."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        to_business_tz("ts").alias("ts_bangkok"),
        truncate_seconds("ts").alias("ts_trunc"),
    )


_TZ_SQL = """
SELECT event_id, ts + INTERVAL 7 HOUR AS ts_bangkok,
       date_trunc('second', ts) AS ts_trunc
FROM events
"""


# --- C9/C10: csv membership + append-dedup ----------------------------------

def _csv_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 csv_membership_test + C10 order-preserving csv append-dedup
    (mautic...py:100-124)."""
    events = load(spark, sf_dir, "events")
    df = events.select(
        "event_id",
        (F.col("event_id") % 20).cast("string").alias("new_id"),
        F.concat_ws(
            ",",
            (F.col("user_id") % 20).cast("string"),
            ((F.col("user_id") + 7) % 20).cast("string"),
        ).alias("campaigns"),
    )
    return df.select(
        "event_id",
        "campaigns",
        "new_id",
        csv_contains("campaigns", "new_id").alias("already_logged"),
        csv_append_dedup("campaigns", "new_id").alias("updated_campaigns"),
    )


_CSV_SQL = """
WITH d AS (
  SELECT event_id,
         CAST(event_id % 20 AS VARCHAR) AS new_id,
         concat_ws(',', CAST(user_id % 20 AS VARCHAR),
                        CAST((user_id + 7) % 20 AS VARCHAR)) AS campaigns
  FROM events),
s AS (SELECT *, string_split(campaigns, ',')[1] AS c1,
             string_split(campaigns, ',')[2] AS c2 FROM d)
SELECT event_id, campaigns, new_id,
       list_contains(string_split(campaigns, ','), new_id) AS already_logged,
       concat(new_id,
              CASE WHEN c1 = new_id THEN '' ELSE concat(',', c1) END,
              CASE WHEN c2 = new_id OR c2 = c1 THEN '' ELSE concat(',', c2) END)
         AS updated_campaigns
FROM s
"""


# --- engagement pipeline family (hubspot_engagement, 775 LoC) ---------------

def _pipeline_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement pipelines (emails/calls/notes/…,
    hubspot_engagement_pipeline.py:46-63): JSON property extraction +
    multi-format timestamp normalization + owner extraction + stamping —
    the C1/N2/N3/P4 composition that repeats 7× in the reference."""
    events = load(spark, sf_dir, "events")
    raw_ts = F.when(
        F.col("event_id") % 3 == 0,
        F.date_format(F.date_trunc("second", F.col("ts")), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
    ).otherwise(to_epoch_millis("ts").cast("string"))
    df = events.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("props").alias("properties"),
        raw_ts.alias("hs_timestamp"),
        F.col("user_id").cast("string").alias("owner_id"),
    )
    return df.select(
        "id",
        "properties",
        json_field("properties", "$.k").alias("k_value"),
        parse_multi_format_ts("hs_timestamp").alias("activity_date"),
        "owner_id",
        F.lit(False).alias("archived"),
        F.lit(EMITTED_AT).cast("timestamp").alias("emitted_at"),
        F.lit(EMITTED_ID).alias("emitted_id"),
    )


_ENGAGEMENT_SQL = f"""
WITH d AS (
  SELECT CAST(event_id AS VARCHAR) AS id, props AS properties,
         CASE WHEN event_id % 3 = 0
              THEN strftime(date_trunc('second', ts), '%Y-%m-%dT%H:%M:%SZ')
              ELSE CAST(epoch_ms(ts) AS VARCHAR) END AS hs_timestamp,
         CAST(user_id AS VARCHAR) AS owner_id
  FROM events)
SELECT id, properties,
       json_extract_string(CASE WHEN json_valid(properties)
                           THEN properties END, '$.k') AS k_value,
       coalesce(try_strptime(hs_timestamp, '%Y-%m-%dT%H:%M:%S.%gZ'),
                try_strptime(hs_timestamp, '%Y-%m-%dT%H:%M:%SZ'),
                epoch_ms(TRY_CAST(hs_timestamp AS BIGINT))) AS activity_date,
       owner_id, FALSE AS archived,
       TIMESTAMP '{EMITTED_AT}' AS emitted_at, '{EMITTED_ID}' AS emitted_id
FROM d
"""


QUERIES: dict[str, QuerySpec] = {
    "rest_paginated_scan": QuerySpec(_rest_paginated_scan, _REST_SCAN_SQL),
    "append_load": QuerySpec(_append_load, _APPEND_SQL),
    "project_select": QuerySpec(_project_select, _PROJECT_SQL),
    "project_rename": QuerySpec(_project_rename, _RENAME_SQL),
    "filter_gt_cursor": QuerySpec(_filter_gt_cursor, _CURSOR_SQL),
    "null_literal_normalize": QuerySpec(_null_normalize, _NULL_NORM_SQL),
    "max_cursor": QuerySpec(_max_cursor, _MAX_CURSOR_SQL),
    "data_quality_checks": QuerySpec(_dq_checks, _DQ_SQL),
    "timezone_shift_truncate": QuerySpec(_tz_and_trunc, _TZ_SQL),
    "csv_membership_append": QuerySpec(_csv_ops, _CSV_SQL),
    "pipeline_engagement": QuerySpec(_pipeline_engagement, _ENGAGEMENT_SQL),
}
