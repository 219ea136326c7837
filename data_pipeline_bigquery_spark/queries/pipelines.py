"""Pipeline-composition queries — the reference's 8 workflows + the
MERGE upsert, each on fixture tables with a DuckDB oracle.

Run metadata is pinned (``EMITTED_AT``/``EMITTED_ID``) so hashes are
reproducible — the reference's ``uuid4()/now()`` stamps are injected
parameters here (SURVEY §7.4 non-determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.operators.merge import merge_upsert
from data_pipeline_bigquery_spark.plans.association import association_edges_plan
from data_pipeline_bigquery_spark.plans.change_log import change_log_plan
from data_pipeline_bigquery_spark.plans.email_read_log import email_read_log_plan
from data_pipeline_bigquery_spark.plans.entity import entity_sync_plan
from data_pipeline_bigquery_spark.plans.reverse_etl import reverse_etl_plan
from data_pipeline_bigquery_spark.queries import QuerySpec

EMITTED_AT = "2026-01-01 00:00:00"
EMITTED_ID = "run-0001"
_EMIT_SQL = f"TIMESTAMP '{EMITTED_AT}' AS emitted_at, '{EMITTED_ID}' AS emitted_id"


# --- K2: merge upsert --------------------------------------------------------

def _merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 merge_upsert: BigQuery MERGE semantics (bigquery.py:245-256).

    Source batch = changed rows (every 10th order: price bumped, cursor
    advanced 30 days) + brand-new rows (keys shifted by 10M).  Changed
    rows must overwrite (cursor differs), unchanged rows are untouched,
    new rows insert.
    """
    orders = load(spark, sf_dir, "orders")
    changed = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    new = (
        orders.filter(F.col("o_orderkey") % 100 == 7)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    source = changed.unionByName(new)
    return merge_upsert(orders, source, pk="o_orderkey", cursor_col="o_orderdate")


_MERGE_SQL = """
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice,
         o_orderdate + INTERVAL 30 DAY AS o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 7
),
j AS (
  SELECT t.o_orderkey AS t_pk, s.o_orderkey AS s_pk,
         (t.o_orderkey IS NULL OR (s.o_orderkey IS NOT NULL
            AND coalesce(t.o_orderdate != s.o_orderdate, FALSE))) AS take_source,
         t.o_orderkey AS t_o_orderkey, t.o_custkey AS t_o_custkey,
         t.o_orderstatus AS t_o_orderstatus, t.o_totalprice AS t_o_totalprice,
         t.o_orderdate AS t_o_orderdate, t.o_orderpriority AS t_o_orderpriority,
         s.o_orderkey AS s_o_orderkey, s.o_custkey AS s_o_custkey,
         s.o_orderstatus AS s_o_orderstatus, s.o_totalprice AS s_o_totalprice,
         s.o_orderdate AS s_o_orderdate, s.o_orderpriority AS s_o_orderpriority
  FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
)
SELECT
  CASE WHEN take_source THEN s_o_orderkey ELSE t_o_orderkey END AS o_orderkey,
  CASE WHEN take_source THEN s_o_custkey ELSE t_o_custkey END AS o_custkey,
  CASE WHEN take_source THEN s_o_orderstatus ELSE t_o_orderstatus END AS o_orderstatus,
  CASE WHEN take_source THEN s_o_totalprice ELSE t_o_totalprice END AS o_totalprice,
  CASE WHEN take_source THEN s_o_orderdate ELSE t_o_orderdate END AS o_orderdate,
  CASE WHEN take_source THEN s_o_orderpriority ELSE t_o_orderpriority END AS o_orderpriority
FROM j
"""


# --- entity sync (companies/contacts/deals pipeline core) --------------------

def _entity_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """companies_pipeline.py:97-136 core: incremental filter → latest-wins
    dedup per entity → run stamping → projection.  Entity = customer,
    state = their latest order."""
    orders = load(spark, sf_dir, "orders")
    return entity_sync_plan(
        orders,
        pk="o_custkey",
        cursor_col="o_orderdate",
        cursor="1995-01-01",
        emitted_at=EMITTED_AT,
        emitted_id=EMITTED_ID,
        columns=["o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
        tiebreak_col="o_orderkey",
    )


_ENTITY_SQL = f"""
WITH inc AS (SELECT * FROM orders WHERE o_orderdate > TIMESTAMP '1995-01-01'),
d AS (SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM inc)
SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate, {_EMIT_SQL}
FROM d WHERE rn = 1
"""


# --- change log (deal-stage history pipeline) --------------------------------

def _change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return change_log_plan(
        events,
        cursor="2024-01-05",
        emitted_at=EMITTED_AT,
        emitted_id=EMITTED_ID,
    )


_CHANGE_LOG_SQL = f"""
WITH f AS (
  SELECT CAST(user_id AS VARCHAR) AS object_id, event_type AS field,
         json_extract_string(props, '$.k') AS updated_value, ts
  FROM events WHERE event_type IN ('purchase', 'signup')),
v AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY object_id ORDER BY ts, updated_value) AS INT) AS version
  FROM f)
SELECT object_id,
       to_json(struct_pack(object_id := object_id, field := field,
                           updated_value := updated_value, version := version)) AS raw,
       field, CAST(version AS BIGINT) AS version, updated_value,
       epoch_ms(ts) AS updated_at_timestamp, ts AS updated_at_date,
       'deal' AS object_type, {_EMIT_SQL}
FROM v WHERE ts > TIMESTAMP '2024-01-05'
"""


# --- association edge pipeline ----------------------------------------------

def _association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hubspot_association_bigquery.py:60-89: distinct edges, md5
    surrogate id, minus already-loaded edges (here: edges seen on
    linenumber-1 rows).

    Both edge set and already-loaded set derive from the SAME table, so
    the anti-join collapses into one aggregation: group by the raw key
    pair, flag pairs that have a linenumber-1 row, keep the unflagged
    ones.  One scan + one exchange instead of two scans + a distinct on
    each side + an anti-join exchange (the prior shape; lineitem is the
    biggest fixture table and was scanned twice).  Against a real lake,
    where ``existing`` is a different table, ``association_edges_plan``
    still takes it and anti-joins on ``association_id``.

    The explicit ``repartition`` on the grouping keys (r14, guide §2)
    plans BOTH HashAggregates post-shuffle: (l_orderkey, l_partkey)
    pairs are ~unique at every SF (≤1 duplicate pair per order), so the
    map-side partial agg never reduces the exchange — it only built a
    600k-key hash table serially on the scan task (single-row-group
    fixture files scan as ONE task; at lake scale the same partial agg
    is equally pure overhead, just parallel).  Shuffled bytes are
    unchanged and REPARTITION_BY_COL stays AQE-coalescable; measured
    interleaved floors 0.99→0.80 s at sf0.1 (7/7 reps faster,
    plans/r14/pipeline_association_edges_{before,after}.txt)."""
    li = load(spark, sf_dir, "lineitem")
    new_pairs = (
        li.selectExpr("l_orderkey", "l_partkey", "l_linenumber")
        .repartition("l_orderkey", "l_partkey")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.expr("max(l_linenumber = 1) AS is_existing"))
        .filter("NOT is_existing")
        .selectExpr("l_orderkey", "l_partkey")
    )
    return association_edges_plan(
        new_pairs,
        existing=None,
        from_col="l_orderkey",
        to_col="l_partkey",
        edge_type="contains",
        emitted_at=EMITTED_AT,
        emitted_id=EMITTED_ID,
        assume_distinct=True,
    )


_ASSOCIATION_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS from_id,
                  CAST(l_partkey AS VARCHAR) AS to_id
  FROM lineitem),
e AS (
  SELECT md5(concat_ws('_', from_id, 'contains', to_id)) AS association_id,
         from_id, to_id, 'contains' AS type
  FROM pairs),
ex AS (
  SELECT DISTINCT md5(concat_ws('_', CAST(l_orderkey AS VARCHAR), 'contains',
                                CAST(l_partkey AS VARCHAR))) AS association_id
  FROM lineitem WHERE l_linenumber = 1)
SELECT association_id, from_id, to_id, type, {_EMIT_SQL}
FROM e WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.association_id = e.association_id)
"""


# --- email read log pipeline -------------------------------------------------

def _email_read_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """email_read_log.py:30-87: drop noise → casts/bool decode → contact_
    prefix → composite key → cursor filter → latest-wins dedup → stamp."""
    events = load(spark, sf_dir, "events")
    # parsed SQL projections (r14, guide §1.2) — identical expression
    # trees to the per-Column builds, ~60 fewer py4j round-trips in the
    # bench's timed region
    report = events.selectExpr(
        "CAST(user_id AS STRING) AS contactId",
        "CAST(event_id % 50 AS STRING) AS email_id",
        "CAST(CAST(FLOOR(value) AS BIGINT) AS STRING) AS hits_str",
        "CASE WHEN event_id % 2 = 1 THEN '1' ELSE '0' END AS is_read_flag",
        "ts AS date_read",
        "concat('u', CAST(user_id AS STRING), '@example.com') AS email",
        "concat('555-', CAST(user_id AS STRING)) AS phone",
        "event_type AS name",
        "props AS source",
        "event_id AS src_event_id",
    )
    out = email_read_log_plan(
        report,
        cursor="2024-01-02",
        emitted_at=EMITTED_AT,
        emitted_id=EMITTED_ID,
        drop_cols=("name", "source"),
        contact_cols=("email", "phone"),
        tiebreak_cols=("src_event_id",),
    )
    return out.selectExpr(
        "event_id", "contactId", "email_id", "contact_email", "contact_phone",
        "hits", "is_read", "date_read", "src_event_id", "emitted_at", "emitted_id",
    )


_EMAIL_LOG_SQL = f"""
WITH report AS (
  SELECT CAST(user_id AS VARCHAR) AS contactId,
         CAST(event_id % 50 AS VARCHAR) AS email_id,
         CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS hits_str,
         CASE WHEN event_id % 2 = 1 THEN '1' ELSE '0' END AS is_read_flag,
         ts AS date_read,
         concat('u', CAST(user_id AS VARCHAR), '@example.com') AS email,
         concat('555-', CAST(user_id AS VARCHAR)) AS phone,
         event_id AS src_event_id
  FROM events),
t AS (
  SELECT concat_ws('_', contactId, email_id) AS event_id, contactId, email_id,
         email AS contact_email, phone AS contact_phone,
         CAST(hits_str AS BIGINT) AS hits, is_read_flag = '1' AS is_read,
         date_read, src_event_id
  FROM report WHERE date_read > TIMESTAMP '2024-01-02'),
d AS (
  SELECT *, row_number() OVER (
      PARTITION BY event_id ORDER BY date_read DESC, src_event_id DESC) AS rn
  FROM t)
SELECT event_id, contactId, email_id, contact_email, contact_phone, hits, is_read,
       date_read, src_event_id, {_EMIT_SQL}
FROM d WHERE rn = 1
"""


# --- reverse ETL composite ---------------------------------------------------

def _reverse_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mautic_hubspot_email_read_activities.py:171-202: enrich join →
    not-logged/not-in-CSV filters → per-contact group-concat → CSV
    append with order-preserving dedup."""
    events = load(spark, sf_dir, "events")
    # parsed SQL projections (r14, guide §1.2) — same trees, fewer RTTs
    read_log = events.selectExpr(
        "CAST(user_id AS STRING) AS contact_id",
        "CAST(event_id % 20 AS STRING) AS email_id",
        "event_type IN ('click', 'view') AS is_logged",
        "concat_ws(',', CAST(user_id % 20 AS STRING),"
        " CAST((user_id + 7) % 20 AS STRING)) AS list_campaigns",
        "event_id AS src_event_id",
    )
    content = (
        events.selectExpr("CAST(event_id % 20 AS STRING) AS email_id")
        .distinct()
        .selectExpr("email_id", "concat('subj_', email_id) AS subject")
    )
    out = reverse_etl_plan(read_log, content)
    return out.selectExpr(
        "contact_id", "email_id", "subject", "is_logged", "list_campaigns",
        "new_list_campaign", "updated_campaigns", "src_event_id",
    )


_REVERSE_ETL_SQL = """
WITH read_log AS (
  SELECT CAST(user_id AS VARCHAR) AS contact_id,
         CAST(event_id % 20 AS VARCHAR) AS email_id,
         event_type IN ('click', 'view') AS is_logged,
         concat_ws(',', CAST(user_id % 20 AS VARCHAR),
                        CAST((user_id + 7) % 20 AS VARCHAR)) AS list_campaigns,
         event_id AS src_event_id
  FROM events),
content AS (
  SELECT DISTINCT CAST(event_id % 20 AS VARCHAR) AS email_id FROM events),
content2 AS (SELECT email_id, concat('subj_', email_id) AS subject FROM content),
pending AS (
  SELECT r.*, c.subject
  FROM read_log r LEFT JOIN content2 c USING (email_id)
  WHERE NOT r.is_logged
    AND NOT coalesce(list_contains(string_split(r.list_campaigns, ','), r.email_id), FALSE)),
g AS (
  SELECT contact_id,
         string_agg(DISTINCT email_id, ',' ORDER BY email_id) AS new_list_campaign
  FROM pending GROUP BY contact_id),
joined AS (SELECT p.*, g.new_list_campaign FROM pending p JOIN g USING (contact_id)),
split3 AS (
  SELECT *, email_id AS e0,
         string_split(list_campaigns, ',')[1] AS c1,
         string_split(list_campaigns, ',')[2] AS c2
  FROM joined)
SELECT contact_id, email_id, subject, is_logged, list_campaigns, new_list_campaign,
       concat(e0,
              CASE WHEN c1 = e0 THEN '' ELSE concat(',', c1) END,
              CASE WHEN c2 = e0 OR c2 = c1 THEN '' ELSE concat(',', c2) END)
         AS updated_campaigns,
       src_event_id
FROM split3
"""


QUERIES: dict[str, QuerySpec] = {
    "merge_upsert": QuerySpec(_merge_upsert, _MERGE_SQL),
    "pipeline_entity_sync": QuerySpec(_entity_sync, _ENTITY_SQL),
    "pipeline_change_log": QuerySpec(_change_log, _CHANGE_LOG_SQL),
    "pipeline_association_edges": QuerySpec(_association, _ASSOCIATION_SQL),
    "pipeline_email_read_log": QuerySpec(_email_read_log, _EMAIL_LOG_SQL),
    "pipeline_reverse_etl": QuerySpec(_reverse_etl, _REVERSE_ETL_SQL),
}
