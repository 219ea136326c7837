"""Coverage batch 2: the remaining SURVEY §2 scan variants, the
delegated-SQL collapse, dict flatten, existence probes, tumbling-window
aggregation, and skew-safe aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.operators.skew import salted_aggregate
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.sources.rest import (
    FakeTransport,
    OffsetFakeTransport,
    RestSource,
)


# --- S3: point lookup --------------------------------------------------------

def _point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 point_lookup (hubspotoop.py:125-138): single-record fetch by
    id — an equality predicate pushed all the way into the parquet
    row-group statistics."""
    return load(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7)


_POINT_SQL = "SELECT * FROM orders WHERE o_orderkey = 7"


# --- S5: batch read by keys --------------------------------------------------

def _batch_read_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 batch_read_by_keys (hubspotoop.py:449-471): hydrate full rows
    for an id list.  The reference chunks ids 100-per-POST with
    sleep(4); here the id set is a broadcast inner join — no chunking,
    no driver loop."""
    orders = load(spark, sf_dir, "orders")
    ids = orders.select("o_orderkey").filter(F.col("o_orderkey") % 113 == 0)
    return orders.join(F.broadcast(ids), "o_orderkey")


_BATCH_KEYS_SQL = "SELECT * FROM orders WHERE o_orderkey % 113 = 0"


# --- S6: archived scan -------------------------------------------------------

def _archived_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 archived_scan (hubspotoop.py:385-414): the archived=true
    source flag as a filter + stamped literal."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate", F.lit(True).alias("archived"))
    )


_ARCHIVED_SQL = """
SELECT o_orderkey, o_orderdate, TRUE AS archived FROM orders WHERE o_orderstatus = 'F'
"""


# --- S7: offset pagination ---------------------------------------------------

def _offset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 offset_paginated_scan (legacy v1 offset/hasMore,
    hubspotoop.py:350-366) through the offset transport.  The transport
    seed is a FIXED key slice, not the whole table — the simulation's
    driver-side collect stays bounded at any SF (the scale path for
    real bulk pulls is S2 ``fetch_to_staging``)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    records = [r.asDict() for r in part.orderBy("p_partkey").collect()]
    src = RestSource(OffsetFakeTransport(records), "https://fake/api/v1/part")
    rows = src.fetch_all_offset(page_size=64)
    return spark.createDataFrame(rows, part.schema)


_OFFSET_SQL = "SELECT * FROM part WHERE p_partkey <= 2000"


# --- S10: date-range report scan --------------------------------------------

def _date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 report_scan_with_date_range (mautic.py:47-70): dateFrom/dateTo
    pushdown ≙ BETWEEN on the scan."""
    return load(spark, sf_dir, "events").filter(
        F.col("ts").between(
            F.lit("2024-01-03").cast("timestamp"), F.lit("2024-01-06").cast("timestamp")
        )
    ).select("event_id", "ts", "event_type", "value")


_DATE_RANGE_SQL = """
SELECT event_id, ts, event_type, value FROM events
WHERE ts BETWEEN TIMESTAMP '2024-01-03' AND TIMESTAMP '2024-01-06'
"""


# --- S11: OR-predicate incremental scan -------------------------------------

def _or_predicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 incremental_or_predicate_scan (mautic.py:260-285): the
    ``orX(date_added >= s, date_modified >= s)`` URL expression as a
    disjunctive filter (still pushed to parquet)."""
    return load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-06-01").cast("timestamp"))
        | (F.col("o_totalprice") >= 400000)
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


_OR_PRED_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-06-01' OR o_totalprice >= 400000
"""


# --- S12: filtered + ordered event scan -------------------------------------

def _event_scan_filtered_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 event_scan_filtered_ordered (mautic.py:291-333): IN-list of
    event types + date floor + ORDER BY + page limit (deterministic via
    unique tie-break)."""
    return (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "purchase", "signup")
            & (F.col("ts") >= F.lit("2024-01-02").cast("timestamp"))
        )
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(500)
        .select("event_id", "ts", "event_type")
    )


_EVENT_SCAN_SQL = """
SELECT event_id, ts, event_type FROM events
WHERE event_type IN ('click','purchase','signup') AND ts >= TIMESTAMP '2024-01-02'
ORDER BY ts, event_id LIMIT 500
"""


# --- S13: delegated SQL scan -------------------------------------------------

def _delegated_sql_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13 delegated_sql_scan (Redash.py:46-78): the reference ships SQL
    to Redash and polls an async job; in the engine the same SQL runs
    in-process — ``spark.sql`` over registered views IS the delegation
    layer, with zero round-trips."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_orders, max(o_orderdate) AS last_order
        FROM orders_v GROUP BY o_custkey
        """
    )


_DELEGATED_SQL = """
SELECT o_custkey, count(*) AS n_orders, max(o_orderdate) AS last_order
FROM orders GROUP BY o_custkey
"""


# --- N4: dict flatten --------------------------------------------------------

def _dict_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4 dict_flatten (traverse_dict, transformation.py:5-15): JSON
    object → one row per (key, value), via a real MapType — the
    schema-free shape the reference walks recursively in python."""
    events = load(spark, sf_dir, "events")
    as_map = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return events.select(
        "event_id", F.explode(as_map).alias("prop_key", "prop_value")
    )


_FLATTEN_SQL = """
-- json_valid guard: malformed props flatten to NOTHING on both engines
-- (Spark's from_json yields a NULL map the explode drops)
WITH j AS (SELECT event_id,
                  CASE WHEN json_valid(props) THEN props END AS props
           FROM events),
k AS (SELECT event_id, props, unnest(json_keys(props)) AS prop_key FROM j)
SELECT event_id, prop_key,
       json_extract_string(props, '$.' || prop_key) AS prop_value
FROM k
"""


# --- A8: existence / field-usage probe --------------------------------------

def _exists_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 exists_count (check_field_usage, hubspotoop.py:286-318):
    total matching count + boolean in-use probe in one aggregate."""
    events = load(spark, sf_dir, "events")
    # try_cast: a non-numeric (or malformed-JSON) k is "not in use",
    # not an ANSI cast crash — TRY_CAST on the oracle side identically
    pred = F.get_json_object("props", "$.k").try_cast("long") > 50
    return events.agg(
        F.count(F.when(pred, 1)).alias("n_matching"),
        (F.count(F.when(pred, 1)) > 0).alias("field_in_use"),
    )


_EXISTS_SQL = """
SELECT count(*) FILTER (WHERE TRY_CAST(json_extract_string(
           CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT) > 50)
         AS n_matching,
       count(*) FILTER (WHERE TRY_CAST(json_extract_string(
           CASE WHEN json_valid(props) THEN props END, '$.k') AS BIGINT) > 50) > 0
         AS field_in_use
FROM events
"""


# --- ST5: tumbling-window aggregation ---------------------------------------

def _windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 windowed pulls formalized: tumbling 1-day event-time windows
    (``F.window`` — the same operator the streaming variant uses with a
    watermark).  Sums go through DECIMAL for engine-stable totals."""
    events = load(spark, sf_dir, "events")
    win = F.window("ts", "1 day")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_WINDOWED_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2, 3
"""


# --- skew: salted two-phase aggregation -------------------------------------

def _skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — result-identical to a plain
    groupBy (the oracle IS the plain groupBy), but the hot key's
    reduction spreads over 16 reducers.  Decimal sums make the
    partial/final split bit-stable."""
    events = load(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        events,
        keys=["event_type"],
        sums={"value_dec": "total_value"},
        count_alias="n_events",
        salt_unique_col="event_id",
    )
    return out.select(
        "event_type", F.col("total_value").cast("double").alias("total_value"), "n_events"
    )


_SALTED_SQL = """
SELECT event_type, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- S16: runtime schema discovery → allow-list projection -------------------

def _schema_discovery_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §1.3 mechanism 3 (hubspotoop.py:265-271,
    properties.py:16-20): the SOURCE declares its property list at scan
    time; the projection allow-list is that discovery result, not a
    hard-coded schema.  Here the source has drifted both ways — the
    records still carry ``c_nationkey``/``c_mktsegment`` (no longer
    declared → dropped) and declare ``loyalty_tier`` (not yet in the
    records → typed null).  The seeding collect is a fixed 500-key
    slice, bounded at any SF."""
    from data_pipeline_bigquery_spark.sources.rest import project_discovered

    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 500)
    records = [r.asDict() for r in cust.orderBy("c_custkey").collect()]
    src = RestSource(
        FakeTransport(
            records,
            page_size=97,
            properties=["c_custkey", "c_name", "c_acctbal", "loyalty_tier"],
        ),
        "https://fake/api/customer",
    )
    discovered = src.discover_properties()
    return project_discovered(src.to_dataframe(spark, cust.schema), discovered)


_DISCOVERY_SQL = """
SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS loyalty_tier
FROM customer WHERE c_custkey <= 500
"""


QUERIES: dict[str, QuerySpec] = {
    "point_lookup": QuerySpec(_point_lookup, _POINT_SQL),
    "batch_read_by_keys": QuerySpec(_batch_read_by_keys, _BATCH_KEYS_SQL),
    "archived_scan": QuerySpec(_archived_scan, _ARCHIVED_SQL),
    "offset_paginated_scan": QuerySpec(_offset_scan, _OFFSET_SQL),
    "report_scan_date_range": QuerySpec(_date_range_scan, _DATE_RANGE_SQL),
    "incremental_or_predicate_scan": QuerySpec(_or_predicate_scan, _OR_PRED_SQL),
    "event_scan_filtered_ordered": QuerySpec(_event_scan_filtered_ordered, _EVENT_SCAN_SQL),
    "delegated_sql_scan": QuerySpec(_delegated_sql_scan, _DELEGATED_SQL),
    "dict_flatten": QuerySpec(_dict_flatten, _FLATTEN_SQL),
    "exists_count": QuerySpec(_exists_count, _EXISTS_SQL),
    "windowed_event_counts": QuerySpec(_windowed_event_counts, _WINDOWED_SQL),
    "skew_salted_agg": QuerySpec(_skew_salted_agg, _SALTED_SQL),
    "schema_discovery_projection": QuerySpec(_schema_discovery_projection, _DISCOVERY_SQL),
}
