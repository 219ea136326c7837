"""Analytics batch 22 — engagement, fulfillment and duplication-shape
keys:

- ``rolling_7d_active_users``: per observed activity day — exact DAU,
  exact 7-day WAU (distinct users over the trailing window), and the
  DAU/WAU stickiness permille.  The sliding distinct runs as a
  day-grain range join: (day, user) grain × the observed-day grid,
  so work is 7·|user-days|, never events².
- ``dup_cluster_size_distribution``: the SHAPE of exact duplication —
  per md5-cluster size: cluster count, doc count, and each size's
  share of the corpus in permille.  The answer to "is duplication a
  few huge boilerplate clusters or a long tail of near-singletons",
  which decides dedup strategy before any pass runs.
- ``order_latency_by_priority``: per order priority, exact
  p50/p90/p99 of the order→ship lag in days (epoch-day arithmetic —
  never the engines' divergent date functions; the shared rank-rule
  quantile machinery).
- ``weekday_hour_activity_heatmap``: the 7×24 activity grid —
  event count per (weekday, hour) plus each hour's share of its
  weekday in permille; weekday is epoch-day mod 7 (the seasonal
  keys' discipline: engine dayofweek() conventions differ).
- ``supplier_return_rate_wilson``: per-supplier returned-line share
  with a 95% Wilson interval — counts are exact integers; the
  interval reuses THE shared fixed-order Wilson expression generator
  (`analytics7.wilson_bounds_sql`), so the IEEE chain is
  bit-identical across keys and engines.

Reference parity: the reference pipeline (main.py:13-54) has no
engagement or fulfillment analytics — scale-out extensions in the
same spirit as batches 5-21.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.analytics7 import wilson_bounds_sql
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)

_US_PER_DAY = 86_400_000_000

# --- rolling_7d_active_users ----------------------------------------------------

_ROLL_WINDOW_DAYS = 7


def _rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-day actives per observed day.

    (day, user) grain ← one distinct over the stream; the trailing
    window is a bounded range join of that grain against the observed
    -day grid (≤ 7 grid rows per user-day — linear, and the grid is
    calendar-bounded at any scale).  Day = epoch-day of the event
    timestamp (integer floor-div of epoch micros — identical on both
    engines for post-1970 data; NULL timestamps filtered at the
    source, rule 11/20).
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("day"),
            "user_id",
        )
    )
    day_user = ev.distinct().localCheckpoint(
        eager=False
    )  # feeds the grid, the DAU agg AND the range join
    grid = day_user.select("day").distinct()
    dau = day_user.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = (
        day_user.select(F.col("day").alias("aday"), "user_id")
        .join(
            F.broadcast(grid),
            (F.col("aday") <= F.col("day"))
            & (F.col("aday") > F.col("day") - _ROLL_WINDOW_DAYS),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau_7d",
            F.expr("CAST(dau * 1000 div wau_7d AS BIGINT)").alias(
                "stickiness_permille"
            ),
        )
        .orderBy("day")
    )


_ROLLING_SQL = f"""
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // {_US_PER_DAY} AS day, user_id
  FROM events WHERE ts IS NOT NULL),
grid AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
wau AS (
  SELECT g.day, count(DISTINCT du.user_id) AS wau_7d
  FROM grid g JOIN du
    ON du.day <= g.day AND du.day > g.day - {_ROLL_WINDOW_DAYS}
  GROUP BY 1)
SELECT day, CAST(dau AS BIGINT) AS dau, CAST(wau_7d AS BIGINT) AS wau_7d,
       CAST(dau * 1000 // wau_7d AS BIGINT) AS stickiness_permille
FROM dau JOIN wau USING (day) ORDER BY day
"""


# --- dup_cluster_size_distribution -----------------------------------------------


def _dup_cluster_size_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram of exact-duplicate cluster sizes.

    Two keyed aggregates (digest → size, size → counts); the shuffle
    carries 32-byte digests, never texts.  share = docs at that
    cluster size per 1000 corpus docs (exact integer division; the
    corpus total is the digest-grain sum, so NULL-text docs are
    excluded identically on both engines).
    """
    clusters = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy(F.md5("text").alias("k"))
        .agg(F.count(F.lit(1)).alias("sz"))
        .localCheckpoint(eager=False)  # feeds the histogram AND the total
    )
    total = clusters.agg(F.sum("sz").alias("n_docs_total"))
    return (
        clusters.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("sz").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).alias("n_docs"),
            F.expr(
                "CAST(sz * n_clusters * 1000 div n_docs_total AS BIGINT)"
            ).alias("doc_share_permille"),
        )
        .orderBy("cluster_size")
    )


_DUP_DIST_SQL = """
WITH c AS (
  SELECT md5(text) AS k, count(*) AS sz FROM documents
  WHERE text IS NOT NULL GROUP BY 1),
t AS (SELECT sum(sz) AS n_docs_total FROM c)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs,
       CAST(sz * count(*) * 1000 // n_docs_total AS BIGINT)
         AS doc_share_permille
FROM c CROSS JOIN t GROUP BY sz, n_docs_total ORDER BY cluster_size
"""


# --- order_latency_by_priority ----------------------------------------------------


def _order_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order→ship lag quantiles per priority.

    Lag in whole days via epoch-day floor-div on both engines; one
    orderkey-keyed join (AQE co-partitions), then the shared
    cum-histogram rank rule on the (priority, lag) grain.  NULL dates
    are filtered at the source on both engines.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate").isNotNull())
        .select(
            "l_orderkey",
            F.expr(f"unix_micros(l_shipdate) div {_US_PER_DAY}").alias(
                "ship_day"
            ),
        )
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr(f"unix_micros(o_orderdate) div {_US_PER_DAY}").alias(
                "order_day"
            ),
        )
    )
    lags = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        (F.col("ship_day") - F.col("order_day")).alias("lag_days"),
    )
    grain = lags.groupBy("o_orderpriority", "lag_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    hist = cumulative_value_histogram(
        grain, "lag_days", partition_cols=("o_orderpriority",)
    )
    return (
        hist.groupBy("o_orderpriority")
        .agg(
            F.sum("c").cast("long").alias("n_lines"),
            rank_rule_pct(50, "lag_days").alias("p50_days"),
            rank_rule_pct(90, "lag_days").alias("p90_days"),
            rank_rule_pct(99, "lag_days").alias("p99_days"),
        )
        .orderBy("o_orderpriority")
    )


_ORDER_LATENCY_SQL = f"""
WITH li AS (
  SELECT l_orderkey, epoch_us(l_shipdate) // {_US_PER_DAY} AS ship_day
  FROM lineitem WHERE l_shipdate IS NOT NULL),
o AS (
  SELECT o_orderkey, o_orderpriority,
         epoch_us(o_orderdate) // {_US_PER_DAY} AS order_day
  FROM orders WHERE o_orderdate IS NOT NULL),
lags AS (
  SELECT o_orderpriority, ship_day - order_day AS lag_days
  FROM li JOIN o ON l_orderkey = o_orderkey),
grain AS (SELECT o_orderpriority, lag_days, count(*) AS c
          FROM lags GROUP BY 1, 2),
h AS (
  SELECT o_orderpriority, lag_days, c,
         sum(c) OVER (PARTITION BY o_orderpriority ORDER BY lag_days
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY o_orderpriority) AS total
  FROM grain)
SELECT o_orderpriority, CAST(sum(c) AS BIGINT) AS n_lines,
       CAST(min(CASE WHEN cum * 100 >= 50 * total THEN lag_days END)
            AS BIGINT) AS p50_days,
       CAST(min(CASE WHEN cum * 100 >= 90 * total THEN lag_days END)
            AS BIGINT) AS p90_days,
       CAST(min(CASE WHEN cum * 100 >= 99 * total THEN lag_days END)
            AS BIGINT) AS p99_days
FROM h GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- weekday_hour_activity_heatmap ------------------------------------------------


def _weekday_hour_activity_heatmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """7×24 event-count grid with within-weekday hour shares.

    weekday = epoch-day mod 7 (0 = Thursday, the 1970-01-01 anchor —
    the seasonal keys' convention; engine dayofweek() conventions
    differ, integer arithmetic doesn't), hour = epoch-hours mod 24
    (UTC).  One aggregate over the stream + one window over the ≤168
    grid rows.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    grid = ev.groupBy(
        F.expr(f"(unix_micros(ts) div {_US_PER_DAY}) % 7").alias("weekday"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hour_utc"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return grid.select(
        "weekday",
        "hour_utc",
        "n_events",
        F.expr(
            "CAST(n_events * 1000 div sum(n_events)"
            " OVER (PARTITION BY weekday) AS BIGINT)"
        ).alias("weekday_share_permille"),
    ).orderBy("weekday", "hour_utc")


_HEATMAP_SQL = f"""
WITH g AS (
  SELECT (epoch_us(ts) // {_US_PER_DAY}) % 7 AS weekday,
         (epoch_us(ts) // 3600000000) % 24 AS hour_utc,
         count(*) AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
SELECT CAST(weekday AS BIGINT) AS weekday,
       CAST(hour_utc AS BIGINT) AS hour_utc,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events * 1000 // sum(n_events) OVER (PARTITION BY weekday)
            AS BIGINT) AS weekday_share_permille
FROM g ORDER BY weekday, hour_utc
"""


# --- supplier_return_rate_wilson ----------------------------------------------------


def _supplier_return_rate_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-supplier returned-line rate with a 95% Wilson interval.

    One lineitem aggregate on suppkey (map-side combinable); supplier
    is a dimension, so the name join broadcasts.  The interval is the
    SAME fixed-order expression text on both engines (shared
    generator) — bit-identical doubles, no rounding slop.  Output is
    supplier-ordered: no float ordering anywhere.
    """
    li = load(spark, sf_dir, "lineitem").groupBy("l_suppkey").agg(
        F.coalesce(
            F.sum(F.when(F.col("l_returnflag") == "R", 1)), F.lit(0)
        ).alias("k"),
        F.count(F.lit(1)).alias("n"),
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = wilson_bounds_sql("k", "n")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            "k",
            "n",
            F.expr(w["rate"]).alias("return_rate"),
            F.expr(w["lo"]).alias("wilson_lo"),
            F.expr(w["hi"]).alias("wilson_hi"),
        )
        .orderBy("s_suppkey")
    )


def _supplier_wilson_sql() -> str:
    w = wilson_bounds_sql("k", "n")
    return f"""
WITH agg AS (
  SELECT l_suppkey,
         CAST(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN 1 END), 0)
              AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1)
SELECT s_suppkey, s_name, k, n,
       {w["rate"]} AS return_rate,
       {w["lo"]} AS wilson_lo,
       {w["hi"]} AS wilson_hi
FROM agg JOIN supplier ON l_suppkey = s_suppkey
ORDER BY s_suppkey
"""


QUERIES: dict[str, QuerySpec] = {
    "rolling_7d_active_users": QuerySpec(
        _rolling_7d_active_users, _ROLLING_SQL
    ),
    "dup_cluster_size_distribution": QuerySpec(
        _dup_cluster_size_distribution, _DUP_DIST_SQL
    ),
    "order_latency_by_priority": QuerySpec(
        _order_latency_by_priority, _ORDER_LATENCY_SQL
    ),
    "weekday_hour_activity_heatmap": QuerySpec(
        _weekday_hour_activity_heatmap, _HEATMAP_SQL
    ),
    "supplier_return_rate_wilson": QuerySpec(
        _supplier_return_rate_wilson, _supplier_wilson_sql()
    ),
}
