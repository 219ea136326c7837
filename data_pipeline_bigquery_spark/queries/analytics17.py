"""Analytics batch 17 — pipeline-operations and forecasting keys:

- ``ewma_trend_forecast``: trend-corrected exponential smoothing per
  user — level = exact dyadic EWMA of daily purchase cents, trend =
  the same EWMA over day-over-day deltas, 7-step forecast =
  level + 7·trend.  Complements ``croston_intermittent_forecast``
  (rate of sparse demand) with the trending-demand forecaster; both
  ride the ONE ``_shift_sum`` closed form (α=½, 30-term truncation,
  int64 bit-shifts — bit-identical across engines, envelope
  documented in PERFORMANCE.md r7-s3).
- ``freshness_sla_audit``: per-event-type data freshness — last event
  timestamp, lag in whole minutes behind the freshest feed, SLA
  breach flag.  The first page of any ingest dashboard.
- ``missing_date_backfill_ranges``: the backfill PLANNER — per user,
  contiguous runs of days with no purchase between that user's first
  and last active day, as (start, end, n_days) ranges (lead-window
  islands, no calendar explode).  ``gapfill_daily_events`` fills
  gaps; this one emits the work list a backfill scheduler consumes.
- ``functional_dependency_audit``: schema-inference audit — for four
  candidate functional dependencies, how many determinant values map
  to >1 dependent value (the FD violation count that separates real
  keys from coincidental ones before you trust a MERGE key).
- ``copurchase_degree_distribution``: degree histogram of the
  part co-purchase graph (distinct in-basket partners per part,
  bucketed) — the connectivity profile that says whether
  covisitation-style recommenders have signal to work with.

Reference parity: the reference pipeline (main.py:13-54) has no
forecasting/operations layer — scale-out extensions in the same
spirit as batches 5-16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.analytics12 import (
    _shift_sum,
    demand_day_arrays,
    demand_day_ctes,
    shift_sum_sql,
)


# --- ewma_trend_forecast ------------------------------------------------------


def _ewma_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user level+trend forecast from daily purchase cents.

    Same (user, day) grain and array preparation as Croston; the
    trend EWMA runs over consecutive-day deltas (needs ≥2 active
    days).  ``forecast7 = (level30 + 7·trend30) / 2³⁰`` is ONE exact
    dyadic scaling of an int64 — the division by a power of two is
    IEEE-exact, so the double is engine-identical.

    Series preparation is the shared
    :func:`analytics12.demand_day_arrays` (ONE implementation with
    Croston on both engines); arrays are ≤30 elements by construction.
    """
    per_user = demand_day_arrays(spark, sf_dir)
    prepared = per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_days"),
        F.expr(
            "slice(transform(arr, x -> x.cents),"
            " greatest(1, size(arr) - 29), 30)"
        ).alias("z_arr"),
        # day-over-day deltas (len = n_days − 1), last ≤30
        F.when(
            F.size("arr") >= 2,
            F.expr(
                "slice(transform(sequence(2, size(arr)), i ->"
                " element_at(arr, i).cents - element_at(arr, i - 1).cents),"
                " greatest(1, size(arr) - 30), 30)"
            ),
        ).alias("dz_arr"),
    )
    lvl = F.expr(_shift_sum("z_arr"))
    trd = F.expr(_shift_sum("dz_arr"))
    return prepared.select(
        "user_id",
        "n_days",
        lvl.alias("level30"),
        trd.alias("trend30"),
        F.when(
            F.col("n_days") >= 2,
            (lvl + F.lit(7) * trd).cast("double") / F.lit(1073741824.0),
        ).alias("forecast7"),
    ).orderBy("user_id")


def _ewma_trend_sql() -> str:
    ss = shift_sum_sql
    return f"""
WITH {demand_day_ctes()},
prepared AS (
  SELECT user_id,
         CAST(len(sizes) AS BIGINT) AS n_days,
         sizes[greatest(1, len(sizes) - 29) : len(sizes)] AS z_arr,
         CASE WHEN len(sizes) >= 2 THEN
           ([sizes[i] - sizes[i - 1]
             for i in generate_series(2, len(sizes))]
            )[greatest(1, len(sizes) - 30) : len(sizes) - 1]
         END AS dz_arr
  FROM per_user)
SELECT user_id, n_days,
       {ss("z_arr")} AS level30,
       {ss("dz_arr")} AS trend30,
       CASE WHEN n_days >= 2 THEN
         CAST({ss("z_arr")} + 7 * {ss("dz_arr")} AS DOUBLE) / 1073741824.0
       END AS forecast7
FROM prepared ORDER BY user_id
"""


# --- freshness_sla_audit ------------------------------------------------------

_SLA_MINUTES = 60


def _freshness_sla_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type freshness lag behind the freshest feed, in whole
    minutes (exact integer micros → floor division; no float seconds
    anywhere).  The 1-row global max broadcasts into the ~type-count
    aggregate."""
    events = load(spark, sf_dir, "events")
    gmax = events.agg(F.max("ts").alias("global_max"))
    per = events.groupBy("event_type").agg(F.max("ts").alias("last_ts"))
    return (
        per.crossJoin(F.broadcast(gmax))
        .select(
            "event_type",
            "last_ts",
            F.expr(
                "CAST((unix_micros(global_max) - unix_micros(last_ts))"
                " div 60000000 AS BIGINT)"
            ).alias("lag_minutes"),
        )
        .withColumn("sla_breach", F.col("lag_minutes") > _SLA_MINUTES)
        .orderBy("event_type")
    )


_FRESHNESS_SQL = f"""
WITH g AS (SELECT max(ts) AS global_max FROM events),
per AS (SELECT event_type, max(ts) AS last_ts FROM events GROUP BY 1)
SELECT event_type, last_ts,
       CAST((epoch_us(global_max) - epoch_us(last_ts)) // 60000000
            AS BIGINT) AS lag_minutes,
       (epoch_us(global_max) - epoch_us(last_ts)) // 60000000
         > {_SLA_MINUTES} AS sla_breach
FROM per CROSS JOIN g ORDER BY event_type
"""


# --- missing_date_backfill_ranges ---------------------------------------------

_MIN_GAP_DAYS = 3


def _missing_date_backfill_ranges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user missing-day ranges via the lead-window islands trick —
    no calendar explode: each active day looks at the NEXT active day
    in its user partition, and a jump of more than ``_MIN_GAP_DAYS``
    becomes one backfill range row.  Work is proportional to active
    (user, day) rows at any scale."""
    events = load(spark, sf_dir, "events")
    days = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    return (
        days.withColumn("nxt", F.lead("d").over(w))
        .filter(F.datediff("nxt", "d") > _MIN_GAP_DAYS + 1)
        .select(
            "user_id",
            F.date_add("d", 1).alias("gap_start"),
            F.date_add("nxt", -1).alias("gap_end"),
            (F.datediff("nxt", "d") - 1).cast("long").alias("n_days_missing"),
        )
        .orderBy("user_id", "gap_start")
    )


_BACKFILL_SQL = f"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'),
led AS (
  SELECT user_id, d,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nxt
  FROM days)
SELECT user_id,
       d + 1 AS gap_start,
       nxt - 1 AS gap_end,
       CAST(nxt - d - 1 AS BIGINT) AS n_days_missing
FROM led
WHERE nxt - d > {_MIN_GAP_DAYS + 1}
ORDER BY user_id, gap_start
"""


# --- functional_dependency_audit ----------------------------------------------

# (label, table, determinant, dependent) — candidate FDs an inference
# tool would propose from names/shapes; the audit says which hold
_FDS = (
    ("orders: o_custkey -> o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem: l_orderkey -> l_linestatus", "lineitem", "l_orderkey", "l_linestatus"),
    ("lineitem: l_partkey -> l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("customer: c_nationkey -> c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
)


def _functional_dependency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Violation counts for each candidate FD: one determinant-keyed
    aggregate per FD (distinct-dependent count > 1 ⇒ violating
    determinant), union of 4 one-row results."""
    out = None
    for label, table, det, dep in _FDS:
        per_det = (
            load(spark, sf_dir, table)
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("nd"))
        )
        row = per_det.agg(
            F.lit(label).alias("fd"),
            F.count(F.lit(1)).alias("n_determinants"),
            F.coalesce(
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("n_violating"),
        ).select(
            "fd",
            "n_determinants",
            "n_violating",
            # rule-9 guard: an empty source table zeroes the denominator
            F.expr(
                "CAST(n_violating * 1000"
                " div nullif(n_determinants, 0) AS BIGINT)"
            ).alias("violation_permille"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fd")


def _fd_sql() -> str:
    parts = []
    for label, table, det, dep in _FDS:
        parts.append(
            f"""
SELECT '{label}' AS fd,
       CAST(count(*) AS BIGINT) AS n_determinants,
       CAST(count(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating,
       CAST(count(*) FILTER (WHERE nd > 1) * 1000
            // nullif(count(*), 0) AS BIGINT)
         AS violation_permille
FROM (SELECT {det}, count(DISTINCT {dep}) AS nd FROM {table} GROUP BY 1)"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY fd"


# --- copurchase_degree_distribution -------------------------------------------


def _copurchase_degree_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distinct in-basket partners per part, bucketed by CONNECTIVITY
    PERMILLE (degree ÷ possible partners) — a density measure that
    keeps the histogram comparable across corpus sizes, where absolute
    degree buckets would saturate as the graph grows.

    Pair generation is the in-basket transform (groupBy the order,
    emit partners from the sorted basket array — the covisitation/LSH
    discipline, bounded by basket size, never corpus²); parts whose
    orders are all single-part land in the '000' bucket via the left
    join against the part inventory; the 1-row inventory count
    broadcasts."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # three consumers (pairs, inventory, inventory count) — cut lineage
    # so lineitem is scanned ONCE (the rule-14 multi-branch discipline)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        baskets.filter(F.size("parts") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, x ->"
                    " transform(filter(parts, y -> y != x),"
                    " y -> struct(x AS part, y AS partner))))"
                )
            ).alias("p")
        )
        .select("p.part", "p.partner")
        .distinct()
    )
    deg = pairs.groupBy("part").agg(F.count(F.lit(1)).alias("degree"))
    # inventory derives from the SAME basket aggregate as the pairs, so
    # ReuseExchange serves both branches from one lineitem scan
    inventory = baskets.select(F.explode("parts").alias("part")).distinct()
    n_parts = inventory.agg(F.count(F.lit(1)).alias("n_inventory"))
    bucket = (
        F.when(F.col("pm") == 0, "000")
        .when(F.col("pm") <= 9, "001-009")
        .when(F.col("pm") <= 24, "010-024")
        .when(F.col("pm") <= 49, "025-049")
        .when(F.col("pm") <= 99, "050-099")
        .otherwise("100+")
    )
    return (
        inventory.join(deg, "part", "left")
        .crossJoin(F.broadcast(n_parts))
        .select(
            F.expr(
                "CAST(coalesce(degree, 0) * 1000"
                " div greatest(n_inventory - 1, 1) AS BIGINT)"
            ).alias("pm")
        )
        .select(bucket.alias("connectivity_bucket"))
        .groupBy("connectivity_bucket")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("connectivity_bucket")
    )


_DEGREE_SQL = """
WITH pr AS (
  SELECT DISTINCT a.l_partkey AS part, b.l_partkey AS partner
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey),
deg AS (SELECT part, count(*) AS degree FROM pr GROUP BY 1),
inv AS (SELECT DISTINCT l_partkey AS part FROM lineitem),
n AS (SELECT count(*) AS n_inventory FROM inv),
d2 AS (SELECT CAST(coalesce(degree, 0) * 1000
              // greatest(n_inventory - 1, 1) AS BIGINT) AS pm
       FROM inv LEFT JOIN deg USING (part) CROSS JOIN n)
SELECT CASE WHEN pm = 0 THEN '000'
            WHEN pm <= 9 THEN '001-009'
            WHEN pm <= 24 THEN '010-024'
            WHEN pm <= 49 THEN '025-049'
            WHEN pm <= 99 THEN '050-099'
            ELSE '100+' END AS connectivity_bucket,
       CAST(count(*) AS BIGINT) AS n_parts
FROM d2 GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, QuerySpec] = {
    "ewma_trend_forecast": QuerySpec(_ewma_trend_forecast, _ewma_trend_sql()),
    "freshness_sla_audit": QuerySpec(_freshness_sla_audit, _FRESHNESS_SQL),
    "missing_date_backfill_ranges": QuerySpec(
        _missing_date_backfill_ranges, _BACKFILL_SQL
    ),
    "functional_dependency_audit": QuerySpec(
        _functional_dependency_audit, _fd_sql()
    ),
    "copurchase_degree_distribution": QuerySpec(
        _copurchase_degree_distribution, _DEGREE_SQL
    ),
}
