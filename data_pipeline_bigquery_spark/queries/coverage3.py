"""Coverage batch 3 — analytic operators BEYOND the reference surface.

SURVEY §2 records what the reference lacks: no grouping sets/rollup/cube
(§2.5), no lead/lag or frame specs (§2.6), no intersect (§2.8), no
theta/range/as-of joins (§2.4), no percentiles (§2.10).  A drop-in
replacement engine should still have them — they are table stakes for
the analytics the reference delegates to BigQuery/Redash SQL — so each
is implemented Spark-first here with a DuckDB oracle.

Float outputs route through DECIMAL (or explicit rounding) so the
order-insensitive hash compare is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import (
    ascii_fold,
    ascii_fold_duckdb_sql as _fold,
    has_nonascii,
    has_nonascii_duckdb_sql,
)
from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_seconds
from data_pipeline_bigquery_spark.operators.asof import asof_join
from data_pipeline_bigquery_spark.queries import QuerySpec

_DEC = "decimal(18,2)"


# --- rollup / cube -----------------------------------------------------------

def _rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total in
    one pass — Spark expands grouping sets inside a single hash
    aggregate (partial agg still applies), no self-union needed."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.grouping_id().alias("g"),
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def _cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), F.grouping_id().alias("g")
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS g
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- percentiles -------------------------------------------------------------

def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (nearest-rank, index = floor((n-1)·p)) percentiles per
    group — the selection formula is written out identically on both
    engines because *continuous* interpolation (Spark ``percentile`` vs
    DuckDB ``quantile_cont``) differs in the last float ulp and flips
    cent-rounding at half-cent boundaries.  At lake scale swap in
    ``percentile_approx`` (t-digest: one pass, mergeable partials)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        (F.row_number().over(w) - 1).alias("rn"),
        (F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")) - 1).alias("n1"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.floor(F.col("n1") * p), F.col("l_extendedprice"))
    )
    return ranked.groupBy("l_returnflag").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90")
    )


_PERCENTILE_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
         count(*) OVER (PARTITION BY l_returnflag) - 1 AS n1
  FROM lineitem)
SELECT l_returnflag,
       max(CASE WHEN rn = floor(n1 * 0.5) THEN l_extendedprice END) AS p50,
       max(CASE WHEN rn = floor(n1 * 0.9) THEN l_extendedprice END) AS p90
FROM ranked GROUP BY l_returnflag
"""


# --- pivot -------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event_type matrix via pivot.  Pivot values are declared
    explicitly — at scale an unpinned pivot triggers a distinct scan of
    the pivot column before planning."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double"))
    )


_PIVOT_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       {cols}
FROM events GROUP BY date_trunc('day', ts)
""".format(
    cols=",\n       ".join(
        f"CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = '{t}') AS DOUBLE) AS {t}"
        for t in _EVENT_TYPES
    )
)


# --- intersect ---------------------------------------------------------------

def _intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (absent from the reference, §2.8): customers ordering
    in both 1995 and 1996.  Catalyst plans it as a left-semi aggregate
    join — no full materialization of either side."""
    o = load(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


# --- as-of join --------------------------------------------------------------

def _asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at or before the
    click (union-trick as-of join: one window shuffle, no Python).
    Right side pre-aggregated per (user, ts) so ties are deterministic."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.col("value").cast(_DEC)).cast("double").alias("purchase_value"))
    )
    out = asof_join(clicks, purchases, on="user_id", ts_col="ts", value_cols=["purchase_value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("purchase_ts"),
        F.col("asof_purchase_value").alias("purchase_value"),
    )


_ASOF_SQL = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts,
         CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


# --- range (interval) join ---------------------------------------------------

def _range_join_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders bucketed by a generated month-dimension via an interval
    predicate join.  The dim side is tiny and explicitly broadcast, so
    the theta join is a broadcast nested loop over ~80 rows — the
    pattern for calendar/SLA-window joins at lake scale."""
    months = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(timestamp'1995-01-01', timestamp'2001-08-01', interval 1 month)"
            )
        ).alias("month_start")
    ).withColumn("month_end", F.expr("month_start + interval 1 month"))
    o = load(spark, sf_dir, "orders")
    joined = o.join(
        F.broadcast(months),
        (F.col("o_orderdate") >= F.col("month_start"))
        & (F.col("o_orderdate") < F.col("month_end")),
    )
    return joined.groupBy("month_start").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("revenue"),
    )


_RANGE_JOIN_SQL = """
WITH months AS (
  SELECT unnest(range(TIMESTAMP '1995-01-01', TIMESTAMP '2001-09-01',
                      INTERVAL 1 MONTH)) AS month_start)
SELECT month_start, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN months m
  ON o.o_orderdate >= m.month_start
 AND o.o_orderdate < m.month_start + INTERVAL 1 MONTH
GROUP BY month_start
"""


# --- window frame specs (lead/lag + range frame) -----------------------------

def _window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag and a RANGE frame (rolling 1-hour per-user sum) — frame
    specs the reference never uses (§2.6: 'frame is always the whole
    partition').  Rolling sum keys the range frame on epoch seconds;
    lead/lag order by (ts, event_id) so ties are deterministic."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rng = (
        Window.partitionBy("user_id")
        .orderBy(to_epoch_seconds("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag(F.col("value").cast(_DEC)).over(seq).cast("double").alias("prev_value"),
        F.lead(F.col("value").cast(_DEC)).over(seq).cast("double").alias("next_value"),
        F.sum(F.col("value").cast(_DEC)).over(rng).cast("double").alias("rolling_1h"),
    )


_WINDOW_FRAMES_SQL = """
SELECT event_id, user_id, ts,
       CAST(lag(CAST(value AS DECIMAL(18,2))) OVER seq AS DOUBLE) AS prev_value,
       CAST(lead(CAST(value AS DECIMAL(18,2))) OVER seq AS DOUBLE) AS next_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER
            (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h
FROM events
WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- except all --------------------------------------------------------------

def _except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, preserves multiplicity — the
    reference only has anti-join-style EXCEPT DISTINCT via J3): return
    flags of low-quantity lines beyond their high-quantity usage."""
    li = load(spark, sf_dir, "lineitem")
    lo = li.filter(F.col("l_quantity") <= 10).select("l_returnflag")
    hi = li.filter(F.col("l_quantity") >= 40).select("l_returnflag")
    return lo.exceptAll(hi).groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))


_EXCEPT_ALL_SQL = """
WITH d AS (
  SELECT l_returnflag FROM lineitem WHERE l_quantity <= 10
  EXCEPT ALL
  SELECT l_returnflag FROM lineitem WHERE l_quantity >= 40)
SELECT l_returnflag, count(*) AS n FROM d GROUP BY l_returnflag
"""


# --- histogram ---------------------------------------------------------------

def _price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via identical floor arithmetic on both
    engines (DuckDB has no width_bucket; floor(x/step) in double is
    bit-identical).  One partial-aggregated shuffle of O(buckets)."""
    li = load(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 10000).cast("long")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_HISTOGRAM_SQL = """
SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket, count(*) AS n
FROM lineitem GROUP BY 1
"""


# --- classic analytic shapes (TPC-H Q3 / Q18 analogues) ----------------------

def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: selective dim filter → two joins → grouped revenue →
    top-10.  customer side broadcasts (post-filter it's tiny); lineitem
    never shuffles until the final O(groups) aggregation; orderBy+limit
    plans as TakeOrderedAndProject (no global sort)."""
    cutoff = "1996-01-01"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(_DEC) * (F.lit(1).cast(_DEC) - F.col("l_discount").cast(_DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def _large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a grouped fact, then a semi-join back —
    the aggregation runs FIRST (O(orders) output), and only qualifying
    keys rejoin order metadata.  No row-level fact×fact join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
SELECT o_orderkey, o_custkey, o_orderdate, CAST(total_qty AS DOUBLE) AS total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
"""


def _q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated aggregate decorrelated into a keyed
    pre-aggregation + rejoin — the classic Catalyst rewrite, written
    explicitly.  The threshold compare (qty < 0.2·avg) is restated as
    exact integer-free arithmetic ``qty·5·cnt < sum_qty`` over DECIMAL,
    so no engine's floating avg can flip a boundary row."""
    li = load(spark, sf_dir, "lineitem")
    part_stats = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li.join(part_stats, "l_partkey").filter(
        F.col("l_quantity").cast(_DEC) * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7, 2
        ).alias("avg_yearly")
    )


_Q17_SQL = """
WITH ps AS (
  SELECT l_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7, 2)
         AS avg_yearly
FROM lineitem JOIN ps USING (l_partkey)
WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
"""


def _above_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter (price > global avg): the 1-row aggregate
    broadcasts under every fact row; the avg compare is restated as
    ``price·cnt > sum`` over DECIMAL for engine-exact boundaries."""
    li = load(spark, sf_dir, "lineitem")
    g = li.agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    return (
        li.crossJoin(F.broadcast(g))
        .filter(F.col("l_extendedprice").cast(_DEC) * F.col("c") > F.col("s"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


_ABOVE_AVG_SQL = """
SELECT l_returnflag, count(*) AS n_above_avg
FROM lineitem
CROSS JOIN (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS s, count(*) AS c
            FROM lineitem) g
WHERE CAST(l_extendedprice AS DECIMAL(18,2)) * c > s
GROUP BY l_returnflag
"""


def _grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (Spark 4 ``DataFrame.groupingSets``):
    two independent one-column summaries in a single hash aggregate —
    the general form rollup/cube specialize.  Partial aggregation still
    applies: the expand operator emits one row per set per input row
    map-side, then combines before the single exchange."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
        F.grouping_id().alias("g"),
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       grouping(l_returnflag, l_linestatus) AS g
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


def _events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS trend (events/day slope per event type) from
    integer-exact sufficient statistics: Σx, Σy, Σxy, Σx² are LONG sums
    (aggregation-order-proof, engine-exact), and only the final
    ``(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)`` touches doubles — single IEEE
    ops, bit-portable.  Two hash aggregates, no window, no UDF: the
    sufficient-statistics trick is how grouped model fitting stays
    JVM-side at 100 TB (the naive form is a per-group collect)."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # n_days > 1 guarantees x-variance > 0, so the slope denominator
    # n*sxx - sx*sx is never 0 (Spark non-ANSI /0 -> NULL, DuckDB -> NaN:
    # a single-active-day type would silently hash-mismatch the oracle).
    s = s.filter(F.col("n_days") > 1)
    slope = (
        (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return s.select(
        "event_type",
        "n_days",
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n_days").cast("double")
        ).alias("intercept"),
    )


_EVENTS_TREND_SQL = """
WITH daily AS (
  SELECT event_type,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
         count(*) AS y
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, count(*) AS n_days, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM daily GROUP BY event_type
  HAVING count(*) > 1)
SELECT event_type, n_days,
       CAST(n_days * sxy - sx * sy AS DOUBLE)
         / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n_days * sxy - sx * sy AS DOUBLE)
           / CAST(n_days * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n_days AS DOUBLE) AS intercept
FROM s
"""


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 per-customer order-status history (operators/scd2.py):
    collapse consecutive same-status orders, close intervals with lead.
    Tiebreak on o_orderkey makes the per-key order total — same-date
    orders would otherwise collapse nondeterministically."""
    from data_pipeline_bigquery_spark.operators.scd2 import scd2_collapse

    return scd2_collapse(
        load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0),
        "o_custkey",
        "o_orderdate",
        ["o_orderstatus"],
        tiebreak_col="o_orderkey",
    )


_SCD2_SQL = """
WITH w AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS prev,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders WHERE o_custkey % 10 = 0),
kept AS (
  SELECT * FROM w WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus)
SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM kept
"""


def _q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who alone held up multi-supplier orders):
    the correlated EXISTS + NOT-EXISTS pair decorrelates into ONE
    per-order aggregate (distinct suppliers, distinct LATE suppliers)
    joined back — two shuffles total instead of two correlated scans.
    The oracle deliberately keeps the textbook EXISTS/NOT-EXISTS form:
    same answer from different formulations on different engines.
    Lateness = shipped >90 days after order date (fixture has no
    commit/receipt dates); integer counts make the compare exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAYS")).alias("is_late"),
    )
    ord_stats = flagged.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    return (
        flagged.filter(F.col("is_late"))
        .join(ord_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("l_suppkey").asc())
        .limit(20)
    )


_Q21_SQL = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT l1.l_suppkey, count(*) AS numwait
FROM l l1
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM l l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM l l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY l1.l_suppkey
ORDER BY numwait DESC, l1.l_suppkey LIMIT 20
"""


def _q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: rich-but-DORMANT customers per (name-derived) country
    code — scalar-avg filter (restated as ``bal·cnt > sum`` over DECIMAL
    for an engine-exact boundary), anti-join against recent orders (NOT
    EXISTS; every fixture customer has SOME order, so dormancy = none
    since 2000-01-01), substring grouping.  The 1-row aggregate
    broadcasts; the date filter is pushed into the anti-join's build
    side scan, shrinking it before the shuffle."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr("right(c_name, 2)").alias("cntrycode"),
        "c_acctbal",
    )
    g = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(g))
        .filter(F.col("c_acctbal").cast(_DEC) * F.col("c") > F.col("s"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


_Q22_SQL = """
WITH g AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS c
  FROM customer WHERE c_acctbal > 0)
SELECT right(c_name, 2) AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer CROSS JOIN g
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * c > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY right(c_name, 2)
"""


# --- incremental rollup maintenance (continuous-aggregate IVM) ---------------

def _incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized per-(event_type, day) rollup kept current by partial
    MERGE, not recompute (operators/rollup_maintenance.py): history
    aggregates once, the post-cursor batch aggregates to O(touched
    groups) partials, and the merge shuffles O(groups) rows.  The
    oracle recomputes from scratch over the full table — hash equality
    IS the incremental-view-maintenance correctness proof.  Sums carry
    DECIMAL partials so merge order can't drift the doubles."""
    from data_pipeline_bigquery_spark.operators.rollup_maintenance import (
        merge_rollups,
        partial_rollup,
    )

    cutoff = F.lit("2024-01-05").cast("timestamp")
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.col("value").cast(_DEC).alias("value_dec"),
        "ts",
    )
    keys = ["event_type", "day"]
    sums = {"total_value": F.col("value_dec")}
    hist = partial_rollup(ev.filter(F.col("ts") <= cutoff), keys, sums)
    batch = partial_rollup(ev.filter(F.col("ts") > cutoff), keys, sums)
    maintained = merge_rollups(hist, batch, keys, ["n_rows", "total_value"])
    return maintained.select(
        "event_type",
        "day",
        F.col("n_rows").alias("n_events"),
        F.col("total_value").cast("double").alias("total_value"),
    )


_INCR_ROLLUP_SQL = """
SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


# --- Q4-shape: EXISTS decorrelated to a semi-join ----------------------------

def _q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: priority counts over orders having at least one line
    shipped after the order date.  The correlated EXISTS decorrelates
    to a left-semi join on the order key — the semi side deduplicates
    during the join, so no distinct pass over lineitem."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    shipped_late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        shipped_late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate < TIMESTAMP '1995-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


# --- Q11-shape: HAVING vs a global scalar ------------------------------------

def _q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose revenue exceeds a fraction of TOTAL
    revenue.  The scalar total comes from a broadcast single-row cross
    join over the same aggregated subtree — Catalyst evaluates the agg
    once per side but each is one exchange of O(groups) rows; no
    per-group re-scan like the correlated form implies."""
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(_DEC)).alias("value_dec")
    )
    total = rev.agg(F.sum("value_dec").alias("total_dec"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("total_dec") * 0.001)
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


_Q11_SQL = """
WITH rev AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM rev
WHERE value_dec > (SELECT sum(value_dec) FROM rev) * 0.001
"""


# --- Q2-shape: correlated min decorrelated to min + join-back ----------------

def _q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each part, the supplier(s) charging the minimum
    price.  The correlated ``price = (SELECT min ...)`` subquery
    decorrelates to one grouped min + an equi join back on
    (part, price) — both sides partition on l_partkey, so AQE plans a
    single co-partitioned join; ties (several suppliers at the min)
    are kept, matching the SQL semantics."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    mins = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    ).withColumnRenamed("l_partkey", "mp_partkey")
    return (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("l_partkey", "l_suppkey", "min_price")
        .distinct()
    )


_Q2_SQL = """
SELECT DISTINCT l.l_partkey, l.l_suppkey, l.l_extendedprice AS min_price
FROM lineitem l
WHERE l.l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                           WHERE l2.l_partkey = l.l_partkey)
"""


# --- Q15-shape: view + max scalar --------------------------------------------

def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the top-revenue supplier(s) of a quarter — an
    aggregated revenue view filtered against its own max.  Same
    broadcast-scalar decorrelation as Q11; DECIMAL revenue makes the
    max comparison exact across engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    # sum the exact decimal PRODUCT (scale 4) — re-rounding each term to
    # scale 2 would make the total depend on the engine's rounding mode
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * (F.lit(1.0).cast(_DEC) - F.col("l_discount").cast(_DEC))
        ).alias("rev_dec")
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    sup = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", F.col("rev_dec").cast("double").alias("total_revenue"))
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
"""


# --- Q16-shape: NOT IN + count distinct --------------------------------------

def _q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per part attribute, with a
    NOT-IN exclusion list (here: suppliers in deficit).  NOT IN
    decorrelates to a left-anti join — the exclusion side is tiny and
    broadcasts; count(DISTINCT) expands to the standard two-phase
    grouped distinct."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    kept = li.join(F.broadcast(bad), "l_suppkey", "left_anti")
    return (
        kept.join(part, kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- unpivot (melt) — the inverse of pivot_event_values ----------------------

def _unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``DataFrame.unpivot`` (SQL ``UNPIVOT`` /
    pandas melt): order money columns become (measure, amount) rows.
    Narrow transform — one projection with an expand, no shuffle."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total_price"),
        (F.col("o_totalprice") * 0.1).cast("double").alias("tax_estimate"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["total_price", "tax_estimate"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price,
         CAST(o_totalprice * 0.1 AS DOUBLE) AS tax_estimate
  FROM orders WHERE o_orderkey % 37 = 0)
SELECT o_orderkey, 'total_price' AS measure, total_price AS amount FROM wide
UNION ALL
SELECT o_orderkey, 'tax_estimate' AS measure, tax_estimate AS amount FROM wide
"""


# --- blocked fuzzy match (record linkage) ------------------------------------

_FUZZY_WINDOW = 3  # sorted-neighborhood width


def _fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by SORTED NEIGHBORHOOD: within each nation
    block, names sort once and each row compares against only its next
    ``w`` neighbors (lead window) — one sort shuffle, O(n·w) candidate
    pairs, never the O(block²) self-join square.  Edit-distance-1
    variants of the fixture's 'Customer#000000123' names sort adjacent,
    which is exactly the property sorted-neighborhood exploits; the
    oracle mirrors the same window semantics, so the driver hash checks
    the scalable form, not a quadratic one.

    Distance inputs are ASCII-folded on BOTH engines: Spark's
    levenshtein walks code points, DuckDB's walks UTF-8 BYTES
    (probed: 'café'/'cafe' is 1 vs 2) — folding every non-ASCII
    code point to one '?' makes the two walks identical; exact
    for ASCII names, non-ASCII characters compare as equal.  The
    conflation risk that creates (different non-Latin names folding
    EQUAL, r10 ADVICE) is surfaced per pair as ``fold_ambiguous``:
    1 when the raw names differ and either contains non-ASCII (the
    distance may be understated), 0 otherwise — always 0 on the
    all-ASCII fixtures."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    w = Window.partitionBy("c_nationkey").orderBy("c_name", "c_custkey")
    # window exprs evaluate in their own projection; the explode runs on
    # the materialized lead columns (generators can't host window calls)
    led = c.select(
        "c_custkey",
        "c_name",
        *[F.lead("c_name", i).over(w).alias(f"n{i}") for i in range(1, _FUZZY_WINDOW + 1)],
        *[F.lead("c_custkey", i).over(w).alias(f"k{i}") for i in range(1, _FUZZY_WINDOW + 1)],
    )
    nbrs = F.array(
        *[
            F.struct(F.col(f"n{i}").alias("nbr_name"), F.col(f"k{i}").alias("nbr_key"))
            for i in range(1, _FUZZY_WINDOW + 1)
        ]
    )
    exploded = (
        led.select("c_custkey", "c_name", F.explode(nbrs).alias("nbr"))
        .filter(F.col("nbr.nbr_key").isNotNull())
        .select(
            F.col("c_custkey").alias("cust_a"),
            F.col("nbr.nbr_key").alias("cust_b"),
            F.levenshtein(
                ascii_fold("c_name"), ascii_fold(F.col("nbr.nbr_name"))
            ).alias("name_dist"),
            (
                (F.col("c_name") != F.col("nbr.nbr_name"))
                & (has_nonascii("c_name") | has_nonascii(F.col("nbr.nbr_name")))
            )
            .cast("int")
            .alias("fold_ambiguous"),
        )
    )
    return exploded.filter(F.col("name_dist") <= 1)


_FUZZY_SQL = f"""
WITH nbr AS (
  SELECT c_custkey, c_name, c_nationkey,
         {', '.join(
             f"lead(c_name, {i}) OVER (PARTITION BY c_nationkey ORDER BY c_name, c_custkey) AS n{i}, "
             f"lead(c_custkey, {i}) OVER (PARTITION BY c_nationkey ORDER BY c_name, c_custkey) AS k{i}"
             for i in range(1, _FUZZY_WINDOW + 1)
         )}
  FROM customer),
pairs AS (
  {' UNION ALL '.join(
      f"SELECT c_custkey AS cust_a, k{i} AS cust_b, "
      f"levenshtein({_fold('c_name')}, {_fold(f'n{i}')}) AS name_dist, "
      f"CAST(CASE WHEN c_name <> n{i} AND ({has_nonascii_duckdb_sql('c_name')}"
      f" OR {has_nonascii_duckdb_sql(f'n{i}')}) THEN 1 ELSE 0 END AS INT)"
      f" AS fold_ambiguous "
      f"FROM nbr WHERE k{i} IS NOT NULL"
      for i in range(1, _FUZZY_WINDOW + 1)
  )})
SELECT cust_a, cust_b, name_dist, fold_ambiguous
FROM pairs WHERE name_dist <= 1
"""


# --- time-series gap fill + LOCF ---------------------------------------------

def _gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style ``time_bucket_gapfill``: a sparse per-type daily
    series densified against a per-type generated calendar (sequence +
    explode — no calendar table needed), counts zero-filled and the
    value column carried forward (LOCF) by an ignore-nulls last()
    window.  The calendar explode is O(days·types) — trivial next to
    the fact scan; the LOCF window partitions by type, one shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 97 == 0)
    daily = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast(_DEC).alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("day_value"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    cal = bounds.select(
        "event_type", F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("day")
    )
    joined = cal.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("day_value", ignorenulls=True).over(w).cast("double").alias("locf_value"),
    )


_GAPFILL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,2))) AS day_value
  FROM events WHERE event_id % 97 = 0 GROUP BY 1, 2),
bounds AS (SELECT event_type, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
cal AS (
  SELECT event_type,
         CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds)
SELECT c.event_type, c.day, coalesce(d.n, 0) AS n_events,
       CAST(last_value(d.day_value IGNORE NULLS) OVER (
            PARTITION BY c.event_type ORDER BY c.day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS locf_value
FROM cal c LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
"""


# --- relational division -----------------------------------------------------

def _division_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ('customers with orders in EVERY priority
    class'): the FORALL quantifier becomes count-distinct-equals-total —
    one grouped distinct count per customer checked against the
    broadcast global distinct count.  No double-negated NOT EXISTS
    pair, no self-join."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("n_prio")
    )
    total = orders.agg(F.count_distinct("o_orderpriority").alias("total_prio"))
    return (
        per_cust.crossJoin(F.broadcast(total))
        .filter(F.col("n_prio") == F.col("total_prio"))
        .select("o_custkey", "n_prio")
    )


_DIVISION_SQL = """
SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_prio
FROM orders GROUP BY o_custkey
HAVING count(DISTINCT o_orderpriority)
       = (SELECT count(DISTINCT o_orderpriority) FROM orders)
"""


# --- robust-statistics anomaly flagging (median / MAD) -----------------------

def _anomaly_days_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier days per event type by median absolute deviation — the
    robust quality gate (mean/stddev break under the very outliers you
    hunt).  Two grouped aggregations + broadcast joins; exact
    interpolating percentile on integer counts is engine-portable
    (the (a+b)/2 midpoint of ints is exact in doubles)."""
    ev = load(spark, sf_dir, "events")
    # daily feeds the median probe + deviations, dev feeds the MAD
    # probe + the readout — lineage cuts (rule 14); the pre-cut plan
    # re-scanned events 4×
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med_n")
    )
    dev = (
        daily.join(F.broadcast(med), "event_type")
        .withColumn("abs_dev", F.abs(F.col("n") - F.col("med_n")))
        .localCheckpoint(eager=False)
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs_dev, 0.5)").alias("mad_n")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            F.round("med_n", 6).alias("med_n"),
            F.round("mad_n", 6).alias("mad_n"),
            (F.col("abs_dev") > F.lit(2.0) * F.col("mad_n")).alias("is_anomaly"),
        )
    )


_MAD_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
med AS (SELECT event_type, median(n) AS med_n FROM daily GROUP BY 1),
dev AS (
  SELECT d.event_type, d.day, d.n, m.med_n, abs(d.n - m.med_n) AS abs_dev
  FROM daily d JOIN med m ON d.event_type = m.event_type),
mad AS (SELECT event_type, median(abs_dev) AS mad_n FROM dev GROUP BY 1)
SELECT dev.event_type, dev.day, dev.n,
       round(dev.med_n, 6) AS med_n, round(mad.mad_n, 6) AS mad_n,
       dev.abs_dev > 2.0 * mad.mad_n AS is_anomaly
FROM dev JOIN mad ON dev.event_type = mad.event_type
"""


# --- funnel analysis ---------------------------------------------------------

def _funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first click AFTER signup → first
    purchase AFTER that click, per user; one row of stage counts.  Each
    stage is a type-pruned scan (predicate pushes to parquet) joined on
    user against the previous stage's min timestamp — the ordering
    constraint ('after') lives in the join predicate, so no per-user
    event sorting or collect is ever needed."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # each stage frame feeds the NEXT stage's join AND its own count —
    # lineage cuts (rule 14) halve the type-pruned scans (6 → 3); the
    # per-stage scans themselves stay, they are the pushdown plan
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click_after"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_after"))))
    )


_FUNNEL_SQL = """
WITH s AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN s ON e.user_id = s.user_id AND e.ts > s.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT (SELECT count(*) FROM s) AS n_signup,
       (SELECT count(*) FROM c) AS n_click_after,
       (SELECT count(*) FROM p) AS n_purchase_after
"""


# --- cohort retention matrix -------------------------------------------------

def _cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort × week-offset retention counts.  Cohort and offset use
    integer day arithmetic (days-since-epoch div 7), NOT calendar week
    truncation — ISO-week edge rules differ between engines, integer
    division doesn't.  Two aggregations + one co-keyed join; distinct
    (user, week) pairs keep the count a user-level retention, not an
    event count."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("d"),
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    acts = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            (F.col("first_d") - (F.col("first_d") % 7)).alias("cohort_start"),
            # integer div, not double-div + cast: double->int CAST truncates
            # in Spark but rounds half-even in DuckDB
            F.expr("(d - first_d) div 7").cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return acts.groupBy("cohort_start", "week_offset").agg(
        F.count_distinct("user_id").alias("n_users")
    )


_COHORT_SQL = """
WITH ev AS (
  SELECT user_id, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
  FROM events),
first AS (SELECT user_id, min(d) AS first_d FROM ev GROUP BY user_id),
acts AS (
  SELECT DISTINCT ev.user_id,
         first_d - (first_d % 7) AS cohort_start,
         CAST((d - first_d) // 7 AS INT) AS week_offset
  FROM ev JOIN first ON ev.user_id = first.user_id)
SELECT cohort_start, week_offset, count(DISTINCT user_id) AS n_users
FROM acts GROUP BY 1, 2
"""


def _dedup_time_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed event dedup (double-fire suppression): within each
    ``(user_id, event_type)`` stream, events separated by ≤ 30 min are
    one BURST and only the first survives — the retry/duplicate-webhook
    suppression every event pipeline runs, and a different semantics
    from both exact dedup (no time bound) and sessionization (which
    aggregates rather than suppresses).

    Plan: one window partition per (user, type) — lag for the gap,
    cumulative sum of gap-breaks for the burst id, keep rank 1 per
    burst.  Single exchange keyed on the high-cardinality (user, type)
    pair; integer epoch-second arithmetic so both engines agree
    exactly."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    burst = F.sum(
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    wb = Window.partitionBy("user_id", "event_type", "burst").orderBy(
        "ts", "event_id"
    )
    return (
        ev.withColumn("burst", burst)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "burst")
    )


_DEDUP_TW_SQL = """
WITH g AS (
  SELECT event_id, user_id, event_type, ts,
         epoch(ts) - epoch(lag(ts) OVER w) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
b AS (
  SELECT *,
         sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
  FROM g)
SELECT event_id, user_id, event_type, ts, CAST(burst AS BIGINT) AS burst
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst
                               ORDER BY ts, event_id) AS rn
  FROM b)
WHERE rn = 1
"""


def _pattern_no_intervening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern with a NEGATIVE condition — the MATCH_RECOGNIZE
    shape (``A … B`` with no ``C`` between) relational engines struggle
    to express: users whose first signup is followed by a purchase with
    NO error event in between.  Each stage is a type-pruned scan
    (predicate pushes to parquet); the ordering constraints live in
    join predicates and the negation is one left-anti join against the
    interval — no per-user sort, no UDF, no state machine."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user"), F.col("ts").alias("err_ts")
    )
    clean = pu.join(
        err,
        (F.col("user_id") == F.col("err_user"))
        & (F.col("err_ts") > F.col("signup_ts"))
        & (F.col("err_ts") < F.col("purchase_ts")),
        "left_anti",
    )
    return clean.select("user_id", "signup_ts", "purchase_ts")


_PATTERN_SQL = """
WITH su AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
pu AS (
  SELECT e.user_id, su.signup_ts, min(e.ts) AS purchase_ts
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND e.ts > su.signup_ts
  GROUP BY e.user_id, su.signup_ts)
SELECT user_id, signup_ts, purchase_ts
FROM pu
WHERE NOT EXISTS (
  SELECT 1 FROM events x
  WHERE x.user_id = pu.user_id AND x.event_type = 'error'
    AND x.ts > pu.signup_ts AND x.ts < pu.purchase_ts)
"""


def _clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory-style clamped running balance — ``b_i = max(0,
    b_{i-1} + delta_i)`` per user — WITHOUT the per-key sequential UDF
    folklore says it needs.  The recurrence has a closed form over
    prefix aggregates: ``b_i = cumsum_i - least(0, running_min(cumsum))``
    (subtracting the deepest sub-zero excursion is exactly what the
    clamp discards), so it runs as two stacked window functions in ONE
    exchange keyed on user — Catalyst all the way, no applyInPandas.
    Deltas are integerized (``floor(value*100) - 5000``) so the
    recurrence is exact on both engines; floor (not cast) because
    DuckDB rounds double→int casts while Spark truncates."""
    ev = load(spark, sf_dir, "events")
    delta = (F.floor(F.col("value") * 100).cast("long") - 5000).alias("delta")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("delta").over(w)
    scored = ev.select("event_id", "user_id", "ts", delta).withColumn("cum", cum)
    runmin = F.min("cum").over(w)
    return scored.select(
        "event_id",
        "user_id",
        "delta",
        (F.col("cum") - F.least(F.lit(0), runmin)).alias("balance"),
    )


_CLAMPED_SQL = """
WITH d AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100) AS BIGINT) - 5000 AS delta
  FROM events),
c AS (
  SELECT event_id, user_id, ts, delta,
         sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM d),
r AS (
  SELECT event_id, user_id, delta, cum,
         min(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
  FROM c)
SELECT event_id, user_id, delta,
       CAST(cum - least(0, runmin) AS BIGINT) AS balance
FROM r
"""


def _variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` once per row into the binary VARIANT encoding, then
    typed path extraction (``try_variant_get``) feeding a regular agg.
    VARIANT is the modern engine answer to JSON columns — parsed once,
    queried many times without re-tokenizing the string (the reference
    keeps JSON as strings end to end, SURVEY §2.9).  The string-based
    `get_json_object` path remains in ``nested_field_extract``; this is
    its typed, shreddable successor."""
    ev = load(spark, sf_dir, "events")
    # try_parse_json: malformed props become a NULL variant (and a NULL
    # k) instead of an ANSI parse error — TRY_CAST + json_valid on the
    # oracle side identically
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


_VARIANT_SQL = """
WITH j AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(
             CASE WHEN json_valid(props) THEN props END, '$.k')
           AS BIGINT) AS k
  FROM events)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min, max(k) AS k_max
FROM j GROUP BY event_type ORDER BY event_type
"""


def _event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix —
    for each user's time-ordered stream, count consecutive
    ``(from_type, to_type)`` pairs corpus-wide, with each row's share
    of its from-type's outgoing mass (integer permille, exact `div`).
    The Markov-chain view of the event log: which step usually follows
    which — the input to funnel design and anomaly baselines.

    One lag window per user (single exchange on user_id), then a
    25-cell aggregate; the share denominator derives from the tiny
    transition table itself (window over from_type), not a rescan."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.expr("n * 1000").cast("long").alias("__num"),
        F.sum("n").over(wf).alias("__den"),
    ).select(
        "from_type",
        "to_type",
        "n",
        F.expr("__num div __den").alias("permille_of_from"),
    )


_TRANSITIONS_SQL = """
WITH s AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM s WHERE from_type IS NOT NULL
  GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
         AS permille_of_from
FROM c
"""


def _event_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — THE input for choosing a streaming
    watermark: treating ``event_id`` as arrival order, how many events
    arrive with an event time older than the max already seen, and how
    late (p-of-stream counts + max lateness seconds).  A watermark
    below the observed p99.9 lateness silently drops data;
    one far above it bloats state — this audit is how you pick it.

    One global running-max window (arrival order is a total order, so
    this is the one intentionally-global window, same caveat as the
    deterministic shuffle) and a 1-row aggregate.  The fixture stream
    is perfectly ordered, so the audit asserts the CLEAN state (zero
    late, zero max-lateness) — the same shape as
    `referential_integrity_audit`'s zero orphans; the late-event
    semantics are pinned by unit test with a perturbed stream."""
    ev = load(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seen = F.max("ts").over(w)
    lateness = F.when(
        F.col("ts") < seen, F.unix_timestamp(seen) - F.unix_timestamp("ts")
    ).otherwise(F.lit(0))
    return (
        ev.select(lateness.alias("late_s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("late_s") > 0).cast("long")).alias("n_late"),
            F.max("late_s").alias("max_late_s"),
        )
    )


_LATENESS_SQL = """
WITH s AS (
  SELECT ts,
         max(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
  FROM events)
SELECT count(*) AS n_events,
       CAST(sum(CASE WHEN ts < seen THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(CASE WHEN ts < seen THEN epoch(seen) - epoch(ts) ELSE 0 END) AS BIGINT)
         AS max_late_s
FROM s
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_time_windowed": QuerySpec(_dedup_time_windowed, _DEDUP_TW_SQL),
    "pattern_no_intervening": QuerySpec(_pattern_no_intervening, _PATTERN_SQL),
    "clamped_running_balance": QuerySpec(_clamped_running_balance, _CLAMPED_SQL),
    "variant_json_field_stats": QuerySpec(_variant_json_stats, _VARIANT_SQL),
    "event_type_transitions": QuerySpec(_event_transitions, _TRANSITIONS_SQL),
    "event_lateness_audit": QuerySpec(_event_lateness_audit, _LATENESS_SQL),
    "incremental_rollup_maintenance": QuerySpec(_incremental_rollup, _INCR_ROLLUP_SQL),
    "gapfill_daily_events": QuerySpec(_gapfill_daily, _GAPFILL_SQL),
    "cohort_retention": QuerySpec(_cohort_retention, _COHORT_SQL),
    "funnel_signup_purchase": QuerySpec(_funnel_signup_purchase, _FUNNEL_SQL),
    "division_all_priorities": QuerySpec(_division_all_priorities, _DIVISION_SQL),
    "anomaly_days_mad": QuerySpec(_anomaly_days_mad, _MAD_SQL),
    "unpivot_order_measures": QuerySpec(_unpivot_order_measures, _UNPIVOT_SQL),
    "fuzzy_name_match": QuerySpec(_fuzzy_name_match, _FUZZY_SQL),
    "q4_order_priority_exists": QuerySpec(_q4_order_priority, _Q4_SQL),
    "q11_important_part_value": QuerySpec(_q11_important_parts, _Q11_SQL),
    "q2_min_price_supplier": QuerySpec(_q2_min_price_supplier, _Q2_SQL),
    "q15_top_supplier": QuerySpec(_q15_top_supplier, _Q15_SQL),
    "q16_supplier_cnt_excluding": QuerySpec(_q16_supplier_counts, _Q16_SQL),
    "scd2_order_status_history": QuerySpec(_scd2_history, _SCD2_SQL),
    "grouping_sets_pricing": QuerySpec(_grouping_sets_pricing, _GROUPING_SETS_SQL),
    "events_trend_by_type": QuerySpec(_events_trend, _EVENTS_TREND_SQL),
    "q21_waiting_supplier": QuerySpec(_q21_waiting_supplier, _Q21_SQL),
    "q22_global_sales_opportunity": QuerySpec(
        _q22_global_sales_opportunity, _Q22_SQL
    ),
    "q17_small_quantity_revenue": QuerySpec(_q17_small_quantity, _Q17_SQL),
    "scalar_subquery_above_avg": QuerySpec(_above_avg_price, _ABOVE_AVG_SQL),
    "shipping_priority_topk": QuerySpec(_shipping_priority, _SHIPPING_PRIORITY_SQL),
    "large_orders_having": QuerySpec(_large_orders, _LARGE_ORDERS_SQL),
    "rollup_pricing": QuerySpec(_rollup_pricing, _ROLLUP_SQL),
    "except_all_returnflags": QuerySpec(_except_all_lineitems, _EXCEPT_ALL_SQL),
    "price_histogram": QuerySpec(_price_histogram, _HISTOGRAM_SQL),
    "cube_orders": QuerySpec(_cube_orders, _CUBE_SQL),
    "percentiles_by_group": QuerySpec(_percentiles, _PERCENTILE_SQL),
    "pivot_event_values": QuerySpec(_pivot_events, _PIVOT_SQL),
    "intersect_repeat_customers": QuerySpec(_intersect_repeat_customers, _INTERSECT_SQL),
    "asof_join_click_purchase": QuerySpec(_asof_click_purchase, _ASOF_SQL),
    "range_join_months": QuerySpec(_range_join_months, _RANGE_JOIN_SQL),
    "window_frame_specs": QuerySpec(_window_frames, _WINDOW_FRAMES_SQL),
}
