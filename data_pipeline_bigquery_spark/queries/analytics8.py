"""Analytics batch 8 — forensic, sequence, and graph-traversal shapes:

- ``benford_first_digit``: first-significant-digit distribution of
  order totals — the fraud/synthetic-data forensic audit (manipulated
  amounts drift from Benford's law).  Digit extraction is string-head
  of the INTEGER cents (double→string formatting differs across
  engines; integer→string doesn't).
- ``cusum_changepoint``: CUSUM changepoint detection over the daily
  event series — the day where the cumulative deviation from the mean
  peaks is the level-shift candidate.  Pure +/− arithmetic over an
  ordered window, so the doubles are bit-identical across engines.
- ``event_type_gini_impurity``: per-user behavioral diversity as Gini
  impurity 1 − Σp² — chosen over Shannon entropy deliberately: ln()
  is not IEEE-exactness-guaranteed across libms, Σp² is.
- ``basket_lift_confidence``: association-rule strength (support,
  confidence, lift) on co-purchased part pairs — the metric layer on
  top of `basket_part_pairs`' raw counts.
- ``bfs_hops_copurchase``: bounded-depth BFS over the co-purchase
  graph from its busiest hub — Spark runs it as K frontier-join
  rounds (the distributed-BFS pattern), the oracle as a recursive
  CTE: two genuinely independent formulations of reachability.
- ``stickiness_dau_wau``: DAU / trailing-7-day-WAU — the engagement
  ratio every growth dashboard tracks; day-grain pre-aggregation makes
  the range join O(days²·users/day), never O(events).
- ``longest_daily_streak``: per-user longest consecutive-active-day
  run via gaps-and-islands (day_number − row_number is constant inside
  a run) — one window + one keyed agg.
- ``abc_revenue_classification``: ABC inventory analysis — parts
  binned A/B/C at 80/95 cumulative-revenue-permille cutoffs (integer
  cents compare, no float thresholds).  The cumulative rank is a
  global sort by construction; output grain is 3 rows, and the sort
  key (revenue desc) is what any top-down Pareto/ABC pass pays.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

_BFS_MAX_HOPS = 3
_WAU_DAYS = 7


def _benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit histogram of order totals with integer permille
    shares.  One keyed agg on a 9-value key; the over-() total sum runs
    on the 9-row post-aggregate, not the fact table."""
    digits = load(spark, sf_dir, "orders").select(
        F.substring(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .cast("string"),
            1,
            1,
        ).alias("digit")
    )
    agg = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    return agg.withColumn(
        "share_permille",
        F.expr("n * 1000 div sum(n) OVER ()").cast("long"),
    )


_BENFORD_SQL = """
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                  AS VARCHAR), 1, 1) AS digit
  FROM orders),
a AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit)
SELECT digit, n,
       CAST(n * 1000 // CAST(sum(n) OVER () AS BIGINT) AS BIGINT)
         AS share_permille
FROM a
"""


def _cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day with the largest |cumulative deviation from the mean|
    of the daily event count — the CUSUM level-shift candidate.

    The running sum is kept INTEGER: cusum_t = Σ_{i≤t} n_i − t·mean
    with the Σ an exact integer window sum (order-independent) and ONE
    double multiply/subtract at the end — a windowed sum of doubles
    would diverge between engines past ~30 rows (DuckDB's window
    engine sums via segment trees, Spark sequentially; the
    `anomaly_stream` lesson applies here too).

    Scale: events collapse to day grain map-side (one tiny keyed agg);
    the ordered running sum and the global mean both run on the
    day-grain series (30 rows here, ~37k rows for a century), never on
    raw events."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_all = Window.partitionBy()
    w_run = Window.partitionBy().orderBy("day")
    scored = (
        daily.withColumn(
            "mean_n",
            F.sum("n").over(w_all).cast("double")
            / F.count(F.lit(1)).over(w_all).cast("double"),
        )
        .withColumn("cum_n", F.sum("n").over(w_run))
        .withColumn("t", F.row_number().over(w_run))
        .withColumn(
            "cusum",
            F.col("cum_n").cast("double")
            - F.col("t").cast("double") * F.col("mean_n"),
        )
        .withColumn("abs_cusum", F.abs("cusum"))
    )
    rk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("abs_cusum").desc(), "day")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("day", "n", "cusum")
    )


_CUSUM_SQL = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1),
m AS (SELECT CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_n
      FROM daily),
scored AS (
  SELECT day, n,
         CAST(CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS DOUBLE)
           - CAST(row_number() OVER (ORDER BY day) AS DOUBLE) * mean_n
           AS cusum
  FROM daily CROSS JOIN m)
SELECT day, n, cusum FROM scored
ORDER BY abs(cusum) DESC, day LIMIT 1
"""


def _event_type_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type diversity: Gini impurity 1 − Σ(nₜ/n)² in
    the Σnₜ²-integer form (one double division at the end).  Two
    map-side-combinable aggregates; the user key carries the shuffle."""
    per_type = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("nt").alias("n_events"),
        F.sum(F.col("nt") * F.col("nt")).alias("sum_sq"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_events") * F.col("n_events")).cast("double")
        ).alias("gini_impurity"),
    )


_GINI_IMPURITY_SQL = """
WITH t AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS nt
  FROM events GROUP BY 1, 2),
u AS (
  SELECT user_id, CAST(sum(nt) AS BIGINT) AS n_events,
         CAST(sum(nt * nt) AS BIGINT) AS sum_sq
  FROM t GROUP BY 1)
SELECT user_id, n_events,
       1.0 - CAST(sum_sq AS DOUBLE) / CAST(n_events * n_events AS DOUBLE)
         AS gini_impurity
FROM u
"""


def _basket_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) pairs — the basket incidence list."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def _basket_lift_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules on co-purchased part pairs: support count,
    confidence P(b|a), and lift.  The pair join is keyed on the order
    (bounded by basket size, the `basket_part_pairs` discipline);
    item counts join back broadcast-sized relative to pairs.  Top 20
    by lift with full deterministic tie-break."""
    # inc feeds both pair arms, the item counts and the basket total —
    # lineage cut (rule 14); the pre-cut plan re-scanned lineitem 4×
    inc = _basket_edges(spark, sf_dir).localCheckpoint(eager=False)
    a = inc.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = inc.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_n"))
    )
    item_n = inc.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("item_n")
    )
    total = inc.select("l_orderkey").distinct().count()
    scored = (
        pairs.join(item_n.withColumnRenamed("p", "pa").withColumnRenamed("item_n", "a_n"), "pa")
        .join(item_n.withColumnRenamed("p", "pb").withColumnRenamed("item_n", "b_n"), "pb")
        .select(
            "pa",
            "pb",
            "pair_n",
            (
                F.col("pair_n").cast("double") / F.col("a_n").cast("double")
            ).alias("confidence"),
            (
                (F.col("pair_n") * F.lit(total)).cast("double")
                / (F.col("a_n") * F.col("b_n")).cast("double")
            ).alias("lift"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("lift").desc(), "pa", "pb")
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= 20).drop("rk")


_LIFT_SQL = """
WITH inc AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(count(*) AS BIGINT) AS pair_n
  FROM inc a JOIN inc b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
items AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS item_n
          FROM inc GROUP BY 1),
tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total FROM inc),
scored AS (
  SELECT pa, pb, pair_n,
         CAST(pair_n AS DOUBLE) / CAST(ia.item_n AS DOUBLE) AS confidence,
         CAST(pair_n * total AS DOUBLE)
           / CAST(ia.item_n * ib.item_n AS DOUBLE) AS lift
  FROM pairs
  JOIN items ia ON pa = ia.p
  JOIN items ib ON pb = ib.p
  CROSS JOIN tot)
SELECT pa, pb, pair_n, confidence, lift FROM scored
ORDER BY lift DESC, pa, pb LIMIT 20
"""


def _bfs_hops_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BFS from the busiest part: {_BFS_MAX_HOPS} rounds of
    frontier ⋈ edges, keeping the MIN hop per node.  Each round is one
    equi-join keyed on the frontier node plus an anti-join against the
    visited set — the standard Pregel-free BFS; at graph scale the
    visited set stays columnar (no driver collect) and rounds are
    bounded by the constant hop limit.  Output: nodes reached per hop.

    The oracle reaches the same closure with a recursive CTE — an
    independent algorithm, so a frontier bug (e.g. revisiting nodes
    with a longer path) cannot cancel out."""
    # inc feeds both edge sides plus the hub pick, and edges is
    # re-joined every BFS round — lineage cuts (rule 14), or the plan
    # re-scans lineitem ~3× per hop (measured ×45 before the cut)
    inc = _basket_edges(spark, sf_dir).localCheckpoint(eager=False)
    a = inc.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = inc.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "ok").filter(F.col("src") != F.col("dst"))
        .select("src", "dst").distinct()
        .localCheckpoint(eager=False)
    )
    hub = (
        inc.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "l_partkey")
        .limit(1)
        .select(F.col("l_partkey").alias("node"))
    )
    visited = hub.withColumn("hop", F.lit(0))
    frontier = visited
    for h in range(1, _BFS_MAX_HOPS + 1):
        reached = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
            # each frontier feeds the next round's join, its anti-join,
            # and the final union — cut, or subtrees stack per hop
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(reached)
        frontier = reached
    return visited.groupBy("hop").agg(F.count(F.lit(1)).alias("n_parts"))


_BFS_SQL = f"""
WITH RECURSIVE inc AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM inc a JOIN inc b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey),
hub AS (
  SELECT l_partkey AS node FROM inc GROUP BY 1
  ORDER BY count(*) DESC, l_partkey LIMIT 1),
walk AS (
  SELECT node, 0 AS hop FROM hub
  UNION
  SELECT e.dst AS node, w.hop + 1 AS hop
  FROM walk w JOIN edges e ON w.node = e.src
  WHERE w.hop < {_BFS_MAX_HOPS}),
best AS (SELECT node, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY node)
SELECT hop, CAST(count(*) AS BIGINT) AS n_parts FROM best GROUP BY hop
"""


def _stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU over trailing-{_WAU_DAYS}-day WAU per day, integer permille.
    Events collapse to distinct (day, user) first; the trailing window
    is a day-grain range join (days × window length), independent of
    raw event volume."""
    du = (
        load(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").alias("day"),
            "user_id",
        )
        .distinct()
    )
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    window_users = (
        days.alias("d")
        .join(
            du.alias("u"),
            (F.col("u.day") <= F.col("d.day"))
            & (
                F.col("u.day")
                >= F.col("d.day") - F.expr(f"INTERVAL {_WAU_DAYS - 1} DAYS")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    return (
        dau.join(window_users, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 1000 div wau").cast("long").alias(
                "stickiness_permille"
            ),
        )
    )


_STICKINESS_SQL = f"""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM du GROUP BY day),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL {_WAU_DAYS - 1} DAY
  GROUP BY d.day)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_permille
FROM dau JOIN wau ON dau.day = wau.day
"""


def _longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the longest run of consecutive
    active days.  day_number − row_number is constant within a run, so
    one window + two keyed aggs settle it — no self-join, no iteration,
    and every shuffle keys on the user."""
    active = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(
                F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01")
            ).alias("day_no"),
        )
        .distinct()
    )
    grp = F.col("day_no") - F.row_number().over(
        Window.partitionBy("user_id").orderBy("day_no")
    )
    runs = (
        active.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.sum("run_len").alias("n_active_days"),
    )


_STREAK_SQL = """
WITH active AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01',
                  CAST(date_trunc('day', ts) AS DATE)) AS day_no
  FROM events),
runs AS (
  SELECT user_id,
         day_no - row_number() OVER (PARTITION BY user_id ORDER BY day_no)
           AS grp
  FROM active),
lens AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len
  FROM runs GROUP BY 1, 2)
SELECT user_id, max(run_len) AS longest_streak,
       CAST(sum(run_len) AS BIGINT) AS n_active_days
FROM lens GROUP BY user_id
"""


def _abc_revenue_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC analysis: parts ranked by revenue; A covers the first 80% of
    cumulative revenue, B to 95%, C the tail — cutoffs compared in
    integer cents (cum·1000 ≤ total·800), no float thresholds.

    The cumulative rank is one global sort of the PART-grain aggregate
    (parts ≪ lineitems; the fact table never globally sorts); revenue
    cents come from the DECIMAL(18,2) product used by every TPC-H
    revenue query here, cast to bigint cents."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(18,4)")
            )
            .cast("decimal(20,4)")
            .alias("rev"),
        )
        .select(
            "l_partkey",
            (F.col("rev") * 10000).cast("long").alias("rev_cm"),
        )
    )
    w_run = Window.partitionBy().orderBy(F.col("rev_cm").desc(), "l_partkey")
    w_all = Window.partitionBy()
    classed = (
        rev.withColumn("cum", F.sum("rev_cm").over(w_run))
        .withColumn("total", F.sum("rev_cm").over(w_all))
        .withColumn(
            "abc",
            F.when(F.col("cum") * 1000 <= F.col("total") * 800, "A")
            .when(F.col("cum") * 1000 <= F.col("total") * 950, "B")
            .otherwise("C"),
        )
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cm").alias("class_rev_cm"),
    )


_ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(18,4))) AS DECIMAL(20,4))
              * 10000 AS BIGINT) AS rev_cm
  FROM lineitem GROUP BY l_partkey),
classed AS (
  SELECT rev_cm,
         CASE
           WHEN sum(rev_cm) OVER (ORDER BY rev_cm DESC, l_partkey) * 1000
                <= sum(rev_cm) OVER () * 800 THEN 'A'
           WHEN sum(rev_cm) OVER (ORDER BY rev_cm DESC, l_partkey) * 1000
                <= sum(rev_cm) OVER () * 950 THEN 'B'
           ELSE 'C'
         END AS abc
  FROM rev)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev_cm) AS BIGINT) AS class_rev_cm
FROM classed GROUP BY abc
"""


def _zorder_pruning_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measures WHY Z-ordering matters at 100 TB: rows are binned into
    16 files either in ingest order (by orderkey) or in Morton-code
    order over (shipdate, price) — then, for a point predicate on each
    distinct day bucket, counts how many files' [min, max] day range a
    min-max-pruning reader would have to open.  Z-ordered layout
    clusters both dimensions, so the touched-file count collapses; the
    permille ratio is the scan-IO saving a file-skipping scan gets for
    free from layout alone (the `sources/zorder.py` writer produces
    exactly this layout).

    All arithmetic is integer (4-bit quantization, explicit bit
    interleave via div/%, permille via integer div).  The ntile is a
    global sort — this is a layout BENCHMARK over the fact table, the
    same one-off cost as the Z-order write itself."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01")).alias(
            "day_no"
        ),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    bounds = li.agg(
        F.min("day_no").alias("d_min"),
        F.max("day_no").alias("d_max"),
        F.min("cents").alias("c_min"),
        F.max("cents").alias("c_max"),
    )
    q = (
        li.join(F.broadcast(bounds), how="cross")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("(day_no - d_min) * 16 div (d_max - d_min + 1)").alias("d"),
            F.expr("(cents - c_min) * 16 div (c_max - c_min + 1)").alias("p"),
        )
    )
    morton = " + ".join(
        f"((d div {1 << k}) % 2) * {1 << (2 * k)}"
        f" + ((p div {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(4)
    )
    q = q.withColumn("morton", F.expr(morton))
    w_nat = Window.partitionBy().orderBy("l_orderkey", "l_linenumber")
    w_z = Window.partitionBy().orderBy("morton", "l_orderkey", "l_linenumber")
    q = q.withColumn("f_nat", F.ntile(16).over(w_nat)).withColumn(
        "f_z", F.ntile(16).over(w_z)
    )

    def file_stats(file_col: str, name: str) -> DataFrame:
        files = q.groupBy(F.col(file_col).alias("f")).agg(
            F.min("d").alias("d_lo"), F.max("d").alias("d_hi")
        )
        probes = q.select("d").distinct()
        touched = (
            probes.join(
                F.broadcast(files),
                (F.col("d_lo") <= F.col("d")) & (F.col("d") <= F.col("d_hi")),
            )
            .agg(
                F.count(F.lit(1)).alias("total_touched"),
                F.countDistinct("d").alias("n_probe_days"),
            )
        )
        return touched.select(
            F.lit(name).alias("layout"),
            "total_touched",
            "n_probe_days",
            F.expr("total_touched * 1000 div (n_probe_days * 16)").alias(
                "files_touched_permille"
            ),
        )

    return file_stats("f_nat", "natural").unionByName(file_stats("f_z", "zorder"))


def _zorder_sql() -> str:
    morton = " + ".join(
        f"((d // {1 << k}) % 2) * {1 << (2 * k)}"
        f" + ((p // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(4)
    )
    return f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day_no,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem),
b AS (SELECT min(day_no) AS d_min, max(day_no) AS d_max,
             min(cents) AS c_min, max(cents) AS c_max FROM li),
q0 AS (
  SELECT l_orderkey, l_linenumber,
         CAST((day_no - d_min) * 16 // (d_max - d_min + 1) AS BIGINT) AS d,
         CAST((cents - c_min) * 16 // (c_max - c_min + 1) AS BIGINT) AS p
  FROM li CROSS JOIN b),
q AS (
  SELECT d, p, CAST({morton} AS BIGINT) AS morton, l_orderkey, l_linenumber
  FROM q0),
binned AS (
  SELECT d,
         ntile(16) OVER (ORDER BY l_orderkey, l_linenumber) AS f_nat,
         ntile(16) OVER (ORDER BY morton, l_orderkey, l_linenumber) AS f_z
  FROM q),
probes AS (SELECT DISTINCT d FROM binned),
nat_files AS (SELECT f_nat AS f, min(d) AS d_lo, max(d) AS d_hi
              FROM binned GROUP BY 1),
z_files AS (SELECT f_z AS f, min(d) AS d_lo, max(d) AS d_hi
            FROM binned GROUP BY 1),
nat_t AS (
  SELECT CAST(count(*) AS BIGINT) AS total_touched,
         CAST(count(DISTINCT d) AS BIGINT) AS n_probe_days
  FROM probes JOIN nat_files ON d_lo <= d AND d <= d_hi),
z_t AS (
  SELECT CAST(count(*) AS BIGINT) AS total_touched,
         CAST(count(DISTINCT d) AS BIGINT) AS n_probe_days
  FROM probes JOIN z_files ON d_lo <= d AND d <= d_hi)
SELECT 'natural' AS layout, total_touched, n_probe_days,
       CAST(total_touched * 1000 // (n_probe_days * 16) AS BIGINT)
         AS files_touched_permille
FROM nat_t
UNION ALL
SELECT 'zorder' AS layout, total_touched, n_probe_days,
       CAST(total_touched * 1000 // (n_probe_days * 16) AS BIGINT)
         AS files_touched_permille
FROM z_t
"""


def _zscore_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of `streaming/anomaly_stream.py::anomaly_stateful`:
    every event scored against the running mean/stddev of its type's
    strictly-prior events; |z| ≥ 3 emitted.  One ordered window per
    event type — a single key exchange; the streaming form keeps the
    same (n, Σv, Σv²) accumulator as 24 bytes of state per key."""
    from data_pipeline_bigquery_spark.streaming.anomaly_stream import (
        zscore_anomalies,
    )

    return zscore_anomalies(load(spark, sf_dir, "events"))


_ZSCORE_SQL = """
WITH c AS (
  SELECT event_id, event_type, ts, value,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
scored AS (
  SELECT event_id, event_type, ts, value, cents,
         CAST(count(cents) OVER w AS BIGINT) AS n,
         CAST(sum(cents) OVER w AS BIGINT) AS s,
         CAST(sum(cents * cents) OVER w AS BIGINT) AS sq
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT event_id, event_type, ts, value,
         (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS z
  FROM scored
  WHERE n >= 30
    AND CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0)
SELECT event_id, event_type, ts, value, z FROM z WHERE abs(z) >= 3.0
"""


def _snapshot_format_latest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The snapshot store consumed through its REGISTERED FORMAT
    (`sources/snapshot_datasource.py`): two order states commit as
    versions (same v1/v2 split as `snapshot_time_travel_cdc`), then
    ``spark.read.format("snapshotstore")`` resolves the LATEST
    committed version like `read_snapshot(latest)` — with the emitted
    ``_version`` stamp aggregated so the oracle can assert both the
    data AND that the reader picked version 2, not 1.  The streaming
    twin (each version = one micro-batch, exactly-once across
    restarts) is e2e-tested in `tests/test_snapshot_datasource.py`."""
    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        SnapshotDataSource,
    )
    from data_pipeline_bigquery_spark.sources.snapshots import write_snapshot

    spark.dataSource.register(SnapshotDataSource)
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_snapds_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        "o_orderdate",
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    v1 = orders.filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "price_cents"
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 20 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 10 == 0, F.col("price_cents") + 100)
            .otherwise(F.col("price_cents"))
            .alias("price_cents"),
        )
    )
    write_snapshot(v1, base)
    write_snapshot(v2, base)
    latest = (
        spark.read.format("snapshotstore")
        .schema("o_orderkey long, price_cents long, _version long")
        .option("path", base)
        .load()
    )
    return latest.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("total_cents"),
        F.max("_version").alias("read_version"),
    )


def _snapshot_merge_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE write-path verb driven end-to-end through the store
    (`sources/snapshots.py::merge_into_snapshot`): v1 = pre-1998 orders,
    the source batch updates every 10th order (cursor bumped one day)
    and inserts the post-1998 ones, and the committed v2 is returned at
    ROW GRAIN so the oracle re-derives the reference MERGE semantics
    (insert new pks, update only when the cursor differs) independently
    with a full-outer join.  A late duplicate (same cursor) is planted
    to prove the no-op path: key%7==0 rows ship unchanged cursors with
    poisoned prices that must NOT surface."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        merge_into_snapshot,
        read_snapshot,
        write_snapshot,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_snapmrg_{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("o_orderdate").alias("cur"),
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    v1 = orders.filter(F.col("cur") < cut)
    src = (
        orders.filter(
            (F.col("o_orderkey") % 10 == 0)
            | (F.col("o_orderkey") % 7 == 0)
            | (F.col("cur") >= cut)
        )
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 10 == 0, F.col("price_cents") + 100)
            .when(F.col("o_orderkey") % 7 == 0, F.lit(-1))  # poisoned no-op
            .otherwise(F.col("price_cents"))
            .alias("price_cents"),
            F.when(
                F.col("o_orderkey") % 10 == 0,
                F.col("cur") + F.expr("INTERVAL 1 DAY"),
            )
            .otherwise(F.col("cur"))
            .alias("cur"),
        )
    )
    write_snapshot(v1, base)
    merge_into_snapshot(spark, base, src, "o_orderkey", "cur")
    return read_snapshot(spark, base, 2)


_SNAP_MERGE_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         o_orderdate AS cur
  FROM orders),
v1 AS (SELECT * FROM o WHERE cur < TIMESTAMP '1998-01-01'),
src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN price_cents + 100
              WHEN o_orderkey % 7 = 0 THEN -1
              ELSE price_cents END AS price_cents,
         CASE WHEN o_orderkey % 10 = 0 THEN cur + INTERVAL 1 DAY
              ELSE cur END AS cur
  FROM o
  WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 = 0
     OR cur >= TIMESTAMP '1998-01-01')
SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
       CASE WHEN t.o_orderkey IS NULL THEN s.price_cents
            WHEN s.o_orderkey IS NOT NULL AND t.cur <> s.cur
              THEN s.price_cents
            ELSE t.price_cents END AS price_cents,
       CASE WHEN t.o_orderkey IS NULL THEN s.cur
            WHEN s.o_orderkey IS NOT NULL AND t.cur <> s.cur THEN s.cur
            ELSE t.cur END AS cur
FROM v1 t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
"""


_SNAP_FORMAT_SQL = """
WITH v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) + 100
              ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END
           AS price_cents
  FROM orders WHERE o_orderkey % 20 <> 0)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents,
       CAST(2 AS BIGINT) AS read_version
FROM v2
"""


def _join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a cost-based optimizer does before picking a join strategy,
    surfaced as a query: estimate |orders ⋈ lineitem| from 100-bucket
    key histograms (uniform-within-bucket assumption,
    est_b = o_cnt·l_cnt / max(ndv_o, ndv_l)) and compare against the
    exact size Σ_k cnt_o(k)·cnt_l(k) — which equi-joins admit WITHOUT
    executing the join, from the same per-key counts.  The output is
    the estimator's scorecard: actual, estimate, error permille.

    Scale: two key-grain aggregates and a 100-row bucket join — the
    fact tables are never joined; this is strictly cheaper than the
    join it predicts, which is the point of a planner statistic."""
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("o_cnt"))
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("l_cnt"))
    )
    per_key = o.join(l, "k")
    actual = per_key.agg(
        F.sum(F.col("o_cnt") * F.col("l_cnt")).alias("actual")
    )
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    buckets = (
        o.select(hash_bucket(F.col("k"), 100).alias("b"), "o_cnt", "k")
        .groupBy("b")
        .agg(
            F.sum("o_cnt").alias("ob"),
            F.countDistinct("k").alias("ondv"),
        )
        .join(
            l.select(hash_bucket(F.col("k"), 100).alias("b"), "l_cnt", "k")
            .groupBy("b")
            .agg(
                F.sum("l_cnt").alias("lb"),
                F.countDistinct("k").alias("lndv"),
            ),
            "b",
        )
        .select(
            F.expr("ob * lb div greatest(ondv, lndv)").alias("est_b")
        )
        .agg(F.sum("est_b").alias("estimate"))
    )
    return actual.join(buckets, how="cross").select(
        "actual",
        "estimate",
        F.expr(
            "abs(estimate - actual) * 1000 div actual"
        ).alias("err_permille"),
    )


_JOIN_CARD_SQL = """
WITH o AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS o_cnt
           FROM orders GROUP BY 1),
l AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS l_cnt
      FROM lineitem GROUP BY 1),
actual AS (
  SELECT CAST(sum(o_cnt * l_cnt) AS BIGINT) AS actual
  FROM o JOIN l ON o.k = l.k),
ob AS (
  SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 7)) AS BIGINT)
           % 100 AS b,
         CAST(sum(o_cnt) AS BIGINT) AS ob,
         CAST(count(DISTINCT k) AS BIGINT) AS ondv
  FROM o GROUP BY 1),
lb AS (
  SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 7)) AS BIGINT)
           % 100 AS b,
         CAST(sum(l_cnt) AS BIGINT) AS lb,
         CAST(count(DISTINCT k) AS BIGINT) AS lndv
  FROM l GROUP BY 1),
est AS (
  SELECT CAST(sum(ob * lb // greatest(ondv, lndv)) AS BIGINT) AS estimate
  FROM ob JOIN lb ON ob.b = lb.b)
SELECT actual, estimate,
       CAST(abs(estimate - actual) * 1000 // actual AS BIGINT)
         AS err_permille
FROM actual CROSS JOIN est
"""


QUERIES: dict[str, QuerySpec] = {
    "zscore_anomaly_events": QuerySpec(_zscore_anomaly_events, _ZSCORE_SQL),
    "join_cardinality_estimate": QuerySpec(
        _join_cardinality_estimate, _JOIN_CARD_SQL
    ),
    "snapshot_format_latest_scan": QuerySpec(
        _snapshot_format_latest_scan, _SNAP_FORMAT_SQL
    ),
    "snapshot_merge_version": QuerySpec(
        _snapshot_merge_version, _SNAP_MERGE_SQL
    ),
    "zorder_pruning_effectiveness": QuerySpec(
        _zorder_pruning_effectiveness, _zorder_sql()
    ),
    "benford_first_digit": QuerySpec(_benford_first_digit, _BENFORD_SQL),
    "cusum_changepoint": QuerySpec(_cusum_changepoint, _CUSUM_SQL),
    "event_type_gini_impurity": QuerySpec(
        _event_type_gini_impurity, _GINI_IMPURITY_SQL
    ),
    "basket_lift_confidence": QuerySpec(_basket_lift_confidence, _LIFT_SQL),
    "bfs_hops_copurchase": QuerySpec(_bfs_hops_copurchase, _BFS_SQL),
    "stickiness_dau_wau": QuerySpec(_stickiness_dau_wau, _STICKINESS_SQL),
    "longest_daily_streak": QuerySpec(_longest_daily_streak, _STREAK_SQL),
    "abc_revenue_classification": QuerySpec(
        _abc_revenue_classification, _ABC_SQL
    ),
}
