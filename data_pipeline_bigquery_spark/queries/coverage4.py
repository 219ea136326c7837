"""Coverage batch 4 — the remaining classic warehouse shapes.

Completes the TPC-H-shape family started in coverage3 (q2/q4/q11/q15/
q16/q17/q21/q22 there) with q6/q7/q8/q9/q10/q12/q13/q14/q19/q20 — all
22 TPC-H query shapes now have a registry analog (q1=agg_pricing_summary,
q3=shipping_priority_topk, q5=join_agg_revenue_by_nation,
q18=large_orders_having in core/coverage3) — and adds the
analytic staples the reference's BigQuery SQL layer would be asked for:
arg-max per group, Pearson correlation, decile segmentation, and
period-over-period deltas via lag.

Engine-portability rules (see PERFORMANCE.md):
- money math sums the exact DECIMAL product; outputs cast to double at
  the very end (decimal→double conversion is correctly rounded in both
  engines).
- ratios divide two doubles (IEEE +-*/ and sqrt are correctly rounded,
  hence bit-identical across engines); transcendentals are banned.
- every LIMIT is preceded by a total order (explicit tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

_DEC = "decimal(18,2)"


def _rev_dec() -> F.Column:
    """Exact decimal revenue term: extendedprice * (1 - discount)."""
    return F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1.0).cast(_DEC) - F.col("l_discount").cast(_DEC)
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# --- Q7-shape: volume shipping between nation pairs --------------------------

def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship
    year.  Reference analog: the cross-entity reporting joins in
    `/root/reference/pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:44-136`.
    Plan shape: supplier/customer/nation are dimension-sized and
    broadcast; the only shuffle is lineitem↔orders on orderkey, which
    AQE co-partitions.  The nation-pair filter lands on the broadcast
    hash join output, inside one whole-stage span."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        F.year("l_shipdate").alias("ship_year"),
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nat.withColumnRenamed("n_name", "supp_nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(nat.withColumnRenamed("n_name", "cust_nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        pair.groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum(_rev_dec()).cast("double").alias("volume"))
    )


_Q7_SQL = f"""
SELECT supp_nation, cust_nation, ship_year, CAST(sum(rev) AS DOUBLE) AS volume
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l.l_shipdate) AS ship_year, {_REV_SQL} AS rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, ship_year
"""


# --- Q8-shape: national market share -----------------------------------------

def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's share of ECONOMY-part revenue per order
    year.  The share is a conditional-sum / total-sum ratio computed in
    ONE aggregation pass (sum(CASE WHEN ...) — no second scan, no
    self-join), then a single double division."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_year",
            _rev_dec().alias("rev"),
            (F.col("n_name") == "NATION_3").alias("is_target"),
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(F.when(F.col("is_target"), F.col("rev")).otherwise(F.lit(0).cast(_DEC)))
        .alias("target_rev"),
        F.sum("rev").alias("total_rev"),
    )
    return agg.select(
        "o_year",
        (
            F.col("target_rev").cast("double") / F.col("total_rev").cast("double")
        ).alias("mkt_share"),
    )


_Q8_SQL = f"""
WITH vol AS (
  SELECT year(o.o_orderdate) AS o_year, {_REV_SQL} AS rev,
         n.n_name = 'NATION_3' AS is_target
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT o_year,
       CAST(sum(CASE WHEN is_target THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS mkt_share
FROM vol GROUP BY o_year
"""


# --- Q10-shape: returned-item revenue ranking --------------------------------

def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue on returned items in
    a quarter.  Revenue stays DECIMAL through the ORDER BY so the
    ranking (and therefore the LIMIT cut) is engine-exact; c_custkey
    breaks ties totally.  customer/nation broadcast; one shuffle
    (lineitem↔orders), one hash-agg keyed on the customer."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_dec()).alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "c_acctbal", "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, CAST(rev_dec AS DOUBLE) AS revenue
FROM (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name, sum({_REV_SQL}) AS rev_dec
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name)
ORDER BY rev_dec DESC, c_custkey
LIMIT 20
"""


# --- Q13-shape: customer order-count distribution ----------------------------

def _q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by how many non-urgent
    orders they placed — the classic left-outer-join + double
    aggregation.  The LEFT join keeps zero-order customers (the urgent
    filter manufactures them; the fixture gives every customer at least
    one order overall).  Second aggregate is over ≤ hundreds of rows —
    the first one, keyed on c_custkey, carries the real shuffle."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
"""


# --- Q14-shape: promo revenue ratio ------------------------------------------

def _q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: PROMO parts' share of one ship-month's revenue, as a
    single scalar.  Conditional sum and total in one pass; 100× scaling
    done in exact decimal before the final double division."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _rev_dec()).otherwise(
                F.lit(0).cast(_DEC)
            )
        ).alias("promo_dec"),
        F.sum(_rev_dec()).alias("total_dec"),
    )
    return agg.select(
        (
            (F.col("promo_dec") * F.lit(100).cast(_DEC)).cast("double")
            / F.col("total_dec").cast("double")
        ).alias("promo_revenue_pct")
    )


_Q14_SQL = f"""
SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) * CAST(100 AS DECIMAL(18,2)) AS DOUBLE)
       / CAST(sum({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01' AND l.l_shipdate < TIMESTAMP '1995-10-01'
"""


# --- Q19-shape: disjunctive multi-attribute predicate ------------------------

def _q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under an OR of brand/size/quantity predicate
    bundles.  The partkey equi-join is the only join; the disjunction
    evaluates post-join inside one whole-stage span.  Catalyst extracts
    the common `p_size >= 1` style conjuncts it can prove and pushes
    the part-side constraints to the broadcast build side."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_rev_dec()).cast("double").alias("revenue"),
    )


_Q19_SQL = f"""
SELECT count(*) AS n_lines, CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 30)
   OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 50)
"""


# --- Q20-shape: nested semi-join supplier qualification ----------------------

def _q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who shipped a significant volume of PROMO
    parts — a two-level nested subquery (parts IN ..., suppliers IN ...)
    decorrelated into semi-join → aggregate → threshold → semi-join.
    The part list broadcasts into the lineitem scan; the qualifying
    supplier-key set is tiny and broadcasts into supplier."""
    promo = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    qual = (
        li.join(F.broadcast(promo), "l_partkey", "semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("promo_qty"))
        .filter(F.col("promo_qty") > F.lit(300).cast(_DEC))
    )
    sup = load(spark, sf_dir, "supplier")
    return (
        sup.join(
            F.broadcast(qual), sup.s_suppkey == qual.l_suppkey
        )
        .select(
            "s_suppkey", "s_name",
            F.col("promo_qty").cast("double").alias("promo_qty"),
        )
    )


_Q20_SQL = """
SELECT s.s_suppkey, s.s_name, CAST(q.promo_qty AS DOUBLE) AS promo_qty
FROM supplier s
JOIN (
  SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS promo_qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) q
  ON s.s_suppkey = q.l_suppkey
"""


# --- arg-max per group -------------------------------------------------------

def _argmax_priciest_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY / ARG_MAX: for each order, the linenumber of its most
    expensive line.  The ordering key is a composite DECIMAL
    (price * 10 + linenumber scaled) so ties on price resolve
    deterministically and identically in both engines — max_by with a
    non-total order is engine-arbitrary, which is exactly the bug this
    query documents.  One hash-agg, no window, no shuffle beyond the
    groupBy."""
    li = load(spark, sf_dir, "lineitem")
    # prices have cent granularity and linenumber <= 7, so scaling by
    # 1000 (>= 601 needed: dPrice*scale == dLinenumber requires
    # dPrice >= 0.01 → scale*0.01 > 7) makes price*1000 + linenumber a
    # collision-free total order per orderkey; *10 would collide when
    # two lines differ by exactly 0.10-0.60
    key = F.col("l_extendedprice").cast(_DEC) * F.lit(1000).cast(_DEC) + F.col(
        "l_linenumber"
    ).cast(_DEC)
    return li.groupBy("l_orderkey").agg(
        F.max_by("l_linenumber", key).alias("priciest_line"),
        F.max("l_extendedprice").cast(_DEC).cast("double").alias("max_price"),
    )


_ARGMAX_SQL = """
SELECT l_orderkey,
       arg_max(l_linenumber,
               CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1000 AS DECIMAL(18,2))
                 + CAST(l_linenumber AS DECIMAL(18,2))) AS priciest_line,
       CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
FROM lineitem GROUP BY l_orderkey
"""


# --- Pearson correlation via exact sufficient statistics ---------------------

def _corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between quantity and extended price per return flag,
    from EXACT decimal sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) — the same single-pass, merge-friendly shape `corr()` uses
    internally, but engine-portable: the only float ops are the final
    double multiply/subtract/divide/sqrt, all IEEE-correctly-rounded.
    Spark's builtin `corr` (Welford) and DuckDB's would disagree in the
    last ulps; the sufficient-statistics form cannot.

    One portability subtlety: DuckDB's native DECIMAL→DOUBLE cast
    double-rounds (int128 → double, then ÷10^scale), while Spark's is
    a single correctly-rounded conversion — off by one ulp when the
    scaled value exceeds 2^53 and lands near a rounding boundary
    (observed on Σy² at sf0.001).  Both sides therefore cast
    DECIMAL→STRING→DOUBLE: decimal→string is exact and string→double
    is correctly rounded in both engines, making the doubles
    bit-identical by construction."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast(_DEC).alias("x"),
        F.col("l_extendedprice").cast(_DEC).alias("y"),
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    def d(c: str) -> F.Column:
        return F.col(c).cast("string").cast("double")

    n = F.col("n").cast("double")
    sx, sy = d("sx"), d("sy")
    cov = n * d("sxy") - sx * sy
    vx = n * d("sxx") - sx * sx
    vy = n * d("syy") - sy * sy
    den = F.sqrt(vx) * F.sqrt(vy)
    return s.select(
        "l_returnflag",
        "n",
        # rule 9: a single-row (or constant) group has zero variance —
        # ANSI throws on the 0/0 where the oracle returns NULL
        (cov / F.when(den != 0.0, den)).alias("corr_qty_price"),
    )


_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM (SELECT l_returnflag,
               CAST(l_quantity AS DECIMAL(18,2)) AS x,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n,
       (CAST(n AS DOUBLE) * dxy - dx * dy)
       / (sqrt(CAST(n AS DOUBLE) * dxx - dx * dx)
          * sqrt(CAST(n AS DOUBLE) * dyy - dy * dy))
         AS corr_qty_price
FROM (SELECT l_returnflag, n,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) AS dx,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS dy,
             CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS dxy,
             CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS dxx,
             CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS dyy
      FROM s)
"""


# --- decile segmentation -----------------------------------------------------

def _decile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value deciles: NTILE(10) over a TOTAL order
    (c_acctbal, then c_custkey — without the tiebreak, equal balances
    straddling a decile boundary land engine-arbitrarily), then per-
    decile count and average balance.  NTILE is an inherently global
    sort — fine for dimension-sized tables; for a 100 TB fact the scale
    path is approx-percentile cutpoints broadcast-joined as bucket
    boundaries (see percentiles_by_group / approx_price_percentiles)."""
    # rule 11: a NULL balance would enter the NTILE ordering NULLS
    # FIRST on Spark and NULLS LAST on DuckDB — a balanceless customer
    # has no value decile (degenerate-dims sweep catch)
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .select("c_custkey", "c_acctbal")
    )
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    d = cust.withColumn("decile", F.ntile(10).over(w))
    return d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_balance"),
        F.min("c_acctbal").alias("min_balance"),
        F.max("c_acctbal").alias("max_balance"),
    )


_DECILE_SQL = """
SELECT decile, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance,
       min(c_acctbal) AS min_balance, max(c_acctbal) AS max_balance
FROM (SELECT c_acctbal, ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer WHERE c_acctbal IS NOT NULL)
GROUP BY decile
"""


# --- month-over-month deltas via lag -----------------------------------------

def _mom_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month order revenue with absolute and relative change
    via LAG.  The month key is integer arithmetic (year*12 + month),
    not calendar truncation — engine-identical and join-friendly.  The
    window runs over the ~80-row aggregate, not the fact table: the
    heavy lifting is one hash-agg; the single-partition window is
    deliberately tiny (post-agg), never a scale concern."""
    orders = load(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("month_key"),
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )
    monthly = orders.groupBy("month_key").agg(F.sum("price").alias("rev_dec"))
    w = Window.orderBy("month_key")
    out = monthly.select(
        "month_key",
        F.col("rev_dec"),
        F.lag("rev_dec").over(w).alias("prev_dec"),
    )
    return out.select(
        "month_key",
        F.col("rev_dec").cast("double").alias("revenue"),
        (F.col("rev_dec") - F.col("prev_dec")).cast("double").alias("abs_change"),
        (
            (F.col("rev_dec") - F.col("prev_dec")).cast("double")
            / F.col("prev_dec").cast("double")
        ).alias("pct_change"),
    )


_MOM_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS month_key,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1),
lagged AS (
  SELECT month_key, rev_dec,
         lag(rev_dec) OVER (ORDER BY month_key) AS prev_dec
  FROM monthly)
SELECT month_key, CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec - prev_dec AS DOUBLE) AS abs_change,
       CAST(rev_dec - prev_dec AS DOUBLE) / CAST(prev_dec AS DOUBLE) AS pct_change
FROM lagged
"""


def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: pure scan-side predicate aggregation — date range +
    discount band + quantity cap, one global sum, no join.  The
    predicates are all pushable (explain shows PushedFilters on
    l_shipdate/l_discount/l_quantity), so at 100 TB this reads only the
    row groups whose stats overlap the band — the canonical
    'filters-reach-the-scan' query."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def _q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: the profit star — part(filtered by name) ⋈ lineitem ⋈
    supplier ⋈ nation, profit per (nation, year).  The fixture carries
    no partsupp, so profit is the revenue term (the join/agg shape is
    what Q9 tests; supplycost is one more broadcast dim).  Both dims
    broadcast; lineitem never shuffles until the final keyed agg."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(_rev_dec()).cast("double").alias("profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       CAST(sum({_REV_SQL}) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(l_shipdate)
"""


def _q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: fact-to-fact join + conditional two-way count split.
    The fixture has no l_shipmode/commitdate, so the grouping dimension
    is l_linestatus and the split is urgent-vs-other o_orderpriority —
    identical plan shape (join, then per-group CASE sums).  orders is
    the smaller fact: at fixture scale it broadcasts; at 100 TB both
    sides co-partition on the key (no hint forced — the AQE-era rule
    from the r4 revenue-star fix)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def _snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC from two snapshots: full-outer join on the pk classifies
    every row as insert / delete / update / unchanged — the change feed
    a MERGE-based warehouse (the reference's BigQuery sink) implies but
    never materializes.  Snapshots here are two deterministic views of
    orders ("old" = pre-1998 rows; "new" = same minus every 20th order
    [deletes], plus price bumps on every 10th [updates], plus post-1998
    rows [inserts]).  One co-partitioned shuffle on the pk, AQE-sized;
    counts per change type keep the output tiny at any scale."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    old = orders.filter(F.col("o_orderdate") < cut)
    new = (
        orders.filter(F.col("o_orderkey") % 20 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1
            ).otherwise(F.col("o_totalprice")),
        )
    )
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderdate") != F.col("n.o_orderdate")),
            "update",
        )
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_CDC_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01'),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
         o_orderdate
  FROM orders WHERE o_orderkey % 20 != 0),
j AS (
  SELECT CASE
           WHEN old.o_orderkey IS NULL THEN 'insert'
           WHEN new.o_orderkey IS NULL THEN 'delete'
           WHEN old.o_totalprice != new.o_totalprice
             OR old.o_orderdate != new.o_orderdate THEN 'update'
           ELSE 'unchanged'
         END AS change_type
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
SELECT change_type, count(*) AS n_rows FROM j GROUP BY change_type
"""


def _referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK audit across the star: orphan counts for every foreign-key
    edge (lineitem→orders, lineitem→part, lineitem→supplier,
    orders→customer, customer→nation), each a left-anti join.  The dim
    sides broadcast; the two fact-to-fact edges co-partition.  The
    output is one row per relationship — the audit a warehouse runs
    after every load (the reference audits only pk nulls/dups;
    data_quality_checks covers those)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")

    def orphans(child: DataFrame, fk: str, parent: DataFrame, pk: str, rel: str) -> DataFrame:
        n = (
            child.join(parent.select(pk), child[fk] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return n.select(F.lit(rel).alias("relationship"), "n_orphans")

    return (
        orphans(li, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(li, "l_partkey", part, "p_partkey", "lineitem->part"))
        .unionByName(orphans(li, "l_suppkey", supp, "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(orders, "o_custkey", cust, "c_custkey", "orders->customer"))
        .unionByName(orphans(cust, "c_nationkey", nation, "n_nationkey", "customer->nation"))
    )


_RI_AUDIT_SQL = """
SELECT 'lineitem->orders' AS relationship,
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT count(*) FROM orders o WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
"""


def _join_size_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join planning audit: BEFORE running an expensive join,
    estimate its exact output size (``Σ_k a_k·b_k`` over per-key
    counts) and name the heaviest keys with their contribution share —
    the decision input for salting/AQE-skew settings on a 100 TB join.
    Both inputs reduce to per-key counts first (map-side combine), so
    the audit join is counts × counts — vocabulary-of-keys sized, never
    row × row.  Output: total projected rows, the top-5 key
    contributions, and each key's integer permille share."""
    li = load(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("a"))
    orders = load(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("b"))
    per_key = li.join(orders, "k").select(
        "k", (F.col("a") * F.col("b")).alias("rows_out")
    )
    total = per_key.agg(F.sum("rows_out").alias("total_rows"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "k",
            "rows_out",
            "total_rows",
            # integer `div`, not double `/`+cast: exact at any magnitude,
            # digit-for-digit DuckDB's `//`
            F.expr("rows_out * 1000 div total_rows").alias("permille_share"),
        )
        .orderBy(F.col("rows_out").desc(), F.col("k"))
        .limit(5)
    )


_JOIN_AUDIT_SQL = """
WITH a AS (SELECT l_orderkey AS k, count(*) AS a FROM lineitem GROUP BY 1),
b AS (SELECT o_orderkey AS k, count(*) AS b FROM orders GROUP BY 1),
pk AS (SELECT k, a * b AS rows_out FROM a JOIN b USING (k)),
t AS (SELECT sum(rows_out) AS total_rows FROM pk)
SELECT k, CAST(rows_out AS BIGINT) AS rows_out,
       CAST(total_rows AS BIGINT) AS total_rows,
       CAST(rows_out * 1000 // total_rows AS BIGINT) AS permille_share
FROM pk CROSS JOIN t
ORDER BY rows_out DESC, k
LIMIT 5
"""


QUERIES: dict[str, QuerySpec] = {
    "join_size_skew_audit": QuerySpec(_join_size_skew_audit, _JOIN_AUDIT_SQL),
    "q6_forecast_revenue": QuerySpec(_q6_forecast_revenue, _Q6_SQL),
    "snapshot_diff_cdc": QuerySpec(_snapshot_diff_cdc, _CDC_SQL),
    "referential_integrity_audit": QuerySpec(
        _referential_integrity_audit, _RI_AUDIT_SQL
    ),
    "q9_product_type_profit": QuerySpec(_q9_product_type_profit, _Q9_SQL),
    "q12_priority_by_status": QuerySpec(_q12_priority_by_status, _Q12_SQL),
    "q7_volume_shipping": QuerySpec(_q7_volume_shipping, _Q7_SQL),
    "q8_market_share": QuerySpec(_q8_market_share, _Q8_SQL),
    "q10_returned_items": QuerySpec(_q10_returned_items, _Q10_SQL),
    "q13_customer_distribution": QuerySpec(
        _q13_customer_distribution, _Q13_SQL
    ),
    "q14_promo_revenue": QuerySpec(_q14_promo_revenue, _Q14_SQL),
    "q19_disjunctive_predicates": QuerySpec(_q19_disjunctive, _Q19_SQL),
    "q20_part_promotion": QuerySpec(_q20_part_promotion, _Q20_SQL),
    "argmax_priciest_line": QuerySpec(_argmax_priciest_line, _ARGMAX_SQL),
    "corr_qty_price_by_flag": QuerySpec(_corr_qty_price, _CORR_SQL),
    "decile_customer_value": QuerySpec(_decile_customer_value, _DECILE_SQL),
    "mom_revenue_change": QuerySpec(_mom_revenue_change, _MOM_SQL),
}
