"""Sketch-based approximate aggregation — the 100 TB answer to exact
distinct counts and percentiles.

At lake scale, exact ``count(DISTINCT user)`` shuffles every distinct
key and exact percentiles shuffle every value; the sketch forms
(HyperLogLog++ for distinct, Greenwald-Khanna for quantiles — both
built into Spark) keep a bounded few-KB summary per partition and merge
map-side, so the shuffle carries sketches, not data.

Sketch VALUES are engine-specific (HLL++ vs DuckDB's sketch differ in
the low digits), so raw sketch output can't hash-match a DuckDB oracle.
The registered queries therefore emit the *accuracy contract* instead:
each runs the sketch AND the exact aggregate in one Spark job and
returns the exact value plus a ``within_bound`` boolean; the oracle
computes the exact value and asserts the boolean is TRUE.  A hash-green
driver row is then a machine-checked proof that the sketch met its
error bound on that dataset (the ``ann_ivf_exact_topk`` pattern from
round 3).  ``tests/test_sketches.py`` additionally gates the error
numerically.

The pure sketch forms (:func:`approx_distinct_daily`,
:func:`approx_price_percentiles`) stay exported for users and the
bench — in production you run the sketch *instead of* the exact
aggregate, not next to it.

Reference parity: the reference counts rows exactly and has no
percentile surface (SURVEY §2.5); sketches are scale-out extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

DISTINCT_RSD = 0.02  # HLL++ relative std dev; check allows 3 sigma
PCT_ACCURACY = 10_000  # GK sketch: rank error <= n/accuracy


def approx_distinct_daily(events: DataFrame, rsd: float = DISTINCT_RSD) -> DataFrame:
    """Distinct users per day via HLL++ (relative std dev ``rsd``).
    One shuffle of per-partition sketches keyed on day."""
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .orderBy("day")
    )


def approx_price_percentiles(lineitem: DataFrame, accuracy: int = PCT_ACCURACY) -> DataFrame:
    """p50/p95/p99 of extended price per return flag via the GK quantile
    sketch (rank error <= 1/accuracy)."""
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), accuracy
    )
    return (
        lineitem.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )


def _approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch + exact rollup in one job; ``within_bound`` asserts
    |approx − exact| ≤ 3·rsd·exact per day (3σ of the HLL++ estimator —
    deterministic for a fixed dataset, since HLL hashing is seedless)."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.approx_count_distinct("user_id", DISTINCT_RSD).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    bound = 3 * DISTINCT_RSD
    return agg.select(
        "day",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(bound)
        ).alias("within_bound"),
    ).orderBy("day")


_APPROX_DISTINCT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY 1 ORDER BY 1
"""


def _approx_percentiles_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GK sketch + rank audit: the sketch's p50/p95/p99 are broadcast
    back onto the fact (3 rows — never a shuffle of the data) and each
    checked against the GK guarantee — an element whose rank is within
    ``n/accuracy`` of q·n.  The slack adds +2 for rank-interval
    endpoints."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), PCT_ACCURACY
    )
    sketched = li.groupBy("l_returnflag").agg(pct.alias("p"))
    joined = li.join(F.broadcast(sketched), "l_returnflag")

    aggs = [F.count(F.lit(1)).alias("n")]
    for i, q in enumerate((0.5, 0.95, 0.99)):
        v = F.col("p")[i]
        aggs.append(F.sum((F.col("l_extendedprice") <= v).cast("long")).alias(f"le_{i}"))
        aggs.append(F.sum((F.col("l_extendedprice") < v).cast("long")).alias(f"lt_{i}"))
    counted = joined.groupBy("l_returnflag").agg(*aggs)

    cols = [F.col("l_returnflag"), F.col("n")]
    for i, q in enumerate((0.5, 0.95, 0.99)):
        slack = F.col("n") / F.lit(float(PCT_ACCURACY)) + F.lit(2.0)
        ok = (F.col(f"le_{i}") >= F.col("n") * F.lit(q) - slack) & (
            F.col(f"lt_{i}") <= F.col("n") * F.lit(q) + slack
        )
        cols.append(ok.alias(f"p{int(q * 100)}_ok"))
    return counted.select(*cols)


_APPROX_PCT_SQL = """
SELECT l_returnflag, count(*) AS n,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


CMS_EPS = 1e-4  # count-min: over-estimate only, error <= eps * N
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
_CMS_TOP = 20


def _cms_frequent_terms_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch + exact heavy-hitters audit.

    The CMS aggregates map-side into a fixed ``e/eps × ln(1/delta)``
    counter grid (a few hundred KB here) and merges by cell-wise sum —
    the classic frequency sketch for 100 TB streams where a full
    ``groupBy(term)`` shuffle is unaffordable.  The contract probes the
    sketch for the corpus's top-20 terms (``_CMS_TOP``) and asserts the CMS
    guarantee: ``exact <= estimate <= exact + eps·N`` (one-sided
    over-estimation; deterministic for a fixed dataset since the seed
    is pinned).  Bounded driver traffic by construction: the sketch
    itself (KBs) and the top-20 audited terms — never the term
    counts at large.  The oracle recomputes the exact heavy hitters and
    asserts every bound held."""
    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    # sketch and total ride ONE aggregation (one corpus pass, both
    # merge map-side); the row returning to the driver is the sketch
    # bytes (a few hundred KB at eps=1e-4) plus one long
    agg_row = words.agg(
        F.count_min_sketch(
            "term", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    raw, n_total = agg_row["s"], agg_row["n"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(raw))
    )
    top = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("term"))
        .limit(_CMS_TOP)
        .collect()
    )
    bound = CMS_EPS * n_total
    rows = [
        (
            r["term"],
            r["exact_count"],
            bool(
                r["exact_count"]
                <= cms.estimateCount(r["term"])
                <= r["exact_count"] + bound
            ),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "term string, exact_count bigint, within_bound boolean"
    )


_CMS_SQL = f"""
SELECT term, exact_count, TRUE AS within_bound FROM (
  SELECT w AS term, count(*) AS exact_count
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
  GROUP BY 1
  ORDER BY exact_count DESC, term
  LIMIT {_CMS_TOP})
"""


def _hll_reagg_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL REAGGREGATION contract — the property
    ``approx_count_distinct`` lacks: Datasketches HLL sketches built
    per ``(day, event_type)`` UNION up to per-day distinct users
    without touching the raw data again.  This is how a 100 TB rollup
    serves distinct counts at every grain from ONE pre-aggregated
    sketch table (store sketches at the finest grain; every coarser
    query is a cheap sketch union, not a rescan).

    The contract computes per-day (a) the estimate from unioning the
    per-type sketches and (b) the exact distinct, asserting the
    estimate within 5% — generous against HLL's ~2% rsd at the default
    lgK=12, deterministic for a fixed dataset."""
    events = load(spark, sf_dir, "events")
    fine = events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    coarse = fine.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        coarse.join(exact, "day")
        .select(
            "day",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(0.05)
            ).alias("within_bound"),
        )
        .orderBy("day")
    )


_HLL_REAGG_SQL = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY 1 ORDER BY 1
"""


def _hll_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch INTERSECTION via inclusion–exclusion — the audience-
    overlap question ("how many users do segments A and B share") that
    exact COUNT(DISTINCT) answers only by rescanning both segments.
    With one HLL sketch per event type, every pairwise overlap is
    ``est(A) + est(B) − est(A ∪ B)`` — three sketch reads, zero
    rescans, and the same finest-grain sketch table that serves
    ``hll_reaggregatable_rollup`` serves all k·(k−1)/2 overlaps.

    Error compounds: each estimate carries ~2% rsd of ITS OWN
    cardinality, so the bound is 5% of the exact UNION (not of the
    intersection — a small overlap of two big segments is where
    inclusion–exclusion is genuinely noisy, and the bound says so).
    The oracle recomputes exact intersections and unions from the raw
    pairs and asserts ``within_bound`` TRUE."""
    events = load(spark, sf_dir, "events")
    # per_type feeds both pair arms and the distinct user-type frame
    # feeds both sides of the exact-overlap join — lineage cuts
    # (rule 14); the pre-cut plan re-scanned events 4×
    per_type = (
        events.groupBy("event_type")
        .agg(
            F.hll_sketch_agg("user_id").alias("sk"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .localCheckpoint(eager=False)
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_users").alias("n_a"),
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_users").alias("n_b"),
    )
    est_inter = (
        F.hll_sketch_estimate("sk_a")
        + F.hll_sketch_estimate("sk_b")
        - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
    )
    ut = (
        events.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    exact_inter = (
        ut.alias("x")
        .join(ut.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("user_id").alias("exact_inter"))
    )
    return (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        # LEFT join + coalesce: a pair with NO shared users must still
        # report (exact_inter 0) — an inner join would silently drop
        # exactly the disjoint audiences the report exists to surface
        .join(exact_inter, ["type_a", "type_b"], "left")
        .withColumn("exact_inter", F.coalesce("exact_inter", F.lit(0)))
        .select(
            "type_a",
            "type_b",
            "exact_inter",
            (
                F.abs(est_inter - F.col("exact_inter"))
                <= (F.col("n_a") + F.col("n_b") - F.col("exact_inter"))
                * F.lit(0.05)
            ).alias("within_bound"),
        )
    )


_HLL_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
types AS (SELECT DISTINCT event_type FROM events),
pairs AS (
  SELECT ta.event_type AS type_a, tb.event_type AS type_b
  FROM types ta JOIN types tb ON ta.event_type < tb.event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(DISTINCT a.user_id) AS exact_inter
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b,
       CAST(COALESCE(i.exact_inter, 0) AS BIGINT) AS exact_inter,
       TRUE AS within_bound
FROM pairs p LEFT JOIN inter i USING (type_a, type_b)
"""


QUERIES: dict[str, QuerySpec] = {
    "approx_distinct_daily": QuerySpec(_approx_distinct_checked, _APPROX_DISTINCT_SQL),
    "hll_audience_overlap": QuerySpec(_hll_audience_overlap, _HLL_OVERLAP_SQL),
    "hll_reaggregatable_rollup": QuerySpec(_hll_reagg_checked, _HLL_REAGG_SQL),
    "approx_price_percentiles": QuerySpec(_approx_percentiles_checked, _APPROX_PCT_SQL),
    "approx_frequent_terms": QuerySpec(_cms_frequent_terms_checked, _CMS_SQL),
}
