"""Analytics batch 9 — experimentation, robust statistics, and
curation-audit shapes:

- ``ab_test_lift``: the experimentation readout — deterministic
  md5-bucket arm assignment, per-arm conversion (user had a purchase),
  sample-ratio-mismatch deviation, integer-permille lift, and the
  two-proportion z statistic.  The z keeps every input an exact
  integer until one final identically-shaped IEEE expression (sqrt is
  correctly rounded on both engines; ln/exp are not, so no p-value).
- ``diff_in_diff_revenue``: difference-in-differences over the same
  md5 arms × (first-half / second-half of the month) — the causal
  panel estimate, computed entirely in integer cents.
- ``theil_sen_trend``: per-event-type robust trend as the MEDIAN of
  all pairwise daily-count slopes (Theil–Sen estimator) — resistant
  to the outlier days that wreck OLS (`grouped_ols_price_model` is
  the fragile twin).  Each slope is one IEEE division of exact
  integers (identical doubles on both engines); the median is
  order-statistic selection with a full tie-break, never an average.
- ``bootstrap_ci_revenue``: a 64-replicate deterministic Poisson
  bootstrap of mean order revenue — replicate weights come from the
  md5-permille idiom pushed through a fixed Poisson(1) inverse-CDF
  table, so both engines materialize byte-identical resamples; the
  90% CI picks order statistics of the replicate means.
- ``lang_temperature_mixture``: temperature-based language rebalancing
  (the multilingual-corpus recipe: sample share ∝ count^(1/2)) —
  implemented with INTEGER sqrt weights ``floor(sqrt(n·1e6))`` so the
  shares stay exact-integer permille, then the same min-feasible-rate
  + md5-membership machinery as ``source_mixture_resample``.
- ``autocorr_daily_revenue``: lag-1 and lag-7 autocorrelation of the
  daily revenue series — seasonality detection.  All five Pearson
  moments are exact BIGINT sums of integer cents; the only doubles
  are one final numerator/denominator expression.
- ``hard_negative_mining``: for each anchor embedding, the most
  similar vector with a DIFFERENT label — the contrastive-training
  curation op (hard negatives are what make embedding models sharp).
  Same broadcast-anchor × corpus-scan shape as ``ann_cosine_topk``.
- ``l_diversity_audit``: privacy audit beyond k-anonymity — per
  quasi-identifier group (segment × nation), how many DISTINCT
  sensitive values (acctbal band) appear; the histogram of that
  l value is the re-identification risk surface (`k_anonymity_audit`
  counts group sizes; a large group with one sensitive value is still
  fully disclosed — that's what l-diversity catches).

Reference parity: the reference pipeline (main.py:13-54) has no
statistics layer at all — these are the scale-out extensions a
training-data/analytics engine needs on top of its ETL surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec

# md5-permille (ppm) thresholds of the Poisson(1) CDF: u < P(X<=k)
# selects weight k; the tail is capped at 7 (P > 0.99991).  The
# constants are frozen literals so both engines build byte-identical
# resamples — regenerate with math.exp(-1) partial sums if the cap
# ever changes.
_POISSON1_CDF_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916)
_BOOTSTRAP_B = 64


def _md5_bucket_sql(expr: str, n: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 7)) "
        f"AS BIGINT) % {n}"
    )


# --- ab_test_lift ----------------------------------------------------------


def converted_users(events: DataFrame) -> DataFrame:
    """User grain with the experiment's conversion definition (a
    high-value purchase, >= 250) and the md5 arm — the SINGLE source
    of truth shared by ``ab_test_lift`` and
    ``evalops.uplift_by_segment`` so the two readouts can never
    silently decouple."""
    return (
        events.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 250),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
        .withColumn("arm", hash_bucket(F.col("user_id"), 2))
    )


# the oracle twin of converted_users — interpolated into both keys' SQL
CONVERTED_USERS_CTE = f"""u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value >= 250
                  THEN 1 ELSE 0 END) AS converted,
         {_md5_bucket_sql('user_id', 2)} AS arm
  FROM events GROUP BY user_id)"""


def _ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass to user grain (converted = any purchase), then a 2-row
    arm aggregate collapsed to a single summary row.  Scale: the only
    shuffle is the user-grain groupBy; everything after runs on 2 rows.
    """
    # conversion = a HIGH-VALUE purchase (>= 250), so the rate is
    # genuinely sub-1 at every fixture scale; an everyone-converts
    # pooled rate would zero the z denominator (nullif-guarded below
    # regardless)
    users = converted_users(load(spark, sf_dir, "events"))
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    # pivot the 2-row aggregate into one summary row
    summary = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_control"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_control"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_treatment"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv"))).alias(
            "conv_treatment"
        ),
    )
    z_expr = (
        "round((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)"
        "  - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))"
        " / nullif(sqrt((CAST(conv_control + conv_treatment AS DOUBLE)"
        "         / CAST(n_control + n_treatment AS DOUBLE))"
        "        * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)"
        "               / CAST(n_control + n_treatment AS DOUBLE))"
        "        * (1.0 / CAST(n_control AS DOUBLE)"
        "           + 1.0 / CAST(n_treatment AS DOUBLE))), 0.0), 9)"
    )
    return summary.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.expr("conv_control * 1000 div n_control").alias(
            "rate_control_permille"
        ),
        F.expr("conv_treatment * 1000 div n_treatment").alias(
            "rate_treatment_permille"
        ),
        F.expr(
            "conv_treatment * 1000 div n_treatment"
            " - conv_control * 1000 div n_control"
        ).alias("lift_permille_points"),
        F.expr(
            "abs(n_control - n_treatment) * 1000 div (n_control + n_treatment)"
        ).alias("srm_dev_permille"),
        F.expr(z_expr).alias("z_two_proportion"),
    )


_AB_TEST_SQL = f"""
WITH {CONVERTED_USERS_CTE},
a AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 END) AS BIGINT) AS n_control,
         CAST(sum(CASE WHEN arm = 0 THEN converted END) AS BIGINT) AS conv_control,
         CAST(sum(CASE WHEN arm = 1 THEN 1 END) AS BIGINT) AS n_treatment,
         CAST(sum(CASE WHEN arm = 1 THEN converted END) AS BIGINT) AS conv_treatment
  FROM u)
SELECT n_control, conv_control, n_treatment, conv_treatment,
       CAST(conv_control * 1000 // n_control AS BIGINT) AS rate_control_permille,
       CAST(conv_treatment * 1000 // n_treatment AS BIGINT) AS rate_treatment_permille,
       CAST(conv_treatment * 1000 // n_treatment
            - conv_control * 1000 // n_control AS BIGINT) AS lift_permille_points,
       CAST(abs(n_control - n_treatment) * 1000 // (n_control + n_treatment)
            AS BIGINT) AS srm_dev_permille,
       round((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
          - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))
         / nullif(sqrt((CAST(conv_control + conv_treatment AS DOUBLE)
                 / CAST(n_control + n_treatment AS DOUBLE))
                * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)
                       / CAST(n_control + n_treatment AS DOUBLE))
                * (1.0 / CAST(n_control AS DOUBLE)
                   + 1.0 / CAST(n_treatment AS DOUBLE))), 0.0), 9)
         AS z_two_proportion
FROM a
"""


# --- diff_in_diff_revenue --------------------------------------------------


def _diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(treatment post − pre) − (control post − pre), integer cents.
    Period split is day-of-month ≤ 15 (the fixtures span one month;
    production passes an explicit cutover date).  One map-side
    cents/arm/period projection, one 4-cell aggregate."""
    events = load(spark, sf_dir, "events")
    cells = (
        events.select(
            hash_bucket(F.col("user_id"), 2).alias("arm"),
            F.when(F.dayofmonth("ts") <= 15, F.lit("pre"))
            .otherwise(F.lit("post"))
            .alias("period"),
            (F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("arm", "period")
        .agg(F.sum("cents").alias("revenue_cents"))
    )
    return cells.agg(
        F.sum(
            F.when(
                (F.col("arm") == 0) & (F.col("period") == "pre"),
                F.col("revenue_cents"),
            )
        ).alias("control_pre_cents"),
        F.sum(
            F.when(
                (F.col("arm") == 0) & (F.col("period") == "post"),
                F.col("revenue_cents"),
            )
        ).alias("control_post_cents"),
        F.sum(
            F.when(
                (F.col("arm") == 1) & (F.col("period") == "pre"),
                F.col("revenue_cents"),
            )
        ).alias("treatment_pre_cents"),
        F.sum(
            F.when(
                (F.col("arm") == 1) & (F.col("period") == "post"),
                F.col("revenue_cents"),
            )
        ).alias("treatment_post_cents"),
    ).select(
        "control_pre_cents",
        "control_post_cents",
        "treatment_pre_cents",
        "treatment_post_cents",
        F.expr(
            "(treatment_post_cents - treatment_pre_cents)"
            " - (control_post_cents - control_pre_cents)"
        ).alias("did_cents"),
    )


_DID_SQL = f"""
WITH c AS (
  SELECT {_md5_bucket_sql('user_id', 2)} AS arm,
         CASE WHEN day(ts) <= 15 THEN 'pre' ELSE 'post' END AS period,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
cells AS (
  SELECT arm, period, sum(cents) AS revenue_cents
  FROM c GROUP BY arm, period),
p AS (
  SELECT
    CAST(sum(CASE WHEN arm = 0 AND period = 'pre' THEN revenue_cents END)
         AS BIGINT) AS control_pre_cents,
    CAST(sum(CASE WHEN arm = 0 AND period = 'post' THEN revenue_cents END)
         AS BIGINT) AS control_post_cents,
    CAST(sum(CASE WHEN arm = 1 AND period = 'pre' THEN revenue_cents END)
         AS BIGINT) AS treatment_pre_cents,
    CAST(sum(CASE WHEN arm = 1 AND period = 'post' THEN revenue_cents END)
         AS BIGINT) AS treatment_post_cents
  FROM cells)
SELECT *,
       CAST((treatment_post_cents - treatment_pre_cents)
            - (control_post_cents - control_pre_cents) AS BIGINT) AS did_cents
FROM p
"""


# --- theil_sen_trend -------------------------------------------------------


def _theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median pairwise slope of the per-type daily count series.

    Scale: events collapse to day×type grain FIRST (one keyed agg);
    the O(d²)-per-type pair join runs on the day-grain series (~30
    rows here, ~3.7k for a decade → ≤7M pairs per type, each a
    16-byte tuple — bounded by calendar length, never by event
    volume).  Each slope is one IEEE division of exact ints, the
    median is the lower order statistic with (slope, t1, t2)
    tie-break — identical selection on both engines."""
    # an unlabeled (NULL-type) event belongs to no series: drop it on
    # BOTH engines — the pair self-join never matches NULL keys while
    # the scaffold groupBy keeps them, inventing a phantom series
    events = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    daily = events.groupBy(
        F.col("event_type"),
        F.date_trunc("day", "ts").alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wmin = Window.partitionBy("event_type")
    d = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.min("day").over(wmin))
        .cast("long")
        .alias("t"),
        F.col("n"),
    )
    # cut lineage before the self-join: the day-grain series is
    # calendar-bounded (~30 rows here, ~3.7k/decade) but each DAG
    # reference would otherwise re-run the FULL events scan+agg —
    # checkpointing makes the fact table scan exactly once (same
    # pattern as extensions/clusters.py)
    d = d.localCheckpoint()
    a = d.select(
        "event_type", F.col("t").alias("t1"), F.col("n").alias("n1")
    )
    b = d.select(
        "event_type", F.col("t").alias("t2"), F.col("n").alias("n2")
    )
    pairs = a.join(b, "event_type").filter(F.col("t1") < F.col("t2"))
    slopes = pairs.select(
        "event_type",
        "t1",
        "t2",
        (
            (F.col("n2") - F.col("n1")).cast("double")
            / (F.col("t2") - F.col("t1")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "t1", "t2")
    cnt = Window.partitionBy("event_type")
    ranked = slopes.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(cnt)
    )
    medians = ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select("event_type", "n_pairs", F.round(F.col("slope"), 9).alias(
        "median_slope"
    ))
    # single-day types produce ZERO pairs and would silently vanish;
    # emit them with n_pairs=0 / NULL slope so "undefined trend" is
    # distinguishable from "type absent" (d is checkpointed — the
    # extra reference is in-memory rows, not another fact scan)
    types = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("_nd"))
    return (
        types.join(medians, "event_type", "left")
        .select(
            "event_type",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias(
                "n_pairs"
            ),
            "median_slope",
        )
        .orderBy("event_type")
    )


_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
base AS (SELECT event_type, min(day) AS day0 FROM daily GROUP BY 1),
d AS (
  SELECT daily.event_type, date_diff('day', day0, day) AS t, n
  FROM daily JOIN base ON daily.event_type = base.event_type),
pairs AS (
  SELECT a.event_type, a.t AS t1, b.t AS t2,
         CAST(b.n - a.n AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM d a JOIN d b ON a.event_type = b.event_type AND a.t < b.t),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY slope, t1, t2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs),
medians AS (
  SELECT event_type, n_pairs, round(slope, 9) AS median_slope
  FROM ranked WHERE rn = (n_pairs + 1) // 2),
types AS (SELECT event_type FROM d GROUP BY event_type)
SELECT types.event_type,
       CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
       median_slope
FROM types LEFT JOIN medians ON types.event_type = medians.event_type
ORDER BY types.event_type
"""


# --- bootstrap_ci_revenue --------------------------------------------------


def _bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-replicate Poisson bootstrap of mean order revenue.

    Scale: the replicate explode is map-side (64× row inflation of a
    2-column projection, no shuffle until the 64-group aggregate,
    which partial-aggregates per partition — the classic distributed
    bootstrap).  Replicate means are exact-integer ratios; the CI
    picks order statistics 4 and 61 of the 64 means (90% coverage)
    with the replicate id as tie-break."""
    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    reps = cents.select(
        "k",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOTSTRAP_B - 1))).alias("b"),
    )
    drawn = reps.select(
        "b",
        "cents",
        hash_bucket(
            F.concat_ws(
                "_", F.col("k").cast("string"), F.col("b").cast("string")
            ),
            1_000_000,
        ).alias("u"),
    )
    wexpr = F.lit(7)
    for wk in range(len(_POISSON1_CDF_PPM) - 1, -1, -1):
        wexpr = F.when(F.col("u") < _POISSON1_CDF_PPM[wk], wk).otherwise(wexpr)
    weighted = drawn.select("b", "cents", wexpr.alias("w"))
    # the full-sample mean rides along in the SAME aggregate (the
    # unweighted cents sum/count of any one replicate slice IS the
    # full sample), so orders is scanned exactly once
    sw = F.sum("w").cast("double")
    stats = weighted.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("cents")).cast("double")
            # nullif: an all-zero-weight replicate (probability
            # 0.368^n per replicate — real only for toy tables) must
            # yield NULL, not an ANSI division-by-zero crash
            / F.when(sw != 0.0, sw)
        ).alias("mean_cents"),
        (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "mean_full"
        ),
    )
    # NULLS LAST explicitly: Spark's default window order is NULLS
    # FIRST, DuckDB's is NULLS LAST — a NULL replicate mean would
    # silently shift every rank between engines otherwise
    wr = Window.partitionBy().orderBy(
        F.col("mean_cents").asc_nulls_last(), "b"
    )
    ranked = stats.withColumn("rn", F.row_number().over(wr))
    return ranked.agg(
        F.count(F.lit(1)).alias("b_count"),
        F.round(F.max("mean_full"), 6).alias("mean_cents_full"),
        F.round(
            F.max(F.when(F.col("rn") == 4, F.col("mean_cents"))), 6
        ).alias("ci_lo_cents"),
        F.round(
            F.max(F.when(F.col("rn") == _BOOTSTRAP_B - 3, F.col("mean_cents"))),
            6,
        ).alias("ci_hi_cents"),
    )


def _poisson_case_sql(u_expr: str) -> str:
    branches = "".join(
        f" WHEN {u_expr} < {ppm} THEN {k}"
        for k, ppm in enumerate(_POISSON1_CDF_PPM)
    )
    return f"CASE{branches} ELSE 7 END"


_BOOTSTRAP_SQL = f"""
WITH cents AS (
  SELECT o_orderkey AS k,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
reps AS (
  SELECT k, cents, CAST(i AS BIGINT) AS b
  FROM cents, generate_series(0, {_BOOTSTRAP_B - 1}) t(i)),
drawn AS (
  SELECT b, cents,
         CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || '_'
                                  || CAST(b AS VARCHAR)), 1, 7)) AS BIGINT)
           % 1000000 AS u
  FROM reps),
weighted AS (
  SELECT b, cents, {_poisson_case_sql('u')} AS w
  FROM drawn),
stats AS (
  SELECT b, CAST(sum(w * cents) AS DOUBLE)
              / nullif(CAST(sum(w) AS DOUBLE), 0.0) AS mean_cents,
         CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_full
  FROM weighted GROUP BY b),
ranked AS (
  SELECT mean_cents, mean_full,
         row_number() OVER (ORDER BY mean_cents NULLS LAST, b) AS rn
  FROM stats)
SELECT CAST(count(*) AS BIGINT) AS b_count,
       round(max(mean_full), 6) AS mean_cents_full,
       round(max(CASE WHEN rn = 4 THEN mean_cents END), 6) AS ci_lo_cents,
       round(max(CASE WHEN rn = {_BOOTSTRAP_B - 3} THEN mean_cents END), 6)
         AS ci_hi_cents
FROM ranked
"""


# --- lang_temperature_mixture ----------------------------------------------


def _lang_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-α=0.5 language rebalancing: target share ∝ √n_l.

    √ via ``floor(sqrt(n·1e6))`` stays exact integer (n ≤ ~1e11 keeps
    the true √ more than an ulp from the floor boundary), so shares
    are integer permille; the feasible-total and md5-membership steps
    mirror ``source_mixture_resample`` (training.py).  Output is the
    per-lang audit (before/after/target) — the recipe table a corpus
    build would log."""
    docs = load(spark, sf_dir, "documents")
    # lineage cut on the lang-grain counts (a handful of rows): rates'
    # DAG is referenced by both the membership filter and the final
    # audit join, and tmin/tot re-embed the counts — without the cut
    # Catalyst re-runs the corpus scan+agg ~9 times (the
    # theil_sen_trend lesson); with it, documents is scanned twice
    # (counts + membership), the same shape as source_mixture_resample
    counts = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    weights = counts.select(
        "lang",
        "n",
        F.floor(F.sqrt(F.col("n").cast("double") * 1_000_000))
        .cast("long")
        .alias("w"),
    )
    tot = weights.agg(F.sum("w").alias("sw"))
    shares = weights.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.expr("w * 1000 div sw").alias("target_share_permille"),
        (F.col("n").cast("double") / F.col("w").cast("double")).alias(
            "n_over_w"
        ),
        F.col("w").cast("double").alias("wd"),
    )
    tmin = shares.agg(F.min("n_over_w").alias("t"))
    rates = shares.crossJoin(F.broadcast(tmin)).select(
        "lang",
        "n",
        "target_share_permille",
        F.least(
            F.lit(1000).cast("long"),
            F.floor(
                F.lit(1000.0) * F.col("t") * F.col("wd") / F.col("n").cast("double")
            ).cast("long"),
        ).alias("rate"),
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(hash_bucket(F.col("doc_id"), 1000) < F.col("rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_before"),
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
            "target_share_permille",
        )
        .orderBy("lang")
    )


_TEMPERATURE_SQL = f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
w AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000)) AS BIGINT) AS w
  FROM c),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM w),
shares AS (
  SELECT lang, n, CAST(w * 1000 // sw AS BIGINT) AS target_share_permille,
         CAST(n AS DOUBLE) / CAST(w AS DOUBLE) AS n_over_w,
         CAST(w AS DOUBLE) AS wd
  FROM w CROSS JOIN tot),
tmin AS (SELECT min(n_over_w) AS t FROM shares),
rates AS (
  SELECT lang, n, target_share_permille,
         least(CAST(1000 AS BIGINT),
               CAST(floor(1000.0 * t * wd / CAST(n AS DOUBLE)) AS BIGINT))
           AS rate
  FROM shares CROSS JOIN tmin),
kept AS (
  SELECT d.lang, count(*) AS n_after
  FROM documents d JOIN rates USING (lang)
  WHERE {_md5_bucket_sql('d.doc_id', 1000)} < rate
  GROUP BY d.lang)
SELECT rates.lang, CAST(n AS BIGINT) AS n_before,
       CAST(coalesce(n_after, 0) AS BIGINT) AS n_after,
       target_share_permille
FROM rates LEFT JOIN kept ON rates.lang = kept.lang
ORDER BY rates.lang
"""


# --- autocorr_daily_revenue ------------------------------------------------


def _autocorr_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson autocorrelation of daily revenue cents at lags 1 and 7.

    Scale: events collapse to day grain map-side; the lag windows and
    the moment sums run over the calendar-length series in exact
    DECIMAL(38,0) arithmetic (int64 moments overflow at just ~300
    days of 1e7-cent days — a decade-scale stress run caught it).
    The decimal envelope is set by the downstream PRODUCT n·Σxy ≈
    (d·x̄)², capped at precision 38: exact while d·x̄ < 1e19, e.g.
    1e5 days of 1e14-cent ($1T) days — far beyond any workload.  The
    variance denominators are cast to DOUBLE *before* multiplying
    (their exact product could exceed even decimal range), and the
    ratio is nullif-guarded for a constant series (variance 0 → NULL
    on both engines, not an ANSI-mode crash); numerator and
    denominators are value-identical across engines, so the final
    ratio is too."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        ).alias("c")
    )
    # both lags come out of ONE ordered window pass over the
    # calendar-grain series, both moment sets out of ONE aggregate —
    # events is scanned exactly once; the per-lag rows are exploded
    # from the single moments row
    w = Window.partitionBy().orderBy("day")
    lagged = daily.select(
        F.col("c").alias("x"),
        F.lag("c", 1).over(w).alias("y1"),
        F.lag("c", 7).over(w).alias("y7"),
    )

    def moments(y: str) -> list:
        # every product and sum runs in DECIMAL(38,0): int64 overflows
        # at ~300 days of 1e7-cent days (caught by a decade-scale
        # stress run — ANSI Spark throws where DuckDB's HUGEINT sails
        # on), decimal is exact to 1e38 on both engines and the series
        # is day-grain, so the wider arithmetic costs nothing
        yl, xl = F.col(y), F.when(F.col(y).isNotNull(), F.col("x"))
        yc, xc = yl.cast("decimal(38,0)"), xl.cast("decimal(38,0)")
        return [
            F.count(yl).alias(f"n_{y}"),
            F.sum(xc).alias(f"sx_{y}"),
            F.sum(yc).alias(f"sy_{y}"),
            F.sum(xc * yc).alias(f"sxy_{y}"),
            F.sum(xc * xc).alias(f"sxx_{y}"),
            F.sum(yc * yc).alias(f"syy_{y}"),
        ]

    m = lagged.agg(*(moments("y1") + moments("y7")))

    def corr_row(k: int, y: str):
        n, sx, sy = F.col(f"n_{y}"), F.col(f"sx_{y}"), F.col(f"sy_{y}")
        sxy, sxx, syy = (
            F.col(f"sxy_{y}"),
            F.col(f"sxx_{y}"),
            F.col(f"syy_{y}"),
        )
        den = F.sqrt(
            (n * sxx - sx * sx).cast("double")
            * (n * syy - sy * sy).cast("double")
        )
        r = F.round(
            (n * sxy - sx * sy).cast("double")
            # nullif: a constant series has zero variance — NULL, not
            # an ANSI division-by-zero crash (DuckDB nullif mirrors)
            / F.when(den != 0.0, den),
            9,
        )
        return F.struct(
            F.lit(k).cast("long").alias("lag"),
            n.cast("long").alias("n_pairs"),
            r.alias("autocorr"),
        )

    return m.select(
        F.explode(F.array(corr_row(1, "y1"), corr_row(7, "y7"))).alias("o")
    ).select("o.lag", "o.n_pairs", "o.autocorr")


_AUTOCORR_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS c
  FROM events GROUP BY 1),
lagged AS (
  SELECT c AS x, lag(c, 1) OVER (ORDER BY day) AS y1,
         lag(c, 7) OVER (ORDER BY day) AS y7
  FROM daily),
m1 AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y1) AS sy, sum(x * y1) AS sxy,
         sum(x * x) AS sxx, sum(y1 * y1) AS syy
  FROM lagged WHERE y1 IS NOT NULL),
m7 AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y7) AS sy, sum(x * y7) AS sxy,
         sum(x * x) AS sxx, sum(y7 * y7) AS syy
  FROM lagged WHERE y7 IS NOT NULL)
SELECT CAST(1 AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE)), 0.0), 9)
         AS autocorr
FROM m1
UNION ALL
SELECT CAST(7 AS BIGINT), CAST(n AS BIGINT),
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE)), 0.0), 9)
FROM m7
"""


# --- hard_negative_mining --------------------------------------------------


def _hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest DIFFERENT-label neighbor for each anchor — broadcast
    anchors × one corpus scan (the `cosine_topk` shape plus a label
    inequality in the join), round-then-rank with id tie-break."""
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _dot,
        with_double_embedding,
    )

    emb = with_double_embedding(load(spark, sf_dir, "embeddings"))
    anchors = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("a_vec"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("a_norm"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("negative_id"),
        F.col("label").alias("negative_label"),
        F.col("embedding").alias("c_vec"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("c_norm"),
    )
    pairs = F.broadcast(anchors).join(
        corpus, F.col("anchor_label") != F.col("negative_label")
    )
    from data_pipeline_bigquery_spark.extensions.similarity import _nz

    # rule 9: zero-norm vectors -> NULL cosine on both engines
    sim = _dot(F.col("a_vec"), F.col("c_vec")) / _nz(
        F.col("a_norm") * F.col("c_norm")
    )
    scored = pairs.select(
        "anchor_id",
        "anchor_label",
        "negative_id",
        "negative_label",
        F.round(sim, 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine_sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cosine_sim",
        )
    )


_HARD_NEGATIVE_SQL = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
a AS (SELECT * FROM e WHERE vec_id < 12),
scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         round(list_dot_product(a.v, c.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine_sim
  FROM a JOIN e c ON a.label != c.label)
SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label,
       negative_id, CAST(negative_label AS INT) AS negative_label,
       cosine_sim
FROM (SELECT *, row_number() OVER (
        PARTITION BY anchor_id
        ORDER BY cosine_sim DESC, negative_id) AS rn
      FROM scored)
WHERE rn = 1
"""


# --- l_diversity_audit -----------------------------------------------------


def _l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of l = count(DISTINCT sensitive band) per
    quasi-identifier group — two keyed aggs, grid-bounded output."""
    cust = load(spark, sf_dir, "customer")
    banded = cust.select(
        "c_mktsegment",
        "c_nationkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("band"),
    )
    groups = banded.groupBy("c_mktsegment", "c_nationkey").agg(
        F.countDistinct("band").alias("l"),
        F.count(F.lit(1)).alias("n_members"),
    )
    return (
        groups.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_members").alias("n_customers"),
        )
        .orderBy("l")
    )


_L_DIVERSITY_SQL = """
WITH banded AS (
  SELECT c_mktsegment, c_nationkey,
         CASE WHEN c_acctbal < 0 THEN 'negative'
              WHEN c_acctbal < 5000 THEN 'mid'
              ELSE 'high' END AS band
  FROM customer),
g AS (
  SELECT c_mktsegment, c_nationkey,
         count(DISTINCT band) AS l, count(*) AS n_members
  FROM banded GROUP BY 1, 2)
SELECT CAST(l AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(n_members) AS BIGINT) AS n_customers
FROM g GROUP BY l ORDER BY l
"""


# --- funnel_conversion_lag_percentiles -------------------------------------


def _funnel_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/50/75 of the signup→first-purchase lag (minutes) plus the
    conversion rate — the time-to-value readout behind activation
    dashboards.

    One events scan → user-grain conditional min aggregate (first
    signup, first purchase AFTER it) → minute-grain cumulative
    histogram with the integer rank rule ``cum·100 ≥ p·total`` (the
    `order_gap_percentiles` machinery — minute grain keeps the
    domain calendar-bounded at any event volume, ~43k values/month)."""
    events = load(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("signup_ts"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("any_purchase"),
    )
    # min purchase overall can precede signup, so the lag counts only
    # when ordering holds (NULL otherwise — not converted); integer
    # minute floor on both engines.  The user-grain frame feeds BOTH
    # the histogram and the scalar funnel counts — localCheckpoint so
    # events is scanned once (user grain is the natural persist point
    # at scale, orders of magnitude smaller than the fact table)
    lagged = users.select(
        F.when(
            F.col("any_purchase") >= F.col("signup_ts"),
            F.expr(
                "(unix_timestamp(any_purchase)"
                " - unix_timestamp(signup_ts)) div 60"
            ),
        )
        .cast("long")
        .alias("lag_min"),
        F.col("signup_ts").isNotNull().cast("int").alias("signed_up"),
    ).localCheckpoint()
    grain = (
        lagged.filter(F.col("lag_min").isNotNull() & (F.col("signed_up") == 1))
        .groupBy("lag_min")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = cumulative_value_histogram(grain, "lag_min")
    signups = lagged.agg(
        F.sum("signed_up").alias("n_signups"),
        F.sum(
            F.when(F.col("lag_min").isNotNull() & (F.col("signed_up") == 1), 1)
            .otherwise(0)
        ).alias("n_converted"),
    )
    stats = cum.agg(
        rank_rule_pct(25, "lag_min").alias("p25_lag_min"),
        rank_rule_pct(50, "lag_min").alias("p50_lag_min"),
        rank_rule_pct(75, "lag_min").alias("p75_lag_min"),
    )
    return (
        signups.crossJoin(F.broadcast(stats))
        .select(
            F.col("n_signups").cast("long").alias("n_signups"),
            F.col("n_converted").cast("long").alias("n_converted"),
            F.expr(
                "n_converted * 1000 div nullif(n_signups, 0)"
            ).alias("conversion_permille"),
            F.col("p25_lag_min").cast("long").alias("p25_lag_min"),
            F.col("p50_lag_min").cast("long").alias("p50_lag_min"),
            F.col("p75_lag_min").cast("long").alias("p75_lag_min"),
        )
    )


_FUNNEL_LAG_SQL = """
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS any_purchase
  FROM events GROUP BY user_id),
lagged AS (
  SELECT CASE WHEN any_purchase >= signup_ts
              THEN CAST(date_diff('second', signup_ts, any_purchase) // 60
                        AS BIGINT) END AS lag_min,
         CASE WHEN signup_ts IS NOT NULL THEN 1 ELSE 0 END AS signed_up
  FROM u),
grain AS (
  SELECT lag_min, count(*) AS c FROM lagged
  WHERE lag_min IS NOT NULL AND signed_up = 1 GROUP BY 1),
cum AS (
  SELECT lag_min,
         sum(c) OVER (ORDER BY lag_min
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS total
  FROM grain),
s AS (
  SELECT CAST(sum(signed_up) AS BIGINT) AS n_signups,
         CAST(sum(CASE WHEN lag_min IS NOT NULL AND signed_up = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
  FROM lagged),
p AS (
  SELECT
    CAST(min(CASE WHEN cum * 100 >= 25 * total THEN lag_min END) AS BIGINT)
      AS p25_lag_min,
    CAST(min(CASE WHEN cum * 100 >= 50 * total THEN lag_min END) AS BIGINT)
      AS p50_lag_min,
    CAST(min(CASE WHEN cum * 100 >= 75 * total THEN lag_min END) AS BIGINT)
      AS p75_lag_min
  FROM cum)
SELECT n_signups, n_converted,
       CAST(n_converted * 1000 // nullif(n_signups, 0) AS BIGINT)
         AS conversion_permille,
       p25_lag_min, p50_lag_min, p75_lag_min
FROM s CROSS JOIN p
"""


# --- iqr_outlier_audit -----------------------------------------------------


def _iqr_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type: Q1/Q3 from the
    cents-domain cumulative histogram (exact integer rank rule), the
    1.5·IQR fences kept integer by working in HALF-cents
    (lo = 2·Q1 − 3·IQR, hi = 2·Q3 + 3·IQR), and the outlier count
    summed from the SAME histogram — one fact scan total, everything
    after runs on the value-domain grain."""
    events = load(spark, sf_dir, "events")
    # the value-domain histogram feeds BOTH the quartile windows and
    # the outlier recount — localCheckpoint so the fact table is
    # scanned once (the domain grain is the natural persist point)
    # a NULL value has no place in a value histogram: drop it on BOTH
    # engines (NULL cents would shift the rank windows NULLS FIRST vs
    # NULLS LAST — rule 11)
    hist = (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias(
                "cents"
            ),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    cum = cumulative_value_histogram(
        hist, "cents", partition_cols=("event_type",)
    )
    quartiles = cum.groupBy("event_type").agg(
        F.max("total").alias("n"),
        rank_rule_pct(25, "cents").alias("q1_cents"),
        rank_rule_pct(75, "cents").alias("q3_cents"),
    )
    fenced = quartiles.select(
        "event_type",
        "n",
        "q1_cents",
        "q3_cents",
        (F.col("q3_cents") - F.col("q1_cents")).alias("iqr_cents"),
        (
            2 * F.col("q1_cents")
            - 3 * (F.col("q3_cents") - F.col("q1_cents"))
        ).alias("lo_half"),
        (
            2 * F.col("q3_cents")
            + 3 * (F.col("q3_cents") - F.col("q1_cents"))
        ).alias("hi_half"),
    )
    outliers = (
        hist.join(F.broadcast(fenced), "event_type")
        .filter(
            (F.col("cents") * 2 < F.col("lo_half"))
            | (F.col("cents") * 2 > F.col("hi_half"))
        )
        .groupBy("event_type")
        .agg(F.sum("c").alias("n_outliers"))
    )
    return (
        fenced.join(outliers, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            "q1_cents",
            "q3_cents",
            "iqr_cents",
            F.coalesce(F.col("n_outliers"), F.lit(0))
            .cast("long")
            .alias("n_outliers"),
            F.expr(
                "coalesce(n_outliers, 0) * 1000 div n"
            ).alias("outlier_permille"),
        )
        .orderBy("event_type")
    )


_IQR_SQL = """
WITH hist AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         count(*) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
cum AS (
  SELECT event_type, cents, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY cents
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS total
  FROM hist),
q AS (
  SELECT event_type, CAST(max(total) AS BIGINT) AS n,
         CAST(min(CASE WHEN cum * 100 >= 25 * total THEN cents END)
              AS BIGINT) AS q1_cents,
         CAST(min(CASE WHEN cum * 100 >= 75 * total THEN cents END)
              AS BIGINT) AS q3_cents
  FROM cum GROUP BY event_type),
f AS (
  SELECT *, q3_cents - q1_cents AS iqr_cents,
         2 * q1_cents - 3 * (q3_cents - q1_cents) AS lo_half,
         2 * q3_cents + 3 * (q3_cents - q1_cents) AS hi_half
  FROM q),
o AS (
  SELECT hist.event_type, CAST(sum(c) AS BIGINT) AS n_outliers
  FROM hist JOIN f ON hist.event_type = f.event_type
  WHERE cents * 2 < lo_half OR cents * 2 > hi_half
  GROUP BY hist.event_type)
SELECT f.event_type, n, q1_cents, q3_cents, iqr_cents,
       CAST(coalesce(n_outliers, 0) AS BIGINT) AS n_outliers,
       CAST(coalesce(n_outliers, 0) * 1000 // n AS BIGINT)
         AS outlier_permille
FROM f LEFT JOIN o ON f.event_type = o.event_type
ORDER BY f.event_type
"""


QUERIES: dict[str, QuerySpec] = {
    "ab_test_lift": QuerySpec(_ab_test_lift, _AB_TEST_SQL),
    "funnel_conversion_lag_percentiles": QuerySpec(
        _funnel_conversion_lag, _FUNNEL_LAG_SQL
    ),
    "iqr_outlier_audit": QuerySpec(_iqr_outlier_audit, _IQR_SQL),
    "diff_in_diff_revenue": QuerySpec(_diff_in_diff_revenue, _DID_SQL),
    "theil_sen_trend": QuerySpec(_theil_sen_trend, _THEIL_SEN_SQL),
    "bootstrap_ci_revenue": QuerySpec(_bootstrap_ci_revenue, _BOOTSTRAP_SQL),
    "lang_temperature_mixture": QuerySpec(
        _lang_temperature_mixture, _TEMPERATURE_SQL
    ),
    "autocorr_daily_revenue": QuerySpec(
        _autocorr_daily_revenue, _AUTOCORR_SQL
    ),
    "hard_negative_mining": QuerySpec(
        _hard_negative_mining, _HARD_NEGATIVE_SQL
    ),
    "l_diversity_audit": QuerySpec(_l_diversity_audit, _L_DIVERSITY_SQL),
}
