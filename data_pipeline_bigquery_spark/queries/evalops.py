"""Evaluation & contract ops — the measurement layer a production
pipeline runs ON ITS OWN outputs:

- ``cuped_adjusted_lift``: the CUPED variance-reduced experiment
  readout (pre-period revenue as the covariate) — the standard
  trick for shrinking A/B confidence intervals without more traffic.
  θ = cov(X,Y)/var(X) from five exact-BIGINT moments; the adjusted
  lift uses the algebraic simplification
  lift_cuped = lift_raw − θ·(x̄_T − x̄_C) (the global-mean term
  cancels), so only a handful of identically-shaped IEEE ops run.
- ``forecast_backtest_mae``: rolling-origin backtest of the two
  forecasting baselines every model must beat — naive (ŷ_t=y_{t−1})
  and seasonal-naive (ŷ_t=y_{t−7}) — on the daily event series,
  scored by integer MAE (milli-units).  Same one-scan / one-window /
  one-aggregate shape as ``autocorr_daily_revenue``.
- ``data_expectations_report``: a declarative expectation suite over
  ``orders`` (the Great-Expectations shape): not-null, uniqueness,
  numeric range, a soft cap that genuinely fires, set membership,
  date sanity, and referential integrity to ``customer`` — all
  seven rules in ONE aggregate over one joined scan, emitted as one
  row per rule.
- ``retrieval_eval_precision``: IR-eval of the BM25-lite ranking
  (`keyword_search_bm25lite`) against an independent relevance
  judgment (doc contains ≥2 of the 3 query terms): hits@10,
  precision@10 and recall@10 in integer permille.
- ``uplift_by_segment``: heterogeneous treatment effect — the
  ``ab_test_lift`` arms broken down by customer market segment
  (events.user_id is drawn from the customer key space), the
  readout that catches an experiment helping one segment while
  hurting another.

Reference parity: the reference ETL (main.py:13-54) ships data but
never evaluates it; these are the scale-out extensions that close the
loop.  Parity devices follow the house rules (exact-integer moments,
permille shares, nullif-guarded ratios, order-statistic selections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec

from data_pipeline_bigquery_spark.queries.analytics9 import _md5_bucket_sql

# the experiment arm idiom — one definition (analytics9) for all keys
_MD5_ARM = _md5_bucket_sql("user_id", 2)


# --- cuped_adjusted_lift ---------------------------------------------------


def _cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One events scan → user grain (pre/post cents + arm) → ONE
    12-term moment aggregate → 1-row readout.

    The covariance moments run in DECIMAL(38,0): the int64 envelope
    for n·Σxy is only ~3k users of ~1e6-cent halves.  The decimal
    envelope is set by the downstream product n·Σxy ≈ (n·x̄)², capped
    at precision 38: exact while n·x̄ < 1e19, e.g. a billion users
    averaging 1e10 cents ($100M) per half — far beyond any workload;
    DuckDB widens to HUGEINT on the same exact values, and the
    one double cast at the end is value-identical.  All ratios are
    guarded: zero pre-period variance (θ) and an empty arm produce
    NULL on both engines instead of an ANSI-mode crash."""
    events = load(spark, sf_dir, "events")
    users = (
        events.select(
            "user_id",
            F.when(
                F.dayofmonth("ts") <= 15,
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("pre"),
            F.when(
                F.dayofmonth("ts") > 15,
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("post"),
        )
        .groupBy("user_id")
        .agg(F.sum("pre").alias("x"), F.sum("post").alias("y"))
        .withColumn("arm", hash_bucket(F.col("user_id"), 2))
    )
    t = F.col("arm") == 1
    # covariance moments in DECIMAL(38,0): the int64 envelope for
    # n·Σxy is only ~3k users of 1e6-cent halves (a decade-scale
    # stress run caught the sibling autocorr overflow in practice);
    # decimal sums are exact to 1e38, partial-aggregate fine, and
    # match DuckDB's HUGEINT values bit-for-bit after the double cast
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    m = users.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(F.when(~t, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(t, 1).otherwise(0)).alias("n_treatment"),
        F.sum(F.when(~t, F.col("x")).otherwise(0)).alias("sx_c"),
        F.sum(F.when(t, F.col("x")).otherwise(0)).alias("sx_t"),
        F.sum(F.when(~t, F.col("y")).otherwise(0)).alias("sy_c"),
        F.sum(F.when(t, F.col("y")).otherwise(0)).alias("sy_t"),
    )
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    theta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        # nullif: all-post-period data zeroes the pre-period variance
        / F.when(var_x != 0.0, var_x)
    )

    def mean(s: str, n: str):
        d = F.col(n).cast("double")
        # nullif: an arm can be empty on degenerate inputs (the counts
        # are ELSE-0, so they don't NULL-propagate on their own)
        return F.col(s).cast("double") / F.when(d != 0.0, d)

    lift_raw = mean("sy_t", "n_treatment") - mean("sy_c", "n_control")
    lift_cuped = lift_raw - theta * (
        mean("sx_t", "n_treatment") - mean("sx_c", "n_control")
    )
    return m.select(
        F.col("n_control").cast("long").alias("n_control"),
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.round(theta, 9).alias("theta"),
        F.round(lift_raw, 6).alias("lift_raw_cents"),
        F.round(lift_cuped, 6).alias("lift_cuped_cents"),
    )


_CUPED_SQL = f"""
WITH u AS (
  SELECT user_id,
         sum(CASE WHEN day(ts) <= 15
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS x,
         sum(CASE WHEN day(ts) > 15
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS y,
         {_MD5_ARM} AS arm
  FROM events GROUP BY user_id),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx,
         sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_control,
         sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_treatment,
         sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sx_c,
         sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sx_t,
         sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sy_c,
         sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sy_t
  FROM u)
SELECT CAST(n_control AS BIGINT) AS n_control,
       CAST(n_treatment AS BIGINT) AS n_treatment,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0),
             9) AS theta,
       round(CAST(sy_t AS DOUBLE) / nullif(CAST(n_treatment AS DOUBLE), 0.0)
             - CAST(sy_c AS DOUBLE) / nullif(CAST(n_control AS DOUBLE), 0.0),
             6) AS lift_raw_cents,
       round((CAST(sy_t AS DOUBLE) / nullif(CAST(n_treatment AS DOUBLE), 0.0)
              - CAST(sy_c AS DOUBLE) / nullif(CAST(n_control AS DOUBLE), 0.0))
             - (CAST(n * sxy - sx * sy AS DOUBLE)
                / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))
               * (CAST(sx_t AS DOUBLE)
                  / nullif(CAST(n_treatment AS DOUBLE), 0.0)
                  - CAST(sx_c AS DOUBLE)
                    / nullif(CAST(n_control AS DOUBLE), 0.0)), 6)
         AS lift_cuped_cents
FROM m
"""


# --- forecast_backtest_mae -------------------------------------------------


def _forecast_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin MAE of naive (lag-1) and seasonal-naive (lag-7)
    one-step forecasts of the daily event count.  ONE scan → day
    grain → one ordered window for both lags → one aggregate →
    per-model rows exploded from the single moments row."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy().orderBy("day")
    lagged = daily.select(
        F.col("n").alias("y"),
        F.lag("n", 1).over(w).alias("f1"),
        F.lag("n", 7).over(w).alias("f7"),
    )
    m = lagged.agg(
        F.count("f1").alias("n1"),
        F.sum(F.abs(F.col("y") - F.col("f1"))).alias("e1"),
        F.count("f7").alias("n7"),
        F.sum(F.abs(F.col("y") - F.col("f7"))).alias("e7"),
    )

    def row(model: str, e: str, n: str):
        return F.struct(
            F.lit(model).alias("model"),
            F.col(n).cast("long").alias("n_days"),
            F.col(e).cast("long").alias("total_abs_err"),
            F.expr(f"{e} * 1000 div {n}").cast("long").alias("mae_milli"),
        )

    return (
        m.select(
            F.explode(
                F.array(row("naive", "e1", "n1"), row("seasonal", "e7", "n7"))
            ).alias("o")
        )
        .select("o.model", "o.n_days", "o.total_abs_err", "o.mae_milli")
    )


_BACKTEST_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1),
lagged AS (
  SELECT n AS y, lag(n, 1) OVER (ORDER BY day) AS f1,
         lag(n, 7) OVER (ORDER BY day) AS f7
  FROM daily),
m AS (
  SELECT count(f1) AS n1, sum(abs(y - f1)) AS e1,
         count(f7) AS n7, sum(abs(y - f7)) AS e7
  FROM lagged)
SELECT 'naive' AS model, CAST(n1 AS BIGINT) AS n_days,
       CAST(e1 AS BIGINT) AS total_abs_err,
       CAST(e1 * 1000 // n1 AS BIGINT) AS mae_milli
FROM m
UNION ALL
SELECT 'seasonal', CAST(n7 AS BIGINT), CAST(e7 AS BIGINT),
       CAST(e7 * 1000 // n7 AS BIGINT)
FROM m
"""


# --- data_expectations_report ----------------------------------------------

# rule -> blocking flag; the soft cap is the one warn-level rule (it
# fires on healthy data by design), and the report CARRIES the flag so
# consumers (the data_quality CLI gate) never re-encode the split
_EXPECTATION_RULES = {
    "orderkey_not_null": 1,
    "orderkey_unique": 1,
    "totalprice_positive_bounded": 1,
    "totalprice_below_soft_cap": 0,
    "orderstatus_in_set": 1,
    "orderdate_in_range": 1,
    "custkey_references_customer": 1,
}


def _data_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven declarative rules, one pass: orders left-joins the
    distinct customer keys (the referential probe), every rule is a
    conditional sum in a single aggregate, and the report rows are
    exploded from that one moments row.  The soft cap (400k) is
    deliberately tight enough to FIRE on the fixtures, so the
    violation-counting path is exercised, not just the all-green one.
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    ).distinct().withColumn("ref_ok", F.lit(1))
    j = orders.join(cust, "o_custkey", "left")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("n_key"),
        F.countDistinct("o_orderkey").alias("n_key_distinct"),
        F.sum(
            F.when(
                (F.col("o_totalprice") <= 0)
                | (F.col("o_totalprice") > 1000000)
                | F.col("o_totalprice").isNull(),
                1,
            ).otherwise(0)
        ).alias("v_range"),
        F.sum(
            F.when(F.col("o_totalprice") > 400000, 1).otherwise(0)
        ).alias("v_cap"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(
                0
            )
        ).alias("v_set"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
                | (
                    F.col("o_orderdate")
                    >= F.lit("2031-01-01").cast("timestamp")
                )
                | F.col("o_orderdate").isNull(),
                1,
            ).otherwise(0)
        ).alias("v_date"),
        F.sum(F.when(F.col("ref_ok").isNull(), 1).otherwise(0)).alias(
            "v_ref"
        ),
    )
    viols = {
        "orderkey_not_null": F.col("n") - F.col("n_key"),
        "orderkey_unique": F.col("n_key") - F.col("n_key_distinct"),
        "totalprice_positive_bounded": F.col("v_range"),
        "totalprice_below_soft_cap": F.col("v_cap"),
        "orderstatus_in_set": F.col("v_set"),
        "orderdate_in_range": F.col("v_date"),
        "custkey_references_customer": F.col("v_ref"),
    }
    rows = [
        F.struct(
            F.lit(rule).alias("rule"),
            F.col("n").cast("long").alias("n_checked"),
            viols[rule].cast("long").alias("n_violations"),
            F.when(viols[rule] == 0, 1).otherwise(0).cast("long").alias(
                "passed"
            ),
            F.lit(blocking).cast("long").alias("blocking"),
        )
        for rule, blocking in _EXPECTATION_RULES.items()
    ]
    return (
        m.select(F.explode(F.array(*rows)).alias("o"))
        .select(
            "o.rule", "o.n_checked", "o.n_violations", "o.passed",
            "o.blocking",
        )
    )


_EXPECTATIONS_SQL = """
WITH ck AS (SELECT DISTINCT c_custkey, 1 AS ref_ok FROM customer),
j AS (
  SELECT o.*, ck.ref_ok
  FROM orders o LEFT JOIN ck ON o.o_custkey = ck.c_custkey),
m AS (
  SELECT count(*) AS n, count(o_orderkey) AS n_key,
         count(DISTINCT o_orderkey) AS n_key_distinct,
         sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 1000000
                       OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS v_range,
         sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS v_cap,
         sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                  THEN 1 ELSE 0 END) AS v_set,
         sum(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                       OR o_orderdate >= TIMESTAMP '2031-01-01'
                       OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS v_date,
         sum(CASE WHEN ref_ok IS NULL THEN 1 ELSE 0 END) AS v_ref
  FROM j),
rules AS (
  SELECT 'orderkey_not_null' AS rule, n - n_key AS v, 1 AS b FROM m
  UNION ALL SELECT 'orderkey_unique', n_key - n_key_distinct, 1 FROM m
  UNION ALL SELECT 'totalprice_positive_bounded', v_range, 1 FROM m
  UNION ALL SELECT 'totalprice_below_soft_cap', v_cap, 0 FROM m
  UNION ALL SELECT 'orderstatus_in_set', v_set, 1 FROM m
  UNION ALL SELECT 'orderdate_in_range', v_date, 1 FROM m
  UNION ALL SELECT 'custkey_references_customer', v_ref, 1 FROM m)
SELECT rule, CAST(m.n AS BIGINT) AS n_checked,
       CAST(v AS BIGINT) AS n_violations,
       CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed,
       CAST(b AS BIGINT) AS blocking
FROM rules CROSS JOIN m
"""


# --- retrieval_eval_precision ----------------------------------------------


def _retrieval_eval_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall@10 of the BM25-lite ranking against an
    INDEPENDENT relevance judgment (≥2 of the 3 query terms present).
    Reuses the shared scored arm (`analytics5._bm25_scored`); the two
    1-row aggregates (hits over the top-10, total relevant over the
    corpus) broadcast-join into the readout.  At scale the scored
    frame would be persisted across the two references — the eval's
    cost profile is the search query's."""
    from data_pipeline_bigquery_spark.queries.analytics5 import _bm25_scored

    # the scored arm feeds BOTH the top-10 and the corpus-wide
    # relevant count → lineage cut (rule 14), or documents re-scans 4×
    scored = _bm25_scored(spark, sf_dir).localCheckpoint(eager=False)
    rel = (
        (F.col("tf1") > 0).cast("int")
        + (F.col("tf2") > 0).cast("int")
        + (F.col("tf3") > 0).cast("int")
        >= 2
    ).cast("long")
    top10 = scored.orderBy(F.col("score").desc(), "doc_id").limit(10)
    hits = top10.agg(F.sum(rel).alias("hits_at10"))
    nrel = scored.agg(F.sum(rel).alias("n_relevant"))
    return (
        nrel.crossJoin(F.broadcast(hits))
        .select(
            "n_relevant",
            "hits_at10",
            F.expr("hits_at10 * 1000 div 10").alias(
                "precision_at10_permille"
            ),
            F.expr("hits_at10 * 1000 div nullif(n_relevant, 0)").alias(
                "recall_at10_permille"
            ),
        )
    )


def _retrieval_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics5 import (
        _BM25_SCORED_CTES,
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
top10 AS (SELECT doc_id, is_rel FROM rel
          ORDER BY score DESC, doc_id LIMIT 10),
h AS (SELECT CAST(sum(is_rel) AS BIGINT) AS hits_at10 FROM top10),
nr AS (SELECT CAST(sum(is_rel) AS BIGINT) AS n_relevant FROM rel)
SELECT n_relevant, hits_at10,
       CAST(hits_at10 * 1000 // 10 AS BIGINT) AS precision_at10_permille,
       CAST(hits_at10 * 1000 // nullif(n_relevant, 0) AS BIGINT)
         AS recall_at10_permille
FROM nr CROSS JOIN h
"""


# --- ab_test_power_mde -----------------------------------------------------


def _ab_test_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at the CURRENT arm sizes — the
    experiment-planning readout (α=0.05 two-sided, 80% power):
    MDE = (z_α/2 + z_β)·√(p(1−p)·(1/n_c + 1/n_t)) with the pooled
    baseline rate.  The z constants are frozen literals (1.96, 0.84)
    so no normal-quantile function is needed; sqrt is IEEE-exact and
    the counts are exact integers, so both engines emit the same
    double.  Shares the user-grain arm assignment with
    ``ab_test_lift`` (`analytics9.converted_users`)."""
    from data_pipeline_bigquery_spark.queries.analytics9 import (
        converted_users,
    )

    users = converted_users(load(spark, sf_dir, "events"))
    t = F.col("arm") == 1
    m = users.agg(
        F.sum(F.when(~t, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(t, 1).otherwise(0)).alias("n_treatment"),
        F.sum("converted").alias("conv_total"),
        F.count(F.lit(1)).alias("n_total"),
    )
    mde = (
        "(1.96 + 0.84) * sqrt("
        " (CAST(conv_total AS DOUBLE) / CAST(n_total AS DOUBLE))"
        " * (1.0 - CAST(conv_total AS DOUBLE) / CAST(n_total AS DOUBLE))"
        " * (1.0 / nullif(CAST(n_control AS DOUBLE), 0.0)"
        "    + 1.0 / nullif(CAST(n_treatment AS DOUBLE), 0.0)))"
    )
    return m.select(
        F.col("n_control").cast("long").alias("n_control"),
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.expr("conv_total * 1000 div n_total").alias(
            "baseline_rate_permille"
        ),
        F.expr(f"round({mde}, 9)").alias("mde_abs"),
        F.expr(f"CAST(floor({mde} * 1000) AS BIGINT)").alias(
            "mde_permille"
        ),
    )


def _power_mde_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics9 import (
        CONVERTED_USERS_CTE,
    )

    mde = (
        "(1.96 + 0.84) * sqrt("
        " (CAST(conv_total AS DOUBLE) / CAST(n_total AS DOUBLE))"
        " * (1.0 - CAST(conv_total AS DOUBLE) / CAST(n_total AS DOUBLE))"
        " * (1.0 / nullif(CAST(n_control AS DOUBLE), 0.0)"
        "    + 1.0 / nullif(CAST(n_treatment AS DOUBLE), 0.0)))"
    )
    return f"""
WITH {CONVERTED_USERS_CTE},
m AS (
  SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treatment,
         CAST(sum(converted) AS BIGINT) AS conv_total,
         CAST(count(*) AS BIGINT) AS n_total
  FROM u)
SELECT n_control, n_treatment,
       CAST(conv_total * 1000 // n_total AS BIGINT)
         AS baseline_rate_permille,
       round({mde}, 9) AS mde_abs,
       CAST(floor({mde} * 1000) AS BIGINT) AS mde_permille
FROM m
"""


# --- score_calibration_bins ------------------------------------------------


def _score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the learned quality model: docs bucketed
    by score decile, each bin's mean score (integer millis) against the
    rate at which the independent rule-based cascade
    (`quality_filter_cascade`) passes them — the calibration audit
    that tells you whether the model's scores MEAN anything before you
    threshold on them.

    Scale: the score side is the existing hashed-feature pipeline
    (explode → broadcast weight join → doc agg); the label side is a
    map-side metrics projection; one doc_id equi-join, then a ≤10-row
    aggregate.  All outputs integer (millis/permille)."""
    from data_pipeline_bigquery_spark.extensions.curation import (
        model_quality_score,
    )
    from data_pipeline_bigquery_spark.queries.curation2 import (
        _MEAN_LEN_MAX,
        _MEAN_LEN_MIN,
        _MIN_DISTINCT_PCT,
        _MIN_WORDS,
    )

    docs = load(spark, sf_dir, "documents")
    scored = model_quality_score(docs).select("doc_id", "model_score")
    words = F.split(F.col("text"), " ")
    metrics = docs.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        (F.length("text") - (F.size(words) - 1)).alias("sum_chars"),
        F.arrays_overlap(
            words, F.array(F.lit("the"), F.lit("a"))
        ).alias("has_stop"),
    )
    ok = (
        (F.col("n_words") >= _MIN_WORDS)
        & (F.col("n_distinct") * 100 >= F.col("n_words") * _MIN_DISTINCT_PCT)
        & F.col("has_stop")
        & (F.col("sum_chars") >= _MEAN_LEN_MIN * F.col("n_words"))
        & (F.col("sum_chars") <= _MEAN_LEN_MAX * F.col("n_words"))
    )
    j = scored.join(metrics, "doc_id").select(
        F.least(
            F.lit(9).cast("long"),
            F.floor(F.col("model_score") * 10).cast("long"),
        ).alias("bin"),
        F.floor(F.col("model_score") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("millis"),
        ok.cast("int").alias("ok"),
    )
    return (
        j.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("sum(millis) div count(1)").alias("mean_score_millis"),
            F.expr("sum(ok) * 1000 div count(1)").alias(
                "cascade_pass_permille"
            ),
        )
        .orderBy("bin")
    )


def _calibration_sql() -> str:
    from data_pipeline_bigquery_spark.queries.curation2 import (
        _MEAN_LEN_MAX,
        _MEAN_LEN_MIN,
        _MIN_DISTINCT_PCT,
        _MIN_WORDS,
        _MODEL_SCORE_SQL,
    )

    return f"""
WITH base AS (SELECT * FROM ({_MODEL_SCORE_SQL})),
m AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) - (len(string_split(text, ' ')) - 1) AS sum_chars,
         list_has_any(string_split(text, ' '), ['the', 'a']) AS has_stop
  FROM documents),
j AS (
  SELECT least(CAST(9 AS BIGINT),
               CAST(floor(model_score * 10) AS BIGINT)) AS bin,
         CAST(floor(model_score * 1000 + 0.5) AS BIGINT) AS millis,
         CASE WHEN n_words >= {_MIN_WORDS}
                   AND n_distinct * 100 >= n_words * {_MIN_DISTINCT_PCT}
                   AND has_stop
                   AND sum_chars >= {_MEAN_LEN_MIN} * n_words
                   AND sum_chars <= {_MEAN_LEN_MAX} * n_words
              THEN 1 ELSE 0 END AS ok
  FROM base JOIN m ON base.doc_id = m.doc_id)
SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(millis) // count(*) AS BIGINT) AS mean_score_millis,
       CAST(sum(ok) * 1000 // count(*) AS BIGINT) AS cascade_pass_permille
FROM j GROUP BY bin ORDER BY bin
"""


# --- uplift_by_segment -----------------------------------------------------


def _uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `ab_test_lift` arms × customer market segment — per-segment
    conversion lift in integer permille points (nullif-guarded: a
    fixture segment may miss an arm).  User-grain agg (SHARED with
    ab_test_lift via `analytics9.converted_users`, so the breakdown
    can never decouple from the headline readout), equi-join to
    customer, 5-row segment aggregate."""
    from data_pipeline_bigquery_spark.queries.analytics9 import (
        converted_users,
    )

    users = converted_users(load(spark, sf_dir, "events"))
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    t = F.col("arm") == 1
    seg = (
        users.join(cust, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(~t, 1).otherwise(0)).alias("n_control"),
            F.sum(F.when(~t, F.col("converted")).otherwise(0)).alias(
                "conv_control"
            ),
            F.sum(F.when(t, 1).otherwise(0)).alias("n_treatment"),
            F.sum(F.when(t, F.col("converted")).otherwise(0)).alias(
                "conv_treatment"
            ),
        )
    )
    return seg.select(
        "c_mktsegment",
        F.col("n_control").cast("long").alias("n_control"),
        F.col("conv_control").cast("long").alias("conv_control"),
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.col("conv_treatment").cast("long").alias("conv_treatment"),
        F.expr(
            "conv_treatment * 1000 div nullif(n_treatment, 0)"
            " - conv_control * 1000 div nullif(n_control, 0)"
        ).alias("lift_permille_points"),
    ).orderBy("c_mktsegment")


def _uplift_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics9 import (
        CONVERTED_USERS_CTE,
    )

    return f"""
WITH {CONVERTED_USERS_CTE},
seg AS (
  SELECT c_mktsegment,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_control,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treatment,
         CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT)
           AS conv_treatment
  FROM u JOIN customer ON u.user_id = customer.c_custkey
  GROUP BY c_mktsegment)
SELECT c_mktsegment, n_control, conv_control, n_treatment, conv_treatment,
       CAST(conv_treatment * 1000 // nullif(n_treatment, 0)
            - conv_control * 1000 // nullif(n_control, 0) AS BIGINT)
         AS lift_permille_points
FROM seg ORDER BY c_mktsegment
"""



QUERIES: dict[str, QuerySpec] = {
    "cuped_adjusted_lift": QuerySpec(_cuped_adjusted_lift, _CUPED_SQL),
    "forecast_backtest_mae": QuerySpec(
        _forecast_backtest_mae, _BACKTEST_SQL
    ),
    "data_expectations_report": QuerySpec(
        _data_expectations_report, _EXPECTATIONS_SQL
    ),
    "retrieval_eval_precision": QuerySpec(
        _retrieval_eval_precision, _retrieval_sql()
    ),
    "uplift_by_segment": QuerySpec(_uplift_by_segment, _uplift_sql()),
    "score_calibration_bins": QuerySpec(
        _score_calibration_bins, _calibration_sql()
    ),
    "ab_test_power_mde": QuerySpec(_ab_test_power_mde, _power_mde_sql()),
}
