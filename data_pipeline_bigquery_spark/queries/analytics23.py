"""Analytics batch 23 — privacy estimation, changepoint/association
tests, classifier-eval and ER-blocking keys:

- ``randomized_response_audit``: local-DP frequency estimation audit —
  basic one-hot randomized response over event types (per-(event,type)
  bit flipped w.p. 1/4, md5-deterministic so both engines flip the
  SAME coins, rule 5) and the exact unbiased inversion
  ``est·2 = 4·reported − n`` next to the true count.  The privacy
  family's estimator leg (k-anonymity/l-diversity/t-closeness audit
  the data; this audits the MECHANISM).
- ``pettitt_changepoint``: rank-based changepoint on daily revenue —
  Pettitt's U_t via the O(n log n) rank identity (U_t = Σ_{i≤t} d_i,
  d_i = #less − #greater), never the n² pair join; exact integers,
  argmax day flagged with a full tie-break.
- ``precision_recall_curve``: exact PR points for the discount-based
  return predictor at every distinct score threshold — cumulative
  integer TP/FP/FN down the score-sorted grid, permille precision /
  recall (integer div, rule 5).
- ``mcnemar_detector_disagreement``: the paired marginal-homogeneity
  complement to ``cohens_kappa_detectors`` — same two duplicate
  detectors, discordant-pair counts b/c and the McNemar statistic
  (b−c)²·1000/(b+c), moment products in DECIMAL(38,0) internally
  (rule 10/27: only BIGINTs emitted).
- ``copurchase_degree_assortativity``: degree assortativity of the
  co-purchase graph — Pearson r of endpoint degrees over the
  SYMMETRIZED edge list, where identical marginals collapse r to
  cov_num/var_num exactly (one integer-e6 division, no sqrt).
- ``phonetic_block_profile``: ER blocking-key profiler — vowel-drop
  phonetic key of the part name's first word (regex identical on both
  engines; NO backreference collapse — RE2/DuckDB lacks backrefs),
  per-key part counts and the pair budget a blocked matcher would pay.
- ``kendall_tau_daily_metrics``: Kendall concordance between daily
  revenue and order count — concordant/discordant/tie counts over the
  calendar-bounded day-pair grid (n ≈ 2.4k days regardless of SF, so
  the pair join is O(days²), NOT O(orders²)), tau-a in exact e6.

Reference parity: the reference pipeline (main.py:13-54) has no
privacy/stats/eval layer — scale-out extensions in the same spirit as
batches 5-22.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

_US_PER_DAY = 86_400_000_000

# --- randomized_response_audit ---------------------------------------------------

# flip probability f = 1/4 (bucket 0 of 4): est = (rep − n·f)/(1 − 2f)
# = 2·rep − n/2; emitted ×2 so the estimator stays an exact integer.
_RR_BUCKETS = 4


def _randomized_response_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-hot randomized response over event types (see module doc).

    Scale shape: the grain is |events| × |types| with the 5-row type
    table broadcast — linear in events, one hash-aggregate back down
    to |types| rows.  The md5 coin is keyed on (event_id, type) so
    every bit has an independent, deterministic flip.
    """
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    ev = (
        load(spark, sf_dir, "events")
        # event_id NOT NULL is load-bearing for parity: the md5 coin is
        # keyed on it, and a NULL id makes Spark's concat_ws SKIP the
        # NULL while the oracle's '||' nullifies the whole key — the
        # engines would flip different coins (review r10)
        .filter(
            F.col("event_type").isNotNull() & F.col("event_id").isNotNull()
        )
        .select("event_id", "event_type")
    )
    types = ev.select(F.col("event_type").alias("t")).distinct()
    grain = ev.crossJoin(F.broadcast(types))
    bit = F.when(F.col("event_type") == F.col("t"), F.lit(1)).otherwise(
        F.lit(0)
    )
    flip = F.when(
        hash_bucket(
            F.concat_ws("_", F.col("event_id").cast("string"), F.col("t")),
            _RR_BUCKETS,
        )
        == 0,
        F.lit(1),
    ).otherwise(F.lit(0))
    reported = (bit + flip) - 2 * bit * flip  # XOR on 0/1 ints
    return (
        grain.select(
            F.col("t").alias("event_type"),
            bit.alias("b"),
            reported.alias("r"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("b").cast("long").alias("true_count"),
            F.sum("r").cast("long").alias("reported_count"),
        )
        .select(
            "event_type",
            "n_events",
            "true_count",
            "reported_count",
            F.expr("4 * reported_count - n_events").alias("est_count_x2"),
            F.expr(
                "4 * reported_count - n_events - 2 * true_count"
            ).alias("est_error_x2"),
        )
        .orderBy("event_type")
    )


_RR_SQL = f"""
WITH ev AS (
  SELECT event_id, event_type FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL),
types AS (SELECT DISTINCT event_type AS t FROM ev),
grain AS (
  SELECT e.event_id, t.t,
         CASE WHEN e.event_type = t.t THEN 1 ELSE 0 END AS b,
         CASE WHEN CAST(('0x' || substr(md5(
                  CAST(e.event_id AS VARCHAR) || '_' || t.t), 1, 7))
                AS BIGINT) % {_RR_BUCKETS} = 0 THEN 1 ELSE 0 END AS f
  FROM ev e CROSS JOIN types t),
agg AS (
  SELECT t AS event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(b) AS BIGINT) AS true_count,
         CAST(sum(b + f - 2 * b * f) AS BIGINT) AS reported_count
  FROM grain GROUP BY 1)
SELECT event_type, n_events, true_count, reported_count,
       4 * reported_count - n_events AS est_count_x2,
       4 * reported_count - n_events - 2 * true_count AS est_error_x2
FROM agg ORDER BY event_type
"""


# --- pettitt_changepoint ---------------------------------------------------------


def _daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            F.expr(f"unix_micros(o_orderdate) div {_US_PER_DAY}").alias(
                "day"
            ),
            F.expr(
                "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("day")
        .agg(
            # coalesce is load-bearing (rule 11): an all-NULL-price day
            # would rank NULLS FIRST in Spark vs LAST in DuckDB and
            # shift every Pettitt u_stat after it (review r10)
            F.coalesce(F.sum("cents"), F.lit(0))
            .cast("long")
            .alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_DAILY_CTE = f"""
daily AS (
  SELECT epoch_us(o_orderdate) // {_US_PER_DAY} AS day,
         CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)),
                       0) AS BIGINT) AS rev_cents,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
"""


def _pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt test via the rank identity (see module doc).

    d_i = (#j: x_j < x_i) − (#j: x_j > x_i) = 2·(rank−1) + ties − n
    (rank() = strict-less count + 1 on both engines); U_t is the
    running prefix sum of d in day order.  Windows are over the DAY
    grain — calendar-bounded (~2.4k rows at any SF), so the empty-
    partition windows here never become data-proportional.
    """
    daily = _daily_revenue(spark, sf_dir)
    w_all = Window.partitionBy(F.lit(1))
    d = (
        daily.withColumn("rk", F.rank().over(Window.orderBy("rev_cents")))
        .withColumn(
            "ties", F.count(F.lit(1)).over(Window.partitionBy("rev_cents"))
        )
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("d", F.expr("2 * (rk - 1) + ties - n"))
    )
    u = d.withColumn(
        "u_stat",
        F.sum("d").over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("k_stat", F.max(F.abs(F.col("u_stat"))).over(w_all))
    return (
        u.withColumn(
            "cp_day",
            F.min(
                F.when(F.abs(F.col("u_stat")) == F.col("k_stat"), F.col("day"))
            ).over(w_all),
        )
        .select(
            "day",
            "rev_cents",
            F.col("u_stat").cast("long").alias("u_stat"),
            (F.col("day") == F.col("cp_day")).alias("is_changepoint"),
        )
        .orderBy("day")
    )


_PETTITT_SQL = f"""
WITH {_DAILY_CTE},
d AS (
  SELECT day, rev_cents,
         2 * (rank() OVER (ORDER BY rev_cents) - 1)
           + count(*) OVER (PARTITION BY rev_cents)
           - count(*) OVER () AS d
  FROM daily),
u AS (
  SELECT day, rev_cents,
         CAST(sum(d) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS u_stat
  FROM d),
k AS (SELECT *, max(abs(u_stat)) OVER () AS k_stat FROM u),
cp AS (
  SELECT *, min(CASE WHEN abs(u_stat) = k_stat THEN day END) OVER ()
         AS cp_day
  FROM k)
SELECT day, rev_cents, u_stat, day = cp_day AS is_changepoint
FROM cp ORDER BY day
"""


# --- precision_recall_curve ------------------------------------------------------


def _precision_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PR points for score = discount-permille, label = returned.

    Grouped to the distinct-score grid first (≤ ~11 rows), then two
    cumulative windows down the threshold order — integer TP/FP/FN,
    permille ratios.  The windows run over the SCORE grid, never rows.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount").isNotNull())
        .select(
            F.expr(
                "CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)"
            ).alias("score"),
            F.when(F.col("l_returnflag") == "R", F.lit(1))
            .otherwise(F.lit(0))
            .alias("label"),
        )
    )
    per_score = li.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("label").cast("long").alias("pos"),
    )
    w_all = Window.partitionBy(F.lit(1))
    w_cum = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_score.withColumn("total_pos", F.sum("pos").over(w_all))
        .withColumn("tp", F.sum("pos").over(w_cum).cast("long"))
        .withColumn("pred_pos", F.sum("cnt").over(w_cum).cast("long"))
        .select(
            F.col("score").alias("threshold"),
            "tp",
            F.expr("pred_pos - tp").alias("fp"),
            F.expr("total_pos - tp").alias("fn"),
            F.expr(
                "CAST(tp * 1000 div nullif(pred_pos, 0) AS BIGINT)"
            ).alias("precision_permille"),
            F.expr(
                "CAST(tp * 1000 div nullif(total_pos, 0) AS BIGINT)"
            ).alias("recall_permille"),
        )
        .orderBy(F.col("threshold").desc())
    )


_PR_SQL = """
WITH li AS (
  SELECT CAST(floor(l_discount * 1000 + 0.5) AS BIGINT) AS score,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label
  FROM lineitem WHERE l_discount IS NOT NULL),
per_score AS (
  SELECT score, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(label) AS BIGINT) AS pos
  FROM li GROUP BY 1),
c AS (
  SELECT score,
         CAST(sum(pos) OVER () AS BIGINT) AS total_pos,
         CAST(sum(pos) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS tp,
         CAST(sum(cnt) OVER (ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS pred_pos
  FROM per_score)
SELECT score AS threshold, tp, pred_pos - tp AS fp, total_pos - tp AS fn,
       CAST(tp * 1000 // nullif(pred_pos, 0) AS BIGINT)
         AS precision_permille,
       CAST(tp * 1000 // nullif(total_pos, 0) AS BIGINT)
         AS recall_permille
FROM c ORDER BY threshold DESC
"""


# --- mcnemar_detector_disagreement ------------------------------------------------


def _mcnemar_detector_disagreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """McNemar over the kappa key's two duplicate detectors (see module
    doc).  b/c are the discordant counts; the statistic's square runs
    in DECIMAL(38,0) internally (rule 10/27) and only BIGINTs emit."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.md5(F.col("text")).alias("k1"),
            "n_chars",
            F.substring(F.col("text"), 1, 24).alias("pfx"),
        )
    )
    wa = Window.partitionBy("k1")
    wb = Window.partitionBy("n_chars", "pfx")
    flags = docs.select(
        (F.count(F.lit(1)).over(wa) > 1).cast("long").alias("fa"),
        (F.count(F.lit(1)).over(wb) > 1).cast("long").alias("fb"),
    )
    m = flags.agg(
        F.coalesce(F.sum(F.expr("fa * fb")), F.lit(0)).alias("both_dup"),
        F.coalesce(F.sum(F.expr("fa * (1 - fb)")), F.lit(0)).alias("b"),
        F.coalesce(F.sum(F.expr("(1 - fa) * fb")), F.lit(0)).alias("c"),
        F.coalesce(F.sum(F.expr("(1 - fa) * (1 - fb)")), F.lit(0)).alias(
            "both_clean"
        ),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = f"({dec.format('b - c')} * {dec.format('b - c')})"
    return m.select(
        "both_dup",
        "b",
        "c",
        "both_clean",
        F.expr(
            f"CAST({num} * 1000 div nullif({dec.format('b + c')}, 0)"
            " AS BIGINT)"
        ).alias("mcnemar_permille"),
    )


_MCNEMAR_SQL = """
WITH d AS (
  SELECT md5(text) AS k1, n_chars, substr(text, 1, 24) AS pfx
  FROM documents WHERE text IS NOT NULL),
f AS (
  SELECT CASE WHEN count(*) OVER (PARTITION BY k1) > 1
              THEN 1 ELSE 0 END AS fa,
         CASE WHEN count(*) OVER (PARTITION BY n_chars, pfx) > 1
              THEN 1 ELSE 0 END AS fb
  FROM d),
m AS (
  SELECT CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS both_dup,
         CAST(coalesce(sum(fa * (1 - fb)), 0) AS BIGINT) AS b,
         CAST(coalesce(sum((1 - fa) * fb), 0) AS BIGINT) AS c,
         CAST(coalesce(sum((1 - fa) * (1 - fb)), 0) AS BIGINT)
           AS both_clean
  FROM f)
SELECT both_dup, b, c, both_clean,
       CAST(CAST(b - c AS HUGEINT) * CAST(b - c AS HUGEINT) * 1000
            // nullif(CAST(b + c AS HUGEINT), 0) AS BIGINT)
         AS mcnemar_permille
FROM m
"""


# --- copurchase_degree_assortativity ----------------------------------------------


def _copurchase_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-purchase graph (see module doc).

    Edges are per-order part pairs (orders hold ≤7 distinct parts in
    the fixtures, so pair generation is linear in lineitem); the edge
    list is lineage-cut because it feeds the degree build AND the
    endpoint join (rule 14).  On the symmetrized list the two marginals
    are identical, so Pearson r = cov_num/var_num exactly — one e6
    integer division, moments in DECIMAL(38,0) internally.
    """
    op = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    edges = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
        .localCheckpoint(eager=False)
    )
    ends = edges.select(
        F.col("pa").alias("x"), F.col("pb").alias("y")
    ).unionByName(edges.select(F.col("pb").alias("x"), F.col("pa").alias("y")))
    deg = ends.groupBy("x").agg(F.count(F.lit(1)).alias("deg"))
    dxy = (
        ends.join(deg.select(F.col("x"), F.col("deg").alias("dx")), "x")
        .join(
            deg.select(F.col("x").alias("y"), F.col("deg").alias("dy")), "y"
        )
        .select("dx", "dy")
    )
    m = dxy.agg(
        F.count(F.lit(1)).alias("n_ends"),
        F.sum("dx").cast("long").alias("sum_deg"),
        F.sum(F.expr("dx * dy")).cast("long").alias("sum_deg_prod"),
        F.sum(F.expr("dx * dx")).cast("long").alias("sum_deg_sq"),
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    num = (
        f"({dec.format('n_ends')} * {dec.format('sum_deg_prod')}"
        f" - {dec.format('sum_deg')} * {dec.format('sum_deg')})"
    )
    den = (
        f"({dec.format('n_ends')} * {dec.format('sum_deg_sq')}"
        f" - {dec.format('sum_deg')} * {dec.format('sum_deg')})"
    )
    return m.select(
        "n_ends",
        "sum_deg",
        "sum_deg_prod",
        "sum_deg_sq",
        F.expr(
            f"CAST({num} * 1000000 div nullif({den}, 0) AS BIGINT)"
        ).alias("assortativity_e6"),
    )


_ASSORT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
ends AS (
  SELECT pa AS x, pb AS y FROM edges
  UNION ALL SELECT pb AS x, pa AS y FROM edges),
deg AS (SELECT x, CAST(count(*) AS BIGINT) AS deg FROM ends GROUP BY 1),
dxy AS (
  SELECT da.deg AS dx, db.deg AS dy
  FROM ends e JOIN deg da ON e.x = da.x JOIN deg db ON e.y = db.x),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_ends,
         CAST(sum(dx) AS BIGINT) AS sum_deg,
         CAST(sum(dx * dy) AS BIGINT) AS sum_deg_prod,
         CAST(sum(dx * dx) AS BIGINT) AS sum_deg_sq
  FROM dxy)
SELECT n_ends, sum_deg, sum_deg_prod, sum_deg_sq,
       CAST((CAST(n_ends AS HUGEINT) * CAST(sum_deg_prod AS HUGEINT)
             - CAST(sum_deg AS HUGEINT) * CAST(sum_deg AS HUGEINT))
            * 1000000
            // nullif(CAST(n_ends AS HUGEINT) * CAST(sum_deg_sq AS HUGEINT)
                      - CAST(sum_deg AS HUGEINT) * CAST(sum_deg AS HUGEINT),
                      0)
            AS BIGINT) AS assortativity_e6
FROM m
"""


# --- phonetic_block_profile ------------------------------------------------------


def _phonetic_block_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vowel-drop phonetic blocking-key profile over part names.

    Key = first char of the name's first word + its consonants (one
    regexp_replace — identical semantics via the 'g' flag on the
    DuckDB side; NO backreference collapse, RE2 has none).  Emits the
    per-key census a blocked matcher plans against, including the
    quadratic pair budget each block would cost.
    """
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").isNotNull() & (F.length("p_name") > 0))
        .select(
            "p_name",
            F.expr("element_at(split(p_name, ' '), 1)").alias("w"),
        )
        .select(
            "p_name",
            "w",
            F.concat(
                F.substring("w", 1, 1),
                F.regexp_replace(
                    F.expr("substring(w, 2)"), "[aeiou]", ""
                ),
            ).alias("phonetic_key"),
        )
    )
    return (
        parts.groupBy("phonetic_key")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.countDistinct("p_name").alias("n_distinct_names"),
            F.countDistinct("w").alias("n_first_words"),
        )
        .select(
            "phonetic_key",
            "n_parts",
            "n_distinct_names",
            "n_first_words",
            F.expr(
                "CAST(n_parts * (n_parts - 1) div 2 AS BIGINT)"
            ).alias("pair_budget"),
        )
        .orderBy("phonetic_key")
    )


_PHONETIC_SQL = """
WITH p AS (
  SELECT p_name, string_split(p_name, ' ')[1] AS w
  FROM part WHERE p_name IS NOT NULL AND length(p_name) > 0),
k AS (
  SELECT p_name, w,
         substr(w, 1, 1)
           || regexp_replace(substr(w, 2), '[aeiou]', '', 'g')
           AS phonetic_key
  FROM p)
SELECT phonetic_key,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(count(DISTINCT p_name) AS BIGINT) AS n_distinct_names,
       CAST(count(DISTINCT w) AS BIGINT) AS n_first_words,
       CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS pair_budget
FROM k GROUP BY 1 ORDER BY phonetic_key
"""


# --- kendall_tau_daily_metrics ---------------------------------------------------


def _kendall_tau_daily_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall concordance between daily revenue and order count.

    The pair grid is day × day (calendar-bounded — ~2.4k days at ANY
    scale factor, so ~3M pairs forever; this never becomes orders²).
    The daily frame is lineage-cut for the self-join (rule 14).
    """
    daily = _daily_revenue(spark, sf_dir).localCheckpoint(eager=False)
    a = daily.select(
        F.col("day").alias("da"),
        F.col("rev_cents").alias("xa"),
        F.col("n_orders").alias("ya"),
    )
    b = daily.select(
        F.col("day").alias("db"),
        F.col("rev_cents").alias("xb"),
        F.col("n_orders").alias("yb"),
    )
    pairs = a.join(b, F.col("da") < F.col("db"))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.expr(
                "CASE WHEN (xa - xb) * (ya - yb) > 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("concordant"),
        F.sum(
            F.expr(
                "CASE WHEN (xa - xb) * (ya - yb) < 0 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("discordant"),
        F.sum(F.expr("CASE WHEN xa = xb AND ya != yb THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ties_x"),
        F.sum(F.expr("CASE WHEN ya = yb AND xa != xb THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ties_y"),
        F.sum(F.expr("CASE WHEN xa = xb AND ya = yb THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("ties_both"),
    ).select(
        "n_pairs",
        "concordant",
        "discordant",
        "ties_x",
        "ties_y",
        "ties_both",
        F.expr(
            "CAST((concordant - discordant) * 1000000"
            " div nullif(n_pairs, 0) AS BIGINT)"
        ).alias("tau_a_e6"),
    )


_KENDALL_SQL = f"""
WITH {_DAILY_CTE},
pairs AS (
  SELECT a.rev_cents AS xa, a.n_orders AS ya,
         b.rev_cents AS xb, b.n_orders AS yb
  FROM daily a JOIN daily b ON a.day < b.day),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN (xa - xb) * (ya - yb) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN (xa - xb) * (ya - yb) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN xa = xb AND ya != yb
                       THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
         CAST(sum(CASE WHEN ya = yb AND xa != xb
                       THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
         CAST(sum(CASE WHEN xa = xb AND ya = yb
                       THEN 1 ELSE 0 END) AS BIGINT) AS ties_both
  FROM pairs)
SELECT *,
       CAST((concordant - discordant) * 1000000 // nullif(n_pairs, 0)
            AS BIGINT) AS tau_a_e6
FROM m
"""


QUERIES: dict[str, QuerySpec] = {
    "randomized_response_audit": QuerySpec(
        _randomized_response_audit, _RR_SQL
    ),
    "pettitt_changepoint": QuerySpec(_pettitt_changepoint, _PETTITT_SQL),
    "precision_recall_curve": QuerySpec(
        _precision_recall_curve, _PR_SQL
    ),
    "mcnemar_detector_disagreement": QuerySpec(
        _mcnemar_detector_disagreement, _MCNEMAR_SQL
    ),
    "copurchase_degree_assortativity": QuerySpec(
        _copurchase_degree_assortativity, _ASSORT_SQL
    ),
    "phonetic_block_profile": QuerySpec(
        _phonetic_block_profile, _PHONETIC_SQL
    ),
    "kendall_tau_daily_metrics": QuerySpec(
        _kendall_tau_daily_metrics, _KENDALL_SQL
    ),
}
