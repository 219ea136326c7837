"""Analytics batch 11 — privacy-trio completion, ranking-model
evaluation, quantile-forecast scoring, and RAG ingestion:

- ``t_closeness_audit``: the third leg of the privacy-audit trio
  (``k_anonymity_audit`` pins group sizes, ``l_diversity_audit``
  distinct-sensitive-value counts): per quasi-identifier group
  (segment × nation), the Earth Mover's Distance between the group's
  ordered sensitive-band distribution and the GLOBAL one — a large
  group with many distinct but heavily skewed values still leaks, and
  that's what t-closeness catches.  The three ordinal bands reuse
  ``l_diversity_audit``'s exact thresholds; EMD stays an exact BIGINT
  numerator (cross-multiplied cumulative diffs, no per-group division)
  with ONE final IEEE division.
- ``model_auc_ranksum``: ROC-AUC of a pre-conversion engagement score
  (non-purchase event cents per user) predicting conversion, via the
  rank-sum identity AUC = U/(n₁·n₀) — computed on the VALUE-DOMAIN
  histogram (group by score, cumulative negatives below), so ties get
  their exact ½ credit and the window runs over distinct scores, not
  rows (the ``iqr_outlier_audit`` scaling pattern).  U is kept doubled
  (U₂ = Σ n₁ₛ·(2·cum_n₀_below + n₀ₛ)) so every intermediate is an
  exact BIGINT; AUC is one final division.
- ``quantile_pinball_eval``: proper-scoring-rule evaluation of
  quantile forecasts — per event type, train on the first half of the
  daily-revenue calendar (exact P50/P90 order statistics), score the
  second half with pinball loss ×10 (max(q₁₀·e, (q₁₀−10)·e) in integer
  cents, so the asymmetric loss never touches floats).  The companion
  to ``seasonal_naive_skill`` (point forecasts) and
  ``forecast_backtest_mae``.
- ``rag_chunk_windows``: retrieval-ingestion chunking — sliding
  32-token windows at stride 16 per document with (start, length)
  offsets and the materialized chunk text.  Offsets derive from
  ``sequence(0, n−1, 16)`` / DuckDB ``range`` so both engines emit the
  identical chunk grid; the window clamp at the tail is the list-slice
  clamp both engines share.

Reference parity: the reference pipeline (main.py:13-54) has no
privacy, evaluation, or retrieval layer — scale-out extensions in the
same spirit as batches 5-10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec


# --- t_closeness_audit -------------------------------------------------------


def _t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMD(group banded distribution, global) per (segment, nation).

    One customer scan → group × 3 conditional band counts; the global
    distribution is a 1-row rollup of the 125-row group table,
    broadcast back.  diff_i = cnt_gi·N − cnt_i·n_g keeps everything
    integer; EMD = (|cum₀| + |cum₀+cum₁|) / (n_g·N·(m−1)).
    """
    cust = load(spark, sf_dir, "customer")
    banded = cust.select(
        "c_mktsegment",
        "c_nationkey",
        # l_diversity_audit's thresholds, made ordinal (0 < 1 < 2)
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 5000, 1)
        .otherwise(2)
        .alias("band"),
    )
    groups = banded.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(F.col("band") == 0, 1).otherwise(0)).alias("b0"),
        F.sum(F.when(F.col("band") == 1, 1).otherwise(0)).alias("b1"),
    ).localCheckpoint(eager=False)  # feeds both the global rollup and the join
    glob = groups.groupBy().agg(
        F.sum("n_members").alias("n_total"),
        F.sum("b0").alias("g0"),
        F.sum("b1").alias("g1"),
    )
    j = groups.crossJoin(F.broadcast(glob))
    cum0 = F.col("b0") * F.col("n_total") - F.col("g0") * F.col("n_members")
    cum1 = (F.col("b0") + F.col("b1")) * F.col("n_total") - (
        F.col("g0") + F.col("g1")
    ) * F.col("n_members")
    emd_num = (F.abs(cum0) + F.abs(cum1)).cast("long")
    denom = (F.col("n_members") * F.col("n_total") * 2).cast("double")
    return j.select(
        "c_mktsegment",
        "c_nationkey",
        F.col("n_members").cast("long").alias("n_members"),
        emd_num.alias("emd_num"),
        (emd_num / F.when(denom != 0.0, denom)).alias("emd"),
    ).orderBy("c_mktsegment", "c_nationkey")


_T_CLOSENESS_SQL = """
WITH banded AS (
  SELECT c_mktsegment, c_nationkey,
         CASE WHEN c_acctbal < 0 THEN 0
              WHEN c_acctbal < 5000 THEN 1
              ELSE 2 END AS band
  FROM customer),
groups AS (
  SELECT c_mktsegment, c_nationkey, count(*) AS n_members,
         CAST(sum(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
         CAST(sum(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1
  FROM banded GROUP BY 1, 2),
overall AS (
  SELECT CAST(sum(n_members) AS BIGINT) AS n_total,
         CAST(sum(b0) AS BIGINT) AS g0,
         CAST(sum(b1) AS BIGINT) AS g1
  FROM groups)
SELECT c_mktsegment, c_nationkey, n_members,
       CAST(abs(b0 * n_total - g0 * n_members)
            + abs((b0 + b1) * n_total - (g0 + g1) * n_members)
            AS BIGINT) AS emd_num,
       (abs(b0 * n_total - g0 * n_members)
        + abs((b0 + b1) * n_total - (g0 + g1) * n_members))
         / nullif(CAST(n_members * n_total * 2 AS DOUBLE), 0.0) AS emd
FROM groups CROSS JOIN overall
ORDER BY c_mktsegment, c_nationkey
"""


# --- model_auc_ranksum -------------------------------------------------------


def _model_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of engagement cents predicting conversion, via rank-sum on
    the score-domain histogram.

    Scale: fact scan → user groupBy → score-domain groupBy (distinct
    scores, the window's bound) → one final global aggregate.  The
    doubled-U identity U₂ = Σ n₁ₛ·(2·cum_n₀_strictly_below + n₀ₛ)
    grants tied scores their exact ½ credit with integers only.
    """
    events = load(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        # coalesce: a user whose engagement rows ALL carry NULL value
        # would otherwise score NULL and sort differently between
        # engines (Spark NULLS FIRST vs DuckDB NULLS LAST)
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") != "purchase",
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("score_cents"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 250),
                1,
            ).otherwise(0)
        ).alias("converted"),
    )
    scores = users.groupBy("score_cents").agg(
        F.sum("converted").alias("n1_s"),
        F.sum(1 - F.col("converted")).alias("n0_s"),
    )
    w = Window.orderBy("score_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = scores.withColumn(
        "cum_n0_below", (F.sum("n0_s").over(w) - F.col("n0_s")).cast("long")
    )
    agg = cum.groupBy().agg(
        F.sum("n1_s").cast("long").alias("n_pos"),
        F.sum("n0_s").cast("long").alias("n_neg"),
        F.sum(
            F.col("n1_s") * (2 * F.col("cum_n0_below") + F.col("n0_s"))
        )
        .cast("long")
        .alias("u2"),
    )
    denom = (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        (F.col("u2") / F.when(denom != 0.0, denom)).alias("auc"),
    )


_AUC_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type <> 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END), 0) AS BIGINT) AS score_cents,
         max(CASE WHEN event_type = 'purchase' AND value >= 250
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1),
scores AS (
  SELECT score_cents,
         CAST(sum(converted) AS BIGINT) AS n1_s,
         CAST(sum(1 - converted) AS BIGINT) AS n0_s
  FROM users GROUP BY 1),
cum AS (
  SELECT n1_s, n0_s,
         CAST(sum(n0_s) OVER (ORDER BY score_cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n0_s AS BIGINT)
           AS cum_n0_below
  FROM scores),
agg AS (
  SELECT CAST(sum(n1_s) AS BIGINT) AS n_pos,
         CAST(sum(n0_s) AS BIGINT) AS n_neg,
         CAST(sum(n1_s * (2 * cum_n0_below + n0_s)) AS BIGINT) AS u2
  FROM cum)
SELECT n_pos, n_neg, u2,
       u2 / nullif(CAST(2 * n_pos * n_neg AS DOUBLE), 0.0) AS auc
FROM agg
"""


# --- quantile_pinball_eval ---------------------------------------------------


def _quantile_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-half exact P50/P90 per event type, test-half pinball ×10.

    The day grain is checkpointed (one fact scan; it feeds the split,
    the order-statistic selection, and the test join).  Pinball loss
    scales by 10 so both quantile weights are integers:
    loss₁₀ = max(q₁₀·(y−f), (q₁₀−10)·(y−f)).
    """
    events = load(spark, sf_dir, "events")
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(
            # coalesce: an all-NULL-value day would rank NULLS FIRST
            # in Spark, NULLS LAST in DuckDB — pin it to 0 cents
            F.coalesce(
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ),
                F.lit(0),
            ).alias("cents")
        )
        .withColumn(
            "rn_d",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            ),
        )
        .withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .localCheckpoint(eager=False)
    )
    train = daily.filter(F.col("rn_d") <= (F.col("nd") + 1) / 2).select(
        "event_type", "d", "cents"
    )
    ranked = train.select(
        "event_type",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("cents", "d"))
        .alias("rn_v"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_train"),
    )
    # target order statistic per (type, q10): ceil(q10·n/10)
    targets = (
        ranked.select("event_type", "n_train")
        .distinct()
        .select(
            "event_type",
            "n_train",
            F.explode(F.array(F.lit(5), F.lit(9))).alias("q_tenths"),
        )
        .withColumn(
            "target_rn",
            F.expr("CAST((q_tenths * n_train + 9) div 10 AS INT)"),
        )
    )
    rsel = ranked.select(
        F.col("event_type").alias("r_event_type"), "cents", "rn_v"
    )
    forecasts = targets.join(
        rsel,
        (targets.event_type == rsel.r_event_type)
        & (targets.target_rn == rsel.rn_v),
    ).select(
        targets.event_type,
        "q_tenths",
        F.col("n_train").cast("long").alias("n_train"),
        F.col("cents").alias("forecast_cents"),
    )
    test = daily.filter(F.col("rn_d") > (F.col("nd") + 1) / 2).select(
        "event_type", F.col("cents").alias("y")
    )
    err = F.col("y") - F.col("forecast_cents")
    loss = F.greatest(
        F.col("q_tenths") * err, (F.col("q_tenths") - 10) * err
    )
    return (
        test.join(forecasts, "event_type")
        .groupBy("event_type", "q_tenths", "n_train", "forecast_cents")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(loss).cast("long").alias("pinball_x10"),
        )
        .select(
            "event_type",
            "q_tenths",
            "n_train",
            "n_test",
            "forecast_cents",
            "pinball_x10",
        )
        .orderBy("event_type", "q_tenths")
    )


_PINBALL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)), 0)
              AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE))
           AS rn_d,
         count(*) OVER (PARTITION BY event_type) AS nd
  FROM events GROUP BY 1, 2),
train AS (
  SELECT event_type, d, cents FROM daily WHERE rn_d <= (nd + 1) / 2),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents, d)
           AS rn_v,
         count(*) OVER (PARTITION BY event_type) AS n_train
  FROM train),
targets AS (
  SELECT event_type, n_train, q_tenths,
         (q_tenths * n_train + 9) // 10 AS target_rn
  FROM (SELECT DISTINCT event_type, n_train FROM ranked)
  CROSS JOIN (SELECT unnest([5, 9]) AS q_tenths)),
forecasts AS (
  SELECT t.event_type, t.q_tenths,
         CAST(t.n_train AS BIGINT) AS n_train,
         r.cents AS forecast_cents
  FROM targets t
  JOIN ranked r ON t.event_type = r.event_type AND t.target_rn = r.rn_v),
test AS (
  SELECT event_type, cents AS y FROM daily WHERE rn_d > (nd + 1) / 2)
SELECT f.event_type AS event_type, q_tenths, n_train, count(*) AS n_test,
       forecast_cents,
       CAST(sum(greatest(q_tenths * (y - forecast_cents),
                         (q_tenths - 10) * (y - forecast_cents)))
            AS BIGINT) AS pinball_x10
FROM test JOIN forecasts f ON test.event_type = f.event_type
GROUP BY f.event_type, q_tenths, n_train, forecast_cents
ORDER BY f.event_type, q_tenths
"""


# --- rag_chunk_windows -------------------------------------------------------

_CHUNK_W = 32
_CHUNK_STRIDE = 16


def _rag_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 32-token / stride-16 chunk grid with offsets and text.

    One corpus scan; the chunk grid explodes from
    ``sequence(0, n−1, 16)`` (ascending — n ≥ 1 is guaranteed by the
    split) and the tail window relies on the slice clamp both engines
    share.  A start is emitted only when the PREVIOUS window did not
    already reach end-of-document (s = 0 or s + stride < n), so no
    chunk is a strict suffix of its predecessor and the last window
    still reaches EOD — the grid covers every token exactly once per
    overlapping layer with no redundant tail.  At scale this is the
    map-side ingestion step feeding an embedding/indexing stage — no
    shuffle at all.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    chunks = docs.select(
        "doc_id",
        "words",
        F.size("words").alias("n_tokens"),
        F.explode(
            F.expr(f"sequence(0, size(words) - 1, {_CHUNK_STRIDE})")
        ).alias("start_tok"),
    ).filter(
        (F.col("start_tok") == 0)
        | (F.col("start_tok") + _CHUNK_STRIDE < F.col("n_tokens"))
    )
    return chunks.select(
        "doc_id",
        F.expr(f"CAST(start_tok div {_CHUNK_STRIDE} + 1 AS BIGINT)").alias(
            "chunk_no"
        ),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(_CHUNK_W), F.col("n_tokens") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok"),
        F.expr(
            f"array_join(slice(words, start_tok + 1, {_CHUNK_W}), ' ')"
        ).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_no")


_CHUNK_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
grid AS (
  SELECT * FROM (
    SELECT doc_id, words, len(words) AS n_tokens,
           unnest(range(0, len(words), {_CHUNK_STRIDE})) AS start_tok
    FROM w)
  WHERE start_tok = 0 OR start_tok + {_CHUNK_STRIDE} < n_tokens)
SELECT doc_id,
       CAST(start_tok // {_CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_no,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_W}, n_tokens - start_tok) AS BIGINT) AS n_tok,
       array_to_string(words[start_tok + 1 : start_tok + {_CHUNK_W}], ' ')
         AS chunk_text
FROM grid ORDER BY doc_id, chunk_no
"""


QUERIES: dict[str, QuerySpec] = {
    "t_closeness_audit": QuerySpec(_t_closeness_audit, _T_CLOSENESS_SQL),
    "model_auc_ranksum": QuerySpec(_model_auc_ranksum, _AUC_SQL),
    "quantile_pinball_eval": QuerySpec(
        _quantile_pinball_eval, _PINBALL_SQL
    ),
    "rag_chunk_windows": QuerySpec(_rag_chunk_windows, _CHUNK_SQL),
}
