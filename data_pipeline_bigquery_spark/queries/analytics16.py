"""Analytics batch 16 — fulfillment analytics and multilingual corpus
diagnostics:

- ``order_cycle_time_percentiles``: order-to-ship cycle time
  (order date → LAST line-item ship date) with exact p25/p50/p75 per
  order priority — the fulfillment-SLA readout.  Percentiles read off
  a per-priority VALUE-DOMAIN cumulative histogram with the integer
  rank rule (``cum·100 ≥ p·total``) — the engine-exact quantile
  machinery shared with ``order_gap_percentiles``, windows bounded by
  distinct cycle-day values, never row counts.
- ``vocabulary_overlap_between_langs``: for every language pair, how
  many of each language's top-`_VOCAB_TOP` (200) tokens are shared, as a
  permille of the smaller top set — the multilingual-corpus
  diagnostic that separates script-sharing languages (heavy overlap →
  shared subword budget) from disjoint ones before tokenizer
  training.  Top sets rank per language with a full (count desc,
  token asc) tie-break; the pair join is keyed on the token.

Reference parity: the reference pipeline (main.py:13-54) has no
fulfillment or multilingual layer — scale-out extensions in the same
spirit as batches 5-15.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)

_VOCAB_TOP = 200


# --- order_cycle_time_percentiles ---------------------------------------------


def _order_cycle_time_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-priority exact cycle-time quartiles from a value-domain
    histogram: one lineitem aggregate to the order grain, one join,
    one (priority, days)-keyed count, priority-partitioned windows."""
    shipped = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("shipped"))
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    cycles = orders.join(
        shipped, orders.o_orderkey == shipped.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff("shipped", "o_orderdate").alias("days"),
    )
    grain = cycles.groupBy("o_orderpriority", "days").agg(
        F.count(F.lit(1)).alias("c")
    )
    cum = cumulative_value_histogram(
        grain, "days", partition_cols=("o_orderpriority",)
    )
    return (
        cum.groupBy("o_orderpriority")
        .agg(
            F.max("total").cast("long").alias("n_orders"),
            rank_rule_pct(25, "days").alias("p25_cycle_days"),
            rank_rule_pct(50, "days").alias("p50_cycle_days"),
            rank_rule_pct(75, "days").alias("p75_cycle_days"),
        )
        .orderBy("o_orderpriority")
    )


_CYCLE_SQL = """
WITH shipped AS (
  SELECT l_orderkey, max(l_shipdate) AS shipped
  FROM lineitem GROUP BY 1),
cycles AS (
  SELECT o_orderpriority,
         date_diff('day', o_orderdate, shipped) AS days
  FROM orders JOIN shipped ON o_orderkey = l_orderkey),
grain AS (
  SELECT o_orderpriority, days, count(*) AS c
  FROM cycles GROUP BY 1, 2),
cum AS (
  SELECT o_orderpriority, days,
         sum(c) OVER (PARTITION BY o_orderpriority ORDER BY days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER (PARTITION BY o_orderpriority) AS total
  FROM grain)
SELECT o_orderpriority,
       CAST(max(total) AS BIGINT) AS n_orders,
       CAST(min(CASE WHEN cum * 100 >= 25 * total THEN days END)
            AS INTEGER) AS p25_cycle_days,
       CAST(min(CASE WHEN cum * 100 >= 50 * total THEN days END)
            AS INTEGER) AS p50_cycle_days,
       CAST(min(CASE WHEN cum * 100 >= 75 * total THEN days END)
            AS INTEGER) AS p75_cycle_days
FROM cum GROUP BY 1 ORDER BY o_orderpriority
"""


# --- vocabulary_overlap_between_langs ----------------------------------------


def _vocabulary_overlap_between_langs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shared top-token counts per language pair.

    One token-stream aggregate to (lang, token) counts; the rank
    window partitions by language over its token domain; the pair
    join carries only the small per-language top sets; every
    language pair appears (zero overlaps report 0).
    """
    counts = (
        load(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("token")
    )
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _VOCAB_TOP)
        .select("lang", "token")
        # feeds the sizes aggregate and BOTH sides of the pair join
        .localCheckpoint(eager=False)
    )
    sizes = top.groupBy("lang").agg(F.count(F.lit(1)).alias("n_top"))
    a, b = top.alias("a"), top.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.lang").alias("lang_a"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # scaffold of EVERY language pair (sizes is language-count rows),
    # so disjoint top sets report 0 instead of vanishing — 'zero
    # overlap' and 'language absent' must stay distinguishable
    sa = sizes.select(
        F.col("lang").alias("lang_a"), F.col("n_top").alias("n_a")
    )
    sb = sizes.select(
        F.col("lang").alias("lang_b"), F.col("n_top").alias("n_b")
    )
    all_pairs = sa.join(sb, F.col("lang_a") < F.col("lang_b"))
    return (
        all_pairs.join(shared, ["lang_a", "lang_b"], "left")
        .select(
            "lang_a",
            "lang_b",
            F.coalesce(F.col("n_shared"), F.lit(0))
            .cast("long")
            .alias("n_shared"),
            "n_a",
            "n_b",
            F.expr(
                "CAST(coalesce(n_shared, 0) * 1000 div least(n_a, n_b)"
                " AS BIGINT)"
            ).alias("overlap_permille"),
        )
        .orderBy("lang_a", "lang_b")
    )


_VOCAB_OVERLAP_SQL = f"""
WITH counts AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents),
grouped AS (
  SELECT lang, token, count(*) AS c FROM counts GROUP BY 1, 2),
top AS (
  SELECT lang, token FROM (
    SELECT lang, token,
           row_number() OVER (PARTITION BY lang
                              ORDER BY c DESC, token) AS rk
    FROM grouped)
  WHERE rk <= {_VOCAB_TOP}),
sizes AS (SELECT lang, count(*) AS n_top FROM top GROUP BY 1),
shared AS (
  SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_shared
  FROM top a JOIN top b ON a.token = b.token AND a.lang < b.lang
  GROUP BY 1, 2)
SELECT sa.lang AS lang_a, sb.lang AS lang_b,
       CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
       sa.n_top AS n_a, sb.n_top AS n_b,
       CAST(coalesce(n_shared, 0) * 1000 // least(sa.n_top, sb.n_top)
            AS BIGINT) AS overlap_permille
FROM sizes sa
JOIN sizes sb ON sa.lang < sb.lang
LEFT JOIN shared ON shared.lang_a = sa.lang AND shared.lang_b = sb.lang
ORDER BY lang_a, lang_b
"""


QUERIES: dict[str, QuerySpec] = {
    "order_cycle_time_percentiles": QuerySpec(
        _order_cycle_time_percentiles, _CYCLE_SQL
    ),
    "vocabulary_overlap_between_langs": QuerySpec(
        _vocabulary_overlap_between_langs, _VOCAB_OVERLAP_SQL
    ),
}
