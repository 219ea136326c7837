"""Analytics batch 10 — robust correlation, co-visitation recommenders,
forecast skill, LM-proxy curation, and operational reconciliation:

- ``spearman_rank_corr``: per-month Spearman rank correlation between
  daily revenue and daily order count — the robust twin of a Pearson
  readout (monotone association, outlier-resistant).  Ties use average
  ranks kept exact by the doubled-rank trick ``r2 = 2*rank + (ties-1)``
  so Σd² stays an exact BIGINT; rho is ONE final IEEE expression.
- ``mann_kendall_trend``: the Mann–Kendall trend test per event type —
  S = Σ sign(c_j − c_i) over ordered day pairs, tie-corrected variance,
  continuity-corrected z.  Complements ``theil_sen_trend`` (that key
  estimates the slope; this one scores its significance).  Pairs are
  calendar-bounded per series, never corpus-bounded.
- ``item_item_covisitation``: classic recsys candidate generation —
  parts co-purchased within an order, cosine-normalized by part degree
  (cnt / sqrt(deg_a · deg_b)), top-5 neighbors per part with a full
  tie-break.  One exchange to the (order, part) grain, one pair
  groupBy; degrees join by hash (AQE picks broadcast when the item
  dim fits).
- ``covisitation_recs``: the second recsys stage — fold each
  customer's purchase history through the co-visitation neighbor list,
  sum micro-integer cosine scores per candidate, drop already-owned
  parts (anti-join), top-3 per customer.  Score accumulation is
  exact-integer (cosine → floor(x·1e6 + 0.5)) so the grouped sum is
  order-stable across engines.
- ``seasonal_naive_skill``: forecast-skill audit — seasonal-naive
  (lag-7) absolute error vs naive (lag-1) per event type, compared on
  exactly the days where BOTH lags exist; ratio in integer permille
  (<1000 ⇒ weekly seasonality carries signal).  The lag join is a
  self equi-join on (type, date−k), not a row-offset window, so
  calendar gaps can't silently misalign the comparison.
- ``bigram_coverage_quality``: LM-proxy quality curation — corpus
  top-200 bigram vocabulary (count-ranked, full tie-break), per-doc
  coverage of its bigram stream in integer permille, histogrammed by
  source × coverage decile.  The low-coverage tail is the
  out-of-domain / garbled-text slice a perplexity filter would cut;
  this is the transcendental-free variant (no log-prob, see
  oracle-parity rule: no libm in hashed outputs).
- ``reconciliation_row_checksum``: operational table reconciliation —
  per month partition, row count + BIGINT sum of 7-hex md5 row
  digests on each side; a count mismatch means missing/extra rows, a
  checksum mismatch at equal counts means in-place drift.  O(1) state
  per partition, one scan per side (here one scan total: the replica
  is derived from the source with md5-seeded drift — 1/97 rows
  updated, 1/97 dropped — so both sides fold in a single pass).
- ``cdc_net_effect_compaction``: Debezium-style change-stream
  compaction — per key, collapse an I/U/D op sequence to its net
  effect (insert+delete → NOOP, pre-existing+delete → DELETE,
  last-wins values) via ``max_by(op, seq)``; aggregate net-op counts
  and surviving value mass per month.  The stream is synthesized
  deterministically (md5 buckets decide which keys update, delete,
  or pre-exist) so both engines build byte-identical inputs.

Reference parity: the reference pipeline (main.py:13-54) ships rows to
BigQuery and has no recommender / statistics / reconciliation layer —
these are scale-out extensions in the same spirit as batches 5-9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec

# the ONE oracle-side twin of sampling.hash_bucket — imported, not
# copied, so the determinism-critical digits can never drift
from data_pipeline_bigquery_spark.queries.analytics9 import _md5_bucket_sql


def _md5_prefix_sql(expr: str) -> str:
    """BIGINT from the first 7 hex digits of md5 — the row-digest idiom
    (< 2^28, so per-partition BIGINT sums never overflow)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 7)) AS BIGINT)"


def _md5_prefix(col):
    """Spark twin of :func:`_md5_prefix_sql` — the shared row-digest
    helper (also used by the streaming reconciliation monitor)."""
    from data_pipeline_bigquery_spark.extensions.sampling import (
        md5_prefix_long,
    )

    return md5_prefix_long(col)


_CENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


# --- spearman_rank_corr ------------------------------------------------------


def _spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily (revenue, order-count) grain → per-month Spearman rho.

    Average ranks for ties via the exact doubled-rank trick:
    avg_rank = rank + (ties-1)/2, so 2·avg_rank = 2·rank + (ties-1)
    stays integer; d² sums exactly and rho is one final IEEE division
    of exact integers (identical on both engines).  Scale: one shuffle
    to the day grain, then month-partitioned windows — no global sort.
    """
    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_cents"),
        )
        .withColumn("month", F.trunc("d", "month"))
    )
    w_rev = Window.partitionBy("month").orderBy("rev_cents")
    w_rev_t = Window.partitionBy("month", "rev_cents")
    w_ord = Window.partitionBy("month").orderBy("n_orders")
    w_ord_t = Window.partitionBy("month", "n_orders")
    ranked = daily.select(
        "month",
        (2 * F.rank().over(w_rev) + F.count(F.lit(1)).over(w_rev_t) - 1)
        .cast("long")
        .alias("r2x"),
        (2 * F.rank().over(w_ord) + F.count(F.lit(1)).over(w_ord_t) - 1)
        .cast("long")
        .alias("r2y"),
    )
    agg = ranked.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("r2x") - F.col("r2y")) * (F.col("r2x") - F.col("r2y")))
        .cast("long")
        .alias("sum_d2"),
    )
    denom = F.col("n_days") * (F.col("n_days") * F.col("n_days") - 1)
    return agg.select(
        "month",
        "n_days",
        "sum_d2",
        # d = (r2x-r2y)/2 → Σd² = sum_d2/4 → rho = 1 − 6Σd²/(n(n²−1))
        # = 1 − 1.5·sum_d2/(n(n²−1)); 1.5·sum_d2 is exact below 2^52
        (F.lit(1.0) - F.lit(1.5) * F.col("sum_d2") / F.when(denom != 0, denom))
        .alias("rho"),
    ).orderBy("month")


_SPEARMAN_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         date_trunc('month', o_orderdate) AS month,
         count(*) AS n_orders,
         CAST(sum({_CENTS}) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2),
ranked AS (
  SELECT month,
         2 * rank() OVER (PARTITION BY month ORDER BY rev_cents)
           + count(*) OVER (PARTITION BY month, rev_cents) - 1 AS r2x,
         2 * rank() OVER (PARTITION BY month ORDER BY n_orders)
           + count(*) OVER (PARTITION BY month, n_orders) - 1 AS r2y
  FROM daily),
agg AS (
  SELECT month, count(*) AS n_days,
         CAST(sum((r2x - r2y) * (r2x - r2y)) AS BIGINT) AS sum_d2
  FROM ranked GROUP BY month)
SELECT month, n_days, sum_d2,
       1.0 - 1.5 * sum_d2 / nullif(n_days * (n_days * n_days - 1), 0) AS rho
FROM agg ORDER BY month
"""


# --- mann_kendall_trend ------------------------------------------------------


def _mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts per type → S, tie-corrected Var(S), z.

    The pair join is (type, d1 < d2) over the per-series calendar —
    O(days²) per series, independent of corpus size, same envelope as
    ``theil_sen_trend``.  All statistics are exact BIGINTs; z is the
    only IEEE expression (sqrt + one division, both correctly rounded
    from exact inputs on both engines).
    """
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # cut lineage before the four DAG references (pair-join a/b, ties,
    # base): the day grain is calendar-bounded; without this each
    # branch re-runs the FULL events scan+agg (same pattern as
    # theil_sen_trend, analytics9.py)
    daily = daily.localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.cnt") > F.col("a.cnt"), 1)
                .when(F.col("b.cnt") < F.col("a.cnt"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long")
            .alias("tie_term")
        )
    )
    base = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    n = F.col("n_days")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    # single-day types have ZERO pairs and would vanish from an inner
    # join with `s` — left-join and coalesce S to 0 so "no evidence"
    # is distinguishable from "type absent" (theil_sen precedent)
    joined = (
        base.join(ties, "event_type")
        .join(s, "event_type", "left")
        .withColumn("s_stat", F.coalesce(F.col("s_stat"), F.lit(0)))
    )
    sigma = F.sqrt(F.col("var_num") / F.lit(18.0))
    guarded = F.when(sigma != 0.0, sigma)
    return (
        joined.select(
            "event_type", "n_days", "s_stat", var_num.alias("var_num")
        )
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var_num",
            F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / guarded)
            .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / guarded)
            .otherwise(F.lit(0.0))
            .alias("z"),
        )
        .orderBy("event_type")
    )


_MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS cnt
  FROM events GROUP BY 1, 2),
s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1
                       WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
  GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, cnt, count(*) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1),
base AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1),
j AS (
  SELECT base.event_type, n_days,
         CAST(coalesce(s_stat, 0) AS BIGINT) AS s_stat,
         CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS BIGINT)
           AS var_num
  FROM base
  JOIN ties USING (event_type)
  LEFT JOIN s USING (event_type))
SELECT event_type, n_days, s_stat, var_num,
       CASE WHEN s_stat > 0
              THEN (s_stat - 1) / nullif(sqrt(var_num / 18.0), 0.0)
            WHEN s_stat < 0
              THEN (s_stat + 1) / nullif(sqrt(var_num / 18.0), 0.0)
            ELSE 0.0 END AS z
FROM j ORDER BY event_type
"""


# --- item_item_covisitation --------------------------------------------------


def _order_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (order, part) grain — the co-visitation input.

    localCheckpoint cuts lineage: the grain feeds the pair self-join,
    the degree aggregate, and (in the recs key) the history join —
    Catalyst's attribute dedup on self-joins defeats ReuseExchange, so
    without the cut each reference re-runs the full lineitem
    scan+distinct (6-8 fact scans measured).  Materializing the grain
    once is the distributed-cache tradeoff a co-visitation build makes
    at any scale."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )


def _covisitation_scored(op: DataFrame) -> DataFrame:
    """Symmetric cosine-scored co-visitation edges (part, neighbor).

    Pair generation is the in-bucket transform (groupBy the order,
    emit sorted in-basket pairs from the collected array) — ONE
    order-keyed exchange instead of a self-join, the same discipline
    as the LSH/gram bucket pipelines; basket sizes bound the blowup
    (≤ c·(c−1)/2 per order).
    """
    deg = op.groupBy("p").agg(F.count(F.lit(1)).alias("deg"))
    baskets = op.groupBy("o").agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    )
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps) - i - 1),"
        " y -> struct(x AS p1, y AS p2))))"
    )
    pairs = (
        baskets.filter(F.size("ps") > 1)
        .select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sym = pairs.select(
        F.col("p1").alias("part"), F.col("p2").alias("neighbor"), "cnt"
    ).unionAll(
        pairs.select(
            F.col("p2").alias("part"), F.col("p1").alias("neighbor"), "cnt"
        )
    )
    return (
        sym.join(deg.withColumnRenamed("p", "part"), "part")
        .withColumnRenamed("deg", "deg_a")
        .join(
            deg.select(
                F.col("p").alias("neighbor"), F.col("deg").alias("deg_b")
            ),
            "neighbor",
        )
        .select(
            "part",
            "neighbor",
            "cnt",
            # exact ints through sqrt/division → identical doubles on
            # both engines (oracle-parity rule 4: sqrt is IEEE-exact)
            (
                F.col("cnt")
                / F.sqrt((F.col("deg_a") * F.col("deg_b")).cast("double"))
            ).alias("cosine"),
        )
    )


def _item_item_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine co-visitation neighbors per part.

    Scale: one exchange to (order, part), one pair groupBy keyed on
    (p1, p2); degree joins hash-partition on the item key (AQE
    broadcasts when the item dim fits); top-k is a part-partitioned
    window, never a global sort.
    """
    scored = _covisitation_scored(_order_parts(spark, sf_dir))
    w = Window.partitionBy("part").orderBy(
        F.col("cosine").desc(), F.col("cnt").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rank_no", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_no") <= 5)
        .orderBy("part", "rank_no")
    )


_COVIS_CTES = """op AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
deg AS (SELECT p, count(*) AS deg FROM op GROUP BY p),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS cnt
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2),
sym AS (
  SELECT p1 AS part, p2 AS neighbor, cnt FROM pairs
  UNION ALL
  SELECT p2 AS part, p1 AS neighbor, cnt FROM pairs),
scored AS (
  SELECT part, neighbor, cnt,
         cnt / sqrt(CAST(da.deg * db.deg AS DOUBLE)) AS cosine
  FROM sym
  JOIN deg da ON sym.part = da.p
  JOIN deg db ON sym.neighbor = db.p),
ranked AS (
  SELECT part, neighbor, cnt, cosine,
         CAST(row_number() OVER (
           PARTITION BY part
           ORDER BY cosine DESC, cnt DESC, neighbor) AS BIGINT) AS rank_no
  FROM scored)"""

_COVISITATION_SQL = f"""
WITH {_COVIS_CTES}
SELECT part, neighbor, cnt, cosine, rank_no
FROM ranked WHERE rank_no <= 5
ORDER BY part, rank_no
"""


# --- covisitation_recs -------------------------------------------------------


def _covisitation_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer top-3 recommendations from co-visitation neighbors.

    Scores accumulate as exact micro-integers (floor(cosine·1e6+0.5))
    so the per-candidate sum is order-stable (oracle-parity rule 3);
    owned parts drop via left-anti join; top-3 is a customer-
    partitioned window.
    """
    op = _order_parts(spark, sf_dir)
    orders = load(spark, sf_dir, "orders")
    hist = (
        orders.select(F.col("o_orderkey").alias("o"), "o_custkey")
        .join(op, "o")
        .select(F.col("o_custkey").alias("cust"), "p")
        .distinct()
        # referenced twice (score join + owned anti-join) — cut lineage
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("part").orderBy(
        F.col("cosine").desc(), F.col("cnt").desc(), F.col("neighbor")
    )
    neighbors = (
        _covisitation_scored(op)
        .withColumn("rank_no", F.row_number().over(w))
        .filter(F.col("rank_no") <= 5)
        .select(
            "part",
            "neighbor",
            F.floor(F.col("cosine") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("cosine_micro"),
        )
    )
    recs = (
        hist.join(neighbors, hist.p == neighbors.part)
        .groupBy("cust", F.col("neighbor").alias("candidate"))
        .agg(
            F.sum("cosine_micro").cast("long").alias("score_micro"),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )
    owned = hist.select("cust", F.col("p").alias("candidate"))
    fresh = recs.join(owned, ["cust", "candidate"], "left_anti")
    w_cust = Window.partitionBy("cust").orderBy(
        F.col("score_micro").desc(), F.col("n_sources").desc(), F.col("candidate")
    )
    return (
        fresh.withColumn("rank_no", F.row_number().over(w_cust).cast("long"))
        .filter(F.col("rank_no") <= 3)
        .orderBy("cust", "rank_no")
    )


_RECS_SQL = f"""
WITH {_COVIS_CTES},
neighbors AS (
  SELECT part, neighbor,
         CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS cosine_micro
  FROM ranked WHERE rank_no <= 5),
hist AS (
  SELECT DISTINCT o_custkey AS cust, p
  FROM orders JOIN op ON o_orderkey = op.o),
recs AS (
  SELECT cust, neighbor AS candidate,
         CAST(sum(cosine_micro) AS BIGINT) AS score_micro,
         count(*) AS n_sources
  FROM hist JOIN neighbors ON hist.p = neighbors.part
  GROUP BY 1, 2),
fresh AS (
  SELECT r.* FROM recs r
  WHERE NOT EXISTS (
    SELECT 1 FROM hist h WHERE h.cust = r.cust AND h.p = r.candidate)),
top3 AS (
  SELECT cust, candidate, score_micro, n_sources,
         CAST(row_number() OVER (
           PARTITION BY cust
           ORDER BY score_micro DESC, n_sources DESC, candidate) AS BIGINT)
           AS rank_no
  FROM fresh)
SELECT cust, candidate, score_micro, n_sources, rank_no
FROM top3 WHERE rank_no <= 3
ORDER BY cust, rank_no
"""


# --- seasonal_naive_skill ----------------------------------------------------


def _seasonal_naive_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-7 vs lag-1 absolute forecast error per event type.

    Both lags come from equi-joins on (type, d−k) — calendar-correct
    under gaps, shuffle keyed on the series key.  Errors sum as exact
    cents; the permille ratio is integer division (both engines
    truncate toward zero on nonnegative operands).
    """
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "cents"
        )
    )
    # three aliases of the day grain → cut lineage so the fact table
    # scans once, not three times (theil_sen pattern)
    daily = daily.localCheckpoint(eager=False)
    cur, l1, l7 = daily.alias("cur"), daily.alias("l1"), daily.alias("l7")
    joined = cur.join(
        l1,
        (F.col("cur.event_type") == F.col("l1.event_type"))
        & (F.col("l1.d") == F.date_sub(F.col("cur.d"), 1)),
    ).join(
        l7,
        (F.col("cur.event_type") == F.col("l7.event_type"))
        & (F.col("l7.d") == F.date_sub(F.col("cur.d"), 7)),
    )
    agg = joined.groupBy(F.col("cur.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("cur.cents") - F.col("l1.cents")))
        .cast("long")
        .alias("naive_abs_cents"),
        F.sum(F.abs(F.col("cur.cents") - F.col("l7.cents")))
        .cast("long")
        .alias("seasonal_abs_cents"),
    )
    return agg.select(
        "event_type",
        "n_days",
        "naive_abs_cents",
        "seasonal_abs_cents",
        F.expr(
            "CAST(seasonal_abs_cents * 1000 div nullif(naive_abs_cents, 0)"
            " AS BIGINT)"
        ).alias("ratio_permille"),
    ).orderBy("event_type")


_SEASONAL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events GROUP BY 1, 2),
j AS (
  SELECT cur.event_type, cur.d,
         abs(cur.cents - l1.cents) AS e1,
         abs(cur.cents - l7.cents) AS e7
  FROM daily cur
  JOIN daily l1 ON l1.event_type = cur.event_type AND l1.d = cur.d - 1
  JOIN daily l7 ON l7.event_type = cur.event_type AND l7.d = cur.d - 7),
agg AS (
  SELECT event_type, count(*) AS n_days,
         CAST(sum(e1) AS BIGINT) AS naive_abs_cents,
         CAST(sum(e7) AS BIGINT) AS seasonal_abs_cents
  FROM j GROUP BY 1)
SELECT event_type, n_days, naive_abs_cents, seasonal_abs_cents,
       CAST(seasonal_abs_cents * 1000 // nullif(naive_abs_cents, 0)
            AS BIGINT) AS ratio_permille
FROM agg ORDER BY event_type
"""


# --- bigram_coverage_quality -------------------------------------------------


def _bigram_coverage_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage of each doc's bigram stream in the corpus top-200
    bigrams, histogrammed by source × coverage decile.

    Scale: the corpus parquet scans ONCE — the tokenized doc grain is
    checkpointed before its three uses (vocabulary count, coverage
    join, doc-grain denominator), so only in-memory rows re-explode;
    the vocabulary is a count groupBy + TakeOrderedAndProject(200)
    (never a global window); the coverage join broadcasts 200 rows;
    the per-doc denominator comes from the doc grain directly — no
    distinct over the exploded stream.  Docs with fewer than two
    tokens carry no bigrams and are excluded.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 2)
        .withColumn("n_bg", (F.size("words") - 1).cast("long"))
        .localCheckpoint(eager=False)
    )
    bg = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(words) - 1), i ->"
                " concat(element_at(words, CAST(i AS INT)), ' ',"
                " element_at(words, CAST(i + 1 AS INT))))"
            )
        ).alias("bigram"),
    )
    top = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(200)
        .select("bigram")
    )
    covered = (
        bg.join(F.broadcast(top), "bigram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    grain = (
        docs.select("doc_id", "source", "n_bg")
        .join(covered, "doc_id", "left")
        .select(
            "source",
            F.expr(
                "CAST(coalesce(covered, 0) * 1000 div n_bg div 100 AS BIGINT)"
            ).alias("bucket"),
        )
    )
    return (
        grain.groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "bucket")
    )


_BIGRAM_SQL = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS words FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
bg AS (
  SELECT doc_id, source, CAST(len(words) - 1 AS BIGINT) AS n_bg,
         unnest([words[i] || ' ' || words[i + 1]
                 for i in range(1, len(words))]) AS bigram
  FROM w),
top AS (
  SELECT bigram FROM (
    SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1)
  ORDER BY cnt DESC, bigram LIMIT 200),
covered AS (
  SELECT doc_id, count(*) AS covered
  FROM bg JOIN top USING (bigram) GROUP BY 1),
grain AS (
  SELECT source,
         CAST(coalesce(covered, 0) * 1000 // n_bg // 100 AS BIGINT) AS bucket
  FROM (SELECT DISTINCT doc_id, source, n_bg FROM bg) g
  LEFT JOIN covered USING (doc_id))
SELECT source, bucket, count(*) AS n_docs
FROM grain GROUP BY 1, 2 ORDER BY source, bucket
"""


# --- reconciliation_row_checksum ---------------------------------------------


def _reconciliation_row_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level count + md5-digest checksum compare, one scan.

    The replica is derived in-flight with md5-seeded drift (bucket 0
    of 97 → price bumped one cent, bucket 1 → row missing), so source
    and replica checksums fold in a single pass; a real deployment
    runs the identical aggregate once per side.  State per partition
    is two BIGINTs — O(partitions), never O(rows).
    """
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.trunc("o_orderdate", "month").alias("part"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        hash_bucket(F.col("o_orderkey"), 97).alias("drift"),
    )

    def digest(cents_col):
        return _md5_prefix(
            F.concat(
                F.col("k").cast("string"), F.lit(":"), cents_col.cast("string")
            )
        )

    rep_cents = F.when(F.col("drift") == 0, F.col("cents") + 1).otherwise(
        F.col("cents")
    )
    agg = base.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.sum(digest(F.col("cents"))).cast("long").alias("checksum_src"),
        F.sum(F.when(F.col("drift") != 1, 1).otherwise(0))
        .cast("long")
        .alias("n_rep"),
        F.sum(F.when(F.col("drift") != 1, digest(rep_cents)).otherwise(0))
        .cast("long")
        .alias("checksum_rep"),
    )
    return agg.select(
        "part",
        "n_src",
        "n_rep",
        "checksum_src",
        "checksum_rep",
        F.when(F.col("n_src") != F.col("n_rep"), F.lit("COUNT_MISMATCH"))
        .when(
            F.col("checksum_src") != F.col("checksum_rep"),
            F.lit("CHECKSUM_MISMATCH"),
        )
        .otherwise(F.lit("OK"))
        .alias("status"),
    ).orderBy("part")


_RECON_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         date_trunc('month', o_orderdate) AS part,
         {_CENTS} AS cents,
         {_md5_bucket_sql('o_orderkey', 97)} AS drift
  FROM orders),
agg AS (
  SELECT part,
         count(*) AS n_src,
         CAST(sum({_md5_prefix_sql(
             "CAST(k AS VARCHAR) || ':' || CAST(cents AS VARCHAR)")})
           AS BIGINT) AS checksum_src,
         CAST(sum(CASE WHEN drift <> 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_rep,
         CAST(sum(CASE WHEN drift <> 1 THEN {_md5_prefix_sql(
             "CAST(k AS VARCHAR) || ':' || CAST(CASE WHEN drift = 0"
             " THEN cents + 1 ELSE cents END AS VARCHAR)")}
                  ELSE 0 END) AS BIGINT) AS checksum_rep
  FROM base GROUP BY part)
SELECT part, n_src, n_rep, checksum_src, checksum_rep,
       CASE WHEN n_src <> n_rep THEN 'COUNT_MISMATCH'
            WHEN checksum_src <> checksum_rep THEN 'CHECKSUM_MISMATCH'
            ELSE 'OK' END AS status
FROM agg ORDER BY part
"""


# --- cdc_net_effect_compaction -----------------------------------------------


def _cdc_net_effect_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse a synthetic I/U/D change stream to net per-key effects.

    Stream synthesis (deterministic md5 buckets): keys in bucket
    5(k,5)=0 PRE-EXIST (no insert row); bucket(k,3)=0 keys carry an
    update (+500 cents); bucket(k,7)=0 keys a delete.  Compaction is
    ``max_by(value, seq)`` per key — one exchange keyed on the primary
    key, exactly the shape a Debezium topic compactor runs at scale —
    then net-op classification and a month × net-op rollup.
    """
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.trunc("o_orderdate", "month").alias("month"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (hash_bucket(F.col("o_orderkey"), 5) == 0).alias("pre_existing"),
        (hash_bucket(F.col("o_orderkey"), 3) == 0).alias("has_update"),
        (hash_bucket(F.col("o_orderkey"), 7) == 0).alias("has_delete"),
    )
    stream = base.select(
        "k",
        "month",
        "pre_existing",
        F.explode(
            F.filter(
                F.array(
                    F.when(
                        ~F.col("pre_existing"),
                        F.struct(
                            F.lit(1).alias("seq"),
                            F.lit("I").alias("op"),
                            F.col("cents").alias("val"),
                        ),
                    ),
                    F.when(
                        F.col("has_update"),
                        F.struct(
                            F.lit(2).alias("seq"),
                            F.lit("U").alias("op"),
                            (F.col("cents") + 500).alias("val"),
                        ),
                    ),
                    F.when(
                        F.col("has_delete"),
                        F.struct(
                            F.lit(3).alias("seq"),
                            F.lit("D").alias("op"),
                            F.lit(None).cast("long").alias("val"),
                        ),
                    ),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("chg"),
    )
    compacted = stream.groupBy("k", "month", "pre_existing").agg(
        F.expr("max_by(chg.op, chg.seq)").alias("last_op"),
        # last-wins over NON-DELETE ops only: Spark's max_by returns
        # the (NULL) value at the max seq while DuckDB's skips
        # NULL-value rows — guarding BOTH args keeps the intermediate
        # engine-identical (probed live on both engines)
        F.expr(
            "max_by(CASE WHEN chg.op <> 'D' THEN chg.val END,"
            " CASE WHEN chg.op <> 'D' THEN chg.seq END)"
        ).alias("final_cents"),
    )
    net = compacted.withColumn(
        "net_op",
        F.when(
            F.col("last_op") == "D",
            F.when(F.col("pre_existing"), F.lit("DELETE")).otherwise(
                F.lit("NOOP")
            ),
        ).otherwise(
            F.when(F.col("pre_existing"), F.lit("UPDATE")).otherwise(
                F.lit("INSERT")
            )
        ),
    )
    return (
        net.groupBy("month", "net_op")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(
                F.when(
                    F.col("net_op").isin("INSERT", "UPDATE"),
                    F.col("final_cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("surviving_cents"),
        )
        .orderBy("month", "net_op")
    )


_CDC_NET_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         date_trunc('month', o_orderdate) AS month,
         {_CENTS} AS cents,
         {_md5_bucket_sql('o_orderkey', 5)} = 0 AS pre_existing,
         {_md5_bucket_sql('o_orderkey', 3)} = 0 AS has_update,
         {_md5_bucket_sql('o_orderkey', 7)} = 0 AS has_delete
  FROM orders),
stream AS (
  SELECT k, month, pre_existing, 1 AS seq, 'I' AS op, cents AS val
  FROM base WHERE NOT pre_existing
  UNION ALL
  SELECT k, month, pre_existing, 2, 'U', cents + 500
  FROM base WHERE has_update
  UNION ALL
  SELECT k, month, pre_existing, 3, 'D', NULL
  FROM base WHERE has_delete),
compacted AS (
  SELECT k, month, pre_existing,
         max_by(op, seq) AS last_op,
         max_by(CASE WHEN op <> 'D' THEN val END,
                CASE WHEN op <> 'D' THEN seq END) AS final_cents
  FROM stream GROUP BY 1, 2, 3),
net AS (
  SELECT month,
         CASE WHEN last_op = 'D'
                THEN CASE WHEN pre_existing THEN 'DELETE' ELSE 'NOOP' END
              ELSE CASE WHEN pre_existing THEN 'UPDATE' ELSE 'INSERT' END
         END AS net_op,
         final_cents
  FROM compacted)
SELECT month, net_op, count(*) AS n_keys,
       CAST(sum(CASE WHEN net_op IN ('INSERT', 'UPDATE')
                     THEN final_cents ELSE 0 END) AS BIGINT)
         AS surviving_cents
FROM net GROUP BY 1, 2 ORDER BY month, net_op
"""


QUERIES: dict[str, QuerySpec] = {
    "spearman_rank_corr": QuerySpec(_spearman_rank_corr, _SPEARMAN_SQL),
    "mann_kendall_trend": QuerySpec(_mann_kendall_trend, _MANN_KENDALL_SQL),
    "item_item_covisitation": QuerySpec(
        _item_item_covisitation, _COVISITATION_SQL
    ),
    "covisitation_recs": QuerySpec(_covisitation_recs, _RECS_SQL),
    "seasonal_naive_skill": QuerySpec(_seasonal_naive_skill, _SEASONAL_SQL),
    "bigram_coverage_quality": QuerySpec(
        _bigram_coverage_quality, _BIGRAM_SQL
    ),
    "reconciliation_row_checksum": QuerySpec(
        _reconciliation_row_checksum, _RECON_SQL
    ),
    "cdc_net_effect_compaction": QuerySpec(
        _cdc_net_effect_compaction, _CDC_NET_SQL
    ),
}
