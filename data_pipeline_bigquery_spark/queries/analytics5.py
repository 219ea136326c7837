"""Coverage batch 5 — growth-analytics and search-engine primitives.

Four analytic shapes every warehouse user eventually asks for, plus
the retrieval primitive every corpus pipeline needs:

- ``cumulative_distinct_users``: running distinct-user count per day.
  The naive form (``COUNT(DISTINCT) OVER (ORDER BY day)``) rescans the
  full prefix per day — O(n²) and unsupported by most engines anyway.
  The scale form decomposes into *first-seen day per user* (one
  user-keyed exchange — the only data-proportional shuffle) followed
  by a cumulative sum over day-grain rows (bounded by the calendar,
  thousands of rows, so the single global window is safe).
- ``peak_open_orders``: maximum number of simultaneously-open orders
  per priority, where an order is open from ``o_orderdate`` until its
  last ``l_shipdate``.  The naive interval self-join is O(n²); the
  scale form is the classic *sweep line*: ±1 deltas at interval
  endpoints, aggregated to (priority, day) grain, then a running sum
  whose argmax is the peak.  All exchanges after the delta aggregation
  are day-grain.
- ``event_pair_affinity``: market-basket lift between event types.
  Per-user distinct types self-joined within user — fan-out is bounded
  by the *type* cardinality (k·(k−1)/2 pairs per user, k=5 here), so
  the join output is O(users), never O(events²).
- ``inverted_index_build``: the search-engine core — term → postings.
  df/tf come from a hash aggregate on term; the postings *preview* is
  cut to the first 5 (doc, pos) entries per term with a rank window
  BEFORE any list is materialised, so no executor ever holds a hot
  term's full posting list (a stop-word's list is corpus-sized at
  100 TB).  Spark's WindowGroupLimit pushes the rank<=5 cut below the
  exchange, so even the shuffle carries only per-partition top-5s.
- ``keyword_search_bm25lite``: ranked keyword retrieval over the
  corpus with a BM25-shaped score (k1=1.2, b=0.75) whose idf factor is
  the log-free rational ``(2N−2df+1)/(2df+1)`` — rank-monotone in df
  exactly like the BM25 idf, but expressible in engine-portable
  integer arithmetic.  Every per-term score is ONE IEEE division of
  two exact int64s (identical bits on both engines), routed through
  DECIMAL(38,12) so the 3-term sum is exact decimal arithmetic — the
  same portability pattern as ``chi_square_lang_source``.  One corpus
  pass (explode → per-doc conditional aggregate), stats broadcast
  back, TakeOrderedAndProject top-10.

Reference analog: the reference's reporting layer answers "how many
accounts have we ever touched" / "what do engaged users do together"
style questions with pandas groupbys over full REST extracts
(`/root/reference/pipeline/hubspot_deal_logs/hubspot_deal_log_pipeline.py:44-136`); the
retrieval ops serve the corpus-search need its BigQuery console
queries fill today.

Engine-portability rules (PERFORMANCE.md): integer arithmetic end to
end; the only divisions are single IEEE double divisions of exact
int64 inputs; multi-term sums route through DECIMAL(38,12); every
LIMIT sits on a total order with an explicit tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries.quantile_util import (
    cumulative_value_histogram,
    rank_rule_pct,
)
from data_pipeline_bigquery_spark.functions.timestamps import to_epoch_seconds
from data_pipeline_bigquery_spark.queries import QuerySpec


# --- cumulative distinct users ----------------------------------------------

def _cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per day via the first-seen
    decomposition: a user contributes to the cumulative count exactly
    on their first-seen day, so ``cum_users(d) = Σ_{d'<=d}
    new_users(d')``.  The user-keyed min-aggregate is the only
    event-proportional exchange; the window runs on day-grain rows."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    new_per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    all_days = ev.select("day").distinct()
    # Left join keeps days where only returning users were active
    # (new_users = 0); the window is day-grain (calendar-bounded), so
    # the single global ordering is safe at any corpus size.
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        all_days.join(new_per_day, "day", "left")
        .select("day", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .select(
            "day",
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
        )
    )


_CUMULATIVE_USERS_SQL = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
npd AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1),
days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
SELECT d.day,
       CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
       CAST(sum(COALESCE(n.new_users, 0)) OVER (
              ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM days d LEFT JOIN npd n USING (day)
"""


# --- peak concurrently-open orders (sweep line) ------------------------------

def _peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max simultaneously-open orders per priority, sweep-line form:
    +1 at ``o_orderdate``, −1 the day after the order's last
    ``l_shipdate``.  After the (priority, day) delta aggregate, every
    exchange is day-grain; the interval self-join the naive form needs
    never happens.  First day attaining the peak breaks ties."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("start_day"),
    )
    last_ship = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
    )
    # The synthetic fixture has orders whose last shipment precedes
    # the order date; an order is open at least on its placement day,
    # so the interval end clamps to greatest(last_ship, start_day).
    spans = orders.join(
        last_ship, orders.o_orderkey == last_ship.l_orderkey
    ).select(
        "o_orderpriority",
        "start_day",
        F.greatest("last_ship", "start_day").alias("last_ship"),
    )
    deltas = spans.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("start_day").alias("day"),
        F.lit(1).alias("delta"),
    ).unionAll(
        spans.select(
            F.col("o_orderpriority").alias("priority"),
            F.date_add("last_ship", 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    grain = deltas.groupBy("priority", "day").agg(F.sum("delta").alias("d"))
    w_run = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    conc = grain.select(
        "priority", "day", F.sum("d").over(w_run).alias("open_orders")
    )
    w_rank = Window.partitionBy("priority").orderBy(
        F.col("open_orders").desc(), F.col("day")
    )
    return (
        conc.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "priority",
            F.col("open_orders").alias("peak_open"),
            F.col("day").alias("peak_date"),
        )
    )


_PEAK_OPEN_SQL = """
WITH spans AS (
  SELECT o.o_orderpriority AS priority,
         CAST(o.o_orderdate AS DATE) AS start_day,
         greatest(max(CAST(l.l_shipdate AS DATE)),
                  CAST(o.o_orderdate AS DATE)) AS last_ship
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2, o.o_orderkey),
deltas AS (
  SELECT priority, start_day AS day, 1 AS delta FROM spans
  UNION ALL
  SELECT priority, last_ship + 1, -1 FROM spans),
grain AS (
  SELECT priority, day, sum(delta) AS d FROM deltas GROUP BY 1, 2),
conc AS (
  SELECT priority, day,
         sum(d) OVER (PARTITION BY priority ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS open_orders
  FROM grain),
ranked AS (
  SELECT priority, day, open_orders,
         row_number() OVER (PARTITION BY priority
                            ORDER BY open_orders DESC, day) AS rn
  FROM conc)
SELECT priority, CAST(open_orders AS BIGINT) AS peak_open, day AS peak_date
FROM ranked WHERE rn = 1
"""


# --- event-type pair affinity (market basket) --------------------------------

def _event_pair_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift between event-type pairs: how much more often do two types
    co-occur in the same user's history than independence predicts.
    ``lift = n_pair · n_users / (n_a · n_b)`` — exact int64 products,
    one IEEE division.  The within-user self-join fans out to at most
    k·(k−1)/2 rows per user (k = type cardinality, 5 here), so output
    is O(users) regardless of event volume."""
    # ut feeds both pair arms, the type counts and the user total —
    # lineage cut (rule 14), or events re-scans 5× (measured pre-cut)
    ut = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pair_counts = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    type_counts = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_type")
    )
    totals = ut.agg(F.countDistinct("user_id").alias("n_users"))
    return (
        pair_counts.join(
            F.broadcast(
                type_counts.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n_type").alias("n_a"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                type_counts.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n_type").alias("n_b"),
                )
            ),
            "type_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "type_a",
            "type_b",
            "n_pair",
            (
                (F.col("n_pair") * F.col("n_users")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


_PAIR_AFFINITY_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pc AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_pair
  FROM ut a JOIN ut b ON a.user_id = b.user_id
  WHERE a.event_type < b.event_type
  GROUP BY 1, 2),
tc AS (SELECT event_type, count(*) AS n_type FROM ut GROUP BY 1),
tot AS (SELECT count(DISTINCT user_id) AS n_users FROM ut)
SELECT pc.type_a, pc.type_b, CAST(pc.n_pair AS BIGINT) AS n_pair,
       CAST(pc.n_pair * tot.n_users AS DOUBLE)
         / CAST(ta.n_type * tb.n_type AS DOUBLE) AS lift
FROM pc
JOIN tc ta ON ta.event_type = pc.type_a
JOIN tc tb ON tb.event_type = pc.type_b
CROSS JOIN tot
"""


# --- inverted index ----------------------------------------------------------

_POSTINGS_PREVIEW = 5


def _inverted_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term → (df, tf, first-5 postings) over the corpus tokenizer
    (space split, the same machinery as ``chunk_dedup_ratio``).  The
    rank window cuts each term's postings to 5 BEFORE any list
    aggregation, so no executor materialises a hot term's full list —
    WindowGroupLimit additionally applies the cut per-partition below
    the exchange.  df/tf aggregate over ALL postings on the same term
    key (AQE reuses the exchange where it can)."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term"),
        )
        .filter(F.col("term") != "")
    )
    full = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    w = Window.partitionBy("term").orderBy("doc_id", "pos")
    preview = (
        toks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _POSTINGS_PREVIEW)
        .groupBy("term")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "pos"))),
                    lambda s: F.concat_ws(":", s.doc_id, s.pos),
                ),
            ).alias("postings")
        )
    )
    return full.join(preview, "term").select(
        "term", "df", "tf", "postings"
    )


_INVERTED_INDEX_SQL = f"""
WITH toks AS (
  SELECT doc_id, t.pos, t.term
  FROM (SELECT doc_id,
               unnest([{{'pos': i - 1, 'term': toks[i]}}
                       for i in generate_series(1, len(toks))]) AS t
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents))
  WHERE t.term <> ''),
full_agg AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
  FROM toks GROUP BY 1),
ranked AS (
  SELECT term, doc_id, pos,
         row_number() OVER (PARTITION BY term ORDER BY doc_id, pos) AS rn
  FROM toks),
preview AS (
  SELECT term,
         string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR),
                    ' ' ORDER BY doc_id, pos) AS postings
  FROM ranked WHERE rn <= {_POSTINGS_PREVIEW} GROUP BY 1)
SELECT f.term, CAST(f.df AS BIGINT) AS df, CAST(f.tf AS BIGINT) AS tf,
       p.postings
FROM full_agg f JOIN preview p USING (term)
"""


# --- BM25-lite keyword search ------------------------------------------------

_Q_TERMS = ("merge", "scan", "window")  # fixture vocabulary, all SFs
_TOP_K = 10


def _keyword_search_bm25lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 docs for the 3-term query, BM25-shaped scoring in
    engine-portable arithmetic.  Per term:

        score_t = 44·tf·T·(2N−2df+1)
                  ─────────────────────────────────
                  (20·T·tf + 6·T + 18·dl·N)·(2df+1)

    which is tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) · idf_lite with
    k1=1.2, b=0.75, avgdl=T/N, both sides multiplied by 20·T — all
    int64-exact (≤ ~1e14 at sf0.1), then ONE IEEE division.  idf_lite
    = (2N−2df+1)/(2df+1) is the log-free Robertson idf: same sign and
    monotonicity, no transcendentals, so the oracle hash-matches.
    Terms sum in fixed order through DECIMAL(38,12).

    Two corpus passes — the classic stats-then-score ranking: each
    pass is explode → per-doc conditional aggregate (dl and the three
    tfs in one shuffle keyed on doc_id); the 1-row stats reduce
    broadcasts back into the scoring pass; top-10 is a
    TakeOrderedAndProject, never a global sort.  (Catalyst cannot
    share the per-doc aggregate across the two branches without
    caching; at scale the stats pass is the price of exact idf.)"""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_TOP_K)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared keyword arm: every matching doc with its BM25-lite
    score (see ``_keyword_search_bm25lite``), pre-ranking."""
    t1, t2, t3 = _Q_TERMS
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    perdoc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        F.sum((F.col("term") == t1).cast("long")).alias("tf1"),
        F.sum((F.col("term") == t2).cast("long")).alias("tf2"),
        F.sum((F.col("term") == t3).cast("long")).alias("tf3"),
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tok"),
        F.sum((F.col("tf1") > 0).cast("long")).alias("df1"),
        F.sum((F.col("tf2") > 0).cast("long")).alias("df2"),
        F.sum((F.col("tf3") > 0).cast("long")).alias("df3"),
    )

    def term_score(tf: str, df: str) -> F.Column:
        n, t = F.col("n_docs"), F.col("total_tok")
        num = (
            F.lit(44) * F.col(tf) * t * (F.lit(2) * n - F.lit(2) * F.col(df) + F.lit(1))
        ).cast("double")
        den = (
            (F.lit(20) * t * F.col(tf) + F.lit(6) * t + F.lit(18) * F.col("dl") * n)
            * (F.lit(2) * F.col(df) + F.lit(1))
        ).cast("double")
        return (num / den).cast("decimal(38,12)")

    return (
        perdoc.crossJoin(F.broadcast(stats))
        .filter((F.col("tf1") + F.col("tf2") + F.col("tf3")) > 0)
        .select(
            "doc_id",
            "tf1",
            "tf2",
            "tf3",
            F.round(
                term_score("tf1", "df1")
                + term_score("tf2", "df2")
                + term_score("tf3", "df3"),
                6,
            )
            .cast("double")
            .alias("score"),
        )
    )


_BM25_SCORED_CTES = f"""toks AS (
  SELECT doc_id, w AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''),
perdoc AS (
  SELECT doc_id, count(*) AS dl,
         sum(CASE WHEN term = '{_Q_TERMS[0]}' THEN 1 ELSE 0 END) AS tf1,
         sum(CASE WHEN term = '{_Q_TERMS[1]}' THEN 1 ELSE 0 END) AS tf2,
         sum(CASE WHEN term = '{_Q_TERMS[2]}' THEN 1 ELSE 0 END) AS tf3
  FROM toks GROUP BY 1),
stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_tok,
         sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
         sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
         sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
  FROM perdoc),
kw_scored AS (
SELECT doc_id, CAST(tf1 AS BIGINT) AS tf1, CAST(tf2 AS BIGINT) AS tf2,
       CAST(tf3 AS BIGINT) AS tf3,
       CAST(round(
         CAST(CAST(44 * tf1 * total_tok * (2 * n_docs - 2 * df1 + 1) AS DOUBLE)
              / CAST((20 * total_tok * tf1 + 6 * total_tok + 18 * dl * n_docs)
                     * (2 * df1 + 1) AS DOUBLE) AS DECIMAL(38,12))
         + CAST(CAST(44 * tf2 * total_tok * (2 * n_docs - 2 * df2 + 1) AS DOUBLE)
              / CAST((20 * total_tok * tf2 + 6 * total_tok + 18 * dl * n_docs)
                     * (2 * df2 + 1) AS DOUBLE) AS DECIMAL(38,12))
         + CAST(CAST(44 * tf3 * total_tok * (2 * n_docs - 2 * df3 + 1) AS DOUBLE)
              / CAST((20 * total_tok * tf3 + 6 * total_tok + 18 * dl * n_docs)
                     * (2 * df3 + 1) AS DOUBLE) AS DECIMAL(38,12)), 6)
       AS DOUBLE) AS score
FROM perdoc CROSS JOIN stats
WHERE tf1 + tf2 + tf3 > 0)"""


_BM25LITE_SQL = f"""
WITH {_BM25_SCORED_CTES}
SELECT doc_id, tf1, tf2, tf3, score FROM kw_scored
ORDER BY score DESC, doc_id
LIMIT {_TOP_K}
"""


# --- Pareto skyline (distributed prefix scan) --------------------------------

_SKYLINE_BUCKETS = 256


def _pareto_skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers on the (spend, order-count) Pareto frontier: nobody
    else has both ≥ spend and ≥ orders with one strict.  The naive
    dominance test is an O(n²) self-join; the 2-D scale form is a
    PREFIX MAX — a point survives iff its order count beats the max
    order count over all strictly-higher spends — and a global prefix
    max over data-proportional rows must NOT be a single-partition
    window.  This runs it as the classic two-phase distributed scan:
    range-bucket on spend, local running max per bucket (partitioned
    window), bucket-level maxima rolled into a strict-prefix max over
    the ~256 bucket rows (tiny global window), then
    ``greatest(local, higher-bucket)``.  Equal-spend domination is
    handled by reducing to distinct spend levels first (a customer
    survives only with the level's max order count); duplicate
    (spend, orders) points are mutually non-dominating and all kept.
    The oracle is the NAIVE O(n²) NOT EXISTS — a genuinely independent
    formulation."""
    # per_cust feeds the level reduction AND the final membership
    # join; levels feeds the range probe + bucketing; lv feeds the
    # local and bucket-max windows — lineage cuts (rule 14); the
    # pre-cut plan re-scanned orders 5×
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .localCheckpoint(eager=False)
    )
    levels = (
        per_cust.groupBy("spend")
        .agg(F.max("n_orders").alias("maxn"))
        .localCheckpoint(eager=False)
    )
    rng = levels.agg(
        F.min("spend").alias("smin"), F.max("spend").alias("smax")
    )
    nb = F.lit(_SKYLINE_BUCKETS)
    lv = (
        levels.crossJoin(F.broadcast(rng))
        .withColumn(
            "b",
            F.when(F.col("smax") == F.col("smin"), F.lit(0)).otherwise(
                F.least(
                    nb - 1,
                    F.floor(
                        (F.col("spend") - F.col("smin")).cast("double")
                        * nb
                        / (F.col("smax") - F.col("smin")).cast("double")
                    ).cast("int"),
                )
            ),
        )
        .localCheckpoint(eager=False)
    )
    w_local = (
        Window.partitionBy("b")
        .orderBy(F.col("spend").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = lv.withColumn("local_pm", F.max("maxn").over(w_local))
    w_bucket = Window.orderBy(F.col("b").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    higher = (
        lv.groupBy("b")
        .agg(F.max("maxn").alias("bm"))
        .withColumn("higher_pm", F.max("bm").over(w_bucket))
        .select("b", "higher_pm")
    )
    m1 = F.greatest(
        F.coalesce(F.col("local_pm"), F.lit(-1)),
        F.coalesce(F.col("higher_pm"), F.lit(-1)),
    )
    sky_levels = (
        local.join(F.broadcast(higher), "b")
        .filter(m1 < F.col("maxn"))
        .select(F.col("spend").alias("s_spend"), F.col("maxn"))
    )
    return per_cust.join(
        F.broadcast(sky_levels),
        (per_cust.spend == F.col("s_spend"))
        & (per_cust.n_orders == F.col("maxn")),
    ).select(
        "o_custkey", F.col("spend").cast("double").alias("spend"), "n_orders"
    )


_SKYLINE_SQL = """
WITH pc AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT p.o_custkey, CAST(p.spend AS DOUBLE) AS spend,
       CAST(p.n_orders AS BIGINT) AS n_orders
FROM pc p
WHERE NOT EXISTS (
  SELECT 1 FROM pc q
  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
    AND (q.spend > p.spend OR q.n_orders > p.n_orders))
"""


# --- nearest-centroid confusion matrix ---------------------------------------

_QSCALE = 1_000_000


def quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, q) with components quantized to integer micros
    — the engine-portable embedding representation (see
    :func:`assigned_label_cells` for the float policy)."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _QSCALE).cast("long"),
        ).alias("q"),
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(c_label, c, n_l) rational label centroids: per-dim component
    SUMS (array c, dim-ordered) plus the member count — never a float
    mean.  Shared by the assignment (below), the diversity sample
    (analytics12), and the own-label outlier audit (analytics13).

    ONE corpus pass: the member count rides the same (label, dim)
    aggregation as the sums (every vector contributes each dim exactly
    once, so the per-dim row count IS n_l — the same construction the
    oracle's ``cent`` CTE uses); a separate count branch would scan
    the embedding table a second time.  The label-count-sized result
    is lazily checkpointed so every consumer join reads the tiny
    materialized table instead of re-deriving it."""
    return (
        emb.select("label", F.posexplode("q").alias("dim", "qi"))
        .groupBy("label", "dim")
        .agg(F.sum("qi").alias("s"), F.count(F.lit(1)).alias("n_dim"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "s"))),
                lambda t: t.s,
            ).alias("c"),
            F.max("n_dim").alias("n_l"),
        )
        .select(F.col("label").alias("c_label"), "c", "n_l")
        .localCheckpoint(eager=False)
    )


def centroid_dist_num():
    """The squared-distance NUMERATOR Column ``Σ_d (q_d·n_l − S_d)²``
    over columns ``q`` (quantized vector), ``c`` (centroid sums), and
    ``n_l`` — int64 diffs squared in double (correctly rounded,
    engine-identical) folded through DECIMAL(38,6) (order-exact).  The
    ONE Spark-side source of the distance arithmetic, shared by the
    assignment below and the own-label outlier audit (analytics13) —
    the same no-fork rule as :func:`centroid_ctes` on the oracle side.
    """
    return F.aggregate(
        F.zip_with(
            "q",
            "c",
            lambda qi, s: (
                (qi * F.col("n_l") - s).cast("double")
                * (qi * F.col("n_l") - s).cast("double")
            ).cast("decimal(38,6)"),
        ),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, x: acc + x,
    )


def assigned_label_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector nearest-LABEL-CENTROID assignment — (vec_id, label,
    c_label, dist, rn=1) rows; the shared core of the
    ``nearest_centroid_confusion`` audit and the
    ``semantic_diversity_sample`` curation key (analytics12).

    Engine-portable float policy: components quantize to integer
    micros (float→double is exact, ×1e6 correctly rounded, floor
    deterministic — identical int64s on both engines).  The label
    centroid stays a RATIONAL (component sum S, count n) — never a
    float mean — so the squared distance NUMERATOR is
    ``Σ_d (q_d·n − S_d)²``, exact int64 diffs squared in double
    (correctly rounded, identical) and summed through DECIMAL(38,6)
    (order-exact), then normalized by ``n²`` with ONE correctly-
    rounded IEEE division so distances COMPARE fairly across labels
    of different sizes (the unnormalized numerator scales by each
    label's own n² and biases the argmin toward small labels).
    int64 bound: |q·n| ≤ 1e6·n_label, safe below ~9e12
    rows per label; beyond that drop _QSCALE.

    Plan shape: the 10 (centroid, count) rows broadcast; each vector
    computes all 10 distances in ONE whole-stage HOF fold over its own
    array — the corpus never shuffles for assignment, only the final
    10×10 confusion aggregate exchanges.  The oracle recomputes
    distances via an explicit dim-join — an independent formulation of
    the same exact arithmetic."""
    emb = quantized_embeddings(spark, sf_dir)
    cents = label_centroids(emb)
    num = centroid_dist_num()
    dist = num.cast("double") / (
        # square in DOUBLE: int64 n_l*n_l wraps above ~3e9 rows/label
        F.col("n_l").cast("double") * F.col("n_l").cast("double")
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "c_label")
    return (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "label",
            "c_label",
            dist.alias("dist"),
            # the EXACT pre-division numerator: within one cell n_l is
            # constant, so ordering by dist_num ≡ ordering by dist but
            # in exact DECIMAL arithmetic (the diversity sample ranks
            # on this — the double dist is ulp-divergent cross-engine)
            num.alias("dist_num"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )


def _nearest_centroid_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The confusion rollup over :func:`assigned_label_cells` (see that
    helper for the full float policy and plan-shape discussion)."""
    return (
        assigned_label_cells(spark, sf_dir)
        .groupBy("label", F.col("c_label").alias("assigned"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def centroid_ctes() -> str:
    """CTE chain ending in ``cent`` — the quantized vectors (``q``),
    their exploded dims (``ex``), and the per-label rational centroids
    (``cent``: component sums + counts, never float means).  The ONE
    oracle-side source of the centroid arithmetic, shared by the
    assignment chain below and the own-label outlier audit
    (analytics13)."""
    return f"""q AS (
  SELECT vec_id, label,
         [CAST(floor(CAST(x AS DOUBLE) * {_QSCALE}) AS BIGINT)
          for x in embedding] AS qv
  FROM embeddings),
ex AS (
  SELECT vec_id, label, t.dim, t.qi
  FROM (SELECT vec_id, label,
               unnest([{{'dim': i, 'qi': qv[i]}}
                       for i in generate_series(1, len(qv))]) AS t
        FROM q)),
cent AS (
  SELECT label AS c_label, dim, sum(qi) AS s, count(*) AS n_l
  FROM ex GROUP BY 1, 2)"""


def assigned_cells_ctes() -> str:
    """CTE chain ending in ``assigned`` — (vec_id, label, c_label,
    dist) per vector, rn=1 rows only.  Shared by the confusion oracle
    here and the diversity-sample oracle (analytics12), so the
    assignment arithmetic can never fork between the two."""
    return f"""{centroid_ctes()},
dists AS (
  SELECT e.vec_id, e.label, c.c_label,
         sum(CAST(CAST(e.qi * c.n_l - c.s AS DOUBLE)
                  * CAST(e.qi * c.n_l - c.s AS DOUBLE)
                  AS DECIMAL(38,6))) AS num,
         any_value(c.n_l) AS n_l
  FROM ex e JOIN cent c USING (dim)
  GROUP BY 1, 2, 3),
r AS (
  SELECT vec_id, label, c_label, num AS dist_num,
         CAST(num AS DOUBLE)
           / (CAST(n_l AS DOUBLE) * CAST(n_l AS DOUBLE)) AS dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY CAST(num AS DOUBLE)
                                     / (CAST(n_l AS DOUBLE)
                                        * CAST(n_l AS DOUBLE)),
                                     c_label) AS rn
  FROM dists),
assigned AS (
  SELECT vec_id, label, c_label, dist, dist_num FROM r WHERE rn = 1)"""


_CENTROID_SQL = f"""
WITH {assigned_cells_ctes()}
SELECT label, c_label AS assigned, CAST(count(*) AS BIGINT) AS n
FROM assigned GROUP BY 1, 2
"""


# --- hybrid retrieval: reciprocal-rank fusion --------------------------------

_RRF_K = 60
_ARM_DEPTH = 20
_HYBRID_QUERY_VEC = 0  # query = embedding of vec_id 0 (doc_id ≡ vec_id)


def _hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the RAG-era primitive: fuse the keyword arm
    (BM25-lite over ``documents``) with the vector arm (cosine against
    the query embedding) by reciprocal-rank fusion,
    ``rrf = Σ_arm 1/(60 + rank_arm)``.  RRF needs only RANKS, so the
    two arms' incomparable score scales never meet — which is exactly
    why it is the standard fusion baseline.

    Scale shape: each arm reduces to its top-20 via
    TakeOrderedAndProject BEFORE any rank window exists, so the
    row_number windows run on ≤20-row inputs — there is no
    data-proportional global window.  The fusion itself is a full
    outer join of two 20-row lists.  Portability: ranks are exact
    ints; each RRF term is ONE IEEE division (1/(60+r)); the two-term
    sum is fixed-order double addition, rounded at 6."""
    kw_top = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", "score")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(_ARM_DEPTH)
    )
    kw_rank = kw_top.withColumn(
        "kw_rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id"))
        ),
    ).select("doc_id", "kw_rank")

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == _HYBRID_QUERY_VEC).select(
        F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm2 = lambda c: F.aggregate(  # noqa: E731
        F.zip_with(c, c, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vec_top = (
        emb.filter(F.col("vec_id") != _HYBRID_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                # rule 9: zero-norm vectors -> NULL cosine, both engines
                dot
                / F.when(
                    F.sqrt(norm2("v")) * F.sqrt(norm2("qv")) != 0.0,
                    F.sqrt(norm2("v")) * F.sqrt(norm2("qv")),
                ),
                6,
            ).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("doc_id"))
        .limit(_ARM_DEPTH)
    )
    vec_rank = vec_top.withColumn(
        "vec_rank",
        F.row_number().over(
            Window.orderBy(F.col("cos").desc(), F.col("doc_id"))
        ),
    ).select("doc_id", "vec_rank")

    fused = kw_rank.join(vec_rank, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("kw_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
        ),
        6,
    )
    return (
        fused.select(
            "doc_id",
            F.col("kw_rank").cast("long").alias("kw_rank"),
            F.col("vec_rank").cast("long").alias("vec_rank"),
            rrf.alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(_TOP_K)
    )


_HYBRID_SQL = f"""
WITH {_BM25_SCORED_CTES},
kw_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS kw_rank
  FROM kw_scored QUALIFY kw_rank <= {_ARM_DEPTH}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qv AS (SELECT v FROM e WHERE vec_id = {_HYBRID_QUERY_VEC}),
vec_scored AS (
  SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.v, qv.v)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(qv.v, qv.v))), 6) AS cos
  FROM e, qv WHERE e.vec_id <> {_HYBRID_QUERY_VEC}),
vec_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS vec_rank
  FROM vec_scored QUALIFY vec_rank <= {_ARM_DEPTH}),
fused AS (
  SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
         CAST(k.kw_rank AS BIGINT) AS kw_rank,
         CAST(v.vec_rank AS BIGINT) AS vec_rank
  FROM kw_rank k FULL OUTER JOIN vec_rank v ON k.doc_id = v.doc_id)
SELECT doc_id, kw_rank, vec_rank,
       round(COALESCE(1.0 / ({_RRF_K} + kw_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + vec_rank), 0.0), 6) AS rrf
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_TOP_K}
"""


# --- rolling active users (DAU / WAU / stickiness) ---------------------------

def _rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct — per day: DAU, 7-day WAU, and the
    DAU/WAU stickiness ratio.  Distinct-over-sliding-window has no
    incremental form (distinct doesn't subtract), so the scale shape
    is the contribution EXPLODE: each (user, day) presence contributes
    to target days d..d+6 (bounded 7× blow-up), then one distinct
    aggregate per target day — never a per-day rescan of the trailing
    week.  The oracle uses the range-join formulation instead — an
    independent derivation."""
    pres = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = pres.select("day").distinct()
    dau = pres.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = pres.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 6))
        ).alias("day"),
    )
    wau = (
        contrib.join(days, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


_ROLLING_ACTIVE_SQL = """
WITH pres AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM pres),
dau AS (SELECT day, count(*) AS dau FROM pres GROUP BY 1),
wau AS (
  SELECT d.day, count(DISTINCT p.user_id) AS wau
  FROM days d JOIN pres p ON p.day BETWEEN d.day - 6 AND d.day
  GROUP BY 1)
SELECT d.day, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
         AS stickiness
FROM days d JOIN dau USING (day) JOIN wau USING (day)
"""


# --- first-touch attribution -------------------------------------------------

def _first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: every user's purchase revenue credited
    to the event type that FIRST touched them.  First touch is a
    per-user rank window (ts, event_id tiebreak — deterministic under
    same-timestamp arrivals); purchase totals aggregate per user in
    exact DECIMAL; both exchanges key on user_id and the final rollup
    is type-cardinality-sized."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
            F.count(F.lit(1)).alias("np"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        first.join(purch, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.coalesce(F.col("np"), F.lit(0))).alias("n_purchases"),
            F.sum(F.coalesce(F.col("pv"), zero))
            .cast("double")
            .alias("attributed_value"),
        )
    )


_FIRST_TOUCH_SQL = """
WITH first AS (
  SELECT user_id, event_type AS first_touch
  FROM (SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn = 1),
purch AS (
  SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS pv, count(*) AS np
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT f.first_touch,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(COALESCE(p.np, 0)) AS BIGINT) AS n_purchases,
       CAST(sum(COALESCE(p.pv, CAST(0 AS DECIMAL(18,2)))) AS DOUBLE)
         AS attributed_value
FROM first f LEFT JOIN purch p USING (user_id)
GROUP BY 1
"""


# --- entity resolution: golden record ----------------------------------------

def _entity_resolution_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution — the master-data op every CRM
    pipeline eventually needs: sorted-neighborhood candidate pairs
    (``fuzzy_name_match``: one sort shuffle, O(n·w) candidates, never
    block²) → connected components (pointer jumping, O(log n) rounds)
    → one GOLDEN RECORD per entity: canonical key (min member),
    canonical name, member roster.  Every stage is the scale form of
    its textbook counterpart; the grouped entity table is kill-list
    sized, so the golden-name lookup broadcasts the entity side
    against the customer dim."""
    from data_pipeline_bigquery_spark.extensions.clusters import (
        connected_components,
    )
    from data_pipeline_bigquery_spark.queries.coverage3 import (
        _fuzzy_name_match,
    )

    pairs = _fuzzy_name_match(spark, sf_dir).select(
        F.col("cust_a").alias("doc_a"), F.col("cust_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    entities = comp.groupBy(F.col("component").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
        ).alias("members"),
    )
    names = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        names.join(
            F.broadcast(entities),
            names.c_custkey == entities.entity_id,
        )
        .select(
            "entity_id",
            F.col("c_name").alias("canonical_name"),
            "n_members",
            "members",
        )
    )


def _entity_resolution_sql() -> str:
    from data_pipeline_bigquery_spark.queries.coverage3 import _FUZZY_SQL

    return f"""
WITH RECURSIVE fp AS ({_FUZZY_SQL}),
edges AS (SELECT cust_a AS src, cust_b AS dst FROM fp
          UNION SELECT cust_b, cust_a FROM fp),
reach AS (
  SELECT src AS node, dst AS peer FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.peer),
comp AS (
  SELECT node AS member, least(node, min(peer)) AS entity_id
  FROM reach GROUP BY node)
SELECT c.entity_id, cu.c_name AS canonical_name,
       CAST(c.n_members AS BIGINT) AS n_members, c.members
FROM (SELECT entity_id, count(*) AS n_members,
             string_agg(CAST(member AS VARCHAR), ',' ORDER BY member)
               AS members
      FROM comp GROUP BY 1) c
JOIN customer cu ON cu.c_custkey = c.entity_id
"""


# --- graph triangle count (degree-ordered orientation) -----------------------

def _graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the name-similarity graph (the ER candidate
    pairs): edge count, wedge count, triangle count, and the global
    clustering coefficient 3T/W — the structural audit that tells you
    whether "similar" is transitive enough to trust single-link
    clustering.

    The scale algorithm is DEGREE-ORDERED ORIENTATION (node-iterator):
    orient every edge from its (degree, id)-smaller endpoint, so each
    node's OUT-degree is O(√m) even at a hub; wedges enumerate as
    out-neighbor pairs canonically ordered by the same total order,
    and a triangle closes iff the oriented edge (v→w) exists — one
    equi-join, no OR-condition, never the naive Σd² wedge explosion
    from a hub.  The oracle is the textbook three-way a<b<c self-join
    — an independent quadratic formulation."""
    from data_pipeline_bigquery_spark.queries.coverage3 import (
        _fuzzy_name_match,
    )

    raw = _fuzzy_name_match(spark, sf_dir)
    e = raw.select(
        F.least("cust_a", "cust_b").alias("a"),
        F.greatest("cust_a", "cust_b").alias("b"),
    ).distinct()
    return triangle_stats(e)


def triangle_stats(e: DataFrame) -> DataFrame:
    """Degree-ordered triangle census over an undirected edge list
    (columns ``a < b``, deduplicated).  See `_graph_triangle_stats`."""
    # e feeds both degree arms, the orientation join and the edge
    # count; ed feeds both wedge sides plus the closing join —
    # lineage cuts (rule 14), or the similarity self-join behind e
    # re-runs up to 18× (measured before the cut)
    e = e.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("d_b"))
    # orient from the (degree, id)-smaller endpoint
    ed = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("d_a") < F.col("d_b"))
                | ((F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("src"),
                    F.col("b").alias("dst"),
                    F.col("d_b").alias("d_dst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("src"),
                    F.col("a").alias("dst"),
                    F.col("d_a").alias("d_dst"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.d_dst")
        .localCheckpoint(eager=False)
    )
    x, y = ed.alias("x"), ed.alias("y")
    # canonical wedge order = the orientation order itself, so the
    # closing edge can only be (v→w) — a single equi-join
    wedges = x.join(y, F.col("x.src") == F.col("y.src")).filter(
        (F.col("x.d_dst") < F.col("y.d_dst"))
        | (
            (F.col("x.d_dst") == F.col("y.d_dst"))
            & (F.col("x.dst") < F.col("y.dst"))
        )
    )
    closing = ed.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(
        closing,
        (F.col("x.dst") == F.col("v")) & (F.col("y.dst") == F.col("w")),
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = e.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        F.broadcast(
            deg.agg(
                F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
            )
        )
    )
    return stats.crossJoin(F.broadcast(tri)).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ),
        ).otherwise(F.lit(0.0)).alias("global_clustering"),
    )


def _triangle_sql() -> str:
    from data_pipeline_bigquery_spark.queries.coverage3 import _FUZZY_SQL

    return f"""
WITH fp AS ({_FUZZY_SQL}),
ed AS (SELECT DISTINCT least(cust_a, cust_b) AS a,
                       greatest(cust_a, cust_b) AS b FROM fp),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY 1),
tri AS (
  SELECT count(*) AS t
  FROM ed x JOIN ed y ON y.a = x.a AND y.b > x.b
            JOIN ed z ON z.a = x.b AND z.b = y.b),
w AS (SELECT sum(d * (d - 1) // 2) AS n_wedges FROM deg),
ne AS (SELECT count(*) AS n_edges FROM ed)
SELECT CAST(ne.n_edges AS BIGINT) AS n_edges,
       CAST(w.n_wedges AS BIGINT) AS n_wedges,
       CAST(tri.t AS BIGINT) AS n_triangles,
       CASE WHEN w.n_wedges > 0
            THEN round(3.0 * tri.t / w.n_wedges, 6) ELSE 0.0 END
         AS global_clustering
FROM ne, w, tri
"""


# --- integer-exact PageRank --------------------------------------------------

_PR_SCALE = 1_000_000_000_000  # 1e12 integer mass units
_PR_ITERS = 3
_PR_TOP = 10


def pagerank_integer(edges: DataFrame, iters: int = _PR_ITERS) -> DataFrame:
    """PageRank with damping 0.85 in INTEGER arithmetic: all mass is
    integer units of 1e-12, every division is a floor ``div`` —
    deterministic on any engine, so the oracle can unroll the same
    iterations in SQL and hash-match exactly (float PageRank never
    cross-checks bit-for-bit; mass leaks ≤1 unit per floor, which is
    the price of exactness and irrelevant to ranking).

    ``edges`` is undirected (a, b); each iteration is the Pregel step
    as two hash exchanges: join rank onto the directed edge list keyed
    on src, re-aggregate keyed on dst.  Iteration count is fixed and
    small (the graph-diameter argument as pointer jumping)."""
    # directed feeds degrees + rank-join + node domain, and ed/nodes
    # are re-referenced every iteration — lineage cuts (rule 14), or
    # each Pregel step re-derives the whole edge list from the source
    directed = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    out = directed.groupBy("src").agg(F.count(F.lit(1)).alias("out_d"))
    ed = directed.join(out, "src").localCheckpoint(eager=False)
    nodes = (
        directed.select(F.col("src").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    p = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "v", F.expr(f"{_PR_SCALE} div n").alias("p"), "n"
    )
    for _ in range(iters):
        contrib = (
            ed.join(p.select(F.col("v").alias("src"), "p"), "src")
            .select(
                F.col("dst").alias("v"),
                F.expr("p * 85 div (100 * out_d)").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        p = (
            nodes.crossJoin(F.broadcast(n_nodes))
            .join(contrib, "v", "left")
            .select(
                "v",
                (
                    F.expr(f"({_PR_SCALE} * 15) div (100 * n)")
                    + F.coalesce("c", F.lit(0))
                ).alias("p"),
                "n",
            )
            # each iteration's rank feeds the next — cut per round
            .localCheckpoint(eager=False)
        )
    return p.select("v", "p")


def _pagerank_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 central customers of the name-similarity graph by
    integer PageRank — the 'which records sit at the center of a
    duplicate tangle' signal ER reviewers triage by."""
    from data_pipeline_bigquery_spark.queries.coverage3 import (
        _fuzzy_name_match,
    )

    e = (
        _fuzzy_name_match(spark, sf_dir)
        .select(
            F.least("cust_a", "cust_b").alias("a"),
            F.greatest("cust_a", "cust_b").alias("b"),
        )
        .distinct()
    )
    return (
        pagerank_integer(e)
        .orderBy(F.col("p").desc(), F.col("v"))
        .limit(_PR_TOP)
    )


def _pagerank_sql() -> str:
    from data_pipeline_bigquery_spark.queries.coverage3 import _FUZZY_SQL

    base = f"({_PR_SCALE} * 15) // (100 * (SELECT n FROM nn))"
    iters = "".join(
        f""",
p{i + 1} AS (
  SELECT nodes.v,
         {base} + COALESCE(c.c, 0) AS p
  FROM nodes LEFT JOIN (
    SELECT ed.dst AS v, sum(p{i}.p * 85 // (100 * ed.out_d)) AS c
    FROM ed JOIN p{i} ON p{i}.v = ed.src GROUP BY 1) c USING (v))"""
        for i in range(_PR_ITERS)
    )
    return f"""
WITH fp AS ({_FUZZY_SQL}),
e AS (SELECT DISTINCT least(cust_a, cust_b) AS a,
                      greatest(cust_a, cust_b) AS b FROM fp),
directed AS (SELECT a AS src, b AS dst FROM e
             UNION ALL SELECT b, a FROM e),
outd AS (SELECT src, count(*) AS out_d FROM directed GROUP BY 1),
ed AS (SELECT d.src, d.dst, o.out_d FROM directed d JOIN outd o USING (src)),
nodes AS (SELECT DISTINCT src AS v FROM directed),
nn AS (SELECT count(*) AS n FROM nodes),
p0 AS (SELECT v, {_PR_SCALE} // (SELECT n FROM nn) AS p FROM nodes){iters}
SELECT v, CAST(p AS BIGINT) AS p FROM p{_PR_ITERS}
ORDER BY p DESC, v LIMIT {_PR_TOP}
"""


# --- reaggregatable histogram quantiles --------------------------------------

_HIST_BUCKETS = 100


def _histogram_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles served from a STORED HISTOGRAM, at every grain, with
    no raw rescan — the warehouse pattern when sketches aren't
    available: prices land in 100 equi-width integer-cent buckets per
    month; the month-grain histogram is the stored table; the
    corpus-wide grain REAGGREGATES bucket counts (sum, never rescan);
    p50/p95 read off the cumulative histogram as bucket upper edges.

    Everything is integer arithmetic — cents, floor-div bucket
    assignment, cumulative-count comparisons ``cum·100 ≥ p·total`` —
    so the oracle hash-matches exactly (no float quantile semantics to
    reconcile across engines).  The per-grain cumulative window runs
    on ≤100 bucket rows.  Month 0 is the reaggregated all-months row."""
    li = load(spark, sf_dir, "lineitem").select(
        F.month("l_shipdate").alias("mon"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    rng = li.agg(
        F.min("cents").alias("mn"), F.max("cents").alias("mx")
    )
    bucketed = li.crossJoin(F.broadcast(rng)).select(
        "mon",
        F.expr(
            f"(cents - mn) * {_HIST_BUCKETS} div (mx - mn + 1)"
        ).alias("b"),
        "mn",
        "mx",
    )
    # the stored-histogram frame feeds the overall rollup AND the
    # per-month union — lineage cut (rule 14); the two narrow li scans
    # (range probe + bucketing) stay: checkpointing a raw fact scan
    # would cost more than the re-read
    monthly = (
        bucketed.groupBy("mon", "b", "mn", "mx")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    overall = monthly.groupBy("b", "mn", "mx").agg(
        F.sum("cnt").alias("cnt")
    ).select(F.lit(0).alias("mon"), "b", "mn", "mx", "cnt")
    hist = monthly.unionByName(overall)
    cum = cumulative_value_histogram(
        hist,
        "b",
        partition_cols=("mon",),
        count_col="cnt",
        carry_cols=("mn", "mx"),
    )
    edge = F.expr(f"mn + ((b + 1) * (mx - mn + 1)) div {_HIST_BUCKETS}")
    return cum.groupBy("mon").agg(
        F.max("total").alias("n"),
        rank_rule_pct(50, edge).alias("p50_edge_cents"),
        rank_rule_pct(95, edge).alias("p95_edge_cents"),
    )


_HIST_QUANTILE_SQL = f"""
WITH li AS (
  SELECT month(l_shipdate) AS mon,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem),
rng AS (SELECT min(cents) AS mn, max(cents) AS mx FROM li),
bucketed AS (
  SELECT mon, (cents - mn) * {_HIST_BUCKETS} // (mx - mn + 1) AS b, mn, mx
  FROM li CROSS JOIN rng),
monthly AS (
  SELECT mon, b, mn, mx, count(*) AS cnt FROM bucketed GROUP BY 1, 2, 3, 4),
hist AS (
  SELECT * FROM monthly
  UNION ALL
  SELECT 0 AS mon, b, mn, mx, sum(cnt) FROM monthly GROUP BY 2, 3, 4),
cum AS (
  SELECT mon, b, mn, mx,
         sum(cnt) OVER (PARTITION BY mon ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER (PARTITION BY mon) AS total
  FROM hist)
SELECT mon, CAST(max(total) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum * 100 >= 50 * total
                THEN mn + ((b + 1) * (mx - mn + 1)) // {_HIST_BUCKETS} END)
            AS BIGINT) AS p50_edge_cents,
       CAST(min(CASE WHEN cum * 100 >= 95 * total
                THEN mn + ((b + 1) * (mx - mn + 1)) // {_HIST_BUCKETS} END)
            AS BIGINT) AS p95_edge_cents
FROM cum GROUP BY 1
"""


# --- session path analysis ---------------------------------------------------

_PATH_CAP = 8
_PATH_TOP = 10


def _top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the 10 most common event-type
    sequences of a 30-min-gap session (first 8 steps) — the product-
    analytics question "how do sessions actually flow".  Sessions form
    with the same lag/cumulative-break machinery as
    ``sessionize_events`` but ordered by (ts, event_id) so same-
    timestamp events sequence deterministically on every engine; the
    per-session path assembles from a rank-capped prefix (≤8 rows per
    session ever aggregate into a list) and the path census is a
    string-keyed hash aggregate + TakeOrderedAndProject."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        to_epoch_seconds("ts") - to_epoch_seconds(F.lag("ts").over(w_ord))
        > 1800,
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(brk)
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_idx"),
    )
    w_rank = Window.partitionBy("user_id", "session_idx").orderBy(
        "ts", "event_id"
    )
    paths = (
        sess.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _PATH_CAP)
        .groupBy("user_id", "session_idx")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(_PATH_TOP)
    )


_SESSION_PATHS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged),
ranked AS (
  SELECT user_id, session_idx, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_idx
                            ORDER BY ts, event_id) AS rn
  FROM sess),
paths AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= {_PATH_CAP} GROUP BY 1, 2)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOP}
"""


# --- trailing z-score burst detection ----------------------------------------

_BURST_WINDOW = 7


def _event_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days where an event type's count exceeds its trailing-7-day
    mean by 2σ — the ops-alerting shape.  The z-score never computes a
    square root or a float mean: with trailing sum S, sum-of-squares
    Q, n=7, the condition ``c > S/n + 2·σ`` is algebraically
    ``d > 0 AND d² > 4·(Q·n − S²)`` for ``d = c·n − S`` — all exact
    wide-integer arithmetic (DECIMAL on Spark, HUGEINT in the oracle),
    so the flag is bit-deterministic with no float variance semantics
    to reconcile.  The window is a calendar RANGE frame over day
    numbers, not a row frame: a day with no events is a true zero in
    the baseline (it contributes nothing to S and Q while n stays 7),
    so a sparse series is never judged against a weeks-old baseline.
    Warm-up days (series younger than 7 days) never flag.  The
    fixture's stream genuinely contains a handful of 2σ days (the
    driver hash pins them); the planted-spike unit test additionally
    pins the threshold from both sides."""
    n = _BURST_WINDOW
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "day_num", F.datediff("day", F.lit("1970-01-01").cast("date"))
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-n, -1)
    )
    w_all = Window.partitionBy("event_type")
    trail = daily.select(
        "event_type",
        "day",
        "day_num",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("s"),
        F.coalesce(
            F.sum(F.col("c") * F.col("c")).over(w), F.lit(0)
        ).alias("q"),
        F.min("day_num").over(w_all).alias("first_day"),
    )
    d = (F.col("c") * n - F.col("s")).cast("decimal(19,0)")
    rhs = (
        F.col("q").cast("decimal(19,0)") * n
        - F.col("s").cast("decimal(19,0)") * F.col("s")
    ) * 4
    return (
        trail.filter(
            (F.col("day_num") - F.col("first_day") >= n)
            & (d > 0)
            & (d * d > rhs)
        )
        .select("event_type", "day", F.col("c").alias("n_events"), "s", "q")
    )


_BURST_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
  FROM events GROUP BY 1, 2, 4),
trail AS (
  SELECT event_type, day, day_num, c,
         COALESCE(sum(c) OVER w, 0) AS s,
         COALESCE(sum(c * c) OVER w, 0) AS q,
         min(day_num) OVER (PARTITION BY event_type) AS first_day
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_num
               RANGE BETWEEN {_BURST_WINDOW} PRECEDING AND 1 PRECEDING))
SELECT event_type, day, CAST(c AS BIGINT) AS n_events,
       CAST(s AS BIGINT) AS s, CAST(q AS BIGINT) AS q
FROM trail
WHERE day_num - first_day >= {_BURST_WINDOW}
  AND c * {_BURST_WINDOW} - s > 0
  AND CAST(c * {_BURST_WINDOW} - s AS HUGEINT) * (c * {_BURST_WINDOW} - s)
      > 4 * (CAST(q AS HUGEINT) * {_BURST_WINDOW} - CAST(s AS HUGEINT) * s)
"""


# --- foreign-key inference audit ---------------------------------------------

_FK_CANDIDATES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    # negative control: user_id is NOT a supplier key (2/3 containment
    # on the fixture) — the audit must report, not assume
    ("events", "user_id", "supplier", "s_suppkey"),
)


def _fk_inference_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profiling: measure value-set containment child ⊆ parent
    for every candidate key pair — the evidence an FK-inference tool
    (or a migration review) runs before trusting join semantics.  Per
    pair: distinct child values, orphans (left-anti vs the parent
    key), and integer-permille containment.  No broadcast hint on the
    anti-join: parents range from 25-row dims to fact-proportional key
    sets (orders, customer), so AQE picks broadcast vs shuffle per
    pair — a forced broadcast would OOM on the fact-sized parents at
    scale.  The negative control row proves the audit reports, not
    assumes."""
    import functools

    parts = []
    for child_t, child_c, parent_t, parent_c in _FK_CANDIDATES:
        child = (
            load(spark, sf_dir, child_t)
            .select(F.col(child_c).alias("k"))
            .filter(F.col("k").isNotNull())
            .distinct()
        )
        parent = load(spark, sf_dir, parent_t).select(
            F.col(parent_c).alias("k")
        )
        orphans = child.join(parent, "k", "left_anti")
        parts.append(
            child.agg(F.count(F.lit(1)).alias("n_distinct"))
            .crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
                )
            )
            .select(
                F.lit(f"{child_t}.{child_c}").alias("child_key"),
                F.lit(f"{parent_t}.{parent_c}").alias("parent_key"),
                "n_distinct",
                "n_orphans",
                F.expr(
                    "(n_distinct - n_orphans) * 1000 div n_distinct"
                ).alias("containment_permille"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def _fk_inference_sql() -> str:
    selects = []
    for child_t, child_c, parent_t, parent_c in _FK_CANDIDATES:
        selects.append(f"""
SELECT '{child_t}.{child_c}' AS child_key, '{parent_t}.{parent_c}' AS parent_key,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
       CAST((count(*) - sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)) * 1000
            // count(*) AS BIGINT) AS containment_permille
FROM (SELECT DISTINCT {child_c} AS k FROM {child_t}
      WHERE {child_c} IS NOT NULL) c
LEFT JOIN (SELECT DISTINCT {parent_c} AS k FROM {parent_t}) p USING (k)""")
    return "\nUNION ALL\n".join(selects)


# --- time-decayed aggregation ------------------------------------------------

_DECAY_HALFLIFE_DAYS = 7


def _time_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-weighted engagement per event type — the recency-
    weighted score ranking/feed systems use, with a portability trick:
    the half-life decay factor is a POWER OF TWO (2^-k for k =
    whole half-lives elapsed), and multiplying a double by 2^-k is
    EXACT (exponent arithmetic, no mantissa rounding) — so unlike
    exp()-based decay the per-row decayed value is bit-identical on
    every engine.  2^k builds by integer shift (k ≤ span/half-life,
    fixture ≤ 4); the sum routes through DECIMAL(38,12) as usual.
    One scan, one 1-row max-day broadcast, one type-keyed aggregate."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    mx = ev.agg(F.max("day").alias("mxd"))
    # least(k, 62): a 64-bit shift silently wraps at k >= 64 (Java
    # shifts mod 64) — capped, anything older than 62 half-lives decays
    # below DECIMAL(38,12) resolution and contributes exactly 0
    decayed = F.expr(
        "CAST(CAST(v AS DOUBLE) / CAST(shiftleft(1L, CAST(least("
        f"datediff(mxd, day) div {_DECAY_HALFLIFE_DAYS}, 62)"
        " AS INT)) AS DOUBLE) AS DECIMAL(38,12))"
    )
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(decayed), 6).cast("double").alias("decayed_value"),
        )
    )


_DECAY_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events),
mx AS (SELECT max(day) AS mxd FROM ev)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(CAST(
              CAST(v AS DOUBLE)
              / CAST(1 << least(date_diff('day', day, mxd)
                                // {_DECAY_HALFLIFE_DAYS}, 62)
                     AS DOUBLE)
              AS DECIMAL(38,12))), 6) AS DOUBLE) AS decayed_value
FROM ev CROSS JOIN mx
GROUP BY 1
"""


# --- share-of-parent (ratio_to_report) ---------------------------------------

def _revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue — the
    ratio_to_report window shape.  The star joins broadcast (nation/
    region/customer dims); revenue aggregates to NATION grain first
    (25 rows), and only that tiny aggregate sees the share window —
    the fact table never meets a window.  Shares are one IEEE division of
    two exact decimal→double sums."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1.0).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("rev"),
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    # nation/region are fixed-size dims → forced broadcast; customer
    # grows with scale factor, so AQE decides that join
    nation_rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum("rev").alias("rev"))
    )
    w = Window.partitionBy("r_name")
    return nation_rev.select(
        F.col("r_name").alias("region"),
        F.col("n_name").alias("nation"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w).cast("double"),
            6,
        ).alias("share_of_region"),
    )


_REV_SHARE_SQL = """
WITH nr AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
           AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2)
SELECT region, nation, CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE)
             / CAST(sum(rev) OVER (PARTITION BY region) AS DOUBLE), 6)
         AS share_of_region
FROM nr
"""


# --- dense-rank top-N with ties ----------------------------------------------

def _latest_shipments_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every lineitem on each supplier's two most recent ship DAYS —
    the WITH-TIES window shape (``dense_rank``), complementing
    ``topk_per_group``'s row_number: a day with 40 shipments keeps all
    40, and day boundaries — not row counts — bound the output.
    Spark's WindowGroupLimit pushes the dense_rank≤2 cut below the
    exchange exactly as it does for row_number, so each partition
    pre-prunes to its own two newest days before shuffling."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("ship_day"),
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.col("ship_day").desc())
    return (
        li.withColumn("day_rank", F.dense_rank().over(w))
        .filter(F.col("day_rank") <= 2)
        .select(
            "l_suppkey",
            "ship_day",
            "l_orderkey",
            "l_linenumber",
            F.col("day_rank").cast("int").alias("day_rank"),
        )
    )


_LATEST_SHIP_SQL = """
SELECT l_suppkey, ship_day, l_orderkey, l_linenumber,
       CAST(day_rank AS INT) AS day_rank
FROM (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_day,
         l_orderkey, l_linenumber,
         dense_rank() OVER (PARTITION BY l_suppkey
                            ORDER BY CAST(l_shipdate AS DATE) DESC)
           AS day_rank
  FROM lineitem)
WHERE day_rank <= 2
"""


# --- two-sample KS drift -----------------------------------------------------

_KS_TYPE_A = "click"
_KS_TYPE_B = "view"


def _drift_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared KS / Mann-Whitney prep: cents-grain counts (ca, cb) of
    the two compared event types.  NULL values are excluded HERE, on
    both engines — Spark windows order NULLS FIRST while DuckDB orders
    NULLS LAST, so a NULL grain row would shift every cumulative count
    differently per engine."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_TYPE_A, _KS_TYPE_B))
        .select(
            (F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            (F.col("event_type") == _KS_TYPE_A).cast("long").alias("is_a"),
            (F.col("event_type") == _KS_TYPE_B).cast("long").alias("is_b"),
        )
        .filter(F.col("cents").isNotNull())
        .groupBy("cents")
        .agg(F.sum("is_a").alias("ca"), F.sum("is_b").alias("cb"))
    )


_DRIFT_CTES = f"""ev AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CASE WHEN event_type = '{_KS_TYPE_A}' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = '{_KS_TYPE_B}' THEN 1 ELSE 0 END AS is_b
  FROM events
  WHERE event_type IN ('{_KS_TYPE_A}', '{_KS_TYPE_B}')
    AND value IS NOT NULL),
grain AS (
  SELECT cents, sum(is_a) AS ca, sum(is_b) AS cb FROM ev GROUP BY 1)"""


def _value_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift between the value
    distributions of two event types — the distribution-shift audit a
    pipeline runs before trusting that yesterday's data looks like
    today's.  The KS statistic ``max|F_a(x) − F_b(x)|`` computes in
    EXACT integer arithmetic: with per-value cumulative counts cumA,
    cumB and totals nA, nB, the max of ``|cumA·nB − cumB·nA|`` is the
    statistic scaled by nA·nB (cross-multiplied through DECIMAL so no
    count magnitude overflows) and divides back out in one IEEE
    division at the very end.  The cumulative window runs on
    VALUE-DOMAIN grain (distinct cent values — bounded by the price
    domain, not the row count) after a cents-keyed aggregate."""
    grain = _drift_grain(spark, sf_dir)
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = grain.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    # totals reduce from the grain — no second scan of events
    totals = grain.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    diff = F.abs(
        F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
        - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(diff).cast("long").alias("ks_scaled"),
        )
        .select(
            "n_a",
            "n_b",
            "ks_scaled",
            F.round(
                F.col("ks_scaled").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("ks_stat"),
        )
    )


_KS_SQL = f"""
WITH {_DRIFT_CTES},
cum AS (
  SELECT sum(ca) OVER w AS cum_a, sum(cb) OVER w AS cum_b
  FROM grain
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)),
tot AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM grain)
SELECT CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(max(abs(CAST(cum_a AS HUGEINT) * n_b
                    - CAST(cum_b AS HUGEINT) * n_a)) AS BIGINT) AS ks_scaled,
       round(CAST(max(abs(CAST(cum_a AS HUGEINT) * n_b
                          - CAST(cum_b AS HUGEINT) * n_a)) AS DOUBLE)
             / CAST(max(n_a) * max(n_b) AS DOUBLE), 6) AS ks_stat
FROM cum CROSS JOIN tot
"""


# --- revenue concentration (Gini + Lorenz) -----------------------------------

_GINI_BUCKETS = 256


def _ranked_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend with a DISTRIBUTED global rank (columns x,
    r): the two-phase scan — range-bucket on spend, row_number within
    each bucket, 256-row prefix offsets broadcast back.  Shared by the
    Gini and Lorenz operators."""
    # per_cust feeds the range probe + bucketing, bucketed feeds the
    # local ranks + offsets, and callers reference the result 2-4× —
    # lineage cuts (rule 14), or orders re-scans 8× (measured at the
    # lorenz key before the cut)
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
        .localCheckpoint(eager=False)
    )
    rng = per_cust.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    nb = F.lit(_GINI_BUCKETS)
    b = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            nb - 1,
            F.floor(
                (F.col("x") - F.col("mn")).cast("double")
                * nb
                / (F.col("mx") - F.col("mn")).cast("double")
            ).cast("int"),
        )
    )
    bucketed = (
        per_cust.crossJoin(F.broadcast(rng))
        .select("o_custkey", "x", b.alias("b"))
        .localCheckpoint(eager=False)
    )
    w_local = Window.partitionBy("b").orderBy("x", "o_custkey")
    local = bucketed.withColumn("rn", F.row_number().over(w_local))
    w_off = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        bucketed.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("b", "offset")
    )
    return local.join(F.broadcast(offsets), "b").select(
        "x", (F.col("offset") + F.col("rn")).alias("r")
    )


def _revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the revenue-concentration
    audit ("how much of our revenue is a handful of accounts").  Uses
    the sorted-form identity ``G = (2·Σ rankᵢ·xᵢ − (n+1)·Σx) /
    (n·Σx)`` with EXACT decimal sums and integer ranks; one IEEE
    division at the end.

    The global rank is NOT a single-partition window: it is the same
    two-phase distributed scan as ``pareto_skyline_customers`` —
    range-bucket on spend, row_number within each bucket, bucket-count
    prefix offsets (a ~256-row window) broadcast back, global rank =
    offset + local rank.  Ties break by custkey; equal spends swapping
    ranks leaves Σ rank·x unchanged, so the statistic is
    deterministic."""
    ranked = _ranked_spend(spark, sf_dir)
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            (
                F.lit(2) * F.sum(F.col("r") * F.col("x"))
                - (F.max("r") + 1) * F.sum("x")
            ).cast("double")
            / (F.max("r") * F.sum("x")).cast("double"),
            6,
        ).alias("gini"),
    )


def _lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve at decile grain — the table behind the Gini
    number: the bottom-k-decile customers' cumulative share of total
    revenue.  Reuses the distributed global rank (``_ranked_spend``);
    decile assignment is floor-div integer math on the rank, the
    cumulative window runs on 10 decile rows, and the share is one
    IEEE division of exact decimal sums."""
    ranked = _ranked_spend(spark, sf_dir).localCheckpoint(eager=False)
    n = ranked.agg(
        F.max("r").alias("n"), F.sum("x").alias("total")
    )
    dec = (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.least(
                F.lit(9), F.expr("(r - 1) * 10 div n").cast("int")
            ).alias("decile"),
            "x",
            "total",
        )
        .groupBy("decile", "total")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum("x").alias("dx"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dec.select(
        "decile",
        "n_customers",
        F.round(
            F.sum("dx").over(w).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("cum_revenue_share"),
    )


_LORENZ_SQL = """
WITH pc AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders GROUP BY 1),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS r FROM pc),
n AS (SELECT max(r) AS n, sum(x) AS total FROM ranked),
dec AS (
  SELECT least(9, CAST((r - 1) * 10 // n.n AS INT)) AS decile,
         count(*) AS n_customers, sum(x) AS dx, max(n.total) AS total
  FROM ranked CROSS JOIN n GROUP BY 1)
SELECT decile, CAST(n_customers AS BIGINT) AS n_customers,
       round(CAST(sum(dx) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS cum_revenue_share
FROM dec
"""


_GINI_SQL = """
WITH pc AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
  FROM orders GROUP BY 1),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS r FROM pc)
SELECT CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(2 * sum(r * x) - (max(r) + 1) * sum(x) AS DOUBLE)
             / CAST(max(r) * sum(x) AS DOUBLE), 6) AS gini
FROM ranked
"""


# --- Mann-Whitney U drift (rank-sum) -----------------------------------------

def _value_drift_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between the same two value distributions as
    ``value_drift_ks`` — KS asks "do the distributions differ
    anywhere"; U asks "does one stochastically dominate", and
    U/(nA·nB) is the AUC effect size.  Ties take midranks, which are
    half-integers — so everything computes DOUBLED to stay in exact
    integers: for a tied group at value v spanning ranks
    (prev_cum, prev_cum + c(v)], its doubled midrank is
    ``2·prev_cum + c(v) + 1`` and

        2·U_A = Σ_v cA(v)·(2·prev_cum(v) + c(v) + 1) − n_A·(n_A+1)

    Products route through DECIMAL(38,0) (cum·count reaches n² long
    before int64 dies at corpus scale); ONE IEEE division yields the
    AUC.  Shares ``_drift_grain`` (cents-grain counts, NULL-guarded)
    with the KS op."""
    grain = _drift_grain(spark, sf_dir)
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    with_prev = grain.select(
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)).alias(
            "prev_cum"
        ),
    )
    term = F.col("ca").cast("decimal(38,0)") * (
        F.lit(2) * F.col("prev_cum") + F.col("ca") + F.col("cb") + F.lit(1)
    )
    sums = with_prev.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(term).alias("rank2_a"),
    )
    u2_a = F.col("rank2_a") - (
        F.col("n_a").cast("decimal(38,0)") * (F.col("n_a") + 1)
    )
    return sums.select(
        "n_a",
        "n_b",
        u2_a.cast("long").alias("u2_a"),
        F.round(
            u2_a.cast("double")
            / (F.lit(2.0) * (F.col("n_a") * F.col("n_b")).cast("double")),
            6,
        ).alias("auc"),
    )


_MANNWHITNEY_SQL = f"""
WITH {_DRIFT_CTES},
wp AS (
  SELECT ca, cb,
         COALESCE(sum(ca + cb) OVER (ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prev_cum
  FROM grain),
sums AS (
  SELECT sum(ca) AS n_a, sum(cb) AS n_b,
         sum(CAST(ca AS HUGEINT) * (2 * prev_cum + ca + cb + 1)) AS rank2_a
  FROM wp)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(rank2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
       round(CAST(rank2_a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE)
             / (2.0 * CAST(n_a * n_b AS DOUBLE)), 6) AS auc
FROM sums
"""


# --- cohort LTV curve --------------------------------------------------------

def _orders_with_first_ym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared growth-metric prep: every order with its integer month
    key (year·12+month) and the customer's FIRST-ever order month —
    the one definition of 'new customer' / 'cohort' that
    ``cohort_ltv_curve`` and ``new_vs_returning_revenue`` must agree
    on.  Columns: o_custkey, ym, first_ym, v (DECIMAL)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("ym"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    first = orders.groupBy("o_custkey").agg(F.min("ym").alias("first_ym"))
    return orders.join(first, "o_custkey")


_FIRST_YM_CTES = """o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS ym,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders),
first AS (SELECT o_custkey, min(ym) AS first_ym FROM o GROUP BY 1),
of AS (SELECT o.o_custkey, o.ym, o.v, f.first_ym
       FROM o JOIN first f USING (o_custkey))"""


def _cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per acquisition cohort by month offset — the
    LTV curve finance actually plots (``cohort_retention`` counts
    heads; this weights by money).  Cohort = the customer's first
    order month; offsets are exact integer month arithmetic
    (year·12+month, no cross-engine months_between semantics); revenue
    sums in DECIMAL; the cumulative window runs on (cohort × offset)
    grain — dozens of rows.  Exchanges: one per-customer min, one
    cohort-grain aggregate.  Cohort definition shared with
    ``new_vs_returning_revenue`` via ``_orders_with_first_ym``."""
    cells = (
        _orders_with_first_ym(spark, sf_dir)
        .groupBy(
            F.col("first_ym").alias("cohort_ym"),
            (F.col("ym") - F.col("first_ym")).alias("month_offset"),
        )
        .agg(F.sum("v").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.select(
        "cohort_ym",
        "month_offset",
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


_COHORT_LTV_SQL = f"""
WITH {_FIRST_YM_CTES},
cells AS (
  SELECT first_ym AS cohort_ym, ym - first_ym AS month_offset,
         sum(v) AS rev
  FROM of GROUP BY 1, 2)
SELECT cohort_ym, month_offset,
       CAST(sum(rev) OVER (PARTITION BY cohort_ym ORDER BY month_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_revenue
FROM cells
"""


# --- inter-order gap percentiles ---------------------------------------------

def _order_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/p50/p75 of the days between a customer's consecutive orders
    — the repurchase-cadence metric.  Gaps compute with a per-customer
    lag window (integer days); the percentile reads off a GAP-DOMAIN
    cumulative histogram (distinct gap values, bounded by the
    calendar) with the integer rank rule ``cum·100 ≥ p·total`` — the
    same engine-exact quantile machinery as
    ``histogram_quantile_rollup``, no float percentile semantics."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        orders.select(
            F.datediff("day", F.lag("day").over(w)).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    grain = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("c"))
    cum = cumulative_value_histogram(grain, "gap")
    return cum.agg(
        F.max("total").alias("n_gaps"),
        rank_rule_pct(25, "gap").alias("p25_gap_days"),
        rank_rule_pct(50, "gap").alias("p50_gap_days"),
        rank_rule_pct(75, "gap").alias("p75_gap_days"),
    )


_ORDER_GAP_SQL = """
WITH gaps AS (
  SELECT date_diff('day',
           lag(CAST(o_orderdate AS DATE))
             OVER (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders),
grain AS (
  SELECT gap, count(*) AS c FROM gaps WHERE gap IS NOT NULL GROUP BY 1),
cum AS (
  SELECT gap,
         sum(c) OVER (ORDER BY gap
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS total
  FROM grain)
SELECT CAST(max(total) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN cum * 100 >= 25 * total THEN gap END) AS BIGINT)
         AS p25_gap_days,
       CAST(min(CASE WHEN cum * 100 >= 50 * total THEN gap END) AS BIGINT)
         AS p50_gap_days,
       CAST(min(CASE WHEN cum * 100 >= 75 * total THEN gap END) AS BIGINT)
         AS p75_gap_days
FROM cum
"""


# --- new vs returning revenue ------------------------------------------------

def _new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into NEW (customer's first-ever order
    month) vs RETURNING — the growth-mix metric every revenue review
    opens with.  The newness flag derives from a per-customer min
    (one user-keyed exchange) joined back; integer year·12+month keys;
    DECIMAL sums; the output is month-grain.  Newness definition
    shared with ``cohort_ltv_curve`` via ``_orders_with_first_ym``."""
    return (
        _orders_with_first_ym(spark, sf_dir)
        .groupBy("ym")
        .agg(
            F.sum(
                F.when(F.col("ym") == F.col("first_ym"), F.col("v")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("new_revenue"),
            F.sum(
                F.when(F.col("ym") != F.col("first_ym"), F.col("v")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("returning_revenue"),
            F.sum((F.col("ym") == F.col("first_ym")).cast("long")).alias(
                "n_new_orders"
            ),
        )
    )


_NEW_RETURNING_SQL = f"""
WITH {_FIRST_YM_CTES}
SELECT ym,
       CAST(sum(CASE WHEN ym = first_ym THEN v
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS new_revenue,
       CAST(sum(CASE WHEN ym <> first_ym THEN v
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS returning_revenue,
       CAST(sum(CASE WHEN ym = first_ym THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_orders
FROM of
GROUP BY 1
"""


# --- weekday seasonality -----------------------------------------------------

def _weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume by ISO weekday (1=Mon..7=Sun) with integer-permille
    share — the seasonality profile behind capacity planning.
    Cross-engine calendar trap handled explicitly: Spark's
    ``dayofweek`` is 1=SUNDAY while DuckDB's ``isodow`` is 1=Monday,
    so the Spark side maps ``weekday()+1`` (0=Mon → 1=Mon) to the ISO
    convention both sides emit.  Share is floor-div permille of exact
    counts."""
    ev = load(spark, sf_dir, "events").select(
        (F.weekday("ts") + 1).alias("iso_dow")
    )
    counts = ev.groupBy("iso_dow").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "iso_dow",
            "n",
            F.expr("n * 1000 div total").alias("share_permille"),
        )
    )


_WEEKDAY_SQL = """
WITH c AS (
  SELECT isodow(ts) AS iso_dow, count(*) AS n FROM events GROUP BY 1),
t AS (SELECT sum(n) AS total FROM c)
SELECT iso_dow, CAST(n AS BIGINT) AS n,
       CAST(n * 1000 // total AS BIGINT) AS share_permille
FROM c CROSS JOIN t
"""


# --- market basket: co-purchased parts ---------------------------------------

_BASKET_TOP = 20


def _basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 co-purchased part pairs with lift — retail market-basket
    proper (baskets = orders), distinct from ``event_pair_affinity``'s
    per-user type sets.  The within-order self-join fans out to
    lines·(lines−1)/2 pairs per order — bounded by basket size, never
    O(catalog²); lift = one IEEE division of exact int64 products;
    top-20 is a TakeOrderedAndProject."""
    # li feeds both pair arms, the item counts and the basket total —
    # lineage cut (rule 14); the pre-cut plan re-scanned lineitem 5×
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pair_counts = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    part_counts = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    totals = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    # part_counts is catalog-proportional — no forced broadcast; AQE
    # picks the strategy per scale (only the 1-row totals force)
    return (
        pair_counts.join(
            part_counts.select(
                F.col("l_partkey").alias("part_a"),
                F.col("n_part").alias("n_a"),
            ),
            "part_a",
        )
        .join(
            part_counts.select(
                F.col("l_partkey").alias("part_b"),
                F.col("n_part").alias("n_b"),
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "n_baskets",
            F.round(
                (F.col("n_baskets") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(
            F.col("n_baskets").desc(), F.col("part_a"), F.col("part_b")
        )
        .limit(_BASKET_TOP)
    )


_BASKET_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pc AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_baskets
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2),
parts AS (SELECT l_partkey, count(*) AS n_part FROM li GROUP BY 1),
tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT pc.part_a, pc.part_b, CAST(pc.n_baskets AS BIGINT) AS n_baskets,
       round(CAST(pc.n_baskets * tot.n_orders AS DOUBLE)
             / CAST(pa.n_part * pb.n_part AS DOUBLE), 6) AS lift
FROM pc
JOIN parts pa ON pa.l_partkey = pc.part_a
JOIN parts pb ON pb.l_partkey = pc.part_b
CROSS JOIN tot
ORDER BY n_baskets DESC, part_a, part_b
LIMIT {_BASKET_TOP}
"""


# --- RFM segmentation --------------------------------------------------------

def _customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary terciles →
    27 segments) — the CRM workhorse.  No global NTILE window: each
    dimension's tercile boundaries come from a DOMAIN-GRAIN cumulative
    histogram with the integer rank rule (``cum·3 ≥ k·total``), the
    three tiny boundary tables broadcast back, and every customer
    scores in one pass.  Recency (days) and frequency (small ints)
    have naturally bounded domains; monetary per-customer cent sums
    are near-distinct, so its histogram runs at $100-BAND grain
    (``mon div 10000``) — a bounded domain again, with the tercile
    boundary exact at band resolution.  All comparisons are integer,
    so segment assignment is engine-deterministic."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    mx = orders.agg(F.max("day").alias("mxd"))
    rfm = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff("mxd", "day")).alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("mon"),
        )
        .withColumn("mon_band", F.expr("mon div 10000"))
        # rfm feeds three boundary histograms plus the scoring pass —
        # lineage cut (rule 14), or orders re-scans 8× (measured)
        .localCheckpoint(eager=False)
    )

    def boundaries(col: str):
        grain = rfm.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w_cum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_tot = Window.partitionBy()
        cum = grain.select(
            F.col(col).alias("v"),
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_tot).alias("total"),
        )
        return cum.agg(
            F.min(
                F.when(F.col("cum") * 3 >= F.col("total"), F.col("v"))
            ).alias(f"{col}_t1"),
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("total"), F.col("v"))
            ).alias(f"{col}_t2"),
        )

    def tercile(col: str, invert: bool) -> F.Column:
        # terciles 1..3; recency inverts (smaller days-ago = better)
        raw = (
            F.when(F.col(col) <= F.col(f"{col}_t1"), 1)
            .when(F.col(col) <= F.col(f"{col}_t2"), 2)
            .otherwise(3)
        )
        return (F.lit(4) - raw) if invert else raw

    scored = (
        rfm.crossJoin(F.broadcast(boundaries("rec")))
        .crossJoin(F.broadcast(boundaries("freq")))
        .crossJoin(F.broadcast(boundaries("mon_band")))
        .select(
            F.concat(
                F.lit("R"),
                tercile("rec", invert=True).cast("string"),
                F.lit("F"),
                tercile("freq", invert=False).cast("string"),
                F.lit("M"),
                tercile("mon_band", invert=False).cast("string"),
            ).alias("segment")
        )
    )
    return scored.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_RFM_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders),
mx AS (SELECT max(day) AS mxd FROM o),
rfm AS (
  SELECT o_custkey,
         min(date_diff('day', day, mxd)) AS rec,
         count(*) AS freq,
         sum(cents) // 10000 AS mon_band
  FROM o CROSS JOIN mx GROUP BY 1),
rb AS (
  SELECT min(CASE WHEN cum * 3 >= total THEN v END) AS rec_t1,
         min(CASE WHEN cum * 3 >= 2 * total THEN v END) AS rec_t2
  FROM (SELECT rec AS v,
               sum(count(*)) OVER (ORDER BY rec
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(count(*)) OVER () AS total
        FROM rfm GROUP BY rec)),
fb AS (
  SELECT min(CASE WHEN cum * 3 >= total THEN v END) AS freq_t1,
         min(CASE WHEN cum * 3 >= 2 * total THEN v END) AS freq_t2
  FROM (SELECT freq AS v,
               sum(count(*)) OVER (ORDER BY freq
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(count(*)) OVER () AS total
        FROM rfm GROUP BY freq)),
mb AS (
  SELECT min(CASE WHEN cum * 3 >= total THEN v END) AS mon_band_t1,
         min(CASE WHEN cum * 3 >= 2 * total THEN v END) AS mon_band_t2
  FROM (SELECT mon_band AS v,
               sum(count(*)) OVER (ORDER BY mon_band
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               sum(count(*)) OVER () AS total
        FROM rfm GROUP BY mon_band))
SELECT 'R' || CAST(4 - (CASE WHEN rec <= rec_t1 THEN 1
                             WHEN rec <= rec_t2 THEN 2 ELSE 3 END) AS VARCHAR)
       || 'F' || CAST(CASE WHEN freq <= freq_t1 THEN 1
                           WHEN freq <= freq_t2 THEN 2 ELSE 3 END AS VARCHAR)
       || 'M' || CAST(CASE WHEN mon_band <= mon_band_t1 THEN 1
                           WHEN mon_band <= mon_band_t2 THEN 2 ELSE 3 END AS VARCHAR)
         AS segment,
       CAST(count(*) AS BIGINT) AS n_customers
FROM rfm CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb
GROUP BY 1
"""


# --- per-source quality matrix -----------------------------------------------

def _source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang): document count and mean quality — the
    curation dashboard's headline table, telling you which feeds to
    cap or re-crawl.  The per-doc quality doubles (round-6 composites)
    sum through DECIMAL(38,12) so partial-aggregation order can't
    change the mean; one corpus scan, one (source, lang)-keyed
    exchange."""
    from data_pipeline_bigquery_spark.extensions.text_analysis import (
        quality_score,
    )

    docs = load(spark, sf_dir, "documents")
    q = quality_score(docs, "doc_id", "text").select("doc_id", "quality")
    meta = docs.select("doc_id", "source", "lang")
    return (
        meta.join(q, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum(F.col("quality").cast("decimal(38,12)"))
                    / F.count(F.lit(1))
                ).cast("double"),
                6,
            ).alias("mean_quality"),
        )
    )


_SOURCE_QUALITY_SQL = """
WITH w AS (SELECT doc_id, source, lang, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t,
                  string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS words
           FROM documents),
q AS (SELECT doc_id, source, lang,
             round(
               CAST(len(list_filter(words,
                        x -> list_contains(['the','a','and','of'], x))) AS DOUBLE)
                 / CAST(len(words) AS DOUBLE) * 0.5
               + CAST(length(regexp_replace(t, '[^a-z]', '', 'g')) AS DOUBLE)
                 / CAST(length(t) AS DOUBLE) * 0.5, 6) AS quality
      FROM w)
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(sum(CAST(quality AS DECIMAL(38,12))) / count(*), 6)
            AS DOUBLE) AS mean_quality
FROM q GROUP BY 1, 2
"""


# --- funnel window sensitivity -----------------------------------------------

def _funnel_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion at THREE attribution windows (1d /
    7d / 30d) in ONE pass — the sensitivity sweep that tells you
    whether a reported conversion rate is an artifact of the window
    choice.  Per user: first signup, then first purchase at or after
    it (two min-aggregates on the same user key); the delta feeds
    three conditional counts; rates are integer permille.  No
    per-window rescan — the window parameter is a predicate, not a
    job."""
    ev = load(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    first_after = (
        signup.join(purch, "user_id")
        .filter(F.col("p_ts") >= F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    delta_s = to_epoch_seconds("first_purchase") - to_epoch_seconds(
        "signup_ts"
    )
    joined = signup.join(
        first_after.select("user_id", "first_purchase"), "user_id", "left"
    ).select(
        delta_s.alias("delta_s"),
    )

    def conv(days: int) -> F.Column:
        return F.sum(
            (
                F.col("delta_s").isNotNull()
                & (F.col("delta_s") <= days * 86400)
            ).cast("long")
        )

    return joined.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        conv(1).alias("c1"),
        conv(7).alias("c7"),
        conv(30).alias("c30"),
    ).select(
        "n_signup_users",
        F.expr("c1 * 1000 div n_signup_users").alias("conv_1d_permille"),
        F.expr("c7 * 1000 div n_signup_users").alias("conv_7d_permille"),
        F.expr("c30 * 1000 div n_signup_users").alias("conv_30d_permille"),
    )


_FUNNEL_WINDOW_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY 1),
fa AS (
  SELECT s.user_id, min(e.ts) AS first_purchase
  FROM s JOIN events e ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
  GROUP BY 1),
d AS (
  SELECT epoch(fa.first_purchase) - epoch(s.signup_ts) AS delta_s
  FROM s LEFT JOIN fa USING (user_id))
SELECT CAST(count(*) AS BIGINT) AS n_signup_users,
       CAST(sum(CASE WHEN delta_s IS NOT NULL AND delta_s <= 86400
                THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
         AS conv_1d_permille,
       CAST(sum(CASE WHEN delta_s IS NOT NULL AND delta_s <= 7 * 86400
                THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
         AS conv_7d_permille,
       CAST(sum(CASE WHEN delta_s IS NOT NULL AND delta_s <= 30 * 86400
                THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
         AS conv_30d_permille
FROM d
"""


# --- supplier concentration (HHI) --------------------------------------------

def _supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration —
    the antitrust-style audit that pairs with ``revenue_gini``
    (customers) on the supply side.  ``HHI = Σ shareᵢ²`` computes
    without per-supplier float shares: Σ revᵢ² and (Σ rev)² stay exact
    DECIMAL (cents², well inside DECIMAL(38)), and ONE IEEE division
    scales to the conventional 0–10000 basis points.  One supplier-
    keyed aggregate; the final reduce is rows=suppliers."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit(1.0).cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(18,2)")
            ).alias("rev")
        )
    )
    return rev.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.lit(10000.0)
            * F.sum(
                F.col("rev").cast("decimal(38,4)")
                * F.col("rev").cast("decimal(38,4)")
            ).cast("double")
            / (
                F.sum("rev").cast("double")
                * F.sum("rev").cast("double")
            ),
            6,
        ).alias("hhi_bps"),
    )


_SUPPLIER_HHI_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1.0 AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_suppliers,
       round(10000.0
             * CAST(sum(CAST(rev AS DECIMAL(38,4))
                        * CAST(rev AS DECIMAL(38,4))) AS DOUBLE)
             / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)), 6)
         AS hhi_bps
FROM rev
"""


# --- inter-event burstiness --------------------------------------------------

def _event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness index B = (σ−μ)/(σ+μ) of inter-event gaps per event
    type (−1 = perfectly periodic, 0 = Poisson, →1 = extreme bursts) —
    the stream-characterization metric that says whether arrivals are
    schedulable or bursty.  All statistics derive from EXACT integer
    sums (n, Σd, Σd² over second-grain gaps): σ and μ only become
    doubles in the final fixed expression
    ``(sqrt(n·Σd²−(Σd)²·… ) − …) / (… + …)`` — every step is a
    correctly-rounded IEEE op on identical inputs, so the result is
    bit-deterministic.  Per-type lag window keyed on the type, then a
    type-grain reduce."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            to_epoch_seconds("ts") - to_epoch_seconds(F.lag("ts").over(w))
        ).alias("d"),
    ).filter(F.col("d").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s"),
        F.sum(F.col("d") * F.col("d")).alias("q"),
    )
    # σ/μ = sqrt(n·q − s²) / s  (population σ over mean), so
    # B = (sqrt(n·q − s²) − s) / (sqrt(n·q − s²) + s) — one sqrt of an
    # exact wide integer (n·q and s² overflow int64 under extreme
    # gap/volume combinations → DECIMAL here, HUGEINT in the oracle)
    nq_s2 = (
        F.col("n").cast("decimal(38,0)") * F.col("q")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    )
    r = F.sqrt(nq_s2.cast("double"))
    den = r + F.col("s").cast("double")
    return agg.select(
        "event_type",
        "n",
        # rule 9: a type whose gaps are ALL zero seconds has σ = μ = 0
        # — ANSI throws on the 0/0 where the oracle returns NULL
        # (degenerate-corpus sweep catch)
        F.round(
            (r - F.col("s").cast("double")) / F.when(den != 0.0, den),
            6,
        ).alias("burstiness"),
    )


_BURSTINESS_SQL = """
WITH gaps AS (
  -- floor() each epoch BEFORE subtracting: DuckDB's epoch() keeps
  -- microseconds while the Spark side truncates to whole seconds,
  -- and floor-of-each is what second-grain gap arithmetic means
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(lag(ts) OVER (PARTITION BY event_type
                                            ORDER BY ts, event_id)))
                  AS BIGINT) AS d
  FROM events),
agg AS (
  SELECT event_type, count(*) AS n, sum(d) AS s, sum(d * d) AS q
  FROM gaps WHERE d IS NOT NULL GROUP BY 1)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round((sqrt(CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s
                        AS DOUBLE)) - CAST(s AS DOUBLE))
             / (sqrt(CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s
                          AS DOUBLE)) + CAST(s AS DOUBLE)), 6)
         AS burstiness
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "cumulative_distinct_users": QuerySpec(
        _cumulative_distinct_users, _CUMULATIVE_USERS_SQL
    ),
    "peak_open_orders": QuerySpec(_peak_open_orders, _PEAK_OPEN_SQL),
    "event_pair_affinity": QuerySpec(_event_pair_affinity, _PAIR_AFFINITY_SQL),
    "inverted_index_build": QuerySpec(_inverted_index_build, _INVERTED_INDEX_SQL),
    "keyword_search_bm25lite": QuerySpec(
        _keyword_search_bm25lite, _BM25LITE_SQL
    ),
    "pareto_skyline_customers": QuerySpec(
        _pareto_skyline_customers, _SKYLINE_SQL
    ),
    "nearest_centroid_confusion": QuerySpec(
        _nearest_centroid_confusion, _CENTROID_SQL
    ),
    "hybrid_search_rrf": QuerySpec(_hybrid_search_rrf, _HYBRID_SQL),
    "rolling_active_users": QuerySpec(
        _rolling_active_users, _ROLLING_ACTIVE_SQL
    ),
    "first_touch_attribution": QuerySpec(
        _first_touch_attribution, _FIRST_TOUCH_SQL
    ),
    "entity_resolution_golden": QuerySpec(
        _entity_resolution_golden, _entity_resolution_sql()
    ),
    "graph_triangle_stats": QuerySpec(
        _graph_triangle_stats, _triangle_sql()
    ),
    "pagerank_similarity_graph": QuerySpec(
        _pagerank_similarity, _pagerank_sql()
    ),
    "histogram_quantile_rollup": QuerySpec(
        _histogram_quantile_rollup, _HIST_QUANTILE_SQL
    ),
    "top_session_paths": QuerySpec(_top_session_paths, _SESSION_PATHS_SQL),
    "event_burst_detection": QuerySpec(_event_burst_detection, _BURST_SQL),
    "fk_inference_audit": QuerySpec(
        _fk_inference_audit, _fk_inference_sql()
    ),
    "time_decayed_engagement": QuerySpec(
        _time_decayed_engagement, _DECAY_SQL
    ),
    "revenue_share_of_region": QuerySpec(
        _revenue_share_of_region, _REV_SHARE_SQL
    ),
    "latest_shipments_with_ties": QuerySpec(
        _latest_shipments_with_ties, _LATEST_SHIP_SQL
    ),
    "value_drift_ks": QuerySpec(_value_drift_ks, _KS_SQL),
    "revenue_gini": QuerySpec(_revenue_gini, _GINI_SQL),
    "value_drift_mannwhitney": QuerySpec(
        _value_drift_mannwhitney, _MANNWHITNEY_SQL
    ),
    "lorenz_curve_deciles": QuerySpec(
        _lorenz_curve_deciles, _LORENZ_SQL
    ),
    "cohort_ltv_curve": QuerySpec(_cohort_ltv_curve, _COHORT_LTV_SQL),
    "order_gap_percentiles": QuerySpec(
        _order_gap_percentiles, _ORDER_GAP_SQL
    ),
    "new_vs_returning_revenue": QuerySpec(
        _new_vs_returning_revenue, _NEW_RETURNING_SQL
    ),
    "weekday_profile": QuerySpec(_weekday_profile, _WEEKDAY_SQL),
    "basket_part_pairs": QuerySpec(_basket_part_pairs, _BASKET_SQL),
    "customer_rfm_segments": QuerySpec(
        _customer_rfm_segments, _RFM_SQL
    ),
    "source_quality_matrix": QuerySpec(
        _source_quality_matrix, _SOURCE_QUALITY_SQL
    ),
    "funnel_window_sensitivity": QuerySpec(
        _funnel_window_sensitivity, _FUNNEL_WINDOW_SQL
    ),
    "supplier_hhi": QuerySpec(_supplier_hhi, _SUPPLIER_HHI_SQL),
    "event_burstiness": QuerySpec(_event_burstiness, _BURSTINESS_SQL),
}
