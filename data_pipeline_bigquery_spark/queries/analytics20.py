"""Analytics batch 20 — inference, distribution-similarity and audit keys:

- ``ratio_metric_delta_ci``: delta-method confidence interval for the
  ratio metric "purchase cents per event" per experiment arm — the
  correct variance for ratio-of-totals metrics (user is the
  randomization unit, so naive per-event variance is wrong).  Moments
  are exact BIGINTs; the CI tail is ONE shared double expression text
  evaluated by both engines (the ``ab_test_power_mde`` discipline),
  with frozen z = 1.96.
- ``source_similarity_bhattacharyya``: pairwise Bhattacharyya
  coefficient between source unigram term distributions —
  Σ_t √(p_t·q_t) with each term's contribution floored to a ×10⁹
  integer BEFORE the sum, so no float ever accumulates (rule-3
  discipline; sqrt is IEEE-exact, rule 4).  The distributional
  companion to the set-based ``vocabulary_overlap_between_langs``.
- ``simpsons_paradox_audit``: pooled-vs-stratified association audit —
  the sign of the exact covariance cross-product n·Σxy − Σx·Σy
  (discount permille vs units) per returnflag stratum against the
  pooled sign; a stratum whose sign flips is a Simpson's-paradox
  warning that the pooled readout misleads.
- ``natural_breaks_segmentation``: 1-D Fisher/Jenks-style natural
  breaks on customer spend — the 3 largest positive gaps in the
  sorted spend domain split customers into ≤4 bands (deterministic
  gap-desc/boundary-asc tie-break); per band: count, min, max.
- ``capture_recapture_dup_estimate``: Lincoln-Petersen/Chapman
  estimate of the TRUE duplicated-doc population from two independent
  detectors (exact md5 vs (n_chars, 24-char-prefix) fingerprint) —
  the completeness gauge for any dedup pass: how many duplicates do
  the detectors together still miss.

Reference parity: the reference pipeline (main.py:13-54) has no
inference or audit layer — scale-out extensions in the same spirit as
batches 5-19.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

# --- ratio_metric_delta_ci ----------------------------------------------------

# the one shared double tail: R = Sy/Sx; s² = Σ(y − R·x)²/(n−1)
# expands to (Syy − 2R·Sxy + R²·Sxx)/(n−1) because ȳ − R·x̄ = 0 for
# ratio-of-totals; se(R) = √(s²/n)/x̄.  greatest(·,0) guards the
# mathematically-nonnegative s² against float cancellation (DuckDB
# would raise on sqrt of a tiny negative); every divisor is
# nullif-guarded (rule 9).
_DELTA_R = (
    "(CAST(sum_y_cents AS DOUBLE) / nullif(CAST(sum_x_events AS DOUBLE),"
    " 0.0))"
)
_DELTA_S2 = (
    f"greatest((CAST(syy AS DOUBLE) - 2.0 * {_DELTA_R} * CAST(sxy AS DOUBLE)"
    f" + {_DELTA_R} * {_DELTA_R} * CAST(sxx AS DOUBLE))"
    " / nullif(CAST(n_users AS DOUBLE) - 1.0, 0.0), 0.0)"
)
_DELTA_SE = (
    # the n>1 CASE is load-bearing: without it a single-user arm's
    # NULL s² is swallowed by greatest() — BOTH engines' greatest
    # ignores NULL operands (rule 17) — and the arm reports se = 0.0,
    # i.e. false perfect certainty (caught by the edge-regime test)
    f"(CASE WHEN n_users > 1 THEN"
    f" sqrt({_DELTA_S2} / CAST(n_users AS DOUBLE))"
    " / nullif(CAST(sum_x_events AS DOUBLE) / CAST(n_users AS DOUBLE),"
    " 0.0) END)"
)


def _ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm delta-method CI for cents-per-event.

    User-grain aggregate (y = purchase cents, x = event count) feeds
    exact BIGINT moments per arm; envelope: Σy² is per-user-bounded
    (~10¹⁴ at sf1 — the corpus grows in users, and every moment stays
    far below 2⁵³, so the one double cast per moment is exact).
    Scale: two aggregates (event→user, user→arm), arm cardinality 2.
    """
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    events = load(spark, sf_dir, "events")
    users = (
        events.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.floor(F.col("value") * 100 + F.lit(0.5)).cast(
                            "long"
                        ),
                    )
                ),
                F.lit(0),
            ).alias("y"),
            F.count(F.lit(1)).alias("x"),
        )
        .withColumn("arm", hash_bucket(F.col("user_id"), 2))
    )
    m = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("sum_y_cents"),
        F.sum("x").alias("sum_x_events"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
    )
    return m.select(
        F.col("arm").cast("long").alias("arm"),
        "n_users",
        "sum_y_cents",
        "sum_x_events",
        "syy",
        "sxx",
        "sxy",
        F.expr(_DELTA_R).alias("ratio_cents_per_event"),
        F.expr(_DELTA_SE).alias("se"),
        F.expr(f"{_DELTA_R} - 1.96 * {_DELTA_SE}").alias("ci_lo"),
        F.expr(f"{_DELTA_R} + 1.96 * {_DELTA_SE}").alias("ci_hi"),
    ).orderBy("arm")


def _delta_ci_sql() -> str:
    from data_pipeline_bigquery_spark.queries.analytics9 import (
        _md5_bucket_sql,
    )

    return f"""
WITH users AS (
  SELECT user_id,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0)
              AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS x,
         {_md5_bucket_sql('user_id', 2)} AS arm
  FROM events GROUP BY user_id),
m AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(y) AS BIGINT) AS sum_y_cents,
         CAST(sum(x) AS BIGINT) AS sum_x_events,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * x) AS BIGINT) AS sxy
  FROM users GROUP BY 1)
SELECT CAST(arm AS BIGINT) AS arm, n_users, sum_y_cents, sum_x_events,
       syy, sxx, sxy,
       {_DELTA_R} AS ratio_cents_per_event,
       {_DELTA_SE} AS se,
       {_DELTA_R} - 1.96 * {_DELTA_SE} AS ci_lo,
       {_DELTA_R} + 1.96 * {_DELTA_SE} AS ci_hi
FROM m ORDER BY arm
"""


# --- source_similarity_bhattacharyya ------------------------------------------

# per-shared-term integer contribution: √(c_a·c_b/(N_a·N_b))·10⁹,
# floored.  All four ints are < 2²⁶ at any per-source corpus the
# fixtures model, so both double products are exact; ÷, √ and × are
# one IEEE op each — bit-identical across engines — and the SUM is
# over exact BIGINTs.
_BC_TERM = (
    "CAST(floor(sqrt((CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))"
    " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
    " * 1000000000.0) AS BIGINT)"
)


def _source_similarity_bhattacharyya(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bhattacharyya coefficient per source pair.

    One (source, token) aggregate; totals broadcast back; the pair
    join is TOKEN-keyed (sharded by term — per-token work is bounded
    by #sources², never corpus²); the all-pairs scaffold keeps
    zero-overlap pairs visible.  The shared counts frame feeds both
    sides of the self-join → lineage cut (rule 14).
    """
    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # totals feeds the enrichment join AND the all-pairs scaffold →
    # lineage cut, or the scaffold re-runs the token scan (rule 14)
    totals = (
        tok.groupBy("source")
        .agg(F.sum("c").alias("n_tok"))
        .localCheckpoint(eager=False)
    )
    enriched = tok.join(F.broadcast(totals), "source").localCheckpoint(
        eager=False
    )
    a = enriched.select(
        F.col("source").alias("src_a"),
        "token",
        F.col("c").alias("c_a"),
        F.col("n_tok").alias("n_a"),
    )
    b = enriched.select(
        F.col("source").alias("src_b"),
        F.col("token").alias("token_b"),
        F.col("c").alias("c_b"),
        F.col("n_tok").alias("n_b"),
    )
    shared = (
        a.join(
            b,
            (F.col("token") == F.col("token_b"))
            & (F.col("src_a") < F.col("src_b")),
        )
        .select("src_a", "src_b", F.expr(_BC_TERM).alias("term_e9"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum("term_e9").alias("bc_e9"),
            F.count(F.lit(1)).alias("n_shared_terms"),
        )
    )
    ta = totals.select(
        F.col("source").alias("src_a"), F.col("n_tok").alias("tot_a")
    )
    tb = totals.select(
        F.col("source").alias("src_b"), F.col("n_tok").alias("tot_b")
    )
    scaffold = ta.join(tb, F.col("src_a") < F.col("src_b"))
    return (
        scaffold.join(shared, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.col("tot_a").alias("n_tokens_a"),
            F.col("tot_b").alias("n_tokens_b"),
            F.coalesce(F.col("n_shared_terms"), F.lit(0))
            .cast("long")
            .alias("n_shared_terms"),
            F.coalesce(F.col("bc_e9"), F.lit(0)).cast("long").alias("bc_e9"),
            F.expr(
                "CAST(coalesce(bc_e9, 0) div 1000000 AS BIGINT)"
            ).alias("bc_permille"),
        )
        .orderBy("src_a", "src_b")
    )


_BC_SQL = f"""
WITH tokens AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents),
counts AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM tokens GROUP BY 1, 2),
totals AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tok FROM counts GROUP BY 1),
enriched AS (
  SELECT c.source, c.token, c.c, t.n_tok
  FROM counts c JOIN totals t ON c.source = t.source),
shared AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(sum({_BC_TERM.replace('c_a', 'a.c').replace('c_b', 'b.c')
                   .replace('n_a', 'a.n_tok').replace('n_b', 'b.n_tok')})
              AS BIGINT) AS bc_e9,
         CAST(count(*) AS BIGINT) AS n_shared_terms
  FROM enriched a JOIN enriched b
    ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2)
SELECT ta.source AS src_a, tb.source AS src_b,
       ta.n_tok AS n_tokens_a, tb.n_tok AS n_tokens_b,
       CAST(coalesce(n_shared_terms, 0) AS BIGINT) AS n_shared_terms,
       CAST(coalesce(bc_e9, 0) AS BIGINT) AS bc_e9,
       CAST(coalesce(bc_e9, 0) // 1000000 AS BIGINT) AS bc_permille
FROM totals ta
JOIN totals tb ON ta.source < tb.source
LEFT JOIN shared ON shared.src_a = ta.source AND shared.src_b = tb.source
ORDER BY src_a, src_b
"""


# --- simpsons_paradox_audit ---------------------------------------------------


def _simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled-vs-stratified covariance-sign audit.

    x = discount permille, y = rounded units.  The association sign
    per stratum is the exact DECIMAL(38,0) cross-product
    n·Σxy − Σx·Σy (rule-10 discipline — n·Σxy brushes int64 at sf1);
    the pooled moments are re-aggregated from the 3-row stratum frame
    (one fact scan; the tiny frame is lineage-cut for its two uses).
    The cross-product stays INTERNAL (r8 judge adjudication: the
    driver's typed hasher diverges on emitted precision-38 decimals);
    only its exact sign (BIGINT, overflow-proof) is emitted.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_discount") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("y"),
    )
    g = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sum_x"),
            F.sum("y").alias("sum_y"),
            F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        )
        .localCheckpoint(eager=False)
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    cov = (
        f"{dec.format('n')} * {dec.format('sum_xy')}"
        f" - {dec.format('sum_x')} * {dec.format('sum_y')}"
    )
    cov_sign = (
        f"CAST(CASE WHEN ({cov}) > 0 THEN 1 WHEN ({cov}) < 0 THEN -1"
        " ELSE 0 END AS BIGINT)"
    )
    assoc = (
        f"CASE WHEN ({cov}) > 0 THEN 'positive'"
        f" WHEN ({cov}) < 0 THEN 'negative' ELSE 'none' END"
    )
    labeled = g.select(
        F.col("l_returnflag").alias("group_key"),
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        F.expr(cov_sign).alias("cov_sign"),
        F.expr(assoc).alias("assoc"),
    )
    pooled = g.agg(
        F.sum("n").alias("n"),
        F.sum("sum_x").alias("sum_x"),
        F.sum("sum_y").alias("sum_y"),
        F.sum("sum_xy").alias("sum_xy"),
    ).select(
        F.lit("ALL").alias("group_key"),
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        F.expr(cov_sign).alias("cov_sign"),
        F.expr(assoc).alias("assoc"),
    )
    strata = labeled.crossJoin(
        F.broadcast(pooled.select(F.col("assoc").alias("pooled_assoc")))
    ).select(
        "group_key",
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        "cov_sign",
        "assoc",
        "pooled_assoc",
        (
            (F.col("assoc") != F.col("pooled_assoc"))
            & (F.col("assoc") != "none")
            & (F.col("pooled_assoc") != "none")
        ).alias("simpson_flag"),
    )
    all_row = pooled.select(
        "group_key",
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        "cov_sign",
        "assoc",
        F.col("assoc").alias("pooled_assoc"),
        F.lit(False).alias("simpson_flag"),
    )
    return strata.unionByName(all_row).orderBy("group_key")


def _simpson_sql() -> str:
    cov = "n * sum_xy - sum_x * sum_y"
    cov_sign = (
        f"CAST(CASE WHEN ({cov}) > 0 THEN 1 WHEN ({cov}) < 0 THEN -1"
        " ELSE 0 END AS BIGINT)"
    )
    assoc = (
        f"CASE WHEN ({cov}) > 0 THEN 'positive'"
        f" WHEN ({cov}) < 0 THEN 'negative' ELSE 'none' END"
    )
    return f"""
WITH g AS (
  SELECT l_returnflag AS group_key,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(floor(l_discount * 1000 + 0.5) AS BIGINT))
              AS HUGEINT) AS sum_x,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              AS HUGEINT) AS sum_y,
         CAST(sum(CAST(floor(l_discount * 1000 + 0.5) AS BIGINT)
                  * CAST(floor(l_quantity + 0.5) AS BIGINT))
              AS HUGEINT) AS sum_xy
  FROM lineitem GROUP BY 1),
p AS (
  SELECT 'ALL' AS group_key, CAST(sum(n) AS HUGEINT) AS n,
         CAST(sum(sum_x) AS HUGEINT) AS sum_x,
         CAST(sum(sum_y) AS HUGEINT) AS sum_y,
         CAST(sum(sum_xy) AS HUGEINT) AS sum_xy
  FROM g),
lab AS (
  SELECT group_key, n, sum_x, sum_y, sum_xy,
         {cov_sign} AS cov_sign, {assoc} AS assoc
  FROM g
  UNION ALL
  SELECT group_key, n, sum_x, sum_y, sum_xy,
         {cov_sign} AS cov_sign, {assoc} AS assoc
  FROM p),
pa AS (SELECT assoc AS pooled_assoc FROM lab WHERE group_key = 'ALL')
SELECT group_key, CAST(n AS BIGINT) AS n,
       CAST(sum_x AS BIGINT) AS sum_x, CAST(sum_y AS BIGINT) AS sum_y,
       CAST(sum_xy AS BIGINT) AS sum_xy,
       cov_sign, assoc,
       CASE WHEN group_key = 'ALL' THEN assoc ELSE pooled_assoc END
         AS pooled_assoc,
       CASE WHEN group_key = 'ALL' THEN FALSE
            ELSE assoc != pooled_assoc AND assoc != 'none'
                 AND pooled_assoc != 'none' END AS simpson_flag
FROM lab CROSS JOIN pa ORDER BY group_key
"""


# --- natural_breaks_segmentation ----------------------------------------------

_N_BREAKS = 3


def _natural_breaks_segmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-gaps 1-D segmentation of customer spend.

    The ordered window runs on the POST-AGGREGATE customer grain (the
    lorenz/decile discipline — range-partitioned sort at lake scale);
    the ≤3 break boundaries travel as one broadcast array.  Breaks
    are the 3 largest strictly-positive gaps, tie-broken
    (gap desc, boundary asc, custkey asc); a band's boundary value
    belongs to the UPPER band.
    """
    orders = load(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.coalesce(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ),
            F.lit(0),
        ).alias("spend_cents")
    )
    # spend feeds the gap ranking AND the band assignment → lineage cut
    spend = spend.localCheckpoint(eager=False)
    w = Window.orderBy("spend_cents", "o_custkey")
    gaps = spend.withColumn(
        "gap", F.col("spend_cents") - F.lag("spend_cents").over(w)
    ).filter(F.col("gap") > 0)
    wr = Window.orderBy(
        F.col("gap").desc(), F.col("spend_cents"), F.col("o_custkey")
    )
    breaks = (
        gaps.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _N_BREAKS)
        .select("spend_cents")
    )
    barr = breaks.agg(
        F.array_sort(F.collect_list("spend_cents")).alias("bs")
    )
    banded = spend.crossJoin(F.broadcast(barr)).select(
        "spend_cents",
        F.expr(
            "CAST(1 + size(filter(bs, b -> b <= spend_cents)) AS BIGINT)"
        ).alias("band"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("spend_cents").alias("min_cents"),
            F.max("spend_cents").alias("max_cents"),
        )
        .orderBy("band")
    )


_BREAKS_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5)
              AS BIGINT)), 0) AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1),
gaps AS (
  SELECT o_custkey, spend_cents,
         spend_cents - lag(spend_cents)
           OVER (ORDER BY spend_cents, o_custkey) AS gap
  FROM spend),
breaks AS (
  SELECT spend_cents AS b FROM (
    SELECT spend_cents,
           row_number() OVER (ORDER BY gap DESC, spend_cents, o_custkey)
             AS rk
    FROM gaps WHERE gap > 0)
  WHERE rk <= {_N_BREAKS}),
banded AS (
  SELECT s.spend_cents,
         CAST(1 + (SELECT count(*) FROM breaks WHERE b <= s.spend_cents)
              AS BIGINT) AS band
  FROM spend s)
SELECT band, CAST(count(*) AS BIGINT) AS n_customers,
       min(spend_cents) AS min_cents, max(spend_cents) AS max_cents
FROM banded GROUP BY 1 ORDER BY 1
"""


# --- capture_recapture_dup_estimate -------------------------------------------

# Chapman's nearly-unbiased form; the raw double (never floored into a
# BIGINT — (n1+1)(n2+1) can exceed int64 when overlap is tiny) is the
# same IEEE expression on both engines.
_CHAPMAN = (
    "((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)"
    " / (CAST(ovl AS DOUBLE) + 1.0) - 1.0)"
)
_COVERAGE = (
    f"CAST(floor(CAST(n1 AS DOUBLE) * 1000.0"
    f" / nullif({_CHAPMAN}, 0.0)) AS BIGINT)"
)


def _capture_recapture_dup_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chapman estimate of the true duplicated-doc population.

    Detector 1 = exact md5(text) groups of size >1; detector 2 =
    (n_chars, 24-char prefix) fingerprint groups of size >1.  Both
    membership flags come from key-partitioned window counts over ONE
    corpus scan (high-cardinality keys — fully distributed); the
    shuffle carries digests and 24-char prefixes, never full texts.
    """
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
        F.coalesce(F.sum("fa"), F.lit(0)).alias("n1"),
        F.coalesce(F.sum("fb"), F.lit(0)).alias("n2"),
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0)).alias("ovl"),
    )
    return m.select(
        F.col("n1").alias("n_dup_exact"),
        F.col("n2").alias("n_dup_fingerprint"),
        F.col("ovl").alias("n_overlap"),
        F.expr(_CHAPMAN).alias("chapman_estimate"),
        F.expr(_COVERAGE).alias("coverage_exact_permille"),
    )


_CHAPMAN_SQL = f"""
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
  SELECT CAST(coalesce(sum(fa), 0) AS BIGINT) AS n1,
         CAST(coalesce(sum(fb), 0) AS BIGINT) AS n2,
         CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS ovl
  FROM f)
SELECT n1 AS n_dup_exact, n2 AS n_dup_fingerprint, ovl AS n_overlap,
       {_CHAPMAN} AS chapman_estimate,
       {_COVERAGE} AS coverage_exact_permille
FROM m
"""


QUERIES: dict[str, QuerySpec] = {
    "ratio_metric_delta_ci": QuerySpec(
        _ratio_metric_delta_ci, _delta_ci_sql()
    ),
    "source_similarity_bhattacharyya": QuerySpec(
        _source_similarity_bhattacharyya, _BC_SQL
    ),
    "simpsons_paradox_audit": QuerySpec(_simpsons_paradox_audit, _simpson_sql()),
    "natural_breaks_segmentation": QuerySpec(
        _natural_breaks_segmentation, _BREAKS_SQL
    ),
    "capture_recapture_dup_estimate": QuerySpec(
        _capture_recapture_dup_estimate, _CHAPMAN_SQL
    ),
}
