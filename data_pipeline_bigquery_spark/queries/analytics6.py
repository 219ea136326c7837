"""Coverage batch 6 — warehouse utility operators.

Four shapes that round out the engine's day-2 surface: the profiler a
user runs before trusting a new table, the gap-filler behind every
continuous time-series chart, the Gram-matrix reduction that starts
every PCA/whitening pass over an embedding corpus, and the Bloom-filter
semi-join reduction that is the backbone of runtime row pruning.

- ``table_profile``: per-column (rows, nulls, exact distinct, min, max)
  over ``events`` in ONE scan.  The multi-``COUNT(DISTINCT)`` aggregate
  is the textbook profiling trade: Spark plans it as a single pass with
  an Expand (k× row blow-up, k = #columns) feeding one hash aggregate —
  still one scan of the table, and the blow-up is map-side (combined
  before the exchange).  At 100 TB you either accept the k× Expand or
  swap the distinct counts for HLL sketches (``approx_distinct_daily``
  is the sketch twin in this repo); the exact form is what the DuckDB
  oracle can hash-match.  min/max stringify through engine-portable
  formats (DECIMAL casts, explicit date_format) — never raw
  double→string, whose formatting is engine-specific.
- ``gap_fill_interpolate``: daily revenue per order priority with
  missing calendar days filled by LINEAR INTERPOLATION between the
  neighbouring observed days.  Scale shape: the only event-proportional
  exchange is the (priority, day) aggregate; the calendar explode,
  the ignorenulls prev/next windows, and the fill arithmetic all run on
  day-grain rows (bounded by calendar × #priorities, thousands of
  rows).  Fill value is exact: cents stay int64, the interpolation is
  ``prev + floor((next−prev)·(d−prev_d) / (next_d−prev_d))`` with the
  product exact in double (|Δcents|·span < 2^53 by a huge margin) and
  ONE IEEE division — bit-identical on both engines.
- ``embedding_gram_matrix``: the d×d Gram matrix Σ qᵀq over the
  integer-micro-quantised corpus — the input to PCA / whitening /
  covariance drift checks.  Scale shape: a 100 TB vector corpus reduces
  to d(d+1)/2 numbers in one pass with NO shuffle of vector data — each
  Arrow batch contributes a partial Gram via one int64 matmul
  (``mapInPandas``, numpy, vectorised), and only the 2080 (i, j,
  partial) rows exchange for the final sum.  Quantisation reuses the
  repo float policy (float→double exact, ×1e6, floor → identical int64
  on every engine), so the DuckDB oracle — an explicit dim×dim
  self-join over the unnested components, a genuinely independent
  formulation — hash-matches exactly.  int64 bound: |q|≤~1e6·max|x|,
  so a partial sum stays < 2^63 up to ~9e6 rows per Arrow batch and
  the final per-(i,j) sum up to ~9e6·(2^31) rows; beyond that route
  the final sum through DECIMAL(38,0) (the matmul stays int64 because
  batches are bounded).
- ``bloom_semijoin_prune``: build a deterministic Bloom filter over the
  BUILDING-segment customer keys (k=4 md5-slice hashes into a 4096-bit
  / 128×32-bit-word bitmap), probe every distinct ordering customer
  MAP-SIDE (the bitmap is a 128-long array literal in the plan — the
  corpus is never exploded or re-shuffled for the probe), and account
  for the outcome: probes, bloom passes, true matches, false positives,
  and missed (false-negative) count — which the Bloom guarantee pins to
  ZERO, a property the oracle re-derives independently.  This is the
  runtime-filter pattern (Spark's own InSubqueryExec bloom pruning)
  expressed as a first-class operator: at 100 TB the 512-byte bitmap
  rides the broadcast plan and prunes fact rows before the real join.
  The 128-word bitmap is collected to the driver — bounded by the
  filter geometry (128 rows), same contract as the k-means centroid
  pulls (``extensions/similarity.py``).  Hashes are the repo's md5
  hex-slice idiom (``extensions/sampling.py:39``): 3 hex chars per
  slice = 12 bits, ``CAST(('0x'||substr(md5(k),o,3)) AS BIGINT)`` on
  DuckDB ≡ ``conv(substr(md5(k),o,3),16,10)`` on Spark.  Word size is
  32 bits because DuckDB raises on ``1<<63`` (no silent wrap), so
  64-bit masks are not engine-portable.

Reference analog: the reference profiles tables with ad-hoc BigQuery
console SQL and prunes joins by materialising key lists into temp
tables (`/root/reference/pipeline/functions/functions.py:60-90`); these
are the engine-native forms.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec

_DEC = "decimal(18,2)"
_QSCALE = 1_000_000  # float→int micro quantisation (repo float policy)


# --- table_profile ------------------------------------------------------------

# (column, min/max stringifier) — explicit per-type formatting so both
# engines render identical strings (raw double→string is engine-specific)
_PROFILE_COLS = (
    ("event_id", lambda c: c.cast("string")),
    ("ts", lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")),
    ("user_id", lambda c: c.cast("string")),
    ("event_type", lambda c: c),
    ("value", lambda c: c.cast(_DEC).cast("string")),
    ("props", lambda c: c),
)


def _table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan profile of ``events``: per column rows / nulls / exact
    distinct / min / max.  All 6 columns' aggregates live in ONE agg
    (Spark Expand handles the multi-distinct), then a single row
    explodes into the 6-row report — no per-column rescans."""
    ev = load(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, fmt in _PROFILE_COLS:
        c = F.col(name)
        aggs.append(F.count(c).alias(f"nn_{name}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{name}"))
        aggs.append(fmt(F.min(c)).alias(f"mn_{name}"))
        aggs.append(fmt(F.max(c)).alias(f"mx_{name}"))
    one = ev.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{name}")).alias("n_null"),
                F.col(f"nd_{name}").alias("n_distinct"),
                F.col(f"mn_{name}").alias("min_val"),
                F.col(f"mx_{name}").alias("max_val"),
            )
            for name, _ in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def _profile_sql() -> str:
    fmts = {
        "event_id": "CAST({m}(event_id) AS VARCHAR)",
        "ts": "strftime({m}(ts), '%Y-%m-%d %H:%M:%S')",
        "user_id": "CAST({m}(user_id) AS VARCHAR)",
        "event_type": "{m}(event_type)",
        "value": "CAST({m}(CAST(value AS DECIMAL(18,2))) AS VARCHAR)",
        "props": "{m}(props)",
    }
    parts = [
        f"""SELECT '{name}' AS col_name, count(*) AS n_rows,
       count(*) - count({name}) AS n_null,
       count(DISTINCT {name}) AS n_distinct,
       {fmt.format(m='min')} AS min_val,
       {fmt.format(m='max')} AS max_val
FROM events"""
        for name, fmt in fmts.items()
    ]
    return "\nUNION ALL\n".join(parts)


# --- gap_fill_interpolate ------------------------------------------------------

def _gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue-cents per order priority over each priority's full
    calendar span, missing days linearly interpolated between the
    neighbouring observed days.  Exactness: cents are int64 from a
    DECIMAL(18,2) sum; the fill is prev + floor(Δ·gap/span) with the
    product exact in double and one IEEE division.  Endpoints are
    observed by construction (span = [min(day), max(day)]), so prev/
    next always exist on filled rows."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
        F.col("o_totalprice").cast(_DEC).alias("price"),
    )
    obs = o.groupBy("priority", "day").agg(
        (F.sum("price") * 100).cast("long").alias("cents")
    )
    cal = (
        obs.groupBy("priority")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "priority",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    ser = cal.join(obs, ["priority", "day"], "left")
    wp = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("priority")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    ser = ser.select(
        "priority",
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
        F.first("cents", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
    )
    fill = F.col("pv") + F.floor(
        (
            (F.col("nv") - F.col("pv")) * F.datediff("day", "pd")
        ).cast("double")
        / F.datediff("nd", "pd")
    )
    return ser.select(
        "priority",
        "day",
        F.coalesce("cents", fill).alias("cents"),
        F.col("cents").isNull().alias("filled"),
    )


_GAP_FILL_SQL = """
WITH obs AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2),
cal AS (
  SELECT priority,
         CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
  FROM obs GROUP BY priority),
ser AS (
  SELECT c.priority, c.day, o.cents,
         last_value(o.cents IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN o.cents IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER wp AS pd,
         first_value(o.cents IGNORE NULLS) OVER wn AS nv,
         first_value(CASE WHEN o.cents IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER wn AS nd
  FROM cal c LEFT JOIN obs o USING (priority, day)
  WINDOW
    wp AS (PARTITION BY c.priority ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wn AS (PARTITION BY c.priority ORDER BY c.day
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT priority, day,
       COALESCE(cents,
                pv + CAST(floor(CAST((nv - pv) * (day - pd) AS DOUBLE)
                                / (nd - pd)) AS BIGINT)) AS cents,
       cents IS NULL AS filled
FROM ser
"""


# --- embedding_gram_matrix -----------------------------------------------------

GRAM_SCHEMA = "i int, j int, partial long"


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch partial Gram matrices over the integer-micro
    quantised vectors: one int64 matmul per batch, upper triangle only.
    Reusable operator — the registry query sums these to the corpus
    Gram."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(
                [
                    np.floor(np.asarray(v, dtype=np.float64) * _QSCALE)
                    for v in pdf[vec_col]
                ]
            ).astype(np.int64)
            gram = mat.T @ mat
            iu, ju = np.triu_indices(gram.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "partial": gram[iu, ju],
                }
            )

    from data_pipeline_bigquery_spark.extensions.dedup_text import (
        spread_small_input,
    )

    return spread_small_input(df.select(vec_col)).mapInPandas(gen, GRAM_SCHEMA)


def _embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return (
        gram_partials(emb)
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram"))
    )


_GRAM_SQL = f"""
WITH q AS (
  SELECT vec_id, t.dim AS dim, t.qv AS qv
  FROM (SELECT vec_id,
               unnest([{{'dim': i,
                         'qv': CAST(floor(CAST(embedding[i] AS DOUBLE)
                                          * {_QSCALE}) AS BIGINT)}}
                       for i in generate_series(1, len(embedding))]) AS t
        FROM embeddings))
SELECT a.dim AS i, b.dim AS j, CAST(sum(a.qv * b.qv) AS BIGINT) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY 1, 2
"""


# --- bloom_semijoin_prune ------------------------------------------------------

_BLOOM_BITS = 4096  # 12 bits per hash slice (3 hex chars)
_BLOOM_WORDS = _BLOOM_BITS // 32  # 32-bit words: 1<<63 is not portable
_BLOOM_K = 4  # md5 hex-slice offsets 1, 4, 7, 10


def _bloom_hashes(key: F.Column) -> list[F.Column]:
    """k 12-bit hash positions from disjoint md5 hex slices of the key
    (the ``extensions/sampling.py`` portable-hash idiom)."""
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 1 + 3 * t, 3), 16, 10).cast("long")
        for t in range(_BLOOM_K)
    ]


def _bit_mask(h: F.Column) -> F.Column:
    """2^(h mod 32) as int64.  pow(2, k) is exact in double for k ≤ 52
    (and the PySpark shiftleft wrapper only takes a literal shift, so
    an expression-valued shift must go through pow)."""
    return F.pow(F.lit(2.0), (h % 32).cast("double")).cast("long")


def bloom_words(keys: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, word) bitmap rows for a key set — 128 rows, 32 set
    bits max per word."""
    hashes = _bloom_hashes(F.col(key_col))
    return (
        keys.select(F.explode(F.array(*hashes)).alias("h"))
        .select(
            F.shiftright("h", 5).cast("int").alias("word_idx"),
            _bit_mask(F.col("h")).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def _bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prune distinct ordering customers against the BUILDING
    segment and account for the outcome.  The 128-word bitmap is pulled
    to the driver (bounded by filter geometry, like the centroid pulls)
    and embedded as an array literal, so the probe is PURE MAP-SIDE
    expression work — no explode, no extra exchange on the probe
    corpus."""
    cust = load(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    words = bloom_words(build, "c_custkey").collect()  # ≤128 rows by geometry
    bitmap = [0] * _BLOOM_WORDS
    for row in words:
        bitmap[row["word_idx"]] = row["word"]
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])

    probe = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    hit_all = None
    for h in _bloom_hashes(F.col("k")):
        word = F.element_at(arr, F.shiftright(h, 5).cast("int") + 1)
        hit = word.bitwiseAND(_bit_mask(h)) != 0
        hit_all = hit if hit_all is None else (hit_all & hit)
    flagged = probe.select("k", hit_all.alias("bloom_pass")).join(
        F.broadcast(build.select(F.col("c_custkey").alias("k")).withColumn(
            "is_true", F.lit(True)
        )),
        "k",
        "left",
    )
    t = F.coalesce("is_true", F.lit(False))
    return flagged.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_bloom_pass"),
        F.sum(t.cast("long")).alias("n_true_match"),
        F.sum((F.col("bloom_pass") & ~t).cast("long")).alias("n_false_pos"),
        F.sum((t & ~F.col("bloom_pass")).cast("long")).alias("n_missed"),
    )


_BLOOM_SQL = """
WITH build AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
hpos AS (
  SELECT CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + 3 * t, 3))
              AS BIGINT) AS h
  FROM build, unnest([0, 1, 2, 3]) AS u(t)),
words AS (
  SELECT h // 32 AS word_idx, bit_or(CAST(1 AS BIGINT) << CAST(h % 32 AS INT))
         AS word
  FROM hpos GROUP BY 1),
probe AS (SELECT DISTINCT o_custkey AS k FROM orders),
ph AS (
  SELECT k, CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1 + 3 * t, 3))
                 AS BIGINT) AS h
  FROM probe, unnest([0, 1, 2, 3]) AS u(t)),
hits AS (
  SELECT ph.k,
         CASE WHEN (COALESCE(w.word, 0)
                    & (CAST(1 AS BIGINT) << CAST(ph.h % 32 AS INT))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM ph LEFT JOIN words w ON w.word_idx = ph.h // 32),
passk AS (
  SELECT k, min(hit) = 1 AS bloom_pass FROM hits GROUP BY k),
flagged AS (
  SELECT p.k, p.bloom_pass, b.k IS NOT NULL AS is_true
  FROM passk p LEFT JOIN build b ON b.k = p.k)
SELECT count(*) AS n_probe,
       CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
       CAST(sum(CASE WHEN bloom_pass AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST(sum(CASE WHEN is_true AND NOT bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missed
FROM flagged
"""


QUERIES: dict[str, QuerySpec] = {
    "table_profile": QuerySpec(_table_profile, _profile_sql()),
    "gap_fill_interpolate": QuerySpec(_gap_fill_interpolate, _GAP_FILL_SQL),
    "embedding_gram_matrix": QuerySpec(_embedding_gram_matrix, _GRAM_SQL),
    "bloom_semijoin_prune": QuerySpec(_bloom_semijoin_prune, _BLOOM_SQL),
}
