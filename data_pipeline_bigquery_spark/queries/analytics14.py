"""Analytics batch 14 — curation tuning curves and feature
engineering:

- ``dedup_threshold_sweep``: the near-dup TUNING curve — over the
  dedup family's augmented contract corpus, cumulative candidate-pair
  and affected-document counts at Jaccard thresholds 500‰…900‰, from
  the SAME one-exchange gram-bucket machinery as
  ``dedup_ngram_jaccard`` (`_gram_pair_stats` / `_GRAM_STATS_CTES`).
  This is the curve you read before committing to a dedup threshold:
  how many pairs/docs each setting would drop.
- ``learning_curve_quality``: the data-scaling audit — NESTED
  deterministic samples at 10%…100% (md5 bucket < k·100 out of 1000,
  so every smaller sample is a strict subset of every larger one),
  each scored by the C4-style cascade (``curation2.cascade_metrics``
  / ``cascade_reason`` — ONE shared definition); per sample size: doc
  count, pass count, pass-rate permille.  A drifting pass rate across
  nested sizes means the sampler is biased or the corpus mix shifts
  with volume.
- ``rare_category_collapse``: vocabulary capping for categorical
  features — keep the top-{_TOP_K} part brands by frequency (full
  count-desc, name-asc tie-break), collapse the tail into 'OTHER';
  per final category: part count and how many source categories it
  absorbs.  The ranking window runs over the CATEGORY DOMAIN
  (25 brands), not rows — the value-domain discipline.

Reference parity: the reference pipeline (main.py:13-54) has no
curation or feature-engineering layer — scale-out extensions in the
same spirit as batches 5-13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    _gram_pair_stats,
    word_ngrams,
)
from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.curation2 import (
    CASCADE_METRICS_SQL,
    CASCADE_REASON_SQL,
    cascade_docs,
    cascade_metrics,
    cascade_reason,
)
from data_pipeline_bigquery_spark.queries.extensions import (
    _aug_cte,
    _augmented_docs,
    _GRAM_STATS_CTES,
)

_THRESHOLDS = (500, 600, 700, 800, 900)
_TOP_K = 15


# --- dedup_threshold_sweep ---------------------------------------------------


def _dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs/docs flagged per Jaccard threshold (integer permille).

    One gram-bucket exchange produces every pair's exact
    (n_inter, n_a, n_b); the 5-threshold explode runs over the
    candidate-pair rows only, and BOTH output columns come from ONE
    doc-exploded aggregate (n_pairs = rows/2 exactly, since each
    qualifying pair contributes its two ordered endpoints) — no second
    pass over the gram pipeline.  The contract corpus runs uncapped
    like its siblings (`dedup_ngram_jaccard`, `dedup_containment`);
    at lake scale pass ``max_bucket`` to `_gram_pair_stats` to drop
    pathologically hot grams from pair generation.  Thresholds that
    flag nothing still report zeros (the curve has no holes).
    """
    aug = _augmented_docs(spark, sf_dir, max_doc=150)
    stats = _gram_pair_stats(word_ngrams(aug, "doc_id", "t"))
    jac = stats.select(
        "doc_a",
        "doc_b",
        F.expr(
            "CAST(n_inter * 1000 div (n_a + n_b - n_inter) AS BIGINT)"
        ).alias("jac_permille"),
    )
    swept = (
        jac.select(
            "jac_permille",
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
        )
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.lit(t) for t in _THRESHOLDS])
            ).alias("threshold_permille"),
            "jac_permille",
        )
        .filter(F.col("jac_permille") >= F.col("threshold_permille"))
    )
    agg = swept.groupBy("threshold_permille").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_pairs"),
        F.countDistinct("doc_id").alias("n_docs_flagged"),
    )
    grid = spark.createDataFrame(
        [(t,) for t in _THRESHOLDS], "threshold_permille int"
    )
    return (
        grid.join(agg, "threshold_permille", "left")
        .select(
            "threshold_permille",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias(
                "n_pairs"
            ),
            F.coalesce(F.col("n_docs_flagged"), F.lit(0))
            .cast("long")
            .alias("n_docs_flagged"),
        )
        .orderBy("threshold_permille")
    )


_SWEEP_SQL = (
    "WITH "
    + _aug_cte(max_doc=150)
    + _GRAM_STATS_CTES
    + f""",
jac AS (
  SELECT doc_a, doc_b,
         CAST(n_inter * 1000 // (sa.n_grams + sb.n_grams - n_inter)
              AS BIGINT) AS jac_permille
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b),
swept AS (
  SELECT threshold_permille, doc_id, jac_permille
  FROM (SELECT jac_permille, unnest([doc_a, doc_b]) AS doc_id FROM jac)
  CROSS JOIN (
    SELECT unnest({list(_THRESHOLDS)}) AS threshold_permille)
  WHERE jac_permille >= threshold_permille),
agg AS (
  SELECT threshold_permille,
         CAST(count(*) // 2 AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_flagged
  FROM swept GROUP BY 1),
grid AS (SELECT unnest({list(_THRESHOLDS)}) AS threshold_permille)
SELECT grid.threshold_permille,
       CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(n_docs_flagged, 0) AS BIGINT) AS n_docs_flagged
FROM grid LEFT JOIN agg USING (threshold_permille)
ORDER BY threshold_permille
"""
)


# --- learning_curve_quality --------------------------------------------------


def _learning_curve_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade pass rate across nested 10%…100% md5 samples.

    One corpus scan computes per-doc metrics + bucket; the 10-size
    explode multiplies only the tiny metric rows; each aggregate row
    is one (size, count, pass) triple.  Empty sample sizes still
    report zeros (no holes in the curve).
    """
    scored = (
        cascade_metrics(cascade_docs(spark, sf_dir))
        .withColumn("bucket", hash_bucket(F.col("doc_id"), 1000))
        .select(
            "bucket",
            (cascade_reason() == "pass").cast("int").alias("passed"),
        )
    )
    swept = scored.select(
        "bucket",
        "passed",
        F.explode(
            F.array(*[F.lit(k * 100) for k in range(1, 11)])
        ).alias("sample_permille"),
    ).filter(F.col("bucket") < F.col("sample_permille"))
    agg = swept.groupBy("sample_permille").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("passed").cast("long").alias("n_pass"),
    )
    grid = spark.createDataFrame(
        [(k * 100,) for k in range(1, 11)], "sample_permille int"
    )
    return (
        grid.join(agg, "sample_permille", "left")
        .select(
            "sample_permille",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias(
                "n_docs"
            ),
            F.coalesce(F.col("n_pass"), F.lit(0)).cast("long").alias(
                "n_pass"
            ),
        )
        .select(
            "sample_permille",
            "n_docs",
            "n_pass",
            F.expr(
                "CAST(n_pass * 1000 div nullif(n_docs, 0) AS BIGINT)"
            ).alias("pass_permille"),
        )
        .orderBy("sample_permille")
    )


_LEARNING_CURVE_SQL = f"""
WITH m AS ({CASCADE_METRICS_SQL}),
scored AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
              AS BIGINT) % 1000 AS bucket,
         CASE WHEN ({CASCADE_REASON_SQL}) = 'pass' THEN 1 ELSE 0 END
           AS passed
  FROM m),
swept AS (
  SELECT bucket, passed, sample_permille
  FROM scored CROSS JOIN (
    SELECT unnest({[k * 100 for k in range(1, 11)]}) AS sample_permille)
  WHERE bucket < sample_permille),
agg AS (
  SELECT sample_permille, count(*) AS n_docs,
         CAST(sum(passed) AS BIGINT) AS n_pass
  FROM swept GROUP BY 1),
grid AS (
  SELECT unnest({[k * 100 for k in range(1, 11)]}) AS sample_permille)
SELECT grid.sample_permille,
       CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(n_pass, 0) AS BIGINT) AS n_pass,
       CAST(coalesce(n_pass, 0) * 1000 // nullif(coalesce(n_docs, 0), 0)
            AS BIGINT) AS pass_permille
FROM grid LEFT JOIN agg USING (sample_permille)
ORDER BY sample_permille
"""


# --- rare_category_collapse --------------------------------------------------


def _rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K (15) brands kept, tail collapsed to 'OTHER'."""
    counts = (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("p_brand"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rk") <= _TOP_K, F.col("p_brand"))
            .otherwise(F.lit("OTHER"))
            .alias("category"),
            "n",
        )
        .groupBy("category")
        .agg(
            F.sum("n").cast("long").alias("n_parts"),
            F.count(F.lit(1)).alias("n_source_categories"),
        )
        .orderBy("category")
    )


_COLLAPSE_SQL = f"""
WITH counts AS (
  SELECT p_brand, count(*) AS n FROM part GROUP BY 1),
ranked AS (
  SELECT p_brand, n,
         row_number() OVER (ORDER BY n DESC, p_brand) AS rk
  FROM counts)
SELECT CASE WHEN rk <= {_TOP_K} THEN p_brand ELSE 'OTHER' END AS category,
       CAST(sum(n) AS BIGINT) AS n_parts,
       count(*) AS n_source_categories
FROM ranked GROUP BY 1 ORDER BY category
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_threshold_sweep": QuerySpec(
        _dedup_threshold_sweep, _SWEEP_SQL
    ),
    "learning_curve_quality": QuerySpec(
        _learning_curve_quality, _LEARNING_CURVE_SQL
    ),
    "rare_category_collapse": QuerySpec(
        _rare_category_collapse, _COLLAPSE_SQL
    ),
}
