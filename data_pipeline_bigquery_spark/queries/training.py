"""Training-data curation queries: deterministic splits, stratified
sampling, fixed-order shuffle, benchmark decontamination.

These are the corpus-preparation ops a pretraining pipeline runs after
dedup/quality filtering (see ``extensions/sampling.py`` for the scale
rationale).  All randomness is md5-derived, so every query here has an
exact DuckDB oracle.

Reference parity: llgx10/data_pipeline_bigquery has no sampling surface
(SURVEY §2 end note) — this module is part of the scale-out extension
set the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import ascii_lower
from data_pipeline_bigquery_spark.extensions.dedup_text import word_ngrams
from data_pipeline_bigquery_spark.extensions.sampling import (
    assign_split,
    contamination_report,
    deterministic_shuffle,
    stratified_sample,
)
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.extensions import AUG_ID_SHIFT

# DuckDB twin of sampling.hash_bucket — digit-for-digit the same md5 arithmetic.
_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100"


# --- train/valid/test split --------------------------------------------------

def _train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id")  # 80/10/10
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_SPLIT_SQL = f"""
WITH b AS (SELECT n_chars, {_BUCKET} AS bucket FROM documents),
s AS (SELECT CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'valid'
                  ELSE 'test' END AS split, n_chars FROM b)
SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
"""


# --- stratified (per-language) sampling --------------------------------------

_RATES = {"en": 30, "de": 75}  # downsample high-resource langs, keep the rest


def _stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", _RATES)
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


_STRATIFIED_SQL = f"""
WITH b AS (SELECT lang, {_BUCKET} AS bucket FROM documents)
SELECT lang, count(*) AS n_kept
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 75 ELSE 100 END
GROUP BY lang
"""


# --- deterministic global shuffle --------------------------------------------

def _global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 50 positions of the fixed shuffled order.

    The top-k itself is orderBy+limit (TakeOrderedAndProject — per-
    partition heaps, no global sort materialized); the row_number
    window then runs over just those 50 rows, so the single-partition
    window is on a constant-size input regardless of corpus size.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    top = deterministic_shuffle(docs, "doc_id").limit(50)
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.orderBy(h, F.col("doc_id"))
    return top.select(F.row_number().over(w).alias("position"), "doc_id")


_SHUFFLE_SQL = """
SELECT position, doc_id FROM (
  SELECT doc_id,
         row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS position
  FROM documents)
WHERE position <= 50
"""


# --- benchmark contamination -------------------------------------------------

def _contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing >=30% of their word 3-grams with a benchmark set.

    Benchmark = every 97th doc; contamination is planted by re-inserting
    each benchmark text (first 4 chars dropped, id+1M) into the corpus,
    mirroring how eval data actually leaks into crawls — near-verbatim,
    not byte-identical.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", ascii_lower("text").alias("t"))
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0).unionByName(
        bench.select(
            (F.col("doc_id") + AUG_ID_SHIFT).alias("doc_id"),
            F.expr("substring(t, 5)").alias("t"),
        )
    )
    return contamination_report(
        word_ngrams(corpus, "doc_id", "t"), word_ngrams(bench, "doc_id", "t"), min_rate=0.3
    )


_CONTAMINATION_SQL = f"""
WITH docs AS (SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents WHERE doc_id < 400),
bench AS (SELECT doc_id, t FROM docs WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, t FROM docs WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + {AUG_ID_SHIFT}, substr(t, 5) FROM bench),
bw AS (SELECT doc_id, string_split(t, ' ') AS words FROM bench),
cw AS (SELECT doc_id, string_split(t, ' ') AS words FROM corpus),
bg AS (SELECT DISTINCT array_to_string(words[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS gram
       FROM bw, UNNEST(range(1, greatest(len(words) - 2, 1) + 1)) AS u(i)),
cg AS (SELECT DISTINCT doc_id,
              array_to_string(words[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS gram
       FROM cw, UNNEST(range(1, greatest(len(words) - 2, 1) + 1)) AS u(i)),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id),
shared AS (SELECT cg.doc_id, count(*) AS n_shared FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id)
SELECT s.doc_id, n_shared, n_grams,
       round(CAST(n_shared AS DOUBLE) / n_grams, 6) AS contamination_rate
FROM shared s JOIN sizes USING (doc_id)
WHERE round(CAST(n_shared AS DOUBLE) / n_grams, 6) >= 0.3
"""


def _mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture resampling (`extensions/sampling.py::
    mixture_resample`): the data-recipe op — per-source weights set the
    output proportions, the most over-demanded source caps the feasible
    total, membership is md5-bucket deterministic.  Weights here derive
    from the source name (src0..src19 → parts 1..4 cycling) so the
    oracle rebuilds the recipe exactly; production passes a real
    ``(source, w)`` recipe table."""
    from data_pipeline_bigquery_spark.extensions.sampling import mixture_resample

    docs = load(spark, sf_dir, "documents")
    weights = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (1 + F.substring("source", 4, 10).cast("int") % 4).alias("w"),
        )
    )
    out = mixture_resample(docs, weights)
    return out.select("doc_id", "source")


_MIXTURE_SQL = """
WITH w AS (
  SELECT source, 1 + CAST(substr(source, 4) AS INT) % 4 AS w
  FROM (SELECT DISTINCT source FROM documents)),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT min(CAST(n AS DOUBLE) / CAST(w AS DOUBLE)) AS t
      FROM c JOIN w USING (source)),
r AS (
  SELECT source,
         least(CAST(1000 AS BIGINT),
               CAST(floor(1000.0 * t.t * CAST(w.w AS DOUBLE)
                          / CAST(c.n AS DOUBLE)) AS BIGINT)) AS rate
  FROM c JOIN w USING (source) CROSS JOIN t)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
      < r.rate
"""


def _token_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson sampling with inclusion probability
    proportional to document LENGTH — the token-budget sampler: when a
    budget is counted in tokens, uniform doc sampling over-represents
    short docs; weighting by token count makes every TOKEN equally
    likely to enter the sample.

    Membership is the md5-permille idiom against a per-doc rate
    ``floor(1000·n_tokens / max_tokens)`` (the longest doc is always
    kept, integer `div` both engines).  The max is a broadcast 1-row
    scalar; one corpus scan, map-side filter — same scale shape as
    `mixture_resample`."""
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    mx = docs.agg(F.max("n_tokens").alias("mx"))
    return (
        docs.crossJoin(F.broadcast(mx))
        .filter(
            hash_bucket(F.col("doc_id"), 1000)
            < F.expr("cast(n_tokens as bigint) * 1000 div mx")
        )
        .select("doc_id", "n_tokens")
    )


_TOKEN_WEIGHTED_SQL = """
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
m AS (SELECT max(n_tokens) AS mx FROM d)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens
FROM d CROSS JOIN m
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000
      < CAST(n_tokens AS BIGINT) * 1000 // mx
"""


QUERIES: dict[str, QuerySpec] = {
    "source_mixture_resample": QuerySpec(_mixture_resample, _MIXTURE_SQL),
    "token_weighted_sample": QuerySpec(_token_weighted_sample, _TOKEN_WEIGHTED_SQL),
    "train_test_split": QuerySpec(_train_test_split, _SPLIT_SQL),
    "stratified_sample_lang": QuerySpec(_stratified_sample, _STRATIFIED_SQL),
    "global_shuffle_order": QuerySpec(_global_shuffle, _SHUFFLE_SQL),
    "benchmark_contamination": QuerySpec(_contamination, _CONTAMINATION_SQL),
}
