"""Curation queries (PII, repetition, source caps, packing) with exact
DuckDB oracles — see ``extensions/curation.py`` for the operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.text import ascii_lower
from data_pipeline_bigquery_spark.extensions.curation import (
    cap_per_group,
    pack_sequences,
    redact_pii,
    repetition_stats,
)
from data_pipeline_bigquery_spark.queries import QuerySpec


# --- PII redaction -----------------------------------------------------------

def _pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII is planted (fixture texts are clean): every 7th doc gains an
    email, every 11th a phone number — both derived from doc_id, so the
    oracle plants byte-identical strings."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" call +1 555-000-"), F.col("doc_id")),
            ).otherwise(F.lit("")),
        ),
    )
    return redact_pii(docs, "doc_id", "text")


_PII_SQL = """
WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1 555-000-' || doc_id ELSE '' END AS text
  FROM documents),
t AS (SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS lt FROM planted)
SELECT doc_id,
       CAST(len(regexp_extract_all(lt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(lt, '\\+[0-9][0-9()\\- ]{7,}[0-9]')) AS BIGINT) AS n_phones,
       md5(regexp_replace(
             regexp_replace(lt, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<email>', 'g'),
             '\\+[0-9][0-9()\\- ]{7,}[0-9]', '<phone>', 'g')) AS redacted_md5
FROM t
"""


# --- repetition (duplicate 2-gram fraction) ----------------------------------

def _repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition is planted: every 13th doc has its text doubled, so
    its 2-gram multiset is (almost) exactly duplicated."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" "), F.col("text"))
        ).otherwise(F.col("text")),
    )
    return repetition_stats(docs, "doc_id", "text", n=2).filter(
        F.col("dup_fraction") >= 0.4
    )


_REPETITION_SQL = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN text || ' ' || text ELSE text END AS text
  FROM documents WHERE text IS NOT NULL),
w AS (SELECT doc_id, string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ') AS words FROM planted),
grams AS (
  SELECT doc_id,
         array_to_string(words[CAST(i AS INT):CAST(i AS INT) + 1], ' ') AS gram
  FROM w, UNNEST(range(1, greatest(len(words) - 1, 1) + 1)) AS u(i)),
s AS (SELECT doc_id, count(*) AS total_grams, count(DISTINCT gram) AS distinct_grams
      FROM grams GROUP BY doc_id)
SELECT doc_id, total_grams, distinct_grams,
       round(1 - CAST(distinct_grams AS DOUBLE) / total_grams, 6) AS dup_fraction
FROM s
WHERE round(1 - CAST(distinct_grams AS DOUBLE) / total_grams, 6) >= 0.4
"""


# --- per-source cap ----------------------------------------------------------

def _source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    kept = cap_per_group(
        docs, "source", [F.col("n_chars").desc(), F.col("doc_id").asc()], n=5
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars")
    )


_SOURCE_CAP_SQL = """
WITH ranked AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents)
SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM ranked WHERE rn <= 5 GROUP BY source
"""


# --- sequence packing --------------------------------------------------------

def _packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.size(F.split(ascii_lower(F.col("text")), " "))
    packed = pack_sequences(docs, "lang", "doc_id", tokens, ctx=512)
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens")
    )


_PACKING_SQL = """
WITH t AS (
  SELECT lang AS shard, doc_id,
         CAST(len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS BIGINT) AS n_tokens
  FROM documents),
p AS (
  SELECT shard, doc_id, n_tokens,
         CAST(floor(COALESCE(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
           AS BIGINT) AS bin_id
  FROM t)
SELECT shard, bin_id, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM p GROUP BY shard, bin_id
"""


# --- end-to-end corpus curation ----------------------------------------------

def _corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE declarative plan — quality
    filter → exact dedup → benchmark decontamination → train-split →
    sequence packing — so Catalyst sees every stage at once: the token
    filter pushes into the scan, dedup and decontamination share the
    md5(text) expression, and nothing materializes between stages.
    """
    from data_pipeline_bigquery_spark.extensions.sampling import assign_split

    docs = load(spark, sf_dir, "documents")
    tokens = F.size(F.split(ascii_lower(F.col("text")), " "))
    quality = docs.withColumn("n_tokens", tokens).filter(F.col("n_tokens") >= 5)
    # exact dedup: canonical row = min doc_id per content digest
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = quality.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")
    # decontamination: drop rows whose content matches a benchmark doc
    bench_digests = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.md5("text").alias("bench_md5")
    )
    clean = deduped.join(
        F.broadcast(bench_digests),
        F.md5(F.col("text")) == F.col("bench_md5"),
        "left_anti",
    )
    train = assign_split(clean, "doc_id").filter(F.col("split") == "train")
    packed = pack_sequences(train, "lang", "doc_id", F.col("n_tokens"), ctx=512)
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        (F.max("bin_id") + 1).alias("n_bins"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_CURATION_SQL = """
WITH t AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS BIGINT) AS n_tokens
  FROM documents),
quality AS (SELECT * FROM t WHERE n_tokens >= 5),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality) WHERE rn = 1),
bench AS (SELECT md5(text) AS bench_md5 FROM documents WHERE doc_id % 97 = 0),
clean AS (
  SELECT d.* FROM deduped d
  WHERE NOT EXISTS (SELECT 1 FROM bench b WHERE md5(d.text) = b.bench_md5)),
train AS (
  SELECT * FROM clean
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100 < 80),
packed AS (
  SELECT lang AS shard, n_tokens,
         CAST(floor(COALESCE(sum(n_tokens) OVER (
             PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0)
           AS BIGINT) AS bin_id
  FROM train)
SELECT shard, count(*) AS n_docs, max(bin_id) + 1 AS n_bins,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY shard
"""


QUERIES: dict[str, QuerySpec] = {
    "pipeline_corpus_curation": QuerySpec(_corpus_curation, _CURATION_SQL),
    "pii_redaction": QuerySpec(_pii, _PII_SQL),
    "repetition_filter": QuerySpec(_repetition, _REPETITION_SQL),
    "source_cap": QuerySpec(_source_cap, _SOURCE_CAP_SQL),
    "sequence_packing": QuerySpec(_packing, _PACKING_SQL),
}
