"""Analytics batch 13 — incremental cross-corpus dedup, embedding
outlier curation, and classifier evaluation:

- ``incremental_dedup_against_manifest``: the CONSUMER of
  ``dedup_signature_manifest`` — an incoming batch of documents
  (synthesized deterministically: every 5th base doc, head-mutated,
  offset id space — the same mutation the dedup family's augmented
  corpus uses) joins its MinHash bands against the base corpus's
  manifest; per new doc: candidate count, best (lowest-id) match, and
  the dup verdict.  This is the incremental-dedup contract at lake
  scale: new data dedups against a persisted artifact instead of
  re-shingling the union.
- ``embedding_outlier_audit``: per-label curation — each vector's
  squared distance NUMERATOR to its OWN label centroid
  (``analytics5.centroid_dist_num``; n_l is constant within a label
  so the numerator orders the same as the normalized distance, and
  the value is ENGINE-IDENTICAL: correctly-rounded doubles from
  identical exact int64 inputs, folded order-exactly through DECIMAL
  — not exact integers, the squares pass 2⁵³), flag the top 5%
  (strict order statistic), report per label the member count,
  outlier count, and the worst offender — the mislabeled /
  corrupted-embedding sweep before training.
- ``lang_id_confusion``: evaluation of the marker-word language
  classifier (``text_lang_id``) against the labeled ``lang`` column —
  the confusion matrix (truth × predicted counts), wrapping the
  existing key's oracle as a subquery so the classifier arithmetic
  has exactly one definition.

Reference parity: the reference pipeline (main.py:13-54) has no
dedup / evaluation layer — scale-out extensions in the same spirit as
batches 5-12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.extensions.dedup_text import (
    banded_signatures,
    minhash_signatures_from_docs,
)
from data_pipeline_bigquery_spark.extensions.text_analysis import lang_id
from data_pipeline_bigquery_spark.queries import QuerySpec
from data_pipeline_bigquery_spark.queries.analytics5 import (
    centroid_ctes,
    centroid_dist_num,
    label_centroids,
    quantized_embeddings,
)

_NEW_ID_OFFSET = 1_000_000


# --- incremental_dedup_against_manifest --------------------------------------


def _incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch bands vs the persisted base manifest.

    Scale: the base corpus contributes only its (doc, band) manifest
    rows (the artifact a production run reads from storage — here
    rebuilt in-plan); the join is keyed on (band_idx, band_hash), so
    candidate generation is band-bucketed, never all-pairs.
    """
    # contract: base ids live below the offset — both engines filter
    # identically, so the id spaces can never collide at any corpus
    # size (ids ≥ the offset would otherwise be misclassified as
    # incoming docs by the oracle's split)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < _NEW_ID_OFFSET)
    )
    manifest = banded_signatures(
        minhash_signatures_from_docs(docs, "doc_id", "text")
    ).select(
        F.col("doc_id").alias("base_doc_id"), "band_idx", "band_hash"
    )
    new_docs = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _NEW_ID_OFFSET).alias("doc_id"),
        F.expr("substr(text, 5)").alias("text"),
    )
    new_bands = banded_signatures(
        minhash_signatures_from_docs(new_docs, "doc_id", "text")
    ).select(F.col("doc_id").alias("new_doc_id"), "band_idx", "band_hash")
    matches = (
        new_bands.join(manifest, ["band_idx", "band_hash"])
        .groupBy("new_doc_id")
        .agg(
            F.countDistinct("base_doc_id").alias("n_candidates"),
            F.min("base_doc_id").alias("best_match"),
        )
    )
    grain = new_docs.select(F.col("doc_id").alias("new_doc_id"))
    return (
        grain.join(matches, "new_doc_id", "left")
        .select(
            "new_doc_id",
            F.coalesce(F.col("n_candidates"), F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            "best_match",
            (F.coalesce(F.col("n_candidates"), F.lit(0)) > 0).alias(
                "is_dup"
            ),
        )
        .orderBy("new_doc_id")
    )


def _incremental_sql() -> str:
    from data_pipeline_bigquery_spark.queries.extensions import (
        minhash_lng_ctes,
    )

    # ONE builder invocation over base ∪ new (disjoint id spaces), then
    # the lng band table splits back into manifest vs new sides — same
    # band arithmetic as the Spark path's two builder calls.
    return f"""
WITH unioned AS (
  SELECT doc_id, translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS t FROM documents
  WHERE doc_id < {_NEW_ID_OFFSET}
  UNION ALL
  SELECT doc_id + {_NEW_ID_OFFSET}, translate(substr(text, 5), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')
  FROM documents WHERE doc_id % 5 = 0 AND doc_id < {_NEW_ID_OFFSET}),
{minhash_lng_ctes("unioned")},
matches AS (
  SELECT n.doc_id AS new_doc_id,
         count(DISTINCT m.doc_id) AS n_candidates,
         min(m.doc_id) AS best_match
  FROM lng n JOIN lng m
    ON n.band_idx = m.band_idx AND n.band_hash = m.band_hash
   AND n.doc_id >= {_NEW_ID_OFFSET} AND m.doc_id < {_NEW_ID_OFFSET}
  GROUP BY 1),
grain AS (
  SELECT doc_id + {_NEW_ID_OFFSET} AS new_doc_id
  FROM documents WHERE doc_id % 5 = 0 AND doc_id < {_NEW_ID_OFFSET})
SELECT grain.new_doc_id,
       CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
       best_match,
       coalesce(n_candidates, 0) > 0 AS is_dup
FROM grain LEFT JOIN matches USING (new_doc_id)
ORDER BY new_doc_id
"""


# --- embedding_outlier_audit --------------------------------------------------


def _embedding_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label top-5% distance outliers against the OWN-label
    centroid, ranked on the engine-identical DECIMAL numerator (n_l is
    constant within a label, so no division is needed to order; the
    squared terms are correctly-rounded doubles — identical on both
    engines — not exact integers).

    Scale: the ~label-count centroid rows broadcast into an equi-join
    on the label; ranking is a label-partitioned window.
    """
    emb = quantized_embeddings(spark, sf_dir)
    cents = label_centroids(emb).withColumnRenamed("c_label", "label")
    num = centroid_dist_num()
    scored = emb.join(F.broadcast(cents), "label").select(
        "label", "vec_id", num.alias("dist_num")
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist_num").desc(), F.col("vec_id")
    )
    wc = Window.partitionBy("label")
    ranked = scored.select(
        "label",
        "vec_id",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    # top 5% strictly: outlier ⇔ rk <= floor(n/20)
    return (
        ranked.groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_members"),
            F.sum(
                F.when(F.col("rk") <= F.expr("n div 20"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.max(F.when(F.col("rk") == 1, F.col("vec_id"))).alias(
                "worst_vec_id"
            ),
        )
        .orderBy("label")
    )


_OUTLIER_SQL = f"""
WITH {centroid_ctes()},
own AS (
  SELECT e.vec_id, e.label,
         sum(CAST(CAST(e.qi * c.n_l - c.s AS DOUBLE)
                  * CAST(e.qi * c.n_l - c.s AS DOUBLE)
                  AS DECIMAL(38,6))) AS dist_num
  FROM ex e JOIN cent c ON e.label = c.c_label AND e.dim = c.dim
  GROUP BY 1, 2),
ranked AS (
  SELECT label, vec_id,
         row_number() OVER (PARTITION BY label
                            ORDER BY dist_num DESC, vec_id) AS rk,
         count(*) OVER (PARTITION BY label) AS n
  FROM own)
SELECT label,
       CAST(max(n) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN rk <= n // 20 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       max(CASE WHEN rk = 1 THEN vec_id END) AS worst_vec_id
FROM ranked GROUP BY label ORDER BY label
"""


# --- lang_id_confusion --------------------------------------------------------


def _lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth × predicted confusion counts for the marker-word
    classifier — one corpus scan, a (langs × langs)-row aggregate."""
    scored = lang_id(load(spark, sf_dir, "documents"), "doc_id", "text")
    return (
        scored.groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted_lang")
    )


def _lang_confusion_sql() -> str:
    from data_pipeline_bigquery_spark.queries.extensions import _LANG_SQL

    return f"""
WITH scored AS ({_LANG_SQL})
SELECT lang, predicted_lang, count(*) AS n
FROM scored GROUP BY 1, 2 ORDER BY lang, predicted_lang
"""


QUERIES: dict[str, QuerySpec] = {
    "incremental_dedup_against_manifest": QuerySpec(
        _incremental_dedup, _incremental_sql()
    ),
    "embedding_outlier_audit": QuerySpec(
        _embedding_outlier_audit, _OUTLIER_SQL
    ),
    "lang_id_confusion": QuerySpec(
        _lang_id_confusion, _lang_confusion_sql()
    ),
}
