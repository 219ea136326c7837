"""Analytics batch 24 — the explicit Unicode-normalization
pre-processing op (r10 ADVICE: "ship the promised explicit
single-engine Unicode-normalization pre-processing op"):

- ``unicode_nfc_audit``: per-document NFC normalization audit — the
  md5 of the NFC-composed text plus a ``changed`` flag.  NFC is the
  ONE full-Unicode transform two independent engines agree on
  byte-for-byte (normalization stability policy; probed
  ``unicodedata`` vs DuckDB utf8proc — see
  ``functions/unicode_norm.py``), so unlike the deliberately
  ASCII-only folds in ``functions/text.py`` this runs the REAL
  normalizer under the cross-engine hash gate.  Emitting the digest
  instead of the text keeps the compared surface byte-exact while the
  payload never leaves the executors.  The casefold tier
  (``nfkc_casefold``) stays single-engine by design and is pinned by
  unit tests, not an oracle.

Scale shape: one Arrow-batched projection on the documents scan — no
shuffle, no state; at 100 TB it pipelines with whatever consumes the
normalized corpus.

Reference parity: the reference pipeline (main.py:13-54) normalizes
nothing (pandas passes text through); this is the scale-out
pre-processing seam the multilingual dedup/text family documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.functions.unicode_norm import (
    nfc_changed,
    nfc_normalize,
)
from data_pipeline_bigquery_spark.queries import QuerySpec


def _unicode_nfc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc NFC digest + changed flag (see module docstring)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        "text",
        nfc_normalize(F.col("text")).alias("__nfc"),
    ).select(
        "doc_id",
        F.md5("__nfc").alias("norm_md5"),
        nfc_changed("text", "__nfc").alias("changed"),
    )


_NFC_AUDIT_SQL = """
SELECT doc_id,
       md5(nfc_normalize(text)) AS norm_md5,
       CAST(CASE WHEN text <> nfc_normalize(text) THEN 1 ELSE 0 END AS INT)
         AS changed
FROM documents
"""


QUERIES: dict[str, QuerySpec] = {
    "unicode_nfc_audit": QuerySpec(_unicode_nfc_audit, _NFC_AUDIT_SQL),
}
