"""Behavioral check for boilerplate_span_removal (queries/corpus_ops.py):
corpus-frequent spans vanish from every document, unique spans survive
in order, and an all-boilerplate document still emits a row."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from data_pipeline_bigquery_spark.queries.corpus_ops import _boilerplate_span_removal


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_global_spans_removed_documents_reassembled(spark, tmp_path):
    # span grain is 3 words; "cookie banner text" opens docs 1 AND 2 →
    # corpus count 2 → boilerplate.  Doc 3 is nothing but that banner.
    docs = [
        (1, "cookie banner text alpha beta gamma"),
        (2, "cookie banner text delta epsilon zeta"),
        (3, "cookie banner text"),
        (4, "eta theta iota"),
    ]
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r.doc_id: r for r in _boilerplate_span_removal(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 4}  # no doc lost, including the emptied one
    assert (out[1].n_kept, out[1].n_dropped) == (1, 1)
    assert out[1].clean_digest == _md5("alpha beta gamma")
    assert out[2].clean_digest == _md5("delta epsilon zeta")
    assert (out[3].n_kept, out[3].n_dropped) == (0, 1)
    assert out[3].clean_digest == _md5("")  # fully-boilerplate doc → empty text
    assert (out[4].n_kept, out[4].n_dropped) == (1, 0)
    assert out[4].clean_digest == _md5("eta theta iota")


def test_surviving_spans_keep_document_order(spark, tmp_path):
    # the repeated middle span drops; the outer spans must rejoin in
    # original order, not collection order
    docs = [
        (1, "one two three dup dup dup seven eight nine"),
        (2, "dup dup dup"),
    ]
    spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in _boilerplate_span_removal(spark, str(tmp_path)).collect()}
    assert out[1].clean_digest == _md5("one two three seven eight nine")
