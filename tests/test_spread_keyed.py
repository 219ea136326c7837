"""Keyed spread_small_input (r13): hash-partition on a unique id
instead of round-robin so the SPARK-23207 sort-before-repartition
full-row local sort never runs; rows must be identical either way."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.dedup_text import spread_small_input


@pytest.fixture(scope="module")
def one_file_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spread") / "docs.parquet")
    spark.range(0, 500).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_keyed_spread_is_hash_not_round_robin(one_file_df):
    keyed = spread_small_input(one_file_df, key="doc_id")
    plan = keyed._jdf.queryExecution().toString()
    assert "hashpartitioning(doc_id" in plan
    assert "roundrobin" not in plan.lower()


def test_unkeyed_spread_still_round_robin(one_file_df):
    plain = spread_small_input(one_file_df)
    plan = plain._jdf.queryExecution().toString()
    assert "roundrobin" in plan.lower()


def test_missing_key_falls_back(one_file_df):
    fallback = spread_small_input(one_file_df, key="not_a_column")
    plan = fallback._jdf.queryExecution().toString()
    assert "roundrobin" in plan.lower()


def test_rows_identical_and_spread(one_file_df):
    keyed = spread_small_input(one_file_df, key="doc_id")
    assert sorted(r.doc_id for r in keyed.collect()) == list(range(500))
    # the spread really fans out beyond the single input file
    assert keyed.rdd.getNumPartitions() > 1


# --- guarded IVF probe-batch spread (r14) -------------------------------------

@pytest.fixture(scope="module")
def vec_files(spark, tmp_path_factory):
    """A standalone 'corpus' parquet and a standalone 'queries' parquet
    (disjoint file sets), both single-file."""
    root = tmp_path_factory.mktemp("ivfspread")
    corpus_path = str(root / "corpus.parquet")
    query_path = str(root / "queries.parquet")
    base = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % (i + 3)).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    base.coalesce(1).write.mode("overwrite").parquet(corpus_path)
    base.filter(F.col("vec_id") < 50).coalesce(1).write.mode("overwrite").parquet(
        query_path
    )
    return corpus_path, query_path


def test_query_slice_of_corpus_not_spread(spark, vec_files):
    """The bench shape: the probe batch is a FILTER of the corpus file.
    No spread, whatever the file's byte size — the slice is small by
    contract and an Exchange before the broadcast probe is pure waste
    (r13 plan audit)."""
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _spread_large_query_batch,
    )

    corpus_path, _ = vec_files
    corpus = spark.read.parquet(corpus_path)
    queries = corpus.filter(F.col("vec_id") < 8)
    out = _spread_large_query_batch(queries, corpus, "vec_id", min_bytes=1)
    assert out is queries  # untouched — no repartition node added


def test_local_relation_queries_not_spread(spark, vec_files):
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _spread_large_query_batch,
    )

    corpus_path, _ = vec_files
    corpus = spark.read.parquet(corpus_path)
    queries = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    out = _spread_large_query_batch(queries, corpus, "vec_id", min_bytes=1)
    assert out is queries


def test_large_standalone_batch_is_spread_keyed(spark, vec_files):
    """A big single-file probe batch that is NOT a slice of the corpus
    gets the keyed spread — the probe stage must not run on one task."""
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _spread_large_query_batch,
    )

    corpus_path, query_path = vec_files
    corpus = spark.read.parquet(corpus_path)
    queries = spark.read.parquet(query_path)
    out = _spread_large_query_batch(queries, corpus, "vec_id", min_bytes=1)
    assert out is not queries
    plan = out._jdf.queryExecution().toString()
    assert "hashpartitioning(vec_id" in plan
    assert "roundrobin" not in plan.lower()
    # rows unchanged
    assert sorted(r.vec_id for r in out.collect()) == sorted(
        r.vec_id for r in queries.collect()
    )


def test_small_standalone_batch_below_threshold_not_spread(spark, vec_files):
    from data_pipeline_bigquery_spark.extensions.similarity import (
        _spread_large_query_batch,
    )

    corpus_path, query_path = vec_files
    corpus = spark.read.parquet(corpus_path)
    queries = spark.read.parquet(query_path)
    # default threshold (32 MB) is far above this tiny file
    out = _spread_large_query_batch(queries, corpus, "vec_id")
    assert out is queries
