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
