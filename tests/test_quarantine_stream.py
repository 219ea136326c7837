"""Streaming dead-letter routing (streaming/quarantine_stream.py):
good rows land typed, corrupt lines land in the dead-letter sink with
nothing lost, and a replayed epoch is idempotent."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay integration proof
# (multi-trigger micro-batch runs).  Run with --full before committing
# changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.streaming.quarantine_stream import (
    process_quarantine_batch,
    quarantine_stream,
)

SCHEMA = "doc_id long, lang string"

GOOD = ['{"doc_id": 1, "lang": "en"}', '{"doc_id": 2, "lang": "de"}']
BAD = ['{"doc_id": 3, "la', "not json at all", '{"lang": "fr"}']  # last: missing pk


def _write_lines(spark, path, lines):
    spark.createDataFrame([Row(value=l) for l in lines], "value string").coalesce(
        1
    ).write.mode("append").text(path)


def test_stream_routes_good_and_dead(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    good_path = str(tmp_path / "good")
    dead_path = str(tmp_path / "dead")
    _write_lines(spark, stream_dir, GOOD + BAD)

    q = quarantine_stream(
        spark, stream_dir, SCHEMA, "doc_id", good_path, dead_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    good = spark.read.parquet(good_path)
    assert sorted((r.doc_id, r.lang) for r in good.collect()) == [(1, "en"), (2, "de")]
    dead = {r.raw_line for r in spark.read.parquet(dead_path).collect()}
    assert dead == set(BAD)  # nothing lost, nothing misrouted


def test_replayed_epoch_idempotent(spark, tmp_path):
    good_path = str(tmp_path / "good")
    dead_path = str(tmp_path / "dead")
    batch = spark.createDataFrame(
        [Row(value=l) for l in GOOD + BAD], "value string"
    )
    for _ in range(2):  # same epoch twice = crash replay
        process_quarantine_batch(batch, 0, SCHEMA, "doc_id", good_path, dead_path)
    assert spark.read.parquet(good_path).count() == len(GOOD)
    assert spark.read.parquet(dead_path).count() == len(BAD)


def test_all_good_batch_writes_no_dead_letter_dir(spark, tmp_path):
    import os

    good_path = str(tmp_path / "good")
    dead_path = str(tmp_path / "dead")
    batch = spark.createDataFrame([Row(value=l) for l in GOOD], "value string")
    process_quarantine_batch(batch, 0, SCHEMA, "doc_id", good_path, dead_path)
    assert spark.read.parquet(good_path).count() == len(GOOD)
    # empty side skipped: no unreadable partitioned dir left behind
    assert not os.path.exists(dead_path)
