"""Streaming reconciliation monitor (streaming/recon_stream.py):
counters fold associatively across epochs, replays never double-count,
incremental drift flips the status, and the cumulative rollup CONVERGES
to the batch ``reconciliation_row_checksum`` key on the same rows."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay integration proof
# (multi-trigger micro-batch runs).  Run with --full before committing
# changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import hashlib

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics10
from data_pipeline_bigquery_spark.streaming.recon_stream import (
    process_recon_batch,
    recon_monitor_stream,
    recon_rollup,
)
from tests.conftest import SF_DIR

SCHEMA = "part date, side string, k long, cents long"


def _bucket(k: int, n: int) -> int:
    return int(hashlib.md5(str(k).encode()).hexdigest()[:7], 16) % n


def _tagged_rows_from_orders(spark):
    """The batch key's exact fixture semantics as a tagged dual feed:
    src = every order row; rep = drift bucket 0 bumped a cent, bucket 1
    missing."""
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        F.trunc("o_orderdate", "month").alias("part"),
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket

    drift = base.withColumn("drift", hash_bucket(F.col("k"), 97))
    src = drift.select("part", F.lit("src").alias("side"), "k", "cents")
    rep = drift.filter(F.col("drift") != 1).select(
        "part",
        F.lit("rep").alias("side"),
        "k",
        F.when(F.col("drift") == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    return src.unionAll(rep).select("part", "side", "k", "cents")


def test_rollup_converges_to_batch_key(spark, tmp_path):
    counters = str(tmp_path / "counters")
    tagged = _tagged_rows_from_orders(spark)
    # split the feed into 3 epochs on a key hash — batch boundaries
    # must not matter because checksums fold associatively
    for epoch in range(3):
        process_recon_batch(
            tagged.filter(F.col("k") % 3 == epoch), epoch, counters
        )
    got = recon_rollup(spark, counters).collect()
    want = analytics10.QUERIES["reconciliation_row_checksum"].fn(
        spark, SF_DIR
    ).collect()
    as_map = lambda rows: {
        r.part: (r.n_src, r.n_rep, r.checksum_src, r.checksum_rep, r.status)
        for r in rows
    }
    assert as_map(got) == as_map(want)


def test_replayed_epoch_never_double_counts(spark, tmp_path):
    counters = str(tmp_path / "counters")
    import datetime as dt

    m = dt.date(2024, 1, 1)
    rows = [(m, "src", 1, 100), (m, "src", 2, 200),
            (m, "rep", 1, 100), (m, "rep", 2, 200)]
    batch = spark.createDataFrame(rows, SCHEMA)
    for _ in range(3):  # at-least-once replay of the SAME epoch
        process_recon_batch(batch, 7, counters)
    out = recon_rollup(spark, counters).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_src, r.n_rep, r.status) == (2, 2, "OK")
    assert r.checksum_src == r.checksum_rep


def test_incremental_drift_flips_status(spark, tmp_path):
    counters = str(tmp_path / "counters")
    import datetime as dt

    m = dt.date(2024, 2, 1)
    ok = [(m, "src", 1, 100), (m, "rep", 1, 100)]
    process_recon_batch(spark.createDataFrame(ok, SCHEMA), 0, counters)
    assert recon_rollup(spark, counters).collect()[0].status == "OK"
    # epoch 1: replica applies a different value for key 2 → checksum
    drift = [(m, "src", 2, 500), (m, "rep", 2, 501)]
    process_recon_batch(spark.createDataFrame(drift, SCHEMA), 1, counters)
    r = recon_rollup(spark, counters).collect()[0]
    assert (r.n_src, r.n_rep, r.status) == (2, 2, "CHECKSUM_MISMATCH")
    # epoch 2: replica misses a row entirely → count takes precedence
    miss = [(m, "src", 3, 900)]
    process_recon_batch(spark.createDataFrame(miss, SCHEMA), 2, counters)
    r = recon_rollup(spark, counters).collect()[0]
    assert (r.n_src, r.n_rep, r.status) == (3, 2, "COUNT_MISMATCH")


def test_streaming_e2e_parquet_source(spark, tmp_path):
    src_dir = str(tmp_path / "feed")
    counters = str(tmp_path / "counters")
    ckpt = str(tmp_path / "ckpt")
    import datetime as dt

    m = dt.date(2024, 3, 1)
    rows = [(m, "src", 1, 100), (m, "rep", 1, 101)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = recon_monitor_stream(stream, counters, checkpoint=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    r = recon_rollup(spark, counters).collect()[0]
    assert r.status == "CHECKSUM_MISMATCH"
    assert (r.n_src, r.n_rep) == (1, 1)
