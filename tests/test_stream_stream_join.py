"""Stream-stream join: clicks joined to purchases within a bounded
event-time interval, both sides watermarked — the streaming shape of
the as-of/enrichment joins, with state bounded by the watermark."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

TS = dt.datetime


def test_stream_stream_interval_join(spark, tmp_path):
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    schema = "user_id long, ts timestamp, val double"
    spark.createDataFrame(
        [
            Row(user_id=1, ts=TS(2024, 1, 1, 10, 0), val=1.0),
            Row(user_id=1, ts=TS(2024, 1, 1, 12, 0), val=2.0),
            Row(user_id=2, ts=TS(2024, 1, 1, 10, 0), val=3.0),
        ],
        schema,
    ).coalesce(1).write.parquet(str(clicks_dir))
    spark.createDataFrame(
        [
            Row(user_id=1, ts=TS(2024, 1, 1, 10, 30), val=100.0),  # 30min after click1
            Row(user_id=2, ts=TS(2024, 1, 1, 13, 0), val=200.0),   # 3h after click — outside window
        ],
        schema,
    ).coalesce(1).write.parquet(str(buys_dir))

    clicks = (
        spark.readStream.schema(schema).parquet(str(clicks_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id"), F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(schema).parquet(str(buys_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts"), "val")
    )
    # purchase within 1 hour AFTER the click: the interval condition is
    # what lets Spark expire join state as the watermark advances
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = [
            (r["user_id"], r["click_ts"], r["val"])
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        ]
    finally:
        q.stop()
    assert rows == [(1, TS(2024, 1, 1, 10, 0), 100.0)]


def test_stream_stream_left_outer_emits_nulls_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: an unmatched left row may only
    emit (with null right columns) once BOTH watermarks have passed
    its join window — before that it must stay pending, because a
    matching right row could still arrive.  The heartbeat batch is
    what advances the watermark and flushes the pending row."""
    clicks_dir, buys_dir = tmp_path / "clicks", tmp_path / "buys"
    schema = "user_id long, ts timestamp, val double"
    spark.createDataFrame(
        [
            Row(user_id=1, ts=TS(2024, 1, 1, 10, 0), val=1.0),   # will match
            Row(user_id=3, ts=TS(2024, 1, 1, 10, 5), val=9.0),   # never matches
        ],
        schema,
    ).coalesce(1).write.parquet(str(clicks_dir))
    spark.createDataFrame(
        [Row(user_id=1, ts=TS(2024, 1, 1, 10, 30), val=100.0)],
        schema,
    ).coalesce(1).write.parquet(str(buys_dir))

    clicks = (
        spark.readStream.schema(schema).parquet(str(clicks_dir))
        .withWatermark("ts", "10 minutes")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    buys = (
        spark.readStream.schema(schema).parquet(str(buys_dir))
        .withWatermark("ts", "10 minutes")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("buy_ts"), "val")
    )
    joined = clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("interval 1 hour")),
        "left_outer",
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_outer")
        .start()
    )
    try:
        q.processAllAvailable()
        early = {
            (r["user_id"], r["val"])
            for r in spark.sql("SELECT * FROM ssj_outer").collect()
        }
        # user 3 must NOT have emitted yet — its window is still open
        assert early == {(1, 100.0)}

        # heartbeats push both watermarks a day past every open window
        for d in (clicks_dir, buys_dir):
            spark.createDataFrame(
                [Row(user_id=99, ts=TS(2024, 1, 2, 12, 0), val=0.0)], schema
            ).coalesce(1).write.mode("append").parquet(str(d))
        q.processAllAvailable()
        late = [
            (r["user_id"], r["val"])
            for r in spark.sql("SELECT * FROM ssj_outer").collect()
        ]
    finally:
        q.stop()
    # the unmatched click flushed with null buy columns exactly once —
    # a list, not a set, so a duplicate emission would actually fail
    assert late.count((3, None)) == 1
    assert sum(1 for u, _ in late if u == 3) == 1
