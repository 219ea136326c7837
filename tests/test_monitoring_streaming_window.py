"""Monitoring decorator + streaming windowed aggregation (the
watermark + event-time window combination from the guide/ST5)."""

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

from data_pipeline_bigquery_spark.monitoring import seconds_to_hms, workflow_monitoring

TS = dt.datetime


def test_workflow_monitoring_decorator():
    records = []

    @workflow_monitoring(name="companies_sync", notify=records.append)
    def run():
        return 42

    assert run() == 42
    assert records[0]["workflow"] == "companies_sync"
    assert records[0]["rows"] == 42
    assert records[0]["status"] == "success"


def test_workflow_monitoring_failure_still_notifies():
    records = []

    @workflow_monitoring(notify=records.append)
    def boom():
        raise RuntimeError("source down")

    try:
        boom()
    except RuntimeError:
        pass
    assert records[0]["status"] == "failed"
    assert records[0]["rows"] is None


def test_seconds_to_hms():
    assert seconds_to_hms(3725) == "1 hours, 2 minutes, 5 seconds"


def test_streaming_windowed_aggregation(spark, tmp_path):
    """readStream → watermark → tumbling window → memory sink: the
    streaming shape of windowed_event_counts."""
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    schema = "id long, ts timestamp, event_type string, value double"
    spark.createDataFrame(
        [
            Row(id=1, ts=TS(2024, 1, 1, 0, 10), event_type="click", value=1.0),
            Row(id=2, ts=TS(2024, 1, 1, 0, 20), event_type="click", value=2.0),
            Row(id=3, ts=TS(2024, 1, 1, 1, 5), event_type="view", value=3.0),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(str(in_dir))

    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {
            (r["event_type"], r["window"].start.hour): (r["n"], r["total"])
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()
    assert rows[("click", 0)] == (2, 3.0)
    assert rows[("view", 1)] == (1, 3.0)


def test_streaming_session_window_with_watermark(spark, tmp_path):
    """Native session_window in STREAMING mode (the stateful operator
    behind session_window_agg's batch twin): gap-merged sessions per
    user, watermark-bounded state, late-but-in-gap events extend the
    session."""
    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    schema = "id long, ts timestamp, user long"
    batch1 = [
        Row(id=1, ts=TS(2024, 1, 1, 0, 0), user=1),
        Row(id=2, ts=TS(2024, 1, 1, 0, 10), user=1),   # merges (gap 10m < 30m)
        Row(id=3, ts=TS(2024, 1, 1, 2, 0), user=1),    # new session
        Row(id=4, ts=TS(2024, 1, 1, 0, 5), user=2),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))

    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: an event inside user 1's first session gap
        # extends/merges that session
        spark.createDataFrame(
            [Row(id=5, ts=TS(2024, 1, 1, 0, 25), user=1)], schema
        ).coalesce(1).write.mode("append").parquet(str(in_dir))
        q.processAllAvailable()
        rows = [
            (r["user"], r["session_window"].start, r["n"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        ]
    finally:
        q.stop()
    by_user = {}
    for u, start, n in rows:
        by_user.setdefault(u, []).append((start.hour, start.minute, n))
    # user 1: one merged 3-event session starting 0:00, one singleton at 2:00
    assert sorted(by_user[1]) == [(0, 0, 3), (2, 0, 1)]
    assert by_user[2] == [(0, 5, 1)]


def test_update_mode_late_event_updates_window_then_expires(spark, tmp_path):
    """Update-mode watermark semantics, pinned: a late event INSIDE
    the watermark re-emits its window with the corrected count; an
    event later than (max_seen - watermark) is dropped."""
    in_dir = tmp_path / "upd_in"
    in_dir.mkdir()
    schema = "id long, ts timestamp, event_type string"

    def _emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    _emit([Row(id=1, ts=TS(2024, 1, 1, 0, 5), event_type="a"),
           Row(id=2, ts=TS(2024, 1, 1, 3, 0), event_type="a")])
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("upd_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is now 02:00. An 00:10 event is too late (< wm,
        # its window [0:00,1:00) closed); an 02:30 event is accepted.
        _emit([Row(id=3, ts=TS(2024, 1, 1, 0, 10), event_type="a"),
               Row(id=4, ts=TS(2024, 1, 1, 2, 30), event_type="a")])
        q.processAllAvailable()
        rows = [
            (r["window"].start.hour, r["n"])
            for r in spark.sql("SELECT * FROM upd_out").collect()
        ]
    finally:
        q.stop()
    # the memory sink logs every UPDATE emission; hour-0 must have
    # been emitted exactly once with n=1 (the late id=3 was dropped,
    # never re-emitted), hour-2 appears with n=1
    assert rows.count((0, 1)) == 1
    assert (0, 2) not in rows
    assert (2, 1) in rows


def test_append_mode_window_emits_only_after_watermark_passes(spark, tmp_path):
    """Append-mode watermark semantics, pinned: a window row is
    emitted ONLY once the watermark passes its end (it is final and
    will never be retracted); until then the sink stays empty."""
    in_dir = tmp_path / "app_in"
    in_dir.mkdir()
    schema = "id long, ts timestamp, event_type string"

    def _emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(in_dir))

    _emit([Row(id=1, ts=TS(2024, 1, 1, 0, 5), event_type="a")])
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("app_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark still inside [0:00, 1:00): nothing may be emitted
        assert spark.sql("SELECT * FROM app_out").count() == 0
        # an event at 1:30 pushes the watermark past the window end
        _emit([Row(id=2, ts=TS(2024, 1, 1, 1, 30), event_type="a")])
        q.processAllAvailable()
        rows = [
            (r["window"].start.hour, r["n"])
            for r in spark.sql("SELECT * FROM app_out").collect()
        ]
    finally:
        q.stop()
    # hour-0 window now final with n=1; hour-1 still open, not emitted
    assert rows == [(0, 1)]
