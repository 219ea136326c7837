"""Monitoring decorator + streaming windowed aggregation (the
watermark + event-time window combination from the guide/ST5)."""

from __future__ import annotations

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
