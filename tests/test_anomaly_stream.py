"""streaming/anomaly_stream.py: running z-score anomaly monitor —
batch/stream convergence, cross-batch state carryover, restart-resume."""

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

from data_pipeline_bigquery_spark.streaming.anomaly_stream import (
    anomaly_stateful,
    zscore_anomalies,
)

TS = dt.datetime
SCHEMA = "event_id long, event_type string, ts timestamp, value double"


def _baseline_rows(n=40, typ="click"):
    """40 well-behaved events, values alternating 9.0/11.0 (mean 10,
    stddev 1) — enough history to pass min_n."""
    return [
        Row(
            event_id=i,
            event_type=typ,
            ts=TS(2024, 1, 1, 0, 0, i),
            value=9.0 if i % 2 == 0 else 11.0,
        )
        for i in range(n)
    ]


def _outlier_row(event_id=1000, typ="click", value=100.0):
    return Row(
        event_id=event_id,
        event_type=typ,
        ts=TS(2024, 1, 1, 1, 0, 0),
        value=value,
    )


def _run_stream(spark, in_dir, name, one_file_per_batch=False):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(str(in_dir))
    q = (
        anomaly_stateful(stream, threshold=3.0, min_n=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def _run_stream_resumable(spark, in_dir, out_dir, checkpoint):
    """foreachBatch parquet sink — unlike the memory sink it supports
    checkpoint recovery, so the query can stop and resume."""
    stream = spark.readStream.schema(SCHEMA).parquet(str(in_dir))

    def sink(batch, _epoch):
        if batch.count():
            batch.write.mode("append").parquet(str(out_dir))

    q = (
        anomaly_stateful(stream, threshold=3.0, min_n=30)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_batch_zscore_flags_only_the_outlier(spark):
    df = spark.createDataFrame(
        _baseline_rows() + [_outlier_row()], SCHEMA
    )
    out = zscore_anomalies(df, threshold=3.0, min_n=30).collect()
    assert [r.event_id for r in out] == [1000]
    assert out[0].z > 3.0


def test_stream_matches_batch_across_batch_boundary(spark, tmp_path):
    """Baseline arrives in micro-batch 1, the outlier in micro-batch 2
    (maxFilesPerTrigger=1) — the state (n, Σc, Σc²) must carry across
    micro-batches so the outlier is scored against the full history,
    bit-identically to the batch window."""
    in_dir = tmp_path / "an_in"
    in_dir.mkdir()
    spark.createDataFrame(_baseline_rows(), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    spark.createDataFrame([_outlier_row()], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    got = _run_stream(spark, in_dir, "an_out2", one_file_per_batch=True)
    assert [r.event_id for r in got] == [1000]

    batch = zscore_anomalies(
        spark.createDataFrame(_baseline_rows() + [_outlier_row()], SCHEMA),
        threshold=3.0,
        min_n=30,
    ).collect()
    assert got[0].z == batch[0].z  # same integer accumulator → identical


def test_restart_resume_carries_state(spark, tmp_path):
    """Stop the query after the baseline, add the outlier file, restart
    from the same checkpoint: the resumed query must score the outlier
    against the state built before the restart (a fresh run would
    re-read everything; a state-losing resume would stay silent)."""
    in_dir, out_dir, ckpt = (
        tmp_path / "an_in3",
        tmp_path / "an_out3",
        tmp_path / "ckpt3",
    )
    in_dir.mkdir()
    spark.createDataFrame(_baseline_rows(), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    _run_stream_resumable(spark, in_dir, out_dir, ckpt)
    import os

    assert not os.path.exists(str(out_dir))  # baseline alone: silent

    spark.createDataFrame([_outlier_row()], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    _run_stream_resumable(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(str(out_dir)).collect()
    assert [r.event_id for r in got] == [1000]
    assert got[0].z > 3.0


def test_keys_are_isolated_and_below_min_n_silent(spark, tmp_path):
    """A second event type with few events must never alert (min_n),
    and its values must not pollute the first type's baseline."""
    rows = (
        _baseline_rows()
        + [_outlier_row()]
        + [
            Row(
                event_id=5000 + i,
                event_type="view",
                ts=TS(2024, 1, 1, 0, 0, i),
                value=1000.0 * (i + 1),  # wild values, but n < min_n
            )
            for i in range(5)
        ]
    )
    in_dir = tmp_path / "an_in2"
    in_dir.mkdir()
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(in_dir)
    )
    got = _run_stream(spark, in_dir, "an_out4")
    assert [r.event_id for r in got] == [1000]
    assert all(r.event_type == "click" for r in got)
