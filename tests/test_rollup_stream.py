"""Streaming continuous aggregate: the foreachBatch IVM twin must
converge to exactly the batch recompute, across multiple micro-batches
and a second (incremental) stream run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.streaming.rollup_stream import start_rollup_stream

TS = dt.datetime
SCHEMA = "id long, ts timestamp, event_type string, value double"


def _rows(*triples):
    return [
        Row(id=i, ts=t, event_type=e, value=v) for i, (t, e, v) in enumerate(triples)
    ]


def _run_stream(spark, in_dir, rollup, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(str(in_dir))
    q = start_rollup_stream(
        spark,
        stream.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.col("value").cast("decimal(18,2)").alias("value_dec"),
        ),
        str(rollup),
        str(ckpt),
        keys=["event_type", "day"],
        sums={"total_value": F.col("value_dec")},
    )
    q.awaitTermination(120)


def test_streaming_rollup_matches_batch_recompute(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rollup = tmp_path / "rollup"
    ckpt = tmp_path / "ckpt"

    batch1 = _rows(
        (TS(2024, 1, 1, 10), "click", 1.5),
        (TS(2024, 1, 1, 11), "click", 2.25),
        (TS(2024, 1, 2, 9), "view", 4.0),
    )
    spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(str(in_dir))
    _run_stream(spark, in_dir, rollup, ckpt)

    # second run picks up ONLY the new file (checkpointed source offsets)
    batch2 = _rows(
        (TS(2024, 1, 1, 12), "click", 0.25),
        (TS(2024, 1, 3, 8), "view", 10.0),
    )
    spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(str(in_dir))
    _run_stream(spark, in_dir, rollup, ckpt)

    got = {
        (r.event_type, str(r.day)): (r.n_rows, float(r.total_value))
        for r in spark.read.parquet(str(rollup)).collect()
    }
    # batch recompute over everything
    expect_df = (
        spark.read.parquet(str(in_dir))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
    )
    expect = {
        (r.event_type, str(r.day)): (r.n_rows, float(r.total_value))
        for r in expect_df.collect()
    }
    assert got == expect
    assert got[("click", "2024-01-01")] == (3, 4.0)
    assert got[("view", "2024-01-03")] == (1, 10.0)
