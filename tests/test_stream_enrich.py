"""Stream-static enrichment equals its batch twin, and the
foreachBatch variant observes a dimension update between batches."""

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

from data_pipeline_bigquery_spark.streaming.enrich import (
    enrich_foreach_batch,
    enrich_stream,
)

TS = dt.datetime
EV_SCHEMA = "user_id long, ts timestamp, amount double"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path))


def test_stream_static_matches_batch(spark, tmp_path):
    ev_dir = tmp_path / "events"
    _write_events(
        spark,
        ev_dir,
        [
            Row(user_id=1, ts=TS(2024, 1, 1, 10), amount=5.0),
            Row(user_id=2, ts=TS(2024, 1, 1, 11), amount=7.0),
            Row(user_id=9, ts=TS(2024, 1, 1, 12), amount=1.0),  # no dim row
        ],
    )
    dim = spark.createDataFrame(
        [Row(user_id=1, segment="gold"), Row(user_id=2, segment="basic")],
        "user_id long, segment string",
    )
    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(ev_dir))
    q = (
        enrich_stream(stream, dim, on="user_id")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["segment"], r["amount"])
            for r in spark.sql("SELECT * FROM enriched").collect()
        }
    finally:
        q.stop()
    batch = spark.read.schema(EV_SCHEMA).parquet(str(ev_dir))
    want = {
        (r["user_id"], r["segment"], r["amount"])
        for r in batch.join(F.broadcast(dim), "user_id", "left").collect()
    }
    assert got == want
    assert (9, None, 1.0) in got  # left join keeps unmatched stream rows


def test_foreach_batch_sees_dim_update(spark, tmp_path):
    ev_dir, dim_dir = tmp_path / "events", tmp_path / "dim"
    dim_rows = [Row(user_id=1, segment="gold")]
    spark.createDataFrame(dim_rows, "user_id long, segment string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(dim_dir))
    _write_events(spark, ev_dir, [Row(user_id=1, ts=TS(2024, 1, 1), amount=1.0)])

    seen: list[tuple] = []

    def sink(df, epoch_id):
        seen.extend(
            (r["user_id"], r["segment"], r["amount"]) for r in df.collect()
        )

    stream = spark.readStream.schema(EV_SCHEMA).parquet(str(ev_dir))
    q = enrich_foreach_batch(
        stream,
        load_dim=lambda s: s.read.parquet(str(dim_dir)),
        on="user_id",
        sink=sink,
    )
    try:
        q.processAllAvailable()
        assert (1, "gold", 1.0) in seen
        # rewrite the dimension in place, then feed a second batch
        spark.createDataFrame(
            [Row(user_id=1, segment="platinum")], "user_id long, segment string"
        ).coalesce(1).write.mode("overwrite").parquet(str(dim_dir))
        _write_events(
            spark, ev_dir, [Row(user_id=1, ts=TS(2024, 1, 2), amount=2.0)]
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert (1, "platinum", 2.0) in seen  # second batch saw the rewrite
