"""Streaming half of the Python Data Source API REST adapter:
incremental cursor polling with checkpointed offsets — restart resumes
from the committed cursor and never re-emits (exactly-once), new
arrivals between runs are picked up."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming source resume/exactly-once integration
# proof (multi-trigger micro-batch runs).  Run with --full before
# committing changes to streaming/ or sources/ paths.
pytestmark = _pytest_tier.mark.slow

import json

from data_pipeline_bigquery_spark.sources.rest_datasource import (
    RestOffsetDataSource,
)


def _append(path, lo, hi):
    with open(path, "a") as f:
        for i in range(lo, hi):
            f.write(json.dumps({"id": i, "v": f"r{i}"}) + "\n")


def _run_until(spark, path, ckpt, out, expected):
    """Drain with a fast trigger until the sink holds ``expected`` rows
    (several 6-record micro-batches), then stop — exercises multi-batch
    cursor advancement, not just one read."""
    import time

    q = (
        spark.readStream.format("restoffset")
        .schema("id long, v string")
        .option("path", path)
        .option("max_per_batch", "6")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= expected:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()


def test_cursor_stream_resumes_exactly_once(spark, tmp_path):
    spark.dataSource.register(RestOffsetDataSource)
    path = str(tmp_path / "feed.jsonl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    _append(path, 0, 10)
    _run_until(spark, path, ckpt, out, expected=10)
    got1 = spark.read.parquet(out)
    assert sorted(r.id for r in got1.collect()) == list(range(10))

    # new arrivals; restart from the SAME checkpoint
    _append(path, 10, 17)
    _run_until(spark, path, ckpt, out, expected=17)
    got2 = spark.read.parquet(out).collect()
    # every record exactly once — the committed cursor was resumed,
    # nothing re-emitted, nothing skipped
    assert sorted(r.id for r in got2) == list(range(17))
