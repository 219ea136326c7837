"""Checkpoint-recovery e2e for the streaming upsert sink: a stopped
query restarted on the SAME checkpoint must (a) pick up files delivered
while it was down, (b) not re-apply batches it already processed, and
(c) be a no-op when restarted with nothing new — the exactly-once
surface a production stream actually depends on across deploys and
crashes.  (The reference's batch analog is the cursor table guard,
pipeline/functions/functions.py; Structured Streaming's is the
checkpoint offset log + idempotent foreachBatch merge.)"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import glob
import hashlib
import os
from datetime import datetime as TS

from pyspark.sql import Row

from data_pipeline_bigquery_spark.streaming.incremental import streaming_upsert

SCHEMA = "id long, ts timestamp, v string"


def _deliver(spark, stream_dir, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(stream_dir)
    )


def _state(spark, target):
    return {r.id: (r.v, r.ts) for r in spark.read.parquet(target).collect()}


def _run_until_drained(spark, stream_dir, target, ckpt):
    q = streaming_upsert(
        spark, str(stream_dir), SCHEMA, target, pk="id",
        event_time_col="ts", checkpoint=ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    target = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")

    # run 1: two batches processed, then the query goes down
    _deliver(spark, stream_dir, [Row(id=1, ts=TS(2024, 1, 1, 10), v="a")])
    _deliver(spark, stream_dir, [Row(id=2, ts=TS(2024, 1, 1, 11), v="b")])
    _run_until_drained(spark, stream_dir, target, ckpt)
    assert _state(spark, target) == {
        1: ("a", TS(2024, 1, 1, 10)),
        2: ("b", TS(2024, 1, 1, 11)),
    }

    # while DOWN: an update to id=1 and a brand-new id=3 land
    _deliver(
        spark,
        stream_dir,
        [Row(id=1, ts=TS(2024, 1, 1, 12), v="a2"), Row(id=3, ts=TS(2024, 1, 1, 12), v="c")],
    )

    # run 2: restart on the same checkpoint → only the new file replays
    _run_until_drained(spark, stream_dir, target, ckpt)
    assert _state(spark, target) == {
        1: ("a2", TS(2024, 1, 1, 12)),  # update applied once
        2: ("b", TS(2024, 1, 1, 11)),   # untouched — batch 1 not re-merged
        3: ("c", TS(2024, 1, 1, 12)),
    }

    # run 3: restart with NOTHING new → the target bytes must not move
    # (offset log says everything is consumed; no spurious batch runs)
    def digests():
        return {
            os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in glob.glob(f"{target}/*.parquet")
        }

    before = digests()
    _run_until_drained(spark, stream_dir, target, ckpt)
    assert digests() == before


def test_fresh_checkpoint_reprocesses_but_merge_converges(spark, tmp_path):
    """Losing the checkpoint means at-least-once redelivery of every
    file — the merge sink must still converge to the same final state
    (latest-cursor-wins makes the replay idempotent at the TABLE level
    even when it is not at the batch level)."""
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    target = str(tmp_path / "tgt")

    _deliver(spark, stream_dir, [Row(id=1, ts=TS(2024, 1, 1, 10), v="a")])
    _deliver(spark, stream_dir, [Row(id=1, ts=TS(2024, 1, 1, 12), v="a2")])
    _run_until_drained(spark, stream_dir, target, str(tmp_path / "ck1"))
    first = _state(spark, target)

    # new checkpoint → full replay of both files into the existing target
    _run_until_drained(spark, stream_dir, target, str(tmp_path / "ck2"))
    assert _state(spark, target) == first == {1: ("a2", TS(2024, 1, 1, 12))}
