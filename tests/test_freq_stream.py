"""Streaming CMS (streaming/freq_stream.py): cumulative estimates match
the batch union, replayed epochs never double-count, and a restarted
stream resumes from the persisted sketch."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.streaming.freq_stream import (
    estimate_counts,
    make_sketch_batch,
    start_freq_stream,
)

SCHEMA = "term string"


def _deliver(spark, stream_dir, terms):
    spark.createDataFrame([Row(term=t) for t in terms], SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(str(stream_dir))


def _drain(spark, stream_dir, sketch_dir, ckpt):
    q = start_freq_stream(spark, str(stream_dir), SCHEMA, str(sketch_dir), ckpt)
    q.awaitTermination()


def test_stream_estimates_match_union_and_replay_is_idempotent(spark, tmp_path):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    sketch_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")

    _deliver(spark, stream_dir, ["a"] * 5 + ["b"] * 2)
    _drain(spark, stream_dir, sketch_dir, ckpt)
    # second delivery while down; restart resumes from the persisted
    # sketch + checkpoint and folds in only the new file
    _deliver(spark, stream_dir, ["a"] * 3 + ["c"] * 7)
    _drain(spark, stream_dir, sketch_dir, ckpt)

    est = estimate_counts(spark, sketch_dir, ["a", "b", "c", "zzz"])
    # eps=1e-4 over 17 terms: the grid is collision-free, estimates exact
    assert est == {"a": 8, "b": 2, "c": 7, "zzz": 0}

    # direct replay of an already-applied epoch must no-op (the guard,
    # not the checkpoint, is what makes at-least-once safe)
    fn = make_sketch_batch(sketch_dir)
    replay = spark.createDataFrame([Row(term="a")] * 100, SCHEMA)
    fn(replay, 0)  # epoch 0 long since applied
    assert estimate_counts(spark, sketch_dir, ["a"]) == {"a": 8}


def test_streamed_sketch_equals_one_shot_batch_sketch(spark, tmp_path):
    """Merge associativity end-to-end through files: many small epochs
    must produce the SAME sketch as one batch over the union — the
    property that lets the stream's estimates inherit the batch
    contract's error bound."""
    from data_pipeline_bigquery_spark.queries.sketches import (
        CMS_CONFIDENCE,
        CMS_EPS,
        CMS_SEED,
    )

    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    sketch_dir = str(tmp_path / "sketch")
    batches = [["x", "y"], ["x"] * 4, ["z"] * 3 + ["y"]]
    fn = make_sketch_batch(sketch_dir)
    for epoch, terms in enumerate(batches):
        fn(spark.createDataFrame([Row(term=t) for t in terms], SCHEMA), epoch)

    union = spark.createDataFrame(
        [Row(term=t) for terms in batches for t in terms], SCHEMA
    )
    raw = union.agg(
        F.count_min_sketch(
            "term", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
        ).alias("s")
    ).collect()[0]["s"]
    jvm = spark._jvm
    one_shot = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(raw))
    )
    streamed = estimate_counts(spark, sketch_dir, ["x", "y", "z"])
    for t in ("x", "y", "z"):
        assert streamed[t] == one_shot.estimateCount(t)


def test_state_swap_is_single_file_atomic(spark, tmp_path):
    """A stale .tmp from a crashed write must not affect reads, and the
    committed state file carries epoch + sketch together (no window
    where one exists without the other)."""
    import os

    from data_pipeline_bigquery_spark.streaming.freq_stream import (
        _read_state,
        _state_path,
        make_sketch_batch,
    )

    sketch_dir = str(tmp_path / "sketch")
    fn = make_sketch_batch(sketch_dir)
    fn(spark.createDataFrame([Row(term="a")] * 3, SCHEMA), 0)
    epoch, sketch_bytes = _read_state(sketch_dir)
    assert epoch == 0 and len(sketch_bytes) > 0

    # simulate a crash mid-write: stale tmp next to good state
    with open(_state_path(sketch_dir) + ".tmp", "wb") as fh:
        fh.write(b"partial garbage")
    assert estimate_counts(spark, sketch_dir, ["a"]) == {"a": 3}

    # next successful epoch replaces cleanly and bumps the epoch header
    fn(spark.createDataFrame([Row(term="a")] * 2, SCHEMA), 1)
    epoch2, _ = _read_state(sketch_dir)
    assert epoch2 == 1
    assert estimate_counts(spark, sketch_dir, ["a"]) == {"a": 5}


def test_streaming_heavy_hitters_track_exact_top(spark, tmp_path):
    """Across epochs the candidate set + cumulative sketch must
    surface the true global top terms — including a term that is cold
    early and spikes later — and replayed epochs must leave both the
    sketch and candidates untouched."""
    from data_pipeline_bigquery_spark.streaming.freq_stream import (
        make_topk_batch,
        top_terms,
    )

    sketch_dir = str(tmp_path / "s")
    fn = make_topk_batch(sketch_dir, max_candidates=5)

    def batch(terms):
        return spark.createDataFrame([Row(term=t) for t in terms], SCHEMA)

    fn(batch(["a"] * 10 + ["b"] * 3 + ["x", "y", "z"]), 0)
    fn(batch(["late"] * 20 + ["a"] * 2), 1)      # late spiker enters here
    fn(batch(["b"] * 9 + ["late"] * 1), 2)

    top = top_terms(spark, sketch_dir, k=3)
    # exact totals: late=21, a=12, b=12 — ties break lexicographically
    assert top == [("late", 21), ("a", 12), ("b", 12)]

    before = top_terms(spark, sketch_dir, k=5)
    fn(batch(["a"] * 100), 1)  # replay of an applied epoch
    assert top_terms(spark, sketch_dir, k=5) == before
