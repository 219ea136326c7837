"""Streaming Croston monitor: the final per-key emission converges to
the batch key's row regardless of batch boundaries, replays of already-
folded days are no-ops, and the >30-demand truncation matches."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import datetime as dt

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries import analytics12
from data_pipeline_bigquery_spark.streaming.croston_stream import (
    croston_stateful,
    shift_sum,
)

SCHEMA = "user_id long, day_epoch long, cents long"


def _run_stream(spark, in_dir, name, one_file_per_batch=True):
    reader = spark.readStream.schema(SCHEMA)
    if one_file_per_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    q = (
        croston_stateful(reader.parquet(str(in_dir)))
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


def _latest(rows):
    out = {}
    for r in rows:
        if r.user_id not in out or r.n_demands > out[r.user_id].n_demands:
            out[r.user_id] = r
    return out


def test_stream_converges_to_batch_key(spark, tmp_path):
    # the SAME purchase history the batch key reads, split over two
    # files → two micro-batches with a mid-history boundary
    demands = {
        1: [(0, 1000), (3, 2000), (4, 500), (10, 4000)],
        2: [(5, 700)],
    }
    events, eid = [], 0
    for uid, ds in demands.items():
        for day, cents in ds:
            events.append((
                eid, dt.datetime(2024, 1, 1 + day, 9), uid,
                "purchase", cents / 100.0,
            ))
            eid += 1
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    batch = {r.user_id: r for r in analytics12.QUERIES[
        "croston_intermittent_forecast"].fn(spark, str(tmp_path)).collect()}

    in_dir = tmp_path / "feed"
    epoch0 = dt.date(2024, 1, 1).toordinal()
    rows = [
        (uid, epoch0 + day, cents)
        for uid, ds in demands.items()
        for day, cents in ds
    ]
    spark.createDataFrame(rows[:3], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    spark.createDataFrame(rows[3:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    got = _latest(_run_stream(spark, in_dir, "croston_conv"))
    assert set(got) == set(batch)
    for uid, b in batch.items():
        g = got[uid]
        assert (g.n_demands, g.z30, g.p30) == (b.n_demands, b.z30, b.p30)
        if b.croston_rate is None:
            assert g.croston_rate is None
        else:
            assert g.croston_rate == b.croston_rate


def test_replayed_days_are_noops(spark, tmp_path):
    in_dir = tmp_path / "feed"
    rows = [(7, 100, 500), (7, 102, 700)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    # re-deliver the SAME days (at-least-once), plus one genuinely new
    spark.createDataFrame(
        rows + [(7, 105, 900)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    got = _latest(_run_stream(spark, in_dir, "croston_replay"))
    r = got[7]
    assert r.n_demands == 3
    assert r.z30 == shift_sum([500, 700, 900])
    assert r.p30 == shift_sum([2, 3])


def test_truncation_window_matches_batch_form(spark, tmp_path):
    in_dir = tmp_path / "feed"
    rows = [(9, 200 + 2 * i, 300) for i in range(40)]  # 40 demands
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    got = _latest(_run_stream(spark, in_dir, "croston_trunc",
                              one_file_per_batch=False))
    r = got[9]
    assert r.n_demands == 40
    # saturated constant window: Σ 2^(i-1) = 2^30 − 1
    assert r.z30 == 300 * ((1 << 30) - 1)
    assert r.p30 == 2 * ((1 << 30) - 1)
    assert r.croston_rate == 150.0


def test_zero_cents_days_and_pure_replays_ignored(spark, tmp_path):
    in_dir = tmp_path / "feed"
    rows = [(3, 50, 400), (3, 52, 0), (3, 55, 600)]  # zero-demand day
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    got = _run_stream(spark, in_dir, "croston_zero",
                      one_file_per_batch=False)
    r = _latest(got)[3]
    # the zero day neither counts nor breaks the gap (batch-twin rule)
    assert r.n_demands == 2
    assert r.z30 == shift_sum([400, 600])
    assert r.p30 == shift_sum([5])
    # a pure-replay batch emits NOTHING for the key
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    got2 = _run_stream(spark, in_dir, "croston_zero2",
                       one_file_per_batch=True)
    # fresh query replays the whole feed: batch1 folds, batch2 is all
    # replays → exactly ONE emission for the key
    assert len([r for r in got2 if r.user_id == 3]) == 1


def test_same_day_first_wins_regardless_of_boundary(spark, tmp_path):
    # the same content split differently must land in the same state
    rows = [(4, 80, 100), (4, 80, 999), (4, 83, 300)]
    one = tmp_path / "one"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(one))
    split = tmp_path / "split"
    spark.createDataFrame(rows[:1], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(split))
    spark.createDataFrame(rows[1:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(split))
    a = _latest(_run_stream(spark, one, "croston_one",
                            one_file_per_batch=False))[4]
    b = _latest(_run_stream(spark, split, "croston_split"))[4]
    assert (a.n_demands, a.z30, a.p30) == (b.n_demands, b.z30, b.p30)
    assert a.z30 == shift_sum([100, 300])  # first value for day 80 won


def test_shift_sum_int64_envelope_boundary(spark, tmp_path):
    # envelope: z30 <= max_cents * (2^30 - 1); max_cents = 2^33 keeps
    # the saturated sum under 2^63 - 1 (ANSI Spark THROWS on overflow,
    # so crossing the envelope is loud, not wrong).  ~$86M/day per key
    # is the documented ceiling before rescaling units.
    big = 1 << 33
    assert shift_sum([big] * 30) == big * ((1 << 30) - 1)
    assert shift_sum([big] * 30) < (1 << 63) - 1
    # and the Spark side computes the identical boundary value
    rows = [(11, 300 + i, big) for i in range(30)]
    in_dir = tmp_path / "feed"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(in_dir))
    r = _latest(_run_stream(spark, in_dir, "croston_envelope",
                            one_file_per_batch=False))[11]
    assert r.z30 == big * ((1 << 30) - 1)


def test_restart_resume_carries_state(spark, tmp_path):
    """Stop after the first demand days, deliver more, restart from
    the same checkpoint: the resumed query must continue the SAME
    gap/size history (a state-losing resume would restart n_demands
    and gaps from scratch)."""
    in_dir, out_dir, ckpt = (
        tmp_path / "cr_in",
        tmp_path / "cr_out",
        tmp_path / "cr_ckpt",
    )

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(in_dir))

        def sink(batch, _epoch):
            if batch.count():
                batch.write.mode("append").parquet(str(out_dir))

        q = (
            croston_stateful(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    spark.createDataFrame(
        [(21, 400, 1000), (21, 403, 2000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_once()
    spark.createDataFrame(
        [(21, 407, 3000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(in_dir))
    run_once()
    rows = spark.read.parquet(str(out_dir)).collect()
    final = max(rows, key=lambda r: r.n_demands)
    assert final.n_demands == 3
    # gaps [3, 4] prove the pre-restart history survived the resume
    assert final.p30 == shift_sum([3, 4])
    assert final.z30 == shift_sum([1000, 2000, 3000])
