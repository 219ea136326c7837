"""Streaming seasonal monitor: the final emission converges to the
batch key's decomposition wherever the micro-batch boundaries fall,
and replayed days are no-ops."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

import datetime as dt

from data_pipeline_bigquery_spark.queries import analytics19
from data_pipeline_bigquery_spark.streaming.seasonal_stream import (
    decompose_days,
    seasonal_monitor,
)
from tests.test_analytics19_20_edges import _edge_dir, _events

SCHEMA = "day_epoch long, cents long"
_EPOCH = dt.date(1970, 1, 1)


def _run_stream(spark, in_dir, name):
    q = (
        seasonal_monitor(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
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


def _final_curve(rows):
    """Last emission per day (the monitor re-emits the full curve on
    every advancing batch)."""
    best = {}
    for i, r in enumerate(rows):
        best[r.day_epoch] = (i, r)
    return {
        d: (r.cents, r.wd, r.trend_mc, r.seasonal_mc, r.residual_mc)
        for d, (_, r) in best.items()
    }


def _daily_feed(spark, tmp_path, day_cents, n_files):
    feed = tmp_path / "feed"
    items = sorted(day_cents.items())
    per = max(1, len(items) // n_files)
    for i in range(0, len(items), per):
        spark.createDataFrame(items[i : i + per], SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(str(feed))
    return feed


def test_stream_converges_to_batch_key(spark, tmp_path):
    # 10 observed days (one gap) with distinct values; the batch key
    # reads the SAME series from an events fixture
    base = dt.date(2024, 1, 1)
    day_cents = {}
    rows, eid = [], 0
    for i in [0, 1, 2, 3, 4, 5, 7, 8, 9, 10]:
        d = base + dt.timedelta(days=i)
        value = 10.0 + 3.0 * i
        rows.append((eid, dt.datetime(d.year, d.month, d.day, 9), 1, "view", value))
        eid += 1
        day_cents[(d - _EPOCH).days] = round(value * 100)
    fixture = _edge_dir(tmp_path, events=_events(rows))
    batch = analytics19.QUERIES["seasonal_decompose_additive"].fn(
        spark, fixture
    )
    expect = {
        (r.d.date() - _EPOCH).days
        if isinstance(r.d, dt.datetime)
        else (r.d - _EPOCH).days: (
            r.cents,
            r.wd,
            r.trend_mc,
            r.seasonal_mc,
            r.residual_mc,
        )
        for r in batch.collect()
    }
    feed = _daily_feed(spark, tmp_path, day_cents, n_files=3)
    got = _final_curve(_run_stream(spark, feed, "seasonal_conv"))
    assert got == expect


def test_replayed_days_are_noops(spark, tmp_path):
    day_cents = {19723 + i: 1000 + i for i in range(8)}
    feed = tmp_path / "feed2"
    items = sorted(day_cents.items())
    spark.createDataFrame(items[:5], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    spark.createDataFrame(items[5:], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(feed))
    # replay file: already-folded days with DIFFERENT values — must be
    # discarded first-wins, emitting nothing new
    spark.createDataFrame(
        [(d, c + 999) for d, c in items[:5]], SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(feed))
    rows = _run_stream(spark, feed, "seasonal_replay")
    got = _final_curve(rows)
    assert got == {
        r["day_epoch"]: (
            r["cents"],
            r["wd"],
            r["trend_mc"],
            r["seasonal_mc"],
            r["residual_mc"],
        )
        for r in decompose_days(list(day_cents.items()))
    }
    # exactly two advancing emissions of the full curve — the replay
    # batch added nothing
    assert len(rows) == 5 + 8


def test_decompose_days_model_sanity():
    # 7 consecutive equal days: the single full window's trend is the
    # value itself, detrended 0, seasonal 0 for that weekday, residual 0
    pairs = [(100 + i, 7000) for i in range(7)]
    rows = {r["day_epoch"]: r for r in decompose_days(pairs)}
    mid = rows[103]
    assert mid["trend_mc"] == 7000 * 1000
    assert mid["seasonal_mc"] == 0 and mid["residual_mc"] == 0
    for d in (100, 101, 102, 104, 105, 106):
        assert rows[d]["trend_mc"] is None
