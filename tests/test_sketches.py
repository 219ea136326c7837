"""Sketch accuracy gates: approx answers must sit within their error
bounds of the exact answers, and the plan must merge sketches map-side
(partial aggregation) rather than shuffling raw rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries.sketches import (
    approx_distinct_daily,
    approx_price_percentiles,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    ev = load(spark, SF_DIR, "events")
    approx = {r.day: r.approx_users for r in approx_distinct_daily(ev, rsd=0.02).collect()}
    exact = {
        r.day: r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(3, 0.06 * n), (day, approx[day], n)


def test_gk_percentiles_within_rank_error(spark):
    li = load(spark, SF_DIR, "lineitem")
    approx = {r.l_returnflag: r for r in approx_price_percentiles(li).collect()}
    for flag, row in approx.items():
        vals = sorted(
            r.l_extendedprice
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, got in (("p50", row.p50), ("p95", row.p95), ("p99", row.p99)):
            target = float(q[1:]) / 100
            # rank of the returned value must be within 1% of target rank
            import bisect

            rank = bisect.bisect_right(vals, got) / n
            assert abs(rank - target) <= 0.02, (flag, q, rank, target)
        assert row.p50 <= row.p95 <= row.p99


def test_sketches_aggregate_partially(spark):
    """Both plans must show a partial aggregation before the exchange —
    the sketch merges map-side; the shuffle carries sketches."""
    ev = load(spark, SF_DIR, "events")
    plan = approx_distinct_daily(ev)._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan
    li = load(spark, SF_DIR, "lineitem")
    plan2 = approx_price_percentiles(li)._jdf.queryExecution().executedPlan().toString()
    assert "partial_percentile_approx" in plan2
