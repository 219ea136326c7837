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


def test_count_min_sketch_overestimates_and_merges(spark):
    """The CMS contract's two load-bearing properties, numerically:
    (1) one-sided error — estimate >= exact for every term; (2)
    mergeability — two half-corpus sketches merged cell-wise give the
    SAME estimates as one full-corpus sketch (what makes the map-side
    partial aggregation correct at any partition count)."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_spark.queries.sketches import (
        CMS_CONFIDENCE,
        CMS_EPS,
        CMS_SEED,
    )

    words = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    exact = {
        r["term"]: r["n"]
        for r in words.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    def sketch(df):
        raw = df.agg(
            F.count_min_sketch(
                "term", F.lit(CMS_EPS), F.lit(CMS_CONFIDENCE), F.lit(CMS_SEED)
            ).alias("s")
        ).collect()[0]["s"]
        jvm = spark._jvm
        return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(raw))
        )

    full = sketch(words)
    n_total = sum(exact.values())
    for term, n in exact.items():
        est = full.estimateCount(term)
        assert n <= est <= n + CMS_EPS * n_total, (term, n, est)

    half_a = sketch(words.filter(F.col("doc_id") % 2 == 0))
    half_b = sketch(words.filter(F.col("doc_id") % 2 == 1))
    half_a.mergeInPlace(half_b)
    for term in exact:
        assert half_a.estimateCount(term) == full.estimateCount(term), term


def test_hll_union_equals_direct_sketch(spark):
    """Reaggregation soundness: unioning per-type sketches gives the
    SAME estimate as sketching the union directly — the invariant that
    lets a rollup serve every grain from the finest sketch table."""
    from pyspark.sql import functions as F

    ev = load(spark, SF_DIR, "events")
    fine = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    unioned = fine.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).collect()[0]["n"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    # exact equality holds in coupon mode (small fixture); dense-mode
    # HLL can diverge by estimator choice (HIP vs composite), so the
    # stated invariant is agreement within the sketch's error band
    assert abs(unioned - direct) <= max(1, 0.01 * direct)


def test_hll_audience_overlap_disjoint_and_identical(spark, tmp_path):
    import datetime as dt

    from data_pipeline_bigquery_spark.queries.sketches import (
        _hll_audience_overlap,
    )

    # types A and B share no users; types A and C share ALL users —
    # the inclusion-exclusion estimate must land on ~0 and ~n inside
    # the 5%-of-union bound the contract asserts.
    rows = []
    eid = 0
    ts = dt.datetime(2024, 5, 1, 12, 0)
    for u in range(200):
        rows.append((eid, ts, u, "A", 1.0, "{}")); eid += 1
        rows.append((eid, ts, u, "C", 1.0, "{}")); eid += 1
    for u in range(200, 400):
        rows.append((eid, ts, u, "B", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        (r.type_a, r.type_b): r
        for r in _hll_audience_overlap(spark, str(tmp_path)).collect()
    }
    assert got[("A", "B")].exact_inter == 0
    assert got[("A", "C")].exact_inter == 200
    assert all(r.within_bound for r in got.values())
