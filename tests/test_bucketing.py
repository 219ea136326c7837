"""Bucketed co-located join: when both sides are bucketed on the join
key, Spark's planner skips the shuffle entirely — the 100 TB strategy
for the fact-to-fact joins (orders ⋈ lineitem) that no broadcast can
cover.  The assertion is plan-level: NO Exchange above either scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
    )
    lineitem = spark.range(4000).select(
        (F.col("id") % 1000).alias("l_orderkey"), (F.col("id") % 50).alias("l_qty")
    )
    from data_pipeline_bigquery_spark.sources.lake import write_bucketed

    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", lineitem, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table path keeps bucket data in the test's tmp dir
        write_bucketed(df, name, key, n_buckets=8, path=str(tmp_path / name))
    yield
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).groupBy(
            "o_flag"
        ).agg(F.sum("l_qty").alias("qty"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        # the join's children read bucketed files directly: the only
        # Exchange allowed is the final aggregation's
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in join_part
        # correctness unchanged
        total = joined.agg(F.sum("qty")).first()[0]
        expected = 4000 / 50 * sum(range(50))  # each qty value appears 80×
        assert total == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
