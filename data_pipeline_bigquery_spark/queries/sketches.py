"""Sketch-based approximate aggregation — the 100 TB answer to exact
distinct counts and percentiles.

At lake scale, exact ``count(DISTINCT user)`` shuffles every distinct
key and exact percentiles shuffle every value; the sketch forms
(HyperLogLog++ for distinct, Greenwald-Khanna for quantiles — both
built into Spark) keep a bounded few-KB summary per partition and merge
map-side, so the shuffle carries sketches, not data.  Accuracy is
engine-specific (HLL++ vs DuckDB's sketch differ in the low digits), so
these register rows-only; the error bound vs the exact answer is gated
in ``tests/test_sketches.py`` instead.

Reference parity: the reference counts rows exactly and has no
percentile surface (SURVEY §2.5); sketches are scale-out extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.catalog import load
from data_pipeline_bigquery_spark.queries import QuerySpec


def approx_distinct_daily(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Distinct users per day via HLL++ (relative std dev ``rsd``).
    One shuffle of per-partition sketches keyed on day."""
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .orderBy("day")
    )


def approx_price_percentiles(lineitem: DataFrame, accuracy: int = 10_000) -> DataFrame:
    """p50/p95/p99 of extended price per return flag via the GK quantile
    sketch (rank error <= 1/accuracy)."""
    pct = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), accuracy
    )
    return (
        lineitem.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )


def _approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_distinct_daily(load(spark, sf_dir, "events"))


def _approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return approx_price_percentiles(load(spark, sf_dir, "lineitem"))


QUERIES: dict[str, QuerySpec] = {
    "approx_distinct_daily": QuerySpec(_approx_distinct, None),
    "approx_price_percentiles": QuerySpec(_approx_percentiles, None),
}
