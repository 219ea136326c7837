"""Salted operators must be row-identical to their naive forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", i * 1.0) for i in range(1000)],
        "id long, k string, v double",
    ).withColumn("v_dec", F.col("v").cast("decimal(18,2)"))
    plain = {
        (r.k): (float(r.s), r.c)
        for r in df.groupBy("k").agg(F.sum("v_dec").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    salted = {
        (r.k): (float(r.s), r.c)
        for r in salted_aggregate(
            df, ["k"], {"v_dec": "s"}, count_alias="c", salt_unique_col="id"
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 5 else f"k{i}") for i in range(500)], "id long, k string"
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k5", 2), ("k10", 3)], "k string, payload int"
    )
    plain = sorted((r.id, r.payload) for r in left.join(right, "k").collect())
    salted = sorted(
        (r.id, r.payload)
        for r in salted_join(left, right, "k", left_unique_col="id", salt_n=8).collect()
    )
    assert plain == salted
