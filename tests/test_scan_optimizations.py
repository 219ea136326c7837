"""Plan-level guarantees: predicate pushdown reaches the parquet scan,
partition pruning reaches the directory listing, and the REST spill
scan stages bounded batches that Spark re-reads as a partitioned scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.lake import read_year_partitions, write_lake
from data_pipeline_bigquery_spark.sources.rest import FakeTransport, RestSource


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    ).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("bucket") > 3).select("id")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(bucket), GreaterThan(bucket,3)]" in plan
    # column pruning: the scan's read schema is just the two needed cols
    assert "ReadSchema" in plan and "struct<id:bigint,bucket:bigint>" in plan


def test_year_partition_pruning(spark, tmp_path):
    p = str(tmp_path / "lake")
    df = spark.range(100).select(
        F.col("id"), (2020 + F.col("id") % 4).cast("int").alias("year")
    )
    write_lake(df, p, mode="overwrite", partition_by=("year",))
    pruned = read_year_partitions(spark, p, 2021, 2022)
    plan = _formatted(pruned)
    # the year range lands in PartitionFilters, i.e. directories are
    # pruned before any parquet footer is opened
    assert "PartitionFilters" in plan
    assert "year#" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.select("year").distinct().count() == 2


def test_rest_spill_scan(spark, tmp_path):
    records = [{"id": i, "v": f"r{i}"} for i in range(250)]
    scan = RestSource(FakeTransport(records, page_size=40), "http://fake/objects")
    staging = str(tmp_path / "staging")
    n = scan.fetch_to_staging(staging, spill_every=60)
    assert n == 250
    df = spark.read.json(staging)
    assert df.count() == 250
    # bounded spill → multiple staged files → a multi-split scan
    assert df.rdd.getNumPartitions() > 1 or len(list(__import__("os").listdir(staging))) >= 4
    assert df.select(F.max("id")).first()[0] == 249


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim must
    prune fact partitions at RUNTIME (dynamicpruning subquery in
    PartitionFilters): the dim filter's surviving keys decide which
    fact directories are listed.  This is the plan shape that keeps a
    date-partitioned 100 TB fact scan proportional to the dim filter,
    not the calendar."""
    from data_pipeline_bigquery_spark.plans.audit import (
        assert_dynamic_partition_pruning,
    )

    fact = str(tmp_path / "fact")
    spark.range(10_000).select(
        F.col("id"), (F.col("id") % 20).alias("day_key"), (F.col("id") * 3).alias("amt")
    ).write.partitionBy("day_key").parquet(fact)
    dim = str(tmp_path / "dim")
    spark.range(20).select(
        F.col("id").alias("day_key"),
        F.when(F.col("id") < 2, "hot").otherwise("cold").alias("tier"),
    ).write.parquet(dim)

    f = spark.read.parquet(fact)
    d = spark.read.parquet(dim).filter(F.col("tier") == "hot")
    joined = f.join(d, "day_key").groupBy("day_key").agg(F.sum("amt").alias("total"))
    assert_dynamic_partition_pruning(joined)
    rows = {r.day_key: r.total for r in joined.collect()}
    assert set(rows) == {0, 1}  # only the two hot partitions survive


def test_parquet_aggregate_pushdown_footer_only(spark):
    """COUNT/MIN/MAX can be answered from parquet FOOTER statistics
    alone under the DSv2 reader (spark.sql.parquet.aggregatePushdown)
    — the 100 TB lever for metadata-grade queries: row-group stats,
    zero data pages.  Pinned here because it silently needs BOTH the
    v2 source and the flag; under defaults the same query scans data."""
    import re

    from pyspark.sql import functions as F

    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PushedAggregation: \[([^\]]*)\]", plan)
        assert m, plan[:500]
        assert "COUNT(*)" in m.group(1)
        assert "MIN(l_quantity)" in m.group(1)
        row = agg.first()
        assert row.n > 0 and row.mn == 1.0 and row.mx == 50.0
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
