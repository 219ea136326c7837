"""Lake compaction (sources/lake.py::compact_lake)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.lake import compact_lake


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_bigquery_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _fragmented_lake(spark, path, n_appends=8):
    for i in range(n_appends):
        (
            spark.range(i * 1000, (i + 1) * 1000)
            .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
            .repartition(4)
            .write.mode("append")
            .parquet(path)
        )


def test_compacts_to_sized_files(spark, tmp_path):
    path = str(tmp_path / "lake")
    _fragmented_lake(spark, path)  # 8 appends x 4 files
    before = spark.read.parquet(path)
    n_rows, checksum = before.count(), before.agg(F.sum("k")).first()[0]

    n_files = compact_lake(spark, path, target_file_mb=512)
    assert n_files == 1  # tiny lake -> one right-sized file

    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum("k")).first()[0] == checksum


def test_sorted_compaction_clusters_ranges(spark, tmp_path):
    path = str(tmp_path / "lake")
    _fragmented_lake(spark, path)
    compact_lake(spark, path, target_file_mb=0.02, sort_col="k")  # force >1 file

    # range-partitioned rewrite: per-file key ranges must not overlap
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(per_file) > 1
    for prev, cur in zip(per_file, per_file[1:]):
        assert prev.hi < cur.lo
