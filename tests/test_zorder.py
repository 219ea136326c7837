"""Z-order layout (operators/zorder.py): per-file min/max must be tight
on BOTH dimensions, where a single-column sort is tight on one only."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.operators.zorder import zorder_layout


@pytest.fixture(scope="module")
def spark():
    from data_pipeline_bigquery_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def _grid(spark, n=64):
    # n x n grid: x and y are independent, the worst case for 1-D sorting
    return (
        spark.range(n * n)
        .select((F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
    )


def _avg_span(spark, path, col, global_span):
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name())
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .first()[0]
    )
    return per_file / global_span


def test_zorder_tight_on_both_dims(spark, tmp_path):
    df = _grid(spark)
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(df, ["x", "y"], n_files=16).write.parquet(zpath)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    # 16 files over a 64x64 grid: ideal z-order tiles are 16x16
    # (span fraction 0.25); 1-D sort leaves y unclustered (fraction ~1)
    assert _avg_span(spark, zpath, "x", 63) < 0.5
    assert _avg_span(spark, zpath, "y", 63) < 0.5
    assert _avg_span(spark, spath, "y", 63) > 0.9


def test_zorder_preserves_rows(spark, tmp_path):
    df = _grid(spark, n=32)
    out = zorder_layout(df, ["x", "y"], n_files=4)
    assert out.count() == 32 * 32
    assert out.columns == ["x", "y"]
    assert out.agg(F.sum(F.col("x") * 1000 + F.col("y"))).first()[0] == \
        df.agg(F.sum(F.col("x") * 1000 + F.col("y"))).first()[0]
