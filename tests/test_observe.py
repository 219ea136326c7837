"""Observation metrics: audit numbers ride the load job itself."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from data_pipeline_bigquery_spark.operators.observe import (
    observed,
    standard_load_metrics,
)


def test_metrics_piggyback_on_the_write(spark, tmp_path):
    df = spark.createDataFrame(
        [
            Row(pk="a", cursor=dt.datetime(2024, 1, 1), v=1),
            Row(pk=None, cursor=dt.datetime(2024, 1, 2), v=2),
            Row(pk="c", cursor=dt.datetime(2024, 1, 3), v=3),
        ]
    )
    out, obs = observed(df, "load_audit", standard_load_metrics("pk", "cursor"))
    out.write.mode("overwrite").parquet(str(tmp_path / "t"))  # the ONE action
    got = obs.get
    assert got["n_rows"] == 3
    assert got["null_pk"] == 1
    assert got["max_cursor"] == dt.datetime(2024, 1, 3)
