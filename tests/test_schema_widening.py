"""Type WIDENING across lake file generations (int32 → int64, float →
double): the other schema-drift reality `schema_evolution_scan` (added
columns) doesn't cover.  mergeSchema cannot reconcile conflicting
physical types — the catalog-pinned explicit schema is the path that
works, upcasting narrow files on read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _write_generations(spark, base):
    gen1 = spark.range(0, 5).select(
        F.col("id").cast("int").alias("k"),
        F.lit(1.5).cast("float").alias("v"),
    )
    gen2 = spark.range(5, 10).select(
        F.col("id").cast("long").alias("k"),
        F.lit(2.5).cast("double").alias("v"),
    )
    gen1.write.parquet(f"{base}/g1")
    gen2.write.parquet(f"{base}/g2")


def test_catalog_schema_upcasts_narrow_generations(spark, tmp_path):
    _write_generations(spark, str(tmp_path))
    df = spark.read.schema("k long, v double").parquet(
        f"{tmp_path}/g1", f"{tmp_path}/g2"
    )
    rows = df.orderBy("k").collect()
    assert [r.k for r in rows] == list(range(10))
    assert rows[0].v == 1.5 and rows[-1].v == 2.5
    assert dict(df.dtypes) == {"k": "bigint", "v": "double"}


def test_merge_schema_cannot_reconcile_type_conflict(spark, tmp_path):
    """Documents WHY the catalog pin matters: schema merging on
    conflicting physical types fails rather than widening."""
    _write_generations(spark, str(tmp_path))
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        (
            spark.read.option("mergeSchema", "true")
            .parquet(f"{tmp_path}/g1", f"{tmp_path}/g2")
            .collect()
        )
