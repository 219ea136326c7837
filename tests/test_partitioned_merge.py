"""Partition-pruned MERGE (dynamic partition overwrite): only touched
partitions are read or rewritten; untouched partition files stay
byte-identical on disk."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.lake import merge_partitioned


def _listing(path: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    target = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [
            Row(pk=1, day="2024-01-01", v="a", ver=1),
            Row(pk=2, day="2024-01-01", v="b", ver=1),
            Row(pk=3, day="2024-01-02", v="c", ver=1),
            Row(pk=4, day="2024-01-03", v="d", ver=1),
        ]
    )
    base.write.partitionBy("day").parquet(target)
    before = {
        p: s for p, s in _listing(target).items() if "day=2024-01-02" in p or "day=2024-01-03" in p
    }

    batch = spark.createDataFrame(
        [
            Row(pk=2, day="2024-01-01", v="B2", ver=2),  # update
            Row(pk=9, day="2024-01-01", v="new", ver=1),  # insert
        ]
    )
    merge_partitioned(spark, batch, target, pk="pk", partition_col="day", order_col="ver")

    after_all = spark.read.parquet(target)
    got = {r.pk: (r.v, r.ver) for r in after_all.collect()}
    assert got == {
        1: ("a", 1),
        2: ("B2", 2),
        3: ("c", 1),
        4: ("d", 1),
        9: ("new", 1),
    }
    # untouched partitions: identical files, byte for byte + mtime
    after = {
        p: s for p, s in _listing(target).items() if "day=2024-01-02" in p or "day=2024-01-03" in p
    }
    assert after == before
