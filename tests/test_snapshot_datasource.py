"""sources/snapshot_datasource.py: the snapshot store as a Spark data
source — batch latest-scan and the exactly-once version change feed."""

from __future__ import annotations

import pytest

from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
    SnapshotDataSource,
)
from data_pipeline_bigquery_spark.sources.snapshots import write_snapshot

DDL = "k long, v string, _version long"


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(SnapshotDataSource)
    return spark


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _store(spark, tmp_path, name="snapds"):
    base = str(tmp_path / name)
    write_snapshot(_df(spark, [(1, "a"), (2, "b")]), base)
    write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), base)
    return base


def test_batch_reads_latest_version(registered, tmp_path):
    spark = registered
    base = _store(spark, tmp_path)
    got = (
        spark.read.format("snapshotstore")
        .schema(DDL)
        .option("path", base)
        .load()
        .collect()
    )
    assert {(r.k, r.v, r._version) for r in got} == {(1, "a2", 2), (3, "c", 2)}


def test_stream_emits_each_version_once_and_picks_up_new(
    registered, tmp_path
):
    spark = registered
    base = _store(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def sink(batch, _epoch):
        if batch.count():
            batch.write.mode("append").parquet(out)

    def run():
        q = (
            spark.readStream.format("snapshotstore")
            .schema(DDL)
            .option("path", base)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    got = {(r.k, r.v, r._version) for r in spark.read.parquet(out).collect()}
    assert got == {
        (1, "a", 1), (2, "b", 1),  # v1 in full
        (1, "a2", 2), (3, "c", 2),  # v2 in full
    }

    # a third commit arrives; a RESTARTED stream (same checkpoint) must
    # emit ONLY the new version — no replays of v1/v2
    write_snapshot(_df(spark, [(9, "z")]), base)
    run()
    got = spark.read.parquet(out).collect()
    assert len(got) == 5
    assert {(r.k, r.v, r._version) for r in got if r._version == 3} == {
        (9, "z", 3)
    }


def test_uncommitted_versions_invisible_to_the_feed(registered, tmp_path):
    spark = registered
    base = _store(spark, tmp_path, "snapds2")
    # a marker-less dir (crashed writer / foreign junk) must not appear
    _df(spark, [(99, "junk")]).write.parquet(f"{base}/v=3")
    got = (
        spark.read.format("snapshotstore")
        .schema(DDL)
        .option("path", base)
        .load()
        .collect()
    )
    assert {r._version for r in got} == {2}
    assert 99 not in {r.k for r in got}


def test_stream_reads_partitioned_versions(registered, tmp_path):
    """Hive-partitioned versions flow through the feed with partition
    columns reconstructed from the path segments."""
    spark = registered
    base = str(tmp_path / "snapds_part")
    df = spark.createDataFrame(
        [(1, "a", 2023), (2, "b", 2024)], "k long, v string, year long"
    )
    write_snapshot(df, base, partition_by=["year"])
    got = (
        spark.read.format("snapshotstore")
        .schema("k long, v string, year long, _version long")
        .option("path", base)
        .load()
        .collect()
    )
    assert {(r.k, r.v, r.year, r._version) for r in got} == {
        (1, "a", 2023, 1),
        (2, "b", 2024, 1),
    }
