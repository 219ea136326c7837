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


def test_replay_gap_after_retention_raises_not_silent(spark, tmp_path):
    """Review finding: crash-recovery replay of a planned batch whose
    version was expired by retention must raise, not commit empty."""
    import pytest
    from pyspark.sql.types import StructType

    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        SnapshotStreamReader,
    )
    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snapds_gap")
    write_snapshot(_df(spark, [(1, "a")]), base)
    write_snapshot(_df(spark, [(2, "b")]), base)
    schema = (
        spark.createDataFrame([], "k long, v string, _version long").schema
    )
    assert isinstance(schema, StructType)
    reader = SnapshotStreamReader(schema, {"path": base})
    rows, end = reader.read(reader.initialOffset())
    assert end["versions"] == [1, 2]
    assert len(list(rows)) == 2
    # retention expires v1 between planning and crash recovery
    expire_snapshots(spark, base, keep_last=1)
    with pytest.raises(RuntimeError, match="replay gap.*\\[1\\]"):
        list(reader.readBetweenOffsets(reader.initialOffset(), end))
    # an intact window still replays fine
    assert (
        len(list(reader.readBetweenOffsets({"version": 1}, {"version": 2, "versions": [2]})))
        == 1
    )


def test_string_partition_values_keep_leading_zeros(registered, tmp_path):
    """Review finding: hive path values must be typed by the DECLARED
    schema — a string partition column holding '007' must come back as
    the string '007', not int 7."""
    spark = registered
    base = str(tmp_path / "snapds_str")
    write_snapshot(
        spark.createDataFrame([(1, "007"), (2, "042")], "k long, code string"),
        base,
        partition_by=["code"],
    )
    got = (
        spark.read.format("snapshotstore")
        .schema("k long, code string, _version long")
        .option("path", base)
        .load()
        .collect()
    )
    assert {(r.k, r.code) for r in got} == {(1, "007"), (2, "042")}


def test_remote_scheme_rejected_loudly(registered, tmp_path):
    import pytest

    spark = registered
    with pytest.raises(Exception, match="local paths only"):
        (
            spark.read.format("snapshotstore")
            .schema(DDL)
            .option("path", "hdfs://nn/store")
            .load()
            .collect()
        )


def test_date_timestamp_decimal_partition_values_typed(registered, tmp_path):
    """ADVICE r07: partitioning a version by date/timestamp/decimal (the
    natural lake layouts) must reconstruct TYPED partition values from
    the hive path segments, not leak raw strings into typed columns."""
    import datetime as dt
    from decimal import Decimal

    spark = registered
    base = str(tmp_path / "snapds_dt")
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5), Decimal("1.25")),
            (2, dt.date(2024, 1, 3), dt.datetime(2024, 1, 3, 6, 7, 8), Decimal("2.50")),
        ],
        "k long, d date, ts timestamp, amt decimal(10,2)",
    )
    write_snapshot(df, base, partition_by=["d", "ts", "amt"])
    got = (
        spark.read.format("snapshotstore")
        .schema("k long, d date, ts timestamp, amt decimal(10,2), _version long")
        .option("path", base)
        .load()
        .collect()
    )
    assert {(r.k, r.d, r.ts, r.amt) for r in got} == {
        (1, dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5), Decimal("1.25")),
        (2, dt.date(2024, 1, 3), dt.datetime(2024, 1, 3, 6, 7, 8), Decimal("2.50")),
    }


def test_hive_null_partition_sentinel_maps_to_none(registered, tmp_path):
    """A NULL partition value lands as __HIVE_DEFAULT_PARTITION__ on the
    path; the reader must map it back to None, not crash int()."""
    spark = registered
    base = str(tmp_path / "snapds_null")
    df = spark.createDataFrame(
        [(1, "a", 2023), (2, "b", None)], "k long, v string, year int"
    )
    write_snapshot(df, base, partition_by=["year"])
    got = (
        spark.read.format("snapshotstore")
        .schema("k long, v string, year int, _version long")
        .option("path", base)
        .load()
        .collect()
    )
    assert {(r.k, r.year) for r in got} == {(1, 2023), (2, None)}


def test_unsupported_partition_type_raises_descriptively():
    """An unhandled declared partition type must raise a descriptive
    error, not silently hand a raw string to row conversion."""
    from pyspark.sql import types as T

    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        _typed_partition_value,
    )

    with pytest.raises(ValueError, match="unsupported partition-column type"):
        _typed_partition_value(
            "m", "keyA->1", {"m": T.MapType(T.StringType(), T.LongType())}
        )


def test_late_publish_below_offset_fails_loudly(spark, tmp_path):
    """ADVICE r08: a stalled multi-writer can publish version N after
    the stream's offset already advanced past N (one-RPC pre-rename
    window); without detection the reader skips N's rows FOREVER and
    silently.  The cumulative emitted_count in the offset turns that
    into a loud failure — while retention expiry (which only shrinks
    the at-or-below-offset count) stays benign."""
    import os
    import shutil

    import pytest

    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        SnapshotStreamReader,
    )
    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snapds_late")
    write_snapshot(_df(spark, [(1, "a")]), base)
    write_snapshot(_df(spark, [(2, "b")]), base)
    write_snapshot(_df(spark, [(3, "c")]), base)
    schema = (
        spark.createDataFrame([], "k long, v string, _version long").schema
    )
    reader = SnapshotStreamReader(schema, {"path": base})

    # simulate the stall: hide v2 (writer reserved it but hasn't
    # renamed yet), stream v1 and v3, then let v2 land late
    hidden = str(tmp_path / "stalled_v2")
    shutil.move(os.path.join(base, "v=2"), hidden)
    rows, end = reader.read(reader.initialOffset())
    assert end["versions"] == [1, 3]
    assert end["emitted_count"] == 2
    assert len(list(rows)) == 2
    # no new versions: offset (incl. counter) is stable, no false alarm
    rows, same = reader.read(end)
    assert list(rows) == [] and same["emitted_count"] == 2

    shutil.move(hidden, os.path.join(base, "v=2"))  # the late publish
    with pytest.raises(RuntimeError, match="late publish"):
        reader.read(same)

    # retention expiry must NOT false-positive: fresh stream over the
    # full store, then expire the oldest already-emitted version
    reader2 = SnapshotStreamReader(schema, {"path": base})
    rows, end2 = reader2.read(reader2.initialOffset())
    assert len(list(rows)) == 3 and end2["emitted_count"] == 3
    expire_snapshots(spark, base, keep_last=2)
    rows, end3 = reader2.read(end2)
    assert list(rows) == [] and end3["emitted_count"] == 3

    # legacy checkpoint without the counter: check skipped, no raise
    rows, _ = reader2.read({"version": end2["version"]})
    assert list(rows) == []


def test_late_publish_not_masked_by_same_interval_expiry(spark, tmp_path):
    """ADVICE r09: the count-based check could be masked when a
    retention expiry removed an at-or-below-offset version in the SAME
    poll interval as a late publish (shrink offsets the growth).  The
    offset now carries the exact known-below version set, so the late
    version is caught by set difference regardless of expiry."""
    import os
    import shutil

    import pytest

    from data_pipeline_bigquery_spark.sources.snapshot_datasource import (
        SnapshotStreamReader,
    )
    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snapds_mask")
    for payload in [(1, "a"), (2, "b"), (3, "c"), (4, "d")]:
        write_snapshot(_df(spark, [payload]), base)
    schema = (
        spark.createDataFrame([], "k long, v string, _version long").schema
    )
    reader = SnapshotStreamReader(schema, {"path": base})

    hidden = str(tmp_path / "stalled_v2")
    shutil.move(os.path.join(base, "v=2"), hidden)
    rows, end = reader.read(reader.initialOffset())
    assert end["versions"] == [1, 3, 4]
    assert end["below_versions"] == [1, 3, 4]
    assert len(list(rows)) == 3

    # same interval: v1 expires AND v2 lands late — counts cancel
    # (3 committed at-or-below vs emitted_count 3), set diff does not
    expire_snapshots(spark, base, keep_last=2)
    shutil.move(hidden, os.path.join(base, "v=2"))
    with pytest.raises(RuntimeError, match=r"late publish.*\[2\]"):
        reader.read(end)

    # and a pure expiry (no late publish) stays benign, with the
    # carried set pruned to retention
    base2 = str(tmp_path / "snapds_prune")
    for payload in [(1, "a"), (2, "b"), (3, "c")]:
        write_snapshot(_df(spark, [payload]), base2)
    r2 = SnapshotStreamReader(schema, {"path": base2})
    rows, e2 = r2.read(r2.initialOffset())
    assert len(list(rows)) == 3 and e2["below_versions"] == [1, 2, 3]
    expire_snapshots(spark, base2, keep_last=1)
    rows, e3 = r2.read(e2)
    assert list(rows) == [] and e3["below_versions"] == [3]
