"""sources/snapshots.py: versioned time travel with a commit-marker
protocol, and row-level CDC between arbitrary version pairs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.sources.snapshots import (
    list_versions,
    read_snapshot,
    snapshot_cdc,
    write_snapshot,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_versions_time_travel_and_uncommitted_invisible(spark, tmp_path):
    base = str(tmp_path / "snap")
    assert write_snapshot(_df(spark, [(1, "a"), (2, "b")]), base) == 1
    assert write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), base) == 2
    assert list_versions(spark, base) == [1, 2]

    # latest reflects v2; v1 still readable unchanged (time travel)
    latest = {r.k: r.v for r in read_snapshot(spark, base).collect()}
    assert latest == {1: "a2", 3: "c"}
    v1 = {r.k: r.v for r in read_snapshot(spark, base, 1).collect()}
    assert v1 == {1: "a", 2: "b"}

    # a crashed write (data, no marker) is invisible to every reader
    _df(spark, [(9, "x")]).write.parquet(f"{base}/v=3")
    assert list_versions(spark, base) == [1, 2]
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 3}
    # the next committed write RECLAIMS the orphan slot (a marker-less
    # dir is invisible by definition — refusing it would wedge the
    # store on the first crash) and the orphan's rows never surface
    assert write_snapshot(_df(spark, [(4, "d")]), base) == 3
    assert list_versions(spark, base) == [1, 2, 3]
    assert {r.k for r in read_snapshot(spark, base, 3).collect()} == {4}


def test_snapshot_cdc_row_level(spark, tmp_path):
    base = str(tmp_path / "snap2")
    write_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), base)
    write_snapshot(_df(spark, [(1, "a"), (2, "B"), (4, "d")]), base)
    feed = snapshot_cdc(
        read_snapshot(spark, base, 1),
        read_snapshot(spark, base, 2),
        ["k"],
        ["v"],
    )
    got = {r.k: (r.change_type, r.old_v, r.new_v) for r in feed.collect()}
    assert got == {
        2: ("update", "b", "B"),
        3: ("delete", "c", None),
        4: ("insert", None, "d"),
    }
    # unchanged row 1 is absent
    assert 1 not in got
    # null-safe: value->NULL counts as update
    write_snapshot(_df(spark, [(1, None), (2, "B"), (4, "d")]), base)
    feed2 = snapshot_cdc(
        read_snapshot(spark, base, 2),
        read_snapshot(spark, base, 3),
        ["k"],
        ["v"],
    )
    got2 = {r.k: r.change_type for r in feed2.collect()}
    assert got2 == {1: "update"}


def test_expire_keeps_newest_and_markers_go_first(spark, tmp_path):
    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snap3")
    for i in range(4):
        write_snapshot(_df(spark, [(i, str(i))]), base)
    assert expire_snapshots(spark, base, keep_last=2) == [1, 2]
    assert list_versions(spark, base) == [3, 4]
    # remaining versions read fine; expired ones refuse cleanly
    assert {r.k for r in read_snapshot(spark, base, 4).collect()} == {3}
    import pytest

    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, base, 1)
    # version numbering continues past expired history
    assert write_snapshot(_df(spark, [(9, "z")]), base) == 5


def test_streaming_snapshot_sink_versions_per_epoch(spark, tmp_path):
    import json

    from data_pipeline_bigquery_spark.sources.snapshots import (
        commit_epoch_snapshot,
        streaming_snapshot_sink,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    base = str(tmp_path / "store")

    def emit(lo, hi):
        with open(in_dir / f"{lo}.json", "w") as f:
            for i in range(lo, hi):
                f.write(json.dumps({"k": i, "v": f"r{i}"}) + "\n")

    emit(0, 3)
    stream = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", "1"
    ).json(str(in_dir))
    q = streaming_snapshot_sink(stream, base, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        emit(3, 5)
        q.processAllAvailable()
    finally:
        q.stop()
    vs = list_versions(spark, base)
    assert len(vs) == 2
    union = set()
    for v in vs:
        union |= {r.k for r in read_snapshot(spark, base, v).collect()}
    assert union == set(range(5))

    # at-least-once replay of an already-committed epoch is a no-op
    replay = spark.createDataFrame([(99, "dup")], "k long, v string")
    assert commit_epoch_snapshot(replay, base, epoch_id=0) is None
    assert list_versions(spark, base) == vs
