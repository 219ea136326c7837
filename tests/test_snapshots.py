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

    # a marker-less dir (legacy crashed write / foreign junk) is
    # invisible to every reader
    _df(spark, [(9, "x")]).write.parquet(f"{base}/v=3")
    assert list_versions(spark, base) == [1, 2]
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 3}
    # the next committed write SKIPS PAST the occupied slot instead of
    # deleting it — it cannot distinguish a crashed orphan from a
    # concurrent writer mid-commit, so it never deletes a dir it
    # doesn't own (r5 ADVICE); the store doesn't wedge and the
    # orphan's rows never surface
    assert write_snapshot(_df(spark, [(4, "d")]), base) == 4
    assert list_versions(spark, base) == [1, 2, 4]
    assert {r.k for r in read_snapshot(spark, base, 4).collect()} == {4}
    assert {r.k for r in read_snapshot(spark, base).collect()} == {4}


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


def test_latest_pointer_honored_and_dangling_pointer_falls_back(spark, tmp_path):
    """The _LATEST_<v> pointer accelerates latest-reads but the marker
    still decides: a pointer created by a writer that crashed before
    its commit rename (pointer present, no committed dir behind it)
    must fall back to the marker-verified listing."""
    import glob

    base = str(tmp_path / "snapp")
    write_snapshot(_df(spark, [(1, "a")]), base)
    write_snapshot(_df(spark, [(2, "b")]), base)
    # pointer exists and names the latest committed version
    assert glob.glob(f"{base}/_LATEST_2")
    assert not glob.glob(f"{base}/_LATEST_1")  # old pointer swept
    assert {r.k for r in read_snapshot(spark, base).collect()} == {2}

    # simulate a writer that crashed after advancing the pointer but
    # before its commit rename: dangling _LATEST_3, no v=3
    open(f"{base}/_LATEST_3", "w").close()
    assert {r.k for r in read_snapshot(spark, base).collect()} == {2}
    # the next commit supersedes the dangling pointer
    v = write_snapshot(_df(spark, [(4, "d")]), base)
    assert {r.k for r in read_snapshot(spark, base).collect()} == {4}
    assert glob.glob(f"{base}/_LATEST_{v}")


def test_crashed_staging_is_hidden_and_vacuumed(spark, tmp_path):
    """A crash mid-write leaves only a hidden .tmp-* dir: invisible to
    list_versions/readers, swept by vacuum_snapshots."""
    import os

    from data_pipeline_bigquery_spark.sources.snapshots import (
        vacuum_snapshots,
    )

    base = str(tmp_path / "snapv")
    write_snapshot(_df(spark, [(1, "a")]), base)
    # fake crashed staging dir with data but no rename
    _df(spark, [(9, "x")]).write.parquet(f"{base}/.tmp-deadbeef")
    assert list_versions(spark, base) == [1]
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1}
    assert vacuum_snapshots(spark, base) == 1
    assert not os.path.exists(f"{base}/.tmp-deadbeef")
    assert vacuum_snapshots(spark, base) == 0


def test_epoch_hwm_survives_retention(spark, tmp_path):
    """r5 ADVICE: expire_snapshots used to delete the _EPOCH_<id>
    markers with the version dirs, so a stream restarted from an old
    checkpoint re-committed expired epochs as duplicate versions.  The
    base-level high-water mark closes that: replays of epochs at or
    below it no-op even after their versions are long gone."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        commit_epoch_snapshot,
        expire_snapshots,
    )

    base = str(tmp_path / "snaph")
    for e in range(3):
        assert commit_epoch_snapshot(_df(spark, [(e, str(e))]), base, e) is not None
    assert expire_snapshots(spark, base, keep_last=1) == [1, 2]
    assert list_versions(spark, base) == [3]
    # replay epochs whose version dirs (and _EPOCH_ markers) are gone
    for e in range(3):
        assert commit_epoch_snapshot(_df(spark, [(99, "dup")]), base, e) is None
    assert list_versions(spark, base) == [3]
    # a genuinely new epoch still commits
    assert commit_epoch_snapshot(_df(spark, [(7, "g")]), base, 3) is not None


def test_expire_reclaims_orphans_below_retention(spark, tmp_path):
    """Marker-less orphan dirs below the oldest retained version can't
    belong to a live writer; expire_snapshots sweeps them."""
    import os

    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snapo")
    for i in range(3):
        write_snapshot(_df(spark, [(i, str(i))]), base)
    # turn v=1 into an orphan shape is not possible via the API; plant
    # a foreign marker-less dir at a low version number instead
    os.makedirs(f"{base}/v=0")
    assert expire_snapshots(spark, base, keep_last=2) == [1]
    assert not os.path.exists(f"{base}/v=0")
    assert not os.path.exists(f"{base}/v=1")
    assert list_versions(spark, base) == [2, 3]


def test_concurrent_writers_never_lose_a_commit(spark, tmp_path):
    """The r5 ADVICE race, exercised for real: N threads commit to the
    same base concurrently.  Under the rename-CAS protocol every commit
    must land on its OWN version (losers retry upward, nobody deletes
    anybody's dir) and every payload must be readable afterwards."""
    from concurrent.futures import ThreadPoolExecutor

    base = str(tmp_path / "snapc")
    payloads = list(range(6))

    def commit(i):
        return write_snapshot(_df(spark, [(i, f"p{i}")]), base)

    with ThreadPoolExecutor(max_workers=3) as ex:
        versions = list(ex.map(commit, payloads))

    # every commit got a distinct version and none were lost
    assert len(set(versions)) == len(payloads)
    assert sorted(versions) == list_versions(spark, base)
    seen = set()
    for v in list_versions(spark, base):
        rows = read_snapshot(spark, base, v).collect()
        assert len(rows) == 1
        seen.add(rows[0].k)
    assert seen == set(payloads)
    # latest pointer resolves to a committed version
    assert {r.k for r in read_snapshot(spark, base).collect()} <= seen


def test_versions_never_reused_after_expiry(spark, tmp_path):
    """r06 ADVICE: a writer stalled across an expire_snapshots run must
    not commit under a version number expiry just freed (that would put
    the NEWEST data at a LOW version and break time-travel
    monotonicity).  The ratcheting _LATEST_ pointer acts as a version
    high-water mark that outlives expiry, so the next commit always
    lands ABOVE every version that ever existed."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        expire_snapshots,
    )

    base = str(tmp_path / "snap_hwm")
    for i in range(4):
        write_snapshot(_df(spark, [(i, f"p{i}")]), base)
    assert list_versions(spark, base) == [1, 2, 3, 4]
    assert expire_snapshots(spark, base, keep_last=1) == [1, 2, 3]
    # versions 1-3 are freed slots; the stalled writer's commit must
    # target 5, not 1
    assert write_snapshot(_df(spark, [(99, "late")]), base) == 5
    assert list_versions(spark, base) == [4, 5]
    # latest == highest version == newest data (monotonicity intact)
    assert {r.k for r in read_snapshot(spark, base).collect()} == {99}


def test_commit_raises_when_staging_dir_vanishes(spark, tmp_path):
    """r06 ADVICE: if the staging dir disappears mid-commit (concurrent
    vacuum_snapshots or object-store fault), the retry loop must raise
    a descriptive error instead of spinning forever."""
    import shutil

    import pytest

    from data_pipeline_bigquery_spark.sources import snapshots as snap

    base = str(tmp_path / "snap_gone")
    write_snapshot(_df(spark, [(1, "a")]), base)

    # simulate a vacuum racing the writer: hook the once-per-iteration
    # list_versions call to remove the staging dir after it was written
    real_list = snap.list_versions

    def vanishing_list(s, b):
        for name in os.listdir(b):
            if name.startswith(".tmp-"):
                shutil.rmtree(os.path.join(b, name), ignore_errors=True)
        return real_list(s, b)

    snap.list_versions = vanishing_list
    try:
        with pytest.raises(RuntimeError, match="staging dir .* disappeared|could not recover"):
            write_snapshot(_df(spark, [(2, "b")]), base)
    finally:
        snap.list_versions = real_list


def test_merge_into_snapshot_reference_semantics(spark, tmp_path):
    """MERGE verb: insert new pks, update only when the cursor differs,
    keep everything else — committed as a NEW version with the pre-merge
    state still readable and CDC-able."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        merge_into_snapshot,
        snapshot_cdc,
    )

    base = str(tmp_path / "snap_merge")
    tgt = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, cur long"
    )
    assert write_snapshot(tgt, base) == 1
    src = spark.createDataFrame(
        [(2, "B", 11),   # cursor differs -> update
         (3, "XXX", 10),  # same cursor -> no-op (late duplicate)
         (4, "d", 11)],   # new pk -> insert
        "k long, v string, cur long",
    )
    assert merge_into_snapshot(spark, base, src, "k", "cur") == 2
    now = {r.k: (r.v, r.cur) for r in read_snapshot(spark, base).collect()}
    assert now == {1: ("a", 10), 2: ("B", 11), 3: ("c", 10), 4: ("d", 11)}
    # history intact and row-level diffable
    before = {r.k: r.v for r in read_snapshot(spark, base, 1).collect()}
    assert before == {1: "a", 2: "b", 3: "c"}
    feed = {
        r.k: r.change_type
        for r in snapshot_cdc(
            read_snapshot(spark, base, 1),
            read_snapshot(spark, base, 2),
            ["k"],
            ["v"],
        ).collect()
    }
    assert feed == {2: "update", 4: "insert"}


def test_delete_keys_snapshot_two_phase_erasure(spark, tmp_path):
    """DELETE verb: the new version drops the keys; history keeps them
    until retention expires those versions (the two-phase erasure)."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        delete_keys_snapshot,
        expire_snapshots,
    )

    base = str(tmp_path / "snap_del")
    write_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), base)
    keys = spark.createDataFrame([(2,)], "k long")
    assert delete_keys_snapshot(spark, base, keys, "k") == 2
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 3}
    assert {r.k for r in read_snapshot(spark, base, 1).collect()} == {1, 2, 3}
    # physical erasure at retention
    expire_snapshots(spark, base, keep_last=1)
    assert list_versions(spark, base) == [2]


def test_compact_snapshot_rows_identical_fewer_files(spark, tmp_path):
    import glob

    from data_pipeline_bigquery_spark.sources.snapshots import (
        compact_snapshot,
    )

    base = str(tmp_path / "snap_comp")
    write_snapshot(_df(spark, [(i, f"v{i}") for i in range(100)]).repartition(8), base)
    assert len(glob.glob(f"{base}/v=1/*.parquet")) == 8
    assert compact_snapshot(spark, base, n_files=1) == 2
    assert len(glob.glob(f"{base}/v=2/*.parquet")) == 1
    a = sorted((r.k, r.v) for r in read_snapshot(spark, base, 1).collect())
    b = sorted((r.k, r.v) for r in read_snapshot(spark, base, 2).collect())
    assert a == b


def test_partitioned_snapshot_prunes_and_rollback(spark, tmp_path):
    """A version written with partition_by lays out hive subdirs INSIDE
    v=N: a filtered time-travel read must prune to the matching
    partition (plan-asserted), and rollback_snapshot restores an old
    state as a NEW version without deleting history."""
    from data_pipeline_bigquery_spark.sources.snapshots import (
        rollback_snapshot,
    )

    base = str(tmp_path / "snap_part")
    df = spark.createDataFrame(
        [(1, "a", 2023), (2, "b", 2023), (3, "c", 2024)],
        "k long, v string, year int",
    )
    assert write_snapshot(df, base, partition_by=["year"]) == 1
    assert os.path.isdir(f"{base}/v=1/year=2023")
    got = read_snapshot(spark, base).filter(F.col("year") == 2024)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "year=2024" in plan or "PartitionFilters: [isnotnull(year" in plan
    assert {r.k for r in got.collect()} == {3}

    # a bad load lands, then rollback: v3 == v1, history intact
    write_snapshot(
        spark.createDataFrame([(9, "oops", 2025)], "k long, v string, year int"),
        base,
    )
    assert rollback_snapshot(spark, base, to_version=1) == 3
    assert {r.k for r in read_snapshot(spark, base).collect()} == {1, 2, 3}
    assert {r.k for r in read_snapshot(spark, base, 2).collect()} == {9}


def test_schema_evolution_across_versions(spark, tmp_path):
    """v2 adds a column: each version reads back with its OWN schema
    (plain parquet semantics), and CDC across the change works by
    comparing the shared columns."""
    base = str(tmp_path / "snap_schema")
    write_snapshot(_df(spark, [(1, "a"), (2, "b")]), base)
    write_snapshot(
        spark.createDataFrame(
            [(1, "a", 7), (2, "B", 8)], "k long, v string, extra long"
        ),
        base,
    )
    assert read_snapshot(spark, base, 1).columns == ["k", "v"]
    assert read_snapshot(spark, base, 2).columns == ["k", "v", "extra"]
    feed = {
        r.k: r.change_type
        for r in snapshot_cdc(
            read_snapshot(spark, base, 1),
            read_snapshot(spark, base, 2),
            ["k"],
            ["v"],
        ).collect()
    }
    assert feed == {2: "update"}


def test_stalled_writer_cannot_commit_below_newest(spark, tmp_path):
    """Round-7 review finding: a writer that computed its version from a
    STALE listing (stalled across other writers' commits, or across an
    expiry) must not land below the newest committed version — that
    would break commit-order == version-order, which time travel, CDC,
    and the change feed's high-water offset rely on.  The PRE-rename
    order validation (ADVICE r08: re-list after _advance_tag, before the
    rename) retargets the stale writer WITHOUT ever publishing the low
    version — a committed version can never be observed and then
    vanish, which the snapshotstore stream reader's replay contract
    depends on."""
    from data_pipeline_bigquery_spark.sources import snapshots as snap

    base = str(tmp_path / "snap_stale")
    write_snapshot(_df(spark, [(1, "a")]), base)  # v1
    # advance the pointer past a reserved-but-never-committed slot, so
    # the next real commit lands at v6 (legitimate number skipping)
    open(f"{base}/_LATEST_5", "w").close()
    assert write_snapshot(_df(spark, [(6, "f")]), base) == 6

    # stalled writer: its FIRST listing (used to compute v) is stale —
    # it believes only v1 exists and no pointer is set
    real_list, real_tags = snap.list_versions, snap._tagged_values
    calls = {"list": 0, "tags": 0}

    def stale_list(s, b):
        calls["list"] += 1
        if calls["list"] == 1:
            return [1]
        return real_list(s, b)

    def stale_tags(s, b, prefix):
        if prefix == snap._LATEST_TAG:
            calls["tags"] += 1
            if calls["tags"] == 1:
                return []
        return real_tags(s, b, prefix)

    snap.list_versions, snap._tagged_values = stale_list, stale_tags
    try:
        v = write_snapshot(_df(spark, [(9, "late")]), base)
    finally:
        snap.list_versions, snap._tagged_values = real_list, real_tags

    assert v == 7  # retried ABOVE the newest, not the stale v=2
    assert list_versions(spark, base) == [1, 6, 7]
    assert {r.k for r in read_snapshot(spark, base).collect()} == {9}
    # the retracted stale commit left no residue below v6
    assert not os.path.exists(f"{base}/v=2")
