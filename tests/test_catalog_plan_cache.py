"""The r13 catalog plan cache must stay METADATA-only: same lazy plan
back per (session, path, mtime), fresh data on every action, loud UTC
guard re-run on a mid-session TZ flip, invalidation when a fixture is
rewritten in place."""

from __future__ import annotations

import os
import shutil
import time

import pytest

from data_pipeline_bigquery_spark import catalog

SF_DIR = "/root/testdata/sf0.001"


def test_cache_hit_returns_same_plan(spark):
    a = catalog.load(spark, SF_DIR, "nation")
    b = catalog.load(spark, SF_DIR, "nation")
    assert a is b  # memoized lazy frame — no second footer read


def test_rewritten_fixture_invalidates_entry(tmp_path, spark):
    """Rewriting a table in place (the scaled-corpus builders do) must
    drop the cached plan via the mtime key, and actions must reflect
    the new parquet bytes — i.e. nothing materialized was cached."""
    dst = str(tmp_path / "nation.parquet")
    shutil.copyfile(os.path.join(SF_DIR, "nation.parquet"), dst)
    first = catalog.load(spark, str(tmp_path), "nation")
    n1 = first.count()
    assert n1 > 1

    half_rows = first.limit(n1 // 2).collect()
    tmp_out = str(tmp_path / "nation_new")
    first.limit(n1 // 2).write.mode("overwrite").parquet(tmp_out)
    os.remove(dst)
    os.rename(tmp_out, dst)  # spark.read.parquet handles the dir form
    # mtime resolution can be coarse; force a visible change
    future = time.time() + 5
    os.utime(dst, (future, future))

    again = catalog.load(spark, str(tmp_path), "nation")
    assert again is not first  # mtime key invalidated the entry
    assert again.count() == len(half_rows)


def test_part_file_inplace_rewrite_invalidates(tmp_path, spark):
    """A part file rewritten IN PLACE inside a directory table doesn't
    bump the directory mtime — the r13 mtime key served a stale plan
    with frozen FileStatus sizes (r13 VERDICT "what's wrong" #2).  The
    r14 listing fingerprint (relpath, size, mtime_ns per file) must
    invalidate, even with the directory mtime pinned."""
    tbl = str(tmp_path / "nation.parquet")
    base = catalog.load(spark, SF_DIR, "nation").limit(10)
    base.repartition(2).write.parquet(tbl)
    parts = sorted(p for p in os.listdir(tbl) if p.endswith(".parquet"))
    assert len(parts) >= 2
    keep_rows = spark.read.parquet(os.path.join(tbl, parts[1])).count()

    first = catalog.load(spark, str(tmp_path), "nation")
    n1 = first.count()
    assert n1 == 10

    repl_dir = str(tmp_path / "repl")
    base.limit(1).coalesce(1).write.parquet(repl_dir)
    repl = [p for p in os.listdir(repl_dir) if p.endswith(".parquet")][0]
    dir_times = (os.path.getmtime(tbl), os.path.getmtime(tbl))
    shutil.copyfile(os.path.join(repl_dir, repl), os.path.join(tbl, parts[0]))
    # the local FS keeps sidecar checksums; a real in-place writer
    # rewrites them with the data bytes
    shutil.copyfile(
        os.path.join(repl_dir, f".{repl}.crc"),
        os.path.join(tbl, f".{parts[0]}.crc"),
    )
    # pin the directory mtime: the OLD (top-level mtime) key cannot see
    # this rewrite; the listing fingerprint must
    os.utime(tbl, dir_times)

    again = catalog.load(spark, str(tmp_path), "nation")
    assert again is not first
    assert again.count() == keep_rows + 1


class _FakeContext:
    def __init__(self, jsc):
        self._jsc = jsc


class _FakeSession:
    """Stands in for a SparkSession in the purge sweep: only
    ``.sparkContext._jsc`` is consulted (None ⇔ stopped)."""

    def __init__(self, stopped: bool):
        self._ctx = _FakeContext(None if stopped else object())

    @property
    def sparkContext(self):
        return self._ctx


def test_stopped_session_entries_purged(spark):
    """Cached frames strongly reference their session, so the WeakKey
    mapping alone can't collect entries — load() must purge entries of
    stopped sessions (ADVICE r13), and an explicit invalidation hook
    exists."""
    dead, alive = _FakeSession(stopped=True), _FakeSession(stopped=False)
    catalog._PLAN_CACHE[dead] = {"probe": "x"}
    catalog._PLAN_CACHE[alive] = {"probe": "y"}
    try:
        catalog.load(spark, SF_DIR, "nation")  # triggers the sweep
        assert dead not in catalog._PLAN_CACHE
        assert alive in catalog._PLAN_CACHE
        catalog.invalidate_plan_cache(alive)
        assert alive not in catalog._PLAN_CACHE
        assert spark in catalog._PLAN_CACHE  # targeted drop, not a clear
    finally:
        catalog._PLAN_CACHE.pop(alive, None)


def test_tz_flip_reruns_utc_guard(spark):
    """orders.o_orderdate is TIMESTAMP_NTZ in the fixtures, so load()
    performs the guarded NTZ→TIMESTAMP cast.  A frame cached under UTC
    must NOT be served after a session-TZ flip — the loud guard re-runs
    instead of silently serving a cast that now shifts instants."""
    tz_key = "spark.sql.session.timeZone"
    old = spark.conf.get(tz_key)
    assert old in catalog._UTC_ZONES
    catalog.load(spark, SF_DIR, "orders")  # populate under UTC
    spark.conf.set(tz_key, "Pacific/Chatham")
    try:
        with pytest.raises(ValueError, match="UTC"):
            catalog.load(spark, SF_DIR, "orders")
    finally:
        spark.conf.set(tz_key, old)
    # back under UTC the guarded entry serves again
    assert catalog.load(spark, SF_DIR, "orders").count() > 0
