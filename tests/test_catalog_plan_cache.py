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
