"""Two-writer commit storm on one snapshot store (VERDICT r8 ask #8).

The store promises best-effort multi-writer with a hard invariant even
under races: once a version is reader-visible it NEVER vanishes or
changes (the r7 fix moved order validation BEFORE the rename, so a
stale writer retargets without publishing instead of retracting a
visible version).  This pins that invariant with a threaded storm:

- every version a reader observes stays observable in every later
  listing (no visible-then-vanished anomaly);
- reading any observed version never fails mid-read (its files don't
  move out from under the reader);
- commit order == version order: the set of committed versions only
  grows, and every writer's returned version is distinct;
- all writes land: N_writers x N_commits distinct committed versions.
"""

from __future__ import annotations

import threading

from data_pipeline_bigquery_spark.sources.snapshots import (
    list_versions,
    read_snapshot,
    write_snapshot,
)

N_WRITERS = 2
COMMITS_PER_WRITER = 5


def test_two_writer_storm_never_retracts_a_visible_version(spark, tmp_path):
    base = str(tmp_path / "storm")
    errors: list[str] = []
    returned: dict[str, list[int]] = {}
    stop = threading.Event()

    def writer(tag: str):
        got = returned.setdefault(tag, [])
        try:
            for i in range(COMMITS_PER_WRITER):
                df = spark.createDataFrame(
                    [(i, tag)], "k long, writer string"
                )
                got.append(write_snapshot(df, base))
        except Exception as exc:  # noqa: BLE001 - surface in main thread
            errors.append(f"writer {tag}: {type(exc).__name__}: {exc}")

    def reader():
        seen: set[int] = set()
        try:
            while not stop.is_set():
                current = set(list_versions(spark, base))
                gone = seen - current
                if gone:
                    errors.append(
                        f"visible versions retracted: {sorted(gone)}"
                    )
                    return
                seen |= current
                if current:
                    # reading an already-visible version must never
                    # fail mid-read, even while commits are landing
                    v = max(current)
                    n = read_snapshot(spark, base, version=v).count()
                    if n != 1:
                        errors.append(f"version {v} read {n} rows != 1")
                        return
        except Exception as exc:  # noqa: BLE001
            errors.append(f"reader: {type(exc).__name__}: {exc}")

    threads = [
        threading.Thread(target=writer, args=(f"w{i}",))
        for i in range(N_WRITERS)
    ]
    rt = threading.Thread(target=reader)
    rt.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    rt.join()

    assert not errors, errors
    all_returned = [v for vs in returned.values() for v in vs]
    # every commit got a DISTINCT version and all of them are visible
    assert len(set(all_returned)) == N_WRITERS * COMMITS_PER_WRITER
    final = list_versions(spark, base)
    assert set(all_returned) <= set(final)
    # each writer saw ITS OWN versions in increasing order (commit
    # order == version order from any single writer's point of view)
    for tag, vs in returned.items():
        assert vs == sorted(vs), (tag, vs)
