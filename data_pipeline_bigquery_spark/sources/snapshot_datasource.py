"""The versioned snapshot store as a FIRST-CLASS Spark data source
(Python Data Source API, Spark 4) — the capability a real table format
exposes as ``spark.readStream.format("delta")``: every committed
snapshot version becomes a streaming micro-batch, so downstream
pipelines subscribe to a TABLE instead of polling it.

    spark.dataSource.register(SnapshotDataSource)
    # batch: the latest committed version, as a plain relation
    spark.read.format("snapshotstore").schema(ddl).option("path", base).load()
    # stream: every committed version, in commit order, exactly once
    spark.readStream.format("snapshotstore").schema(ddl)...load()

The declared schema must end with a ``_version BIGINT`` column — the
reader stamps it, so consumers can window/diff by version.

Offset protocol: the streaming offset is the highest version already
emitted.  Versions are IMMUTABLE once committed (rename-CAS protocol,
`sources/snapshots.py` — order validation happens BEFORE the commit
rename, so a version that became visible is never retracted) and
version numbers are monotone (the ``_LATEST_`` high-water mark survives
retention), which is what makes ``readBetweenOffsets`` deterministic
and recovery exactly-once **for a single writer** (or writers that
never stall mid-commit): after a crash the engine re-asks for the same
(start, end] version range and gets byte-identical rows.  Only
marker-verified versions are visible — a mid-commit writer's staging
dir is invisible by protocol, so the feed can never observe a torn
version.  Best-effort multi-writer caveat: a writer stalled between
its pre-rename listing and its rename can publish version N *after*
N+1 became visible; a poll that already advanced past N will then skip
it.  Run concurrent writers only if the sink tolerates that transient,
or serialize writers per base path.  The late-publish detector below
fires on the READER side only — it turns the silent skip into a loud
stream failure after the fact, but it cannot prevent the out-of-order
publish itself; writes still need external mutual exclusion (one
writer per base path, or a lock service) when strict commit ordering
is required.  The streaming offset carries the exact set of known
at-or-below-offset versions (expired entries are pruned each poll),
so a retention expiry in the same poll interval as a late publish
cannot mask the detection.  Precondition for bounded offsets: the
carried set's size tracks the COMMITTED version count, so a base path
that never runs ``expire_snapshots`` grows its checkpoint offset
O(versions-ever) — run a retention cadence on long-lived streams (the
same cadence the storage itself needs).

Scale notes: this reader is the ``SimpleDataSourceStreamReader`` form
(driver reads, then the engine distributes) — right for version-grain
feeds whose per-batch volume is one load's delta.  For fat versions the
same offset protocol lifts to the partition-planning
``DataSourceStreamReader`` (one :class:`InputPartition` per parquet
file per version), exactly like `rest_datasource.py`'s batch reader
plans page ranges.  Listing cost is O(new versions) per poll via the
``_LATEST_`` pointer ratchet.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_MARKER = "_COMMITTED"
_VERSION_COL = "_version"


def _check_local(base: str) -> str:
    """This reader walks the store with os/pyarrow primitives (the
    Python Data Source runs without a JVM handle), so only local paths
    are supported — fail LOUDLY on a remote scheme rather than reading
    a populated hdfs://... store back as silently empty.  The remote
    lift is fsspec/pyarrow.fs injection at exactly this seam."""
    scheme, sep, rest = base.partition("://")
    if sep and scheme not in ("file",):
        raise ValueError(
            f"snapshotstore format supports local paths only, got scheme "
            f"{scheme!r} in {base!r} — read remote stores via "
            f"sources.snapshots.read_snapshot (Hadoop FS) instead"
        )
    return rest if sep else base


def _committed_versions(base: str) -> list[int]:
    """Committed versions ascending — same protocol as
    `snapshots.list_versions`, expressed with os primitives because the
    Python Data Source runs without a JVM handle."""
    base = _check_local(base)
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        m = re.fullmatch(r"v=(\d+)", name)
        if m and os.path.exists(os.path.join(base, name, _MARKER)):
            out.append(int(m.group(1)))
    return sorted(out)


def _version_rows(base: str, version: int, fields: list[str], types=None):
    """Rows of one committed version as tuples in declared-field order,
    ``_version`` stamped.  Files read in sorted-name order so any
    [start, end] replay is byte-deterministic.  Hive-partitioned
    versions work: ``key=value`` path segments under the version dir
    supply the partition columns the files themselves omit — typed by
    the DECLARED schema (``types``), never guessed from the string (a
    string column holding '007' must stay '007', not become int 7)."""
    import pyarrow.parquet as pq

    base = _check_local(base)
    vdir = os.path.join(base, f"v={version}")
    data_fields = [f for f in fields if f != _VERSION_COL]
    for part in sorted(
        glob.glob(os.path.join(vdir, "**", "*.parquet"), recursive=True)
    ):
        part_vals: dict[str, object] = {}
        for seg in os.path.relpath(os.path.dirname(part), vdir).split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                part_vals[k] = _typed_partition_value(k, v, types)
        file_fields = [f for f in data_fields if f not in part_vals]
        tbl = pq.read_table(part, columns=file_fields)
        cols = {name: tbl.column(name).to_pylist() for name in file_fields}
        for i in range(tbl.num_rows):
            yield tuple(
                version
                if f == _VERSION_COL
                else (part_vals[f] if f in part_vals else cols[f][i])
                for f in fields
            )


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _typed_partition_value(name: str, raw: str, types):
    """Convert a hive path value using the declared Spark type.

    Handles every partitionable scalar the store's writers can emit
    (ADVICE r07): integral / float / boolean / date / timestamp /
    decimal / string, plus the hive NULL sentinel (a NULL partition
    value is written as ``__HIVE_DEFAULT_PARTITION__``, which must come
    back as None, not crash int()).  An unhandled declared type raises
    a descriptive error instead of leaking a raw string into a typed
    column (which fails later, inscrutably, in row conversion)."""
    import datetime as _dt
    import decimal as _decimal
    import urllib.parse

    if raw == _HIVE_NULL:
        return None
    raw = urllib.parse.unquote(raw)  # hive escapes ':' ' ' etc. in values
    t = (types or {}).get(name)
    tn = t.typeName() if t is not None else None
    if tn is None:
        # field not in the declared schema (it will be dropped from the
        # output tuple anyway) — keep the raw string
        return raw
    if tn in ("long", "integer", "short", "byte", "bigint", "int"):
        return int(raw)
    if tn in ("double", "float"):
        return float(raw)
    if tn == "boolean":
        return raw.lower() == "true"
    if tn == "date":
        return _dt.date.fromisoformat(raw)
    if tn in ("timestamp", "timestamp_ntz"):
        return _dt.datetime.fromisoformat(raw)
    if tn == "decimal":
        return _decimal.Decimal(raw)
    if tn == "string":
        return raw
    raise ValueError(
        f"snapshotstore: unsupported partition-column type {tn!r} for "
        f"hive path segment {name}={raw!r} — partition by an "
        f"integral/float/boolean/date/timestamp/decimal/string column, "
        f"or read via sources.snapshots.read_snapshot instead"
    )


class _VersionPartition(InputPartition):
    def __init__(self, version: int):
        self.version = version


class SnapshotLatestReader(DataSourceReader):
    """Batch form: the LATEST committed version as a relation, one
    input partition per version (trivially one here) — the
    ``read_snapshot(latest)`` semantics behind a format string."""

    def __init__(self, schema, options):
        self.fields = [f.name for f in schema.fields]
        self.types = {f.name: f.dataType for f in schema.fields}
        self.base = options["path"]

    def partitions(self):
        versions = _committed_versions(self.base)
        if not versions:
            return [_VersionPartition(-1)]
        return [_VersionPartition(versions[-1])]

    def read(self, partition):
        if partition.version < 0:
            return iter(())
        return _version_rows(
            self.base, partition.version, self.fields, self.types
        )


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each committed version is emitted once, in
    version order; the checkpointed offset is the last emitted
    version."""

    def __init__(self, schema, options):
        self.fields = [f.name for f in schema.fields]
        self.types = {f.name: f.dataType for f in schema.fields}
        self.base = options["path"]
        self.max_versions = int(options.get("max_versions_per_batch", 10))

    def initialOffset(self):
        return {"version": 0, "emitted_count": 0, "below_versions": []}

    def read(self, start):
        last = start["version"]
        committed = _committed_versions(self.base)
        below = [v for v in committed if v <= last]
        # LATE-PUBLISH DETECTION (ADVICE r08, expiry-proofed r10):
        # best-effort multi-writer mode has a one-RPC window where a
        # stalled writer publishes version N after N+1 is already
        # visible; a reader whose offset advanced past N would
        # otherwise skip its rows FOREVER and silently.  Legitimately-
        # skipped numbers (a crashed writer's _LATEST_ reservation)
        # never appear in _committed_versions, so any at-or-below-
        # offset version NOT in the offset's known set IS a late
        # publish — fail loudly rather than drop data.  The offset
        # carries the exact known-below version list (size bounded by
        # retention, same order as the per-batch `versions` list), so
        # an expiry that removes versions in the same interval as a
        # late publish cannot mask the detection — set difference, not
        # a count compare (ADVICE r09).  Legacy checkpoints that
        # predate the list fall back to the count check (maskable,
        # documented); ones that predate the counter skip the check.
        known_below = start.get("below_versions")
        known = start.get("emitted_count")
        detail = None
        if known_below is not None:
            late = sorted(set(below) - set(known_below))
            if late:
                detail = f"version(s) {late}"
        elif known is not None and len(below) > known:
            # legacy checkpoint: only the count survives, so name the
            # delta, not every at-or-below version (review r10)
            detail = (
                f"{len(below) - known} version(s) (legacy count check; "
                f"committed at-or-below offset: {below})"
            )
        if detail:
            raise RuntimeError(
                f"snapshotstore late publish detected: {detail} "
                f"at or below the stream offset {last} appeared after the "
                f"stream already advanced past them — a concurrent writer "
                f"published out of order; these rows would be skipped "
                f"silently.  Re-seed the stream from an earlier checkpoint "
                f"or run writers single-writer."
            )
        pending = [v for v in committed if v > last][: self.max_versions]
        emitted = (known if known is not None else len(below)) + len(pending)
        # prune expired entries (intersection with committed) so the
        # carried set stays retention-bounded; safe because the commit
        # protocol never reuses a version number below the _LATEST_
        # high-water mark, so a pruned version cannot reappear
        new_below = sorted(
            (set(below if known_below is None else known_below)
             & set(committed))
            | set(pending)
        )
        if not pending:
            return iter(()), {
                "version": last,
                "emitted_count": emitted,
                "below_versions": new_below,
            }
        rows = [
            row
            for v in pending
            for row in _version_rows(self.base, v, self.fields, self.types)
        ]
        # the offset carries the EXACT planned version list (not just
        # the high-water scalar): version numbers can legitimately skip
        # (a crashed writer reserves a number via the _LATEST_ ratchet),
        # so crash-recovery must replay precisely these versions — and
        # can detect retention racing the checkpoint (below)
        return iter(rows), {
            "version": pending[-1],
            "versions": pending,
            "emitted_count": emitted,
            "below_versions": new_below,
        }

    def readBetweenOffsets(self, start, end):
        planned = end.get("versions")
        if planned is None:  # legacy offset without the planned list
            planned = [
                v
                for v in _committed_versions(self.base)
                if start["version"] < v <= end["version"]
            ]
        # crash-recovery replay of an already-planned batch: every
        # planned version MUST still exist — if retention expired one
        # between planning and recovery, the replayed micro-batch would
        # silently commit EMPTY and its rows would vanish from the
        # sink.  Fail loudly; the fix is retention >= checkpoint
        # recovery horizon.
        have = set(_committed_versions(self.base))
        missing = [v for v in planned if v not in have]
        if missing:
            raise RuntimeError(
                f"snapshotstore replay gap: planned versions {missing} in "
                f"({start['version']}, {end['version']}] no longer exist "
                f"(expired by retention?) — cannot recover this batch "
                f"exactly-once"
            )
        for v in planned:
            yield from _version_rows(self.base, v, self.fields, self.types)

    def commit(self, end):
        pass  # versions are immutable; nothing to ack


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls):
        return "snapshotstore"

    def reader(self, schema):
        return SnapshotLatestReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return SnapshotStreamReader(schema, self.options)
