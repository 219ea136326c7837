"""REST ingestion as a FIRST-CLASS Spark data source (Python Data
Source API, Spark 4).

`sources/rest.py` adapts the reference's page loops driver-side
(hubspotoop.py:50-83) and fans offset ranges out via ``mapInPandas``.
Spark 4's Python Data Source API removes even that scaffolding: the
paginated endpoint registers as a real format —

    spark.dataSource.register(RestOffsetDataSource)
    spark.read.format("restoffset").schema(ddl).options(...).load()

— and the engine plans one :class:`InputPartition` per page RANGE, so
executors pull pages in parallel, each building its own transport from
the string options (credentials/URLs travel as options, never pickled
driver state).  Catalyst sees an ordinary relation: column pruning and
downstream pushdown compose like any scan.

Scale notes:
- partition planning needs only the record COUNT (a count endpoint /
  HEAD call in production; the fixture file's line count here) — the
  driver never touches record data.
- ``pages_per_task`` batches pages per partition so task overhead
  amortizes over slow endpoints; each task holds its own rate limit.
- The transport here replays a JSON-lines fixture through the same
  offset/limit contract as `OffsetFakeTransport` (hubspotoop.py:
  350-366); a production subclass swaps ``_fetch_page`` for
  ``requests`` with backoff — the partition/read seam is identical.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class RestOffsetReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_fields = [f.name for f in schema.fields]
        self.path = options["path"]
        self.page_size = int(options.get("page_size", 100))
        self.pages_per_task = int(options.get("pages_per_task", 4))

    # driver-side: plan page-range partitions from the record count
    def partitions(self):
        with open(self.path) as f:
            n_records = sum(1 for _ in f)
        span = self.page_size * self.pages_per_task
        return [
            _PageRange(lo, min(lo + span, n_records))
            for lo in range(0, max(n_records, 1), span)
        ]

    # executor-side: each task replays ONLY its offset range through
    # the paged contract (offset/limit), one page at a time
    def _fetch_page(self, offset: int, limit: int) -> list[dict]:
        out = []
        with open(self.path) as f:
            for i, line in enumerate(f):
                if i >= offset + limit:
                    break
                if i >= offset:
                    out.append(json.loads(line))
        return out

    def read(self, partition):
        offset = partition.start
        while offset < partition.end:
            limit = min(self.page_size, partition.end - offset)
            page = self._fetch_page(offset, limit)
            if not page:
                break
            for rec in page:
                yield tuple(rec.get(c) for c in self.schema_fields)
            offset += len(page)


class RestPollStreamReader(SimpleDataSourceStreamReader):
    """Incremental REST poller as a STREAMING source: the offset is the
    cursor position (record count), each micro-batch reads only records
    past the committed cursor, and ``readBetweenOffsets`` replays any
    [start, end) range deterministically — which is what makes recovery
    exactly-once: after a crash the engine re-asks for the exact same
    offset range and the poller must (and does) return the exact same
    records.  This is the reference's cursor-state incremental pull
    (ST1/ST2: cursor > last_seen) promoted into the engine's own
    offset-tracking machinery — the checkpoint holds the cursor, not a
    side table."""

    def __init__(self, schema, options):
        self.schema_fields = [f.name for f in schema.fields]
        self.path = options["path"]
        self.max_per_batch = int(options.get("max_per_batch", 1000))

    def initialOffset(self):
        return {"cursor": 0}

    def _read_range(self, start: int, end: int | None):
        rows = []
        n = start
        with open(self.path) as f:
            for i, line in enumerate(f):
                if i < start:
                    continue
                if end is not None and i >= end:
                    break
                rows.append(
                    tuple(json.loads(line).get(c) for c in self.schema_fields)
                )
                n = i + 1
        return rows, n

    def read(self, start):
        cursor = start["cursor"]
        rows, new_cursor = self._read_range(
            cursor, cursor + self.max_per_batch
        )
        return iter(rows), {"cursor": new_cursor}

    def readBetweenOffsets(self, start, end):
        rows, _ = self._read_range(start["cursor"], end["cursor"])
        return iter(rows)

    def commit(self, end):
        # a real endpoint would ack/advance server-side state here
        pass


class RestOffsetDataSource(DataSource):
    @classmethod
    def name(cls):
        return "restoffset"

    def reader(self, schema):
        return RestOffsetReader(schema, self.options)

    def simpleStreamReader(self, schema):
        return RestPollStreamReader(schema, self.options)
