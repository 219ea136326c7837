"""REST connector adapters (SURVEY §2.1 S1-S12, §2.2 K4-K6).

The reference's connectors are sequential page loops with sleeps:
``HubspotAPI._get_records`` cursor pagination
(``/root/reference/config/hubspot/hubspotoop.py:50-83``), batched keyed
reads (``:449-471``), and per-row write-backs
(``pipeline/mautic_hubspot_email_log/mautic_hubspot_email_read_activities.py:126-164``).

Spark shape:

* **Reads** land driver-side (REST pagination is inherently serial per
  cursor chain) but immediately become a DataFrame via Arrow; page
  *ranges* that support offset addressing fan out via
  ``spark.range(n_pages).mapInPandas`` so executors pull pages in
  parallel — each partition holds its own rate limiter.
* **Writes** are ``df.foreachPartition`` with per-partition batching +
  exponential backoff — the distributed analog of the reference's retry
  decorator (``test/hubspot/retry.py:6-42``).
* Transport is injected (callable), so tests/fixtures use
  :class:`FakeTransport` and production plugs ``requests`` in the same
  seam the reference keeps its ``session.post`` calls.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[str, dict], dict]


class FakeTransport:
    """Deterministic in-memory REST endpoint: serves ``records`` in
    pages with a ``paging.next.after`` cursor, mimicking the HubSpot v3
    shape the reference paginates (hubspotoop.py:66-77).  A URL ending
    in ``/properties`` serves the property-metadata list instead
    (``properties/v2/{object}/properties``, hubspotoop.py:265-271)."""

    def __init__(
        self,
        records: Sequence[dict],
        page_size: int = 100,
        properties: Sequence[str] | None = None,
    ):
        self.records = list(records)
        self.page_size = page_size
        self.properties = list(properties) if properties is not None else None
        self.calls = 0

    def __call__(self, url: str, payload: dict) -> dict:
        self.calls += 1
        if url.rstrip("/").endswith("/properties"):
            return {"results": [{"name": p} for p in self.properties or []]}
        after = int(payload.get("after", 0))
        page = self.records[after : after + self.page_size]
        out: dict[str, Any] = {"results": page}
        if after + self.page_size < len(self.records):
            out["paging"] = {"next": {"after": str(after + self.page_size)}}
        return out


class OffsetFakeTransport:
    """Deterministic endpoint for the legacy offset/hasMore shape
    (HubSpot v1, hubspotoop.py:350-366)."""

    def __init__(self, records: Sequence[dict]):
        self.records = list(records)
        self.calls = 0

    def __call__(self, url: str, payload: dict) -> dict:
        self.calls += 1
        offset = int(payload.get("offset", 0))
        limit = int(payload.get("limit", 100))
        page = self.records[offset : offset + limit]
        return {
            "results": page,
            "hasMore": offset + limit < len(self.records),
            "offset": offset + len(page),
        }


class RestSource:
    """Paginated scan → DataFrame (S1/S2/S4).

    ``search_payload`` carries the pushed-down predicate exactly as the
    reference serializes ``filterGroups`` (hubspotoop.py:140-163) — the
    engine's Catalyst filters still apply on top, so a source that
    ignores the pushdown stays correct (same contract as DSv2
    ``pushFilters``).
    """

    def __init__(self, transport: Transport, url: str, rate_limit_s: float = 0.0):
        self.transport = transport
        self.url = url
        self.rate_limit_s = rate_limit_s

    def fetch_all(self, payload: dict | None = None) -> list[dict]:
        """S1 rest_paginated_scan: accumulate cursor-paginated pages."""
        return list(self._pages(payload))

    def _pages(self, payload: dict | None = None):
        after: str | None = None
        while True:
            body = dict(payload or {})
            if after is not None:
                body["after"] = after
            resp = self.transport(self.url, body)
            yield from resp.get("results", [])
            after = resp.get("paging", {}).get("next", {}).get("after")
            if after is None:
                return
            if self.rate_limit_s:
                time.sleep(self.rate_limit_s)

    def fetch_to_staging(
        self, staging_dir: str, payload: dict | None = None, spill_every: int = 10_000
    ) -> int:
        """S2 rest_batched_scan_with_spill: driver memory stays bounded —
        every ``spill_every`` records are flushed to a numbered JSON-lines
        file in ``staging_dir`` (the reference spills every 100 pages,
        hubspotoop.py:84-123), and ``spark.read.json(staging_dir)`` turns
        the staged files into a partitioned scan.  Returns record count."""
        import json as _json
        import os

        os.makedirs(staging_dir, exist_ok=True)
        buf: list[dict] = []
        n = file_idx = 0

        def flush() -> None:
            nonlocal buf, file_idx
            if buf:
                with open(os.path.join(staging_dir, f"batch_{file_idx:05d}.json"), "w") as f:
                    f.write("\n".join(_json.dumps(r) for r in buf))
                file_idx += 1
                buf = []

        for rec in self._pages(payload):
            buf.append(rec)
            n += 1
            if len(buf) >= spill_every:
                flush()
        flush()
        return n

    def fetch_all_offset(self, payload: dict | None = None, page_size: int = 100) -> list[dict]:
        """S7 offset_paginated_scan (legacy v1 ``offset``/``hasMore``
        pagination, hubspotoop.py:350-366).  Offset-addressable pages
        are the fan-out-able kind: at scale, page ranges go to
        executors via ``spark.range(n_pages)`` instead of this serial
        driver loop."""
        results: list[dict] = []
        offset = 0
        while True:
            body = dict(payload or {})
            body["offset"] = offset
            body["limit"] = page_size
            resp = self.transport(self.url, body)
            page = resp.get("results", [])
            results.extend(page)
            if not resp.get("hasMore", False):
                return results
            offset = resp.get("offset", offset + len(page))
            if self.rate_limit_s:
                time.sleep(self.rate_limit_s)

    def to_dataframe(self, spark: SparkSession, schema, payload: dict | None = None) -> DataFrame:
        rows = self.fetch_all(payload)
        return spark.createDataFrame(rows, schema)

    def discover_properties(self) -> list[str]:
        """Runtime schema discovery (SURVEY §1.3 mechanism 3): ask the
        source which properties exist — the reference's
        ``object_properties_v2`` name-array
        (hubspotoop.py:265-271, properties.py:16-20).  The result is the
        projection allow-list for subsequent scans, so the pipeline
        tracks source-side schema drift without redeploys."""
        resp = self.transport(self.url.rstrip("/") + "/properties", {})
        return [item["name"] for item in resp.get("results", [])]


def project_discovered(df: DataFrame, properties: Sequence[str]) -> DataFrame:
    """Allow-list projection from discovered properties: keep the
    discovered columns in discovery order, DROP columns the source no
    longer declares, and materialize declared-but-absent properties as
    typed nulls (string — the reference lands new HubSpot properties as
    strings until the warehouse schema catches up).  Column pruning
    pushes the dropped columns out of the scan entirely."""
    from pyspark.sql import functions as F

    present = set(df.columns)
    return df.select(
        *[
            F.col(p) if p in present else F.lit(None).cast("string").alias(p)
            for p in properties
        ]
    )


def foreach_partition_writeback(
    df: DataFrame,
    send: Callable[[list[dict]], None],
    batch_size: int = 100,
    max_retries: int = 5,
    backoff_s: float = 0.1,
) -> None:
    """K4/K5 reverse-ETL sink: per-partition batched POSTs with
    exponential backoff (replaces the reference's driver-side
    ``iterrows`` loop + retry decorator).  ``send`` must be
    idempotent-ish: Spark may re-run a failed partition."""

    def run(it: Iterator) -> None:
        batch: list[dict] = []

        def flush() -> None:
            if not batch:
                return
            delay = backoff_s
            for attempt in range(max_retries):
                try:
                    send(batch)
                    break
                except Exception:
                    if attempt == max_retries - 1:
                        raise
                    time.sleep(delay)
                    delay *= 2
            batch.clear()

        for row in it:
            batch.append(row.asDict() if hasattr(row, "asDict") else dict(row))
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(run)
