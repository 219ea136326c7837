"""Streaming first-seen deduplication via ``transformWithStateInPandas``
(the Spark 4 arbitrary-state API, successor to applyInPandasWithState).

Training-data ingest wants exact dedup AT THE EDGE: a document whose
content hash has ever been admitted is dropped before it costs anything
downstream.  Spark's built-in ``dropDuplicatesWithinWatermark`` only
dedups inside the watermark horizon; this operator keeps a durable
per-key "seen" bit in the state store, so the horizon is the whole
stream history (optionally bounded by a TTL for re-crawl policies).

Scale shape: state is one boolean per distinct content hash, hash-
partitioned across executors by the groupBy key — the same layout a
100 TB ingest needs (RocksDB state backend holds billions of keys;
nothing is driver-side).  The emitted row is the FIRST occurrence
(min event time in the first batch that carries the key); later
occurrences emit nothing.

Reference parity: latest-wins dedup in the reference is batch-side
(SURVEY §2.11 ST3, llgx10/data_pipeline_bigquery sync engine); the
streaming-native form is part of this engine's scale-out extension set.

Environment note: transformWithState's driver worker needs
``google.protobuf`` at runtime (its state-server protocol is proto-
encoded).  This container lacks protobuf, so the end-to-end test is
skip-gated on that import; the processor's admit/drop logic is unit-
tested against a fake state handle regardless (tests/test_dedup_stream.py).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

DEDUP_OUT_SCHEMA = "content_key string, first_ts timestamp, n_occurrences bigint"


class FirstSeenDedup(StatefulProcessor):
    """Emit each key once — on first sight — with the occurrence count
    of that first micro-batch; drop every later arrival."""

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen boolean", ttlDurationMs=self._ttl_ms)

    def handleInputRows(
        self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        if self._seen.exists():
            return
        first_ts, n = None, 0
        for pdf in rows:
            n += len(pdf)
            batch_min = pdf["ts"].min()
            first_ts = batch_min if first_ts is None else min(first_ts, batch_min)
        self._seen.update((True,))
        yield pd.DataFrame(
            {"content_key": [key[0]], "first_ts": [first_ts], "n_occurrences": [n]}
        )

    def close(self) -> None:
        pass


def dedup_stream(
    events: DataFrame, key_col: str = "content_key", ttl_ms: int | None = None
) -> DataFrame:
    """First-seen dedup over a streaming DataFrame with ``(key_col, ts)``.

    ``ttl_ms`` bounds state for re-crawl policies (a key expires after
    the TTL and would be admitted again); None keeps keys forever.
    """
    keyed = events.withColumnRenamed(key_col, "content_key")
    return keyed.groupBy("content_key").transformWithStateInPandas(
        statefulProcessor=FirstSeenDedup(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
