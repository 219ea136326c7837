"""transformWithState first-seen dedup.

The processor's admit/drop logic is unit-tested against a fake
ValueState (no JVM needed).  The end-to-end Structured Streaming run
requires ``google.protobuf`` (transformWithState's state-server
protocol) — absent in this container, so that path is skip-gated.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row

from data_pipeline_bigquery_spark.streaming.dedup_stream import FirstSeenDedup, dedup_stream

TS = dt.datetime

try:
    from google.protobuf import descriptor  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.states[name] = _FakeValueState()
        return self.states[name]


def _run(proc, key, batches):
    out = list(proc.handleInputRows(key, iter(batches), None))
    return pd.concat(out) if out else pd.DataFrame()


def test_processor_admits_once_then_drops():
    proc = FirstSeenDedup()
    proc.init(_FakeHandle())
    b1 = pd.DataFrame({"ts": [TS(2024, 1, 1, 10, 5), TS(2024, 1, 1, 10, 0)]})
    out = _run(proc, ("a",), [b1])
    assert list(out["content_key"]) == ["a"]
    assert list(out["first_ts"]) == [TS(2024, 1, 1, 10, 0)]  # min across the batch
    assert list(out["n_occurrences"]) == [2]
    # second sight of the same key: nothing emitted
    assert _run(proc, ("a",), [pd.DataFrame({"ts": [TS(2024, 1, 2, 9, 0)]})]).empty


def test_processor_min_ts_spans_multiple_chunks():
    proc = FirstSeenDedup()
    proc.init(_FakeHandle())
    chunks = [
        pd.DataFrame({"ts": [TS(2024, 1, 1, 12, 0)]}),
        pd.DataFrame({"ts": [TS(2024, 1, 1, 8, 0), TS(2024, 1, 1, 23, 0)]}),
    ]
    out = _run(proc, ("k",), chunks)
    assert list(out["first_ts"]) == [TS(2024, 1, 1, 8, 0)]
    assert list(out["n_occurrences"]) == [3]


@pytest.mark.skipif(not HAVE_PROTOBUF, reason="transformWithState needs google.protobuf")
def test_first_seen_dedup_end_to_end(spark, tmp_path):
    in_dir = str(tmp_path / "dedup_in")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "content_key string, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(in_dir)

    write(
        [
            Row(content_key="a", ts=TS(2024, 1, 1, 10, 5)),
            Row(content_key="a", ts=TS(2024, 1, 1, 10, 0)),
            Row(content_key="b", ts=TS(2024, 1, 1, 11, 0)),
        ]
    )
    stream = spark.readStream.schema("content_key string, ts timestamp").parquet(in_dir)
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        write([Row(content_key="a", ts=TS(2024, 1, 2, 9, 0)), Row(content_key="c", ts=TS(2024, 1, 2, 9, 30))])
        q.processAllAvailable()
        got = {
            r["content_key"]: (r["first_ts"], r["n_occurrences"])
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
    finally:
        q.stop()
    assert got == {
        "a": (TS(2024, 1, 1, 10, 0), 2),
        "b": (TS(2024, 1, 1, 11, 0), 1),
        "c": (TS(2024, 1, 2, 9, 30), 1),
    }
