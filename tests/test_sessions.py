"""Sessionization: batch window form vs streaming applyInPandasWithState
form, plus the multimodal resize/feature stubs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.streaming.sessions import (
    session_aggregate,
    sessionize,
    sessionize_stateful,
)

TS = dt.datetime


def _events(spark):
    rows = [
        # user 1: two sessions (40-min gap between ev2 and ev3)
        Row(user_id=1, ts=TS(2024, 1, 1, 10, 0)),
        Row(user_id=1, ts=TS(2024, 1, 1, 10, 10)),
        Row(user_id=1, ts=TS(2024, 1, 1, 10, 50)),
        # user 2: one session
        Row(user_id=2, ts=TS(2024, 1, 1, 9, 0)),
        Row(user_id=2, ts=TS(2024, 1, 1, 9, 29)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_batch(spark):
    out = sessionize(_events(spark), gap_minutes=30).orderBy("user_id", "ts").collect()
    assert [r["session_idx"] for r in out] == [0, 0, 1, 0, 0]


def test_session_aggregate(spark):
    out = {
        (r["user_id"], r["session_idx"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in session_aggregate(_events(spark), gap_minutes=30).collect()
    }
    assert out[(1, 0)] == (TS(2024, 1, 1, 10, 0), TS(2024, 1, 1, 10, 10), 2)
    assert out[(1, 1)] == (TS(2024, 1, 1, 10, 50), TS(2024, 1, 1, 10, 50), 1)
    assert out[(2, 0)] == (TS(2024, 1, 1, 9, 0), TS(2024, 1, 1, 9, 29), 2)


def test_sessionize_stateful_stream(spark, tmp_path):
    """Feed the same events through the streaming stateful operator; a
    late high-watermark event closes the earlier sessions.  Closed
    sessions must match the batch rollup."""
    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    _events(spark).coalesce(1).write.mode("append").parquet(str(in_dir))
    # watermark pusher: a far-future event per user closes everything prior
    spark.createDataFrame(
        [Row(user_id=1, ts=TS(2024, 1, 2, 0, 0)), Row(user_id=2, ts=TS(2024, 1, 2, 0, 0))],
        "user_id long, ts timestamp",
    ).coalesce(1).write.mode("append").parquet(str(in_dir))

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(str(in_dir))
    q = (
        sessionize_stateful(stream, gap_minutes=30, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    assert got[(1, TS(2024, 1, 1, 10, 0))] == (TS(2024, 1, 1, 10, 10), 2)
    assert got[(1, TS(2024, 1, 1, 10, 50))] == (TS(2024, 1, 1, 10, 50), 1)
    assert got[(2, TS(2024, 1, 1, 9, 0))] == (TS(2024, 1, 1, 9, 29), 2)


def test_multimodal_resize_and_features(spark):
    from data_pipeline_bigquery_spark.extensions.multimodal import (
        extract_features,
        ppm_payload,
        resize_images,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 100), Row(doc_id=2, text="xyz" * 200)],
        "doc_id long, text string",
    ).select("doc_id", ppm_payload("text", 8, 6).alias("payload"))

    resized = {r["doc_id"]: r for r in resize_images(docs, "doc_id", "payload", 16, 16).collect()}
    # real P6 output: 15-byte header + 16*16*3 raster
    assert resized[1]["resized_bytes"] == len(b"P6\n16 16\n255\n") + 16 * 16 * 3
    assert resized[1]["width"] == 16 and resized[1]["height"] == 16
    # determinism: same payload → same digest
    again = {r["doc_id"]: r for r in resize_images(docs, "doc_id", "payload", 16, 16).collect()}
    assert resized[2]["resized_md5"] == again[2]["resized_md5"]

    feats = {r["doc_id"]: r["feature"] for r in extract_features(docs, "doc_id", "payload").collect()}
    assert len(feats[1]) == 16
    norm = sum(x * x for x in feats[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-5  # L2-normalized
