"""Streaming dead-letter routing — the ingest guard every production
stream needs: malformed records must neither fail the query nor vanish.

The streaming twin of ``queries/formats._malformed_json_quarantine``:
each micro-batch of raw JSON lines is split by ``from_json``
parseability — typed rows land in the good sink, unparseable lines
(with their epoch, for replay/debugging) in the dead-letter sink.  Both
sinks are epoch-partitioned with dynamic partition overwrite, the same
idempotent foreachBatch recipe as :mod:`.neardup_stream`: a replayed
epoch replaces its own partition, per-batch IO stays O(batch).

The reference has no analog (its REST ingestion trusts the API's JSON;
``config/hubspot/hubspotoop.py`` would raise and die) — this is part of
the engine's beyond-reference ingestion hardening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def process_quarantine_batch(
    batch_df: DataFrame,
    epoch_id: int,
    json_schema: str,
    required_col: str,
    good_path: str,
    dead_path: str,
) -> None:
    """One micro-batch: parse, route, write both sides idempotently.

    ``required_col`` is a field every intact record must carry non-null
    (a pk); it distinguishes "parsed to an all-null struct" from a
    legitimately sparse record."""
    if batch_df.isEmpty():
        return
    parsed = batch_df.select(
        "value", F.from_json("value", json_schema).alias("j")
    )
    ok = F.col("j").isNotNull() & F.col(f"j.{required_col}").isNotNull()

    from data_pipeline_bigquery_spark.streaming.epochs import (
        write_epoch_partitioned,
    )

    good = parsed.filter(ok).select("j.*").persist()
    dead = parsed.filter(~ok).select(F.col("value").alias("raw_line")).persist()
    try:
        write_epoch_partitioned(good, epoch_id, good_path)
        write_epoch_partitioned(dead, epoch_id, dead_path)
    finally:
        good.unpersist()
        dead.unpersist()


def quarantine_stream(
    spark: SparkSession,
    stream_path: str,
    json_schema: str,
    required_col: str,
    good_path: str,
    dead_path: str,
    checkpoint: str | None = None,
):
    """Start the dead-letter router over a raw JSON-lines file stream.
    Returns the StreamingQuery (caller stops it)."""
    stream = spark.readStream.text(stream_path)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_quarantine_batch(
            batch_df, epoch_id, json_schema, required_col, good_path, dead_path
        )

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
