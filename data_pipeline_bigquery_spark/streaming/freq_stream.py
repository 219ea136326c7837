"""Streaming frequency tracking: ONE count-min sketch maintained across
an unbounded term stream — the `foreachBatch` twin of the batch
``approx_frequent_terms`` contract (`queries/sketches.py`).

Why this shape at 100 TB/day: exact streaming term counts need
unbounded state keyed on an unbounded vocabulary; the CMS is a FIXED
``e/eps × ln(1/δ)`` counter grid whose merge is cell-wise addition, so
each micro-batch contributes one map-side-aggregated sketch (KBs over
the wire regardless of batch size) and the stored sketch never grows.
Estimates stay one-sided (≥ exact) with error ≤ eps·N_total — the same
guarantee the batch contract asserts, now cumulative over the stream.

Exactly-once: ``foreachBatch`` is at-least-once, and sketch merge is
NOT idempotent (a replayed epoch would double-add its counts), so the
last-applied ``epoch_id`` is persisted NEXT TO the sketch and swapped
atomically with it (write-tmp-then-rename, the `rollup_stream.py`
pattern): a replayed epoch sees ``epoch_id <= last_applied`` and
no-ops.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.queries.sketches import (
    CMS_CONFIDENCE,
    CMS_EPS,
    CMS_SEED,
)

_SKETCH_FILE = "cms.bin"
_EPOCH_FILE = "_epoch"


def _read_sketch(spark: SparkSession, path: str):
    jvm = spark._jvm
    with open(os.path.join(path, _SKETCH_FILE), "rb") as fh:
        raw = fh.read()
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(raw)
    )


def _write_state(path: str, sketch_bytes: bytes, epoch_id: int) -> None:
    """Atomic swap: both files land under a tmp dir that is renamed
    over the old state, so a crash between writes can't leave a sketch
    without its epoch (which would re-admit a replay)."""
    import shutil

    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    with open(os.path.join(tmp, _SKETCH_FILE), "wb") as fh:
        fh.write(sketch_bytes)
    with open(os.path.join(tmp, _EPOCH_FILE), "w") as fh:
        fh.write(str(epoch_id))
    old = path + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def _serialize(spark: SparkSession, cms) -> bytes:
    jvm = spark._jvm
    bos = jvm.java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    return bytes(bos.toByteArray())


def make_sketch_batch(
    sketch_dir: str,
    term_col: str = "term",
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
):
    """Per-epoch merge function (exposed for direct replay testing;
    :func:`start_freq_stream` wires it into ``foreachBatch``)."""

    def _last_applied() -> int:
        try:
            with open(os.path.join(sketch_dir, _EPOCH_FILE)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def _sketch_batch(batch: DataFrame, epoch_id: int) -> None:
        if epoch_id <= _last_applied():
            return  # at-least-once replay: counts already folded in
        spark = batch.sparkSession
        row = batch.agg(
            F.count_min_sketch(
                term_col, F.lit(eps), F.lit(confidence), F.lit(seed)
            ).alias("s")
        ).collect()[0]
        jvm = spark._jvm
        incoming = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(row["s"]))
        )
        if os.path.exists(os.path.join(sketch_dir, _SKETCH_FILE)):
            merged = _read_sketch(spark, sketch_dir)
            merged.mergeInPlace(incoming)
        else:
            merged = incoming
        _write_state(sketch_dir, _serialize(spark, merged), epoch_id)

    return _sketch_batch


def start_freq_stream(
    spark: SparkSession,
    stream_path: str,
    schema,
    sketch_dir: str,
    term_col: str = "term",
    checkpoint: str | None = None,
):
    """File-source stream → per-batch CMS → merged persistent sketch.
    Returns the StreamingQuery (caller stops it)."""
    stream = spark.readStream.schema(schema).parquet(stream_path)
    writer = stream.writeStream.foreachBatch(
        make_sketch_batch(sketch_dir, term_col)
    ).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def estimate_counts(spark: SparkSession, sketch_dir: str, terms: list[str]) -> dict[str, int]:
    """Probe the persisted sketch — the serving-side read path."""
    cms = _read_sketch(spark, sketch_dir)
    return {t: int(cms.estimateCount(t)) for t in terms}
