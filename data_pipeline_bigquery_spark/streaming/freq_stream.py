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
last-applied ``epoch_id`` and the sketch bytes are ONE state file
committed with a single ``os.replace`` — genuinely atomic: no crash
window where the epoch exists without the sketch, where neither
exists, or where a concurrent reader sees a missing file.  A replayed
epoch sees ``epoch_id <= last_applied`` and no-ops.  The checkpoint
and the state file form a unit (as in `rollup_stream.py`): delete
both or neither — a fresh checkpoint renumbers epochs from 0, which
the guard would silently discard against an old state file.
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

# single state file: 8-byte LE epoch, 4-byte LE candidate-json length,
# candidate json (possibly empty list), sketch bytes — EVERYTHING the
# stream accumulates commits in one os.replace, so sketch and heavy-
# hitter candidates can never diverge across a crash, and terms
# round-trip via json (an empty-string term survives)
_STATE_FILE = "cms.state"


def _state_path(sketch_dir: str) -> str:
    return os.path.join(sketch_dir, _STATE_FILE)


def _read_full_state(sketch_dir: str) -> tuple[int, list[str], bytes] | None:
    """``(last_applied_epoch, candidates, sketch_bytes)`` or None."""
    import json
    import struct

    try:
        with open(_state_path(sketch_dir), "rb") as fh:
            raw = fh.read()
    except OSError:
        return None
    (epoch,) = struct.unpack("<q", raw[:8])
    (clen,) = struct.unpack("<I", raw[8:12])
    cands = json.loads(raw[12 : 12 + clen].decode()) if clen else []
    return epoch, cands, raw[12 + clen :]


def _read_state(sketch_dir: str) -> tuple[int, bytes] | None:
    """``(last_applied_epoch, sketch_bytes)`` or None if no state yet."""
    full = _read_full_state(sketch_dir)
    return None if full is None else (full[0], full[2])


def _write_state(
    sketch_dir: str,
    sketch_bytes: bytes,
    epoch_id: int,
    candidates: list[str] | None = None,
) -> None:
    """ONE file, ONE ``os.replace``: epoch, candidates, and sketch
    commit together or not at all — a crash leaves either the complete
    old state or the complete new state, never a gap, and a concurrent
    reader always finds a full file.  ``candidates=None`` preserves the
    stored candidate list (the sketch-only caller)."""
    import json
    import struct

    if candidates is None:
        prior = _read_full_state(sketch_dir)
        candidates = prior[1] if prior is not None else []
    cand_blob = json.dumps(candidates).encode() if candidates else b""
    os.makedirs(sketch_dir, exist_ok=True)
    tmp = _state_path(sketch_dir) + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(struct.pack("<q", epoch_id))
        fh.write(struct.pack("<I", len(cand_blob)))
        fh.write(cand_blob)
        fh.write(sketch_bytes)
    os.replace(tmp, _state_path(sketch_dir))


def _read_sketch(spark: SparkSession, sketch_dir: str):
    state = _read_state(sketch_dir)
    if state is None:
        raise FileNotFoundError(f"no sketch state in {sketch_dir}")
    jvm = spark._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(state[1])
    )


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
        state = _read_state(sketch_dir)
        return -1 if state is None else state[0]

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
        state = _read_state(sketch_dir)
        if state is not None:
            merged = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
                jvm.java.io.ByteArrayInputStream(state[1])
            )
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
    checkpoint: str,
    term_col: str = "term",
):
    """File-source stream → per-batch CMS → merged persistent sketch.
    Returns the StreamingQuery (caller stops it).

    ``checkpoint`` is REQUIRED: without a durable checkpoint a restart
    renumbers epochs from 0 and the idempotence guard silently discards
    every batch against an old state file (undercount) — checkpoint and
    state file are a unit; delete both or neither."""
    stream = spark.readStream.schema(schema).parquet(stream_path)
    return (
        stream.writeStream.foreachBatch(make_sketch_batch(sketch_dir, term_col))
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def estimate_counts(spark: SparkSession, sketch_dir: str, terms: list[str]) -> dict[str, int]:
    """Probe the persisted sketch — the serving-side read path."""
    cms = _read_sketch(spark, sketch_dir)
    return {t: int(cms.estimateCount(t)) for t in terms}


# --- heavy hitters over the stream (CMS + candidate tracking) ----------------


def make_topk_batch(
    sketch_dir: str,
    term_col: str = "term",
    max_candidates: int = 200,
    admission_factor: int = 10,
    eps: float = CMS_EPS,
    confidence: float = CMS_CONFIDENCE,
    seed: int = CMS_SEED,
):
    """Streaming heavy hitters: the CMS + candidate-set construction.

    Each epoch folds the batch into the cumulative sketch AND refreshes
    a bounded candidate set, committing BOTH in the one atomic state
    file — sketch and candidates can never diverge across a crash (a
    retried epoch either sees neither update or both).

    Admission: the batch's top ``admission_factor × max_candidates``
    terms by batch count form the admission pool; stored candidates ∪
    pool are ranked by CUMULATIVE sketch estimate (never an
    undercount) and truncated to ``max_candidates``.  The honest bound:
    a term is missed only if it NEVER ranks inside any batch's
    admission pool, which caps its total count at
    ``epochs × (pool-floor batch count)`` — the wider pool exists
    precisely so steadily-moderate accumulators are admitted and then
    ranked by their cumulative estimate.  An exact-guarantee
    alternative is Space-Saving counters; this construction is the
    standard sketch-serving compromise with O(max_candidates) state.
    """

    def _topk_batch(batch: DataFrame, epoch_id: int) -> None:
        state = _read_full_state(sketch_dir)
        if state is not None and epoch_id <= state[0]:
            return  # replayed epoch: sketch AND candidates already final
        spark = batch.sparkSession
        batch = batch.persist()
        try:
            row = batch.agg(
                F.count_min_sketch(
                    term_col, F.lit(eps), F.lit(confidence), F.lit(seed)
                ).alias("s")
            ).collect()[0]
            pool = [
                r[0]
                for r in batch.filter(F.col(term_col).isNotNull())
                .groupBy(term_col)
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col(term_col))
                .limit(admission_factor * max_candidates)
                .collect()
            ]
        finally:
            batch.unpersist()
        jvm = spark._jvm
        incoming = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            jvm.java.io.ByteArrayInputStream(bytes(row["s"]))
        )
        stored_cands: list[str] = []
        if state is not None:
            merged = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
                jvm.java.io.ByteArrayInputStream(state[2])
            )
            merged.mergeInPlace(incoming)
            stored_cands = state[1]
        else:
            merged = incoming
        ranked = sorted(
            set(stored_cands) | set(pool),
            key=lambda t: (-merged.estimateCount(t), t),
        )[:max_candidates]
        _write_state(sketch_dir, _serialize(spark, merged), epoch_id, ranked)

    return _topk_batch


def top_terms(spark: SparkSession, sketch_dir: str, k: int = 10) -> list[tuple[str, int]]:
    """Serving-side read: the current top-``k`` candidates with their
    cumulative estimates, straight from the atomic state file."""
    state = _read_full_state(sketch_dir)
    if state is None:
        return []
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(state[2])
    )
    ranked = sorted(state[1], key=lambda t: (-cms.estimateCount(t), t))[:k]
    return [(t, int(cms.estimateCount(t))) for t in ranked]
