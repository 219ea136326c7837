"""Incremental streaming near-dup detection vs the batch LSH operator:
stream-built band indexes must be interchangeable with batch-built
ones, and arrivals must flag against BOTH earlier batches and their own
batch without ever rescanning the corpus."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier (r13 VERDICT #1): streaming convergence/replay/restart
# integration proof — multi-trigger micro-batch runs costing 10-90 s
# each.  These re-prove invariants that only change when the streaming
# machinery changes; run with --full (or SPARK_GRAFT_FULL_TESTS=1)
# before committing changes to streaming/ paths.
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import Row

from data_pipeline_bigquery_spark.extensions.dedup_text import (
    char_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
)
from data_pipeline_bigquery_spark.streaming.neardup_stream import (
    band_hashes,
    neardup_stream,
)

# Banding is md5-deterministic for fixed strings, but WHICH edits
# survive a band is a property of the hashes — this pair is verified to
# collide on a band (a trailing edit leaves the shared-prefix shingle
# set dominant: J ≈ 0.97 over ~390 shingles).
BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest where tall trees grow thick and wild "
) * 3
NEAR = BASE + " appended tail"
OTHER = (
    "completely different content about spark structured streaming state "
    "stores and watermark semantics for late arriving data processing"
)


def test_band_hashes_match_batch_operator(spark):
    """Stream banding must equal the batch operator's candidate logic:
    docs the batch LSH pairs must collide on a band here, and vice
    versa."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=NEAR), Row(doc_id=3, text=OTHER)],
        "doc_id long, text string",
    )
    batch_pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(minhash_signatures(char_shingles(docs, "doc_id", "text"))).collect()
    }
    bands = band_hashes(docs).collect()
    by_bucket: dict[tuple, set] = {}
    for r in bands:
        by_bucket.setdefault((r.band_idx, r.band_hash), set()).add(r.doc_id)
    stream_pairs = {
        (a, b)
        for ids in by_bucket.values()
        for a in ids
        for b in ids
        if a < b
    }
    assert stream_pairs == batch_pairs
    assert (1, 2) in stream_pairs  # the near-dup is actually caught


def test_streaming_neardup_flags_across_and_within_batches(spark, tmp_path):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    index_path = str(tmp_path / "band_index")
    log_path = str(tmp_path / "neardup_log")
    schema = "doc_id long, text string"

    # batch 1: two unrelated docs
    spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=OTHER)], schema
    ).coalesce(1).write.mode("append").parquet(str(stream_dir))

    q = neardup_stream(
        spark, str(stream_dir), schema, index_path, log_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        # batch 2: a near-dup of doc 1 (cross-batch) and an exact copy
        # of it under another id (in-batch pair with doc 3)
        spark.createDataFrame(
            [Row(doc_id=3, text=NEAR), Row(doc_id=4, text=NEAR)], schema
        ).coalesce(1).write.mode("append").parquet(str(stream_dir))
        q.processAllAvailable()
    finally:
        q.stop()

    flagged = {
        (r.doc_id, r.matched_doc_id)
        for r in spark.read.parquet(log_path).collect()
    }
    assert (3, 1) in flagged or (4, 1) in flagged  # cross-batch vs index
    assert (4, 3) in flagged  # in-batch pair
    assert not any({a, b} == {1, 2} for a, b in flagged)  # unrelated docs stay unflagged

    # the index accumulated both batches (append-only)
    idx_docs = {r.doc_id for r in spark.read.parquet(index_path).select("doc_id").distinct().collect()}
    assert idx_docs == {1, 2, 3, 4}


def test_redelivered_doc_id_never_self_pairs(spark, tmp_path):
    """A document re-delivered under the SAME doc_id in a later batch
    (at-least-once file delivery) must not be flagged as a near-dup of
    itself, and a replayed epoch must not duplicate log/index rows
    (epoch-partitioned dynamic overwrite)."""
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    index_path = str(tmp_path / "band_index")
    log_path = str(tmp_path / "neardup_log")
    schema = "doc_id long, text string"

    spark.createDataFrame([Row(doc_id=1, text=BASE)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(stream_dir))
    q = neardup_stream(
        spark, str(stream_dir), schema, index_path, log_path,
        checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        # same doc_id, same text, re-delivered in a later file
        spark.createDataFrame([Row(doc_id=1, text=BASE)], schema).coalesce(
            1
        ).write.mode("append").parquet(str(stream_dir))
        q.processAllAvailable()
    finally:
        q.stop()

    import os as _os
    if _os.path.exists(log_path):
        assert not [
            r for r in spark.read.parquet(log_path).collect()
            if r.doc_id == r.matched_doc_id
        ]
    # the index holds doc 1's bands for both epochs but no self-pair leaked
    idx = spark.read.parquet(index_path)
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {1}


def test_replayed_epoch_is_idempotent(spark, tmp_path):
    """Driving the micro-batch body twice with the SAME epoch_id (the
    crash-replay case) must leave exactly one copy of that epoch's log
    and index rows, and the replay must not flag the batch against its
    own half-written index partition."""
    from data_pipeline_bigquery_spark.streaming.neardup_stream import (
        process_neardup_batch,
    )

    index_path = str(tmp_path / "band_index")
    log_path = str(tmp_path / "neardup_log")
    docs = spark.createDataFrame(
        [Row(doc_id=3, text=NEAR), Row(doc_id=4, text=NEAR)],
        "doc_id long, text string",
    )
    process_neardup_batch(docs, 0, index_path, log_path)
    first_log = sorted(
        (r.doc_id, r.matched_doc_id, r.band_idx)
        for r in spark.read.parquet(log_path).collect()
    )
    first_idx = spark.read.parquet(index_path).count()
    assert (4, 3) in {(a, b) for a, b, _ in first_log}  # in-batch pair caught

    process_neardup_batch(docs, 0, index_path, log_path)  # replay
    replay_log = sorted(
        (r.doc_id, r.matched_doc_id, r.band_idx)
        for r in spark.read.parquet(log_path).collect()
    )
    assert replay_log == first_log  # no duplicate pairs, no self pairs
    assert spark.read.parquet(index_path).count() == first_idx
    assert not [r for r in replay_log if r[0] == r[1]]
