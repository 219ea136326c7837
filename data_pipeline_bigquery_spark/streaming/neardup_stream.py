"""Streaming near-duplicate detection — incremental MinHash+LSH.

A training-data ingest pipeline must answer "is this incoming document
a near-duplicate of anything we already hold?" WITHOUT rescanning the
corpus per batch.  The reference has no analog (its dedup is pk-only,
``pipeline/functions/functions.py:91-106``); this is the streaming twin
of :mod:`..extensions.dedup_text`:

* per micro-batch, new documents are shingled and minhashed with the
  SAME portable signature pipeline as the batch operator (identical
  band hashes, so batch-built indexes and stream-built indexes are
  interchangeable);
* each batch's band hashes are equi-joined against the persisted band
  index — O(batch × matching buckets), never O(corpus);
* flagged arrivals are appended to a `neardup_log`, and the batch's own
  bands are appended to the index so later arrivals dedup against them.

State is two parquet tables (band index, log), both epoch-partitioned:
each micro-batch touches ONLY its own ``epoch=N`` partition (dynamic
partition overwrite — idempotent under foreachBatch's at-least-once
replay), so index IO per micro-batch stays O(batch), the property that
matters at lake scale.  Exactness: a pair is flagged iff the two docs
agree on ALL rows of some band — precisely the batch operator's
candidate-pair semantics; a re-delivered doc_id never pairs with
itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.dedup_text import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    minhash_signatures_from_docs,
)


def band_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(doc_id, band_idx, band_hash) for a document set — the unit the
    band index stores.  Same md5-portable signature math as the batch
    LSH, factored so stream and batch produce identical hashes."""
    sigs = minhash_signatures_from_docs(docs, id_col, text_col, num_perm)
    rows_per_band = num_perm // bands
    exprs = [
        F.md5(
            F.concat_ws(
                "_",
                *[
                    F.col(f"sig_{j}").cast("string")
                    for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
        ).alias(f"__b{b}")
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.posexplode(F.array(*exprs)).alias("band_idx", "band_hash")
    )


def neardup_stream(
    spark: SparkSession,
    stream_path: str,
    schema,
    index_path: str,
    log_path: str,
    checkpoint: str | None = None,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
):
    """Start the incremental near-dup detector over a document stream.

    Files of (doc_id, text) land in ``stream_path``; each micro-batch:

    1. computes band hashes for the batch's docs;
    2. anti-joins nothing — an *inner* join against the stored index
       yields (new doc, existing doc) candidate pairs, written to
       ``log_path`` (columns: doc_id, matched_doc_id, band_idx);
       in-batch pairs are caught too (batch self-join on band);
    3. writes the batch's band hashes to ``index_path``.

    Replay safety (foreachBatch is at-least-once): both tables are
    partitioned by ``epoch`` and written with DYNAMIC partition
    overwrite, so a replayed epoch REPLACES its own partition instead
    of appending a second copy — the standard idempotent-foreachBatch
    recipe.  The vs-index join additionally excludes the current
    epoch's partition (a crash between the log and index writes would
    otherwise make the replay match the batch against its own
    half-written index rows) and filters ``matched_doc_id != doc_id``
    so a re-delivered document (same doc_id in a LATER file, which a
    new epoch legitimately re-bands) is never flagged as a
    near-duplicate of itself.

    Returns the StreamingQuery (caller stops it).
    """
    stream = spark.readStream.schema(schema).parquet(stream_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        process_neardup_batch(
            batch_df, epoch_id, index_path, log_path, num_perm=num_perm, bands=bands
        )

    writer = stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def process_neardup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    log_path: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> None:
    """One micro-batch of the incremental near-dup detector — factored
    out of the foreachBatch closure so replay semantics (same epoch_id
    twice) are directly unit-testable."""
    if batch_df.isEmpty():
        return  # an empty partitioned write would leave an unreadable dir
    sess = batch_df.sparkSession
    batch = band_hashes(batch_df, num_perm=num_perm, bands=bands)
    # several files per batch may repeat a doc; keep one banding
    batch = batch.dropDuplicates(["doc_id", "band_idx", "band_hash"])

    existing = None
    if os.path.exists(index_path):
        existing = sess.read.parquet(index_path).filter(
            F.col("epoch") != F.lit(epoch_id)
        )
    # in-batch candidates (a<b keeps each pair once)
    others = batch.select(
        F.col("doc_id").alias("matched_doc_id"), "band_idx", "band_hash"
    )
    pairs = batch.join(others, ["band_idx", "band_hash"]).filter(
        F.col("matched_doc_id") < F.col("doc_id")
    )
    if existing is not None:
        vs_index = batch.join(
            existing.select(
                F.col("doc_id").alias("matched_doc_id"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        ).filter(F.col("matched_doc_id") != F.col("doc_id"))
        pairs = pairs.unionByName(vs_index)
    out = (
        pairs.select("doc_id", "matched_doc_id", "band_idx")
        .distinct()
        .persist()
    )
    try:
        # the shared epoch-partitioned idempotent write (skips empty
        # frames — see streaming/epochs.py for the footer rationale)
        from data_pipeline_bigquery_spark.streaming.epochs import (
            write_epoch_partitioned,
        )

        write_epoch_partitioned(out, epoch_id, log_path)
    finally:
        out.unpersist()
    (
        batch.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(index_path)
    )
