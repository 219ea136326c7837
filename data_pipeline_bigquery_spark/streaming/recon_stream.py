"""Continuous table reconciliation — the streaming twin of
``queries/analytics10.reconciliation_row_checksum``.

A dual feed of rows tagged ``side`` ('src' / 'rep') flows through a
micro-batch monitor; each batch contributes per-(partition, side)
partial counters — row count + BIGINT sum of 7-hex md5 row digests —
to an epoch-partitioned counter table.  The rollup folds the counters
and emits the same (n_src, n_rep, checksum_src, checksum_rep, status)
row per partition as the batch key, so a drifting replica is caught
WHILE it drifts instead of at the nightly audit.

Scale & safety:

- Counter state is O(partitions × sides × epochs) — never
  data-proportional; each micro-batch folds to at most
  2 × touched-partitions rows before writing.
- Checksums are SUMS of bounded digests, so they fold associatively
  across batches: cumulative checksum = Σ batch checksums, no
  order-sensitivity, no rescan of history.
- Replay safety is the shared epoch recipe (:mod:`.epochs`): a
  replayed micro-batch replaces its OWN epoch partition, so
  at-least-once delivery never double-counts.
- The digest (``sampling.md5_prefix_long``) is digit-identical to the
  batch key's, so the stream rollup CONVERGES to the batch query's
  output on the same rows (asserted in tests/test_recon_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.sampling import md5_prefix_long
from data_pipeline_bigquery_spark.streaming.epochs import (
    write_epoch_partitioned,
)


def row_digest(key_col: str = "k", cents_col: str = "cents"):
    """The row digest both sides hash: md5('key:cents') 7-hex prefix."""
    return md5_prefix_long(
        F.concat(
            F.col(key_col).cast("string"),
            F.lit(":"),
            F.col(cents_col).cast("string"),
        )
    )


def process_recon_batch(
    batch_df: DataFrame, epoch_id: int, counters_path: str
) -> None:
    """One micro-batch of tagged rows → per-(part, side) counter rows.

    Expects columns ``part`` (partition key, e.g. month), ``side``
    ('src'/'rep'), ``k`` (primary key), ``cents`` (payload).
    """
    if batch_df.isEmpty():
        return
    counters = (
        batch_df.select("part", "side", row_digest().alias("digest"))
        .groupBy("part", "side")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("digest").alias("checksum"),
        )
    )
    write_epoch_partitioned(counters, epoch_id, counters_path)


def recon_monitor_stream(
    stream: DataFrame, counters_path: str, checkpoint: str | None = None
):
    """Attach the monitor to a streaming frame of tagged rows."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_recon_batch(batch_df, epoch_id, counters_path)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def recon_rollup(spark: SparkSession, counters_path: str) -> DataFrame:
    """Cumulative reconciliation report from the counter table —
    one row per partition, same shape/status semantics as the batch
    ``reconciliation_row_checksum`` key."""
    sides = (
        spark.read.parquet(counters_path)
        .groupBy("part")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("side") == "src", F.col("n_rows"))),
                F.lit(0),
            ).alias("n_src"),
            F.coalesce(
                F.sum(F.when(F.col("side") == "rep", F.col("n_rows"))),
                F.lit(0),
            ).alias("n_rep"),
            F.coalesce(
                F.sum(F.when(F.col("side") == "src", F.col("checksum"))),
                F.lit(0),
            ).alias("checksum_src"),
            F.coalesce(
                F.sum(F.when(F.col("side") == "rep", F.col("checksum"))),
                F.lit(0),
            ).alias("checksum_rep"),
        )
    )
    return sides.select(
        "part",
        "n_src",
        "n_rep",
        "checksum_src",
        "checksum_rep",
        F.when(F.col("n_src") != F.col("n_rep"), F.lit("COUNT_MISMATCH"))
        .when(
            F.col("checksum_src") != F.col("checksum_rep"),
            F.lit("CHECKSUM_MISMATCH"),
        )
        .otherwise(F.lit("OK"))
        .alias("status"),
    ).orderBy("part")
