"""Stream-static enrichment — the streaming form of the reference's
per-record lookup joins (`/root/reference/pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:98-136`
enriches each pulled batch against already-loaded entity tables).

Two variants with different dimension-freshness semantics:

- `enrich_stream`: a plain stream-static join.  Spark re-resolves the
  static side every micro-batch, so a file-backed dimension picks up
  appended files; the broadcast hint keeps the stream side shuffle-free
  — state-light (no watermark needed: the static side is never
  buffered, unlike a stream-stream join).
- `enrich_foreach_batch`: re-READS the dimension from source inside
  ``foreachBatch`` — the pattern for dimensions that are rewritten in
  place (compaction, SCD overwrite) where plan-time file listing would
  go stale, and for sinks that need merge semantics.

At scale: the dimension must fit the broadcast threshold; a fact-sized
"dimension" calls for the stream-stream interval join
(`tests/test_stream_stream_join.py`) or a pre-bucketed static side.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: Sequence[str] | str,
    how: str = "left",
) -> DataFrame:
    """Broadcast stream-static join; unmatched stream rows survive with
    NULL dimension columns under the default left join (dropping them
    silently is the classic enrichment bug)."""
    return stream_df.join(F.broadcast(dim_df), on=on, how=how)


def enrich_foreach_batch(
    stream_df: DataFrame,
    load_dim: Callable[[SparkSession], DataFrame],
    on: Sequence[str] | str,
    sink: Callable[[DataFrame, int], None],
    how: str = "left",
) -> StreamingQuery:
    """Per-micro-batch enrichment with a freshly loaded dimension.

    ``load_dim`` runs inside every batch, so dimension rewrites land at
    batch granularity; ``sink(batch_df, epoch_id)`` receives the
    enriched batch (idempotent writes keyed on epoch_id are the
    caller's contract, as in `streaming/incremental.py`)."""

    def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
        dim = load_dim(batch_df.sparkSession)
        sink(batch_df.join(F.broadcast(dim), on=on, how=how), epoch_id)

    return stream_df.writeStream.foreachBatch(run_batch).start()
