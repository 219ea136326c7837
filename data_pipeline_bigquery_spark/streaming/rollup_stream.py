"""Streaming continuous aggregate — the ``foreachBatch`` twin of
``operators/rollup_maintenance.py``.

Each micro-batch aggregates to partials (count + decimal sums) and
merges them into the stored rollup parquet: the hypertable
"continuous aggregate" pattern on Structured Streaming.  Per epoch the
work is O(batch) + a merge shuffle of O(groups) — the historical facts
behind the rollup are never re-read, which is the only viable shape
when the fact stream is unbounded.

Exactly-once: ``foreachBatch`` epochs are checkpointed; the rewrite of
the (small) rollup table is idempotent per epoch because partials are
merged from the previous rollup snapshot + this batch only.  A replayed
epoch rewrites the same output (staged swap, then atomic-enough rename
on the rollup dir).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_bigquery_spark.operators.rollup_maintenance import (
    merge_rollups,
    partial_rollup,
)


def start_rollup_stream(
    spark: SparkSession,
    stream: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    keys: list[str],
    sums: dict,
    count_alias: str = "n_rows",
):
    """Maintain a grouped rollup parquet from a streaming DataFrame.

    ``sums`` maps output alias → input Column (cast DECIMAL upstream if
    exact cross-engine totals matter).  Uses availableNow-compatible
    ``foreachBatch``; call ``.awaitTermination()`` on the returned query.
    """
    partial_cols = [count_alias, *sums.keys()]

    def _merge_batch(batch: DataFrame, epoch_id: int) -> None:
        bspark = batch.sparkSession
        batch_partial = partial_rollup(batch, keys, sums, count_alias=count_alias)
        existing = None
        if os.path.exists(rollup_path):
            existing = bspark.read.parquet(rollup_path)
        merged = merge_rollups(existing, batch_partial, keys, partial_cols)
        # stage-then-swap: the rollup is O(groups) small, so a full
        # rewrite per epoch is cheap and keeps readers consistent
        staged = rollup_path + f".epoch-{epoch_id}.staging"
        merged.write.mode("overwrite").parquet(staged)
        if os.path.exists(rollup_path):
            shutil.rmtree(rollup_path)
        os.rename(staged, rollup_path)

    return (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
