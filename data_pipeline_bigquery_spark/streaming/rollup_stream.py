"""Streaming continuous aggregate — the ``foreachBatch`` twin of
``operators/rollup_maintenance.py``.

Each micro-batch aggregates to partials (count + decimal sums) and
merges them into the stored rollup parquet: the hypertable
"continuous aggregate" pattern on Structured Streaming.  Per epoch the
work is O(batch) + a merge shuffle of O(groups) — the historical facts
behind the rollup are never re-read, which is the only viable shape
when the fact stream is unbounded.

Exactly-once: ``foreachBatch`` is at-least-once, and the merge reads the
current rollup — so a replayed epoch would double-count its batch unless
guarded.  The guard is the last-applied ``epoch_id`` persisted INSIDE the
rollup directory (``_epoch`` marker, invisible to parquet readers like
``_SUCCESS``) and swapped atomically with the data: a replayed epoch sees
``epoch_id <= last_applied`` and no-ops, making the merge idempotent per
epoch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_bigquery_spark.operators.rollup_maintenance import (
    merge_rollups,
    partial_rollup,
)


def make_merge_batch(
    rollup_path: str,
    keys: list[str],
    sums: dict,
    count_alias: str = "n_rows",
):
    """Build the per-epoch merge function (exposed for direct replay
    testing; ``start_rollup_stream`` wires it into ``foreachBatch``)."""
    partial_cols = [count_alias, *sums.keys()]

    epoch_marker = "_epoch"

    def _last_applied_epoch() -> int:
        try:
            with open(os.path.join(rollup_path, epoch_marker)) as fh:
                return int(fh.read().strip())
        except (OSError, ValueError):
            return -1

    def _merge_batch(batch: DataFrame, epoch_id: int) -> None:
        if epoch_id <= _last_applied_epoch():
            # at-least-once replay of an epoch whose merge already landed:
            # merging again would double-count the batch, so no-op
            return
        bspark = batch.sparkSession
        batch_partial = partial_rollup(batch, keys, sums, count_alias=count_alias)
        existing = None
        if os.path.exists(rollup_path):
            existing = bspark.read.parquet(rollup_path)
        merged = merge_rollups(existing, batch_partial, keys, partial_cols)
        # stage-then-swap: the rollup is O(groups) small, so a full
        # rewrite per epoch is cheap and keeps readers consistent; the
        # epoch marker travels inside the staged dir so data + guard
        # swap in the same rename
        staged = rollup_path + f".epoch-{epoch_id}.staging"
        merged.write.mode("overwrite").parquet(staged)
        with open(os.path.join(staged, epoch_marker), "w") as fh:
            fh.write(str(epoch_id))
        if os.path.exists(rollup_path):
            shutil.rmtree(rollup_path)
        os.rename(staged, rollup_path)

    return _merge_batch


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

    Epoch ids are scoped to ``checkpoint_path``: the checkpoint and the
    rollup dir form a unit — delete both or neither, since a fresh
    checkpoint restarts epochs at 0 and the idempotence guard would
    skip them against a surviving rollup.
    """
    merge_batch = make_merge_batch(rollup_path, keys, sums, count_alias=count_alias)
    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
