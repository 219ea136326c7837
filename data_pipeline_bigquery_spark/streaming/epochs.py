"""The ONE epoch-partitioned idempotent write — the replay-safety
recipe every foreachBatch sink in this package shares.

Each micro-batch lands under ``epoch=N`` with dynamic partition
overwrite, so an at-least-once replay of a batch REPLACES its own
partition instead of appending duplicates.  Empty frames are skipped:
a partitioned write of an empty frame leaves a directory with no
schema footer (unreadable), and because batch contents are
deterministic under replay, skip-vs-overwrite cannot diverge.

Previously triplicated across :mod:`.neardup_stream`,
:mod:`.quarantine_stream`, and :mod:`.expectations_stream` — a fix to
the recipe now lands once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_epoch_partitioned(df: DataFrame, epoch_id: int, path: str) -> None:
    if df.isEmpty():
        return
    (
        df.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(path)
    )
