"""Online experimentation monitor — the streaming twin of
``queries/analytics9.ab_test_lift``.

Each micro-batch of events contributes per-arm partial counts
(exposures and high-value-purchase conversions, arms from the same
md5 bucket as the batch readout) to an epoch-partitioned counter
table; the rollup computes cumulative per-arm rates and the
two-proportion z from the summed counters — the dashboard an
experimenter watches DURING the test, without rescanning history.

Grain note: the batch `ab_test_lift` is USER-grain (a user converts
at most once).  A streaming monitor cannot deduplicate conversions
per user without O(users) state, so this counts EVENT-grain
exposures/conversions — the standard sequential-monitoring proxy; the
user-grain readout stays the batch query's job at decision time.
Replay safety is the shared epoch recipe (:mod:`.epochs`): a replayed
batch replaces its own partition, counters never double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_bigquery_spark.extensions.sampling import hash_bucket
from data_pipeline_bigquery_spark.streaming.epochs import (
    write_epoch_partitioned,
)

_CONV_VALUE = 250.0


def process_ab_batch(
    batch_df: DataFrame, epoch_id: int, counters_path: str
) -> None:
    """One micro-batch → 2 counter rows (one per arm)."""
    if batch_df.isEmpty():
        return
    counters = (
        batch_df.select(
            hash_bucket(F.col("user_id"), 2).alias("arm"),
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= _CONV_VALUE),
                1,
            )
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("conv").alias("n_conv"),
        )
    )
    write_epoch_partitioned(counters, epoch_id, counters_path)


def ab_monitor_stream(
    stream: DataFrame, counters_path: str, checkpoint: str | None = None
):
    """Attach the monitor to a streaming events frame."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_ab_batch(batch_df, epoch_id, counters_path)

    writer = stream.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def ab_rollup(spark: SparkSession, counters_path: str) -> DataFrame:
    """Cumulative experiment readout from the counter table (arms ×
    epochs rows — never data-proportional): per-arm totals, rates in
    permille, and the two-proportion z over event-grain counts."""
    arms = (
        spark.read.parquet(counters_path)
        .groupBy("arm")
        .agg(
            F.sum("n_events").alias("n"), F.sum("n_conv").alias("conv")
        )
    )
    pivot = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_control"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv"))).alias(
            "conv_control"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_treatment"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv"))).alias(
            "conv_treatment"
        ),
    )
    z = (
        "round((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)"
        "  - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))"
        " / nullif(sqrt((CAST(conv_control + conv_treatment AS DOUBLE)"
        "         / CAST(n_control + n_treatment AS DOUBLE))"
        "        * (1.0 - CAST(conv_control + conv_treatment AS DOUBLE)"
        "               / CAST(n_control + n_treatment AS DOUBLE))"
        "        * (1.0 / CAST(n_control AS DOUBLE)"
        "           + 1.0 / CAST(n_treatment AS DOUBLE))), 0.0), 6)"
    )
    return pivot.select(
        "n_control",
        "conv_control",
        "n_treatment",
        "conv_treatment",
        F.expr(
            "conv_control * 1000 div nullif(n_control, 0)"
        ).alias("rate_control_permille"),
        F.expr(
            "conv_treatment * 1000 div nullif(n_treatment, 0)"
        ).alias("rate_treatment_permille"),
        F.expr(z).alias("z_two_proportion"),
    )
