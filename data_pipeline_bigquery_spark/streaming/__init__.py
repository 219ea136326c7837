from data_pipeline_bigquery_spark.streaming.incremental import (
    incremental_batch_run,
    streaming_upsert,
)

__all__ = ["incremental_batch_run", "streaming_upsert"]
