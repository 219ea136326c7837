from data_pipeline_bigquery_spark.state.cursor import CursorStore

__all__ = ["CursorStore"]
