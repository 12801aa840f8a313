from clickhouse_metrics_pipeline_spark.streaming.pipeline import (
    delta_convert_stream,
    ingest_stream,
)

__all__ = ["delta_convert_stream", "ingest_stream"]
