from clickhouse_metrics_pipeline_spark.sources.fixtures import (
    seed_metrics,
    integration_metrics,
)
from clickhouse_metrics_pipeline_spark.sources.otlp import flatten_otlp
from clickhouse_metrics_pipeline_spark.sources.writer import (
    write_metrics_table,
    read_metrics_table,
)

__all__ = [
    "seed_metrics",
    "integration_metrics",
    "flatten_otlp",
    "write_metrics_table",
    "read_metrics_table",
]
